"""Structured Streaming runner + stateful operator variants.

The reference is a streaming system end-to-end; the batch operators
in vector_spark.operators are the semantics, these modules are the
continuous execution: readStream sources, event-time watermarks
(an upgrade — the reference has NO watermarks or late-data handling,
SURVEY.md §2.7), applyInPandasWithState for the order/state-dependent
transforms (dedupe LRU, throttle GCRA, reduce expire_after_ms), and
foreachBatch multi-sink fan-out with checkpointed exactly-once-ish
commits (strictly stronger than Vector's at-least-once acks).
"""

from vector_spark.streaming.stateful import (  # noqa: F401
    streaming_dedupe,
    streaming_throttle,
)
from vector_spark.streaming.runner import (  # noqa: F401
    demo_logs_stream,
    file_transcripts_stream,
    run_streaming_flagship,
    streaming_aggregate,
)
