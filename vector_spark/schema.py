"""Schemas for the transcripts pipeline.

The reference's data model is a schemaless per-event BTreeMap
(lib/vector-core/src/event/log_event.rs:113-120 in /root/reference).
The rebuild inverts that: one closed columnar StructType per stage,
so Catalyst's analyzer does the schema::Definition propagation the
reference hand-rolls (src/topology/schema.rs).
"""

from __future__ import annotations

from pyspark.sql import types as T

# BASELINE.json input_hint table
TRANSCRIPTS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

# columns produced by the parse stage (Vector remap + parse_regex,
# src/transforms/remap.rs:46-105, lib/vrl/stdlib/src/parse_regex.rs:21-43)
PARSED_FIELDS = T.StructType(
    [
        T.StructField("level", T.StringType(), True),
        T.StructField("req_id", T.StringType(), True),
        T.StructField("latency_ms", T.LongType(), True),
        T.StructField("msg", T.StringType(), True),
        T.StructField("_parse_error", T.BooleanType(), False),
    ]
)

PARSED_SCHEMA = T.StructType(TRANSCRIPTS_SCHEMA.fields + PARSED_FIELDS.fields)

# enrichment dimension tables (Vector enrichment_tables file/CSV,
# src/enrichment_tables/file.rs:18-53)
ROLE_DIM_ROWS = [
    ("user", "human", True, 1),
    ("assistant", "model", False, 2),
    ("system", "control", False, 3),
    ("tool", "machine", False, 4),
]
ROLE_DIM_SCHEMA = T.StructType(
    [
        T.StructField("role", T.StringType(), False),
        T.StructField("role_group", T.StringType(), False),
        T.StructField("is_human", T.BooleanType(), False),
        T.StructField("priority", T.IntegerType(), False),
    ]
)

TOOL_DIM_ROWS = [
    ("search", "retrieval", True),
    ("python", "compute", True),
    ("browser", "retrieval", True),
    ("none", "none", False),
]
TOOL_DIM_SCHEMA = T.StructType(
    [
        T.StructField("tool", T.StringType(), False),
        T.StructField("tool_family", T.StringType(), False),
        T.StructField("billable", T.BooleanType(), False),
    ]
)
