"""dedupe transform — drop events whose fingerprint was seen before.

Reference (src/transforms/dedupe.rs:27-62,166-233): a 5000-entry LRU
keyed by a type-tagged fingerprint of either `match` fields or
all-fields-minus-`ignore`. The LRU makes it order- and
window-dependent: a key can be re-admitted after eviction.

Rebuild: batch = `dropDuplicates(match_fields)` (global exact
dedupe — strictly stronger than the LRU; divergence documented:
rows the LRU would re-admit after 5000 evictions stay dropped).
`ignore` mode = drop duplicates on the complement of the ignore
list. Streaming = `dropDuplicatesWithinWatermark` (see
streaming/runner.py), which matches the LRU's bounded-memory intent
with event-time bounds instead of entry-count bounds.

Keep-first determinism: plain dropDuplicates keeps an arbitrary
row per key; `order_by` makes it deterministic (keep the min by the
given ordering) via one max_by-style aggregate — needed for
per-turn text-equality gates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedupe(
    df: DataFrame,
    match: list[str] | None = None,
    ignore: list[str] | None = None,
    order_by: list[str] | None = None,
) -> DataFrame:
    if (match is None) == (ignore is None):
        raise ValueError("exactly one of match/ignore must be given")
    fields = match if match is not None else [
        c for c in df.columns if c not in set(ignore or [])
    ]
    if order_by is None:
        return df.dropDuplicates(fields)
    # deterministic keep-first: min_by over the ordering struct
    others = [c for c in df.columns if c not in fields]
    if not others:
        # every column is a key: distinct IS the deterministic answer
        # (groupBy().agg() rejects an empty aggregate list)
        return df.dropDuplicates(fields)
    ordk = F.struct(*[F.col(c) for c in order_by])
    aggs = [F.min_by(F.col(c), ordk).alias(c) for c in others]
    return df.groupBy(*fields).agg(*aggs).select(*df.columns)
