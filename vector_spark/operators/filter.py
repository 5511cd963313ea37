"""filter transform — keep events iff condition holds.

Reference: src/transforms/filter.rs:93-108 (129 LoC). Trivial by
design: the value is that the condition is a Catalyst Column, so it
is pushed into the parquet/Iceberg scan (check .explain() for
PushedFilters) instead of running per-event like the reference.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def filter_events(df: DataFrame, condition: Column) -> DataFrame:
    return df.filter(condition)
