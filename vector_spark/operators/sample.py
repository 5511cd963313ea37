"""sample transform — deterministic 1-in-N down-sampling.

Reference (src/transforms/sample.rs:127-172): with `key_field` set,
keep the event iff seahash(key) % rate == 0 — deterministic and
consistent (all events of a key live or die together); without a
key it's a per-stream modulo counter (order-dependent — meaningless
in a distributed batch, so the keyed mode is the one we promote).
Kept rows are annotated with `sample_rate` (sample.rs:163-170).

Rebuild: `pmod(hash(key), rate) == 0`. The hash is pluggable:
xxhash64 (JVM, default — fastest) or any deterministic Column
expression (the oracle-parity tests inject an arithmetic hash both
Spark and DuckDB can evaluate identically; exact seahash parity
would need a pandas UDF reimplementation and buys nothing).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sample(
    df: DataFrame,
    rate: int,
    key: str | Column,
    hash_expr: Column | None = None,
    rate_col: str = "sample_rate",
) -> DataFrame:
    key_col = F.col(key) if isinstance(key, str) else key
    h = hash_expr if hash_expr is not None else F.xxhash64(key_col)
    return df.filter(F.pmod(h, F.lit(rate)) == 0).withColumn(
        rate_col, F.lit(rate)
    )
