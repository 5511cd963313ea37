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
    exclude: Column | None = None,
) -> DataFrame:
    """Keyed deterministic sampling. `exclude` events bypass the
    sampler entirely and forward with a NULL rate (sample.rs:130-141 —
    the check runs before sampling in every mode; null-safe: a non-
    true condition result means 'not excluded')."""
    key_col = F.col(key) if isinstance(key, str) else key
    h = hash_expr if hash_expr is not None else F.xxhash64(key_col)
    if exclude is not None:
        exclude = F.coalesce(exclude, F.lit(False))
        pool = df.filter(~exclude)
    else:
        pool = df
    kept = pool.filter(F.pmod(h, F.lit(rate)) == 0).withColumn(
        rate_col, F.lit(rate)
    )
    if exclude is None:
        return kept
    return kept.unionByName(
        df.filter(exclude).withColumn(rate_col, F.lit(None).cast("int"))
    )


def sample_counter(
    df: DataFrame,
    rate: int,
    order_by: str | Column,
    exclude: Column | None = None,
    rate_col: str = "sample_rate",
    partitions: int | None = None,
) -> DataFrame:
    """Counter mode: keep every rate-th event in `order_by` order
    (sample.rs:152-166 — `self.count` increments per event, keep when
    count % rate == 0, i.e. the 1st, (rate+1)-th, ... by arrival).
    Vector's arrival order becomes an explicit order key, the same
    translation the reduce/gauge operators use. Events matching
    `exclude` bypass sampling entirely WITHOUT consuming the counter
    (sample.rs:130-141 returns before the increment).

    Scale: a naive global row_number() is a one-task sort (the
    tag_cardinality anti-pattern). Instead: range-repartition on the
    order key, rank within each partition, and shift by broadcast
    per-partition offsets — every stage is distributed; the offsets
    table is one tiny row per partition.
    """
    from pyspark.sql import Window

    order = F.col(order_by) if isinstance(order_by, str) else order_by
    # null-safe split (sample.rs check_conditions: a non-true result —
    # including null — means "not excluded"): a bare filter(exclude) /
    # filter(~exclude) pair would silently drop rows where the
    # condition evaluates to NULL from BOTH branches
    if exclude is not None:
        exclude = F.coalesce(exclude, F.lit(False))
    excluded = df.filter(exclude) if exclude is not None else None
    pool = df.filter(~exclude) if exclude is not None else df

    n = partitions or pool.sparkSession.sparkContext.defaultParallelism
    # pin the ranged layout ONCE (lazy localCheckpoint): the counts
    # branch and the join branch both read it, and recomputing
    # repartitionByRange re-samples range bounds — the offsets and
    # ranks must come from the SAME physical layout, and the upstream
    # lineage shouldn't run twice either
    ranged = (
        pool.repartitionByRange(n, order)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    counts = ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
    offsets = counts.select(
        "_pid",
        F.coalesce(
            F.sum("_cnt").over(
                Window.orderBy("_pid").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ).alias("_offset"),
    )
    local_rank = F.row_number().over(
        Window.partitionBy("_pid").orderBy(order)
    )
    kept = (
        ranged.join(F.broadcast(offsets), "_pid")
        .withColumn("_rank", local_rank - 1 + F.col("_offset"))
        .filter(F.pmod(F.col("_rank"), F.lit(rate)) == 0)
        .drop("_pid", "_cnt", "_offset", "_rank")
        .withColumn(rate_col, F.lit(rate))
    )
    if excluded is not None:
        kept = kept.unionByName(
            excluded.withColumn(rate_col, F.lit(None).cast("int"))
        )
    return kept
