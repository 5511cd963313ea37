"""Token-budget packing primitives shared by the document and
conversation packers (dataops/retrieval.pack_documents,
dataops/conversations.pack_conversations). A leaf module: depends
only on pyspark, so either caller can import it without
cross-domain coupling."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def contiguous_fill(
    df: DataFrame,
    part_col: str,
    order_col: str,
    tokens_col: str,
    budget: int,
) -> DataFrame:
    """The contiguous-fill packing rule: rows laid end-to-end in
    ``order_col`` order per ``part_col``, each row assigned to the
    pack its FIRST token lands in — ``pack_id =
    floor(exclusive_cumsum / budget)``, ``pack_pos =
    exclusive_cumsum % budget``. One window per partition; appends
    (pack_id, pack_pos) to the input columns.

    PRECONDITION: ``order_col`` must be unique within each
    ``part_col`` partition — the window has no tiebreak, so duplicate
    order keys would make the cumulative sum (and the pack layout)
    nondeterministic across runs. Both in-repo callers order by a
    dense per-partition index."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    taken = {"pack_id", "pack_pos"} & set(df.columns)
    if taken:
        raise ValueError(
            f"contiguous_fill appends {sorted(taken)} but the input "
            "already has those columns — rename them first"
        )
    w = (
        Window.partitionBy(part_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = df.withColumn(
        "_before", F.coalesce(F.sum(tokens_col).over(w), F.lit(0))
    )
    return cum.select(
        *df.columns,
        F.floor(F.col("_before") / budget).cast("bigint").alias("pack_id"),
        (F.col("_before") % budget).cast("bigint").alias("pack_pos"),
    )
