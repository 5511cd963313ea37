"""Stateful streaming operators via applyInPandasWithState.

These are the operators whose reference semantics are inherently
arrival-order/state dependent and therefore cannot be a pure batch
expression (SURVEY.md §4 item 5):

* dedupe — 5000-entry LRU of event fingerprints
  (src/transforms/dedupe.rs:27-62: `cache.num_events`, LRU re-admit
  after eviction).
* throttle — GCRA token bucket per key at `threshold` events per
  `window_secs` (src/transforms/throttle.rs:80-140).

Vector runs these as single-threaded Task transforms with GLOBAL
state; the rebuild partitions state by key (Spark's grouped state),
which is both the scale win (state shards across executors) and a
documented divergence: Vector's dedupe LRU is global, ours is
per-group with per-group capacity. At 10^12 turns a global LRU is
not distributable; keyed state is the correct translation.

Each function works on a streaming OR batch grouped DataFrame —
applyInPandasWithState requires streaming, so batch tests use the
`*_pdf` kernels directly over sorted pandas groups.
"""

from __future__ import annotations

from collections.abc import Iterable
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


# ---------------------------------------------------------------------------
# dedupe: per-key LRU of fingerprints
# ---------------------------------------------------------------------------


def _dedupe_kernel(
    pdf: pd.DataFrame, seen: list, match: list[str], capacity: int
) -> tuple[pd.DataFrame, list]:
    """Emit rows whose fingerprint is not in the LRU; maintain LRU
    order (most-recent last) with eviction at `capacity`."""
    fps = pdf[match].astype(str).agg("\x00".join, axis=1)
    lru: dict[str, None] = dict.fromkeys(seen)
    keep = []
    for fp in fps:
        if fp in lru:
            keep.append(False)
            lru.pop(fp)          # refresh recency
            lru[fp] = None
        else:
            keep.append(True)
            lru[fp] = None
            if len(lru) > capacity:
                lru.pop(next(iter(lru)))  # evict least-recent
    return pdf[pd.Series(keep, index=pdf.index)], list(lru)


def streaming_dedupe(
    df: DataFrame,
    match: list[str],
    key: list[str],
    capacity: int = 5000,
    order_by: str | None = None,
) -> DataFrame:
    """Streaming dedupe with LRU semantics per `key` group.

    df must be a streaming DataFrame. State = the LRU fingerprint
    list per key. Output schema = input schema.
    """
    out_schema = df.schema
    state_schema = T.StructType(
        [T.StructField("seen", T.ArrayType(T.StringType()), True)]
    )

    def fn(
        key_: Any, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        seen = list(state.get[0]) if state.exists else []
        for pdf in pdfs:
            if order_by:
                pdf = pdf.sort_values(order_by)
            kept, seen = _dedupe_kernel(pdf, seen, match, capacity)
            if len(kept):
                yield kept
        state.update((seen,))

    return df.groupBy(*key).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


# ---------------------------------------------------------------------------
# throttle: GCRA (leaky bucket) per key
# ---------------------------------------------------------------------------


def _gcra_kernel(
    ts: pd.Series, tat: float, threshold: int, window_secs: float
) -> tuple[pd.Series, float]:
    """Classic GCRA (the governor crate's algorithm): emission
    interval T = window/threshold, burst tolerance tau = window - T.
    An arrival at t conforms iff t >= TAT - tau; then TAT =
    max(TAT, t) + T."""
    emission = window_secs / threshold
    tau = window_secs - emission
    keep = []
    for t in ts:
        if t >= tat - tau:
            keep.append(True)
            tat = max(tat, t) + emission
        else:
            keep.append(False)
    return pd.Series(keep, index=ts.index), tat


def streaming_throttle(
    df: DataFrame,
    threshold: int,
    window_secs: int,
    key: list[str],
    ts_col: str = "ts",
    exclude_col: str | None = None,
) -> DataFrame:
    """Streaming GCRA rate limiter per key (event-time driven).

    `exclude_col` names a boolean column (precompute it upstream with
    withColumn): rows where it is true bypass the limiter WITHOUT
    consuming tokens, mirroring the reference's exclude-condition
    short-circuit (src/transforms/throttle.rs:144-165)."""
    out_schema = df.schema
    state_schema = T.StructType([T.StructField("tat", T.DoubleType(), True)])

    def fn(
        key_: Any, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        tat = float(state.get[0]) if state.exists else float("-inf")
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
            if exclude_col is not None:
                ex = pdf[exclude_col].fillna(False).astype(bool)
                limited = pdf[~ex]
            else:
                ex = None
                limited = pdf
            epoch = limited[ts_col].astype("int64") / 1e9
            keep, tat = _gcra_kernel(epoch, tat, threshold, window_secs)
            if ex is not None:
                mask = ex.copy()
                mask.loc[keep.index] = keep | ex.loc[keep.index]
                kept = pdf[mask].sort_values(ts_col)
            else:
                kept = pdf[keep]
            if len(kept):
                yield kept
        state.update((tat if tat != float("-inf") else None,))

    return df.groupBy(*key).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
