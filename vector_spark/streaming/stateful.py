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
from pyspark.sql import functions as F
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
    # null-safe, tag-prefixed components (dedupe.rs type-tagged
    # fingerprints): a bare astype(str) makes NULL collide with the
    # literal strings 'None'/'nan' and silently drops distinct events
    comps = []
    for c in match:
        s = pdf[c]
        comps.append(("\x02" + s.astype(str)).where(~s.isna(), "\x01"))
    fps = comps[0]
    for s in comps[1:]:
        fps = fps + "\x00" + s
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
        # a fully-excluded first batch persists (None,) — treat a
        # null stored TAT like no state (float(None) would kill the
        # query on the key's next batch)
        _v0 = state.get[0] if state.exists else None
        tat = float(_v0) if _v0 is not None else float("-inf")
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


# ---------------------------------------------------------------------------
# reduce: stateful group-merge with starts_when/ends_when/expire flush
# ---------------------------------------------------------------------------

_SCALAR = {"discard", "retain", "sum", "max", "min"}
_LISTY = {"array", "concat", "concat_newline", "concat_raw", "flat_unique"}


def _reduce_acc_add(acc: dict, row: dict, strategies: dict, ts_col: str) -> dict:
    """Fold one event into the accumulator (reduce/mod.rs merge loop;
    merge_strategies.rs per-strategy behavior). Rows arrive sorted by
    event time within a batch; the accumulator carries order across
    batches."""
    if acc is None:
        acc = {"n": 0, "ts_first": None, "ts_last": None, "f": {}}
    acc["n"] += 1
    ts = row[ts_col]
    if acc["ts_first"] is None:
        acc["ts_first"] = ts
    acc["ts_last"] = ts
    for fld, strat in strategies.items():
        v = row.get(fld)
        # pandas delivers SQL NULL as NaN/NaT for numeric/ts dtypes;
        # normalize to None so null events are SKIPPED by sum/max/min
        # (NaN is truthy, so `(v or 0)` would poison the sum)
        if (isinstance(v, float) and v != v) or v is pd.NaT:
            v = None
        cur = acc["f"].get(fld)
        if strat == "discard":
            if cur is None:
                acc["f"][fld] = v
        elif strat == "retain":
            if v is not None:
                acc["f"][fld] = v
        elif strat == "sum":
            acc["f"][fld] = (cur or 0) + (v or 0)
        elif strat == "max":
            # skip nulls like the batch F.max (max(cur, None) raises)
            if v is not None:
                acc["f"][fld] = v if cur is None else max(cur, v)
        elif strat == "min":
            if v is not None:
                acc["f"][fld] = v if cur is None else min(cur, v)
        elif strat in ("array", "concat", "concat_newline", "concat_raw"):
            acc["f"].setdefault(fld, []).append(v)
        elif strat == "flat_unique":
            lst = acc["f"].setdefault(fld, [])
            for x in v if isinstance(v, (list, tuple)) else [v]:
                if x not in lst:
                    lst.append(x)
        elif strat == "shortest_array":
            if cur is None or (v is not None and len(v) < len(cur)):
                acc["f"][fld] = list(v) if v is not None else cur
        elif strat == "longest_array":
            if cur is None or (v is not None and len(v) > len(cur)):
                acc["f"][fld] = list(v) if v is not None else cur
        else:
            raise ValueError(f"unknown merge strategy {strat!r}")
    return acc


def _reduce_acc_finish(acc: dict, strategies: dict) -> dict:
    out = {"n": acc["n"], "ts_first": acc["ts_first"], "ts_last": acc["ts_last"]}
    for fld, strat in strategies.items():
        v = acc["f"].get(fld)
        if strat == "concat":
            v = " ".join("" if x is None else str(x) for x in (v or []))
        elif strat == "concat_newline":
            v = "\n".join("" if x is None else str(x) for x in (v or []))
        elif strat == "concat_raw":
            v = "".join("" if x is None else str(x) for x in (v or []))
        out[fld] = v
    return out


def _reduce_kernel(
    pdf: pd.DataFrame,
    acc: dict | None,
    strategies: dict,
    ts_col: str,
    ends_col: str | None,
    starts_col: str | None,
) -> tuple[list[dict], dict | None]:
    """Process one sorted batch: returns (emitted groups, carry-over
    accumulator). starts_when flushes the PENDING group and opens a
    new one with the current event; ends_when includes the current
    event then flushes (reduce/mod.rs:199-230)."""
    emitted: list[dict] = []
    for row in pdf.to_dict("records"):
        if starts_col is not None and bool(row.get(starts_col)) and acc and acc["n"]:
            emitted.append(_reduce_acc_finish(acc, strategies))
            acc = None
        acc = _reduce_acc_add(acc, row, strategies, ts_col)
        if ends_col is not None and bool(row.get(ends_col)):
            emitted.append(_reduce_acc_finish(acc, strategies))
            acc = None
    return emitted, acc


def streaming_reduce(
    df: DataFrame,
    key: list[str],
    strategies: dict[str, str],
    ts_col: str = "ts",
    ends_col: str | None = None,
    starts_col: str | None = None,
    expire_after_ms: int | None = None,
) -> DataFrame:
    """Streaming reduce (src/transforms/reduce/mod.rs): merge events
    per key with the 12 strategies; flush on `ends_when` /
    `starts_when` condition columns (precompute booleans upstream, the
    throttle exclude_col pattern) or when the group goes stale for
    `expire_after_ms` (mod.rs:33 + flush_into staleness sweep) via a
    processing-time state timeout.

    State = one JSON accumulator per key — bounded by the group's
    field count, not its event count (concat/array strategies grow
    with events; cap upstream if the corpus has mega-groups).
    Output: key cols + merged fields + n/ts_first/ts_last.
    """
    import json

    in_types = {f.name: f.dataType for f in df.schema.fields}
    out_fields = [T.StructField(k, in_types[k]) for k in key]
    for fld, strat in strategies.items():
        if strat in ("concat", "concat_newline", "concat_raw"):
            dt: T.DataType = T.StringType()
        elif strat == "array":
            dt = T.ArrayType(in_types[fld])
        elif strat == "flat_unique":
            base = in_types[fld]
            dt = base if isinstance(base, T.ArrayType) else T.ArrayType(base)
        elif strat == "sum":
            dt = T.DoubleType()
        else:
            dt = in_types[fld]
        out_fields.append(T.StructField(fld, dt))
    out_fields += [
        T.StructField("n", T.LongType()),
        T.StructField("ts_first", in_types[ts_col]),
        T.StructField("ts_last", in_types[ts_col]),
    ]
    out_schema = T.StructType(out_fields)
    state_schema = T.StructType([T.StructField("acc", T.StringType(), True)])
    is_ts = in_types[ts_col].typeName().startswith("timestamp")
    numeric_sums = {
        f for f, s in strategies.items() if s == "sum"
    }

    # strategy fields that are themselves timestamps: json round-trips
    # them as strings (default=str), so _load must restore them or a
    # group carried across micro-batches emits strings into a
    # TimestampType column and the Arrow conversion fails
    ts_flds = {
        f
        for f in strategies
        if in_types[f].typeName().startswith("timestamp")
    }

    def _dump(acc: dict) -> str:
        a = dict(acc)
        if is_ts:
            a = {**a, "ts_first": str(a["ts_first"]), "ts_last": str(a["ts_last"])}
        return json.dumps(a, default=str)

    def _load(s: str) -> dict:
        a = json.loads(s)
        if is_ts:
            a["ts_first"] = pd.Timestamp(a["ts_first"])
            a["ts_last"] = pd.Timestamp(a["ts_last"])
        for f in ts_flds:
            v = a["f"].get(f)
            if isinstance(v, str):
                a["f"][f] = pd.Timestamp(v)
            elif isinstance(v, list):
                a["f"][f] = [
                    pd.Timestamp(x) if isinstance(x, str) else x for x in v
                ]
        return a

    def _emit(key_, groups: list[dict]) -> pd.DataFrame:
        rows = []
        for g in groups:
            row = dict(zip(key, key_ if isinstance(key_, tuple) else (key_,)))
            for fld in strategies:
                v = g[fld]
                row[fld] = float(v) if fld in numeric_sums and v is not None else v
            row["n"], row["ts_first"], row["ts_last"] = g["n"], g["ts_first"], g["ts_last"]
            rows.append(row)
        return pd.DataFrame(rows, columns=[f.name for f in out_fields])

    def fn(
        key_: Any, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            # staleness flush: emit the pending group (mod.rs:33)
            acc = _load(state.get[0]) if state.exists else None
            state.remove()
            if acc and acc["n"]:
                yield _emit(key_, [_reduce_acc_finish(acc, strategies)])
            return
        acc = _load(state.get[0]) if state.exists and state.get[0] else None
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
            emitted, acc = _reduce_kernel(
                pdf, acc, strategies, ts_col, ends_col, starts_col
            )
            if emitted:
                yield _emit(key_, emitted)
        if acc and acc["n"]:
            state.update((_dump(acc),))
            if expire_after_ms is not None:
                state.setTimeoutDuration(expire_after_ms)
        elif state.exists:
            state.remove()

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if expire_after_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return df.groupBy(*key).applyInPandasWithState(
        fn, out_schema, state_schema, "append", timeout
    )


# ---------------------------------------------------------------------------
# sample: counter mode per key
# ---------------------------------------------------------------------------


def streaming_sample(
    df: DataFrame,
    rate: int,
    key: list[str],
    exclude_col: str | None = None,
    order_by: str | None = None,
    rate_col: str = "sample_rate",
) -> DataFrame:
    """Streaming counter-mode sample (sample.rs:130-166): keep every
    rate-th event per key group by arrival order (the 1st,
    (rate+1)-th, ...). Rows where `exclude_col` is true bypass the
    sampler WITHOUT consuming the counter (sample.rs returns before
    the increment) and carry a NULL sample_rate — the same contract
    as the batch sample_counter. State = one counter per key."""
    import pandas as _pd

    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(rate_col, T.IntegerType())]
    )
    state_schema = T.StructType([T.StructField("count", T.LongType(), True)])

    def fn(key_, pdfs, state: GroupState):
        count = int(state.get[0]) if state.exists else 0
        for pdf in pdfs:
            if order_by:
                pdf = pdf.sort_values(order_by)
            if exclude_col is not None:
                excl = pdf[exclude_col].fillna(False).astype(bool)
            else:
                excl = _pd.Series(False, index=pdf.index)
            keep = []
            rates = []
            for is_ex in excl:
                if is_ex:
                    keep.append(True)
                    rates.append(None)
                else:
                    keep.append(count % rate == 0)
                    rates.append(rate)
                    count += 1
            out = pdf[_pd.Series(keep, index=pdf.index)].copy()
            out[rate_col] = [
                r for k, r in zip(keep, rates) if k
            ]
            out[rate_col] = out[rate_col].astype("Int32")
            if len(out):
                yield out
        state.update((count,))

    return df.groupBy(*key).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


# ---------------------------------------------------------------------------
# tag_cardinality_limit: first-N distinct values per tag, stateful
# ---------------------------------------------------------------------------


def streaming_tag_cardinality(
    df: DataFrame,
    tag_col: str,
    value_limit: int,
    mode: str = "drop_tag",
    order_by: str | None = None,
) -> DataFrame:
    """Streaming tag_cardinality_limit — the reference's literal
    semantics (tag_cardinality_limit.rs:163-230): a per-tag HashSet of
    accepted values; the first `value_limit` distinct values ever seen
    pass, later values drop the tag or the event. State = the accepted
    set (bounded by value_limit, by construction). Events with a NULL
    tag pass untouched (absent tags don't count against the limit)."""
    import pandas as _pd

    if mode not in ("drop_tag", "drop_event"):
        raise ValueError(f"unknown mode {mode}")
    df = df.withColumn("_tcl_key", F.lit(0))
    out_schema = df.schema
    state_schema = T.StructType(
        [T.StructField("accepted", T.ArrayType(T.StringType()), True)]
    )

    def fn(key_, pdfs, state: GroupState):
        accepted = list(state.get[0]) if state.exists else []
        seen = set(accepted)
        for pdf in pdfs:
            if order_by:
                pdf = pdf.sort_values(order_by)
            keep = []
            new_vals = []
            for v in pdf[tag_col]:
                if v is None or (isinstance(v, float) and v != v):
                    keep.append("pass")
                    new_vals.append(v)
                    continue
                v = str(v)
                if v in seen:
                    keep.append("pass")
                    new_vals.append(v)
                elif len(seen) < value_limit:
                    seen.add(v)
                    accepted.append(v)
                    keep.append("pass")
                    new_vals.append(v)
                else:
                    keep.append("over")
                    new_vals.append(None)
            pdf = pdf.copy()
            if mode == "drop_tag":
                pdf[tag_col] = new_vals
                out = pdf
            else:
                mask = _pd.Series(
                    [k == "pass" for k in keep], index=pdf.index
                )
                out = pdf[mask]
            if len(out):
                yield out
        state.update((accepted,))

    out = df.groupBy("_tcl_key").applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
    return out.drop("_tcl_key")
