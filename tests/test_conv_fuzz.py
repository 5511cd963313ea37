"""Seeded-fuzz parity for the round-5 conversation operators: one
Spark run over hundreds of randomized conversations, checked against
INDEPENDENT pandas reference models (pandas.merge_asof for the as-of
join; hand-rolled models elsewhere). Random but deterministic
(fixed seed), so failures reproduce.
"""

from __future__ import annotations

import random

import pandas as pd

from vector_spark.dataops.conversations import (
    context_windows,
    pack_conversations,
    repair_conversations,
)
from vector_spark.operators.asof import asof_join

_ROLES = ["user", "assistant", "system", "tool"]


def _random_turns(rng: random.Random, n_convs: int = 60):
    rows = []
    for c in range(n_convs):
        for i in range(rng.randint(1, 12)):
            rows.append(
                (
                    f"c{c:03d}",
                    i,
                    rng.choice(_ROLES),
                    " ".join(
                        rng.choice("alpha beta gamma delta".split())
                        for _ in range(rng.randint(0, 6))
                    ),
                )
            )
    return rows


def test_asof_join_matches_pandas_merge_asof(spark):
    rng = random.Random(7)
    keys = [f"k{i}" for i in range(12)]
    left, right = [], []
    for k in keys:
        for ts in rng.sample(range(100), rng.randint(1, 15)):
            left.append((k, ts, f"L{k}@{ts}"))
        for ts in rng.sample(range(100), rng.randint(0, 10)):
            right.append((k, ts, f"R{k}@{ts}"))
    ldf = spark.createDataFrame(left, "key string, ts int, ev string")
    rdf = spark.createDataFrame(right, "key string, ts int, val string")
    got = (
        asof_join(ldf, rdf, ["key"], "ts", ["val"])
        .toPandas()
        .sort_values(["key", "ts"])
        .reset_index(drop=True)
    )
    lp = pd.DataFrame(left, columns=["key", "ts", "ev"]).sort_values("ts")
    rp = pd.DataFrame(right, columns=["key", "ts", "val"]).sort_values("ts")
    want = (
        pd.merge_asof(
            lp,
            rp.rename(columns={"ts": "matched_ts"}),
            left_on="ts",
            right_on="matched_ts",
            by="key",
            direction="backward",
            allow_exact_matches=True,
        )
        .sort_values(["key", "ts"])
        .reset_index(drop=True)
    )
    assert list(got.columns) == ["key", "ts", "ev", "val", "matched_ts"]
    for col in ["key", "ts", "ev", "val"]:
        assert got[col].where(got[col].notna(), None).tolist() == want[
            col
        ].where(want[col].notna(), None).tolist()


def test_repair_matches_pandas_islands_model(spark):
    rng = random.Random(11)
    rows = _random_turns(rng)
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    got = {
        (r.conv_id, r.turn_idx): r
        for r in repair_conversations(df).collect()
    }
    # pandas model: walk each conversation in turn order
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text"])
    n_model = 0
    for conv, grp in pdf.sort_values("turn_idx").groupby("conv_id"):
        segs: list[tuple[str, list, int]] = []
        for _, row in grp.iterrows():
            if segs and segs[-1][0] == row.role:
                segs[-1][1].append(row.text)
            else:
                segs.append((row.role, [row.text], row.turn_idx))
        for new_idx, (role, texts, first) in enumerate(segs):
            n_model += 1
            g = got[(conv, new_idx)]
            assert g.role == role
            assert g.text == "\x1f".join(texts)
            assert g.n_merged == len(texts)
            assert g.first_src_turn == first
    assert len(got) == n_model


def test_pack_conversations_invariants_fuzz(spark):
    rng = random.Random(13)
    rows = _random_turns(rng, n_convs=80)
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    out = pack_conversations(df, budget=40, n_shards=4).toPandas()
    assert len(out) == out.conv_id.nunique()  # whole conversations
    for _, shard in out.groupby("shard"):
        s = shard.sort_values("conv_id").reset_index(drop=True)
        before = 0
        for _, row in s.iterrows():
            # contiguous fill: each conversation starts where the
            # previous one ended
            assert row.pack_id == before // 40
            assert row.pack_pos == before % 40
            before += row.conv_tokens


def test_context_windows_matches_pandas_model(spark):
    rng = random.Random(17)
    rows = _random_turns(rng)
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    k = 3
    got = {
        (r.conv_id, r.turn_idx): r
        for r in context_windows(df, k=k).collect()
    }
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text"])
    n_model = 0
    for conv, grp in pdf.sort_values("turn_idx").groupby("conv_id"):
        turns = list(grp.itertuples())
        for i, t in enumerate(turns):
            if t.role != "assistant":
                continue
            n_model += 1
            ctx = [
                f"{p.role}: {p.text}" for p in turns[max(0, i - k) : i]
            ]
            g = got[(conv, t.turn_idx)]
            assert g.context_len == len(ctx)
            assert g.context == "\x1f".join(ctx)
            assert g.response == t.text
    assert len(got) == n_model


def test_mixing_ops_match_pandas_models(spark):
    rng = random.Random(23)
    rows = [
        (f"d{i:03d}", rng.choice(["web", "code", "wiki"]),
         " ".join("w" for _ in range(rng.randint(0, 20))))
        for i in range(150)
    ]
    df = spark.createDataFrame(rows, "doc_id string, source string, text string")
    pdf = pd.DataFrame(rows, columns=["doc_id", "source", "text"])
    pdf["n_tokens"] = pdf.text.str.split().map(len)

    # score_deciles: ntile(10) by (score, id) per source
    from vector_spark.dataops.mixing import (
        balanced_sample,
        score_deciles,
        token_quota_filter,
    )
    from vector_spark.dataops.text import token_count
    from pyspark.sql import functions as F

    scored = df.select(
        "doc_id", "source", token_count(F.col("text")).alias("n_tokens")
    )
    got = score_deciles(scored, "n_tokens").toPandas()
    for src, grp in pdf.groupby("source"):
        order = grp.sort_values(["n_tokens", "doc_id"]).doc_id.tolist()
        n = len(order)
        # SQL ntile: first (n % 10) buckets get ceil(n/10), rest floor
        big, small = -(-n // 10), n // 10
        cut = (n % 10) * big
        want = {}
        for i, doc in enumerate(order):
            want[doc] = (i // big) + 1 if i < cut else \
                ((i - cut) // small) + (n % 10) + 1
        sub = got[got.group == src]
        assert dict(zip(sub.doc_id, sub.bucket)) == want

    # balanced_sample: rank by (md5('bal:'+id), id) per source
    import hashlib

    got = balanced_sample(df, k=7).toPandas()
    for src, grp in pdf.groupby("source"):
        order = sorted(
            grp.doc_id,
            key=lambda d: (hashlib.md5(f"bal:{d}".encode()).hexdigest(), d),
        )
        sub = got[got.group == src].set_index("doc_id")
        for rank, doc in enumerate(order, 1):
            assert sub.loc[doc, "rank"] == rank
            assert bool(sub.loc[doc, "kept"]) == (rank <= 7)

    # token_quota_filter: greedy prefix within quota, doc_id order
    got = token_quota_filter(
        df, {"web": 120, "code": 60}, default_quota=40
    ).toPandas()
    quotas = {"web": 120, "code": 60, "wiki": 40}
    for src, grp in pdf.groupby("source"):
        run = 0
        sub = got[got.group == src].set_index("doc_id")
        for _, row in grp.sort_values("doc_id").iterrows():
            run += row.n_tokens
            assert sub.loc[row.doc_id, "cum_tokens"] == run
            assert bool(sub.loc[row.doc_id, "kept"]) == (run <= quotas[src])


def test_agent_trace_trio_matches_pandas_models(spark):
    """tool_transitions / turn_latency / retry_loops vs hand-rolled
    pandas models over randomized traces (gaps in tool coverage,
    repeated tools, error bursts, 1-turn conversations)."""
    import datetime

    from vector_spark.dataops.conversations import (
        retry_loops,
        tool_transitions,
        turn_latency,
    )

    rng = random.Random(11)
    tools = ["search", "python", "browser", "none", None]
    levels = ["INFO", "ERROR", "WARN"]
    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    for c in range(80):
        ts = 0.0
        for i in range(rng.randint(1, 15)):
            ts += rng.choice([0.25, 1.0, 3.5, 60.0])
            rows.append(
                (
                    f"c{c:03d}", i, rng.choice(_ROLES),
                    rng.choice(tools), rng.choice(levels),
                    t0 + datetime.timedelta(seconds=ts),
                )
            )
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, tool string,"
        " level string, ts timestamp",
    )
    pdf = pd.DataFrame(
        rows,
        columns=["conv_id", "turn_idx", "role", "tool", "level", "ts"],
    ).sort_values(["conv_id", "turn_idx"])

    # --- tool_transitions model
    exp: dict = {}
    for conv, grp in pdf.groupby("conv_id"):
        calls = [
            t for t in grp.tool if t is not None and t != "none"
        ]
        for a, b in zip(calls, calls[1:]):
            n, convs = exp.get((a, b), (0, set()))
            convs = convs | {conv}
            exp[(a, b)] = (n + 1, convs)
    got = {
        (r.prev_tool, r.next_tool): (r.n_transitions, r.n_convs)
        for r in tool_transitions(df).collect()
    }
    assert got == {k: (n, len(cs)) for k, (n, cs) in exp.items()}

    # --- turn_latency model (avg + max; p50 checked via statistics)
    import statistics

    gaps: dict = {}
    for _, grp in pdf.groupby("conv_id"):
        g = grp.sort_values("turn_idx")
        for (_, a), (_, b) in zip(g.iterrows(), g.iloc[1:].iterrows()):
            us = (b.ts - a.ts) / datetime.timedelta(microseconds=1)
            gaps.setdefault((a.role, b.role), []).append(us)
    lat = {(r.prev_role, r.role): r for r in turn_latency(df).collect()}
    assert set(lat) == set(gaps)
    for k, v in gaps.items():
        r = lat[k]
        assert r.n_gaps == len(v)
        assert abs(r.avg_secs - statistics.fmean(v) / 1e6) < 1e-6
        assert abs(r.max_secs - max(v) / 1e6) < 1e-9
        assert abs(r.p50_secs - statistics.median(v) / 1e6) < 1e-6

    # --- retry_loops model
    exp_runs = []
    for conv, grp in pdf.groupby("conv_id"):
        run: list = []
        for t in grp.sort_values("turn_idx").itertuples():
            ok = (
                t.tool is not None
                and t.tool != "none"
                and t.level == "ERROR"
            )
            if (
                ok
                and run
                and t.tool == run[-1][1]
                and t.turn_idx == run[-1][0] + 1
            ):
                run.append((t.turn_idx, t.tool))
            else:
                if len(run) >= 2:
                    exp_runs.append(
                        (conv, run[0][1], run[0][0], run[-1][0], len(run))
                    )
                run = [(t.turn_idx, t.tool)] if ok else []
        if len(run) >= 2:
            exp_runs.append(
                (conv, run[0][1], run[0][0], run[-1][0], len(run))
            )
    got_runs = sorted(
        (r.conv_id, r.tool, r.start_turn, r.end_turn, r.run_len)
        for r in retry_loops(df, min_len=2).collect()
    )
    assert got_runs == sorted(exp_runs)
