"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

`value` is the wall-clock seconds of the flagship end-to-end pipeline
(parse -> enrich -> route -> hourly aggregate, including the fan-out
partitioned sink write); `queries` carries per-query seconds for the
headline set. Extra keys (`turns`, `turns_per_sec`) quantify the
BASELINE.json metric "turns/sec end-to-end".

Modes:
  python bench.py                 # full headline run, one JSON line
  python bench.py --flagship-only # flagship timing only (scaling runs)
  python bench.py --scaling       # local[8] vs local[32] subprocesses,
                                  # reports throughput + efficiency
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# headline subset of __spark_entry__.queries(): every pipeline stage,
# the heavier dataops, and two TPC-H-shaped aggregates
HEADLINE = [
    "parse",
    "enrich",
    "route_counts",
    "aggregate_hourly",
    "reduce_conversations",
    "log_to_metric_hourly",
    "events_sessionize",
    "events_tumbling",
    "q1_pricing",
    "q3_revenue",
    "docs_text_stats",
    "docs_minhash_lsh",
    "ann_topk",
    # round 2 additions: parser family + new operator queries
    "apache_error_parse",
    "vpc_flow_parse",
    "alb_parse",
    "sessionize_startswhen",
    "reduce_expire",
    "aggregate_mixed_kinds",
    "latency_histogram",
    "dropped_port",
    # round 2: VRL program tiers, datadog condition, gelf codec,
    # and the exact near-dup twin
    "remap_vrl",
    "remap_vrl_interp",
    "datadog_filter",
    "gelf_decode",
    "docs_ngram_jaccard",
    # round 2: wire codecs
    "statsd_decode",
    "prometheus_encode",
    # round 3: mergeable-sketch rollup
    "sketch_merge",
    # round 3: training-data pipeline ops + approximate ANN paths
    "docs_pii_scrub",
    "docs_gopher_quality",
    "docs_decontam",
    "docs_stratified_split",
    "docs_unigram_logprob",
    "ann_topk_lsh",
    "ann_topk_ivf",
    # round 3: codec round trips under the gate
    "native_proto_roundtrip",
    "avro_roundtrip",
    # round 3: duplicate-cluster resolution (CC over near-dup pairs)
    "docs_dup_clusters",
    # round 4/5: the benched kmeans/semdedup forms are the 100 TB
    # twins ONLY (BLAS kernels + groupBy-avg centroids) — the exact
    # collect_list oracle anchors stay REGISTERED for the correctness
    # gate but out of the HEADLINE so the benched set is exactly the
    # scale-shaped plans (r4 VERDICT ask #7)
    "emb_kmeans_scale",
    "emb_semdedup_scale",
    # round 5: streaming runner under the bench (spec_runner,
    # Trigger.AvailableNow over the same parquet) — stateless route
    # counts + the stateful event-time windowed aggregate
    "stream_route_counts",
    "stream_agg_hourly",
    # round 5: retrieval-side training-data ops (BM25 postings +
    # broadcast-vocab scoring, zero-shuffle chunking, int8
    # quantization of the embedding store)
    "docs_bm25",
    "docs_chunk",
    "emb_quantize",
    "docs_hybrid_rrf",
    "docs_pack",
    # round 5: conversation-level rollups over the transcripts payload
    "conv_dedup",
    "conv_stats",
    # round 5: retrieval against the int8-quantized store
    "ann_topk_quantized",
    # round 5: training-batch assembly + token-budget mixing
    "docs_pack_assemble",
    "docs_token_quota",
    # round 5: SFT-side conversation curation (whole-conversation
    # packing, quality gates, same-role turn repair)
    "conv_pack",
    "conv_quality",
    "conv_repair",
    # round 5: stratified bucketing, canned-reply detection, SFT
    # pair/context mining, and the composed curation pipeline
    "docs_length_deciles",
    "conv_template_replies",
    "conv_sft_pairs",
    "conv_context",
    "conv_curation_e2e",
    # round 5: general as-of join (union-window plan, oracle = DuckDB
    # native ASOF JOIN)
    "conv_asof_prompts",
    # round 5: exact per-source balanced subsampling + incremental
    # (store-joined, no-corpus-rescan) exact dedup
    "docs_balanced_sample",
    "docs_dedup_incremental",
    # round 5: tool-axis operational rollup + native ROLLUP
    # grouping-sets dashboard aggregate
    "tool_stats",
    "tool_hourly_rollup",
    # round 5: join-tree + scan-pushdown evidence rows (TPC-H Q5/Q6
    # shapes over the driver tables)
    "q5_local_supplier",
    "q6_forecast",
    # round 5: three-tokenizer counting row (whitespace / estimate /
    # BPE-ish regex)
    "docs_bpe_tokens",
    # round 5: ExactSubstr duplicated-span detection + removal
    # (one corpus exchange on the window hash, window-aggregate
    # duplicate test, islands merge over the hit set only)
    "docs_dup_spans",
    "docs_despan",
    # round 5: agent-trace analytics — tool-chain Markov transitions,
    # per-role-transition latency percentiles, stuck-agent error-run
    # detection (gaps-and-islands sharing one conv_id exchange)
    "tool_transitions",
    "turn_latency",
    "retry_loops",
]


def _sf_label(sf_dir: str) -> float | str:
    base = os.path.basename(sf_dir.rstrip("/"))
    if base.startswith("sf"):
        try:
            return float(base[2:])
        except ValueError:
            pass
    return base


def _materialize(df) -> None:
    """Force full computation of every column without disk I/O."""
    df.write.format("noop").mode("overwrite").save()


def warm_up(spark) -> dict:
    """One-time costs a long-lived cluster amortizes to zero: JVM JIT,
    Python UDF worker fork+import, and the transcripts-table
    derivation (at production scale a stored Iceberg table — the
    derivation is test scaffolding, memoized by load_transcripts).
    Timed and reported, but kept out of the throughput metric."""
    from vector_spark.functions import parse_transcripts
    from vector_spark.transcripts import load_transcripts

    t0 = time.perf_counter()
    spark.range(1000).selectExpr("sum(id)").collect()
    # spin up the Arrow/pandas UDF workers with the real parse kernel
    warm_df = spark.range(10000).selectExpr(
        "'conv' as conv_id", "0 as turn_idx", "'user' as role",
        "'[INFO] reqid=00000000 latency_ms=1 msg=x' as text",
        "cast(null as string) as tool", "current_timestamp() as ts",
    )
    parse_transcripts(warm_df).count()
    jvm_py_sec = time.perf_counter() - t0
    t0 = time.perf_counter()
    n = load_transcripts(spark, SF_DIR).count()
    return {
        "warmup_sec": round(jvm_py_sec, 3),
        "derive_sec": round(time.perf_counter() - t0, 3),
        "input_turns": n,
    }


def run_flagship_bench(spark) -> dict:
    """Flagship end-to-end incl. the partitioned fan-out write."""
    from pyspark.sql import functions as F

    from vector_spark.runner_batch import (
        build_flagship,
        flagship_aggregate,
        repartition_for_fanout,
    )

    out_dir = tempfile.mkdtemp(prefix="vector_spark_bench_")

    def once() -> tuple[float, int, int]:
        t0 = time.perf_counter()
        routed = build_flagship(spark, SF_DIR)
        (
            repartition_for_fanout(routed)
            .write.mode("overwrite")
            .partitionBy("_route", "role")
            .parquet(os.path.join(out_dir, "routed"))
        )
        # collect the (small) aggregate itself: finishes the pipeline
        # AND yields routed-turn counts without a separate count job
        agg_rows = flagship_aggregate(
            spark.read.parquet(os.path.join(out_dir, "routed"))
        ).collect()
        turns = sum(r["turns"] for r in agg_rows if r["sink"] != "_unmatched")
        return time.perf_counter() - t0, turns, len(agg_rows)

    def child_cpu() -> float:
        """CPU-seconds consumed by this process's whole descendant
        tree (live JVM + python workers), via /proc. Monotonic only
        while processes live; worker churn between reads undercounts
        slightly — fine for a trend metric."""
        tick = os.sysconf("SC_CLK_TCK")
        me = os.getpid()
        children: dict[int, list[int]] = {}
        usage: dict[int, float] = {}
        for pid_s in os.listdir("/proc"):
            if not pid_s.isdigit():
                continue
            try:
                with open(f"/proc/{pid_s}/stat") as f:
                    parts = f.read().rsplit(")", 1)[1].split()
                ppid = int(parts[1])
                usage[int(pid_s)] = (int(parts[11]) + int(parts[12])) / tick
                children.setdefault(ppid, []).append(int(pid_s))
            except (OSError, IndexError, ValueError):
                continue
        total, frontier = 0.0, [me]
        while frontier:
            pid = frontier.pop()
            total += usage.get(pid, 0.0)
            frontier.extend(children.get(pid, []))
        return total

    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "4"))
    try:
        # first execution pays whole-stage-codegen JIT compilation of
        # the fused pipeline stage (measured 3-4x on first run); the
        # best of the remaining reps is the steady-state number a
        # long-lived cluster actually sustains (min-of-N damps the
        # shared-VM noise on this box). Cold is reported too.
        cold_sec, turns, agg_rows = once()
        warm, cpu = [], []
        for _ in range(reps):
            c0 = child_cpu()
            warm.append(once()[0])
            cpu.append(child_cpu() - c0)
        sec = min(warm)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    return {
        "sec": round(sec, 3),
        "cold_sec": round(cold_sec, 3),
        "warm_secs": [round(w, 3) for w in warm],
        # CPU-seconds consumed by the JVM+python tree per warm run:
        # if this is ~constant across parallelism levels the job is
        # scale-free (no serial section) and wall-clock deltas are
        # host contention, not engine behavior
        "cpu_secs": [round(c, 2) for c in cpu],
        "turns_routed": turns,
        "aggregate_rows": agg_rows,
        "turns_per_sec": round(turns / sec, 1),
    }


def soak_bench(spark, target_lines: int = 2_000_000) -> dict:
    """Soak-shaped throughput probe in the reference's own unit
    (MiB/s/core, soaks/README.md:105-115).

    Two legs over a pre-materialized syslog-line parquet (generation
    excluded, like lading's offered-load separation):
      * parse-only  — syslog -> parse_regex remap, the shape of
        datadog_agent_remap_datadog_logs (reference mean ~7.86
        MiB/s/core on 4 cores).
      * logs2metric — syslog -> parse -> log_to_metric hourly rollup,
        the shape of syslog_regex_logs2metric_ddmetrics (methodology-
        only soak; no in-repo reference number).
    Best-of-2 warm runs; bytes = sum(length(line)) exact.
    """
    from pyspark.sql import functions as F

    from vector_spark.operators.log_to_metric import MetricSpec, log_to_metric
    from vector_spark.sources import demo_logs_batch, parse_syslog

    lines = demo_logs_batch(spark, SF_DIR, "syslog")
    n_in = lines.count()
    mult = max(1, target_lines // max(n_in, 1))
    tmp = tempfile.mkdtemp(prefix="soak_", dir=os.environ.get("TMPDIR"))
    path = os.path.join(tmp, "lines")
    # replicate with distinct event_ids so parse output cardinality
    # scales too; repartition so every core has work
    (
        lines.select(
            F.explode(F.sequence(F.lit(0), F.lit(mult - 1))).alias("rep"),
            "event_id",
            "line",
        )
        .select((F.col("event_id") + F.col("rep") * n_in).alias("event_id"), "line")
        .repartition(int(CPUS) * 2)
        .write.mode("overwrite").parquet(path)
    )
    src = spark.read.parquet(path)
    total_bytes = src.select(F.sum(F.length("line"))).collect()[0][0]
    mib = total_bytes / (1024 * 1024)

    def best_of(build, runs: int = 2) -> float:
        secs = []
        for _ in range(runs):
            t0 = time.perf_counter()
            _materialize(build())
            secs.append(time.perf_counter() - t0)
        return min(secs)

    parsed = parse_syslog(src)
    parse_sec = best_of(
        lambda: parsed.select("hostname", "appname", "procid", "msgid", "message")
    )
    metric_sec = best_of(
        lambda: log_to_metric(
            parsed.filter(F.col("timestamp").isNotNull()),
            [MetricSpec("counter", "events")],
            tags=["hostname", "appname"],
            interval="1 hour",
            ts_col="timestamp",
        )
    )
    shutil.rmtree(tmp, ignore_errors=True)
    cores = int(CPUS)
    return {
        "lines": n_in * mult,
        "mib": round(mib, 1),
        "parse_sec": round(parse_sec, 3),
        "parse_mib_s_core": round(mib / parse_sec / cores, 3),
        "logs2metric_sec": round(metric_sec, 3),
        "logs2metric_mib_s_core": round(mib / metric_sec / cores, 3),
    }


def main_soak_only() -> int:
    """One soak measurement at $SPARK_GRAFT_CPUS, printed as a JSON
    line. Run as a subprocess by the full bench for the local[4]
    reference-comparable leg (the reference's soak numbers are 4-core:
    soaks/README.md), so the low-parallelism session doesn't share a
    JVM with the 32-thread one."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from vector_spark.session import get_spark

    spark = get_spark("vector-spark-soak", master=f"local[{CPUS}]")
    out = soak_bench(spark)
    spark.stop()
    print(json.dumps(out))
    return 0


def main() -> int:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from vector_spark.session import get_spark

    spark = get_spark("vector-spark-bench", master=f"local[{CPUS}]")
    flagship_only = "--flagship-only" in sys.argv

    warm = warm_up(spark)
    flagship = run_flagship_bench(spark)

    result = {
        "metric": "flagship end-to-end parse->enrich->route->aggregate wall sec "
        f"(local[{CPUS}])",
        "value": flagship["sec"],
        "unit": "sec",
        "sf": _sf_label(SF_DIR),
        "turns": flagship["turns_routed"],
        "turns_per_sec": flagship["turns_per_sec"],
        "cold_sec": flagship["cold_sec"],
        "warm_secs": flagship["warm_secs"],
        "cpu_secs": flagship["cpu_secs"],
        **warm,
        "queries": {"flagship_e2e": flagship["sec"]},
    }

    if not flagship_only:
        import __spark_entry__ as entrymod

        qs = entrymod.queries()
        # noise discipline (ported from --scaling): the HEADLINE set
        # is run in INTERLEAVED rounds and each query keeps its
        # minimum — back-to-back single shots confound query cost
        # with whichever co-tenant noise era they land in, and the
        # first pass additionally pays codegen JIT per plan shape
        rounds = int(os.environ.get("SPARK_GRAFT_BENCH_QUERY_ROUNDS", "3"))
        timings: dict[str, list[float]] = {n: [] for n in HEADLINE}
        for _ in range(rounds):
            for name in HEADLINE:
                t0 = time.perf_counter()
                _materialize(qs[name](spark, SF_DIR))
                timings[name].append(round(time.perf_counter() - t0, 3))
        for name in HEADLINE:
            result["queries"][name] = min(timings[name])
        result["query_rounds"] = rounds
        result["queries_all_secs"] = timings
        result["soak"] = soak_bench(spark)
        # host-ceiling probe in EVERY bench file: a pure-CPU sha1
        # scaling probe quantifies how contended/overcommitted the
        # host was during this run, so a reader can tell engine
        # regressions from co-tenant weather
        result["host_probe"] = _host_ceiling_probe(8, 32, secs=3.0)

    spark.stop()
    if not flagship_only:
        # after stop(): the idle 32-thread JVM must not share the box
        # with the 4-core reference-comparable leg
        result["soak_local4"] = _soak_local4()
    # full detail (per-round arrays, soak, probe) goes to a sidecar —
    # the driver's tail capture keeps only the LAST 2000 chars of
    # stdout, so the final line must fit inside that or the round's
    # bench artifact records parsed:null (round 3's 3.5 KB line did)
    if not flagship_only:
        # only the FULL run owns the committed sidecar — scaling legs
        # run --flagship-only as subprocesses and must not clobber it
        detail_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
        )
        with open(detail_path, "w") as fh:
            json.dump(result, fh, indent=1)
    compact = {
        k: v
        for k, v in result.items()
        if k not in (
            "queries_all_secs", "soak", "soak_local4", "host_probe", "cpu_secs"
        )
    }
    if flagship_only:
        # scaling legs read this line: cpu_secs lets the artifact
        # separate real scaling loss (cpu grows with cores) from host
        # weather (wall grows, cpu flat)
        compact["cpu_secs"] = result.get("cpu_secs")
    compact["queries"] = {
        n: round(s, 2) for n, s in result["queries"].items()
    }
    compact["detail"] = "BENCH_DETAIL.json"
    line = json.dumps(compact)
    if len(line) > 1900:  # hard guard: keep only the slowest queries
        slow = sorted(
            compact["queries"].items(), key=lambda kv: -kv[1]
        )[:25]
        compact["queries"] = dict(sorted(slow))
        compact["queries_truncated"] = True
        line = json.dumps(compact)
    print(line)
    return 0


def _soak_local4() -> dict:
    """The reference-comparable soak datum: a fresh local[4] process
    (reference soaks run 4-core — datadog_agent_remap_datadog_logs
    mean ~7.86 MiB/s/core) AFTER the 32-thread session has stopped
    competing, best of 2 attempts. Recorded every round so the series
    r2 (8.14-8.22) onward stays alive."""
    here = os.path.abspath(__file__)
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    for attempt in (1, 2):
        out = subprocess.run(
            [sys.executable, here, "--soak-only"],
            env=env, capture_output=True, text=True,
        )
        if out.returncode == 0 and out.stdout.strip():
            try:
                return json.loads(out.stdout.strip().splitlines()[-1])
            except json.JSONDecodeError:
                pass
        print(
            f"# local[4] soak attempt {attempt} failed "
            f"(rc={out.returncode}): {out.stderr[-300:]}",
            file=sys.stderr,
        )
    return {"error": "local[4] soak failed twice"}


def _prepare_scaled_input(mult: int) -> str:
    """Multiply the events table `mult`x into a scratch sf dir so the
    scaling comparison measures COMPUTE, not fixed job overhead.
    Replicas get disjoint user_id/event_id ranges (same skew shape,
    same per-conversation distributions — the arithmetic derivations
    are mod-based so offsetting by multiples of the moduli's lcm
    would be ideal; offsetting by 10^6/10^9 keeps distributions
    statistically identical)."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from vector_spark.session import get_spark

    out = os.path.join(
        tempfile.gettempdir(),
        f"vector_spark_scaled_{_sf_label(SF_DIR)}_x{mult}",
    )
    if os.path.exists(os.path.join(out, "events.parquet", "_SUCCESS")):
        return out
    spark = get_spark("vector-spark-scale-prep", master="local[32]")
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    reps = spark.range(mult).withColumnRenamed("id", "_rep")
    # replica offsets: large enough for disjoint id ranges (base
    # event_ids top out at sf*10^6), small enough that the
    # derivation's `event_id * 2654435761` fits in int64 under ANSI
    # mode for any mult up to ~1700 (2*10^6 offset: max event_id
    # 1700*2e6*2654435761 ~ 9.0e18 < 2^63-1; the old 10^7 offset
    # overflowed past mult~340)
    big = ev.crossJoin(reps).selectExpr(
        "event_id + _rep * 2000000 AS event_id",
        "user_id + _rep * 1000000 AS user_id",
        *[c for c in ev.columns if c not in ("event_id", "user_id")],
    )
    big.repartition(64).write.mode("overwrite").parquet(
        os.path.join(out, "events.parquet")
    )
    # pre-materialize the transcripts table once so each scaling
    # subprocess reads a stored table instead of re-deriving 30M rows
    from vector_spark.transcripts import derive_transcripts

    derive_transcripts(spark, out).repartition(64).write.mode(
        "overwrite"
    ).parquet(os.path.join(out, "transcripts.parquet"))
    spark.stop()
    return out


def _burn_sha1(deadline: float) -> int:
    import hashlib

    h, i = hashlib.sha1(b"x"), 0
    while time.perf_counter() < deadline:
        for _ in range(1000):
            h.update(h.digest())
        i += 1000
    return i


def _host_ceiling_probe(n: int, n4: int, secs: float = 6.0) -> dict:
    """Pure-CPU scaling ceiling of THIS host, measured with the same
    N-vs-4N thread counts as the engine legs: each thread runs an
    independent sha1 loop (no shared state, no I/O); the speedup is
    the most parallelism the hypervisor physically delivers. Engine
    efficiency should be judged against this ceiling, not against a
    perfect 4.0 the host itself cannot reach."""
    import multiprocessing as mp

    def rate(procs: int) -> float:
        deadline = time.perf_counter() + secs
        with mp.Pool(procs) as pool:
            counts = pool.map(_burn_sha1, [deadline] * procs)
        return sum(counts) / secs

    # measure the engine window (n vs 4n) AND its doubled shadow
    # (2n vs 8n): an Arrow-UDF stage runs a JVM task thread plus a
    # python worker per slot, so local[n] keeps ~2n threads runnable
    out = {}
    rates = {k: rate(k) for k in sorted({n, n4, 2 * n, 2 * n4})}
    for label, lo, hi in (("", n, n4), ("_2x", 2 * n, 2 * n4)):
        out[f"probe_iters_per_sec_n{label}"] = round(rates[lo])
        out[f"probe_iters_per_sec_4n{label}"] = round(rates[hi])
        out[f"host_ceiling_speedup{label}"] = round(rates[hi] / rates[lo], 3)
        out[f"host_ceiling_efficiency{label}"] = round(
            rates[hi] / rates[lo] / (n4 / n), 3
        )
    return out


def main_scaling() -> int:
    """Run the flagship at two parallelism levels (N=8, 4N=32) on the
    same input; report throughput at both plus scaling efficiency
    (BASELINE.json: >=0.8 between N and 4N executors). The input is
    the events table multiplied $SPARK_GRAFT_SCALE_MULT times
    (default 30, ~3M turns at sf0.1) so per-job fixed overhead
    (~2-5 s) doesn't mask the compute scaling being measured."""
    here = os.path.abspath(__file__)
    # 300x sf0.1 = 30M turns: big enough that per-job fixed latency
    # (~2-4 s/job on this VM) is <10% of the n4 runtime being compared
    mult = int(os.environ.get("SPARK_GRAFT_SCALE_MULT", "300"))
    sf_dir = _prepare_scaled_input(mult) if mult > 1 else SF_DIR
    # N vs 4N parallelism. Default N=2: this sandbox advertises 32
    # vCPUs but a pure-CPU probe (1e9 sha1) tops out at ~2.3x going
    # 8->32 threads (hypervisor overcommit + ~4% steal + co-tenant
    # noise), while 4->16 sustains 3.3x. Arrow-UDF stages run a JVM
    # task thread AND a python worker concurrently per slot (~2x
    # local[N] runnable threads), so local[2] vs local[8] keeps even
    # the 4N leg inside the host's honest capacity and measures the
    # ENGINE's scaling, not the hypervisor's oversubscription.
    n = int(os.environ.get("SPARK_GRAFT_SCALE_N", "2"))
    pair = (str(n), str(4 * n))
    # this host's background load swings run times 2-3x on a tens-of-
    # minutes timescale, so the two legs are INTERLEAVED across
    # `rounds` alternating slices and each leg keeps its minimum —
    # comparing two back-to-back single runs confounds engine scaling
    # with whichever noise era each leg happened to land in
    rounds = int(os.environ.get("SPARK_GRAFT_SCALE_ROUNDS", "3"))
    samples: dict[str, list[dict]] = {c: [] for c in pair}
    for _ in range(rounds):
        for cpus in pair:
            env = dict(
                os.environ,
                SPARK_GRAFT_CPUS=cpus,
                SPARK_GRAFT_SF_DIR=sf_dir,
                SPARK_GRAFT_BENCH_REPS="1",
                # RAM-backed scratch: sink writes measure the engine,
                # not this VM's shared-disk jitter
                TMPDIR=os.environ.get("SPARK_GRAFT_SCALE_TMP", "/dev/shm"),
            )
            # a leg can die to transient host pressure (port clash,
            # fork failure) — retry once, then skip the sample rather
            # than losing the whole interleaved run
            for attempt in (1, 2):
                out = subprocess.run(
                    [sys.executable, here, "--flagship-only"],
                    env=env, capture_output=True, text=True,
                )
                if out.returncode == 0 and out.stdout.strip():
                    samples[cpus].append(
                        json.loads(out.stdout.strip().splitlines()[-1])
                    )
                    break
                print(
                    f"# leg local[{cpus}] attempt {attempt} failed "
                    f"(rc={out.returncode}): {out.stderr[-400:]}",
                    file=sys.stderr,
                )
    if not all(samples[c] for c in pair):
        print(json.dumps({"error": "no successful samples for a leg"}))
        return 1
    best = {c: min(s, key=lambda r: r["value"]) for c, s in samples.items()}
    lo, hi = best[pair[0]], best[pair[1]]
    t_lo, t_hi = lo["turns_per_sec"], hi["turns_per_sec"]
    # host ceiling measured in the SAME session, bracketing the legs
    probe = _host_ceiling_probe(n, 4 * n)
    eff = round((t_hi / t_lo) / 4.0, 3)
    ceiling = max(
        probe["host_ceiling_efficiency"], probe["host_ceiling_efficiency_2x"]
    )
    print(json.dumps({
        "metric": f"scaling efficiency local[{pair[0]}] -> local[{pair[1]}]",
        "sf": _sf_label(SF_DIR),
        "scale_mult": mult,
        "input_turns": hi.get("input_turns"),
        f"turns_per_sec_n{pair[0]}": t_lo,
        f"turns_per_sec_n{pair[1]}": t_hi,
        "speedup": round(t_hi / t_lo, 3),
        "efficiency": eff,
        "efficiency_vs_host_ceiling": round(eff / ceiling, 3) if ceiling else None,
        **probe,
        f"sec_n{pair[0]}": lo["value"],
        f"sec_n{pair[1]}": hi["value"],
        "all_secs": {c: [r["value"] for r in s] for c, s in samples.items()},
        "all_cpu_secs": {
            c: [r.get("cpu_secs") for r in s] for c, s in samples.items()
        },
    }))
    return 0


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        raise SystemExit(main_scaling())
    if "--soak-only" in sys.argv:
        raise SystemExit(main_soak_only())
    raise SystemExit(main())
