"""Streaming runner tests: batch/stream equivalence of the flagship
pipeline (availableNow drains a file source), stateful kernel units
(LRU dedupe, GCRA throttle), and checkpoint resume."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from vector_spark.runner_batch import build_flagship
from vector_spark.streaming.runner import (
    file_transcripts_stream,
    run_streaming_flagship,
)
from vector_spark.streaming.stateful import _dedupe_kernel, _gcra_kernel

from tests.conftest import SF


@pytest.fixture(scope="module")
def transcripts_dir(spark, transcripts, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("stream_in") / "transcripts")
    transcripts.repartition(4).write.mode("overwrite").parquet(path)
    return path


def test_streaming_matches_batch_counts(spark, transcripts_dir, tmp_path):
    """availableNow drain of the same input produces the same per-sink
    routed-row counts as the batch runner (at-least-the-same gate the
    reference's soak tests assert, here exact)."""
    out_dir = str(tmp_path / "out")
    src = file_transcripts_stream(spark, transcripts_dir)
    res = run_streaming_flagship(
        spark, src, out_dir, checkpoint_dir=str(tmp_path / "ckpt")
    )
    batch_counts = {
        r["_route"]: r["n"]
        for r in build_flagship(spark, SF)
        .groupBy("_route").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert res["counts"] == batch_counts
    written = spark.read.parquet(os.path.join(out_dir, "routed"))
    assert written.count() == sum(batch_counts.values())


def test_streaming_checkpoint_resume(spark, transcripts_dir, tmp_path):
    """Re-running with the same checkpoint dir writes nothing new —
    the offsets are committed (kill-and-resume idempotence)."""
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    src = file_transcripts_stream(spark, transcripts_dir)
    first = run_streaming_flagship(spark, src, out_dir, checkpoint_dir=ckpt)
    n1 = spark.read.parquet(os.path.join(out_dir, "routed")).count()
    src2 = file_transcripts_stream(spark, transcripts_dir)
    second = run_streaming_flagship(spark, src2, out_dir, checkpoint_dir=ckpt)
    n2 = spark.read.parquet(os.path.join(out_dir, "routed")).count()
    assert n1 == n2 and sum(first["counts"].values()) > 0
    assert second["counts"] == {}


def test_dedupe_kernel_lru():
    pdf = pd.DataFrame({"k": ["a", "b", "a", "c", "b", "d", "a"]})
    kept, seen = _dedupe_kernel(pdf, [], ["k"], capacity=5000)
    assert list(kept["k"]) == ["a", "b", "c", "d"]
    # eviction + re-admit: capacity 2, after c arrives a is evicted,
    # so the second a IS re-admitted (dedupe.rs LRU semantics)
    pdf2 = pd.DataFrame({"k": ["a", "b", "c", "a"]})
    kept2, _ = _dedupe_kernel(pdf2, [], ["k"], capacity=2)
    assert list(kept2["k"]) == ["a", "b", "c", "a"]
    # state carries across batches (state holds TAGGED fingerprints)
    kept3, _ = _dedupe_kernel(
        pd.DataFrame({"k": ["x", "y"]}), ["\x02x"], ["k"], 100
    )
    assert list(kept3["k"]) == ["y"]


def test_dedupe_kernel_null_vs_literal_none():
    # NULL must NOT collide with the literal strings 'None'/'nan'
    # (dedupe.rs type-tagged fingerprints)
    pdf = pd.DataFrame({"k": [None, "None", float("nan"), "nan"]})
    kept, seen = _dedupe_kernel(pdf, [], ["k"], capacity=100)
    assert len(kept) == 3  # None and NaN share a null tag; strings kept
    num = pd.DataFrame({"v": [1.5, None]})
    kept2, _ = _dedupe_kernel(num, [], ["v"], capacity=100)
    assert len(kept2) == 2


def test_gcra_kernel():
    # threshold 2 per 10s: emission interval 5s, tau 5s.
    ts = pd.Series([0.0, 1.0, 2.0, 11.0, 30.0, 30.1])
    keep, _ = _gcra_kernel(ts, float("-inf"), threshold=2, window_secs=10.0)
    # t=0 ok (TAT->5); t=1 >= 5-5 ok (TAT->10); t=2 < 10-5 drop;
    # t=11 >= 10-5 ok (TAT->16); t=30 ok (TAT->35); t=30.1 >= 30 ok
    assert list(keep) == [True, True, False, True, True, True]


def test_streaming_dedupe_e2e(spark, tmp_path):
    """applyInPandasWithState dedupe over a file stream."""
    from vector_spark.streaming.stateful import streaming_dedupe

    src_path = str(tmp_path / "in")
    pdf = spark.createDataFrame(
        [("c1", 0, "x"), ("c1", 0, "x"), ("c1", 1, "y"), ("c2", 0, "x")],
        "conv_id string, turn_idx int, text string",
    )
    pdf.write.parquet(src_path)
    stream = (
        spark.readStream.schema(pdf.schema).parquet(src_path)
    )
    deduped = streaming_dedupe(
        stream, match=["conv_id", "turn_idx"], key=["conv_id"],
        order_by="turn_idx",
    )
    out_path = str(tmp_path / "out")
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(out_path)
    assert got.count() == 3


def test_reduce_kernel():
    """Batch probe of the streaming reduce kernel: merge strategies +
    ends/starts flush semantics (reduce/mod.rs:199-230)."""
    import pandas as pd
    from vector_spark.streaming.stateful import _reduce_kernel

    pdf = pd.DataFrame({
        "ts": [1, 2, 3, 4, 5],
        "msg": ["a", "b", "c", "d", "e"],
        "v": [1, 2, 3, 4, 5],
        "end": [False, True, False, False, True],
    })
    strategies = {"msg": "concat", "v": "sum"}
    emitted, acc = _reduce_kernel(pdf, None, strategies, "ts", "end", None)
    assert [e["msg"] for e in emitted] == ["a b", "c d e"]
    assert [e["v"] for e in emitted] == [3, 12]
    assert acc is None

    # starts_when: flush pending group BEFORE adding the marker row
    pdf2 = pd.DataFrame({
        "ts": [1, 2, 3, 4],
        "msg": ["a", "b", "B", "c"],
        "v": [1, 1, 10, 1],
        "start": [False, False, True, False],
    })
    emitted, acc = _reduce_kernel(pdf2, None, strategies, "ts", None, "start")
    assert len(emitted) == 1 and emitted[0]["msg"] == "a b"
    assert acc["n"] == 2 and acc["f"]["v"] == 11  # carry-over group


def test_streaming_reduce_e2e(spark, tmp_path):
    """applyInPandasWithState reduce over a file stream: per-conv
    merge with ends_when flush; pending group stays in state (no
    timeout fires in availableNow mode)."""
    from pyspark.sql import functions as F
    from vector_spark.streaming.stateful import streaming_reduce

    src_path = str(tmp_path / "in")
    pdf = spark.createDataFrame(
        [("c1", 1, "hello", 10), ("c1", 2, "world", 20), ("c1", 3, "bye", 5),
         ("c2", 1, "solo", 7)],
        "conv_id string, ts long, msg string, latency long",
    )
    pdf.write.parquet(src_path)
    stream = (
        spark.readStream.schema(pdf.schema).parquet(src_path)
        .withColumn("is_end", F.col("msg") == "world")
    )
    reduced = streaming_reduce(
        stream, key=["conv_id"],
        strategies={"msg": "concat", "latency": "sum"},
        ts_col="ts", ends_col="is_end",
    )
    out_path = str(tmp_path / "out")
    q = (
        reduced.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r.conv_id: r for r in spark.read.parquet(out_path).collect()}
    # only c1's ended group emits; c2 and c1's tail stay pending
    assert list(got) == ["c1"]
    assert got["c1"].msg == "hello world"
    assert got["c1"].latency == 30.0
    assert got["c1"].n == 2 and got["c1"].ts_first == 1 and got["c1"].ts_last == 2


def test_streaming_reduce_null_skip(spark, tmp_path):
    """NULL numeric events are SKIPPED by sum/max/min, matching SQL
    aggregate semantics: pandas hands nulls to the kernel as NaN,
    which is truthy — regression for the NaN-poisoned-sum bug
    (an all-null group still sums to 0 per the pinned contract)."""
    from pyspark.sql import functions as F
    from vector_spark.streaming.stateful import streaming_reduce

    src_path = str(tmp_path / "in")
    pdf = spark.createDataFrame(
        [("c1", 1, 10), ("c1", 2, None), ("c1", 3, 5), ("c1", 4, None),
         ("c2", 1, None), ("c2", 2, None)],
        "conv_id string, ts long, latency long",
    )
    pdf.write.parquet(src_path)
    stream = (
        spark.readStream.schema(pdf.schema).parquet(src_path)
        .withColumn("is_end", F.col("ts") == 4)
        .withColumn("is_end", F.col("is_end") | (F.col("ts") == 2))
    )
    reduced = streaming_reduce(
        stream, key=["conv_id"],
        strategies={"latency": "sum"},
        ts_col="ts", ends_col="is_end",
    )
    out_path = str(tmp_path / "out")
    q = (
        reduced.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.conv_id, r.ts_first): r
        for r in spark.read.parquet(out_path).collect()
    }
    assert got[("c1", 1)].latency == 10.0  # 10 + NULL -> 10, not NaN
    assert got[("c1", 3)].latency == 5.0
    assert got[("c2", 1)].latency == 0.0  # all-null group sums to 0


def test_streaming_crash_replay_epoch(spark, transcripts_dir, tmp_path):
    """Crash window between sink write and checkpoint commit: delete
    the commit marker after a successful run (parquet already on
    disk), restart with the same checkpoint in a FRESH runner (new
    seen_epochs — the other process's memory is gone). Structured
    streaming replays the uncommitted epoch with the same epoch_id;
    the _epoch-partitioned dynamic overwrite must REWRITE the epoch's
    partitions, not append duplicates."""
    import glob as _glob

    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    src = file_transcripts_stream(spark, transcripts_dir)
    first = run_streaming_flagship(spark, src, out_dir, checkpoint_dir=ckpt)
    first["query"].stop()  # the "crashed" process is gone
    routed_path = os.path.join(out_dir, "routed")
    n1 = spark.read.parquet(routed_path).count()
    assert n1 > 0 and sum(first["counts"].values()) == n1

    commits = [
        p
        for p in _glob.glob(os.path.join(ckpt, "commits", "*"))
        if os.path.basename(p).isdigit()
    ]
    assert commits, "no commit markers written"
    latest = max(commits, key=lambda p: int(os.path.basename(p)))
    os.remove(latest)
    # the Hadoop local FS writes a .N.crc sibling; a stale one makes
    # the commit rewrite fail as a spurious concurrent-use error
    crc = os.path.join(
        os.path.dirname(latest), f".{os.path.basename(latest)}.crc"
    )
    if os.path.exists(crc):
        os.remove(crc)

    # the terminated query deregisters its checkpoint-path claim
    # asynchronously; a real crash-restart has a new process (no
    # claim at all), so waiting it out is faithful, not a cheat
    import time as _time

    second = None
    for _ in range(20):
        try:
            src2 = file_transcripts_stream(spark, transcripts_dir)
            second = run_streaming_flagship(
                spark, src2, out_dir, checkpoint_dir=ckpt
            )
            break
        except Exception as e:  # noqa: BLE001
            if "concurrently using" not in str(e):
                raise
            _time.sleep(0.5)
    assert second is not None, "checkpoint path never released"
    n2 = spark.read.parquet(routed_path).count()
    # exactly-once output: the replayed epoch replaced itself
    assert n2 == n1
    # the replayed batch was re-processed (this fresh process did see
    # it once) but never more than the full first run
    replayed = sum(second["counts"].values())
    assert 0 < replayed <= n1


def test_kafka_shaped_contract(spark, transcripts_dir, tmp_path):
    """Kafka contract test without a broker: a file-backed stream
    with the kafka source's exact row shape feeds decode ->
    parse -> enrich -> route unchanged; per-sink counts match the
    batch runner. Swapping in readStream.format('kafka') is a
    one-line source change (kafka_stream)."""
    from vector_spark.streaming.runner import (
        KAFKA_SOURCE_SCHEMA,
        decode_kafka_transcripts,
        kafka_shaped_stream,
        run_streaming_flagship,
    )

    from pyspark.sql.types import StructType

    shaped = kafka_shaped_stream(spark, transcripts_dir)
    # schema IS the kafka source schema (names + types)
    want = StructType.fromDDL(KAFKA_SOURCE_SCHEMA)
    got = [(f.name, f.dataType) for f in shaped.schema.fields]
    assert got == [(f.name, f.dataType) for f in want.fields]

    out_dir = str(tmp_path / "out")
    res = run_streaming_flagship(
        spark,
        decode_kafka_transcripts(shaped),
        out_dir,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    batch_counts = {
        r["_route"]: r["n"]
        for r in build_flagship(spark, SF)
        .groupBy("_route").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert res["counts"] == batch_counts


def test_reduce_acc_add_null_after_value_max_min():
    """max/min must SKIP nulls (batch F.max parity) instead of
    raising on max(cur, None)."""
    from vector_spark.streaming.stateful import _reduce_acc_add

    strategies = {"v": "max", "w": "min"}
    acc = _reduce_acc_add(None, {"ts": 1, "v": 5, "w": 5}, strategies, "ts")
    acc = _reduce_acc_add(
        acc, {"ts": 2, "v": float("nan"), "w": None}, strategies, "ts"
    )
    acc = _reduce_acc_add(acc, {"ts": 3, "v": 7, "w": 3}, strategies, "ts")
    assert acc["f"]["v"] == 7 and acc["f"]["w"] == 3
