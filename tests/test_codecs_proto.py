"""Native (protobuf) codec — lib/codecs/src/{encoding,decoding}/format/
native.rs twin over lib/vector-core/proto/event.proto.

Wire-format bytes are pinned against hand-derived vectors from the
public protobuf encoding spec, so a regression in the codec cannot
silently re-define the format. Round-trips cover the Value tree,
Log fields/value duality (proto.rs:243-258), metric variants
(counter/gauge/set/distribution2/aggregated_histogram3/sketch), and
the native+length_delimited transport pairing.
"""

from __future__ import annotations

import math
import struct
from datetime import datetime, timezone

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from vector_spark.codecs_proto import (
    decode_event_array,
    decode_log,
    decode_metric,
    decode_value,
    encode_event_array,
    encode_log,
    encode_metric,
    encode_value,
)

UTC = timezone.utc


# ---------------------------------------------------------------------------
# pinned wire vectors (derived by hand from the protobuf spec)
# ---------------------------------------------------------------------------


def test_log_event_array_pinned_bytes():
    # EventArray{logs: [Log{fields: {"msg": Value{raw_bytes: "hi"}}}]}
    buf = encode_event_array(logs=[encode_log({"msg": "hi"})])
    assert buf.hex() == "0a0f0a0d0a0b0a036d736712040a026869"


def test_counter_metric_pinned_bytes():
    # Metric{name: "hits", counter: Counter{value: 2.5}}; kind
    # Incremental=0 is the proto3 default and must be omitted.
    mt = encode_metric("hits", value_type="counter", value=2.5)
    le = struct.pack("<d", 2.5).hex()
    assert mt.hex() == "0a04686974732a0909" + le


def test_value_scalars_pinned_bytes():
    assert encode_value(None).hex() == "4800"          # null=9 enum 0
    assert encode_value(True).hex() == "3001"          # boolean=6
    assert encode_value(7).hex() == "2007"             # integer=4
    assert encode_value(-1).hex() == "20" + "ff" * 9 + "01"  # 2's comp
    assert encode_value("a").hex() == "0a0161"         # raw_bytes=1
    assert (
        encode_value(1.0).hex() == "29" + struct.pack("<d", 1.0).hex()
    )  # float=5, I64


def test_timestamp_pinned_bytes():
    # Timestamp{seconds=1, nanos=500000000} inside Value field 2
    v = encode_value(datetime(1970, 1, 1, 0, 0, 1, 500000, tzinfo=UTC))
    assert v.hex() == "120808011080cab5ee01"
    assert decode_value(v) == datetime(1970, 1, 1, 0, 0, 1, 500000, tzinfo=UTC)


# ---------------------------------------------------------------------------
# round trips
# ---------------------------------------------------------------------------


def test_log_fields_roundtrip():
    ev = {
        "msg": "GET /index",
        "status": 200,
        "latency": 3.25,
        "ok": True,
        "gone": None,
        "tags": {"a": "x", "b": 2},
        "path": ["r", 1, None],
        "ts": datetime(2026, 1, 2, 3, 4, 5, 678000, tzinfo=UTC),
    }
    out = decode_log(encode_log(ev))
    assert out == ev


def test_log_scalar_value_roundtrip():
    # scalar-rooted log: dummy "." fields entry + value (proto.rs:255-258)
    buf = encode_log(None, value="just a line")
    assert decode_log(buf) == "just a line"


def test_metric_variants_roundtrip():
    ts = datetime(2026, 8, 18, 12, 0, 0, tzinfo=UTC)
    cases = [
        dict(value_type="counter", value=4.0, kind="absolute",
             tags={"env": "prod"}, timestamp=ts, namespace="ns"),
        dict(value_type="gauge", value=-2.5),
        dict(value_type="set", set_values=["a", "b", "c"]),
        dict(value_type="distribution", samples=[(1.5, 2), (3.0, 1)]),
        dict(value_type="aggregated_histogram",
             buckets=[(0.5, 3), (2.0, 7)], agg_count=10, agg_sum=9.25),
        dict(value_type="sketch",
             sketch={"count": 5, "min": 0.1, "max": 9.0, "sum": 12.0,
                     "avg": 2.4, "k": [-3, 0, 7], "n": [1, 2, 2]}),
    ]
    for case in cases:
        m = decode_metric(encode_metric("m", **case))
        assert m["name"] == "m"
        vt = case["value_type"]
        if vt == "counter":
            assert m["counter"] == {"value": 4.0}
            assert m["kind"] == "absolute"
            assert m["tags"] == {"env": "prod"}
            assert m["timestamp"] == ts
            assert m["namespace"] == "ns"
        elif vt == "gauge":
            assert m["gauge"] == {"value": -2.5}
            assert m["kind"] == "incremental"
        elif vt == "set":
            assert m["set"] == {"values": ["a", "b", "c"]}
        elif vt == "distribution":
            assert m["distribution"]["samples"] == [
                {"value": 1.5, "rate": 2}, {"value": 3.0, "rate": 1}]
        elif vt == "aggregated_histogram":
            assert m["aggregated_histogram"] == {
                "buckets": [{"upper_limit": 0.5, "count": 3},
                            {"upper_limit": 2.0, "count": 7}],
                "count": 10, "sum": 9.25}
        elif vt == "sketch":
            assert m["sketch"]["k"] == [-3, 0, 7]
            assert m["sketch"]["n"] == [1, 2, 2]
            assert m["sketch"]["count"] == 5
            assert m["sketch"]["avg"] == 2.4


def test_event_array_many_events():
    logs = [encode_log({"i": i}) for i in range(5)]
    out = decode_event_array(encode_event_array(logs=logs))
    assert [ev for _, ev in out] == [{"i": i} for i in range(5)]
    mts = [encode_metric(f"m{i}", value_type="counter", value=float(i))
           for i in range(3)]
    out = decode_event_array(encode_event_array(metrics=mts))
    assert [(k, ev["name"]) for k, ev in out] == [
        ("metric", "m0"), ("metric", "m1"), ("metric", "m2")]


_scalar = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    st.floats(allow_nan=False, allow_infinity=False),
    st.text(max_size=20),
)
_value = st.recursive(
    _scalar,
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(st.text(max_size=8), children, max_size=4),
    ),
    max_leaves=12,
)


@settings(max_examples=150, deadline=None)
@given(_value)
def test_value_roundtrip_property(v):
    out = decode_value(encode_value(v))
    assert _norm(out) == _norm(v)


def _norm(v):
    if isinstance(v, float):
        return ("f", math.copysign(1, v), v)
    if isinstance(v, list):
        return [_norm(x) for x in v]
    if isinstance(v, dict):
        return {k: _norm(x) for k, x in v.items()}
    return v


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def spark():
    from vector_spark.session import get_spark

    return get_spark("test-codecs-proto", master="local[4]")


def test_spark_log_roundtrip(spark):
    from pyspark.sql import functions as F

    from vector_spark.codecs_proto import (
        decode_native_proto,
        encode_native_log_proto,
    )

    df = spark.createDataFrame(
        [(1, "err timeout", 502, 1.25), (2, "ok", 200, None)],
        "event_id long, msg string, status long, latency double",
    )
    enc = encode_native_log_proto(df, ["event_id", "msg", "status", "latency"])
    dec = decode_native_proto(enc.select("proto"), frame_col="proto")
    rows = {r["event_kind"]: r for r in dec.collect()}
    assert not any(r["_decode_error"] for r in dec.collect())
    import json

    logs = sorted(
        (json.loads(r["log"]) for r in dec.collect()),
        key=lambda d: d["event_id"],
    )
    assert logs[0] == {"event_id": 1, "msg": "err timeout", "status": 502,
                       "latency": 1.25}
    assert logs[1] == {"event_id": 2, "msg": "ok", "status": 200,
                       "latency": None}


def test_spark_metric_roundtrip(spark):
    from vector_spark.codecs_proto import (
        decode_native_proto,
        encode_native_metric_proto,
    )

    df = spark.createDataFrame(
        [("hits", "incremental", "counter", 3.0, {"h": "web1"}),
         ("temp", "absolute", "gauge", 21.5, None)],
        "name string, metric_kind string, type string, value double, "
        "tags map<string,string>",
    )
    enc = encode_native_metric_proto(df)
    dec = decode_native_proto(enc.select("proto"), frame_col="proto")
    out = {r["metric"]["name"]: r["metric"] for r in dec.collect()}
    assert out["hits"]["counter"]["value"] == 3.0
    assert out["hits"]["kind"] == "incremental"
    assert dict(out["hits"]["tags"]) == {"h": "web1"}
    assert out["temp"]["gauge"]["value"] == 21.5
    assert out["temp"]["kind"] == "absolute"


def test_native_length_delimited_transport(spark):
    """The reference's native transport shape: length_delimited frames
    each holding one EventArray (framing = source concern)."""
    import struct as _s

    from vector_spark.codecs_proto import decode_native_proto
    from vector_spark.sources import frame_length_delimited

    frames = [
        encode_event_array(logs=[encode_log({"seq": i, "msg": f"line {i}"})])
        for i in range(4)
    ]
    blob = b"".join(_s.pack(">I", len(f)) + f for f in frames)
    df = spark.createDataFrame([(blob,)], "content binary")
    framed = frame_length_delimited(df)
    dec = decode_native_proto(framed, frame_col="frame")
    import json

    seqs = sorted(json.loads(r["log"])["seq"] for r in dec.collect())
    assert seqs == [0, 1, 2, 3]


def test_decode_frame_dispatch_native(spark):
    from vector_spark.sources import decode_frame

    buf = encode_event_array(logs=[encode_log({"x": 1})])
    df = spark.createDataFrame([(buf,)], "frame binary")
    out = decode_frame(df, "native", line_col="frame").collect()
    assert len(out) == 1 and out[0]["event_kind"] == "log"


def test_decode_error_on_garbage(spark):
    from vector_spark.codecs_proto import decode_native_proto

    df = spark.createDataFrame(
        [(b"\xff\xff\xff\xff",), (None,)], "frame binary"
    )
    dec = decode_native_proto(df, frame_col="frame")
    assert all(r["_decode_error"] for r in dec.collect())


def test_sketch_travels_as_native_proto(spark):
    """The reference's 2-tier metric flow: agent-level AgentDDSketches
    travel to the aggregator AS native-proto frames, get decoded, and
    merge losslessly (value.rs Sketch + proto Sketch.AgentDDSketch).
    The quantiles after the wire hop must equal the direct
    all-raw-values path exactly."""
    from pyspark.sql import functions as F

    from vector_spark.codecs_proto import decode_native_proto
    from vector_spark.operators.sketch import (
        sketch_from_values,
        sketch_merge,
        sketch_quantiles,
    )

    vals = spark.createDataFrame(
        [(f"agent-{i % 4}", (i * 37) % 997) for i in range(400)],
        "agent string, latency long",
    )

    # agent tier: per-agent sketches -> one native-proto frame each
    per_agent = sketch_from_values(vals, "latency", ["agent"]).collect()
    by_agent: dict = {}
    for r in per_agent:
        by_agent.setdefault(r["agent"], []).append((r["bucket"], r["cnt"]))
    frames = []
    for agent, rows in by_agent.items():
        rows.sort()
        mt = encode_metric(
            "latency_sketch",
            kind="incremental",
            value_type="sketch",
            sketch={
                "count": sum(c for _, c in rows),
                "k": [b for b, _ in rows],
                "n": [c for _, c in rows],
            },
            tags={"agent": agent},
        )
        frames.append((encode_event_array(metrics=[mt]),))

    # aggregator tier: decode the wire frames, merge, query quantiles
    dec = decode_native_proto(
        spark.createDataFrame(frames, "frame binary"), frame_col="frame"
    )
    rows = dec.select(
        F.col("metric.tags")["agent"].alias("agent"),
        F.explode(
            F.arrays_zip(
                F.col("metric.sketch.k").alias("bucket"),
                F.col("metric.sketch.n").alias("cnt"),
            )
        ).alias("kn"),
    ).select(
        F.lit("all").alias("scope"),
        F.col("kn.bucket").alias("bucket"),
        F.col("kn.cnt").alias("cnt"),
    )
    merged = sketch_merge(rows, ["scope"])
    via_wire = {
        r["q"]: (r["est"], r["n"])
        for r in sketch_quantiles(merged, ["scope"]).collect()
    }

    direct = sketch_from_values(
        vals.select(F.lit("all").alias("scope"), "latency"), "latency",
        ["scope"],
    )
    want = {
        r["q"]: (r["est"], r["n"])
        for r in sketch_quantiles(direct, ["scope"]).collect()
    }
    assert via_wire == want and want  # lossless through the wire hop


def test_spark_decode_distribution_and_histogram(spark):
    """distribution/aggregated_histogram payloads must surface in the
    Spark decode schema, not silently decode to an all-null metric."""
    from vector_spark.codecs_proto import (
        decode_native_proto,
        encode_event_array,
        encode_metric,
    )

    dist = encode_metric(
        "lat", value_type="distribution", samples=[(1.5, 2), (3.0, 1)]
    )
    hist = encode_metric(
        "sz",
        value_type="aggregated_histogram",
        buckets=[(0.5, 3), (1.0, 7)],
        agg_count=10,
        agg_sum=6.5,
    )
    frames = [
        (bytearray(encode_event_array(metrics=[dist])),),
        (bytearray(encode_event_array(metrics=[hist])),),
    ]
    df = spark.createDataFrame(frames, "frame binary")
    rows = {r.metric.name: r for r in decode_native_proto(df).collect()}
    assert not rows["lat"]._decode_error
    assert [
        (s.value, s.rate) for s in rows["lat"].metric.distribution.samples
    ] == [(1.5, 2), (3.0, 1)]
    h = rows["sz"].metric.aggregated_histogram
    # Row.count is a method — use subscript access for these fields
    assert [(b.upper_limit, b["count"]) for b in h.buckets] == [
        (0.5, 3), (1.0, 7),
    ]
    assert h["count"] == 10 and abs(h["sum"] - 6.5) < 1e-12


def test_spark_encode_integer_column_with_nulls_keeps_int_wire_type(spark):
    """A LongType column whose Arrow batch carries a null must still
    encode Value{integer}, not flip to Value{float} per batch."""
    from vector_spark.codecs_proto import (
        decode_native_proto,
        encode_native_log_proto,
    )

    df = spark.createDataFrame(
        [(200,), (None,)], "status long"
    )
    enc = encode_native_log_proto(df, ["status"])
    rows = decode_native_proto(enc.select("proto"), frame_col="proto")
    logs = [r.log for r in rows.collect()]
    # integer JSON rendition '200', not '200.0'
    assert '{"status": 200}' in logs and '{"status": null}' in logs
