"""Avro datum codec (lib/codecs/src/encoding/format/avro.rs twin).

The wire-format tests are hand-computed against the Avro spec's
binary encoding so the implementation can't drift into a private
dialect; the DataFrame tests round-trip through the Arrow-batched
encode/decode UDFs.
"""

from __future__ import annotations

import pytest

from vector_spark.codecs_avro import decode_datum, encode_datum, schema_for

REC = {
    "type": "record",
    "name": "event",
    "fields": [
        {"name": "a", "type": "long"},
        {"name": "b", "type": "string"},
    ],
}


def test_known_wire_bytes():
    # zigzag(3) = 6 -> 0x06; "hi" -> len zigzag(2)=4 -> 0x04 'h' 'i'
    assert encode_datum({"a": 3, "b": "hi"}, REC) == b"\x06\x04hi"
    # negative long: zigzag(-1) = 1
    assert encode_datum(-1, "long") == b"\x01"
    # multi-byte varint: zigzag(64) = 128 -> 0x80 0x01
    assert encode_datum(64, "long") == b"\x80\x01"
    assert encode_datum(True, "boolean") == b"\x01"
    assert encode_datum(None, "null") == b""
    # union [null, string]: branch 1 -> 0x02, then the string
    assert encode_datum("x", ["null", "string"]) == b"\x02\x02x"
    assert encode_datum(None, ["null", "string"]) == b"\x00"


def test_datum_roundtrip_types():
    schema = {
        "type": "record",
        "name": "e",
        "fields": [
            {"name": "s", "type": ["null", "string"]},
            {"name": "n", "type": ["null", "long"]},
            {"name": "d", "type": "double"},
            {"name": "f", "type": "float"},
            {"name": "ok", "type": "boolean"},
            {"name": "raw", "type": "bytes"},
            {"name": "tags", "type": {"type": "map", "values": "string"}},
            {"name": "arr", "type": {"type": "array", "items": "long"}},
        ],
    }
    ev = {
        "s": "héllo", "n": -42, "d": 3.25, "f": 1.5, "ok": False,
        "raw": b"\x00\xff", "tags": {"env": "prod", "host": "h1"},
        "arr": [1, -2, 300000],
    }
    enc = encode_datum(ev, schema)
    back = decode_datum(enc, schema)
    assert back == ev
    # null union branch
    ev2 = dict(ev, s=None, n=None)
    assert decode_datum(encode_datum(ev2, schema), schema) == ev2


def test_union_mismatch_raises():
    with pytest.raises(ValueError, match="union"):
        encode_datum(1.5, ["null", "string"])


def test_dataframe_roundtrip(spark):
    from vector_spark.codecs_avro import decode_avro, encode_avro

    df = spark.createDataFrame(
        [(1, "alpha", 2.5, True), (2, None, float("nan"), False)],
        "id long, name string, score double, ok boolean",
    )
    schema = schema_for(df)
    enc = encode_avro(df, schema)
    dec = decode_avro(enc, schema).select("id", "event.*")
    rows = {r.id: r for r in dec.collect()}
    assert rows[1]["name"] == "alpha" and rows[1]["score"] == 2.5
    assert rows[2]["name"] is None and rows[2]["score"] is None
    assert rows[1]["ok"] is True and rows[2]["ok"] is False


def test_spark_avro_datasource_absent_documented(spark, tmp_path):
    """The pip pyspark build has avro core jars but not the
    spark-avro datasource; this probe documents the gap the datum
    codec fills. If a future image bundles spark-avro, this test
    flags it so the codec can delegate."""
    df = spark.range(1)
    try:
        df.write.format("avro").save(str(tmp_path / "probe"))
        bundled = True
    except Exception:
        bundled = False
    assert not bundled, "spark-avro now bundled: delegate encode_avro"


def test_decode_frame_dispatch_avro(spark):
    from vector_spark.codecs_avro import encode_datum
    from vector_spark.sources import decode_frame

    schema = {"type": "record", "name": "e", "fields": [
        {"name": "x", "type": ["null", "long"]},
        {"name": "s", "type": ["null", "string"]},
    ]}
    buf = encode_datum({"x": 7, "s": "hi"}, schema)
    df = spark.createDataFrame([(buf,)], "avro binary")
    out = decode_frame(df, "avro", line_col="avro", schema=schema).collect()
    assert out[0]["event"]["x"] == 7 and out[0]["event"]["s"] == "hi"


def test_nullable_long_column_roundtrip(spark):
    """A LongType column with nulls arrives in the Arrow batch as
    float64 — the encoder must coerce 1.0 back to 1 so the
    ["null","long"] union matches instead of failing the job."""
    from vector_spark.codecs_avro import decode_avro, encode_avro, schema_for

    df = spark.createDataFrame([(1,), (None,)], "n long")
    schema = schema_for(df)
    assert schema["fields"][0]["type"] == ["null", "long"]
    enc = encode_avro(df, schema)
    back = decode_avro(enc.select("avro"), schema).select("event.*")
    assert sorted(
        (r.n for r in back.collect()), key=lambda v: (v is None, v)
    ) == [1, None]
