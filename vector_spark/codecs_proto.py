"""Vector `native` (protobuf) codec.

The reference's native codec serializes each event as a protobuf
`EventArray` (lib/codecs/src/encoding/format/native.rs encode ->
`proto::EventArray::from(EventArray::from(event))`) and deserializes
frames back into events (decoding/format/native.rs). The message
schema is `lib/vector-core/proto/event.proto`:

  EventArray { oneof: LogArray=1 | MetricArray=2 | TraceArray=3 }
  Log   { fields map<string,Value>=1, value Value=2 }   (proto.rs:243-258:
          an object-rooted log uses `fields`; a scalar-rooted log puts a
          dummy "." null in fields and sets `value`)
  Value { oneof: raw_bytes=1 | timestamp=2 | integer=4 | float=5 |
          boolean=6 | map=7 | array=8 | null=9 }
  Metric{ name=1, timestamp=2, tags=3, kind=4,
          counter=5 | gauge=6 | set=7 | distribution2=12 |
          aggregated_histogram3=16 | sketch=15, namespace=11,
          interval_ms=18 }

No protobuf runtime ships in this sandbox, so the wire format is
implemented directly from the public protobuf encoding spec (varint /
64-bit / length-delimited records, packed repeated scalars, proto3
default-value omission as prost emits it). Executor-side work runs as
Arrow-batched pandas UDFs — the codec is the sanctioned Python slow
path, parallelizes per partition, and never shuffles.

Framing is the sink/source's concern (same as every codec): pair with
`sources.frame_length_delimited` for the reference's
native+length_delimited transport shape.
"""

from __future__ import annotations

import struct as _struct
from datetime import datetime, timezone

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# protobuf wire primitives
# ---------------------------------------------------------------------------

_WIRE_VARINT, _WIRE_I64, _WIRE_LEN, _WIRE_I32 = 0, 1, 2, 5


def _varint(n: int) -> bytes:
    """Unsigned base-128 varint."""
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _svarint(n: int) -> bytes:
    """proto int64: negative values as 64-bit two's complement."""
    return _varint(n & 0xFFFFFFFFFFFFFFFF)


def _zigzag32(n: int) -> bytes:
    """proto sint32 (Sketch.k uses sint32)."""
    return _varint(((n << 1) ^ (n >> 31)) & 0xFFFFFFFF)


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return acc, pos
        shift += 7


def _key(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _ld(field: int, payload: bytes) -> bytes:
    return _key(field, _WIRE_LEN) + _varint(len(payload)) + payload


def _skip(buf: bytes, pos: int, wire: int) -> int:
    if wire == _WIRE_VARINT:
        _, pos = _read_varint(buf, pos)
        return pos
    if wire == _WIRE_I64:
        return pos + 8
    if wire == _WIRE_I32:
        return pos + 4
    if wire == _WIRE_LEN:
        n, pos = _read_varint(buf, pos)
        return pos + n
    raise ValueError(f"unsupported wire type {wire}")


def _fields(buf: bytes):
    """Iterate (field_number, wire_type, value) over one message.

    LEN fields yield the raw payload bytes; varint fields the int;
    I64/I32 the raw fixed bytes.
    """
    pos, n = 0, len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if wire == _WIRE_VARINT:
            v, pos = _read_varint(buf, pos)
        elif wire == _WIRE_I64:
            v, pos = buf[pos : pos + 8], pos + 8
        elif wire == _WIRE_I32:
            v, pos = buf[pos : pos + 4], pos + 4
        elif wire == _WIRE_LEN:
            ln, pos = _read_varint(buf, pos)
            v, pos = buf[pos : pos + ln], pos + ln
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, v


# ---------------------------------------------------------------------------
# Value tree (event.proto Value / ValueMap / ValueArray / Timestamp)
# ---------------------------------------------------------------------------


def _enc_timestamp(dt: datetime) -> bytes:
    """google.protobuf.Timestamp {seconds=1 int64, nanos=2 int32}."""
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    epoch = dt.timestamp()
    seconds = int(epoch // 1)
    nanos = dt.microsecond * 1000
    out = b""
    if seconds:
        out += _key(1, _WIRE_VARINT) + _svarint(seconds)
    if nanos:
        out += _key(2, _WIRE_VARINT) + _svarint(nanos)
    return out


def _dec_timestamp(buf: bytes) -> datetime:
    seconds, nanos = 0, 0
    for field, _wire, v in _fields(buf):
        if field == 1:
            seconds = v - (1 << 64) if v >> 63 else v
        elif field == 2:
            nanos = v - (1 << 64) if v >> 63 else v
    return datetime.fromtimestamp(seconds, tz=timezone.utc).replace(
        microsecond=nanos // 1000
    )


def encode_value(v) -> bytes:
    """One event.proto `Value` message (payload bytes, no outer tag)."""
    if v is None:
        # oneof-set fields are always emitted, even at enum default 0
        return _key(9, _WIRE_VARINT) + _varint(0)
    if isinstance(v, bool):
        return _key(6, _WIRE_VARINT) + _varint(1 if v else 0)
    if isinstance(v, int):
        return _key(4, _WIRE_VARINT) + _svarint(v)
    if isinstance(v, float):
        return _key(5, _WIRE_I64) + _struct.pack("<d", v)
    if isinstance(v, (bytes, bytearray)):
        return _ld(1, bytes(v))
    if isinstance(v, str):
        return _ld(1, v.encode("utf-8"))
    if isinstance(v, datetime):
        return _ld(2, _enc_timestamp(v))
    if isinstance(v, (list, tuple)):
        items = b"".join(_ld(1, encode_value(i)) for i in v)
        return _ld(8, items)
    if isinstance(v, dict):
        return _ld(7, _enc_value_map(v))
    raise ValueError(f"unsupported value type {type(v).__name__}")


def _enc_value_map(d: dict) -> bytes:
    """ValueMap {fields map<string,Value>=1}: each map entry is a
    nested message {key=1 string, value=2 Value}. BTreeMap order."""
    out = bytearray()
    for k in sorted(d):
        entry = _ld(1, str(k).encode("utf-8")) + _ld(2, encode_value(d[k]))
        out += _ld(1, entry)
    return bytes(out)


def decode_value(buf: bytes):
    """event.proto Value payload -> python value. Unset oneof -> None.

    raw_bytes decodes to str when valid UTF-8 (Vector strings are
    bytes; the JSON rendition shows them as strings), else bytes.
    """
    for field, _wire, v in _fields(buf):
        if field == 1:
            try:
                return v.decode("utf-8")
            except UnicodeDecodeError:
                return bytes(v)
        if field == 2:
            return _dec_timestamp(v)
        if field == 4:
            return v - (1 << 64) if v >> 63 else v
        if field == 5:
            return _struct.unpack("<d", v)[0]
        if field == 6:
            return bool(v)
        if field == 7:
            return _dec_value_map(v)
        if field == 8:
            return [
                decode_value(item)
                for f2, _w2, item in _fields(v)
                if f2 == 1
            ]
        if field == 9:
            return None
    return None


def _dec_value_map(buf: bytes) -> dict:
    out = {}
    for field, _wire, entry in _fields(buf):
        if field != 1:
            continue
        k, val = "", None
        for f2, _w2, v2 in _fields(entry):
            if f2 == 1:
                k = v2.decode("utf-8")
            elif f2 == 2:
                val = decode_value(v2)
        out[k] = val
    return out


# ---------------------------------------------------------------------------
# Log / Metric / EventWrapper / EventArray
# ---------------------------------------------------------------------------


def encode_log(fields: dict | None, value=None) -> bytes:
    """proto Log. Object-rooted events fill `fields`; a scalar root
    sets `value` plus the dummy "." null field (proto.rs:243-258)."""
    if value is None:
        return _enc_value_map(fields or {})
    dummy = _enc_value_map({".": None})
    return dummy + _ld(2, encode_value(value))


def decode_log(buf: bytes):
    """proto Log -> python dict (or scalar when `value` is set,
    proto.rs:87-99: value wins; fields are the legacy path)."""
    fields, value, has_value = {}, None, False
    for field, _wire, v in _fields(buf):
        if field == 1:
            k, val = "", None
            for f2, _w2, v2 in _fields(v):
                if f2 == 1:
                    k = v2.decode("utf-8")
                elif f2 == 2:
                    val = decode_value(v2)
            fields[k] = val
        elif field == 2:
            value, has_value = decode_value(v), True
    if has_value:
        return value
    return fields


def encode_metric(
    name: str,
    *,
    kind: str = "incremental",
    value_type: str = "counter",
    value: float | None = None,
    set_values: list[str] | None = None,
    samples: list[tuple[float, int]] | None = None,
    buckets: list[tuple[float, int]] | None = None,
    agg_count: int | None = None,
    agg_sum: float | None = None,
    sketch: dict | None = None,
    tags: dict | None = None,
    timestamp: datetime | None = None,
    namespace: str | None = None,
    interval_ms: int = 0,
) -> bytes:
    """proto Metric. Variants: counter/gauge/set/distribution2/
    aggregated_histogram3/sketch (the modern numbered forms the
    reference emits; *1/*2 legacy forms are decode-only upstream)."""
    out = bytearray()
    if name:
        out += _ld(1, name.encode("utf-8"))
    if timestamp is not None:
        out += _ld(2, _enc_timestamp(timestamp))
    for k in sorted(tags or {}):
        entry = _ld(1, k.encode("utf-8")) + _ld(2, str(tags[k]).encode("utf-8"))
        out += _ld(3, entry)
    if kind == "absolute":  # Incremental=0 is the proto3 default
        out += _key(4, _WIRE_VARINT) + _varint(1)
    if value_type == "counter":
        out += _ld(5, _key(1, _WIRE_I64) + _struct.pack("<d", float(value or 0.0)))
    elif value_type == "gauge":
        out += _ld(6, _key(1, _WIRE_I64) + _struct.pack("<d", float(value or 0.0)))
    elif value_type == "set":
        body = b"".join(_ld(1, s.encode("utf-8")) for s in (set_values or []))
        out += _ld(7, body)
    elif value_type == "distribution":
        body = bytearray()
        for val, rate in samples or []:
            s = _key(1, _WIRE_I64) + _struct.pack("<d", float(val))
            if rate:
                s += _key(2, _WIRE_VARINT) + _varint(int(rate))
            body += _ld(1, bytes(s))
        # statistic: Histogram=0 default, omitted
        out += _ld(12, bytes(body))
    elif value_type == "aggregated_histogram":
        body = bytearray()
        for limit, cnt in buckets or []:
            b = _key(1, _WIRE_I64) + _struct.pack("<d", float(limit))
            if cnt:
                b += _key(2, _WIRE_VARINT) + _varint(int(cnt))
            body += _ld(1, bytes(b))
        if agg_count:
            body += _key(2, _WIRE_VARINT) + _varint(int(agg_count))
        if agg_sum:
            body += _key(3, _WIRE_I64) + _struct.pack("<d", float(agg_sum))
        out += _ld(16, bytes(body))
    elif value_type == "sketch":
        sk = sketch or {}
        body = bytearray()
        if sk.get("count"):
            body += _key(1, _WIRE_VARINT) + _varint(int(sk["count"]))
        for fno, fkey in ((2, "min"), (3, "max"), (4, "sum"), (5, "avg")):
            if sk.get(fkey):
                body += _key(fno, _WIRE_I64) + _struct.pack("<d", float(sk[fkey]))
        ks, ns = sk.get("k") or [], sk.get("n") or []
        if ks:  # packed repeated sint32
            payload = b"".join(_zigzag32(int(k)) for k in ks)
            body += _ld(6, payload)
        if ns:  # packed repeated uint32
            payload = b"".join(_varint(int(n)) for n in ns)
            body += _ld(7, payload)
        out += _ld(15, _ld(1, bytes(body)))
    else:
        raise ValueError(f"unsupported metric value type {value_type!r}")
    if namespace:
        out += _ld(11, namespace.encode("utf-8"))
    if interval_ms:
        out += _key(18, _WIRE_VARINT) + _varint(int(interval_ms))
    return bytes(out)


def _unpack_varints(wire: int, v) -> list[int]:
    """A packed (LEN) or single (VARINT) repeated scalar occurrence."""
    if wire == _WIRE_VARINT:
        return [v]
    out, pos = [], 0
    while pos < len(v):
        x, pos = _read_varint(v, pos)
        out.append(x)
    return out


def decode_metric(buf: bytes) -> dict:
    """proto Metric -> plain dict mirroring the native_json metric
    envelope (name/namespace/timestamp/kind/tags + one variant key)."""
    m: dict = {
        "name": None, "namespace": None, "timestamp": None,
        "kind": "incremental", "tags": {}, "interval_ms": None,
        "counter": None, "gauge": None, "set": None,
        "distribution": None, "aggregated_histogram": None, "sketch": None,
    }
    for field, wire, v in _fields(buf):
        if field == 1:
            m["name"] = v.decode("utf-8")
        elif field == 2:
            m["timestamp"] = _dec_timestamp(v)
        elif field == 3:
            k, val = "", ""
            for f2, _w2, v2 in _fields(v):
                if f2 == 1:
                    k = v2.decode("utf-8")
                elif f2 == 2:
                    val = v2.decode("utf-8")
            m["tags"][k] = val
        elif field == 4:
            m["kind"] = "absolute" if v == 1 else "incremental"
        elif field == 5 or field == 6:
            inner = 0.0
            for f2, _w2, v2 in _fields(v):
                if f2 == 1:
                    inner = _struct.unpack("<d", v2)[0]
            m["counter" if field == 5 else "gauge"] = {"value": inner}
        elif field == 7:
            m["set"] = {
                "values": [
                    s.decode("utf-8") for f2, _w2, s in _fields(v) if f2 == 1
                ]
            }
        elif field == 12:
            samples = []
            for f2, _w2, s in _fields(v):
                if f2 != 1:
                    continue
                val, rate = 0.0, 0
                for f3, w3, v3 in _fields(s):
                    if f3 == 1:
                        val = _struct.unpack("<d", v3)[0]
                    elif f3 == 2:
                        rate = _unpack_varints(w3, v3)[0]
                samples.append({"value": val, "rate": rate})
            m["distribution"] = {"samples": samples}
        elif field == 16:
            buckets, cnt, total = [], 0, 0.0
            for f2, w2, v2 in _fields(v):
                if f2 == 1:
                    limit, c = 0.0, 0
                    for f3, w3, v3 in _fields(v2):
                        if f3 == 1:
                            limit = _struct.unpack("<d", v3)[0]
                        elif f3 == 2:
                            c = _unpack_varints(w3, v3)[0]
                    buckets.append({"upper_limit": limit, "count": c})
                elif f2 == 2:
                    cnt = _unpack_varints(w2, v2)[0]
                elif f2 == 3:
                    total = _struct.unpack("<d", v2)[0]
            m["aggregated_histogram"] = {
                "buckets": buckets, "count": cnt, "sum": total
            }
        elif field == 15:
            for f2, _w2, v2 in _fields(v):
                if f2 != 1:
                    continue
                sk = {"count": 0, "min": 0.0, "max": 0.0, "sum": 0.0,
                      "avg": 0.0, "k": [], "n": []}
                for f3, w3, v3 in _fields(v2):
                    if f3 == 1:
                        sk["count"] = _unpack_varints(w3, v3)[0]
                    elif f3 in (2, 3, 4, 5):
                        key = {2: "min", 3: "max", 4: "sum", 5: "avg"}[f3]
                        sk[key] = _struct.unpack("<d", v3)[0]
                    elif f3 == 6:
                        raw = _unpack_varints(w3, v3)
                        sk["k"].extend(
                            (z >> 1) ^ -(z & 1) for z in raw
                        )
                    elif f3 == 7:
                        sk["n"].extend(_unpack_varints(w3, v3))
                m["sketch"] = sk
        elif field == 11:
            m["namespace"] = v.decode("utf-8")
        elif field == 18:
            m["interval_ms"] = v
    return m


def encode_event_array(
    logs: list[bytes] | None = None, metrics: list[bytes] | None = None
) -> bytes:
    """proto EventArray (the frame the native serializer emits —
    NativeSerializer::encode wraps ONE event per frame, but the array
    form legally carries many; both directions handled)."""
    if logs:
        return _ld(1, b"".join(_ld(1, lg) for lg in logs))
    if metrics:
        return _ld(2, b"".join(_ld(1, mt) for mt in metrics))
    return b""


def decode_event_array(buf: bytes) -> list[tuple[str, object]]:
    """proto EventArray -> [(kind, decoded)] where kind is
    log|metric|trace — exactly the frame the reference deserializer
    accepts (decoding/format/native.rs parses proto::EventArray)."""
    out: list[tuple[str, object]] = []
    for field, _wire, v in _fields(buf):
        if field == 1:  # LogArray{repeated Log=1}
            for f2, _w2, lg in _fields(v):
                if f2 == 1:
                    out.append(("log", decode_log(lg)))
        elif field == 2:  # MetricArray{repeated Metric=1}
            for f2, _w2, mt in _fields(v):
                if f2 == 1:
                    out.append(("metric", decode_metric(mt)))
        elif field == 3:  # TraceArray{repeated Trace=1}
            for f2, _w2, tr in _fields(v):
                if f2 == 1:
                    out.append(("trace", decode_log(tr)))
    return out


# ---------------------------------------------------------------------------
# DataFrame codec surface
# ---------------------------------------------------------------------------


def encode_native_log_proto(
    df: DataFrame, fields: list[str], out_col: str = "proto"
) -> DataFrame:
    """Log rows -> one native-proto EventArray frame per row
    (encoding/format/native.rs: EventArray::from(event))."""
    from pyspark.sql.functions import pandas_udf

    # integral Spark columns arrive as float64 whenever the Arrow
    # batch carries a null — restore int so the wire type stays
    # Value{integer} (field 4) instead of flipping to float per batch
    integral = {
        f.name
        for f in df.schema.fields
        if f.name in set(fields)
        and f.dataType.typeName() in ("long", "integer", "short", "byte")
    }

    @pandas_udf(T.BinaryType())
    def enc(*cols):
        import pandas as pd

        out = []
        for vals in zip(*cols):
            ev = {}
            for n, v in zip(fields, vals):
                if hasattr(v, "item"):
                    v = v.item()
                if isinstance(v, float) and v != v:
                    v = None
                if isinstance(v, pd.Timestamp):
                    v = v.to_pydatetime()
                if n in integral and isinstance(v, float):
                    v = int(v)
                ev[n] = v
            out.append(encode_event_array(logs=[encode_log(ev)]))
        return pd.Series(out)

    return df.withColumn(out_col, enc(*[F.col(n) for n in fields]))


def encode_native_metric_proto(
    df: DataFrame,
    name_col: str = "name",
    kind_col: str = "metric_kind",
    type_col: str = "type",
    value_col: str = "value",
    tags_col: str | None = "tags",
    out_col: str = "proto",
) -> DataFrame:
    """Counter/gauge metric rows -> native-proto frames (the shapes
    log_to_metric emits; richer variants go through encode_metric)."""
    from pyspark.sql.functions import pandas_udf

    cols = [name_col, kind_col, type_col, value_col]
    if tags_col is not None:
        cols.append(tags_col)

    @pandas_udf(T.BinaryType())
    def enc(*series):
        import pandas as pd

        out = []
        for vals in zip(*series):
            name, kind, vtype, value = vals[0], vals[1], vals[2], vals[3]
            tags = dict(vals[4]) if tags_col is not None and vals[4] is not None else None
            mt = encode_metric(
                str(name),
                kind=str(kind or "incremental"),
                value_type=str(vtype),
                value=float(value) if value is not None else 0.0,
                tags=tags,
            )
            out.append(encode_event_array(metrics=[mt]))
        return pd.Series(out)

    return df.withColumn(out_col, enc(*[F.col(c) for c in cols]))


_DECODED_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("event_kind", T.StringType()),
            T.StructField("log", T.StringType()),  # JSON, schema-free
            T.StructField(
                "metric",
                T.StructType(
                    [
                        T.StructField("name", T.StringType()),
                        T.StructField("namespace", T.StringType()),
                        T.StructField("timestamp", T.TimestampType()),
                        T.StructField("kind", T.StringType()),
                        T.StructField(
                            "counter",
                            T.StructType([T.StructField("value", T.DoubleType())]),
                        ),
                        T.StructField(
                            "gauge",
                            T.StructType([T.StructField("value", T.DoubleType())]),
                        ),
                        T.StructField(
                            "set",
                            T.StructType(
                                [T.StructField("values", T.ArrayType(T.StringType()))]
                            ),
                        ),
                        T.StructField(
                            "sketch",
                            T.StructType(
                                [
                                    T.StructField("count", T.LongType()),
                                    T.StructField("min", T.DoubleType()),
                                    T.StructField("max", T.DoubleType()),
                                    T.StructField("sum", T.DoubleType()),
                                    T.StructField("avg", T.DoubleType()),
                                    T.StructField("k", T.ArrayType(T.IntegerType())),
                                    T.StructField("n", T.ArrayType(T.LongType())),
                                ]
                            ),
                        ),
                        T.StructField(
                            "distribution",
                            T.StructType(
                                [
                                    T.StructField(
                                        "samples",
                                        T.ArrayType(
                                            T.StructType(
                                                [
                                                    T.StructField(
                                                        "value", T.DoubleType()
                                                    ),
                                                    T.StructField(
                                                        "rate", T.LongType()
                                                    ),
                                                ]
                                            )
                                        ),
                                    ),
                                ]
                            ),
                        ),
                        T.StructField(
                            "aggregated_histogram",
                            T.StructType(
                                [
                                    T.StructField(
                                        "buckets",
                                        T.ArrayType(
                                            T.StructType(
                                                [
                                                    T.StructField(
                                                        "upper_limit",
                                                        T.DoubleType(),
                                                    ),
                                                    T.StructField(
                                                        "count", T.LongType()
                                                    ),
                                                ]
                                            )
                                        ),
                                    ),
                                    T.StructField("count", T.LongType()),
                                    T.StructField("sum", T.DoubleType()),
                                ]
                            ),
                        ),
                        T.StructField(
                            "tags", T.MapType(T.StringType(), T.StringType())
                        ),
                    ]
                ),
            ),
            T.StructField("trace", T.StringType()),
            T.StructField("_decode_error", T.BooleanType()),
        ]
    )
)


def decode_native_proto(
    df: DataFrame, frame_col: str = "frame", out_col: str = "event"
) -> DataFrame:
    """native-proto frames -> exploded typed events, mirroring
    decode_native_json's surface: `event_kind`, `log` (JSON string —
    schema-free, per the Value model), `metric` struct, `trace`.

    One frame may carry an EventArray of many events -> explode."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(_DECODED_SCHEMA)
    def dec(frames):
        import json as _json

        import pandas as pd

        def render(v):
            if isinstance(v, datetime):
                return v.isoformat().replace("+00:00", "Z")
            if isinstance(v, bytes):
                return v.decode("utf-8", errors="replace")
            if isinstance(v, dict):
                return {k: render(x) for k, x in v.items()}
            if isinstance(v, list):
                return [render(x) for x in v]
            return v

        def one(buf):
            if buf is None:
                return [(None, None, None, None, True)]
            try:
                events = decode_event_array(bytes(buf))
            except Exception:
                return [(None, None, None, None, True)]
            if not events:
                return [(None, None, None, None, True)]
            rows = []
            for kind, ev in events:
                if kind == "log":
                    rows.append(
                        ("log", _json.dumps(render(ev), sort_keys=True),
                         None, None, False)
                    )
                elif kind == "metric":
                    sk = ev.get("sketch")
                    dist = ev.get("distribution")
                    hist = ev.get("aggregated_histogram")
                    rows.append(
                        (
                            "metric",
                            None,
                            (
                                ev["name"], ev["namespace"], ev["timestamp"],
                                ev["kind"],
                                ev["counter"] and (ev["counter"]["value"],),
                                ev["gauge"] and (ev["gauge"]["value"],),
                                ev["set"] and (ev["set"]["values"],),
                                sk
                                and (
                                    sk["count"], sk["min"], sk["max"],
                                    sk["sum"], sk["avg"], sk["k"], sk["n"],
                                ),
                                dist
                                and (
                                    [
                                        (s["value"], s["rate"])
                                        for s in dist["samples"]
                                    ],
                                ),
                                hist
                                and (
                                    [
                                        (b["upper_limit"], b["count"])
                                        for b in hist["buckets"]
                                    ],
                                    hist["count"],
                                    hist["sum"],
                                ),
                                ev["tags"],
                            ),
                            None,
                            False,
                        )
                    )
                else:
                    rows.append(
                        ("trace", None, None,
                         _json.dumps(render(ev), sort_keys=True), False)
                    )
            return rows

        return frames.map(one)

    return df.select(
        "*", F.explode(dec(F.col(frame_col))).alias(out_col)
    ).select("*", f"{out_col}.*").drop(out_col)
