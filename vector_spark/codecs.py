"""Wire-format codecs: statsd, prometheus text exposition, native_json.

Reference:
* statsd decode  — src/sources/statsd/parser.rs:16-113 (dogstatsd
  datagrams `name:value|type[|@rate][|#tags]`).
* statsd encode  — src/sinks/statsd.rs:153-250 (counter/gauge/
  distribution/set -> datagram; sorted tags; `true` tags bare).
* prometheus encode — src/sinks/prometheus/collector.rs:280-320
  (text exposition: `# HELP` / `# TYPE` headers, sorted labels,
  `\\` and `"` escaped in label values).
* prometheus decode — lib/prometheus-parser/src/line.rs (body lines
  `name{labels} value [ts]`, `# TYPE name kind` headers).
* native_json — lib/codecs/src/{decoding,encoding}/format/
  native_json.rs (Vector's event envelope: one top-level key naming
  the event kind: {"log": {...}} | {"metric": {...}} | {"trace": ...}).

Every codec is a pure Column expression pipeline — no Python UDFs,
fully whole-stage-codegen'd, so decode/encode cost scales with the
scan and never forks a Python worker. That matters because codecs sit
at the 100 TB ingest/egress boundary: they run on EVERY row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


# ---------------------------------------------------------------------------
# statsd
# ---------------------------------------------------------------------------

def _sanitize_statsd_key(key: Column) -> Column:
    """parser.rs sanitize_key: '/' -> "'-" then whitespace -> '_' then
    strip [^a-zA-Z_\\-0-9.]. The apostrophe inserted by the first step
    is itself stripped by the third, so the net effect is '/' -> '-'."""
    s = F.regexp_replace(key, "/", "'-")
    s = F.regexp_replace(s, r"\s+", "_")
    return F.regexp_replace(s, r"[^a-zA-Z_\-0-9.]", "")


def decode_statsd(df: DataFrame, line_col: str = "line") -> DataFrame:
    """Parse statsd/dogstatsd datagrams into metric rows.

    Output columns (parser.rs:58-113 semantics):
      name        sanitized metric name
      type        counter | gauge | distribution | set | null (unknown)
      metric_kind incremental | absolute
      value       double — counter scaled by 1/sample_rate, gauge
                  signed, distribution sample in base units (ms/1000)
      member      set member string (set only)
      statistic   histogram (h, ms) | summary (d) — distribution only
      sample_rate distribution sample multiplicity = round(1/rate)
      tags        map<string,string>; bare tags get value 'true'
      _decode_error true when the frame is malformed
    """
    line = F.col(line_col)
    key = F.substring_index(line, ":", 1)
    body = F.expr(
        f"substring({line_col}, length(substring_index({line_col}, ':', 1)) + 2)"
    )
    parts = F.split(body, r"\|")
    value_str = F.try_element_at(parts, F.lit(1))
    type_code = F.try_element_at(parts, F.lit(2))
    # sampling / tags components are position-flexible in practice
    # (parser.rs checks slots 2 and 3; filtering by prefix accepts the
    # same well-formed set)
    rate_part = F.try_element_at(F.filter(parts, lambda x: x.startswith("@")), F.lit(1))
    tag_part = F.try_element_at(F.filter(parts, lambda x: x.startswith("#")), F.lit(1))

    raw_rate = F.substring(rate_part, 2, 2**30).try_cast("double")
    # sanitize_sampling: non-positive / absent rate -> 1.0
    rate = F.when(raw_rate > 0, raw_rate).otherwise(F.lit(1.0))
    multiplier = F.lit(1.0) / rate

    tags = F.coalesce(
        F.transform_values(
            F.str_to_map(F.substring(tag_part, 2, 2**30), F.lit(","), F.lit(":")),
            lambda _, v: F.coalesce(v, F.lit("true")),
        ),
        F.from_json(F.lit("{}"), T.MapType(T.StringType(), T.StringType())),
    )

    num = value_str.try_cast("double")
    first_ch = F.substring(value_str, 1, 1)
    signed = first_ch.isin("+", "-")

    is_counter = type_code == "c"
    is_gauge = type_code == "g"
    is_dist = type_code.isin("h", "ms", "d")
    is_set = type_code == "s"

    mtype = (
        F.when(is_counter, F.lit("counter"))
        .when(is_gauge, F.lit("gauge"))
        .when(is_dist, F.lit("distribution"))
        .when(is_set, F.lit("set"))
    )
    metric_kind = F.when(
        is_gauge & ~signed, F.lit("absolute")
    ).otherwise(F.lit("incremental"))
    value = (
        F.when(is_counter, num * multiplier)
        # 'ms' converts to base seconds (parser.rs convert_to_base_units)
        .when(type_code == "ms", num / 1000.0)
        .when(is_dist, num)
        .when(is_gauge, num)  # cast handles the +/- prefix
    )
    statistic = F.when(
        type_code.isin("h", "ms"), F.lit("histogram")
    ).when(type_code == "d", F.lit("summary"))
    sample_rate = F.when(is_dist, F.round(F.lit(1.0) / rate).cast("int"))
    malformed = (
        ~line.contains(":")
        | (F.size(parts) < 2)
        | mtype.isNull()
        | (~is_set & num.isNull())
    )
    return df.select(
        "*",
        _sanitize_statsd_key(key).alias("name"),
        mtype.alias("type"),
        metric_kind.alias("metric_kind"),
        value.alias("value"),
        F.when(is_set, value_str).alias("member"),
        statistic.alias("statistic"),
        sample_rate.alias("sample_rate"),
        tags.alias("tags"),
        malformed.alias("_decode_error"),
    )


def encode_statsd_tags(tags: Column) -> Column:
    """sinks/statsd.rs encode_tags: sorted by key, 'true' values bare."""
    return F.concat_ws(
        ",",
        F.transform(
            F.array_sort(F.map_entries(tags)),
            lambda e: F.when(e["value"] == "true", e["key"]).otherwise(
                F.concat_ws(":", e["key"], e["value"])
            ),
        ),
    )


def encode_statsd(
    df: DataFrame,
    name_col: str = "name",
    type_col: str = "type",
    kind_col: str = "metric_kind",
    value_col: str = "value",
    member_col: str = "member",
    statistic_col: str = "statistic",
    sample_rate_col: str = "sample_rate",
    tags_col: str = "tags",
    namespace: str | None = None,
) -> DataFrame:
    """Metric rows -> statsd datagrams (sinks/statsd.rs:168-250).

    counter -> `v|c`; absolute gauge -> `v|g`; incremental gauge ->
    `{:+}v|g`; distribution -> `v|h`/`v|d` with `@1/rate` when
    rate != 1; set member -> `m|s`. Tags appended as `#k:v,k2` sorted.
    """
    name = F.col(name_col)
    if namespace:
        name = F.concat_ws(".", F.lit(namespace), name)
    t = F.col(type_col)
    kind = F.col(kind_col)
    val = F.col(value_col)
    # Rust {} float formatting prints integral doubles without ".0";
    # format_number-free equivalent: cast to bigint when integral.
    def _fmt(c: Column) -> Column:
        return F.when(
            c == c.cast("bigint").cast("double"), c.cast("bigint").cast("string")
        ).otherwise(c.cast("string"))

    gauge_val = F.when(
        (kind == "incremental") & (val >= 0), F.concat(F.lit("+"), _fmt(val))
    ).otherwise(_fmt(val))
    type_char = (
        F.when(t == "counter", F.lit("c"))
        .when(t == "gauge", F.lit("g"))
        .when((t == "distribution") & (F.col(statistic_col) == "summary"), F.lit("d"))
        .when(t == "distribution", F.lit("h"))
        .when(t == "set", F.lit("s"))
    )
    value_part = (
        F.when(t == "gauge", gauge_val)
        .when(t == "set", F.col(member_col))
        .otherwise(_fmt(val))
    )
    rate = F.col(sample_rate_col)
    rate_part = F.when(
        (t == "distribution") & rate.isNotNull() & (rate != 1),
        F.concat(F.lit("|@"), (F.lit(1.0) / rate.cast("double")).cast("string")),
    ).otherwise(F.lit(""))
    tag_part = F.when(
        F.col(tags_col).isNotNull() & (F.size(F.map_keys(F.col(tags_col))) > 0),
        F.concat(F.lit("|#"), encode_statsd_tags(F.col(tags_col))),
    ).otherwise(F.lit(""))
    return df.select(
        "*",
        F.concat(
            name, F.lit(":"), value_part, F.lit("|"), type_char, rate_part, tag_part
        ).alias("statsd_line"),
    )


# ---------------------------------------------------------------------------
# prometheus text exposition
# ---------------------------------------------------------------------------

def _prom_escape(v: Column) -> Column:
    r"""collector.rs format_tag: backslash-escape \ and " in values."""
    return F.regexp_replace(
        F.regexp_replace(v, r"\\", r"\\\\"), '"', '\\\\"'
    )


def prometheus_labels(tags: Column, extra: Column | None = None) -> Column:
    """`{k="v",...}` with sorted, escaped labels; '' when empty
    (collector.rs encode_metric label block)."""
    parts = F.transform(
        F.map_entries(tags),
        lambda e: F.concat(
            e["key"], F.lit('="'), _prom_escape(e["value"]), F.lit('"')
        ),
    )
    if extra is not None:
        parts = F.array_append(parts, extra)
    # sort the FORMATTED 'k="v"' strings, extra included — exactly
    # what the reference does (collector.rs:288 parts.sort() AFTER
    # format_tag), so byte parity holds even for prefix-key pairs
    # like {a, a0} where key-order and formatted-order differ
    parts = F.array_sort(parts)
    return F.when(
        F.size(parts) > 0,
        F.concat(F.lit("{"), F.concat_ws(",", parts), F.lit("}")),
    ).otherwise(F.lit(""))


def encode_prometheus(
    df: DataFrame,
    name_col: str = "name",
    type_col: str = "type",
    value_col: str = "value",
    tags_col: str = "tags",
    ts_col: str | None = None,
    namespace: str | None = None,
) -> DataFrame:
    """Metric rows -> exposition body lines
    `name{labels} value [ts_millis]` (collector.rs emit_value).
    Counter/gauge/untyped rows only — aggregated histogram/summary
    expansion (_bucket/_sum/_count series) lives in
    `encode_prometheus_histogram`."""
    name = F.col(name_col)
    if namespace:
        name = F.concat_ws("_", F.lit(namespace), name)
    v = F.col(value_col)
    fmt_v = F.when(
        v == v.cast("bigint").cast("double"), v.cast("bigint").cast("string")
    ).otherwise(v.cast("string"))
    line = F.concat(name, prometheus_labels(F.col(tags_col)), F.lit(" "), fmt_v)
    if ts_col is not None:
        line = F.concat(
            line,
            F.lit(" "),
            (F.unix_millis(F.col(ts_col))).cast("string"),
        )
    return df.select("*", line.alias("prom_line"))


def prometheus_headers(
    df: DataFrame, name_col: str = "name", type_col: str = "type",
    namespace: str | None = None,
) -> DataFrame:
    """One `# HELP` + `# TYPE` pair per metric name
    (collector.rs encode_header). Distinct aggregate — tiny output."""
    name = F.col(name_col)
    full = F.concat_ws("_", F.lit(namespace), name) if namespace else name
    prom_type = (
        F.when(F.col(type_col) == "counter", F.lit("counter"))
        .when(F.col(type_col) == "gauge", F.lit("gauge"))
        .when(F.col(type_col) == "distribution", F.lit("histogram"))
        .when(F.col(type_col) == "set", F.lit("gauge"))
        .otherwise(F.lit("untyped"))
    )
    return (
        df.select(
            full.alias("fullname"),
            name.alias("name"),
            prom_type.alias("prom_type"),
        )
        .distinct()
        .select(
            F.concat(
                F.lit("# HELP "), F.col("fullname"), F.lit(" "), F.col("name"),
                F.lit("\n# TYPE "), F.col("fullname"), F.lit(" "),
                F.col("prom_type"),
            ).alias("prom_header"),
            "fullname",
        )
    )


def encode_prometheus_histogram(
    df: DataFrame,
    name_col: str = "name",
    buckets_col: str = "buckets",   # array<struct<upper:double,count:long>>
    sum_col: str = "sum",
    count_col: str = "count",
    tags_col: str = "tags",
) -> DataFrame:
    """AggregatedHistogram -> `_bucket`(cumulative, +Inf last) /
    `_sum` / `_count` exposition lines (collector.rs:60-85). The
    cumulative running count is a per-row array fold — no shuffle."""
    name = F.col(name_col)
    tags = F.col(tags_col)
    # cumulative counts via an inclusive scan over the buckets array
    cum = F.expr(
        f"""
        transform({buckets_col}, (b, i) ->
          struct(b.upper as upper,
                 aggregate(slice({buckets_col}, 1, i + 1), 0L,
                           (acc, x) -> acc + x.count) as cum))
        """
    )
    bucket_lines = F.transform(
        cum,
        lambda b: F.concat(
            name,
            F.lit("_bucket"),
            prometheus_labels(
                tags,
                F.concat(F.lit('le="'), b["upper"].cast("string"), F.lit('"')),
            ),
            F.lit(" "),
            b["cum"].cast("string"),
        ),
    )
    inf_line = F.concat(
        name, F.lit("_bucket"),
        prometheus_labels(tags, F.lit('le="+Inf"')),
        F.lit(" "), F.col(count_col).cast("string"),
    )
    sum_line = F.concat(
        name, F.lit("_sum"), prometheus_labels(tags), F.lit(" "),
        F.col(sum_col).cast("string"),
    )
    count_line = F.concat(
        name, F.lit("_count"), prometheus_labels(tags), F.lit(" "),
        F.col(count_col).cast("string"),
    )
    lines = F.concat(
        bucket_lines, F.array(inf_line), F.array(sum_line), F.array(count_line)
    )
    return df.select("*", F.explode(lines).alias("prom_line"))


def decode_prometheus(df: DataFrame, line_col: str = "line") -> DataFrame:
    """Exposition body lines -> (name, labels, value, ts_millis).

    lib/prometheus-parser/src/line.rs: name `[a-zA-Z_:][a-zA-Z0-9_:]*`,
    optional `{k="v",...}` labels, float value, optional int64
    timestamp. Label parsing rides `from_json`: `k="v"` pairs use JSON
    string escaping (line.rs parse_escaped_string), so rewriting
    `key=` -> `"key":` yields a valid JSON object — escapes included —
    and the whole decode stays JVM-side.
    Comment/header lines (# ...) and blanks yield _decode_error=true;
    filter them or route them to a dropped port.
    """
    line = F.trim(F.col(line_col))
    name = F.regexp_extract(line, r"^([a-zA-Z_:][a-zA-Z0-9_:]*)", 1)
    labels_raw = F.regexp_extract(line, r"^[a-zA-Z_:][a-zA-Z0-9_:]*\{(.*)\}", 1)
    rest = F.regexp_extract(
        line, r"^[a-zA-Z_:][a-zA-Z0-9_:]*(?:\{.*\})?\s+(.*)$", 1
    )
    value_str = F.substring_index(rest, " ", 1)
    ts_str = F.when(rest.contains(" "), F.substring_index(rest, " ", -1))
    labels_json = F.concat(
        F.lit("{"),
        F.regexp_replace(
            # a trailing comma after the last pair is legal in the
            # exposition format ('{a="1",}') but not in JSON — strip
            # it before the key rewrite
            F.regexp_replace(labels_raw, r",\s*$", ""),
            r"(^|,)\s*([a-zA-Z_][a-zA-Z0-9_]*)\s*=", r'$1"$2":'
        ),
        F.lit("}"),
    )
    labels_parsed = F.from_json(
        labels_json, T.MapType(T.StringType(), T.StringType())
    )
    labels = F.coalesce(labels_parsed, F.expr("map()"))
    # the key= -> "key": rewrite can corrupt pathological values that
    # embed `,word=` inside a quoted label; from_json then nulls out —
    # surface that as a decode error instead of an empty label map
    labels_bad = (labels_raw != "") & labels_parsed.isNull()
    value = (
        F.when(F.lower(value_str) == "nan", F.lit(float("nan")))
        .when(F.lower(value_str).isin("+inf", "inf"), F.lit(float("inf")))
        .when(F.lower(value_str) == "-inf", F.lit(float("-inf")))
        .otherwise(value_str.try_cast("double"))
    )
    is_body = ~line.startswith("#") & (F.length(line) > 0) & (name != "")
    return df.select(
        "*",
        F.when(is_body, name).alias("name"),
        F.when(is_body, labels).alias("labels"),
        F.when(is_body, value).alias("value"),
        F.when(is_body, ts_str.try_cast("long")).alias("ts_millis"),
        (~is_body | value.isNull() | labels_bad).alias("_decode_error"),
    )


def decode_prometheus_types(df: DataFrame, line_col: str = "line") -> DataFrame:
    """`# TYPE name kind` header lines -> (name, prom_type); broadcast-
    join onto the body rows to type them (line.rs Header parse)."""
    line = F.trim(F.col(line_col))
    name = F.regexp_extract(line, r"^#\s*TYPE\s+([a-zA-Z_:][a-zA-Z0-9_:]*)\s+(\w+)", 1)
    kind = F.regexp_extract(line, r"^#\s*TYPE\s+([a-zA-Z_:][a-zA-Z0-9_:]*)\s+(\w+)", 2)
    return (
        df.select(name.alias("name"), kind.alias("prom_type"))
        .where(F.col("name") != "")
        .distinct()
    )


# ---------------------------------------------------------------------------
# native_json event envelope
# ---------------------------------------------------------------------------

_NATIVE_METRIC_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("namespace", T.StringType()),
        T.StructField("timestamp", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("counter", T.StructType([T.StructField("value", T.DoubleType())])),
        T.StructField("gauge", T.StructType([T.StructField("value", T.DoubleType())])),
        T.StructField("set", T.StructType([T.StructField("values", T.ArrayType(T.StringType()))])),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType())),
    ]
)


def decode_native_json(df: DataFrame, line_col: str = "line") -> DataFrame:
    """Vector native_json envelope -> typed rows.

    lib/codecs/src/decoding/format/native_json.rs: each frame is a
    JSON object whose single top-level key names the event kind —
    `log`, `metric`, or `trace`. Logs keep their payload as a JSON
    string (schema-free, per the reference's Value model); metrics
    parse into the fixed metric struct.
    """
    line = F.col(line_col)
    log_raw = F.get_json_object(line, "$.log")
    metric_raw = F.get_json_object(line, "$.metric")
    trace_raw = F.get_json_object(line, "$.trace")
    event_kind = (
        F.when(log_raw.isNotNull(), F.lit("log"))
        .when(metric_raw.isNotNull(), F.lit("metric"))
        .when(trace_raw.isNotNull(), F.lit("trace"))
    )
    return df.select(
        "*",
        event_kind.alias("event_kind"),
        log_raw.alias("log"),
        F.from_json(metric_raw, _NATIVE_METRIC_SCHEMA).alias("metric"),
        trace_raw.alias("trace"),
        event_kind.isNull().alias("_decode_error"),
    )


def encode_native_json_log(df: DataFrame, fields: list[str]) -> Column:
    """Log row -> `{"log": {...fields}}` (encoding/format/native_json.rs)."""
    return F.to_json(
        F.struct(F.struct(*[F.col(f) for f in fields]).alias("log")),
        {"ignoreNullFields": "true"},
    )


def encode_native_json_metric(
    df: DataFrame,
    name_col: str = "name",
    kind_col: str = "metric_kind",
    type_col: str = "type",
    value_col: str = "value",
    tags_col: str | None = "tags",
) -> Column:
    """Metric row -> `{"metric": {...}}` with the MetricValue variant
    as the nested key (counter/gauge), mirroring the reference's serde
    representation."""
    t = F.col(type_col)
    body = [
        F.col(name_col).alias("name"),
        F.col(kind_col).alias("kind"),
        F.when(t == "counter", F.struct(F.col(value_col).alias("value"))).alias(
            "counter"
        ),
        F.when(t == "gauge", F.struct(F.col(value_col).alias("value"))).alias(
            "gauge"
        ),
    ]
    if tags_col is not None:
        body.append(F.col(tags_col).alias("tags"))
    return F.to_json(
        F.struct(F.struct(*body).alias("metric")), {"ignoreNullFields": "true"}
    )
