"""Batch sources + decoding codecs.

Reference surface (SURVEY.md §2.5): 38 source modules; the rebuild
implements the starred set as real code. Push-HTTP/TCP listeners have
no Spark analogue (documented adapters); everything file/object/
queue-shaped is a `spark.read`/`readStream` format.

* `demo_logs_batch` — the demo_logs generator
  (src/sources/demo_logs.rs:79-120) with its line formats
  (apache_common, apache_error, syslog_5424, json) synthesized as
  deterministic Column expressions over the driver's `events` table —
  portable to DuckDB so every parse query stays oracle-checkable.
* `read_jsonl` / `read_logfmt` — newline framing + json/logfmt
  deserializers (lib/codecs/src/decoding/format/): text source +
  from_json / str_to_map.
* `read_lines` — the file source body (src/sources/file.rs) minus
  tailing; streaming tail lives in streaming/runner.py.

The matching parsers (parse_common_log, parse_syslog) live here too
— they are VRL stdlib functions (lib/vrl/stdlib/src/parse_common_log.rs,
parse_syslog.rs) expressed as native regexp_extract compositions so
the whole parse stays in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# demo_logs formats, derived from the events table (deterministic,
# DuckDB-portable: see demo_logs oracle fragments below)
# ---------------------------------------------------------------------------

_METHODS = ["GET", "POST", "PUT", "DELETE", "HEAD"]
_PATHS = ["/api/v1/users", "/api/v1/orders", "/index.html", "/health", "/metrics"]
_STATUSES = [200, 200, 200, 301, 404, 500]
_APPS = ["web", "auth", "worker", "cron"]

_METHODS_SQL = "array(" + ",".join(f"'{m}'" for m in _METHODS) + ")"
_PATHS_SQL = "array(" + ",".join(f"'{p}'" for p in _PATHS) + ")"
_STATUS_SQL = "array(" + ",".join(str(s) for s in _STATUSES) + ")"
_APPS_SQL = "array(" + ",".join(f"'{a}'" for a in _APPS) + ")"

# shared scalar derivations (Spark SQL == DuckDB SQL modulo array
# syntax; the DuckDB variants swap array() for [] and div for //)
_IP = (
    "concat(10, '.', event_id % 256, '.', (event_id div 256) % 256, '.', "
    "(event_id div 65536) % 256)"
)
_IP_DUCK = (
    "concat(10, '.', event_id % 256, '.', (event_id // 256) % 256, '.', "
    "(event_id // 65536) % 256)"
)


def demo_logs_apache_common_sql(dialect: str = "spark") -> str:
    """SELECT that renders events as apache_common log lines.

    Format (demo_logs.rs apache_common):
    <ip> - <user> [<ts>] "<method> <path> HTTP/1.1" <status> <bytes>
    """
    ip = _IP if dialect == "spark" else _IP_DUCK
    if dialect == "spark":
        method = f"element_at({_METHODS_SQL}, cast(event_id % 5 as int) + 1)"
        path = f"element_at({_PATHS_SQL}, cast(event_id % 7 % 5 as int) + 1)"
        status = f"element_at({_STATUS_SQL}, cast(event_id % 6 as int) + 1)"
        tsfmt = "date_format(ts, 'dd/MMM/yyyy:HH:mm:ss Z')"
    else:
        method = f"({_METHODS_SQL.replace('array(', '[').replace(')', ']')})[cast(event_id % 5 as int) + 1]"
        path = f"({_PATHS_SQL.replace('array(', '[').replace(')', ']')})[cast(event_id % 7 % 5 as int) + 1]"
        status = f"({_STATUS_SQL.replace('array(', '[').replace(')', ']')})[cast(event_id % 6 as int) + 1]"
        tsfmt = "strftime(ts, '%d/%b/%Y:%H:%M:%S +0000')"
    return f"""
SELECT event_id,
  concat({ip}, ' - user', event_id % 100, ' [', {tsfmt}, '] "',
         {method}, ' ', {path}, ' HTTP/1.1" ', {status}, ' ',
         cast(cast(floor(value * 100) as bigint) % 100000 as string)) AS line
FROM events
""" if dialect == "spark" else f"""
SELECT event_id,
  concat({ip}, ' - user', event_id % 100, ' [', {tsfmt}, '] "',
         {method}, ' ', {path}, ' HTTP/1.1" ', {status}, ' ',
         cast(cast(floor(value * 100) as bigint) % 100000 as varchar)) AS line
FROM events
"""


def demo_logs_syslog_sql(dialect: str = "spark") -> str:
    """RFC5424-ish syslog lines (demo_logs.rs syslog_5424):
    <pri>1 <ts> <host> <app> <pid> ID<msgid> - <msg>"""
    if dialect == "spark":
        app = f"element_at({_APPS_SQL}, cast(event_id % 4 as int) + 1)"
        tsfmt = "date_format(ts, \"yyyy-MM-dd'T'HH:mm:ss.SSS'Z'\")"
        cast_s = "string"
    else:
        app = f"({_APPS_SQL.replace('array(', '[').replace(')', ']')})[cast(event_id % 4 as int) + 1]"
        tsfmt = "strftime(ts, '%Y-%m-%dT%H:%M:%S.%gZ')"
        cast_s = "varchar"
    return f"""
SELECT event_id,
  concat('<', cast(8 + event_id % 16 as {cast_s}), '>1 ', {tsfmt},
         ' host', event_id % 50, '.example.com ', {app}, ' ',
         cast(100 + event_id % 9900 as {cast_s}), ' ID', cast(event_id % 1000 as {cast_s}),
         ' - event received') AS line
FROM events
"""


def demo_logs_batch(
    spark: SparkSession, sf_dir: str, format: str = "apache_common"
) -> DataFrame:
    """Batch demo_logs source: (event_id, line)."""
    spark.read.parquet(f"{sf_dir}/events.parquet").createOrReplaceTempView("events")
    if format == "apache_common":
        return spark.sql(demo_logs_apache_common_sql("spark"))
    if format == "syslog":
        return spark.sql(demo_logs_syslog_sql("spark"))
    if format == "json":
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        return ev.select(
            "event_id",
            F.to_json(F.struct("event_id", "user_id", "event_type", "value")).alias("line"),
        )
    raise ValueError(f"unknown demo_logs format {format!r}")


# ---------------------------------------------------------------------------
# codec readers (framing = newline; deserializer per format)
# ---------------------------------------------------------------------------


def read_lines(spark: SparkSession, path: str) -> DataFrame:
    """file source + bytes/newline framing -> one `line` per row."""
    return spark.read.text(path).withColumnRenamed("value", "line")


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """newline framing + json deserializer: from_json with an explicit
    schema (the codec's type expectations, lib/codecs decoding/format/json.rs)."""
    return (
        spark.read.text(path)
        .select(F.from_json("value", schema).alias("e"))
        .select("e.*")
    )


def read_logfmt(spark: SparkSession, path: str) -> DataFrame:
    """logfmt deserializer -> MapType column `fields`."""
    return (
        spark.read.text(path)
        .select(F.str_to_map(F.col("value"), F.lit(" "), F.lit("=")).alias("fields"))
    )


def decode_frame(df: DataFrame, codec: str, line_col: str = "line", **kw) -> DataFrame:
    """Unified deserializer dispatch (lib/codecs/src/decoding/mod.rs
    DeserializerConfig): one entry point mapping codec names to the
    Column-expression decoders, so pipeline specs / callers can say
    `decoding: {codec: statsd}` the way reference configs do.

    bytes/text pass through; json needs kw['schema']; logfmt yields a
    `fields` map; gelf/statsd/prometheus/native_json add their typed
    columns next to the original line.
    """
    if codec in ("bytes", "text"):
        return df
    if codec == "json":
        return df.select(
            F.from_json(F.col(line_col), kw["schema"]).alias("e")
        ).select("e.*")
    if codec == "logfmt":
        return df.select(
            "*",
            F.str_to_map(F.col(line_col), F.lit(" "), F.lit("=")).alias("fields"),
        )
    if codec == "gelf":
        return decode_gelf(df, line_col)
    if codec == "statsd":
        from vector_spark.codecs import decode_statsd

        return decode_statsd(df, line_col)
    if codec == "prometheus":
        from vector_spark.codecs import decode_prometheus

        return decode_prometheus(df, line_col)
    if codec == "native_json":
        from vector_spark.codecs import decode_native_json

        return decode_native_json(df, line_col)
    if codec == "native":
        from vector_spark.codecs_proto import decode_native_proto

        return decode_native_proto(df, frame_col=line_col)
    if codec == "avro":
        from vector_spark.codecs_avro import decode_avro

        return decode_avro(df, kw["schema"], col=line_col)
    if codec == "syslog":
        return parse_syslog(df, line_col)
    raise ValueError(f"unknown decoding codec {codec!r}")


# ---------------------------------------------------------------------------
# canned-format parsers (VRL stdlib analogues, native regex — JVM path)
# ---------------------------------------------------------------------------

COMMON_LOG_PATTERN = (
    r'^(\S+) (\S+) (\S+) \[([^\]]+)\] "(\S+) (\S+) (\S+)" (\d{3}) (\d+|-)$'
)

SYSLOG_5424_PATTERN = (
    r"^<(\d{1,3})>(\d) (\S+) (\S+) (\S+) (\S+) (\S+) (?:- )?(.*)$"
)


def _g(line: Column, pat: str, i: int) -> Column:
    return F.nullif(F.regexp_extract(line, pat, i), F.lit(""))


def parse_common_log(df: DataFrame, line_col: str = "line") -> DataFrame:
    """VRL parse_common_log (lib/vrl/stdlib/src/parse_common_log.rs):
    apache common -> host/identity/user/timestamp/method/path/proto/
    status/size columns; unparseable lines get _parse_error=true."""
    line = F.col(line_col)
    p = COMMON_LOG_PATTERN
    return (
        df.withColumn("host", _g(line, p, 1))
        .withColumn("identity", _g(line, p, 2))
        .withColumn("user", _g(line, p, 3))
        .withColumn(
            "timestamp",
            # try_: under Spark 4 ANSI, a matched-but-unparseable
            # timestamp must set _parse_error, not abort the job
            F.try_to_timestamp(_g(line, p, 4), F.lit("dd/MMM/yyyy:HH:mm:ss Z")),
        )
        .withColumn("method", _g(line, p, 5))
        .withColumn("path", _g(line, p, 6))
        .withColumn("protocol", _g(line, p, 7))
        .withColumn("status", _g(line, p, 8).cast("int"))
        .withColumn(
            "size",
            F.when(_g(line, p, 9) != "-", _g(line, p, 9)).cast("long"),
        )
        .withColumn("_parse_error", F.col("host").isNull())
    )


def parse_syslog(df: DataFrame, line_col: str = "line") -> DataFrame:
    """VRL parse_syslog (lib/vrl/stdlib/src/parse_syslog.rs), RFC5424:
    priority decomposes into facility*8 + severity."""
    line = F.col(line_col)
    p = SYSLOG_5424_PATTERN
    pri = _g(line, p, 1).cast("int")
    return (
        df.withColumn("facility", (pri / 8).cast("int"))
        .withColumn("severity", pri % 8)
        .withColumn("version", _g(line, p, 2).cast("int"))
        .withColumn("timestamp", F.try_to_timestamp(_g(line, p, 3)))
        .withColumn("hostname", _g(line, p, 4))
        .withColumn("appname", _g(line, p, 5))
        .withColumn("procid", _g(line, p, 6))
        .withColumn("msgid", _g(line, p, 7))
        .withColumn("message", F.regexp_extract(line, p, 8))
        .withColumn("_parse_error", pri.isNull())
    )


# ---------------------------------------------------------------------------
# demo_logs generators for the canned-parser family (parsers.py).
# Each renders `events` rows into a deterministic log line whose
# parsed fields are re-derivable in DuckDB straight from the events
# columns — the oracle pattern every parse query rides on.
# ---------------------------------------------------------------------------

def _e() -> Column:
    return F.col("event_id")


def _el(values: list, idx) -> Column:
    return F.element_at(
        F.array(*[F.lit(v) for v in values]), (idx + 1).cast("int")
    )


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


ERROR_MODULES = ["core", "mpm_event", "ssl", "proxy"]
ERROR_SEVERITIES = ["error", "warn", "notice"]

NGINX_REFERERS = ["-", "http://example.com/start", "https://ref.example.org/a"]
NGINX_AGENTS = [
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) Chrome/89.0.4389.114 Safari/537.36",
    "curl/7.68.0",
    "Mozilla/5.0 (iPhone; CPU iPhone OS 14_0 like Mac OS X) Version/14.0 Mobile/15E148 Safari/604.1",
    "Googlebot/2.1 (+http://www.google.com/bot.html)",
]

GLOG_FILES = ["server.cc", "worker.cc", "scheduler.cc"]
AUTH_APPS = ["sshd", "sudo", "su", "cron"]


def _ip_col() -> Column:
    return F.concat_ws(
        ".",
        F.lit("10"), (_e() % 256).cast("string"),
        ((_e() / 256).cast("long") % 256).cast("string"),
        ((_e() / 65536).cast("long") % 256).cast("string"),
    )


def demo_logs_apache_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EEE MMM dd HH:mm:ss yyyy] [module:severity] [pid N:tid M]
    [client ip:port] message — log_util.rs REGEX_APACHE_ERROR_LOG."""
    line = F.concat(
        F.lit("["), F.date_format("ts", "EEE MMM dd HH:mm:ss yyyy"), F.lit("] ["),
        _el(ERROR_MODULES, _e() % 4), F.lit(":"), _el(ERROR_SEVERITIES, _e() % 3),
        F.lit("] [pid "), (100 + _e() % 9000).cast("string"),
        F.lit(":tid "), (_e() % 100).cast("string"),
        F.lit("] [client "), _ip_col(), F.lit(":"),
        (1024 + _e() % 64000).cast("string"),
        F.lit("] request failed code "), (_e() % 7).cast("string"),
    )
    return _events(spark, sf_dir).select("event_id", line.alias("line"))


def demo_logs_nginx_combined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nginx combined access lines (log_util.rs REGEX_NGINX_COMBINED_LOG)."""
    method = _el(_METHODS, _e() % 5)
    path = _el(_PATHS, _e() % 7 % 5)
    status = _el([str(s) for s in _STATUSES], _e() % 6)
    size = (F.floor(F.col("value") * 100).cast("bigint") % 100000).cast("string")
    line = F.concat(
        _ip_col(), F.lit(" - user"), (_e() % 100).cast("string"), F.lit(" ["),
        F.date_format("ts", "dd/MMM/yyyy:HH:mm:ss"), F.lit(" +0000] \""),
        method, F.lit(" "), path, F.lit(" HTTP/1.1\" "), status, F.lit(" "),
        size, F.lit(" \""), _el(NGINX_REFERERS, _e() % 3), F.lit("\" \""),
        _el(NGINX_AGENTS, _e() % 4), F.lit("\""),
    )
    return _events(spark, sf_dir).select("event_id", line.alias("line"))


def demo_logs_glog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """glog lines: L<yyyymmdd hh:mm:ss.ffffff> id file:line] msg."""
    line = F.concat(
        _el(["I", "W", "E", "F"], _e() % 4),
        F.date_format("ts", "yyyyMMdd HH:mm:ss"), F.lit(".000000 "),
        (_e() % 10000).cast("string"), F.lit(" "),
        _el(GLOG_FILES, _e() % 3), F.lit(":"), (_e() % 2000).cast("string"),
        F.lit("] op "), (_e() % 50).cast("string"),
    )
    return _events(spark, sf_dir).select("event_id", line.alias("line"))


def demo_logs_klog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """klog lines: like glog but MMdd (kubernetes log prefix)."""
    line = F.concat(
        _el(["I", "W", "E", "F"], _e() % 4),
        F.date_format("ts", "MMdd HH:mm:ss"), F.lit(".000000 "),
        (_e() % 10000).cast("string"), F.lit(" "),
        _el(GLOG_FILES, _e() % 3), F.lit(":"), (_e() % 2000).cast("string"),
        F.lit("] op "), (_e() % 50).cast("string"),
    )
    return _events(spark, sf_dir).select("event_id", line.alias("line"))


def demo_logs_linux_auth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """auth.log (RFC3164) lines: MMM dd HH:mm:ss host app[pid]: msg."""
    line = F.concat(
        F.date_format("ts", "MMM dd HH:mm:ss"),
        F.lit(" host"), (_e() % 50).cast("string"), F.lit(" "),
        _el(AUTH_APPS, _e() % 4), F.lit("["),
        (100 + _e() % 9999).cast("string"), F.lit("]: "),
        F.lit("Accepted publickey for user"), (_e() % 100).cast("string"),
        F.lit(" from "), _ip_col(),
        F.lit(" port "), (1024 + _e() % 64000).cast("string"), F.lit(" ssh2"),
    )
    return _events(spark, sf_dir).select("event_id", line.alias("line"))


def demo_logs_vpc_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AWS VPC flow log lines (default 14-field format); every 13th
    event is the NODATA shape with `-` placeholders — exercising the
    null path exactly like the reference's own example vectors."""
    eni = F.concat(
        F.lit("eni-"),
        F.lpad(F.lower(F.hex(_e() * 2654435761 % 4294967296)), 8, "0"),
    )
    start = F.unix_timestamp("ts").cast("string")
    end = (F.unix_timestamp("ts") + 60).cast("string")
    full = F.concat_ws(
        " ",
        F.lit("2"), (100000000000 + _e() % 1000).cast("string"), eni,
        _ip_col(),
        F.concat_ws(
            ".", F.lit("192"), F.lit("168"),
            (_e() % 256).cast("string"), ((_e() / 256).cast("long") % 256).cast("string"),
        ),
        (1024 + _e() % 64000).cast("string"),
        _el(["80", "443", "22", "8080"], _e() % 4),
        F.lit("6"), (_e() % 1000).cast("string"),
        F.floor(F.col("value") * 1000).cast("bigint").cast("string"),
        start, end, _el(["ACCEPT", "REJECT"], _e() % 2), F.lit("OK"),
    )
    nodata = F.concat_ws(
        " ",
        F.lit("2"), (100000000000 + _e() % 1000).cast("string"), eni,
        F.lit("- - - - - - -"), start, end, F.lit("- NODATA"),
    )
    line = F.when(_e() % 13 == 0, nodata).otherwise(full)
    return _events(spark, sf_dir).select("event_id", line.alias("line"))


def demo_logs_alb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AWS ALB access lines in the reference's field order
    (parse_aws_alb_log.rs parse_log)."""
    method = _el(_METHODS, _e() % 5)
    path = _el(_PATHS, _e() % 7 % 5)
    status = _el([str(s) for s in _STATUSES], _e() % 6)
    line = F.concat_ws(
        " ",
        F.lit("http"), F.lit("my-loadbalancer"),
        F.concat(_ip_col(), F.lit(":"), (1024 + _e() % 64000).cast("string")),
        F.lit("10.0.0.1:80"), F.lit("0.000"), F.lit("0.001"), F.lit("0.000"),
        status, status,
        (_e() % 5000).cast("string"),
        F.floor(F.col("value") * 1000).cast("bigint").cast("string"),
        F.concat(F.lit("\""), method, F.lit(" http://www.example.com:80"),
                 path, F.lit(" HTTP/1.1\"")),
        F.concat(F.lit("\""), _el(NGINX_AGENTS, _e() % 4), F.lit("\"")),
        F.lit("-"), F.lit("-"),
        F.lit("arn:aws:elasticloadbalancing:us-east-2:123456789012:targetgroup/my-targets/73e2d6bc24d8a067"),
        F.concat(F.lit("\"Root=1-"),
                 F.lpad(F.lower(F.hex(_e() * 2654435761 % 4294967296)), 8, "0"),
                 F.lit("\"")),
        F.lit("\"-\""), F.lit("\"-\""), F.lit("0"),
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"),
        F.lit("\"forward\""), F.lit("\"-\""), F.lit("\"-\""),
    )
    return _events(spark, sf_dir).select("event_id", line.alias("line"))


# ---------------------------------------------------------------------------
# multiline aggregation (src/sources/file.rs:154-155 MultilineConfig,
# lib/file-source multiline): assemble continuation lines (stack
# traces) into single events.
# ---------------------------------------------------------------------------


def read_files_whole(spark: SparkSession, path: str) -> DataFrame:
    """(file, content) — one row per file (wholetext). The multiline
    grouping below is then a pure per-row expression, which makes it
    identical in batch and streaming (no window over a stream)."""
    return (
        spark.read.option("wholetext", True)
        .text(path)
        .select(
            F.input_file_name().alias("file"),
            F.col("value").alias("content"),
        )
    )


def assemble_multiline_whole(
    df: DataFrame,
    start_pattern: str,
    content_col: str = "content",
    file_col: str = "file",
) -> DataFrame:
    """Multiline assembly over whole-file rows: events start at lines
    matching start_pattern; continuation lines attach to the previous
    event (the file source's `halt_before`/stack-trace shape). Pure
    higher-order-function expression — zero shuffle, and the same
    code runs under Structured Streaming (wholetext file stream).

    Output: (file, event_idx, event) with event = the joined lines.
    """
    lines = F.split(F.col(content_col), "\n")
    idx = F.sequence(F.lit(0), F.size(lines) - 1)
    # indices where a new event starts; index 0 always starts one so
    # leading continuation lines (no previous event) still emit
    starts = F.array_union(
        F.array(F.lit(0)),
        F.filter(idx, lambda i: F.element_at(lines, i + 1).rlike(start_pattern)),
    )
    n_lines = F.size(lines)
    events = F.transform(
        starts,
        lambda s, j: F.array_join(
            F.slice(
                lines,
                s + 1,
                F.coalesce(F.try_element_at(starts, j + 2), n_lines) - s,
            ),
            "\n",
        ),
    )
    return (
        df.select(
            F.col(file_col).alias("file"),
            F.posexplode(events).alias("event_idx", "event"),
        )
        .filter(F.col("event") != "")
    )


def assemble_multiline_lines(
    df: DataFrame,
    condition_pattern: str,
    mode: str = "continue_through",
    file_col: str = "file",
    line_no_col: str = "line_no",
    line_col: str = "line",
) -> DataFrame:
    """Multiline assembly over (file, line_no, line) rows — the four
    reference modes (lib/file-source multiline Mode):

    * halt_before:      a matching line STARTS a new event
    * continue_through: a matching line is a CONTINUATION (stack
                        trace: indented lines attach upward)
    * continue_past:    a matching line says the NEXT line continues
                        (trailing-backslash shape)
    * halt_with:        a matching line ENDS the event (inclusive)

    One window pass per file to assign event ids, one grouped
    aggregate to join lines. Batch form; the streaming runner uses
    the wholetext variant above.
    """
    w = Window.partitionBy(file_col).orderBy(line_no_col)
    m = F.col(line_col).rlike(condition_pattern)
    if mode == "halt_before":
        new_event = m
    elif mode == "continue_through":
        new_event = ~m
    elif mode == "continue_past":
        new_event = ~F.coalesce(
            F.lag(m).over(w), F.lit(False)
        )
    elif mode == "halt_with":
        new_event = F.coalesce(F.lag(m).over(w), F.lit(True))
    else:
        raise ValueError(f"unknown multiline mode {mode!r}")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    marker = F.when(new_event, 1).otherwise(0)
    # leading orphan lines (cumsum 0) are their OWN event, distinct
    # from the first marked event (cumsum 1) — a greatest(.,1)-style
    # floor would merge them. Re-basing by the file's min keeps ids
    # dense from 0 either way, on the same file partitioning (no
    # extra exchange).
    raw = F.sum(marker).over(run)
    with_id = df.withColumn(
        "_event", raw - F.min(raw).over(Window.partitionBy(file_col))
    )
    pairs = F.collect_list(
        F.struct(F.col(line_no_col).alias("o"), F.col(line_col).alias("v"))
    )
    return (
        with_id.groupBy(file_col, "_event")
        .agg(
            F.array_join(
                F.transform(F.array_sort(pairs), lambda x: x["v"]), "\n"
            ).alias("event"),
            F.min(line_no_col).alias("first_line"),
        )
        .withColumnRenamed("_event", "event_idx")
    )


# ---------------------------------------------------------------------------
# GELF codec (lib/codecs/src/decoding/format/gelf.rs)
# ---------------------------------------------------------------------------

GELF_CORE_SCHEMA = T.StructType([
    T.StructField("version", T.StringType()),
    T.StructField("host", T.StringType()),
    T.StructField("short_message", T.StringType()),
    T.StructField("full_message", T.StringType()),
    T.StructField("timestamp", T.DoubleType()),
    T.StructField("level", T.LongType()),
    T.StructField("facility", T.StringType()),
    T.StructField("line", T.DoubleType()),
    T.StructField("file", T.StringType()),
])


def decode_gelf(df: DataFrame, line_col: str = "line") -> DataFrame:
    """GELF deserializer (gelf.rs message_to_event), strict per the
    reference: version must be "1.1", host and short_message are
    required, `short_message` lands on `message`, `timestamp` is
    fractional epoch seconds, additional fields must be `_`-prefixed
    word/dash/dot names (`_id` silently dropped, gelf.rs:132-148) and
    surface in an `additional` map<string,string>. Spec violations
    set `_decode_error` instead of erroring the batch."""
    col = F.col(line_col)
    # ONE json parse per row: everything derives from the string map
    # (scalar JSON tokens keep their literal text, so the typed core
    # fields are exact casts of the map values — no second from_json)
    allmap = F.from_json(col, "map<string,string>")

    class _CoreView:
        """core[field] with GELF_CORE_SCHEMA's types, served from the
        single map parse."""

        def __getitem__(self, name: str):
            v = allmap[name]
            typ = {f.name: f.dataType for f in GELF_CORE_SCHEMA}[name]
            return v if isinstance(typ, T.StringType) else v.cast(typ)

    core = _CoreView()
    extras = F.map_filter(
        allmap,
        lambda k, v: k.startswith("_")
        & (k != "_id")
        & k.rlike(r"^_[\w.\-]*$"),
    )
    bad_extra = F.exists(
        F.map_keys(allmap),
        lambda k: k.startswith("_") & ~k.rlike(r"^_[\w.\-]*$"),
    )
    err = (
        allmap.isNull()
        | core["version"].isNull()
        | (core["version"] != "1.1")
        | core["host"].isNull()
        | core["short_message"].isNull()
        | F.coalesce(bad_extra, F.lit(False))
    )
    return df.select(
        *[c for c in df.columns if c != line_col],
        core["version"].alias("version"),
        core["host"].alias("host"),
        core["short_message"].alias("message"),
        core["full_message"].alias("full_message"),
        F.to_timestamp(core["timestamp"]).alias("timestamp"),
        core["level"].alias("level"),
        core["facility"].alias("facility"),
        core["line"].alias("line_number"),
        core["file"].alias("file"),
        extras.alias("additional"),
        err.alias("_decode_error"),
    )


def demo_logs_gelf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic GELF JSON lines derived from events (the
    demo_logs generator pattern) — core fields + two `_` additional
    fields, DuckDB-rederivable field by field."""
    line = F.to_json(
        F.struct(
            F.lit("1.1").alias("version"),
            F.concat(F.lit("host-"), (_e() % 8).cast("string")).alias(
                "host"
            ),
            F.concat(F.lit("event "), _e().cast("string")).alias(
                "short_message"
            ),
            (F.unix_timestamp("ts") + 0.25).alias("timestamp"),
            (_e() % 8).alias("level"),
            F.concat(F.lit("app-"), (_e() % 3).cast("string")).alias(
                "_app"
            ),
            _e().cast("string").alias("_seq"),
        )
    )
    return _events(spark, sf_dir).select("event_id", line.alias("line"))


def demo_logs_statsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic statsd datagrams from events, cycling through the
    four metric families the reference source accepts
    (src/sources/statsd/parser.rs:58-113):

      id%4==0  req.count:<n>|c|@0.5|#env:<e>,svc:api   (sampled counter)
      id%4==1  mem.used:<sign><v>|g|#host:h<k>          (gauge, ±/abs)
      id%4==2  latency:<v>|ms|@0.25|#route:r<k>         (sampled timer)
      id%4==3  users:u<user_id>|s                       (set member)

    Every field is arithmetic on (event_id, user_id) so a DuckDB
    oracle can re-derive the decoded output exactly.
    """
    e = _e()
    fam = (e % 4).cast("int")
    counter = F.concat(
        F.lit("req.count:"), (e % 10 + 1).cast("string"),
        F.lit("|c|@0.5|#env:"),
        _el(["prod", "staging"], e % 2),
        F.lit(",svc:api"),
    )
    sign = _el(["", "+", "-"], e % 3)
    gauge = F.concat(
        F.lit("mem.used:"), sign, (e % 1000).cast("string"),
        F.lit("|g|#host:h"), (e % 5).cast("string"),
    )
    timer = F.concat(
        F.lit("latency:"), (e % 5000).cast("string"),
        F.lit("|ms|@0.25|#route:r"), (e % 3).cast("string"),
    )
    setm = F.concat(F.lit("users:u"), F.col("user_id").cast("string"), F.lit("|s"))
    line = (
        F.when(fam == 0, counter)
        .when(fam == 1, gauge)
        .when(fam == 2, timer)
        .otherwise(setm)
    )
    return _events(spark, sf_dir).select("event_id", line.alias("line"))


def demo_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic metric rows (name, type, metric_kind, value,
    member, statistic, sample_rate, tags, ts) from events — input for
    the statsd / prometheus / native_json ENCODERS. Two series
    (counter 'requests_total', gauge 'queue_depth') with two sorted
    tags each."""
    e = _e()
    is_counter = (e % 2) == 0
    return _events(spark, sf_dir).select(
        "event_id",
        F.when(is_counter, F.lit("requests_total"))
        .otherwise(F.lit("queue_depth")).alias("name"),
        F.when(is_counter, F.lit("counter")).otherwise(F.lit("gauge")).alias("type"),
        F.when(is_counter, F.lit("incremental"))
        .otherwise(F.lit("absolute")).alias("metric_kind"),
        (e % 100).cast("double").alias("value"),
        F.lit(None).cast("string").alias("member"),
        F.lit(None).cast("string").alias("statistic"),
        F.lit(None).cast("int").alias("sample_rate"),
        F.create_map(
            F.lit("env"), _el(["prod", "staging"], e % 2),
            F.lit("host"), F.concat(F.lit("h"), (e % 5).cast("string")),
        ).alias("tags"),
        F.col("ts"),
    )


def exec_source(
    spark: SparkSession,
    command: list[str],
    include_stderr: bool = False,
    working_directory: str | None = None,
    num_partitions: int = 1,
) -> DataFrame:
    """`exec` source, scheduled mode (src/sources/exec/mod.rs:49-120,
    518-545): run the command once, one event per stdout line, stamped
    with the reference's metadata keys — host, pid, command, stream
    (mod.rs STREAM_KEY/PID_KEY/COMMAND_KEY) and a timestamp.

    The subprocess necessarily runs on ONE machine (that is the
    operator's semantics — it ingests a local command's output), so
    this is a driver-side seam by design; the returned DataFrame is
    repartitioned so downstream transforms parallelize. Streaming mode
    (rerun-on-exit) belongs in a foreachBatch driver loop, not here.
    """
    import socket
    import subprocess

    # Popen, not run(): CompletedProcess carries no pid, and the
    # reference stamps PID_KEY on every event from the spawned child
    with subprocess.Popen(
        command,
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
        cwd=working_directory,
    ) as proc:
        pid = proc.pid
        try:
            stdout, stderr = proc.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            proc.kill()
            raise
    host = socket.gethostname()
    rows = [(line, "stdout", pid) for line in stdout.splitlines()]
    if include_stderr:
        rows += [(line, "stderr", pid) for line in stderr.splitlines()]
    schema = T.StructType(
        [
            T.StructField("message", T.StringType()),
            T.StructField("stream", T.StringType()),
            T.StructField("pid", T.LongType()),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    if num_partitions > 1:
        df = df.repartition(num_partitions)
    return df.select(
        "*",
        F.lit(host).alias("host"),
        F.array(*[F.lit(c) for c in command]).alias("command"),
        F.lit("exec").alias("source_type"),
        F.current_timestamp().alias("timestamp"),
    )


# ---------------------------------------------------------------------------
# framing decoders (lib/codecs/src/decoding/framing/)
# ---------------------------------------------------------------------------

def apply_framing(
    df: DataFrame,
    framing: dict | str | None,
    content_col: str = "content",
    frame_col: str = "frame",
) -> DataFrame:
    """Unified framing dispatch (lib/codecs/src/decoding/framing/
    mod.rs FramingConfig): map a config `framing` block — `{method:
    newline_delimited | character_delimited | octet_counting |
    length_delimited | bytes, ...}` — onto the frame_* decoders, so
    socket/http/file configs can carry the reference spelling. The
    string framings cast binary buffers to UTF-8 first;
    length_delimited keeps bytes. `bytes` = the whole buffer is one
    frame."""
    method = framing if isinstance(framing, str) else (
        (framing or {}).get("method", "newline_delimited")
    )
    opts = framing if isinstance(framing, dict) else {}
    col = F.col(content_col)
    if method == "bytes":
        return df.withColumn(frame_col, col)
    if method == "length_delimited":
        out = frame_length_delimited(df, content_col=content_col)
    else:
        df = df.withColumn(content_col, col.cast("string"))
        if method == "newline_delimited":
            out = frame_character_delimited(
                df, "\n", content_col=content_col,
                max_length=opts.get("max_length"),
            )
        elif method == "character_delimited":
            delim = opts.get("delimiter")
            if isinstance(delim, dict):  # toml table spelling
                delim = delim.get("delimiter")
            if delim is None:
                raise ValueError("character_delimited needs `delimiter`")
            out = frame_character_delimited(
                df, str(delim), content_col=content_col,
                max_length=opts.get("max_length"),
            )
        elif method == "octet_counting":
            out = frame_octet_counting(
                df, content_col=content_col,
                max_length=opts.get("max_length"),
            )
        else:
            raise ValueError(f"unknown framing method {method!r}")
    if frame_col != "frame":
        out = out.withColumnRenamed("frame", frame_col)
    return out


def frame_character_delimited(
    df: DataFrame,
    delimiter: str,
    content_col: str = "content",
    max_length: int | None = None,
) -> DataFrame:
    """character_delimited framing (framing/character_delimited.rs):
    split the buffer on a delimiter char; frames longer than
    max_length are DISCARDED entirely ("Any frames longer than
    max_length bytes will be discarded entirely",
    character_delimited.rs decode + decode_eof). Pure expressions —
    split + explode + length filter."""
    import re as _re

    frames = F.split(F.col(content_col), _re.escape(delimiter))
    # a trailing delimiter yields one empty trailing frame; the
    # streaming decoder never emits it (no final delimiter seen)
    frames = F.when(
        F.try_element_at(frames, F.lit(-1)) == "",
        F.slice(frames, 1, F.greatest(F.size(frames) - 1, F.lit(0))),
    ).otherwise(frames)
    frame = F.explode(frames).alias("frame")
    out = df.select("*", frame)
    if max_length is not None:
        out = out.filter(F.length("frame") <= max_length)
    return out


def frame_octet_counting(
    df: DataFrame, content_col: str = "content", max_length: int | None = None
) -> DataFrame:
    """octet_counting framing (framing/octet_counting.rs, RFC6587):
    repeated `<len> <data>` frames — an ASCII decimal byte count, one
    space, then exactly that many bytes. Inherently sequential per
    buffer, so it runs as an Arrow-batched pandas UDF; parallelism
    comes from the file/connection axis, exactly as in the reference
    (one decoder per connection). Oversized frames are discarded
    (max_length), matching the Discarding state machine."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def frames_udf(s):
        import pandas as pd

        def split(buf):
            if buf is None:
                return None
            # the length prefix counts OCTETS (RFC6587), so slice on
            # the UTF-8 byte buffer, not the Python str — a char slice
            # mis-frames any non-ASCII payload
            if isinstance(buf, str):
                buf = buf.encode("utf-8")
            out = []
            i, n = 0, len(buf)
            while i < n:
                sp = buf.find(b" ", i)
                if sp < 0:
                    break
                try:
                    ln = int(buf[i:sp])
                except ValueError:
                    # non-conforming: fall back to newline framing for
                    # this line (octet_counting.rs NotDiscarding/newline)
                    nl = buf.find(b"\n", i)
                    if nl < 0:
                        break
                    out.append(buf[i:nl].decode("utf-8", errors="replace"))
                    i = nl + 1
                    continue
                start, end = sp + 1, sp + 1 + ln
                if end > n:
                    break  # incomplete tail frame
                if max_length is None or ln <= max_length:
                    out.append(
                        buf[start:end].decode("utf-8", errors="replace")
                    )
                i = end
            return out

        return s.map(split)

    return df.select("*", F.explode(frames_udf(F.col(content_col))).alias("frame"))


def frame_length_delimited(
    df: DataFrame, content_col: str = "content"
) -> DataFrame:
    """length_delimited framing (framing/length_delimited.rs =
    tokio's LengthDelimitedCodec defaults): 4-byte big-endian u32
    length header before each frame; bytes after an incomplete header
    or short frame are ignored (decode_eof -> None)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<binary>")
    def frames_udf(s):
        import struct

        def split(buf):
            if buf is None:
                return None
            out = []
            i, n = 0, len(buf)
            while i + 4 <= n:
                (ln,) = struct.unpack(">I", buf[i : i + 4])
                if i + 4 + ln > n:
                    break
                out.append(bytes(buf[i + 4 : i + 4 + ln]))
                i += 4 + ln
            return out

        return s.map(split)

    return df.select("*", F.explode(frames_udf(F.col(content_col))).alias("frame"))


def host_metrics_source(
    spark: SparkSession, collectors: list[str] | None = None
) -> DataFrame:
    """`host_metrics` source (src/sources/host_metrics/: cpu.rs,
    memory.rs, loadavg in mod.rs, network.rs) scraping /proc on the
    host — the reference's metric names and tag conventions:
    cpu_seconds_total{mode,cpu} counters, memory_*_bytes gauges,
    load1/5/15 gauges, network_{receive,transmit}_bytes_total{device}
    counters. Like `exec`, the scrape is inherently one-machine (each
    Vector instance reads its own /proc); on a cluster every node
    would run its own scrape and the rows union."""
    import socket
    import time as _time

    collectors = collectors or ["cpu", "memory", "load", "network"]
    rows: list[tuple] = []  # (name, type, metric_kind, value, tags)
    clk = 100.0  # USER_HZ

    if "cpu" in collectors:
        modes = ["user", "nice", "system", "idle"]
        with open("/proc/stat") as f:
            for ln in f:
                if ln.startswith("cpu") and ln[3:4].isdigit():
                    parts = ln.split()
                    cpu = parts[0][3:]
                    for mode, v in zip(modes, parts[1:5]):
                        rows.append((
                            "cpu_seconds_total", "counter", "incremental",
                            int(v) / clk, {"mode": mode, "cpu": cpu},
                        ))
    if "memory" in collectors:
        wanted = {
            "MemTotal": "memory_total_bytes",
            "MemFree": "memory_free_bytes",
            "MemAvailable": "memory_available_bytes",
            "Active": "memory_active_bytes",
            "Buffers": "memory_buffers_bytes",
            "Cached": "memory_cached_bytes",
        }
        with open("/proc/meminfo") as f:
            for ln in f:
                k = ln.split(":")[0]
                if k in wanted:
                    kb = int(ln.split()[1])
                    rows.append((wanted[k], "gauge", "absolute", kb * 1024.0, {}))
    if "load" in collectors:
        l1, l5, l15 = __import__("os").getloadavg()
        rows += [
            ("load1", "gauge", "absolute", l1, {}),
            ("load5", "gauge", "absolute", l5, {}),
            ("load15", "gauge", "absolute", l15, {}),
        ]
    if "network" in collectors:
        with open("/proc/net/dev") as f:
            for ln in list(f)[2:]:
                dev, data = ln.split(":", 1)
                vals = data.split()
                rows.append((
                    "network_receive_bytes_total", "counter", "incremental",
                    float(vals[0]), {"device": dev.strip()},
                ))
                rows.append((
                    "network_transmit_bytes_total", "counter", "incremental",
                    float(vals[8]), {"device": dev.strip()},
                ))

    schema = T.StructType([
        T.StructField("name", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("metric_kind", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType())),
    ])
    df = spark.createDataFrame(rows, schema)
    return df.select(
        "*",
        F.lit(socket.gethostname()).alias("host"),
        F.lit("host_metrics").alias("source_type"),
        F.current_timestamp().alias("ts"),
    )


def internal_logs_source(spark: SparkSession, capacity: int = 10_000):
    """`internal_logs` source (src/sources/internal_logs.rs): the
    engine's own log stream as events. Returns (handler, snapshot_fn):
    attach the handler to any `logging` logger; snapshot_fn() yields
    the buffered records as a DataFrame (message, level, logger, ts)."""
    import collections
    import datetime
    import logging

    buf: "collections.deque" = collections.deque(maxlen=capacity)

    class _Buffer(logging.Handler):
        def emit(self, record: logging.LogRecord) -> None:
            buf.append((
                record.getMessage(),
                record.levelname,
                record.name,
                datetime.datetime.fromtimestamp(
                    record.created, datetime.timezone.utc
                ),
            ))

    handler = _Buffer()

    def snapshot() -> DataFrame:
        schema = T.StructType([
            T.StructField("message", T.StringType()),
            T.StructField("level", T.StringType()),
            T.StructField("logger", T.StringType()),
            T.StructField("timestamp", T.TimestampType()),
        ])
        return spark.createDataFrame(list(buf), schema).select(
            "*", F.lit("internal_logs").alias("source_type")
        )

    return handler, snapshot
