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

from pyspark.sql import Column, DataFrame, SparkSession
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
            F.to_timestamp(_g(line, p, 4), "dd/MMM/yyyy:HH:mm:ss Z"),
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
        .withColumn("timestamp", F.to_timestamp(_g(line, p, 3)))
        .withColumn("hostname", _g(line, p, 4))
        .withColumn("appname", _g(line, p, 5))
        .withColumn("procid", _g(line, p, 6))
        .withColumn("msgid", _g(line, p, 7))
        .withColumn("message", F.regexp_extract(line, p, 8))
        .withColumn("_parse_error", pri.isNull())
    )
