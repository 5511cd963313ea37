"""Deterministic transcripts table, derived from the `events` table.

BASELINE.json pins the pipeline input to a conversation-transcripts
table (conv_id, turn_idx, role, text, tool, ts). No such parquet
exists in /root/testdata, so we DERIVE it deterministically from the
driver-generated `events` table with expressions that are portable
between Spark SQL and DuckDB SQL. That makes every downstream
pipeline stage oracle-checkable: the DuckDB oracle re-derives the
identical table via TRANSCRIPTS_DUCKDB_CTE and runs ANSI SQL on it.

Derivation rules (seeded by event_id / user_id, no randomness):
  conv_id    = 'conv-%08d' % user_id
  turn_idx   = dense 0..n-1 per conv ordered by (ts, event_id)
  role       = event_id%20 -> 0-8 user, 9-17 assistant, 18 system, 19 tool
  tool       = for assistant/tool roles: [search,python,browser,none][event_id%4]
  level      = [INFO,WARN,ERROR,DEBUG,INFO,ERROR,INFO,WARN,INFO,INFO][event_id%10]
  latency_ms = floor(value*10)
  req_id     = lpad(lower(hex(event_id*2654435761 % 2^32)), 8, '0')
  msg        = lex[e%24] + ' ' + repeat(lex[(e div 24)%24]+' ', e%16) + lex[(e div 576)%24]
  text       = '[<level>] reqid=<req_id> latency_ms=<n> msg=<msg>'
               (~2% malformed: event_id%47==0 drops the '[level] ' prefix,
                exercising the parse-failure / dropped route,
                reference src/transforms/remap.rs:92-105)
  ts         = events.ts

A unit test asserts Spark and DuckDB produce byte-identical tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

LEXICON = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
    "oscar", "papa", "quebec", "romeo", "sierra", "tango", "uniform",
    "victor", "whiskey", "xray",
]

_LEX_SQL = "array(" + ", ".join(f"'{w}'" for w in LEXICON) + ")"
_LEX_DUCK = "[" + ", ".join(f"'{w}'" for w in LEXICON) + "]"

# Spark SQL derivation (runs over a temp view `events`)
TRANSCRIPTS_SPARK_SQL = f"""
SELECT
  format_string('conv-%08d', user_id) AS conv_id,
  CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INT) AS turn_idx,
  CASE WHEN event_id % 20 < 9 THEN 'user'
       WHEN event_id % 20 < 18 THEN 'assistant'
       WHEN event_id % 20 = 18 THEN 'system'
       ELSE 'tool' END AS role,
  CONCAT(
    CASE WHEN event_id % 47 = 0 THEN ''
         ELSE CONCAT('[',
           element_at(array('INFO','WARN','ERROR','DEBUG','INFO','ERROR','INFO','WARN','INFO','INFO'),
                      CAST(event_id % 10 AS INT) + 1), '] ') END,
    'reqid=', lpad(lower(hex(event_id * 2654435761 % 4294967296)), 8, '0'),
    ' latency_ms=', CAST(CAST(floor(value * 10) AS BIGINT) AS STRING),
    ' msg=',
    element_at({_LEX_SQL}, CAST(event_id % 24 AS INT) + 1), ' ',
    repeat(CONCAT(element_at({_LEX_SQL}, CAST((event_id div 24) % 24 AS INT) + 1), ' '),
           CAST(event_id % 16 AS INT)),
    element_at({_LEX_SQL}, CAST((event_id div 576) % 24 AS INT) + 1)
  ) AS text,
  CASE WHEN event_id % 20 >= 9 AND event_id % 20 != 18
       THEN element_at(array('search','python','browser','none'), CAST(event_id % 4 AS INT) + 1)
       ELSE NULL END AS tool,
  ts
FROM events
"""

# DuckDB derivation — same semantics, DuckDB dialect. Used as a CTE
# body by every oracle_sql() entry.
TRANSCRIPTS_DUCKDB_CTE = f"""
SELECT
  printf('conv-%08d', user_id) AS conv_id,
  CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INT) AS turn_idx,
  CASE WHEN event_id % 20 < 9 THEN 'user'
       WHEN event_id % 20 < 18 THEN 'assistant'
       WHEN event_id % 20 = 18 THEN 'system'
       ELSE 'tool' END AS role,
  CONCAT(
    CASE WHEN event_id % 47 = 0 THEN ''
         ELSE CONCAT('[',
           (['INFO','WARN','ERROR','DEBUG','INFO','ERROR','INFO','WARN','INFO','INFO'])[CAST(event_id % 10 AS INT) + 1], '] ') END,
    'reqid=', lpad(lower(hex(event_id * 2654435761 % 4294967296)), 8, '0'),
    ' latency_ms=', CAST(CAST(floor(value * 10) AS BIGINT) AS VARCHAR),
    ' msg=',
    ({_LEX_DUCK})[CAST(event_id % 24 AS INT) + 1], ' ',
    repeat(CONCAT(({_LEX_DUCK})[CAST((event_id // 24) % 24 AS INT) + 1], ' '),
           CAST(event_id % 16 AS INT)),
    ({_LEX_DUCK})[CAST((event_id // 576) % 24 AS INT) + 1]
  ) AS text,
  CASE WHEN event_id % 20 >= 9 AND event_id % 20 != 18
       THEN (['search','python','browser','none'])[CAST(event_id % 4 AS INT) + 1]
       ELSE NULL END AS tool,
  ts
FROM events
"""


def oracle_with_transcripts(body: str) -> str:
    """Wrap an oracle query body with the transcripts CTE (DuckDB).

    The driver pre-registers `events` as a view, so the CTE is
    self-contained.
    """
    return f"WITH transcripts AS ({TRANSCRIPTS_DUCKDB_CTE})\n{body}"


_transcripts_cache: dict[tuple[int, str], DataFrame] = {}


def derive_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw derivation plan (one window shuffle on user_id)."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    events.createOrReplaceTempView("events")
    return spark.sql(TRANSCRIPTS_SPARK_SQL)


def load_transcripts(
    spark: SparkSession, sf_dir: str, cache: bool = True
) -> DataFrame:
    """The transcripts table for {sf_dir}.

    At 100 TB this is `spark.read.table('transcripts')` on an Iceberg
    catalog; here the table is derived from events.parquet once per
    process and MATERIALIZED to a scratch parquet dir, then read back
    — so every downstream query scans a real stored columnar table
    (predicate pushdown, column pruning) instead of replaying the
    derivation window, exactly like production. (`.cache()` of the
    windowed plan was measured pathologically slow on tiny inputs;
    a written table sidesteps that and survives memory pressure.)

    cache=False returns the raw derivation plan (used by tests that
    check the derivation itself).
    """
    if not cache:
        return derive_transcripts(spark, sf_dir)
    key = (id(spark), sf_dir)
    if key in _transcripts_cache:
        return _transcripts_cache[key]
    import atexit
    import hashlib
    import os
    import shutil
    import tempfile

    # a pre-materialized stored table in the sf dir wins outright
    # (bench --scaling writes one; production always has one)
    stored = os.path.join(sf_dir, "transcripts.parquet")
    if os.path.exists(os.path.join(stored, "_SUCCESS")):
        df = spark.read.parquet(stored)
        _transcripts_cache[key] = df
        return df
    tag = hashlib.md5(
        (TRANSCRIPTS_SPARK_SQL + sf_dir).encode()
    ).hexdigest()[:12]
    path = os.path.join(
        tempfile.gettempdir(), f"vector_spark_transcripts_{tag}_{os.getpid()}"
    )
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        derive_transcripts(spark, sf_dir).write.mode("overwrite").parquet(path)
        atexit.register(shutil.rmtree, path, ignore_errors=True)
    df = spark.read.parquet(path)
    _transcripts_cache[key] = df
    return df
