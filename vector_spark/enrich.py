"""Enrichment tables — broadcast lookup joins.

Reference: Vector's enrichment tables (lib/enrichment/src/lib.rs:
39-76) are in-memory CSV/mmdb tables with per-column-set hash
indexes (src/enrichment_tables/file.rs:190-194); VRL functions
`get_enrichment_table_record` (exactly-1 match) and
`find_enrichment_table_records` (N matches) do equality and
BetweenDates lookups (file.rs:218-241).

Rebuild: a dimension table is just a small DataFrame; equality
lookup = `broadcast()` hash join (no shuffle — the 100 TB fact side
never moves); BetweenDates = broadcast range join. The exactly-1
semantics of find_table_row is enforced at load time by a uniqueness
check, which is strictly cheaper than per-row error handling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_spark import schema as S


class EnrichmentTable:
    """A named, keyed dimension table (Vector enrichment_tables file
    provider, src/enrichment_tables/file.rs:18-53).

    case_sensitive=False mirrors Case::Insensitive
    (lib/enrichment/src/lib.rs:32-35, index build at
    file.rs:190-194): string keys compare lowercase-folded on BOTH
    sides — implemented by folding at join time, the broadcast-join
    equivalent of building the hash index over lowered keys. Returned
    dimension attributes keep their stored case (row_equals matches
    case-folded but add_columns returns the row as stored)."""

    def __init__(
        self,
        df: DataFrame,
        key: list[str],
        name: str = "",
        case_sensitive: bool = True,
    ):
        self.df = df
        self.key = key
        self.name = name
        self.case_sensitive = case_sensitive

    def _fold(self, df: DataFrame, cols: list[str]) -> DataFrame:
        for k in cols:
            if dict(df.dtypes).get(k) == "string":
                df = df.withColumn(k, F.lower(F.col(k)))
        return df

    def assert_unique_key(self) -> None:
        """find_table_row errors unless exactly one row matches
        (lib/enrichment/src/lib.rs:39-51); we enforce it once at load
        — under the table's case mode, so 'A'/'a' collide when
        insensitive."""
        keyed = self.df if self.case_sensitive else self._fold(self.df, self.key)
        dupes = keyed.groupBy(*self.key).count().filter(F.col("count") > 1)
        if dupes.limit(1).count() > 0:
            raise ValueError(
                f"enrichment table {self.name!r} has duplicate keys {self.key}"
            )

    def lookup(self, facts: DataFrame, how: str = "left") -> DataFrame:
        """Equality enrich: broadcast hash join on the key columns
        (lowercase-folded on both sides when case-insensitive; the
        fact columns keep their original case in the output)."""
        if self.case_sensitive:
            return facts.join(F.broadcast(self.df), on=self.key, how=how)
        str_keys = [
            k for k in self.key if dict(facts.dtypes).get(k) == "string"
        ]
        fold = [f"__ci_{k}" for k in str_keys]
        f = facts
        dim = self._fold(self.df, str_keys)
        for k, c in zip(str_keys, fold):
            f = f.withColumn(c, F.lower(F.col(k)))
            dim = dim.withColumnRenamed(k, c)
        on = [f"__ci_{k}" if k in str_keys else k for k in self.key]
        return f.join(F.broadcast(dim), on=on, how=how).drop(*fold)

    def lookup_wildcard(
        self,
        facts: DataFrame,
        field: str,
        pattern_col: str,
        how: str = "left",
    ) -> DataFrame:
        """Wildcard condition enrich: dimension rows carry glob
        patterns (`*` = any run, `?` = any one char; later public
        Vector releases add Condition::Wildcard to the Equals/
        BetweenDates set). Globs translate to SQL LIKE once on the
        (broadcast) dimension side; the fact side never moves. Matches
        follow find_table_rows semantics: every matching dimension row
        joins (a fact row may multiply)."""
        esc = F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(F.col(pattern_col), r"\\", r"\\\\"),
                "%", r"\\%",
            ),
            "_", r"\\_",
        )
        like_pat = F.translate(esc, "*?", "%_")
        dim = self.df.withColumn("__like_pat", like_pat)
        cond = F.like(facts[field], dim["__like_pat"], F.lit("\\"))
        if self.case_sensitive:
            matched = facts.join(F.broadcast(dim), cond, how)
        else:
            matched = facts.join(
                F.broadcast(dim),
                F.ilike(facts[field], dim["__like_pat"], F.lit("\\")),
                how,
            )
        return matched.drop("__like_pat")

    def lookup_between(
        self, facts: DataFrame, ts_col: str, frm: str, to: str, how: str = "left"
    ) -> DataFrame:
        """BetweenDates enrich (file.rs:233-239): broadcast range join
        facts.ts BETWEEN dim.frm AND dim.to (+ equality key if any)."""
        cond = (F.col(ts_col) >= self.df[frm]) & (F.col(ts_col) <= self.df[to])
        fact_types = dict(facts.dtypes)
        for k in self.key:
            # honor the table's case mode like lookup(): raw equality
            # here would silently miss rows lookup() matches
            if not self.case_sensitive and fact_types.get(k) == "string":
                cond = cond & (F.lower(facts[k]) == F.lower(self.df[k]))
            else:
                cond = cond & (facts[k] == self.df[k])
        return facts.join(F.broadcast(self.df), cond, how)


def load_csv_table(
    spark: SparkSession, path: str, key: list[str], schema=None
) -> EnrichmentTable:
    """CSV file enrichment table with a typed schema
    (file.rs:55-111's per-column type parsing = explicit StructType)."""
    reader = spark.read.option("header", "true")
    df = reader.schema(schema).csv(path) if schema is not None else reader.csv(path)
    t = EnrichmentTable(df, key, name=path)
    t.assert_unique_key()
    return t


def _values_df(spark: SparkSession, rows: list[tuple], schema) -> "DataFrame":
    """Inline VALUES relation — a pure LocalRelation Catalyst folds
    and broadcasts directly, vs createDataFrame's Python-RDD scan
    (applySchemaToPythonRDD) which shows up as an un-analyzable
    `Scan ExistingRDD` and costs an extra job per dim."""
    def lit(v):
        if v is None:
            return "NULL"
        if isinstance(v, bool):
            return "TRUE" if v else "FALSE"
        if isinstance(v, str):
            # double backslashes too: with the default
            # escapedStringLiterals=false the SQL parser would turn
            # '\t'/'\n' inside a value like 'C:\temp' into control
            # characters, silently corrupting the dimension key
            s = v.replace("\\", "\\\\").replace("'", "''")
            return "'" + s + "'"
        if isinstance(v, float) and (v != v or v in (float("inf"), float("-inf"))):
            name = "NaN" if v != v else ("Infinity" if v > 0 else "-Infinity")
            return f"CAST('{name}' AS DOUBLE)"
        if isinstance(v, (int, float)):
            return str(v)
        raise TypeError(
            f"unsupported VALUES literal {v!r} ({type(v).__name__}); "
            "only int/float/bool/str/None render safely"
        )

    values = ", ".join("(" + ", ".join(lit(v) for v in row) + ")" for row in rows)
    cols = ", ".join(f.name for f in schema.fields)
    df = spark.sql(f"SELECT * FROM (VALUES {values}) AS t({cols})")
    casts = [F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields]
    return df.select(*casts)


def role_dim(spark: SparkSession) -> EnrichmentTable:
    df = _values_df(spark, S.ROLE_DIM_ROWS, S.ROLE_DIM_SCHEMA)
    return EnrichmentTable(df, ["role"], "role_dim")


def tool_dim(spark: SparkSession) -> EnrichmentTable:
    df = _values_df(spark, S.TOOL_DIM_ROWS, S.TOOL_DIM_SCHEMA)
    return EnrichmentTable(df, ["tool"], "tool_dim")


def enrich_transcripts(spark: SparkSession, parsed: DataFrame) -> DataFrame:
    """The pipeline's enrich stage: role_dim + tool_dim broadcast
    lookups. Left joins — unmatched keys keep null attributes, the
    analogue of VRL's fallible lookup defaulting."""
    out = role_dim(spark).lookup(parsed)
    out = tool_dim(spark).lookup(out)
    return out


def stamp_metadata(facts: DataFrame, metadata: dict, fields: list[str] | None = None) -> DataFrame:
    """aws_ec2_metadata analogue (src/transforms/aws_ec2_metadata.rs:
    85-92): fetch instance metadata once on the driver (here: the
    caller passes the dict — region, instance_id, ami_id, ...) and
    stamp selected keys on every event as literal columns. Literals
    are constant-folded by Catalyst — zero per-row cost."""
    keys = fields if fields is not None else list(metadata)
    out = facts
    for k in keys:
        out = out.withColumn(k, F.lit(metadata[k]))
    return out


def ip_prefix_enrich(
    facts: DataFrame,
    prefix_dim: DataFrame,
    ip_col: str,
    prefix_len: int = 16,
) -> DataFrame:
    """geoip-style enrichment (src/transforms/geoip.rs:22-54) without
    the mmdb dependency: the dimension maps CIDR prefixes to
    attributes. For a fixed prefix length this reduces to an equality
    broadcast join on the masked IP — the scalable form of an
    IP-range lookup (a general-mask mmdb would probe /32../8 masks,
    i.e. up to 25 broadcast lookups, still shuffle-free).

    prefix_dim must carry `prefix_int` = the masked numeric prefix.
    """
    parts = F.split(F.col(ip_col), r"\.")
    ip_int = (
        parts[0].cast("long") * 16777216 + parts[1].cast("long") * 65536
        + parts[2].cast("long") * 256 + parts[3].cast("long")
    )
    mask = (0xFFFFFFFF << (32 - prefix_len)) & 0xFFFFFFFF
    keyed = facts.withColumn("prefix_int", ip_int.bitwiseAND(F.lit(mask)))
    return keyed.join(F.broadcast(prefix_dim), on="prefix_int", how="left")


# DuckDB-side dimension CTEs for oracle queries
ROLE_DIM_SQL = """
SELECT * FROM (VALUES
  ('user','human',TRUE,1), ('assistant','model',FALSE,2),
  ('system','control',FALSE,3), ('tool','machine',FALSE,4)
) AS role_dim(role, role_group, is_human, priority)
"""

TOOL_DIM_SQL = """
SELECT * FROM (VALUES
  ('search','retrieval',TRUE), ('python','compute',TRUE),
  ('browser','retrieval',TRUE), ('none','none',FALSE)
) AS tool_dim(tool, tool_family, billable)
"""
