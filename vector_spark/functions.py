"""Vectorized parsing functions — the remap/parse stage.

Reference semantics: Vector's `remap` transform runs a compiled VRL
program per event (src/transforms/remap.rs:456-525); the workhorse
parsers are `parse_regex` (named groups -> object, fails if no match,
lib/vrl/stdlib/src/parse_regex.rs:21-43) and `parse_grok`
(lib/vrl/stdlib/src/parse_grok.rs:9-23). Parse failure with
`reroute_dropped` sends the original event to a `dropped` port
annotated with the reason (remap.rs:92-105, 494-524).

Spark rebuild: the regex is compiled ONCE (driver + per-executor UDF
init), applied over Arrow record batches with pandas' vectorized
`Series.str.extract` — never per-row Python (BASELINE.json
input_hint). Failure becomes a `_parse_error` boolean column; the
`dropped` port is a filter on it (see operators/route.py).

A pure-JVM variant (`parse_transcripts_native`) expresses the same
extraction with `regexp_extract` so the whole stage stays inside
whole-stage codegen; bench.py compares both. Grok patterns compile
to regex on the driver and reuse the same vectorized path.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# the fixture pattern (FIXTURES.md F1): level/req_id/latency_ms/msg
PARSE_PATTERN = (
    r"^\[(?P<level>\w+)\] reqid=(?P<req_id>[0-9a-f]{8})"
    r" latency_ms=(?P<latency_ms>\d+) msg=(?P<msg>.*)$"
)

_PARSED_STRUCT = T.StructType(
    [
        T.StructField("level", T.StringType(), True),
        T.StructField("req_id", T.StringType(), True),
        T.StructField("latency_ms", T.LongType(), True),
        T.StructField("msg", T.StringType(), True),
    ]
)


def make_regex_parser(pattern: str = PARSE_PATTERN):
    """Build a pandas UDF that extracts named groups from a string col.

    Returns a struct column with one field per named group; numeric-
    looking groups named *_ms/*_count or castable stay strings except
    latency_ms which the fixture types as long. Equivalent of VRL
    `parse_regex!(.text, r'...')` vectorized over Arrow batches.
    """
    compiled = re.compile(pattern)
    group_names = list(compiled.groupindex.keys())
    # Fail fast on the driver: the pattern executes under Arrow RE2 on
    # executors, which rejects lookarounds/backreferences that Python
    # `re` accepts, and requires every capture group to be named. A
    # driver-side probe turns an opaque executor stack into a clear
    # ValueError at build time.
    if compiled.groups != len(group_names):
        raise ValueError(
            f"pattern has {compiled.groups - len(group_names)} unnamed "
            "capture group(s); RE2 extract_regex requires named groups "
            "only — use (?P<name>...) or (?:...)"
        )
    import pyarrow as _pa
    import pyarrow.compute as _pc

    try:
        _pc.extract_regex(_pa.array([], type=_pa.string()), pattern)
    except _pa.lib.ArrowInvalid as e:
        raise ValueError(
            f"pattern is valid Python regex but not RE2: {e}"
        ) from e
    fields = []
    for g in group_names:
        if g == "latency_ms":
            fields.append(T.StructField(g, T.LongType(), True))
        else:
            fields.append(T.StructField(g, T.StringType(), True))
    struct = T.StructType(fields)

    @pandas_udf(struct)
    def parse(s: pd.Series) -> pd.DataFrame:
        # Arrow-native RE2 over the batch: pc.extract_regex runs
        # compiled C++ regex directly on the Arrow buffers — measured
        # several-fold faster and far lower memory traffic than
        # pandas' object-dtype .str.extract on the same batch
        import pyarrow as pa
        import pyarrow.compute as pc

        arr = pa.Array.from_pandas(s)
        res = pc.extract_regex(arr, pattern)
        # struct_field (not .field) propagates the parent null of
        # non-matching rows into every extracted column
        out = pd.DataFrame(
            {g: pc.struct_field(res, g).to_pandas() for g in group_names}
        )
        if "latency_ms" in out.columns:
            out["latency_ms"] = pd.to_numeric(
                out["latency_ms"], errors="coerce"
            ).astype("Int64")
        return out

    return parse, struct


def parse_transcripts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Parse stage (pandas/Arrow path): text -> level, req_id,
    latency_ms, msg, _parse_error."""
    parser, _ = make_regex_parser()
    parsed = df.withColumn("_p", parser(F.col(text_col)))
    return (
        parsed.select("*", "_p.*")
        .drop("_p")
        .withColumn("_parse_error", F.col("level").isNull())
    )


def parse_transcripts_native(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Parse stage (pure-JVM path): same semantics via regexp_extract,
    stays inside whole-stage codegen. regexp_extract returns '' on
    no-match, so nullif() restores VRL's fail-on-no-match semantics."""
    t = F.col(text_col)
    # Spark regexes don't need the (?P<..>) names; use group indexes
    pat = (
        r"^\[(\w+)\] reqid=([0-9a-f]{8})"
        r" latency_ms=(\d+) msg=(.*)$"
    )
    return (
        df.withColumn("level", F.nullif(F.regexp_extract(t, pat, 1), F.lit("")))
        .withColumn("req_id", F.nullif(F.regexp_extract(t, pat, 2), F.lit("")))
        .withColumn(
            "latency_ms",
            F.nullif(F.regexp_extract(t, pat, 3), F.lit("")).cast("long"),
        )
        .withColumn(
            "msg",
            F.when(
                F.col(text_col).rlike(pat),
                F.regexp_extract(t, pat, 4),
            ),
        )
        .withColumn("_parse_error", F.col("level").isNull())
    )


def with_dropped_port(
    df: DataFrame,
    error_col: str = "_parse_error",
    component_id: str = "parser",
    component_type: str = "remap",
    reason: str = "error",
    message: str = "parse failure",
) -> tuple[DataFrame, DataFrame]:
    """First-class `dropped` port (src/transforms/remap.rs:92-105,
    494-524): split on the error column into (ok, dropped). Dropped
    rows keep every original column and gain a `metadata_dropped`
    struct mirroring the reference's annotate_dropped metadata
    (reason / message / component_id / component_type /
    component_kind, remap.rs:414-445)."""
    err = F.coalesce(F.col(error_col), F.lit(False))
    ok = df.filter(~err)
    dropped = df.filter(err).withColumn(
        "metadata_dropped",
        F.struct(
            F.lit(reason).alias("reason"),
            F.lit(message).alias("message"),
            F.lit(component_id).alias("component_id"),
            F.lit(component_type).alias("component_type"),
            F.lit("transform").alias("component_kind"),
        ),
    )
    return ok, dropped


# ---------------------------------------------------------------------------
# Grok: Vector's parse_grok compiles patterns at VRL-compile time
# (lib/vrl/stdlib/src/parse_grok.rs). We compile grok -> Python regex
# on the driver and reuse make_regex_parser.
# ---------------------------------------------------------------------------

from vector_spark.grok_patterns import GROK_LIBRARY

GROK_PATTERNS: dict[str, str] = dict(GROK_LIBRARY)

# %{NAME}, %{NAME:alias}, %{NAME:alias:int|float} (logstash type cast)
_GROK_TOKEN = re.compile(r"%\{(\w+)(?::([\w.\[\]@-]+))?(?::(int|float))?\}")
_GROK_MAX_DEPTH = 16


def _sanitize_alias(alias: str) -> str:
    """Grok aliases may contain dots/brackets ([@metadata][x],
    response.time); RE2 named groups may not — map to underscores."""
    return re.sub(r"\W+", "_", alias).strip("_")


def grok_to_regex_typed(
    grok: str, patterns: dict[str, str] | None = None
) -> tuple[str, dict[str, str]]:
    """Compile a grok pattern string to an RE2 regex with named groups
    plus an {alias: "int"|"float"} cast map — the driver-side analogue
    of parse_grok's compile() (lib/vrl/stdlib/src/parse_grok.rs).
    Composite library patterns (COMBINEDAPACHELOG, SYSLOGBASE, ...)
    reference other patterns via %{NAME} and are expanded recursively."""
    pats = GROK_PATTERNS if patterns is None else patterns
    casts: dict[str, str] = {}

    def repl(m: re.Match) -> str:
        name, alias, typ = m.group(1), m.group(2), m.group(3)
        if name not in pats:
            raise ValueError(f"unknown grok pattern %{{{name}}}")
        body = pats[name]
        if alias:
            alias = _sanitize_alias(alias)
            if typ:
                casts[alias] = typ
            return f"(?P<{alias}>{body})"
        return f"(?:{body})"

    out = grok
    for _ in range(_GROK_MAX_DEPTH):
        expanded = _GROK_TOKEN.sub(repl, out)
        if expanded == out:
            break
        out = expanded
    else:
        raise ValueError("grok pattern expansion exceeded max depth (cycle?)")
    return _uncapture(out), casts


def _uncapture(pattern: str) -> str:
    """Rewrite bare capture groups `(` to non-capturing `(?:`. Grok
    extraction is by named alias only, but users write literal parens
    for alternation (`(%{A:a}|%{B:b})`) which the RE2 extract kernel
    rejects as unnamed captures. Escapes and character classes are
    honored; `(?...)` constructs pass through untouched."""
    buf, i, in_class, class_start = [], 0, False, False
    while i < len(pattern):
        ch = pattern[i]
        if ch == "\\" and i + 1 < len(pattern):
            buf.append(pattern[i : i + 2])
            i += 2
            class_start = False
            continue
        if in_class:
            # a ']' immediately after '[' or '[^' is a literal class
            # member (POSIX/RE2 rule), not the class terminator
            if ch == "]" and not class_start:
                in_class = False
            class_start = class_start and ch == "^" and pattern[i - 1] == "["
        elif ch == "[":
            in_class = True
            class_start = True
        elif ch == "(" and pattern[i + 1 : i + 2] != "?":
            buf.append("(?:")
            i += 1
            continue
        buf.append(ch)
        i += 1
    return "".join(buf)


def grok_to_regex(grok: str) -> str:
    """Compile a grok pattern string to a regex with named groups."""
    return grok_to_regex_typed(grok)[0]


def parse_grok(df: DataFrame, grok: str, text_col: str = "text") -> DataFrame:
    """parse_grok as a vectorized stage: grok -> regex -> pandas UDF.
    Logstash-style ``%{NUMBER:bytes:int}`` type suffixes cast the
    extracted string column after extraction (long / double)."""
    pattern, casts = grok_to_regex_typed(grok)
    parser, _ = make_regex_parser(pattern)
    parsed = df.withColumn("_p", parser(F.col(text_col)))
    first_field = parsed.schema["_p"].dataType.fields[0].name
    out = (
        parsed.select("*", "_p.*")
        .drop("_p")
        .withColumn("_parse_error", F.col(first_field).isNull())
    )
    for alias, typ in casts.items():
        out = out.withColumn(
            alias, F.col(alias).cast("long" if typ == "int" else "double")
        )
    return out


def parse_groks(
    df: DataFrame, groks: list[str], text_col: str = "text"
) -> DataFrame:
    """parse_groks (lib/vrl/stdlib/src/parse_groks.rs): try patterns
    in order, first MATCHING pattern supplies its fields; later
    patterns only fire for rows earlier ones missed. One extraction
    struct per pattern in a single projection (no per-pattern passes
    over the data); the output schema is the union of all patterns'
    aliases."""
    if not groks:
        raise ValueError("parse_groks needs at least one pattern")
    compiled = []
    all_fields: list[str] = []
    for g in groks:
        pattern, casts = grok_to_regex_typed(g)
        parser, struct = make_regex_parser(pattern)
        names = [f.name for f in struct.fields]
        compiled.append((parser, names, casts))
        for n in names:
            if n not in all_fields:
                all_fields.append(n)

    tagged = df
    match_cols = []
    for i, (parser, names, _) in enumerate(compiled):
        tagged = tagged.withColumn(f"_p{i}", parser(F.col(text_col)))
        match_cols.append(F.col(f"_p{i}.{names[0]}").isNotNull())

    # first matching pattern index per row (-1 = none matched)
    idx = F.lit(-1)
    for i in reversed(range(len(compiled))):
        idx = F.when(match_cols[i], F.lit(i)).otherwise(idx)
    tagged = tagged.withColumn("_gidx", idx)

    out_cols = []
    cast_map: dict[str, str] = {}
    for fname in all_fields:
        expr = F.lit(None).cast("string")
        for i, (_, names, casts) in enumerate(compiled):
            if fname in names:
                expr = F.when(
                    F.col("_gidx") == i, F.col(f"_p{i}.{fname}").cast("string")
                ).otherwise(expr)
                if fname in casts:
                    cast_map[fname] = casts[fname]
        out_cols.append(expr.alias(fname))

    result = tagged.select(
        *df.columns, *out_cols, (F.col("_gidx") == -1).alias("_parse_error")
    )
    for alias, typ in cast_map.items():
        result = result.withColumn(
            alias, F.col(alias).cast("long" if typ == "int" else "double")
        )
    return result


# ---------------------------------------------------------------------------
# VRL stdlib equivalents that aren't 1:1 builtins (SURVEY.md §2.4).
# Most of VRL's ~130 functions ARE Spark builtins (upcase->upper, ...);
# the ones below need small compositions. Each cites the reference file.
# ---------------------------------------------------------------------------


def parse_key_value(
    col: Column, pair_delim: str = " ", kv_delim: str = "="
) -> Column:
    """VRL parse_key_value / parse_logfmt
    (lib/vrl/stdlib/src/parse_key_value.rs) -> MapType column."""
    return F.str_to_map(col, F.lit(pair_delim), F.lit(kv_delim))


def parse_duration_ms(col: Column) -> Column:
    """VRL parse_duration (lib/vrl/stdlib/src/parse_duration.rs):
    '250ms'/'3s'/'2m'/'1h' -> milliseconds as double."""
    num = F.regexp_extract(col, r"^([0-9.]+)", 1).cast("double")
    unit = F.regexp_extract(col, r"([a-zµ]+)$", 1)
    factor = (
        F.when(unit == "ns", 1e-6)
        .when(unit.isin("us", "µs"), 1e-3)
        .when(unit == "ms", 1.0)
        .when(unit == "s", 1e3)
        .when(unit == "m", 6e4)
        .when(unit == "h", 3.6e6)
        .when(unit == "d", 8.64e7)
    )
    return num * factor


def to_syslog_severity(level: Column) -> Column:
    """VRL to_syslog_severity (lib/vrl/stdlib/src/to_syslog_severity.rs):
    the reference's exact keyword set (emerg|panic, err|error,
    warning|warn, ...), matched case-insensitively."""
    low = F.lower(level)
    return (
        F.when(low.isin("emerg", "panic"), 0)
        .when(low == "alert", 1)
        .when(low == "crit", 2)
        .when(low.isin("err", "error"), 3)
        .when(low.isin("warning", "warn"), 4)
        .when(low == "notice", 5)
        .when(low == "info", 6)
        .when(low == "debug", 7)
        .otherwise(F.lit(None).cast("int"))
    )


REDACT_NAMED_FILTERS = {
    # redact.rs Filter::UsSocialSecurityNumber
    "us_social_security_number": r"\d{3}-\d{2}-\d{4}",
}


def redact(col: Column, filters: list, replacement: str = "[REDACTED]") -> Column:
    """VRL redact (lib/vrl/stdlib/src/redact.rs): replace every match
    of each filter. A filter is a raw pattern string, a named filter
    (`us_social_security_number`), or a {'type': 'pattern',
    'patterns': [...]} spec — the reference's three filter forms."""
    patterns: list[str] = []
    for f in filters:
        if isinstance(f, dict):
            patterns.extend(f.get("patterns", []))
        elif f in REDACT_NAMED_FILTERS:
            patterns.append(REDACT_NAMED_FILTERS[f])
        else:
            patterns.append(f)
    out = col
    for p in patterns:
        out = F.regexp_replace(out, p, replacement)
    return out


def strip_ansi_escape_codes(col: Column) -> Column:
    """VRL strip_ansi_escape_codes (lib/vrl/stdlib/src/strip_ansi_escape_codes.rs):
    full CSI grammar (params 0x30-0x3F incl. '?'/'=', intermediates,
    final byte) plus two-char ESC sequences."""
    return F.regexp_replace(
        col, r"\x1B(?:\[[0-?]*[ -/]*[@-~]|[@-Z\\-_])", ""
    )
