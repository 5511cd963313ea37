"""Canned log-format parsers — the VRL stdlib parse_* family.

Reference: lib/vrl/stdlib/src/parse_*.rs (27 parser files) with the
shared regex set in lib/vrl/stdlib/src/log_util.rs. Each parser here
cites its reference file and keeps the reference's field names and
types (log_util.rs capture_value: status/size/pid/tid/cid/port ->
integer, timestamp -> timestamp, everything else string).

Spark rebuild: every line format is a native `regexp_extract`
composition — the whole parse stays inside whole-stage codegen (no
Python). Multi-valued parsers (parse_regex_all, parse_tokens) map to
`regexp_extract_all` + higher-order functions. The only Python
crossing is parse_xml (no JVM XML reader for free-form columns),
which is an Arrow-batched pandas UDF.

Parse failure follows the repo convention: `_parse_error` boolean
column (the reference's fallible-call + reroute_dropped seam,
src/transforms/remap.rs:92-105).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


def _g(line: Column, pat: str, i: int) -> Column:
    return F.nullif(F.regexp_extract(line, pat, i), F.lit(""))


_GROUP_UDFS: dict[str, object] = {}


def _name_groups(pat: str) -> str | None:
    """Auto-name every unnamed capture group g1..gn so RE2's
    extract_regex (which only returns NAMED groups) can run a
    numbered-group pattern. Returns None when the pattern already
    uses named groups or other `(?` constructs we'd misnumber —
    callers fall back to the Python-re path then."""
    if "(?P<" in pat:
        return None
    # walk the pattern tracking runs of preceding backslashes: '(' is
    # a capture-group opener only when preceded by an EVEN number of
    # backslashes (a single-char lookbehind misclassifies r'\\(' —
    # escaped backslash THEN a real group — leaving it unnamed and
    # desyncing the g<n> names from the group count)
    out = []
    idx = 0
    backslashes = 0
    i = 0
    while i < len(pat):
        ch = pat[i]
        if ch == "\\":
            backslashes += 1
            out.append(ch)
            i += 1
            continue
        if ch == "(" and backslashes % 2 == 0:
            if pat[i + 1 : i + 2] == "?":
                out.append(ch)  # non-capturing / special construct
            else:
                idx += 1
                out.append(f"(?P<g{idx}>")
        else:
            out.append(ch)
        backslashes = 0
        i += 1
    named = "".join(out)
    # belt and braces: if our count disagrees with re's, bail to the
    # python-re fallback rather than KeyError at executor runtime
    import re as _re

    try:
        if _re.compile(named).groups != idx:
            return None
    except _re.error:
        return None
    return named


def _groups(line: Column, pat: str, n: int) -> Column:
    """ONE anchored-regex pass over the line, as an Arrow-batched
    pandas UDF returning the full capture-group array (null on
    non-match, '' for unmatched optional groups). The naive per-field
    regexp_extract re-executes the full pattern once per column — a
    per-row regex blowup for wide formats — and JVM-side single-pass
    tricks (regexp_replace into a joined group string) are defeated
    by CollapseProject duplicating the shared subtree per field.
    Spark extracts Python UDFs into a single ArrowEvalPython node and
    dedupes identical UDF expressions, so referencing this column
    from every field is one regex execution per row.

    Fast path: pyarrow.compute.extract_regex (RE2 on the Arrow
    buffers, no per-row Python) — measured ~5x the per-row `re`
    fallback. Probed at build time; RE2-incompatible patterns
    (backrefs, lookaround, pre-named groups) fall back to `re`."""
    udf = _GROUP_UDFS.get(pat)
    if udf is not None:
        return udf(line)

    from pyspark.sql.functions import pandas_udf

    named = _name_groups(pat)
    re2_ok = False
    if named is not None:
        import pyarrow as pa
        import pyarrow.compute as pc

        try:  # driver-side probe (ADVICE round 1: fail fast, not in-executor)
            pc.extract_regex(pa.array([], type=pa.string()), named)
            re2_ok = True
        except pa.ArrowInvalid:
            re2_ok = False

    if re2_ok:

        @pandas_udf("array<string>")
        def group_udf(s, _named=named, _n=n):
            import pandas as pd
            import pyarrow as pa
            import pyarrow.compute as pc

            arr = pa.Array.from_pandas(s)
            st = pc.extract_regex(arr, _named)
            cols = [st.field(f"g{i+1}").to_pandas() for i in range(_n)]
            out = pd.Series(list(map(list, zip(*cols))), index=s.index)
            out[~pc.is_valid(st).to_pandas().to_numpy()] = None
            return out

    else:

        @pandas_udf("array<string>")
        def group_udf(s, _pat=pat):
            import re as _re

            rx = _re.compile(_pat)

            def m(x):
                if x is None:
                    return None
                mm = rx.match(x)
                if mm is None:
                    return None
                return ["" if v is None else v for v in mm.groups()]

            return s.map(m)

    _GROUP_UDFS[pat] = group_udf
    return group_udf(line)


def _gi(parts: Column, i: int) -> Column:
    """1-based group accessor; unmatched optional groups are ''."""
    return F.nullif(parts.getItem(i - 1), F.lit(""))


# ---------------------------------------------------------------------------
# apache error (parse_apache_log.rs format="error";
# log_util.rs REGEX_APACHE_ERROR_LOG "simple format")
# ---------------------------------------------------------------------------

APACHE_ERROR_PATTERN = (
    r"^\s*\[([^\]]*)\] \[([^:\]]*):([^\]]*)\]"
    r" \[pid (\d+)(?::tid (\d+))?\] \[client (.*):(\d+)\] (.*?)\s*$"
)


def parse_apache_error(
    df: DataFrame,
    line_col: str = "line",
    ts_format: str = "MMM dd HH:mm:ss yyyy",
) -> DataFrame:
    """parse_apache_log(format: "error") — log_util.rs:72-107 simple
    format: [ts] [module:severity] [pid N:tid M] [client ip:port] msg.
    The default apache error timestamp leads with a day-of-week name,
    which Spark >=3 refuses to PARSE (EEE is format-only) — it is
    redundant with the date, so it's stripped before to_timestamp."""
    g = _groups(F.col(line_col), APACHE_ERROR_PATTERN, 8)
    ts_raw = F.regexp_replace(_gi(g, 1), r"^\w{3} ", "")
    # Apache >= 2.4 includes microseconds ('Sep 09 10:42:29.902022
    # 2011') — try the fractional form first, then the caller's
    # format. try_to_timestamp (not to_timestamp): under Spark 4's
    # default ANSI mode an unparseable-but-matched timestamp would
    # abort the JOB instead of setting _parse_error.
    ts = F.coalesce(
        F.try_to_timestamp(ts_raw, F.lit("MMM dd HH:mm:ss.SSSSSS yyyy")),
        F.try_to_timestamp(ts_raw, F.lit(ts_format)),
    )
    return (
        df.withColumn("timestamp", ts)
        .withColumn("module", _gi(g, 2))
        .withColumn("severity", _gi(g, 3))
        .withColumn("pid", _gi(g, 4).cast("int"))
        .withColumn("thread", _gi(g, 5))
        .withColumn("client", _gi(g, 6))
        .withColumn("port", _gi(g, 7).cast("int"))
        .withColumn("message", _gi(g, 8))
        .withColumn("_parse_error", g.isNull())
    )


# ---------------------------------------------------------------------------
# nginx (parse_nginx_log.rs; log_util.rs REGEX_NGINX_COMBINED_LOG /
# REGEX_NGINX_ERROR_LOG)
# ---------------------------------------------------------------------------

NGINX_COMBINED_PATTERN = (
    r'^\s*(\S+) - (\S+) \[([^\]]+)\] "(\w+) (\S+) (\S+)" (\d+) (\d+)'
    r' "([^"]*)" "([^"]*)"(?: "([^"]*)")?\s*$'
)

NGINX_ERROR_PATTERN = (
    r"^\s*(.+?) \[(\w+)\] (\d+)#(\d+):(?: \*(\d+))? ([^,]*)"
    r"(?:, client: ([^,]+))?(?:, server: ([^,]+))?"
    r'(?:, request: "([^"]+)")?(?:, host: "([^"]+)")?\s*$'
)


def parse_nginx_log(
    df: DataFrame,
    line_col: str = "line",
    format: str = "combined",
    ts_format: str | None = None,
) -> DataFrame:
    """parse_nginx_log.rs: combined access format or error format.

    combined: ip - user [ts] "method path proto" status size
              "referer" "agent" ["compression"]
    error:    yyyy/MM/dd HH:mm:ss [severity] pid#tid: *cid msg, ...
    """
    line = F.col(line_col)
    if format == "combined":
        g = _groups(line, NGINX_COMBINED_PATTERN, 11)
        fmt = ts_format or "dd/MMM/yyyy:HH:mm:ss Z"
        return (
            df.withColumn("client", _gi(g, 1))
            .withColumn("user", F.when(_gi(g, 2) != "-", _gi(g, 2)))
            .withColumn("timestamp", F.try_to_timestamp(_gi(g, 3), F.lit(fmt)))
            .withColumn("method", _gi(g, 4))
            .withColumn("path", _gi(g, 5))
            .withColumn("protocol", _gi(g, 6))
            .withColumn("status", _gi(g, 7).cast("int"))
            .withColumn("size", _gi(g, 8).cast("long"))
            .withColumn("referer", F.when(_gi(g, 9) != "-", _gi(g, 9)))
            .withColumn("agent", F.when(_gi(g, 10) != "-", _gi(g, 10)))
            .withColumn("compression", F.when(_gi(g, 11) != "-", _gi(g, 11)))
            .withColumn("_parse_error", g.isNull())
        )
    if format == "error":
        g = _groups(line, NGINX_ERROR_PATTERN, 10)
        fmt = ts_format or "yyyy/MM/dd HH:mm:ss"
        return (
            df.withColumn("timestamp", F.try_to_timestamp(_gi(g, 1), F.lit(fmt)))
            .withColumn("severity", _gi(g, 2))
            .withColumn("pid", _gi(g, 3).cast("int"))
            .withColumn("tid", _gi(g, 4).cast("int"))
            .withColumn("cid", _gi(g, 5).cast("int"))
            .withColumn("message", _gi(g, 6))
            .withColumn("client", _gi(g, 7))
            .withColumn("server", _gi(g, 8))
            .withColumn("request", _gi(g, 9))
            .withColumn("host", _gi(g, 10))
            .withColumn("_parse_error", g.isNull())
        )
    raise ValueError(f"unknown nginx format {format!r}")


# ---------------------------------------------------------------------------
# glog / klog (parse_glog.rs, parse_klog.rs)
# ---------------------------------------------------------------------------

GLOG_PATTERN = (
    r"^\s*(\w)(\d{8} \d{2}:\d{2}:\d{2}\.\d{6}) +(\d+) (.+):(\d+)\] (.*?)\s*$"
)
KLOG_PATTERN = (
    r"^\s*(\w)(\d{4} \d{2}:\d{2}:\d{2}\.\d{6}) +(\d+) (.+):(\d+)\] (.*?)\s*$"
)

_GLOG_LEVELS = {"I": "info", "W": "warning", "E": "error", "F": "fatal"}


def _glog_level(c: Column) -> Column:
    out = F.lit(None).cast("string")
    expr = None
    for k, v in _GLOG_LEVELS.items():
        expr = F.when(c == k, v) if expr is None else expr.when(c == k, v)
    return expr.otherwise(out)


def parse_glog(df: DataFrame, line_col: str = "line") -> DataFrame:
    """parse_glog.rs: L<yyyymmdd hh:mm:ss.ffffff> id file:line] msg;
    level letter maps I/W/E/F -> info/warning/error/fatal."""
    g = _groups(F.col(line_col), GLOG_PATTERN, 6)
    return (
        df.withColumn("level", _glog_level(_gi(g, 1)))
        .withColumn(
            "timestamp",
            F.try_to_timestamp(_gi(g, 2), F.lit("yyyyMMdd HH:mm:ss.SSSSSS")),
        )
        .withColumn("id", _gi(g, 3).cast("long"))
        .withColumn("file", _gi(g, 4))
        .withColumn("line_no", _gi(g, 5).cast("long"))
        .withColumn("message", _gi(g, 6))
        .withColumn("_parse_error", g.isNull())
    )


def parse_klog(
    df: DataFrame, line_col: str = "line", year: int | None = None
) -> DataFrame:
    """parse_klog.rs: like glog but MMDD (no year). The reference
    resolves the year against the current date (resolve_year) — not
    reproducible in batch, so pass `year` explicitly for a resolved
    timestamp, or leave None to keep the raw `timestamp` string
    (documented divergence)."""
    g = _groups(F.col(line_col), KLOG_PATTERN, 6)
    out = (
        df.withColumn("level", _glog_level(_gi(g, 1)))
        .withColumn("id", _gi(g, 3).cast("long"))
        .withColumn("file", _gi(g, 4))
        .withColumn("line_no", _gi(g, 5).cast("long"))
        .withColumn("message", _gi(g, 6))
        .withColumn("_parse_error", g.isNull())
    )
    raw = _gi(g, 2)
    if year is None:
        return out.withColumn("timestamp", raw)
    return out.withColumn(
        "timestamp",
        F.try_to_timestamp(
            F.concat(F.lit(str(year)), raw),
            F.lit("yyyyMMdd HH:mm:ss.SSSSSS"),
        ),
    )


# ---------------------------------------------------------------------------
# syslog RFC3164 + parse_linux_authorization (parse_syslog.rs,
# parse_linux_authorization.rs — the latter is a direct alias)
# ---------------------------------------------------------------------------

SYSLOG_3164_PATTERN = (
    r"^\s*(?:<(\d{1,3})>)?(\w{3} [ \d]\d \d{2}:\d{2}:\d{2}) (\S+)"
    r" ([^:\[\s]+)(?:\[(\d+)\])?: (.*?)\s*$"
)


def parse_syslog_3164(
    df: DataFrame, line_col: str = "line", year: int | None = None
) -> DataFrame:
    """RFC3164 BSD syslog: [<pri>]MMM dd HH:mm:ss host app[pid]: msg.
    RFC3164 timestamps carry no year (the reference resolves against
    the current date); pass `year` for a resolved timestamp, else the
    raw string is kept."""
    g = _groups(F.col(line_col), SYSLOG_3164_PATTERN, 6)
    pri = _gi(g, 1).cast("int")
    out = (
        df.withColumn("facility", (pri / 8).cast("int"))
        .withColumn("severity", pri % 8)
        .withColumn("hostname", _gi(g, 3))
        .withColumn("appname", _gi(g, 4))
        .withColumn("procid", _gi(g, 5).cast("long"))
        .withColumn("message", _gi(g, 6))
        .withColumn("_parse_error", g.isNull())
    )
    raw = _gi(g, 2)
    if year is None:
        return out.withColumn("timestamp", raw)
    # RFC3164 space-pads single-digit days ('Dec  5') — collapse the
    # double space or 'MMM d' never matches days 1-9
    return out.withColumn(
        "timestamp",
        F.try_to_timestamp(
            F.concat(
                F.lit(f"{year} "), F.regexp_replace(raw, r"\s+", " ")
            ),
            F.lit("yyyy MMM d HH:mm:ss"),
        ),
    )


def parse_linux_authorization(
    df: DataFrame, line_col: str = "line", year: int | None = None
) -> DataFrame:
    """parse_linux_authorization.rs — an alias for parse_syslog over
    auth.log lines (the reference compiles to ParseSyslogFn)."""
    return parse_syslog_3164(df, line_col, year)


# ---------------------------------------------------------------------------
# AWS VPC flow logs (parse_aws_vpc_flow_log.rs)
# ---------------------------------------------------------------------------

VPC_FLOW_DEFAULT_FORMAT = (
    "version account_id interface_id srcaddr dstaddr srcport dstport "
    "protocol packets bytes start end action log_status"
)

# reference inner_kind(): which fields are integers
_VPC_INT_FIELDS = {
    "version", "account_id", "srcport", "dstport", "protocol", "packets",
    "bytes", "start", "end", "tcp_flags",
}


def parse_aws_vpc_flow_log(
    df: DataFrame, line_col: str = "line", format: str | None = None
) -> DataFrame:
    """parse_aws_vpc_flow_log.rs: space-separated positional fields;
    `-` means null; int-typed fields per the reference's inner_kind.
    Custom `format` strings reorder/subset fields exactly like the
    reference's optional format argument."""
    fields = (format or VPC_FLOW_DEFAULT_FORMAT).split(" ")
    # project the token array to a named column first: Catalyst's
    # CollapseProject keeps a multiply-referenced non-cheap alias, so
    # the line splits ONCE per row instead of once per field (the
    # inline form leans on codegen subexpression elimination, which
    # doesn't always fire across 14+ references)
    out = df.withColumn("_toks", F.split(F.col(line_col), " "))
    toks = F.col("_toks")
    # ONE withColumns projection over the materialized token column
    # (a per-field withColumn chain re-runs the analyzer per field)
    cols: dict[str, Column] = {
        "_parse_error": F.size(toks) != F.lit(len(fields))
    }
    for i, name in enumerate(fields):
        raw = F.nullif(F.element_at(toks, i + 1), F.lit("-"))
        cols[name] = raw.cast("long") if name in _VPC_INT_FIELDS else raw
    return out.withColumns(cols).drop("_toks")


# ---------------------------------------------------------------------------
# AWS ALB access logs (parse_aws_alb_log.rs:133-250)
# ---------------------------------------------------------------------------

# (name, quoted?, int?) in the reference's field order (parse_log)
_ALB_FIELDS = [
    ("type", False, False), ("elb", False, False),
    ("client_host", False, False), ("target_host", False, False),
    ("request_processing_time", False, False),
    ("target_processing_time", False, False),
    ("response_processing_time", False, False),
    ("elb_status_code", False, False), ("target_status_code", False, False),
    ("received_bytes", False, True), ("sent_bytes", False, True),
    ("request", True, False), ("user_agent", True, False),
    ("ssl_cipher", False, False), ("ssl_protocol", False, False),
    ("target_group_arn", False, False), ("trace_id", True, False),
    ("domain_name", True, False), ("chosen_cert_arn", True, False),
    ("matched_rule_priority", False, False),
    ("request_creation_time", False, False),
    ("actions_executed", True, False), ("redirect_url", True, False),
    ("error_reason", True, False),
]


def _alb_pattern() -> str:
    parts = []
    for _, quoted, _ in _ALB_FIELDS:
        parts.append(r'"([^"]*)"' if quoted else r"(\S+)")
    return r"^\s*" + " ".join(parts) + r"(?: .*)?$"


ALB_PATTERN = _alb_pattern()


def parse_aws_alb_log(df: DataFrame, line_col: str = "line") -> DataFrame:
    """parse_aws_alb_log.rs field sequence as one anchored regex (the
    trailing optional group absorbs the newer target-list/
    classification columns, which ride behind `request_creation_time`
    era fields in the reference too)."""
    g = _groups(F.col(line_col), ALB_PATTERN, len(_ALB_FIELDS))
    # ONE withColumns projection: a 24-field chain of withColumn would
    # run the analyzer once per field over a growing plan (quadratic
    # driver-side work for wide formats)
    cols: dict[str, Column] = {}
    # the reference types the three processing times as float
    # (parse_aws_alb_log.rs:104-117 Kind::float; status codes stay
    # bytes) — '-1' sentinels come through as -1.0 like the reference
    _float = {
        "request_processing_time",
        "target_processing_time",
        "response_processing_time",
    }
    for i, (name, _, is_int) in enumerate(_ALB_FIELDS):
        raw = F.nullif(_gi(g, i + 1), F.lit("-"))
        if is_int:
            cols[name] = raw.cast("long")
        elif name in _float:
            cols[name] = raw.cast("double")
        else:
            cols[name] = raw
    cols["_parse_error"] = g.isNull()
    return df.withColumns(cols)


# ---------------------------------------------------------------------------
# AWS CloudWatch Logs subscription messages
# (parse_aws_cloudwatch_log_subscription_message.rs)
# ---------------------------------------------------------------------------

CLOUDWATCH_SUBSCRIPTION_SCHEMA = T.StructType([
    T.StructField("owner", T.StringType()),
    T.StructField("messageType", T.StringType()),
    T.StructField("logGroup", T.StringType()),
    T.StructField("logStream", T.StringType()),
    T.StructField("subscriptionFilters", T.ArrayType(T.StringType())),
    T.StructField("logEvents", T.ArrayType(T.StructType([
        T.StructField("id", T.StringType()),
        T.StructField("timestamp", T.LongType()),
        T.StructField("message", T.StringType()),
    ]))),
])


def parse_aws_cloudwatch_log_subscription_message(
    df: DataFrame, line_col: str = "line"
) -> DataFrame:
    """The subscription envelope is plain JSON with a fixed schema —
    from_json (timestamps arrive as epoch millis)."""
    return df.withColumn(
        "parsed", F.from_json(F.col(line_col), CLOUDWATCH_SUBSCRIPTION_SCHEMA)
    )


# ---------------------------------------------------------------------------
# parse_regex_all / parse_tokens (parse_regex_all.rs, parse_tokens.rs)
# ---------------------------------------------------------------------------


def parse_regex_all(col: Column, pattern: str, group: int = 1) -> Column:
    """parse_regex_all.rs: every match of the pattern, as an array.
    regexp_extract_all stays JVM-side (the reference collects
    captures-per-match objects; with one named group the array of
    that group is the same surface)."""
    return F.regexp_extract_all(col, F.lit(pattern), F.lit(group))


_TOKEN_PATTERN = r'\[(?:\\.|[^\]\\])*\]|"(?:\\.|[^"\\])*"|[^\s\["]+'


def parse_tokens(col: Column) -> Column:
    """parse_tokens.rs (lib/vector-common/src/tokenize.rs): split on
    whitespace, keeping "quoted" and [bracketed] groups as single
    tokens with their delimiters stripped; "" and "-" become null."""
    raw = F.regexp_extract_all(col, F.lit(f"({_TOKEN_PATTERN})"), F.lit(1))
    strip = F.transform(
        raw,
        lambda t: F.when(
            t.rlike(r'^\[.*\]$') | t.rlike(r'^".*"$'),
            F.substring(t, F.lit(2), F.length(t) - 2),
        ).otherwise(t),
    )
    return F.transform(
        strip,
        lambda t: F.when((t == "") | (t == "-"), F.lit(None)).otherwise(t),
    )


# ---------------------------------------------------------------------------
# parse_user_agent (parse_user_agent.rs — woothee/uap "fast" mode)
# ---------------------------------------------------------------------------


def parse_user_agent(col: Column) -> Column:
    """parse_user_agent.rs fast mode: browser family/version, os
    family/version, device category. The reference embeds the woothee
    ruleset; this is the high-traffic subset of those rules as CASE
    chains (JVM-side) — unknown agents yield nulls, like the
    reference's 'unknown' bucket."""
    browser = (
        F.when(col.rlike(r"Edg[e/]"), "Edge")
        .when(col.rlike(r"OPR/|Opera"), "Opera")
        .when(col.rlike(r"Chrome/"), "Chrome")
        .when(col.rlike(r"Firefox/"), "Firefox")
        .when(col.rlike(r"Safari/") & col.rlike(r"Version/"), "Safari")
        .when(col.rlike(r"MSIE |Trident/"), "Internet Explorer")
        .when(col.rlike(r"curl/"), "curl")
        .when(col.rlike(r"[Bb]ot|[Cc]rawler|[Ss]pider"), "Bot")
    )
    def _ver(pat: str) -> Column:
        return F.nullif(F.regexp_extract(col, pat, 1), F.lit(""))

    # version keyed off the DETECTED family: a leftmost-token extract
    # reports Chrome's version for Edge/Opera UAs (the 'Chrome/x'
    # token precedes 'Edg/x' and 'OPR/x' in real agents)
    browser_version = (
        F.when(browser == "Edge", _ver(r"Edge?/([\d.]+)"))
        .when(
            browser == "Opera",
            F.coalesce(_ver(r"OPR/([\d.]+)"), _ver(r"Opera[/ ]([\d.]+)")),
        )
        .when(browser == "Chrome", _ver(r"Chrome/([\d.]+)"))
        .when(browser == "Firefox", _ver(r"Firefox/([\d.]+)"))
        .when(browser == "Safari", _ver(r"Version/([\d.]+)"))
        .when(
            browser == "Internet Explorer",
            F.coalesce(_ver(r"MSIE ([\d.]+)"), _ver(r"rv:([\d.]+)")),
        )
        .when(browser == "curl", _ver(r"curl/([\d.]+)"))
    )
    os_family = (
        F.when(col.rlike(r"Windows NT"), "Windows")
        .when(col.rlike(r"Android"), "Android")
        .when(col.rlike(r"iPhone|iPad|iOS"), "iOS")
        .when(col.rlike(r"Mac OS X"), "Mac OS X")
        .when(col.rlike(r"Linux"), "Linux")
    )
    os_version = F.nullif(
        F.regexp_extract(
            col,
            r"(?:Windows NT |Android |OS |Mac OS X )([\d._]+)",
            1,
        ),
        F.lit(""),
    )
    device = (
        F.when(col.rlike(r"iPad|Tablet"), "tablet")
        .when(col.rlike(r"Mobile|iPhone|Android"), "smartphone")
        .when(col.rlike(r"[Bb]ot|[Cc]rawler|[Ss]pider|curl"), "crawler")
        .when(os_family.isNotNull(), "pc")
    )
    return F.struct(
        browser.alias("browser_family"),
        browser_version.alias("browser_version"),
        os_family.alias("os_family"),
        os_version.alias("os_version"),
        device.alias("device_category"),
    )


# ---------------------------------------------------------------------------
# parse_ruby_hash (parse_ruby_hash.rs)
# ---------------------------------------------------------------------------


def parse_ruby_hash(col: Column, schema) -> Column:
    """parse_ruby_hash.rs: { "key" => "value", ... } hash literals.
    Well-formed string-keyed hashes rewrite to JSON (`=>` -> `:`,
    nil -> null) and ride from_json; the reference's full grammar
    (symbol keys, unquoted idents) is out of scope and returns null
    via from_json's lax mode."""
    # rewrite `=>` / nil only OUTSIDE quoted strings: the quote-parity
    # lookahead (an even number of '"' remaining means the match sits
    # between strings) keeps a value like "x => y" intact. Escaped
    # quotes inside values are outside the supported subset (as
    # documented above). java.util.regex lookahead — regexp_replace
    # is JVM-side, not RE2.
    _outside = r'(?=(?:[^"]*"[^"]*")*[^"]*$)'
    json = F.regexp_replace(col, r"\s*=>\s*" + _outside, ":")
    json = F.regexp_replace(json, r":nil\s*([,}\]])" + _outside, r":null$1")
    return F.from_json(json, schema)


# ---------------------------------------------------------------------------
# parse_xml (parse_xml.rs) — the one Python crossing (Arrow batches)
# ---------------------------------------------------------------------------


_XML_UDFS: dict[tuple, object] = {}


def _xml_udf(include_attr: bool, text_key: str, always_use_text_key: bool):
    key = (include_attr, text_key, always_use_text_key)
    if key in _XML_UDFS:
        return _XML_UDFS[key]

    @pandas_udf(T.StringType())
    def xml_to_json(s: pd.Series) -> pd.Series:
        import json as _json
        import xml.etree.ElementTree as ET

        def node_to_obj(node):
            obj: dict = {}
            if include_attr:
                for k, v in node.attrib.items():
                    obj[f"@{k}"] = v
            children = list(node)
            if not children:
                text = (node.text or "").strip()
                if obj or always_use_text_key:
                    if text or always_use_text_key:
                        obj[text_key] = text
                    return obj
                return text
            for child in children:
                val = node_to_obj(child)
                if child.tag in obj:
                    prev = obj[child.tag]
                    obj[child.tag] = (
                        prev + [val] if isinstance(prev, list) else [prev, val]
                    )
                else:
                    obj[child.tag] = val
            return obj

        def conv(v):
            if v is None:
                return None
            try:
                root = ET.fromstring(v)
            except ET.ParseError:
                return None
            return _json.dumps({root.tag: node_to_obj(root)}, sort_keys=True)

        return s.map(conv)

    _XML_UDFS[key] = xml_to_json
    return xml_to_json


def parse_xml(
    col: Column,
    include_attr: bool = True,
    text_key: str = "text",
    always_use_text_key: bool = False,
) -> Column:
    """parse_xml.rs: XML -> object with @-prefixed attributes and
    `text` keys (the reference's attr_prefix/text_key defaults, plus
    the include_attr / text_key / always_use_text_key options).
    Returns a JSON string (heterogeneous trees don't fit a static
    StructType); chain from_json with a schema for typed access.
    Unparseable XML -> null (fallible call)."""
    return _xml_udf(include_attr, text_key, always_use_text_key)(col)
