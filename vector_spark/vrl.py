"""VRL stdlib surface — Vector's expression functions as Columns.

The reference ships ~130 scalar functions in lib/vrl/stdlib/src/ (one
file per function, SURVEY.md §2.4). Most are 1:1 Spark builtins; this
module makes the mapping EXPLICIT and testable: `FUNCTIONS[name]`
returns a callable producing a Column, so a remap program's function
calls translate mechanically. Functions that are pure renames wrap
the builtin; compositions are defined here; the handful that need
Python (percent-encoding, sha3) are Arrow-batch pandas UDFs, never
per-row.

Each entry cites its reference file (lib/vrl/stdlib/src/<name>.rs).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from vector_spark.functions import (
    parse_duration_ms,
    parse_key_value,
    redact,
    strip_ansi_escape_codes,
    to_syslog_severity,
)

# ---------------------------------------------------------------------------
# string (upcase.rs, downcase.rs, truncate.rs, ...)
# ---------------------------------------------------------------------------


def truncate(col: Column, limit: int, suffix: bool = False) -> Column:
    """truncate.rs: cut to limit chars, optional '...' marker."""
    cut = F.substring(col, 1, limit)
    if not suffix:
        return cut
    return F.when(F.length(col) > limit, F.concat(cut, F.lit("..."))).otherwise(col)


def slice_(
    col: Column, start: int, end: int | None = None, dtype: str = "string"
) -> Column:
    """slice.rs: python-style [start:end) on chars or array elements;
    negative indices count from the end."""
    n = F.size(col) if dtype == "array" else F.length(col)
    s = F.greatest(n + start, F.lit(0)) if start < 0 else F.least(F.lit(start), n)
    if end is None:
        e = n
    elif end < 0:
        e = F.greatest(n + end, F.lit(0))
    else:
        e = F.least(F.lit(end), n)
    length = F.greatest(e - s, F.lit(0))
    if dtype == "array":
        return F.slice(col, s + 1, length)
    return F.substring(col, s + 1, length)


def find(col: Column, pattern: str, regex: bool = False) -> Column:
    """find.rs: first 0-based index of the substring or regex match,
    -1 if absent (regexp_instr/locate are 1-based with 0 = no match)."""
    if regex:
        return F.regexp_instr(col, F.lit(pattern)) - 1
    return F.locate(pattern, col) - 1


def contains(col: Column, substring: str, case_sensitive: bool = True) -> Column:
    """contains.rs (with the case_sensitive option)."""
    if case_sensitive:
        return col.contains(substring)
    return F.lower(col).contains(substring.lower())


def starts_with(col: Column, prefix: str, case_sensitive: bool = True) -> Column:
    if case_sensitive:
        return col.startswith(prefix)
    return F.lower(col).startswith(prefix.lower())


def ends_with(col: Column, suffix: str, case_sensitive: bool = True) -> Column:
    if case_sensitive:
        return col.endswith(suffix)
    return F.lower(col).endswith(suffix.lower())


def match_(col: Column, pattern: str) -> Column:
    """match.rs: regex test."""
    return col.rlike(pattern)


def match_any(col: Column, patterns: list[str]) -> Column:
    out = col.rlike(patterns[0])
    for p in patterns[1:]:
        out = out | col.rlike(p)
    return out


def replace(col: Column, pattern: str, with_: str, count: int = -1) -> Column:
    """replace.rs (regex semantics) with the `count` option: replace
    at most `count` occurrences (-1 = all). Bounded counts split on
    the pattern with limit count+1 and rejoin with the replacement —
    pure JVM, no per-row Python."""
    if count < 0:
        return F.regexp_replace(col, pattern, with_)
    if count == 0:
        return col
    return F.array_join(F.split(col, pattern, count + 1), with_)


def split(col: Column, pattern: str, limit: int = -1) -> Column:
    return F.split(col, pattern, limit)


def join(col: Column, separator: str = "") -> Column:
    return F.array_join(col, separator)


def strlen(col: Column) -> Column:
    """strlen.rs: unicode char count (length() is char-based in Spark)."""
    return F.length(col)


def length_(col: Column, dtype: str = "string") -> Column:
    """length.rs: element count for arrays/objects, byte/char count
    for strings. Spark column types are static, so the caller passes
    the resolved kind (the VRL compiler knows it from type inference;
    our translator reads it off the DataFrame schema): array/map/
    object -> size(), else -> length()."""
    if dtype in ("array", "map", "object", "struct"):
        return F.size(col)
    return F.length(col)


# ---------------------------------------------------------------------------
# codecs / crypto (encode_base64.rs, md5.rs, ...)
# ---------------------------------------------------------------------------


def encode_base64(
    col: Column, padding: bool = True, charset: str = "standard"
) -> Column:
    """encode_base64.rs with padding/charset options (util.rs
    Base64Charset): url_safe swaps +/ for -_; padding=False strips
    the trailing `=`s."""
    out = F.base64(col.cast("binary"))
    if charset == "url_safe":
        out = F.translate(out, "+/", "-_")
    if not padding:
        out = F.regexp_replace(out, "=+$", "")
    return out


def decode_base64(col: Column, charset: str = "standard") -> Column:
    inp = F.translate(col, "-_", "+/") if charset == "url_safe" else col
    return F.unbase64(inp).cast("string")


def encode_json(col: Column) -> Column:
    """encode_json.rs: any value -> JSON string. Rendered through a
    one-element array (then the brackets stripped) so SCALARS work
    too — to_json itself only takes containers, and the array form
    gives exactly the right escaping/boolean/null rendering for
    every type."""
    j = F.to_json(F.array(col))
    return F.substring(j, F.lit(2), F.length(j) - 2)


def encode_logfmt(map_col: Column) -> Column:
    """encode_logfmt.rs: map -> 'k=v k=v' with keys sorted (the
    reference emits fields in BTreeMap order, i.e. sorted)."""
    entries = F.array_sort(F.map_entries(map_col))
    return F.array_join(
        F.transform(entries, lambda e: F.concat(e["key"], F.lit("="), e["value"])),
        " ",
    )


@pandas_udf(T.StringType())
def _percent_encode(s: pd.Series) -> pd.Series:
    from urllib.parse import quote

    return s.map(lambda v: quote(v, safe="") if v is not None else None)


@pandas_udf(T.StringType())
def _percent_decode(s: pd.Series) -> pd.Series:
    from urllib.parse import unquote

    return s.map(lambda v: unquote(v) if v is not None else None)


def encode_percent(col: Column) -> Column:
    """encode_percent.rs — vectorized Arrow batch (no SQL builtin)."""
    return _percent_encode(col)


def decode_percent(col: Column) -> Column:
    return _percent_decode(col)


def md5_(col: Column) -> Column:
    return F.md5(col.cast("binary"))


def sha1_(col: Column) -> Column:
    return F.sha1(col.cast("binary"))


_HASH_UDFS: dict[str, object] = {}


def _hashlib_udf(algo: str):
    """Arrow-batch UDF over hashlib, cached per algorithm."""
    if algo not in _HASH_UDFS:

        @pandas_udf(T.StringType())
        def h(s: pd.Series) -> pd.Series:
            import hashlib

            return s.map(
                lambda v: hashlib.new(algo, v.encode()).hexdigest()
                if v is not None
                else None
            )

        _HASH_UDFS[algo] = h
    return _HASH_UDFS[algo]


def sha2_(col: Column, variant: str = "SHA-512/256") -> Column:
    """sha2.rs: variant enum, default SHA-512/256. The four plain
    widths are JVM builtins (F.sha2); the truncated SHA-512/224 and
    SHA-512/256 variants ride hashlib via Arrow batches."""
    plain = {"SHA-224": 224, "SHA-256": 256, "SHA-384": 384, "SHA-512": 512}
    if variant in plain:
        return F.sha2(col.cast("binary"), plain[variant])
    algo = {"SHA-512/224": "sha512_224", "SHA-512/256": "sha512_256"}[variant]
    return _hashlib_udf(algo)(col)


def sha3_(col: Column, variant: str = "SHA3-512") -> Column:
    """sha3.rs: variant enum, default SHA3-512 — no JVM builtin;
    Arrow-batch UDF."""
    algo = {
        "SHA3-224": "sha3_224", "SHA3-256": "sha3_256",
        "SHA3-384": "sha3_384", "SHA3-512": "sha3_512",
    }[variant]
    return _hashlib_udf(algo)(col)


def uuid_v4() -> Column:
    return F.uuid()


# ---------------------------------------------------------------------------
# type coercion (to_int.rs, to_bool.rs, ...)
# ---------------------------------------------------------------------------


def to_int(col: Column) -> Column:
    """to_int.rs: failed conversions are VRL errors (callers recover
    via `??`) -> try_cast nulls, never ANSI throws."""
    return col.try_cast("long")


def to_float(col: Column) -> Column:
    return col.try_cast("double")


def to_string(col: Column) -> Column:
    return col.cast("string")


def to_bool(col: Column) -> Column:
    """to_bool.rs: accepts true/t/yes/y/1 and false/f/no/n/0; numeric
    values are truthy iff non-zero (the reference's int/float arm)."""
    low = F.lower(col.cast("string"))
    num = col.cast("string").try_cast("double")
    return (
        F.when(low.isin("true", "t", "yes", "y"), F.lit(True))
        .when(low.isin("false", "f", "no", "n"), F.lit(False))
        .when(num.isNotNull(), num != 0)
        .otherwise(F.lit(None).cast("boolean"))
    )


def parse_int(col: Column, base: int | None = None) -> Column:
    """parse_int.rs: explicit radix via conv() (base 2..36); with no
    base, auto-detect from the prefix like the reference — `0b` -> 2,
    `0o` -> 8, `0x` -> 16, leading `0` -> 8, else 10."""
    if base is not None:
        if base == 10:
            # try_cast: malformed input fails to null (the fallible
            # contract) instead of aborting under default ANSI mode
            return col.try_cast("long")
        return F.conv(col, base, 10).try_cast("long")
    body = F.substring(col, 3, 1 << 30)
    return (
        F.when(col.startswith("0b"), F.conv(body, 2, 10))
        .when(col.startswith("0o"), F.conv(body, 8, 10))
        .when(col.startswith("0x"), F.conv(body, 16, 10))
        .when(col.startswith("0") & (F.length(col) > 1), F.conv(col, 8, 10))
        .otherwise(col)
        .try_cast("long")
    )


_DURATION_UNIT_MS = {
    "ns": 1e-6, "us": 1e-3, "µs": 1e-3, "ms": 1.0, "cs": 10.0, "ds": 100.0,
    "s": 1e3, "m": 6e4, "h": 3.6e6, "d": 8.64e7,
}


def parse_duration(col: Column, unit: str) -> Column:
    """parse_duration.rs: '300ms' + output unit -> float in that unit."""
    return parse_duration_ms(col) / F.lit(_DURATION_UNIT_MS[unit])


def to_unix_timestamp(col: Column) -> Column:
    return F.unix_timestamp(col)


def from_unix_timestamp(col: Column) -> Column:
    return F.timestamp_seconds(col)


# strftime -> JVM DateTimeFormatter pattern map (parse_timestamp.rs /
# format_timestamp.rs use chrono strftime; Spark wants Java patterns).
# Longest-first so %:z wins over %z.
_STRFTIME_TO_JAVA = [
    ("%+", "yyyy-MM-dd'T'HH:mm:ssxxx"),
    ("%:z", "xxx"),
    ("%Y", "yyyy"), ("%m", "MM"), ("%d", "dd"), ("%e", "d"),
    ("%H", "HH"), ("%M", "mm"), ("%S", "ss"),
    ("%b", "MMM"), ("%B", "MMMM"), ("%a", "EEE"), ("%A", "EEEE"),
    ("%j", "DDD"), ("%z", "xx"), ("%3f", "SSS"), ("%f", "SSSSSS"),
    ("%T", "HH:mm:ss"), ("%F", "yyyy-MM-dd"), ("%%", "%"),
]


def strftime_to_java(fmt: str) -> str:
    if "%" not in fmt:
        return fmt
    out, i = [], 0
    while i < len(fmt):
        for k, v in _STRFTIME_TO_JAVA:
            if fmt.startswith(k, i):
                out.append(v)
                i += len(k)
                break
        else:
            c = fmt[i]
            # quote literal letters so they aren't pattern chars
            out.append(f"'{c}'" if c.isalpha() else c)
            i += 1
    return "".join(out)


def to_timestamp(col: Column, fmt: str | None = None) -> Column:
    if fmt:
        return F.to_timestamp(col, strftime_to_java(fmt))
    return F.to_timestamp(col)


def format_timestamp(col: Column, fmt: str) -> Column:
    """format_timestamp.rs (chrono strftime specifiers translated to
    JVM patterns; ISO8601 via %+)."""
    return F.date_format(col, strftime_to_java(fmt))


def format_int(col: Column, base: int = 10) -> Column:
    """format_int.rs: conv() is two's-complement for negatives, so
    sign is peeled off first (the reference formats the magnitude)."""
    if base == 10:
        return col.cast("string")
    mag = F.lower(F.conv(F.abs(col), 10, base))
    return F.when(col < 0, F.concat(F.lit("-"), mag)).otherwise(mag)


def format_number(
    col: Column,
    scale: int | None = None,
    grouping_separator: str | None = None,
    decimal_separator: str = ".",
) -> Column:
    """format_number.rs: no grouping unless a grouping_separator is
    given (unlike Spark's format_number which always inserts commas);
    scale TRUNCATES the fraction (the reference truncates, not
    rounds); whole floats print without a trailing .0 (Rust Display)."""
    if scale is not None:
        factor = 10 ** scale
        truncated = (col.cast("double") * factor).cast("bigint") / factor
        grouped = F.format_number(truncated, scale)
    else:
        grouped = F.regexp_replace(col.cast("string"), r"\.0$", "")
    # swap through a sentinel: substituting the grouping separator
    # first would let a '.' grouping separator be clobbered by the
    # subsequent '.' -> decimal_separator replacement
    # ('1.234.5' -> '1,234,5' instead of '1.234,5')
    sep = grouping_separator if grouping_separator is not None else ""
    out = F.replace(grouped, F.lit(","), F.lit("\x00"))
    if decimal_separator != ".":
        out = F.replace(out, F.lit("."), F.lit(decimal_separator))
    return F.replace(out, F.lit("\x00"), F.lit(sep))


# ---------------------------------------------------------------------------
# collections (flatten.rs, unique.rs, compact.rs, ...)
# ---------------------------------------------------------------------------


def append(arr: Column, items: Column) -> Column:
    return F.concat(arr, items)


def push(arr: Column, item) -> Column:
    return F.array_append(arr, item)


def flatten(arr: Column) -> Column:
    return F.flatten(arr)


def unique(arr: Column) -> Column:
    return F.array_distinct(arr)


def compact(arr: Column) -> Column:
    """compact.rs: drop nulls (and empty strings, like VRL's 'empty
    values') from an array."""
    return F.filter(arr, lambda v: v.isNotNull() & (v.cast("string") != ""))


def includes(arr: Column, item) -> Column:
    return F.array_contains(arr, item)


def tally(arr: Column) -> Column:
    """tally.rs: array -> map(value -> count)."""
    return F.aggregate(
        arr,
        F.create_map().cast("map<string,int>"),
        lambda acc, v: F.map_concat(
            F.map_filter(acc, lambda k, _: k != v.cast("string")),
            F.create_map(
                v.cast("string"),
                F.coalesce(F.element_at(acc, v.cast("string")), F.lit(0)) + 1,
            ),
        ),
    )


def tally_value(arr: Column, value) -> Column:
    """tally_value.rs: occurrences of one value."""
    return F.size(F.filter(arr, lambda v: v == value))


def merge(m1: Column, m2: Column) -> Column:
    """merge.rs on maps: right-biased (map_concat keeps last dup in
    Spark when spark.sql.mapKeyDedupPolicy=LAST_WIN; we filter
    explicitly for determinism)."""
    keys2 = F.map_keys(m2)
    return F.map_concat(
        F.map_filter(m1, lambda k, _: ~F.array_contains(keys2, k)), m2
    )


def map_keys(m: Column) -> Column:
    return F.map_keys(m)


def map_values(m: Column) -> Column:
    return F.map_values(m)


# ---------------------------------------------------------------------------
# net / misc (ip_aton.rs, parse_url.rs, ...)
# ---------------------------------------------------------------------------


def ip_aton(col: Column) -> Column:
    """ip_aton.rs: dotted quad -> uint32."""
    p = F.split(col, r"\.")
    return (
        p[0].cast("long") * 16777216 + p[1].cast("long") * 65536
        + p[2].cast("long") * 256 + p[3].cast("long")
    )


def ip_ntoa(col: Column) -> Column:
    return F.concat_ws(
        ".",
        (col / 16777216).cast("long") % 256,
        (col / 65536).cast("long") % 256,
        (col / 256).cast("long") % 256,
        col.cast("long") % 256,
    )


def ip_cidr_contains(cidr: str, col: Column) -> Column:
    net, bits = cidr.split("/")
    mask = (0xFFFFFFFF << (32 - int(bits))) & 0xFFFFFFFF
    net_int = sum(int(o) << (8 * (3 - i)) for i, o in enumerate(net.split(".")))
    return ip_aton(col).bitwiseAND(F.lit(mask)) == F.lit(net_int & mask)


def parse_url(col: Column, part: str) -> Column:
    """parse_url.rs -> Spark's parse_url (HOST/PATH/QUERY/PROTOCOL/...)."""
    return F.parse_url(col, F.lit(part))


def parse_query_string(col: Column) -> Column:
    """parse_query_string.rs: 'a=1&b=2' -> map; '' -> {} (str_to_map
    would yield a single empty key)."""
    empty = F.create_map().cast("map<string,string>")
    return F.when(
        col.isNull() | (col == ""), empty
    ).otherwise(F.str_to_map(col, F.lit("&"), F.lit("=")))


def floor_(col: Column, precision: int | None = None) -> Column:
    if precision is None:
        return F.floor(col)
    return F.floor(col, F.lit(precision))


def ceil_(col: Column, precision: int | None = None) -> Column:
    if precision is None:
        return F.ceil(col)
    return F.ceil(col, F.lit(precision))


def round_(col: Column, precision: int = 0) -> Column:
    return F.round(col, precision)


def log_(col: Column, base: float | None = None) -> Column:
    return F.log(base, col) if base else F.log(col)


# ---------------------------------------------------------------------------
# type introspection (is_*.rs, type_def family) + syslog maps
# ---------------------------------------------------------------------------


def to_syslog_level(severity: Column) -> Column:
    """to_syslog_level.rs: severity int -> keyword."""
    m = ["emerg", "alert", "crit", "err", "warning", "notice", "info", "debug"]
    expr = F.when(severity == 0, m[0])
    for i, name in enumerate(m[1:], 1):
        expr = expr.when(severity == i, name)
    return expr.otherwise(F.lit(None).cast("string"))


_SYSLOG_FACILITIES = [
    "kern", "user", "mail", "daemon", "auth", "syslog", "lpr", "news",
    "uucp", "cron", "authpriv", "ftp", "ntp", "security", "console",
    "solaris-cron", "local0", "local1", "local2", "local3", "local4",
    "local5", "local6", "local7",
]


def to_syslog_facility(code: Column) -> Column:
    """to_syslog_facility.rs: facility code -> keyword."""
    expr = F.when(code == 0, _SYSLOG_FACILITIES[0])
    for i, name in enumerate(_SYSLOG_FACILITIES[1:], 1):
        expr = expr.when(code == i, name)
    return expr.otherwise(F.lit(None).cast("string"))


def is_nullish(col: Column) -> Column:
    """is_nullish.rs (util.rs:70-82): null, `-`, or all-whitespace."""
    return col.isNull() | (col.cast("string") == "-") | col.cast("string").rlike(r"^\s*$")


def is_empty(col: Column, dtype: str = "string") -> Column:
    """is_empty.rs: '' / [] / {} — static Spark types mean the caller
    resolves the kind (same convention as length_)."""
    if dtype in ("array", "map", "object", "struct"):
        return F.size(col) == 0
    return F.length(col) == 0


def is_json(col: Column, variant: str | None = None) -> Column:
    """is_json.rs: valid-JSON test via try_parse_json (VariantType) —
    accepts any JSON value incl. scalars, null on bad input. The
    optional `variant` narrows to one JSON type (the reference's
    exact-variant mode), dispatched on the first significant char."""
    valid = F.when(col.isNull(), F.lit(False)).otherwise(
        F.try_parse_json(col).isNotNull()
    )
    if variant is None:
        return valid
    t = F.trim(col)
    head = F.substring(t, 1, 1)
    checks = {
        "object": head == "{",
        "array": head == "[",
        "string": head == '"',
        "null": t == "null",
        "bool": t.isin("true", "false"),
        "number": head.rlike(r"[0-9+\-]"),
    }
    return valid & checks[variant]


def _typeof_is(*prefixes: str):
    def check(col: Column) -> Column:
        t = F.typeof(col)
        expr = t.startswith(prefixes[0])
        for p in prefixes[1:]:
            expr = expr | t.startswith(p)
        return expr & col.isNotNull()

    return check


is_array = _typeof_is("array")
is_object = _typeof_is("map", "struct")
is_boolean = _typeof_is("boolean")
is_float = _typeof_is("float", "double", "decimal")
is_integer = _typeof_is("tinyint", "smallint", "int", "bigint")
is_string = _typeof_is("string")
is_timestamp = _typeof_is("timestamp")


def is_null(col: Column) -> Column:
    return col.isNull()


def ip_subnet(col: Column, mask: str) -> Column:
    """ip_subnet.rs: apply a '/n' prefix or mask address, both IP
    families. Dotted-quad masks stay on the pure-JVM int path
    (codegen'd); '/n' and IPv6 masks need per-family runtime dispatch
    -> Arrow-batched ipaddress UDF (cold-path function)."""
    if "." in mask and not mask.startswith("/"):
        parts = [int(o) for o in mask.split(".")]
        mask_int = sum(o << (8 * (3 - i)) for i, o in enumerate(parts))
        return ip_ntoa(ip_aton(col).bitwiseAND(F.lit(mask_int)))

    @pandas_udf(T.StringType())
    def run(s: pd.Series) -> pd.Series:
        import ipaddress

        def one(v):
            if v is None:
                return None
            try:
                a = ipaddress.ip_address(v)
                if mask.startswith("/"):
                    net = ipaddress.ip_network(
                        f"{a}/{int(mask[1:])}", strict=False
                    )
                    return str(net.network_address)
                m = ipaddress.ip_address(mask)
                if m.version != a.version:
                    return None
                packed = bytes(
                    x & y for x, y in zip(a.packed, m.packed)
                )
                return str(ipaddress.ip_address(packed))
            except ValueError:
                return None

        return s.map(one)

    return run(col)


def get_env_var(name: str) -> Column:
    """get_env_var.rs: resolved on the driver, constant-folded."""
    import os

    return F.lit(os.environ.get(name))


def parse_csv_row(
    col: Column, n_fields: int, delimiter: str = ","
) -> Column:
    """parse_csv.rs: one CSV record -> array of strings. from_csv
    needs a static arity (Spark schemas are fixed); quoted fields,
    RFC4180 `""` escapes, and custom delimiters follow the
    reference's csv crate. Only the first line parses (the reference
    reads exactly one record)."""
    schema = ", ".join(f"_c{i} string" for i in range(n_fields))
    first_line = F.split(col, "\n")[0]
    parsed = F.from_csv(
        first_line, F.lit(schema), {"escape": '"', "sep": delimiter}
    )
    return F.array(*[
        F.coalesce(parsed[f"_c{i}"], F.lit("")) for i in range(n_fields)
    ])


# ---------------------------------------------------------------------------
# type coercion assertions (array.rs, boolean.rs, float.rs, integer.rs,
# object.rs, string.rs, timestamp.rs): VRL's `string!(x)` family aborts
# the program if the value has the wrong type. Runtime check via
# typeof() + assert_true; Spark's static schema usually makes the
# check free (constant-folded) — it only fires on variant columns.
# ---------------------------------------------------------------------------


def _coerce_assert(checker, label: str):
    def coerce(col: Column) -> Column:
        ok = checker(col) | col.isNull()
        return F.when(
            F.assert_true(ok, f"expected {label} value").isNull(), col
        )

    return coerce


array_ = _coerce_assert(is_array, "array")
boolean_ = _coerce_assert(is_boolean, "boolean")
float__ = _coerce_assert(is_float, "float")
integer_ = _coerce_assert(is_integer, "integer")
object_ = _coerce_assert(is_object, "object")
string_ = _coerce_assert(is_string, "string")
timestamp_ = _coerce_assert(is_timestamp, "timestamp")


def assert_(cond: Column, message: str = "assertion failed") -> Column:
    """assert.rs: abort on false condition; returns true on success
    (the reference's assert resolves to `true`, assert.rs:61)."""
    return F.when(F.assert_true(cond, message).isNull(), F.lit(True))


def assert_eq(left: Column, right: Column, message: str | None = None) -> Column:
    """assert_eq.rs: abort unless left == right (null-safe)."""
    return F.assert_true(
        left.eqNullSafe(right), message or "assert_eq failed"
    )


# ---------------------------------------------------------------------------
# object / path ops over map<string,_> columns (del.rs, exists.rs,
# get.rs, set.rs, remove.rs, only_fields — VRL event paths become map
# keys in column-land; struct paths are native `F.col("a.b")`)
# ---------------------------------------------------------------------------


def del_(m: Column, key: str) -> Column:
    """del.rs / remove.rs: drop a key from an object."""
    return F.map_filter(m, lambda k, v: k != F.lit(key))


def exists(m: Column, key: str) -> Column:
    """exists.rs: key presence on an object column."""
    return F.array_contains(F.map_keys(m), key)


def get_(m: Column, key: str) -> Column:
    """get.rs: dynamic-path lookup -> value or null."""
    return F.try_element_at(m, F.lit(key))


def set_(m: Column, key: str, value) -> Column:
    """set.rs: insert/overwrite a key. Existing key is filtered first
    because map_concat under the default EXCEPTION dedup policy
    rejects duplicates."""
    v = value if isinstance(value, Column) else F.lit(value)
    cleaned = F.map_filter(m, lambda k, _: k != F.lit(key))
    return F.map_concat(cleaned, F.create_map(F.lit(key), v))


def only_fields(m: Column, keys: list[str]) -> Column:
    """only_fields.rs: keep listed keys, drop the rest."""
    keep = F.array(*[F.lit(k) for k in keys])
    return F.map_filter(m, lambda k, _: F.array_contains(keep, k))


def unnest(df, col: str):
    """unnest.rs: one event per element of an array field — the one
    cardinality-changing stdlib fn, so it takes/returns a DataFrame
    (explode stays JVM-side)."""
    return df.withColumn(col, F.explode(col))


def filter_(col: Column, fn) -> Column:
    """filter.rs: keep elements/entries where fn is true (arrays via
    F.filter(el), objects via map_filter(k, v))."""
    return F.filter(col, fn)


def filter_object(m: Column, fn) -> Column:
    return F.map_filter(m, fn)


def for_each(col: Column, fn) -> Column:
    """for_each.rs side-effect loop — in a pure column algebra this is
    transform (map) over elements."""
    return F.transform(col, fn)


def _ekv_quote(col: Column) -> Column:
    """encode_key_value.rs encode_string: quote when the token holds
    whitespace or '\"'; escape backslash, quote, newline."""
    esc = F.regexp_replace(col, r"\\", r"\\\\")
    esc = F.regexp_replace(esc, r'"', r'\\"')
    esc = F.regexp_replace(esc, r"\n", r"\\\\n")
    return F.when(
        col.rlike('[\\s"]'), F.concat(F.lit('"'), esc, F.lit('"'))
    ).otherwise(esc)


def encode_key_value(
    m: Column,
    fields_ordering: list[str] | None = None,
    key_value_delimiter: str = "=",
    field_delimiter: str = " ",
    flatten_boolean: bool = False,
) -> Column:
    """encode_key_value.rs (via lib/vector-common/src/encode_key_value.rs):
    object -> 'k=v k2=v2'. Listed fields first in the given order, the
    rest in sorted (BTreeMap) order; tokens with whitespace/quotes are
    quoted with backslash escapes; flatten_boolean renders bare keys
    for true and omits false. Map values arrive stringified ('true'/
    'false' for booleans), matching Value::to_string."""

    def render(k: Column, v: Column) -> Column:
        pair = F.concat(
            _ekv_quote(k), F.lit(key_value_delimiter), _ekv_quote(v)
        )
        if not flatten_boolean:
            return pair
        return (
            F.when(v == "false", F.lit(None))
            .when(v == "true", _ekv_quote(k))
            .otherwise(pair)
        )

    ordered = list(fields_ordering or [])
    lead = [
        F.when(
            F.array_contains(F.map_keys(m), k),
            render(F.lit(k), F.element_at(m, k).cast("string")),
        )
        for k in ordered
    ]
    rest_src = m
    if ordered:
        skip = F.array(*[F.lit(k) for k in ordered])
        rest_src = F.map_filter(m, lambda k, _: ~F.array_contains(skip, k))
    rest = F.transform(
        F.array_sort(F.map_entries(rest_src)),
        lambda e: render(e["key"], e["value"].cast("string")),
    )
    all_parts = F.concat(F.array(*lead), rest) if lead else rest
    return F.array_join(
        F.filter(all_parts, lambda x: x.isNotNull()), field_delimiter
    )


# ---------------------------------------------------------------------------
# crypto (encrypt.rs / decrypt.rs / random_bytes.rs): Spark's JVM-side
# aes_encrypt/aes_decrypt cover the AES family; mode names map from
# VRL's "AES-256-CBC" style. Unsupported modes (CFB/CTR/SALSA) raise.
# ---------------------------------------------------------------------------

_AES_MODES = {"CBC": "CBC", "GCM": "GCM", "ECB": "ECB"}


def _aes_mode(algorithm: str) -> str:
    parts = algorithm.upper().split("-")  # AES-256-CBC
    if len(parts) != 3 or parts[0] != "AES" or parts[2] not in _AES_MODES:
        raise ValueError(
            f"unsupported algorithm {algorithm!r}: Spark-side AES "
            "supports CBC/GCM/ECB (encrypt.rs lists more stream "
            "ciphers; out of JVM scope)"
        )
    return _AES_MODES[parts[2]]


def encrypt(plaintext: Column, algorithm: str, key: Column, iv: Column | None = None) -> Column:
    """encrypt.rs via F.aes_encrypt (binary out)."""
    mode = _aes_mode(algorithm)
    if iv is not None and mode != "ECB":
        return F.aes_encrypt(plaintext, key, F.lit(mode), F.lit("DEFAULT"), iv)
    return F.aes_encrypt(plaintext, key, F.lit(mode))


def decrypt(ciphertext: Column, algorithm: str, key: Column) -> Column:
    """decrypt.rs via F.aes_decrypt."""
    return F.aes_decrypt(ciphertext, key, F.lit(_aes_mode(algorithm)))


def random_bytes(length: int) -> Column:
    """random_bytes.rs: n random bytes. Built from chained sha2(rand())
    hex so it stays a JVM expression; cryptographic randomness is NOT
    claimed (the reference uses the OS RNG) — documented divergence,
    fine for sampling/jitter use."""
    if length > 1024:
        raise ValueError("random_bytes capped at 1024 in this build")
    n_blocks = (length + 31) // 32
    blocks = [
        F.sha2(F.concat(F.rand().cast("string"), F.lit(str(i))), 256)
        for i in range(n_blocks)
    ]
    return F.unhex(F.substring(F.concat(*blocks), 1, length * 2))


# ---------------------------------------------------------------------------
# IP conversions (ip_ntop.rs, ip_pton.rs, ip_to_ipv6.rs,
# ipv6_to_ipv4.rs): Python's ipaddress over Arrow batches — cold-path
# functions, and the per-batch loop beats a per-row UDF by the usual
# Arrow margin.
# ---------------------------------------------------------------------------


def _ip_batch_udf(fn):
    @pandas_udf(T.StringType())
    def run(s: pd.Series) -> pd.Series:
        import ipaddress

        def one(v):
            if v is None:
                return None
            try:
                return fn(ipaddress, v)
            except (ValueError, OSError):
                return None

        return s.map(one)

    return run


ip_ntop = _ip_batch_udf(
    lambda ipa, v: str(ipa.ip_address(v if isinstance(v, bytes) else v.encode("latin1")))
)
ip_pton_hex = _ip_batch_udf(
    lambda ipa, v: ipa.ip_address(v).packed.hex()
)


def ip_pton(col: Column) -> Column:
    """ip_pton.rs: text IP -> packed binary (via hex to keep the UDF
    Arrow-string-typed end to end)."""
    return F.unhex(ip_pton_hex(col))


def ip_to_ipv6(col: Column) -> Column:
    """ip_to_ipv6.rs: v4 -> ::ffff:a.b.c.d mapped form, v6 unchanged."""
    return F.when(
        col.contains(":"), col
    ).otherwise(F.concat(F.lit("::ffff:"), col))


ipv6_to_ipv4 = _ip_batch_udf(
    lambda ipa, v: str(a.ipv4_mapped)
    if (a := ipa.ip_address(v)).version == 6 and a.ipv4_mapped
    else (str(a) if a.version == 4 else None)
)


def match_array(arr: Column, pattern: str, all: bool = False) -> Column:
    """match_array.rs: any (or all) element matches the regex."""
    pred = lambda x: x.rlike(pattern)  # noqa: E731
    return F.forall(arr, pred) if all else F.exists(arr, pred)


def to_regex(col: Column) -> Column:
    """to_regex.rs: regex values are represented as their pattern
    string in column-land (Spark has no regex runtime type); the
    string feeds rlike/regexp_* directly."""
    return col


def is_regex(col: Column) -> Column:
    """is_regex.rs: no regex runtime type in column-land — always
    false for data columns (regexes live in the plan, not in rows)."""
    return F.lit(False) & col.isNotNull()


def tag_types_externally(col: Column, dtype: str) -> Column:
    """tag_types_externally.rs: wrap a scalar as {"<type>": value} for
    the externally-tagged JSON codec."""
    name = {
        "string": "string", "int": "integer", "bigint": "integer",
        "double": "float", "float": "float", "boolean": "boolean",
        "timestamp": "timestamp",
    }.get(dtype)
    if name is None:
        raise ValueError(f"unsupported external tag type {dtype!r}")
    return F.struct(col.alias(name))


def reverse_dns(col: Column, hosts: "object" = None) -> Column:
    """reverse_dns.rs needs live PTR lookups — no network in this
    build. Callers supply a (ip -> hostname) mapping and join it
    broadcast-side (vector_spark.enrich); this helper only covers the
    map-literal form for tests."""
    if hosts is None:
        raise NotImplementedError(
            "reverse_dns requires a hosts mapping in this build "
            "(no resolver); use enrich.enrich_equality with a dns dim"
        )
    mapping = F.create_map(
        *[F.lit(x) for kv in hosts.items() for x in kv]
    )
    return F.try_element_at(mapping, col)


# ---------------------------------------------------------------------------
# registry: VRL function name -> implementation
# ---------------------------------------------------------------------------

FUNCTIONS: dict[str, object] = {
    # string
    "upcase": F.upper, "downcase": F.lower, "truncate": truncate,
    "slice": slice_, "find": find, "contains": contains,
    "starts_with": starts_with, "ends_with": ends_with,
    "match": match_, "match_any": match_any, "replace": replace,
    "split": split, "join": join, "strlen": strlen, "length": length_,
    "strip_whitespace": F.trim, "strip_ansi_escape_codes": strip_ansi_escape_codes,
    "redact": redact, "reverse": F.reverse,
    # codecs / crypto
    "encode_base64": encode_base64, "decode_base64": decode_base64,
    "encode_json": encode_json, "encode_logfmt": encode_logfmt,
    "encode_percent": encode_percent, "decode_percent": decode_percent,
    "md5": md5_, "sha1": sha1_, "sha2": sha2_, "sha3": sha3_,
    "uuid_v4": uuid_v4,
    # coercion
    "to_int": to_int, "to_float": to_float, "to_string": to_string,
    "to_bool": to_bool, "parse_int": parse_int,
    "to_unix_timestamp": to_unix_timestamp,
    "from_unix_timestamp": from_unix_timestamp,
    "to_timestamp": to_timestamp, "format_timestamp": format_timestamp,
    "format_int": format_int, "format_number": format_number,
    "to_syslog_severity": to_syslog_severity,
    # parsing
    "parse_key_value": parse_key_value, "parse_logfmt": parse_key_value,
    "parse_duration": parse_duration, "parse_duration_ms": parse_duration_ms,
    "parse_url": parse_url,
    "parse_query_string": parse_query_string,
    "parse_json": F.from_json, "parse_csv": F.from_csv,
    "parse_timestamp": to_timestamp,
    # collections
    "append": append, "push": push, "flatten": flatten, "unique": unique,
    "compact": compact, "includes": includes, "tally": tally,
    "tally_value": tally_value, "merge": merge,
    "map_keys": map_keys, "map_values": map_values,
    # net / math / misc
    "ip_aton": ip_aton, "ip_ntoa": ip_ntoa,
    "ip_cidr_contains": ip_cidr_contains,
    "floor": floor_, "ceil": ceil_, "round": round_, "log": log_,
    "abs": F.abs, "now": F.current_timestamp,
    "get_hostname": lambda: F.lit("localhost"),
    # syslog maps / env
    "to_syslog_level": to_syslog_level,
    "to_syslog_facility": to_syslog_facility,
    "get_env_var": get_env_var,
    # type introspection
    "is_nullish": is_nullish, "is_empty": is_empty, "is_json": is_json,
    "is_array": is_array, "is_object": is_object, "is_boolean": is_boolean,
    "is_float": is_float, "is_integer": is_integer, "is_string": is_string,
    "is_timestamp": is_timestamp, "is_null": is_null,
    # net / csv
    "ip_subnet": ip_subnet, "parse_csv_row": parse_csv_row,
    # type coercion assertions (round 2)
    "array": array_, "boolean": boolean_, "float": float__,
    "integer": integer_, "object": object_, "string": string_,
    "timestamp": timestamp_,
    "assert": assert_, "assert_eq": assert_eq,
    # object / path ops
    "del": del_, "remove": del_, "exists": exists, "get": get_,
    "set": set_, "only_fields": only_fields, "unnest": unnest,
    "filter": filter_, "filter_object": filter_object,
    "for_each": for_each, "encode_key_value": encode_key_value,
    # crypto / random
    "encrypt": encrypt, "decrypt": decrypt, "random_bytes": random_bytes,
    # net conversions
    "ip_ntop": ip_ntop, "ip_pton": ip_pton, "ip_to_ipv6": ip_to_ipv6,
    "ipv6_to_ipv4": ipv6_to_ipv4, "reverse_dns": reverse_dns,
    # regex values / tagging
    "match_array": match_array, "to_regex": to_regex,
    "is_regex": is_regex, "tag_types_externally": tag_types_externally,
}


def _register_parser_family() -> None:
    """Cross-register the parse_* family implemented in functions.py /
    parsers.py / sources.py so FUNCTIONS is the one audit surface for
    SURVEY §2.4 (each target cites its lib/vrl/stdlib file in its own
    docstring). These operate on DataFrames (they add many columns),
    unlike the Column builders above — the registry records the
    callable either way."""
    from vector_spark import parsers as P
    from vector_spark import sources as S
    from vector_spark.functions import (
        make_regex_parser,
        parse_grok,
        parse_groks,
    )

    FUNCTIONS.update({
        "parse_regex": make_regex_parser,
        "parse_grok": parse_grok,
        "parse_groks": parse_groks,
        "parse_regex_all": P.parse_regex_all,
        "parse_common_log": S.parse_common_log,
        "parse_syslog": S.parse_syslog,
        "parse_apache_log": P.parse_apache_error,
        "parse_syslog_3164": P.parse_syslog_3164,
        "parse_nginx_log": P.parse_nginx_log,
        "parse_glog": P.parse_glog,
        "parse_klog": P.parse_klog,
        "parse_linux_authorization": P.parse_linux_authorization,
        "parse_aws_vpc_flow_log": P.parse_aws_vpc_flow_log,
        "parse_aws_alb_log": P.parse_aws_alb_log,
        "parse_aws_cloudwatch_log_subscription_message": P.parse_aws_cloudwatch_log_subscription_message,
        "parse_tokens": P.parse_tokens,
        "parse_user_agent": P.parse_user_agent,
        "parse_ruby_hash": P.parse_ruby_hash,
        "parse_xml": P.parse_xml,
    })


_register_parser_family()
