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


def slice_(col: Column, start: int, end: int | None = None) -> Column:
    """slice.rs: python-style [start:end) on chars (non-negative)."""
    length = (end - start) if end is not None else (1 << 30)
    return F.substring(col, start + 1, length)


def find(col: Column, substring: str) -> Column:
    """find.rs: first 0-based index of substring, -1 if absent."""
    return F.locate(substring, col) - 1


def starts_with(col: Column, prefix: str) -> Column:
    return col.startswith(prefix)


def ends_with(col: Column, suffix: str) -> Column:
    return col.endswith(suffix)


def match_(col: Column, pattern: str) -> Column:
    """match.rs: regex test."""
    return col.rlike(pattern)


def match_any(col: Column, patterns: list[str]) -> Column:
    out = col.rlike(patterns[0])
    for p in patterns[1:]:
        out = out | col.rlike(p)
    return out


def replace(col: Column, pattern: str, with_: str) -> Column:
    """replace.rs (regex semantics)."""
    return F.regexp_replace(col, pattern, with_)


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


def encode_base64(col: Column) -> Column:
    return F.base64(col.cast("binary"))


def decode_base64(col: Column) -> Column:
    return F.unbase64(col).cast("string")


def encode_json(col: Column) -> Column:
    """encode_json.rs: struct/map/array -> JSON string."""
    return F.to_json(col)


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


def sha2_(col: Column, bits: int = 256) -> Column:
    return F.sha2(col.cast("binary"), bits)


@pandas_udf(T.StringType())
def _sha3_256(s: pd.Series) -> pd.Series:
    import hashlib

    return s.map(
        lambda v: hashlib.sha3_256(v.encode()).hexdigest() if v is not None else None
    )


def sha3_(col: Column) -> Column:
    """sha3.rs — no JVM builtin; Arrow-batch UDF."""
    return _sha3_256(col)


def uuid_v4() -> Column:
    return F.uuid()


# ---------------------------------------------------------------------------
# type coercion (to_int.rs, to_bool.rs, ...)
# ---------------------------------------------------------------------------


def to_int(col: Column) -> Column:
    return col.cast("long")


def to_float(col: Column) -> Column:
    return col.cast("double")


def to_string(col: Column) -> Column:
    return col.cast("string")


def to_bool(col: Column) -> Column:
    """to_bool.rs: accepts true/t/yes/y/1 and false/f/no/n/0."""
    low = F.lower(col.cast("string"))
    return (
        F.when(low.isin("true", "t", "yes", "y", "1"), F.lit(True))
        .when(low.isin("false", "f", "no", "n", "0"), F.lit(False))
        .otherwise(F.lit(None).cast("boolean"))
    )


def parse_int(col: Column, base: int = 10) -> Column:
    """parse_int.rs with radix: conv() handles base 2..36."""
    if base == 10:
        return col.cast("long")
    return F.conv(col, base, 10).cast("long")


def to_unix_timestamp(col: Column) -> Column:
    return F.unix_timestamp(col)


def from_unix_timestamp(col: Column) -> Column:
    return F.timestamp_seconds(col)


def to_timestamp(col: Column, fmt: str | None = None) -> Column:
    return F.to_timestamp(col, fmt) if fmt else F.to_timestamp(col)


def format_timestamp(col: Column, fmt: str) -> Column:
    """format_timestamp.rs (strftime specifiers -> JVM pattern is the
    caller's concern; common ISO8601 default)."""
    return F.date_format(col, fmt)


def format_int(col: Column, base: int = 10) -> Column:
    if base == 10:
        return col.cast("string")
    return F.lower(F.conv(col, 10, base))


def format_number(col: Column, scale: int = 2) -> Column:
    return F.format_number(col, scale)


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
    """parse_query_string.rs: 'a=1&b=2' -> map."""
    return F.str_to_map(col, F.lit("&"), F.lit("="))


def floor_(col: Column) -> Column:
    return F.floor(col)


def ceil_(col: Column) -> Column:
    return F.ceil(col)


def round_(col: Column, precision: int = 0) -> Column:
    return F.round(col, precision)


def log_(col: Column, base: float | None = None) -> Column:
    return F.log(base, col) if base else F.log(col)


# ---------------------------------------------------------------------------
# registry: VRL function name -> implementation
# ---------------------------------------------------------------------------

FUNCTIONS: dict[str, object] = {
    # string
    "upcase": F.upper, "downcase": F.lower, "truncate": truncate,
    "slice": slice_, "find": find, "contains": lambda c, s: c.contains(s),
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
    "parse_duration": parse_duration_ms, "parse_url": parse_url,
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
}
