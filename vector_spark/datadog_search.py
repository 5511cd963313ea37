"""Datadog Log Search syntax as a Catalyst boolean Column.

The reference condition (src/conditions/datadog_search.rs) parses the
query with a pest grammar (lib/datadog/search-syntax/src/grammar.pest
-> QueryNode, grammar.rs QueryVisitor) and builds per-event closure
matchers (lib/datadog/filter/src/matcher.rs build_matcher +
src/conditions/datadog_search.rs EventFilter). This module is the
same two stages, Spark-first: a recursive-descent parser producing
the same QueryNode shapes, then a compiler emitting ONE boolean
Column expression — the whole condition stays inside whole-stage
codegen, no per-row Python.

Field semantics mirror the reference exactly
(lib/datadog/search-syntax/src/field.rs normalize_fields):
  * `@facet`  -> the `custom.facet` path
  * reserved names (host, source, status, service, trace_id,
    message, timestamp, tags) -> top-level columns
  * bare default search -> each of the DEFAULT_FIELDS, OR-ed
  * anything else -> a `key:value` entry in the `tags` array column

Matching semantics mirror EventFilter (datadog_search.rs:63-260):
word-boundary regexes for default-field terms, whole-value wildcard
regexes elsewhere, `tags` membership for tag fields, numeric compare
for numeric facets, string compare otherwise, and `string`-typed
columns only for term equality (a non-string value never
term-matches, as in the reference's string_match).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field as dc_field
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["datadog_search", "parse_query", "DatadogSearchError"]


class DatadogSearchError(ValueError):
    pass


# ---------------------------------------------------------------------------
# QueryNode AST (lib/datadog/search-syntax/src/node.rs)
# ---------------------------------------------------------------------------


@dataclass
class Node:
    kind: str  # match_all | match_none | exists | missing | term |
    #            phrase | prefix | wildcard | compare | range | not |
    #            and | or
    attr: str | None = None
    value: Any = None
    comparator: str | None = None  # > >= < <=
    lower: Any = None
    lower_inclusive: bool = True
    upper: Any = None
    upper_inclusive: bool = True
    nodes: list = dc_field(default_factory=list)


DEFAULT_FIELD = "_default_"
EXISTS_FIELD = "_exists_"
MISSING_FIELD = "_missing_"

# field.rs DEFAULT_FIELDS / RESERVED_ATTRIBUTES
DEFAULT_FIELDS = [
    "message",
    "custom.error.message",
    "custom.error.stack",
    "custom.title",
    "_default_",
]
RESERVED_ATTRIBUTES = {
    "host", "source", "status", "service", "trace_id", "message",
    "timestamp", "tags",
}


def _unescape(s: str) -> str:
    out, esc = [], False
    for c in s:
        if esc:
            out.append(c)
            esc = False
        elif c == "\\":
            esc = True
        else:
            out.append(c)
    return "".join(out)


# ---------------------------------------------------------------------------
# parser (grammar.pest, hand-rolled recursive descent)
# ---------------------------------------------------------------------------

_TERM_INVALID_START = set(' \t\r\n"()[]{}+-!:~^?*\\>=<')
_TERM_INVALID_CHAR = set(' \t\r\n"()[]{}!:~^?*\\><')  # - + = allowed inside
_CONJ = ("AND", "OR")
_KEYWORDS = ("AND", "OR", "NOT")


class _Parser:
    def __init__(self, src: str):
        self.s = src
        self.i = 0

    # -- lexing helpers

    def ws(self):
        while self.i < len(self.s) and self.s[self.i] in " \t\r\n":
            self.i += 1

    def eof(self) -> bool:
        self.ws()
        return self.i >= len(self.s)

    def peek_ch(self) -> str:
        return self.s[self.i] if self.i < len(self.s) else ""

    def at_keyword(self, kw: str) -> bool:
        self.ws()
        end = self.i + len(kw)
        if self.s[self.i : end] != kw:
            return False
        return end >= len(self.s) or not (
            self.s[end].isalnum() or self.s[end] == "_"
        )

    def take_keyword(self, kw: str) -> bool:
        if self.at_keyword(kw):
            self.i += len(kw)
            return True
        return False

    def raw_term(self, glob: bool = False) -> str | None:
        """TERM / TERM_GLOB: escaped chars allowed anywhere."""
        self.ws()
        j = self.i
        out = []
        first = True
        while j < len(self.s):
            c = self.s[j]
            if c == "\\" and j + 1 < len(self.s):
                out.append(self.s[j : j + 2])
                j += 2
                first = False
                continue
            invalid = _TERM_INVALID_START if first else _TERM_INVALID_CHAR
            if glob and c in "*?":
                pass
            elif c in invalid:
                break
            out.append(c)
            j += 1
            first = False
        if not out:
            return None
        text = "".join(out)
        # keywords are not terms
        if text in _KEYWORDS:
            return None
        self.i = j
        return text

    def phrase(self) -> str | None:
        self.ws()
        if self.peek_ch() != '"':
            return None
        j = self.i + 1
        out = []
        while j < len(self.s) and self.s[j] != '"':
            if self.s[j] == "\\" and j + 1 < len(self.s):
                out.append(self.s[j + 1])
                j += 2
            else:
                out.append(self.s[j])
                j += 1
        if j >= len(self.s):
            raise DatadogSearchError("unterminated phrase")
        self.i = j + 1
        return "".join(out)

    # -- grammar

    def parse(self) -> Node:
        node = self.query()
        if not self.eof():
            raise DatadogSearchError(
                f"unexpected input at {self.i}: {self.s[self.i:][:30]!r}"
            )
        return node

    def query(self) -> Node:
        """visit_query (grammar.rs:33-139): clauses carry Lucene occur
        flags; AND/OR conjunctions flip neighbors between Must and
        Should; the final combination is the reference's exact
        has_must/has_should/has_must_not rule."""
        clauses: list[tuple[str, Node]] = []  # (occur, node)
        modifier: str | None = None
        while True:
            self.ws()
            if self.eof() or self.peek_ch() == ")":
                break
            if clauses and self.take_keyword("AND"):
                occ, n = clauses[-1]
                if occ == "should":
                    clauses[-1] = ("must", n)
                continue
            if clauses and self.take_keyword("OR"):
                occ, n = clauses[-1]
                if occ == "must":
                    clauses[-1] = ("should", n)
                if modifier is None:
                    modifier = "should"
                continue
            if self.take_keyword("NOT"):
                modifier = "must_not"
                continue
            if self.peek_ch() == "-":
                self.i += 1
                modifier = "must_not"
                continue
            if self.peek_ch() == "+":
                self.i += 1
                continue
            if modifier is None:
                mt = self.multiterm()
                if mt is not None:
                    clauses.append(("must", mt))
                    continue
            node = self.clause()
            clauses.append((modifier or "must", node))
            modifier = None
        if not clauses:
            raise DatadogSearchError("empty query")
        if len(clauses) == 1:
            occ, node = clauses[0]
            if occ == "must_not":
                if node.kind == "match_all":
                    return Node("match_none")
                return Node("not", nodes=[node])
            return node
        ands: list[Node] = []
        ors: list[Node] = []
        has_must = has_must_not = has_should = False
        for occ, node in clauses:
            if occ == "must":
                ands.append(node)
                has_must = True
            elif occ == "must_not":
                ands.append(Node("not", nodes=[node]))
                has_must_not = True
            else:
                ors.append(node)
                has_should = True
        if has_must or not has_should:
            return Node("and", nodes=ands)
        if not has_must_not:
            return Node("or", nodes=ors)
        ands.append(Node("or", nodes=ors))
        return Node("and", nodes=ands)

    def multiterm(self) -> Node | None:
        """Consecutive bare TERMs (no colon/star/conjunction ahead)
        join into one default-field term: `foo bar` matches the
        phrase "foo bar" by word boundary (grammar.rs:141-158)."""
        save = self.i
        terms: list[str] = []
        while True:
            save_one = self.i
            t = self.raw_term()
            if t is None:
                break
            nxt = self.s[self.i : self.i + 1]
            if nxt in (":", "*"):
                self.i = save_one
                break
            # ws+(AND|OR) lookahead: conjunction terms end a multiterm
            j = self.i
            while j < len(self.s) and self.s[j] in " \t\r\n":
                j += 1
            rest = self.s[j:]

            def _kw(r: str, kw: str) -> bool:
                # word boundary like at_keyword: 'ORbit' is a term,
                # not the OR conjunction
                return r.startswith(kw) and (
                    len(r) == len(kw)
                    or not (r[len(kw)].isalnum() or r[len(kw)] == "_")
                )

            if j > self.i and (_kw(rest, "AND") or _kw(rest, "OR")):
                if len(terms) == 0:
                    terms.append(_unescape(t))
                else:
                    self.i = save_one
                break
            terms.append(_unescape(t))
        if not terms:
            self.i = save
            return None
        return Node("term", attr=DEFAULT_FIELD, value=" ".join(terms))

    def clause(self) -> Node:
        self.ws()
        # matchall
        if self.s[self.i : self.i + 3] == "*:*":
            self.i += 3
            return Node("match_all")
        # field?
        attr = DEFAULT_FIELD
        save = self.i
        t = self.raw_term()
        if t is not None and self.peek_ch() == ":":
            self.i += 1  # consume ':'
            attr = t  # unescaped later per-kind (field names keep \)
        else:
            self.i = save
        # grouped sub-query
        if self.peek_ch() == "(":
            self.i += 1
            node = self.query()
            self.ws()
            if self.peek_ch() != ")":
                raise DatadogSearchError("expected ')'")
            self.i += 1
            if attr != DEFAULT_FIELD:
                node = _push_attr(node, attr)
            return node
        return self.value(attr)

    def value(self, attr: str) -> Node:
        self.ws()
        c = self.peek_ch()
        if c == '"':
            phrase = self.phrase()
            if attr == EXISTS_FIELD:
                return Node("exists", attr=phrase)
            if attr == MISSING_FIELD:
                return Node("missing", attr=phrase)
            return Node("phrase", attr=_unescape(attr), value=phrase)
        if c in "<>":
            op = c
            self.i += 1
            if self.peek_ch() == "=":
                op += "="
                self.i += 1
            # comparison values may be negative or quoted
            # (node.rs ComparisonValue) — raw_term rejects a leading
            # '-'/'"', so probe those forms first
            self.ws()
            if self.peek_ch() == '"':
                p = self.phrase()  # already unescaped
                return Node(
                    "compare",
                    attr=_unescape(attr),
                    comparator=op,
                    # node.rs:65-78 strips the quotes then tries
                    # integer -> float -> string, same as unquoted
                    value=_num_or_str(p),
                )
            if self.peek_ch() == "-":
                self.i += 1
                inner = self.raw_term()
                t = None if inner is None else "-" + inner
            else:
                t = self.raw_term()
            if t is None:
                raise DatadogSearchError("expected comparison value")
            return Node(
                "compare",
                attr=_unescape(attr),
                comparator=op,
                value=_num_or_str(_unescape(t)),
            )
        if c in "[{":
            lower_inc = c == "["
            self.i += 1
            lo = self.range_value()
            self.ws()
            if not self.take_keyword("TO"):
                raise DatadogSearchError("expected TO in range")
            hi = self.range_value()
            self.ws()
            c2 = self.peek_ch()
            if c2 not in "]}":
                raise DatadogSearchError("expected range close")
            self.i += 1
            return Node(
                "range",
                attr=_unescape(attr),
                lower=_range_bound(lo),
                lower_inclusive=lower_inc,
                upper=_range_bound(hi),
                upper_inclusive=c2 == "]",
            )
        # bare star
        if c == "*" and (
            self.i + 1 >= len(self.s)
            or self.s[self.i + 1] in ' \t\r\n)]}'
        ):
            self.i += 1
            if attr == DEFAULT_FIELD:
                return Node("match_all")
            return Node("wildcard", attr=_unescape(attr), value="*")
        t = self.raw_term(glob=True)
        if t is None:
            raise DatadogSearchError(
                f"expected value at {self.i}: {self.s[self.i:][:20]!r}"
            )
        text = t
        if attr == EXISTS_FIELD:
            return Node("exists", attr=_unescape(text))
        if attr == MISSING_FIELD:
            return Node("missing", attr=_unescape(text))
        if text.endswith("*") and "*" not in text[:-1] and "?" not in text:
            return Node(
                "prefix", attr=_unescape(attr), value=_unescape(text[:-1])
            )
        if "*" in text or "?" in text:
            return Node(
                "wildcard", attr=_unescape(attr), value=_unescape(text)
            )
        return Node("term", attr=_unescape(attr), value=_unescape(text))

    def range_value(self) -> str:
        self.ws()
        j = self.i
        out = []
        while j < len(self.s) and self.s[j] not in ' \t\r\n]}':
            out.append(self.s[j])
            j += 1
        if not out:
            raise DatadogSearchError("expected range value")
        self.i = j
        return "".join(out)


def _push_attr(node: Node, attr: str) -> Node:
    """field:(a OR b) distributes the field over the group."""
    if node.kind in ("and", "or"):
        return Node(
            node.kind, nodes=[_push_attr(n, attr) for n in node.nodes]
        )
    if node.kind == "not":
        return Node("not", nodes=[_push_attr(node.nodes[0], attr)])
    if node.attr == DEFAULT_FIELD:
        node.attr = _unescape(attr)
    return node


def _num_or_str(s: str):
    # ComparisonValue::from (node.rs:65-78): unescape, strip
    # surrounding quotes, then try integer -> float -> string
    if len(s) >= 3 and s[0] == '"' and s[-1] == '"':
        s = s[1:-1]
    try:
        return int(s)
    except ValueError:
        try:
            return float(s)
        except ValueError:
            return s


def _range_bound(s: str):
    if s == "*":
        return None  # Unbounded
    return _num_or_str(_unescape(s))


def parse_query(source: str) -> Node:
    return _Parser(source).parse()


# ---------------------------------------------------------------------------
# field resolution (field.rs normalize_fields)
# ---------------------------------------------------------------------------


def _normalize_fields(attr: str) -> list[tuple[str, str]]:
    """attr -> [(kind, path)] with kind in default|reserved|facet|tag."""
    if attr == DEFAULT_FIELD:
        return [("default", f) for f in DEFAULT_FIELDS]
    if attr.startswith("@"):
        return [("facet", "custom." + attr[1:])]
    if attr in DEFAULT_FIELDS:
        return [("default", attr)]
    if attr in RESERVED_ATTRIBUTES:
        return [("reserved", attr)]
    return [("tag", attr)]


def _schema_type(schema: T.StructType | None, path: str):
    """DataType at a dotted path, or None if absent/unknowable."""
    if schema is None:
        return None
    cur: Any = schema
    for part in path.split("."):
        if not isinstance(cur, T.StructType):
            return None
        match = next((f for f in cur.fields if f.name == part), None)
        if match is None:
            return None
        cur = match.dataType
    return cur


def _word_regex(to_match: str) -> str:
    # datadog_filter regex.rs word_regex
    return r"\b" + re.escape(to_match).replace(r"\*", ".*") + r"\b"


def _wildcard_regex(to_match: str) -> str:
    return "^" + re.escape(to_match).replace(r"\*", ".*") + "$"


def _false() -> Column:
    # not module-level: F.lit needs an active SparkSession
    return F.lit(False)


class _Compiler:
    """QueryNode -> boolean Column over a DataFrame schema. A path
    missing from the schema compiles to `false` (the reference's
    log.get(field) == None)."""

    def __init__(self, schema: T.StructType | None, tags_col: str):
        self.schema = schema
        self.tags_col = tags_col

    def col(self, path: str) -> Column | None:
        if path == DEFAULT_FIELD:
            # the '_default_' pseudo-field is the expansion sentinel,
            # never a real column — emitting F.col('_default_') in
            # no-schema mode fails analysis on every bare term
            return None
        if self.schema is not None and _schema_type(self.schema, path) is None:
            return None
        return F.col(path)

    def str_col(self, path: str) -> Column | None:
        """string_match: only Bytes values match (datadog_search.rs
        string_match `_ => false`)."""
        t = _schema_type(self.schema, path)
        if self.schema is not None and t is None:
            return None
        if t is not None and not isinstance(t, T.StringType):
            return None
        return F.col(path)

    def tags(self) -> Column | None:
        return self.col(self.tags_col)

    def any_tag(self, pred) -> Column:
        tags = self.tags()
        if tags is None:
            return _false()
        return F.coalesce(F.exists(tags, pred), _false())

    # -- per-field matchers (datadog_search.rs EventFilter)

    def f_exists(self, kind: str, path: str) -> Column:
        if kind == "tag":
            pfx = path + ":"
            return self.any_tag(
                lambda v: (v == path) | v.startswith(pfx)
            )
        if kind == "reserved" and path == "tags":
            return self.any_tag(lambda v: v == "tags")
        c = self.col(path)
        return _false() if c is None else c.isNotNull()

    def f_equals(self, kind: str, path: str, value: str) -> Column:
        if kind == "default":
            c = self.str_col(path)
            if c is None:
                return _false()
            return F.coalesce(c.rlike(_word_regex(value)), _false())
        if kind == "reserved" and path == "tags":
            return self.any_tag(lambda v: v == value)
        if kind == "tag":
            needle = f"{path}:{value}"
            return self.any_tag(lambda v: v == needle)
        c = self.str_col(path)
        return _false() if c is None else F.coalesce(c == value, _false())

    def f_prefix(self, kind: str, path: str, prefix: str) -> Column:
        if kind == "default":
            c = self.str_col(path)
            if c is None:
                return _false()
            return F.coalesce(
                c.rlike(_word_regex(prefix + "*")), _false()
            )
        if kind == "tag":
            pfx = f"{path}:{prefix}"
            return self.any_tag(lambda v: v.startswith(pfx))
        c = self.str_col(path)
        return (
            _false()
            if c is None
            else F.coalesce(c.startswith(prefix), _false())
        )

    def f_wildcard(self, kind: str, path: str, wildcard: str) -> Column:
        if kind == "default":
            c = self.str_col(path)
            if c is None:
                return _false()
            return F.coalesce(c.rlike(_word_regex(wildcard)), _false())
        if kind == "tag":
            rx = _wildcard_regex(f"{path}:{wildcard}")
            return self.any_tag(lambda v: v.rlike(rx))
        c = self.str_col(path)
        return (
            _false()
            if c is None
            else F.coalesce(c.rlike(_wildcard_regex(wildcard)), _false())
        )

    def f_compare(self, kind: str, path: str, op: str, value) -> Column:
        def apply(lhs: Column, rhs) -> Column:
            if op == ">":
                return lhs > rhs
            if op == ">=":
                return lhs >= rhs
            if op == "<":
                return lhs < rhs
            return lhs <= rhs

        if kind == "tag":
            pfx = path + ":"
            rhs = str(value)
            return self.any_tag(
                lambda v: v.startswith(pfx)
                & apply(F.substring(v, len(pfx) + 1, 2**30), rhs)
            )
        t = _schema_type(self.schema, path)
        if self.schema is not None and t is None:
            return _false()
        c = F.col(path)
        numeric = isinstance(value, (int, float))
        if kind == "facet":
            # numeric column vs numeric rhs -> numeric; string column
            # -> string compare of the rendered rhs; other types
            # never match (datadog_search.rs:165-233)
            if t is None:
                return F.coalesce(apply(c, F.lit(value)), _false())
            if isinstance(t, T.NumericType):
                if not numeric:
                    return _false()
                return F.coalesce(apply(c, F.lit(value)), _false())
            if isinstance(t, T.StringType):
                return F.coalesce(apply(c, str(value)), _false())
            return _false()
        # default/reserved: string compare over string columns
        if t is not None and not isinstance(t, T.StringType):
            return _false()
        return F.coalesce(apply(c, str(value)), _false())

    def f_range(
        self, kind, path, lower, lower_inc, upper, upper_inc
    ) -> Column:
        # datadog_filter filter.rs default range(): unbounded sides
        # degrade to exists / single compares
        if lower is None and upper is None:
            return self.f_exists(kind, path)
        if lower is None:
            return self.f_compare(
                kind, path, "<=" if upper_inc else "<", upper
            )
        if upper is None:
            return self.f_compare(
                kind, path, ">=" if lower_inc else ">", lower
            )
        return self.f_compare(
            kind, path, ">=" if lower_inc else ">", lower
        ) & self.f_compare(kind, path, "<=" if upper_inc else "<", upper)

    # -- node dispatch (matcher.rs build_matcher)

    def compile(self, node: Node) -> Column:
        k = node.kind
        if k == "match_all":
            return F.lit(True)
        if k == "match_none":
            return _false()
        if k == "not":
            return ~self.compile(node.nodes[0])
        if k == "and":
            out = self.compile(node.nodes[0])
            for n in node.nodes[1:]:
                out = out & self.compile(n)
            return out
        if k == "or":
            out = self.compile(node.nodes[0])
            for n in node.nodes[1:]:
                out = out | self.compile(n)
            return out
        fields = _normalize_fields(node.attr)
        if k == "exists":
            cols = [self.f_exists(kk, p) for kk, p in fields]
        elif k == "missing":
            # all(not exists) (matcher.rs AttributeMissing)
            out = ~self.f_exists(*fields[0])
            for kk, p in fields[1:]:
                out = out & ~self.f_exists(kk, p)
            return out
        elif k in ("term", "phrase"):
            cols = [
                self.f_equals(kk, p, str(node.value)) for kk, p in fields
            ]
        elif k == "prefix":
            cols = [
                self.f_prefix(kk, p, str(node.value)) for kk, p in fields
            ]
        elif k == "wildcard":
            cols = [
                self.f_wildcard(kk, p, str(node.value))
                for kk, p in fields
            ]
        elif k == "compare":
            cols = [
                self.f_compare(kk, p, node.comparator, node.value)
                for kk, p in fields
            ]
        elif k == "range":
            cols = [
                self.f_range(
                    kk,
                    p,
                    node.lower,
                    node.lower_inclusive,
                    node.upper,
                    node.upper_inclusive,
                )
                for kk, p in fields
            ]
        else:  # pragma: no cover
            raise DatadogSearchError(f"unknown node kind {k!r}")
        out = cols[0]
        for c in cols[1:]:
            out = out | c
        return out


def datadog_search(
    source: str,
    schema: T.StructType | None = None,
    tags_col: str = "tags",
) -> Column:
    """Compile a Datadog search query to a boolean Column.

    Pass the DataFrame's schema so references to absent fields
    compile to `false` (the reference's missing-attribute semantics)
    instead of failing analysis; without a schema, every referenced
    path must exist."""
    node = parse_query(source)
    return _Compiler(schema, tags_col).compile(node)
