"""VRL language subset -> Spark Column compiler.

Vector's remap transform executes a VRL program per event
(src/transforms/remap.rs; language under lib/vrl/). This module
compiles VRL **source text** into Column expressions so a remap
program runs as ordinary Catalyst-optimized projections — per-batch
JVM execution instead of the reference's per-event tree-walk, which
is the whole point of the Spark rebuild.

Supported subset (the practical remap surface):
  * path assignment      .foo = expr, .a.b = expr (struct rebuild via
                         withField), variable assignment x = expr,
                         variable-path assignment x.f = / x[2] =
                         (withField / positional array rebuild)
  * fallible assignment  ok, err = expr  (Vector's error capture:
                         Spark expressions fail to null, so err is
                         derived; division-by-zero matches the
                         reference's message + typed default)
  * merge operator       a | b and a |= b on objects (struct rebuild,
                         right-biased like merge.rs)
  * del(.path), exists(.path), set/remove on the whole event
  * if cond { ... } else if ... { ... } else { ... }   (expression-
    valued; assignments inside branches become conditional updates);
    newline-tolerant; parenthesized statement-sequence predicates
  * blocks as expressions: { stmt; stmt; value } (shared scope, VRL
    blocks do not introduce scope)
  * closures: map_values / map_keys / for_each with `-> |k, v| {..}`
    — arrays compile to F.transform (JVM higher-order function),
    objects unroll at compile time over the statically-known keys
    (lib/vrl/compiler iteration is BTreeMap-ordered => sorted)
  * literals: strings (escapes incl. line-continuation), s'..'/r'..',
    t'..' timestamps, ints/floats (with _ separators), booleans,
    null, arrays, objects; regex r'...' feeds functions
  * operators: ?? (error/null coalesce), || && !, == != < <= > >=,
    + - * / %, unary -, postfix field/index access on any expression
  * function calls into the FUNCTIONS registry (vrl.py), with the
    trailing-! infallible marker accepted (Spark surfaces runtime
    failure as null; `??` supplies the fallback)
  * final-expression value: the program's value is its last
    expression (`.` yields the whole event)

Declared out of scope (compile errors name the construct): dynamic
paths `.(a|b)`, abort, metadata `%`/`@`, type_def, heterogeneous
arrays (Spark arrays are homogeneous). Divergence: VRL `??` catches
*errors* while null is a valid value; Spark expressions fail to
null, so `??` compiles to coalesce — programs relying on "null is
not an error" differ (documented, matches the _parse_error
convention used across the repo).
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class VrlCompileError(ValueError):
    pass


class VrlStaticAbort(Exception):
    """An `abort` reached on the statically-unconditional path: the
    program provably stops here for every event. eval_vrl truncates
    the plan at this statement and returns the event-so-far (the
    reference corpus records exactly that state); compile_vrl
    re-raises as VrlCompileError so production remap falls back to
    the interpreter, whose abort/drop routing is exact."""


# ---------------------------------------------------------------------------
# tokenizer
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>[ \t]+)
  | (?P<comment>\#[^\n]*)
  | (?P<nl>\r?\n)
  | (?P<float>\d[\d_]*\.\d[\d_]*)
  | (?P<rawstr>r'(?:[^'\\]|\\[\s\S])*')
  | (?P<sstr>s'(?:[^'\\]|\\[\s\S])*')
  | (?P<tstr>t'(?:[^'\\]|\\[\s\S])*')
  | (?P<dstr>"(?:[^"\\]|\\[\s\S])*")
  | (?P<ident>(?=[0-9@_]*[@A-Za-z])[A-Za-z0-9_@]+!(?=\()|(?=[0-9@_]*[@A-Za-z])[A-Za-z0-9_@]+|_[A-Za-z0-9_]*)
  | (?P<int>\d[\d_]*)
  | (?P<op>\?\?|==|!=|<=|>=|&&|\|\||->|[-+*/%<>=!,;:(){}\[\].|])
    """,
    re.X,
)
# ident is deliberately broad: VRL *path* fields may contain `@` and
# start with digits (`.foo@bar`, `.0tar`, `.wibble@` — reference path
# lexer), and those only ever reach the parser inside paths. The
# lookahead keeps pure numbers flowing to int/float.

_KEYWORDS = {"if", "else", "null", "true", "false", "abort"}


@dataclass
class Tok:
    kind: str
    text: str
    pos: int


def tokenize(src: str) -> list[Tok]:
    toks: list[Tok] = []
    i = 0
    while i < len(src):
        m = _TOKEN_RE.match(src, i)
        if not m:
            raise VrlCompileError(f"unexpected character {src[i]!r} at {i}")
        kind = m.lastgroup
        text = m.group()
        if kind not in ("ws", "comment"):
            toks.append(Tok(kind, text, i))
        i = m.end()
    toks.append(Tok("eof", "", len(src)))
    return toks


def _unescape(body: str) -> str:
    # escaped newline swallows the newline and the next line's indent
    body = re.sub(r"\\\r?\n[ \t]*", "", body)
    # escape set per the reference lexer (lib/vrl/parser/src/lex.rs
    # unescape_string_literal / escape_code): \' \" \\ \n \r \t \{ \}
    return (
        body.replace(r"\\", "\x00")
        .replace(r"\n", "\n")
        .replace(r"\r", "\r")
        .replace(r"\t", "\t")
        .replace(r"\"", '"')
        .replace(r"\'", "'")
        .replace(r"\{", "{")
        .replace(r"\}", "}")
        .replace("\x00", "\\")
    )


# ---------------------------------------------------------------------------
# AST
# ---------------------------------------------------------------------------


@dataclass
class Lit:
    value: Any


@dataclass
class TsLit:
    text: str


@dataclass
class Regex:
    pattern: str


@dataclass
class Path:
    segments: list  # str | int for indexing


@dataclass
class Var:
    name: str


@dataclass
class VarPath:
    name: str
    segments: list  # str | int


@dataclass
class Arr:
    items: list


@dataclass
class Obj:
    pairs: list  # (str, node)


@dataclass
class Bin:
    op: str
    left: Any
    right: Any


@dataclass
class Un:
    op: str
    operand: Any


@dataclass
class Call:
    name: str
    args: list  # positional nodes
    kwargs: dict  # name -> node
    infallible: bool
    closure: Any = None  # (params: list[str], body: list[stmt]) | None
    span: Any = None  # (start, end) 1-based inclusive source span


@dataclass
class If:
    cond: Any
    then: list  # statements
    orelse: list  # statements


@dataclass
class Block:
    stmts: list
    # parenthesized statement-sequences (if-predicates) share the
    # enclosing scope; `{ .. }` blocks get a child scope (interpreter)
    paren: bool = False


@dataclass
class Assign:
    target: Any  # Path | Var | VarPath
    expr: Any
    op: str  # '=' or '|='


@dataclass
class Abort:
    # abort [message-expr] — drops the event (remap.rs dropped-port);
    # the Column compiler declares it out of scope, the interpreter
    # (vrl_interp.py) implements it.
    message: Any = None


@dataclass
class MultiAssign:
    ok: Any  # Path | Var | VarPath
    err: Any
    expr: Any
    op: str


# ---------------------------------------------------------------------------
# parser (recursive descent, precedence climbing)
# ---------------------------------------------------------------------------


class Parser:
    def __init__(self, toks: list[Tok]):
        self.toks = toks
        self.i = 0

    def peek(self, k: int = 0) -> Tok:
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def next(self) -> Tok:
        t = self.toks[self.i]
        self.i += 1
        return t

    def skip_nl(self):
        while self.peek().kind == "nl" or self.peek().text == ";":
            self.next()

    def expect(self, text: str) -> Tok:
        t = self.next()
        if t.text != text:
            raise VrlCompileError(f"expected {text!r}, got {t.text!r} at {t.pos}")
        return t

    # ---- program ----

    def program(self) -> list:
        stmts = []
        self.skip_nl()
        while self.peek().kind != "eof":
            stmts.append(self.statement())
            self.skip_nl()
        return stmts

    def statement(self):
        save = self.i
        target = self.try_target()
        if target is not None:
            t = self.peek()
            if t.text == ",":
                self.next()
                self.skip_nl()
                err_t = self.try_target()
                if err_t is not None:
                    if self.peek().text == "=" and self.peek(1).text != "=":
                        self.next()
                        self.skip_nl()
                        return MultiAssign(target, err_t, self.expr(), "=")
                    if (
                        self.peek().text == "|"
                        and self.peek(1).text == "="
                    ):
                        self.next(), self.next()
                        self.skip_nl()
                        return MultiAssign(target, err_t, self.expr(), "|=")
            elif t.text == "=" and self.peek(1).text != "=":
                self.next()
                self.skip_nl()
                return Assign(target, self.expr(), "=")
            elif t.text == "|" and self.peek(1).text == "=":
                self.next(), self.next()
                self.skip_nl()
                return Assign(target, self.expr(), "|=")
        self.i = save
        return self.expr()

    def try_target(self):
        """Parse an assignment target (Path | Var | VarPath) or return
        None (caller restores position)."""
        t = self.peek()
        if t.text == ".":
            try:
                return self.parse_path()
            except VrlCompileError:
                return None
        if t.kind == "ident" and t.text not in _KEYWORDS:
            name = self.next().text
            if name.endswith("!") or self.peek().text == "(":
                return None
            segs: list = []
            while True:
                if self.peek().text == "." and self.peek(1).kind in (
                    "ident",
                    "dstr",
                ):
                    self.next()
                    kt = self.next()
                    segs.append(
                        _unescape(kt.text[1:-1])
                        if kt.kind == "dstr"
                        else kt.text.rstrip("!")
                    )
                elif self.peek().text == "." and self.peek(1).text == "(":
                    # coalesce segment in a variable target:
                    # foo.bar.(qux | "quux qux") = ...
                    save2 = self.i
                    self.next(), self.next()
                    alts: list[str] = []
                    ok = True
                    while True:
                        at = self.next()
                        if at.kind == "dstr":
                            alts.append(_unescape(at.text[1:-1]))
                        elif at.kind in ("ident", "atident", "int"):
                            alts.append(at.text.rstrip("!"))
                        else:
                            ok = False
                            break
                        if self.peek().text == "|":
                            self.next()
                            continue
                        break
                    if not ok or self.peek().text != ")":
                        self.i = save2
                        return None
                    self.next()
                    segs.append(("|", alts))
                elif self.peek().text == "[":
                    save2 = self.i
                    self.next()
                    sign = 1
                    it = self.next()
                    if it.text == "-":
                        sign, it = -1, self.next()
                    if it.kind != "int" or self.peek().text != "]":
                        self.i = save2
                        return None
                    self.next()
                    segs.append(sign * int(it.text.replace("_", "")))
                else:
                    break
            return VarPath(name, segs) if segs else Var(name)
        return None

    # ---- expressions ----

    def expr(self):
        return self.coalesce()

    def coalesce(self):
        left = self.logic_or()
        while self.peek().text == "??":
            self.next()
            self.skip_nl()
            left = Bin("??", left, self.logic_or())
        return left

    def logic_or(self):
        left = self.logic_and()
        while self.peek().text == "||":
            self.next()
            self.skip_nl()
            left = Bin("||", left, self.logic_and())
        return left

    def logic_and(self):
        left = self.merge_lvl()
        while self.peek().text == "&&":
            self.next()
            self.skip_nl()
            left = Bin("&&", left, self.merge_lvl())
        return left

    def merge_lvl(self):
        # VRL object-merge operator (merge.rs semantics, right-biased)
        left = self.equality()
        while self.peek().text == "|" and self.peek(1).text not in ("=", "|"):
            self.next()
            self.skip_nl()
            left = Bin("|", left, self.equality())
        return left

    def equality(self):
        left = self.comparison()
        while self.peek().text in ("==", "!="):
            op = self.next().text
            self.skip_nl()
            left = Bin(op, left, self.comparison())
        return left

    def comparison(self):
        left = self.additive()
        while self.peek().text in ("<", "<=", ">", ">="):
            op = self.next().text
            left = Bin(op, left, self.additive())
        return left

    def additive(self):
        left = self.multiplicative()
        while self.peek().text in ("+", "-"):
            op = self.next().text
            self.skip_nl()
            left = Bin(op, left, self.multiplicative())
        return left

    def multiplicative(self):
        left = self.unary()
        while self.peek().text in ("*", "/", "%"):
            op = self.next().text
            left = Bin(op, left, self.unary())
        return left

    def unary(self):
        t = self.peek()
        if t.text == "!":
            self.next()
            return Un("!", self.unary())
        if t.text == "-":
            self.next()
            return Un("-", self.unary())
        return self.postfix()

    def postfix(self):
        node = self.primary()
        while True:
            t = self.peek()
            if t.text == "[":
                self.next()
                it = self.peek()
                sign = 1
                if it.text == "-":
                    self.next()
                    sign, it = -1, self.peek()
                if it.kind == "int":
                    self.next()
                    seg: Any = sign * int(it.text.replace("_", ""))
                elif it.kind == "dstr" and sign == 1:
                    self.next()
                    seg = _unescape(it.text[1:-1])
                else:
                    raise VrlCompileError(
                        f"only literal indexes supported at {it.pos}"
                    )
                self.expect("]")
                if isinstance(node, Path):
                    node = Path(node.segments + [seg])
                elif isinstance(seg, int):
                    node = Bin("index", node, Lit(seg))
                else:
                    node = Bin("getfield", node, Lit(seg))
            elif (
                t.text == "."
                and not isinstance(node, Path)
                and self.peek(1).kind in ("ident", "dstr")
            ):
                self.next()
                kt = self.next()
                key = (
                    _unescape(kt.text[1:-1])
                    if kt.kind == "dstr"
                    else kt.text.rstrip("!")
                )
                node = Bin("getfield", node, Lit(key))
            elif (
                t.text == "."
                and not isinstance(node, Path)
                and self.peek(1).text == "("
            ):
                # var-rooted dynamic coalescing: foo.(a | b)
                self.next()
                self.next()
                alts: list[str] = []
                while True:
                    at = self.next()
                    if at.kind == "dstr":
                        alts.append(_unescape(at.text[1:-1]))
                    elif at.kind in ("ident", "int"):
                        alts.append(at.text.rstrip("!"))
                    else:
                        raise VrlCompileError(
                            f"bad path alternative {at.text!r} at {at.pos}"
                        )
                    if self.peek().text == "|":
                        self.next()
                        continue
                    break
                self.expect(")")
                node = Bin("coalfield", node, Lit(alts))
            else:
                return node

    def parse_path(self) -> Path:
        self.expect(".")
        segs: list = []
        while True:
            t = self.peek()
            if t.kind in ("ident", "atident"):
                segs.append(self.next().text.rstrip("!"))
            elif t.kind == "dstr":
                segs.append(_unescape(self.next().text[1:-1]))
            elif t.text == "(":
                # dynamic path coalescing `.(a | b)` -> tuple segment
                # ("|", [alternatives]); compiler rejects, interpreter
                # resolves first-existing (last alt for targets)
                self.next()
                alts: list[str] = []
                while True:
                    at = self.next()
                    if at.kind == "dstr":
                        alts.append(_unescape(at.text[1:-1]))
                    elif at.kind in ("ident", "int"):
                        alts.append(at.text.rstrip("!"))
                    else:
                        raise VrlCompileError(
                            f"bad path alternative {at.text!r} at {at.pos}"
                        )
                    if self.peek().text == "|":
                        self.next()
                        continue
                    break
                self.expect(")")
                segs.append(("|", alts))
            else:
                break
            while self.peek().text == "[":
                self.next()
                idx = self.next()
                sign = 1
                if idx.text == "-":
                    sign, idx = -1, self.next()
                if idx.kind != "int":
                    raise VrlCompileError("only literal indexes supported")
                self.expect("]")
                segs.append(sign * int(idx.text.replace("_", "")))
            if self.peek().text == "." and (
                self.peek(1).kind in ("ident", "atident", "dstr")
                or self.peek(1).text == "("
            ):
                self.next()
                continue
            break
        return Path(segs)  # [] = whole event

    def primary(self):
        t = self.peek()
        if t.text == ".":
            return self.parse_path()
        if t.kind == "int":
            self.next()
            return Lit(int(t.text.replace("_", "")))
        if t.kind == "float":
            self.next()
            return Lit(float(t.text.replace("_", "")))
        if t.kind == "dstr":
            self.next()
            return Lit(_unescape(t.text[1:-1]))
        if t.kind == "sstr":
            # s'..' is a raw string: no escape processing except \'
            self.next()
            return Lit(t.text[2:-1].replace("\\'", "'"))
        if t.kind == "rawstr":
            self.next()
            return Regex(t.text[2:-1])
        if t.kind == "tstr":
            self.next()
            return TsLit(t.text[2:-1])
        if t.text == "null":
            self.next()
            return Lit(None)
        if t.text in ("true", "false"):
            self.next()
            return Lit(t.text == "true")
        if t.text == "abort":
            self.next()
            nxt = self.peek()
            if nxt.kind in ("nl", "eof") or nxt.text in (
                "}", ")", "]", ",", ";",
            ):
                return Abort(None)
            return Abort(self.expr())
        if t.text == "if":
            return self.if_expr()
        if t.text == "{":
            # object literal iff it opens with `key:`; else a block
            k = 1
            while self.peek(k).kind == "nl":
                k += 1
            a, b = self.peek(k), self.peek(k + 1)
            if a.text == "}" or (
                a.kind in ("ident", "dstr") and b.text == ":"
            ):
                return self.object_literal()
            return Block(self.block())
        if t.text == "[":
            return self.array_literal()
        if t.text == "(":
            # parenthesized expression or statement sequence
            # (if-predicates like `(x = x + 1; x == 3)`)
            self.next()
            stmts = []
            self.skip_nl()
            while self.peek().text != ")":
                stmts.append(self.statement())
                self.skip_nl()
            self.expect(")")
            if not stmts:
                raise VrlCompileError(f"empty parentheses at {t.pos}")
            if len(stmts) == 1 and not isinstance(
                stmts[0], (Assign, MultiAssign)
            ):
                return stmts[0]
            return Block(stmts, paren=True)
        if t.kind == "ident" and t.text not in _KEYWORDS:
            name = self.next().text
            infallible = name.endswith("!")
            name = name.rstrip("!")
            if self.peek().text == "(":
                return self.call(name, infallible, t.pos)
            return Var(name)
        raise VrlCompileError(f"unexpected token {t.text!r} at {t.pos}")

    def call(self, name: str, infallible: bool, name_pos: int = 0) -> Call:
        self.expect("(")
        args, kwargs = [], {}
        self.skip_nl()
        while self.peek().text != ")":
            if (
                self.peek().kind == "ident"
                and self.peek(1).text == ":"
            ):
                k = self.next().text
                self.next()
                self.skip_nl()
                kwargs[k] = self.expr()
            else:
                args.append(self.expr())
            self.skip_nl()
            if self.peek().text == ",":
                self.next()
                self.skip_nl()
        rp = self.expect(")")
        # the reference's diagnostic span format `at (start:end)` is
        # 1-based start, exclusive end (0-based [start,end) shifted +1)
        span = (name_pos + 1, rp.pos + 2)
        closure = None
        if self.peek().text == "->":
            self.next()
            self.skip_nl()
            self.expect("|")
            params = []
            while self.peek().text != "|":
                pt = self.next()
                if pt.kind != "ident":
                    raise VrlCompileError(
                        f"bad closure parameter {pt.text!r} at {pt.pos}"
                    )
                params.append(pt.text)
                if self.peek().text == ",":
                    self.next()
            self.expect("|")
            self.skip_nl()
            closure = (params, self.block())
        return Call(name, args, kwargs, infallible, closure, span)

    def if_expr(self) -> If:
        self.expect("if")
        self.skip_nl()
        cond = self.expr()
        self.skip_nl()
        then = self.block()
        if self._else_ahead():
            self.skip_nl()
        orelse: list = []
        if self.peek().text == "else":
            self.next()
            self.skip_nl()
            if self.peek().text == "if":
                orelse = [self.if_expr()]
            else:
                orelse = self.block()
        return If(cond, then, orelse)

    def _else_ahead(self) -> bool:
        k = 0
        while self.peek(k).kind == "nl" or self.peek(k).text == ";":
            k += 1
        return self.peek(k).text == "else"

    def block(self) -> list:
        self.expect("{")
        stmts = []
        self.skip_nl()
        while self.peek().text != "}":
            stmts.append(self.statement())
            self.skip_nl()
        self.expect("}")
        return stmts

    def object_literal(self) -> Obj:
        self.expect("{")
        pairs = []
        self.skip_nl()
        while self.peek().text != "}":
            kt = self.next()
            if kt.kind == "dstr":
                key = _unescape(kt.text[1:-1])
            elif kt.kind == "ident":
                key = kt.text
            else:
                raise VrlCompileError(f"bad object key {kt.text!r}")
            self.expect(":")
            self.skip_nl()
            pairs.append((key, self.expr()))
            self.skip_nl()
            if self.peek().text == ",":
                self.next()
                self.skip_nl()
        self.expect("}")
        return Obj(pairs)

    def array_literal(self) -> Arr:
        self.expect("[")
        items = []
        self.skip_nl()
        while self.peek().text != "]":
            items.append(self.expr())
            self.skip_nl()
            if self.peek().text == ",":
                self.next()
                self.skip_nl()
        self.expect("]")
        return Arr(items)


def parse_program(src: str) -> list:
    return Parser(tokenize(src)).program()


# ---------------------------------------------------------------------------
# compiler: AST -> Column over an environment
# ---------------------------------------------------------------------------


class Env:
    """Mutable compile-time environment: event fields ('.'-prefixed
    keys) and variables, each bound to a Column, plus best-effort
    static knowledge: `shape` (obj/arr structure — Spark structs need
    their fields known at plan time), `py` (constant values for
    compile-time folding: object-key iteration, set!/remove! keys,
    map_keys renames), and `nodes` (literal AST provenance so closure
    calls over literal collections unroll). Assignments rebind;
    if-branches fork and merge with F.when."""

    def __init__(self, fields: dict[str, Column]):
        self.bind: dict[str, Column] = dict(fields)
        self.deleted: set[str] = set()
        self.shape: dict[str, Any] = {}
        self.py: dict[str, Any] = {}
        self.nodes: dict[str, Any] = {}
        # top-level event field NAMES (may contain dots — the bind-key
        # encoding alone can't distinguish `.a.b` from field "a.b")
        self.top: set[str] = set()
        # best-effort VRL type definitions (type_def.rs lattice).
        # Entry protocol: a dict value is a known tdef; an explicit
        # None means "assigned, type unknown"; an ABSENT key means the
        # path was never touched by the program — external data,
        # which the reference types as {"any": true}.
        self.tdef: dict[str, Any] = {}
        # per-element (Column, shape) lists for array VARIABLES whose
        # element count is statically known (array literals and
        # push/append chains): VRL arrays are heterogeneous and Spark
        # arrays are not, so a mixed array bound as ONE column
        # degrades to array<string>; the element list lets eval_vrl
        # materialize each element as its own natively-typed column
        self.elems: dict[str, list[tuple[Column, Any]]] = {}
        # True once the program replaced the whole event ('. = {...}')
        # — from then on a missing top-level field is known-absent
        # (query -> null), not external-any
        self.root_known = False
        # True when the concrete RUNTIME event is fully known (REPL /
        # corpus evaluation): an unbound event path is value-null at
        # runtime even though its TYPE stays external-any (the
        # reference type checker never closes external objects)
        self.event_closed = False

    def fork(self) -> "Env":
        e = Env({})
        e.bind = dict(self.bind)
        e.deleted = set(self.deleted)
        e.shape = dict(self.shape)
        e.py = dict(self.py)
        e.nodes = dict(self.nodes)
        e.elems = {k: list(v) for k, v in self.elems.items()}
        e.top = set(self.top)
        e.tdef = dict(self.tdef)
        e.root_known = self.root_known
        e.event_closed = self.event_closed
        # dynamically-attached context must survive the fork: dropping
        # sparse_cols turns per-row exists() into a constant inside
        # if-branches, and dropping enrichment_rows makes
        # get_enrichment_table_record fail only when nested
        for attr in ("sparse_cols", "enrichment_rows"):
            if hasattr(self, attr):
                setattr(e, attr, getattr(self, attr))
        return e


def _tdef_of_py(v) -> dict:
    """VRL type-def of a python value (type_def.rs rendering)."""
    if v is None:
        return {"null": True}
    if isinstance(v, bool):
        return {"boolean": True}
    if isinstance(v, int):
        return {"integer": True}
    if isinstance(v, float):
        return {"float": True}
    if isinstance(v, str):
        return {"bytes": True}
    if isinstance(v, list):
        return {"array": {str(i): _tdef_of_py(x) for i, x in enumerate(v)}}
    if isinstance(v, dict):
        return {"object": {k: _tdef_of_py(x) for k, x in v.items()}}
    return {"bytes": True}


def _shape_of_py(v) -> Any:
    if isinstance(v, dict):
        return ("obj", {k: _shape_of_py(x) for k, x in v.items()})
    if isinstance(v, list):
        return ("arr", _shape_of_py(v[0]) if v else None)
    return None


def _tdef_union(a: dict | None, b: dict | None) -> dict | None:
    """Union of two VRL type-defs (type_def.rs Kind::merge): kinds
    union; 'any' absorbs everything; object field maps union
    recursively with a field missing on one side contributing null
    (querying an absent field yields null). None = unknown wins."""
    if a is None or b is None:
        return None
    # `never` is the lattice bottom (type_def.rs Kind::never — an
    # aborting branch): it is the union IDENTITY, not a member kind
    if a == {"never": True}:
        return dict(b)
    if b == {"never": True}:
        return dict(a)
    if a.get("any") or b.get("any"):
        return {"any": True}
    out: dict[str, Any] = {}
    for k in set(a) | set(b):
        if k == "object":
            ao, bo = a.get("object"), b.get("object")
            if ao is None or bo is None:
                # object kind on one side only: keep its field map
                out["object"] = ao if bo is None else bo
                continue
            fields: dict[str, Any] = {}
            for f in set(ao) | set(bo):
                u = _tdef_union(
                    ao.get(f, {"null": True}), bo.get(f, {"null": True})
                )
                if u is None:
                    return None
                fields[f] = u
            out["object"] = fields
        else:
            out[k] = True
    return out


def _shape_step(sh, seg):
    if sh is None:
        return None
    if sh[0] == "obj" and isinstance(seg, str):
        return sh[1].get(seg)
    if sh[0] == "arr" and isinstance(seg, int):
        return sh[1]
    return None


def _contains_abort(node) -> bool:
    """True when an AST subtree contains an `abort` anywhere —
    type_def() over such a block must be answered by static
    type-flow alone (evaluating it would exit the program)."""
    if isinstance(node, Abort):
        return True
    if isinstance(node, (list, tuple)):
        return any(_contains_abort(x) for x in node)
    if isinstance(node, dict):
        return any(_contains_abort(v) for v in node.values())
    if isinstance(
        node,
        (Block, If, Assign, MultiAssign, Bin, Un, Call, Arr, Obj),
    ):
        return any(
            _contains_abort(getattr(node, f))
            for f in node.__dataclass_fields__
        )
    return False


def _py_set_deep(cur, segs: list, val):
    """Deep-set a compile-time python value along path segments,
    mirroring _set_in/_fresh_container: string segs create object
    fields, int segs pad the array with null up to the index
    (assignment.rs array padding). Callers pre-reject negative and
    coalesce segments."""
    seg = segs[0]
    if isinstance(seg, str):
        d = dict(cur) if isinstance(cur, dict) else {}
        d[seg] = (
            val if len(segs) == 1
            else _py_set_deep(d.get(seg), segs[1:], val)
        )
        return d
    lst = list(cur) if isinstance(cur, list) else []
    while len(lst) <= seg:
        lst.append(None)
    lst[seg] = (
        val if len(segs) == 1
        else _py_set_deep(lst[seg], segs[1:], val)
    )
    return lst


def _py_resolve_segs(root, segs: list):
    """Resolve `(a | b)` coalesce segments against a KNOWN python
    value (first existing alternative wins, query/mod.rs); returns the
    concrete segment list, or None when an alternative set has no
    existing member or a segment is un-walkable."""
    out = []
    cur = root
    for seg in segs:
        if isinstance(seg, tuple) and seg and seg[0] == "|":
            pick = None
            if isinstance(cur, dict):
                for alt in seg[1]:
                    if alt in cur:
                        pick = alt
                        break
            if pick is None:
                return None
            seg = pick
        out.append(seg)
        if isinstance(cur, dict) and isinstance(seg, str):
            cur = cur.get(seg)
        elif isinstance(cur, list) and isinstance(seg, int):
            cur = cur[seg] if -len(cur) <= seg < len(cur) else None
        else:
            cur = None
    return out


def _py_query_value(root, segs: list):
    """Query a KNOWN python value along concrete segments — VRL query
    semantics: anything absent or kind-mismatched yields null."""
    cur = root
    for seg in segs:
        if isinstance(cur, dict) and isinstance(seg, str):
            cur = cur.get(seg)
        elif isinstance(cur, list) and isinstance(seg, int):
            cur = cur[seg] if -len(cur) <= seg < len(cur) else None
        else:
            return None
    return cur


# VRL functions whose registry impls take Python-native (non-Column)
# arguments in given positions / keywords
_NATIVE_ARGS = {
    "truncate": {1: True, "limit": True, "ellipsis": True, "suffix": True},
    "slice": {1: True, 2: True, "start": True, "end": True},
    "split": {1: True, 2: True, "pattern": True, "limit": True},
    "replace": {1: True, 2: True, 3: True, "pattern": True, "with": True,
                "count": True},
    "find": {1: True, "pattern": True},
    "contains": {1: True, "substring": True, "case_sensitive": True},
    "starts_with": {1: True, "substring": True, "case_sensitive": True},
    "ends_with": {1: True, "substring": True, "case_sensitive": True},
    "match": {1: True, "pattern": True},
    "match_any": {1: True, "patterns": True},
    "match_array": {1: True, "pattern": True, "all": True},
    "join": {1: True, "separator": True},
    "parse_duration": {1: True, "unit": True},
    "format_timestamp": {1: True, "format": True},
    "to_timestamp": {1: True, "format": True},
    "parse_timestamp": {1: True, "format": True},
    "format_int": {1: True, "base": True},
    "format_number": {1: True, 2: True, "scale": True,
                      "decimal_separator": True, "grouping_separator": True},
    "parse_int": {1: True, "base": True},
    "sha2": {1: True, "variant": True},
    "sha3": {1: True, "variant": True},
    "encode_base64": {1: True, 2: True, "padding": True, "charset": True},
    "decode_base64": {1: True, "charset": True},
    "redact": {1: True, "filters": True},
    "ip_cidr_contains": {0: True, "cidr": True},
    "ip_subnet": {1: True, "subnet": True},
    "round": {1: True, "precision": True},
    "floor": {1: True, "precision": True},
    "ceil": {1: True, "precision": True},
    "log": {1: True, "base": True},
    "is_empty": {1: True},
    "is_json": {1: True, "variant": True},
    "tag_types_externally": {1: True},
    "only_fields": {1: True},
    "encode_key_value": {
        "fields_ordering": True, "key_value_delimiter": True,
        "field_delimiter": True, "flatten_boolean": True,
    },
    "parse_key_value": {
        1: True, 2: True, "key_value_delimiter": True,
        "field_delimiter": True,
    },
}

# VRL param-name order for keyword-style calls (kwargs -> positional)
_KWARG_ORDER = {
    "truncate": ["value", "limit", "suffix", "ellipsis"],
    "slice": ["value", "start", "end"],
    "split": ["value", "pattern", "limit"],
    "replace": ["value", "pattern", "with", "count"],
    "contains": ["value", "substring", "case_sensitive"],
    "starts_with": ["value", "substring", "case_sensitive"],
    "ends_with": ["value", "substring", "case_sensitive"],
    "join": ["value", "separator"],
    "parse_duration": ["value", "unit"],
    "format_timestamp": ["value", "format"],
    "parse_timestamp": ["value", "format"],
    "parse_int": ["value", "base"],
    "md5": ["value"],
    "sha1": ["value"],
    "sha2": ["value", "variant"],
    "sha3": ["value", "variant"],
    "encode_base64": ["value", "padding", "charset"],
    "decode_base64": ["value", "charset"],
    "encode_json": ["value"],
    "upcase": ["value"],
    "downcase": ["value"],
    "round": ["value", "precision"],
    "floor": ["value", "precision"],
    "ceil": ["value", "precision"],
    "log": ["value", "base"],
    "match": ["value", "pattern"],
    "find": ["value", "pattern"],
}

# corpus spellings for coercion asserts (lib/vrl/stdlib int.rs/bool.rs)
_FN_ALIASES = {"int": "integer", "bool": "boolean"}


def _array_set(arr: Column, i: int, val: Column) -> Column:
    """VRL array index assignment with the reference's padding rules
    (expressions/assignment/indexing.vrl): positive overflow pads the
    tail with nulls; negative indexes count from the end and overflow
    pads (prepends to) the front."""
    size = F.size(arr)
    if i >= 0:
        replaced = F.transform(
            arr, lambda x, j: F.when(j == F.lit(i), val).otherwise(x)
        )
        padded = F.transform(
            F.sequence(F.lit(0), F.lit(i)),
            lambda j: F.when(
                j < size, F.element_at(arr, j.cast("int") + 1)
            ).when(j == F.lit(i), val),
        )
        return F.when(size > i, replaced).otherwise(padded)
    k = -i
    replaced = F.transform(
        arr, lambda x, j: F.when(j == size - k, val).otherwise(x)
    )
    n_new = F.lit(k) - size  # fresh leading slots
    padded = F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda j: F.when(j == 0, val).when(
            j >= n_new, F.element_at(arr, (j - n_new).cast("int") + 1)
        ),
    )
    return F.when(size >= k, replaced).otherwise(padded)


class Compiler:
    def __init__(self, env: Env, probe_spark=None):
        self.env = env
        # SparkSession for analysis probes: `??` must catch *type*
        # errors, which Spark raises at analysis time. Only safe when
        # expressions are self-contained (eval mode) — compile_vrl
        # plans reference real df columns and skip probing.
        self._spark = probe_spark
        # >0 while compiling a conditionally-executed region (if
        # branch with non-constant condition, closure body, ?? arm):
        # an `abort` there is data-dependent and stays out of the
        # compile subset; at depth 0 it is a static program exit
        self._branch_depth = 0
        # del() RETURNS the deleted value; the pre-delete py value /
        # shape is stashed per call site so `x = del(.a)` keeps
        # constant provenance (py_value is pure and runs after the
        # mutation already popped the env entries)
        self._del_returns: dict[int, tuple[bool, Any, Any]] = {}
        # closure calls whose per-element bodies all constant-folded
        # (same stash pattern: compile runs before provenance)
        self._closure_py: dict[int, Any] = {}
        # (known, value) of the most recent closure body's final
        # statement, set by _closure_body
        self._body_py: tuple[bool, Any] = (False, None)

    # ---- helpers ----

    def _event_key(self, path: Path) -> str:
        if any(isinstance(s, tuple) for s in path.segments):
            raise VrlCompileError(
                "dynamic path coalescing (out of scope; use vrl_interp)"
            )
        if not path.segments:
            return "."
        if len(path.segments) == 1 and isinstance(path.segments[0], str):
            return "." + path.segments[0]
        return "." + ".".join(str(s) for s in path.segments)

    def _top_fields(self) -> list[str]:
        return sorted(
            t for t in self.env.top if ("." + t) in self.env.bind
        )

    def _probe_ok(self, col: Column) -> bool:
        """Analysis-check a self-contained Column expression. True if
        it resolves (or probing is unavailable)."""
        if self._spark is None:
            return True
        try:
            self._spark.range(1).select(col).schema
            return True
        except Exception:
            return False

    def event_struct(self) -> Column:
        fields = self._top_fields()
        if not fields:
            return F.lit(None)
        return F.struct(*[self.env.bind["." + f].alias(f) for f in fields])

    def lookup_path(self, path: Path) -> Column:
        if not path.segments:
            if "." in self.env.py:
                # root replaced by a known array (multi-event shape)
                return _py_to_col(self.env.py["."])
            return self.event_struct()
        segs = path.segments

        def step(col: Column, sh, seg) -> tuple[Column, Any]:
            """One path step, shape-aware: a field statically absent
            from a struct shape resolves to null instead of failing
            analysis (structs are positional — getItem on a missing
            field is an AnalysisException, not a null)."""
            if isinstance(seg, tuple) and seg and seg[0] == "|":
                # static path coalescing on READ: first alternative
                # that resolves — value-level coalesce of the steps
                alts = [step(col, sh, a) for a in seg[1]]
                live = [
                    (c, s2) for c, s2 in alts if s2 is not _MISSING
                ]
                if not live:
                    return F.lit(None), None
                cols = [c for c, _ in live]
                out_sh = live[0][1] if len(live) == 1 else None
                return (
                    F.coalesce(*cols) if len(cols) > 1 else cols[0]
                ), out_sh
            if isinstance(seg, int):
                new_sh = sh[1] if (sh and sh[0] == "arr") else None
                return F.try_element_at(
                    col, F.lit(seg + 1 if seg >= 0 else seg)
                ), new_sh
            if sh and sh[0] == "obj" and seg not in sh[1]:
                return F.lit(None), _MISSING
            new_sh = sh[1].get(seg) if (sh and sh[0] == "obj") else None
            return col.getItem(seg), new_sh

        def walk(col: Column, sh, rest) -> Column:
            for seg in rest:
                col, sh = step(col, sh, seg)
                if sh is _MISSING:
                    return F.lit(None)
            return col

        if isinstance(segs[0], tuple) and segs[0] and segs[0][0] == "|":
            heads = [
                ("." + str(a))
                for a in segs[0][1]
                if ("." + str(a)) in self.env.bind
            ]
            if not heads:
                return F.lit(None)
            col = (
                F.coalesce(*[self.env.bind[h] for h in heads])
                if len(heads) > 1
                else self.env.bind[heads[0]]
            )
            sh = self.env.shape.get(heads[0]) if len(heads) == 1 else None
            return walk(col, sh, segs[1:])
        key = None
        if not any(isinstance(s, tuple) for s in segs):
            key = self._event_key(path)
        if key is not None and key in self.env.bind:
            return self.env.bind[key]
        # nested access into a bound parent (struct field / map key /
        # array index — getItem covers all three; coalesce segments
        # become value-level coalesces over the alternatives)
        head = "." + str(segs[0])
        if head in self.env.bind:
            return walk(
                self.env.bind[head], self.env.shape.get(head), segs[1:]
            )
        return F.lit(None)

    # ---- static knowledge: shapes + constant folding ----

    def infer_shape(self, node) -> Any:
        if isinstance(node, Obj):
            return ("obj", {k: self.infer_shape(v) for k, v in node.pairs})
        if isinstance(node, Arr):
            return (
                "arr",
                self.infer_shape(node.items[0]) if node.items else None,
            )
        if isinstance(node, Var):
            return self.env.shape.get(node.name)
        if isinstance(node, VarPath):
            sh = self.env.shape.get(node.name)
            for seg in node.segments:
                sh = _shape_step(sh, seg)
            return sh
        if isinstance(node, Path):
            if not node.segments:
                return (
                    "obj",
                    {
                        f: self.env.shape.get("." + f)
                        for f in self._top_fields()
                    },
                )
            sh = self.env.shape.get("." + str(node.segments[0]))
            for seg in node.segments[1:]:
                sh = _shape_step(sh, seg)
            return sh
        if isinstance(node, Bin):
            if node.op == "|":
                lt = self.infer_shape(node.left)
                rt = self.infer_shape(node.right)
                if lt and lt[0] == "obj" and rt and rt[0] == "obj":
                    d = dict(lt[1])
                    d.update(rt[1])
                    return ("obj", d)
                return None
            if node.op in ("getfield", "index"):
                return _shape_step(
                    self.infer_shape(node.left), node.right.value
                )
            if node.op == "??":
                return self.infer_shape(node.left) or self.infer_shape(
                    node.right
                )
            return None
        if isinstance(node, Call):
            if node.name in ("array", "object") and node.args:
                return self.infer_shape(node.args[0])
            if node.name in (
                "get_enrichment_table_record", "find_enrichment_table_records"
            ):
                tables = getattr(self.env, "enrichment_rows", None) or {}
                known, tname = self.py_value(node.args[0]) if node.args else (False, None)
                rows = tables.get(tname) if known else None
                if rows:
                    obj = ("obj", {c: None for c in rows[0].keys()})
                    return obj if node.name.startswith("get_") else ("arr", obj)
                return None
            if node.name == "parse_json" and node.args:
                pk, pv = self.py_value(node.args[0])
                if pk and isinstance(pv, str):
                    try:
                        return _shape_of_py(json.loads(pv))
                    except Exception:
                        return None
            if node.name == "del":
                rec = self._del_returns.get(id(node))
                if rec is not None:
                    return rec[2]
            if node.name == "compact" and node.args:
                sh = self.infer_shape(node.args[0])
                if sh and sh[0] == "obj":
                    kept = {}
                    for k, ksh in sh[1].items():
                        known, v = self.py_value(
                            Bin("getfield", node.args[0], Lit(k))
                        )
                        if known and v is None:
                            continue
                        kept[k] = ksh
                    return ("obj", kept)
                return sh
            if node.name in ("unique", "push", "append"):
                if node.args:
                    return self.infer_shape(node.args[0])
            if node.name == "del" and node.args and isinstance(
                node.args[0], Path
            ):
                return self.infer_shape(node.args[0])
            if node.name == "parse_common_log":
                return _CLF_SHAPE
            if node.name == "parse_syslog":
                return _SYSLOG_SHAPE
            if node.name == "merge" and len(node.args) == 2:
                return self.infer_shape(
                    Bin("|", node.args[0], node.args[1])
                )
            if node.name in ("set", "remove") and node.args:
                base = self.infer_shape(node.args[0])
                known, keys = self.py_value(node.args[1]) if len(
                    node.args
                ) > 1 else (False, None)
                if base and base[0] == "obj" and known and keys:
                    d = dict(base[1])
                    if node.name == "set":
                        d[keys[0]] = (
                            self.infer_shape(node.args[2])
                            if len(node.args) > 2
                            else None
                        )
                    else:
                        d.pop(keys[0], None)
                    return ("obj", d)
                return base
            # a call that constant-folds has the shape of its value
            # (parse_key_value on a literal, replace, join, ...)
            known, v = self._py_call(node)
            if known:
                return _shape_of_py(v)
            return None
        if isinstance(node, If):
            a = (
                self.infer_shape(node.then[-1]) if node.then else None
            )
            b = (
                self.infer_shape(node.orelse[-1]) if node.orelse else None
            )
            return a if a == b else None
        return None

    def _unnest_tdef(self, arg) -> dict | None:
        """Static type of unnest(arg) when arg is a variable query
        with string segments — mirrors the interpreter's type_def.rs
        flow (root with the path replaced by the element kind)."""
        from .vrl_interp import td_at, td_element, td_set

        segs: list | None = None
        base_td = None
        if isinstance(arg, VarPath):
            base_td = self.env.tdef.get(arg.name)
            segs = list(arg.segments)
        else:
            s: list = []
            n: Any = arg
            while isinstance(n, Bin) and n.op in ("getfield", "index"):
                if not isinstance(n.right, Lit):
                    return None
                s.insert(0, n.right.value)
                n = n.left
            if isinstance(n, Var) and s:
                base_td = self.env.tdef.get(n.name)
                segs = s
        if base_td is None or segs is None:
            return None
        try:
            arr_td = td_at(base_td, segs)
        except Exception:
            return None
        if not isinstance(arr_td, dict):
            return None
        elem = arr_td.get("array_unknown_exact")
        if elem is None:
            if "array" not in arr_td:
                return None
            elem = td_element(arr_td)
        new_root = td_set(base_td, segs, elem) if segs else elem
        return {"array": {}, "array_unknown_exact": new_root}

    def py_value(self, node):
        """Best-effort compile-time constant: (known, value)."""
        if isinstance(node, Lit):
            return True, node.value
        if isinstance(node, Regex):
            return True, node.pattern
        if isinstance(node, Un) and node.op == "-":
            known, v = self.py_value(node.operand)
            if known and isinstance(v, (int, float)):
                return True, -v
            return False, None
        if isinstance(node, Bin) and node.op == "??":
            # error-coalescing folds when the branch is decidable: a
            # provably-erroring left takes the fallback; a left that
            # folds to a concrete value cannot have errored
            if self._expr_static_error(node.left):
                return self.py_value(node.right)
            known, v = self.py_value(node.left)
            if known:
                return True, v
            return False, None
        if isinstance(node, Arr):
            out = []
            for item in node.items:
                known, v = self.py_value(item)
                if not known:
                    return False, None
                out.append(v)
            return True, out
        if isinstance(node, Obj):
            out = {}
            for k, v in node.pairs:
                known, pv = self.py_value(v)
                if not known:
                    return False, None
                out[k] = pv
            return True, out
        if isinstance(node, Var):
            if node.name in self.env.py:
                return True, self.env.py[node.name]
            if node.name in self.env.nodes:
                return self.py_value(self.env.nodes[node.name])
            return False, None
        if isinstance(node, Path):
            if not node.segments:
                # root replaced wholesale by a known value (the
                # `. = unnest(...)` multi-event corpus shape)
                if "." in self.env.py:
                    return True, self.env.py["."]
                # whole-event constant: known only when EVERY live top
                # field has a known compile-time value
                out = {}
                for f in self._top_fields():
                    if "." + f not in self.env.py:
                        return False, None
                    out[f] = self.env.py["." + f]
                return True, out
            if not any(isinstance(s, tuple) for s in node.segments):
                key = self._event_key(node)
                if key in self.env.py:
                    return True, self.env.py[key]
            head_seg = node.segments[0]
            if not isinstance(head_seg, tuple):
                head = "." + str(head_seg)
                if head in self.env.py and len(node.segments) > 1:
                    # the field's WHOLE value is known: a deep query
                    # resolves by walking it (missing/kind-mismatched
                    # segments yield null — VRL query semantics)
                    root = self.env.py[head]
                    rsegs = _py_resolve_segs(root, node.segments[1:])
                    if rsegs is None:
                        return True, None
                    return True, _py_query_value(root, rsegs)
            return False, None
        if isinstance(node, Un) and node.op == "!":
            known, v = self.py_value(node.operand)
            if known and isinstance(v, bool):
                return True, not v
            return False, None
        if isinstance(node, Bin):
            if node.op in ("getfield", "index"):
                known, parent = self.py_value(node.left)
                if known:
                    try:
                        return True, parent[node.right.value]
                    except Exception:
                        return False, None
                return False, None
            if node.op == "+":
                kl, lv = self.py_value(node.left)
                kr, rv = self.py_value(node.right)
                if kl and kr:
                    try:
                        return True, lv + rv
                    except Exception:
                        return False, None
                return False, None
            if node.op in ("==", "!="):
                kl, lv = self.py_value(node.left)
                kr, rv = self.py_value(node.right)
                if kl and kr:
                    eq = _strict_eq(lv, rv)
                    return True, (eq if node.op == "==" else not eq)
                # one side a known constant, the other provably null
                # at runtime (closed-event missing path): the
                # comparison decides statically — null equals only
                # null (value.rs PartialEq)
                if kl != kr:
                    known_v = lv if kl else rv
                    other = node.right if kl else node.left
                    if self._runtime_null(other):
                        eq = known_v is None
                        return True, (eq if node.op == "==" else not eq)
                return False, None
            if node.op == "*":
                kl, lv = self.py_value(node.left)
                kr, rv = self.py_value(node.right)
                # VRL string repetition (int * str in either order)
                if kl and kr and (
                    isinstance(lv, int) and isinstance(rv, str)
                    or isinstance(lv, str) and isinstance(rv, int)
                ) and not isinstance(lv, bool) and not isinstance(
                    rv, bool
                ):
                    return True, lv * rv
                return False, None
            if node.op == "|":
                # object merge (op.rs Merge): both sides known
                # objects fold to the right-biased shallow union
                kl, lv = self.py_value(node.left)
                kr, rv = self.py_value(node.right)
                if kl and kr and isinstance(lv, dict) and isinstance(
                    rv, dict
                ):
                    return True, {**lv, **rv}
                return False, None
            if node.op in ("&&", "||"):
                kl, lv = self.py_value(node.left)
                if not kl:
                    return False, None
                truthy = not (lv is None or lv is False)
                if node.op == "&&":
                    if not truthy:
                        return True, False
                    kr, rv = self.py_value(node.right)
                    # op.rs: AND demands boolean operands (null is
                    # falsy) — a known non-boolean right ERRORS at
                    # runtime, so it must not fold to a value
                    # (true && "foo" ?? "nope" takes the fallback)
                    if kr and isinstance(rv, bool):
                        return True, rv
                    if kr and rv is None:
                        return True, False
                    return False, None
                if truthy:
                    return True, lv
                return self.py_value(node.right)
            return False, None
        if isinstance(node, Call):
            return self._py_call(node)
        return False, None

    def _py_call(self, node: Call):
        """Constant-fold the function kernels that compile-time object
        iteration actually leans on (keys are Python strings)."""
        name = _FN_ALIASES.get(node.name, node.name)
        if name == "replace" and len(node.args) >= 3:
            ks = [self.py_value(a) for a in node.args[:3]]
            if all(k for k, _ in ks):
                v, pat, repl = (x for _, x in ks)
                if isinstance(node.args[1], Regex):
                    return True, re.sub(pat, repl, str(v))
                return True, str(v).replace(pat, repl)
        if name in ("upcase", "downcase") and node.args:
            known, v = self.py_value(node.args[0])
            if known and isinstance(v, str):
                return True, (
                    v.upper() if name == "upcase" else v.lower()
                )
        if name in ("push", "append") and len(node.args) == 2:
            ka, av = self.py_value(node.args[0])
            kb, bv = self.py_value(node.args[1])
            if ka and isinstance(av, list) and kb:
                if name == "push":
                    return True, av + [bv]
                if isinstance(bv, list):
                    return True, av + bv
        if name == "slice" and node.args:
            # slice.rs: arrays and strings, negative indices count
            # from the end (Python slicing semantics match)
            ka, av = self.py_value(node.args[0])
            start_n = (
                node.args[1] if len(node.args) > 1
                else node.kwargs.get("start")
            )
            end_n = (
                node.args[2] if len(node.args) > 2
                else node.kwargs.get("end")
            )
            ks, sv = (
                self.py_value(start_n) if start_n is not None
                else (True, 0)
            )
            ke, ev = (
                self.py_value(end_n) if end_n is not None
                else (True, None)
            )
            if (
                ka and ks and ke
                and isinstance(av, (list, str))
                and isinstance(sv, int) and not isinstance(sv, bool)
                and (
                    ev is None
                    or (isinstance(ev, int) and not isinstance(ev, bool))
                )
            ):
                return True, (av[sv:] if ev is None else av[sv:ev])
        if (
            name == "split"
            and len(node.args) == 2
            and not node.kwargs
            and not isinstance(node.args[1], Regex)
        ):
            ka, av = self.py_value(node.args[0])
            kb, bv = self.py_value(node.args[1])
            if ka and kb and isinstance(av, str) and isinstance(bv, str):
                return True, av.split(bv)
        if name == "join" and node.args:
            ka, av = self.py_value(node.args[0])
            sep_node = node.args[1] if len(node.args) > 1 else (
                node.kwargs.get("separator")
            )
            ks, sv = (
                self.py_value(sep_node) if sep_node is not None
                else (True, "")
            )
            if ka and isinstance(av, list) and ks and all(
                isinstance(x, str) for x in av
            ):
                return True, str(sv).join(av)
        if name == "includes" and len(node.args) == 2:
            ka, av = self.py_value(node.args[0])
            kb, bv = self.py_value(node.args[1])
            if ka and isinstance(av, list) and kb:
                return True, any(_strict_eq(x, bv) for x in av)
        if name == "contains" and len(node.args) >= 2:
            ka, av = self.py_value(node.args[0])
            kb, bv = self.py_value(node.args[1])
            cs_node = node.kwargs.get("case_sensitive")
            kc, cv = (
                self.py_value(cs_node) if cs_node is not None
                else (True, True)
            )
            if ka and kb and kc and isinstance(av, str) and isinstance(
                bv, str
            ):
                return True, (
                    bv in av if cv else bv.lower() in av.lower()
                )
        if name == "unnest" and len(node.args) == 1:
            # unnest.rs: one clone of the ROOT per element of the
            # array at the path; folds when the root value is fully
            # known at compile time (diagnostics/unnest_typedefs.vrl)
            arg = node.args[0]
            kr, root, segs = False, None, None
            if isinstance(arg, Path) and arg.segments:
                kr, root = self.py_value(Path([]))
                segs = arg.segments
            elif isinstance(arg, VarPath):
                kr, root = self.py_value(Var(arg.name))
                segs = arg.segments
            elif isinstance(arg, Bin):
                # variable queries parse as getfield/index/coalfield
                # chains over Var — unwind to (root var, segments)
                segs, n = [], arg
                while isinstance(n, Bin) and n.op in (
                    "getfield", "index", "coalfield"
                ):
                    segs.insert(
                        0,
                        ("|", n.right.value)
                        if n.op == "coalfield"
                        else n.right.value,
                    )
                    n = n.left
                if isinstance(n, Var):
                    kr, root = self.py_value(n)
                else:
                    segs = None
            if kr and segs:
                rsegs = _py_resolve_segs(root, segs)
                arr = (
                    _py_query_value(root, rsegs)
                    if rsegs is not None else None
                )
                if isinstance(arr, list):
                    import copy as _copy

                    out = []
                    for item in arr:
                        out.append(
                            _py_set_deep(
                                _copy.deepcopy(root),
                                rsegs,
                                _copy.deepcopy(item),
                            )
                        )
                    return True, out
        if name == "encode_json" and node.args:
            known, v = self.py_value(node.args[0])
            if known:
                return True, json.dumps(v, separators=(",", ":"))
        if (
            name == "parse_key_value"
            and len(node.args) == 1
            and not node.kwargs
        ):
            # default-delimiter KV on an unquoted literal folds to a
            # literal object (parse_key_value.rs defaults: ' ' field
            # sep, '=' kv sep) — lets `|=` merge it shape-known
            known, v = self.py_value(node.args[0])
            if (
                known
                and isinstance(v, str)
                and '"' not in v
                and "'" not in v
                and all("=" in p for p in v.split() if p)
                and v.strip()
            ):
                return True, {
                    p.split("=", 1)[0]: p.split("=", 1)[1]
                    for p in v.split()
                }
        if name == "type_def" and node.args:
            td = self.infer_tdef(node.args[0])
            if td is None and isinstance(node.args[0], Block):
                td = self._tdef_block_static(
                    node.args[0].stmts, dict(self.env.tdef)
                )
            if td is not None:
                return True, td
        if name == "to_string" and len(node.args) == 1:
            known, v = self.py_value(node.args[0])
            if known and isinstance(v, str):  # identity on strings
                return True, v
        if name == "del":
            rec = self._del_returns.get(id(node))
            if rec is not None and rec[0]:
                return True, rec[1]
        if name == "set" and len(node.args) == 3:
            kb, base = self.py_value(node.args[0])
            kk, keys = self.py_value(node.args[1])
            kv, val = self.py_value(node.args[2])
            if (
                kb and kk and kv
                and isinstance(base, dict)
                and isinstance(keys, list)
                and keys
                and all(isinstance(k, str) for k in keys)
            ):
                import copy as _copy

                out = _copy.deepcopy(base)
                cur = out
                for k in keys[:-1]:
                    nxt = cur.get(k)
                    if not isinstance(nxt, dict):
                        nxt = {}
                        cur[k] = nxt
                    cur = nxt
                cur[keys[-1]] = val
                return True, out
        if name == "parse_common_log" and node.args and not node.kwargs:
            known, v = self.py_value(node.args[0])
            if known and isinstance(v, str):
                parsed = _py_parse_common_log(v)
                if parsed is not None:  # only a SUCCESSFUL parse folds
                    return True, parsed
        if (
            name == "parse_aws_cloudwatch_log_subscription_message"
            and node.args
            and not node.kwargs
        ):
            known, v = self.py_value(node.args[0])
            if known and isinstance(v, str):
                parsed = _py_parse_aws_cloudwatch(v)
                if parsed is not None:
                    return True, parsed
        if id(node) in self._closure_py:
            # closure call whose per-element bodies all constant-
            # folded (stashed by _closure_over_literal_array — the
            # compile pass runs before the assignment's provenance
            # pass, same ordering contract as _del_returns)
            return True, self._closure_py[id(node)]
        if name.startswith("is_") and node.args:
            return self._py_is(name, node.args[0])
        return False, None

    def _py_is(self, name: str, arg):
        """Type predicates foldable from static shape/constants —
        Spark types are static, so these are compile-time facts."""
        sh = self.infer_shape(arg)
        known, v = self.py_value(arg)
        if name == "is_object":
            if sh and sh[0] == "obj":
                return True, True
            if known:
                return True, isinstance(v, dict)
            if sh and sh[0] == "arr":
                return True, False
            return False, None
        if name == "is_array":
            if sh and sh[0] == "arr":
                return True, True
            if known:
                return True, isinstance(v, list)
            if sh and sh[0] == "obj":
                return True, False
            return False, None
        if not known:
            return False, None
        if name == "is_string":
            return True, isinstance(v, str)
        if name == "is_boolean":
            return True, isinstance(v, bool)
        if name == "is_integer":
            return True, isinstance(v, int) and not isinstance(v, bool)
        if name == "is_float":
            return True, isinstance(v, float)
        if name == "is_null":
            return True, v is None
        if name == "is_nullish":
            return True, v is None or v == "" or v == "-"
        return False, None

    def infer_tdef(self, node):
        """Best-effort VRL type-def lattice (type_def.rs): a dict of
        {kind: True}. None = unknown. If-expressions union branches
        (+ null when a branch is missing) — matching the reference's
        type checker, which does NOT narrow on constant conditions."""
        if isinstance(node, Lit):
            v = node.value
            if v is None:
                return {"null": True}
            if isinstance(v, bool):
                return {"boolean": True}
            if isinstance(v, int):
                return {"integer": True}
            if isinstance(v, float):
                return {"float": True}
            if isinstance(v, str):
                return {"bytes": True}
            return None
        if isinstance(node, Var):
            return self.env.tdef.get(node.name)
        if isinstance(node, Path):
            if not node.segments:
                # root replaced wholesale (`. = unnest(...)`): the
                # assignment recorded the root's own tdef
                if "." in self.env.tdef:
                    return self.env.tdef["."]
                # type_def(.) — whole-event object tdef, buildable
                # once the program owns the event shape
                if not self.env.root_known:
                    return None
                fields = set(self.env.top) | {
                    k[1:] for k in self.env.tdef
                    if k.startswith(".") and "." not in k[1:]
                }
                out: dict[str, Any] = {}
                for f in sorted(fields):
                    ft = self.env.tdef.get("." + f)
                    if ft is None:
                        return None
                    out[f] = ft
                return {"object": out}
            key = self._event_key(node)
            if key in self.env.tdef:
                return self.env.tdef[key]  # dict, or None = unknown
            if key in self.env.deleted:
                return None
            if self.env.root_known and len(node.segments) == 1:
                # program-owned event, field known absent -> null
                if key not in self.env.bind:
                    return {"null": True}
                return None
            if key in self.env.bind or not self.env.root_known:
                # untouched external data types as any (type_def.rs:
                # external paths start at Kind::any)
                return {"any": True}
            return None
        if isinstance(node, Assign):
            return self.infer_tdef(node.expr)
        if isinstance(node, Obj):
            fields = {}
            for k, v in node.pairs:
                ft = self.infer_tdef(v)
                if ft is None:
                    return None
                fields[k] = ft
            return {"object": fields}
        if isinstance(node, Block):
            if _contains_abort(node):
                # static type-flow: abort = never, assignments update
                # a scratch scope, unreachable tails drop
                return self._tdef_block_static(
                    node.stmts, dict(self.env.tdef)
                )
            return self.infer_tdef(node.stmts[-1]) if node.stmts else None
        if isinstance(node, If):
            t = (
                self.infer_tdef(node.then[-1])
                if node.then
                else {"null": True}
            )
            e = (
                self.infer_tdef(node.orelse[-1])
                if node.orelse
                else {"null": True}
            )
            return _tdef_union(t, e)
        if isinstance(node, Bin):
            if node.op == "||":
                t = self.infer_tdef(node.left)
                e = self.infer_tdef(node.right)
                if t and e:
                    return {**t, **e}
                return t or e
            if node.op in ("==", "!=", "<", "<=", ">", ">=", "&&"):
                return {"boolean": True}
            if node.op == "|":
                # object merge: right-biased shallow field-map union
                lt = self.infer_tdef(node.left)
                rt = self.infer_tdef(node.right)
                if (
                    lt and rt
                    and set(lt) == {"object"} and set(rt) == {"object"}
                ):
                    return {"object": {**lt["object"], **rt["object"]}}
                return None
            return None
        if isinstance(node, TsLit):
            return {"timestamp": True}
        if isinstance(node, Call):
            name = _FN_ALIASES.get(node.name, node.name)
            if name == "get_metadata_field" and node.args:
                try:
                    segs = self._meta_path(node.args[0])
                except VrlCompileError:
                    return None
                cur = getattr(self, "_metadata", None)
                if cur is None:
                    return None
                for s in segs:
                    if not isinstance(cur, dict) or s not in cur:
                        return {"null": True}
                    cur = cur[s]
                return _tdef_of_py(cur)
            if name == "del" and node.args and isinstance(
                node.args[0], Path
            ):
                return self.env.tdef.get(self._event_key(node.args[0]))
            if name in ("now", "to_timestamp", "parse_timestamp",
                        "from_unix_timestamp"):
                return {"timestamp": True}
            if name == "parse_aws_cloudwatch_log_subscription_message":
                # exact static output shape — shared with the
                # interpreter's type-def lattice (type_def.rs)
                from .vrl_interp import _FN_TDEF

                return _FN_TDEF[name]
            if name == "unnest" and node.args:
                # type_def.rs: unnest(path) -> array whose element is
                # the root with the path replaced by the array's
                # element kind (closure_arg_kind corpus)
                td = self._unnest_tdef(node.args[0])
                if td is not None:
                    return td
            if name in (
                "sha1", "sha2", "sha3", "md5", "upcase", "downcase",
                "to_string", "encode_json", "join", "truncate",
                "strip_whitespace", "replace",
            ):
                return {"bytes": True}
            if name in ("strlen", "length", "to_int", "parse_int"):
                return {"integer": True}
            if name in ("to_float",):
                return {"float": True}
            if name.startswith("is_") or name in ("exists", "includes",
                                                  "contains", "match"):
                return {"boolean": True}
            return None
        return None

    def native_value(self, node) -> Any:
        known, v = self.py_value(node)
        if known:
            return v
        raise VrlCompileError(
            f"argument must be a literal for this function: {node}"
        )

    # ---- static type-flow for type_def() over abort-bearing blocks ----

    def _tdef_block_static(self, stmts, scope: dict):
        """Static type-flow of a statement block for type_def()
        (type_def.rs): `abort` types as `never` (the lattice bottom),
        a sequence is never from its first never statement on (the
        rest is unreachable), and variable assignments update a
        scratch scope so the final expression sees branch-merged
        types. The reference checker does NO reachability or
        constant-condition pruning — `if false {abort} else {x = 3}`
        still contributes BOTH branch exits to x's type
        (vrl/tests expressions/abort/abort_typedef.vrl)."""
        last: Any = {"null": True}
        for s in stmts:
            last = self._tdef_node_static(s, scope)
            if last is None:
                return None
            if last == {"never": True}:
                return {"never": True}
        return last

    def _tdef_node_static(self, node, scope: dict):
        if isinstance(node, Abort):
            return {"never": True}
        if isinstance(node, Block):
            inner = scope if node.paren else dict(scope)
            return self._tdef_block_static(node.stmts, inner)
        if isinstance(node, Assign) and isinstance(node.target, Var):
            t = self._tdef_node_static(node.expr, scope)
            if t is not None:
                scope[node.target.name] = t
            return t
        if isinstance(node, If):
            ts, es = dict(scope), dict(scope)
            t = (
                self._tdef_block_static(node.then, ts)
                if node.then
                else {"null": True}
            )
            e = (
                self._tdef_block_static(node.orelse, es)
                if node.orelse
                else {"null": True}
            )
            # merge variable types from BOTH branch exits (an
            # aborting branch still contributes its entry state)
            for k in set(ts) | set(es):
                a, b = ts.get(k), es.get(k)
                scope[k] = _tdef_union(a, b) if (a and b) else (a or b)
            if t is None or e is None:
                return None
            return _tdef_union(t, e)
        if isinstance(node, Bin) and node.op == "|":
            lt = self._tdef_node_static(node.left, scope)
            rt = self._tdef_node_static(node.right, scope)
            if lt is None or rt is None:
                return None
            if rt == {"never": True}:
                return lt
            if lt == {"never": True}:
                return rt
            return self.infer_tdef(node)
        if isinstance(node, Var):
            return scope.get(node.name) or self.infer_tdef(node)
        return self.infer_tdef(node)

    # ---- structured update helpers ----

    def _set_in(self, base: Column, segs: list, val: Column) -> Column:
        seg = segs[0]
        if isinstance(seg, str):
            # withField parses dots as nesting; backtick literal names
            ref = f"`{seg}`" if "." in seg else seg
            if len(segs) == 1:
                return base.withField(ref, val)
            return base.withField(
                ref, self._set_in(base.getField(seg), segs[1:], val)
            )
        if len(segs) > 1:
            elem = F.element_at(base, seg + 1 if seg >= 0 else seg)
            val = self._set_in(elem, segs[1:], val)
        return _array_set(base, seg, val)

    def _fresh_container(self, segs: list, val: Column) -> Column:
        for seg in reversed(segs):
            if isinstance(seg, str):
                val = F.struct(val.alias(seg))
            else:
                val = _array_set(F.array(), seg, val)
        return val

    def _shape_set(self, sh, segs: list, leaf):
        if not segs:
            return leaf
        seg = segs[0]
        if isinstance(seg, str):
            d = dict(sh[1]) if sh and sh[0] == "obj" else {}
            d[seg] = self._shape_set(d.get(seg), segs[1:], leaf)
            return ("obj", d)
        return ("arr", None)

    def _resolve_coalesce_segs(self, segs, head_shape=None, event=True):
        """Statically resolve `(a | b)` coalesce segments in an
        ASSIGNMENT path: the reference overwrites the first
        alternative that exists, else materializes the LAST one
        (expressions/assignment/read_only_coalesce_allowed.vrl,
        single_external_complex.vrl). Existence is judged from the
        compile-time env/shape — exactly what the subset knows."""
        out = []
        sh = head_shape
        for i, s in enumerate(segs):
            if isinstance(s, tuple) and s and s[0] == "|":
                alts = s[1]
                pick = None
                if i == 0 and event:
                    for a in alts:
                        key = "." + str(a)
                        if key in self.env.bind and key not in self.env.deleted:
                            pick = a
                            break
                elif sh and isinstance(sh, tuple) and sh[0] == "obj":
                    for a in alts:
                        if a in sh[1]:
                            pick = a
                            break
                s = pick if pick is not None else alts[-1]
            out.append(s)
            if i == 0 and event:
                sh = self.env.shape.get("." + str(s))
            elif sh and isinstance(sh, tuple):
                if sh[0] == "obj" and isinstance(s, str):
                    sh = sh[1].get(s)
                elif sh[0] == "arr":
                    sh = sh[1]
                else:
                    sh = None
        return out

    _MUTATING_FNS = frozenset(
        {"del", "set_metadata_field", "remove_metadata_field"}
    )

    def _pure_node(self, node) -> bool:
        """True when re-compiling the node is side-effect free (no
        env mutation, no closure execution) — the guard that lets
        `_elems_of_node` compile element expressions a second time."""
        if isinstance(node, (Lit, TsLit, Regex, Var, Path, VarPath)):
            return True
        if isinstance(node, Arr):
            return all(self._pure_node(i) for i in node.items)
        if isinstance(node, Obj):
            return all(self._pure_node(v) for _, v in node.pairs)
        if isinstance(node, Un):
            return self._pure_node(node.operand)
        if isinstance(node, Bin):
            return self._pure_node(node.left) and self._pure_node(node.right)
        if isinstance(node, Call):
            name = _FN_ALIASES.get(node.name, node.name).rstrip("!")
            if name in self._MUTATING_FNS or node.closure is not None:
                return False
            return all(
                self._pure_node(a)
                for a in list(node.args) + list(node.kwargs.values())
            )
        return False

    def _elems_of_node(self, node) -> list[tuple[Column, Any]] | None:
        """Per-element (Column, shape) list of an array-valued
        expression with statically-known element count: array
        literals, variables that already carry an element list, and
        push/append chains over them. None when unknown. VRL arrays
        are heterogeneous (lib/vrl/compiler/src/value/kind.rs); Spark
        arrays are not — the element list preserves native per-element
        types where a single array Column would coerce to strings."""
        if isinstance(node, Arr):
            if not all(self._pure_node(i) for i in node.items):
                return None
            return [
                (self.compile(i), self.infer_shape(i)) for i in node.items
            ]
        if isinstance(node, Var):
            cur = self.env.elems.get(node.name)
            return list(cur) if cur is not None else None
        if isinstance(node, Call) and not node.kwargs:
            name = _FN_ALIASES.get(node.name, node.name).rstrip("!")
            if name == "push" and len(node.args) == 2:
                base = self._elems_of_node(node.args[0])
                if base is None or not self._pure_node(node.args[1]):
                    return None
                return base + [
                    (
                        self.compile(node.args[1]),
                        self.infer_shape(node.args[1]),
                    )
                ]
            if name == "append" and len(node.args) == 2:
                base = self._elems_of_node(node.args[0])
                tail = self._elems_of_node(node.args[1])
                if base is None or tail is None:
                    return None
                return base + tail
        return None

    def assign_target(self, target, col: Column, shape=None, pynode=None):
        sparse = getattr(self.env, "sparse_cols", None)
        if sparse is not None and isinstance(target, Path) and target.segments:
            sparse.discard("." + str(target.segments[0]))
        known, pv = (
            self.py_value(pynode) if pynode is not None else (False, None)
        )
        tdef = self.infer_tdef(pynode) if pynode is not None else None
        if isinstance(target, Var):
            self.env.bind[target.name] = col
            self.env.shape[target.name] = shape
            # None is the explicit "assigned, type unknown" sentinel
            # (absent = never touched = external any)
            self.env.tdef[target.name] = tdef
            if known:
                self.env.py[target.name] = pv
            else:
                self.env.py.pop(target.name, None)
            if pynode is not None and isinstance(pynode, (Arr, Obj)):
                self.env.nodes[target.name] = pynode
            else:
                self.env.nodes.pop(target.name, None)
            el = (
                self._elems_of_node(pynode) if pynode is not None else None
            )
            if el is not None:
                self.env.elems[target.name] = el
            else:
                self.env.elems.pop(target.name, None)
            return
        if isinstance(target, VarPath):
            if any(isinstance(s, tuple) for s in target.segments):
                target = VarPath(
                    target.name,
                    self._resolve_coalesce_segs(
                        target.segments,
                        head_shape=self.env.shape.get(target.name),
                        event=False,
                    ),
                )
            base = self.env.bind.get(target.name)
            if base is None:
                self.env.bind[target.name] = self._fresh_container(
                    target.segments, col
                )
                self.env.shape[target.name] = self._shape_set(
                    None, target.segments, shape
                )
            else:
                self.env.bind[target.name] = self._set_in(
                    base, target.segments, col
                )
                self.env.shape[target.name] = self._shape_set(
                    self.env.shape.get(target.name), target.segments, shape
                )
            # deep py provenance (same rule as event paths)
            if known and (
                base is None or target.name in self.env.py
            ) and all(
                isinstance(s, str) or (isinstance(s, int) and s >= 0)
                for s in target.segments
            ):
                self.env.py[target.name] = _py_set_deep(
                    self.env.py.get(target.name)
                    if base is not None else None,
                    target.segments,
                    pv,
                )
            else:
                self.env.py.pop(target.name, None)
            self.env.nodes.pop(target.name, None)
            self.env.elems.pop(target.name, None)
            return
        if isinstance(target, Path):
            segs = target.segments
            if any(isinstance(s, tuple) for s in segs):
                segs = self._resolve_coalesce_segs(segs)
            if not segs:
                # '. = expr' replaces the event: the program now owns
                # the full shape (missing fields are known-absent)
                for t in list(self.env.top):
                    self.env.bind.pop("." + t, None)
                    self.env.shape.pop("." + t, None)
                    self.env.py.pop("." + t, None)
                    self.env.tdef.pop("." + t, None)
                self.env.top = set()
                self.env.root_known = True
                self.env.py.pop(".", None)
                self.env.tdef.pop(".", None)
                if known and isinstance(pv, list) and (
                    self._spark is not None
                ):
                    # root replaced by a known ARRAY (`. = unnest(..)`
                    # / folded map over it): multi-event expansion —
                    # carried as whole-root provenance, read back by
                    # lookup_path/py_value root branches. Eval/REPL
                    # mode only: a production remap (compile_vrl)
                    # must emit N EVENTS, which is the interpreter
                    # tier's explode — falling through raises there.
                    self.env.py["."] = pv
                    self.env.tdef["."] = tdef
                    return
                if pynode is not None and isinstance(pynode, Obj):
                    for k, v in pynode.pairs:
                        self.assign_target(
                            Path([k]),
                            self.compile(v),
                            self.infer_shape(v),
                            pynode=v,
                        )
                elif shape and shape[0] == "obj":
                    for k, ksh in shape[1].items():
                        self.env.bind["." + k] = col.getItem(k)
                        self.env.shape["." + k] = ksh
                        self.env.top.add(k)
                elif pynode is not None and isinstance(pynode, Lit) and not isinstance(
                    pynode.value, (dict, list)
                ):
                    # '. = scalar' wraps under the message key
                    # (LogEvent::from(Value) — remap root-scalar)
                    self.assign_target(Path(["message"]), col, shape, pynode=pynode)
                else:
                    raise VrlCompileError(
                        "assigning a non-object to '.' needs a known "
                        "object shape"
                    )
                return
            head = "." + str(segs[0])
            # a field write invalidates whole-root array provenance
            self.env.py.pop(".", None)
            self.env.tdef.pop(".", None)
            if len(segs) == 1:
                self.env.bind[head] = col
                self.env.shape[head] = shape
                self.env.deleted.discard(head)
                self.env.top.add(str(segs[0]))
                self.env.tdef[head] = tdef  # None = assigned, unknown
                if known:
                    self.env.py[head] = pv
                else:
                    self.env.py.pop(head, None)
                return
            base = self.env.bind.get(head)
            if base is None:
                self.env.bind[head] = self._fresh_container(segs[1:], col)
                self.env.shape[head] = self._shape_set(
                    None, segs[1:], shape
                )
            else:
                self.env.bind[head] = self._set_in(base, segs[1:], col)
                self.env.shape[head] = self._shape_set(
                    self.env.shape.get(head), segs[1:], shape
                )
            self.env.deleted.discard(head)
            self.env.top.add(str(segs[0]))
            # deep py provenance: a known value written into a base
            # whose py state is itself known (or fresh) keeps the
            # whole field constant-foldable (unnest/typedef corpus)
            if known and (base is None or head in self.env.py) and all(
                isinstance(s, str) or (isinstance(s, int) and s >= 0)
                for s in segs[1:]
            ):
                self.env.py[head] = _py_set_deep(
                    self.env.py.get(head) if base is not None else None,
                    segs[1:],
                    pv,
                )
            else:
                self.env.py.pop(head, None)
            self.env.tdef[head] = None  # assigned through, unknown
            return
        raise VrlCompileError(f"bad assignment target {target!r}")

    def _target_expr(self, target):
        if isinstance(target, Var):
            return target
        if isinstance(target, VarPath):
            node: Any = Var(target.name)
            for seg in target.segments:
                node = Bin(
                    "index" if isinstance(seg, int) else "getfield",
                    node,
                    Lit(seg),
                )
            return node
        return target

    def _obj_fields(self, node, col: Column, shape) -> dict[str, Column]:
        """Field name -> Column for an object-valued expression."""
        if isinstance(node, Obj):
            return {k: self.compile(v) for k, v in node.pairs}
        if isinstance(node, Path) and not node.segments:
            return {
                f: self.env.bind["." + f] for f in self._top_fields()
            }
        if shape and shape[0] == "obj":
            return {k: col.getItem(k) for k in shape[1]}
        raise VrlCompileError(
            "object operation needs an object literal, the event, or a "
            "known object shape"
        )

    # ---- expression compilation ----

    def compile(self, node) -> Column:
        if isinstance(node, Lit):
            if isinstance(node.value, (dict, list)):
                return _py_to_col(node.value)
            return F.lit(node.value)
        if isinstance(node, TsLit):
            return F.to_timestamp(F.lit(node.text))
        if isinstance(node, Regex):
            return F.lit(node.pattern)
        if isinstance(node, Path):
            return self.lookup_path(node)
        if isinstance(node, Var):
            if node.name in self.env.bind:
                return self.env.bind[node.name]
            raise VrlCompileError(f"undefined variable {node.name!r}")
        if isinstance(node, VarPath):
            return self.compile(self._target_expr(node))
        if isinstance(node, Arr):
            if not node.items:
                return F.array()
            items = [self.compile(i) for i in node.items]
            arr = F.array(*items)
            if len(items) > 1 and not self._probe_ok(arr):
                # first try typing statically-null elements as the
                # first non-null element's type (F.when(false, c) is
                # a typed NULL) — [., err] with err null stays a real
                # struct array instead of degrading to strings
                null_idx = [
                    i for i, it in enumerate(node.items)
                    if self.py_value(it) == (True, None)
                ]
                if null_idx and len(null_idx) < len(items):
                    donor = next(
                        c for i, c in enumerate(items) if i not in null_idx
                    )
                    typed = [
                        F.when(F.lit(False), donor) if i in null_idx else c
                        for i, c in enumerate(items)
                    ]
                    retyped = F.array(*typed)
                    if self._probe_ok(retyped):
                        return retyped
                # heterogeneous literal array: VRL arrays mix types,
                # Spark's can't — coerce every element to its string
                # rendering (documented divergence the golden harness
                # accepts) instead of failing analysis
                coerced = F.array(*[c.cast("string") for c in items])
                if self._probe_ok(coerced):
                    return coerced
            return arr
        if isinstance(node, Obj):
            if not node.pairs:
                return F.struct()  # struct<> — withField-able
            return F.struct(
                *[self.compile(v).alias(k) for k, v in node.pairs]
            )
        if isinstance(node, Un):
            c = self.compile(node.operand)
            return (~c) if node.op == "!" else (-c)
        if isinstance(node, Bin):
            return self.compile_bin(node)
        if isinstance(node, Call):
            return self.compile_call(node)
        if isinstance(node, Block):
            val = None
            for s in node.stmts:
                val = self.exec_stmt(s)
            return val if val is not None else F.lit(None)
        if isinstance(node, If):
            # constant condition: execute only the taken branch, so
            # branch-local deletes/renames really happen (a merged
            # when() can only null a field, never drop it)
            kc, cv = self.py_value(node.cond)
            if kc and (isinstance(cv, bool) or cv is None):
                branch = node.then if cv is True else node.orelse
                other = node.orelse if cv is True else node.then
                pre = self.env.fork()
                val = None
                for s in branch:
                    val = self.exec_stmt(s)
                # the reference type checker does NOT narrow on
                # constant conditions: type-infer the untaken branch
                # on a fork of the pre-state and union its tdefs in
                # (values/bindings stay from the taken branch only)
                if other:
                    try:
                        other_env, _ = self.run_block(other, pre)
                    except Exception:  # noqa: BLE001 — best-effort types
                        other_env = None
                else:
                    # absent branch = event passes through unchanged:
                    # its tdef contribution is the pre-state itself
                    other_env = pre
                if other_env is not None:
                    self.env.tdef = self._union_branch_tdefs(
                        self.env, other_env
                    )
                return val if val is not None else F.lit(None)
            cond = self.compile(node.cond)
            then_env, then_val = self.run_block(node.then, self.env.fork())
            else_env, else_val = self.run_block(node.orelse, self.env.fork())
            self.merge_branches(cond, then_env, else_env)
            if then_val is None and else_val is None:
                return F.lit(None)
            tv = then_val if then_val is not None else F.lit(None)
            ev = else_val if else_val is not None else F.lit(None)
            out = F.when(F.coalesce(cond, F.lit(False)), tv).otherwise(ev)
            if not self._probe_ok(out):
                # branch values of different VRL types (string vs
                # bool, ...): carry both as strings rather than fail
                # analysis — the documented rendering divergence
                coerced = F.when(
                    F.coalesce(cond, F.lit(False)), tv.cast("string")
                ).otherwise(ev.cast("string"))
                if self._probe_ok(coerced):
                    return coerced
            return out
        if isinstance(node, Abort):
            if self._branch_depth == 0:
                raise VrlStaticAbort()
            raise VrlCompileError("abort (out of scope; use vrl_interp)")
        raise VrlCompileError(f"cannot compile node {node!r}")

    def _stmt_static_error(self, stmt) -> bool:
        """True when a statement is a fallible call with literal
        arguments that provably errors at runtime (so a `??` over the
        enclosing block must take the fallback)."""
        if (
            isinstance(stmt, Call)
            and stmt.name == "parse_json"  # non-! form propagates
            and stmt.args
        ):
            pk, pv = self.py_value(stmt.args[0])
            if pk and isinstance(pv, str):
                try:
                    json.loads(pv)
                except ValueError:
                    return True
        return False

    def _runtime_null(self, node) -> bool:
        """True when the node's RUNTIME value is provably null: a
        statically-null type, a known-None constant, or (under a
        closed event, eval_vrl) an event path never bound nor
        assigned."""
        if self.infer_tdef(node) == {"null": True}:
            return True
        known, v = self.py_value(node)
        if known and v is None:
            return True
        if (
            isinstance(node, Path)
            and node.segments
            and self.env.event_closed
        ):
            key = self._event_key(node)
            return key not in self.env.bind and key not in self.env.tdef
        return False

    def _static_fallible_call_error(self, expr) -> str | None:
        """The reference's diagnostic string for a fallible call whose
        argument PROVABLY has the wrong kind at runtime — e.g.
        `upcase(.thing)` under a closed event with no `.thing`
        (vrl/tests expressions/query/function_call_error.vrl). Walks
        through any query applied to the call result (the call errors
        before the query runs). Returns None when not provable."""
        node = expr
        while isinstance(node, Bin) and node.op in (
            "getfield", "index", "coalfield"
        ):
            node = node.left
        if not isinstance(node, Call) or node.infallible:
            return None
        name = _FN_ALIASES.get(node.name, node.name)
        if name in ("upcase", "downcase") and node.args and (
            self._runtime_null(node.args[0])
        ):
            s, e = node.span or (0, 0)
            return (
                f'function call error for "{name}" at ({s}:{e}): '
                f"expected string, got null"
            )
        return None

    def _expr_static_error(self, node) -> bool:
        """True when an expression subtree PROVABLY errors at runtime
        — e.g. length() of a statically-null operand (length.rs only
        accepts array/object/string) or parse_json of an invalid
        literal. Used by `??` to take the fallback: our null-based
        error model can't distinguish error-null from value-null, so
        comparisons like `length(.unset) == length(.unset2)` would
        otherwise compare as values instead of erroring. Conservative:
        an inner `??` already recovers its left side, and `&&`/`||`
        right sides may be short-circuited away, so neither is
        walked."""
        if isinstance(node, Call):
            if self._stmt_static_error(node):
                return True
            name = _FN_ALIASES.get(node.name, node.name)
            if (
                name == "length"
                and not node.name.endswith("!")
                and node.args
                and self._runtime_null(node.args[0])
            ):
                return True
            # typed-argument fallibility on a statically-known value
            # (progressive type checking, vrl/tests internal/
            # progressive_type_checking.vrl): upcase/downcase demand
            # a string, push/append an array, slice array-or-string.
            # `!` forms abort instead of erroring — out of scope here.
            if not node.infallible and node.args:
                expect = {
                    "upcase": str, "downcase": str,
                    "push": list, "append": list,
                    "slice": (list, str),
                }.get(name)
                if expect is not None:
                    known, v = self.py_value(node.args[0])
                    if known and (
                        isinstance(v, bool) or not isinstance(v, expect)
                    ):
                        return True
            return any(
                self._expr_static_error(a) for a in node.args
            ) or any(
                self._expr_static_error(v)
                for v in node.kwargs.values()
            )
        if isinstance(node, Bin):
            if node.op == "??":
                return self._expr_static_error(node.right)
            if node.op in ("&&", "||"):
                return self._expr_static_error(node.left)
            return self._expr_static_error(
                node.left
            ) or self._expr_static_error(node.right)
        if isinstance(node, Un):
            return self._expr_static_error(node.operand)
        if isinstance(node, Arr):
            return any(self._expr_static_error(x) for x in node.items)
        if isinstance(node, Obj):
            return any(
                self._expr_static_error(v) for _, v in node.pairs
            )
        return False

    def compile_bin(self, node: Bin) -> Column:
        if node.op == "|":
            # merge of two compile-time-known objects stays a typed
            # literal (heterogeneous field values survive as struct
            # fields instead of string-unifying)
            known, v = self.py_value(node)
            if known:
                return _py_to_col(v)
        if node.op in ("getfield", "index"):
            # constant fold BEFORE compiling the base: indexing a
            # known collection keeps heterogeneous elements typed
            # (e.g. [0, {"bar": 2}][1].bar) where the compiled base
            # would be a string-coerced array column
            known, v = self.py_value(node)
            if known:
                return _py_to_col(v)
        if node.op == "??":
            # a provable runtime error anywhere in the left operand
            # (length(null), invalid literal parse_json) forces the
            # fallback — VRL fallibility is the ERROR channel, which
            # Spark's null-propagating expressions can't carry
            if self._expr_static_error(node.left):
                return self.compile(node.right)
            # a left that folds to a concrete value cannot error —
            # the fallback is dead, and compiling the fold keeps the
            # value's native type (progressive_type_checking: the
            # string-unification escape below would stringify it)
            pk, pv = self.py_value(node.left)
            if pk:
                if isinstance(pv, (dict, list)):
                    return self.compile(_node_of_py(pv))
                return _py_to_col(pv)
            # constant fold: a literal-argument fallible call decides
            # the branch at compile time (parse_json("...") ?? x)
            if (
                isinstance(node.left, Call)
                and node.left.name.rstrip("!") == "parse_json"
                and node.left.args
            ):
                pk, pv = self.py_value(node.left.args[0])
                if pk and isinstance(pv, str):
                    try:
                        json.loads(pv)
                        return self.compile(node.left)
                    except ValueError:
                        return self.compile(node.right)
            # a BLOCK is fallible if ANY statement errors, not just
            # its value ({ parse_json("invalid"); 2 } ?? 1 -> 1) —
            # decide statically-failing literal calls at compile time
            if isinstance(node.left, Block) and any(
                self._stmt_static_error(s) for s in node.left.stmts
            ):
                return self.compile(node.right)
            # VRL ?? catches errors; Spark raises type errors at
            # analysis time, so probe the left plan and fall back.
            # Either arm is a conditionally-taken region (abort there
            # is data-dependent, not a static exit).
            self._branch_depth += 1
            try:
                left = self.compile(node.left)
            except VrlCompileError:
                left = None
            finally:
                self._branch_depth -= 1
            if left is None:
                return self.compile(node.right)
            right = self.compile(node.right)
            combined = F.coalesce(left, right)
            if self._probe_ok(combined):
                return combined
            if not self._probe_ok(left):
                return right
            # both sides resolve but their types don't unify (e.g.
            # ends_with(...) ?? "nope"): VRL values are heterogeneous,
            # Spark columns aren't — carry BOTH through as strings
            # (documented string-rendering divergence) rather than
            # silently dropping the fallback
            if self._probe_ok(right):
                both = F.coalesce(
                    left.cast("string"), right.cast("string")
                )
                if self._probe_ok(both):
                    return both
            return left
        if node.op == "|":
            return self.compile_merge(node.left, node.right)
        if node.op == "coalfield":
            # `expr.(a | b)` path coalescing: statically resolvable
            # when the object shape is known — first EXISTING field
            # wins (query/mod.rs coalesce semantics), else null
            sh = self.infer_shape(node.left)
            left = self.compile(node.left)
            if sh and sh[0] == "obj":
                for alt in node.right.value:
                    if alt in sh[1]:
                        self._last_shape = sh[1].get(alt)
                        return left.getItem(alt)
                return F.lit(None)
            raise VrlCompileError(
                "dynamic path coalescing (out of scope; use vrl_interp)"
            )
        if node.op in ("==", "!="):
            kl, lv = self.py_value(node.left)
            kr, rv = self.py_value(node.right)
            if kl and kr:
                eq = _strict_eq(lv, rv)
                return F.lit(eq if node.op == "==" else not eq)
        if node.op == "&&":
            # VRL `&&` operands must be boolean (or null): a
            # statically non-boolean side is a fallible type error the
            # surrounding ?? recovers from (expressions/logical/and.vrl).
            # `||` is different — it takes the first TRUTHY value of
            # any type, so no such check there.
            for side in (node.left, node.right):
                ks, sv = self.py_value(side)
                if ks and sv is not None and not isinstance(sv, bool):
                    raise VrlCompileError("non-boolean operand to &&")
                td = self.infer_tdef(side)
                if td is not None and td and not (
                    td.get("boolean") or td.get("null") or td.get("any")
                ):
                    raise VrlCompileError("non-boolean operand to &&")
        if node.op in ("&&", "||"):
            kl, lv = self.py_value(node.left)
            if kl:
                truthy = not (lv is None or lv is False)
                if node.op == "&&":
                    return (
                        self.compile(node.right)
                        if truthy
                        else F.lit(False)
                    )
                return (
                    self.compile(node.left)
                    if truthy
                    else self.compile(node.right)
                )
        if node.op == "+":
            kl, lv = self.py_value(node.left)
            kr, rv = self.py_value(node.right)
            if kl and kr and isinstance(lv, str) and isinstance(rv, str):
                return F.lit(lv + rv)
            left, right = self.compile(node.left), self.compile(node.right)
            # string concat when a side is statically a string; VRL
            # treats null + "s" as "s" (concat_ws skips nulls)
            if (
                _is_str(node.left)
                or _is_str(node.right)
                or self.infer_tdef(node.left) == {"bytes": True}
                or self.infer_tdef(node.right) == {"bytes": True}
            ):
                return F.concat_ws("", left, right)
            return left + right
        if node.op == "*":
            kl, lv = self.py_value(node.left)
            kr, rv = self.py_value(node.right)
            # VRL int * string repeats the string
            if kl and kr and isinstance(lv, int) and isinstance(rv, str):
                return F.lit(rv * lv)
            if kl and kr and isinstance(lv, str) and isinstance(rv, int):
                return F.lit(lv * rv)
        left, right = self.compile(node.left), self.compile(node.right)
        if node.op == "-":
            return left - right
        if node.op == "*":
            return left * right
        if node.op == "/":
            # try_divide: identical to `/` with ANSI off (null on a
            # zero divisor) but does NOT abort the job when the
            # session runs Spark 4's default ANSI mode — fallible
            # arithmetic must fail-to-null for ?? / ok,err capture
            return F.try_divide(left, right)
        if node.op == "%":
            return F.try_mod(left, right)
        if node.op == "==":
            return left.eqNullSafe(right)
        if node.op == "!=":
            return ~left.eqNullSafe(right)
        if node.op == "<":
            return left < right
        if node.op == "<=":
            return left <= right
        if node.op == ">":
            return left > right
        if node.op == ">=":
            return left >= right
        if node.op == "&&":
            if isinstance(node.left, Lit) and node.left.value is None:
                left = left.cast("boolean")
            if isinstance(node.right, Lit) and node.right.value is None:
                right = right.cast("boolean")
            return left & right
        if node.op == "||":
            # VRL || is value-or: left when truthy, else right. ONLY
            # false and null are falsy (integer 0 and the string
            # "false" are truthy) — a blanket try_cast('boolean')
            # would treat 0/'false'/'no' as falsy. Use the inferred
            # type: a value that cannot be boolean is truthy iff
            # non-null.
            td = self.infer_tdef(node.left)
            can_be_bool = td is None or td.get("boolean")
            if can_be_bool:
                truthy = F.coalesce(
                    left.try_cast("boolean"), left.isNotNull()
                )
            else:
                truthy = left.isNotNull()
            return F.when(truthy, left).otherwise(right)
        if node.op == "index":
            i = node.right.value
            return F.try_element_at(
                left, F.lit(i + 1 if i >= 0 else i)
            )
        if node.op == "getfield":
            return left.getItem(node.right.value)
        raise VrlCompileError(f"operator {node.op!r} unsupported")

    def compile_merge(self, lnode, rnode) -> Column:
        """`a | b` object merge (merge.rs): shallow, right-biased.
        Spark structs are positional, so the merged struct is rebuilt
        from the statically-known field sets."""
        lsh = self.infer_shape(lnode)
        rsh = self.infer_shape(rnode)
        if not (lsh and lsh[0] == "obj" and rsh and rsh[0] == "obj"):
            raise VrlCompileError(
                "merge '|' needs object shapes known at compile time"
            )
        lcol = self.compile(lnode)
        rcol = self.compile(rnode)
        lf = self._obj_fields(lnode, lcol, lsh)
        rf = self._obj_fields(rnode, rcol, rsh)
        merged = dict(lf)
        merged.update(rf)
        if not merged:
            return F.lit(None)
        return F.struct(*[c.alias(k) for k, c in merged.items()])

    def compile_call(self, node: Call) -> Column:
        from vector_spark.vrl import FUNCTIONS

        name = _FN_ALIASES.get(node.name, node.name)
        if node.closure is not None:
            return self.compile_closure_call(node)
        if name in (
            "slice", "parse_aws_cloudwatch_log_subscription_message"
        ):
            # slice.rs dispatches on the VALUE's runtime kind (array
            # vs string); the native registry kernel is string-typed,
            # so a statically-known collection folds here instead.
            # The CloudWatch parser's registry entry is DataFrame-
            # level — the Column tier only exists as this fold.
            known, v = self.py_value(node)
            if known:
                return _py_to_col(v)
        if name == "unnest":
            # cardinality-per-ROOT-clone semantics only fold for
            # statically-known roots; the DataFrame-level explode
            # lives in vrl.py/pipeline, the dynamic per-event form in
            # vrl_interp (unnest.rs)
            known, v = self.py_value(node)
            if known:
                return _py_to_col(v)
            raise VrlCompileError(
                "unnest: dynamic collection (out of scope; use vrl_interp)"
            )
        if name in (
            "set_metadata_field",
            "get_metadata_field",
            "remove_metadata_field",
        ):
            return self._metadata_call(name, node)
        if name in ("push", "append") and len(node.args) == 2:
            arr = self.compile(node.args[0])
            second = self.compile(node.args[1])
            out = (
                F.array_append(arr, second)
                if name == "push"
                else F.concat(arr, second)
            )
            if self._probe_ok(out):
                return out
            # heterogeneous result array: carry as array<string>
            # (the same documented rendering divergence as mixed
            # array literals) instead of failing analysis
            sarr = F.transform(arr, lambda x: x.cast("string"))
            out = (
                F.array_append(sarr, second.cast("string"))
                if name == "push"
                else F.concat(
                    sarr, F.transform(second, lambda x: x.cast("string"))
                )
            )
            if self._probe_ok(out):
                return out
            raise VrlCompileError(f"{name}: operand types irreconcilable")
        if name == "parse_regex" and node.args and isinstance(
            node.args[1], (Regex, Lit)
        ):
            numeric = False
            if "numeric_groups" in node.kwargs:
                known, nv = self.py_value(node.kwargs["numeric_groups"])
                numeric = bool(known and nv)
            pat = (
                node.args[1].pattern
                if isinstance(node.args[1], Regex)
                else node.args[1].value
            )
            out = self._parse_regex_col(
                self.compile(node.args[0]), pat, numeric
            )
            if out is not None:
                return out
        # path-operating builtins handled by the statement layer get
        # expression forms here
        if name == "del":
            return self._del(node)
        if name == "exists" and node.args and isinstance(node.args[0], Path):
            return self._exists(node.args[0])
        if name in (
            "get_enrichment_table_record", "find_enrichment_table_records"
        ):
            # behavior-test scale: literal VALUES dims compiled into
            # the expression (enrichment_tables.rs semantics); the
            # 100 TB path is the broadcast join in enrich.py
            tables = getattr(self.env, "enrichment_rows", None) or {}
            tname = self.native_value(node.args[0])
            if tname not in tables:
                raise VrlCompileError(f"unknown enrichment table {tname!r}")
            rows = tables[tname]
            if not rows or not isinstance(node.args[1], Obj):
                raise VrlCompileError("enrichment lookup needs a condition object")
            cols = list(rows[0].keys())
            arr = F.array(*[
                F.struct(*[F.lit(r.get(c)).alias(c) for c in cols])
                for r in rows
            ])
            conds = [(k, self.compile(v)) for k, v in node.args[1].pairs]

            def _match(rec):
                out = F.lit(True)
                for k, v in conds:
                    out = out & rec[k].eqNullSafe(v)
                return out

            matches = F.filter(arr, _match)
            shape_obj = ("obj", {c: None for c in cols})
            if name == "get_enrichment_table_record":
                self._last_shape = shape_obj
                return F.try_element_at(matches, F.lit(1))
            self._last_shape = ("arr", shape_obj)
            return matches
        if name == "tag_types_externally" and node.args:
            return self._tag_types(node.args[0])
        if name == "assert_eq" and len(node.args) >= 2:
            # assert_eq.rs: true when equal, error otherwise — in a
            # condition both mismatch and error read as "failed"
            return self.compile(node.args[0]).eqNullSafe(
                self.compile(node.args[1])
            )
        if name == "assert" and node.args:
            return self.compile(node.args[0]).cast("boolean")
        if name == "to_string" and node.args:
            sh = self.infer_shape(node.args[0])
            if sh is not None and isinstance(sh, tuple) and sh[0] in (
                "arr", "obj",
            ):
                # to_string.rs: collections are a type error (the
                # fallible path ?? recovers; bang-variant aborts —
                # both out of the Column subset)
                raise VrlCompileError("to_string of a collection")
            td = self.infer_tdef(node.args[0])
            if td == {"timestamp": True}:
                ts = self.compile(node.args[0])
                frac = F.regexp_replace(
                    F.date_format(ts, "SSSSSS"), "0+$", ""
                )
                return F.concat(
                    F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss"),
                    F.when(frac != "", F.concat(F.lit("."), frac)).otherwise(F.lit("")),
                    F.lit("Z"),
                )
        if name == "parse_json" and node.args:
            pk, pv = self.py_value(node.args[0])
            if pk and isinstance(pv, str):
                try:
                    return _py_to_col(json.loads(pv))
                except Exception:
                    return F.lit(None)  # fallible; `??` supplies fallback
        if name in ("set", "remove") and node.args:
            out = self._set_remove(name, node)
            if out is not None:
                return out
        if name == "type_def" and node.args:
            td = self.infer_tdef(node.args[0])
            if td is None and isinstance(node.args[0], Block):
                # abort-bearing blocks are answered by static
                # type-flow — evaluating them would exit the program
                td = self._tdef_block_static(
                    node.args[0].stmts, dict(self.env.tdef)
                )
            # the argument still evaluates (type_def(del(.a)) deletes)
            # — unless it contains abort, which must not execute
            if not isinstance(
                node.args[0], (Lit, Var, Path)
            ) and not _contains_abort(node.args[0]):
                self.compile(node.args[0])
            if td is None:
                raise VrlCompileError("type_def: type not inferable")
            return _py_to_col(td)
        if name == "merge" and len(node.args) == 2:
            lsh = self.infer_shape(node.args[0])
            rsh = self.infer_shape(node.args[1])
            if lsh and lsh[0] == "obj" and rsh and rsh[0] == "obj":
                return self.compile_merge(node.args[0], node.args[1])
            if rsh and rsh[0] == "obj" and not node.kwargs:
                # opaque left side: probe the generic map-merge NOW so
                # a statically-null operand (e.g. an unset event path)
                # fails at COMPILE time — the fallible-assignment
                # handler then applies the reference's error branch
                # (ok <- {} default, issues/11287) instead of the
                # analysis error surfacing at collect
                out = FUNCTIONS["merge"](
                    self.compile(node.args[0]), self.compile(node.args[1])
                )
                if self._probe_ok(out):
                    return out
                raise VrlCompileError(
                    "merge: left operand unresolvable (statically null)"
                )
        if name == "compact" and node.args:
            sh = self.infer_shape(node.args[0])
            if sh and sh[0] == "obj":
                col = self.compile(node.args[0])
                fields = self._obj_fields(node.args[0], col, sh)
                kept = {}
                for k in fields:
                    known, v = self.py_value(
                        Bin("getfield", node.args[0], Lit(k))
                    )
                    if known and v is None:
                        continue
                    kept[k] = fields[k]
                if not kept:
                    return F.struct()
                return F.struct(*[c.alias(k) for k, c in kept.items()])
        if name in ("length", "strlen") and node.args:
            sh = self.infer_shape(node.args[0])
            if sh and sh[0] == "arr":
                return F.size(self.compile(node.args[0]))
            if sh and sh[0] == "obj":
                self.compile(node.args[0])
                return F.lit(len(sh[1]))
        if name == "encode_json" and node.args:
            known, v = self.py_value(node.args[0])
            if known:
                return F.lit(json.dumps(v, separators=(",", ":")))
            sh = self.infer_shape(node.args[0])
            if sh is None or sh[0] not in ("arr", "obj"):
                col = self.compile(node.args[0])
                if not self._probe_ok(F.to_json(col)):
                    # scalar: to_json needs a container, so render
                    # through a 1-array and strip the brackets — JSON
                    # escaping/boolean/null rendering all come out
                    # exactly right
                    j = F.to_json(F.array(col))
                    return F.substring(j, F.lit(2), F.length(j) - 2)
        if name == "parse_common_log" and node.args:
            return _parse_common_log_col(self.compile(node.args[0]))
        if name == "parse_syslog" and node.args:
            return _parse_syslog_col(self.compile(node.args[0]))
        if name == "log" and ("level" in node.kwargs or (
            node.args and self.infer_tdef(node.args[0]) == {"bytes": True}
        )):
            # VRL's diagnostic log(msg, level:) — a no-op null here
            return F.lit(None)
        if name in ("slice", "is_empty") and node.args:
            # kind-dispatching kernels: an ARRAY-typed column must hit
            # the array code path (the registry default is 'string',
            # which would run F.length/F.substring on an array and
            # fail analysis)
            td = self.infer_tdef(node.args[0])
            sh = self.infer_shape(node.args[0])
            if (sh and sh[0] == "arr") or td == {"array": True}:
                from vector_spark.vrl import is_empty as _vrl_is_empty
                from vector_spark.vrl import slice_ as _vrl_slice

                col0 = self.compile(node.args[0])
                if name == "is_empty":
                    return _vrl_is_empty(col0, dtype="array")
                start_n = (
                    node.args[1]
                    if len(node.args) > 1
                    else node.kwargs.get("start")
                )
                end_n = (
                    node.args[2]
                    if len(node.args) > 2
                    else node.kwargs.get("end")
                )
                ks, sv = (
                    self.py_value(start_n)
                    if start_n is not None
                    else (True, 0)
                )
                ke, ev = (
                    self.py_value(end_n)
                    if end_n is not None
                    else (True, None)
                )
                if ks and ke and isinstance(sv, int) and (
                    ev is None or isinstance(ev, int)
                ):
                    return _vrl_slice(col0, sv, ev, dtype="array")
        if name not in FUNCTIONS:
            raise VrlCompileError(f"unknown function {name!r}")
        fn = FUNCTIONS[name]
        natives = _NATIVE_ARGS.get(name, {})
        order = _KWARG_ORDER.get(name)
        args = list(node.args)
        kwargs = dict(node.kwargs)
        if kwargs and order:
            # kwargs -> positional by VRL param order
            merged = []
            for i, pname in enumerate(order):
                if i < len(args):
                    merged.append(args[i])
                elif pname in kwargs:
                    merged.append(kwargs.pop(pname))
                else:
                    break
            args = merged
        py_args = []
        for i, a in enumerate(args):
            # a kwarg merged into its positional slot keeps its
            # by-name nativeness (e.g. contains case_sensitive:)
            is_native = natives.get(i, False) or (
                order is not None and i < len(order)
                and natives.get(order[i], False)
            )
            if is_native:
                py_args.append(self.native_value(a))
            elif isinstance(a, Regex):
                py_args.append(a.pattern)
            else:
                py_args.append(self.compile(a))
        py_kwargs = {}
        for k, v in kwargs.items():
            if natives.get(k, False):
                py_kwargs[k] = self.native_value(v)
            elif isinstance(v, Regex):
                py_kwargs[k] = v.pattern
            else:
                py_kwargs[k] = self.compile(v)
        try:
            out = fn(*py_args, **py_kwargs)
        except TypeError as e:
            raise VrlCompileError(f"{name}: {e}") from e
        if not isinstance(out, Column):
            raise VrlCompileError(
                f"{name} is DataFrame-level (parser family); use the "
                "pipeline transform form"
            )
        return out

    def _parse_regex_col(
        self, col: Column, pattern: str, numeric_groups: bool
    ) -> Column | None:
        """parse_regex as a pure Column struct (parse_regex.rs:21-43):
        one field per NAMED group, plus "0" (full match) and "1"..
        when numeric_groups. Python's (?P<name>) spelling converts to
        Java's (?<name>) for the JVM regex engine. Returns None for
        patterns this form can't honor (no groups)."""
        import re as _re

        try:
            compiled = _re.compile(pattern)
        except _re.error:
            return None
        if compiled.groups == 0:
            return None
        jpat = pattern.replace("(?P<", "(?<")
        by_idx = {v: k for k, v in compiled.groupindex.items()}
        fields = []
        if numeric_groups:
            fields.append(F.regexp_extract(col, jpat, 0).alias("0"))
        for i in range(1, compiled.groups + 1):
            g = F.regexp_extract(col, jpat, i)
            if i in by_idx:
                fields.append(g.alias(by_idx[i]))
            if numeric_groups:
                fields.append(g.alias(str(i)))
        names = ["0"] if numeric_groups else []
        for i in range(1, compiled.groups + 1):
            if i in by_idx:
                names.append(by_idx[i])
            if numeric_groups:
                names.append(str(i))
        self._last_shape = ("obj", {n: None for n in names})
        return F.when(col.rlike(jpat), F.struct(*fields))

    def _meta_path(self, node) -> list[str]:
        if not isinstance(node, Path) or any(
            isinstance(s, tuple) for s in node.segments
        ):
            raise VrlCompileError(
                "metadata field path must be a static event-style path"
            )
        return [str(s) for s in node.segments]

    def _metadata_call(self, name: str, node: Call) -> Column:
        """%metadata accessors (set/get/remove_metadata_field): the
        compile tier models event metadata as a compile-time value
        store (remap's VrlTarget metadata), so reads constant-fold."""
        meta = getattr(self, "_metadata", None)
        if meta is None:
            meta = self._metadata = {}
        segs = self._meta_path(node.args[0])
        if name == "set_metadata_field":
            known, v = self.py_value(node.args[1])
            if not known:
                raise VrlCompileError(
                    "set_metadata_field needs a compile-time value"
                )
            if not segs:
                if not isinstance(v, dict):
                    raise VrlCompileError(
                        "root metadata must be an object"
                    )
                self._metadata = dict(v)
            else:
                cur = meta
                for s in segs[:-1]:
                    cur = cur.setdefault(s, {})
                cur[segs[-1]] = v
            return F.lit(None)
        if name == "remove_metadata_field":
            cur = meta
            for s in segs[:-1]:
                if not isinstance(cur, dict) or s not in cur:
                    return F.lit(None)
                cur = cur[s]
            if isinstance(cur, dict):
                cur.pop(segs[-1] if segs else None, None)
            return F.lit(None)
        # get_metadata_field
        cur = meta
        for s in segs:
            if not isinstance(cur, dict) or s not in cur:
                self._last_shape = None
                return F.lit(None)
            cur = cur[s]
        import copy

        snap = copy.deepcopy(cur)
        self._last_shape = _shape_of_py(snap)
        self._last_py = snap
        return _py_to_col(snap)

    def _tag_types(self, node) -> Column:
        """tag_types_externally.rs: wrap scalars as {"<type>": value},
        recursing through objects (tag each value) and arrays (tag
        each item); objects/arrays themselves stay untagged
        (tag_externally match arms :88-115). The VRL type is static
        per call site, so the dispatch is compile-time."""
        if isinstance(node, Lit):
            v = node.value
            if v is None:
                return F.lit(None)
            tag = (
                "boolean" if isinstance(v, bool)
                else "integer" if isinstance(v, int)
                else "float" if isinstance(v, float)
                else "string" if isinstance(v, str)
                else None
            )
            if tag is None:
                raise VrlCompileError("tag_types_externally: unsupported literal")
            return F.struct(F.lit(v).alias(tag))
        if isinstance(node, Obj):
            return F.struct(
                *[self._tag_types(v).alias(k) for k, v in node.pairs]
            )
        if isinstance(node, Arr):
            return F.array(*[self._tag_types(i) for i in node.items])
        if isinstance(node, Regex):
            return F.struct(F.lit(node.pattern).alias("regex"))
        if isinstance(node, TsLit):
            return F.struct(self.compile(node).alias("timestamp"))
        td = self.infer_tdef(node)
        if td is not None and len(td) == 1:
            kind = next(iter(td))
            tag = {
                "bytes": "string", "integer": "integer", "float": "float",
                "boolean": "boolean", "timestamp": "timestamp",
            }.get(kind)
            if tag:
                return F.struct(self.compile(node).alias(tag))
            if kind == "null":
                return F.lit(None)
        raise VrlCompileError(
            "tag_types_externally needs a statically-typed argument"
        )

    def _exists(self, path: Path) -> Column:
        key = self._event_key(path)
        if key in self.env.bind:
            if key in self.env.deleted:
                return F.lit(False)
            # sparse event batches (condition compilation over a
            # DataFrame): a column is the union of every event's
            # fields, so presence is per-row null-ness, not schema
            # membership (src/conditions/vrl.rs checks the event)
            sparse = getattr(self.env, "sparse_cols", None)
            if sparse and key in sparse:
                return self.env.bind[key].isNotNull()
            return F.lit(True)
        if len(path.segments) <= 1:
            return F.lit(False)
        head = "." + str(path.segments[0])
        if head in self.env.bind:
            return self.lookup_path(path).isNotNull()
        return F.lit(False)

    def _set_remove(self, name: str, node: Call) -> Column | None:
        """set!(target, [keys], value) / remove!(target, [keys]) on an
        object-shaped target (set.rs / remove.rs). Only compile-time
        key paths are supported — returns None to fall through to the
        map-typed registry impls otherwise."""
        target = node.args[0]
        tsh = self.infer_shape(target)
        if not (tsh and tsh[0] == "obj") or len(node.args) < 2:
            return None
        known, keys = self.py_value(node.args[1])
        if not known or not isinstance(keys, list) or not all(
            isinstance(k, str) for k in keys
        ):
            return None
        col = self.compile(target)
        fields = self._obj_fields(target, col, tsh)
        if not fields and name == "set" and len(keys) == 1:
            val = self.compile(node.args[2])
            return F.struct(val.alias(keys[0]))
        base = F.struct(*[c.alias(k) for k, c in fields.items()])
        if name == "remove":
            if keys[0] not in fields:
                return base
            if len(keys) == 1:
                return base.dropFields(f"`{keys[0]}`")
            return base  # nested removes: out of corpus scope
        if len(keys) != 1:
            return None  # nested set paths: fall through / skip
        val = self.compile(node.args[2])
        return base.withField(f"`{keys[0]}`", val)

    # ---- closures ----

    def compile_closure_call(self, node: Call) -> Column:
        params, body = node.closure
        name = _FN_ALIASES.get(node.name, node.name)
        if name not in ("map_values", "map_keys", "for_each", "filter"):
            raise VrlCompileError(
                f"closure on {name!r} unsupported"
            )
        if not node.args:
            raise VrlCompileError(f"{name} needs a collection argument")
        arg = node.args[0]
        recursive = False
        if "recursive" in node.kwargs:
            known, rv = self.py_value(node.kwargs["recursive"])
            recursive = bool(rv) if known else False
        # literal provenance: unroll over AST elements
        argnode = arg
        if isinstance(arg, Var) and arg.name in self.env.nodes:
            argnode = self.env.nodes[arg.name]
        elem_td = None
        if not isinstance(argnode, (Arr, Obj)):
            # a compile-time-known list (split of a literal, folded
            # call, folded unnest) unrolls like a literal array —
            # per-element provenance lets fallible closure bodies
            # fold too; the element's static tdef rides along so
            # type_def(param) reports the lattice type, not the
            # literal's (closure_arg_kind)
            pk, pv = self.py_value(arg)
            if pk and isinstance(pv, list) and all(
                x is None or isinstance(x, (str, int, float, bool,
                                            dict, list))
                for x in pv
            ):
                argnode = Arr([_node_of_py(x) for x in pv])
                atd = self.infer_tdef(arg)
                if isinstance(atd, dict):
                    elem_td = atd.get("array_unknown_exact")
        shape = self.infer_shape(arg)

        if isinstance(argnode, Arr):
            return self._closure_over_literal_array(
                name, params, body, argnode,
                elem_td=elem_td, callnode=node,
            )
        if isinstance(argnode, Obj) or (
            isinstance(arg, Path) and not arg.segments
        ) or (shape and shape[0] == "obj"):
            return self._closure_over_object(
                name, params, body, arg, argnode, shape, recursive
            )
        # opaque array column -> JVM higher-order function
        if name == "map_values":
            col = self.compile(arg)
            return F.transform(col, lambda v: self._closure_body(body, {
                params[0]: (v, _shape_step(shape, 0))
            }))
        raise VrlCompileError(
            f"{name} over an opaque array needs map_values (fold-style "
            "for_each over unknown arrays is out of scope)"
        )

    def _closure_body(
        self, body: list, bindings: dict[str, tuple[Column, Any]]
    ) -> Column:
        """Run a closure body in a forked env with params bound;
        return its value. Side effects are discarded (VRL map_*
        closures are pure over their input). A binding may carry an
        optional third element: the param's compile-time-known python
        value (literal-array unrolling), letting fallible calls in the
        body constant-fold per element."""
        env = self.env.fork()
        for p, b in bindings.items():
            c, sh = b[0], b[1]
            pv = b[2] if len(b) > 2 else _MISSING
            td = b[3] if len(b) > 3 else None
            env.bind[p] = c
            env.shape[p] = sh
            if pv is not _MISSING:
                env.py[p] = pv
            else:
                env.py.pop(p, None)
            if td is not None:
                env.tdef[p] = td
            else:
                env.tdef.pop(p, None)
            env.nodes.pop(p, None)
        saved = self.env
        self.env = env
        self._branch_depth += 1
        self._body_py = (False, None)
        try:
            val = None
            for s in body:
                val = self.exec_stmt(s)
            self._body_py = self._final_stmt_py(body)
        finally:
            self._branch_depth -= 1
            self.env = saved
        return val if val is not None else F.lit(None)

    def _final_stmt_py(self, body: list) -> tuple[bool, Any]:
        """Compile-time value of a closure body's final statement
        (its return value), read from post-exec provenance: an
        assignment returns its target's new value."""
        if not body:
            return False, None
        last = body[-1]
        if isinstance(last, Assign):
            t = last.target
            if isinstance(t, Var):
                if t.name in self.env.py:
                    return True, self.env.py[t.name]
                return False, None
            return self.py_value(self._target_expr(t)) if isinstance(
                t, VarPath
            ) else self.py_value(t)
        if isinstance(last, MultiAssign):
            return False, None
        return self.py_value(last)

    def _exec_body_shared(
        self, body: list, bindings: dict[str, tuple[Column, Any, Any]]
    ):
        """for_each semantics: params shadow (restored after), other
        assignments persist — matches the reference's closure scope
        (expressions/function_call/closure_scope_inheritance.vrl)."""
        saved = {
            p: (
                self.env.bind.get(p),
                self.env.shape.get(p),
                self.env.py.get(p),
                self.env.nodes.get(p),
                self.env.elems.get(p),
            )
            for p in bindings
        }
        for p, (c, sh, pv) in bindings.items():
            self.env.bind[p] = c
            self.env.shape[p] = sh
            if pv is not _MISSING:
                self.env.py[p] = pv
            else:
                self.env.py.pop(p, None)
            self.env.nodes.pop(p, None)
            self.env.elems.pop(p, None)
        val = None
        self._branch_depth += 1
        try:
            for s in body:
                val = self.exec_stmt(s)
        finally:
            self._branch_depth -= 1
        for p, (b, sh, pv, nd, el) in saved.items():
            if b is None:
                self.env.bind.pop(p, None)
            else:
                self.env.bind[p] = b
            if sh is None:
                self.env.shape.pop(p, None)
            else:
                self.env.shape[p] = sh
            if pv is None:
                self.env.py.pop(p, None)
            else:
                self.env.py[p] = pv
            if nd is None:
                self.env.nodes.pop(p, None)
            else:
                self.env.nodes[p] = nd
            if el is None:
                self.env.elems.pop(p, None)
            else:
                self.env.elems[p] = el
        return val

    def _closure_over_literal_array(
        self, name: str, params: list, body: list, argnode: Arr,
        elem_td: dict | None = None, callnode: Call | None = None,
    ) -> Column:
        if name == "map_values":
            outs = []
            pys: list = []
            all_known = bool(argnode.items)
            for item in argnode.items:
                pk, pv = self.py_value(item)
                outs.append(
                    self._closure_body(
                        body,
                        {params[0]: (
                            self.compile(item),
                            self.infer_shape(item),
                            pv if pk else _MISSING,
                            elem_td,
                        )},
                    )
                )
                bk, bv = self._body_py
                if bk:
                    pys.append(bv)
                else:
                    all_known = False
            if all_known:
                # every element's body folded: the whole map is a
                # compile-time value — stash it for the enclosing
                # assignment's provenance pass and emit the literal
                # (keeps heterogeneous-but-congruent structs typed)
                if callnode is not None:
                    self._closure_py[id(callnode)] = pys
                return _py_to_col(pys)
            return F.array(*outs) if outs else F.array()
        if name == "for_each":
            for idx, item in enumerate(argnode.items):
                binds = {}
                if len(params) >= 1:
                    binds[params[0]] = (F.lit(idx), None, idx)
                if len(params) >= 2:
                    known, pv = self.py_value(item)
                    binds[params[1]] = (
                        self.compile(item),
                        self.infer_shape(item),
                        pv if known else _MISSING,
                    )
                self._exec_body_shared(body, binds)
            return F.lit(None)
        raise VrlCompileError(f"{name} over a literal array unsupported")

    def _closure_over_object(
        self, name, params, body, arg, argnode, shape, recursive
    ) -> Column:
        # field name -> (Column, shape)
        if isinstance(argnode, Obj):
            fields = {
                k: (self.compile(v), self.infer_shape(v))
                for k, v in argnode.pairs
            }
        elif isinstance(arg, Path) and not arg.segments:
            fields = {
                f: (
                    self.env.bind["." + f],
                    self.env.shape.get("." + f),
                )
                for f in self._top_fields()
            }
        else:
            col = self.compile(arg)
            fields = {
                k: (col.getItem(k), ksh) for k, ksh in shape[1].items()
            }
        keys = sorted(fields)  # BTreeMap iteration order

        if name == "for_each":
            for k in keys:
                c, sh = fields[k]
                binds = {}
                if len(params) >= 1:
                    binds[params[0]] = (F.lit(k), None, k)
                if len(params) >= 2:
                    binds[params[1]] = (c, sh, _MISSING)
                self._exec_body_shared(body, binds)
            return F.lit(None)

        if name == "map_values":
            def rec(c, sh):
                if recursive and sh and sh[0] == "obj":
                    if not sh[1]:
                        return c
                    return F.struct(*[
                        rec(c.getItem(k2), s2).alias(k2)
                        for k2, s2 in sh[1].items()
                    ])
                if recursive and sh and sh[0] == "arr" and sh[1]:
                    return F.transform(c, lambda e: rec(e, sh[1]))
                return self._closure_body(body, {params[0]: (c, sh)})

            outs = {k: rec(*fields[k]) for k in keys}
            if not outs:
                return F.lit(None)
            return F.struct(*[outs[k].alias(k) for k in keys])

        if name == "map_keys":
            def rename(k: str) -> str:
                known, nk = self._py_closure(body, {params[0]: k})
                if not known or not isinstance(nk, str):
                    raise VrlCompileError(
                        "map_keys closure must fold to a constant key"
                    )
                return nk

            def rec_keys(c, sh):
                if sh and sh[0] == "obj":
                    return F.struct(*[
                        rec_keys(c.getItem(k2), s2).alias(rename(k2))
                        for k2, s2 in sh[1].items()
                    ]) if sh[1] else c
                if sh and sh[0] == "arr" and sh[1]:
                    return F.transform(c, lambda e: rec_keys(e, sh[1]))
                return c

            outs = {}
            for k in keys:
                c, sh = fields[k]
                outs[rename(k)] = (
                    rec_keys(c, sh) if recursive else c
                )
            if not outs:
                return F.lit(None)
            return F.struct(*[c.alias(k) for k, c in outs.items()])

        raise VrlCompileError(f"{name} over an object unsupported")

    def _py_closure(self, body: list, pybinds: dict[str, Any]):
        """Constant-fold a closure body (map_keys key rewriting)."""
        saved = {p: self.env.py.get(p) for p in pybinds}
        saved_bind = {p: self.env.bind.get(p) for p in pybinds}
        for p, v in pybinds.items():
            self.env.py[p] = v
            self.env.bind[p] = F.lit(v)
        try:
            if len(body) != 1:
                return False, None
            return self.py_value(body[0])
        finally:
            for p in pybinds:
                if saved[p] is None:
                    self.env.py.pop(p, None)
                else:
                    self.env.py[p] = saved[p]
                if saved_bind[p] is None:
                    self.env.bind.pop(p, None)
                else:
                    self.env.bind[p] = saved_bind[p]

    def _del(self, node: Call) -> Column:
        if not node.args:
            raise VrlCompileError("del() takes a path")
        t = node.args[0]
        if isinstance(t, Path):
            key = self._event_key(t)
            # stash the pre-delete constant/shape: del() RETURNS the
            # deleted value, and the assignment's provenance pass runs
            # after the env entries are popped
            self._del_returns[id(node)] = (
                key in self.env.py,
                self.env.py.get(key),
                self.env.shape.get(key),
            )
            if key in self.env.bind:
                old = self.env.bind.pop(key)
                self.env.shape.pop(key, None)
                self.env.py.pop(key, None)
                self.env.tdef[key] = None  # post-del type left unknown
                self.env.deleted.add(key)
                return old
            if len(t.segments) > 1:
                head = "." + str(t.segments[0])
                if head in self.env.bind and all(
                    isinstance(s, str) for s in t.segments
                ):
                    old = self.lookup_path(t)
                    dotted = ".".join(
                        f"`{s}`" for s in t.segments[1:]
                    )
                    self.env.bind[head] = self.env.bind[head].dropFields(
                        dotted
                    )
                    sh = self.env.shape.get(head)
                    self.env.shape[head] = self._shape_drop(
                        sh, t.segments[1:]
                    )
                    return old
            self.env.deleted.add(key)
            return F.lit(None)
        if isinstance(t, Bin):
            # `del(value.ttl)` parses as a getfield chain rooted at a
            # Var (expression position) — unroll it into a VarPath so
            # closure-local deletes work (rfcs/8381 delete-a-field)
            segs: list = []
            cur: Any = t
            while (
                isinstance(cur, Bin)
                and cur.op == "getfield"
                and isinstance(cur.right, Lit)
                and isinstance(cur.right.value, str)
            ):
                segs.append(cur.right.value)
                cur = cur.left
            if isinstance(cur, Var) and segs:
                t = VarPath(cur.name, list(reversed(segs)))
        if isinstance(t, VarPath) and all(
            isinstance(s, str) for s in t.segments
        ):
            base = self.env.bind.get(t.name)
            if base is None:
                raise VrlCompileError(f"undefined variable {t.name!r}")
            old = self.compile(self._target_expr(t))
            dotted = ".".join(f"`{s}`" for s in t.segments)
            self.env.bind[t.name] = base.dropFields(dotted)
            self.env.shape[t.name] = self._shape_drop(
                self.env.shape.get(t.name), t.segments
            )
            # py provenance survives a known-value delete: stash the
            # deleted value (del RETURNS it) and drop the key from
            # the variable's known dict (closure_arg_kind corpus)
            if t.name in self.env.py:
                root = self.env.py[t.name]
                rsegs = _py_resolve_segs(root, list(t.segments))
                if rsegs is not None and isinstance(root, dict):
                    import copy as _copy

                    self._del_returns[id(node)] = (
                        True,
                        _py_query_value(root, rsegs),
                        self.env.shape.get(t.name),
                    )
                    pruned = _copy.deepcopy(root)
                    cur: Any = pruned
                    ok = True
                    for s in rsegs[:-1]:
                        try:
                            cur = cur[s]
                        except Exception:
                            ok = False
                            break
                    if ok and isinstance(cur, dict):
                        cur.pop(rsegs[-1], None)
                        self.env.py[t.name] = pruned
                    else:
                        self.env.py.pop(t.name, None)
                else:
                    self.env.py.pop(t.name, None)
            self.env.nodes.pop(t.name, None)
            return old
        raise VrlCompileError("del() takes an event path or variable path")

    def _shape_drop(self, sh, segs):
        if not (sh and sh[0] == "obj"):
            return sh
        d = dict(sh[1])
        if len(segs) == 1:
            d.pop(segs[0], None)
        elif segs[0] in d:
            d[segs[0]] = self._shape_drop(d[segs[0]], segs[1:])
        return ("obj", d)

    # ---- statements ----

    def run_block(self, stmts: list, env: Env):
        saved = self.env
        self.env = env
        self._branch_depth += 1
        try:
            val = None
            for s in stmts:
                val = self.exec_stmt(s)
            out_env = self.env
        finally:
            self._branch_depth -= 1
            self.env = saved
        return out_env, val

    def merge_branches(self, cond: Column, then_env: Env, else_env: Env):
        cond = F.coalesce(cond, F.lit(False))
        keys = set(then_env.bind) | set(else_env.bind)
        merged: dict[str, Column] = {}
        for k in keys:
            t = then_env.bind.get(k)
            e = else_env.bind.get(k)
            if t is None:
                t = F.lit(None)
            if e is None:
                e = F.lit(None)
            base = self.env.bind.get(k)
            same_as_base = (
                base is not None
                and then_env.bind.get(k) is base
                and else_env.bind.get(k) is base
            )
            merged[k] = base if same_as_base else F.when(cond, t).otherwise(e)
        self.env.bind = merged
        # statically deleted only when BOTH paths deleted it; a
        # one-sided del is per-row (the merged bind already carries
        # when(cond, null)), so exists() on it must read null-ness,
        # not a static False — route those keys through sparse_cols
        one_sided = (
            then_env.deleted | else_env.deleted
        ) - (then_env.deleted & else_env.deleted)
        self.env.deleted = then_env.deleted & else_env.deleted
        if one_sided:
            sparse = set(getattr(self.env, "sparse_cols", set()) or set())
            self.env.sparse_cols = sparse | one_sided
        self.env.shape = {
            k: then_env.shape[k]
            for k in set(then_env.shape) & set(else_env.shape)
            if then_env.shape[k] == else_env.shape.get(k)
        }
        self.env.py = {
            k: then_env.py[k]
            for k in set(then_env.py) & set(else_env.py)
            if then_env.py[k] == else_env.py.get(k)
        }
        self.env.nodes = {
            k: then_env.nodes[k]
            for k in set(then_env.nodes) & set(else_env.nodes)
            if then_env.nodes[k] is else_env.nodes.get(k)
        }
        # element lists survive a merge only when neither branch
        # touched them (same Column objects, element-wise)
        self.env.elems = {
            k: then_env.elems[k]
            for k in set(then_env.elems) & set(else_env.elems)
            if len(then_env.elems[k]) == len(else_env.elems[k])
            and all(
                a[0] is b[0]
                for a, b in zip(then_env.elems[k], else_env.elems[k])
            )
        }
        self.env.top = then_env.top | else_env.top
        self.env.tdef = self._union_branch_tdefs(then_env, else_env)

    @staticmethod
    def _absent_tdef(env: Env, key: str) -> dict | None:
        """Tdef contribution of a branch whose env has NO tdef entry
        for `key`: an existing binding means untouched external data
        (any); no binding means the field is absent there — querying
        yields null when the program owns the event shape, any when
        the event is still external."""
        if key in env.bind:
            return {"any": True}
        if key.startswith(".") and not env.root_known:
            return {"any": True}
        return {"null": True}

    def _union_branch_tdefs(self, a_env: Env, b_env: Env) -> dict:
        """Per-key tdef union of two branch environments — the
        reference type checker keeps BOTH branches' types (it never
        narrows on which branch ran, even for constant conditions)."""
        out: dict[str, Any] = {}
        for k in set(a_env.tdef) | set(b_env.tdef):
            a = a_env.tdef[k] if k in a_env.tdef else self._absent_tdef(a_env, k)
            b = b_env.tdef[k] if k in b_env.tdef else self._absent_tdef(b_env, k)
            out[k] = _tdef_union(a, b)
        return out

    def exec_stmt(self, node):
        if isinstance(node, Assign):
            expr = node.expr
            if node.op == "|=":
                expr = Bin("|", self._target_expr(node.target), node.expr)
            val = self.compile(expr)
            self.assign_target(
                node.target, val, self.infer_shape(expr), pynode=expr
            )
            return val
        if isinstance(node, MultiAssign):
            return self.exec_multi(node)
        if isinstance(node, If):
            return self.compile(node)
        return self.compile(node)

    def _static_vrl_type(self, node) -> str | None:
        """Statically-known VRL kind name of a node, using the
        reference Kind display names ('string' for Bytes), or None."""
        if isinstance(node, Regex):
            return "regex"
        if isinstance(node, Arr):
            return "array"
        if isinstance(node, Obj):
            return "object"
        if isinstance(node, TsLit):
            return "timestamp"
        if isinstance(node, Call) and node.name.rstrip("!") == "now":
            return "timestamp"
        td = self.infer_tdef(node)
        if td and len(td) == 1:
            k = next(iter(td))
            if k in ("any", "never"):  # lattice extremes, not kinds
                return None
            return {"bytes": "string"}.get(k, k)
        return None

    @staticmethod
    def _static_arith_error(op: str, lt: str, rt: str) -> str | None:
        """Compile-time fallibility of arithmetic, mirroring
        lib/vrl/compiler/src/value/arithmetic.rs try_add/sub/mul/div/
        rem type dispatch and value/error.rs message formats. Returns
        the reference's error string for a statically-invalid operand
        pair, else None."""
        num = ("integer", "float")
        valid: set[tuple[str, str]] = set()
        if op == "+":
            valid = {(a, b) for a in num for b in num} | {
                ("string", "string"), ("string", "null"), ("null", "string")
            }
        elif op == "-":
            valid = {(a, b) for a in num for b in num}
        elif op == "*":
            valid = {(a, b) for a in num for b in num} | {
                ("integer", "string"), ("string", "integer")
            }
        elif op in ("/", "%"):
            valid = {(a, b) for a in num for b in num}
        if (lt, rt) in valid:
            return None
        if op == "+":
            return f"can't add type {rt} to {lt}"
        if op == "-":
            return f"can't subtract type {rt} from {lt}"
        if op == "*":
            return f"can't multiply type {lt} by {rt}"
        if op == "/":
            return f"can't divide type {lt} by {rt}"
        return f"can't calculate remainder of type {lt} and {rt}"

    def exec_multi(self, node: MultiAssign):
        """`ok, err = expr` (fallible assignment, remap.rs error
        capture). Statically-typed invalid arithmetic resolves to the
        reference's compile-time error string (arithmetic.rs +
        error.rs); otherwise Spark expressions fail to null rather
        than erroring, so err derives from null-ness; division/
        remainder match the reference's zero-divisor message and
        ok-side typed default."""
        expr = node.expr
        if node.op == "|=":
            expr = Bin("|", self._target_expr(node.ok), node.expr)
        if isinstance(expr, Bin) and expr.op in ("+", "-", "*", "/", "%"):
            lt = self._static_vrl_type(expr.left)
            rt = self._static_vrl_type(expr.right)
            msg = (
                self._static_arith_error(expr.op, lt, rt)
                if lt and rt
                else None
            )
            if msg is None and expr.op in ("/", "%") and rt in (
                "integer", "float"
            ):
                known, rv = self.py_value(expr.right)
                if known and rv == 0:
                    msg = "can't divide by zero"
            if msg is not None:
                # ok gets the expression type's DEFAULT value on error
                # (assignment.rs): float 0.0 for /, integer 0 for %;
                # for statically type-invalid operands null suffices
                # (the corpus never reads ok there)
                if msg == "can't divide by zero":
                    ok_val = F.lit(0.0) if expr.op == "/" else F.lit(0)
                else:
                    ok_val = F.lit(None)
                self.assign_target(node.ok, ok_val, None)
                if not (isinstance(node.err, Var) and node.err.name == "_"):
                    self.assign_target(node.err, F.lit(msg), None)
                return F.lit(msg)
        err_node = None
        if isinstance(expr, Bin) and expr.op in ("/", "%"):
            kr, rv = self.py_value(expr.right)
            if kr and rv != 0:
                # statically non-zero divisor: the operation is
                # infallible, err is the null LITERAL (so downstream
                # folds — e.g. typed-null array coercion — see it)
                val = self.compile(expr)
                err, err_node = F.lit(None), Lit(None)
            else:
                right = self.compile(expr.right)
                raw = self.compile(expr)
                err = F.when(
                    right == 0, F.lit("can't divide by zero")
                ).otherwise(F.lit(None))
                val = F.coalesce(
                    raw, F.lit(0.0) if expr.op == "/" else F.lit(0)
                )
        else:
            msg = self._static_fallible_call_error(expr)
            if msg is not None:
                # the call provably errors: ok gets null, err the
                # reference's span-bearing diagnostic (remap.rs)
                self.assign_target(node.ok, F.lit(None), None)
                if not (isinstance(node.err, Var) and node.err.name == "_"):
                    self.assign_target(
                        node.err, F.lit(msg), None, pynode=Lit(msg)
                    )
                return F.lit(None)
            try:
                val = self.compile(expr)
            except VrlCompileError:
                # push/append/merge over a statically-null collection:
                # the reference errors at runtime ("expected array/
                # object, got null") and the ok target receives the
                # return kind's DEFAULT value (assignment.rs) — [] for
                # array-returning calls, {} for merge. This is what
                # lets `.a, err = push(.a, x); .a = push(.a, y)` start
                # from an empty collection (issues/11287).
                cname = (
                    _FN_ALIASES.get(expr.name, expr.name)
                    if isinstance(expr, Call)
                    else None
                )
                if cname not in ("push", "append", "merge") or not expr.args:
                    raise
                # external paths type as any (type_def.rs: Kind::any)
                # — only take the error branch when the operand could
                # be null/missing, never for a statically-known array
                td = self.infer_tdef(expr.args[0]) or {"any": True}
                if not set(td) <= {"null", "any"}:
                    raise
                default_node: Any = (
                    Obj([]) if cname == "merge" else Arr([])
                )
                ok_val = self.compile(default_node)
                self.assign_target(
                    node.ok,
                    ok_val,
                    self.infer_shape(default_node),
                    pynode=default_node,
                )
                want = "object" if cname == "merge" else "array"
                msg = (
                    f'function call error for "{cname}": '
                    f"expected {want}, got null"
                )
                if not (
                    isinstance(node.err, Var) and node.err.name == "_"
                ):
                    self.assign_target(node.err, F.lit(msg), None)
                return ok_val
            err = F.when(val.isNull(), F.lit("error")).otherwise(
                F.lit(None)
            )
            pk, pv = self.py_value(expr)
            if pk and pv is not None:
                # the fallible expression constant-folded to a real
                # value: err is STATICALLY null, so `if err != null`
                # executes only the success branch (blog_remap
                # examples); a folded object re-literalizes so the
                # root-assign gets per-field provenance and key
                # omission
                err, err_node = F.lit(None), Lit(None)
                if isinstance(pv, (dict, list)):
                    expr = _node_of_py(pv)
                    val = self.compile(expr)
        self.assign_target(
            node.ok, val, self.infer_shape(expr), pynode=expr
        )
        if not (isinstance(node.err, Var) and node.err.name == "_"):
            self.assign_target(node.err, err, None, pynode=err_node)
        return val


_MISSING = object()


# Apache Common Log Format (parse_common_log.rs). `identity` is
# omitted like the reference omits unmatched "-" groups; timestamps
# render RFC3339-UTC (the reference's serialization).
_CLF_RE = (
    r'^(\S+) (\S+) (\S+) \[([^\]]+)\] "(\S+) (\S+) (\S+)" '
    r"(\d+) (\d+)\s*$"
)

_CLF_SHAPE = (
    "obj",
    {
        "host": None, "user": None, "timestamp": None,
        "message": None, "method": None, "path": None,
        "protocol": None, "status": None, "size": None,
    },
)


def _node_of_py(v) -> Any:
    """Re-literalize a constant-folded python value as an AST node so
    downstream assignment/shape machinery sees a literal."""
    if isinstance(v, dict):
        return Obj([(k, _node_of_py(x)) for k, x in v.items()])
    if isinstance(v, list):
        return Arr([_node_of_py(x) for x in v])
    return Lit(v)


def _py_parse_common_log(s: str) -> dict | None:
    """Compile-time twin of _parse_common_log_col for constant
    inputs: same regex, same RFC3339-UTC timestamp rendering, but
    with the reference's key-OMISSION for unmatched '-' groups
    (parse_common_log.rs skips them; a struct column can only null
    them). None = no match (the fold must not swallow the error)."""
    import datetime as _dt

    m = re.match(_CLF_RE, s)
    if m is None:
        return None
    host, _ident, user, ts_raw, method, path, proto, status, size = (
        m.groups()
    )
    try:
        ts = _dt.datetime.strptime(
            ts_raw, "%d/%b/%Y:%H:%M:%S %z"
        ).astimezone(_dt.timezone.utc)
    except ValueError:
        return None
    out: dict[str, Any] = {"host": host}
    if user != "-":
        out["user"] = user
    out.update(
        timestamp=ts.strftime("%Y-%m-%dT%H:%M:%SZ"),
        message=f"{method} {path} {proto}",
        method=method,
        path=path,
        protocol=proto,
        status=int(status),
        size=int(size),
    )
    return out


def _render_ts_ms(epoch_ms: int) -> str:
    """RFC3339-UTC rendering of an epoch-millis timestamp, matching
    _to_py's datetime serialization (trailing-zero-trimmed fraction)."""
    import datetime as _dt

    ts = _dt.datetime.fromtimestamp(
        epoch_ms / 1000.0, _dt.timezone.utc
    )
    s = ts.strftime("%Y-%m-%dT%H:%M:%S")
    if ts.microsecond:
        s += ("%.6f" % (ts.microsecond / 1e6))[1:].rstrip("0")
    return s + "Z"


def _py_parse_aws_cloudwatch(s: str) -> dict | None:
    """Compile-time twin of the CloudWatch subscription-message parser
    (parse_aws_cloudwatch_log_subscription_message.rs): strict JSON
    envelope -> snake_case keys, epoch-millis timestamps rendered
    RFC3339-UTC. None = parse failure (the fold must not swallow the
    error channel); value tdefs come from the static _FN_TDEF table,
    so string-rendered timestamps still type as timestamp."""
    try:
        d = json.loads(s)
        return {
            "owner": d["owner"],
            "message_type": d["messageType"],
            "log_group": d["logGroup"],
            "log_stream": d["logStream"],
            "subscription_filters": list(d["subscriptionFilters"]),
            "log_events": [
                {
                    "id": e["id"],
                    "message": e["message"],
                    "timestamp": _render_ts_ms(e["timestamp"]),
                }
                for e in d["logEvents"]
            ],
        }
    except (ValueError, KeyError, TypeError):
        return None


def _parse_common_log_col(col: Column) -> Column:
    g = lambda i: F.regexp_extract(col, _CLF_RE, i)  # noqa: E731
    ts = F.date_format(
        F.to_timestamp(g(4), "dd/MMM/yyyy:HH:mm:ss xx"),
        "yyyy-MM-dd'T'HH:mm:ss'Z'",
    )
    fields = F.struct(
        g(1).alias("host"),
        F.when(g(3) != "-", g(3)).alias("user"),
        ts.alias("timestamp"),
        F.concat_ws(" ", g(5), g(6), g(7)).alias("message"),
        g(5).alias("method"),
        g(6).alias("path"),
        g(7).alias("protocol"),
        g(8).cast("long").alias("status"),
        g(9).cast("long").alias("size"),
    )
    return F.when(col.rlike(_CLF_RE), fields)


# Syslog RFC5424 + RFC3164 (parse_syslog.rs rides the syslog_loose
# crate, which accepts both).
_SYSLOG_5424_RE = (
    r"^<(\d+)>(\d+) (\S+) (\S+) (\S+) (\S+) (\S+) (\[.*\]|-) ?(.*)$"
)
_SYSLOG_3164_RE = (
    r"^<(\d+)>([A-Z][a-z]{2} [ \d]?\d \d{2}:\d{2}:\d{2}) (\S+?) "
    r"([^\s\[:]+)(?:\[(\d+)\])?:\s?(.*)$"
)

_SYSLOG_SHAPE = (
    "obj",
    {
        "message": None, "appname": None, "hostname": None,
        "procid": None, "facility": None, "severity": None,
        "timestamp": None,
    },
)


def _parse_syslog_col(col: Column) -> Column:
    def nn(c):  # "-" and "" are absent values in syslog
        return F.when((c != "-") & (c != ""), c)

    g5 = lambda i: F.regexp_extract(col, _SYSLOG_5424_RE, i)  # noqa: E731
    g3 = lambda i: F.regexp_extract(col, _SYSLOG_3164_RE, i)  # noqa: E731
    is_5424 = col.rlike(r"^<\d+>\d+ ")
    pri = F.when(is_5424, g5(1)).otherwise(g3(1)).cast("int")
    new = F.struct(
        F.when(is_5424, nn(g5(9))).otherwise(nn(g3(6))).alias("message"),
        F.when(is_5424, nn(g5(4))).otherwise(nn(g3(4))).alias("appname"),
        F.when(is_5424, nn(g5(3))).otherwise(nn(g3(3))).alias("hostname"),
        F.when(is_5424, nn(g5(5))).otherwise(nn(g3(5)))
        .cast("long").alias("procid"),
        (pri / 8).cast("int").alias("facility"),
        (pri % 8).alias("severity"),
        F.when(
            is_5424,
            F.date_format(
                F.to_timestamp(g5(2)), "yyyy-MM-dd'T'HH:mm:ss'Z'"
            ),
        ).alias("timestamp"),
    )
    return F.when(col.rlike(r"^<\d+>"), new)


def _is_str(node) -> bool:
    return isinstance(node, Lit) and isinstance(node.value, str)


def _strict_eq(a, b) -> bool:
    """VRL equality is type-strict: 1 != 1.0, \"true\" != true
    (expressions/equality tests)."""
    if isinstance(a, bool) != isinstance(b, bool):
        return False
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return type(a) is type(b) and a == b
    if isinstance(a, dict) and isinstance(b, dict):
        return set(a) == set(b) and all(
            _strict_eq(a[k], b[k]) for k in a
        )
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(
            _strict_eq(x, y) for x, y in zip(a, b)
        )
    if type(a) is not type(b) and a is not None and b is not None:
        return False
    return a == b


def _vrl_str(x) -> str | None:
    """VRL string rendering of a scalar (for the documented
    heterogeneous-array -> array<string> coercion divergence)."""
    if x is None:
        return None
    if isinstance(x, bool):
        return "true" if x else "false"
    return str(x)


def _py_to_col(v) -> Column:
    if isinstance(v, dict):
        if not v:
            return F.struct()
        return F.struct(*[_py_to_col(x).alias(k) for k, x in v.items()])
    if isinstance(v, list):
        if not v:
            return F.array()
        kinds = {type(x) for x in v if x is not None}
        if len(kinds) > 1 and kinds != {int, float}:
            # mixed scalar types (int/float widen natively in Spark,
            # everything else doesn't): carry the VRL heterogeneous
            # array as strings — the documented rendering divergence,
            # same as the Arr-literal path
            if not any(isinstance(x, (dict, list)) for x in v):
                return F.array(*[F.lit(_vrl_str(x)) for x in v])
        return F.array(*[_py_to_col(x) for x in v])
    return F.lit(v)


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


def _guard_dotted_ambiguity(schema) -> None:
    """A literal column named 'a.b' and a struct column 'a' (with a
    field b) both bind the event key '.a.b' — refuse the ambiguous
    frame loudly instead of silently resolving to whichever wins."""
    names = [f.name for f in schema.fields]
    struct_heads = {
        f.name for f in schema.fields if f.dataType.typeName() == "struct"
    }
    ambiguous = {
        c for c in names if "." in c and c.split(".", 1)[0] in struct_heads
    }
    if ambiguous:
        raise VrlCompileError(
            f"ambiguous event paths: literal dotted column(s) "
            f"{sorted(ambiguous)} collide with struct column paths — "
            "rename one side"
        )


def compile_vrl(
    df: DataFrame, source: str,
    enrichment_rows: dict[str, list[dict]] | None = None,
) -> DataFrame:
    """Compile and apply a VRL program to a DataFrame: event paths map
    to columns; the result keeps every (possibly reassigned) event
    field as a column. Used by the pipeline `remap` transform's
    `source:` key."""
    stmts = parse_program(source)
    # backticked col refs so literal dotted names like "c.c" resolve
    _guard_dotted_ambiguity(df.schema)
    env = Env({"." + c: F.col(f"`{c}`" if "." in c else c) for c in df.columns})
    env.top = set(df.columns)
    # seed type knowledge the schema already carries: kind-dispatching
    # kernels (slice/is_empty) need to know a column is an ARRAY, and
    # timestamps drive format_timestamp — without this the registry
    # defaults to the string code path and fails analysis
    for f in df.schema.fields:
        tn = f.dataType.typeName()
        if tn == "array":
            env.tdef["." + f.name] = {"array": True}
        elif tn.startswith("timestamp"):
            env.tdef["." + f.name] = {"timestamp": True}
    if enrichment_rows:
        env.enrichment_rows = enrichment_rows
    comp = Compiler(env)
    try:
        for s in stmts:
            # a bare trailing '.' (common program terminator) is a
            # no-op here
            if isinstance(s, Path) and not s.segments:
                continue
            comp.exec_stmt(s)
    except VrlStaticAbort:
        # production remap must route aborted rows, not truncate —
        # the interpreter tier owns abort semantics
        raise VrlCompileError("abort (out of scope; use vrl_interp)")
    cols = [
        comp.env.bind["." + n].alias(n) for n in comp._top_fields()
    ]
    return df.select(*cols)


def eval_vrl(spark, source: str, event: dict | None = None):
    """Evaluate a VRL program against a single JSON-ish event —
    the `vector vrl` REPL / golden-corpus analogue. Returns
    (final_value, event_dict) computed via a one-row Spark plan.
    Runs with ANSI off (VRL expressions fail to errors the program
    recovers from; fail-to-null is the Spark equivalent) and a UTC
    session zone (the reference serializes timestamps RFC3339-UTC)."""
    stmts = parse_program(source)
    env = Env({})
    for k, v in (event or {}).items():
        env.bind["." + k] = _py_to_col(v)
        env.shape["." + k] = _shape_of_py(v)
        env.py["." + k] = v
        env.top.add(k)
    # the REPL/corpus event IS the whole input: an absent field is
    # value-null at runtime (its static TYPE stays external-any —
    # the reference never closes external objects)
    env.event_closed = True
    comp = Compiler(env, probe_spark=spark)
    confs = {
        "spark.sql.ansi.enabled": "false",
        "spark.sql.session.timeZone": "UTC",
    }
    saved = {}
    for k, v in confs.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        val_col = None
        val_spec = None  # nested lists of leaf indices into leaf_cols
        leaf_cols: list[Column] = []
        aborted = False

        def _leaf(c: Column) -> int:
            leaf_cols.append(c)
            return len(leaf_cols) - 1

        def _split_item(item):
            # an element-tracked array variable splits into its
            # per-element columns (each keeps its native type);
            # anything else is one leaf column
            if isinstance(item, Var):
                el = comp.env.elems.get(item.name)
                if el is not None:
                    return [_leaf(c) for c, _sh in el]
            return _leaf(comp.compile(item))

        for i, s in enumerate(stmts):
            try:
                if i == len(stmts) - 1 and isinstance(s, Arr):
                    # VRL arrays are heterogeneous; a mixed final
                    # array would coerce to array<string> as ONE
                    # Spark column. Evaluate the literal's elements
                    # as separate columns so each keeps its native
                    # type (the corpus `[.a1, .a2, .a3]` pattern)
                    val_spec = [_split_item(e) for e in s.items]
                    break
                if (
                    i == len(stmts) - 1
                    and isinstance(s, Var)
                    and s.name in comp.env.elems
                ):
                    # final expression is a push-built array variable
                    # (the for_each-accumulation corpus pattern):
                    # same per-element split
                    val_spec = [
                        _leaf(c) for c, _sh in comp.env.elems[s.name]
                    ]
                    break
                out = comp.exec_stmt(s)
            except VrlStaticAbort:
                # static program exit: the result is the event state
                # reached so far (what the reference corpus records)
                aborted = True
                break
            val_col = out if isinstance(out, Column) else None
        names = comp._top_fields()
        sel = [
            comp.env.bind["." + n].alias(f"f_{i}")
            for i, n in enumerate(names)
        ]
        if val_spec is not None:
            sel.extend(
                c.alias(f"_val_{i}") for i, c in enumerate(leaf_cols)
            )
        sel.append(
            (val_col if val_col is not None else F.lit(None)).alias("_val")
        )
        row = spark.range(1).select(*sel).first()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    ev = {n: _to_py(row[f"f_{i}"]) for i, n in enumerate(names)}
    if aborted:
        return ev, ev
    if val_spec is not None:

        def _build(spec):
            if isinstance(spec, list):
                return [_build(x) for x in spec]
            return _to_py(row[f"_val_{spec}"])

        return _build(val_spec), ev
    return _to_py(row["_val"]), ev


def _to_py(v):
    import datetime as _dt

    if isinstance(v, _dt.datetime):
        s = v.strftime("%Y-%m-%dT%H:%M:%S")
        if v.microsecond:
            s += ("%.6f" % (v.microsecond / 1e6))[1:].rstrip("0")
        return s + "Z"
    if hasattr(v, "asDict"):
        return {k: _to_py(x) for k, x in v.asDict().items()}
    if isinstance(v, list):
        return [_to_py(x) for x in v]
    if isinstance(v, dict):
        return {k: _to_py(x) for k, x in v.items()}
    return v


def vrl_condition(schema_or_cols, source: str) -> Column:
    """Compile a VRL CONDITION (src/conditions/vrl.rs: a program whose
    final expression is the boolean verdict) to one Catalyst boolean
    Column over the given schema's columns. Intermediate assignments
    (variables or event fields) participate; only the last
    expression's value is returned."""
    cols = (
        [f.name for f in schema_or_cols.fields]
        if hasattr(schema_or_cols, "fields")
        else list(schema_or_cols)
    )
    stmts = parse_program(source)
    if hasattr(schema_or_cols, "fields"):
        _guard_dotted_ambiguity(schema_or_cols)
    env = Env({"." + c: F.col(f"`{c}`" if "." in c else c) for c in cols})
    env.top = set(cols)
    env.sparse_cols = {"." + c for c in cols}
    if hasattr(schema_or_cols, "fields"):
        for f in schema_or_cols.fields:
            if f.dataType.typeName().startswith("timestamp"):
                env.tdef["." + f.name] = {"timestamp": True}
    comp = Compiler(env)
    val = None
    for s in stmts:
        if isinstance(s, Path) and not s.segments:
            continue
        out = comp.exec_stmt(s)
        val = out if isinstance(out, Column) else None
    if val is None:
        raise VrlCompileError("VRL condition has no final expression")
    return val.cast("boolean")
