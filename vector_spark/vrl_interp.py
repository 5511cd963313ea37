"""Full-semantics VRL interpreter — the remap slow path.

The Column compiler (vrl_lang.py) is the fast path: it turns a VRL
program into Catalyst projections, but Spark's static typing cannot
express the dynamically-typed tail of the language (heterogeneous
arrays, typed runtime-error values, abort, type_def, dynamic path
coalescing). The reference executes VRL as a per-event tree walk
(lib/vrl/compiler/src/expression/*.rs); this module is that tree
walk in Python, run executor-side over Arrow batches via
mapInPandas (see remap_interp) so the slow path still scales out —
one Python process per core, no driver loop.

Semantics matched to the reference test corpus
(lib/vrl/tests/tests, harvested into tests/fixtures/
vrl_programs.json):
  * runtime errors carry the reference's exact messages
    ("can't add type string to integer", "can't divide by zero",
    'function call error for "f" at (s:e): ...') and are caught by
    `??` and `ok, err =` assignments (expression/op.rs,
    expression/assignment.rs)
  * on a failed fallible assignment the ok-target receives the
    expression's type-def default value ([] / {} / 0.0 / ...), and
    the assignment expression resolves to the error message
  * abort ends the program; the event as-of the abort is the result
    (expression/abort.rs)
  * type_def() is answered by a static type-flow analysis that
    unions if-branches and treats abort as `never`
    (lib/vrl/compiler/src/type_def.rs)
  * blocks share the enclosing scope for existing variables and
    drop newly-introduced ones (expression/block.rs); closures
    iterate objects in BTreeMap (sorted-key) order
"""

from __future__ import annotations

import base64
import copy
import datetime as dt
import hashlib
import ipaddress
import json
import math
import re
import uuid

from .vrl_lang import (

    Abort,
    Arr,
    Assign,
    Bin,
    Block,
    Call,
    If,
    Lit,
    MultiAssign,
    Obj,
    Path,
    Regex,
    TsLit,
    Un,
    Var,
    VarPath,
    VrlCompileError,
    parse_program,
)


def _fast_copy(v):
    """Deep copy for JSON-ish event data (dict/list/scalars; scalars
    incl. datetime are immutable so references are safe). ~6x faster
    than copy.deepcopy, which dominates the per-event profile."""
    if isinstance(v, dict):
        return {k: _fast_copy(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_fast_copy(x) for x in v]
    return v


def _td_copy(d):
    """Deep copy for type-def trees (nested dicts with bool/dict
    leaves) — the other deepcopy hot spot."""
    if isinstance(d, dict):
        return {k: _td_copy(v) for k, v in d.items()}
    return d


__all__ = [
    "VrlRuntimeError",
    "run_vrl",
    "interp_eval",
    "remap_interp",
]


class VrlRuntimeError(Exception):
    def __init__(self, message: str):
        super().__init__(message)
        self.message = message


class _AbortSignal(Exception):
    pass


class _AssertError(VrlRuntimeError):
    """assert failures abort the program (not catchable by ??)."""


_MISSING = object()


class VRegex:
    def __init__(self, pattern: str):
        self.pattern = pattern
        self.re = re.compile(pattern)

    def __repr__(self):  # pragma: no cover
        return f"r'{self.pattern}'"


def type_name(v) -> str:
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, int):
        return "integer"
    if isinstance(v, float):
        return "float"
    if isinstance(v, str):
        return "string"
    if isinstance(v, list):
        return "array"
    if isinstance(v, dict):
        return "object"
    if isinstance(v, VRegex):
        return "regex"
    if isinstance(v, dt.datetime):
        return "timestamp"
    return type(v).__name__


# ---------------------------------------------------------------------------
# type-def lattice (type_def.rs): nested {"kind": True} dicts.
# objects: {"object": {key: td}, "__unknown__": "any" | None}
# ---------------------------------------------------------------------------

TD_ANY = {"any": True}
TD_NEVER = {"never": True}
TD_NULL = {"null": True}


def td_of_value(v, external: bool = False) -> dict:
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
    if isinstance(v, dt.datetime):
        return {"timestamp": True}
    if isinstance(v, VRegex):
        return {"regex": True}
    if isinstance(v, list):
        return {"array": {str(i): td_of_value(x) for i, x in enumerate(v)}}
    if isinstance(v, dict):
        td = {"object": {k: td_of_value(x, external) for k, x in v.items()}}
        if external:
            td["__unknown__"] = "any"
        return td
    return dict(TD_ANY)


def td_union(a: dict | None, b: dict | None) -> dict:
    a = a if a is not None else dict(TD_ANY)
    b = b if b is not None else dict(TD_ANY)
    if a.get("never"):
        return _fast_copy(b)
    if b.get("never"):
        return _fast_copy(a)
    if a.get("any") or b.get("any"):
        return dict(TD_ANY)
    out: dict = {}
    for k in set(a) | set(b):
        if k == "object":
            ao, bo = a.get("object"), b.get("object")
            if ao is None or bo is None:
                out["object"] = _fast_copy(ao if bo is None else bo)
            else:
                # a key absent on one side unions with that side's
                # unknown-field kind: `any` when the object carries
                # `__unknown__: any` (external data), else null
                a_miss = TD_ANY if a.get("__unknown__") == "any" else TD_NULL
                b_miss = TD_ANY if b.get("__unknown__") == "any" else TD_NULL
                keys = set(ao) | set(bo)
                out["object"] = {
                    kk: td_union(
                        ao.get(kk, a_miss), bo.get(kk, b_miss)
                    )
                    for kk in keys
                }
        elif k == "array":
            out["array"] = a.get("array") or b.get("array") or {}
        elif k == "array_unknown_exact":
            au, bu = a.get(k), b.get(k)
            out[k] = (
                td_union(au, bu)
                if au is not None and bu is not None
                else _fast_copy(au if bu is None else bu)
            )
        elif k == "__unknown__":
            if a.get(k) == "any" or b.get(k) == "any":
                out[k] = "any"
        else:
            out[k] = True
    return out


def td_render(td: dict | None) -> dict:
    """Strip internal markers for the type_def() return value."""
    if td is None:
        return dict(TD_ANY)
    out = {}
    for k, v in td.items():
        if k == "__unknown__":
            continue
        if k == "object":
            out["object"] = {kk: td_render(vv) for kk, vv in v.items()}
        elif k == "array_unknown_exact":
            # unknown-element kind of an array, rendered the way the
            # reference's JSON type_def output does (vrl/tests internal/
            # closure_arg_kind.vrl expected result)
            out["array_unknown_exact"] = td_render(v)
        elif k == "array":
            out["array"] = (
                {kk: td_render(vv) for kk, vv in v.items()}
                if isinstance(v, dict)
                else {}
            )
        else:
            out[k] = True
    return out


def td_at(root: dict, segs) -> dict:
    """Walk a type-def along a path (type_def.rs at_path)."""
    td = root
    for seg in segs:
        if isinstance(seg, tuple):
            seg = seg[1][-1]
        if td.get("any"):
            return dict(TD_ANY)
        if isinstance(seg, int):
            arr = td.get("array")
            if arr is None:
                return dict(TD_ANY) if td.get("any") else dict(TD_NULL)
            td = arr.get(
                str(seg), td.get("array_unknown_exact", TD_NULL)
            )
            continue
        obj = td.get("object")
        if obj is None:
            return dict(TD_ANY) if td.get("any") else dict(TD_NULL)
        if seg in obj:
            td = obj[seg]
        elif td.get("__unknown__") == "any":
            return dict(TD_ANY)
        else:
            return dict(TD_NULL)
    return _fast_copy(td)


def td_set(root: dict, segs, new_td) -> dict:
    """Return a copy of `root` with the td at `segs` replaced."""

    def set_in(td, segs):
        if not segs:
            return new_td
        seg = segs[0]
        if isinstance(seg, tuple):
            seg = seg[1][-1]
        td = dict(td) if isinstance(td, dict) else {}
        if isinstance(seg, int):
            arr = dict(td.get("array") or {})
            arr[str(seg)] = set_in(arr.get(str(seg), {}), segs[1:])
            base = {"array": arr}
        else:
            obj = dict(td.get("object") or {})
            obj[seg] = set_in(obj.get(seg, {}), segs[1:])
            base = {"object": obj}
            if td.get("__unknown__"):
                base["__unknown__"] = td["__unknown__"]
        return base

    return set_in(root, segs)


def td_del(root: dict, segs) -> dict:
    """Return a copy of `root` with the td at `segs` removed."""

    def del_in(td, segs):
        if not isinstance(td, dict):
            return td
        seg = segs[0]
        if isinstance(seg, tuple):
            seg = seg[1][-1]
        td = dict(td)
        obj = td.get("object")
        if obj is None:
            return td
        obj = dict(obj)
        if len(segs) == 1:
            obj.pop(seg, None)
        elif seg in obj:
            obj[seg] = del_in(obj[seg], segs[1:])
        td["object"] = obj
        return td

    return del_in(root, segs)


def td_element(td: dict | None) -> dict:
    """Element kind of a collection td: union of the exact
    array/object entries plus the unknown-element kind
    (type_def.rs Collection::reduced_kind)."""
    if td is None or td.get("any"):
        return dict(TD_ANY)
    out: dict | None = None
    for part in ("array", "object"):
        for sub in (td.get(part) or {}).values():
            out = sub if out is None else td_union(out, sub)
    unk = td.get("array_unknown_exact")
    if unk is not None:
        out = unk if out is None else td_union(out, unk)
    if td.get("__unknown__") == "any":
        return dict(TD_ANY)
    return _fast_copy(out) if out is not None else dict(TD_ANY)


def td_default(td: dict | None):
    """Default value for a failed fallible assignment's ok-target
    (type_def.rs default_value): the expression's primary kind."""
    if td is None:
        return None
    for kind, dv in (
        ("array", []),
        ("object", {}),
        ("bytes", ""),
        ("float", 0.0),
        ("integer", 0),
        ("boolean", False),
    ):
        if kind in td:
            return _fast_copy(dv)
    return None


# per-function return tdefs (only kinds the corpus observes)
_FN_TDEF = {
    "push": {"array": {}},
    "append": {"array": {}},
    "flatten": {"array": {}},
    "compact": {"any": True},
    "slice": {"any": True},
    "split": {"array": {}},
    "merge": {"object": {}},
    "object": {"object": {}},
    "array": {"array": {}},
    "parse_json": {"any": True},
    "parse_key_value": {"object": {}},
    "parse_common_log": {"object": {}},
    "parse_apache_log": {"object": {}},
    "parse_syslog": {"object": {}},
    "parse_grok": {"object": {}},
    "parse_regex": {"object": {}},
    "parse_timestamp": {"timestamp": True},
    "to_timestamp": {"timestamp": True},
    "now": {"timestamp": True},
    "to_string": {"bytes": True},
    "string": {"bytes": True},
    "upcase": {"bytes": True},
    "downcase": {"bytes": True},
    "join": {"bytes": True},
    "replace": {"bytes": True},
    "strip_whitespace": {"bytes": True},
    "encode_json": {"bytes": True},
    "sha1": {"bytes": True},
    "sha2": {"bytes": True},
    "sha3": {"bytes": True},
    "md5": {"bytes": True},
    "uuid_v4": {"bytes": True},
    "to_int": {"integer": True},
    "int": {"integer": True},
    "length": {"integer": True},
    "strlen": {"integer": True},
    "to_float": {"float": True},
    "float": {"float": True},
    "to_bool": {"boolean": True},
    "bool": {"boolean": True},
    "exists": {"boolean": True},
    "includes": {"boolean": True},
    "contains": {"boolean": True},
    "starts_with": {"boolean": True},
    "ends_with": {"boolean": True},
    "match": {"boolean": True},
    "ip_cidr_contains": {"boolean": True},
    "assert": {"boolean": True},
    "log": {"null": True},
    "for_each": {"null": True},
    "timestamp": {"timestamp": True},
    "type_def": {"object": {}},
    "set": {"any": True},
    "remove": {"any": True},
    "unnest": {"array": {}},
    "get_metadata_field": {"any": True},
    # exact output shape (parse_aws_cloudwatch_log_subscription_message
    # .rs type_def): arrays of unknown length carry their element kind
    # as array_unknown_exact
    "parse_aws_cloudwatch_log_subscription_message": {
        "object": {
            "owner": {"bytes": True},
            "message_type": {"bytes": True},
            "log_group": {"bytes": True},
            "log_stream": {"bytes": True},
            "subscription_filters": {
                "array": {},
                "array_unknown_exact": {"bytes": True},
            },
            "log_events": {
                "array": {},
                "array_unknown_exact": {
                    "object": {
                        "id": {"bytes": True},
                        "message": {"bytes": True},
                        "timestamp": {"timestamp": True},
                    }
                },
            },
        }
    },
}


# ---------------------------------------------------------------------------
# interpreter
# ---------------------------------------------------------------------------


class Interp:
    def __init__(
        self,
        event: dict | None,
        metadata: dict | None = None,
        _skip_types: bool = False,
    ):
        self.event = _fast_copy(event) if event else {}
        self.meta: dict = _fast_copy(metadata) if metadata else {}
        self.scopes: list[dict] = [{}]
        # static type-flow state (skipped when a precomputed trace
        # supplies per-statement states — see run(ttrace=...))
        self.tvars: dict[str, dict] = {}
        self.troot: dict = (
            {} if _skip_types else td_of_value(self.event, external=True)
        )
        self.tmeta: dict = td_of_value(self.meta) if metadata else {"object": {}}
        # set by build_type_trace to capture (node, _elem_td) stamps
        self._elem_stamps: list | None = None

    # ---- program ----

    def run(self, stmts: list, ttrace: list | None = None):
        """Execute the program. The type-flow (t_stmt) trajectory is a
        pure function of (program, input SHAPE) — it never branches on
        event values — so batch callers precompute it once per input
        shape (build_type_trace) and pass `ttrace`: per-statement
        (tvars, troot, tmeta) snapshots. That removes the entire
        per-event static-analysis cost, which profiling shows
        dominates the interpreter hot path."""
        val = None
        self.aborted = False
        try:
            if ttrace is None:
                for s in stmts:
                    self.t_stmt(s)
                    val = self.exec(s)
            else:
                for s, state in zip(stmts, ttrace):
                    self.tvars = dict(state[0])
                    self.troot = state[1]
                    self.tmeta = state[2]
                    val = self.exec(s)
        except _AbortSignal:
            self.aborted = True
            return self.event, self.event
        return val, self.event

    # ---- scope helpers ----

    def get_var(self, name: str):
        for sc in reversed(self.scopes):
            if name in sc:
                return sc[name]
        return _MISSING

    def set_var(self, name: str, value):
        for sc in reversed(self.scopes):
            if name in sc:
                sc[name] = value
                return
        self.scopes[-1][name] = value

    # ---- path helpers (shared by event and var containers) ----

    @staticmethod
    def _resolve_seg(container, seg, create: bool):
        """One query step. Returns (key, parent) with parent possibly
        rebuilt when create=True."""
        if isinstance(seg, tuple) and seg[0] == "|":
            # dynamic coalescing: first alternative that exists; for
            # writes (create=True) the reference materializes the
            # last alternative when none exist
            alts = seg[1]
            if isinstance(container, dict):
                for a in alts:
                    if a in container:
                        return a
            return alts[-1] if create else _MISSING
        return seg

    @classmethod
    def query(cls, container, segs):
        cur = container
        for seg in segs:
            key = cls._resolve_seg(cur, seg, create=False)
            if key is _MISSING:
                return _MISSING
            if isinstance(key, int):
                if not isinstance(cur, list):
                    return _MISSING
                i = key if key >= 0 else len(cur) + key
                if not (0 <= i < len(cur)):
                    return _MISSING
                cur = cur[i]
            else:
                if not isinstance(cur, dict) or key not in cur:
                    return _MISSING
                cur = cur[key]
        return cur

    @classmethod
    def insert(cls, container, segs, value):
        """Set `segs` inside container (dict/list), creating
        intermediate objects/arrays and padding arrays with null —
        lib/vrl/compiler path insertion semantics. Returns the
        (possibly replaced) container."""
        if not segs:
            return value
        seg = cls._resolve_seg(container, segs[0], create=True)
        rest = segs[1:]
        if isinstance(seg, int):
            if not isinstance(container, list):
                container = []
            if seg < 0:
                n = -seg
                if len(container) < n:
                    # underflow prepends: [elem, null*(n-len-1)] ++ old
                    # (lib/vrl path insertion semantics)
                    head = cls.insert(None, rest, value) if rest else value
                    return [head] + [None] * (n - len(container) - 1) + container
                i = len(container) - n
            else:
                i = seg
            while len(container) <= i:
                container.append(None)
            container[i] = cls.insert(
                container[i] if rest else None, rest, value
            )
            return container
        if not isinstance(container, dict):
            container = {}
        container[seg] = cls.insert(
            container.get(seg) if rest else None, rest, value
        )
        return container

    @classmethod
    def delete(cls, container, segs):
        """Remove segs; returns deleted value (null if absent)."""
        parent = cls.query(container, segs[:-1]) if len(segs) > 1 else container
        if parent is _MISSING:
            return None
        key = cls._resolve_seg(parent, segs[-1], create=False)
        if key is _MISSING:
            return None
        if isinstance(key, int) and isinstance(parent, list):
            i = key if key >= 0 else len(parent) + key
            if 0 <= i < len(parent):
                return parent.pop(i)
            return None
        if isinstance(parent, dict) and key in parent:
            return parent.pop(key)
        return None

    # ---- target normalization ----

    @staticmethod
    def target_of(node):
        """Normalize an lvalue-ish AST to ('event', segs) |
        ('var', name, segs) | None."""
        if isinstance(node, Path):
            return ("event", node.segments)
        if isinstance(node, Var):
            return ("var", node.name, [])
        if isinstance(node, VarPath):
            return ("var", node.name, node.segments)
        # postfix chains: value.ttl parses as Bin(getfield, Var, Lit)
        if isinstance(node, Bin) and node.op in (
            "getfield", "index", "coalfield",
        ):
            base = Interp.target_of(node.left)
            if base is None or base[0] != "var":
                return None
            seg = (
                ("|", node.right.value)
                if node.op == "coalfield"
                else node.right.value
            )
            return ("var", base[1], base[2] + [seg])
        return None

    def assign_to(self, target, value):
        kind = target[0]
        if kind == "event":
            segs = target[1]
            if not segs:
                if not isinstance(value, (dict, list)):
                    raise VrlRuntimeError(
                        f"can't assign {type_name(value)} to the root"
                    )
                # arrays at the root model multi-event expansion
                # (lib/vector-core LogEvent::Array / unnest patterns)
                self.event = value
                return
            self.event = self.insert(self.event, segs, value)
        else:
            _, name, segs = target[0], target[1], target[2]
            if not segs:
                self.set_var(name, value)
                return
            cur = self.get_var(name)
            if cur is _MISSING or not isinstance(cur, (dict, list)):
                cur = [] if isinstance(segs[0], int) else {}
            self.set_var(name, self.insert(cur, segs, value))

    # ---- static type-flow (type_def.rs) ----

    def t_get_path(self, segs) -> dict:
        return td_at(self.troot, segs)

    def t_set_path(self, segs, new_td):
        self.troot = td_set(self.troot, segs, new_td)

    def t_del_path(self, segs):
        if segs:
            self.troot = td_del(self.troot, segs)

    def t_state(self):
        return (
            _td_copy(self.tvars),
            _td_copy(self.troot),
            _td_copy(self.tmeta),
        )

    def t_restore(self, st):
        self.tvars = _td_copy(st[0])
        self.troot = _td_copy(st[1])
        self.tmeta = _td_copy(st[2])

    def t_union_states(self, a, b):
        avars, aroot, ameta = a
        bvars, broot, bmeta = b
        names = set(avars) | set(bvars)
        self.tvars = {
            n: td_union(avars.get(n), bvars.get(n)) for n in names
        }
        self.troot = td_union(aroot, broot)
        self.tmeta = td_union(ameta, bmeta)

    def t_stmt(self, node) -> dict:
        """Apply a statement's static type effects; returns its td."""
        if isinstance(node, Abort):
            return dict(TD_NEVER)
        if isinstance(node, Assign):
            td = self.t_expr(node.expr)
            if node.op == "|=":
                td = td_union(td, {"object": {}})
            self._t_assign(node.target, td)
            return td
        if isinstance(node, MultiAssign):
            td = self.t_expr(node.expr)
            self._t_assign(node.ok, td)
            self._t_assign(node.err, td_union(TD_NULL, {"bytes": True}))
            return td
        return self.t_expr(node)

    def _t_assign(self, target, td):
        t = self.target_of(target)
        if t is None:
            return
        if t[0] == "event":
            if not t[1]:
                self.troot = td
            else:
                self.t_set_path(t[1], td)
        else:
            _, name, segs = t
            if not segs:
                self.tvars[name] = td
            else:
                base = self.tvars.get(name, {"object": {}})

                def set_in(d, segs):
                    if not segs:
                        return td
                    seg = segs[0]
                    if isinstance(seg, tuple):
                        seg = seg[1][-1]
                    d = dict(d) if isinstance(d, dict) else {}
                    key = "array" if isinstance(seg, int) else "object"
                    sub = dict(d.get(key) or {})
                    sk = str(seg) if isinstance(seg, int) else seg
                    sub[sk] = set_in(sub.get(sk, {}), segs[1:])
                    return {key: sub}

                self.tvars[name] = set_in(base, segs)

    def t_expr(self, node) -> dict:
        if isinstance(node, Lit):
            return td_of_value(node.value)
        if isinstance(node, TsLit):
            return {"timestamp": True}
        if isinstance(node, Regex):
            return {"regex": True}
        if isinstance(node, Arr):
            return {
                "array": {
                    str(i): self.t_expr(x)
                    for i, x in enumerate(node.items)
                }
            }
        if isinstance(node, Obj):
            return {
                "object": {k: self.t_expr(v) for k, v in node.pairs}
            }
        if isinstance(node, Var):
            return _td_copy(self.tvars.get(node.name, dict(TD_ANY)))
        if isinstance(node, VarPath):
            base = self.tvars.get(node.name)
            if base is None:
                return dict(TD_ANY)
            td = base
            for seg in node.segments:
                if isinstance(seg, tuple):
                    seg = seg[1][-1]
                if td.get("any"):
                    return dict(TD_ANY)
                key = "array" if isinstance(seg, int) else "object"
                sub = td.get(key)
                if sub is None:
                    return dict(TD_ANY)
                sk = str(seg) if isinstance(seg, int) else seg
                td = sub.get(sk, dict(TD_NULL))
            return _fast_copy(td)
        if isinstance(node, Path):
            return self.t_get_path(node.segments)
        if isinstance(node, Abort):
            return dict(TD_NEVER)
        if isinstance(node, Block):
            # non-paren blocks open a runtime scope: variables FIRST
            # introduced inside vanish at exit (set_var writes outer
            # scopes for pre-existing names), so their static types
            # must vanish too — event/metadata mutations persist
            pre_vars = None if node.paren else set(self.tvars)
            td: dict = dict(TD_NULL)
            for s in node.stmts:
                td = self.t_stmt(s)
                if td.get("never"):
                    break
            if pre_vars is not None:
                self.tvars = {
                    k: v for k, v in self.tvars.items() if k in pre_vars
                }
            return td
        if isinstance(node, If):
            pre = self.t_state()
            t_td = dict(TD_NULL)
            for s in node.then:
                t_td = self.t_stmt(s)
                if t_td.get("never"):
                    break
            then_state = self.t_state()
            self.t_restore(pre)
            e_td = dict(TD_NULL)
            if node.orelse:
                for s in node.orelse:
                    e_td = self.t_stmt(s)
                    if e_td.get("never"):
                        break
            else:
                e_td = dict(TD_NULL)
            else_state = self.t_state()
            self.t_union_states(then_state, else_state)
            return td_union(t_td, e_td)
        if isinstance(node, Un):
            if node.op == "!":
                return {"boolean": True}
            return self.t_expr(node.operand)
        if isinstance(node, Bin):
            return self.t_bin(node)
        if isinstance(node, Call):
            return self.t_call(node)
        return dict(TD_ANY)

    def t_bin(self, node: Bin) -> dict:
        op = node.op
        if op in ("==", "!=", "<", "<=", ">", ">=", "&&"):
            return {"boolean": True}
        if op == "??":
            lt = self.t_expr(node.left)
            return td_union(lt, self.t_expr(node.right))
        if op == "||":
            return td_union(
                self.t_expr(node.left), self.t_expr(node.right)
            )
        if op == "|":
            lt, rt = self.t_expr(node.left), self.t_expr(node.right)
            if lt.get("never"):
                return rt
            if rt.get("never"):
                return lt
            lo = lt.get("object", {}) or {}
            ro = rt.get("object", {}) or {}
            return {"object": {**lo, **ro}}
        if op in ("getfield", "index", "coalfield"):
            base = self.t_expr(node.left)
            if base.get("any"):
                return dict(TD_ANY)
            if op == "index" and "array" in base:
                return (base.get("array") or {}).get(
                    str(node.right.value), dict(TD_NULL)
                )
            if op == "getfield" and "object" in base:
                return (base.get("object") or {}).get(
                    node.right.value, dict(TD_NULL)
                )
            return dict(TD_ANY)
        if op in ("+", "-", "*", "/", "%"):
            lt, rt = self.t_expr(node.left), self.t_expr(node.right)
            if op == "/":
                return {"float": True}
            if "bytes" in lt or "bytes" in rt:
                return {"bytes": True}
            if "float" in lt or "float" in rt:
                return {"float": True}
            if "integer" in lt and "integer" in rt:
                return {"integer": True}
            return dict(TD_ANY)
        return dict(TD_ANY)

    def t_call(self, node: Call) -> dict:
        name = node.name
        if name == "del" and node.args:
            t = self.target_of(node.args[0])
            td = dict(TD_ANY)
            if t is not None and t[0] == "event":
                td = self.t_get_path(t[1])
                self.t_del_path(t[1])
            return td
        if name == "type_def":
            return {"object": {}}
        if name in (
            "get_metadata_field",
            "set_metadata_field",
            "remove_metadata_field",
        ) and node.args and isinstance(node.args[0], Path):
            segs = node.args[0].segments
            if name == "get_metadata_field":
                return (
                    _td_copy(self.tmeta)
                    if not segs
                    else td_at(self.tmeta, segs)
                )
            if name == "set_metadata_field":
                vtd = (
                    self.t_expr(node.args[1])
                    if len(node.args) > 1
                    else dict(TD_NULL)
                )
                if segs:
                    self.tmeta = td_set(self.tmeta, segs, vtd)
                else:
                    self.tmeta = vtd
                return dict(TD_NULL)
            # remove_metadata_field
            if segs:
                self.tmeta = td_del(self.tmeta, segs)
            else:
                self.tmeta = {"object": {}}
            return dict(TD_NULL)
        if name == "unnest" and node.args:
            # type_def.rs: unnest(.x) turns the root into an array
            # whose element is the root with .x replaced by the
            # array's element kind
            t = self.target_of(node.args[0])
            if t is not None:
                if t[0] == "event":
                    base_td, segs = self.troot, t[1]
                else:
                    base_td, segs = self.tvars.get(t[1]), t[2]
                if base_td is not None:
                    arr_td = td_at(base_td, segs)
                    elem = arr_td.get("array_unknown_exact")
                    if elem is None:
                        elem = (
                            td_element(arr_td)
                            if "array" in arr_td
                            else dict(TD_ANY)
                        )
                    new_root = (
                        td_set(base_td, segs, elem) if segs else elem
                    )
                    return {
                        "array": {},
                        "array_unknown_exact": new_root,
                    }
            return {"array": {}}
        if node.closure is not None and node.args:
            # stash the closure argument's element kind NOW — the
            # enclosing assignment's t_stmt overwrites the state
            # before exec reaches the closure body (closure_arg_kind)
            try:
                node._elem_td = td_element(self.t_expr(node.args[0]))
            except Exception:
                node._elem_td = dict(TD_ANY)
            # the AST is SHARED across events: record the stamp so a
            # memoized trace can restore its own per-call-site kinds
            # before exec (a later trace for a different shape would
            # otherwise leave ITS kinds on the node)
            if self._elem_stamps is not None:
                self._elem_stamps.append((node, node._elem_td))
        return _td_copy(_FN_TDEF.get(name, dict(TD_ANY)))

    # ---- dynamic execution ----

    def exec(self, node):
        if isinstance(node, Assign):
            return self.exec_assign(node)
        if isinstance(node, MultiAssign):
            return self.exec_multi(node)
        return self.eval(node)

    def exec_assign(self, node: Assign):
        t = self.target_of(node.target)
        if t is None:
            raise VrlCompileError(
                f"bad assignment target {node.target!r}"
            )
        if node.op == "|=":
            cur = self.eval_target(t)
            rhs = self.eval(node.expr)
            value = self._merge(
                cur if isinstance(cur, dict) else {}, rhs
            )
        else:
            value = self.eval(node.expr)
        self.assign_to(t, value)
        return value

    def exec_multi(self, node: MultiAssign):
        ok_t = self.target_of(node.ok)
        err_t = self.target_of(node.err)
        try:
            value = self.eval(node.expr)
            if node.op == "|=":
                cur = self.eval_target(ok_t)
                value = self._merge(
                    cur if isinstance(cur, dict) else {}, value
                )
            if ok_t is not None:
                self.assign_to(ok_t, value)
            if err_t is not None:
                self.assign_to(err_t, None)
            return value
        except VrlRuntimeError as e:
            if isinstance(e, _AssertError):
                raise
            if ok_t is not None:
                self.assign_to(
                    ok_t, td_default(self.t_expr(node.expr))
                )
            if err_t is not None:
                self.assign_to(err_t, e.message)
            return e.message

    def eval_target(self, t):
        if t is None:
            return None
        if t[0] == "event":
            v = self.query(self.event, t[1]) if t[1] else self.event
        else:
            base = self.get_var(t[1])
            v = (
                self.query(base, t[2])
                if base is not _MISSING and t[2]
                else base
            )
        return None if v is _MISSING else v

    def eval(self, node):
        if isinstance(node, Lit):
            return _fast_copy(node.value)
        if isinstance(node, TsLit):
            return _parse_rfc3339(node.text)
        if isinstance(node, Regex):
            try:
                return VRegex(node.pattern)
            except re.error as e:
                raise VrlCompileError(f"bad regex: {e}")
        if isinstance(node, Arr):
            return [self.eval(i) for i in node.items]
        if isinstance(node, Obj):
            return {k: self.eval(v) for k, v in node.pairs}
        if isinstance(node, Path):
            v = self.query(self.event, node.segments)
            return None if v is _MISSING else _fast_copy(v)
        if isinstance(node, Var):
            v = self.get_var(node.name)
            if v is _MISSING:
                raise VrlCompileError(
                    f"undefined variable {node.name!r}"
                )
            return _fast_copy(v)
        if isinstance(node, VarPath):
            base = self.get_var(node.name)
            if base is _MISSING:
                raise VrlCompileError(
                    f"undefined variable {node.name!r}"
                )
            v = self.query(base, node.segments)
            return None if v is _MISSING else _fast_copy(v)
        if isinstance(node, Abort):
            if node.message is not None:
                self.eval(node.message)  # may itself abort
            raise _AbortSignal()
        if isinstance(node, Un):
            v = self.eval(node.operand)
            if node.op == "-":
                if isinstance(v, bool) or not isinstance(
                    v, (int, float)
                ):
                    raise VrlRuntimeError(
                        f"can't negate type {type_name(v)}"
                    )
                return -v
            if isinstance(v, bool):
                return not v
            raise VrlRuntimeError(
                f"can't negate type {type_name(v)}"
            )
        if isinstance(node, Bin):
            return self.eval_bin(node)
        if isinstance(node, If):
            cond = self.eval(node.cond)
            if not isinstance(cond, bool):
                raise VrlRuntimeError(
                    f"if predicate must be a boolean, got "
                    f"{type_name(cond)}"
                )
            branch = node.then if cond else node.orelse
            return self._run_block(branch, new_scope=True)
        if isinstance(node, Block):
            return self._run_block(
                node.stmts, new_scope=not node.paren
            )
        if isinstance(node, Call):
            return self.eval_call(node)
        raise VrlCompileError(f"cannot interpret node {node!r}")

    def _run_block(self, stmts, new_scope: bool):
        if new_scope:
            self.scopes.append({})
        try:
            val = None
            for s in stmts:
                val = self.exec(s)
            return val
        finally:
            if new_scope:
                self.scopes.pop()

    # ---- operators ----

    def eval_bin(self, node: Bin):
        op = node.op
        if op == "??":
            try:
                return self.eval(node.left)
            except VrlRuntimeError as e:
                if isinstance(e, _AssertError):
                    raise
                return self.eval(node.right)
        if op == "&&":
            l = self.eval(node.left)
            if l is None or l is False:
                return False
            if l is not True:
                raise VrlRuntimeError(
                    f"can't apply && to type {type_name(l)}"
                )
            r = self.eval(node.right)
            if r is None:
                return False
            if not isinstance(r, bool):
                raise VrlRuntimeError(
                    f"can't apply && to type {type_name(r)}"
                )
            return r
        if op == "||":
            l = self.eval(node.left)
            if l is None or l is False:
                return self.eval(node.right)
            return l
        if op == "|":
            return self._merge(
                self.eval(node.left), self.eval(node.right)
            )
        l = self.eval(node.left)
        if op in ("getfield", "coalfield"):
            if l is None:
                return None
            key = node.right.value
            if isinstance(l, dict):
                if op == "coalfield":
                    for a in key:
                        if a in l:
                            return l[a]
                    return None
                return l.get(key)
            raise VrlRuntimeError(
                f"can't query type {type_name(l)}"
            )
        if op == "index":
            if l is None:
                return None
            if not isinstance(l, list):
                raise VrlRuntimeError(
                    f"can't index type {type_name(l)}"
                )
            i = node.right.value
            i = i if i >= 0 else len(l) + i
            return l[i] if 0 <= i < len(l) else None
        r = self.eval(node.right)
        if op == "==":
            return _strict_eq(l, r)
        if op == "!=":
            return not _strict_eq(l, r)
        if op in ("<", "<=", ">", ">="):
            return _compare(op, l, r)
        if op == "+":
            return _add(l, r)
        if op == "-":
            return _arith("-", l, r)
        if op == "*":
            return _mul(l, r)
        if op == "/":
            return _div(l, r)
        if op == "%":
            return _rem(l, r)
        raise VrlCompileError(f"operator {op!r} unsupported")

    @staticmethod
    def _merge(l, r, deep: bool = False):
        if not isinstance(l, dict) or not isinstance(r, dict):
            raise VrlRuntimeError(
                f"can't merge type {type_name(r)} into "
                f"{type_name(l)}"
            )
        out = _fast_copy(l)
        for k, v in r.items():
            if (
                deep
                and isinstance(out.get(k), dict)
                and isinstance(v, dict)
            ):
                out[k] = Interp._merge(out[k], v, True)
            else:
                out[k] = _fast_copy(v)
        return out

    # ---- calls ----

    def eval_call(self, node: Call):
        name = node.name
        # path/AST-argument builtins first
        special = _SPECIAL_FNS.get(name)
        if special is not None:
            return special(self, node)
        if node.closure is not None:
            return self._eval_closure_call(node)
        fn = _STDLIB.get(name)
        if fn is None:
            raise VrlCompileError(f"unknown function {name!r}")
        args = [self.eval(a) for a in node.args]
        kwargs = {k: self.eval(v) for k, v in node.kwargs.items()}
        try:
            return fn(args, kwargs)
        except _AssertError:
            # assertions ABORT the program; the span wrap below must
            # not downgrade them into a ??-catchable runtime error
            raise
        except VrlRuntimeError as e:
            span = node.span or (0, 0)
            raise VrlRuntimeError(
                f'function call error for "{name}" at '
                f"({span[0]}:{span[1]}): {e.message}"
            )
        except (TypeError, ValueError, KeyError, IndexError,
                AttributeError, OverflowError) as e:
            # stdlib kernels may leak raw Python exceptions on
            # pathological inputs (split on an empty separator, slice
            # with a non-int bound) — surface them as per-event
            # FALLIBLE errors like the reference, never as a task
            # kill that poisons the whole scan
            span = node.span or (0, 0)
            raise VrlRuntimeError(
                f'function call error for "{name}" at '
                f"({span[0]}:{span[1]}): {type(e).__name__}: {e}"
            )

    def _eval_closure_call(self, node: Call):
        name = node.name
        params, body = node.closure
        coll = self.eval(node.args[0]) if node.args else None
        recursive = False
        if node.kwargs.get("recursive") is not None:
            recursive = bool(self.eval(node.kwargs["recursive"]))
        # static kind of the closure's value argument: the element
        # kind of the collection expression (type_def.rs closure
        # binding — vrl/tests internal/closure_arg_kind.vrl). Prefer
        # the td stashed by t_call at the static phase — by exec time
        # the enclosing assignment has already overwritten the state.
        elem_td = getattr(node, "_elem_td", None)
        if elem_td is None:
            try:
                elem_td = td_element(self.t_expr(node.args[0]))
            except Exception:
                elem_td = dict(TD_ANY)
        key_td = (
            {"integer": True} if isinstance(coll, list) else {"bytes": True}
        )

        def run_body(bindings: dict, tbinds: dict | None = None):
            self.scopes.append(dict(bindings))
            saved: dict = {}
            for k, td in (tbinds or {}).items():
                saved[k] = self.tvars.get(k)
                self.tvars[k] = _td_copy(td)
            try:
                val = None
                for s in body:
                    val = self.exec(s)
                return val
            finally:
                self.scopes.pop()
                for k, old in saved.items():
                    if old is None:
                        self.tvars.pop(k, None)
                    else:
                        self.tvars[k] = old

        if name in ("map_values",):
            def map_vals(c):
                if isinstance(c, list):
                    out = []
                    for v in c:
                        if recursive and isinstance(v, (dict, list)):
                            v = map_vals(v)
                        out.append(
                            run_body(
                                {params[0]: _fast_copy(v)},
                                {params[0]: elem_td},
                            )
                        )
                    return out
                if isinstance(c, dict):
                    out = {}
                    for k in c:
                        v = c[k]
                        if recursive and isinstance(v, (dict, list)):
                            v = map_vals(v)
                        out[k] = run_body(
                            {params[0]: _fast_copy(v)},
                            {params[0]: elem_td},
                        )
                    return out
                raise VrlRuntimeError(
                    f"expected object or array, got {type_name(c)}"
                )

            return map_vals(coll)
        if name == "map_keys":
            if not isinstance(coll, dict):
                raise VrlRuntimeError(
                    f"expected object, got {type_name(coll)}"
                )

            def map_keys_in(c):
                if isinstance(c, dict):
                    return {
                        run_body(
                            {params[0]: k}, {params[0]: {"bytes": True}}
                        ): (
                            map_keys_in(v)
                            if recursive and isinstance(v, (dict, list))
                            else _fast_copy(v)
                        )
                        for k, v in c.items()
                    }
                if isinstance(c, list):
                    return [
                        map_keys_in(v)
                        if isinstance(v, (dict, list))
                        else _fast_copy(v)
                        for v in c
                    ]
                return _fast_copy(c)

            return map_keys_in(coll)
        if name == "for_each":
            if isinstance(coll, list):
                for i, v in enumerate(coll):
                    run_body(
                        {
                            params[0]: i,
                            params[1]: _fast_copy(v),
                        },
                        {params[0]: key_td, params[1]: elem_td},
                    )
                return None
            if isinstance(coll, dict):
                for k in sorted(coll):
                    run_body(
                        {
                            params[0]: k,
                            params[1]: _fast_copy(coll[k]),
                        },
                        {params[0]: key_td, params[1]: elem_td},
                    )
                return None
            raise VrlRuntimeError(
                f"expected object or array, got {type_name(coll)}"
            )
        if name == "filter":
            if isinstance(coll, list):
                return [
                    v
                    for i, v in enumerate(coll)
                    if run_body(
                        {params[0]: i, params[1]: _fast_copy(v)},
                        {params[0]: key_td, params[1]: elem_td},
                    )
                    is True
                ]
            if isinstance(coll, dict):
                return {
                    k: v
                    for k, v in coll.items()
                    if run_body(
                        {params[0]: k, params[1]: _fast_copy(v)},
                        {params[0]: key_td, params[1]: elem_td},
                    )
                    is True
                }
            raise VrlRuntimeError(
                f"expected object or array, got {type_name(coll)}"
            )
        raise VrlCompileError(
            f"function {name!r} does not take a closure"
        )


# ---------------------------------------------------------------------------
# operator kernels (expression/op.rs error messages)
# ---------------------------------------------------------------------------


def _strict_eq(a, b) -> bool:
    if isinstance(a, bool) != isinstance(b, bool):
        return False
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        if (type(a) is float) != (type(b) is float):
            return False
        return a == b
    if isinstance(a, dict) and isinstance(b, dict):
        return set(a) == set(b) and all(
            _strict_eq(a[k], b[k]) for k in a
        )
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(
            _strict_eq(x, y) for x, y in zip(a, b)
        )
    if type(a) is not type(b):
        return False
    if isinstance(a, VRegex):
        return a.pattern == b.pattern
    return a == b


def _is_num(v) -> bool:
    return isinstance(v, (int, float)) and not isinstance(v, bool)


def _compare(op, l, r):
    ok = (_is_num(l) and _is_num(r)) or (
        isinstance(l, str) and isinstance(r, str)
    )
    if not ok:
        raise VrlRuntimeError(
            f"can't compare type {type_name(l)} with "
            f"{type_name(r)}"
        )
    if op == "<":
        return l < r
    if op == "<=":
        return l <= r
    if op == ">":
        return l > r
    return l >= r


def _add(l, r):
    if _is_num(l) and _is_num(r):
        out = l + r
        return (
            float(out)
            if isinstance(l, float) or isinstance(r, float)
            else out
        )
    if isinstance(l, str) and isinstance(r, str):
        return l + r
    # null + string = string (the reference's concat-with-null rule)
    if l is None and isinstance(r, str):
        return r
    if isinstance(l, str) and r is None:
        return l
    raise VrlRuntimeError(
        f"can't add type {type_name(r)} to {type_name(l)}"
    )


def _arith(op, l, r):
    if _is_num(l) and _is_num(r):
        return l - r
    raise VrlRuntimeError(
        f"can't subtract type {type_name(r)} from {type_name(l)}"
    )


def _mul(l, r):
    if _is_num(l) and _is_num(r):
        return l * r
    if (
        isinstance(l, int)
        and not isinstance(l, bool)
        and isinstance(r, str)
    ):
        return r * l
    if (
        isinstance(r, int)
        and not isinstance(r, bool)
        and isinstance(l, str)
    ):
        return l * r
    raise VrlRuntimeError(
        f"can't multiply type {type_name(l)} by {type_name(r)}"
    )


def _div(l, r):
    if not (_is_num(l) and _is_num(r)):
        raise VrlRuntimeError(
            f"can't divide type {type_name(l)} by {type_name(r)}"
        )
    if r == 0:
        raise VrlRuntimeError("can't divide by zero")
    return l / r


def _rem(l, r):
    if not (_is_num(l) and _is_num(r)):
        raise VrlRuntimeError(
            f"can't calculate remainder of type {type_name(l)} "
            f"and {type_name(r)}"
        )
    if r == 0:
        raise VrlRuntimeError("can't divide by zero")
    out = math.fmod(l, r)
    if isinstance(l, int) and isinstance(r, int):
        return int(out)
    return out


# ---------------------------------------------------------------------------
# timestamps
# ---------------------------------------------------------------------------

_UTC = dt.timezone.utc


def _parse_rfc3339(s: str) -> dt.datetime:
    try:
        t = dt.datetime.fromisoformat(s.replace("Z", "+00:00"))
    except ValueError:
        raise VrlRuntimeError(f"unable to parse timestamp {s!r}")
    if t.tzinfo is None:
        t = t.replace(tzinfo=_UTC)
    return t.astimezone(_UTC)


def _chrono_to_strptime(fmt: str) -> str:
    # chrono strftime -> python strptime; the few divergent specifiers
    out = fmt.replace("%#z", "%z")
    return out


def serialize_timestamp(t: dt.datetime) -> str:
    if t.tzinfo is None:
        # Arrow/pandas hand mapInPandas tz-naive timestamps holding
        # session-zone wall time; the session zone is pinned UTC
        # (vector_spark.session), so naive == UTC here.
        t = t.replace(tzinfo=_UTC)
    t = t.astimezone(_UTC)
    s = t.strftime("%Y-%m-%dT%H:%M:%S")
    if t.microsecond:
        frac = f"{t.microsecond / 1e6:.6f}"[1:].rstrip("0")
        s += frac
    return s + "Z"


def to_jsonable(v):
    """Convert interpreter values to plain JSON-able data (the
    reference serializes timestamps RFC3339-UTC)."""
    if isinstance(v, dt.datetime):
        return serialize_timestamp(v)
    if isinstance(v, VRegex):
        return v.pattern
    if isinstance(v, list):
        return [to_jsonable(x) for x in v]
    if isinstance(v, dict):
        return {k: to_jsonable(x) for k, x in v.items()}
    return v


# ---------------------------------------------------------------------------
# stdlib (value-argument functions): fn(args, kwargs) -> value
# ---------------------------------------------------------------------------


def _arg(args, kwargs, idx, name, default=_MISSING):
    if idx < len(args):
        return args[idx]
    if name in kwargs:
        return kwargs[name]
    if default is _MISSING:
        raise VrlRuntimeError(f"missing required argument {name!r}")
    return default


def _want_str(v):
    if not isinstance(v, str):
        raise VrlRuntimeError(
            f"expected string, got {type_name(v)}"
        )
    return v


def _want_arr(v):
    if not isinstance(v, list):
        raise VrlRuntimeError(
            f"expected array, got {type_name(v)}"
        )
    return v


def _want_obj(v):
    if not isinstance(v, dict):
        raise VrlRuntimeError(
            f"expected object, got {type_name(v)}"
        )
    return v


def _pattern_of(v) -> str:
    if isinstance(v, VRegex):
        return v.pattern
    return re.escape(_want_str(v))


_STDLIB: dict = {}


def _fn(name):
    def deco(f):
        _STDLIB[name] = f
        return f

    return deco


@_fn("upcase")
def _f_upcase(args, kwargs):
    return _want_str(_arg(args, kwargs, 0, "value")).upper()


@_fn("downcase")
def _f_downcase(args, kwargs):
    return _want_str(_arg(args, kwargs, 0, "value")).lower()


@_fn("to_string")
def _f_to_string(args, kwargs):
    v = _arg(args, kwargs, 0, "value")
    if isinstance(v, str):
        return v
    if v is None:
        return ""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, int):
        return str(v)
    if isinstance(v, dt.datetime):
        return serialize_timestamp(v)
    raise VrlRuntimeError(
        f"can't convert {type_name(v)} to string"
    )


@_fn("string")
def _f_string(args, kwargs):
    return _want_str(_arg(args, kwargs, 0, "value"))


@_fn("int")
def _f_int(args, kwargs):
    v = _arg(args, kwargs, 0, "value")
    if isinstance(v, bool) or not isinstance(v, int):
        raise VrlRuntimeError(
            f"expected integer, got {type_name(v)}"
        )
    return v


@_fn("float")
def _f_float(args, kwargs):
    v = _arg(args, kwargs, 0, "value")
    if not isinstance(v, float):
        raise VrlRuntimeError(
            f"expected float, got {type_name(v)}"
        )
    return v


@_fn("bool")
def _f_bool(args, kwargs):
    v = _arg(args, kwargs, 0, "value")
    if not isinstance(v, bool):
        raise VrlRuntimeError(
            f"expected boolean, got {type_name(v)}"
        )
    return v


@_fn("array")
def _f_array(args, kwargs):
    return _want_arr(_arg(args, kwargs, 0, "value"))


@_fn("object")
def _f_object(args, kwargs):
    return _want_obj(_arg(args, kwargs, 0, "value"))


@_fn("timestamp")
def _f_timestamp(args, kwargs):
    v = _arg(args, kwargs, 0, "value")
    if not isinstance(v, dt.datetime):
        raise VrlRuntimeError(
            f"expected timestamp, got {type_name(v)}"
        )
    return v


@_fn("to_int")
def _f_to_int(args, kwargs):
    v = _arg(args, kwargs, 0, "value")
    if isinstance(v, bool):
        return 1 if v else 0
    if isinstance(v, int):
        return v
    if isinstance(v, float):
        return int(v)
    if isinstance(v, dt.datetime):
        return int(v.timestamp())
    if isinstance(v, str):
        try:
            return int(v.strip())
        except ValueError:
            try:
                return int(float(v.strip()))
            except ValueError:
                raise VrlRuntimeError(
                    f"could not parse {v!r} as integer"
                )
    if v is None:
        return 0
    raise VrlRuntimeError(
        f"unable to coerce {type_name(v)} into integer"
    )


@_fn("to_float")
def _f_to_float(args, kwargs):
    v = _arg(args, kwargs, 0, "value")
    if isinstance(v, bool):
        return 1.0 if v else 0.0
    if isinstance(v, (int, float)):
        return float(v)
    if isinstance(v, dt.datetime):
        return v.timestamp()
    if isinstance(v, str):
        try:
            return float(v.strip())
        except ValueError:
            raise VrlRuntimeError(
                f"could not parse {v!r} as float"
            )
    if v is None:
        return 0.0
    raise VrlRuntimeError(
        f"unable to coerce {type_name(v)} into float"
    )


@_fn("to_bool")
def _f_to_bool(args, kwargs):
    v = _arg(args, kwargs, 0, "value")
    if isinstance(v, bool):
        return v
    if isinstance(v, str):
        low = v.lower()
        if low in ("true", "t", "yes", "y", "1"):
            return True
        if low in ("false", "f", "no", "n", "0"):
            return False
        raise VrlRuntimeError(
            f"could not parse {v!r} as boolean"
        )
    if isinstance(v, (int, float)):
        return v != 0
    if v is None:
        return False
    raise VrlRuntimeError(
        f"unable to coerce {type_name(v)} into boolean"
    )


@_fn("to_timestamp")
def _f_to_timestamp(args, kwargs):
    v = _arg(args, kwargs, 0, "value")
    if isinstance(v, dt.datetime):
        return v
    if isinstance(v, bool):
        raise VrlRuntimeError(
            f"unable to coerce {type_name(v)} into timestamp"
        )
    if isinstance(v, (int, float)):
        return dt.datetime.fromtimestamp(v, _UTC)
    if isinstance(v, str):
        return _parse_rfc3339(v)
    raise VrlRuntimeError(
        f"unable to coerce {type_name(v)} into timestamp"
    )


@_fn("now")
def _f_now(args, kwargs):
    return dt.datetime.now(_UTC)


@_fn("uuid_v4")
def _f_uuid(args, kwargs):
    return str(uuid.uuid4())


@_fn("log")
def _f_log(args, kwargs):
    return None


@_fn("length")
def _f_length(args, kwargs):
    v = _arg(args, kwargs, 0, "value")
    if isinstance(v, (list, dict)):
        return len(v)
    if isinstance(v, str):
        return len(v.encode("utf-8"))
    raise VrlRuntimeError(
        f"expected array, object or string, got {type_name(v)}"
    )


@_fn("strlen")
def _f_strlen(args, kwargs):
    return len(_want_str(_arg(args, kwargs, 0, "value")))


@_fn("push")
def _f_push(args, kwargs):
    arr = _want_arr(_arg(args, kwargs, 0, "value"))
    item = _arg(args, kwargs, 1, "item")
    return arr + [item]


@_fn("append")
def _f_append(args, kwargs):
    return _want_arr(_arg(args, kwargs, 0, "value")) + _want_arr(
        _arg(args, kwargs, 1, "items")
    )


@_fn("flatten")
def _f_flatten(args, kwargs):
    v = _arg(args, kwargs, 0, "value")

    def flat_arr(a, out):
        for x in a:
            if isinstance(x, list):
                flat_arr(x, out)
            else:
                out.append(x)
        return out

    def flat_obj(o, out, prefix=""):
        for k, x in o.items():
            kk = f"{prefix}{k}"
            if isinstance(x, dict):
                flat_obj(x, out, kk + ".")
            else:
                out[kk] = x
        return out

    if isinstance(v, list):
        return flat_arr(v, [])
    if isinstance(v, dict):
        return flat_obj(v, {})
    raise VrlRuntimeError(
        f"expected array or object, got {type_name(v)}"
    )


@_fn("compact")
def _f_compact(args, kwargs):
    v = _arg(args, kwargs, 0, "value")
    recursive = _arg(args, kwargs, 1, "recursive", True)
    string = kwargs.get("string", True)
    obj = kwargs.get("object", True)
    arr = kwargs.get("array", True)
    null = kwargs.get("null", True)

    def empty(x):
        if x is None and null:
            return True
        if x == "" and string and isinstance(x, str):
            return True
        if x == {} and obj and isinstance(x, dict):
            return True
        if x == [] and arr and isinstance(x, list):
            return True
        return False

    def go(x):
        if isinstance(x, dict):
            out = {}
            for k, vv in x.items():
                if recursive and isinstance(vv, (dict, list)):
                    vv = go(vv)
                if not empty(vv):
                    out[k] = vv
            return out
        if isinstance(x, list):
            out = []
            for vv in x:
                if recursive and isinstance(vv, (dict, list)):
                    vv = go(vv)
                if not empty(vv):
                    out.append(vv)
            return out
        return x

    if not isinstance(v, (dict, list)):
        raise VrlRuntimeError(
            f"expected array or object, got {type_name(v)}"
        )
    return go(v)


@_fn("slice")
def _f_slice(args, kwargs):
    v = _arg(args, kwargs, 0, "value")
    start = _arg(args, kwargs, 1, "start")
    end = _arg(args, kwargs, 2, "end", None)
    if not isinstance(v, (list, str)):
        raise VrlRuntimeError(
            f"expected array or string, got {type_name(v)}"
        )
    n = len(v)
    s = start if start >= 0 else n + start
    e = n if end is None else (end if end >= 0 else n + end)
    s = max(0, s)
    e = min(n, e)
    return v[s:e]


@_fn("join")
def _f_join(args, kwargs):
    arr = _want_arr(_arg(args, kwargs, 0, "value"))
    sep = _arg(args, kwargs, 1, "separator", "")
    parts = []
    for x in arr:
        if not isinstance(x, str):
            raise VrlRuntimeError(
                f"expected string, got {type_name(x)}"
            )
        parts.append(x)
    return _want_str(sep).join(parts)


@_fn("split")
def _f_split(args, kwargs):
    s = _want_str(_arg(args, kwargs, 0, "value"))
    pat = _arg(args, kwargs, 1, "pattern")
    limit = _arg(args, kwargs, 2, "limit", None)
    if isinstance(pat, VRegex):
        return pat.re.split(
            s, maxsplit=0 if limit is None else max(0, limit - 1)
        )
    pat = _want_str(pat)
    return s.split(pat, -1 if limit is None else max(0, limit - 1))


@_fn("includes")
def _f_includes(args, kwargs):
    arr = _want_arr(_arg(args, kwargs, 0, "value"))
    item = _arg(args, kwargs, 1, "item")
    return any(_strict_eq(x, item) for x in arr)


@_fn("contains")
def _f_contains(args, kwargs):
    s = _want_str(_arg(args, kwargs, 0, "value"))
    sub = _want_str(_arg(args, kwargs, 1, "substring"))
    if kwargs.get("case_sensitive", True) is False:
        return sub.lower() in s.lower()
    return sub in s


@_fn("starts_with")
def _f_starts_with(args, kwargs):
    s = _want_str(_arg(args, kwargs, 0, "value"))
    sub = _want_str(_arg(args, kwargs, 1, "substring"))
    if kwargs.get("case_sensitive", True) is False:
        return s.lower().startswith(sub.lower())
    return s.startswith(sub)


@_fn("ends_with")
def _f_ends_with(args, kwargs):
    s = _want_str(_arg(args, kwargs, 0, "value"))
    sub = _want_str(_arg(args, kwargs, 1, "substring"))
    if kwargs.get("case_sensitive", True) is False:
        return s.lower().endswith(sub.lower())
    return s.endswith(sub)


@_fn("replace")
def _f_replace(args, kwargs):
    s = _want_str(_arg(args, kwargs, 0, "value"))
    pat = _arg(args, kwargs, 1, "pattern")
    with_ = _want_str(_arg(args, kwargs, 2, "with"))
    count = _arg(args, kwargs, 3, "count", -1)
    if isinstance(pat, VRegex):
        # $name / $1 group refs -> python \g<name>
        repl = re.sub(r"\$(\w+)", r"\\g<\1>", with_)
        return pat.re.sub(
            repl, s, count=0 if count < 0 else count
        )
    return s.replace(
        _want_str(pat), with_, count if count >= 0 else -1
    )


@_fn("strip_whitespace")
def _f_strip_ws(args, kwargs):
    return _want_str(_arg(args, kwargs, 0, "value")).strip()


@_fn("truncate")
def _f_truncate(args, kwargs):
    s = _want_str(_arg(args, kwargs, 0, "value"))
    limit = _arg(args, kwargs, 1, "limit")
    ellipsis = _arg(args, kwargs, 2, "ellipsis", False)
    out = s[: int(limit)]
    if ellipsis and len(s) > limit:
        out += "..."
    return out


@_fn("match")
def _f_match(args, kwargs):
    s = _want_str(_arg(args, kwargs, 0, "value"))
    pat = _arg(args, kwargs, 1, "pattern")
    if not isinstance(pat, VRegex):
        raise VrlRuntimeError(
            f"expected regex, got {type_name(pat)}"
        )
    return pat.re.search(s) is not None


@_fn("merge")
def _f_merge(args, kwargs):
    to = _want_obj(_arg(args, kwargs, 0, "to"))
    from_ = _want_obj(_arg(args, kwargs, 1, "from"))
    deep = bool(_arg(args, kwargs, 2, "deep", False))
    return Interp._merge(to, from_, deep)


@_fn("encode_json")
def _f_encode_json(args, kwargs):
    v = to_jsonable(_arg(args, kwargs, 0, "value"))
    return json.dumps(
        v, separators=(",", ":"), sort_keys=True, ensure_ascii=False
    )


@_fn("parse_json")
def _f_parse_json(args, kwargs):
    s = _want_str(_arg(args, kwargs, 0, "value"))
    try:
        return json.loads(s)
    except json.JSONDecodeError as e:
        raise VrlRuntimeError(
            f"unable to parse json: {e.msg}"
        )


@_fn("encode_base64")
def _f_enc_b64(args, kwargs):
    s = _want_str(_arg(args, kwargs, 0, "value"))
    return base64.b64encode(s.encode()).decode()


@_fn("decode_base64")
def _f_dec_b64(args, kwargs):
    s = _want_str(_arg(args, kwargs, 0, "value"))
    try:
        return base64.b64decode(s).decode()
    except Exception as e:
        raise VrlRuntimeError(f"unable to decode base64: {e}")


@_fn("sha1")
def _f_sha1(args, kwargs):
    s = _want_str(_arg(args, kwargs, 0, "value"))
    return hashlib.sha1(s.encode()).hexdigest()


@_fn("md5")
def _f_md5(args, kwargs):
    s = _want_str(_arg(args, kwargs, 0, "value"))
    return hashlib.md5(s.encode()).hexdigest()


@_fn("sha2")
def _f_sha2(args, kwargs):
    s = _want_str(_arg(args, kwargs, 0, "value"))
    variant = _arg(args, kwargs, 1, "variant", "SHA-512/256")
    algo = {
        "SHA-224": "sha224",
        "SHA-256": "sha256",
        "SHA-384": "sha384",
        "SHA-512": "sha512",
        "SHA-512/224": "sha512_224",
        "SHA-512/256": "sha512_256",
    }.get(variant)
    if algo is None:
        raise VrlRuntimeError(f"unknown variant {variant!r}")
    if algo.startswith("sha512_"):
        h = hashlib.new(algo.replace("_", "-"), s.encode())
    else:
        h = hashlib.new(algo, s.encode())
    return h.hexdigest()


@_fn("sha3")
def _f_sha3(args, kwargs):
    s = _want_str(_arg(args, kwargs, 0, "value"))
    variant = _arg(args, kwargs, 1, "variant", "SHA3-512")
    algo = {
        "SHA3-224": "sha3_224",
        "SHA3-256": "sha3_256",
        "SHA3-384": "sha3_384",
        "SHA3-512": "sha3_512",
    }.get(variant)
    if algo is None:
        raise VrlRuntimeError(f"unknown variant {variant!r}")
    return hashlib.new(algo, s.encode()).hexdigest()


@_fn("ip_cidr_contains")
def _f_ip_cidr(args, kwargs):
    cidr = _want_str(_arg(args, kwargs, 0, "cidr"))
    ip = _want_str(_arg(args, kwargs, 1, "value"))
    try:
        return ipaddress.ip_address(ip) in ipaddress.ip_network(
            cidr, strict=False
        )
    except ValueError as e:
        raise VrlRuntimeError(f"unable to parse CIDR: {e}")


@_fn("assert_eq")
def _f_assert_eq(args, kwargs):
    l = _arg(args, kwargs, 0, "left")
    r = _arg(args, kwargs, 1, "right")
    if _strict_eq(l, r):
        return True
    msg = _arg(args, kwargs, 2, "message", None)
    raise _AssertError(
        msg
        if isinstance(msg, str)
        else f"assertion failed: {l!r} == {r!r}"
    )


@_fn("parse_key_value")
def _f_parse_kv(args, kwargs):
    s = _want_str(_arg(args, kwargs, 0, "value"))
    kv_delim = _arg(args, kwargs, 1, "key_value_delimiter", "=")
    field_delim = _arg(args, kwargs, 2, "field_delimiter", " ")
    out: dict = {}
    token = re.compile(
        r'\s*(?:"((?:[^"\\]|\\.)*)"|([^'
        + re.escape(kv_delim + field_delim)
        + r"]+))\s*"
    )
    i, n = 0, len(s)
    while i < n:
        m = token.match(s, i)
        if not m:
            i += 1
            continue
        key = m.group(1) if m.group(1) is not None else m.group(2)
        i = m.end()
        if i < n and s.startswith(kv_delim, i):
            i += len(kv_delim)
            m2 = token.match(s, i)
            if m2:
                val = (
                    m2.group(1)
                    if m2.group(1) is not None
                    else m2.group(2)
                )
                i = m2.end()
            else:
                val = ""
            out[key.strip()] = val.strip() if isinstance(
                val, str
            ) else val
        else:
            out[key.strip()] = ""
        if i < n and s.startswith(field_delim, i):
            i += len(field_delim)
    return out


_CLF_RE = re.compile(
    r"^\s*(?P<host>\S+)\s+(?P<identity>\S+)\s+(?P<user>\S+)\s+"
    r"\[(?P<timestamp>[^\]]+)\]\s+"
    r'"(?P<message>[^"]*)"\s+(?P<status>\d+|-)\s+(?P<size>\d+|-)\s*$'
)


@_fn("parse_common_log")
def _f_parse_clf(args, kwargs):
    s = _want_str(_arg(args, kwargs, 0, "value"))
    m = _CLF_RE.match(s)
    if not m:
        raise VrlRuntimeError(
            "failed parsing common log line"
        )
    out: dict = {}
    for k, v in m.groupdict().items():
        if v in ("-", None):
            continue
        if k == "timestamp":
            try:
                t = dt.datetime.strptime(
                    v, "%d/%b/%Y:%H:%M:%S %z"
                )
            except ValueError:
                raise VrlRuntimeError(
                    f"failed parsing timestamp {v!r}"
                )
            out[k] = t.astimezone(_UTC)
        elif k in ("status", "size"):
            out[k] = int(v)
        else:
            out[k] = v
    msg = out.get("message", "")
    parts = msg.split(" ")
    if len(parts) == 3:
        out["method"], out["path"], out["protocol"] = parts
    return out


_RFC5424_RE = re.compile(
    r"^<(?P<pri>\d+)>(?P<version>\d+)\s+(?P<ts>\S+)\s+"
    r"(?P<hostname>\S+)\s+(?P<appname>\S+)\s+(?P<procid>\S+)\s+"
    r"(?P<msgid>\S+)\s+(?P<sd>-|\[.*?\])\s*(?P<message>.*)$",
    re.S,
)
_RFC3164_RE = re.compile(
    r"^<(?P<pri>\d+)>\s*(?P<ts>[A-Z][a-z]{2}\s+\d{1,2}\s"
    r"\d{2}:\d{2}:\d{2})\s+(?P<hostname>\S+)\s+"
    r"(?P<tag>[^\s:\[]+)(?:\[(?P<procid>\d+)\])?:\s*"
    r"(?P<message>.*)$",
    re.S,
)

_FACILITIES = [
    "kern", "user", "mail", "daemon", "auth", "syslog", "lpr",
    "news", "uucp", "cron", "authpriv", "ftp", "ntp", "security",
    "console", "solaris-cron", "local0", "local1", "local2",
    "local3", "local4", "local5", "local6", "local7",
]
_SEVERITIES = [
    "emerg", "alert", "crit", "err", "warning", "notice", "info",
    "debug",
]


@_fn("parse_syslog")
def _f_parse_syslog(args, kwargs):
    s = _want_str(_arg(args, kwargs, 0, "value"))
    m = _RFC5424_RE.match(s)
    if m:
        pri = int(m.group("pri"))
        out = {
            "facility": _FACILITIES[pri // 8]
            if pri // 8 < len(_FACILITIES)
            else str(pri // 8),
            "severity": _SEVERITIES[pri % 8],
            "version": int(m.group("version")),
            "message": m.group("message"),
        }
        if m.group("ts") != "-":
            out["timestamp"] = _parse_rfc3339(m.group("ts"))
        for k in ("hostname", "appname", "msgid"):
            if m.group(k) != "-":
                out[k] = m.group(k)
        if m.group("procid") != "-":
            p = m.group("procid")
            out["procid"] = int(p) if p.isdigit() else p
        return out
    m = _RFC3164_RE.match(s)
    if m:
        pri = int(m.group("pri"))
        out = {
            "facility": _FACILITIES[pri // 8]
            if pri // 8 < len(_FACILITIES)
            else str(pri // 8),
            "severity": _SEVERITIES[pri % 8],
            "hostname": m.group("hostname"),
            "appname": m.group("tag"),
            "message": m.group("message"),
        }
        try:
            year = dt.datetime.now(_UTC).year
            t = dt.datetime.strptime(
                f"{year} {m.group('ts')}", "%Y %b %d %H:%M:%S"
            ).replace(tzinfo=_UTC)
            out["timestamp"] = t
        except ValueError:
            pass
        if m.group("procid"):
            out["procid"] = int(m.group("procid"))
        return out
    raise VrlRuntimeError("unable to parse syslog message")


@_fn("parse_timestamp")
def _f_parse_timestamp(args, kwargs):
    v = _arg(args, kwargs, 0, "value")
    fmt = _arg(args, kwargs, 1, "format")
    if isinstance(v, dt.datetime):
        return v
    s = _want_str(v)
    fmt = _want_str(fmt)
    if fmt == "%+":
        return _parse_rfc3339(s)
    try:
        t = dt.datetime.strptime(s, _chrono_to_strptime(fmt))
    except ValueError as e:
        raise VrlRuntimeError(f"unable to parse timestamp: {e}")
    if t.tzinfo is None:
        t = t.replace(tzinfo=_UTC)
    return t.astimezone(_UTC)


@_fn("format_timestamp")
def _f_format_timestamp(args, kwargs):
    t = _arg(args, kwargs, 0, "value")
    fmt = _want_str(_arg(args, kwargs, 1, "format"))
    if not isinstance(t, dt.datetime):
        raise VrlRuntimeError(
            f"expected timestamp, got {type_name(t)}"
        )
    if fmt == "%+":
        return serialize_timestamp(t)
    return t.astimezone(_UTC).strftime(_chrono_to_strptime(fmt))


@_fn("parse_regex")
def _f_parse_regex(args, kwargs):
    s = _want_str(_arg(args, kwargs, 0, "value"))
    pat = _arg(args, kwargs, 1, "pattern")
    numeric = bool(_arg(args, kwargs, 2, "numeric_groups", False))
    if not isinstance(pat, VRegex):
        raise VrlRuntimeError(
            f"expected regex, got {type_name(pat)}"
        )
    m = pat.re.search(s)
    if not m:
        raise VrlRuntimeError("could not find any pattern matches")
    out: dict = {}
    if numeric:
        out["0"] = m.group(0)
        for i in range(1, (m.lastindex or 0) + 1):
            if m.group(i) is not None:
                out[str(i)] = m.group(i)
    for k, v in m.groupdict().items():
        if v is not None:
            out[k] = v
    return out


@_fn("parse_regex_all")
def _f_parse_regex_all(args, kwargs):
    s = _want_str(_arg(args, kwargs, 0, "value"))
    pat = _arg(args, kwargs, 1, "pattern")
    numeric = bool(_arg(args, kwargs, 2, "numeric_groups", False))
    if not isinstance(pat, VRegex):
        raise VrlRuntimeError(
            f"expected regex, got {type_name(pat)}"
        )
    out = []
    for m in pat.re.finditer(s):
        row: dict = {}
        if numeric:
            row["0"] = m.group(0)
            for i in range(1, (m.lastindex or 0) + 1):
                if m.group(i) is not None:
                    row[str(i)] = m.group(i)
        for k, v in m.groupdict().items():
            if v is not None:
                row[k] = v
        out.append(row)
    return out


@_fn("parse_grok")
def _f_parse_grok(args, kwargs):
    s = _want_str(_arg(args, kwargs, 0, "value"))
    pattern = _want_str(_arg(args, kwargs, 1, "pattern"))
    from .functions import grok_to_regex_typed

    regex, types = grok_to_regex_typed(pattern)
    m = re.compile(regex).match(s)
    if not m:
        raise VrlRuntimeError("unable to parse input with grok pattern")
    out = {}
    for k, v in m.groupdict().items():
        if v is None:
            if kwargs.get("_keep_empty"):
                # parse_groks (datadog-grok) surfaces unmatched
                # captures as ""; parse_grok (grok crate) drops them
                out[k] = ""
            continue
        t = types.get(k)
        if t == "int":
            out[k] = int(v)
        elif t == "float":
            out[k] = float(v)
        else:
            out[k] = v
    return out


@_fn("parse_aws_cloudwatch_log_subscription_message")
def _f_parse_cw(args, kwargs):
    s = _want_str(_arg(args, kwargs, 0, "value"))
    try:
        d = json.loads(s)
    except json.JSONDecodeError as e:
        raise VrlRuntimeError(f"unable to parse json: {e.msg}")
    try:
        return {
            "owner": d["owner"],
            "message_type": d["messageType"],
            "log_group": d["logGroup"],
            "log_stream": d["logStream"],
            "subscription_filters": d["subscriptionFilters"],
            "log_events": [
                {
                    "id": e["id"],
                    "message": e["message"],
                    "timestamp": dt.datetime.fromtimestamp(
                        e["timestamp"] / 1000.0, _UTC
                    ),
                }
                for e in d["logEvents"]
            ],
        }
    except (KeyError, TypeError) as e:
        raise VrlRuntimeError(
            f"unable to parse subscription message: {e}"
        )


# is_* predicates
for _tn, _py in (
    ("is_string", str),
    ("is_boolean", bool),
    ("is_array", list),
    ("is_object", dict),
    ("is_regex", VRegex),
    ("is_timestamp", dt.datetime),
):
    def _mk(py):
        def f(args, kwargs, _py=py):
            v = _arg(args, kwargs, 0, "value")
            if _py is bool:
                return isinstance(v, bool)
            if _py is str:
                return isinstance(v, str)
            return isinstance(v, _py)

        return f

    _STDLIB[_tn] = _mk(_py)


@_fn("is_integer")
def _f_is_int(args, kwargs):
    v = _arg(args, kwargs, 0, "value")
    return isinstance(v, int) and not isinstance(v, bool)


@_fn("is_float")
def _f_is_float(args, kwargs):
    return isinstance(_arg(args, kwargs, 0, "value"), float)


@_fn("is_null")
def _f_is_null(args, kwargs):
    return _arg(args, kwargs, 0, "value") is None


@_fn("is_empty")
def _f_is_empty(args, kwargs):
    v = _arg(args, kwargs, 0, "value")
    if isinstance(v, (str, list, dict)):
        return len(v) == 0
    raise VrlRuntimeError(
        f"expected string, array or object, got {type_name(v)}"
    )


@_fn("is_nullish")
def _f_is_nullish(args, kwargs):
    v = _arg(args, kwargs, 0, "value")
    if v is None:
        return True
    if isinstance(v, str):
        return v.strip() == "" or v == "-"
    return False


@_fn("keys")
def _f_keys(args, kwargs):
    return list(_want_obj(_arg(args, kwargs, 0, "value")).keys())


@_fn("values")
def _f_values(args, kwargs):
    return list(_want_obj(_arg(args, kwargs, 0, "value")).values())


@_fn("unique")
def _f_unique(args, kwargs):
    arr = _want_arr(_arg(args, kwargs, 0, "value"))
    out = []
    for x in arr:
        if not any(_strict_eq(x, y) for y in out):
            out.append(x)
    return out


@_fn("floor")
def _f_floor(args, kwargs):
    v = _arg(args, kwargs, 0, "value")
    prec = _arg(args, kwargs, 1, "precision", 0) or 0
    if not _is_num(v):
        raise VrlRuntimeError(
            f"expected number, got {type_name(v)}"
        )
    if prec:
        f = 10 ** int(prec)
        return math.floor(v * f) / f
    return math.floor(v) if isinstance(v, float) else v


@_fn("ceil")
def _f_ceil(args, kwargs):
    v = _arg(args, kwargs, 0, "value")
    prec = _arg(args, kwargs, 1, "precision", 0) or 0
    if not _is_num(v):
        raise VrlRuntimeError(
            f"expected number, got {type_name(v)}"
        )
    if prec:
        f = 10 ** int(prec)
        return math.ceil(v * f) / f
    return math.ceil(v) if isinstance(v, float) else v


@_fn("round")
def _f_round(args, kwargs):
    v = _arg(args, kwargs, 0, "value")
    precision = _arg(args, kwargs, 1, "precision", 0)
    if not _is_num(v):
        raise VrlRuntimeError(
            f"expected number, got {type_name(v)}"
        )
    if isinstance(v, int):
        return v
    # half AWAY FROM ZERO like Rust f64::round (round.rs), for both
    # signs: Python's banker's rounding gives round(2.5)=2, and the
    # old +1e-12 nudge fixed positive halves but broke negatives
    # (round(-2.5) -> -2 instead of -3)
    import math as _math

    factor = 10.0 ** int(precision)
    out = _math.copysign(_math.floor(abs(v) * factor + 0.5), v) / factor
    return out if precision else float(out)


@_fn("abs")
def _f_abs(args, kwargs):
    v = _arg(args, kwargs, 0, "value")
    if not _is_num(v):
        raise VrlRuntimeError(
            f"expected number, got {type_name(v)}"
        )
    return abs(v)


@_fn("set")
def _f_set(args, kwargs):
    v = _arg(args, kwargs, 0, "value")
    path = _want_arr(_arg(args, kwargs, 1, "path"))
    data = _arg(args, kwargs, 2, "data")
    if not isinstance(v, (dict, list)):
        raise VrlRuntimeError(
            f"expected object or array, got {type_name(v)}"
        )
    out = _fast_copy(v)
    return Interp.insert(out, list(path), _fast_copy(data))


@_fn("remove")
def _f_remove(args, kwargs):
    v = _arg(args, kwargs, 0, "value")
    path = _want_arr(_arg(args, kwargs, 1, "path"))
    if not isinstance(v, (dict, list)):
        raise VrlRuntimeError(
            f"expected object or array, got {type_name(v)}"
        )
    out = _fast_copy(v)
    Interp.delete(out, list(path))
    return out


@_fn("get")
def _f_get(args, kwargs):
    v = _arg(args, kwargs, 0, "value")
    path = _want_arr(_arg(args, kwargs, 1, "path"))
    got = Interp.query(v, list(path))
    return None if got is _MISSING else got


# ---------------------------------------------------------------------------
# encoding / formatting tail (validated against the reference's own
# test vectors in tests/fixtures/vrl_golden.json)
# ---------------------------------------------------------------------------


@_fn("decode_percent")
def _f_decode_percent(args, kwargs):
    import urllib.parse

    return urllib.parse.unquote(
        _want_str(_arg(args, kwargs, 0, "value"))
    )


# percent-encode sets per lib/vrl/stdlib/src/encode_percent.rs
# (WHATWG URL spec sets built on CONTROLS); each is the set of ASCII
# codepoints that MUST be encoded — non-ASCII bytes always encode.
_CONTROLS = set(range(0x20)) | {0x7F}
_FRAGMENT = _CONTROLS | set(map(ord, ' "<>`'))
_QUERY = _CONTROLS | set(map(ord, ' "#<>'))
_SPECIAL = _QUERY | {ord("'")}
_PATH = _QUERY | set(map(ord, "?`{}"))
_USERINFO = _PATH | set(map(ord, "/:;=@[\\]^|"))
_COMPONENT = _USERINFO | set(map(ord, "$%&+,"))
_WWW_FORM = _COMPONENT | set(map(ord, "!'()~"))
_NON_ALNUM = {
    c for c in range(0x80)
    if not (chr(c).isalpha() or chr(c).isdigit())
}
_ASCII_SETS = {
    "NON_ALPHANUMERIC": _NON_ALNUM,
    "CONTROLS": _CONTROLS,
    "FRAGMENT": _FRAGMENT,
    "QUERY": _QUERY,
    "SPECIAL": _SPECIAL,
    "PATH": _PATH,
    "USERINFO": _USERINFO,
    "COMPONENT": _COMPONENT,
    "WWW_FORM_URLENCODED": _WWW_FORM,
}


@_fn("encode_percent")
def _f_encode_percent(args, kwargs):
    s = _want_str(_arg(args, kwargs, 0, "value"))
    set_name = _arg(args, kwargs, 1, "ascii_set", "NON_ALPHANUMERIC")
    try:
        enc = _ASCII_SETS[_want_str(set_name)]
    except KeyError:
        raise VrlRuntimeError(f"unknown ascii set {set_name!r}")
    out = []
    for b in s.encode("utf-8"):
        if b >= 0x80 or b in enc:
            out.append(f"%{b:02X}")
        else:
            out.append(chr(b))
    return "".join(out)


def _kv_flatten(v, prefix: str, out: dict):
    if isinstance(v, dict):
        for k in sorted(v):
            _kv_flatten(v[k], f"{prefix}.{k}" if prefix else k, out)
    elif isinstance(v, list):
        for i, x in enumerate(v):
            _kv_flatten(x, f"{prefix}.{i}" if prefix else str(i), out)
    else:
        out[prefix] = v


def _kv_encode_string(s: str) -> str:
    # encode_string (lib/vector-common/src/encode_key_value.rs):
    # quote when whitespace/quote present; \ -> \\, " -> \",
    # newline -> the literal two-char sequence \\n (reference quirk)
    quoted = any(c.isspace() or c == '"' for c in s)
    body = []
    for c in s:
        if c == "\\":
            body.append("\\\\")
        elif c == '"':
            body.append('\\"')
        elif c == "\n":
            body.append("\\\\n")
        else:
            body.append(c)
    b = "".join(body)
    return f'"{b}"' if quoted else b


def _kv_value_str(v) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    if v is None:
        return ""
    if isinstance(v, float):
        return _f_to_string([v], {})
    return str(v)


@_fn("encode_key_value")
def _f_encode_key_value(args, kwargs):
    v = _want_obj(_arg(args, kwargs, 0, "value"))
    order = _arg(args, kwargs, 1, "fields_ordering", [])
    kv_delim = _arg(args, kwargs, 2, "key_value_delimiter", "=")
    f_delim = _arg(args, kwargs, 3, "field_delimiter", " ")
    flat_bool = _arg(args, kwargs, 4, "flatten_boolean", False)
    flat: dict = {}
    _kv_flatten(v, "", flat)
    parts = []

    def emit(key, val):
        if isinstance(val, bool) and flat_bool:
            if val:
                parts.append(_kv_encode_string(key))
            return
        parts.append(
            _kv_encode_string(key)
            + kv_delim
            + _kv_encode_string(_kv_value_str(val))
        )

    for key in order or []:
        if key in flat:
            emit(key, flat.pop(key))
    for key in sorted(flat):
        emit(key, flat[key])
    return f_delim.join(parts)


@_fn("find")
def _f_find(args, kwargs):
    s = _want_str(_arg(args, kwargs, 0, "value"))
    pat = _arg(args, kwargs, 1, "pattern")
    frm = _arg(args, kwargs, 2, "from", 0) or 0
    if isinstance(pat, VRegex):
        m = pat.re.search(s, frm)
        return m.start() if m else -1
    return s.find(_want_str(pat), frm)


@_fn("format_int")
def _f_format_int(args, kwargs):
    v = _arg(args, kwargs, 0, "value")
    base = _arg(args, kwargs, 1, "base", 10)
    if not isinstance(v, int) or isinstance(v, bool):
        raise VrlRuntimeError(f"expected integer, got {type_name(v)}")
    if not 2 <= base <= 36:
        raise VrlRuntimeError(
            f"base must be be between 2 and 36 (inclusive)"
        )
    digits = "0123456789abcdefghijklmnopqrstuvwxyz"
    n, sign = abs(v), "-" if v < 0 else ""
    if n == 0:
        return "0"
    out = []
    while n:
        n, r = divmod(n, base)
        out.append(digits[r])
    return sign + "".join(reversed(out))


@_fn("format_number")
def _f_format_number(args, kwargs):
    v = _arg(args, kwargs, 0, "value")
    scale = _arg(args, kwargs, 1, "scale", None)
    dec_sep = _arg(args, kwargs, 2, "decimal_separator", ".")
    grp_sep = _arg(args, kwargs, 3, "grouping_separator", "")
    if not _is_num(v):
        raise VrlRuntimeError(f"expected number, got {type_name(v)}")
    if scale is None:
        if isinstance(v, int) or v == int(v):
            int_part, frac_part = str(int(v)), ""
        else:
            s = repr(float(v))
            int_part, _, frac_part = s.partition(".")
    else:
        scale = int(scale)
        # the reference truncates the printed DECIMAL representation
        # toward zero — int(v * 10**scale) would re-expose binary
        # representation error (4.56 * 100 = 455.999..., truncating to
        # "4.55"); cutting the repr string never does
        sign = "-" if v < 0 else ""
        s = repr(abs(float(v)))
        if "e" in s or "E" in s:  # scientific form: expand exactly
            from decimal import Decimal

            s = format(Decimal(s), "f")
        int_part, _, frac = s.partition(".")
        int_part = sign + int_part
        frac_part = frac[:scale].ljust(scale, "0") if scale else ""
    if grp_sep:
        neg = int_part.startswith("-")
        digits = int_part.lstrip("-")
        grouped = []
        while len(digits) > 3:
            grouped.append(digits[-3:])
            digits = digits[:-3]
        grouped.append(digits)
        int_part = ("-" if neg else "") + grp_sep.join(reversed(grouped))
    return int_part + (dec_sep + frac_part if frac_part else "")


# ---- ip conversions (ip_ntop.rs / ip_pton.rs / ip_subnet.rs / ...)


@_fn("ip_ntop")
def _f_ip_ntop(args, kwargs):
    s = _want_str(_arg(args, kwargs, 0, "value"))
    try:
        raw = s.encode("latin-1")
    except UnicodeEncodeError:
        raise VrlRuntimeError("invalid binary address")
    if len(raw) == 4:
        return str(ipaddress.IPv4Address(raw))
    if len(raw) == 16:
        return str(ipaddress.IPv6Address(raw))
    raise VrlRuntimeError(
        "address must be 4 or 16 bytes"
    )


@_fn("ip_pton")
def _f_ip_pton(args, kwargs):
    s = _want_str(_arg(args, kwargs, 0, "value"))
    try:
        return ipaddress.ip_address(s).packed.decode("latin-1")
    except ValueError as e:
        raise VrlRuntimeError(f"unable to parse IP address: {e}")


@_fn("ip_subnet")
def _f_ip_subnet(args, kwargs):
    s = _want_str(_arg(args, kwargs, 0, "value"))
    sub = _want_str(_arg(args, kwargs, 1, "subnet"))
    try:
        ip = ipaddress.ip_address(s)
    except ValueError as e:
        raise VrlRuntimeError(f"unable to parse IP address: {e}")
    if sub.startswith("/"):
        prefix = int(sub[1:])
        net = ipaddress.ip_network(f"{ip}/{prefix}", strict=False)
        return str(net.network_address)
    try:
        mask = ipaddress.ip_address(sub)
    except ValueError as e:
        raise VrlRuntimeError(f"unable to parse mask: {e}")
    masked = int(ip) & int(mask)
    return str(type(ip)(masked))


@_fn("ip_to_ipv6")
def _f_ip_to_ipv6(args, kwargs):
    s = _want_str(_arg(args, kwargs, 0, "value"))
    try:
        ip = ipaddress.ip_address(s)
    except ValueError as e:
        raise VrlRuntimeError(f"unable to parse IP address: {e}")
    if isinstance(ip, ipaddress.IPv6Address):
        return str(ip)
    return f"::ffff:{ip}"


@_fn("ipv6_to_ipv4")
def _f_ipv6_to_ipv4(args, kwargs):
    s = _want_str(_arg(args, kwargs, 0, "value"))
    try:
        ip = ipaddress.ip_address(s)
    except ValueError as e:
        raise VrlRuntimeError(f"unable to parse IP address: {e}")
    if isinstance(ip, ipaddress.IPv4Address):
        return str(ip)
    if int(ip) >> 32 not in (0, 0xFFFF):
        raise VrlRuntimeError(
            f"IPV6 address {s} is not compatible with IPV4"
        )
    return str(ipaddress.IPv4Address(int(ip) & 0xFFFFFFFF))


# ---- misc predicates / array ops


@_fn("is_json")
def _f_is_json(args, kwargs):
    s = _arg(args, kwargs, 0, "value")
    variant = _arg(args, kwargs, 1, "variant", None)
    if not isinstance(s, str):
        return False
    try:
        v = json.loads(s)
    except (json.JSONDecodeError, ValueError):
        return False
    if variant is None:
        return True
    kinds = {
        "object": dict, "array": list, "string": str,
        "number": (int, float), "bool": bool,
    }
    if variant == "null":
        return v is None
    if variant == "bool":
        return isinstance(v, bool)
    if variant == "number":
        return isinstance(v, (int, float)) and not isinstance(v, bool)
    k = kinds.get(variant)
    if k is None:
        raise VrlRuntimeError(f"unknown json variant {variant!r}")
    return isinstance(v, k)


@_fn("match_array")
def _f_match_array(args, kwargs):
    arr = _want_arr(_arg(args, kwargs, 0, "value"))
    pat = _arg(args, kwargs, 1, "pattern")
    need_all = bool(_arg(args, kwargs, 2, "all", False))
    rx = pat.re if isinstance(pat, VRegex) else re.compile(
        re.escape(_want_str(pat))
    )
    hits = [
        isinstance(x, str) and rx.search(x) is not None for x in arr
    ]
    return all(hits) if need_all else any(hits)


@_fn("tally")
def _f_tally(args, kwargs):
    arr = _want_arr(_arg(args, kwargs, 0, "value"))
    out: dict = {}
    for x in arr:
        if not isinstance(x, str):
            raise VrlRuntimeError(
                "all values must be strings"
            )
        out[x] = out.get(x, 0) + 1
    return dict(sorted(out.items()))


@_fn("tally_value")
def _f_tally_value(args, kwargs):
    # signature tally_value(array, value) — `value` is the needle
    arr = _want_arr(_arg(args, kwargs, 0, "array"))
    item = _arg(args, kwargs, 1, "value")
    return sum(1 for x in arr if x == item)


@_fn("tag_types_externally")
def _f_tag_types_externally(args, kwargs):
    def tag(v):
        if v is None:
            return None
        if isinstance(v, bool):
            return {"boolean": v}
        if isinstance(v, int):
            return {"integer": v}
        if isinstance(v, float):
            return {"float": v}
        if isinstance(v, str):
            return {"string": v}
        if isinstance(v, dt.datetime):
            return {"timestamp": v}
        if isinstance(v, list):
            return [tag(x) for x in v]
        if isinstance(v, dict):
            return {k: tag(x) for k, x in v.items()}
        return v

    return tag(_arg(args, kwargs, 0, "value"))


# ---- parsers


@_fn("parse_csv")
def _f_parse_csv(args, kwargs):
    import csv as _csv
    import io

    s = _want_str(_arg(args, kwargs, 0, "value"))
    delim = _arg(args, kwargs, 1, "delimiter", ",")
    if s == "":
        return []
    reader = _csv.reader(
        io.StringIO(s), delimiter=_want_str(delim), doublequote=True
    )
    for row in reader:
        return row  # first record only (parse_csv.rs)
    return []


_DURATION_UNITS = {
    "ns": 1e-9, "us": 1e-6, "µs": 1e-6, "μs": 1e-6,
    "ms": 1e-3, "cs": 1e-2, "ds": 1e-1, "s": 1.0,
    "m": 60.0, "h": 3600.0, "d": 86400.0,
}
_DURATION_RE = re.compile(
    r"\s*(\d+(?:\.\d+)?)\s*(ns|us|µs|μs|ms|cs|ds|s|m|h|d)"
)


@_fn("parse_duration")
def _f_parse_duration(args, kwargs):
    s = _want_str(_arg(args, kwargs, 0, "value"))
    unit = _want_str(_arg(args, kwargs, 1, "unit"))
    if unit not in _DURATION_UNITS:
        raise VrlRuntimeError(f"unknown duration unit {unit!r}")
    pos, total = 0, 0.0
    matched = False
    while pos < len(s):
        m = _DURATION_RE.match(s, pos)
        if not m:
            break
        total += float(m.group(1)) * _DURATION_UNITS[m.group(2)]
        pos = m.end()
        matched = True
    if not matched:
        raise VrlRuntimeError(f"unable to parse duration: {s!r}")
    return total / _DURATION_UNITS[unit]


@_fn("parse_int")
def _f_parse_int(args, kwargs):
    s = _want_str(_arg(args, kwargs, 0, "value")).strip()
    base = _arg(args, kwargs, 1, "base", None)
    try:
        if base is not None:
            return int(s, int(base))
        neg = s.startswith("-")
        body = s[1:] if s[0] in "+-" else s
        sign = -1 if neg else 1
        if body.startswith(("0x", "0X")):
            return sign * int(body[2:], 16)
        if body.startswith(("0b", "0B")):
            return sign * int(body[2:], 2)
        if body.startswith(("0o", "0O")):
            return sign * int(body[2:], 8)
        if body.startswith("0") and len(body) > 1:
            return sign * int(body[1:], 8)
        return sign * int(body, 10)
    except (ValueError, IndexError) as e:
        raise VrlRuntimeError(f"could not parse integer: {e}")


@_fn("parse_query_string")
def _f_parse_query_string(args, kwargs):
    import urllib.parse

    s = _want_str(_arg(args, kwargs, 0, "value")).lstrip("?")
    if not s:
        return {}
    out: dict = {}
    for part in s.split("&"):
        if not part:
            continue
        k, eq, v = part.partition("=")
        k = urllib.parse.unquote_plus(k)
        v = urllib.parse.unquote_plus(v)
        if k in out:
            prev = out[k]
            out[k] = prev + [v] if isinstance(prev, list) else [prev, v]
        else:
            out[k] = v
    return out


@_fn("parse_groks")
def _f_parse_groks(args, kwargs):
    """parse_groks.rs: try each pattern in order, first match wins."""
    s = _want_str(_arg(args, kwargs, 0, "value"))
    patterns = _want_arr(_arg(args, kwargs, 1, "patterns"))
    last = None
    for p in patterns:
        try:
            return _f_parse_grok([s, p], {"_keep_empty": True})
        except VrlRuntimeError as e:
            last = e
    raise last or VrlRuntimeError(
        "unable to parse input with grok patterns"
    )


def _xml_node_to_obj(node, include_attr, text_key, always_use_text_key):
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
        val = _xml_node_to_obj(
            child, include_attr, text_key, always_use_text_key
        )
        if child.tag in obj:
            prev = obj[child.tag]
            obj[child.tag] = (
                prev + [val] if isinstance(prev, list) else [prev, val]
            )
        else:
            obj[child.tag] = val
    return obj


@_fn("parse_xml")
def _f_parse_xml(args, kwargs):
    import xml.etree.ElementTree as ET

    s = _want_str(_arg(args, kwargs, 0, "value"))
    include_attr = _arg(args, kwargs, 1, "include_attr", True)
    text_key = _arg(args, kwargs, 2, "text_key", "text")
    always = _arg(args, kwargs, 3, "always_use_text_key", False)
    try:
        root = ET.fromstring(s)
    except ET.ParseError as e:
        raise VrlRuntimeError(f"unable to parse xml: {e}")
    return {
        root.tag: _xml_node_to_obj(root, include_attr, text_key, always)
    }


# ---- redact / strip / syslog maps


# area 001-899 except 666, group 01-99, serial 0001-9999
# (lib/vrl/stdlib/src/redact.rs US_SOCIAL_SECURITY_NUMBER)
_SSN_RE = re.compile(
    r"(?:00[1-9]|0[1-9][0-9]|[1-578][0-9]{2}|6[0-57-9][0-9]|66[0-57-9])-"
    r"(?:0[1-9]|[1-9]0|[1-9][1-9])-"
    r"(?:000[1-9]|00[1-9]0|0[1-9]00|[1-9]000|[1-9]{4})"
)


@_fn("redact")
def _f_redact(args, kwargs):
    v = _arg(args, kwargs, 0, "value")
    filters = _want_arr(_arg(args, kwargs, 1, "filters"))
    regexes: list = []
    for f in filters:
        if f == "us_social_security_number":
            regexes.append(_SSN_RE)
        elif isinstance(f, VRegex):
            regexes.append(f.re)
        elif isinstance(f, dict) and f.get("type") == "pattern":
            for p in f.get("patterns", []):
                regexes.append(
                    p.re if isinstance(p, VRegex)
                    else re.compile(re.escape(_want_str(p)))
                )
        else:
            raise VrlRuntimeError(f"unknown redact filter {f!r}")

    def apply(x):
        if isinstance(x, str):
            for rx in regexes:
                x = rx.sub("[REDACTED]", x)
            return x
        if isinstance(x, list):
            return [apply(i) for i in x]
        if isinstance(x, dict):
            return {k: apply(i) for k, i in x.items()}
        return x

    return apply(v)


_ANSI_RE = re.compile(
    r"\x1B(?:[@-Z\\-_]|\[[0-?]*[ -/]*[@-~]|\][^\x07]*(?:\x07|\x1B\\))"
)


@_fn("strip_ansi_escape_codes")
def _f_strip_ansi(args, kwargs):
    return _ANSI_RE.sub("", _want_str(_arg(args, kwargs, 0, "value")))


_SYSLOG_FACILITIES = [
    "kern", "user", "mail", "daemon", "auth", "syslog", "lpr", "news",
    "uucp", "cron", "authpriv", "ftp", "ntp", "security", "console",
    "solaris-cron", "local0", "local1", "local2", "local3", "local4",
    "local5", "local6", "local7",
]
_SYSLOG_LEVELS = [
    "emerg", "alert", "crit", "err", "warning", "notice", "info",
    "debug",
]


@_fn("to_syslog_facility")
def _f_to_syslog_facility(args, kwargs):
    v = _arg(args, kwargs, 0, "value")
    if not isinstance(v, int) or isinstance(v, bool):
        raise VrlRuntimeError(f"expected integer, got {type_name(v)}")
    if not 0 <= v < len(_SYSLOG_FACILITIES):
        raise VrlRuntimeError(f"facility code {v} not valid")
    return _SYSLOG_FACILITIES[v]


@_fn("to_syslog_level")
def _f_to_syslog_level(args, kwargs):
    v = _arg(args, kwargs, 0, "value")
    if not isinstance(v, int) or isinstance(v, bool):
        raise VrlRuntimeError(f"expected integer, got {type_name(v)}")
    if not 0 <= v < len(_SYSLOG_LEVELS):
        raise VrlRuntimeError(f"severity level {v} not valid")
    return _SYSLOG_LEVELS[v]


_SYSLOG_SEVERITY = {
    "emerg": 0, "panic": 0, "alert": 1, "crit": 2, "err": 3,
    "error": 3, "warning": 4, "warn": 4, "notice": 5, "info": 6,
    "informational": 6, "debug": 7,
}


@_fn("to_syslog_severity")
def _f_to_syslog_severity(args, kwargs):
    s = _want_str(_arg(args, kwargs, 0, "value"))
    try:
        return _SYSLOG_SEVERITY[s]
    except KeyError:
        raise VrlRuntimeError(f"level {s} not valid")


# ---------------------------------------------------------------------------
# AST-argument builtins (paths, closures over the event, type_def)
# ---------------------------------------------------------------------------


def _sp_del(interp: Interp, node: Call):
    if not node.args:
        raise VrlCompileError("del() needs a path")
    t = interp.target_of(node.args[0])
    if t is None:
        raise VrlCompileError(
            "del() takes an event path or variable path"
        )
    if t[0] == "event":
        if not t[1]:
            old, interp.event = interp.event, {}
            return old
        return interp.delete(interp.event, t[1])
    _, name, segs = t
    base = interp.get_var(name)
    if base is _MISSING:
        return None
    if not segs:
        interp.set_var(name, None)
        return base
    return interp.delete(base, segs)


def _sp_exists(interp: Interp, node: Call):
    t = interp.target_of(node.args[0]) if node.args else None
    if t is None:
        raise VrlCompileError("exists() takes a path")
    if t[0] == "event":
        return interp.query(interp.event, t[1]) is not _MISSING
    base = interp.get_var(t[1])
    if base is _MISSING:
        return False
    return interp.query(base, t[2]) is not _MISSING


def _sp_assert(interp: Interp, node: Call):
    cond = interp.eval(node.args[0]) if node.args else None
    if cond is True:
        return True
    msg = None
    if len(node.args) > 1:
        msg = interp.eval(node.args[1])
    elif "message" in node.kwargs:
        msg = interp.eval(node.kwargs["message"])
    raise _AssertError(
        msg if isinstance(msg, str) else "assertion failed"
    )


def _sp_type_def(interp: Interp, node: Call):
    return td_render(interp.t_expr(node.args[0]))


def _meta_path(node: Call):
    if node.args and isinstance(node.args[0], Lit) and isinstance(
        node.args[0].value, str
    ):
        # legacy string-key form: set_metadata_field("datadog_api_key", v)
        # (vector 0.24 get/set/remove_metadata_field take a key string)
        return [node.args[0].value]
    if not node.args or not isinstance(node.args[0], Path):
        raise VrlCompileError(
            "metadata functions take an event-style path"
        )
    return node.args[0].segments


def _sp_get_meta(interp: Interp, node: Call):
    v = interp.query(interp.meta, _meta_path(node))
    return None if v is _MISSING else _fast_copy(v)


def _sp_set_meta(interp: Interp, node: Call):
    value = interp.eval(node.args[1])
    segs = _meta_path(node)
    if not segs:
        interp.meta = _want_obj(value)
    else:
        interp.meta = interp.insert(interp.meta, segs, value)
    return None


def _sp_remove_meta(interp: Interp, node: Call):
    segs = _meta_path(node)
    if not segs:
        interp.meta = {}
    else:
        interp.delete(interp.meta, segs)
    return None


def _sp_unnest(interp: Interp, node: Call):
    t = interp.target_of(node.args[0]) if node.args else None
    if t is None:
        raise VrlCompileError("unnest() takes a path")
    if t[0] == "event":
        root, segs = interp.event, t[1]
    else:
        root = interp.get_var(t[1])
        segs = t[2]
        if root is _MISSING:
            raise VrlRuntimeError("expected array, got null")
    arr = interp.query(root, segs)
    if arr is _MISSING or not isinstance(arr, list):
        raise VrlRuntimeError(
            f"expected array, got "
            f"{'null' if arr is _MISSING else type_name(arr)}"
        )
    out = []
    for item in arr:
        clone = _fast_copy(root)
        clone = Interp.insert(clone, segs, _fast_copy(item))
        out.append(clone)
    return out


_SPECIAL_FNS = {
    "del": _sp_del,
    "exists": _sp_exists,
    "assert": _sp_assert,
    "type_def": _sp_type_def,
    "get_metadata_field": _sp_get_meta,
    "set_metadata_field": _sp_set_meta,
    "remove_metadata_field": _sp_remove_meta,
    "unnest": _sp_unnest,
}


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


def run_vrl(
    source: str,
    event: dict | None = None,
    metadata: dict | None = None,
):
    """Interpret a VRL program against one event. Returns
    (value, event) with timestamps still as datetime objects."""
    stmts = parse_program(source)
    it = Interp(event, metadata)
    return it.run(stmts)


def interp_eval(source: str, event: dict | None = None):
    """run_vrl + JSON-able conversion — the `vector vrl` REPL
    analogue used by the golden-program tests."""
    value, ev = run_vrl(source, event)
    return to_jsonable(value), to_jsonable(ev)


def _row_to_event(row: dict) -> dict:
    return {
        k: v
        for k, v in row.items()
        if not (v is None or (isinstance(v, float) and math.isnan(v)))
    }


def _as_events(payload):
    """Root-array assignment emits one event per element
    (remap.rs multi-event emission); scalar elements wrap under
    `message` (LogEvent::from(Value))."""
    if isinstance(payload, list):
        return [e if isinstance(e, dict) else {"message": e} for e in payload]
    if not isinstance(payload, dict):
        return [{"message": payload}]
    return [payload]


def _shape_sig(v):
    """Hashable shape signature of an event — the type-trace cache
    key (values don't matter; the t-pass only sees kinds)."""
    if isinstance(v, dict):
        return tuple(sorted((k, _shape_sig(x)) for k, x in v.items()))
    if isinstance(v, list):
        # FULL element signature — td_of_value types lists positionally,
        # so truncating here would collide shapes that type differently
        # past the cut and reuse the wrong trace
        return ("[]",) + tuple(_shape_sig(x) for x in v)
    if isinstance(v, bool):
        return "b"
    if isinstance(v, int):
        return "i"
    if isinstance(v, float):
        return "f"
    if isinstance(v, str):
        return "s"
    if v is None:
        return "n"
    return type(v).__name__


def build_type_trace(stmts, ev: dict) -> tuple[list, list]:
    """One full type-flow pass over the program for this input shape:
    returns (per-statement (tvars, troot, tmeta) as seen by exec(),
    per-call-site closure element-kind stamps). The stamps travel WITH
    the trace — the AST is shared across events, so a cached trace for
    shape A must re-apply ITS _elem_td values before exec (a later
    trace for shape B would otherwise leave B's kinds on the nodes)."""
    it = Interp(ev)
    it._elem_stamps = []
    trace = []
    for s in stmts:
        it.t_stmt(s)
        # tvars is mutated in place downstream; troot/tmeta are
        # replaced functionally — shallow-copy the former only
        trace.append((dict(it.tvars), it.troot, it.tmeta))
    return trace, it._elem_stamps


def _run_event(stmts, ev: dict, trace_cache: dict | None = None):
    """One reference remap dispatch (src/transforms/remap.rs:465-524):
    returns (outcome, payload_event, error_message) with outcome in
    {'ok', 'abort', 'error'}. On abort/error the payload is the
    ORIGINAL unmodified event, as the reference forwards/reroutes."""
    ttrace = None
    if trace_cache is not None:
        sig = _shape_sig(ev)
        cached = trace_cache.get(sig)
        if cached is None:
            cached = trace_cache[sig] = build_type_trace(stmts, ev)
        ttrace, stamps = cached
        # restore THIS shape's closure element-kinds onto the shared
        # AST (another shape's trace pass may have overwritten them)
        for node, td in stamps:
            node._elem_td = td
    try:
        it = Interp(ev, _skip_types=ttrace is not None)
        _, out_ev = it.run(stmts, ttrace)
        if it.aborted:
            return "abort", ev, "aborted"
        return "ok", out_ev, None
    except VrlRuntimeError as e:
        return "error", ev, e.message


def remap_interp(
    df,
    source: str,
    sample_rows: int = 100,
    drop_on_abort: bool = True,
    drop_on_error: bool = False,
    reroute_dropped: bool = False,
    component_id: str = "remap",
):
    """Distributed interpreter remap: the slow-path twin of
    compile_vrl for programs outside the Column subset. Rows cross
    into Python as Arrow batches (mapInPandas); each event runs the
    tree-walk; results come back as JSON parsed against a schema
    inferred from a driver-side sample (document the assumption:
    remap output shape must stabilize across rows, which matches
    the reference's schema requirement on sinks).

    Reference dispatch semantics (src/transforms/remap.rs:60-90,
    465-524): `abort` drops the event when drop_on_abort (reference
    default: true); a runtime error forwards the ORIGINAL unmodified
    event unless drop_on_error. With reroute_dropped, returns a port
    dict {'': ok_df, 'dropped': dropped_df} where dropped rows are
    the original events annotated with a `metadata_dropped` struct
    (annotate_dropped, remap.rs:414-445); otherwise returns the
    default-output DataFrame alone.
    """
    import pandas as pd  # local import: executors already have it
    from pyspark.sql import functions as F

    stmts = parse_program(source)  # fail fast on the driver

    def dispositions(outcome: str) -> tuple[bool, str | None]:
        """(goes_to_default, dropped_reason_or_None)."""
        if outcome == "ok":
            return True, None
        if outcome == "abort":
            return (False, "abort") if drop_on_abort else (True, None)
        return (False, "error") if drop_on_error else (True, None)

    sample = [
        r.asDict(recursive=True) for r in df.limit(sample_rows).collect()
    ]
    ok_rows, dropped_rows = [], []
    for row in sample:
        outcome, payload, _err = _run_event(stmts, _row_to_event(row))
        to_default, _reason = dispositions(outcome)
        for evp in _as_events(payload):
            (ok_rows if to_default else dropped_rows).append(
                to_jsonable(evp)
            )
    spark = df.sparkSession
    if not ok_rows:
        # every sampled event dropped (e.g. drop_on_error with a
        # program that always errors): the default output is empty,
        # so the input shape IS the output shape (remap.rs forwards
        # originals; nothing else can reach the default port)
        ok_rows = [to_jsonable(_row_to_event(r)) for r in sample]
        if not ok_rows:
            raise VrlCompileError(
                "remap_interp: empty input; cannot infer output schema"
            )

    def infer(rows):
        return spark.read.json(
            spark.sparkContext.parallelize([json.dumps(r) for r in rows])
        ).schema

    schema = infer(ok_rows)
    # dropped events keep the input shape (original event + annotation);
    # infer from input sample so the port exists even if the sample
    # happened to contain no dropped rows.
    dropped_schema = infer(
        dropped_rows or [to_jsonable(_row_to_event(r)) for r in sample]
    )

    cols = df.columns

    def run_batches(batches):
        trace_cache: dict = {}  # per-task type-trace memo by shape
        for pdf in batches:
            js, outcomes, errs = [], [], []
            for row in pdf.to_dict("records"):
                outcome, payload, err = _run_event(
                    stmts, _row_to_event(row), trace_cache
                )
                for evp in _as_events(payload):
                    js.append(json.dumps(to_jsonable(evp)))
                    outcomes.append(outcome)
                    errs.append(err or "")
            yield pd.DataFrame(
                {"_json": js, "_outcome": outcomes, "_error": errs}
            )

    raw = df.select(*cols).mapInPandas(
        run_batches, schema="_json string, _outcome string, _error string"
    )

    if reroute_dropped:
        raw = raw.cache()  # one interpreter pass feeds both ports

    keep_default = F.col("_outcome") == "ok"
    if not drop_on_abort:
        keep_default = keep_default | (F.col("_outcome") == "abort")
    if not drop_on_error:
        keep_default = keep_default | (F.col("_outcome") == "error")

    default_df = (
        raw.filter(keep_default)
        .select(F.from_json("_json", schema).alias("e"))
        .select("e.*")
    )
    if not reroute_dropped:
        return default_df
    dropped_df = (
        raw.filter(~keep_default)
        .select(
            F.from_json("_json", dropped_schema).alias("e"),
            F.struct(
                F.when(F.col("_outcome") == "abort", F.lit("abort"))
                .otherwise(F.lit("error"))
                .alias("reason"),
                F.col("_error").alias("message"),
                F.lit(component_id).alias("component_id"),
                F.lit("remap").alias("component_type"),
                F.lit("transform").alias("component_kind"),
            ).alias("metadata_dropped"),
        )
        .select("e.*", "metadata_dropped")
    )
    return {"": default_df, "dropped": dropped_df}
