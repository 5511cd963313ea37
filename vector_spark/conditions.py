"""Condition DSL — the predicate mini-language for filter/route/etc.

Reference: Vector conditions (src/conditions/mod.rs:23-51) come in
two user-facing flavors: `check_fields` — an AND of
`<field>.<predicate>` pairs (src/conditions/check_fields.rs:446-470)
— and raw VRL boolean expressions (src/conditions/vrl.rs:96-130).

Rebuild: `check_fields(...)` builds a Column from keyword specs;
`vrl_expr(...)` accepts a raw Spark-SQL boolean expression (our VRL
stand-in — same role: arbitrary expression, Catalyst-compiled).
Both return plain Columns, so Catalyst pushes them into scans.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_PREDICATES = {
    "eq",
    "neq",
    "exists",
    "contains",
    "prefix",  # alias kept by the reference (check_fields.rs)
    "starts_with",
    "ends_with",
    "regex",
    "gt",
    "gte",
    "lt",
    "lte",
    "length_eq",
    "ip_cidr_contains",
}


def _one(field: str, predicate: str, value) -> Column:
    col = F.col(field)
    if predicate == "eq":
        return col == F.lit(value)
    if predicate == "neq":
        # Vector's neq is true when the field differs; null-safe so a
        # null field counts as "not equal" like VRL's loose equality
        return ~col.eqNullSafe(F.lit(value))
    if predicate == "exists":
        return col.isNotNull() if value else col.isNull()
    if predicate == "contains":
        return col.contains(value)
    if predicate in ("prefix", "starts_with"):
        return col.startswith(value)
    if predicate == "ends_with":
        return col.endswith(value)
    if predicate == "regex":
        return col.rlike(value)
    if predicate == "gt":
        return col > F.lit(value)
    if predicate == "gte":
        return col >= F.lit(value)
    if predicate == "lt":
        return col < F.lit(value)
    if predicate == "lte":
        return col <= F.lit(value)
    if predicate == "length_eq":
        return F.length(col) == F.lit(value)
    if predicate == "ip_cidr_contains":
        # network/prefix match on dotted-quad strings
        net, bits = str(value).split("/")
        mask = (0xFFFFFFFF << (32 - int(bits))) & 0xFFFFFFFF
        ip_int = _ip_to_int(col)
        net_int = sum(
            int(o) << (8 * (3 - i)) for i, o in enumerate(net.split("."))
        )
        return ip_int.bitwiseAND(F.lit(mask)) == F.lit(net_int & mask)
    raise ValueError(f"unknown predicate: {predicate}")


def _ip_to_int(col: Column) -> Column:
    parts = F.split(col, r"\.")
    out = F.lit(0)
    for i in range(4):
        out = out * 256 + parts[i].cast("long")
    return out


def check_fields(**specs) -> Column:
    """AND of `field__predicate=value` keyword specs, with `not__`
    prefix for negation — mirrors check_fields' `not_` modifier.

    check_fields(role__eq="assistant", tool__neq="none",
                 not__level__eq="DEBUG")
    """
    # reference TOML spelling: "<field>.<check>" with its own
    # predicate names (check_fields.rs:446-470)
    _REF_PREDICATES = {
        "equals": "eq", "not_equals": "neq", "exists": "exists",
        "contains": "contains", "prefix": "starts_with",
        "starts_with": "starts_with", "ends_with": "ends_with",
        "regex": "regex", "ip_cidr_contains": "ip_cidr_contains",
        "length_eq": "length_eq",
    }
    conds: list[Column] = []
    for key, value in specs.items():
        negate = key.startswith("not__")
        if negate:
            key = key[len("not__"):]
        field, _, predicate = key.rpartition("__")
        if not field and "." in key:
            field, _, ref_pred = key.rpartition(".")
            predicate = _REF_PREDICATES.get(ref_pred, ref_pred)
        if predicate not in _PREDICATES or not field:
            raise ValueError(f"bad check_fields spec: {key}")
        c = _one(field, predicate, value)
        # null-safe negation: ~NULL is NULL (row filtered out), but a
        # missing field NOT equal to X must PASS — the same missing-
        # field-counts-as-unequal rule the neq predicate applies
        conds.append(~F.coalesce(c, F.lit(False)) if negate else c)
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


def vrl_expr(expr: str) -> Column:
    """Raw boolean expression condition (the VRL-condition analogue,
    src/conditions/vrl.rs). Catalyst analyzes and pushes it down."""
    return F.expr(expr)


def is_event_kind(kind: str, schema=None) -> Column:
    """is_log / is_metric / is_trace conditions (src/conditions/
    is_log.rs etc.). Events normally live in kind-homogeneous
    DataFrames (logs and metrics are separate frames — SURVEY §2.2),
    so without an `event_kind` column the answer is a constant: logs
    by convention. With an `event_kind` column (the native_json
    decoder emits one), the test is per-row."""
    if schema is not None and any(
        f.name == "event_kind" for f in getattr(schema, "fields", [])
    ):
        return F.col("event_kind") == kind
    return F.lit(kind == "log")
