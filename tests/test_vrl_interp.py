"""VRL interpreter golden tests: the same reference .vrl program
corpus as test_vrl_programs.py, executed by the full-semantics pure
Python tree-walk (vector_spark.vrl_interp) with STRICT value
comparison (1 != 1.0, no string-coercion escape hatch) — matching the
reference's own test runner (lib/vrl/tests/src/main.rs).

Unlike the Column-compiler gate, the interpreter has no skip escape
hatch: every corpus case must either pass strictly or be listed in
KNOWN_DIVERGENCES with a reason. A floor test pins the pass count so
regressions surface as failures, not silent skips.
"""

from __future__ import annotations

import json
import os

import pytest

from vector_spark.vrl_interp import interp_eval

FIXTURES = os.path.join(
    os.path.dirname(__file__), "fixtures", "vrl_programs.json"
)
CASES = json.load(open(FIXTURES))

# name -> reason; currently empty — all 164 corpus programs pass
# strictly, including the type_def-lattice internals (metadata
# typedef root, unnest/closure-arg type propagation).
KNOWN_DIVERGENCES: dict[str, str] = {}


def strict_same(got, want) -> bool:
    if isinstance(got, bool) != isinstance(want, bool):
        return False
    if isinstance(got, bool):
        return got is want
    if isinstance(got, (int, float)) and isinstance(want, (int, float)):
        if (type(got) is float) != (type(want) is float):
            return False
        return got == want
    if isinstance(want, list):
        return (
            isinstance(got, list)
            and len(got) == len(want)
            and all(strict_same(g, w) for g, w in zip(got, want))
        )
    if isinstance(want, dict):
        return (
            isinstance(got, dict)
            and set(got) == set(want)
            and all(strict_same(got[k], want[k]) for k in want)
        )
    return got == want


@pytest.mark.parametrize("case", CASES, ids=[c["name"] for c in CASES])
def test_vrl_interp_program(case):
    if case["name"] in KNOWN_DIVERGENCES:
        pytest.xfail(KNOWN_DIVERGENCES[case["name"]])
    got, _event = interp_eval(case["source"], case["object"])
    assert strict_same(got, case["want"]), f"{got!r} != {case['want']!r}"


def test_vrl_interp_floor():
    """The corpus must stay ≥164 strictly-passing programs; a parser
    or stdlib regression shows up here even if individual case names
    churn on re-harvest."""
    runnable = [c for c in CASES if c["name"] not in KNOWN_DIVERGENCES]
    assert len(runnable) >= 164, f"corpus shrank to {len(runnable)}"


def test_remap_interp_distributed(spark):
    """remap_interp runs the tree-walk executor-side over Arrow
    batches (mapInPandas) — the reference remap's dynamic tail on a
    program the Column compiler rejects (abort + dynamic coalescing).
    """
    from vector_spark.vrl_interp import remap_interp

    df = spark.createDataFrame(
        [
            ("a", "warn", "disk low"),
            ("b", "debug", "noise"),
            ("c", "error", "boom"),
        ],
        "id string, severity string, message string",
    )
    src = """
if .severity == "debug" { abort }
.level = .(severity | "sev")
.tag = upcase!(.level)
del(.severity)
.
"""
    out = remap_interp(df, src)
    rows = {r["id"]: r.asDict() for r in out.collect()}
    assert set(rows) == {"a", "c"}  # debug row aborted -> dropped
    assert rows["a"]["tag"] == "WARN" and rows["c"]["tag"] == "ERROR"
    assert "severity" not in out.columns


def test_remap_interp_dropped_port(spark):
    """reroute_dropped (remap.rs:92-105): aborted and erroring events
    land on the `dropped` port as ORIGINAL events annotated with the
    metadata_dropped struct; drop_on_error=False (reference default)
    forwards erroring events unmodified on the default port instead.
    """
    from vector_spark.vrl_interp import remap_interp

    df = spark.createDataFrame(
        [("a", "5"), ("b", "drop-me"), ("c", "oops")],
        "id string, payload string",
    )
    # b aborts; c errors (to_int! on a non-numeric string)
    src = """
if .payload == "drop-me" { abort }
.n = to_int!(.payload)
.
"""
    ports = remap_interp(
        df, src, drop_on_error=True, reroute_dropped=True
    )
    ok = {r["id"]: r.asDict() for r in ports[""].collect()}
    dropped = {r["id"]: r.asDict() for r in ports["dropped"].collect()}
    assert set(ok) == {"a"} and ok["a"]["n"] == 5
    assert set(dropped) == {"b", "c"}
    assert dropped["b"]["metadata_dropped"]["reason"] == "abort"
    assert dropped["c"]["metadata_dropped"]["reason"] == "error"
    assert dropped["c"]["payload"] == "oops"  # original, unmodified
    assert (
        dropped["c"]["metadata_dropped"]["component_kind"] == "transform"
    )

    # reference default: drop_on_error=False forwards the original
    fwd = remap_interp(df, src)  # drop_on_abort=True default
    ids = {r["id"]: r.asDict(recursive=True) for r in fwd.collect()}
    assert set(ids) == {"a", "c"}  # abort dropped, error forwarded
    assert ids["c"].get("n") is None  # original event, no .n


def test_pipeline_remap_vrl_source(spark):
    """A pipeline `remap` with a `source:` VRL program: Column-subset
    programs compile to Catalyst; dynamic-tail programs (abort) fall
    back to the interpreter, and reroute_dropped exposes the
    `.dropped` port through the spec graph (remap.rs:92-105)."""
    from vector_spark.pipeline import PipelineContext, run_pipeline

    src_df = spark.createDataFrame(
        [("a", "warn"), ("b", "debug"), ("c", "error")],
        "id string, severity string",
    )
    spec = {
        "sources": {"logs": {"type": "parquet"}},
        "transforms": {
            "shape": {
                "type": "remap",
                "inputs": ["logs"],
                # dynamic tail (abort) -> interpreter path
                "source": (
                    'if .severity == "debug" { abort }\n'
                    ".level = upcase!(.severity)\n."
                ),
                "reroute_dropped": True,
            },
        },
        "sinks": {
            "out": {"type": "memory", "inputs": ["shape"]},
            "dead": {"type": "memory", "inputs": ["shape.dropped"]},
        },
    }
    res = run_pipeline(PipelineContext(spark), spec, {"logs": src_df})
    ok = {r["id"] for r in res["out"].collect()}
    dead = res["dead"].collect()
    assert ok == {"a", "c"}
    assert [r["id"] for r in dead] == ["b"]
    assert dead[0]["metadata_dropped"]["reason"] == "abort"

    # Column-subset program -> compiled path (no mapInPandas in plan)
    spec2 = {
        "sources": {"logs": {"type": "parquet"}},
        "transforms": {
            "shape": {
                "type": "remap",
                "inputs": ["logs"],
                "source": ".level = upcase!(.severity)\n.",
            },
        },
        "sinks": {"out": {"type": "memory", "inputs": ["shape"]}},
    }
    res2 = run_pipeline(PipelineContext(spark), spec2, {"logs": src_df})
    df2 = res2["out"]
    assert "MapInPandas" not in df2._jdf.queryExecution().toString()
    assert {r["level"] for r in df2.collect()} == {"WARN", "DEBUG", "ERROR"}


def test_type_trace_cache_matches_uncached():
    """The per-shape type-trace memo must be semantics-preserving:
    cached and uncached execution agree event-for-event, including
    mixed shapes (missing fields), aborts, errors, and typed
    error-defaults."""
    from vector_spark.vrl_interp import _run_event, parse_program

    src = (
        'if .level == "DEBUG" { abort }\n'
        ".sev = .(level | \"lvl\")\n"
        ".ok, .err = 1 / .denom\n"
        ".td = type_def(.payload)\n"
        ".\n"
    )
    stmts = parse_program(src)
    events = [
        {"level": "INFO", "denom": 2, "payload": {"a": 1}},
        {"level": "DEBUG", "denom": 2, "payload": {"a": 1}},
        {"level": "WARN", "denom": 0, "payload": {"a": 1}},  # err path
        {"lvl": "fallback", "denom": 4},  # different shape
        {"level": "ERROR", "denom": 1, "payload": [1, "x"]},
    ]
    cache: dict = {}
    for ev in events:
        plain = _run_event(stmts, dict(ev))
        cached = _run_event(stmts, dict(ev), cache)
        assert plain == cached, ev
    assert len(cache) >= 2  # distinct shapes got distinct traces


def test_type_trace_cache_closure_stamps_per_shape():
    """Closure element-kind stamps (_elem_td) live on the SHARED AST:
    a cache HIT for shape A after shape B was traced must re-apply A's
    stamps, or the closure body types against B's element kind. Run
    int-elements, trace string-elements, then HIT the int trace again
    and demand identical output to uncached execution."""
    from vector_spark.vrl_interp import _run_event, parse_program

    src = (
        ".kinds = []\n"
        "for_each(array!(.items)) -> |_i, v| {\n"
        "    .kinds = push(.kinds, type_def(v))\n"
        "}\n"
        ".\n"
    )
    stmts = parse_program(src)
    ints = {"items": [1, 2]}
    strs = {"items": ["a", "b"], "tag": "s"}  # distinct shape
    cache: dict = {}
    first = _run_event(stmts, dict(ints), cache)  # traces int shape
    _run_event(stmts, dict(strs), cache)  # traces str shape (AST now str)
    hit = _run_event(stmts, dict(ints), cache)  # MUST restore int stamps
    assert hit == first == _run_event(stmts, dict(ints))

    # list shapes differing only past element 4 must not collide
    long_a = {"items": [1, 1, 1, 1, 1, 2]}
    long_b = {"items": [1, 1, 1, 1, 1, "x"]}
    cache2: dict = {}
    for ev in (long_a, long_b):
        assert _run_event(stmts, dict(ev), cache2) == _run_event(
            stmts, dict(ev)
        )
    assert len(cache2) == 2


def test_stdlib_python_exceptions_become_fallible_errors():
    from vector_spark.vrl_interp import Interp, parse_program

    # split on an empty separator leaks ValueError from the kernel —
    # it must surface as a per-event FALLIBLE error (catchable), not
    # a task-killing raw exception
    it = Interp({"t": "abc"})
    _, ev = it.run(parse_program('.out = split(.t, "") ?? "caught"'))
    assert ev["out"] == "caught"


def test_assert_failures_stay_uncatchable():
    import pytest

    from vector_spark.vrl_interp import Interp, _AssertError, parse_program

    it = Interp({})
    with pytest.raises(_AssertError):
        it.run(parse_program('x = assert_eq!(1, 2) ?? "caught"'))


def test_round_half_away_from_zero_negative():
    from vector_spark.vrl_interp import Interp, parse_program

    _, ev = Interp({}).run(
        parse_program(".a = round(-2.5)\n.b = round(-0.5)\n.c = round(2.5)")
    )
    assert (ev["a"], ev["b"], ev["c"]) == (-3.0, -1.0, 3.0)


def test_format_number_truncates_decimal_string():
    from vector_spark.vrl_interp import Interp, parse_program

    _, ev = Interp({}).run(
        parse_program(
            ".a = format_number(4.56, 2)\n.b = format_number(0.29, 2)"
        )
    )
    assert ev["a"] == "4.56" and ev["b"] == "0.29"


def test_block_local_variable_types_do_not_leak():
    from vector_spark.vrl_interp import Interp, parse_program

    # x is block-local at runtime; its static type must not survive
    # the block either (type_def would otherwise claim integer)
    _, ev = Interp({}).run(
        parse_program('{ x = 1 }\n.after = true')
    )
    assert ev["after"] is True
