"""VRL stdlib golden vectors through the *interpreter*: the same
reference test vectors as test_vrl_golden.py (lib/vrl/stdlib/src/*.rs
`test_function!` blocks), rendered as VRL call expressions with named
arguments and executed by vector_spark.vrl_interp — no Spark, no
adapters, the reference's own calling convention.

Where the Column-compiler gate must skip cases Spark's type system
can't express (mixed-type arrays, regex arguments), the interpreter
runs them all: the only exclusions are named in KNOWN_DIVERGENCES.
"""

from __future__ import annotations

import json
import math
import os

import pytest

from vector_spark.vrl_interp import interp_eval

FIXTURES = os.path.join(
    os.path.dirname(__file__), "fixtures", "vrl_golden.json"
)
CASES = json.load(open(FIXTURES))

KNOWN_DIVERGENCES: dict[tuple, str] = {}


def render_str(s: str) -> str:
    """VRL double-quoted string literal. Only the reference lexer's
    escape set exists (\\' \\\" \\\\ \\n \\r \\t \\{ \\}); control
    characters are embedded raw."""
    body = (
        s.replace("\\", "\\\\")
        .replace('"', '\\"')
        .replace("\n", "\\n")
        .replace("\r", "\\r")
        .replace("\t", "\\t")
    )
    return f'"{body}"'


def render(v) -> str:
    if isinstance(v, dict) and set(v) == {"$regex"}:
        return "r'" + v["$regex"] + "'"
    if isinstance(v, dict):
        return (
            "{"
            + ", ".join(
                f"{render_str(k)}: {render(x)}" for k, x in v.items()
            )
            + "}"
        )
    if isinstance(v, list):
        return "[" + ", ".join(render(x) for x in v) + "]"
    if isinstance(v, str):
        return render_str(v)
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "true" if v else "false"
    return json.dumps(v)


def func_name(case) -> str:
    # two harvest artifacts: parse_groks vectors live in the
    # parse_grok harvest bucket; to_syslog_severity's test module is
    # named `to_level` in the reference
    if case["function"] == "parse_grok" and "patterns" in case["args"]:
        return "parse_groks"
    if case["function"] == "to_level":
        return "to_syslog_severity"
    return case["function"]


def same(got, want) -> bool:
    if isinstance(got, bool) != isinstance(want, bool):
        return False
    if (
        isinstance(got, (int, float))
        and isinstance(want, (int, float))
        and not isinstance(got, bool)
    ):
        return math.isclose(
            float(got), float(want), rel_tol=1e-9, abs_tol=1e-12
        )
    if isinstance(want, list):
        return (
            isinstance(got, list)
            and len(got) == len(want)
            and all(same(g, w) for g, w in zip(got, want))
        )
    if isinstance(want, dict):
        return (
            isinstance(got, dict)
            and set(got) == set(want)
            and all(same(got[k], want[k]) for k in want)
        )
    return got == want


@pytest.mark.parametrize(
    "case", CASES, ids=[f"{c['function']}__{c['case']}" for c in CASES]
)
def test_vrl_golden_interp(case):
    key = (case["function"], case["case"])
    if key in KNOWN_DIVERGENCES:
        pytest.xfail(KNOWN_DIVERGENCES[key])
    src = (
        func_name(case)
        + "!("
        + ", ".join(
            f"{k}: {render(v)}" for k, v in case["args"].items()
        )
        + ")"
    )
    got, _ = interp_eval(src, {})
    assert same(got, case["want"]), f"{src}\n{got!r} != {case['want']!r}"


def test_vrl_golden_interp_no_silent_shrink():
    assert len(CASES) >= 330, f"corpus shrank to {len(CASES)}"
