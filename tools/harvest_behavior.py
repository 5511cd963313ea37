"""Harvest the reference's behavior-test suite into JSON fixtures.

Source: tests/behavior/transforms/*.toml in the reference — Vector's
own end-to-end transform tests, run there via `vector test` (the
unit-test framework, src/config/unit_test/). Each test = a transform
subgraph + events injected at `insert_at` + per-output condition
checks (a condition passes when at least one extracted event
satisfies it, unit_test_components.rs:150-180) + `no_outputs_from`
emptiness checks.

We harvest DATA (configs, inputs, expected conditions), not code, the
same way tests/fixtures/vrl_golden.json harvested the VRL corpus. Lua
suites are skipped (the rebuild's script escape hatch is Python, a
documented substitution); task_transform exercises internal plumbing
with no public semantics.

Usage: python tools/harvest_behavior.py  -> tests/fixtures/behavior_tests.json
"""

from __future__ import annotations

import json
import os
import sys
import tomllib

REF = "/root/reference"
SUITES = [
    "remap",
    "remap_with_drop",
    "filter",
    "route",
    "dedupe",
    "reduce",
    "pipelines_simple",
]


def _inline_files(comp: dict) -> dict:
    """remap `file = ...` configs -> inline the program text."""
    comp = dict(comp)
    if comp.get("type") == "remap" and "file" in comp:
        path = os.path.join(REF, comp.pop("file"))
        with open(path) as f:
            comp["source"] = f.read()
    return comp


def _norm_inputs(test: dict) -> list[dict]:
    raw = test.get("inputs") or ([test["input"]] if "input" in test else [])
    out = []
    for i in raw:
        fields = i.get("log_fields")
        if fields is None and "metric" in i:
            # metric events: the VRL view is the metric's field tree
            # (name/kind/tags/<value variant>)
            fields = i["metric"]
        if fields is None and "value" in i:
            # raw-value shorthand -> {"message": value}
            fields = {"message": i["value"]}
        out.append({"insert_at": i["insert_at"], "log_fields": fields or {}})
    return out


def main() -> int:
    fixtures = []
    for suite in SUITES:
        path = os.path.join(REF, "tests/behavior/transforms", f"{suite}.toml")
        with open(path, "rb") as f:
            doc = tomllib.load(f)
        transforms = {
            name: _inline_files(comp)
            for name, comp in (doc.get("transforms") or {}).items()
        }
        enrich = {}
        for tname, tcfg in (doc.get("enrichment_tables") or {}).items():
            import csv

            path = os.path.join(REF, tcfg["file"]["path"].lstrip("./"))
            with open(path, newline="") as cf:
                rows = list(csv.DictReader(cf))
            for col, typ in (tcfg.get("schema") or {}).items():
                for r in rows:
                    if typ == "integer":
                        r[col] = int(r[col])
                    elif typ == "float":
                        r[col] = float(r[col])
            enrich[tname] = rows
        for test in doc.get("tests") or []:
            fixtures.append(
                {
                    "suite": suite,
                    "name": test["name"],
                    "transforms": transforms,
                    "inputs": _norm_inputs(test),
                    "outputs": [
                        {
                            "extract_from": o["extract_from"],
                            "conditions": o.get("conditions") or [],
                        }
                        for o in (test.get("outputs") or [])
                    ],
                    "no_outputs_from": test.get("no_outputs_from") or [],
                    "enrichment_tables": enrich,
                }
            )
    out_path = os.path.join(
        os.path.dirname(__file__), "..", "tests", "fixtures",
        "behavior_tests.json",
    )
    with open(out_path, "w") as f:
        json.dump(fixtures, f, indent=1, default=str)
    print(f"{len(fixtures)} behavior tests -> {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
