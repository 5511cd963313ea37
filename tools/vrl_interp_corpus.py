"""Dev harness: run vrl_programs.json through the pure-Python
interpreter (vrl_interp) with STRICT value comparison (1 != 1.0),
matching the reference's own test runner."""

import json
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vector_spark.vrl_interp import interp_eval
from vector_spark.vrl_lang import VrlCompileError


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


def main():
    cases = json.load(
        open(os.path.join(os.path.dirname(__file__), "..", "tests",
                          "fixtures", "vrl_programs.json"))
    )
    only = sys.argv[1:] or None
    passed, compile_skip, runtime_skip, value_skip = [], [], [], []
    for c in cases:
        if only and c["name"] not in only:
            continue
        try:
            got, _ = interp_eval(c["source"], c["object"])
        except VrlCompileError as e:
            compile_skip.append((c["name"], str(e)[:110]))
            continue
        except Exception as e:
            tb = traceback.format_exc().splitlines()[-3:]
            runtime_skip.append(
                (c["name"], f"{type(e).__name__}: {str(e)[:80]} | "
                 + " / ".join(t.strip()[:60] for t in tb[:-1]))
            )
            continue
        if strict_same(got, c["want"]):
            passed.append(c["name"])
        else:
            value_skip.append(
                (c["name"], f"got {got!r} want {c['want']!r}"[:220])
            )
    print(f"PASS {len(passed)}  compile-skip {len(compile_skip)}  "
          f"runtime-skip {len(runtime_skip)}  value-skip {len(value_skip)}")
    for label, rows in (
        ("COMPILE", compile_skip),
        ("RUNTIME", runtime_skip),
        ("VALUE", value_skip),
    ):
        for n, msg in rows:
            print(f"  [{label}] {n}: {msg}")


if __name__ == "__main__":
    main()
