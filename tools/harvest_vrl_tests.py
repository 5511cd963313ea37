"""Harvest reference test vectors for the VRL stdlib surface.

Scans /root/reference/lib/vrl/stdlib/src/*.rs for `test_function!`
blocks (the reference's per-function golden tests, same vectors the
238-file .vrl corpus exercises through the language) and emits the
scalar-representable subset as JSON fixtures:

    tests/fixtures/vrl_golden.json
      [{"function": ..., "case": ..., "args": {...}, "want": ...}]

Only cases whose args and expected value round-trip to JSON scalars /
flat lists survive; object-typed and Err cases are skipped (counted
in the summary). Run: python tools/harvest_vrl_tests.py
"""

from __future__ import annotations

import json
import os
import re
import sys

SRC = "/root/reference/lib/vrl/stdlib/src"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures", "vrl_golden.json")

CASE_RE = re.compile(
    r"(\w+)\s*\{\s*args:\s*func_args!\[(.*?)\],\s*want:\s*(Ok|Err)\s*\((.*?)\),\s*tdef:",
    re.S,
)


def split_top(s: str) -> list[str]:
    """Split on top-level commas (not inside (), [], {}, or strings)."""
    out, depth, cur, i, in_str, q = [], 0, [], 0, False, ""
    while i < len(s):
        c = s[i]
        if in_str:
            cur.append(c)
            if c == "\\":
                if i + 1 < len(s):
                    cur.append(s[i + 1])
                    i += 1
            elif c == q:
                in_str = False
        elif c in "\"'":
            in_str, q = True, c
            cur.append(c)
        elif c in "([{":
            depth += 1
            cur.append(c)
        elif c in ")]}":
            depth -= 1
            cur.append(c)
        elif c == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(c)
        i += 1
    if cur:
        tail = "".join(cur).strip()
        if tail:
            out.append(tail)
    return out


def parse_value(v: str):
    """Rust literal -> Python value; raises ValueError if unsupported."""
    v = v.strip()
    if v.startswith("value!(") and v.endswith(")"):
        return parse_value(v[len("value!("):-1])
    rx = re.match(r'Value::Regex\(Regex::new\("((?:[^"\\]|\\.)*)"\)', v)
    if rx:
        # VRL regex literal -> tagged pattern string
        return {"$regex": rx.group(1).encode().decode("unicode_escape")}
    bm = re.match(r"btreemap!\s*\{(.*)\}\s*$", v, re.S)
    if bm:
        out = {}
        inner = bm.group(1).strip()
        for pair in split_top(inner) if inner else []:
            k, sep, val = pair.partition("=>")
            if not sep:
                raise ValueError(v)
            out[parse_value(k)] = parse_value(val)
        return out
    # string literals first: '::' inside a quoted IPv6/path string is
    # data, not a Rust path
    if (v.startswith('s"') or v.startswith("s'")) and len(v) >= 3:
        return v[2:-1]
    if v.startswith('r#"') and v.endswith('"#'):
        return v[3:-2]
    if v.startswith('"') and v.endswith('"'):
        try:
            return json.loads(v)
        except json.JSONDecodeError:
            # rust \x escapes (binary-ish literals)
            return v[1:-1].encode().decode("unicode_escape")
    if v.startswith("'") and v.endswith("'"):
        return v[1:-1]
    if v.startswith("Value::from(") and v.endswith(")"):
        return parse_value(v[len("Value::from("):-1])
    if v.startswith("Value::") or "::" in v:
        raise ValueError(v)
    if v.startswith("vec![") and v.endswith("]"):
        inner = v[len("vec!["):-1].strip()
        return [parse_value(x) for x in split_top(inner)] if inner else []
    if v.startswith("[") and v.endswith("]"):
        inner = v[1:-1].strip()
        return [parse_value(x) for x in split_top(inner)] if inner else []
    if (v.startswith('s"') or v.startswith("s'")) and len(v) >= 3:
        return v[2:-1]
    if v.startswith('r#"') and v.endswith('"#'):
        return v[3:-2]
    if v.startswith('"') and v.endswith('"'):
        return json.loads(v)
    if v.startswith("'") and v.endswith("'"):
        return v[1:-1]
    if v in ("true", "false"):
        return v == "true"
    if v == "Null" or v == "null":
        return None
    if re.fullmatch(r"-?\d+", v):
        return int(v)
    if re.fullmatch(r"-?\d+\.\d+(e-?\d+)?", v):
        return float(v)
    if v.startswith("{") and v.endswith("}"):
        # object literal: try JSON after stripping rust-isms
        return json.loads(v)
    raise ValueError(v)


# out of the rebuild's scope: datadog search (SURVEY §2.2 exclusion),
# VRL path CRUD (get/set/remove operate on the mutable event, not a
# column), network I/O (reverse_dns), runtime assertions, env access
# (driver-side lit), and VRL Regex literals
OUT_OF_SCOPE = {
    "match_datadog_query", "assert_eq", "get", "set", "remove",
    "get_env_var", "reverse_dns", "is_regex",
}


def main() -> int:
    cases, skipped = [], 0
    for fname in sorted(os.listdir(SRC)):
        if not fname.endswith(".rs"):
            continue
        text = open(os.path.join(SRC, fname)).read()
        m = re.search(r"test_function!\[\s*(\w+)\s*=>", text)
        if not m:
            continue
        func = m.group(1)
        if func in OUT_OF_SCOPE:
            continue
        block = text[m.start():]
        for cm in CASE_RE.finditer(block):
            case, argsrc, okerr, wantsrc = cm.groups()
            if okerr == "Err":
                skipped += 1
                continue
            try:
                args = {}
                for pair in split_top(argsrc):
                    k, _, val = pair.partition(":")
                    args[k.strip()] = parse_value(val)
                want = parse_value(wantsrc)
            except (ValueError, json.JSONDecodeError):
                skipped += 1
                continue
            cases.append(
                {"function": func, "case": case, "args": args, "want": want}
            )
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(cases, f, indent=1, sort_keys=True)
    by_fn: dict[str, int] = {}
    for c in cases:
        by_fn[c["function"]] = by_fn.get(c["function"], 0) + 1
    print(f"harvested {len(cases)} cases across {len(by_fn)} functions "
          f"({skipped} skipped)")
    for fn, n in sorted(by_fn.items()):
        print(f"  {fn}: {n}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
