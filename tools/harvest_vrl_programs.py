"""Harvest the reference's .vrl golden *programs* (lib/vrl/tests/tests,
SURVEY §5.3: 238 files with `# object:` / `# result:` headers) into
tests/fixtures/vrl_programs.json for the vrl_lang compiler gate.

Only files whose object AND result headers parse as JSON survive
(error-diagnostic results, timestamp literals, and non-JSON values
are counted as skipped); whether a surviving program actually
*compiles* is the test suite's business, not the harvester's.

Run: python tools/harvest_vrl_programs.py
"""

from __future__ import annotations

import json
import os
import sys

SRC = "/root/reference/lib/vrl/tests/tests"
OUT = os.path.join(
    os.path.dirname(__file__), "..", "tests", "fixtures", "vrl_programs.json"
)


def parse_file(path: str):
    lines = open(path).read().splitlines()
    # the reference's own runner skips files marked `# SKIP`
    if any(ln.strip().upper() == "# SKIP" for ln in lines[:5]):
        return None
    header: dict[str, list[str]] = {}
    current = None
    body_start = 0
    for i, line in enumerate(lines):
        if line.startswith("#"):
            text = line[1:].lstrip()
            low = text.lower()
            matched = False
            for key in ("object:", "result:"):
                if low.startswith(key):
                    current = key[:-1]
                    header[current] = [text[len(key):].strip()]
                    matched = True
                    break
            if not matched and current:
                header[current].append(text)
        elif line.strip() == "" and current:
            continue  # blank lines inside the header block
        else:
            if line.strip():
                body_start = i
                break
    source = "\n".join(lines[body_start:]).strip()
    if "result" not in header or not source:
        return None
    try:
        obj = json.loads(" ".join(header.get("object", ["{}"])) or "{}")
        want = json.loads(" ".join(header["result"]))
    except json.JSONDecodeError:
        return None
    if not isinstance(obj, dict):
        return None
    return {"object": obj, "want": want, "source": source}


def main() -> int:
    cases, skipped = [], 0
    for root, _, files in os.walk(SRC):
        for fname in sorted(files):
            if not fname.endswith(".vrl"):
                continue
            path = os.path.join(root, fname)
            rel = os.path.relpath(path, SRC)
            parsed = parse_file(path)
            if parsed is None:
                skipped += 1
                continue
            parsed["name"] = rel[:-4].replace("/", "__")
            cases.append(parsed)
    cases.sort(key=lambda c: c["name"])
    with open(OUT, "w") as f:
        json.dump(cases, f, indent=1, sort_keys=True)
    print(f"harvested {len(cases)} programs ({skipped} skipped: "
          "error-diagnostic or non-JSON headers)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
