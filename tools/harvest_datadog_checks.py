"""Harvest the reference's datadog_search condition test vectors
(src/conditions/datadog_search.rs get_checks(): (source, pass_event,
fail_event) triples built with log_event!/json!) into
tests/fixtures/datadog_checks.json."""

import json
import os
import re

SRC = "/root/reference/src/conditions/datadog_search.rs"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures", "datadog_checks.json",
)


def split_top(s: str) -> list[str]:
    """Split a tuple body on top-level commas."""
    parts, depth, cur, in_str, esc, raw = [], 0, [], False, False, False
    i = 0
    while i < len(s):
        c = s[i]
        if in_str:
            cur.append(c)
            if esc:
                esc = False
            elif c == "\\" and not raw:
                esc = True
            elif c == '"':
                in_str = False
            i += 1
            continue
        if c == '"':
            raw = i >= 2 and s[i - 2 : i] == 'r#'
            in_str = True
            cur.append(c)
        elif c in "([{":
            depth += 1
            cur.append(c)
        elif c in ")]}":
            depth -= 1
            cur.append(c)
        elif c == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(c)
        i += 1
    tail = "".join(cur).strip()
    if tail:
        parts.append(tail)
    return parts


def rust_str(tok: str):
    tok = tok.strip()
    m = re.match(r'^r#"(.*)"#$', tok, re.S)
    if m:
        return m.group(1)
    m = re.match(r'^"(.*)"$', tok, re.S)
    if m:
        body = m.group(1)
        return (
            body.replace('\\"', '"')
            .replace("\\\\", "\\")
            .replace("\\n", "\n")
            .replace("\\t", "\t")
        )
    return None


def parse_value(tok: str):
    tok = tok.strip()
    s = rust_str(tok)
    if s is not None:
        return s
    m = re.match(r"^json!\((.*)\)$", tok, re.S)
    if m:
        return json.loads(m.group(1))
    m = re.match(r"^vec!\[(.*)\]$", tok, re.S)
    if m:
        return [parse_value(p) for p in split_top(m.group(1))]
    if re.match(r"^-?\d+$", tok):
        return int(tok)
    if re.match(r"^-?\d+\.\d+$", tok):
        return float(tok)
    if tok in ("true", "false"):
        return tok == "true"
    raise ValueError(f"unparseable value: {tok[:60]!r}")


def parse_event(tok: str) -> dict:
    tok = tok.strip()
    m = re.match(r"^log_event!\s*[\[(](.*)[\])]$", tok, re.S)
    if m is None:
        raise ValueError(f"not a log_event: {tok[:60]!r}")
    body = m.group(1).strip()
    ev = {}
    if not body:
        return ev
    for pair in split_top(body):
        k, _, v = pair.partition("=>")
        key = rust_str(k.strip())
        ev[key] = parse_value(v.strip())
    return ev


def strip_comments(s: str) -> str:
    """Remove // line comments outside string literals (URLs inside
    quotes keep their //)."""
    out, i, in_str, esc = [], 0, False, False
    while i < len(s):
        c = s[i]
        if in_str:
            out.append(c)
            if esc:
                esc = False
            elif c == "\\":
                esc = True
            elif c == '"':
                in_str = False
            i += 1
            continue
        if c == '"':
            in_str = True
            out.append(c)
            i += 1
            continue
        if c == "/" and s[i : i + 2] == "//":
            while i < len(s) and s[i] != "\n":
                i += 1
            continue
        out.append(c)
        i += 1
    return "".join(out)


def main():
    src = open(SRC).read()
    start = src.index("fn get_checks()")
    body = strip_comments(src[start : src.index("fn test_filter")])
    # triples: ( <source>, log_event![...], log_event![...] ),
    triples = re.findall(
        r"\(\s*((?:r#)?\"(?:[^\"\\]|\\.)*\"(?:#)?)\s*,(.*?)\)\s*,\s*(?://|\n\s*[(/])",
        body,
        re.S,
    )
    # simpler: walk parens at depth of the vec![] literal
    vec_start = body.index("vec![") + len("vec![")
    depth = 1
    i = vec_start
    items = []
    cur_start = None
    in_str = False
    esc = False
    while i < len(body) and depth > 0:
        c = body[i]
        if in_str:
            if esc:
                esc = False
            elif c == "\\":
                esc = True
            elif c == '"':
                in_str = False
        elif c == '"':
            in_str = True
        elif c in "([{":
            if depth == 1 and c == "(":
                cur_start = i
            depth += 1
        elif c in ")]}":
            depth -= 1
            if depth == 1 and c == ")" and cur_start is not None:
                items.append(body[cur_start + 1 : i])
                cur_start = None
        i += 1
    out = []
    skipped = []
    for item in items:
        parts = split_top(item)
        if len(parts) != 3:
            skipped.append(item[:60])
            continue
        try:
            source = rust_str(parts[0])
            if source is None:
                raise ValueError(f"bad source {parts[0][:40]!r}")
            out.append(
                {
                    "source": source,
                    "pass": parse_event(parts[1]),
                    "fail": parse_event(parts[2]),
                }
            )
        except ValueError as e:
            skipped.append(f"{item[:60]} -> {e}")
    json.dump(out, open(OUT, "w"), indent=1, ensure_ascii=False)
    print(f"harvested {len(out)} checks, skipped {len(skipped)}")
    for s in skipped[:10]:
        print("  SKIP", s)


if __name__ == "__main__":
    main()
