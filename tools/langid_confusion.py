"""Regenerate LANGID_CONFUSION.md: per-language confusion matrix of
guess_language() over the labeled test corpus (tests/test_langid.py).

Usage: python tools/langid_confusion.py
"""

from __future__ import annotations

import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.test_langid import CORPUS  # noqa: E402
from vector_spark.dataops.text import guess_language  # noqa: E402


def main() -> None:
    conf: dict[str, dict[str, int]] = defaultdict(lambda: defaultdict(int))
    wrong = []
    for lang, text in CORPUS:
        got = guess_language(text)
        conf[lang][got] += 1
        if got != lang:
            wrong.append((lang, got, text[:60]))
    langs = sorted(conf)
    preds = sorted({p for row in conf.values() for p in row})
    lines = [
        "# Language-ID confusion matrix",
        "",
        f"`guess_language()` over the {len(CORPUS)}-sentence labeled corpus",
        "(tests/test_langid.py — first wave + round-5 held-out wave).",
        f"Accuracy: **{1 - len(wrong) / len(CORPUS):.3f}** "
        f"({len(CORPUS) - len(wrong)}/{len(CORPUS)}); gate >= 0.975.",
        "",
        "| true \\ pred | " + " | ".join(preds) + " | n |",
        "|---|" + "---|" * (len(preds) + 1),
    ]
    for lang in langs:
        row = conf[lang]
        n = sum(row.values())
        cells = [
            (f"**{row[p]}**" if p == lang else str(row[p])) if row.get(p) else ""
            for p in preds
        ]
        lines.append(f"| {lang} | " + " | ".join(cells) + f" | {n} |")
    lines += ["", "## Misclassifications", ""]
    if wrong:
        for lang, got, snippet in wrong:
            lines.append(f"- `{lang}` -> `{got}`: {snippet}…")
    else:
        lines.append("(none)")
    lines.append("")
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "LANGID_CONFUSION.md",
    )
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out}: acc={1 - len(wrong) / len(CORPUS):.4f}, "
          f"{len(wrong)} errors")


if __name__ == "__main__":
    main()
