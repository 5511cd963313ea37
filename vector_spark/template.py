"""Event templates (src/template.rs:18-34,110-128): `{{ field }}`
interpolation plus strftime timestamp specifiers, compiled to ONE
Catalyst concat/date_format expression — the engine behind the
reference's KeyPartitioner (sink path templates,
src/sinks/util/partitioner.rs:5-30) and templated metric names
(src/transforms/log_to_metric.rs).

`render_template("logs-{{ app }}-%Y-%m-%d", ts_col="ts")` returns a
string Column evaluated per row, entirely JVM-side.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["render_template", "template_fields", "TemplateError"]


class TemplateError(ValueError):
    pass


_FIELD_RE = re.compile(r"\{\{\s*([^{}]+?)\s*\}\}")

# strftime -> Java SimpleDateFormat/DateTimeFormatter specifiers
# (chrono strftime set used by template.rs; the common subset)
_STRFTIME = {
    "Y": "yyyy", "y": "yy", "m": "MM", "d": "dd", "e": "d",
    "H": "HH", "I": "hh", "M": "mm", "S": "ss", "j": "DDD",
    "b": "MMM", "B": "MMMM", "a": "EEE", "A": "EEEE", "p": "a",
    "Z": "zzz", "z": "Z", "s": None,  # %s handled separately
}
_COMPOUND = {"F": "yyyy-MM-dd", "T": "HH:mm:ss", "D": "MM/dd/yy",
             "R": "HH:mm"}


def template_fields(template: str) -> list[str]:
    """Field names referenced by `{{ ... }}` specs, in order."""
    return [m.group(1) for m in _FIELD_RE.finditer(template)]


def _strftime_to_java(lit: str) -> str:
    """Convert a strftime literal run to a Java datetime pattern,
    quoting non-specifier text (Java treats bare letters as
    patterns)."""
    out: list[str] = []
    buf: list[str] = []  # pending literal chars

    def flush():
        if buf:
            text = "".join(buf)
            out.append("'" + text.replace("'", "''") + "'")
            buf.clear()

    i = 0
    while i < len(lit):
        c = lit[i]
        if c == "%" and i + 1 < len(lit):
            spec = lit[i + 1]
            if spec == "%":
                buf.append("%")
            elif spec in _COMPOUND:
                flush()
                out.append(_COMPOUND[spec])
            elif spec in _STRFTIME and _STRFTIME[spec]:
                flush()
                out.append(_STRFTIME[spec])
            else:
                raise TemplateError(
                    f"unsupported strftime specifier %{spec}"
                )
            i += 2
            continue
        buf.append(c)
        i += 1
    flush()
    return "".join(out)


def _literal_piece(lit: str, ts_col: str) -> Column:
    if "%" not in lit:
        return F.lit(lit)
    # mask escaped percents BEFORE the %s split: '%%s' is the literal
    # text '%s' (strftime consumes %% first), not an escaped '%'
    # followed by epoch seconds
    _SENT = "\x00"
    masked = lit.replace("%%", _SENT)
    if "%s" in masked:
        # epoch seconds: splice around each %s occurrence
        parts = [p.replace(_SENT, "%%") for p in masked.split("%s")]
        cols: list[Column] = []
        for i, p in enumerate(parts):
            if p:
                cols.append(_literal_piece(p, ts_col))
            if i < len(parts) - 1:
                cols.append(
                    F.col(ts_col)
                    .cast("timestamp_ltz")
                    .cast("long")
                    .cast("string")
                )
        return F.concat(*cols) if len(cols) > 1 else cols[0]
    return F.date_format(F.col(ts_col), _strftime_to_java(lit))


def render_template(template: str, ts_col: str = "ts") -> Column:
    """Compile a template to a string Column: `{{ field }}` ->
    per-row field value (render_fields, template.rs:183-204),
    strftime specs -> date_format on `ts_col` (render_timestamp)."""
    pieces: list[Column] = []
    pos = 0
    for m in _FIELD_RE.finditer(template):
        lit = template[pos : m.start()]
        if lit:
            pieces.append(_literal_piece(lit, ts_col))
        pieces.append(F.col(m.group(1)).cast("string"))
        pos = m.end()
    tail = template[pos:]
    if tail:
        pieces.append(_literal_piece(tail, ts_col))
    if not pieces:
        return F.lit("")
    return pieces[0] if len(pieces) == 1 else F.concat(*pieces)
