"""Markdown -> HTML conversion (F10).

The reference uses ``markdown2`` with the ``tables`` and
``fenced-code-blocks`` extras (program3_generate_website.py:198-204).
``markdown2`` is not in this image, so this module implements the
subset those documents actually use — headings, paragraphs,
bold/italic, unordered/ordered lists, pipe tables, fenced code — as a
pure function plus an Arrow-batched pandas UDF. If ``markdown2`` is
importable it is preferred, keeping byte-parity with the reference.

This is deliberately the ONE Python boundary in the publish pipeline:
everything before/after it is built-in column expressions.
"""

from __future__ import annotations

import html as _html
import re

try:  # pragma: no cover - not present in the CI image
    import markdown2  # type: ignore

    _HAVE_MARKDOWN2 = True
except ImportError:
    markdown2 = None
    _HAVE_MARKDOWN2 = False


def _inline(text: str) -> str:
    text = _html.escape(text, quote=False)
    text = re.sub(r"\*\*(.+?)\*\*", r"<strong>\1</strong>", text)
    text = re.sub(r"(?<!\*)\*(?!\*)(.+?)(?<!\*)\*(?!\*)", r"<em>\1</em>", text)
    text = re.sub(r"`([^`]+)`", r"<code>\1</code>", text)
    return text


def _table(lines: list[str]) -> str:
    def cells(line: str) -> list[str]:
        return [c.strip() for c in line.strip().strip("|").split("|")]

    head = cells(lines[0])
    rows = [cells(ln) for ln in lines[2:]]
    out = ["<table>", "<thead>", "<tr>"]
    out += [f"<th>{_inline(c)}</th>" for c in head]
    out += ["</tr>", "</thead>", "<tbody>"]
    for row in rows:
        out.append("<tr>" + "".join(f"<td>{_inline(c)}</td>" for c in row) + "</tr>")
    out += ["</tbody>", "</table>"]
    return "\n".join(out)


_SEP_ROW = re.compile(r"^\s*\|?[\s:|-]+\|[\s:|-]*$")


def md_to_html(text: str) -> str:
    """Convert a markdown document to HTML (subset; see module doc).

    Subset-path examples (with ``markdown2`` installed, output comes
    from the library instead):

    >>> _HAVE_MARKDOWN2 or md_to_html("# Hi") == "<h1>Hi</h1>\\n"
    True
    >>> _HAVE_MARKDOWN2 or md_to_html("a **b** c") == "<p>a <strong>b</strong> c</p>\\n"
    True
    >>> _HAVE_MARKDOWN2 or md_to_html("- x\\n- y").startswith("<ul>")
    True
    """
    if _HAVE_MARKDOWN2:  # pragma: no cover
        return markdown2.markdown(text, extras=["tables", "fenced-code-blocks"])

    lines = text.split("\n")
    out: list[str] = []
    para: list[str] = []
    i = 0

    def flush_para() -> None:
        if para:
            out.append("<p>" + "\n".join(_inline(p) for p in para) + "</p>")
            para.clear()

    while i < len(lines):
        line = lines[i]
        stripped = line.strip()
        if stripped.startswith("```"):
            flush_para()
            code: list[str] = []
            i += 1
            while i < len(lines) and not lines[i].strip().startswith("```"):
                code.append(lines[i])
                i += 1
            out.append("<pre><code>" + _html.escape("\n".join(code)) + "</code></pre>")
            i += 1
            continue
        m = re.match(r"^(#{1,6})\s+(.*)$", stripped)
        if m:
            flush_para()
            level = len(m.group(1))
            out.append(f"<h{level}>{_inline(m.group(2).strip())}</h{level}>")
            i += 1
            continue
        if (
            "|" in stripped
            and i + 1 < len(lines)
            and _SEP_ROW.match(lines[i + 1] or "")
        ):
            flush_para()
            tbl = [lines[i]]
            i += 1
            while i < len(lines) and "|" in lines[i]:
                tbl.append(lines[i])
                i += 1
            out.append(_table(tbl))
            continue
        if re.match(r"^[-*]\s+", stripped):
            flush_para()
            items = []
            while i < len(lines) and re.match(r"^[-*]\s+", lines[i].strip()):
                items.append(re.sub(r"^[-*]\s+", "", lines[i].strip()))
                i += 1
            out.append("<ul>\n" + "\n".join(f"<li>{_inline(x)}</li>" for x in items) + "\n</ul>")
            continue
        if re.match(r"^\d+\.\s+", stripped):
            flush_para()
            items = []
            while i < len(lines) and re.match(r"^\d+\.\s+", lines[i].strip()):
                items.append(re.sub(r"^\d+\.\s+", "", lines[i].strip()))
                i += 1
            out.append("<ol>\n" + "\n".join(f"<li>{_inline(x)}</li>" for x in items) + "\n</ol>")
            continue
        if stripped == "":
            flush_para()
            i += 1
            continue
        para.append(stripped)
        i += 1
    flush_para()
    return "\n\n".join(out) + ("\n" if out else "")


def _md_batch(s):
    """pandas.Series[str] -> pandas.Series[str|None] (per-row safe)."""

    def safe(x):
        if x is None:
            return None
        try:
            return md_to_html(x)
        except Exception:
            return None

    return s.map(safe)


def md_to_html_udf():
    """Arrow-batched pandas UDF wrapping :func:`md_to_html`.

    Per-row failures produce NULL (the caller coalesces to the
    reference's ERROR_DESCRIPTION_HTML), mirroring the reference's
    per-row try/except (program3_generate_website.py:200-209) — a bad
    document must never fail the job. Built lazily so importing this
    module never requires an active SparkSession.
    """
    import pandas as pd  # noqa: F401  (worker-side dependency)
    from pyspark.sql import functions as F
    from pyspark.sql.functions import PandasUDFType

    return F.pandas_udf(_md_batch, "string")
