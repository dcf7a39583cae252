"""Scalar text functions mirroring the reference's cleaning semantics.

Each function documents the reference behavior it reproduces
(file:line into /root/reference) and is expressed as built-in column
operations so the whole chain stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Reference src/config.py:79
MISSING_SENTINEL = "[Data Saknas]"

#: Reference src/config.py:107-111
FALLBACK_SCHOOL_NAME_FORMAT = "School (Code: {school_code})"
FALLBACK_DESCRIPTION_HTML = "<p><em>Description not available for this school.</em></p>"
ERROR_DESCRIPTION_HTML = "<p><em>Error loading description.</em></p>"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


#: Exactly the BMP characters Python's ``str.isspace()`` accepts —
#: Java regex ``\s`` misses \x1c-\x1f, \x85, \xa0 and the Unicode Zs
#: block, so a bare ``\s`` trim diverges from the reference's
#: ``.strip()`` (found by tests/test_template_properties.py).
PY_WS = "\\t\\n\\x0b\\f\\r\\x1c-\\x1f \\x85\\xa0\\u1680\\u2000-\\u200a\\u2028\\u2029\\u202f\\u205f\\u3000"


def ws_trim(col: Column | str) -> Column:
    """Python-``str.strip()`` equivalent: trims ALL whitespace (Spark's
    ``trim`` removes spaces only, which diverges on newlines)."""
    return F.regexp_replace(_c(col), f"^[{PY_WS}]+|[{PY_WS}]+$", "")


def ws_ltrim(col: Column | str) -> Column:
    return F.regexp_replace(_c(col), f"^[{PY_WS}]+", "")


def ws_rtrim(col: Column | str) -> Column:
    return F.regexp_replace(_c(col), f"[{PY_WS}]+$", "")


def sanitize(col: Column | str) -> Column:
    """Trim; empty or any-case 'N/A' becomes NULL.

    Reference ``get_value_from_row`` (program1_generate_markdowns.py:92-123)
    returns the sentinel for those; we keep NULL internally and apply
    the sentinel only at render time (SURVEY §1.2). Trim must match
    Python ``str.strip()`` — ALL whitespace, not Spark ``trim``'s
    spaces-only.
    """
    trimmed = ws_trim(_c(col))
    return F.when((trimmed == "") | (F.upper(trimmed) == "N/A"), None).otherwise(trimmed)


def number_fmt(col: Column | str) -> Column:
    """Strip a redundant trailing '.0' from integer-like strings:
    '32.0' -> '32' (program1_generate_markdowns.py:282-297)."""
    return F.regexp_replace(_c(col), r"^(-?\d+)\.0$", "$1")


def with_sentinel(col: Column | str) -> Column:
    """NULL -> '[Data Saknas]' (render-time materialization)."""
    return F.coalesce(_c(col), F.lit(MISSING_SENTINEL))


def strip_code_fences(col: Column | str) -> Column:
    """Remove ``` fences from LLM output.

    Reproduces ``_clean_ai_response`` (program2_ai_processor.py:292-326):
    1. full-match ```lang\\n...\\n``` -> inner, trimmed;
    2. else prefix '```markdown' / '```' stripped + lstrip;
    3. then suffix '```' stripped + rstrip.
    Implemented as the same three-step chain over trimmed input.
    """
    c = ws_trim(_c(col))
    # Step 1: whole-string fence (optional language tag, case-insensitive).
    full = r"(?is)^\s*```(?:[a-zA-Z0-9]+\s*\n)?(.*?)\n?```\s*$"
    inner = F.regexp_extract(c, full, 1)
    matched = c.rlike(full)
    # Steps 2+3 fallback: strip prefix fence, then suffix fence.
    no_prefix = F.when(
        c.startswith("```markdown"), ws_ltrim(F.substring(c, F.lit(12), F.length(c)))
    ).otherwise(
        F.when(c.startswith("```"), ws_ltrim(F.substring(c, F.lit(4), F.length(c)))).otherwise(c)
    )
    no_suffix = F.when(
        no_prefix.endswith("```"),
        ws_rtrim(F.substring(no_prefix, F.lit(1), F.length(no_prefix) - 3)),
    ).otherwise(no_prefix)
    return F.when(matched, ws_trim(inner)).otherwise(no_suffix)


def clean_html(col: Column | str) -> Column:
    """The 10-step HTML cleanup chain, same regexes in the same order
    (program3_generate_website.py:242-258)."""
    c = _c(col)
    steps = [
        (r"<p>\s*</p>", ""),
        (r"<p>&nbsp;</p>", ""),
        (r"<p><br\s*/?>\s*</p>", ""),
        (r"(<h[1-6][^>]*>.*?</h[1-6]>)\s*<p>\s*</p>", "$1"),
        (r"(<h[1-6][^>]*>.*?</h[1-6]>)\s*<br\s*/?>\s*", "$1\n"),
        (r"(<br\s*/?>\s*){2,}", "<br>"),
        (r"(<h[1-6][^>]*>.*?</h[1-6]>)\s*<br\s*/?>", "$1"),
        (r"<p>\s*<br\s*/?>\s*</p>", ""),
        (r"\n\s*\n\s*\n+", "\n\n"),
        (r">\s+<", "><"),
    ]
    for pattern, repl in steps:
        c = F.regexp_replace(c, pattern, repl)
    return ws_trim(c)


def extract_llm_content(response_col: Column | str) -> Column:
    """choices[0].message.content from a chat-completions JSON string
    (program2_ai_processor.py:404-433); NULL when missing/empty."""
    content = F.get_json_object(_c(response_col), "$.choices[0].message.content")
    return F.when(content == "", None).otherwise(content)
