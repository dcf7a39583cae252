"""Stage-3 parity: dedup + enrich-join + publish (program3).

Plan shape (SURVEY §3.3):
projected scan -> window keep-first dedup (A3) -> name fallback ->
left join AI docs (J1) -> markdown->HTML UDF (F10) + cleanup chain
(F9) -> order by display name -> single-doc site sink (S7, driver-side
splice of an already-aggregated result).

Scale posture: everything up to the final JSON aggregation is
distributed; the single-artifact sink is the reference's semantic (one
self-contained HTML file) so the terminal collect is by design and
operates on the deduped, joined, *projected* rows only.
"""

from __future__ import annotations

import json
import pathlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from skoltexter_by_ai_spark.functions.markdown_lite import md_to_html_udf
from skoltexter_by_ai_spark.functions.text import (
    ERROR_DESCRIPTION_HTML,
    FALLBACK_DESCRIPTION_HTML,
    FALLBACK_SCHOOL_NAME_FORMAT,
    clean_html,
    ws_trim,
)

_TEMPLATE_PATH = pathlib.Path(__file__).resolve().parent.parent / "templates" / "website_template.html"

#: Reference src/config.py:112-117
NO_DATA_HTML = (
    '<!DOCTYPE html><html lang="en"><head><meta charset="UTF-8">'
    "<title>School Information</title>"
    "<style>body{font-family: sans-serif; text-align: center; padding: 50px;}</style></head>"
    "<body><h1>School Information</h1><p>No school data is available to display.</p></body></html>"
)


def dedup_schools(schools: DataFrame) -> DataFrame:
    """A3: keep-first-by-file-order dedup + name fallback.

    Reference semantics (program3_generate_website.py:138-162): rows
    with blank SchoolCode skipped; first occurrence per code wins
    (deterministic via ``__row_idx``, never ``dropDuplicates``); blank
    names get 'School (Code: {code})'. Output: (id, name, __row_idx).
    """
    # Python str.strip() semantics (ALL whitespace — tabs, newlines,
    # NBSP), not F.trim's ASCII-space-only: codes that differ by exotic
    # whitespace must dedup identically to the reference, and the id
    # must keep matching render_documents' sanitize()-derived
    # school_code join key.
    code = ws_trim(F.coalesce(F.col("SchoolCode"), F.lit("")))
    name = ws_trim(F.coalesce(F.col("SchoolName"), F.lit("")))
    order = F.col("__row_idx") if "__row_idx" in schools.columns else F.monotonically_increasing_id()
    base = (
        schools.select(
            code.alias("id"),
            name.alias("name"),
            order.alias("__row_idx"),
        )
        .filter(F.col("id") != "")
    )
    w = Window.partitionBy("id").orderBy("__row_idx")
    fallback = F.lit(FALLBACK_SCHOOL_NAME_FORMAT).alias("fmt")
    return (
        base.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .withColumn(
            "name",
            F.when(
                F.col("name") == "",
                F.replace(F.lit(FALLBACK_SCHOOL_NAME_FORMAT), F.lit("{school_code}"), F.col("id")),
            ).otherwise(F.col("name")),
        )
    )


def docs_to_html(ai_docs: DataFrame, code_col: str = "school_code", md_col: str = "content") -> DataFrame:
    """F10+F9: markdown -> cleaned HTML; conversion failure -> error
    HTML (per-row, never job-fatal). Output (school_code, html)."""
    converted = ai_docs.select(
        F.col(code_col).alias("school_code"),
        md_to_html_udf()(F.col(md_col)).alias("__raw_html"),
    )
    return converted.select(
        "school_code",
        F.coalesce(clean_html("__raw_html"), F.lit(ERROR_DESCRIPTION_HTML)).alias("html"),
    )


def joined_site_rows(schools: DataFrame, ai_docs: DataFrame | None) -> DataFrame:
    """J1: deduped schools LEFT JOIN doc HTML; missing doc -> fallback.

    Returns (id, name, ai_description_html) ordered by (name, file
    order) — the reference's stable name sort (program3:171).
    """
    deduped = dedup_schools(schools)
    if ai_docs is not None:
        html = docs_to_html(ai_docs)
        joined = deduped.join(html, deduped.id == html.school_code, "left")
    else:
        joined = deduped.withColumn("html", F.lit(None).cast("string"))
    return (
        joined.select(
            "id",
            "name",
            F.coalesce(F.col("html"), F.lit(FALLBACK_DESCRIPTION_HTML)).alias(
                "ai_description_html"
            ),
            "__row_idx",
        )
        .orderBy("name", "__row_idx")
        .drop("__row_idx")
    )


def site_json(schools: DataFrame, ai_docs: DataFrame | None) -> str:
    """F11: the embedded JSON array, formatted exactly like the
    reference's ``json.dumps(..., ensure_ascii=False)`` (program3:425)."""
    rows = [r.asDict() for r in joined_site_rows(schools, ai_docs).collect()]
    return json.dumps(rows, ensure_ascii=False)


def generate_site_html(schools: DataFrame, ai_docs: DataFrame | None, template_text: str | None = None) -> str:
    """S7: splice the JSON into the site template; empty input -> the
    no-data page (program3:303-359)."""
    payload = site_json(schools, ai_docs)
    if payload == "[]":
        return NO_DATA_HTML
    template = template_text if template_text is not None else _TEMPLATE_PATH.read_text(encoding="utf-8")
    return template.replace("__SCHOOLS_JSON_PLACEHOLDER__", payload)


def write_site(schools: DataFrame, ai_docs: DataFrame | None, output_path: str) -> str:
    html = generate_site_html(schools, ai_docs)
    out = pathlib.Path(output_path)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(html, encoding="utf-8")
    return str(out)
