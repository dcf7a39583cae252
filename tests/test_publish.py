"""Stage-3 publish pipeline tests (reference program3 semantics)."""

from __future__ import annotations

import json

from skoltexter_by_ai_spark.functions.markdown_lite import md_to_html
from skoltexter_by_ai_spark.plans import pipeline_publish as pub


def _schools(spark, rows):
    return spark.createDataFrame(
        [(code, name, idx) for idx, (code, name) in enumerate(rows)],
        ["SchoolCode", "SchoolName", "__row_idx"],
    )


def test_dedup_keeps_first_and_falls_back_name(spark):
    # Mirrors deduplicate_and_format_school_records doctest (:124-136).
    schools = _schools(
        spark,
        [("A", "Alpha"), ("A", "Alpha Again"), ("B", ""), ("", "NoCode")],
    )
    out = {r.id: r.name for r in pub.dedup_schools(schools).collect()}
    assert out == {"A": "Alpha", "B": "School (Code: B)"}


def test_joined_rows_sorted_by_name_with_fallback_description(spark):
    schools = _schools(spark, [("Z1", "Zebra"), ("A1", "Apple"), ("M1", "")])
    docs = spark.createDataFrame(
        [("Z1", "# Zebra School\n\nGood."), ("A1", "# Apple\n\nNice.")],
        ["school_code", "content"],
    )
    rows = pub.joined_site_rows(schools, docs).collect()
    # name order: Apple < School (Code: M1) < Zebra
    assert [r.id for r in rows] == ["A1", "M1", "Z1"]
    assert [r.name for r in rows] == ["Apple", "School (Code: M1)", "Zebra"]


def test_missing_doc_gets_fallback_html(spark):
    schools = _schools(spark, [("A", "Alpha")])
    rows = pub.joined_site_rows(schools, None).collect()
    assert rows[0].ai_description_html == pub.FALLBACK_DESCRIPTION_HTML


def test_site_json_is_reference_shaped(spark):
    schools = _schools(spark, [("A", "Alpha")])
    docs = spark.createDataFrame([("A", "**bold** text")], ["school_code", "content"])
    payload = json.loads(pub.site_json(schools, docs))
    assert payload == [
        {
            "id": "A",
            "name": "Alpha",
            "ai_description_html": "<p><strong>bold</strong> text</p>",
        }
    ]


def test_empty_input_produces_no_data_page(spark):
    schools = _schools(spark, [("", "")])
    html = pub.generate_site_html(schools, None)
    assert html == pub.NO_DATA_HTML


def test_site_html_embeds_json_and_search_js(spark, tmp_path):
    schools = _schools(spark, [("A", "Alpha"), ("B", "Beta")])
    out = pub.write_site(schools, None, str(tmp_path / "index.html"))
    html = open(out, encoding="utf-8").read()
    assert '"id": "A"' in html
    assert "toLowerCase().includes" in html  # Q-a substring search surface
    assert "TOP_K" in html  # L2 top-12 cap


def test_md_to_html_headers_lists_tables():
    md = "# Title\n\nPara **bold** *em*\n\n- one\n- two\n\n| a | b |\n|---|---|\n| 1 | 2 |\n"
    html = md_to_html(md)
    assert "<h1>Title</h1>" in html
    assert "<strong>bold</strong>" in html and "<em>em</em>" in html
    assert "<ul>" in html and "<li>one</li>" in html
    assert "<table>" in html and "<td>1</td>" in html
    # Header cells must come from the HEADER row, not the |---|
    # separator or a body row (mutation gate r3: lines[0] -> lines[1]
    # survived the weaker <table> assertion).
    assert "<th>a</th>" in html and "<th>b</th>" in html
    assert "---" not in html


def test_md_to_html_table_at_end_of_document():
    # Header + separator as the LAST lines (no body rows, no trailing
    # newline) must still be recognized as a table (the i+1 bound
    # check survived mutation when every fixture table had a body).
    html = md_to_html("intro\n\n| h1 | h2 |\n|---|---|")
    assert "<th>h1</th>" in html and "<tbody>" in html


def test_md_to_html_ordered_list():
    html = md_to_html("1. first\n2. second\n\ntail\n")
    assert "<ol>" in html and "</ol>" in html
    assert "<li>first</li>" in html and "<li>second</li>" in html
    assert "<p>tail</p>" in html


def test_md_to_html_fenced_code_escapes():
    html = md_to_html("```python\nx < y & z\n```")
    assert "<pre><code>x &lt; y &amp; z</code></pre>" in html


def test_docs_to_html_bad_row_never_fails_job(spark):
    docs = spark.createDataFrame([("A", None)], "school_code string, content string")
    rows = pub.docs_to_html(docs).collect()
    assert rows[0].html == pub.ERROR_DESCRIPTION_HTML


def test_dedup_trims_all_whitespace_like_python_strip(spark):
    """Reference uses str.strip() (ALL whitespace): codes differing by
    tab/newline/NBSP must dedup together and join the sanitize()-based
    school_code key; F.trim (ASCII space only) would not."""
    from skoltexter_by_ai_spark.plans.pipeline_publish import dedup_schools

    schools = spark.createDataFrame(
        [
            ("\tA1\n", "First", 0),
            ("A1 ", "Second", 1),
            (" B2", " ", 2),
        ],
        ["SchoolCode", "SchoolName", "__row_idx"],
    )
    rows = {r.id: r for r in dedup_schools(schools).collect()}
    assert set(rows) == {"A1", "B2"}
    assert rows["A1"].name == "First"  # keep-first across whitespace variants
    assert rows["B2"].name == "School (Code: B2)"  # blank name fallback


def test_md_to_html_prefers_markdown2_with_reference_extras(monkeypatch):
    """When markdown2 is importable the converter must delegate to it
    with exactly the reference's extras (program3_generate_website.py:
    198-204) — byte parity with the reference then follows from using
    the same library. Verified by reloading the module with a stub
    markdown2 injected."""
    import importlib
    import sys
    import types

    from skoltexter_by_ai_spark.functions import markdown_lite

    seen = {}
    stub = types.ModuleType("markdown2")

    def fake_markdown(text, extras=None):
        seen["text"] = text
        seen["extras"] = extras
        return "<p>FROM-MARKDOWN2</p>\n"

    stub.markdown = fake_markdown
    monkeypatch.setitem(sys.modules, "markdown2", stub)
    importlib.reload(markdown_lite)
    try:
        out = markdown_lite.md_to_html("# Title")
        assert out == "<p>FROM-MARKDOWN2</p>\n"
        assert seen["extras"] == ["tables", "fenced-code-blocks"]
        assert seen["text"] == "# Title"
    finally:
        monkeypatch.delitem(sys.modules, "markdown2")
        importlib.reload(markdown_lite)
    assert not markdown_lite._HAVE_MARKDOWN2  # restored to subset path
