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


# --- mutation-gate survivor kills (full-site run, round 4) ----------------
# Each test below pins behavior a surviving mutant could change
# undetected: EOF boundaries in the line loops, per-branch line
# advancement, quote preservation in inline text, and the
# forward-looking table separator probe.


def test_md_to_html_keeps_double_quotes_unescaped():
    # _inline escapes with quote=False (matching markdown2): a literal
    # double quote must come through verbatim, not as &quot;.
    assert '<p>say "hi" now</p>' in md_to_html('say "hi" now\n')


def test_md_to_html_unterminated_fence_at_eof():
    # An unclosed ``` fence must consume to EOF without an index error.
    html = md_to_html("intro\n\n```\ncode line\n")
    assert "<pre><code>code line" in html and "</code></pre>" in html


def test_md_to_html_multiline_code_block_keeps_every_line():
    html = md_to_html("```\nline one\nline two\nline three\n```\n")
    assert "line one\nline two\nline three" in html


def test_md_to_html_paragraph_directly_after_code_block():
    # The line immediately after the closing fence must not be skipped.
    html = md_to_html("```\ncode\n```\ntail paragraph\n")
    assert "<p>tail paragraph</p>" in html


def test_md_to_html_paragraph_directly_after_heading():
    # No blank line between heading and text: both must render.
    html = md_to_html("# Title\nbody right after\n")
    assert "<h1>Title</h1>" in html and "<p>body right after</p>" in html


def test_md_to_html_trailing_pipe_line_is_paragraph():
    # A final line containing '|' (no separator row after it — there is
    # no next line at all) is a plain paragraph, and probing the next
    # line must not run off the end.
    html = md_to_html("a | b")
    assert "<p>a | b</p>" in html


def test_md_to_html_table_at_document_start():
    # Table detection looks FORWARD at lines[i+1] for the separator;
    # a table on line 0 (nothing before it) must be detected.
    html = md_to_html("| h1 | h2 |\n|---|---|\n| a | b |\n")
    assert "<th>h1</th>" in html and "<td>b</td>" in html


def test_md_to_html_list_item_on_last_line():
    # Document ending in a list item (no trailing blank/newline): the
    # list loop must stop at EOF, not index past it.
    html = md_to_html("- only item")
    assert "<ul>\n<li>only item</li>\n</ul>" in html


def test_md_to_html_multiline_paragraph_keeps_every_line():
    html = md_to_html("first line\nsecond line\nthird line\n")
    assert "<p>first line\nsecond line\nthird line</p>" in html


def test_md_to_html_multi_item_lists_keep_every_item():
    # Per-item advancement: a 2-item unordered and ordered list must
    # emit both items (an `i += 1` -> `+= 2` mutant drops every other).
    html = md_to_html("- first\n- second\n\n1. one\n2. two\n")
    assert "<li>first</li>" in html and "<li>second</li>" in html
    assert "<li>one</li>" in html and "<li>two</li>" in html


def test_md_to_html_ordered_list_item_on_last_line():
    html = md_to_html("1. only one")
    assert "<ol>\n<li>only one</li>\n</ol>" in html
