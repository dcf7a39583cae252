"""Unit tests for the scalar text functions, using the reference's own
doctest examples as the spec (SURVEY §5 'doctests as spec')."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from skoltexter_by_ai_spark.functions import text
from skoltexter_by_ai_spark.functions.template import compile_template, extract_placeholders


def _eval(spark, col, value):
    df = spark.createDataFrame([(value,)], ["v"])
    return df.select(col.alias("out")).collect()[0].out


@pytest.mark.parametrize(
    ("value", "expected"),
    [
        ("  123  ", "123"),
        ("N/A", None),
        ("n/a", None),
        ("", None),
        ("   ", None),
        ("ok", "ok"),
    ],
)
def test_sanitize(spark, value, expected):
    assert _eval(spark, text.sanitize(F.col("v")), value) == expected


@pytest.mark.parametrize(
    ("value", "expected"),
    [
        ("10.0", "10"),
        ("-5.0", "-5"),
        ("32.5", "32.5"),
        ("10.00", "10.00"),
        ("abc", "abc"),
        ("[Data Saknas]", "[Data Saknas]"),
    ],
)
def test_number_fmt(spark, value, expected):
    assert _eval(spark, text.number_fmt(F.col("v")), value) == expected


@pytest.mark.parametrize(
    ("value", "expected"),
    [
        ("hello", "hello"),  # reference doctest :308
        ("```code```", "code"),  # reference doctest :310
        ("```markdown\n# Title\nBody\n```", "# Title\nBody"),
        ("```MARKDOWN\nx\n```", "x"),  # case-insensitive language tag
        ("```\njust fenced\n```", "just fenced"),
        ("```markdown partial without closing", "partial without closing"),
        ("trailing only```", "trailing only"),
        ("  \n```python\nprint(1)\n```\n  ", "print(1)"),
    ],
)
def test_strip_code_fences(spark, value, expected):
    assert _eval(spark, text.strip_code_fences(F.col("v")), value) == expected


def test_clean_html_reference_doctest(spark):
    # program3_generate_website.py doctest :124-136
    raw = "<p>Title</p><p>  </p><p><br/></p><div>Content</div><br><br>"
    assert (
        _eval(spark, text.clean_html(F.col("v")), raw)
        == "<p>Title</p><div>Content</div><br>"
    )


def test_extract_llm_content(spark):
    ok = '{"choices":[{"message":{"content":"hello **world**"}}]}'
    assert _eval(spark, text.extract_llm_content(F.col("v")), ok) == "hello **world**"
    assert _eval(spark, text.extract_llm_content(F.col("v")), '{"choices":[]}') is None
    assert (
        _eval(spark, text.extract_llm_content(F.col("v")), '{"choices":[{"message":{"content":""}}]}')
        is None
    )


def test_extract_placeholders_matches_reference_doctest():
    tpl = "Hello {SchoolName}! Code: {SchoolCode}. {SurveyAnswerCategory_Math}"
    assert extract_placeholders(tpl) == [
        "SchoolCode",
        "SchoolName",
        "SurveyAnswerCategory_Math",
    ]


def test_compile_template_reference_doctest_semantics(spark):
    # render_template doctest :271-279: missing placeholder -> sentinel,
    # '10.0' -> '10'.
    df = spark.createDataFrame(
        [("Alpha", "A-01", "10.0")], ["SchoolName", "SchoolCode", "Score"]
    )
    tpl = "Name: {SchoolName}, Code: {SchoolCode}, Score: {Score}, X: {Missing}"
    out = df.select(compile_template(tpl, df.columns).alias("doc")).collect()[0].doc
    assert out == "Name: Alpha, Code: A-01, Score: 10, X: [Data Saknas]"


def test_compile_template_survey_coalesce_and_year(spark):
    # get_survey_answer_value doctest :246-251 + survey-year resolution.
    df = spark.createDataFrame(
        [("", "72", "x")],
        ["SurveyAnswerCategory_Read_2023/2024", "SurveyAnswerCategory_Read_2022/2023", "ignore"],
    )
    tpl = "Year {SurveySchoolYear}: {SurveyAnswerCategory_Read}"
    out = df.select(compile_template(tpl, df.columns).alias("doc")).collect()[0].doc
    assert out == "Year 2022/2023: 72"


def test_compile_template_year_prefers_latest(spark):
    df = spark.createDataFrame(
        [("85", "80")],
        ["SurveyAnswerCategory_Math_2023/2024", "SurveyAnswerCategory_Math_2022/2023"],
    )
    tpl = "{SurveySchoolYear}/{SurveyAnswerCategory_Math}"
    out = df.select(compile_template(tpl, df.columns).alias("doc")).collect()[0].doc
    assert out == "2023/2024/85"


def test_compile_template_no_survey_data_sentinel(spark):
    df = spark.createDataFrame(
        [("", "")],
        ["SurveyAnswerCategory_Math_2023/2024", "SurveyAnswerCategory_Math_2022/2023"],
    )
    tpl = "{SurveySchoolYear}"
    out = df.select(compile_template(tpl, df.columns).alias("doc")).collect()[0].doc
    assert out == "[Data Saknas]"
