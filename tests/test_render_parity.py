"""Stage-1 parity: our compiled-template render must reproduce the
reference Program 1 byte-for-byte on the reference's own CSV+template.

The reference is stdlib-only for stage 1, so we run it as a subprocess
oracle (no code reuse) and diff every generated document.
"""

from __future__ import annotations

import pathlib
import subprocess
import sys

import pytest

from skoltexter_by_ai_spark.functions.template import render_documents
from skoltexter_by_ai_spark.sources.schools_csv import read_schools_csv

REF = pathlib.Path("/root/reference")
CSV = REF / "data/database_data/database_school_data.csv"
TEMPLATE = REF / "data/templates/school_description_template.md"

pytestmark = pytest.mark.skipif(not CSV.exists(), reason="reference data unavailable")


@pytest.fixture(scope="module")
def reference_output(tmp_path_factory):
    out = tmp_path_factory.mktemp("ref_md")
    proc = subprocess.run(
        [
            sys.executable,
            str(REF / "src/program1_generate_markdowns.py"),
            "--csv-path",
            str(CSV),
            "--template-path",
            str(TEMPLATE),
            "--output-dir",
            str(out),
        ],
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    return out


def test_stage1_byte_parity_with_reference(spark, reference_output):
    schools = read_schools_csv(spark, str(CSV))
    ours = {
        r.school_code: r.content
        for r in render_documents(schools, TEMPLATE.read_text(encoding="utf-8")).collect()
    }
    ref_files = sorted(reference_output.glob("*.md"))
    assert len(ref_files) == len(ours) > 0
    mismatches = []
    for path in ref_files:
        code = path.stem
        theirs = path.read_text(encoding="utf-8")
        if ours.get(code) != theirs:
            mine = ours.get(code, "<MISSING>")
            for i, (a, b) in enumerate(zip(theirs, mine)):
                if a != b:
                    mismatches.append((code, i, theirs[max(0, i - 40) : i + 40], mine[max(0, i - 40) : i + 40]))
                    break
            else:
                mismatches.append((code, "len", len(theirs), len(mine)))
    assert not mismatches, mismatches[:3]


def test_stage1_row_count_matches_reference(spark, reference_output):
    schools = read_schools_csv(spark, str(CSV))
    n = render_documents(schools, TEMPLATE.read_text(encoding="utf-8")).count()
    assert n == len(list(reference_output.glob("*.md")))
