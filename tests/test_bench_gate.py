"""Bench budget gate (VERDICT r6 item 1b): the committed steady-state
bench record must stay inside the suite budget — total under 115 s at
sf0.1, no query over 4 s, no failures. The gate reads HEAD's record,
not the working tree, so a driver bench run on a loaded box (which
overwrites the working-tree copy) cannot fail it; only COMMITTING a
bad record can."""

from __future__ import annotations

import json
import subprocess
import sys
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GATE = os.path.join(REPO, "tools", "bench_gate.py")


def _run(*args: str) -> tuple[int, dict]:
    proc = subprocess.run(
        [sys.executable, GATE, *args], capture_output=True, text=True, cwd=REPO
    )
    return proc.returncode, json.loads(proc.stdout)


def test_committed_bench_record_within_budget():
    head_has_record = (
        subprocess.run(
            ["git", "cat-file", "-e", "HEAD:BENCH_LOCAL.json"],
            cwd=REPO,
            capture_output=True,
        ).returncode
        == 0
    )
    if not head_has_record:
        pytest.skip("no BENCH_LOCAL.json committed at HEAD")
    rc, out = _run()
    assert rc == 0 and out["ok"], f"budget violations: {out['violations']}"


def test_gate_flags_total_and_per_query_violations(tmp_path):
    bad = {
        "value": 130.0,
        "sf": 0.1,
        "queries": {"q01_x": 0.5, "x90_slow": 5.2},
        "failures": {"x13": "boom"},
    }
    p = tmp_path / "bench.json"
    p.write_text(json.dumps(bad))
    rc, out = _run("--file", str(p))
    assert rc == 1 and not out["ok"]
    joined = " ".join(out["violations"])
    assert "total 130.00s" in joined
    assert "x90_slow" in joined and "q01_x" not in joined
    assert "failures" in joined

    good = {"value": 100.0, "sf": 0.1, "queries": {"q01_x": 0.5}}
    p.write_text(json.dumps(good))
    rc, out = _run("--file", str(p))
    assert rc == 0 and out["ok"] and out["violations"] == []


def test_gate_rejects_wrong_scale_factor(tmp_path):
    p = tmp_path / "bench.json"
    p.write_text(json.dumps({"value": 10.0, "sf": 0.01, "queries": {}}))
    rc, out = _run("--file", str(p))
    assert rc == 1 and not out["ok"]


def test_gate_fails_closed_with_json_line_on_malformed_record(tmp_path):
    """ADVICE r7: a non-JSON file or a record missing 'value' must
    still emit the one-line JSON verdict (ok=false, err set) instead
    of an uncaught traceback — exit code stays nonzero either way."""
    garbled = tmp_path / "garbled.json"
    garbled.write_text("not json {")
    rc, out = _run("--file", str(garbled))
    assert rc == 1 and out["ok"] is False and "err" in out

    keyless = tmp_path / "keyless.json"
    keyless.write_text(json.dumps({"sf": 0.1, "queries": {}}))
    rc, out = _run("--file", str(keyless))
    assert rc == 1 and out["ok"] is False and "KeyError" in out["err"]

    missing = tmp_path / "does_not_exist.json"
    rc, out = _run("--file", str(missing))
    assert rc == 1 and out["ok"] is False and "err" in out
