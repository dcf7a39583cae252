"""Randomized driver-conditions spot check wired into the suite
(VERDICT r3 item 6): every pytest run exercises a rotating sample of
declared queries on a VANILLA SparkSession at the driver's t2 scale
(sf0.01) through the public ``__spark_entry__`` surface — catching
anything that only works under the tuned test session fixture.

Runs in a subprocess because the vanilla session must not share the
suite's tuned JVM/session."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_driver_style_rotating_sample():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "driver_spotcheck.py"), "--n", "4"],
        capture_output=True,
        text=True,
        timeout=900,
        cwd=REPO,
    )
    tail = "\n".join(proc.stdout.strip().splitlines()[-3:])
    assert proc.returncode == 0, f"spot check failed:\n{tail}\n{proc.stderr[-1500:]}"
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["ok"] and len(summary["results"]) == 4, summary
