"""Shipped-artifact reproduction guard: the headline transfer rows must
regenerate from the committed checkpoints."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_reproduce_fast_rows():
    if not os.path.exists(os.path.join(REPO, "artifacts", "KS22")):
        pytest.skip("artifacts not present")
    r = subprocess.run([sys.executable, "reproduce.py"], cwd=REPO, env=dict(os.environ),
                       capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    rows = [json.loads(l) for l in r.stdout.splitlines() if l.startswith("{")]
    by_name = {row["row"]: row for row in rows}
    assert by_name["KS22 stabilization"]["suppression"] < 0.1
    assert by_name["KS200 -> KS500 transfer"]["suppression"] < 0.3
    assert by_name["KS200 -> mu=0.02 disturbed"]["suppression"] < 0.3
