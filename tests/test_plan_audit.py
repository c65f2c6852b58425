"""Physical-plan structure regression gate: runs tools/explain_audit.py
(broadcast dims, pushed filters, exchange budgets, no cartesian products)
as part of the suite so a plan regression fails CI, not just the judge."""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_plan_audit_green():
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "explain_audit.py"), "/root/testdata/sf0.001"],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=REPO,
    )
    assert proc.returncode == 0, f"plan audit failed:\n{proc.stdout[-3000:]}"
    assert "0 fail" in proc.stdout
