"""Env-gated full-surface sweep at sf0.1 (VERDICT r3 #4).

Manual sf0.1 sweeps caught four scale bugs in earlier rounds (PERF.md
SS20/24/28); this makes the sweep a scripted gate. It shells to
tools/drive_driver.py --sf sf0.1 with the recorded per-query time budgets,
so it fails BOTH on any oracle mismatch and on a >2.5x+5s per-query time
regression. Run it with:

    SPARK_GRAFT_SF01_SWEEP=1 python -m pytest tests/test_sf01_sweep.py -q

(~10-15 min; skipped by default so the normal suite stays fast. Regenerate
the budget baseline after intentional perf changes with
`python tools/drive_driver.py --sf /root/testdata/sf0.1 --write-budget
tests/sf01_budgets.json`.)
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SF01_SWEEP") != "1",
    reason="set SPARK_GRAFT_SF01_SWEEP=1 to run the ~15 min sf0.1 sweep",
)
def test_full_surface_sf01_sweep(tmp_path):
    budget = os.path.join(REPO, "tests", "sf01_budgets.json")
    cmd = [
        sys.executable,
        os.path.join(REPO, "tools", "drive_driver.py"),
        "--sf",
        "/root/testdata/sf0.1",
    ]
    if os.path.exists(budget):
        cmd += ["--budget", budget]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
    sys.stdout.write(out.stdout[-4000:])
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
