#!/bin/bash
# Round close-out gate (VERDICT r3 #4/#5): run BEFORE declaring a round done.
#   1. full pytest suite (sf0.001 parity + properties + plans)
#   2. driver-sim at sf0.01 (the driver's own check, full registry)
#   3. driver-sim at sf0.1 with time budgets -> PARITY_SF01_r{N}.txt
#   4. COVERAGE.md currency check
#   5. state-store boundedness metrics for the heavy streaming queries
#      -> STREAM_STATE.json (VERDICT r6 #6: attached to the sweep artifacts)
# Usage: tools/round_closeout.sh <round-number>
set -e
cd "$(dirname "$0")/.."
R="${1:?usage: round_closeout.sh <round-number>}"
python -m pytest tests/ -x -q
python tools/drive_driver.py --sf /root/testdata/sf0.01 2>/dev/null | tail -3
python tools/drive_driver.py --sf /root/testdata/sf0.1 \
  --budget tests/sf01_budgets.json > "PARITY_SF01_r${R}.txt" 2>/dev/null \
  || { tail -5 "PARITY_SF01_r${R}.txt"; exit 1; }
tail -3 "PARITY_SF01_r${R}.txt"
python tools/coverage_report.py --check
python tools/stream_state_metrics.py --sf /root/testdata/sf0.1 2>/dev/null | tail -6
echo "CLOSEOUT r${R}: all gates green"
