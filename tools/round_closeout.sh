#!/bin/bash
# Round close-out gate (VERDICT r3 #4/#5): run BEFORE declaring a round done.
#   1. full pytest suite (sf0.001 parity + properties + plans)
#   2. driver-sim at sf0.01 (the driver's own check, full registry)
#   3. driver-sim at sf0.1 with time budgets -> PARITY_SF01_r{N}.txt
#   4. COVERAGE.md currency check
#   5. state-store boundedness metrics for the heavy streaming queries
#      -> STREAM_STATE.json (VERDICT r6 #6: attached to the sweep artifacts)
#   6. (r12, VERDICT r11 task #2) artifact provenance: the gate refuses to
#      run on a dirty tree, stamps the PARITY artifact with the source
#      commit, fails if HEAD moves mid-sweep, and refuses to close on a
#      sweep whose footer records time-budget breaches — one automatic
#      re-run absorbs machine-contention noise (the r11 artifact shipped 5
#      contention breaches that contradicted PERF s65); parity FAILs never
#      retry.
# Usage: tools/round_closeout.sh <round-number>
set -e
cd "$(dirname "$0")/.."
R="${1:?usage: round_closeout.sh <round-number>}"

HEAD0=$(git rev-parse HEAD)
if [ -n "$(git status --porcelain --untracked-files=no)" ]; then
  echo "closeout r${R}: tracked files are modified — commit first so the" >&2
  echo "PARITY stamp names exactly the code the sweep measured" >&2
  exit 1
fi

python -m pytest tests/ -x -q
python tools/drive_driver.py --sf /root/testdata/sf0.01 2>/dev/null | tail -3

ART="PARITY_SF01_r${R}.txt"
run_sweep() {
  python tools/drive_driver.py --sf /root/testdata/sf0.1 \
    --budget tests/sf01_budgets.json > "$ART" 2>/dev/null
}
if ! run_sweep; then
  if grep -q "^FAILS: 0$" "$ART" && grep -q "TIME-BUDGET BREACHES" "$ART"; then
    echo "closeout r${R}: sweep green but footer records budget breaches" >&2
    echo "(machine contention?) — re-running the sweep once" >&2
    run_sweep || { tail -8 "$ART"; echo "closeout r${R}: breaches persist on re-run — NOT closing; fix or re-budget" >&2; exit 1; }
  else
    tail -8 "$ART"
    exit 1
  fi
fi

HEAD1=$(git rev-parse HEAD)
if [ "$HEAD1" != "$HEAD0" ]; then
  echo "closeout r${R}: HEAD moved during the sweep (${HEAD0} -> ${HEAD1}) — artifact does not describe one commit" >&2
  exit 1
fi
sed -i "1i # source-commit: ${HEAD0} (round ${R} closeout; 0 parity fails, 0 budget breaches)" "$ART"
tail -3 "$ART"

python tools/coverage_report.py --check
python tools/stream_state_metrics.py --sf /root/testdata/sf0.1 2>/dev/null | tail -6
echo "CLOSEOUT r${R}: all gates green (source commit ${HEAD0})"
