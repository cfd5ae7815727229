#!/usr/bin/env bash
# Round cadence (r18 judge #6): the checks every round must pass before
# a certified bench window, as ONE failing script instead of a hand-run
# checklist. Steps:
#   1. sbt Test/compile + full ScalaTest suite
#   2. Verify dump at sf0.01 + DuckDB oracle compare (the driver's gate)
#   3. PLAN_SNAPSHOT regeneration + diff_plans GATE (exit 2 on SUSPECT
#      deltas — a lost broadcast / new shuffle cannot ship silently; a
#      deliberate plan change is shipped by committing the regenerated
#      snapshot with a STATUS.md note, which makes the diff clean again)
# Leak/copy checks and fuzz seeds stay separate (driver-run / per-change)
# but are listed here for the round checklist.
#
# Usage: tools/cadence.sh [--skip-tests]
set -euo pipefail
cd "$(dirname "$0")/.."

SKIP_TESTS=0
[ "${1:-}" = "--skip-tests" ] && SKIP_TESTS=1

if [ "$SKIP_TESTS" = 0 ]; then
  echo "=== cadence 1/3: sbt test ==="
  sbt -batch test 2>&1 | tail -5
else
  echo "=== cadence 1/3: sbt test SKIPPED (--skip-tests) ==="
fi

echo "=== cadence 2/3: Verify @ sf0.01 + oracle compare ==="
rm -rf /tmp/cadence_vout
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/cadence_vout" \
  2>&1 | grep -E "\[verify\].*failed" && { echo "VERIFY FAILED"; exit 1; } || true
python3 tools/check_correctness.py /root/testdata/sf0.01 /tmp/cadence_vout

echo "=== cadence 3/3: plan snapshot + diff_plans gate ==="
sbt -batch "runMain graft.PlanSnapshot" 2>&1 | tail -2
python3 tools/diff_plans.py

echo "=== cadence PASSED ==="
echo "(still per-round: fuzz_oracle.py fresh seeds, LEAKCHECK/COPYCHECK,"
echo " certified idle bench last on a quiet window — see STATUS.md)"
