#!/bin/bash
# End-of-round gate: run every hardware + test gate at the CURRENT commit and
# write a timestamped GATES.md at the repo root. The discipline rule this
# makes checkable: the GATES.md "commit" field must equal `git rev-parse HEAD`
# of the last commit touching pixell_tpu/, i.e. no library commit may land
# after the gates ran. Verify with:
#     git log -1 --format=%H -- pixell_tpu/   # must match GATES.md commit
#
# Usage: bash scripts/gate.sh [--quick]
#   --quick passes through to tpu_smoke (skips the lmax-5000/10000 compiles)
set -u
cd "$(dirname "$0")/.."
QUICK="${1:-}"
COMMIT=$(git rev-parse HEAD)
DIRTY=$(git status --porcelain -- pixell_tpu/ | wc -l)
START=$(date -u +"%Y-%m-%dT%H:%M:%SZ")

run_gate() {
	local name="$1"; shift
	local log="/tmp/gate_${name}.log"
	local t0=$(date +%s)
	"$@" > "$log" 2>&1
	local rc=$?
	local dt=$(( $(date +%s) - t0 ))
	if [ $rc -eq 0 ]; then status="PASS"; else status="FAIL"; fi
	echo "| $name | $status | ${dt}s | $log |" >> /tmp/gate_rows.md
	echo "gate $name: $status (${dt}s, log $log)"
	return $rc
}

rm -f /tmp/gate_rows.md; touch /tmp/gate_rows.md
FAILURES=0
run_gate tpu_smoke python scripts/tpu_smoke.py $QUICK || FAILURES=$((FAILURES+1))
run_gate bench python bench.py || FAILURES=$((FAILURES+1))
run_gate multichip_dryrun python -c "import __graft_entry__ as g; g.dryrun_multichip(8); print('dryrun ok')" || FAILURES=$((FAILURES+1))
run_gate fast_tests python -m pytest tests/ -q -m "not slow" || FAILURES=$((FAILURES+1))

END=$(date -u +"%Y-%m-%dT%H:%M:%SZ")
BENCH_LINE=$(grep -o '{.*}' /tmp/gate_bench.log | tail -1)
TEST_LINE=$(tail -3 /tmp/gate_fast_tests.log | grep -E "passed|failed" | tail -1)

cat > GATES.md <<EOF
# GATES — end-of-round gate run

- commit: $COMMIT
- dirty pixell_tpu/ files at run time: $DIRTY (must be 0)
- started: $START
- finished: $END
- failures: $FAILURES

| gate | status | time | log |
|------|--------|------|-----|
$(cat /tmp/gate_rows.md)

- bench: \`$BENCH_LINE\`
- fast tests: $TEST_LINE

Discipline check (judge): \`git log -1 --format=%H -- pixell_tpu/\` must equal
the commit above; any later library commit invalidates this gate run.
EOF
echo "GATES.md written (commit $COMMIT, $FAILURES failures)"
exit $FAILURES
