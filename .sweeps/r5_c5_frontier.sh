#!/bin/bash
# Round-5 config-5 frontier re-sweep (VERDICT r4 #4): with the banked
# rows_value_p adjoint each CG iteration is ~2.4x cheaper, so the
# cg x inner tradeoff moves. Baseline row (cg10/inner49) comes from
# .sweeps/r5_baseline.log; these rows map the rest of the frontier.
cd /root/repo
out=/root/repo/.sweeps/r5_c5_frontier.log
: > $out
run() {
  echo "=== BENCH_CG=$1 BENCH_INNER_SAMPLES=$2 $(date +%H:%M:%S) ===" >> $out
  BENCH_CG=$1 BENCH_INNER_SAMPLES=$2 timeout 1800 python -m bench.config5 >> $out 2>&1
  echo "--- exit $? $(date +%H:%M:%S)" >> $out
}
run 15 49   # deeper CG now affordable: does held-out beat 836?
run 12 49
run 10 0    # full-fidelity inner (r3: best skill 706 at 42 s pre-adjoint)
run 7 33    # latency corner
echo "ALL DONE $(date +%H:%M:%S)" >> $out
