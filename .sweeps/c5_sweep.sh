#!/bin/bash
cd /root/repo
out=/root/repo/.sweeps/c5_sweep.log
: > $out
run() {
  echo "=== BENCH_CG=$1 BENCH_INNER_SAMPLES=$2 $(date +%H:%M:%S) ===" >> $out
  BENCH_CG=$1 BENCH_INNER_SAMPLES=$2 timeout 1800 python -m bench.config5 >> $out 2>&1
  echo "--- exit $? $(date +%H:%M:%S)" >> $out
}
run 10 49   # baseline (r3 default): expect ~17.4s / 836
run 7 49
run 10 33
run 7 33
run 5 49
