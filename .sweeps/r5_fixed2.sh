#!/bin/bash
# Round-5 post-fix sweep (the record r5_fixed.log failed to complete):
# everything end-to-end on the FIXED tree (a86646a dense-row hand
# transpose), measurement-closure rule artifacts. config4 post-fix is
# already recorded (.sweeps/r5_fixed.log: 7.0739 s / 1379).
cd /root/repo
out=/root/repo/.sweeps/r5_fixed2.log
: > $out
run() {
  echo "=== $* $(date +%H:%M:%S) ===" >> $out
  timeout 3600 "$@" >> $out 2>&1
  echo "--- exit $? $(date +%H:%M:%S)" >> $out
}
run python -m bench.config5
run python -m bench.config3
run python -m bench.config3b
run python bench.py
run python -m bench.serve_latency
run env SERVE_ADAPT_R=0.1 python -m bench.serve_latency
run python -m bench.probe_vjp_forms
run python -m bench.probe_enkf_adjoint
run env ROWS_VALUE_BATCH_FALLBACK=1 python -m bench.probe_enkf_adjoint
run python -m bench.probe_c5_breakdown
run env ZP256_INTERP=zpc python -m bench.probe_zp256
run python -m bench.config1
run python -m bench.config2
echo "ALL DONE $(date +%H:%M:%S)" >> $out
