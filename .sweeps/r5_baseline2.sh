#!/bin/bash
# Round-5 baseline sweep, part 2: configs 3b/4/5 individually (part 1's
# single run_all timeout killed them) + the adjoint-form probes.
cd /root/repo
out=/root/repo/.sweeps/r5_baseline2.log
: > $out
run() {
  echo "=== $* $(date +%H:%M:%S) ===" >> $out
  timeout 2400 "$@" >> $out 2>&1
  echo "--- exit $? $(date +%H:%M:%S)" >> $out
}
run python -m bench.config3b
run python -m bench.config4
run python -m bench.config5
run python -m bench.probe_vjp_forms
run env VJP_RANDOM=1 python -m bench.probe_vjp_forms
run python -m bench.probe_scatter
run env SCAT_RANDOM=1 python -m bench.probe_scatter
run python -m bench.probe_c5_breakdown
echo "ALL DONE $(date +%H:%M:%S)" >> $out
