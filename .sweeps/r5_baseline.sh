#!/bin/bash
# Round-5 measurement-closure sweep: everything end-to-end on the
# round-4 HEAD (rows_value_p hand adjoint in place), outputs committed.
cd /root/repo
out=/root/repo/.sweeps/r5_baseline.log
: > $out
run() {
  echo "=== $* $(date +%H:%M:%S) ===" >> $out
  timeout 2400 "$@" >> $out 2>&1
  echo "--- exit $? $(date +%H:%M:%S)" >> $out
}
run python -m bench.run_all
run python bench.py
run python -m bench.serve_latency
run env SERVE_ADAPT_R=0.1 python -m bench.serve_latency
run python -m bench.probe_scatter
run python -m bench.probe_beam
echo "ALL DONE $(date +%H:%M:%S)" >> $out
