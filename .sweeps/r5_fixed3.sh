#!/bin/bash
# Round-5 post-fix sweep, continuation: r5_fixed2.sh was killed after
# config5 (recorded there: 18.2059 s / 835.86 held-out; config4 post-fix
# is in r5_fixed.log: 7.0739 s / 1379). This runs the rest of the
# post-fix record on the fixed tree, PLUS the chunk-budget A/B
# (IONO_TEC_CHUNK_MB, DESIGN.md §18: the production lax.map chunking
# costs 2.4x the monolithic VJP — 4096 MiB makes config-5-scale solves
# monolithic and cuts config 4 from 40 chunks to 5), then the config-5
# cg x inner frontier (VERDICT r4 #4) on the winning budget.
cd /root/repo
out=/root/repo/.sweeps/r5_fixed3.log
: > $out
run() {
  echo "=== $* $(date +%H:%M:%S) ===" >> $out
  timeout 3600 "$@" >> $out 2>&1
  echo "--- exit $? $(date +%H:%M:%S)" >> $out
}
# chunk-budget A/B first (the decision gates the frontier + default flip)
run python -m bench.config3
run env IONO_TEC_CHUNK_MB=4096 python -m bench.config3
run env IONO_TEC_CHUNK_MB=4096 python -m bench.config5
run env IONO_TEC_CHUNK_MB=4096 python -m bench.config4
if ! tail -n 3 $out | grep -q '"value"'; then
  # 4096 OOMed at 256^3 — take the middle arm
  run env IONO_TEC_CHUNK_MB=2048 python -m bench.config4
fi
run python -m bench.config3b
run env IONO_TEC_CHUNK_MB=4096 python -m bench.config3b
# rest of the post-fix record
run python bench.py
run python -m bench.config1
run python -m bench.config2
run python -m bench.serve_latency
run env SERVE_ADAPT_R=0.1 python -m bench.serve_latency
run python -m bench.probe_vjp_forms
run python -m bench.probe_enkf_adjoint
run env ROWS_VALUE_BATCH_FALLBACK=1 python -m bench.probe_enkf_adjoint
run python -m bench.probe_c5_breakdown
run env ZP256_INTERP=zpc python -m bench.probe_zp256
# config-5 frontier on the big budget (baseline cg10 = the 4096 row above)
run env IONO_TEC_CHUNK_MB=4096 BENCH_CG=15 python -m bench.config5
run env IONO_TEC_CHUNK_MB=4096 BENCH_CG=7 python -m bench.config5
run env IONO_TEC_CHUNK_MB=4096 BENCH_CG=7 BENCH_INNER_SAMPLES=33 python -m bench.config5
run env IONO_TEC_CHUNK_MB=4096 BENCH_CG=10 BENCH_INNER_SAMPLES=33 python -m bench.config5
echo "ALL DONE $(date +%H:%M:%S)" >> $out
