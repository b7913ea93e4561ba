#!/bin/bash
# Round-4 chip campaign 3 (final): re-measure with the per-slab encode
# (top-level Pallas error NTT) and the reverted-fwd/improved-inv kernels.
#   ntt      — fwd (r3 form) + NEW inverse leg under the gated methodology
#   encprof  — split error leg (gaussian vs NTT) on the new encode path
#   zq18L3   — the north-star deployable row with the 2.2x-faster setup
#   zq16L1   — unphased resident flagship rerun (fast-setup comparison)
set -o pipefail
export JAX_COMPILATION_CACHE_DIR=/root/jaxcache
mkdir -p chip_logs
run() {
  name="$1"; to="$2"; shift 2
  echo "=== $name: $* ===" | tee -a chip_logs/campaign_r04.log
  timeout "$to" "$@" 2>&1 | tee chip_logs/"$name".log | tail -4
  echo "=== $name exit=$? ===" | tee -a chip_logs/campaign_r04.log
}
run ntt_r04c     3600 python bench.py
run encprof_r04c 3600 python bench_encode_profile.py --rows 65536
run zq18L3b      7200 python bench_prover.py --log-m 18 --L 3 --margin 4 \
                      --phased --phase-chunk 65536 --skip-cpu \
                      --out BENCH_PROVER_r04.json
run zq16L1b      7200 python bench_prover.py --log-m 16 --margin 6 \
                      --skip-cpu --out BENCH_PROVER_r04.json
run logreg_r04   7200 python bench_circuits.py --preset reference \
                      --circuit logreg --out BENCH_CIRCUITS_r04.json
run rq15b        7200 python bench_prover.py --ring rq --N 8192 \
                      --n-inner 16384 --log-m 15 --phased --phase-chunk 4096 \
                      --slab 1024 --cpu-slabs 2 --out BENCH_PROVER_r04.json
