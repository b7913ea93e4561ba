#!/bin/bash
# Round-4 on-chip prover campaign: deployable-soundness L>=2 rows via the
# limb-phased streamed prover, plus the dense-Rq rerun with the chunked
# pre-NTT and the O(n_io) verifier.  Two full passes per run (pass 2 warm).
set -o pipefail
export JAX_COMPILATION_CACHE_DIR=/root/jaxcache
mkdir -p chip_logs
run() {
  name="$1"; shift
  echo "=== $name: $* ===" | tee -a chip_logs/campaign_r04.log
  timeout 7200 python bench_prover.py "$@" --out BENCH_PROVER_r04.json \
    2>&1 | tee chip_logs/"$name".log | tail -4
  echo "=== $name exit=$? ===" | tee -a chip_logs/campaign_r04.log
}
run zq16L2  --log-m 16 --L 2 --margin 6 --phased --phase-chunk 65536
run zq18L1  --log-m 18 --margin 4 --phased --phase-chunk 65536
run zq18L2  --log-m 18 --L 2 --margin 4 --phased --phase-chunk 65536
run zq18L3  --log-m 18 --L 3 --margin 4 --phased --phase-chunk 65536
run rq14    --ring rq --N 8192 --n-inner 16384 --log-m 14 --phased \
            --phase-chunk 8192 --slab 1024 --cpu-slabs 2
