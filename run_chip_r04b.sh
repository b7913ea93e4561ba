#!/bin/bash
# Round-4 chip campaign 2: NTT kernel re-measure (single-multiply stages),
# encode-phase profile, at-scale streamed Rinocchio, reference circuits ON
# THE CHIP (+ FHE-side legs), and the Rq 2^15 row.
set -o pipefail
export JAX_COMPILATION_CACHE_DIR=/root/jaxcache
mkdir -p chip_logs
run() {
  name="$1"; to="$2"; shift 2
  echo "=== $name: $* ===" | tee -a chip_logs/campaign_r04.log
  timeout "$to" "$@" 2>&1 | tee chip_logs/"$name".log | tail -4
  echo "=== $name exit=$? ===" | tee -a chip_logs/campaign_r04.log
}
run ntt_r04      3600 python bench.py
run encprof_r04  3600 python bench_encode_profile.py --rows 65536
run rin16L2      7200 python bench_prover.py --system rinocchio --log-m 16 \
                      --L 2 --margin 6 --phased --phase-chunk 65536 \
                      --out BENCH_PROVER_r04.json
run circuits_r04 10800 python bench_circuits.py --preset reference \
                      --out BENCH_CIRCUITS_r04.json
run rq14         7200 python bench_prover.py --ring rq --N 8192 \
                      --n-inner 16384 --log-m 14 --phased --phase-chunk 4096 \
                      --slab 1024 --cpu-slabs 2 --out BENCH_PROVER_r04.json
run rq15         7200 python bench_prover.py --ring rq --N 8192 \
                      --n-inner 16384 --log-m 15 --phased --phase-chunk 4096 \
                      --slab 1024 --cpu-slabs 2 --out BENCH_PROVER_r04.json
