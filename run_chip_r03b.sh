#!/bin/bash
# Round-3 follow-up chip runs (after run_chip_r03.sh):
#   zq16    — rerun with the warm-setup CRS release fix (first attempt held
#             two 9 GiB CRSs live and OOM'd)
#   zq16L2  — L=2 CRS is ~18 GiB > HBM, so it must run PHASED
# set -o pipefail so a failing bench is reported as such (the r03 runner
# reported tee/tail's exit status and masked the zq16 OOM as exit=0).
set -o pipefail
export JAX_COMPILATION_CACHE_DIR=/root/jaxcache
mkdir -p chip_logs
run() {
  name="$1"; shift
  echo "=== $name: $* ===" | tee -a chip_logs/campaign.log
  timeout 3600 python bench_prover.py "$@" --out BENCH_PROVER_r03.json \
    2>&1 | tee chip_logs/"$name".log | tail -4
  echo "=== $name exit=$? ===" | tee -a chip_logs/campaign.log
}
run zq16        --log-m 16 --margin 6
run zq16L2ph    --log-m 16 --margin 6 --L 2 --phased --phase-chunk 32768
# rq reruns: first attempts crashed on the blm kernel's scoped-VMEM limit at
# M'=16384 (fixed by the fitted limb-chunk model in ops/ntt.py, chip-validated)
run rq13        --ring rq --N 8192 --n-inner 16384 --log-m 13 --phased --phase-chunk 8192 --slab 1024 --cpu-slabs 2
run rq14        --ring rq --N 8192 --n-inner 16384 --log-m 14 --phased --phase-chunk 8192 --slab 1024 --cpu-slabs 2
# rerun with the warm/cold split (first pass measured witness-map compile as
# prover time: 250.5s of the 285.7s at 2^18 was the split-path jit compile)
run zq18phased2 --log-m 18 --margin 4 --phased --phase-chunk 65536
