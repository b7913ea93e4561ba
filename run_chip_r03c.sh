#!/bin/bash
# Round-3 final chip reruns:
#   rq13/rq14 — Rq N=8192 witness map now falls back to the XLA path past the
#               pallas call-volume cap (first attempts serialized a 4.77 GB
#               program / OOM-killed the remote compiler)
#   zq16      — unphased MXU-MAC flagship with the warm-setup settle+retry
set -o pipefail
export JAX_COMPILATION_CACHE_DIR=/root/jaxcache
mkdir -p chip_logs
run() {
  name="$1"; shift
  echo "=== $name: $* ===" | tee -a chip_logs/campaign.log
  timeout 5400 python bench_prover.py "$@" --out BENCH_PROVER_r03.json \
    2>&1 | tee chip_logs/"$name".log | tail -4
  echo "=== $name exit=$? ===" | tee -a chip_logs/campaign.log
}
run rq13  --ring rq --N 8192 --n-inner 16384 --log-m 13 --phased --phase-chunk 8192 --slab 1024 --cpu-slabs 2
run rq14  --ring rq --N 8192 --n-inner 16384 --log-m 14 --phased --phase-chunk 8192 --slab 1024 --cpu-slabs 2

