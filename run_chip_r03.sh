#!/bin/bash
# Round-3 on-chip prover campaign.  Every run tees its full stderr to a log
# artifact (r2's campaign lost its 2^18 output silently) and appends one
# JSON line to BENCH_PROVER_r03.json.
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
run zq18phased  --log-m 18 --margin 4 --phased --phase-chunk 65536
run rq13        --ring rq --N 8192 --n-inner 16384 --log-m 13 --phased --phase-chunk 8192 --slab 1024 --cpu-slabs 2
run rq14        --ring rq --N 8192 --n-inner 16384 --log-m 14 --phased --phase-chunk 8192 --slab 1024 --cpu-slabs 2
run zq16L2      --log-m 16 --margin 6 --L 2
run zq12        --log-m 12
# env-prefix on a bash function leaks the var into the caller; keep this LAST
RINGSNARK_MAC_BACKEND=u64 run zq16u64mac --log-m 16 --margin 6 --skip-warm-setup
