#!/bin/bash
# Round-4 final re-measure with the CBD error sampler: encode profile +
# the north-star L=3 row (setup should now be < prove).
set -o pipefail
export JAX_COMPILATION_CACHE_DIR=/root/jaxcache
mkdir -p chip_logs
run() {
  name="$1"; to="$2"; shift 2
  echo "=== $name: $* ===" | tee -a chip_logs/campaign_r04.log
  timeout "$to" "$@" 2>&1 | tee chip_logs/"$name".log | tail -4
  echo "=== $name exit=$? ===" | tee -a chip_logs/campaign_r04.log
}
run encprof_r04d 3600 python bench_encode_profile.py --rows 65536
run zq18L3c      7200 python bench_prover.py --log-m 18 --L 3 --margin 4 \
                      --phased --phase-chunk 65536 --skip-cpu \
                      --out BENCH_PROVER_r04.json
run logreg_r04b  7200 python bench_circuits.py --preset reference \
                      --circuit logreg --streamed --slab 512 \
                      --out BENCH_CIRCUITS_r04.json
run rq15c        7200 python bench_prover.py --ring rq --N 8192 \
                      --n-inner 16384 --log-m 15 --phased --phase-chunk 4096 \
                      --slab 1024 --cpu-slabs 2 --out BENCH_PROVER_r04.json
