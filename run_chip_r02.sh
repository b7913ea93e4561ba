#!/bin/bash
# Round-2 on-chip prover campaign; appends JSON lines to BENCH_PROVER_r02.json
export JAX_COMPILATION_CACHE_DIR=/root/jaxcache
set -x
python bench_prover.py --log-m 12 --out BENCH_PROVER_r02.json 2>&1
python bench_prover.py --log-m 16 --out BENCH_PROVER_r02.json 2>&1
