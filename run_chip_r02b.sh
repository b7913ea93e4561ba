#!/bin/bash
export JAX_COMPILATION_CACHE_DIR=/root/jaxcache
set -x
python bench_prover.py --log-m 16 --margin 6 --out BENCH_PROVER_r02.json 2>&1
python bench_prover.py --log-m 18 --margin 4 --phased --out BENCH_PROVER_r02.json 2>&1
