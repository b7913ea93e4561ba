#!/bin/bash
set -x
cd /root/repo
run() {
  name=$1; to=$2; shift 2
  timeout "$to" "$@" > "chip_logs/${name}.log" 2>&1
  echo "[campaign-d] $name exit=$?"
}
run incircuit_r05d 7200 python bench_circuits.py --preset reference \
      --circuit incircuit_ntt --out BENCH_CIRCUITS_r05.json
echo "[campaign-d] done"
run logreg_r05d 7200 python bench_circuits.py --preset reference \
      --circuit logreg --streamed --slab 512 --out BENCH_CIRCUITS_r05.json
