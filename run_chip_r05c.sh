#!/bin/bash
# r5 final legs: in-circuit NTT rows (dense-coeff chunk fix), logreg with
# device-side FHE encrypt, the gated MXU-NTT probe, then the chip-free
# measured CPU provers (strengthened kernels) on the idle box.
set -x
cd /root/repo
run() {
  name=$1; to=$2; shift 2
  timeout "$to" "$@" > "chip_logs/${name}.log" 2>&1
  echo "[campaign-c] $name exit=$?"
}
run incircuit_r05  7200 python bench_circuits.py --preset reference \
      --circuit incircuit_ntt --out BENCH_CIRCUITS_r05.json
run logreg_r05c    7200 python bench_circuits.py --preset reference \
      --circuit logreg --streamed --slab 512 --out BENCH_CIRCUITS_r05.json
run ntt_mxu_r05c   2400 python bench_probe_ntt_mxu.py
# measured CPU provers (idle box; no chip)
run cpufull_zq14    3600 python bench_cpu_full.py --log-m 14 --L 2 \
      --n-inner 4096 --margin 6 --out chip_logs/r05_cpu_full.json
run cpufull_zq18    3600 python bench_cpu_full.py --log-m 18 --L 3 \
      --n-inner 4096 --margin 4 --out chip_logs/r05_cpu_full.json
run cpufull_rq14    7200 python bench_cpu_full.py --ring rq --N 8192 \
      --log-m 14 --n-inner 16384 --out chip_logs/r05_cpu_full.json
run cpufull_rq14L2  7200 python bench_cpu_full.py --ring rq --N 8192 \
      --log-m 14 --L 2 --n-inner 16384 --out chip_logs/r05_cpu_full.json
run cpufull_rq15    7200 python bench_cpu_full.py --ring rq --N 8192 \
      --log-m 15 --n-inner 16384 --out chip_logs/r05_cpu_full.json
echo "[campaign-c] done"
