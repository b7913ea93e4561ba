#!/bin/bash
# Round-5 campaign (after the rq15/rq14L2 runs already recorded):
#  1. NTT-on-MXU experiment (roofline last lever, VERDICT #8)
#  2. zq18 L=3 x3 consecutive — setup/prove reproducibility (VERDICT #5)
#  3. circuit suite re-run (wide-LC fixes: incircuit_ntt, logreg FHE legs)
#  4. zq16 regression rows
#  5. rinocchio zq16 L2 streamed row
#  6. measured full CPU prover legs (idle box; no chip involved)
set -x
cd /root/repo

run() {
  name=$1; to=$2; shift 2
  timeout "$to" "$@" > "chip_logs/${name}.log" 2>&1
  echo "[campaign] $name exit=$?"
}

run ntt_mxu_r05    1800 python bench_probe_ntt_mxu.py

for i in 1 2 3; do
  run zq18L3_rep$i 3600 python bench_prover.py --log-m 18 --L 3 --margin 4 \
      --phased --skip-cpu --out chip_logs/r05_zq18_reps.json
done

run circuits_r05  10800 python bench_circuits.py --preset reference \
      --out BENCH_CIRCUITS_r05.json
run logreg_r05     7200 python bench_circuits.py --preset reference \
      --circuit logreg --out BENCH_CIRCUITS_r05.json

run zq16L2_r05     3600 python bench_prover.py --log-m 16 --L 2 --margin 6 \
      --phased --skip-cpu --out chip_logs/r05_zq16.json
run zq16L1_r05     3600 python bench_prover.py --log-m 16 --L 1 --margin 6 \
      --skip-cpu --out chip_logs/r05_zq16.json
run rin16L2_r05    3600 python bench_prover.py --system rinocchio --log-m 16 \
      --L 2 --margin 6 --phased --skip-cpu --out chip_logs/r05_rin16.json

# CPU legs (chip idle from here; box must be otherwise idle for honesty)
run cpu_zq14       3600 python bench_prover.py --log-m 14 --L 2 --margin 6 \
      --phased --cpu-full --out chip_logs/r05_cpu.json
run cpu_rq14       7200 python bench_prover.py --ring rq --N 8192 \
      --n-inner 16384 --log-m 14 --phased --phase-chunk 4096 --slab 1024 \
      --settle 90 --throttle 1 --cpu-full --out chip_logs/r05_cpu.json
run cpu_zq18       7200 python bench_prover.py --log-m 18 --L 3 --margin 4 \
      --phased --cpu-full --out chip_logs/r05_cpu.json
# rq14 L2 re-run with a longer settle (the first r5 run's warm pass
# stalled 134 s on post-cold-pass allocation; pass 2 showed ~19 s true)
run rq14L2b_r05   7200 python bench_prover.py --ring rq --N 8192 \
      --n-inner 16384 --log-m 14 --L 2 --phased --phase-chunk 4096 \
      --slab 1024 --throttle 1 --settle 120 --skip-cpu \
      --out chip_logs/r05_rq.json
echo "[campaign] done"
