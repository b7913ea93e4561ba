#!/bin/bash
# r5 follow-up: re-run the circuit legs that failed in run_chip_r05.sh
#  - circuits: ct_mul/groth16 crashed on the empty-aux slot-chunk bug
#    (fixed in r1cs_to_qrp._assignment_batches); re-run all rows
#  - logreg: needs --streamed (resident CRS ~9 GiB; r4 ran it streamed)
#  - NTT MXU probe round 2 (matched-slope legs added after the first run)
set -x
cd /root/repo

run() {
  name=$1; to=$2; shift 2
  timeout "$to" "$@" > "chip_logs/${name}.log" 2>&1
  echo "[campaign-b] $name exit=$?"
}

run circuits_r05b 10800 python bench_circuits.py --preset reference \
      --out BENCH_CIRCUITS_r05.json
run logreg_r05b    7200 python bench_circuits.py --preset reference \
      --circuit logreg --streamed --slab 512 --out BENCH_CIRCUITS_r05.json
run ntt_mxu_r05b   1800 python bench_probe_ntt_mxu.py
echo "[campaign-b] done"

# retry: rq14 L=2 with long settle (first attempt died on a transient
# relay remote-compile transport error)
run rq14L2c       7200 python bench_prover.py --ring rq --N 8192 \
      --n-inner 16384 --log-m 14 --L 2 --phased --phase-chunk 4096 \
      --slab 1024 --throttle 1 --settle 120 --cpu-full \
      --out chip_logs/r05_rq.json

# zq16 L1 resident re-run (setup measured 2.45 s vs r4's 0.93 — variance?)
run zq16L1b_r05   3600 python bench_prover.py --log-m 16 --L 1 --margin 6 \
      --settle 30 --skip-cpu --out chip_logs/r05_zq16.json
