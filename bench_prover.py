"""Prover-scale benchmark: ringGroth16 end-to-end at synthetic R1CS sizes.

Measures Setup (CRS generation + encode), Prove (single-jit core) and Verify
on the current default device, for BASELINE-style configurations.  Prints
one JSON line per configuration (this is the internal tracking script; the
driver's single-line benchmark is bench.py).

Usage: python bench_prover.py [--log-m 12] [--ring zq|rq] [--n-inner 4096]
"""

import argparse
import json
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-m", type=int, default=12)
    ap.add_argument("--ring", choices=["zq", "rq"], default="zq")
    ap.add_argument("--N", type=int, default=256, help="outer degree for rq")
    ap.add_argument("--n-inner", type=int, default=4096)
    ap.add_argument("--L", type=int, default=2, help="outer limbs")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_enable_x64", True)
    from ringsnark_tpu.rings.context import default_context
    from ringsnark_tpu.encoding import EncodingContext
    from ringsnark_tpu.encoding.noise import plan_inner_chain
    from ringsnark_tpu.snark.api import SnarkParams
    from ringsnark_tpu.snark import groth16
    from ringsnark_tpu.models.synthetic import build_synthetic_mul_chain
    from ringsnark_tpu.ops.primes import find_ntt_primes

    M = 1 << args.log_m
    N = 1 if args.ring == "zq" else args.N
    order = max(1 << (args.log_m + 2), 2 * args.n_inner, 4 * N)
    ring = default_context(L=args.L, N=N, order=order)

    L_inner, floor = plan_inner_chain(args.n_inner, 31, M + 1)
    inner, below = [], 1 << 31
    while len(inner) < L_inner:
        c = find_ntt_primes(1, 2 * args.n_inner, below=below)[0]
        below = c
        if c not in ring.primes:
            inner.append(c)
    ectx = EncodingContext(
        ring=ring, n_inner=args.n_inner, inner_primes=tuple(inner),
        floor_limbs=floor,
    )
    params = SnarkParams(ring=ring, enc=ectx)
    print(
        f"[cfg] M=2^{args.log_m} constraints, ring={args.ring} N={N} L={args.L}, "
        f"inner N'={args.n_inner} L'={L_inner} floor={floor}, "
        f"device={jax.devices()[0]}",
        file=sys.stderr, flush=True,
    )

    rng = np.random.default_rng(0)
    comp, primary, aux = build_synthetic_mul_chain(ring, M, rng)

    t0 = time.perf_counter()
    kp = groth16.generator(comp, params, rng, jax.random.PRNGKey(0))
    jax.block_until_ready(kp.pk.s_pows.c0)
    setup_s = time.perf_counter() - t0
    print(f"[setup] {setup_s:.2f}s (pk {kp.pk.size_in_bits()/8/2**20:.0f} MiB)",
          file=sys.stderr, flush=True)

    # prove twice: first includes compile
    t0 = time.perf_counter()
    proof = groth16.prover(kp.pk, primary, aux)
    jax.block_until_ready(proof.A.c0)
    prove_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    proof = groth16.prover(kp.pk, primary, aux)
    jax.block_until_ready(proof.A.c0)
    prove_s = time.perf_counter() - t0
    print(f"[prove] {prove_s:.3f}s (cold {prove_cold:.1f}s)", file=sys.stderr, flush=True)

    t0 = time.perf_counter()
    ok = groth16.verifier(kp.vk, primary, proof)
    verify_s = time.perf_counter() - t0
    print(f"[verify] {verify_s:.2f}s passed={ok}", file=sys.stderr, flush=True)
    assert ok

    print(json.dumps({
        "metric": f"groth16_prover_{args.ring}_2e{args.log_m}",
        "value": round(prove_s, 4),
        "unit": "s",
        "setup_s": round(setup_s, 2),
        "verify_s": round(verify_s, 2),
        "proof_bits": proof.size_in_bits(),
    }), flush=True)


if __name__ == "__main__":
    main()
