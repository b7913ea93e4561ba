"""Per-circuit Setup/Prove/Verify timings — the google-benchmark analog.

Mirrors the reference's four benchmark suites (SURVEY §2.2):
plaintext-check, ct-mul, in-circuit NTT, logistic-regression inference —
each built with authentic values, proved with Rinocchio and/or ringGroth16,
and timed.  Prints one JSON line per (circuit, system) plus [TIME] detail on
stderr.

Usage: python bench_circuits.py [--N 256] [--n-inner 1024] [--features 32]
"""

import argparse
import json
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--N", type=int, default=256)
    ap.add_argument("--n-inner", type=int, default=1024)
    ap.add_argument("--features", type=int, default=32)
    ap.add_argument("--logT", type=int, default=16)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_enable_x64", True)
    from ringsnark_tpu.rings.context import default_context
    from ringsnark_tpu.encoding import EncodingContext
    from ringsnark_tpu.encoding.noise import plan_inner_chain
    from ringsnark_tpu.snark.api import SnarkParams
    from ringsnark_tpu.snark import rinocchio, groth16
    from ringsnark_tpu.models import (
        build_plaintext_check,
        build_ct_mul,
        build_incircuit_ntt,
        build_logreg_inference,
    )
    from ringsnark_tpu.ops.primes import find_ntt_primes

    N = args.N
    order = max(1 << 14, 2 * args.n_inner, 4 * N)
    ring = default_context(L=2, N=N, order=order)
    max_terms = max(4 * args.features + 8, N + 2, args.logT + 2)
    L_inner, floor = plan_inner_chain(args.n_inner, 31, max_terms)
    inner, below = [], 1 << 31
    while len(inner) < L_inner:
        c = find_ntt_primes(1, 2 * args.n_inner, below=below)[0]
        below = c
        if c not in ring.primes:
            inner.append(c)
    params = SnarkParams(
        ring=ring,
        enc=EncodingContext(
            ring=ring, n_inner=args.n_inner, inner_primes=tuple(inner),
            floor_limbs=floor,
        ),
    )
    print(
        f"[cfg] N={N} L=2, N'={args.n_inner} L'={L_inner} floor={floor} "
        f"device={jax.devices()[0]}",
        file=sys.stderr, flush=True,
    )

    rng = np.random.default_rng(0)
    circuits = {
        "plaintext_check": lambda: build_plaintext_check(ring, rng, log_t=args.logT),
        "ct_mul": lambda: build_ct_mul(ring, rng, log_t=args.logT),
        "incircuit_ntt": lambda: build_incircuit_ntt(ring, rng),
        "logreg": lambda: build_logreg_inference(
            ring, rng, num_features=args.features, log_t=args.logT
        ),
    }
    systems = {"rinocchio": rinocchio, "groth16": groth16}

    for cname, build in circuits.items():
        pb = build()
        assert pb.is_satisfied(), f"{cname} witness invalid"
        for sname, system in systems.items():
            t0 = time.perf_counter()
            kp = system.generator(
                pb.get_constraint_system(), params, rng, jax.random.PRNGKey(1)
            )
            jax.block_until_ready(kp.pk.s_pows.c0)
            setup_s = time.perf_counter() - t0

            proof = system.prover(  # cold (compile) then warm
                kp.pk, pb.primary_input(), pb.auxiliary_input(), rng
            )
            jax.block_until_ready(proof.A.c0)
            t0 = time.perf_counter()
            proof = system.prover(
                kp.pk, pb.primary_input(), pb.auxiliary_input(), rng
            )
            jax.block_until_ready(proof.A.c0)
            prove_s = time.perf_counter() - t0

            t0 = time.perf_counter()
            ok = system.verifier(kp.vk, pb.primary_input(), proof)
            verify_s = time.perf_counter() - t0
            assert ok, f"{cname}/{sname} verification failed"
            print(
                f"[TIME] {cname:>16s}/{sname:<9s} setup {setup_s:7.2f}s  "
                f"prove {prove_s:7.3f}s  verify {verify_s:6.2f}s  "
                f"({pb.num_constraints()} constraints)",
                file=sys.stderr, flush=True,
            )
            print(json.dumps({
                "metric": f"{cname}_{sname}",
                "constraints": pb.num_constraints(),
                "setup_s": round(setup_s, 3),
                "prove_s": round(prove_s, 4),
                "verify_s": round(verify_s, 3),
            }), flush=True)


if __name__ == "__main__":
    main()
