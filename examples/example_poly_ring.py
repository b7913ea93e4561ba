"""End-to-end demo over the polynomial ring R_q = Z_q[X]/(X^N+1).

Port of `/root/reference/examples/example_SEAL.cpp`: the toy circuit
x5 = x2*x3; x4 = (x0+x1)*x5 (x5 private), run through BOTH Rinocchio and
ringGroth16, printing sizes and the verification bit — but asserted, not just
printed.

Defaults to the reference example's shape (N=4096, inner N'=8192,
`example_SEAL.cpp:38-119`); pass --small for a seconds-scale toy shape.

Run: python examples/example_poly_ring.py [--small] [--N 4096] [--n-inner 8192]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax

from ringsnark_tpu.rings.context import default_context
from ringsnark_tpu.encoding import EncodingContext
from ringsnark_tpu.encoding.context import default_inner_primes
from ringsnark_tpu.snark.api import SnarkParams
from ringsnark_tpu.snark import rinocchio, groth16
from ringsnark_tpu.models import build_toy_circuit
from ringsnark_tpu.ops.primes import find_ntt_primes


def make_params(N: int, n_inner: int, L: int = 3, L_inner: int = 4) -> SnarkParams:
    order = max(1 << 12, 2 * n_inner, 4 * N)
    ring = default_context(L=L, N=N, order=order)
    try:
        inner = default_inner_primes(n_inner, ring.primes, count=L_inner)
    except (KeyError, AssertionError):
        inner, below = [], 1 << 31
        while len(inner) < L_inner:
            c = find_ntt_primes(1, 2 * n_inner, below=below)[0]
            below = c
            if c not in ring.primes:
                inner.append(c)
        inner = tuple(inner)
    enc = EncodingContext(ring=ring, n_inner=n_inner, inner_primes=inner)
    print(f"[PARAM] outer: N={N}, L={L} x ~31-bit primes {ring.primes}")
    print(f"[PARAM] inner: N'={n_inner}, L'={len(inner)} primes {inner}")
    return SnarkParams(ring=ring, enc=enc)


def run(params: SnarkParams, seed: int = 0):
    rng = np.random.default_rng(seed)
    pb = build_toy_circuit(params.ring, rng)
    print(f"#Inputs\t{pb.num_inputs()}")
    print(f"#Variables\t{pb.num_variables()}")
    print(f"#Constraints\t{pb.num_constraints()}")
    ok = pb.is_satisfied()
    print(f"R1CS satisfied: {ok}")
    assert ok

    for name, system in (("Rinocchio", rinocchio), ("RingGroth16", groth16)):
        print(f"\n=== {name} ===")
        t0 = time.time()
        kp = system.generator(
            pb.get_constraint_system(), params, rng, jax.random.PRNGKey(seed)
        )
        print(f"Setup: {time.time()-t0:.2f}s; pk {kp.pk.size_in_bits()} bits")
        t0 = time.time()
        proof = system.prover(kp.pk, pb.primary_input(), pb.auxiliary_input(), rng)
        print(f"Prove: {time.time()-t0:.2f}s; proof {proof.size_in_bits()} bits")
        t0 = time.time()
        verif = system.verifier(kp.vk, pb.primary_input(), proof)
        print(f"Verify: {time.time()-t0:.2f}s")
        print(f"Verification passed: {verif}")
        assert verif


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--N", type=int, default=4096,
                    help="outer degree (reference example_SEAL shape)")
    ap.add_argument("--n-inner", type=int, default=8192)
    ap.add_argument("--small", action="store_true",
                    help="toy shape (N=256, N'=512) — seconds on a laptop")
    args = ap.parse_args()
    if args.small:
        args.N, args.n_inner = 256, 512
    run(make_params(args.N, args.n_inner))
