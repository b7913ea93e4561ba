"""End-to-end demo over the integer ring Z_q, slot-replicated.

Port of `/root/reference/examples/example_SEAL_int.cpp`: the toy circuit
replicated per slot (`replicate` scalar copies), demonstrating the
batched-vs-scalar trade-off of SURVEY §2.1.

Run: python examples/example_int_ring.py [--replicate 64]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax

from ringsnark_tpu.rings.context import default_context
from ringsnark_tpu.encoding import EncodingContext
from ringsnark_tpu.snark.api import SnarkParams
from ringsnark_tpu.snark import rinocchio, groth16
from ringsnark_tpu.models import build_toy_circuit
from ringsnark_tpu.ops.primes import find_ntt_primes


def main(replicate: int, n_inner: int = 512):
    ring = default_context(L=3, N=1, order=max(1 << 12, 2 * n_inner))
    inner, below = [], 1 << 31
    while len(inner) < 4:
        c = find_ntt_primes(1, 2 * n_inner, below=below)[0]
        below = c
        if c not in ring.primes:
            inner.append(c)
    params = SnarkParams(
        ring=ring,
        enc=EncodingContext(ring=ring, n_inner=n_inner, inner_primes=tuple(inner)),
    )
    rng = np.random.default_rng(0)
    pb = build_toy_circuit(ring, rng, replicate=replicate)
    print(f"#Inputs\t{pb.num_inputs()}")
    print(f"#Variables\t{pb.num_variables()}")
    print(f"#Constraints\t{pb.num_constraints()}")
    assert pb.is_satisfied()
    print("R1CS satisfied: True")

    for name, system in (("Rinocchio", rinocchio), ("RingGroth16", groth16)):
        print(f"\n=== {name} ===")
        t0 = time.time()
        kp = system.generator(
            pb.get_constraint_system(), params, rng, jax.random.PRNGKey(0)
        )
        print(f"Setup: {time.time()-t0:.2f}s")
        t0 = time.time()
        proof = system.prover(kp.pk, pb.primary_input(), pb.auxiliary_input(), rng)
        print(f"Prove: {time.time()-t0:.2f}s; proof {proof.size_in_bits()} bits")
        verif = system.verifier(kp.vk, pb.primary_input(), proof)
        print(f"Verification passed: {verif}")
        assert verif


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicate", type=int, default=16)
    args = ap.parse_args()
    main(args.replicate)
