"""vFHE plaintext-check demo (bit decomposition), both proof systems.

Port of `/root/reference/examples/example_plaintext_check_SEAL.cpp`.
Run: python examples/example_plaintext_check.py [--N 256] [--logT 16]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax

from ringsnark_tpu.snark import rinocchio, groth16
from ringsnark_tpu.models import build_plaintext_check
from example_poly_ring import make_params


def main(N: int, log_t: int, n_inner: int):
    params = make_params(N, n_inner)
    rng = np.random.default_rng(0)
    pb = build_plaintext_check(params.ring, rng, log_t=log_t)
    print(f"#Constraints\t{pb.num_constraints()}")
    assert pb.is_satisfied()
    print("R1CS satisfied: True")
    for name, system in (("Rinocchio", rinocchio), ("RingGroth16", groth16)):
        print(f"\n=== {name} ===")
        kp = system.generator(
            pb.get_constraint_system(), params, rng, jax.random.PRNGKey(0)
        )
        t0 = time.time()
        proof = system.prover(kp.pk, pb.primary_input(), pb.auxiliary_input(), rng)
        print(f"Prove: {time.time()-t0:.2f}s")
        verif = system.verifier(kp.vk, pb.primary_input(), proof)
        print(f"Verification passed: {verif}")
        assert verif


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--N", type=int, default=256)
    ap.add_argument("--logT", type=int, default=16)
    ap.add_argument("--n-inner", type=int, default=512)
    args = ap.parse_args()
    main(args.N, args.logT, args.n_inner)
