"""Measured full same-algorithm CPU prover (the r5 baseline anchor).

Runs the COMPLETE groth16 prover algorithm on the host CPU (OpenMP,
C++ kernels): the NTT-based witness map (identical algorithm and roots as
`reductions/r1cs_to_qrp._witness_map_kernel(outputs="prover")` — bit-exact,
asserted in tests/test_native.py) followed by every MAC the prover performs
(4 inner-product sides x 2 ciphertext components x L outer x L' inner
limbs; dense rings additionally pay the per-term plaintext-to-inner-NTT
transform the reference performs inside `multiply_plain`,
`seal/seal_ring.tcc:509-548`).  CRS ciphertext buffers are filled with
uniform random words — the MAC's running time does not depend on operand
values, so the measurement is timing-equivalent to a real CRS without
having to run the (setup-side) encryptions.

This replaces the r4 extrapolated `cpu_mac_s` lower bound (0.5 s/slab x
slab count, witness map excluded) with a measured end-to-end number —
VERDICT r4 "Next #3".  Reference algorithm being modeled:
`zk_proof_systems/groth16/groth16.tcc:69-115` +
`reductions/r1cs_to_qrp/r1cs_to_qrp.tcc:148-259` (with the O(m^2)
interpolation cluster upgraded to the same O(M log M) NTT pipeline this
framework uses — a STRONGER baseline than the reference's own host code).
"""

from __future__ import annotations

import time

import numpy as np

from . import (
    available,
    g16_witness_map,
    ip_accumulate,
    ip_accumulate_scalar,
    lift_rows,
    max_threads,
    negacyclic_intt,
    negacyclic_ntt,
    set_threads,
)
from ..ops import ntt as _ntt

__all__ = ["groth16_prover_cpu"]


def groth16_prover_cpu(
    comp,
    ectx,
    z_full: np.ndarray,
    aux: np.ndarray,
    rng: np.random.Generator,
    threads: int | None = None,
):
    """Measured full CPU groth16 prove.

    comp: CompiledR1CS; ectx: EncodingContext; z_full: uint32[nv+1, L, n]
    full assignment (constant 1 in row 0); aux: uint32[n_aux, L, n].
    Returns (timings, outputs): timings = {"witness_map_s", "mac_s",
    "total_s", "threads"}; outputs = per-limb (a_full, b_full, H) for
    cross-validation.
    """
    assert available()
    set_threads(threads if threads is not None else max_threads())
    ring = ectx.ring
    M = 1
    while M < max(comp.num_constraints, 1):
        M <<= 1
    L, n = ring.L, z_full.shape[-1]
    dense = n > 1
    Np = ectx.n_inner
    inner = ectx.inner_primes
    plan_M = _ntt.get_plan(ring.primes, M)
    plan_2M = _ntt.get_plan(ring.primes, 2 * M)
    plain_plan = ectx.plain_plan
    inner_plan = ectx.inner_plan(0)

    rows = [np.asarray(r) for r in comp.rows]
    cols = [np.asarray(c) for c in comp.cols]
    coeffs = [np.asarray(c) for c in comp.coeffs]
    z_full = np.ascontiguousarray(z_full, dtype=np.uint32)
    aux = np.ascontiguousarray(aux, dtype=np.uint32)

    # timing-equivalent random CRS component buffers (reused across sides
    # and limbs; allocated OUTSIDE the timed region — CRS generation is
    # setup, not prove)
    B = M + 1
    ct0 = rng.integers(0, 1 << 31, (B, Np), dtype=np.int64).astype(np.uint32)
    ct1 = rng.integers(0, 1 << 31, (B, Np), dtype=np.int64).astype(np.uint32)

    def pad_rows(v, tgt):
        if v.shape[0] == tgt:
            return v
        return np.concatenate(
            [v, np.zeros((tgt - v.shape[0], *v.shape[1:]), dtype=v.dtype)]
        )

    outputs = []
    t0 = time.perf_counter()
    wm = []
    for l in range(L):
        def coo(i):
            c = coeffs[i][:, l, :]
            return rows[i], cols[i], (c[:, 0] if c.shape[1] == 1 else c)

        a_full, b_full, H = g16_witness_map(
            coo(0), coo(1), z_full[:, l, :], M, ring.primes[l],
            int(plan_M.w_np[l]), int(plan_2M.w_np[l]),
        )
        wm.append((a_full, b_full, H))
    t_wm = time.perf_counter() - t0
    outputs = wm

    # ---- MACs: 4 sides (A: a_full, B: b_full over s_pows; C: H over
    # delta_ts + aux over delta_mid), per outer limb x inner limb x 2 comps
    t0 = time.perf_counter()
    for l in range(L):
        a_full, b_full, H = wm[l]
        if not dense:  # [*, 1] -> flat scalar weight vectors
            a_full, b_full, H = a_full[:, 0], b_full[:, 0], H[:, 0]
        t = ring.primes[l]
        sides = [pad_rows(a_full, B), pad_rows(b_full, B), H,
                 pad_rows(aux[:, l, :] if dense else aux[:, l, 0], B)]
        for v in sides:
            if not dense:
                for j, Q in enumerate(inner):
                    w = lift_rows(v, t, Q)
                    ip_accumulate_scalar(ct0, w, Q)
                    ip_accumulate_scalar(ct1, w, Q)
            else:
                # outer slots -> plain coeffs mod t (pad to N', inverse NTT),
                # then per inner limb: centered lift + forward NTT + MAC —
                # the reference's multiply_plain per-term transform
                padded = np.concatenate(
                    [v, np.zeros((B, Np - v.shape[1]), dtype=np.uint32)],
                    axis=1,
                )
                pc = negacyclic_intt(
                    padded, t, int(plain_plan.w_np[l]),
                    int(plain_plan.psi[l, 1]),
                )
                for j, Q in enumerate(inner):
                    lifted = lift_rows(pc, t, Q)
                    ptntt = negacyclic_ntt(
                        lifted, Q, int(inner_plan.w_np[j]),
                        int(inner_plan.psi[j, 1]),
                    )
                    ip_accumulate(ct0, ptntt, Q)
                    ip_accumulate(ct1, ptntt, Q)
    t_mac = time.perf_counter() - t0

    timings = {
        "witness_map_s": round(t_wm, 3),
        "mac_s": round(t_mac, 3),
        "total_s": round(t_wm + t_mac, 3),
        "threads": max_threads(),
    }
    return timings, outputs
