"""ringGroth16: Groth16 over rings with linear-only encodings.

Mirrors `/root/reference/ringsnark/zk_proof_systems/groth16/groth16.tcc`:
CRS of E(alpha), E(beta), E(s^i), E((beta A_k + alpha B_k + C_k)/gamma) for io,
the same /delta for mid wires, E(Z(s) s^i / delta); 3-element proof (A, B, C);
single verifier check A*B = alpha*beta + gamma*f_io + delta*C.

The prover is non-ZK — `use_zk = false` is hardcoded in the reference
(`groth16.tcc:76-84`); mirrored here and documented (the r/s randomization of
standard Groth16 is not implemented there either).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import numpy as np
import jax

from ..encoding import Encoding, encode, decode, inner_product, keygen
from ..reductions.r1cs_to_qrp import (
    r1cs_to_qrp_instance_map_with_evaluation,
    r1cs_to_qrp_witness_map,
    _interp,
)
from ..relations.r1cs import R1CSConstraintSystem, CompiledR1CS
from ..rings.elem import RingElem
from ..utils.domain import RootsDomain
from ..utils.poly_arr import eval_coeffs_at, ring_batch_scale
from .api import KeyPair, SnarkParams

__all__ = ["ProvingKey", "VerificationKey", "ProcessedVerificationKey", "Proof",
           "generator", "prover", "verifier", "verifier_process", "online_verifier"]


@dataclass
class ProvingKey:
    """CRS (groth16.hpp:10-48)."""

    constraint_system: R1CSConstraintSystem
    compiled: CompiledR1CS
    domain: RootsDomain
    params: SnarkParams
    alpha: Encoding  # E(alpha)
    beta: Encoding  # E(beta)
    s_pows: Encoding  # [M+1] E(s^i)
    gamma_io: Encoding  # [primary+1] E((beta A_k + alpha B_k + C_k)/gamma)
    delta_mid: Optional[Encoding]  # [aux] same with /delta
    delta_ts: Encoding  # [M+1] E(Z(s) s^i / delta)
    pk_enc: Any = None

    def size_in_bits(self) -> int:
        total = 0
        for e in (self.alpha, self.beta, self.s_pows, self.gamma_io,
                  self.delta_mid, self.delta_ts):
            if e is not None:
                total += e.size_in_bits()
        return total


@dataclass
class VerificationKey:
    pk: ProvingKey
    s: RingElem
    alpha: RingElem
    beta: RingElem
    gamma: RingElem
    delta: RingElem
    sk_enc: Any

    def size_in_bits(self) -> int:
        return self.pk.size_in_bits()


@dataclass
class Proof:
    """3 encodings (groth16.hpp:106-116)."""

    A: Encoding
    B: Encoding
    C: Encoding

    def size_in_bits(self) -> int:
        return self.A.size_in_bits() + self.B.size_in_bits() + self.C.size_in_bits()


def generator(
    cs: R1CSConstraintSystem,
    params: SnarkParams,
    rng: np.random.Generator,
    key,
) -> KeyPair:
    """Trusted setup (`groth16.tcc:5-67`).

    `cs` may be an R1CSConstraintSystem (frontend path) or a CompiledR1CS
    (array path for benchmark-scale synthetic instances).
    """
    ctx = params.ring
    if isinstance(cs, CompiledR1CS):
        comp, cs_obj = cs, None
        n_constraints = comp.num_constraints
        primary_size = comp.primary_input_size
        n_aux = comp.num_variables - primary_size
    else:
        comp, cs_obj = cs.compile(ctx), cs
        n_constraints = cs.num_constraints()
        primary_size = cs.primary_input_size
        n_aux = cs.auxiliary_input_size
    domain = RootsDomain(ctx, max(n_constraints, 1))
    s = RingElem.random_exceptional_element(ctx, rng, domain)
    qrp = r1cs_to_qrp_instance_map_with_evaluation(comp, s, domain)

    pk_enc, sk_enc = keygen(params.enc, rng)

    alpha = RingElem.random_invertible_element(ctx, rng)
    beta = RingElem.random_invertible_element(ctx, rng)
    gamma = RingElem.random_invertible_element(ctx, rng)
    delta = RingElem.random_invertible_element(ctx, rng)
    gamma_inv = gamma.inverse()
    delta_inv = delta.inverse()

    s_pows_ring = qrp.Ht  # [M+1, L, 1]
    delta_ts_ring = ring_batch_scale(
        ring_batch_scale(s_pows_ring, qrp.Zt), delta_inv
    )

    # (beta A_k + alpha B_k + C_k) / gamma  for io (incl. constant column),
    # same with /delta for mid wires
    combo = (
        ring_batch_scale(qrp.At, beta)
        + ring_batch_scale(qrp.Bt, alpha)
        + qrp.Ct
    )  # [nv+1, L, nc]
    n_io = primary_size + 1
    gamma_io_ring = ring_batch_scale(RingElem(ctx, combo.res[:n_io]), gamma_inv)

    keys = jax.random.split(key, 6)
    alpha_enc = encode(params.enc, sk_enc, RingElem.stack([alpha]), keys[0])[0]
    beta_enc = encode(params.enc, sk_enc, RingElem.stack([beta]), keys[1])[0]
    s_pows = encode(params.enc, sk_enc, s_pows_ring, keys[2])
    gamma_io = encode(params.enc, sk_enc, gamma_io_ring, keys[3])
    delta_mid = None
    if n_aux > 0:
        delta_mid_ring = ring_batch_scale(
            RingElem(ctx, combo.res[n_io:]), delta_inv
        )
        delta_mid = encode(params.enc, sk_enc, delta_mid_ring, keys[4])
    delta_ts = encode(params.enc, sk_enc, delta_ts_ring, keys[5])

    pk = ProvingKey(
        constraint_system=cs_obj, compiled=comp, domain=domain, params=params,
        alpha=alpha_enc, beta=beta_enc, s_pows=s_pows, gamma_io=gamma_io,
        delta_mid=delta_mid, delta_ts=delta_ts, pk_enc=pk_enc,
    )
    vk = VerificationKey(pk=pk, s=s, alpha=alpha, beta=beta, gamma=gamma,
                         delta=delta, sk_enc=sk_enc)
    return KeyPair(pk=pk, vk=vk)


def prover(
    pk: ProvingKey,
    primary_input: list,
    auxiliary_input: list,
    rng: np.random.Generator | None = None,
) -> Proof:
    """Prove (`groth16.tcc:69-115`).  Non-ZK: d1 = d2 = d3 = 0 (hardcoded
    `use_zk = false` in the reference, mirrored and documented).

    Slot-chunked witness map + the jitted `pipeline.groth16_ip_core` for the
    inner products — two moderate compiled programs instead of the one
    mega-graph (`pipeline.groth16_core`, still used by the sharded path),
    which crashed the remote compiler at dense reference shapes."""
    from ..reductions.r1cs_to_qrp import (
        _pa_batches,
        prover_witness_map_chunked,
    )
    from .pipeline import groth16_ip_core, groth16_proof_levels

    ctx = pk.params.ring
    ectx = pk.params.enc
    ums = pk.params.use_modswitch
    # lazy prover-mode witness map: only (a_full, b_full, H) materialize,
    # z_full is assembled per slot chunk, and just 3 of the 9 SpMV+iNTT
    # legs run (a_full == a_io + a_mid by linearity) — at Rq scale the
    # eager full/io/mid batches were the difference between fitting HBM
    # or not
    p_res, a_res = _pa_batches(ctx, primary_input, auxiliary_input)
    (a_full, b_full, H) = prover_witness_map_chunked(
        pk.compiled, p_res, a_res, pk.domain,
    )
    crs = {
        "s_pows": (pk.s_pows.c0, pk.s_pows.c1),
        "delta_ts": (pk.delta_ts.c0, pk.delta_ts.c1),
        "delta_mid": None
        if pk.delta_mid is None
        else (pk.delta_mid.c0, pk.delta_mid.c1),
        "alpha": (pk.alpha.c0, pk.alpha.c1),
        "beta": (pk.beta.c0, pk.beta.c1),
    }
    aux_arr = a_res if a_res.shape[0] > 0 else None
    A, B, C = groth16_ip_core(
        crs, a_full, b_full, H, aux_arr, pk.domain.m, ectx, ums
    )
    la, lb, lc = groth16_proof_levels(ectx, ums)
    return Proof(
        A=Encoding(ectx, A[0], A[1], la),
        B=Encoding(ectx, B[0], B[1], lb),
        C=Encoding(ectx, C[0], C[1], lc),
    )


def _io_assignment_with_one(ctx, primary_input) -> RingElem:
    """[1, primary...] assignment rows (io columns only), [n_io, L, n]."""
    import jax.numpy as jnp

    if isinstance(primary_input, RingElem):
        p_res = primary_input.res
        n = max(p_res.shape[-1], 1)
        one = jnp.broadcast_to(RingElem.one(ctx).res, (1, ctx.L, n)).astype(
            jnp.uint32
        )
        return RingElem(ctx, jnp.concatenate([one, p_res], axis=0))
    return RingElem.stack([RingElem.one(ctx)] + list(primary_input))


from functools import partial as _partial


@_partial(jax.jit, static_argnames=("ctx",))
def _io_eval_kernel(ctx, At_io, Bt_io, Ct_io, z_io):
    """(v_io(s), w_io(s), y_io(s)) = per-matrix sum_k z_k * Mt[k].

    Mt rows are the QRP basis-polynomial evaluations at s for the io columns
    (constant column 0 included).  Linearity makes this bit-identical to the
    reference's interpolate-io-polys-then-evaluate route
    (`groth16.tcc:140-158`, `rinocchio.tcc:230-254`) at O(n_io * n) instead
    of O(M log M * n) — the designated verifier already holds s, so nothing
    about the trust model changes.  (The r3 Rq verifier spent ~125 s in the
    interpolation route; this kernel is why verify is now decode-bound.)
    """
    from ..ops.modops import mul_mod as _mm, barrett_reduce_u64 as _br
    import jax.numpy as jnp

    def dot(vals):
        prods = _mm(vals, z_io, ctx.p, ctx.mu, ctx.pbits)
        acc = jnp.sum(prods.astype(jnp.uint64), axis=0)
        return _br(acc, ctx.p, ctx.mu, ctx.pbits)

    return dot(At_io), dot(Bt_io), dot(Ct_io)


def _io_terms_at_s(pvk_qrp, ctx, n_io: int, primary_input):
    """v_io(s), w_io(s), y_io(s) as RingElems from a QRPInstanceEvaluation."""
    z_io = _io_assignment_with_one(ctx, primary_input)
    assert z_io.res.shape[0] == n_io
    v, w, y = _io_eval_kernel(
        ctx,
        pvk_qrp.At.res[:n_io],
        pvk_qrp.Bt.res[:n_io],
        pvk_qrp.Ct.res[:n_io],
        z_io.res,
    )
    return RingElem(ctx, v), RingElem(ctx, w), RingElem(ctx, y)


def _io_terms_via_interpolation(pk, primary_input, s: RingElem):
    """Reference-shaped io route (evaluate constraints on the padded primary,
    interpolate, Horner at s — `groth16.tcc:140-158`).  Kept as the
    cross-check oracle for `_io_terms_at_s`; O(M log M * n)."""
    ctx = pk.params.ring
    domain = pk.domain
    z_io = _padded_primary_with_one(pk, primary_input)
    az, bz, cz = pk.compiled.eval_matrices(z_io.res, num_rows=domain.m)
    v_io = eval_coeffs_at(RingElem(ctx, _interp(domain, az)), s)
    w_io = eval_coeffs_at(RingElem(ctx, _interp(domain, bz)), s)
    y_io = eval_coeffs_at(RingElem(ctx, _interp(domain, cz)), s)
    return v_io, w_io, y_io


def _padded_primary_with_one(pk, primary_input) -> RingElem:
    """[1, primary..., 0...] assignment column (zeros for aux wires)."""
    import jax.numpy as jnp

    ctx = pk.params.ring
    n_aux = pk.compiled.num_variables - pk.compiled.primary_input_size
    if isinstance(primary_input, RingElem):
        p_res = primary_input.res
        n = max(p_res.shape[-1], 1)
        one = jnp.broadcast_to(RingElem.one(ctx).res, (1, ctx.L, n)).astype(
            jnp.uint32
        )
        zeros = jnp.zeros((n_aux, ctx.L, n), dtype=jnp.uint32)
        return RingElem(ctx, jnp.concatenate([one, p_res, zeros], axis=0))
    one = RingElem.one(ctx)
    zero = RingElem.zero(ctx)
    return RingElem.stack([one] + list(primary_input) + [zero] * n_aux)


@dataclass
class ProcessedVerificationKey:
    """io-independent precomputation (see rinocchio.ProcessedVerificationKey)."""

    vk: VerificationKey
    qrp: Any
    alpha_beta: RingElem


def verifier_process(vk: VerificationKey) -> ProcessedVerificationKey:
    qrp = r1cs_to_qrp_instance_map_with_evaluation(
        vk.pk.compiled, vk.s, vk.pk.domain
    )
    return ProcessedVerificationKey(vk=vk, qrp=qrp, alpha_beta=vk.alpha * vk.beta)


def verifier(
    vk: VerificationKey,
    primary_input,
    proof: Proof,
) -> bool:
    """Verify (`groth16.tcc:117-170`): A*B = alpha*beta + gamma*f_io + delta*C."""
    return online_verifier(verifier_process(vk), primary_input, proof)


def online_verifier(
    pvk: ProcessedVerificationKey,
    primary_input,
    proof: Proof,
) -> bool:
    vk = pvk.vk
    pk = vk.pk
    ctx = pk.params.ring
    enc_ctx = pk.params.enc
    domain = pk.domain

    A = decode(enc_ctx, vk.sk_enc, proof.A)
    B = decode(enc_ctx, vk.sk_enc, proof.B)
    C = decode(enc_ctx, vk.sk_enc, proof.C)

    n_io = pk.compiled.primary_input_size + 1
    v_io, w_io, y_io = _io_terms_at_s(pvk.qrp, ctx, n_io, primary_input)

    # f_io = (beta v_io + alpha w_io + y_io) / gamma  (kept /gamma then *gamma
    # to mirror the reference check shape, groth16.tcc:159-167)
    f_io = (vk.beta * v_io + vk.alpha * w_io + y_io) / vk.gamma

    lhs = A * B
    rhs = pvk.alpha_beta + vk.gamma * f_io + vk.delta * C
    return lhs == rhs
