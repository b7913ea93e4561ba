"""Sharded prover execution: GSPMD partitioning of the single-jit cores.

Sharding layout (DESIGN.md §5): CRS ciphertext batches are sharded
[B@data, L@limb, L', N']; assignments are replicated (they are tiny compared
to the CRS); XLA inserts the psum for the inner-product batch reductions and
the limb axis never communicates (RNS channels are independent).
"""

from __future__ import annotations

import jax

from ..encoding.encoding import Encoding
from ..rings.elem import RingElem
from ..reductions.r1cs_to_qrp import _assignment_batches
from ..snark.pipeline import groth16_core, groth16_proof_levels
from .mesh import crs_sharding, replicate

__all__ = [
    "shard_groth16_inputs",
    "groth16_prove_sharded",
    "shard_rinocchio_inputs",
    "rinocchio_prove_sharded",
]


def shard_groth16_inputs(pk, mesh):
    """device_put the groth16 CRS with the ('limb','data') sharding.

    Batch axes are zero-padded to PAD_QUANTUM (the cores pad identically, so
    this is a no-op inside the graph) — the 'data' axis size must divide it.
    """
    import numpy as _np
    import jax.numpy as jnp
    from ..snark.pipeline import PAD_QUANTUM, _pad_len

    assert PAD_QUANTUM % mesh.shape["data"] == 0, (
        f"data axis {mesh.shape['data']} must divide PAD_QUANTUM={PAD_QUANTUM}"
    )
    cs = crs_sharding(mesh)
    rep = replicate(mesh)

    def put(pair, sharded=True):
        if pair is None:
            return None
        c0, c1 = pair
        sh = cs if sharded and c0.ndim == 4 else rep
        if sharded and c0.ndim == 4:
            tgt = _pad_len(c0.shape[0])
            pad = [(0, tgt - c0.shape[0])] + [(0, 0)] * (c0.ndim - 1)
            c0 = jnp.pad(c0, pad)
            c1 = jnp.pad(c1, pad)
        return (jax.device_put(c0, sh), jax.device_put(c1, sh))

    return {
        "s_pows": put((pk.s_pows.c0, pk.s_pows.c1)),
        "delta_ts": put((pk.delta_ts.c0, pk.delta_ts.c1)),
        "delta_mid": put(
            None if pk.delta_mid is None else (pk.delta_mid.c0, pk.delta_mid.c1)
        ),
        "alpha": put((pk.alpha.c0, pk.alpha.c1), sharded=False),
        "beta": put((pk.beta.c0, pk.beta.c1), sharded=False),
    }


def groth16_prove_sharded(pk, primary_input, auxiliary_input, mesh):
    """Full groth16 prover step over the mesh; returns a Proof.

    Same jitted graph as the single-chip path — GSPMD partitions it from the
    input shardings (mesh of 1 == single-chip semantics, bit-identical).
    On a mesh with a 'coeff' axis the witness map's M/2M NTTs additionally
    run coefficient-sharded (parallel/witness_sharded.py) before the
    inner-product graph; the proof stays bit-identical (the sharded NTT is
    bit-exact vs one device).
    """
    ctx = pk.params.ring
    ectx = pk.params.enc
    ums = pk.params.use_modswitch
    crs = shard_groth16_inputs(pk, mesh)
    full, io, mid = _assignment_batches(ctx, primary_input, auxiliary_input)
    rep = replicate(mesh)
    z_full = jax.device_put(full.res, rep)
    z_io = jax.device_put(io.res, rep)
    z_mid = jax.device_put(mid.res, rep)
    aux_arr = (
        jax.device_put(RingElem.stack(list(auxiliary_input)).res, rep)
        if auxiliary_input
        else None
    )
    if "coeff" in mesh.axis_names and pk.domain.m >= 2 * mesh.shape["coeff"]:
        from ..ops.modops import add_mod
        from ..snark.pipeline import groth16_ip_core
        from .witness_sharded import make_witness_map_sharded

        wmap = make_witness_map_sharded(pk.compiled, pk.domain, mesh)
        (a_io, b_io, c_io, a_mid, b_mid, c_mid, Z, H) = wmap(z_full, z_io, z_mid)
        a_full = add_mod(a_io, a_mid, ctx.p)
        b_full = add_mod(b_io, b_mid, ctx.p)
        A, B, C = groth16_ip_core(
            crs, a_full, b_full, H, aux_arr, pk.domain.m, ectx, ums
        )
    else:
        A, B, C = groth16_core(
            pk.compiled, crs, z_full, z_io, z_mid, aux_arr, pk.domain, ectx, ums
        )
    from ..snark.groth16 import Proof

    la, lb, lc = groth16_proof_levels(ectx, ums)
    return Proof(
        A=Encoding(ectx, A[0], A[1], la),
        B=Encoding(ectx, B[0], B[1], lb),
        C=Encoding(ectx, C[0], C[1], lc),
    )


def shard_rinocchio_inputs(pk, mesh):
    """device_put the Rinocchio CRS batches with the ('limb','data') sharding
    (same layout rules as the groth16 variant)."""
    import jax.numpy as jnp
    from ..snark.pipeline import PAD_QUANTUM, _pad_len

    assert PAD_QUANTUM % mesh.shape["data"] == 0, (
        f"data axis {mesh.shape['data']} must divide PAD_QUANTUM={PAD_QUANTUM}"
    )
    cs = crs_sharding(mesh)

    def put(pair):
        if pair is None:
            return None
        c0, c1 = pair
        tgt = _pad_len(c0.shape[0])
        pad = [(0, tgt - c0.shape[0])] + [(0, 0)] * (c0.ndim - 1)
        return (
            jax.device_put(jnp.pad(c0, pad), cs),
            jax.device_put(jnp.pad(c1, pad), cs),
        )

    return {
        "s_pows": put((pk.s_pows.c0, pk.s_pows.c1)),
        "alpha_s_pows": put((pk.alpha_s_pows.c0, pk.alpha_s_pows.c1)),
        "beta_prods": put(
            None if pk.beta_prods is None
            else (pk.beta_prods.c0, pk.beta_prods.c1)
        ),
    }


def rinocchio_prove_sharded(pk, primary_input, auxiliary_input, mesh, rng=None):
    """Rinocchio prover over the mesh: the 10 inner products
    (`/root/reference/.../rinocchio.tcc:106-163`, OpenMP sections there)
    run as one GSPMD-partitioned graph.  Same jitted core as the single-chip
    prover, so proofs are bit-identical given the same ZK randomness."""
    import numpy as np
    from ..snark.pipeline import rinocchio_core
    from ..snark.rinocchio import Proof

    ctx = pk.params.ring
    ectx = pk.params.enc
    ums = pk.params.use_modswitch
    rng = rng or np.random.default_rng()
    use_zk = len(auxiliary_input) > 0
    zero = RingElem.zero(ctx)
    d1 = RingElem.random_invertible_element(ctx, rng) if use_zk else zero
    d2 = RingElem.random_invertible_element(ctx, rng) if use_zk else zero
    d3 = RingElem.random_invertible_element(ctx, rng) if use_zk else zero

    crs = shard_rinocchio_inputs(pk, mesh)
    full, io, mid = _assignment_batches(ctx, primary_input, auxiliary_input)
    rep = replicate(mesh)
    z_full = jax.device_put(full.res, rep)
    z_io = jax.device_put(io.res, rep)
    z_mid = jax.device_put(mid.res, rep)
    aux_arr = (
        jax.device_put(RingElem.stack(list(auxiliary_input)).res, rep)
        if auxiliary_input
        else None
    )
    outs, f_arrs = rinocchio_core(
        pk.compiled, crs, z_full, z_io, z_mid, aux_arr,
        jax.device_put(d1.res, rep), jax.device_put(d2.res, rep),
        jax.device_put(d3.res, rep), pk.domain, ectx, ums, use_zk,
    )
    lvl = groth16_proof_levels(ectx, ums)[0]
    encs = [Encoding(ectx, c0, c1, lvl) for (c0, c1) in outs]
    a, ap, b, bp, c, cp, d, dp = encs
    f_enc = None
    if f_arrs is not None:
        f_enc = Encoding(ectx, f_arrs[0], f_arrs[1], lvl)
        if use_zk:
            # F's d-shift terms multiply single fresh (level-0) encodings —
            # tiny; stay in the object layer exactly like the 1-chip prover
            f_enc = f_enc + d1 * pk.beta_rv_ts
            f_enc = f_enc + d2 * pk.beta_rw_ts
            f_enc = f_enc + d3 * pk.beta_ry_ts
    return Proof(A=a, A_prime=ap, B=b, B_prime=bp, C=c, C_prime=cp,
                 D=d, D_prime=dp, F=f_enc)
