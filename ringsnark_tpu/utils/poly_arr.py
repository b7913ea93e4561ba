"""Array-path polynomial helpers for the SNARK pipelines."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.modops import mul_mod, barrett_reduce_u64
from ..rings.elem import RingElem

__all__ = ["eval_coeffs_at", "ring_batch_scale"]


@jax.jit
def eval_coeffs_at(coeffs: RingElem, s: RingElem) -> RingElem:
    """Evaluate a coefficient batch [K, L, n] at scalar s: sum_k c_k s^k.

    Powers-dot form (log K + O(1) kernels) instead of a K-step Horner loop.
    """
    from ..reductions.r1cs_to_qrp import mod_powers_device

    ctx = coeffs.ctx
    K = coeffs.res.shape[0]
    pows = mod_powers_device(s.res, K, ctx)  # [K, L, 1]
    prods = mul_mod(coeffs.res, pows, ctx.p, ctx.mu, ctx.pbits)
    acc = jnp.sum(prods.astype(jnp.uint64), axis=0)
    return RingElem(ctx, barrett_reduce_u64(acc, ctx.p, ctx.mu, ctx.pbits))


def ring_batch_scale(batch: RingElem, c: RingElem) -> RingElem:
    """Scale every element of a batch by the scalar/elem c."""
    ctx = batch.ctx
    return RingElem(ctx, mul_mod(batch.res, c.res, ctx.p, ctx.mu, ctx.pbits))
