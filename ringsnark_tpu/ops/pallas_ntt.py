"""Pallas TPU kernel for the negacyclic NTT (the north-star kernel).

Single fused kernel per (batch-tile, limb): all log2(M) DIF stages run with
the polynomial resident in VMEM, using Shoup precomputed-twiddle multiplies
in pure uint32 (no 64-bit emulation):

    q  = mulhi32(a, w_shoup)        # w_shoup = floor(w * 2^32 / p)
    r  = a*w - q*p   (mod 2^32)     # r < 2p, one conditional subtract

`mulhi32` is built from 16-bit partial products (TPU has no 32x32->64).

Stage strategy (Mosaic layout constraints):
* stages with butterfly distance d >= 128: lane dimension untouched —
  reshape to [..., nb, 2, d] and slice (the XLA-path formulation);
* stages with d < 128: butterflies live inside 128-lane tiles — use
  pltpu.roll(+-d) along the last axis with an iota mask (positioned
  twiddle vectors precomputed host-side), avoiding sub-lane reshapes.

Output ordering matches ops/ntt.py exactly (DIF: natural in, bit-reversed
out), validated bit-for-bit in tests/test_pallas_ntt.py.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import primes as _primes
from .ntt import _mod_powers, get_plan

__all__ = ["get_pallas_tables", "negacyclic_ntt_rev_pallas", "LANE"]

LANE = 128


@dataclass(frozen=True)
class PallasNTTTables:
    primes: tuple[int, ...]
    M: int
    psi: object = field(hash=False, compare=False)  # [L, M]
    psi_sh: object = field(hash=False, compare=False)
    flat_tw: object = field(hash=False, compare=False)  # [L, M] big-stage segments
    flat_tw_sh: object = field(hash=False, compare=False)
    pos_tw: object = field(hash=False, compare=False)  # [L, n_small, M] positioned
    pos_tw_sh: object = field(hash=False, compare=False)
    p_arr: object = field(hash=False, compare=False)  # [L] uint32

    @property
    def L(self):
        return len(self.primes)


def _shoup(vals: np.ndarray, p: int) -> np.ndarray:
    return ((vals.astype(object) * (1 << 32)) // p).astype(np.uint64).astype(np.uint32)


@lru_cache(maxsize=None)
def get_pallas_tables(primes: tuple[int, ...], M: int) -> PallasNTTTables:
    assert M % LANE == 0 and M >= 2 * LANE
    L = len(primes)
    plan = get_plan(primes, M, negacyclic=True)

    psi = plan.psi.astype(np.uint32)  # [L, M]
    psi_sh = np.stack([_shoup(psi[l], primes[l]) for l in range(L)])

    n_big = (M // LANE).bit_length() - 1  # stages with d >= LANE: d = M/2..LANE
    n_small = LANE.bit_length() - 1  # d = LANE/2 .. 1

    # big stages: concatenated per-stage twiddle segments (total M - LANE + ...)
    flat, flat_sh = [], []
    for l, p in enumerate(primes):
        w_pows = _mod_powers(plan.w_np[l], M, p).astype(np.uint32)
        segs = []
        for s in range(n_big):
            d = M >> (s + 1)
            stride = M // (2 * d)
            segs.append(w_pows[: d * stride : stride][:d])
        seg = np.concatenate(segs)
        pad = np.zeros(M - len(seg), dtype=np.uint32)
        full = np.concatenate([seg, pad])
        flat.append(full)
        flat_sh.append(_shoup(full, p))
    flat_tw = np.stack(flat)
    flat_tw_sh = np.stack(flat_sh)

    # small stages: positioned twiddle vectors over the full axis.
    # position k is a 'b' output iff (k mod 2d) >= d; its twiddle index is
    # ((k mod 2d) - d) * stride.  'a' positions hold 1 (multiplied into the
    # discarded lane of the select).
    pos, pos_sh = [], []
    ks = np.arange(M)
    for l, p in enumerate(primes):
        w_pows = _mod_powers(plan.w_np[l], M, p).astype(np.uint32)
        rows, rows_sh = [], []
        for s in range(n_small):
            d = LANE >> (s + 1)
            stride = M // (2 * d)
            off = ks % (2 * d)
            tw = np.where(off >= d, w_pows[((off - d) * stride) % M], 1).astype(
                np.uint32
            )
            rows.append(tw)
            rows_sh.append(_shoup(tw, p))
        pos.append(np.stack(rows))
        pos_sh.append(np.stack(rows_sh))
    pos_tw = np.stack(pos)  # [L, n_small, M]
    pos_tw_sh = np.stack(pos_sh)

    return PallasNTTTables(
        primes=primes, M=M, psi=psi, psi_sh=psi_sh,
        flat_tw=flat_tw, flat_tw_sh=flat_tw_sh,
        pos_tw=pos_tw, pos_tw_sh=pos_tw_sh,
        p_arr=np.array(primes, dtype=np.uint32),
    )


def _mulhi32(a, b):
    """Exact high 32 bits of a*b via 16-bit partial products (uint32)."""
    mask = jnp.uint32(0xFFFF)
    a0, a1 = a & mask, a >> 16
    b0, b1 = b & mask, b >> 16
    lo = a0 * b0
    m1 = a1 * b0
    m2 = a0 * b1
    hi = a1 * b1
    carry = ((lo >> 16) + (m1 & mask) + (m2 & mask)) >> 16
    return hi + (m1 >> 16) + (m2 >> 16) + carry


def _shoup_mul(a, w, w_sh, p):
    """a*w mod p with precomputed w_sh = floor(w*2^32/p); needs a < p."""
    q = _mulhi32(a, w_sh)
    r = a * w - q * p  # mod 2^32; result < 2p
    return jnp.where(r >= p, r - p, r)


def _addmod(a, b, p):
    s = a + b
    return jnp.where(s >= p, s - p, s)


def _submod(a, b, p):
    d = a + p - b
    return jnp.where(d >= p, d - p, d)


def _ntt_kernel_gridfree(M: int, TB: int, primes: tuple[int, ...]):
    """Grid-free kernel: one program transforms [L, TB, M] entirely in VMEM.

    This environment's remote Mosaic compiler rejects any gridded
    pallas_call, so the limb loop is unrolled in the kernel with the limb
    prime as an immediate constant (which also saves the SMEM reads)."""
    n_big = (M // LANE).bit_length() - 1
    n_small = LANE.bit_length() - 1
    L = len(primes)

    def kernel(x_ref, psi_ref, psi_sh_ref, ftw_ref, ftw_sh_ref,
               ptw_ref, ptw_sh_ref, out_ref):
        lane_idx = jax.lax.broadcasted_iota(jnp.uint32, (TB, M), 1)
        for l in range(L):
            p = jnp.uint32(primes[l])
            x = x_ref[l]  # (TB, M)
            x = _shoup_mul(x, psi_ref[l], psi_sh_ref[l], p)

            # big stages: lane-preserving reshapes
            off = 0
            for s in range(n_big):
                d = M >> (s + 1)
                nb = M // (2 * d)
                xr = x.reshape(TB, nb, 2, d)
                a_, b_ = xr[:, :, 0, :], xr[:, :, 1, :]
                tw = ftw_ref[l, off : off + d]
                tw_sh = ftw_sh_ref[l, off : off + d]
                na = _addmod(a_, b_, p)
                nb_ = _shoup_mul(_submod(a_, b_, p), tw, tw_sh, p)
                x = jnp.stack([na, nb_], axis=2).reshape(TB, M)
                off += d

            # small stages: roll + masked select inside 128-lane tiles
            for s in range(n_small):
                d = LANE >> (s + 1)
                is_a = (lane_idx & jnp.uint32(2 * d - 1)) < d
                # i32 shifts (x64 ints lower to i64 rotate operands)
                partner_fwd = pltpu.roll(x, jnp.int32(M - d), 1)  # x[k+d] at k
                partner_bwd = pltpu.roll(x, jnp.int32(d), 1)  # x[k-d] at k
                na = _addmod(x, partner_fwd, p)
                sub = _submod(partner_bwd, x, p)
                nb_ = _shoup_mul(sub, ptw_ref[l, s, :], ptw_sh_ref[l, s, :], p)
                x = jnp.where(is_a, na, nb_)

            out_ref[l] = x

    return kernel


@partial(jax.jit, static_argnames=("tables", "tb", "interpret"))
def negacyclic_ntt_rev_pallas(x, tables: PallasNTTTables, tb: int = 8,
                              interpret: bool = False):
    """x: uint32[B, L, M] -> negacyclic NTT (bit-reversed out), per limb.

    Grid-free: each pallas_call transforms a [L, tb, M] chunk fully in VMEM
    (limb loop unrolled in-kernel); larger batches chunk over sequential
    calls.  VMEM use ≈ 2*L*tb*M*4 + tables — keep tb*M*L ≲ 1.5M words.
    """
    B, L, M = x.shape
    assert L == tables.L and M == tables.M
    assert B % tb == 0 and tb % 8 == 0, f"batch tile {tb} must be 8-aligned"

    kernel = _ntt_kernel_gridfree(M, tb, tables.primes)
    tbl_args = (
        jnp.asarray(tables.psi),
        jnp.asarray(tables.psi_sh),
        jnp.asarray(tables.flat_tw),
        jnp.asarray(tables.flat_tw_sh),
        jnp.asarray(tables.pos_tw),
        jnp.asarray(tables.pos_tw_sh),
    )
    call = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, tb, M), jnp.uint32),
        interpret=interpret,
    )

    xt = jnp.transpose(x, (1, 0, 2))  # [L, B, M]
    chunks = []
    for c in range(B // tb):
        out = call(xt[:, c * tb : (c + 1) * tb, :], *tbl_args)
        chunks.append(out)
    full = jnp.concatenate(chunks, axis=1) if len(chunks) > 1 else chunks[0]
    return jnp.transpose(full, (1, 0, 2))
