"""Pallas TPU kernels for the NTT family (the north-star kernels).

Forward/inverse x cyclic/negacyclic transforms as single fused grid-free
kernels: all log2(M) stages run with the polynomial resident in VMEM, using
Shoup precomputed-twiddle multiplies in pure uint32 (no 64-bit emulation):

    q  = mulhi32(a, w_shoup)        # w_shoup = floor(w * 2^32 / p)
    r  = a*w - q*p   (mod 2^32)     # r < 2p, one conditional subtract

`mulhi32` is built from 16-bit partial products (TPU has no 32x32->64).

Stage strategy (Mosaic layout constraints): EVERY stage runs as a masked
lane-roll butterfly on the [TB, M] block — partners fetched with
pltpu.roll(+-d) along the last axis, an iota mask selecting the a/b halves,
and positioned twiddle vectors (precomputed host-side, one [M] row per
stage).  For d >= 128 the roll is a whole-vreg lane-tile rotation; for
d < 128 it is an intra-tile lane rotation.  This does ~2x the modular
arithmetic of the slice formulation (both butterfly outputs are computed at
every position) but zero relayouts — the round-2 slice/stack formulation
spent most of its time in Mosaic relayout copies, not arithmetic.

Kernels are GRID-FREE (single program, limb loop unrolled with the prime as
an immediate): this environment's remote Mosaic compiler rejects any gridded
pallas_call.  Larger batches chunk over sequential calls.

Orderings match ops/ntt.py exactly (forward: natural in -> bit-reversed out;
inverse: bit-reversed in -> natural out, scaled), validated bit-for-bit in
tests/test_pallas_ntt.py.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ntt import _mod_powers, get_plan

__all__ = [
    "get_pallas_tables",
    "get_split_tables",
    "negacyclic_ntt_rev_pallas",
    "negacyclic_intt_nat_pallas",
    "cyclic_ntt_rev_pallas",
    "cyclic_intt_nat_pallas",
    "ntt_split_pallas",
    "LANE",
]

LANE = 128


@dataclass(frozen=True)
class PallasNTTTables:
    primes: tuple[int, ...]
    M: int
    # negacyclic pre/post scale rows
    psi: object = field(hash=False, compare=False)  # [L, M]
    psi_sh: object = field(hash=False, compare=False)
    psiinv_s: object = field(hash=False, compare=False)  # [L, M] psi^-i * M^-1
    psiinv_s_sh: object = field(hash=False, compare=False)
    # positioned per-stage twiddle rows, ALL log2(M) stages
    pos_tw: object = field(hash=False, compare=False)  # [L, n_stages, M] fwd
    pos_tw_sh: object = field(hash=False, compare=False)
    inv_pos_tw: object = field(hash=False, compare=False)  # [L, n_stages, M]
    inv_pos_tw_sh: object = field(hash=False, compare=False)
    minv: tuple = field(hash=False, compare=False)  # per-limb ints
    minv_sh: tuple = field(hash=False, compare=False)

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
    psiinv_s = plan.psi_inv_scaled.astype(np.uint32)
    psiinv_s_sh = np.stack([_shoup(psiinv_s[l], primes[l]) for l in range(L)])

    n_stages = M.bit_length() - 1
    ks = np.arange(M)

    def build(dirn_pows, inverse: bool):
        """Positioned twiddle rows [n_stages, M] (see kernel docstring)."""
        rows = []
        for s in range(n_stages):
            # fwd: d = M/2 .. 1; inv: d = 1 .. M/2
            d = (M >> (s + 1)) if not inverse else (1 << s)
            stride = M // (2 * d)
            if not inverse:
                # fwd DIF: twiddle on 'b' outputs, index (k mod 2d) - d
                off = ks % (2 * d)
                tw = np.where(off >= d, dirn_pows[((off - d) * stride) % M], 1)
            else:
                # inv DIT: same twiddle index k mod d at both pair positions
                tw = dirn_pows[((ks % d) * stride) % M]
            rows.append(tw.astype(np.uint32))
        return np.stack(rows)

    pos, pos_sh, ipos, ipos_sh = [], [], [], []
    minv, minv_sh = [], []
    for l, p in enumerate(primes):
        w_pows = _mod_powers(plan.w_np[l], M, p).astype(np.uint32)
        winv_pows = _mod_powers(pow(plan.w_np[l], p - 2, p), M, p).astype(np.uint32)
        po = build(w_pows, inverse=False)
        pos.append(po)
        pos_sh.append(np.stack([_shoup(r, p) for r in po]))
        poi = build(winv_pows, inverse=True)
        ipos.append(poi)
        ipos_sh.append(np.stack([_shoup(r, p) for r in poi]))
        mv = pow(M, p - 2, p)
        minv.append(mv)
        minv_sh.append((mv << 32) // p)

    return PallasNTTTables(
        primes=primes, M=M,
        psi=psi, psi_sh=psi_sh,
        psiinv_s=psiinv_s, psiinv_s_sh=psiinv_s_sh,
        pos_tw=np.stack(pos), pos_tw_sh=np.stack(pos_sh),
        inv_pos_tw=np.stack(ipos), inv_pos_tw_sh=np.stack(ipos_sh),
        minv=tuple(minv), minv_sh=tuple(minv_sh),
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


def _ntt_kernel_gridfree(
    M: int, TB: int, primes: tuple[int, ...], inverse: bool, negacyclic: bool,
    minv: tuple, minv_sh: tuple, scale: bool = True, blm: bool = False,
):
    """Grid-free kernel: one program transforms [L, TB, M] entirely in VMEM.

    The remote Mosaic compiler here rejects any gridded pallas_call, so the
    limb loop is unrolled with the limb prime as an immediate constant.

    Every stage is a masked lane-roll butterfly: at position k of the pair
    (a=k, b=k+d), both outputs are computed everywhere and an iota mask
    selects which survives.  Roll distances >= 128 are whole-vreg lane-tile
    rotations; < 128 rotate within tiles.  No reshapes/stacks -> no Mosaic
    relayout copies (~4x faster than the r2 slice formulation on chip)."""
    n_stages = M.bit_length() - 1
    L = len(primes)

    def fwd(x, p, ptw_ref, ptw_sh_ref, l, lane_idx):
        # r3 form.  A "single-multiply" variant (out = shoup(partner ± x, tw)
        # exploiting the 1-twiddles at a-positions) measured 14% SLOWER on
        # chip (157 vs 138 us/batch, chip_logs/ntt_r04.log): its two extra
        # full-width selects cost more than the submod they replace.
        for s in range(n_stages):
            d = M >> (s + 1)
            is_a = (lane_idx & jnp.uint32(2 * d - 1)) < d
            partner_fwd = pltpu.roll(x, jnp.int32(M - d), 1)  # x[k+d] at k
            partner_bwd = pltpu.roll(x, jnp.int32(d), 1)  # x[k-d] at k
            na = _addmod(x, partner_fwd, p)
            sub = _submod(partner_bwd, x, p)
            nb_ = _shoup_mul(sub, ptw_ref[l, s, :], ptw_sh_ref[l, s, :], p)
            x = jnp.where(is_a, na, nb_)
        return x

    def inv(x, p, ptw_ref, ptw_sh_ref, l, lane_idx):
        # inv DIT pairs share the twiddle index, so multiply FIRST and roll
        # the product: m = w*x everywhere, a' = x + m[k+d], b' = x[k-d] - m.
        # One Shoup multiply per stage instead of the r3 form's two.
        for s in range(n_stages):
            d = 1 << s
            is_a = (lane_idx & jnp.uint32(2 * d - 1)) < d
            m = _shoup_mul(x, ptw_ref[l, s, :], ptw_sh_ref[l, s, :], p)
            a_new = _addmod(x, pltpu.roll(m, jnp.int32(M - d), 1), p)
            b_new = _submod(pltpu.roll(x, jnp.int32(d), 1), m, p)
            x = jnp.where(is_a, a_new, b_new)
        return x

    def kernel(x_ref, tw_ref, tw_sh_ref, scale_ref, scale_sh_ref, out_ref):
        lane_idx = jax.lax.broadcasted_iota(jnp.uint32, (TB, M), 1)
        for l in range(L):
            p = jnp.uint32(primes[l])
            # blm layout: the block is [TB, L, M] (caller-natural order, no
            # HBM transpose) and the limb is the squeezed middle index
            x = x_ref[:, l, :] if blm else x_ref[l]  # (TB, M)
            if not inverse:
                if negacyclic:
                    x = _shoup_mul(x, scale_ref[l], scale_sh_ref[l], p)
                x = fwd(x, p, tw_ref, tw_sh_ref, l, lane_idx)
            else:
                x = inv(x, p, tw_ref, tw_sh_ref, l, lane_idx)
                if negacyclic:
                    x = _shoup_mul(x, scale_ref[l], scale_sh_ref[l], p)
                elif scale:
                    x = _shoup_mul(
                        x, jnp.uint32(minv[l]), jnp.uint32(minv_sh[l]), p
                    )
            if blm:
                out_ref[:, l, :] = x
            else:
                out_ref[l] = x

    return kernel


def _apply_lbm(xt, tables: PallasNTTTables, tb: int, inverse: bool,
               negacyclic: bool, interpret: bool = False, scale: bool = True):
    """Core chunked application on [L, B, M]-layout data (returns same layout).

    `scale=False` skips the final M^-1 multiply of the cyclic inverse — used
    by the split large-M path, which folds the full-size scaling into its
    outer-stage pass."""
    L, B, M = xt.shape
    assert L == tables.L and M == tables.M
    assert B % tb == 0 and tb % 8 == 0, f"batch tile {tb} must be 8-aligned"

    kernel = _ntt_kernel_gridfree(
        M, tb, tables.primes, inverse, negacyclic,
        tables.minv, tables.minv_sh, scale,
    )
    if not inverse:
        tbl = (tables.pos_tw, tables.pos_tw_sh, tables.psi, tables.psi_sh)
    else:
        tbl = (tables.inv_pos_tw, tables.inv_pos_tw_sh,
               tables.psiinv_s, tables.psiinv_s_sh)
    tbl_args = tuple(jnp.asarray(t) for t in tbl)
    call = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, tb, M), jnp.uint32),
        interpret=interpret,
    )

    chunks = []
    for c in range(B // tb):
        chunks.append(call(xt[:, c * tb : (c + 1) * tb, :], *tbl_args))
    return jnp.concatenate(chunks, axis=1) if len(chunks) > 1 else chunks[0]


import os as _os

# lbm (default): [L, B, M] blocks with HBM transposes on either side.
# blm slices [tb, L, M] directly (no transposes) but measured SLOWER on chip
# (r3 sweep: 172 vs 146 us/batch at tb=8 — the squeezed middle-index access
# pattern costs Mosaic more than the two full-array HBM round-trips saved).
_LAYOUT = _os.environ.get("RINGSNARK_PALLAS_LAYOUT", "lbm")


def _apply_blm(x, tables: PallasNTTTables, tb: int, inverse: bool,
               negacyclic: bool, interpret: bool = False):
    """x: uint32[B, L, M] -> same layout, transpose-free."""
    B, L, M = x.shape
    assert L == tables.L and M == tables.M
    assert B % tb == 0 and tb % 8 == 0, f"batch tile {tb} must be 8-aligned"
    kernel = _ntt_kernel_gridfree(
        M, tb, tables.primes, inverse, negacyclic,
        tables.minv, tables.minv_sh, blm=True,
    )
    if not inverse:
        tbl = (tables.pos_tw, tables.pos_tw_sh, tables.psi, tables.psi_sh)
    else:
        tbl = (tables.inv_pos_tw, tables.inv_pos_tw_sh,
               tables.psiinv_s, tables.psiinv_s_sh)
    tbl_args = tuple(jnp.asarray(t) for t in tbl)
    call = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tb, L, M), jnp.uint32),
        interpret=interpret,
    )
    chunks = [
        call(x[c * tb : (c + 1) * tb], *tbl_args) for c in range(B // tb)
    ]
    return jnp.concatenate(chunks, axis=0) if len(chunks) > 1 else chunks[0]


@partial(jax.jit, static_argnames=("tables", "tb", "inverse", "negacyclic",
                                   "interpret", "layout"))
def _apply(x, tables: PallasNTTTables, tb: int, inverse: bool,
           negacyclic: bool, interpret: bool = False, layout: str = "blm"):
    """x: uint32[B, L, M]; grid-free chunked application (see module doc)."""
    if layout == "blm":
        return _apply_blm(x, tables, tb, inverse, negacyclic, interpret)
    xt = jnp.transpose(x, (1, 0, 2))  # [L, B, M]
    full = _apply_lbm(xt, tables, tb, inverse, negacyclic, interpret)
    return jnp.transpose(full, (1, 0, 2))


def negacyclic_ntt_rev_pallas(x, tables, tb: int = 8, interpret: bool = False):
    return _apply(x, tables, tb, inverse=False, negacyclic=True,
                  interpret=interpret, layout=_LAYOUT)


def negacyclic_intt_nat_pallas(x, tables, tb: int = 8, interpret: bool = False):
    return _apply(x, tables, tb, inverse=True, negacyclic=True,
                  interpret=interpret, layout=_LAYOUT)


def cyclic_ntt_rev_pallas(x, tables, tb: int = 8, interpret: bool = False):
    return _apply(x, tables, tb, inverse=False, negacyclic=False,
                  interpret=interpret, layout=_LAYOUT)


def cyclic_intt_nat_pallas(x, tables, tb: int = 8, interpret: bool = False):
    return _apply(x, tables, tb, inverse=True, negacyclic=False,
                  interpret=interpret, layout=_LAYOUT)


# ---------------------------------------------------------------------------
# Split (four-step-style) path for large M — grid-free kernels can't hold a
# 2^17+ transform's stage intermediates in scoped VMEM (the r2 chip run OOMed
# at M=131072: 37.4 MB stack vs the 16 MB limit).  Decompose M = R * Mi:
#
#   forward:  [psi twist +] s=log2(R) outer DIF butterfly stages (pairs at
#             row distance >= Mi, i.e. along the R axis of the [R, Mi] matrix
#             view) -> R independent size-Mi cyclic NTT_rev on contiguous
#             rows, folded into the batch axis of the grid-free kernel.
#   inverse:  R independent size-Mi cyclic iNTT (unscaled) -> s outer DIT
#             stages -> fold-in of the full-size scaling (M^-1, or
#             psi^-k * M^-1 for negacyclic).
#
# Bit-exact with the XLA path because roots are canonical (primes.py:
# w_M = g^((p-1)/M), so w_M^(2^s) == w_Mi) and the DIF recursion maps the
# full bit-reversed output to per-row bit-reversed outputs in row order.
# The outer kernel processes [tb, R, W] column chunks: one HBM round-trip
# for ALL outer stages, butterflies along the sublane (R) axis via
# pltpu.roll — the same masked-roll pattern the small stages use on lanes.
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class SplitNTTTables:
    primes: tuple[int, ...]
    M: int
    Mi: int  # inner transform size
    inner: PallasNTTTables = field(hash=False, compare=False)
    # positioned outer twiddles [L, s, R, Mi] (+ shoup)
    fwd_tw: object = field(hash=False, compare=False)
    fwd_tw_sh: object = field(hash=False, compare=False)
    inv_tw: object = field(hash=False, compare=False)
    inv_tw_sh: object = field(hash=False, compare=False)
    # negacyclic pre/post twists in [L, R, Mi] matrix view
    psi: object = field(hash=False, compare=False)
    psi_sh: object = field(hash=False, compare=False)
    psiinv_s: object = field(hash=False, compare=False)  # psi^-k * M^-1
    psiinv_s_sh: object = field(hash=False, compare=False)
    minv: tuple = field(hash=False, compare=False)  # M^-1 (full size)
    minv_sh: tuple = field(hash=False, compare=False)

    @property
    def L(self):
        return len(self.primes)

    @property
    def R(self):
        return self.M // self.Mi

    @property
    def s(self):
        return self.R.bit_length() - 1


@lru_cache(maxsize=None)
def get_split_tables(primes: tuple[int, ...], M: int, Mi: int) -> SplitNTTTables:
    assert M % Mi == 0 and Mi >= 2 * LANE and Mi % LANE == 0
    R = M // Mi
    assert R & (R - 1) == 0 and R >= 2
    s = R.bit_length() - 1
    L = len(primes)
    plan = get_plan(primes, M, negacyclic=True)
    inner = get_pallas_tables(primes, Mi)
    # inner tables must come from the same canonical root chain
    for l, p in enumerate(primes):
        assert pow(plan.w_np[l], R, p) == int(
            get_plan(primes, Mi, negacyclic=True).w_np[l]
        ), "non-canonical roots: split path would diverge from the XLA path"

    ks = np.arange(Mi)
    fwd, fwd_sh, inv, inv_sh = [], [], [], []
    minv, minv_sh = [], []
    for l, p in enumerate(primes):
        w_pows = _mod_powers(plan.w_np[l], M, p).astype(np.uint32)
        winv_pows = _mod_powers(pow(plan.w_np[l], p - 2, p), M, p).astype(np.uint32)
        f_st, i_st = [], []
        for i in range(s):
            d = R >> (i + 1)
            r = np.arange(R)
            lo = r & (d - 1)
            idx = ((1 << i) * (lo[:, None] * Mi + ks[None, :])) % M  # [R, Mi]
            is_b = (r & (2 * d - 1)) >= d
            # fwd: twiddle on b-positions only (a-path multiplies nothing)
            f_st.append(np.where(is_b[:, None], w_pows[idx], 1).astype(np.uint32))
            # inv: same index at both pair positions (see inv_small)
            i_st.append(winv_pows[idx])
        fwd.append(np.stack(f_st))
        fwd_sh.append(np.stack([_shoup(t, p) for t in f_st]))
        inv.append(np.stack(i_st))
        inv_sh.append(np.stack([_shoup(t, p) for t in i_st]))
        mv = pow(M, p - 2, p)
        minv.append(mv)
        minv_sh.append((mv << 32) // p)

    psi = plan.psi.astype(np.uint32).reshape(L, R, Mi)
    psi_sh = np.stack([_shoup(psi[l].ravel(), p).reshape(R, Mi)
                       for l, p in enumerate(primes)])
    psiinv_s = plan.psi_inv_scaled.astype(np.uint32).reshape(L, R, Mi)
    psiinv_s_sh = np.stack([_shoup(psiinv_s[l].ravel(), p).reshape(R, Mi)
                            for l, p in enumerate(primes)])

    return SplitNTTTables(
        primes=primes, M=M, Mi=Mi, inner=inner,
        fwd_tw=np.stack(fwd), fwd_tw_sh=np.stack(fwd_sh),
        inv_tw=np.stack(inv), inv_tw_sh=np.stack(inv_sh),
        psi=psi, psi_sh=psi_sh, psiinv_s=psiinv_s, psiinv_s_sh=psiinv_s_sh,
        minv=tuple(minv), minv_sh=tuple(minv_sh),
    )


def _outer_kernel(R: int, TB: int, W: int, primes: tuple[int, ...],
                  inverse: bool, negacyclic: bool, minv: tuple, minv_sh: tuple):
    """All s outer butterfly stages on an [L, TB, R, W] column chunk.

    Butterflies pair rows (sublane axis) at distance d = R>>(i+1) via masked
    pltpu.roll along axis 1 of the per-limb (TB, R, W) block; the positioned
    twiddle tables carry w^(2^i * (lo*Mi + c)) at every row (fwd: 1 at
    a-rows).  Negacyclic scaling (psi twist fwd / psi^-k * M^-1 post inv) and
    the cyclic inverse's M^-1 fold in here so the inner pass stays unscaled."""
    s = R.bit_length() - 1
    L = len(primes)

    def kernel(x_ref, tw_ref, tw_sh_ref, sc_ref, sc_sh_ref, out_ref):
        r_idx = jax.lax.broadcasted_iota(jnp.uint32, (TB, R, W), 1)
        for l in range(L):
            p = jnp.uint32(primes[l])
            x = x_ref[l]  # (TB, R, W)
            if not inverse:
                if negacyclic:
                    x = _shoup_mul(x, sc_ref[l], sc_sh_ref[l], p)
                for i in range(s):
                    # r3 form (see the gridfree fwd note: the single-multiply
                    # variant measured slower on chip)
                    d = R >> (i + 1)
                    is_a = (r_idx & jnp.uint32(2 * d - 1)) < d
                    pf = pltpu.roll(x, jnp.int32(R - d), 1)  # x[r+d] at r
                    pb = pltpu.roll(x, jnp.int32(d), 1)  # x[r-d] at r
                    na = _addmod(x, pf, p)
                    sub = _submod(pb, x, p)
                    nb = _shoup_mul(sub, tw_ref[l, i], tw_sh_ref[l, i], p)
                    x = jnp.where(is_a, na, nb)
            else:
                for i in range(s - 1, -1, -1):
                    # multiply-then-roll: one Shoup per stage (pairs share
                    # the twiddle index)
                    d = R >> (i + 1)
                    is_a = (r_idx & jnp.uint32(2 * d - 1)) < d
                    m = _shoup_mul(x, tw_ref[l, i], tw_sh_ref[l, i], p)
                    a_new = _addmod(x, pltpu.roll(m, jnp.int32(R - d), 1), p)
                    b_new = _submod(pltpu.roll(x, jnp.int32(d), 1), m, p)
                    x = jnp.where(is_a, a_new, b_new)
                if negacyclic:
                    x = _shoup_mul(x, sc_ref[l], sc_sh_ref[l], p)
                else:
                    x = _shoup_mul(
                        x, jnp.uint32(minv[l]), jnp.uint32(minv_sh[l]), p
                    )
            out_ref[l] = x

    return kernel


def _pick_w(R: int, tb: int, Mi: int) -> int:
    """Largest power-of-two column width with the x block <= ~1 MiB."""
    w = max(1, (1 << 18) // (tb * R * 4))
    w = 1 << (w.bit_length() - 1)
    return max(LANE, min(Mi, w))


def _outer_pass(xr, tables: SplitNTTTables, tb: int, inverse: bool,
                negacyclic: bool, interpret: bool):
    """xr: [L, B, R, Mi] -> same shape with all outer stages applied."""
    L, B, R, Mi = xr.shape
    s = tables.s
    W = _pick_w(R, tb, Mi)
    kernel = _outer_kernel(R, tb, W, tables.primes, inverse, negacyclic,
                           tables.minv, tables.minv_sh)
    tw = tables.inv_tw if inverse else tables.fwd_tw  # np [L, s, R, Mi]
    tw_sh = tables.inv_tw_sh if inverse else tables.fwd_tw_sh
    sc = tables.psiinv_s if inverse else tables.psi  # np [L, R, Mi]
    sc_sh = tables.psiinv_s_sh if inverse else tables.psi_sh

    out_b = []
    for b0 in range(0, B, tb):
        out_c = []
        for c0 in range(0, Mi, W):
            call = pl.pallas_call(
                kernel,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((L, tb, R, W), jnp.uint32),
                interpret=interpret,
            )
            out_c.append(
                call(
                    xr[:, b0 : b0 + tb, :, c0 : c0 + W],
                    jnp.asarray(tw[:, :, :, c0 : c0 + W]),
                    jnp.asarray(tw_sh[:, :, :, c0 : c0 + W]),
                    jnp.asarray(sc[:, :, c0 : c0 + W]),
                    jnp.asarray(sc_sh[:, :, c0 : c0 + W]),
                )
            )
        out_b.append(
            jnp.concatenate(out_c, axis=-1) if len(out_c) > 1 else out_c[0]
        )
    return jnp.concatenate(out_b, axis=1) if len(out_b) > 1 else out_b[0]


@partial(jax.jit, static_argnames=("tables", "tb", "inverse", "negacyclic", "interpret"))
def ntt_split_pallas(x, tables: SplitNTTTables, tb: int = 8,
                     inverse: bool = False, negacyclic: bool = True,
                     interpret: bool = False):
    """x: uint32[B, L, M] with B % tb == 0; split transform (see block doc)."""
    B, L, M = x.shape
    R, Mi = tables.R, tables.Mi
    assert M == tables.M and L == tables.L and B % tb == 0
    xt = jnp.transpose(x, (1, 0, 2))  # [L, B, M]
    if not inverse:
        xr = xt.reshape(L, B, R, Mi)
        xr = _outer_pass(xr, tables, tb, False, negacyclic, interpret)
        xi = xr.reshape(L, B * R, Mi)
        xi = _apply_lbm(xi, tables.inner, tb, inverse=False, negacyclic=False,
                        interpret=interpret)
        out = xi.reshape(L, B, M)
    else:
        xi = xt.reshape(L, B * R, Mi)
        xi = _apply_lbm(xi, tables.inner, tb, inverse=True, negacyclic=False,
                        interpret=interpret, scale=False)
        xr = xi.reshape(L, B, R, Mi)
        xr = _outer_pass(xr, tables, tb, True, negacyclic, interpret)
        out = xr.reshape(L, B, M)
    return jnp.transpose(out, (1, 0, 2))
