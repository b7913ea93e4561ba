"""Seeded-CRS ringGroth16: HBM-resident c0, PRNG-regenerated c1, scan MAC.

The north-star configuration (2^16..2^18 constraints) makes the CRS the
memory problem: each E(s^i) is a full inner ciphertext, so even c0 alone is
gigabytes.  Three design moves make large M fit a single chip (DESIGN.md §8):

* **seeded ciphertexts** — in symmetric BGV the second component c1 = a is
  uniform, so it is stored as a PRNG key and regenerated on device inside the
  prover kernel (SEAL ships the same trick for its public keys /
  serializable ciphertexts).  Halves CRS residency and host<->device bytes.
* **slab scan** — the prover's inner products run as a `lax.scan` over fixed
  slabs of the CRS batch axis, so peak memory is one slab of temporaries,
  not the 4D product array.  The lazy u64 accumulation is exact, and the
  canonical Barrett reduction at the end makes the result bit-identical to
  the unseeded `encoding.inner_product` path regardless of slab size.
* **level-0 accumulation** — see `encoding.inner_product`: the modswitch
  schedule runs once on the final sums, never per term.

Mirrors the CRS/proof structure of `/root/reference/ringsnark/
zk_proof_systems/groth16/groth16.tcc:5-115`; the streaming layout replaces
the reference's in-RAM `vector<EncT>` CRS.

PRNG convention: slab i of an encoding batch draws its randomness from
`fold_in(key, i)`, split exactly as `bgv._encrypt_kernel` splits — so c1 of
slab i is `_sample_uniform(ctx, split(fold_in(key, i))[0], (slab,))`.  Any
typed key impl works; benches pass `jax.random.key(seed,
impl='threefry2x32')`: measured r5 on chip (chip_logs/probe_mac_r05.log,
65536-row chunk, L'=3, N'=4096), an rbg key's RngBitGenerator op inside the
MAC scan body costs ~360 ms of stall per chunk that threefry does not
(2-pt MAC: 104 ms threefry vs 453 ms rbg; same encode speed) — the r3 note
that "threefry regen would dominate the MAC" had it exactly backwards.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..encoding import Encoding, encode, keygen
from ..encoding.bgv import (
    _encrypt_from_m,
    _encrypt_kernel,
    _lift_centered,
    _sample_uniform,
    plain_to_inner_ntt,
)
from ..encoding.context import EncodingContext
from ..ops.modops import mul_mod, add_mod, barrett_reduce_u64
from ..reductions.r1cs_to_qrp import (
    r1cs_to_qrp_instance_map_with_evaluation,
    _pa_batches,
    prover_witness_map_chunked,
)
from ..relations.r1cs import CompiledR1CS
from ..rings.elem import RingElem
from ..utils.domain import RootsDomain
from ..utils.poly_arr import ring_batch_scale
from .api import KeyPair, SnarkParams
from .groth16 import Proof, VerificationKey
from .pipeline import groth16_proof_levels

__all__ = [
    "SeededEncoding",
    "SeededProvingKey",
    "encode_seeded",
    "seeded_inner_product",
    "generator_seeded",
    "prover_seeded",
]

DEFAULT_SLAB = 4096


def _slab_c1_key(key, i):
    """The c1 (= uniform a) key for slab i, matching _encrypt_kernel's split."""
    return jax.random.split(jax.random.fold_in(key, i))[0]


@dataclass
class SeededEncoding:
    """A CRS encoding batch with only c0 materialized.

    c0: uint32[B_pad, L, L', N'] (B_pad a multiple of `slab`); c1 of slab i is
    regenerated from the key (see module docstring).  `batch` is the true
    (unpadded) length; padded rows are encryptions of 0 and are always paired
    with zero plaintext coefficients in the MACs.
    """

    ctx: EncodingContext
    c0: Any
    key: Any
    slab: int
    batch: int
    level: int = 0

    @property
    def nslab(self) -> int:
        return self.c0.shape[0] // self.slab

    def expand(self) -> Encoding:
        """Materialize the full (c0, c1) Encoding — tests / small scales."""
        c1 = _expand_c1(self.ctx, self.key, self.slab, self.nslab)
        return Encoding(
            self.ctx, self.c0[: self.batch], c1[: self.batch], self.level
        )

    def size_in_bits(self) -> int:
        """Stored size: c0 only (c1 is the key)."""
        return self.ctx.size_in_bits(self.batch, self.level) // 2


@partial(jax.jit, static_argnames=("ctx", "slab", "nslab"))
def _expand_c1(ctx: EncodingContext, key, slab: int, nslab: int):
    def step(_, i):
        return None, _sample_uniform(ctx, _slab_c1_key(key, i), (slab,))

    _, c1 = jax.lax.scan(step, None, jnp.arange(nslab))
    return c1.reshape(nslab * slab, ctx.L, ctx.L_inner, ctx.n_inner)


def _pad_slab(arr, slab: int):
    B = arr.shape[0]
    tgt = -(-B // slab) * slab
    if tgt == B:
        return arr
    return jnp.pad(arr, [(0, tgt - B)] + [(0, 0)] * (arr.ndim - 1))


@partial(jax.jit, static_argnames=("ctx", "dense"))
def _encode_slab_kernel(ctx: EncodingContext, s_ntt, data_i, key,
                        dense: bool):
    """c0 of one slab (c1 discarded — regenerated from the key by the MAC)."""
    if dense:
        c0, _c1 = _encrypt_from_m(ctx, s_ntt, data_i, key)
    else:
        c0, _c1 = _encrypt_kernel(ctx, s_ntt, data_i, key)
    return c0


def _encode_seeded_kernel(ctx: EncodingContext, s_ntt, data_pad, key,
                          slab: int, nslab: int):
    # Python loop over slabs, ONE jitted per-slab kernel reused: keeps the
    # error-sampling NTT a TOP-LEVEL Pallas call.  The r3 lax.scan form ran
    # the transform inside the scan body, where it lowered off the fast path
    # (measured: the error leg was 586 of 608 ms per 65536-row chunk —
    # chip_logs/encprof_r04.log); dispatches pipeline on device, so the loop
    # adds no sync overhead.  Slab i still draws from fold_in(key, i) — c1
    # regeneration in the MAC is bit-identical.
    #
    # dense rings: data_pad is the PRE-TRANSFORMED [B, L, L', N'] operand
    # (see `_pre_ntt_chunked`); scalar path: the raw [B, L, 1] slot batch
    # (the NTT-free broadcast happens inside the kernel, so the full
    # [B, L, L', N'] plaintext operand is never materialized in HBM).
    dense = ctx.ring.N > 1
    c0s = [
        _encode_slab_kernel(
            ctx, s_ntt, data_pad[i * slab : (i + 1) * slab],
            jax.random.fold_in(key, i), dense,
        )
        for i in range(nslab)
    ]
    return jnp.concatenate(c0s, axis=0) if len(c0s) > 1 else c0s[0]


def _pre_ntt_chunked(ctx: EncodingContext, arr, chunk: int):
    """plain_to_inner_ntt over row chunks as SEPARATE jit calls.

    One batched transform over a full CRS phase exceeds the Pallas unrolled
    call-volume cap (`ops/ntt._PALLAS_MAX_CALL_UNITS`) and falls back to the
    ~5x-slower XLA path — the r3 dense-mode throughput gap (DESIGN §10).
    Chunked calls compile one small program, reuse it, and stay on the
    kernel; concatenation is exact (rows never interact).
    """
    B = arr.shape[0]
    if B <= chunk:
        return _pre_ntt_kernel(ctx, arr)
    assert B % chunk == 0, (B, chunk)
    return jnp.concatenate(
        [_pre_ntt_kernel(ctx, arr[lo : lo + chunk]) for lo in range(0, B, chunk)],
        axis=0,
    )


def encode_seeded(
    ctx: EncodingContext, sk, rs: RingElem, key, slab: int = DEFAULT_SLAB
) -> SeededEncoding:
    """Encrypt a RingElem batch slab-by-slab, keeping only c0 (+ the key)."""
    slots = rs.res
    B = slots.shape[0]
    slab = min(slab, max(8, B))
    slots_pad = _pad_slab(slots, slab)
    nslab = slots_pad.shape[0] // slab
    data_pad = (
        _pre_ntt_chunked(ctx, slots_pad, slab) if ctx.ring.N > 1 else slots_pad
    )
    c0 = _encode_seeded_kernel(ctx, sk.s_ntt, data_pad, key, slab, nslab)
    return SeededEncoding(ctx=ctx, c0=c0, key=key, slab=slab, batch=B)


# ---------------------------------------------------------------------------
# scan MAC
# ---------------------------------------------------------------------------
#
# Two device paths, bit-identical results (tests/test_seeded.py):
#
# * "u64"  — generic: u64-emulated Barrett multiply + exact u64 lazy sums.
#   Works for any plaintext shape (incl. dense Rq polynomials).
# * "mxu"  — the Z_q fast path (N == 1): each CRS term's plaintext is a
#   SCALAR, so the MAC  sum_i c[i, :] * w[i]  is a vector-matrix product.
#   Decompose both operands into 4 bytes and run u8 x u8 -> i32
#   `dot_general` contractions on the MXU (exact: every byte-product
#   partial sum < 2^31 for slabs <= 8192), then recombine the 16 partials
#   mod p with one Barrett per shift class.  This moves the prover's
#   dominant op from emulated-u64 VPU work onto the systolic array — the
#   reference's OpenMP MAC loop (`rinocchio.tcc:106-163`,
#   `seal/seal_ring.tcc:509-548`) has no analog of this reformulation.
#
# Mode: RINGSNARK_MAC_BACKEND in {auto, mxu, u64}; auto = mxu when the
# scalar fast path applies.


def _mac_mode() -> str:
    import os

    return os.environ.get("RINGSNARK_MAC_BACKEND", "auto")


def _bytes_u32(x):
    """u32[...] -> u8[4, ...] little-endian byte planes."""
    return jnp.stack(
        [((x >> jnp.uint32(8 * k)) & jnp.uint32(0xFF)).astype(jnp.uint8)
         for k in range(4)]
    )


def _mac_slab_mxu(ctx: EncodingContext, c0s, c1s, pt_slabs, p, mu, b):
    """One slab's MACs on the MXU (scalar-plaintext fast path).

    c0s/c1s: [S, L, L', N']; pt_slabs: tuple of [S, L, 1] slot arrays.
    Returns tuple per pt of (m0, m1) canonical uint32 [L, L', N'].
    """
    S = c0s.shape[0]
    L, Lp, Np = ctx.L, ctx.L_inner, ctx.n_inner
    n_pts = len(pt_slabs)
    assert S <= 8192, "byte-product partial sums must stay below 2^31"
    # scalar plaintext lifts [P, S, L, L'] and their byte planes
    w = jnp.stack([_lift_centered(ctx, pt, 0)[..., 0] for pt in pt_slabs])
    wb = _bytes_u32(w)  # [4, P, S, L, L']
    lhs = wb.transpose(3, 4, 1, 0, 2).reshape(L, Lp, n_pts * 4, S)
    cb = _bytes_u32(jnp.stack([c0s, c1s]))  # [4, 2, S, L, L', N']
    rhs = cb.transpose(3, 4, 2, 1, 0, 5).reshape(L, Lp, S, 8 * Np)
    out = jax.lax.dot_general(
        lhs, rhs, (((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.int32,
    )  # [L, L', P*4, 8*N']
    out = out.reshape(L, Lp, n_pts, 4, 2, 4, Np).astype(jnp.uint64)
    # recombine: group byte products by shift class s = j + k, reduce, scale.
    # T layout is [L, L', P, 2, N'] — realign the [L', 1] limb consts to it.
    def align(c):
        return c[:, 0][None, :, None, None, None]  # -> [1, L', 1, 1, 1]

    pA, muA, bA = align(p), align(mu), align(b)
    pw2 = np.stack(
        [
            np.array([(1 << (8 * s)) % q for q in ctx.inner_primes],
                     dtype=np.uint64)
            for s in range(7)
        ]
    )  # [7, L']
    res = jnp.zeros((L, Lp, n_pts, 2, Np), dtype=jnp.uint32)
    for s in range(7):
        terms = [
            out[:, :, :, k, :, j, :]
            for k in range(4)
            for j in range(4)
            if j + k == s
        ]
        T = terms[0]
        for t in terms[1:]:
            T = T + t  # u64 exact: < 4 * 255^2 * 8192 < 2^33
        T = barrett_reduce_u64(T, pA, muA, bA).astype(jnp.uint64)
        T = barrett_reduce_u64(
            T * pw2[s][None, :, None, None, None], pA, muA, bA
        )
        res = add_mod(res, T, pA.astype(jnp.uint32))
    res = res.transpose(2, 3, 0, 1, 4)  # [P, 2, L, L', N']
    return tuple((res[i, 0], res[i, 1]) for i in range(n_pts))


@partial(jax.jit, static_argnames=("ctx", "slab", "n_pts", "mode"))
def _seeded_mac_kernel(
    ctx: EncodingContext, c0, key, pts, slab: int, n_pts: int, mode: str = "u64"
):
    """sum_i E_i * r_i at level 0 for n_pts plaintext batches sharing one CRS.

    c0: [B_pad, L, L', N']; pts: tuple of [B_pad, L, n] slot arrays (zero
    rows beyond each true batch).  Returns tuple of (acc0, acc1) uint32
    [L, L', N'] — bit-identical to Encoding.sum_batch of the expanded path
    (canonical residues; u64 sums exact for B < 2^33).
    """
    B_pad = c0.shape[0]
    nslab = B_pad // slab
    Lp = ctx.L_inner
    c0r = c0.reshape(nslab, slab, *c0.shape[1:])
    ptsr = tuple(p.reshape(nslab, slab, *p.shape[1:]) for p in pts)
    p, mu, b = ctx.inner_consts(0)

    def step_mxu(accs, xs):
        i, c0s = xs[0], xs[1]
        pt_slabs = xs[2:]
        c1s = _sample_uniform(ctx, _slab_c1_key(key, i), (slab,))
        macs = _mac_slab_mxu(ctx, c0s, c1s, pt_slabs, p, mu, b)
        return (
            tuple(
                (add_mod(a0, m0, p), add_mod(a1, m1, p))
                for (a0, a1), (m0, m1) in zip(accs, macs)
            ),
            None,
        )

    if mode == "mxu":
        zero = jnp.zeros((ctx.L, Lp, ctx.n_inner), dtype=jnp.uint32)
        init = tuple((zero, zero) for _ in range(n_pts))
        accs, _ = jax.lax.scan(
            step_mxu, init, (jnp.arange(nslab), c0r) + ptsr
        )
        return accs
    # "u64" (generic slot input) and "dense" (pre-NTT'd operand input) share
    # the same scan body modulo the per-term transform
    accs = _mac_accs_u64(ctx, c0, key, pts, slab, mode)
    return tuple(
        (
            barrett_reduce_u64(a0, p, mu, b),
            barrett_reduce_u64(a1, p, mu, b),
        )
        for a0, a1 in accs
    )


def _mac_accs_u64(ctx, c0, key, pts, slab: int, mode: str, slab0=None,
                  vary_axes=None):
    """The u64-lazy scan accumulators BEFORE the final Barrett.

    Exposed separately so the data-sharded streamed path can psum the exact
    u64 partial sums across devices and reduce once (bit-identical to one
    device for total batches < 2^33).  `slab0` (traced scalar, default 0)
    offsets the PRNG slab index so a device holding rows [lo, hi) of the
    global batch regenerates exactly the same c1 slabs as the unsharded
    kernel (DESIGN.md §5 'data' axis).
    """
    B_pad = c0.shape[0]
    nslab = B_pad // slab
    Lp = ctx.L_inner
    c0r = c0.reshape(nslab, slab, *c0.shape[1:])
    ptsr = tuple(pt.reshape(nslab, slab, *pt.shape[1:]) for pt in pts)
    p, mu, b = ctx.inner_consts(0)
    base = 0 if slab0 is None else slab0

    def step_u64(accs, xs):
        i, c0s = xs[0], xs[1]
        pt_slabs = xs[2:]
        c1s = _sample_uniform(ctx, _slab_c1_key(key, base + i), (slab,))
        out = []
        for (a0, a1), pt_slots in zip(accs, pt_slabs):
            if mode == "dense":
                ptntt = pt_slots  # already [S, L, L', N'] operand form
            else:
                ptntt = plain_to_inner_ntt(ctx, pt_slots)  # [S, L, L', N']
            pr0 = mul_mod(c0s, ptntt, p, mu, b)
            pr1 = mul_mod(c1s, ptntt, p, mu, b)
            out.append(
                (
                    a0 + jnp.sum(pr0.astype(jnp.uint64), axis=0),
                    a1 + jnp.sum(pr1.astype(jnp.uint64), axis=0),
                )
            )
        return tuple(out), None

    zero = jnp.zeros((ctx.L, Lp, ctx.n_inner), dtype=jnp.uint64)
    if vary_axes:  # under shard_map the carry must be device-varying
        zero = jax.lax.pcast(zero, vary_axes, to="varying")
    init = tuple((zero, zero) for _ in range(len(pts)))
    accs, _ = jax.lax.scan(step_u64, init, (jnp.arange(nslab), c0r) + ptsr)
    return accs


@partial(jax.jit, static_argnames=("ctx",))
def _pre_ntt_kernel(ctx: EncodingContext, slots):
    return plain_to_inner_ntt(ctx, slots, level=0)


def seeded_inner_product(
    senc: SeededEncoding, pts: list, use_modswitch: bool = True
) -> list:
    """Inner products of one seeded CRS batch against several plaintext
    coefficient batches ([B, L, n] arrays); same schedule/result as
    `encoding.inner_product` on the expanded CRS."""
    ctx = senc.ctx
    B_pad = senc.c0.shape[0]

    def pad_to(arr):
        # coefficient batches may be shorter than the CRS batch (e.g. the
        # degree-M A/B polynomials have M coefficients vs M+1 powers of s);
        # zero rows make the extra CRS terms exact no-ops.
        assert arr.shape[0] <= B_pad, (arr.shape, senc.c0.shape)
        if arr.shape[0] == B_pad:
            return arr
        return jnp.pad(
            arr, [(0, B_pad - arr.shape[0])] + [(0, 0)] * (arr.ndim - 1)
        )

    pts_pad = tuple(pad_to(p.astype(jnp.uint32)) for p in pts)
    mode = _mac_mode()
    scalar = all(p.shape[-1] == 1 for p in pts_pad) and ctx.ring.N == 1
    if mode == "auto":
        # r5 re-measure under threefry keys: u64 beats the byte-product MXU
        # path at the flagship chunk shape (104 vs 147 ms 2-pt; the r3 "tie"
        # was both modes hiding behind the rbg-in-scan stall).  mxu stays
        # selectable for experiments.
        mode = "u64"
    if mode == "u64" and not scalar and ctx.ring.N > 1:
        # dense (poly-ring) plaintexts: hoist the per-term NTTs out of the
        # scan, slab-chunked so the transform stays on the Pallas kernel
        # (see _pre_ntt_chunked)
        pts_pad = tuple(
            _pre_ntt_chunked(ctx, p_, senc.slab) for p_ in pts_pad
        )
        mode = "dense"
    accs = _seeded_mac_kernel(
        ctx, senc.c0, senc.key, pts_pad, senc.slab, len(pts), mode
    )
    outs = []
    max_level = max(ctx.L_inner - ctx.floor_limbs, 0) if use_modswitch else 0
    for a0, a1 in accs:
        e = Encoding(ctx, a0, a1, 0)
        for _ in range(max_level):
            e = e.modswitch()
        outs.append(e)
    return outs


# ---------------------------------------------------------------------------
# generator / prover
# ---------------------------------------------------------------------------


@dataclass
class SeededProvingKey:
    """groth16 CRS with the three big batches seeded (groth16.hpp:10-48)."""

    compiled: CompiledR1CS
    domain: RootsDomain
    params: SnarkParams
    alpha: Encoding
    beta: Encoding
    s_pows: SeededEncoding
    gamma_io: Encoding
    delta_mid: Optional[SeededEncoding]
    delta_ts: SeededEncoding
    pk_enc: Any = None
    constraint_system: Any = None

    def size_in_bits(self) -> int:
        total = self.alpha.size_in_bits() + self.beta.size_in_bits()
        total += self.gamma_io.size_in_bits()
        for e in (self.s_pows, self.delta_mid, self.delta_ts):
            if e is not None:
                total += e.size_in_bits()
        return total


def generator_seeded(
    cs,
    params: SnarkParams,
    rng: np.random.Generator,
    key,
    slab: int = DEFAULT_SLAB,
) -> KeyPair:
    """Trusted setup with seeded CRS batches (`groth16.tcc:5-67` semantics)."""
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
    combo = (
        ring_batch_scale(qrp.At, beta)
        + ring_batch_scale(qrp.Bt, alpha)
        + qrp.Ct
    )
    n_io = primary_size + 1
    gamma_io_ring = ring_batch_scale(RingElem(ctx, combo.res[:n_io]), gamma_inv)

    keys = jax.random.split(key, 6)
    alpha_enc = encode(params.enc, sk_enc, RingElem.stack([alpha]), keys[0])[0]
    beta_enc = encode(params.enc, sk_enc, RingElem.stack([beta]), keys[1])[0]
    s_pows = encode_seeded(params.enc, sk_enc, s_pows_ring, keys[2], slab)
    gamma_io = encode(params.enc, sk_enc, gamma_io_ring, keys[3])
    delta_mid = None
    if n_aux > 0:
        delta_mid_ring = ring_batch_scale(
            RingElem(ctx, combo.res[n_io:]), delta_inv
        )
        delta_mid = encode_seeded(params.enc, sk_enc, delta_mid_ring, keys[4], slab)
    delta_ts = encode_seeded(params.enc, sk_enc, delta_ts_ring, keys[5], slab)

    pk = SeededProvingKey(
        compiled=comp, domain=domain, params=params,
        alpha=alpha_enc, beta=beta_enc, s_pows=s_pows, gamma_io=gamma_io,
        delta_mid=delta_mid, delta_ts=delta_ts, pk_enc=pk_enc,
        constraint_system=cs_obj,
    )
    vk = VerificationKey(pk=pk, s=s, alpha=alpha, beta=beta, gamma=gamma,
                         delta=delta, sk_enc=sk_enc)
    return KeyPair(pk=pk, vk=vk)


def prover_seeded(
    pk: SeededProvingKey,
    primary_input,
    auxiliary_input,
    rng: np.random.Generator | None = None,
) -> Proof:
    """Prove (`groth16.tcc:69-115`, non-ZK like the reference): witness map
    (one jit) + two scan-MAC passes (s_pows shared by A and B; delta_ts + H
    and delta_mid + aux) + the final modswitch chain."""
    ctx = pk.params.ring
    ectx = pk.params.enc
    ums = pk.params.use_modswitch
    # lazy prover-mode witness map (3 of 9 SpMV+iNTT legs by linearity;
    # see reductions.r1cs_to_qrp.prover_witness_map_chunked)
    p_res, a_res = _pa_batches(ctx, primary_input, auxiliary_input)
    (a_full, b_full, H) = prover_witness_map_chunked(
        pk.compiled, p_res, a_res, pk.domain
    )

    A_ip, B_ip = seeded_inner_product(pk.s_pows, [a_full, b_full], ums)
    (C_ip,) = seeded_inner_product(pk.delta_ts, [H], ums)
    a_enc = A_ip + pk.alpha
    b_enc = B_ip + pk.beta
    c_enc = C_ip
    aux_arr = a_res if a_res.shape[0] > 0 else None
    if aux_arr is not None and pk.delta_mid is not None:
        (mid_ip,) = seeded_inner_product(pk.delta_mid, [aux_arr], ums)
        c_enc = c_enc + mid_ip
    return Proof(A=a_enc, B=b_enc, C=c_enc)
