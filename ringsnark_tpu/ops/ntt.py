"""Batched cyclic / negacyclic NTT over RNS limbs (pure-jnp path).

Replaces the reference's SEAL `ntt_inplace` / `small_ntt_tables` usage and the
O(m^2) interpolation cluster (`/root/reference/ringsnark/util/polynomials.tcc:10-43`,
`util/evaluation_domain.tcc:21-60`) with O(M log M) transforms.

Layout: data shaped ``[..., L, M]`` (L = RNS limbs, M = transform size, a power
of two).  Per-limb twiddles are stacked along the leading L axis.

Ordering convention (bit-reversal-free, Harvey/SEAL style):

* ``cyclic_ntt_rev``: decimation-in-frequency, natural coefficients in →
  **bit-reversed** evaluation order out: output index j holds the evaluation
  at ``w^bitrev(j)``.
* ``cyclic_intt_nat``: decimation-in-time, bit-reversed evaluations in →
  natural coefficients out (scaled by M^-1).

All slot-form data in the framework uses the bit-reversed evaluation labeling,
so no permutation gathers are ever materialized; the mapping slot j ↦
evaluation point is exposed via ``NTTPlan.eval_points`` for the evaluation
domain and tests.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import lru_cache

import numpy as np
import jax.numpy as jnp

from . import primes as _primes
from .modops import add_mod, sub_mod, mul_mod

__all__ = [
    "NTTPlan",
    "get_plan",
    "cyclic_ntt_rev",
    "cyclic_intt_nat",
    "negacyclic_ntt_rev",
    "negacyclic_intt_nat",
    "bitrev_indices",
]


def bitrev_indices(M: int) -> np.ndarray:
    bits = M.bit_length() - 1
    idx = np.arange(M, dtype=np.int64)
    out = np.zeros_like(idx)
    for b in range(bits):
        out |= ((idx >> b) & 1) << (bits - 1 - b)
    return out


def _mod_powers(w: int, n: int, p: int) -> np.ndarray:
    """[1, w, w^2, ..., w^(n-1)] mod p as uint32, via log(n) numpy doublings."""
    pw = np.array([1], dtype=np.uint64)
    while len(pw) < n:
        step = pow(int(w), len(pw), int(p))
        pw = np.concatenate([pw, (pw * step) % p])
    return pw[:n].astype(np.uint32)


@dataclass(frozen=True)
class NTTPlan:
    """Precomputed tables for size-M (neg)acyclic NTTs over a prime chain.

    Hashable/static: jnp arrays are stored in tuples; jitted functions close
    over the plan rather than threading it as a traced argument.
    """

    primes: tuple[int, ...]
    M: int
    # broadcast-ready limb constants, shape [L, 1]
    p: object = field(hash=False, compare=False)
    mu: object = field(hash=False, compare=False)
    pbits: object = field(hash=False, compare=False)
    # forward DIF stage twiddles: tuple over stages (d = M/2 .. 1) of [L, d]
    fwd_tw: tuple = field(hash=False, compare=False)
    # inverse DIT stage twiddles: tuple over stages (d = 1 .. M/2) of [L, d]
    inv_tw: tuple = field(hash=False, compare=False)
    minv: object = field(hash=False, compare=False)  # [L, 1]
    psi: object = field(hash=False, compare=False)  # [L, M] or None
    psi_inv_scaled: object = field(hash=False, compare=False)  # [L, M] * M^-1 or None
    # host-side tables
    w_np: tuple[int, ...] = field(hash=False, compare=False)  # per-limb M-th root
    eval_points_np: object = field(hash=False, compare=False)  # [L, M] uint32: w^bitrev(j)

    @property
    def L(self) -> int:
        return len(self.primes)


@lru_cache(maxsize=None)
def get_plan(primes: tuple[int, ...], M: int, negacyclic: bool = False) -> NTTPlan:
    assert M & (M - 1) == 0 and M >= 2
    L = len(primes)
    for p in primes:
        order = 2 * M if negacyclic else M
        assert (p - 1) % order == 0, f"prime {p} lacks order-{order} roots"

    p_np = np.array(primes, dtype=np.uint32)
    pr = [_primes.make_prime(p) for p in primes]
    mu_np = np.array([x.mu for x in pr], dtype=np.uint64)
    bits_np = np.array([x.bits for x in pr], dtype=np.uint32)

    ws = [_primes.root_of_unity(p, M) for p in primes]
    w_pows = np.stack([_mod_powers(w, M, p) for w, p in zip(ws, primes)])  # [L, M]
    winv_pows = np.stack(
        [_mod_powers(pow(w, p - 2, p), M, p) for w, p in zip(ws, primes)]
    )

    logM = M.bit_length() - 1
    fwd_tw = []
    for s in range(logM):
        d = M >> (s + 1)
        stride = M // (2 * d)
        fwd_tw.append(np.ascontiguousarray(w_pows[:, : d * stride : stride]))  # [L, d]
    inv_tw = []
    for s in range(logM):
        d = 1 << s
        stride = M // (2 * d)
        inv_tw.append(np.ascontiguousarray(winv_pows[:, : d * stride : stride]))

    minv_np = np.array([pow(M, p - 2, p) for p in primes], dtype=np.uint32)

    psi = psi_inv_scaled = None
    if negacyclic:
        psis = [_primes.root_of_unity(p, 2 * M) for p in primes]
        # choose psi with psi^2 = w so the twist matches the cyclic tables
        psis2 = []
        for psi_c, w, p in zip(psis, ws, primes):
            if pow(psi_c, 2, p) == w:
                psis2.append(psi_c)
            else:
                # find k odd with psi^k matching: psi^2 has order M, both are
                # primitive M-th roots, so w = (psi^2)^k for some k; re-root.
                k = _dlog_pow2(pow(psi_c, 2, p), w, p, M)
                psis2.append(pow(psi_c, k, p))
                assert pow(psis2[-1], 2, p) == w
        psi_pows = np.stack([_mod_powers(s, M, p) for s, p in zip(psis2, primes)])
        psiinv_pows = np.stack(
            [_mod_powers(pow(s, p - 2, p), M, p) for s, p in zip(psis2, primes)]
        )
        psiinv_scaled = (psiinv_pows.astype(np.uint64) * minv_np[:, None]) % p_np[
            :, None
        ].astype(np.uint64)
        psi = psi_pows
        psi_inv_scaled = psiinv_scaled.astype(np.uint32)

    br = bitrev_indices(M)
    eval_points = w_pows[:, br]  # [L, M]: point for slot j

    # all tables are numpy (constants under jit; see rings/context.py note)
    return NTTPlan(
        primes=primes,
        M=M,
        p=p_np[:, None],
        mu=mu_np[:, None],
        pbits=bits_np[:, None],
        fwd_tw=tuple(fwd_tw),
        inv_tw=tuple(inv_tw),
        minv=minv_np[:, None],
        psi=psi,
        psi_inv_scaled=psi_inv_scaled,
        w_np=tuple(ws),
        eval_points_np=eval_points,
    )


def _dlog_pow2(base: int, target: int, p: int, order: int) -> int:
    """Solve base^k = target mod p where base has power-of-two order (small)."""
    x = 1
    for k in range(order):
        if x == target:
            return k
        x = x * base % p
    raise ValueError("discrete log not found")


def _c(arr, extra_dims: int):
    """Reshape a [L, d] limb-constant for broadcasting over extra block dims."""
    return arr.reshape(arr.shape[0], *([1] * extra_dims), arr.shape[1])


def cyclic_ntt_rev(x, plan: NTTPlan):
    """Forward cyclic NTT along the last axis; natural in, bit-reversed out."""
    routed = _pallas_route(x, plan, inverse=False, negacyclic=False)
    if routed is not None:
        return routed
    M = plan.M
    batch = x.shape[:-1]  # (..., L)
    p, mu, b = plan.p, plan.mu, plan.pbits
    for s, tw in enumerate(plan.fwd_tw):
        d = M >> (s + 1)
        nb = M // (2 * d)
        xr = x.reshape(*batch, nb, 2, d)
        a_, b_ = xr[..., 0, :], xr[..., 1, :]
        p3, mu3, b3 = p[..., None, :] , mu[..., None, :], b[..., None, :]
        na = add_mod(a_, b_, p3)
        nb_ = mul_mod(sub_mod(a_, b_, p3), tw[:, None, :], p3, mu3, b3)
        x = jnp.stack([na, nb_], axis=-2).reshape(*batch, M)
    return x


def cyclic_intt_nat(x, plan: NTTPlan, scale: bool = True):
    """Inverse cyclic NTT along the last axis; bit-reversed in, natural out."""
    if scale:  # scale=False is an internal composition step — XLA path only
        routed = _pallas_route(x, plan, inverse=True, negacyclic=False)
        if routed is not None:
            return routed
    M = plan.M
    batch = x.shape[:-1]
    p, mu, b = plan.p, plan.mu, plan.pbits
    for s, tw in enumerate(plan.inv_tw):
        d = 1 << s
        nb = M // (2 * d)
        xr = x.reshape(*batch, nb, 2, d)
        a_, b_ = xr[..., 0, :], xr[..., 1, :]
        p3, mu3, b3 = p[..., None, :], mu[..., None, :], b[..., None, :]
        t = mul_mod(b_, tw[:, None, :], p3, mu3, b3)
        na = add_mod(a_, t, p3)
        nb_ = sub_mod(a_, t, p3)
        x = jnp.stack([na, nb_], axis=-2).reshape(*batch, M)
    if scale:
        x = mul_mod(x, plan.minv, p, mu, b)
    return x


def negacyclic_ntt_rev(x, plan: NTTPlan):
    """Negacyclic forward NTT: psi-twist then cyclic; natural in, rev out."""
    assert plan.psi is not None, "plan built without negacyclic=True"
    routed = _pallas_route(x, plan, inverse=False, negacyclic=True)
    if routed is not None:
        return routed
    x = mul_mod(x, plan.psi, plan.p, plan.mu, plan.pbits)
    return cyclic_ntt_rev(x, plan)


def negacyclic_intt_nat(y, plan: NTTPlan):
    """Negacyclic inverse NTT: cyclic inverse then psi^-1 twist (M^-1 folded)."""
    assert plan.psi_inv_scaled is not None
    routed = _pallas_route(y, plan, inverse=True, negacyclic=True)
    if routed is not None:
        return routed
    x = cyclic_intt_nat(y, plan, scale=False)
    return mul_mod(x, plan.psi_inv_scaled, plan.p, plan.mu, plan.pbits)


# ---------------------------------------------------------------------------
# Pallas TPU backend routing
# ---------------------------------------------------------------------------
# RINGSNARK_NTT_BACKEND = auto (default: Pallas on TPU) | pallas | xla

import os as _os

_NTT_BACKEND = _os.environ.get("RINGSNARK_NTT_BACKEND", "auto")


def set_backend(name: str) -> str:
    """Runtime routing override ('auto' | 'pallas' | 'xla').

    Read at trace time: functions jit-compiled AFTER this call bake the
    selected path (used by bench.py to time the true u64-emulating XLA path
    against the Pallas kernel without a subprocess).  Returns the previous
    value so callers can restore it.
    """
    global _NTT_BACKEND
    assert name in ("auto", "pallas", "xla"), name
    prev = _NTT_BACKEND
    _NTT_BACKEND = name
    return prev


# r3 chip sweep (chip_logs/BENCH_NTT_r03_tb.log): tb=32 is fastest for the
# north-star shape (135.8 us/batch lbm vs 146.1 at tb=8) even though the
# scoped-VMEM model then chunks limbs singly
_PALLAS_TB = int(_os.environ.get("RINGSNARK_PALLAS_TB", 32))
# Scoped-VMEM model for the grid-free kernel, fitted to Mosaic's reported
# allocations (r3: blm [8,4,16384] block = 19.59M -> C~14; lbm [1,32,16384]
# block = 18.94M -> C~6):
#   bytes(Lc, tb) = 4*M*(2*Lc*stages [twiddles] + 2*Lc [scale rows]
#                   + 2*Lc*tb [io blocks] + C*tb [live stage temps])
# Chunk the limb axis — and shrink tb — to stay under the cap.
_PALLAS_VMEM_BYTES = int(_os.environ.get("RINGSNARK_PALLAS_VMEM", 14_500_000))
_PALLAS_TEMP_ROWS = {"blm": 14, "lbm": 7}


def _gridfree_plan(m_eff: int, L: int, tb: int, layout: str = "lbm"):
    """Largest (tb, limbs-per-call) fitting the scoped-VMEM cap.

    Returns None when even the minimal (tb=8, lc=1) block exceeds the cap —
    the caller must fall back to the XLA path.  A non-power-of-two
    RINGSNARK_PALLAS_TB is rounded down to a power-of-two multiple of 8 so
    halving preserves the tb % 8 == 0 kernel invariant.
    """
    stages = m_eff.bit_length() - 1
    C = _PALLAS_TEMP_ROWS.get(layout, 14)
    tb = max(8, 1 << (max(tb, 8).bit_length() - 1))

    def bytes_(lc, tb_):
        return 4 * m_eff * (2 * lc * stages + 2 * lc + 2 * lc * tb_ + C * tb_)

    while tb > 8 and bytes_(1, tb) > _PALLAS_VMEM_BYTES:
        tb //= 2
    if bytes_(1, tb) > _PALLAS_VMEM_BYTES:
        return None
    lc = 1
    while lc < L and bytes_(lc + 1, tb) <= _PALLAS_VMEM_BYTES:
        lc += 1
    return tb, lc
# Largest M the grid-free single-program kernel can hold: the Mosaic scoped-
# VMEM stack grows ~linearly with M (measured: 37.4 MB at M=131072 vs the
# 16 MB limit => ~9.4 MB at 32768).  Above this, route through the split
# (outer-stages + folded inner batch) path with inner size _SPLIT_MI.
_GRIDFREE_MAX_M = int(_os.environ.get("RINGSNARK_PALLAS_MAX_GRIDFREE_M", 32768))
_SPLIT_MI = int(_os.environ.get("RINGSNARK_PALLAS_SPLIT_MI", 16384))
# The remote compiler rejects gridded pallas_call, so batches unroll into
# sequential calls whose compiled bodies are NOT deduplicated: at Rq witness-
# map shapes (batch 8192, M'=16384) the program serialized to 4.77 GB and
# failed ("Failed to serialize TpuExecutableProto").  Cap the unrolled
# call-volume estimate (calls * limb-chunks * stage-size); past it, the XLA
# path compiles O(graph)-sized programs and stays the honest fallback.
_PALLAS_MAX_CALL_UNITS = int(
    _os.environ.get("RINGSNARK_PALLAS_MAX_CALL_UNITS", 1 << 23)
)


def _pallas_route(x, plan: NTTPlan, inverse: bool, negacyclic: bool):
    """Try the fused Pallas kernel; return None to fall back to the XLA path."""
    if _NTT_BACKEND == "xla":
        return None
    M = plan.M
    if M < 256 or M % 128:
        return None
    if _NTT_BACKEND == "auto":
        try:
            import jax

            if jax.default_backend() != "tpu":
                return None
        except Exception:
            return None
    for p in plan.primes:
        if (p - 1) % (2 * M):
            return None  # tables need the negacyclic root even for cyclic use
    from . import pallas_ntt as _pn

    split = M > _GRIDFREE_MAX_M
    if split and M % _SPLIT_MI:
        return None
    if not split:
        fn = {
            (False, True): _pn.negacyclic_ntt_rev_pallas,
            (True, True): _pn.negacyclic_intt_nat_pallas,
            (False, False): _pn.cyclic_ntt_rev_pallas,
            (True, False): _pn.cyclic_intt_nat_pallas,
        }[(inverse, negacyclic)]

    L = x.shape[-2]
    assert L == len(plan.primes)
    lead = x.shape[:-2]
    B0 = 1
    for dim in lead:
        B0 *= dim
    xr = x.reshape(B0, L, M)
    # tb + limb-chunk plan under the scoped-VMEM cap (tb shrinks first)
    m_eff = _SPLIT_MI if split else M
    plan_tb = _gridfree_plan(m_eff, L, _PALLAS_TB, _pn._LAYOUT)
    if plan_tb is None:
        return None  # no block fits scoped VMEM; use XLA
    tb, max_lc = plan_tb
    pad = (-B0) % tb
    if pad:
        xr = jnp.pad(xr, ((0, pad), (0, 0), (0, 0)))
    n_calls = ((B0 + pad) // tb) * -(-L // max_lc)
    if n_calls * m_eff > _PALLAS_MAX_CALL_UNITS:
        return None  # unrolled program would be too large; use XLA
    outs = []
    for lo in range(0, L, max_lc):
        sub = tuple(plan.primes[lo : lo + max_lc])
        if split:
            tables = _pn.get_split_tables(sub, M, _SPLIT_MI)
            outs.append(
                _pn.ntt_split_pallas(
                    xr[:, lo : lo + max_lc, :], tables, tb,
                    inverse=inverse, negacyclic=negacyclic,
                )
            )
        else:
            tables = _pn.get_pallas_tables(sub, M)
            outs.append(fn(xr[:, lo : lo + max_lc, :], tables, tb))
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)
    if pad:
        out = out[:B0]
    return out.reshape(*lead, L, M)
