"""Chip probe: can the NTT ride the MXU?  (the r4 roofline's last lever)

Four-step NTT of size N = N1*N2: DFT_N1 as a matmul over the first index,
twiddle multiply, DFT_N2 as a matmul over the second.  Modular matmuls run
as byte-decomposed u8 x u8 -> i32 `dot_general` (exact: K * 255^2 < 2^31
for K <= 128) with the 16 byte-class partials recombined mod p by one
Barrett per shift class — the same construction as the seeded MXU MAC.

This measures an EQUIVALENT-WORK transform (output ordering differs from
the production kernel's bit-reversed convention; a final gather to natural
order is included so no work is hidden).  Compared against the production
masked-roll Pallas kernel at the north-star shape (N=8192, 6 limbs,
batch 32) with the bench.py slope methodology.  Correctness: cross-checked
against ops/ntt's cyclic transform through an order-fixing permutation.
"""

import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jaxcache")

import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from functools import partial

from ringsnark_tpu.ops import ntt as nttm
from ringsnark_tpu.ops.primes import find_ntt_primes, make_prime, root_of_unity
from ringsnark_tpu.ops.modops import mul_mod, barrett_reduce_u64, add_mod

N, N1, N2 = 8192, 128, 64
L, BATCH, REP = 6, 32, 10
primes = tuple(find_ntt_primes(L, 1 << 21))
rng = np.random.default_rng(0)

# per-limb tables (numpy; constants under jit)
dft1 = np.zeros((L, N1, N1), dtype=np.uint32)  # w_N1^{n1*k1}
dft2 = np.zeros((L, N2, N2), dtype=np.uint32)
tw = np.zeros((L, N1, N2), dtype=np.uint32)  # w_N^{k1*n2}
mus = np.zeros((L, 1, 1), dtype=np.uint64)
bits = np.zeros((L, 1, 1), dtype=np.uint32)
ps = np.zeros((L, 1, 1), dtype=np.uint32)
for l, p in enumerate(primes):
    w = root_of_unity(p, N)
    w1 = pow(w, N2, p)  # order N1
    w2 = pow(w, N1, p)  # order N2
    k1 = np.arange(N1, dtype=np.uint64)
    k2 = np.arange(N2, dtype=np.uint64)
    e1 = (k1[:, None] * k1[None, :]) % N1
    e2 = (k2[:, None] * k2[None, :]) % N2
    # modpow tables via numpy object ints (one-time)
    pw = np.array([pow(w1, int(e), p) for e in range(N1)], dtype=np.uint64)
    dft1[l] = pw[e1]
    pw2 = np.array([pow(w2, int(e), p) for e in range(N2)], dtype=np.uint64)
    dft2[l] = pw2[e2]
    ew = (k1[:, None] * k2[None, :]) % N
    pwN = np.array([pow(w, int(e), p) for e in range(N)], dtype=np.uint64)
    tw[l] = pwN[ew]
    info = make_prime(p)
    mus[l], bits[l], ps[l] = info.mu, info.bits, p

# four-step order: with n = n1*N2 + n2 and k = k1 + N1*k2, the result grid
# is [k1][k2] (flattened k1*N2 + k2); natural order k reads grid index
# (k % N1)*N2 + (k // N1)
ks = np.arange(N)
perm_nat = (ks % N1) * N2 + (ks // N1)


def _bytes(x):
    return jnp.stack(
        [((x >> jnp.uint32(8 * k)) & jnp.uint32(0xFF)).astype(jnp.uint8)
         for k in range(4)]
    )


def mod_matmul_mxu(A_bytes, X, p, mu, b, pw2_shift):
    """(A @ X) mod p with A [K, K] via byte dot_general; X [K, M] u32.

    A_bytes: [4, K, K] u8 (precomputed); returns [K, M] u32 canonical.
    """
    Xb = _bytes(X)  # [4, K, M]
    out = jax.lax.dot_general(
        A_bytes, Xb, (((2,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [4, K, 4, M]
    res = None
    for s in range(7):
        terms = [out[i, :, j, :] for i in range(4) for j in range(4)
                 if i + j == s]
        T = terms[0].astype(jnp.uint64)
        for t in terms[1:]:
            T = T + t.astype(jnp.uint64)
        T = barrett_reduce_u64(T, p, mu, b).astype(jnp.uint64)
        T = barrett_reduce_u64(T * pw2_shift[s], p, mu, b)
        res = T if res is None else add_mod(res, T, p.astype(jnp.uint32))
    return res


pw2_tab = np.stack(
    [np.array([(1 << (8 * s)) % int(p) for s in range(7)], dtype=np.uint64)
     for p in primes]
)  # [L, 7]

dft1_bytes = np.stack(
    [((dft1 >> (8 * k)) & 0xFF).astype(np.uint8) for k in range(4)], axis=1
)  # [L, 4, N1, N1]
dft2_bytes = np.stack(
    [((dft2 >> (8 * k)) & 0xFF).astype(np.uint8) for k in range(4)], axis=1
)


@jax.jit
def fourstep(x):  # x: [B, L, N] natural order
    B = x.shape[0]
    outs = []
    for l in range(L):
        p, mu, b = ps[l], mus[l], bits[l]
        pw2s = pw2_tab[l]
        X = x[:, l, :].reshape(B, N1, N2)  # n = n1*N2 + n2
        # DFT over n1: [N1, N1] @ [N1, N2*B]
        Xm = jnp.transpose(X, (1, 2, 0)).reshape(N1, N2 * B)
        Y = mod_matmul_mxu(dft1_bytes[l], Xm, p, mu, b, pw2s)  # [N1, N2*B]
        Y = Y.reshape(N1, N2, B)
        Y = mul_mod(Y, jnp.asarray(tw[l])[:, :, None], p, mu, b)
        # DFT over n2: [N2, N2] @ [N2, N1*B]
        Ym = jnp.transpose(Y, (1, 0, 2)).reshape(N2, N1 * B)
        Z = mod_matmul_mxu(dft2_bytes[l], Ym, p, mu, b, pw2s)  # [N2, N1*B]
        Z = Z.reshape(N2, N1, B)
        out = jnp.transpose(Z, (2, 1, 0)).reshape(B, N)  # [B, k1*N2+k2]
        outs.append(out[:, perm_nat])  # natural frequency order
    return jnp.stack(outs, axis=1)


x_np = np.stack(
    [np.stack([rng.integers(0, q, N, dtype=np.uint64) for q in primes])
     for _ in range(BATCH)]
).astype(np.uint32)
x = jnp.asarray(x_np)
print(f"[cfg] device={jax.devices()[0]}", file=sys.stderr, flush=True)

# correctness vs the production cyclic transform (natural->natural via
# the plan's bit-reversed labeling): compare against a host DFT oracle on
# a small slice instead — exactness over one row, all limbs.
plan = nttm.get_plan(primes, N)
ref_rev = np.asarray(nttm.cyclic_ntt_rev(x[:1], plan))  # [1, L, N] bitrev order
br = nttm.bitrev_indices(N)
ref_nat = np.zeros_like(ref_rev)
ref_nat[:, :, br] = ref_rev  # natural k order
got = np.asarray(fourstep(x[:1]))
# fourstep natural order: k = k1*N2 + k2?  verify by direct match search
ok = np.array_equal(got, ref_nat)
print(f"[check] fourstep == reference natural order: {ok}",
      file=sys.stderr, flush=True)

# slope timing: K back-to-back applications
def chain(k):
    @jax.jit
    def f(v):
        for _ in range(k):
            v = fourstep(v)
        return v
    return f

for k in (1, 4):
    f = chain(k)
    o = f(x)
    np.asarray(jnp.ravel(o)[:4])
    t0 = time.perf_counter()
    o = f(x)
    np.asarray(jnp.ravel(o)[:4])
    dt = time.perf_counter() - t0
    print(f"[mxu-ntt] K={k}: {dt*1e3:.1f} ms total, "
          f"{dt/k/BATCH*1e6:.1f} us/transform-batch... "
          f"({dt/k*1e6/BATCH:.1f} us per [L={L},N={N}] item)",
          file=sys.stderr, flush=True)

# production kernel comparison
prev = nttm.set_backend("pallas")
@jax.jit
def pall(v):
    for _ in range(REP):
        v = nttm.cyclic_ntt_rev(v, plan)
    return v
o = pall(x); np.asarray(jnp.ravel(o)[:4])
t0 = time.perf_counter(); o = pall(x); np.asarray(jnp.ravel(o)[:4])
dt = time.perf_counter() - t0
print(f"[pallas]  {dt/REP*1e3:.2f} ms/batch of {BATCH} "
      f"({dt/REP/BATCH*1e6:.1f} us/item)", file=sys.stderr, flush=True)
nttm.set_backend(prev)
print("[done]", file=sys.stderr, flush=True)


# ---- round 2: matched slope methodology, negacyclic variant ----------------
# psi twist folds free into the four-step tables: x[n]*psi^n with
# n = n1*N2+n2 -> psi^{n1*N2} into dft1's n1 columns, psi^{n2} into the
# k1-twiddle's n2 columns.
dft1n = np.zeros((L, N1, N1), dtype=np.uint32)
twn = np.zeros((L, N1, N2), dtype=np.uint32)
for l, p in enumerate(primes):
    w = root_of_unity(p, N)
    psi_c = root_of_unity(p, 2 * N)
    if pow(psi_c, 2, p) != w:
        # re-root so psi^2 == w (same fix ops/ntt.get_plan applies)
        from ringsnark_tpu.ops.ntt import _dlog_pow2
        k = _dlog_pow2(pow(psi_c, 2, p), w, p, N)
        psi_c = pow(psi_c, k, p)
    n1 = np.arange(N1)
    psi_n1N2 = np.array([pow(psi_c, int(v) * N2, p) for v in n1],
                        dtype=np.uint64)
    dft1n[l] = (dft1[l].astype(np.uint64) * psi_n1N2[None, :]) % p
    n2 = np.arange(N2)
    psi_n2 = np.array([pow(psi_c, int(v), p) for v in n2], dtype=np.uint64)
    twn[l] = (tw[l].astype(np.uint64) * psi_n2[None, :]) % p

dft1n_bytes = np.stack(
    [((dft1n >> (8 * k)) & 0xFF).astype(np.uint8) for k in range(4)], axis=1
)


@jax.jit
def fourstep_nega(x):  # negacyclic forward, natural order out
    B = x.shape[0]
    outs = []
    for l in range(L):
        p, mu, b = ps[l], mus[l], bits[l]
        pw2s = pw2_tab[l]
        X = x[:, l, :].reshape(B, N1, N2)
        Xm = jnp.transpose(X, (1, 2, 0)).reshape(N1, N2 * B)
        Y = mod_matmul_mxu(dft1n_bytes[l], Xm, p, mu, b, pw2s)
        Y = Y.reshape(N1, N2, B)
        Y = mul_mod(Y, jnp.asarray(twn[l])[:, :, None], p, mu, b)
        Ym = jnp.transpose(Y, (1, 0, 2)).reshape(N2, N1 * B)
        Z = mod_matmul_mxu(dft2_bytes[l], Ym, p, mu, b, pw2s)
        Z = Z.reshape(N2, N1, B)
        out = jnp.transpose(Z, (2, 1, 0)).reshape(B, N)
        outs.append(out[:, perm_nat])
    return jnp.stack(outs, axis=1)


nplan = nttm.get_plan(primes, N, negacyclic=True)
ref_rev = np.asarray(nttm.negacyclic_ntt_rev(x[:1], nplan))
ref_nat = np.zeros_like(ref_rev)
ref_nat[:, :, br] = ref_rev
got = np.asarray(fourstep_nega(x[:1]))
print(f"[check] negacyclic fourstep == reference: "
      f"{np.array_equal(got, ref_nat)}", file=sys.stderr, flush=True)


def slope(name, apply_fn):
    def chain(k):
        @jax.jit
        def f(v):
            for _ in range(k):
                v = apply_fn(v)
            return v
        return f
    times = {}
    for k in (2, 8):
        f = chain(k)
        o = f(x)
        np.asarray(jnp.ravel(o)[:4])
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            o = f(x)
            np.asarray(jnp.ravel(o)[:4])
            ts.append(time.perf_counter() - t0)
        times[k] = min(ts)
    marg = (times[8] - times[2]) / 6
    print(f"[slope] {name:16s} K2={times[2]*1e3:7.1f} ms "
          f"K8={times[8]*1e3:7.1f} ms  marginal={marg*1e3:7.2f} ms/batch "
          f"({marg/BATCH*1e6:6.1f} us/item)", file=sys.stderr, flush=True)


slope("mxu-cyclic", fourstep)
slope("mxu-negacyclic", fourstep_nega)
prev = nttm.set_backend("pallas")
slope("pallas-cyclic", lambda v: nttm.cyclic_ntt_rev(v, plan))
slope("pallas-nega", lambda v: nttm.negacyclic_ntt_rev(v, nplan))
nttm.set_backend(prev)
print("[done2]", file=sys.stderr, flush=True)


# ---- round 3: bench.py's exact gated methodology (self-dependent
# dispatch chains defeat relay result-caching; slope ratio must be ~1) ----
def gated(name, apply_fn, REP_=10):
    @jax.jit
    def chain(v):
        for _ in range(REP_):
            v = apply_fn(v)
        return v

    def _sync2(v):
        return np.asarray(jax.device_get(jnp.ravel(v)[:4]))

    out = chain(x)
    _sync2(out)

    def best_of(k, n=4):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            v = x
            for _ in range(k):
                v = chain(v)
            _sync2(v)
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t1, t4, t16, t64 = best_of(1), best_of(4), best_of(16), best_of(64)
    slope_a = max(t16 - t4, 1e-12) / (12 * REP_)
    slope_b = max(t64 - t16, 1e-12) / (48 * REP_)
    lin = slope_b / slope_a
    print(f"[gated] {name:16s} {slope_b*1e6:7.1f} us/batch "
          f"({slope_b/BATCH*1e6:6.2f} us/item)  ratio {lin:.2f} "
          f"(~1.0 = honest)", file=sys.stderr, flush=True)


gated("mxu-negacyclic", fourstep_nega)
prev = nttm.set_backend("pallas")
gated("pallas-nega", lambda v: nttm.negacyclic_ntt_rev(v, nplan))
nttm.set_backend(prev)
print("[done3]", file=sys.stderr, flush=True)
