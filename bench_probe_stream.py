"""Chip probe: where does the streamed prover's per-chunk time go?

r4 measured ~158 ms encode + ~287 ms 2-pt MAC per 65536-row chunk at the
zq18 shape (L'=3, N'=4096); the whole zq18 L=3 prove is ~fully accounted
for by those two kernels.  This probe decomposes them on chip:

  dispatch   per-dispatch overhead of a trivial jitted call (async chain)
  prng       _sample_uniform for one chunk (the c1-regen leg of the MAC)
  cbd        CBD error sample alone (no NTT) for one chunk
  errntt     error-sample + negacyclic NTT (the encode hot leg), slab calls
  encode     encode_seeded (current production path)
  mac_mxu    _seeded_mac_kernel 2-pt, mode=mxu (current zq default)
  mac_u64    _seeded_mac_kernel 2-pt, mode=u64
  mac_raw    2-pt multiply+u64-sum over precomputed c0/c1 (no PRNG): floor
  fused      prototype: per-slab jit = encode(c0) + 2-pt MAC, async chain

Each leg is timed as K back-to-back dispatches of the compiled program with
ONE dependent fetch at the end (relay methodology, DESIGN §10), at K=1 and
K=4 so fixed overhead separates from marginal cost.
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

from ringsnark_tpu.rings.context import default_context
from ringsnark_tpu.rings.elem import RingElem
from ringsnark_tpu.encoding import EncodingContext, keygen
from ringsnark_tpu.encoding import bgv
from ringsnark_tpu.encoding.noise import plan_inner_chain
from ringsnark_tpu.ops.primes import find_ntt_primes
from ringsnark_tpu.ops.modops import mul_mod, barrett_reduce_u64
from ringsnark_tpu.ops import ntt as _ntt
from ringsnark_tpu.snark import seeded as sd

LOGM = 18
CHUNK = 1 << 16
SLAB = 4096
N_INNER = 4096

M = 1 << LOGM
order = max(1 << (LOGM + 2), 2 * N_INNER)
ring = default_context(L=1, N=1, order=order)
L_inner, floor = plan_inner_chain(N_INNER, 31, M + 1, margin_bits=4, dense=False)
inner, below = [], 1 << 31
while len(inner) < L_inner:
    c = find_ntt_primes(1, 2 * N_INNER, below=below)[0]
    below = c
    if c not in ring.primes:
        inner.append(c)
ectx = EncodingContext(ring=ring, n_inner=N_INNER, inner_primes=tuple(inner),
                       floor_limbs=floor)
print(f"[cfg] L'={L_inner} floor={floor} N'={N_INNER} chunk={CHUNK} "
      f"slab={SLAB} device={jax.devices()[0]}", file=sys.stderr, flush=True)

rng = np.random.default_rng(0)
key = jax.random.key(0, impl="rbg")
_, sk = keygen(ectx, rng)

# chunk of CRS ring rows + 2 plaintext coefficient vectors (zq: scalars)
rows = RingElem(ring, jnp.asarray(
    rng.integers(0, ring.primes[0], (CHUNK, 1, 1), dtype=np.int64)
    .astype(np.uint32)))
pt_a = jnp.asarray(rng.integers(0, ring.primes[0], (CHUNK, 1, 1),
                                dtype=np.int64).astype(np.uint32))
pt_b = jnp.asarray(rng.integers(0, ring.primes[0], (CHUNK, 1, 1),
                                dtype=np.int64).astype(np.uint32))


def timeit(name, fn, reps=(1, 4)):
    # warm (compile)
    out = fn(1)
    np.asarray(jax.numpy.ravel(out)[:4])
    res = {}
    for k in reps:
        t0 = time.perf_counter()
        out = fn(k)
        np.asarray(jax.numpy.ravel(out)[:4])
        res[k] = time.perf_counter() - t0
    marg = (res[4] - res[1]) / 3 if 4 in res and 1 in res else res[1]
    print(f"[{name:9s}] K1={res[1]*1e3:8.1f} ms  K4={res.get(4,0)*1e3:8.1f} ms"
          f"  marginal={marg*1e3:8.1f} ms", file=sys.stderr, flush=True)
    return marg


# ---- dispatch overhead ----
tiny = jnp.zeros((128,), jnp.uint32)

@jax.jit
def bump(x):
    return x + jnp.uint32(1)

def disp(k):
    x = tiny
    for _ in range(64 * k):
        x = bump(x)
    return x

timeit("disp64", disp)

# ---- prng: c1 regen for one chunk (16 slabs) ----
@partial(jax.jit, static_argnames=("nslab",))
def prng_chunk(key, nslab):
    acc = jnp.zeros((1, L_inner, N_INNER), jnp.uint32)
    for i in range(nslab):
        acc = acc + bgv._sample_uniform(
            ectx, sd._slab_c1_key(key, i), (SLAB,)).sum(axis=0)
    return acc

timeit("prng", lambda k: prng_chunk(jax.random.fold_in(key, k), CHUNK // SLAB))

# ---- cbd error sample alone (no NTT), one chunk ----
k_cbd = bgv._cbd_k(ectx.error_stddev)
mask = jnp.uint32((1 << k_cbd) - 1)

@jax.jit
def cbd_chunk(key):
    u = jax.random.bits(key, (2, CHUNK, 1, N_INNER), dtype=jnp.uint32)
    e = (jax.lax.population_count(u[0] & mask).astype(jnp.int32)
         - jax.lax.population_count(u[1] & mask).astype(jnp.int32))
    return e.sum()

timeit("cbd", lambda k: cbd_chunk(jax.random.fold_in(key, k)))

# ---- error sample + NTT, slab calls (the encode hot leg) ----
@jax.jit
def err_slab(key):
    return bgv._sample_error_ntt(ectx, key, (SLAB,))

def err_chunk(k):
    outs = None
    for i in range(16 * k):
        o = err_slab(jax.random.fold_in(key, i))
        outs = o if outs is None else outs + o
    return outs

timeit("errntt", err_chunk)

# ---- current encode path ----
def enc(k):
    out = None
    for i in range(k):
        senc = sd.encode_seeded(ectx, sk, rows, jax.random.fold_in(key, i),
                                SLAB)
        out = senc.c0
    return out

timeit("encode", enc)

senc = sd.encode_seeded(ectx, sk, rows, key, SLAB)

# ---- MAC modes ----
def mac(mode):
    def run(k):
        out = None
        for i in range(k):
            accs = sd._seeded_mac_kernel(
                ectx, senc.c0, senc.key, (pt_a, pt_b), SLAB, 2, mode)
            out = accs[0][0]
        return out
    return run

timeit("mac_mxu", mac("mxu"))
timeit("mac_u64", mac("u64"))

# ---- raw MAC floor: precomputed c0/c1, no PRNG, u64 lazy scan ----
c1_full = sd._expand_c1(ectx, senc.key, SLAB, CHUNK // SLAB)
p_, mu_, b_ = ectx.inner_consts(0)

@jax.jit
def mac_raw(c0, c1, wa, wb):
    nslab = CHUNK // SLAB
    c0r = c0.reshape(nslab, SLAB, *c0.shape[1:])
    c1r = c1.reshape(nslab, SLAB, *c1.shape[1:])
    war = wa.reshape(nslab, SLAB, 1, 1)
    wbr = wb.reshape(nslab, SLAB, 1, 1)

    def step(accs, xs):
        c0s, c1s, was, wbs = xs
        wa_l = bgv._lift_centered(ectx, was, 0)  # [S, L, L', 1]
        wb_l = bgv._lift_centered(ectx, wbs, 0)
        out = []
        for acc, w in zip(accs, (wa_l, wb_l)):
            pa0 = mul_mod(c0s, w, p_, mu_, b_)
            pa1 = mul_mod(c1s, w, p_, mu_, b_)
            out.append((acc[0] + jnp.sum(pa0.astype(jnp.uint64), axis=0),
                        acc[1] + jnp.sum(pa1.astype(jnp.uint64), axis=0)))
        return tuple(out), None

    zero = jnp.zeros((1, L_inner, N_INNER), jnp.uint64)
    accs, _ = jax.lax.scan(step, ((zero, zero), (zero, zero)),
                           (c0r, c1r, war, wbr))
    return barrett_reduce_u64(accs[0][0], p_, mu_, b_)

def rawrun(k):
    out = None
    for _ in range(k):
        out = mac_raw(senc.c0, c1_full, pt_a, pt_b)
    return out

timeit("mac_raw", rawrun)

# ---- fused slab prototype: encode + 2-pt MAC in one jit per slab ----
@jax.jit
def fused_slab(key, rows_slab, wa, wb, acc):
    m = bgv.plain_to_inner_ntt(ectx, rows_slab, 0)
    c0, c1 = bgv._encrypt_from_m(ectx, sk.s_ntt, m, key)
    wa_l = bgv._lift_centered(ectx, wa, 0)
    wb_l = bgv._lift_centered(ectx, wb, 0)
    outs = []
    for w in (wa_l, wb_l):
        p0 = mul_mod(c0, w, p_, mu_, b_)
        p1 = mul_mod(c1, w, p_, mu_, b_)
        outs.append(jnp.sum(p0.astype(jnp.uint64), axis=0))
        outs.append(jnp.sum(p1.astype(jnp.uint64), axis=0))
    return acc + jnp.stack(outs)

def fused(k):
    acc = jnp.zeros((4, 1, L_inner, N_INNER), jnp.uint64)
    for i in range(16 * k):
        lo = (i % 16) * SLAB
        acc = fused_slab(jax.random.fold_in(key, i),
                         rows.res[lo:lo + SLAB],
                         pt_a[lo:lo + SLAB], pt_b[lo:lo + SLAB], acc)
    return acc

timeit("fused", fused)
print("[done]", file=sys.stderr, flush=True)
