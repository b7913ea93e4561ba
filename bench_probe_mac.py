"""Chip probe #2 (v2): the 2-pt seeded MAC at the zq18 chunk shape, with
ALL four accumulator chains returned (v1 returned one chain and XLA/JAX
dead-code-eliminated the rest — the '22 ms floor' was 1/4 of the work).

Variants (one jit per 65536-row chunk, 16 slabs):
  scan_pre     lax.scan body, c1 precomputed                (u64 Barrett)
  unroll_pre   unrolled slabs, c1 precomputed               (u64 Barrett)
  scan_prng    lax.scan, c1 regenerated in body             (u64 Barrett)
  unroll_prng  unrolled, c1 regenerated at top level        (u64 Barrett)
  shoup_prng   unrolled + PRNG, Shoup u32 multiply (16-bit mulhi splits,
               per-row premultiplied w'), u64 lazy sums
  kernel_u64 / kernel_mxu   the production _seeded_mac_kernel
"""

import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jaxcache")

import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from ringsnark_tpu.rings.context import default_context
from ringsnark_tpu.rings.elem import RingElem
from ringsnark_tpu.encoding import EncodingContext, keygen
from ringsnark_tpu.encoding import bgv
from ringsnark_tpu.encoding.noise import plan_inner_chain
from ringsnark_tpu.ops.primes import find_ntt_primes
from ringsnark_tpu.ops.modops import mul_mod, barrett_reduce_u64
from ringsnark_tpu.snark import seeded as sd

LOGM, CHUNK, SLAB, N_INNER = 18, 1 << 16, 4096, 4096
M = 1 << LOGM
ring = default_context(L=1, N=1, order=max(1 << (LOGM + 2), 2 * N_INNER))
L_inner, floor = plan_inner_chain(N_INNER, 31, M + 1, margin_bits=4, dense=False)
inner, below = [], 1 << 31
while len(inner) < L_inner:
    c = find_ntt_primes(1, 2 * N_INNER, below=below)[0]
    below = c
    if c not in ring.primes:
        inner.append(c)
ectx = EncodingContext(ring=ring, n_inner=N_INNER, inner_primes=tuple(inner),
                       floor_limbs=floor)
print(f"[cfg] L'={L_inner} device={jax.devices()[0]}", file=sys.stderr,
      flush=True)

rng = np.random.default_rng(0)
key = jax.random.key(0, impl="rbg")
_, sk = keygen(ectx, rng)
rows = RingElem(ring, jnp.asarray(
    rng.integers(0, ring.primes[0], (CHUNK, 1, 1), dtype=np.int64)
    .astype(np.uint32)))
pt_a = jnp.asarray(rng.integers(0, ring.primes[0], (CHUNK, 1, 1),
                                dtype=np.int64).astype(np.uint32))
pt_b = jnp.asarray(rng.integers(0, ring.primes[0], (CHUNK, 1, 1),
                                dtype=np.int64).astype(np.uint32))
senc = sd.encode_seeded(ectx, sk, rows, key, SLAB)
c1_full = sd._expand_c1(ectx, senc.key, SLAB, CHUNK // SLAB)
p_, mu_, b_ = ectx.inner_consts(0)
NS = CHUNK // SLAB


def timeit(name, fn, ref=None):
    out = np.asarray(fn())
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        o = fn()
        np.asarray(jax.numpy.ravel(o)[:4])
        ts.append(time.perf_counter() - t0)
    ok = "" if ref is None else ("  BITEXACT" if np.array_equal(out, ref)
                                 else "  MISMATCH!")
    print(f"[{name:12s}] {min(ts)*1e3:8.1f} ms (min of 3){ok}",
          file=sys.stderr, flush=True)
    return out


def finish(accs):
    return jnp.stack([
        jnp.stack([barrett_reduce_u64(a0, p_, mu_, b_),
                   barrett_reduce_u64(a1, p_, mu_, b_)])
        for a0, a1 in accs
    ])


def mac_body(c0s, c1s, lifts, accs):
    out = []
    for (a0, a1), w in zip(accs, lifts):
        pa0 = mul_mod(c0s, w, p_, mu_, b_)
        pa1 = mul_mod(c1s, w, p_, mu_, b_)
        out.append((a0 + jnp.sum(pa0.astype(jnp.uint64), axis=0),
                    a1 + jnp.sum(pa1.astype(jnp.uint64), axis=0)))
    return out


def zacc():
    z = jnp.zeros((1, L_inner, N_INNER), jnp.uint64)
    return [(z, z), (z, z)]


@jax.jit
def scan_pre(c0, c1, wa, wb):
    c0r = c0.reshape(NS, SLAB, *c0.shape[1:])
    c1r = c1.reshape(NS, SLAB, *c1.shape[1:])
    war = wa.reshape(NS, SLAB, 1, 1)
    wbr = wb.reshape(NS, SLAB, 1, 1)

    def step(accs, xs):
        c0s, c1s, was, wbs = xs
        return tuple(mac_body(c0s, c1s,
                              (bgv._lift_centered(ectx, was, 0),
                               bgv._lift_centered(ectx, wbs, 0)), accs)), None

    accs, _ = jax.lax.scan(step, tuple(zacc()), (c0r, c1r, war, wbr))
    return finish(accs)


@jax.jit
def unroll_pre(c0, c1, wa, wb):
    accs = zacc()
    for i in range(NS):
        sl = slice(i * SLAB, (i + 1) * SLAB)
        accs = mac_body(c0[sl], c1[sl],
                        (bgv._lift_centered(ectx, wa[sl], 0),
                         bgv._lift_centered(ectx, wb[sl], 0)), accs)
    return finish(accs)


@jax.jit
def scan_prng(c0, key, wa, wb):
    c0r = c0.reshape(NS, SLAB, *c0.shape[1:])
    war = wa.reshape(NS, SLAB, 1, 1)
    wbr = wb.reshape(NS, SLAB, 1, 1)

    def step(accs, xs):
        i, c0s, was, wbs = xs
        c1s = bgv._sample_uniform(ectx, sd._slab_c1_key(key, i), (SLAB,))
        return tuple(mac_body(c0s, c1s,
                              (bgv._lift_centered(ectx, was, 0),
                               bgv._lift_centered(ectx, wbs, 0)), accs)), None

    accs, _ = jax.lax.scan(step, tuple(zacc()),
                           (jnp.arange(NS), c0r, war, wbr))
    return finish(accs)


@jax.jit
def unroll_prng(c0, key, wa, wb):
    accs = zacc()
    for i in range(NS):
        sl = slice(i * SLAB, (i + 1) * SLAB)
        c1s = bgv._sample_uniform(ectx, sd._slab_c1_key(key, i), (SLAB,))
        accs = mac_body(c0[sl], c1s,
                        (bgv._lift_centered(ectx, wa[sl], 0),
                         bgv._lift_centered(ectx, wb[sl], 0)), accs)
    return finish(accs)


# ---- Shoup u32 path -------------------------------------------------------
U16 = jnp.uint32(0xFFFF)


def mulhi32(a, b):
    """floor(a*b / 2^32) for u32 a,b via 16-bit partial products (pure u32)."""
    a0, a1 = a & U16, a >> jnp.uint32(16)
    b0, b1 = b & U16, b >> jnp.uint32(16)
    mid = a0 * b1 + ((a0 * b0) >> jnp.uint32(16))
    mid2 = a1 * b0 + (mid & U16)
    return a1 * b1 + (mid >> jnp.uint32(16)) + (mid2 >> jnp.uint32(16))


def shoup_mul(c, w, w_shoup, p):
    """c*w mod p with premultiplied w' = floor(w*2^32/p); result canonical."""
    q = mulhi32(c, w_shoup)
    r = c * w - q * p  # mod 2^32; true value in [0, 2p)
    return jnp.where(r >= p, r - p, r)


@jax.jit
def shoup_prng(c0, key, wa, wb):
    p32 = p_.astype(jnp.uint32)  # [L', 1]
    accs = zacc()
    for i in range(NS):
        sl = slice(i * SLAB, (i + 1) * SLAB)
        c1s = bgv._sample_uniform(ectx, sd._slab_c1_key(key, i), (SLAB,))
        c0s = c0[sl]
        out = []
        for (a0, a1), pt in zip(accs, (wa, wb)):
            w = bgv._lift_centered(ectx, pt[sl], 0)  # [S, L, L', 1]
            wsh = ((w.astype(jnp.uint64) << jnp.uint64(32))
                   // p_.astype(jnp.uint64)).astype(jnp.uint32)
            pr0 = shoup_mul(c0s, w, wsh, p32)
            pr1 = shoup_mul(c1s, w, wsh, p32)
            out.append((a0 + jnp.sum(pr0.astype(jnp.uint64), axis=0),
                        a1 + jnp.sum(pr1.astype(jnp.uint64), axis=0)))
        accs = out
    return finish(accs)


ref = timeit("scan_pre", lambda: scan_pre(senc.c0, c1_full, pt_a, pt_b))
timeit("unroll_pre", lambda: unroll_pre(senc.c0, c1_full, pt_a, pt_b), ref)
timeit("scan_prng", lambda: scan_prng(senc.c0, senc.key, pt_a, pt_b), ref)
timeit("unroll_prng", lambda: unroll_prng(senc.c0, senc.key, pt_a, pt_b), ref)
timeit("shoup_prng", lambda: shoup_prng(senc.c0, senc.key, pt_a, pt_b), ref)


def kern(mode):
    def run():
        accs = sd._seeded_mac_kernel(
            ectx, senc.c0, senc.key, (pt_a, pt_b), SLAB, 2, mode)
        return jnp.stack([jnp.stack([a0, a1]) for a0, a1 in accs])
    return run

timeit("kernel_u64", kern("u64"), ref)
timeit("kernel_mxu", kern("mxu"), ref)
print("[done]", file=sys.stderr, flush=True)


# ---- round 2: two-dispatch (materialize c1, then scan-MAC) + variants ----
@jax.jit
def scan_pre_shoup(c0, c1, wa, wb):
    p32 = p_.astype(jnp.uint32)
    c0r = c0.reshape(NS, SLAB, *c0.shape[1:])
    c1r = c1.reshape(NS, SLAB, *c1.shape[1:])
    war = wa.reshape(NS, SLAB, 1, 1)
    wbr = wb.reshape(NS, SLAB, 1, 1)

    def step(accs, xs):
        c0s, c1s, was, wbs = xs
        out = []
        for (a0, a1), ws in zip(accs, (was, wbs)):
            w = bgv._lift_centered(ectx, ws, 0)
            wsh = ((w.astype(jnp.uint64) << jnp.uint64(32))
                   // p_.astype(jnp.uint64)).astype(jnp.uint32)
            pr0 = shoup_mul(c0s, w, wsh, p32)
            pr1 = shoup_mul(c1s, w, wsh, p32)
            out.append((a0 + jnp.sum(pr0.astype(jnp.uint64), axis=0),
                        a1 + jnp.sum(pr1.astype(jnp.uint64), axis=0)))
        return tuple(out), None

    accs, _ = jax.lax.scan(step, tuple(zacc()), (c0r, c1r, war, wbr))
    return finish(accs)


def two_dispatch():
    c1 = sd._expand_c1(ectx, senc.key, SLAB, NS)
    return scan_pre(senc.c0, c1, pt_a, pt_b)


def two_dispatch_shoup():
    c1 = sd._expand_c1(ectx, senc.key, SLAB, NS)
    return scan_pre_shoup(senc.c0, c1, pt_a, pt_b)


timeit("expand_c1", lambda: sd._expand_c1(ectx, senc.key, SLAB, NS))
timeit("twodisp", two_dispatch, ref)
timeit("twodisp_sh", two_dispatch_shoup, ref)

key_tf = jax.random.key(0, impl="threefry2x32")
senc_tf = sd.encode_seeded(ectx, sk, rows, key_tf, SLAB)
timeit("scanprng_tf", lambda: scan_prng(senc_tf.c0, senc_tf.key, pt_a, pt_b))
timeit("expandc1_tf", lambda: sd._expand_c1(ectx, senc_tf.key, SLAB, NS))
print("[done2]", file=sys.stderr, flush=True)
