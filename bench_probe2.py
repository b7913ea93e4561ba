"""Chip probe 2: timing truth through the relay.

Every timed program returns a SCALAR (u64 fold of the result), so wall time
must include all compute (the scalar is fetched to host each call).  If the
relay's block_until_ready is async-lying, scalar-fetch timing exposes it.
REP-scaling check: a REP=40 chain must take ~4x the REP=10 chain.
"""

import sys
import time

import numpy as np
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from ringsnark_tpu.ops import ntt as nttm
from ringsnark_tpu.ops import pallas_ntt as pntt
from ringsnark_tpu.ops.primes import find_ntt_primes

N, L, BATCH = 8192, 6, 32
primes = tuple(find_ntt_primes(L, 1 << 21))
plan = nttm.get_plan(primes, N, negacyclic=True)
rng = np.random.default_rng(0)
x_np = np.stack(
    [np.stack([rng.integers(0, q, N, dtype=np.uint64) for q in primes])
     for _ in range(BATCH)]
).astype(np.uint32)
x = jnp.asarray(x_np)

print(f"[probe2] device: {jax.devices()[0]}", file=sys.stderr, flush=True)


def bench(name, fn, rep, n=4):
    ts = []
    for i in range(n):
        t0 = time.perf_counter()
        v = fn(x, jnp.uint32(i + 1))
        v = float(v)  # scalar fetch forces full completion
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    print(f"[probe2] {name}: best {best/rep*1e6:.1f} us/batch "
          f"(call {best*1e3:.2f} ms), all {[f'{t*1e3:.1f}' for t in ts]}",
          file=sys.stderr, flush=True)
    return best / rep


def make_xla(rep):
    prev = nttm.set_backend("xla")

    @jax.jit
    def f(v, salt):
        v = v + salt % jnp.uint32(2)  # fresh input, keeps values < p
        for _ in range(rep):
            v = nttm.negacyclic_ntt_rev(v, plan)
        return jnp.sum(v.astype(jnp.uint64))

    t0 = time.perf_counter()
    float(f(x, jnp.uint32(0)))
    print(f"[probe2] xla rep={rep} compile {time.perf_counter()-t0:.1f}s",
          file=sys.stderr, flush=True)
    nttm.set_backend(prev)
    return f


def make_pallas(rep, tb):
    tables = pntt.get_pallas_tables(primes, N)

    @jax.jit
    def f(v, salt):
        v = v + salt % jnp.uint32(2)
        for _ in range(rep):
            v = pntt.negacyclic_ntt_rev_pallas(v, tables, tb)
        return jnp.sum(v.astype(jnp.uint64))

    t0 = time.perf_counter()
    float(f(x, jnp.uint32(0)))
    print(f"[probe2] pallas rep={rep} tb={tb} compile {time.perf_counter()-t0:.1f}s",
          file=sys.stderr, flush=True)
    return f


t10 = bench("xla rep=10", make_xla(10), 10)
t40 = bench("xla rep=40", make_xla(40), 40)
print(f"[probe2] xla scaling: rep40/rep10 per-batch ratio {t40/t10:.2f} (1.0 = linear/honest)",
      file=sys.stderr, flush=True)

try:
    p10 = bench("pallas tb=8 rep=10", make_pallas(10, 8), 10)
except Exception as e:
    print(f"[probe2] pallas tb=8 failed: {str(e)[:200]}", file=sys.stderr, flush=True)
    p10 = None
try:
    p16 = bench("pallas tb=16 rep=10", make_pallas(10, 16), 10)
except Exception as e:
    print(f"[probe2] pallas tb=16 failed: {str(e)[:200]}", file=sys.stderr, flush=True)

# MAC probe: the prover's inner-product kernel shape at 2^16 scale.
# slab of 4096 terms x L'=3 x N'=4096 c0 (u32) resident; scalar-plain MAC.
from ringsnark_tpu.ops.modops import mul_mod, barrett_reduce_u64
from ringsnark_tpu.ops.primes import make_prime

S, LP, NP = 4096, 3, 4096
qs = find_ntt_primes(LP, 2 * NP)
pinfo = [make_prime(q) for q in qs]
pv = np.array(qs, dtype=np.uint32)[:, None]
muv = np.array([i.mu for i in pinfo], dtype=np.uint64)[:, None]
bv = np.array([i.bits for i in pinfo], dtype=np.uint32)[:, None]
c0s = jnp.asarray(
    np.random.default_rng(1).integers(0, qs[0], (S, LP, NP), dtype=np.uint64
                                      ).astype(np.uint32))
w = jnp.asarray(np.random.default_rng(2).integers(0, qs[0], (S, 1, 1),
                                                  dtype=np.uint64).astype(np.uint32))
REPM = 8

@jax.jit
def mac(c0, wv, salt):
    wv = wv + salt % jnp.uint32(2)
    acc = jnp.zeros((LP, NP), dtype=jnp.uint64)
    for _ in range(REPM):
        prod = mul_mod(c0, wv, pv, muv, bv).astype(jnp.uint64)
        acc = acc + jnp.sum(prod, axis=0)
        wv = wv + jnp.uint32(1)
    return jnp.sum(barrett_reduce_u64(acc, pv, muv, bv).astype(jnp.uint64))

t0 = time.perf_counter()
float(mac(c0s, w, jnp.uint32(0)))
print(f"[probe2] mac compile {time.perf_counter()-t0:.1f}s", file=sys.stderr, flush=True)
ts = []
for i in range(4):
    t0 = time.perf_counter()
    float(mac(c0s, w, jnp.uint32(i + 1)))
    ts.append(time.perf_counter() - t0)
per_slab = min(ts) / REPM
terms_per_s = S / per_slab
gb = S * LP * NP * 4 / 1e9
print(f"[probe2] mac: {per_slab*1e3:.2f} ms/slab({S} terms x {LP}x{NP}) -> "
      f"{terms_per_s:.0f} terms/s, {gb/per_slab:.0f} GB/s c0 traffic",
      file=sys.stderr, flush=True)

# PRNG regen throughput (c1 regeneration cost)
@jax.jit
def regen(key):
    u = jax.random.randint(key, (S, LP, NP), 0, int(qs[0]), dtype=jnp.uint32)
    return jnp.sum(u.astype(jnp.uint64))

k = jax.random.PRNGKey(0)
float(regen(k))
ts = []
for i in range(4):
    k2 = jax.random.PRNGKey(i + 1)
    t0 = time.perf_counter()
    float(regen(k2))
    ts.append(time.perf_counter() - t0)
print(f"[probe2] c1 regen: {min(ts)*1e3:.2f} ms/slab -> {gb/min(ts):.0f} GB/s",
      file=sys.stderr, flush=True)
print("[probe2] done", file=sys.stderr, flush=True)
