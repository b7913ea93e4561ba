"""One-off chip probe (round 2): honest timing methodology + transfer bandwidth.

Questions answered on the real chip:
  1. Is the relay memoizing identical (executable, input) calls?  Time the
     XLA and Pallas NTT chains with a FRESH input per call (on-device +1)
     vs the same input every call.
  2. Does a larger Pallas batch tile (one pallas_call for the whole batch)
     beat the TB=8 chunked form?
  3. Host->device and device->host bandwidth through the relay (sizes the
     streamed-CRS prover design).
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

N, L, BATCH, REP = 8192, 6, 32, 10
primes = tuple(find_ntt_primes(L, 1 << 21))
plan = nttm.get_plan(primes, N, negacyclic=True)
rng = np.random.default_rng(0)
x_np = np.stack(
    [np.stack([rng.integers(0, q, N, dtype=np.uint64) for q in primes])
     for _ in range(BATCH)]
).astype(np.uint32)

print(f"[probe] device: {jax.devices()[0]}", file=sys.stderr, flush=True)


def timeit(f, *args, n=4):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts), ts


# ---- 1. xla chain, same vs fresh input -------------------------------------
prev = nttm.set_backend("xla")

@jax.jit
def chain_x(v, salt):
    # salt folds a per-call distinct value into the input so the relay cannot
    # replay a memoized result; salt=0 reproduces the plain chain.
    v = v + salt  # uint32 add; caller passes salt < p_min - max(v) safe? no-op at 0
    for _ in range(REP):
        v = nttm.negacyclic_ntt_rev(v, plan)
    return v

x = jnp.asarray(x_np)
zero = jnp.uint32(0)
t0 = time.perf_counter()
chain_x(x, zero).block_until_ready()
print(f"[probe] xla chain compile {time.perf_counter()-t0:.1f}s", file=sys.stderr, flush=True)
nttm.set_backend(prev)

best_same, ts_same = timeit(chain_x, x, zero)
print(f"[probe] xla same-input: best {best_same/REP*1e6:.1f} us/batch, all {[f'{t*1e3:.2f}ms' for t in ts_same]}",
      file=sys.stderr, flush=True)

ts = []
for i in range(4):
    salt = jnp.uint32(i)  # different arg each call -> no replay possible
    t0 = time.perf_counter()
    chain_x(x, salt).block_until_ready()
    ts.append(time.perf_counter() - t0)
print(f"[probe] xla fresh-input: best {min(ts)/REP*1e6:.1f} us/batch, all {[f'{t*1e3:.2f}ms' for t in ts]}",
      file=sys.stderr, flush=True)

# ---- 2. pallas chain, TB=8 vs TB=32, same vs fresh --------------------------
tables = pntt.get_pallas_tables(primes, N)
for TB in (8, 32):
    @jax.jit
    def chain_p(v, salt, TB=TB):
        v = v + salt
        for _ in range(REP):
            v = pntt.negacyclic_ntt_rev_pallas(v, tables, TB)
        return v

    try:
        t0 = time.perf_counter()
        out = chain_p(x, zero).block_until_ready()
        print(f"[probe] pallas TB={TB} compile {time.perf_counter()-t0:.1f}s",
              file=sys.stderr, flush=True)
        best, _ = timeit(chain_p, x, zero)
        ts = []
        for i in range(4):
            t0 = time.perf_counter()
            chain_p(x, jnp.uint32(i)).block_until_ready()
            ts.append(time.perf_counter() - t0)
        print(f"[probe] pallas TB={TB}: same {best/REP*1e6:.1f} us/batch, "
              f"fresh {min(ts)/REP*1e6:.1f} us/batch",
              file=sys.stderr, flush=True)
    except Exception as e:
        print(f"[probe] pallas TB={TB} failed: {type(e).__name__}: {str(e)[:300]}",
              file=sys.stderr, flush=True)

# ---- 3. transfer bandwidth ---------------------------------------------------
for mb in (64, 256):
    buf = np.random.randint(0, 1 << 31, size=(mb * 1024 * 1024 // 4,), dtype=np.uint32)
    dev = jax.devices()[0]
    t0 = time.perf_counter()
    d = jax.device_put(buf, dev)
    d.block_until_ready()
    up = time.perf_counter() - t0
    t0 = time.perf_counter()
    _ = np.asarray(d)
    down = time.perf_counter() - t0
    print(f"[probe] transfer {mb} MB: h2d {mb/up:.0f} MB/s ({up:.2f}s), "
          f"d2h {mb/down:.0f} MB/s ({down:.2f}s)", file=sys.stderr, flush=True)

# overlap probe: does h2d overlap with compute? issue put + chain concurrently
buf = np.random.randint(0, 1 << 31, size=(256 * 1024 * 1024 // 4,), dtype=np.uint32)
t0 = time.perf_counter()
d = jax.device_put(buf, jax.devices()[0])
r = chain_x(x, jnp.uint32(99))
d.block_until_ready(); r.block_until_ready()
both = time.perf_counter() - t0
print(f"[probe] overlap: put(256MB) + xla chain together: {both:.2f}s",
      file=sys.stderr, flush=True)
print("[probe] done", file=sys.stderr, flush=True)
