"""Chip probe: pallas NTT tile-size (tb) sweep on the north-star shape.

Times the pallas leg only, with the bench.py dispatch-chain slope
methodology.  Appends one line per tb to stderr; run artifact is recorded in
BENCH_NTT_r03.log.
"""

import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jaxcache")

import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from ringsnark_tpu.ops import ntt as nttm
from ringsnark_tpu.ops.primes import find_ntt_primes

N, L, BATCH, REP = 8192, 6, 32, 10
primes = tuple(find_ntt_primes(L, 1 << 21))
plan = nttm.get_plan(primes, N, negacyclic=True)
rng = np.random.default_rng(0)
x_np = np.stack(
    [np.stack([rng.integers(0, q, N, dtype=np.uint64) for q in primes])
     for _ in range(BATCH)]
).astype(np.uint32)
x = jnp.asarray(x_np)
print(f"[probe-tb] device: {jax.devices()[0]}", file=sys.stderr, flush=True)


def _sync(v):
    return np.asarray(jax.device_get(v[0, 0, :4]))


want = None
for tb in (int(a) for a in sys.argv[1:] or (8, 16, 32)):
    nttm._PALLAS_TB = tb
    prev = nttm.set_backend("pallas")

    @jax.jit
    def chain(v):
        for _ in range(REP):
            v = nttm.negacyclic_ntt_rev(v, plan)
        return v

    try:
        t0 = time.perf_counter()
        out = chain(x)
        _sync(out)
        comp = time.perf_counter() - t0
        if want is None:
            want = np.asarray(out)
        else:
            assert (np.asarray(out) == want).all(), f"tb={tb} mismatch"

        def best(k, n=4):
            ts = []
            for _ in range(n):
                t0 = time.perf_counter()
                v = x
                for _ in range(k):
                    v = chain(v)
                _sync(v)
                ts.append(time.perf_counter() - t0)
            return min(ts)

        t1, t4, t16 = best(1), best(4), best(16)
        dt = (t16 - t4) / (12 * REP)
        lin = dt / max((t4 - t1) / (3 * REP), 1e-12)
        print(
            f"[probe-tb] tb={tb}: {dt*1e6:.1f} us/batch "
            f"(lin {lin:.2f}, compile {comp:.1f}s)",
            file=sys.stderr, flush=True,
        )
    except Exception as e:
        print(f"[probe-tb] tb={tb}: FAILED {type(e).__name__}: {str(e)[:200]}",
              file=sys.stderr, flush=True)
    finally:
        nttm.set_backend(prev)
