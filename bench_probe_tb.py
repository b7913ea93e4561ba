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


from ringsnark_tpu.ops import pallas_ntt as pntt

configs = []
for a in sys.argv[1:]:
    tb_s, _, lay = a.partition(":")
    configs.append((int(tb_s), lay or "blm"))
if not configs:
    configs = [(8, "blm"), (16, "blm"), (32, "blm"),
               (8, "lbm"), (16, "lbm"), (32, "lbm")]

want = None
for tb, layout in configs:
    nttm._PALLAS_TB = tb
    pntt._LAYOUT = layout
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

        t4, t16, t64 = best(4), best(16), best(64)
        dt = (t64 - t16) / (48 * REP)
        lin = dt / max((t16 - t4) / (12 * REP), 1e-12)
        print(
            f"[probe-tb] tb={tb} {layout}: {dt*1e6:.1f} us/batch "
            f"(lin {lin:.2f}, compile {comp:.1f}s)",
            file=sys.stderr, flush=True,
        )
    except Exception as e:
        print(f"[probe-tb] tb={tb} {layout}: FAILED {type(e).__name__}: {str(e)[:200]}",
              file=sys.stderr, flush=True)
    finally:
        nttm.set_backend(prev)
