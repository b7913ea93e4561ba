"""On-chip probe: grid-free ceiling + split-path compile/correctness at the
witness-map sizes (r2 unblock for the 2^16/2^18 prover runs)."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from ringsnark_tpu.ops import ntt as nttm
from ringsnark_tpu.ops import primes as pr

sizes = [int(s) for s in (sys.argv[1:] or ["32768", "65536", "131072", "524288"])]
print(f"[probe] device={jax.devices()[0]} gridfree_max={nttm._GRIDFREE_MAX_M} "
      f"split_mi={nttm._SPLIT_MI}", flush=True)

for M in sizes:
    ps = tuple(pr.find_ntt_primes(1, max(2 * M, 1 << 21)))
    plan = nttm.get_plan(ps, M)
    rng = np.random.default_rng(0)
    x = rng.integers(0, ps[0], (1, 1, M), dtype=np.uint64).astype(np.uint32)
    xj = jnp.asarray(x)

    fwd = jax.jit(lambda v: nttm.cyclic_ntt_rev(v, plan))
    inv = jax.jit(lambda v: nttm.cyclic_intt_nat(v, plan))
    t0 = time.perf_counter()
    try:
        y = fwd(xj).block_until_ready()
        rt = inv(y).block_until_ready()
        compile_s = time.perf_counter() - t0
        ok = bool((np.asarray(rt) == x).all())
        # warm timing
        t0 = time.perf_counter()
        for _ in range(5):
            y = fwd(xj)
        y.block_until_ready()
        warm = (time.perf_counter() - t0) / 5
        print(f"[probe] M={M}: compile {compile_s:.1f}s roundtrip_ok={ok} "
              f"fwd warm {warm*1e3:.2f} ms", flush=True)
        assert ok
    except Exception as e:
        print(f"[probe] M={M}: FAIL {type(e).__name__}: {str(e)[:300]}", flush=True)
