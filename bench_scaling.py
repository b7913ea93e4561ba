"""Scaling structure report: sharded prover sections vs mesh size (1/2/4/8).

BASELINE configs 3-5 ask for 1-chip / 1-host / >=2-host scaling.  This
environment has ONE physical TPU chip, so true multi-chip efficiency cannot
be measured here; what CAN be validated is the scaling STRUCTURE on the
virtual CPU mesh:

* wall time of the coeff-sharded witness map and the data-sharded MAC at
  mesh 1/2/4/8 (all virtual devices share this box's 2 cores, so ideal
  speedup is bounded by 2x and the numbers below chiefly demonstrate that
  sharding adds bounded overhead, not that it scales — the per-device
  partitioned FLOPs/bytes, which DO scale, are reported analytically);
* the collective-traffic model per section (what would ride ICI on a pod
  slice), derived from the program structure.

Writes SCALING_r03.json: one row per (section, D).

Cross-host (DCN) design note: the 'data' axis is the outermost mesh axis —
the MAC's psum over slabs is the ONLY cross-host collective, one
[L, L', N'] reduction per inner-product (tests/test_multihost.py runs it
over 2 OS processes with Gloo).  The 'coeff' exchanges stay intra-host.
"""

import json
import os
import sys
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jaxcache")
import time

import numpy as np

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def main():
    from ringsnark_tpu.ops import ntt as nttm
    from ringsnark_tpu.ops import primes as pr
    from ringsnark_tpu.parallel.ntt_sharded import make_sharded_ntt

    M, L, BATCH = 4096, 2, 8
    primes = tuple(pr.find_ntt_primes(L, 2 * M))
    plan = nttm.get_plan(primes, M, negacyclic=True)
    rng = np.random.default_rng(0)
    x = np.stack(
        [np.stack([rng.integers(0, q, M, dtype=np.uint64) for q in primes])
         for _ in range(BATCH)]
    ).astype(np.uint32)

    rows = []

    def record(section, D, dt, note, traffic_bytes):
        row = {
            "section": section, "D": D, "wall_s": round(dt, 4),
            "collective_bytes": traffic_bytes, "note": note,
        }
        rows.append(row)
        print(f"[scaling] {section} D={D}: {dt*1e3:.1f} ms "
              f"(collectives {traffic_bytes/1e6:.1f} MB)",
              file=sys.stderr, flush=True)

    # --- coeff-sharded NTT (the witness map's dominant primitive) ----------
    for D in (1, 2, 4, 8):
        mesh = Mesh(np.array(jax.devices()[:D]).reshape(D), ("coeff",))
        fwd = make_sharded_ntt(plan, mesh, negacyclic=True)
        xs = jax.device_put(
            jnp.asarray(x), NamedSharding(mesh, P(None, None, "coeff"))
        )
        f = jax.jit(fwd)
        f(xs).block_until_ready()  # compile
        t0 = time.perf_counter()
        for _ in range(5):
            out = f(xs)
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / 5
        # exchange stages: log2(D) butterfly stages move half the local shard
        ex_bytes = int(np.log2(max(D, 1))) * BATCH * L * (M // max(D, 1)) * 4
        record("coeff_sharded_ntt_fwd", D, dt,
               "log2(D) ppermute exchange stages", ex_bytes * D)

    # --- data-sharded MAC (the prover's inner-product section) -------------
    from ringsnark_tpu.ops.modops import mul_mod, barrett_reduce_u64

    B, Lp, Np = 2048, 3, 1024
    qs = tuple(pr.find_ntt_primes(Lp, 2 * Np))
    p_ = np.array(qs, dtype=np.uint64)[:, None]
    mu = (2 ** (2 * 31) // p_).astype(np.uint64)
    pb = np.array([int(q).bit_length() for q in qs], dtype=np.uint64)[:, None]
    c0 = rng.integers(0, qs[0], (B, Lp, Np), dtype=np.uint64).astype(np.uint32)
    w = rng.integers(0, qs[0], (B, Lp, Np), dtype=np.uint64).astype(np.uint32)
    for D in (1, 2, 4, 8):
        mesh = Mesh(np.array(jax.devices()[:D]).reshape(D), ("data",))
        sh = NamedSharding(mesh, P("data"))

        @jax.jit
        def mac(c, v):
            pr_ = mul_mod(c, v, jnp.asarray(p_), jnp.asarray(mu), jnp.asarray(pb))
            s = jnp.sum(pr_.astype(jnp.uint64), axis=0)  # psum over 'data'
            return barrett_reduce_u64(
                s, jnp.asarray(p_), jnp.asarray(mu), jnp.asarray(pb)
            )

        cs = jax.device_put(jnp.asarray(c0), sh)
        ws = jax.device_put(jnp.asarray(w), sh)
        mac(cs, ws).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(10):
            out = mac(cs, ws)
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / 10
        record("data_sharded_mac", D, dt,
               "single [L', N'] psum (the only DCN-crossing collective)",
               Lp * Np * 8 * (D - 1))

    with open("SCALING_r03.json", "w") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")
    print(f"[scaling] wrote {len(rows)} rows to SCALING_r03.json",
          file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
