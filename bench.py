"""Driver benchmark: north-star NTT throughput on the real chip.

Prints ONE JSON line:
  {"metric": "ntt_neg_8192_6limb", "value": <NTTs/s>, "unit": "ntt/s",
   "vs_baseline": <ratio vs single-core CPU (numpy) same-algorithm baseline>}

One NTT op = a full 6-limb negacyclic forward transform of one degree-8192
polynomial (the BASELINE.md north-star kernel).  Secondary numbers go to
stderr.
"""

import json
import sys
import time

import numpy as np


def _numpy_ntt_baseline(plan, x, iters=3):
    """Single-core same-algorithm numpy NTT (the CPU stand-in baseline; the
    reference's SEAL submodules are empty and cannot be built)."""
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
    print(f"[bench] device: {dev}", file=sys.stderr, flush=True)

    fwd = jax.jit(lambda v: nttm.negacyclic_ntt_rev(v, plan))
    x = jax.device_put(jnp.asarray(x_np), dev)
    t0 = time.perf_counter()
    out = fwd(x).block_until_ready()  # compile
    print(f"[bench] compile: {time.perf_counter()-t0:.1f}s", file=sys.stderr, flush=True)

    # timing: chain REP dependent applications inside one jit — per-call
    # relay/dispatch latency otherwise dominates on this tunnel.
    REP = 10

    @jax.jit
    def chain(v):
        for _ in range(REP):
            v = nttm.negacyclic_ntt_rev(v, plan)
        return v

    t0 = time.perf_counter()
    chained = chain(x).block_until_ready()  # compile + warm
    print(f"[bench] chain compile: {time.perf_counter()-t0:.1f}s",
          file=sys.stderr, flush=True)
    # verify the chain really computes REP sequential NTTs
    check = x
    for _ in range(REP):
        check = fwd(check)
    assert (np.asarray(chained) == np.asarray(check)).all(), "chain mismatch"

    def best_of(f, n=3):
        times = []
        for _ in range(n):
            t0 = time.perf_counter()
            f().block_until_ready()
            times.append((time.perf_counter() - t0) / REP)
        return min(times)

    dt = best_of(lambda: chain(x))
    print(f"[bench] xla path: {dt*1e6:.1f} us/batch", file=sys.stderr, flush=True)

    # Pallas kernel (Shoup u32 butterflies, grid-free)
    try:
        from ringsnark_tpu.ops import pallas_ntt as pntt

        tables = pntt.get_pallas_tables(primes, N)

        @jax.jit
        def chain_p(v):
            for _ in range(REP):
                v = pntt.negacyclic_ntt_rev_pallas(v, tables, 8)
            return v

        got = pntt.negacyclic_ntt_rev_pallas(x, tables, 8).block_until_ready()
        assert (np.asarray(got) == np.asarray(out)).all(), "pallas mismatch"
        chain_p(x).block_until_ready()
        dt_p = best_of(lambda: chain_p(x))
        print(
            f"[bench] pallas kernel: {dt_p*1e6:.1f} us/batch "
            f"({dt/dt_p:.1f}x vs xla)",
            file=sys.stderr, flush=True,
        )
        dt = min(dt, dt_p)
    except Exception as e:  # pallas unavailable (e.g. CPU-only run)
        print(f"[bench] pallas kernel skipped: {type(e).__name__}: {str(e)[:200]}",
              file=sys.stderr, flush=True)
    ntts_per_s = BATCH / dt
    print(
        f"[bench] tpu: {dt*1e3:.2f} ms / batch of {BATCH} -> {ntts_per_s:.1f} ntt/s",
        file=sys.stderr, flush=True,
    )

    # CPU single-core baseline: native C++ (the SEAL-equivalent scalar code),
    # falling back to same-algorithm numpy.
    base_batch = 4
    from ringsnark_tpu import native

    if native.available():
        base_out = np.empty((base_batch, L, N), dtype=np.uint32)
        t0 = time.perf_counter()
        for l, p in enumerate(primes):
            base_out[:, l, :] = native.negacyclic_ntt(
                x_np[:base_batch, l, :], p, plan.w_np[l], int(plan.psi[l, 1])
            )
        base_dt = time.perf_counter() - t0
        base_kind = "native-cpp"
    else:
        base_dt, base_out = _numpy_ntt_baseline(plan, x_np[:base_batch])
        base_kind = "numpy"
    base_ntts_per_s = base_batch / base_dt
    print(
        f"[bench] cpu 1-core baseline ({base_kind}): {base_ntts_per_s:.1f} ntt/s",
        file=sys.stderr, flush=True,
    )
    # cross-check correctness vs the baseline
    assert (np.asarray(out[:base_batch]) == base_out.astype(np.uint32)).all(), (
        "TPU NTT result mismatch vs CPU baseline"
    )

    print(
        json.dumps(
            {
                "metric": "ntt_neg_8192_6limb",
                "value": round(ntts_per_s, 2),
                "unit": "ntt/s",
                "vs_baseline": round(ntts_per_s / base_ntts_per_s, 2),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
