"""Phase-split profile of the seeded-CRS encode (the setup hot path).

Times, on the current device, for one [S, L, L', N'] slab batch:
  a_only   — uniform c1 sampling (rbg)
  err_only — error sample + negacyclic NTT
  encrypt  — the full c0 kernel (sample a + err NTT + a*s + t*e + m)
  mac      — the 2-pt seeded MAC over the same rows (prove-side comparison)

Each timed section is a jit kernel dispatched K times back-to-back with one
dependent fetch (relay-proof slope, bench.py methodology).  Prints one JSON
line; drives VERDICT r3 weak #5 (setup slower than prove, unexamined).
"""

import argparse
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jaxcache")
import json
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=65536)
    ap.add_argument("--slab", type=int, default=4096)
    ap.add_argument("--n-inner", type=int, default=4096)
    ap.add_argument("--L-inner", type=int, default=3)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from functools import partial
    from ringsnark_tpu.rings.context import default_context
    from ringsnark_tpu.rings.elem import RingElem
    from ringsnark_tpu.encoding import EncodingContext, keygen
    from ringsnark_tpu.encoding import bgv
    from ringsnark_tpu.snark import seeded as sd
    from ringsnark_tpu.ops.primes import find_ntt_primes

    ring = default_context(L=1, N=1, order=1 << 18)
    inner, below = [], 1 << 31
    while len(inner) < args.L_inner:
        c = find_ntt_primes(1, 2 * args.n_inner, below=below)[0]
        below = c
        if c not in ring.primes:
            inner.append(c)
    ectx = EncodingContext(ring=ring, n_inner=args.n_inner,
                           inner_primes=tuple(inner))
    rng = np.random.default_rng(0)
    _, sk = keygen(ectx, rng)
    key = jax.random.key(0, impl="rbg")
    S, B = args.slab, args.rows
    nslab = B // S
    rows = RingElem(ring, jnp.asarray(
        np.stack([rng.integers(0, p, (B, 1), dtype=np.uint64)
                  for p in ring.primes], axis=1).astype(np.uint32)))
    dev = jax.devices()[0]
    print(f"[cfg] rows={B} slab={S} L'={args.L_inner} N'={args.n_inner} "
          f"dev={dev}", file=sys.stderr, flush=True)

    @partial(jax.jit, static_argnames=("n",))
    def a_only(k, n):
        def step(_, i):
            return None, bgv._sample_uniform(
                ectx, sd._slab_c1_key(k, i), (S,))[0, 0, 0, :8]
        return jax.lax.scan(step, None, jnp.arange(n))[1]

    @partial(jax.jit, static_argnames=("n",))
    def err_only(k, n):
        def step(_, i):
            return None, bgv._sample_error_ntt(
                ectx, jax.random.fold_in(k, i), (S,))[0, 0, 0, :8]
        return jax.lax.scan(step, None, jnp.arange(n))[1]

    @partial(jax.jit, static_argnames=("n",))
    def norm_only(k, n):
        """The gaussian draw + round/clip alone (no NTT)."""
        def step(_, i):
            e = jnp.clip(jnp.round(jax.random.normal(
                jax.random.fold_in(k, i), (S, ectx.L, ectx.n_inner)
            ) * ectx.error_stddev), -64, 64).astype(jnp.int32)
            return None, e[0, 0, :8]
        return jax.lax.scan(step, None, jnp.arange(n))[1]

    @partial(jax.jit, static_argnames=("n",))
    def errntt_only(res, n):
        """The per-limb NTT alone on a fixed residue slab (inside a scan,
        like the encode kernel runs it)."""
        from ringsnark_tpu.ops import ntt as _ntt

        def step(_, i):
            # vary the input per step so XLA cannot hoist the invariant NTT
            out = _ntt.negacyclic_ntt_rev(
                jnp.bitwise_xor(res, i.astype(jnp.uint32) & jnp.uint32(1)),
                ectx.inner_plan(0),
            )
            return None, out[0, 0, 0, :8]
        return jax.lax.scan(step, None, jnp.arange(n))[1]

    def encrypt(k):
        return sd.encode_seeded(ectx, sk, rows, k, S).c0

    def mac(senc):
        return sd.seeded_inner_product(senc, [rows.res, rows.res], False)

    def timed(name, fn, *a):
        out = fn(*a)  # compile + warm
        np.asarray(jax.numpy.ravel(out[0] if isinstance(out, (tuple, list))
                                   else out)[:4])
        t0 = time.perf_counter()
        for r in range(args.reps):
            out = fn(*a)
        np.asarray(jax.numpy.ravel(out[0] if isinstance(out, (tuple, list))
                                   else out)[:4])
        dt = (time.perf_counter() - t0) / args.reps
        print(f"[{name}] {dt*1e3:.1f} ms / {B} rows", file=sys.stderr,
              flush=True)
        return dt

    res = {"metric": "encode_profile", "rows": B, "slab": S,
           "L_inner": args.L_inner, "n_inner": args.n_inner,
           "device": str(dev)}
    res["a_only_s"] = round(timed("a_only", lambda: a_only(key, nslab)), 4)
    res["err_only_s"] = round(timed("err_only", lambda: err_only(key, nslab)), 4)
    res["norm_only_s"] = round(
        timed("norm_only", lambda: norm_only(key, nslab)), 4
    )
    res_slab = jnp.asarray(
        np.random.default_rng(1).integers(
            0, inner[0], (S, 1, args.L_inner, args.n_inner), dtype=np.uint64
        ).astype(np.uint32)
    )
    res["errntt_only_s"] = round(
        timed("errntt_only", lambda: errntt_only(res_slab, nslab)), 4
    )
    res["encrypt_s"] = round(timed("encrypt", lambda: encrypt(key)), 4)
    senc = sd.encode_seeded(ectx, sk, rows, key, S)
    res["mac2_s"] = round(
        timed("mac2pt", lambda: [x.c0 for x in mac(senc)]), 4
    )
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
