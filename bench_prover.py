"""Prover-scale benchmark: ringGroth16 end-to-end at synthetic R1CS sizes.

The north-star runner (BASELINE.md): Setup / Prove / Verify for a 2^logm-
constraint squaring-chain R1CS, seeded-CRS layout (snark/seeded.py) so the
CRS c0 stays HBM-resident (2^16 fits one chip; 2^18 runs phased: one CRS
batch generated + consumed at a time — the layout a 3-chip pod slice holds
resident).  Prints one JSON line per configuration.

CPU baseline: the native C++ (OpenMP) same-algorithm MAC, measured on a
sample of slabs and scaled linearly (dense deterministic compute) — a LOWER
bound for a full CPU prover (witness-map NTTs excluded), so the reported
vs-CPU ratio is conservative.

Timing: the relay's block_until_ready can return before the device finishes;
every timed section ends by fetching a small result slice to host, which
cannot complete early.

Usage: python bench_prover.py [--log-m 16] [--ring zq|rq] [--n-inner 4096]
       [--phased] [--prng rbg|threefry] [--out results.json]
"""

import argparse
import json
import sys
import time

import numpy as np


def _sync(*arrays):
    """Force real completion by fetching a tiny dependent slice of each."""
    for a in arrays:
        if a is None:
            continue
        np.asarray(a.reshape(-1)[:4])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-m", type=int, default=16)
    ap.add_argument("--ring", choices=["zq", "rq"], default="zq")
    ap.add_argument("--N", type=int, default=256, help="outer degree for rq")
    ap.add_argument("--n-inner", type=int, default=4096)
    ap.add_argument("--L", type=int, default=1,
                    help="outer limbs (soundness ~ M/2^31 per limb; L=1 is "
                         "the flagship bench config, L=2 doubles everything)")
    ap.add_argument("--slab", type=int, default=4096)
    ap.add_argument("--phased", action="store_true",
                    help="generate+consume one CRS batch at a time (2^18)")
    ap.add_argument("--phase-chunk", type=int, default=1 << 16,
                    help="phased mode: rows of one CRS phase resident at a "
                         "time (2^18's 12.9 GiB single-phase c0 OOMed r2; "
                         "partial inner products accumulate at level 0)")
    ap.add_argument("--prng", choices=["threefry2x32", "rbg"], default="rbg")
    ap.add_argument("--margin", type=int, default=10,
                    help="noise planner margin bits (worst-case headroom; "
                         "6 fits 2^16 and 4 fits 2^18 (the float log2(B) epsilon tips exact limb boundaries) in L'=3 at N'=4096 — "
                         "validated empirically in tests/test_noise.py)")
    ap.add_argument("--cpu-slabs", type=int, default=4,
                    help="slabs to sample for the native CPU baseline")
    ap.add_argument("--skip-cpu", action="store_true")
    ap.add_argument("--skip-warm-setup", action="store_true",
                    help="skip the second setup run (the warm run separates "
                         "compile time from real work; VERDICT r2 missing #7)")
    ap.add_argument("--cpu", action="store_true",
                    help="smoke-test on the CPU backend (the default device "
                         "is the axon TPU; env vars alone are ignored)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from ringsnark_tpu.rings.context import default_context
    from ringsnark_tpu.rings.elem import RingElem
    from ringsnark_tpu.encoding import EncodingContext
    from ringsnark_tpu.encoding.noise import plan_inner_chain
    from ringsnark_tpu.snark.api import SnarkParams
    from ringsnark_tpu.snark import groth16
    from ringsnark_tpu.snark import seeded as sd
    from ringsnark_tpu.models.synthetic import build_synthetic_square_chain
    from ringsnark_tpu.ops.primes import find_ntt_primes

    M = 1 << args.log_m
    N = 1 if args.ring == "zq" else args.N
    order = max(1 << (args.log_m + 2), 2 * args.n_inner, 4 * N)
    ring = default_context(L=args.L, N=N, order=order)

    L_inner, floor = plan_inner_chain(
        args.n_inner, 31, M + 1, margin_bits=args.margin, dense=(N > 1)
    )
    inner, below = [], 1 << 31
    while len(inner) < L_inner:
        c = find_ntt_primes(1, 2 * args.n_inner, below=below)[0]
        below = c
        if c not in ring.primes:
            inner.append(c)
    ectx = EncodingContext(
        ring=ring, n_inner=args.n_inner, inner_primes=tuple(inner),
        floor_limbs=floor,
    )
    params = SnarkParams(ring=ring, enc=ectx)
    dev = jax.devices()[0]
    crs_gb = 3 * (M + 1) * args.L * L_inner * args.n_inner * 4 / 2**30
    print(
        f"[cfg] M=2^{args.log_m} constraints, ring={args.ring} N={N} L={args.L}, "
        f"inner N'={args.n_inner} L'={L_inner} floor={floor}, "
        f"CRS c0 ~{crs_gb:.1f} GiB, device={dev}, phased={args.phased}",
        file=sys.stderr, flush=True,
    )

    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    comp, primary, aux = build_synthetic_square_chain(ring, M, rng)
    _sync(aux.res)
    print(f"[build] circuit {time.perf_counter()-t0:.2f}s", file=sys.stderr, flush=True)

    key = jax.random.key(0, impl=args.prng)
    result = {
        "metric": f"groth16_prover_{args.ring}_2e{args.log_m}",
        "unit": "s",
        "config": {
            "M": M, "ring": args.ring, "N": N, "L": args.L,
            "n_inner": args.n_inner, "L_inner": L_inner, "floor": floor,
            "slab": args.slab, "phased": bool(args.phased),
            "device": str(dev),
        },
    }

    # soundness of the benched configuration (Schwartz-Zippel over the
    # exceptional set, per outer limb; docs/qrp.sage:3-7 uses 3 ~60-bit limbs)
    min_pbits = min(int(p).bit_length() for p in ring.primes)
    sz_log2 = args.L * ((args.log_m + 1) - (min_pbits - 1))
    result["soundness_err_log2"] = sz_log2
    print(f"[cfg] soundness error ~2^{sz_log2} "
          f"({args.L} limb(s) of {min_pbits} bits at M=2^{args.log_m})",
          file=sys.stderr, flush=True)

    if not args.phased:
        def setup(seed_rng):
            t0 = time.perf_counter()
            kp = sd.generator_seeded(comp, params, seed_rng, key, slab=args.slab)
            _sync(kp.pk.s_pows.c0, kp.pk.delta_ts.c0,
                  None if kp.pk.delta_mid is None else kp.pk.delta_mid.c0)
            return kp, time.perf_counter() - t0

        kp, setup_cold = setup(rng)
        setup_s = setup_cold
        if not args.skip_warm_setup:
            # identical static shapes -> fully warm; separates jit compile
            # time (the cold-warm gap) from the real setup work.  Release the
            # cold CRS first: HBM holds ~one CRS at 2^16 (9 GiB), and two
            # live keypairs OOM'd the r3 campaign's first zq16 attempt.
            kp = None
            time.sleep(10)  # relay buffer frees are async; let them land
            try:
                kp, setup_s = setup(np.random.default_rng(1))
            except Exception as e:
                print(f"[setup] warm rerun OOM ({type(e).__name__}); "
                      "retrying after 60s settle", file=sys.stderr, flush=True)
                time.sleep(60)
                kp, setup_s = setup(np.random.default_rng(1))
        pk_bits = kp.pk.size_in_bits()
        print(f"[setup] {setup_s:.2f}s (cold incl. compile {setup_cold:.1f}s, "
              f"pk c0 {pk_bits/8/2**30:.2f} GiB)",
              file=sys.stderr, flush=True)

        def prove():
            t0 = time.perf_counter()
            proof = sd.prover_seeded(kp.pk, primary, aux)
            _sync(proof.A.c0, proof.A.c1, proof.B.c0, proof.B.c1,
                  proof.C.c0, proof.C.c1)
            return proof, time.perf_counter() - t0

        proof, prove_cold = prove()
        proof, prove_s = prove()
        print(f"[prove] {prove_s:.3f}s (cold incl. compile {prove_cold:.1f}s)",
              file=sys.stderr, flush=True)

        def verify():
            t0 = time.perf_counter()
            ok = groth16.verifier(kp.vk, primary, proof)
            return ok, time.perf_counter() - t0

        ok, verify_cold = verify()
        assert ok
        ok, verify_s = verify()
        print(f"[verify] {verify_s:.2f}s (cold incl. compile {verify_cold:.1f}s) "
              f"passed={ok}", file=sys.stderr, flush=True)
        assert ok
        result.update(
            value=round(prove_s, 4),
            setup_s=round(setup_s, 2), setup_cold_s=round(setup_cold, 2),
            prove_cold_s=round(prove_cold, 2),
            verify_s=round(verify_s, 2), verify_cold_s=round(verify_cold, 2),
            proof_bits=proof.size_in_bits(), pk_c0_bits=pk_bits,
        )
    else:
        # ---- phased: one CRS batch resident at a time ----------------------
        from ringsnark_tpu.encoding import Encoding, encode, keygen
        from ringsnark_tpu.ops.modops import add_mod
        from ringsnark_tpu.reductions.r1cs_to_qrp import (
            r1cs_to_qrp_instance_map_with_evaluation, _assignment_batches,
            witness_map_kernel_chunked,
        )
        from ringsnark_tpu.utils.poly_arr import ring_batch_scale

        ctx = ring
        t_setup = 0.0
        t_prove = 0.0

        t0 = time.perf_counter()
        from ringsnark_tpu.utils.domain import RootsDomain

        domain = RootsDomain(ctx, M)
        s = RingElem.random_exceptional_element(ctx, rng, domain)
        qrp = r1cs_to_qrp_instance_map_with_evaluation(comp, s, domain)
        _, sk_enc = keygen(ectx, rng)
        alpha = RingElem.random_invertible_element(ctx, rng)
        beta = RingElem.random_invertible_element(ctx, rng)
        gamma = RingElem.random_invertible_element(ctx, rng)
        delta = RingElem.random_invertible_element(ctx, rng)
        delta_inv = delta.inverse()
        combo = (
            ring_batch_scale(qrp.At, beta)
            + ring_batch_scale(qrp.Bt, alpha)
            + qrp.Ct
        )
        n_io = comp.primary_input_size + 1
        gamma_io_ring = ring_batch_scale(
            RingElem(ctx, combo.res[:n_io]), gamma.inverse()
        )
        keys = jax.random.split(key, 6)
        alpha_enc = encode(ectx, sk_enc, RingElem.stack([alpha]), keys[0])[0]
        beta_enc = encode(ectx, sk_enc, RingElem.stack([beta]), keys[1])[0]
        gamma_io = encode(ectx, sk_enc, gamma_io_ring, keys[3])
        _sync(gamma_io.c0)
        t_setup += time.perf_counter() - t0
        print(f"[setup:common] {t_setup:.2f}s", file=sys.stderr, flush=True)

        # witness map (prover side): cold run includes the split-path jit
        # compile (dominant at 2^18 through the relay); the warm rerun on the
        # same static shapes is the real per-proof cost (VERDICT r2 #9)
        def wmap_once():
            t0 = time.perf_counter()
            full, io, mid = _assignment_batches(ctx, primary, aux)
            zero = jnp.zeros((ctx.L, 1), dtype=jnp.uint32)
            (a_io, b_io, c_io, a_mid, b_mid, c_mid, Z, H) = witness_map_kernel_chunked(
                comp, full.res, io.res, mid.res, zero, zero, zero, domain
            )
            a_full = add_mod(a_io, a_mid, ctx.p)
            b_full = add_mod(b_io, b_mid, ctx.p)
            _sync(a_full, b_full, H)
            return (a_full, b_full, H, aux), time.perf_counter() - t0

        (a_full, b_full, H, _), wmap_cold_s = wmap_once()
        (a_full, b_full, H, _), wmap_s = wmap_once()
        t_prove += wmap_s
        print(f"[prove:witness-map] {wmap_s:.2f}s (cold incl. compile "
              f"{wmap_cold_s:.2f}s)", file=sys.stderr, flush=True)

        t_setup_warm = 0.0
        t_prove_warm = 0.0

        def phase(name, ring_batch, enc_key, pts):
            """Encode + consume one CRS phase in --phase-chunk row blocks so
            peak residency is one block's c0, not the whole phase (12.9 GiB
            at 2^18).  Partial inner products accumulate at level 0 — the
            final modswitch chain runs once, so the result is bit-identical
            to the unchunked schedule.  Chunks within a phase share static
            shapes, so chunk 0 carries the jit compile; the *_warm totals
            substitute the median of chunks 1+ for it (per-proof marginal
            cost, matching the unphased path's warm semantics)."""
            nonlocal t_setup, t_prove, t_setup_warm, t_prove_warm
            B = ring_batch.res.shape[0]
            chunk = max(args.slab, min(args.phase_chunk, B))
            partials = None
            chunk_s, chunk_p = [], []
            for ci, lo in enumerate(range(0, B, chunk)):
                sub = RingElem(ctx, ring_batch.res[lo : lo + chunk])
                t0 = time.perf_counter()
                senc = sd.encode_seeded(
                    ectx, sk_enc, sub, jax.random.fold_in(enc_key, ci),
                    args.slab,
                )
                _sync(senc.c0)
                dt_s = time.perf_counter() - t0
                t_setup += dt_s
                chunk_s.append(dt_s)
                t0 = time.perf_counter()
                outs = sd.seeded_inner_product(
                    senc, [pt[lo : lo + chunk] for pt in pts],
                    use_modswitch=False,
                )
                if partials is None:
                    partials = outs
                else:
                    partials = [a + b for a, b in zip(partials, outs)]
                _sync(*[o.c0 for o in partials])
                dt_p = time.perf_counter() - t0
                t_prove += dt_p
                chunk_p.append(dt_p)
                print(
                    f"[phase:{name}+{lo}] setup {dt_s:.2f}s prove {dt_p:.2f}s",
                    file=sys.stderr, flush=True,
                )
                del senc
            for ts, acc in ((chunk_s, "s"), (chunk_p, "p")):
                warm = (sorted(ts[1:])[len(ts[1:]) // 2]
                        if len(ts) > 1 else ts[0])
                tot = warm + sum(ts[1:])
                if acc == "s":
                    t_setup_warm += tot
                else:
                    t_prove_warm += tot
            t0 = time.perf_counter()
            outs = []
            max_level = (
                max(ectx.L_inner - ectx.floor_limbs, 0)
                if params.use_modswitch else 0
            )
            for e in partials:
                for _ in range(max_level):
                    e = e.modswitch()
                outs.append(e)
            _sync(*[o.c0 for o in outs])
            dt_ms = time.perf_counter() - t0
            t_prove += dt_ms
            t_prove_warm += dt_ms
            return outs

        s_pows_ring = qrp.Ht
        A_ip, B_ip = phase("s_pows", RingElem(ctx, s_pows_ring.res), keys[2],
                           [a_full, b_full])
        delta_ts_ring = ring_batch_scale(
            ring_batch_scale(qrp.Ht, qrp.Zt), delta_inv
        )
        (C_ip,) = phase("delta_ts", delta_ts_ring, keys[5], [H])
        delta_mid_ring = ring_batch_scale(
            RingElem(ctx, combo.res[n_io:]), delta_inv
        )
        (mid_ip,) = phase("delta_mid", delta_mid_ring, keys[4], [aux.res])

        t0 = time.perf_counter()
        proof = groth16.Proof(
            A=A_ip + alpha_enc, B=B_ip + beta_enc, C=C_ip + mid_ip
        )
        _sync(proof.A.c0, proof.C.c0)
        dt_fin = time.perf_counter() - t0
        t_prove += dt_fin
        t_prove_warm += dt_fin + wmap_s  # t_prove got wmap_s at the wmap step
        print(f"[totals] setup {t_setup:.2f}s prove {t_prove:.2f}s "
              f"(warm: setup {t_setup_warm:.2f}s prove {t_prove_warm:.2f}s)",
              file=sys.stderr, flush=True)

        # free the prover's Rq-scale intermediates before verify: at N=8192
        # the QRP eval / witness-poly / phase ring batches still referenced
        # here total ~6-8 GiB, and the verifier's eager io-interpolation
        # OOM'd HBM next to them (rq14 first pass)
        del a_full, b_full, H, qrp, combo, aux
        del s_pows_ring, delta_ts_ring, delta_mid_ring
        del A_ip, B_ip, C_ip, mid_ip
        time.sleep(5)  # relay frees are async

        # verify via a CRS-less SeededProvingKey (verifier touches only
        # compiled/domain/params/gamma_io)
        pk = sd.SeededProvingKey(
            compiled=comp, domain=domain, params=params, alpha=alpha_enc,
            beta=beta_enc, s_pows=None, gamma_io=gamma_io, delta_mid=None,
            delta_ts=None,
        )
        vk = groth16.VerificationKey(pk=pk, s=s, alpha=alpha, beta=beta,
                                     gamma=gamma, delta=delta, sk_enc=sk_enc)
        t0 = time.perf_counter()
        ok = groth16.verifier(vk, primary, proof)
        verify_s = time.perf_counter() - t0
        print(f"[verify] {verify_s:.2f}s passed={ok}", file=sys.stderr, flush=True)
        assert ok
        result.update(
            value=round(t_prove_warm, 4),
            prove_cold_s=round(t_prove + (wmap_cold_s - wmap_s), 2),
            setup_s=round(t_setup_warm, 2), setup_cold_s=round(t_setup, 2),
            verify_s=round(verify_s, 2), proof_bits=proof.size_in_bits(),
            witness_map_s=round(wmap_s, 3),
            witness_map_cold_s=round(wmap_cold_s, 2),
        )

    # ---- native CPU baseline (same-algorithm MAC, sampled + scaled) --------
    if not args.skip_cpu:
        from ringsnark_tpu import native

        if native.available():
            native.set_threads(native.max_threads())
            S = args.slab
            n = L_inner * args.n_inner
            crng = np.random.default_rng(7)
            ct = crng.integers(0, inner[0], (S, n), dtype=np.uint64).astype(np.uint32)
            pt = crng.integers(0, inner[0], (S, n), dtype=np.uint64).astype(np.uint32)
            # warm + sample
            native.ip_accumulate(ct[:8], pt[:8], inner[0])
            t0 = time.perf_counter()
            for _ in range(args.cpu_slabs):
                native.ip_accumulate(ct, pt, inner[0])
            per_slab = (time.perf_counter() - t0) / args.cpu_slabs
            # full prover MAC: 4 IP-sides x 2 components x L x (M+1) terms
            n_slabs_total = 4 * 2 * args.L * ((M + 1) / S)
            cpu_mac_s = per_slab * n_slabs_total
            print(
                f"[cpu] native MAC ({native.max_threads()} threads): "
                f"{per_slab*1e3:.1f} ms/slab -> full prover MAC ~{cpu_mac_s:.1f}s "
                f"(lower bound: witness map excluded)",
                file=sys.stderr, flush=True,
            )
            result["cpu_mac_s"] = round(cpu_mac_s, 2)
            result["cpu_threads"] = native.max_threads()
            result["vs_baseline"] = round(cpu_mac_s / result["value"], 2)

    print(json.dumps(result), flush=True)
    if args.out:
        with open(args.out, "a") as f:
            f.write(json.dumps(result) + "\n")


if __name__ == "__main__":
    main()
