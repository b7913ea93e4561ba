"""NTT tests: inverse round-trip, naive-DFT cross-check, convolution theorem."""

import numpy as np
import jax.numpy as jnp

from ringsnark_tpu.ops import primes as pr
from ringsnark_tpu.ops import ntt as nttm


def _naive_dft(x, w, p):
    M = len(x)
    return np.array(
        [sum(int(x[i]) * pow(w, i * k, p) for i in range(M)) % p for k in range(M)],
        dtype=np.uint64,
    )


def test_cyclic_roundtrip_and_dft():
    ps = tuple(pr.find_ntt_primes(2, 1 << 12))
    M = 16
    plan = nttm.get_plan(ps, M)
    rng = np.random.default_rng(2)
    x_np = np.stack([rng.integers(0, q, M, dtype=np.uint64) for q in ps]).astype(np.uint32)
    x = jnp.asarray(x_np)

    y = nttm.cyclic_ntt_rev(x, plan)
    back = np.array(nttm.cyclic_intt_nat(y, plan))
    assert (back == x_np).all()

    br = nttm.bitrev_indices(M)
    y_np = np.array(y)
    for i, q in enumerate(ps):
        ref = _naive_dft(x_np[i], plan.w_np[i], q)
        assert (y_np[i].astype(np.uint64) == ref[br]).all()


def test_eval_points_match_output_order():
    ps = tuple(pr.find_ntt_primes(1, 1 << 12))
    M = 8
    plan = nttm.get_plan(ps, M)
    q = ps[0]
    # polynomial with known coefficients: f(t) = 3 + 2t + t^2
    coeffs = np.zeros((1, M), dtype=np.uint32)
    coeffs[0, :3] = [3, 2, 1]
    y = np.array(nttm.cyclic_ntt_rev(jnp.asarray(coeffs), plan))[0]
    for j in range(M):
        t = int(plan.eval_points_np[0, j])
        assert int(y[j]) == (3 + 2 * t + t * t) % q


def test_negacyclic_convolution():
    ps = tuple(pr.find_ntt_primes(2, 1 << 13))
    M = 32
    plan = nttm.get_plan(ps, M, negacyclic=True)
    rng = np.random.default_rng(3)
    a_np = np.stack([rng.integers(0, q, M, dtype=np.uint64) for q in ps]).astype(np.uint32)
    b_np = np.stack([rng.integers(0, q, M, dtype=np.uint64) for q in ps]).astype(np.uint32)
    a, b = jnp.asarray(a_np), jnp.asarray(b_np)

    fa = nttm.negacyclic_ntt_rev(a, plan)
    fb = nttm.negacyclic_ntt_rev(b, plan)
    from ringsnark_tpu.ops.modops import mul_mod

    fc = mul_mod(fa, fb, plan.p, plan.mu, plan.pbits)
    c = np.array(nttm.negacyclic_intt_nat(fc, plan)).astype(np.int64)

    # schoolbook negacyclic product mod X^M + 1
    for i, q in enumerate(ps):
        ref = np.zeros(M, dtype=object)
        for j in range(M):
            for k in range(M):
                v = int(a_np[i, j]) * int(b_np[i, k])
                if j + k < M:
                    ref[(j + k) % M] += v
                else:
                    ref[(j + k) % M] -= v
        ref = np.array([int(v) % q for v in ref])
        assert (c[i] == ref).all()


def test_batched_shapes():
    ps = tuple(pr.find_ntt_primes(3, 1 << 12))
    M = 64
    plan = nttm.get_plan(ps, M)
    rng = np.random.default_rng(4)
    x = np.stack(
        [
            np.stack([rng.integers(0, q, M, dtype=np.uint64) for q in ps])
            for _ in range(5)
        ]
    ).astype(np.uint32)  # [5, L, M]
    y = nttm.cyclic_ntt_rev(jnp.asarray(x), plan)
    back = np.array(nttm.cyclic_intt_nat(y, plan))
    assert back.shape == x.shape
    assert (back == x).all()
