"""Unit tests for ops.primes and ops.modops against Python-int ground truth."""

import numpy as np
import jax.numpy as jnp

from ringsnark_tpu.ops import primes as pr
from ringsnark_tpu.ops import modops as mo


def test_is_prime_small():
    known = {2, 3, 5, 7, 11, 13, 97, 12289, 786433}
    for n in range(2, 100):
        assert pr.is_prime(n) == (n in known or all(n % d for d in range(2, n)))
    assert pr.is_prime(0xFFFFEE001)  # qrp.sage q1 (36-bit)
    assert not pr.is_prime(0xFFFFEE001 + 2)


def test_find_ntt_primes():
    ps = pr.find_ntt_primes(6, 1 << 21)
    assert len(ps) == 6
    for p in ps:
        assert pr.is_prime(p)
        assert (p - 1) % (1 << 21) == 0
        assert 1 << 30 <= p < 1 << 31
    assert ps == sorted(ps, reverse=True)


def test_roots_of_unity():
    p = pr.find_ntt_primes(1, 1 << 21)[0]
    for order in (2, 8, 1 << 21):
        w = pr.root_of_unity(p, order)
        assert pow(w, order, p) == 1
        assert pow(w, order // 2, p) != 1


def test_crt_roundtrip():
    ps = pr.find_ntt_primes(4, 1 << 12)
    import math

    q = math.prod(ps)
    rng = np.random.default_rng(0)
    for _ in range(20):
        x = int(rng.integers(0, 2**63)) % q
        assert pr.crt_compose(pr.crt_decompose(x, ps), ps) == x


def _limb_consts(ps):
    info = [pr.make_prime(p) for p in ps]
    p = jnp.asarray(np.array(ps, dtype=np.uint32))[:, None]
    mu = jnp.asarray(np.array([i.mu for i in info], dtype=np.uint64))[:, None]
    b = jnp.asarray(np.array([i.bits for i in info], dtype=np.uint32))[:, None]
    return p, mu, b


def test_modops_vs_python():
    ps = pr.find_ntt_primes(3, 1 << 21) + pr.find_ntt_primes(1, 1 << 12, below=1 << 31)
    # exercise different bit-lengths too
    p, mu, b = _limb_consts(ps)
    L = len(ps)
    rng = np.random.default_rng(1)
    n = 64
    a_np = np.stack([rng.integers(0, q, n, dtype=np.uint64) for q in ps]).astype(np.uint32)
    b_np = np.stack([rng.integers(0, q, n, dtype=np.uint64) for q in ps]).astype(np.uint32)
    a, bb = jnp.asarray(a_np), jnp.asarray(b_np)

    add = np.array(mo.add_mod(a, bb, p))
    sub = np.array(mo.sub_mod(a, bb, p))
    mul = np.array(mo.mul_mod(a, bb, p, mu, b))
    neg = np.array(mo.neg_mod(a, p))
    inv = np.array(mo.inv_mod(jnp.where(a == 0, 1, a), p, mu, b))
    powr = np.array(mo.pow_mod(a, jnp.asarray(np.full((L, 1), 5, np.uint64)), p, mu, b))

    for i, q in enumerate(ps):
        for j in range(n):
            x, y = int(a_np[i, j]), int(b_np[i, j])
            assert int(add[i, j]) == (x + y) % q
            assert int(sub[i, j]) == (x - y) % q
            assert int(mul[i, j]) == (x * y) % q
            assert int(neg[i, j]) == (-x) % q
            xx = x if x else 1
            assert int(inv[i, j]) == pow(xx, -1, q)
            assert int(powr[i, j]) == pow(x, 5, q)


def test_barrett_edge_cases():
    ps = [pr.find_ntt_primes(1, 1 << 21)[0]]
    p, mu, b = _limb_consts(ps)
    q = ps[0]
    edge = np.array([[0, 1, q - 1, q - 2, (q - 1) // 2]], dtype=np.uint32)
    a = jnp.asarray(edge)
    mul = np.array(mo.mul_mod(a, a, p, mu, b))
    for j in range(edge.shape[1]):
        x = int(edge[0, j])
        assert int(mul[0, j]) == (x * x) % q
