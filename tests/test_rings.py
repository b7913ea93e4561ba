"""Ring layer tests: slot-form arithmetic vs Python-int negacyclic oracle."""

import numpy as np
import pytest

from ringsnark_tpu.rings.context import RingContext, default_context
from ringsnark_tpu.rings.elem import RingElem
from ringsnark_tpu.rings.oracle import OracleContext, OracleElem
from ringsnark_tpu.ops import primes as pr


@pytest.fixture(scope="module")
def rq():
    return default_context(L=2, N=16, order=1 << 12)


@pytest.fixture(scope="module")
def zq():
    return default_context(L=3, N=1, order=1 << 12)


def _poly_oracle_mul(a_coeffs, b_coeffs, q, N):
    out = [0] * N
    for i, x in enumerate(a_coeffs):
        for j, y in enumerate(b_coeffs):
            if i + j < N:
                out[(i + j) % N] += x * y
            else:
                out[(i + j) % N] -= x * y
    return [v % q for v in out]


def _rand_int(rng, q):
    return int.from_bytes(rng.bytes(16), "little") % q


def test_scalar_ring_matches_int_arith(zq):
    rng = np.random.default_rng(0)
    q = zq.q
    for _ in range(10):
        x, y = _rand_int(rng, q), _rand_int(rng, q)
        a, b = RingElem.scalar(zq, x), RingElem.scalar(zq, y)
        assert (a + b).to_int() == (x + y) % q
        assert (a - b).to_int() == (x - y) % q
        assert (a * b).to_int() == (x * y) % q
        assert (-a).to_int() == (-x) % q
        assert a.pow(7).to_int() == pow(x, 7, q)


def test_scalar_inverse(zq):
    rng = np.random.default_rng(1)
    e = RingElem.random_invertible_element(zq, rng)
    assert (e * e.inverse()) == RingElem.one(zq)
    assert e / e == RingElem.one(zq)


def test_poly_mul_matches_negacyclic_oracle(rq):
    rng = np.random.default_rng(2)
    q, N = rq.q, rq.N
    ac = [_rand_int(rng, q) for _ in range(N)]
    bc = [_rand_int(rng, q) for _ in range(N)]
    a = RingElem.from_int_coeffs(rq, ac)
    b = RingElem.from_int_coeffs(rq, bc)
    c = a * b
    ref = _poly_oracle_mul(ac, bc, q, N)
    got = np.asarray(c.to_coeffs())
    for limb, p in enumerate(rq.primes):
        for j in range(N):
            assert int(got[limb, j]) == ref[j] % p


def test_scalar_poly_promotion(rq):
    rng = np.random.default_rng(3)
    s = RingElem.scalar(rq, 7)
    e = RingElem.random_element(rq, rng)
    assert s.is_scalar and e.is_poly
    prod = s * e
    assert prod.is_poly
    # scalar multiplies every slot
    got = np.asarray(prod.res)
    want = np.asarray((e * RingElem.scalar(rq, 7)).res)
    assert (got == want).all()
    # constant poly == scalar (to_poly semantics, seal_ring.tcc:265-277)
    const_poly = RingElem.from_int_coeffs(rq, [7])
    assert s.broadcast_to_poly() == const_poly


def test_coeff_slot_roundtrip(rq):
    rng = np.random.default_rng(4)
    e = RingElem.random_element(rq, rng)
    back = RingElem.from_coeffs(rq, e.to_coeffs())
    assert back == e


def test_batching_and_stack(rq):
    rng = np.random.default_rng(5)
    es = [RingElem.random_element(rq, rng) for _ in range(4)] + [
        RingElem.scalar(rq, 3)
    ]
    batch = RingElem.stack(es)
    assert batch.batch_shape == (5,)
    assert batch[0] == es[0]
    assert batch[4] == RingElem.scalar(rq, 3).broadcast_to_poly()
    # batched arithmetic == per-element arithmetic
    s = batch * batch
    for i, e in enumerate(es):
        assert s[i] == (e * e).broadcast_to_poly()


def test_zero_one_predicates(rq):
    assert RingElem.zero(rq).is_zero()
    assert not RingElem.one(rq).is_zero()
    assert RingElem.one(rq).is_invertible()
    assert not RingElem.zero(rq).is_invertible()


def test_oracle_ring_consistency():
    ps = pr.find_ntt_primes(2, 1 << 12)
    zq = RingContext(primes=tuple(ps), N=1)
    oc = OracleContext(ps)
    rng = np.random.default_rng(6)
    x, y = _rand_int(rng, oc.q), _rand_int(rng, oc.q)
    a, b = RingElem.scalar(zq, x), RingElem.scalar(zq, y)
    oa, ob = OracleElem(oc, x), OracleElem(oc, y)
    assert (a * b + a - b).to_int() == (oa * ob + oa - ob).to_int()
    assert (a.pow(11)).to_int() == oa.pow(11).to_int()
