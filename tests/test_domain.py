"""Evaluation-domain tests: Lagrange/vanishing closed forms vs generic math."""

import numpy as np
import pytest

from ringsnark_tpu.rings.context import default_context
from ringsnark_tpu.rings.elem import RingElem
from ringsnark_tpu.rings.oracle import OracleContext, OracleElem
from ringsnark_tpu.utils.domain import RootsDomain, IntegerDomain
from ringsnark_tpu.utils import poly as _poly
from ringsnark_tpu.ops import primes as pr


@pytest.fixture(scope="module")
def ctx():
    return default_context(L=2, N=1, order=1 << 12)


def test_roots_domain_points_are_exceptional(ctx):
    dom = RootsDomain(ctx, 8)
    pts = [dom.get_domain_element(i) for i in range(dom.m)]
    for i in range(dom.m):
        for j in range(i + 1, dom.m):
            assert (pts[i] - pts[j]).is_invertible()


def test_roots_vanishing_matches_product(ctx):
    dom = RootsDomain(ctx, 8)
    rng = np.random.default_rng(0)
    t = dom.random_exceptional(rng)
    direct = dom.compute_vanishing_polynomial(t)
    prod = RingElem.one(ctx)
    for i in range(dom.m):
        prod = prod * (t - dom.get_domain_element(i))
    assert direct == prod
    # coefficient form evaluates identically
    z = dom.vanishing_polynomial()
    assert _poly.eval_poly(z, t) == direct


def test_roots_lagrange_matches_generic(ctx):
    dom = RootsDomain(ctx, 8)
    rng = np.random.default_rng(1)
    t = dom.random_exceptional(rng)
    fast = dom.evaluate_all_lagrange_polynomials(t)
    # O(m^2) direct formula
    one = RingElem.one(ctx)
    for j in range(dom.m):
        num, den = one, one
        for i in range(dom.m):
            if i != j:
                num = num * (t - dom.get_domain_element(i))
                den = den * (dom.get_domain_element(j) - dom.get_domain_element(i))
        assert fast[j] == num / den


def test_roots_lagrange_interpolation_property(ctx):
    # sum_j y_j L_j(t) == interpolated_poly(t)
    dom = RootsDomain(ctx, 4)
    rng = np.random.default_rng(2)
    ys = [RingElem.random_element(ctx, rng) for _ in range(dom.m)]
    t = dom.random_exceptional(rng)
    lag = dom.evaluate_all_lagrange_polynomials(t)
    via_lagrange = sum((lag[j] * ys[j] for j in range(dom.m)), RingElem.zero(ctx))
    xs = [dom.get_domain_element(i) for i in range(dom.m)]
    coeffs = _poly.interpolate(xs, ys)
    assert _poly.eval_poly(coeffs, t) == via_lagrange


def test_roots_interpolate_arr_matches_generic(ctx):
    dom = RootsDomain(ctx, 8)
    rng = np.random.default_rng(3)
    ys = [RingElem.random_element(ctx, rng) for _ in range(dom.m)]
    xs = [dom.get_domain_element(i) for i in range(dom.m)]
    gen = _poly.interpolate(xs, ys)
    import jax.numpy as jnp

    evals = RingElem.stack(ys).res  # [M, L, 1]
    arr = jnp.transpose(evals, (2, 1, 0))  # [1, L, M]
    fast = np.array(dom.interpolate_arr(arr))[0]  # [L, M]
    for k in range(dom.m):
        assert RingElem(ctx, jnp.asarray(fast[:, k : k + 1])) == gen[k]


def test_roots_divide_by_z(ctx):
    dom = RootsDomain(ctx, 4)
    rng = np.random.default_rng(4)
    # P = Q * Z for random Q of degree m-2
    Q = [RingElem.random_element(ctx, rng) for _ in range(dom.m - 1)]
    P = _poly.multiply(Q, dom.vanishing_polynomial())
    got = dom.divide_by_Z(P)
    assert len(got) >= len(Q)
    for i in range(len(Q)):
        assert got[i] == Q[i]
    for i in range(len(Q), len(got)):
        assert got[i].is_zero()


def test_integer_domain_matches_reference_semantics():
    # over the oracle ring: interpolation round-trip and Lagrange identity
    ps = pr.find_ntt_primes(2, 1 << 12)
    oc = OracleContext(ps)
    dom = IntegerDomain(oc, 6, elem_cls=OracleElem)
    rng = np.random.default_rng(5)
    ys = [OracleElem(oc, int(rng.integers(0, 10**6))) for _ in range(6)]
    xs = dom.elements()
    coeffs = _poly.interpolate(xs, ys)
    for x, y in zip(xs, ys):
        assert _poly.eval_poly(coeffs, x) == y
    t = dom.random_exceptional(rng)
    lag = dom.evaluate_all_lagrange_polynomials(t)
    direct = _poly.eval_poly(coeffs, t)
    via = sum((lag[j] * ys[j] for j in range(6)), OracleElem(oc, 0))
    assert direct == via


def test_integer_domain_division(ctx):
    dom = IntegerDomain(ctx, 5)
    rng = np.random.default_rng(6)
    Q = [RingElem.random_element(ctx, rng) for _ in range(4)]
    P = _poly.multiply(Q, dom.vanishing_polynomial())
    got = dom.divide_by_Z(P)
    assert len(got) == len(Q)
    for a, b in zip(got, Q):
        assert a == b
