"""Noise-budget estimator sanity + floor_limbs behaviour."""

import numpy as np
import pytest
import jax

from ringsnark_tpu.rings.context import default_context
from ringsnark_tpu.rings.elem import RingElem
from ringsnark_tpu.encoding import EncodingContext, keygen, encode, decode, inner_product
from ringsnark_tpu.encoding.noise import (
    inner_product_noise_bits,
    budget_after_inner_product,
    plan_inner_chain,
    required_inner_limbs,
)
from ringsnark_tpu.ops.primes import find_ntt_primes


def _ectx(floor=2, L_inner=4):
    ring = default_context(L=2, N=16, order=1 << 12)
    inner, below = [], 1 << 31
    while len(inner) < L_inner:
        c = find_ntt_primes(1, 64, below=below)[0]
        below = c
        if c not in ring.primes:
            inner.append(c)
    return EncodingContext(
        ring=ring, n_inner=32, inner_primes=tuple(inner), floor_limbs=floor
    )


def test_estimator_monotonic_in_terms():
    e = _ectx()
    # sum-then-switch: post-switch noise is non-decreasing in terms, and the
    # /Q of the dropped limbs absorbs the batch factor entirely once the sum
    # fits — so compare at level 0 (floor = L_inner, no switches) for strict
    # monotonicity.
    assert inner_product_noise_bits(e, 1024) >= inner_product_noise_bits(e, 16)
    e0 = _ectx(floor=4)
    assert inner_product_noise_bits(e0, 1024) > inner_product_noise_bits(e0, 16)
    assert budget_after_inner_product(e0, 16) > budget_after_inner_product(e0, 1024)


def test_plan_inner_chain_reasonable():
    # realistic: N'=16384, 31-bit t, 2^14 terms
    l, floor = plan_inner_chain(16384, 31, 1 << 14)
    assert 2 <= floor < l <= 14
    # north-star scale: 2^18 terms still plans a feasible chain
    l2, floor2 = plan_inner_chain(16384, 31, 1 << 18)
    assert floor2 >= floor and l2 >= l
    assert required_inner_limbs(16384, 31, 1 << 14) == l


def test_floor_limbs_controls_final_level():
    rng = np.random.default_rng(0)
    for floor in (2, 3):
        e = _ectx(floor=floor)
        _, sk = keygen(e, rng)
        msgs = RingElem.stack(
            [RingElem.random_element(e.ring, rng) for _ in range(6)]
        )
        coefs = RingElem.stack(
            [RingElem.random_element(e.ring, rng) for _ in range(6)]
        )
        enc = encode(e, sk, msgs, jax.random.PRNGKey(floor))
        res = inner_product(enc, coefs)
        assert res.level == e.L_inner - floor
        want = RingElem.zero(e.ring)
        for i in range(6):
            want = want + msgs[i] * coefs[i]
        assert decode(e, sk, res) == want.broadcast_to_poly()
