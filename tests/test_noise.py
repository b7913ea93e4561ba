"""Noise-budget estimator sanity + floor_limbs behaviour."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

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


def _stress_ectx(N, L_inner, n_inner=64, floor=2, margin=10):
    """Context sized by the planner for a B-term inner product."""
    ring = default_context(L=1, N=N, order=4 * n_inner)
    inner, below = [], 1 << 31
    while len(inner) < L_inner:
        c = find_ntt_primes(1, 2 * n_inner, below=below)[0]
        below = c
        if c not in ring.primes:
            inner.append(c)
    return EncodingContext(
        ring=ring, n_inner=n_inner, inner_primes=tuple(inner), floor_limbs=floor
    )


@pytest.mark.parametrize(
    "N,B,L_inner",
    [
        (1, 512, 3),
        pytest.param(16, 512, 4, marks=pytest.mark.slow),
        pytest.param(1, 4096, 3, marks=pytest.mark.slow),
        pytest.param(16, 2048, 4, marks=pytest.mark.slow),
    ],
)
def test_empirical_noise_within_planner_floor(N, B, L_inner):
    """VERDICT r1 #7: measured (exact big-int oracle) budget after a B-term
    inner product must be at least the worst-case model's prediction, the
    planner's chain must decode, and the float-CRT device decode must agree
    with the oracle bit-for-bit at stressed noise."""
    from ringsnark_tpu.encoding.bgv import decrypt_to_slots, decrypt_to_slots_exact
    from ringsnark_tpu.encoding.noise import (
        budget_after_inner_product, plan_inner_chain,
    )

    dense = N > 1
    li, floor = plan_inner_chain(64, 31, B, dense=dense)
    # planner may ask for more limbs than the sweep point; take the max so
    # the config is one the planner itself would emit
    L_use = max(li, L_inner)
    ectx = _stress_ectx(N, L_use, floor=floor)
    rng = np.random.default_rng(B + N)
    _, sk = keygen(ectx, rng)
    msgs = RingElem(
        ectx.ring,
        jnp.asarray(
            np.stack(
                [rng.integers(0, p, (B, N), dtype=np.uint64) for p in ectx.ring.primes],
                axis=1,
            ).astype(np.uint32)
        ),
    )
    coefs = RingElem(
        ectx.ring,
        jnp.asarray(
            np.stack(
                [rng.integers(0, p, (B, N), dtype=np.uint64) for p in ectx.ring.primes],
                axis=1,
            ).astype(np.uint32)
        ),
    )
    enc = encode(ectx, sk, msgs, jax.random.PRNGKey(B))
    res = inner_product(enc, coefs)

    slots_dev, budget_dev = decrypt_to_slots(ectx, sk, (res.c0, res.c1), res.level)
    slots_exact, budget_exact = decrypt_to_slots_exact(
        ectx, sk, (res.c0, res.c1), res.level
    )
    # float-CRT device path == big-int oracle, values and budget
    assert (np.asarray(slots_dev) == np.asarray(slots_exact)).all()
    assert (np.abs(budget_dev.astype(np.int64) - budget_exact) <= 1).all()
    # decode succeeds and the worst-case model lower-bounds the real budget
    assert (budget_exact > 0).all()
    model_floor = budget_after_inner_product(ectx, B)
    assert (budget_exact >= np.floor(model_floor)).all(), (
        budget_exact, model_floor
    )
    # value correct
    got = decode(ectx, sk, res)
    from ringsnark_tpu.ops.modops import mul_mod

    pr = mul_mod(msgs.res, coefs.res, ectx.ring.p, ectx.ring.mu, ectx.ring.pbits)
    for l, p in enumerate(ectx.ring.primes):
        acc_l = np.asarray(pr)[:, l, :].astype(np.uint64).sum(axis=0) % p
        assert (np.asarray(got.res)[l, :N] == acc_l.astype(np.uint32)).all()
