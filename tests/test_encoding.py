"""BGV encoding tests: decode∘encode identity, homomorphisms, modswitch,
inner products with the staged-modswitch schedule, noise-budget errors.

Mirrors the reference's `encoding_test.cpp:28-49` (decode∘encode identity for
fixed + random elements) and extends it with the homomorphic-op coverage the
reference lacks.
"""

import numpy as np
import pytest
import jax

from ringsnark_tpu.rings.context import default_context
from ringsnark_tpu.rings.elem import RingElem
from ringsnark_tpu.encoding import (
    Encoding,
    EncodingContext,
    DecodingError,
    keygen,
    encode,
    decode,
    inner_product,
)
from ringsnark_tpu.encoding.context import default_inner_primes


@pytest.fixture(scope="module")
def setup():
    ring = default_context(L=2, N=16, order=1 << 12)
    n_inner = 32
    # small N' for test speed: find primes ≡ 1 mod 2*n_inner (the security
    # budget assert is bypassed by picking n_inner-appropriate prime counts
    # in EncodingContext only for realistic sizes; tests use tiny N')
    from ringsnark_tpu.ops.primes import find_ntt_primes

    inner = []
    below = 1 << 31
    while len(inner) < 3:
        c = find_ntt_primes(1, 2 * n_inner, below=below)[0]
        below = c
        if c not in ring.primes:
            inner.append(c)
    ctx = EncodingContext(ring=ring, n_inner=n_inner, inner_primes=tuple(inner))
    rng = np.random.default_rng(42)
    _, sk = keygen(ctx, rng)
    return ctx, sk, rng


def test_decode_encode_identity_fixed(setup):
    ctx, sk, rng = setup
    r = RingElem.scalar(ctx.ring, 5260053)  # encoding_test.cpp:33 fixed value
    e = encode(ctx, sk, RingElem.stack([r]), jax.random.PRNGKey(0))
    out = decode(ctx, sk, e[0])
    assert out == r.broadcast_to_poly()


def test_decode_encode_identity_random_batch(setup):
    ctx, sk, rng = setup
    rs = RingElem.stack([RingElem.random_element(ctx.ring, rng) for _ in range(4)])
    e = encode(ctx, sk, rs, jax.random.PRNGKey(1))
    for i in range(4):
        assert decode(ctx, sk, e[i]) == rs[i]


def test_homomorphic_add(setup):
    ctx, sk, rng = setup
    a = RingElem.random_element(ctx.ring, rng)
    b = RingElem.random_element(ctx.ring, rng)
    eb = encode(ctx, sk, RingElem.stack([a, b]), jax.random.PRNGKey(2))
    s = eb[0] + eb[1]
    assert decode(ctx, sk, s) == a + b


def test_homomorphic_mul_plain(setup):
    ctx, sk, rng = setup
    a = RingElem.random_element(ctx.ring, rng)
    r = RingElem.random_element(ctx.ring, rng)
    e = encode(ctx, sk, RingElem.stack([a]), jax.random.PRNGKey(3))[0]
    assert decode(ctx, sk, e * r) == a * r


def test_mul_plain_by_scalar(setup):
    ctx, sk, rng = setup
    a = RingElem.random_element(ctx.ring, rng)
    r = RingElem.scalar(ctx.ring, 12345)
    e = encode(ctx, sk, RingElem.stack([a]), jax.random.PRNGKey(4))[0]
    assert decode(ctx, sk, e * r) == a * r


def test_modswitch_preserves_plaintext(setup):
    ctx, sk, rng = setup
    a = RingElem.random_element(ctx.ring, rng)
    e = encode(ctx, sk, RingElem.stack([a]), jax.random.PRNGKey(5))[0]
    e1 = e.modswitch()
    assert e1.level == 1
    assert decode(ctx, sk, e1) == a
    # one limb left: t ≈ Q_j leaves no noise headroom — budget exhausted
    with pytest.raises(DecodingError):
        decode(ctx, sk, e1.modswitch())


def test_add_mismatched_levels(setup):
    ctx, sk, rng = setup
    a = RingElem.random_element(ctx.ring, rng)
    b = RingElem.random_element(ctx.ring, rng)
    eb = encode(ctx, sk, RingElem.stack([a, b]), jax.random.PRNGKey(6))
    s = eb[0].modswitch() + eb[1]  # auto-aligns levels
    assert decode(ctx, sk, s) == a + b


def test_inner_product_no_modswitch(setup):
    ctx, sk, rng = setup
    B = 8
    msgs = RingElem.stack([RingElem.random_element(ctx.ring, rng) for _ in range(B)])
    coefs = RingElem.stack([RingElem.random_element(ctx.ring, rng) for _ in range(B)])
    e = encode(ctx, sk, msgs, jax.random.PRNGKey(7))
    got = decode(ctx, sk, inner_product(e, coefs, use_modswitch=False))
    want = RingElem.zero(ctx.ring)
    for i in range(B):
        want = want + msgs[i] * coefs[i]
    assert got == want.broadcast_to_poly()


def test_inner_product_with_modswitch_schedule(setup):
    ctx, sk, rng = setup
    B = 10
    msgs = RingElem.stack([RingElem.random_element(ctx.ring, rng) for _ in range(B)])
    coefs = RingElem.stack([RingElem.random_element(ctx.ring, rng) for _ in range(B)])
    e = encode(ctx, sk, msgs, jax.random.PRNGKey(8))
    res = inner_product(e, coefs, use_modswitch=True)
    assert res.level >= 1  # every term switched at least once
    got = decode(ctx, sk, res)
    want = RingElem.zero(ctx.ring)
    for i in range(B):
        want = want + msgs[i] * coefs[i]
    assert got == want.broadcast_to_poly()


def test_inner_product_with_zero_terms(setup):
    ctx, sk, rng = setup
    B = 6
    msgs = RingElem.stack([RingElem.random_element(ctx.ring, rng) for _ in range(B)])
    coef_list = [RingElem.random_element(ctx.ring, rng) for _ in range(B)]
    coef_list[2] = RingElem.zero(ctx.ring)
    coef_list[5] = RingElem.zero(ctx.ring)
    coefs = RingElem.stack(coef_list)
    e = encode(ctx, sk, msgs, jax.random.PRNGKey(9))
    got = decode(ctx, sk, inner_product(e, coefs))
    want = RingElem.zero(ctx.ring)
    for i in range(B):
        want = want + msgs[i] * coef_list[i]
    assert got == want.broadcast_to_poly()


def test_transparent_zero(setup):
    ctx, sk, rng = setup
    z = Encoding.zero(ctx)
    assert decode(ctx, sk, z).is_zero()
    a = RingElem.random_element(ctx.ring, rng)
    e = encode(ctx, sk, RingElem.stack([a]), jax.random.PRNGKey(10))[0]
    assert decode(ctx, sk, e + z) == a


def test_noise_budget_exhaustion_raises(setup):
    ctx, sk, rng = setup
    a = RingElem.random_element(ctx.ring, rng)
    e = encode(ctx, sk, RingElem.stack([a]), jax.random.PRNGKey(11))[0]
    # square the noise away: repeatedly multiply by large plaintexts
    big = RingElem.random_element(ctx.ring, rng)
    for _ in range(12):
        e = e * big
        a = a * big
    with pytest.raises(DecodingError):
        decode(ctx, sk, e)


def test_device_decrypt_matches_exact_oracle(setup):
    from ringsnark_tpu.encoding import bgv

    ctx, sk, rng = setup
    msgs = RingElem.stack([RingElem.random_element(ctx.ring, rng) for _ in range(3)])
    e = encode(ctx, sk, msgs, jax.random.PRNGKey(77))
    # also exercise a switched level
    for enc_obj in (e, e.modswitch()):
        ct = (enc_obj.c0, enc_obj.c1)
        s_fast, b_fast = bgv.decrypt_to_slots(ctx, sk, ct, enc_obj.level)
        s_ex, b_ex = bgv.decrypt_to_slots_exact(ctx, sk, ct, enc_obj.level)
        assert (s_fast == s_ex).all()
        # budgets agree within the float error floor
        assert (np.abs(b_fast - b_ex) <= 2).all() or (
            (b_fast > 10) & (b_ex > 10)
        ).all()
