"""Noise-budget estimation for the BGV encoding scheme.

The reference manages noise implicitly through SEAL's budget accounting and
the `USE_MODSWITCH_IN_INNER_PRODUCT` schedule; here the worst-case analysis
is explicit so parameter selection (inner limb count for a given
inner-product size) is a function, not trial and error.

All quantities in log2 bits, per outer limb (t = that limb's plain modulus).
Model (DESIGN.md §4), for the sum-then-switch schedule that
`encoding.inner_product` implements (accumulate everything at level 0, then
switch only the final sum down to the floor — strictly less noise than the
reference's per-term schedule, `seal_ring.tcc:361-433`):

* fresh ciphertext noise:      t * (clip bound 64 of the error)      ~ t + 7
* ciphertext x plain multiply:
    - dense plaintext poly (outer N > 1):  * N' * (t/2)   + n' + t - 1
    - scalar constant poly (outer N == 1): * (t/2)        + t - 1
      (the Z_q backend's constant-polynomial fast path, bgv.plain_to_inner_ntt)
* sum of B terms:              + log2(B)                  (before any switch)
* modswitch of the sum:        / Q_last, then + t/2 * (1 + N')  (additive, once
                               per switch — NOT once per term)

Decoding requires noise < Q_remaining / 4 (budget > 0 in decode's
bit-length check).  `tests/test_noise.py` validates the floor empirically
against the exact big-int oracle across L'/t/B sweeps.
"""

from __future__ import annotations

import math

from .context import EncodingContext

__all__ = [
    "inner_product_noise_bits",
    "budget_after_inner_product",
    "plan_inner_chain",
    "required_inner_limbs",
]

_LIMB_BITS = 31  # all primes are ~31-bit


def _after_mul_bits(t_bits: float, n_bits: float, dense: bool) -> float:
    fresh = t_bits + 7
    return fresh + (n_bits if dense else 0.0) + t_bits - 1


def inner_product_noise_bits(ectx: EncodingContext, terms: int) -> float:
    """Worst-case log2 noise after an inner product of `terms` terms with the
    sum-then-switch schedule (see module docstring)."""
    t_bits = max(p.bit_length() for p in ectx.ring.primes)
    n_bits = math.log2(ectx.n_inner)
    dense = ectx.ring.N > 1
    noise = _after_mul_bits(t_bits, n_bits, dense) + math.log2(max(terms, 2))
    max_level = max(ectx.L_inner - ectx.floor_limbs, 0)
    for _ in range(max_level):
        noise = max(noise - _LIMB_BITS, 0) + 1  # / Q_last ...
        noise = max(noise, t_bits + n_bits - 1) + 1  # ... + switch additive
    return noise


def budget_after_inner_product(ectx: EncodingContext, terms: int) -> float:
    """Remaining noise budget (bits) after the prover's inner products; must
    stay comfortably > 0 for decode to succeed."""
    max_level = max(ectx.L_inner - ectx.floor_limbs, 0)
    q_bits = sum(p.bit_length() for p in ectx.level_primes(max_level))
    return q_bits - 2 - inner_product_noise_bits(ectx, terms)


def plan_inner_chain(
    n_inner: int,
    t_bits: int,
    terms: int,
    margin_bits: int = 10,
    dense: bool = True,
) -> tuple[int, int]:
    """(L_inner, floor_limbs) for an inner product of `terms` terms.

    * the level-0 SUM must fit the full modulus with margin:
        31*L' >= after_mul + log2(terms) + margin + 2;
    * the post-switch floor must absorb the switch-rounding noise (which no
      longer scales with `terms` — the /Q of the dropped limbs absorbs the
      batch sum as long as 31*(L'-floor) >= log2(terms), guaranteed by the
      first constraint):  31*floor >= (t + log2 N') + margin + 2.

    `dense=False` selects the scalar constant-poly multiply bound (Z_q
    backend, outer N == 1) — one fewer limb at prover scale.
    """
    n_bits = math.log2(n_inner)
    after_sum = _after_mul_bits(t_bits, n_bits, dense) + math.log2(max(terms, 2))
    l_for_sum = math.ceil((after_sum + margin_bits + 2) / _LIMB_BITS)
    floor = math.ceil((t_bits + n_bits + margin_bits + 2) / _LIMB_BITS)
    floor = max(floor, 2)
    l_inner = max(l_for_sum, floor)
    return l_inner, floor


def required_inner_limbs(
    n_inner: int, t_bits: int, terms: int, margin_bits: int = 10
) -> int:
    """Smallest inner limb count (see plan_inner_chain for the floor too)."""
    return plan_inner_chain(n_inner, t_bits, terms, margin_bits)[0]
