"""Noise-budget estimation for the BGV encoding scheme.

The reference manages noise implicitly through SEAL's budget accounting and
the `USE_MODSWITCH_IN_INNER_PRODUCT` schedule; here the worst-case analysis
is explicit so parameter selection (inner limb count for a given
inner-product size) is a function, not trial and error.

All quantities in log2 bits, per outer limb (t = that limb's plain modulus).
Model (DESIGN.md §4):

* fresh ciphertext noise:      t * (clip bound 64 of the error)      ~ t + 7
* ciphertext x plain multiply: * N' * (t/2)                          + n' + t - 1
* modswitch:                   / Q_last, then + t/2 * (1 + N')       (additive)
* sum of B terms:              + log2(B)

Decoding requires noise < Q_remaining / 4 (budget > 0 in decode's
bit-length check).
"""

from __future__ import annotations

import math

from .context import EncodingContext

__all__ = ["inner_product_noise_bits", "budget_after_inner_product", "required_inner_limbs"]

_LIMB_BITS = 31  # all primes are ~31-bit


def inner_product_noise_bits(ectx: EncodingContext, terms: int) -> float:
    """Worst-case log2 noise after an inner product of `terms` terms with the
    staged-modswitch schedule (per-term switch to the 2-limb floor)."""
    t_bits = max(p.bit_length() for p in ectx.ring.primes)
    n_bits = math.log2(ectx.n_inner)
    fresh = t_bits + 7
    after_mul = fresh + n_bits + t_bits - 1
    max_level = max(ectx.L_inner - ectx.floor_limbs, 0)
    noise = after_mul
    for _ in range(max_level):
        noise = max(noise - _LIMB_BITS, 0) + 1  # /Q_last ...
        noise = max(noise, t_bits + n_bits - 1) + 1  # ... + switch additive
    return noise + math.log2(max(terms, 2))


def budget_after_inner_product(ectx: EncodingContext, terms: int) -> float:
    """Remaining noise budget (bits) after the prover's inner products; must
    stay comfortably > 0 for decode to succeed."""
    max_level = max(ectx.L_inner - ectx.floor_limbs, 0)
    q_bits = sum(p.bit_length() for p in ectx.level_primes(max_level))
    return q_bits - 2 - inner_product_noise_bits(ectx, terms)


def plan_inner_chain(
    n_inner: int, t_bits: int, terms: int, margin_bits: int = 10
) -> tuple[int, int]:
    """(L_inner, floor_limbs) for an inner product of `terms` terms.

    * the pre-switch product must fit the full modulus:
        L' >= ceil((after_mul + 2) / 31);
    * the post-switch floor must absorb the fully-switched noise plus the
      batch sum:  31*floor >= (t + log2 N') + log2(terms) + margin + 2.
    """
    n_bits = math.log2(n_inner)
    after_mul = (t_bits + 7) + n_bits + t_bits - 1
    l_for_product = math.ceil((after_mul + 2) / _LIMB_BITS)
    floor = math.ceil(
        (t_bits + n_bits + math.log2(max(terms, 2)) + margin_bits + 2) / _LIMB_BITS
    )
    floor = max(floor, 2)
    l_inner = max(l_for_product, floor + 1)
    return l_inner, floor


def required_inner_limbs(
    n_inner: int, t_bits: int, terms: int, margin_bits: int = 10
) -> int:
    """Smallest inner limb count (see plan_inner_chain for the floor too)."""
    return plan_inner_chain(n_inner, t_bits, terms, margin_bits)[0]
