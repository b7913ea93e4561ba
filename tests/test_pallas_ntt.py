"""Pallas NTT kernel: bit-exact vs the XLA path (interpret mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ringsnark_tpu.ops import ntt as nttm
from ringsnark_tpu.ops import primes as pr
from ringsnark_tpu.ops import pallas_ntt as pntt


def _pallas_interpret(x, tables, tb):
    """Run the production kernel through the Pallas interpreter."""
    return pntt.negacyclic_ntt_rev_pallas(x, tables, tb, interpret=True)


def test_mulhi32_exact():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 2**32, 1000, dtype=np.uint64)
    b = rng.integers(0, 2**32, 1000, dtype=np.uint64)
    got = np.asarray(
        pntt._mulhi32(jnp.asarray(a.astype(np.uint32)), jnp.asarray(b.astype(np.uint32)))
    )
    want = ((a * b) >> 32).astype(np.uint32)
    assert (got == want).all()


def test_shoup_mul_exact():
    p = pr.find_ntt_primes(1, 1 << 12)[0]
    rng = np.random.default_rng(1)
    a = rng.integers(0, p, 500, dtype=np.uint64).astype(np.uint32)
    w = int(rng.integers(1, p))
    w_sh = (w << 32) // p
    got = np.asarray(
        pntt._shoup_mul(
            jnp.asarray(a), jnp.uint32(w), jnp.uint32(w_sh), jnp.uint32(p)
        )
    )
    want = (a.astype(np.uint64) * w % p).astype(np.uint32)
    assert (got == want).all()


@pytest.mark.parametrize("M", [256, pytest.param(1024, marks=pytest.mark.slow)])
def test_pallas_ntt_matches_xla(M):
    ps = tuple(pr.find_ntt_primes(2, 1 << 12))
    plan = nttm.get_plan(ps, M, negacyclic=True)
    tables = pntt.get_pallas_tables(ps, M)
    rng = np.random.default_rng(2)
    B, tb = 16, 8
    x = np.stack(
        [
            np.stack([rng.integers(0, q, M, dtype=np.uint64) for q in ps])
            for _ in range(B)
        ]
    ).astype(np.uint32)
    want = np.asarray(nttm.negacyclic_ntt_rev(jnp.asarray(x), plan))
    got = np.asarray(_pallas_interpret(jnp.asarray(x), tables, tb))
    assert (got == want).all()


@pytest.mark.parametrize(
    "M,Mi",
    [(1024, 256), pytest.param(8192, 1024, marks=pytest.mark.slow)],
)
def test_pallas_split_matches_xla(M, Mi):
    """Large-M split path (outer stages + folded inner batch): all four
    transform kinds bit-exact vs the XLA path."""
    ps = tuple(pr.find_ntt_primes(2, 1 << 15))
    plan_neg = nttm.get_plan(ps, M, negacyclic=True)
    plan_cyc = nttm.get_plan(ps, M)
    tables = pntt.get_split_tables(ps, M, Mi)
    rng = np.random.default_rng(7)
    B, tb = 8, 8
    x = np.stack(
        [
            np.stack([rng.integers(0, q, M, dtype=np.uint64) for q in ps])
            for _ in range(B)
        ]
    ).astype(np.uint32)
    xj = jnp.asarray(x)

    def split(v, inverse, negacyclic):
        return np.asarray(
            pntt.ntt_split_pallas(
                v, tables, tb, inverse=inverse, negacyclic=negacyclic,
                interpret=True,
            )
        )

    # negacyclic fwd + inv
    want_f = np.asarray(nttm.negacyclic_ntt_rev(xj, plan_neg))
    got_f = split(xj, False, True)
    assert (got_f == want_f).all()
    got_b = split(jnp.asarray(got_f), True, True)
    assert (got_b == x).all()

    # cyclic fwd + inv
    want_cf = np.asarray(nttm.cyclic_ntt_rev(xj, plan_cyc))
    got_cf = split(xj, False, False)
    assert (got_cf == want_cf).all()
    got_cb = split(jnp.asarray(got_cf), True, False)
    assert (got_cb == x).all()


@pytest.mark.parametrize("M", [256, pytest.param(1024, marks=pytest.mark.slow)])
def test_pallas_inverse_and_cyclic_match_xla(M):
    ps = tuple(pr.find_ntt_primes(2, 1 << 12))
    plan_neg = nttm.get_plan(ps, M, negacyclic=True)
    plan_cyc = nttm.get_plan(ps, M)
    tables = pntt.get_pallas_tables(ps, M)
    rng = np.random.default_rng(5)
    B, tb = 16, 8
    x = np.stack(
        [
            np.stack([rng.integers(0, q, M, dtype=np.uint64) for q in ps])
            for _ in range(B)
        ]
    ).astype(np.uint32)
    xj = jnp.asarray(x)

    # negacyclic inverse
    y = nttm.negacyclic_ntt_rev(xj, plan_neg)
    want = np.asarray(nttm.negacyclic_intt_nat(y, plan_neg))
    got = np.asarray(pntt.negacyclic_intt_nat_pallas(y, tables, tb, interpret=True))
    assert (got == want).all() and (got == x).all()

    # cyclic forward + inverse
    want_f = np.asarray(nttm.cyclic_ntt_rev(xj, plan_cyc))
    got_f = np.asarray(pntt.cyclic_ntt_rev_pallas(xj, tables, tb, interpret=True))
    assert (got_f == want_f).all()
    got_b = np.asarray(
        pntt.cyclic_intt_nat_pallas(jnp.asarray(got_f), tables, tb, interpret=True)
    )
    assert (got_b == x).all()
