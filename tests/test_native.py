"""Cross-validation: JAX compute path vs the native C++ oracle."""

import numpy as np
import pytest
import jax.numpy as jnp

from ringsnark_tpu import native
from ringsnark_tpu.ops import ntt as nttm
from ringsnark_tpu.ops import primes as pr

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no compiler?)"
)


def test_native_scalar_ops():
    p = pr.find_ntt_primes(1, 1 << 12)[0]
    rng = np.random.default_rng(0)
    for _ in range(50):
        a, b = int(rng.integers(0, p)), int(rng.integers(0, p))
        assert native.mulmod(a, b, p) == a * b % p
        assert native.powmod(a, 12345, p) == pow(a, 12345, p)
        if a:
            assert native.invmod(a, p) == pow(a, -1, p)


@pytest.mark.parametrize("M", [16, 256])
def test_native_ntt_matches_jax(M):
    ps = tuple(pr.find_ntt_primes(2, 1 << 12))
    plan = nttm.get_plan(ps, M, negacyclic=True)
    rng = np.random.default_rng(1)
    for l, p in enumerate(ps):
        x = rng.integers(0, p, (4, M)).astype(np.uint32)
        w = plan.w_np[l]
        psi = int(plan.psi[l, 1])
        got = native.negacyclic_ntt(x, p, w, psi)
        xj = jnp.asarray(x[:, None, :])  # [4, 1, M] with limb axis
        plan1 = nttm.get_plan((p,), M, negacyclic=True)
        want = np.asarray(nttm.negacyclic_ntt_rev(xj, plan1))[:, 0, :]
        assert (got == want).all()
        back = native.negacyclic_intt(got, p, w, psi)
        assert (back == x).all()


def test_native_cyclic_roundtrip_and_match():
    ps = tuple(pr.find_ntt_primes(1, 1 << 12))
    p = ps[0]
    M = 64
    plan = nttm.get_plan(ps, M)
    rng = np.random.default_rng(2)
    x = rng.integers(0, p, (3, M)).astype(np.uint32)
    got = native.cyclic_ntt(x, p, plan.w_np[0])
    want = np.asarray(nttm.cyclic_ntt_rev(jnp.asarray(x[:, None, :]), plan))[:, 0, :]
    assert (got == want).all()
    assert (native.cyclic_intt(got, p, plan.w_np[0]) == x).all()


def test_native_inner_product():
    p = pr.find_ntt_primes(1, 1 << 12)[0]
    rng = np.random.default_rng(3)
    ct = rng.integers(0, p, (10, 32)).astype(np.uint32)
    pt = rng.integers(0, p, (10, 32)).astype(np.uint32)
    got = native.ip_accumulate(ct, pt, p)
    want = (ct.astype(np.uint64) * pt.astype(np.uint64)).sum(axis=0) % p
    assert (got == want.astype(np.uint32)).all()
