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


def test_native_witness_map_bitexact_zq():
    """The C++ full witness map (prover mode) matches the JAX kernel bit-for-
    bit on a real synthetic system (same roots, same domain ordering)."""
    import jax
    from ringsnark_tpu.rings.context import default_context
    from ringsnark_tpu.models.synthetic import build_synthetic_square_chain
    from ringsnark_tpu.reductions.r1cs_to_qrp import (
        _assignment_batches,
        witness_map_kernel_chunked,
    )
    from ringsnark_tpu.utils.domain import RootsDomain

    M = 64
    ring = default_context(L=2, N=1, order=1 << 10)
    rng = np.random.default_rng(5)
    comp, primary, aux = build_synthetic_square_chain(ring, M, rng)
    domain = RootsDomain(ring, M)
    full, io, mid = _assignment_batches(ring, primary, aux)
    zero = jnp.zeros((ring.L, 1), dtype=jnp.uint32)
    a_full, b_full, H = witness_map_kernel_chunked(
        comp, full.res, io.res, mid.res, zero, zero, zero, domain,
        outputs="prover",
    )
    plan_M = nttm.get_plan(ring.primes, M)
    plan_2M = nttm.get_plan(ring.primes, 2 * M)
    for l, p in enumerate(ring.primes):
        ca = np.asarray(comp.coeffs[0])[:, l, 0]
        cb = np.asarray(comp.coeffs[1])[:, l, 0]
        na, nb, nh = native.g16_witness_map(
            (np.asarray(comp.rows[0]), np.asarray(comp.cols[0]), ca),
            (np.asarray(comp.rows[1]), np.asarray(comp.cols[1]), cb),
            np.asarray(full.res)[:, l, 0], M, p,
            int(plan_M.w_np[l]), int(plan_2M.w_np[l]),
        )
        assert (na[:, 0] == np.asarray(a_full)[:, l, 0]).all()
        assert (nb[:, 0] == np.asarray(b_full)[:, l, 0]).all()
        assert (nh[:, 0] == np.asarray(H)[:, l, 0]).all()


def test_native_witness_map_bitexact_dense():
    import jax
    from ringsnark_tpu.rings.context import default_context
    from ringsnark_tpu.models.synthetic import build_synthetic_square_chain
    from ringsnark_tpu.reductions.r1cs_to_qrp import (
        _assignment_batches,
        witness_map_kernel_chunked,
    )
    from ringsnark_tpu.utils.domain import RootsDomain

    M, N = 32, 8
    ring = default_context(L=1, N=N, order=1 << 10)
    rng = np.random.default_rng(6)
    comp, primary, aux = build_synthetic_square_chain(ring, M, rng)
    domain = RootsDomain(ring, M)
    full, io, mid = _assignment_batches(ring, primary, aux)
    zero = jnp.zeros((ring.L, 1), dtype=jnp.uint32)
    a_full, b_full, H = witness_map_kernel_chunked(
        comp, full.res, io.res, mid.res, zero, zero, zero, domain,
        outputs="prover",
    )
    plan_M = nttm.get_plan(ring.primes, M)
    plan_2M = nttm.get_plan(ring.primes, 2 * M)
    ca = np.asarray(comp.coeffs[0])[:, 0, :]
    cb = np.asarray(comp.coeffs[1])[:, 0, :]
    z = np.asarray(jnp.broadcast_to(full.res, (full.res.shape[0], 1, N)))
    na, nb, nh = native.g16_witness_map(
        (np.asarray(comp.rows[0]), np.asarray(comp.cols[0]),
         ca[:, 0] if ca.shape[1] == 1 else ca),
        (np.asarray(comp.rows[1]), np.asarray(comp.cols[1]),
         cb[:, 0] if cb.shape[1] == 1 else cb),
        z[:, 0, :], M, ring.primes[0],
        int(plan_M.w_np[0]), int(plan_2M.w_np[0]),
    )
    wa = np.asarray(jnp.broadcast_to(a_full, (M, 1, N)))[:, 0, :]
    wb = np.asarray(jnp.broadcast_to(b_full, (M, 1, N)))[:, 0, :]
    wh = np.asarray(jnp.broadcast_to(H, (M + 1, 1, N)))[:, 0, :]
    assert (na == wa).all()
    assert (nb == wb).all()
    assert (nh == wh).all()


def test_native_cpu_prover_runs():
    """groth16_prover_cpu completes and returns sane timings (tiny shape)."""
    from ringsnark_tpu.rings.context import default_context
    from ringsnark_tpu.encoding import EncodingContext
    from ringsnark_tpu.models.synthetic import build_synthetic_square_chain
    from ringsnark_tpu.native.cpu_prover import groth16_prover_cpu
    from ringsnark_tpu.ops.primes import find_ntt_primes
    from ringsnark_tpu.reductions.r1cs_to_qrp import _assignment_batches

    ring = default_context(L=1, N=1, order=1 << 10)
    rng = np.random.default_rng(7)
    comp, primary, aux = build_synthetic_square_chain(ring, 32, rng)
    inner = tuple(
        p for p in find_ntt_primes(4, 1 << 10) if p not in ring.primes
    )[:2]
    ectx = EncodingContext(ring=ring, n_inner=512, inner_primes=inner)
    full, _, _ = _assignment_batches(ring, primary, aux)
    timings, outs = groth16_prover_cpu(
        comp, ectx, np.asarray(full.res), np.asarray(aux.res), rng
    )
    assert timings["total_s"] >= 0 and len(outs) == ring.L
