"""Coefficient-sharded NTT: bit-exact vs the single-device path.

Runs on the virtual 8-device CPU mesh (conftest).  The sharded transform
must produce the SAME array (same block layout, same bit-reversed labeling)
as ops/ntt.py regardless of the mesh axis size.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ringsnark_tpu.ops import primes as pr
from ringsnark_tpu.ops import ntt as nttm
from ringsnark_tpu.parallel.ntt_sharded import make_sharded_ntt, sharded_ntt


def _mk(D, M=64, L=2, batch=3, seed=0, order=None):
    ps = tuple(pr.find_ntt_primes(L, order or (2 * M)))
    plan = nttm.get_plan(ps, M, negacyclic=True)
    rng = np.random.default_rng(seed)
    x = np.stack(
        [np.stack([rng.integers(0, q, M, dtype=np.uint64) for q in ps])
         for _ in range(batch)]
    ).astype(np.uint32)  # [batch, L, M]
    mesh = Mesh(np.array(jax.devices()[:D]).reshape(D), ("coeff",))
    return ps, plan, x, mesh


@pytest.mark.parametrize(
    "D",
    [
        pytest.param(2, marks=pytest.mark.slow),
        pytest.param(4, marks=pytest.mark.slow),
        8,
    ],
)
@pytest.mark.parametrize(
    "negacyclic",
    [
        pytest.param(False, marks=pytest.mark.slow),
        pytest.param(True, marks=pytest.mark.slow),
    ],
)  # forward-only coverage is subsumed by the inverse test (which checks the
# forward reference too) and the 2d-mesh jit roundtrip below
def test_sharded_forward_matches_single_device(D, negacyclic):
    ps, plan, x, mesh = _mk(D)
    xs = jax.device_put(
        jnp.asarray(x), NamedSharding(mesh, P(None, None, "coeff"))
    )
    got = sharded_ntt(xs, plan, mesh, negacyclic=negacyclic)
    want = (
        nttm.negacyclic_ntt_rev if negacyclic else nttm.cyclic_ntt_rev
    )(jnp.asarray(x), plan)
    assert (np.asarray(got) == np.asarray(want)).all()


@pytest.mark.parametrize("D", [pytest.param(2, marks=pytest.mark.slow), 8])
@pytest.mark.parametrize(
    "negacyclic", [pytest.param(False, marks=pytest.mark.slow), True]
)
def test_sharded_inverse_matches_and_roundtrips(D, negacyclic):
    ps, plan, x, mesh = _mk(D, seed=5)
    fwd_1dev = (
        nttm.negacyclic_ntt_rev if negacyclic else nttm.cyclic_ntt_rev
    )(jnp.asarray(x), plan)
    ys = jax.device_put(
        fwd_1dev, NamedSharding(mesh, P(None, None, "coeff"))
    )
    got = sharded_ntt(ys, plan, mesh, negacyclic=negacyclic, inverse=True)
    want = (
        nttm.negacyclic_intt_nat if negacyclic else nttm.cyclic_intt_nat
    )(fwd_1dev, plan)
    assert (np.asarray(got) == np.asarray(x)).all()
    assert (np.asarray(got) == np.asarray(want)).all()


def test_sharded_roundtrip_under_jit_2d_mesh():
    """('data','coeff') mesh: batch over data, coefficients over coeff; the
    whole fwd∘inv composition under one jit."""
    ps = tuple(pr.find_ntt_primes(2, 256))
    M, L = 128, 2
    plan = nttm.get_plan(ps, M, negacyclic=True)
    rng = np.random.default_rng(9)
    x = np.stack(
        [np.stack([rng.integers(0, q, M, dtype=np.uint64) for q in ps])
         for _ in range(4)]
    ).astype(np.uint32)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("data", "coeff"))
    sh = NamedSharding(mesh, P("data", None, "coeff"))
    sp = P("data", None, "coeff")
    fwd = make_sharded_ntt(plan, mesh, negacyclic=True, spec=sp)
    inv = make_sharded_ntt(plan, mesh, negacyclic=True, inverse=True, spec=sp)
    f = jax.jit(lambda v: inv(fwd(v)))
    got = f(jax.device_put(jnp.asarray(x), sh))
    assert (np.asarray(got) == x).all()
