"""End-to-end proof-system tests: generator -> prover -> verifier for both
Rinocchio and ringGroth16, over both the integer ring Z_q and the poly ring
R_q (the reference covers this path only via examples printing to stdout;
here it is asserted — SURVEY §4 implication)."""

import numpy as np
import pytest
import jax

from ringsnark_tpu.rings.context import default_context
from ringsnark_tpu.rings.elem import RingElem
from ringsnark_tpu.relations.r1cs import R1CSConstraint
from ringsnark_tpu.gadgets import PBVariableArray, Protoboard
from ringsnark_tpu.encoding import EncodingContext
from ringsnark_tpu.snark.api import SnarkParams
from ringsnark_tpu.snark import rinocchio, groth16
from ringsnark_tpu.ops.primes import find_ntt_primes


def _make_params(N):
    ring = default_context(L=2, N=N, order=1 << 12)
    n_inner = 32 if N <= 32 else 2 * N
    inner, below = [], 1 << 31
    while len(inner) < 3:
        c = find_ntt_primes(1, 2 * n_inner, below=below)[0]
        below = c
        if c not in ring.primes:
            inner.append(c)
    enc = EncodingContext(ring=ring, n_inner=n_inner, inner_primes=tuple(inner))
    return SnarkParams(ring=ring, enc=enc)


def _toy_pb(ctx, seed=21):
    """example_SEAL toy circuit: x5 = x2*x3; x4 = (x0+x1)*x5; x5 private."""
    pb = Protoboard(ctx)
    vars = PBVariableArray()
    vars.allocate(pb, 6, "x")
    pb.set_input_sizes(5)
    pb.add_r1cs_constraint(R1CSConstraint(vars[2], vars[3], vars[5]))
    pb.add_r1cs_constraint(R1CSConstraint(vars[0] + vars[1], vars[5], vars[4]))
    rng = np.random.default_rng(seed)
    vals = [RingElem.random_element(ctx, rng) for _ in range(4)]
    v5 = vals[2] * vals[3]
    v4 = (vals[0] + vals[1]) * v5
    for i, v in enumerate(vals):
        pb.set_val(vars[i], v)
    pb.set_val(vars[4], v4)
    pb.set_val(vars[5], v5)
    assert pb.is_satisfied()
    return pb


@pytest.fixture(scope="module", params=[1, 16], ids=["Zq", "Rq"])
def env(request):
    params = _make_params(request.param)
    pb = _toy_pb(params.ring)
    return params, pb


def test_rinocchio_e2e(env):
    params, pb = env
    rng = np.random.default_rng(1)
    kp = rinocchio.generator(
        pb.get_constraint_system(), params, rng, jax.random.PRNGKey(100)
    )
    assert kp.pk.size_in_bits() > 0
    assert kp.vk.size_in_bits() > 0
    proof = rinocchio.prover(kp.pk, pb.primary_input(), pb.auxiliary_input(), rng)
    assert proof.size_in_bits() > 0
    assert rinocchio.verifier(kp.vk, pb.primary_input(), proof)


def test_rinocchio_rejects_wrong_primary(env):
    params, pb = env
    rng = np.random.default_rng(2)
    kp = rinocchio.generator(
        pb.get_constraint_system(), params, rng, jax.random.PRNGKey(101)
    )
    proof = rinocchio.prover(kp.pk, pb.primary_input(), pb.auxiliary_input(), rng)
    bad = list(pb.primary_input())
    bad[0] = bad[0] + RingElem.one(params.ring)
    assert not rinocchio.verifier(kp.vk, bad, proof)


def test_rinocchio_rejects_tampered_proof(env):
    params, pb = env
    rng = np.random.default_rng(3)
    kp = rinocchio.generator(
        pb.get_constraint_system(), params, rng, jax.random.PRNGKey(102)
    )
    proof = rinocchio.prover(kp.pk, pb.primary_input(), pb.auxiliary_input(), rng)
    proof.A, proof.B = proof.B, proof.A
    assert not rinocchio.verifier(kp.vk, pb.primary_input(), proof)


def test_groth16_e2e(env):
    params, pb = env
    rng = np.random.default_rng(4)
    kp = groth16.generator(
        pb.get_constraint_system(), params, rng, jax.random.PRNGKey(103)
    )
    proof = groth16.prover(kp.pk, pb.primary_input(), pb.auxiliary_input(), rng)
    assert groth16.verifier(kp.vk, pb.primary_input(), proof)


def test_groth16_rejects_wrong_primary(env):
    params, pb = env
    rng = np.random.default_rng(5)
    kp = groth16.generator(
        pb.get_constraint_system(), params, rng, jax.random.PRNGKey(104)
    )
    proof = groth16.prover(kp.pk, pb.primary_input(), pb.auxiliary_input(), rng)
    bad = list(pb.primary_input())
    bad[0] = bad[0] + RingElem.one(params.ring)
    assert not groth16.verifier(kp.vk, bad, proof)


def test_rinocchio_no_aux_nonzk_mode():
    """All-public circuit: ZK auto-off, proof.F is None (rinocchio.tcc:81-90)."""
    params = _make_params(1)
    ctx = params.ring
    pb = Protoboard(ctx)
    vars = PBVariableArray()
    vars.allocate(pb, 3, "x")
    pb.set_input_sizes(3)  # everything public
    pb.add_r1cs_constraint(R1CSConstraint(vars[0], vars[1], vars[2]))
    rng = np.random.default_rng(6)
    a = RingElem.random_element(ctx, rng)
    b = RingElem.random_element(ctx, rng)
    pb.set_val(vars[0], a)
    pb.set_val(vars[1], b)
    pb.set_val(vars[2], a * b)
    assert pb.is_satisfied()
    kp = rinocchio.generator(
        pb.get_constraint_system(), params, rng, jax.random.PRNGKey(105)
    )
    proof = rinocchio.prover(kp.pk, pb.primary_input(), pb.auxiliary_input(), rng)
    assert proof.F is None
    assert rinocchio.verifier(kp.vk, pb.primary_input(), proof)


def test_io_terms_direct_equals_interpolation(env):
    """The verifier's direct io evaluation (sum_k z_k * Mt[k] over the
    processed vk's QRP evals) must be bit-identical to the reference-shaped
    interpolate-then-evaluate route (groth16.tcc:140-158)."""
    params, pb = env
    rng = np.random.default_rng(7)
    kp = groth16.generator(
        pb.get_constraint_system(), params, rng, jax.random.PRNGKey(106)
    )
    pvk = groth16.verifier_process(kp.vk)
    n_io = kp.pk.compiled.primary_input_size + 1
    direct = groth16._io_terms_at_s(
        pvk.qrp, params.ring, n_io, pb.primary_input()
    )
    interp = groth16._io_terms_via_interpolation(
        kp.pk, pb.primary_input(), kp.vk.s
    )
    for d, i in zip(direct, interp):
        assert np.array_equal(np.asarray(d.res), np.asarray(i.res))
