"""Round-trip tests for proof / key / context serialization."""

import numpy as np
import pytest
import jax

from ringsnark_tpu.rings.context import default_context
from ringsnark_tpu.encoding import EncodingContext
from ringsnark_tpu.snark.api import SnarkParams
from ringsnark_tpu.snark import groth16, rinocchio
from ringsnark_tpu.models import build_toy_circuit
from ringsnark_tpu.ops.primes import find_ntt_primes
from ringsnark_tpu.utils import serialization as ser




def _params(L, N):
    ring = default_context(L=L, N=N, order=1 << 12)
    inner, below = [], 1 << 31
    while len(inner) < 3:
        c = find_ntt_primes(1, 128, below=below)[0]
        below = c
        if c not in ring.primes:
            inner.append(c)
    enc = EncodingContext(ring=ring, n_inner=64, inner_primes=tuple(inner))
    return SnarkParams(ring=ring, enc=enc)

@pytest.fixture(scope="module")
def env():
    ring = default_context(L=2, N=8, order=1 << 12)
    inner, below = [], 1 << 31
    while len(inner) < 3:
        c = find_ntt_primes(1, 32, below=below)[0]
        below = c
        if c not in ring.primes:
            inner.append(c)
    enc = EncodingContext(ring=ring, n_inner=16, inner_primes=tuple(inner))
    params = SnarkParams(ring=ring, enc=enc)
    rng = np.random.default_rng(41)
    pb = build_toy_circuit(ring, rng)
    kp = groth16.generator(
        pb.get_constraint_system(), params, rng, jax.random.PRNGKey(400)
    )
    return params, pb, kp


def test_context_roundtrip(env):
    params, _, _ = env
    s = ser.context_to_json(params.enc)
    assert ser.context_from_json(s) == params.enc


def test_proof_roundtrip(env, tmp_path):
    params, pb, kp = env
    proof = groth16.prover(kp.pk, pb.primary_input(), pb.auxiliary_input())
    path = str(tmp_path / "proof.npz")
    ser.save_proof(path, proof, params.enc)
    loaded = ser.load_proof(path, groth16.Proof)
    assert loaded.A == proof.A and loaded.B == proof.B and loaded.C == proof.C
    assert groth16.verifier(kp.vk, pb.primary_input(), loaded)


def test_rinocchio_proof_roundtrip(env, tmp_path):
    params, pb, _ = env
    rng = np.random.default_rng(42)
    kp = rinocchio.generator(
        pb.get_constraint_system(), params, rng, jax.random.PRNGKey(401)
    )
    proof = rinocchio.prover(kp.pk, pb.primary_input(), pb.auxiliary_input(), rng)
    path = str(tmp_path / "rproof.npz")
    ser.save_proof(path, proof, params.enc)
    loaded = ser.load_proof(path, rinocchio.Proof)
    assert rinocchio.verifier(kp.vk, pb.primary_input(), loaded)


def test_pk_roundtrip_and_reprove(env, tmp_path):
    params, pb, kp = env
    pk_path = str(tmp_path / "pk.npz")
    cs_path = str(tmp_path / "cs.json")
    ser.save_groth16_pk(pk_path, kp.pk, cs_path)
    pk2 = ser.load_groth16_pk(pk_path)
    proof = groth16.prover(pk2, pb.primary_input(), pb.auxiliary_input())
    assert groth16.verifier(kp.vk, pb.primary_input(), proof)


def test_secret_key_roundtrip(env, tmp_path):
    params, pb, kp = env
    path = str(tmp_path / "sk.npz")
    ser.save_secret_key(path, kp.vk.sk_enc)
    sk2 = ser.load_secret_key(path)
    assert (np.asarray(sk2.s_ntt) == np.asarray(kp.vk.sk_enc.s_ntt)).all()


def test_rinocchio_pk_roundtrip_and_reprove(env, tmp_path):
    params, pb, _ = env
    rng = np.random.default_rng(43)
    kp = rinocchio.generator(
        pb.get_constraint_system(), params, rng, jax.random.PRNGKey(402)
    )
    pk_path = str(tmp_path / "rpk.npz")
    cs_path = str(tmp_path / "rcs.json")
    ser.save_rinocchio_pk(pk_path, kp.pk, cs_path)
    pk2 = ser.load_rinocchio_pk(pk_path)
    assert pk2.s_pows == kp.pk.s_pows
    assert pk2.alpha_s_pows == kp.pk.alpha_s_pows
    assert pk2.beta_prods == kp.pk.beta_prods
    # the loaded CRS proves, and the original vk verifies it
    rng2 = np.random.default_rng(44)
    proof = rinocchio.prover(pk2, pb.primary_input(), pb.auxiliary_input(), rng2)
    assert rinocchio.verifier(kp.vk, pb.primary_input(), proof)


@pytest.mark.parametrize("system", ["groth16", "rinocchio"])
def test_vk_roundtrip_and_verify(env, tmp_path, system):
    params, pb, g16_kp = env
    rng = np.random.default_rng(45)
    if system == "groth16":
        kp = g16_kp
        mod = groth16
    else:
        mod = rinocchio
        kp = rinocchio.generator(
            pb.get_constraint_system(), params, rng, jax.random.PRNGKey(403)
        )
    vk_path = str(tmp_path / "vk.npz")
    pk_path = str(tmp_path / "pk.npz")
    cs_path = str(tmp_path / "cs.json")
    ser.save_vk(vk_path, kp.vk, pk_path, cs_path)
    vk2 = ser.load_vk(vk_path)
    assert vk2.s == kp.vk.s and vk2.alpha == kp.vk.alpha
    proof = mod.prover(kp.pk, pb.primary_input(), pb.auxiliary_input(), rng)
    # the RELOADED designated-verifier key must accept a fresh proof
    assert mod.verifier(vk2, pb.primary_input(), proof)


def test_seeded_pk_roundtrip(tmp_path):
    """The c0+PRNG-key SeededProvingKey round-trips and the reloaded key
    produces a bit-identical proof (same witness map + MAC + c1 regen)."""
    import jax
    from ringsnark_tpu.models.synthetic import build_synthetic_square_chain
    from ringsnark_tpu.snark import seeded as sd
    from ringsnark_tpu.utils.serialization import (
        load_seeded_pk,
        save_seeded_pk,
    )

    params = _params(L=2, N=1)
    rng = np.random.default_rng(31)
    comp, primary, aux = build_synthetic_square_chain(params.ring, 32, rng)
    key = jax.random.key(4, impl="threefry2x32")
    kp = sd.generator_seeded(comp, params, rng, key, slab=16)
    p = str(tmp_path / "seeded_pk.npz")
    save_seeded_pk(p, kp.pk)
    pk2 = load_seeded_pk(p)
    proof1 = sd.prover_seeded(kp.pk, primary, aux)
    proof2 = sd.prover_seeded(pk2, primary, aux)
    for name in ("A", "B", "C"):
        e1, e2 = getattr(proof1, name), getattr(proof2, name)
        assert (np.asarray(e1.c0) == np.asarray(e2.c0)).all()
        assert (np.asarray(e1.c1) == np.asarray(e2.c1)).all()
        assert e1.level == e2.level


def test_streamed_vk_roundtrip(tmp_path):
    """save_vk/load_vk cover the streamed provers' CRS-less stub pk; the
    reloaded designated-verifier key verifies the original proof."""
    import jax
    from ringsnark_tpu.models.synthetic import build_synthetic_square_chain
    from ringsnark_tpu.snark import groth16
    from ringsnark_tpu.snark import streamed as st
    from ringsnark_tpu.utils.serialization import load_vk, save_vk

    params = _params(L=1, N=1)
    rng = np.random.default_rng(32)
    comp, primary, aux = build_synthetic_square_chain(params.ring, 32, rng)
    key = jax.random.key(5, impl="threefry2x32")
    proof, vk, _ = st.stream_prove(
        comp, params, primary, aux, np.random.default_rng(1), key,
        slab=16, phase_rows=32,
    )
    vp = str(tmp_path / "vk.npz")
    save_vk(vp, vk, str(tmp_path / "pk.npz"), str(tmp_path / "cs.json"))
    vk2 = load_vk(vp)
    assert groth16.verifier(vk2, primary, proof)
