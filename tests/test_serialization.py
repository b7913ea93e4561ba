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
