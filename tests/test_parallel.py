"""Sharding tests on the virtual 8-device CPU mesh: the sharded prover's
proof must verify and match the single-chip proof bit-for-bit (the SNARK is
deterministic given the witness map — groth16 is non-ZK)."""

import numpy as np
import pytest
import jax

from ringsnark_tpu.rings.context import default_context
from ringsnark_tpu.encoding import EncodingContext
from ringsnark_tpu.snark.api import SnarkParams
from ringsnark_tpu.snark import groth16, rinocchio
from ringsnark_tpu.parallel import (
    make_mesh,
    groth16_prove_sharded,
    rinocchio_prove_sharded,
)
from ringsnark_tpu.models import build_toy_circuit
from ringsnark_tpu.ops.primes import find_ntt_primes


@pytest.fixture(scope="module")
def env():
    ring = default_context(L=2, N=8, order=1 << 12)
    n_inner = 16
    inner, below = [], 1 << 31
    while len(inner) < 3:
        c = find_ntt_primes(1, 2 * n_inner, below=below)[0]
        below = c
        if c not in ring.primes:
            inner.append(c)
    enc = EncodingContext(ring=ring, n_inner=n_inner, inner_primes=tuple(inner))
    params = SnarkParams(ring=ring, enc=enc)
    rng = np.random.default_rng(31)
    pb = build_toy_circuit(ring, rng, replicate=2)
    assert pb.is_satisfied()
    kp = groth16.generator(
        pb.get_constraint_system(), params, rng, jax.random.PRNGKey(300)
    )
    return params, pb, kp


def test_mesh_construction():
    mesh = make_mesh(8, limb=2)
    assert mesh.shape == {"limb": 2, "data": 4}
    mesh1 = make_mesh(1)
    assert mesh1.shape == {"limb": 1, "data": 1}


@pytest.mark.parametrize(
    "n,limb",
    [
        pytest.param(1, 1, marks=pytest.mark.slow),
        pytest.param(4, 1, marks=pytest.mark.slow),
        (8, 2),
    ],
)
def test_sharded_prover_matches_single_chip(env, n, limb):
    params, pb, kp = env
    proof_single = groth16.prover(kp.pk, pb.primary_input(), pb.auxiliary_input())
    mesh = make_mesh(n, limb=limb)
    proof_sharded = groth16_prove_sharded(
        kp.pk, pb.primary_input(), pb.auxiliary_input(), mesh
    )
    # bit-exact across mesh sizes
    for name in ("A", "B", "C"):
        e1, e2 = getattr(proof_single, name), getattr(proof_sharded, name)
        assert e1 == e2, f"proof element {name} differs at mesh {n}x{limb}"
    assert groth16.verifier(kp.vk, pb.primary_input(), proof_sharded)


@pytest.mark.slow  # ~4 min compile on the CPU mesh; the driver's
# __graft_entry__.dryrun_multichip runs this same coeff-mesh prover path
# every round, so the default tier keeps the cheaper mesh variants only.
def test_coeff_sharded_prover_matches_single_chip(env):
    """('limb','coeff','data') mesh: the witness map's M/2M NTTs run
    coefficient-sharded (parallel/witness_sharded.py) and the proof is still
    bit-identical to the single-chip prover (SURVEY §2.3 row 6)."""
    params, pb, kp = env
    proof_single = groth16.prover(kp.pk, pb.primary_input(), pb.auxiliary_input())
    mesh = make_mesh(8, limb=2, coeff=2)
    assert mesh.shape == {"limb": 2, "coeff": 2, "data": 2}
    proof_sharded = groth16_prove_sharded(
        kp.pk, pb.primary_input(), pb.auxiliary_input(), mesh
    )
    for name in ("A", "B", "C"):
        e1, e2 = getattr(proof_single, name), getattr(proof_sharded, name)
        assert e1 == e2, f"proof element {name} differs on the coeff mesh"
    assert groth16.verifier(kp.vk, pb.primary_input(), proof_sharded)


@pytest.mark.parametrize(
    "n,limb",
    [
        pytest.param(4, 1, marks=pytest.mark.slow),
        pytest.param(8, 2, marks=pytest.mark.slow),
    ],
)  # sharded-rinocchio equivalence is structural (same shard_map wrapper as
# groth16, covered by default above); run the sweep with RINGSNARK_SLOW=1
def test_sharded_rinocchio_matches_single_chip(env, n, limb):
    params, pb, kp = env
    kpr = rinocchio.generator(
        pb.get_constraint_system(), params,
        np.random.default_rng(77), jax.random.PRNGKey(900),
    )
    # identical ZK randomness streams -> bit-identical proofs
    proof_single = rinocchio.prover(
        kpr.pk, pb.primary_input(), pb.auxiliary_input(),
        rng=np.random.default_rng(5),
    )
    mesh = make_mesh(n, limb=limb)
    proof_sharded = rinocchio_prove_sharded(
        kpr.pk, pb.primary_input(), pb.auxiliary_input(), mesh,
        rng=np.random.default_rng(5),
    )
    for name in ("A", "A_prime", "B", "B_prime", "C", "C_prime",
                 "D", "D_prime", "F"):
        e1 = getattr(proof_single, name)
        e2 = getattr(proof_sharded, name)
        if e1 is None:
            assert e2 is None
            continue
        assert e1 == e2, f"proof element {name} differs at mesh {n}x{limb}"
    assert rinocchio.verifier(kpr.vk, pb.primary_input(), proof_sharded)


def test_stream_chunk_ip_sharded_bitexact():
    """Data-sharded streamed chunk (encode + MAC + psum) is bit-identical
    to the single-device seeded kernels (parallel/stream_sharded.py) —
    the Rq 2^16+/multi-chip schedule's unit of work, for both rings."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from ringsnark_tpu.parallel import stream_chunk_ip_sharded
    from ringsnark_tpu.rings.context import default_context
    from ringsnark_tpu.rings.elem import RingElem
    from ringsnark_tpu.encoding import EncodingContext, keygen
    from ringsnark_tpu.ops.primes import find_ntt_primes
    from ringsnark_tpu.snark import seeded as sd

    for N in (1, 8):
        ring = default_context(L=1, N=N, order=1 << 10)
        inner, below = [], 1 << 31
        while len(inner) < 2:
            c = find_ntt_primes(1, 128, below=below)[0]
            below = c
            if c not in ring.primes:
                inner.append(c)
        ectx = EncodingContext(ring=ring, n_inner=64,
                               inner_primes=tuple(inner))
        rng = np.random.default_rng(17)
        _, sk = keygen(ectx, rng)
        chunk, slab, D = 64, 8, 4
        rows = jnp.asarray(rng.integers(
            0, ring.primes[0], (chunk, 1, N), dtype=np.int64
        ).astype(np.uint32))
        pts = [jnp.asarray(rng.integers(
            0, ring.primes[0], (chunk, 1, N), dtype=np.int64
        ).astype(np.uint32)) for _ in range(2)]
        key = jax.random.key(9, impl="threefry2x32")

        mesh = Mesh(np.array(jax.devices()[:D]), ("data",))
        got = stream_chunk_ip_sharded(mesh, ectx, sk, rows, pts, key, slab)

        senc = sd.encode_seeded(ectx, sk, RingElem(ring, rows), key, slab)
        want = sd.seeded_inner_product(senc, pts, use_modswitch=False)
        for g, w in zip(got, want):
            assert (np.asarray(g.c0) == np.asarray(w.c0)).all(), f"N={N}"
            assert (np.asarray(g.c1) == np.asarray(w.c1)).all(), f"N={N}"
