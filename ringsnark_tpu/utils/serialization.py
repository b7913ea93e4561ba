"""Serialization for keys, proofs, and contexts.

The reference declares pk/vk/proof streaming but never implements it
(`r1cs_ppzksnark.hpp:43-47, 69-74`; `variable.tcc:391-414` throws
"Not Implemented") — here it is first-class: CRS caching matters at 2^18
constraints (SURVEY §5).  Format: one .npz per object with a JSON header.
"""

from __future__ import annotations

import json

import numpy as np
import jax.numpy as jnp

from ..encoding.context import EncodingContext, SecretKey
from ..encoding.encoding import Encoding
from ..rings.context import RingContext
from ..rings.elem import RingElem

__all__ = [
    "save_proof",
    "load_proof",
    "save_groth16_pk",
    "load_groth16_pk",
    "save_rinocchio_pk",
    "load_rinocchio_pk",
    "save_seeded_pk",
    "load_seeded_pk",
    "save_compiled",
    "load_compiled",
    "save_vk",
    "load_vk",
    "save_secret_key",
    "load_secret_key",
    "context_to_json",
    "context_from_json",
]


def context_to_json(ectx: EncodingContext) -> str:
    return json.dumps(
        {
            "ring_primes": list(ectx.ring.primes),
            "ring_N": ectx.ring.N,
            "n_inner": ectx.n_inner,
            "inner_primes": list(ectx.inner_primes),
            "error_stddev": ectx.error_stddev,
            "floor_limbs": ectx.floor_limbs,
        }
    )


def context_from_json(s: str) -> EncodingContext:
    o = json.loads(s)
    ring = RingContext(primes=tuple(o["ring_primes"]), N=o["ring_N"])
    return EncodingContext(
        ring=ring,
        n_inner=o["n_inner"],
        inner_primes=tuple(o["inner_primes"]),
        error_stddev=o["error_stddev"],
        floor_limbs=o.get("floor_limbs", 2),
    )


def _enc_arrays(prefix: str, e: Encoding | None, store: dict, meta: dict):
    if e is None:
        meta[prefix] = None
        return
    store[f"{prefix}_c0"] = np.asarray(e.c0)
    store[f"{prefix}_c1"] = np.asarray(e.c1)
    meta[prefix] = {"level": e.level}


def _enc_load(prefix: str, data, meta: dict, ectx: EncodingContext):
    if meta[prefix] is None:
        return None
    return Encoding(
        ectx,
        jnp.asarray(data[f"{prefix}_c0"]),
        jnp.asarray(data[f"{prefix}_c1"]),
        meta[prefix]["level"],
    )


def save_proof(path: str, proof, ectx: EncodingContext):
    """Works for both rinocchio.Proof and groth16.Proof (duck-typed fields)."""
    store, meta = {}, {"ctx": context_to_json(ectx), "fields": []}
    for name in ("A", "A_prime", "B", "B_prime", "C", "C_prime", "D", "D_prime", "F"):
        if hasattr(proof, name):
            meta["fields"].append(name)
            _enc_arrays(name, getattr(proof, name), store, meta)
    np.savez_compressed(path, __meta__=json.dumps(meta), **store)


def load_proof(path: str, proof_cls, ectx: EncodingContext | None = None):
    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["__meta__"]))
    ectx = ectx or context_from_json(meta["ctx"])
    kwargs = {n: _enc_load(n, data, meta, ectx) for n in meta["fields"]}
    return proof_cls(**kwargs)


def save_secret_key(path: str, sk: SecretKey):
    np.savez_compressed(
        path,
        __meta__=context_to_json(sk.ctx),
        s_ntt=np.asarray(sk.s_ntt),
        s_coeffs=np.asarray(sk.s_coeffs),
    )


def load_secret_key(path: str) -> SecretKey:
    data = np.load(path, allow_pickle=False)
    ectx = context_from_json(str(data["__meta__"]))
    return SecretKey(
        ctx=ectx,
        s_ntt=jnp.asarray(data["s_ntt"]),
        s_coeffs=data["s_coeffs"],
    )


def save_groth16_pk(path: str, pk, cs_path: str):
    """CRS to npz (+ the R1CS to its own JSON file)."""
    pk.constraint_system.save(cs_path)
    store, meta = {}, {
        "ctx": context_to_json(pk.params.enc),
        "use_modswitch": pk.params.use_modswitch,
        "cs_path": cs_path,
    }
    for name in ("alpha", "beta", "s_pows", "gamma_io", "delta_mid", "delta_ts"):
        _enc_arrays(name, getattr(pk, name), store, meta)
    np.savez_compressed(path, __meta__=json.dumps(meta), **store)


def load_groth16_pk(path: str):
    from ..relations.r1cs import R1CSConstraintSystem
    from ..snark.api import SnarkParams
    from ..snark.groth16 import ProvingKey
    from ..utils.domain import RootsDomain

    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["__meta__"]))
    ectx = context_from_json(meta["ctx"])
    cs = R1CSConstraintSystem.load(meta["cs_path"], ectx.ring)
    params = SnarkParams(
        ring=ectx.ring, enc=ectx, use_modswitch=meta["use_modswitch"]
    )
    return ProvingKey(
        constraint_system=cs,
        compiled=cs.compile(ectx.ring),
        domain=RootsDomain(ectx.ring, max(cs.num_constraints(), 1)),
        params=params,
        alpha=_enc_load("alpha", data, meta, ectx),
        beta=_enc_load("beta", data, meta, ectx),
        s_pows=_enc_load("s_pows", data, meta, ectx),
        gamma_io=_enc_load("gamma_io", data, meta, ectx),
        delta_mid=_enc_load("delta_mid", data, meta, ectx),
        delta_ts=_enc_load("delta_ts", data, meta, ectx),
    )


_RINOCCHIO_PK_ENCS = (
    "s_pows", "alpha_s_pows", "beta_prods", "beta_rv_ts", "beta_rw_ts",
    "beta_ry_ts", "alpha_rv_ts", "alpha_rw_ts", "alpha_ry_ts",
    "rv_vs", "rw_ws", "ry_ys",
)


def save_rinocchio_pk(path: str, pk, cs_path: str):
    """Rinocchio CRS to npz (`rinocchio.hpp:10-58`; streaming declared but
    unimplemented in the reference, `r1cs_ppzksnark.hpp:43-47`)."""
    pk.constraint_system.save(cs_path)
    store, meta = {}, {
        "ctx": context_to_json(pk.params.enc),
        "use_modswitch": pk.params.use_modswitch,
        "cs_path": cs_path,
    }
    for name in _RINOCCHIO_PK_ENCS:
        _enc_arrays(name, getattr(pk, name), store, meta)
    np.savez_compressed(path, __meta__=json.dumps(meta), **store)


def load_rinocchio_pk(path: str):
    from ..relations.r1cs import R1CSConstraintSystem
    from ..snark.api import SnarkParams
    from ..snark.rinocchio import ProvingKey
    from ..utils.domain import RootsDomain

    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["__meta__"]))
    ectx = context_from_json(meta["ctx"])
    cs = R1CSConstraintSystem.load(meta["cs_path"], ectx.ring)
    params = SnarkParams(
        ring=ectx.ring, enc=ectx, use_modswitch=meta["use_modswitch"]
    )
    encs = {n: _enc_load(n, data, meta, ectx) for n in _RINOCCHIO_PK_ENCS}
    return ProvingKey(
        constraint_system=cs,
        compiled=cs.compile(ectx.ring),
        domain=RootsDomain(ectx.ring, max(cs.num_constraints(), 1)),
        params=params,
        **encs,
    )


# ---- seeded / streamed key format -----------------------------------------
# The format actually used at scale: c0-only CRS batches + the PRNG key that
# regenerates c1 (snark/seeded.SeededEncoding), or the CRS-less stub the
# streamed provers return.  The compiled R1CS (array path) is embedded, so
# benchmark-scale keys round-trip without the object frontend.


def _key_save(key, store: dict, prefix: str, meta: dict):
    import jax

    store[f"{prefix}_keydata"] = np.asarray(jax.random.key_data(key))
    meta[f"{prefix}_impl"] = str(jax.random.key_impl(key))


def _key_load(data, prefix: str, meta: dict):
    import jax

    return jax.random.wrap_key_data(
        jnp.asarray(data[f"{prefix}_keydata"]), impl=meta[f"{prefix}_impl"]
    )


def save_compiled(store: dict, meta: dict, comp):
    meta["compiled"] = {
        "num_constraints": comp.num_constraints,
        "num_variables": comp.num_variables,
        "primary_input_size": comp.primary_input_size,
    }
    for i, which in enumerate("abc"):
        store[f"coo_{which}_rows"] = np.asarray(comp.rows[i])
        store[f"coo_{which}_cols"] = np.asarray(comp.cols[i])
        store[f"coo_{which}_coeffs"] = np.asarray(comp.coeffs[i])


def load_compiled(data, meta: dict, ring: RingContext):
    from ..relations.r1cs import CompiledR1CS

    m = meta["compiled"]
    return CompiledR1CS(
        ctx=ring,
        num_constraints=m["num_constraints"],
        num_variables=m["num_variables"],
        primary_input_size=m["primary_input_size"],
        rows=tuple(jnp.asarray(data[f"coo_{w}_rows"]) for w in "abc"),
        cols=tuple(jnp.asarray(data[f"coo_{w}_cols"]) for w in "abc"),
        coeffs=tuple(jnp.asarray(data[f"coo_{w}_coeffs"]) for w in "abc"),
    )


def save_seeded_pk(path: str, pk):
    """snark/seeded.SeededProvingKey to npz: c0-only CRS batches + PRNG keys
    (half the bytes of the expanded CRS), or the streamed provers' CRS-less
    stub (gamma_io only).  The reference declares pk streaming and never
    implements it (`r1cs_ppzksnark.hpp:43-47`)."""
    store, meta = {}, {
        "ctx": context_to_json(pk.params.enc),
        "use_modswitch": pk.params.use_modswitch,
        "seeded": [],
    }
    save_compiled(store, meta, pk.compiled)
    for name in ("alpha", "beta", "gamma_io"):
        _enc_arrays(name, getattr(pk, name), store, meta)
    for name in ("s_pows", "delta_mid", "delta_ts"):
        se = getattr(pk, name)
        if se is None:
            meta[name] = None
            continue
        store[f"{name}_c0"] = np.asarray(se.c0)
        _key_save(se.key, store, name, meta)
        meta[name] = {"slab": se.slab, "batch": se.batch, "level": se.level}
        meta["seeded"].append(name)
    np.savez_compressed(path, __meta__=json.dumps(meta), **store)


def load_seeded_pk(path: str):
    from ..snark.api import SnarkParams
    from ..snark.seeded import SeededEncoding, SeededProvingKey
    from ..utils.domain import RootsDomain

    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["__meta__"]))
    ectx = context_from_json(meta["ctx"])
    comp = load_compiled(data, meta, ectx.ring)
    params = SnarkParams(
        ring=ectx.ring, enc=ectx, use_modswitch=meta["use_modswitch"]
    )
    seeded = {}
    for name in ("s_pows", "delta_mid", "delta_ts"):
        if meta[name] is None:
            seeded[name] = None
            continue
        seeded[name] = SeededEncoding(
            ctx=ectx,
            c0=jnp.asarray(data[f"{name}_c0"]),
            key=_key_load(data, name, meta),
            slab=meta[name]["slab"],
            batch=meta[name]["batch"],
            level=meta[name]["level"],
        )
    return SeededProvingKey(
        compiled=comp,
        domain=RootsDomain(ectx.ring, max(comp.num_constraints, 1)),
        params=params,
        alpha=_enc_load("alpha", data, meta, ectx),
        beta=_enc_load("beta", data, meta, ectx),
        gamma_io=_enc_load("gamma_io", data, meta, ectx),
        **seeded,
    )


_VK_RING_FIELDS = {
    "groth16": ("s", "alpha", "beta", "gamma", "delta"),
    "rinocchio": ("s", "alpha", "beta", "r_v", "r_w", "r_y"),
}


def save_vk(path: str, vk, pk_path: str, cs_path: str):
    """Verification key (designated-verifier: trapdoor ring elements + the
    encoding secret key) for either proof system; the embedded pk is saved to
    `pk_path` and referenced.  Covers the abstract API's declared-but-never-
    implemented vk streaming (`r1cs_ppzksnark.hpp:69-74`)."""
    from ..snark import groth16 as _g16, rinocchio as _rin
    from ..snark.seeded import SeededProvingKey

    if isinstance(vk, _g16.VerificationKey):
        system = "groth16"
        if isinstance(vk.pk, SeededProvingKey):
            system = "groth16_seeded"
            save_seeded_pk(pk_path, vk.pk)
        else:
            save_groth16_pk(pk_path, vk.pk, cs_path)
    elif isinstance(vk, _rin.VerificationKey):
        system = "rinocchio"
        save_rinocchio_pk(pk_path, vk.pk, cs_path)
    else:  # pragma: no cover - defensive
        raise TypeError(f"unknown verification key type {type(vk)}")
    fields = _VK_RING_FIELDS[system.split("_")[0]]
    store = {name: np.asarray(getattr(vk, name).res) for name in fields}
    sk = vk.sk_enc
    store["sk_s_ntt"] = np.asarray(sk.s_ntt)
    store["sk_s_coeffs"] = np.asarray(sk.s_coeffs)
    meta = {
        "system": system,
        "pk_path": pk_path,
        "ctx": context_to_json(vk.pk.params.enc),
    }
    np.savez_compressed(path, __meta__=json.dumps(meta), **store)


def load_vk(path: str):
    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["__meta__"]))
    system = meta["system"]
    ectx = context_from_json(meta["ctx"])
    if system == "groth16_seeded":
        from ..snark.groth16 import VerificationKey

        pk = load_seeded_pk(meta["pk_path"])
        system = "groth16"
    elif system == "groth16":
        from ..snark.groth16 import VerificationKey

        pk = load_groth16_pk(meta["pk_path"])
    else:
        from ..snark.rinocchio import VerificationKey

        pk = load_rinocchio_pk(meta["pk_path"])
    elems = {
        name: RingElem(ectx.ring, jnp.asarray(data[name]))
        for name in _VK_RING_FIELDS[system]
    }
    sk = SecretKey(
        ctx=ectx,
        s_ntt=jnp.asarray(data["sk_s_ntt"]),
        s_coeffs=data["sk_s_coeffs"],
    )
    return VerificationKey(pk=pk, sk_enc=sk, **elems)
