"""Device-mesh construction and sharding specs for the SNARK data layouts."""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "crs_sharding", "ring_sharding", "replicate"]


def make_mesh(
    n_devices: int | None = None, limb: int = 1, coeff: int = 1, devices=None
) -> Mesh:
    """('limb', 'data') mesh — or ('limb', 'coeff', 'data') when coeff > 1.

    limb * coeff must divide n_devices; 'data' gets the rest.  The 'coeff'
    axis carries the witness map's NTT coefficient sharding
    (parallel/witness_sharded.py); 'data' carries the CRS batch; 'limb' the
    independent outer RNS channels."""
    devices = devices if devices is not None else jax.devices()
    n = n_devices if n_devices is not None else len(devices)
    assert n <= len(devices), f"need {n} devices, have {len(devices)}"
    assert n % (limb * coeff) == 0
    if coeff > 1:
        arr = np.array(devices[:n]).reshape(limb, coeff, n // (limb * coeff))
        return Mesh(arr, ("limb", "coeff", "data"))
    arr = np.array(devices[:n]).reshape(limb, n // limb)
    return Mesh(arr, ("limb", "data"))


def crs_sharding(mesh: Mesh) -> NamedSharding:
    """Ciphertext batch [B, L, L', N']: B over data, outer limbs over limb."""
    return NamedSharding(mesh, P("data", "limb", None, None))


def ring_sharding(mesh: Mesh, batched: bool = True) -> NamedSharding:
    """Ring batch [B, L, n]: B over data, L over limb."""
    if batched:
        return NamedSharding(mesh, P("data", "limb", None))
    return NamedSharding(mesh, P("limb", None))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
