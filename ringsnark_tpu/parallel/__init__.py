"""Multi-chip sharding: device meshes and sharded prover entry points.

The reference has no distributed backend (OpenMP only, SURVEY §2.3); this is
new capability.  Axes:

* ``limb`` — outer RNS limbs: embarrassingly parallel (the reference's
  one-SEAL-context-per-limb becomes a sharded array axis);
* ``data`` — CRS/witness batch axis: inner products do local
  multiply-accumulate and reduce with a psum inserted by GSPMD.
* ``coeff`` — transform coefficient axis: butterfly stages exchange blocks
  via ppermute (ntt_sharded.py), for transforms larger than one chip.
"""

from .mesh import make_mesh, crs_sharding, ring_sharding, replicate  # noqa: F401
from .sharded import (  # noqa: F401
    shard_groth16_inputs,
    groth16_prove_sharded,
    shard_rinocchio_inputs,
    rinocchio_prove_sharded,
)
from .ntt_sharded import make_sharded_ntt, sharded_ntt  # noqa: F401
from .stream_sharded import stream_chunk_ip_sharded  # noqa: F401
