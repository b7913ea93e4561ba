"""Abstract ppzkSNARK API shape.

Mirrors `/root/reference/ringsnark/zk_proof_systems/r1cs_ppzksnark.hpp:
173-252`: `generator(cs) -> keypair(pk, vk)`, `prover(pk, x, w) -> proof`,
`verifier(vk, x, proof) -> bool`.  The reference also declares (but never
implements) processed-vk/online-verifier variants; here `verifier` is the
weak-IC designated-verifier check for both systems.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

__all__ = ["KeyPair", "SnarkParams"]


@dataclass
class KeyPair:
    pk: Any
    vk: Any


@dataclass(frozen=True)
class SnarkParams:
    """Bundle of the contexts a proof system instance runs over."""

    ring: Any  # RingContext
    enc: Any  # EncodingContext
    domain_kind: str = "roots"
    use_modswitch: bool = True
