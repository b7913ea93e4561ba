"""Ring context: the immutable parameter object threaded through all APIs.

Replaces the reference's process-global static `SEALContext` singletons
(`/root/reference/ringsnark/seal/seal_ring.hpp:52-66`, a documented defect —
SURVEY.md §5 config) with an explicit hashable dataclass that jitted
functions close over.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import cached_property, lru_cache
import math

import numpy as np
import jax.numpy as jnp

from ..ops import primes as _primes
from ..ops import ntt as _ntt

__all__ = ["RingContext"]


@dataclass(frozen=True)
class RingContext:
    """Parameters of the ring R = Z_q[X]/(X^N+1) with q = prod(primes).

    N == 1 gives the integer ring Z_q (the reference's `seal_int` backend).
    Ring elements are stored in **slot form** (negacyclic-NTT evaluation
    order, bit-reversed labeling — see ops/ntt.py); multiplication is
    pointwise, mirroring the reference's always-NTT-form invariant
    (`seal/seal_ring.tcc:265-277`).
    """

    primes: tuple[int, ...]
    N: int = 1

    def __post_init__(self):
        assert len(self.primes) >= 1
        assert self.N == 1 or (self.N & (self.N - 1)) == 0
        for p in self.primes:
            assert p < (1 << 31), "limb primes must fit uint32 with headroom"
            if self.N > 1:
                assert (p - 1) % (2 * self.N) == 0, (
                    f"prime {p} is not NTT-friendly for negacyclic degree {self.N}"
                )

    # ---- static properties ------------------------------------------------

    @property
    def L(self) -> int:
        return len(self.primes)

    @cached_property
    def q(self) -> int:
        return math.prod(self.primes)

    @cached_property
    def primes_np(self) -> np.ndarray:
        return np.array(self.primes, dtype=np.uint32)

    # ---- broadcast-ready limb constants, shape [L, 1] ---------------------

    # NOTE: limb constants are numpy arrays on purpose — jit treats them as
    # embedded constants; lazily-created jnp arrays would leak tracers when
    # the cached_property first fires inside a trace.

    @cached_property
    def p(self):
        return self.primes_np[:, None]

    @cached_property
    def mu(self):
        info = [_primes.make_prime(p) for p in self.primes]
        return np.array([i.mu for i in info], dtype=np.uint64)[:, None]

    @cached_property
    def pbits(self):
        info = [_primes.make_prime(p) for p in self.primes]
        return np.array([i.bits for i in info], dtype=np.uint32)[:, None]

    # ---- NTT plan for coefficient <-> slot conversion ---------------------

    @cached_property
    def ntt_plan(self) -> _ntt.NTTPlan | None:
        if self.N == 1:
            return None
        return _ntt.get_plan(self.primes, self.N, negacyclic=True)

    # ---- host-side helpers ------------------------------------------------

    def to_rns(self, x: int) -> np.ndarray:
        """Residues of an integer, shape [L] uint32."""
        return np.array([x % p for p in self.primes], dtype=np.uint32)

    def from_rns(self, residues) -> int:
        return _primes.crt_compose([int(r) for r in residues], list(self.primes))


@lru_cache(maxsize=None)
def default_context(L: int = 3, N: int = 1, order: int = 1 << 21) -> RingContext:
    """Convenience preset: L limbs of ~31-bit primes ≡ 1 mod `order`."""
    ps = tuple(_primes.find_ntt_primes(L, order))
    return RingContext(primes=ps, N=N)
