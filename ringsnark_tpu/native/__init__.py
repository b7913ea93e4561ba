"""ctypes bindings for the native C++ oracle/baseline library.

Builds `native/libringsnark_native.so` on demand (make); all entry points
degrade gracefully (`available() == False`) when no compiler is present.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from functools import lru_cache

import numpy as np

__all__ = [
    "available",
    "set_threads",
    "max_threads",
    "mulmod",
    "powmod",
    "invmod",
    "negacyclic_ntt",
    "negacyclic_intt",
    "cyclic_ntt",
    "cyclic_intt",
    "ip_accumulate",
    "ip_accumulate_scalar",
    "lift_rows",
    "g16_witness_map",
]

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_SO_PATH = os.path.join(_NATIVE_DIR, "libringsnark_native.so")


@lru_cache(maxsize=1)
def _lib():
    if not os.path.exists(_SO_PATH):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR], check=True, capture_output=True
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None
    u32, u64 = ctypes.c_uint32, ctypes.c_uint64
    pu32 = ctypes.POINTER(ctypes.c_uint32)
    lib.rn_mulmod.restype = u32
    lib.rn_mulmod.argtypes = [u32, u32, u32]
    lib.rn_powmod.restype = u32
    lib.rn_powmod.argtypes = [u32, u64, u32]
    lib.rn_invmod.restype = u32
    lib.rn_invmod.argtypes = [u32, u32]
    lib.rn_negacyclic_ntt.argtypes = [pu32, u64, u32, u32, u32, u32]
    lib.rn_negacyclic_intt.argtypes = [pu32, u64, u32, u32, u32, u32]
    lib.rn_cyclic_ntt.argtypes = [pu32, u64, u32, u32, u32]
    lib.rn_cyclic_intt.argtypes = [pu32, u64, u32, u32, u32]
    lib.rn_ip_accumulate.argtypes = [pu32, pu32, pu32, u64, u64, u32]
    lib.rn_ip_accumulate_scalar.argtypes = [pu32, pu32, pu32, u64, u64, u32]
    lib.rn_lift_rows.argtypes = [pu32, pu32, u64, u32, u32]
    pi32 = ctypes.POINTER(ctypes.c_int32)
    lib.rn_g16_witness_map.argtypes = [
        pi32, pi32, pu32, u64, u32,  # A matrix COO (+ coeff slot count)
        pi32, pi32, pu32, u64, u32,  # B matrix COO
        pu32, u32, u32, u32, u32, u32,  # z, S, M, p, w, w2
        pu32, pu32, pu32,  # a_full, b_full, H
    ]
    lib.rn_set_threads.argtypes = [ctypes.c_int]
    lib.rn_get_max_threads.restype = ctypes.c_int
    return lib


def available() -> bool:
    return _lib() is not None


def set_threads(n: int) -> None:
    """Set the OpenMP thread count for the CPU baseline legs (1 = the
    single-core leg; max_threads() = the 'single-socket' leg)."""
    _lib().rn_set_threads(int(n))


def max_threads() -> int:
    return int(_lib().rn_get_max_threads())


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))


def mulmod(a: int, b: int, p: int) -> int:
    return int(_lib().rn_mulmod(a, b, p))


def powmod(a: int, e: int, p: int) -> int:
    return int(_lib().rn_powmod(a, e, p))


def invmod(a: int, p: int) -> int:
    return int(_lib().rn_invmod(a, p))


def _batched(fn, data: np.ndarray, *args) -> np.ndarray:
    out = np.ascontiguousarray(data, dtype=np.uint32).copy()
    batch = out.size // out.shape[-1]
    fn(_ptr(out), batch, out.shape[-1], *args)
    return out


def negacyclic_ntt(data, p, w, psi):
    """In the same DIF/bit-reversed-out convention as ops/ntt.py."""
    return _batched(_lib().rn_negacyclic_ntt, data, p, w, psi)


def negacyclic_intt(data, p, w, psi):
    return _batched(_lib().rn_negacyclic_intt, data, p, w, psi)


def cyclic_ntt(data, p, w):
    return _batched(_lib().rn_cyclic_ntt, data, p, w)


def cyclic_intt(data, p, w):
    return _batched(_lib().rn_cyclic_intt, data, p, w)


def ip_accumulate(ct: np.ndarray, pt: np.ndarray, p: int) -> np.ndarray:
    """sum_b ct[b] * pt[b] elementwise over trailing dims, one limb."""
    ct = np.ascontiguousarray(ct, dtype=np.uint32)
    pt = np.ascontiguousarray(pt, dtype=np.uint32)
    assert ct.shape == pt.shape
    batch, n = ct.shape[0], ct.size // ct.shape[0]
    acc = np.zeros(n, dtype=np.uint32)
    _lib().rn_ip_accumulate(_ptr(ct), _ptr(pt), _ptr(acc), batch, n, p)
    return acc.reshape(ct.shape[1:])


def ip_accumulate_scalar(ct: np.ndarray, w: np.ndarray, p: int) -> np.ndarray:
    """sum_b ct[b] * w[b] (scalar weight per row), one limb."""
    ct = np.ascontiguousarray(ct, dtype=np.uint32)
    w = np.ascontiguousarray(w, dtype=np.uint32)
    batch, n = ct.shape[0], ct.size // ct.shape[0]
    assert w.shape == (batch,)
    acc = np.zeros(n, dtype=np.uint32)
    _lib().rn_ip_accumulate_scalar(_ptr(ct), _ptr(w), _ptr(acc), batch, n, p)
    return acc.reshape(ct.shape[1:])


def lift_rows(v: np.ndarray, t: int, Q: int) -> np.ndarray:
    """Centered lift of values mod t into limb modulus Q."""
    v = np.ascontiguousarray(v, dtype=np.uint32)
    out = np.empty_like(v)
    _lib().rn_lift_rows(_ptr(v), _ptr(out), v.size, t, Q)
    return out


def g16_witness_map(coo_a, coo_b, z: np.ndarray, M: int, p: int, w: int,
                    w2: int):
    """Full groth16 prover-mode witness map, one outer limb.

    coo_a/coo_b: (rows int32[nnz], cols int32[nnz], coeffs uint32[nnz] or
    uint32[nnz, S] per-slot); z: uint32[num_vars+1, S] full assignment
    (S = 1 for Z_q).  Returns (a_full[M, S], b_full[M, S], H[M+1, S])
    coefficient vectors — bit-exact vs the JAX kernel (same roots w, w2).
    """
    import ctypes as ct_

    def pi(a):
        return a.ctypes.data_as(ct_.POINTER(ct_.c_int32))

    z = np.ascontiguousarray(z, dtype=np.uint32)
    if z.ndim == 1:
        z = z[:, None]
    S = z.shape[1]

    def prep(coo):
        r, c, v = coo
        r = np.ascontiguousarray(r, np.int32)
        c = np.ascontiguousarray(c, np.int32)
        v = np.ascontiguousarray(v, np.uint32)
        slots = 1 if v.ndim == 1 else v.shape[1]
        assert slots in (1, S), (slots, S)
        return r, c, v, slots

    ra, ca, va, sa = prep(coo_a)
    rb, cb, vb, sb = prep(coo_b)
    a_full = np.zeros((M, S), dtype=np.uint32)
    b_full = np.zeros((M, S), dtype=np.uint32)
    H = np.zeros((M + 1, S), dtype=np.uint32)
    _lib().rn_g16_witness_map(
        pi(ra), pi(ca), _ptr(va), len(ra), sa,
        pi(rb), pi(cb), _ptr(vb), len(rb), sb,
        _ptr(z), S, M, p, w, w2, _ptr(a_full), _ptr(b_full), _ptr(H),
    )
    return a_full, b_full, H
