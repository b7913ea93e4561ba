"""Coefficient-sharded witness map: the prover's size-M/2M NTTs over 'coeff'.

The witness map (`reductions/r1cs_to_qrp._witness_map_kernel`, mirroring
`/root/reference/ringsnark/reductions/r1cs_to_qrp/r1cs_to_qrp.tcc:148-259`)
is 9 interpolations (size-M inverse NTTs) plus the size-2M product/quotient.
At M = 2^18 those transforms dominate the non-IP prover time; this module
runs them coefficient-sharded over a mesh 'coeff' axis via
`ntt_sharded.make_sharded_ntt` (ppermute butterfly-stage exchanges), while
the SpMV constraint evaluation and all elementwise steps stay under GSPMD.

Bit-exactness: the sharded transforms are bit-identical to the single-device
path (tests/test_ntt_sharded.py), and every other step is elementwise, so
the witness map — and therefore the whole proof — is bit-identical across
mesh sizes (asserted in tests/test_parallel.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ops import ntt as _ntt
from ..ops.modops import mul_mod, sub_mod, add_mod, neg_mod
from ..utils.domain import RootsDomain
from .ntt_sharded import make_sharded_ntt

__all__ = ["make_witness_map_sharded"]


def make_witness_map_sharded(comp, domain: RootsDomain, mesh, axis: str = "coeff"):
    """Returns witness_map(z_full, z_io, z_mid) -> (a_io..c_mid, Z, H) with
    the M/2M transforms sharded over mesh[axis].  Non-ZK variant (the d1/d2/d3
    patch is zero in the groth16 prover, `groth16.tcc:76-84`)."""
    ctx = comp.ctx
    M = domain.m
    D = mesh.shape[axis]
    assert M % D == 0 and M // D >= 2, (M, D)
    intt_M = make_sharded_ntt(domain.plan, mesh, axis, negacyclic=False,
                              inverse=True)
    plan2 = _ntt.get_plan(ctx.primes, 2 * M)
    fwd_2M = make_sharded_ntt(plan2, mesh, axis, negacyclic=False, inverse=False)
    inv_2M = make_sharded_ntt(plan2, mesh, axis, negacyclic=False, inverse=True)
    coeff_last = NamedSharding(mesh, P(None, None, axis))

    def interp(evals_bln):
        """[M, L, n] domain-order evals -> [M, L, n] coefficients."""
        x = jnp.transpose(evals_bln, (2, 1, 0))  # [n, L, M]
        x = jax.device_put(x, coeff_last)
        c = intt_M(x)
        return jnp.transpose(c, (2, 1, 0))

    def witness_map(z_full, z_io, z_mid):
        evals = {}
        for name, z in (("full", z_full), ("io", z_io), ("mid", z_mid)):
            evals[name] = comp.eval_matrices(z, num_rows=M)
        coeffs = {
            name: tuple(interp(e) for e in evals[name]) for name in evals
        }
        aA, aB, _aC = coeffs["full"]

        # H = upper half of coeffs(A*B) — size-2M sharded convolution
        af = jnp.transpose(aA, (2, 1, 0))
        bf = jnp.transpose(aB, (2, 1, 0))
        pad = ((0, 0),) * (af.ndim - 1) + ((0, M),)
        af2 = fwd_2M(jax.device_put(jnp.pad(af, pad), coeff_last))
        bf2 = fwd_2M(jax.device_put(jnp.pad(bf, pad), coeff_last))
        prod = inv_2M(mul_mod(af2, bf2, plan2.p, plan2.mu, plan2.pbits))
        h_main = jnp.transpose(prod[..., M:], (2, 1, 0))  # [M, L, n]

        n = h_main.shape[-1]
        zeros_head = jnp.zeros((1, ctx.L, n), dtype=jnp.uint32)
        H = jnp.concatenate([h_main, jnp.zeros_like(zeros_head)], axis=0)

        negone = neg_mod(jnp.ones((1, ctx.L, 1), dtype=jnp.uint32), ctx.p)
        zerosZ = jnp.zeros((M - 1, ctx.L, 1), dtype=jnp.uint32)
        ones = jnp.ones((1, ctx.L, 1), dtype=jnp.uint32)
        Z = jnp.concatenate([negone, zerosZ, ones], axis=0)

        a_io, b_io, c_io = coeffs["io"]
        a_mid, b_mid, c_mid = coeffs["mid"]
        return (a_io, b_io, c_io, a_mid, b_mid, c_mid, Z, H)

    return witness_map
