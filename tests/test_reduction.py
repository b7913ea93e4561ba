"""R1CS->QRP reduction tests: fast array path vs generic host path vs QRP checks."""

import numpy as np
import pytest

from ringsnark_tpu.rings.context import default_context
from ringsnark_tpu.rings.elem import RingElem
from ringsnark_tpu.relations.r1cs import R1CSConstraint
from ringsnark_tpu.gadgets import PBVariableArray, Protoboard
from ringsnark_tpu.utils.domain import RootsDomain
from ringsnark_tpu.reductions.r1cs_to_qrp import (
    r1cs_to_qrp_instance_map,
    r1cs_to_qrp_instance_map_with_evaluation,
    r1cs_to_qrp_witness_map,
    r1cs_to_qrp_witness_map_generic,
)


@pytest.fixture(scope="module", params=["scalar", "poly"])
def setup(request):
    if request.param == "scalar":
        ctx = default_context(L=2, N=1, order=1 << 12)
    else:
        ctx = default_context(L=2, N=8, order=1 << 12)
    pb = Protoboard(ctx)
    vars = PBVariableArray()
    vars.allocate(pb, 6, "x")
    pb.set_input_sizes(5)
    pb.add_r1cs_constraint(R1CSConstraint(vars[2], vars[3], vars[5]))
    pb.add_r1cs_constraint(
        R1CSConstraint(vars[0] + vars[1], vars[5], vars[4])
    )
    # constraint with a constant term (exercises the corrected io/mid split)
    pb.add_r1cs_constraint(
        R1CSConstraint(vars[5] + 1, 1, vars[5] + 1)
    )
    rng = np.random.default_rng(11)
    vals = [RingElem.random_element(ctx, rng) for _ in range(4)]
    v5 = vals[2] * vals[3]
    v4 = (vals[0] + vals[1]) * v5
    for i, v in enumerate(vals):
        pb.set_val(vars[i], v)
    pb.set_val(vars[4], v4)
    pb.set_val(vars[5], v5)
    assert pb.is_satisfied()
    return ctx, pb


def test_witness_map_fast_vs_generic(setup):
    ctx, pb = setup
    dom = RootsDomain(ctx, pb.num_constraints())
    rng = np.random.default_rng(12)
    d1 = RingElem.random_invertible_element(ctx, rng)
    d2 = RingElem.random_invertible_element(ctx, rng)
    d3 = RingElem.random_invertible_element(ctx, rng)

    comp = pb.compile()
    fast = r1cs_to_qrp_witness_map(
        comp, pb.primary_input(), pb.auxiliary_input(), d1, d2, d3, dom
    )
    gen = r1cs_to_qrp_witness_map_generic(
        pb.get_constraint_system(), pb.primary_input(), pb.auxiliary_input(),
        d1, d2, d3, dom,
    )

    def cmp_vec(fast_batch, gen_list, name):
        flist = [fast_batch[i] for i in range(len(fast_batch))]
        # generic lists may be shorter (stripped); extra fast entries are zero
        for i, g in enumerate(gen_list):
            assert flist[i] == g.broadcast_to_poly() or flist[i] == g, (
                f"{name}[{i}] mismatch"
            )
        for i in range(len(gen_list), len(flist)):
            assert flist[i].is_zero(), f"{name}[{i}] expected zero"

    cmp_vec(fast.coefficients_for_A_io, gen.coefficients_for_A_io, "a_io")
    cmp_vec(fast.coefficients_for_B_io, gen.coefficients_for_B_io, "b_io")
    cmp_vec(fast.coefficients_for_C_io, gen.coefficients_for_C_io, "c_io")
    cmp_vec(fast.coefficients_for_A_mid, gen.coefficients_for_A_mid, "a_mid")
    cmp_vec(fast.coefficients_for_B_mid, gen.coefficients_for_B_mid, "b_mid")
    cmp_vec(fast.coefficients_for_C_mid, gen.coefficients_for_C_mid, "c_mid")
    cmp_vec(fast.coefficients_for_Z, gen.coefficients_for_Z, "Z")
    cmp_vec(fast.coefficients_for_H, gen.coefficients_for_H, "H")


def test_io_plus_mid_equals_full(setup):
    """A_io + A_mid must interpolate the full evaluations (constant once)."""
    ctx, pb = setup
    dom = RootsDomain(ctx, pb.num_constraints())
    zero = RingElem.zero(ctx)
    comp = pb.compile()
    wit = r1cs_to_qrp_witness_map(
        comp, pb.primary_input(), pb.auxiliary_input(), zero, zero, zero, dom
    )
    from ringsnark_tpu.utils import poly as _poly

    one = RingElem.one(ctx)
    full = pb.full_variable_assignment()
    for i, cons in enumerate(pb.get_constraint_system().constraints):
        want_a = cons.a.evaluate(full, one)
        x_i = dom.get_domain_element(i)
        got = _poly.eval_poly(
            [
                wit.coefficients_for_A_io[k] + wit.coefficients_for_A_mid[k]
                for k in range(dom.m)
            ],
            x_i,
        )
        assert got == want_a.broadcast_to_poly() or got == want_a


def test_qrp_instance_satisfied(setup):
    ctx, pb = setup
    dom = RootsDomain(ctx, pb.num_constraints())
    rng = np.random.default_rng(13)
    inst = r1cs_to_qrp_instance_map(pb.get_constraint_system(), dom)
    d1 = RingElem.random_invertible_element(ctx, rng)
    d2 = RingElem.random_invertible_element(ctx, rng)
    d3 = RingElem.random_invertible_element(ctx, rng)
    wit = r1cs_to_qrp_witness_map_generic(
        pb.get_constraint_system(), pb.primary_input(), pb.auxiliary_input(),
        d1, d2, d3, dom,
    )
    assert inst.is_satisfied(wit, rng=np.random.default_rng(14))


def test_qrp_instance_eval_satisfied_fast_witness(setup):
    ctx, pb = setup
    dom = RootsDomain(ctx, pb.num_constraints())
    rng = np.random.default_rng(15)
    comp = pb.compile()
    t = dom.random_exceptional(rng)
    ev = r1cs_to_qrp_instance_map_with_evaluation(comp, t, dom)
    d1 = RingElem.random_invertible_element(ctx, rng)
    d2 = RingElem.random_invertible_element(ctx, rng)
    d3 = RingElem.random_invertible_element(ctx, rng)
    wit = r1cs_to_qrp_witness_map(
        comp, pb.primary_input(), pb.auxiliary_input(), d1, d2, d3, dom
    )
    assert ev.is_satisfied(wit)


def test_qrp_unsatisfied_witness_rejected(setup):
    ctx, pb = setup
    dom = RootsDomain(ctx, pb.num_constraints())
    rng = np.random.default_rng(16)
    comp = pb.compile()
    t = dom.random_exceptional(rng)
    ev = r1cs_to_qrp_instance_map_with_evaluation(comp, t, dom)
    zero = RingElem.zero(ctx)
    # corrupt an auxiliary value
    bad_aux = [v + RingElem.one(ctx) for v in pb.auxiliary_input()]
    wit = r1cs_to_qrp_witness_map(
        comp, pb.primary_input(), bad_aux, zero, zero, zero, dom
    )
    assert not ev.is_satisfied(wit)


def test_instance_eval_fast_vs_generic_lagrange(setup):
    ctx, pb = setup
    dom = RootsDomain(ctx, pb.num_constraints())
    rng = np.random.default_rng(17)
    comp = pb.compile()
    t = dom.random_exceptional(rng)
    ev = r1cs_to_qrp_instance_map_with_evaluation(comp, t, dom)
    # generic recomputation of At/Bt/Ct via the instance maps
    inst = r1cs_to_qrp_instance_map(pb.get_constraint_system(), dom)
    u = dom.evaluate_all_lagrange_polynomials(t)
    zero = RingElem.zero(ctx)
    for Mmap, fast in (
        (inst.A_in_Lagrange_basis, ev.At),
        (inst.B_in_Lagrange_basis, ev.Bt),
        (inst.C_in_Lagrange_basis, ev.Ct),
    ):
        for k in range(pb.num_variables() + 1):
            acc = zero
            for row, coeff in Mmap[k].items():
                acc = acc + u[row] * coeff
            assert fast[k] == acc or fast[k] == acc.broadcast_to_poly()
    # Ht = powers of t
    cur = RingElem.one(ctx)
    for i in range(dom.m + 1):
        assert ev.Ht[i] == cur
        cur = cur * t
