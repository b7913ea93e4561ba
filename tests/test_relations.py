"""Relations + gadget frontend tests (toy circuit from example_SEAL.cpp)."""

import numpy as np
import pytest

from ringsnark_tpu.rings.context import default_context
from ringsnark_tpu.rings.elem import RingElem
from ringsnark_tpu.relations.variable import LinearCombination, LinearTerm, Variable
from ringsnark_tpu.relations.r1cs import R1CSConstraint, R1CSConstraintSystem
from ringsnark_tpu.gadgets import (
    BitDecompositionGadget,
    InnerProductGadget,
    PBVariable,
    PBVariableArray,
    Protoboard,
    pb_packing_sum,
)


@pytest.fixture(scope="module")
def rq():
    return default_context(L=2, N=8, order=1 << 12)


def test_lc_merge_and_evaluate(rq):
    x1, x2 = Variable(1), Variable(2)
    lc = x1 + x2 + x1 * 3 + 5
    # terms sorted by index with x1 merged: 5*1 + 4*x1 + 1*x2
    assert [(t.index, t.coeff) for t in lc.terms] == [(0, 5), (1, 4), (2, 1)]
    one = RingElem.one(rq)
    assignment = [RingElem.scalar(rq, 7), RingElem.scalar(rq, 11)]
    val = lc.evaluate(assignment, one)
    assert val == RingElem.scalar(rq, 5 + 4 * 7 + 11)
    assert lc.is_valid(3)
    assert not lc.is_valid(2)


def _toy_circuit(ctx, wrong=False):
    """example_SEAL.cpp:38-119: x5 = x2*x3; x4 = (x0+x1)*x5, x5 private."""
    pb = Protoboard(ctx)
    vars = PBVariableArray()
    vars.allocate(pb, 6, "x")
    pb.set_input_sizes(5)
    pb.add_r1cs_constraint(R1CSConstraint(vars[2], vars[3], vars[5]))
    pb.add_r1cs_constraint(R1CSConstraint(vars[0] + vars[1], vars[5], vars[4]))

    rng = np.random.default_rng(7)
    vals = [RingElem.random_element(ctx, rng) for _ in range(4)]
    v5 = vals[2] * vals[3]
    v4 = (vals[0] + vals[1]) * v5
    if wrong:
        v4 = v4 + RingElem.one(ctx)
    for i, v in enumerate(vals):
        pb.set_val(vars[i], v)
    pb.set_val(vars[4], v4)
    pb.set_val(vars[5], v5)
    return pb


def test_toy_circuit_satisfied(rq):
    pb = _toy_circuit(rq)
    assert pb.num_inputs() == 5
    assert pb.num_variables() == 6
    assert pb.num_constraints() == 2
    # host path and compiled/jitted path agree
    cs = pb.get_constraint_system()
    assert cs.is_valid()
    assert cs.is_satisfied(pb.primary_input(), pb.auxiliary_input())
    assert pb.is_satisfied()


def test_toy_circuit_unsatisfied(rq):
    pb = _toy_circuit(rq, wrong=True)
    cs = pb.get_constraint_system()
    assert not cs.is_satisfied(pb.primary_input(), pb.auxiliary_input())
    assert not pb.is_satisfied()


def test_compiled_eval_matches_host(rq):
    pb = _toy_circuit(rq)
    comp = pb.compile()
    az, bz, cz = comp.eval_matrices(pb.full_assignment_batch().res)
    full = pb.full_variable_assignment()
    one = RingElem.one(rq)
    for i, cons in enumerate(pb.get_constraint_system().constraints):
        for arr, lc in ((az, cons.a), (bz, cons.b), (cz, cons.c)):
            want = lc.evaluate(full, one).broadcast_to_poly()
            got = RingElem.from_slots(rq, arr[i])
            assert got == want


def test_swap_ab_if_beneficial(rq):
    cs = R1CSConstraintSystem(primary_input_size=3, auxiliary_input_size=0)
    # B touches more distinct variables than A -> swap happens
    cs.add_constraint(R1CSConstraint(Variable(1), Variable(1) + Variable(2) + Variable(3), Variable(2)))
    cs.swap_AB_if_beneficial()
    assert len(cs.constraints[0].a.terms) == 3
    assert len(cs.constraints[0].b.terms) == 1


def test_bit_decomposition_gadget(rq):
    pb = Protoboard(rq)
    x = PBVariable().allocate(pb, "x")
    pb.set_input_sizes(1)
    g = BitDecompositionGadget(pb, x, log_t=8)
    g.generate_r1cs_constraints()
    # slot values: distinct small ints in every slot
    slots = np.broadcast_to(
        np.arange(rq.N, dtype=np.uint32) * 17 % 251, (rq.L, rq.N)
    ).copy()
    pb.set_val(x, RingElem.from_slots(rq, slots))
    g.generate_r1cs_witness()
    assert pb.is_satisfied()
    # flip a bit -> unsatisfied
    bad = np.asarray(pb.val(g.bits[0]).res).copy()
    bad[:, 0] ^= 1
    pb.set_val(g.bits[0], RingElem.from_slots(rq, bad))
    assert not pb.is_satisfied()


def test_inner_product_gadget(rq):
    pb = Protoboard(rq)
    n = 4
    xs, ys = PBVariableArray(), PBVariableArray()
    xs.allocate(pb, n, "x")
    ys.allocate(pb, n, "y")
    res = PBVariable().allocate(pb, "res")
    pb.set_input_sizes(2 * n + 1)
    g = InnerProductGadget(pb, xs, ys, res)
    g.generate_r1cs_constraints()
    rng = np.random.default_rng(8)
    want = RingElem.zero(rq)
    for i in range(n):
        vx, vy = RingElem.random_element(rq, rng), RingElem.random_element(rq, rng)
        pb.set_val(xs[i], vx)
        pb.set_val(ys[i], vy)
        want = want + vx * vy
    g.generate_r1cs_witness()
    assert pb.val(res) == want
    assert pb.is_satisfied()


def test_r1cs_serialization_roundtrip(rq, tmp_path):
    pb = _toy_circuit(rq)
    cs = pb.get_constraint_system()
    path = str(tmp_path / "r1cs.json")
    cs.save(path)
    loaded = R1CSConstraintSystem.load(path, rq)
    assert loaded == cs
    assert loaded.is_satisfied(pb.primary_input(), pb.auxiliary_input())
