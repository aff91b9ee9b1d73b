"""Selector compression + pinned vk string tests.

Ports the reference's property test (circuit/compress_selectors.rs:236-354)
to the Python frontend and pins the Rust-Debug rendering of the pinned
constraint system for the simple-example circuit (plonk/circuit.rs:1145-1181,
plonk.rs:91-133)."""

import random

import pytest

from halo2_tpu.fields.bn254 import Fr
from halo2_tpu.plonk.circuit import (
    Column, Constant, ConstraintSystem, FixedQuery, SelectorExpr,
    eval_expression_host,
)
from halo2_tpu.plonk.pinned import pinned_cs_str

P = Fr.p


def _compress(activations_and_degrees, n, minimum_degree):
    """Build a CS whose gates give each selector the requested max degree,
    then run compress_selectors.  Returns (cs, combos, replacements_eval)
    where replacements_eval(sel_idx, row_value) evaluates the substituted
    expression with the combination column set to row_value."""
    cs = ConstraintSystem()
    a = cs.advice_column()
    cs.minimum_degree = minimum_degree
    sels = []
    for degree, _acts in activations_and_degrees:
        s = cs.selector() if degree > 0 else cs.complex_selector()
        sels.append(s)

    cells_holder = {}

    def gate(m):
        exprs = []
        for (degree, _acts), s in zip(activations_and_degrees, sels):
            if degree <= 0:
                continue
            # selector * advice^(degree-1): gate degree = degree
            e = m.query_selector(s)
            for _ in range(degree - 1):
                e = e * m.query_advice(a, 0)
            exprs.append(("", e))
        if not exprs:
            exprs.append(("", m.query_advice(a, 0)))
        return exprs

    cs.create_gate("g", gate)
    activations = [acts for _, acts in activations_and_degrees]
    combos = cs.compress_selectors(activations)
    return cs, combos


@pytest.mark.parametrize("seed", range(8))
def test_compression_property(seed):
    """For every selector: the substituted expression evaluates nonzero on
    rows where the selector is active and zero elsewhere, under the
    combination column assignment (the reference proptest's core check)."""
    rng = random.Random(seed)
    n = 24
    num_sel = rng.randint(1, 10)
    max_degree = rng.randint(2, 8)
    spec = []
    for _ in range(num_sel):
        degree = rng.randint(0, max_degree - 1)
        acts = [rng.random() < 0.3 for _ in range(n)]
        spec.append((degree, acts))
    cs, combos = _compress(spec, n, minimum_degree=max_degree)

    # reconstruct each selector's substituted expression by evaluating the
    # gate polys is awkward; instead check through the selector_map +
    # combination assignment: build fixed lookup and evaluate substituted
    # gate polys row by row against the direct selector semantics.
    assert len(cs.selector_map) == len(spec)
    # combination columns in allocation order carry combos' value lists
    ordered = sorted(set(cs.selector_map), key=lambda c: c.index)
    assert len(ordered) == len(combos)
    col_to_vals = {col.index: vals for col, vals in zip(ordered, combos)}

    # evaluate each substituted gate poly per row; advice = 1 so the poly
    # reduces to the selector-replacement expression
    poly_i = 0
    for (degree, acts) in spec:
        if degree <= 0:
            continue
        poly = cs.gates[0].polys[poly_i]
        poly_i += 1
        for row in range(n):
            val = eval_expression_host(
                poly,
                lambda q, r=row: col_to_vals[
                    cs.fixed_queries[q.query_index][0].index][r],
                lambda q: 1,
                lambda q: 0,
            )
            if acts[row]:
                assert val != 0, f"active row {row} evaluated to zero"
            else:
                assert val == 0, f"inactive row {row} evaluated nonzero"
        # degree bound: substituted poly degree <= max cs degree
        assert poly.degree() <= cs.degree()

    # complex/unused selectors: direct 0/1 columns
    for i, (degree, acts) in enumerate(spec):
        col = cs.selector_map[i]
        if degree <= 0:
            vals = col_to_vals[col.index]
            assert vals == [1 if b else 0 for b in acts]


def test_disjoint_selectors_share_column():
    """Two disjoint simple selectors of compatible degree pack into ONE
    fixed column (roots 1 and 2)."""
    n = 8
    spec = [(2, [True, False] * 4), (2, [False, True] * 4)]
    cs, combos = _compress(spec, n, minimum_degree=4)
    assert len(combos) == 1
    assert cs.selector_map[0] == cs.selector_map[1]
    assert combos[0] == [1, 2] * 4


def test_conflicting_selectors_get_own_columns():
    n = 4
    spec = [(2, [True, True, False, False]), (2, [True, False, True, False])]
    cs, combos = _compress(spec, n, minimum_degree=4)
    assert len(combos) == 2
    assert cs.selector_map[0] != cs.selector_map[1]


def test_pinned_cs_fixture():
    """Exact Rust-format pinned CS string for the simple-example circuit
    (hand-derived from PinnedConstraintSystem::to_string,
    plonk/circuit.rs:1145-1181, and the derived Debug impls)."""
    from tests.test_e2e import SimpleCircuit
    from halo2_tpu.plonk.keygen import rebuild_cs

    cs, _, degree = rebuild_cs(SimpleCircuit(), 16)
    got = pinned_cs_str(cs)
    want = (
        "PinnedConstraintSystem{"
        "num_fixed_columns:2,"
        "num_advice_columns:2,"
        "num_instance_columns:1,"
        "num_selectors:1,"
        "selector_map:[Column { index: 1, column_type: Fixed }],"
        "gates:["
        "Product(Fixed { query_index: 1, column_index: 1, rotation: Rotation(0) }, "
        "Sum(Product(Advice { query_index: 0, column_index: 0, rotation: Rotation(0) }, "
        "Advice { query_index: 1, column_index: 1, rotation: Rotation(0) }), "
        "Negated(Advice { query_index: 2, column_index: 0, rotation: Rotation(1) }))),"
        "],"
        "advice_queries:["
        "(Column { index: 0, column_type: Advice }, Rotation(0)), "
        "(Column { index: 1, column_type: Advice }, Rotation(0)), "
        "(Column { index: 0, column_type: Advice }, Rotation(1))],"
        "instance_queries:[(Column { index: 0, column_type: Instance }, Rotation(0))],"
        "fixed_queries:[(Column { index: 0, column_type: Fixed }, Rotation(0)), "
        "(Column { index: 1, column_type: Fixed }, Rotation(0))],"
        "permutation:Argument { columns: ["
        "Column { index: 0, column_type: Fixed }, "
        "Column { index: 0, column_type: Advice }, "
        "Column { index: 1, column_type: Advice }, "
        "Column { index: 0, column_type: Instance }] },"
        "lookups:[],"
        "shuffles:[],"
        "constants:[Column { index: 0, column_type: Fixed }],"
        "minimum_degree:None"
        "}")
    assert got == want


def test_pinned_vk_shape():
    """The full pinned vk string has the derived-Debug shape of
    PinnedVerificationKey with pairing_bn256 moduli strings."""
    from tests.test_e2e import SimpleCircuit
    from halo2_tpu.plonk.keygen import keygen
    from halo2_tpu.poly.commitment import Params

    params = Params.unsafe_setup(4, seed=7)
    vk, pk = keygen(params, SimpleCircuit())
    s = vk.pinned()
    assert s.startswith(
        'PinnedVerificationKey { base_modulus: '
        '"0x30644e72e131a029b85045b68181585d97816a916871ca8d3c208c16d87cfd47", '
        'scalar_modulus: '
        '"0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000001", '
        'domain: PinnedEvaluationDomain { k: 4, extended_k: 5, omega: 0x')
    assert ', cs: "PinnedConstraintSystem{' in s
    assert s.endswith(" }")
    import re
    pts = re.findall(r"\(0x[0-9a-f]{64}, 0x[0-9a-f]{64}\)", s)
    # 2 fixed commitments (constants col + selector combination) + 4 sigma
    assert len(pts) == 2 + 4
