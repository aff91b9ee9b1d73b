"""End-to-end: keygen -> create_proof -> verify_proof for a standard PLONK
circuit with a custom mul gate, copy constraints, a constant, and a public
input — milestone 1 of SURVEY.md §7 (the `simple-example` class)."""

import pytest

from halo2_tpu.plonk import Circuit
from halo2_tpu.plonk.keygen import keygen
from halo2_tpu.plonk.prover import create_proof
from halo2_tpu.plonk.verifier import verify_proof
from halo2_tpu.poly.commitment import Params
from halo2_tpu.fields.bn254 import Fr

P = Fr.p
K = 4


class SimpleConfig:
    def __init__(self, a0, a1, instance, s_mul, const_col):
        self.a0, self.a1 = a0, a1
        self.instance = instance
        self.s_mul = s_mul
        self.const_col = const_col


class SimpleCircuit(Circuit):
    """out = (a * b) * (a * const7); exposes out at instance row 0."""

    def __init__(self, a=None, b=None):
        self.a, self.b = a, b

    def without_witnesses(self):
        return SimpleCircuit()

    def configure(self, meta):
        a0 = meta.advice_column()
        a1 = meta.advice_column()
        instance = meta.instance_column()
        const_col = meta.fixed_column()
        meta.enable_constant(const_col)
        for c in (a0, a1, instance):
            meta.enable_equality(c)
        s_mul = meta.selector()

        def mul_gate(m):
            lhs = m.query_advice(a0, 0)
            rhs = m.query_advice(a1, 0)
            out = m.query_advice(a0, 1)
            s = m.query_selector(s_mul)
            return [("mul", s * (lhs * rhs - out))]

        meta.create_gate("mul", mul_gate)
        return SimpleConfig(a0, a1, instance, s_mul, const_col)

    def synthesize(self, config, layouter):
        a, b = self.a, self.b

        def mul_region(x, y):
            def fn(region):
                region.enable_selector("s", config.s_mul, 0)
                cx = region.assign_advice("x", config.a0, 0, x)
                cy = region.assign_advice("y", config.a1, 0, y)
                prod = None if (x is None or y is None) else x * y % P
                cp = region.assign_advice("xy", config.a0, 1, prod)
                return cx, cy, cp
            return fn

        # ab = a * b
        cx, cy, c_ab = layouter.assign_region("m1", mul_region(a, b))
        # a7 = a * 7 (7 from the constants column)
        def region2(region):
            region.enable_selector("s", config.s_mul, 0)
            ca = region.assign_advice("a2", config.a0, 0, a)
            c7 = region.assign_advice_from_constant("seven", config.a1, 0, 7)
            prod = None if a is None else a * 7 % P
            cp = region.assign_advice("a7", config.a0, 1, prod)
            # copy equality: this 'a' must equal the first region's 'a'
            region.constrain_equal(ca.cell, cx.cell)
            return cp
        c_a7 = layouter.assign_region("m2", region2)
        # out = ab * a7
        ab = None if (a is None or b is None) else a * b % P
        a7 = None if a is None else a * 7 % P

        def region3(region):
            region.enable_selector("s", config.s_mul, 0)
            c1 = region.assign_advice("ab", config.a0, 0, ab)
            c2 = region.assign_advice("a7", config.a1, 0, a7)
            region.constrain_equal(c1.cell, c_ab.cell)
            region.constrain_equal(c2.cell, c_a7.cell)
            out = None if (ab is None or a7 is None) else ab * a7 % P
            return region.assign_advice("out", config.a0, 1, out)
        c_out = layouter.assign_region("m3", region3)
        layouter.constrain_instance(c_out.cell, config.instance, 0)


@pytest.fixture(scope="module")
def setup():
    params = Params.unsafe_setup(K, seed=7)
    vk, pk = keygen(params, SimpleCircuit())
    return params, vk, pk


def expected_out(a, b):
    return (a * b % P) * (a * 7 % P) % P


def test_prove_and_verify(setup):
    params, vk, pk = setup
    a, b = 3, 5
    circuit = SimpleCircuit(a, b)
    out = expected_out(a, b)
    proof = create_proof(params, pk, circuit, [[out]], seed=0)
    pv = params.verifier(1)
    assert verify_proof(pv, vk, [[out]], proof)


def test_wrong_instance_rejected(setup):
    params, vk, pk = setup
    a, b = 3, 5
    proof = create_proof(params, pk, SimpleCircuit(a, b),
                         [[expected_out(a, b)]], seed=0)
    pv = params.verifier(1)
    assert not verify_proof(pv, vk, [[expected_out(a, b) + 1]], proof)


def test_tampered_proof_rejected(setup):
    params, vk, pk = setup
    a, b = 2, 9
    out = expected_out(a, b)
    proof = bytearray(create_proof(params, pk, SimpleCircuit(a, b), [[out]], seed=0))
    # flip a byte in some scalar region near the end
    proof[-40] ^= 1
    pv = params.verifier(1)
    try:
        ok = verify_proof(pv, vk, [[out]], bytes(proof))
    except ValueError:
        ok = False
    assert not ok


def test_proof_deterministic_and_different_seeds(setup):
    params, vk, pk = setup
    out = expected_out(4, 6)
    p1 = create_proof(params, pk, SimpleCircuit(4, 6), [[out]], seed=1)
    p2 = create_proof(params, pk, SimpleCircuit(4, 6), [[out]], seed=1)
    p3 = create_proof(params, pk, SimpleCircuit(4, 6), [[out]], seed=2)
    assert p1 == p2
    assert p1 != p3
    pv = params.verifier(1)
    assert verify_proof(pv, vk, [[out]], p3)


def test_unsatisfied_witness_fails(setup):
    params, vk, pk = setup

    class Cheat(SimpleCircuit):
        def synthesize(self, config, layouter):
            # assign wrong product in region 1
            def fn(region):
                region.enable_selector("s", config.s_mul, 0)
                region.assign_advice("x", config.a0, 0, 3)
                region.assign_advice("y", config.a1, 0, 5)
                return region.assign_advice("xy", config.a0, 1, 16)  # wrong
            layouter.assign_region("m1", fn)
            # minimal rest: satisfy instance with junk equality-free cell
            def fn2(region):
                return region.assign_advice("out", config.a0, 0, 5)
            c = layouter.assign_region("m4", fn2)
            layouter.constrain_instance(c.cell, config.instance, 0)

    proof = create_proof(params, pk, Cheat(3, 5), [[5]], seed=0)
    pv = params.verifier(1)
    assert not verify_proof(pv, vk, [[5]], proof)


def test_batch_verifier(setup):
    from halo2_tpu.multiopen import BatchVerifier
    params, vk, pk = setup
    pv = params.verifier(1)
    proofs = []
    for seed, (a, b) in enumerate([(3, 5), (2, 9)]):
        out = expected_out(a, b)
        proofs.append((out, create_proof(params, pk, SimpleCircuit(a, b),
                                         [[out]], seed=seed)))
    batch = BatchVerifier(seed=7)
    for out, proof in proofs:
        verify_proof(pv, vk, [[out]], proof, strategy=batch)
    assert batch.finalize(pv)
    # a bad proof in the batch must fail the single pairing
    batch2 = BatchVerifier(seed=7)
    verify_proof(pv, vk, [[proofs[0][0]]], proofs[0][1], strategy=batch2)
    verify_proof(pv, vk, [[proofs[1][0] + 1]], proofs[1][1], strategy=batch2)
    assert not batch2.finalize(pv)


def test_stateful_configure_single_run(setup):
    """configure() must run exactly ONCE (at keygen); the prover reuses the
    config stored on the pk (ProvingKey.config) instead of re-running
    configure on a throwaway CS — a stateful configure() would silently
    desync prover columns from keygen columns otherwise (VERDICT r2 #7)."""
    params, _, _ = setup

    class StatefulCircuit(SimpleCircuit):
        configure_calls = 0

        def without_witnesses(self):
            return StatefulCircuit()

        def configure(self, meta):
            # class-level state: any second configure() call (same or
            # different instance) blows up
            StatefulCircuit.configure_calls += 1
            if StatefulCircuit.configure_calls > 1:
                raise AssertionError("configure() ran more than once")
            return super().configure(meta)

    vk2, pk2 = keygen(params, StatefulCircuit())
    assert pk2.config is not None
    a, b = 3, 5
    out = expected_out(a, b)
    proof = create_proof(params, pk2, StatefulCircuit(a, b), [[out]], seed=0)
    assert StatefulCircuit.configure_calls == 1
    pv = params.verifier(1)
    assert verify_proof(pv, vk2, [[out]], proof)


def test_multi_instance_proof(setup):
    """Batch proving: two circuit instances in ONE proof (the reference's
    create_proof over &[ConcreteCircuit])."""
    from halo2_tpu.plonk.prover import create_proof_multi
    from halo2_tpu.plonk.verifier import verify_proof_multi
    params, vk, pk = setup
    outs = [expected_out(3, 5), expected_out(2, 9)]
    proof = create_proof_multi(
        params, pk, [SimpleCircuit(3, 5), SimpleCircuit(2, 9)],
        [[[outs[0]]], [[outs[1]]]], seed=11)
    pv = params.verifier(1)
    assert verify_proof_multi(pv, vk, [[[outs[0]]], [[outs[1]]]], proof)
    # swapped instances must fail
    assert not verify_proof_multi(pv, vk, [[[outs[1]]], [[outs[0]]]], proof)
