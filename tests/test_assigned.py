"""Assigned<F> deferred division (assigned.rs:11-17) and
batch_invert_assigned (poly.rs:148-173): semantics, and the guarantee that
a division-heavy circuit's synthesis performs ZERO per-cell inversions —
one batch inversion total (VERDICT r3 "Next round" #7)."""

import random

import pytest

from halo2_tpu.fields.bn254 import Fr
from halo2_tpu.plonk import Circuit
from halo2_tpu.plonk.assigned import Assigned, batch_invert

P = Fr.p
rng = random.Random(17)


# --------------------------------------------------------------------------
# semantics (mirrors the assigned.rs match arms)
# --------------------------------------------------------------------------

def test_arith_matches_fraction_math():
    for _ in range(50):
        a_n, a_d = rng.randrange(P), rng.randrange(1, P)
        b_n, b_d = rng.randrange(P), rng.randrange(1, P)
        a = Assigned.rational(a_n, a_d)
        b = Assigned.rational(b_n, b_d)
        av = a_n * pow(a_d, P - 2, P) % P
        bv = b_n * pow(b_d, P - 2, P) % P
        assert (a + b).evaluate() == (av + bv) % P
        assert (a - b).evaluate() == (av - bv) % P
        assert (a * b).evaluate() == av * bv % P
        assert (-a).evaluate() == (-av) % P
        assert a.invert().evaluate() == pow(av, P - 2, P)


def test_denominator_zero_maps_to_zero():
    # "A denominator of zero maps to an assigned value of zero"
    # (assigned.rs:9) — including the add/sub short-circuit arms
    x = Assigned.rational(5, 0)
    y = Assigned.trivial(7)
    assert x.evaluate() == 0
    assert (x + y).evaluate() == 7
    assert (y + x).evaluate() == 7
    assert (y - x).evaluate() == 7
    assert (x * y).evaluate() == 0


def test_zero_and_trivial():
    assert Assigned.zero().evaluate() == 0
    assert Assigned.trivial(42).evaluate() == 42
    assert int(Assigned.rational(10, 2)) == 5
    assert (Assigned.trivial(3) + 4).evaluate() == 7
    assert (2 * Assigned.trivial(3)).evaluate() == 6


def test_batch_invert_matches_pow():
    vals = [rng.randrange(1, P) for _ in range(20)] + [0, 1]
    got = batch_invert(vals)
    for v, g in zip(vals, got):
        assert g == (pow(v, P - 2, P) if v else 0)


# --------------------------------------------------------------------------
# the division gadget circuit
# --------------------------------------------------------------------------

class DivCircuit(Circuit):
    """c[i] = a[i] / b[i] assigned as Assigned.rational — the gate
    b*c - a = 0 checks the division; synthesis itself must not invert."""

    ROWS = 12

    def __init__(self, seed=3):
        self.seed = seed

    def without_witnesses(self):
        return DivCircuit(self.seed)

    def configure(self, meta):
        a = meta.advice_column()
        b = meta.advice_column()
        c = meta.advice_column()
        s = meta.selector()
        meta.create_gate("div", lambda m: [
            ("b*c-a", m.query_selector(s) *
             (m.query_advice(b, 0) * m.query_advice(c, 0)
              - m.query_advice(a, 0)))])
        return (a, b, c, s)

    def synthesize(self, config, layouter):
        a_col, b_col, c_col, s = config
        r = random.Random(self.seed)

        def fn(region):
            for i in range(self.ROWS):
                av, bv = r.randrange(P), r.randrange(1, P)
                region.enable_selector("s", s, i)
                region.assign_advice("a", a_col, i, av)
                region.assign_advice("b", b_col, i, bv)
                region.assign_advice("c", c_col, i,
                                     Assigned.rational(av, bv))
        layouter.assign_region("divs", fn)


def test_division_gadget_mock():
    from halo2_tpu.dev import MockProver
    MockProver.run(5, DivCircuit(), []).assert_satisfied()


def test_division_gadget_synthesis_defers(monkeypatch):
    """Witness synthesis performs ZERO per-cell inversions: evaluate() is
    never called on a rational and exactly one batch inversion resolves
    all deferred cells."""
    import halo2_tpu.plonk.assigned as asg
    from halo2_tpu.plonk.keygen import keygen
    from halo2_tpu.plonk.prover import synthesize_witness
    from halo2_tpu.poly.commitment import Params

    params = Params.unsafe_setup(5, seed=7)
    vk, pk = keygen(params, DivCircuit())

    eager_rational_evals = 0
    orig_eval = asg.Assigned.evaluate

    def counting_eval(self):
        nonlocal eager_rational_evals
        if self.den not in (0, 1):
            eager_rational_evals += 1
        return orig_eval(self)
    monkeypatch.setattr(asg.Assigned, "evaluate", counting_eval)

    batch_calls = 0
    orig_batch = asg.batch_invert

    def counting_batch(vals):
        nonlocal batch_calls
        batch_calls += 1
        return orig_batch(vals)
    monkeypatch.setattr(asg, "batch_invert", counting_batch)

    advice, _ = synthesize_witness(pk, DivCircuit(), [])
    assert eager_rational_evals == 0
    assert batch_calls == 1
    # resolved values are correct: b*c == a mod p for every row
    r = random.Random(3)
    for i in range(DivCircuit.ROWS):
        av, bv = r.randrange(P), r.randrange(1, P)
        cv = int(advice[2][i])
        assert bv * cv % P == av


def test_division_gadget_prove_verify():
    from halo2_tpu.plonk.keygen import keygen
    from halo2_tpu.plonk.prover import create_proof
    from halo2_tpu.plonk.verifier import verify_proof
    from halo2_tpu.poly.commitment import Params

    params = Params.unsafe_setup(5, seed=7)
    vk, pk = keygen(params, DivCircuit())
    proof = create_proof(params, pk, DivCircuit(), [], seed=0)
    assert verify_proof(params.verifier(0), vk, [], proof)
