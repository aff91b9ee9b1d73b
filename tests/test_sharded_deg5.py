"""Sharded byte-identity at ext_k=12 (degree-5 gate) — its own module.

Split from test_sharded_prover.py for the same reason as
test_sharded_all_args.py: fewer large XLA-CPU compiles per process
(this image's compiler aborts intermittently under heavy compile load;
tests/conftest.py notes), and a dedicated retry under tests/run_all.sh."""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from halo2_tpu.fields.bn254 import Fr
from halo2_tpu.plonk.keygen import keygen
from halo2_tpu.plonk.prover import create_proof
from halo2_tpu.plonk.verifier import verify_proof
from halo2_tpu.poly.commitment import Params

P = Fr.p


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.array(jax.devices()[:8]), ("x",))


class Deg5Circuit:
    """Row-filling degree-5 gate (s * (a*b*c*d - e)): quotient degree 4,
    so ext_k = k + 2 — at K10 = 10 the extended domain is 2^12 over 8
    devices (multi-row all_to_all tiles, n1=64 x n2=64 four-step split),
    a materially larger collective shape than the K=6 smoke test."""

    def __init__(self, rows=None, seed=2):
        self.rows = rows
        self.seed = seed

    def without_witnesses(self):
        return Deg5Circuit(self.rows, self.seed)

    def configure(self, meta):
        cols = [meta.advice_column() for _ in range(5)]
        s = meta.selector()

        def gate(m):
            a, b, c, d, e = (m.query_advice(col, 0) for col in cols)
            return [("deg5", m.query_selector(s) * (a * b * c * d - e))]

        meta.create_gate("deg5", gate)
        return (cols, s)

    def synthesize(self, config, layouter):
        cols, s = config
        import random as _random
        rng = _random.Random(self.seed)
        rows = self.rows
        vals = [[rng.randrange(1, P) for _ in range(rows)] for _ in range(4)]
        outs = [vals[0][i] * vals[1][i] % P * vals[2][i] % P * vals[3][i] % P
                for i in range(rows)]

        def fn(region):
            for i in range(rows):
                region.enable_selector("s", s, i)
            for c, v in zip(cols, vals + [outs]):
                region.assign_advice_bulk("col", c, 0, v)
        layouter.assign_region("deg5", fn)


def test_sharded_proof_deg5_k10(mesh):
    """Byte-identity of the sharded pipeline at ext_k = 12 (the K=6 smoke
    test only reaches ext_k 7): multi-row all_to_all tiles in the
    distributed NTT, non-trivial ppermute boundaries, degree-4 quotient
    split — no gate monkeypatching (VERDICT r3 #4)."""
    from halo2_tpu.plonk.circuit import ConstraintSystem

    k10 = 10
    n = 1 << k10
    params = Params.unsafe_setup(k10, seed=13)
    probe = ConstraintSystem()
    Deg5Circuit(1).configure(probe)
    rows = probe.usable_rows(n)
    circuit = Deg5Circuit(rows)
    vk, pk = keygen(params, circuit)
    proof_single = create_proof(params, pk, circuit, [], seed=0)
    params.use_mesh(mesh)
    try:
        proof_sharded = create_proof(params, pk, circuit, [], seed=0)
    finally:
        params.use_mesh(None)
    assert proof_sharded == proof_single
    assert verify_proof(params.verifier(1), vk, [], proof_sharded)
