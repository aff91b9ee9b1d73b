"""Parallel witness synthesis (plonk/parallel_synthesis.py): forked
workers writing region cells into shared-memory columns must produce the
exact witness the sequential path produces (prover.rs:1525-1781 /
flat.rs:286-336 semantics), including the big-value overflow merge,
deferred Assigned rationals, and error propagation.  Host-only — no
keygen or device work."""

import numpy as np
import pytest

from halo2_tpu.circuit import SingleChipLayouter
from halo2_tpu.fields.bn254 import Fr
from halo2_tpu.plonk.assigned import Assigned
from halo2_tpu.plonk.circuit import ConstraintSystem
from halo2_tpu.plonk.error import SynthesisError
from halo2_tpu.plonk.prover import WitnessCollection

P = Fr.p
K = 10
N = 1 << K
ROWS_PER_REGION = 64
REGIONS = 8


class ParConfig:
    def __init__(self, a, b):
        self.a, self.b = a, b


class ParCircuit:
    """REGIONS independent regions at absolute offsets (flat planner):
    per-cell writes in column a, a bulk write in column b; region 3 also
    writes a >=2^64 value (overflow path) and a deferred rational."""

    def __init__(self, workers, big=True, fail_region=None,
                 use_constant=False):
        self.workers = workers
        self.big = big
        self.fail_region = fail_region
        self.use_constant = use_constant

    def configure(self, meta):
        return ParConfig(meta.advice_column(), meta.advice_column())

    def synthesize(self, config, layouter):
        def make_region(j):
            def fn(region):
                base = j * ROWS_PER_REGION
                last = None
                for i in range(ROWS_PER_REGION):
                    v = (j * 100003 + i * 7) % P
                    last = region.assign_advice("a", config.a, base + i, v)
                region.assign_advice_bulk(
                    "b", config.b, base,
                    np.arange(ROWS_PER_REGION, dtype=np.uint64) + j)
                if j == 3 and self.big:
                    region.assign_advice("big", config.a, base, P - 1)
                    region.assign_advice(
                        "rat", config.b, base,
                        Assigned(num=6, den=3))   # resolves to 2
                if j == self.fail_region:
                    raise ValueError("boom in region")
                if j == 2 and self.use_constant:
                    region.assign_advice_from_constant(
                        "c", config.a, base + 1, 5)
                return last
            return fn

        return layouter.assign_regions(
            "par", [make_region(j) for j in range(REGIONS)],
            workers=self.workers)


def synthesize(circuit):
    cs = ConstraintSystem()
    config = circuit.configure(cs)
    witness = WitnessCollection(cs, N, cs.usable_rows(N), [])
    layouter = SingleChipLayouter(witness, cs.constants, flat=True)
    result = circuit.synthesize(config, layouter)
    witness.resolve_deferred()
    return witness, result


def as_int_col(col):
    return [int(v) for v in col]


def test_parallel_matches_sequential():
    w_seq, _ = synthesize(ParCircuit(workers=1))    # sequential path
    w_par, res_par = synthesize(ParCircuit(workers=4))   # forked path
    assert as_int_col(w_par.advice[0]) == as_int_col(w_seq.advice[0])
    assert as_int_col(w_par.advice[1]) == as_int_col(w_seq.advice[1])
    assert w_par.max_assigned == w_seq.max_assigned
    assert w_par.max_value == w_seq.max_value
    # the big value landed exactly (bigint degrade on column a)
    assert as_int_col(w_par.advice[0])[3 * ROWS_PER_REGION] == P - 1
    # the deferred rational resolved to num/den = 2
    assert as_int_col(w_par.advice[1])[3 * ROWS_PER_REGION] == 2
    # region results come back in order (AssignedCells pickle)
    assert len(res_par) == REGIONS
    for j, cell in enumerate(res_par):
        assert cell is not None
        assert cell.cell.row == j * ROWS_PER_REGION + ROWS_PER_REGION - 1


def test_worker_error_propagates():
    with pytest.raises(SynthesisError, match="boom"):
        synthesize(ParCircuit(workers=4, fail_region=5))


def test_constrain_constant_rejected_in_parallel():
    with pytest.raises(SynthesisError, match="constrain_constant"):
        synthesize(ParCircuit(workers=4, use_constant=True))


def test_shared_columns_survive_collection():
    """The returned advice arrays stay valid after the collection is
    dropped (shm mapping pinned by the ndarray's buffer export)."""
    w, _ = synthesize(ParCircuit(workers=4, big=False))
    cols = w.advice
    del w
    assert int(np.asarray(cols[1][:4]).sum()) >= 0  # no unmapped read
