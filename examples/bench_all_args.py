"""Full-argument prover benchmark: EVERY proof-system feature in one
circuit at configurable k (BENCH_K, default 11) — custom gate with a
compressed selector, permutation copies, a shared-table logup lookup with
two input sets (z chaining), a shuffle, a range-checked column (sorted-
column + shuffle), and a public input.  The analogue of running the
reference's lookup_api.rs + shuffle_api.rs + range-check.rs examples at
scale in a single proof (BASELINE config #2; VERDICT round-1 item 7).

Run on TPU:  BENCH_K=11 python examples/bench_all_args.py
Proves + verifies under BOTH multiopen schemes (GWC and SHPLONK).
"""

import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
jax.config.update("jax_compilation_cache_dir",
                  __file__.rsplit("/", 2)[0] + "/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

from halo2_tpu.fields.bn254 import Fr
from halo2_tpu.circuit import FlatFloorPlanner
from halo2_tpu.plonk import Circuit
from halo2_tpu.plonk.keygen import keygen
from halo2_tpu.plonk.prover import create_proof
from halo2_tpu.plonk.verifier import verify_proof
from halo2_tpu.poly.commitment import Params

P = Fr.p
TABLE_BITS = 8
RC_MAX = 255


class AllArgsConfig:
    def __init__(self, a, b, sh, rc_origin, tc, s_sq, l0, lact, llast, inst):
        self.a, self.b, self.sh = a, b, sh
        self.rc_origin, self.tc = rc_origin, tc
        self.s_sq = s_sq
        self.l0, self.lact, self.llast = l0, lact, llast
        self.inst = inst


class AllArgsCircuit(Circuit):
    """a[i] in [0, 16); gate s*(a*a - b); a and b both logup-checked
    against the 0..255 table (shared table -> one argument, two chunked
    input sets); sh is a reversal-shuffle of a; rc_origin range-checked via
    the sorted-column argument; a[0] copied to the instance."""

    def __init__(self, rows=None, seed=5):
        self.rows = rows
        self.seed = seed

    def without_witnesses(self):
        return AllArgsCircuit(self.rows, self.seed)

    def configure(self, meta):
        a = meta.advice_column()
        b = meta.advice_column()
        sh = meta.advice_column()
        inst = meta.instance_column()
        for c in (a, inst):
            meta.enable_equality(c)
        tc = meta.table_column()
        l0 = meta.fixed_column()
        lact = meta.fixed_column()
        llast = meta.fixed_column()
        s_sq = meta.selector()

        def sq_gate(m):
            return [("sq", m.query_selector(s_sq)
                     * (m.query_advice(a, 0) * m.query_advice(a, 0)
                        - m.query_advice(b, 0)))]

        meta.create_gate("square", sq_gate)
        meta.lookup("a_range", lambda m: [(m.query_advice(a, 0), tc)])
        meta.lookup("b_range", lambda m: [(m.query_advice(b, 0), tc)])
        meta.shuffle("a_rev", lambda m: [
            (m.query_advice(a, 0), m.query_advice(sh, 0))])
        rc_origin = meta.advice_column_range(l0, lact, llast, 0, RC_MAX, 1)
        return AllArgsConfig(a, b, sh, rc_origin, tc, s_sq, l0, lact, llast,
                             inst)

    def synthesize(self, config, layouter):
        # requires the FlatFloorPlanner (absolute offsets): the range-check
        # indicator columns are tied to GLOBAL rows 0 / usable-1
        rows = self.rows
        rs = np.random.RandomState(self.seed)
        a_vals = rs.randint(0, 16, size=rows).astype(np.int64)
        a_vals[1] = a_vals[0]  # real copy constraint below
        b_vals = a_vals * a_vals
        sh_vals = a_vals[::-1].copy()
        # the prover fills the tail of the origin column with the full
        # [0, RC_MAX] step sequence — leave room for it
        rc_count = max(min(rows // 2, rows - (RC_MAX + 1) - 8), 1)
        rc_vals = rs.randint(0, RC_MAX + 1, size=rc_count).astype(np.int64)

        def table_fn(region):
            for i in range(1 << TABLE_BITS):
                region.assign_fixed("t", config.tc.inner, i, i)
        layouter.assign_table("table", table_fn)

        def fn(region):
            region.assign_fixed("l0", config.l0, 0, 1)
            for r in range(rows):
                region.assign_fixed("lact", config.lact, r, 1)
            region.assign_fixed("llast", config.llast, rows - 1, 1)
            for i in range(rows):
                region.enable_selector("s", config.s_sq, i)
            region.assign_advice_bulk("a", config.a, 0, a_vals)
            region.assign_advice_bulk("b", config.b, 0, b_vals)
            region.assign_advice_bulk("sh", config.sh, 0, sh_vals)
            region.assign_advice_bulk("rc", config.rc_origin, 0, rc_vals)
            from halo2_tpu.circuit import Cell
            region.constrain_equal(Cell(config.a, 0), Cell(config.a, 1))
        layouter.assign_region("body", fn)
        from halo2_tpu.circuit import Cell
        layouter.constrain_instance(Cell(config.a, 0), config.inst, 0)


def main():
    k = int(os.environ.get("BENCH_K", "11"))
    n = 1 << k
    t0 = time.time()
    params = Params.unsafe_setup(k, seed=7)
    print(f"setup k={k}: {time.time()-t0:.1f}s", flush=True)

    from halo2_tpu.plonk.circuit import ConstraintSystem
    cs = ConstraintSystem()
    AllArgsCircuit(1).configure(cs)
    cs.chunk_lookups()
    cs.chunk_shuffles()
    rows = cs.usable_rows(n)
    print(f"usable rows {rows}, degree {cs.degree()}, "
          f"lookup sets {[len(lk.input_expressions_sets) for lk in cs.lookups]}, "
          f"shuffle groups {len(cs.shuffles)}", flush=True)

    t0 = time.time()
    vk, pk = keygen(params, AllArgsCircuit(rows),
                    floor_planner=FlatFloorPlanner)
    print(f"keygen: {time.time()-t0:.1f}s", flush=True)

    # matches synthesize's first draw (same MT19937 stream position)
    a0 = int(np.random.RandomState(5).randint(0, 16, size=1)[0])
    instance = [[a0]]

    for name, use_gwc in (("gwc", True), ("shplonk", False)):
        t0 = time.time()
        proof = create_proof(params, pk, AllArgsCircuit(rows), instance,
                             seed=0, use_gwc=use_gwc,
                             floor_planner=FlatFloorPlanner)
        print(f"{name} prove (compile+first): {time.time()-t0:.1f}s "
              f"({len(proof)} bytes)", flush=True)
        t0 = time.time()
        proof = create_proof(params, pk, AllArgsCircuit(rows), instance,
                             seed=1, use_gwc=use_gwc,
                             floor_planner=FlatFloorPlanner)
        dt = time.time() - t0
        print(f"{name} prove (warm): {dt:.2f}s ({n/dt:.0f} rows/s)", flush=True)
        t0 = time.time()
        ok = verify_proof(params.verifier(1), vk, instance, proof,
                          use_gwc=use_gwc)
        print(f"{name} verify: {time.time()-t0:.1f}s valid={ok}", flush=True)
        assert ok


if __name__ == "__main__":
    main()
