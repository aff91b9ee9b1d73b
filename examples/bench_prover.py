"""Prover wall-clock benchmark: a row-filling mul-chain circuit at
configurable k (BENCH_K, default 12) — the analogue of the reference's
benches/plonk.rs standard-PLONK prover bench.

Run on TPU:  BENCH_K=14 python examples/bench_prover.py
"""

import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
jax.config.update("jax_compilation_cache_dir",
                  __file__.rsplit("/", 2)[0] + (
                      "/.jax_cache" if jax.default_backend() == "cpu"
                      else "/.jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from halo2_tpu.fields.bn254 import Fr
from halo2_tpu.plonk import Circuit
from halo2_tpu.plonk.keygen import keygen
from halo2_tpu.plonk.prover import create_proof
from halo2_tpu.plonk.verifier import verify_proof
from halo2_tpu.poly.commitment import Params

P = Fr.p


class MulChainCircuit(Circuit):
    """b[i] = b[i-1] * a[i] over all usable rows: one degree-3 gate, full
    witness occupancy, rotation next() query."""

    def __init__(self, rows=None, seed=1):
        self.rows = rows
        self.seed = seed

    def without_witnesses(self):
        return MulChainCircuit(self.rows, self.seed)

    def configure(self, meta):
        a = meta.advice_column()
        b = meta.advice_column()
        s = meta.selector()

        def gate(m):
            return [("chain", m.query_selector(s) *
                     (m.query_advice(b, 0) * m.query_advice(a, 0)
                      - m.query_advice(b, 1)))]

        meta.create_gate("mulchain", gate)
        return (a, b, s)

    def synthesize(self, config, layouter):
        a_col, b_col, s = config
        rows = self.rows
        import random
        rng = random.Random(self.seed)
        a_vals = [rng.randrange(1, P) for _ in range(rows)]
        b_vals = [1] * rows
        for i in range(1, rows):
            b_vals[i] = b_vals[i - 1] * a_vals[i - 1] % P

        def fn(region):
            for i in range(rows - 1):
                region.enable_selector("s", s, i)
            region.assign_advice_bulk("a", a_col, 0, a_vals)
            region.assign_advice_bulk("b", b_col, 0, b_vals)
        layouter.assign_region("chain", fn)


def main():
    k = int(os.environ.get("BENCH_K", "12"))
    n = 1 << k
    t0 = time.time()
    params = Params.unsafe_setup(k, seed=7)
    print(f"setup k={k}: {time.time()-t0:.1f}s", flush=True)

    # probe usable rows
    from halo2_tpu.plonk.circuit import ConstraintSystem
    cs = ConstraintSystem()
    MulChainCircuit(1).configure(cs)
    rows = cs.usable_rows(n)

    t0 = time.time()
    vk, pk = keygen(params, MulChainCircuit(rows))
    print(f"keygen: {time.time()-t0:.1f}s", flush=True)

    # witness synthesis+encode alone (columnar fast path; VERDICT r2 #5
    # wants synthesis+encode <= 20% of warm prove time)
    from halo2_tpu.plonk.prover import synthesize_witness
    import jax.numpy as jnp
    import numpy as np
    t0 = time.time()
    advice, _ = synthesize_witness(pk, MulChainCircuit(rows), [])
    synth_s = time.time() - t0
    t0 = time.time()
    enc = [jnp.asarray(Fr.encode(c)) for c in advice]
    _ = [np.asarray(e[:1, :1]) for e in enc]
    enc_s = time.time() - t0
    print(f"synthesis: {synth_s:.2f}s ({rows/max(synth_s,1e-9):.0f} rows/s); "
          f"encode+transfer: {enc_s:.2f}s", flush=True)
    del enc

    t0 = time.time()
    # the axon tunnel occasionally drops a long remote-compile request
    # mid-body on cold multi-minute runs; one retry reuses every program
    # compiled so far, so it resumes roughly where the drop happened
    for attempt in range(int(os.environ.get("BENCH_PROVE_RETRIES", "2")) + 1):
        try:
            proof = create_proof(params, pk, MulChainCircuit(rows), [], seed=0)
            break
        except Exception as e:
            if "remote_compile" not in str(e) or attempt >= 2:
                raise
            print(f"cold prove attempt {attempt}: tunnel error, retrying "
                  f"({e})", flush=True)
    print(f"prove (compile+first): {time.time()-t0:.1f}s "
          f"({len(proof)} bytes)", flush=True)
    t0 = time.time()
    ok = verify_proof(params.verifier(1), vk, [], proof)
    print(f"verify (first proof): {time.time()-t0:.1f}s valid={ok}",
          flush=True)
    assert ok
    from halo2_tpu.utils import profiling
    if os.environ.get("HALO2_TPU_PROFILE") == "1":
        profiling.reset()
    import gc
    gc.collect()          # drop proof-1 device buffers before re-proving
    t0 = time.time()
    proof = create_proof(params, pk, MulChainCircuit(rows), [], seed=1)
    dt = time.time() - t0
    print(f"prove (warm): {dt:.2f}s  ({n/dt:.0f} rows/s)", flush=True)
    stats = getattr(jax.devices()[0], "memory_stats", lambda: None)()
    if stats:
        print(f"HBM peak: {stats.get('peak_bytes_in_use', 0)/2**30:.2f} GiB "
              f"(in use {stats.get('bytes_in_use', 0)/2**30:.2f} GiB)",
              flush=True)
    if os.environ.get("HALO2_TPU_PROFILE") == "1":
        profiling.report()
    t0 = time.time()
    ok = verify_proof(params.verifier(1), vk, [], proof)
    print(f"verify: {time.time()-t0:.1f}s valid={ok}", flush=True)
    assert ok


if __name__ == "__main__":
    main()
