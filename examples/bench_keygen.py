"""Keygen warm-vs-cold benchmark (VERDICT r4 next-round #2).

Runs keygen TWICE in one process on the mul-chain circuit and reports
both wall-clocks with per-phase splits.  The second run separates
compile cost (paid once per process through the axon tunnel; the
persistent cache does not hit across processes on this backend) from
actual device work — the number that compares against the reference's
seconds-class CPU keygen (keygen.rs:233-455).

Run on TPU:  BENCH_K=17 HALO2_TPU_PROFILE=1 python examples/bench_keygen.py
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

from halo2_tpu.plonk.keygen import keygen
from halo2_tpu.poly.commitment import Params
from halo2_tpu.utils import profiling

from bench_prover import MulChainCircuit


def main():
    k = int(os.environ.get("BENCH_K", "17"))
    n = 1 << k
    t0 = time.time()
    params = Params.unsafe_setup(k, seed=7)
    print(f"setup k={k}: {time.time()-t0:.1f}s", flush=True)

    from halo2_tpu.plonk.circuit import ConstraintSystem
    cs = ConstraintSystem()
    MulChainCircuit(1).configure(cs)
    rows = cs.usable_rows(n)

    for run in ("cold", "warm"):
        import gc
        gc.collect()
        t0 = time.time()
        vk, pk = keygen(params, MulChainCircuit(rows))
        # drain: keygen's device work (commits, iNTTs, l-polys) dispatches
        # async — force completion so the number is honest
        import numpy as np
        np.asarray(pk.fixed_coeff[:1, :1, :1])
        np.asarray(pk.l_blind_coeff[:1, :1])
        dt = time.time() - t0
        print(f"keygen ({run}): {dt:.1f}s", flush=True)
        if os.environ.get("HALO2_TPU_PROFILE") == "1":
            profiling.report()
            profiling.reset()
        if run == "cold":
            vk = pk = None


if __name__ == "__main__":
    main()
