"""Minimal TPU validation: one sorted/signed MSM, correctness vs host golden
model + honest wall time.  Prints progress eagerly so a hung compile is
distinguishable from a slow one."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from halo2_tpu.curves import g1, host
from halo2_tpu.fields.bn254 import Fr
from halo2_tpu.msm import msm

K = int(os.environ.get("K", "14"))
N = 1 << K


def main():
    import random
    print(f"devices: {jax.devices()}  n=2^{K}", flush=True)
    r = random.Random(42)
    pts = [host.random_point(r) for _ in range(min(N, 256))]
    # tile host points to N (distinct scalars keep the MSM non-degenerate)
    pts = (pts * (N // len(pts) + 1))[:N]
    scalars = [r.randrange(Fr.p) for _ in range(N)]
    t0 = time.perf_counter()
    dev_pts = g1.encode_points(pts)
    dev_scal = jnp.asarray(Fr.encode(scalars))
    print(f"encode: {time.perf_counter()-t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    proj = msm((dev_pts[0], dev_pts[1]), dev_scal)
    jax.block_until_ready(proj)
    print(f"compile+run 1: {time.perf_counter()-t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    proj = msm((dev_pts[0], dev_pts[1]), dev_scal)
    jax.block_until_ready(proj)
    dt = time.perf_counter() - t0
    print(f"run 2: {dt*1e3:.1f} ms -> {N/dt/1e6:.3f} M pts/s", flush=True)

    t0 = time.perf_counter()
    got = g1.decode_points(
        jnp.stack(g1.to_affine(tuple(p[:, None] for p in proj))))[0]
    print(f"decode: {time.perf_counter()-t0:.1f}s", flush=True)
    want = host.msm(pts, scalars)
    print("MATCH" if got == want else f"MISMATCH: {got} != {want}", flush=True)


if __name__ == "__main__":
    main()
