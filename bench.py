"""Benchmark entry point — run by the driver on real TPU hardware.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Primary metric: MSM throughput (points/s) at the largest size that fits the
time budget — the reference's dominant commit-phase primitive
(/root/reference/halo2_proofs/src/arithmetic.rs best_multiexp; BASELINE.md
lists "MSM points/s and NTT size-2^k/s" as the numbers to beat).  The
reference publishes no numbers (BASELINE.json "published": {}), so
vs_baseline is reported against a measured-here CPU reference estimate
recorded in BASELINE.md once available; 1.0 until then.

Also measures NTT size-2^k transforms/s as a secondary diagnostic printed to
stderr (the driver only parses the single stdout JSON line).
"""

import json
import os
import sys
import time

# bench runs on the real chip: do NOT force cpu here
import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from halo2_tpu.fields.bn254 import Fr
    from halo2_tpu.fields.limbs import ints_to_limbs_np
    from halo2_tpu.msm import msm
    from halo2_tpu.ntt import NTT
    from halo2_tpu.curves import g1, host
    import random

    rng = random.Random(1234)
    dev = jax.devices()[0]
    log(f"device: {dev}")

    # ---- NTT throughput (secondary, stderr) ------------------------------
    log_n = int(os.environ.get("BENCH_NTT_K", "18"))
    ntt = NTT(log_n)
    a = jnp.asarray(
        np.random.RandomState(0).randint(0, 1 << 16, size=(16, 1 << log_n))
        .astype(np.uint32))
    t0 = time.time()
    out = ntt.forward(a)
    jax.block_until_ready(out)
    log(f"NTT 2^{log_n} compile+first: {time.time()-t0:.2f}s")
    iters = 5
    t0 = time.time()
    for _ in range(iters):
        out = ntt.forward(out)
    jax.block_until_ready(out)
    ntt_rate = iters / (time.time() - t0)
    log(f"NTT 2^{log_n}: {ntt_rate:.2f} transforms/s")

    # ---- MSM throughput (primary) ----------------------------------------
    msm_k = int(os.environ.get("BENCH_MSM_K", "14"))
    n = 1 << msm_k
    # n distinct points: p, 2p, 3p... via device scalar_mul of ramp scalars
    base = host.random_point(rng)
    ramp = [i + 1 for i in range(n)]
    base_b = g1.encode_points([base])
    bx = jnp.broadcast_to(base_b[0], (16, n))
    by = jnp.broadcast_to(base_b[1], (16, n))
    t0 = time.time()
    pts_proj = g1.scalar_mul((bx, by), jnp.asarray(ints_to_limbs_np(ramp)))
    pts = g1.to_affine(pts_proj)
    jax.block_until_ready(pts)
    log(f"point-gen 2^{msm_k}: {time.time()-t0:.2f}s")

    scalars = jnp.asarray(
        np.random.RandomState(1).randint(0, 1 << 16, size=(16, n))
        .astype(np.uint32))  # random 256-bit montgomery-ish values

    t0 = time.time()
    out = msm(pts, scalars)
    jax.block_until_ready(out)
    log(f"MSM 2^{msm_k} compile+first: {time.time()-t0:.2f}s")
    iters = 3
    t0 = time.time()
    for _ in range(iters):
        out = msm(pts, scalars)
        jax.block_until_ready(out)
    msm_rate = n * iters / (time.time() - t0)
    log(f"MSM 2^{msm_k}: {msm_rate:.0f} points/s")

    print(json.dumps({
        "metric": f"msm_throughput_2^{msm_k}",
        "value": round(msm_rate, 1),
        "unit": "points/s",
        "vs_baseline": 1.0,
    }), flush=True)


if __name__ == "__main__":
    main()
