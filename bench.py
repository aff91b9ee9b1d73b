"""Benchmark entry point — run by the driver on real TPU hardware.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Primary metric: MSM throughput (points/s, full 254-bit scalars) at
BENCH_MSM_K (default 2^16) via the scatter-free sorted Pippenger path — the
reference's dominant commit-phase primitive (arithmetic.rs best_multiexp;
BASELINE.md lists "MSM points/s and NTT size-2^k/s" as the numbers to beat).
The reference publishes no numbers (BASELINE.json "published": {}), so
vs_baseline compares against the measured-here reference-class CPU estimate
recorded in BASELINE.md (1e6 points/s multicore Rust at 2^16-2^20); the
driver records absolute values either way.

Timing is host-synchronized (a device->host read after each iteration), not
async dispatch.  Secondary NTT numbers go to stderr.
"""

import json
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

# Reference-class multicore-CPU MSM rate (points/s) used for vs_baseline;
# see BASELINE.md ("to be measured" — Rust toolchain is absent in this
# image, so this is the literature-typical figure for blst-class CPU MSM).
CPU_BASELINE_MSM_PPS = 1.0e6


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync(x):
    _ = np.asarray(jax.tree_util.tree_leaves(x)[0])[..., :1]


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
    # Iterations are dependency-chained INSIDE one jit (lax.scan) so the
    # timing measures steady-state device throughput, not the per-dispatch
    # RPC latency of the axon tunnel (~30-50ms/call would otherwise
    # dominate).  The chain is a real data dependency: each transform's
    # input is the previous output.
    log_n = int(os.environ.get("BENCH_NTT_K", "18"))
    ntt = NTT(log_n)
    a = jnp.asarray(
        np.random.RandomState(0).randint(0, 1 << 16, size=(16, 1 << log_n))
        .astype(np.uint32))
    iters = 10

    @jax.jit
    def ntt_chain(x):
        def body(x, _):
            return ntt.forward_traced(x), None
        x, _ = jax.lax.scan(body, x, None, length=iters)
        return x

    t0 = time.time()
    out = ntt_chain(a)
    sync(out)
    log(f"NTT 2^{log_n} compile+first({iters}x): {time.time()-t0:.2f}s")
    t0 = time.time()
    out = ntt_chain(a)
    sync(out)
    total = time.time() - t0
    t0 = time.time()
    sync(out)
    rtt = time.time() - t0       # host-read round trip to subtract
    ntt_ms = (total - rtt) / iters * 1000
    log(f"NTT 2^{log_n}: {ntt_ms:.1f} ms/transform")

    # ---- MSM throughput (primary) ----------------------------------------
    msm_k = int(os.environ.get("BENCH_MSM_K", "16"))
    n = 1 << msm_k
    base = host.random_point(rng)
    base_b = g1.encode_points([base])
    bx = jnp.broadcast_to(base_b[0], (16, n))
    by = jnp.broadcast_to(base_b[1], (16, n))
    t0 = time.time()
    pts_proj = g1.scalar_mul((bx, by), jnp.asarray(
        ints_to_limbs_np([i + 1 for i in range(n)])))
    pts = g1.to_affine(pts_proj)
    sync(pts)
    log(f"point-gen 2^{msm_k}: {time.time()-t0:.2f}s")

    scalars = jnp.asarray(
        np.random.RandomState(1).randint(0, 1 << 16, size=(16, n))
        .astype(np.uint32))  # random 256-bit montgomery-form values

    msm_iters = int(os.environ.get("BENCH_MSM_ITERS", "3"))

    @jax.jit
    def msm_chain(px, py, s):
        def body(s, _):
            out = msm((px, py), s)
            # real data dependency: fold one limb of the result into the
            # next iteration's scalars (flips low bits — non-eliminable)
            s = s.at[:, :1].set(s[:, :1] ^ (out[2][:, None] & 1))
            return s, out
        s, outs = jax.lax.scan(body, s, None, length=msm_iters)
        return s, jax.tree_util.tree_map(lambda o: o[-1], outs)

    t0 = time.time()
    _, out = msm_chain(pts[0], pts[1], scalars)
    sync(out)
    log(f"MSM 2^{msm_k} compile+first({msm_iters}x): {time.time()-t0:.2f}s")
    t0 = time.time()
    _, out = msm_chain(pts[0], pts[1], scalars)
    sync(out)
    total = time.time() - t0
    t0 = time.time()
    sync(out)
    total -= time.time() - t0    # subtract the host-read round trip
    msm_rate = n * msm_iters / total
    log(f"MSM 2^{msm_k}: {msm_rate:.0f} points/s (full-width scalars)")

    print(json.dumps({
        "metric": f"msm_throughput_2^{msm_k}",
        "value": round(msm_rate, 1),
        "unit": "points/s",
        "vs_baseline": round(msm_rate / CPU_BASELINE_MSM_PPS, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
