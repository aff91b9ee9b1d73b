"""Benchmark entry point — run by the driver on real TPU hardware.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Primary metric: MSM throughput (points/s, full-width 254-bit scalars) at
BENCH_MSM_K (default 2^16) via the scatter-free sorted Pippenger path — the
reference's dominant commit-phase primitive (arithmetic.rs best_multiexp;
BASELINE.md lists "MSM points/s and NTT size-2^k/s" as the numbers to beat).
The reference publishes no numbers (BASELINE.json "published": {}), so
vs_baseline compares against the measured-here reference-class CPU estimate
recorded in BASELINE.md (1e6 points/s multicore Rust at 2^16-2^20); the
driver records absolute values either way.

Timing methodology (the axon TPU tunnel makes naive timing lie twice —
block_until_ready returns early, and device->host reads of large buffers
run at tunnel bandwidth): every measurement runs the op dependency-chained
inside ONE jit at two different chain lengths, reduces the output to a
scalar digest on device, and reports (t_long - t_short) / (iters_long -
iters_short) — dispatch latency and transfer cost cancel in the slope.
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
    _ = np.asarray(jax.tree_util.tree_leaves(x)[0])


def slope_time(make_chain, n_short: int, n_long: int, reps: int = 2):
    """make_chain(n) -> zero-arg callable returning a tiny device digest.
    Returns (seconds per iteration, compile_seconds)."""
    f_short = make_chain(n_short)
    f_long = make_chain(n_long)
    t0 = time.time()
    sync(f_short())
    sync(f_long())
    compile_s = time.time() - t0
    best_s = best_l = 1e18
    for _ in range(reps):
        t0 = time.time(); sync(f_short()); best_s = min(best_s, time.time() - t0)
        t0 = time.time(); sync(f_long()); best_l = min(best_l, time.time() - t0)
    return max(best_l - best_s, 1e-9) / (n_long - n_short), compile_s


def main():
    from halo2_tpu.fields.bn254 import Fr
    from halo2_tpu.fields.limbs import N_LIMBS, ints_to_limbs_np
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

    def ntt_chain(iters):
        @jax.jit
        def run(x):
            def body(x, _):
                return ntt.forward_traced(x), None
            x, _ = jax.lax.scan(body, x, None, length=iters)
            return jnp.sum(x, dtype=jnp.uint32).reshape(1)
        return lambda: run(a)

    ntt_s, comp = slope_time(ntt_chain, 2, 12)
    log(f"NTT 2^{log_n}: {ntt_s*1000:.2f} ms/transform (compile {comp:.0f}s)")

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
    px, py = jnp.asarray(np.asarray(pts[0])), jnp.asarray(np.asarray(pts[1]))

    # canonical full-width scalars (< p): random 253-bit values
    sc = np.random.RandomState(1).randint(
        0, 1 << 16, size=(16, n)).astype(np.uint32)
    sc[15] &= 0x1FFF
    scalars = jnp.asarray(sc)

    def msm_chain(iters):
        @jax.jit
        def run(px, py, s):
            def body(s, _):
                out = msm((px, py), s)
                # real data dependency: fold one limb of the result into the
                # next iteration's scalars (flips low bits — non-eliminable)
                s = s.at[0, :].set(s[0, :] ^ (out[2][0] & 1))
                return s, out
            s, outs = jax.lax.scan(body, s, None, length=iters)
            return jnp.sum(outs[0][-1], dtype=jnp.uint32).reshape(1)
        return lambda: run(px, py, scalars)

    msm_s, comp = slope_time(msm_chain, 1, 4)
    msm_rate = n / msm_s
    log(f"MSM 2^{msm_k}: {msm_s*1000:.1f} ms ({msm_rate:.0f} points/s, "
        f"full-width scalars; compile {comp:.0f}s)")

    print(json.dumps({
        "metric": f"msm_throughput_2^{msm_k}",
        "value": round(msm_rate, 1),
        "unit": "points/s",
        "vs_baseline": round(msm_rate / CPU_BASELINE_MSM_PPS, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
