"""Benchmark entry point — run by the driver on real TPU hardware.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Primary metric: MSM throughput (points/s, full-width 254-bit scalars) via
the scatter-free sorted Pippenger path — the reference's dominant
commit-phase primitive (arithmetic.rs best_multiexp; BASELINE.md lists
"MSM points/s and NTT size-2^k/s" as the numbers to beat).  The reference
publishes no numbers (BASELINE.json "published": {}) and cargo is absent
from this image, so vs_baseline divides by an ESTIMATE: the
literature-typical multicore-CPU MSM rate (1e6 points/s, blst/halo2-class)
recorded in BASELINE.md — treat every vs_baseline below as
"vs estimated CPU baseline", not a measured reference run.

Delivery design (rounds 2 and 3 both failed to record a number: r2 the
process was killed before printing, r3 the watchdog fired at 240 s while
the single 2^16 program was still compiling — the committed compile cache
NEVER hits through the axon backend, its keys are session-unstable, so
every driver run pays full compile):

  * SIZE LADDER: measure 2^12 first (same program shape, ~55 s compile —
    the insurance rung: a real number exists ~70 s in), then the 2^16
    primary, then 2^20 if budget remains; the best rung reached is what
    gets emitted.
  * the watchdog emits the BEST RUNG OBTAINED SO FAR (tagged partial)
    instead of 0.0, and only exits 0 after printing;
  * test points are generated on the HOST (a 1024-point addition chain,
    tiled) — zero device compiles before the one being measured;
  * no reliance on any persistent cache (it is still enabled for
    same-process reuse, but the ladder assumes cold compiles throughout).

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
import threading
import time

import jax


def _setup_cache():
    # same-process reuse only; across processes the axon backend's cache
    # keys are unstable (verified round 4: a fresh run recomputes different
    # keys and recompiles ~60 s even with a fully primed directory)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache_bench"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


import jax.numpy as jnp
import numpy as np

# ESTIMATED reference-class multicore-CPU MSM rate (points/s) used for
# vs_baseline; see BASELINE.md — the Rust toolchain is absent in this
# image, so this is the literature-typical figure for blst-class CPU MSM,
# not a measured reference run.
CPU_BASELINE_MSM_PPS = 1.0e6

T_START = time.time()
_EMIT_LOCK = threading.Lock()
_EMITTED = False

# best result so far: (metric, value, unit) — the watchdog emits this
_BEST = None


def log(*a):
    print(*a, f"[t+{time.time()-T_START:.0f}s]", file=sys.stderr, flush=True)


def emit(metric, value, unit):
    """Print the one JSON line exactly once (main path or watchdog)."""
    global _EMITTED
    with _EMIT_LOCK:
        if _EMITTED:
            return
        _EMITTED = True
        print(json.dumps({
            "metric": metric,
            "value": round(float(value), 1),
            "unit": unit,
            "vs_baseline": round(float(value) / CPU_BASELINE_MSM_PPS, 3),
        }), flush=True)


def stash(metric, value, unit):
    global _BEST
    with _EMIT_LOCK:
        if _BEST is None or value > 0:
            _BEST = (metric, value, unit)


def emit_best(partial: bool):
    with _EMIT_LOCK:
        best = _BEST
    if best is None:
        emit("msm_throughput", 0.0, "points/s (no rung completed)")
    else:
        metric, value, unit = best
        emit(metric, value, unit + (" (partial ladder)" if partial else ""))


def _watchdog(deadline_s):
    time.sleep(deadline_s)
    log(f"watchdog: {deadline_s:.0f}s elapsed — emitting best rung and exiting")
    emit_best(partial=True)
    os._exit(0)


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


def host_point_array(n: int, distinct: int = 1024):
    """(2, 16, n) Montgomery affine limbs: a `distinct`-point host addition
    chain tiled to n points.  Point *values* don't affect TPU timing (the
    limb arithmetic is constant-time); the scalars carry the randomness."""
    from halo2_tpu.curves import host
    from halo2_tpu.fields.bn254 import Fq
    pts, p = [], host.G1_GEN
    step = host.add(host.G1_GEN, host.G1_GEN)  # 2G
    for _ in range(min(distinct, n)):
        pts.append(p)
        p = host.add(p, step)
    # pure-numpy encode — jnp.asarray here would block on the axon tunnel
    # before the measurement even starts
    arr = np.stack([Fq.encode([q[0] for q in pts]),
                    Fq.encode([q[1] for q in pts])])   # (2, 16, distinct)
    reps = -(-n // arr.shape[2])
    return np.tile(arr, (1, 1, reps))[:, :, :n]


def build_msm_chain(msm_k: int, pa_full):
    """Rung builder: returns make_chain(iters) for slope_time."""
    from halo2_tpu.msm import msm
    from halo2_tpu.fields.limbs import N_LIMBS

    n = 1 << msm_k
    px = jnp.asarray(pa_full[0][:, :n])
    py = jnp.asarray(pa_full[1][:, :n])
    sc = np.random.RandomState(1).randint(
        0, 1 << 16, size=(N_LIMBS, n)).astype(np.uint32)
    sc[15] &= 0x1FFF
    scalars = jnp.asarray(sc)

    memo = {}

    def msm_chain(iters):
        if iters in memo:
            return memo[iters]

        @jax.jit
        def run(px, py, s):
            def body(s, _):
                out = msm((px, py), s)
                # real data dependency: fold one limb of the result into the
                # next iteration's scalars (flips low bits — non-eliminable)
                s = s.at[0, :].set(s[0, :] ^ (out[2][0] & 1))
                return s, None
            s, _ = jax.lax.scan(body, s, None, length=iters)
            return jnp.sum(s, dtype=jnp.uint32).reshape(1)
        # AOT handles so a background thread can compile while another rung
        # measures: lower() is cheap, compile() is the expensive part
        lowered = run.lower(px, py, scalars)
        compiled = [None]

        def ensure():
            if compiled[0] is None:
                compiled[0] = lowered.compile()
            return compiled[0]

        def call():
            return ensure()(px, py, scalars)
        call.precompile = ensure
        memo[iters] = call
        return call
    return msm_chain


def measure_msm(msm_k: int, make_chain):
    """One ladder rung: slope-timed full-width MSM at 2^msm_k points.
    make_chain from build_msm_chain (possibly precompiled by a thread)."""
    n = 1 << msm_k
    # chain lengths 0 and 2: the zero-length program is just the scalar
    # digest (compiles in ms), so each rung compiles exactly ONE big program
    msm_s, comp = slope_time(make_chain, 0, 2)
    rate = n / msm_s
    log(f"MSM 2^{msm_k}: {msm_s*1000:.1f} ms ({rate:.0f} points/s, "
        f"full-width scalars; compile {comp:.0f}s)")
    return rate


def main():
    _setup_cache()
    # nothing else is resident during the bench, so let the 2^20 rung run
    # all windows in ONE scan group (the 3G default splits it and costs
    # ~15% throughput; 7.5G is the k=22-proof-tested value)
    os.environ.setdefault("HALO2_TPU_MSM_MEM", str(8053063680))
    deadline = float(os.environ.get("BENCH_WATCHDOG_S", "240"))
    threading.Thread(target=_watchdog, args=(deadline,), daemon=True).start()

    dev = jax.devices()[0]
    log(f"device: {dev}")

    primary_k = int(os.environ.get("BENCH_MSM_K", "16"))
    insurance_k = min(12, primary_k)
    bonus_k = int(os.environ.get("BENCH_MSM_BONUS_K", "20"))

    t0 = time.time()
    pa = host_point_array(1 << primary_k)
    log(f"point-gen 2^{primary_k} (host chain): {time.time()-t0:.2f}s")

    # overlap the compiles: the primary rung's program compiles on a
    # background thread while the insurance rung compiles+measures in the
    # foreground — if the compile service parallelizes, total time is
    # max(insurance, primary) instead of the sum
    chain_primary = build_msm_chain(primary_k, pa)
    f_primary = chain_primary(2)
    threading.Thread(target=f_primary.precompile, daemon=True).start()

    if insurance_k < primary_k:
        chain_ins = build_msm_chain(insurance_k, pa)
        rate = measure_msm(insurance_k, chain_ins)
        stash(f"msm_throughput_2^{insurance_k}", rate, "points/s")

    rate = measure_msm(primary_k, chain_primary)
    stash(f"msm_throughput_2^{primary_k}", rate, "points/s")

    # bonus rung at 2^20 only when enough budget remains for its compile
    # AND its slower iterations (~0.4 s x 6 runs), keeping 30 s of margin
    budget_left = deadline - (time.time() - T_START)
    if bonus_k > primary_k and budget_left > 110 \
            and not os.environ.get("BENCH_SKIP_BONUS"):
        try:
            pa20 = host_point_array(1 << bonus_k)
            rate20 = measure_msm(bonus_k, build_msm_chain(bonus_k, pa20))
            # report the primary 2^16 number unless 2^20 beats it
            stash_metric = f"msm_throughput_2^{bonus_k}"
            with _EMIT_LOCK:
                cur = _BEST[1] if _BEST else 0.0
            if rate20 > cur:
                stash(stash_metric, rate20, "points/s")
        except Exception as e:  # bonus must never cost the primary result
            log(f"bonus rung failed: {e!r}")

    emit_best(partial=False)

    # ---- NTT throughput (secondary, stderr only) -------------------------
    budget_left = deadline - (time.time() - T_START)
    if budget_left < 60 or os.environ.get("BENCH_SKIP_NTT"):
        log(f"skipping NTT secondary (budget left {budget_left:.0f}s)")
        return
    from halo2_tpu.ntt import NTT
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

    ntt_s, comp = slope_time(ntt_chain, 2, 10)
    log(f"NTT 2^{log_n}: {ntt_s*1000:.2f} ms/transform (compile {comp:.0f}s)")


if __name__ == "__main__":
    main()
    os._exit(0)
