"""MSM phase profiling with dependency-chained on-device iteration.

The axon tunnel makes per-iteration host syncs worthless (~30ms RTT and
unreliable block_until_ready), so every timing here runs K iterations
chained inside ONE jit (each iteration's input depends on the previous
output via a cheap xor-fold), with a single tiny host read at the end.

Phases are timed as cumulative prefixes of the msm_sorted pipeline; the
difference between consecutive prefixes is the phase cost.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from halo2_tpu.curves import g1
from halo2_tpu.fields.bn254 import Fq, Fr
from halo2_tpu.fields.limbs import N_LIMBS
from halo2_tpu.msm import sorted as ms

K_CHAIN = int(os.environ.get("K_CHAIN", "6"))
K = int(os.environ.get("K", "16"))
N = 1 << K
GROUP = 8
BLOCK = ms._auto_block(N)
W = 32
NG = (W + GROUP - 1) // GROUP


def read_rtt(arr):
    t0 = time.perf_counter()
    _ = np.asarray(arr[:1, :1])
    return time.perf_counter() - t0


def chain_time(name, fn, x0, k=K_CHAIN):
    """fn: (16,n) uint32 -> (16,n) uint32 (dependency-preserving)."""
    @jax.jit
    def chained(x):
        def body(x, _):
            return fn(x), None
        x, _ = jax.lax.scan(body, x, None, length=k)
        return x

    out = chained(x0)
    _ = np.asarray(out[:1, :1])           # warm + sync
    t0 = time.perf_counter()
    out = chained(x0)
    _ = np.asarray(out[:1, :1])
    total = time.perf_counter() - t0
    rtt = read_rtt(out)
    dt = (total - rtt) / k
    print(f"{name:34s} {dt * 1e3:9.2f} ms", flush=True)
    return dt


def fold_dep(s, *arrs):
    """Real (non-eliminable) dependency: flip the low bit of limb 0 by the
    xor of one element from each array.  A `v*0` trick gets constant-folded
    and the whole body dead-code-eliminated — measured that the hard way."""
    v = jnp.uint32(0)
    for a in arrs:
        v = v ^ a.reshape(-1)[0].astype(jnp.uint32)
    return s.at[0].set(s[0] ^ (v & jnp.uint32(1)))


def main():
    print(f"devices: {jax.devices()}  n=2^{K} group={GROUP} block={BLOCK}",
          flush=True)
    rng = np.random.default_rng(7)
    sc = [int.from_bytes(rng.bytes(31), "little") for _ in range(N)]
    scal_m = jnp.asarray(Fr.encode(sc))

    scal_std = Fr.raw.from_mont(scal_m)
    gx, gy = g1.generator()
    gxb = jnp.broadcast_to(gx[:, None], (N_LIMBS, N))
    gyb = jnp.broadcast_to(gy[:, None], (N_LIMBS, N))
    proj = jax.jit(g1.scalar_mul)((gxb, gyb), scal_std)
    px, py = jax.jit(g1.to_affine)(proj)
    px.block_until_ready()
    print("points ready", flush=True)

    def prefix_digits(s):
        scal = Fr.raw.from_mont(s)
        d = ms._digits(scal, W).reshape(NG, GROUP, N)
        return fold_dep(s, d)

    def prefix_sort(s):
        scal = Fr.raw.from_mont(s)
        dg = ms._digits(scal, W).reshape(NG, GROUP, N)

        def one(_, d):
            order = jnp.argsort(d, axis=1, stable=True)
            d_sorted = jnp.take_along_axis(d, order, axis=1)
            return None, (order[0, 0], d_sorted[0, 0])

        _, (o, ds) = jax.lax.scan(one, None, dg)
        return fold_dep(s, o, ds)

    def prefix_gather(s):
        scal = Fr.raw.from_mont(s)
        dg = ms._digits(scal, W).reshape(NG, GROUP, N)

        def one(_, d):
            order = jnp.argsort(d, axis=1, stable=True)
            d_sorted = jnp.take_along_axis(d, order, axis=1)
            px_s = jnp.take(px, order.reshape(-1), axis=1).reshape(
                N_LIMBS, GROUP, N)
            py_s = jnp.take(py, order.reshape(-1), axis=1).reshape(
                N_LIMBS, GROUP, N)
            return None, (px_s[0, 0, 0], py_s[0, 0, 0], d_sorted[0, 0])

        _, outs = jax.lax.scan(one, None, dg)
        return fold_dep(s, *outs)

    def prefix_scan(s):
        scal = Fr.raw.from_mont(s)
        dg = ms._digits(scal, W).reshape(NG, GROUP, N)

        def one(_, d):
            order = jnp.argsort(d, axis=1, stable=True)
            d_sorted = jnp.take_along_axis(d, order, axis=1)
            px_s = jnp.take(px, order.reshape(-1), axis=1).reshape(
                N_LIMBS, GROUP, N)
            py_s = jnp.take(py, order.reshape(-1), axis=1).reshape(
                N_LIMBS, GROUP, N)
            intra, excl = ms._prefix_scan_group(px_s, py_s, BLOCK)
            return None, (intra[0][0, 0, 0, 0], excl[0][0, 0, 0],
                          d_sorted[0, 0])

        _, outs = jax.lax.scan(one, None, dg)
        return fold_dep(s, *outs)

    def full(s):
        return fold_dep(s, *_full_body(s))

    def _full_body(s):
        scal = Fr.raw.from_mont(s)
        digits = ms._digits(scal, W)
        dg = digits.reshape(NG, GROUP, N)

        def one_group(_, d):
            order = jnp.argsort(d, axis=1, stable=True)
            d_sorted = jnp.take_along_axis(d, order, axis=1)
            px_s = jnp.take(px, order.reshape(-1), axis=1).reshape(
                N_LIMBS, GROUP, N)
            py_s = jnp.take(py, order.reshape(-1), axis=1).reshape(
                N_LIMBS, GROUP, N)
            intra, excl = ms._prefix_scan_group(px_s, py_s, BLOCK)
            bvals = jnp.arange(ms.NB, dtype=jnp.int32)
            ends = jax.vmap(
                lambda row: jnp.searchsorted(row, bvals, side="right"))(
                d_sorted).astype(jnp.int32) - 1
            e_pts = ms._gather_boundary_prefix(intra, excl, ends, BLOCK, N)
            return None, ms._abel_window_totals(e_pts, ms.NB)

        _, totals = jax.lax.scan(one_group, None, dg)
        tx = totals[0].transpose(1, 0, 2).reshape(N_LIMBS, W)
        ty = totals[1].transpose(1, 0, 2).reshape(N_LIMBS, W)
        tz = totals[2].transpose(1, 0, 2).reshape(N_LIMBS, W)
        from halo2_tpu.msm.msm import _combine_windows
        return _combine_windows((tx, ty, tz))

    def full_signed(s):
        totals = ms.window_totals(px, py, s, 256,
                                  ms._auto_group(N, ms.num_windows_for(256)),
                                  BLOCK)
        from halo2_tpu.msm.msm import _combine_windows
        return fold_dep(s, *_combine_windows(totals, ms.SIGNED_C_BITS))

    t_dig = chain_time("digits", prefix_digits, scal_m)
    t_sort = chain_time("+argsort", prefix_sort, scal_m)
    t_gath = chain_time("+point gather", prefix_gather, scal_m)
    t_scan = chain_time("+prefix scan+blockcomb", prefix_scan, scal_m)
    t_full = chain_time("FULL (+bounds+totals+combine)", full, scal_m)
    t_signed = chain_time("FULL signed c=13", full_signed, scal_m)

    print(f"\nphase deltas:", flush=True)
    print(f"  argsort          {(t_sort - t_dig) * 1e3:8.2f} ms")
    print(f"  point gather     {(t_gath - t_sort) * 1e3:8.2f} ms")
    print(f"  scan+blockcomb   {(t_scan - t_gath) * 1e3:8.2f} ms")
    print(f"  tail             {(t_full - t_scan) * 1e3:8.2f} ms")
    print(f"\nFULL unsigned c=8 : {t_full*1e3:.1f} ms -> "
          f"{N/t_full/1e6:.3f} M points/s", flush=True)
    print(f"FULL signed   c=13: {t_signed*1e3:.1f} ms -> "
          f"{N/t_signed/1e6:.3f} M points/s", flush=True)


if __name__ == "__main__":
    main()
