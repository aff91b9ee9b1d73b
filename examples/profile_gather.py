"""Gather strategy shootout on the TPU: is the MSM point gather
index-bound or bandwidth-bound?

  a  (n,16) u32 rows, 1.3M indices (the MSM gather)
  b  (n, 8) u32 rows, 1.3M indices (half payload: bandwidth-bound -> ~2x)
  c  (n,16) u32 rows, 0.65M indices (half indices: index-bound -> ~2x)
  d  (n,32) u32 rows, 0.65M indices (same bytes as a, half indices)
  e  (16,n) limb-major take axis=1, 1.3M indices (old layout)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync(x):
    _ = np.asarray(jax.tree_util.tree_leaves(x)[0])


def slope(make, n_short=0, n_long=4, reps=3):
    fs, fl = make(n_short), make(n_long)
    t0 = time.time(); sync(fs()); sync(fl()); comp = time.time() - t0
    bs = bl = 1e18
    for _ in range(reps):
        t0 = time.time(); sync(fs()); bs = min(bs, time.time() - t0)
        t0 = time.time(); sync(fl()); bl = min(bl, time.time() - t0)
    return max(bl - bs, 1e-9) / (n_long - n_short), comp


def bench_take(name, src, idx, axis):
    def make(iters):
        @jax.jit
        def r(src, idx):
            def body(idx, _):
                out = jnp.take(src, idx, axis=axis)
                d = jnp.sum(out, dtype=jnp.uint32)
                idx = idx.at[0].set(idx[0] ^ (d & 1).astype(idx.dtype))
                return idx, None
            idx, _ = jax.lax.scan(body, idx, None, length=iters)
            return jnp.sum(idx)[None]
        return lambda: r(src, idx)
    t, c = slope(make)
    gb = (src.shape[1 - axis] if src.ndim == 2 else 1)
    bytes_moved = idx.size * (src.shape[1] if axis == 0 else src.shape[0]) * 4
    log(f"{name}: {t*1e3:7.2f} ms  ({bytes_moved/t/2**30:.1f} GiB/s, "
        f"{idx.size/t/1e6:.0f} Midx/s; compile {c:.0f}s)")


def main():
    n = 1 << 16
    m = 20 * n
    rs = np.random.RandomState(0)
    rows16 = jnp.asarray(rs.randint(0, 2**31, size=(n, 16)).astype(np.uint32))
    rows8 = jnp.asarray(rs.randint(0, 2**31, size=(n, 8)).astype(np.uint32))
    rows32 = jnp.asarray(rs.randint(0, 2**31, size=(n, 32)).astype(np.uint32))
    limb = jnp.asarray(rs.randint(0, 2**31, size=(16, n)).astype(np.uint32))
    idx_full = jnp.asarray(rs.randint(0, n, size=m).astype(np.int32))
    idx_half = idx_full[: m // 2]

    bench_take("a rows16 1.3M", rows16, idx_full, 0)
    bench_take("b rows8  1.3M", rows8, idx_full, 0)
    bench_take("c rows16 0.65M", rows16, idx_half, 0)
    bench_take("d rows32 0.65M", rows32, idx_half, 0)
    bench_take("e limb-major 1.3M", limb, idx_full, 1)


def ablate_s1():
    """Ablation of the real S1 composition at n=2^16, G=20, B=2048."""
    n = 1 << 16
    G, B = 20, 2048
    S = n // B
    rs = np.random.RandomState(0)
    d = jnp.asarray(rs.randint(0, 1 << 12, size=(G, n)).astype(np.int32))
    s = jnp.asarray(rs.randint(0, 2, size=(G, n)).astype(bool))
    rows = jnp.asarray(rs.randint(0, 2**31, size=(n, 16)).astype(np.uint32))

    def digest(*xs):
        tot = None
        for x in xs:
            v = jnp.sum(x, dtype=jnp.uint32) if x.dtype != bool else \
                jnp.sum(x.astype(jnp.int32), dtype=jnp.int32).astype(jnp.uint32)
            tot = v if tot is None else tot + v
        return tot[None]

    def case(name, fn):
        def make(iters):
            @jax.jit
            def r(d):
                def body(d, _):
                    out = fn(d)
                    d = d.at[0, 0].set(d[0, 0] ^ (out[0] & 1).astype(d.dtype))
                    return d, None
                d, _ = jax.lax.scan(body, d, None, length=iters)
                return jnp.sum(d)[None]
            return lambda: r(d)
        t, c = slope(make)
        log(f"{name}: {t*1e3:7.2f} ms (compile {c:.0f}s)")

    case("f0 argsort only      ", lambda d: digest(
        jnp.argsort(d, axis=1, stable=True)))
    case("f1 +s take_along     ", lambda d: (lambda o: digest(
        o, jnp.take_along_axis(s, o, axis=1)))(jnp.argsort(d, axis=1, stable=True)))
    case("f2 +rows take flat   ", lambda d: (lambda o: digest(
        jnp.take_along_axis(s, o, axis=1),
        jnp.take(rows, o.reshape(-1), axis=0)))(jnp.argsort(d, axis=1, stable=True)))
    case("f3 full S1 w/ layout ", lambda d: (lambda o: (lambda idx: digest(
        jnp.take_along_axis(s, o, axis=1).reshape(G, B, S).transpose(2, 0, 1),
        jnp.take(rows, idx.reshape(-1), axis=0).reshape(S, G, B, 16)))(
        o.reshape(G, B, S).transpose(2, 0, 1)))(
        jnp.argsort(d, axis=1, stable=True)))


if __name__ == "__main__":
    if os.environ.get("ABLATE_S1"):
        ablate_s1()
    else:
        main()
