"""Micro-profile of MSM S1/S3 internals on the TPU (slope-timed).

  A  argsort only (20 windows x 2^16 int32)
  B  A + take_along_axis d/s + index permute + 84MB packed point gather
  C  searchsorted(method=sort) on a sorted (G, n) array
  D  exclusive block scan (_exclusive_scan_points) on (16, G, B) totals
  E  Abel interior sum (_sum_points_lastaxis) on (16, G, 4096)
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

from halo2_tpu.fields.limbs import N_LIMBS
from halo2_tpu.msm import sorted as ms


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


def chain(fn, x0):
    """Iterate fn: digest -> digest with data dependency."""
    def make(iters):
        @jax.jit
        def r(x):
            def body(x, _):
                return fn(x), None
            x, _ = jax.lax.scan(body, x, None, length=iters)
            return x.reshape(-1)[:1]
        return lambda: r(x0)
    return make


def main():
    k = int(os.environ.get("K", "16"))
    n = 1 << k
    G, B = 20, 2048
    S = n // B
    nb = (1 << 12) + 1
    rs = np.random.RandomState(0)
    d = jnp.asarray(rs.randint(0, 1 << 12, size=(G, n)).astype(np.int32))
    packed = jnp.asarray(rs.randint(0, 2**31, size=(16, n)).astype(np.uint32))

    # A: argsort
    def f_a(x):
        order = jnp.argsort(d + x.astype(jnp.int32), axis=1, stable=True)
        return jnp.sum(order, dtype=jnp.uint32)[None].astype(jnp.uint32)
    t, c = slope(chain(f_a, jnp.zeros(1, jnp.uint32)))
    log(f"A argsort         : {t*1e3:7.2f} ms (compile {c:.0f}s)")

    # B: full S1
    def f_b(x):
        dd = d + x.astype(jnp.int32)
        order = jnp.argsort(dd, axis=1, stable=True)
        d_sorted = jnp.take_along_axis(dd, order, axis=1)
        idx_scan = order.reshape(G, B, S).transpose(2, 0, 1)
        pk = jnp.take(packed, idx_scan.reshape(-1), axis=1).reshape(
            N_LIMBS, S, G, B)
        return (jnp.sum(pk, dtype=jnp.uint32)
                + jnp.sum(d_sorted, dtype=jnp.int32).astype(jnp.uint32)
                )[None]
    t, c = slope(chain(f_b, jnp.zeros(1, jnp.uint32)))
    log(f"B argsort+gather  : {t*1e3:7.2f} ms (compile {c:.0f}s)")

    # C: searchsorted on sorted rows
    d_sorted = jnp.sort(d, axis=1)
    bvals = jnp.arange(nb, dtype=jnp.int32)
    def f_c(x):
        rows = d_sorted + x.astype(jnp.int32)
        ends = jax.vmap(lambda row: jnp.searchsorted(
            row, bvals, side="right", method="sort"))(rows)
        return jnp.sum(ends, dtype=jnp.int32)[None].astype(jnp.uint32)
    t, c = slope(chain(f_c, jnp.zeros(1, jnp.uint32)))
    log(f"C searchsorted    : {t*1e3:7.2f} ms (compile {c:.0f}s)")

    # D: exclusive block scan on (16, G, B)
    tot = tuple(jnp.asarray(rs.randint(0, 1 << 16, size=(16, G, B))
                            .astype(np.uint32)) for _ in range(3))
    def f_d(x):
        tt = tuple(t_.at[0, 0, 0].set(t_[0, 0, 0] ^ x[0]) for t_ in tot)
        out = ms._exclusive_scan_points(tt)
        return jnp.sum(out[0], dtype=jnp.uint32)[None]
    t, c = slope(chain(f_d, jnp.zeros(1, jnp.uint32)))
    log(f"D excl block scan : {t*1e3:7.2f} ms (compile {c:.0f}s)")

    # E: Abel interior sum over (16, G, 4096)
    e_pts = tuple(jnp.asarray(rs.randint(0, 1 << 16, size=(16, G, 4096))
                              .astype(np.uint32)) for _ in range(3))
    def f_e(x):
        tt = tuple(t_.at[0, 0, 0].set(t_[0, 0, 0] ^ x[0]) for t_ in e_pts)
        out = ms._sum_points_lastaxis(tt)
        return jnp.sum(out[0], dtype=jnp.uint32)[None]
    t, c = slope(chain(f_e, jnp.zeros(1, jnp.uint32)))
    log(f"E abel interior   : {t*1e3:7.2f} ms (compile {c:.0f}s)")


if __name__ == "__main__":
    main()
