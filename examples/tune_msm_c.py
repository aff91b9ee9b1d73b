"""Window-size (signed c) sweep for the sorted MSM on real TPU.

The Pippenger work trade-off (arithmetic.rs:20-108 uses c=ln(n)): larger c
means fewer windows (fewer scan adds, the S2 cost n*W) but more buckets
(2^(c-1)+1 per window — S3 boundary gathers + Abel folds scale with nb,
and the MXU histogram with G*(n_hi+n_lo)).  Round 3 fixed c=13 (20
windows) from a host-side op-count model; this sweep measures the real
device optimum at the bench sizes (2^16 primary, 2^20 bonus).

Usage: python examples/tune_msm_c.py [k] [c,c,...]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
import bench
from halo2_tpu.fields.limbs import N_LIMBS


def build_chain(k: int, c: int, pa_full):
    from halo2_tpu.msm.sorted import (window_totals, num_windows_for,
                                      _auto_group, _auto_block)
    from halo2_tpu.msm.msm import _combine_windows

    n = 1 << k
    px = jnp.asarray(pa_full[0][:, :n])
    py = jnp.asarray(pa_full[1][:, :n])
    sc = np.random.RandomState(1).randint(
        0, 1 << 16, size=(N_LIMBS, n)).astype(np.uint32)
    sc[15] &= 0x1FFF
    scalars = jnp.asarray(sc)
    group = _auto_group(n, num_windows_for(256, c))
    block = _auto_block(n)

    @functools.lru_cache(maxsize=None)
    def chain(iters):
        @jax.jit
        def run(px, py, s):
            def body(s, _):
                totals = window_totals(px, py, s, 256, group, block, c=c)
                out = _combine_windows(totals, c)
                s = s.at[0, :].set(s[0, :] ^ (out[2][0] & 1))
                return s, None
            s, _ = jax.lax.scan(body, s, None, length=iters)
            return jnp.sum(s, dtype=jnp.uint32).reshape(1)
        return lambda: run(px, py, scalars)
    return chain


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    cs = ([int(x) for x in sys.argv[2].split(",")]
          if len(sys.argv) > 2 else [13, 14, 15, 16])
    n = 1 << k
    t0 = time.time()
    pa = bench.host_point_array(n)
    print(f"point-gen 2^{k}: {time.time()-t0:.1f}s", flush=True)
    results = {}
    for c in cs:
        from halo2_tpu.msm.sorted import num_windows_for, _auto_group
        W = num_windows_for(256, c)
        G = _auto_group(n, W)
        t0 = time.time()
        try:
            s_per, comp = bench.slope_time(build_chain(k, c, pa), 0, 2)
        except Exception as e:
            print(f"c={c}: FAILED {e!r}", flush=True)
            continue
        rate = n / s_per
        results[c] = rate
        print(f"c={c} (W={W}, group={G}): {s_per*1000:.2f} ms "
              f"= {rate/1e6:.3f} M pts/s  (compile {comp:.0f}s, "
              f"total {time.time()-t0:.0f}s)", flush=True)
    if results:
        best = max(results, key=results.get)
        print(f"BEST @2^{k}: c={best} at {results[best]/1e6:.3f} M pts/s",
              flush=True)


if __name__ == "__main__":
    main()
