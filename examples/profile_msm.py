"""Stage-level MSM profile on the real TPU (slope-timed).

Times cumulative prefixes of the sorted-MSM pipeline (msm/sorted.py) so the
per-stage cost falls out as differences:

  S1  digits + argsort + index permute + packed point gather
  S2  + prefix scan (the n*W mixed adds — the Pippenger work term)
  S3  + boundary searchsorted/gather + exclusive scans + Abel fold
      (= window_totals complete)
  S4  + final Horner window combine (full msm)

Usage: python examples/profile_msm.py  (env K sets the size, default 16)
Writes one line per stage to stderr and a summary table to stdout.
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

from halo2_tpu.fields.bn254 import Fr
from halo2_tpu.fields.limbs import N_LIMBS
from halo2_tpu.msm import sorted as ms
from halo2_tpu.curves import g1


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync(x):
    _ = np.asarray(jax.tree_util.tree_leaves(x)[0])


def slope(make, n_short=0, n_long=2, reps=3):
    fs, fl = make(n_short), make(n_long)
    t0 = time.time(); sync(fs()); sync(fl()); comp = time.time() - t0
    bs = bl = 1e18
    for _ in range(reps):
        t0 = time.time(); sync(fs()); bs = min(bs, time.time() - t0)
        t0 = time.time(); sync(fl()); bl = min(bl, time.time() - t0)
    return max(bl - bs, 1e-9) / (n_long - n_short), comp


def main():
    k = int(os.environ.get("K", "16"))
    n = 1 << k
    c = ms.SIGNED_C_BITS
    W0 = ms.num_windows_for(256, c)
    group = ms._auto_group(n, W0)
    block = ms._auto_block(n)
    nb = (1 << (c - 1)) + 1
    w_pad = (-W0) % group
    W = W0 + w_pad
    n_groups = W // group
    log(f"n=2^{k} c={c} W={W0}(+{w_pad}) group={group} block={block}")

    # host-chain points (see bench.py), tiled
    from bench import host_point_array
    pa = host_point_array(n)
    px, py = jnp.asarray(pa[0]), jnp.asarray(pa[1])
    sc = np.random.RandomState(1).randint(0, 1 << 16, size=(16, n)).astype(np.uint32)
    sc[15] &= 0x1FFF
    scalars = jnp.asarray(sc)

    def stage_fn(stage):
        """Returns f(px, py, scalars) -> digest for the pipeline prefix —
        calls the REAL window_totals with its _profile_stage hook (no
        duplicated pipeline; what's measured is what runs)."""
        def run(px, py, scalars_mont):
            out = ms.window_totals(px, py, scalars_mont, 256, group, block,
                                   _profile_stage=stage if stage <= 2 else None)
            if stage <= 2:
                return out.reshape(-1)[:1]
            if stage == 3:
                return out[0][:1, 0]
            from halo2_tpu.msm.msm import _combine_windows
            res = _combine_windows(out, c)
            return res[0][:1]
        return run

    results = {}
    for stage in (1, 2, 3, 4):
        fn = stage_fn(stage)

        def make(iters, fn=fn):
            @jax.jit
            def r(px, py, s):
                def body(s, _):
                    out = fn(px, py, s)
                    s = s.at[0, 0].set(s[0, 0] ^ (out[0].astype(jnp.uint32) & 1))
                    return s, None
                s, _ = jax.lax.scan(body, s, None, length=iters)
                return jnp.sum(s, dtype=jnp.uint32).reshape(1)
            return lambda: r(px, py, scalars)

        t, comp = slope(make)
        results[stage] = t
        log(f"stage {stage}: {t*1000:8.2f} ms cumulative (compile {comp:.0f}s)")

    print(f"n=2^{k}: S1 sort+gather {results[1]*1e3:.2f} ms | "
          f"S2 +scan {(results[2]-results[1])*1e3:.2f} ms | "
          f"S3 +reduce {(results[3]-results[2])*1e3:.2f} ms | "
          f"S4 +combine {(results[4]-results[3])*1e3:.2f} ms | "
          f"total {results[4]*1e3:.2f} ms")


if __name__ == "__main__":
    main()
