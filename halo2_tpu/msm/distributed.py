"""Multi-chip sharded MSM over a jax.sharding.Mesh.

The reference scales MSM by splitting the point range across GPUs with a
device pool and summing per-GPU results on the host
(`gpu_multiexp`, /root/reference/halo2_proofs/src/arithmetic.rs:369-440;
SURVEY.md §2.20).  The TPU-native design has no device pool: points and
scalars are sharded over a mesh axis, every chip computes Pippenger window
totals over its own shard (msm/sorted.py::window_totals — window totals are
additive over point shards), and the per-window partial totals are reduced
with an `all_gather` + log-tree of point additions over ICI.  The final
Horner window combine (c doublings + add per window) runs replicated on
every chip — it is O(windows) tiny work.

Communication: one all_gather of 3 * 16 * W u32 lanes (~6 KB at W=32) per
MSM — negligible against ICI bandwidth; the point/scalar shards never move.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as Pspec

try:
    from jax import shard_map
except ImportError:
    from jax.experimental.shard_map import shard_map

from halo2_tpu.fields.limbs import N_LIMBS
from halo2_tpu.msm import sorted as _sorted
from halo2_tpu.msm.msm import _combine_windows, _tree_sum_last_axis


@functools.lru_cache(maxsize=None)
def _msm_sharded_jit(mesh: Mesh, axes: tuple, n: int, max_bits: int,
                     group: int, block: int):
    def local(px, py, s):
        # px/py/s: (16, n/D) — this chip's shard
        totals = _sorted.window_totals(px, py, s, max_bits, group, block)
        # (16, W) x3 partial totals -> reduce axis by axis, INNERMOST
        # (fastest-varying, ICI-adjacent) first: the cross-host/DCN hop only
        # ever carries the already-reduced W window points (~4 KB)
        for ax in reversed(axes):
            gathered = jax.lax.all_gather(totals, ax)   # 3 x (Dax, 16, W)
            pts = tuple(g.transpose(1, 2, 0) for g in gathered)  # (16, W, Dax)
            totals = _tree_sum_last_axis(pts)           # (16, W) x3
        return _combine_windows(totals, _sorted.SIGNED_C_BITS)

    spec = Pspec(None, axes if len(axes) > 1 else axes[0])
    body = shard_map(local, mesh=mesh,
                     in_specs=(spec, spec, spec),
                     out_specs=Pspec(None),
                     check_vma=False)
    return jax.jit(body)


def msm_sharded(points, scalars_mont, mesh: Mesh, axis="x",
                max_bits: int = 256):
    """MSM with points/scalars sharded over one or more mesh axes.

    points: (x, y) each (16, n) Montgomery affine (no identities);
    scalars_mont: (16, n) Montgomery Fr.  `axis` is a mesh-axis name or a
    tuple of names, OUTERMOST first — e.g. ("dcn", "ici") for a 2-D
    multi-host mesh: points shard over the full device set, per-chip window
    totals reduce over the inner (ICI) axis first, and only the W reduced
    window points cross the outer (DCN) axis.  n must be divisible by the
    total device count; each axis size must be a power of two (tree
    reduction).  Returns replicated projective limbs."""
    px, py = points
    n = px.shape[1]
    axes = (axis,) if isinstance(axis, str) else tuple(axis)
    D = 1
    for ax in axes:
        Dax = mesh.shape[ax]
        assert Dax & (Dax - 1) == 0,             f"mesh axis {ax!r} size must be a power of two"
        D *= Dax
    assert n % D == 0, "points must divide evenly across devices"
    n_local = n // D
    num_windows = _sorted.num_windows_for(max_bits)
    group = _sorted._auto_group(n_local, num_windows)
    block = _sorted._auto_block(n_local)
    return _msm_sharded_jit(mesh, axes, n, max_bits, group, block)(
        px, py, scalars_mont)
