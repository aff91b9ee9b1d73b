"""Distributed four-step NTT over a jax.sharding.Mesh.

The reference scales FFTs by splitting work across GPUs with a device pool
(SURVEY.md §2.20); the TPU-native design is the classic four-step/Bailey
decomposition over ICI collectives (the plan in SURVEY.md §7):

  N = N1 * N2, A[i1, i2] = x[i1*N2 + i2], sharded on i2 (columns):
    1. local NTTs of length N1 along axis i1 (each chip owns full columns)
    2. local twiddle  B[k1, i2] *= w^(k1*i2)   (offset-aware gather)
    3. `all_to_all` transpose to shard on k1, local NTTs of length N2
    4. `all_to_all` transpose back so the output X[k2*N1 + k1] is sharded
       contiguously on k2 — natural order, ready for elementwise stages.

Everything inside is the constant-geometry scan NTT (ntt.py), so the whole
distributed transform is one jittable shard_map program.
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

from halo2_tpu.fields.bn254 import Fr
from halo2_tpu.fields.limbs import N_LIMBS
from halo2_tpu.ntt.ntt import NTT, get_ntt

F = Fr.raw


class DistNTT:
    """Four-step NTT of size 2^log_n over mesh axis `axis` with D devices."""

    def __init__(self, log_n: int, mesh: Mesh, axis: str = "x"):
        self.log_n = log_n
        self.n = 1 << log_n
        self.mesh = mesh
        self.axis = axis
        self.D = mesh.shape[axis]
        assert self.D & (self.D - 1) == 0, "device count must be a power of two"
        self.log_d = self.D.bit_length() - 1
        # split: N1 rows x N2 cols; both must be divisible by D
        self.log_n1 = self.log_n // 2
        self.log_n2 = self.log_n - self.log_n1
        assert min(self.log_n1, self.log_n2) >= self.log_d, \
            "n too small for this device count"
        self.n1, self.n2 = 1 << self.log_n1, 1 << self.log_n2
        self.ntt1 = get_ntt(self.log_n1)
        self.ntt2 = get_ntt(self.log_n2)
        self.omega = get_ntt(log_n).omega
        self._fwd = None

    # ------------------------------------------------------------------
    def _local_fwd(self, x_local, tw_full):
        """x_local: (16, n1, n2/D) — this device's column slice."""
        n1, n2, D = self.n1, self.n2, self.D
        me = jax.lax.axis_index(self.axis)

        # step 1: length-n1 NTTs along axis 1 (transpose to put it last)
        a = x_local.transpose(0, 2, 1)                 # (16, n2/D, n1)
        a = self.ntt1.forward_traced(a)                # NTT along last axis
        a = a.transpose(0, 2, 1)                       # (16, n1, n2/D) = B[k1, i2]

        # step 2: twiddle w^(k1 * i2), i2 = local + offset
        k1 = jax.lax.broadcasted_iota(jnp.int32, (n1, n2 // D), 0)
        i2 = jax.lax.broadcasted_iota(jnp.int32, (n1, n2 // D), 1) + me * (n2 // D)
        idx = (k1 * i2) % self.n
        tw = jnp.take(tw_full, idx.reshape(-1), axis=1).reshape(N_LIMBS, n1, n2 // D)
        a = F.mul(a, tw)

        # step 3: transpose shard k1 <- i2, local length-n2 NTTs
        a = jax.lax.all_to_all(a, self.axis, split_axis=1, concat_axis=2,
                               tiled=True)             # (16, n1/D, n2)
        a = self.ntt2.forward_traced(a)                # C[k1_local, k2]

        # step 4: transpose back so output is sharded on k2 blocks:
        # X[k2*n1 + k1] = C[k1, k2]
        a = a.transpose(0, 2, 1)                       # (16, n2, n1/D)
        a = jax.lax.all_to_all(a, self.axis, split_axis=1, concat_axis=2,
                               tiled=True)             # (16, n2/D, n1)
        return a.reshape(N_LIMBS, (n2 // D) * n1)

    # ------------------------------------------------------------------
    @functools.cached_property
    def forward_sharded(self):
        """jitted fn: (16, n) sharded array -> (16, n) sharded evaluations.

        Input layout: x[i1*n2 + i2] viewed as (n1, n2) sharded on i2 via a
        (16, n1, n2) reshape; pass a flat (16, n) array with
        NamedSharding(mesh, P(None, axis)) on the reshaped view."""
        from halo2_tpu.ntt.ntt import powers_table_np
        tw_full = powers_table_np(self.omega, self.n, Fr.p, Fr.to_mont_int)

        spec_in = Pspec(None, None, self.axis)
        spec_out = Pspec(None, self.axis)

        def run(x):
            x3 = x.reshape(N_LIMBS, self.n1, self.n2)
            body = shard_map(
                lambda xl: self._local_fwd(xl, tw_full),
                mesh=self.mesh,
                in_specs=(spec_in,),
                out_specs=spec_out,
                check_vma=False,  # pallas_call out_shapes carry no vma
            )
            return body(x3).reshape(N_LIMBS, self.n)

        return jax.jit(run)

    def forward(self, x):
        """x: (16, n) replicated-or-sharded device array, natural coeff
        order.  Returns evaluations in natural order (sharded on rows)."""
        return self.forward_sharded(x)


