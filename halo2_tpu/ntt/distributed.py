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

Each local NTT is itself the single-chip four-step transform (ntt.py), so
the whole distributed transform is one jittable shard_map program.

`local_forward` / `local_inverse` are the shard-local bodies: they use
`lax.all_to_all` / `axis_index` against the mesh axis name and can be
composed inside an ENCLOSING shard_map (e.g. the sharded h-evaluator,
plonk/evaluator_sharded.py) — shard_map does not nest, so composition
happens at the local-body level.
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
from halo2_tpu.ntt.ntt import NTT, get_ntt, powers_table_np

F = Fr.raw


class DistNTT:
    """Four-step NTT of size 2^log_n over mesh axis `axis` with D devices.

    Supports leading batch dims: arrays are (16, *B, n) flat or
    (16, *B, n1, n2/D) shard-local."""

    def __init__(self, log_n: int, mesh: Mesh, axis: str = "x",
                 omega: int | None = None):
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
        base = get_ntt(log_n) if omega is None else NTT(log_n, omega)
        self.omega = base.omega
        self.omega_inv = base.omega_inv
        self.n_inv = base.n_inv
        self.ntt1 = NTT(self.log_n1, pow(self.omega, self.n2, Fr.p))
        self.ntt2 = NTT(self.log_n2, pow(self.omega, self.n1, Fr.p))
        self.ntt1_inv_root = NTT(self.log_n1, pow(self.omega_inv, self.n2, Fr.p))
        self.ntt2_inv_root = NTT(self.log_n2, pow(self.omega_inv, self.n1, Fr.p))

    @functools.cached_property
    def _tw_full(self):
        return powers_table_np(self.omega, self.n, Fr.p, Fr.to_mont_int)

    @functools.cached_property
    def _tw_full_inv(self):
        return powers_table_np(self.omega_inv, self.n, Fr.p, Fr.to_mont_int)

    # ------------------------------------------------------------------
    def _local_transform(self, x_local, tw_full, ntt_row, ntt_col):
        """Shard-local four-step body. x_local: (16, *B, n1, n2/D) — this
        device's column slice of the (n1, n2) view.  Returns
        (16, *B, (n2/D)*n1): the k2-contiguous shard of the flat output."""
        n1, n2, D = self.n1, self.n2, self.D
        me = jax.lax.axis_index(self.axis)
        nd = x_local.ndim
        ax_r, ax_c = nd - 2, nd - 1

        # step 1: length-n1 NTTs along the row axis
        a = jnp.swapaxes(x_local, ax_r, ax_c)          # (16,*B, n2/D, n1)
        a = ntt_row.forward_traced(a)
        a = jnp.swapaxes(a, ax_r, ax_c)                # (16,*B, n1, n2/D) = B[k1, i2]

        # step 2: twiddle w^(k1 * i2), i2 = local + offset
        k1 = jax.lax.broadcasted_iota(jnp.int32, (n1, n2 // D), 0)
        i2 = jax.lax.broadcasted_iota(jnp.int32, (n1, n2 // D), 1) \
            + me * (n2 // D)
        idx = (k1 * i2) % self.n
        tw = jnp.take(jnp.asarray(tw_full), idx.reshape(-1), axis=1)
        tw = tw.reshape((N_LIMBS,) + (1,) * (nd - 3) + (n1, n2 // D))
        a = F.mul(a, tw)

        # step 3: transpose shard k1 <- i2, local length-n2 NTTs
        a = jax.lax.all_to_all(a, self.axis, split_axis=ax_r,
                               concat_axis=ax_c, tiled=True)  # (16,*B, n1/D, n2)
        a = ntt_col.forward_traced(a)                  # C[k1_local, k2]

        # step 4: transpose back so output is sharded on k2 blocks:
        # X[k2*n1 + k1] = C[k1, k2]
        a = jnp.swapaxes(a, ax_r, ax_c)                # (16,*B, n2, n1/D)
        a = jax.lax.all_to_all(a, self.axis, split_axis=ax_r,
                               concat_axis=ax_c, tiled=True)  # (16,*B, n2/D, n1)
        return a.reshape(a.shape[:-2] + ((n2 // D) * n1,))

    def local_forward(self, x_local):
        """Forward transform of this device's (16, *B, n1, n2/D) slice."""
        return self._local_transform(x_local, self._tw_full,
                                     self.ntt1, self.ntt2)

    def local_inverse_nodiv(self, x_local):
        """Inverse transform (no 1/n divisor) of the local slice."""
        return self._local_transform(x_local, self._tw_full_inv,
                                     self.ntt1_inv_root, self.ntt2_inv_root)

    def local_slice_from_flat(self, x_flat, local_ndim_check=True):
        """(16, *B, n) replicated -> (16, *B, n1, n2/D) local column slice.

        The (n1, n2) view of the flat array is x[i1*n2 + i2] = view[i1, i2];
        device d owns columns [d*n2/D, (d+1)*n2/D).  Call inside shard_map."""
        n1, n2, D = self.n1, self.n2, self.D
        me = jax.lax.axis_index(self.axis)
        v = x_flat.reshape(x_flat.shape[:-1] + (n1, n2))
        return jax.lax.dynamic_slice_in_dim(v, me * (n2 // D), n2 // D,
                                            axis=v.ndim - 1)

    # ------------------------------------------------------------------
    @functools.cached_property
    def _n_inv_limbs(self):
        from halo2_tpu.ntt.ntt import powers_table_np
        from halo2_tpu.fields.limbs import ints_to_limbs_np
        return ints_to_limbs_np([Fr.to_mont_int(self.n_inv)])  # (16, 1)

    def _make_sharded(self, nb: int, inverse: bool, divide: bool):
        """jitted whole-array transform with `nb` leading batch dims:
        (16, *B, n) natural order -> (16, *B, n) natural order, output
        sharded on the mesh axis (contiguous blocks)."""
        spec_in = Pspec(*([None] * (nb + 2)), self.axis)
        spec_out = Pspec(*([None] * (nb + 1)), self.axis)

        def local(xl):
            y = (self.local_inverse_nodiv(xl) if inverse
                 else self.local_forward(xl))
            if divide:
                ninv = jnp.asarray(self._n_inv_limbs).reshape(
                    (N_LIMBS,) + (1,) * (y.ndim - 1))
                y = F.mul(y, ninv)
            return y

        def run(x):
            x4 = x.reshape(x.shape[:-1] + (self.n1, self.n2))
            body = shard_map(
                local, mesh=self.mesh,
                in_specs=(spec_in,), out_specs=spec_out,
                check_vma=False,  # pallas_call out_shapes carry no vma
            )
            return body(x4).reshape(x.shape)

        return jax.jit(run)

    @functools.cached_property
    def _sharded_cache(self):
        return {}

    def _sharded(self, nb: int, inverse: bool, divide: bool = False):
        key = (nb, inverse, divide)
        fn = self._sharded_cache.get(key)
        if fn is None:
            fn = self._sharded_cache[key] = self._make_sharded(
                nb, inverse, divide)
        return fn

    @functools.cached_property
    def forward_sharded(self):
        """jitted fn: (16, n) array -> (16, n) evaluations sharded on the
        mesh axis (natural order, contiguous blocks per device)."""
        return self._sharded(0, inverse=False)

    def forward(self, x):
        """x: (16, n) replicated-or-sharded device array, natural coeff
        order.  Returns evaluations in natural order (sharded on rows)."""
        return self.forward_sharded(x)

    def inverse(self, x):
        """Batched distributed inverse NTT WITH the 1/n divisor —
        byte-identical to the single-chip `NTT.inverse` (exact mod-p
        arithmetic, canonical residues).  x: (16, *B, n); output sharded
        on the mesh axis.  Backs the prover's step-7 coeff-form iNTTs
        under `params.use_mesh` (the multi-GPU `lagrange_to_coeff_st` of
        keygen.rs:379-383 / prover.rs:639-661)."""
        return self._sharded(x.ndim - 2, inverse=True, divide=True)(x)

    def inverse_nodiv(self, x):
        """Batched distributed inverse NTT WITHOUT the divisor (callers
        fold 1/n into other constants, like domain.rs:124-131)."""
        return self._sharded(x.ndim - 2, inverse=True, divide=False)(x)
