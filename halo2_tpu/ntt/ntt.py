"""Number-theoretic transform over BN254 Fr on limb vectors — TPU-first.

The reference's FFTs are `best_fft_cpu` (recursive rayon radix-2,
/root/reference/halo2_proofs/src/arithmetic.rs:556-705) and the CUDA
`radix_fft` kernel (staged radix-2^8, SURVEY.md §2.9).  This module is a
fresh design for XLA:

  * **Constant-geometry (Pease) radix-2 DIF**: every stage applies the SAME
    program — split (lo, hi) halves, butterfly, interleave — so the whole
    transform is ONE ``lax.scan`` over log2(n) stages.  Compile time is flat
    in n (a single butterfly body), and there is no data-dependent control
    flow or dynamic shape anywhere.
  * Stage s pairs lanes (i, i + n/2) and uses twiddle w^{2^s * (i >> s)};
    the twiddle vector is gathered per stage from the cached full power
    table, with indices computed in-body from the stage counter.
  * The final bit-reverse reordering is a single static gather.

Transforms are along the LAST axis; arrays are limbs-leading
``(16, *batch, n)`` so the transform axis sits on TPU lanes.

Multi-chip: `halo2_tpu.ntt.distributed` implements the four-step variant
(local NTTs + twiddle + all-to-all transpose) over a jax.sharding.Mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from halo2_tpu.fields.bn254 import Fr, FR_ROOT_OF_UNITY, FR_S
from halo2_tpu.fields.limbs import N_LIMBS, ints_to_limbs_np

F = Fr.raw


@functools.lru_cache(maxsize=None)
def bit_reverse_indices(log_n: int) -> np.ndarray:
    n = 1 << log_n
    idx = np.arange(n, dtype=np.int32)
    rev = np.zeros(n, dtype=np.int32)
    for b in range(log_n):
        rev |= ((idx >> b) & 1) << (log_n - 1 - b)
    return rev


def powers_table_np(base: int, count: int, p: int, to_mont) -> np.ndarray:
    """(16, count) Montgomery limbs of base^0..base^{count-1}."""
    vals = []
    acc = 1
    for _ in range(count):
        vals.append(to_mont(acc))
        acc = acc * base % p
    return ints_to_limbs_np(vals)


class NTT:
    """NTT context for one domain size n = 2^log_n with root omega.

    omega: a primitive n-th root of unity in Fr (canonical int form).
    """

    def __init__(self, log_n: int, omega: int | None = None):
        if log_n > FR_S:
            raise ValueError(f"2^{log_n} exceeds Fr 2-adicity 2^{FR_S}")
        self.log_n = log_n
        self.n = 1 << log_n
        if omega is None:
            omega = pow(FR_ROOT_OF_UNITY, 1 << (FR_S - log_n), Fr.p)
        self.omega = omega
        self.omega_inv = pow(omega, Fr.p - 2, Fr.p)
        self.n_inv = pow(self.n, Fr.p - 2, Fr.p)

        half = max(self.n // 2, 1)
        self._tw_np = powers_table_np(omega, half, Fr.p, Fr.to_mont_int)
        self._tw_inv_np = powers_table_np(self.omega_inv, half, Fr.p, Fr.to_mont_int)
        self._rev_np = bit_reverse_indices(log_n)
        self._tw_dev = None
        self._tw_inv_dev = None

    # NOTE: these are host numpy arrays on purpose — inside a jit trace they
    # are embedded as program constants; materializing jnp arrays lazily from
    # a cached_property inside someone else's trace would leak tracers.
    @property
    def twiddles(self):
        return self._tw_np

    @property
    def twiddles_inv(self):
        return self._tw_inv_np

    @property
    def rev(self):
        return self._rev_np

    @functools.cached_property
    def n_inv_mont(self):
        return Fr.encode_scalar(self.n_inv)

    def _tw_device(self, inverse: bool):
        """Device-resident twiddle table (materialized eagerly, never
        inside someone's trace — avoids tracer leaks and giant folded
        constants)."""
        if inverse:
            if self._tw_inv_dev is None:
                self._tw_inv_dev = jax.device_put(self._tw_inv_np)
            return self._tw_inv_dev
        if self._tw_dev is None:
            self._tw_dev = jax.device_put(self._tw_np)
        return self._tw_dev

    # ------------------------------------------------------------------
    def _transform(self, a, twiddles):
        """Constant-geometry radix-2 DIF along the last axis.

        a: (16, *mid, n) limb array; returns same shape, natural order.

        Stages are UNROLLED with gather-free twiddles: stage s needs
        T_s[i] = w^(2^s * (i >> s)) = full[(i >> s) << s] — a strided slice
        of the power table with each entry repeated 2^s times (pure
        reshape/broadcast; a per-stage n/2 gather measured ~50ms at 2^18).
        The fused butterfly Pallas kernel is shape-identical across stages,
        so it compiles once."""
        n, L = self.n, self.log_n
        if n == 1:
            return a
        half = n // 2
        mid_ndim = a.ndim - 2
        shape = a.shape
        from halo2_tpu.fields import pallas_ops

        y = a
        for s in range(L):
            lo = y[..., :half]
            hi = y[..., half:]
            step = 1 << s
            sub = twiddles[:, ::step]                      # (16, half/step)
            tw = jnp.broadcast_to(
                sub[:, :, None],
                (N_LIMBS, half // step, step)).reshape(N_LIMBS, half)
            fused = pallas_ops.butterfly(Fr, lo, hi, tw)
            if fused is not None:
                u, v = fused
            else:
                twb = tw.reshape((N_LIMBS,) + (1,) * mid_ndim + (half,))
                u = F.add(lo, hi)
                v = F.mul(F.sub(lo, hi), twb)
            y = jnp.stack([u, v], axis=-1).reshape(shape)
        return jnp.take(y, self.rev, axis=-1)

    @functools.cached_property
    def _fwd_jit(self):
        return jax.jit(lambda a, tw: self._transform(a, tw))

    @functools.cached_property
    def _inv_jit(self):
        def run(a, tw):
            out = self._transform(a, tw)
            return F.mul(out, self.n_inv_mont.reshape((N_LIMBS,) + (1,) * (a.ndim - 1)))
        return jax.jit(run)

    def forward(self, a):
        """Coefficients -> evaluations at {omega^i}. a: (16, *mid, n) Montgomery."""
        return self._fwd_jit(a, self._tw_device(False))

    def inverse(self, a):
        """Evaluations -> coefficients (divides by n)."""
        return self._inv_jit(a, self._tw_device(True))

    def inverse_nodiv(self, a):
        """Inverse transform WITHOUT the 1/n divisor (callers fold the
        divisor into other constants, like the reference's ifft_divisor,
        /root/reference/halo2_proofs/src/poly/domain.rs:124-131)."""
        return self._fwd_nodiv_jit(a, self._tw_device(True))

    @functools.cached_property
    def _fwd_nodiv_jit(self):
        return jax.jit(lambda a, tw: self._transform(a, tw))

    # traceable versions for composition inside larger jitted programs.
    # Twiddles enter as numpy trace constants here (the caller's program
    # owns them); the unrolled strided slices keep them un-folded.
    def forward_traced(self, a):
        return self._transform(a, self.twiddles)

    def inverse_traced(self, a):
        out = self._transform(a, self.twiddles_inv)
        return F.mul(out, self.n_inv_mont.reshape((N_LIMBS,) + (1,) * (a.ndim - 1)))


@functools.lru_cache(maxsize=None)
def get_ntt(log_n: int) -> NTT:
    """Cached standard-domain NTT (omega = canonical 2^log_n root)."""
    return NTT(log_n)
