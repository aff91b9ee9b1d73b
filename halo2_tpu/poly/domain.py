"""Evaluation domain: the Fr polynomial-domain machinery.

TPU-native re-design of `EvaluationDomain`
(/root/reference/halo2_proofs/src/poly/domain.rs:24-131): the host holds all
scalar constants as Python ints (exact), the device holds polynomial values as
``(16, n)`` uint32 Montgomery limb arrays, and every transform below is a
jit-compiled XLA program built from the NTT layer.

Bases (mirroring poly.rs:37-64):
  "coeff"    — coefficient form, length n
  "lagrange" — evaluations over {omega^i}, length n
  "extended" — evaluations over zeta*{extended_omega^i}, length 2^extended_k
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from halo2_tpu.fields.bn254 import Fr, FR_ZETA
from halo2_tpu.fields.limbs import N_LIMBS, ints_to_limbs_np
from halo2_tpu.ntt.ntt import get_ntt

F = Fr


@dataclass
class Polynomial:
    """A polynomial as device limb values plus a basis tag."""
    values: jnp.ndarray  # (16, len)
    basis: str

    def __len__(self):
        return self.values.shape[1]

    def __add__(self, other):
        assert self.basis == other.basis
        return Polynomial(F.add(self.values, other.values), self.basis)

    def __sub__(self, other):
        assert self.basis == other.basis
        return Polynomial(F.sub(self.values, other.values), self.basis)

    def scale(self, c_limbs):
        """Multiply by a scalar given as (16,) Montgomery limbs."""
        return Polynomial(F.mul(self.values, c_limbs[:, None]), self.basis)


class EvaluationDomain:
    """Domain for circuits with n = 2^k rows and max constraint degree j."""

    def __init__(self, j: int, k: int):
        self.k = k
        self.n = 1 << k
        self.quotient_poly_degree = max(j - 1, 1)
        extended_k = k
        while (1 << extended_k) < self.n * self.quotient_poly_degree:
            extended_k += 1
        self.extended_k = extended_k
        self.extended_n = 1 << extended_k

        self.ntt = get_ntt(k)
        self.ntt_ext = get_ntt(extended_k)
        self.omega = self.ntt.omega
        self.omega_inv = self.ntt.omega_inv
        self.extended_omega = self.ntt_ext.omega
        self.extended_omega_inv = self.ntt_ext.omega_inv

        self.g_coset = FR_ZETA
        self.g_coset_inv = FR_ZETA * FR_ZETA % F.p
        self.barycentric_weight = pow(self.n, F.p - 2, F.p)

        # t(zeta * ext_omega^i) = zeta^n * ext_omega^{n i} - 1, period 2^(ext_k-k)
        period = 1 << (extended_k - k)
        orig = pow(self.g_coset, self.n, F.p)
        step = pow(self.extended_omega, self.n, F.p)
        t_evals = []
        cur = orig
        for _ in range(period):
            t_evals.append((cur - 1) % F.p)
            cur = cur * step % F.p
        self.t_evaluations_inv = [pow(t, F.p - 2, F.p) for t in t_evals]

    # -- constructors ------------------------------------------------------
    def empty_lagrange(self) -> Polynomial:
        return Polynomial(jnp.zeros((N_LIMBS, self.n), jnp.uint32), "lagrange")

    def empty_coeff(self) -> Polynomial:
        return Polynomial(jnp.zeros((N_LIMBS, self.n), jnp.uint32), "coeff")

    def empty_extended(self) -> Polynomial:
        return Polynomial(jnp.zeros((N_LIMBS, self.extended_n), jnp.uint32), "extended")

    def constant_lagrange(self, c: int) -> Polynomial:
        col = F.broadcast_scalar(F.encode_scalar(c), (self.n,))
        return Polynomial(col, "lagrange")

    def constant_extended(self, c: int) -> Polynomial:
        col = F.broadcast_scalar(F.encode_scalar(c), (self.extended_n,))
        return Polynomial(col, "extended")

    def lagrange_from_ints(self, vals) -> Polynomial:
        vals = list(vals)
        assert len(vals) == self.n
        return Polynomial(jnp.asarray(F.encode(vals)), "lagrange")

    def coeff_from_ints(self, vals) -> Polynomial:
        vals = list(vals)
        assert len(vals) <= self.n
        vals = vals + [0] * (self.n - len(vals))
        return Polynomial(jnp.asarray(F.encode(vals)), "coeff")

    # -- device constants ----------------------------------------------------
    @functools.cached_property
    def _zeta_pattern(self):
        """(16, extended_n) tile of [1, zeta, zeta^2] for into-coset."""
        return self._zeta_tile(self.g_coset, self.extended_n)

    @functools.cached_property
    def _zeta_pattern_n(self):
        return self._zeta_tile(self.g_coset, self.n)

    @functools.cached_property
    def _zeta_inv_pattern(self):
        tail = self.n * self.quotient_poly_degree
        return self._zeta_tile(self.g_coset_inv, max(tail, self.extended_n))

    def _zeta_tile(self, z: int, length: int):
        # host numpy on purpose: used as trace-time constants (see ntt.py)
        pat = [1, z, z * z % F.p]
        reps = -(-length // 3)
        vals = (pat * reps)[:length]
        return ints_to_limbs_np([F.to_mont_int(v) for v in vals])

    def _zeta_tile_traced(self, z: int, length: int):
        """The zeta tile built IN-TRACE from a (16, 3) constant: inside a
        jitted program the host tile would bake an O(n) HLO constant
        (64 MB at k=20) — enough to blow the axon remote-compile request
        limit together with the twiddles (see ntt.py mid_dev)."""
        pat = jnp.asarray(ints_to_limbs_np(
            [F.to_mont_int(v) for v in (1, z, z * z % F.p)]))
        reps = -(-length // 3)
        return jnp.tile(pat, (1, reps))[:, :length]

    @functools.cached_property
    def _t_inv_full(self):
        """t_evaluations^{-1} tiled to extended_n (period 2^(ext_k-k))."""
        period = len(self.t_evaluations_inv)
        reps = self.extended_n // period
        vals = self.t_evaluations_inv * reps
        return ints_to_limbs_np([F.to_mont_int(v) for v in vals])

    # -- transforms (all traceable; jit at the call site or here) ----------
    def lagrange_to_coeff(self, p: Polynomial) -> Polynomial:
        assert p.basis == "lagrange" and len(p) == self.n
        return Polynomial(self.ntt.inverse(p.values), "coeff")

    def coeff_to_lagrange(self, p: Polynomial) -> Polynomial:
        assert p.basis == "coeff" and len(p) == self.n
        return Polynomial(self.ntt.forward(p.values), "lagrange")

    def coeff_to_extended(self, p: Polynomial) -> Polynomial:
        """distribute_powers_zeta + zero-pad + extended-domain NTT
        (mirrors /root/reference/halo2_proofs/src/poly/domain.rs:270-287)."""
        assert p.basis == "coeff" and len(p) == self.n
        return Polynomial(self._coeff_to_extended_jit(p.values), "extended")

    @functools.cached_property
    def _coeff_to_extended_jit(self):
        def run(values, mid):
            shifted = F.mul(values, self._zeta_tile_traced(self.g_coset,
                                                           self.n))
            padded = jnp.zeros((N_LIMBS, self.extended_n), jnp.uint32)
            padded = padded.at[:, : self.n].set(shifted)
            return self.ntt_ext.forward_traced(padded, mid=mid)
        jitted = jax.jit(run)
        # mid twiddles as an ARGUMENT: O(n) HLO constants blow the axon
        # remote-compile request limit at k=20 (see NTT.mid_dev)
        return lambda values: jitted(values, self.ntt_ext.mid_dev(False))

    def coeff_to_extended_traced(self, values):
        """Traceable body for composition inside larger jitted programs."""
        shifted = F.mul(values, self._zeta_tile_traced(self.g_coset, self.n))
        padded = jnp.zeros((N_LIMBS, self.extended_n), jnp.uint32)
        padded = padded.at[:, : self.n].set(shifted)
        return self.ntt_ext.forward_traced(padded)

    def dist_ntt(self, mesh, axis="x", extended: bool = False):
        """Cached DistNTT over this domain (or its extended domain) for a
        mesh axis — the multi-chip transform used by the prover when
        `params.use_mesh` is set (ntt/distributed.py)."""
        from halo2_tpu.ntt.distributed import DistNTT
        if not hasattr(self, "_dist_cache"):
            self._dist_cache = {}
        key = (id(mesh), axis, extended)
        d = self._dist_cache.get(key)
        if d is None:
            d = self._dist_cache[key] = DistNTT(
                self.extended_k if extended else self.k, mesh, axis,
                omega=self.extended_omega if extended else self.omega)
        return d

    def extended_to_coeff(self, p: Polynomial, mesh=None,
                          axis="x") -> jnp.ndarray:
        """Extended evals -> quotient coefficients, truncated to
        n * quotient_poly_degree (domain.rs:328-350). Returns raw (16, t).

        With a mesh: the inverse transform is the DISTRIBUTED four-step
        NTT (all_to_all transpose over the mesh axis) — the multi-chip
        analogue of the reference's per-GPU extended iFFTs
        (evaluation_gpu.rs:863-911); each chip's slice is ext_n/D so no
        streaming is needed.  Single chip: large domains (extended_n >=
        HALO2_TPU_STREAM_NTT_MIN, default 2^23) go through the chunked
        streaming inverse transform — the monolithic program's working
        set OOMed the 16 GiB chip at k=22 (BASELINE.md round-3 "k=22
        attempt"); the streamed path caps peak HBM at
        input+output+mid+chunk.  CONSUMES p.values either way."""
        assert p.basis == "extended"
        import os
        values, p.values = p.values, None       # consume: the buffer dies here
        if mesh is not None:
            return self._extended_to_coeff_dist(values, mesh, axis)
        stream_min = int(os.environ.get("HALO2_TPU_STREAM_NTT_MIN",
                                        str(1 << 23)))
        if self.extended_n >= stream_min:
            return self._extended_to_coeff_streamed(values)
        return self._extended_to_coeff_jit(values)

    def _extended_to_coeff_dist(self, values, mesh, axis) -> jnp.ndarray:
        dist = self.dist_ntt(mesh, axis, extended=True)
        coeffs = dist.inverse_nodiv(values)
        values = None
        tail = self.n * self.quotient_poly_degree
        n_inv = self.ntt_ext.n_inv
        # same divisor-folded zeta^{-i mod 3} pattern as the streamed path
        pat = [n_inv, n_inv * self.g_coset_inv % F.p,
               n_inv * self.g_coset_inv * self.g_coset_inv % F.p]
        pat_np = ints_to_limbs_np([F.to_mont_int(v) for v in pat])

        @functools.partial(jax.jit, donate_argnums=(0,))
        def fin(c):
            tile = jnp.tile(jnp.asarray(pat_np), (1, -(-tail // 3)))[:, :tail]
            return Fr.raw.mul(c[:, :tail], tile)

        return fin(coeffs)

    def _extended_to_coeff_streamed(self, values) -> jnp.ndarray:
        coeffs = self.ntt_ext.inverse_streamed_nodiv(values)
        values = None
        tail = self.n * self.quotient_poly_degree
        n_inv = self.ntt_ext.n_inv
        # fold the 1/ext_n divisor into the small zeta^{-i mod 3} pattern
        pat = [n_inv, n_inv * self.g_coset_inv % F.p,
               n_inv * self.g_coset_inv * self.g_coset_inv % F.p]
        pat_np = ints_to_limbs_np([F.to_mont_int(v) for v in pat])

        @functools.partial(jax.jit, donate_argnums=(0,))
        def fin(c):
            tile = jnp.tile(jnp.asarray(pat_np), (1, -(-tail // 3)))[:, :tail]
            return Fr.raw.mul(c[:, :tail], tile)

        return fin(coeffs)

    @functools.cached_property
    def _extended_to_coeff_jit(self):
        tail = self.n * self.quotient_poly_degree

        def run(values, mid):
            coeffs = self.ntt_ext.inverse_traced(values, mid=mid)
            out = F.mul(coeffs[:, :tail],
                        self._zeta_tile_traced(self.g_coset_inv, tail))
            return out
        # donate the extended values: the caller's copy dies here and the
        # 512 MiB (k=22) buffer feeds the transform in place
        jitted = jax.jit(run, donate_argnums=(0,))
        return lambda values: jitted(values, self.ntt_ext.mid_dev(True))

    def divide_by_vanishing_poly(self, p: Polynomial) -> Polynomial:
        assert p.basis == "extended"
        return Polynomial(self._divide_by_vanishing_jit(p.values), "extended")

    @functools.cached_property
    def _divide_by_vanishing_jit(self):
        # t_evaluations^{-1} is periodic with period 2^(ext_k - k): tile the
        # SMALL table in-trace — the full (16, ext_n) host tile cost a
        # 134 MB host->device transfer per call at k=20 (axon tunnel:
        # ~190 s) when used as an eager operand
        period = len(self.t_evaluations_inv)
        small = ints_to_limbs_np(
            [F.to_mont_int(v) for v in self.t_evaluations_inv])

        def run(values):
            tile = jnp.tile(jnp.asarray(small),
                            (1, self.extended_n // period))
            return F.mul(values, tile)
        return jax.jit(run, donate_argnums=(0,))

    def rotate_extended(self, values, rotation: int):
        """Roll extended-domain values by rotation over the ORIGINAL domain
        (scale factor 2^(ext_k - k)) — domain.rs:305-321."""
        shift = rotation << (self.extended_k - self.k)
        return jnp.roll(values, -shift, axis=1)

    # -- host scalar helpers (verifier / transcript side) ------------------
    def rotate_omega(self, value: int, rotation: int) -> int:
        """value * omega^rotation (host ints)."""
        if rotation >= 0:
            return value * pow(self.omega, rotation, F.p) % F.p
        return value * pow(self.omega_inv, -rotation, F.p) % F.p

    def l_i_range(self, x: int, xn: int, rotations) -> list:
        """Barycentric Lagrange-basis evaluations l_i(x) for i in rotations
        (domain.rs:497-522)."""
        common = (xn - 1) * self.barycentric_weight % F.p
        out = []
        for rot in rotations:
            denom = (x - self.rotate_omega(1, rot)) % F.p
            inv = pow(denom, F.p - 2, F.p)
            out.append(self.rotate_omega(inv * common % F.p, rot))
        return out

    def get_quotient_poly_degree(self) -> int:
        return self.quotient_poly_degree
