"""Multi-chip sharded h(X) evaluation — the distributed prover hot phase.

The reference splits the gate monomial set across GPUs and runs per-GPU
expression trees with explicit buffer caches
(/root/reference/halo2_proofs/src/plonk/evaluation.rs:326-346,1262-1276).
The TPU-native design shards the extended evaluation DOMAIN (rows) over a
jax.sharding.Mesh axis instead — every chip holds a contiguous block of
every column and the whole constraint fold is embarrassingly parallel
except for two structured exchanges:

  * the coset extension NTT of each referenced column — the distributed
    four-step transform (ntt/distributed.py), whose middle transpose is an
    `all_to_all` over ICI;
  * rotations (`roll`) — each roll moves only the |rot| * rot_scale
    boundary rows between neighbouring shards, one `ppermute` per rotation
    (rotations are tiny: +-1 gate rotations and the (blinders+1) last-rot).

The constraint body itself is the SAME code as the single-chip engine
(plonk/evaluator.py::h_fold_body) — only the extension/rotation primitives
and the table slicing differ.  This is the "fully sharded prover pipeline"
of SURVEY.md §2.20 for the dominant phase; commitments already shard via
msm/distributed.py.
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
from halo2_tpu.ntt.distributed import DistNTT
from halo2_tpu.plonk.evaluator import h_fold_body
from halo2_tpu.plonk.expr_eval import ExprCtx

F = Fr.raw
P = Fr.p


class ShardedEvaluator:
    """h(X) program with the extended domain sharded over a mesh axis."""

    def __init__(self, pk, mesh: Mesh, axis: str = "x"):
        self.pk = pk
        self.mesh = mesh
        self.axis = axis
        self.D = mesh.shape[axis]
        domain = pk.vk.domain
        self.rot_scale = 1 << (domain.extended_k - domain.k)
        self.ext_n = domain.extended_n
        self.L = self.ext_n // self.D
        assert self.ext_n % self.D == 0
        self.dist = DistNTT(domain.extended_k, mesh, axis,
                            omega=domain.extended_omega)
        self._jit = None

    # -- distributed primitives (called inside shard_map) -----------------
    def _dist_roll(self, col, shift):
        """Global left-roll by `shift` of a row-sharded (16, ..., L) block.

        For ANY shift, shard d's output rows live in at most two source
        shards: with shift = q*L + r, out_d = src_{d+q}[r:] ++ src_{d+q+1}
        [:r] — exactly two ppermutes (one when r == 0).  Typical prover
        rotations (+-rot_scale, (blinders+1)*rot_scale) have q == 0, so
        only |r| boundary rows move between neighbours."""
        ext_n, L, D = self.ext_n, self.L, self.D
        s = shift % ext_n
        if s == 0:
            return col
        ax = self.axis
        q, r = divmod(s, L)
        if r == 0:
            if q == 0:
                return col
            return jax.lax.ppermute(
                col, ax, [((d + q) % D, d) for d in range(D)])
        tail = col[..., r:]    # rows r..L-1 of shard d+q
        head = col[..., :r]    # rows 0..r-1 of shard d+q+1
        recv_tail = jax.lax.ppermute(
            tail, ax, [((d + q) % D, d) for d in range(D)])
        recv_head = jax.lax.ppermute(
            head, ax, [((d + q + 1) % D, d) for d in range(D)])
        return jnp.concatenate([recv_tail, recv_head], axis=-1)

    def _extend_local(self, coeffs, zeta_pat):
        """(16, C, n) replicated coeffs -> (16, C, ext_n/D) local extended
        coset block: zeta-shift, slice this device's columns of the
        (n1, n2) view, zero-pad the high rows, distributed four-step NTT."""
        n_orig = self.pk.vk.domain.n
        dist = self.dist
        C = coeffs.shape[1]
        if C == 0:
            return jnp.zeros((N_LIMBS, 0, self.L), jnp.uint32)
        shifted = F.mul(coeffs, zeta_pat[:, None, :])
        n1, n2, D = dist.n1, dist.n2, dist.D
        L2 = n2 // D
        me = jax.lax.axis_index(self.axis)
        if n_orig >= n2:
            # nonzero region fills whole rows: i1*n2 + i2 < n_orig
            # <=> i1 < n_orig/n2 (n2 | n_orig)
            R = n_orig // n2
            v = shifted.reshape(N_LIMBS, C, R, n2)
            loc = jax.lax.dynamic_slice_in_dim(v, me * L2, L2, axis=3)
            pad = jnp.zeros((N_LIMBS, C, n1 - R, L2), jnp.uint32)
            x_local = jnp.concatenate([loc, pad], axis=2)
        else:
            # tiny domains: gather the strided columns directly
            i1 = jax.lax.broadcasted_iota(jnp.int32, (n1, L2), 0)
            i2 = jax.lax.broadcasted_iota(jnp.int32, (n1, L2), 1) + me * L2
            flat = i1 * n2 + i2
            valid = flat < n_orig
            idx = jnp.where(valid, flat, 0)
            g = jnp.take(shifted, idx.reshape(-1), axis=2)
            g = g.reshape(N_LIMBS, C, n1, L2)
            x_local = jnp.where(valid[None, None], g, 0)
        return dist.local_forward(x_local)  # (16, C, ext_n/D)

    def _local_coset_x(self, outer, inner, n2: int):
        """This shard's coset_x rows from the factored tables:
        coset_x[i] = outer[i // n2] * inner[i % n2], i = me*L + 0..L-1."""
        me = jax.lax.axis_index(self.axis)
        i = me * self.L + jnp.arange(self.L, dtype=jnp.int32)
        o = jnp.take(outer, i // n2, axis=1)
        v = jnp.take(inner, i % n2, axis=1)
        return F.mul(o, v)

    # -- the sharded program ----------------------------------------------
    def _local_body(self, advice_coeff, instance_coeff, perm_zs_coeff,
                    lookup_ms_coeff, lookup_zs_coeff, shuffle_zs_coeff,
                    fixed_coeff, sigmas_coeff, l_coeffs,
                    coset_outer, coset_inner, zeta_pat,
                    theta, beta, gamma, y, value_init_loc):
        cs = self.pk.vk.cs
        bf = cs.blinding_factors()

        ctx = ExprCtx(
            advice=self._extend_local(advice_coeff, zeta_pat),
            fixed=self._extend_local(fixed_coeff, zeta_pat),
            instance=self._extend_local(instance_coeff, zeta_pat),
            rot_scale=self.rot_scale,
            length=self.L,
            roll=self._dist_roll,
        )
        # l0/l_last/l_blind extended locally; l_active derived in place
        l_ext = self._extend_local(l_coeffs, zeta_pat)
        l0_loc, l_last_loc, l_blind_loc = (l_ext[:, i, :] for i in range(3))
        one = F.broadcast_scalar(Fr.r_np, (self.L,))
        l_active_loc = F.sub(one, F.add(l_last_loc, l_blind_loc))
        sigmas_ext_loc = self._extend_local(sigmas_coeff, zeta_pat)
        n2 = self.pk.ev._coset_tabs[3]
        coset_x_loc = self._local_coset_x(coset_outer, coset_inner, n2)
        return h_fold_body(
            cs, ctx,
            perm_z=self._extend_local(perm_zs_coeff, zeta_pat),
            lookup_m=self._extend_local(lookup_ms_coeff, zeta_pat),
            lookup_z=self._extend_local(lookup_zs_coeff, zeta_pat),
            shuffle_z=self._extend_local(shuffle_zs_coeff, zeta_pat),
            l0=l0_loc, l_last=l_last_loc, l_active=l_active_loc,
            coset_x=coset_x_loc,
            sigmas=lambda j: sigmas_ext_loc[:, j, :],
            one=one,
            roll_next=lambda a: self._dist_roll(a, self.rot_scale),
            roll_last=lambda a: self._dist_roll(
                a, -(bf + 1) * self.rot_scale),
            theta=theta, beta=beta, gamma=gamma, y=y, value=value_init_loc)

    def _build_jit(self):
        rep = Pspec()                       # fully replicated
        rep2 = Pspec(None, None)
        rep3 = Pspec(None, None, None)
        shard1 = Pspec(None, self.axis)     # (16, ext_n) row-sharded

        body = shard_map(
            self._local_body, mesh=self.mesh,
            in_specs=(rep3, rep3, rep3, rep3, rep3, rep3,   # coeff stacks
                      rep3, rep3, rep3,                     # fixed/sigma/l coeffs
                      rep2, rep2,                           # coset_x tables
                      rep2,                                 # zeta pattern
                      rep, rep, rep, rep,                   # challenges
                      shard1),                              # value_init
            out_specs=shard1,
            check_vma=False)
        return jax.jit(body)

    def evaluate_h(self, advice_coeff, instance_coeff, perm_zs_coeff,
                   lookup_ms_coeff, lookup_zs_coeff, shuffle_zs_coeff,
                   theta: int, beta: int, gamma: int, y: int,
                   value_init=None):
        """Same contract as Evaluator.evaluate_h; the result is a global
        (16, ext_n) array sharded over the mesh axis."""
        pk = self.pk
        domain = pk.vk.domain
        if self._jit is None:
            self._jit = self._build_jit()
        if value_init is None:
            value_init = jnp.zeros((N_LIMBS, domain.extended_n), jnp.uint32)
        outer, inner, _, _ = pk.ev._coset_tabs
        l_coeffs = jnp.stack(
            [pk.l0_coeff, pk.l_last_coeff, pk.l_blind_coeff], axis=1)
        return self._jit(
            advice_coeff, instance_coeff, perm_zs_coeff, lookup_ms_coeff,
            lookup_zs_coeff, shuffle_zs_coeff,
            pk.fixed_coeff, pk.permutation_pk.sigmas_coeff, l_coeffs,
            jnp.asarray(outer), jnp.asarray(inner),
            jnp.asarray(domain._zeta_pattern_n),
            jnp.asarray(Fr.encode_scalar(theta)),
            jnp.asarray(Fr.encode_scalar(beta)),
            jnp.asarray(Fr.encode_scalar(gamma)),
            jnp.asarray(Fr.encode_scalar(y)), value_init)
