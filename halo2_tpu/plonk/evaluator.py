"""h(X) evaluation engine — the quotient-numerator on the extended coset.

TPU re-design of the reference's dominant phase
(/root/reference/halo2_proofs/src/plonk/evaluation.rs:777-1226 CPU,
evaluation_gpu.rs GPU): instead of compiling per-GPU ProveExpression trees
with a Belady buffer cache, the gate programs + permutation/logup/shuffle
terms are traced ONCE into a single jitted XLA program over the extended
domain:
  * every referenced column's extended-coset form is produced by the batched
    constant-geometry NTT (one call for all columns of a kind) — the
    "materialize each unit exactly once" discipline the GPU path's unit
    cache approximates (evaluation_gpu.rs:327-468) falls out naturally;
  * rotations are `jnp.roll` by rot << (ext_k - k) (get_rotation_idx,
    evaluation.rs:40-42);
  * XLA fuses the elementwise constraint chains, replacing the reference's
    hand-scheduled eval_* CUDA kernels (SURVEY.md §2.9);
  * challenges enter as device operands, so one compiled program serves
    every proof of the same circuit.

The y-fold order matches the verifier exactly: gates (per instance), then
permutation terms, then lookups, then shuffles (verifier.rs:300-384).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from halo2_tpu.fields.bn254 import Fr
from halo2_tpu.fields.limbs import N_LIMBS
from halo2_tpu.ntt.ntt import powers_table_np
from halo2_tpu.plonk import permutation as perm_mod
from halo2_tpu.plonk.circuit import (
    AdviceQuery, Constant, FixedQuery, InstanceQuery, Negated, Product,
    Scaled, Sum,
)

F = Fr.raw
P = Fr.p


class Evaluator:
    """Compiled h(X) program for one proving key."""

    def __init__(self, pk):
        self.pk = pk
        cs = pk.vk.cs
        domain = pk.vk.domain
        self.rot_scale = 1 << (domain.extended_k - domain.k)
        # coset_x[i] = zeta * extended_omega^i (the X value on the coset row)
        zeta_pows = powers_table_np(domain.extended_omega, domain.extended_n,
                                    P, lambda v: Fr.to_mont_int(v * domain.g_coset % P))
        self._coset_x_np = zeta_pows
        self._jit = None

    # ------------------------------------------------------------------
    def _expr_value(self, expr, ctx):
        """Recursively evaluate an Expression on the extended domain."""
        if isinstance(expr, Constant):
            return F.broadcast_scalar(Fr.encode_scalar(expr.value),
                                      (self.pk.vk.domain.extended_n,))
        if isinstance(expr, (FixedQuery, AdviceQuery, InstanceQuery)):
            kind = {FixedQuery: "fixed", AdviceQuery: "advice",
                    InstanceQuery: "instance"}[type(expr)]
            col = ctx[kind][:, expr.column_index, :]
            if expr.rotation:
                col = jnp.roll(col, -expr.rotation * self.rot_scale, axis=-1)
            return col
        if isinstance(expr, Negated):
            return F.neg(self._expr_value(expr.expr, ctx))
        if isinstance(expr, Sum):
            return F.add(self._expr_value(expr.a, ctx), self._expr_value(expr.b, ctx))
        if isinstance(expr, Product):
            return F.mul(self._expr_value(expr.a, ctx), self._expr_value(expr.b, ctx))
        if isinstance(expr, Scaled):
            s = F.broadcast_scalar(Fr.encode_scalar(expr.scalar), ())
            return F.mul(self._expr_value(expr.expr, ctx),
                         s.reshape(N_LIMBS, 1))
        raise TypeError(f"unknown expression node {type(expr)}")

    # ------------------------------------------------------------------
    def _build(self, advice_coeff, instance_coeff, zs_coeff, beta, gamma, y):
        pk = self.pk
        cs = pk.vk.cs
        domain = pk.vk.domain
        ext_n = domain.extended_n

        def extend_batch(coeffs):
            # (16, C, n) -> (16, C, ext_n)
            if coeffs.shape[1] == 0:
                return jnp.zeros((N_LIMBS, 0, ext_n), jnp.uint32)
            zp = jnp.asarray(domain._zeta_pattern_n)[:, None, :]
            shifted = F.mul(coeffs, zp)
            padded = jnp.zeros((N_LIMBS, coeffs.shape[1], ext_n), jnp.uint32)
            padded = padded.at[:, :, : domain.n].set(shifted)
            return domain.ntt_ext.forward_traced(padded)

        ctx = {
            "advice": extend_batch(advice_coeff),
            "instance": extend_batch(instance_coeff),
            "fixed": pk.fixed_extended,
        }
        zs_ext = extend_batch(zs_coeff) if zs_coeff.shape[1] else None

        ymul = lambda v, t: F.add(F.mul(v, y[:, None]), t)  # noqa: E731
        value = jnp.zeros((N_LIMBS, ext_n), jnp.uint32)

        # gates
        for gate in cs.gates:
            for poly in gate.polys:
                value = ymul(value, self._expr_value(poly, ctx))

        # permutation terms (evaluation.rs:1004-1086)
        columns = cs.permutation.columns
        if columns:
            num_sets = zs_ext.shape[1]
            chunk_len = cs.degree() - 2
            bf = cs.blinding_factors()
            l0 = pk.l0_extended
            l_last = pk.l_last_extended
            l_active = pk.l_active_extended
            one = F.broadcast_scalar(Fr.r_np, (ext_n,))
            coset_x = jnp.asarray(self._coset_x_np)

            z = [zs_ext[:, i, :] for i in range(num_sets)]
            z_next = [jnp.roll(zi, -self.rot_scale, axis=-1) for zi in z]
            z_lastrot = [jnp.roll(zi, (bf + 1) * self.rot_scale, axis=-1) for zi in z]

            value = ymul(value, F.mul(F.sub(one, z[0]), l0))
            value = ymul(value, F.mul(F.sub(F.mul(z[-1], z[-1]), z[-1]), l_last))
            for i in range(1, num_sets):
                value = ymul(value, F.mul(F.sub(z[i], z_lastrot[i - 1]), l0))

            def col_ext(column):
                return {
                    "advice": ctx["advice"], "fixed": ctx["fixed"],
                    "instance": ctx["instance"]}[column.ctype][:, column.index, :]

            beta_x = F.mul(beta[:, None], coset_x)   # beta * X on the coset
            for ci, start in enumerate(range(0, len(columns), chunk_len)):
                chunk = columns[start: start + chunk_len]
                left = z_next[ci]
                for j, col in enumerate(chunk):
                    sig = pk.permutation_pk.sigmas_extended[:, start + j, :]
                    term = F.add(F.add(col_ext(col), F.mul(beta[:, None], sig)),
                                 gamma[:, None])
                    left = F.mul(left, term)
                right = z[ci]
                for j, col in enumerate(chunk):
                    dpow = pow(perm_mod.DELTA, start + j, P)
                    dlimb = jnp.asarray(Fr.encode_scalar(dpow))
                    cur_delta = F.mul(beta_x, dlimb[:, None])
                    term = F.add(F.add(col_ext(col), cur_delta), gamma[:, None])
                    right = F.mul(right, term)
                value = ymul(value, F.mul(F.sub(left, right), l_active))

        return value

    # ------------------------------------------------------------------
    def evaluate_h(self, advice_coeff, instance_coeff, zs_coeff,
                   beta: int, gamma: int, y: int):
        """Returns h numerator on the extended coset (16, ext_n)."""
        if self._jit is None:
            self._jit = jax.jit(self._build)
        return self._jit(advice_coeff, instance_coeff, zs_coeff,
                         jnp.asarray(Fr.encode_scalar(beta)),
                         jnp.asarray(Fr.encode_scalar(gamma)),
                         jnp.asarray(Fr.encode_scalar(y)))
