"""Shared device-side Expression evaluation over column stacks.

Used by the h-Evaluator (extended domain) and the lookup/shuffle compressors
(Lagrange domain). The reference equivalents are `evaluate`/
`evaluate_with_theta` (/root/reference/halo2_proofs/src/plonk/evaluation.rs:
2012-2398) and the ProveExpression GPU walker; here expressions trace
straight into the enclosing XLA program and rotations are rolls.
"""

from __future__ import annotations

import jax.numpy as jnp

from halo2_tpu.fields.bn254 import Fr
from halo2_tpu.fields.limbs import N_LIMBS
from halo2_tpu.plonk.circuit import (
    AdviceQuery, Constant, FixedQuery, InstanceQuery, Negated, Product,
    Scaled, Sum,
)

F = Fr.raw
P = Fr.p


class ExprCtx:
    """Column stacks (16, C, length) + rotation scale for one domain.

    `roll` rotates a (16, L) array left by `shift` rows in the GLOBAL
    domain order — the default is a local jnp.roll; the sharded evaluator
    injects a ppermute-aware version (length is then the LOCAL shard
    length while rotations still mean global rotation)."""

    def __init__(self, advice, fixed, instance, rot_scale: int, length: int,
                 roll=None):
        self.advice = advice
        self.fixed = fixed
        self.instance = instance
        self.rot_scale = rot_scale
        self.length = length
        self.roll = roll or (lambda col, shift:
                             jnp.roll(col, -shift, axis=-1))


def eval_expr(expr, ctx: ExprCtx):
    if isinstance(expr, Constant):
        return F.broadcast_scalar(Fr.encode_scalar(expr.value), (ctx.length,))
    if isinstance(expr, (FixedQuery, AdviceQuery, InstanceQuery)):
        stack = {FixedQuery: ctx.fixed, AdviceQuery: ctx.advice,
                 InstanceQuery: ctx.instance}[type(expr)]
        col = stack[:, expr.column_index, :]
        if expr.rotation:
            col = ctx.roll(col, expr.rotation * ctx.rot_scale)
        return col
    if isinstance(expr, Negated):
        return F.neg(eval_expr(expr.expr, ctx))
    if isinstance(expr, Sum):
        return F.add(eval_expr(expr.a, ctx), eval_expr(expr.b, ctx))
    if isinstance(expr, Product):
        return F.mul(eval_expr(expr.a, ctx), eval_expr(expr.b, ctx))
    if isinstance(expr, Scaled):
        s = Fr.encode_scalar(expr.scalar)
        return F.mul(eval_expr(expr.expr, ctx), jnp.asarray(s)[:, None])
    raise TypeError(f"unknown expression node {type(expr)}")


def compress_exprs(exprs, ctx: ExprCtx, theta):
    """theta-fold: acc = acc * theta + eval (first expr highest power)."""
    acc = None
    for e in exprs:
        v = eval_expr(e, ctx)
        acc = v if acc is None else F.add(F.mul(acc, theta[:, None]), v)
    return acc
