"""Shuffle prover-side computation: compression and grand products.

Mirrors /root/reference/halo2_proofs/src/plonk/shuffle/prover.rs: one grand
product per group with member challenges beta^1, beta^2, ...; z via device
batch inversion of the shuffle-side product + blocked prefix-product scan.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from halo2_tpu.fields.bn254 import Fr
from halo2_tpu.fields.limbs import N_LIMBS
from halo2_tpu.plonk.expr_eval import ExprCtx, compress_exprs
from halo2_tpu.poly.arith import eval_poly
from halo2_tpu.utils.jitutil import maybe_jit

import os

F = Fr.raw
P = Fr.p
_SANITY = os.environ.get("HALO2_TPU_SANITY_CHECKS", "") == "1"


def compress(group, lag_ctx: ExprCtx, theta):
    """Returns (input_cols list, shuffle_cols list), each (16, n)."""
    inputs = [compress_exprs(u.input_expressions, lag_ctx, theta)
              for u in group.units]
    shuffles = [compress_exprs(u.shuffle_expressions, lag_ctx, theta)
                for u in group.units]
    return inputs, shuffles


@maybe_jit
def _product_ratio(inputs, shuffles, beta):
    """prod_i (a_i + beta^{i+1}) / prod_i (s_i + beta^{i+1}), (16, n)."""
    chal = beta
    num, den = None, None
    for i in range(inputs.shape[1]):
        a = F.add(inputs[:, i, :], chal[:, None])
        s = F.add(shuffles[:, i, :], chal[:, None])
        num = a if num is None else F.mul(num, a)
        den = s if den is None else F.mul(den, s)
        chal = F.mul(chal, beta)
    return F.mul(num, F.batch_inverse(den))


@maybe_jit
def _z_from_ratio(ratio):
    """z[0] = 1; z[i+1] = z[i] * ratio[i]."""
    pref = F.prefix_mul(ratio)
    n = ratio.shape[-1]
    one = F.broadcast_scalar(Fr.r_np, (1,))
    return jnp.concatenate([one, pref[:, : n - 1]], axis=1)


def commit_product(domain, cs, input_cols, shuffle_cols, beta: int, rng):
    """Grand product z for one shuffle group (Lagrange, blinded)."""
    n = domain.n
    bf = cs.blinding_factors()
    beta_l = jnp.asarray(Fr.encode_scalar(beta))
    ratio = _product_ratio(jnp.stack(input_cols, axis=1),
                           jnp.stack(shuffle_cols, axis=1), beta_l)
    z = _z_from_ratio(ratio)
    if _SANITY:
        # grand product must close to 1 at the last active row
        # (shuffle/prover.rs:159-194 sanity-checks feature)
        u = n - (bf + 1)
        zu = Fr.decode_scalar(np.asarray(z[:, u]))
        assert zu == 1, f"shuffle grand product != 1: {zu}"
    blinds = [rng.randrange(P) for _ in range(bf)]
    z = z.at[:, n - bf:].set(jnp.asarray(Fr.encode(blinds)))
    return z


def evaluate(domain, z_coeff, x: int):
    """z(x), z(wx) in write order (shuffle/prover.rs:200-215)."""
    return [eval_poly(z_coeff, x), eval_poly(z_coeff, domain.rotate_omega(x, 1))]
