"""Logup prover-side computation: compression, m(X), grand sums.

Mirrors /root/reference/halo2_proofs/src/plonk/logup/prover.rs:
  * theta-compression of inputs/table on device (Lagrange ctx)
  * m(X) by host-side exact counting over the decoded compressed values
    (the reference sorts + binary-searches on CPU too, prover.rs:117-179);
    equal table entries all map to one representative row
  * grand sums z via device batch inversion + blocked prefix sums
    (prover.rs:243-415), chunk chaining through last_z, u16 blinding on m
    and full-width blinding on z
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from halo2_tpu.fields.bn254 import Fr
from halo2_tpu.fields.limbs import N_LIMBS, limbs_to_ints
from halo2_tpu.plonk.expr_eval import ExprCtx, compress_exprs
from halo2_tpu.poly.arith import eval_poly, prefix_sum
from halo2_tpu.utils.jitutil import maybe_jit

import os

F = Fr.raw
P = Fr.p
_SANITY = os.environ.get("HALO2_TPU_SANITY_CHECKS", "") == "1"


def compress(argument, lag_ctx: ExprCtx, theta):
    """Returns (table (16, n), input_sets: list of list of (16, n))."""
    table = compress_exprs(argument.table_expressions, lag_ctx, theta)
    sets = [[compress_exprs(inputs, lag_ctx, theta) for inputs in s]
            for s in argument.input_expressions_sets]
    return table, sets


def multiplicities(table_dev, input_devs, usable_rows: int, rng, bf: int):
    """Host-exact m(X): count input hits against the table (first-match
    representative row).  Returns (m_lagrange (16, n) with u16 blinding
    tail, m_max_bits)."""
    n = table_dev.shape[-1]
    table_vals = limbs_to_ints(np.asarray(Fr.from_mont(table_dev)))[:usable_rows]
    first_idx: dict[int, int] = {}
    for i, t in enumerate(table_vals):
        if t not in first_idx:
            first_idx[t] = i
    counts = [0] * n
    for inp in input_devs:
        vals = limbs_to_ints(np.asarray(Fr.from_mont(inp)))[:usable_rows]
        for v in vals:
            idx = first_idx.get(v)
            if idx is None:
                raise ValueError("lookup input value not present in table")
            counts[idx] += 1
    m_max_bits = max((c.bit_length() for c in counts), default=1)
    for r in range(usable_rows, n):
        counts[r] = rng.randrange(1 << 16)
    return jnp.asarray(Fr.encode(counts)), max(m_max_bits, 1)


@maybe_jit
def _grand_sum_base(inputs, table, m, beta):
    """inputs: (16, C, n); returns gs = sum_i 1/(f_i+b) - m/(t+b), (16, n)."""
    b = beta[:, None]
    n = table.shape[-1]
    C = inputs.shape[1]
    phi = F.add(inputs, beta[:, None, None])            # (16, C, n)
    tau = F.add(table, b)
    stacked = jnp.concatenate([phi.reshape(N_LIMBS, C * n), tau], axis=-1)
    inv = F.batch_inverse(stacked)
    phi_inv = inv[:, : C * n].reshape(N_LIMBS, C, n)
    tau_inv = inv[:, C * n:]
    gs = phi_inv[:, 0, :]
    for i in range(1, C):
        gs = F.add(gs, phi_inv[:, i, :])
    return F.sub(gs, F.mul(m, tau_inv))


@maybe_jit
def _grand_sum_extra(inputs, beta):
    n = inputs.shape[-1]
    C = inputs.shape[1]
    phi = F.add(inputs, beta[:, None, None])
    inv = F.batch_inverse(phi.reshape(N_LIMBS, C * n)).reshape(N_LIMBS, C, n)
    gs = inv[:, 0, :]
    for i in range(1, C):
        gs = F.add(gs, inv[:, i, :])
    return gs


@maybe_jit
def _z_from_gs(gs, last_z):
    """z[0] = last_z; z[i] = last_z + sum_{k<i} gs[k]."""
    pref = prefix_sum(gs)
    n = gs.shape[-1]
    excl = jnp.concatenate(
        [jnp.zeros((N_LIMBS, 1), jnp.uint32), pref[:, : n - 1]], axis=1)
    return F.add(excl, last_z[:, None])


def commit_zs(domain, cs, table, input_sets, m_lagrange, beta: int, rng):
    """Grand-sum columns for one lookup argument (Lagrange, blinded).
    Returns list of (16, n) z columns."""
    n = domain.n
    bf = cs.blinding_factors()
    u = n - (bf + 1)
    beta_l = jnp.asarray(Fr.encode_scalar(beta))
    zs = []
    last_z = jnp.zeros((N_LIMBS,), jnp.uint32)
    for si, s in enumerate(input_sets):
        inputs = jnp.stack(s, axis=1)
        if si == 0:
            gs = _grand_sum_base(inputs, table, m_lagrange, beta_l)
        else:
            gs = _grand_sum_extra(inputs, beta_l)
        z = _z_from_gs(gs, last_z)
        last_z = z[:, u]
        blinds = [rng.randrange(P) for _ in range(bf)]
        z = z.at[:, n - bf:].set(jnp.asarray(Fr.encode(blinds)))
        zs.append(z)
    if _SANITY:
        # grand sum must telescope to zero across all sets
        # (logup/prover.rs:348-412 sanity-checks feature)
        final = Fr.decode_scalar(np.asarray(last_z))
        assert final == 0, f"logup grand sum != 0: {final}"
    return zs


def evaluate(domain, cs, m_coeff, z_coeffs, x: int):
    """Eval scalars in transcript write order (logup/prover.rs:419-447):
    m at x; per z: z(x), z(wx), [z(w^last x) except last]."""
    bf = cs.blinding_factors()
    x_next = domain.rotate_omega(x, 1)
    x_last = domain.rotate_omega(x, -(bf + 1))
    out = [eval_poly(m_coeff, x)]
    for i, zc in enumerate(z_coeffs):
        out.append(eval_poly(zc, x))
        out.append(eval_poly(zc, x_next))
        if i + 1 < len(z_coeffs):
            out.append(eval_poly(zc, x_last))
    return out
