"""Logup prover-side computation: compression, m(X), grand sums.

Mirrors /root/reference/halo2_proofs/src/plonk/logup/prover.rs:
  * theta-compression of inputs/table on device (Lagrange ctx)
  * m(X) fully on device: one 16-key stable sort over table+inputs, then
    prefix-sum segment counting (the reference sorts + binary-searches on
    CPU, prover.rs:117-179); equal table entries all map to their first
    occurrence
  * grand sums z via device batch inversion + blocked prefix sums
    (prover.rs:243-415), chunk chaining through last_z, u16 blinding on m
    and full-width blinding on z
"""

from __future__ import annotations

import jax
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


@maybe_jit
def _multiplicities_device(table_std, inputs_std):
    """Device m(X) core: one 16-key stable sort + prefix-sum segment counts.

    table_std: (16, u) STANDARD-form table limbs; inputs_std: (16, M) all
    input columns concatenated (standard form).  Returns (m_std (16, u)
    int counts as standard limbs, ok flag, max_count) — the TPU answer to
    the reference's parallel sort + binary search with memo cache
    (logup/prover.rs:117-179).

    Semantics match the host version: all hits of a value count at its
    FIRST table occurrence; any input value missing from the table flips
    the ok flag (checked by the caller on host)."""
    u = table_std.shape[-1]
    M = inputs_std.shape[-1]
    both = jnp.concatenate([table_std, inputs_std], axis=-1)  # (16, u+M)
    N = u + M
    iota = jnp.arange(N, dtype=jnp.int32)
    # ONE multi-key stable sort: limbs most-significant first, original
    # index as the carried value (stability keeps table rows, in original
    # order, ahead of inputs inside each equal-value run)
    keys = [both[i] for i in range(N_LIMBS - 1, -1, -1)]
    *sorted_keys, order = jax.lax.sort(
        keys + [iota], dimension=-1, is_stable=True, num_keys=N_LIMBS)
    sorted_limbs = jnp.stack(sorted_keys[::-1], axis=0)     # (16, N)

    is_input = (order >= u)
    csum = jnp.cumsum(is_input.astype(jnp.int32))            # inclusive
    neq = jnp.concatenate([
        jnp.ones((1,), bool),
        jnp.any(sorted_limbs[:, 1:] != sorted_limbs[:, :-1], axis=0)])
    # last index of each equal-value run, broadcast to every position in it
    last_of_run = jnp.concatenate([neq[1:], jnp.ones((1,), bool)])
    idx_if_last = jnp.where(last_of_run, iota, N)
    run_end = jax.lax.cummin(idx_if_last, axis=0, reverse=True)
    # count of inputs in the run, attributed to the run's FIRST position
    count = jnp.where(neq, jnp.take(csum, run_end) - csum, 0)
    # validity: every run must start at a table row
    ok = ~jnp.any(neq & is_input)
    max_count = jnp.max(count)
    # back to original table order: inverse permutation via one more sort
    inv = jnp.argsort(order)                                  # (N,)
    m_counts = jnp.take(count, inv[:u])                      # (u,) int32
    m_std = jnp.zeros((N_LIMBS, u), jnp.uint32)
    m_std = m_std.at[0].set((m_counts & 0xFFFF).astype(jnp.uint32))
    m_std = m_std.at[1].set((m_counts >> 16).astype(jnp.uint32))
    return m_std, ok, max_count


def multiplicities(table_dev, input_devs, usable_rows: int, rng, bf: int):
    """m(X): count input hits against the table (first-match representative
    row), fully on device.  Returns (m_lagrange (16, n) Montgomery with u16
    blinding tail, m_max_bits)."""
    n = table_dev.shape[-1]
    table_std = Fr.from_mont(table_dev[:, :usable_rows])
    inputs_std = Fr.from_mont(
        jnp.concatenate([inp[:, :usable_rows] for inp in input_devs], axis=-1))
    m_std, ok, max_count = _multiplicities_device(table_std, inputs_std)
    if not bool(np.asarray(ok)):
        raise ValueError("lookup input value not present in table")
    m_max_bits = max(int(np.asarray(max_count)).bit_length(), 1)
    # blinding tail (u16 randoms, prover.rs:208-224) appended in standard
    # form, then ONE device to_mont pass for the whole column
    tail = np.zeros((N_LIMBS, n - usable_rows), np.uint32)
    tail[0] = [rng.randrange(1 << 16) for _ in range(n - usable_rows)]
    full_std = jnp.concatenate([m_std, jnp.asarray(tail)], axis=-1)
    return Fr.to_mont(full_std), m_max_bits


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
