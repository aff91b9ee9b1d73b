"""h(X) evaluation engine — the quotient-numerator on the extended coset.

TPU re-design of the reference's dominant phase
(/root/reference/halo2_proofs/src/plonk/evaluation.rs:777-1226 CPU,
evaluation_gpu.rs GPU): instead of compiling per-GPU ProveExpression trees
with a Belady buffer cache, the gate programs + permutation/logup/shuffle
terms are traced ONCE into a single jitted XLA program over the extended
domain:
  * every referenced column's extended-coset form is produced by the batched
    four-step NTT (one call for all columns of a kind) — the "materialize
    each unit exactly once" discipline the GPU path's unit cache
    approximates (evaluation_gpu.rs:327-468) falls out naturally;
  * rotations are `jnp.roll` by rot << (ext_k - k) (get_rotation_idx,
    evaluation.rs:40-42);
  * XLA fuses the elementwise constraint chains, replacing the reference's
    hand-scheduled eval_* CUDA kernels (SURVEY.md §2.9).

The y-fold order matches the verifier exactly: gates, then permutation
terms, then lookups (evaluation.rs:1088-1184 order), then shuffles
(evaluation.rs:1186-1222) — verifier.rs:300-384.

The constraint body `h_fold_body` is shared with the multi-chip sharded
evaluator (plonk/evaluator_sharded.py), which swaps in distributed
extension/rotation primitives under shard_map.
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
from halo2_tpu.plonk.expr_eval import ExprCtx, compress_exprs, eval_expr

F = Fr.raw
P = Fr.p


def h_fold_body(cs, ctx, *, perm_z, lookup_m, lookup_z, shuffle_z,
                l0, l_last, l_active, coset_x, sigmas, one,
                roll_next, roll_last,
                theta, beta, gamma, y, value):
    """The full constraint y-fold, domain-layout-agnostic.

    All column arrays are (16, C, L) for some local length L (the full
    extended domain single-chip, or one shard of it); `roll_next`/
    `roll_last` implement the two rotation offsets; expression rotations go
    through ctx (eval_expr uses ctx.roll).  Order matches verifier.rs.
    """
    ymul = lambda v, t: F.add(F.mul(v, y[:, None]), t)  # noqa: E731
    b = beta[:, None]
    g = gamma[:, None]

    # ---- gates -----------------------------------------------------
    for gate in cs.gates:
        for poly in gate.polys:
            value = ymul(value, eval_expr(poly, ctx))

    # ---- permutation (evaluation.rs:1004-1086) ---------------------
    columns = cs.permutation.columns
    if columns:
        num_sets = perm_z.shape[1]
        chunk_len = cs.degree() - 2
        z = [perm_z[:, i, :] for i in range(num_sets)]
        z_next = [roll_next(zi) for zi in z]
        z_lastrot = [roll_last(zi) for zi in z]

        value = ymul(value, F.mul(F.sub(one, z[0]), l0))
        value = ymul(value, F.mul(F.sub(F.mul(z[-1], z[-1]), z[-1]), l_last))
        for i in range(1, num_sets):
            value = ymul(value, F.mul(F.sub(z[i], z_lastrot[i - 1]), l0))

        def col_ext(column):
            return {"advice": ctx.advice, "fixed": ctx.fixed,
                    "instance": ctx.instance}[column.ctype][:, column.index, :]

        beta_x = F.mul(b, coset_x)
        for ci, start in enumerate(range(0, len(columns), chunk_len)):
            chunk = columns[start: start + chunk_len]
            left = z_next[ci]
            for j, col in enumerate(chunk):
                sig = sigmas(start + j)
                left = F.mul(left, F.add(F.add(col_ext(col), F.mul(b, sig)), g))
            right = z[ci]
            for j, col in enumerate(chunk):
                dlimb = jnp.asarray(Fr.encode_scalar(
                    pow(perm_mod.DELTA, start + j, P)))
                cur_delta = F.mul(beta_x, dlimb[:, None])
                right = F.mul(right, F.add(F.add(col_ext(col), cur_delta), g))
            value = ymul(value, F.mul(F.sub(left, right), l_active))

    # ---- logup lookups (evaluation.rs:1088-1184) -------------------
    z_off = 0
    for li, lookup in enumerate(cs.lookups):
        sets = lookup.input_expressions_sets
        sets_len = len(sets)
        zs = [lookup_z[:, z_off + i, :] for i in range(sets_len)]
        z_off += sets_len
        m_ext = lookup_m[:, li, :]
        tau = F.add(compress_exprs(lookup.table_expressions, ctx, theta), b)

        def phi_products(input_set):
            phis = [F.add(compress_exprs(inputs, ctx, theta), b)
                    for inputs in input_set]
            prod = phis[0]
            for p_ in phis[1:]:
                prod = F.mul(prod, p_)
            # sum_i prod_{j != i} phi_j
            psum = None
            for i in range(len(phis)):
                term = None
                for j, p_ in enumerate(phis):
                    if j == i:
                        continue
                    term = p_ if term is None else F.mul(term, p_)
                if term is None:
                    term = one
                psum = term if psum is None else F.add(psum, term)
            return prod, psum

        # l_0 * z_first ; l_last * z_last
        value = ymul(value, F.mul(zs[0], l0))
        value = ymul(value, F.mul(zs[-1], l_last))
        # base set: ((z(gX)-z(X)) * tau + m) * prod(phi) - tau * sum_prods
        prod0, psum0 = phi_products(sets[0])
        dz = F.sub(roll_next(zs[0]), zs[0])
        term = F.sub(F.mul(F.add(F.mul(dz, tau), m_ext), prod0),
                     F.mul(tau, psum0))
        value = ymul(value, F.mul(term, l_active))
        # chaining
        for i in range(1, sets_len):
            value = ymul(value, F.mul(F.sub(zs[i], roll_last(zs[i - 1])), l0))
        # extra sets
        for i in range(1, sets_len):
            prod_i, psum_i = phi_products(sets[i])
            dz = F.sub(roll_next(zs[i]), zs[i])
            term = F.sub(F.mul(dz, prod_i), psum_i)
            value = ymul(value, F.mul(term, l_active))

    # ---- shuffles (evaluation.rs:1186-1222) ------------------------
    for gi, group in enumerate(cs.shuffles):
        z = shuffle_z[:, gi, :]
        # challenges beta^(i+1) per unit
        input_prod, shuf_prod = None, None
        chal = b
        for unit in group.units:
            a_c = F.add(compress_exprs(unit.input_expressions, ctx, theta), chal)
            s_c = F.add(compress_exprs(unit.shuffle_expressions, ctx, theta), chal)
            input_prod = a_c if input_prod is None else F.mul(input_prod, a_c)
            shuf_prod = s_c if shuf_prod is None else F.mul(shuf_prod, s_c)
            chal = F.mul(chal, b)
        value = ymul(value, F.mul(F.sub(one, z), l0))
        value = ymul(value, F.mul(F.sub(F.mul(z, z), z), l_last))
        term = F.sub(F.mul(roll_next(z), shuf_prod), F.mul(z, input_prod))
        value = ymul(value, F.mul(term, l_active))

    return value


def coset_x_tables_np(domain):
    """coset_x[i] = zeta * extended_omega^i factored as outer[a] * inner[b]
    with i = a * n2 + b: two sqrt(ext_n)-sized host tables instead of a
    full (16, ext_n) table baked into the program (268 MB at k=20/deg 5)."""
    ext_n = domain.extended_n
    n2 = 1 << (domain.extended_k // 2)
    n1 = ext_n // n2
    w = domain.extended_omega
    outer = powers_table_np(pow(w, n2, P), n1, P,
                            lambda v: Fr.to_mont_int(v * domain.g_coset % P))
    inner = powers_table_np(w, n2, P, Fr.to_mont_int)
    return outer, inner, n1, n2


class Evaluator:
    """Compiled h(X) program for one proving key (single chip).

    Memory discipline: the pk stores only coeff-form polys; every extended
    coset (advice, fixed, sigma, z, l0/l_last/l_blind) is produced
    TRANSIENTLY inside this jitted program by the batched coset-extension
    NTT — the reference cuda path's do_extended_fft-per-unit behavior
    (plonk.rs:226-243, evaluation_gpu.rs:863-911).  pk arrays enter as jit
    ARGUMENTS, not closure constants, so XLA never duplicates them into the
    executable."""

    def __init__(self, pk):
        self.pk = pk
        domain = pk.vk.domain
        self.rot_scale = 1 << (domain.extended_k - domain.k)
        self._coset_tabs = coset_x_tables_np(domain)
        self._jit = None

    # ------------------------------------------------------------------
    def _build(self, advice_coeff, instance_coeff, perm_zs_coeff,
               lookup_ms_coeff, lookup_zs_coeff, shuffle_zs_coeff,
               fixed_coeff, sigmas_coeff, l_coeffs, coset_outer, coset_inner,
               ext_mid, theta, beta, gamma, y, value_init):
        pk = self.pk
        cs = pk.vk.cs
        domain = pk.vk.domain
        ext_n = domain.extended_n

        def extend_batch(coeffs):
            # (16, C, n) -> (16, C, ext_n); ext_mid enters as a jit ARG —
            # as an HLO constant the O(ext_n) table blows the axon
            # remote-compile request limit at k=20 (NTT.mid_dev)
            if coeffs.shape[1] == 0:
                return jnp.zeros((N_LIMBS, 0, ext_n), jnp.uint32)
            zp = domain._zeta_tile_traced(domain.g_coset,
                                          domain.n)[:, None, :]
            shifted = F.mul(coeffs, zp)
            padded = jnp.zeros((N_LIMBS, coeffs.shape[1], ext_n), jnp.uint32)
            padded = padded.at[:, :, : domain.n].set(shifted)
            return domain.ntt_ext.forward_traced(padded, mid=ext_mid)

        ctx = ExprCtx(
            advice=extend_batch(advice_coeff),
            fixed=extend_batch(fixed_coeff),
            instance=extend_batch(instance_coeff),
            rot_scale=self.rot_scale,
            length=ext_n,
        )
        bf = cs.blinding_factors()

        l_ext = extend_batch(l_coeffs)          # (16, 3, ext_n)
        l0, l_last, l_blind = (l_ext[:, i, :] for i in range(3))
        one = F.broadcast_scalar(Fr.r_np, (ext_n,))
        l_active = F.sub(one, F.add(l_last, l_blind))
        sigmas_ext = extend_batch(sigmas_coeff)
        coset_x = F.mul(coset_outer[:, :, None],
                        coset_inner[:, None, :]).reshape(N_LIMBS, ext_n)

        def roll_next(a):
            return jnp.roll(a, -self.rot_scale, axis=-1)

        def roll_last(a):
            return jnp.roll(a, (bf + 1) * self.rot_scale, axis=-1)

        return h_fold_body(
            cs, ctx,
            perm_z=extend_batch(perm_zs_coeff),
            lookup_m=extend_batch(lookup_ms_coeff),
            lookup_z=extend_batch(lookup_zs_coeff),
            shuffle_z=extend_batch(shuffle_zs_coeff),
            l0=l0, l_last=l_last, l_active=l_active,
            coset_x=coset_x,
            sigmas=lambda j: sigmas_ext[:, j, :],
            one=one,
            roll_next=roll_next, roll_last=roll_last,
            theta=theta, beta=beta, gamma=gamma, y=y, value=value_init)

    # ------------------------------------------------------------------
    def evaluate_h(self, advice_coeff, instance_coeff, perm_zs_coeff,
                   lookup_ms_coeff, lookup_zs_coeff, shuffle_zs_coeff,
                   theta: int, beta: int, gamma: int, y: int,
                   value_init=None):
        """Returns h numerator on the extended coset (16, ext_n).
        value_init chains the y-fold across multiple circuit instances
        (batch proofs: proof i+1 continues from proof i's fold)."""
        pk = self.pk
        if self._jit is None:
            self._jit = jax.jit(self._build)
        if value_init is None:
            value_init = jnp.zeros(
                (N_LIMBS, pk.vk.domain.extended_n), jnp.uint32)
        outer, inner, _, _ = self._coset_tabs
        l_coeffs = jnp.stack(
            [pk.l0_coeff, pk.l_last_coeff, pk.l_blind_coeff], axis=1)
        return self._jit(advice_coeff, instance_coeff, perm_zs_coeff,
                         lookup_ms_coeff, lookup_zs_coeff, shuffle_zs_coeff,
                         pk.fixed_coeff, pk.permutation_pk.sigmas_coeff,
                         l_coeffs, jnp.asarray(outer), jnp.asarray(inner),
                         pk.vk.domain.ntt_ext.mid_dev(False),
                         jnp.asarray(Fr.encode_scalar(theta)),
                         jnp.asarray(Fr.encode_scalar(beta)),
                         jnp.asarray(Fr.encode_scalar(gamma)),
                         jnp.asarray(Fr.encode_scalar(y)), value_init)
