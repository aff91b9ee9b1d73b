"""SHPLONK (BDFG20) multiopen.

Mirrors /root/reference/halo2_proofs/src/poly/multiopen/shplonk.rs +
shplonk/{prover,verifier}.rs:
  * commitments grouped by their ROTATION SET; the super point set is the
    union of all opening points (shplonk.rs:57-153)
  * prover: per-set low-degree equivalents (host Lagrange interpolation of
    the evals), numerators folded by y, divided by the set vanishing poly
    (iterated device Kate division), folded by v -> h1; then the
    linearisation poly at u and the final witness h2
    (shplonk/prover.rs:78-234)
  * verifier: two-channel PairMSM with z-difference normalization
    (shplonk/verifier.rs:22-110)

Query identity is object identity (`id`) of the poly / commitment — callers
must reuse one object per logical commitment (the reference uses pointer
equality the same way).
"""

from __future__ import annotations

import jax.numpy as jnp

from halo2_tpu.curves import g1, host
from halo2_tpu.fields.bn254 import Fr
from halo2_tpu.msm import msm
from halo2_tpu.multiopen.common import HostMSM, PairMSM
from halo2_tpu.poly.arith import eval_poly, kate_division
from halo2_tpu.utils.jitutil import maybe_jit

P = Fr.p
F = Fr.raw


def _lagrange_interpolate(points, evals):
    """Host exact interpolation; returns coeff list of len(points)."""
    if len(points) == 1:
        return [evals[0] % P]
    coeffs = [0] * len(points)
    for i, (xi, yi) in enumerate(zip(points, evals)):
        denom = 1
        for j, xj in enumerate(points):
            if j != i:
                denom = denom * (xi - xj) % P
        inv = pow(denom, P - 2, P)
        # numerator poly prod_{j != i} (X - xj)
        num = [1]
        for j, xj in enumerate(points):
            if j != i:
                num = _poly_mul_linear(num, (-xj) % P)
        scale = yi * inv % P
        for k, c in enumerate(num):
            coeffs[k] = (coeffs[k] + c * scale) % P
    return coeffs


def _poly_mul_linear(poly, c0):
    """poly(X) * (X + c0) over host ints."""
    out = [0] * (len(poly) + 1)
    for i, c in enumerate(poly):
        out[i] = (out[i] + c * c0) % P
        out[i + 1] = (out[i + 1] + c) % P
    return out


def _eval_vanishing(roots, u):
    acc = 1
    for r in roots:
        acc = acc * ((u - r) % P) % P
    return acc


def _construct_intermediate_sets(queries):
    """Returns (rotation_sets, super_point_set); each rotation set is
    {points: [..], commitments: [(obj, [evals])]}.

    Ordering mirrors the reference: super points by ascending rotation
    (BTreeMap); rotation sets ordered by their sorted rotation tuple."""
    rotation_point = {}
    for q in queries:
        if q.rotation in rotation_point:
            assert rotation_point[q.rotation] == q.point
        else:
            rotation_point[q.rotation] = q.point
    super_point_set = [rotation_point[r] for r in sorted(rotation_point)]

    com_rotations = []  # [(key, obj, set(rotations))] in first-appearance order
    by_key = {}
    for q in queries:
        key = id(q.commitment) if hasattr(q, "commitment") else id(q.poly)
        if key in by_key:
            by_key[key][2].add(q.rotation)
        else:
            entry = (key, q, {q.rotation})
            by_key[key] = entry
            com_rotations.append(entry)

    set_map = {}  # sorted-rotation-tuple -> [query objects]
    for key, q, rots in com_rotations:
        t = tuple(sorted(rots))
        set_map.setdefault(t, []).append(q)

    rotation_sets = []
    for t in sorted(set_map):
        reps = set_map[t]
        points = [rotation_point[r] for r in t]
        rotation_sets.append({"rotations": t, "points": points,
                              "queries": reps})
    return rotation_sets, super_point_set


# ---------------------------------------------------------------------------
# Prover
# ---------------------------------------------------------------------------

@maybe_jit
def _fold_sub(polys, sub_coeffs, chal):
    """fold_y over (P_j - R_j): polys (16, Q, n); sub_coeffs (16, Q, n)."""
    acc = F.sub(polys[:, 0, :], sub_coeffs[:, 0, :])
    for i in range(1, polys.shape[1]):
        acc = F.add(F.mul(acc, chal[:, None]),
                    F.sub(polys[:, i, :], sub_coeffs[:, i, :]))
    return acc


def _commit_coeff(params, coeffs):
    proj = params.commit(coeffs)
    aff = g1.to_affine(tuple(c[:, None] for c in proj))
    return g1.decode_points(jnp.stack(aff))[0]


def create_proof(params, transcript, queries):
    n = params.n
    y = transcript.squeeze_challenge()
    y_l = jnp.asarray(Fr.encode_scalar(y))

    # evals per (poly, rotation): from the queries' points via device eval
    eval_cache = {}

    def get_eval(q_poly, point):
        key = (id(q_poly), point)
        if key not in eval_cache:
            eval_cache[key] = eval_poly(q_poly, point)
        return eval_cache[key]

    rotation_sets, super_point_set = _construct_intermediate_sets(queries)
    v = transcript.squeeze_challenge()

    # quotient h1
    set_data = []
    for rs in rotation_sets:
        points = rs["points"]
        polys = jnp.stack([q.poly for q in rs["queries"]], axis=1)
        ldes, r_coeffs_list = [], []
        for q in rs["queries"]:
            evals = [get_eval(q.poly, pt) for pt in points]
            r_coeffs = _lagrange_interpolate(points, evals)
            r_coeffs_list.append(r_coeffs)
            ldes.append(jnp.asarray(Fr.encode(
                r_coeffs + [0] * (n - len(r_coeffs)))))
        ldes = jnp.stack(ldes, axis=1)
        n_x = _fold_sub(polys, ldes, y_l)
        for pt in points:
            n_x = kate_division(n_x, pt)
        set_data.append((rs, polys, r_coeffs_list, n_x))

    h_x = None
    v_l = jnp.asarray(Fr.encode_scalar(v))
    for _, _, _, q_x in set_data:
        h_x = q_x if h_x is None else Fr.add(Fr.mul(h_x, v_l[:, None]), q_x)
    transcript.write_point(_commit_coeff(params, h_x))
    u = transcript.squeeze_challenge()

    zt_eval = _eval_vanishing(super_point_set, u)

    l_x = None
    z_diffs = []
    for rs, polys, r_coeffs_list, _ in set_data:
        diffs = [pt for pt in super_point_set if pt not in rs["points"]]
        z_i = _eval_vanishing(diffs, u)
        z_diffs.append(z_i)
        # fold_y over (P_j - r_j(u))
        r_evals = [sum(c * pow(u, k, P) for k, c in enumerate(rc)) % P
                   for rc in r_coeffs_list]
        acc = None
        for qi in range(polys.shape[1]):
            term = Fr.sub(polys[:, qi, :],
                          jnp.asarray(Fr.encode([r_evals[qi]] + [0] * (n - 1))))
            acc = term if acc is None else Fr.add(
                Fr.mul(acc, y_l[:, None]), term)
        contrib = Fr.mul(acc, jnp.asarray(Fr.encode_scalar(z_i))[:, None])
        l_x = contrib if l_x is None else Fr.add(
            Fr.mul(l_x, v_l[:, None]), contrib)

    l_x = Fr.sub(l_x, Fr.mul(h_x, jnp.asarray(Fr.encode_scalar(zt_eval))[:, None]))
    # sanity: l(u) == 0 (shplonk/prover.rs:211-215 asserts unconditionally)
    assert eval_poly(l_x, u) == 0, "shplonk linearisation sanity failed"
    h2 = kate_division(l_x, u)
    z0_diff_inv = pow(z_diffs[0], P - 2, P)
    h2 = Fr.mul(h2, jnp.asarray(Fr.encode_scalar(z0_diff_inv))[:, None])
    transcript.write_point(_commit_coeff(params, h2))


# ---------------------------------------------------------------------------
# Verifier
# ---------------------------------------------------------------------------

def verify_proof(params_verifier, transcript, queries) -> PairMSM:
    rotation_sets, super_point_set = _construct_intermediate_sets(queries)
    # collect evals per commitment per rotation
    eval_map = {}
    for q in queries:
        eval_map[(id(q.commitment), q.rotation)] = q.eval

    y = transcript.squeeze_challenge()
    v = transcript.squeeze_challenge()
    h1 = transcript.read_point()
    u = transcript.squeeze_challenge()
    h2 = transcript.read_point()

    z_0 = 0
    z_0_diff_inverse = 0
    outer_terms = []  # (scalar, base) accumulated manually with v powers
    r_outer_acc = 0
    outer_msm = HostMSM()
    for i, rs in enumerate(rotation_sets):
        diffs = [pt for pt in super_point_set if pt not in rs["points"]]
        z_diff_i = _eval_vanishing(diffs, u)
        if i == 0:
            z_0 = _eval_vanishing(rs["points"], u)
            z_0_diff_inverse = pow(z_diff_i, P - 2, P)
            z_diff_i = 1
        else:
            z_diff_i = z_diff_i * z_0_diff_inverse % P

        inner = HostMSM()
        r_inner_acc = 0
        for q in rs["queries"]:
            evals = [eval_map[(id(q.commitment), r)] for r in rs["rotations"]]
            r_x = _lagrange_interpolate(rs["points"], evals)
            r_eval = sum(c * pow(u, k, P) for k, c in enumerate(r_x)) % P
            r_inner_acc = (y * r_inner_acc + r_eval) % P
            if isinstance(q.commitment, HostMSM):
                inner.append_term(1, q.commitment.eval())
            else:
                inner.append_term(1, q.commitment)
        r_outer_acc = (v * r_outer_acc + r_inner_acc * z_diff_i) % P

        # combine inner with y powers then scale by z_diff_i
        m = len(inner.pairs)
        combined = HostMSM()
        for j, (s, b) in enumerate(inner.pairs):
            combined.append_term(pow(y, m - 1 - j, P) * z_diff_i % P, b)
        outer_terms.append(combined)

    for j, m_ in enumerate(outer_terms):
        m_.scale(pow(v, len(outer_terms) - 1 - j, P))
        outer_msm.add_msm(m_)
    outer_msm.append_term((-r_outer_acc) % P, params_verifier.g1)
    outer_msm.append_term((-z_0) % P, h1)
    outer_msm.append_term(u, h2)

    left = HostMSM()
    left.append_term(1, h2)
    right = HostMSM()
    right.add_msm(outer_msm)
    return PairMSM(left, right)
