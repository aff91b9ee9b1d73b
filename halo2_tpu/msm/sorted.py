"""Sort-based Pippenger bucket accumulation — the scatter-free MSM path.

XLA TPU scatter serializes per scattered element, which caps the
lane-private-bucket path (msm.py) at ~1ms per scan step.  This path removes
data-dependent placement entirely:

  per window:  sort points by digit (device argsort) ->
               blocked prefix-scan of point additions (one fused Pallas
               add per scan step, n total adds — the Pippenger optimum) ->
               bucket sums = differences of prefix values at bucket
               boundaries ->
               sum_b b*B_b = 255*E_255 - sum_{b<255} E_b  (Abel summation)

  windows are processed in groups that share one scan (group * block lanes
  per fused add).  No scatter, no index-dependent writes, any digit
  distribution (including the all-equal degenerate case) is handled.

This is the TPU answer to the reference's per-GPU bucket kernels
(`SingleMultiexpKernel::multiexp_bound`, SURVEY.md §2.9).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from halo2_tpu.curves import g1
from halo2_tpu.fields.bn254 import Fq, Fr
from halo2_tpu.fields.limbs import N_LIMBS

C_BITS = 8
NB = 1 << C_BITS


def _digits(scalars_std, num_windows: int):
    parts = []
    for w in range(num_windows):
        limb = scalars_std[w // 2]
        shift = 8 * (w % 2)
        parts.append(((limb >> shift) & 0xFF).astype(jnp.int32))
    return jnp.stack(parts)  # (W, n)


def _prefix_scan_group(px_s, py_s, block: int):
    """Sorted affine points (16, G, n) -> block-layout prefix sums.

    Layout: n = B*S with block b covering sorted[b*S:(b+1)*S] (contiguous).
    Scan over S steps, carry (3 coords of (16, G, B)).
    Returns (intra (3, S, 16, G, B) prefix-inside-block,
             block_excl (3, 16, G, B) exclusive block offsets)."""
    G = px_s.shape[1]
    n = px_s.shape[2]
    B = block
    S = n // B
    # (16, G, B, S) -> scan over S
    pxr = px_s.reshape(N_LIMBS, G, B, S).transpose(3, 0, 1, 2)
    pyr = py_s.reshape(N_LIMBS, G, B, S).transpose(3, 0, 1, 2)

    def step(carry, xs):
        pxt, pyt = xs
        nxt = g1.add_mixed(carry, (pxt, pyt))
        return nxt, nxt

    init = g1.identity((G, B))
    totals, intra = jax.lax.scan(step, init, (pxr, pyr))
    # exclusive block offsets: prefix over block totals along B (Hillis-Steele)
    bx, by, bz = totals
    log_b = B.bit_length() - 1
    lane = jnp.arange(B, dtype=jnp.int32)

    def hs_round(carry, shift):
        cx, cy, cz = carry
        idx = lane - shift
        valid = idx >= 0
        idx = jnp.where(valid, idx, 0)
        sx = jnp.take(cx, idx, axis=-1)
        sy = jnp.take(cy, idx, axis=-1)
        sz = jnp.take(cz, idx, axis=-1)
        ident = g1.identity(cz.shape[1:])
        s = g1.select(jnp.broadcast_to(valid, cz.shape[1:]), (sx, sy, sz), ident)
        return g1.add(carry, s), None

    shifts = jnp.asarray([1 << i for i in range(log_b)], jnp.int32)
    (ix, iy, iz), _ = jax.lax.scan(hs_round, (bx, by, bz), shifts)
    # inclusive -> exclusive: shift lanes right by one, identity at lane 0
    ident = g1.identity(iz.shape[1:])
    excl = tuple(jnp.where(
        (lane == 0), i0, jnp.roll(v, 1, axis=-1))
        for v, i0 in zip((ix, iy, iz), ident))
    return intra, excl


def _gather_boundary_prefix(intra, excl, ends, block: int, n: int):
    """Prefix point at sorted position e (may be -1 -> identity).

    intra: (3, S, 16, G, B); excl: 3 x (16, G, B); ends: (G, NB) int32
    positions.  position e -> block b = e // S, step s = e % S;
    prefix[e] = excl[b] + intra[s, b]."""
    S = n // block
    G = ends.shape[0]
    b_idx = jnp.clip(ends // S, 0, block - 1)
    s_idx = jnp.clip(ends % S, 0, S - 1)

    def gather_coord(intra_c, excl_c):
        # intra_c: (S, 16, G, B) -> pick [s_idx[g,j], :, g, b_idx[g,j]]
        # via flat take: index = ((s * 16 + l) * G + g) * B + b — use vmap-free
        # construction: first take along S, then along B.
        # (S, 16, G, B) --take S--> (16, G, NB, B)?  simpler with one flat gather:
        SS, L, GG, BB = intra_c.shape
        flat = intra_c.transpose(1, 0, 2, 3).reshape(L, SS * GG * BB)
        g_iota = jax.lax.broadcasted_iota(jnp.int32, (GG, NB), 0)
        fidx = (s_idx * GG + g_iota) * BB + b_idx     # (G, NB)
        picked = jnp.take(flat, fidx.reshape(-1), axis=1)
        picked = picked.reshape(L, GG, NB)
        eflat = excl_c.reshape(L, GG * BB)
        eidx = g_iota * BB + b_idx
        epick = jnp.take(eflat, eidx.reshape(-1), axis=1).reshape(L, GG, NB)
        return picked, epick

    coords = []
    for c in range(3):
        picked, epick = gather_coord(
            intra[c].transpose(0, 1, 2, 3), excl[c])
        coords.append((picked, epick))
    intra_pt = tuple(c[0] for c in coords)
    excl_pt = tuple(c[1] for c in coords)
    summed = g1.add(intra_pt, excl_pt)
    # positions < 0 mean "empty prefix" -> identity
    valid = (ends >= 0)[None]
    ident = g1.identity(summed[2].shape[1:])
    return g1.select(jnp.broadcast_to(valid[0], summed[2].shape[1:]),
                     summed, ident)


def _window_totals(e_pts):
    """E points (3 coords of (16, G, NB)) -> per-window totals (16, G) x3.

    total = 255 * E_255 - sum_{b=0}^{254} E_b  (Abel summation)."""
    ex, ey, ez = e_pts
    # sum_{b=0..254}: replace slot 255 with identity then tree-sum
    ix, iy, iz = g1.identity(ez.shape[1:-1] + (1,))
    sx = jnp.concatenate([ex[..., :NB - 1], ix], axis=-1)
    sy = jnp.concatenate([ey[..., :NB - 1], iy], axis=-1)
    sz = jnp.concatenate([ez[..., :NB - 1], iz], axis=-1)
    from halo2_tpu.msm.msm import _tree_sum_last_axis
    s_sum = _tree_sum_last_axis((sx, sy, sz))
    # 255 * E_255 = 256*E - E = (E<<8) - E
    e_last = (ex[..., NB - 1], ey[..., NB - 1], ez[..., NB - 1])
    acc = e_last
    for _ in range(C_BITS):
        acc = g1.double(acc)
    acc = g1.add(acc, g1.neg(e_last))
    return g1.add(acc, g1.neg(s_sum))


@functools.lru_cache(maxsize=None)
def _msm_sorted_jit(n: int, num_windows: int, group: int, block: int):
    # pad the HIGH windows to a multiple of `group` — padded windows have
    # all-zero digits, so their totals are the identity and the Horner
    # combine starts from identity harmlessly.
    w_pad = (-num_windows) % group
    W = num_windows + w_pad
    n_groups = W // group

    def run(px, py, scalars_mont):
        scal = Fr.raw.from_mont(scalars_mont)
        digits = _digits(scal, num_windows)          # (W0, n)
        if w_pad:
            digits = jnp.concatenate(
                [digits, jnp.zeros((w_pad, n), jnp.int32)], axis=0)
        dg = digits.reshape(n_groups, group, n)

        def one_group(_, d):
            # d: (G, n) digits
            order = jnp.argsort(d, axis=1, stable=True)
            d_sorted = jnp.take_along_axis(d, order, axis=1)
            px_s = jnp.take(px, order.reshape(-1), axis=1).reshape(
                N_LIMBS, group, n)
            py_s = jnp.take(py, order.reshape(-1), axis=1).reshape(
                N_LIMBS, group, n)
            intra, excl = _prefix_scan_group(px_s, py_s, block)
            bvals = jnp.arange(NB, dtype=jnp.int32)
            ends = jax.vmap(
                lambda row: jnp.searchsorted(row, bvals, side="right"))(
                d_sorted).astype(jnp.int32) - 1      # (G, NB), -1 if empty
            e_pts = _gather_boundary_prefix(intra, excl, ends, block, n)
            return None, _window_totals(e_pts)

        _, totals = jax.lax.scan(one_group, None, dg)
        # totals: 3 coords of (n_groups, 16, group) -> (16, W)
        tx = totals[0].transpose(1, 0, 2).reshape(N_LIMBS, W)
        ty = totals[1].transpose(1, 0, 2).reshape(N_LIMBS, W)
        tz = totals[2].transpose(1, 0, 2).reshape(N_LIMBS, W)
        from halo2_tpu.msm.msm import _combine_windows
        return _combine_windows((tx, ty, tz))

    return jax.jit(run)


def _auto_group(n: int, num_windows: int) -> int:
    # measured on v5e: larger groups grow the argsort/gather cost faster
    # than they amortize per-op overhead; 8 is the sweet spot at 2^16
    return min(8, num_windows)


def _auto_block(n: int) -> int:
    b = min(2048, n)
    while n % b or b & (b - 1):
        b //= 2
    return max(b, 1)


def msm_sorted(points, scalars_mont, max_bits: int = 256,
               group: int | None = None, block: int | None = None):
    """Scatter-free MSM. points: (x, y) (16, n) Montgomery affine;
    scalars_mont (16, n). Requires n divisible by block."""
    px, py = points
    n = px.shape[1]
    num_windows = min((max_bits + C_BITS - 1) // C_BITS, 32)
    if group is None:
        group = _auto_group(n, num_windows)
    if block is None:
        block = _auto_block(n)
    assert n % block == 0 and n >= block
    return _msm_sorted_jit(n, num_windows, min(group, num_windows),
                           block)(px, py, scalars_mont)
