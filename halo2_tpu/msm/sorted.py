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
import os

import jax
import jax.numpy as jnp
import numpy as np

from halo2_tpu.curves import g1
from halo2_tpu.fields.bn254 import Fq, Fr
from halo2_tpu.fields.limbs import LIMB_BITS, MASK, N_LIMBS

C_BITS = 8
NB = 1 << C_BITS

# signed-window configuration: c bits per window, digits recoded into
# [-2^(c-1), 2^(c-1)] so the bucket table holds 2^(c-1)+1 entries (|digit|;
# the sign rides on the point's y).  The classic Pippenger work model
# W*(n + 2^(c-1)) (arithmetic.rs:20-108 uses unsigned c=ln(n); the GPU
# kernels use c=8 fixed) picks c=13 at these sizes, but the DEVICE optimum
# sits lower: the per-bucket costs (boundary gathers, MXU histogram, Abel
# folds, all ∝ 2^(c-1)) price higher than scan adds on TPU.  Measured
# sweep (examples/tune_msm_c.py, BASELINE.md round 4): c=11 3.61 M pts/s
# @2^16 vs c=13 3.33 M; flat within 1.5% across c=11..13 @2^20.
SIGNED_C_BITS = 11


def _digits(scalars_std, num_windows: int):
    parts = []
    for w in range(num_windows):
        limb = scalars_std[w // 2]
        shift = 8 * (w % 2)
        parts.append(((limb >> shift) & 0xFF).astype(jnp.int32))
    return jnp.stack(parts)  # (W, n)


def _raw_digits_c(scalars_std, num_windows: int, c: int):
    """(16, n) standard 16-bit limbs -> (W, n) int32 unsigned c-bit digits."""
    n_limbs = scalars_std.shape[0]
    parts = []
    for w in range(num_windows):
        off = c * w
        i, sh = off // 16, off % 16
        lo = scalars_std[i] >> sh
        if sh + c > 16 and i + 1 < n_limbs:
            lo = lo | (scalars_std[i + 1] << (16 - sh))
        parts.append((lo & ((1 << c) - 1)).astype(jnp.int32))
    return jnp.stack(parts)


def _signed_digits(scalars_std, num_windows: int, c: int):
    """Signed-window recoding.

    Returns (mag, neg): (W, n) int32 bucket magnitudes in [0, 2^(c-1)] and
    (W, n) bool sign flags.  d_w' = d_w + carry; if d' >= 2^(c-1):
    d' -= 2^c, carry = 1.  The top window absorbs the final carry without
    overflow as long as the scalar field leaves >= 2 spare bits there
    (callers size num_windows = ceil(max_bits / c) with max_bits <= 254 and
    c chosen so c*(W-1) >= max_bits - (c-2))."""
    raw = _raw_digits_c(scalars_std, num_windows, c)
    half = 1 << (c - 1)
    full = 1 << c
    mags, negs = [], []
    carry = jnp.zeros_like(raw[0])
    for w in range(num_windows):
        d = raw[w] + carry
        is_last = w == num_windows - 1
        if is_last:
            neg = jnp.zeros_like(d, dtype=bool)
            mag = d
            carry = jnp.zeros_like(d)
        else:
            neg = d >= half
            mag = jnp.where(neg, full - d, d)
            carry = jnp.where(neg, 1, 0)
        mags.append(mag)
        negs.append(neg)
    return jnp.stack(mags), jnp.stack(negs)


def _pack_xy(px, py):
    """Pack affine (x, y) 16-bit limb rows into one (16, n) uint32 array
    (two limbs per word).  The per-window point gather is random-access
    HBM traffic — packing halves the gathered bytes and folds the two
    coordinate gathers into ONE take.  (An unpacked 128-byte-row table
    was tried in round 5 on the strength of the r3 gather microbench
    [113 vs 32 GiB/s for 128B vs 64B rows] and was 5x SLOWER at 2^20 —
    the microbench pattern does not transfer to the scan-layout gather;
    measured S1 994 ms vs 195 ms, BASELINE.md r5.)"""
    def pack(c):
        return c[0::2] | (c[1::2] << LIMB_BITS)  # (8, n)
    return jnp.concatenate([pack(px), pack(py)], axis=0)


def _unpack_xy(packed):
    """Inverse of _pack_xy: (16, *B) -> ((16, *B) x, (16, *B) y)."""
    def unpack(c):  # (8, *B) -> (16, *B)
        lo = c & MASK
        hi = c >> LIMB_BITS
        return jnp.stack([lo, hi], axis=1).reshape((-1,) + c.shape[1:])
    return unpack(packed[:8]), unpack(packed[8:])


def _prefix_scan_group(pk_rows, sg_r):
    """Prefix sums over sorted points in scan layout.

    pk_rows: (S, G, B, 16) packed affine words, ROW-major (16 limb words
    contiguous per point — the layout the 64-byte-row HBM gather produces;
    the step transposes its 2.6MB slice to the kernel's limb-major layout,
    ~50us, vs ~17 ms for gathering limb-major directly at 2^16).  Block b
    covers sorted positions [b*S, (b+1)*S), step s adds position b*S+s;
    sg_r: (S, G, B) sign flags (negate y).  The scan body is ONE fused
    Pallas kernel (unpack + conditional negate + complete mixed add, all
    in VMEM) — doing the unpack/negate in XLA cost ~14 ms per 2^16 round.

    Returns (intra: 3 coords of (S, G, B, 16) ROW-major — the layout the
    boundary gather wants, emitted per step so no 252MB transpose of the
    stacked array is ever needed; block_excl: 3 coords of (16, G, B))."""
    from halo2_tpu.curves import pallas_point
    G, B = pk_rows.shape[1], pk_rows.shape[2]

    def step(carry, xs):
        pkt_rows, sgt = xs
        pkt = pkt_rows.transpose(2, 0, 1)            # (16, G, B)
        nxt = pallas_point.add_mixed_packed(carry, pkt, sgt)
        if nxt is None:  # off-TPU fallback (static decision at trace time)
            qx, qy = _unpack_xy(pkt)
            qy = jnp.where(sgt[None], Fq.raw.neg(qy), qy)
            nxt = g1.add_mixed(carry, (qx, qy))
        intra_rows = tuple(c.transpose(1, 2, 0) for c in nxt)
        return nxt, intra_rows

    init = g1.identity((G, B))
    totals, intra = jax.lax.scan(step, init, (pk_rows, sg_r))
    excl = _exclusive_scan_points(totals)
    return intra, excl


def _shift_fill_identity(pts, s):
    """Shift points right by s along the last axis, identity-filling."""
    rolled = tuple(jnp.roll(c, s, axis=-1) for c in pts)
    batch_shape = pts[2].shape[1:]
    pos = jax.lax.broadcasted_iota(jnp.int32, batch_shape,
                                   len(batch_shape) - 1)
    ident = g1.identity(batch_shape)
    return g1.select(pos >= s, rolled, ident)


def _hs_exclusive(totals):
    """Exclusive prefix scan of points along the last axis (length B, a
    power of two).  totals: 3 coords of (16, G, B).

    Hillis–Steele ladder as a ``lax.scan`` over log2(B) doubling shifts:
    the body (one full-width fused point add + a roll/select) compiles
    ONCE — an unrolled work-efficient tree costs ~20 distinct-shape XLA
    programs and minutes of compile for the same few ms of runtime."""
    B = totals[0].shape[-1]
    if B == 1:
        return g1.identity(totals[2].shape[1:])
    log_b = B.bit_length() - 1
    x = _shift_fill_identity(totals, 1)   # make it exclusive first

    def body(x, s):
        return g1.add(x, _shift_fill_identity(x, s)), None

    shifts = jnp.asarray([1 << d for d in range(log_b)], jnp.int32)
    x, _ = jax.lax.scan(body, x, shifts)
    return x


def _exclusive_scan_points(totals, seq: int = 32):
    """Exclusive prefix scan over the last axis (length B, power of two),
    two-level work-efficient:

      B = B1 * S2 sub-blocks; a ``lax.scan`` over S2 accumulates inclusive
      intra prefixes (S2 adds at width B1 — work B*G, vs B*G*log2(B) for a
      flat Hillis–Steele ladder), the B1 sub-block totals get the O(log)
      ladder, and one full-width add combines.  Measured at B=2048, G=20:
      1.3 ms vs 3.2 ms for the flat ladder."""
    B = totals[0].shape[-1]
    if B <= max(seq * 2, 2):
        return _hs_exclusive(totals)
    S2 = seq
    while B % S2:
        S2 //= 2
    B1 = B // S2
    lead = totals[0].shape[:-1]          # (16, G)
    r = tuple(c.reshape(lead + (B1, S2)) for c in totals)
    xs = tuple(jnp.moveaxis(c, -1, 0) for c in r)   # (S2, 16, G, B1)

    def step(carry, x):
        nxt = g1.add(carry, x)
        return nxt, nxt

    blk_tot, incl = jax.lax.scan(step, g1.identity(lead[1:] + (B1,)), xs)
    incl = tuple(jnp.moveaxis(c, 0, -1) for c in incl)  # (16, G, B1, S2)
    ident = g1.identity(lead[1:] + (B1, 1))
    excl_intra = tuple(
        jnp.concatenate([ic, c[..., :-1]], axis=-1)
        for c, ic in zip(incl, ident))
    blk_excl = _hs_exclusive(blk_tot)                   # (16, G, B1)
    out = g1.add(excl_intra, tuple(c[..., None] for c in blk_excl))
    return tuple(c.reshape(lead + (B,)) for c in out)


def _pairfold_sum(pts):
    """Sum points along the last axis (length W, a power of two) with a
    CONSTANT-SHAPE halving fold: each round adds adjacent pairs into the
    first W/2 slots and identity-fills the rest, so the ``lax.scan`` body
    compiles once (log2(W) rounds)."""
    W = pts[0].shape[-1]
    if W == 1:
        return tuple(c[..., 0] for c in pts)
    rounds = W.bit_length() - 1

    def body(x, _):
        v = tuple(c.reshape(c.shape[:-1] + (W // 2, 2)) for c in x)
        s = g1.add(tuple(c[..., 0] for c in v), tuple(c[..., 1] for c in v))
        ident = g1.identity(s[2].shape[1:])
        out = tuple(jnp.concatenate([sc, ic], axis=-1)
                    for sc, ic in zip(s, ident))
        return out, None

    x, _ = jax.lax.scan(body, pts, None, length=rounds)
    return tuple(c[..., 0] for c in x)


def _sum_points_lastaxis(pts, seq: int = 64):
    """Sum points along the last axis (length M, a power of two).

    Two-level work-efficient: sequential ``lax.scan`` accumulate over S2
    columns (work M*G adds — the identity-padded constant-shape pairfold
    costs ~2*M*G*? with every round at FULL width), then pairfold the M/S2
    partials.  Compiles two bodies."""
    M = pts[0].shape[-1]
    if M <= max(2 * seq, 2):
        return _pairfold_sum(pts)
    S2 = seq
    while M % S2:
        S2 //= 2
    B1 = M // S2
    lead = pts[0].shape[:-1]
    xs = tuple(jnp.moveaxis(c.reshape(lead + (B1, S2)), -1, 0) for c in pts)

    def step(carry, x):
        return g1.add(carry, x), None

    tot, _ = jax.lax.scan(step, g1.identity(lead[1:] + (B1,)), xs)
    return _pairfold_sum(tot)


def _gather_boundary_prefix(intra, excl, ends, block: int, n: int):
    """Prefix point at sorted position e (may be -1 -> identity).

    intra: 3 coords of (S, G, B, 16) ROW-major (the scan emits this layout
    directly); excl: 3 x (16, G, B); ends: (G, NB) int32 positions.
    position e -> block b = e // S, step s = e % S;
    prefix[e] = excl[b] + intra[s, b].

    Every gather is a contiguous 64-byte-row read: intra is already
    limb-minor, excl (5 MB) is transposed once.  The old limb-major
    variant transposed the full 252MB intra stack and gathered 16-way
    strided words (~20 ms of the round-2 MSM's 63 ms at 2^16)."""
    S = n // block
    G, nb = ends.shape
    b_idx = jnp.clip(ends // S, 0, block - 1)
    s_idx = jnp.clip(ends % S, 0, S - 1)
    g_iota = jax.lax.broadcasted_iota(jnp.int32, (G, nb), 0)
    fidx = (s_idx * G + g_iota) * block + b_idx       # (G, nb) row ids
    eidx = g_iota * block + b_idx

    def gather_coord(intra_c, excl_c):
        rows = intra_c.reshape(S * G * block, N_LIMBS)
        picked = jnp.take(rows, fidx.reshape(-1), axis=0)
        picked = picked.reshape(G, nb, N_LIMBS).transpose(2, 0, 1)
        erows = excl_c.transpose(1, 2, 0).reshape(G * block, N_LIMBS)
        epick = jnp.take(erows, eidx.reshape(-1), axis=0)
        epick = epick.reshape(G, nb, N_LIMBS).transpose(2, 0, 1)
        return picked, epick

    coords = [gather_coord(intra[c], excl[c]) for c in range(3)]
    intra_pt = tuple(c[0] for c in coords)
    excl_pt = tuple(c[1] for c in coords)
    summed = g1.add(intra_pt, excl_pt)
    # positions < 0 mean "empty prefix" -> identity
    valid = (ends >= 0)[None]
    ident = g1.identity(summed[2].shape[1:])
    return g1.select(jnp.broadcast_to(valid[0], summed[2].shape[1:]),
                     summed, ident)


def _abel_window_totals(e_pts, nb: int):
    """E points (3 coords of (16, G, nb)) -> per-window totals (16, G) x3.

    total = sum_b b * Bucket_b = M * E_M - sum_{b=0}^{M-1} E_b with
    M = nb - 1 (Abel summation over bucket boundary prefixes)."""
    ex, ey, ez = e_pts
    M = nb - 1
    # sum_{b=0..M-1}: drop the last slot then constant-shape pair-fold
    # (M is a power of two for both the unsigned path, nb = 256, and the
    # signed path, nb = 2^(c-1)+1 -> M = 2^(c-1))
    if M & (M - 1) == 0:
        s_sum = _sum_points_lastaxis((ex[..., :M], ey[..., :M], ez[..., :M]))
    else:
        ix, iy, iz = g1.identity(ez.shape[1:-1] + (1,))
        pad = (1 << M.bit_length()) - M
        sx = jnp.concatenate([ex[..., :M]] + [ix] * pad, axis=-1)
        sy = jnp.concatenate([ey[..., :M]] + [iy] * pad, axis=-1)
        sz = jnp.concatenate([ez[..., :M]] + [iz] * pad, axis=-1)
        s_sum = _sum_points_lastaxis((sx, sy, sz))
    e_last = (ex[..., M], ey[..., M], ez[..., M])
    if M & (M - 1) == 0:
        # M * E_M via log2(M) doublings (lax.scan: one doubling body)
        def dbl(acc, _):
            return g1.double(acc), None
        acc, _ = jax.lax.scan(dbl, e_last, None, length=M.bit_length() - 1)
    else:
        # M * E_M = 2^ceil * E - (2^ceil - M) * E; only used for M = 255:
        def dbl(acc, _):
            return g1.double(acc), None
        acc, _ = jax.lax.scan(dbl, e_last, None, length=M.bit_length())
        acc = g1.add(acc, g1.neg(e_last))
    return g1.add(acc, g1.neg(s_sum))


def _bucket_ends(d, nb: int):
    """ends[g, b] = (# of digits <= b) - 1 — the bucket-boundary positions
    in the sorted order (-1 when the prefix is empty).

    Histogram on the MXU: split each digit into hi/lo one-hot bf16
    factors (balanced bit split); counts[g, hi, lo] = sum_i A[g,i,hi] *
    B[g,i,lo] is a batched matmul (exact: 0/1 values, f32 accumulation,
    n < 2^24).  Replaces searchsorted-on-sorted (~10 ms at 2^16/W=20 vs
    ~0.5 ms) and depends only on the UNSORTED digits, so XLA overlaps it
    with the point gather/scan.  n is chunked to bound the one-hot
    materialization to ~256 MB."""
    G, n = d.shape
    bits = max((nb - 1).bit_length(), 2)
    lo_bits = (bits + 1) // 2
    n_lo = 1 << lo_bits
    n_hi = ((nb - 1) >> lo_bits) + 1
    budget = max((1 << 28) // max(G * (n_hi + n_lo), 1), 1024)
    chunk = 1 << min(budget, 1 << 16).bit_length() - 1   # pow2: no ragged tail
    hi_iota = jnp.arange(n_hi, dtype=jnp.int32)
    lo_iota = jnp.arange(n_lo, dtype=jnp.int32)
    counts = jnp.zeros((G, n_hi, n_lo), jnp.float32)
    for c0 in range(0, n, chunk):
        dc = d[:, c0:c0 + chunk]
        a = ((dc[:, :, None] >> lo_bits)
             == hi_iota[None, None, :]).astype(jnp.bfloat16)
        b = ((dc[:, :, None] & (n_lo - 1))
             == lo_iota[None, None, :]).astype(jnp.bfloat16)
        counts = counts + jnp.einsum(
            "gnh,gnl->ghl", a, b, preferred_element_type=jnp.float32)
    counts = counts.astype(jnp.int32).reshape(G, n_hi * n_lo)[:, :nb]
    return jnp.cumsum(counts, axis=1) - 1


def num_windows_for(max_bits: int, c: int = SIGNED_C_BITS) -> int:
    """Window count for the signed-c-bit path. Scalars are canonical
    (< 2^254 for BN254 Fr), so 254 caps the useful bit range; the +2 spare
    bits in the top window absorb the signed-recoding carry."""
    bits = min(max_bits, 254)
    w = (bits + c - 1) // c
    # top window must absorb carry without reaching 2^(c-1):
    if bits - c * (w - 1) > c - 2:
        w += 1
    return max(w, 1)


def window_totals(px, py, scalars_mont, max_bits: int, group: int,
                  block: int, c: int = SIGNED_C_BITS,
                  _profile_stage: int | None = None):
    """Traceable per-window signed-bucket totals over THIS shard's points.

    px/py: (16, n) Montgomery affine; scalars_mont: (16, n).  Returns
    projective totals, 3 coords of (16, W) where W = num_windows_for(
    max_bits, c) padded up to a multiple of `group` (padded windows have
    all-zero digits so their totals are the identity — harmless in the
    Horner combine).

    This is the building block shared by the single-chip path and the
    sharded multi-chip path (msm/distributed.py): window totals are
    additive over point shards, so chips compute them locally and reduce
    with a log-tree of point adds over the mesh axis."""
    n = px.shape[1]
    num_windows = num_windows_for(max_bits, c)
    nb = (1 << (c - 1)) + 1
    w_pad = (-num_windows) % group
    W = num_windows + w_pad
    n_groups = W // group

    scal = Fr.raw.from_mont(scalars_mont)
    mag, neg = _signed_digits(scal, num_windows, c)   # (W0, n) each
    if w_pad:
        mag = jnp.concatenate(
            [mag, jnp.zeros((w_pad, n), jnp.int32)], axis=0)
        neg = jnp.concatenate(
            [neg, jnp.zeros((w_pad, n), bool)], axis=0)
    dg = mag.reshape(n_groups, group, n)
    sg = neg.reshape(n_groups, group, n)
    # ONE gather source for x and y, ROW-major (n, 16): each gathered index
    # reads one contiguous 64-byte row — the limb-major (16, n) gather read
    # 16 strided words per index and cost ~17 ms of the 63 ms 2^16 MSM.
    # The barrier forces the transpose to MATERIALIZE: XLA otherwise fuses
    # it into the gather's operand, silently re-creating the strided reads
    # (raw row gather: 2.5 ms for 1.3M rows; fused-transpose: ~17 ms).
    packed_rows = jax.lax.optimization_barrier(_pack_xy(px, py).T)  # (n, 16)

    # fused single-array sort: when (key || index) fits one uint32 word,
    # sorting ONE array instead of a (key, value) pair halves the sort's
    # data movement — the sort is >1/4 of the 2^20 MSM (S1 194 ms of
    # 395, BASELINE.md r5).  key <= 2^c + 1, so the fused word needs
    # c + 1 + log2(n) <= 32 and a power-of-two n; gated to n >= 2^17
    # (measured neutral at 2^20, but the 2^12 bench rung ran 2.4x slower
    # fused — small sorts are not payload-bound).
    log2n = n.bit_length() - 1
    fuse_sort = (n == 1 << log2n) and n >= (1 << 17) \
        and ((((1 << (c - 1)) << 1) | 1) << log2n) | (n - 1) < (1 << 32)

    def one_group(_, ds):
        d, s = ds  # (G, n) magnitudes, (G, n) sign flags
        # fold the sign bit into the sort key: the sorted sign flags fall
        # out of the sort for free — a take_along_axis of the bool flags
        # cost ~14 ms at 2^16/W=20 (ablation f1, profile_gather.py).
        # Order within a bucket is irrelevant (bucket sums commute).
        key = (d << 1) | s.astype(jnp.int32)
        if fuse_sort:
            iota = jnp.broadcast_to(
                jnp.arange(n, dtype=jnp.uint32)[None, :], (group, n))
            skey = (key.astype(jnp.uint32) << log2n) | iota
            skey_sorted = jax.lax.sort(skey, dimension=1)
            order = (skey_sorted & (n - 1)).astype(jnp.int32)
            key_sorted = (skey_sorted >> log2n).astype(jnp.int32)
        else:
            iota = jnp.broadcast_to(
                jnp.arange(n, dtype=jnp.int32)[None, :], (group, n))
            key_sorted, order = jax.lax.sort_key_val(key, iota, dimension=1)
        S = n // block
        # permute the INDICES into scan layout before gathering, so the
        # point gather lands directly as (S, G, B, 16) rows and no full
        # relayout of the gathered array is ever needed
        idx_scan = jax.lax.optimization_barrier(
            order.reshape(group, block, S).transpose(2, 0, 1))
        pk_s = jnp.take(packed_rows, idx_scan.reshape(-1), axis=0).reshape(
            S, group, block, N_LIMBS)
        s_scan = (key_sorted & 1).astype(bool).reshape(
            group, block, S).transpose(2, 0, 1)
        if _profile_stage == 1:   # examples/profile_msm.py stage hook
            return None, (jnp.sum(pk_s, dtype=jnp.uint32)
                          + jnp.sum(s_scan, dtype=jnp.int32).astype(jnp.uint32))
        # points stay PACKED: the scan-body kernel unpacks and applies the
        # sign in VMEM
        intra, excl = _prefix_scan_group(pk_s, s_scan)
        if _profile_stage == 2:
            return None, (jnp.sum(intra[0][-1], dtype=jnp.uint32)
                          + jnp.sum(excl[0], dtype=jnp.uint32))
        # bucket boundaries from the UNSORTED digits (MXU histogram +
        # cumsum) — overlaps with the gather/scan above
        ends = _bucket_ends(d, nb)
        e_pts = _gather_boundary_prefix(intra, excl, ends, block, n)
        return None, _abel_window_totals(e_pts, nb)

    _, totals = jax.lax.scan(one_group, None, (dg, sg))
    if _profile_stage in (1, 2):
        return totals
    # totals: 3 coords of (n_groups, 16, group) -> (16, W)
    tx = totals[0].transpose(1, 0, 2).reshape(N_LIMBS, W)
    ty = totals[1].transpose(1, 0, 2).reshape(N_LIMBS, W)
    tz = totals[2].transpose(1, 0, 2).reshape(N_LIMBS, W)
    return (tx, ty, tz)


@functools.lru_cache(maxsize=None)
def _msm_sorted_jit(n: int, max_bits: int, group: int, block: int):
    def run(px, py, scalars_mont):
        totals = window_totals(px, py, scalars_mont, max_bits, group, block)
        from halo2_tpu.msm.msm import _combine_windows
        return _combine_windows(totals, SIGNED_C_BITS)

    return jax.jit(run)


def _auto_group(n: int, num_windows: int) -> int:
    """Windows per shared scan.

    Prefer ONE group of all windows — every sequential round (prefix-scan
    step, Hillis–Steele level, Abel fold) then runs at num_windows * block
    lane width, and the round count stops scaling with the window count.
    The cap is HBM: the intra-block prefix buffer + sorted point copies
    cost ~320 * G * n bytes, so G shrinks for very large n."""
    budget = int(os.environ.get("HALO2_TPU_MSM_MEM", str(3 << 30)))
    g_max = max(1, min(num_windows, budget // (320 * max(n, 1))))
    if g_max >= num_windows:
        return num_windows
    # least padding waste among feasible sizes (padded windows are dead work)
    best = (num_windows + 1, -1)
    for g in range(1, g_max + 1):
        pad = (-num_windows) % g
        if (pad, -g) < best:
            best = (pad, -g)
    return -best[1]


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
    num_windows = num_windows_for(max_bits)
    if group is None:
        group = _auto_group(n, num_windows)
    if block is None:
        block = _auto_block(n)
    assert n % block == 0 and n >= block
    return _msm_sorted_jit(n, max_bits, min(group, num_windows),
                           block)(px, py, scalars_mont)
