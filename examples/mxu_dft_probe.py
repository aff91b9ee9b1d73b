"""MXU field-multiplication probe (VERDICT r4 next-round #1).

Question: can the MXU (the chip's dominant compute resource, idle during
all field arithmetic today) accelerate modular multiplication?  Two cases:

  A. SHARED-OPERAND products — the NTT butterfly/DFT, where one operand
     (the root power w^{ij}) is a compile-time constant shared across all
     lanes.  Then the m-point DFT over Fr is a LINEAR map over the input
     byte-limbs: out_i = sum_{j,li} x_j[li] * (w^{ij} * 2^{8*li} mod p),
     i.e. ONE constant matrix of shape (m*32, m*NB) contracted against a
     (m*NB, B) byte matrix — a real matmul with K = m*NB >= 512, exactly
     the MXU's shape.  Exactness: matrix entries split into nibbles
     (<= 15), inputs are bytes (<= 255), both exact in bf16; per-output
     f32 accumulations are sums of K terms <= 15*255 each, exact while
     K*15*255 < 2^24 (K <= 4388).  Two nibble matmuls + an i32 combine
     reconstruct the exact integer sums.
  B. VARIABLE x VARIABLE products — the MSM point-add muls, where both
     operands differ per lane.  There is no shared contraction dimension:
     casting a*b as a matmul needs either a per-lane Toeplitz matrix
     (materializing 32x32 operands per lane — pure data movement, and
     batched matmuls with M=1 run at VPU-like rates) or K=1 contractions
     (which the MXU cannot amortize).  Measured here as a negative
     result with the op-count argument recorded in BASELINE.md.

The epilogue after a DFT matmul (case A) converts the redundant byte-basis
accumulator back to 16-bit limbs: byte-carry normalization (relaxation +
Kogge-Stone, limbs.carry_prop) and a fold of the limbs above 2^256
through the 2^(16k) mod p table.  The output of one DFT stage is a value
< K*255*p (NOT canonical mod p); chained stages absorb this by widening
the next matrix to NB=34 input byte-columns — only the FINAL stage pays a
full canonical reduction (here: Montgomery fold, measured separately).

Run on TPU:  python examples/mxu_dft_probe.py   (env M=16|64, B=2**17)
Prints exactness (vs host bigint DFT) and slope-timed ns/element vs the
CIOS VPU path computing the same m-point NTT.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import jax.numpy as jnp

from halo2_tpu.fields.bn254 import Fr, FR_ROOT_OF_UNITY, FR_S
from halo2_tpu.fields.limbs import N_LIMBS, carry_prop, ints_to_limbs_np
from halo2_tpu.ntt.ntt import NTT

P = Fr.p
F = Fr.raw


def log(*a):
    print(*a, flush=True)


# -- matrix construction (host) --------------------------------------------

def dft_matrices(m: int, nb_in: int = 32):
    """Nibble-split mod-fold DFT matrices.

    M[(i*32+lo), (j*nb_in+li)] = byte lo of (w^{ij} * 2^{8*li} mod p).
    Returns (M_lo, M_hi) as bf16 with entries <= 15 (M = M_lo + 16*M_hi).
    """
    w = pow(FR_ROOT_OF_UNITY, 1 << (FR_S - m.bit_length() + 1), P)
    assert pow(w, m, P) == 1 and pow(w, m // 2, P) != 1
    K = m * nb_in
    rows = m * 32
    M = np.zeros((rows, K), np.uint8)
    for i in range(m):
        for j in range(m):
            wij = pow(w, i * j, P)
            for li in range(nb_in):
                v = wij * (1 << (8 * li)) % P
                bs = v.to_bytes(32, "little")
                M[i * 32:(i + 1) * 32, j * nb_in + li] = np.frombuffer(
                    bs, np.uint8)
    return (jnp.asarray((M & 0xF).astype(np.float32), jnp.bfloat16),
            jnp.asarray((M >> 4).astype(np.float32), jnp.bfloat16), w)


FOLD_TABLE = None


def fold_table(extra: int = 4):
    """(16, extra) u32 limbs of 2^(16*(16+k)) mod p for k = 0..extra-1."""
    global FOLD_TABLE
    if FOLD_TABLE is None:
        FOLD_TABLE = np.stack(
            [ints_to_limbs_np([pow(2, 16 * (16 + k), P)])[:, 0]
             for k in range(extra)], axis=1)
    return FOLD_TABLE


# -- device pipeline --------------------------------------------------------

def bytes_from_limbs(x):
    """(16, m, B) u32 16-bit limbs -> (m, 32, B) u8-valued u32 bytes."""
    b0 = x & 0xFF
    b1 = (x >> 8) & 0xFF
    inter = jnp.stack([b0, b1], axis=1).reshape(32, x.shape[1], x.shape[2])
    return inter.transpose(1, 0, 2)


def dft_matmul(x, M_lo, M_hi, m: int):
    """x: (16, m, B) u32 limbs (values < p). Returns the stage output as
    (17, m, B) canonical-LIMB redundancy: value < 2^271, congruent mod p
    to the exact DFT output.  A chained stage consumes this directly as
    NB=34 byte-columns; only the END of a full transform pays one
    canonical mod-p reduction per element (a single Montgomery fold,
    amortized over all stages).
    """
    B = x.shape[2]
    xb = bytes_from_limbs(x).astype(jnp.bfloat16)       # (m, 32, B)
    xk = xb.reshape(m * 32, B)
    lo = jax.lax.dot(M_lo, xk, preferred_element_type=jnp.float32)
    hi = jax.lax.dot(M_hi, xk, preferred_element_type=jnp.float32)
    r = lo.astype(jnp.uint32) + (hi.astype(jnp.uint32) << 4)   # <= 2^25
    r = r.reshape(m, 32, B)
    # redundant bytes -> redundant 16-bit basis (18 limbs incl. carry room)
    acc16 = r[:, 0::2, :] + ((r[:, 1::2, :] & 0xFF) << 8)      # < 2^26
    car = r[:, 1::2, :] >> 8                                   # < 2^18
    acc = jnp.concatenate(
        [acc16, jnp.zeros((m, 2, B), jnp.uint32)], axis=1)
    acc = acc + jnp.concatenate(
        [jnp.zeros((m, 1, B), jnp.uint32), car,
         jnp.zeros((m, 1, B), jnp.uint32)], axis=1)
    acc = acc.transpose(1, 0, 2)                               # (18, m, B)
    out18, _ = carry_prop(acc, 18)
    # one fold of limbs 16..17 through the 2^(16k) mod p table:
    # value -> < 2^256 + 2^16*p + 2^9*p < 2^271 -> 17 limbs exactly.
    tab = jnp.asarray(fold_table())
    f0 = out18[16][None] * tab[:, 0][:, None, None]            # < 2^32
    f1 = out18[17][None] * tab[:, 1][:, None, None]            # < 2^32

    z1 = jnp.zeros((1, m, B), jnp.uint32)

    def pad17(v):                      # 16 rows -> 17, low-aligned
        return jnp.concatenate([v, z1], axis=0)

    def up17(v):                       # 16 rows -> 17, shifted up one limb
        return jnp.concatenate([z1, v], axis=0)

    acc2 = (pad17(out18[:16]) + pad17(f0 & 0xFFFF) + up17(f0 >> 16)
            + pad17(f1 & 0xFFFF) + up17(f1 >> 16))             # < 5*2^16
    out17, _ = carry_prop(acc2, 17)
    return out17


def host_dft(xs, w, m):
    out = []
    for i in range(m):
        acc = 0
        for j in range(m):
            acc = (acc + pow(w, i * j, P) * xs[j]) % P
        out.append(acc)
    return out


# -- Pallas-fused epilogue --------------------------------------------------
#
# The plain-jnp epilogue round-trips HBM ~30 times (concatenates break
# XLA fusion); this kernel does the whole f32-bytes -> 17-limb conversion
# in VMEM: one read of each dot output, one write of the result.

def _epilogue_call(m: int, B: int):
    import functools as _ft

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    tab = fold_table()
    t0 = [int(v) for v in tab[:, 0]]
    t1 = [int(v) for v in tab[:, 1]]
    # the epilogue is per-element independent: block over m (mj outputs
    # per step) so blocks stay ~2 MB regardless of m (sublane dim must be
    # a multiple of 8 on TPU)
    sub = 8
    mj = min(m, 16)
    assert B % (sub * 128) == 0

    def kernel(lo_ref, hi_ref, o_ref):
        lo = lo_ref[:]
        hi = hi_ref[:]
        outs = []
        for j in range(mj):
            # Mosaic has no f32->u32 cast; go through i32 (values < 2^25)
            b = [lo[j * 32 + t].astype(jnp.int32).astype(jnp.uint32)
                 + (hi[j * 32 + t].astype(jnp.int32).astype(jnp.uint32) << 4)
                 for t in range(32)]                      # bytes <= 2^25
            acc = [b[2 * k] + ((b[2 * k + 1] & 0xFF) << 8)
                   for k in range(16)] + [None, None]
            acc[16] = b[31] >> 8
            acc[17] = jnp.zeros_like(b[0])
            for k in range(15):
                acc[k + 1] = acc[k + 1] + (b[2 * k + 1] >> 8)
            # ripple normalize to 18 limbs
            c = jnp.zeros_like(acc[0])
            lmb = []
            for k in range(18):
                t = acc[k] + c
                lmb.append(t & 0xFFFF)
                c = t >> 16
            # fold limbs 16,17 through 2^(16k) mod p
            acc2 = lmb[:16] + [jnp.zeros_like(c)]
            for l in range(16):
                f0 = lmb[16] * t0[l]                      # < 2^32
                f1 = lmb[17] * t1[l]
                acc2[l] = acc2[l] + (f0 & 0xFFFF) + (f1 & 0xFFFF)
                acc2[l + 1] = acc2[l + 1] + (f0 >> 16) + (f1 >> 16)
            c = jnp.zeros_like(acc2[0])
            out = []
            for k in range(17):
                t = acc2[k] + c
                out.append(t & 0xFFFF)
                c = t >> 16
            outs.append(jnp.stack(out, axis=0))           # (17, sub, 128)
        o_ref[:] = jnp.stack(outs, axis=1)                # (17, mj, sub, 128)

    grid = (B // (sub * 128), m // mj)
    in_spec = pl.BlockSpec((mj * 32, sub, 128), lambda i, jm: (jm, i, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((17, mj, sub, 128), lambda i, jm: (0, jm, i, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[in_spec, in_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((17, m, B // 128, 128), jnp.uint32),
    ), sub


def dft_matmul_pallas(x, M_lo, M_hi, m: int):
    """Same contract as dft_matmul, epilogue fused into one Pallas pass."""
    B = x.shape[2]
    xb = bytes_from_limbs(x).astype(jnp.bfloat16)
    xk = xb.reshape(m * 32, B)
    lo = jax.lax.dot(M_lo, xk, preferred_element_type=jnp.float32)
    hi = jax.lax.dot(M_hi, xk, preferred_element_type=jnp.float32)
    call, _ = _epilogue_cached(m, B)
    out = call(lo.reshape(m * 32, B // 128, 128),
               hi.reshape(m * 32, B // 128, 128))
    return out.reshape(17, m, B)


import functools as _ft


@_ft.lru_cache(maxsize=None)
def _epilogue_cached(m, B):
    return _epilogue_call(m, B)


# -- timing (slope method; see BASELINE.md methodology note) ---------------

def slope_time(fn, x, iters=(4, 12)):
    """Dependency-chained iterations inside one jit at two chain lengths."""
    import functools

    @functools.partial(jax.jit, static_argnames=("k",))
    def chain(x, k):
        def body(c, _):
            y = fn(c)
            # feed back with a cheap exact perturbation to keep the chain
            return (y ^ 1).astype(jnp.uint32), ()
        out, _ = jax.lax.scan(body, x, None, length=k)
        return jnp.sum(out[:, :1, :1], dtype=jnp.uint32)

    ts = []
    for k in iters:
        d = chain(x, k)
        np.asarray(d)          # warm compile + first run
        t0 = time.time()
        d = chain(x, k)
        np.asarray(d)
        ts.append(time.time() - t0)
    return (ts[1] - ts[0]) / (iters[1] - iters[0])


def main():
    m = int(os.environ.get("M", "16"))
    B = int(os.environ.get("B", str(1 << 15)))
    rs = np.random.RandomState(0)

    log(f"device: {jax.devices()[0].device_kind}, m={m}, B={B} "
        f"({m*B} elements/transform batch)")

    M_lo, M_hi, w = dft_matrices(m)

    # exactness check on a small batch
    Bs = 4
    xs_small = [[int(rs.randint(0, 1 << 62)) for _ in range(m)]
                for _ in range(Bs)]
    x_small = np.zeros((N_LIMBS, m, Bs), np.uint32)
    for b in range(Bs):
        x_small[:, :, b] = ints_to_limbs_np(xs_small[b])
    got = np.asarray(jax.jit(lambda x: dft_matmul(x, M_lo, M_hi, m))(
        jnp.asarray(x_small)))
    ok = True
    from halo2_tpu.fields.limbs import limbs_to_ints
    for b in range(Bs):
        want = host_dft(xs_small[b], w, m)
        have = limbs_to_ints(got[:, :, b])
        for i in range(m):
            if have[i] % P != want[i] % P:
                ok = False
    log(f"exactness (mod p, {Bs} random columns): "
        f"{'OK' if ok else 'FAIL'}")
    if not ok:
        sys.exit(1)

    # exactness of the Pallas-epilogue variant (same small batch, padded)
    Bp = 128 * 8
    xp = np.zeros((N_LIMBS, m, Bp), np.uint32)
    xp[:, :, :Bs] = x_small
    gotp = np.asarray(jax.jit(
        lambda x: dft_matmul_pallas(x, M_lo, M_hi, m))(jnp.asarray(xp)))
    okp = all(
        limbs_to_ints(gotp[:, :, b])[i] % P == host_dft(xs_small[b], w, m)[i]
        for b in range(Bs) for i in range(m))
    log(f"exactness (pallas epilogue): {'OK' if okp else 'FAIL'}")
    if not okp:
        sys.exit(1)

    # throughput: DFT matmul vs CIOS four-step NTT of the same size
    x = jnp.asarray(rs.randint(0, 1 << 16, size=(N_LIMBS, m, B))
                    .astype(np.uint32))
    t_mxu = slope_time(lambda a: dft_matmul(a, M_lo, M_hi, m)[:16], x)
    t_mxu_p = slope_time(
        lambda a: dft_matmul_pallas(a, M_lo, M_hi, m)[:16], x)
    log(f"MXU dft{m} (pallas epilogue): {t_mxu_p*1e3:.3f} ms "
        f"= {t_mxu_p/(m*B)*1e9:.3f} ns/element "
        f"({m*B/t_mxu_p/1e6:.0f} M elements/s)")
    n_el = m * B
    log(f"MXU dft{m}: {t_mxu*1e3:.3f} ms/transform-batch "
        f"= {t_mxu/n_el*1e9:.3f} ns/element "
        f"({n_el/t_mxu/1e6:.0f} M elements/s)")

    # CIOS baseline: the existing small-NTT path at the same size/batch —
    # x viewed as (16, B, m, 1)? NTT treats last axis as the transform
    # axis: use (16, B, m) with transform over m.
    ntt = NTT(m.bit_length() - 1, omega=w)
    xt = x.transpose(0, 2, 1)  # (16, B, m)
    t_cios = slope_time(lambda a: ntt.forward_traced(a), xt)
    log(f"CIOS ntt{m}: {t_cios*1e3:.3f} ms/transform-batch "
        f"= {t_cios/n_el*1e9:.3f} ns/element "
        f"({n_el/t_cios/1e6:.0f} M elements/s)")
    log(f"speedup: {t_cios/t_mxu:.2f}x")

    # epilogue-only cost (everything after the two matmuls)
    xb = bytes_from_limbs(x).astype(jnp.bfloat16).reshape(m * 32, B)
    r0 = jax.lax.dot(M_lo, xb, preferred_element_type=jnp.float32)

    def matmul_only(a):
        xk = bytes_from_limbs(a).astype(jnp.bfloat16).reshape(m * 32, B)
        lo = jax.lax.dot(M_lo, xk, preferred_element_type=jnp.float32)
        hi = jax.lax.dot(M_hi, xk, preferred_element_type=jnp.float32)
        r = lo.astype(jnp.uint32) + (hi.astype(jnp.uint32) << 4)
        # cheap exact fold back to a (16, m, B) u32 so the chain closes
        return r.reshape(m, 32, B)[:, :16, :].transpose(1, 0, 2)

    t_mm = slope_time(matmul_only, x)
    log(f"matmul-only (2 nibble dots + combine): {t_mm*1e3:.3f} ms "
        f"-> epilogue {(t_mxu-t_mm)*1e3:.3f} ms "
        f"({(t_mxu-t_mm)/n_el*1e9:.3f} ns/element)")


if __name__ == "__main__":
    main()
