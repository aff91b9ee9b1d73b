"""KZG structured reference string (Params) and commitment operations.

TPU-native analogue of /root/reference/halo2_proofs/src/poly/commitment.rs:
  * `Params { k, n, g, g_lagrange, s_g2 }` — the G1 bases live on device as
    (2, 16, n) Montgomery limb arrays feeding the MSM kernels; host copies
    exist only for (de)serialization.
  * `unsafe_setup` draws toxic s and builds both bases analytically
    (commitment.rs:56-124): the scalar tables (powers of s, Lagrange coeffs
    L_i(s)) are exact host big-int math, the n point multiplications run as
    one batched double-and-add on device.
  * `commit` / `commit_lagrange` / `commit_lagrange_with_bound` wrap the
    Pippenger MSM (commitment.rs:129-222).
  * `write`/`read` reproduce the reference Params wire format (k LE u32,
    compressed g points, compressed g_lagrange, length-prefixed s_g2 bytes —
    commitment.rs:241-294) so SRS files interoperate.
"""

from __future__ import annotations

import random

import jax.numpy as jnp
import numpy as np

from halo2_tpu.curves import g1, host
from halo2_tpu.fields.bn254 import Fr
from halo2_tpu.fields.limbs import ints_to_limbs_np
from halo2_tpu.msm import msm
from halo2_tpu.ntt.ntt import get_ntt
from halo2_tpu.pairing import bn254 as pairing
from halo2_tpu.transcript.blake2b import point_from_bytes, point_to_bytes

Q = pairing.Q
R = pairing.R


# -- G2 compressed codec (64 bytes: x.c0 || x.c1 LE, y parity in top bit) ----

def _fq2_sqrt(a: pairing.FQ2):
    """Square root in Fq2 for q ≡ 3 (mod 4) (Adj–Rodríguez-Henríquez)."""
    if a == pairing.FQ2.zero():
        return a
    a1 = a ** ((Q - 3) // 4)
    alpha = a1 * a1 * a
    x0 = a1 * a
    if alpha == pairing.FQ2((Q - 1, 0)):
        return pairing.FQ2((0, 1)) * x0  # i * x0
    b = (alpha + 1) ** ((Q - 1) // 2)
    x = b * x0
    return x if x * x == a else None


def g2_to_bytes(p) -> bytes:
    if p is None:
        return bytes(64)
    x, y = p
    out = bytearray(x.coeffs[0].to_bytes(32, "little") + x.coeffs[1].to_bytes(32, "little"))
    out[63] |= (y.coeffs[0] & 1) << 7
    return bytes(out)


def g2_from_bytes(b: bytes):
    arr = bytearray(b)
    sign = (arr[63] >> 7) & 1
    arr[63] &= 0x7F
    c0 = int.from_bytes(bytes(arr[:32]), "little")
    c1 = int.from_bytes(bytes(arr[32:]), "little")
    if c0 == 0 and c1 == 0 and sign == 0:
        return None
    x = pairing.FQ2((c0, c1))
    y = _fq2_sqrt(x * x * x + pairing.B2)
    if y is None:
        raise ValueError("invalid G2 point encoding")
    if y.coeffs[0] & 1 != sign:
        y = -y
    return (x, y)


class Params:
    """Prover parameters: SRS bases on device + s_g2 for the verifier."""

    def __init__(self, k: int, g_dev, g_lagrange_dev, s_g2):
        self.k = k
        self.n = 1 << k
        self.g = g_dev                    # (2, 16, n) Montgomery affine
        self.g_lagrange = g_lagrange_dev  # (2, 16, n)
        self.s_g2 = s_g2                  # host G2 point (FQ2 pair)
        self.mesh = None                  # set via use_mesh for multi-chip
        self.mesh_axis = "x"

    def use_mesh(self, mesh, axis="x"):
        """Route every commitment MSM through the sharded multi-chip path
        (msm/distributed.py): SRS bases and poly values shard over `axis`
        (one mesh-axis name, or a tuple OUTERMOST-first for 2-D
        DCN x ICI meshes), window totals reduce innermost-axis-first.
        Pass mesh=None to go single-chip."""
        self.mesh = mesh
        self.mesh_axis = axis
        return self

    # sharded-MSM size gate: below this, one chip is faster than paying
    # the per-shard fixed costs (the analogue of the reference's >2^14
    # GPU-vs-CPU gate, arithmetic.rs:442-458)
    MESH_MSM_MIN = 1 << 12

    def _mesh_devices(self) -> int:
        axes = ((self.mesh_axis,) if isinstance(self.mesh_axis, str)
                else tuple(self.mesh_axis))
        d = 1
        for ax in axes:
            d *= self.mesh.shape[ax]
        return d

    def _msm(self, bases, values, max_bits: int = 256):
        n = values.shape[1]
        if (self.mesh is not None and n >= self.MESH_MSM_MIN
                and n % self._mesh_devices() == 0):
            from halo2_tpu.msm.distributed import msm_sharded
            return msm_sharded(bases, values, self.mesh,
                               axis=self.mesh_axis, max_bits=max_bits)
        return msm(bases, values, max_bits=max_bits)

    # -- setup ----------------------------------------------------------
    @classmethod
    def unsafe_setup(cls, k: int, seed: int | None = None) -> "Params":
        rng = random.Random(seed)
        s = rng.randrange(1, R)
        n = 1 << k

        # powers of s and Lagrange evals L_i(s) — exact host math
        powers = []
        acc = 1
        for _ in range(n):
            powers.append(acc)
            acc = acc * s % R

        omega = get_ntt(k).omega
        n_inv = pow(n, R - 2, R)
        multiplier = (pow(s, n, R) - 1) * n_inv % R
        # L_i(s) = multiplier * w^i / (s - w^i)
        root_pows, rp = [], 1
        for _ in range(n):
            root_pows.append(rp)
            rp = rp * omega % R
        denoms = [(s - rp) % R for rp in root_pows]
        denom_invs = _batch_inv_host(denoms, R)
        lag = [multiplier * rp % R * di % R for rp, di in zip(root_pows, denom_invs)]

        import jax
        import os
        host_max = int(os.environ.get("HALO2_TPU_SETUP_HOST_MAX", "8192"))
        if jax.default_backend() == "cpu" and n <= host_max:
            # CPU backend: fixed-base host math instead of compiling the
            # device scalar-mul ladder (~60 s XLA CPU compile per distinct
            # k — the test suite pays it for every Params size otherwise)
            from halo2_tpu.curves import host
            tab = host.fixed_base_tables(host.G1_GEN)
            pts_g = [host.jac_to_affine(host.fixed_base_mul(tab, e))
                     for e in powers]
            pts_l = [host.jac_to_affine(host.fixed_base_mul(tab, e))
                     for e in lag]
            g_dev = g1.encode_points(pts_g)
            gl_dev = g1.encode_points(pts_l)
        else:
            gen = jnp.stack(g1.generator())
            gen_b = (jnp.broadcast_to(gen[0][:, None], (16, n)),
                     jnp.broadcast_to(gen[1][:, None], (16, n)))
            g_proj = g1.scalar_mul(gen_b, jnp.asarray(ints_to_limbs_np(powers)))
            g_dev = jnp.stack(g1.to_affine(g_proj))
            gl_proj = g1.scalar_mul(gen_b, jnp.asarray(ints_to_limbs_np(lag)))
            gl_dev = jnp.stack(g1.to_affine(gl_proj))

        s_g2 = pairing.g2_mul(pairing.G2_GEN, s)
        return cls(k, g_dev, gl_dev, s_g2)

    # -- commitments ------------------------------------------------------
    def commit(self, coeffs):
        """Commit to coefficient-form poly values (16, n) Montgomery."""
        return self._msm((self.g[0], self.g[1]), coeffs)

    def commit_lagrange(self, values, max_bits: int = 256):
        """Commit to Lagrange-form values; max_bits enables the
        bounded-window fast path (commitment.rs:199-222)."""
        gl = self._lagrange_dev()
        return self._msm((gl[0], gl[1]), values, max_bits=max_bits)

    # -- HBM relief for k>=22 single-chip (plonk.rs:226-243 analogue) ----
    def offload_lagrange(self):
        """Move the Lagrange SRS to host RAM (frees 128 B/point of HBM —
        1 GiB at k=22).  The prover calls this once its last
        Lagrange-basis commitment is done (HALO2_TPU_OFFLOAD_SRS=1); the
        copy runs on a background thread so the host keeps dispatching;
        the next commit_lagrange / join joins it and restores lazily."""
        import numpy as _np
        import threading
        if isinstance(self.g_lagrange, _np.ndarray):
            return
        t = getattr(self, "_offload_thread", None)
        if t is not None and t.is_alive():
            return
        dev = [self.g_lagrange]

        def copy_out():
            self.g_lagrange = _np.asarray(dev[0])
            dev.clear()
        t = threading.Thread(target=copy_out, daemon=True)
        t.start()
        self._offload_thread = t

    def join_offload(self):
        t = getattr(self, "_offload_thread", None)
        if t is not None:
            t.join()
            self._offload_thread = None

    def _lagrange_dev(self):
        import numpy as _np
        self.join_offload()
        if isinstance(self.g_lagrange, _np.ndarray):
            self.g_lagrange = jnp.asarray(self.g_lagrange)
        return self.g_lagrange

    def verifier(self, public_inputs_size: int) -> "ParamsVerifier":
        gl_host = g1.decode_points(self.g_lagrange[:, :, :max(public_inputs_size, 1)])
        return ParamsVerifier(
            k=self.k,
            g1=host.G1_GEN,
            g2=pairing.G2_GEN,
            s_g2=self.s_g2,
            g_lagrange=gl_host[:public_inputs_size],
        )

    # -- serialization (reference wire format) ----------------------------
    def write(self, fh) -> None:
        fh.write(self.k.to_bytes(4, "little"))
        for base in (self.g, self.g_lagrange):
            for p in g1.decode_points(base):
                fh.write(point_to_bytes(p))
        extra = g2_to_bytes(self.s_g2)
        fh.write(len(extra).to_bytes(4, "little"))
        fh.write(extra)

    @classmethod
    def read(cls, fh) -> "Params":
        k = int.from_bytes(fh.read(4), "little")
        n = 1 << k
        g_pts = [point_from_bytes(fh.read(32)) for _ in range(n)]
        gl_pts = [point_from_bytes(fh.read(32)) for _ in range(n)]
        extra_len = int.from_bytes(fh.read(4), "little")
        s_g2 = g2_from_bytes(fh.read(extra_len))
        return cls(k, g1.encode_points(g_pts), g1.encode_points(gl_pts), s_g2)


class ParamsVerifier:
    """Verifier parameters (commitment.rs:33-40): tiny host-side struct."""

    def __init__(self, k: int, g1, g2, s_g2, g_lagrange):
        self.k = k
        self.n = 1 << k
        self.g1 = g1
        self.g2 = g2
        self.s_g2 = s_g2
        self.g_lagrange = g_lagrange  # host points, one per instance row

    def commit_lagrange(self, values: list) -> object:
        """Small host MSM over the instance Lagrange bases (Jacobian
        Pippenger — no per-op modular inversions)."""
        return host.msm_jacobian(self.g_lagrange[:len(values)], list(values))


def _batch_inv_host(xs, p):
    """Host big-int batch inversion (Montgomery trick); zeros map to zero."""
    n = len(xs)
    prefix = [1] * (n + 1)
    for i, x in enumerate(xs):
        prefix[i + 1] = prefix[i] * (x if x else 1) % p
    inv_all = pow(prefix[n], p - 2, p)
    out = [0] * n
    for i in range(n - 1, -1, -1):
        x = xs[i]
        if x:
            out[i] = prefix[i] * inv_all % p
            inv_all = inv_all * x % p
    return out
