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
    """Store synthesized advice columns (host int lists) as Montgomery limb
    arrays + per-column canonical bit bounds (helpers.rs store_witness
    analogue; the bounds back the bounded-window MSM fast path)."""
    arrs = np.stack([np.asarray(Fr.encode(col)) for col in advice_cols], axis=1) \
        if advice_cols else np.zeros((16, 0, 0), np.uint32)
    bits = np.asarray(
        [max(int(col.max() if isinstance(col, np.ndarray) else max(col, default=0)
                 ).bit_length(), 1)
         for col in advice_cols], dtype=np.int64)
    np.savez(path, advice=arrs, max_bits=bits)


def load_witness(path: str):
    """Returns ((16, C, n) device advice lagrange limbs, max_bits list)."""
    data = np.load(path)
    return jnp.asarray(data["advice"]), [int(b) for b in data["max_bits"]]
