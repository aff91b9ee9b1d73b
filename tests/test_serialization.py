"""Persistence: params roundtrip on disk, circuit-data pk rebuild, and the
witness-split prove flow (create_witness / create_proof_from_witness)."""

import os

import pytest

from halo2_tpu.io.serialization import (
    load_circuit_data, load_params, save_circuit_data, save_params,
)
from halo2_tpu.plonk.keygen import keygen
from halo2_tpu.plonk.prover import (
    create_proof, create_proof_from_witness, create_witness,
)
from halo2_tpu.plonk.verifier import verify_proof
from halo2_tpu.poly.commitment import Params
from halo2_tpu.curves import g1
from tests.test_e2e import K, SimpleCircuit, expected_out


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    params = Params.unsafe_setup(K, seed=7)
    vk, pk = keygen(params, SimpleCircuit())
    return params, vk, pk


def test_params_file_roundtrip(setup, tmp_path):
    params, _, _ = setup
    path = tmp_path / "srs.params"
    save_params(params, str(path))
    back = load_params(str(path))
    assert g1.decode_points(back.g) == g1.decode_points(params.g)
    assert back.s_g2 == params.s_g2


def test_circuit_data_rebuild(setup, tmp_path):
    params, vk, pk = setup
    path = tmp_path / "cd.npz"
    save_circuit_data(pk, str(path))
    # self-contained: NO circuit / configure() involved in the load
    vk2, pk2 = load_circuit_data(params, str(path))
    assert vk2.pinned() == vk.pinned()
    # the rebuilt pk proves, and the original vk verifies the proof
    out = expected_out(3, 5)
    proof = create_proof(params, pk2, SimpleCircuit(3, 5), [[out]], seed=0)
    pv = params.verifier(1)
    assert verify_proof(pv, vk, [[out]], proof)


def test_circuit_data_rejects_tampering(setup, tmp_path):
    """The vk pinned-hash check catches a modified CS blob (the reference
    relies on read_cs + the transcript's vk hash the same way)."""
    import numpy as np
    from halo2_tpu.io.cs_format import read_cs, write_cs

    params, _, pk = setup
    path = tmp_path / "cd.npz"
    save_circuit_data(pk, str(path))
    data = dict(np.load(str(path)))
    cs = read_cs(bytes(data["cs_blob"].tobytes()))
    cs.num_advice_columns += 1  # structural change -> different pinned vk
    cs.num_advice_queries.append(0)
    data["cs_blob"] = np.frombuffer(write_cs(cs), dtype=np.uint8).copy()
    tampered = tmp_path / "cd_tampered.npz"
    np.savez(str(tampered), **data)
    with pytest.raises(ValueError):
        load_circuit_data(params, str(tampered))


def test_cs_wire_roundtrip(setup, tmp_path):
    """write_cs/read_cs round-trips the full CS byte-exactly (pinned string
    equality) — helpers.rs:406-587 analogue."""
    from halo2_tpu.io.cs_format import read_cs, write_cs
    from halo2_tpu.plonk.pinned import pinned_cs_str

    _, vk, _ = setup
    blob = write_cs(vk.cs)
    cs2 = read_cs(blob)
    assert pinned_cs_str(cs2) == pinned_cs_str(vk.cs)
    assert write_cs(cs2) == blob
    assert cs2.blinding_factors() == vk.cs.blinding_factors()


def test_witness_split_flow(setup, tmp_path):
    params, vk, pk = setup
    out = expected_out(4, 9)
    wpath = str(tmp_path / "witness.npz")
    create_witness(pk, SimpleCircuit(4, 9), [[out]], wpath)
    proof = create_proof_from_witness(params, pk, [[out]], wpath, seed=5)
    pv = params.verifier(1)
    assert verify_proof(pv, vk, [[out]], proof)
    # and it matches a direct proof with the same seed
    direct = create_proof(params, pk, SimpleCircuit(4, 9), [[out]], seed=5)
    assert proof == direct


def test_vk_file_roundtrip(setup, tmp_path):
    """VerifyingKey::write/read (plonk.rs:60-88): commitments round-trip and
    the reloaded vk verifies a real proof."""
    from halo2_tpu.io.serialization import load_vk, save_vk

    params, vk, pk = setup
    path = tmp_path / "vk.bin"
    save_vk(vk, str(path))
    back = load_vk(params, SimpleCircuit(), str(path))
    assert back.fixed_commitments == vk.fixed_commitments
    assert back.permutation.commitments == vk.permutation.commitments
    assert back.pinned() == vk.pinned()

    a, b = 3, 5
    out = expected_out(a, b)
    proof = create_proof(params, pk, SimpleCircuit(a, b), [[out]], seed=0)
    assert verify_proof(params.verifier(1), back, [[out]], proof)


def test_witness_file_is_strided_reference_layout(tmp_path):
    """The witness file must follow helpers.rs:919-1014's layout: u32-le
    column count, then per-column slabs at byte stride 32*n of canonical
    32-byte little-endian scalars."""
    import numpy as np
    from halo2_tpu.fields.bn254 import Fr
    from halo2_tpu.io.serialization import save_witness

    n = 8
    big = Fr.p - 3
    cols = [np.arange(n, dtype=np.uint64) * 7,
            [big] * n]
    path = str(tmp_path / "w.bin")
    save_witness(cols, path)
    blob = open(path, "rb").read()
    stride = 32 * n
    assert len(blob) == 4 + 2 * stride
    assert int.from_bytes(blob[:4], "little") == 2
    # column 0 row 3 = 21 as canonical 32-byte LE at offset 4 + 3*32
    assert blob[4 + 3 * 32: 4 + 4 * 32] == (21).to_bytes(32, "little")
    # column 1 row 0 = p-3
    assert blob[4 + stride: 4 + stride + 32] == big.to_bytes(32, "little")
