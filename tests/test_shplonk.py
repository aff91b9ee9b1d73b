"""SHPLONK multiopen end-to-end (milestone 4): same circuits as the GWC
tests, proven and verified with use_gwc=False."""

import pytest

from halo2_tpu.plonk.keygen import keygen
from halo2_tpu.plonk.prover import create_proof
from halo2_tpu.plonk.verifier import verify_proof
from halo2_tpu.poly.commitment import Params
from tests.test_e2e import SimpleCircuit, expected_out, K
from tests.test_lookup_shuffle import LookupShuffleCircuit, VALS_A, VALS_B, K as K2


@pytest.fixture(scope="module")
def setup():
    params = Params.unsafe_setup(K, seed=7)
    vk, pk = keygen(params, SimpleCircuit())
    return params, vk, pk


def test_shplonk_prove_verify(setup):
    params, vk, pk = setup
    a, b = 3, 5
    out = expected_out(a, b)
    proof = create_proof(params, pk, SimpleCircuit(a, b), [[out]], seed=0,
                         use_gwc=False)
    pv = params.verifier(1)
    assert verify_proof(pv, vk, [[out]], proof, use_gwc=False)
    # wrong instance rejected
    assert not verify_proof(pv, vk, [[out + 1]], proof, use_gwc=False)


def test_shplonk_proof_smaller_than_gwc(setup):
    params, vk, pk = setup
    a, b = 2, 9
    out = expected_out(a, b)
    p_gwc = create_proof(params, pk, SimpleCircuit(a, b), [[out]], seed=0)
    p_shp = create_proof(params, pk, SimpleCircuit(a, b), [[out]], seed=0,
                         use_gwc=False)
    # shplonk always writes exactly 2 witness points; gwc one per point set
    assert len(p_shp) <= len(p_gwc)


def test_shplonk_with_lookups_shuffles():
    params = Params.unsafe_setup(K2, seed=99)
    vk, pk = keygen(params, LookupShuffleCircuit())
    proof = create_proof(params, pk, LookupShuffleCircuit(VALS_A, VALS_B), [],
                         seed=3, use_gwc=False)
    pv = params.verifier(1)
    assert verify_proof(pv, vk, [], proof, use_gwc=False)
