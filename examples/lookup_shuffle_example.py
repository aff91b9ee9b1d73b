"""Logup lookup + shuffle end-to-end example (the reference's lookup_api.rs /
shuffle_api.rs class)."""

import sys
sys.path.insert(0, __file__.rsplit("/", 2)[0])
sys.path.insert(0, __file__.rsplit("/", 2)[0] + "/tests")

from halo2_tpu.dev import MockProver
from halo2_tpu.poly.commitment import Params
from halo2_tpu.plonk.keygen import keygen
from halo2_tpu.plonk.prover import create_proof
from halo2_tpu.plonk.verifier import verify_proof
from tests.test_lookup_shuffle import LookupShuffleCircuit, VALS_A, VALS_B, K


def main():
    MockProver.run(K, LookupShuffleCircuit(VALS_A, VALS_B), []).assert_satisfied()
    print("MockProver satisfied")
    params = Params.unsafe_setup(K, seed=9)
    vk, pk = keygen(params, LookupShuffleCircuit())
    proof = create_proof(params, pk, LookupShuffleCircuit(VALS_A, VALS_B), [])
    print(f"proof: {len(proof)} bytes")
    assert verify_proof(params.verifier(1), vk, [], proof)
    print("VALID")


if __name__ == "__main__":
    main()
