"""Range-check-by-sorted-column example (the reference's range-check.rs)."""

import sys
sys.path.insert(0, __file__.rsplit("/", 2)[0])
sys.path.insert(0, __file__.rsplit("/", 2)[0] + "/tests")

from halo2_tpu.poly.commitment import Params
from halo2_tpu.plonk.keygen import keygen
from halo2_tpu.plonk.prover import create_proof
from halo2_tpu.plonk.verifier import verify_proof
from tests.test_range_check import RangeCheckCircuit, VALUES, K


def main():
    params = Params.unsafe_setup(K, seed=13)
    vk, pk = keygen(params, RangeCheckCircuit())
    proof = create_proof(params, pk, RangeCheckCircuit(VALUES), [])
    print(f"proof: {len(proof)} bytes")
    assert verify_proof(params.verifier(1), vk, [], proof)
    print("VALID")


if __name__ == "__main__":
    main()
