"""Standard-PLONK end-to-end example (the reference's simple-example.rs
class): custom mul gate, copy constraints, a constant, one public input.

Run: python examples/simple_example.py [k]
"""

import sys
sys.path.insert(0, __file__.rsplit("/", 2)[0])
sys.path.insert(0, __file__.rsplit("/", 2)[0] + "/tests")

from halo2_tpu.poly.commitment import Params
from halo2_tpu.plonk.keygen import keygen
from halo2_tpu.plonk.prover import create_proof
from halo2_tpu.plonk.verifier import verify_proof
from tests.test_e2e import SimpleCircuit, expected_out


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    print(f"setup k={k} ...")
    params = Params.unsafe_setup(k, seed=42)
    print("keygen ...")
    vk, pk = keygen(params, SimpleCircuit())
    a, b = 3, 5
    out = expected_out(a, b)
    print("prove ...")
    proof = create_proof(params, pk, SimpleCircuit(a, b), [[out]])
    print(f"proof: {len(proof)} bytes")
    print("verify ...")
    ok = verify_proof(params.verifier(1), vk, [[out]], proof)
    print("VALID" if ok else "INVALID")
    assert ok


if __name__ == "__main__":
    main()
