from halo2_tpu.plonk.circuit import (
    Circuit,
    Column,
    ConstraintSystem,
    Expression,
    Rotation,
    Selector,
)

# NOTE: no "keygen" alias here — the submodule of the same name would
# shadow it; use halo2_tpu.plonk.keygen.keygen.
_LAZY = {
    "ProvingKey": ("halo2_tpu.plonk.keygen", "ProvingKey"),
    "VerifyingKey": ("halo2_tpu.plonk.keygen", "VerifyingKey"),
    "create_proof": ("halo2_tpu.plonk.prover", "create_proof"),
    "verify_proof": ("halo2_tpu.plonk.verifier", "verify_proof"),
}


def __getattr__(name):
    # lazy to break the circular import plonk -> keygen -> circuit-layer ->
    # plonk.circuit
    if name in _LAZY:
        import importlib
        mod, attr = _LAZY[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(name)
