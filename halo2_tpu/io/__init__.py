from halo2_tpu.io.serialization import (
    load_circuit_data,
    load_params,
    load_witness,
    save_circuit_data,
    save_params,
    save_witness,
)
