from halo2_tpu.multiopen.common import (
    BatchVerifier,
    HostMSM,
    PairMSM,
    ProverQuery,
    VerifierQuery,
    decider_verify,
)
