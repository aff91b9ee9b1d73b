from halo2_tpu.multiopen.common import (
    HostMSM,
    PairMSM,
    ProverQuery,
    VerifierQuery,
    decider_verify,
)
