from halo2_tpu.dev.mock import MockProver, VerifyFailure
