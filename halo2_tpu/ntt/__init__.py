from halo2_tpu.ntt.ntt import NTT, bit_reverse_indices
