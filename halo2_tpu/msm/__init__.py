from halo2_tpu.msm.msm import msm, msm_host_result
