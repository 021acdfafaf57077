# Submodules: srs, msm (host), kzg, msm_device (TPU kernels).
