# Submodules: srs, msm (host), kzg, msm_csr + commit_device (TPU kernels).
