# Submodules: mesh, msm_sharded, ntt_sharded.
