# Submodules: domain (host), poly (host helpers), ntt (device kernels).
