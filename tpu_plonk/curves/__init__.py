# Submodules (g1, g2, jubjub, pairing, device_g1) imported explicitly.
