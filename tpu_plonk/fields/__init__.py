# Submodules (fr, fp, limbs, device) are imported explicitly by users;
# keeping this empty avoids pulling JAX into host-only paths.
