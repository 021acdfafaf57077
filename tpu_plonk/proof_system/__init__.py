# Submodules (constraints, preprocess, prover, verifier, proof)
# imported explicitly to keep import graphs light.
