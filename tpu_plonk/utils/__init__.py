# Submodules: metrics, checkpoint, config.
