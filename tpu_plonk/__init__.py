"""tpu-plonk: a TPU-native PLONK proving framework (JAX/XLA/Pallas).

Built from scratch with the capabilities of Manta-Network/Plonk-Prototype
and the dusk-plonk 0.8.2 stack beneath it.  See SURVEY.md for the layer
map this package implements and docs/PROTOCOL.md for the exact protocol.
"""

__version__ = "0.1.0"
