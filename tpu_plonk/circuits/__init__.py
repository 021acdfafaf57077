from .mock_circuit import MockCircuit  # noqa: F401
