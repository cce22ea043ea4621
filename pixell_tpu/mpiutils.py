"""Alias of the communicator fallback module (reference pixell/mpiutils.py)."""
from .parallel.dist import FakeCommunicator, COMM_WORLD, COMM_SELF
FAKE_WORLD = FakeCommunicator()
