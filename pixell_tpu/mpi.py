"""MPI compatibility shim (reference pixell/mpi.py).

The TPU-native communication layer is pixell_tpu.parallel (jax collectives
over the device mesh). This module keeps the reference's import surface:
COMM_WORLD/COMM_SELF/FakeCommunicator, degrading to single-process when no
multi-process jax runtime is initialized. The reference's >2^31 Alltoallv
workaround (mpi.itemhack:28) is unnecessary here -- XLA collectives have no
32-bit count limit."""
from .parallel.dist import (FakeCommunicator, JaxCommunicator, world,
	COMM_WORLD, COMM_SELF, install_abort_hook)
disabled = COMM_WORLD.size == 1
