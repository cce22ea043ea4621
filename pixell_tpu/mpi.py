"""MPI compatibility shim (reference pixell/mpi.py).

The TPU-native communication layer is pixell_tpu.parallel (jax collectives
over the device mesh). This module keeps the reference's import surface:
COMM_WORLD/COMM_SELF/FakeCommunicator, degrading to single-process when no
multi-process jax runtime is initialized. The reference's >2^31 Alltoallv
workaround (mpi.itemhack:28) is unnecessary here -- XLA collectives have no
32-bit count limit."""
from .parallel.dist import (FakeCommunicator, JaxCommunicator, world,
	COMM_WORLD, COMM_SELF, install_abort_hook)
import numpy as _np
disabled = COMM_WORLD.size == 1


class itemhack:
	"""Compatibility shim for the reference's >2^31-element Alltoallv
	workaround (reference mpi.itemhack:28). XLA collectives have no 32-bit
	count limit, so for our communicators this is a plain alltoallv; in the
	single-process case it reduces to an offset-respecting copy."""
	@staticmethod
	def Alltoallv(sendbuf, sendn, sendoff, recvbuf, recvn, recvoff, comm, bsize=1):
		sendn, sendoff = _np.asarray(sendn), _np.asarray(sendoff)
		recvn, recvoff = _np.asarray(recvn), _np.asarray(recvoff)
		if getattr(comm, "size", 1) == 1:
			for i in range(len(sendn)):
				n = int(sendn[i])
				recvbuf[int(recvoff[i]):int(recvoff[i]) + n] = \
					sendbuf[int(sendoff[i]):int(sendoff[i]) + n]
			return
		comm.Alltoallv((sendbuf, (sendn, sendoff)), (recvbuf, (recvn, recvoff)))
