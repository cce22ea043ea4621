"""Distributed communication helpers.

The reference wraps mpi4py with a FakeCommunicator single-process fallback
(pixell/mpi.py:13-25, mpiutils.py:6-24) and typed allreduce/allgather
helpers (utils.py:1520-1601). Here the multi-device path is jax: collectives
happen inside jitted shard_map computations (see sht_dist), and host-level
reductions across processes use jax.experimental.multihost_utils. The
communicator object is kept for API familiarity; in a single process it is
the same no-op FakeCommunicator the reference defaults to.
"""
from __future__ import annotations
import numpy as np


class FakeCommunicator:
	"""Single-process communicator: every operation is the identity
	(reference mpiutils.FakeCommunicator:6)."""
	rank = 0
	size = 1
	def allreduce(self, a, op=None): return a
	def reduce(self, a, op=None, root=0): return a
	def allgather(self, a): return np.asarray(a)[None]
	def allgatherv(self, a, axis=0): return np.asarray(a)
	def alltoallv(self, a, counts=None): return np.asarray(a)
	def bcast(self, a, root=0): return a
	def barrier(self): pass
	def Abort(self, code=1):
		import sys
		sys.exit(code)
	def Barrier(self): pass
	def Get_rank(self): return 0
	def Get_size(self): return 1


class JaxCommunicator:
	"""Cross-process communicator over jax.distributed (host-level data).
	Requires jax.distributed.initialize() to have been called."""
	def __init__(self):
		import jax
		self.rank = jax.process_index()
		self.size = jax.process_count()
	def allreduce(self, a, op=None):
		from jax.experimental import multihost_utils
		import jax.numpy as jnp
		if self.size == 1: return a
		res = multihost_utils.process_allgather(jnp.asarray(a))
		if op in [None, "sum"]: return np.asarray(res).sum(0)
		if op == "max": return np.asarray(res).max(0)
		if op == "min": return np.asarray(res).min(0)
		raise ValueError(op)
	def allgather(self, a):
		from jax.experimental import multihost_utils
		import jax.numpy as jnp
		return np.asarray(multihost_utils.process_allgather(jnp.asarray(a)))
	def allgatherv(self, a, axis=0):
		parts = self.allgather(np.asarray(a))
		return np.concatenate(list(parts), axis=axis)
	def barrier(self):
		from jax.experimental import multihost_utils
		multihost_utils.sync_global_devices("barrier")
	Barrier = barrier
	def Get_rank(self): return self.rank
	def Get_size(self): return self.size


def world():
	"""The best communicator available: jax.distributed if initialized with
	more than one process, else the single-process fallback."""
	try:
		import jax
		if jax.process_count() > 1:
			return JaxCommunicator()
	except Exception:
		pass
	return FakeCommunicator()

COMM_WORLD = world()
COMM_SELF = FakeCommunicator()

def allreduce(a, comm=None, op=None):
	comm = comm or COMM_WORLD
	return comm.allreduce(a, op=op)

def allgather(a, comm=None):
	comm = comm or COMM_WORLD
	return comm.allgather(a)

def allgatherv(a, comm=None, axis=0):
	comm = comm or COMM_WORLD
	return comm.allgatherv(a, axis=axis)

def install_abort_hook(comm=None):
	"""Turn uncaught exceptions into a hard abort so distributed jobs don't
	hang (reference mpi.install_abort_hook:53)."""
	import sys
	comm = comm or COMM_WORLD
	old_hook = sys.excepthook
	def hook(type, value, tb):
		old_hook(type, value, tb)
		getattr(comm, "Abort", lambda c: sys.exit(c))(1)
	sys.excepthook = hook
