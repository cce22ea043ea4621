"""Lightweight wall/device timing (reference pixell/bench.py).

Same API as the reference Bench (reference bench.py:55-104: mark/show/add/
print/set_verbose/set_tfun and the module-level default instance), with one
TPU-specific addition: by default the timer synchronizes the device before
reading the clock, so jax's async dispatch doesn't make everything look
free (the reference's Device.time does the equivalent sync dance for cupy,
device.py:17-19).
"""
from __future__ import annotations
import time
from contextlib import contextmanager
from . import bunch

_print = print


def _sync():
	try:
		import jax
		# block on a trivial computation to drain the dispatch queue
		jax.block_until_ready(jax.numpy.zeros(()))
	except Exception:
		pass


class Bench:
	"""Accumulate named wall times (reference bench.Bench:55).

	with bench.mark("name"): ...   accumulates
	with bench.show("name"): ...   accumulates and prints
	"""
	def __init__(self, verbose=False, tfun=time.time, sync=True):
		self.t      = bunch.Bunch()
		self.t_tot  = bunch.Bunch()
		self.n      = bunch.Bunch()
		self.verbose = verbose
		self.tfun   = tfun
		self.sync   = sync
	@contextmanager
	def mark(self, name, tfun=None):
		if tfun is None: tfun = self.tfun
		if self.sync: _sync()
		t1 = tfun()
		try:
			yield
		finally:
			if self.sync: _sync()
			t2 = tfun()
			self.add(name, t2 - t1)
			if self.verbose:
				self.print(name)
	@contextmanager
	def show(self, name, tfun=None):
		try:
			with self.mark(name, tfun=tfun):
				yield
		finally:
			self.print(name)
	def add(self, name, t):
		if name not in self.n:
			self.t_tot[name] = 0
			self.n[name] = 0
		self.n[name] += 1
		self.t[name] = t
		self.t_tot[name] += t
	def print(self, name):
		_print("%7.4f s (last) %7.4f s (mean) %4d (n) %s" % (
			self.t[name], self.t_tot[name]/self.n[name], self.n[name], name))
	def set_verbose(self, verbose):
		self.verbose = verbose
	def set_tfun(self, tfun):
		self.tfun = tfun
	def stats(self, name):
		"""Convenience summary (not in the reference)."""
		return bunch.Bunch(last=self.t[name], tot=self.t_tot[name], n=self.n[name])


# Global interface (reference bench.py:96-104)
_default = Bench()
mark  = _default.mark
show  = _default.show
add   = _default.add
print = _default.print
t_tot = _default.t_tot
t     = _default.t
n     = _default.n
set_verbose = _default.set_verbose
set_tfun = _default.set_tfun
