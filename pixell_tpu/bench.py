"""Lightweight wall/device timing (reference pixell/bench.py).

Adds device synchronization around the timed region so jax's async dispatch
doesn't make everything look free: `with bench.mark("sht"): ...` blocks on
all outstanding work before reading the clock (reference Bench:55 measures
wall time only; the reference's Device.time does the sync dance for cupy)."""
from __future__ import annotations
import time
import numpy as np


def _sync():
	try:
		import jax
		# block on a trivial computation to drain the dispatch queue
		jax.block_until_ready(jax.numpy.zeros(()))
	except Exception:
		pass


class Entry:
	def __init__(self):
		self.n = 0
		self.time = 0.0
		self.last = 0.0
	@property
	def mean(self): return self.time/max(self.n, 1)

class Bench:
	"""Accumulate named wall times (reference bench.Bench:55)."""
	def __init__(self, sync=True):
		self.entries = {}
		self.sync = sync
	def mark(self, name):
		return _Mark(self, name)
	def add(self, name, t):
		e = self.entries.setdefault(name, Entry())
		e.n += 1; e.time += t; e.last = t
	def show(self, file=None):
		import sys
		f = file or sys.stderr
		for name in self.entries:
			e = self.entries[name]
			f.write("%8.4f s (%4d x %8.5f s) %s\n" % (e.time, e.n, e.mean, name))
	def stats(self, name):
		return self.entries[name]
	def __getitem__(self, name): return self.entries[name]
	def t(self, name): return self.entries[name].last

class _Mark:
	def __init__(self, bench, name):
		self.bench, self.name = bench, name
	def __enter__(self):
		if self.bench.sync: _sync()
		self.t1 = time.perf_counter()
		return self
	def __exit__(self, *args):
		if self.bench.sync: _sync()
		self.bench.add(self.name, time.perf_counter() - self.t1)

# global instance, like the reference's module-level bench (bench.py:96)
_global = Bench()
mark = _global.mark
show = _global.show
add  = _global.add
stats = _global.entries
def t(name): return _global.t(name)
