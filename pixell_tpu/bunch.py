"""Bunch: a dict with attribute access (reference pixell/bunch.py:4).
Includes HDF5 read/write helpers."""
from __future__ import annotations
import numpy as np


class Bunch:
	def __init__(self, *args, **kwargs):
		self._dict = {}
		for a in args:
			self._dict.update(a if isinstance(a, dict) else a._dict)
		self._dict.update(kwargs)
	def __getattr__(self, name):
		if name.startswith("_"): raise AttributeError(name)
		try: return self.__dict__["_dict"][name]
		except KeyError: raise AttributeError(name)
	def __setattr__(self, name, val):
		if name == "_dict": return object.__setattr__(self, name, val)
		self._dict[name] = val
	def __delattr__(self, name):
		del self._dict[name]
	def __getitem__(self, name): return self._dict[name]
	def __setitem__(self, name, val): self._dict[name] = val
	def __delitem__(self, name): del self._dict[name]
	def __contains__(self, name): return name in self._dict
	def __iter__(self): return iter(self._dict)
	def __len__(self): return len(self._dict)
	def keys(self): return self._dict.keys()
	def values(self): return self._dict.values()
	def items(self): return self._dict.items()
	def update(self, other):
		self._dict.update(other._dict if isinstance(other, Bunch) else other)
		return self
	def copy(self): return Bunch(dict(self._dict))
	def get(self, key, default=None): return self._dict.get(key, default)
	def setdefault(self, key, default=None): return self._dict.setdefault(key, default)
	def __repr__(self):
		keys = sorted(self._dict.keys())
		return "Bunch(" + ", ".join("%s=%s" % (k, _brepr(self._dict[k])) for k in keys) + ")"

def _brepr(v):
	try:
		if isinstance(v, np.ndarray): return "array[%s]" % ",".join(map(str, v.shape))
		return repr(v)
	except Exception:
		return "<?>"

def concatenate(bunches):
	"""Concatenate array entries of several bunches with the same keys."""
	keys = bunches[0].keys()
	res = Bunch()
	for k in keys:
		res[k] = np.concatenate([np.atleast_1d(b[k]) for b in bunches])
	return res

def write(fname, bunch):
	import h5py
	with h5py.File(fname, "w") as f:
		_write_group(f, bunch)

def _write_group(g, bunch):
	for k, v in bunch.items():
		if isinstance(v, Bunch):
			_write_group(g.create_group(k), v)
		elif isinstance(v, str):
			g[k] = np.bytes_(v)
		else:
			g[k] = v

def read(fname, group=None):
	import h5py
	with h5py.File(fname, "r") as f:
		g = f[group] if group else f
		return _read_group(g)

def _read_group(g):
	import h5py
	res = Bunch()
	for k, v in g.items():
		if isinstance(v, h5py.Group):
			res[k] = _read_group(v)
		else:
			val = v[()]
			if isinstance(val, bytes): val = val.decode()
			res[k] = val
	return res
