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
	def iteritems(self): return iter(self._dict.items())
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


# ---------------------------------------------------------------------------
# HDF5 bunch IO with path/group syntax (reference bunch.py:62-160)
# ---------------------------------------------------------------------------
def is_hdf_path(fname):
	"""Does fname look like an hdf path (possibly with /group suffix)?
	(reference bunch.is_hdf_path:136)."""
	try:
		split_hdf_path(fname)
		return True
	except ValueError:
		return False

def split_hdf_path(fname, subgroup=None, mode="dot"):
	"""Split 'path.hdf/group' into (path, group) (reference
	bunch.split_hdf_path:140). mode 'dot' takes the last component with a
	dot as the file name; 'exists' checks the filesystem; 'none' skips."""
	import os
	if mode == "none": return fname, subgroup
	toks = fname.split("/")
	if mode == "dot":
		for i, tok in reversed(list(enumerate(toks))):
			if "." in tok: break
		else:
			raise ValueError("Could not split hdf path using 'dot' method: no . found")
	elif mode == "exists":
		for i in reversed(range(len(toks))):
			cand = "/".join(toks[:i+1])
			if os.path.isfile(cand): break
		else:
			raise ValueError("Could not split hdf path: no existing file found")
	else:
		raise ValueError("Unknown split mode '%s'" % mode)
	fname2 = "/".join(toks[:i+1])
	group = "/".join(toks[i+1:]) or None
	if subgroup:
		group = group + "/" + subgroup if group else subgroup
	return fname2, group

def encode(val):
	"""Encode strings/None for hdf storage (reference bunch.encode:112)."""
	if isinstance(val, np.ndarray):
		try: return np.char.encode(val)
		except (TypeError, AttributeError): return val
	if isinstance(val, str): return val.encode()
	if val is None: return "__None__".encode()
	return val

def decode(val):
	"""Inverse of encode (reference bunch.decode:124)."""
	if isinstance(val, np.ndarray):
		try: return np.char.decode(val)
		except (TypeError, AttributeError): return val
	if isinstance(val, bytes):
		val = val.decode()
		if val == "__None__": return None
		return val
	return val

def read_hdf(fname, group=None, gmode="dot"):
	"""Read a Bunch from an hdf file or open group (reference
	bunch.read_hdf:72)."""
	import h5py
	if isinstance(fname, (h5py.Group, h5py.File)):
		node = fname[group] if group is not None else fname
		return read_hdf_recursive(node)
	if group is None:
		fname, group = split_hdf_path(fname, group, mode=gmode)
	with h5py.File(fname, "r") as hfile:
		node = hfile[group] if group else hfile
		return read_hdf_recursive(node)

def read_hdf_recursive(hfile):
	import h5py
	if isinstance(hfile, h5py.Dataset):
		return decode(hfile[()])
	res = Bunch()
	for key in hfile:
		res[key] = read_hdf_recursive(hfile[key])
	return res

def write_hdf(fname, bunch, group=None, gmode="dot"):
	import h5py
	if group is None:
		fname, group = split_hdf_path(fname, group, mode=gmode)
	with h5py.File(fname, "w") as hfile:
		node = hfile.create_group(group) if group else hfile
		write_hdf_recursive(node, bunch)

def write_hdf_recursive(hfile, bunch):
	for key in bunch:
		if isinstance(bunch[key], Bunch):
			hfile.create_group(key)
			write_hdf_recursive(hfile[key], bunch[key])
		else:
			hfile[key] = encode(bunch[key])
