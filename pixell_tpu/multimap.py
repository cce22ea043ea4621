"""ndmaps: a collection of maps with different geometries acting as one
object (reference pixell/multimap.py). Natural pytree: a tuple of ndmaps
plus shared pre-dimensions; also exposes the flat-buffer view the reference
uses for solvers."""
from __future__ import annotations
import numpy as np
import jax
import jax.numpy as jnp
from . import enmap, utils


class ndmaps:
	"""Multiple ndmaps with common pre-dimensions. Arithmetic acts on all
	maps; .maps gives the individual ndmap views (reference multimap.ndmaps:5)."""
	def __init__(self, maps, pre=None):
		maps = [m if isinstance(m, enmap.ndmap) else enmap.ndmap(*m) for m in maps]
		self.maps = list(maps)
		if pre is None:
			pre = maps[0].shape[:-2] if maps else ()
		self.pre = tuple(pre)
	# --- basic info
	@property
	def nmap(self): return len(self.maps)
	@property
	def geometries(self): return [m.geometry for m in self.maps]
	@property
	def npixs(self): return [m.npix() for m in self.maps]
	@property
	def size(self): return sum(m.size for m in self.maps)
	@property
	def dtype(self): return self.maps[0].dtype
	@property
	def ndim(self): return len(self.pre) + 1
	@property
	def shape(self): return self.pre + (sum(self.npixs),)
	def flat(self):
		"""Flattened single-buffer view [*pre, totpix]."""
		parts = [jnp.asarray(m.data).reshape(self.pre + (-1,)) for m in self.maps]
		return jnp.concatenate(parts, -1)
	def copy(self): return ndmaps([m.copy() for m in self.maps], self.pre)
	def astype(self, dtype): return ndmaps([m.astype(dtype) for m in self.maps], self.pre)
	def __len__(self): return self.nmap
	def __getitem__(self, i):
		if isinstance(i, (int, np.integer)): return self.maps[i]
		return ndmaps([m[i] for m in self.maps])
	def __iter__(self): return iter(self.maps)
	def __repr__(self):
		return "ndmaps(pre=%s,%s)" % (str(self.pre),
			",".join("(%s)" % str(m.shape[-2:]) for m in self.maps))
	# --- pytree
	def tree_flatten(self):
		return tuple(self.maps), (self.pre,)
	@classmethod
	def tree_unflatten(cls, aux, children):
		return cls(list(children), aux[0])

def _mm_binop(name):
	import operator
	op = getattr(operator, name)
	def fun(self, other):
		if isinstance(other, ndmaps):
			return ndmaps([enmap.ndmap(op(jnp.asarray(a.data), jnp.asarray(b.data)), a.wcs)
				for a, b in zip(self.maps, other.maps)], self.pre)
		return ndmaps([enmap.ndmap(op(jnp.asarray(a.data), other), a.wcs)
			for a in self.maps], self.pre)
	return fun

for _n in ["add", "sub", "mul", "truediv", "pow"]:
	setattr(ndmaps, "__%s__" % _n, _mm_binop(_n))
	setattr(ndmaps, "__r%s__" % _n, _mm_binop(_n))
ndmaps.__neg__ = lambda self: ndmaps([-m for m in self.maps], self.pre)

jax.tree_util.register_pytree_node(ndmaps,
	lambda m: m.tree_flatten(),
	lambda aux, ch: ndmaps.tree_unflatten(aux, ch))


def zeros(geometries, dtype=np.float64):
	"""ndmaps of zeros over a list of (shape, wcs) geometries
	(reference multimap.zeros:86)."""
	return ndmaps([enmap.zeros(s, w, dtype) for s, w in geometries])

def empty(geometries, dtype=np.float64):
	return zeros(geometries, dtype)

def full(geometries, val, dtype=np.float64):
	return ndmaps([enmap.full(s, w, val, dtype) for s, w in geometries])

def from_flat(arr, geometries, pre=None):
	"""Inverse of .flat(): split a flat buffer into the given geometries."""
	arr = jnp.asarray(arr)
	if pre is None: pre = arr.shape[:-1]
	maps = []
	off = 0
	for shape, wcs in geometries:
		n = int(np.prod(shape[-2:]))
		maps.append(enmap.ndmap(arr[..., off:off+n].reshape(tuple(pre) + tuple(shape[-2:])), wcs))
		off += n
	return ndmaps(maps, pre)

def map_union(a, b):
	return ndmaps([x + y for x, y in zip(a.maps, b.maps)])

def samegeos(arr, *args):
	for a in (arr,) + args:
		if isinstance(a, ndmaps): return ndmaps(list(arr.maps) if isinstance(arr, ndmaps) else arr)
	return arr

def write_maps(fname, mm):
	import h5py
	with h5py.File(fname, "w") as f:
		for i, m in enumerate(mm.maps):
			g = f.create_group("map%d" % i)
			g["data"] = np.asarray(m)
			for k, v in m.wcs.to_header().items():
				g.attrs["wcs_" + k] = v

def read_maps(fname):
	import h5py
	from . import wcsutils
	maps = []
	with h5py.File(fname, "r") as f:
		names = sorted([k for k in f.keys() if k.startswith("map")],
			key=lambda s: int(s[3:]))
		for name in names:
			g = f[name]
			hdr = {k[4:]: (v.decode() if isinstance(v, bytes) else v)
				for k, v in g.attrs.items() if k.startswith("wcs_")}
			maps.append(enmap.ndmap(g["data"][()], wcsutils.WCS(header=hdr)))
	return ndmaps(maps)
