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
	@property
	def ntot(self):
		"""Total number of stored elements (reference multimap.ndmaps.ntot:30)."""
		return int(np.prod(self.pre, dtype=int))*sum(self.npixs)
	def contig(self):
		"""Contiguous copy (reference multimap.ndmaps.contig:23); jax buffers
		are contiguous already."""
		return self.copy()
	def flat(self):
		"""Flattened single-buffer view [*pre, totpix]."""
		parts = [jnp.asarray(m.data).reshape(self.pre + (-1,)) for m in self.maps]
		return jnp.concatenate(parts, -1)
	# geometry queries mapped over the member maps (reference ndmaps:40-45)
	def posmap(self, safe=True, corner=False, separable="auto", dtype=np.float64):
		return posmap(self.geometries, safe=safe, corner=corner,
			separable=separable, dtype=dtype)
	def pixmap(self, dtype=np.float64): return pixmap(self.geometries, dtype=dtype)
	def pixsize(self, dtype=np.float64): return pixsize(self.geometries, dtype=dtype)
	def lmap(self, oversample=1, dtype=np.float64):
		return lmap(self.geometries, dtype=dtype)
	def modlmap(self, oversample=1, dtype=np.float64):
		return modlmap(self.geometries, dtype=dtype)
	def modrmap(self, ref="center", safe=True, corner=False, dtype=np.float64):
		return modrmap(self.geometries, ref=ref, safe=safe, corner=corner, dtype=dtype)
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


# ---------------------------------------------------------------------------
# Per-map mapped operations (reference multimap.py:124-250): each is the
# enmap operation applied map-by-map, returning a new ndmaps (or a list for
# geometry queries).
# ---------------------------------------------------------------------------
def multimap(maps):
	"""Construct an ndmaps from a list of enmaps (reference
	multimap.multimap:67)."""
	return ndmaps(maps)

def nopre(geometries):
	"""Strip pre-dimensions from a list of geometries (reference
	multimap.nopre:165)."""
	return [(tuple(s[-2:]), w) for s, w in geometries]

def posmap(geometries, safe=True, corner=False, separable="auto", dtype=np.float64):
	return ndmaps([enmap.posmap(s, w, safe=safe, corner=corner) for s, w in geometries])

def pixmap(geometries, dtype=np.float64):
	return ndmaps([enmap.pixmap(s, w) for s, w in geometries])

def lmap(geometries, dtype=np.float64):
	return ndmaps([enmap.lmap(s, w) for s, w in geometries])

def modlmap(geometries, dtype=np.float64):
	return ndmaps([enmap.modlmap(s, w) for s, w in geometries])

def modrmap(geometries, ref="center", safe=True, corner=False, dtype=np.float64):
	return ndmaps([enmap.modrmap(s, w, ref=ref, safe=safe, corner=corner)
		for s, w in geometries])

def pixsize(geometries, dtype=np.float64):
	return np.array([enmap.pixsize(s, w) for s, w in geometries])

def pixsizemap(geometries, dtype=np.float64):
	return ndmaps([enmap.pixsizemap(s, w) for s, w in geometries])

def map_mul(mat, vec):
	"""Matrix multiply along pre-dims, map by map (reference
	multimap.map_mul:169)."""
	return ndmaps([enmap.map_mul(m, v) for m, v in zip(mat.maps, vec.maps)],
		vec.pre)

def mean(mmap):
	"""Area-weighted mean over all maps (reference multimap.mean:180)."""
	tot, area = 0, 0
	for m in mmap.maps:
		ps = np.asarray(enmap.pixsizemap(m.shape, m.wcs, broadcastable=True))
		tot = tot + jnp.sum(jnp.asarray(m.data)*ps, (-2, -1))
		area = area + np.sum(ps*np.ones(m.shape[-2:]))
	return tot/area

def median(mmap):
	return jnp.median(mmap.flat(), -1)

def max(mmap):
	return jnp.max(mmap.flat(), -1)

def min(mmap):
	return jnp.min(mmap.flat(), -1)

def var(mmap):
	"""Area-weighted variance (reference multimap.var:196)."""
	mu = mean(mmap)
	tot, area = 0, 0
	for m in mmap.maps:
		ps = np.asarray(enmap.pixsizemap(m.shape, m.wcs, broadcastable=True))
		mu_b = jnp.asarray(mu)[..., None, None] if np.ndim(mu) else mu
		tot = tot + jnp.sum((jnp.asarray(m.data) - mu_b)**2*ps, (-2, -1))
		area = area + np.sum(ps*np.ones(m.shape[-2:]))
	return tot/area

def std(mmap):
	return var(mmap)**0.5

def _permap(fun, mmap, **kw):
	return ndmaps([fun(m, **kw) for m in mmap.maps], mmap.pre)

def fft(mmap, omap=None, nthread=0, normalize=True, adjoint_ifft=False, dct=False):
	return _permap(enmap.fft, mmap, normalize=normalize)

def ifft(mmap, omap=None, nthread=0, normalize=True, adjoint_fft=False, dct=False):
	return _permap(enmap.ifft, mmap, normalize=normalize)

def dct(emap, omap=None, nthread=0, normalize=True):
	return _permap(enmap.dct, emap, normalize=normalize)

def idct(emap, omap=None, nthread=0, normalize=True):
	return _permap(enmap.idct, emap, normalize=normalize)

def fft_adjoint(emap, omap=None, nthread=0, normalize=True):
	"""Adjoint of fft = ifft up to normalization (reference
	multimap.fft_adjoint:220)."""
	return _permap(enmap.ifft, emap, normalize=normalize)

def ifft_adjoint(emap, omap=None, nthread=0, normalize=True):
	return _permap(enmap.fft, emap, normalize=normalize)

def dct_adjoint(emap, omap=None, nthread=0, normalize=True):
	return _permap(enmap.idct, emap, normalize=normalize)

def idct_adjoint(emap, omap=None, nthread=0, normalize=True):
	return _permap(enmap.dct, emap, normalize=normalize)

def map2harm(mmap, nthread=0, normalize=True, iau=False, spin=[0, 2],
		adjoint_harm2map=False):
	return _permap(enmap.map2harm, mmap, normalize=normalize, iau=iau, spin=spin)

def harm2map(mmap, nthread=0, normalize=True, iau=False, spin=[0, 2],
		keep_imag=False, adjoint_map2harm=False):
	return _permap(enmap.harm2map, mmap, normalize=normalize, iau=iau,
		spin=spin, keep_imag=keep_imag)

def map2harm_adjoint(mmap, nthread=0, normalize=True, iau=False, spin=[0, 2],
		keep_imag=False):
	return _permap(enmap.map2harm_adjoint, mmap, normalize=normalize, iau=iau,
		spin=spin)

def harm2map_adjoint(mmap, nthread=0, normalize=True, iau=False, spin=[0, 2]):
	return _permap(enmap.harm2map_adjoint, mmap, normalize=normalize, iau=iau,
		spin=spin)

def queb_rotmat(lmap, inverse=False, iau=False, spin=2):
	mats = [enmap.queb_rotmat(jnp.asarray(m.data), inverse=inverse, iau=iau,
		spin=spin) for m in lmap.maps]
	return ndmaps([enmap.samewcs(r, m) for r, m in zip(mats, lmap.maps)])

def rotate_pol(mmap, angle, comps=[-2, -1]):
	return _permap(enmap.rotate_pol, mmap, angle=angle, comps=comps)

def write_map(fname, mmap, extra={}):
	"""Write a multimap to a single FITS file with one HDU per map
	(reference multimap.write_map:253)."""
	from . import fits_io
	import io
	# store as our hdf-style container for simplicity and exactness
	write_maps(fname, mmap)

def read_map(fname, sel=None, box=None, wrap="auto", mode=None,
		sel_threshold=10e6, verbose=False):
	return read_maps(fname)
