"""ndmap: sky maps as (array, WCS) pairs — the core container.

TPU-native re-design of the reference's numpy-subclass ndmap
(pixell/enmap.py:33-163). Here ndmap is a jax-pytree wrapper holding either a
jax or numpy array plus an analytic WCS. All geometry math (pix2sky, lmap,
extent, ...) is closed-form and traceable for cylindrical projections; host
glue (slicing bookkeeping, I/O) is numpy.
"""
from __future__ import annotations
import operator
import numpy as np
from . import utils, wcsutils

try:
	import jax
	import jax.numpy as jnp
	_have_jax = True
except ImportError:  # pragma: no cover
	_have_jax = False


def _is_jax(arr):
	return _have_jax and isinstance(arr, jnp.ndarray) and not isinstance(arr, np.ndarray)

def _xp_of(arr):
	return jnp if _is_jax(arr) else np

def get_unit(wcs):
	"""Maps are in radians unless plain (reference enmap.get_unit)."""
	return 1.0 if wcsutils.is_plain(wcs) else utils.degree


class ndmap:
	"""A map: array-like data + wcs. Registered as a jax pytree with the wcs
	as static aux data, so ndmaps pass through jit/vmap/grad transparently.

	Supports numpy-style arithmetic, slicing (wcs-aware on the two pixel
	axes), and a jax-style ``.at[...]`` updater. Reference: pixell/enmap.py:33."""
	__slots__ = ("data", "wcs")

	def __init__(self, arr, wcs, copy=False, dtype=None):
		if isinstance(arr, ndmap): arr = arr.data
		if dtype is not None or copy:
			xp = _xp_of(arr) if not isinstance(arr, (list, tuple)) else np
			arr = xp.array(arr, dtype=dtype) if copy else xp.asarray(arr, dtype=dtype)
		self.data = arr
		self.wcs  = wcs

	# ----- basic introspection -----
	@property
	def shape(self): return self.data.shape
	@property
	def ndim(self): return self.data.ndim
	@property
	def dtype(self): return self.data.dtype
	@property
	def size(self): return self.data.size
	@property
	def nbytes(self): return self.data.size*self.data.dtype.itemsize
	@property
	def geometry(self): return tuple(self.shape), self.wcs
	@property
	def T(self): return ndmap(self.data.T, self.wcs)
	@property
	def real(self): return ndmap(self.data.real, self.wcs)
	@property
	def imag(self): return ndmap(self.data.imag, self.wcs)
	def __len__(self): return len(self.data)
	def __repr__(self):
		return "ndmap(%s,%s)" % (repr(self.data), wcsutils.describe(self.wcs))
	def __str__(self): return repr(self)

	# ----- conversion -----
	def __array__(self, dtype=None, copy=None):
		return np.asarray(self.data, dtype=dtype)
	def __jax_array__(self):
		return jnp.asarray(self.data)
	def asjax(self):
		return ndmap(jnp.asarray(self.data), self.wcs)
	def asnumpy(self):
		return ndmap(np.asarray(self.data), self.wcs)
	def astype(self, dtype, copy=True):
		return ndmap(self.data.astype(dtype), self.wcs)
	def copy(self, order=None):
		xp = _xp_of(self.data)
		return ndmap(xp.array(self.data), self.wcs)
	def block_until_ready(self):
		if _is_jax(self.data): self.data.block_until_ready()
		return self
	def item(self): return self.data.item()

	# ----- array methods -----
	def reshape(self, *shape):
		if len(shape) == 1 and isinstance(shape[0], (tuple, list)): shape = tuple(shape[0])
		return ndmap(self.data.reshape(shape), self.wcs)
	def sum(self, *a, **kw):  return self.data.sum(*a, **kw)
	def mean(self, *a, **kw): return self.data.mean(*a, **kw)
	def std(self, *a, **kw):  return self.data.std(*a, **kw)
	def var(self, *a, **kw):  return self.data.var(*a, **kw)
	def min(self, *a, **kw):  return self.data.min(*a, **kw)
	def max(self, *a, **kw):  return self.data.max(*a, **kw)
	def conj(self):           return ndmap(self.data.conj(), self.wcs)
	def ravel(self, *a, **kw):   return self.data.ravel(*a, **kw)
	def flatten(self, *a, **kw):
		d = self.data
		return d.flatten(*a, **kw) if hasattr(d, "flatten") else d.ravel(*a, **kw)
	def fill(self, val):
		xp = _xp_of(self.data)
		self.data = xp.full_like(self.data, val) if _is_jax(self.data) else self.data
		if not _is_jax(self.data): np.asarray(self.data).fill(val)
		return self
	def preflat(self):
		"""View with all pre-dimensions flattened into one."""
		return self.reshape((-1,) + tuple(self.shape[-2:]))
	def npix(self): return int(np.prod(self.shape[-2:]))

	# ----- geometry methods (delegate to module functions) -----
	def box(self, npoint=10, corner=True): return box(self.shape, self.wcs, npoint=npoint, corner=corner)
	def posmap(self, safe=True, corner=False, separable="auto", dtype=np.float64):
		return posmap(self.shape, self.wcs, safe=safe, corner=corner, separable=separable, dtype=dtype)
	def posaxes(self, safe=True, corner=False, dtype=np.float64):
		return posaxes(self.shape, self.wcs, safe=safe, corner=corner, dtype=dtype)
	def pixmap(self): return pixmap(self.shape, self.wcs)
	def laxes(self, oversample=1, method="auto"): return laxes(self.shape, self.wcs, oversample=oversample, method=method)
	def lmap(self, oversample=1): return lmap(self.shape, self.wcs, oversample=oversample)
	def modlmap(self, oversample=1, min=0): return modlmap(self.shape, self.wcs, oversample=oversample, min=min)
	def modrmap(self, ref="center", safe=True, corner=False):
		return modrmap(self.shape, self.wcs, ref=ref, safe=safe, corner=corner)
	def lform(self): return lform(self)
	def pix2sky(self, pix, safe=True, corner=False): return pix2sky(self.shape, self.wcs, pix, safe, corner)
	def sky2pix(self, coords, safe=True, corner=False): return sky2pix(self.shape, self.wcs, coords, safe, corner)
	def pix2l(self, pix): return pix2l(self.shape, self.wcs, pix)
	def l2pix(self, ls):  return l2pix(self.shape, self.wcs, ls)
	def contains(self, pos, unit="coord"): return contains(self.shape, self.wcs, pos, unit=unit)
	def corners(self, npoint=10, corner=True): return corners(self.shape, self.wcs, npoint=npoint, corner=corner)
	def center(self): return center(self.shape, self.wcs)
	def extent(self, method="auto", signed=False): return extent(self.shape, self.wcs, method=method, signed=signed)
	def area(self, method="auto"): return area(self.shape, self.wcs, method=method)
	def pixsize(self): return pixsize(self.shape, self.wcs)
	def pixshape(self, signed=False): return pixshape(self.shape, self.wcs, signed=signed)
	def pixsizemap(self, separable="auto", broadcastable=False):
		return pixsizemap(self.shape, self.wcs, separable=separable, broadcastable=broadcastable)
	def pixshapemap(self, separable="auto", signed=False):
		return pixshapemap(self.shape, self.wcs, separable=separable, signed=signed)
	def extract(self, shape, wcs, omap=None, wrap="auto", op=None, cval=0, iwcs=None, reverse=False):
		return extract(self, shape, wcs, omap=omap, wrap=wrap, op=op, cval=cval, iwcs=iwcs, reverse=reverse)
	def extract_pixbox(self, pixbox, omap=None, wrap="auto", op=None, cval=0, iwcs=None, reverse=False):
		return extract_pixbox(self, pixbox, omap=omap, wrap=wrap, op=op, cval=cval, iwcs=iwcs, reverse=reverse)
	def insert(self, imap, wrap="auto", op=None, cval=0, iwcs=None):
		return insert(self, imap, wrap=wrap, op=op, cval=cval, iwcs=iwcs)
	def insert_at(self, pix, imap, wrap="auto", op=None, cval=0, iwcs=None):
		return insert_at(self, pix, imap, wrap=wrap, op=op, cval=cval, iwcs=iwcs)
	def submap(self, box, mode=None, wrap="auto", recenter=False):
		return submap(self, box, mode=mode, wrap=wrap, recenter=recenter)
	def subinds(self, box, mode=None, cap=True, noflip=False, epsilon=1e-4):
		return subinds(self.shape, self.wcs, box, mode=mode, cap=cap, noflip=noflip, epsilon=epsilon)
	def stamps(self, pos, shape, aslist=False):
		return stamps(self, pos, shape, aslist=aslist)
	def project(self, shape, wcs, order=3, border="constant", cval=0.0, safe=True):
		return project(self, shape, wcs, order=order, border=border, cval=cval, safe=safe)
	def at(self_map, pos, order=3, border="constant", cval=0.0, safe=True, unit="coord"):
		return at(self_map, pos, order=order, border=border, cval=cval, safe=safe, unit=unit)
	def autocrop(self, method="plain", value="auto", margin=0, factors=None, return_info=False):
		return autocrop(self, method=method, value=value, margin=margin, factors=factors, return_info=return_info)
	def apod(self, width, profile="cos", fill="zero"): return apod(self, width, profile=profile, fill=fill)
	def downgrade(self, factor, op=None, ref=None, off=None):
		return downgrade(self, factor, op=op, ref=ref, off=off)
	def upgrade(self, factor, off=None, oshape=None, inclusive=False):
		return upgrade(self, factor, off=off, oshape=oshape, inclusive=inclusive)
	def fillbad(self, val=0, inplace=False): return fillbad(self, val=val, inplace=inplace)
	def to_healpix(self, nside=0, order=3, omap=None, chunk=100000, destroy_input=False):
		from . import reproject
		return reproject.map2healpix(self, nside=nside, order=order)
	def wrap(self): return self
	def write(self, fname, fmt=None):
		write_map(fname, self, fmt=fmt)
	def argmax(self, unit="coord"): return argmax(self, unit=unit)
	def argmin(self, unit="coord"): return argmin(self, unit=unit)
	def pixbox_of(self, oshape, owcs): return pixbox_of(self.wcs, oshape, owcs)
	def padslice(self, box, default=np.nan): return padslice(self, box, default=default)
	def plain(self):
		"""Drop sky information: same data on a plain coordinate system
		(reference enmap.ndmap.plain:116)."""
		return ndmap(self.data, wcsutils.explicit(crpix=[1, 1], crval=[0, 0],
			cdelt=[1, 1]))
	def lbin(self, bsize=None, brel=1.0, return_nhit=False, lop=None):
		return lbin(self, bsize=bsize, brel=brel, return_nhit=return_nhit, lop=lop)
	def rbin(self, center=[0, 0], bsize=None, brel=1.0, return_nhit=False):
		return rbin(self, center=center, bsize=bsize, brel=brel, return_nhit=return_nhit)
	def lpixsize(self, signed=False, method="auto"):
		return lpixsize(self.shape, self.wcs, signed=signed, method=method)
	def lpixshape(self, signed=False, method="auto"):
		return lpixshape(self.shape, self.wcs, signed=signed, method=method)
	def resample(self, oshape, off=(0, 0), method="fft", border="wrap",
			corner=True, order=3):
		return resample(self, oshape, method=method, mode=border,
			corner=corner, order=order)
	def to_flipper(self, omap=None, unpack=True):
		return to_flipper(self, omap=omap, unpack=unpack)
	def distance_from(self, points, omap=None, odomains=None, domains=False,
			method="auto", rmax=None, step=1024):
		return distance_from(self.shape, self.wcs, points, omap=omap,
			odomains=odomains, domains=domains, method=method, rmax=rmax, step=step)
	def distance_transform(self, omap=None, rmax=None, method="auto"):
		return distance_transform(self, omap=omap, rmax=rmax, method=method)
	def labeled_distance_transform(self, omap=None, odomains=None, rmax=None,
			method="auto"):
		return labeled_distance_transform(self, omap=omap, odomains=odomains,
			rmax=rmax, method=method)

	# ----- fourier/harmonic methods -----
	def fft(self, omap=None, nthread=0, normalize=True, adjoint_ifft=False, dct=False):
		return fft(self, omap=omap, nthread=nthread, normalize=normalize, adjoint_ifft=adjoint_ifft, dct=dct)
	def ifft(self, omap=None, nthread=0, normalize=True, adjoint_fft=False, dct=False):
		return ifft(self, omap=omap, nthread=nthread, normalize=normalize, adjoint_fft=adjoint_fft, dct=dct)

	# ----- pytree protocol -----
	def tree_flatten(self):
		return (self.data,), (self.wcs,)
	@classmethod
	def tree_unflatten(cls, aux, children):
		return cls(children[0], aux[0])

	# ----- indexing -----
	def __getitem__(self, sel):
		# Split selection into pre-dim part and pixel part (reference enmap.py:125)
		sel1, sel2 = utils.split_slice(sel, [self.ndim-2, 2])
		if len(sel2) > 2:
			raise IndexError("too many indices")
		# Pure pre-dimension slice: keep wcs
		if len(sel2) == 0:
			return ndmap(self.data[sel], self.wcs)
		# If integers index the pixel axes, the result is no longer a map
		if any(isinstance(s, (int, np.integer)) for s in sel2):
			return self.data[sel]
		if any(s is None for s in sel2):
			return self.data[sel]
		# Slice the geometry
		_, wcs = slice_geometry(self.shape[-2:], self.wcs, sel2)
		return ndmap(self.data[sel], wcs)

	def __setitem__(self, sel, val):
		if isinstance(val, ndmap): val = val.data
		if _is_jax(self.data):
			self.data = self.data.at[sel].set(val)
		else:
			self.data[sel] = np.asarray(val)

	@property
	def at_(self):
		return _NdmapAt(self)

	def __iter__(self):
		for i in range(self.shape[0]):
			yield self[i]


class _NdmapAt:
	"""jax-style functional updates preserving the wcs: m.at_[sel].set(v)."""
	def __init__(self, m): self.m = m
	def __getitem__(self, sel):
		return _NdmapAtSel(self.m, sel)

class _NdmapAtSel:
	def __init__(self, m, sel): self.m, self.sel = m, sel
	def _apply(self, op, val):
		data = self.m.data
		if isinstance(val, ndmap): val = val.data
		if _is_jax(data):
			data = getattr(data.at[self.sel], op)(val)
		else:
			data = data.copy()
			if   op == "set": data[self.sel] = val
			elif op == "add": data[self.sel] += val
			elif op == "multiply": data[self.sel] *= val
			elif op == "max": data[self.sel] = np.maximum(data[self.sel], val)
			elif op == "min": data[self.sel] = np.minimum(data[self.sel], val)
		return ndmap(data, self.m.wcs)
	def set(self, val): return self._apply("set", val)
	def add(self, val): return self._apply("add", val)
	def multiply(self, val): return self._apply("multiply", val)
	def max(self, val): return self._apply("max", val)
	def min(self, val): return self._apply("min", val)


def _binop(name, op, reflected=False):
	def fun(self, other):
		oval = other.data if isinstance(other, ndmap) else other
		try:
			res = op(oval, self.data) if reflected else op(self.data, oval)
		except TypeError:
			return NotImplemented
		return ndmap(res, self.wcs)
	fun.__name__ = name
	return fun

for _name, _op in [("add", operator.add), ("sub", operator.sub), ("mul", operator.mul),
		("truediv", operator.truediv), ("floordiv", operator.floordiv),
		("mod", operator.mod), ("pow", operator.pow), ("and", operator.and_),
		("or", operator.or_), ("xor", operator.xor), ("lshift", operator.lshift),
		("rshift", operator.rshift), ("matmul", operator.matmul)]:
	setattr(ndmap, "__%s__" % _name, _binop("__%s__" % _name, _op))
	setattr(ndmap, "__r%s__" % _name, _binop("__r%s__" % _name, _op, reflected=True))
	setattr(ndmap, "__i%s__" % _name, _binop("__i%s__" % _name, _op))
for _name, _op in [("lt", operator.lt), ("le", operator.le), ("gt", operator.gt),
		("ge", operator.ge), ("eq", operator.eq), ("ne", operator.ne)]:
	setattr(ndmap, "__%s__" % _name, _binop("__%s__" % _name, _op))
ndmap.__neg__ = lambda self: ndmap(-self.data, self.wcs)
ndmap.__pos__ = lambda self: self
ndmap.__abs__ = lambda self: ndmap(abs(self.data), self.wcs)
ndmap.__invert__ = lambda self: ndmap(~self.data, self.wcs)

if _have_jax:
	jax.tree_util.register_pytree_node(ndmap,
		lambda m: m.tree_flatten(),
		lambda aux, ch: ndmap.tree_unflatten(aux, ch))


def samewcs(arr, *args):
	"""Return arr wrapped in an ndmap with the wcs of the first ndmap among
	args (or arr itself). Reference enmap.samewcs."""
	for a in (arr,) + args:
		if isinstance(a, ndmap):
			return ndmap(arr.data if isinstance(arr, ndmap) else arr, a.wcs)
	return arr


# ---------------------------------------------------------------------------
# Constructors (reference enmap.py:379-434)
# ---------------------------------------------------------------------------
def enmap(arr, wcs=None, dtype=None, copy=True):
	"""Construct an ndmap from data (reference enmap.enmap:379)."""
	if wcs is None:
		if isinstance(arr, ndmap): wcs = arr.wcs
		elif isinstance(arr, (list, tuple)) and len(arr) > 0 and isinstance(arr[0], ndmap):
			wcs = arr[0].wcs
			arr = np.asarray([np.asarray(a) for a in arr])
		else: wcs = wcsutils.WCS(naxis=2)
	if isinstance(arr, ndmap): arr = arr.data
	if isinstance(arr, (list, tuple)): arr = np.asarray(arr, dtype=dtype)
	xp = _xp_of(arr)
	if copy: arr = xp.array(arr, dtype=dtype)
	elif dtype is not None: arr = xp.asarray(arr, dtype=dtype)
	return ndmap(arr, wcs)

def empty(shape, wcs=None, dtype=None):
	return zeros(shape, wcs=wcs, dtype=dtype)

def zeros(shape, wcs=None, dtype=None):
	if wcs is None: wcs = wcsutils.WCS(naxis=2)
	xp = jnp if _have_jax else np
	return ndmap(xp.zeros(shape, dtype=dtype or np.float64), wcs)

def ones(shape, wcs=None, dtype=None):
	if wcs is None: wcs = wcsutils.WCS(naxis=2)
	xp = jnp if _have_jax else np
	return ndmap(xp.ones(shape, dtype=dtype or np.float64), wcs)

def full(shape, wcs, val, dtype=None):
	xp = jnp if _have_jax else np
	return ndmap(xp.full(shape, val, dtype=dtype), wcs)


class Geometry:
	"""A (shape, wcs) pair with slicing support (reference enmap.py:300)."""
	def __init__(self, shape, wcs=None):
		try: shape, wcs = tuple(shape.shape), shape.wcs
		except AttributeError: pass
		if isinstance(shape, Geometry): shape, wcs = shape.shape, shape.wcs
		self.shape = tuple(shape)
		self.wcs   = wcs
	@property
	def npix(self): return int(np.prod(self.shape[-2:]))
	@property
	def nopre(self): return Geometry(self.shape[-2:], self.wcs)
	def submap(self, box=None, pixbox=None):
		if pixbox is None:
			pixbox = subinds(self.shape, self.wcs, box, noflip=True)
		shape, wcs = slice_geometry(self.shape, self.wcs,
			(slice(*pixbox[:, 0]), slice(*pixbox[:, 1])))
		return Geometry(shape, wcs)
	def scale(self, scale):
		scale = np.zeros(2) + scale
		oshape = self.shape[:-2] + tuple(utils.nint(np.array(self.shape[-2:])*scale))
		owcs = wcsutils.scale(self.wcs, scale[::-1])
		return Geometry(oshape, owcs)
	def downgrade(self, factor, op=None):
		shape, wcs = downgrade_geometry(self.shape, self.wcs, factor)
		return Geometry(shape, wcs)
	def copy(self): return Geometry(self.shape, self.wcs.deepcopy())
	def sky2pix(self, coords, safe=True, corner=False): return sky2pix(self.shape, self.wcs, coords, safe, corner)
	def pix2sky(self, pix, safe=True, corner=False): return pix2sky(self.shape, self.wcs, pix, safe, corner)
	def l2pix(self, ls):  return l2pix(self.shape, self.wcs, ls)
	def pix2l(self, pix): return pix2l(self.shape, self.wcs, pix)
	def with_pre(self, pre):
		"""Same pixel geometry with the given pre-dimensions
		(reference enmap.Geometry.with_pre:321)."""
		return Geometry(tuple(pre) + self.shape[-2:], self.wcs)
	def __getitem__(self, sel):
		sel1, sel2 = utils.split_slice(sel, [len(self.shape)-2, 2])
		shape, wcs = slice_geometry(self.shape, self.wcs, sel2)
		pre = np.empty(self.shape[:-2])[sel1].shape if len(self.shape) > 2 else ()
		return Geometry(pre + shape[-2:], wcs)
	def __iter__(self):
		yield self.shape
		yield self.wcs
	def __len__(self): return 2
	def __eq__(self, other):
		return tuple(self.shape) == tuple(other.shape) and wcsutils.equal(self.wcs, other.wcs)
	def __repr__(self): return "Geometry(%s,%s)" % (str(self.shape), wcsutils.describe(self.wcs))

def geometry_of(m): return Geometry(m.shape, m.wcs)


# ---------------------------------------------------------------------------
# Pixel <-> sky coordinates (reference enmap.py:435-560)
# ---------------------------------------------------------------------------
def pix2sky(shape, wcs, pix, safe=True, corner=False, bcheck=False):
	"""Given pixel coordinates [{y,x},...], return sky coordinates
	[{dec,ra},...] in radians (reference enmap.pix2sky:483)."""
	xp  = utils._xp(pix)
	pix = xp.asarray(pix).astype(float)
	if corner: pix = pix - 0.5
	y, x = pix[0], pix[1]
	ra, dec = wcsutils.pix2world(wcs, x, y, 0)
	unit = get_unit(wcs)
	coords = xp.stack([dec*unit, ra*unit])
	if safe and not wcsutils.is_plain(wcs):
		coords = xp.concatenate([coords[:1],
			utils.unwind(coords[1:2], refmode="middle")], 0) if coords[1].ndim > 0 else coords
	return coords

def sky2pix(shape, wcs, coords, safe=True, corner=False, bcheck=False):
	"""Given sky coordinates [{dec,ra},...] in radians, return pixel
	coordinates [{y,x},...] (reference enmap.sky2pix:496)."""
	xp     = utils._xp(coords)
	coords = xp.asarray(coords)/get_unit(wcs)
	dec, ra = coords[0], coords[1]
	x, y = wcsutils.world2pix(wcs, ra, dec, 0)
	if corner: x, y = x + 0.5, y + 0.5
	if safe and not wcsutils.is_plain(wcs):
		# Put the angle cut as far from the map as possible (reference :516)
		nx = shape[-1]
		refx = nx/2. + (0.5 if corner else 0)
		wn   = abs(360./wcs.wcs.cdelt[0])
		if safe == 1:
			x = utils.rewind(x, refx, wn)
		else:
			x = utils.unwind(x, period=wn, ref=refx, refmode="middle") if xp.asarray(x).ndim > 0 else x
	return xp.stack([xp.asarray(y), xp.asarray(x)])

def posaxes(shape, wcs, safe=True, corner=False, dtype=np.float64, bcheck=False):
	"""(dec[ny], ra[nx]) axes for separable geometries (reference :471)."""
	y = np.arange(shape[-2], dtype=float)
	x = np.arange(shape[-1], dtype=float)
	dec = pix2sky(shape, wcs, np.array([y, y*0]), safe=safe, corner=corner)[0].astype(dtype, copy=False)
	ra  = pix2sky(shape, wcs, np.array([x*0, x]), safe=safe, corner=corner)[1].astype(dtype, copy=False)
	return dec, ra

def posmap(shape, wcs, safe=True, corner=False, separable="auto", dtype=np.float64, bsize=1e6, bcheck=False):
	"""Map of the sky coordinates [{dec,ra},ny,nx] of each pixel
	(reference enmap.posmap:435)."""
	if separable == "auto": separable = wcsutils.is_separable(wcs)
	if separable:
		dec, ra = posaxes(shape, wcs, safe=safe, corner=corner, dtype=dtype)
		res = np.empty((2,) + tuple(shape[-2:]), dtype)
		res[0] = dec[:, None]
		res[1] = ra[None, :]
		return ndmap(res, wcs)
	else:
		pix = np.mgrid[:shape[-2], :shape[-1]]
		return ndmap(pix2sky(shape, wcs, pix, safe, corner).astype(dtype), wcs)

def pixmap(shape, wcs=None):
	"""Map of the pixel coordinates of each pixel (reference :478)."""
	res = np.mgrid[:shape[-2], :shape[-1]]
	return res if wcs is None else ndmap(res, wcs)

def posmap_jax(shape, wcs, safe=True, corner=False, dtype=np.float64):
	"""Jax-native separable posmap, traceable under jit."""
	y = jnp.arange(shape[-2], dtype=dtype)
	x = jnp.arange(shape[-1], dtype=dtype)
	dec = pix2sky(shape, wcs, jnp.stack([y, y*0]), safe=False, corner=corner)[0]
	ra  = pix2sky(shape, wcs, jnp.stack([x*0, x]), safe=False, corner=corner)[1]
	res = jnp.stack(jnp.broadcast_arrays(dec[:, None], ra[None, :]))
	return ndmap(res, wcs)

def pix2l(shape, wcs, pix):
	"""Fourier-pixel coords [{y,x},...] -> 2d multipole [{ly,lx},...]."""
	from . import fft as enfft
	pix    = np.asanyarray(pix)
	pshape = pixshape(shape, wcs, signed=True)
	ly = enfft.ind2freq(shape[-2], pix[0], pshape[0]/(2*np.pi))
	lx = enfft.ind2freq(shape[-1], pix[1], pshape[1]/(2*np.pi))
	return np.stack([ly, lx])

def l2pix(shape, wcs, ls):
	from . import fft as enfft
	ls     = np.asanyarray(ls)
	pshape = pixshape(shape, wcs, signed=True)
	py = enfft.freq2ind(shape[-2], ls[0], pshape[0]/(2*np.pi))
	px = enfft.freq2ind(shape[-1], ls[1], pshape[1]/(2*np.pi))
	return np.stack([py, px])

def skybox2pixbox(shape, wcs, skybox, npoint=10, corner=False, include_direction=False):
	"""Sky box [{from,to},{dec,ra}] -> pixel box [{from,to},{y,x}] (reference :528)."""
	coords = np.array([
		np.linspace(skybox[0][0], skybox[1][0], num=npoint, endpoint=True),
		np.linspace(skybox[0][1], skybox[1][1], num=npoint, endpoint=True)])
	pix = sky2pix(shape, wcs, coords, corner=corner, safe=2)
	dir = np.sign(pix[:, 1] - pix[:, 0])
	res = np.asarray(pix)[:, [0, -1]].T
	if include_direction: res = np.concatenate([res, dir[None]], 0)
	return res

def pixbox2skybox(shape, wcs, pixbox):
	return np.asarray(pix2sky(shape, wcs, np.asanyarray(pixbox).T)).T

def contains(shape, wcs, pos, unit="coord"):
	"""Whether each point pos[{dec,ra},...] lies inside the geometry."""
	if unit == "coord": pix = sky2pix(shape, wcs, pos)
	else:               pix = np.asarray(pos)
	pix = np.asarray(pix)
	return np.all((pix >= 0) & (pix.T < shape[-2:]).T, 0)

def corners(shape, wcs, npoint=10, corner=True):
	"""The [{from,to},{dec,ra}] bounding box of the geometry (reference enmap.corners)."""
	pix = np.array([[-0.5, -0.5], [shape[-2]-0.5, shape[-1]-0.5]]).T if corner else \
	      np.array([[0, 0], [shape[-2]-1., shape[-1]-1.]]).T
	return np.asarray(pix2sky(shape, wcs, pix)).T

def box(shape, wcs, npoint=10, corner=True):
	"""Bounding box of the geometry, as [{from,to},{dec,ra}]. Evaluates
	multiple points along the edges to handle curved projections."""
	ys = np.linspace(-0.5 if corner else 0, shape[-2]-(0.5 if corner else 1), npoint)
	xs = np.linspace(-0.5 if corner else 0, shape[-1]-(0.5 if corner else 1), npoint)
	# Sample along the diagonal; enough for cylindrical projections
	pix = np.array([ys, xs])
	coords = np.asarray(pix2sky(shape, wcs, pix))
	return np.array([coords[:, 0], coords[:, -1]])

def center(shape, wcs):
	return np.asarray(pix2sky(shape, wcs, np.array([(shape[-2]-1)/2., (shape[-1]-1)/2.])))


# ---------------------------------------------------------------------------
# Extent / area / pixel sizes (reference enmap.py:917-1240)
# ---------------------------------------------------------------------------
def extent(shape, wcs, nsub=None, signed=False, method="auto"):
	"""Physical extent [height, width] of the map in radians (reference :917)."""
	if method == "auto":
		if   wcsutils.is_plain(wcs): method = "intermediate"
		elif wcsutils.is_cyl(wcs):   method = "cylindrical"
		else:                        method = "subgrid"
	if   method in ["inter", "intermediate"]:
		res = np.array([shape[-2]*abs(wcs.wcs.cdelt[1]), shape[-1]*abs(wcs.wcs.cdelt[0])])*get_unit(wcs)
		sgn = np.array([np.sign(wcs.wcs.cdelt[1]), -np.sign(wcs.wcs.cdelt[0])])
	elif method in ["cyl", "cylindrical"]:
		# Dec extent is straightforward; RA extent scaled by cos(dec) at the
		# mean dec weighted by pixel area (reference extent_cyl:972)
		dec1, dec2 = np.sort([float(pix2sky(shape, wcs, np.array([-0.5, 0]))[0]),
			float(pix2sky(shape, wcs, np.array([shape[-2]-0.5, 0]))[0])])
		dec1 = max(dec1, -np.pi/2); dec2 = min(dec2, np.pi/2)
		dheight = dec2 - dec1
		if abs(dec2-dec1) > 1e-12:
			mean_cos = (np.sin(dec2) - np.sin(dec1))/(dec2 - dec1)
		else:
			mean_cos = np.cos(0.5*(dec1+dec2))
		dwidth = shape[-1]*abs(wcs.wcs.cdelt[0])*utils.degree*mean_cos
		res = np.array([dheight, dwidth])
		sgn = np.array([np.sign(wcs.wcs.cdelt[1]), -np.sign(wcs.wcs.cdelt[0])])
	elif method == "subgrid":
		if nsub is None: nsub = 16
		# Measure along a subgrid of great-circle distances (reference extent_subgrid:929)
		ys = np.linspace(0, shape[-2]-1, nsub+1)
		xs = np.linspace(0, shape[-1]-1, nsub+1)
		# height: mean over columns of summed row distances
		pix_h = np.array(np.meshgrid(ys, xs, indexing="ij"))
		pos_h = np.asarray(pix2sky(shape, wcs, pix_h.reshape(2, -1), safe=False)).reshape(2, nsub+1, nsub+1)
		seg_h = utils.angdist(pos_h[::-1, :-1, :], pos_h[::-1, 1:, :], axis=0)
		seg_w = utils.angdist(pos_h[::-1, :, :-1], pos_h[::-1, :, 1:], axis=0)
		height = np.mean(np.sum(seg_h, 0))/(nsub)*shape[-2]*nsub/(nsub)
		width  = np.mean(np.sum(seg_w, 1))/(nsub)*shape[-1]*nsub/(nsub)
		height = np.mean(np.sum(seg_h, 0))*shape[-2]/(shape[-2]-1) if shape[-2] > 1 else 0
		width  = np.mean(np.sum(seg_w, 1))*shape[-1]/(shape[-1]-1) if shape[-1] > 1 else 0
		res = np.array([height, width])
		sgn = np.array([np.sign(wcs.wcs.cdelt[1]), -np.sign(wcs.wcs.cdelt[0])])
	else:
		raise ValueError("Unrecognized extent method '%s'" % method)
	return res*sgn if signed else res

def area(shape, wcs, nsamp=1000, method="auto"):
	"""Physical area of the geometry in steradians (reference enmap.area)."""
	if wcsutils.is_plain(wcs):
		return float(np.prod(extent(shape, wcs)))
	if wcsutils.is_cyl(wcs) and wcs.wcs.crval[1] == 0:
		# exact for separable cylindrical projections
		return float(np.sum(pixsizemap_cyl(shape, wcs)[:, 0])*shape[-1])
	# non-separable: exact boundary contour integral (Green's theorem)
	return area_contour(shape, wcs, nsamp=nsamp)

def pixsize(shape, wcs):
	"""Average pixel area in steradians."""
	return area(shape, wcs)/shape[-2]/shape[-1]

def pixshape(shape, wcs, signed=False):
	"""Average pixel [height,width] in radians."""
	return extent(shape, wcs, signed=signed)/np.array(shape[-2:])

def pixshapes_cyl(shape, wcs, signed=False):
	"""Per-row pixel [height,width][ny] for cylindrical projections.
	The height of a row is the diff of sin(dec) at its edges over cos(dec)...
	We define pixel height as dec-extent and width as dphi*cos(dec), with the
	area-preserving average used for pixsizemap."""
	ny = shape[-2]
	y  = np.arange(ny, dtype=float)
	dec_mid = np.asarray(pix2sky(shape, wcs, np.array([y, y*0]), safe=False))[0]
	dec_top = np.asarray(pix2sky(shape, wcs, np.array([y-0.5, y*0]), safe=False))[0]
	dec_bot = np.asarray(pix2sky(shape, wcs, np.array([y+0.5, y*0]), safe=False))[0]
	dec_top = np.clip(dec_top, -np.pi/2, np.pi/2)
	dec_bot = np.clip(dec_bot, -np.pi/2, np.pi/2)
	heights = np.abs(dec_bot - dec_top)
	dphi    = abs(wcs.wcs.cdelt[0])*utils.degree
	widths  = dphi*np.cos(np.clip(dec_mid, -np.pi/2, np.pi/2))
	res = np.array([heights, widths + y*0])
	if signed:
		res = res*np.array([np.sign(wcs.wcs.cdelt[1]), -np.sign(wcs.wcs.cdelt[0])])[:, None]
	return res

def pixsizemap_cyl(shape, wcs):
	"""Exact per-row pixel areas [ny,1] for cylindrical projections."""
	ny = shape[-2]
	y  = np.arange(ny, dtype=float)
	dec_top = np.asarray(pix2sky(shape, wcs, np.array([y-0.5, y*0]), safe=False))[0]
	dec_bot = np.asarray(pix2sky(shape, wcs, np.array([y+0.5, y*0]), safe=False))[0]
	dec_top = np.clip(dec_top, -np.pi/2, np.pi/2)
	dec_bot = np.clip(dec_bot, -np.pi/2, np.pi/2)
	dphi = abs(wcs.wcs.cdelt[0])*utils.degree
	return np.abs(np.sin(dec_bot) - np.sin(dec_top))[:, None]*dphi

def pixsizemap(shape, wcs, separable="auto", broadcastable=False):
	"""Map of the area of each pixel in steradians (reference :1177)."""
	if separable == "auto": separable = wcsutils.is_separable(wcs)
	if wcsutils.is_plain(wcs):
		val = np.abs(wcs.wcs.cdelt[0]*wcs.wcs.cdelt[1])
		res = np.full((1, 1) if broadcastable else shape[-2:], val)
		return ndmap(res, wcs)
	if separable:
		col = pixsizemap_cyl(shape, wcs)
		if broadcastable: res = col
		else: res = np.broadcast_to(col, shape[-2:]).copy()
		return ndmap(res, wcs)
	else:
		# generic: jacobian of pix2sky by centered corner differences
		pix = np.mgrid[:shape[-2], :shape[-1]].astype(float)
		p00 = np.asarray(pix2sky(shape, wcs, pix + np.array([-0.5, -0.5])[:, None, None], safe=False))
		p10 = np.asarray(pix2sky(shape, wcs, pix + np.array([+0.5, -0.5])[:, None, None], safe=False))
		p01 = np.asarray(pix2sky(shape, wcs, pix + np.array([-0.5, +0.5])[:, None, None], safe=False))
		p11 = np.asarray(pix2sky(shape, wcs, pix + np.array([+0.5, +0.5])[:, None, None], safe=False))
		dy  = 0.5*((p10 + p11) - (p00 + p01))
		dx  = 0.5*((p01 + p11) - (p00 + p10))
		# rewind the ra deltas: the projection's longitude branch cut can
		# run through the map (e.g. cylindrical crval_dec != 0), making a
		# raw difference jump by 2pi
		dy[1] = utils.rewind(dy[1])
		dx[1] = utils.rewind(dx[1])
		# metric factor at the pixel-center dec (a half-pixel-offset cosdec
		# biases the area by ~tan(dec)*cdelt/2, ~1e-3 at dec 30)
		cosdec = np.cos(p00[0] + 0.5*(dy[0] + dx[0]))
		jac = np.abs(dy[0]*dx[1] - dy[1]*dx[0])*cosdec
		return ndmap(jac, wcs)

def pixshapemap(shape, wcs, bsize=1000, separable="auto", signed=False):
	"""Map of the [height,width] of each pixel (reference :1105)."""
	if separable == "auto": separable = wcsutils.is_separable(wcs)
	if separable:
		hw = pixshapes_cyl(shape, wcs, signed=signed)
		res = np.empty((2,) + tuple(shape[-2:]))
		res[0] = hw[0][:, None]
		res[1] = hw[1][:, None]
		return ndmap(res, wcs)
	pix = np.mgrid[:shape[-2], :shape[-1]].astype(float)
	p00 = np.asarray(pix2sky(shape, wcs, pix + np.array([-0.5, 0])[:, None, None], safe=False))
	p10 = np.asarray(pix2sky(shape, wcs, pix + np.array([+0.5, 0])[:, None, None], safe=False))
	pl  = np.asarray(pix2sky(shape, wcs, pix + np.array([0, -0.5])[:, None, None], safe=False))
	pr  = np.asarray(pix2sky(shape, wcs, pix + np.array([0, +0.5])[:, None, None], safe=False))
	h = utils.angdist(p00[::-1], p10[::-1], axis=0)
	w = utils.angdist(pl[::-1], pr[::-1], axis=0)
	return ndmap(np.array([h, w]), wcs)

def pixshapebounds(shape, wcs, separable="auto"):
	ps = np.asarray(pixshapemap(shape, wcs, separable=separable))
	return np.array([[ps[0].min(), ps[1].min()], [ps[0].max(), ps[1].max()]])


# ---------------------------------------------------------------------------
# Fourier-space coordinates (reference enmap.py:1242-1305)
# ---------------------------------------------------------------------------
def laxes(shape, wcs, oversample=1, method="auto", broadcastable=False):
	"""(ly[ny], lx[nx]) multipole axes of the map's Fourier transform."""
	oversample = int(oversample)
	step = pixshape(shape, wcs, signed=True)
	ly = np.fft.fftfreq(shape[-2]*oversample, step[0]/(2*np.pi))
	lx = np.fft.fftfreq(shape[-1]*oversample, step[1]/(2*np.pi))
	if oversample > 1:
		# central order (reference laxes behavior)
		def shift(l):
			return np.roll(l, l.size//2, 0)
		ly, lx = shift(ly), shift(lx)
	return ly, lx

def lmap(shape, wcs, oversample=1):
	"""Map of the 2d multipole [{ly,lx},ny,nx] of each Fourier pixel."""
	ly, lx = laxes(shape, wcs, oversample=oversample)
	res = np.empty((2, len(ly), len(lx)))
	res[0] = ly[:, None]
	res[1] = lx[None, :]
	return ndmap(res, wcs)

def modlmap(shape, wcs, oversample=1, min=0):
	"""Map of |l| of each Fourier pixel (reference :1251)."""
	ly, lx = laxes(shape, wcs, oversample=oversample)
	res = np.sqrt(ly[:, None]**2 + lx[None, :]**2)
	res = np.maximum(res, min)
	return ndmap(res, wcs)

def modrmap(shape, wcs, ref="center", safe=True, corner=False):
	"""Map of the angular distance of each pixel from ref (reference enmap.modrmap)."""
	slow = posmap(shape, wcs, safe=safe, corner=corner)
	if isinstance(ref, str):
		if ref == "center": ref = center(shape, wcs)
		else: raise ValueError(ref)
	ref = np.asarray(ref)
	pos = np.asarray(slow)
	r = utils.angdist(np.array([ref[1], ref[0]])[:, None, None],
		pos[::-1], axis=0)
	return ndmap(r, wcs)

def lform(map, method="auto"):
	"""Put map into a normalized flat form where the fft is centered."""
	xp = _xp_of(map.data) if isinstance(map, ndmap) else np
	arr = map.data if isinstance(map, ndmap) else map
	arr = xp.fft.fftshift(arr, axes=(-2, -1))
	return samewcs(arr, map)

def lrmap(shape, wcs, oversample=1):
	"""Like lmap, but for the real-fft's half plane."""
	ly, lx = laxes(shape, wcs, oversample=oversample)
	lx = lx[:shape[-1]//2+1]
	res = np.empty((2, len(ly), len(lx)))
	res[0] = ly[:, None]
	res[1] = lx[None, :]
	return ndmap(res, wcs)

def lbin(map, bsize=None, brel=1.0, return_nhit=False, lop=None):
	"""Bin the map in radial rings in Fourier space (reference :2550).
	Returns (binned_vals[...,nbin], bin_centers[nbin])."""
	l = np.asarray(modlmap(map.shape, map.wcs))
	if bsize is None:
		bsize = min(abs(l[0, 1] if l.shape[1] > 1 else 1), abs(l[1, 0] if l.shape[0] > 1 else 1))
	bsize = bsize*brel
	return _radial_bin(np.asarray(map), l, bsize, return_nhit=return_nhit)

def rbin(map, center=[0, 0], bsize=None, brel=1.0, return_nhit=False):
	"""Bin the map radially in real space around center [dec,ra]."""
	r = np.asarray(modrmap(map.shape, map.wcs, ref=center))
	if bsize is None:
		bsize = float(np.min(np.asarray(pixshape(map.shape, map.wcs))))
	return _radial_bin(np.asarray(map), r, bsize*brel, return_nhit=return_nhit)

def _radial_bin(arr, r, bsize, return_nhit=False):
	pix   = (r.reshape(-1)/bsize).astype(int)
	nbin  = int(pix.max())+1
	nhit  = np.bincount(pix, minlength=nbin)
	pre   = arr.shape[:-2]
	flat  = arr.reshape(pre + (-1,))
	vals  = np.zeros(pre + (nbin,), arr.dtype)
	for I in utils.nditer(pre):
		vals[I] = np.bincount(pix, weights=flat[I].real, minlength=nbin)
		if np.iscomplexobj(arr):
			vals[I] = vals[I] + 1j*np.bincount(pix, weights=flat[I].imag, minlength=nbin)
	vals = vals/np.maximum(nhit, 1)
	cents = (np.arange(nbin)+0.5)*bsize
	if return_nhit: return vals, cents, nhit
	return vals, cents


# ---------------------------------------------------------------------------
# Geometry slicing and sub-selection (reference enmap.py:165-378)
# ---------------------------------------------------------------------------
def slice_geometry(shape, wcs, sel, nowrap=False):
	"""Slice a geometry with a tuple of (y,x) slices (reference :264)."""
	wcs = wcs.deepcopy()
	pre, shape = shape[:-2], shape[-2:]
	if not isinstance(sel, tuple): sel = (sel,)
	oshape = list(shape)
	# order: sel[0] is y, sel[1] is x. wcs order is x,y
	for i, s in enumerate(list(sel)[:2]):
		if s is None: raise ValueError("newaxis not supported in slice_geometry")
		if nowrap:
			# raw interpretation: starts/stops may lie outside the map
			step = s.step if s.step is not None else 1
			start = s.start if s.start is not None else (0 if step > 0 else shape[i]-1)
			stop = s.stop if s.stop is not None else (shape[i] if step > 0 else -1)
		else:
			s = slice(*s.indices(shape[i]))
			start, stop, step = s.start, s.stop, s.step
		n = len(range(start, stop, step))
		oshape[i] = n
		waxis = 1-i  # wcs axis for this map axis
		# new 0-based crpix: p_new = (p_old - start)/step
		wcs.wcs.crpix[waxis] = (wcs.wcs.crpix[waxis] - 1 - start)/step + 1
		wcs.wcs.cdelt[waxis] = wcs.wcs.cdelt[waxis]*step
	return tuple(pre) + tuple(oshape), wcs

def subinds(shape, wcs, box, mode=None, cap=True, noflip=False, epsilon=1e-4):
	"""Pixel bounds [{from,to},{y,x}] corresponding to sky box
	[{from,to},{dec,ra}] (reference enmap.subinds:217)."""
	if mode is None: mode = "floor"
	box = np.asarray(box)
	# Translate box to pixels, with epsilon-safe rounding
	bpix = skybox2pixbox(shape, wcs, box, include_direction=True)
	dir  = bpix[2]; bpix = bpix[:2]
	if   mode == "floor": bpix = np.floor(bpix + 0.5 + epsilon).astype(int)
	elif mode == "round": bpix = np.round(bpix).astype(int)
	elif mode == "ceil":  bpix = np.ceil(bpix - 0.5 - epsilon).astype(int)
	elif mode == "inclusive":
		bpix = np.array([np.floor(bpix.min(0) + 0.5 + epsilon),
			np.ceil(bpix.max(0) + 0.5 - epsilon)]).astype(int)
		dir = np.array([1, 1])
	elif mode == "exclusive":
		bpix = np.array([np.ceil(bpix.min(0) + 0.5 - epsilon),
			np.floor(bpix.max(0) + 0.5 + epsilon)]).astype(int)
		dir = np.array([1, 1])
	else: raise ValueError("Unrecognized mode '%s'" % mode)
	if not noflip:
		# Make the box go in the positive pixel direction
		for i in range(2):
			if bpix[1, i] < bpix[0, i]:
				bpix[:, i] = bpix[::-1, i]
	if cap:
		pass  # capping handled by extract machinery
	return bpix

def submap(map, box, mode=None, wrap="auto", recenter=False, iwcs=None):
	"""Extract the part of the map inside the sky box [{from,to},{dec,ra}]
	(reference enmap.submap:165)."""
	pixbox = subinds(map.shape, map.wcs if iwcs is None else iwcs, box, mode=mode, noflip=True)
	return extract_pixbox(map, pixbox, wrap=wrap)

def sel2pixbox(shape, sel):
	pixbox = np.zeros((2, 2), int)
	for i, s in enumerate(sel):
		s = slice(*s.indices(shape[-2+i]))
		pixbox[:, i] = [s.start, s.stop]
	return pixbox

def pixbox_of(iwcs, oshape, owcs):
	"""Integer pixel box of the output geometry in input pixel coords."""
	pix = np.asarray(sky2pix(oshape, iwcs, np.asarray(corners(oshape, owcs, corner=False)).T, safe=2))
	pixbox = np.array([np.round(pix[:, 0]), np.round(pix[:, -1])+1]).astype(int)
	# order so box counts upwards
	for i in range(2):
		if pixbox[1, i] < pixbox[0, i]:
			pixbox[:, i] = [pixbox[1, i]+1, pixbox[0, i]+1]
	return pixbox

def extract(map, shape, wcs, omap=None, wrap="auto", op=None, cval=0, iwcs=None, reverse=False):
	"""Extract the part of map matching the geometry (shape, wcs), with
	RA wrapping (reference enmap.extract:654)."""
	if iwcs is None: iwcs = map.wcs
	pixbox = pixbox_of(iwcs, shape, wcs)
	extracted = extract_pixbox(map, pixbox, omap=omap, wrap=wrap, op=op, cval=cval,
		iwcs=iwcs, reverse=reverse)
	if reverse: return extracted
	return ndmap(extracted.data, wcs) if isinstance(extracted, ndmap) else extracted

def extract_pixbox(map, pixbox, omap=None, wrap="auto", op=None, cval=0, iwcs=None, reverse=False):
	"""Extract the rectangle of pixels given by pixbox [{from,to},{y,x}]
	(may extend outside the map; wraps in RA) (reference enmap.extract_pixbox:678)."""
	if iwcs is None: iwcs = map.wcs
	pixbox = np.asarray(pixbox)
	if pixbox.shape[-1] > 2:  # allow [{from,to},{...,y,x}]
		pixbox = pixbox[..., -2:]
	oshape = tuple(map.shape[:-2]) + tuple(pixbox[1] - pixbox[0])
	_, owcs = slice_geometry(map.shape[-2:], iwcs,
		(slice(pixbox[0, 0], pixbox[1, 0]), slice(pixbox[0, 1], pixbox[1, 1])), nowrap=True)
	if omap is None and not reverse:
		xp = _xp_of(map.data)
		omap = ndmap(xp.full(oshape, cval, map.dtype), owcs)
	# wrapping setup
	nphi = 0
	if not wrapsutils_is_plain(iwcs):
		nphi = utils.nint(abs(360./iwcs.wcs.cdelt[0]))
	if wrap == "auto":
		wrap_arr = np.array([0, nphi])
	else:
		wrap_arr = np.zeros(2, int) + np.asarray(wrap)
	# slice-box algebra
	sbox = np.stack([pixbox[0], pixbox[1], np.ones(2, int)], -1)
	segments = utils.sbox_wrap(sbox, wrap=wrap_arr, cap=np.array(map.shape[-2:]))
	mdata = map.data
	odata = omap.data if omap is not None else None
	xp = _xp_of(mdata)
	for ibox, obox in segments:
		isel = tuple(slice(b[0], b[1], b[2]) for b in ibox)
		osel = tuple(slice(b[0], b[1], b[2]) for b in obox)
		if reverse:
			src = odata[(Ellipsis,) + osel] if odata is not None else None
			chunk = src
			if op is not None and src is not None:
				chunk = op(mdata[(Ellipsis,) + isel], src)
			if _is_jax(mdata):
				mdata = mdata.at[(Ellipsis,) + isel].set(chunk)
			else:
				mdata[(Ellipsis,) + isel] = np.asarray(chunk)
		else:
			chunk = mdata[(Ellipsis,) + isel]
			if op is not None:
				chunk = op(odata[(Ellipsis,) + osel], chunk)
			if _is_jax(odata):
				odata = odata.at[(Ellipsis,) + osel].set(chunk)
			else:
				odata[(Ellipsis,) + osel] = np.asarray(chunk)
	if reverse:
		map.data = mdata
		return map
	return ndmap(odata, owcs)

def wrapsutils_is_plain(wcs):
	return wcsutils.is_plain(wcs)

def insert(omap, imap, wrap="auto", op=None, cval=0, iwcs=None):
	"""Insert imap into omap based on their wcs (reference enmap.insert:710)."""
	extract(omap, imap.shape, imap.wcs, omap=imap, wrap=wrap, op=op,
		cval=cval, reverse=True)
	return omap

def insert_at(omap, pix, imap, wrap="auto", op=None, cval=0, iwcs=None):
	"""Insert imap into omap at the pixel location pix (either [y,x] of the
	corner or a pixbox) (reference enmap.insert_at:717)."""
	pix = np.asarray(pix)
	if pix.ndim == 1:
		pixbox = np.array([pix, pix + np.array(imap.shape[-2:])])
	else: pixbox = pix
	extract_pixbox(omap, pixbox, omap=imap, wrap=wrap, op=op, cval=cval, reverse=True)
	return omap

def overlap(shape, wcs, shape2_or_pixbox, wcs2=None, wrap="auto"):
	"""Pixel overlap between two geometries (reference enmap.overlap)."""
	if wcs2 is not None:
		pixbox = pixbox_of(wcs, shape2_or_pixbox, wcs2)
	else: pixbox = np.asarray(shape2_or_pixbox)
	b1 = np.array([[0, 0], list(shape[-2:])])
	b = np.array([np.maximum(b1[0], pixbox[0]), np.minimum(b1[1], pixbox[1])])
	return np.maximum(b[1]-b[0], 0)

def neighborhood_pixboxes(shape, wcs, poss, r):
	"""Pixel boxes [n,{from,to},{y,x}] around each position in poss with radius r."""
	poss = np.asarray(poss)
	res = []
	for pos in poss.reshape(-1, 2):
		box_ = np.array([pos - r, pos + r])
		pb = subinds(shape, wcs, box_, mode="inclusive", noflip=True)
		res.append(pb)
	return np.array(res).reshape(poss.shape[:-1] + (2, 2))

def stamps(map, pos, shape, aslist=False):
	"""Extract square postage stamps around positions pos[n,{dec,ra}]."""
	shape = np.zeros(2, int) + shape
	pos = np.asarray(pos)
	res = []
	for p in pos.reshape(-1, 2):
		cpix = np.round(np.asarray(sky2pix(map.shape, map.wcs, p))).astype(int)
		pixbox = np.array([cpix - shape//2, cpix - shape//2 + shape])
		res.append(extract_pixbox(map, pixbox))
	if aslist: return res
	xp = _xp_of(map.data)
	return ndmap(xp.stack([r.data for r in res]), res[0].wcs)


# ---------------------------------------------------------------------------
# Geometry builders (reference enmap.py:1517-1858)
# ---------------------------------------------------------------------------
def geometry(pos, res=None, shape=None, proj="car", variant="cc", deg=False,
		pre=(), force=False, ref=None, **kwargs):
	"""Construct a (shape, wcs) pair covering pos (a [{from,to},{dec,ra}] box
	or {dec,ra} center) at resolution res, in radians
	(reference enmap.geometry:1650)."""
	scale = 1 if deg else 1/utils.degree
	pos = np.asarray(pos)*scale
	if res is not None: res = np.asarray(res)*scale
	try:
		ref = (ref[1]*scale, ref[0]*scale)
		assert len(ref) == 2
	except (TypeError, ValueError):
		pass
	if ref is None and not force: ref = "standard"
	# column-major (ra,dec) ordering for wcsutils
	wcs = wcsutils.build(pos, res, shape, rowmajor=True, system=proj, ref=ref, **kwargs)
	if shape is None:
		nearedge = np.array(wcsutils.world2pix(wcs, pos[0, 1], pos[0, 0]))[::-1]
		faredge  = np.array(wcsutils.world2pix(wcs, pos[1, 1], pos[1, 0]))[::-1]
		shape = tuple(np.round(np.abs(faredge - nearedge)).astype(int))
	return tuple(pre) + tuple(shape[-2:]), wcs

def geometry2(pos=None, res=None, shape=None, proj="car", variant=None, ref=None, pre=()):
	"""Newer-style geometry constructor: full-sky pixelization cropped to pos
	(reference enmap.geometry2:1517)."""
	system, var2 = wcsutils.parse_system(proj)
	if variant is None: variant = var2
	pwcs = wcsutils.projection(system)
	res_deg = None if res is None else np.asarray(res)/utils.degree
	fshape, fwcs = wcsutils.pixelization(pwcs, res=res_deg, variant=variant)
	if pos is None:
		return tuple(pre) + tuple(fshape), fwcs
	pos = np.asarray(pos)
	if pos.ndim == 1:
		assert shape is not None, "geometry2 with center pos needs shape"
		cpix = np.round(np.asarray(sky2pix(fshape, fwcs, pos))).astype(int)
		half = np.array(shape[-2:])//2
		pixbox = np.array([cpix - half, cpix - half + np.array(shape[-2:])])
	else:
		pixbox = subinds(fshape, fwcs, pos, noflip=True)
	oshape, owcs = slice_geometry(fshape, fwcs,
		(slice(pixbox[0, 0], pixbox[1, 0]), slice(pixbox[0, 1], pixbox[1, 1])))
	return tuple(pre) + tuple(oshape[-2:]), owcs

def fullsky_geometry(res=None, shape=None, dims=(), proj="car", variant="fejer1"):
	"""Full-sky geometry with SHT-exact ring placement
	(reference enmap.fullsky_geometry:1713). CC has pixel centers on the
	poles; fejer1 has them offset by half a pixel."""
	assert proj == "car", "Only CAR fullsky geometry implemented"
	if   variant.lower() == "cc":     yo = 1
	elif variant.lower() == "fejer1": yo = 0
	else: raise ValueError("Unrecognized CAR variant '%s'" % str(variant))
	if shape is None:
		res   = np.zeros(2) + res
		shape = utils.nint(np.array([1*np.pi, 2*np.pi])/res + np.array([yo, 0]))
	else:
		res = np.array([1*np.pi, 2*np.pi])/(np.array(shape[-2:]) - np.array([yo, 0]))
	ny, nx = shape[-2:]
	assert abs(res[0]*(ny-yo) -   np.pi) < 1e-8, "SHT-exact ring placement needs a whole number of pixel rows spanning the pi of colatitude; got res[0]=%g" % res[0]
	assert abs(res[1]*nx     - 2*np.pi) < 1e-8, "SHT-exact ring placement needs a whole number of pixel columns spanning the 2*pi of longitude; got res[1]=%g" % res[1]
	wcs = wcsutils.WCS(naxis=2)
	wcs.wcs.crval = np.array([res[1]/2/utils.degree, 0])
	wcs.wcs.cdelt = np.array([-360./nx, 180./(ny-yo)])
	wcs.wcs.crpix = np.array([nx//2+0.5, (ny+1)/2])
	wcs.wcs.ctype = ["RA---CAR", "DEC--CAR"]
	return tuple(dims) + (int(ny), int(nx)), wcs

def band_geometry(dec_cut, res=None, shape=None, dims=(), proj="car", variant="fejer1"):
	"""Geometry covering a declination band of the full sky
	(reference enmap.band_geometry:1742)."""
	dec_cut = np.atleast_1d(dec_cut)
	if dec_cut.size == 1:
		dec_cut_min, dec_cut_max = -dec_cut[0], dec_cut[0]
		assert dec_cut_max > 0
	elif dec_cut.size == 2:
		dec_cut_min, dec_cut_max = dec_cut
		assert dec_cut_max > dec_cut_min
	else: raise ValueError
	ishape, iwcs = fullsky_geometry(res=res, shape=shape, dims=dims, proj=proj, variant=variant)
	start = np.asarray(sky2pix(ishape, iwcs, np.array([dec_cut_min, 0.])))[0]
	stop  = np.asarray(sky2pix(ishape, iwcs, np.array([dec_cut_max, 0.])))[0]
	Ny    = ishape[-2]
	start = max(int(np.round(float(start))), 0)
	stop  = min(int(np.round(float(stop))), Ny)
	return slice_geometry(ishape, iwcs, (slice(start, stop), slice(None)))

def thumbnail_geometry(r=None, res=None, shape=None, dims=(), proj="tan"):
	"""Geometry for object-centered postage stamps, centered exactly on a
	pixel at (0,0) (reference enmap.thumbnail_geometry:1770)."""
	if res is None:
		assert r is not None and shape is not None
		n = np.zeros(2, int) + np.asarray(shape[-2:])
		res = 2*r/(n-1)
	res = np.zeros(2) + res
	if shape is None:
		assert r is not None
		n = utils.nint(2*r/res) + 1
	else:
		n = np.zeros(2, int) + np.asarray(shape[-2:])
	n = n//2*2 + 1  # force odd
	res_deg = res/utils.degree
	wcs = wcsutils.WCS(naxis=2)
	if wcsutils.is_plain(proj) if isinstance(proj, str) and proj in ["", "plain"] else False:
		wcs.wcs.ctype = ["", ""]
	else:
		wcs.wcs.ctype = ["RA---"+proj.upper(), "DEC--"+proj.upper()]
	wcs.wcs.crval = np.array([0., 0.])
	wcs.wcs.cdelt = np.array([-res_deg[1], res_deg[0]])
	wcs.wcs.crpix = (np.array([n[1], n[0]], float))//2 + 1
	wcs.wcs.lonpole = 180.0
	return tuple(dims) + (int(n[0]), int(n[1])), wcs

def union_geometry(geometries):
	"""Smallest geometry covering all the given compatible geometries
	(reference enmap.union_geometry:1822)."""
	ref_shape, ref_wcs = geometries[0][:2]
	pixboxes = []
	for shape, wcs in [g[:2] for g in geometries]:
		corner_pix = np.round(np.asarray(sky2pix(ref_shape, ref_wcs,
			np.asarray(corners(shape, wcs, corner=False)).T, safe=2))).astype(int)
		pixboxes.append(np.sort(corner_pix, 1).T + np.array([[0, 0], [1, 1]]))
	pixboxes = np.array(pixboxes)
	glob = np.array([pixboxes[:, 0].min(0), pixboxes[:, 1].max(0)])
	oshape, owcs = slice_geometry(ref_shape, ref_wcs,
		(slice(glob[0, 0], glob[1, 0]), slice(glob[0, 1], glob[1, 1])), nowrap=True)
	return oshape, owcs

def recenter_geo(shape, wcs, on=None):
	return shape, wcs

def downgrade_geometry(shape, wcs, factor):
	"""Geometry of a map downgraded by integer factor (reference :2095)."""
	factor = np.zeros(2, int) + np.asarray(factor, int)
	oshape = tuple(shape[:-2]) + tuple(np.array(shape[-2:])//factor)
	owcs   = wcsutils.scale(wcs, (1./factor)[::-1])
	return oshape, owcs

def upgrade_geometry(shape, wcs, factor):
	factor = np.zeros(2, int) + np.asarray(factor, int)
	oshape = tuple(shape[:-2]) + tuple(np.array(shape[-2:])*factor)
	owcs   = wcsutils.scale(wcs, factor.astype(float)[::-1])
	return oshape, owcs

def scale_geometry(shape, wcs, scale):
	scale  = np.zeros(2) + scale
	oshape = tuple(shape[:-2]) + tuple(utils.nint(np.array(shape[-2:])*scale))
	owcs   = wcsutils.scale(wcs, scale[::-1])
	return oshape, owcs


# ---------------------------------------------------------------------------
# Downgrade / upgrade (reference enmap.py:2026-2095)
# ---------------------------------------------------------------------------
def downgrade(map, factor, op=None, ref=None, off=None, inclusive=False):
	"""Downgrade the map by averaging (or op) over factor x factor blocks."""
	xp = _xp_of(map.data)
	if op is None: op = xp.mean
	factor = np.zeros(2, int) + np.asarray(factor, int)
	d = map.data
	ny = d.shape[-2]//factor[0]*factor[0]
	nx = d.shape[-1]//factor[1]*factor[1]
	d = d[..., :ny, :nx]
	d = d.reshape(d.shape[:-2] + (ny//factor[0], factor[0], nx//factor[1], factor[1]))
	d = op(op(d, -1), -2)
	oshape, owcs = downgrade_geometry(map.shape, map.wcs, factor)
	return ndmap(d, owcs)

def upgrade(map, factor, off=None, oshape=None, inclusive=False):
	"""Upgrade the map by pixel replication."""
	xp = _xp_of(map.data)
	factor = np.zeros(2, int) + np.asarray(factor, int)
	d = xp.repeat(xp.repeat(map.data, factor[0], axis=-2), factor[1], axis=-1)
	_, owcs = upgrade_geometry(map.shape, map.wcs, factor)
	if oshape is not None: d = d[..., :oshape[-2], :oshape[-1]]
	return ndmap(d, owcs)

def downgrade_fft(map, factor):
	"""Fourier-space downgrade: low-pass + subsample (reference :2060)."""
	from . import resample
	factor = np.zeros(2, int) + np.asarray(factor, int)
	oshape = tuple(np.array(map.shape[-2:])//factor)
	return resample.resample(map, oshape, method="fft")

def upgrade_fft(map, factor):
	from . import resample
	factor = np.zeros(2, int) + np.asarray(factor, int)
	oshape = tuple(np.array(map.shape[-2:])*factor)
	return resample.resample(map, oshape, method="fft")


# ---------------------------------------------------------------------------
# Padding / cropping / apodization (reference enmap.py:2288-2491)
# ---------------------------------------------------------------------------
def pad(emap, pix, return_slice=False, wrap=False, value=0):
	"""Pad the map with pix pixels (scalar, [n], or [{from,to},{y,x}])."""
	pix = np.asarray(pix, int)
	if pix.ndim == 0: pix = np.array([[pix, pix], [pix, pix]]).T*0 + pix
	if pix.ndim == 1: pix = np.stack([pix, pix])
	pix = pix.reshape(2, 2)
	oshape = tuple(emap.shape[:-2]) + tuple(np.array(emap.shape[-2:]) + pix.sum(0))
	_, owcs = slice_geometry(emap.shape[-2:], emap.wcs,
		(slice(-pix[0, 0], emap.shape[-2]+pix[1, 0]), slice(-pix[0, 1], emap.shape[-1]+pix[1, 1])))
	xp = _xp_of(emap.data)
	widths = [(0, 0)]*(emap.ndim-2) + [(int(pix[0, 0]), int(pix[1, 0])), (int(pix[0, 1]), int(pix[1, 1]))]
	if wrap:
		d = xp.pad(emap.data, widths, mode="wrap")
	else:
		d = xp.pad(emap.data, widths, mode="constant", constant_values=value)
	res = ndmap(d, owcs)
	if return_slice:
		sl = (Ellipsis, slice(int(pix[0, 0]), int(pix[0, 0])+emap.shape[-2]),
			slice(int(pix[0, 1]), int(pix[0, 1])+emap.shape[-1]))
		return res, sl
	return res

def crop(emap, npix):
	"""Symmetric crop, removing npix pixels from each edge."""
	npix = np.asarray(npix, int)
	if npix.ndim == 0: npix = np.array([npix, npix])
	return emap[..., npix[0]:emap.shape[-2]-npix[0], npix[1]:emap.shape[-1]-npix[1]]

def autocrop(m, method="plain", value="auto", margin=0, factors=None, return_info=False):
	"""Crop away rows/cols that are all equal to value (reference :2320)."""
	arr = np.asarray(m)
	if isinstance(value, str) and value == "auto":
		value = arr.reshape(-1)[0]
	flat = arr.reshape(-1, arr.shape[-2], arr.shape[-1])
	good = ~np.all(np.isclose(flat, value, equal_nan=True), axis=0)
	rows = np.where(np.any(good, 1))[0]
	cols = np.where(np.any(good, 0))[0]
	if len(rows) == 0:
		res = m
		info = (slice(None), slice(None))
	else:
		y1, y2 = rows[0]-margin, rows[-1]+1+margin
		x1, x2 = cols[0]-margin, cols[-1]+1+margin
		y1, x1 = max(y1, 0), max(x1, 0)
		y2, x2 = min(y2, m.shape[-2]), min(x2, m.shape[-1])
		sl = (Ellipsis, slice(y1, y2), slice(x1, x2))
		res = m[sl]
		info = sl
	if return_info: return res, info
	return res

def apod(m, width, profile="cos", fill="zero"):
	"""Apodize the map edges over width pixels (reference enmap.apod:2402)."""
	width = np.minimum(np.zeros(2, int) + np.asarray(width, int), np.asarray(m.shape[-2:]))
	xp = _xp_of(m.data) if isinstance(m, ndmap) else utils._xp(m)
	arr = m.data if isinstance(m, ndmap) else m
	def win(n, w):
		x = xp.ones(n)
		if w > 0:
			t = xp.arange(w)/float(w)
			edge = 0.5 - 0.5*xp.cos(np.pi*t) if profile == "cos" else t
			x = x.at[:w].set(edge) if xp is jnp else _np_set(x, slice(0, w), edge)
			x = x.at[n-w:].set(edge[::-1]) if xp is jnp else _np_set(x, slice(n-w, None), edge[::-1])
		return x
	wy = win(arr.shape[-2], int(width[0]))
	wx = win(arr.shape[-1], int(width[1]))
	a = arr*wy[:, None]*wx[None, :]
	if fill == "mean":
		mean = arr.mean((-2, -1), keepdims=True)
		a = a + mean*(1 - wy[:, None]*wx[None, :])
	elif fill == "median":
		med = xp.median(arr.reshape(arr.shape[:-2]+(-1,)), -1)[..., None, None]
		a = a + med*(1 - wy[:, None]*wx[None, :])
	return samewcs(a, m) if isinstance(m, ndmap) else a

def _np_set(x, sl, val):
	x = np.array(x); x[sl] = val
	return x

def apod_profile_lin(x): return x
def apod_profile_cos(x): return 0.5-0.5*np.cos(np.pi*x)

def fillbad(map, val=0, inplace=False):
	xp = _xp_of(map.data)
	d = xp.where(xp.isfinite(map.data), map.data, val)
	if inplace and isinstance(map, ndmap):
		map.data = d
		return map
	return samewcs(d, map)

def shift(map, off, keepwcs=False):
	"""Cyclic integer-pixel shift by off=[oy,ox] (reference enmap.shift:3277)."""
	off = np.atleast_1d(np.asarray(off, int))
	xp = _xp_of(map.data)
	d = map.data
	for i, o in enumerate(off):
		axis = -len(off)+i
		d = xp.roll(d, int(o), axis=axis)
	if keepwcs or len(off) < 2:
		return samewcs(d, map)
	wcs = map.wcs.deepcopy()
	wcs.wcs.crpix = wcs.wcs.crpix + np.array([off[-1], off[-2]])
	return ndmap(d, wcs)

def fractional_shift(map, off, keepwcs=False, nofft=False):
	"""Shift the map by a fractional number of pixels using Fourier shifting."""
	from . import fft as enfft
	d = enfft.shift(map.data if isinstance(map, ndmap) else map, off, axes=(-2, -1), nofft=nofft)
	if keepwcs or not isinstance(map, ndmap):
		return samewcs(d, map)
	off = np.zeros(2) + np.asarray(off)
	wcs = map.wcs.deepcopy()
	wcs.wcs.crpix = wcs.wcs.crpix + np.array([off[1], off[0]])
	return ndmap(d, wcs)


# ---------------------------------------------------------------------------
# FFT wrappers and flat-sky harmonic transforms (reference enmap.py:1307-1428)
# ---------------------------------------------------------------------------
def fft(emap, omap=None, nthread=0, normalize=True, adjoint_ifft=False, dct=False):
	"""2D FFT of the map's pixel axes, with physical normalization options
	(reference enmap.fft:1307). normalize can be True ('phys' sqrt-norm
	relative to the mean pixel), 'phy'/'phys' or False."""
	from . import fft as enfft
	arr = jnp.asarray(emap.data) if isinstance(emap, ndmap) else jnp.asarray(emap)
	if dct: res = enfft.dct(arr, axes=(-2, -1), normalize=False)
	else:   res = enfft.fft(arr, axes=(-2, -1))
	norm = 1
	if normalize:
		if dct: norm /= np.prod(np.array(arr.shape[-2:])*2-2)**0.5
		else:   norm /= np.prod(arr.shape[-2:])**0.5
	if isinstance(normalize, str) and normalize in ["phy", "phys", "physical"]:
		if adjoint_ifft: norm /= pixsize(emap.shape, emap.wcs)**0.5
		else:            norm *= pixsize(emap.shape, emap.wcs)**0.5
	if norm != 1: res = res*norm
	return samewcs(res, emap) if isinstance(emap, ndmap) else res

def ifft(emap, omap=None, nthread=0, normalize=True, adjoint_fft=False, dct=False):
	"""Inverse 2D FFT (reference enmap.ifft:1327)."""
	from . import fft as enfft
	arr = jnp.asarray(emap.data) if isinstance(emap, ndmap) else jnp.asarray(emap)
	if dct: res = enfft.idct(arr, axes=(-2, -1), normalize=False)
	else:   res = enfft.ifft(arr, axes=(-2, -1), normalize=False)
	norm = 1
	if normalize:
		if dct: norm /= np.prod(np.array(arr.shape[-2:])*2-2)**0.5
		else:   norm /= np.prod(arr.shape[-2:])**0.5
		if dct and normalize: norm *= 1  # dct idct pair normalizes itself
	if isinstance(normalize, str) and normalize in ["phy", "phys", "physical"]:
		if adjoint_fft: norm *= pixsize(emap.shape, emap.wcs)**0.5
		else:           norm /= pixsize(emap.shape, emap.wcs)**0.5
	if norm != 1: res = res*norm
	return samewcs(res, emap) if isinstance(emap, ndmap) else res

def dct(emap, omap=None, nthread=0, normalize=True):
	return fft(emap, omap=omap, nthread=nthread, normalize=normalize, dct=True)
def idct(emap, omap=None, nthread=0, normalize=True):
	return ifft(emap, omap=omap, nthread=nthread, normalize=normalize, dct=True)

def fft_adjoint(emap, omap=None, nthread=0, normalize=True):
	return ifft(emap, omap=omap, nthread=nthread, normalize=normalize, adjoint_fft=True)
def ifft_adjoint(emap, omap=None, nthread=0, normalize=True):
	return fft(emap, omap=omap, nthread=nthread, normalize=normalize, adjoint_ifft=True)

def map2harm(emap, nthread=0, normalize=True, iau=False, spin=[0, 2], adjoint_harm2map=False):
	"""Flat-sky map -> harmonic coefficients, with spin-2 QU->EB rotation
	(reference enmap.map2harm:1358)."""
	emap = samewcs(fft(emap, normalize=normalize, adjoint_ifft=adjoint_harm2map), emap)
	if emap.ndim > 2:
		rot, s0 = None, None
		for s, d1, d2 in spin_helper(spin, emap.shape[-3]):
			if s == 0: continue
			if s != s0: s0, rot = s, queb_rotmat(emap.lmap(), iau=iau, spin=s)
			emap[..., d1:d2, :, :] = map_mul(rot, emap[..., d1:d2, :, :])
	return emap

def harm2map(emap, nthread=0, normalize=True, iau=False, spin=[0, 2], keep_imag=False, adjoint_map2harm=False):
	"""Flat-sky harmonic coefficients -> map (reference enmap.harm2map:1374)."""
	if emap.ndim > 2:
		emap = emap.copy()
		rot, s0 = None, None
		for s, d1, d2 in spin_helper(spin, emap.shape[-3]):
			if s == 0: continue
			if s != s0: s0, rot = s, queb_rotmat(emap.lmap(), iau=iau, spin=s, inverse=True)
			emap[..., d1:d2, :, :] = map_mul(rot, emap[..., d1:d2, :, :])
	res = samewcs(ifft(emap, normalize=normalize, adjoint_fft=adjoint_map2harm), emap)
	if not keep_imag: res = res.real
	return res

def map2harm_adjoint(emap, nthread=0, normalize=True, iau=False, spin=[0, 2], keep_imag=False):
	return harm2map(emap, nthread=nthread, normalize=normalize, iau=iau, spin=spin,
		keep_imag=keep_imag, adjoint_map2harm=True)

def harm2map_adjoint(emap, nthread=0, normalize=True, iau=False, spin=[0, 2]):
	return map2harm(emap, nthread=nthread, normalize=normalize, iau=iau, spin=spin,
		adjoint_harm2map=True)

def queb_rotmat(lmap, inverse=False, iau=False, spin=2):
	"""QU <-> EB rotation matrix [2,2,ny,nx] in Fourier space
	(reference enmap.queb_rotmat:1391)."""
	lmap = np.asarray(lmap)
	sgn = -1 if iau else 1
	a = spin*np.arctan2(sgn*lmap[1], lmap[0])
	c, s = np.cos(a), np.sin(a)
	if inverse: s = -s
	return np.array([[c, -s], [s, c]])

def rotate_pol(emap, angle, comps=[-2, -1], spin=2, axis=-3):
	"""Rotate the polarization components of emap by angle (reference :1402)."""
	xp = _xp_of(emap.data) if isinstance(emap, ndmap) else utils._xp(emap)
	arr = emap.data if isinstance(emap, ndmap) else emap
	c, s = xp.cos(spin*angle), xp.sin(spin*angle)
	arr = xp.moveaxis(arr, axis, 0)
	q = arr[comps[0]]
	u = arr[comps[1]]
	q2 = c*q - s*u
	u2 = s*q + c*u
	idx = [comps[0] % arr.shape[0], comps[1] % arr.shape[0]]
	if xp is np:
		arr = arr.copy(); arr[idx[0]] = q2; arr[idx[1]] = u2
	else:
		arr = arr.at[idx[0]].set(q2).at[idx[1]].set(u2)
	arr = xp.moveaxis(arr, 0, axis)
	return samewcs(arr, emap) if isinstance(emap, ndmap) else arr

def map_mul(mat, vec):
	"""Matrix-multiply mat[...,a,b,ny,nx] with vec[...,b,ny,nx]
	(reference enmap.map_mul:1418)."""
	mat_arr = mat.data if isinstance(mat, ndmap) else mat
	vec_arr = vec.data if isinstance(vec, ndmap) else vec
	xp = utils._xp(mat_arr, vec_arr)
	res = xp.einsum("...abyx,...byx->...ayx", xp.asarray(mat_arr), xp.asarray(vec_arr))
	return samewcs(res, vec if isinstance(vec, ndmap) else mat)

def smooth_gauss(emap, sigma):
	"""Smooth the map with a gaussian of standard deviation sigma (radians)
	(reference enmap.smooth_gauss:1429)."""
	if np.all(np.asarray(sigma) == 0): return emap.copy() if hasattr(emap, "copy") else emap
	f = map2harm(emap, spin=[0])
	l2 = np.asarray(modlmap(emap.shape, emap.wcs))**2
	f = f*jnp.exp(-0.5*l2*sigma**2)
	return harm2map(f, spin=[0]).astype(emap.dtype) if np.isrealobj(np.empty(0, emap.dtype)) else harm2map(f, spin=[0])

def calc_window(shape, order=0, scale=1):
	"""Fourier response of the pixel window [ny,nx//2+1] (reference :1463)."""
	wy = np.sinc(np.fft.fftfreq(shape[-2])*scale)**(order+1)
	wx = np.sinc(np.fft.fftfreq(shape[-1])*scale)**(order+1)
	return wy, wx

def apply_window(emap, pow=1.0, order=0, scale=1, nofft=False):
	"""Multiply the map by the pixel window function to the given power
	(reference enmap.apply_window:1485)."""
	wy, wx = calc_window(emap.shape, order=order, scale=scale)
	f = fft(emap, normalize=False)
	f = f*(wy[:, None]**pow)*(wx[None, :]**pow)
	res = ifft(f, normalize=False).real/np.prod(emap.shape[-2:])
	return samewcs(res, emap)

def unapply_window(emap, pow=1.0, order=0, scale=1, nofft=False):
	return apply_window(emap, pow=-pow, order=order, scale=scale, nofft=nofft)


# ---------------------------------------------------------------------------
# Random fields (reference enmap.py:862-916, spec2flat:1859)
# ---------------------------------------------------------------------------
def spec2flat(shape, wcs, cov, exp=1.0, mode="constant", border="constant",
		oversample=1, smooth="auto"):
	"""Expand a 1D power spectrum cov[{ncomp,ncomp},nl] (or [nl]) to a 2D
	Fourier-plane map using the map's modlmap (reference enmap.spec2flat:1859)."""
	cov = np.asarray(cov)
	oned = cov.ndim == 1
	if oned: cov = cov[None, None]
	ncomp = cov.shape[0]
	if exp != 1.0: cov = multi_pow(cov, exp)
	# ls may exceed the length of cov; extend with zeros
	l = np.asarray(modlmap(shape, wcs, oversample=oversample))
	li = np.minimum(l.astype(int), cov.shape[-1]-1)
	res = cov[..., li]
	res = res*(l <= cov.shape[-1]-1) if mode == "constant" else res
	res = ndmap(res, wcs)
	return res[0, 0] if oned else res

def multi_pow(mat, exp, axes=[0, 1]):
	"""Raise each positive-semidefinite submatrix mat[...,:,:] to a power."""
	return utils.eigpow(np.asarray(mat), exp, axes=axes)

def rand_gauss(shape, wcs, dtype=None, seed=None):
	"""White gaussian noise map."""
	rng = np.random.default_rng(seed)
	return ndmap(rng.standard_normal(shape).astype(dtype or np.float64), wcs)

def rand_gauss_harm(shape, wcs, seed=None):
	"""Complex white gaussian noise in Fourier space."""
	rng = np.random.default_rng(seed)
	# per-component unit variance: taking .real after the inverse transform
	# projects onto the hermitian part, halving the power, so the complex
	# noise needs variance 2 for the real map to have unit white spectrum
	d = rng.standard_normal(shape) + 1j*rng.standard_normal(shape)
	return ndmap(d, wcs)

def rand_gauss_iso_harm(shape, wcs, cov, pixel_units=False, seed=None):
	"""Gaussian random field in Fourier space with the given spectrum
	(reference enmap.rand_gauss_iso_harm:885)."""
	chol = spec2flat(shape, wcs, np.asarray(cov), exp=0.5, mode="constant")
	chol_arr = np.asarray(chol)
	if not pixel_units:
		# scale so that map2harm(map, normalize="phys") recovers cov:
		# harm needs <|h|^2> = C_l/pixsize under the 1/sqrt(npix) fft norm
		chol_arr = chol_arr / pixsize(shape, wcs)**0.5
	noise = np.asarray(rand_gauss_harm(shape, wcs, seed=seed))
	if chol_arr.ndim > 2:
		d = np.einsum("ab...,b...->a...", chol_arr, noise.reshape((-1,)+noise.shape[-2:])
			if noise.ndim > 2 else noise[None])
		if noise.ndim == 2: d = d[0]
	else:
		d = chol_arr*noise
	return ndmap(d, wcs)

def rand_map(shape, wcs, cov, scalar=False, seed=None, pixel_units=False,
		iau=False, spin=[0, 2]):
	"""Gaussian random field with the given power spectrum, in real space
	(reference enmap.rand_map:862)."""
	harm = rand_gauss_iso_harm(shape, wcs, cov, pixel_units=pixel_units, seed=seed)
	if scalar or harm.ndim == 2:
		return ifft(harm).real
	else:
		return harm2map(harm, iau=iau, spin=spin)

def massage_spectrum(cov, shape):
	"""Make a spectrum compatible with a map shape (reference :918)."""
	cov = np.asarray(cov)
	if cov.ndim == 1: cov = cov[None, None]
	ncomp = shape[-3] if len(shape) > 2 else 1
	if cov.shape[0] != ncomp:
		ocov = np.zeros((ncomp, ncomp) + cov.shape[2:])
		n = min(ncomp, cov.shape[0])
		ocov[:n, :n] = cov[:n, :n]
		cov = ocov
	return cov


# ---------------------------------------------------------------------------
# Spin helpers (reference enmap.py:3378-3447)
# ---------------------------------------------------------------------------
def spin_helper(spin, n):
	"""Iterate (spin, d1, d2) pairs covering n components with the given spin
	list: spin-0 consumes 1 component, spin!=0 consumes 2 (reference :3378)."""
	spins = np.atleast_1d(np.asarray(spin, int))
	i = 0; si = 0
	while i < n:
		s = int(spins[min(si, len(spins)-1)])
		step = 1 if s == 0 else 2
		if i + step > n: step = n - i; s = 0
		yield s, i, i+step
		i += step; si += 1

def spin_pre_helper(spin, pre):
	"""Like spin_helper, but yields index tuples for arbitrary pre-dims."""
	pre = tuple(pre)
	for I in utils.nditer(pre[:-1]) if len(pre) > 1 else [()]:
		n = pre[-1] if len(pre) > 0 else 1
		for s, d1, d2 in spin_helper(spin, n):
			yield s, I + (slice(d1, d2),)


# ---------------------------------------------------------------------------
# Reprojection onto other geometries (reference enmap.project:561, at:796)
# ---------------------------------------------------------------------------
def project(map, shape, wcs, order=3, border="constant", cval=0.0, force=False,
		safe=True, bsize=1000, context=50, ip=None):
	"""Project the map onto a new geometry via (spline) interpolation
	(reference enmap.project:561)."""
	# Fast path: compatible pixelizations -> pure extract
	if not force and wcsutils.is_compatible(map.wcs, wcs) and order in [0, 1, 3]:
		if wcsutils.equal(map.wcs, wcs) and tuple(map.shape[-2:]) == tuple(shape[-2:]):
			return map.copy()
	from . import interpol as ip_mod
	opos = posmap(shape, wcs, safe=safe)
	ipix = np.asarray(sky2pix(map.shape, map.wcs, np.asarray(opos), safe=safe))
	omap = ip_mod.map_coordinates(np.asarray(map.preflat()), ipix, order=order,
		border=border, cval=cval)
	omap = omap.reshape(tuple(map.shape[:-2]) + tuple(shape[-2:]))
	return ndmap(omap, wcs)

def at(map, pos, order=3, border="constant", cval=0.0, safe=True, unit="coord", ip=None):
	"""Evaluate the map at the given positions pos[{dec,ra},...]
	(reference enmap.at:796)."""
	from . import interpol as ip_mod
	pos = np.asarray(pos)
	if unit == "coord":
		pix = np.asarray(sky2pix(map.shape, map.wcs, pos, safe=safe))
	else: pix = pos
	res = ip_mod.map_coordinates(np.asarray(map.preflat()), pix, order=order,
		border=border, cval=cval)
	return res.reshape(tuple(map.shape[:-2]) + pos.shape[1:])


# ---------------------------------------------------------------------------
# Distance transforms & masks (reference enmap.py:2127-2287; the heavy
# lifting lives in pixell_tpu.distances)
# ---------------------------------------------------------------------------
def distance_transform(mask, omap=None, rmax=None, method="auto"):
	"""Angular distance of each False pixel to the nearest True pixel
	edge... Computes the distance from masked (False) to unmasked regions
	(reference enmap.distance_transform:2127). mask: True = masked? We follow
	the reference: computes distance from the edges of the False regions.
	Returns distance map in radians."""
	from . import distances
	return distances.distance_transform(mask, rmax=rmax)

def labeled_distance_transform(labels, omap=None, odomains=None, rmax=None, method="auto"):
	from . import distances
	return distances.labeled_distance_transform(labels, rmax=rmax)

def distance_from(shape, wcs, points, omap=None, odomains=None, domains=False,
		method="auto", rmax=None, step=1024):
	"""Distance of each pixel from the nearest of the given points
	[{dec,ra},npoint] (reference enmap.distance_from:2193)."""
	from . import distances
	return distances.distance_from_points(shape, wcs, points, rmax=rmax, domains=domains)

def grow_mask(mask, r):
	"""Grow the True region of mask by r radians."""
	d = distance_transform(~mask if np.asarray(mask).dtype == bool else mask == 0)
	return samewcs(np.asarray(d) <= r, mask) if not isinstance(mask, ndmap) else ndmap(np.asarray(d) <= r, mask.wcs)

def shrink_mask(mask, r):
	"""Shrink the True region of mask by r radians."""
	d = distance_transform(mask)
	res = np.asarray(d) > r
	return ndmap(res, mask.wcs) if isinstance(mask, ndmap) else res

def mask_from(mask): return mask


# ---------------------------------------------------------------------------
# healpix / flipper interop (reference enmap.py:2607-2661)
# ---------------------------------------------------------------------------
def to_healpix(imap, omap=None, nside=0, order=3, chunk=100000, destroy_input=False):
	from . import reproject
	return reproject.map2healpix(imap, nside=nside, order=order)

def from_healpix(hmap, shape, wcs, order=3, rot=None):
	from . import reproject
	return reproject.healpix2map(hmap, shape, wcs, order=order, rot=rot)


# ---------------------------------------------------------------------------
# I/O (reference enmap.py:2663-3276). Pure-python FITS + h5py HDF5.
# ---------------------------------------------------------------------------
def write_map(fname, emap, fmt=None, address=None, extra={}, allow_modify=False):
	"""Write a map to FITS/HDF5/npy based on the extension (reference :2663)."""
	if fmt is None:
		if   fname.endswith(".hdf") or fname.endswith(".h5"): fmt = "hdf"
		elif fname.endswith(".fits") or fname.endswith(".fits.gz"): fmt = "fits"
		elif fname.endswith(".npy"): fmt = "npy"
		else: fmt = "fits"
	if   fmt == "fits": write_fits(fname, emap, extra=extra)
	elif fmt == "hdf":  write_hdf(fname, emap, address=address, extra=extra)
	elif fmt == "npy":  write_npy(fname, emap, extra=extra)
	else: raise ValueError("Unrecognized format '%s'" % fmt)

def read_map(fname, fmt=None, sel=None, box=None, pixbox=None, geometry=None,
		wrap="auto", mode=None, sel_threshold=10e6, wcs=None, hdu=None,
		delayed=False, verbose=False, address=None):
	"""Read a map from FITS/HDF5/npy (reference enmap.read_map:2714). The
	filename may include a trailing slice like 'file.fits:[0,:100]'."""
	toks = fname.split(":")
	fname = toks[0]
	fsel = utils.parse_slice(":".join(toks[1:])) if len(toks) > 1 else None
	if fmt is None:
		if   fname.endswith(".hdf") or fname.endswith(".h5"): fmt = "hdf"
		elif fname.endswith(".fits") or fname.endswith(".fits.gz"): fmt = "fits"
		elif fname.endswith(".npy"): fmt = "npy"
		else: fmt = "fits"
	if delayed and fmt == "fits":
		res = ndmap_proxy_fits(fname, hdu=hdu, wcs=wcs)
	elif fmt == "fits": res = read_fits(fname, hdu=hdu, wcs=wcs)
	elif fmt == "hdf":  res = read_hdf(fname, address=address, wcs=wcs)
	elif fmt == "npy":  res = read_npy(fname, wcs=wcs)
	else: raise ValueError("Unrecognized format '%s'" % fmt)
	if fsel is not None: res = res[fsel]
	if sel is not None: res = res[sel]
	if box is not None: res = submap(res, box, wrap=wrap)
	if pixbox is not None: res = extract_pixbox(res, pixbox, wrap=wrap)
	if geometry is not None: res = extract(res, geometry[0], geometry[1], wrap=wrap)
	return res

def read_map_geometry(fname, fmt=None, hdu=None, address=None):
	"""Read just the geometry from a map file (reference :2772)."""
	toks = fname.split(":")
	fname = toks[0]
	if fmt is None:
		if   fname.endswith(".hdf") or fname.endswith(".h5"): fmt = "hdf"
		elif fname.endswith(".fits") or fname.endswith(".fits.gz"): fmt = "fits"
		else: fmt = "fits"
	if fmt == "fits":
		from . import fits_io
		shape, hdr = fits_io.read_header(fname, hdu=hdu or 0)
		return shape, wcsutils.WCS(header=hdr)
	elif fmt == "hdf":
		import h5py
		with h5py.File(fname, "r") as f:
			grp = f[address] if address else f
			shape = tuple(grp["data"].shape)
			wcs = _wcs_from_hdf(grp)
			return shape, wcs
	raise ValueError("Unrecognized format '%s'" % fmt)

def write_fits(fname, emap, extra={}):
	from . import fits_io
	hdr = emap.wcs.to_header() if isinstance(emap, ndmap) else {}
	hdr.update(extra)
	fits_io.write_map(fname, np.asarray(emap), hdr)

def read_fits(fname, hdu=None, wcs=None):
	from . import fits_io
	data, hdr = fits_io.read_map(fname, hdu=hdu or 0)
	if wcs is None: wcs = wcsutils.WCS(header=hdr)
	return ndmap(data, wcs)

def write_hdf(fname, emap, address=None, extra={}):
	import h5py
	with h5py.File(fname, "w") as f:
		grp = f.create_group(address) if address else f
		grp["data"] = np.asarray(emap)
		if isinstance(emap, ndmap):
			hdr = emap.wcs.to_header()
			for k, v in hdr.items():
				grp.attrs["wcs_"+k] = v
		for k, v in extra.items(): grp[k] = v

def _wcs_from_hdf(grp):
	hdr = {}
	for k, v in grp.attrs.items():
		if k.startswith("wcs_"):
			val = v
			if isinstance(val, bytes): val = val.decode()
			hdr[k[4:]] = val
	return wcsutils.WCS(header=hdr)

def read_hdf(fname, address=None, wcs=None):
	import h5py
	with h5py.File(fname, "r") as f:
		grp = f[address] if address else f
		data = grp["data"][()]
		if wcs is None: wcs = _wcs_from_hdf(grp)
		return ndmap(data, wcs)

def write_npy(fname, emap, extra={}):
	np.save(fname, np.asarray(emap))

def read_npy(fname, wcs=None):
	if wcs is None: wcs = wcsutils.WCS(naxis=2)
	return ndmap(np.load(fname), wcs)

def fix_endian(map):
	d = np.asarray(map)
	if d.dtype.byteorder not in ("=", "<" if np.little_endian else ">", "|"):
		d = d.astype(d.dtype.newbyteorder("="))
	return samewcs(d, map) if isinstance(map, ndmap) else d

def get_stokes_flips(hdr):
	"""Which component axes need sign flips for IAU/healpix convention.
	Simplified: no flips by default (reference enmap.get_stokes_flips:3242)."""
	return -1


# ---------------------------------------------------------------------------
# Tiled processing (reference enmap.padtiles:3449, Padtiler:3521)
# ---------------------------------------------------------------------------
class Padtiler:
	"""Iterate over overlapping tiles of maps. tshape: interior tile shape;
	pad: extra pixels on each side; margin: apodizable margin inside pad."""
	def __init__(self, tshape=600, pad=60, margin=60, mode="auto"):
		self.tshape = tuple(np.zeros(2, int) + tshape)
		self.pad    = tuple(np.zeros(2, int) + pad)
		self.margin = tuple(np.zeros(2, int) + margin)
		self.mode   = mode
	def tiles_for(self, shape):
		ny = (shape[-2] + self.tshape[0] - 1)//self.tshape[0]
		nx = (shape[-1] + self.tshape[1] - 1)//self.tshape[1]
		return ny, nx
	def read(self, imap):
		"""Yield padded tiles of imap."""
		ny, nx = self.tiles_for(imap.shape)
		for ty in range(ny):
			for tx in range(nx):
				y1 = ty*self.tshape[0] - self.pad[0] - self.margin[0]
				x1 = tx*self.tshape[1] - self.pad[1] - self.margin[1]
				y2 = min((ty+1)*self.tshape[0], imap.shape[-2]) + self.pad[0] + self.margin[0]
				x2 = min((tx+1)*self.tshape[1], imap.shape[-1]) + self.pad[1] + self.margin[1]
				yield extract_pixbox(imap, np.array([[y1, x1], [y2, x2]]))
	def write(self, omap, tiles):
		"""Write back tiles produced by read(), cropping the pad+margin."""
		ny, nx = self.tiles_for(omap.shape)
		it = iter(tiles)
		for ty in range(ny):
			for tx in range(nx):
				tile = next(it)
				py, px = self.pad[0]+self.margin[0], self.pad[1]+self.margin[1]
				inner = tile[..., py:tile.shape[-2]-py, px:tile.shape[-1]-px]
				insert_at(omap, [ty*self.tshape[0], tx*self.tshape[1]], inner)
		return omap

def padtiles(*maps, tshape=600, pad=60, margin=60, mode="auto", start=0, step=1):
	"""Convenience generator over padded tiles of several maps in parallel
	(reference enmap.padtiles:3449)."""
	tiler = Padtiler(tshape=tshape, pad=pad, margin=margin, mode=mode)
	iters = [tiler.read(m) for m in maps]
	for tiles in zip(*iters):
		yield tiles if len(tiles) > 1 else tiles[0]


def resample_fft(map, oshape, fwcs=None, off=(0,0), corner=False, norm="pix", op=None, dummy=False):
	from . import resample as _rs
	return _rs.resample(map, oshape, method="fft")

def resample(map, oshape, off=(0,0), method="fft", mode="wrap", corner=False, order=3):
	from . import resample as _rs
	return _rs.resample(map, oshape, method=method, mode=mode, corner=corner, order=order)


def inpaint(map, mask, method="nearest"):
	"""Fill masked (True) pixels with values from the nearest unmasked pixel
	or by constrained smoothing (reference enmap.inpaint:1441)."""
	from . import distances
	mask = np.asarray(mask) != 0
	if method == "nearest":
		dist, inds = distances.distance_transform(
			ndmap(~mask, map.wcs) if isinstance(map, ndmap) else ~mask, return_inds=True)
		arr = np.asarray(map).copy()
		iy, ix = np.asarray(inds)
		arr[..., mask] = arr[..., iy[mask], ix[mask]]
		return samewcs(arr, map)
	else:
		raise NotImplementedError(method)


class ndmap_proxy_fits:
	"""Delayed-read ndmap: has .shape/.wcs, and slicing reads only the
	needed pixel box from disk via the native FITS core
	(reference enmap.ndmap_proxy_fits:3167)."""
	def __init__(self, fname, hdu=None, wcs=None):
		from . import fits_io
		self.proxy = fits_io.open_proxy(fname, hdu=hdu or 0)
		self.fname = fname
		if wcs is None: wcs = wcsutils.WCS(header=self.proxy.header)
		self.wcs = wcs
	@property
	def shape(self): return self.proxy.shape
	@property
	def ndim(self): return len(self.shape)
	@property
	def dtype(self): return self.proxy.dtype
	@property
	def geometry(self): return self.shape, self.wcs
	def __getitem__(self, sel):
		sel1, sel2 = utils.split_slice(sel if isinstance(sel, tuple) else (sel,),
			[self.ndim-2, 2])
		data = self.proxy[sel if isinstance(sel, tuple) else (sel,)]
		if len(sel2) < 2 or all(isinstance(s, slice) for s in sel2):
			_, wcs = slice_geometry(self.shape[-2:], self.wcs,
				tuple(sel2) + (slice(None),)*(2-len(sel2)))
			return ndmap(data, wcs)
		return data
	def read(self):
		return self[:]
	@property
	def preflat(self):
		"""View with the pre-dimensions flattened into one
		(reference enmap.ndmap_proxy_fits.preflat:3210)."""
		return _preflat_proxy(self)

ndmap_proxy = ndmap_proxy_fits


class _preflat_proxy:
	"""Flattened-pre view over a delayed-read proxy (reference
	ndmap_proxy.preflat semantics, enmap.py:3139-3233)."""
	def __init__(self, proxy):
		self.proxy = proxy
		npre = int(np.prod(proxy.shape[:-2]))
		self.shape = (npre,) + tuple(proxy.shape[-2:])
		self.wcs = proxy.wcs
	@property
	def ndim(self): return 3
	@property
	def dtype(self): return self.proxy.dtype
	@property
	def geometry(self): return self.shape, self.wcs
	def __getitem__(self, sel):
		full = self.proxy[:]
		arr = full.data if isinstance(full, ndmap) else full
		flat = ndmap(jnp.asarray(arr).reshape(self.shape), self.wcs)
		return flat[sel]
	def read(self): return self[:]


# ---------------------------------------------------------------------------
# Additional geometry/map utilities (reference enmap.py; parity batch)
# ---------------------------------------------------------------------------
def npix(shape):
	"""Number of pixels implied by a shape (reference enmap.npix)."""
	return int(np.prod(shape[-2:]))

def posmap_old(shape, wcs, safe=True, corner=False):
	return posmap(shape, wcs, safe=safe, corner=corner)

def subgeo(shape, wcs, box=None, pixbox=None, mode=None, noflip=False, recenter=False):
	"""Geometry of the part inside the coordinate/pixel box (reference
	enmap.subgeo)."""
	if pixbox is not None:
		ibox = np.asarray(pixbox)
	else:
		ibox = subinds(shape, wcs, box, mode=mode, noflip=noflip, cap=False)
	ogeo = slice_geometry(shape, wcs, (slice(*ibox[:, 0]), slice(*ibox[:, 1])),
		nowrap=True)
	if recenter: ogeo = recenter_geo(*ogeo)
	return ogeo

def crop_geometry(shape, wcs, box=None, pixbox=None, oshape=None, recenter=False):
	"""Geometry cropped to a box, or centered on a point with oshape
	(reference enmap.crop_geometry)."""
	if pixbox is None:
		box = np.asarray(box)
		if box.ndim == 2:
			pixbox = subinds(shape, wcs, box, cap=False)
		else:
			pixbox = utils.nint(np.asarray(sky2pix(shape, wcs, box)))
	pixbox = np.asarray(pixbox)
	if pixbox.ndim == 1:
		if oshape is None:
			raise ValueError("crop_geometry needs an output shape for a point box")
		shp = np.array(oshape[-2:])
		pixbox = np.array([pixbox - shp//2, pixbox - shp//2 + shp])
	oshape2 = tuple(shape[:-2]) + tuple(np.abs(pixbox[1] - pixbox[0]))
	owcs = wcs.deepcopy()
	owcs.wcs.crpix = np.asarray(owcs.wcs.crpix) - pixbox[0, ::-1]
	if recenter:
		owcs = wcsutils.recenter_cyl_x(owcs, oshape2[-1]//2)
	return oshape2, owcs

def map_union(map1, map2):
	"""Union of two maps in a common geometry; overlaps are summed
	(reference enmap.map_union)."""
	oshape, owcs = union_geometry([map1.geometry, map2.geometry])
	omap = zeros(map1.shape[:-2] + oshape[-2:], owcs, map1.dtype)
	omap = insert(omap, map1)
	omap = insert(omap, map2, op=lambda a, b: a + b)
	return omap

def argmax(map, unit="coord"):
	"""Coordinates (or pixels) of the maximum of each component
	(reference enmap.argmax)."""
	return _argextreme(map, np.argmax, unit)

def argmin(map, unit="coord"):
	return _argextreme(map, np.argmin, unit)

def _argextreme(map, op, unit):
	arr = np.asarray(map)
	flat = arr.reshape(-1, arr.shape[-2]*arr.shape[-1])
	inds = op(flat, -1)
	pix = np.array(np.unravel_index(inds, arr.shape[-2:]), float)
	if unit == "pix":
		res = pix
	else:
		res = np.asarray(pix2sky(map.shape, map.wcs, pix))
	res = res.T.reshape(arr.shape[:-2] + (2,))
	return res[0] if arr.ndim == 2 and res.shape[0] == 1 else res.reshape(arr.shape[:-2] + (2,))

def extent_intermediate(shape, wcs, signed=False):
	"""Extent as the WCS intermediate coordinates (reference
	enmap.extent_intermediate)."""
	res = np.array(wcs.wcs.cdelt[::-1])*shape[-2:]*utils.degree
	if not signed: res = np.abs(res)
	return res

def extent_cyl(shape, wcs, signed=False):
	return extent(shape, wcs, signed=signed, method="cylindrical")

def extent_subgrid(shape, wcs, nsub=None, safe=True, signed=False):
	return extent(shape, wcs, nsub=nsub, signed=signed, method="subgrid")

def area_intermediate(shape, wcs):
	"""Area of a completely flat sky (reference enmap.area_intermediate)."""
	return np.abs(shape[-2]*shape[-1]*wcs.wcs.cdelt[0]*wcs.wcs.cdelt[1])*utils.degree**2

def area_cyl(shape, wcs):
	"""Exact area of a cylindrical geometry (reference enmap.area_cyl)."""
	ps = pixsizemap_cyl(shape, wcs)
	return float(np.sum(np.asarray(ps)[:, 0]))*shape[-1]

def area_contour(shape, wcs, nsamp=1000):
	"""Map area via the contour integral (1-sin dec) dRA around the boundary
	(reference enmap.area_contour)."""
	ny, nx = shape[-2:]
	# boundary through pixel edges
	t = np.linspace(-0.5, nx - 0.5, nsamp)
	b = np.linspace(-0.5, ny - 0.5, nsamp)
	segs = [np.stack([np.full(nsamp, -0.5), t]),            # top row (y=-0.5)
		np.stack([b, np.full(nsamp, nx - 0.5)]),            # right col
		np.stack([np.full(nsamp, ny - 0.5), t[::-1]]),      # bottom
		np.stack([b[::-1], np.full(nsamp, -0.5)])]          # left
	total = 0.0
	for seg in segs:
		pos = np.asarray(pix2sky(shape, wcs, seg))
		dec = np.clip(pos[0], -np.pi/2, np.pi/2)
		ra = pos[1]
		msin = 1 - np.sin(dec)
		# rewind ra steps: the longitude branch cut may cross the boundary
		dra = utils.rewind(ra[1:] - ra[:-1])
		total += np.sum(dra*(msin[1:] + msin[:-1])/2)
	return abs(total)

def pixsizemap_contour(shape, wcs, bsize=1000, bcheck=False):
	"""Per-pixel solid angles via per-pixel contour integrals (reference
	enmap.pixsizemap_contour)."""
	out = np.zeros(shape[-2:])
	for y1 in range(0, shape[-2], bsize):
		y2 = min(y1 + bsize, shape[-2])
		pixs = np.mgrid[y1:y2+1, :shape[-1]+1] - 0.5
		poss = np.asarray(pix2sky(shape, wcs, pixs.reshape(2, -1))).reshape(pixs.shape)
		dec = np.clip(poss[0], -np.pi/2, np.pi/2)
		ra = poss[1]
		msin = 1 - np.sin(dec)
		areas  = (ra[1:, :-1] - ra[:-1, :-1])*(msin[1:, :-1] + msin[:-1, :-1])/2
		areas += (ra[1:, 1:] - ra[1:, :-1])*(msin[1:, 1:] + msin[1:, :-1])/2
		areas += (ra[:-1, 1:] - ra[1:, 1:])*(msin[:-1, 1:] + msin[1:, 1:])/2
		areas += (ra[:-1, :-1] - ra[:-1, 1:])*(msin[:-1, :-1] + msin[:-1, 1:])/2
		out[y1:y2] = np.abs(areas)
	return ndmap(jnp.asarray(out), wcs)

def lwcs(shape, wcs, method="auto"):
	"""WCS for l-space maps (reference enmap.lwcs)."""
	lres = 2*np.pi/extent(shape, wcs, signed=True, method=method)
	ny, nx = shape[-2:]
	return wcsutils.explicit(crpix=[nx//2+1, ny//2+1], crval=[0, 0],
		cdelt=list(np.asarray(lres)[::-1]/utils.degree))

def lpixshape(shape, wcs, signed=False, method="auto"):
	"""l-space pixel shape (reference enmap.lpixshape)."""
	return 2*np.pi/extent(shape, wcs, signed=signed, method=method)

def lpixsize(shape, wcs, signed=False, method="auto"):
	return float(np.prod(lpixshape(shape, wcs, signed=signed, method=method)))

def dct_adjoint(emap, omap=None, nthread=0, normalize=True):
	"""Adjoint of dct (reference enmap.dct_adjoint)."""
	return idct(emap, omap=omap, normalize=normalize)

def idct_adjoint(emap, omap=None, nthread=0, normalize=True):
	return dct(emap, omap=omap, normalize=normalize)

def fullsky_geometry2(res=None, shape=None, pre=None, deg=False, proj="car",
		variant=None, dims=None):
	"""geometry2-style fullsky builder (reference enmap.fullsky_geometry2)."""
	if deg and res is not None: res = np.asarray(res)*utils.degree
	return fullsky_geometry(res=res, shape=shape,
		dims=tuple(pre or dims or ()), proj=proj, variant=variant or "fejer1")

def band_geometry2(decrange, res=None, shape=None, pre=None, deg=False,
		proj="car", variant=None, dims=None):
	if deg:
		decrange = np.asarray(decrange)*utils.degree
		if res is not None: res = np.asarray(res)*utils.degree
	return band_geometry(decrange, res=res, shape=shape,
		dims=tuple(pre or dims or ()), proj=proj, variant=variant or "fejer1")

def recenter_cyl(shape, wcs):
	"""Move the reference point to the equator point nearest the middle
	(reference enmap.recenter_cyl)."""
	return shape, wcsutils.recenter_cyl_x(wcs, (shape[-1]-1)/2 + 1)

def create_wcs(shape, box=None, proj="cea"):
	"""Legacy wcs builder (reference enmap.create_wcs)."""
	if box is None:
		box = np.array([[-5, -5], [5, 5]])*utils.degree
	return geometry(pos=np.asarray(box), shape=shape[-2:], proj=proj)[1]

def smooth_spectrum(ps, kernel="gauss", weight="mode", width=1.0):
	"""Kernel-smooth a 1d spectrum with mode weighting (reference
	enmap.smooth_spectrum)."""
	ps = np.asanyarray(ps)
	pflat = ps.reshape(-1, ps.shape[-1])
	nspec, nl = pflat.shape
	l = np.arange(nl)
	if isinstance(kernel, str):
		if kernel == "gauss": K = np.exp(-0.5*(l/width)**2)
		elif kernel == "step": K = (l < int(width)).astype(float)
		else: raise ValueError("Unknown kernel type %s" % kernel)
		K = np.broadcast_to(K, (nspec, nl)).copy()
	else:
		K = np.zeros((nspec, nl))
		tmp = np.atleast_2d(kernel)
		K[:, :tmp.shape[-1]] = tmp[:, :nl]
	if isinstance(weight, str):
		if weight == "mode": W = np.broadcast_to((l**2).astype(float), (nspec, nl)).copy()
		elif weight == "uniform": W = np.ones((nspec, nl))
		else: raise ValueError("Unknown weighting scheme %s" % weight)
	else:
		W = np.broadcast_to(np.atleast_2d(weight), (nspec, nl)).copy()
	# symmetric convolution via reflection at l=0
	def sym_conv(arr, ker):
		ext = np.concatenate([arr[:, ::-1], arr, arr[:, ::-1]], -1)
		out = np.empty_like(arr)
		for i in range(nspec):
			full = np.convolve(ext[i], ker[i]/max(ker[i].sum(), 1e-300), mode="same")
			out[i] = full[nl:2*nl]
		return out
	smoothed = sym_conv(pflat*W, K)/np.maximum(sym_conv(W, K), 1e-300)
	return smoothed.reshape(ps.shape)

def calc_ps2d(harm, harm2=None):
	"""2d (cross-)power spectrum of harmonic-space enmaps (reference
	enmap.calc_ps2d)."""
	h1 = jnp.asarray(harm)
	h2 = h1 if harm2 is None else jnp.asarray(harm2)
	ps = (h1*jnp.conj(h2)).real
	return samewcs(ps, harm)

def get_downgrade_offset(shape, wcs, factor, ref=None):
	"""Pixel offset keeping a downgrade aligned with ref (reference
	enmap.get_downgrade_offset)."""
	factor = np.zeros(2, int) + factor
	if ref is None: return np.zeros(2, int)
	return utils.nint(np.asarray(sky2pix(shape, wcs, ref))) % factor

def find_blank_edges(m, value=0):
	"""Blank margins [{front,back},{y,x}] of a map (reference
	enmap.find_blank_edges)."""
	arr = np.asarray(m)
	if isinstance(value, str) and value == "auto":
		medians = [np.median(arr[..., :, i], -1) for i in [0, -1]] + \
			[np.median(arr[..., i, :], -1) for i in [0, -1]]
		bs = [find_blank_edges(m, med) for med in medians]
		nb = [np.prod(np.sum(b, 0)) for b in bs]
		return bs[int(np.argmax(nb))]
	if isinstance(value, str) and value == "none":
		return np.zeros([2, 2], int)
	value = np.asarray(value)
	hitmask = np.all(np.isclose(arr.T, value.T, equal_nan=True, rtol=1e-6,
		atol=0).T, axis=tuple(range(arr.ndim - 2)))
	hitrows = np.where(~np.all(hitmask, 1))[0]
	hitcols = np.where(~np.all(hitmask, 0))[0]
	if len(hitrows) == 0 or len(hitcols) == 0:
		return np.array([[0, 0], [0, 0]])
	y1, y2 = hitrows[[0, -1]]
	x1, x2 = hitcols[[0, -1]]
	ny, nx = arr.shape[-2:]
	return np.array([[y1, x1], [ny - 1 - y2, nx - 1 - x2]])

def padslice(map, box, default=np.nan):
	"""Slice by pixel box, padding out-of-map pixels with default
	(reference enmap.padslice)."""
	box = np.asarray(box, int)
	oshape = map.shape[:-2] + tuple(box[1] - box[0])
	out = full(oshape, slice_geometry(map.shape, map.wcs,
		(slice(box[0, 0], box[1, 0]), slice(box[0, 1], box[1, 1])), nowrap=True)[1],
		default, np.asarray(map).dtype)
	# overlapping region
	i1 = np.maximum(box[0], 0)
	i2 = np.minimum(box[1], np.array(map.shape[-2:]))
	if np.any(i2 <= i1): return out
	o1 = i1 - box[0]; o2 = o1 + (i2 - i1)
	data = jnp.asarray(out.data).at[..., o1[0]:o2[0], o1[1]:o2[1]].set(
		jnp.asarray(map)[..., i1[0]:i2[0], i1[1]:i2[1]])
	return ndmap(data, out.wcs)

def padcrop(m, info):
	return pad(m, info.pad)[info.slice]

def grad(m):
	"""Gradient of the map as [2,...] via FFT (reference enmap.grad)."""
	lm = jnp.asarray(lmap(m.shape, m.wcs))
	f = jnp.asarray(fft(m))
	g = ifft(samewcs(f[None]*lm[(slice(None),) + (None,)*(m.ndim-2)]*1j, m))
	return samewcs(jnp.asarray(g).real, m)

def grad_pix(m):
	"""Gradient in pixel units (reference enmap.grad_pix)."""
	scale = np.array(m.shape[-2:])/np.asarray(extent(m.shape, m.wcs, signed=True))
	return samewcs(jnp.asarray(grad(m))*jnp.asarray(scale)[(slice(None),) + (None,)*m.ndim], m)

def div(m):
	"""Divergence of m[2,...] (reference enmap.div)."""
	lm = jnp.asarray(lmap(m.shape, m.wcs))
	f = jnp.asarray(fft(m))
	pre = (slice(None),) + (None,)*(m.ndim-3)
	g = ifft(samewcs(jnp.sum(f*lm[pre]*1j, 0), m))
	return samewcs(jnp.asarray(g).real, m)

def laplace(m):
	lm = jnp.asarray(modlmap(m.shape, m.wcs))
	return samewcs(-jnp.asarray(ifft(samewcs(jnp.asarray(fft(m))*lm**2, m))).real, m)

def apod_mask(mask, width=1*utils.degree, edge=True, profile=apod_profile_cos):
	"""Smooth apodization of a 0/1 mask over the given width (reference
	enmap.apod_mask)."""
	from . import distances
	arr = np.asarray(mask).astype(bool)
	if edge:
		arr = arr.copy()
		arr[..., 0, :] = False; arr[..., -1, :] = False
		arr[..., :, 0] = False; arr[..., :, -1] = False
	m2 = ndmap(jnp.asarray(arr), mask.wcs)
	r = distance_transform(m2, rmax=width)
	x = np.clip(np.asarray(r)/width, 0, 1)
	return samewcs(jnp.asarray(profile(x)), mask)

def radial_average(map, center=[0, 0], step=1.0):
	"""rbin alias (reference enmap.radial_average)."""
	return rbin(map, center=center)

def tile_maps(maps):
	"""Stack a 2d list of contiguous tiles into one map (reference
	enmap.tile_maps)."""
	m = jnp.concatenate([jnp.concatenate([jnp.asarray(t) for t in row], -1)
		for row in maps], -2)
	return samewcs(m, maps[0][0])

def to_flipper(imap, omap=None, unpack=True):
	"""Convert to flipper maps (requires flipper; reference enmap.to_flipper)."""
	import flipper.liteMap
	header = imap.wcs.to_header()
	res = []
	arr = np.asarray(imap)
	for sub in arr.reshape((-1,) + arr.shape[-2:]):
		lm = flipper.liteMap.liteMapFromDataAndWCS(sub, imap.wcs)
		res.append(lm)
	res = np.array(res, object).reshape(arr.shape[:-2])
	return res if unpack and res.ndim else res.reshape(-1)[0]

def from_flipper(imap, omap=None):
	"""Construct an enmap from flipper map(s) (reference enmap.from_flipper)."""
	imap = np.asarray(imap, object)
	first = imap.reshape(-1)[0]
	data = np.array([np.asarray(m.data) for m in imap.reshape(-1)])
	data = data.reshape(imap.shape + data.shape[-2:])
	return ndmap(jnp.asarray(data), first.wcs if hasattr(first, "wcs") else first.wcs)

def parse_slice(s):
	"""Minimal string -> numpy slice tuple (reference enmap.parse_slice)."""
	s = s.strip()
	if not (s.startswith("[") and s.endswith("]")):
		raise ValueError("Invalid slice format")
	if "None" in s or "..." in s or "newaxis" in s:
		raise NotImplementedError
	parts = s[1:-1].split(",") if s[1:-1] else []
	out = []
	for part in parts:
		part = part.strip()
		if ":" in part:
			out.append(slice(*[int(x) if x else None for x in part.split(":")]))
		elif part:
			out.append(int(part))
		else:
			out.append(slice(None))
	return tuple(out)

def fix_python3(s):
	"""bytes -> str passthrough helper (reference enmap.fix_python3)."""
	return s.decode() if isinstance(s, bytes) else s

def fftshift(map, inplace=False):
	out = jnp.fft.fftshift(jnp.asarray(map), axes=(-2, -1))
	return samewcs(out, map)

def ifftshift(map, inplace=False):
	out = jnp.fft.ifftshift(jnp.asarray(map), axes=(-2, -1))
	return samewcs(out, map)

def spec2flat_corr(shape, wcs, cov, exp=1.0, border="constant"):
	"""spec2flat via the correlation function (curvature-aware; reference
	enmap.spec2flat_corr)."""
	from . import powspec, interpol as _ip
	cov = np.asarray(cov)
	if cov.ndim == 1: cov = cov[None, None]
	if exp != 1.0:
		cov = utils.eigpow(np.moveaxis(cov, -1, 0), exp)
		cov = np.moveaxis(cov, 0, -1)
	cov = np.nan_to_num(cov)
	ext = np.asarray(extent(shape, wcs))
	rmax = np.sum(ext**2)**0.5
	res = np.max(ext/np.array(shape[-2:]))
	nr = int(rmax/res)
	r = np.arange(nr)*rmax/nr
	corrfun = powspec.spec2corr(cov, r)
	dpos = np.asarray(posmap(shape, wcs))
	dpos = dpos - dpos[:, None, None, dpos.shape[-2]//2, dpos.shape[-1]//2][:, :, :, 0, 0][..., None, None]
	ipos = np.arccos(np.clip(np.cos(dpos[0])*np.cos(dpos[1]), -1, 1))*nr/rmax
	corr2d = np.asarray(_ip.map_coordinates(jnp.asarray(corrfun),
		jnp.asarray(ipos.reshape(1, -1)), order=1, border="nearest"))
	corr2d = corr2d.reshape(corrfun.shape[:-1] + ipos.shape)
	corr2d = np.roll(corr2d, -corr2d.shape[-2]//2, -2)
	corr2d = np.roll(corr2d, -corr2d.shape[-1]//2, -1)
	return fft(ndmap(jnp.asarray(corr2d), wcs)).real*np.prod(shape[-2:])**0.5

def read_fits_header(fname, hdu=None, quick=True):
	"""Raw FITS header dict of the map HDU (reference enmap.read_fits_header)."""
	from . import fits_io
	shape, hdr = fits_io.read_header(fname, hdu=hdu or 0)
	return hdr

def read_fits_geometry(fname, hdu=None, quick=True):
	"""(shape, wcs) from a FITS file without reading data (reference
	enmap.read_fits_geometry)."""
	from . import fits_io
	shape, hdr = fits_io.read_header(fname, hdu=hdu or 0)
	wcs = wcsutils.WCS(header=hdr)
	return shape, wcs

def read_fits_dtype(fname, hdu=None, quick=True):
	from . import fits_io
	shape, hdr = fits_io.read_header(fname, hdu=hdu or 0)
	bitpix = int(hdr["BITPIX"])
	return {8: np.uint8, 16: np.int16, 32: np.int32, 64: np.int64,
		-32: np.float32, -64: np.float64}[bitpix]

def read_hdf_geometry(fname, address=None):
	"""(shape, wcs) from an hdf map file (reference enmap.read_hdf_geometry)."""
	import h5py
	with h5py.File(fname, "r") as f:
		g = f[address] if address else f
		shape = tuple(g["data"].shape)
		hdr = {k: (v.decode() if isinstance(v, bytes) else v)
			for k, v in g["wcs"].attrs.items()} if "wcs" in g else {}
		wcs = wcsutils.WCS(header=hdr)
	return shape, wcs

def read_hdf_dtype(fname, address=None):
	import h5py
	with h5py.File(fname, "r") as f:
		g = f[address] if address else f
		return g["data"].dtype

def read_map_dtype(fname, fmt=None, hdu=None, address=None):
	if fmt is None:
		fmt = "hdf" if fname.endswith(".hdf") or fname.endswith(".h5") else "fits"
	if fmt == "fits": return read_fits_dtype(fname, hdu=hdu)
	return read_hdf_dtype(fname, address=address)

def write_fits_geometry(fname, shape, wcs):
	"""Write a geometry-only FITS header (reference
	enmap.write_fits_geometry)."""
	from . import fits_io
	dummy = np.zeros(tuple(shape[-2:])[-2:], np.uint8)[:1, :1]
	hdr = wcs.to_header()
	hdr["NAXIS"] = len(shape)
	for i, n in enumerate(shape[::-1]):
		hdr["NAXIS%d" % (i+1)] = int(n)
	fits_io.write_map(fname, dummy, wcs, extra={"FULLSHP": ",".join(map(str, shape))})

def write_map_geometry(fname, shape, wcs, fmt=None):
	if fmt is None: fmt = "fits"
	if fmt != "fits": raise NotImplementedError("Only fits geometry output supported")
	write_fits_geometry(fname, shape, wcs)


class ndmap_proxy_hdf:
	"""Delayed-read hdf map: .shape/.wcs plus sliced reads
	(reference enmap.ndmap_proxy_hdf:3210)."""
	def __init__(self, fname, address=None, wcs=None):
		self.fname = fname
		self.address = address
		shape, w = read_map_geometry(fname, fmt="hdf", address=address)
		self.shape = shape
		self.wcs = wcs if wcs is not None else w
	@property
	def ndim(self): return len(self.shape)
	@property
	def geometry(self): return self.shape, self.wcs
	@property
	def dtype(self):
		return read_hdf_dtype(self.fname, address=self.address)
	def __getitem__(self, sel):
		import h5py
		with h5py.File(self.fname, "r") as f:
			grp = f[self.address] if self.address else f
			data = grp["data"][sel if isinstance(sel, tuple) else (sel,)]
		sel2 = sel if isinstance(sel, tuple) else (sel,)
		spat = tuple(s for s in sel2 if isinstance(s, slice))[-2:]
		_, wcs = slice_geometry(self.shape[-2:], self.wcs,
			tuple(spat) + (slice(None),)*(2-len(spat)))
		return ndmap(jnp.asarray(data), wcs)
	def read(self): return self[:]
	@property
	def preflat(self):
		"""Flattened-pre view (reference enmap.ndmap_proxy_hdf.preflat:3230)."""
		return _preflat_proxy(self)


def read_helper(data, sel=None, box=None, pixbox=None, geometry=None,
		wrap="auto", mode=None, delayed=False, recenter=False):
	"""Apply the standard read-time slicing/extraction options to an
	already-loaded map or proxy (reference enmap.read_helper:3130)."""
	res = data
	if sel is not None: res = res[sel]
	if not delayed and not isinstance(res, ndmap):
		res = res.read() if hasattr(res, "read") else res
	if box is not None: res = submap(res, box, wrap=wrap)
	if pixbox is not None: res = extract_pixbox(res, pixbox, wrap=wrap)
	if geometry is not None: res = extract(res, geometry[0], geometry[1], wrap=wrap)
	return res


# ---------------------------------------------------------------------------
# HEALPix distance transforms (reference enmap.py:2240-2287; ours go through
# the same blocked brute-force/JFA machinery as the 2d versions, but on the
# healpix RING pixel centers)
# ---------------------------------------------------------------------------
def distance_from_healpix(nside, points, omap=None, odomains=None,
		domains=False, rmax=None, method="bubble"):
	"""Distance from each healpix RING pixel to the nearest of
	points[{dec,ra},npoint] (reference enmap.distance_from_healpix)."""
	from . import healpix as hpx
	theta, phi = hpx.positions(nside)
	dec = np.pi/2 - theta; ra = phi
	points = np.asarray(points)
	v = utils.ang2rect(np.stack([ra, dec]), axis=0)          # [3, npix]
	vp = utils.ang2rect(np.stack([points[1], points[0]]), axis=0)  # [3, np]
	# blocked min-distance (dot products)
	npixtot = v.shape[1]
	best = np.full(npixtot, np.pi)
	dom = np.zeros(npixtot, np.int32)
	B = 1 << 20
	for i0 in range(0, npixtot, B):
		i1 = min(i0 + B, npixtot)
		dots = v[:, i0:i1].T @ vp                            # [b, np]
		j = np.argmax(dots, -1)
		best[i0:i1] = np.arccos(np.clip(dots[np.arange(i1-i0), j], -1, 1))
		dom[i0:i1] = j
	if rmax is not None:
		out = rmax <= best
		best = np.minimum(best, rmax)
	if domains or odomains is not None:
		return best, dom
	return best

def distance_transform_healpix(mask, omap=None, rmax=None, method="heap"):
	"""Distance to the nearest masked (False) pixel in a boolean healpix map
	(reference enmap.distance_transform_healpix)."""
	mask = np.asarray(mask).astype(bool)
	npixtot = mask.size
	nside = int(np.sqrt(npixtot/12))
	bad = np.nonzero(~mask)[0]
	if len(bad) == 0:
		return np.full(npixtot, rmax if rmax is not None else np.pi)
	from . import healpix as hpx
	theta, phi = hpx.positions(nside)
	dec = np.pi/2 - theta[bad]; ra = phi[bad]
	return distance_from_healpix(nside, np.stack([dec, ra]), rmax=rmax)

def labeled_distance_transform_healpix(labels, omap=None, odomains=None,
		rmax=None, method="heap"):
	"""Distance to and identity of the nearest labeled healpix pixel
	(reference enmap.labeled_distance_transform_healpix)."""
	labels = np.asarray(labels)
	npixtot = labels.size
	nside = int(np.sqrt(npixtot/12))
	src = np.nonzero(labels != 0)[0]
	from . import healpix as hpx
	theta, phi = hpx.positions(nside)
	dec = np.pi/2 - theta[src]; ra = phi[src]
	dists, dom = distance_from_healpix(nside, np.stack([dec, ra]),
		domains=True, rmax=rmax)
	return dists, labels[src][dom]
