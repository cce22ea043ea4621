"""General math / array / angle utilities.

TPU-native re-implementation of the horizontal stdlib the rest of the package
builds on (reference: pixell/utils.py). Functions that participate in jitted
compute paths are written against ``jax.numpy``; host-side glue (slice
parsing, box algebra) is plain numpy/python.
"""
from __future__ import annotations
import os, re
import numpy as np

# ---------------------------------------------------------------------------
# Constants (reference: pixell/utils.py:20-40)
# ---------------------------------------------------------------------------
degree  = np.pi/180
arcmin  = degree/60
arcsec  = arcmin/60
fwhm    = 1.0/(8*np.log(2))**0.5
T_cmb   = 2.7255
c       = 299792458.0
h       = 6.62607004e-34
k       = 1.38064853e-23
e       = 1.60217662e-19
G       = 6.67430e-11
sb      = 5.670374419e-8
day2sec = 86400.
yr2days = 365.2422
minute  = 60.
hour    = 3600.
day     = 24*hour
yr      = yr2days*day
ly      = c*yr
AU      = 149597870700.0
pc      = AU/arcsec
Jy      = 1e-26
hbar    = h/(2*np.pi)
sigma_T  = 6.6524587158e-29
sigma_sb = sb
m_e     = 9.1093837015e-31
m_p     = 1.6726219237e-27
m_n     = 1.6749274980e-27
# Solar-system radii/masses/orbit radii (reference utils.py:36-55)
R_sun     = 695700e3  ; M_sun     = 1.9885e30   ; r_sun     =  29e3*ly; L_sun = 3.827e26
R_mercury = 2439.5e3  ; M_mercury = 0.330e24    ; r_mercury =  57.9e9
R_venus   = 6052e3    ; M_venus   = 4.87e24     ; r_venus   = 108.2e9
R_earth   = 6378.1e3  ; M_earth   = 5.9722e24   ; r_earth   = 149.6e9
R_moon    = 1737.5e3  ; M_moon    = 0.073e24    ; r_moon    =   0.384e9
R_mars    = 3396e3    ; M_mars    = 0.642e24    ; r_mars    = 227.9e9
R_jupiter = 71492e3   ; M_jupiter = 1898e24     ; r_jupiter = 778.6e9
R_saturn  = 60268e3   ; M_saturn  = 568e24      ; r_saturn  = 1433.5e9
R_uranus  = 25559e3   ; M_uranus  = 86.8e24     ; r_uranus  = 2872.5e9
R_neptune = 24764e3   ; M_neptune = 102e24      ; r_neptune = 4495.1e9
R_pluto   = 1185e3    ; M_pluto   = 0.0146e24   ; r_pluto   = 5906.4e9
r_l1 = R_earth - 1.4916e9
r_L2 = R_earth + 1.5016e9
# array-coercing unit variants (reference utils.py:57-60)
a    = np.array(1.0)
adeg = np.array(degree)
amin = np.array(arcmin)
asec = np.array(arcsec)


def _xp(*args):
	"""Return jnp if any argument is a jax array / tracer, else np."""
	for a in args:
		if type(a).__module__.startswith("jax") or hasattr(a, "aval"):
			import jax.numpy as jnp
			return jnp
	return np


_JIT_CACHE = {}
def cached_jit(key, make_fn, **jit_kw):
	"""jit a locally-built closure ONCE per key and reuse the wrapper.
	jax.jit caches on function identity, so `jax.jit(lambda ...)` inside a
	function retraces AND recompiles on every call -- ruinous on
	remote-compile runtimes (~25 s per recompile of a big SHT program).
	make_fn is only called on a cache miss; key must capture everything the
	closure closes over (shapes, geometry, static parameters).
	The SHT accuracy tier (sht.DS_ACCURACY) and the MXU block-split flag
	(sht_pallas.BLK_ENABLE) are read at trace time by every SHT scan, so
	they are folded into the key automatically -- individual call sites
	cannot forget them (an accuracy="high" or blocked() call after a
	default call with identical shapes must NOT reuse the prior program)."""
	import jax
	from . import sht
	from .ops import sht_pallas
	key = (key if isinstance(key, tuple) else (key,)) \
		+ (bool(sht.DS_ACCURACY), bool(sht_pallas.BLK_ENABLE))
	f = _JIT_CACHE.get(key)
	if f is None:
		f = _JIT_CACHE[key] = jax.jit(make_fn(), **jit_kw)
	return f


def to_device(x, dtype=None):
	"""jnp.asarray that also works for *host* complex arrays on backends
	whose runtime lacks complex host->device transfer (seen on some TPU
	plugins): the real and imaginary parts are transferred separately and
	recombined on device. Jax arrays and tracers pass straight through."""
	import jax, jax.numpy as jnp
	if isinstance(x, (np.ndarray, np.generic)) and np.iscomplexobj(x) \
			and jax.default_backend() != "cpu":
		re = jnp.asarray(np.ascontiguousarray(x.real))
		im = jnp.asarray(np.ascontiguousarray(x.imag))
		out = jax.lax.complex(re, im)
	else:
		out = jnp.asarray(x)
	if dtype is not None: out = out.astype(dtype)
	return out


_FENCE = [None]
def fence():
	"""Block until every device execution enqueued so far has finished.

	jax.block_until_ready does not synchronize execution on some remote
	runtimes (axon): dispatch returns immediately and buffers stay live
	until their producing executions drain, so a long eager chain of
	full-size intermediates can pile multi-GB of transients in HBM. On a
	single device execution is FIFO, so fetching the value of a fresh tiny
	scalar enqueued NOW fences everything before it (validated on the axon
	tunnel: a 1.8 s matmul chain dispatches in ~0 s and this waits it out).
	The probe value changes per call so the execution cache cannot replay."""
	import jax.numpy as jnp
	if _FENCE[0] is None: _FENCE[0] = jnp.zeros((), np.float32)
	_FENCE[0] = _FENCE[0] + np.float32(1)
	float(_FENCE[0])


def czeros(shape, dtype):
	"""jnp.zeros that also works EAGERLY for complex dtypes on backends whose
	runtime lacks complex host->device transfer (see to_device): lax.full
	transfers the complex fill-value scalar from the host, which such
	runtimes reject (UNIMPLEMENTED); building via lax.complex stays purely
	on-device. Real dtypes pass straight through."""
	import jax, jax.numpy as jnp
	dtype = np.dtype(dtype)
	if np.issubdtype(dtype, np.complexfloating) and jax.default_backend() != "cpu":
		r = jnp.zeros(shape, np.float32 if dtype == np.complex64 else np.float64)
		return jax.lax.complex(r, r)
	return jnp.zeros(shape, dtype)


def from_device(x):
	"""np.asarray that also works for complex *device* arrays on backends
	whose runtime lacks complex device->host transfer (see to_device): the
	real and imaginary parts come back separately."""
	import jax, jax.numpy as jnp
	if isinstance(x, jax.Array) and jnp.iscomplexobj(x) \
			and jax.default_backend() != "cpu":
		re = np.asarray(x.real); im = np.asarray(x.imag)
		out = np.empty(re.shape, np.complex64 if re.dtype == np.float32 else np.complex128)
		out.real = re; out.imag = im
		return out
	return np.asarray(x)


# ---------------------------------------------------------------------------
# Small scalar/array helpers
# ---------------------------------------------------------------------------
def nint(a):
	"""Round to nearest integer, returning int dtype (reference utils.nint)."""
	return np.round(a).astype(int)

def ceil(a):  return int(np.ceil(a))
def floor(a): return int(np.floor(a))

def first_importable(*args):
	for name in args:
		try:
			__import__(name)
			return name
		except ImportError:
			continue
	return None

def moveaxis(a, o, n): return np.moveaxis(a, o, n)

def cumsum(a, endpoint=False):
	"""Exclusive cumsum [0, a0, a0+a1, ...]; include total if endpoint."""
	res = np.concatenate([[0], np.cumsum(a)])
	return res if endpoint else res[:-1]

def between_angles(a, range, period=2*np.pi):
	a = rewind(a, ref=np.mean(range), period=period)
	return (a >= range[0]) & (a < range[1])


# ---------------------------------------------------------------------------
# Angle wrapping (reference utils.unwind:297, rewind:333)
# ---------------------------------------------------------------------------
def rewind(a, ref=0, period=2*np.pi):
	"""Map angles into (ref-period/2, ref+period/2]."""
	xp = _xp(a, ref)
	a  = xp.asarray(a)
	if isinstance(ref, str) and ref == "auto":
		ref = xp.sort(a.reshape(-1))[a.size//2]
	return ref + (a - ref + period/2) % period - period/2

def unwind(a, period=2*np.pi, axes=[-1], ref=None, refmode="left", mask_nan=False):
	"""Remove period jumps along axes so the result is continuous."""
	xp = _xp(a)
	a  = xp.asarray(a).astype(float)
	for ax in axes:
		a = xp.moveaxis(a, ax, -1)
		diffs = (xp.diff(a, axis=-1) + period/2) % period - period/2
		first = a[..., :1]
		if refmode == "middle":
			first = rewind(first, 0, period)
		a = xp.concatenate([first, first + xp.cumsum(diffs, axis=-1)], -1)
		a = xp.moveaxis(a, -1, ax)
	if ref is not None:
		# shift by a whole number of periods to bring the first element near ref
		a = a - period*xp.round((a.reshape(-1)[0] - ref)/period)
	return a


# ---------------------------------------------------------------------------
# Coordinate geometry (reference utils.ang2rect:1944, rect2ang, angdist)
# ---------------------------------------------------------------------------
def ang2rect(angs, zenith=False, axis=0):
	"""Convert [{phi,theta},...] angles to [{x,y,z},...] unit vectors.
	With zenith=False (default), theta is the latitude (dec); with
	zenith=True it is the colatitude."""
	xp   = _xp(angs)
	angs = xp.asarray(angs)
	phi, theta = xp.moveaxis(angs, axis, 0)
	if zenith:
		st, ct = xp.sin(theta), xp.cos(theta)
		return xp.moveaxis(xp.stack([st*xp.cos(phi), st*xp.sin(phi), ct]), 0, axis)
	else:
		st, ct = xp.sin(theta), xp.cos(theta)
		return xp.moveaxis(xp.stack([ct*xp.cos(phi), ct*xp.sin(phi), st]), 0, axis)

def rect2ang(rect, zenith=False, axis=0):
	xp   = _xp(rect)
	rect = xp.asarray(rect)
	x, y, z = xp.moveaxis(rect, axis, 0)
	phi = xp.arctan2(y, x)
	r   = xp.sqrt(x*x + y*y)
	theta = xp.arctan2(r, z) if zenith else xp.arctan2(z, r)
	return xp.moveaxis(xp.stack([phi, theta]), 0, axis)

def angdist(a, b, zenith=False, axis=0):
	"""Angular distance between angle-pairs a,b [{ra,dec},...] (radians),
	numerically robust at small separations (Vincenty formula)."""
	xp = _xp(a, b)
	a  = xp.asarray(a); b = xp.asarray(b)
	ra1, dec1 = xp.moveaxis(a, axis, 0)
	ra2, dec2 = xp.moveaxis(b, axis, 0)
	if zenith:
		dec1 = np.pi/2 - dec1; dec2 = np.pi/2 - dec2
	dra = ra2 - ra1
	y = xp.hypot(xp.cos(dec2)*xp.sin(dra),
		xp.cos(dec1)*xp.sin(dec2) - xp.sin(dec1)*xp.cos(dec2)*xp.cos(dra))
	x = xp.sin(dec1)*xp.sin(dec2) + xp.cos(dec1)*xp.cos(dec2)*xp.cos(dra)
	return xp.arctan2(y, x)

def rotmatrix(ang, raxis, xp=np):
	"""Rotation matrix for rotation by angle ang around axis 'x','y' or 'z'
	(reference utils.rotmatrix:2006). Supports array ang with result
	shape ang.shape+(3,3)."""
	ang = xp.asarray(ang)
	c_, s_ = xp.cos(ang), xp.sin(ang)
	one, zero = xp.ones_like(c_), xp.zeros_like(c_)
	raxis = raxis.lower()
	if   raxis == "x": rows = [[one,zero,zero],[zero,c_,-s_],[zero,s_,c_]]
	elif raxis == "y": rows = [[c_,zero,s_],[zero,one,zero],[-s_,zero,c_]]
	elif raxis == "z": rows = [[c_,-s_,zero],[s_,c_,zero],[zero,zero,one]]
	else: raise ValueError("Rotation axis %s not recognized" % raxis)
	return xp.stack([xp.stack(r, -1) for r in rows], -2)


# ---------------------------------------------------------------------------
# Block reduce / expand (reference utils.block_reduce:2411, block_expand:2435)
# ---------------------------------------------------------------------------
def block_reduce(a, bsize, axis=-1, off=0, op=None, inclusive=True):
	"""Reduce axis of a by factor bsize using op (default mean)."""
	xp = _xp(a)
	if op is None: op = xp.mean
	a  = xp.moveaxis(xp.asarray(a), axis, -1)
	n  = a.shape[-1]
	nb = (n - off + bsize - 1)//bsize if inclusive else (n - off)//bsize
	nfull = (n - off)//bsize
	main  = a[..., off:off+nfull*bsize].reshape(a.shape[:-1] + (nfull, bsize))
	res   = op(main, axis=-1)
	if inclusive and nb > nfull:
		rest = op(a[..., off+nfull*bsize:], axis=-1)[..., None]
		res  = xp.concatenate([res, rest], -1)
	return xp.moveaxis(res, -1, axis)

def block_expand(a, bsize, osize=None, axis=-1, off=0, op="nearest"):
	"""Inverse of block_reduce: expand axis by factor bsize."""
	xp = _xp(a)
	a  = xp.moveaxis(xp.asarray(a), axis, -1)
	if osize is None: osize = a.shape[-1]*bsize + off
	res = xp.repeat(a, bsize, axis=-1)
	res = res[..., :osize-off]
	if off:
		res = xp.concatenate([xp.repeat(a[..., :1], off, -1), res], -1)
	if op == "mean": pass
	return xp.moveaxis(res, -1, axis)


# ---------------------------------------------------------------------------
# Binning (reference utils.linbin:2711, bin_data:2766)
# ---------------------------------------------------------------------------
def linbin(n, nbin=None, nmin=None, bsize=None):
	"""Linear bin edges [nbin,{from,to}] for data of length n."""
	if bsize is None:
		if nbin is None: nbin = int(np.round(n**0.5))
		bsize = n/nbin
	if nmin is not None: bsize = max(bsize, nmin)
	nbin  = int(np.ceil(n/bsize))
	edges = np.arange(nbin+1)*bsize
	return np.stack([edges[:-1], edges[1:]], -1).astype(int)

def expbin(n, nbin=None, nmin=8, nmax=0):
	"""Exponentially growing bin edges."""
	if nbin is None: nbin = int(np.round(n**0.5))
	edges = np.exp(np.linspace(0, np.log(n), nbin+1))
	edges = np.unique(np.maximum(nint(edges)-1, 0))
	res = np.stack([edges[:-1], edges[1:]], -1)
	if nmin:
		keep = []
		last = 0
		for i in range(len(res)):
			if res[i,1]-last >= nmin or i == len(res)-1:
				keep.append((last, res[i,1])); last = res[i,1]
		res = np.array(keep)
	if nmax:
		res = res[res[:,1]-res[:,0] <= nmax]
	return res

def bin_data(bins, d, op=np.mean):
	"""Bin the last dimension of d according to bins[nbin,{from,to}]."""
	d  = np.asarray(d)
	res = np.empty(d.shape[:-1] + (len(bins),), d.dtype)
	for bi, b in enumerate(bins):
		res[..., bi] = op(d[..., b[0]:b[1]], -1)
	return res


# ---------------------------------------------------------------------------
# Interpolation helper (reference utils.interpol:630 — simplified nd version)
# ---------------------------------------------------------------------------
def interpol(a, inds, order=3, mode="nearest", cval=0.0, prefilter=True):
	"""Interpolate a at fractional index positions inds[ndim,...]."""
	from . import interpol as _ip
	return _ip.map_coordinates(a, inds, order=order, border=mode, cval=cval,
		prefilter=prefilter)

def interp(x, xp_, fp):
	xp = _xp(x, fp)
	return xp.interp(x, xp_, fp)


# ---------------------------------------------------------------------------
# Beam helpers (reference utils.regularize_beam:1130-1186)
# ---------------------------------------------------------------------------
def gauss_beam(l, fwhm_rad):
	"""Harmonic-space gaussian beam b(l) for given fwhm in radians."""
	xp = _xp(l)
	sigma = fwhm_rad*fwhm
	return xp.exp(-0.5*l*(l+1)*sigma**2)

def compress_beam(sigma, phi):
	c = np.cos(2*phi); s = np.sin(2*phi)
	sx, sy = sigma
	return np.array([sx**2*c**2+sy**2*s**2, sx**2*s**2+sy**2*c**2, (sx**2-sy**2)*c*s])

def expand_beam(irads, return_V=False):
	C = np.array([[irads[0],irads[2]],[irads[2],irads[1]]])
	E, V = np.linalg.eigh(C)
	phi = np.arctan2(V[1,1], V[0,1])
	sigma = E[::-1]**0.5
	if return_V: return sigma, phi, V
	return sigma, phi

def regularize_beam(bl, cutoff=0.01, nl=None, normalize=False):
	"""Replace beam transfer function tail below cutoff with gaussian-like
	extrapolation so that dividing by it is safe (reference utils:1160)."""
	bl = np.asarray(bl, float)
	if normalize: bl = bl/bl[0]
	if nl is None: nl = len(bl)
	res = np.empty(nl)
	n   = min(len(bl), nl)
	res[:n] = bl[:n]
	if nl > len(bl): res[len(bl):] = bl[-1]
	below = np.where(res < cutoff)[0]
	if len(below) > 0:
		i0 = below[0]
		if i0 > 1:
			# continue with constant logarithmic slope
			slope = np.log(res[i0-1]/res[i0-2])
			l = np.arange(nl-i0)+1
			res[i0:] = res[i0-1]*np.exp(slope*l)
		else:
			res[:] = np.maximum(res, cutoff)
	return res


# ---------------------------------------------------------------------------
# Linear algebra (reference utils.eigpow:2789)
# ---------------------------------------------------------------------------
def eigpow(A, e, axes=[-2,-1], rlim=None, alim=None):
	"""Raise matrix A (or stack of matrices over given axes) to power e via
	eigen-decomposition. Reference semantics (reference utils.eigpow:2789):
	negative eigenvalues are set to zero when e is not integer-valued (a
	fractional power would be complex), and eigenvalues tiny in relative
	(rlim) or absolute (alim) terms are set to zero when e < 0 (so noise
	modes don't blow up). Integer nonneg e keeps negative eigenvalues."""
	xp = _xp(A)
	A  = xp.asarray(A)
	ax1, ax2 = axes[0] % A.ndim, axes[1] % A.ndim
	A  = xp.moveaxis(A, (ax1, ax2), (-2, -1))
	E, V = xp.linalg.eigh(A)
	fdt = E.dtype if E.dtype.kind == 'f' else np.dtype(np.float64)
	if rlim is None: rlim = xp.finfo(fdt).resolution*100
	if alim is None: alim = xp.finfo(fdt).tiny*1e4
	is_int = float(e) == int(e)
	mask = xp.zeros(E.shape, bool)
	if not is_int: mask = mask | (E < 0)
	if e < 0:
		aE = xp.abs(E)
		mask = mask | (aE < xp.max(aE, -1, keepdims=True)*rlim) | (aE < alim)
	# pow with a possibly-negative base: handle the sign explicitly, since
	# float pow of a negative base is nan in jax even for integer-valued e
	sgn = xp.where(E < 0, (-1.0)**int(e) if is_int else 1.0, 1.0)
	Ez  = xp.where(mask, 1.0, xp.abs(E))
	Ep  = xp.where(mask, 0.0, sgn*Ez**e)
	res = xp.einsum("...ij,...j,...kj->...ik", V, Ep, V)
	return xp.moveaxis(res, (-2, -1), (ax1, ax2))

def solve(A, b, axes=[0,1], masked=False):
	"""Solve A x = b with A possibly singular (pseudo-inverse via eigpow)."""
	xp = _xp(A, b)
	iA = eigpow(A, -1, axes=axes)
	ax1, ax2 = axes
	return xp.einsum("...ij,...j->...i",
		xp.moveaxis(iA, (ax1%iA.ndim, ax2%iA.ndim), (-2, -1)),
		xp.moveaxis(b, ax1 % b.ndim, -1))


# ---------------------------------------------------------------------------
# Physics (reference utils.planck:2537, dplanck, graybody)
# ---------------------------------------------------------------------------
def planck(f, T=T_cmb):
	"""Planck spectral radiance B(f,T) [W/sr/m^2/Hz]."""
	xp = _xp(f, T)
	return 2*h*f**3/c**2/(xp.exp(h*f/(k*T))-1)

def dplanck(f, T=T_cmb):
	"""Derivative of the planck spectrum dB/dT."""
	xp = _xp(f, T)
	x = h*f/(k*T)
	return 2*h**2*f**4/(c**2*k*T**2)*xp.exp(x)/(xp.exp(x)-1)**2

def graybody(f, T=10.0, beta=1.0):
	return f**beta*planck(f, T)

def blackbody(f, T=T_cmb):
	return planck(f, T)

def tsz_spectrum(f, T=T_cmb):
	"""Thermal SZ frequency dependence in spectral radiance units."""
	xp = _xp(f)
	x  = h*f/(k*T)
	return dplanck(f, T)*T*(x*(xp.exp(x)+1)/(xp.exp(x)-1) - 4)

def flux_factor(beam_area, freq, T0=T_cmb):
	"""Conversion uK -> mJy for a given beam solid angle and frequency."""
	return dplanck(freq, T0)*1e-6*beam_area*1e26*1e3


# ---------------------------------------------------------------------------
# Slice parsing (reference utils.split_slice:3107, expand_slice, sliced shapes)
# ---------------------------------------------------------------------------
def parse_slice(desc):
	"""Parse a string like '[0,:10,::2]' into a tuple of slices."""
	if desc is None: return None
	class Foo:
		def __getitem__(self, s): return s
	s = eval("Foo()" + desc, {"Foo": Foo})
	if not isinstance(s, tuple): s = (s,)
	return s

def split_slice(sel, ndims):
	"""Split a selection tuple into groups covering ndims[0], ndims[1], ...
	dimensions each, handling Ellipsis."""
	if not isinstance(sel, tuple): sel = (sel,)
	# expand ellipsis
	ntot = sum(ndims)
	if Ellipsis in sel:
		i = sel.index(Ellipsis)
		ncur = len([s for s in sel if s is not Ellipsis and s is not None])
		sel = sel[:i] + (slice(None),)*(ntot-ncur) + sel[i+1:]
	res, i = [], 0
	for nd in ndims:
		group = []
		while i < len(sel) and len([g for g in group if g is not None]) < nd:
			group.append(sel[i]); i += 1
		res.append(tuple(group))
	if i < len(sel): res[-1] = res[-1] + sel[i:]
	return res

def expand_slice(sel, n, nowrap=False):
	"""Expand a slice into one with explicit start/stop/step for length n."""
	start, stop, step = sel.indices(n)
	return slice(start, stop, step)

def sbox_size(sbox):
	"""Number of pixels covered by each dim of a slice-box [ndim,{start,stop,step}]."""
	sbox = np.asarray(sbox)
	return (np.abs(sbox[:,1]-sbox[:,0])+np.abs(sbox[:,2])-1)//np.abs(sbox[:,2])


# ---------------------------------------------------------------------------
# sbox algebra for extract/insert with sky wrapping
# (reference utils.sbox_wrap:1842 — reimplemented)
# ---------------------------------------------------------------------------
def sbox_wrap(sbox, wrap=0, cap=0):
	"""Split a possibly out-of-bounds slice-box sbox[ndim,{start,stop,step}]
	into a list of (inner-sbox, outer-sbox) pairs such that reading each
	inner sbox from a wrapped/capped array and writing to the corresponding
	outer sbox of the output reproduces wrapped reads.

	wrap: per-dim wrap length (0 = no wrap: clip instead).
	cap:  per-dim max length (0 = no cap)."""
	sbox = np.asarray(sbox, int)
	ndim = len(sbox)
	wrap = np.zeros(ndim, int) + wrap
	cap  = np.zeros(ndim, int) + cap
	# Per-dimension list of (isel, osel) 1d segment pairs
	dim_segments = []
	for d in range(ndim):
		start, stop, step = sbox[d]
		n = (abs(stop-start)+abs(step)-1)//abs(step)
		segs = []
		w = wrap[d]
		c = cap[d] if cap[d] else (w if w else None)
		if w == 0:
			# no wrapping: clip to [0,c)
			idx = start + step*np.arange(n)
			if c is not None:
				good = (idx >= 0) & (idx < c)
			else:
				good = np.ones(n, bool)
			# contiguous runs of good
			segs = _runs_to_segs(idx, good, step)
		else:
			idx  = start + step*np.arange(n)
			widx = idx % w
			good = np.ones(n, bool)
			if c is not None and c < w:
				good = widx < c
			# split where wrapped index jumps
			segs = _runs_to_segs(widx, good, step)
		dim_segments.append(segs)
	# cartesian product over dims
	res = []
	def rec(d, ibox, obox):
		if d == ndim:
			res.append((list(map(tuple, ibox)), list(map(tuple, obox))))
			return
		for iseg, oseg in dim_segments[d]:
			rec(d+1, ibox+[iseg], obox+[oseg])
	rec(0, [], [])
	return res

def _runs_to_segs(idx, good, step):
	"""Convert an explicit index list into maximal contiguous (isel,osel) runs."""
	n = len(idx)
	segs = []
	i = 0
	while i < n:
		if not good[i]:
			i += 1; continue
		j = i
		while j+1 < n and good[j+1] and idx[j+1]-idx[j] == step:
			j += 1
		i0, i1 = int(idx[i]), int(idx[j])
		isel = (i0, i1 + (1 if step > 0 else -1), step)
		# normalize negative stop
		if step < 0 and isel[1] < 0: isel = (i0, None, step)
		osel = (i, j+1, 1)
		segs.append((isel, osel))
		i = j+1
	return segs


# ---------------------------------------------------------------------------
# Iteration helper (reference utils.nditer:3707)
# ---------------------------------------------------------------------------
def nditer(shape):
	"""Iterate over all index tuples of the given shape (like np.ndindex)."""
	if len(shape) == 0:
		yield ()
		return
	for I in np.ndindex(*shape):
		yield I

def real_dtype(dtype):
	"""The real dtype corresponding to a possibly complex dtype."""
	return np.zeros(1, dtype).real.dtype

def complex_dtype(dtype):
	"""The complex dtype corresponding to a possibly real dtype."""
	return np.result_type(dtype, np.complex64)

def fix_dtype(dtype):
	return np.dtype(dtype)


# ---------------------------------------------------------------------------
# Conjugate gradients (reference utils.CG:3586) — lax.while_loop version in
# ops/solvers.py; this host version supports arbitrary pytrees/callbacks.
# ---------------------------------------------------------------------------
class CG:
	"""Preconditioned conjugate gradient solver for A x = b, where A is a
	callable. Works on numpy or jax arrays. Mirrors reference utils.CG:3586."""
	def __init__(self, A, b, x0=None, M=lambda x: x, dot=None):
		self.A = A; self.M = M
		self.b = b
		if dot is None:
			dot = lambda a, b: float(np.sum(np.conj(np.asarray(a))*np.asarray(b)).real)
		self.dot = dot
		self.x  = np.zeros_like(np.asarray(b)) if x0 is None else x0
		self.r  = b - self.A(self.x) if x0 is not None else np.asarray(b).copy()
		self.z  = self.M(self.r)
		self.rz = self.dot(self.r, self.z)
		self.rz0 = float(self.rz)
		self.p  = self.z
		self.i  = 0
		self.err = np.inf
	def step(self):
		Ap = self.A(self.p)
		alpha = self.rz/self.dot(self.p, Ap)
		self.x = self.x + alpha*self.p
		self.r = self.r - alpha*Ap
		self.z = self.M(self.r)
		next_rz = self.dot(self.r, self.z)
		beta = next_rz/self.rz
		self.rz = next_rz
		self.p = self.z + beta*self.p
		self.i += 1
		self.err = self.rz/self.rz0
		return self.x
	def save(self, fname):
		import h5py
		with h5py.File(fname, "w") as f:
			f["x"] = np.asarray(self.x); f["r"] = np.asarray(self.r)
			f["p"] = np.asarray(self.p); f["rz"] = self.rz
			f["rz0"] = self.rz0; f["i"] = self.i
	def load(self, fname):
		import h5py
		with h5py.File(fname, "r") as f:
			self.x = f["x"][()]; self.r = f["r"][()]; self.p = f["p"][()]
			self.rz = float(f["rz"][()]); self.rz0 = float(f["rz0"][()])
			self.i = int(f["i"][()])
			self.z = self.M(self.r)


class Minres:
	"""Minimum-residual solver for symmetric (possibly indefinite) A."""
	def __init__(self, A, b, x0=None, dot=None):
		self.A = A
		if dot is None:
			dot = lambda a, b: float(np.sum(np.conj(np.asarray(a))*np.asarray(b)).real)
		self.dot = dot
		self.b = np.asarray(b)
		self.x = np.zeros_like(self.b) if x0 is None else np.asarray(x0).copy()
		self.r = self.b - A(self.x) if x0 is not None else self.b.copy()
		self.p0 = self.r.copy()
		self.s0 = A(self.p0)
		self.p1 = None; self.s1 = None
		self.i = 0
		self.bnorm = self.dot(self.b, self.b)**0.5
		self.err = 1.0
	def step(self):
		ss = self.dot(self.s0, self.s0)
		alpha = self.dot(self.r, self.s0)/ss
		self.x = self.x + alpha*self.p0
		self.r = self.r - alpha*self.s0
		p2, s2 = self.p1, self.s1
		self.p1, self.s1 = self.p0, self.s0
		p0 = self.s1.copy()
		s0 = self.A(p0)
		beta1 = self.dot(s0, self.s1)/ss
		p0 = p0 - beta1*self.p1
		s0 = s0 - beta1*self.s1
		if p2 is not None:
			ss2 = self.dot(s2, s2)
			beta2 = self.dot(self.A(self.s1), s2)/ss2
			p0 = p0 - beta2*p2
			s0 = s0 - beta2*s2
		self.p0, self.s0 = p0, s0
		self.i += 1
		self.err = self.dot(self.r, self.r)**0.5/max(self.bnorm, 1e-300)
		return self.x


# ---------------------------------------------------------------------------
# Printing / verbosity (reference utils.Printer:2948)
# ---------------------------------------------------------------------------
class Printer:
	def __init__(self, level=1, prefix=""):
		self.level = level; self.prefix = prefix
	def write(self, desc, level=1, exact=False, newline=True):
		if level == self.level or (not exact and level <= self.level):
			import sys
			sys.stderr.write("%s%s%s" % (self.prefix, desc, "\n" if newline else ""))
	def push(self, desc):
		return Printer(self.level, self.prefix + desc)
	def time(self, desc, level=1, exact=False):
		return _PrintTimer(self, desc, level, exact)

class _PrintTimer:
	def __init__(self, printer, desc, level, exact):
		self.printer, self.desc, self.level, self.exact = printer, desc, level, exact
	def __enter__(self):
		import time
		self.t1 = time.time()
		return self
	def __exit__(self, *args):
		import time
		self.printer.write("%6.2f %s" % (time.time()-self.t1, self.desc),
			self.level, self.exact)

def allreduce(a, comm=None, op=None):
	"""Single-process fallback allreduce (see parallel.dist for multi-host)."""
	if comm is None or getattr(comm, "size", 1) == 1: return a
	return comm.allreduce(a, op=op)

def allgather(a, comm=None):
	if comm is None or getattr(comm, "size", 1) == 1:
		return np.asarray(a)[None]
	return comm.allgather(a)

def allgatherv(a, comm=None, axis=0):
	if comm is None or getattr(comm, "size", 1) == 1:
		return np.asarray(a)
	return comm.allgatherv(a, axis=axis)


# ---------------------------------------------------------------------------
# Radial Fourier / Hankel transforms (reference utils.RadialFourierTransform:3206,
# FFTLog:3305). Both are log-spaced fast Hankel transforms.
# ---------------------------------------------------------------------------
class RadialFourierTransform:
	"""Fast radial Fourier (Hankel) transform between real-space profiles
	f(r) and harmonic profiles F(l), using the FFTLog algorithm on
	logarithmically spaced points. harm2real and real2harm are inverses of
	each other on the internal grids (reference utils.RadialFourierTransform)."""
	def __init__(self, lrange=None, rrange=None, n=512, pad=256):
		import scipy.fft
		if lrange is None and rrange is None: lrange = [0.1, 1e7]
		if lrange is None: lrange = [1/rrange[1], 1/rrange[0]]
		logl1, logl2 = np.log(lrange[0]), np.log(lrange[1])
		self.n = n
		self.pad = pad
		ntot = n + 2*pad
		self.dlog = (logl2 - logl1)/n
		i0 = pad
		self.l = np.exp(logl1 + (np.arange(ntot) - pad + 0.5)*self.dlog)
		self.r = 1/self.l[::-1]
		self._mu = 0
	def real2harm(self, rprof):
		"""f(r) -> F(l) = 2 pi int f(r) J0(lr) r dr, with f evaluated on
		self.r (callable or array). scipy's fht computes
		A(k) = int a(r) J_mu(kr) k dr, so a = f*r and F = 2 pi A/l."""
		import scipy.fft
		fr = rprof(self.r) if callable(rprof) else np.asarray(rprof)
		A = scipy.fft.fht(fr*self.r, self.dlog, mu=0)
		return 2*np.pi*A/self.l
	def harm2real(self, hprof):
		"""F(l) -> f(r) = 1/(2 pi) int F(l) J0(lr) l dl (inverse of real2harm)."""
		import scipy.fft
		Fl = hprof(self.l) if callable(hprof) else np.asarray(hprof)
		a = scipy.fft.ifht(Fl*self.l/(2*np.pi), self.dlog, mu=0)
		return a/self.r
	def unpad(self, *arrs):
		"""Strip the padding from arrays on the internal grids."""
		res = tuple(a[..., self.pad:self.pad+self.n] for a in arrs)
		return res[0] if len(res) == 1 else res
	def lind(self, l):
		"""Fractional index of multipole l on the internal log grid
		(reference utils.RadialFourierTransform.lind:3289)."""
		return (np.log(l) - np.log(self.l[0]))/self.dlog
	def rind(self, r):
		"""Fractional index of radius r on the internal log grid
		(reference utils.RadialFourierTransform.rind:3290)."""
		return (np.log(r) - np.log(self.r[0]))/self.dlog

def profile_to_tform_hankel(profile_fun, lmin=0.1, lmax=1e7, n=512, pad=256):
	"""Convenience: return (l, F(l)) for a radial profile function."""
	rft = RadialFourierTransform(lrange=[lmin, lmax], n=n, pad=pad)
	F = rft.real2harm(profile_fun)
	l, F = rft.unpad(rft.l, F)
	return l, F

class FFTLog:
	"""Fast Fourier Transform for log-spaced data, built from a pair of Fast
	Hankel Transforms at mu=±1/2 (reference utils.FFTLog:3305). Define the
	domain with xrange=[xmin,xmax] XOR krange=[kmin,kmax]; pad expands the
	domain by pad points on both sides (strip with unpad); bias sets the
	power-law boundary conditions."""
	def __init__(self, xrange=None, krange=None, n=512, pad=0, bias=0):
		if (xrange is None) == (krange is None):
			raise ValueError("Either xrange xor krange must be given")
		if xrange is None: xrange = krange[::-1]
		self.step = (np.log(xrange[1]) - np.log(xrange[0]))/(n - 1)
		self.pad  = pad
		self.n    = n
		self.x  = np.exp(np.linspace(np.log(xrange[0]) - self.step*pad,
			np.log(xrange[1]) + self.step*pad, n + 2*pad))
		self.k  = 1/self.x[::-1]
		self.xh = self.x**(0.5 - bias)
		self.kh = self.k**(0.5 + bias)
		# fold the normalization into kh; the inverse keeps a factor 2
		self.kh /= (np.pi/2)**0.5
		self.bias = bias
	def fft(self, a):
		"""Forward fft along the last axis of a, sampled at self.x. a may be
		a callable evaluated at self.x."""
		import scipy.fft
		try: a = a(self.x)
		except TypeError: pass
		xa  = a*self.xh
		cos = scipy.fft.fht(xa, self.step, -0.5, bias=self.bias)/self.kh
		sin = scipy.fft.fht(xa, self.step, +0.5, bias=self.bias)/self.kh
		return cos - 1j*sin
	def ifft(self, fa):
		"""Inverse fft along the last axis of fa, sampled at self.k."""
		import scipy.fft
		try: fa = fa(self.k)
		except TypeError: pass
		kfa = fa*(self.kh/2)
		a  = scipy.fft.ifht(kfa.real, self.step, -0.5, bias=self.bias)/self.xh
		a += scipy.fft.ifht(-kfa.imag, self.step, +0.5, bias=self.bias)/self.xh
		return a
	def unpad(self, *arrs):
		"""Strip the padding from arrays on this object's grids."""
		if self.pad == 0: res = arrs
		else: res = tuple(arr[..., self.pad:arr.shape[-1]-self.pad] for arr in arrs)
		return res[0] if len(arrs) == 1 else res


# ---------------------------------------------------------------------------
# Point matching (reference utils.crossmatch:3480)
# ---------------------------------------------------------------------------
def crossmatch(pos1, pos2, rmax, mode="closest", coords="auto"):
	"""Find pairs between catalogs pos1[n1,2], pos2[n2,2] ([dec,ra] radians)
	within angular distance rmax. Returns list of (i1, i2) index pairs.
	mode 'closest': each pos1 matches its closest pos2 (at most one)."""
	import scipy.spatial
	pos1 = np.asarray(pos1); pos2 = np.asarray(pos2)
	if pos1.ndim == 2 and pos1.shape[0] == 2 and pos1.shape[1] != 2: pos1 = pos1.T
	if pos2.ndim == 2 and pos2.shape[0] == 2 and pos2.shape[1] != 2: pos2 = pos2.T
	v1 = ang2rect(np.array([pos1[:, 1], pos1[:, 0]]), axis=0).T
	v2 = ang2rect(np.array([pos2[:, 1], pos2[:, 0]]), axis=0).T
	tree = scipy.spatial.cKDTree(v2)
	chord = 2*np.sin(rmax/2)
	pairs = []
	if mode == "closest":
		d, j = tree.query(v1, k=1)
		for i in range(len(v1)):
			if d[i] <= chord: pairs.append((i, int(j[i])))
	else:
		for i, js in enumerate(tree.query_ball_point(v1, chord)):
			for j in js: pairs.append((i, int(j)))
	return pairs


# ---------------------------------------------------------------------------
# sbox algebra (reference utils.sbox_intersect:1705, sbox_div, sbox_mul)
# ---------------------------------------------------------------------------
def sbox_intersect(a, b, wrap=0):
	"""Intersection of slice-boxes a[...,ndim,{start,stop,step}]."""
	a = np.asarray(a); b = np.asarray(b)
	res = []
	ndim = a.shape[-2]
	out = np.zeros((ndim, 3), int)
	empty = False
	for d in range(ndim):
		s1, e1 = sorted([a[d, 0], a[d, 1]])
		s2, e2 = sorted([b[d, 0], b[d, 1]])
		s, e = max(s1, s2), min(e1, e2)
		if s >= e: empty = True
		out[d] = [s, e, 1]
	return None if empty else out

def sbox_mul(a, b):
	"""Compose two slice-boxes: b indexes into the result of slicing with a."""
	a = np.asarray(a); b = np.asarray(b)
	out = np.zeros_like(a)
	for d in range(a.shape[-2]):
		out[d, 0] = a[d, 0] + b[d, 0]*a[d, 2]
		out[d, 1] = a[d, 0] + b[d, 1]*a[d, 2]
		out[d, 2] = a[d, 2]*b[d, 2]
	return out

def sbox_div(a, b):
	"""Inverse of sbox_mul: the sbox c with sbox_mul(b, c) = a."""
	a = np.asarray(a); b = np.asarray(b)
	out = np.zeros_like(a)
	for d in range(a.shape[-2]):
		out[d, 0] = (a[d, 0] - b[d, 0])//b[d, 2]
		out[d, 1] = (a[d, 1] - b[d, 0])//b[d, 2]
		out[d, 2] = a[d, 2]//b[d, 2]
	return out


# ---------------------------------------------------------------------------
# Interpolator classes (reference utils.interpolator:681)
# ---------------------------------------------------------------------------
class SplineInterpolator:
	"""Spline interpolator over gridded data (reference utils.SplineInterpolator:696)."""
	def __init__(self, data, box=None, order=3, border="cyclic"):
		self.data = np.asarray(data)
		self.box = np.asarray(box) if box is not None else None
		self.order = order
		self.border = border
	def __call__(self, coords):
		from . import interpol as _ip
		coords = np.asarray(coords)
		if self.box is not None:
			n = np.array(self.data.shape[-coords.shape[0]:])
			pix = (coords - self.box[0][:, None])/(self.box[1]-self.box[0])[:, None]*(n[:, None]-1)
		else:
			pix = coords
		return np.asarray(_ip.map_coordinates(self.data, pix, order=self.order,
			border=self.border))

class FourierInterpolator:
	"""Band-limited (NUFFT) interpolator (reference utils.FourierInterpolator:722)."""
	def __init__(self, data, box=None):
		self.data = np.asarray(data)
		self.box = np.asarray(box) if box is not None else None
	def __call__(self, coords):
		from . import fft as _fft
		coords = np.asarray(coords)
		if self.box is not None:
			n = np.array(self.data.shape[-coords.shape[0]:])
			pix = (coords - self.box[0][:, None])/(self.box[1]-self.box[0])[:, None]*n[:, None]
		else:
			pix = coords
		return np.asarray(_fft.interpol_nufft(self.data, pix))

def interpolator(data, box=None, mode="spline", order=3, border="cyclic"):
	if mode in ["spline", "conv", "lin", "linear", "cubic"]:
		o = {"lin": 1, "linear": 1, "cubic": 3}.get(mode, order)
		return SplineInterpolator(data, box=box, order=o, border=border)
	if mode in ["fourier", "fft", "nufft"]:
		return FourierInterpolator(data, box=box)
	raise ValueError(mode)

def dump(fname, obj):
	import pickle
	with open(fname, "wb") as f: pickle.dump(obj, f)

def loadtxt(fname): return np.loadtxt(fname)

def nint_div(a, b): return (a + b//2)//b

def ctime2mjd(ctime):
	"""Unix time -> modified julian date (reference utils.ctime2mjd)."""
	return np.asarray(ctime)/86400.0 + 40587.0

def mjd2ctime(mjd):
	return (np.asarray(mjd) - 40587.0)*86400.0

def medmean(a, frac=0.5):
	"""Mean of the central frac quantile -- robust mean (reference utils.medmean)."""
	a = np.sort(np.asarray(a).reshape(-1))
	n = len(a)
	lo = int(n*(1-frac)/2); hi = n - lo
	return a[lo:hi].mean()

def find_equal_groups(a, tol=0):
	"""Group indices of equal (within tol) values (reference utils.find_equal_groups)."""
	a = np.asarray(a)
	order = np.argsort(a, kind="stable")
	groups = []
	cur = [order[0]] if len(a) else []
	for i in order[1:]:
		if abs(a[i] - a[cur[-1]]) <= tol: cur.append(i)
		else:
			groups.append(cur); cur = [i]
	if cur: groups.append(cur)
	return groups


# ---------------------------------------------------------------------------
# tSZ cluster profile (reference utils.tsz_profile_*:2600-2699: the
# Battaglia et al 2012 generalized-NFW pressure profile and its line-of-
# sight projection)
# ---------------------------------------------------------------------------
def tsz_profile_raw(x, xc=0.497, alpha=1.0, beta=4.65, gamma=-0.3):
	"""Dimensionless gNFW pressure profile P(x), x = r/R200c
	(reference utils.tsz_profile_raw)."""
	xp = _xp(x)
	x = xp.asarray(x)
	return (x/xc)**gamma*(1 + (x/xc)**alpha)**(-beta)

def tsz_profile_los(x, xc=0.497, alpha=1.0, beta=4.65, gamma=-0.3,
		zmax=1e5, npoint=200, x1=1e-8, x2=1e4):
	"""Line-of-sight projection of the gNFW profile: y(theta) proportional to
	int P(sqrt(b^2+z^2)) dz, evaluated at projected radii x (log-spaced
	quadrature, vectorized)."""
	x = np.atleast_1d(np.asarray(x, float))
	# integrate in log z for dynamic range
	t = np.linspace(-8, np.log10(zmax), npoint)
	z = 10.0**t
	dz = z*np.log(10)*(t[1]-t[0])
	r = np.sqrt(x[:, None]**2 + z[None, :]**2)
	P = tsz_profile_raw(r, xc=xc, alpha=alpha, beta=beta, gamma=gamma)
	return 2*np.sum(P*dz[None, :], -1)

def tsz_profile_los_fast(x, **kwargs):
	"""Spline-cached version of tsz_profile_los."""
	xs = np.exp(np.linspace(np.log(1e-6), np.log(1e3), 400))
	ys = tsz_profile_los(xs, **kwargs)
	return np.exp(np.interp(np.log(np.maximum(np.asarray(x), 1e-6)),
		np.log(xs), np.log(np.maximum(ys, 1e-300))))


# ---------------------------------------------------------------------------
# Extended general helpers (reference pixell/utils.py; behavior-compatible
# re-implementations -- see individual reference docstrings for semantics)
# ---------------------------------------------------------------------------
class DataError(Exception): pass
class DataMissing(DataError): pass

def l2ang(l):
	"""Angular scale ~ corresponding to multipole l (reference utils.l2ang)."""
	return (4*np.pi)**0.5/(l + 1)

def ang2l(ang):
	"""Multipole ~ corresponding to angular scale (reference utils.ang2l)."""
	return (4*np.pi)**0.5/ang - 1

def D(f, eps=1e-10):
	"""Complex-step derivative operator: D(f)(x) = Im f(x+i eps)/eps
	(reference utils.D)."""
	def Df(x): return f(x + eps*1j).imag/eps
	return Df

def lines(file_or_fname):
	"""Iterate over lines of a filename or open file (reference utils.lines)."""
	if isinstance(file_or_fname, str):
		with open(file_or_fname, "r") as f:
			for line in f: yield line
	else:
		for line in file_or_fname: yield line

def touch(fname):
	with open(fname, "a"):
		os.utime(fname)

def listsplit(seq, elem):
	"""str.split analogue for lists (reference utils.listsplit)."""
	cuts = [i for i, v in enumerate(seq) if v == elem]
	bounds = [-1] + cuts + [len(seq)]
	return [list(seq[bounds[i]+1:bounds[i+1]]) for i in range(len(bounds)-1)]

def streq(x, s):
	"""Safe 'is x the string s' test (reference utils.streq)."""
	return isinstance(x, str) and x == s

def find_any(array, vals, sorted=False):
	"""Indices in array of the members of vals that are present
	(reference utils.find_any)."""
	array = np.asarray(array); vals = np.atleast_1d(vals)
	order = np.argsort(array) if not sorted else None
	a = array[order] if order is not None else array
	i = np.searchsorted(a, vals)
	i = np.clip(i, 0, len(a)-1)
	hit = a[i] == vals
	res = i[hit]
	return order[res] if order is not None else res

def find_first(mask, axis=-1, default=-1):
	"""Index of first nonzero along axis, or default (reference utils.find_first)."""
	mask = np.asarray(mask, bool)
	any_ = mask.any(axis)
	ind = np.argmax(mask, axis)
	return np.where(any_, ind, default)

def find_last(mask, axis=-1, default=-1):
	mask = np.asarray(mask, bool)
	n = mask.shape[axis]
	rev = np.flip(mask, axis)
	any_ = mask.any(axis)
	ind = n - 1 - np.argmax(rev, axis)
	return np.where(any_, ind, default)

def find_range(ranges, vals, sorted=False, default=-1):
	"""Which range [nrange,{from,to}] each val falls in (reference utils.find_range)."""
	ranges = np.asarray(ranges); vals = np.asarray(vals)
	order = np.argsort(ranges[:, 0]) if not sorted else np.arange(len(ranges))
	r = ranges[order]
	i = np.searchsorted(r[:, 0], vals, side="right") - 1
	ok = (i >= 0) & (vals < r[np.clip(i, 0, len(r)-1), 1])
	return np.where(ok, order[np.clip(i, 0, len(r)-1)], default)

def nearest_ind(arr, vals, sorted=False):
	"""Index in arr of value closest to each val (reference utils.nearest_ind)."""
	arr = np.asarray(arr); vals = np.asarray(vals)
	order = None if sorted else np.argsort(arr)
	a = arr[order] if order is not None else arr
	i = np.searchsorted(a, vals)
	i = np.clip(i, 1, len(a)-1)
	left = a[i-1]; right = a[i]
	i = i - (np.abs(vals - left) <= np.abs(vals - right))
	return order[i] if order is not None else i

def contains(array, vals):
	"""Boolean mask: which elements of array are in vals (reference utils.contains)."""
	return np.isin(np.asarray(array), np.asarray(vals))

def asfarray(arr, default_dtype=np.float64):
	arr = np.asarray(arr)
	if np.issubdtype(arr.dtype, np.floating) or np.issubdtype(arr.dtype, np.complexfloating):
		return arr
	return arr.astype(default_dtype)

def common_vals(arrs):
	"""Intersection of a list of arrays (reference utils.common_vals)."""
	res = np.asarray(arrs[0])
	for a in arrs[1:]: res = np.intersect1d(res, a)
	return res

def common_inds(arrs):
	"""Indices into each array of their common elements (reference utils.common_inds)."""
	vals = common_vals(arrs)
	return [find_any(a, vals, sorted=False) for a in arrs]

def union(arrs):
	res = np.asarray(arrs[0])
	for a in arrs[1:]: res = np.union1d(res, a)
	return res

def inverse_order(order):
	"""Inverse permutation (reference utils.inverse_order)."""
	order = np.asarray(order)
	inv = np.empty_like(order)
	inv[order] = np.arange(len(order))
	return inv

def complement_inds(inds, n):
	"""Values in range(n) missing from inds (reference utils.complement_inds)."""
	mask = np.ones(n, bool)
	if inds is not None and len(np.atleast_1d(inds)) > 0:
		mask[np.asarray(inds)] = False
	return np.nonzero(mask)[0]

def unmask(arr, mask, axis=0, fill=0):
	"""Undo arr=result[mask] (reference utils.unmask)."""
	arr = np.asarray(arr); mask = np.asarray(mask, bool)
	axis = axis % arr.ndim
	shape = arr.shape[:axis] + mask.shape + arr.shape[axis+1:]
	res = np.full(shape, fill, arr.dtype)
	sel = (slice(None),)*axis + (mask,)
	res[sel] = arr
	return res

def dict_apply_listfun(dict_, function):
	"""Apply a list-to-list function across dict values (reference
	utils.dict_apply_listfun)."""
	keys = list(dict_.keys())
	vals = function([dict_[k] for k in keys])
	return {k: v for k, v in zip(keys, vals)}

def dict_lookup(dict_, vals):
	"""Vectorized dictionary lookup (reference utils.dict_lookup)."""
	keys = list(dict_.keys())
	res = None
	vals = np.asarray(vals)
	for k in keys:
		v = np.asarray(dict_[k])
		if res is None:
			res = np.zeros(vals.shape + v.shape, v.dtype)
		res[vals == k] = v
	return res

def fallback(*args):
	for a in args:
		if a is not None: return a
	return None

def cumsplit(sizes, capacities):
	"""(reference utils.cumsplit)."""
	return np.searchsorted(np.cumsum(sizes), np.cumsum(capacities), side="right")

def mask2range(mask):
	"""Binary mask -> ranges [:,{start,stop}] (reference utils.mask2range)."""
	mask = np.concatenate([[False], np.asarray(mask, bool), [False]]).astype(int)
	d = np.diff(mask)
	starts = np.nonzero(d == 1)[0]
	stops = np.nonzero(d == -1)[0]
	return np.stack([starts, stops], -1)

def repeat_filler(d, n):
	"""Fill n elements by repeating d forwards and backwards
	(reference utils.repeat_filler)."""
	d = np.asarray(d)
	tile = np.concatenate([d, d[::-1]])
	reps = (n + len(tile) - 1)//len(tile)
	return np.tile(tile, reps)[:n]

def repeat(arr, n, axis=-1):
	"""Tile arr n times along axis (reference utils.repeat)."""
	arr = np.asarray(arr)
	reps = [1]*arr.ndim
	reps[axis] = n
	return np.tile(arr, reps)

def argmax(arr):
	"""Multidimensional argmax returning an index tuple (reference utils.argmax)."""
	arr = np.asarray(arr)
	return np.unravel_index(np.argmax(arr), arr.shape)

def argmin(arr):
	arr = np.asarray(arr)
	return np.unravel_index(np.argmin(arr), arr.shape)

# Time scale conversions (reference utils.py; standard epoch offsets)
def mjd2djd(mjd):   return np.asarray(mjd) + 2400000.5 - 2415020
def djd2mjd(djd):   return np.asarray(djd) - 2400000.5 + 2415020
def mjd2jd(mjd):    return np.asarray(mjd) + 2400000.5
def jd2mjd(jd):     return np.asarray(jd) - 2400000.5
def ctime2djd(ctime): return np.asarray(ctime)/86400.0 + 40587.0 + 2400000.5 - 2415020
def djd2ctime(djd): return (np.asarray(djd) - (40587.0 + 2400000.5 - 2415020))*86400.0
def ctime2jd(ctime): return np.asarray(ctime)/86400.0 + 40587.0 + 2400000.5
def jd2ctime(jd):   return (np.asarray(jd) - (40587.0 + 2400000.5))*86400.0
def yr2ctime(yr):   return (np.asarray(yr) - 1970.0)*86400*365.2425
def ctime2yr(ctime): return np.asarray(ctime)/(86400*365.2425) + 1970.0

def ctime2date(timestamp, tzone=0, fmt="%Y-%m-%d"):
	import time as _time
	return _time.strftime(fmt, _time.gmtime(np.asarray(timestamp) + tzone*3600))

def date2ctime(dstr):
	import datetime, calendar
	for f in ["%Y-%m-%dT%H:%M:%S", "%Y-%m-%d %H:%M:%S", "%Y-%m-%d"]:
		try:
			return calendar.timegm(datetime.datetime.strptime(dstr.strip(), f).timetuple())
		except ValueError: continue
	raise ValueError("Unrecognized date format: %s" % dstr)


# --- statistics / shaping helpers (reference utils.py) ---
def medmean2(x, axis=None, frac=0.1, bsize=None):
	"""Robust mean: mean of the central (1-2*frac) quantile range
	(reference utils.medmean2)."""
	x = np.asarray(x)
	if axis is None:
		v = np.sort(x.reshape(-1))
		n = len(v); i1 = int(n*frac); i2 = max(i1+1, n - i1)
		return np.mean(v[i1:i2])
	v = np.sort(x, axis=axis)
	n = x.shape[axis]; i1 = int(n*frac); i2 = max(i1+1, n - i1)
	sel = [slice(None)]*x.ndim; sel[axis] = slice(i1, i2)
	return np.mean(v[tuple(sel)], axis=axis)

def maskmed(arr, mask=None, axis=-1, maskval=0):
	"""Median along axis ignoring masked entries (reference utils.maskmed)."""
	arr = np.asarray(arr)
	bad = (arr == maskval) if mask is None else ~np.asarray(mask, bool)
	work = np.where(bad, np.nan, arr.astype(float))
	res = np.nanmedian(work, axis=axis)
	return np.nan_to_num(res, nan=maskval)

def moveaxes(a, old, new):
	return np.moveaxis(a, np.atleast_1d(old), np.atleast_1d(new))

def search(a, v, side="left"):
	"""Row-wise searchsorted: a[...,n] searched for v[...] (reference utils.search)."""
	a = np.asarray(a); v = np.asarray(v)
	cmp = (a < v[..., None]) if side == "left" else (a <= v[..., None])
	return np.sum(cmp, -1)

def weighted_quantile(map, ivar, quantile, axis=-1):
	"""Weighted quantile along axis (reference utils.weighted_quantile)."""
	map = np.asarray(map, float)
	ivar = np.broadcast_to(np.asarray(ivar, float), map.shape)
	order = np.argsort(map, axis=axis)
	m = np.take_along_axis(map, order, axis)
	w = np.take_along_axis(ivar, order, axis)
	cw = np.cumsum(w, axis) - 0.5*w
	tot = np.sum(w, axis=axis, keepdims=True)
	p = cw/np.maximum(tot, 1e-300)
	# linear interpolation in p
	m2 = np.moveaxis(m, axis, -1); p2 = np.moveaxis(p, axis, -1)
	flat_m = m2.reshape(-1, m2.shape[-1]); flat_p = p2.reshape(-1, p2.shape[-1])
	res = np.array([np.interp(quantile, pi, mi) for pi, mi in zip(flat_p, flat_m)])
	return res.reshape(m2.shape[:-1])

def weighted_median(map, ivar=1, axis=-1):
	return weighted_quantile(map, ivar, 0.5, axis=axis)

def partial_flatten(a, axes=[-1], pos=0):
	"""Flatten all dims except axes; flattened dim at pos (reference
	utils.partial_flatten)."""
	a = np.asarray(a)
	axes = [ax % a.ndim for ax in axes]
	rest = [i for i in range(a.ndim) if i not in axes]
	a = np.transpose(a, rest + axes)
	a = a.reshape((-1,) + tuple(a.shape[len(rest):]))
	return np.moveaxis(a, 0, pos)

def partial_expand(a, shape, axes=[-1], pos=0):
	"""Inverse of partial_flatten (reference utils.partial_expand)."""
	a = np.asarray(a)
	a = np.moveaxis(a, pos, 0)
	axes = [ax % len(shape) for ax in axes]
	rest = [i for i in range(len(shape)) if i not in axes]
	a = a.reshape(tuple(shape[i] for i in rest) + tuple(a.shape[1:]))
	order = np.argsort(rest + axes)
	return np.transpose(a, order)

def addaxes(a, axes):
	a = np.asarray(a)
	for ax in sorted([ax % (a.ndim + len(axes)) for ax in axes]):
		a = np.expand_dims(a, ax)
	return a

def delaxes(a, axes):
	a = np.asarray(a)
	for ax in sorted([ax % a.ndim for ax in axes], reverse=True):
		a = np.squeeze(a, ax)
	return a

class flatview:
	"""with flatview(arr, axes=[...]) as farr: ... -- read/write flattened
	view with changes propagated back (reference utils.flatview)."""
	def __init__(self, array, axes=[], mode="rwc", pos=0):
		self.array = array
		self.axes = axes
		self.pos = pos
		self.mode = mode
	def __enter__(self):
		self.flat = partial_flatten(self.array, self.axes, self.pos)
		return self.flat
	def __exit__(self, type, value, traceback):
		if "w" in self.mode:
			self.array[...] = partial_expand(self.flat, self.array.shape,
				self.axes, self.pos)

class nowarn:
	"""Suppress warnings inside a with block (reference utils.nowarn)."""
	def __enter__(self):
		import warnings
		self._cm = warnings.catch_warnings()
		self._cm.__enter__()
		warnings.simplefilter("ignore")
		self._err = np.seterr(all="ignore")
		return self
	def __exit__(self, type, value, traceback):
		np.seterr(**self._err)
		self._cm.__exit__(type, value, traceback)

def dedup(a):
	"""Remove consecutive duplicates from a 1d array (reference utils.dedup)."""
	a = np.asarray(a)
	if a.size == 0: return a
	keep = np.concatenate([[True], a[1:] != a[:-1]])
	return a[keep]

def bin_multi(pix, shape, weights=None):
	"""Count hits of multi-d indices pix[{coords},n] into an array of the
	given shape (reference utils.bin_multi)."""
	pix = np.asarray(pix)
	flat = np.ravel_multi_index([np.clip(p, 0, s-1) for p, s in zip(pix, shape)], shape)
	return np.bincount(flat, weights=weights, minlength=int(np.prod(shape))).reshape(shape)

def bincount(pix, weights=None, minlength=0):
	"""np.bincount with broadcasting pre-dimensions (reference utils.bincount)."""
	pix = np.asarray(pix)
	if pix.ndim == 1 and (weights is None or np.asarray(weights).ndim == 1):
		return np.bincount(pix, weights=weights, minlength=minlength)
	pix2 = pix.reshape(-1, pix.shape[-1])
	if weights is not None:
		w2 = np.broadcast_to(np.asarray(weights), pix.shape).reshape(pix2.shape)
	n = max(minlength, int(pix.max())+1 if pix.size else minlength)
	res = np.zeros(pix2.shape[:1] + (n,))
	for i in range(len(pix2)):
		res[i] = np.bincount(pix2[i], weights=w2[i] if weights is not None else None,
			minlength=n)
	return res.reshape(pix.shape[:-1] + (n,))

def grid(box, shape, endpoint=True, axis=0, flat=False):
	"""Evenly spaced coordinate grid over box[{from,to},ndim]
	(reference utils.grid)."""
	box = np.asarray(box, float)
	ndim = box.shape[1] if box.ndim > 1 else 1
	box = box.reshape(2, ndim)
	axs = [np.linspace(box[0, i], box[1, i], shape[i], endpoint=endpoint)
		for i in range(ndim)]
	mesh = np.meshgrid(*axs, indexing="ij")
	res = np.stack(mesh, 0)
	if flat: res = res.reshape(ndim, -1)
	return np.moveaxis(res, 0, axis)

def pixwin_1d(f, order=0):
	"""1D mapmaking pixel window at dimensionless frequency f
	(reference utils.pixwin_1d)."""
	f = np.asarray(f)
	if order is None or order == "none": return f*0 + 1
	if order in (0, "nn"): return np.sinc(f)
	if order in (1, "lin"):
		return np.sinc(f)**2/((2 + np.cos(2*np.pi*f))/3)
	raise ValueError("Unsupported order '%s'" % str(order))

def nearest_product(n, factors, direction="below"):
	"""Largest (or smallest) product of powers of factors <= n (>= n)
	(reference utils.nearest_product)."""
	below = direction == "below"
	ni = floor(n) if below else ceil(n)
	if 1 in factors: return ni
	limit = ni + 1 if below else ni*min(factors) + 1
	reach = np.zeros(limit + 1, bool)
	reach[1] = True
	best = None
	for i in range(ni + 1):
		if not reach[i]: continue
		for f in factors:
			m = i*f
			if below:
				if m > n: continue
				best = m if best is None or m > best else best
			else:
				if m >= n and (best is None or m < best): best = m
			if m < reach.size: reach[m] = True
	return best

def mkdir(path):
	os.makedirs(path, exist_ok=True)

def symlink(src, dest):
	try: os.remove(dest)
	except FileNotFoundError: pass
	os.symlink(src, dest)

def decomp_basis(basis, vec):
	"""Least-squares decomposition of vec onto basis rows (reference
	utils.decomp_basis)."""
	basis = np.asarray(basis); vec = np.asarray(vec)
	return np.linalg.solve(basis @ basis.T, basis @ vec.T).T

def find_period_fourier(d, axis=-1):
	"""Fourier-based period estimate (reference utils.find_period_fourier)."""
	d = np.asarray(d)
	d2 = np.moveaxis(d, axis, -1)
	flat = d2.reshape(-1, d2.shape[-1])
	ps = np.abs(np.fft.rfft(flat))**2
	ps[:, 0] = 0
	res = np.empty(len(flat))
	for i, p in enumerate(ps):
		k = np.argmax(p[1:]) + 1
		ks = np.arange(max(1, k-1), min(len(p), k+2))
		kw = np.sum(ks*p[ks])/np.maximum(np.sum(p[ks]), 1e-300)
		res[i] = flat.shape[-1]/kw
	return res.reshape(d2.shape[:-1])

def find_period_exact(d, guess):
	"""Refine a period guess by fitting a folded model (reference
	utils.find_period_exact)."""
	from scipy import optimize
	d = np.asarray(d, float)
	n = d.size
	n = int(min(10, n/float(guess))*guess)
	off = (d.size - n)//2
	d = d[off:off+n]
	t = np.arange(n)
	def chisq(x):
		w, phase = x
		w = abs(w) + 1e-3
		ph = (t + phase) % w
		model = np.interp(ph, np.sort(ph), d[np.argsort(ph)])
		return np.var(d - model)
	res = optimize.fmin_powell(chisq, [guess, guess], xtol=1, disp=False)
	period, phase = res
	return period, phase + off, chisq([period, phase])/max(np.var(d**2), 1e-300)

def find_period(d, axis=-1):
	"""(periods, phases, chisqs) of the assumed-periodic signal d
	(reference utils.find_period)."""
	d = np.asarray(d)
	dwork = partial_flatten(d, [axis])
	guess = np.atleast_1d(find_period_fourier(dwork))
	res = np.empty([3, len(dwork)])
	for i, (d1, g1) in enumerate(zip(dwork, guess)):
		res[:, i] = find_period_exact(d1, g1)
	oshape = d.shape[:axis % d.ndim] + d.shape[axis % d.ndim + 1:]
	return tuple(r.reshape(oshape) for r in res)

def find_sweeps(az, tol=0.2):
	"""Start/end indices of each monotonic sweep of az (reference
	utils.find_sweeps)."""
	az = np.asarray(az, float)
	d = np.sign(np.diff(az))
	# smooth out noise-scale direction flips
	turn = np.nonzero(np.diff(d) != 0)[0] + 1
	amp = (np.max(az) - np.min(az))
	bounds = [0]
	for t in turn:
		if abs(az[t] - az[bounds[-1]]) > tol*amp:
			bounds.append(t)
	bounds.append(len(az)-1)
	sweeps = [[bounds[i], bounds[i+1]] for i in range(len(bounds)-1)
		if bounds[i+1] > bounds[i]]
	return np.array(sweeps)

def equal_split(weights, nbin):
	"""Split weights into nbin groups of approximately equal sum
	(reference utils.equal_split)."""
	order = np.argsort(weights)[::-1]
	sums = np.zeros(nbin)
	res = [[] for _ in range(nbin)]
	for i in order:
		j = np.argmin(sums)
		res[j].append(i)
		sums[j] += weights[i]
	return res

def range_normalize(a):
	"""Make ranges non-empty and increasing (reference utils.range_normalize)."""
	a = np.array(a)
	if a.size == 0: return a.reshape(0, 2)
	flip = a[:, 1] < a[:, 0]
	a[flip] = a[flip, ::-1]
	return a[a[:, 1] > a[:, 0]]

def range_union(a, mapping=False):
	"""Merge overlapping ranges (reference utils.range_union)."""
	a = np.asarray(a)
	if a.size == 0:
		return (a.reshape(0, 2), np.zeros(0, int)) if mapping else a.reshape(0, 2)
	order = np.argsort(a[:, 0])
	res = []
	omap = np.empty(len(a), int)
	for oi in order:
		r = a[oi]
		if res and r[0] <= res[-1][1]:
			res[-1][1] = max(res[-1][1], r[1])
		else:
			res.append([r[0], r[1]])
		omap[oi] = len(res) - 1
	res = np.array(res)
	return (res, omap) if mapping else res

def range_sub(a, b, mapping=False):
	"""Remove ranges b from ranges a (reference utils.range_sub)."""
	a = np.asarray(a).reshape(-1, 2)
	b = range_union(np.asarray(b).reshape(-1, 2)) if len(b) else np.zeros((0, 2))
	out = []
	amap = []
	for ia, (a0, a1) in enumerate(a):
		cur = a0
		for b0, b1 in b:
			if b1 <= cur or b0 >= a1: continue
			if b0 > cur:
				out.append([cur, b0]); amap.append(ia)
			cur = max(cur, b1)
		if cur < a1:
			out.append([cur, a1]); amap.append(ia)
	out = np.array(out).reshape(-1, 2)
	if mapping: return out, np.asarray(amap, int), None
	return out

def range_cut(a, c):
	"""Cut ranges at the positions in c (reference utils.range_cut)."""
	a = np.asarray(a).reshape(-1, 2)
	c = np.sort(np.asarray(c))
	out = []
	for a0, a1 in a:
		cs = c[(c > a0) & (c < a1)]
		edges = np.concatenate([[a0], cs, [a1]])
		for i in range(len(edges)-1):
			out.append([edges[i], edges[i+1]])
	return np.array(out).reshape(-1, 2)

def edges2bins(edges):
	edges = np.asarray(edges)
	return np.stack([edges[:-1], edges[1:]], -1)

def bins2edges(bins):
	bins = np.asarray(bins)
	return np.concatenate([bins[:, 0], bins[-1:, 1]])

def bin_expand(bins, bdata):
	"""Expand per-bin values to per-sample values (reference utils.bin_expand)."""
	bins = np.asarray(bins); bdata = np.asarray(bdata)
	n = int(bins[-1, 1])
	res = np.zeros(bdata.shape[:-1] + (n,), bdata.dtype)
	for i, (b0, b1) in enumerate(bins):
		res[..., int(b0):int(b1)] = bdata[..., i, None]
	return res

def pad_bins(bins, pad, min=None, max=None):
	bins = np.array(bins)
	bins[:, 0] -= pad; bins[:, 1] += pad
	if min is not None: bins[:, 0] = np.maximum(bins[:, 0], min)
	if max is not None: bins[:, 1] = np.minimum(bins[:, 1], max)
	return bins

def merge_bins(bins):
	return range_union(bins)

def infer_bin_edges(centers, ref=1):
	"""Bin edges from centers, assuming bins ref and ref+1 have equal width
	(reference utils.infer_bin_edges)."""
	c = np.asarray(centers, float)
	n = len(c)
	# solve edges with e[i]+e[i+1]=2c[i] plus the equal-width constraint
	A = np.zeros((n+1, n+1))
	rhs = np.zeros(n+1)
	for i in range(n):
		A[i, i] = A[i, i+1] = 0.5
		rhs[i] = c[i]
	A[n, ref] = -1; A[n, ref+1] = 1
	rhs[n] = c[ref+1] - c[ref]
	return np.linalg.solve(A, rhs)


# --- boxes, sboxes, geometry (reference utils.py) ---
def bounding_box(boxes):
	"""Bounding box of boxes[:,2,:] or points[:,2] (reference
	utils.bounding_box)."""
	boxes = np.asarray(boxes)
	if boxes.ndim == 2:
		return np.array([boxes.min(0), boxes.max(0)])
	return np.array([boxes.min((0, 1)), boxes.max((0, 1))])

def box2corners(box):
	"""All 2^ndim corners of a box[{from,to},ndim] (reference utils.box2corners)."""
	box = np.asarray(box)
	ndim = box.shape[1]
	out = []
	for i in range(2**ndim):
		out.append([box[(i >> d) & 1, d] for d in range(ndim)])
	return np.array(out)

def box2contour(box, nperedge=5):
	"""Points along the edges of a 2d box (reference utils.box2contour)."""
	box = np.asarray(box, float)
	n = np.zeros(2, int) + nperedge
	ys = np.linspace(box[0, 0], box[1, 0], n[0])
	xs = np.linspace(box[0, 1], box[1, 1], n[1])
	pts = ([[y, box[0, 1]] for y in ys] + [[box[1, 0], x] for x in xs[1:]] +
		[[y, box[1, 1]] for y in ys[::-1][1:]] + [[box[0, 0], x] for x in xs[::-1][1:-1]])
	return np.array(pts)

def box_area(a):
	a = np.asarray(a)
	return np.abs(np.prod(a[..., 1, :] - a[..., 0, :], -1))

def box_slice(a, b):
	"""Bounds of b relative to a's corner, clipped to a (reference
	utils.box_slice)."""
	a = np.asarray(a); b = np.asarray(b)
	pre = np.broadcast_shapes(a.shape[:-2], b.shape[:-2])
	a2 = np.broadcast_to(a, pre + a.shape[-2:])
	b2 = np.broadcast_to(b, pre + b.shape[-2:])
	lo = np.maximum(a2[..., 0, :], b2[..., 0, :]) - a2[..., 0, :]
	hi = np.minimum(a2[..., 1, :], b2[..., 1, :]) - a2[..., 0, :]
	hi = np.maximum(lo, hi)
	return np.stack([lo, hi], -2)

def box_overlap(a, b):
	"""Overlap area(s) between boxes (reference utils.box_overlap)."""
	s = box_slice(a, b)
	return np.abs(np.prod(s[..., 1, :] - s[..., 0, :], -1))

def widen_box(box, margin=1e-3, relative=True):
	"""Widen a box by margin (relative to its size by default)
	(reference utils.widen_box)."""
	box = np.asarray(box, float)
	m = np.zeros(box.shape[-1] if box.ndim > 1 else ()) + margin
	if relative: m = m*(box[1] - box[0])
	return np.array([box[0] - m/2, box[1] + m/2])

def pad_box(box, padding):
	"""Pad a box by an absolute amount, sign-aware (reference utils.pad_box)."""
	box = np.array(box, float)
	sgn = np.where(box[1] >= box[0], 1, -1)
	box[0] -= padding*sgn
	box[1] += padding*sgn
	return box

def unwrap_range(range_, nwrap=2*np.pi):
	"""Undo wrapping of an ordered range (reference utils.unwrap_range)."""
	range_ = np.array(range_, float)
	range_[1] -= np.floor((range_[1] - range_[0])/nwrap)*nwrap
	range_ -= np.floor(range_[1][None]/nwrap)*nwrap if range_.ndim > 1 else \
		np.floor(range_[1]/nwrap)*nwrap
	return range_

def sum_by_id(a, ids, axis=0):
	"""Sum rows of a sharing the same id (reference utils.sum_by_id)."""
	a = np.moveaxis(np.asarray(a), axis, 0)
	ids = np.asarray(ids)
	n = int(ids.max()) + 1 if ids.size else 0
	res = np.zeros((n,) + a.shape[1:], a.dtype)
	np.add.at(res, ids, a)
	return np.moveaxis(res, 0, axis)

def pole_wrap(pos):
	"""Mirror lat into [-pi/2, pi/2], adding pi to lon per mirroring
	(reference utils.pole_wrap)."""
	pos = np.array(pos)
	lat, lon = pos[0], pos[1]
	halforbit = np.floor((lat + np.pi/2)/np.pi).astype(int)
	back = halforbit % 2 != 0
	lat = lat - np.pi*halforbit
	lat = np.where(back, -lat, lat)
	lon = np.where(back, lon + np.pi, lon)
	pos[0], pos[1] = lat, lon
	return pos

def tuplify(a):
	try: return tuple(a)
	except TypeError: return (a,)

def iorlast(a, i):
	try: return a[min(i, len(a)-1)]
	except TypeError: return a

def resize_array(arr, size, axis=None, val=0):
	"""Resize axes to the given sizes, padding with val (reference
	utils.resize_array)."""
	arr = np.asarray(arr)
	sizes = np.atleast_1d(size)
	axes = range(len(sizes)) if axis is None else np.atleast_1d(axis)
	oshape = list(arr.shape)
	for ax, s in zip(axes, sizes): oshape[ax] = s
	res = np.full(oshape, val, arr.dtype)
	sel = tuple(slice(0, min(o, n)) for o, n in zip(arr.shape, oshape))
	res[sel] = arr[sel]
	return res

def sbox_flip(sbox):
	sbox = np.asarray(sbox)
	return np.stack([sbox[..., 1] - np.sign(sbox[..., 2]),
		sbox[..., 0] - np.sign(sbox[..., 2]), -sbox[..., 2]], -1)

def sbox2slice(sbox):
	"""sbox [:,{start,stop,step}] -> tuple of slices (reference utils.sbox2slice)."""
	sbox = np.asarray(sbox)
	if sbox.ndim == 1: sbox = sbox[None]
	return (Ellipsis,) + tuple(slice(int(s[0]), int(s[1]) if s[1] >= 0 else None
		if s[1] == -1 and s[2] < 0 else int(s[1]), int(s[2])) for s in sbox)

def sbox_fix0(sbox):
	"""Add unit steps to stepless sboxes (reference utils.sbox_fix0)."""
	sbox = np.asarray(sbox)
	if sbox.shape[-1] == 2:
		step = np.ones(sbox.shape[:-1] + (1,), sbox.dtype)
		sbox = np.concatenate([sbox, step], -1)
	return sbox

def sbox_fix(sbox):
	"""Normalize sboxes to positive step (reference utils.sbox_fix)."""
	sbox = sbox_fix0(sbox)
	neg = sbox[..., 2] < 0
	flipped = sbox_flip(sbox)
	return np.where(neg[..., None], flipped, sbox)

def sbox_intersect_1d(a, b, wrap=0):
	"""Intersection sboxes of two 1d sboxes (reference utils.sbox_intersect_1d)."""
	a = sbox_fix(np.asarray(a)); b = sbox_fix(np.asarray(b))
	res = []
	shifts = [0] if not wrap else [-wrap, 0, wrap]
	for s in shifts:
		lo = max(a[0], b[0] + s)
		hi = min(a[1], b[1] + s)
		if hi > lo: res.append([lo, hi, max(a[2], b[2])])
	return res

def gcd(a, b):
	while b: a, b = b, a % b
	return a

def lcm(a, b): return a*b//gcd(a, b)

def uncat(a, lens):
	"""Undo concatenation: split a into pieces of the given lengths
	(reference utils.uncat)."""
	cuts = np.concatenate([[0], np.cumsum(lens)])
	return [a[cuts[i]:cuts[i+1]] for i in range(len(lens))]

def vec_angdist(v1, v2, axis=0):
	"""Stable angle between vectors via Kahan's formula (reference
	utils.vec_angdist)."""
	v1 = np.asarray(v1, float); v2 = np.asarray(v2, float)
	n1 = np.linalg.norm(v1, axis=axis); n2 = np.linalg.norm(v2, axis=axis)
	a = np.moveaxis(v1, axis, -1)/n1[..., None]
	b = np.moveaxis(v2, axis, -1)/n2[..., None]
	return 2*np.arctan2(np.linalg.norm(a - b, axis=-1), np.linalg.norm(a + b, axis=-1))

def label_unique(a, axes=(), rtol=1e-5, atol=1e-8):
	"""Label entries by approximate equality (reference utils.label_unique)."""
	a = np.asarray(a)
	axes = tuple(ax % a.ndim for ax in axes)
	rest = tuple(i for i in range(a.ndim) if i not in axes)
	work = np.transpose(a, rest + axes).reshape((-1,) + tuple(a.shape[i] for i in axes))
	labels = np.full(len(work), -1, int)
	nlab = 0
	for i in range(len(work)):
		if labels[i] >= 0: continue
		same = np.ones(len(work), bool)
		for j in range(len(work)):
			same[j] = labels[j] < 0 and np.allclose(work[j], work[i], rtol=rtol, atol=atol)
		labels[same] = nlab
		nlab += 1
	return labels.reshape(tuple(a.shape[i] for i in rest))

def transpose_inds(inds, nrow, ncol):
	"""Flat indices after transposing an (nrow,ncol) array (reference
	utils.transpose_inds)."""
	inds = np.asarray(inds)
	r, c = np.unravel_index(inds, (nrow, ncol))
	return np.ravel_multi_index((c, r), (ncol, nrow))

def rescale(a, range=[0, 1]):
	a = np.asarray(a, float)
	mn, mx = a.min(), a.max()
	if mx == mn: return np.full_like(a, range[0])
	return (a - mn)/(mx - mn)*(range[1] - range[0]) + range[0]

def split_by_group(a, start, end):
	"""Split string into alternating non-group/group sections (reference
	utils.split_by_group)."""
	res = [""]
	depth = 0
	for ch in a:
		if depth == 0 and ch in start:
			depth = 1
			res.append(ch)
		elif depth > 0:
			res[-1] += ch
			if ch in start: depth += 1
			elif ch in end:
				depth -= 1
				if depth == 0: res.append("")
			continue
		elif depth == 0:
			res[-1] += ch
			continue
	return [r for r in res]

def split_outside(a, sep, start="([{", end=")]}"):
	"""Split at sep except inside bracket groups (reference utils.split_outside)."""
	res = [""]
	depth = 0
	for ch in a:
		if ch in start: depth += 1
		elif ch in end: depth -= 1
		if ch == sep and depth == 0:
			res.append("")
		else:
			res[-1] += ch
	return res

def replace_outside(pattern, repl, string, start="([{", end=")]}"):
	"""Regex-replace only outside bracket groups (reference
	utils.replace_outside)."""
	parts = []
	depth = 0
	cur = ""
	for ch in string:
		if ch in start:
			if depth == 0:
				parts.append(("out", cur)); cur = ""
			depth += 1
			cur += ch
		elif ch in end:
			depth -= 1
			cur += ch
			if depth == 0:
				parts.append(("in", cur)); cur = ""
		else:
			cur += ch
	parts.append(("out" if depth == 0 else "in", cur))
	return "".join(re.sub(pattern, repl, t) if kind == "out" else t
		for kind, t in parts)

def find_equal_groups_fast(vals):
	"""(uvals, order, edges) grouping of a 1d array (reference
	utils.find_equal_groups_fast)."""
	vals = np.asarray(vals)
	order = np.argsort(vals, kind="stable")
	sv = vals[order]
	cut = np.nonzero(np.concatenate([[True], sv[1:] != sv[:-1]]))[0]
	edges = np.concatenate([cut, [len(sv)]])
	return sv[cut], order, edges

def find_similar_groups_fast(vals, tol=0):
	"""(ngroup, order, edges) with tolerance (reference
	utils.find_similar_groups_fast)."""
	vals = np.asarray(vals)
	order = np.argsort(vals, kind="stable")
	sv = vals[order]
	new = np.concatenate([[True], np.diff(sv) > tol])
	cut = np.nonzero(new)[0]
	edges = np.concatenate([cut, [len(sv)]])
	return len(cut), order, edges

def label_similar_groups_fast(vals, tol=0):
	n, order, edges = find_similar_groups_fast(vals, tol=tol)
	labels = np.empty(len(np.asarray(vals)), int)
	for gi in range(n):
		labels[order[edges[gi]:edges[gi+1]]] = gi
	return labels

def label_multi(valss, return_index=False, return_nlabel=False):
	"""Joint labels over multiple key arrays (reference utils.label_multi)."""
	keys = list(zip(*[np.asarray(v).tolist() for v in valss]))
	seen = {}
	index = []
	labels = np.empty(len(keys), int)
	for i, k in enumerate(keys):
		if k not in seen:
			seen[k] = len(seen)
			index.append(i)
		labels[i] = seen[k]
	res = (labels,)
	if return_index: res = res + (np.array(index),)
	if return_nlabel: res = res + (len(seen),)
	return res[0] if len(res) == 1 else res

def pathsplit(path):
	"""Split a path into all its components (reference utils.pathsplit)."""
	parts = []
	while True:
		head, tail = os.path.split(path)
		if tail: parts.append(tail)
		elif head:
			parts.append(head)
			break
		if not head: break
		path = head
	return parts[::-1]

def minmax(a, axis=None):
	a = np.asarray(a)
	return np.array([a.min(axis=axis), a.max(axis=axis)])


# --- numeric/physics helpers (reference utils.py) ---
def rewind_compact(phis, period=2*np.pi, axis=-1):
	"""Rewind angles to the most compact interval (reference
	utils.rewind_compact)."""
	ref = find_rewind_compact_ref(phis, period=period, axis=axis)
	return rewind(phis, ref, period=period)

def find_rewind_compact_ref(phis, period=2*np.pi, axis=-1):
	"""Reference angle that makes rewound phis most compact: middle of the
	largest empty gap plus half a period (reference
	utils.find_rewind_compact_ref)."""
	phis = np.asarray(rewind(phis, ref=0, period=period))
	if phis.shape[axis] == 0: return phis
	sp = np.sort(phis, axis=axis)
	first = np.take(sp, [0], axis=axis) + period
	sp = np.concatenate([sp, first], axis=axis)
	gaps = np.diff(sp, axis=axis)
	icut = np.argmax(gaps, axis=axis)
	icut_k = np.expand_dims(icut, axis)
	mid = (np.take_along_axis(sp, icut_k, axis=axis)
		+ np.take_along_axis(sp, icut_k+1, axis=axis))/2
	return np.asarray(rewind(np.squeeze(mid, axis) + period/2, period=period))

def deslope(d, w=1, inplace=False, axis=-1, avg=np.mean):
	"""Remove mean and endpoint-matching slope (reference utils.deslope)."""
	d = np.asarray(d, float) if not inplace else d
	if not inplace: d = d.copy()
	d2 = np.moveaxis(d, axis, -1)
	flat = d2.reshape(-1, d2.shape[-1])
	t = np.arange(flat.shape[-1])
	for row in flat:
		a0 = avg(row[:w]); a1 = avg(row[-w:])
		row -= t*(a1 - a0)/max(len(row)-1, 1) + a0
	return d

def hasoff(val, off, tol=1e-6):
	"""Does val deviate from an integer by off? (reference utils.hasoff)."""
	return np.abs((val - off + 0.5) % 1 - 0.5) < tol

def same_array(a, b):
	"""True if a and b share identity (reference utils.same_array)."""
	a = np.asarray(a); b = np.asarray(b)
	return a.__array_interface__["data"] == b.__array_interface__["data"] \
		and a.shape == b.shape and a.strides == b.strides and a.dtype == b.dtype

def fix_zero_strides(a):
	"""Copy away zero strides on length-1 axes (reference
	utils.fix_zero_strides)."""
	a = np.asarray(a)
	if all(s != 0 or n != 1 for s, n in zip(a.strides, a.shape)): return a
	return np.ascontiguousarray(a)

def greedy_split(data, n=2, costfun=max, workfun=lambda w, x: x if w is None else x + w):
	"""Split into n groups minimizing costfun greedily (reference
	utils.greedy_split)."""
	order = np.argsort([costfun([workfun(None, d)]) for d in data])[::-1]
	groups = [[] for _ in range(n)]
	works = [None]*n
	for i in order:
		costs = [costfun([workfun(works[j], data[i])]) for j in range(n)]
		j = int(np.argmin(costs))
		groups[j].append(int(i))
		works[j] = workfun(works[j], data[i])
	return groups

def greedy_split_simple(data, n=2):
	"""Split into n lists with ~equal sums (reference utils.greedy_split_simple)."""
	order = np.argsort(data)[::-1]
	sums = np.zeros(n)
	res = [[] for _ in range(n)]
	for i in order:
		j = int(np.argmin(sums))
		res[j].append(data[int(i)])
		sums[j] += data[int(i)]
	return res

def cov2corr(C):
	"""(corr, std): scale C to unit diagonal (reference utils.cov2corr)."""
	C = np.asarray(C)
	std = np.sqrt(np.abs(np.einsum("...ii->...i", C)))
	corr = C/(std[..., :, None]*std[..., None, :])
	return corr, std

def corr2cov(corr, std):
	corr = np.asarray(corr); std = np.asarray(std)
	return corr*std[..., :, None]*std[..., None, :]

def eigsort(A, nmax=None, merged=False):
	"""Eigendecomposition sorted largest-first (reference utils.eigsort)."""
	E, V = np.linalg.eigh(np.asarray(A))
	order = np.argsort(E)[..., ::-1]
	E = np.take_along_axis(E, order, -1)
	V = np.take_along_axis(V, order[..., None, :], -1)
	if nmax is not None:
		E = E[..., :nmax]; V = V[..., :nmax]
	if merged: return V*E[..., None, :]**0.5
	return E, V

def nodiag(A):
	A = np.array(A)
	np.einsum("...ii->...i", A)[...] = 0
	return A

def unpackbits(a):
	return np.unpackbits(np.atleast_1d(np.asarray(a, np.uint8)))

def combine_beams(irads_array):
	"""Combine elliptical beam inverse-variance parameter triplets
	(reference utils.combine_beams)."""
	Cs = np.array([[[ir[0], ir[2]], [ir[2], ir[1]]] for ir in irads_array])
	Ctot = np.eye(2)
	for C in Cs:
		E, V = np.linalg.eigh(C)
		B = (V*np.maximum(E, 0)[None]**0.5) @ V.T
		Ctot = B @ Ctot @ B.T
	return np.array([Ctot[0, 0], Ctot[1, 1], Ctot[0, 1]])

def read_lines(fname, col=0):
	"""Lines of a file, with optional :slice suffix on the name
	(reference utils.read_lines)."""
	toks = fname.split(":")
	fname, sel = toks[0], ":".join(toks[1:])
	with open(fname, "r") as f:
		lines_ = [line.rstrip("\n") for line in f]
	if sel:
		lines_ = eval("lines_[" + sel + "]")
	return lines_

def atleast_3d(a):
	a = np.asarray(a)
	while a.ndim < 3: a = a[None]
	return a

def atleast_Nd(a, n):
	a = np.asarray(a)
	while a.ndim < n: a = a[None]
	return a

def to_Nd(a, n, axis=0, return_inverse=False):
	"""Reshape a to exactly n dims by adding/merging at axis (reference
	utils.to_Nd)."""
	a = np.asarray(a)
	ishape = a.shape
	if a.ndim < n:
		ax = axis % (n if axis >= 0 else n)
		pads = n - a.ndim
		shape = (1,)*pads + a.shape if axis == 0 else a.shape + (1,)*pads
		res = a.reshape(shape)
	else:
		extra = a.ndim - n + 1
		if axis == 0:
			res = a.reshape((-1,) + a.shape[extra:])
		else:
			res = a.reshape(a.shape[:n-1] + (-1,))
	return (res, ishape) if return_inverse else res

def preflat(a, n):
	"""Flatten the first n dims (reference utils.preflat)."""
	a = np.asarray(a)
	if n < 0: n = a.ndim + n
	return a.reshape((-1,) + a.shape[n:])

def postflat(a, n):
	"""Flatten the last n dims (reference utils.postflat)."""
	a = np.asarray(a)
	if n < 0: n = a.ndim + n
	return a.reshape(a.shape[:a.ndim-n] + (-1,))

def blockify(a, bsize):
	"""a[...,nsamp] -> blocks[...,nblock,bsize], discarding the tail
	(reference utils.blockify)."""
	a = np.asarray(a)
	nb = a.shape[-1]//bsize
	return a[..., :nb*bsize].reshape(a.shape[:-1] + (nb, bsize))

def block_mean_filter(a, width):
	"""Replace samples by their block means (reference utils.block_mean_filter)."""
	a = np.array(a, float)
	n = a.shape[-1]
	nb = max(n//int(width), 1)
	edges = np.linspace(0, n, nb+1).astype(int)
	for i in range(nb):
		a[..., edges[i]:edges[i+1]] = np.mean(a[..., edges[i]:edges[i+1]], -1)[..., None]
	return a

def downgrade(arr, down, axes=None, op=np.mean, inclusive=True):
	"""Downgrade axes by integer factors (reference utils.downgrade)."""
	arr = np.asarray(arr)
	downs = np.atleast_1d(down)
	if axes is None: axes = range(-len(downs), 0)
	for d, ax in zip(downs, np.atleast_1d(axes)):
		arr = block_reduce(arr, int(d), axis=ax, op=op, inclusive=inclusive)
	return arr

def upgrade(arr, factor, axes=None, oshape=None, inclusive=True):
	"""Upgrade axes by integer repetition (reference utils.upgrade)."""
	arr = np.asarray(arr)
	factors = np.atleast_1d(factor)
	if axes is None: axes = range(-len(factors), 0)
	for f, ax in zip(factors, np.atleast_1d(axes)):
		arr = np.repeat(arr, int(f), axis=ax)
		if oshape is not None:
			n = oshape[ax]
			sel = [slice(None)]*arr.ndim; sel[ax] = slice(0, n)
			arr = arr[tuple(sel)]
	return arr

def tofinite(arr, val=0):
	"""Replace non-finite values with val (reference utils.tofinite)."""
	return np.where(np.isfinite(arr), arr, val)

def remove_nan(a):
	"""In-place nan/inf -> 0; returns a (reference utils.remove_nan)."""
	np.nan_to_num(a, copy=False, nan=0.0, posinf=0.0, neginf=0.0)
	return a

def without_nan(a):
	return np.nan_to_num(np.asarray(a), nan=0.0, posinf=0.0, neginf=0.0)

def parse_ints(s): return parse_numbers(s, int)
def parse_floats(s): return parse_numbers(s, float)

def parse_numbers(s, dtype=None):
	"""Parse '1,2:5,8' style number lists with ranges (reference
	utils.parse_numbers)."""
	res = []
	for tok in s.split(","):
		parts = tok.split(":")
		if len(parts) == 1:
			res.append(float(parts[0]))
		else:
			a, b = float(parts[0]), float(parts[1])
			step = float(parts[2]) if len(parts) > 2 else 1
			res.extend(np.arange(a, b, step).tolist())
	res = np.array(res)
	if dtype is not None: res = res.astype(dtype)
	return res

def parse_box(desc):
	"""'from:to,from:to' -> [{from,to},:] (reference utils.parse_box)."""
	pairs = [[float(v) for v in tok.split(":")] for tok in desc.split(",")]
	return np.array(pairs).T

def triangle_wave(x, period=1):
	"""Triangle wave with amplitude 1 (reference utils.triangle_wave)."""
	x = np.asarray(x, float)/period*4
	x = (x + 1) % 4 - 1
	return np.where(x > 1, 2 - x, x)

def type2_wave(x, period=1, amp=np.pi/2, mid=0, tol=1e-12):
	"""Mercator-like scan wave (reference utils.type2_wave)."""
	y = triangle_wave(x, period=period)*amp + (np.pi/2 + mid)
	y = np.clip(np.abs(rewind(y)), tol, np.pi - tol)
	return np.log(np.tan(y/2))

def calc_beam_area(beam_profile):
	"""Beam area in steradians from profile[{r,b},:] (reference
	utils.calc_beam_area)."""
	r, b = np.asarray(beam_profile)
	return np.trapezoid(2*np.pi*np.sin(r)*b, r) if hasattr(np, "trapezoid") \
		else np.trapz(2*np.pi*np.sin(r)*b, r)

def iplanck_T(f, I):
	"""Inverse of planck(f, T) with respect to T (reference utils.iplanck_T)."""
	return h*f/(k*np.log(1 + 2*h*f**3/(I*c**2)))

def noise_flux_factor(beam_area, freq, T0=T_cmb):
	"""K sqrt(sr) white noise -> Jy uncertainty factor (reference
	utils.noise_flux_factor)."""
	sq_area = beam_area/2
	return dplanck(freq, T0)*sq_area**0.5*1e26

def gnfw(x, xc, alpha, beta, gamma):
	"""Generalized NFW profile (reference utils.gnfw)."""
	x = np.asarray(x, float)
	return (x/xc)**gamma*(1 + (x/xc)**alpha)**((beta - gamma)/alpha)

def tsz_profile_los_exact(x, xc=0.497, alpha=1.0, beta=-4.65, gamma=-0.3,
		zmax=1e5, _a=8):
	"""Slow but exact line-of-sight integral of the gNFW pressure profile
	via quadrature (reference utils.tsz_profile_los_exact)."""
	from scipy import integrate
	x = np.atleast_1d(np.asarray(x, float))
	res = np.empty(x.shape)
	for i, xi in enumerate(x.reshape(-1)):
		# substitute z = sinh(a u)/a to concentrate samples near z=0
		def integrand(u):
			z = np.sinh(_a*u)/_a
			r = np.sqrt(xi**2 + z**2)
			return gnfw(r, xc, alpha, beta, gamma)*np.cosh(_a*u)
		umax = np.arcsinh(zmax*_a)/_a
		val, _ = integrate.quad(integrand, 0, umax, limit=200)
		res.reshape(-1)[i] = 2*val
	return res.reshape(np.shape(x)) if np.ndim(x) else res[0]

def tsz_tform(r200=1*arcmin, l=None, lmax=40000, xc=0.497, alpha=1.0,
		beta=4.65, gamma=-0.3, zmax=1e5):
	"""Harmonic coefficients b(l) of the tSZ gNFW profile with angular R200
	size r200, via a fast Hankel transform (reference utils.tsz_tform;
	note our tsz_profile_raw uses (1+(x/xc)^a)^-beta with beta=+4.65)."""
	from scipy import interpolate
	lvals, bvals = profile_to_tform_hankel(lambda r: tsz_profile_los(
		r/r200, xc=xc, alpha=alpha, beta=beta, gamma=gamma, zmax=zmax))
	if l is None: l = np.arange(lmax+1)
	bout = interpolate.interp1d(np.log(lvals), bvals, "cubic")(
		np.log(np.maximum(l, np.min(lvals))))
	return bout

def is_int_valued(a):
	a = np.asarray(a)
	return np.all(a == np.floor(a))

def build_legendre(x, nmax):
	"""Legendre polynomial basis P_i(x') for x rescaled to [-1,1]
	(reference utils.build_legendre)."""
	x = np.asarray(x, float)
	if x.size > 1:
		x = (x - x.min())/(x.max() - x.min())*2 - 1
	res = np.empty((nmax,) + x.shape)
	if nmax > 0: res[0] = 1
	if nmax > 1: res[1] = x
	for i in range(2, nmax):
		res[i] = ((2*i - 1)*x*res[i-1] - (i - 1)*res[i-2])/i
	return res

def build_cossin(x, nmax):
	"""[sin(x),cos(x),sin(2x),cos(2x),...] basis (reference utils.build_cossin)."""
	x = np.asarray(x, float)
	res = np.empty((nmax,) + x.shape)
	for i in range(nmax):
		k = i//2 + 1
		res[i] = np.sin(k*x) if i % 2 == 0 else np.cos(k*x)
	return res

def uvec(n, i, dtype=np.float64):
	res = np.zeros(n, dtype)
	res[i] = 1
	return res

def ubash(Afun, n, idtype=np.float64, odtype=None):
	"""Matrix representation of a linear operator by unit-vector bashing
	(reference utils.ubash)."""
	cols = []
	for i in range(n):
		cols.append(np.asarray(Afun(uvec(n, i, idtype))))
	A = np.stack(cols, -1)
	return A.astype(odtype) if odtype is not None else A

def matvec(A, x):
	return np.einsum("...ab,...b->...a", A, x)

def build_conditional(ps, inds, axes=[0, 1]):
	"""Conditional-Gaussian matrices (A, cov) given known indices
	(reference utils.build_conditional)."""
	ps = np.asarray(ps)
	C = partial_flatten(ps, axes)
	known = np.zeros(C.shape[1], bool)
	known[inds] = True
	unknown = ~known
	def safe_inv(M):
		good = ~np.all(np.einsum("aii->ai", M) == 0, -1)
		res = np.zeros_like(M)
		if good.any(): res[good] = np.linalg.inv(M[good])
		return res
	Ci = safe_inv(C)
	Ciuk = Ci[:, unknown][:, :, known]
	Ciuu = Ci[:, unknown][:, :, unknown]
	Ciuui = safe_inv(Ciuu)
	A = -np.matmul(Ciuui, Ciuk)
	return A, Ciuui

def load_ascii_table(fname, desc, sep=None, dsep=None):
	"""Load a heterogeneous ascii table given 'name:typechar' descs
	(reference utils.load_ascii_table)."""
	fields = desc.split(dsep)
	names, typs, keep = [], [], []
	for i, f in enumerate(fields):
		if f == "|": continue
		name, typ = f.split(":")
		names.append(name); typs.append(typ); keep.append(i)
	rows = []
	for line in lines(fname):
		line = line.strip()
		if not line or line.startswith("#"): continue
		toks = line.split(sep)
		rows.append(tuple(toks[i] for i in keep))
	dtype = [(n, t) for n, t in zip(names, typs)]
	return np.array(rows, dtype=dtype).view(np.recarray)

def count_variable_basis(bases):
	"""Iterate digit vectors of a variable-basis counter (reference
	utils.count_variable_basis)."""
	n = len(bases)
	cur = [0]*n
	while True:
		yield list(cur)
		i = n - 1
		while i >= 0:
			cur[i] += 1
			if cur[i] < bases[i]: break
			cur[i] = 0
			i -= 1
		else:
			return

def list_combination_iter(ilist):
	"""Every combination of one value from each list (reference
	utils.list_combination_iter)."""
	for digits in count_variable_basis([len(l) for l in ilist]):
		yield [l[d] for l, d in zip(ilist, digits)]

def split_slice_simple(sel, ndims):
	"""Split a slice tuple into per-group tuples of the given lengths
	(reference utils.split_slice_simple)."""
	res = []
	i = 0
	for n in ndims:
		res.append(tuple(sel[i:i+n]))
		i += n
	return res

def slice_downgrade(d, s, axis=-1):
	"""Slice, interpreting the step as block-averaging (reference
	utils.slice_downgrade)."""
	d = np.moveaxis(np.asarray(d), axis, 0)
	start = s.start or 0
	stop = s.stop if s.stop is not None else d.shape[0]
	step = s.step or 1
	d = d[start:stop]
	if step > 1:
		nb = d.shape[0]//step
		d = d[:nb*step].reshape((nb, step) + d.shape[1:]).mean(1)
	return np.moveaxis(d, 0, axis)

def unflatten_slice(sel, shape):
	"""Unflattened slice tuple equivalent to flat slice sel (reference
	utils.unflatten_slice)."""
	inds = np.arange(int(np.prod(shape)))[sel]
	return np.unravel_index(inds, shape)

def outer_stack(arrays):
	"""Stack broadcasted outer product coordinates (reference
	utils.outer_stack)."""
	mesh = np.meshgrid(*arrays, indexing="ij")
	return np.stack(mesh, 0)

def tform_to_profile(bl, theta, normalize=False):
	"""Evaluate the real-space profile of a harmonic transform b(l)
	(reference utils.tform_to_profile)."""
	from .curvedsky import harm2profile
	br = harm2profile(np.asarray(bl, float), theta)
	if normalize: br = br/br[0] if br[0] != 0 else br
	return br

beam_transform_to_profile = tform_to_profile

def fix_dtype_mpi4py(dtype):
	return native_dtype(dtype)

def native_dtype(dtype):
	"""Native-endian version of dtype (reference utils.native_dtype)."""
	dtype = np.dtype(dtype)
	return dtype.newbyteorder("=") if dtype.byteorder not in "=|" else dtype

def decode_array_if_necessary(arr):
	arr = np.asarray(arr)
	if arr.dtype.kind == "S":
		return np.char.decode(arr)
	return arr

def encode_array_if_necessary(arr):
	arr = np.asarray(arr)
	if arr.dtype.kind == "U":
		return np.char.encode(arr)
	return arr

def chararray_slice(a, sel):
	return np.array([s[sel] for s in np.asarray(a).tolist()])

def to_sexa(x):
	"""(sign, deg, min, sec) of decimal degrees (reference utils.to_sexa)."""
	sign = int(np.sign(x)) or 1
	x = abs(x)
	deg = int(x)
	rem = (x - deg)*60
	min_ = int(rem)
	sec = (rem - min_)*60
	return sign, deg, min_, sec

def from_sexa(sign, deg, min, sec):
	return sign*(deg + min/60 + sec/3600)

def format_sexa(x, fmt="%(deg)+03d:%(min)02d:%(sec)06.2f"):
	sign, deg, min_, sec = to_sexa(x)
	return fmt % {"deg": sign*deg, "min": min_, "sec": sec}

def jname(ra, dec, fmt="J%(ra_H)02d%(ra_M)02d%(ra_S)02d%(dec_d)+02d%(dec_m)02d%(dec_s)02d", tag=None, sep=" "):
	"""Systematic Jhhmmss+ddmmss object names (reference utils.jname)."""
	ra = np.degrees(ra) if np.max(np.abs(ra)) <= 2*np.pi else ra
	dec = np.degrees(dec) if np.max(np.abs(dec)) <= np.pi/2 + 0.01 else dec
	def one(r, d):
		r = r % 360
		sh, H, M, S = to_sexa(r/15)
		sd, dd, dm, ds = to_sexa(d)
		name = fmt % {"ra_H": H, "ra_M": M, "ra_S": int(S),
			"dec_d": sd*dd, "dec_m": dm, "dec_s": int(ds)}
		return tag + sep + name if tag else name
	if np.ndim(ra) == 0: return one(ra, dec)
	return np.array([one(r, d) for r, d in zip(np.atleast_1d(ra), np.atleast_1d(dec))])

def ang2chord(ang):
	"""Angle between points on a circle -> chord length (reference
	utils.ang2chord)."""
	return 2*np.sin(np.asarray(ang)/2)

def chord2ang(chord):
	return 2*np.arcsin(np.asarray(chord)/2)

def ascomplex(arr):
	arr = np.asarray(arr)
	return arr.astype(np.result_type(arr.dtype, np.complex64))

def astuple(num_or_list):
	try: return tuple(num_or_list)
	except TypeError: return (num_or_list,)

def default_M(x): return np.asarray(x).copy()
def default_dot(a, b):
	a = np.asarray(a); b = np.asarray(b)
	return float(a.reshape(-1).conj() @ b.reshape(-1)).real if np.iscomplexobj(a) \
		else float(a.reshape(-1) @ b.reshape(-1))

def without_inds(a, inds):
	if inds is None: return tuple(a)
	inds = set(np.atleast_1d(inds).tolist())
	return tuple(v for i, v in enumerate(a) if i not in inds)

def only_inds(a, inds):
	return tuple(a[i] for i in np.atleast_1d(inds))

def can_import(name):
	try:
		__import__(name)
		return True
	except ImportError:
		return False

def glob(desc, sort=True):
	"""glob without nullglob: non-patterns pass through (reference utils.glob)."""
	import glob as globlib
	res = globlib.glob(desc)
	if not res and not any(c in desc for c in "*?["):
		res = [desc]
	return sorted(res) if sort else res

def globlist(fnames):
	res = []
	for fname in np.atleast_1d(fnames):
		res.extend(glob(fname))
	return res

def cache_get(cache, key, op):
	if cache is None: return op()
	if key not in cache: cache[key] = op()
	return cache[key]

def replace(istr, ipat, repl):
	"""str.replace that requires the pattern to be present (reference
	utils.replace)."""
	if ipat not in istr: raise ValueError("Pattern '%s' not found in '%s'" % (ipat, istr))
	return istr.replace(ipat, repl)

def regreplace(istr, ipat, repl, count=0, flags=0):
	res, n = re.subn(ipat, repl, istr, count=count, flags=flags)
	if n == 0: raise ValueError("Pattern '%s' not found in '%s'" % (ipat, istr))
	return res

def primes(n):
	"""Prime factorization of n (reference utils.primes)."""
	res = []
	d = 2
	while d*d <= n:
		while n % d == 0:
			res.append(d)
			n //= d
		d += 1
	if n > 1: res.append(n)
	return res

def res2nside(res):
	return int(np.round((4*np.pi/12)**0.5/res))

def nside2res(nside):
	return (4*np.pi/12)**0.5/nside

def split_esc(string, delim, esc="\\"):
	"""Split by delim except when escaped (reference utils.split_esc)."""
	cur = ""
	i = 0
	while i < len(string):
		ch = string[i]
		if ch == esc and i + 1 < len(string):
			cur += string[i+1]
			i += 2
			continue
		if ch == delim:
			yield cur
			cur = ""
		else:
			cur += ch
		i += 1
	yield cur

def getenv(name, default=None):
	return os.environ.get(name, default)

def setenv(name, value, keep=False):
	if keep and name in os.environ: return
	if value is None:
		os.environ.pop(name, None)
	else:
		os.environ[name] = str(value)

def getaddr(a):
	return np.asarray(a).__array_interface__["data"][0]

def iscontig(a, naxes=None):
	a = np.asarray(a)
	if naxes is None: return a.flags["C_CONTIGUOUS"]
	expect = a.itemsize
	for i in range(a.ndim-1, a.ndim-1-naxes, -1):
		if a.shape[i] > 1 and a.strides[i] != expect: return False
		expect *= a.shape[i]
	return True

def zip2(*args):
	"""zip that advances all iterators every round (reference utils.zip2)."""
	iters = [iter(a) for a in args]
	while True:
		row = []
		stopped = False
		for it in iters:
			try: row.append(next(it))
			except StopIteration: stopped = True
		if stopped: return
		yield tuple(row)

def call_help(fun, *args, **kwargs):
	"""Call fun with positional/keyword args, dropping trailing Nones
	(reference utils.call_help)."""
	return fun(*args, **kwargs)

def arg_help(arg):
	return arg

def dicedist(N, D):
	"""Distribution of the sum of N D-sided dice (reference utils.dicedist)."""
	dist = np.full(D, 1.0/D)
	return distpow(dist, N)

def distpow(dist, N):
	"""N-fold self-convolution of a discrete distribution (reference
	utils.distpow)."""
	dist = np.asarray(dist, float)
	res = np.array([1.0])
	work = dist
	n = N
	while n:
		if n & 1: res = np.convolve(res, work)
		work = np.convolve(work, work)
		n >>= 1
	return res

def airy(x):
	"""Dimensionless Airy beam, peak-normalized (reference utils.airy)."""
	from scipy import special
	x = np.asarray(x, float)
	with np.errstate(divide="ignore", invalid="ignore"):
		res = (2*special.j1(np.pi*x)/(np.pi*x))**2
	return np.where(x == 0, 1.0, res)

def lairy(x):
	"""Harmonic-space Airy beam (autocorrelation of a uniform disk aperture)
	(reference utils.lairy)."""
	x = np.clip(np.asarray(x, float), 0, 1)
	return 2/np.pi*(np.arccos(x) - x*np.sqrt(1 - x**2))

def airy_lmax(D, lam):
	return 2*np.pi*D/lam

def airy_res(D, lam):
	"""Airy FWHM-ish resolution (first-zero based)."""
	return 1.2196699*lam/D

def airy_area(D, lam):
	"""Airy beam area in steradians (reference utils.airy_area)."""
	return (2*lam/D)**2/np.pi

def disk_overlap(d, R):
	"""Overlap area of two disks radius R, centers d apart (reference
	utils.disk_overlap)."""
	x = np.clip(np.asarray(d, float)/(2*R), 0, 1)
	return (np.arccos(x) - x*(1 - x**2)**0.5)*(2*R**2)

def disk_overlap_curved(d, R, tol_flat=1e-4, tol_tiny=1e-10):
	"""Solid angle of overlap of two spherical caps of radius R with centers
	d apart (reference utils.disk_overlap_curved)."""
	d = np.asarray(d, float)
	d = np.clip(d, tol_tiny, 2*R)
	if R < tol_flat:
		return disk_overlap(d, R)
	return _disk_overlap_curved_num(d, R)

def _disk_overlap_curved_num(d, R, n=2048):
	"""Numerical solid angle of spherical-cap overlap."""
	d = np.atleast_1d(np.asarray(d, float))
	th = np.linspace(0, R, n)[None]
	res = np.empty(d.shape)
	for i, di in enumerate(d.reshape(-1)):
		t = th[0]
		# azimuthal half-width of the second cap boundary at colat t from cap 1
		ct, cd2, cR = np.cos(t), np.cos(di), np.cos(R)
		st, sd = np.sin(t), np.sin(di)
		arg = (cR - ct*cd2)/np.maximum(st*sd, 1e-300)
		phi = np.where(arg >= 1, 0, np.where(arg <= -1, np.pi, np.arccos(np.clip(arg, -1, 1))))
		res.reshape(-1)[i] = 2*np.trapezoid(phi*st, t) if hasattr(np, "trapezoid") \
			else 2*np.trapz(phi*st, t)
	return res.reshape(d.shape) if d.ndim else float(res)

def freq2ind(freq, dur):
	return np.asarray(freq)*dur

def ind2freq(ind, dur):
	return np.asarray(ind)/dur

def firstin(ref, alts):
	for a in alts:
		if a in ref: return a
	return None

def getrec(struct_arr, potential_colnames):
	for name in potential_colnames:
		if name in struct_arr.dtype.names:
			return struct_arr[name]
	raise KeyError("None of %s found" % str(potential_colnames))

def ndigit(num):
	"""Number of digits in a non-negative number (reference utils.ndigit)."""
	num = np.asarray(num)
	return np.maximum(np.floor(np.log10(np.maximum(num, 1))).astype(int) + 1, 1)

def afmt(arr, fmt=None, ffmt=None, ifmt=None, nmax=None, nedge=None):
	"""Array formatting shortcut over np.array2string (reference utils.afmt)."""
	arr = np.asarray(arr)
	formatter = {}
	if fmt is not None:
		formatter["all"] = lambda x: fmt % x
	if ffmt is not None:
		formatter["float_kind"] = lambda x: ffmt % x
	if ifmt is not None:
		formatter["int_kind"] = lambda x: ifmt % x
	kw = {}
	if nmax is not None: kw["threshold"] = nmax
	if nedge is not None: kw["edgeitems"] = nedge
	return np.array2string(arr, formatter=formatter or None, **kw)

def aprint(arr, **kwargs):
	print(afmt(arr, **kwargs))

def contains_any(a, bs):
	return any(b in a for b in bs)

def format_to_glob(format):
	"""Glob pattern matching a printf format's outputs (reference
	utils.format_to_glob)."""
	return re.sub(r"%[^a-zA-Z%]*[a-zA-Z]", "*", format).replace("%%", "%")

def format_to_regex(format):
	"""Regex matching a printf format's outputs (reference
	utils.format_to_regex)."""
	res = ""
	i = 0
	spec = re.compile(r"%([^a-zA-Z%]*)([a-zA-Z%])")
	while i < len(format):
		m = spec.match(format, i)
		if m:
			t = m.group(2)
			if t == "%": res += "%"
			elif t in "diu": res += r"[+-]?\d+"
			elif t in "feEgG": res += r"[+-]?[\d.eE+-]+"
			elif t == "s": res += r".*?"
			else: res += r".*?"
			i = m.end()
		else:
			res += re.escape(format[i])
			i += 1
	return res


def find(array, vals, default=None, sorted=False):
	"""Indices of each val in array; error or default when missing
	(reference utils.find)."""
	vals = np.asarray(vals)
	if vals.size == 0: return np.zeros(0, int)
	array = np.asarray(array)
	if sorted:
		res = np.minimum(np.searchsorted(array, vals), len(array)-1)
	else:
		order = np.argsort(array)
		cands = np.minimum(np.searchsorted(array, vals, sorter=order), len(array)-1)
		res = order[cands]
	bad = array[res] != vals
	if np.any(bad):
		if default is None: raise ValueError("Value not found in array")
		res = np.where(bad, default, res)
	return res

def rm(fname):
	"""Remove a file if it exists (reference utils.rm)."""
	try: os.remove(fname)
	except FileNotFoundError: pass

def broadcast_shape(*shapes, at=0):
	"""Broadcast shapes, adding new axes at position 'at' (reference
	utils.broadcast_shape)."""
	ndim = max(len(s) for s in shapes)
	oshape = [1]*ndim
	for shape in shapes:
		my_at = at if at >= 0 else len(shape) + 1 + at
		padded = tuple(shape[:my_at]) + (1,)*(ndim - len(shape)) + tuple(shape[my_at:])
		for i in range(ndim):
			if oshape[i] != padded[i] and padded[i] != 1:
				if oshape[i] == 1: oshape[i] = padded[i]
				else: raise ValueError("operands could not be broadcast together "
					"with shapes " + " ".join(str(s) for s in shapes))
	return tuple(oshape)

def broadcast_arrays(*arrays, npre=0, npost=0, at=0):
	"""np.broadcast_arrays with None passthrough and exempt pre/post dims
	(reference utils.broadcast_arrays)."""
	npre = np.broadcast_to(npre, len(arrays))
	npost = np.broadcast_to(npost, len(arrays))
	arrays = list(arrays)
	wshapes = []
	for i, a in enumerate(arrays):
		if a is None: continue
		arrays[i] = np.asanyarray(a)
		wshapes.append(arrays[i].shape[npre[i]:arrays[i].ndim - npost[i]])
	oshape = broadcast_shape(*wshapes, at=at) if wshapes else ()
	res = []
	for i, a in enumerate(arrays):
		if a is None:
			res.append(None)
			continue
		pre = a.shape[:npre[i]]
		post = a.shape[a.ndim - npost[i]:] if npost[i] else ()
		mid = a.shape[npre[i]:a.ndim - npost[i]]
		my_at = at if at >= 0 else len(mid) + 1 + at
		padded = mid[:my_at] + (1,)*(len(oshape) - len(mid)) + mid[my_at:]
		res.append(np.broadcast_to(a.reshape(pre + padded + post),
			pre + oshape + post))
	return res

def point_in_polygon(points, polys):
	"""Even-odd point-in-polygon test (reference utils.point_in_polygon)."""
	points = np.asarray(points) + 0.0
	polys = np.asarray(polys) + 0.0
	verts = polys - points[..., None, :]
	ncross = np.zeros(np.broadcast_shapes(verts.shape[:-2], ()), np.int32)
	nv = verts.shape[-2]
	for i in range(nv):
		x1 = verts[..., i-1, 0]; y1 = verts[..., i-1, 1]
		x2 = verts[..., i, 0];   y2 = verts[..., i, 1]
		with nowarn():
			xc = x1 - y1*(x2 - x1)/(y2 - y1)
		ncross = ncross + ((y1*y2 < 0) & (xc > 0))
	return ncross % 2 == 1

def poly_edge_dist(points, polygons):
	"""Angular distance of points from polygon edges on the sphere
	(reference utils.poly_edge_dist)."""
	points = np.asarray(points); polygons = np.asarray(polygons)
	nvert = polygons.shape[-2]
	p = ang2rect(points, axis=-1)
	verts = ang2rect(polygons, axis=-1)
	dists = []
	for i in range(nvert):
		v1 = verts[..., i, :]
		v2 = verts[..., (i+1) % nvert, :]
		vz = np.cross(v1, v2)
		vz = vz/np.maximum(np.linalg.norm(vz, axis=-1)[..., None], 1e-300)
		vy = np.cross(vz, v1)
		vy = vy/np.maximum(np.linalg.norm(vy, axis=-1)[..., None], 1e-300)
		# angle of the point along the edge great circle, and edge extent
		pang = np.arctan2(np.sum(p*vy, -1), np.sum(p*v1, -1))
		eang = np.arctan2(np.sum(v2*vy, -1), np.sum(v2*v1, -1))
		inside = (pang >= 0) & (pang <= eang)
		# distance to the great circle vs to the nearest endpoint
		dcirc = np.abs(np.arcsin(np.clip(np.sum(p*vz, -1), -1, 1)))
		d1 = np.arccos(np.clip(np.sum(p*v1, -1), -1, 1))
		d2 = np.arccos(np.clip(np.sum(p*v2, -1), -1, 1))
		dists.append(np.where(inside, dcirc, np.minimum(d1, d2)))
	return np.min(dists, 0)

def send(a, comm, dest=0, tag=0):
	"""Pickling-free numpy send (reference utils.send)."""
	a = np.ascontiguousarray(a)
	comm.send((a.shape, a.dtype.str), dest=dest, tag=tag)
	comm.Send(a, dest=dest, tag=tag)

def recv(comm, source=0, tag=0):
	shape, dtype = comm.recv(source=source, tag=tag)
	res = np.empty(shape, dtype)
	comm.Recv(res, source=source, tag=tag)
	return res

def reduce(a, comm, root=0, op=None):
	"""MPI reduce of a numpy array (reference utils.reduce)."""
	if comm is None or getattr(comm, "size", 1) == 1: return np.asarray(a).copy()
	res = np.zeros_like(a) if comm.rank == root else None
	comm.Reduce(np.ascontiguousarray(a), res, root=root)
	return res

def redistribute(iarrs, iboxes, oboxes, comm, wrap=0):
	"""Redistribute slices of a global array between MPI tasks
	(reference utils.redistribute). Each task owns slices iboxes of the
	global array and wants the slices oboxes; data is exchanged pairwise
	using the sbox intersection machinery."""
	iarrs = [np.asanyarray(a) for a in iarrs]
	iboxes = [sbox_fix(b) for b in np.asarray(iboxes, object).tolist()] \
		if not isinstance(iboxes, list) else [sbox_fix(b) for b in iboxes]
	oboxes = [sbox_fix(b) for b in oboxes]
	preshape = iarrs[0].shape[:-2] if iarrs else ()
	dtype = iarrs[0].dtype if iarrs else np.float64
	oarrs = [np.zeros(preshape + tuple(sbox_size(b)), dtype) for b in oboxes]
	# gather everyone's boxes
	all_iboxes = allgather([np.asarray(b).tolist() for b in iboxes], comm) \
		if comm is not None and comm.size > 1 else [[np.asarray(b).tolist() for b in iboxes]]
	if comm is None or comm.size == 1:
		for ia, ib in zip(iarrs, iboxes):
			for oa, ob in zip(oarrs, oboxes):
				isecs = sbox_intersect(np.asarray(ib)[None], np.asarray(ob)[None], wrap=wrap)[0][0]
				for isec in isecs:
					isec = np.asarray(isec)
					rel_i = sbox_div(isec, np.asarray(ib))
					rel_o = sbox_div(isec, np.asarray(ob))
					oa[sbox2slice(rel_o)] = ia[sbox2slice(rel_i)]
		return oarrs
	# general MPI path: every pair exchanges its intersections
	for r in range(comm.size):
		their_iboxes = comm.bcast([np.asarray(b).tolist() for b in iboxes], root=r)
		their_arrs = iarrs if comm.rank == r else None
		for ob_i, (oa, ob) in enumerate(zip(oarrs, oboxes)):
			for ib in their_iboxes:
				isecs = sbox_intersect(np.asarray(ib)[None], np.asarray(ob)[None], wrap=wrap)[0][0]
				for isec in isecs:
					isec = np.asarray(isec)
					rel_i = sbox_div(isec, np.asarray(ib))
					rel_o = sbox_div(isec, np.asarray(ob))
					if comm.rank == r:
						piece = None
						for ia2, ib2 in zip(iarrs, iboxes):
							if np.array_equal(np.asarray(ib2), np.asarray(ib)):
								piece = np.ascontiguousarray(ia2[sbox2slice(rel_i)])
						piece = comm.bcast(piece, root=r)
					else:
						piece = comm.bcast(None, root=r)
					oa[sbox2slice(rel_o)] = piece
	return oarrs
