"""FFT / DCT / NUFFT layer, XLA-native.

Replaces the reference's pluggable engine zoo (pixell/fft.py: numpy_FFTW,
ducc_FFTW, pyfftw, Intel-MKL) with a single XLA engine: everything lowers to
``jnp.fft`` so it fuses and runs on the TPU. DCT/DST types I-IV are built by
zero-embedding into larger FFTs (the FFTW r2r definitions). The NUFFT suite
(u2nu/nu2u, reference fft.py:436-668 over ducc0.nufft) is a JAX
gather/scatter implementation with an exponential-of-semicircle kernel.

Note on dtypes: TPUs have no complex128; complex transforms run in complex64
on TPU and complex128 on CPU when x64 is enabled.
"""
from __future__ import annotations
import functools
import numpy as np
import jax
import jax.numpy as jnp
from . import utils

# Engine interface retained for API parity; only one engine ("xla").
engines = {}
engine  = "xla"
def set_engine(name):
	global engine
	if name not in ["xla"]: raise ValueError("Only the 'xla' engine exists in pixell_tpu")
	engine = name

def nthread_fft(): return 1
def nthread_ifft(): return 1


def _norm_axes(a, axes):
	if axes is None: axes = list(range(a.ndim))
	axes = [ax % a.ndim for ax in np.atleast_1d(axes)]
	return tuple(axes)

def fft(tod, ft=None, nthread=0, axes=(-1,), flags=None, normalize=False):
	"""Complex FFT along the given axes (reference fft.fft:133). Unlike numpy,
	the default is unnormalized in both directions (FFTW convention)."""
	a = jnp.asarray(tod)
	if a.dtype.kind != 'c': a = a.astype(utils.complex_dtype(a.dtype))
	res = jnp.fft.fftn(a, axes=_norm_axes(a, axes))
	if normalize: res = res/np.prod([a.shape[ax] for ax in _norm_axes(a, axes)])
	return res

def ifft(tod, ft=None, nthread=0, axes=(-1,), flags=None, normalize=False):
	"""Inverse complex FFT, unnormalized by default (multiply-by-N convention
	of FFTW: ifft(fft(x)) = N*x unless normalize=True)."""
	a = jnp.asarray(tod)
	if a.dtype.kind != 'c': a = a.astype(utils.complex_dtype(a.dtype))
	axs = _norm_axes(a, axes)
	res = jnp.fft.ifftn(a, axes=axs)
	if not normalize: res = res*np.prod([a.shape[ax] for ax in axs])
	return res

def rfft(tod, ft=None, nthread=0, axes=(-1,), flags=None, normalize=False):
	"""Real-to-complex FFT over the last of the given axes (complex over the
	rest) (reference fft.rfft:186)."""
	a = jnp.asarray(tod)
	axs = _norm_axes(a, axes)
	res = jnp.fft.rfftn(a.real if a.dtype.kind == 'c' else a, axes=axs)
	if normalize: res = res/np.prod([a.shape[ax] for ax in axs])
	return res

def irfft(ft, tod=None, n=None, nthread=0, axes=(-1,), flags=None, normalize=False):
	"""Complex-to-real inverse FFT. n (or tod's shape) gives the real length
	of the last transformed axis."""
	a = jnp.asarray(ft)
	axs = _norm_axes(a, axes)
	if n is None and tod is not None: n = tod.shape[axs[-1]]
	if n is None: n = 2*(a.shape[axs[-1]]-1)
	s = [a.shape[ax] for ax in axs[:-1]] + [n]
	res = jnp.fft.irfftn(a, s=s, axes=axs)
	if not normalize: res = res*np.prod(s)
	return res

def redft00(a, b=None, nthread=0, normalize=False, flags=None):
	"""DCT-I (reference fft.redft00:290)."""
	return dct(a, type="DCT-I", axes=(-1,), normalize=normalize)

def chebt(a, b=None, nthread=0):
	"""Chebyshev coefficients of samples at Chebyshev nodes, via DCT-I."""
	n = a.shape[-1]
	res = redft00(a)/(n-1)
	return _scale_ends(res, 0.5)

def ichebt(a, b=None, nthread=0):
	a = _scale_ends(jnp.asarray(a), 2.0)
	return redft00(a)*0.5

def _scale_ends(a, fac):
	a = jnp.asarray(a)
	return a.at[..., 0].mul(fac).at[..., -1].mul(fac)


# ---------------------------------------------------------------------------
# DCT/DST of all 8 types via zero-embedded FFTs (FFTW r2r definitions,
# reference fft.py:211-289). Unnormalized, like FFTW.
# ---------------------------------------------------------------------------
_dct_names = {
	"dct-i": "redft00", "dct-ii": "redft10", "dct-iii": "redft01", "dct-iv": "redft11",
	"dst-i": "rodft00", "dst-ii": "rodft10", "dst-iii": "rodft01", "dst-iv": "rodft11",
	"cos": "redft10", "sin": "rodft10",
}
def _canon_type(type):
	t = str(type).lower()
	if t in _dct_names: return _dct_names[t]
	return t

def _dct1d(x, kind):
	"""Unnormalized FFTW-style r2r transform along the last axis."""
	n = x.shape[-1]
	if kind == "redft00":
		if n < 2: return 2.0*x
		y = jnp.concatenate([x, x[..., -2:0:-1]], -1)       # length 2(n-1)
		return jnp.fft.fft(y)[..., :n].real
	elif kind == "redft10":
		z = jnp.zeros(x.shape[:-1] + (4*n,), x.dtype)
		z = z.at[..., 1:2*n:2].set(x)
		return 2*jnp.fft.fft(z)[..., :n].real
	elif kind == "redft01":
		z = jnp.zeros(x.shape[:-1] + (4*n,), x.dtype)
		z = z.at[..., :n].set(x)
		return 2*jnp.fft.fft(z)[..., 1:2*n:2].real - x[..., :1]
	elif kind == "redft11":
		z = jnp.zeros(x.shape[:-1] + (8*n,), x.dtype)
		z = z.at[..., 1:2*n:2].set(x)
		return 2*jnp.fft.fft(z)[..., 1:2*n:2].real
	elif kind == "rodft00":
		z = jnp.zeros(x.shape[:-1] + (2*(n+1),), x.dtype)
		z = z.at[..., 1:n+1].set(x)
		return -2*jnp.fft.fft(z)[..., 1:n+1].imag
	elif kind == "rodft10":
		z = jnp.zeros(x.shape[:-1] + (4*n,), x.dtype)
		z = z.at[..., 1:2*n:2].set(x)
		return -2*jnp.fft.fft(z)[..., 1:n+1].imag
	elif kind == "rodft01":
		z = jnp.zeros(x.shape[:-1] + (4*n,), x.dtype)
		z = z.at[..., 1:n+1].set(x)
		return -2*jnp.fft.fft(z)[..., 1:2*n:2].imag - x[..., -1:]*jnp.where(
			jnp.arange(n) % 2 == 0, -1.0, 1.0).astype(x.dtype)*(-1)
	elif kind == "rodft11":
		z = jnp.zeros(x.shape[:-1] + (8*n,), x.dtype)
		z = z.at[..., 1:2*n:2].set(x)
		return -2*jnp.fft.fft(z)[..., 1:2*n:2].imag
	else:
		raise ValueError("Unknown r2r kind '%s'" % kind)

_inverse_kind = {"redft00": "redft00", "redft10": "redft01", "redft01": "redft10",
	"redft11": "redft11", "rodft00": "rodft00", "rodft10": "rodft01",
	"rodft01": "rodft10", "rodft11": "rodft11"}
def _logical_size(kind, n):
	if kind in ["redft00"]: return 2*(n-1)
	if kind in ["rodft00"]: return 2*(n+1)
	return 2*n

def dct(a, b=None, nthread=0, type="DCT-I", axes=(-2, -1), normalize=False, flags=None):
	"""Multi-dimensional DCT/DST of the given type (reference fft.dct:211).
	Unnormalized like FFTW unless normalize=True (which makes it orthogonal-ish
	by dividing by the logical transform size)."""
	x = jnp.asarray(a)
	if x.dtype.kind == 'c': x = x.real
	kind = _canon_type(type)
	axs = _norm_axes(x, axes)
	norm = 1.0
	for ax in axs:
		x = jnp.moveaxis(x, ax, -1)
		x = _dct1d(x, kind)
		x = jnp.moveaxis(x, -1, ax)
		norm *= _logical_size(kind, x.shape[ax])
	if normalize: x = x/norm
	return x

def idct(a, b=None, nthread=0, type="DCT-I", axes=(-2, -1), normalize=False, flags=None):
	"""Inverse DCT/DST: the FFTW inverse kind, unnormalized (idct(dct(x)) =
	prod(logical sizes)*x) unless normalize=True."""
	x = jnp.asarray(a)
	if x.dtype.kind == 'c': x = x.real
	kind = _inverse_kind[_canon_type(type)]
	axs = _norm_axes(x, axes)
	norm = 1.0
	for ax in axs:
		x = jnp.moveaxis(x, ax, -1)
		x = _dct1d(x, kind)
		x = jnp.moveaxis(x, -1, ax)
		norm *= _logical_size(kind, x.shape[ax])
	if normalize: x = x/norm
	return x

def dst(a, b=None, nthread=0, type="DST-I", axes=(-2, -1), normalize=False, flags=None):
	return dct(a, b, nthread=nthread, type=type, axes=axes, normalize=normalize)
def idst(a, b=None, nthread=0, type="DST-I", axes=(-2, -1), normalize=False, flags=None):
	return idct(a, b, nthread=nthread, type=type, axes=axes, normalize=normalize)


# ---------------------------------------------------------------------------
# Size and frequency helpers (reference fft.py:319-349)
# ---------------------------------------------------------------------------
def fft_len(n, direction="below", factors=None):
	"""Closest fast FFT size to n (products of 2,3,5,7)."""
	if factors is None: factors = [2, 3, 5, 7]
	def ok(m):
		for f in factors:
			while m % f == 0: m //= f
		return m == 1
	m = int(n)
	step = -1 if direction == "below" else 1
	while m > 1 and not ok(m): m += step
	return max(m, 1)

def fftfreq(n, d=1.0): return np.fft.fftfreq(n, d)
def rfftfreq(n, d=1.0): return np.fft.rfftfreq(n, d)

def ind2freq(n, i, d=1.0):
	"""Fourier bin index -> frequency, with wrapping above the Nyquist."""
	i = np.asanyarray(i)
	return ((i + n//2) % n - n//2)/(d*n)

def freq2ind(n, f, d=1.0):
	f = np.asanyarray(f)
	return (f*d*n) % n

def shift(a, shift, axes=None, nofft=False, deriv=None):
	"""Shift the array a by a (possibly fractional) number of pixels along
	axes using Fourier shifting (reference fft.shift:350). deriv: take the
	derivative along the given axis index (into axes) instead."""
	a = jnp.asarray(a)
	ca = a if nofft else fft(a, axes=axes if axes is not None else tuple(range(a.ndim)))
	if axes is None: axes = list(range(a.ndim))
	axes = [ax % a.ndim for ax in np.atleast_1d(axes)]
	shifts = np.zeros(len(axes)) + np.asarray(shift)
	for i, ax in enumerate(axes):
		n = a.shape[ax]
		f = jnp.asarray(np.fft.fftfreq(n))
		phase = jnp.exp(-2j*np.pi*f*shifts[i])
		if deriv is not None and deriv == i:
			phase = phase*(2j*np.pi*f)
		sl = [None]*ca.ndim; sl[ax] = slice(None)
		ca = ca*phase[tuple(sl)]
	if nofft: return ca
	res = ifft(ca, axes=axes, normalize=True)
	return res.real if a.dtype.kind != 'c' else res

def resample(fa, n, axes=(-1,), norm=True):
	"""Fourier-space resample: truncate/zero-pad the spectrum fa to produce
	new sample count(s) n along the given axes."""
	fa = jnp.asarray(fa)
	naxes = tuple(int(ax) % fa.ndim for ax in np.atleast_1d(axes))
	ns = tuple((np.zeros(len(naxes), int) + np.asarray(n)).tolist())
	return _resample_jit(fa, ns, naxes)

@functools.partial(jax.jit, static_argnames=("ns", "axes"))
def _resample_jit(fa, ns, axes):
	for ax, n_new in zip(axes, ns):
		n_old = fa.shape[ax]
		n_new = int(n_new)
		fa = jnp.moveaxis(fa, ax, -1)
		nh_old, nh_new = n_old//2, n_new//2
		if n_new < n_old:
			keep_lo = (n_new+1)//2
			fa2 = jnp.concatenate([fa[..., :keep_lo], fa[..., n_old-nh_new:]], -1)
			if n_new % 2 == 0:
				# new Nyquist bin must absorb both +-n_new/2 of the old spectrum
				fa2 = fa2.at[..., keep_lo].add(fa[..., nh_new])
			fa = fa2
		elif n_new > n_old:
			keep_lo = (n_old+1)//2
			if n_old % 2 == 0:
				# split the old Nyquist bin symmetrically between +-n_old/2,
				# built as ONE concat (the .at[].set updates each cost a full
				# array pass on TPU; this path sits in the hot theta-upsample)
				nyq = fa[..., nh_old:nh_old+1]/2
				fa = jnp.concatenate([fa[..., :nh_old], nyq,
					utils.czeros(fa.shape[:-1] + (n_new - n_old - 1,), fa.dtype),
					nyq, fa[..., nh_old+1:]], -1)
			else:
				zeros = utils.czeros(fa.shape[:-1] + (n_new-n_old,), fa.dtype)
				fa = jnp.concatenate([fa[..., :keep_lo], zeros,
					fa[..., keep_lo:]], -1)
		fa = jnp.moveaxis(fa, -1, ax)
	return fa

def resample_fft(d, n, axes=(-1,)):
	"""Resample real/complex samples d to n points along axes via FFT."""
	d = jnp.asarray(d)
	axes = [ax % d.ndim for ax in np.atleast_1d(axes)]
	ns = np.zeros(len(axes), int) + np.asarray(n)
	fd = fft(d, axes=tuple(axes))
	fd = resample(fd, ns, axes=tuple(axes))
	norm = np.prod([fd.shape[ax] for ax in axes])/np.prod([d.shape[ax] for ax in axes])
	res = ifft(fd, axes=tuple(axes), normalize=True)*norm
	return res.real if d.dtype.kind != 'c' else res


# ---------------------------------------------------------------------------
# NUFFT suite (reference fft.py:436-668; ducc0.nufft there).
# JAX implementation: oversampled FFT + exponential-of-semicircle kernel.
# ---------------------------------------------------------------------------
def _es_params(epsilon, sigma=2.0):
	"""Kernel width and beta for target accuracy epsilon at oversampling sigma."""
	w = max(2, int(np.ceil(np.log10(1.0/epsilon))) + 1)
	w = min(w, 16)
	beta = 2.30*w  # standard choice for sigma=2 (Barnett et al 2019)
	return w, beta

def _es_kernel(z, beta):
	"""phi(z) = exp(beta*(sqrt(1-z^2)-1)) for |z|<=1 else 0."""
	z2 = jnp.clip(z*z, 0, 1)
	return jnp.where(jnp.abs(z) <= 1, jnp.exp(beta*(jnp.sqrt(1-z2)-1)), 0.0)

def _es_correction(n, w, beta, dtype):
	"""Fourier-space grid correction 1/phi_hat for a length-n fine grid.
	Computed by quadrature of the kernel transform at each output frequency."""
	# phi_hat(k) = integral_{-1}^{1} phi(z) exp(i pi k z w / n_fine) dz * (w/2)
	# evaluate with Gauss-Legendre quadrature on [-1,1]
	# the integrand oscillates with max phase ~pi*w/2 over [-1,1]; scale the
	# quadrature order accordingly
	q = int(3*w + 24)
	x, wq = np.polynomial.legendre.leggauss(q)
	k = np.fft.fftfreq(n)*n  # integer freqs
	phi = np.exp(beta*(np.sqrt(1-x**2)-1))
	# kernel support half-width in fine-grid units is w/2
	ph = (phi*wq) @ np.cos(np.pi*np.outer(x*(w/2.), k)*2/n)
	ph *= 0.5*w  # Gauss-Legendre on z in [-1,1] with dz -> du = (w/2) dz
	return (1.0/ph).astype(dtype)

def _spread_inds_weights(pos, nfine, w, beta):
	"""For flat positions pos[npt] in fine-grid pixel units, return gather
	indices [npt,w] and weights [npt,w]."""
	i0 = jnp.floor(pos - w/2.0).astype(jnp.int32) + 1
	offs = jnp.arange(w)
	inds = i0[:, None] + offs[None, :]
	z = (pos[:, None] - inds)/(w/2.0)
	wt = _es_kernel(z, beta)
	return inds % nfine, wt

GATHER_CHUNK = 1 << 17  # points per gather block: bounds the [chunk,w,w,C]
                        # transient (~77 MB at w=7 C=3 for a real fine grid as
                        # in lensing; 2x that for complex fine grids, since
                        # u2nu casts the grid to complex) -- unchunked, a
                        # 1.4M-point lensing band materializes 17+ GB and OOMs

def _block_gather_eval(fgrid, iy0, ix0, wy, wx, nfine, w):
	"""Shared TPU-shaped kernel evaluation: ONE contiguous [w, w, C] block
	slice-gather per point instead of npt*w*w*C elementwise gathers. TPU
	gathers are descriptor-bound (~100M rows/s), so fetching each point's
	whole kernel footprint as a single gather row (contiguous in x and C
	after a components-minor transpose and a w-wide torus wrap pad) is
	~w^2*C fewer descriptors. The gather output is NOT fused into the
	weight contraction by XLA, so points are processed in GATHER_CHUNK
	blocks via lax.map to bound the transient. fgrid[C, nfy, nfx]; iy0/ix0
	[npt] int32 window starts; wy/wx [npt, w] kernel weights.
	Returns [C, npt]."""
	C = fgrid.shape[0]
	nfy, nfx = nfine
	fp = jnp.moveaxis(fgrid, 0, -1)
	fp = jnp.concatenate([fp, fp[:w]], 0)
	fp = jnp.concatenate([fp, fp[:, :w]], 1)
	starts = jnp.stack([iy0 % nfy, ix0 % nfx], -1)
	dn = jax.lax.GatherDimensionNumbers(offset_dims=(1, 2, 3),
		collapsed_slice_dims=(), start_index_map=(0, 1))
	wdt = fp.real.dtype
	def block(st, by, bx):
		vals = jax.lax.gather(fp, st, dn, slice_sizes=(w, w, C), mode="clip")
		return jnp.einsum("pyxc,py,px->pc", vals, by.astype(wdt),
			bx.astype(wdt))
	npt = iy0.shape[0]
	if npt <= GATHER_CHUNK:
		return block(starts, wy, wx).T
	nb = -(-npt//GATHER_CHUNK)
	pad = nb*GATHER_CHUNK - npt
	st = jnp.pad(starts, ((0, pad), (0, 0))).reshape(nb, GATHER_CHUNK, 2)
	by = jnp.pad(wy, ((0, pad), (0, 0))).reshape(nb, GATHER_CHUNK, w)
	bx = jnp.pad(wx, ((0, pad), (0, 0))).reshape(nb, GATHER_CHUNK, w)
	out = jax.lax.map(lambda a: block(*a), (st, by, bx))
	return out.reshape(nb*GATHER_CHUNK, C)[:npt].T

@functools.partial(jax.jit, static_argnames=("nfine", "w", "beta"))
def _u2nu_2d_core(fgrid, py, px, nfine, w, beta):
	"""fgrid[C, nfy, nfx] -> vals[C, npt] at fine-grid positions py/px."""
	nfy, nfx = nfine
	hw = w/2.0
	iy0 = jnp.floor(py - hw).astype(jnp.int32) + 1
	ix0 = jnp.floor(px - hw).astype(jnp.int32) + 1
	offs = jnp.arange(w)
	wy = _es_kernel((py[:, None] - (iy0[:, None] + offs))/hw, beta)
	wx = _es_kernel((px[:, None] - (ix0[:, None] + offs))/hw, beta)
	return _block_gather_eval(fgrid, iy0, ix0, wy, wx, nfine, w)

@functools.partial(jax.jit, static_argnames=("nfine", "w", "beta"))
def _u2nu_2d_core_split(fgrid, iyb, fy, ixb, fx, nfine, w, beta):
	"""Split-position variant: the true position is iyb + fy (int32 base +
	small float fraction/offset). A single f32 position at a large fine grid
	quantizes to ~nfy*2^-24 (~1e-3 px at lmax 3000+), capping interpolation
	accuracy; the split keeps the kernel offsets at full f32 resolution.
	fy/fx may extend a few pixels beyond [0,1) (e.g. lensing displacements
	folded into the fraction)."""
	hw = w/2.0
	ty = jnp.floor(fy - hw); tx = jnp.floor(fx - hw)
	iy0 = iyb + ty.astype(jnp.int32) + 1
	ix0 = ixb + tx.astype(jnp.int32) + 1
	offs = jnp.arange(w, dtype=fy.dtype)
	wy = _es_kernel((fy[:, None] - (ty[:, None] + 1 + offs))/hw, beta)
	wx = _es_kernel((fx[:, None] - (tx[:, None] + 1 + offs))/hw, beta)
	return _block_gather_eval(fgrid, iy0, ix0, wy, wx, nfine, w)

@functools.partial(jax.jit, static_argnames=("S", "ndx", "dxlo", "R", "w",
	"beta"))
def _u2nu_rowband_core(fine_x, E, iyb_r, pyf, pxf, sy0, S, ndx, dxlo, R, w,
		beta):
	"""Gather-free NUFFT point evaluation for ROW-STRUCTURED point sets
	(separable output grids with bounded displacements, e.g. curved lensing
	of a cylindrical patch). Point (r, c) sits at fine-grid position
	(iyb_r[r] + pyf[r, c], ixb[c] + pxf[r, c]) with |pyf|, |pxf| bounded.

	TPU rationale: the generic per-point evaluation is a [w, w, C] block
	gather per point, and TPU gathers move ~1e8 elements/s (measured; the
	2.4 s hot spot of the lensing band eval at config-4 scale). Here the
	structure removes every gather:
	  * rows: points in a chunk of R consecutive output rows touch a
	    contiguous slab of S fine rows -> ONE dynamic_slice (DMA) per chunk;
	    the y-taps become a dense ES-weight contraction over the S slab rows
	    (the kernel's compact support zeroes the others exactly).
	  * columns: the column base map c -> ixb[c] is static and monotone, so
	    it is a 0/1 expansion matrix E[c, X] -- the per-point x-access
	    becomes an MXU matmul  Y[c, s, j] = sum_X E[c, X] slab[s, X + j]
	    over the ndx static tap offsets j, followed by dense ES-weight
	    contractions in x then y.
	All sums include only exact zeros beyond each point's true w-wide
	support, so the result matches _u2nu_2d_core_split up to summation
	order (~eps).

	fine_x [C, nfy, nXs]: fine grid restricted to the band's column range
	  (nXs >= E.shape[1] + ndx - 1), REAL dtype.
	E [nx, nXe] f32: E[c, X] = 1 iff X == ixb[c] + dxlo - xr0 (xr0 = the
	  absolute fine column of fine_x[..., 0]).
	iyb_r [nrow] int32, pyf/pxf [nrow, nx]: split positions (base + bounded
	  offset; the caller folds displacements into pyf/pxf).
	sy0 [nchunk] int32: per-chunk slab row starts (host-clipped to
	  [0, nfy - S]; the caller guarantees every point's true y-support lies
	  inside its chunk's slab).
	Returns [C, nrow, nx]."""
	C, nfy, nXs = fine_x.shape
	nXe = E.shape[1]
	nrow, nx = pyf.shape
	nchunk = sy0.shape[0]
	hw = w/2.0
	rdt = pyf.dtype
	pad = nchunk*R - nrow
	iyb_p = jnp.pad(iyb_r, (0, pad), mode="edge").reshape(nchunk, R)
	pyf_p = jnp.pad(pyf, ((0, pad), (0, 0)), mode="edge").reshape(nchunk, R, nx)
	pxf_p = jnp.pad(pxf, ((0, pad), (0, 0)), mode="edge").reshape(nchunk, R, nx)
	soff = jnp.arange(S, dtype=rdt)
	joff = jnp.arange(ndx, dtype=rdt)
	def chunk(args):
		s0, iyb_c, pyc, pxc = args
		z0 = jnp.zeros((), s0.dtype)
		slab = jax.lax.dynamic_slice(fine_x, (z0, s0, z0), (C, S, nXs))
		X17 = jnp.stack([jax.lax.slice_in_dim(slab, j, j + nXe, axis=2)
			for j in range(ndx)], 2)                      # [C, S, ndx, nXe]
		# the expansion matmul: E is 0/1 so HIGHEST precision reproduces the
		# f32 slab values exactly (single-pass bf16 would lose 16 bits)
		Y = jnp.einsum("aX,CSjX->aSjC", E, X17,
			precision=jax.lax.Precision.HIGHEST)          # [nx, S, ndx, C]
		pyrel = (iyb_c - s0).astype(rdt)[:, None] + pyc   # [R, nx]
		wy = _es_kernel((pyrel[..., None] - soff)/hw, beta)       # [R, nx, S]
		wx = _es_kernel((pxc[..., None] - (dxlo + joff))/hw, beta)  # [R,nx,ndx]
		Z = jnp.einsum("raj,aSjC->raSC", wx, Y)
		return jnp.einsum("raS,raSC->Cra", wy, Z)         # [C, R, nx]
	out = jax.lax.map(chunk, (sy0, iyb_p, pyf_p, pxf_p))  # [nchunk, C, R, nx]
	return jnp.moveaxis(out, 1, 0).reshape(C, nchunk*R, nx)[:, :nrow]


@functools.partial(jax.jit, static_argnames=("K", "w", "beta"))
def shift_interp(fmap, dy, dx, K, w, beta):
	"""Gather-free ES interpolation at displaced grid positions:

	out[..., y, x] = value of fmap interpolated at (y + dy[y,x], x + dx[y,x])

	for displacement fields bounded by |dy|, |dx| <= K pixels. Numerically
	identical to the per-point gather evaluation (_u2nu_2d_core) at
	py = y + dy, px = x + dx, but built ONLY from whole-array shifts and
	multiply-adds: each integer offset D in [-(K + w/2), K + w/2] contributes
	shift(fmap, D) * es((d - D)/(w/2)), and the ES kernel's compact support
	(|z| <= 1) automatically zeroes offsets outside each point's true
	w-wide window. TPU rationale: elementwise gathers run ~100M elem/s,
	while shift+FMA streams at HBM bandwidth -- a (2K+w)^2-term double sum
	beats the w^2-element gather whenever 2K + w < ~16 w. The weights are
	anchored at the OUTPUT pixel, so the sum does not factorize into
	separable passes; the x-weight planes are hoisted out of the y loop.

	fmap [..., ny, nx]; dy, dx [ny, nx]. Both axes wrap periodically (torus
	grids); for non-periodic data provide a margin >= K + w/2 and ignore the
	wrap-contaminated border."""
	fmap = jnp.asarray(fmap)
	hw = w/2.0
	nd = int(np.floor(K + hw))
	rdt = utils.real_dtype(fmap.dtype)
	dy = jnp.asarray(dy, rdt); dx = jnp.asarray(dx, rdt)
	wxs = [_es_kernel((dx - D)/hw, beta).astype(rdt) for D in range(-nd, nd+1)]
	out = jnp.zeros_like(fmap)
	for Dy in range(-nd, nd+1):
		wy = _es_kernel((dy - Dy)/hw, beta).astype(rdt)
		ry = jnp.roll(fmap, -Dy, axis=-2)
		acc = jnp.zeros_like(fmap)
		for j, Dx in enumerate(range(-nd, nd+1)):
			acc = acc + jnp.roll(ry, -Dx, axis=-1)*wxs[j]
		out = out + acc*wy
	return out


@functools.partial(jax.jit, static_argnames=("nfine", "w", "beta", "forward",
	"fft_order", "real_out"))
def _u2nu_fine_jit(grid, nfine, w, beta, forward, fft_order, real_out):
	"""Jitted core of _u2nu_fine: one device dispatch for the whole
	deconvolve + zero-pad + inverse-FFT chain (eager ops each remote-compile
	on tunnel-attached TPU runtimes, so the hot path must be one program).
	real_out=True returns only the real part of the fine grid, computed
	exactly via Hermitianization + irfft: out = Re(ifft2(S)) = ifft2((S +
	conj(S[-k]))/2), which is Hermitian, halving fine-grid memory and the
	downstream per-point gather traffic."""
	nfy, nfx = nfine
	rdt = utils.real_dtype(grid.dtype)
	cy = _es_correction(nfy, w, beta, rdt)
	cx = _es_correction(nfx, w, beta, rdt)
	# place grid freqs into fine spectrum (grid in fft order if fft_order)
	g = grid if fft_order else jnp.fft.ifftshift(grid, axes=(-2, -1))
	spec = resample(g, (nfy, nfx), axes=(-2, -1))
	# correction indexed by original freq: after resample, fine grid fft-order
	spec = spec*jnp.asarray(cy)[:, None]*jnp.asarray(cx)[None, :]
	if real_out:
		# forward: fine = conj(ifft(conj(S)))*N; Re(conj(z)) = Re(z)
		S = jnp.conj(spec) if forward else spec
		# Hermitian half-spectrum H[k1,k2] = (S[k1,k2] + conj(S[-k1,-k2]))/2,
		# built directly in half form (k2 <= nfx//2) to keep transients small
		Sm = jnp.concatenate([S[..., :, :1],
			S[..., :, nfx - nfx//2:][..., :, ::-1]], -1)
		Sm = jnp.roll(Sm[..., ::-1, :], 1, axis=-2)
		Sh = 0.5*(S[..., :, :nfx//2+1] + jnp.conj(Sm))
		return jnp.fft.irfftn(Sh, s=(nfy, nfx), axes=(-2, -1))*(nfy*nfx)
	if forward:
		return jnp.conj(jnp.fft.ifftn(jnp.conj(spec), axes=(-2, -1)))*(nfy*nfx)
	return jnp.fft.ifftn(spec, axes=(-2, -1))*(nfy*nfx)

def _u2nu_fine(grid, epsilon, forward, fft_order, real_out=False, chunked=False):
	"""Stage 1 of u2nu: deconvolve the spectrum by the ES kernel, zero-pad to
	the oversampled size, and inverse-FFT to the fine spatial grid. This is
	the expensive, point-independent part -- u2nu_plan caches it.
	chunked=True processes leading batch dims one field at a time, bounding
	the transient complex spectrum/FFT workspace to one fine grid."""
	grid = jnp.asarray(grid)
	rdt = utils.real_dtype(grid.dtype)
	if epsilon is None:
		epsilon = 1e-5 if rdt == np.float32 else 1e-10
	w, beta = _es_params(epsilon)
	ny, nx = grid.shape[-2:]
	sigma = 2
	nfy, nfx = fft_len(int(ny*sigma), "above"), fft_len(int(nx*sigma), "above")
	if grid.dtype.kind != 'c': grid = grid.astype(utils.complex_dtype(grid.dtype))
	args = ((nfy, nfx), w, float(beta), bool(forward), bool(fft_order),
		bool(real_out))
	if chunked and grid.ndim > 2 and int(np.prod(grid.shape[:-2])) > 1:
		flat = grid.reshape((-1, ny, nx))
		fine = jnp.stack([_u2nu_fine_jit(flat[i], *args)
			for i in range(flat.shape[0])])
		fine = fine.reshape(grid.shape[:-2] + (nfy, nfx))
	else:
		fine = _u2nu_fine_jit(grid, *args)
	return fine, (nfy, nfx), w, float(beta)

def _u2nu_points(fine, nfine, w, beta, coords, periodicity, pre):
	"""Stage 2 of u2nu: ES-kernel interpolation of the fine grid at the
	nonuniform points. Host-side (numpy) coords take the split-position
	path: the int/frac split is computed in f64 so kernel offsets keep full
	resolution even on huge fine grids in f32."""
	per = np.broadcast_to(np.asarray(periodicity, float), (2,))
	flat = fine.reshape((-1,) + tuple(nfine))
	if isinstance(coords, np.ndarray):
		co = np.asarray(coords, np.float64)
		py = (co[:, 0]/per[0] % 1.0)*nfine[0]
		px = (co[:, 1]/per[1] % 1.0)*nfine[1]
		iyb = np.floor(py); ixb = np.floor(px)
		rdt = utils.real_dtype(fine.dtype)
		res = _u2nu_2d_core_split(flat,
			jnp.asarray(iyb.astype(np.int32)), jnp.asarray((py - iyb).astype(rdt)),
			jnp.asarray(ixb.astype(np.int32)), jnp.asarray((px - ixb).astype(rdt)),
			tuple(nfine), w, beta)
		npt = co.shape[0]
	else:
		coords = jnp.asarray(coords)
		py = (coords[:, 0]/per[0] % 1.0)*nfine[0]
		px = (coords[:, 1]/per[1] % 1.0)*nfine[1]
		res = _u2nu_2d_core(flat, py, px, tuple(nfine), w, beta)
		npt = coords.shape[0]
	return res.reshape(tuple(pre) + (npt,))

def u2nu(grid, coords, forward=False, epsilon=None, nthread=None, out=None,
		periodicity=2*np.pi, fft_order=True):
	"""Evaluate the Fourier series given by the uniform grid of coefficients
	``grid[...,ny,nx]`` at the nonuniform points coords[npt,ndim] (in radians,
	periodic with the given periodicity). Type-2 NUFFT
	(reference fft.u2nu:457)."""
	grid = jnp.asarray(grid)
	assert jnp.asarray(coords).shape[-1] == 2, "Only 2D u2nu implemented"
	fine, nfine, w, beta = _u2nu_fine(grid, epsilon, forward, fft_order)
	return _u2nu_points(fine, nfine, w, beta, coords, periodicity,
		grid.shape[:-2])

@functools.partial(jax.jit, static_argnames=("nfine", "w", "beta"))
def _nu2u_2d_core(vals, py, px, nfine, w, beta):
	iy, wy = _spread_inds_weights(py, nfine[0], w, beta)
	ix, wx = _spread_inds_weights(px, nfine[1], w, beta)
	contrib = jnp.einsum("p,py,px->pyx", vals, wy, wx)
	fine = utils.czeros(nfine, vals.dtype)
	fine = fine.at[iy[:, :, None], ix[:, None, :]].add(contrib)
	return fine

def nu2u(vals, coords, out=None, oshape=None, forward=True, epsilon=None,
		nthread=None, periodicity=2*np.pi, fft_order=True):
	"""Adjoint of u2nu: spread nonuniform samples vals[...,npt] at coords onto
	a uniform Fourier grid of shape oshape (type-1 NUFFT, reference fft.nu2u:502)."""
	vals = jnp.asarray(vals)
	coords = jnp.asarray(coords)
	if oshape is None and out is not None: oshape = out.shape
	ny, nx = oshape[-2:]
	rdt = utils.real_dtype(vals.dtype)
	if vals.dtype.kind != 'c': vals = vals.astype(utils.complex_dtype(vals.dtype))
	# exact transpose of u2nu with the same conventions: nu2u(fw=True) is the
	# transpose of u2nu(fw=True) (e^{-ikx} gridding), etc.
	def fwd(g):
		return u2nu(g, coords, forward=forward, epsilon=epsilon,
			periodicity=periodicity, fft_order=fft_order)
	proto = jax.ShapeDtypeStruct((ny, nx), vals.dtype)
	trans = jax.linear_transpose(fwd, proto)
	pre = vals.shape[:-1]
	flat = vals.reshape((-1, vals.shape[-1]))
	res = jax.vmap(lambda v: trans(v)[0])(flat)
	return res.reshape(pre + (ny, nx))

def interpol_nufft(map, inds, out=None, epsilon=None, nthread=None, nofft=False):
	"""Interpolate the periodic uniform-grid map at fractional pixel positions
	inds[{y,x},...] using the NUFFT (reference fft.interpol_nufft:436)."""
	map = jnp.asarray(map)
	inds = jnp.asarray(inds)
	ishape = inds.shape[1:]
	flat = inds.reshape(2, -1).T
	ny, nx = map.shape[-2:]
	coords = jnp.stack([flat[:, 0]/ny, flat[:, 1]/nx], -1)*2*np.pi
	if nofft: fmap = map
	else:     fmap = jnp.fft.fftn(map, axes=(-2, -1))/(ny*nx)
	res = u2nu(fmap, coords, epsilon=epsilon)
	if map.dtype.kind != 'c': res = res.real.astype(map.dtype)
	return res.reshape(map.shape[:-2] + ishape)


# ---------------------------------------------------------------------------
# Engine compatibility layer (reference fft.py:40-200: pyfftw/ducc engine
# selection; here everything routes to XLA's FFT, so engines are shims that
# exist for interface parity)
# ---------------------------------------------------------------------------
class NumpyEngine:
	"""Engine shim exposing the reference's engine interface over jnp
	(reference fft.NumpyEngine)."""
	def fft(self, a, b=None, axes=(-1,), nthread=0, flags=None):
		return fft(a, b, axes=axes)
	def ifft(self, a, b=None, axes=(-1,), nthread=0, flags=None, normalize=True):
		return ifft(a, b, axes=axes, normalize=normalize)
	def rfft(self, a, b=None, axes=(-1,), nthread=0, flags=None):
		return rfft(a, b, axes=axes)
	def irfft(self, a, b=None, n=None, axes=(-1,), nthread=0, flags=None, normalize=True):
		return irfft(a, b, n=n, axes=axes, normalize=normalize)

_engines = {"numpy": NumpyEngine(), "auto": NumpyEngine(), "jax": NumpyEngine()}

def get_engine(eng):
	"""Look up an fft engine by name (reference fft.get_engine)."""
	if isinstance(eng, str):
		return _engines.get(eng, _engines["auto"])
	return eng

def numpy_empty_aligned(shape, dtype, n=None):
	return np.empty(shape, dtype)

class numpy_FFTW:
	"""Minimal plan-style wrapper (reference fft.numpy_FFTW)."""
	def __init__(self, a, b, axes=(-1,), flags=None, threads=1, direction="FFTW_FORWARD"):
		self.a, self.b = a, b
		self.axes = axes
		self.direction = direction
	def __call__(self, normalise_idft=False):
		if self.direction == "FFTW_FORWARD":
			self.b[...] = np.asarray(fft(self.a, axes=self.axes))
		else:
			self.b[...] = np.asarray(ifft(self.a, axes=self.axes,
				normalize=normalise_idft))
		return self.b

ducc_FFTW = numpy_FFTW

def fft_flat(tod, ft, nthread=1, axes=[-1], flags=None, _direction="FFTW_FORWARD"):
	"""Flattened-dims fft workaround kept for interface parity
	(reference fft.fft_flat)."""
	if _direction == "FFTW_FORWARD":
		ft[...] = np.asarray(fft(tod, axes=tuple(axes)))
	else:
		tod[...] = np.asarray(ifft(ft, axes=tuple(axes), normalize=False)).real
	return ft

def ifft_flat(ft, tod, nthread=1, axes=[-1], flags=None):
	return fft_flat(tod, ft, nthread=nthread, axes=axes,
		_direction="FFTW_BACKWARD") and tod

def asfcarray(a):
	"""Convert to float/complex array, promoting ints (reference
	fft.asfcarray)."""
	a = np.asarray(a)
	return np.asarray(a, np.promote_types(a.dtype, np.float32))

def empty(shape, dtype):
	return np.empty(shape, dtype)

def rfft_shape(ishape, axes=[-1]):
	"""Output shape of an rfft over the given axes."""
	oshape = list(ishape)
	oshape[axes[-1]] = ishape[axes[-1]]//2 + 1
	return tuple(oshape)

def irfft_shape(ishape, n=None, axes=[-1]):
	"""Output shape of an irfft (reference fft.irfft_shape)."""
	oshape = list(ishape)
	oshape[axes[-1]] = n if n is not None else 2*(ishape[axes[-1]] - 1)
	return tuple(oshape)

def rfreq2ind(freqs, n):
	"""Real-fft frequency (cycles/sample) -> bin index."""
	return np.asarray(freqs)*n

def int2rfreq(n, i, d=1.0):
	return np.asarray(i)/(n*d)

def measure_shift(a, b, axis=-1):
	"""Sub-sample shift between a and b via the cross-correlation peak
	(reference fft.measure_shift)."""
	a = jnp.asarray(a); b = jnp.asarray(b)
	fa = jnp.fft.rfft(a, axis=axis)
	fb = jnp.fft.rfft(b, axis=axis)
	corr = jnp.fft.irfft(fa*jnp.conj(fb), n=a.shape[axis], axis=axis)
	corr = np.asarray(corr)
	n = corr.shape[axis]
	i = np.argmax(corr, axis)
	# parabolic sub-sample refinement
	c0 = np.take_along_axis(corr, np.expand_dims(i, axis), axis)[..., 0]
	cm = np.take_along_axis(corr, np.expand_dims((i-1) % n, axis), axis)[..., 0]
	cp = np.take_along_axis(corr, np.expand_dims((i+1) % n, axis), axis)[..., 0]
	denom = cm - 2*c0 + cp
	frac = np.where(np.abs(denom) > 0, 0.5*(cm - cp)/np.where(denom == 0, 1, denom), 0)
	sh = i + frac
	return np.where(sh > n/2, sh - n, sh)


# ---------------------------------------------------------------------------
# Inverse NUFFTs (reference fft.py:500-668): recover uniform Fourier
# coefficients from nonuniform samples (iu2nu) or nonuniform coefficients
# from uniform samples (inu2u), via CG on the normal equations with the
# forward/adjoint pair we already have.
# ---------------------------------------------------------------------------
def _cg_solve(A, b, epsilon=1e-6, maxiter=100):
	x = np.zeros_like(b)
	r = b - A(x)
	p = r.copy()
	rz = np.vdot(r, r).real
	r0 = max(rz, 1e-300)
	for i in range(maxiter):
		Ap = A(p)
		alpha = rz/max(np.vdot(p, Ap).real, 1e-300)
		x = x + alpha*p
		r = r - alpha*Ap
		rz_new = np.vdot(r, r).real
		if rz_new/r0 < epsilon**2: break
		p = r + (rz_new/rz)*p
		rz = rz_new
	return x

def iu2nu(a, inds, out=None, oshape=None, axes=None, periodicity=None,
		epsilon=None, nthread=None, normalize=False, forward=False):
	"""Inverse of u2nu: recover the uniform Fourier grid from nonuniform
	samples a at positions inds (reference fft.iu2nu). Solved with CG on
	the normal equations, using nu2u as the adjoint of u2nu."""
	a = np.asarray(utils.from_device(a) if hasattr(a, "addressable_shards") else a)
	inds = np.asarray(inds)
	per = 2*np.pi if periodicity is None else periodicity
	if oshape is None and out is not None: oshape = out.shape
	if oshape is None: raise ValueError("iu2nu needs oshape or out")
	coords = inds.T if inds.shape[0] == 2 and inds.ndim == 2 else inds
	def fwd(g):
		return utils.from_device(u2nu(jnp.asarray(g.reshape(oshape)), coords,
			forward=forward, epsilon=epsilon, periodicity=per)).reshape(-1)
	def adj(v):
		return utils.from_device(nu2u(jnp.asarray(v), coords, oshape=oshape,
			forward=not forward, epsilon=epsilon,
			periodicity=per)).reshape(-1)
	b = adj(a.reshape(-1))
	x = _cg_solve(lambda g: adj(fwd(g)), b,
		epsilon=(epsilon or 1e-6))
	res = x.reshape(oshape)
	if out is not None:
		out[...] = res
		return out
	return res

def inu2u(fa, inds, out=None, axes=None, periodicity=None, epsilon=None,
		nthread=None, normalize=False, forward=False, complex=True):
	"""Inverse of nu2u: recover nonuniform values whose gridding gives the
	uniform grid fa (reference fft.inu2u)."""
	fa = np.asarray(utils.from_device(fa) if hasattr(fa, "addressable_shards") else fa)
	inds = np.asarray(inds)
	per = 2*np.pi if periodicity is None else periodicity
	coords = inds.T if inds.shape[0] == 2 and inds.ndim == 2 else inds
	npt = coords.shape[0]
	def fwd(v):
		return utils.from_device(nu2u(jnp.asarray(v), coords,
			oshape=fa.shape, forward=forward, epsilon=epsilon,
			periodicity=per)).reshape(-1)
	def adj(g):
		return utils.from_device(u2nu(jnp.asarray(g.reshape(fa.shape)), coords,
			forward=not forward, epsilon=epsilon, periodicity=per)).reshape(-1)
	b = adj(fa.reshape(-1))
	x = _cg_solve(lambda v: adj(fwd(v)), b, epsilon=(epsilon or 1e-6))
	if out is not None:
		out[...] = x
		return out
	return x

def nufft(a, inds, out=None, oshape=None, axes=None, periodicity=None,
		epsilon=None, nthread=None, normalize=False, flip=False):
	"""Nonuniform samples -> uniform Fourier coefficients (reference
	fft.nufft = iu2nu)."""
	return iu2nu(a, inds, out=out, oshape=oshape, axes=axes,
		periodicity=periodicity, epsilon=epsilon, normalize=normalize,
		forward=flip)

def inufft(fa, inds, out=None, axes=None, periodicity=None, epsilon=None,
		nthread=None, normalize=False, flip=False, complex=True, op=None):
	"""Uniform Fourier coefficients -> nonuniform samples (reference
	fft.inufft = u2nu)."""
	inds = np.asarray(inds)
	coords = inds.T if inds.shape[0] == 2 and inds.ndim == 2 else inds
	per = 2*np.pi if periodicity is None else periodicity
	res = u2nu(jnp.asarray(fa), coords, forward=flip, epsilon=epsilon,
		periodicity=per)
	if not complex: res = res.real
	if out is not None:
		out[...] = np.asarray(utils.from_device(res))
		return out
	return res

def nufft_adjoint(a, inds, out=None, oshape=None, axes=None, periodicity=None,
		epsilon=None, nthread=None, normalize=False, flip=False):
	"""Adjoint NUFFT: gridding of nonuniform samples (reference
	fft.nufft_adjoint = nu2u)."""
	inds = np.asarray(inds)
	coords = inds.T if inds.shape[0] == 2 and inds.ndim == 2 else inds
	per = 2*np.pi if periodicity is None else periodicity
	res = nu2u(jnp.asarray(a), coords, oshape=oshape, forward=not flip,
		epsilon=epsilon, periodicity=per)
	if out is not None:
		out[...] = np.asarray(utils.from_device(res))
		return out
	return res

def inufft_adjoint(fa, inds, out=None, axes=None, periodicity=None,
		epsilon=None, nthread=None, normalize=False, flip=False, complex=True):
	"""Inverse adjoint NUFFT (reference fft.inufft_adjoint = inu2u)."""
	return inu2u(fa, inds, out=out, axes=axes, periodicity=periodicity,
		epsilon=epsilon, normalize=normalize, forward=not flip,
		complex=complex)

class u2nu_plan:
	"""Plan-based type-2 NUFFT (reference fft.u2nu_plan:619): precompute the
	deconvolved, oversampled fine grid for a fixed set of Fourier fields once,
	then evaluate repeatedly at arbitrary point sets with gather-only work.
	The reference wraps ducc's incremental_u2nu; here the plan IS the fine
	grid resident on device.

	fa: fields [..., gshape]; axes: the two transform axes; eval(inds) with
	inds[2, ...] in grid units (periodicity defaults to the grid shape, like
	the reference)."""
	def __init__(self, fa, axes, periodicity=None, epsilon=None, nthread=None,
			normalize=False, forward=False, complex=True, op=None):
		fa = jnp.asarray(fa)
		axes = tuple(np.atleast_1d(axes) % fa.ndim)
		assert len(axes) == 2, "Only 2D u2nu_plan implemented"
		# move the transform axes last
		perm = [i for i in range(fa.ndim) if i not in axes] + list(axes)
		fa = jnp.transpose(fa, perm)
		if op is not None: fa = op(fa)
		self.pshape = fa.shape[:-2]
		self.gshape = fa.shape[-2:]
		if periodicity is None: periodicity = self.gshape
		self.periodicity = periodicity
		self.ctype = utils.complex_dtype(fa.dtype)
		self.dtype = utils.real_dtype(fa.dtype)
		if epsilon is None:
			epsilon = 1e-5 if self.dtype == np.float32 else 1e-10
		self.epsilon = epsilon
		self.complex = complex
		self.normalize = normalize
		self.norm = int(np.prod(self.gshape))
		# real output means out = Re(sum vals*wy*wx) = sum Re(vals)*wy*wx
		# (ES weights are real), so only the real part of the fine grid is
		# ever read: build it real (real_out), halving plan memory AND the
		# per-point gather traffic (the TPU-side bottleneck of eval), and
		# build per-field (chunked) to bound the transient FFT workspace
		self.fine, self.nfine, self.w, self.beta = _u2nu_fine(
			fa, epsilon, forward, fft_order=True, real_out=not complex,
			chunked=True)
	def eval(self, inds, out=None):
		inds = jnp.asarray(inds)
		ishape = inds.shape[1:]
		coords = inds.reshape(2, -1).T
		res = _u2nu_points(self.fine, self.nfine, self.w, self.beta,
			coords, self.periodicity, self.pshape)
		if not self.complex: res = res.real
		if self.normalize: res = res/self.norm
		res = res.reshape(tuple(self.pshape) + tuple(ishape))
		if out is not None:
			out[:] = np.asarray(res)
			return out
		return res
