"""Spline/conv/lanczos interpolation of gridded data (map_coordinates).

TPU-native replacement for the reference's Fortran interpolation core
(fortran/interpol.F90 + pixell/interpol.py): scipy-ndimage-compatible
``map_coordinates`` over the last two (or one) axes, with

- orders 0 (nearest), 1 (bilinear), 2-5 (B-spline with prefilter)
- borders: cyclic (default, matching the reference), zero/constant,
  nearest, mirror
- mode "conv" (no prefilter: direct kernel weighting), "spline"
  (prefiltered, interpolating), "lanczos" (3-lobe windowed sinc)
- transpose (adjoint) and derivative variants, needed by lensing
  (reference interpol.F90:442,527)

The B-spline prefilter is the inverse of the B-spline blur. Instead of the
reference's sequential IIR recursion (interpol.F90:89-258, unusable on a
vector machine), we apply it spectrally: pad according to the border mode,
divide by the kernel's frequency response, crop. The IIR impulse response
decays as (2-sqrt(3))^n ~ 0.27^n, so a 48-pixel pad is exact to ~1e-27.
All functions are linear in the data and jit/vjp-compatible: the transpose
comes from jax.linear_transpose rather than hand-written scatter kernels.
"""
from __future__ import annotations
import functools
import numpy as np
import jax
import jax.numpy as jnp

PAD = 48


def _bspline3_weights(t):
	"""Cubic B-spline basis evaluated at offsets (t in [0,1)):
	returns 4 weights for taps floor(x)-1 .. floor(x)+2."""
	t = jnp.asarray(t)
	w0 = (1 - t)**3/6
	w1 = (4 - 6*t**2 + 3*t**3)/6
	w2 = (1 + 3*t + 3*t**2 - 3*t**3)/6
	w3 = t**3/6
	return jnp.stack([w0, w1, w2, w3], -1)

def _bspline3_dweights(t):
	t = jnp.asarray(t)
	w0 = -(1 - t)**2/2
	w1 = (-12*t + 9*t**2)/6
	w2 = (3 + 6*t - 9*t**2)/6
	w3 = t**2/2
	return jnp.stack([w0, w1, w2, w3], -1)

def _linear_weights(t):
	t = jnp.asarray(t)
	return jnp.stack([1 - t, t], -1)

def _linear_dweights(t):
	t = jnp.asarray(t)
	return jnp.stack([-jnp.ones_like(t), jnp.ones_like(t)], -1)

def _lanczos3_weights(t):
	t = jnp.asarray(t)
	offs = jnp.arange(-2, 4)  # taps floor(x)-2 .. floor(x)+3
	x = t[..., None] - offs
	def sinc(z): return jnp.sinc(z)
	w = sinc(x)*sinc(x/3)
	return w/jnp.sum(w, -1, keepdims=True)

def _bspline_val(n, t):
	"""Centered B-spline of degree n via the Cox-de Boor recursion
	(general-order replacement for the reference's hardcoded weight tables,
	interpol.F90 calc_weights:279)."""
	if n == 0:
		return jnp.where((t > -0.5) & (t <= 0.5), 1.0, 0.0)
	return ((t + (n + 1)/2)*_bspline_val(n - 1, t + 0.5)
		+ ((n + 1)/2 - t)*_bspline_val(n - 1, t - 0.5))/n

def _bspline_dval(n, t):
	"""Derivative: B_n'(t) = B_{n-1}(t+1/2) - B_{n-1}(t-1/2)."""
	return _bspline_val(n - 1, t + 0.5) - _bspline_val(n - 1, t - 0.5)

def _make_bspline_weights(order):
	"""(wfun, dwfun, ntap, off) for a degree-`order` B-spline. Odd orders
	anchor at floor(x) (t in [0,1)); even orders at round(x) (t in
	[-0.5,0.5)) -- the _interp2d anchor handles the distinction."""
	taps = np.arange(order + 1) - (order - 1)//2 if order % 2 else \
		np.arange(order + 1) - order//2
	off = -int(taps[0])
	def wfun(t):
		t = jnp.asarray(t)
		return jnp.stack([_bspline_val(order, t - j) for j in taps], -1)
	def dwfun(t):
		t = jnp.asarray(t)
		return jnp.stack([_bspline_dval(order, t - j) for j in taps], -1)
	return wfun, dwfun, order + 1, off

_KERNELS = {
	("spline", 3): (_bspline3_weights, _bspline3_dweights, 4, 1),
	("conv", 3):   (_bspline3_weights, _bspline3_dweights, 4, 1),
	("spline", 1): (_linear_weights, _linear_dweights, 2, 0),
	("conv", 1):   (_linear_weights, _linear_dweights, 2, 0),
	("lanczos", 3): (_lanczos3_weights, None, 6, 2),
}
for _o in (2, 4, 5):
	_k = _make_bspline_weights(_o)
	_KERNELS[("spline", _o)] = _k
	_KERNELS[("conv", _o)] = _k


def _bspline_response(n, dtype, order=3):
	"""Frequency response of the degree-`order` B-spline kernel sampled at
	the integers (cubic: [1/6,4/6,1/6] -> (4+2cos w)/6)."""
	w = 2*np.pi*np.fft.fftfreq(n)
	resp = np.zeros(n)
	half = (order + 1)//2
	for m in range(-half, half + 1):
		bm = float(np.asarray(_bspline_val(order, jnp.asarray(float(m)))))
		if bm != 0: resp = resp + bm*np.cos(m*w)
	return resp.astype(dtype)

def _bspline3_response(n, dtype):
	return _bspline_response(n, dtype, order=3)

def spline_filter(data, order=3, axes=None, border="cyclic", trans=False):
	"""B-spline prefilter: find coefficients c such that spline interpolation
	of c at integers reproduces data (reference interpol.spline_filter:100).
	trans applies the transpose instead."""
	data = jnp.asarray(data)
	if order < 2: return data
	if axes is None: axes = range(data.ndim)
	fun = lambda x: _spline_filter_fwd(x, order, tuple(ax % data.ndim for ax in axes), border)
	if not trans:
		return fun(data)
	return jax.linear_transpose(fun, jnp.zeros(data.shape, data.dtype))(data)[0]

def _spline_filter_fwd(data, order, axes, border):
	for ax in axes:
		data = jnp.moveaxis(data, ax, -1)
		n = data.shape[-1]
		if border in ["cyclic", "wrap"]:
			resp = jnp.asarray(_bspline_response(n, np.float64, order=order))
			data = jnp.fft.ifft(jnp.fft.fft(data, axis=-1)/resp, axis=-1).real.astype(data.dtype)
		else:
			pad = min(PAD, n)
			if border in ["nearest", "edge"]:
				ext = jnp.pad(data, [(0, 0)]*(data.ndim-1) + [(pad, pad)], mode="edge")
			elif border in ["mirror", "reflect"]:
				ext = jnp.pad(data, [(0, 0)]*(data.ndim-1) + [(pad, pad)], mode="reflect")
			else:  # zero/constant
				ext = jnp.pad(data, [(0, 0)]*(data.ndim-1) + [(pad, pad)])
			resp = jnp.asarray(_bspline_response(ext.shape[-1], np.float64, order=order))
			ext = jnp.fft.ifft(jnp.fft.fft(ext, axis=-1)/resp, axis=-1).real.astype(data.dtype)
			data = ext[..., pad:pad+n]
		data = jnp.moveaxis(data, -1, ax)
	return data


def _norm_inds2d(data, iy, ix, border):
	"""Normalize integer tap indices iy [npt, ky], ix [npt, kx] for the
	border mode. Returns (vy, vx, good) with good a [npt, ky, kx] validity
	mask for zero/constant borders, else None."""
	ny, nx = data.shape[-2:]
	if border in ["cyclic", "wrap"]:
		return iy % ny, ix % nx, None
	elif border in ["nearest", "edge"]:
		return jnp.clip(iy, 0, ny-1), jnp.clip(ix, 0, nx-1), None
	elif border in ["mirror", "reflect"]:
		def refl(i, n):
			period = 2*n - 2 if n > 1 else 1
			i = i % period
			return jnp.where(i >= n, period - i, i)
		return refl(iy, ny), refl(ix, nx), None
	else:  # zero / constant
		good = ((iy >= 0) & (iy < ny))[:, :, None] & ((ix >= 0) & (ix < nx))[:, None, :]
		return jnp.clip(iy, 0, ny-1), jnp.clip(ix, 0, nx-1), good

def _gather2d(data, iy, ix, border, cval):
	"""data [..., ny, nx], integer taps iy [npt, ky], ix [npt, kx] ->
	[..., npt, ky, kx] with border handling."""
	vy, vx, good = _norm_inds2d(data, iy, ix, border)
	vals = data[..., vy[:, :, None], vx[:, None, :]]
	if good is not None:
		vals = jnp.where(good, vals, cval)
	return vals


def map_coordinates(idata, points, odata=None, mode="spline", order=3,
		border="cyclic", trans=False, deriv=False, prefilter=True, cval=0.0):
	"""Interpolate idata[..., ny, nx] at fractional pixel positions
	points[2, ...] (or 1D data at points[1, ...]). Reference:
	pixell/interpol.map_coordinates:7.

	mode: "spline" (prefiltered B-spline, interpolating), "conv" (B-spline
	 weighting without prefilter, smoothing), "lanczos".
	order: 0-5 (B-splines; 3 = cubic default).
	deriv: return the gradient [..., 2, ...] instead of values.
	trans: apply the transpose operation: scatter odata at the points back
	 into a map of idata's shape (adjoint of the interpolation)."""
	idata = jnp.asarray(idata)
	points = jnp.asarray(points)
	ndim = points.shape[0]
	if ndim == 1:
		# lift 1D case to 2D
		res = map_coordinates(idata[..., None, :] if not trans else idata,
			jnp.stack([jnp.zeros_like(points[0]), points[0]]), odata=odata,
			mode=mode, order=order, border=border, trans=trans, deriv=deriv,
			prefilter=prefilter, cval=cval)
		return res
	assert ndim == 2, "Only 1D/2D interpolation supported"
	pshape = points.shape[1:]
	pts = points.reshape(2, -1)

	if not trans:
		fun = lambda d: _interp2d(d, pts, mode, order, border, deriv, prefilter, cval)
		res = fun(idata)
		if deriv:
			return res.reshape(idata.shape[:-2] + (2,) + pshape)
		return res.reshape(idata.shape[:-2] + pshape)
	else:
		# transpose: odata has point shape; produce map shape
		assert odata is not None or idata is not None
		vals = jnp.asarray(odata) if odata is not None else idata
		if deriv:
			flat = vals.reshape(vals.shape[:-1-len(pshape)] + (2, pts.shape[1],))
		else:
			flat = vals.reshape(vals.shape[:len(vals.shape)-len(pshape)] + (pts.shape[1],))
		mapshape = idata.shape if not deriv else idata.shape
		fun = lambda d: _interp2d(d, pts, mode, order, border, deriv, prefilter, cval)
		example = jnp.zeros(mapshape, flat.dtype)
		out = jax.linear_transpose(fun, example)(flat)[0]
		return out


def _interp2d(data, pts, mode, order, border, deriv, prefilter, cval):
	if order == 0:
		iy = jnp.round(pts[0]).astype(jnp.int32)[:, None]
		ix = jnp.round(pts[1]).astype(jnp.int32)[:, None]
		vals = _gather2d(data, iy, ix, border, cval)[..., 0, 0]
		if deriv:
			return jnp.zeros(data.shape[:-2] + (2, pts.shape[1]), data.dtype)
		return vals
	wfun, dwfun, ntap, off = _KERNELS[(mode if mode != "spline" or order != 1 else "spline", order)] \
		if (mode, order) in _KERNELS else _KERNELS[("spline", order)]
	if mode == "lanczos":
		wfun, dwfun, ntap, off = _KERNELS[("lanczos", 3)]
	padded = 0
	if mode == "spline" and prefilter and order >= 2:
		if border in ["zero", "constant"]:
			# The zero border applies to the DATA, not the spline coefficients:
			# coefficients just outside the map are nonzero even for zero data.
			# Prefilter a zero-padded copy and keep the pad through the gather
			# so edge nodes reproduce exactly (truncation ~0.43^24 for order 5).
			padded = 24
			data = jnp.pad(data, [(0, 0)]*(data.ndim-2) + [(padded, padded)]*2)
		data = spline_filter(data, order=order, axes=(-2, -1), border=border)
	if order % 2 == 0 and mode != "lanczos":
		# even-order splines anchor at the nearest integer: t in [-0.5, 0.5)
		i0y = jnp.floor(pts[0] + 0.5).astype(jnp.int32)
		i0x = jnp.floor(pts[1] + 0.5).astype(jnp.int32)
	else:
		i0y = jnp.floor(pts[0]).astype(jnp.int32)
		i0x = jnp.floor(pts[1]).astype(jnp.int32)
	ty = pts[0] - i0y
	tx = pts[1] - i0x
	taps = jnp.arange(-off, ntap-off)
	iy = i0y[:, None] + taps[None, :] + padded
	ix = i0x[:, None] + taps[None, :] + padded
	# Contract per (ky, kx) tap with an immediate accumulate instead of
	# materializing the [..., npt, ky, kx] gather tensor: on TPU the
	# minor ntap axis gets tile-padded to 128 lanes (a 32x memory blowup
	# for cubic -- 17.7 GB and a compile-time OOM at 2.9M points x 3
	# comps), while per-tap gathers keep npt minor and add nothing.
	vy, vx, good = _norm_inds2d(data, iy, ix, border)
	wy = wfun(ty); wx = wfun(tx)
	if deriv:
		dwy = dwfun(ty); dwx = dwfun(tx)
	acc = dy = dx = 0
	for j in range(iy.shape[-1]):
		for k in range(ix.shape[-1]):
			v = data[..., vy[:, j], vx[:, k]]
			if good is not None:
				v = jnp.where(good[:, j, k], v, cval)
			if not deriv:
				acc = acc + v*(wy[:, j]*wx[:, k])
			else:
				dy = dy + v*(dwy[:, j]*wx[:, k])
				dx = dx + v*(wy[:, j]*dwx[:, k])
	if not deriv:
		return acc
	return jnp.stack([dy, dx], -2)


# ---------------------------------------------------------------------------
# Adaptive interpolator (reference interpol.build:123): evaluate an
# expensive coordinate transform on a coarse grid, refine until an accuracy
# target is met, then provide fast interpolated lookups.
# ---------------------------------------------------------------------------
def build(func, interpolator, box, errlim, maxsize=None, maxdepth=None,
		return_obj=False, *args, **kwargs):
	"""Build an interpolator for func over box [{from,to},ndim] by refining a
	grid until func is reproduced within errlim."""
	box = np.asarray(box, float)
	ndim = box.shape[1]
	n = np.zeros(ndim, int) + 8
	errlim = np.asarray(errlim)
	for depth in range(maxdepth or 10):
		grid = _eval_grid(func, box, n)
		ip = interpolator(box, grid)
		# test at midpoints
		ntest = np.minimum(n*2-1, 64)
		test_grid = _eval_grid(func, box, ntest)
		got = ip(_grid_coords(box, ntest))
		err = np.abs(np.asarray(got).reshape(test_grid.shape) - test_grid)
		scale = np.max(err, axis=tuple(range(1, err.ndim))) if err.ndim > 1 else err.max()
		if np.all(np.max(err) <= np.max(errlim)): break
		n = n*2 - 1
		if maxsize and np.prod(n) > maxsize: break
	return (ip, grid) if return_obj else ip

def _grid_coords(box, n):
	axes = [np.linspace(box[0, i], box[1, i], n[i]) for i in range(box.shape[1])]
	mesh = np.meshgrid(*axes, indexing="ij")
	return np.stack([m.reshape(-1) for m in mesh])

def _eval_grid(func, box, n):
	coords = _grid_coords(box, n)
	vals = np.asarray(func(coords))
	return vals.reshape(vals.shape[:-1] + tuple(n))



# ---------------------------------------------------------------------------
# Box-based interpolator objects (reference interpol.py:200-330)
# ---------------------------------------------------------------------------
def get_core(dtype):
	"""Engine lookup retained for interface parity: everything routes to the
	jax map_coordinates here (reference interpol.get_core)."""
	return map_coordinates

def lin_derivs_forward(y, npre=0):
	"""All 0th/1st forward-difference derivative combinations along the
	last n axes: shape (2,)*n + y.shape-with-each-interp-axis-shortened
	(reference interpol.lin_derivs_forward)."""
	y = np.asarray(y, float)
	nin = y.ndim - npre
	ys = np.zeros((2,)*nin + y.shape)
	ys[(0,)*nin] = y
	for i in range(nin):
		whole, start, end = slice(None), slice(0, -1), slice(1, None)
		target = (whole,)*i + (1,) + (0,)*(nin-i-1)
		source = (whole,)*i + (0,) + (0,)*(nin-i-1)
		cells1 = (whole,)*(npre+i) + (start,) + (whole,)*(nin-i-1)
		cells2 = (whole,)*(npre+i) + (end,) + (whole,)*(nin-i-1)
		ys[target + cells1] = ys[source + cells2] - ys[source + cells1]
	return ys[(slice(None),)*nin + (slice(None),)*npre + (slice(0, -1),)*nin]

def grad_forward(y, npre=0):
	"""Forward-difference gradient along the last n axes, shape (n,)+...
	(reference interpol.grad_forward)."""
	y = np.asarray(y, float)
	nin = y.ndim - npre
	dy = np.zeros((nin,) + y.shape)
	for i in range(nin):
		whole, start, end = slice(None), slice(0, -1), slice(1, None)
		cells1 = (whole,)*(npre+i) + (start,) + (whole,)*(nin-i-1)
		cells2 = (whole,)*(npre+i) + (end,) + (whole,)*(nin-i-1)
		dy[(i,) + cells1] = y[cells2] - y[cells1]
	return dy[(slice(None),) + (slice(None, -1),)*(dy.ndim-1)]

class Interpolator:
	"""Base for box-mapped interpolators (reference interpol.Interpolator)."""
	def __init__(self, box, y, *args, **kwargs):
		self.box, self.y = np.array(box), np.array(y)
		self.args, self.kwargs = args, kwargs

class ip_ndimage(Interpolator):
	def __call__(self, x):
		import jax.numpy as jnp
		x = np.asarray(x)
		px = ((x.reshape(x.shape[0], -1).T - self.box[0])
			/(self.box[1] - self.box[0])*(np.array(self.y.shape[-x.shape[0]:]) - 1)).T
		res = np.asarray(map_coordinates(jnp.asarray(self.y), jnp.asarray(px),
			*self.args, **self.kwargs))
		return res.reshape(res.shape[:-1] + x.shape[1:])

class ip_linear(Interpolator):
	"""Precomputed multilinear interpolation (reference interpol.ip_linear)."""
	def __init__(self, box, y, *args, **kwargs):
		Interpolator.__init__(self, box, y, *args, **kwargs)
		self.n = self.box.shape[1] if self.box.ndim > 1 else 1
		self.npre = self.y.ndim - self.n
		self.ys = lin_derivs_forward(self.y, self.npre)
	def __call__(self, x):
		x = np.asarray(x)
		flatx = x.reshape(x.shape[0], -1)
		nshape = np.array(self.ys.shape[-self.n:])
		px = ((flatx.T - self.box[0])/(self.box[1] - self.box[0])*nshape).T
		ix = np.floor(px).astype(int)
		ix = np.maximum(0, np.minimum(nshape[:, None] - 1, ix))
		fx = px - ix
		res = np.zeros(self.ys.shape[self.n:self.n+self.npre] + fx.shape[1:2])
		for i in range(2**self.n):
			I = np.unravel_index(i, (2,)*self.n)
			w = np.ones(fx.shape[1:])
			for d in range(self.n):
				w = w*(fx[d]**I[d])
			res += self.ys[I][(slice(None),)*self.npre + tuple(ix)]*w
		return res.reshape(res.shape[:-1] + x.shape[1:])

class ip_grad(ip_linear):
	"""Gradient (first-order only) interpolation -- faster, less accurate
	(reference interpol.ip_grad)."""
	def __call__(self, x):
		x = np.asarray(x)
		flatx = x.reshape(x.shape[0], -1)
		nshape = np.array(self.ys.shape[-self.n:])
		px = ((flatx.T - self.box[0])/(self.box[1] - self.box[0])*nshape).T
		ix = np.floor(px).astype(int)
		ix = np.maximum(0, np.minimum(nshape[:, None] - 1, ix))
		fx = px - ix
		zero = (0,)*self.n
		res = self.ys[zero][(slice(None),)*self.npre + tuple(ix)].copy()
		for d in range(self.n):
			I = tuple(1 if k == d else 0 for k in range(self.n))
			res += self.ys[I][(slice(None),)*self.npre + tuple(ix)]*fx[d]
		return res.reshape(res.shape[:-1] + x.shape[1:])
