"""Map up/down-sampling (reference pixell/resample.py)."""
from __future__ import annotations
import numpy as np
import jax.numpy as jnp
from . import utils


def resample(d, factors=None, method="fft", mode="wrap", corner=False, order=3):
	"""Resample the last two axes of d (an ndmap or array) to a new shape.
	factors can be a scale factor (scalar or per-axis) or the target shape
	(if values > some threshold they are treated as a shape)."""
	from . import enmap
	arr = jnp.asarray(d)
	oshape = _target_shape(arr.shape, factors)
	if method == "fft":
		from . import fft as enfft
		res = enfft.resample_fft(arr, oshape, axes=(-2, -1))
	elif method in ["spline", "bilinear", "linear"]:
		from . import interpol
		fy = arr.shape[-2]/oshape[-2]
		fx = arr.shape[-1]/oshape[-1]
		oy = jnp.arange(oshape[-2])*fy + (0 if corner else (fy-1)/2)
		ox = jnp.arange(oshape[-1])*fx + (0 if corner else (fx-1)/2)
		py, px = jnp.meshgrid(oy, ox, indexing="ij")
		pts = jnp.stack([py.reshape(-1), px.reshape(-1)])
		o = 1 if method in ["bilinear", "linear"] else order
		res = interpol.map_coordinates(arr, pts, order=o, border=mode)
		res = res.reshape(arr.shape[:-2] + tuple(oshape))
	else:
		raise ValueError("Unknown resample method '%s'" % method)
	if isinstance(d, enmap.ndmap):
		oshape2, owcs = enmap.scale_geometry(d.shape, d.wcs,
			np.array(oshape, float)/np.array(d.shape[-2:]))
		return enmap.ndmap(res, owcs)
	return res

def _target_shape(ishape, factors):
	factors = np.atleast_1d(np.asarray(factors))
	if factors.size == 1: factors = np.repeat(factors, 2)
	if np.issubdtype(factors.dtype, np.integer) and np.all(factors > 8):
		return tuple(int(f) for f in factors)  # explicit shape
	if np.all(factors == factors.astype(int)) and np.all(factors > 8):
		return tuple(int(f) for f in factors)
	return tuple(utils.nint(np.array(ishape[-2:])*factors))

def resample_bin(d, factors=[0.5], axes=None):
	"""Downsample by averaging over bins (factors <= 1)."""
	from . import enmap
	arr = np.asarray(d)
	factors = np.atleast_1d(factors)
	if axes is None: axes = [-len(factors)+i for i in range(len(factors))]
	res = arr
	for f, ax in zip(factors, axes):
		bsize = utils.nint(1/f)
		res = np.asarray(utils.block_reduce(res, bsize, axis=ax, inclusive=False))
	if isinstance(d, enmap.ndmap):
		fac = np.array(arr.shape[-2:])//np.array(res.shape[-2:])
		_, owcs = enmap.downgrade_geometry(d.shape, d.wcs, fac)
		return enmap.ndmap(res, owcs)
	return res


def downsample_bin(d, steps=[2], axes=None):
	"""Block-average downsample by integer steps (reference
	resample.downsample_bin)."""
	from . import utils
	d = np.asarray(d) if not hasattr(d, "aval") else d
	steps = np.atleast_1d(steps)
	if axes is None: axes = list(range(-len(steps), 0))
	return utils.downgrade(d, steps, axes=axes, op=np.mean, inclusive=False)

def upsample_bin(d, steps=[2], axes=None):
	"""Repeat-upsample by integer steps (reference resample.upsample_bin)."""
	from . import utils
	steps = np.atleast_1d(steps)
	if axes is None: axes = list(range(-len(steps), 0))
	return utils.upgrade(np.asarray(d), steps, axes=axes)

def resample_fft_simple(d, n, ngroup=100):
	"""Fourier-resample along the last axis in groups (reference
	resample.resample_fft_simple)."""
	from . import fft as _fft
	return np.asarray(_fft.resample_fft(d, n, axes=(-1,)))

def make_equispaced(d, t, quantile=0.1, order=3, mask_nan=False):
	"""Resample data sampled at irregular times t to a constant rate
	(reference resample.make_equispaced). Returns (d_out, t_out)."""
	from . import interpol
	import jax.numpy as jnp
	d = np.asarray(d, float); t = np.asarray(t, float)
	dt_all = np.diff(t)
	dt = np.quantile(dt_all, quantile)
	n = int(np.floor((t[-1] - t[0])/dt)) + 1
	t_out = t[0] + np.arange(n)*dt
	# fractional indices into the original sampling
	idx = np.interp(t_out, t, np.arange(len(t)))
	res = np.asarray(interpol.map_coordinates(jnp.asarray(d),
		jnp.asarray(idx[None]), order=order, border="nearest"))
	if mask_nan: res = np.nan_to_num(res)
	return res, t_out


def resample_fft(d, n, axes=None):
	"""Fourier-resample d to lengths n along axes (reference
	resample.resample_fft)."""
	from . import fft as _fft
	n = np.atleast_1d(n)
	if axes is None: axes = list(range(-len(n), 0))
	return _fft.resample_fft(d, n, axes=tuple(np.atleast_1d(axes)))
