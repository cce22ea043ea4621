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
