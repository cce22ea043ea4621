"""Device mesh helpers."""
from __future__ import annotations
import numpy as np
import jax
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding


def get_mesh(shape=None, axis_names=None, devices=None):
	"""Create a Mesh over the available devices. Default: 1D mesh over all
	devices with axis 'rows' (the natural sharding for ring-based maps)."""
	if devices is None: devices = jax.devices()
	n = len(devices)
	if shape is None: shape = (n,)
	if axis_names is None:
		axis_names = ("rows",) if len(shape) == 1 else tuple(
			["rows", "cols", "batch"][:len(shape)])
	devs = np.array(devices[:int(np.prod(shape))]).reshape(shape)
	return Mesh(devs, axis_names)

def local_mesh(n=None, axis_names=("rows",)):
	"""Mesh over n local devices (all by default)."""
	devs = jax.devices()
	if n is not None: devs = devs[:n]
	return get_mesh((len(devs),), axis_names, devs)

def row_sharding(mesh, ndim=2, axis="rows"):
	"""NamedSharding that shards the row (theta/dec) axis of a map, which is
	ndim-2 from the end."""
	spec = [None]*ndim
	spec[-2] = axis
	return NamedSharding(mesh, P(*spec))

def replicated(mesh):
	return NamedSharding(mesh, P())
