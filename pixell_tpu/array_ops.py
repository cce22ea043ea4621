"""Small batched array operations (reference pixell/array_ops.py over
fortran/array_ops.F90). On TPU these are all trivially expressed in jnp."""
from __future__ import annotations
import numpy as np
import jax.numpy as jnp
from . import utils


class _Core:
	"""Numpy/jnp stand-in for the reference's f2py core objects
	(reference array_ops.get_core:7 returning _array_ops_32/64.array_ops).
	Exposes the same callables, operating out-of-place on the given arrays."""
	def __init__(self, dtype):
		self.dtype = np.dtype(dtype)
	def matmul_multi(self, AT, BT, XT):
		# f2py cores take transposed views; emulate the same contract
		X = np.einsum("...ij,...kj->...ki", AT.T, BT.T)
		XT.T[...] = X
	def matmul_multi_sym(self, AT, BT):
		BT.T[...] = np.einsum("...ij,...kj->...ki", AT.T, BT.T)
	def ang2rect(self, aT, resT):
		resT.T[...] = np.moveaxis(np.asarray(utils.ang2rect(
			np.moveaxis(aT.T, -1, 0))), 0, -1)
	def find_contours(self, imapT, vals, omapT):
		omapT.T[...] = np.searchsorted(np.asarray(vals), imapT.T).astype(np.int32)
	def roll_rows(self, imapT, offsets, omapT):
		omapT.T[...] = np.asarray(roll_rows(imapT.T, np.asarray(offsets)))

def get_core(dtype):
	"""Return the compute core for dtype (reference array_ops.get_core:7)."""
	dtype = np.dtype(dtype)
	if dtype in (np.float32, np.float64): return _Core(dtype)
	raise ValueError("Unsupported data type: %s" % str(dtype))

def wrap_mm_m(name, vec2mat=False):
	"""Wrap a core matrix-matrix/matrix-vector routine so the matrix axes can
	sit anywhere (reference array_ops.wrap_mm_m:58). Supported names:
	matmul_multi, matmul_multi_sym."""
	def f(A, B, axes=[-2, -1]):
		A = np.asarray(A); B = np.asarray(B)
		ax1, ax2 = [i if i >= 0 else A.ndim + i for i in axes]
		A2 = np.moveaxis(A, (ax1, ax2), (-2, -1))
		vec = B.ndim < A.ndim
		if vec:
			b2 = np.moveaxis(B, ax1 % B.ndim, -1)
			res = np.einsum("...ij,...j->...i", A2, b2)
			return np.moveaxis(res, -1, ax1 % B.ndim).astype(B.dtype, copy=False)
		b2 = np.moveaxis(B, (ax1, ax2), (-2, -1))
		res = np.einsum("...ij,...jk->...ik", A2, b2)
		return np.moveaxis(res, (-2, -1), (ax1, ax2)).astype(B.dtype, copy=False)
	return f

def matmul(A, b, axes=[-2, -1]):
	"""Batched tiny-matrix multiply A[...,n,m] b[...,m] with the matrix axes
	anywhere (reference array_ops.matmul over matmul_multi, array_ops.F90:12)."""
	xp = utils._xp(A, b)
	A = xp.asarray(A); b = xp.asarray(b)
	ax1, ax2 = [a % A.ndim for a in axes]
	A2 = xp.moveaxis(A, (ax1, ax2), (-2, -1))
	if b.ndim == A.ndim:
		b2 = xp.moveaxis(b, (ax1, ax2), (-2, -1))
		res = xp.einsum("...ij,...jk->...ik", A2, b2)
		return xp.moveaxis(res, (-2, -1), (ax1, ax2))
	b2 = xp.moveaxis(b, ax1 % b.ndim, -1)
	res = xp.einsum("...ij,...j->...i", A2, b2)
	return xp.moveaxis(res, -1, ax1 % b.ndim)

def matmul_sym(A, b, axes=[-2, -1]):
	return matmul(A, b, axes=axes)

def ang2rect(angs):
	"""[{phi,theta},...] -> [{x,y,z},...] (reference array_ops.F90:39)."""
	return utils.ang2rect(angs)

def roll_rows(arr, shifts):
	"""Roll each row of arr by its own shift (reference array_ops.F90:111)."""
	arr = jnp.asarray(arr)
	shifts = jnp.asarray(shifts)
	n = arr.shape[-1]
	idx = (jnp.arange(n)[None, :] - shifts[:, None]) % n
	return jnp.take_along_axis(arr, idx, axis=-1)

def find_contours(imap, vals, omap=None):
	"""Label pixels by which contour interval they fall in
	(reference array_ops.find_contours via array_ops.F90:59)."""
	arr = np.asarray(imap)
	vals = np.asarray(vals)
	res = np.searchsorted(vals, arr).astype(np.int32)
	from . import enmap
	return enmap.samewcs(res, imap) if isinstance(imap, enmap.ndmap) else res

def eigpow(A, e, axes=[-2, -1]):
	return utils.eigpow(A, e, axes=axes)

def eigflip(A, axes=[-2, -1]):
	xp = utils._xp(A)
	A = xp.asarray(A)
	ax1, ax2 = [a % A.ndim for a in axes]
	A2 = xp.moveaxis(A, (ax1, ax2), (-2, -1))
	E, V = xp.linalg.eigh(A2)
	res = xp.einsum("...ij,...j,...kj->...ik", V, xp.abs(E), V)
	return xp.moveaxis(res, (-2, -1), (ax1, ax2))
