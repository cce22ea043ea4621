"""Angular distance transforms on the sphere.

TPU-native replacement for the reference's C distance kernels
(cython/distances_core.c: brute/bubble/cellgrid methods). Those are
heap/wavefront algorithms that serialize badly on vector hardware; here we
use jump flooding (JFA), a fixed-iteration data-parallel algorithm that maps
onto pure jnp shifts + elementwise mins: each pass propagates candidate
nearest-seed coordinates at power-of-two offsets, O(log n) passes over the
map. Distances use the exact angular metric, RA wrapping is handled for
full-circle maps.
"""
from __future__ import annotations
import functools
import numpy as np
import jax
import jax.numpy as jnp
from . import enmap, utils, wcsutils

BIG = 1e30


def _shift2d(a, dy, dx, wrapx, fill):
	"""Shift a [ny,nx] array by (dy,dx), filling exposed edges with fill.
	x wraps if wrapx."""
	res = jnp.roll(a, (dy, dx), axis=(-2, -1))
	ny = a.shape[-2]
	if dy > 0:   res = res.at[..., :dy, :].set(fill)
	elif dy < 0: res = res.at[..., dy:, :].set(fill)
	if not wrapx:
		if dx > 0:   res = res.at[..., :, :dx].set(fill)
		elif dx < 0: res = res.at[..., :, dx:].set(fill)
	return res

@functools.partial(jax.jit, static_argnames=("wrapx", "steps"))
def _jump_flood(seed_dec, seed_ra, seed_lab, pos_dec, pos_ra, wrapx, steps):
	"""Jump-flooding: propagate nearest-seed (dec,ra,label) over the grid."""
	def dist(sd, sr):
		return jnp.where(sd > 1e20, BIG,
			utils.angdist(jnp.stack([pos_ra, pos_dec]), jnp.stack([sr, sd])))
	d = dist(seed_dec, seed_ra)
	state = (seed_dec, seed_ra, seed_lab, d)
	offsets = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1) if (dy, dx) != (0, 0)]
	for step in steps:
		for dy, dx in offsets:
			sd = _shift2d(state[0], dy*step, dx*step, wrapx, BIG)
			sr = _shift2d(state[1], dy*step, dx*step, wrapx, 0.0)
			sl = _shift2d(state[2], dy*step, dx*step, wrapx, -1)
			nd = dist(sd, sr)
			better = nd < state[3]
			state = (jnp.where(better, sd, state[0]),
				jnp.where(better, sr, state[1]),
				jnp.where(better, sl, state[2]),
				jnp.where(better, nd, state[3]))
	return state

def _steps_for(n):
	steps = []
	s = 1
	while s < n: s *= 2
	while s >= 1:
		steps.append(int(s)); s //= 2
	# run the sequence twice (JFA^2): single-pass JFA has rare propagation
	# misses; the second pass removes them in practice
	return tuple(steps + steps + [2, 1])

def _is_wrapx(shape, wcs):
	if wcsutils.is_plain(wcs): return False
	return abs(abs(wcs.wcs.cdelt[0])*shape[-1] - 360.0) < 1e-6


def distance_transform(mask, rmax=None, return_inds=False):
	"""Angular distance from each pixel to the nearest pixel where mask is
	False (0 inside the False region). mask: ndmap of bools
	(reference enmap.distance_transform:2127 over distances_core.c)."""
	wcs = mask.wcs
	marr = jnp.asarray(np.asarray(mask) != 0)
	shape = marr.shape
	pos = np.asarray(enmap.posmap(shape, wcs, safe=False))
	pos_dec = jnp.asarray(pos[0]); pos_ra = jnp.asarray(pos[1])
	seed = ~marr
	seed_dec = jnp.where(seed, pos_dec, BIG)
	seed_ra  = jnp.where(seed, pos_ra, 0.0)
	iy, ix = np.mgrid[:shape[-2], :shape[-1]]
	seed_lab = jnp.where(seed, jnp.asarray(iy*shape[-1] + ix), -1)
	sd, sr, sl, d = _jump_flood(seed_dec, seed_ra, seed_lab, pos_dec, pos_ra,
		_is_wrapx(shape, wcs), _steps_for(max(shape[-2:])))
	d = jnp.where(seed, 0.0, d)
	if rmax is not None: d = jnp.minimum(d, rmax)
	if return_inds:
		lab = jnp.where(seed, jnp.asarray(iy*shape[-1] + ix), sl)
		inds = jnp.stack([lab//shape[-1], lab % shape[-1]])
		return enmap.ndmap(d, wcs), inds
	return enmap.ndmap(d, wcs)

def labeled_distance_transform(labels, rmax=None):
	"""Distance from each pixel to the nearest nonzero-labeled pixel, plus
	the Voronoi domain map of those labels
	(reference enmap.labeled_distance_transform:2158)."""
	wcs = labels.wcs
	larr = jnp.asarray(np.asarray(labels))
	shape = larr.shape
	pos = np.asarray(enmap.posmap(shape, wcs, safe=False))
	pos_dec = jnp.asarray(pos[0]); pos_ra = jnp.asarray(pos[1])
	seed = larr != 0
	seed_dec = jnp.where(seed, pos_dec, BIG)
	seed_ra  = jnp.where(seed, pos_ra, 0.0)
	seed_lab = jnp.where(seed, larr, 0)
	sd, sr, sl, d = _jump_flood(seed_dec, seed_ra, seed_lab.astype(jnp.float64),
		pos_dec, pos_ra, _is_wrapx(shape, wcs), _steps_for(max(shape[-2:])))
	d = jnp.where(seed, 0.0, d)
	dom = jnp.where(seed, larr, sl.astype(larr.dtype))
	if rmax is not None:
		dom = jnp.where(d <= rmax, dom, 0)
		d = jnp.minimum(d, rmax)
	return enmap.ndmap(d, wcs), enmap.ndmap(dom, wcs)

def distance_from_points(shape, wcs, points, rmax=None, domains=False):
	"""Angular distance of each pixel from the nearest of points[{dec,ra},n]
	(reference enmap.distance_from:2193)."""
	points = np.asarray(points).reshape(2, -1)
	npt = points.shape[1]
	pos = np.asarray(enmap.posmap(shape[-2:], wcs, safe=False))
	pos_dec = jnp.asarray(pos[0]); pos_ra = jnp.asarray(pos[1])
	if npt <= 1024:
		# brute force in blocks: exact, fully vectorized
		dmin = jnp.full(pos_dec.shape, BIG)
		dom = jnp.zeros(pos_dec.shape, jnp.int32)
		bsize = 128
		for i0 in range(0, npt, bsize):
			blk = points[:, i0:i0+bsize]
			d = utils.angdist(jnp.stack([pos_ra[..., None], pos_dec[..., None]]),
				jnp.stack([jnp.asarray(blk[1]), jnp.asarray(blk[0])]), axis=0)
			bd = jnp.min(d, -1)
			bi = jnp.argmin(d, -1).astype(jnp.int32) + i0
			better = bd < dmin
			dmin = jnp.where(better, bd, dmin)
			dom = jnp.where(better, bi, dom)
	else:
		# approximate for huge catalogs: seed nearest pixels (collisions keep
		# one seed), then jump-flood. Error bounded by inter-seed spacing for
		# colliding seeds; exact otherwise.
		pix = np.round(np.asarray(enmap.sky2pix(shape, wcs, points))).astype(int)
		good = (pix[0] >= 0) & (pix[0] < shape[-2]) & (pix[1] >= 0) & (pix[1] < shape[-1])
		pixg = pix[:, good]
		seed_dec = jnp.full(shape[-2:], BIG).at[pixg[0], pixg[1]].set(jnp.asarray(points[0, good]))
		seed_ra  = jnp.zeros(shape[-2:]).at[pixg[0], pixg[1]].set(jnp.asarray(points[1, good]))
		seed_lab = jnp.full(shape[-2:], -1.0).at[pixg[0], pixg[1]].set(
			jnp.asarray(np.where(good)[0], jnp.float64))
		sd, sr, sl, dmin = _jump_flood(seed_dec, seed_ra, seed_lab, pos_dec, pos_ra,
			_is_wrapx(shape, wcs), _steps_for(max(shape[-2:])))
		dom = sl.astype(jnp.int32)
	if rmax is not None:
		if domains: dom = jnp.where(dmin <= rmax, dom, -1)
		dmin = jnp.minimum(dmin, rmax)
	if domains:
		return enmap.ndmap(dmin, wcs), enmap.ndmap(dom, wcs)
	return enmap.ndmap(dmin, wcs)

def find_edges(mask):
	"""Pixels on the boundary of the True region of mask
	(reference distances.find_edges:275)."""
	m = jnp.asarray(np.asarray(mask) != 0)
	interior = m
	for dy, dx in [(-1, 0), (1, 0), (0, -1), (0, 1)]:
		interior = interior & _shift2d(m, dy, dx, True, True)
	edges = m & ~interior
	return enmap.ndmap(edges, mask.wcs) if isinstance(mask, enmap.ndmap) else edges

def find_edges_labeled(labels):
	l = jnp.asarray(np.asarray(labels))
	edge = jnp.zeros(l.shape, bool)
	for dy, dx in [(-1, 0), (1, 0), (0, -1), (0, 1)]:
		edge = edge | (l != _shift2d(l, dy, dx, True, 0))
	edge = edge & (l != 0)
	return enmap.ndmap(edge, labels.wcs) if isinstance(labels, enmap.ndmap) else edge
