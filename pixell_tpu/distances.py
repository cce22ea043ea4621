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


# ---------------------------------------------------------------------------
# HEALPix distance transforms (reference cython/distances.pyx:338-475 over
# distances_core.c). The reference walks pixel neighbors with a wavefront
# ("bubble") or heap -- serial algorithms. Here the RING pixelization is
# embedded in a uniform [nring, 4*nside] grid (each ring nearest-neighbor
# upsampled to the equatorial width), where the same data-parallel jump
# flooding as the CAR case applies; candidates carry exact (dec, ra), so
# the embedding only defines the propagation topology, not the metric.
# ---------------------------------------------------------------------------
class healpix_info:
	"""Ring structure of a HEALPix map (reference distances.healpix_info:338):
	ny rings with nx[y] pixels each, first pixel at ra0[y], starting at flat
	index off[y]."""
	def __init__(self, nside):
		from . import healpix
		ri = healpix.ring_info(nside)
		self.nside = int(nside)
		self.npix = healpix.npix(nside)
		self.ny = ri["nring"]
		self.nx = ri["nphi"].astype(np.int64)
		self.off = ri["start"].astype(np.int64)
		self.ra0 = ri["phi0"].copy()
		self.dec = np.pi/2 - ri["theta"]
		self.cos_dec = np.cos(self.dec)
		self.sin_dec = np.sin(self.dec)
		# shift flag like the reference: first pixel offset by half a step
		self.shift = (self.ra0 > 0).astype(int)

def unravel_healpix(info, pix1d):
	"""Flat healpix indices -> [{y,x},...] ring coordinates."""
	pix1d = np.asarray(pix1d, np.int64)
	y = np.searchsorted(info.off, pix1d, side="right") - 1
	return np.array([y, pix1d - info.off[y]], np.int64)

def ravel_healpix(info, pix2d):
	"""[{y,x},...] ring coordinates -> flat healpix indices."""
	pix2d = np.asarray(pix2d, np.int64)
	return info.off[pix2d[0]] + pix2d[1]

def _hp_pos(info, y, x):
	"""(dec, ra) of ring pixels."""
	return info.dec[y], info.ra0[y] + x*(2*np.pi)/info.nx[y]

@functools.lru_cache(maxsize=8)
def _hp_neighbors(nside):
	"""[4, npix] flat neighbor indices (W, E, up-nearest, down-nearest) via
	ra rounding into adjacent rings. Poles: the missing vertical neighbor
	points back at the pixel itself (a no-op in comparisons)."""
	info = healpix_info(nside)
	y = np.repeat(np.arange(info.ny), info.nx)
	x = np.arange(info.npix) - info.off[y]
	nx = info.nx[y]
	west = info.off[y] + (x - 1) % nx
	east = info.off[y] + (x + 1) % nx
	_, ra = _hp_pos(info, y, x)
	def vert(y2):
		ok = (y2 >= 0) & (y2 < info.ny)
		y2c = np.clip(y2, 0, info.ny - 1)
		nx2 = info.nx[y2c]
		x2 = np.round((ra - info.ra0[y2c])*nx2/(2*np.pi)).astype(np.int64) % nx2
		return np.where(ok, info.off[y2c] + x2, info.off[y] + x)
	return np.stack([west, east, vert(y - 1), vert(y + 1)])

def get_healpix_neighs(info, y, x):
	"""[2,4] {y,x} neighbors of ring pixel (y, x) (reference
	distances.get_healpix_neighs)."""
	n = _hp_neighbors(info.nside)[:, info.off[y] + x]
	return unravel_healpix(info, n)

def find_edges_healpix(info, mask, flat=True):
	"""Pixels of the ZERO region of mask adjacent to a nonzero pixel
	(reference distances.find_edges_healpix:365)."""
	m = np.asarray(mask).reshape(-1) != 0
	neigh = _hp_neighbors(info.nside)
	edge = ~m & (m[neigh[0]] | m[neigh[1]] | m[neigh[2]] | m[neigh[3]])
	idx = np.where(edge)[0]
	return idx if flat else unravel_healpix(info, idx)

def find_edges_labeled_healpix(info, labels, flat=True):
	"""Pixels on the edge of a nonzero same-label region (reference
	distances.find_edges_labeled_healpix)."""
	l = np.asarray(labels).reshape(-1)
	neigh = _hp_neighbors(info.nside)
	edge = (l != 0) & ((l != l[neigh[0]]) | (l != l[neigh[1]]) |
		(l != l[neigh[2]]) | (l != l[neigh[3]]))
	idx = np.where(edge)[0]
	return idx if flat else unravel_healpix(info, idx)

def _hp_positions_all(info):
	y = np.repeat(np.arange(info.ny), info.nx)
	x = np.arange(info.npix) - info.off[y]
	return _hp_pos(info, y, x)

def distance_from_points_healpix(info, point_pos, point_pix=None, rmax=None,
		omap=None, odomains=None, domains=False, method="auto"):
	"""Distance from each healpix pixel to the nearest of the points
	point_pos[{dec,ra},npoint] (reference
	distances.distance_from_points_healpix:418). domains=True also returns
	the index of the nearest point per pixel (-1 where rmax cut off the
	search). method: "brute" (exact, O(npix*npoint)), "grid" (jump flooding
	on the uniform ring embedding; "bubble"/"heap" alias it for reference
	API compatibility), "auto"."""
	point_pos = np.asarray(point_pos, float)
	npoint = point_pos.shape[1]
	if method == "auto":
		method = "brute" if npoint*info.npix <= 2e8 else "grid"
	if method in ("bubble", "heap"): method = "grid"
	dec, ra = _hp_positions_all(info)
	if method == "brute":
		pd = jnp.asarray(dec); pr = jnp.asarray(ra)
		sd = jnp.asarray(point_pos[0]); sr = jnp.asarray(point_pos[1])
		chunk = max(int(2e7)//max(npoint, 1), 1)
		ds, ls = [], []
		for i0 in range(0, info.npix, chunk):
			d = utils.angdist(
				jnp.stack([pr[i0:i0+chunk, None], pd[i0:i0+chunk, None]]),
				jnp.stack([sr[None, :], sd[None, :]]), axis=0)
			ds.append(jnp.min(d, -1)); ls.append(jnp.argmin(d, -1))
		d = np.asarray(jnp.concatenate(ds)); lab = np.asarray(jnp.concatenate(ls))
	else:
		W = 4*info.nside
		ny = info.ny
		yg = np.arange(ny)[:, None] + np.zeros((1, W), int)
		xg = (np.arange(W)[None, :]*info.nx[:, None])//W
		gdec, gra = _hp_pos(info, yg, xg)
		if point_pix is None:
			from . import healpix
			point_pix = healpix.ang2pix(info.nside,
				np.pi/2 - point_pos[0], point_pos[1])
		point_pix = np.asarray(point_pix)
		if point_pix.ndim == 1: point_pix = unravel_healpix(info, point_pix)
		py, px = point_pix[0], point_pix[1]
		cg = ((2*px + 1)*W)//(2*info.nx[py])
		sd = np.full((ny, W), BIG); sr = np.zeros((ny, W)); sl = np.full((ny, W), -1)
		sd[py, cg] = point_pos[0]; sr[py, cg] = point_pos[1]
		sl[py, cg] = np.arange(npoint)
		steps = _steps_for(max(ny, W))
		res = _jump_flood(jnp.asarray(sd), jnp.asarray(sr),
			jnp.asarray(sl), jnp.asarray(gdec), jnp.asarray(gra), True,
			tuple(steps))
		# read each pixel back at the cell it owns
		yv = np.repeat(np.arange(ny), info.nx)
		xv = np.arange(info.npix) - info.off[yv]
		cv = ((2*xv + 1)*W)//(2*info.nx[yv])
		d = np.asarray(res[3])[yv, cv]
		lab = np.asarray(res[2])[yv, cv].astype(np.int32)
	if rmax is not None and rmax > 0:
		lab = np.where(d > rmax, -1, lab)
		d = np.minimum(d, rmax)
	if omap is not None: omap[:] = d; d = omap
	if odomains is not None: odomains[:] = lab; lab = odomains
	return (d, lab.astype(np.int32)) if domains else d
