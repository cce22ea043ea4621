"""Minimal native HEALPix geometry (RING ordering).

healpy is absent in this environment; the reference uses it for convenience
wrappers (pixell/curvedsky.py:44-59). We implement the ring geometry math we
need directly: pixel centers, ring structure, pix<->ang in RING ordering.
"""
from __future__ import annotations
import functools
import numpy as np


def npix(nside): return 12*nside*nside

def nside2npix(nside): return npix(nside)

def npix2nside(n):
	res = int(round((n/12)**0.5))
	assert 12*res*res == n, "Invalid healpix pixel count %d" % n
	return res

@functools.lru_cache(maxsize=16)
def ring_info(nside):
	"""Per-ring structure: returns dict of arrays over the 4*nside-1 rings:
	theta (colat of ring), nphi (pixels in ring), phi0 (phi of first pixel
	center), start (first pixel index). (reference gets this from
	curvedsky.get_ring_info_healpix:1192)."""
	n = int(nside)
	nring = 4*n - 1
	i = np.arange(1, nring+1)
	theta = np.empty(nring)
	nphi = np.empty(nring, int)
	phi0 = np.empty(nring)
	# north polar cap: i = 1..n-1
	cap = i < n
	icap = i[cap]
	theta[cap] = np.arccos(1 - icap**2/(3.0*n*n))
	nphi[cap] = 4*icap
	phi0[cap] = np.pi/(4*icap)
	# equatorial belt: n <= i <= 3n
	belt = (i >= n) & (i <= 3*n)
	ibelt = i[belt]
	theta[belt] = np.arccos(4.0/3 - 2.0*ibelt/(3*n))
	nphi[belt] = 4*n
	# phi = pi/(2n) * (j + s/2) with s = (i - n + 1) mod 2
	s = (ibelt - n + 1) % 2
	phi0[belt] = np.pi/(2.0*n)*(s*0.5)
	# south polar cap
	south = i > 3*n
	isouth = 4*n - i[south]
	theta[south] = np.pi - np.arccos(1 - isouth**2/(3.0*n*n))
	nphi[south] = 4*isouth
	phi0[south] = np.pi/(4*isouth)
	start = np.concatenate([[0], np.cumsum(nphi)[:-1]])
	return dict(theta=theta, nphi=nphi, phi0=phi0, start=start, nring=nring)

def pix2ang(nside, ipix):
	"""RING pixel index -> (theta, phi)."""
	info = ring_info(nside)
	ipix = np.asarray(ipix)
	ring = np.searchsorted(info["start"], ipix, side="right") - 1
	j = ipix - info["start"][ring]
	theta = info["theta"][ring]
	phi = info["phi0"][ring] + j*2*np.pi/info["nphi"][ring]
	return theta, phi

def ang2pix(nside, theta, phi):
	"""(theta, phi) -> RING pixel index of the containing pixel (approximate
	nearest-ring assignment, adequate for nearest-pixel lookups)."""
	info = ring_info(nside)
	theta = np.asarray(theta); phi = np.asarray(phi) % (2*np.pi)
	ring = np.searchsorted(info["theta"], theta) - 0
	ring = np.clip(ring, 0, info["nring"]-1)
	# choose closer of ring-1, ring
	prev = np.clip(ring-1, 0, info["nring"]-1)
	closer_prev = np.abs(info["theta"][prev]-theta) < np.abs(info["theta"][ring]-theta)
	ring = np.where(closer_prev, prev, ring)
	nphi = info["nphi"][ring]
	j = np.round((phi - info["phi0"][ring])/(2*np.pi)*nphi).astype(int) % nphi
	return info["start"][ring] + j

def positions(nside):
	"""(theta[npix], phi[npix]) of all pixel centers in RING order."""
	info = ring_info(nside)
	theta = np.repeat(info["theta"], info["nphi"])
	j = np.concatenate([np.arange(n) for n in info["nphi"]])
	phi = np.repeat(info["phi0"], info["nphi"]) + j*2*np.pi/np.repeat(info["nphi"], info["nphi"])
	return theta, phi

def pixsize(nside):
	return 4*np.pi/npix(nside)

def get_interpol(nside, theta, phi):
	"""Bilinear interpolation weights on the healpix grid: returns
	(pix[4, n], weights[4, n]) like healpy.get_interp_weights (ring scheme).
	Uses the two neighboring rings and two pixels in each."""
	info = ring_info(nside)
	theta = np.atleast_1d(theta); phi = np.atleast_1d(phi) % (2*np.pi)
	th = info["theta"]
	r1 = np.clip(np.searchsorted(th, theta) - 1, 0, info["nring"]-1)
	r2 = np.clip(r1 + 1, 0, info["nring"]-1)
	t1, t2 = th[r1], th[r2]
	wy = np.where(r2 != r1, (theta - t1)/np.where(t2 != t1, t2 - t1, 1), 0.0)
	wy = np.clip(wy, 0, 1)
	pixs = np.empty((4, len(theta)), int)
	wts = np.empty((4, len(theta)))
	for k, (ring, wrow) in enumerate([(r1, 1-wy), (r2, wy)]):
		nphi = info["nphi"][ring]
		x = (phi - info["phi0"][ring])/(2*np.pi)*nphi
		j1 = np.floor(x).astype(int)
		fx = x - j1
		pixs[2*k]   = info["start"][ring] + (j1 % nphi)
		pixs[2*k+1] = info["start"][ring] + ((j1+1) % nphi)
		wts[2*k]    = wrow*(1-fx)
		wts[2*k+1]  = wrow*fx
	return pixs, wts
