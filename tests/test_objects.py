"""Distance transforms and point-source painting tests."""
import numpy as np
import jax.numpy as jnp
import pytest
from pixell_tpu import enmap, distances, pointsrcs, utils


def patch(res_deg=0.5, n=40):
	return enmap.geometry(pos=np.array([[-n*res_deg/2, n*res_deg/2],
		[n*res_deg/2, -n*res_deg/2]])*utils.degree, shape=(n, n), proj="car")

def test_distance_from_points_brute():
	shape, wcs = patch()
	pts = np.array([[0.0], [0.0]])
	d = distances.distance_from_points(shape, wcs, pts)
	pos = np.asarray(enmap.posmap(shape, wcs))
	want = utils.angdist(np.array([pos[1], pos[0]]), np.array([0.0, 0.0]), axis=0)
	assert np.abs(np.asarray(d) - want).max() < 1e-12

def test_distance_from_many_points_jfa():
	shape, wcs = patch(0.5, 64)
	rng = np.random.default_rng(0)
	n = 100
	dec = rng.uniform(-0.2, 0.2, n); ra = rng.uniform(-0.2, 0.2, n)
	pts = np.array([dec, ra])
	d = np.asarray(distances.distance_from_points(shape, wcs, pts))
	# brute force check
	pos = np.asarray(enmap.posmap(shape, wcs))
	want = np.min([utils.angdist(np.array([pos[1], pos[0]]),
		np.array([ra[i], dec[i]]), axis=0) for i in range(n)], 0)
	assert np.abs(d - want).max() < 1e-10

@pytest.mark.slow
def test_distance_transform():
	shape, wcs = patch()
	mask = enmap.zeros(shape, wcs).astype(bool)
	mask = enmap.ndmap(np.ones(shape, bool), wcs)
	arr = np.ones(shape, bool); arr[18:22, 18:22] = False
	mask = enmap.ndmap(arr, wcs)
	d = np.asarray(distances.distance_transform(mask))
	assert d[20, 20] == 0
	assert d[0, 0] > 0.1*utils.degree
	# monotonically increasing away from the hole along a row
	row = d[20, 22:]
	assert np.all(np.diff(row) > 0)

def test_find_edges():
	shape, wcs = patch()
	arr = np.zeros(shape, bool); arr[10:20, 10:20] = True
	e = np.asarray(distances.find_edges(enmap.ndmap(arr, wcs)))
	assert e[10, 10] and e[10, 15] and e[19, 19]
	assert not e[15, 15]
	assert not e[5, 5]

def test_sim_objects_gaussian():
	shape, wcs = patch(0.25, 64)
	sigma = 0.5*utils.degree
	r = np.linspace(0, 5*sigma, 1000)
	prof = np.array([r, np.exp(-0.5*(r/sigma)**2)])
	poss = np.array([[0.0, 1.0*utils.degree], [0.0, -2.0*utils.degree]])
	amps = np.array([10.0, 5.0])
	m = pointsrcs.sim_objects(shape, wcs, poss, amps, prof, dtype=np.float64)
	pos = np.asarray(enmap.posmap(shape, wcs))
	r1 = utils.angdist(np.array([pos[1], pos[0]]), np.array([poss[1, 0], poss[0, 0]]), axis=0)
	r2 = utils.angdist(np.array([pos[1], pos[0]]), np.array([poss[1, 1], poss[0, 1]]), axis=0)
	want = 10*np.exp(-0.5*(r1/sigma)**2) + 5*np.exp(-0.5*(r2/sigma)**2)
	assert np.abs(np.asarray(m) - want).max() < 1e-4  # profile lin-interp resolution

def test_sim_objects_max_op():
	shape, wcs = patch(0.25, 64)
	sigma = 0.5*utils.degree
	r = np.linspace(0, 5*sigma, 500)
	prof = np.array([r, np.exp(-0.5*(r/sigma)**2)])
	poss = np.array([[0.0, 0.0], [0.0, 0.1*utils.degree]])
	amps = np.array([10.0, 5.0])
	m = pointsrcs.sim_objects(shape, wcs, poss, amps, prof, op="max", dtype=np.float64)
	cy, cx = 32, 32
	assert abs(np.asarray(m).max() - 10.0) < 0.1

def test_radial_sum_photometry():
	shape, wcs = patch(0.25, 64)
	sigma = 0.5*utils.degree
	r = np.linspace(0, 6*sigma, 1000)
	prof = np.array([r, np.exp(-0.5*(r/sigma)**2)])
	poss = np.array([[0.0], [0.0]])
	amps = np.array([7.0])
	m = pointsrcs.sim_objects(shape, wcs, poss, amps, prof, dtype=np.float64)
	bins = np.linspace(0, 3*sigma, 10)
	sums = pointsrcs.radial_sum(m, poss, bins)
	# total flux check: sum over bins ~ amp * 2 pi sigma^2 / pixarea
	total = sums.sum()
	want = 7.0*2*np.pi*sigma**2/enmap.pixsize(shape, wcs)
	assert abs(total/want - 1) < 0.05

def test_sim_srcs_legacy():
	shape, wcs = patch(0.25, 64)
	srcs = np.array([[0.0, 0.0, 3.0]])
	m = pointsrcs.sim_srcs(shape, wcs, srcs, beam=0.3*utils.degree, dtype=np.float64)
	assert abs(float(np.asarray(m).max()) - 3.0) < 1e-3


def test_sim_objects_transpose_adjoint():
	"""<paint(a), m> == <a, paint^T(m)> (reference srcsim transpose mode)."""
	shape, wcs = patch(0.5, 48)
	rng = np.random.default_rng(3)
	n = 25
	dec = rng.uniform(-0.15, 0.15, n); ra = rng.uniform(-0.15, 0.15, n)
	poss = np.array([dec, ra])
	amps = rng.standard_normal(n).astype(np.float32)
	sigma = 1.2*utils.degree
	fwd = pointsrcs.sim_objects(shape, wcs, poss, amps, sigma,
		vmin=1e-6)
	m = rng.standard_normal(fwd.shape).astype(np.float32)
	adj = pointsrcs.sim_objects(shape, wcs, poss, amps, sigma,
		vmin=1e-6, transpose=True,
		omap=enmap.ndmap(jnp.asarray(m), wcs))
	lhs = float(np.sum(np.asarray(fwd)*m))
	rhs = float(np.sum(adj*amps))
	assert abs(lhs - rhs) < 1e-3*max(abs(lhs), 1.0), (lhs, rhs)


def test_sim_objects_transpose_multicomp():
	"""Adjoint with [ncomp, nobj] amplitudes."""
	shape, wcs = patch(0.5, 40)
	rng = np.random.default_rng(4)
	n = 10
	poss = np.array([rng.uniform(-0.1, 0.1, n), rng.uniform(-0.1, 0.1, n)])
	amps = rng.standard_normal((3, n)).astype(np.float32)
	sigma = 1.0*utils.degree
	fwd = pointsrcs.sim_objects(shape, wcs, poss, amps, sigma, vmin=1e-6)
	assert fwd.shape == (3,) + tuple(shape[-2:])
	m = rng.standard_normal(fwd.shape).astype(np.float32)
	adj = pointsrcs.sim_objects(shape, wcs, poss, amps, sigma, vmin=1e-6,
		transpose=True, omap=enmap.ndmap(jnp.asarray(m), wcs))
	assert adj.shape == amps.shape
	lhs = float(np.sum(np.asarray(fwd)*m))
	rhs = float(np.sum(adj*amps))
	assert abs(lhs - rhs) < 1e-3*max(abs(lhs), 1.0), (lhs, rhs)


def test_sim_objects_per_source_radius():
	"""A bright extended source must not inflate the radius of faint ones:
	faint far-away sources still painted correctly (they are, with per-source
	rmax, since correctness only needs the radius to COVER the profile)."""
	shape, wcs = patch(0.5, 64)
	rng = np.random.default_rng(5)
	poss = np.array([[0.0, 0.18], [0.0, -0.18]])
	amps = np.array([1000.0, 1.0], np.float32)
	sigma = 0.8*utils.degree
	res = pointsrcs.sim_objects(shape, wcs, poss, amps, sigma, vmin=1e-4)
	# each peak should match amp * profile(distance of nearest pixel center)
	pix = np.round(np.asarray(enmap.sky2pix(shape, wcs, poss))).astype(int)
	pos = np.asarray(enmap.posmap(shape, wcs))
	vals = np.asarray(res)[pix[0], pix[1]]
	for i, amp in enumerate([1000.0, 1.0]):
		d = utils.angdist(np.array([pos[1, pix[0, i], pix[1, i]],
			pos[0, pix[0, i], pix[1, i]]]), np.array([poss[1, i], poss[0, i]]))
		want = amp*np.exp(-0.5*(float(d)/sigma)**2)
		assert abs(vals[i] - want) < 1e-3*amp + 1e-3, (i, vals[i], want)


def test_sim_objects_fullsky_wrap():
	"""Objects near RA=180 paint across the wrap on a full-sky geometry."""
	shape, wcs = enmap.fullsky_geometry(res=1*utils.degree, variant="cc")
	poss = np.array([[0.0], [np.pi - 1e-9]])
	amps = np.array([1.0], np.float32)
	res = pointsrcs.sim_objects(shape, wcs, poss, amps, 3*utils.degree,
		vmin=1e-5)
	tot = np.asarray(res)
	# signal must appear on both RA edges of the map
	assert tot[:, :3].max() > 1e-3
	assert tot[:, -3:].max() > 1e-3


def test_healpix_info_structure():
	info = distances.healpix_info(8)
	assert info.npix == 768 and info.ny == 31
	assert info.nx[0] == 4 and info.nx[8] == 32 and info.nx[-1] == 4
	assert info.off[-1] + info.nx[-1] == info.npix
	# ravel/unravel roundtrip
	pix = np.arange(info.npix)
	yx = distances.unravel_healpix(info, pix)
	assert (distances.ravel_healpix(info, yx) == pix).all()
	assert (yx[1] < info.nx[yx[0]]).all()

@pytest.mark.slow
def test_healpix_distance_from_points():
	"""Grid (JFA) method vs exact brute force on nside 64 (reference
	distances.distance_from_points_healpix semantics)."""
	info = distances.healpix_info(64)
	rng = np.random.default_rng(1)
	n = 30
	pts = np.array([rng.uniform(-1.4, 1.4, n), rng.uniform(0, 2*np.pi, n)])
	d1, l1 = distances.distance_from_points_healpix(info, pts, domains=True,
		method="brute")
	d2, l2 = distances.distance_from_points_healpix(info, pts, domains=True,
		method="grid")
	pix = (4*np.pi/info.npix)**0.5
	assert np.abs(d1 - d2).max() < 3*pix
	assert (l1 == l2).mean() > 0.98
	# rmax caps distances and marks domains invalid
	d3, l3 = distances.distance_from_points_healpix(info, pts, domains=True,
		method="brute", rmax=0.1)
	assert d3.max() <= 0.1 + 1e-12
	assert (l3[d1 > 0.1] == -1).all()

def test_healpix_find_edges():
	"""Edges of the zero region of a disc mask: a thin shell just outside
	the disc (reference find_edges_healpix: zero pixels with a nonzero
	neighbor)."""
	info = distances.healpix_info(32)
	dec, ra = distances._hp_positions_all(info)
	r = utils.angdist(np.stack([ra, dec]), np.array([1.0, 0.3]), axis=0)
	mask = r < 0.4
	edges = distances.find_edges_healpix(info, mask)
	assert len(edges) > 0
	# every edge pixel is outside the disc but near its boundary
	assert (~mask[edges]).all()
	assert (np.abs(r[edges] - 0.4) < 3*(4*np.pi/info.npix)**0.5).all()
	# 2d form consistent
	yx = distances.find_edges_healpix(info, mask, flat=False)
	assert (distances.ravel_healpix(info, yx) == edges).all()
	# labeled version: edge pixels belong to the labeled region
	lab = mask.astype(np.int32)
	le = distances.find_edges_labeled_healpix(info, lab)
	assert (mask[le]).all()
