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
