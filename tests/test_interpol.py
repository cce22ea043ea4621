"""Interpolation tests (reference test_pixell.py:1269-1360 pattern:
exactness at nodes, adjointness, derivative consistency)."""
import numpy as np
import jax.numpy as jnp
import pytest
from pixell_tpu import interpol, enmap, utils


def test_exact_at_nodes():
	rng = np.random.default_rng(0)
	d = rng.standard_normal((8, 16))
	iy, ix = np.mgrid[:8, :16]
	pts = jnp.asarray(np.array([iy.ravel()*1.0, ix.ravel()*1.0]))
	for mode, order in [("spline", 0), ("spline", 1), ("spline", 3), ("lanczos", 3)]:
		got = np.asarray(interpol.map_coordinates(jnp.asarray(d), pts, mode=mode, order=order))
		assert np.allclose(got, d.ravel(), atol=1e-8), (mode, order)

def test_conv_not_interpolating():
	# mode="conv" order 3 without prefilter smooths: NOT exact at nodes
	rng = np.random.default_rng(1)
	d = rng.standard_normal((8, 16))
	pts = jnp.asarray(np.array([[2.0], [3.0]]))
	got = np.asarray(interpol.map_coordinates(jnp.asarray(d), pts, mode="conv", prefilter=False))
	want = (d[1,3]+4*d[2,3]+d[3,3])/6  # y-direction b-spline blur at x exact? x also blurred
	assert not np.allclose(got[0], d[2, 3])

def test_linear_midpoint():
	d = jnp.asarray(np.array([[0.0, 1.0], [2.0, 3.0]]))
	pts = jnp.asarray(np.array([[0.5], [0.5]]))
	got = np.asarray(interpol.map_coordinates(d, pts, order=1))
	assert np.allclose(got[0], 1.5)

def test_smooth_function_accuracy():
	# cubic spline should reproduce a smooth band-limited function well
	n = 64
	y, x = np.mgrid[:n, :n]
	f = lambda yy, xx: np.sin(2*np.pi*3*yy/n)*np.cos(2*np.pi*2*xx/n)
	d = jnp.asarray(f(y, x))
	rng = np.random.default_rng(2)
	py = rng.uniform(0, n, 100); px = rng.uniform(0, n, 100)
	got = np.asarray(interpol.map_coordinates(d, jnp.asarray(np.array([py, px])), order=3, border="cyclic"))
	want = f(py, px)
	assert np.abs(got - want).max() < 2e-3

def test_deriv():
	n = 64
	y, x = np.mgrid[:n, :n]
	f  = lambda yy, xx: np.sin(2*np.pi*3*yy/n)*np.cos(2*np.pi*2*xx/n)
	fy = lambda yy, xx: 2*np.pi*3/n*np.cos(2*np.pi*3*yy/n)*np.cos(2*np.pi*2*xx/n)
	fx = lambda yy, xx: -2*np.pi*2/n*np.sin(2*np.pi*3*yy/n)*np.sin(2*np.pi*2*xx/n)
	d = jnp.asarray(f(y, x))
	rng = np.random.default_rng(3)
	py = rng.uniform(0, n, 50); px = rng.uniform(0, n, 50)
	got = np.asarray(interpol.map_coordinates(d, jnp.asarray(np.array([py, px])),
		order=3, border="cyclic", deriv=True))
	assert np.abs(got[0] - fy(py, px)).max() < 2e-3
	assert np.abs(got[1] - fx(py, px)).max() < 2e-3

def test_transpose_adjoint():
	rng = np.random.default_rng(4)
	d = rng.standard_normal((8, 16))
	pts = jnp.asarray(rng.uniform(0, 8, (2, 30))*np.array([1, 2])[:, None])
	v = rng.standard_normal(30)
	fwd = np.asarray(interpol.map_coordinates(jnp.asarray(d), pts, order=3))
	back = np.asarray(interpol.map_coordinates(jnp.asarray(d*0), pts,
		odata=jnp.asarray(v), order=3, trans=True))
	lhs = np.sum(fwd*v)
	rhs = np.sum(back*d)
	assert np.allclose(lhs, rhs, rtol=1e-10)

def test_spline_filter_roundtrip():
	# prefilter then conv-interpolate at nodes = original
	rng = np.random.default_rng(5)
	d = rng.standard_normal((16, 16))
	c = np.asarray(interpol.spline_filter(jnp.asarray(d), order=3, border="cyclic"))
	# apply B-spline blur [1/6, 4/6, 1/6] in both dims
	blur = lambda a, ax: (np.roll(a, 1, ax) + 4*a + np.roll(a, -1, ax))/6
	rec = blur(blur(c, 0), 1)
	assert np.abs(rec - d).max() < 1e-10

def test_borders():
	d = jnp.asarray(np.arange(16.0).reshape(4, 4))
	pts = jnp.asarray(np.array([[-1.0], [2.0]]))
	for border, want in [("zero", 0.0), ("nearest", 2.0), ("cyclic", 14.0)]:
		got = np.asarray(interpol.map_coordinates(d, pts, order=1, border=border))
		assert np.allclose(got, want), border

def test_resample_fft_map():
	from pixell_tpu import resample
	shape, wcs = enmap.fullsky_geometry(res=6*utils.degree)
	rng = np.random.default_rng(6)
	m = enmap.ndmap(jnp.asarray(rng.standard_normal(shape)), wcs)
	up = resample.resample(m, 2.0, method="fft")
	assert up.shape == (shape[0]*2, shape[1]*2)
	down = resample.resample(up, 0.5, method="fft")
	assert np.allclose(np.asarray(down), np.asarray(m), atol=1e-8)

def test_project_map():
	# project a smooth map onto a shifted geometry and compare with truth
	shape, wcs = enmap.geometry(pos=np.array([[-10, 10], [10, -10]])*utils.degree,
		res=0.5*utils.degree, proj="car")
	pos = np.asarray(enmap.posmap(shape, wcs))
	f = lambda dec, ra: np.sin(dec*20)*np.cos(ra*15)
	m = enmap.ndmap(jnp.asarray(f(pos[0], pos[1])), wcs)
	shape2, wcs2 = enmap.geometry(pos=np.array([[-5, 5], [5, -5]])*utils.degree,
		res=0.3*utils.degree, proj="car")
	p = m.project(shape2, wcs2, order=3)
	pos2 = np.asarray(enmap.posmap(shape2, wcs2))
	want = f(pos2[0], pos2[1])
	assert np.abs(np.asarray(p) - want).max() < 1e-3


def test_spline_orders_vs_scipy():
	# orders 2,4,5 (new) against scipy.ndimage as oracle
	from scipy import ndimage
	rng = np.random.default_rng(3)
	data = rng.standard_normal((24, 25))
	pts = np.stack([rng.uniform(3, 20, 40), rng.uniform(3, 21, 40)])
	for order in [2, 4, 5]:
		mine = np.asarray(interpol.map_coordinates(jnp.asarray(data),
			jnp.asarray(pts), order=order, border="mirror"))
		ref = ndimage.map_coordinates(data, pts, order=order, mode="mirror")
		assert np.max(np.abs(mine - ref)) < 1e-10, order
	# node exactness and adjointness at order 5
	ipts = np.stack([np.arange(10.0), np.arange(10.0)])
	mine = np.asarray(interpol.map_coordinates(jnp.asarray(data),
		jnp.asarray(ipts), order=5, border="cyclic"))
	assert np.max(np.abs(mine - data[np.arange(10), np.arange(10)])) < 1e-10


def test_shift_interp_vs_gather():
	"""fft.shift_interp (gather-free displaced-grid ES interpolation) must be
	numerically identical to the per-point gather NUFFT core at
	(y + dy, x + dx)."""
	from pixell_tpu import fft as efft
	rng = np.random.default_rng(0)
	C, ny, nx = 2, 32, 48
	w, beta = efft._es_params(1e-5)
	K = 3.0
	fmap = rng.standard_normal((C, ny, nx))
	dy = rng.uniform(-K, K, (ny, nx))
	dx = rng.uniform(-K, K, (ny, nx))
	a = np.asarray(efft.shift_interp(jnp.asarray(fmap), jnp.asarray(dy),
		jnp.asarray(dx), K, w, float(beta)))
	yy, xx = np.mgrid[:ny, :nx]
	py = (yy + dy).reshape(-1)
	px = (xx + dx).reshape(-1)
	b = np.asarray(efft._u2nu_2d_core(jnp.asarray(fmap), jnp.asarray(py),
		jnp.asarray(px), (ny, nx), w, float(beta))).reshape(C, ny, nx)
	assert np.abs(a - b).max() < 1e-12*np.abs(b).max() + 1e-13
