"""ndmap container and flat-sky transform tests."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from pixell_tpu import enmap, utils, fft as enfft


def small_geo(ny=32, nx=64):
	box = np.array([[-4, 8], [4, -8]])*utils.degree
	return enmap.geometry(pos=box, shape=(ny, nx), proj="car")


def test_ndmap_arith_keeps_wcs():
	shape, wcs = small_geo()
	m = enmap.ones(shape, wcs)
	m2 = m*2 + 1
	assert isinstance(m2, enmap.ndmap)
	assert m2.wcs is wcs or m2.wcs == wcs
	assert np.allclose(np.asarray(m2), 3)

def test_ndmap_slicing_wcs():
	shape, wcs = small_geo()
	m = enmap.ndmap(np.arange(32*64.).reshape(32, 64), wcs)
	sub = m[4:10, 8:20]
	assert sub.shape == (6, 12)
	p1 = np.asarray(m.pix2sky(np.array([[4.0], [8.0]])))
	p2 = np.asarray(sub.pix2sky(np.array([[0.0], [0.0]])))
	assert np.allclose(p1, p2)

def test_ndmap_int_index_drops_map():
	shape, wcs = small_geo()
	m = enmap.zeros((3,)+shape, wcs)
	assert isinstance(m[0], enmap.ndmap)
	assert not isinstance(m[0, 0], enmap.ndmap)  # row: no longer a full map
	assert not isinstance(m[:, 0, 0], enmap.ndmap)

def test_ndmap_pytree():
	shape, wcs = small_geo()
	m = enmap.ndmap(jnp.ones(shape), wcs)
	@jax.jit
	def f(x):
		return x*2
	r = f(m)
	assert isinstance(r, enmap.ndmap)
	assert r.wcs == wcs
	assert np.allclose(np.asarray(r), 2)

def test_fft_roundtrip():
	shape, wcs = small_geo()
	rng = np.random.default_rng(1)
	m = enmap.ndmap(rng.standard_normal(shape), wcs)
	f = enmap.fft(m)
	m2 = enmap.ifft(f).real
	assert np.allclose(np.asarray(m2), np.asarray(m), atol=1e-10)

def test_fft_normalization():
	# normalize=True should make fft norm-preserving (unitary)
	shape, wcs = small_geo()
	rng = np.random.default_rng(2)
	m = enmap.ndmap(rng.standard_normal(shape), wcs)
	f = enmap.fft(m, normalize=True)
	assert np.allclose(np.sum(np.abs(np.asarray(f))**2), np.sum(np.asarray(m)**2), rtol=1e-10)

def test_dct_types_match_scipy():
	from scipy.fft import dct as sdct, dst as sdst
	rng = np.random.default_rng(3)
	x = rng.standard_normal((5, 17))
	for ours, scipy_fun, stype in [
			("DCT-I", sdct, 1), ("DCT-II", sdct, 2), ("DCT-III", sdct, 3), ("DCT-IV", sdct, 4),
			("DST-I", sdst, 1), ("DST-II", sdst, 2), ("DST-III", sdst, 3), ("DST-IV", sdst, 4)]:
		got = np.asarray(enfft.dct(x, type=ours, axes=(-1,)))
		want = scipy_fun(x, type=stype, axis=-1)
		assert np.allclose(got, want, atol=1e-8), ours

def test_idct_inverse():
	rng = np.random.default_rng(4)
	x = rng.standard_normal((3, 16))
	for t in ["DCT-I", "DCT-II", "DCT-III", "DCT-IV", "DST-I", "DST-II", "DST-III", "DST-IV"]:
		y = enfft.dct(x, type=t, axes=(-1,))
		x2 = np.asarray(enfft.idct(y, type=t, axes=(-1,), normalize=True))
		assert np.allclose(x2, x, atol=1e-8), t

def test_map2harm_roundtrip_pol():
	shape, wcs = small_geo()
	rng = np.random.default_rng(5)
	m = enmap.ndmap(rng.standard_normal((3,)+shape), wcs)
	h = enmap.map2harm(m)
	m2 = enmap.harm2map(h)
	assert np.allclose(np.asarray(m2), np.asarray(m), atol=1e-8)

def test_extract_insert_roundtrip():
	shape, wcs = small_geo(64, 128)
	rng = np.random.default_rng(6)
	m = enmap.ndmap(rng.standard_normal(shape), wcs)
	pixbox = np.array([[10, 20], [40, 100]])
	sub = enmap.extract_pixbox(m, pixbox)
	assert sub.shape == (30, 80)
	assert np.allclose(np.asarray(sub), np.asarray(m)[10:40, 20:100])
	# re-insert into zeros
	z = enmap.zeros(shape, wcs)
	enmap.insert(z, sub)
	assert np.allclose(np.asarray(z)[10:40, 20:100], np.asarray(sub))
	assert np.allclose(np.asarray(z)[:10], 0)

def test_extract_wrap():
	# fullsky map: extraction beyond RA edge should wrap
	shape, wcs = enmap.fullsky_geometry(res=5*utils.degree, variant="cc")
	m = enmap.ndmap(np.arange(np.prod(shape), dtype=float).reshape(shape), wcs)
	pixbox = np.array([[10, -5], [20, 5]])
	sub = enmap.extract_pixbox(m, pixbox)
	assert sub.shape == (10, 10)
	assert np.allclose(np.asarray(sub)[:, :5], np.asarray(m)[10:20, -5:])
	assert np.allclose(np.asarray(sub)[:, 5:], np.asarray(m)[10:20, :5])

def test_submap():
	shape, wcs = enmap.fullsky_geometry(res=1*utils.degree, variant="cc")
	m = enmap.ndmap(np.zeros(shape), wcs)
	box = np.array([[-10, 20], [10, -20]])*utils.degree
	sub = m.submap(box)
	assert abs(sub.shape[-2] - 20) <= 1
	assert abs(sub.shape[-1] - 40) <= 1

def test_downgrade_upgrade():
	shape, wcs = small_geo(32, 64)
	m = enmap.ndmap(np.arange(32*64.).reshape(32, 64), wcs)
	d = enmap.downgrade(m, 2)
	assert d.shape == (16, 32)
	u = enmap.upgrade(d, 2)
	assert u.shape == (32, 64)

def test_project_same_geometry():
	shape, wcs = small_geo()
	rng = np.random.default_rng(8)
	m = enmap.ndmap(rng.standard_normal(shape), wcs)
	p = m.project(shape, wcs, order=1)
	assert np.allclose(np.asarray(p), np.asarray(m), atol=1e-8)

def test_rand_map_spectrum():
	# white spectrum should produce map with approximately right variance
	shape, wcs = enmap.fullsky_geometry(res=2*utils.degree, variant="cc")
	nl = 200
	cl = np.ones(nl)*1e-2
	m = enmap.rand_map(shape, wcs, cl[None, None], seed=1, scalar=True)
	assert m.shape == shape

def test_queb_roundtrip():
	shape, wcs = small_geo()
	rng = np.random.default_rng(9)
	m = enmap.ndmap(rng.standard_normal((3,)+shape), wcs)
	h = enmap.map2harm(m, spin=[0, 2])
	m2 = enmap.harm2map(h, spin=[0, 2])
	assert np.allclose(np.asarray(m2), np.asarray(m), atol=1e-8)

def test_apod():
	shape, wcs = small_geo()
	m = enmap.ones(shape, wcs)
	a = enmap.apod(m, 8)
	arr = np.asarray(a)
	assert np.allclose(arr[0], 0, atol=1e-12)
	assert np.allclose(arr[16, 32], 1)

def test_io_roundtrip_hdf(tmp_path):
	shape, wcs = small_geo()
	rng = np.random.default_rng(10)
	m = enmap.ndmap(rng.standard_normal((2,)+shape), wcs)
	fname = str(tmp_path/"test.h5")
	enmap.write_map(fname, m)
	m2 = enmap.read_map(fname)
	assert np.allclose(np.asarray(m2), np.asarray(m))
	assert wcsutils_equal(m2.wcs, m.wcs)

def wcsutils_equal(w1, w2):
	from pixell_tpu import wcsutils
	return wcsutils.equal(w1, w2, tol=1e-9)

def test_fourier_shift():
	n = 64
	x = np.sin(2*np.pi*3*np.arange(n)/n)
	y = np.asarray(enfft.shift(x, 0.5))
	want = np.sin(2*np.pi*3*(np.arange(n)-0.5)/n)
	assert np.allclose(y, want, atol=1e-8)

def test_resample_fft_1d():
	n = 64
	x = np.sin(2*np.pi*3*np.arange(n)/n)
	y = np.asarray(enfft.resample_fft(x, 128))
	want = np.sin(2*np.pi*3*np.arange(128)/128)
	assert np.allclose(y, want, atol=1e-8)

def test_nufft_interpol_exact_at_nodes():
	rng = np.random.default_rng(11)
	m = rng.standard_normal((16, 32))
	iy, ix = np.mgrid[:16, :32]
	got = np.asarray(enfft.interpol_nufft(m, np.array([iy.ravel()*1.0, ix.ravel()*1.0])))
	assert np.allclose(got, m.ravel(), atol=1e-7)

def test_nufft_interpol_band_limited():
	# a band-limited signal should be interpolated near-exactly anywhere
	n = 32
	x = np.arange(n)
	m = np.cos(2*np.pi*3*x[:, None]/n) * np.sin(2*np.pi*5*x[None, :n]/n + 0.3)
	m = m[:, :n]
	pos = np.array([[3.3, 7.7], [10.123, 20.456]]).T
	got = np.asarray(enfft.interpol_nufft(m, pos))
	def f(y, xx): return np.cos(2*np.pi*3*y/n)*np.sin(2*np.pi*5*xx/n + 0.3)
	want = np.array([f(3.3, 7.7), f(10.123, 20.456)])
	assert np.allclose(got, want, atol=1e-6)
