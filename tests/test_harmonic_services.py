"""uharm / wavelets / multimap / powspec tests."""
import numpy as np
import jax.numpy as jnp
import pytest
from pixell_tpu import enmap, uharm, wavelets, multimap, powspec, utils, curvedsky, fft


def test_powspec_sym_roundtrip():
	rng = np.random.default_rng(0)
	mat = rng.standard_normal((3, 3, 10))
	mat = mat + np.swapaxes(mat, 0, 1)
	comp = powspec.sym_compress(mat)
	full = powspec.sym_expand(comp)
	assert np.allclose(full, mat)

def test_powspec_scale():
	cl = np.ones(10)
	dl = powspec.scale_spectrum(cl, 1)
	l = np.arange(10)
	assert np.allclose(dl[2:], (l*(l+1)/(2*np.pi))[2:])
	back = powspec.scale_spectrum(dl, -1)
	assert np.allclose(back[1:], cl[1:])

def test_spec2corr():
	# white spectrum: C(theta) = sum (2l+1)/4pi cl Pl -> delta-ish at 0
	cl = np.ones(20)
	c0 = powspec.spec2corr(cl, np.array([0.0]))
	want = np.sum((2*np.arange(20)+1)/(4*np.pi))
	assert np.allclose(c0, want)

def test_uht_flat_roundtrip():
	shape, wcs = enmap.geometry(pos=np.array([[-2, 2], [2, -2]])*utils.degree,
		res=0.1*utils.degree, proj="car")
	u = uharm.UHT(shape, wcs)
	assert u.mode == "flat"
	rng = np.random.default_rng(1)
	m = enmap.ndmap(jnp.asarray(rng.standard_normal(shape)), wcs)
	h = u.map2harm(m)
	m2 = u.harm2map(h)
	assert np.abs(np.asarray(m2) - np.asarray(m)).max() < 1e-8

def test_uht_curved_roundtrip():
	shape, wcs = enmap.fullsky_geometry(res=6*utils.degree)
	u = uharm.UHT(shape, wcs, mode="curved", lmax=20)
	assert u.mode == "curved"
	import sys, os
	sys.path.insert(0, os.path.dirname(__file__))
	import oracle
	alm = oracle.rand_alm_oracle(20, seed=2)
	m = u.harm2map(jnp.asarray(alm))
	h2 = u.map2harm(m)
	assert np.abs(np.asarray(h2) - alm).max() < 1e-8

def test_uht_hmul():
	shape, wcs = enmap.fullsky_geometry(res=6*utils.degree)
	u = uharm.UHT(shape, wcs, mode="curved", lmax=10)
	import oracle
	alm = oracle.rand_alm_oracle(10, seed=3)
	fl = np.arange(11)*1.0
	out = np.asarray(u.hmul(fl, jnp.asarray(alm)))
	assert np.allclose(out[u.ainfo.lm2ind(5, 2)], alm[u.ainfo.lm2ind(5, 2)]*5)

def test_multimap_basics():
	g1 = enmap.fullsky_geometry(res=10*utils.degree)
	g2 = enmap.geometry(pos=np.array([[-2, 2], [2, -2]])*utils.degree,
		res=0.5*utils.degree)
	mm = multimap.zeros([g1, g2])
	assert mm.nmap == 2
	mm2 = mm + 1
	assert np.allclose(np.asarray(mm2.maps[0]), 1)
	flat = mm2.flat()
	assert flat.shape[-1] == mm.npixs[0] + mm.npixs[1]
	mm3 = multimap.from_flat(flat, mm.geometries)
	assert np.allclose(np.asarray(mm3.maps[1]), np.asarray(mm2.maps[1]))

def test_haar_roundtrip():
	shape, wcs = enmap.geometry(pos=np.array([[-2, 2], [2, -2]])*utils.degree,
		shape=(32, 32), proj="car")
	rng = np.random.default_rng(4)
	m = enmap.ndmap(jnp.asarray(rng.standard_normal(shape)), wcs)
	ht = wavelets.HaarTransform(3)
	w = ht.map2wave(m)
	m2 = ht.wave2map(w)
	assert np.abs(np.asarray(m2) - np.asarray(m)).max() < 1e-10

def test_wavelet_partition_of_unity():
	basis = wavelets.ButterTrim().with_bounds(10, 500)
	l = np.arange(501, dtype=float)
	tot = np.zeros_like(l)
	for i in range(basis.n):
		tot += basis.kernel(i, l)**2
	assert np.abs(tot[20:] - 1).max() < 0.05

def test_cosine_needlet_partition():
	basis = wavelets.CosineNeedlet().with_bounds(10, 300)
	l = np.arange(301, dtype=float)
	tot = np.zeros_like(l)
	for i in range(basis.n):
		tot += basis.kernel(i, l)**2
	assert np.abs(tot - 1).max() < 1e-10

def test_wavelet_transform_flat_roundtrip():
	shape, wcs = enmap.geometry(pos=np.array([[-3, 3], [3, -3]])*utils.degree,
		res=0.1*utils.degree, proj="car")
	wt = wavelets.WaveletTransform((shape, wcs), basis=wavelets.CosineNeedlet())
	rng = np.random.default_rng(5)
	m = enmap.ndmap(jnp.asarray(rng.standard_normal(shape)), wcs)
	w = wt.map2wave(m)
	assert w.nmap == wt.nlevel
	m2 = wt.wave2map(w)
	# needlets: sum of k^2 = 1, and per-scale maps resampled; roundtrip
	# should be accurate away from resampling artifacts
	err = np.abs(np.asarray(m2) - np.asarray(m))
	assert np.median(err) < 0.05

@pytest.mark.slow
def test_wavelet_transform_curved_roundtrip():
	shape, wcs = enmap.fullsky_geometry(res=3*utils.degree)
	wt = wavelets.WaveletTransform(uharm.UHT(shape, wcs, mode="curved", lmax=50),
		basis=wavelets.CosineNeedlet())
	import oracle
	alm = oracle.rand_alm_oracle(40, seed=6)
	m = curvedsky.alm2map(jnp.asarray(alm), enmap.zeros(shape, wcs))
	w = wt.map2wave(m)
	m2 = wt.wave2map(w)
	assert np.abs(np.asarray(m2) - np.asarray(m)).max() < 1e-6
	# host-offloaded wavelet maps (the big-transform HBM path) must be
	# bit-identical through the whole roundtrip
	wto = wavelets.WaveletTransform(uharm.UHT(shape, wcs, mode="curved",
		lmax=50), basis=wavelets.CosineNeedlet(), offload=True)
	wo = wto.map2wave(m)
	assert all(isinstance(x.data, np.ndarray) for x in wo.maps), \
		"offloaded wavelet maps must be host (numpy) resident"
	m3 = wto.wave2map(wo)
	assert np.abs(np.asarray(m3) - np.asarray(m2)).max() == 0.0


def test_nufft_inverse_pair():
	"""nu2u is the exact transpose of u2nu; iu2nu/inu2u invert them
	(reference fft.py:500-668)."""
	import numpy as np, jax.numpy as jnp
	from pixell_tpu import fft
	rng = np.random.default_rng(0)
	pts = rng.uniform(0, 2*np.pi, (300, 2))
	ny = nx = 9
	ky = np.fft.fftfreq(ny)*ny; kx = np.fft.fftfreq(nx)*nx
	v = rng.standard_normal(300) + 1j*rng.standard_normal(300)
	ref = np.array([[np.sum(v*np.exp(-1j*(kyv*pts[:, 0] + kxv*pts[:, 1])))
		for kxv in kx] for kyv in ky])
	got = np.asarray(fft.nu2u(jnp.asarray(v), jnp.asarray(pts), oshape=(ny, nx)))
	assert np.linalg.norm(got - ref)/np.linalg.norm(ref) < 1e-8
	g = rng.standard_normal((ny, nx)) + 1j*rng.standard_normal((ny, nx))
	vals = np.asarray(fft.u2nu(jnp.asarray(g), jnp.asarray(pts)))
	g2 = fft.iu2nu(vals, pts, oshape=(ny, nx), epsilon=1e-10)
	assert np.linalg.norm(g2 - g)/np.linalg.norm(g) < 1e-7
	# nufft aliases agree
	got2 = np.asarray(fft.nufft_adjoint(v, pts, oshape=(ny, nx)))
	assert np.allclose(got2, got)


def test_u2nu_plan():
	"""u2nu_plan.eval matches direct u2nu (reference fft.u2nu_plan:619).
	The plan takes inds in GRID units (periodicity = grid shape)."""
	rng = np.random.default_rng(21)
	ny, nx = 16, 24
	g = rng.standard_normal((2, ny, nx)) + 1j*rng.standard_normal((2, ny, nx))
	npt = 37
	iy = rng.uniform(0, ny, npt); ix = rng.uniform(0, nx, npt)
	plan = fft.u2nu_plan(jnp.asarray(g), axes=(-2, -1), epsilon=1e-10)
	got = np.asarray(plan.eval(np.array([iy, ix])))
	pts = np.stack([iy/ny*2*np.pi, ix/nx*2*np.pi], -1)
	want = np.asarray(fft.u2nu(jnp.asarray(g), jnp.asarray(pts), epsilon=1e-10))
	assert got.shape == (2, npt)
	assert np.abs(got - want).max() < 1e-8*np.abs(want).max()
	# normalize and real-output options
	plan2 = fft.u2nu_plan(jnp.asarray(g), axes=(-2, -1), epsilon=1e-10,
		normalize=True, complex=False)
	got2 = np.asarray(plan2.eval(np.array([iy, ix])))
	assert np.abs(got2 - want.real/(ny*nx)).max() < 1e-8*np.abs(want).max()


def test_u2nu_gather_chunking(monkeypatch):
	"""The chunked point-gather path (npt > GATHER_CHUNK, which bounds the
	[chunk,w,w,C] transient that OOMs HBM on million-point lensing bands)
	is bit-identical to the single-block path."""
	rng = np.random.default_rng(3)
	ny, nx = 12, 18
	g = rng.standard_normal((2, ny, nx)) + 1j*rng.standard_normal((2, ny, nx))
	npt = 101
	pts = rng.uniform(0, 2*np.pi, (npt, 2))
	want = np.asarray(fft.u2nu(jnp.asarray(g), jnp.asarray(pts)))
	monkeypatch.setattr(fft, "GATHER_CHUNK", 16)  # force 7 blocks with padding
	# GATHER_CHUNK is read at trace time inside the jitted core; the 'want'
	# call above populated the jit cache for these avals, so the chunked
	# path would silently never trace without clearing the caches first.
	import jax
	jax.clear_caches()
	got = np.asarray(fft.u2nu(jnp.asarray(g), jnp.asarray(pts)))
	assert np.array_equal(got, want)
