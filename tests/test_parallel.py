"""Multi-device sharding tests on the virtual 8-device CPU mesh
(the reference's answer to distributed testing was a single-process
FakeCommunicator; here we actually run the collectives, SURVEY.md section 4)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from pixell_tpu import enmap, sht, curvedsky, utils, tilemap
from pixell_tpu.parallel import mesh as pmesh, sht_dist, dist
import oracle


def test_devices():
	assert len(jax.devices()) >= 8

def test_synthesis_dist_matches_local():
	m = pmesh.local_mesh(8)
	lmax = 16
	nt, nphi = 2*lmax+2, 2*lmax+4
	theta = jnp.asarray(sht.ring_theta("F1", nt))
	alm = jnp.asarray(oracle.rand_alm_oracle(lmax, seed=1, ncomp=1))
	local = sht.synthesis(alm, theta, nphi, spin=(0,))
	dist_res = sht_dist.synthesis_dist(alm, theta, nphi, m, lmax=lmax, spin=(0,))
	assert np.abs(np.asarray(dist_res) - np.asarray(local)).max() < 1e-12

def test_analysis_dist_matches_local():
	m = pmesh.local_mesh(8)
	lmax = 16
	nt, nphi = 2*lmax+2, 2*lmax+4
	theta = jnp.asarray(sht.ring_theta("F1", nt))
	w = jnp.asarray(sht.ring_weights("F1", nt))
	alm = jnp.asarray(oracle.rand_alm_oracle(lmax, seed=2, ncomp=1))
	maps = sht.synthesis(alm, theta, nphi, spin=(0,))
	a = sht_dist.analysis_dist(maps, theta, w, m, lmax, spin=(0,))
	assert np.abs(np.asarray(a) - np.asarray(alm)).max() < 1e-10

def test_roundtrip_step_jits():
	m = pmesh.local_mesh(8)
	lmax = 12
	step, (nt, nphi) = sht_dist.roundtrip_step(m, lmax, ncomp=3)
	rng = np.random.default_rng(3)
	maps = jnp.asarray(rng.standard_normal((3, nt, nphi)))
	jstep = jax.jit(step)
	omap, alm = jstep(maps)
	assert omap.shape == (3, nt, nphi)
	# smoothing reduces variance
	assert float(jnp.std(omap)) < float(jnp.std(maps))

def test_tilemap_roundtrip():
	shape, wcs = enmap.fullsky_geometry(res=3*utils.degree)
	rng = np.random.default_rng(4)
	imap = enmap.ndmap(rng.standard_normal(shape), wcs)
	tm = tilemap.from_enmap(imap, tile_shape=(16, 16))
	back = tm.to_enmap()
	assert np.allclose(np.asarray(back), np.asarray(imap))

def test_tilemap_distribute():
	shape, wcs = enmap.fullsky_geometry(res=3*utils.degree)
	rng = np.random.default_rng(5)
	imap = enmap.ndmap(rng.standard_normal(shape), wcs)
	tm = tilemap.from_enmap(imap, tile_shape=(16, 16))
	m = pmesh.local_mesh(8)
	dtm = tilemap.distribute(tm, m)
	# data is actually sharded
	assert len(dtm.data.sharding.device_set) == 8
	# values preserved (crop padding)
	assert np.allclose(np.asarray(dtm.data)[:tm.nactive], np.asarray(tm.data))

def test_tilemap_active_subset():
	shape, wcs = enmap.fullsky_geometry(res=3*utils.degree)
	rng = np.random.default_rng(6)
	imap = enmap.ndmap(rng.standard_normal(shape), wcs)
	geo = tilemap.geometry(imap.shape, imap.wcs, tile_shape=(16, 16))
	active = np.array([0, 3, 5])
	tm = tilemap.from_enmap(imap, tile_shape=(16, 16), active=active)
	assert tm.nactive == 3
	t0 = tm.active_tiles[0]
	assert np.allclose(np.asarray(t0), np.asarray(imap)[:16, :16])
	# expanding to more tiles keeps data
	tm2 = tm.with_tiles(np.array([0, 1, 3, 5]))
	assert tm2.nactive == 4
	assert np.allclose(np.asarray(tm2.tiles[0]), np.asarray(t0))
	# global-index view: inactive tiles read as zeros
	assert np.allclose(np.asarray(tm.tiles[1]), 0)
	# geometry helpers
	ty, tx = geo.ind2grid(5)
	assert geo.grid2ind(ty, tx) == 5
	assert geo.compatible(geo) == 2
	assert geo.compatible(tm2.geometry) == 1
	gsh, gwcs = geo.tiles[0]
	assert tuple(gsh[-2:]) == (16, 16)
	# strict re-tiling takes exactly the other active set
	tm3 = tm.with_tiles([3, 0], strict=True)
	assert list(tm3.active) == [3, 0]
	assert np.allclose(np.asarray(tm3.active_tiles[1]), np.asarray(t0))
	# full constructor + to_enmap round trip on full active set
	tf = tilemap.full(tilemap.geometry(imap.shape, imap.wcs, tile_shape=(16, 16)), 2.5)
	assert np.allclose(np.asarray(tilemap.to_enmap(tf)), 2.5)
	# TileView setitem
	tv = tm.copy()
	tv.active_tiles[0] = np.asarray(t0)*0 + 7
	assert np.allclose(np.asarray(tv.active_tiles[0]), 7)

def test_fake_communicator():
	comm = dist.FakeCommunicator()
	assert comm.allreduce(5) == 5
	assert dist.COMM_WORLD.size >= 1

@pytest.mark.slow
def test_m_sharded_roundtrip_matches_ring():
	"""m-sharded (2D mesh) SHT roundtrip == ring-sharded roundtrip, and the
	harmonic representation is genuinely sharded over m (per-device alm
	memory shrinks with the mesh) -- SURVEY.md section 5 m-parallel SHT."""
	devs = jax.devices()
	if len(devs) < 8: pytest.skip("needs 8 devices")
	m2 = pmesh.get_mesh((2, 4), ("rows", "cols"), devs[:8])
	lmax = 40
	step_m, (nt, nphi) = sht_dist.roundtrip_step(m2, lmax, ncomp=3,
		spin=(0, 2), shard="m")
	rng = np.random.default_rng(2)
	maps = jnp.asarray(rng.standard_normal((3, nt, nphi)))
	omap_m, rect = jax.jit(step_m)(maps)
	# per-device m extent must shrink with the mesh's m axis
	shard_nm = {s.data.shape[-1] for s in rect.addressable_shards}
	assert max(shard_nm) == rect.shape[-1]//4
	m1 = pmesh.get_mesh((8,), ("rows",), devs[:8])
	step_r, _ = sht_dist.roundtrip_step(m1, lmax, ncomp=3, spin=(0, 2))
	omap_r, alm = jax.jit(step_r)(maps)
	assert np.abs(np.asarray(omap_m) - np.asarray(omap_r)).max() < 1e-10
	# the sharded rect agrees with the replicated packed alm
	rect_ref = np.asarray(sht.alm2rect(jnp.asarray(alm), lmax))
	got = np.asarray(rect)[..., :lmax+1]
	assert np.abs(got - rect_ref).max() < 1e-10

@pytest.mark.slow
def test_rect_transforms_match_packed():
	"""synthesis_rect/analysis_rect agree with the packed-alm transforms."""
	lmax = 30
	nt, nphi = 2*lmax + 2, 2*lmax + 4
	theta = jnp.asarray(sht.ring_theta("F1", nt))
	w = jnp.asarray(sht.ring_weights("F1", nt))
	rng = np.random.default_rng(3)
	maps = jnp.asarray(rng.standard_normal((3, nt, nphi)))
	alm = sht.analysis(maps, theta, lmax, w, spin=(0, 2))
	rect = sht.analysis_rect(maps, theta, lmax, w, spin=(0, 2))
	rect_ref = np.asarray(sht.alm2rect(jnp.asarray(alm), lmax))
	assert np.abs(np.asarray(rect) - rect_ref).max() < 1e-12
	m1 = sht.synthesis(alm, theta, nphi, lmax=lmax, spin=(0, 2))
	m2 = sht.synthesis_rect(rect, theta, nphi, lmax=lmax, spin=(0, 2))
	assert np.abs(np.asarray(m1) - np.asarray(m2)).max() < 1e-12


def test_public_mesh_dispatch_matches_local():
	"""curvedsky.alm2map/map2alm(mesh=...) reproduce the single-device
	result: ring-sharded synthesis, and the m-resharded phase analysis on a
	2d geometry whose quadrature needs the theta upsample."""
	m = pmesh.local_mesh(8)
	lmax = 24
	# 6 deg fejer1 fullsky: nt=30 < 2*lmax+1, so analysis takes the
	# upsample phase path (the production one)
	shape, wcs = enmap.fullsky_geometry(res=6*utils.degree, variant="fejer1")
	alm = jnp.asarray(oracle.rand_alm_oracle(lmax, seed=11, ncomp=3))
	local = curvedsky.alm2map(alm, enmap.zeros((3,)+shape, wcs), spin=[0, 2])
	dist_map = curvedsky.alm2map(alm, enmap.zeros((3,)+shape, wcs),
		spin=[0, 2], mesh=m)
	assert np.abs(np.asarray(dist_map) - np.asarray(local)).max() < 1e-12
	a_local = curvedsky.map2alm(local, lmax=lmax, spin=[0, 2])
	a_dist = curvedsky.map2alm(dist_map, lmax=lmax, spin=[0, 2], mesh=m)
	scale = np.abs(np.asarray(a_local)).max()
	assert np.abs(np.asarray(a_dist) - np.asarray(a_local)).max() < 1e-11*scale
	# deriv (the lensing gradient SHT) through the mesh path
	g_local = curvedsky.alm2map(alm[0], enmap.zeros((2,)+shape, wcs), deriv=True)
	g_dist = curvedsky.alm2map(alm[0], enmap.zeros((2,)+shape, wcs),
		deriv=True, mesh=m)
	assert np.abs(np.asarray(g_dist) - np.asarray(g_local)).max() < 1e-12


def test_lens_map_curved_mesh_matches_local():
	"""The full curved-lensing science pipeline on an 8-device mesh equals
	the single-device run (SHTs ring-sharded, band point work row-sharded)."""
	from pixell_tpu import lensing
	m = pmesh.local_mesh(8)
	lmax = 32
	shape, wcs = enmap.fullsky_geometry(res=4*utils.degree, variant="fejer1")
	rng = np.random.default_rng(6)
	ps = np.zeros((4, 4, lmax+1))
	l = np.arange(lmax+1)
	cl = 1.0/(l + 5)**2
	ps[0, 0] = cl*1e-2
	ps[1, 1] = cl; ps[2, 2] = cl*0.1; ps[3, 3] = cl*0.01
	phi_alm, cmb_alm = lensing.rand_alm(ps, lmax=lmax, seed=8)
	kw = dict(shape=(3,)+shape, wcs=wcs, phi_alm=phi_alm, cmb_alm=cmb_alm,
		dtype=np.float64, output="l", delta_theta=30*utils.degree)
	local = lensing.lens_map_curved(**kw)
	dist_res = lensing.lens_map_curved(mesh=m, **kw)
	scale = np.abs(np.asarray(local)).max()
	assert np.abs(np.asarray(dist_res) - np.asarray(local)).max() < 1e-10*scale


def _wavelet_mesh_case(lmax, res_deg, mesh, basis=None):
	"""Build a curved wavelet transform of a random bandlimited map twice --
	single-device and on the mesh -- and return (wt_local, wt_dist, map)."""
	from pixell_tpu import wavelets, uharm
	shape, wcs = enmap.fullsky_geometry(res=res_deg*utils.degree,
		variant="fejer1")
	if basis is None: basis = wavelets.ButterTrim()
	alm = jnp.asarray(oracle.rand_alm_oracle(min(lmax, 3*lmax//4), seed=17))
	m = curvedsky.alm2map(alm, enmap.zeros(shape, wcs))
	wt_l = wavelets.WaveletTransform(uharm.UHT(shape, wcs, mode="curved",
		lmax=lmax), basis=basis)
	wt_d = wavelets.WaveletTransform(uharm.UHT(shape, wcs, mode="curved",
		lmax=lmax), basis=basis, mesh=mesh)
	return wt_l, wt_d, m


def test_wavelet_mesh_matches_local():
	"""WaveletTransform(mesh=...) reproduces the single-device decomposition
	and reconstruction: every per-scale SHT dispatches through the sharded
	path (fast-tier plumbing check; the config-5-shaped size runs in the
	slow tier below)."""
	from pixell_tpu import wavelets
	m8 = pmesh.local_mesh(8)
	wt_l, wt_d, m = _wavelet_mesh_case(32, 3.0, m8,
		basis=wavelets.ButterTrim(step=4))
	w_l = wt_l.map2wave(m)
	w_d = wt_d.map2wave(m)
	assert w_d.nmap == w_l.nmap
	for a, b in zip(w_l.maps, w_d.maps):
		s = max(np.abs(np.asarray(a)).max(), 1e-300)
		assert np.abs(np.asarray(a) - np.asarray(b)).max() < 1e-11*s
	r_l = wt_l.wave2map(w_l)
	r_d = wt_d.wave2map(w_d)
	s = np.abs(np.asarray(r_l)).max()
	assert np.abs(np.asarray(r_d) - np.asarray(r_l)).max() < 1e-11*s


@pytest.mark.slow
def test_wavelet_mesh_matches_local_big():
	"""Config-5-shaped workload sharded at non-toy lmax (>= 512): the wavelet
	decomposition whose single-chip version OOMs at lmax 10000 runs its
	per-scale SHTs over the mesh (rings sharded; the too-coarse-quadrature
	analysis reshards the phase spectrum over m -- the production fix named
	in PERF.md for BASELINE config 5). Mesh result must match local."""
	m8 = pmesh.local_mesh(8)
	lmax = 512
	# res ~ bandlimit: nt < 2*lmax+1, so analysis takes the m-resharded
	# upsample phase path on every big scale
	wt_l, wt_d, m = _wavelet_mesh_case(lmax, 180.0/(lmax + 8), m8)
	w_l = wt_l.map2wave(m)
	w_d = wt_d.map2wave(m)
	for a, b in zip(w_l.maps, w_d.maps):
		s = max(np.abs(np.asarray(a)).max(), 1e-300)
		assert np.abs(np.asarray(a) - np.asarray(b)).max() < 1e-10*s
	r_l = wt_l.wave2map(w_l)
	r_d = wt_d.wave2map(w_d)
	s = np.abs(np.asarray(r_l)).max()
	assert np.abs(np.asarray(r_d) - np.asarray(r_l)).max() < 1e-10*s
	# and the decomposition is faithful: reconstruction matches the input to
	# the basis' own trim tolerance (ButterTrim zeroes kernel tails where
	# prof^2 <= tol=1e-3, so sum k_i^2 = 1 only holds to ~tol)
	assert np.abs(np.asarray(r_d) - np.asarray(m)).max() < 2e-3*s
