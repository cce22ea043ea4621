"""Lensing / reprojection / aberration / coordinates tests
(modeled on reference test_lensing:351, test_thumbnails:1163)."""
import numpy as np
import jax.numpy as jnp
import pytest
from pixell_tpu import enmap, curvedsky, lensing, reproject, aberration, \
	coordinates, healpix, utils
import oracle

LMAX = 24

def cmb_like_alm(lmax, seed=0, ncomp=None):
	cl = np.zeros(lmax+1); l = np.arange(lmax+1)
	cl[2:] = 1.0/l[2:]**2
	if ncomp is None:
		return curvedsky.rand_alm(cl, lmax=lmax, seed=seed)
	ps = np.zeros((ncomp, ncomp, lmax+1))
	for i in range(ncomp): ps[i, i] = cl*(0.1**i)
	return curvedsky.rand_alm(ps, lmax=lmax, seed=seed)

def test_coordinates_gal_roundtrip():
	pos = np.array([[0.3, -1.0, 2.0], [0.5, -0.2, 1.0]])  # ra, dec? -> [{ra,dec}]
	gal = np.asarray(coordinates.transform("equ", "gal", pos))
	back = np.asarray(coordinates.transform("gal", "equ", gal))
	assert np.allclose(utils.rewind(back[0] - pos[0]), 0, atol=1e-12)
	assert np.allclose(back[1], pos[1], atol=1e-12)

def test_coordinates_gal_pole():
	# galactic north pole should map to the known equatorial coords
	pole_gal = np.array([[0.0], [np.pi/2]])
	equ = np.asarray(coordinates.transform("gal", "equ", pole_gal))
	assert np.allclose(equ[0, 0] % (2*np.pi), 192.85948*utils.degree, atol=1e-6)
	assert np.allclose(equ[1, 0], 27.12825*utils.degree, atol=1e-6)

def test_recenter():
	# recentering the center itself puts it at the north pole (the reference
	# convention, coordinates.recenter:289)
	c = np.array([0.7, 0.2])
	out = np.asarray(coordinates.recenter(c[:, None], c))
	assert np.allclose(out[1], np.pi/2, atol=1e-12)
	# 4-component form moves (ra0,dec0) to (ra1,dec1)
	out4 = np.asarray(coordinates.recenter(np.array([[0.0], [0.0]]),
		np.array([0.0, 0.0, 0.3, -0.4])))
	assert np.allclose(out4[:, 0], [0.3, -0.4], atol=1e-12)
	# decenter inverts recenter
	back = np.asarray(coordinates.decenter(out, c))
	assert np.allclose(back[:, 0], c, atol=1e-12)
	# recentered transform spec: thumbnail-style mapping of the origin
	res = np.asarray(coordinates.transform("cel",
		["cel", [np.array([0.0, 0.0, 0.3, -0.4]), False]],
		np.array([[0.0], [0.0]])))
	assert np.allclose(res[:, 0], [0.3, -0.4], atol=1e-10)

def test_flat_lens_delens():
	shape, wcs = enmap.geometry(pos=np.array([[-5, 5], [5, -5]])*utils.degree,
		res=0.2*utils.degree, proj="car")
	rng = np.random.default_rng(1)
	# smooth random map
	cl = np.zeros(500); cl[2:] = 1.0/np.arange(2, 500)**1.5
	m = enmap.rand_map(shape, wcs, cl[None, None], seed=2, scalar=True)
	# small smooth deflection
	grad = enmap.ndmap(jnp.stack([
		jnp.asarray(0.001*np.cos(np.asarray(m.posmap())[1]*30)),
		jnp.asarray(0.001*np.sin(np.asarray(m.posmap())[0]*30))]), wcs)
	lensed = lensing.lens_map(m, grad)
	delensed = lensing.delens_map(lensed, grad, nstep=4)
	err = np.abs(np.asarray(delensed) - np.asarray(m))
	inner = err[5:-5, 5:-5]
	assert np.median(inner) < 0.05*np.asarray(m).std()

def test_phi_kappa_roundtrip():
	alm = cmb_like_alm(LMAX, seed=3)
	kap = curvedsky.alm2cl(jnp.asarray(lensing.phi_to_kappa(jnp.asarray(alm))))
	phi2 = lensing.kappa_to_phi(lensing.phi_to_kappa(jnp.asarray(alm)))
	a1 = np.asarray(alm); a2 = np.asarray(phi2)
	i = oracle.lm2ind(LMAX, 5, 2)
	assert np.allclose(a2[i], a1[i])

def test_lens_map_curved_zero_phi():
	# zero potential: lensed = unlensed
	shape, wcs = enmap.band_geometry(20*utils.degree, res=2*utils.degree)
	cmb_alm = cmb_like_alm(LMAX, seed=4)
	phi_alm = np.zeros_like(np.asarray(cmb_alm))
	lensed, unlensed = lensing.lens_map_curved(shape=shape, wcs=wcs,
		phi_alm=phi_alm, cmb_alm=cmb_alm, output="lu", spin=[0])
	assert np.abs(np.asarray(lensed) - np.asarray(unlensed)).max() < 1e-6

@pytest.mark.slow
def test_lens_map_curved_firstorder():
	# small phi: lensed - unlensed ~ grad(phi) . grad(T)
	shape, wcs = enmap.band_geometry(30*utils.degree, res=1.5*utils.degree)
	cmb_alm = cmb_like_alm(32, seed=5)
	eps = 1e-4
	phi_alm = cmb_like_alm(32, seed=6)*eps
	lensed, unlensed, grad = lensing.lens_map_curved(shape=shape, wcs=wcs,
		phi_alm=phi_alm, cmb_alm=cmb_alm, output="lua", spin=[0])
	dT = curvedsky.alm2map(jnp.asarray(cmb_alm),
		enmap.zeros((2,)+shape, wcs), deriv=True)
	# first order: delta T = ddec*gdec + dra*gra/cos^2? in coordinate terms:
	# T(n + d) - T(n) ~ d_dec dT/ddec + d_ra dT/dra where d_ra = grad_ra/cos^2?
	pos = np.asarray(enmap.posmap(shape, wcs))
	cosd = np.cos(pos[0])
	pred = np.asarray(grad)[0]*np.asarray(dT)[0] + \
		np.asarray(grad)[1]*np.asarray(dT)[1]/cosd**2
	got = np.asarray(lensed) - np.asarray(unlensed)
	num = np.sum(pred*got); den = np.sqrt(np.sum(pred**2)*np.sum(got**2))
	assert num/den > 0.98  # strongly correlated
	assert abs(np.sum(pred*got)/np.sum(pred*pred) - 1) < 0.1

def test_healpix_geometry():
	nside = 8
	assert healpix.npix(nside) == 768
	theta, phi = healpix.positions(nside)
	assert len(theta) == 768
	# ring structure symmetric
	info = healpix.ring_info(nside)
	assert info["nring"] == 31
	assert np.allclose(info["theta"][0], np.arccos(1-1/(3*64)))
	assert np.allclose(np.cos(info["theta"]) + np.cos(info["theta"][::-1]), 0, atol=1e-12)

@pytest.mark.slow
def test_healpix_roundtrip_alm():
	nside = 16
	lmax = 20
	alm = cmb_like_alm(lmax, seed=7)
	hmap = reproject.alm2map_healpix(jnp.asarray(alm), nside=nside)
	assert hmap.shape == (healpix.npix(nside),)
	alm2 = reproject.map2alm_healpix(hmap, lmax=lmax, spin=[0], niter=3)
	err = np.abs(np.asarray(alm2) - np.asarray(alm))
	assert err.max() < 2e-2*np.abs(np.asarray(alm)).max()

@pytest.mark.slow
def test_map2healpix_and_back():
	shape, wcs = enmap.fullsky_geometry(res=3*utils.degree)
	lmax = 30
	alm = cmb_like_alm(lmax, seed=8)
	m = curvedsky.alm2map(jnp.asarray(alm), enmap.zeros(shape, wcs))
	hp = reproject.map2healpix(m, nside=32, lmax=lmax, niter=2)
	m2 = reproject.healpix2map(hp, shape, wcs, lmax=lmax, method="harm", spin=[0], niter=2)
	err = np.abs(np.asarray(m2) - np.asarray(m))
	assert err.max() < 0.05*np.asarray(m).std()

def test_thumbnails():
	# paint a gaussian blob at a position; thumbnail should recover it centered
	shape, wcs = enmap.fullsky_geometry(res=0.25*utils.degree)
	from pixell_tpu import pointsrcs
	sigma = 1.0*utils.degree
	r = np.linspace(0, 6*sigma, 500)
	prof = np.array([r, np.exp(-0.5*(r/sigma)**2)])
	pos0 = np.array([[0.35], [1.2]])  # dec, ra
	m = pointsrcs.sim_objects(shape, wcs, pos0, np.array([1.0]), prof, dtype=np.float64)
	th = reproject.thumbnails(m, np.array([[0.35, 1.2]]), r=4*sigma,
		res=0.25*utils.degree, order=3)
	arr = np.asarray(th[0])
	cy, cx = arr.shape[-2]//2, arr.shape[-1]//2
	assert abs(arr[cy, cx] - 1.0) < 1e-2
	# radial symmetry in the thumbnail frame
	assert abs(arr[cy+8, cx] - arr[cy-8, cx]) < 2e-2
	assert abs(arr[cy, cx+8] - arr[cy, cx-8]) < 2e-2
	assert abs(arr[cy+8, cx] - arr[cy, cx+8]) < 2e-2

def test_aberration_identity():
	shape, wcs = enmap.fullsky_geometry(res=3*utils.degree)
	alm = cmb_like_alm(24, seed=9)
	m = curvedsky.alm2map(jnp.asarray(alm), enmap.zeros(shape, wcs))
	out = aberration.boost_map(m, beta=0.0, modulate=True, aberrate=True)
	assert np.abs(np.asarray(out) - np.asarray(m)).max() < 1e-8

def test_aberration_dipole():
	# boosting a uniform map with dipole=True produces the expected dipole
	shape, wcs = enmap.fullsky_geometry(res=5*utils.degree)
	m = enmap.zeros(shape, wcs)
	beta = 0.001235
	out, A = aberration.boost_map(m, beta=beta, dipole=True, return_modulation=True,
		modulation="plain")
	arr = np.asarray(out)
	# amplitude of the dipole ~ T0 * beta
	assert abs(arr.max() - utils.T_cmb*beta) < utils.T_cmb*beta*0.01
	assert abs(arr.min() + utils.T_cmb*beta) < utils.T_cmb*beta*0.01

def test_aberration_deflection():
	# deflection angle at 90 deg from apex should be ~beta
	beta = 0.001
	dec, ra = np.array([0.0]), np.array([90*utils.degree])
	dir = np.array([0.0, 0.0])  # apex at ra=0, dec=0
	odec, ora = aberration.deflect(dec, ra, dir, beta)
	shift = ra - ora  # photon comes from further away from apex...
	assert abs(abs(shift[0]) - beta) < beta*0.01


@pytest.mark.slow
def test_lens_map_curved_banded():
	"""delta_theta banding must reproduce the unbanded result, and all five
	outputs (l, u, p, k, a) must be produced with matching geometry
	(reference lensing.py:450-492)."""
	shape, wcs = enmap.band_geometry(24*utils.degree, res=2*utils.degree)
	cmb_alm = cmb_like_alm(LMAX, seed=11)
	phi_alm = cmb_like_alm(LMAX, seed=12)*1e-3
	whole = lensing.lens_map_curved(shape=shape, wcs=wcs, phi_alm=phi_alm,
		cmb_alm=cmb_alm, output="l", spin=[0])
	banded, u, p, k, a = lensing.lens_map_curved(shape=shape, wcs=wcs,
		phi_alm=phi_alm, cmb_alm=cmb_alm, output="lupka", spin=[0],
		delta_theta=5*utils.degree)
	assert banded.shape == whole.shape
	assert u.shape == whole.shape and p.shape == tuple(shape[-2:])
	assert k.shape == tuple(shape[-2:]) and a.shape == (2,) + tuple(shape[-2:])
	d = np.abs(np.asarray(banded) - np.asarray(whole)).max()
	s = np.abs(np.asarray(whole)).max()
	assert d < 1e-6*s, (d, s)
	# k really is the convergence: l(l+1)/2 phi
	kap2 = curvedsky.alm2map(jnp.asarray(lensing.phi_to_kappa(
		jnp.asarray(phi_alm))), enmap.zeros(shape, wcs))
	assert np.abs(np.asarray(k) - np.asarray(kap2)).max() < 1e-8*max(
		np.abs(np.asarray(kap2)).max(), 1e-30)


@pytest.mark.slow
def test_thumbnails_batched_pol():
	"""Multi-object IQU thumbnails: the batched single-interpolation path
	must reproduce per-object extraction exactly, including the
	polarization parallel-transport rotation."""
	shape, wcs = enmap.fullsky_geometry(res=1*utils.degree, variant="fejer1")
	lmax = 90
	cl = np.concatenate([[0, 0], 1000/np.arange(2, lmax+1.)**2])
	alm = jnp.stack([jnp.asarray(curvedsky.rand_alm(cl, lmax=lmax, seed=i))
		for i in range(3)])
	lv = np.concatenate([np.arange(mm, lmax+1) for mm in range(lmax+1)])
	alm = alm.at[1:, lv < 2].set(0)
	m = curvedsky.alm2map(alm, enmap.zeros((3,)+shape, wcs), spin=[0, 2])
	coords = np.array([[0.4, 1.0], [-0.6, 4.0]])
	batch = np.asarray(reproject.thumbnails(m, coords, r=3*utils.degree,
		res=0.5*utils.degree))
	singles = np.array([np.asarray(reproject.thumbnails(m, coords[i:i+1],
		r=3*utils.degree, res=0.5*utils.degree))[0] for i in range(2)])
	assert batch.shape == singles.shape
	assert np.abs(batch - singles).max() < 1e-12

def test_healpix_ring_vs_general():
	"""The ring-structured healpix synthesis (spectral belt sampling + 1D
	cap interpolation) must agree with the unstructured 2D-NUFFT general
	path within the combined kernel/f32-SHT tolerance, for scalar and IQU,
	and its analysis must be the exact transpose."""
	nside, lmax = 16, 40
	rng = np.random.default_rng(1)
	ainfo = curvedsky.alm_info(lmax=lmax)
	n = ainfo.nelem
	alm = (rng.standard_normal((3, n))
		+ 1j*rng.standard_normal((3, n))).astype(np.complex64)
	alm[..., :lmax+1] = alm[..., :lmax+1].real
	va = reproject.alm2map_healpix(jnp.asarray(alm), nside=nside,
		spin=[0, 2], method="ring")
	vb = reproject.alm2map_healpix(jnp.asarray(alm), nside=nside,
		spin=[0, 2], method="general")
	assert va.shape == (3, healpix.npix(nside))
	err = np.max(np.abs(va - vb))/np.max(np.abs(vb))
	assert err < 2e-4, err
	# adjointness of the ring path: <synth(a), v> == <a, adj(v)>
	ar = rng.standard_normal(n).astype(np.float32)
	ai = rng.standard_normal(n).astype(np.float32)
	ai[:lmax+1] = 0
	a1 = (ar + 1j*ai).astype(np.complex64)
	v = rng.standard_normal(healpix.npix(nside)).astype(np.float32)
	synth = reproject._alm2map_healpix_ring(jnp.asarray(a1[None]), nside,
		lmax=lmax, mmax=lmax, spin=(0,))
	adj = reproject._healpix_ring_adjoint(jnp.asarray(v[None]), nside,
		lmax=lmax, mmax=lmax, spin=(0,))
	lhs = float(np.sum(np.asarray(synth)[0]*v))
	a2 = np.asarray(adj)[0]
	rhs = float(np.sum(ar*a2.real) + np.sum(ai*a2.imag))
	assert abs(lhs - rhs) < 1e-5*abs(lhs)

def test_healpix_ring_deriv():
	"""deriv=True through the ring-structured healpix synthesis matches the
	general NUFFT path."""
	nside, lmax = 16, 24
	rng = np.random.default_rng(3)
	ainfo = curvedsky.alm_info(lmax=lmax)
	n = ainfo.nelem
	alm = (rng.standard_normal(n) + 1j*rng.standard_normal(n)).astype(np.complex64)
	alm[:lmax+1] = alm[:lmax+1].real
	va = reproject.alm2map_healpix(jnp.asarray(alm), nside=nside, spin=[0],
		deriv=True, method="ring")
	vb = reproject.alm2map_healpix(jnp.asarray(alm), nside=nside, spin=[0],
		deriv=True, method="general")
	assert va.shape == (2, healpix.npix(nside))
	assert np.max(np.abs(va - vb)) < 2e-4*np.max(np.abs(vb))


def test_lens_rowband_matches_gather():
	"""The gather-free rowband point eval (fft._u2nu_rowband_core via
	lensing._lens_band_rowband) must reproduce the per-point block-gather
	eval: identical ES taps, only the summation order differs."""
	shape, wcs = enmap.band_geometry(20*utils.degree, res=2*utils.degree)
	cmb_alm = cmb_like_alm(LMAX, seed=21, ncomp=3)
	phi_alm = cmb_like_alm(LMAX, seed=22)*2e-3
	g = lensing.lens_map_curved(shape=shape, wcs=wcs, phi_alm=phi_alm,
		cmb_alm=cmb_alm, output="l", point_eval="gather")
	r = lensing.lens_map_curved(shape=shape, wcs=wcs, phi_alm=phi_alm,
		cmb_alm=cmb_alm, output="l", point_eval="rowband")
	d = np.abs(np.asarray(r) - np.asarray(g)).max()
	s = np.abs(np.asarray(g)).max()
	assert d < 1e-5*s, (d, s)
	# banding through the rowband path must agree with the whole-sky program
	rb = lensing.lens_map_curved(shape=shape, wcs=wcs, phi_alm=phi_alm,
		cmb_alm=cmb_alm, output="l", point_eval="rowband",
		delta_theta=5*utils.degree)
	d2 = np.abs(np.asarray(rb) - np.asarray(r)).max()
	assert d2 < 1e-5*s, (d2, s)
