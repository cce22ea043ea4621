"""Matched filter and source finding tests (modeled on the executable
example in reference analysis.py:31-108)."""
import numpy as np
import jax.numpy as jnp
import pytest
from pixell_tpu import enmap, analysis, uharm, pointsrcs, utils


def setup_scene(seed=0, flux=10.0, noise=1.0):
	"""A flat patch with one beam-convolved source plus white noise.
	Returns map in flux-density units (value = flux/pixarea at center for a
	delta...). We work in 'flux per steradian' so amplitudes integrate."""
	shape, wcs = enmap.geometry(pos=np.array([[-2, 2], [2, -2]])*utils.degree,
		res=0.02*utils.degree, proj="car")
	sigma = 1.4*utils.fwhm*utils.arcmin*10  # 14 arcmin fwhm-ish beam
	# unit-integral beam profile
	r = np.linspace(0, 8*sigma, 2000)
	br = np.exp(-0.5*(r/sigma)**2)
	norm = 2*np.pi*sigma**2
	prof = np.array([r, br/norm])
	poss = np.array([[0.0], [0.0]])
	m = pointsrcs.sim_objects(shape, wcs, poss, np.array([flux]), prof, dtype=np.float64)
	rng = np.random.default_rng(seed)
	pixarea = enmap.pixsize(shape, wcs)
	nsigma_map = noise/np.sqrt(pixarea)  # white noise with flux-units spectrum
	nmap = rng.standard_normal(shape)*nsigma_map
	total = enmap.samewcs(jnp.asarray(m) + nmap, m)
	return total, prof, sigma, pixarea, noise, shape, wcs

def test_matched_filter_constcov_recovers_flux():
	total, prof, sigma, pixarea, noise, shape, wcs = setup_scene(flux=10.0, noise=0.5)
	uht = uharm.UHT(shape, wcs, mode="flat")
	B = uht.rprof2hprof(prof[1], prof[0])
	# white noise in these units: N(l) = noise^2 (flux^2 sr units)
	iN = enmap.samewcs(jnp.ones(np.asarray(B).shape)/(noise**2), B)
	rho, kappa = analysis.matched_filter_constcov(total, np.asarray(B), np.asarray(iN), uht=uht)
	flux, dflux, snr = analysis.solve_mapsys(kappa, rho)
	cy, cx = shape[-2]//2, shape[-1]//2
	fhat = float(np.asarray(flux)[cy, cx])
	dfl = float(np.asarray(dflux)) if np.ndim(dflux) == 0 else float(np.asarray(dflux)[cy, cx])
	# recovered flux at the percent level (the reference documents the same
	# fourier-operator accuracy limit, analysis.py:119-121)
	assert abs(fhat - 10.0) < 0.1
	assert dfl < 0.1
	snr_c = float(np.asarray(snr)[cy, cx])
	assert snr_c > 5

def test_finder_simple():
	total, prof, sigma, pixarea, noise, shape, wcs = setup_scene(flux=30.0, noise=0.5)
	uht = uharm.UHT(shape, wcs, mode="flat")
	B = uht.rprof2hprof(prof[1], prof[0])
	iN = enmap.samewcs(jnp.ones(np.asarray(B).shape)/(noise**2), B)
	nmat = analysis.NmatConstcov(np.asarray(iN), np.asarray(B), uht)
	finder = analysis.FinderSimple(nmat, snmin=10)
	res = finder(total)
	assert len(res.cat) >= 1
	best = res.cat[np.argmax(res.cat["snr"])]
	assert abs(best["dec"]) < 0.05*utils.degree
	assert abs(best["ra"]) < 0.05*utils.degree
	assert abs(best["flux"] - 30) < 5

def test_finder_iterative_two_sources():
	shape, wcs = enmap.geometry(pos=np.array([[-2, 2], [2, -2]])*utils.degree,
		res=0.02*utils.degree, proj="car")
	sigma = 10*utils.arcmin*utils.fwhm
	r = np.linspace(0, 8*sigma, 2000)
	norm = 2*np.pi*sigma**2
	prof = np.array([r, np.exp(-0.5*(r/sigma)**2)/norm])
	poss = np.array([[0.0, 0.5*utils.degree], [0.0, -0.8*utils.degree]])
	fluxes = np.array([50.0, 20.0])
	m = pointsrcs.sim_objects(shape, wcs, poss, fluxes, prof, dtype=np.float64)
	noise = 0.5
	rng = np.random.default_rng(3)
	nmap = rng.standard_normal(shape)*noise/np.sqrt(enmap.pixsize(shape, wcs))
	total = enmap.samewcs(jnp.asarray(m) + nmap, m)
	uht = uharm.UHT(shape, wcs, mode="flat")
	B = uht.rprof2hprof(prof[1], prof[0])
	iN = enmap.samewcs(jnp.ones(np.asarray(B).shape)/(noise**2), B)
	nmat = analysis.NmatConstcov(np.asarray(iN), np.asarray(B), uht)
	finder = analysis.FinderSimple(nmat, snmin=8)
	modeller = analysis.ModellerPerpix(shape, wcs, prof)
	it = analysis.FinderIterative(finder, modeller, niter=3)
	res = it(total)
	assert len(res.cat) >= 2
	fl = np.sort(res.cat["flux"])[::-1][:2]
	assert abs(fl[0] - 50) < 8
	assert abs(fl[1] - 20) < 8

def test_matched_filter_white():
	total, prof, sigma, pixarea, noise, shape, wcs = setup_scene(flux=20.0, noise=0.5)
	uht = uharm.UHT(shape, wcs, mode="flat")
	B = uht.rprof2hprof(prof[1], prof[0])
	ivar = enmap.ndmap(jnp.full(shape, pixarea/noise**2), wcs)
	rho, kappa = analysis.matched_filter_white(total, np.asarray(B), ivar, uht=uht)
	flux, dflux, snr = analysis.solve_mapsys(np.asarray(kappa), rho)
	cy, cx = shape[-2]//2, shape[-1]//2
	fhat = float(np.asarray(flux)[cy, cx])
	assert abs(fhat - 20.0) < 4.0


@pytest.mark.slow
def test_finder_multi_safe():
	"""FinderMultiSafe picks the right profile case and measures each object
	over its own circle (reference analysis.FinderMultiSafe:692)."""
	total, prof, sigma, pixarea, noise, shape, wcs = setup_scene(flux=30.0, noise=0.5)
	uht = uharm.UHT(shape, wcs, mode="flat")
	B1 = uht.rprof2hprof(prof[1], prof[0])
	# second, much wider profile: should lose to the true one at the peak
	r2 = prof[0]; b2 = np.exp(-0.5*(r2/(3*sigma))**2)/(2*np.pi*(3*sigma)**2)
	B2 = uht.rprof2hprof(b2, r2)
	iN = enmap.samewcs(jnp.ones(np.asarray(B1).shape)/(noise**2), B1)
	nm1 = analysis.NmatConstcov(np.asarray(iN), np.asarray(B1), uht)
	nm2 = analysis.NmatConstcov(np.asarray(iN), np.asarray(B2), uht)
	finder = analysis.FinderMultiSafe([nm1, nm2], snmin=10, r=5*utils.arcmin)
	res = finder(total)
	assert len(res.cat) >= 1
	best = res.cat[0]
	assert best["case"] == 0
	assert abs(best["dec"]) < 0.05*utils.degree
	assert abs(best["ra"]) < 0.05*utils.degree
	assert abs(best["flux"] - 30) < 5


def test_analysis_helpers():
	"""snr_split grouping, sanitize_kappa flooring, rpow/rmul consistency."""
	groups = analysis.snr_split([100, 90, 20, 6, 3, 2], sntol=0.25, snmin=5)
	flat = sorted(int(i) for g in groups for i in g)
	assert flat == [0, 1, 2, 3, 4, 5]
	assert set(int(i) for i in groups[0]) == {0, 1}   # strongest tier first
	assert {4, 5}.issubset(set(int(i) for i in groups[-1]))  # sub-snmin bunched
	k = np.array([2.0, 1e-9, 1.0])
	ks = np.asarray(analysis.sanitize_kappa(k, tol=1e-4))
	assert ks[1] >= 2.0*1e-4
	# rmul(F,F) must agree with rpow(F,2) on a symmetric real kernel
	shape, wcs = enmap.geometry(pos=np.array([[-1, 1], [1, -1]])*utils.degree,
		res=0.05*utils.degree, proj="car")
	l = enmap.modlmap(shape, wcs)
	F = enmap.samewcs(jnp.exp(-0.5*(jnp.asarray(l)/2000.)**2), enmap.zeros(shape, wcs))
	p1 = np.asarray(analysis.rmul(F, F))
	p2 = np.asarray(analysis.rpow(F, 2))
	assert np.allclose(p1, p2, atol=1e-10)
