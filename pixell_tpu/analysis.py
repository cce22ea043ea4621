"""Map analysis: matched filters and iterative source finding
(reference pixell/analysis.py).

The matched filters estimate per-pixel point-source fluxes and their
uncertainties under different noise models:

  flux = rho/kappa, dflux = kappa**-0.5, snr = rho/kappa**0.5

All filters are linear-harmonic pipelines over a UHT and run as fused jax
computations. The Nmat/Finder/Measurer/Modeller class families implement the
iterative find->measure->subtract source finder of the reference
(analysis.py:379-1045).

Executable example with regression values (the reference keeps the same
kind of numeric example in its module docstring, analysis.py:31-108)::

	import numpy as np, jax.numpy as jnp
	from pixell_tpu import enmap, analysis, uharm, pointsrcs, utils
	shape, wcs = enmap.geometry(pos=np.array([[-2, 2], [2, -2]])*utils.degree,
		res=0.02*utils.degree, proj="car")
	sigma = 1.4*utils.fwhm*utils.arcmin*10
	r = np.linspace(0, 8*sigma, 2000)
	prof = np.array([r, np.exp(-0.5*(r/sigma)**2)/(2*np.pi*sigma**2)])
	m = pointsrcs.sim_objects(shape, wcs, np.array([[0.0],[0.0]]),
		np.array([10.0]), prof, dtype=np.float64)
	noise = 0.5
	rng = np.random.default_rng(1)
	total = enmap.samewcs(jnp.asarray(m) +
		rng.standard_normal(shape)*noise/np.sqrt(enmap.pixsize(shape, wcs)), m)
	uht = uharm.UHT(shape, wcs, mode="flat")
	B = uht.rprof2hprof(prof[1], prof[0])
	iN = enmap.samewcs(jnp.ones(np.asarray(B).shape)/noise**2, B)
	rho, kappa = analysis.matched_filter_constcov(total, np.asarray(B),
		np.asarray(iN), uht=uht)
	flux, dflux, snr = analysis.solve_mapsys(kappa, rho)
	# expected central values (percent-level fourier-operator accuracy):
	#   constcov: flux 10.046 dflux 0.003 snr 3260.3
	#   white:    flux 10.048 dflux 0.003 snr 3260.7
"""
from __future__ import annotations
import numpy as np
import jax.numpy as jnp
from . import enmap, utils, uharm, pointsrcs
from .bunch import Bunch


def matched_filter_constcov(map, B, iN, uht=None, spin=0):
	"""Matched filter under a constant-covariance (harmonic-diagonal) noise
	model (reference analysis.matched_filter_constcov:124).
	B, iN: beam and inverse noise power in the uht's hprof format.
	Returns (rho, kappa)."""
	if uht is None: uht = uharm.UHT(map.shape, map.wcs)
	pixarea = enmap.pixsizemap(map.shape, map.wcs, broadcastable=True)
	rho = uht.map2harm_adjoint(uht.hmul(np.asarray(B)*np.asarray(iN),
		uht.map2harm(map, spin=spin)), spin=spin)
	rho = enmap.samewcs(jnp.asarray(rho)/jnp.asarray(np.asarray(pixarea)), map)
	kappa = uht.sum_hprof(np.asarray(B)**2*np.asarray(iN))/(4*np.pi)
	return rho, kappa

def matched_filter_white(map, B, ivar, uht=None, B2=None, high_acc=False):
	"""Matched filter for white (pixel-diagonal) noise with inverse variance
	ivar (reference analysis.matched_filter_white:154)."""
	if uht is None: uht = uharm.UHT(map.shape, map.wcs)
	P = 1/np.asarray(enmap.pixsizemap(map.shape, map.wcs, broadcastable=True))
	if B2 is None: B2 = uht.hprof_rpow(B, 2)
	ivm = enmap.samewcs(jnp.asarray(ivar)*jnp.asarray(map), map)
	rho = uht.map2harm_adjoint(uht.hmul(B, uht.harm2map_adjoint(ivm)))
	rho = enmap.samewcs(jnp.asarray(rho)*P, map)
	iv = ivar if isinstance(ivar, enmap.ndmap) else enmap.ndmap(jnp.asarray(ivar) + 0*jnp.asarray(map), map.wcs)
	kappa = uht.map2harm_adjoint(uht.hmul(B2, uht.harm2map_adjoint(iv)))
	kappa = enmap.samewcs(jnp.asarray(kappa)*P, map)
	return rho, kappa

def matched_filter_constcorr_lowcorr(map, B, ivar, iC, uht=None, B2=None,
		high_acc=False):
	"""Matched filter for noise N" = ivar^0.5 iC ivar^0.5 in the low-
	correlation limit (reference analysis.matched_filter_constcorr_lowcorr:193).
	iC: inverse correlation power in hprof format; ivar: per-pixel inverse
	variance map."""
	if uht is None: uht = uharm.UHT(map.shape, map.wcs)
	P = 1/np.asarray(enmap.pixsizemap(map.shape, map.wcs, broadcastable=True))
	V = enmap.samewcs(jnp.sqrt(jnp.asarray(ivar)), map)
	# rho = P' B' V iC V m
	m1 = enmap.samewcs(jnp.asarray(V)*jnp.asarray(map), map)
	m2 = uht.harm2map(uht.hmul(iC, uht.map2harm(m1)))
	m3 = enmap.samewcs(jnp.asarray(V)*jnp.asarray(m2), map)
	rho = uht.map2harm_adjoint(uht.hmul(B, uht.harm2map_adjoint(m3)))
	rho = enmap.samewcs(jnp.asarray(rho)*P, map)
	# kappa ~ P' B'^2(real) V iC_0-ish V: use the approximation
	# kappa = (B^2 conv) [ivar * mean(iC-weighted beam norm)]
	if B2 is None: B2 = uht.hprof_rpow(B, 2)
	l = np.asarray(uht.l)
	alpha = uht.sum_hprof(np.asarray(B)*0 + np.asarray(iC)*np.asarray(B)**0)*0
	# effective scalar: <iC B^2>/<B^2>
	wsum = uht.sum_hprof(np.asarray(iC)*np.asarray(B)**2)
	bsum = uht.sum_hprof(np.asarray(B)**2)
	scal = wsum/bsum
	iv = ivar if isinstance(ivar, enmap.ndmap) else enmap.ndmap(jnp.asarray(ivar) + 0*jnp.asarray(map), map.wcs)
	kappa = uht.map2harm_adjoint(uht.hmul(B2, uht.harm2map_adjoint(iv)))
	kappa = enmap.samewcs(jnp.asarray(kappa)*P*scal, map)
	return rho, kappa

def matched_filter_constcorr_smoothivar(map, B, ivar, iC, uht=None, high_acc=False):
	"""Matched filter for N" = ivar^0.5 iC ivar^0.5 assuming ivar varies
	slowly compared to the beam (reference analysis:265)."""
	if uht is None: uht = uharm.UHT(map.shape, map.wcs)
	V = enmap.samewcs(jnp.sqrt(jnp.asarray(ivar)), map)
	m1 = enmap.samewcs(jnp.asarray(V)*jnp.asarray(map), map)
	pixarea = np.asarray(enmap.pixsizemap(map.shape, map.wcs, broadcastable=True))
	f = uht.map2harm_adjoint(uht.hmul(np.asarray(B)*np.asarray(iC),
		uht.map2harm(m1)))
	rho = enmap.samewcs(jnp.asarray(V)*jnp.asarray(f)/jnp.asarray(pixarea), map)
	kappa0 = uht.sum_hprof(np.asarray(B)**2*np.asarray(iC))/(4*np.pi)
	kappa = enmap.samewcs(jnp.asarray(ivar)*kappa0/jnp.maximum(jnp.asarray(ivar)*0+1, 1), map)
	kappa = enmap.samewcs(jnp.asarray(ivar)*kappa0, map)
	return rho, kappa

def safe_pow(x, p):
	"""x**p that treats negative/zero values gracefully (reference analysis.safe_pow:1118)."""
	x = jnp.asarray(x)
	return jnp.sign(x)*jnp.abs(x)**p

def solve_mapsys(kappa, rho, lim=0):
	"""flux, dflux, snr from (rho, kappa) (reference analysis.solve_mapsys:1052)."""
	k = jnp.asarray(kappa) if not np.isscalar(kappa) else kappa
	good = k > lim if not np.isscalar(kappa) else kappa > lim
	ksafe = jnp.maximum(k, 1e-300) if not np.isscalar(kappa) else max(kappa, 1e-300)
	flux = jnp.asarray(rho)/ksafe
	dflux = ksafe**-0.5
	snr = jnp.asarray(rho)/ksafe**0.5
	return flux, dflux, snr

def snr_split(snr, lim=4):
	"""Split an snr map into (detections above lim, rest)."""
	s = jnp.asarray(snr)
	det = s > lim
	return det, ~det


# ---------------------------------------------------------------------------
# Noise models (reference analysis.Nmat:379-507)
# ---------------------------------------------------------------------------
class Nmat:
	"""Base class for noise models used by the finders."""
	def matched_filter(self, map): raise NotImplementedError
	def sim(self, seed=None): raise NotImplementedError

class NmatConstcov(Nmat):
	def __init__(self, iN, B, uht):
		self.iN, self.B, self.uht = np.asarray(iN), np.asarray(B), uht
	def matched_filter(self, map):
		return matched_filter_constcov(map, self.B, self.iN, uht=self.uht)

class NmatWhite(Nmat):
	def __init__(self, ivar, B, uht):
		self.ivar, self.B, self.uht = ivar, np.asarray(B), uht
		self.B2 = uht.hprof_rpow(self.B, 2)
	def matched_filter(self, map):
		return matched_filter_white(map, self.B, self.ivar, uht=self.uht, B2=self.B2)

class NmatConstcorr(Nmat):
	def __init__(self, iC, ivar, B, uht):
		self.iC, self.ivar, self.B, self.uht = np.asarray(iC), ivar, np.asarray(B), uht
	def matched_filter(self, map):
		return matched_filter_constcorr_lowcorr(map, self.B, self.ivar, self.iC,
			uht=self.uht)


# ---------------------------------------------------------------------------
# Finder / Measurer / Modeller (reference analysis.py:508-1045)
# ---------------------------------------------------------------------------
class FinderSimple:
	"""Find sources as peaks above an SNR threshold in the matched-filter map
	(reference analysis.FinderSimple:508)."""
	def __init__(self, nmat, snmin=5, grid_max=True):
		self.nmat = nmat
		self.snmin = snmin
	def __call__(self, map):
		rho, kappa = self.nmat.matched_filter(map)
		flux, dflux, snr = solve_mapsys(kappa, rho)
		snr_np = np.asarray(snr)
		# local maxima above threshold
		from scipy import ndimage
		mask = snr_np > self.snmin
		labels, nlab = ndimage.label(mask)
		cat = []
		if nlab > 0:
			peaks = ndimage.maximum_position(snr_np, labels, np.arange(1, nlab+1))
			for (py, px) in np.atleast_2d(peaks):
				pos = np.asarray(enmap.pix2sky(map.shape, map.wcs,
					np.array([[float(py)], [float(px)]])))[:, 0]
				f = float(np.asarray(flux)[..., int(py), int(px)]) if np.asarray(flux).ndim == 2 \
					else float(np.asarray(flux)[0, int(py), int(px)])
				df = float(np.asarray(dflux)[int(py), int(px)]) if np.ndim(dflux) >= 2 else float(dflux)
				s = float(snr_np[int(py), int(px)]) if snr_np.ndim == 2 else float(snr_np[0, int(py), int(px)])
				cat.append((pos[0], pos[1], f, df, s))
		cat = np.array(cat, dtype=[("dec", "f8"), ("ra", "f8"), ("flux", "f8"),
			("dflux", "f8"), ("snr", "f8")]) if cat else np.zeros(0,
			dtype=[("dec", "f8"), ("ra", "f8"), ("flux", "f8"), ("dflux", "f8"), ("snr", "f8")])
		return Bunch(cat=cat, snr=snr, flux=flux, dflux=dflux, rho=rho, kappa=kappa)

class MeasurerSimple:
	"""Measure fluxes at known positions using the matched-filter maps
	(reference analysis.MeasurerSimple:899)."""
	def __init__(self, nmat):
		self.nmat = nmat
	def __call__(self, map, cat):
		rho, kappa = self.nmat.matched_filter(map)
		flux, dflux, snr = solve_mapsys(kappa, rho)
		poss = np.array([cat["dec"], cat["ra"]])
		pix = np.round(np.asarray(enmap.sky2pix(map.shape, map.wcs, poss))).astype(int)
		out = cat.copy()
		fl = np.asarray(flux)
		sn = np.asarray(snr)
		iy = np.clip(pix[0], 0, map.shape[-2]-1)
		ix = np.clip(pix[1], 0, map.shape[-1]-1)
		out["flux"] = fl[..., iy, ix] if fl.ndim == 2 else fl[0, iy, ix]
		out["snr"] = sn[..., iy, ix] if sn.ndim == 2 else sn[0, iy, ix]
		dfl = np.asarray(dflux)
		out["dflux"] = dfl[iy, ix] if dfl.ndim >= 2 else dfl
		return Bunch(cat=out)

class ModellerPerpix:
	"""Build a model map from a catalog by painting beam-profiles
	(reference analysis.Modeller*:968)."""
	def __init__(self, shape, wcs, beam_prof, dtype=np.float64):
		self.shape, self.wcs = shape, wcs
		self.beam_prof = beam_prof
		self.dtype = dtype
	def __call__(self, cat):
		if len(cat) == 0: return enmap.zeros(self.shape, self.wcs, self.dtype)
		poss = np.array([cat["dec"], cat["ra"]])
		amps = np.asarray(cat["flux"], self.dtype)
		return pointsrcs.sim_objects(self.shape, self.wcs, poss, amps,
			self.beam_prof, dtype=self.dtype)

class FinderIterative:
	"""Iterative find -> model -> subtract -> refind
	(reference analysis.FinderIterative:788)."""
	def __init__(self, finder, modeller, niter=3, mindist_deg=0.1):
		self.finder = finder
		self.modeller = modeller
		self.niter = niter
	def __call__(self, map):
		resid = map
		cats = []
		for i in range(self.niter):
			res = self.finder(resid)
			if len(res.cat) == 0: break
			cats.append(res.cat)
			model = self.modeller(res.cat)
			resid = enmap.samewcs(jnp.asarray(resid) - jnp.asarray(model), map)
		cat = np.concatenate(cats) if cats else np.zeros(0,
			dtype=[("dec", "f8"), ("ra", "f8"), ("flux", "f8"), ("dflux", "f8"), ("snr", "f8")])
		model_tot = self.modeller(cat)
		return Bunch(cat=cat, resid=resid, model=model_tot)


class FinderMulti:
	"""Find objects matching the best of several profiles: runs a matched
	filter per profile and picks the highest-SNR template per detection
	(reference analysis.FinderMulti:586)."""
	def __init__(self, nmats, snmin=5):
		self.nmats = nmats
		self.snmin = snmin
	def __call__(self, map):
		results = []
		for nmat in self.nmats:
			rho, kappa = nmat.matched_filter(map)
			flux, dflux, snr = solve_mapsys(kappa, rho)
			results.append((flux, dflux, snr))
		snrs = jnp.stack([jnp.asarray(r[2]) for r in results])
		best = jnp.argmax(snrs, 0)
		snr_best = jnp.max(snrs, 0)
		from scipy import ndimage
		snr_np = np.asarray(snr_best)
		mask = snr_np > self.snmin
		labels, nlab = ndimage.label(mask)
		rows = []
		if nlab > 0:
			peaks = ndimage.maximum_position(snr_np, labels, np.arange(1, nlab+1))
			best_np = np.asarray(best)
			for (py, px) in np.atleast_2d(peaks):
				py, px = int(py), int(px)
				bi = int(best_np[py, px] if best_np.ndim == 2 else best_np[..., py, px].ravel()[0])
				flux, dflux, snr = results[bi]
				pos = np.asarray(enmap.pix2sky(map.shape, map.wcs,
					np.array([[float(py)], [float(px)]])))[:, 0]
				f = float(np.asarray(flux).reshape(-1, *np.asarray(flux).shape[-2:])[0, py, px])
				df = float(np.asarray(dflux)[py, px]) if np.ndim(dflux) >= 2 else float(dflux)
				s = float(snr_np[py, px])
				rows.append((pos[0], pos[1], f, df, s, bi))
		cat = np.array(rows, dtype=[("dec", "f8"), ("ra", "f8"), ("flux", "f8"),
			("dflux", "f8"), ("snr", "f8"), ("profile", "i4")]) if rows else \
			np.zeros(0, dtype=[("dec", "f8"), ("ra", "f8"), ("flux", "f8"),
			("dflux", "f8"), ("snr", "f8"), ("profile", "i4")])
		return Bunch(cat=cat, snr=snr_best)


class NmatWavelet(Nmat):
	"""Wavelet-diagonal noise model (reference analysis.NmatWavelet:480):
	noise variance estimated per wavelet scale and position, giving a
	position-dependent colored noise model. iN = W' diag(1/var) W."""
	def __init__(self, wt, noise_map=None, B=None, smooth_pix=8):
		"""wt: a wavelets.WaveletTransform; noise_map: a noise realization or
		residual map to calibrate the per-scale variances from."""
		self.wt = wt
		self.B = None if B is None else np.asarray(B)
		self.vars = None
		self.smooth_pix = smooth_pix
		if noise_map is not None:
			self.calibrate(noise_map)
	def calibrate(self, noise_map):
		from scipy import ndimage
		wave = self.wt.map2wave(noise_map)
		self.vars = []
		for m in wave.maps:
			v = np.asarray(m)**2
			v = ndimage.uniform_filter(v, size=self.smooth_pix)
			self.vars.append(np.maximum(v, np.mean(v)*1e-4))
		return self
	def apply_iN(self, map):
		"""N" map = W' diag(1/var) W map."""
		wave = self.wt.map2wave(map)
		from . import multimap, enmap as _e
		whitened = multimap.ndmaps([
			_e.ndmap(jnp.asarray(m)/jnp.asarray(v), m.wcs)
			for m, v in zip(wave.maps, self.vars)])
		return self.wt.wave2map(whitened)
	def matched_filter(self, map):
		"""Approximate matched filter: rho = P'B' N" m; kappa from the
		average effective white level (percent-level, like the reference's
		fourier-operator caveat)."""
		uht = self.wt.uht
		iNm = self.apply_iN(map)
		P = 1/np.asarray(enmap.pixsizemap(map.shape, map.wcs, broadcastable=True))
		if self.B is not None:
			rho = uht.map2harm_adjoint(uht.hmul(self.B, uht.harm2map_adjoint(iNm)))
		else:
			rho = iNm
		rho = enmap.samewcs(jnp.asarray(rho)*P, map)
		# effective inverse-variance per pixel for kappa
		ivar_eff = sum(1.0/np.asarray(v) for v in self.vars)/len(self.vars)
		ivar_map = enmap.ndmap(jnp.asarray(ivar_eff*0 + ivar_eff), map.wcs)
		if self.B is not None:
			B2 = uht.hprof_rpow(self.B, 2)
			kappa = uht.map2harm_adjoint(uht.hmul(B2, uht.harm2map_adjoint(ivar_map)))
			kappa = enmap.samewcs(jnp.asarray(kappa)*P, map)
		else:
			kappa = ivar_map
		return rho, kappa
