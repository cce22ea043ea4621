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

def snr_split(snrs, sntol=0.25, snmin=5):
	"""Group a list of S/N values into brightness tiers that can be processed
	together without interfering: each group's weakest member is at least
	sntol times its strongest; values below snmin share one group. Returns
	[inds_strongest, ..., inds_weakest] (reference analysis.snr_split:1097)."""
	from . import utils
	v = np.log(np.maximum(np.abs(np.asarray(snrs)), snmin))/np.log(1/sntol)
	v -= np.max(v) + 1e-9
	v = np.floor(v).astype(int)
	return utils.find_equal_groups(v)[::-1]

def sanitize_kappa(kappa, tol=1e-4, inplace=False):
	"""Floor the diagonal of a [ncomp,ncomp,...] kappa at tol times its max
	(reference analysis.sanitize_kappa:1046)."""
	k = jnp.asarray(kappa)
	if k.ndim < 4 or k.shape[0] != k.shape[1]:
		out = jnp.maximum(k, jnp.max(k)*tol)
		from . import enmap as _e
		return _e.samewcs(out, kappa) if hasattr(kappa, "wcs") else out
	diag = jnp.einsum("aa...->a...", k)
	floor = jnp.max(diag.reshape(diag.shape[0], -1), -1)*tol
	floor = floor.reshape((-1,) + (1,)*(diag.ndim-1))
	newdiag = jnp.maximum(diag, floor)
	i = jnp.arange(k.shape[0])
	k = k.at[i, i].set(newdiag)
	from . import enmap as _e
	return _e.samewcs(k, kappa) if hasattr(kappa, "wcs") else k

def get_flat_sky_correction(pixratio):
	"""(reference analysis.get_flat_sky_correction:1063)."""
	return (0.5*(1 + pixratio**2))**-0.5, 1/pixratio

def dtype_concat(dtypes):
	return sum([np.dtype(dtype).descr for dtype in dtypes], [])

def merge_arrays(arrays):
	"""Merge record arrays column-wise (reference analysis.merge_arrays:1070)."""
	odtype = dtype_concat([a.dtype for a in arrays])
	res = np.zeros(arrays[0].shape, odtype)
	for a in arrays:
		for key in a.dtype.names:
			res[key] = a[key]
	return res

def rpow(fmap, exp=2):
	"""Raise a fourier-space map to a power in real space
	(reference analysis.rpow:1078)."""
	norm = fmap.area()**0.5
	map = enmap.ifft(enmap.samewcs(jnp.asarray(fmap)/norm + 0j, fmap),
		normalize="phys").real
	return enmap.samewcs(jnp.asarray(enmap.fft(map**exp, normalize="phys").real)*norm, fmap)

def rmul(*args):
	"""Multiply fourier-space maps in real space (reference analysis.rmul:1085)."""
	return rop(*args, op=jnp.multiply)

def rop(*args, op=None):
	"""Apply op to fourier-space maps in real space (reference analysis.rop:1094)."""
	if op is None: op = jnp.multiply
	norm = args[0].area()**0.5
	reals = [enmap.ifft(enmap.samewcs(jnp.asarray(a)/norm + 0j, args[0]),
		normalize="phys").real for a in args]
	work = reals[0]
	for r in reals[1:]: work = enmap.samewcs(op(jnp.asarray(work), jnp.asarray(r)), args[0])
	return enmap.samewcs(jnp.asarray(enmap.fft(work, normalize="phys").real)*norm, args[0])

def get_ref(a, tol=1e-3, default=0, n=1000):
	"""Robust positive reference value of an array (reference analysis.get_ref:1110)."""
	a = np.asarray(a)
	ref = 0
	for i in range(2):
		vals = a[a > ref]
		if vals.size == 0: return default
		step = max(1, vals.size//n)
		ref = np.median(vals[::step])
	return ref

def make_circle_labels(shape, wcs, pixs, inds=None, r=2*np.pi/180/60*2):
	"""Labels image with constant-radius circles around the given peak pixels
	(reference analysis.make_circle_labels:1124)."""
	if inds is None: inds = np.arange(1, len(pixs[0])+1)
	mask = np.zeros(shape[-2:], np.int32)
	mask[np.asarray(pixs[0], int), np.asarray(pixs[1], int)] = inds
	mask = enmap.ndmap(jnp.asarray(mask), wcs)
	dists, labels = enmap.labeled_distance_transform(mask, rmax=r)
	labels = np.array(labels)
	labels[np.asarray(dists) >= r] = 0
	return enmap.ndmap(jnp.asarray(labels), wcs)

def get_central_radius(fbeam, lknee=2000, alpha=-3):
	"""Radius of the first zero-crossing of the (filtered) real-space beam
	(reference analysis.get_central_radius:1132)."""
	l = np.asarray(fbeam.modlmap())
	fb = np.mean(np.asarray(fbeam).reshape((-1,) + fbeam.shape[-2:]), 0)
	with np.errstate(divide="ignore", invalid="ignore"):
		fb = fb*(1 + (l/lknee)**alpha)**-1
	fb = np.nan_to_num(fb)
	rbeam = enmap.ifft(enmap.ndmap(jnp.asarray(fb + 0j), fbeam.wcs)).real
	pos = enmap.pix2sky(fbeam.shape, fbeam.wcs, np.array([[0.0], [0.0]]))[:, 0]
	br, r = enmap.rbin(rbeam, center=pos)
	br = np.asarray(br); r = np.asarray(r)
	br = br/br[0]
	neg = np.nonzero(br < 0)[0]
	return r[neg[0]] if len(neg) else r[-1]


# ---------------------------------------------------------------------------
# Noise models (reference analysis.Nmat:379-507)
# ---------------------------------------------------------------------------
class Nmat:
	"""Base class for noise models used by the finders."""
	def matched_filter(self, map): raise NotImplementedError
	def simulate(self): raise NotImplementedError
	def sim(self, seed=None): return self.simulate(seed=seed)

class NmatConstcov(Nmat):
	def __init__(self, iN, B, uht):
		self.iN, self.B, self.uht = np.asarray(iN), np.asarray(B), uht
	def matched_filter(self, map):
		return matched_filter_constcov(map, self.B, self.iN, uht=self.uht)
	def simulate(self, seed=None):
		"""Draw a noise realization with covariance N = iN^-1
		(reference analysis.NmatConstcov.simulate:426)."""
		hN = np.asarray(safe_pow(self.iN, -1))
		r = self.uht.hrand(hN, seed=seed)
		if self.uht.mode == "flat":
			return enmap.ifft(r).real
		omap = enmap.zeros(np.shape(r)[:-1] + tuple(self.uht.shape), self.uht.wcs)
		return curvedsky.alm2map(r, omap)

class NmatWhite(Nmat):
	def __init__(self, ivar, B, uht):
		self.ivar, self.B, self.uht = ivar, np.asarray(B), uht
		self.B2 = uht.hprof_rpow(self.B, 2)
	def matched_filter(self, map):
		return matched_filter_white(map, self.B, self.ivar, uht=self.uht, B2=self.B2)
	def simulate(self, seed=None):
		"""White noise with variance 1/ivar where ivar>0."""
		rng = np.random.default_rng(seed)
		iv = np.asarray(self.ivar)
		sig = np.where(iv > 0, np.abs(iv)**-0.5, 0.0)
		return enmap.samewcs(rng.standard_normal(iv.shape)*sig, self.ivar)

class NmatConstcorr(Nmat):
	def __init__(self, iC, ivar, B, uht):
		self.iC, self.ivar, self.B, self.uht = np.asarray(iC), ivar, np.asarray(B), uht
	def matched_filter(self, map):
		return matched_filter_constcorr_lowcorr(map, self.B, self.ivar, self.iC,
			uht=self.uht)
	def simulate(self, seed=None):
		"""Correlated noise modulated by the inverse-variance map
		(reference analysis.NmatConstcorr.simulate:474)."""
		hN = np.asarray(safe_pow(self.iC, -1))
		r = self.uht.hrand(hN, seed=seed)
		if self.uht.mode == "flat":
			sim = enmap.ifft(r).real
		else:
			omap = enmap.zeros(np.shape(r)[:-1] + tuple(self.uht.shape), self.uht.wcs)
			sim = curvedsky.alm2map(r, omap)
		iv = np.asarray(self.ivar)
		mod = np.where(iv > 0, np.abs(iv)**-0.5, 0.0)
		return enmap.samewcs(np.asarray(sim)*mod, sim)


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


class FinderMultiSafe:
	"""Like FinderMulti, but measures each object only over pixels near its
	own peak (constant-radius circle labels per profile case), avoiding the
	mixed-case averaging problem (reference analysis.FinderMultiSafe:692)."""
	def __init__(self, nmats, snmin=5, r=None):
		"""nmats: list of noise models (one per profile case). r: per-case
		measurement radius in radians (default 2 arcmin each)."""
		self.nmats = nmats
		self.snmin = snmin
		if r is None: r = [2*np.pi/180/60]*len(nmats)
		self.rs = np.atleast_1d(r)*np.ones(len(nmats))
	def __call__(self, map, snmin=None):
		from scipy import ndimage
		if snmin is None: snmin = self.snmin
		results = []
		snr_tot, cases = None, None
		for ca, nmat in enumerate(self.nmats):
			rho, kappa = nmat.matched_filter(map)
			kappa = sanitize_kappa(kappa)
			flux, dflux, snr = solve_mapsys(kappa, rho)
			results.append((flux, dflux, snr))
			snr_np = np.asarray(snr)
			if snr_tot is None:
				snr_tot = snr_np.copy()
				cases = np.zeros(snr_np.shape, np.int8)
			else:
				mask = snr_np > snr_tot
				cases = np.where(mask, ca, cases)
				snr_tot = np.where(mask, snr_np, snr_tot)
		labels, nlab = ndimage.label(snr_tot > snmin)
		dtype = [("dec", "f8"), ("ra", "f8"), ("flux", "f8"), ("dflux", "f8"),
			("snr", "f8"), ("case", "i4")]
		if nlab == 0:
			return Bunch(cat=np.zeros(0, dtype).view(np.recarray),
				snr=enmap.samewcs(jnp.asarray(snr_tot), map), snmin=snmin)
		allofthem = np.arange(1, nlab+1)
		pixs0 = np.array(ndimage.maximum_position(snr_tot, labels, allofthem)).T
		cat = np.zeros(nlab, dtype).view(np.recarray)
		cat.case = cases[pixs0[0], pixs0[1]]
		cat.snr = snr_tot[pixs0[0], pixs0[1]]
		# process each case separately with its own circle labels
		for ca in range(len(self.nmats)):
			sel = np.nonzero(cat.case == ca)[0]
			if len(sel) == 0: continue
			flux, dflux, snr = results[ca]
			snr_np = np.asarray(snr)
			my_labels = np.asarray(make_circle_labels(map.shape, map.wcs,
				pixs0[:, sel], inds=sel+1, r=self.rs[ca]))
			coms = ndimage.center_of_mass(snr_np**2, my_labels, sel+1)
			pixs = np.array(coms).T
			pos = np.asarray(enmap.pix2sky(map.shape, map.wcs, pixs))
			cat.dec[sel], cat.ra[sel] = pos[0], pos[1]
			fl = np.asarray(flux).reshape((-1,) + np.asarray(flux).shape[-2:])[0]
			ip = np.round(pixs).astype(int)
			ip[0] = np.clip(ip[0], 0, fl.shape[-2]-1)
			ip[1] = np.clip(ip[1], 0, fl.shape[-1]-1)
			cat.flux[sel] = fl[ip[0], ip[1]]
			dfl = np.asarray(dflux)
			cat.dflux[sel] = dfl[ip[0], ip[1]] if dfl.ndim >= 2 else float(dfl)
		cat = cat[np.argsort(cat.snr)[::-1]]
		return Bunch(cat=cat, snr=enmap.samewcs(jnp.asarray(snr_tot), map), snmin=snmin)


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


def matched_filter_constcorr_dual(map, B, ivar, iC, uht=None, S=None, iS=None):
	"""Matched filter for the dual constant-correlation model
	iN = iC^0.5 ivar iC^0.5 (reference analysis.matched_filter_constcorr_dual)."""
	if uht is None: uht = uharm.UHT(map.shape, map.wcs)
	pixarea = np.asarray(enmap.pixsizemap(map.shape, map.wcs, broadcastable=True))
	W = uht.quad_weights()
	hC = np.asarray(iC)**0.5
	BC2 = uht.hprof_rpow(np.asarray(B)*hC, 2)
	if S is None: S = lambda x: x
	if iS is None: iS = lambda x: x
	def h2m(h): return uht.harm2map(h)
	def m2h(m): return uht.map2harm(m)
	inner = h2m(uht.hmul(hC, m2h(S(map))))
	inner = enmap.samewcs(jnp.asarray(ivar)*jnp.asarray(iS(inner)), map)
	inner = h2m(uht.hmul(hC, m2h(S(inner))))
	rho = uht.harm2map(uht.hmul(np.asarray(B), uht.map2harm(iS(inner))))
	rho = enmap.samewcs(jnp.asarray(rho)/pixarea, map)
	kappa = uht.map2harm_adjoint(uht.hmul(BC2,
		uht.harm2map_adjoint(enmap.samewcs(jnp.asarray(ivar)*W, map))))
	kappa = enmap.samewcs(jnp.asarray(kappa)/pixarea**2, map)
	return rho, kappa


# Abstract bases (reference analysis.py:560-580)
class Finder:
	def __call__(self, map): raise NotImplementedError

class Measurer:
	def __call__(self, map, cat): raise NotImplementedError

class Modeller:
	def __call__(self, cat): raise NotImplementedError
	def amplitudes(self, cat): raise NotImplementedError


class MeasurerMulti(Measurer):
	"""Route each catalog case to its own measurer (reference
	analysis.MeasurerMulti)."""
	def __init__(self, measurers):
		self.measurers = measurers
	def __call__(self, map, icat):
		from . import utils as _u
		cat = icat.copy()
		if len(icat) == 0: return Bunch(cat=cat)
		uvals, order, edges = _u.find_equal_groups_fast(icat["case"])
		for i, ca in enumerate(uvals):
			sel = order[edges[i]:edges[i+1]]
			if len(sel) == 0: continue
			cat[sel] = self.measurers[int(ca)](map, icat[sel]).cat
		return Bunch(cat=cat)


class MeasurerIterative(Measurer):
	"""Measure in brightness tiers, subtracting models of brighter tiers
	(reference analysis.MeasurerIterative)."""
	def __init__(self, measurer, modeller, sntol=0.25, snscale=1):
		self.measurer = measurer
		self.modeller = modeller
		self.sntol = sntol
		self.snscale = snscale
		self.snmin = 0.1
	def __call__(self, map, icat, verbose=False):
		cat = icat.copy()
		if cat.size == 0:
			return Bunch(cat=cat, model=self.modeller(cat))
		snr = icat["snr"]*self.snscale
		groups = snr_split(snr, sntol=self.sntol, snmin=self.snmin)
		model = enmap.samewcs(jnp.zeros_like(jnp.asarray(map)), map)
		for gi, group in enumerate(groups):
			group = np.asarray(group, int)
			if verbose:
				print("Measuring group %d with snmin %6.2f" % (gi+1, np.min(np.asarray(snr)[group])))
			resid = enmap.samewcs(jnp.asarray(map) - jnp.asarray(model), map)
			subcat = self.measurer(resid, icat[group]).cat
			model = enmap.samewcs(jnp.asarray(model) + jnp.asarray(self.modeller(subcat)), map)
			cat[group] = subcat
		return Bunch(cat=cat, model=model)


class ModellerPerfreq(Modeller):
	"""Per-frequency source model painting (reference
	analysis.ModellerPerfreq)."""
	def __init__(self, shape, wcs, beam_profiles, dtype=np.float32, nsigma=5):
		from . import utils as _u
		self.shape, self.wcs = shape, wcs
		self.dtype, self.nsigma = dtype, nsigma
		self.beam_profiles = [np.array([r, b/np.max(b)]) for r, b in beam_profiles]
		self.areas = np.array([_u.calc_beam_area(p) for p in self.beam_profiles])
	def __call__(self, cat):
		from . import pointsrcs
		ncomp = len(self.beam_profiles)
		omap = enmap.zeros((ncomp,) + tuple(self.shape[-2:]), self.wcs, self.dtype)
		if len(cat) == 0: return omap
		outs = []
		flux = np.atleast_2d(np.asarray(cat["flux"]))
		if flux.shape[0] == len(cat): flux = flux.T if flux.ndim == 2 and flux.shape[1] != len(cat) else flux
		for i in range(ncomp):
			fi = np.asarray(cat["flux"]) if np.asarray(cat["flux"]).ndim == 1 \
				else np.asarray(cat["flux"])[:, i]
			srcparam = np.stack([np.asarray(cat["dec"]), np.asarray(cat["ra"]),
				fi/self.areas[i]], -1)
			outs.append(jnp.asarray(pointsrcs.sim_srcs(tuple(self.shape[-2:]), self.wcs,
				srcparam, self.beam_profiles[i], dtype=self.dtype, nsigma=self.nsigma)))
		return enmap.ndmap(jnp.stack(outs), self.wcs)
	def amplitudes(self, cat):
		bpeaks = np.array([p[1, 0] for p in self.beam_profiles])
		return np.asarray(cat["flux"])*(bpeaks/self.areas)


class ModellerScaled(Modeller):
	"""Scaled total-flux source model (reference analysis.ModellerScaled)."""
	def __init__(self, shape, wcs, beam_profiles, scaling, dtype=np.float32, nsigma=5):
		from . import utils as _u
		self.shape, self.wcs = shape, wcs
		self.dtype, self.nsigma = dtype, nsigma
		self.scaling = np.asarray(scaling)
		self.beam_profiles = [np.array([r, b/np.max(b)]) for r, b in beam_profiles]
		self.areas = np.array([_u.calc_beam_area(p) for p in self.beam_profiles])
	def __call__(self, cat):
		from . import pointsrcs
		ncomp = len(self.beam_profiles)
		omap = enmap.zeros((ncomp,) + tuple(self.shape[-2:]), self.wcs, self.dtype)
		if len(cat) == 0: return omap
		ftot = np.asarray(cat["flux_tot"]) if "flux_tot" in cat.dtype.names \
			else np.asarray(cat["flux"])
		outs = []
		for i in range(ncomp):
			srcparam = np.stack([np.asarray(cat["dec"]), np.asarray(cat["ra"]),
				ftot*self.scaling[i]/self.areas[i]], -1)
			outs.append(jnp.asarray(pointsrcs.sim_srcs(tuple(self.shape[-2:]), self.wcs,
				srcparam, self.beam_profiles[i], dtype=self.dtype, nsigma=self.nsigma)))
		return enmap.ndmap(jnp.stack(outs), self.wcs)
	def amplitudes(self, cat):
		bpeaks = np.array([p[1, 0] for p in self.beam_profiles])
		ftot = np.asarray(cat["flux_tot"]) if "flux_tot" in cat.dtype.names \
			else np.asarray(cat["flux"])
		return ftot[:, None]*(self.scaling*bpeaks/self.areas)


class ModellerMulti(Modeller):
	"""Route each catalog case to its own modeller (reference
	analysis.ModellerMulti)."""
	def __init__(self, modellers):
		self.modellers = modellers
	def __call__(self, cat):
		from . import utils as _u
		if len(cat) == 0: return self.modellers[0](cat)
		uvals, order, edges = _u.find_equal_groups_fast(cat["case"])
		omap = None
		for i, ca in enumerate(uvals):
			subcat = cat[order[edges[i]:edges[i+1]]]
			if len(subcat) == 0: continue
			m = self.modellers[int(ca)](subcat)
			omap = m if omap is None else enmap.samewcs(
				jnp.asarray(omap) + jnp.asarray(m), m)
		return omap
	def amplitudes(self, cat):
		from . import utils as _u
		res = np.zeros(np.asarray(cat["flux"]).shape)
		if len(cat) == 0: return res
		uvals, order, edges = _u.find_equal_groups_fast(cat["case"])
		for i, ca in enumerate(uvals):
			sel = order[edges[i]:edges[i+1]]
			res[sel] = self.modellers[int(ca)].amplitudes(cat[sel])
		return res
