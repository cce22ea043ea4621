"""Point-source / object simulation and photometry.

TPU-native replacement for the reference's cell-decomposition C painter
(cython/srcsim_core.c, pixell/pointsrcs.py). The C code builds per-cell
object lists with dynamic sizes; here we paint fixed-size stamps around each
object with a scatter-add (scan over objects of a vectorized stamp update),
which is jit-compatible and parallelizes over the stamp pixels. Photometry
(radial_sum) is the matching gather.
"""
from __future__ import annotations
import functools
import numpy as np
import jax
import jax.numpy as jnp
from . import enmap, utils, wcsutils


def expand_beam(beam, nsamp=10000, rmax=None, tol=1e-7):
	"""Normalize a beam spec into (r, br) arrays. beam can be a scalar
	(gaussian sigma in radians), an (r, br) tuple, or a [2,n]/[n,2] array
	(reference pointsrcs.expand_beam:375)."""
	if np.isscalar(beam) or np.ndim(beam) == 0:
		sigma = float(beam)
		if rmax is None: rmax = sigma*nsigma2rmax(1.0, tol)
		r = np.linspace(0, rmax, nsamp)
		return np.array([r, np.exp(-0.5*(r/sigma)**2)])
	beam = np.asarray(beam)
	if beam.ndim == 1:
		r = np.linspace(0, rmax if rmax else 5*utils.degree, len(beam))
		return np.array([r, beam])
	if beam.shape[0] != 2: beam = beam.T
	return beam

def nsigma2rmax(sigma, tol=1e-7):
	"""Radius in sigmas where a gaussian reaches tol."""
	return np.sqrt(-2*np.log(tol))

def _profile_rmax(prof, vmin):
	r, br = prof
	above = np.where(np.abs(br) >= vmin)[0]
	return r[above[-1]] if len(above) else r[-1]


@functools.partial(jax.jit, static_argnames=("R", "op", "nypix", "nxpix", "wrapx", "separable"))
def _paint_core(omap, pix, amps, prof_r, prof_b, prof_ids, posmap_dec, posmap_ra,
		src_dec, src_ra, R, op, nypix, nxpix, wrapx, separable):
	"""Scatter fixed-size stamps: for each source, evaluate its profile at the
	angular distance of each stamp pixel and combine into the map."""
	dy = jnp.arange(-R, R+1)
	dx = jnp.arange(-R, R+1)
	def body(carry, inp):
		m = carry
		cpix, amp, pid, sdec, sra = inp
		iy = (cpix[0].astype(jnp.int32) + dy)
		ix = (cpix[1].astype(jnp.int32) + dx)
		iyc = jnp.clip(iy, 0, nypix-1)
		ixc = ix % nxpix if wrapx else jnp.clip(ix, 0, nxpix-1)
		# pixel positions of the stamp
		pdec = posmap_dec[iyc][:, None] if separable else posmap_dec[iyc[:, None], ixc[None, :]]
		pra  = posmap_ra[ixc][None, :] if separable else posmap_ra[iyc[:, None], ixc[None, :]]
		r = utils.angdist(jnp.stack([pra + 0*pdec, pdec + 0*pra]),
			jnp.stack([sra, sdec]), axis=0)
		# per-source profile: interpolate in r (prof_r/prof_b are [nprof, ns])
		br = jnp.interp(r, prof_r[pid], prof_b[pid], right=0.0)
		val = amp*br
		# mask pixels clamped away (out of bounds in y or non-wrapping x)
		good = (iy >= 0)[:, None] & (iy < nypix)[:, None]
		if not wrapx:
			good = good & ((ix >= 0) & (ix < nxpix))[None, :]
		val = jnp.where(good, val, 0.0)
		if op == "add":
			m = m.at[..., iyc[:, None], ixc[None, :]].add(val)
		elif op == "max":
			m = m.at[..., iyc[:, None], ixc[None, :]].max(jnp.where(good, val, -jnp.inf))
		elif op == "min":
			m = m.at[..., iyc[:, None], ixc[None, :]].min(jnp.where(good, val, jnp.inf))
		return m, None
	omap, _ = jax.lax.scan(body, omap, (pix.T, amps, prof_ids, src_dec, src_ra))
	return omap


def sim_objects(shape, wcs, poss, amps, profile, prof_ids=None, omap=None,
		vmin=None, rmax=None, op="add", pixwin=False, separable="auto",
		transpose=False, prof_equi=None, return_times=False, dtype=np.float32):
	"""Paint radial profiles at poss[{dec,ra},nobj] with amplitudes
	amps[nobj] (or [ncomp,nobj]) onto a map (reference pointsrcs.sim_objects:35
	over srcsim_core.c).

	profile: (r, br) arrays, or a list of them (with prof_ids selecting);
	vmin: profile truncated where |br*amp| < vmin; rmax: hard radius cap."""
	poss = np.asarray(poss)
	amps = np.asarray(amps, dtype)
	if isinstance(profile, (tuple, list)) and np.ndim(profile[0]) > 1 or \
			(isinstance(profile, list) and len(profile) and np.ndim(profile[0]) == 2):
		profs = [np.asarray(p) for p in profile]
	elif np.ndim(profile) == 3:
		profs = [np.asarray(p) for p in profile]
	else:
		profs = [np.asarray(profile)]
	if prof_ids is None: prof_ids = np.zeros(poss.shape[1], int)
	prof_ids = np.asarray(prof_ids, int)
	# common r-sampling for all profiles
	ns = max(len(p[0]) for p in profs)
	prof_r = np.zeros((len(profs), ns))
	prof_b = np.zeros((len(profs), ns))
	for i, p in enumerate(profs):
		prof_r[i, :len(p[0])] = p[0]; prof_r[i, len(p[0]):] = p[0][-1]
		prof_b[i, :len(p[1])] = p[1]
	# stamp radius in pixels
	if rmax is None:
		if vmin is None: vmin = np.max(np.abs(amps))*1e-5
		amax = np.max(np.abs(amps)) if amps.size else 1.0
		rmax = max(_profile_rmax((prof_r[i], prof_b[i]*amax), vmin) for i in range(len(profs)))
	res_rad = np.abs(np.asarray(wcs.wcs.cdelt))*utils.degree
	# account for RA compression: stamp must cover rmax/cos(dec)
	dec_max = np.max(np.abs(poss[0])) if poss.size else 0
	cosd = max(np.cos(min(abs(dec_max) + rmax, np.pi/2*0.999)), 1e-3)
	R = int(np.ceil(rmax/min(res_rad)/cosd)) + 1
	R = min(R, max(shape[-2:]))
	if omap is None:
		omap = enmap.zeros(shape, wcs, dtype)
	if separable == "auto": separable = wcsutils.is_separable(wcs)
	if separable:
		dec, ra = enmap.posaxes(shape, wcs)
		pm_dec, pm_ra = jnp.asarray(dec, dtype), jnp.asarray(ra, dtype)
	else:
		pm = np.asarray(enmap.posmap(shape, wcs, safe=False))
		pm_dec, pm_ra = jnp.asarray(pm[0], dtype), jnp.asarray(pm[1], dtype)
	pix = np.round(np.asarray(enmap.sky2pix(shape, wcs, poss))).astype(np.int32)
	wrapx = abs(abs(wcs.wcs.cdelt[0])*shape[-1] - 360.0) < 1e-6
	data = jnp.asarray(omap.data, dtype)
	out = _paint_core(data, jnp.asarray(pix), jnp.asarray(amps),
		jnp.asarray(prof_r, dtype), jnp.asarray(prof_b, dtype),
		jnp.asarray(prof_ids), pm_dec, pm_ra,
		jnp.asarray(poss[0], dtype), jnp.asarray(poss[1], dtype),
		int(R), op, shape[-2], shape[-1], bool(wrapx), bool(separable))
	res = enmap.ndmap(out, wcs)
	if pixwin:
		res = enmap.apply_window(res)
	return res


@functools.partial(jax.jit, static_argnames=("R", "nbin", "nypix", "nxpix", "wrapx", "separable"))
def _radial_sum_core(marr, pix, src_dec, src_ra, bsize, R, nbin, posmap_dec,
		posmap_ra, nypix, nxpix, wrapx, separable):
	dy = jnp.arange(-R, R+1)
	dx = jnp.arange(-R, R+1)
	def one(cpix, sdec, sra):
		iy = cpix[0].astype(jnp.int32) + dy
		ix = cpix[1].astype(jnp.int32) + dx
		iyc = jnp.clip(iy, 0, nypix-1)
		ixc = ix % nxpix if wrapx else jnp.clip(ix, 0, nxpix-1)
		pdec = posmap_dec[iyc][:, None] if separable else posmap_dec[iyc[:, None], ixc[None, :]]
		pra  = posmap_ra[ixc][None, :] if separable else posmap_ra[iyc[:, None], ixc[None, :]]
		r = utils.angdist(jnp.stack([pra + 0*pdec, pdec + 0*pra]),
			jnp.stack([sra, sdec]), axis=0)
		good = (iy >= 0)[:, None] & (iy < nypix)[:, None]
		if not wrapx:
			good = good & ((ix >= 0) & (ix < nxpix))[None, :]
		vals = marr[..., iyc[:, None], ixc[None, :]]
		ib = jnp.minimum((r/bsize).astype(jnp.int32), nbin-1)
		ib = jnp.where(good, ib, nbin-1)
		vals = jnp.where(good & (r/bsize < nbin), vals, 0.0)
		flat = vals.reshape(vals.shape[:-2] + (-1,))
		ibf = ib.reshape(-1)
		return jax.vmap(lambda v: jnp.zeros(nbin, marr.dtype).at[ibf].add(v))(
			flat.reshape((-1, flat.shape[-1]))).reshape(vals.shape[:-2] + (nbin,))
	return jax.vmap(one)(pix.T, src_dec, src_ra)

def radial_sum(map, poss, bins, oprofs=None, separable="auto"):
	"""Sum map values in radial bins around each object
	(reference pointsrcs.radial_sum:130 over srcsim radial_sum)."""
	poss = np.asarray(poss)
	bins = np.asarray(bins)
	bsize = bins[1] - bins[0]
	nbin = len(bins) - 1 if len(bins) > 1 else 1
	shape, wcs = map.shape, map.wcs
	rmax = bins[-1]
	res_rad = np.abs(np.asarray(wcs.wcs.cdelt))*utils.degree
	dec_max = np.max(np.abs(poss[0])) if poss.size else 0
	cosd = max(np.cos(min(abs(dec_max) + rmax, np.pi/2*0.999)), 1e-3)
	R = min(int(np.ceil(rmax/min(res_rad)/cosd)) + 1, max(shape[-2:]))
	if separable == "auto": separable = wcsutils.is_separable(wcs)
	if separable:
		dec, ra = enmap.posaxes(shape, wcs)
		pm_dec, pm_ra = jnp.asarray(dec), jnp.asarray(ra)
	else:
		pm = np.asarray(enmap.posmap(shape, wcs, safe=False))
		pm_dec, pm_ra = jnp.asarray(pm[0]), jnp.asarray(pm[1])
	pix = np.round(np.asarray(enmap.sky2pix(shape, wcs, poss))).astype(np.int32)
	wrapx = abs(abs(wcs.wcs.cdelt[0])*shape[-1] - 360.0) < 1e-6
	res = _radial_sum_core(jnp.asarray(map.data), jnp.asarray(pix),
		jnp.asarray(poss[0]), jnp.asarray(poss[1]), float(bsize), int(R),
		int(nbin), pm_dec, pm_ra, shape[-2], shape[-1], bool(wrapx), bool(separable))
	# [nobj, ..., nbin] -> [nobj, nbin] or [nobj, ncomp, nbin]
	return np.asarray(res)

def radial_bin(map, poss, bins, separable="auto"):
	"""Average map values in radial bins around each object."""
	sums = radial_sum(map, poss, bins, separable=separable)
	ones = enmap.ndmap(jnp.ones(map.shape[-2:]), map.wcs)
	hits = radial_sum(ones, poss, bins, separable=separable)
	return sums/np.maximum(hits, 1)


def sim_srcs(shape, wcs, srcs, beam, omap=None, dtype=np.float32, nsigma=5,
		rmax=None, smul=1, return_padded=False, pixwin=False, op="add",
		separable="auto", method="c"):
	"""Legacy point-source sim: srcs[nsrc,{dec,ra,amp}] with a beam
	(reference pointsrcs.sim_srcs:212)."""
	srcs = np.asarray(srcs)
	prof = expand_beam(beam, rmax=rmax)
	poss = srcs[:, :2].T
	amps = srcs[:, 2].astype(dtype)
	res = sim_objects(shape, wcs, poss, amps, prof, omap=omap, rmax=rmax,
		op=op, pixwin=pixwin, separable=separable, dtype=dtype)
	return res


# ---------------------------------------------------------------------------
# Catalog I/O (reference pointsrcs.py:495-654). Text and hdf5 formats; the
# FITS-table formats of the reference need a table reader we don't have yet.
# ---------------------------------------------------------------------------
def read(fname, format="auto", amp_factor=None):
	"""Read a point source catalog (reference pointsrcs.read:495). Formats:
	simple (text ra dec amp), hdf, fits (generic bintable with ra/dec
	columns), nemo (RADeg/decDeg/deltaT_c), dory, sauron."""
	if format == "auto":
		if fname.endswith(".txt") or fname.endswith(".cat"): format = "simple"
		elif fname.endswith(".hdf") or fname.endswith(".h5"): format = "hdf"
		elif fname.endswith(".fits") or fname.endswith(".fits.gz"): format = "fits"
		else: format = "simple"
	if format == "simple": return read_simple(fname)
	if format == "hdf": return read_hdf_cat(fname)
	if format in ["fits", "nemo", "dory", "sauron"]:
		return read_fits_cat(fname, format=format)
	raise ValueError("Unknown catalog format '%s'" % format)

def read_fits_cat(fname, format="fits"):
	"""Read a FITS bintable catalog, handling the column conventions of the
	nemo/dory/sauron formats (reference pointsrcs.py:495-637)."""
	from . import fits_io
	from .bunch import Bunch
	tab = fits_io.read_table(fname)
	cols = {k.lower(): k for k in tab if not k.startswith("_")}
	res = Bunch()
	def get(*names):
		for n in names:
			if n.lower() in cols: return np.asarray(tab[cols[n.lower()]])
		return None
	if format == "nemo" or (format == "fits" and "radeg" in cols):
		res.ra = get("RADeg")*utils.degree
		res.dec = get("decDeg")*utils.degree
		amp = get("deltaT_c", "y_c", "fixed_y_c")
		res.I = amp if amp is not None else np.ones(len(res.ra))
	else:
		ra = get("ra", "ra_deg")
		dec = get("dec", "dec_deg")
		# radians if values are small, else degrees
		unit = 1.0 if (ra is not None and np.max(np.abs(ra)) <= 2*np.pi+0.1) else utils.degree
		res.ra = ra*unit
		res.dec = dec*unit
		amp = get("amp", "flux", "flux_T", "I", "T")
		res.I = amp if amp is not None else np.ones(len(res.ra))
		for key, names in [("Q", ["Q", "flux_Q"]), ("U", ["U", "flux_U"]),
				("snr", ["snr", "SNR"])]:
			v = get(*names)
			if v is not None: res[key] = v
	if res.I is not None and res.I.ndim == 2:
		res.I = res.I[:, 0]
	return res

def write_fits_cat(fname, cat):
	from . import fits_io
	cols = dict(ra=np.asarray(cat.ra)/utils.degree, dec=np.asarray(cat.dec)/utils.degree,
		amp=np.asarray(cat.I))
	for key in ["Q", "U", "snr"]:
		if key in cat: cols[key] = np.asarray(cat[key])
	fits_io.write_table_fits(fname, cols)

def read_simple(fname):
	"""Text catalog: ra dec amp [amp2 amp3] in degrees/uK."""
	from .bunch import Bunch
	data = np.loadtxt(fname, ndmin=2)
	res = Bunch()
	res.ra = data[:, 0]*utils.degree
	res.dec = data[:, 1]*utils.degree
	res.I = data[:, 2] if data.shape[1] > 2 else np.ones(len(data))
	if data.shape[1] > 3: res.Q = data[:, 3]
	if data.shape[1] > 4: res.U = data[:, 4]
	return res

def read_hdf_cat(fname):
	from . import bunch
	return bunch.read(fname)

def write_simple(fname, cat):
	cols = [cat.ra/utils.degree, cat.dec/utils.degree, cat.I]
	for key in ["Q", "U"]:
		if key in cat: cols.append(cat[key])
	np.savetxt(fname, np.array(cols).T, fmt="%12.6f")

def src2param(srcs):
	"""Convert a catalog Bunch to the [nsrc,{dec,ra,amps..}] array form
	(reference pointsrcs.src2param:641)."""
	if hasattr(srcs, "ra"):
		cols = [srcs.dec, srcs.ra, srcs.I]
		for key in ["Q", "U"]:
			if key in srcs: cols.append(srcs[key])
		return np.array(cols).T
	return np.asarray(srcs)
