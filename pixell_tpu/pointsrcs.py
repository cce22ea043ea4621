"""Point-source / object simulation and photometry.

TPU-native replacement for the reference's cell-decomposition C painter
(cython/srcsim_core.c, pixell/pointsrcs.py). Like the reference, the map is
split into cells and each cell evaluates only the objects whose per-object
maximum radius reaches it; unlike the C code's dynamic per-cell lists +
OpenMP loop, the cell->object assignment is built host-side as a fixed-size
[ncell_active, K] table and ONE jitted kernel evaluates all (cell, slot)
pairs vectorized, scattering non-overlapping cell blocks back into the map.
transpose=True runs the exact adjoint (map -> per-object amplitudes) as a
gather-reduce over the same cells (reference srcsim_core.c sim_objects
transpose path). Photometry (radial_sum) is the matching gather.
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


CSIZE = 32  # cell size in pixels (reference srcsim default 8; TPU prefers
# bigger blocks: fewer, wider vector ops. Work = sum_i cells(i)*CSIZE^2.)

def _build_cells(pix, Ry, Rx, ny, nx, csize, wrapx):
	"""Host-side cell assignment (reference srcsim_core.c assign_cells):
	for each object, find the cells its per-object pixel radius (Ry, Rx)
	touches; return (cell_ids[nact], cell_src[nact, K]) with -1 padding.
	K is rounded up to a power of two to bucket jit recompiles."""
	ncy, ncx = -(-ny//csize), -(-nx//csize)
	y, x = pix[0], pix[1]
	cy0 = np.clip((y - Ry)//csize, 0, ncy-1)
	cy1 = np.clip((y + Ry)//csize, 0, ncy-1)
	alive = (y + Ry >= 0) & (y - Ry < ny)
	if wrapx:
		x = x % nx
		xc0 = (x - Rx)//csize            # may be negative: wraps
		nxc = np.minimum((x + Rx)//csize - xc0 + 1, ncx)
	else:
		xc0 = np.clip((x - Rx)//csize, 0, ncx-1)
		nxc = np.clip((x + Rx)//csize, 0, ncx-1) - xc0 + 1
		alive &= (x + Rx >= 0) & (x - Rx < nx)
	nyc = np.where(alive, cy1 - cy0 + 1, 0)
	nxc = np.where(alive, nxc, 1)
	cnt = nyc*nxc
	tot = int(cnt.sum())
	if tot == 0:
		return (np.zeros(0, np.int32), np.zeros((0, 1), np.int32))
	src = np.repeat(np.arange(len(y)), cnt)
	k = np.arange(tot) - np.repeat(np.cumsum(cnt) - cnt, cnt)
	ky, kx = k // nxc[src], k % nxc[src]
	cy = cy0[src] + ky
	cx = (xc0[src] + kx) % ncx if wrapx else xc0[src] + kx
	cell = (cy*ncx + cx).astype(np.int64)
	order = np.argsort(cell, kind="stable")
	cell_s, src_s = cell[order], src[order].astype(np.int32)
	ucell, start, ccount = np.unique(cell_s, return_index=True,
		return_counts=True)
	K = 1 << int(np.ceil(np.log2(max(int(ccount.max()), 1))))
	cell_src = np.full((len(ucell), K), -1, np.int32)
	rowpos = np.arange(tot) - np.repeat(start, ccount)
	cell_src[np.repeat(np.arange(len(ucell)), ccount), rowpos] = src_s
	return ucell.astype(np.int32), cell_src


@functools.partial(jax.jit, static_argnames=(
	"csize", "op", "ny", "nx", "separable", "transpose"))
def _paint_cells(mflat, cell_ids, cell_src, amps, prof_b, prof_dr, prof_ids,
		pm_dec, pm_ra, src_dec, src_ra, csize, op, ny, nx, separable,
		transpose):
	"""Evaluate all (active cell, object slot) pairs. mflat is [ncomp, ny, nx].
	Forward: returns the combined map. Transpose: returns [ncomp, nobj]
	adjoint amplitudes (exact transpose of the op="add" forward paint).
	prof_b is [nprof, ns] on an equi-spaced r grid with spacing prof_dr."""
	ncomp = mflat.shape[0]
	nobj = src_dec.shape[0]
	cs = csize
	ncy, ncx = -(-ny//cs), -(-nx//cs)
	nact, K = cell_src.shape
	pad_y, pad_x = ncy*cs - ny, ncx*cs - nx
	mp = jnp.pad(mflat, ((0, 0), (0, pad_y), (0, pad_x)))
	blocks = mp.reshape(ncomp, ncy, cs, ncx, cs).transpose(1, 3, 0, 2, 4) \
		.reshape(ncy*ncx, ncomp, cs, cs)
	cblocks = blocks[cell_ids]                       # [nact, ncomp, cs, cs]
	cy, cx = cell_ids // ncx, cell_ids % ncx
	iy = cy[:, None]*cs + jnp.arange(cs)[None, :]    # [nact, cs]
	ix = cx[:, None]*cs + jnp.arange(cs)[None, :]
	inmap = ((iy < ny)[:, :, None] & (ix < nx)[:, None, :])
	if separable:
		pdec = pm_dec[jnp.minimum(iy, ny-1)][:, :, None]   # [nact, cs, 1]
		pra  = pm_ra[jnp.minimum(ix, nx-1)][:, None, :]    # [nact, 1, cs]
	else:
		iyc, ixc = jnp.minimum(iy, ny-1), jnp.minimum(ix, nx-1)
		pdec = pm_dec[iyc[:, :, None], ixc[:, None, :]]
		pra  = pm_ra[iyc[:, :, None], ixc[:, None, :]]
	ns = prof_b.shape[1]
	prof_flat = prof_b.reshape(-1)

	def eval_slot(k, _):
		sid = cell_src[:, k]
		valid = sid >= 0
		sidc = jnp.maximum(sid, 0)
		sdec, sra = src_dec[sidc], src_ra[sidc]
		pid = prof_ids[sidc]
		# exact angular distance, like reference calc_dist
		r = utils.angdist(
			jnp.stack([pra + 0*pdec, pdec + 0*pra]),
			jnp.stack([sra, sdec])[:, :, None, None], axis=0)
		# equi-spaced linear interp, 0 beyond the table
		t = r/prof_dr[pid][:, None, None]
		i0 = jnp.clip(t.astype(jnp.int32), 0, ns-2)
		f = jnp.clip(t - i0, 0.0, 1.0)
		base = pid[:, None, None]*ns + i0
		br = prof_flat[base]*(1 - f) + prof_flat[base + 1]*f
		br = jnp.where((t < ns - 1) & valid[:, None, None] & inmap, br, 0.0)
		return br, sidc, valid

	if transpose:
		def body(k, oamp):
			br, sidc, valid = eval_slot(k, None)
			s = jnp.einsum("acyx,ayx->ca", cblocks, br)
			s = jnp.where(valid[None, :], s, 0.0)
			return oamp.at[:, sidc].add(s)
		oamp = jnp.zeros((ncomp, nobj), mflat.dtype)
		return jax.lax.fori_loop(0, K, body, oamp)

	init = jnp.zeros((nact, ncomp, cs, cs), mflat.dtype)
	if op == "max": init = jnp.full_like(init, -jnp.inf)
	if op == "min": init = jnp.full_like(init, jnp.inf)
	def body(k, acc):
		br, sidc, valid = eval_slot(k, None)
		val = amps[:, sidc].T[:, :, None, None]*br[:, None, :, :]
		if op == "add":
			return acc + val
		bad = ~(valid[:, None, None] & inmap)[:, None, :, :]
		if op == "max":
			return jnp.maximum(acc, jnp.where(bad, -jnp.inf, val))
		return jnp.minimum(acc, jnp.where(bad, jnp.inf, val))
	acc = jax.lax.fori_loop(0, K, body, init)
	if op == "add":
		out = cblocks + acc
	elif op == "max":
		out = jnp.maximum(cblocks, jnp.where(jnp.isfinite(acc), acc, -jnp.inf))
	else:
		out = jnp.minimum(cblocks, jnp.where(jnp.isfinite(acc), acc, jnp.inf))
	blocks = blocks.at[cell_ids].set(out)
	mp = blocks.reshape(ncy, ncx, ncomp, cs, cs).transpose(2, 0, 3, 1, 4) \
		.reshape(ncomp, ncy*cs, ncx*cs)
	return mp[:, :ny, :nx]


def _norm_profiles(profile):
	"""Normalize a profile spec to a list of [2, ns] arrays. A scalar is
	interpreted as a gaussian sigma (convenience beyond the reference)."""
	if np.isscalar(profile) or np.ndim(profile) == 0:
		return [expand_beam(profile)]
	if isinstance(profile, (tuple, list)) and np.ndim(profile[0]) > 1 or \
			(isinstance(profile, list) and len(profile) and np.ndim(profile[0]) == 2):
		return [np.asarray(p) for p in profile]
	if np.ndim(profile) == 3:
		return [np.asarray(p) for p in profile]
	return [np.asarray(profile)]

def _equi_profiles(profs, dtype):
	"""Resample profiles onto per-profile EQUI-SPACED r grids sharing one
	sample count (index math instead of binary search; TPU gathers are the
	enemy). Already-equi profiles pass through exactly. Returns
	(prof_b[nprof, ns], prof_dr[nprof])."""
	def is_equi(r):
		return len(r) > 1 and r[0] == 0 and np.allclose(r[-1], (len(r)-1)*r[1])
	ns = max(max(len(p[0]) for p in profs), 2)
	if not all(is_equi(p[0]) for p in profs):
		ns = max(ns, 2048)  # dense enough for non-uniform tables
	prof_b = np.zeros((len(profs), ns), dtype)
	prof_dr = np.zeros(len(profs), dtype)
	for i, p in enumerate(profs):
		r, b = np.asarray(p[0], float), np.asarray(p[1], float)
		if is_equi(r) and len(r) == ns:
			prof_b[i] = b
			prof_dr[i] = r[1]
		else:
			re = np.linspace(0, r[-1], ns)
			prof_b[i] = np.interp(re, r, b)
			prof_dr[i] = re[1] if ns > 1 else 1.0
	return prof_b, prof_dr

def _per_source_rmax(profs, prof_ids, amax, vmin, rmax):
	"""Largest radius where |amax_i * b(r)| >= vmin for each source
	(reference srcsim_core.c measure_rmax), optionally capped by rmax."""
	nobj = len(prof_ids)
	out = np.zeros(nobj)
	for ip, p in enumerate(profs):
		sel = prof_ids == ip
		if not sel.any(): continue
		r, b = np.asarray(p[0], float), np.abs(np.asarray(p[1], float))
		env = np.maximum.accumulate(b[::-1])[::-1]  # non-increasing tail max
		th = vmin/np.maximum(amax[sel], 1e-30)
		# last index where env >= th: search on the reversed (ascending) env
		idx = len(env) - np.searchsorted(env[::-1], th, side="left")
		idx = np.clip(idx - 1, 0, len(r) - 1)
		out[sel] = r[idx]
	if rmax: out = np.minimum(out, rmax)
	return out


def sim_objects(shape, wcs, poss, amps, profile, prof_ids=None, omap=None,
		vmin=None, rmax=None, op="add", pixwin=False, separable="auto",
		transpose=False, prof_equi=None, return_times=False, dtype=np.float32,
		csize=CSIZE):
	"""Paint radial profiles at poss[{dec,ra},nobj] with amplitudes
	amps[nobj] (or [..., nobj]) onto a map (reference pointsrcs.sim_objects:35
	over srcsim_core.c).

	profile: (r, br) arrays, or a list of them (with prof_ids selecting);
	vmin: profile truncated where |br*amax_i| < vmin (default
	min(|amps|)*1e-3, like the reference); rmax: hard radius cap.

	transpose=True computes the exact adjoint of the op="add" paint:
	amp_out[..., i] = sum_pix map[..., pix] * b_i(pix), reading from omap
	(or a zero map if omap is None -- pass the map to measure!). Unlike the
	reference (which accumulates into the passed amps array in place), the
	adjoint amplitudes are RETURNED, shaped like amps."""
	poss = np.asarray(poss)
	amps = np.asarray(amps, dtype)
	pre = amps.shape[:-1]
	nobj = poss.shape[1] if poss.ndim > 1 else 0
	amps_flat = amps.reshape(-1, nobj) if nobj else amps.reshape(-1, 0)
	ncomp = amps_flat.shape[0]
	if omap is None:
		omap = enmap.zeros(pre + tuple(shape[-2:]), wcs, dtype)
	if nobj == 0:
		return np.zeros(amps.shape, dtype) if transpose else omap
	profs = _norm_profiles(profile)
	if prof_ids is None: prof_ids = np.zeros(nobj, int)
	prof_ids = np.asarray(prof_ids, int)
	# per-source truncation radius from vmin (reference measure_rmax)
	amax = np.max(np.abs(amps_flat), 0) if ncomp else np.ones(nobj)
	if vmin is None:
		vmin = np.min(np.abs(amps_flat[amps_flat != 0]))*1e-3 \
			if np.any(amps_flat != 0) else 1e-3
	rmax_i = _per_source_rmax(profs, prof_ids, amax, vmin, rmax)
	prof_b, prof_dr = _equi_profiles(profs, dtype)
	# pixel radii; RA compression widens the stamp by 1/cos(dec)
	res_rad = np.abs(np.asarray(wcs.wcs.cdelt))*utils.degree
	dec = np.asarray(poss[0], float)
	cosd = np.maximum(np.cos(np.minimum(np.abs(dec) + rmax_i, np.pi/2*0.999)),
		1e-3)
	Ry = np.minimum(np.ceil(rmax_i/res_rad[1]).astype(int) + 1, shape[-2])
	Rx = np.minimum(np.ceil(rmax_i/(res_rad[0]*cosd)).astype(int) + 1,
		shape[-1])
	if separable == "auto": separable = wcsutils.is_separable(wcs)
	if separable:
		decax, raax = enmap.posaxes(shape, wcs)
		pm_dec, pm_ra = jnp.asarray(decax, dtype), jnp.asarray(raax, dtype)
	else:
		pm = np.asarray(enmap.posmap(shape, wcs, safe=False))
		pm_dec, pm_ra = jnp.asarray(pm[0], dtype), jnp.asarray(pm[1], dtype)
	pix = np.round(np.asarray(enmap.sky2pix(shape, wcs, poss))).astype(np.int32)
	wrapx = abs(abs(wcs.wcs.cdelt[0])*shape[-1] - 360.0) < 1e-6
	cell_ids, cell_src = _build_cells(pix, Ry, Rx, shape[-2], shape[-1],
		csize, bool(wrapx))
	data = jnp.asarray(omap.data, dtype).reshape((ncomp,) + tuple(shape[-2:]))
	if transpose and pixwin:
		# adjoint of (apply_window o paint): the window is a real symmetric
		# fourier multiplier, hence self-adjoint
		data = jnp.asarray(enmap.apply_window(
			enmap.ndmap(data, wcs)).data, dtype)
	if len(cell_ids) == 0:
		return np.zeros(amps.shape, dtype) if transpose else omap
	out = _paint_cells(data, jnp.asarray(cell_ids), jnp.asarray(cell_src),
		jnp.asarray(amps_flat), jnp.asarray(prof_b), jnp.asarray(prof_dr),
		jnp.asarray(prof_ids, np.int32), pm_dec, pm_ra,
		jnp.asarray(poss[0], dtype), jnp.asarray(poss[1], dtype),
		int(csize), op, shape[-2], shape[-1], bool(separable),
		bool(transpose))
	if transpose:
		return np.asarray(out).reshape(amps.shape)
	res = enmap.ndmap(out.reshape(omap.shape), wcs)
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


# ---------------------------------------------------------------------------
# Source-cell machinery and catalog IO formats (reference pointsrcs.py)
# ---------------------------------------------------------------------------
def is_equi(r):
	"""Is r an equispaced arange-like grid starting at 0? (reference
	pointsrcs.is_equi)."""
	r = np.asarray(r)
	return len(r) > 1 and r[0] == 0 and np.allclose(r[-1], (len(r)-1)*r[1])

def sim_srcs_python(shape, wcs, srcs, beam, omap=None, dtype=None, nsigma=5,
		rmax=None, smul=1, return_padded=False, pixwin=False, pixwin_order=0,
		op=None, wrap="auto", verbose=False, cache=None, separable="auto"):
	"""Pure-sky-coordinate source painter (reference
	pointsrcs.sim_srcs_python); routes to the vectorized painter."""
	return sim_srcs(shape, wcs, srcs, beam, omap=omap,
		dtype=dtype or np.float32, nsigma=nsigma, smul=smul,
		pixwin=pixwin, verbose=verbose)

def sim_srcs_dist_transform(shape, wcs, srcs, beam, omap=None, dtype=None,
		nsigma=4, rmax=None, smul=1, pixwin=False, ignore_outside=False,
		op=None, verbose=False):
	"""Source painting via a distance transform from the source positions
	(reference pointsrcs.sim_srcs_dist_transform): good for very crowded
	fields where every pixel is near some source."""
	from . import distances, enmap as _e
	srcs = np.asarray(srcs)
	r, b = expand_beam(beam)
	if rmax is None:
		sigma_eff = r[np.argmin(np.abs(b - b[0]*np.exp(-0.5)))]
		rmax = nsigma*max(sigma_eff, r[1])
	points = srcs[:, :2].T
	dists, domains = distances.distance_from_points(tuple(shape[-2:]), wcs,
		points, domains=True, rmax=rmax)
	amp = srcs[:, 2]*smul
	vals = np.interp(np.asarray(dists).reshape(-1), r, b, right=0)
	vals = vals.reshape(np.asarray(dists).shape)
	dom = np.asarray(domains)
	good = dom >= 0
	out = np.where(good, vals*amp[np.clip(dom, 0, len(amp)-1)], 0)
	res = _e.ndmap(jnp.asarray(out.astype(dtype or np.float32)), wcs)
	if omap is not None:
		res = _e.samewcs(jnp.asarray(omap) + jnp.asarray(res), res)
	return res

def eval_srcs_loop(posmap, poss, amps, beam, cres, nhit, cell_srcs,
		dtype=np.float64, op=None, verbose=False):
	"""Cell-based source evaluation loop (reference
	pointsrcs.eval_srcs_loop); simple direct evaluation version."""
	from . import utils as _u
	posmap = np.asarray(posmap)
	r, b = beam
	model = np.zeros(posmap.shape[-2:], dtype)
	for si in range(len(np.atleast_2d(poss))):
		p = np.atleast_2d(poss)[si]
		d = _u.angdist(np.stack([posmap[1], posmap[0]]),
			np.array([p[1], p[0]])[:, None, None], axis=0)
		model += np.atleast_1d(amps)[si]*np.interp(d, r, b, right=0)
	return model

def build_src_cells(cbox, srcpos, cres, unwind=False, wrap=None):
	"""Assign sources to coarse cells (reference pointsrcs.build_src_cells).
	Returns (ncell[cy,cx], cells[cy,cx,nmax]) of source indices."""
	from . import utils as _u
	cbox = np.asarray(cbox)
	srcpos = np.asarray(srcpos)[:, :2]
	cshape = tuple(np.ceil((cbox[1] - cbox[0])/cres).astype(int))
	if unwind:
		ref = np.mean(cbox[:, 1], 0)
		srcpos = srcpos.copy()
		srcpos[:, 1] = _u.rewind(srcpos[:, 1], ref)
	lists = [[[] for _ in range(cshape[1])] for _ in range(cshape[0])]
	inv_dc = np.array(cshape)/(cbox[1] - cbox[0])
	woffs_y = [0] if not wrap or wrap[0] == 0 else [-wrap[0], 0, wrap[0]]
	woffs_x = [0] if not wrap or wrap[1] == 0 else [-wrap[1], 0, wrap[1]]
	cres2 = np.zeros(2) + cres
	for si, pos in enumerate(srcpos):
		for wy in woffs_y:
			for wx in woffs_x:
				wpos = pos + np.array([wy, wx])
				i1 = np.maximum(((wpos - cres2 - cbox[0])*inv_dc).astype(int), 0)
				i2 = np.minimum(((wpos + cres2 - cbox[0])*inv_dc).astype(int) + 1,
					cshape)
				for cy in range(i1[0], i2[0]):
					for cx in range(i1[1], i2[1]):
						lists[cy][cx].append(si)
	nmax = max(1, max(len(c) for row in lists for c in row))
	ncell = np.zeros(cshape, np.int32)
	cells = np.zeros(cshape + (nmax,), np.int32)
	for cy in range(cshape[0]):
		for cx in range(cshape[1]):
			n = len(lists[cy][cx])
			ncell[cy, cx] = n
			cells[cy, cx, :n] = lists[cy][cx]
	return ncell, cells

def build_src_cells_helper(cbox, cshape, cres, srcpos, nmax=0, wrap=None):
	ncell, cells = build_src_cells(cbox, np.asarray(srcpos).reshape(-1, np.asarray(srcpos).shape[-1]), cres, wrap=wrap)
	if nmax == 0: return ncell
	return ncell, cells

def cellify(map, res):
	"""Reshape a map into a cell grid [...,ncy,ncx,ry,rx] (reference
	pointsrcs.cellify)."""
	from . import utils as _u
	res = np.array(res, int)
	arr = np.asarray(map)
	cshape = np.array(arr.shape[-2:])//res
	omap = arr[..., :cshape[0]*res[0], :cshape[1]*res[1]]
	omap = omap.reshape(omap.shape[:-2] + (cshape[0], res[0], cshape[1], res[1]))
	return np.moveaxis(omap, -3, -2)

def uncellify(cmap):
	omap = np.moveaxis(np.asarray(cmap), -2, -3)
	return omap.reshape(omap.shape[:-4] + (omap.shape[-4]*omap.shape[-3],
		omap.shape[-2]*omap.shape[-1]))

def crossmatch(srcs1, srcs2, tol=1*utils.degree/60, safety=4):
	"""Positional cross-match of catalogs [:,{ra,dec},...] (reference
	pointsrcs.crossmatch)."""
	return utils.crossmatch(np.asarray(srcs1)[:, :2],
		np.asarray(srcs2)[:, :2], tol=tol, mode="closest")

def translate_dtype_keys(d, translation):
	"""Rename record-array fields (reference pointsrcs.translate_dtype_keys)."""
	descr = [(name if name not in translation else translation[name], char)
		for name, char in d.dtype.descr]
	return np.asarray(d, descr)

def read_nemo(fname):
	"""Read the nemo ascii catalog format (reference pointsrcs.read_nemo)."""
	idtype = [("name", "2S64"), ("ra", "d"), ("dec", "d"), ("snr", "d"),
		("npix", "i"), ("detfrac", "d"), ("template", "S32"), ("glat", "d"),
		("I", "d"), ("dI", "d")]
	try:
		icat = np.loadtxt(fname, dtype=idtype)
	except (ValueError, IndexError):
		idtype = [("name", "2S64"), ("ra", "d"), ("dec", "d"), ("snr", "d"),
			("npix", "i"), ("template", "S32"), ("glat", "d"),
			("I", "d"), ("dI", "d")]
		try:
			icat = np.loadtxt(fname, dtype=idtype)
		except (ValueError, IndexError) as e:
			raise IOError(str(e))
	icat = np.atleast_1d(icat)
	odtype = [("name", "S64"), ("ra", "d"), ("dec", "d"), ("snr", "d"),
		("I", "d"), ("dI", "d"), ("npix", "i"), ("template", "S32"), ("glat", "d")]
	ocat = np.zeros(len(icat), odtype).view(np.recarray)
	ocat.name = np.char.add(np.char.add(icat["name"][:, 0], b" "), icat["name"][:, 1])
	for f in ["ra", "dec", "snr", "I", "dI", "npix", "template", "glat"]:
		if f in icat.dtype.names: ocat[f] = icat[f]
	ocat.ra *= utils.degree
	ocat.dec *= utils.degree
	return ocat

def read_dory_fits(fname, hdu=1):
	from . import fits_io
	tab = fits_io.read_table(fname, hdu=hdu)
	d = {k.lower(): v for k, v in tab.items()}
	ocat = np.zeros(len(d["ra"]), dtype=[("ra", "d"), ("dec", "d"),
		("I", "d"), ("Q", "d"), ("U", "d")]).view(np.recarray)
	ocat.ra = d["ra"]*utils.degree
	ocat.dec = d["dec"]*utils.degree
	amp = np.asarray(d["amp"])
	ocat.I, ocat.Q, ocat.U = np.atleast_2d(amp.T)*1e3
	return ocat

def read_dory_txt(fname):
	try:
		d = np.loadtxt(fname, usecols=[0, 1, 3, 5, 7],
			dtype=[("ra", "d"), ("dec", "d"), ("I", "d"), ("Q", "d"), ("U", "d")])
		d = np.atleast_1d(d).view(np.recarray)
		for f, s in [("I", 1e3), ("Q", 1e3), ("U", 1e3),
				("ra", utils.degree), ("dec", utils.degree)]:
			d[f] = d[f]*s
		return d
	except (ValueError, IndexError) as e:
		raise IOError(str(e))

def read_fits(fname, hdu=1, fix=True):
	"""Read a FITS binary-table catalog (reference pointsrcs.read_fits)."""
	from . import fits_io
	tab = fits_io.read_table(fname, hdu=hdu)
	rec = np.rec.fromarrays(list(tab.values()), names=",".join(tab.keys()))
	if fix:
		rec = translate_dtype_keys(rec, {"RADeg": "ra", "decDeg": "dec",
			"deltaT_c": "I", "err_deltaT_c": "dI"}).view(np.recarray)
	return rec

def format_sauron(cat):
	"""Format a sauron catalog as text (reference pointsrcs.format_sauron)."""
	cat = cat.view(np.recarray)
	nfield, ncomp = cat.flux.shape[-2:]
	names = "TQU"
	header = "#%8s %8s %9s" % ("ra", "dec", "snr_T")
	for i in range(1, ncomp): header += " %8s" % ("snr_" + names[i])
	for i in range(ncomp): header += " %8s %7s" % ("ftot_" + names[i], "dftot_" + names[i])
	for i in range(nfield):
		for j in range(ncomp):
			header += " %8s %7s" % ("flux_%s%d" % (names[j], i+1), "dflux_%s%d" % (names[j], i+1))
	header += " %2s" % "ca"
	for i in range(nfield): header += " %7s" % ("cont_%d" % (i+1))
	header += "\n"
	res = header
	for i in range(len(cat)):
		line = "%9.4f %8.4f" % (cat.ra[i]/utils.degree, cat.dec[i]/utils.degree)
		snr = np.atleast_1d(cat.snr[i]).reshape(-1)
		line += " %9.2f" % snr[0]
		for s in snr[1:]: line += " %7.2f" % s
		ftot = np.atleast_1d(cat.flux_tot[i]).reshape(-1)
		dftot = np.atleast_1d(cat.dflux_tot[i]).reshape(-1)
		for f, df in zip(ftot, dftot): line += " %8.2f %7.2f" % (f, df)
		fl = np.atleast_2d(cat.flux[i]); dfl = np.atleast_2d(cat.dflux[i])
		for fi in range(nfield):
			for ci in range(ncomp):
				line += " %8.2f %7.2f" % (fl[fi, ci], dfl[fi, ci])
		line += " %2d" % cat.case[i]
		cont = np.atleast_1d(cat.contam[i]) if "contam" in cat.dtype.names else np.zeros(nfield)
		for c in cont.reshape(-1)[:nfield]: line += " %7.4f" % c
		res += line + "\n"
	return res

def write_sauron_txt(ofile, cat):
	with open(ofile, "w") as f:
		f.write(format_sauron(cat))

def read_sauron_txt(ifile, ncomp=3):
	raw = np.loadtxt(ifile, ndmin=2)
	nrow, ncol = raw.shape
	nfreq = (ncol - 2 - ncomp - 1 - 2*ncomp)//(2*ncomp + 1)
	cat_dtype = [("ra", "d"), ("dec", "d"), ("snr", "d", (ncomp,)),
		("flux_tot", "d", (ncomp,)), ("dflux_tot", "d", (ncomp,)),
		("flux", "d", (nfreq, ncomp)), ("dflux", "d", (nfreq, ncomp)),
		("case", "i"), ("contam", "d", (nfreq,))]
	ocat = np.zeros(nrow, cat_dtype).view(np.recarray)
	ocat.ra, ocat.dec, raw = raw[:, 0]*utils.degree, raw[:, 1]*utils.degree, raw[:, 2:]
	ocat.snr, raw = raw[:, :ncomp], raw[:, ncomp:]
	ocat.flux_tot, ocat.dflux_tot, raw = raw[:, 0:2*ncomp:2], raw[:, 1:2*ncomp:2], raw[:, 2*ncomp:]
	nf = 2*ncomp*nfreq
	ocat.flux = raw[:, 0:nf:2].reshape(-1, nfreq, ncomp)
	ocat.dflux = raw[:, 1:nf:2].reshape(-1, nfreq, ncomp)
	raw = raw[:, nf:]
	ocat.case = raw[:, 0].astype(int)
	ocat.contam = raw[:, 1:1+nfreq]
	return ocat

def write_sauron_fits(ofile, cat):
	from . import fits_io
	ocat = np.array(cat).view(np.recarray)
	ocat.ra = ocat.ra/utils.degree
	ocat.dec = ocat.dec/utils.degree
	cols = [np.ascontiguousarray(ocat[n]) for n in ocat.dtype.names]
	fits_io.write_table_fits(ofile, dict(zip(ocat.dtype.names, cols)))

def read_sauron_fits(fname):
	from . import fits_io
	tab = fits_io.read_table(fname, hdu=1)
	names = [k for k in tab if not k.startswith("_")]
	dtypes = [(n, tab[n].dtype.str, tab[n].shape[1:]) if np.ndim(tab[n]) > 1
		else (n, tab[n].dtype.str) for n in names]
	cat = np.zeros(len(tab[names[0]]), dtype=dtypes).view(np.recarray)
	for n in names: cat[n] = tab[n]
	cat.ra = cat.ra*utils.degree
	cat.dec = cat.dec*utils.degree
	return cat

def write_sauron(ofile, cat):
	if ofile.endswith(".fits"): write_sauron_fits(ofile, cat)
	else: write_sauron_txt(ofile, cat)

def read_sauron(ifile):
	if ifile.endswith(".fits"): return read_sauron_fits(ifile)
	return read_sauron_txt(ifile)
