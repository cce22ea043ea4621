"""Reprojection between pixelizations: CAR <-> HEALPix, thumbnails,
rotations (reference pixell/reproject.py)."""
from __future__ import annotations
import numpy as np
import jax.numpy as jnp
from . import enmap, curvedsky, utils, coordinates, wcsutils, healpix, sht, interpol


def map2healpix(imap, nside=0, lmax=None, out=None, rot=None, spin=[0, 2],
		method="harm", order=3, extensive=False, bsize=100000, nside_mode="pow2",
		boundary="constant", verbose=False, niter=0):
	"""Project an ndmap onto a HEALPix map (RING) (reference reproject.map2healpix:118).
	method "harm": roundtrip through alm (optionally rotating coordinates);
	method "spline": direct interpolation at healpix pixel centers."""
	if nside in [0, None]:
		res = min(np.abs(np.asarray(imap.wcs.wcs.cdelt)))*utils.degree
		nside_raw = int(np.ceil((np.pi/3)**0.5/res))
		nside = 1 << int(np.ceil(np.log2(max(nside_raw, 1)))) if nside_mode == "pow2" else nside_raw
		nside = restrict_nside(nside, imap.shape, imap.wcs)
	theta, phi = healpix.positions(nside)
	if method == "harm":
		if lmax is None: lmax = min(3*nside - 1, curvedsky.get_lmax_from_map(imap))
		alm = curvedsky.map2alm(imap, lmax=lmax, spin=spin, niter=niter)
		if rot is not None:
			alm = _rotate_alm_sys(alm, rot, spin=spin)
		vals = _alm2map_healpix_ring(jnp.asarray(alm), int(nside), lmax=lmax,
			mmax=lmax, spin=spin)
		res = np.asarray(vals)
	else:
		dec = np.pi/2 - theta
		pos = np.stack([dec, phi])
		if rot is not None:
			isys, osys = _parse_rot(rot)
			pos = np.asarray(coordinates.transform(osys, isys, pos[::-1])[::-1])
		res = np.asarray(imap.at(pos, order=order, border=boundary))
	if extensive:
		res = res*(healpix.pixsize(nside)/enmap.pixsize(imap.shape, imap.wcs))
	return res

def healpix2map(ihealmap, shape=None, wcs=None, lmax=None, out=None, rot=None,
		spin=[0, 2], method="harm", order=3, extensive=False, bsize=100000,
		verbose=False, niter=0):
	"""Project a HEALPix map onto an ndmap geometry
	(reference reproject.healpix2map:249)."""
	ihealmap = np.asarray(ihealmap)
	flat = ihealmap.reshape(-1, ihealmap.shape[-1])
	nside = healpix.npix2nside(flat.shape[-1])
	if method == "harm":
		if lmax is None: lmax = 3*nside - 1
		alm = map2alm_healpix(ihealmap, lmax=lmax, spin=spin, niter=niter)
		if rot is not None:
			alm = _rotate_alm_sys(alm, rot, spin=spin)
		omap = enmap.zeros(ihealmap.shape[:-1] + tuple(shape[-2:]), wcs)
		res = curvedsky.alm2map(jnp.asarray(alm), omap, spin=spin)
	else:
		pos = np.asarray(enmap.posmap(shape, wcs, safe=False))
		dec, ra = pos[0].reshape(-1), pos[1].reshape(-1)
		if rot is not None:
			isys, osys = _parse_rot(rot)
			tra, tdec = np.asarray(coordinates.transform(osys, isys,
				np.stack([ra, dec])))
			ra, dec = tra, tdec
		theta = np.pi/2 - dec
		pix, w = healpix.get_interpol(nside, theta, ra % (2*np.pi))
		vals = np.einsum("kp,...kp->...p", w, flat[:, pix])
		res = enmap.ndmap(vals.reshape(ihealmap.shape[:-1] + tuple(shape[-2:])), wcs)
	if extensive:
		res = res*(enmap.pixsize(shape, wcs)/healpix.pixsize(nside))
	return res

def alm2map_healpix(alm, healmap=None, nside=None, spin=[0, 2], deriv=False,
		ainfo=None, method="ring"):
	"""Synthesize alm onto a HEALPix RING map (reference curvedsky.alm2map_healpix:312).

	method "ring" (default) exploits the HEALPix ring structure: one SHT
	synthesis at the exact ring colatitudes onto a regular N-column grid,
	belt rings then sampled EXACTLY by a spectral phase ramp + strided
	slice (no interpolation error, no gathers), polar-cap rings by 1D
	ES-kernel interpolation along phi. This does ~w times fewer gathered
	elements than treating the pixels as unstructured points -- TPU gathers
	run ~1e8 elem/s, which made the 2D NUFFT path (method "general",
	the direct counterpart of ducc synthesis_general) gather-bound."""
	alm = jnp.asarray(alm)
	if ainfo is None: ainfo = curvedsky.alm_info(nalm=alm.shape[-1])
	if nside is None:
		nside = healpix.npix2nside(healmap.shape[-1])
	import jax
	if method == "ring":
		vals = _alm2map_healpix_ring(alm, int(nside), lmax=ainfo.lmax,
			mmax=ainfo.mmax, spin=spin, deriv=deriv)
	else:
		theta, phi = healpix.positions(nside)
		loc = np.stack([theta, phi], -1)
		vals = curvedsky.synthesis_general(alm, jnp.asarray(loc), lmax=ainfo.lmax,
			spin=spin, deriv=deriv)
	if isinstance(vals, jax.core.Tracer): return vals  # stay traceable under jit
	return np.asarray(vals)


# --- ring-structured healpix synthesis ------------------------------------
_HPIX_RING_CACHE = {}

def _hpix_ring_geom(nside, mmax, w, rdt):
	"""Host/device constants for ring-based healpix synthesis, cached per
	(nside, mmax, w, dtype). Returns a Bunch of static ints plus device
	arrays (belt spectral offsets; cap pixel row/base/frac; corrections)."""
	from .bunch import Bunch
	key = (int(nside), int(mmax), int(w), np.dtype(rdt).str)
	got = _HPIX_RING_CACHE.get(key)
	if got is not None: return got
	from . import fft as enfft
	n = int(nside)
	info = healpix.ring_info(n)
	nring = 4*n - 1
	# N: multiple of 4n (so the belt stride k = N/(4n) is an integer) and
	# >= 2*(mmax+1) (oversampling sigma >= 2 for the cap ES interpolation)
	k = max(int(np.ceil((mmax + 1)/(2.0*n))), 1)
	N = 4*n*k
	belt = info["nphi"] == 4*n
	crow = np.nonzero(~belt)[0]          # cap ring indices (N caps then S)
	brow0 = int(np.nonzero(belt)[0][0])  # belt rows are contiguous
	nbelt = int(belt.sum())
	# belt: spectral offset of the first pixel in fine-grid units
	o_belt = info["phi0"][belt]*N/(2*np.pi)
	# cap pixels, in healpix pixel order within each cap
	rowmap = np.full(nring, -1); rowmap[crow] = np.arange(len(crow))
	rows = []; xs = []
	for r in crow:
		nph = int(info["nphi"][r])
		x = (info["phi0"][r] + 2*np.pi*np.arange(nph)/nph)*N/(2*np.pi)
		xs.append(x); rows.append(np.full(nph, rowmap[r], np.int32))
	x = np.concatenate(xs)
	ixb = np.floor(x)
	npt_n = int(info["nphi"][crow[crow < brow0]].sum())
	geom = Bunch(N=N, k=k, nring=nring, nbelt=nbelt, brow0=brow0,
		ncaprow=len(crow), npt_north=npt_n,
		theta=info["theta"], npix=int(info["nphi"].sum()),
		o_belt=jnp.asarray(o_belt.astype(rdt)),
		caprow=jnp.asarray(np.concatenate(rows)),
		capix=jnp.asarray(ixb.astype(np.int32)),
		capfx=jnp.asarray((x - ixb).astype(rdt)))
	_HPIX_RING_CACHE[key] = geom
	return geom

def _hpix_cap_gather(capg, caprow, ix0, wx, w):
	"""Window-gather rows of capg [R, Npad, C] at (caprow, ix0) and contract
	with the 1D kernel weights wx [npt, w] -> [npt, C]. Chunked via lax.map
	to bound the [chunk, w, C] transient."""
	import jax
	CH = 1 << 19
	C = capg.shape[-1]
	dn = jax.lax.GatherDimensionNumbers(offset_dims=(1, 2),
		collapsed_slice_dims=(0,), start_index_map=(0, 1))
	def block(st, bw):
		vals = jax.lax.gather(capg, st, dn, slice_sizes=(1, w, C), mode="clip")
		return jnp.einsum("pwc,pw->pc", vals, bw)
	starts = jnp.stack([caprow, ix0], -1)
	npt = ix0.shape[0]
	if npt <= CH:
		return block(starts, wx)
	nb = -(-npt//CH)
	pad = nb*CH - npt
	st = jnp.pad(starts, ((0, pad), (0, 0))).reshape(nb, CH, 2)
	bw = jnp.pad(wx, ((0, pad), (0, 0))).reshape(nb, CH, w)
	out = jax.lax.map(lambda a: block(*a), (st, bw))
	return out.reshape(nb*CH, C)[:npt]

def _alm2map_healpix_ring(alm, nside, lmax, mmax, spin, deriv=False,
		epsilon=None):
	"""Ring-structured healpix synthesis core (see alm2map_healpix)."""
	import jax
	import functools
	from . import fft as enfft
	alm = utils.to_device(alm)
	rdt = np.float32 if alm.dtype == np.complex64 else np.float64
	if epsilon is None: epsilon = 1e-6 if rdt == np.float32 else 1e-10
	w, beta = enfft._es_params(epsilon)
	geom = _hpix_ring_geom(nside, mmax, w, rdt)
	alm2 = alm if (deriv or alm.ndim > 1) else alm[None]
	def make():
		N, k, nbelt, brow0 = geom.N, geom.k, geom.nbelt, geom.brow0
		corr = jnp.asarray(enfft._es_correction(N, w, beta, rdt)[:N//2+1])
		theta = geom.theta
		def core(a, o_belt, caprow, capix, capfx):
			grid = sht.synthesis(a, theta, N, phi0=0.0, lmax=lmax, mmax=mmax,
				spin=spin if not deriv else (0,), deriv=deriv, map_dtype=rdt)
			pre = grid.shape[:-2]
			spec = jnp.fft.rfft(grid, axis=-1)
			# belt: exact sampling via a per-ring spectral phase shift, then
			# a strided slice (belt stride k is an integer by construction)
			m = jnp.arange(N//2 + 1, dtype=rdt)
			ramp = jnp.exp(1j*(2*np.pi/N)*m[None, :]*o_belt[:, None].astype(rdt))
			beltg = jnp.fft.irfft(spec[..., brow0:brow0+nbelt, :]*ramp, n=N,
				axis=-1)[..., ::k]
			beltv = beltg.reshape(pre + (-1,))
			# caps: deconvolved fine rows + 1D ES interpolation
			capspec = jnp.concatenate([spec[..., :brow0, :],
				spec[..., brow0+nbelt:, :]], -2)
			capg = jnp.fft.irfft(capspec*corr, n=N, axis=-1)
			capg = jnp.concatenate([capg, capg[..., :w]], -1)  # phi wrap pad
			capg = jnp.moveaxis(capg.reshape((-1,) + capg.shape[-2:]), 0, -1)
			hw = w/2.0
			t = jnp.floor(capfx - hw)
			ix0 = (capix + t.astype(jnp.int32) + 1) % N
			offs = jnp.arange(w, dtype=rdt)
			wx = enfft._es_kernel((capfx[:, None] - (t[:, None] + 1 + offs))/hw,
				beta).astype(rdt)
			capv = _hpix_cap_gather(capg, caprow, ix0, wx, w)   # [npt, BC]
			capv = jnp.moveaxis(capv, -1, 0).reshape(pre + (-1,))
			nn = geom.npt_north
			return jnp.concatenate([capv[..., :nn], beltv,
				capv[..., nn:]], -1)
		return functools.partial(core)
	key = ("reproject._alm2map_healpix_ring", nside, lmax, mmax,
		tuple(np.atleast_1d(spin)), bool(deriv), w, round(float(beta), 6),
		np.dtype(rdt).str, alm2.shape, str(alm2.dtype))
	fn = utils.cached_jit(key, make)
	out = fn(alm2, geom.o_belt, geom.caprow, geom.capix, geom.capfx)
	if alm.ndim == 1 and not deriv: out = out[..., 0, :]
	return out

def _healpix_ring_adjoint(vals, nside, lmax, mmax, spin):
	"""Exact transpose of the ring-structured healpix synthesis (the
	healpix counterpart of curvedsky.adjoint_synthesis_general)."""
	import jax
	vals = jnp.asarray(vals)
	n = sht.nalm(lmax, mmax)
	pre = vals.shape[:-1]
	rdt = vals.dtype
	def fwd(ar, ai):
		alm_c = jax.lax.complex(ar, ai)
		return _alm2map_healpix_ring(alm_c, nside, lmax=lmax, mmax=mmax,
			spin=spin)
	zr = jnp.zeros(pre + (n,), rdt)
	_, vjp_fn = jax.vjp(fwd, zr, zr)
	gr, gi = vjp_fn(vals)
	return jax.lax.complex(gr, gi)

def map2alm_healpix(healmap, alm=None, lmax=None, spin=[0, 2], niter=0,
		ainfo=None, method="ring"):
	"""Analyse a HEALPix RING map into alm, using uniform pixel-area weights
	plus optional Jacobi iterations (reference curvedsky.map2alm_healpix:353).
	method as in alm2map_healpix; the analysis is the exact transpose of the
	matching synthesis, so the Jacobi iterations converge consistently."""
	healmap = np.asarray(healmap)
	nside = healpix.npix2nside(healmap.shape[-1])
	if lmax is None: lmax = 3*nside - 1
	if ainfo is None: ainfo = curvedsky.alm_info(lmax=lmax)
	w = healpix.pixsize(nside)
	if method == "ring":
		def analyse(m):
			a = _healpix_ring_adjoint(utils.to_device(np.asarray(m)*w), nside,
				lmax=ainfo.lmax, mmax=ainfo.mmax,
				spin=tuple(np.atleast_1d(spin)))
			return np.asarray(sht._undo_m_degeneracy(a, ainfo.lmax, ainfo.mmax))
	else:
		theta, phi = healpix.positions(nside)
		def analyse(m):
			# adjoint NUFFT spread + ring analysis on the torus grid
			return _general_analysis_points(m*w, theta, phi, ainfo, spin)
	alm = analyse(healmap)
	for it in range(niter):
		resid = healmap - alm2map_healpix(jnp.asarray(alm), nside=nside,
			spin=spin, ainfo=ainfo, method=method)
		alm = alm + analyse(resid)
	return alm

def _general_analysis_points(vals, theta, phi, ainfo, spin):
	"""Adjoint-synthesis-with-weights at arbitrary points, via the exact
	transpose of the torus-NUFFT synthesis (curvedsky.adjoint_synthesis_general)."""
	loc = np.stack([np.asarray(theta), np.asarray(phi)], -1)
	a = curvedsky.adjoint_synthesis_general(jnp.asarray(vals), jnp.asarray(loc),
		lmax=ainfo.lmax, mmax=ainfo.mmax, spin=tuple(np.atleast_1d(spin)))
	a = sht._undo_m_degeneracy(a, ainfo.lmax, ainfo.mmax)
	return np.asarray(a)

def _parse_rot(rot):
	if rot is None: return None, None
	toks = rot.split(",")
	return toks[0], toks[1]

def _rotate_alm_sys(alm, rot, spin=[0, 2]):
	"""Rotate alm between coordinate systems given as 'isys,osys'."""
	isys, osys = _parse_rot(rot)
	R = coordinates._get_mat(coordinates.getsys(isys), coordinates.getsys(osys))
	# convert rotation matrix to zyz euler angles
	beta = np.arccos(np.clip(R[2, 2], -1, 1))
	if abs(np.sin(beta)) > 1e-12:
		alpha = np.arctan2(R[2, 1], R[2, 0]) if False else np.arctan2(R[1, 2], R[0, 2])
		gamma = np.arctan2(R[2, 1], -R[2, 0])
	else:
		alpha = np.arctan2(R[1, 0], R[0, 0]); gamma = 0.0
	# field rotation by R: g(n) = f(R^-1 n) with R = Rz(alpha)Ry(beta)Rz(gamma)
	return np.asarray(curvedsky.rotate_alm(jnp.asarray(alm), gamma, beta, alpha))

def rot2euler(rot):
	return _parse_rot(rot)

def restrict_nside(nside, shape, wcs, bound=4):
	"""Cap nside so healpix pixels aren't absurdly smaller than map pixels
	(reference reproject.restrict_nside:388)."""
	res = min(np.abs(np.asarray(wcs.wcs.cdelt)))*utils.degree
	max_nside = int((np.pi/3)**0.5/res*bound)
	p = 1
	while p*2 <= max_nside: p *= 2
	return min(nside, p)


# ---------------------------------------------------------------------------
# Thumbnails (reference reproject.thumbnails:10)
# ---------------------------------------------------------------------------
def thumbnails(imap, coords, r=5*utils.arcmin, res=None, proj="tan", apod=2*utils.arcmin,
		order=3, oversample=4, pol=None, oshape=None, owcs=None, extensive=False,
		verbose=False, filter=None, pixwin=False, pixwin_order=0):
	"""Extract re-centered postage stamps around coords[n,{dec,ra}]
	(reference reproject.thumbnails:10). Each output stamp is a tangent-plane
	map centered on its object, built by (spline) interpolation of the input
	map at the rotated positions, with polarization rotation for spin-2."""
	coords = np.asarray(coords)
	if coords.ndim == 1: coords = coords[None]
	if res is None: res = min(np.abs(np.asarray(imap.wcs.wcs.cdelt)))*utils.degree/2
	if oshape is None:
		oshape, owcs = enmap.thumbnail_geometry(r=r, res=res, proj=proj)
	opos = np.asarray(enmap.posmap(oshape, owcs, safe=False))
	pol = (imap.ndim >= 3 and imap.shape[-3] == 3) if pol is None else pol
	# per-object recentering transforms run host-side (cheap trig), but ALL
	# objects interpolate in ONE call: a single spline prefilter of the input
	# map and one batched gather instead of nobj passes
	nobj = len(coords)
	npix = int(np.prod(oshape[-2:]))
	pos_all = np.empty((2, nobj, npix))
	ang_all = np.empty((nobj, npix)) if pol else None
	for ci in range(nobj):
		dec0, ra0 = coords[ci, 0], coords[ci, 1]
		# rotate thumbnail positions to be centered on the object: a cel
		# system recentered so (0,0) maps to (ra0, dec0)
		# (reference reproject.thumbnails:84 transform spec)
		ipos = coordinates.transform("cel",
			["cel", [np.array([0, 0, ra0, dec0]), False]],
			np.array([opos[1].reshape(-1), opos[0].reshape(-1)]), pol=pol)
		pos_all[0, ci] = ipos[1]
		pos_all[1, ci] = ipos[0]
		if pol: ang_all[ci] = ipos[2]
	vals = imap.at(pos_all.reshape(2, -1), order=order)
	vals = jnp.asarray(vals).reshape(imap.shape[:-2] + (nobj,) + tuple(oshape[-2:]))
	vals = jnp.moveaxis(vals, -3, 0)               # [nobj, ..., ny, nx]
	if pol:
		ang = jnp.asarray(ang_all).reshape(nobj, *oshape[-2:])
		vals = enmap.rotate_pol(vals, -ang)    # angle broadcasts over comps
	res = enmap.ndmap(np.asarray(vals), owcs)
	if extensive:
		res = res*(enmap.pixsize(oshape, owcs)/enmap.pixsize(imap.shape, imap.wcs))
	return res

def thumbnails_healpix(imap, coords, **kw):
	raise NotImplementedError

def postage_stamp(inmap, ra_deg, dec_deg, width_arcmin, res_arcmin, proj="gnomonic", **kwargs):
	"""Legacy API (reference reproject.postage_stamp:533)."""
	r = width_arcmin/2*utils.arcmin
	return thumbnails(inmap, np.array([[dec_deg*utils.degree, ra_deg*utils.degree]]),
		r=r, res=res_arcmin*utils.arcmin, proj="tan", **kwargs)[0]

def centered_map(imap, res, box=None, pixbox=None, proj="tan", rpix=None, width=None,
		height=None, width_multiplier=1, **kwargs):
	"""Legacy recentered-map API (reference reproject.centered_map:424)."""
	raise NotImplementedError("use thumbnails")

def rotate_map(imap, shape=None, wcs=None, pix_target=None, **kwargs):
	if shape is None: shape, wcs = imap.shape, imap.wcs
	return imap.project(shape, wcs, **kwargs)


def thumbnails_ivar(imap, coords, r=5*utils.arcmin, res=None, proj=None,
		oshape=None, owcs=None, order=1, extensive=True, verbose=False):
	"""Thumbnails for positive, local quantities like hitcounts/ivars
	(reference reproject.thumbnails_ivar)."""
	return thumbnails(imap, coords, r=r, res=res, proj=proj or "tan", oshape=oshape,
		owcs=owcs, order=order, oversample=1, pol=False,
		extensive=extensive, verbose=verbose, pixwin=False)

def inv_euler(euler):
	"""(reference reproject.inv_euler)."""
	return [-euler[2], -euler[1], -euler[0]]

def distribute(N, nmax):
	"""Split N into cells no larger than nmax, as evenly as possible
	(reference reproject.distribute)."""
	actual_max = int(2.0*(nmax + 1)/3.0)
	numcells = max(int(round(N*1.0/actual_max)), 1)
	each_cell = [actual_max]*(numcells - 1)
	rem = N - sum(each_cell)
	if rem > 0: each_cell.append(rem)
	assert sum(each_cell) == N
	return each_cell

def populate(shape, wcs, ofunc, maxpixy=400, maxpixx=400):
	"""Fill a map tile by tile with ofunc(oshape, owcs) (reference
	reproject.populate)."""
	out = np.zeros(shape)
	Ny, Nx = shape[-2:]
	tNys = distribute(Ny, maxpixy)
	tNxs = distribute(Nx, maxpixx)
	sny = 0
	for ny in tNys:
		eny = sny + ny
		snx = 0
		for nx in tNxs:
			enx = snx + nx
			sel = np.s_[..., sny:eny, snx:enx]
			oshape, owcs = enmap.slice_geometry(shape, wcs,
				(slice(sny, eny), slice(snx, enx)))
			out[sel] = np.asarray(ofunc(oshape, owcs))
			snx = enx
		sny = eny
	return enmap.ndmap(jnp.asarray(out), wcs)

# Removed in the reference too; kept as the same redirects
# (reference reproject.py:500-560)
def healpix_from_enmap(imap, lmax, nside):
	raise RuntimeError("This function has been removed. Use reproject.map2healpix(...method='harm').")

def healpix_from_enmap_interp(imap, **kwargs):
	raise RuntimeError("This function has been removed. Use reproject.map2healpix(...method='spline').")

def enmap_from_healpix(hp_map, shape, wcs, ncomp=1, unit=1, lmax=0,
		rot="gal,equ", first=0, is_alm=False, return_alm=False, f_ell=None):
	raise RuntimeError("This function has been removed. Use reproject.healpix2map(...method='harm').")

def enmap_from_healpix_interp(hp_map, shape, wcs, rot="gal,equ", interpolate=False):
	raise RuntimeError("This function has been removed. Use reproject.healpix2map(...method='spline').")

def ivar_hp_to_cyl(hmap, shape, wcs, rot=False, do_mask=True, extensive=True):
	raise NotImplementedError("This function has been removed.")

def gnomonic_pole_wcs(shape, res):
	raise NotImplementedError("This function has been removed.")

def gnomonic_pole_geometry(width, res, height=None):
	raise NotImplementedError("This function has been removed.")

def get_rotated_pixels(shape_source, wcs_source, shape_target, wcs_target,
		inverse=False, pos_target=None, center_target=None, center_source=None):
	raise NotImplementedError("This function has been removed.")

def cutout(imap, width=None, ra=None, dec=None, pad=1, corner=False, res=None,
		npix=None, return_slice=False, sindex=None):
	raise NotImplementedError("This function has been removed.")

def rect_box(width, center=(0.0, 0.0), height=None):
	raise NotImplementedError("This function has been removed.")

def get_pixsize_rect(shape, wcs):
	raise NotImplementedError("This function has been removed.")

def rect_geometry(width, res, height=None, center=(0.0, 0.0), proj="car"):
	raise NotImplementedError("This function has been removed.")
