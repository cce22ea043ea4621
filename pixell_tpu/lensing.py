"""Gravitational lensing of CMB maps (reference pixell/lensing.py).

Flat-sky lensing displaces pixels by the gradient of the lensing potential
(spline interpolation); curved-sky lensing computes the deflection field
with a spin-1 derivative SHT, offsets positions geodesically, and evaluates
the unlensed alm at the displaced positions with the NUFFT-based general
synthesis (reference lens_map_curved:367, which band-loops over dec;
here the whole sky is evaluated in one fused jax computation)."""
from __future__ import annotations
import functools
import numpy as np
import jax
import jax.numpy as jnp
from . import enmap, curvedsky, interpol, utils, wcsutils
from . import fft as enfft
from .bunch import Bunch


# ---------------------------------------------------------------------------
# Flat-sky lensing (reference lensing.py:9-134)
# ---------------------------------------------------------------------------
def displace_map(imap, pix, order=3, trans=False, deriv=False, border="cyclic"):
	"""Evaluate imap at the pixel positions pix[2,ny,nx] (reference
	lensing.displace_map:56)."""
	arr = jnp.asarray(imap)
	pts = jnp.asarray(pix).reshape(2, -1)
	res = interpol.map_coordinates(arr, pts, order=order, border=border,
		trans=trans, deriv=deriv)
	if not trans:
		res = res.reshape(arr.shape[:-2] + imap.shape[-2:])
	return enmap.samewcs(res, imap)

def lens_map(imap, grad_phi, order=3, trans=False, deriv=False, border="cyclic"):
	"""Lens the map by the deflection field grad_phi[2,ny,nx] (radians)
	(reference lensing.lens_map:9)."""
	pshape = enmap.pixshapemap(imap.shape, imap.wcs, signed=True)
	pix = np.asarray(imap.pixmap()) + np.asarray(grad_phi)/np.asarray(pshape)
	return displace_map(imap, jnp.asarray(pix), order=order, trans=trans,
		deriv=deriv, border=border)

def delens_map(imap, grad_phi, nstep=3, order=3, border="cyclic"):
	"""Invert the lensing operation by fixed-point iteration of the
	displacement field (reference lensing.delens_map:38)."""
	grad = np.asarray(grad_phi)
	# we want grad0 such that grad0(x) = grad(x + grad0(x))
	grad0 = grad.copy()
	for i in range(nstep):
		pshape = np.asarray(enmap.pixshapemap(imap.shape, imap.wcs, signed=True))
		pix = np.asarray(enmap.pixmap(imap.shape)) + grad0/pshape
		grad0 = np.asarray(interpol.map_coordinates(jnp.asarray(grad),
			jnp.asarray(pix.reshape(2, -1)), order=order, border=border)).reshape(grad.shape)
	return lens_map(imap, -grad0, order=order, border=border)

def grad_phi_flat(phi_map):
	"""Gradient of a flat-sky potential via FFT (reference lens_map_flat:70)."""
	f = enmap.fft(phi_map)
	l = np.asarray(enmap.lmap(phi_map.shape, phi_map.wcs))
	gy = enmap.ifft(enmap.samewcs(jnp.asarray(f)*1j*jnp.asarray(l[0]), phi_map)).real
	gx = enmap.ifft(enmap.samewcs(jnp.asarray(f)*1j*jnp.asarray(l[1]), phi_map)).real
	return enmap.ndmap(jnp.stack([jnp.asarray(gy), jnp.asarray(gx)]), phi_map.wcs)

def lens_map_flat(cmb_map, phi_map, order=3):
	"""Lens a flat-sky map by the potential phi (reference lensing.lens_map_flat:70)."""
	grad = grad_phi_flat(phi_map)
	return lens_map(cmb_map, grad, order=order)

def phi_to_kappa(phi_alm, phi_ainfo=None):
	"""kappa_lm = l(l+1)/2 phi_lm (reference lensing.phi_to_kappa:81)."""
	alm = jnp.asarray(phi_alm)
	if phi_ainfo is None: phi_ainfo = curvedsky.alm_info(nalm=alm.shape[-1])
	l = np.arange(phi_ainfo.lmax+1, dtype=float)
	return curvedsky.almxfl(alm, l*(l+1)/2, ainfo=phi_ainfo)

def kappa_to_phi(kappa_alm, ainfo=None):
	alm = jnp.asarray(kappa_alm)
	if ainfo is None: ainfo = curvedsky.alm_info(nalm=alm.shape[-1])
	l = np.arange(ainfo.lmax+1, dtype=float)
	with np.errstate(divide="ignore"):
		fl = np.where(l > 0, 2/(l*(l+1)), 0)
	return curvedsky.almxfl(alm, fl, ainfo=ainfo)


# ---------------------------------------------------------------------------
# Curved-sky lensing (reference lensing.py:367-509)
# ---------------------------------------------------------------------------
def offset_by_grad(ipos, grad, pol=None, geodesic=True):
	"""Displace positions ipos[{dec,ra},...] along the gradient field
	grad[{ddec,dra},...] by its magnitude, geodesically on the sphere
	(reference lensing.offset_by_grad:552). Returns [{dec,ra},...] or
	[{dec,ra,cos2g,sin2g},...] if pol, where g is the polarization rotation
	induced by parallel transport."""
	xp = utils._xp(ipos, grad)
	ipos = xp.asarray(ipos); grad = xp.asarray(grad)
	dec, ra = ipos[0], ipos[1]
	cosdec = xp.cos(dec)
	# physical displacement components: (north, east) = (ddec, dra*cosdec...)
	# grad is (d/ddec, d/dra); the physical east component is d/dra / cosdec
	dn = grad[0]
	de = grad[1]/xp.maximum(xp.abs(cosdec), 1e-15)*xp.sign(cosdec + 1e-300)
	alpha = xp.sqrt(dn*dn + de*de)
	small = alpha < 1e-15
	alpha_s = xp.where(small, 1e-15, alpha)
	# bearing from north (clockwise towards east)
	cb = dn/alpha_s
	sb = de/alpha_s
	if geodesic:
		sdec, cdec = xp.sin(dec), xp.cos(dec)
		sa, ca = xp.sin(alpha_s), xp.cos(alpha_s)
		sdec2 = sdec*ca + cdec*sa*cb
		dec2 = xp.arcsin(xp.clip(sdec2, -1, 1))
		dra = xp.arctan2(sb*sa*1.0, ca*cdec - sa*sdec*cb)
		ra2 = ra + dra
	else:
		dec2 = dec + dn
		ra2 = ra + grad[1]/xp.maximum(cosdec, 1e-15)
	dec2 = xp.where(small, dec, dec2)
	ra2 = xp.where(small, ra, ra2)
	if not pol:
		return xp.stack([dec2, ra2])
	# polarization rotation: difference between departure bearing and
	# arrival bearing along the geodesic (spherical triangle with the pole)
	# arrival bearing (from north at p2, towards p1 reversed):
	sdec1, cdec1 = xp.sin(dec), xp.cos(dec)
	sdec2_, cdec2 = xp.sin(dec2), xp.cos(dec2)
	dra2 = ra2 - ra
	# bearing at the destination back towards the start, and the departure
	# bearing; their mismatch (mod the U-turn pi) is the parallel-transport
	# rotation of the local north axis
	b_back = xp.arctan2(-xp.sin(dra2)*cdec1,
		cdec2*sdec1 - sdec2_*cdec1*xp.cos(dra2))
	b_fwd = xp.arctan2(de, dn)
	gamma = (np.pi + b_back) - b_fwd
	gamma = xp.where(small, 0.0, gamma)
	return xp.stack([dec2, ra2, xp.cos(2*gamma), xp.sin(2*gamma)])

@functools.partial(jax.jit, static_argnames=("nfine", "w", "beta", "pre",
	"polrot", "pol", "geodesic", "mesh"))
def _lens_band_core(fine, grad, pos, iyb, fy, ixb, fx, nfine, w, beta, pre,
		polrot, pol, geodesic, mesh=None):
	"""One dec band of curved lensing, fused into a single program shared by
	all bands: geodesic offset + split-position NUFFT eval + polarization
	parallel-transport rotation. Positions enter pre-split (int fine-pixel
	base iyb/ixb + f32 fraction fy/fx, computed host-side in f64) so the
	kernel offsets keep full resolution on large fine grids; the band's
	displacement is folded into the fraction on device.
	Separable (cylindrical) geometries pass 1D per-row arrays (pos=(dec[ny],
	ra[nx]), iyb/fy [ny], ixb/fx [nx]) which broadcast ON DEVICE -- the
	host then ships O(ny+nx) scalars per band instead of six [ny,nx]
	arrays through the (slow) host->device link. 2D arrays still work for
	non-separable geometries.
	mesh (static): shard the band's per-point work over its rows on the
	mesh's first axis (the fine grid stays replicated); constraints sit
	inside the jit so GSPMD's padding-tolerant partitioner handles bands
	whose row count does not divide the mesh."""
	if iyb.ndim == 1:
		bshape = (iyb.shape[0], ixb.shape[0])
		pos = jnp.stack([jnp.broadcast_to(pos[0][:, None], bshape),
			jnp.broadcast_to(pos[1][None, :], bshape)])
		iyb = jnp.broadcast_to(iyb[:, None], bshape)
		fy  = jnp.broadcast_to(fy[:, None], bshape)
		ixb = jnp.broadcast_to(ixb[None, :], bshape)
		fx  = jnp.broadcast_to(fx[None, :], bshape)
	if mesh is not None:
		from jax.sharding import NamedSharding, PartitionSpec as _P
		_raxis = tuple(mesh.shape.keys())[0]
		def _rows(x):
			return jax.lax.with_sharding_constraint(x, NamedSharding(
				mesh, _P(*([None]*(x.ndim-2) + [_raxis, None]))))
		grad, pos, iyb, fy, ixb, fx = map(_rows, (grad, pos, iyb, fy, ixb, fx))
	opos = offset_by_grad(pos, grad, pol=pol, geodesic=geodesic)
	nfy, nfx = nfine
	# displacement in fine pixels; colat = pi/2 - dec so dcolat = -ddec
	dpy = (pos[0] - opos[0])*(nfy/(2*np.pi))
	dpx = (opos[1] - pos[1])*(nfx/(2*np.pi))
	vals = enfft._u2nu_2d_core_split(fine,
		iyb.reshape(-1), (fy + dpy).reshape(-1),
		ixb.reshape(-1), (fx + dpx).reshape(-1), nfine, w, beta)
	band = vals.reshape(pre + pos.shape[-2:])
	if polrot:
		c2, s2 = opos[2], opos[3]
		q = band[..., 1, :, :]; u = band[..., 2, :, :]
		band = band.at[..., 1, :, :].set(c2*q - s2*u)
		band = band.at[..., 2, :, :].set(s2*q + c2*u)
	return band

@functools.partial(jax.jit, static_argnames=("nfine", "w", "beta", "pre",
	"polrot", "pol", "geodesic", "S", "ndx", "dxlo", "R"))
def _lens_band_rowband(fine_x, E, grad, pos, iyb, fy, fx, sy0, nfine, w,
		beta, pre, polrot, pol, geodesic, S, ndx, dxlo, R):
	"""Row-structured variant of _lens_band_core for separable geometries:
	the NUFFT point eval goes through fft._u2nu_rowband_core (slab DMA +
	expansion matmul + dense ES-weight contractions) instead of the
	per-point block gather -- the gather moved ~1e8 elements/s on TPU and
	was the 2.4 s hot spot of each config-4 band. Positions are 1D axes
	(pos=(dec[ny], ra[nx]), iyb/fy [ny], fx [nx]); the column bases ixb are
	folded into the static expansion matrix E by the caller."""
	bshape = (iyb.shape[0], fx.shape[0])
	pos2 = jnp.stack([jnp.broadcast_to(pos[0][:, None], bshape),
		jnp.broadcast_to(pos[1][None, :], bshape)])
	opos = offset_by_grad(pos2, grad, pol=pol, geodesic=geodesic)
	nfy, nfx = nfine
	dpy = (pos2[0] - opos[0])*(nfy/(2*np.pi))
	dpx = (opos[1] - pos2[1])*(nfx/(2*np.pi))
	pyf = fy[:, None] + dpy
	pxf = fx[None, :] + dpx
	vals = enfft._u2nu_rowband_core(fine_x, E, iyb, pyf, pxf, sy0,
		S=S, ndx=ndx, dxlo=dxlo, R=R, w=w, beta=beta)
	band = vals.reshape(pre + bshape)
	if polrot:
		c2, s2 = opos[2], opos[3]
		q = band[..., 1, :, :]; u = band[..., 2, :, :]
		band = band.at[..., 1, :, :].set(c2*q - s2*u)
		band = band.at[..., 2, :, :].set(s2*q + c2*u)
	return band

ROWBAND_MAX_NXS = 6144  # max restricted-column width for the rowband point
# eval: the expansion matrix E is [nx_out, nXe] dense f32, so full-sky
# outputs (nXe ~ nfx) must fall back to the gather path

def lens_map_curved(shape=None, wcs=None, phi_alm=None, cmb_alm=None,
		phi_ainfo=None, maplmax=None, dtype=np.float64, oversample=2.0,
		spin=[0, 2], output="l", geodesic=True, verbose=False, delta_theta=None,
		epsilon=None, pol=None, mesh=None, point_eval="auto"):
	"""Lens cmb_alm by the potential phi_alm onto the geometry (shape, wcs)
	(reference lensing.lens_map_curved:367). output: string of maps to
	return: "l"=lensed, "u"=unlensed, "p"=phi map, "k"=convergence, "a"=grad.

	TPU-shaped streaming, restructured vs the reference's band loop
	(reference lensing.py:450-492): the gradient/unlensed/phi/kappa maps are
	each ONE full-geometry SHT (a single compiled program -- banding the
	Legendre work would only add dispatches), the general-synthesis plan
	(global fine torus grid) is built once, and only the per-point work
	(posmap, geodesic offset, NUFFT eval) streams in delta_theta dec bands
	through ONE compiled band program (the tail band overlaps the previous
	one so every band has identical shapes).

	mesh: a jax.sharding.Mesh to run multi-chip: the full-geometry SHTs
	(gradient/phi/kappa/unlensed) dispatch ring-sharded through
	curvedsky.alm2map(mesh=...), and each dec band's per-point work
	(geodesic offset + NUFFT point eval) is sharded over the band's rows
	with the fine torus grid replicated (each chip gathers only its own
	rows' kernel footprints)."""
	ctype = np.complex64 if np.dtype(dtype) == np.float32 else np.complex128
	rdt = np.float32 if np.dtype(dtype) == np.float32 else np.float64
	phi_alm = utils.to_device(np.asarray(phi_alm).astype(ctype) if not
		isinstance(phi_alm, jnp.ndarray) else phi_alm)
	if phi_ainfo is None: phi_ainfo = curvedsky.alm_info(nalm=phi_alm.shape[-1])
	cmb_alm = utils.to_device(np.asarray(cmb_alm).astype(ctype) if not
		isinstance(cmb_alm, jnp.ndarray) else cmb_alm)
	cmb_ainfo = curvedsky.alm_info(nalm=cmb_alm.shape[-1])
	ncomp = cmb_alm.shape[0] if cmb_alm.ndim > 1 else 1
	pol = ncomp > 1 if pol is None else pol
	pre = () if cmb_alm.ndim == 1 else (ncomp,)
	ny, nx = int(shape[-2]), int(shape[-1])
	want = set(output)
	maps = {}
	def synth(a, ainfo, pshape, **kw):
		def make():
			return lambda al: jnp.asarray(curvedsky.alm2map(al,
				enmap.zeros(tuple(pshape) + (ny, nx), wcs, dtype),
				ainfo=ainfo, mesh=mesh, **kw))
		key = ("lensing.synth", tuple(pshape), ny, nx, wcsutils.describe(wcs),
			np.dtype(dtype).str, ainfo.lmax, ainfo.mmax, mesh,
			tuple(sorted((k, str(v)) for k, v in kw.items())),
			a.shape, str(a.dtype))
		return utils.cached_jit(key, make)(a)
	grad = None
	if ("l" in want) or ("a" in want):
		grad = synth(phi_alm, phi_ainfo, (2,), deriv=True)
		if verbose: print("lens: gradient SHT done")
	if "a" in want: maps["a"] = enmap.ndmap(grad, wcs)
	if "p" in want: maps["p"] = enmap.ndmap(synth(phi_alm, phi_ainfo, ()), wcs)
	if "k" in want:
		kappa_alm = utils.cached_jit(("lensing.phi_to_kappa",
			phi_ainfo.lmax, phi_ainfo.mmax, phi_alm.shape,
			str(phi_alm.dtype)),
			lambda: lambda a: phi_to_kappa(a, phi_ainfo=phi_ainfo))(phi_alm)
		maps["k"] = enmap.ndmap(synth(kappa_alm, phi_ainfo, ()), wcs)
	if "u" in want:
		maps["u"] = enmap.ndmap(synth(cmb_alm, cmb_ainfo, pre, spin=spin), wcs)
	if "l" in want:
		# build the general-synthesis plan ONCE: the global fine torus grid
		# is shared by all dec bands
		splan = curvedsky.SynthesisPlan(cmb_alm, lmax=cmb_ainfo.lmax,
			spin=spin, epsilon=epsilon)
		if verbose: print("lens: synthesis plan built")
		if delta_theta is None:
			bsize = ny
		else:
			bsize = max(1, utils.nint(abs(delta_theta/utils.degree/wcs.wcs.cdelt[1])))
			# avoid a tiny trailing block (reference lensing.py:455-457)
			nblock = max(ny//bsize, 1)
			bsize = min(max(int(ny/(nblock + 0.5)), 1), ny)
		nfine = tuple(int(x) for x in splan.uplan.nfine)
		wk, beta = splan.uplan.w, splan.uplan.beta
		fine = splan.uplan.fine.reshape((-1,) + nfine)
		pre_full = tuple(int(x) for x in splan.pre)
		polrot = bool(pol) and ncomp >= 3
		grad_d = jnp.asarray(grad)
		parts = []
		done = 0
		separable = wcsutils.is_separable(wcs)
		if separable:
			# positions are separable on cylindrical grids: ship 1D axes
			# (O(ny+nx) floats) and broadcast on device
			dec_ax, ra_ax = enmap.posaxes((ny, nx), wcs, safe=False)
			px_ax = (np.asarray(ra_ax, np.float64)/(2*np.pi) % 1.0)*nfine[1]
			ixb_ax = np.floor(px_ax)
			ixb_d = jnp.asarray(ixb_ax.astype(np.int32))
			fx_d = jnp.asarray((px_ax - ixb_ax).astype(rdt))
			ra_d = jnp.asarray(np.asarray(ra_ax).astype(rdt))
		# Gather-free rowband point eval (see _lens_band_rowband): valid for
		# separable single-device patches away from the poles, with real
		# fine grids and a bounded deflection field.
		rowband = (separable and mesh is None and point_eval != "gather"
			and fine.dtype.kind == "f")
		if rowband:
			# static kernel extents from the actual deflection bound (one
			# scalar fetch; the ES weights are exactly zero outside each
			# point's true support, so only the bound must be safe)
			maxa = float(utils.cached_jit(("lensing.maxgrad", grad_d.shape,
				str(grad_d.dtype)), lambda: lambda g: jnp.max(
				jnp.sqrt(g[0]**2 + g[1]**2)))(grad_d))
			dec_all = np.asarray(dec_ax, np.float64)
			mincos = max(float(np.min(np.cos(np.minimum(
				np.abs(dec_all) + maxa, np.pi/2)))), 1e-3)
			Kpix = int(np.ceil(max(maxa*nfine[0], maxa*nfine[1]/mincos)
				/(2*np.pi))) + 1
			hwc = int(np.ceil(wk/2.0))
			dxlo = -(Kpix + hwc)
			ndx = (Kpix + 1 + hwc) - dxlo + 1
			# unwrap the column bases across the ra = 0 torus seam so the
			# restricted column range stays contiguous
			ixb_i = ixb_ax.astype(np.int64)
			if nx > 1:
				dj = np.diff(ixb_i)
				dj = np.where(dj < -nfine[1]//2, dj + nfine[1],
					np.where(dj > nfine[1]//2, dj - nfine[1], dj))
				ixb_i = np.concatenate([[ixb_i[0]], ixb_i[0] + np.cumsum(dj)])
			base = (ixb_i - ixb_i.min()).astype(np.int64)
			nXe = int(base.max()) + 1
			nXs = nXe + ndx - 1
			py_all = ((np.pi/2 - dec_all)/(2*np.pi) % 1.0)*nfine[0]
			iyb_all = np.floor(py_all).astype(np.int64)
			Kym = Kpix + hwc + 1
			RB_R = 64
			ystep = int(np.max(np.abs(np.diff(iyb_all)))) if ny > 1 else 1
			S = RB_R*max(ystep, 1) + 2*Kym + 2
			rowband = (nXs <= ROWBAND_MAX_NXS and Kpix <= 64
				and S < nfine[0]
				and int(iyb_all.min()) - Kym >= 0
				and int(iyb_all.max()) - Kym + S <= nfine[0])
			if point_eval == "rowband" and not rowband:
				raise ValueError("rowband point eval not applicable to this "
					"geometry (wide/full-sky, polar, or huge deflections)")
		if rowband:
			E_h = np.zeros((nx, nXe), np.float32)
			E_h[np.arange(nx), base] = 1.0
			E_d = jnp.asarray(E_h)
			a0 = int((ixb_i.min() + dxlo) % nfine[1])
			def _mk_finex(a0=a0, nXs=nXs, nfx=int(nfine[1])):
				def f(fi):
					if a0 + nXs <= nfx:
						return jax.lax.slice_in_dim(fi, a0, a0 + nXs, axis=2)
					return jnp.concatenate([fi[:, :, a0:],
						fi[:, :, :a0 + nXs - nfx]], 2)
				return f
			fine_x = utils.cached_jit(("lensing.finex", fine.shape,
				str(fine.dtype), a0, nXs), _mk_finex)(fine)
		while done < ny:
			# the tail band starts early (overlapping rows already emitted)
			# so every band has exactly bsize rows -> one compiled program
			i1 = done if done + bsize <= ny else max(ny - bsize, 0)
			i2 = min(i1 + bsize, ny)
			if rowband:
				iyb_band = iyb_all[i1:i2]
				nchunk = -(-(i2 - i1)//RB_R)
				sy0 = np.array([int(iyb_band[k*RB_R:(k+1)*RB_R].min()) - Kym
					for k in range(nchunk)], np.int32)
				band = _lens_band_rowband(fine_x, E_d, grad_d[:, i1:i2, :],
					(jnp.asarray(dec_all[i1:i2].astype(rdt)), ra_d),
					jnp.asarray((iyb_all[i1:i2]).astype(np.int32)),
					jnp.asarray((py_all[i1:i2] - iyb_band).astype(rdt)),
					fx_d, jnp.asarray(sy0),
					nfine=nfine, w=wk, beta=float(beta), pre=pre_full,
					polrot=polrot, pol=bool(pol), geodesic=bool(geodesic),
					S=S, ndx=ndx, dxlo=dxlo, R=RB_R)
				parts.append(band[..., done - i1:, :].astype(dtype))
				done = i2
				if verbose: print("lens band %d / %d" % (done, ny))
				continue
			if separable:
				dec64 = np.asarray(dec_ax[i1:i2], np.float64)
				py = ((np.pi/2 - dec64)/(2*np.pi) % 1.0)*nfine[0]
				iyb = np.floor(py)
				args = ((jnp.asarray(dec64.astype(rdt)), ra_d),
					jnp.asarray(iyb.astype(np.int32)),
					jnp.asarray((py - iyb).astype(rdt)), ixb_d, fx_d)
			else:
				lshape, lwcs = enmap.slice_geometry((ny, nx), wcs,
					(slice(i1, i2), slice(None)))
				pos64 = np.asarray(enmap.posmap(lshape, lwcs, safe=False),
					np.float64)
				py = ((np.pi/2 - pos64[0])/(2*np.pi) % 1.0)*nfine[0]
				px = (pos64[1]/(2*np.pi) % 1.0)*nfine[1]
				iyb = np.floor(py); ixb = np.floor(px)
				args = (jnp.asarray(pos64.astype(rdt)),
					jnp.asarray(iyb.astype(np.int32)),
					jnp.asarray((py - iyb).astype(rdt)),
					jnp.asarray(ixb.astype(np.int32)),
					jnp.asarray((px - ixb).astype(rdt)))
			band = _lens_band_core(fine, grad_d[:, i1:i2, :], *args,
				nfine=nfine, w=wk, beta=float(beta), pre=pre_full,
				polrot=polrot, pol=bool(pol), geodesic=bool(geodesic),
				mesh=mesh)
			parts.append(band[..., done - i1:, :].astype(dtype))
			done = i2
			if verbose: print("lens band %d / %d" % (done, ny))
		lmap = jnp.concatenate(parts, -2) if len(parts) > 1 else parts[0]
		if not pre: lmap = lmap[..., 0, :, :]
		maps["l"] = enmap.ndmap(lmap, wcs)
	res = [maps[c] for c in output if c in maps]
	return res[0] if len(res) == 1 else tuple(res)

def rand_alm(ps_lensinput, lmax=None, dtype=np.float64, seed=None, phi_seed=None, verbose=False, ps_mask=None):
	"""Draw (phi_alm, cmb_alm) from a joint [phi,T,E,B] power spectrum
	(reference lensing.rand_alm:510)."""
	ps = np.asarray(ps_lensinput)
	ctype = np.complex64 if np.dtype(dtype) == np.float32 else np.complex128
	if phi_seed is None:
		alm = curvedsky.rand_alm(ps, lmax=lmax, seed=seed, dtype=ctype)
		phi_alm, cmb_alm = np.asarray(alm)[0], np.asarray(alm)[1:]
	else:
		phi_alm = curvedsky.rand_alm(ps[0, 0], lmax=lmax, seed=phi_seed, dtype=ctype)
		cmb_alm = curvedsky.rand_alm(ps[1:, 1:], lmax=lmax, seed=seed, dtype=ctype)
	return phi_alm, cmb_alm

def rand_map(shape, wcs, ps_lensinput, lmax=None, maplmax=None, dtype=np.float64,
		seed=None, phi_seed=None, oversample=2.0, spin=[0, 2], output="l",
		geodesic=True, verbose=False, delta_theta=None):
	"""End-to-end lensed CMB simulation (reference lensing.rand_map:534)."""
	phi_alm, cmb_alm = rand_alm(ps_lensinput, lmax=lmax, dtype=dtype, seed=seed,
		phi_seed=phi_seed)
	return lens_map_curved(shape=shape, wcs=wcs, phi_alm=phi_alm, cmb_alm=cmb_alm,
		maplmax=maplmax, dtype=dtype, oversample=oversample, spin=spin,
		output=output, geodesic=geodesic, verbose=verbose, delta_theta=delta_theta)


def delens_grad(grad_phi, nstep=3, order=3, mode="spline", border="cyclic"):
	"""Undisplaced gradient from a self-displaced one, by fixed-point
	iteration (reference lensing.delens_grad)."""
	alpha = grad_phi
	for i in range(nstep):
		alpha = lens_map(grad_phi, -alpha, order=order, border=border)
	return alpha

def offset_by_grad_helper(ipos, grad, pol):
	"""Geodesic offset of positions ipos[2,n] by gradient grad[2,n], plus the
	parallel-transport rotation when pol (reference
	lensing.offset_by_grad_helper)."""
	grad = np.array(grad, float)
	grad[:, np.all(grad == 0, 0)] = 1e-20
	d = np.sum(grad**2, 0)**0.5
	grad = grad/d
	cosd, sind = np.cos(d), np.sin(d)
	cost, sint = np.cos(ipos[0]), np.sin(ipos[0])
	ocost = cosd*cost - sind*sint*grad[0]
	osint = (1 - ocost**2)**0.5
	ophi = ipos[1] + np.arcsin(sind*grad[1]/np.maximum(osint, 1e-300))
	if not pol:
		return np.array([np.arccos(np.clip(ocost, -1, 1)), ophi]), None
	with np.errstate(divide="ignore", invalid="ignore"):
		A = grad[1]/(sind*cost/np.maximum(sint, 1e-300) + grad[0]*cosd)
	A = np.nan_to_num(A)
	nom1 = grad[0] + grad[1]*A
	denom = 1 + A**2
	cosgam = 2*nom1**2/denom - 1
	singam = 2*nom1*(grad[1] - grad[0]*A)/denom
	return np.array([np.arccos(np.clip(ocost, -1, 1)), ophi]), np.array([cosgam, singam])

def pole_wrap(pos):
	"""Mirror out-of-range latitudes around the poles (reference
	lensing.pole_wrap)."""
	a = np.array(pos)
	bad = a[0] > np.pi/2
	a[0] = np.where(bad, np.pi - a[0], a[0])
	a[1] = np.where(bad, a[1] + np.pi, a[1])
	bad = a[0] < -np.pi/2
	a[0] = np.where(bad, -np.pi - a[0], a[0])
	a[1] = np.where(bad, a[1] + np.pi, a[1])
	return a
