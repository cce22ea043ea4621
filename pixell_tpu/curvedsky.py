"""Curved-sky harmonic analysis on ndmaps (the public SHT API).

TPU-native counterpart of pixell/curvedsky.py. The heavy lifting lives in
pixell_tpu.sht (ring transforms) and pixell_tpu.ops.sht_core (Legendre
scans); this module understands map geometries:

- analyse_geometry classifies a map as "2d" (rings align with a full-sky
  CC/F1 quadrature grid after y-padding), "cyl" (separable cylindrical but
  no exact quadrature -> pixel-area weights + optional Jacobi refinement),
  or "general" (non-separable -> torus-NUFFT evaluation at per-pixel
  coordinates). Mirrors reference curvedsky.analyse_geometry:1252.
- alm2map/map2alm dispatch on that classification with the same signatures
  as the reference (spin lists, deriv, adjoint, niter).
- alm_info provides the triangular/rectangular layouts plus the alm kernels
  the reference implements in C (cython/cmisc_core.c): alm2cl, lmul,
  transpose_alm, transfer_alm -- here as vectorized jnp ops.
"""
from __future__ import annotations
import functools
import numpy as np
import jax
import jax.numpy as jnp
from . import enmap, wcsutils, utils, sht
from . import fft as enfft
from .bunch import Bunch

# theta-band the direct synthesis once its phase-spectrum working set
# exceeds this many bytes (see _alm2map_impl); 2 GiB keeps lmax <= 5000
# single-band (no change to measured perf) and streams lmax-10000 maps
SYNTH_BAND_BYTES = float(2 << 30)


# ---------------------------------------------------------------------------
# alm_info (reference curvedsky.py:409-474)
# ---------------------------------------------------------------------------
def nalm2lmax(n): return sht.nalm2lmax(n)

class alm_info:
	"""Layout information for 1D alm arrays. Default is the healpy-style
	triangular m-major layout; rectangular is also supported."""
	def __init__(self, lmax=None, mmax=None, nalm=None, stride=1, layout="triangular"):
		if lmax is not None: lmax = int(lmax)
		if mmax is not None: mmax = int(mmax)
		if nalm is not None: nalm = int(nalm)
		if isinstance(layout, str):
			if layout in ["triangular", "tri"]:
				if lmax is None: lmax = nalm2lmax(nalm)
				if mmax is None: mmax = lmax
				m = np.arange(mmax+1)
				mstart = stride*(m*(2*lmax+1-m)//2)
			elif layout in ["rectangular", "rect"]:
				if lmax is None: lmax = int(nalm**0.5)-1
				if mmax is None: mmax = lmax
				mstart = np.arange(mmax+1)*(lmax+1)*stride
			else:
				raise ValueError("unknown layout: %s" % layout)
		else:
			mstart = np.asarray(layout)
			if lmax is None: raise ValueError("lmax needed with explicit mstart")
			if mmax is None: mmax = len(mstart)-1
		self.lmax   = lmax
		self.mmax   = mmax
		self.stride = int(stride)
		self.nelem  = int(np.max(mstart) + (lmax+1)*stride)
		self.mstart = mstart.astype(np.int64)
	@property
	def nl(self): return self.lmax+1
	@property
	def nm(self): return self.mmax+1
	def lm2ind(self, l, m):
		return self.mstart[np.asarray(m)] + np.asarray(l)*self.stride
	def get_map(self):
		"""Explicit [nelem_valid, {l,m}] mapping."""
		l = np.arange(self.lmax+1)[:, None]
		m = np.arange(self.mmax+1)[None, :]
		valid = l >= m
		return np.stack([l + 0*m, 0*l + m], -1)[valid]
	def _is_tri(self):
		m = np.arange(self.mmax+1)
		return self.stride == 1 and np.array_equal(self.mstart,
			m*(2*self.lmax+1-m)//2)
	def _rect(self, alm):
		"""[..., nalm] -> [..., nl, nm] (zero where invalid)."""
		if self._is_tri():
			from . import sht as _sht
			return _sht.alm2rect(utils.to_device(alm), self.lmax, self.mmax)
		l = np.arange(self.lmax+1)[:, None]
		m = np.arange(self.mmax+1)[None, :]
		valid = l >= m
		idx = np.where(valid, self.mstart[np.minimum(m, self.mmax)] + l*self.stride, 0)
		rect = utils.to_device(alm)[..., jnp.asarray(idx)]
		return jnp.where(jnp.asarray(valid), rect, 0)
	def _unrect(self, rect, alm_like=None):
		# pure gather from the transposed rect (TPU scatters are slow); only
		# valid for layouts whose index set covers [0, nelem) (triangular/rect)
		if self._is_tri():
			from . import sht as _sht
			return _sht.rect2alm(rect, self.lmax, self.mmax)
		nl = self.lmax + 1
		l = np.arange(self.lmax+1)[:, None]
		m = np.arange(self.mmax+1)[None, :]
		valid = l >= m
		lv, mv = np.where(valid)
		idx = self.mstart[mv] + lv*self.stride
		if len(idx) == self.nelem and np.array_equal(np.sort(idx), np.arange(self.nelem)):
			order = np.argsort(idx, kind="stable")
			gidx = jnp.asarray(mv[order]*nl + lv[order])
			rt = jnp.moveaxis(rect, -1, -2).reshape(rect.shape[:-2] + (-1,))
			return rt[..., gidx]
		out = utils.czeros(rect.shape[:-2] + (self.nelem,), rect.dtype)
		return out.at[..., jnp.asarray(idx)].set(rect[..., jnp.asarray(lv), jnp.asarray(mv)])
	def transpose_alm(self, alm, out=None):
		"""Reorder between m-major and l-major layouts (reference cmisc.transpose_alm)."""
		rect = self._rect(alm)
		l = np.arange(self.lmax+1)[:, None]; m = np.arange(self.mmax+1)[None, :]
		valid = (l >= m)
		lv, mv = np.where(valid)
		order = np.lexsort((mv, lv))  # l-major ordering
		res = rect[..., jnp.asarray(lv[order]), jnp.asarray(mv[order])]
		return utils.from_device(res) if out is None else res
	def alm2cl(self, alm, alm2=None, dtype=None):
		"""Cross power spectra (reference cmisc.alm2cl). alm, alm2 broadcast
		against each other over pre-dimensions; returns [..., nl]."""
		return alm2cl(alm, alm2=alm2, ainfo=self)
	def lmul(self, alm, lmat, out=None):
		"""res[a,lm] = lmat[a,b,l] alm[b,lm] (or scalar lmat[l]*alm)."""
		return lmul(alm, lmat, ainfo=self)
	def __repr__(self):
		return "alm_info(lmax=%s,mmax=%s)" % (str(self.lmax), str(self.mmax))


def alm2cl(alm, alm2=None, ainfo=None):
	"""Power/cross spectra of triangular alms [..., nalm] -> [..., nl]."""
	alm = utils.to_device(alm)
	if ainfo is None: ainfo = alm_info(nalm=alm.shape[-1])
	if alm2 is None: alm2 = alm
	alm2 = utils.to_device(alm2)
	r1 = ainfo._rect(alm)
	r2 = ainfo._rect(alm2)
	eps = jnp.asarray(np.where(np.arange(ainfo.mmax+1) == 0, 1.0, 2.0))
	cl = jnp.sum((r1*jnp.conj(r2)).real*eps, -1)
	l = jnp.arange(ainfo.lmax+1)
	return cl/(2*l+1)

def lmul(alm, lmat, ainfo=None, out=None):
	"""Multiply alm by a per-l scalar [nl] or matrix [a,b,nl]."""
	alm = utils.to_device(alm)
	if ainfo is None: ainfo = alm_info(nalm=alm.shape[-1])
	lmat = jnp.asarray(lmat)
	rect = ainfo._rect(alm)  # [..., nl, nm]
	nl = ainfo.lmax+1
	if lmat.ndim == 1:
		res = rect*lmat[:nl][:, None]
	elif lmat.ndim == 2:
		res = rect*lmat[..., :nl][..., :, None]
	else:
		res = jnp.einsum("ab...l,b...lm->a...lm", lmat[..., :nl], rect)
	return ainfo._unrect(res).astype(alm.dtype)

def almxfl(alm, lfilter=None, ainfo=None, out=None):
	"""Filter alm by a function or array of l (reference curvedsky.almxfl:630)."""
	alm = utils.to_device(alm)
	if ainfo is None: ainfo = alm_info(nalm=alm.shape[-1])
	if callable(lfilter):
		lfilter = lfilter(np.arange(ainfo.lmax+1).astype(float))
	return lmul(alm, jnp.asarray(lfilter), ainfo=ainfo)

def filter(imap, lfilter, ainfo=None, lmax=None):
	"""Filter a map by the given l-function: map2alm -> multiply -> alm2map
	(reference curvedsky.filter:653)."""
	if lmax is None: lmax = get_lmax_from_map(imap)
	alm = map2alm(imap, lmax=lmax, ainfo=ainfo)
	ainfo2 = alm_info(lmax=lmax) if ainfo is None else ainfo
	alm = almxfl(alm, lfilter, ainfo=ainfo2)
	omap = enmap.zeros(imap.shape, imap.wcs, dtype=np.asarray(imap).dtype)
	return alm2map(alm, omap)

@functools.partial(jax.jit, static_argnames=("nelem", "op"))
def _transfer_alm_core(alm, ii, oi, nelem, op):
	# complex zeros must be created INSIDE jit: the axon TPU runtime cannot
	# materialize complex constants eagerly (UNIMPLEMENTED on eager dispatch)
	res = jnp.zeros(alm.shape[:-1] + (nelem,), alm.dtype)
	return res.at[..., oi].set(op(res[..., oi], alm[..., ii]))

@functools.partial(jax.jit, static_argnames=("op",))
def _transfer_alm_core_out(alm, ii, oi, out, op):
	return out.at[..., oi].set(op(out[..., oi], alm[..., ii]))

def _op_replace(a, b): return b

@functools.partial(jax.jit,
	static_argnames=("ilmax", "immax", "olmax", "ommax", "op"))
def _transfer_alm_tri(alm, out, ilmax, immax, olmax, ommax, op):
	# triangular->triangular transfer as a pad/reshape fold roundtrip:
	# per m the layouts are contiguous runs, so the whole transfer is a
	# static slice/pad of the rectangular [nl, nm] view
	from . import sht as _sht
	L = min(ilmax, olmax)+1; M = min(immax, ommax)+1
	rect = _sht.alm2rect(alm, ilmax, immax)[..., :L, :M]
	if out is None and op is _op_replace:
		pad = [(0, 0)]*(rect.ndim-2) + [(0, olmax+1-L), (0, ommax+1-M)]
		return _sht.rect2alm(jnp.pad(rect, pad), olmax, ommax)
	base = _sht.alm2rect(out, olmax, ommax) if out is not None else \
		jnp.zeros(alm.shape[:-1] + (olmax+1, ommax+1), alm.dtype)
	# apply op only at valid (l >= m) overlap positions; everything else in
	# the output (including beyond-overlap entries of out) is untouched
	l = jax.lax.broadcasted_iota(jnp.int32, (L, M), 0)
	m = jax.lax.broadcasted_iota(jnp.int32, (L, M), 1)
	block = jnp.where(l >= m, op(base[..., :L, :M], rect), base[..., :L, :M])
	full = base.at[..., :L, :M].set(block.astype(base.dtype))
	return _sht.rect2alm(full, olmax, ommax)

def transfer_alm(iainfo, alm, oainfo, out=None, op=_op_replace):
	"""Convert alm between layouts/lmax (reference cmisc.transfer_alm).

	Triangular->triangular transfers are pure per-m truncation/zero-padding,
	so they run through the pad/reshape fold (alm2rect -> static slice/pad
	-> rect2alm) with no index arrays at all. The previous elementwise
	gather/scatter built two [nvalid] int32 index arrays (~200 MB each at
	lmax 10000) and re-uploaded them on every call -- minutes per top-scale
	wavelet transfer through the ~26 MB/s remote tunnel, and the residency
	spike that OOMed big reconstructions. Identical layouts short-circuit
	to the input. Non-triangular layouts keep the general gather path."""
	alm = utils.to_device(alm)
	if out is None and op is _op_replace \
			and iainfo.lmax == oainfo.lmax and iainfo.mmax == oainfo.mmax \
			and iainfo.stride == oainfo.stride \
			and np.array_equal(iainfo.mstart, oainfo.mstart):
		return alm
	if iainfo._is_tri() and oainfo._is_tri():
		if out is not None: out = utils.to_device(out)
		res = _transfer_alm_tri(alm, out, iainfo.lmax, iainfo.mmax,
			oainfo.lmax, oainfo.mmax, op)
		return res.astype(out.dtype if out is not None else alm.dtype)
	lmax = min(iainfo.lmax, oainfo.lmax)
	mmax = min(iainfo.mmax, oainfo.mmax)
	l = np.arange(lmax+1)[:, None]; m = np.arange(mmax+1)[None, :]
	valid = l >= m
	lv, mv = np.where(valid)
	# int32 on the host BEFORE upload: the int64 intermediates would double
	# the device_put footprint (2 x 200 MB at lmax 10000, right at the
	# HBM-residency peak of big wavelet reconstructions)
	ii = jnp.asarray(np.asarray(iainfo.mstart[mv] + lv*iainfo.stride, np.int32))
	oi = jnp.asarray(np.asarray(oainfo.mstart[mv] + lv*oainfo.stride, np.int32))
	if out is not None:
		return _transfer_alm_core_out(alm, ii, oi, utils.to_device(out), op)
	return _transfer_alm_core(alm, ii, oi, oainfo.nelem, op)


# ---------------------------------------------------------------------------
# Random alm / maps (reference curvedsky.py:17-82)
# ---------------------------------------------------------------------------
def rand_alm_white(ainfo, pre=None, seed=None, m_major=True, return_ainfo=False, dtype=np.complex128):
	rng = np.random.default_rng(seed)
	shape = (tuple(pre) if pre else ()) + (ainfo.nelem,)
	# draw at the target real precision: f32 draws are ~2x faster and half
	# the memory, and the f64 path keeps the historical stream bit-exact
	rdt = np.float32 if np.dtype(dtype) == np.complex64 else np.float64
	alm = np.empty(shape, dtype)
	alm.real = rng.standard_normal(shape, dtype=rdt)
	alm.imag = rng.standard_normal(shape, dtype=rdt)
	# m=0 must be real, and scaled so all modes have consistent variance
	l = np.arange(ainfo.lmax+1)
	i0 = ainfo.lm2ind(l, 0*l)
	alm[..., i0] = alm[..., i0].real*np.sqrt(2)
	return (alm, ainfo) if return_ainfo else alm

def rand_alm(ps, ainfo=None, lmax=None, seed=None, dtype=np.complex128, m_major=True, return_ainfo=False):
	"""Random gaussian alm with the given power spectrum ps[nl] or
	[ncomp,ncomp,nl] (reference curvedsky.rand_alm:61)."""
	ps = np.asarray(ps)
	oned = ps.ndim == 1
	if oned: ps = ps[None, None]
	if lmax is None: lmax = ps.shape[-1]-1
	if ainfo is None: ainfo = alm_info(lmax=lmax)
	ncomp = ps.shape[0]
	alm = rand_alm_white(ainfo, pre=(ncomp,), seed=seed, dtype=dtype)
	# scale by the cholesky-like sqrt of ps at each l
	ps_ext = np.zeros((ncomp, ncomp, ainfo.lmax+1))
	n = min(ps.shape[-1], ainfo.lmax+1)
	ps_ext[:, :, :n] = ps[:, :, :n]
	L = utils.eigpow(np.moveaxis(ps_ext, -1, 0), 0.5)  # [nl, ncomp, ncomp]
	L = np.moveaxis(L, 0, -1)                          # [ncomp, ncomp, nl]
	# host-side scaling: the white alm is host memory already, and per-l
	# matrix multiply is trivial on CPU. Routing this through device lmul
	# costs a chain of large one-off eager dispatches (on remote-compile
	# TPU runtimes each is a fresh compilation -- minutes at high lmax).
	alm = alm/np.sqrt(2)
	lv = np.zeros(ainfo.nelem, int)
	for m in range(ainfo.mmax+1):
		ls = np.arange(m, ainfo.lmax+1)
		lv[ainfo.mstart[m] + ls*ainfo.stride] = ls
	Ll = L[:, :, lv].astype(alm.real.dtype)            # [ncomp, ncomp, nalm]
	# contract on a real float view of the complex alm: a complex einsum
	# would upcast the real mixing matrix to complex (2x flops, and numpy
	# materializes the 1 GB+ upcast copy at high lmax)
	av = np.ascontiguousarray(alm).view(alm.real.dtype)
	av = av.reshape(alm.shape[0], -1, 2)
	out = np.einsum("abi,bik->aik", Ll, av)
	alm = np.ascontiguousarray(out).view(alm.dtype)[..., 0]
	res = alm[0] if oned else alm
	return (res, ainfo) if return_ainfo else res

def rand_map(shape, wcs, ps, lmax=None, dtype=np.float64, seed=None, spin=[0, 2],
		method="auto", verbose=False):
	"""Random realization of ps directly in map space (reference :17)."""
	if lmax is None:
		lmax = get_lmax_from_map(Bunch2(shape, wcs))
	alm = rand_alm(ps, lmax=lmax, seed=seed,
		dtype=np.complex64 if np.dtype(dtype) == np.float32 else np.complex128)
	omap = enmap.zeros(shape, wcs, dtype)
	return alm2map(alm, omap, spin=spin, method=method)

class Bunch2:
	def __init__(self, shape, wcs): self.shape, self.wcs = shape, wcs

def get_lmax_from_map(m):
	"""Nyquist-ish lmax for a cylindrical map geometry."""
	res = np.min(np.abs(np.asarray(m.wcs.wcs.cdelt)))*utils.degree
	return int(np.pi/res)


# ---------------------------------------------------------------------------
# Geometry analysis (reference curvedsky.analyse_geometry:1252,
# get_ducc_geo:1308)
# ---------------------------------------------------------------------------
def analyse_geometry(shape, wcs, tol=1e-6):
	"""Classify a geometry for SHT purposes. Returns a Bunch with:
	case: "2d" | "cyl" | "general"
	flip: [flipy, flipx] to bring into (theta increasing, phi increasing)
	theta[nt], phi0, nphi_full, xpad=(left,right) pixel padding in x,
	ypad=(top,bottom) ring padding to complete the quadrature grid,
	variant: "CC"|"F1"|None."""
	if wcsutils.is_plain(wcs):
		return Bunch(case="general", flip=[False, False], variant=None,
			theta=None, phi0=0.0, nphi=shape[-1], ypad=(0, 0), xpad=(0, 0))
	if not wcsutils.is_separable(wcs):
		return Bunch(case="general", flip=[False, False], variant=None,
			theta=None, phi0=0.0, nphi=shape[-1], ypad=(0, 0), xpad=(0, 0))
	ny, nx = shape[-2:]
	# Ring positions
	dec, ra = enmap.posaxes(shape, wcs)
	theta = np.pi/2 - dec
	flipy = theta[0] > theta[-1] if ny > 1 else False
	if flipy: theta = theta[::-1]
	flipx = wcs.wcs.cdelt[0] < 0
	ra_asc = ra[::-1] if flipx else ra
	phi0 = ra_asc[0] % (2*np.pi)
	# full-circle pixel count
	nphi_full_f = 360.0/abs(wcs.wcs.cdelt[0])
	nphi_full = utils.nint(nphi_full_f)
	good_x = abs(nphi_full_f - nphi_full) < tol*nphi_full
	xpad = (0, max(nphi_full - nx, 0)) if good_x else (0, 0)
	if not good_x:
		return Bunch(case="general", flip=[flipy, flipx], variant=None,
			theta=theta, phi0=phi0, nphi=nx, ypad=(0, 0), xpad=(0, 0))
	if wcsutils.get_proj(wcs) != "car":
		# separable but rings not equispaced in theta (cea/mer):
		return Bunch(case="cyl", flip=[flipy, flipx], variant=None,
			theta=theta, phi0=phi0, nphi=nphi_full, ypad=(0, 0), xpad=xpad)
	# CAR: check ring alignment with CC or F1 full-sky grids
	dtheta = abs(wcs.wcs.cdelt[1])*utils.degree
	for variant, off in [("CC", 0.0), ("F1", 0.5)]:
		nfull_f = np.pi/dtheta + (1 if variant == "CC" else 0)
		nfull = utils.nint(nfull_f)
		if abs(nfull_f - nfull) > tol: continue
		j0_f = theta[0]/dtheta - off
		j0 = utils.nint(j0_f)
		if abs(j0_f - j0) > tol: continue
		if j0 < 0 or j0 + ny > nfull: continue
		return Bunch(case="2d", flip=[flipy, flipx], variant=variant,
			theta=theta, phi0=phi0, nphi=nphi_full,
			ypad=(int(j0), int(nfull - ny - j0)), xpad=xpad)
	return Bunch(case="cyl", flip=[flipy, flipx], variant=None,
		theta=theta, phi0=phi0, nphi=nphi_full, ypad=(0, 0), xpad=xpad)

def get_method(shape, wcs, minfo=None, pix_tol=1e-6):
	"""Which method map2alm/alm2map will use: "2d", "cyl" or "general"."""
	if minfo is None: minfo = analyse_geometry(shape, wcs, tol=pix_tol)
	return minfo.case if minfo.case != "partial" else "cyl"

def quad_weights(shape, wcs, pix_tol=1e-6):
	"""Quadrature weights per row for map2alm (reference curvedsky.quad_weights:492).
	Returns weights[ny]/nphi-convention matching the reference: weight per
	pixel row divided by the number of pixels per ring."""
	minfo = analyse_geometry(shape, wcs, tol=pix_tol)
	if minfo.case != "2d":
		raise ValueError("Quadrature weights not available for geometry %s,%s"
			% (str(shape), str(wcs)))
	nfull = shape[-2] + minfo.ypad[0] + minfo.ypad[1]
	w = sht.ring_weights(minfo.variant, nfull)
	w = w[minfo.ypad[0]:nfull-minfo.ypad[1]]
	if minfo.flip[0]: w = w[::-1]
	return w*(2*np.pi)/minfo.nphi


# ---------------------------------------------------------------------------
# Map-level transforms
# ---------------------------------------------------------------------------
def _to_rings(map_arr, minfo):
	"""Reorient map pixel axes to (theta ascending, phi ascending), pad x.
	Both flips fuse into ONE lax.rev: XLA reverses are not free at these
	sizes (~0.2 ms per pass at the headline 900x1800), so op count matters."""
	d = jnp.asarray(map_arr)
	if minfo.flip[0] and minfo.flip[1]: d = d[..., ::-1, ::-1]
	elif minfo.flip[0]: d = d[..., ::-1, :]
	elif minfo.flip[1]: d = d[..., :, ::-1]
	padx = minfo.xpad[1]
	if padx:
		pad = [(0, 0)]*(d.ndim-1) + [(0, padx)]
		d = jnp.pad(d, pad)
	return d

def _from_rings(d, minfo, nx):
	d = d[..., :, :nx]
	if minfo.flip[0] and minfo.flip[1]: d = d[..., ::-1, ::-1]
	elif minfo.flip[1]: d = d[..., :, ::-1]
	elif minfo.flip[0]: d = d[..., ::-1, :]
	return d

def _to_rings_slice(arr, minfo, i0, i1):
	"""Ring-ordered rows [i0, i1) sliced from the ORIGINAL map array: the
	flips ride the slice inside jit instead of materializing a full flipped
	copy of the map (3.2 GB at lmax 10000)."""
	ny = arr.shape[-2]
	if minfo.flip[0]:
		d = arr[..., ny - i1:ny - i0, :]
		d = d[..., ::-1, ::-1] if minfo.flip[1] else d[..., ::-1, :]
	else:
		d = arr[..., i0:i1, :]
		if minfo.flip[1]: d = d[..., :, ::-1]
	padx = minfo.xpad[1]
	if padx:
		d = jnp.pad(d, [(0, 0)]*(d.ndim - 1) + [(0, padx)])
	return d

def _analysis_phase_banded(arr, ainfo, minfo, spin, deriv, flat2d, nb):
	"""Big-map analysis: produce the [.., nm, ntfull] phase spectrum in nb
	theta bands (each band = slice + flip + ring rfft in ONE cached jit,
	accumulated into a DONATED buffer -- the ypad zeros come for free), then
	run the usual phase-domain tail (exact theta upsample, quadrature,
	Legendre transpose)."""
	from . import fft as enfft
	theta = np.asarray(minfo.theta)
	nt = len(theta)
	nm = ainfo.mmax + 1
	ypad0 = int(minfo.ypad[0])
	ntfull = nt + ypad0 + int(minfo.ypad[1])
	cdt = np.complex64 if np.dtype(arr.dtype) == np.float32 else np.complex128
	lead = ((1,) if flat2d else arr.shape[:-2])
	# ypad0 is baked into each band program as the dynamic_update_slice
	# offset, so it MUST be part of the key: two same-shape geometries that
	# differ only in y placement would otherwise reuse each other's program
	# and write rings at the wrong theta offset. variant pins the ring
	# layout the offsets are relative to.
	mkey = (tuple(minfo.flip), tuple(minfo.xpad), tuple(minfo.ypad),
		minfo.variant, minfo.nphi, float(_ring_phi0(minfo)), arr.shape,
		str(arr.dtype))
	F = utils.czeros(tuple(lead) + (nm, ntfull), cdt)
	bsize = -(-nt//nb)
	for i0 in range(0, nt, bsize):
		i1 = min(i0 + bsize, nt)
		key = ("curvedsky._anal_band", mkey, nm, i0, i1, bool(deriv),
			bool(flat2d), F.shape)
		def make(i0=i0, i1=i1):
			def f(Fa, a):
				d = _to_rings_slice(a, minfo, i0, i1)
				if flat2d: d = d[None]
				d2 = alm2_pre(d, deriv)
				Fb = sht.ring_analysis(d2, _ring_phi0(minfo), nm)
				return jax.lax.dynamic_update_slice_in_dim(
					Fa, Fb.astype(Fa.dtype), ypad0 + i0, axis=-1)
			return f
		F = utils.cached_jit(key, make, donate_argnums=(0,))(F, arr)
	need = 2*ainfo.lmax + 1
	if need > ntfull:
		ntu = enfft.fft_len(need + 2, direction="above")
		spins = [1, 0] if deriv else _comp_spins(spin, lead[-1])
		F = sht.resample_theta_phase(F, minfo.variant, ntu, spins)
		ntfull = ntu
	theta_f = sht.ring_theta(minfo.variant, ntfull)
	w = jnp.asarray(sht.ring_weights(minfo.variant, ntfull))
	return sht.analysis_phase(F, theta_f, ainfo.lmax, w, minfo.nphi,
		mmax=ainfo.mmax, spin=spin, deriv=deriv)

def _ring_phi0(minfo):
	"""phi0 of the ring grid after flips: the first (ascending-phi) column."""
	return minfo.phi0

def prepare_alm(alm=None, ainfo=None, lmax=None, pre=(), dtype=np.float64):
	"""Allocate alm and get its layout info (reference curvedsky.prepare_alm)."""
	ctype = np.complex64 if np.dtype(dtype) == np.float32 else np.complex128
	if alm is None:
		if ainfo is None:
			if lmax is None: raise ValueError("prepare_alm needs alm, ainfo or lmax")
			ainfo = alm_info(lmax=lmax)
		# device-side allocation: results stay jax arrays (TPU-first; also,
		# the axon runtime cannot transfer complex host arrays to the device)
		alm = utils.czeros(tuple(pre) + (ainfo.nelem,), ctype)
	else:
		if ainfo is None: ainfo = alm_info(nalm=np.asarray(alm).shape[-1])
	return alm, ainfo


def alm2map(alm, map, spin=[0, 2], deriv=False, adjoint=False, copy=False,
		method="auto", ainfo=None, verbose=False, nthread=None, epsilon=None,
		pix_tol=1e-6, locinfo=None, tweak=False, accuracy=None, mesh=None):
	"""Spherical harmonic synthesis onto map's geometry
	(reference curvedsky.alm2map:83). See that docstring for semantics; this
	implementation is jit-compatible for fixed geometry.
	accuracy: None/"fast" = default kernels; "high" = full double-single
	recurrence (~10x Legendre cost; f32 roundtrip <= ~1e-5 at lmax 5000).
	The reference's analogue is its epsilon/niter ladder
	(reference curvedsky.py:262-265, 1001-1003).
	mesh: a jax.sharding.Mesh to run the transform multi-chip: the alm stays
	replicated and the map comes out sharded over rings (rows) on the
	mesh's first axis, with the Legendre/FFT work ring-parallel via
	shard_map (the TPU equivalent of the reference's tilemap+MPI domain
	decomposition). Only the 2d/cyl methods dispatch distributed."""
	with sht.accuracy(accuracy):
		return _alm2map_impl(alm, map, spin=spin, deriv=deriv, adjoint=adjoint,
			copy=copy, method=method, ainfo=ainfo, verbose=verbose,
			nthread=nthread, epsilon=epsilon, pix_tol=pix_tol,
			locinfo=locinfo, tweak=tweak, mesh=mesh)

def _alm2map_impl(alm, map, spin=[0, 2], deriv=False, adjoint=False, copy=False,
		method="auto", ainfo=None, verbose=False, nthread=None, epsilon=None,
		pix_tol=1e-6, locinfo=None, tweak=False, mesh=None):
	alm = utils.to_device(alm)
	if ainfo is None: ainfo = alm_info(nalm=alm.shape[-1])
	minfo = analyse_geometry(map.shape, map.wcs, tol=pix_tol)
	if method == "auto": method = get_method(map.shape, map.wcs, minfo=minfo)
	if adjoint:
		return _map2alm_core(map, alm, ainfo, minfo, spin, deriv, method,
			weighted=False, epsilon=epsilon)
	if method in ["2d", "cyl"]:
		pre = alm.shape[:-1]
		theta = np.asarray(minfo.theta)
		alm2 = alm if (deriv or alm.ndim > 1) else alm[None]
		if mesh is not None:
			from .parallel import sht_dist
			row_axis = tuple(mesh.shape.keys())[0]
			synth = functools.partial(sht_dist.synthesis_dist, mesh=mesh,
				row_axis=row_axis)
		else:
			synth = sht.synthesis
		def run_synth(a, th):
			if deriv:
				return synth(a, th, minfo.nphi, phi0=_ring_phi0(minfo),
					lmax=ainfo.lmax, mmax=ainfo.mmax, deriv=True,
					map_dtype=map.dtype)
			return synth(a, th, minfo.nphi, phi0=_ring_phi0(minfo),
				lmax=ainfo.lmax, mmax=ainfo.mmax, spin=spin,
				map_dtype=map.dtype)
		# Theta-banded streaming for big single-chip transforms: the full
		# synthesis holds ~2-3 copies of the [nm, nt] c64 phase spectrum
		# (9.6 GB for one component at lmax 10000), which OOMs a 16 GB chip
		# once the output map and the caller's buffers are resident. Bands
		# are independent row groups of the same program family; each band
		# is jitted once (cached) and streams its own bounded transient.
		ncomp_eff = 2 if deriv else alm2.shape[-2]
		nt = len(theta)
		est = float(ainfo.mmax + 1)*nt*16.0*ncomp_eff
		if mesh is None and est > SYNTH_BAND_BYTES and nt >= 64:
			nb = int(np.ceil(est/SYNTH_BAND_BYTES))
			bsize = -(-nt//nb)
			# Preallocate the full output and write each band into it with a
			# DONATED update jit: a concatenate of the band results would hold
			# output twice (6.4 GB at lmax 10000) right when HBM is tightest.
			oshape = alm2.shape[:-1] + ((2,) if deriv else ()) \
				+ (nt, minfo.nphi)
			d = jnp.zeros(oshape, map.dtype)
			for i0 in range(0, nt, bsize):
				th_b = np.asarray(theta[i0:i0+bsize], np.float64)
				key = ("curvedsky._synth_band", th_b.tobytes(), minfo.nphi,
					float(_ring_phi0(minfo)), ainfo.lmax, ainfo.mmax,
					tuple(np.atleast_1d(spin)), bool(deriv),
					np.dtype(map.dtype).str, alm2.shape, str(alm2.dtype),
					i0, oshape)
				d = utils.cached_jit(key,
					lambda th_b=th_b, i0=i0: lambda o, a:
						jax.lax.dynamic_update_slice_in_dim(
							o, run_synth(a, th_b), i0, axis=-2),
					donate_argnums=(0,))(d, alm2)
		else:
			d = run_synth(alm2, theta)
		if deriv:
			# engine gives (d/dtheta, d/dphi); reference returns (d/ddec, d/dra)
			d = jnp.stack([-d[..., 0, :, :], d[..., 1, :, :]], -3)
		else:
			if alm.ndim == 1: d = d[..., 0, :, :]
		d = _from_rings(d, minfo, map.shape[-1])
		res = enmap.ndmap(d, map.wcs)
		if map is not None and not copy:
			map.data = d if (enmap._is_jax(map.data) or
				isinstance(d, jax.core.Tracer)) else np.asarray(d)
			return map
		return res
	else:
		return alm2map_pos(alm, pos=None, loc=_locinfo_loc(map, locinfo),
			ainfo=ainfo, map=map, spin=spin, deriv=deriv, copy=copy,
			epsilon=epsilon, map_shape=map.shape, map_wcs=map.wcs)

def alm2map_adjoint(map, alm=None, spin=[0, 2], deriv=False, copy=False,
		method="auto", ainfo=None, verbose=False, nthread=None, epsilon=None,
		pix_tol=1e-6, locinfo=None, accuracy=None):
	"""Adjoint of alm2map: map -> alm, no quadrature weights."""
	alm, ainfo = prepare_alm(alm, ainfo, lmax=get_lmax_from_map(map),
		pre=map.shape[:-2], dtype=np.asarray(map).dtype)
	with sht.accuracy(accuracy):
		return _map2alm_core(map, alm, ainfo, analyse_geometry(map.shape, map.wcs),
			spin, deriv, method, weighted=False, epsilon=epsilon)

def map2alm(map, alm=None, lmax=None, spin=[0, 2], deriv=False, adjoint=False,
		copy=False, method="auto", ainfo=None, verbose=False, nthread=None,
		niter=0, epsilon=None, pix_tol=1e-6, weights=None, locinfo=None,
		tweak=False, accuracy=None, mesh=None):
	"""Spherical harmonic analysis (reference curvedsky.map2alm:209).
	accuracy: None/"fast" = default kernels; "high" = full double-single
	recurrence (see alm2map).
	mesh: a jax.sharding.Mesh for a multi-chip transform: the map rows
	shard over the mesh's first axis; when quadrature is native to the
	map's rings, the transform runs ring-parallel via shard_map with one
	psum; the 2d theta-upsampled path instead reshards the per-ring phase
	spectrum over m (one all-to-all) so the Legendre/quadrature work is
	m-parallel. Output alm is replicated."""
	with sht.accuracy(accuracy):
		return _map2alm_impl(map, alm=alm, lmax=lmax, spin=spin, deriv=deriv,
			adjoint=adjoint, copy=copy, method=method, ainfo=ainfo,
			verbose=verbose, nthread=nthread, niter=niter, epsilon=epsilon,
			pix_tol=pix_tol, weights=weights, locinfo=locinfo, tweak=tweak,
			mesh=mesh)

def _map2alm_impl(map, alm=None, lmax=None, spin=[0, 2], deriv=False, adjoint=False,
		copy=False, method="auto", ainfo=None, verbose=False, nthread=None,
		niter=0, epsilon=None, pix_tol=1e-6, weights=None, locinfo=None,
		tweak=False, mesh=None):
	if adjoint:
		# adjoint of map2alm: alm -> map with weights in synthesis direction
		minfo = analyse_geometry(map.shape, map.wcs, tol=pix_tol)
		return _adjoint_map2alm(alm, map, ainfo, minfo, spin, deriv)
	alm, ainfo = prepare_alm(alm, ainfo, lmax=lmax,
		pre=map.shape[:-2] if not deriv else map.shape[:-3],
		dtype=map.dtype)
	minfo = analyse_geometry(map.shape, map.wcs, tol=pix_tol)
	if method == "auto": method = get_method(map.shape, map.wcs, minfo=minfo)
	res = _map2alm_core(map, alm, ainfo, minfo, spin, deriv, method,
		weighted=True, weights=weights, epsilon=epsilon, mesh=mesh)
	# Jacobi iterations to refine non-exact quadrature (reference niter)
	for it in range(niter):
		resid = enmap.samewcs(jnp.asarray(map) -
			jnp.asarray(alm2map(res, enmap.zeros(map.shape, map.wcs,
				np.asarray(map).dtype), spin=spin, deriv=deriv, ainfo=ainfo)), map)
		delta = _map2alm_core(resid, utils.czeros(np.shape(res), np.asarray(res).dtype
			if isinstance(res, np.ndarray) else res.dtype), ainfo,
			minfo, spin, deriv, method, weighted=True, weights=weights,
			epsilon=epsilon)
		res = res + delta
	return res

def map2alm_adjoint(alm, map, lmax=None, spin=[0, 2], deriv=False,
		accuracy=None, **kw):
	minfo = analyse_geometry(map.shape, map.wcs)
	if lmax is not None and alm is None: alm, _ = prepare_alm(None, None, lmax=lmax)
	ainfo = kw.get("ainfo") or alm_info(nalm=np.asarray(alm).shape[-1])
	with sht.accuracy(accuracy):
		return _adjoint_map2alm(alm, map, ainfo, minfo, spin, deriv)


def _map2alm_core(map, alm, ainfo, minfo, spin, deriv, method, weighted=True,
		weights=None, epsilon=None, mesh=None):
	if method == "auto": method = minfo.case
	arr = jnp.asarray(map)
	if method in ["2d", "cyl"]:
		res = _analysis_linear(arr, ainfo, minfo, tuple(np.atleast_1d(spin)),
			deriv, weighted, None if weights is None else jnp.asarray(weights),
			mesh=mesh)
		if isinstance(alm, np.ndarray) and not isinstance(res, jax.core.Tracer):
			alm[...] = utils.from_device(res)
			return alm
		return res.astype(alm.dtype) if hasattr(alm, "dtype") else res
	else:
		return _map2alm_general(map, alm, ainfo, spin, deriv, weighted, epsilon)


def _analysis_linear(arr, ainfo, minfo, spin, deriv, weighted, weights,
		mesh=None):
	"""Pure linear map pixel-array -> alm for the 2d/cyl cases. For 2d grids
	that are too coarse for exact simple quadrature (2 lmax + 1 > nrings),
	the full-sky map is first theta-upsampled exactly on the torus, keeping
	analysis exact up to lmax ~ nrings - 1 (like ducc's analysis_2d).
	mesh: run multi-chip -- ring-sharded shard_map + psum when quadrature
	is native to the map's rings; the 2d phase path instead reshards the
	ring spectrum over m (GSPMD all-to-all) so the theta-upsample,
	quadrature and Legendre transpose run m-parallel."""
	theta = np.asarray(minfo.theta)
	# Theta-banded streaming for big single-chip analysis (the mirror of the
	# synthesis banding): the full-width ring rfft holds a
	# [nt, nphi/2 + 1] complex transient (6.4 GB at lmax 10000) ON TOP of
	# the eager _to_rings flip copy of the 3.2 GB input. Bands slice rows
	# from the ORIGINAL array inside jit (flip fused, no full copy) and
	# accumulate the narrow [nm, nt] phase spectrum into a donated buffer.
	if (mesh is None and weighted and weights is None and minfo.case == "2d"
			and len(theta) >= 64):
		flat2d_a = (not deriv) and arr.ndim == 2
		ncomp_eff = 2 if deriv else (1 if flat2d_a else arr.shape[-3])
		est = float(ncomp_eff)*len(theta)*(minfo.nphi//2 + 1) \
			*(8 if np.dtype(arr.dtype) == np.float32 else 16)
		if est > SYNTH_BAND_BYTES:
			a = _analysis_phase_banded(arr, ainfo, minfo, spin, deriv,
				flat2d_a, int(np.ceil(est/SYNTH_BAND_BYTES)))
			return a[..., 0, :] if flat2d_a else a
	d = _to_rings(arr, minfo)
	flat2d = (not deriv) and d.ndim == 2
	if flat2d: d = d[None]
	if mesh is not None:
		from .parallel import sht_dist
		row_axis = tuple(mesh.shape.keys())[0]
	if not weighted:
		d2 = alm2_pre(d, deriv)
		if mesh is not None:
			a = sht_dist.analysis_dist(d2, theta, None, mesh, ainfo.lmax,
				mmax=ainfo.mmax, phi0=_ring_phi0(minfo), spin=spin,
				deriv=deriv, row_axis=row_axis)
		else:
			a = sht.adjoint_synthesis(d2, theta, ainfo.lmax, mmax=ainfo.mmax,
				phi0=_ring_phi0(minfo), spin=spin, deriv=deriv)
		return a[..., 0, :] if flat2d else a
	if weights is not None:
		w = weights[::-1] if minfo.flip[0] else weights
		d2 = alm2_pre(d, deriv)
		if mesh is not None:
			a = sht_dist.analysis_dist(d2, theta, jnp.asarray(w), mesh,
				ainfo.lmax, mmax=ainfo.mmax, phi0=_ring_phi0(minfo),
				spin=spin, deriv=deriv, row_axis=row_axis)
		else:
			a = sht.analysis(d2, theta, ainfo.lmax, jnp.asarray(w), mmax=ainfo.mmax,
				phi0=_ring_phi0(minfo), spin=spin, deriv=deriv)
		return a[..., 0, :] if flat2d else a
	if minfo.case == "2d":
		d2 = alm2_pre(d, deriv)
		def phase_path(d2):
			ny = d2.shape[-2]
			nphi = d2.shape[-1]
			ntfull = ny + minfo.ypad[0] + minfo.ypad[1]
			need = 2*ainfo.lmax + 1
			# go to per-ring phase coefficients FIRST: theta-domain work
			# (padding, exact upsampling, quadrature) then runs on the narrow
			# m-spectrum [nm] instead of full-width rings [nphi], and the ring
			# FFT happens exactly once
			if mesh is not None:
				# shard the ring FFT over rows; everything after the reshard
				# below is elementwise (or a theta-local FFT) in m
				from jax.sharding import NamedSharding, PartitionSpec as _P
				d2 = jax.lax.with_sharding_constraint(d2, NamedSharding(mesh,
					_P(*([None]*(d2.ndim-2) + [row_axis, None]))))
			F = sht.ring_analysis(d2, _ring_phi0(minfo), ainfo.mmax+1)
			if mesh is not None:
				# one all-to-all: ring-sharded [.., nm, nt] -> m-sharded; the
				# theta upsample (torus FFT along nt), quadrature weighting and
				# Legendre transpose then run fully m-parallel under GSPMD
				m_axis = tuple(mesh.shape.keys())[-1]
				F = jax.lax.with_sharding_constraint(F, NamedSharding(mesh,
					_P(*([None]*(F.ndim-2) + [m_axis, None]))))
			if minfo.ypad[0] or minfo.ypad[1]:
				pad = [(0, 0)]*(F.ndim-1) + [(int(minfo.ypad[0]), int(minfo.ypad[1]))]
				F = jnp.pad(F, pad)
			if need > ntfull:
				# round the upsampled ring count to a 2-3-5-7-smooth size: the
				# torus FFT length is 2*ntu, and an unlucky ntu (e.g. 2 lmax + 3
				# containing a large prime) forces a Bluestein FFT that is ~10x
				# slower at lmax 5000
				from . import fft as enfft
				ntu = enfft.fft_len(need + 2, direction="above")
				spins = [1, 0] if deriv else _comp_spins(spin, d2.shape[-3])
				F = sht.resample_theta_phase(F, minfo.variant, ntu, spins)
				ntfull = ntu
			theta_f = sht.ring_theta(minfo.variant, ntfull)
			w = jnp.asarray(sht.ring_weights(minfo.variant, ntfull))
			a = sht.analysis_phase(F, theta_f, ainfo.lmax, w, nphi,
				mmax=ainfo.mmax, spin=spin, deriv=deriv)
			if mesh is not None:
				a = jax.lax.with_sharding_constraint(a,
					NamedSharding(mesh, _P()))
			return a
		# under a mesh the constraints need GSPMD's padding-tolerant
		# partitioner, which only runs under jit (eager resharding requires
		# divisible axis sizes); nested jit is fine when already tracing
		if mesh is not None:
			mkey = (minfo.case, minfo.variant, tuple(minfo.ypad),
				tuple(minfo.flip), minfo.nphi,
				np.asarray(minfo.theta).tobytes())
			a = utils.cached_jit(("curvedsky._analysis_phase_path", mkey,
				ainfo.lmax, ainfo.mmax, spin, deriv, mesh, d2.shape,
				str(d2.dtype)), lambda: phase_path)(d2)
		else:
			a = phase_path(d2)
	else:
		th = np.asarray(minfo.theta)
		if len(th) > 1:
			edges = np.concatenate([[max(th[0]-(th[1]-th[0])/2, 0)],
				(th[1:]+th[:-1])/2, [min(th[-1]+(th[-1]-th[-2])/2, np.pi)]])
		else:
			edges = np.array([0, np.pi])
		w = np.abs(np.cos(edges[:-1]) - np.cos(edges[1:]))
		d2 = alm2_pre(d, deriv)
		if mesh is not None:
			a = sht_dist.analysis_dist(d2, theta, jnp.asarray(w), mesh,
				ainfo.lmax, mmax=ainfo.mmax, phi0=_ring_phi0(minfo),
				spin=spin, deriv=deriv, row_axis=row_axis)
		else:
			a = sht.analysis(d2, theta, ainfo.lmax, jnp.asarray(w), mmax=ainfo.mmax,
				phi0=_ring_phi0(minfo), spin=spin, deriv=deriv)
	return a[..., 0, :] if flat2d else a

def alm2_pre(d, deriv):
	"""For deriv transforms, convert (ddec, dra) map back to (dtheta, dphi)."""
	if not deriv: return d
	return jnp.stack([-d[..., 0, :, :], d[..., 1, :, :]], -3)

def _adjoint_map2alm(alm, map, ainfo, minfo, spin, deriv):
	"""map2alm with adjoint=True: read alm, write map. Implemented as the
	exact linear transpose of the analysis path (including theta upsampling
	and padding), so <map2alm(m), a> == <m, map2alm_adjoint(a)>."""
	if ainfo is None: ainfo = alm_info(nalm=np.asarray(alm).shape[-1])
	arr = jnp.asarray(map)
	spin_t = tuple(np.atleast_1d(spin))
	fun = lambda x: _analysis_linear(x, ainfo, minfo, spin_t, deriv, True, None)
	# transpose over the real and imaginary parts separately (the analysis is
	# real-linear, represented as C-linear + conjugate-linear parts; since
	# inputs are real maps, transpose of [re, im] outputs works directly)
	example = jnp.zeros(arr.shape, arr.dtype)
	fun_ri = lambda x: (lambda a: (a.real, a.imag))(fun(x))
	# vjp instead of linear_transpose: the analysis contains lax.scans that
	# jax.linear_transpose's partial-eval cannot structurally transpose
	# (ValAccum leak); vjp of a linear map gives the identical transpose
	_, vjp_fun = jax.vjp(fun_ri, example)
	a = utils.to_device(alm)
	d = vjp_fun((a.real.astype(arr.dtype), a.imag.astype(arr.dtype)))[0]
	map.data = d if enmap._is_jax(map.data) else np.asarray(d)
	return map


# ---------------------------------------------------------------------------
# General positions: torus-NUFFT synthesis (reference alm2map_raw_general:993
# over ducc synthesis_general)
# ---------------------------------------------------------------------------
def _locinfo_loc(map, locinfo=None):
	if locinfo is not None: return locinfo.loc if hasattr(locinfo, "loc") else locinfo
	pos = np.asarray(enmap.posmap(map.shape, map.wcs, safe=False))
	loc = np.stack([np.pi/2 - pos[0].reshape(-1), pos[1].reshape(-1) % (2*np.pi)], -1)
	return loc

def calc_locinfo(shape, wcs, bsize=1000):
	"""Per-pixel (colat, ra) info for the general method."""
	pos = np.asarray(enmap.posmap(shape, wcs, safe=False))
	loc = np.stack([np.pi/2 - pos[0].reshape(-1), pos[1].reshape(-1) % (2*np.pi)], -1)
	return Bunch(loc=loc, mask=np.ones(shape[-2:], bool).reshape(-1))

class SynthesisPlan:
	"""Plan-based general-position synthesis (the TPU counterpart of ducc's
	incremental u2nu behind reference curvedsky.alm2map_raw_general:993):
	precompute the deconvolved, oversampled fine torus grid of an alm set
	ONCE, then evaluate at arbitrary (colat, phi) positions repeatedly with
	only per-point work. Banded lensing builds one plan and evaluates it per
	dec band, so the global synthesis + torus FFTs are not repeated."""
	def __init__(self, alm, lmax=None, mmax=None, spin=(0, 2), deriv=False,
			epsilon=None):
		alm = utils.to_device(alm)
		if lmax is None: lmax = nalm2lmax(alm.shape[-1])
		if mmax is None: mmax = lmax
		rdt = np.float32 if alm.dtype == np.complex64 else np.float64
		if epsilon is None: epsilon = 1e-6 if rdt == np.float32 else 1e-10
		# Torus grid: theta_k = k * 2pi/Nt covering the whole circle.
		Nt = 2*enfft.fft_len(lmax + 2, "above")
		Np = 2*enfft.fft_len(max(mmax + 1, 2), "above")  # even: the torus mirror needs an exact pi shift in phi
		thetas = np.arange(Nt//2 + 1)*2*np.pi/Nt  # [0, pi] inclusive-ish
		alm2 = alm if (deriv or alm.ndim > 1) else alm[None]
		ncomp = 2 if deriv else alm2.shape[-2]
		spins = _comp_spins(spin, ncomp) if not deriv else [1, 0]
		# one jitted program for synthesis + torus extension + spectrum: on
		# remote-compile TPU runtimes, eager glue ops are each a fresh compile
		def _make_build():
			def _build(a):
				grid = sht.synthesis(a, thetas, Np, phi0=0.0, lmax=lmax,
					mmax=mmax, spin=spin if not deriv else (0,), deriv=deriv,
					map_dtype=rdt)
				# [..., ncomp, Nt//2+1, Np] -> torus [..., ncomp, Nt, Np]
				mirror = grid[..., 1:(Nt - (Nt//2 + 1)) + 1, :][..., ::-1, :]
				mirror = jnp.roll(mirror, Np//2, axis=-1)
				sgn = jnp.asarray([(-1.0)**s for s in spins], rdt)[:, None, None]
				torus = jnp.concatenate([grid, sgn*mirror], -2)
				flat = torus.reshape((-1, Nt, Np))
				return jnp.fft.fftn(flat, axes=(-2, -1))/(Nt*Np)
			return _build
		fgrid = utils.cached_jit(("SynthesisPlan._build", Nt, Np, lmax, mmax,
			tuple(np.atleast_1d(spin)), deriv, tuple(spins), rdt,
			alm2.shape, str(alm2.dtype)), _make_build)(alm2)
		# the plan holds the deconvolved fine grid on device
		self.uplan = enfft.u2nu_plan(fgrid, axes=(-2, -1), periodicity=2*np.pi,
			epsilon=epsilon, complex=False)
		self.pre = (alm2.shape[:-1] if deriv else alm2.shape[:-2]) + (ncomp,)
		self.rdt = rdt
		self._flat1d = alm.ndim == 1 and not deriv

	def eval(self, loc):
		"""loc [npt, 2] = (colat, phi) in radians -> values [..., npt]."""
		loc = jnp.asarray(loc)
		out = self.uplan.eval(jnp.stack([loc[:, 0], loc[:, 1]], 0))
		out = out.reshape(self.pre + (loc.shape[0],)).astype(self.rdt)
		if self._flat1d: out = out[..., 0, :]
		return out


def synthesis_general(alm, loc, lmax=None, mmax=None, spin=(0, 2), deriv=False,
		epsilon=None):
	"""Evaluate the spherical harmonic expansion at arbitrary (colat, phi)
	positions loc[npt, 2], via synthesis on a fine iso-lat grid extended to
	the torus followed by a 2D NUFFT interpolation. For repeated evaluation
	of the same alm at different point sets, build a SynthesisPlan."""
	return SynthesisPlan(alm, lmax=lmax, mmax=mmax, spin=spin, deriv=deriv,
		epsilon=epsilon).eval(loc)

def _comp_spins(spin, ncomp):
	res = []
	for s, i1, i2 in sht._spin_blocks(spin, ncomp):
		res += [s]*(i2-i1)
	return res

def alm2map_pos(alm, pos=None, loc=None, ainfo=None, map=None, spin=[0, 2],
		deriv=False, copy=False, verbose=False, adjoint=False, nthread=None,
		epsilon=None, map_shape=None, map_wcs=None):
	"""Like alm2map, but at arbitrary positions (reference curvedsky.alm2map_pos:174).
	pos: [{dec,ra},...]; loc: [...,{colat,ra}]."""
	alm = utils.to_device(alm)
	if ainfo is None: ainfo = alm_info(nalm=alm.shape[-1])
	if loc is None:
		pos = np.asarray(pos)
		loc = np.stack([np.pi/2 - pos[0].reshape(-1), pos[1].reshape(-1) % (2*np.pi)], -1)
		oshape = pos.shape[1:]
	else:
		loc = np.asarray(loc).reshape(-1, 2)
		oshape = np.asarray(loc).shape[:-1]
	vals = synthesis_general(alm, loc, lmax=ainfo.lmax, mmax=ainfo.mmax,
		spin=spin, deriv=deriv, epsilon=epsilon)
	if deriv:
		# (dtheta, dphi) -> (ddec, dra)
		vals = jnp.stack([-vals[..., 0, :], vals[..., 1, :]], -2)
	if map is not None:
		d = vals.reshape(vals.shape[:-1] + tuple(map.shape[-2:]))
		map.data = d if enmap._is_jax(map.data) else np.asarray(d)
		return map
	return np.asarray(vals).reshape(vals.shape[:-1] + tuple(oshape))

def adjoint_synthesis_general(vals, loc, lmax=None, mmax=None, spin=(0, 2),
		epsilon=None):
	"""Exact transpose of synthesis_general: vals[..., npt] at loc[npt,2]
	-> alm (with the real-map m>0 degeneracy factor, like adjoint_synthesis).
	Implemented via jax.linear_transpose of the forward NUFFT synthesis, so
	it is adjoint to machine precision."""
	vals = jnp.asarray(vals)
	if mmax is None: mmax = lmax
	n = sht.nalm(lmax, mmax)
	pre = vals.shape[:-1]
	rdt = vals.dtype
	def fwd(ar, ai):
		alm_c = jax.lax.complex(ar, ai)
		return synthesis_general(alm_c, loc, lmax=lmax, mmax=mmax, spin=spin,
			epsilon=epsilon)
	zr = jnp.zeros(pre + (n,), rdt)
	# the forward is linear, so vjp == transpose (vjp is more robust to the
	# NUFFT internals than jax.linear_transpose)
	_, vjp_fn = jax.vjp(fwd, zr, zr)
	gr, gi = vjp_fn(vals)
	return jax.lax.complex(gr, gi)


def _map2alm_general(map, alm, ainfo, spin, deriv, weighted, epsilon):
	"""General-geometry analysis: transpose of the NUFFT synthesis with
	per-pixel area weights when weighted=True."""
	arr = jnp.asarray(map)
	lmax, mmax = ainfo.lmax, ainfo.mmax
	if deriv:
		raise NotImplementedError("deriv=True not supported for the general method analysis")
	loc = _locinfo_loc(map)
	if weighted:
		w = np.asarray(enmap.pixsizemap(map.shape, map.wcs)).reshape(-1)
		arrw = arr.reshape(arr.shape[:-2] + (-1,))*jnp.asarray(w, arr.dtype)
	else:
		arrw = arr.reshape(arr.shape[:-2] + (-1,))
	a = adjoint_synthesis_general(arrw, jnp.asarray(loc), lmax=lmax, mmax=mmax,
		spin=tuple(np.atleast_1d(spin)), epsilon=epsilon)
	if weighted:
		a = sht._undo_m_degeneracy(a, lmax, mmax)
	if isinstance(alm, np.ndarray) and not isinstance(a, jax.core.Tracer):
		alm[...] = np.asarray(a.reshape(alm.shape))
		return alm
	return a


# ---------------------------------------------------------------------------
# 1D profile transforms (reference curvedsky.py:511-620)
# ---------------------------------------------------------------------------
def _legendre_p(lmax, x):
	"""P_l(x) for l=0..lmax at points x, via the stable m=0 recurrence.
	Returns [nl, nx] (host-side numpy)."""
	x = np.asarray(x, np.float64)
	res = np.empty((lmax+1,) + x.shape)
	res[0] = 1
	if lmax >= 1: res[1] = x
	for l in range(2, lmax+1):
		res[l] = ((2*l-1)*x*res[l-1] - (l-1)*res[l-2])/l
	return res

def profile2harm(br, r, lmax=None, oversample=1, left=None, right=None):
	"""Radial profile br(r) (r in radians from center) -> harmonic transform
	b_l = 2 pi int br(theta) P_l(cos theta) sin theta dtheta
	(reference curvedsky.profile2harm:511). Fast: uses Gauss-Legendre
	quadrature in cos(theta), exact for band-limited profiles."""
	br = np.asarray(br); r = np.asarray(r)
	if lmax is None: lmax = 2*len(r)
	nq = int((lmax + 1)*max(oversample, 1))
	x, w = np.polynomial.legendre.leggauss(nq)
	theta = np.arccos(x)
	bq = np.interp(theta, r, br, left=left if left is not None else br[0],
		right=right if right is not None else 0)
	P = _legendre_p(lmax, x)
	return 2*np.pi*np.einsum("q,lq,q->l", w, P, bq)

def harm2profile(bl, r):
	"""Inverse of profile2harm: b(theta) = sum_l (2l+1)/(4 pi) b_l P_l(cos)
	(reference curvedsky.harm2profile:543)."""
	bl = np.asarray(bl)
	lmax = bl.shape[-1]-1
	P = _legendre_p(lmax, np.cos(np.asarray(r)))
	l = np.arange(lmax+1)
	return np.einsum("...l,l,lq->...q", bl, (2*l+1)/(4*np.pi), P)

def prof2alm(profile, dir=[0, np.pi/2], spin=0, geometry="CC", nthread=None,
		norot=False):
	"""Alm of a 1d equispaced (CC-grid) theta-profile[..., n] of the given
	spin, oriented along dir=[ra, dec] (reference curvedsky.prof2alm:558).
	A spin-s azimuthally symmetric field has power at m=0 only, so this is
	an mmax=0 analysis followed by an alm rotation to dir."""
	profile = np.asarray(profile, np.float64)
	n = profile.shape[-1]
	lmax = get_ducc_maxlmax(geometry.upper(), n)
	theta = sht.ring_theta(geometry.upper() if geometry.upper() in ["CC", "F1", "F2"] else "CC", n)
	w = sht.ring_weights("CC" if geometry.upper() == "CC" else geometry.upper(), n)
	ncomp = 1 if spin == 0 else 2
	prof = profile.reshape((-1, ncomp, n, 1)) if profile.ndim > 1 else \
		profile.reshape((1, 1, n, 1))
	outs = []
	for sub in prof:
		a0 = sht.analysis(jnp.asarray(sub), theta, lmax, jnp.asarray(w),
			mmax=0, spin=[spin])
		a0 = np.asarray(utils.from_device(a0))     # [ncomp, lmax+1]
		full = np.zeros(a0.shape[:-1] + (sht.nalm(lmax),), a0.dtype)
		full[..., :lmax+1] = a0
		outs.append(full)
	alm = np.concatenate(outs, 0)
	alm = alm.reshape(profile.shape[:-1] + (sht.nalm(lmax),)) if profile.ndim > 1 \
		else alm.reshape(-1, sht.nalm(lmax))[0]
	if not norot:
		ra, dec = dir[0], dir[1]
		if not (np.abs(dec - np.pi/2) < 1e-12 and np.abs(ra) < 1e-12):
			alm = rotate_alm(alm, 0.0, np.pi/2 - dec, ra)
	return alm

def prof2alm_radial(br, r, lmax=None, pos=None, ainfo=None):
	"""Alm of an azimuthally symmetric radial profile br(r) centered at pos
	[dec,ra] (north pole by default)."""
	bl = profile2harm(br, r, lmax=lmax)
	lmax = len(bl)-1
	if ainfo is None: ainfo = alm_info(lmax=lmax)
	alm = np.zeros(ainfo.nelem, np.complex128)
	l = np.arange(lmax+1)
	alm[ainfo.lm2ind(l, 0*l)] = bl*np.sqrt((2*l+1)/(4*np.pi))
	if pos is not None:
		alm = rotate_alm(alm, 0.0, np.pi/2-pos[0], pos[1], ainfo=ainfo)
	return alm


# ---------------------------------------------------------------------------
# alm rotation (reference curvedsky.rotate_alm:717 over ducc)
# ---------------------------------------------------------------------------
def rotate_alm(alm, psi, theta, phi, ainfo=None, lmax=None, method="auto",
		nthread=None, inplace=False):
	"""Rotate alm by the zyz Euler angles (psi, theta, phi): the result is
	the harmonic rep of the map rotated by R_z(phi) R_y(theta) R_z(psi).
	Implemented by evaluating the original field at the pulled-back
	positions of an exact quadrature grid (NUFFT general synthesis), then
	re-analysing -- O(2 SHTs), no explicit Wigner-d matrices."""
	alm = utils.to_device(alm)
	if ainfo is None: ainfo = alm_info(nalm=alm.shape[-1], lmax=lmax)
	lmax = ainfo.lmax
	# z-rotations are diagonal: a_lm -> a_lm e^{i m angle}
	def zrot(a, ang):
		# (Rz(ang) f)(th, ph) = f(th, ph - ang) => a_lm -> a_lm e^{-i m ang}
		if ang == 0: return a
		m = np.arange(ainfo.mmax+1)
		phase = np.exp(-1j*m*ang)
		rect = ainfo._rect(a)*utils.to_device(phase)[None, :]
		return ainfo._unrect(rect).astype(a.dtype)
	# R = Rz(phi) Ry(theta) Rz(psi): apply Rz(psi) first (diagonal), then
	# Ry(theta) via regridding, then Rz(phi) (diagonal).
	a = zrot(alm, psi)
	if theta != 0:
		nt = 2*lmax + 3
		thq = sht.ring_theta("F1", nt)
		wq = sht.ring_weights("F1", nt)
		nphi = 2*(lmax+1)
		phis = 2*np.pi*np.arange(nphi)/nphi
		TH, PH = np.meshgrid(thq, phis, indexing="ij")
		# pull back grid points through Ry(theta): n_old = Ry(-theta) n_new
		ct, st = np.cos(TH), np.sin(TH)
		x, y, z = st*np.cos(PH), st*np.sin(PH), ct
		cb, sb = np.cos(theta), np.sin(theta)
		x2 = cb*x - sb*z
		z2 = sb*x + cb*z
		th_old = np.arccos(np.clip(z2, -1, 1))
		ph_old = np.arctan2(y, x2) % (2*np.pi)
		loc = np.stack([th_old.reshape(-1), ph_old.reshape(-1)], -1)
		vals = synthesis_general(a, jnp.asarray(loc), lmax=lmax, spin=(0,))
		grid = vals.reshape(vals.shape[:-1] + (nt, nphi))
		if grid.ndim == 2: grid = grid[None]
		a = sht.analysis(grid, jnp.asarray(thq), lmax, jnp.asarray(wq),
			mmax=ainfo.mmax, phi0=0.0, spin=(0,))
		if alm.ndim == 1: a = a[0]
		a = a.astype(alm.dtype)
	a = zrot(a, phi)
	return a


# ---------------------------------------------------------------------------
# HEALPix conveniences (reference curvedsky.alm2map_healpix:312,
# map2alm_healpix:353) -- implemented in reproject, re-exported here to match
# the reference's module layout.
# ---------------------------------------------------------------------------
def alm2map_healpix(alm, healmap=None, nside=None, spin=[0, 2], deriv=False,
		ainfo=None, method="ring", **kw):
	from . import reproject
	return reproject.alm2map_healpix(alm, healmap=healmap, nside=nside,
		spin=spin, deriv=deriv, ainfo=ainfo, method=method)

def map2alm_healpix(healmap, alm=None, lmax=None, spin=[0, 2], niter=0,
		ainfo=None, method="ring", **kw):
	from . import reproject
	return reproject.map2alm_healpix(healmap, alm=alm, lmax=lmax, spin=spin,
		niter=niter, ainfo=ainfo, method=method)

def get_ring_info(theta_or_shape, wcs=None):
	"""Ring structure of a cylindrical map or explicit colatitudes
	(reference curvedsky.get_ring_info:1170)."""
	if wcs is not None:
		minfo = analyse_geometry(theta_or_shape, wcs)
		theta = np.asarray(minfo.theta)
		nphi = np.full(len(theta), minfo.nphi, int)
		phi0 = np.full(len(theta), minfo.phi0)
	else:
		theta = np.asarray(theta_or_shape)
		nphi = None; phi0 = None
	return Bunch(theta=theta, nphi=nphi, phi0=phi0, nring=len(theta))

def get_ring_info_healpix(nside):
	"""Per-ring structure of a HEALPix RING map (reference :1192)."""
	from . import healpix
	info = healpix.ring_info(nside)
	return Bunch(theta=info["theta"], nphi=info["nphi"], phi0=info["phi0"],
		offsets=info["start"], nring=info["nring"])


# ---------------------------------------------------------------------------
# Mid-layer and helper API (reference curvedsky.py:756-1472): the reference
# exposes per-case entry points and ducc-buffer plumbing; here these are thin
# routers into the unified engine, provided for interface parity.
# ---------------------------------------------------------------------------
class ShapeError(ValueError): pass

def pad_spectrum(ps, lmax):
	"""Zero-extend a power spectrum to lmax (reference curvedsky.pad_spectrum)."""
	ps = np.asarray(ps)
	ops = np.zeros(ps.shape[:-1] + (lmax+1,), ps.dtype)
	n = min(ps.shape[-1], lmax+1)
	ops[..., :n] = ps[..., :n]
	return ops

def prepare_ps(ps, ainfo=None, lmax=None):
	"""Normalize a power spectrum to [ncomp,ncomp,nl] plus its alm_info
	(reference curvedsky.prepare_ps)."""
	from . import powspec
	ps = np.asarray(ps)
	if ainfo is None:
		if lmax is None: lmax = ps.shape[-1] - 1
		if lmax > ps.shape[-1] - 1: ps = pad_spectrum(ps, lmax)
		ainfo = alm_info(lmax)
	if ps.ndim == 1: wps = ps[None, None]
	elif ps.ndim == 2: wps = powspec.sym_expand(ps, scheme="diag")
	elif ps.ndim == 3: wps = ps
	else: raise ValueError("power spectrum must be [nl], [nspec,nl] or [ncomp,ncomp,nl]")
	return wps, ainfo

def npix2nside(npix):
	return utils.nint((npix/12)**0.5)

def prepare_healmap(healmap, nside=None, pre=(), dtype=np.float64):
	if healmap is not None: return healmap
	return np.zeros(pre + (12*nside**2,), dtype)

def fill_gauss(arr, bsize=65536):
	"""Fill an array with standard normal noise in place, blockwise
	(reference curvedsky.fill_gauss)."""
	rtype = np.zeros([0], arr.dtype).real.dtype
	flat = arr.reshape(-1).view(rtype)
	for i in range(0, flat.size, bsize):
		flat[i:i+bsize] = np.random.standard_normal(min(bsize, flat.size - i))

def rand_alm_healpy(ps, lmax=None, seed=None, dtype=np.complex128):
	"""healpy-convention random alms; routed to our own generator
	(reference curvedsky.rand_alm_healpy)."""
	return rand_alm(ps, lmax=lmax, seed=seed, dtype=dtype, m_major=True)

def dangerous_dtype(dtype):
	return np.dtype(dtype).byteorder not in "=|"

def alm_complex2real(alm, ainfo=None):
	"""Repack complex alms into the real layout: m=0 real parts followed by
	sqrt(2)-scaled interleaved re/im for m>0 (reference
	curvedsky.alm_complex2real)."""
	alm = np.asarray(alm)
	dtype = utils.real_dtype(alm.dtype)
	if ainfo is None: ainfo = alm_info(nalm=alm.shape[-1])
	i = int(ainfo.mstart[1] + 1)
	return np.concatenate([alm[..., :i].real,
		2**0.5*np.ascontiguousarray(alm[..., i:]).view(dtype)], -1)

def alm_real2complex(ralm, ainfo=None):
	"""Inverse of alm_complex2real (reference curvedsky.alm_real2complex)."""
	ralm = np.asarray(ralm)
	ctype = utils.complex_dtype(ralm.dtype)
	if ainfo is None:
		lmax = utils.nint((ralm.shape[-1] - 1)**0.5) - 1
		ainfo = alm_info(lmax=lmax)
	i = int(ainfo.mstart[1] + 1)
	oalm = np.zeros(ralm.shape[:-1] + (ainfo.nelem,), ctype)
	oalm[..., :i] = ralm[..., :i]
	oalm[..., i:] = np.ascontiguousarray(ralm[..., i:]).view(ctype)/2**0.5
	return oalm

def flip2slice(flips):
	res = (Ellipsis,)
	for flip in flips:
		res = res + (slice(None, None, 1 - 2*int(flip)),)
	return res

def flip_geometry(shape, wcs, flips):
	return enmap.slice_geometry(shape, wcs, flip2slice(flips)[1:])

def flip_array(arr, flips):
	return arr[flip2slice(flips)]

def pad_geometry(shape, wcs, pad):
	pad = np.asarray(pad, int)
	h = int(pad[0, 0] + shape[-2] + pad[1, 0])
	w = int(pad[0, 1] + shape[-1] + pad[1, 1])
	wcs = wcs.deepcopy()
	wcs.wcs.crpix = np.asarray(wcs.wcs.crpix) + pad[0, ::-1]
	return shape[:-2] + (h, w), wcs

def map2buffer(map, flip, pad, obuf=False):
	"""Flip/pad a map into a ring-friendly buffer (reference
	curvedsky.map2buffer)."""
	pad = np.asarray(pad, int)
	geo = flip_geometry(map.shape, map.wcs, flip)
	geo = pad_geometry(*geo, pad)
	buf = enmap.zeros(geo[0], geo[1], map.dtype)
	if not obuf:
		data = jnp.asarray(buf.data).at[..., pad[0, 0]:geo[0][-2]-pad[1, 0],
			pad[0, 1]:geo[0][-1]-pad[1, 1]].set(jnp.asarray(flip_array(map, flip)))
		buf = enmap.ndmap(data, buf.wcs)
	return buf

def buffer2map(map, flip, pad):
	"""Inverse of map2buffer (reference curvedsky.buffer2map)."""
	pad = np.asarray(pad, int)
	map = map[..., pad[0, 0]:map.shape[-2]-pad[1, 0],
		pad[0, 1]:map.shape[-1]-pad[1, 1]]
	return flip_array(map, flip)

def apply_minfo_theta_lim(minfo, theta_min=None, theta_max=None):
	"""Restrict a ring info to a theta range (reference
	curvedsky.apply_minfo_theta_lim)."""
	if theta_min is None and theta_max is None: return minfo
	mask = np.full(len(minfo.theta), True, bool)
	if theta_min is not None: mask &= minfo.theta >= theta_min
	if theta_max is not None: mask &= minfo.theta <= theta_max
	res = minfo.copy()
	for key in ["theta", "nphi", "phi0", "offsets"]:
		if key in res: res[key] = res[key][mask]
	return res

def get_ring_info_radial(r):
	"""Ring info with one pixel per ring, for mmax=0 transforms
	(reference curvedsky.get_ring_info_radial)."""
	theta = np.asarray(r, np.float64)
	n = len(theta)
	return Bunch(theta=theta, nphi=np.ones(n, np.uint64),
		phi0=np.zeros(n), offsets=np.arange(n, dtype=np.uint64),
		stride=np.ones(n, np.int32), npix=n, nrow=n)

def get_ducc_geo(wcs, shape=None, tol=1e-6):
	"""Ring-grid classification of a wcs: bunch(name in CC/F1/MW/MWflip/DH/F2,
	phi0) or None (reference curvedsky.get_ducc_geo). Routed through our
	analyse_geometry."""
	if shape is None: shape = (2, 2)
	minfo = analyse_geometry(shape, wcs, tol=tol)
	if minfo.case != "2d" or minfo.variant is None: return None
	name = {"CC": "CC", "F1": "F1", "F2": "F2", "DH": "DH",
		"MW": "MW", "MWFLIP": "MWflip"}.get(str(minfo.variant).upper())
	if name is None: return None
	phi0 = _ring_phi0(minfo) if hasattr(minfo, "phi0") or True else 0.0
	return Bunch(name=name, phi0=float(np.asarray(phi0)))

def get_ducc_maxlmax(name, ny):
	"""Maximum exactly-supported lmax for each ring layout (reference
	curvedsky.get_ducc_maxlmax)."""
	if name == "CC": return ny - 2
	if name == "DH": return (ny - 2)//2
	if name == "F2": return (ny - 1)//2
	return ny - 1

def jacobi_inverse(forward, approx_backward, y, niter=0):
	"""Recover x from y = forward(x) by Jacobi iteration (reference
	curvedsky.jacobi_inverse)."""
	x = approx_backward(y)
	for i in range(niter):
		x = x - approx_backward(forward(x) - y)
	return x

def minres_inverse(forward, approx_backward, y, epsilon=1e-6, maxiter=100,
		zip=None, unzip=None, verbose=False):
	"""Maximum-likelihood inverse of y = forward(x) via Minres on the normal
	equations (reference curvedsky.minres_inverse)."""
	if zip is None: zip = lambda x: np.asarray(x).reshape(-1)
	if unzip is None:
		shape_box = {}
		def _unzip(v):
			return v.reshape(shape_box["shape"])
		x0 = approx_backward(y)
		shape_box["shape"] = np.asarray(x0).shape
		unzip = _unzip
	b = zip(np.asarray(approx_backward(y)))
	def A(v):
		return zip(np.asarray(approx_backward(forward(unzip(np.asarray(v))))))
	solver = utils.Minres(A, b)
	while solver.err > epsilon and solver.i < maxiter:
		solver.step()
		if verbose: print("minres %4d %15.7e" % (solver.i, solver.err))
	return unzip(np.asarray(solver.x))

def _force_method(kw, method):
	kw = dict(kw); kw["method"] = method
	return kw

def alm2map_2d(alm, map, ainfo=None, minfo=None, spin=[0, 2], deriv=False,
		copy=False, verbose=False, adjoint=False, nthread=None, pix_tol=1e-6):
	"""Per-case alm2map entry point (reference curvedsky.alm2map_2d)."""
	return alm2map(alm, map, spin=spin, deriv=deriv, adjoint=adjoint,
		copy=copy, method="2d", ainfo=ainfo, verbose=verbose)

def alm2map_cyl(alm, map, ainfo=None, minfo=None, spin=[0, 2], deriv=False,
		copy=False, verbose=False, adjoint=False, nthread=None, pix_tol=1e-6):
	return alm2map(alm, map, spin=spin, deriv=deriv, adjoint=adjoint,
		copy=copy, method="cyl", ainfo=ainfo, verbose=verbose)

def alm2map_general(alm, map, ainfo=None, spin=[0, 2], deriv=False, copy=False,
		verbose=False, adjoint=False, nthread=None, locinfo=None, epsilon=None):
	return alm2map(alm, map, spin=spin, deriv=deriv, adjoint=adjoint,
		copy=copy, method="general", ainfo=ainfo, verbose=verbose)

def map2alm_2d(map, alm=None, ainfo=None, minfo=None, lmax=None, spin=[0, 2],
		deriv=False, copy=False, verbose=False, adjoint=False, nthread=None,
		pix_tol=1e-6):
	return map2alm(map, alm=alm, lmax=lmax, spin=spin, deriv=deriv,
		adjoint=adjoint, copy=copy, method="2d", ainfo=ainfo, verbose=verbose)

def map2alm_cyl(map, alm=None, ainfo=None, minfo=None, lmax=None, spin=[0, 2],
		weights=None, deriv=False, copy=False, verbose=False, adjoint=False,
		nthread=None, pix_tol=1e-6, niter=0):
	return map2alm(map, alm=alm, lmax=lmax, spin=spin, deriv=deriv,
		adjoint=adjoint, copy=copy, method="cyl", ainfo=ainfo,
		verbose=verbose, niter=niter, weights=weights)

def map2alm_general(map, alm=None, ainfo=None, minfo=None, lmax=None,
		spin=[0, 2], weights=None, deriv=False, copy=False, verbose=False,
		adjoint=False, nthread=None, locinfo=None, epsilon=None, niter=0):
	return map2alm(map, alm=alm, lmax=lmax, spin=spin, deriv=deriv,
		adjoint=adjoint, copy=copy, method="general", ainfo=ainfo,
		verbose=verbose, niter=niter)

def alm2map_raw_2d(alm, map, ainfo=None, spin=[0, 2], deriv=False, copy=False,
		verbose=False, adjoint=False, nthread=None):
	"""Raw engine call without case analysis (reference
	curvedsky.alm2map_raw_2d): the map must already be a full-sky CC/F1
	ring buffer in standard orientation."""
	return alm2map_2d(alm, map, ainfo=ainfo, spin=spin, deriv=deriv,
		copy=copy, adjoint=adjoint)

def alm2map_raw_cyl(alm, map, ainfo=None, minfo=None, spin=[0, 2], deriv=False,
		copy=False, verbose=False, adjoint=False, nthread=None):
	return alm2map_cyl(alm, map, ainfo=ainfo, spin=spin, deriv=deriv,
		copy=copy, adjoint=adjoint)

def alm2map_raw_general(alm, map, loc, ainfo=None, spin=[0, 2], deriv=False,
		copy=False, verbose=False, adjoint=False, nthread=None, epsilon=None):
	"""Pointwise synthesis at loc[{theta,phi},npix] (reference
	curvedsky.alm2map_raw_general)."""
	res = synthesis_general(alm, jnp.asarray(loc), spin=spin, deriv=deriv,
		ainfo=ainfo, epsilon=epsilon)
	if map is not None:
		map = enmap.samewcs(jnp.asarray(res).reshape(np.asarray(map).shape), map) \
			if hasattr(map, "wcs") else np.asarray(res).reshape(np.asarray(map).shape)
		return map
	return res

def map2alm_raw_2d(map, alm=None, ainfo=None, lmax=None, spin=[0, 2],
		deriv=False, copy=False, verbose=False, adjoint=False, nthread=None):
	return map2alm_2d(map, alm=alm, ainfo=ainfo, lmax=lmax, spin=spin,
		deriv=deriv, copy=copy, adjoint=adjoint)

def map2alm_raw_cyl(map, alm=None, ainfo=None, lmax=None, spin=[0, 2],
		weights=None, deriv=False, copy=False, verbose=False, adjoint=False,
		niter=0, nthread=None):
	return map2alm_cyl(map, alm=alm, ainfo=ainfo, lmax=lmax, spin=spin,
		weights=weights, deriv=deriv, copy=copy, adjoint=adjoint, niter=niter)

def map2alm_raw_general(map, loc, alm=None, ainfo=None, lmax=None, spin=[0, 2],
		weights=None, deriv=False, copy=False, verbose=False, adjoint=False,
		nthread=None, niter=0, epsilon=None):
	"""Adjoint-synthesis at explicit loc, with optional per-point weights and
	Jacobi refinement (reference curvedsky.map2alm_raw_general)."""
	vals = jnp.asarray(map).reshape(jnp.asarray(map).shape[:-2] + (-1,)) \
		if np.ndim(map) >= 2 else jnp.asarray(map)
	if weights is not None: vals = vals*jnp.asarray(weights)
	a = adjoint_synthesis_general(vals, jnp.asarray(loc), lmax=lmax,
		spin=spin, ainfo=ainfo, epsilon=epsilon)
	return a

def prepare_raw(alm, map, ainfo=None, lmax=None, deriv=False, verbose=False,
		nthread=None, pixdims=2, convert_alm=False):
	"""Infer/allocate the missing one of (alm, map) plus layout info
	(reference curvedsky.prepare_raw)."""
	if alm is None and map is None:
		raise ValueError("prepare_raw needs at least one of alm, map")
	if alm is not None:
		ainfo = ainfo or alm_info(nalm=np.asarray(alm).shape[-1], lmax=lmax)
	else:
		alm, ainfo = prepare_alm(None, ainfo, lmax=lmax,
			pre=np.asarray(map).shape[:-pixdims] if map is not None else ())
	return alm, map, ainfo
