"""Unified harmonic transforms: one interface over flat-sky FFTs and
curved-sky SHTs (reference pixell/uharm.py)."""
from __future__ import annotations
import numpy as np
import jax.numpy as jnp
from . import enmap, curvedsky, utils, wcsutils


class UHT:
	"""Unified Harmonic Transform: wraps either 2D Fourier analysis ("flat")
	or spherical harmonic analysis ("curved") behind one interface, chosen
	automatically from the map distortion (reference uharm.UHT:8)."""
	def __init__(self, shape, wcs, mode="auto", lmax=None, max_distortion=0.1,
			tweak=False, mesh=None):
		"""mesh: optional jax.sharding.Mesh. In curved mode every transform
		dispatches through the multi-chip SHT (rings sharded over the mesh's
		first axis, see curvedsky.alm2map(mesh=)); flat mode ignores it (a
		single 2D FFT is not worth sharding)."""
		self.shape, self.wcs = tuple(shape[-2:]), wcs
		self.mesh = mesh
		if mode == "auto":
			dist = estimate_distortion(shape, wcs)
			mode = "flat" if dist <= max_distortion else "curved"
		self.mode = mode
		self.area = float(enmap.area(self.shape, wcs))
		self.fsky = self.area/(4*np.pi)
		if mode == "flat":
			self.l = np.asarray(enmap.modlmap(shape, wcs))
			self.lmax = int(np.max(self.l)) if lmax is None else lmax
			# modes per unit power for sums (reference uharm.py:78-79)
			self.nper = 1/self.fsky
			self.ntot = self.nper*self.shape[-2]*self.shape[-1]
		else:
			if lmax is None:
				lmax = min(curvedsky.get_lmax_from_map(Dummy(shape, wcs)), 2*10**4)
			self.lmax = lmax
			self.l = np.arange(lmax+1, dtype=float)
			self.ainfo = curvedsky.alm_info(lmax=lmax)
			self.nper = 2*np.arange(lmax+1) + 1
			self.ntot = int(np.sum(self.nper))
	@property
	def npix(self): return int(np.prod(self.shape[-2:]))
	@property
	def nharm(self):
		return self.npix if self.mode == "flat" else self.ainfo.nelem
	def map2harm(self, map, spin=0):
		if self.mode == "flat":
			return enmap.map2harm(map, spin=np.atleast_1d(spin), normalize="phys")
		return curvedsky.map2alm(map, ainfo=self.ainfo, lmax=self.lmax,
			spin=np.atleast_1d(spin), mesh=self.mesh)
	def harm2map(self, harm, spin=0):
		if self.mode == "flat":
			return enmap.harm2map(enmap.samewcs(jnp.asarray(harm), _aswcs(harm, self)), spin=np.atleast_1d(spin), normalize="phys").real
		omap = enmap.zeros(np.shape(harm)[:-1] + self.shape, self.wcs)
		return curvedsky.alm2map(utils.to_device(harm), omap, ainfo=self.ainfo,
			spin=np.atleast_1d(spin), mesh=self.mesh)
	def map2harm_adjoint(self, harm, spin=0):
		if self.mode == "flat":
			return enmap.map2harm_adjoint(enmap.samewcs(jnp.asarray(harm), _aswcs(harm, self)), spin=np.atleast_1d(spin), normalize="phys")
		omap = enmap.zeros(np.shape(harm)[:-1] + self.shape, self.wcs)
		return curvedsky.map2alm(omap, alm=utils.to_device(harm), adjoint=True,
			ainfo=self.ainfo, spin=np.atleast_1d(spin))
	def harm2map_adjoint(self, map, spin=0):
		if self.mode == "flat":
			return enmap.harm2map_adjoint(map, spin=np.atleast_1d(spin), normalize="phys")
		return curvedsky.alm2map_adjoint(map, ainfo=self.ainfo, spin=np.atleast_1d(spin))
	def quad_weights(self):
		"""Quadrature weights per pixel."""
		if self.mode == "flat":
			return enmap.pixsizemap(self.shape, self.wcs, broadcastable=True)
		w = curvedsky.quad_weights(self.shape, self.wcs)
		return enmap.ndmap(np.asarray(w)[:, None], self.wcs)
	def rprof2hprof(self, br, r):
		"""Radial profile br(r) -> harmonic profile (reference uharm.py:127)."""
		if self.mode == "flat":
			return profile2harm_flat_2d(br, r, self.shape, self.wcs)
		return curvedsky.profile2harm(br, r, lmax=self.lmax)
	def hprof2rprof(self, harm, r):
		"""Harmonic profile -> radial profile at radii r (reference
		uharm.UHT.hprof2rprof:133)."""
		if self.mode == "flat":
			return harm2profile_flat_2d(np.asarray(harm) + 0j, r)
		return curvedsky.harm2profile(np.asarray(harm), r)
	def hprof2harm(self, hprof):
		"""Expand an l-profile onto the full harmonic layout (per-(l,m) for
		curved, identity for flat; reference uharm.UHT.hprof2harm:147)."""
		hprof = np.asarray(hprof)
		if self.mode == "flat":
			return hprof.copy()
		ls = self.ainfo.get_map()[:, 0]
		return hprof[..., ls]
	def mean_hprof(self, hprof):
		"""Mean of an l-profile over all modes (reference uharm.UHT.mean_hprof:190)."""
		hprof = np.asarray(hprof)
		if self.mode == "flat":
			return np.sum(hprof*self.nper, (-2, -1))/self.ntot
		return np.sum(hprof*self.nper, -1)/self.ntot
	def lprof2hprof(self, lprof):
		"""1D l-profile -> the internal harmonic representation."""
		lprof = np.asarray(lprof)
		if self.mode == "flat":
			l = np.minimum(self.l.astype(int), lprof.shape[-1]-1)
			return enmap.ndmap(lprof[..., l], self.wcs)
		res = np.zeros(lprof.shape[:-1] + (self.lmax+1,))
		n = min(lprof.shape[-1], self.lmax+1)
		res[..., :n] = lprof[..., :n]
		return res
	def hmul(self, hprof, harm, inplace=False):
		"""Multiply a harmonic object by an l-profile in the internal rep."""
		if self.mode == "flat":
			return enmap.samewcs(jnp.asarray(hprof)*jnp.asarray(harm), harm)
		hprof = np.asarray(hprof)
		if hprof.ndim == 1:
			return curvedsky.almxfl(utils.to_device(harm), hprof, ainfo=self.ainfo)
		return curvedsky.lmul(utils.to_device(harm), jnp.asarray(hprof), ainfo=self.ainfo)
	def hprof_rpow(self, hprof, pow):
		"""Raise an l-profile to a power in REAL space: transform to a radial
		profile, apply the power, transform back (reference uharm.hprof_rpow:191)."""
		from . import curvedsky
		hprof = np.asarray(hprof)
		if self.mode == "flat":
			# 2D fourier beam profile -> real-space beam b(x) -> power -> back,
			# with the physical-units scalings (b = IFFT(B)/pixarea)
			pa = enmap.pixsize(self.shape, self.wcs)
			m = enmap.ifft(enmap.ndmap(jnp.asarray(hprof), self.wcs), normalize=True).real
			b = jnp.asarray(m)/(pa*np.sqrt(np.prod(self.shape[-2:])))
			bp = jnp.sign(b)*jnp.abs(b)**pow
			return enmap.fft(enmap.ndmap(bp, self.wcs), normalize=False).real*pa
		lmax = hprof.shape[-1]-1
		theta = np.linspace(0, np.pi, 4*lmax+4)
		br = curvedsky.harm2profile(hprof, theta)
		brp = np.sign(br)*np.abs(br)**pow
		return curvedsky.profile2harm(brp, theta, lmax=lmax)
	def hrand(self, hprof, seed=None):
		"""Random realization with harmonic-space spectrum hprof."""
		if self.mode == "flat":
			noise = enmap.rand_gauss_harm(self.shape, self.wcs, seed=seed)
			return enmap.samewcs(jnp.sqrt(jnp.maximum(jnp.asarray(hprof), 0))*jnp.asarray(noise), noise)
		return jnp.asarray(curvedsky.rand_alm(np.asarray(hprof), lmax=self.lmax, seed=seed))
	def harm2powspec(self, harm, harm2=None, patch=False):
		"""Power spectrum of a harmonic object."""
		if self.mode == "flat":
			h2 = harm if harm2 is None else harm2
			return enmap.samewcs((jnp.asarray(harm)*jnp.conj(jnp.asarray(h2))).real, harm)
		return curvedsky.alm2cl(jnp.asarray(harm),
			None if harm2 is None else jnp.asarray(harm2), ainfo=self.ainfo)
	def sum_hprof(self, hprof):
		"""Integral of an l-profile over all modes."""
		hprof = np.asarray(hprof)
		if self.mode == "flat":
			# sum over fourier modes: int h d^2l/(2pi)^2 * 4pi (so that the
			# caller's /(4pi) yields the flat-sky mode integral)
			area = self.npix*enmap.pixsize(self.shape, self.wcs)
			return hprof.sum()*4*np.pi/area
		l = np.arange(hprof.shape[-1])
		return np.sum(hprof*(2*l+1))/(4*np.pi)
	def lmap(self):
		if self.mode == "flat": return enmap.modlmap(self.shape, self.wcs)
		return self.l

class Dummy:
	def __init__(self, shape, wcs): self.shape, self.wcs = shape, wcs


def estimate_distortion(shape, wcs):
	"""Max relative pixel-scale variation over the map (reference uharm.py:272)."""
	if wcsutils.is_plain(wcs): return 0.0
	dec1, dec2 = np.sort(np.asarray(enmap.corners(shape, wcs))[:, 0])
	dec1 = max(dec1, -np.pi/2); dec2 = min(dec2, np.pi/2)
	c1, c2 = np.cos(dec1), np.cos(dec2)
	cmax, cmin = max(c1, c2), min(c1, c2)
	if dec1 <= 0 <= dec2: cmax = 1.0
	if cmin <= 0: return np.inf
	return cmax/cmin - 1

def profile2harm_flat_2d(br, r, shape, wcs):
	"""Radial real-space profile -> 2D harmonic profile for a flat map
	(reference uharm.profile2harm_flat_2d:230): hankel-transform via
	RadialFourierTransform would be ideal; here we paint and fft."""
	rmap = np.asarray(enmap.modrmap(shape, wcs))
	prof = np.interp(rmap, np.asarray(r), np.asarray(br), right=0)
	# center the beam on pixel (0,0) (cyclically) so B(l) is phase-free
	cy = int(np.unravel_index(rmap.argmin(), rmap.shape)[0])
	cx = int(np.unravel_index(rmap.argmin(), rmap.shape)[1])
	prof = np.roll(np.roll(prof, -cy, 0), -cx, 1)
	m = enmap.ndmap(jnp.asarray(prof), wcs)
	f = enmap.fft(m, normalize=False).real*enmap.pixsize(shape, wcs)
	return enmap.samewcs(f, m)

def harm2profile_flat_2d(hprof, r):
	"""2D fourier-space profile -> radial real-space profile at radii r
	(reference uharm.harm2profile_flat_2d:246): inverse-fft the 2D profile
	and bin radially."""
	import jax.numpy as jnp
	from . import enmap
	m = enmap.ifft(hprof, normalize=False).real
	pa = enmap.pixsize(hprof.shape, hprof.wcs)
	npix = np.prod(hprof.shape[-2:])
	b = np.asarray(m)/npix/pa  # IFFT_norm / pixarea: physical real-space beam
	rmap = np.asarray(enmap.modrmap(hprof.shape, hprof.wcs))
	cy, cx = np.unravel_index(rmap.argmin(), rmap.shape)
	b = np.roll(np.roll(b, -cy, -2), -cx, -1)
	rmap = np.roll(np.roll(rmap, -cy, -2), -cx, -1)
	order = np.argsort(rmap.reshape(-1))
	rs = rmap.reshape(-1)[order]
	bs = b.reshape(b.shape[:-2] + (-1,))[..., order]
	return np.interp(np.asarray(r), rs, bs if bs.ndim == 1 else bs[0])

def _aswcs(harm, uht):
	if isinstance(harm, enmap.ndmap): return harm
	return enmap.ndmap(jnp.asarray(harm), uht.wcs)


def res2lmax(res):
	"""lmax needed to represent spatial scale res in radians
	(reference uharm.res2lmax)."""
	return utils.nint(np.pi/res)

def beam2res(br, r):
	"""Map resolution appropriate for a beam profile (reference
	uharm.beam2res): a third of its fwhm."""
	br = np.asarray(br); r = np.asarray(r)
	fwhm = 2*r[np.where(br >= br[0]*0.5)[0][-1]]
	return fwhm/3

def beam2rmax(br, r, tol=1e-5, return_index=False):
	"""Radius beyond which the beam is negligible (reference
	uharm.beam2rmax)."""
	br = np.asarray(br); r = np.asarray(r)
	imax = np.where(br >= br[0]*tol)[0][-1]
	return (r[imax], imax) if return_index else r[imax]

def profile2harm_flat(br, r, oversample=2, pad_factor=2):
	"""Flat-sky approximation to curvedsky.profile2harm for a 1d profile
	(reference uharm.profile2harm_flat)."""
	res = beam2res(br, r)
	rmax = beam2rmax(br, r)*pad_factor
	n = 2*utils.nint(rmax/res*oversample) + 1
	shape, wcs = enmap.geometry(pos=np.array([0, 0]), res=res/oversample,
		shape=(n, n), proj="car")
	lbeam_2d = profile2harm_flat_2d(br, r, shape, wcs)
	bl_tmp, l_tmp = enmap.lbin(lbeam_2d)
	lmax = res2lmax(res)
	l = np.arange(lmax + 1)
	return np.interp(l, np.asarray(l_tmp), np.asarray(bl_tmp))
