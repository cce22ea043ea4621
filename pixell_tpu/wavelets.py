"""Wavelet transforms on the sphere / flat sky (reference pixell/wavelets.py).

Wavelet bases are smooth partitions of multipole space; the transform
synthesizes each filtered scale onto a geometry downgraded to that scale's
bandlimit (so coarse scales are cheap), producing an ndmaps container."""
from __future__ import annotations
import numpy as np
import jax.numpy as jnp
from . import enmap, uharm, multimap, utils, wcsutils


class Butterworth:
	"""Butterworth filter-bank basis (reference wavelets.Butterworth:15).
	Scales are logarithmically spaced with step q; sharpness alpha."""
	def __init__(self, step=2, shape=7, tol=1e-3, lmin=None, lmax=None):
		self.step, self.shape, self.tol = step, shape, tol
		self.lmin, self.lmax = lmin, lmax
	def with_bounds(self, lmin, lmax):
		return type(self)(step=self.step, shape=self.shape, tol=self.tol,
			lmin=lmin, lmax=lmax)
	@property
	def n(self):
		return int(np.ceil(np.log(self.lmax/max(self.lmin, 1))/np.log(self.step))) + 1
	def _knee(self, i):
		return self.lmin*self.step**i
	def kernel(self, i, l):
		l = np.asarray(l, float)
		def butter(l, knee):
			with np.errstate(divide="ignore"):
				return 1/(1 + (l/np.maximum(knee, 0.5))**self.shape)
		hi = butter(l, self._knee(i))
		lo = butter(l, self._knee(i-1)) if i > 0 else np.ones_like(l)*0 + (l <= 0) + 0*l
		if i == 0:
			prof2 = 1 - butter(l, self._knee(0))*0 - (1 - butter(l, self._knee(0)))
			prof2 = butter(l, self._knee(0))
			return np.sqrt(np.maximum(prof2, 0))
		prof2 = butter(l, self._knee(i)) - butter(l, self._knee(i-1))
		# last scale absorbs everything above
		if i == self.n-1:
			prof2 = 1 - butter(l, self._knee(i-1))
		return np.sqrt(np.maximum(prof2, 0))
	def __call__(self, i, l): return self.kernel(i, l)
	@property
	def lmaxs(self):
		"""Effective bandlimit of each scale (reference Butterworth._finalize:45:
		the l where the kernel falls to tol)."""
		n = self.n
		shp = getattr(self, "shape", 7)
		lm = np.round(self.lmin*(1/max(self.tol, 1e-12) - 1)
			**(np.log(self.step)/shp)*self.step**(np.arange(n) + 0.5)).astype(int)
		lm = np.minimum(lm, self.lmax)
		lm[-1] = self.lmax
		return lm
	def get_variance_basis(self):
		"""Basis describing how white noise variance transforms under this
		wavelet basis (reference Butterworth.get_variance_basis:37)."""
		return VarButter(step=self.step, shape=self.shape, tol=self.tol,
			lmin=self.lmin, lmax=self.lmax)

class ButterTrim(Butterworth):
	"""Butterworth basis trimmed to compact support (the reference default,
	wavelets.ButterTrim:48): tiny tails are cut so each scale has a hard
	bandlimit, making the per-scale geometries small."""
	def kernel(self, i, l):
		prof = Butterworth.kernel(self, i, l)
		return np.where(prof**2 > self.tol, prof, 0.0)
	def lbounds(self, i):
		"""The [lmin,lmax] support of scale i."""
		l = np.arange(self.lmax+1)
		k = self.kernel(i, l)
		nz = np.where(k > 0)[0]
		if len(nz) == 0: return (0, 0)
		return int(nz[0]), int(nz[-1])

class DigitalButterTrim(ButterTrim):
	"""ButterTrim with the smooth kernels approximated by a comb of top-hats,
	making the scales exactly orthogonal (reference wavelets.DigitalButterTrim:77).
	Profiles are 0/1 indicator functions whose cumulative sums track the smooth
	kernels."""
	def _lowpass(self, i, l):
		"""Trimmed Butterworth LOWPASS kernel (reference DigitalButterTrim.kernel:95;
		note the reference's .kernel is the lowpass, its __call__ the bandpass)."""
		l = np.asarray(l, float)
		with np.errstate(divide="ignore"):
			k = 1/(1 + (l/np.maximum(self._knee(i), 0.5))**self.shape)
		return trim_kernel(k, self.tol)
	def _profiles(self):
		if getattr(self, "_prof_cache", None) is None:
			l = np.arange(self.lmax)
			ks = [np.zeros(l.size)]
			for i in range(self.n - 1):
				ks.append(digitize(self._lowpass(i, l)))
			ks.append(np.full(l.size, 1.0))
			ks = np.sort(np.array(ks), 0)
			self._prof_cache = ks[1:] - ks[:-1]  # 0/1: no sqrt needed
		return self._prof_cache
	def kernel(self, i, l):
		prof = self._profiles()[i]
		li = np.clip(np.asarray(l).astype(int), 0, prof.size - 1)
		return prof[li]
	def __call__(self, i, l): return self.kernel(i, l)
	def get_variance_basis(self):
		raise NotImplementedError

class CosineNeedlet:
	"""Cosine-profile needlets (reference wavelets.CosineNeedlet:131):
	peaks at given lpeaks, cosine interpolation between neighbors."""
	def __init__(self, lpeaks=None, lmin=None, lmax=None):
		self.lpeaks = None if lpeaks is None else np.asarray(lpeaks)
		self.lmin, self.lmax = lmin, lmax
	def with_bounds(self, lmin, lmax):
		lpeaks = self.lpeaks
		if lpeaks is None:
			peaks = [lmin]
			while peaks[-1] < lmax:
				peaks.append(min(int(np.ceil(peaks[-1]*2)), lmax))
			lpeaks = np.array(peaks)
		return CosineNeedlet(lpeaks=lpeaks, lmin=lmin, lmax=lmax)
	@property
	def n(self): return len(self.lpeaks)
	def kernel(self, i, l):
		l = np.asarray(l, float)
		lp = self.lpeaks
		res = np.zeros_like(l)
		p = lp[i]
		if i > 0:
			lo = lp[i-1]
			m = (l >= lo) & (l < p)
			res[m] = np.cos(np.pi/2*(p - l[m])/(p - lo))
		res[l == p] = 1
		if i < self.n-1:
			hi = lp[i+1]
			m = (l > p) & (l <= hi)
			res[m] = np.cos(np.pi/2*(l[m] - p)/(hi - p))
		if i == 0:
			res[l <= p] = 1
		if i == self.n-1:
			res[l >= p] = 1
		return res
	def lbounds(self, i):
		lo = self.lpeaks[i-1] if i > 0 else 0
		hi = self.lpeaks[i+1] if i < self.n-1 else self.lmax
		return int(lo), int(hi)
	def __call__(self, i, l): return self.kernel(i, l)


OFFLOAD_BYTES = 1 << 32  # auto-offload wavelet maps to host above 4 GB total:
# the decomposition RESULT does not need to sit in HBM while further scales
# (or the reconstruction's analysis passes) run their multi-GB transients.
# Threshold history: 2 GB in round 4, when the gather-based transfer_alm
# spiked residency by ~1.6 GB of index arrays + scatter transients per top
# scale; the fold-based transfer removed that, and an lmax-10000 fullsky
# decomposition (2.7 GB set) now completes device-resident with room to
# spare -- and host offload costs ~40 s/GB each way through tunnel-attached
# runtimes, so offloading a set that fits is a large pure loss.


class WaveletTransform:
	"""Map -> set of wavelet-coefficient maps and back, each scale on a
	geometry downgraded to its bandlimit (reference wavelets.WaveletTransform:206)."""
	def __init__(self, uht_or_geo, basis=None, ores=None, mesh=None,
			offload=None):
		"""mesh: optional jax.sharding.Mesh. Every per-scale SHT runs
		multi-chip (rings sharded over the mesh's first axis; the analysis
		phase path reshards over m) -- the production fix for decompositions
		whose largest scale exceeds single-chip HBM (BASELINE config 5 at
		lmax 10000: the top scale is a full 20002x40004 synthesis).

		offload: keep the wavelet-coefficient maps on the HOST (numpy),
		uploading/fetching one scale at a time. None = auto: offload when
		the total wavelet-map bytes exceed OFFLOAD_BYTES and no mesh is
		given -- at lmax 10000 the resident wavelet set (~4.3 GB) on top of
		the top scale's analysis working set is what pushed a 16 GB chip
		over (round-4 config-5 OOM in wave2map)."""
		if isinstance(uht_or_geo, uharm.UHT):
			self.uht = uht_or_geo
			if mesh is not None: self.uht.mesh = mesh
		else:
			shape, wcs = uht_or_geo
			self.uht = uharm.UHT(shape, wcs, mesh=mesh)
		self.mesh = mesh
		self.offload = offload
		shape, wcs = self.uht.shape, self.uht.wcs
		if basis is None: basis = ButterTrim()
		lmax = self.uht.lmax
		lmin = max(int(np.ceil(np.pi/max(_patch_size(shape, wcs), 1e-10))), 1)
		if getattr(basis, "lmax", None) is None or getattr(basis, "lmin", None) is None:
			basis = basis.with_bounds(lmin, lmax)
		self.basis = basis
		self.geometries = []
		self.uhts = []
		ires = float(np.max(np.asarray(enmap.pixshapebounds(shape, wcs)))) \
			if self.uht.mode == "curved" else None
		for i in range(basis.n):
			lo, hi = basis.lbounds(i) if hasattr(basis, "lbounds") else (0, lmax)
			hi_eff = min(hi if hi > 0 else lmax, lmax)
			if self.uht.mode == "curved":
				# fresh minimal geometry at ~pi/lmax_scale, like the reference
				# (reference wavelets.py WaveletTransform.__init__: oress =
				# max(pi/basis.lmaxs, ires)): a scale bandlimited to hi needs
				# only ~hi+1 rings (analysis theta-upsamples spectrally). The
				# earlier power-of-2 DOWNGRADE of the input grid left scales
				# up to 4x oversampled -- at lmax 10000 that was a 7.5 GB
				# wavelet set (forcing host offload through a ~26 MB/s tunnel)
				# instead of ~1.1 GB that stays in HBM.
				# margin: pi/hi would give exactly hi rings and 2*hi columns,
				# one short of the nt >= hi+1 / nphi >= 2*hi+1 needed for the
				# analysis to be EXACT (the reference accepts %-level aliasing
				# there; we keep exactness for a few extra rows)
				ores = max(np.pi/(hi_eff + 4), ires)
				ogeo = make_wavelet_geometry_curved(shape, wcs, ores)
			else:
				ogeo = make_wavelet_geometry(shape, wcs, hi)
			self.geometries.append(ogeo)
			self.uhts.append(uharm.UHT(ogeo[0], ogeo[1], mode=self.uht.mode,
				lmax=hi_eff, mesh=mesh))
	@property
	def nlevel(self): return self.basis.n
	def _offload_now(self, map):
		"""Resolve the offload policy for this input's shape."""
		if self.offload is not None: return bool(self.offload)
		if self.mesh is not None: return False
		pre = int(np.prod(map.shape[:-2], dtype=np.int64)) if map.ndim > 2 else 1
		tot = sum(int(np.prod(g[0][-2:], dtype=np.int64)) for g in self.geometries)
		itemsize = np.dtype(getattr(map, "dtype", np.float32)).itemsize
		return pre*tot*itemsize > OFFLOAD_BYTES
	@property
	def shape(self): return self.uht.shape
	@property
	def wcs(self): return self.uht.wcs
	@property
	def geometry(self): return self.shape, self.wcs
	def get_ls(self, i):
		"""Multipoles for wavelet scale i: an enmap of |l| for flat mode, a 1d
		array for curved (reference WaveletTransform.get_ls:384)."""
		if self.uht.mode == "flat":
			u = self.uhts[i]
			return enmap.modlmap(u.shape, u.wcs)
		return self.uhts[i].l
	def get_variance_transform(self):
		"""WaveletTransform that maps white-noise VARIANCE maps the way this
		transform maps data (reference WaveletTransform.get_variance_transform:391)."""
		return WaveletTransform(self.uht, basis=self.basis.get_variance_basis())
	def map2wave(self, map, owave=None):
		"""Decompose map into wavelet maps (an ndmaps).

		Scales are computed in descending-bandlimit order (results returned
		in basis order): the largest scale's synthesis has the biggest
		transient, and running it first means it peaks before the other
		scale outputs accumulate -- at lmax 10000 that ordering is the
		difference between fitting in 16 GB HBM and OOMing."""
		harm = self.uht.map2harm(map, spin=0)
		offload = self._offload_now(map)
		outs = [None]*self.basis.n
		# curved mode: unfold the big alm to its rectangular [nl, nm] view
		# ONCE; each scale is then a static slice * l-profile + one fold to
		# the scale's (smaller) triangular layout. The previous per-scale
		# transfer_alm+hmul pair cost two full fold roundtrips per scale.
		rect = None
		if self.uht.mode == "curved" and self.uht.ainfo._is_tri() \
				and all(u.ainfo._is_tri() and u.ainfo.lmax <= self.uht.ainfo.lmax
					and u.ainfo.mmax <= self.uht.ainfo.mmax for u in self.uhts):
			rect = self.uht.ainfo._rect(utils.to_device(harm))
		for i in reversed(range(self.basis.n)):
			u = self.uhts[i]
			prof = self.basis.kernel(i, np.arange(u.lmax+1, dtype=float))
			if self.uht.mode == "curved":
				from . import curvedsky
				if rect is not None:
					L, M = u.ainfo.lmax+1, u.ainfo.mmax+1
					pf = jnp.asarray(np.asarray(prof, rect.real.dtype))
					sub = u.ainfo._unrect(rect[..., :L, :M]*pf[:L, None])
				else:
					sub = curvedsky.transfer_alm(self.uht.ainfo, utils.to_device(harm), u.ainfo)
					sub = u.hmul(prof, sub)
				m = u.harm2map(sub, spin=0)
				sub = None
			else:
				# flat: filter in 2D fourier space then resample
				l2 = np.asarray(enmap.modlmap(self.uht.shape, self.uht.wcs))
				prof_full = self.basis.kernel(i, l2)
				filt = enmap.samewcs(jnp.asarray(harm)*jnp.asarray(prof_full), map)
				full = enmap.harm2map(filt, spin=[0]).real
				m = full.project(u.shape, u.wcs, order=3) if u.shape != self.uht.shape \
					else full
			if offload:
				# fetch to host and release the device buffer before the
				# next (or any accumulated) scale allocates
				m = enmap.ndmap(np.asarray(m), m.wcs)
			elif np.prod(m.shape, dtype=np.int64)*4 >= 1 << 26:
				# fence big scales: dispatch is async, so without it every
				# scale's eager slice/filter intermediates are enqueued at
				# once and their buffers pile up in device memory
				utils.fence()
			outs[i] = m
		return multimap.ndmaps(outs)
	def wave2map(self, wave, omap=None):
		"""Adjoint-inverse: reassemble the map from wavelet maps (device- or
		host-resident; host scales are uploaded one at a time).

		Curved mode accumulates scales in the rectangular [nl, nm] view --
		each scale contributes one dynamic-update-slice add at its own
		bandlimit -- and folds to the triangular layout ONCE at the end,
		instead of zero-padding every scale's alm to the full layout."""
		total = None
		rect_ok = self.uht.mode == "curved" and self.uht.ainfo._is_tri() \
			and all(u.ainfo._is_tri() and u.ainfo.lmax <= self.uht.ainfo.lmax
				and u.ainfo.mmax <= self.uht.ainfo.mmax for u in self.uhts)
		for i in range(self.basis.n):
			u = self.uhts[i]
			m = wave.maps[i]
			prof = self.basis.kernel(i, np.arange(u.lmax+1, dtype=float))
			if self.uht.mode == "curved" and rect_ok:
				sub = u.map2harm(m, spin=0)
				srect = u.ainfo._rect(utils.to_device(sub))
				pf = jnp.asarray(np.asarray(prof, srect.real.dtype))
				srect = srect*pf[:srect.shape[-2], None]
				if total is None:
					total = utils.czeros(srect.shape[:-2]
						+ (self.uht.ainfo.lmax+1, self.uht.ainfo.mmax+1), srect.dtype)
				L, M = srect.shape[-2:]
				total = total.at[..., :L, :M].add(srect)
				if np.prod(m.shape[-2:], dtype=np.int64)*4 >= 1 << 26:
					utils.fence()  # see map2wave: bound async transients
				continue
			elif self.uht.mode == "curved":
				from . import curvedsky
				sub = u.map2harm(m, spin=0)
				sub = u.hmul(prof, sub)
				big = curvedsky.transfer_alm(u.ainfo, utils.to_device(sub), self.uht.ainfo)
			else:
				h = enmap.map2harm(m.project(self.uht.shape, self.uht.wcs, order=3)
					if m.shape[-2:] != tuple(self.uht.shape) else m, spin=[0])
				l2 = np.asarray(enmap.modlmap(self.uht.shape, self.uht.wcs))
				big = jnp.asarray(h)*jnp.asarray(self.basis.kernel(i, l2))
			total = big if total is None else total + big
		if rect_ok and total is not None:
			total = self.uht.ainfo._unrect(total)
		res = self.uht.harm2map(total, spin=0)
		if isinstance(res, enmap.ndmap): return res.real if np.iscomplexobj(np.asarray(res)) else res
		return res


class HaarTransform:
	"""Simple Haar wavelets via down/upgrades (reference wavelets.HaarTransform:419)."""
	def __init__(self, nlevel=None):
		self.nlevel = nlevel
	def map2wave(self, map):
		nlevel = self.nlevel
		if nlevel is None:
			nlevel = int(np.log2(min(map.shape[-2:]))) - 1
		outs = []
		cur = map
		for i in range(nlevel):
			down = enmap.downgrade(cur, 2)
			up = enmap.upgrade(down, 2, oshape=cur.shape)
			outs.append(cur - up)
			cur = down
		outs.append(cur)
		return multimap.ndmaps(outs)
	def wave2map(self, wave):
		cur = wave.maps[-1]
		for det in wave.maps[-2::-1]:
			cur = enmap.upgrade(cur, 2, oshape=det.shape) + det
		return cur


def _patch_size(shape, wcs):
	ext = enmap.extent(shape, wcs)
	return float(np.max(np.asarray(ext)))

def make_wavelet_geometry(shape, wcs, lmax_scale, margin=4):
	"""Geometry with just enough resolution for multipoles up to lmax_scale
	(reference wavelets.make_wavelet_geometry_flat/curved:463,472)."""
	if lmax_scale <= 0: return tuple(shape[-2:]), wcs
	ires = min(abs(wcs.wcs.cdelt[0]), abs(wcs.wcs.cdelt[1]))*utils.degree
	ores = np.pi/(lmax_scale + margin)
	factor = max(int(np.floor(ores/ires)), 1)
	# use power-of-two-ish downgrades so geometries stay compatible, and only
	# factors that evenly divide the pixel counts so fullsky F1/CC grids stay
	# quadrature-exact after downgrading (fejer1's design property)
	factor = 2**int(np.log2(factor)) if factor > 1 else 1
	while factor > 1 and (shape[-2] % factor or shape[-1] % factor):
		factor //= 2
	if factor == 1: return tuple(shape[-2:]), wcs
	oshape, owcs = enmap.downgrade_geometry(shape, wcs, factor)
	return tuple(oshape[-2:]), owcs


class AdriSD:
	"""Scale-discrete wavelet basis a la optweight (reference wavelets.AdriSD:109):
	kernels built from a smooth interpolating spline between dyadic scales,
	squaring to one. Implemented as cosine-needlets on dyadic peaks, which
	share the key properties (compact support, partition of unity)."""
	def __init__(self, lamb=2.0, lmin=None, lmax=None):
		self.lamb = lamb
		self.lmin, self.lmax = lmin, lmax
		self._cn = None
	def with_bounds(self, lmin, lmax):
		res = AdriSD(self.lamb, lmin, lmax)
		peaks = [max(lmin, 1)]
		while peaks[-1] < lmax:
			peaks.append(min(int(np.ceil(peaks[-1]*self.lamb)), lmax))
		res._cn = CosineNeedlet(lpeaks=np.array(peaks), lmin=lmin, lmax=lmax)
		return res
	@property
	def n(self): return self._cn.n
	@property
	def lmaxs(self):
		return np.array([self.lbounds(i)[1] for i in range(self.n)])
	def kernel(self, i, l): return self._cn.kernel(i, l)
	def lbounds(self, i): return self._cn.lbounds(i)
	def __call__(self, i, l): return self.kernel(i, l)
	def get_variance_basis(self):
		raise NotImplementedError


class VarButter:
	"""Variance basis for Butterworth wavelets (reference wavelets.VarButter:163):
	describes how white-noise VARIANCE maps through each wavelet scale. The
	kernel is |F|^2 convolved with itself in real space, computed with a radial
	Hankel transform: F2(l) = H[ H^-1[F](r)^2 ](l)."""
	def __init__(self, step=2, shape=7, tol=1e-3, lmin=None, lmax=None):
		self.step = step; self.shape = shape; self.tol = tol
		self.lmin = lmin; self.lmax = lmax
		self.basis = None
		if self.lmin is not None and self.lmax is not None:
			self._finalize()
	@property
	def n(self): return self.basis.n
	@property
	def lmaxs(self): return self.basis.lmaxs
	def with_bounds(self, lmin, lmax):
		return VarButter(step=self.step, shape=self.shape, tol=self.tol,
			lmin=lmin, lmax=lmax)
	def __call__(self, i, l):
		return np.interp(np.asarray(l, float), self.l, self.kernels[i])
	def kernel(self, i, l): return self(i, l)
	def lbounds(self, i):
		return self.basis.lbounds(i) if hasattr(self.basis, "lbounds") \
			else (0, int(self.basis.lmaxs[i]))
	def _kernel_helper(self, i, rft):
		if i < self.basis.n - 1:
			F = self.basis(i, rft.l)
		else:
			# bound the final scale at lmax to avoid summing absent power
			kernel = 1/(1 + (rft.l/self.basis.lmax)
				**(self.basis.shape/np.log(self.basis.step)))
			prev = 1/(1 + (rft.l/(self.basis.lmin*self.basis.step**(i - 0.5)))
				**(self.basis.shape/np.log(self.basis.step)))
			F = np.sqrt(np.maximum(kernel - prev, 0))
		F2 = rft.real2harm(rft.harm2real(F)**2)
		F2 = rft.unpad(F2)
		return F2
	def _finalize(self):
		self.basis = Butterworth(step=self.step, shape=self.shape, tol=self.tol,
			lmin=self.lmin, lmax=self.lmax)
		rft = utils.RadialFourierTransform()
		self.kernels = [self._kernel_helper(i, rft) for i in range(self.n)]
		self.l = rft.unpad(rft.l)


def trim_kernel(a, tol):
	"""(reference wavelets.trim_kernel)."""
	return np.clip(np.asarray(a)*(1 + 2*tol) - tol, 0, 1)

def digitize(a):
	"""Approximate a smooth 0..1 array with an on/off array whose cumulative
	sum tracks it (reference wavelets.digitize)."""
	f = np.round(np.cumsum(np.asarray(a)))
	return np.concatenate([[1], (f[1:] != f[:-1]).astype(int)])

def make_wavelet_geometry_flat(ishape, iwcs, ires, ores, margin=4):
	"""Downgraded flat geometry for a wavelet scale (reference
	wavelets.make_wavelet_geometry_flat)."""
	oshape = np.ceil(np.array(ishape[-2:])*ires/ores).astype(int) + margin
	oshape = np.minimum(oshape, ishape[-2:])
	owcs = wcsutils.scale(iwcs, oshape[-2:]/np.array(ishape[-2:]),
		rowmajor=True, corner=True)
	return tuple(oshape), owcs

def make_wavelet_geometry_curved(ishape, iwcs, ores, minres=2*np.pi/180*2):
	"""Fullsky-compatible geometry at resolution ores covering the input
	patch (reference wavelets.make_wavelet_geometry_curved). The ring count
	is rounded up to the next 2357-smooth column count: a large-prime nphi
	sends every ring FFT down XLA's Bluestein path (~50x slower and a
	whole-batch chirp workspace)."""
	from . import fft as enfft
	N = max(int(np.ceil(np.pi/ores)), int(np.ceil(np.pi/minres)))
	while enfft.fft_len(2*N, "above") != 2*N:
		N += 1
	res = np.pi/N
	box = np.array(enmap.corners(ishape, iwcs))
	box[:, 0] = np.clip(box[:, 0], -np.pi/2, np.pi/2)
	box[1, 1] = box[0, 1] + np.clip(box[1, 1] - box[0, 1], -2*np.pi, 2*np.pi)
	tshape, twcs = enmap.fullsky_geometry(res=res)
	pbox = np.asarray(enmap.skybox2pixbox(tshape, twcs, box))
	pbox[np.argmax(pbox[:, 0]), 0] += 1
	pbox = utils.nint(pbox)
	# y ascending; x kept at its full (possibly wrapped) width, anchored at
	# the rewound left edge. Clamp y to the sphere: a fullsky input's corners
	# land on pixel EDGES of the target grid, and the +1 above (which exists
	# to include the boundary row of interior patches) can then push one row
	# past the pole -- a phantom off-sphere ring that silently breaks the
	# scale's analysis quadrature (banker's rounding made this intermittent:
	# 45.5 -> 46 but 54.5 -> 54).
	y1 = max(int(min(pbox[:, 0])), 0)
	y2 = min(int(max(pbox[:, 0])), int(tshape[-2]))
	# width from the sky box itself (pixbox x coords may wrap)
	wx = min(int(utils.nint(abs(box[1, 1] - box[0, 1])/(2*np.pi)*tshape[-1])),
		tshape[-1])
	# a full-wrap input's corner ra difference rewinds to 0; detect via cdelt
	if wx == 0 and abs(ishape[-1]*iwcs.wcs.cdelt[0]) >= 360 - 1e-6:
		wx = tshape[-1]
	x1 = int(utils.rewind(min(pbox[:, 1]), ref=tshape[-1]//2, period=tshape[-1]))
	return enmap.slice_geometry(tshape, twcs,
		(slice(y1, y2), slice(x1, x1 + wx)), nowrap=True)
