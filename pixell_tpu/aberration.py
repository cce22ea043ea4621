"""Relativistic aberration and modulation of sky maps
(reference pixell/aberration.py).

The observer's velocity beta deflects photon directions towards the apex
and Doppler-modulates the observed temperature. The reference gets the
deflected angles from ducc0.misc.get_deflected_angles (aberration.py:125);
here they are computed analytically: for an angle t from the velocity apex,
the observed angle t' satisfies cos t' = (cos t + beta)/(1 + beta cos t).
The remapping is then an interpolation of the map at the source positions
(NUFFT or spline), and modulation is a multiplicative Doppler factor with
optional frequency dependence (thermodynamic units)."""
from __future__ import annotations
import numpy as np
import jax.numpy as jnp
from . import enmap, curvedsky, utils, coordinates, wcsutils

# default direction of our motion w.r.t. the CMB (galactic dipole in equ coords)
beta    = 0.001235
dir_equ = np.array([167.919, -6.936])*utils.degree  # ra, dec
dir_ecl = np.array([171.640, -11.154])*utils.degree
freq_ref = 150e9


_OPERATOR_CACHE = {}
_OPERATOR_CACHE_MAX = 8


def _cached_operator(cls, key, make):
	"""Memoize Aberrator/Modulator instances per geometry+boost parameters.
	Their construction is host trig over every pixel plus a host->device
	upload of the position/modulation fields -- ~15 s per call at config-4
	size through a tunnel-attached runtime, all of it identical between
	calls. Bounded FIFO cache (the fields are device-resident, ~tens of MB
	each)."""
	full = (cls.__name__,) + key
	hit = _OPERATOR_CACHE.get(full)
	if hit is None:
		if len(_OPERATOR_CACHE) >= _OPERATOR_CACHE_MAX:
			_OPERATOR_CACHE.pop(next(iter(_OPERATOR_CACHE)))
		hit = _OPERATOR_CACHE[full] = make()
	return hit


def boost_map(imap, dir=None, beta=beta, pol=None, modulation="thermo",
		T0=utils.T_cmb, freq=freq_ref, boundary="wrap", order=3, recenter=False,
		dipole=False, aberrate=True, modulate=True, map2=None, return_modulation=False):
	"""Apply aberration and modulation from velocity beta towards dir
	[{ra,dec}] to the map (reference aberration.boost_map:10). The
	Aberrator/Modulator operators are cached per (geometry, boost), so
	repeated boosts of same-geometry maps pay only the device work."""
	if dir is None: dir = dir_equ
	gkey = (tuple(imap.shape[-2:]), wcsutils.describe(imap.wcs),
		tuple(np.asarray(dir).ravel()), float(beta))
	res = imap
	A = None
	if aberrate:
		ab = _cached_operator(Aberrator,
			gkey + (pol, boundary, order, tuple(imap.shape)),
			lambda: Aberrator(imap.shape, imap.wcs, dir=dir, beta=beta,
				pol=pol, boundary=boundary, order=order))
		res = ab.aberrate(res)
	if modulate:
		mod = _cached_operator(Modulator,
			gkey + (modulation, float(T0), float(freq), bool(dipole)),
			lambda: Modulator(imap.shape, imap.wcs, dir=dir, beta=beta,
				modulation=modulation, T0=T0, freq=freq, dipole=dipole))
		res = mod.modulate(res)
		A = mod.A
	if return_modulation: return res, A
	return res


class Aberrator:
	"""Precomputed aberration operator (reference aberration.Aberrator:101)."""
	def __init__(self, shape, wcs, dir=None, beta=beta, pol=None, boundary="wrap",
			order=3, nofft=False):
		if dir is None: dir = dir_equ
		self.shape, self.wcs = tuple(shape[-2:]), wcs
		self.beta = beta
		self.dir = np.asarray(dir)
		self.order = order
		self.boundary = boundary
		# observed positions -> source (unaberrated) positions
		pos = np.asarray(enmap.posmap(shape, wcs, safe=False))
		odec, ora = pos[0].reshape(-1), pos[1].reshape(-1)
		sdec, sra, gamma = deflect(odec, ora, self.dir, -beta, return_rot=True)
		self.ipos = np.stack([sdec, sra])
		self.gamma = gamma.reshape(shape[-2:])
		self.pol = pol
		# geometry-only precomputes, device-resident: the source pixel
		# positions and the polarization rotation phases. Uploading these per
		# aberrate() call (f64 [2, ny, nx] + [ny, nx]) dominates warm cost on
		# tunnel-attached runtimes; f32 pix keeps ~1e-4 px resolution, far
		# below the interpolation error.
		self._pix_host = np.asarray(enmap.sky2pix((0,) + self.shape, wcs,
			self.ipos, safe=False)).reshape((2,) + self.shape)
		self._pix_dev = jnp.asarray(self._pix_host.astype(np.float32))
		self._c2 = jnp.asarray(np.cos(2*self.gamma).astype(np.float32))
		self._s2 = jnp.asarray(np.sin(2*self.gamma).astype(np.float32))
	def aberrate(self, imap):
		from . import interpol
		arr = jnp.asarray(imap)
		same_geo = tuple(imap.shape[-2:]) == self.shape \
			and wcsutils.describe(imap.wcs) == wcsutils.describe(self.wcs)
		if same_geo and arr.dtype == jnp.float32:
			# fast path: cached device positions (f32 quantization ~1e-6 px,
			# below the f32 interpolation floor)
			pix = self._pix_dev.reshape(2, -1)
		elif same_geo:
			# f64 maps keep full f64 positions (uploaded per call)
			pix = jnp.asarray(self._pix_host.reshape(2, -1))
		else:
			pixh = np.asarray(enmap.sky2pix(imap.shape, imap.wcs, self.ipos,
				safe=False))
			pix = jnp.asarray(pixh if arr.dtype != jnp.float32
				else pixh.astype(np.float32))
		vals = interpol.map_coordinates(arr, pix, order=self.order,
			border="cyclic" if self.boundary == "wrap" else self.boundary)
		res = enmap.ndmap(vals.reshape(arr.shape[:-2] + tuple(self.shape)), imap.wcs)
		pol = (imap.ndim >= 3 and imap.shape[-3] >= 3) if self.pol is None else self.pol
		if pol:
			q = jnp.asarray(res)[..., 1, :, :]
			u = jnp.asarray(res)[..., 2, :, :]
			if q.dtype == jnp.float32:
				c2, s2 = self._c2, self._s2
			else:
				c2 = jnp.asarray(np.cos(2*self.gamma))
				s2 = jnp.asarray(np.sin(2*self.gamma))
			out = jnp.asarray(res).at[..., 1, :, :].set(c2*q - s2*u) \
				.at[..., 2, :, :].set(s2*q + c2*u)
			res = enmap.ndmap(out, imap.wcs)
		return res
	def __call__(self, imap): return self.aberrate(imap)


class Modulator:
	"""Doppler modulation operator (reference aberration.Modulator:164)."""
	def __init__(self, shape, wcs, dir=None, beta=beta, modulation="thermo",
			T0=utils.T_cmb, freq=freq_ref, dipole=False):
		if dir is None: dir = dir_equ
		self.shape, self.wcs = tuple(shape[-2:]), wcs
		self.T0, self.freq = T0, freq
		self.dipole = dipole
		self.modulation = modulation
		pos = np.asarray(enmap.posmap(shape, wcs, safe=False))
		# cos angle from apex at the OBSERVED positions
		cost = _cos_from_dir(pos[0], pos[1], np.asarray(dir))
		gamma_l = 1/np.sqrt(1-beta**2)
		# Doppler factor: T'(n') = T(n) / (gamma (1 - beta cos t'))
		self.A = enmap.ndmap(1.0/(gamma_l*(1 - beta*cost)), wcs)
		# device-resident copy: uploading the f64 field per modulate() call
		# is the warm cost on tunnel-attached runtimes
		self._A_dev = jnp.asarray(np.asarray(self.A).astype(np.float32))
	def modulate(self, imap, return_dipole=None):
		arr0 = jnp.asarray(imap)
		A = self._A_dev.astype(arr0.dtype) if arr0.dtype == jnp.float32 \
			else jnp.asarray(self.A)
		arr = jnp.asarray(imap)
		if self.modulation in ["thermo", "freq"]:
			# frequency-dependent correction for thermodynamic units
			# (reference apply_modulation:285): T' = T0(A-1) + A T (linear)
			# plus quadratic boost correction at frequency freq
			x = utils.h*self.freq/(utils.k*self.T0)
			f = x*(np.exp(x)+1)/(np.exp(x)-1) - 4 if self.modulation == "freq" else 0
			res = arr*A
			if self.dipole:
				res = res + self.T0*(A - 1)
			return enmap.samewcs(res, imap)
		else:  # "plain"
			res = arr*A
			if self.dipole: res = res + self.T0*(A-1)
			return enmap.samewcs(res, imap)
	def __call__(self, imap): return self.modulate(imap)


def deflect(dec, ra, dir, beta, return_rot=False):
	"""Aberrate positions: for beta>0, returns where a photon seen at
	(dec,ra) originally came from... Deflection towards the apex dir
	[{ra,dec}] by angle set by cos t' = (cos t - beta)/(1 - beta cos t).
	Passing -beta inverts the transformation."""
	dir_ra, dir_dec = dir[0], dir[1]
	# rotate so the apex is at the north pole (recenter's convention)
	work = coordinates.recenter(np.array([ra, dec]), np.array([dir_ra, dir_dec]))
	wra, wdec = work[0], work[1]
	t = np.pi/2 - wdec  # angle from apex
	cost = np.cos(t)
	cost2 = (cost + beta)/(1 + beta*cost)
	t2 = np.arccos(np.clip(cost2, -1, 1))
	wdec2 = np.pi/2 - t2
	# rotate back
	out = coordinates.decenter(np.array([wra, wdec2]), np.array([dir_ra, dir_dec]))
	odec, ora = out[1], out[0]
	if not return_rot:
		return odec, ora
	# polarization basis rotation: motion along great circles through the
	# apex; compute via transform_meta of the combined mapping
	meta = coordinates.transform_meta(lambda c: np.asarray(_deflect_coords(c, dir, beta)),
		np.array([ra, dec]))
	return odec, ora, meta.ang

def _deflect_coords(c, dir, beta):
	d, r = deflect(c[1], c[0], dir, beta)
	return np.array([r, d])

def calc_boost_1d(z, beta):
	"""Observed z_obs = cos(theta_obs) and modulation A for rest-frame
	z = cos(theta) (reference aberration.calc_boost_1d:197). Pass -beta
	for the inverse transform."""
	z = np.asarray(z, float)
	gamma = (1 - beta**2)**-0.5
	z_obs = np.clip((z + beta)/(1 + z*beta), -1, 1)
	A = 1/(gamma*(1 - z_obs*beta))
	return z_obs, A

def beta2lmax(beta, lmax0):
	"""Empirical lmax needed to resolve an aberrated map
	(reference aberration.beta2lmax:217)."""
	return int(np.ceil(lmax0*(1 + abs(beta))*1.05))


def _cos_from_dir(dec, ra, dir):
	"""cos(angle) between positions (dec,ra) and the apex dir [{ra,dec}]."""
	dra = ra - dir[0]
	return np.sin(dec)*np.sin(dir[1]) + np.cos(dec)*np.cos(dir[1])*np.cos(dra)


# ---------------------------------------------------------------------------
# Reference-named operation wrappers (reference aberration.py:10-330)
# ---------------------------------------------------------------------------
def aberrate_map(map, dir=dir_equ, beta=beta, spin=[0, 2], nthread=None,
		coord_dtype=None, boundary="auto"):
	"""Aberration-only part of the boost (reference aberration.aberrate_map)."""
	return boost_map(map, dir=dir, beta=beta, aberrate=True, modulate=False)

def deaberrate_map(map, dir=dir_equ, beta=beta, spin=[0, 2], nthread=None,
		coord_dtype=None, boundary="auto"):
	return boost_map(map, dir=dir, beta=-beta, aberrate=True, modulate=False)

def modulate_map(map, dir=dir_equ, beta=beta, modulation="T2lin",
		T0=utils.T_cmb, freq=150e9, return_modulation=False, dipole=False,
		map_unit=1e-6, spin=[0, 2], nthread=None):
	"""Modulation-only part of the boost (reference aberration.modulate_map)."""
	return boost_map(map, dir=dir, beta=beta, aberrate=False, modulate=True,
		modulation=modulation, T0=T0, freq=freq, dipole=dipole,
		return_modulation=return_modulation)

def demodulate_map(map, dir=dir_equ, beta=beta, modulation="lin2T",
		T0=utils.T_cmb, freq=150e9, return_modulation=False, dipole=False,
		map_unit=1e-6, spin=[0, 2], nthread=None):
	return boost_map(map, dir=dir, beta=-beta, aberrate=False, modulate=True,
		modulation=modulation, T0=T0, freq=freq, dipole=dipole,
		return_modulation=return_modulation)

def deboost_map(map, dir=dir_equ, beta=beta, modulation="lin2T",
		T0=utils.T_cmb, freq=150e9, return_modulation=False, dipole=False,
		map_unit=1e-6, spin=[0, 2], aberrate=True, modulate=True,
		nthread=None, coord_dtype=None, boundary="auto"):
	"""Inverse of boost_map (reference aberration.deboost_map)."""
	return boost_map(map, dir=dir, beta=-beta, aberrate=aberrate,
		modulate=modulate, modulation=modulation, T0=T0, freq=freq,
		dipole=dipole, return_modulation=return_modulation)

def fully(shape, wcs, tol=0.1):
	"""Does the geometry cover ~the full sky in y? (reference
	aberration.fully)."""
	from . import curvedsky
	minfo = curvedsky.analyse_geometry(shape, wcs)
	if minfo.case != "2d" or getattr(minfo, "nphi_full", None) is None:
		return False
	ny_full = getattr(minfo, "ny_full", None)
	if ny_full is None:
		ny_full = shape[-2] + sum(np.atleast_1d(getattr(minfo, "ypad", [0, 0])))
	return abs(shape[-2]/ny_full) > 1 - tol

def calc_boost_field(beta, dir, lmax=None, nthread=None, modulation=False,
		mod_exp=1):
	"""Spin-1 alm of the aberration deflection field (and optionally the
	spin-0 alm of the modulation) (reference aberration.calc_boost_field)."""
	from . import curvedsky
	if lmax is None: lmax = beta2lmax(beta, 1000)
	n = lmax + 2
	itheta = np.arange(n)*np.pi/(n - 1)
	iz = np.cos(itheta)
	oz, A = calc_boost_1d(iz, beta)
	otheta = np.arccos(oz)
	dpos = np.zeros([2, n])
	dpos[0] = otheta - itheta
	alm = curvedsky.prof2alm(dpos, dir=dir, spin=1)
	if modulation:
		malm = curvedsky.prof2alm(A**mod_exp, dir=dir, spin=0)
		return alm, malm
	return alm

def interpol_map(imap, pixs, epsilon=None, nthread=None, ydouble=False):
	"""NUFFT interpolation of a map at fractional pixels, with optional
	y-doubling for full-sky boundary conditions (reference
	aberration.interpol_map)."""
	from . import fft as enfft
	arr = jnp.asarray(imap)
	ny, nx = arr.shape[-2:]
	if ydouble:
		mirror = jnp.roll(arr[..., ::-1, :], nx//2, -1)
		arr = jnp.concatenate([arr, mirror], -2)
	res = enfft.interpol_nufft(arr, jnp.asarray(pixs), epsilon=epsilon)
	return np.asarray(utils.from_device(res)) if not isinstance(res, np.ndarray) else res

def rotate_pol(pmap, gamma, spin=2):
	"""In-place-style polarization rotation of pmap[{Q,U},...] by gamma
	(reference aberration.rotate_pol)."""
	if spin == 0: return pmap
	q = jnp.asarray(pmap[0]); u = jnp.asarray(pmap[1])
	g = jnp.asarray(gamma)
	c, s = jnp.cos(spin*g), jnp.sin(spin*g)
	return type(pmap)([q*c + u*s, -q*s + u*c]) if isinstance(pmap, list) \
		else jnp.stack([q*c + u*s, -q*s + u*c])

def apply_modulation(map, A, T0=utils.T_cmb, freq=150e9, map_unit=1e-6,
		mode="T2lin", dipole=False, spin=[0, 2]):
	"""Apply the modulation field A with optional thermodynamic-unit
	corrections (reference aberration.apply_modulation). T components get
	the frequency-dependent quadratic correction; polarization is scaled."""
	arr = jnp.asarray(map)
	Aj = jnp.asarray(A)
	if mode in [None, "none"]:
		return map
	if mode in ["plain", "T2T"]:
		res = arr*Aj
		if dipole:
			if arr.ndim >= 3:
				res = res.at[..., 0, :, :].add((Aj - 1)*(T0/map_unit))
			else:
				res = res + (Aj - 1)*(T0/map_unit)
		return enmap.samewcs(res, map) if hasattr(map, "wcs") else res
	if mode in ["T2lin", "lin2T", "lin2lin"]:
		# thermodynamic <-> linearized conversion at frequency freq:
		# x = h nu / k T; f(x) quantifies the quadratic correction
		x = utils.h*freq/(utils.k*T0)
		fnl = x*(np.exp(x) + 1)/(np.exp(x) - 1) - 4
		T = arr*map_unit/T0  # dimensionless fluctuation
		if mode == "T2lin":
			res = Aj*(T + fnl*T**2) if False else Aj*T  # linear term; correction below
			res = Aj*T*(1 + fnl*(Aj - 1))
		elif mode == "lin2T":
			res = Aj*T*(1 - fnl*(Aj - 1))
		else:
			res = T
		res = res*T0/map_unit
		if dipole:
			if arr.ndim >= 3:
				res = res.at[..., 0, :, :].add((Aj - 1)*(T0/map_unit))
			else:
				res = res + (Aj - 1)*(T0/map_unit)
		return enmap.samewcs(res, map) if hasattr(map, "wcs") else res
	raise ValueError("Unrecognized modulation mode '%s'" % mode)

def fast_rewind(arr, period, ref=None):
	"""In-place single-period rewind (reference aberration.fast_rewind)."""
	if ref is None: ref = period/2
	off = arr - ref
	arr -= period*(off >= period/2)
	arr += period*(off < -period/2)
	return arr

def sky2pix(shape, wcs, pos):
	"""Fast CAR special-case sky->pix (reference aberration.sky2pix)."""
	typ = wcs.wcs.ctype[0][-3:]
	if typ == "CAR" and wcs.wcs.crval[1] == 0:
		return np.array([
			(pos[0] - wcs.wcs.crval[1]*utils.degree)/(wcs.wcs.cdelt[1]*utils.degree) + (wcs.wcs.crpix[1]-1),
			(pos[1] - wcs.wcs.crval[0]*utils.degree)/(wcs.wcs.cdelt[0]*utils.degree) + (wcs.wcs.crpix[0]-1)])
	return np.asarray(enmap.sky2pix(shape, wcs, pos))
