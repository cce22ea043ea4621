"""Unified ephemeris interface (reference pixell/ephem.py).

Same two-level API as the reference: the simple interface (module-level
``eval``, ``add`` and ``bodies``, reference ephem.py:237-243) and the
advanced interface of Ephem classes (AstropyEphem, PyephemEphem,
PrecompEphem, InterpEphem, MultiEphem; reference ephem.py:42-240). All
``eval(name, ctime, cartesian=False, site=None)`` methods return
(pos[...,{ra,dec}] radians, dist[...] AU), or rect[...,3] AU when
cartesian=True. ctime is unix time.

Neither astropy nor pyephem exists in this environment, so the default
backend is KeplerEphem: a dependency-free analytic ephemeris using the JPL
approximate mean Keplerian elements of the planets (valid 1800-2050,
arcminute-level) plus low-precision lunar theory. AstropyEphem/PyephemEphem
are retained and work when their libraries are installed.
"""
from __future__ import annotations
import os, glob
import numpy as np
from . import utils, sites


class Ephem:
	"""General interface for the Ephemeris implementations
	(reference ephem.Ephem:42)."""
	def __init__(self, bodies=[], capitalize=True):
		self.bodies     = list(bodies)
		self.capitalize = capitalize
	def eval(self, name, ctime, cartesian=False, site=None):
		raise NotImplementedError


class MultiEphem(Ephem):
	"""Forwards requests to the last-added ephemeris that knows the body
	(reference ephem.MultiEphem:50)."""
	def __init__(self, others=[], capitalize=True):
		super().__init__(capitalize=capitalize)
		self.others = []
		for other in others:
			self.add(other)
	def eval(self, name, ctime, cartesian=False, site=None):
		if self.capitalize: name = name.capitalize()
		for other in self.others[::-1]:
			if name in other.bodies:
				return other.eval(name, ctime, cartesian=cartesian, site=site)
		raise KeyError("No ephemeris found for '%s'" % str(name))
	def add(self, other):
		self.others.append(other)
		self.bodies += other.bodies


class AstropyEphem(Ephem):
	"""Ephemeris from astropy's solar_system_ephemeris (reference
	ephem.AstropyEphem:73). Requires astropy."""
	def __init__(self, ephemeris="builtin", site=None, capitalize=True):
		import astropy.coordinates as aco
		bodies = [name.capitalize() for name in aco.solar_system_ephemeris.bodies]
		super().__init__(bodies=bodies, capitalize=capitalize)
		self.site      = site
		self.ephemeris = ephemeris
	def eval(self, name, ctime, cartesian=False, site=None):
		import astropy.time as ati, astropy.coordinates as aco
		if self.capitalize: name = name.capitalize()
		site  = site or self.site or sites.default_site
		ctime = np.asarray(ctime)
		t     = ati.Time(ctime, format="unix")
		loc   = aco.EarthLocation.from_geodetic(site.lon, site.lat, site.alt)
		data  = aco.get_body(name, t, location=loc, ephemeris=self.ephemeris)
		if cartesian:
			rect = np.zeros(ctime.shape + (3,))
			dc = data.cartesian
			rect[..., 0] = dc.x.to("AU").value
			rect[..., 1] = dc.y.to("AU").value
			rect[..., 2] = dc.z.to("AU").value
			return rect
		pos = np.zeros(ctime.shape + (2,))
		r   = np.zeros(ctime.shape)
		ds  = data.spherical
		pos[..., 0] = ds.lon.radian
		pos[..., 1] = ds.lat.radian
		r[...] = ds.distance.to("AU").value
		return pos, r


class PyephemEphem(Ephem):
	"""Ephemeris using pyephem (reference ephem.PyephemEphem:110).
	Requires the ephem package."""
	def __init__(self, site=None, capitalize=True):
		import ephem  # noqa: F401 -- availability check
		bodies = ["Ariel", "Callisto", "Deimos", "Dione", "Enceladus", "Europa",
			"Ganymede", "Hyperion", "Iapetus", "Io", "Jupiter", "Mars", "Mercury",
			"Mimas", "Miranda", "Moon", "Neptune", "Oberon", "Phobos", "Pluto",
			"Rhea", "Saturn", "Sun", "Tethys", "Titan", "Titania", "Umbriel",
			"Uranus", "Venus"]
		super().__init__(bodies=bodies, capitalize=capitalize)
		self.site = site
	def eval(self, name, ctime, cartesian=False, site=None):
		import ephem
		if self.capitalize: name = name.capitalize()
		site = site or self.site or sites.default_site
		obj  = getattr(ephem, name)()
		obs  = ephem.Observer()
		obs.lon = site.lon
		obs.lat = site.lat
		obs.elevation = site.alt
		ctime = np.asarray(ctime)
		djds = utils.ctime2djd(ctime).reshape(-1)
		pos = np.zeros(djds.shape + (2,))
		r   = np.zeros(djds.shape)
		for i, djd in enumerate(djds):
			obs.date = djd
			obj.compute(obs)
			pos[i, 0] = obj.a_ra
			pos[i, 1] = obj.a_dec
			r[i] = obj.earth_distance
		if cartesian:
			rect = _ang2rect(pos)*r[:, None]
			return rect.reshape(ctime.shape + (3,))
		return pos.reshape(ctime.shape + (2,)), r.reshape(ctime.shape)


class PrecompEphem(Ephem):
	"""Precomputed positions from <path>/<Name>.npy structured files with
	"ctime" and "pos" ([n,3] cartesian AU) fields (reference
	ephem.PrecompEphem:157). The site was baked in; site arg ignored."""
	def __init__(self, path, capitalize=True):
		bodies = [os.path.basename(name)[:-4]
			for name in sorted(glob.glob(os.path.join(path, "*.npy")))]
		super().__init__(bodies=bodies, capitalize=capitalize)
		self.path  = path
		self.cache = {}
	def eval(self, name, ctime, cartesian=False, site=None):
		if self.capitalize: name = name.capitalize()
		spline = self.get(name)
		rect = spline(ctime)
		if cartesian: return rect
		return _rect2ang_r(rect)
	def get(self, name):
		if name not in self.cache:
			from scipy import interpolate
			data = np.load(os.path.join(self.path, name + ".npy"))
			self.cache[name] = interpolate.interp1d(
				data["ctime"], data["pos"], kind=3, axis=0)
		return self.cache[name]
	def clear(self):
		self.cache = {}


class InterpEphem(Ephem):
	"""Samples another ephemeris sparsely and spline-interpolates, speeding
	up slow backends ~1000x (reference ephem.InterpEphem:197)."""
	def __init__(self, other, dt=300):
		super().__init__(bodies=other.bodies, capitalize=other.capitalize)
		self.other = other
		self.dt    = dt
	def eval(self, name, ctime, cartesian=False, site=None):
		from scipy import interpolate
		ctime = np.asarray(ctime, float)
		tflat = ctime.reshape(-1)
		order = np.argsort(tflat)
		tflat = tflat[order]
		step = np.max(np.abs(np.diff(tflat))) if len(tflat) > 1 else 0
		if len(tflat) <= 1 or step >= self.dt or step == 0:
			return self.other.eval(name, ctime, cartesian=cartesian, site=site)
		t1, t2 = tflat[0], tflat[-1]
		npoint = max(4, utils.ceil((t2 - t1)/self.dt))
		iptime = np.linspace(t1, t2, npoint)
		data   = self.other.eval(name, iptime, cartesian=True, site=site)
		interp = interpolate.interp1d(iptime, data, kind=3, axis=0)
		rect = np.zeros(ctime.shape + (3,))
		rect.reshape(-1, 3)[order] = interp(tflat)
		if cartesian: return rect
		return _rect2ang_r(rect)


# ---------------------------------------------------------------------------
# Dependency-free analytic backend (replaces the reference's default
# PyephemEphem when pyephem is absent).
# ---------------------------------------------------------------------------

# JPL approximate mean Keplerian elements (J2000 ecliptic), valid 1800-2050:
# a [AU], e, I [deg], L [deg], long.peri [deg], long.node [deg] and their
# per-Julian-century rates.
_ELEMENTS = {
	"Mercury": ((0.38709927, 0.20563593, 7.00497902, 252.25032350, 77.45779628, 48.33076593),
		(0.00000037, 0.00001906, -0.00594749, 149472.67411175, 0.16047689, -0.12534081)),
	"Venus": ((0.72333566, 0.00677672, 3.39467605, 181.97909950, 131.60246718, 76.67984255),
		(0.00000390, -0.00004107, -0.00078890, 58517.81538729, 0.00268329, -0.27769418)),
	"Earth": ((1.00000261, 0.01671123, -0.00001531, 100.46457166, 102.93768193, 0.0),
		(0.00000562, -0.00004392, -0.01294668, 35999.37244981, 0.32327364, 0.0)),
	"Mars": ((1.52371034, 0.09339410, 1.84969142, -4.55343205, -23.94362959, 49.55953891),
		(0.00001847, 0.00007882, -0.00813131, 19140.30268499, 0.44441088, -0.29257343)),
	"Jupiter": ((5.20288700, 0.04838624, 1.30439695, 34.39644051, 14.72847983, 100.47390909),
		(-0.00011607, -0.00013253, -0.00183714, 3034.74612775, 0.21252668, 0.20469106)),
	"Saturn": ((9.53667594, 0.05386179, 2.48599187, 49.95424423, 92.59887831, 113.66242448),
		(-0.00125060, -0.00050991, 0.00193609, 1222.49362201, -0.41897216, -0.28867794)),
	"Uranus": ((19.18916464, 0.04725744, 0.77263783, 313.23810451, 170.95427630, 74.01692503),
		(-0.00196176, -0.00004397, -0.00242939, 428.48202785, 0.40805281, 0.04240589)),
	"Neptune": ((30.06992276, 0.00859048, 1.77004347, -55.12002969, 44.96476227, 131.78422574),
		(0.00026291, 0.00005105, 0.00035372, 218.45945325, -0.32241464, -0.00508664)),
	"Pluto": ((39.48211675, 0.24882730, 17.14001206, 238.92903833, 224.06891629, 110.30393684),
		(-0.00031596, 0.00005170, 0.00004818, 145.20780515, -0.04062942, -0.01183482)),
}
_OBLIQUITY = np.deg2rad(23.43928)


def _kepler(M, e, niter=8):
	"""Solve Kepler's equation E - e sin E = M by Newton iteration."""
	E = M + e*np.sin(M)
	for _ in range(niter):
		E = E - (E - e*np.sin(E) - M)/(1 - e*np.cos(E))
	return E


def _helio_ecl(name, T):
	"""Heliocentric ecliptic rectangular coords [.. ,3] in AU at Julian
	centuries-from-J2000 T, from the mean-element tables."""
	el0, rates = _ELEMENTS[name]
	a, e, I, L, lperi, lnode = [e0 + d*T for e0, d in zip(el0, rates)]
	I, L, lperi, lnode = [np.deg2rad(x) for x in (I, L, lperi, lnode)]
	w = lperi - lnode           # argument of perihelion
	M = np.mod(L - lperi + np.pi, 2*np.pi) - np.pi
	E = _kepler(M, e)
	# position in orbital plane
	xp = a*(np.cos(E) - e)
	yp = a*np.sqrt(1 - e*e)*np.sin(E)
	cw, sw = np.cos(w), np.sin(w)
	cO, sO = np.cos(lnode), np.sin(lnode)
	cI, sI = np.cos(I), np.sin(I)
	x = (cw*cO - sw*sO*cI)*xp + (-sw*cO - cw*sO*cI)*yp
	y = (cw*sO + sw*cO*cI)*xp + (-sw*sO + cw*cO*cI)*yp
	z = (sw*sI)*xp + (cw*sI)*yp
	return np.stack([x, y, z], -1)


def _ecl2equ(r):
	"""Rotate ecliptic rectangular coords to equatorial."""
	ce, se = np.cos(_OBLIQUITY), np.sin(_OBLIQUITY)
	x, y, z = r[..., 0], r[..., 1], r[..., 2]
	return np.stack([x, ce*y - se*z, se*y + ce*z], -1)


def _moon_rect(T):
	"""Geocentric equatorial rect coords of the Moon in AU (low-precision
	lunar theory, ~0.3 deg)."""
	d = T*36525.0
	L = np.deg2rad((218.316 + 13.176396*d) % 360)
	M = np.deg2rad((134.963 + 13.064993*d) % 360)
	F = np.deg2rad((93.272 + 13.229350*d) % 360)
	lam  = L + np.deg2rad(6.289)*np.sin(M)
	beta = np.deg2rad(5.128)*np.sin(F)
	dist = (385001 - 20905*np.cos(M))*1e3/utils.AU
	cb = np.cos(beta)
	ecl = np.stack([dist*cb*np.cos(lam), dist*cb*np.sin(lam),
		dist*np.sin(beta)], -1)
	return _ecl2equ(ecl)


def _ang2rect(pos):
	"""[...,{ra,dec}] -> unit vectors [...,3]."""
	ra, dec = pos[..., 0], pos[..., 1]
	cd = np.cos(dec)
	return np.stack([cd*np.cos(ra), cd*np.sin(ra), np.sin(dec)], -1)


def _rect2ang_r(rect):
	"""[...,3] -> ([...,{ra,dec}], r)."""
	x, y, z = rect[..., 0], rect[..., 1], rect[..., 2]
	r = np.sqrt(x*x + y*y + z*z)
	ra = np.mod(np.arctan2(y, x), 2*np.pi)
	dec = np.arcsin(np.clip(z/np.maximum(r, 1e-300), -1, 1))
	return np.stack([ra, dec], -1), r


class KeplerEphem(Ephem):
	"""Analytic geocentric ephemeris from JPL mean Keplerian elements
	(planets, arcmin-level 1800-2050) plus low-precision Sun/Moon. Purely
	numpy; ignores the site (topocentric parallax is below its accuracy
	for everything but the Moon)."""
	def __init__(self, capitalize=True):
		bodies = [n for n in _ELEMENTS if n != "Earth"] + ["Sun", "Moon"]
		super().__init__(bodies=bodies, capitalize=capitalize)
	def eval(self, name, ctime, cartesian=False, site=None):
		if self.capitalize: name = name.capitalize()
		ctime = np.asarray(ctime, float)
		T = (ctime/86400.0 + 40587.0 - 51544.5)/36525.0  # centuries from J2000
		earth = _ecl2equ(_helio_ecl("Earth", T))
		if name == "Sun":
			rect = -earth
		elif name == "Moon":
			rect = _moon_rect(T)
		elif name in _ELEMENTS:
			rect = _ecl2equ(_helio_ecl(name, T)) - earth
		else:
			raise KeyError("KeplerEphem has no body '%s'" % name)
		if cartesian: return rect
		return _rect2ang_r(rect)


def _make_default():
	try:
		return MultiEphem([InterpEphem(PyephemEphem())])
	except ImportError:
		return MultiEphem([InterpEphem(KeplerEphem())])

# Default ephemeris (reference ephem.py:237)
default_ephem = _make_default()

def eval(name, ctime, cartesian=False, site=None):
	return default_ephem.eval(name, ctime, cartesian=cartesian, site=site)

def add(ephem):
	default_ephem.add(ephem)

bodies = default_ephem.bodies


# ---------------------------------------------------------------------------
# mjd-based convenience wrappers used by coordinates.py (reference
# coordinates.ephem_pos:387 / interpol_pos:406 work in mjd).
# ---------------------------------------------------------------------------
def ephem_pos(name, mjd, ephem=None):
	"""Equatorial position [{ra,dec}] (radians) of the named object at mjd."""
	ctime = (np.asarray(mjd, float) - 40587.0)*86400.0
	eph = ephem or default_ephem
	pos, r = eph.eval(name, ctime)
	return np.moveaxis(pos, -1, 0)

class EphemPrecomputed(Ephem):
	"""Tabulated [{ra,dec}] positions with interpolation (mjd-based legacy
	helper kept for coordinates.interpol_pos)."""
	def __init__(self, mjds, poss):
		super().__init__(bodies=[])
		self.mjds = np.asarray(mjds)
		self.poss = np.asarray(poss)  # [{ra,dec}, n]
	def pos(self, name, mjd):
		ra  = np.interp(mjd, self.mjds, np.unwrap(self.poss[0]))
		dec = np.interp(mjd, self.mjds, self.poss[1])
		return np.stack([np.asarray(ra) % (2*np.pi), np.asarray(dec)])
	def eval(self, name, ctime, cartesian=False, site=None):
		mjd = np.asarray(ctime, float)/86400.0 + 40587.0
		pos = np.moveaxis(self.pos(name, mjd), 0, -1)
		r = np.ones(pos.shape[:-1])
		if cartesian: return _ang2rect(pos)*r[..., None]
		return pos, r

def interpol_pos(name, mjd1, mjd2, n=100, ephem=None):
	"""Precompute positions over an mjd range for fast interpolation."""
	mjds = np.linspace(mjd1, mjd2, n)
	poss = ephem_pos(name, mjds, ephem=ephem)
	return EphemPrecomputed(mjds, poss)
