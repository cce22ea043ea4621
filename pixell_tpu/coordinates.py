"""Celestial coordinate transforms (reference pixell/coordinates.py).

The reference drives astropy for equ<->gal etc; astropy is absent here, so
the standard rotations are implemented directly with fixed Euler matrices
(exact, jit-compatible). Ephemeris-dependent systems (hor, bore, tele) are
stubbed pending an ephemeris backend.
"""
from __future__ import annotations
import numpy as np
from . import utils

# Galactic pole/center in equatorial (J2000) coordinates (IAU definition)
_GAL_POLE_RA  = 192.85948*utils.degree
_GAL_POLE_DEC = 27.12825*utils.degree
_GAL_CEN_RA   = 266.40499*utils.degree
_GAL_CEN_DEC  = -28.93617*utils.degree

# Ecliptic obliquity (J2000)
_ECL_OBL = 23.4392911*utils.degree


def euler_mat(euler_angles, kind="zyz", xp=np):
	"""Rotation matrix for the given Euler angles (reference coordinates.euler_mat:270)."""
	alpha, beta, gamma = euler_angles
	R = utils.rotmatrix(alpha, kind[0], xp)
	R = R @ utils.rotmatrix(beta, kind[1], xp)
	R = R @ utils.rotmatrix(gamma, kind[2], xp)
	return R

def _equ2gal_mat():
	"""Rotation matrix equatorial -> galactic, built from the galactic pole
	and center anchor directions (orthonormalized)."""
	def n(ra, dec):
		return np.array([np.cos(dec)*np.cos(ra), np.cos(dec)*np.sin(ra), np.sin(dec)])
	z = n(_GAL_POLE_RA, _GAL_POLE_DEC)
	x = n(_GAL_CEN_RA, _GAL_CEN_DEC)
	x = x - np.dot(x, z)*z
	x /= np.linalg.norm(x)
	y = np.cross(z, x)
	return np.array([x, y, z])

_MATS = {}
def _get_mat(isys, osys):
	key = (isys, osys)
	if key in _MATS: return _MATS[key]
	def base(sys):
		if sys in ["equ", "cel", "icrs", "c", "fk5", "j2000"]: return np.eye(3)
		if sys in ["gal", "g", "galactic"]: return _equ2gal_mat()
		if sys in ["ecl", "e", "ecliptic"]: return utils.rotmatrix(_ECL_OBL, "x").T
		raise ValueError("Unknown coordinate system '%s'" % sys)
	R = base(osys) @ base(isys).T
	_MATS[key] = R
	return R

def euler_rot(euler_angles, coords, kind="zyz"):
	"""Rotate coords[{ra,dec},...] by the given euler angles."""
	xp = utils._xp(coords)
	coords = xp.asarray(coords)
	R = xp.asarray(euler_mat(euler_angles, kind))
	rect = utils.ang2rect(coords, axis=0)
	shape = rect.shape
	rect = xp.tensordot(R, rect.reshape(3, -1), 1).reshape(shape)
	return utils.rect2ang(rect, axis=0)

def transform(from_sys, to_sys, coords, unwind=False, time=None, site=None, pol=None, mag=None):
	"""Transform coords[{ra,dec},...] (radians) between coordinate systems
	(reference coordinates.transform:25). Supported: equ/cel, gal, ecl."""
	xp = utils._xp(coords)
	coords = xp.asarray(coords)
	R = xp.asarray(_get_mat(getsys(from_sys), getsys(to_sys)))
	rect = utils.ang2rect(coords[:2], axis=0)
	shape = rect.shape
	rect = xp.tensordot(R, rect.reshape(3, -1), 1).reshape(shape)
	res = utils.rect2ang(rect, axis=0)
	if unwind: res = xp.concatenate([utils.unwind(res[:1]), res[1:]], 0)
	return res

def transform_meta(transfun, coords, offset=5*utils.arcsec):
	"""Compute transformed coords plus the local rotation angle (for
	polarization) via finite offsets (reference coordinates.transform_meta:67)."""
	from .bunch import Bunch
	coords = np.asarray(coords)
	c0 = np.asarray(transfun(coords))
	# offset towards north
	cn = coords.copy()
	cn[1] = cn[1] + offset
	c1 = np.asarray(transfun(cn))
	dra = (c1[0] - c0[0])*np.cos(c0[1])
	ddec = c1[1] - c0[1]
	ang = np.arctan2(dra, ddec)
	return Bunch(ocoord=c0, ang=ang)

def getsys(sys):
	if not isinstance(sys, str): return sys
	s = sys.lower().split(":")[0]
	aliases = {"c": "equ", "cel": "equ", "icrs": "equ", "equ": "equ", "fk5": "equ",
		"g": "gal", "gal": "gal", "galactic": "gal",
		"e": "ecl", "ecl": "ecl", "ecliptic": "ecl"}
	if s in aliases: return aliases[s]
	raise ValueError("Unknown coordinate system '%s'" % sys)

def getsys_full(sys, time=None, site=None):
	if isinstance(sys, str) and sys.lower() in ["hor", "altaz", "tele", "bore"]:
		return sys.lower()
	return getsys(sys)

def recenter(angs, center, restore=False):
	"""Rotate coordinates so that center[{ra,dec}] is at the origin
	(reference coordinates.recenter:289). If center has 4 components
	[ra0,dec0,ra1,dec1], rotates (ra0,dec0) to (ra1,dec1)."""
	center = np.asarray(center)
	if len(center) == 4:
		ra0, dec0, ra1, dec1 = center
	else:
		ra0, dec0 = center[0], center[1]
		ra1, dec1 = 0.0, 0.0
	return euler_rot([ra1, dec0 - dec1, -ra0], angs, kind="zyz")

def decenter(angs, center, restore=False):
	"""Inverse of recenter."""
	center = np.asarray(center)
	if len(center) == 4:
		ra0, dec0, ra1, dec1 = center
	else:
		ra0, dec0 = center[0], center[1]
		ra1, dec1 = 0.0, 0.0
	return euler_rot([ra0, dec1 - dec0, -ra1], angs, kind="zyz")


# ---------------------------------------------------------------------------
# Earth-fixed systems: equ <-> hor for a site and time (reference drives
# astropy for this, coordinates.py:217-269; here we use the standard
# sidereal-time rotation. No precession/nutation/aberration corrections, so
# accuracy is ~arcminute -- fine for pointing/avoidance logic, not for
# astrometry.)
# ---------------------------------------------------------------------------
def gmst(mjd):
	"""Greenwich mean sidereal time (radians) at the given MJD (UT1~UTC)."""
	mjd = np.asarray(mjd, float)
	d = mjd - 51544.5
	# IAU 1982-ish linear formula (sufficient at the arcsecond level/decade)
	gmst_hours = 18.697374558 + 24.06570982441908*d
	return (gmst_hours % 24)/24*2*np.pi

def equ2hor(coords, mjd, site):
	"""[{ra,dec},...] -> [{az,el},...] for the given site (Bunch with
	lat/lon in degrees) and time."""
	from . import sites as sites_mod
	if isinstance(site, str): site = sites_mod.get(site)
	coords = np.asarray(coords)
	ra, dec = coords[0], coords[1]
	lat = site.lat*utils.degree
	lon = site.lon*utils.degree
	lst = gmst(mjd) + lon
	H = lst - ra  # hour angle
	sel = np.sin(dec)*np.sin(lat) + np.cos(dec)*np.cos(lat)*np.cos(H)
	el = np.arcsin(np.clip(sel, -1, 1))
	az = np.arctan2(-np.sin(H)*np.cos(dec),
		np.sin(dec)*np.cos(lat) - np.cos(dec)*np.sin(lat)*np.cos(H))
	return np.stack([az % (2*np.pi), el])

def hor2equ(coords, mjd, site):
	"""[{az,el},...] -> [{ra,dec},...]."""
	from . import sites as sites_mod
	if isinstance(site, str): site = sites_mod.get(site)
	coords = np.asarray(coords)
	az, el = coords[0], coords[1]
	lat = site.lat*utils.degree
	lon = site.lon*utils.degree
	sdec = np.sin(el)*np.sin(lat) + np.cos(el)*np.cos(lat)*np.cos(az)
	dec = np.arcsin(np.clip(sdec, -1, 1))
	H = np.arctan2(-np.sin(az)*np.cos(el),
		np.sin(el)*np.cos(lat) - np.cos(el)*np.sin(lat)*np.cos(az))
	lst = gmst(mjd) + lon
	ra = (lst - H) % (2*np.pi)
	return np.stack([ra, dec])


# ---------------------------------------------------------------------------
# Site-relative systems: hor/cel via the sidereal rotation above, tele/bore
# via fixed euler rotations (reference coordinates.py:145-270; the reference
# drives slalib/astropy, which are absent here -- accuracy is arcminute-level
# for hor, exact for tele/bore)
# ---------------------------------------------------------------------------
class default_site:
	"""ACT-like site (reference coordinates.default_site)."""
	lat = -22.9585
	lon = -67.7876
	alt = 5188.0
	T = 273.15
	P = 550.0
	hum = 0.2
	freq = 150.0
	lapse = 0.0065
	base_tilt = 0.0107693
	base_az = -114.9733961

def hor2cel(coord, time, site=default_site, copy=True):
	"""[{az,el},...] -> [{ra,dec},...] at the given mjd times
	(reference coordinates.hor2cel; sidereal approximation)."""
	coord = np.array(coord, copy=copy)
	res = hor2equ(coord[:2], np.asarray(time), site)
	coord[:2] = res
	return coord

def cel2hor(coord, time, site=default_site, copy=True):
	coord = np.array(coord, copy=copy)
	res = equ2hor(coord[:2], np.asarray(time), site)
	coord[:2] = res
	return coord

def tele2hor(coord, site=default_site, copy=True):
	"""Telescope -> horizontal coordinates via the base tilt
	(reference coordinates.tele2hor)."""
	coord = np.array(coord, copy=copy)
	return euler_rot([site.base_az*utils.degree, site.base_tilt*utils.degree,
		-site.base_az*utils.degree], coord)

def hor2tele(coord, site=default_site, copy=True):
	coord = np.array(coord, copy=copy)
	return euler_rot([site.base_az*utils.degree, -site.base_tilt*utils.degree,
		-site.base_az*utils.degree], coord)

def tele2bore(coord, bore, copy=True):
	"""To boresight-relative coordinates (reference coordinates.tele2bore)."""
	return recenter(np.array(coord, copy=copy), bore)

def bore2tele(coord, bore, copy=True):
	"""From boresight-relative coordinates (reference coordinates.bore2tele)."""
	return decenter(np.array(coord, copy=copy), bore)

def nohor(sys):
	return sys if sys not in ["altaz", "tele", "bore", "hor"] else "icrs"

def get_handedness(sys):
	"""IAU handedness of the system as seen from inside the sphere
	(reference coordinates.get_handedness)."""
	return "R" if sys in ["altaz", "tele", "bore", "hor"] else "L"

def make_mapping(dict_):
	return {value: key for key in dict_ for value in dict_[key]}

def ephem_pos(name, mjd):
	"""Equatorial position of a named ephemeris object (reference
	coordinates.ephem_pos; analytic sun/moon backend)."""
	from . import ephem as ephem_mod
	return ephem_mod.ephem_pos(name, mjd)

def interpol_pos(from_sys, to_sys, name_or_pos, mjd, site=default_site, dt=10):
	"""Densely-sampled transformed positions of a moving object
	(reference coordinates.interpol_pos)."""
	mjd = np.asarray(mjd)
	box = utils.widen_box(np.array([np.min(mjd), np.max(mjd)]), 0.01)
	sub_nsamp = max(3, int((box[1] - box[0])*24.*3600/dt))
	sub_mjd = np.linspace(box[0], box[1], sub_nsamp, endpoint=True)
	if isinstance(name_or_pos, str):
		sub_from = ephem_pos(name_or_pos, sub_mjd)
	else:
		pos = np.asarray(name_or_pos)
		sub_from = np.zeros([2, sub_nsamp])
		sub_from[:] = pos[:, None]
	sub_to = transform_raw(from_sys, to_sys, sub_from, time=sub_mjd, site=site)
	ra = utils.unwind(sub_to[0])
	return np.array([np.interp(mjd, sub_mjd, ra) % (2*np.pi),
		np.interp(mjd, sub_mjd, sub_to[1])])

def transform_raw(from_sys, to_sys, coords, time=None, site=default_site, bore=None):
	"""Transform between hor/cel/gal (+tele/bore) systems, handling the
	time-dependent hor chain (reference coordinates.transform_raw)."""
	coords = np.array(coords)[:2]
	fs, ts = getsys_full(from_sys), getsys_full(to_sys)
	cur = coords
	# to celestial first
	if fs in ["hor", "altaz"]:
		cur = hor2cel(cur, time, site)
	elif fs == "tele":
		cur = hor2cel(tele2hor(cur, site), time, site)
	elif fs == "bore":
		cur = hor2cel(tele2hor(bore2tele(cur, bore), site), time, site)
	elif fs != "equ":
		cur = transform(fs, "equ", cur)
	# celestial to target
	if ts in ["hor", "altaz"]:
		cur = cel2hor(cur, time, site)
	elif ts == "tele":
		cur = hor2tele(cel2hor(cur, time, site), site)
	elif ts == "bore":
		cur = tele2bore(hor2tele(cel2hor(cur, time, site), site), bore)
	elif ts != "equ":
		cur = transform("equ", ts, cur)
	return cur

def transform_euler(euler, coords, pol=None, mag=None):
	"""Transform coords by zyz euler angles, with optional polarization
	angle and magnification rows (reference coordinates.transform_euler)."""
	coords = np.asarray(coords)
	def rotfun(c): return euler_rot(euler, c)
	meta = transform_meta(rotfun, coords[:2])
	nfield = max(0, len(coords) - 2)
	res = np.zeros((2 + nfield,) + np.shape(meta.ocoord)[1:])
	res[:2] = meta.ocoord
	if nfield >= 1:
		res[2] = coords[2] + meta.ang
	if nfield >= 2:
		res[3] = coords[3]
	return res

def transform_astropy(from_sys, to_sys, coords):
	"""astropy-free version of the reference's astropy fallback: supports the
	fixed-matrix systems (reference coordinates.transform_astropy)."""
	return transform(from_sys, to_sys, coords)
