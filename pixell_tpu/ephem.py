"""Solar-system ephemerides (reference pixell/ephem.py).

The reference delegates to astropy/pyephem, neither of which is available in
this environment. We provide the pluggable Ephem interface with a low-
precision analytic backend for the Sun and Moon (adequate for avoidance
masks; not for precision astrometry) plus the precomputed/interpolated
wrappers of the reference."""
from __future__ import annotations
import numpy as np
from . import utils
from .bunch import Bunch


class Ephem:
	"""Base ephemeris interface (reference ephem.py:42)."""
	def pos(self, name, mjd):
		raise NotImplementedError

class EphemAnalytic(Ephem):
	"""Low-precision analytic Sun/Moon positions (equatorial, radians).
	Sun from the standard low-precision solar formulas (~0.01 deg)."""
	def pos(self, name, mjd):
		mjd = np.asarray(mjd, float)
		name = name.lower()
		if name == "sun": return _sun_pos(mjd)
		if name == "moon": return _moon_pos(mjd)
		raise ValueError("EphemAnalytic only supports sun/moon, not '%s'" % name)

def _sun_pos(mjd):
	d = mjd - 51544.5  # days from J2000
	g = np.deg2rad((357.529 + 0.98560028*d) % 360)
	q = np.deg2rad((280.459 + 0.98564736*d) % 360)
	lam = q + np.deg2rad(1.915)*np.sin(g) + np.deg2rad(0.020)*np.sin(2*g)
	eps = np.deg2rad(23.439 - 0.00000036*d)
	ra = np.arctan2(np.cos(eps)*np.sin(lam), np.cos(lam))
	dec = np.arcsin(np.sin(eps)*np.sin(lam))
	return np.stack([ra % (2*np.pi), dec])

def _moon_pos(mjd):
	d = mjd - 51544.5
	L = np.deg2rad((218.316 + 13.176396*d) % 360)
	M = np.deg2rad((134.963 + 13.064993*d) % 360)
	F = np.deg2rad((93.272 + 13.229350*d) % 360)
	lam = L + np.deg2rad(6.289)*np.sin(M)
	beta = np.deg2rad(5.128)*np.sin(F)
	eps = np.deg2rad(23.439)
	ra = np.arctan2(np.sin(lam)*np.cos(eps) - np.tan(beta)*np.sin(eps), np.cos(lam))
	dec = np.arcsin(np.sin(beta)*np.cos(eps) + np.cos(beta)*np.sin(eps)*np.sin(lam))
	return np.stack([ra % (2*np.pi), dec])

class EphemPrecomputed(Ephem):
	"""Tabulated positions with interpolation (reference ephem.py:150)."""
	def __init__(self, mjds, poss):
		self.mjds = np.asarray(mjds)
		self.poss = np.asarray(poss)  # [{ra,dec}, n]
	def pos(self, name, mjd):
		ra = np.interp(mjd, self.mjds, np.unwrap(self.poss[0]))
		dec = np.interp(mjd, self.mjds, self.poss[1])
		return np.stack([np.asarray(ra) % (2*np.pi), np.asarray(dec)])

default = EphemAnalytic()

def ephem_pos(name, mjd, ephem=None):
	"""Equatorial position [{ra,dec}] of the named object at mjd
	(reference coordinates.ephem_pos:387)."""
	return (ephem or default).pos(name, mjd)

def interpol_pos(name, mjd1, mjd2, n=100, ephem=None):
	"""Precompute positions over a time range for fast interpolation
	(reference coordinates.interpol_pos:406)."""
	mjds = np.linspace(mjd1, mjd2, n)
	poss = ephem_pos(name, mjds, ephem=ephem)
	return EphemPrecomputed(mjds, poss)
