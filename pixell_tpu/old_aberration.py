"""Deprecated legacy aberration interface (reference pixell/old_aberration.py).
Mostly thin aliases to the current aberration module, plus the legacy
closed-form helpers remap/distortion/aber_angle/mod_amplitude/aber_deriv
(reference old_aberration.py:220-284)."""
import numpy as np
from .aberration import *  # noqa
from .aberration import (boost_map, aberrate_map, deaberrate_map, beta,
	dir_equ, Aberrator, apply_modulation, calc_boost_1d)
from . import coordinates, utils


def aberrate(imap, dir=None, beta=beta, **kw):
	"""Legacy name for aberrate_map (reference old_aberration.aberrate:247)."""
	return aberrate_map(imap, dir=dir if dir is not None else dir_equ, beta=beta)

def deaberrate(imap, dir=None, beta=beta, **kw):
	return deaberrate_map(imap, dir=dir if dir is not None else dir_equ, beta=beta)


def aber_angle(theta, beta):
	"""Zenith angle of a point in the deflected cmb given the zenith angle of
	the undeflected point (reference old_aberration.aber_angle:265)."""
	c = np.cos(theta)
	gamma = (1 - beta**2)**-0.5
	c = (c + (gamma - 1)*c + gamma*beta)/(gamma*(1 + c*beta))
	return np.arccos(np.clip(c, -1, 1))

def mod_amplitude(theta, beta):
	"""Doppler modulation amplitude at zenith angle theta
	(reference old_aberration.mod_amplitude:275)."""
	c = np.cos(theta)
	gamma = (1 - beta**2)**-0.5
	return 1/(gamma*(1 - c*beta))

def aber_deriv(theta, beta):
	"""Derivative of the aberration displacement
	(reference old_aberration.aber_deriv:281)."""
	B = 1 - beta**2
	C = 1 - beta*np.cos(theta)
	return B**0.5/C


def remap(pos, dir, beta, pol=True, modulation=True, recenter=False):
	"""Aberration-deflected positions for pos[{ra,dec}] and boost beta toward
	dir; with pol, a third row gives the polarization rotation; with
	modulation, a last row gives the modulation amplitude
	(reference old_aberration.remap:220)."""
	pos = np.array(coordinates.transform("equ", ["equ", [dir, False]],
		np.asarray(pos, float), pol=pol))
	if recenter: before = np.mean(pos[1, ::10])
	# -beta: original position from the deflected one
	pos[1] = np.pi/2 - aber_angle(np.pi/2 - pos[1], -beta)
	if recenter:
		after = np.mean(pos[1, ::10])
		pos[1] -= after - before
	res = np.array(coordinates.transform(["equ", [dir, False]], "equ",
		pos, pol=pol))
	if modulation:
		amp = mod_amplitude(np.pi/2 - pos[1], beta)
		res = np.concatenate([res, [amp]])
	return res

def distortion(pos, dir, beta):
	"""Local aberration distortion: second derivative of the displacement
	(reference old_aberration.distortion:241)."""
	pos = np.array(coordinates.transform("equ", ["equ", [dir, False]],
		np.asarray(pos, float), pol=True))
	return aber_deriv(np.pi/2 - pos[1], -beta) - 1


def apply_aberration(imap, ipos, boundary="wrap", order=3):
	"""Interpolate imap at the remapped positions ipos (with pol rotation row)
	(reference old_aberration.apply_aberration semantics)."""
	from . import enmap
	pos = np.asarray(ipos)
	pix = enmap.sky2pix(imap.shape, imap.wcs, pos[1::-1][::-1]
		if pos.shape[0] > 2 else pos)
	from . import interpol
	import jax.numpy as jnp
	omap = enmap.samewcs(np.asarray(interpol.map_coordinates(
		jnp.asarray(np.asarray(imap)), jnp.asarray(pix), order=order,
		border=boundary)), imap)
	if pos.shape[0] > 2 and omap.ndim > 2 and omap.shape[-3] >= 3:
		c, s = np.cos(2*pos[2]), np.sin(2*pos[2])
		q = c*np.asarray(omap[-2]) + s*np.asarray(omap[-1])
		u = -s*np.asarray(omap[-2]) + c*np.asarray(omap[-1])
		omap[-2], omap[-1] = q, u
	return omap


def calc_boost(pos, dir, beta, pol=True, recenter=False):
	"""Legacy name: remap without modulation (reference old_aberration)."""
	return remap(pos, dir, beta, pol=pol, modulation=False, recenter=recenter)


def planck(nu, T, deriv=False):
	"""Planck spectrum (reference old_aberration.planck)."""
	a = utils.h*nu/(utils.k*T)
	I = 2*utils.h*nu**3/utils.c**2/(np.exp(a) - 1)
	if deriv:
		return I*a*np.exp(a)/(np.exp(a) - 1)/T
	return I

def inv_planck(nu, I, T0=utils.T_cmb, niter=5):
	"""Invert the Planck spectrum for temperature by Newton iteration
	(reference old_aberration.inv_planck)."""
	T = T0*np.ones_like(np.asarray(I, float))
	for _ in range(niter):
		f = planck(nu, T) - I
		df = planck(nu, T, deriv=True)
		T = T - f/df
	return T
