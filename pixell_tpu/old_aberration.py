"""Deprecated legacy aberration interface (reference pixell/old_aberration.py).
Kept as thin aliases to the current aberration module."""
from .aberration import *  # noqa
from .aberration import boost_map, aberrate_map, deaberrate_map, beta, dir_equ

def aberrate(imap, dir=None, beta=beta, **kw):
	"""Legacy name for aberrate_map."""
	return aberrate_map(imap, dir=dir if dir is not None else dir_equ, beta=beta)

def deaberrate(imap, dir=None, beta=beta, **kw):
	return deaberrate_map(imap, dir=dir if dir is not None else dir_equ, beta=beta)
