"""Checkpoint/resume helpers (SURVEY section 5: the reference only has
utils.CG.save/load to HDF5 and maps-as-checkpoints; here we add orbax-backed
pytree checkpoints for solver state and sharded arrays, plus the same HDF5
helpers)."""
from __future__ import annotations
import os
import numpy as np


def save_pytree(path, tree, force=True):
	"""Save an arbitrary pytree (e.g. solver state, sharded maps) with orbax."""
	import orbax.checkpoint as ocp
	path = os.path.abspath(path)
	ckptr = ocp.StandardCheckpointer()
	ckptr.save(path, tree, force=force)
	ckptr.wait_until_finished()

def load_pytree(path, like=None):
	import orbax.checkpoint as ocp
	path = os.path.abspath(path)
	ckptr = ocp.StandardCheckpointer()
	if like is not None:
		return ckptr.restore(path, like)
	return ckptr.restore(path)

def save_solver(fname, solver):
	"""HDF5 snapshot of a CG/Minres solver (reference utils.CG.save:3642)."""
	solver.save(fname)

def load_solver(fname, solver):
	solver.load(fname)
	return solver

def save_map(fname, map):
	"""Maps are their own checkpoints (reference writes FITS/HDF,
	enmap.py:2663)."""
	from . import enmap
	enmap.write_map(fname, map)

def load_map(fname):
	from . import enmap
	return enmap.read_map(fname)
