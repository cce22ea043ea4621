"""Multi-chip spherical harmonic transforms.

The SHT parallelizes naturally over rings (the theta axis): the Legendre
scan is elementwise in theta, and each ring's FFT is local, so synthesis
needs NO communication (alm replicated, map row-sharded) and analysis needs
a single psum of the per-device partial alms -- one ICI collective per
transform. This is the TPU equivalent of the reference's distributed maps
(tilemap + MPI reductions; SURVEY.md section 5 "m-parallel / ring-blocking").
Batch/component axes shard independently ("dp"-style) on a 2D mesh.
"""
from __future__ import annotations
import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding
from jax import shard_map
from .. import sht


def _pad_rings(theta, weights, maps, ndev):
	"""Pad the ring axis to a multiple of ndev with zero-weight dummy rings."""
	nt = theta.shape[0]
	npad = (-nt) % ndev
	if npad == 0: return theta, weights, maps, nt
	theta2 = jnp.concatenate([theta, jnp.full((npad,), np.pi/2, theta.dtype)])
	weights2 = None if weights is None else jnp.concatenate(
		[weights, jnp.zeros((npad,), weights.dtype)])
	maps2 = None if maps is None else jnp.pad(maps,
		[(0, 0)]*(maps.ndim-2) + [(0, npad), (0, 0)])
	return theta2, weights2, maps2, nt


def synthesis_dist(alm, theta, nphi, mesh, phi0=0.0, lmax=None, mmax=None,
		spin=(0, 2), row_axis="rows"):
	"""Ring-sharded synthesis: alm [..., ncomp, nalm] (replicated) ->
	map [..., ncomp, nt, nphi] sharded over rings. No collectives needed."""
	alm = jnp.asarray(alm)
	theta = jnp.asarray(theta)
	ndev = mesh.shape[row_axis]
	theta_p, _, _, nt = _pad_rings(theta, None, None, ndev)
	spin = tuple(np.atleast_1d(spin))
	def work(alm_l, theta_l):
		return sht.synthesis(alm_l, theta_l, nphi, phi0=phi0, lmax=lmax,
			mmax=mmax, spin=spin)
	nd_map = alm.ndim  # output dims: alm pre + (nt, nphi) -> pre has ncomp
	out_spec = P(*([None]*(alm.ndim - 1) + [row_axis, None]))
	fun = shard_map(work, mesh=mesh,
		in_specs=(P(), P(row_axis)), out_specs=out_spec, check_vma=False)
	res = fun(alm, theta_p)
	return res[..., :nt, :]


def analysis_dist(maps, theta, weights, mesh, lmax, mmax=None, phi0=0.0,
		spin=(0, 2), row_axis="rows"):
	"""Ring-sharded analysis: map sharded over rings -> alm (replicated),
	with one psum over the ring axis."""
	maps = jnp.asarray(maps)
	theta = jnp.asarray(theta)
	weights = jnp.asarray(weights, maps.dtype)
	ndev = mesh.shape[row_axis]
	theta_p, weights_p, maps_p, nt = _pad_rings(theta, weights, maps, ndev)
	spin = tuple(np.atleast_1d(spin))
	if mmax is None: mmax = lmax
	def work(m_l, th_l, w_l):
		a = sht.analysis(m_l, th_l, lmax, w_l, mmax=mmax, phi0=phi0, spin=spin)
		ar = jax.lax.psum(a.real, row_axis)
		ai = jax.lax.psum(a.imag, row_axis)
		return jax.lax.complex(ar, ai)
	in_specs = (P(*([None]*(maps.ndim - 2) + [row_axis, None])), P(row_axis), P(row_axis))
	fun = shard_map(work, mesh=mesh, in_specs=in_specs, out_specs=P(),
		check_vma=False)
	return fun(maps_p, theta_p, weights_p)


def roundtrip_step(mesh, lmax, variant="F1", nphi=None, ncomp=3, spin=(0, 2),
		dtype=np.float64, row_axis="rows"):
	"""Build a jittable full SHT round-trip step (map2alm -> filter ->
	alm2map) sharded over rings -- the library's 'training step' analogue."""
	nt = 2*lmax + 2
	if nphi is None: nphi = 2*lmax + 4
	theta = jnp.asarray(sht.ring_theta(variant, nt), dtype)
	weights = jnp.asarray(sht.ring_weights(variant, nt), dtype)
	fl = jnp.asarray(np.exp(-0.5*np.arange(lmax+1)*(np.arange(lmax+1)+1)*(0.01)**2))
	def step(maps):
		alm = analysis_dist(maps, theta, weights, mesh, lmax, spin=spin,
			row_axis=row_axis)
		# harmonic-space filtering (beam smoothing): per-l multiply
		from .. import curvedsky
		alm = curvedsky.almxfl(alm, fl, ainfo=curvedsky.alm_info(lmax=lmax))
		omap = synthesis_dist(alm, theta, nphi, mesh, lmax=lmax, spin=spin,
			row_axis=row_axis)
		return omap, alm
	return step, (nt, nphi)
