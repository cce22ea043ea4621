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
		spin=(0, 2), deriv=False, map_dtype=None, row_axis="rows"):
	"""Ring-sharded synthesis: alm [..., ncomp, nalm] (replicated) ->
	map [..., ncomp, nt, nphi] sharded over rings. No collectives needed.
	deriv=True takes alm [..., nalm] and returns [..., 2, nt, nphi]
	(d/dtheta, d/dphi) like sht.synthesis."""
	alm = jnp.asarray(alm)
	theta = jnp.asarray(theta)
	ndev = mesh.shape[row_axis]
	theta_p, _, _, nt = _pad_rings(theta, None, None, ndev)
	spin = tuple(np.atleast_1d(spin))
	def work(alm_l, theta_l):
		return sht.synthesis(alm_l, theta_l, nphi, phi0=phi0, lmax=lmax,
			mmax=mmax, spin=spin, deriv=deriv, map_dtype=map_dtype)
	# output dims: alm batch dims + (ncomp or 2 if deriv) + (nt, nphi)
	out_ndim = alm.ndim + (2 if deriv else 1)
	out_spec = P(*([None]*(out_ndim - 2) + [row_axis, None]))
	fun = shard_map(work, mesh=mesh,
		in_specs=(P(), P(row_axis)), out_specs=out_spec, check_vma=False)
	res = fun(alm, theta_p)
	return res[..., :nt, :]


def analysis_dist(maps, theta, weights, mesh, lmax, mmax=None, phi0=0.0,
		spin=(0, 2), deriv=False, row_axis="rows"):
	"""Ring-sharded analysis: map sharded over rings -> alm (replicated),
	with one psum over the ring axis. weights=None gives the pure adjoint
	of synthesis (no quadrature weights)."""
	maps = jnp.asarray(maps)
	theta = jnp.asarray(theta)
	if weights is not None:
		weights = jnp.asarray(weights, _rdt(maps.dtype))
	ndev = mesh.shape[row_axis]
	theta_p, weights_p, maps_p, nt = _pad_rings(theta, weights, maps, ndev)
	spin = tuple(np.atleast_1d(spin))
	if mmax is None: mmax = lmax
	def psum_c(a):
		ar = jax.lax.psum(a.real, row_axis)
		ai = jax.lax.psum(a.imag, row_axis)
		return jax.lax.complex(ar, ai)
	map_spec = P(*([None]*(maps.ndim - 2) + [row_axis, None]))
	if weights is None:
		def work(m_l, th_l):
			return psum_c(sht.adjoint_synthesis(m_l, th_l, lmax, mmax=mmax,
				phi0=phi0, spin=spin, deriv=deriv))
		fun = shard_map(work, mesh=mesh, in_specs=(map_spec, P(row_axis)),
			out_specs=P(), check_vma=False)
		return fun(maps_p, theta_p)
	def work(m_l, th_l, w_l):
		return psum_c(sht.analysis(m_l, th_l, lmax, w_l, mmax=mmax,
			phi0=phi0, spin=spin, deriv=deriv))
	fun = shard_map(work, mesh=mesh, in_specs=(map_spec, P(row_axis),
		P(row_axis)), out_specs=P(), check_vma=False)
	return fun(maps_p, theta_p, weights_p)

def _rdt(dtype):
	return np.float32 if np.dtype(dtype) in (np.float32, np.complex64) \
		else np.float64


# ---------------------------------------------------------------------------
# m-sharded transforms (SURVEY.md section 5: "m-parallel SHT = sequence
# parallelism"). The alm lives in the RECTANGULAR complex representation
# rect[..., ncomp, nl, nm], sharded over its m axis: the Legendre recurrence
# is elementwise in m, so the whole harmonic side (alm memory + Legendre
# flops) shards with the mesh, and the only communication is the phase
# transpose (m-sharded -> ring-sharded) before/after the ring FFTs, which
# GSPMD lowers to an all-to-all. Unlike ring sharding, this scales the
# ALM-SIDE memory, the binding constraint at lmax 10k+.
# ---------------------------------------------------------------------------
def _constrain(x, mesh, spec):
	return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

def _pad_mmax(lmax, mmax, mesh, m_axis):
	"""GSPMD silently REPLICATES an array whose sharded axis does not divide
	the mesh axis, so run the m-sharded path at the smallest padded mmax
	with (mmax+1) % ndev == 0. The extra columns are exact zeros: the scan
	engine masks l >= m, so mmax may exceed lmax (verified: tail columns
	come out exactly 0)."""
	nd = mesh.shape[m_axis]
	return -(-(mmax + 1)//nd)*nd - 1

def synthesis_dist_m(rect, theta, nphi, mesh, phi0=0.0, lmax=None, mmax=None,
		spin=(0, 2), m_axis="cols", row_axis="rows"):
	"""m-sharded synthesis: rect [..., ncomp, nl, nm] sharded over m ->
	map sharded over rings. The Legendre stage runs fully m-local; GSPMD
	inserts one all-to-all at the phase -> ring-FFT boundary. Uses the jnp
	scan engine (float64 Legendre), which partitions under GSPMD."""
	rect = jnp.asarray(rect)
	if lmax is None: lmax = rect.shape[-2] - 1
	if mmax is None: mmax = rect.shape[-1] - 1
	mpad = _pad_mmax(lmax, mmax, mesh, m_axis)
	if mpad > mmax:
		rect = jnp.pad(rect, [(0, 0)]*(rect.ndim-1) + [(0, mpad - mmax)])
	rect = _constrain(rect, mesh, P(*([None]*(rect.ndim-1) + [m_axis])))
	spin = tuple(np.atleast_1d(spin))
	out = sht.synthesis_rect(rect, theta, nphi, phi0=phi0, lmax=lmax,
		mmax=mpad, spin=spin)
	return _constrain(out, mesh, P(*([None]*(out.ndim-2) + [row_axis, None])))

def analysis_dist_m(maps, theta, weights, mesh, lmax, mmax=None, phi0=0.0,
		spin=(0, 2), m_axis="cols", row_axis="rows"):
	"""m-sharded analysis: ring-sharded map -> rect [..., ncomp, nl, nm]
	sharded over m (nm padded up to a mesh-axis multiple; the pad columns
	are zeroed). Ring FFTs are ring-local; one all-to-all moves the phase
	coefficients to m sharding; the Legendre transpose and the output alm
	are m-local (per-device alm memory = nl*nm/ndev)."""
	maps = _constrain(jnp.asarray(maps), mesh,
		P(*([None]*(maps.ndim-2) + [row_axis, None])))
	spin = tuple(np.atleast_1d(spin))
	if mmax is None: mmax = lmax
	mpad = _pad_mmax(lmax, mmax, mesh, m_axis)
	rect = sht.analysis_rect(maps, theta, lmax, weights, mmax=mpad, phi0=phi0,
		spin=spin)
	if mpad > mmax:
		# the pad columns hold real m in (mmax, mpad] coefficients; the caller
		# asked for mmax, so zero them (keeps roundtrips at the stated mmax)
		mv = jnp.arange(mpad + 1)
		rect = jnp.where(mv <= mmax, rect, 0)
	return _constrain(rect, mesh, P(*([None]*(rect.ndim-1) + [m_axis])))


def roundtrip_step(mesh, lmax, variant="F1", nphi=None, ncomp=3, spin=(0, 2),
		dtype=np.float64, row_axis="rows", shard="rings"):
	"""Build a jittable full SHT round-trip step (map2alm -> filter ->
	alm2map) -- the library's 'training step' analogue.

	shard="rings": theta-sharded transforms with a psum (alm replicated).
	shard="m": m-sharded transforms; the harmonic side stays sharded over
	the mesh's m axis end to end (alm memory scales down with the mesh) and
	the filter multiply runs on the sharded rect representation."""
	nt = 2*lmax + 2
	if nphi is None: nphi = 2*lmax + 4
	theta = jnp.asarray(sht.ring_theta(variant, nt), dtype)
	weights = jnp.asarray(sht.ring_weights(variant, nt), dtype)
	fl = jnp.asarray(np.exp(-0.5*np.arange(lmax+1)*(np.arange(lmax+1)+1)*(0.01)**2))
	if shard == "m":
		m_axis = "cols" if "cols" in mesh.shape else row_axis
		def step(maps):
			rect = analysis_dist_m(maps, theta, weights, mesh, lmax,
				spin=spin, m_axis=m_axis, row_axis=row_axis)
			rect = rect*fl.astype(rect.real.dtype)[:, None]  # per-l filter, m-local
			omap = synthesis_dist_m(rect, theta, nphi, mesh, lmax=lmax,
				spin=spin, m_axis=m_axis, row_axis=row_axis)
			# pin the output shardings (jit would otherwise pick its own)
			rect = _constrain(rect, mesh, P(None, None, m_axis))
			omap = _constrain(omap, mesh, P(None, row_axis, None))
			return omap, rect
		return step, (nt, nphi)
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
