"""Iterative solvers as jit-compiled lax loops.

The reference's CG/Minres (pixell/utils.py:3586,3658) are python-stepped so
MPI dots can plug in; those live in pixell_tpu.utils. These versions run the
WHOLE solve inside one XLA computation (lax.while_loop over pytrees with a
pluggable dot), so nothing bounces back to the host between iterations --
the right shape for TPU production solves.
"""
from __future__ import annotations
import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def _default_dot(a, b):
	leaves_a = jax.tree_util.tree_leaves(a)
	leaves_b = jax.tree_util.tree_leaves(b)
	return sum(jnp.sum(jnp.real(jnp.conj(x)*y)) for x, y in zip(leaves_a, leaves_b))

def cg_solve(A, b, x0=None, M=None, tol=1e-8, maxiter=500, dot=None):
	"""Preconditioned conjugate gradients for A x = b over arbitrary pytrees.
	A, M: callables; returns (x, info) with info = dict(iters, err)."""
	if dot is None: dot = _default_dot
	if M is None: M = lambda x: x
	x0 = jax.tree_util.tree_map(jnp.zeros_like, b) if x0 is None else x0
	r0 = jax.tree_util.tree_map(lambda bi, ai: bi - ai, b, A(x0))
	z0 = M(r0)
	rz0 = dot(r0, z0)
	def cond(state):
		x, r, z, p, rz, it, err = state
		return (it < maxiter) & (err > tol*tol)
	def body(state):
		x, r, z, p, rz, it, err = state
		Ap = A(p)
		alpha = rz/dot(p, Ap)
		x = jax.tree_util.tree_map(lambda xi, pi: xi + alpha*pi, x, p)
		r = jax.tree_util.tree_map(lambda ri, api: ri - alpha*api, r, Ap)
		z = M(r)
		rz2 = dot(r, z)
		beta = rz2/rz
		p = jax.tree_util.tree_map(lambda zi, pi: zi + beta*pi, z, p)
		return (x, r, z, p, rz2, it + 1, rz2/rz0)
	state = (x0, r0, z0, z0, rz0, jnp.asarray(0), jnp.asarray(jnp.inf, rz0.dtype))
	x, r, z, p, rz, it, err = lax.while_loop(cond, body, state)
	return x, dict(iters=it, err=jnp.sqrt(jnp.abs(err)))

def jacobi_refine(forward, approx_inverse, b, niter=3):
	"""x_{k+1} = x_k + Ainv(b - A x_k): the iterative quadrature refinement
	pattern used by map2alm (reference curvedsky.jacobi_inverse:1122), as a
	reusable fused loop."""
	x = approx_inverse(b)
	def body(i, x):
		r = jax.tree_util.tree_map(lambda bi, fi: bi - fi, b, forward(x))
		dx = approx_inverse(r)
		return jax.tree_util.tree_map(lambda xi, di: xi + di, x, dx)
	return lax.fori_loop(0, niter, body, x)
