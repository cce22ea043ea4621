#!/usr/bin/env python
"""Numerics prototype for an MXU block formulation of the Legendre l-loop.

Idea (VERDICT round-2 item 8): within an l-block [l0, l0+LB) with no seed
insertion and no mid-block rescale, the scaled recurrence
    P_l = a_l (ct P_{l-1} - b_l P_{l-2})
is LINEAR in the block-entry state (curr, prev) = (P_{l0-1}, P_{l0-2}):
    P_{l0+k} = alpha_k(ct) curr + beta_k(ct) prev
with alpha/beta degree-(k+1) polynomials in ct. Carrying alpha/beta as
Chebyshev coefficients on the theta-TILE's own ct interval keeps them
O(max growth over the tile); the synthesis accumulate collapses to
    sum_k A_k P_{l0+k} = (Ba @ V) * curr + (Bb @ V) * prev,
    Ba_j = sum_k A_k alpha_{k,j},   V[j,t] = T_j(x_t),
i.e. a rank-J matmul on the MXU instead of LB sequential VPU steps.

This prototype answers, on CPU in f32:
  1. error of the block path vs the f64 stepwise recurrence, per tile,
     as a function of the tile's growth bound G (log2 max growth);
  2. what fraction of (l-block, m-tile, theta-tile) cells at lmax-5000
     geometry is "eligible" (no seed, growth below a G cutoff).

Run: JAX_PLATFORMS=cpu python scripts/proto_blockleg.py
"""
import os, sys
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp


def ab_coef(l, m):
	"""Recurrence coefficients (f64): P_l = a*(ct*P_{l-1} - b*P_{l-2})."""
	l = np.asarray(l, np.float64); m = np.asarray(m, np.float64)
	a = np.sqrt(np.maximum((2*l - 1)*(2*l + 1), 0.0)
		/ np.maximum((l - m)*(l + m), 0.25))
	b = np.sqrt(np.maximum((l - 1 - m)*(l - 1 + m), 0.0)
		/ np.maximum((2*l - 3)*(2*l - 1), 1.0))
	return a, b


def stepwise(curr, prev, ct, ls, m, dtype):
	"""Reference stepwise propagation over the l list ls. Returns the P
	values at each l ([len(ls), ...]) and the final (curr, prev)."""
	curr = curr.astype(dtype); prev = prev.astype(dtype)
	ct = ct.astype(dtype)
	out = []
	for l in ls:
		a, b = ab_coef(l, m)
		a = dtype(a); b = dtype(b)
		new = a*(ct*curr - b*prev)
		out.append(new)
		prev, curr = curr, new
	return np.stack(out), curr, prev


def block_cheb(curr, prev, ct, ls, m, A=None):
	"""Block propagation in f32 via Chebyshev-coefficient alpha/beta on the
	ct interval [ct.min(), ct.max()]. Returns (accum or P-stack, final curr,
	final prev). A: per-l weights for the synthesis accumulate (None: return
	all P values, for error checks)."""
	f32 = np.float32
	c0 = f32((ct.max() + ct.min())/2)
	h = f32(max((ct.max() - ct.min())/2, 1e-30))
	LB = len(ls)
	J = LB + 2
	# coefficient recurrence in Chebyshev basis: ct*f -> c0*f + h/2*(shift)
	# state: alpha/beta coefficient rows [J] f32 (per single m here)
	al_c = np.zeros(J, f32); al_p = np.zeros(J, f32)
	be_c = np.zeros(J, f32); be_p = np.zeros(J, f32)
	al_c[0] = 1.0   # alpha_{-1} = 1 (coefficient of T_0)
	be_p[0] = 1.0   # beta_{-2} = 1
	Ba = np.zeros(J, f32); Bb = np.zeros(J, f32)
	outs = []
	def ctmul(f):
		# multiply a Chebyshev series by ct = c0 + h*x; x*T_j = (T_{j+1}+T_{j-1})/2
		g = c0*f
		g[1:] += h/2*f[:-1]
		g[:-1] += h/2*f[1:]
		g[1] += h/2*f[0]   # x*T_0 = T_1 (not (T_1+T_{-1})/2): add the other half
		return g
	for k, l in enumerate(ls):
		a, b = ab_coef(l, m)
		a = f32(a); b = f32(b)
		al_n = a*(ctmul(al_c) - b*al_p)
		be_n = a*(ctmul(be_c) - b*be_p)
		al_p, al_c = al_c, al_n
		be_p, be_c = be_c, be_n
		if A is not None:
			Ba += f32(A[k])*al_c
			Bb += f32(A[k])*be_c
		else:
			outs.append((al_c.copy(), be_c.copy()))
	# Vandermonde-Chebyshev V[j, t]
	x = ((ct.astype(f32) - c0)/h).astype(f32)
	V = np.zeros((J, len(ct)), f32)
	V[0] = 1.0; V[1] = x
	for j in range(2, J):
		V[j] = 2*x*V[j-1] - V[j-2]
	curr32 = curr.astype(f32); prev32 = prev.astype(f32)
	fcurr = (al_c @ V)*curr32 + (be_c @ V)*prev32
	fprev = (al_p @ V)*curr32 + (be_p @ V)*prev32
	if A is not None:
		acc = (Ba @ V)*curr32 + (Bb @ V)*prev32
		return acc, fcurr, fprev, max(np.abs(al_c).max(), np.abs(be_c).max())
	P = np.stack([(ac @ V)*curr32 + (bc @ V)*prev32 for ac, bc in outs])
	return P, fcurr, fprev, max(np.abs(al_c).max(), np.abs(be_c).max())


def growth_bits(l0, LB, m_hi, ct_absmax):
	"""Host-side eligibility estimate: sum_k log2 |dominant root| at the
	tile's worst corner (largest m, largest |ct|)."""
	tot = 0.0
	for k in range(LB):
		a, b = ab_coef(l0 + k, m_hi)
		disc = (a*ct_absmax)**2 - 4*a*b
		if disc <= 0:
			continue  # oscillatory: |z| = sqrt(ab) ~ 1
		z = (a*ct_absmax + np.sqrt(disc))/2
		tot += np.log2(max(z, 1.0))
	return tot


def run_tile_check():
	"""Error vs growth-bits across a sweep of tiles at lmax 2000."""
	rng = np.random.default_rng(0)
	lmax = 2000
	nt = 2*lmax + 2
	theta = (np.arange(nt) + 0.5)*np.pi/nt
	ct_full = np.cos(theta)
	LB = 64
	tb = 256   # theta-points per tile in this prototype
	print("## tile error vs growth (lmax=%d, LB=%d, tb=%d)" % (lmax, LB, tb))
	print("%6s %6s %8s %8s %10s %10s %10s" % (
		"l0", "m", "Gbits", "coefmax", "err_P", "err_acc", "err_state"))
	for trial in range(24):
		m = int(rng.integers(0, lmax - 200))
		l0 = int(rng.integers(m + 2, lmax - LB))
		it0 = int(rng.integers(0, nt - tb))
		ct = ct_full[it0:it0+tb]
		# entry state: run the f64 recurrence from the seed to l0-1 with the
		# true seed lambda_mm*N (scaled rep unnecessary at these sizes if we
		# normalize; use logs to avoid underflow: start from a RANDOM bounded
		# state instead -- the propagation is linear, so accuracy vs the f64
		# propagation of the SAME state is the right check)
		curr = rng.standard_normal(tb)
		prev = rng.standard_normal(tb)
		ls = list(range(l0, l0 + LB))
		A = rng.standard_normal(LB)
		P64, c64, p64 = stepwise(curr, prev, ct, ls, m, np.float64)
		P32, c32, p32 = stepwise(curr, prev, ct, ls, m, np.float32)
		acc64 = (A[:, None]*P64).sum(0)
		Pb, cb, pb, coefmax = block_cheb(curr, prev, ct, ls, m)
		accb, cb2, pb2, _ = block_cheb(curr, prev, ct, ls, m, A=A)
		g = growth_bits(l0, LB, m, np.abs(ct).max())
		scale = np.abs(P64).max()
		errP = np.abs(Pb - P64).max()/scale
		errP32 = np.abs(P32 - P64).max()/scale
		erracc = np.abs(accb - acc64).max()/np.abs(acc64).max()
		errst = max(np.abs(cb - c64).max(), np.abs(pb - p64).max())/scale
		print("%6d %6d %8.1f %8.1e %10.2e %10.2e %10.2e   (stepf32 %8.2e)" % (
			l0, m, g, coefmax, errP, erracc, errst, errP32))


def run_eligibility():
	"""Fraction of live (l-block, m-tile, theta-tile) cells eligible at
	lmax-5000 fullsky geometry, by growth cutoff."""
	lmax = 5000
	nt = 10002
	theta = (np.arange(nt) + 0.5)*np.pi/nt
	ct = np.cos(theta)
	LB, MBt, tb = 64, 128, 1024
	nlb = (lmax + 1 + LB - 1)//LB
	nmb = (lmax + 1 + MBt - 1)//MBt
	ntb = (nt + tb - 1)//tb
	cuts = [2.0, 4.0, 8.0, 16.0]
	elig = {c: 0 for c in cuts}
	live = 0
	for ilb in range(nlb):
		l0 = ilb*LB
		for imb in range(nmb):
			m_lo, m_hi = imb*MBt, min((imb+1)*MBt, lmax+1) - 1
			if l0 + LB <= m_lo:
				continue  # fully below diagonal: dead
			seed = (l0 <= m_hi) and (l0 + LB > m_lo)
			for itb in range(ntb):
				cta = np.abs(ct[itb*tb:(itb+1)*tb]).max()
				live += 1
				if seed or l0 < 2:
					continue
				g = growth_bits(l0, LB, m_hi, cta)
				for c in cuts:
					if g <= c:
						elig[c] += 1
	print("## eligibility at lmax=5000 (LB=%d, MB=%d, tb=%d): live cells %d"
		% (LB, MBt, tb, live))
	for c in cuts:
		print("  growth <= %4.1f bits: %5.1f%%" % (c, 100.0*elig[c]/live))


if __name__ == "__main__":
	run_tile_check()
	run_eligibility()
