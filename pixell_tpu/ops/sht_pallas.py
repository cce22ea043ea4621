"""Pallas TPU kernel for the Legendre stage of the SHT.

The jnp scan in sht_core is HBM-bandwidth-bound: the (nm, nt) recurrence
carries roundtrip HBM on every degree l, giving O(lmax^3) words of traffic.
This kernel runs the l-loop INSIDE VMEM: the grid tiles (m, theta), each
tile iterates over all l with the recurrence state in VMEM scratch, so HBM
traffic is O(lmax^2) (read the alm once, write the map-coefficient block
once). Numerically identical algorithm to sht_core (same scaled
representation, S = 60 for float32).

Float32 only (Mosaic has no f64); float64 falls back to the jnp scan.
Synthesis:  G[f,c,m,t] = sum_l u_f(l,m,t) A[l,m,c]
Analysis:   out[l,m,c] = sum_f sum_t u_f(l,m,t) F[f,c,m,t]
"""
from __future__ import annotations
import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from . import sht_core

MB = 128    # m-block (lane dim of the A block: must be a multiple of 128)
TB = 1024   # theta-block (lane dim of the state tiles) for nfun*C <= 2
LB = 16     # l-steps per grid step
# Tile sweep on v5e at lmax=5000 (synthesis): (256,256) 1.12 s,
# (128,512) 0.79 s, (128,1024) 0.72 s; wider theta tiles win (lane-dim
# efficiency), larger still fails to compile (VMEM). The VMEM footprint
# scales with nfun*C (output block + accumulators), so wide spin
# transforms shrink the theta tile to stay under the 16MB scoped limit.

def _pick_tb(nfun, C, nt=None):
	n = nfun*C
	if n <= 2: tb = TB
	elif n <= 4: tb = 512
	else: tb = 256
	if nt is not None:
		# don't pad a short ring set up to a full tile: the kernel cost is
		# proportional to the padded theta extent (lane dim multiples of 256)
		need = max(_ceil(nt, 256)*256, 256)
		tb = min(tb, need)
	return tb

S32 = 60    # scale chunk for f32 (must match sht_core._scale_log2(float32))

# Parity of each mode function under theta -> pi - theta:
# u_f(pi-theta) = PSIGN[f] * (-1)^(l+m) * u_f(theta). lam is even in this
# sense; theta-derivative-like functions pick up an extra minus (the pole
# correction terms in _make_funcs encode exactly these signs via sgl).
PSIGN = {"scalar": (1,), "deriv": (1, -1), "spin1": (-1, 1), "spin2": (1, -1)}


def _ceil(a, b): return -(-a//b)


SYM_MAX_NH = 1536  # only use the half-sky kernels below this ring count:
# per-(tile, l-step) work is a fixed [MB, tb] regardless of nt, so halving
# the rings only halves the TILE count while the doubled accumulators add
# ~1.3x per-step cost -- measured a net LOSS at lmax 5000 (353 vs 287 ms)
# and a win at lmax 750 (450 rings fit one tile).

def _detect_sym(theta):
	"""If theta is a concrete, south-symmetric ring set (theta[::-1] ==
	pi - theta), return the number of northern rings nh (pair i <-> nt-1-i;
	for odd nt the middle ring pairs with itself), else None. Symmetry lets
	the kernels run the Legendre recurrence on half the rings."""
	import jax
	if isinstance(theta, jax.core.Tracer): return None
	th = np.asarray(theta, np.float64)
	if th.ndim != 1 or th.shape[0] < 16: return None
	if th.shape[0] > 2*SYM_MAX_NH: return None
	# tolerance absorbs f32 ring positions; real ring spacings are >> 1e-6
	if not np.allclose(th[::-1], np.pi - th, atol=1e-6): return None
	return (th.shape[0] + 1)//2


def _step_block(l, marr, m2, ct, seedv, seedl, prev, curr, lev, fac_m1):
	"""One recurrence step on a [MB, TB] tile. Returns updated state and the
	true lambda_l / lambda_{l-1} (unscaled)."""
	lf = l.astype(jnp.float32)
	a = jnp.sqrt(jnp.maximum(4*lf*lf - 1, 0.0)/jnp.maximum(lf*lf - m2, 0.25))
	b = jnp.sqrt(jnp.maximum((lf-1)*(lf-1) - m2, 0.0)
		/ jnp.maximum(4*(lf-1)*(lf-1) - 1, 1.0))
	new = a*(ct*curr - b*prev)
	seedmask = (marr == lf)
	new = jnp.where(seedmask, seedv, new)
	lev = jnp.where(seedmask, seedl, lev)
	currz = jnp.where(seedmask, 0.0, curr)
	fac = jnp.where(lev == 0, 1.0, jnp.where(lev == -1, fac_m1, 0.0))
	return currz, new, lev, new*fac, currz*fac

def _rescale(prev, curr, lev, band, invband):
	big = jnp.abs(curr) > band
	return (jnp.where(big, prev*invband, prev),
		jnp.where(big, curr*invband, curr),
		jnp.where(big, lev + 1, lev))


def _make_funcs(mode):
	"""Returns nfun and a function (l, marr, m2, th, lam, lam1) -> [u_f]."""
	midx = sht_core.MODES[mode]
	def funcs(lf, marr, m2, th, lam, lam1):
		ct, ct_st, inv_st, inv_st2, notpole = th
		if midx == 0:
			return [lam]
		e = jnp.sqrt(jnp.maximum((lf*lf - m2)*(2*lf + 1), 0.0)
			/ jnp.maximum(2*lf - 1, 1.0))
		north = (1.0 - notpole)*jnp.where(ct > 0, 1.0, 0.0)
		south = (1.0 - notpole)*jnp.where(ct < 0, 1.0, 0.0)
		plm = jnp.sqrt((2*lf + 1)/(4*np.pi))
		sgl = 1.0 - 2.0*(jnp.mod(lf, 2.0))
		if midx == 1:
			dlam = (lf*ct_st*lam - e*inv_st*lam1)*notpole
			m1sel = (marr == 1)
			n1l = jnp.sqrt(jnp.maximum(lf*(lf+1), 0.0))
			dlam = dlam + jnp.where(m1sel, -n1l*plm/2*(north + sgl*south), 0.0)*(lf >= 1)
			return [lam, dlam]
		if midx == 2:
			n1 = 1/jnp.sqrt(jnp.maximum(lf*(lf+1), 1.0))
			valid = jnp.where(lf >= 1, 1.0, 0.0)
			dlam = lf*ct_st*lam - e*inv_st*lam1
			w1 = -n1*dlam*valid*notpole
			x1 = n1*marr*inv_st*lam*valid*notpole
			m1sel = (marr == 1)
			w1 = w1 + jnp.where(m1sel, plm/2*(north + sgl*south), 0.0)*valid
			x1 = x1 + jnp.where(m1sel, plm/2*(-north + sgl*south), 0.0)*valid
			return [w1, x1]
		if midx == 3:
			n2 = 1/jnp.sqrt(jnp.maximum((lf-1)*lf*(lf+1)*(lf+2), 1.0))
			valid = jnp.where(lf >= 2, 1.0, 0.0)
			w2 = n2*(-(2*(lf - m2)*inv_st2 + lf*(lf-1))*lam + 2*e*ct*inv_st2*lam1)*valid*notpole
			x2 = 2*n2*marr*inv_st2*(-(lf-1)*ct*lam + e*lam1)*valid*notpole
			m2sel = (marr == 2)
			w2 = w2 + jnp.where(m2sel, plm/2*(north + sgl*south), 0.0)*valid
			x2 = x2 + jnp.where(m2sel, plm/2*(-north + sgl*south), 0.0)*valid
			return [w2, x2]
		raise ValueError(mode)
	return sht_core.NFUN[mode], funcs


def _prep_inputs(theta, lmax, mmax, mode, tb=None):
	"""Host-side padding and seed/theta-function tables (f32)."""
	if tb is None: tb = TB
	g = sht_core._prepare_geom(theta, mmax, np.float32)
	nt = int(np.shape(theta)[0])
	nm = mmax + 1
	nl = lmax + 1
	ntp = _ceil(nt, tb)*tb
	nmp = _ceil(nm, MB)*MB
	nlp = _ceil(nl, LB)*LB
	def padt(x, fill=0.0):
		return jnp.pad(x, (0, ntp - nt), constant_values=fill)
	# dummy rings at theta=pi/2 (harmless; their output is discarded)
	th = jnp.stack([padt(g["ct"]), padt(g["ct_st"]), padt(g["inv_st"]),
		padt(g["inv_st2"]), padt(g["notpole"], 1.0)])
	seedv = jnp.pad(g["seed_val"], ((0, nmp - nm), (0, ntp - nt)))
	seedl = jnp.pad(g["seed_level"], ((0, nmp - nm), (0, ntp - nt)))
	return th, seedv, seedl, (nt, nm, nl, ntp, nmp, nlp)


def synthesis_scan_pallas(A, theta, lmax, mmax, mode="scalar", interpret=False):
	"""Pallas version of sht_core.synthesis_scan (float32). Dispatches to a
	half-sky kernel when the rings are south-symmetric (the recurrence then
	runs on nt/2 rings and the southern values follow from parity)."""
	nh = _detect_sym(theta)
	if nh is None:
		return _synthesis_scan_pallas_full(A, theta, lmax, mmax, mode=mode,
			interpret=interpret)
	nt = int(np.shape(theta)[0])
	theta_h = np.asarray(theta, np.float64)[:nh]
	pair = _synthesis_scan_pallas_sym(A, theta_h, lmax, mmax, mode=mode,
		interpret=interpret)  # [nfun, C, 2, nm, nh]
	north = pair[:, :, 0]
	south = pair[:, :, 1, :, :nt - nh][..., ::-1]
	return jnp.concatenate([north, south], -1)


@functools.partial(jax.jit, static_argnames=("lmax", "mmax", "mode", "interpret"))
def _synthesis_scan_pallas_full(A, theta, lmax, mmax, mode="scalar", interpret=False):
	"""Pallas version of sht_core.synthesis_scan (float32)."""
	A = jnp.asarray(A, jnp.float32)
	nfun, funcs = _make_funcs(mode)
	C = A.shape[-1]
	tb = _pick_tb(nfun, C, nt=int(np.shape(theta)[0]))
	th, seedv, seedl, (nt, nm, nl, ntp, nmp, nlp) = _prep_inputs(theta, lmax, mmax, mode, tb=tb)
	# layout: big axes minor so TPU (8,128) tiling doesn't pad the C axis
	Ap = jnp.zeros((C, nlp, nmp), jnp.float32).at[:, :nl, :nm].set(
		jnp.moveaxis(A, -1, 0))
	grid = (nmp//MB, ntp//tb, nlp//LB)
	band = np.float32(2.0**S32)
	invband = np.float32(2.0**-S32)
	fac_m1 = np.float32(2.0**-S32)

	def kern(a_ref, th_ref, sv_ref, sl_ref, out_ref, prev, curr, lev):
		il = pl.program_id(2)
		im = pl.program_id(0)
		@pl.when(il == 0)
		def _():
			prev[:] = jnp.zeros((MB, tb), jnp.float32)
			curr[:] = jnp.zeros((MB, tb), jnp.float32)
			lev[:] = jnp.zeros((MB, tb), jnp.float32)
			out_ref[:] = jnp.zeros_like(out_ref)
		# blocks entirely below the diagonal (every l < every m) contribute
		# nothing: the recurrence state is still zero there. Skipping them
		# nearly halves the work for square transforms.
		@pl.when((il + 1)*LB > im*MB)
		def _():
			# coefficients depend only on m: compute them on [MB,1] columns and
			# let broadcasting expand over theta (cuts the sqrt work by tb)
			marr = (im*MB + jax.lax.broadcasted_iota(jnp.int32, (MB, 1), 0)).astype(jnp.float32)
			m2 = marr*marr
			thv = [th_ref[i, :][None, :] for i in range(5)]
			ct = thv[0]
			p, c, lv = prev[:], curr[:], lev[:]
			accs = [[jnp.zeros((MB, tb), jnp.float32) for _ in range(C)]
				for _ in range(nfun)]
			for k in range(LB):
				l = (il*LB + k).astype(jnp.float32)
				p, c, lv, lam, lam1 = _step_block(l, marr, m2, ct, sv_ref[:], sl_ref[:],
					p, c, lv, fac_m1)
				us = funcs(l, marr, m2, thv, lam, lam1)
				for f in range(nfun):
					for ci in range(C):
						accs[f][ci] = accs[f][ci] + us[f]*a_ref[ci, k, :][:, None]
				if k % 8 == 7:
					# near the seed the recurrence grows ~sqrt(2m/k) per step;
					# 16 unrescaled f32 steps overflow for m >~ 1000
					p, c, lv = _rescale(p, c, lv, band, invband)
			p, c, lv = _rescale(p, c, lv, band, invband)
			prev[:] = p; curr[:] = c; lev[:] = lv
			out_ref[:] += jnp.stack([jnp.stack(fc) for fc in accs])

	out = pl.pallas_call(
		kern,
		grid=grid,
		in_specs=[
			pl.BlockSpec((C, LB, MB), lambda im, it, il: (0, il, im),
				memory_space=pltpu.VMEM),
			pl.BlockSpec((5, tb), lambda im, it, il: (0, it), memory_space=pltpu.VMEM),
			pl.BlockSpec((MB, tb), lambda im, it, il: (im, it), memory_space=pltpu.VMEM),
			pl.BlockSpec((MB, tb), lambda im, it, il: (im, it), memory_space=pltpu.VMEM),
		],
		out_specs=pl.BlockSpec((nfun, C, MB, tb), lambda im, it, il: (0, 0, im, it),
			memory_space=pltpu.VMEM),
		out_shape=jax.ShapeDtypeStruct((nfun, C, nmp, ntp), jnp.float32),
		scratch_shapes=[
			pltpu.VMEM((MB, tb), jnp.float32),
			pltpu.VMEM((MB, tb), jnp.float32),
			pltpu.VMEM((MB, tb), jnp.float32),
		],
		compiler_params=pltpu.CompilerParams(
			dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
		interpret=interpret,
	)(Ap, th, seedv, seedl)
	return out[:, :, :nm, :nt]


@functools.partial(jax.jit, static_argnames=("lmax", "mmax", "mode", "interpret"))
def _synthesis_scan_pallas_sym(A, theta_h, lmax, mmax, mode="scalar", interpret=False):
	"""Half-sky synthesis: theta_h holds the northern rings of a symmetric
	grid. Returns [nfun, C, 2, nm, nh] with plane 0 = northern ring i, plane
	1 = its mirror ring nt-1-i, obtained from the SAME recurrence pass via
	u_f(pi-th) = PSIGN[f]*(-1)^(l+m)*u_f(th). Legendre work halves; the
	accumulate stage doubles per ring (two hemisphere accumulators), which
	is the cheap part for small nfun*C."""
	A = jnp.asarray(A, jnp.float32)
	nfun, funcs = _make_funcs(mode)
	psign = PSIGN[mode]
	C = A.shape[-1]
	tb = _pick_tb(2*nfun, C, nt=int(np.shape(theta_h)[0]))
	th, seedv, seedl, (nt, nm, nl, ntp, nmp, nlp) = _prep_inputs(theta_h, lmax, mmax, mode, tb=tb)
	Ap = jnp.zeros((C, nlp, nmp), jnp.float32).at[:, :nl, :nm].set(
		jnp.moveaxis(A, -1, 0))
	grid = (nmp//MB, ntp//tb, nlp//LB)
	band = np.float32(2.0**S32)
	invband = np.float32(2.0**-S32)
	fac_m1 = np.float32(2.0**-S32)

	def kern(a_ref, th_ref, sv_ref, sl_ref, out_ref, prev, curr, lev):
		il = pl.program_id(2)
		im = pl.program_id(0)
		@pl.when(il == 0)
		def _():
			prev[:] = jnp.zeros((MB, tb), jnp.float32)
			curr[:] = jnp.zeros((MB, tb), jnp.float32)
			lev[:] = jnp.zeros((MB, tb), jnp.float32)
			out_ref[:] = jnp.zeros_like(out_ref)
		@pl.when((il + 1)*LB > im*MB)
		def _():
			marr = (im*MB + jax.lax.broadcasted_iota(jnp.int32, (MB, 1), 0)).astype(jnp.float32)
			m2 = marr*marr
			# (-1)^m per m row, shared by every l step
			sgn_m = 1.0 - 2.0*jnp.mod(marr, 2.0)
			thv = [th_ref[i, :][None, :] for i in range(5)]
			ct = thv[0]
			p, c, lv = prev[:], curr[:], lev[:]
			accs = [[[jnp.zeros((MB, tb), jnp.float32) for _ in range(C)]
				for _ in range(2)] for _ in range(nfun)]
			for k in range(LB):
				l = (il*LB + k).astype(jnp.float32)
				p, c, lv, lam, lam1 = _step_block(l, marr, m2, ct, sv_ref[:], sl_ref[:],
					p, c, lv, fac_m1)
				us = funcs(l, marr, m2, thv, lam, lam1)
				# LB is even, so (-1)^l depends only on k: a static sign
				sgn_l = 1.0 if k % 2 == 0 else -1.0
				for ci in range(C):
					am = a_ref[ci, k, :][:, None]
					ams = am*sgn_m
					for f in range(nfun):
						accs[f][0][ci] = accs[f][0][ci] + us[f]*am
						if psign[f]*sgn_l > 0:
							accs[f][1][ci] = accs[f][1][ci] + us[f]*ams
						else:
							accs[f][1][ci] = accs[f][1][ci] - us[f]*ams
				if k % 8 == 7:
					p, c, lv = _rescale(p, c, lv, band, invband)
			p, c, lv = _rescale(p, c, lv, band, invband)
			prev[:] = p; curr[:] = c; lev[:] = lv
			out_ref[:] += jnp.stack([jnp.stack([jnp.stack(cc) for cc in hc])
				for hc in accs])

	out = pl.pallas_call(
		kern,
		grid=grid,
		in_specs=[
			pl.BlockSpec((C, LB, MB), lambda im, it, il: (0, il, im),
				memory_space=pltpu.VMEM),
			pl.BlockSpec((5, tb), lambda im, it, il: (0, it), memory_space=pltpu.VMEM),
			pl.BlockSpec((MB, tb), lambda im, it, il: (im, it), memory_space=pltpu.VMEM),
			pl.BlockSpec((MB, tb), lambda im, it, il: (im, it), memory_space=pltpu.VMEM),
		],
		out_specs=pl.BlockSpec((nfun, 2, C, MB, tb), lambda im, it, il: (0, 0, 0, im, it),
			memory_space=pltpu.VMEM),
		out_shape=jax.ShapeDtypeStruct((nfun, 2, C, nmp, ntp), jnp.float32),
		scratch_shapes=[
			pltpu.VMEM((MB, tb), jnp.float32),
			pltpu.VMEM((MB, tb), jnp.float32),
			pltpu.VMEM((MB, tb), jnp.float32),
		],
		compiler_params=pltpu.CompilerParams(
			dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
		interpret=interpret,
	)(Ap, th, seedv, seedl)
	return jnp.moveaxis(out, 1, 2)[:, :, :, :nm, :nt]


def analysis_scan_pallas(F, theta, lmax, mmax, mode="scalar", interpret=False):
	"""Pallas version of sht_core.analysis_scan (float32). Dispatches to the
	half-sky kernel for south-symmetric ring sets."""
	nh = _detect_sym(theta)
	if nh is None:
		return _analysis_scan_pallas_full(F, theta, lmax, mmax, mode=mode,
			interpret=interpret)
	return _analysis_sym_entry(F, np.asarray(theta, np.float64), nh, lmax, mmax,
		mode=mode, interpret=interpret)


def _analysis_sym_entry(F, theta, nh, lmax, mmax, mode="scalar", interpret=False):
	"""Build the even/odd hemisphere combinations and run the half-sky
	analysis kernel (possibly theta-chunked)."""
	F = jnp.asarray(F, jnp.float32)
	nt = F.shape[-1]
	Fn = F[..., :nh]
	ns = nt - nh
	south = F[..., nh:][..., ::-1]  # entry i = ring nt-1-i
	if ns < nh:  # odd nt: the middle ring pairs with itself; its Fs is 0
		south = jnp.pad(south, [(0, 0)]*(F.ndim - 1) + [(0, nh - ns)])
	E = Fn + south
	O = Fn - south
	EO = jnp.stack([E, O], axis=-3)  # [nfun, C, 2, nm, nh]
	out = None
	for i0 in range(0, nh, TCHUNK):
		i1 = min(i0 + TCHUNK, nh)
		part = _analysis_scan_pallas_sym(EO[..., i0:i1], theta[:nh][i0:i1],
			lmax, mmax, mode=mode, interpret=interpret)
		out = part if out is None else out + part
	return out


@functools.partial(jax.jit, static_argnames=("lmax", "mmax", "mode", "interpret"))
def _analysis_scan_pallas_sym(EO, theta_h, lmax, mmax, mode="scalar", interpret=False):
	"""Half-sky analysis kernel. EO[nfun, C, 2, nm, nh] holds E = F_north +
	F_south and O = F_north - F_south on the northern rings; the per-(l,m)
	output picks E or O according to PSIGN[f]*(-1)^(l+m) (the hemisphere
	parity of each mode function). Returns [nl, nm, C]."""
	EO = jnp.asarray(EO, jnp.float32)
	nfun, funcs = _make_funcs(mode)
	psign = PSIGN[mode]
	C = EO.shape[1]
	tb = _pick_tb(2*nfun, C, nt=int(np.shape(theta_h)[0]))
	th, seedv, seedl, (nt, nm, nl, ntp, nmp, nlp) = _prep_inputs(theta_h, lmax, mmax, mode, tb=tb)
	EOp = jnp.zeros((nfun, 2, C, nmp, ntp), jnp.float32).at[:, :, :, :nm, :nt].set(
		jnp.moveaxis(EO, 2, 1))
	ntb = ntp//tb
	grid = (nmp//MB, ntb, nlp//LB)
	band = np.float32(2.0**S32)
	invband = np.float32(2.0**-S32)
	fac_m1 = np.float32(2.0**-S32)

	def kern(f_ref, th_ref, sv_ref, sl_ref, out_ref, prev, curr, lev):
		im = pl.program_id(0)
		il = pl.program_id(2)
		@pl.when(il == 0)
		def _():
			prev[:] = jnp.zeros((MB, tb), jnp.float32)
			curr[:] = jnp.zeros((MB, tb), jnp.float32)
			lev[:] = jnp.zeros((MB, tb), jnp.float32)
		@pl.when((il + 1)*LB <= im*MB)
		def _():
			out_ref[:] = jnp.zeros_like(out_ref)
		@pl.when((il + 1)*LB > im*MB)
		def _():
			marr = (im*MB + jax.lax.broadcasted_iota(jnp.int32, (MB, 1), 0)).astype(jnp.float32)
			m2 = marr*marr
			# m-parity mask per row, shared across l steps
			modd = jnp.mod(marr[:, 0], 2.0) > 0.5  # [MB] bool
			thv = [th_ref[i, :][None, :] for i in range(5)]
			ct = thv[0]
			p, c, lv = prev[:], curr[:], lev[:]
			rows = []
			for k in range(LB):
				l = (il*LB + k).astype(jnp.float32)
				p, c, lv, lam, lam1 = _step_block(l, marr, m2, ct, sv_ref[:], sl_ref[:],
					p, c, lv, fac_m1)
				us = funcs(l, marr, m2, thv, lam, lam1)
				lodd = (k % 2 == 1)  # static: LB is even
				cols = []
				for ci in range(C):
					totE = us[0]*f_ref[0, 0, ci]
					totO = us[0]*f_ref[0, 1, ci]
					# flip planes for odd-parity functions
					if psign[0] < 0: totE, totO = totO, totE
					for f in range(1, nfun):
						if psign[f] > 0:
							totE = totE + us[f]*f_ref[f, 0, ci]
							totO = totO + us[f]*f_ref[f, 1, ci]
						else:
							totE = totE + us[f]*f_ref[f, 1, ci]
							totO = totO + us[f]*f_ref[f, 0, ci]
					sE = jnp.sum(totE, axis=-1)  # [MB]
					sO = jnp.sum(totO, axis=-1)
					# select by (l+m) parity: even -> the "E-plane" sum
					if lodd: cols.append(jnp.where(modd, sE, sO))
					else:    cols.append(jnp.where(modd, sO, sE))
				rows.append(jnp.stack(cols))          # [C, MB]
				if k % 8 == 7:
					p, c, lv = _rescale(p, c, lv, band, invband)
			pr, cr, lr = _rescale(p, c, lv, band, invband)
			prev[:] = pr; curr[:] = cr; lev[:] = lr
			out_ref[:] = jnp.moveaxis(jnp.stack(rows), 0, 1)[None]  # [1, C, LB, MB]

	out = pl.pallas_call(
		kern,
		grid=grid,
		in_specs=[
			pl.BlockSpec((nfun, 2, C, MB, tb), lambda im, it, il: (0, 0, 0, im, it),
				memory_space=pltpu.VMEM),
			pl.BlockSpec((5, tb), lambda im, it, il: (0, it), memory_space=pltpu.VMEM),
			pl.BlockSpec((MB, tb), lambda im, it, il: (im, it), memory_space=pltpu.VMEM),
			pl.BlockSpec((MB, tb), lambda im, it, il: (im, it), memory_space=pltpu.VMEM),
		],
		out_specs=pl.BlockSpec((1, C, LB, MB), lambda im, it, il: (it, 0, il, im),
			memory_space=pltpu.VMEM),
		out_shape=jax.ShapeDtypeStruct((ntb, C, nlp, nmp), jnp.float32),
		scratch_shapes=[
			pltpu.VMEM((MB, tb), jnp.float32),
			pltpu.VMEM((MB, tb), jnp.float32),
			pltpu.VMEM((MB, tb), jnp.float32),
		],
		compiler_params=pltpu.CompilerParams(
			dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
		interpret=interpret,
	)(EOp, th, seedv, seedl)
	return jnp.moveaxis(jnp.sum(out, axis=0), 0, -1)[:nl, :nm]


@functools.partial(jax.jit, static_argnames=("lmax", "mmax", "mode", "interpret"))
def _analysis_scan_pallas_full(F, theta, lmax, mmax, mode="scalar", interpret=False):
	"""Pallas version of sht_core.analysis_scan (float32).
	F: [nfun, C, nm, nt] -> out [nl, nm, C].

	Each (m-tile, theta-tile) cell runs the full l recurrence in VMEM and
	writes its own partial-alm slab (every output block written exactly
	once -- no revisit semantics needed); the theta-tile axis is then summed
	outside the kernel."""
	F = jnp.asarray(F, jnp.float32)
	nfun, funcs = _make_funcs(mode)
	C = F.shape[1]
	tb = _pick_tb(nfun, C, nt=int(np.shape(theta)[0]))
	th, seedv, seedl, (nt, nm, nl, ntp, nmp, nlp) = _prep_inputs(theta, lmax, mmax, mode, tb=tb)
	Fp = jnp.zeros((nfun, C, nmp, ntp), jnp.float32).at[:, :, :nm, :nt].set(F)
	ntb = ntp//tb
	grid = (nmp//MB, ntb, nlp//LB)
	band = np.float32(2.0**S32)
	invband = np.float32(2.0**-S32)
	fac_m1 = np.float32(2.0**-S32)

	def kern(f_ref, th_ref, sv_ref, sl_ref, out_ref, prev, curr, lev):
		im = pl.program_id(0)
		il = pl.program_id(2)
		@pl.when(il == 0)
		def _():
			prev[:] = jnp.zeros((MB, tb), jnp.float32)
			curr[:] = jnp.zeros((MB, tb), jnp.float32)
			lev[:] = jnp.zeros((MB, tb), jnp.float32)
		# below-diagonal blocks produce exactly zero, but each output slab is
		# written only once, so dead blocks still write zeros (cheap)
		@pl.when((il + 1)*LB <= im*MB)
		def _():
			out_ref[:] = jnp.zeros_like(out_ref)
		@pl.when((il + 1)*LB > im*MB)
		def _():
			# coefficients depend only on m: compute them on [MB,1] columns and
			# let broadcasting expand over theta (cuts the sqrt work by tb)
			marr = (im*MB + jax.lax.broadcasted_iota(jnp.int32, (MB, 1), 0)).astype(jnp.float32)
			m2 = marr*marr
			thv = [th_ref[i, :][None, :] for i in range(5)]
			ct = thv[0]
			p, c, lv = prev[:], curr[:], lev[:]
			rows = []
			for k in range(LB):
				l = (il*LB + k).astype(jnp.float32)
				p, c, lv, lam, lam1 = _step_block(l, marr, m2, ct, sv_ref[:], sl_ref[:],
					p, c, lv, fac_m1)
				us = funcs(l, marr, m2, thv, lam, lam1)
				cols = []
				for ci in range(C):
					tot = us[0]*f_ref[0, ci]
					for f in range(1, nfun):
						tot = tot + us[f]*f_ref[f, ci]
					cols.append(jnp.sum(tot, axis=-1))
				rows.append(jnp.stack(cols))          # [C, MB]
				if k % 8 == 7:
					p, c, lv = _rescale(p, c, lv, band, invband)
			pr, cr, lr = _rescale(p, c, lv, band, invband)
			prev[:] = pr; curr[:] = cr; lev[:] = lr
			out_ref[:] = jnp.moveaxis(jnp.stack(rows), 0, 1)[None]  # [1, C, LB, MB]

	out = pl.pallas_call(
		kern,
		grid=grid,
		in_specs=[
			pl.BlockSpec((nfun, C, MB, tb), lambda im, it, il: (0, 0, im, it),
				memory_space=pltpu.VMEM),
			pl.BlockSpec((5, tb), lambda im, it, il: (0, it), memory_space=pltpu.VMEM),
			pl.BlockSpec((MB, tb), lambda im, it, il: (im, it), memory_space=pltpu.VMEM),
			pl.BlockSpec((MB, tb), lambda im, it, il: (im, it), memory_space=pltpu.VMEM),
		],
		out_specs=pl.BlockSpec((1, C, LB, MB), lambda im, it, il: (it, 0, il, im),
			memory_space=pltpu.VMEM),
		out_shape=jax.ShapeDtypeStruct((ntb, C, nlp, nmp), jnp.float32),
		scratch_shapes=[
			pltpu.VMEM((MB, tb), jnp.float32),
			pltpu.VMEM((MB, tb), jnp.float32),
			pltpu.VMEM((MB, tb), jnp.float32),
		],
		compiler_params=pltpu.CompilerParams(
			dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
		interpret=interpret,
	)(Fp, th, seedv, seedl)
	return jnp.moveaxis(jnp.sum(out, axis=0), 0, -1)[:nl, :nm]


TCHUNK = 2048  # theta rings per analysis chunk (bounds the partial-slab memory)

def analysis_scan_pallas_chunked(F, theta, lmax, mmax, mode="scalar", interpret=False):
	"""Memory-bounded analysis: the per-theta-tile partial slabs scale as
	ntb * nl * nm, which overflows HBM for big transforms; process theta in
	chunks (each chunk's recurrence is independent) and sum. Symmetric ring
	sets take the half-sky path (which chunks internally over the northern
	rings, preserving the symmetry win at any size)."""
	F = jnp.asarray(F, jnp.float32)
	nt = F.shape[-1]
	nh = _detect_sym(theta)
	if nh is not None:
		return _analysis_sym_entry(F, np.asarray(theta, np.float64), nh, lmax,
			mmax, mode=mode, interpret=interpret)
	if nt <= TCHUNK:
		return _analysis_scan_pallas_full(F, theta, lmax, mmax, mode=mode,
			interpret=interpret)
	if not isinstance(theta, jax.core.Tracer): theta = np.asarray(theta, np.float64)
	out = None
	for i0 in range(0, nt, TCHUNK):
		i1 = min(i0 + TCHUNK, nt)
		part = _analysis_scan_pallas_full(F[..., i0:i1], theta[i0:i1], lmax, mmax,
			mode=mode, interpret=interpret)
		out = part if out is None else out + part
	return out
