"""Spherical-harmonic transform engine: scaled Legendre recurrence scans.

TPU-native replacement for the ducc0 C++ SHT engine the reference wraps
(pixell/curvedsky.py:13, 900-1120). Design:

- Per-ring phase FFTs are ordinary XLA (r)FFTs (see pixell_tpu.sht).
- The Legendre stage is one ``lax.scan`` over degree l (unrolled in blocks of
  LBLOCK), carrying the normalized associated Legendre values lambda_l and
  lambda_{l-1} for ALL (m, theta) simultaneously in a Holmes-Featherstone
  scaled representation: lambda = val * 2^(S*level), val kept in
  [0, 2^S), S = 850 (f64) / 60 (f32), level <= 0 an integer. This keeps lmax >~ 10^4 stable
  near the poles where lambda_mm ~ sin^m(theta) underflows any float.
  Because true lambdas are O(1), only levels {0,-1} can contribute above
  2^-S, so the unscaling factor is a 3-way select with constant factors --
  no transcendentals inside the scan.
- Recurrence coefficients are recomputed on the fly from (l, m) inside the
  scan (O(nm) VPU work per step) instead of materializing O(nl*nm) tables.
- Spin-1/2 and derivative transforms ride the same scan via closed-form
  theta-functions of (lambda_l, lambda_{l-1}) calibrated against the
  Goldberg-formula oracle (tests/oracle.py):

    2Y_lm  = (w2 + x2) e^{im phi},    -2Y_lm = (w2 - x2) e^{im phi}
    1Y_lm  = (w1 + x1) e^{im phi},    -1Y_lm = (-w1 + x1) e^{im phi}
    w2 = N2 [-(2(l-m^2)/sin^2 + l(l-1)) lam + 2 e_lm cos/sin^2 lam']
    x2 = 2 N2 (m/sin^2) [-(l-1) cos lam + e_lm lam']
    w1 = -N1 dlam/dth,  x1 = N1 (m/sin) lam
    dlam/dth = (l cos lam - e_lm lam')/sin
    e_lm = sqrt((l^2-m^2)(2l+1)/(2l-1)), N1 = (l(l+1))^-1/2,
    N2 = ((l-1)l(l+1)(l+2))^-1/2,  lam' = lambda_{l-1,m}

Synthesis and analysis use the same scan with the contraction transposed, so
the pair is adjoint by construction (up to quadrature weights).

Engine contract (mode in {"scalar","deriv","spin1","spin2"}; nfun = 1 for
scalar else 2):
  synthesis_scan(A[nl,nm,ncoef], theta[nt]) -> G[nfun,ncoef,nm,nt]
      G[f,c,m,t] = sum_l u_f(l,m,theta_t) A[l,m,c]
  analysis_scan(F[nfun,ncoef,nm,nt], theta[nt]) -> A[nl,nm,ncoef]
      A[l,m,c] = sum_f sum_t u_f(l,m,theta_t) F[f,c,m,t]
Complex data is carried as real coefficient pairs in the ncoef axis; all
spin/derivative i-factors and sign conventions are applied by the caller
(pixell_tpu.sht), keeping the scan real arithmetic.
"""
from __future__ import annotations
import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

LBLOCK     = 8     # l-steps per scan iteration (static unroll)

def _scale_log2(dtype):
	"""Scaled-representation chunk: lambda = val * 2^(S*level). S must leave
	headroom for within-block growth (up to ~2^56 for lmax ~ 5000) below the
	dtype's overflow: 2^850 for f64, 2^60 for f32."""
	return 850 if np.dtype(dtype) == np.float64 else 60

MODES = {"scalar": 0, "deriv": 1, "spin1": 2, "spin2": 3}
NFUN  = {"scalar": 1, "deriv": 2, "spin1": 2, "spin2": 2}


def seed_log(mmax, dtype=np.float64):
	"""log(|lambda_mm| / sin^m(theta)) for m = 0..mmax and the (-1)^m sign:
	lambda_mm = (-1)^m sqrt((2m+1)/(4pi)) sqrt((2m-1)!!/(2m)!!) sin^m."""
	m = np.arange(mmax+1, dtype=np.float64)
	ratio = np.zeros(mmax+1)
	if mmax >= 1:
		k = np.arange(1, mmax+1, dtype=np.float64)
		ratio[1:] = np.cumsum(np.log((2*k-1)/(2*k)))
	logc = 0.5*(np.log(2*m+1) - np.log(4*np.pi)) + 0.5*ratio
	sign = np.where(m.astype(int) % 2 == 0, 1.0, -1.0)
	return logc.astype(dtype), sign.astype(dtype)


def _scaled_cumprod(fac, S, dtype):
	"""Scaled-representation cumulative product along axis 0: returns
	(val, level) with prod_{k<=m} fac[k] = val[m] * 2^(S*level[m]),
	val in (2^-S, 1]. Implemented as lax.associative_scan with an exact
	power-of-two renormalizing combiner: every operation is a plain
	multiply, so relative error stays ~sqrt(log2 nm)*eps even in float32
	(computing the exponent via exp2(m*log(sin theta)) in f32 instead
	costs ~3 digits at high m from the large-magnitude log)."""
	band = jnp.asarray(2.0**S, dtype)
	invband = jnp.asarray(2.0**-S, dtype)
	lev0 = jnp.zeros_like(fac)
	def comb(a, b):
		av, al = a
		bv, bl = b
		v = av*bv
		# |v|: a negative factor (rounding noise in sin near a pole) must not
		# loop the renormalizer -- v<invband is true for every negative v and
		# the repeated *band blows up to inf (then inf*0 = NaN downstream)
		small = jnp.abs(v) < invband
		v = jnp.where(small, v*band, v)
		return (v, al + bl + jnp.where(small, -1.0, 0.0))
	return jax.lax.associative_scan(comb, (fac, lev0), axis=0)


def _prepare_geom(theta, mmax, dtype):
	"""Seed values in scaled representation plus cached theta-functions.

	The lambda_mm = (-1)^m N_m sin^m(theta) seeds are built as a scaled
	cumulative product over m (see _scaled_cumprod) rather than via
	exp2(m log2 sin theta): in float32 the log formulation loses ~3
	digits at high m (the exponent has magnitude ~1e5 but needs 1e-7
	absolute accuracy). The cumprod form is accurate, works for traced
	and concrete theta alike, and bakes no O(nm*nt) constants into
	outer jits. Concrete theta gets host float64 sin/cos (exact to one
	rounding regardless of jax_enable_x64)."""
	S = _scale_log2(dtype)
	# Pole detection must cover the input dtype's rounding of theta: in f32,
	# sin(fl32(pi)) = -8.7e-8 -- negative and far above 1e-12. A ring whose
	# |sin| is below any physically sensible ring spacing is AT the pole.
	eps_pole = 1e-12 if np.dtype(dtype) == np.float64 else 1e-6
	if not isinstance(theta, jax.core.Tracer):
		th = np.asarray(theta, np.float64)
		st64 = np.sin(th); ct64 = np.cos(th)
		pole = np.abs(st64) < eps_pole
		st64 = np.where(pole, 0.0, np.maximum(st64, 0.0))
		st_safe = np.where(pole, 1.0, st64)
		f = lambda x: jnp.asarray(np.asarray(x, np.float64).astype(dtype))
		st = f(st64); ct = f(ct64)
		# two-part cos(theta) for the f32 recurrence: a plain f32 cos has
		# ~3e-8 ABSOLUTE error near the poles (ct ~ 1) which the recurrence
		# amplifies to O(1); carry the f64 remainder as a separate low part
		# (same fix as the Pallas kernels' cth/ctl)
		ct_lo = f(ct64 - np.asarray(ct, np.float64)) \
			if np.dtype(dtype) == np.float32 else jnp.zeros_like(ct)
		ct_st = f(ct64/st_safe)
		inv_st = f(np.where(pole, 0.0, 1/st_safe))
		inv_st2 = f(np.where(pole, 0.0, 1/(st_safe*st_safe)))
		notpole = f(np.where(pole, 0.0, 1.0))
	else:
		theta = jnp.asarray(theta, dtype)
		st = jnp.sin(theta)
		ct = jnp.cos(theta)
		ct_lo = jnp.zeros_like(ct)
		pole = jnp.abs(st) < eps_pole
		# clamp rounding noise: sin(theta) >= 0 on [0, pi]; a negative value
		# here would make the seed cumprod alternate sign (and before the
		# abs() fix in _scaled_cumprod, explode to NaN)
		st = jnp.where(pole, 0.0, jnp.maximum(st, 0.0))
		st_safe = jnp.where(pole, 1.0, st)
		ct_st = (ct/st_safe).astype(dtype)
		inv_st = jnp.where(pole, 0.0, 1/st_safe).astype(dtype)
		inv_st2 = jnp.where(pole, 0.0, 1/(st_safe*st_safe)).astype(dtype)
		notpole = jnp.where(pole, 0.0, 1.0).astype(dtype)
	# per-m factors: lambda_mm/lambda_(m-1)(m-1) = -sin(theta) sqrt((2m-1)/2m)
	# (sign handled separately); prefix row 1 for m=0
	nt = st.shape[0]
	if mmax >= 1:
		k = np.arange(1, mmax+1, dtype=np.float64)
		rk = jnp.asarray(np.sqrt((2*k - 1)/(2*k)).astype(dtype))
		fac = st[None, :]*rk[:, None]
		fac = jnp.concatenate([jnp.ones((1, nt), dtype), fac], 0)
	else:
		fac = jnp.ones((1, nt), dtype)
	val, level = _scaled_cumprod(fac, S, dtype)
	m = np.arange(mmax+1, dtype=np.float64)
	pref = np.sqrt((2*m + 1)/(4*np.pi))*np.where(m.astype(int) % 2 == 0, 1.0, -1.0)
	val = val*jnp.asarray(pref.astype(dtype))[:, None]
	return dict(
		ct=ct, ct_lo=ct_lo, st=st, seed_val=val, seed_level=level,
		ct_st=ct_st, inv_st=inv_st, inv_st2=inv_st2, notpole=notpole)


def _funcs_at_l(lf, g, marr, m2, lam, lam1, mode):
	"""Component theta-functions u_f(l, m, theta) as [nm, nt] arrays.
	lam/lam1 are the TRUE (unscaled) lambda_l / lambda_{l-1}."""
	if mode == 0:
		return [lam]
	dtype = lam.dtype
	e = jnp.sqrt(jnp.maximum((lf*lf - m2)*(2*lf + 1), 0.0)
		/ jnp.maximum(2*lf - 1, 1.0)).astype(dtype)[:, None]
	# The spin/derivative functions contain 1/sin factors whose pole limits
	# cancel analytically; numerically we zero the pole rows instead (they
	# only occur on CC grids and carry negligible quadrature weight).
	np_ = g["notpole"][None, :]
	ispole = 1.0 - g["notpole"]
	north = ispole*jnp.where(g["ct"] > 0, 1.0, 0.0)
	south = ispole*jnp.where(g["ct"] < 0, 1.0, 0.0)
	plm  = jnp.sqrt((2*lf + 1)/(4*np.pi))
	sgl  = jnp.where(jnp.asarray(lf) % 2 == 0, 1.0, -1.0)
	if mode == 1:
		dlam = (lf*g["ct_st"][None, :]*lam - e*g["inv_st"][None, :]*lam1)*np_
		# pole limit: only m=1 has a nonzero theta-derivative
		m1sel = (marr == 1)[:, None]
		n1l = jnp.sqrt(jnp.maximum(lf*(lf+1), 0.0))
		dpole = -n1l*plm/2*(north + sgl*south)[None, :]
		dlam = dlam + jnp.where(m1sel, dpole, 0.0)*(lf >= 1)
		return [lam, dlam]
	if mode == 2:
		n1 = (1/jnp.sqrt(jnp.maximum(lf*(lf+1), 1.0))).astype(dtype)
		valid = jnp.where(lf >= 1, 1.0, 0.0).astype(dtype)
		dlam = lf*g["ct_st"][None, :]*lam - e*g["inv_st"][None, :]*lam1
		w1 = -n1*dlam*valid*np_
		x1 = n1*marr[:, None]*g["inv_st"][None, :]*lam*valid*np_
		m1sel = (marr == 1)[:, None]
		wp = plm/2*(north + sgl*south)[None, :]
		xp = plm/2*(-north + sgl*south)[None, :]
		w1 = w1 + jnp.where(m1sel, wp, 0.0)*valid
		x1 = x1 + jnp.where(m1sel, xp, 0.0)*valid
		return [w1, x1]
	if mode == 3:
		n2 = (1/jnp.sqrt(jnp.maximum((lf-1)*lf*(lf+1)*(lf+2), 1.0))).astype(dtype)
		valid = jnp.where(lf >= 2, 1.0, 0.0).astype(dtype)
		i2 = g["inv_st2"][None, :]
		ct = g["ct"][None, :]
		w2 = n2*(-(2*(lf - m2[:, None])*i2 + lf*(lf-1))*lam + 2*e*ct*i2*lam1)*valid*np_
		x2 = 2*n2*marr[:, None]*i2*(-(lf-1)*ct*lam + e*lam1)*valid*np_
		m2sel = (marr == 2)[:, None]
		wp = plm/2*(north + sgl*south)[None, :]
		xp = plm/2*(-north + sgl*south)[None, :]
		w2 = w2 + jnp.where(m2sel, wp, 0.0)*valid
		x2 = x2 + jnp.where(m2sel, xp, 0.0)*valid
		return [w2, x2]
	raise ValueError(mode)


def _scan_core(theta, lmax, mmax, mode, dtype, synth, A=None, F=None, ncoef=None):
	g = _prepare_geom(theta, mmax, dtype)
	nt = g["ct"].shape[0]
	nm = mmax + 1
	nl = lmax + 1
	nfun = 1 if mode == 0 else 2
	marr = jnp.arange(nm, dtype=dtype)
	m2 = marr*marr
	x = g["ct"][None, :]          # [1, nt]
	nb = (nl + LBLOCK - 1)//LBLOCK
	nlpad = nb*LBLOCK
	S = _scale_log2(dtype)
	band = jnp.asarray(2.0**S, dtype)
	invband = jnp.asarray(2.0**-S, dtype)
	fac_m1 = jnp.asarray(2.0**-S, dtype)

	if synth:
		ncoef = A.shape[-1]
		Ap = jnp.zeros((nlpad, nm, ncoef), dtype).at[:nl].set(A.astype(dtype))
		xs = (jnp.arange(nb)*LBLOCK, Ap.reshape(nb, LBLOCK, nm, ncoef))
		acc0 = jnp.zeros((nfun, ncoef, nm, nt), dtype)
	else:
		F = F.astype(dtype)        # [nfun, ncoef, nm, nt]
		ncoef = F.shape[1]
		xs = jnp.arange(nb)*LBLOCK

	prev0 = jnp.zeros((nm, nt), dtype)
	curr0 = jnp.zeros((nm, nt), dtype)
	lev0  = jnp.zeros((nm, nt), dtype)

	xlo = g["ct_lo"][None, :]

	def step(l, prev, curr, lev):
		"""One recurrence step: returns updated (prev, curr, lev) and the true
		lambda_l, lambda_{l-1} values."""
		lf = jnp.asarray(l, dtype)
		# numerator clamped >= 0 so that pre-seed rows (l < m) stay exactly 0
		# instead of becoming NaN (which would poison emissions via NaN*0).
		# FACTORED differences ((l-m)(l+m), exact in f32 up to l ~ 8M) dodge
		# the l^2 - m^2 cancellation above l = 4096 (same as the Pallas
		# kernels' ab tables, sht_pallas._recur_ab_tables).
		a = jnp.sqrt(jnp.maximum((2*lf - 1)*(2*lf + 1), 0.0)
			/ jnp.maximum((lf - marr)*(lf + marr), 0.25))[:, None]
		b = jnp.sqrt(jnp.maximum((lf - 1 - marr)*(lf - 1 + marr), 0.0)
			/ jnp.maximum((2*lf - 3)*(2*lf - 1), 1.0))[:, None]
		new = a*((x*curr + xlo*curr) - b*prev)
		seedmask = (marr == lf)[:, None]
		new = jnp.where(seedmask, g["seed_val"], new)
		lev = jnp.where(seedmask, g["seed_level"], lev)
		# zero the stale "previous" value at the seed point (different scale)
		currz = jnp.where(seedmask, 0.0, curr)
		# unscale factor: only levels 0 and -1 can contribute
		fac = jnp.where(lev == 0, jnp.asarray(1.0, dtype),
			jnp.where(lev == -1, fac_m1, jnp.asarray(0.0, dtype)))
		return currz, new, lev, new*fac, currz*fac

	def rescale(prev, curr, lev):
		big = jnp.abs(curr) > band
		return (jnp.where(big, prev*invband, prev),
			jnp.where(big, curr*invband, curr),
			jnp.where(big, lev + 1, lev))

	if synth:
		def body(carry, xblk):
			prev, curr, lev, acc = carry
			l0, ablk = xblk
			for i in range(LBLOCK):
				l = l0 + i
				prev, curr, lev, lam, lam1 = step(l, prev, curr, lev)
				us = _funcs_at_l(jnp.asarray(l, dtype), g, marr, m2, lam, lam1, mode)
				for f, u in enumerate(us):
					# acc[f,c] += u[m,t] * a[m,c]
					acc = acc.at[f].add(u[None, :, :]*ablk[i].T[:, :, None])
			prev, curr, lev = rescale(prev, curr, lev)
			return (prev, curr, lev, acc), None
		(_, _, _, acc), _ = lax.scan(body, (prev0, curr0, lev0, acc0), xs)
		return acc
	else:
		def body(carry, l0):
			prev, curr, lev = carry
			ys = []
			for i in range(LBLOCK):
				l = l0 + i
				prev, curr, lev, lam, lam1 = step(l, prev, curr, lev)
				us = _funcs_at_l(jnp.asarray(l, dtype), g, marr, m2, lam, lam1, mode)
				# y[m,c] = sum_f sum_t u_f[m,t] F[f,c,m,t]
				y = jnp.zeros((nm, ncoef), dtype)
				for f, u in enumerate(us):
					y = y + jnp.einsum("mt,cmt->mc", u, F[f])
				ys.append(y)
			prev, curr, lev = rescale(prev, curr, lev)
			return (prev, curr, lev), jnp.stack(ys)
		_, ys = lax.scan(body, (prev0, curr0, lev0), xs)
		return ys.reshape(nlpad, nm, ncoef)[:nl]


@functools.partial(jax.jit, static_argnames=("lmax", "mmax", "mode", "dtype"))
def synthesis_scan(A, theta, lmax, mmax, mode="scalar", dtype=np.float64):
	"""G[f,c,m,t] = sum_l u_f(l,m,theta_t) A[l,m,c]."""
	return _scan_core(theta, lmax, mmax, MODES[mode], np.dtype(dtype), True, A=A)

@functools.partial(jax.jit, static_argnames=("lmax", "mmax", "mode", "dtype"))
def analysis_scan(F, theta, lmax, mmax, mode="scalar", dtype=np.float64):
	"""A[l,m,c] = sum_f sum_t u_f(l,m,theta_t) F[f,c,m,t]."""
	return _scan_core(theta, lmax, mmax, MODES[mode], np.dtype(dtype), False, F=F)


# ---------------------------------------------------------------------------
# General spin-s transforms via the Wigner-d l-recurrence. The reference
# supports arbitrary spin through ducc0 (pixell/curvedsky.py:900-1120,
# spin argument); spins 0/1/2 above use cheaper derivative-based forms, and
# this engine covers |s| > 2 with the same emission contract ([w, x]
# theta-functions feeding the shared P1/P2 combination in pixell_tpu.sht).
#
# Math: sYlm = (w + x) e^{im phi}, -sYlm agrees up to the sign pattern
#   w = (lam_p + (-1)^s lam_m)/2,  x = (lam_p - (-1)^s lam_m)/2
# with lam_p = (-1)^m sqrt((2l+1)/4pi) d^l_{-m,s}(theta) and lam_m its
# s -> -s partner. Both branches obey the 3-term recurrence
#   v_l lam_l = (cos theta +- m s/((l-1) l)) lam_{l-1} - v_{l-1} lam_{l-2},
#   v_l = sqrt((l^2-m^2)(l^2-s^2)) / (l sqrt(4 l^2 - 1)),
# seeded at l0 = max(m, s). Unlike the derivative forms there is no
# 1/sin(theta): poles are regular and need no masking.
# ---------------------------------------------------------------------------
def _scaled_pow_table(base, nmax, S, dtype):
	"""(val, level) tables [nmax+1, nt] of base^k in scaled representation,
	via _scaled_cumprod (base in [0, 1])."""
	nt = base.shape[0]
	fac = jnp.concatenate([jnp.ones((1, nt), dtype),
		jnp.broadcast_to(base[None, :], (nmax, nt)).astype(dtype)], 0)
	return _scaled_cumprod(fac, S, dtype)


def _wigner_seed_norms(mmax, s, S):
	"""Host-side scaled norm vectors N_p, N_m [nm] with
	N = sqrt((2 l0 + 1)/4pi (2 l0)!/((m+s)! |m-s|!)), l0 = max(m, s),
	including the (-1)^m convention sign and the (-1)^(s-m) branch sign
	for m < s on the -s branch. Returned as (val, level) pairs."""
	from math import lgamma
	m = np.arange(mmax+1)
	l0 = np.maximum(m, s)
	ln = np.array([0.5*(lgamma(2*L+1) - lgamma(mm+s+1) - lgamma(abs(mm-s)+1))
		for L, mm in zip(l0, m)])
	log2N = (ln + 0.5*np.log((2*l0+1)/(4*np.pi)))/np.log(2.0)
	level = np.floor(log2N/S)
	val = np.exp2(log2N - level*S)
	sign_m = np.where(m % 2 == 0, 1.0, -1.0)
	sgn_branch = np.where(m < s, np.where((s - m) % 2 == 0, 1.0, -1.0), 1.0)
	return (val*sign_m, level), (val*sign_m*sgn_branch, level)


def _wigner_seeds(theta, mmax, s, dtype):
	"""Seed tables (val, level) [2, nm, nt] for the +s/-s branches at
	l0 = max(m, s), in scaled representation: N[m] sin(t/2)^a cos(t/2)^b
	with (a, b) = (m+s, |m-s|) for +s and swapped for -s. Built from
	scaled power tables, so float32 accuracy is ~sqrt(log nm) ulp and
	poles (sin or cos of theta/2 = 0) come out exactly right."""
	S = _scale_log2(dtype)
	if not isinstance(theta, jax.core.Tracer):
		th = np.asarray(theta, np.float64)
		sb = jnp.asarray(np.maximum(np.sin(th/2), 0.0).astype(dtype))
		cb = jnp.asarray(np.maximum(np.cos(th/2), 0.0).astype(dtype))
	else:
		th = jnp.asarray(theta, dtype)
		# sin/cos(theta/2) >= 0 on [0, pi]; clamp the f32 rounding noise at
		# theta = pi (cos(fl32(pi)/2) = -4.4e-8) which would feed a negative
		# base into the scaled power tables
		sb = jnp.maximum(jnp.sin(th/2), 0.0)
		cb = jnp.maximum(jnp.cos(th/2), 0.0)
	m = np.arange(mmax+1)
	a = m + s; b = np.abs(m - s)
	Pv, Pl = _scaled_pow_table(sb, mmax + s, S, dtype)
	Qv, Ql = _scaled_pow_table(cb, mmax + s, S, dtype)
	(Npv, Npl), (Nmv, Nml) = _wigner_seed_norms(mmax, s, S)
	Npv = jnp.asarray(Npv.astype(np.float64).astype(dtype)); Npl = jnp.asarray(Npl.astype(dtype))
	Nmv = jnp.asarray(Nmv.astype(np.float64).astype(dtype)); Nml = jnp.asarray(Nml.astype(dtype))
	def build(Nv, Nl, ea, eb):
		v = Nv[:, None]*Pv[ea]*Qv[eb]
		lv = Nl[:, None] + Pl[ea] + Ql[eb]
		# product of three scaled values can undershoot by up to 2 bands
		for _ in range(3):
			small = (v != 0) & (jnp.abs(v) < 2.0**-S)
			v = jnp.where(small, v*2.0**S, v)
			lv = jnp.where(small, lv - 1.0, lv)
		big = jnp.abs(v) > 2.0**S
		v = jnp.where(big, v*2.0**-S, v)
		lv = jnp.where(big, lv + 1.0, lv)
		# canonicalize to level <= 0 wherever the value allows it: the
		# recurrence emits only at level 0 (val) and -1 (val*2^-S), so an
		# O(1) seed stored as (2^-S, level=+1) -- which happens near the
		# seed's peak for m with log2 N > S, i.e. m > ~61 in f32 -- would
		# otherwise be silently dropped
		for _ in range(2):
			down = (lv > 0) & (jnp.abs(v) <= 1.0)
			v = jnp.where(down, v*2.0**S, v)
			lv = jnp.where(down, lv - 1.0, lv)
		return v, lv
	vp, lp = build(Npv, Npl, a, b)
	vm, lm = build(Nmv, Nml, b, a)
	return jnp.stack([vp, vm]), jnp.stack([lp, lm])


def _wigner_scan_core(theta, lmax, mmax, s, dtype, synth, A=None, F=None):
	"""Shared scan for general-spin synthesis/analysis. Same contract as
	_scan_core's spin modes: synthesis returns G[2(fun=w,x), ncoef, nm, nt],
	analysis returns A[nl, nm, ncoef]."""
	g = _prepare_geom(theta, mmax, dtype)   # for ct/st (seed tables separate)
	seed_val, seed_level = _wigner_seeds(theta, mmax, s, dtype)  # [2, nm, nt]
	nt = g["ct"].shape[0]
	nm = mmax + 1
	nl = lmax + 1
	marr = jnp.arange(nm, dtype=dtype)
	m2 = marr*marr
	l0arr = jnp.maximum(marr, float(s))[None, :, None]   # [1, nm, 1]
	x = g["ct"][None, None, :]            # [1, 1, nt]
	sgn_b = jnp.asarray([1.0, -1.0], dtype)[:, None, None]
	s2 = float(s)*float(s)
	sgs = (-1.0)**s
	nb = (nl + LBLOCK - 1)//LBLOCK
	nlpad = nb*LBLOCK
	S = _scale_log2(dtype)
	band = jnp.asarray(2.0**S, dtype)
	invband = jnp.asarray(2.0**-S, dtype)
	fac_m1 = jnp.asarray(2.0**-S, dtype)

	def vcoef(lf):
		num = jnp.maximum((lf*lf - m2)*(lf*lf - s2), 0.0)
		return jnp.sqrt(num)/jnp.maximum(lf*jnp.sqrt(jnp.maximum(4*lf*lf - 1, 0.0)), 1.0)

	def step(l, prev, curr, lev):
		lf = jnp.asarray(l, dtype)
		vl = vcoef(lf)[None, :, None]
		vl1 = vcoef(lf - 1)[None, :, None]
		inv_vl = jnp.where(vl > 0, 1.0/jnp.maximum(vl, 1e-30), 0.0)
		xt = x + sgn_b*(marr[None, :, None]*float(s))/jnp.maximum((lf - 1)*lf, 1.0)
		new = (xt*curr - vl1*prev)*inv_vl
		seedmask = (l0arr == lf)
		new = jnp.where(seedmask, seed_val, new)
		lev = jnp.where(seedmask, seed_level, lev)
		currz = jnp.where(seedmask, 0.0, curr)
		fac = jnp.where(lev == 0, jnp.asarray(1.0, dtype),
			jnp.where(lev == -1, fac_m1, jnp.asarray(0.0, dtype)))
		return currz, new, lev, new*fac, currz*fac

	def rescale(prev, curr, lev):
		big = jnp.abs(curr) > band
		return (jnp.where(big, prev*invband, prev),
			jnp.where(big, curr*invband, curr),
			jnp.where(big, lev + 1, lev))

	def emit(lam):
		# lam [2, nm, nt] true values -> [w, x]
		return [0.5*(lam[0] + sgs*lam[1]), 0.5*(lam[0] - sgs*lam[1])]

	prev0 = jnp.zeros((2, nm, nt), dtype)
	curr0 = jnp.zeros((2, nm, nt), dtype)
	lev0  = jnp.zeros((2, nm, nt), dtype)

	if synth:
		ncoef = A.shape[-1]
		Ap = jnp.zeros((nlpad, nm, ncoef), dtype).at[:nl].set(A.astype(dtype))
		xs = (jnp.arange(nb)*LBLOCK, Ap.reshape(nb, LBLOCK, nm, ncoef))
		acc0 = jnp.zeros((2, ncoef, nm, nt), dtype)
		def body(carry, xblk):
			prev, curr, lev, acc = carry
			l0_, ablk = xblk
			for i in range(LBLOCK):
				l = l0_ + i
				prev, curr, lev, lam, lam1 = step(l, prev, curr, lev)
				us = emit(lam)
				for f, u in enumerate(us):
					acc = acc.at[f].add(u[None, :, :]*ablk[i].T[:, :, None])
			prev, curr, lev = rescale(prev, curr, lev)
			return (prev, curr, lev, acc), None
		(_, _, _, acc), _ = lax.scan(body, (prev0, curr0, lev0, acc0), xs)
		return acc
	else:
		F = F.astype(dtype)
		ncoef = F.shape[1]
		xs = jnp.arange(nb)*LBLOCK
		def body(carry, l0_):
			prev, curr, lev = carry
			ys = []
			for i in range(LBLOCK):
				l = l0_ + i
				prev, curr, lev, lam, lam1 = step(l, prev, curr, lev)
				us = emit(lam)
				y = jnp.zeros((nm, ncoef), dtype)
				for f, u in enumerate(us):
					y = y + jnp.einsum("mt,cmt->mc", u, F[f])
				ys.append(y)
			prev, curr, lev = rescale(prev, curr, lev)
			return (prev, curr, lev), jnp.stack(ys)
		_, ys = lax.scan(body, (prev0, curr0, lev0), xs)
		return ys.reshape(nlpad, nm, ncoef)[:nl]


@functools.partial(jax.jit, static_argnames=("lmax", "mmax", "s", "dtype"))
def wigner_synthesis_scan(A, theta, lmax, mmax, s, dtype=np.float64):
	"""General-spin synthesis: G[f(w,x), c, m, t] = sum_l u_f(l,m,t) A[l,m,c]."""
	return _wigner_scan_core(theta, lmax, mmax, int(s), np.dtype(dtype), True, A=A)

@functools.partial(jax.jit, static_argnames=("lmax", "mmax", "s", "dtype"))
def wigner_analysis_scan(F, theta, lmax, mmax, s, dtype=np.float64):
	"""General-spin analysis: A[l,m,c] = sum_f sum_t u_f(l,m,t) F[f,c,m,t]."""
	return _wigner_scan_core(theta, lmax, mmax, int(s), np.dtype(dtype), False, F=F)
