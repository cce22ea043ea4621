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


def _prepare_geom(theta, mmax, dtype):
	"""Seed values in scaled representation plus cached theta-functions.

	For concrete theta (the usual case -- ring geometry is static) all the
	prep runs host-side in true float64 regardless of jax_enable_x64, then
	rounds once to the target dtype. Without this, a disabled-x64 process
	silently computes the m*log(sin theta) seed exponents in f32, costing
	~2.5 decimal digits of transform accuracy."""
	S = _scale_log2(dtype)
	maxlev = 200000//S
	if not isinstance(theta, jax.core.Tracer):
		th = np.asarray(theta, np.float64)
		st = np.sin(th); ct = np.cos(th)
		pole = np.abs(st) < 1e-12
		st_safe = np.where(pole, 1.0, st)
		logc, sign = seed_log(mmax, np.float64)
		m = np.arange(mmax+1, dtype=np.float64)
		with np.errstate(divide="ignore"):
			logst = np.where(pole, -np.inf, np.log(np.abs(st_safe)))
		logl = logc[:, None] + np.where(m[:, None] == 0, 0.0, m[:, None]*logst[None, :])
		log2l = logl/np.log(2.0)
		dead  = ~np.isfinite(log2l) | (log2l < -float(S*maxlev))
		log2l = np.where(dead, -float(S*maxlev), log2l)
		level = np.clip(np.floor(log2l/S), -float(maxlev+1), 0.0)
		val   = np.exp2(log2l - level*S)
		val   = np.where(dead, 0.0, val)*sign[:, None]
		f = lambda x: jnp.asarray(np.asarray(x, np.float64).astype(dtype))
		return dict(
			ct=f(ct), st=f(st), seed_val=f(val), seed_level=f(level),
			ct_st=f(ct/st_safe),
			inv_st=f(np.where(pole, 0.0, 1/st_safe)),
			inv_st2=f(np.where(pole, 0.0, 1/(st_safe*st_safe))),
			notpole=f(np.where(pole, 0.0, 1.0)))
	# traced-theta fallback (distributed SHT shards theta inside shard_map):
	# f64 intermediates here require jax_enable_x64 to be effective.
	theta = jnp.asarray(theta, dtype)
	st = jnp.sin(theta)
	ct = jnp.cos(theta)
	pole = jnp.abs(st) < 1e-12
	st_safe = jnp.where(pole, 1.0, st)
	logc, sign = seed_log(mmax, np.float64)
	m = jnp.arange(mmax+1, dtype=jnp.float64)
	logst = jnp.where(pole, -jnp.inf, jnp.log(jnp.abs(st_safe.astype(jnp.float64))))
	logl = logc[:, None] + jnp.where(m[:, None] == 0, 0.0, m[:, None]*logst[None, :])
	log2l = logl/np.log(2.0)
	dead  = ~jnp.isfinite(log2l) | (log2l < -float(S*maxlev))
	log2l = jnp.where(dead, -float(S*maxlev), log2l)
	level = jnp.clip(jnp.floor(log2l/S), -float(maxlev+1), 0.0)
	val   = jnp.exp2(log2l - level*S)
	val   = jnp.where(dead, 0.0, val)*sign[:, None]
	return dict(
		ct=ct.astype(dtype), st=st.astype(dtype),
		seed_val=val.astype(dtype), seed_level=level.astype(dtype),
		ct_st=(ct/st_safe).astype(dtype),
		inv_st=jnp.where(pole, 0.0, 1/st_safe).astype(dtype),
		inv_st2=jnp.where(pole, 0.0, 1/(st_safe*st_safe)).astype(dtype),
		notpole=jnp.where(pole, 0.0, 1.0).astype(dtype))


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
	sgl  = 1.0 - 2.0*jnp.abs(jnp.asarray(lf, jnp.float64) % 2.0 - 0.0)  # placeholder
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


def _scan_core(g, lmax, mmax, mode, dtype, synth, A=None, F=None, ncoef=None):
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

	def step(l, prev, curr, lev):
		"""One recurrence step: returns updated (prev, curr, lev) and the true
		lambda_l, lambda_{l-1} values."""
		lf = jnp.asarray(l, dtype)
		# numerator clamped >= 0 so that pre-seed rows (l < m) stay exactly 0
		# instead of becoming NaN (which would poison emissions via NaN*0)
		a = jnp.sqrt(jnp.maximum(4*lf*lf - 1, 0.0)/jnp.maximum(lf*lf - m2, 0.25))[:, None]
		b = jnp.sqrt(jnp.maximum((lf-1)*(lf-1) - m2, 0.0)
			/ jnp.maximum(4*(lf-1)*(lf-1) - 1, 1.0))[:, None]
		new = a*(x*curr - b*prev)
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


def synthesis_scan(A, theta, lmax, mmax, mode="scalar", dtype=np.float64):
	"""G[f,c,m,t] = sum_l u_f(l,m,theta_t) A[l,m,c].

	The geometry prep runs outside the jit boundary so concrete thetas get
	the host-float64 seed path regardless of jax_enable_x64."""
	g = _prepare_geom(theta, mmax, np.dtype(dtype))
	return _synthesis_scan_g(A, g, lmax, mmax, mode, np.dtype(dtype))

@functools.partial(jax.jit, static_argnames=("lmax", "mmax", "mode", "dtype"))
def _synthesis_scan_g(A, g, lmax, mmax, mode, dtype):
	return _scan_core(g, lmax, mmax, MODES[mode], np.dtype(dtype), True, A=A)

def analysis_scan(F, theta, lmax, mmax, mode="scalar", dtype=np.float64):
	"""A[l,m,c] = sum_f sum_t u_f(l,m,theta_t) F[f,c,m,t]."""
	g = _prepare_geom(theta, mmax, np.dtype(dtype))
	return _analysis_scan_g(F, g, lmax, mmax, mode, np.dtype(dtype))

@functools.partial(jax.jit, static_argnames=("lmax", "mmax", "mode", "dtype"))
def _analysis_scan_g(F, g, lmax, mmax, mode, dtype):
	return _scan_core(g, lmax, mmax, MODES[mode], np.dtype(dtype), False, F=F)
