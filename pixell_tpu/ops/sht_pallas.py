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

VMEM_BUDGET = 64*1024*1024  # scoped-VMEM request for every SHT kernel. The
# XLA default is 16M, but a v5e has 128M physical VMEM; at 16M the spin
# kernels (nfun*C up to 8 accumulators) were forced down to tb=128 theta
# tiles, multiplying the grid-step count (and its fixed DMA/sync overhead)
# by 8 -- the main reason spin-2 measured 5.9x spin-0 instead of ~3x.

def _pick_tb(nfun, C, nt=None, ds=False):
	n = nfun*C
	if ds: n *= 2  # DS carries 5 state tiles + wider temporaries
	# tiles of [MB, tb] live at once (out block + accumulators + state +
	# double-buffered inputs); with the 64M scoped budget the wide tile
	# holds up to n ~ 8 (measured 25M for the worst scalar block kernel)
	if n <= 8: tb = TB
	elif n <= 16: tb = 512
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


def _recur_ab_tables(nlp, nmp):
	"""Recurrence coefficients a[l,m], b[l,m] as [2, nlp, nmp] f32, computed
	OUTSIDE the Pallas kernel with XLA's accurate sqrt/divide. Mosaic's
	in-kernel sqrt/reciprocal are low-precision VPU approximations (~1e-4):
	computed per step they made the recurrence error grow like l*1e-4
	(measured 9e-3 at lmax 1000 on TPU vs 1e-4 for the same f32 algorithm
	on CPU). Differences are computed in factored form ((l-m)(l+m), exact
	in f32 up to l ~ 8M) to dodge the l^2 - m^2 cancellation above l=4096."""
	l = jnp.arange(nlp, dtype=jnp.float32)[:, None]
	m = jnp.arange(nmp, dtype=jnp.float32)[None, :]
	num_a = jnp.maximum((2*l - 1)*(2*l + 1), 0.0)
	den_a = jnp.maximum((l - m)*(l + m), 0.25)
	a = jnp.sqrt(num_a/den_a)
	l1 = l - 1
	num_b = jnp.maximum((l1 - m)*(l1 + m), 0.0)
	den_b = jnp.maximum((2*l1 - 1)*(2*l1 + 1), 1.0)
	b = jnp.sqrt(num_b/den_b)
	return jnp.stack([a, b])


def _wigner_ab_tables(nlp, nmp, s, branch):
	"""Recurrence tables [3, nlp, nmp] f32 for the general-spin Wigner-d
	recurrence (sht_core._wigner_scan_core): row 0 = 1/v(l), row 1 = v(l-1),
	row 2 = sgn*m*s/((l-1)l) (the additive cos-theta offset), where
	v(l) = sqrt((l^2-m^2)(l^2-s^2)) / (l sqrt(4l^2-1)) and sgn = +1 for the
	+s branch (branch 0), -1 for the -s branch (branch 1). Rows are zeroed
	at l <= l0 = max(m, s) where the recurrence is dead (the seed overwrites
	state at l0). Factored differences like the Legendre tables."""
	sf = float(s)
	sgn = 1.0 if branch == 0 else -1.0
	l = jnp.arange(nlp, dtype=jnp.float32)[:, None]
	m = jnp.arange(nmp, dtype=jnp.float32)[None, :]
	l0 = jnp.maximum(m, sf)
	def v(lv):
		num = jnp.maximum((lv - m)*(lv + m)*(lv - sf)*(lv + sf), 0.0)
		den = jnp.maximum(lv*jnp.sqrt(jnp.maximum(4*lv*lv - 1, 0.0)), 1.0)
		return jnp.sqrt(num)/den
	vl = v(l)
	a = jnp.where(vl > 0, 1.0/jnp.maximum(vl, 1e-30), 0.0)
	b = v(l - 1)
	c = sgn*m*sf/jnp.maximum((l - 1)*l, 1.0)
	live = l > l0
	return jnp.stack([jnp.where(live, a, 0.0), jnp.where(live, b, 0.0),
		jnp.where(live, c, 0.0)])


def _wigner_ab_tables_ds(nlp, nmp, s, branch):
	"""DS-precision Wigner recurrence tables [6, nlp, nmp]: a_hi, b_hi, a_lo,
	b_lo, c_hi, c_lo with a = 1/v(l), b = v(l-1), c = sgn*m*s/((l-1)l) (see
	_wigner_ab_tables). Needed by the polar double-single pass: near the
	poles the recurrence amplifies COEFFICIENT rounding by ~l^2 as well."""
	sf = float(s)
	sgn = 1.0 if branch == 0 else -1.0
	l = jnp.arange(nlp, dtype=jnp.float32)[:, None]
	m = jnp.arange(nmp, dtype=jnp.float32)[None, :]
	l0 = jnp.maximum(m, sf)
	def v2_parts(lv):
		"""num, den of v(lv)^2 = (lv^2-m^2)(lv^2-s^2) / (lv^2 (4lv^2-1)) as DS
		pairs, with dead entries guarded to give 0/1."""
		ok = ((lv - m)*(lv + m) > 0) & (lv > sf)
		p1h, p1l = _two_prod_xla(lv - m, lv + m)
		p2h, p2l = _two_prod_xla(lv - sf, lv + sf)
		nh_, nl_ = _ds_mul_xla(p1h, p1l, p2h, p2l)
		d1h, d1l = _two_prod_xla(lv, lv)
		d2h, d2l = _two_prod_xla(2*lv - 1, 2*lv + 1)
		dh_, dl_ = _ds_mul_xla(d1h, d1l, d2h, d2l)
		nh_ = jnp.where(ok, nh_, 0.0); nl_ = jnp.where(ok, nl_, 0.0)
		dh_ = jnp.where(ok, dh_, 1.0); dl_ = jnp.where(ok, dl_, 0.0)
		return nh_, nl_, dh_, dl_, ok
	# a = 1/v(l) = sqrt(den/num)
	nh_, nl_, dh_, dl_, ok_a = v2_parts(l)
	nh_g = jnp.where(ok_a, nh_, 1.0); nl_g = jnp.where(ok_a, nl_, 0.0)
	a_h, a_l = _ds_sqrt_ratio(dh_, dl_, nh_g, nl_g)
	a_h = jnp.where(ok_a, a_h, 0.0); a_l = jnp.where(ok_a, a_l, 0.0)
	# b = v(l-1) = sqrt(num1/den1)
	n1h, n1l, d1h_, d1l_, ok_b = v2_parts(l - 1)
	b_h, b_l = _ds_sqrt_ratio(n1h, n1l, d1h_, d1l_)
	b_h = jnp.where(ok_b, b_h, 0.0); b_l = jnp.where(ok_b, b_l, 0.0)
	# c = sgn*m*s/((l-1)l); m*s is exact in f32 for the sizes in play
	ok_c = (l - 1)*l > 0
	ch_, cl_ = _two_prod_xla(l - 1, l)
	ch_ = jnp.where(ok_c, ch_, 1.0); cl_ = jnp.where(ok_c, cl_, 0.0)
	c_h, c_l = _ds_div_xla(sgn*m*sf, jnp.zeros_like(ch_), ch_, cl_)
	c_h = jnp.where(ok_c, c_h, 0.0); c_l = jnp.where(ok_c, c_l, 0.0)
	live = l > l0
	z = lambda x: jnp.where(live, x, 0.0)
	return jnp.stack([z(a_h), z(b_h), z(a_l), z(b_l), z(c_h), z(c_l)])


def _two_prod_xla(x, y):
	"""Exact product as (hi, lo) in XLA f32 (correctly-rounded mul + Dekker)."""
	p = x*y
	xh, xl = _split(x); yh, yl = _split(y)
	e = ((xh*yh - p) + xh*yl + xl*yh) + xl*yl
	return p, e

def _ds_mul_xla(ah, al, bh, bl):
	"""DS x DS product in XLA f32, ~2^-45."""
	ph, pe = _two_prod_xla(ah, bh)
	pe = pe + ah*bl + al*bh
	return _ds_renorm(ph, pe)

def _ds_div_xla(nh, nl, dh, dl):
	"""DS / DS quotient in XLA f32, ~2^-45."""
	q_h = nh/dh
	ph, pe = _two_prod_xla(q_h, dh)
	q_l = ((nh - ph) - pe + nl - q_h*dl)/dh
	return _ds_renorm(q_h, q_l)

def _ds_sqrt_ratio(num_h, num_l, den_h, den_l):
	"""(hi, lo) of sqrt((num_h+num_l)/(den_h+den_l)) in XLA f32, ~2^-45."""
	r_h = num_h/den_h
	ph, pe = _two_prod_xla(r_h, den_h)
	r_l = ((num_h - ph) - pe + num_l - r_h*den_l)/den_h
	s_h = jnp.sqrt(r_h)
	qh, qe = _two_prod_xla(s_h, s_h)
	s_l = ((r_h - qh) - qe + r_l)/jnp.maximum(2*s_h, 1e-30)
	return s_h, s_l

def _recur_ab_tables_ds(nlp, nmp):
	"""DS-precision recurrence coefficients [4, nlp, nmp]: a_hi, b_hi, a_lo,
	b_lo. Near the poles the recurrence amplifies COEFFICIENT rounding by
	~l^2 as well, so the polar DS kernel needs ~2^-45 coefficients. The
	integer factor products are exact via two_prod."""
	l = jnp.arange(nlp, dtype=jnp.float32)[:, None]
	m = jnp.arange(nmp, dtype=jnp.float32)[None, :]
	ok_a = ((2*l - 1)*(2*l + 1) > 0) & ((l - m)*(l + m) > 0)
	na_h, na_l = _two_prod_xla(2*l - 1, 2*l + 1)
	da_h, da_l = _two_prod_xla(l - m, l + m)
	na_h = jnp.where(ok_a, na_h, 0.0); na_l = jnp.where(ok_a, na_l, 0.0)
	da_h = jnp.where(ok_a, da_h, 0.25); da_l = jnp.where(ok_a, da_l, 0.0)
	a_h, a_l = _ds_sqrt_ratio(na_h, na_l, da_h, da_l)
	l1 = l - 1
	ok_b = ((l1 - m)*(l1 + m) > 0) & ((2*l1 - 1)*(2*l1 + 1) > 0)
	nb_h, nb_l = _two_prod_xla(l1 - m, l1 + m)
	db_h, db_l = _two_prod_xla(2*l1 - 1, 2*l1 + 1)
	nb_h = jnp.where(ok_b, nb_h, 0.0); nb_l = jnp.where(ok_b, nb_l, 0.0)
	db_h = jnp.where(ok_b, db_h, 1.0); db_l = jnp.where(ok_b, db_l, 0.0)
	b_h, b_l = _ds_sqrt_ratio(nb_h, nb_l, db_h, db_l)
	a_h = jnp.where(ok_a, a_h, 0.0); a_l = jnp.where(ok_a, a_l, 0.0)
	b_h = jnp.where(ok_b, b_h, 0.0); b_l = jnp.where(ok_b, b_l, 0.0)
	return jnp.stack([a_h, b_h, a_l, b_l])


def _step_block(l, marr, m2, ct, seedv, seedl, prev, curr, lev, fac_m1,
		a=None, b=None, ctl=None, cadd=None, l0col=None):
	"""One recurrence step on a [MB, TB] tile. Returns updated state and the
	true lambda_l / lambda_{l-1} (unscaled). a/b are the [MB,1] coefficient
	columns from _recur_ab_tables (fallback: in-kernel computation, only
	safe where Mosaic sqrt precision does not matter). cadd ([MB,1]) is an
	additive offset on cos(theta) and l0col the seed degree column (both
	used by the general-spin Wigner recurrence; default Legendre: seed at
	l = m, no offset)."""
	lf = l.astype(jnp.float32)
	if a is None:
		a = jnp.sqrt(jnp.maximum(4*lf*lf - 1, 0.0)/jnp.maximum(lf*lf - m2, 0.25))
		b = jnp.sqrt(jnp.maximum((lf-1)*(lf-1) - m2, 0.0)
			/ jnp.maximum(4*(lf-1)*(lf-1) - 1, 1.0))
	t = ct*curr if ctl is None else ct*curr + ctl*curr
	if cadd is not None:
		t = t + cadd*curr
	new = a*(t - b*prev)
	seedmask = ((marr if l0col is None else l0col) == lf)
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


# ---------------------------------------------------------------------------
# Double-single (two-float) arithmetic for the high-accuracy recurrence.
# The plain f32 three-term recurrence loses ~l*eps relative accuracy
# (measured 5e-4 at l=5000); carrying the state as an unevaluated sum of two
# f32s keeps ~2^-45 working precision, so the floor drops to the f32
# rounding of the data itself. Dekker splitting (no FMA on the VPU path).
# ---------------------------------------------------------------------------
def _split(x):
	c = x*jnp.float32(4097.0)  # 2^12 + 1 splits the 24-bit mantissa
	hi = c - (c - x)
	return hi, x - hi

def _ds_renorm(h, l):
	s = h + l
	return s, l - (s - h)

def _ds_mul(s, sh, sl, xh, xl):
	"""f32 s (with precomputed split sh/sl) times ds(xh, xl) -> ds."""
	p = s*xh
	yh, yl = _split(xh)
	e = ((sh*yh - p) + sh*yl + sl*yh) + sl*yl
	e = e + s*xl
	return _ds_renorm(p, e)

def _ds_sub(ah, al, bh, bl):
	s = ah - bh
	t = s - ah
	e = (ah - (s - t)) - (bh + t)
	e = e + (al - bl)
	return _ds_renorm(s, e)


def _step_block_ds(l, marr, m2, ct, ct_h, ct_l, seedv, seedl,
		ph, pl, ch, cl, lev, fac_m1, a, b, ctlo=None, alo=None, blo=None,
		cadd=None, caddlo=None, l0col=None):
	"""One DS-state recurrence step. Same contract as _step_block but the
	prev/curr state is carried as (hi, lo) pairs; lam/lam1 collapse to f32.
	a/b come from the coefficient tables; ctlo/alo/blo are true low parts
	(polar rings amplify coefficient rounding by ~l^2 too). cadd/caddlo is
	the DS additive cos-theta offset and l0col the seed degree column of the
	general-spin Wigner recurrence (default Legendre: seed at l = m)."""
	lf = l.astype(jnp.float32)
	a_h, a_l = _split(a)   # [MB,1]: negligible
	b_h, b_l = _split(b)
	th_, tl_ = _ds_mul(ct, ct_h, ct_l, ch, cl)
	if ctlo is not None:
		tl_ = tl_ + ctlo*ch
	if cadd is not None:
		# t += (cadd_h + cadd_l)*(ch + cl), keeping DS precision
		gh_, gl_ = _ds_mul(cadd, *_split(cadd), ch, cl)
		if caddlo is not None:
			gl_ = gl_ + caddlo*ch
		th_, tl_ = _ds_sub(th_, tl_, -gh_, -gl_)
	uh_, ul_ = _ds_mul(b, b_h, b_l, ph, pl)
	if blo is not None:
		ul_ = ul_ + blo*ph
	dh_, dl_ = _ds_sub(th_, tl_, uh_, ul_)
	nh_, nl_ = _ds_mul(a, a_h, a_l, dh_, dl_)
	if alo is not None:
		nl_ = nl_ + alo*dh_
	seedmask = ((marr if l0col is None else l0col) == lf)
	nh_ = jnp.where(seedmask, seedv, nh_)
	nl_ = jnp.where(seedmask, 0.0, nl_)
	lev = jnp.where(seedmask, seedl, lev)
	czh = jnp.where(seedmask, 0.0, ch)
	czl = jnp.where(seedmask, 0.0, cl)
	fac = jnp.where(lev == 0, 1.0, jnp.where(lev == -1, fac_m1, 0.0))
	lam = (nh_ + nl_)*fac
	lam1 = (czh + czl)*fac
	return czh, czl, nh_, nl_, lev, lam, lam1

def _rescale_ds(ph, pl, ch, cl, lev, band, invband):
	big = jnp.abs(ch) > band
	sc = jnp.where(big, invband, 1.0)  # power of two: exact on both parts
	return ph*sc, pl*sc, ch*sc, cl*sc, jnp.where(big, lev + 1, lev)

# accuracy default for the f32 kernels. "high" (default) runs the handful
# of NEAR-POLE rings through the double-single kernel -- the three-term
# recurrence is degenerate at cos(theta) ~ +-1 and amplifies f32 rounding
# (arithmetic AND coefficient) by ~min(l, 1/theta)^2, which produced O(1)
# absolute errors in polar rings at low m. Bulk rings keep the fast f32
# kernel, whose amplification is capped at (POLAR_AMP)^2*eps ~ 2e-5.
# "fast" skips the polar pass. Explicit ds=True runs EVERYTHING in DS
# (~2^-45 recurrence, ~10x the Legendre cost).
ACCURACY = "high"
POLAR_AMP = 60.0  # polar cutoff theta < POLAR_AMP/lmax (and mirrored);
POLAR_MMAX = 128  # m-extent of the polar DS pass: lambda_lm at polar rings
# is exponentially small for m > lmax*sin(theta_cut) + O(l^(1/3)) ~ 60+17,
# so one MB-wide m-tile covers every mode that matters there
# measured fast-kernel per-ring error at lmax 1000 decays ~theta^-1.3:
# 0.9 abs at theta=0.002 -> 5e-3 at 0.05 -> 1e-3 at 0.2 (G scale ~150)

def _use_ds(ds):
	return False if ds is None else bool(ds)

def _polar_counts(theta, lmax):
	"""(n_north, n_south): rings within POLAR_AMP/lmax of either pole.
	theta must be concrete and ascending."""
	th = np.asarray(theta, np.float64)
	tcut = POLAR_AMP/max(lmax, 1)
	nn = int(np.searchsorted(th, tcut))
	ns = int(np.sum(th > np.pi - tcut))
	return nn, ns

def _want_polar(ds, theta, interpret=False):
	import jax as _jax
	# interpret mode (CPU tests) skips the split: the DS kernels are
	# exercised by a dedicated tiny test, and the doubled kernel count is
	# prohibitively slow in the interpreter
	return (not ds) and (not interpret) and ACCURACY == "high" \
		and not isinstance(theta, _jax.core.Tracer)


def _make_stepper(ds):
	"""(nstate, prep_ct, step, rescale) hiding the recurrence-state layout:
	plain f32 -> (prev, curr, lev); DS -> (prev_hi, prev_lo, curr_hi,
	curr_lo, lev). step returns (state, lam, lam1)."""
	if not ds:
		def prep_ct(ct, ctl): return (ct, ctl)
		def step(l, marr, m2, th_ct, sv, sl, st, fac_m1, a, b, alo=None, blo=None,
				cadd=None, caddlo=None, l0col=None):
			p, c, lv, lam, lam1 = _step_block(l, marr, m2, th_ct[0], sv, sl,
				st[0], st[1], st[2], fac_m1, a=a, b=b, ctl=th_ct[1],
				cadd=cadd, l0col=l0col)
			return (p, c, lv), lam, lam1
		def rescale(st, band, invband):
			return _rescale(st[0], st[1], st[2], band, invband)
		return 3, prep_ct, step, rescale
	def prep_ct(ct, ctl):
		h, lo = _split(ct)
		return (ct, h, lo, ctl)
	def step(l, marr, m2, th_ct, sv, sl, st, fac_m1, a, b, alo=None, blo=None,
			cadd=None, caddlo=None, l0col=None):
		czh, czl, nh, nl_, lv, lam, lam1 = _step_block_ds(l, marr, m2,
			th_ct[0], th_ct[1], th_ct[2], sv, sl,
			st[0], st[1], st[2], st[3], st[4], fac_m1, a, b,
			ctlo=th_ct[3], alo=alo, blo=blo, cadd=cadd, caddlo=caddlo,
			l0col=l0col)
		return (czh, czl, nh, nl_, lv), lam, lam1
	def rescale(st, band, invband):
		return _rescale_ds(st[0], st[1], st[2], st[3], st[4], band, invband)
	return 5, prep_ct, step, rescale


def _make_funcs(mode):
	"""Returns nfun and a function (l, marr, m2, th, lam, lam1) -> [u_f]."""
	if mode == "wigner":
		# general spin: lambda IS the mode function (one d-function branch
		# per kernel pass; the w/x combination happens outside)
		return 1, (lambda lf, marr, m2, th, lam, lam1: [lam])
	midx = sht_core.MODES[mode]
	def funcs(lf, marr, m2, th, lam, lam1):
		ct, ct_st, inv_st, inv_st2, notpole = th[:5]
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


def _ct_parts(theta):
	"""Two-part cos(theta) from f64 host theta: (hi, lo) f32 pairs. A plain
	f32 cos has ~3e-8 ABSOLUTE error near the poles where ct ~ 1; the
	recurrence amplifies a ct perturbation by ~l^2/2, which produced O(1)
	errors in near-pole rings at low m (measured 1.3 absolute at lmax
	1000). Returns None for traced theta (fallback: lo = 0)."""
	if isinstance(theta, jax.core.Tracer): return None
	th = np.asarray(theta, np.float64)
	ct64 = np.cos(th)
	cth = ct64.astype(np.float32)
	ctl = (ct64 - cth).astype(np.float32)
	return jnp.asarray(cth), jnp.asarray(ctl)


def _prep_inputs(theta, lmax, mmax, mode, tb=None, cth=None, ctl=None, wig=None):
	"""Host-side padding and seed/theta-function tables (f32). The th table
	rows are [ct_hi, ct/st, 1/st, 1/st^2, notpole, ct_lo]. wig = (s, branch)
	switches the seed tables to the Wigner-d seeds at l0 = max(m, s)
	(branch 0 = +s, 1 = -s)."""
	if tb is None: tb = TB
	g = sht_core._prepare_geom(theta, mmax, np.float32)
	nt = int(np.shape(theta)[0])
	nm = mmax + 1
	nl = lmax + 1
	ntp = _ceil(nt, tb)*tb
	nmp = _ceil(nm, MB)*MB
	nlp = _ceil(nl, LB)*LB
	ct = g["ct"] if cth is None else jnp.asarray(cth, jnp.float32)
	ctlo = jnp.zeros((nt,), jnp.float32) if ctl is None else jnp.asarray(ctl, jnp.float32)
	def padt(x, fill=0.0):
		return jnp.pad(x, (0, ntp - nt), constant_values=fill)
	# dummy rings at theta=pi/2 (harmless; their output is discarded)
	th = jnp.stack([padt(ct), padt(g["ct_st"]), padt(g["inv_st"]),
		padt(g["inv_st2"]), padt(g["notpole"], 1.0), padt(ctlo)])
	if wig is None:
		sval, slev = g["seed_val"], g["seed_level"]
	else:
		wv, wl = sht_core._wigner_seeds(theta, mmax, wig[0], np.float32)
		sval, slev = wv[wig[1]], wl[wig[1]]
	seedv = jnp.pad(sval, ((0, nmp - nm), (0, ntp - nt)))
	seedl = jnp.pad(slev, ((0, nmp - nm), (0, ntp - nt)))
	return th, seedv, seedl, (nt, nm, nl, ntp, nmp, nlp)


def synthesis_scan_pallas(A, theta, lmax, mmax, mode="scalar", interpret=False,
		ds=None):
	"""Pallas version of sht_core.synthesis_scan (float32). Dispatches to a
	half-sky kernel when the rings are south-symmetric (the recurrence then
	runs on nt/2 rings and the southern values follow from parity).
	ds=None follows the module ACCURACY default ("high" = double-single
	recurrence state, ~1e-6-level; "fast" = plain f32)."""
	ds = _use_ds(ds)
	if _want_polar(ds, theta, interpret):
		nn, ns = _polar_counts(theta, lmax)
		nt_all = int(np.shape(theta)[0])
		if nn + ns >= nt_all:
			# tiny ring set entirely polar: run everything in DS
			cp = _ct_parts(theta)
			return _synthesis_scan_pallas_full(A, theta, lmax, mmax, mode=mode,
				interpret=interpret, ds=True, cth=cp[0], ctl=cp[1])
		if nn or ns:
			# fast kernel everywhere, then OVERWRITE the polar rings with a
			# DS pass restricted to m < POLAR_MMAX (lambda_lm at theta <
			# POLAR_AMP/lmax is exponentially negligible for larger m, so
			# the fast values there are already fine): one m-tile of DS work
			th64 = np.asarray(theta, np.float64)
			G = _synthesis_fast(A, theta, lmax, mmax, mode, interpret)
			Mp = min(mmax + 1, POLAR_MMAX)
			pth = np.concatenate([th64[:nn], th64[nt_all-ns:]])
			cthp, ctlp = _ct_parts(pth)
			pol = _synthesis_scan_pallas_full(A[:, :Mp], pth, lmax, Mp - 1,
				mode=mode, interpret=interpret, ds=True, cth=cthp, ctl=ctlp)
			if nn:
				G = G.at[..., :Mp, :nn].set(pol[..., :nn])
			if ns:
				G = G.at[..., :Mp, nt_all-ns:].set(pol[..., nn:])
			return G
	return _synthesis_fast(A, theta, lmax, mmax, mode, interpret, ds=ds)


def _synthesis_fast(A, theta, lmax, mmax, mode, interpret, ds=False):
	nh = _detect_sym(theta)
	if nh is None:
		cp = _ct_parts(theta)
		cth, ctl = cp if cp is not None else (None, None)
		if _blk_ok(mode, ds, theta, lmax):
			return _synthesis_scan_pallas_blocked(A, theta, lmax, mmax,
				interpret=interpret, cth=cth, ctl=ctl, mode=mode)
		return _synthesis_scan_pallas_full(A, theta, lmax, mmax, mode=mode,
			interpret=interpret, ds=ds, cth=cth, ctl=ctl,
			lstop=_dead_lstop(theta, lmax, mmax, sht_core.NFUN[mode],
				A.shape[-1], ds))
	nt = int(np.shape(theta)[0])
	theta_h = np.asarray(theta, np.float64)[:nh]
	cth, ctl = _ct_parts(theta_h)
	pair = _synthesis_scan_pallas_sym(A, theta_h, lmax, mmax, mode=mode,
		interpret=interpret, ds=ds, cth=cth, ctl=ctl)  # [nfun, C, 2, nm, nh]
	north = pair[:, :, 0]
	south = pair[:, :, 1, :, :nt - nh][..., ::-1]
	return jnp.concatenate([north, south], -1)


# ---------------------------------------------------------------------------
# MXU block-Legendre path (SURVEY §7 "blocked Legendre recurrence matmuls on
# the MXU"; numerics validated in scripts/proto_blockleg.py). Within an
# l-block of BLK_LB degrees containing no seed insertion, the scaled
# recurrence is LINEAR in the block-entry state (curr, prev):
#     P_{l0+k} = alpha_k(ct)*curr + beta_k(ct)*prev,
# alpha/beta degree-(k+1) polynomials in ct carried as Chebyshev coefficients
# on the theta-TILE's own ct interval. The synthesis accumulate folds to
#     sum_k A_k P_{l0+k} = (Ba @ V)*curr + (Bb @ V)*prev,
# a rank-(BLK_LB+2) MXU matmul instead of BLK_LB sequential VPU steps; the
# analysis transpose folds the same way against W = (state*F) @ V^T.
#
# Work split: the existing stepwise kernel runs each (m-tile, theta-tile)
# from l=0 up to a host-computed per-tile degree l_start (covering the seed
# blocks and the entire evanescent/transition region) and dumps its
# recurrence state to HBM; the block kernel resumes from that state for the
# eligible suffix of l-blocks.
#
# Eligibility is ACCURACY-bound, not overflow-bound: evaluating a Chebyshev
# series whose coefficients span 2^G carries ~coefmax*eps ABSOLUTE error,
# which destroys the small (oscillatory-side) values of any tile straddling
# the classical turning point (measured: a G~60 tile emitted 2^36-sized
# garbage where the true answer was O(1) -- the prototype's
# relative-to-tile-max error metric hid exactly this mode). So a block is
# eligible only when the dominant-root growth bound at the tile's WORST
# corner (largest m, largest |ct|) is <= BLK_GMAX ~ 2 bits, i.e. the whole
# tile x block is essentially oscillatory; there alpha/beta stay O(1) and
# the evaluation error is ~J*eps, matching the stepwise kernel's own floor
# (prototype: 2e-6 vs f64 on zero-growth tiles). Measured eligibility at
# lmax 5000 (tb=1024): ~48% of live tiles; the rest stay stepwise.
# ---------------------------------------------------------------------------
BLK_LB = 112       # degrees per MXU block; the Lagrange interpolation from
# BLK_JP nodes is exact for polynomials of degree < BLK_JP, and alpha_k has
# degree k+1 <= BLK_LB+1, so BLK_LB can approach BLK_JP: 112 (vs the first
# version's 64) nearly halves the per-degree matmul cost and block-boundary
# overhead at the same build cost. Must stay a multiple of LB (the stepwise
# handoff is in LB-step units) and <= BLK_JP - 2.
BLK_JP = 128       # node count = matmul contraction rank (one lane tile)
BLK_KU = 16        # build-loop unroll: the k-chain runs as a fori_loop over
# BLK_LB//BLK_KU groups of BLK_KU unrolled steps. Fully unrolled (v1) the
# 64-step body took ~14 min to Mosaic-compile through the remote tunnel;
# the rolled form compiles like the stepwise kernel.
BLK_GMAX = 3.0     # growth-bits eligibility cutoff: the blocked evaluation
# error is ~BLK_JP*eps*2^G ~ 6e-5 at G=3, below the fast tier's own ~l*eps
# bulk floor (5.7e-4 at lmax 5000); larger G admits more tiles
BLK_MINL = 1024    # only engage above this lmax (small/sym grids don't gain)
# Measured on v5e at lmax 5000 (2026-08-20, scalar C=2 synthesis, v2 with
# BLK_LB=112 + fori_loop build + GMAX=3): blocked 467.6 ms vs 599.6 ms
# skipped-stepwise = 1.28x (spin-2: 1548.2 vs 1808.2 ms = 1.16x); rel diff
# vs stepwise 3.3e-5. The split WINS at scale; it is off by default only
# because the first Mosaic compile per geometry is minutes on
# remote-compile runtimes (330 s measured through the axon tunnel).
# Opt in with `with sht.blocked():` (see sht.py) when geometries are
# reused enough to amortize the compile.
BLK_ENABLE = False
FAC_M2 = np.float32(2.0**(-2*S32))  # emission scale for state level -2

BLK_STREAM_MODES = ("spin2", "deriv", "spin1")

def _blk_ok(mode, ds, theta, lmax):
	return (BLK_ENABLE and mode in ("scalar",) + BLK_STREAM_MODES and not ds
		and lmax >= BLK_MINL and not isinstance(theta, jax.core.Tracer))

_BLK_TABLE_CACHE = {}

def _blk_start_table(theta, lmax, mmax, tb):
	"""Per (m-tile, theta-tile) first BLK_LB-block index from which every
	block up to lmax is MXU-eligible (no seed: l0 > m_hi; growth at the
	tile's worst corner (m_hi, |ct|max) <= BLK_GMAX bits). int32
	[nmb, ntb]; nlb means 'fully stepwise'. Host-side, cached."""
	th = np.asarray(theta, np.float64)
	key = (th.tobytes(), lmax, mmax, tb, BLK_LB, BLK_GMAX)
	hit = _BLK_TABLE_CACHE.get(key)
	if hit is not None: return hit
	nt = len(th); nm = mmax + 1; nl = lmax + 1
	ntp = _ceil(nt, tb)*tb
	nmp = _ceil(nm, MB)*MB
	nlb = _ceil(nl, BLK_LB)
	nmb, ntb = nmp//MB, ntp//tb
	ct = np.zeros(ntp)
	ct[:nt] = np.cos(th)
	cta = np.abs(ct).reshape(ntb, tb).max(1)            # [ntb]
	# tiles containing an exact-pole ring are never eligible: the blocked
	# folds omit the stepwise pole handling (notpole mask and the m==1/2
	# seam corrections of the spin modes)
	stp = np.ones(ntp)
	stp[:nt] = np.abs(np.sin(th))
	has_pole = (stp < 1e-6).reshape(ntb, tb).any(1)     # [ntb]
	ls = np.arange(nlb*BLK_LB, dtype=np.float64)
	l0s = np.arange(nlb)*BLK_LB
	start = np.full((nmb, ntb), nlb, np.int32)
	for imb in range(nmb):
		m_lo = imb*MB
		if m_lo >= nm:
			continue  # m-padding tiles: state is zero; leave them stepwise
		m_hi = min((imb + 1)*MB, nm) - 1
		# dominant-root log-growth per degree at the worst m (vectorized;
		# mirrors scripts/proto_blockleg.growth_bits)
		a = np.sqrt(np.maximum((2*ls - 1)*(2*ls + 1), 0.0)
			/ np.maximum((ls - m_hi)*(ls + m_hi), 0.25))
		b = np.sqrt(np.maximum((ls - 1 - m_hi)*(ls - 1 + m_hi), 0.0)
			/ np.maximum((2*ls - 3)*(2*ls - 1), 1.0))
		for itb_ in range(ntb):
			c = cta[itb_]
			disc = (a*c)**2 - 4*a*b
			z = np.where(disc > 0, (a*c + np.sqrt(np.maximum(disc, 0.0)))/2, 1.0)
			g = np.log2(np.maximum(z, 1.0))
			gb = g.reshape(nlb, BLK_LB).sum(1)
			ok = (gb <= BLK_GMAX) & (l0s > m_hi) & (l0s >= 2)
			s = nlb
			for i in range(nlb - 1, -1, -1):
				if ok[i]: s = i
				else: break
			start[imb, itb_] = s
	start[:, has_pole] = nlb
	_BLK_TABLE_CACHE[key] = start
	return start


_DEAD_TABLE_CACHE = {}

def _dead_table(theta, lmax, mmax, tb, s=0):
	"""[nmb, ntb] bool: True where the (m-tile, theta-tile) pair lies
	entirely beyond the horizon -- m_lo - s > lmax*sin_max(tile) + slack --
	so every lambda_lm (or d^l_{ms}) on the tile is below ~1e-12 for every
	l <= lmax and the tile contributes nothing at f32. The slack follows the
	measured evanescent decay rate (~exp(-c*slack^1.5/sqrt(lmax)) beyond the
	classical turning point): 1.6*sqrt(lmax)+20 keeps the skipped maximum
	under ~1e-12 (vs the fast tier's ~l*eps floor). Mirrors the reference's
	ducc0 engine, which skips m > lmax*sin(theta)+slack per ring chunk.
	Host-side, cached."""
	th = np.asarray(theta, np.float64)
	key = (th.tobytes(), lmax, mmax, tb, s)
	hit = _DEAD_TABLE_CACHE.get(key)
	if hit is not None: return hit
	nt = len(th); nm = mmax + 1
	ntp = _ceil(nt, tb)*tb
	nmp = _ceil(nm, MB)*MB
	st = np.zeros(ntp)
	st[:nt] = np.sin(th)
	smax = st.reshape(-1, tb).max(1)                    # [ntb]
	slack = 1.6*np.sqrt(max(lmax, 1)) + 20
	m_lo = np.arange(nmp//MB)*MB
	dead = (m_lo[:, None] - s) > (lmax*smax[None, :] + slack)
	_DEAD_TABLE_CACHE[key] = dead
	return dead


def _dead_lstop(theta, lmax, mmax, nfun, C, ds, s=0):
	"""lstop table [nmb, ntb] (LB-block units) that makes the stepwise
	kernels skip dead (beyond-horizon) tiles entirely, or None when nothing
	is dead / theta is traced. ~14% of the live work at lmax 5000 on a
	full-sky grid, growing with lmax. All fast-tier modes call this with
	s=0 (they are scalar-Legendre based; spin enters via ring factors, not
	the recurrence), so the skipped spin1/spin2/deriv tails are the bare
	~1e-12 Legendre bound amplified by up to ~(lmax/m_lo)^2 of inv_st2 --
	still <~1e-7, far below the f32 floor; test_dead_tile_skip pins the
	spin2 worst case. The docs' 'm - s' criterion applies to the wigner
	engine, which passes its true s."""
	if isinstance(theta, jax.core.Tracer): return None
	tb = _pick_tb(nfun, C, nt=int(np.shape(theta)[0]), ds=ds)
	dead = _dead_table(theta, lmax, mmax, tb, s=s)
	if not dead.any(): return None
	nlb = _ceil(lmax + 1, LB)
	return jnp.asarray(np.where(dead, 0, nlb).astype(np.int32))


def _spin2_stream_tables(nlp, nmp):
	"""Coefficient streams [4, nlp, nmp] f32 for the spin-2 MXU block fold.
	The spin-2 mode functions separate into (l,m)-coefficient x ring-factor
	terms (matching _make_funcs midx==3 exactly):
	  w2 = c1*lam * 1 + c2*lam * ist2 + c3*lam1 * ct*ist2
	  x2 = m*(c4*lam * ct*ist2 + c3*lam1 * ist2)
	with c1 = -n2*l*(l-1), c2 = -2*n2*(l - m^2), c3 = 2*n2*e,
	c4 = -2*n2*(l-1), n2 = 1/sqrt((l-1)l(l+1)(l+2)),
	e = sqrt((l-m)(l+m)(2l+1)/(2l-1)) (factored like _recur_ab_tables).
	All coefficients are zero below l = 2 (valid mask)."""
	l = jnp.arange(nlp, dtype=jnp.float32)[:, None]
	m = jnp.arange(nmp, dtype=jnp.float32)[None, :]
	den = jnp.maximum((l - 1)*l*(l + 1)*(l + 2), 1.0)
	n2 = 1.0/jnp.sqrt(den)
	e = jnp.sqrt(jnp.maximum((l - m)*(l + m)*(2*l + 1), 0.0)
		/ jnp.maximum(2*l - 1, 1.0))
	valid = jnp.where(l >= 2, 1.0, 0.0)
	ones_m = jnp.ones((1, nmp), jnp.float32)
	c1 = -n2*l*(l - 1)*valid*ones_m
	c2 = -2*n2*(l - m*m)*valid
	c3 = 2*n2*e*valid
	c4 = -2*n2*(l - 1)*valid*ones_m
	return jnp.stack([c1, c2, c3, c4])


def _deriv_stream_tables(nlp, nmp):
	"""Streams [3, nlp, nmp] for the deriv blocked fold (matching _make_funcs
	midx==1): lam = s0*lam * 1; dlam = s1*lam * ct_st + s2*lam1 * inv_st
	with s0 = 1, s1 = l, s2 = -e."""
	l = jnp.arange(nlp, dtype=jnp.float32)[:, None]
	m = jnp.arange(nmp, dtype=jnp.float32)[None, :]
	e = jnp.sqrt(jnp.maximum((l - m)*(l + m)*(2*l + 1), 0.0)
		/ jnp.maximum(2*l - 1, 1.0))
	ones = jnp.ones((nlp, nmp), jnp.float32)
	return jnp.stack([ones, l*ones, -e])


def _spin1_stream_tables(nlp, nmp):
	"""Streams [3, nlp, nmp] for the spin-1 blocked fold (_make_funcs
	midx==2): w1 = s0*lam * ct_st + s1*lam1 * inv_st; x1 = m*(s2*lam * inv_st)
	with s0 = -n1*l, s1 = n1*e, s2 = n1, n1 = 1/sqrt(l(l+1)), valid l>=1."""
	l = jnp.arange(nlp, dtype=jnp.float32)[:, None]
	m = jnp.arange(nmp, dtype=jnp.float32)[None, :]
	e = jnp.sqrt(jnp.maximum((l - m)*(l + m)*(2*l + 1), 0.0)
		/ jnp.maximum(2*l - 1, 1.0))
	n1 = 1.0/jnp.sqrt(jnp.maximum(l*(l + 1), 1.0))
	valid = jnp.where(l >= 1, 1.0, 0.0)
	ones_m = jnp.ones((1, nmp), jnp.float32)
	return jnp.stack([-n1*l*valid*ones_m, n1*e*valid, n1*valid*ones_m])


def _blk_mode_spec(mode):
	"""Static spec driving the generic stream blocked kernels:
	(nfun, tables_fn, fam, synth_combine, anal_fields).
	fam[s]: 0 = the stream weights lam (alpha_k / curr family),
	1 = lam1 (alpha_{k-1} / prev family).
	synth_combine(ts, th6, marr): ts[s] = the interpolated state-folded
	stream s at the rings [MB, tb]; th6 = the six [1, tb] ring-function
	rows; returns the nfun output arrays.
	anal_fields(F0, F1, th6, marr): the S ring-weighted fields whose
	lam/lam1 sums the coefficient streams contract against (transpose of
	synth_combine)."""
	if mode == "spin2":
		def synth(ts, th, marr):
			ist2 = th[3]; ctist2 = th[0]*th[3]
			return [ts[0] + ist2*ts[1] + ctist2*ts[2],
				marr*(ctist2*ts[3] + ist2*ts[2])]
		def fields(F0, F1, th, marr):
			ist2 = th[3]; ct = th[0]
			return [F0, ist2*F0, ist2*(ct*F0 + marr*F1), (marr*ct)*(ist2*F1)]
		return 2, _spin2_stream_tables, (0, 0, 1, 0), synth, fields
	if mode == "deriv":
		def synth(ts, th, marr):
			return [ts[0], th[1]*ts[1] + th[2]*ts[2]]
		def fields(F0, F1, th, marr):
			return [F0, th[1]*F1, th[2]*F1]
		return 2, _deriv_stream_tables, (0, 0, 1), synth, fields
	if mode == "spin1":
		def synth(ts, th, marr):
			return [th[1]*ts[0] + th[2]*ts[1], marr*(th[2]*ts[2])]
		def fields(F0, F1, th, marr):
			return [th[1]*F0, th[2]*F0, marr*(th[2]*F1)]
		return 2, _spin1_stream_tables, (0, 1, 0), synth, fields
	raise ValueError(mode)


def _prep_th(theta, tb, cth=None, ctl=None):
	"""The padded [6, ntp] ring-function table of _prep_inputs (rows: ct_hi,
	ct/st, 1/st, 1/st^2, notpole, ct_lo) WITHOUT the seed build -- the
	spin-2 blocked kernels need only the ring factors, and _prep_inputs'
	scaled-cumprod seed tables are the expensive part. Concrete theta only
	(the blocked path already requires it); formulas match
	sht_core._prepare_geom's concrete branch."""
	nt = int(np.shape(theta)[0])
	ntp = _ceil(nt, tb)*tb
	th64 = np.asarray(theta, np.float64)
	st64 = np.sin(th64); ct64 = np.cos(th64)
	pole = np.abs(st64) < 1e-6
	st64 = np.where(pole, 0.0, np.maximum(st64, 0.0))
	st_safe = np.where(pole, 1.0, st64)
	# cth/ctl from callers may be traced under an enclosing jit; theta is
	# always concrete on this path and _ct_parts derives exactly these
	# values from it, so recompute host-side (bit-identical)
	ct = ct64.astype(np.float32)
	ctl_ = (ct64 - ct.astype(np.float64)).astype(np.float32)
	rows = np.zeros((6, ntp), np.float32)
	rows[0, :nt] = ct
	rows[1, :nt] = (ct64/st_safe).astype(np.float32)
	rows[2, :nt] = np.where(pole, 0.0, 1/st_safe).astype(np.float32)
	rows[3, :nt] = np.where(pole, 0.0, 1/(st_safe*st_safe)).astype(np.float32)
	rows[4, :nt] = np.where(pole, 0.0, 1.0).astype(np.float32)
	rows[4, nt:] = 1.0  # padding rings are "not pole" like _prep_inputs
	rows[5, :nt] = ctl_
	return jnp.asarray(rows)


def _blk_pack_tables(T, nlp, nko):
	"""[R, nlp, nmp] -> [nlb, nko, R, nmp, BLK_KU] (the blocked kernels'
	group-blocked k layout; see _synth_blk_call)."""
	R, _, nmp = T.shape
	return jnp.moveaxis(T, 1, 2).reshape(
		R, nmp, nlp//BLK_LB, nko, BLK_KU).transpose(2, 3, 0, 1, 4)


def _blk_node_tables(cth, nt, ntp, tb):
	"""Per-theta-tile node tables for the MXU block kernels. The coefficient
	build runs in VALUE space at the BLK_JP Chebyshev-Gauss nodes of the
	tile's own ct interval: multiplication by ct is then ELEMENTWISE (the
	Chebyshev-coefficient form needed two lane shifts + masks per step,
	which dominated the build), and the node->ring interpolation folds into
	the one MXU matmul per block that was already there.
	Returns ctv [ntb, 8, BLK_JP] (ct at the nodes, sublane-padded to a full
	(8,128) VMEM tile) and W [ntb, BLK_JP, tb] with W[n, j, t] = ell_j(x_t),
	the degree-<JP Lagrange basis through the nodes evaluated at the tile's
	rings -- computed stably as W = (diag(w) D)^T V with D[q,j] = T_q(x_j)
	(the host-exact DCT-II matrix) and V[q,t] = T_q(x_t) (the Chebyshev
	table at the rings, a two-term device recurrence on values <= 1).
	Padding rings carry ct = 0 (harmless: their tiles are never eligible
	output, and x stays in [-1, 1])."""
	ct = jnp.zeros((ntp,), jnp.float32).at[:nt].set(jnp.asarray(cth, jnp.float32))
	ctt = ct.reshape(ntp//tb, tb)
	hi = jnp.max(ctt, axis=1); lo = jnp.min(ctt, axis=1)
	c0 = (hi + lo)/2
	h = jnp.maximum((hi - lo)/2, 1e-30)
	x = (ctt - c0[:, None])/h[:, None]
	def step(carry, _):
		vm1, vm2 = carry
		v = 2*x*vm1 - vm2
		return (v, vm1), v
	v0 = jnp.ones_like(x)
	_, rest = jax.lax.scan(step, (x, v0), None, length=BLK_JP - 2)
	V = jnp.concatenate([v0[None], x[None], rest], 0)   # [JP, ntb, tb]
	j = np.arange(BLK_JP)
	xn = np.cos(np.pi*(j + 0.5)/BLK_JP)                 # Chebyshev-Gauss nodes
	D = np.cos(np.pi*np.outer(j, j + 0.5)/BLK_JP)       # D[q, j] = T_q(x_j)
	w = np.full(BLK_JP, 2.0/BLK_JP); w[0] = 1.0/BLK_JP
	Dw = jnp.asarray((D*w[:, None]).T, jnp.float32)     # [j, q]
	W = jnp.einsum("jq,qnt->njt", Dw, V,
		precision=jax.lax.Precision.HIGHEST)
	ctv = c0[:, None] + h[:, None]*jnp.asarray(xn, jnp.float32)[None, :]
	ctv = jnp.broadcast_to(ctv[:, None, :], (ntp//tb, 8, BLK_JP))
	return ctv, W


@functools.partial(jax.jit, static_argnames=("lmax", "mmax", "interpret"))
def _synth_blk_call(A, lmax, mmax, state, start64, ctv, W, interpret=False):
	"""Block-kernel synthesis over the eligible l-block suffix.
	A [nl, nm, C] f32, state [3, nmp, ntp] (prev, curr, lev dumped by the
	stepwise kernel at each tile's handoff degree), start64 [nmb, ntb] i32,
	ctv [ntb, 8, JP], W [ntb, JP, tb] (see _blk_node_tables). Returns G
	[1, C, nm, nt-ish] padded ([1, C, nmp, ntp]); caller slices and adds to
	the stepwise part.

	The alpha/beta series are carried as VALUES at the tile's Chebyshev
	nodes, so the inner step is three elementwise [MB, JP] ops per series
	(the first version carried Chebyshev COEFFICIENTS, whose ct-multiply
	needed two lane-rolls + masks, and read its per-step a/b/A columns with
	a lane->sublane relayout + concatenate each -- measured parity with the
	stepwise kernel; this form removes every relayout from the loop).
	Coefficient tables arrive pre-transposed (l in lanes) so the per-step
	[MB, 1] columns are plain static slices."""
	A = jnp.asarray(A, jnp.float32)
	C = A.shape[-1]
	ntb_n, JP, tb = W.shape
	nm = mmax + 1; nl = lmax + 1
	nmp = _ceil(nm, MB)*MB
	nlp = _ceil(nl, BLK_LB)*BLK_LB
	ntp = ntb_n*tb
	nko = BLK_LB//BLK_KU
	# k rides the last axis in BLK_KU-wide groups ([nlb, nko, ., nmp, KU]):
	# the build loop indexes the group dynamically (fori_loop) and the
	# in-group columns statically. Mosaic requires the lane-dim block to be
	# 128-divisible OR the full extent; KU=16 is legal only as the full
	# last dim (caught on chip: interpret mode accepts non-conforming lane
	# blocks of a bigger array, hardware doesn't).
	abT = _blk_pack_tables(_recur_ab_tables(nlp, nmp), nlp, nko)
	ApT = _blk_pack_tables(jnp.zeros((C, nlp, nmp), jnp.float32)
		.at[:, :nl, :nm].set(jnp.moveaxis(A, -1, 0)), nlp, nko)
	grid = (nmp//MB, ntb_n, nlp//BLK_LB)
	band = np.float32(2.0**S32)
	invband = np.float32(2.0**-S32)
	fac_m1 = np.float32(2.0**-S32)
	start64_shape = (nmp//MB, ntb_n)

	def kern(a_ref, ab_ref, st_ref, s_ref, ctv_ref, w_ref, out_ref, *scratch):
		im = pl.program_id(0)
		it = pl.program_id(1)
		il = pl.program_id(2)
		s0 = s_ref[im, it]
		@pl.when(il == 0)
		def _():
			out_ref[:] = jnp.zeros_like(out_ref)
		@pl.when(il == s0)
		def _():
			for i, r in enumerate(scratch):
				r[:] = st_ref[i]
		@pl.when(il >= s0)
		def _():
			prev = scratch[0][:]
			curr = scratch[1][:]
			lev = scratch[2][:]
			ctvv = ctv_ref[0, 0:1, :]                 # [1, JP]
			one = jnp.ones((MB, JP), jnp.float32)
			zero = jnp.zeros((MB, JP), jnp.float32)
			def build(ko, cy):
				gA_c, gA_p, gB_c, gB_p = cy[:4]
				Bk = list(cy[4:])
				ag = ab_ref[0, ko, 0]                 # [MB, KU]
				bg = ab_ref[0, ko, 1]
				amg = [a_ref[0, ko, ci] for ci in range(C)]
				for k in range(BLK_KU):
					a = ag[:, k:k+1]                  # [MB, 1] static slice
					b = bg[:, k:k+1]
					gA_n = a*(ctvv*gA_c - b*gA_p)
					gB_n = a*(ctvv*gB_c - b*gB_p)
					gA_p, gA_c = gA_c, gA_n
					gB_p, gB_c = gB_c, gB_n
					for ci in range(C):
						am = amg[ci][:, k:k+1]
						Bk[ci] = Bk[ci] + am*gA_c
						Bk[C + ci] = Bk[C + ci] + am*gB_c
				return (gA_c, gA_p, gB_c, gB_p) + tuple(Bk)
			cy = jax.lax.fori_loop(0, nko, build,
				(one, zero, zero, one) + (zero,)*(2*C))
			gA_c, gA_p, gB_c, gB_p = cy[:4]
			BkA, BkB = list(cy[4:4+C]), list(cy[4+C:])
			# one fused node->ring matmul: data folds, then the end states.
			# HIGHEST precision (6-pass bf16) keeps full f32 product
			# accuracy; the summands are O(1) by the BLK_GMAX eligibility
			# bound. (Mosaic rejects Precision.HIGH, so 3-pass is not an
			# option -- see the dot_general comment below.)
			L = jnp.concatenate(BkA + BkB + [gA_c, gA_p, gB_c, gB_p], axis=0)
			E = jax.lax.dot_general(L, w_ref[0], (((1,), (0,)), ((), ())),
				# Mosaic supports only DEFAULT/HIGHEST dot precision; DEFAULT
				# (1-pass bf16, ~2^-8) is too lossy for the O(2^GMAX) summands
				precision=jax.lax.Precision.HIGHEST,
				preferred_element_type=jnp.float32)   # [(2C+4)*MB, tb]
			# emission scale from the (block-constant) entry level; -2 emits
			# at 2^-120 so only true values < ~2e-17 are dropped
			fac = jnp.where(lev == 0, 1.0, jnp.where(lev == -1, fac_m1,
				jnp.where(lev == -2, FAC_M2, 0.0)))
			currf = curr*fac
			prevf = prev*fac
			for ci in range(C):
				out_ref[0, ci] += (E[ci*MB:(ci+1)*MB]*currf
					+ E[(C+ci)*MB:(C+ci+1)*MB]*prevf)
			o = 2*C*MB
			ncurr = E[o:o+MB]*curr + E[o+2*MB:o+3*MB]*prev
			nprev = E[o+MB:o+2*MB]*curr + E[o+3*MB:o+4*MB]*prev
			nprev, ncurr, lev = _rescale(nprev, ncurr, lev, band, invband)
			scratch[0][:] = nprev
			scratch[1][:] = ncurr
			scratch[2][:] = lev

	out = pl.pallas_call(
		kern,
		grid=grid,
		in_specs=[
			pl.BlockSpec((1, nko, C, MB, BLK_KU),
				lambda im, it, il: (il, 0, 0, im, 0), memory_space=pltpu.VMEM),
			pl.BlockSpec((1, nko, 2, MB, BLK_KU),
				lambda im, it, il: (il, 0, 0, im, 0), memory_space=pltpu.VMEM),
			pl.BlockSpec((3, MB, tb), lambda im, it, il: (0, im, it),
				memory_space=pltpu.VMEM),
			# the start table rides whole in SMEM (TPU lowering rejects
			# partial sub-(8,128) blocks) and is indexed by program id
			pl.BlockSpec(start64_shape, lambda im, it, il: (0, 0),
				memory_space=pltpu.SMEM),
			pl.BlockSpec((1, 8, BLK_JP), lambda im, it, il: (it, 0, 0),
				memory_space=pltpu.VMEM),
			pl.BlockSpec((1, BLK_JP, tb), lambda im, it, il: (it, 0, 0),
				memory_space=pltpu.VMEM),
		],
		out_specs=pl.BlockSpec((1, C, MB, tb), lambda im, it, il: (0, 0, im, it),
			memory_space=pltpu.VMEM),
		out_shape=jax.ShapeDtypeStruct((1, C, nmp, ntp), jnp.float32),
		scratch_shapes=[pltpu.VMEM((MB, tb), jnp.float32)]*3,
		compiler_params=pltpu.CompilerParams(
			dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
			# the unrolled 64-step coefficient build keeps ~8 [MB,JP] tiles
			# plus the matmul results live: past the 16M default scoped
			# limit; v5e has 128M physical VMEM
			vmem_limit_bytes=VMEM_BUDGET),
		interpret=interpret,
	)(ApT, abT, state, start64, ctv, W)
	return out


@functools.partial(jax.jit, static_argnames=("lmax", "mmax", "mode", "interpret"))
def _synth_blk_call_streams(A, lmax, mmax, state, start64, ctv, W, th,
		mode="spin2", interpret=False):
	"""Stream-mode block-kernel synthesis over the eligible l-block suffix
	(spin2 / deriv / spin1). Same build/state machinery as _synth_blk_call,
	but the fold accumulates S coefficient streams per component (formed
	in-kernel from A times the mode's stream-table columns -- [MB,1]
	products, nearly free) whose node->ring interpolations combine with the
	mode's ring factors into its output functions (_blk_mode_spec). th is
	the padded [6, ntp] ring-function table (_prep_th). Returns G
	[nfun, C, nmp, ntp] padded."""
	nfun, tables_fn, fam, synth_combine, _ = _blk_mode_spec(mode)
	NS = len(fam)
	A = jnp.asarray(A, jnp.float32)
	C = A.shape[-1]
	ntb_n, JP, tb = W.shape
	nm = mmax + 1; nl = lmax + 1
	nmp = _ceil(nm, MB)*MB
	nlp = _ceil(nl, BLK_LB)*BLK_LB
	ntp = ntb_n*tb
	nko = BLK_LB//BLK_KU
	abT = _blk_pack_tables(_recur_ab_tables(nlp, nmp), nlp, nko)
	csT = _blk_pack_tables(tables_fn(nlp, nmp), nlp, nko)
	ApT = _blk_pack_tables(jnp.zeros((C, nlp, nmp), jnp.float32)
		.at[:, :nl, :nm].set(jnp.moveaxis(A, -1, 0)), nlp, nko)
	grid = (nmp//MB, ntb_n, nlp//BLK_LB)
	band = np.float32(2.0**S32)
	invband = np.float32(2.0**-S32)
	fac_m1 = np.float32(2.0**-S32)
	start64_shape = (nmp//MB, ntb_n)

	def kern(a_ref, ab_ref, cs_ref, st_ref, s_ref, ctv_ref, w_ref, th_ref,
			out_ref, *scratch):
		im = pl.program_id(0)
		it = pl.program_id(1)
		il = pl.program_id(2)
		s0 = s_ref[im, it]
		@pl.when(il == 0)
		def _():
			out_ref[:] = jnp.zeros_like(out_ref)
		@pl.when(il == s0)
		def _():
			for i, r in enumerate(scratch):
				r[:] = st_ref[i]
		@pl.when(il >= s0)
		def _():
			prev = scratch[0][:]
			curr = scratch[1][:]
			lev = scratch[2][:]
			ctvv = ctv_ref[0, 0:1, :]                 # [1, JP]
			one = jnp.ones((MB, JP), jnp.float32)
			zero = jnp.zeros((MB, JP), jnp.float32)
			# carry: chain (4) + per (ci, stream) x families (A, B)
			def build(ko, cy):
				gA_c, gA_p, gB_c, gB_p = cy[:4]
				S = list(cy[4:])                      # [ci*2*NS + (A/B)*NS + s]
				ag = ab_ref[0, ko, 0]
				bg = ab_ref[0, ko, 1]
				cg = [cs_ref[0, ko, s] for s in range(NS)]
				amg = [a_ref[0, ko, ci] for ci in range(C)]
				for k in range(BLK_KU):
					a = ag[:, k:k+1]
					b = bg[:, k:k+1]
					gA_n = a*(ctvv*gA_c - b*gA_p)
					gB_n = a*(ctvv*gB_c - b*gB_p)
					gA_p, gA_c = gA_c, gA_n
					gB_p, gB_c = gB_c, gB_n
					for ci in range(C):
						am = amg[ci][:, k:k+1]
						o = ci*2*NS
						for s in range(NS):
							asn = am*cg[s][:, k:k+1]  # [MB,1]: cheap
							# fam 1 streams weight lam1 = alpha_{k-1}
							gA = gA_c if fam[s] == 0 else gA_p
							gB = gB_c if fam[s] == 0 else gB_p
							S[o+s] = S[o+s] + asn*gA
							S[o+NS+s] = S[o+NS+s] + asn*gB
				return (gA_c, gA_p, gB_c, gB_p) + tuple(S)
			cy = jax.lax.fori_loop(0, nko, build,
				(one, zero, zero, one) + (zero,)*(2*NS*C))
			gA_c, gA_p, gB_c, gB_p = cy[:4]
			S = cy[4:]
			fac = jnp.where(lev == 0, 1.0, jnp.where(lev == -1, fac_m1,
				jnp.where(lev == -2, FAC_M2, 0.0)))
			currf = curr*fac
			prevf = prev*fac
			marr = (im*MB + jax.lax.broadcasted_iota(
				jnp.int32, (MB, 1), 0)).astype(jnp.float32)
			th6 = [th_ref[i, :][None, :] for i in range(6)]
			for ci in range(C):
				L = jnp.concatenate(S[ci*2*NS:(ci+1)*2*NS], axis=0)
				E = jax.lax.dot_general(L, w_ref[0], (((1,), (0,)), ((), ())),
					# Mosaic supports only DEFAULT/HIGHEST dot precision; DEFAULT
				# (1-pass bf16, ~2^-8) is too lossy for the O(2^GMAX) summands
				precision=jax.lax.Precision.HIGHEST,
					preferred_element_type=jnp.float32)    # [2*NS*MB, tb]
				ts = [E[s*MB:(s+1)*MB]*currf + E[(NS+s)*MB:(NS+s+1)*MB]*prevf
					for s in range(NS)]
				outs = synth_combine(ts, th6, marr)
				for f in range(nfun):
					out_ref[0, f, ci] += outs[f]
			L2 = jnp.concatenate([gA_c, gA_p, gB_c, gB_p], axis=0)
			E2 = jax.lax.dot_general(L2, w_ref[0], (((1,), (0,)), ((), ())),
				# Mosaic supports only DEFAULT/HIGHEST dot precision; DEFAULT
				# (1-pass bf16, ~2^-8) is too lossy for the O(2^GMAX) summands
				precision=jax.lax.Precision.HIGHEST,
				preferred_element_type=jnp.float32)
			ncurr = E2[:MB]*curr + E2[2*MB:3*MB]*prev
			nprev = E2[MB:2*MB]*curr + E2[3*MB:]*prev
			nprev, ncurr, lev = _rescale(nprev, ncurr, lev, band, invband)
			scratch[0][:] = nprev
			scratch[1][:] = ncurr
			scratch[2][:] = lev

	out = pl.pallas_call(
		kern,
		grid=grid,
		in_specs=[
			pl.BlockSpec((1, nko, C, MB, BLK_KU),
				lambda im, it, il: (il, 0, 0, im, 0), memory_space=pltpu.VMEM),
			pl.BlockSpec((1, nko, 2, MB, BLK_KU),
				lambda im, it, il: (il, 0, 0, im, 0), memory_space=pltpu.VMEM),
			pl.BlockSpec((1, nko, NS, MB, BLK_KU),
				lambda im, it, il: (il, 0, 0, im, 0), memory_space=pltpu.VMEM),
			pl.BlockSpec((3, MB, tb), lambda im, it, il: (0, im, it),
				memory_space=pltpu.VMEM),
			pl.BlockSpec(start64_shape, lambda im, it, il: (0, 0),
				memory_space=pltpu.SMEM),
			pl.BlockSpec((1, 8, BLK_JP), lambda im, it, il: (it, 0, 0),
				memory_space=pltpu.VMEM),
			pl.BlockSpec((1, BLK_JP, tb), lambda im, it, il: (it, 0, 0),
				memory_space=pltpu.VMEM),
			pl.BlockSpec((6, tb), lambda im, it, il: (0, it),
				memory_space=pltpu.VMEM),
		],
		out_specs=pl.BlockSpec((1, nfun, C, MB, tb),
			lambda im, it, il: (0, 0, 0, im, it), memory_space=pltpu.VMEM),
		out_shape=jax.ShapeDtypeStruct((1, nfun, C, nmp, ntp), jnp.float32),
		scratch_shapes=[pltpu.VMEM((MB, tb), jnp.float32)]*3,
		compiler_params=pltpu.CompilerParams(
			dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
			vmem_limit_bytes=VMEM_BUDGET),
		interpret=interpret,
	)(ApT, abT, csT, state, start64, ctv, W, th)
	return out[0]


def _synthesis_scan_pallas_blocked(A, theta, lmax, mmax, interpret=False,
		cth=None, ctl=None, mode="scalar"):
	"""Stepwise prefix + MXU block suffix (scalar/spin2, fast tier). Falls
	back to the plain kernel when no tile has an eligible suffix."""
	A = jnp.asarray(A, jnp.float32)
	C = A.shape[-1]
	nfun = sht_core.NFUN[mode]
	nt = int(np.shape(theta)[0])
	tb = _pick_tb(nfun, C, nt=nt, ds=False)
	start = _blk_start_table(theta, lmax, mmax, tb)
	nlb = _ceil(lmax + 1, BLK_LB)
	# dead (beyond-horizon) tiles: neither kernel runs them -- start=nlb
	# keeps the block kernel out, lstop=0 keeps the stepwise prefix out
	dead = _dead_table(theta, lmax, mmax, tb)
	start = np.where(dead, nlb, start)
	if not np.any(start < nlb):
		return _synthesis_scan_pallas_full(A, theta, lmax, mmax, mode=mode,
			interpret=interpret, ds=False, cth=cth, ctl=ctl,
			lstop=_dead_lstop(theta, lmax, mmax, nfun, C, False))
	lstop = jnp.asarray(np.where(dead, 0, start*(BLK_LB//LB)), jnp.int32)
	ntp = _ceil(nt, tb)*tb
	if cth is None:
		cp = _ct_parts(theta)
		cth, ctl = cp if cp is not None else (jnp.cos(
			jnp.asarray(theta, jnp.float32)), None)
	ctv, W = _blk_node_tables(cth, nt, ntp, tb)
	# kernel 1: stepwise up to each tile's handoff degree, dumping state
	G1, state = _synthesis_scan_pallas_full(A, theta, lmax, mmax,
		mode=mode, interpret=interpret, ds=False, cth=cth, ctl=ctl,
		lstop=lstop, dump_state=True)
	# kernel 2: MXU blocks over the eligible suffix
	if mode in BLK_STREAM_MODES:
		th = _prep_th(theta, tb, cth=cth, ctl=ctl)
		G2 = _synth_blk_call_streams(A, lmax, mmax, state, jnp.asarray(start),
			ctv, W, th, mode=mode, interpret=interpret)
	else:
		G2 = _synth_blk_call(A, lmax, mmax, state, jnp.asarray(start), ctv, W,
			interpret=interpret)
	return G1 + G2[:, :, :mmax + 1, :nt]


@functools.partial(jax.jit, static_argnames=("lmax", "mmax", "interpret"))
def _anal_blk_call(F, lmax, mmax, state, start64, ctv, W, interpret=False):
	"""Block-kernel analysis over the eligible l-block suffix (transpose of
	_synth_blk_call): out_k[m] = sum_j alpha_k(x_j)*Wc[m,j] + beta_k*Wp[m,j]
	with Wc = (curr*fac*F) @ W^T, Wp likewise -- two MXU matmuls per
	(tile, component) plus the shared value-space build, instead of
	BLK_LB stepwise VPU sweeps. The per-degree j-reductions are DEFERRED:
	each degree's products accumulate into an [LB, MB, JP] buffer (k on the
	leading axis, a free store) and one reduction at the end produces the
	whole [LB, MB] output slab (per-k lane reductions were ~2x the build
	cost). F [nfun=1, C, nm, nt] padded inside.
	Returns the partial [nl, nm, C] for the blocked region."""
	F = jnp.asarray(F, jnp.float32)
	C = F.shape[1]
	ntb_n, JP, tb = W.shape
	nm = mmax + 1; nl = lmax + 1
	nmp = _ceil(nm, MB)*MB
	nlp = _ceil(nl, BLK_LB)*BLK_LB
	ntp = ntb_n*tb
	nko = BLK_LB//BLK_KU
	# k in BLK_KU groups on the last axis (same Mosaic lane-divisibility
	# rule and fori_loop build as _synth_blk_call's tables)
	abT = _blk_pack_tables(_recur_ab_tables(nlp, nmp), nlp, nko)
	Fp = jnp.zeros((C, nmp, ntp), jnp.float32).at[:, :nm, :F.shape[-1]].set(F[0])
	grid = (nmp//MB, ntb_n, nlp//BLK_LB)
	band = np.float32(2.0**S32)
	invband = np.float32(2.0**-S32)
	fac_m1 = np.float32(2.0**-S32)
	start64_shape = (nmp//MB, ntb_n)

	def kern(f_ref, ab_ref, st_ref, s_ref, ctv_ref, w_ref, out_ref,
			sc0, sc1, sc2, *sbuf):
		im = pl.program_id(0)
		it = pl.program_id(1)
		il = pl.program_id(2)
		scratch = (sc0, sc1, sc2)
		s0 = s_ref[im, it]
		@pl.when(il == s0)
		def _():
			for i, r in enumerate(scratch):
				r[:] = st_ref[i]
		# each (it, il) output slab is written exactly once: zeros when this
		# block is not in the eligible suffix
		@pl.when(il < s0)
		def _():
			out_ref[:] = jnp.zeros_like(out_ref)
		@pl.when(il >= s0)
		def _():
			prev = scratch[0][:]
			curr = scratch[1][:]
			lev = scratch[2][:]
			ctvv = ctv_ref[0, 0:1, :]                 # [1, JP]
			one = jnp.ones((MB, JP), jnp.float32)
			zero = jnp.zeros((MB, JP), jnp.float32)
			fac = jnp.where(lev == 0, 1.0, jnp.where(lev == -1, fac_m1,
				jnp.where(lev == -2, FAC_M2, 0.0)))
			currf = curr*fac
			prevf = prev*fac
			Wt = w_ref[0]
			# contract theta FIRST: Wc[m, j] = sum_t curr*fac*F(m,t) W(j,t)
			dott = lambda L: jax.lax.dot_general(L, Wt,
				(((1,), (1,)), ((), ())),
				# Mosaic supports only DEFAULT/HIGHEST dot precision; DEFAULT
				# (1-pass bf16, ~2^-8) is too lossy for the O(2^GMAX) summands
				precision=jax.lax.Precision.HIGHEST,
				preferred_element_type=jnp.float32)
			Wc = [dott(currf*f_ref[ci]) for ci in range(C)]
			Wp = [dott(prevf*f_ref[ci]) for ci in range(C)]
			def build(ko, cy):
				gA_c, gA_p, gB_c, gB_p = cy
				ag = ab_ref[0, ko, 0]                 # [MB, KU]
				bg = ab_ref[0, ko, 1]
				for k in range(BLK_KU):
					a = ag[:, k:k+1]
					b = bg[:, k:k+1]
					gA_n = a*(ctvv*gA_c - b*gA_p)
					gB_n = a*(ctvv*gB_c - b*gB_p)
					gA_p, gA_c = gA_c, gA_n
					gB_p, gB_c = gB_c, gB_n
					for ci in range(C):
						sbuf[ci][ko*BLK_KU + k] = gA_c*Wc[ci] + gB_c*Wp[ci]
				return (gA_c, gA_p, gB_c, gB_p)
			gA_c, gA_p, gB_c, gB_p = jax.lax.fori_loop(0, nko, build,
				(one, zero, zero, one))
			for ci in range(C):
				out_ref[0, ci] = jnp.sum(sbuf[ci][:], -1)   # [LB, MB]
			# state propagation to the next block: one fused matmul
			L2 = jnp.concatenate([gA_c, gA_p, gB_c, gB_p], axis=0)  # [4MB, JP]
			E = jax.lax.dot_general(L2, Wt, (((1,), (0,)), ((), ())),
				# Mosaic supports only DEFAULT/HIGHEST dot precision; DEFAULT
				# (1-pass bf16, ~2^-8) is too lossy for the O(2^GMAX) summands
				precision=jax.lax.Precision.HIGHEST,
				preferred_element_type=jnp.float32)
			ncurr = E[:MB]*curr + E[2*MB:3*MB]*prev
			nprev = E[MB:2*MB]*curr + E[3*MB:]*prev
			nprev, ncurr, lev = _rescale(nprev, ncurr, lev, band, invband)
			scratch[0][:] = nprev
			scratch[1][:] = ncurr
			scratch[2][:] = lev

	out = pl.pallas_call(
		kern,
		grid=grid,
		in_specs=[
			pl.BlockSpec((C, MB, tb), lambda im, it, il: (0, im, it),
				memory_space=pltpu.VMEM),
			pl.BlockSpec((1, nko, 2, MB, BLK_KU),
				lambda im, it, il: (il, 0, 0, im, 0), memory_space=pltpu.VMEM),
			pl.BlockSpec((3, MB, tb), lambda im, it, il: (0, im, it),
				memory_space=pltpu.VMEM),
			pl.BlockSpec(start64_shape, lambda im, it, il: (0, 0),
				memory_space=pltpu.SMEM),
			pl.BlockSpec((1, 8, BLK_JP), lambda im, it, il: (it, 0, 0),
				memory_space=pltpu.VMEM),
			pl.BlockSpec((1, BLK_JP, tb), lambda im, it, il: (it, 0, 0),
				memory_space=pltpu.VMEM),
		],
		out_specs=pl.BlockSpec((1, C, BLK_LB, MB),
			lambda im, it, il: (it, 0, il, im), memory_space=pltpu.VMEM),
		out_shape=jax.ShapeDtypeStruct((ntb_n, C, nlp, nmp), jnp.float32),
		scratch_shapes=[pltpu.VMEM((MB, tb), jnp.float32)]*3
			+ [pltpu.VMEM((BLK_LB, MB, BLK_JP), jnp.float32)]*C,
		compiler_params=pltpu.CompilerParams(
			dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
			vmem_limit_bytes=VMEM_BUDGET),
		interpret=interpret,
	)(Fp, abT, state, start64, ctv, W)
	return jnp.moveaxis(jnp.sum(out, axis=0), 0, -1)[:nl, :nm]


@functools.partial(jax.jit, static_argnames=("lmax", "mmax", "mode", "interpret"))
def _anal_blk_call_streams(F, lmax, mmax, state, start64, ctv, W, th,
		mode="spin2", interpret=False):
	"""Stream-mode block-kernel analysis (transpose of
	_synth_blk_call_streams): out_l = sum_s c_s(l)*T_s with T_s(l) the
	lam/lam1-weighted ring sums of the mode's factor-combined fields
	(_blk_mode_spec anal_fields). F [nfun, C, nm, nt] -> [nl, nm, C]
	partial for the blocked region."""
	nfun, tables_fn, fam, _, anal_fields = _blk_mode_spec(mode)
	NS = len(fam)
	F = jnp.asarray(F, jnp.float32)
	C = F.shape[1]
	ntb_n, JP, tb = W.shape
	nm = mmax + 1; nl = lmax + 1
	nmp = _ceil(nm, MB)*MB
	nlp = _ceil(nl, BLK_LB)*BLK_LB
	ntp = ntb_n*tb
	nko = BLK_LB//BLK_KU
	abT = _blk_pack_tables(_recur_ab_tables(nlp, nmp), nlp, nko)
	csT = _blk_pack_tables(tables_fn(nlp, nmp), nlp, nko)
	Fp = jnp.zeros((nfun, C, nmp, ntp), jnp.float32) \
		.at[:, :, :nm, :F.shape[-1]].set(F)
	grid = (nmp//MB, ntb_n, nlp//BLK_LB)
	band = np.float32(2.0**S32)
	invband = np.float32(2.0**-S32)
	fac_m1 = np.float32(2.0**-S32)
	start64_shape = (nmp//MB, ntb_n)

	def kern(f_ref, ab_ref, cs_ref, st_ref, s_ref, ctv_ref, w_ref, th_ref,
			out_ref, sc0, sc1, sc2, *sbuf):
		im = pl.program_id(0)
		it = pl.program_id(1)
		il = pl.program_id(2)
		scratch = (sc0, sc1, sc2)
		s0 = s_ref[im, it]
		@pl.when(il == s0)
		def _():
			for i, r in enumerate(scratch):
				r[:] = st_ref[i]
		@pl.when(il < s0)
		def _():
			out_ref[:] = jnp.zeros_like(out_ref)
		@pl.when(il >= s0)
		def _():
			prev = scratch[0][:]
			curr = scratch[1][:]
			lev = scratch[2][:]
			ctvv = ctv_ref[0, 0:1, :]                 # [1, JP]
			one = jnp.ones((MB, JP), jnp.float32)
			zero = jnp.zeros((MB, JP), jnp.float32)
			fac = jnp.where(lev == 0, 1.0, jnp.where(lev == -1, fac_m1,
				jnp.where(lev == -2, FAC_M2, 0.0)))
			currf = curr*fac
			prevf = prev*fac
			marr = (im*MB + jax.lax.broadcasted_iota(
				jnp.int32, (MB, 1), 0)).astype(jnp.float32)
			th6 = [th_ref[i, :][None, :] for i in range(6)]
			Wt = w_ref[0]
			dott = lambda L: jax.lax.dot_general(L, Wt,
				(((1,), (1,)), ((), ())),
				# Mosaic supports only DEFAULT/HIGHEST dot precision; DEFAULT
				# (1-pass bf16, ~2^-8) is too lossy for the O(2^GMAX) summands
				precision=jax.lax.Precision.HIGHEST,
				preferred_element_type=jnp.float32)
			Wc, Wp = [], []
			for ci in range(C):
				G = anal_fields(f_ref[0, ci], f_ref[nfun - 1, ci], th6, marr)
				Wc.append([dott(currf*g) for g in G])
				Wp.append([dott(prevf*g) for g in G])
			def build(ko, cy):
				gA_c, gA_p, gB_c, gB_p = cy
				ag = ab_ref[0, ko, 0]
				bg = ab_ref[0, ko, 1]
				cg = [cs_ref[0, ko, s] for s in range(NS)]
				for k in range(BLK_KU):
					a = ag[:, k:k+1]
					b = bg[:, k:k+1]
					gA_n = a*(ctvv*gA_c - b*gA_p)
					gB_n = a*(ctvv*gB_c - b*gB_p)
					gA_p, gA_c = gA_c, gA_n
					gB_p, gB_c = gB_c, gB_n
					cs = [cg[s][:, k:k+1] for s in range(NS)]
					for ci in range(C):
						tot = None
						for s in range(NS):
							gA = gA_c if fam[s] == 0 else gA_p
							gB = gB_c if fam[s] == 0 else gB_p
							t = gA*(cs[s]*Wc[ci][s]) + gB*(cs[s]*Wp[ci][s])
							tot = t if tot is None else tot + t
						sbuf[ci][ko*BLK_KU + k] = tot
				return (gA_c, gA_p, gB_c, gB_p)
			gA_c, gA_p, gB_c, gB_p = jax.lax.fori_loop(0, nko, build,
				(one, zero, zero, one))
			for ci in range(C):
				out_ref[0, ci] = jnp.sum(sbuf[ci][:], -1)   # [BLK_LB, MB]
			L2 = jnp.concatenate([gA_c, gA_p, gB_c, gB_p], axis=0)
			E = jax.lax.dot_general(L2, Wt, (((1,), (0,)), ((), ())),
				# Mosaic supports only DEFAULT/HIGHEST dot precision; DEFAULT
				# (1-pass bf16, ~2^-8) is too lossy for the O(2^GMAX) summands
				precision=jax.lax.Precision.HIGHEST,
				preferred_element_type=jnp.float32)
			ncurr = E[:MB]*curr + E[2*MB:3*MB]*prev
			nprev = E[MB:2*MB]*curr + E[3*MB:]*prev
			nprev, ncurr, lev = _rescale(nprev, ncurr, lev, band, invband)
			scratch[0][:] = nprev
			scratch[1][:] = ncurr
			scratch[2][:] = lev

	out = pl.pallas_call(
		kern,
		grid=grid,
		in_specs=[
			pl.BlockSpec((nfun, C, MB, tb), lambda im, it, il: (0, 0, im, it),
				memory_space=pltpu.VMEM),
			pl.BlockSpec((1, nko, 2, MB, BLK_KU),
				lambda im, it, il: (il, 0, 0, im, 0), memory_space=pltpu.VMEM),
			pl.BlockSpec((1, nko, NS, MB, BLK_KU),
				lambda im, it, il: (il, 0, 0, im, 0), memory_space=pltpu.VMEM),
			pl.BlockSpec((3, MB, tb), lambda im, it, il: (0, im, it),
				memory_space=pltpu.VMEM),
			pl.BlockSpec(start64_shape, lambda im, it, il: (0, 0),
				memory_space=pltpu.SMEM),
			pl.BlockSpec((1, 8, BLK_JP), lambda im, it, il: (it, 0, 0),
				memory_space=pltpu.VMEM),
			pl.BlockSpec((1, BLK_JP, tb), lambda im, it, il: (it, 0, 0),
				memory_space=pltpu.VMEM),
			pl.BlockSpec((6, tb), lambda im, it, il: (0, it),
				memory_space=pltpu.VMEM),
		],
		out_specs=pl.BlockSpec((1, C, BLK_LB, MB),
			lambda im, it, il: (it, 0, il, im), memory_space=pltpu.VMEM),
		out_shape=jax.ShapeDtypeStruct((ntb_n, C, nlp, nmp), jnp.float32),
		scratch_shapes=[pltpu.VMEM((MB, tb), jnp.float32)]*3
			+ [pltpu.VMEM((BLK_LB, MB, BLK_JP), jnp.float32)]*C,
		compiler_params=pltpu.CompilerParams(
			dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
			vmem_limit_bytes=VMEM_BUDGET),
		interpret=interpret,
	)(Fp, abT, csT, state, start64, ctv, W, th)
	return jnp.moveaxis(jnp.sum(out, axis=0), 0, -1)[:nl, :nm]


def _analysis_scan_pallas_blocked(F, theta, lmax, mmax, interpret=False,
		cth=None, ctl=None, mode="scalar"):
	"""Stepwise prefix + MXU block suffix for analysis (scalar/spin2)."""
	F = jnp.asarray(F, jnp.float32)
	C = F.shape[1]
	nfun = sht_core.NFUN[mode]
	nt = int(np.shape(theta)[0])
	tb = _pick_tb(nfun, C, nt=nt, ds=False)
	start = _blk_start_table(theta, lmax, mmax, tb)
	nlb = _ceil(lmax + 1, BLK_LB)
	dead = _dead_table(theta, lmax, mmax, tb)
	start = np.where(dead, nlb, start)
	if not np.any(start < nlb):
		return _analysis_scan_pallas_full(F, theta, lmax, mmax, mode=mode,
			interpret=interpret, ds=False, cth=cth, ctl=ctl,
			lstop=_dead_lstop(theta, lmax, mmax, nfun, C, False))
	lstop = jnp.asarray(np.where(dead, 0, start*(BLK_LB//LB)), jnp.int32)
	ntp = _ceil(nt, tb)*tb
	if cth is None:
		cp = _ct_parts(theta)
		cth, ctl = cp if cp is not None else (jnp.cos(
			jnp.asarray(theta, jnp.float32)), None)
	ctv, W = _blk_node_tables(cth, nt, ntp, tb)
	out1, state = _analysis_scan_pallas_full(F, theta, lmax, mmax,
		mode=mode, interpret=interpret, ds=False, cth=cth, ctl=ctl,
		lstop=lstop, dump_state=True)
	if mode in BLK_STREAM_MODES:
		th = _prep_th(theta, tb, cth=cth, ctl=ctl)
		out2 = _anal_blk_call_streams(F, lmax, mmax, state, jnp.asarray(start),
			ctv, W, th, mode=mode, interpret=interpret)
	else:
		out2 = _anal_blk_call(F, lmax, mmax, state, jnp.asarray(start), ctv, W,
			interpret=interpret)
	return out1 + out2


def _anal_full_fast(F, theta, lmax, mmax, mode, interpret, ds, cth, ctl):
	"""Fast-tier full-kernel analysis entry: blocked split when eligible."""
	if _blk_ok(mode, ds, theta, lmax):
		return _analysis_scan_pallas_blocked(F, theta, lmax, mmax,
			interpret=interpret, cth=cth, ctl=ctl, mode=mode)
	return _analysis_scan_pallas_full(F, theta, lmax, mmax, mode=mode,
		interpret=interpret, ds=ds, cth=cth, ctl=ctl,
		lstop=_dead_lstop(theta, lmax, mmax, sht_core.NFUN[mode],
			F.shape[1], ds))


@functools.partial(jax.jit, static_argnames=("lmax", "mmax", "mode", "interpret", "ds",
	"wig_s", "wig_branch", "dump_state"))
def _synthesis_scan_pallas_full(A, theta, lmax, mmax, mode="scalar", interpret=False,
		ds=False, cth=None, ctl=None, wig_s=None, wig_branch=0,
		lstop=None, dump_state=False):
	"""Pallas version of sht_core.synthesis_scan (float32). mode="wigner"
	(with wig_s/wig_branch) runs one branch of the general-spin Wigner-d
	recurrence instead of the Legendre one.
	dump_state (with lstop [nmb, ntb] i32, in LB-block units): stop each
	(m, theta) tile's l-loop at its own lstop block and ALSO return the
	recurrence state [3, nmp, ntp] at the handoff -- the stepwise-prefix
	half of the MXU block-Legendre split (see _synthesis_scan_pallas_blocked)."""
	A = jnp.asarray(A, jnp.float32)
	wig = None if wig_s is None else (int(wig_s), int(wig_branch))
	assert (mode == "wigner") == (wig is not None)
	assert not (dump_state and ds)
	nfun, funcs = _make_funcs(mode)
	C = A.shape[-1]
	tb = _pick_tb(nfun, C, nt=int(np.shape(theta)[0]), ds=ds)
	th, seedv, seedl, (nt, nm, nl, ntp, nmp, nlp) = _prep_inputs(theta, lmax, mmax, mode, tb=tb, cth=cth, ctl=ctl, wig=wig)
	if wig: ab = (_wigner_ab_tables_ds(nlp, nmp, wig[0], wig[1]) if ds
		else _wigner_ab_tables(nlp, nmp, wig[0], wig[1]))
	else: ab = _recur_ab_tables_ds(nlp, nmp) if ds else _recur_ab_tables(nlp, nmp)
	abrows = (6 if ds else 3) if wig else (4 if ds else 2)
	# layout: big axes minor so TPU (8,128) tiling doesn't pad the C axis
	Ap = jnp.zeros((C, nlp, nmp), jnp.float32).at[:, :nl, :nm].set(
		jnp.moveaxis(A, -1, 0))
	grid = (nmp//MB, ntp//tb, nlp//LB)
	band = np.float32(2.0**S32)
	invband = np.float32(2.0**-S32)
	fac_m1 = np.float32(2.0**-S32)
	nstate, prep_ct, stepf, rescalef = _make_stepper(ds)

	def kern_impl(a_ref, th_ref, sv_ref, sl_ref, ab_ref, out_ref, scratch,
			ls_ref=None, stout_ref=None):
		il = pl.program_id(2)
		im = pl.program_id(0)
		itg = pl.program_id(1)
		@pl.when(il == 0)
		def _():
			for r in scratch:
				r[:] = jnp.zeros((MB, tb), jnp.float32)
			out_ref[:] = jnp.zeros_like(out_ref)
		# blocks entirely below the diagonal (every l < every m) contribute
		# nothing: the recurrence state is still zero there. Skipping them
		# nearly halves the work for square transforms.
		active = (il + 1)*LB > im*MB
		if ls_ref is not None:
			active = jnp.logical_and(active, il < ls_ref[im, itg])
		@pl.when(active)
		def _():
			# coefficients depend only on m: compute them on [MB,1] columns and
			# let broadcasting expand over theta (cuts the sqrt work by tb)
			marr = (im*MB + jax.lax.broadcasted_iota(jnp.int32, (MB, 1), 0)).astype(jnp.float32)
			m2 = marr*marr
			l0col = jnp.maximum(marr, float(wig[0])) if wig else None
			thv = [th_ref[i, :][None, :] for i in range(6)]
			th_ct = prep_ct(thv[0], thv[5])
			st = tuple(r[:] for r in scratch)
			accs = [[jnp.zeros((MB, tb), jnp.float32) for _ in range(C)]
				for _ in range(nfun)]
			for k in range(LB):
				l = (il*LB + k).astype(jnp.float32)
				ablo = (ab_ref[2, k, :][:, None], ab_ref[3, k, :][:, None]) \
					if ds else (None, None)
				cadd = ab_ref[4 if ds else 2, k, :][:, None] if wig else None
				caddlo = ab_ref[5, k, :][:, None] if (wig and ds) else None
				st, lam, lam1 = stepf(l, marr, m2, th_ct, sv_ref[:], sl_ref[:],
					st, fac_m1, ab_ref[0, k, :][:, None], ab_ref[1, k, :][:, None],
					alo=ablo[0], blo=ablo[1], cadd=cadd, caddlo=caddlo, l0col=l0col)
				us = funcs(l, marr, m2, thv, lam, lam1)
				for f in range(nfun):
					for ci in range(C):
						accs[f][ci] = accs[f][ci] + us[f]*a_ref[ci, k, :][:, None]
				if k % 8 == 7:
					# near the seed the recurrence grows ~sqrt(2m/k) per step;
					# 16 unrescaled f32 steps overflow for m >~ 1000
					st = rescalef(st, band, invband)
			st = rescalef(st, band, invband)
			for r, v in zip(scratch, st): r[:] = v
			out_ref[:] += jnp.stack([jnp.stack(fc) for fc in accs])
		if stout_ref is not None:
			# hand the recurrence state to the MXU block kernel exactly at
			# this tile's stop block (runs after the compute above)
			@pl.when(il == ls_ref[im, itg] - 1)
			def _():
				for i, r in enumerate(scratch):
					stout_ref[i] = r[:]

	in_specs = [
		pl.BlockSpec((C, LB, MB), lambda im, it, il: (0, il, im),
			memory_space=pltpu.VMEM),
		pl.BlockSpec((6, tb), lambda im, it, il: (0, it), memory_space=pltpu.VMEM),
		pl.BlockSpec((MB, tb), lambda im, it, il: (im, it), memory_space=pltpu.VMEM),
		pl.BlockSpec((MB, tb), lambda im, it, il: (im, it), memory_space=pltpu.VMEM),
		pl.BlockSpec((abrows, LB, MB), lambda im, it, il: (0, il, im),
			memory_space=pltpu.VMEM),
	]
	out_spec = pl.BlockSpec((nfun, C, MB, tb), lambda im, it, il: (0, 0, im, it),
		memory_space=pltpu.VMEM)
	if dump_state:
		def kern(a_ref, th_ref, sv_ref, sl_ref, ab_ref, ls_ref, out_ref,
				stout_ref, *scratch):
			kern_impl(a_ref, th_ref, sv_ref, sl_ref, ab_ref, out_ref, scratch,
				ls_ref=ls_ref, stout_ref=stout_ref)
		in_specs.append(pl.BlockSpec((nmp//MB, ntp//tb),
			lambda im, it, il: (0, 0), memory_space=pltpu.SMEM))
		out_specs = (out_spec, pl.BlockSpec((nstate, MB, tb),
			lambda im, it, il: (0, im, it), memory_space=pltpu.VMEM))
		out_shape = (jax.ShapeDtypeStruct((nfun, C, nmp, ntp), jnp.float32),
			jax.ShapeDtypeStruct((nstate, nmp, ntp), jnp.float32))
		args = (Ap, th, seedv, seedl, ab, jnp.asarray(lstop, jnp.int32))
	elif lstop is not None:
		# lstop without state dump: per-tile l cutoffs (dead-tile skip)
		def kern(a_ref, th_ref, sv_ref, sl_ref, ab_ref, ls_ref, out_ref,
				*scratch):
			kern_impl(a_ref, th_ref, sv_ref, sl_ref, ab_ref, out_ref, scratch,
				ls_ref=ls_ref)
		in_specs.append(pl.BlockSpec((nmp//MB, ntp//tb),
			lambda im, it, il: (0, 0), memory_space=pltpu.SMEM))
		out_specs = out_spec
		out_shape = jax.ShapeDtypeStruct((nfun, C, nmp, ntp), jnp.float32)
		args = (Ap, th, seedv, seedl, ab, jnp.asarray(lstop, jnp.int32))
	else:
		def kern(a_ref, th_ref, sv_ref, sl_ref, ab_ref, out_ref, *scratch):
			kern_impl(a_ref, th_ref, sv_ref, sl_ref, ab_ref, out_ref, scratch)
		out_specs = out_spec
		out_shape = jax.ShapeDtypeStruct((nfun, C, nmp, ntp), jnp.float32)
		args = (Ap, th, seedv, seedl, ab)

	out = pl.pallas_call(
		kern,
		grid=grid,
		in_specs=in_specs,
		out_specs=out_specs,
		out_shape=out_shape,
		scratch_shapes=[pltpu.VMEM((MB, tb), jnp.float32)]*nstate,
		compiler_params=pltpu.CompilerParams(
			dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
			vmem_limit_bytes=VMEM_BUDGET),
		interpret=interpret,
	)(*args)
	if dump_state:
		return out[0][:, :, :nm, :nt], out[1]
	return out[:, :, :nm, :nt]


@functools.partial(jax.jit, static_argnames=("lmax", "mmax", "mode", "interpret", "ds"))
def _synthesis_scan_pallas_sym(A, theta_h, lmax, mmax, mode="scalar", interpret=False,
		ds=False, cth=None, ctl=None):
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
	tb = _pick_tb(2*nfun, C, nt=int(np.shape(theta_h)[0]), ds=ds)
	th, seedv, seedl, (nt, nm, nl, ntp, nmp, nlp) = _prep_inputs(theta_h, lmax, mmax, mode, tb=tb, cth=cth, ctl=ctl)
	ab = _recur_ab_tables_ds(nlp, nmp) if ds else _recur_ab_tables(nlp, nmp)
	abrows = 4 if ds else 2
	Ap = jnp.zeros((C, nlp, nmp), jnp.float32).at[:, :nl, :nm].set(
		jnp.moveaxis(A, -1, 0))
	grid = (nmp//MB, ntp//tb, nlp//LB)
	band = np.float32(2.0**S32)
	invband = np.float32(2.0**-S32)
	fac_m1 = np.float32(2.0**-S32)
	nstate, prep_ct, stepf, rescalef = _make_stepper(ds)

	def kern(a_ref, th_ref, sv_ref, sl_ref, ab_ref, out_ref, *scratch):
		il = pl.program_id(2)
		im = pl.program_id(0)
		@pl.when(il == 0)
		def _():
			for r in scratch:
				r[:] = jnp.zeros((MB, tb), jnp.float32)
			out_ref[:] = jnp.zeros_like(out_ref)
		@pl.when((il + 1)*LB > im*MB)
		def _():
			marr = (im*MB + jax.lax.broadcasted_iota(jnp.int32, (MB, 1), 0)).astype(jnp.float32)
			m2 = marr*marr
			# (-1)^m per m row, shared by every l step
			sgn_m = 1.0 - 2.0*jnp.mod(marr, 2.0)
			thv = [th_ref[i, :][None, :] for i in range(6)]
			th_ct = prep_ct(thv[0], thv[5])
			st = tuple(r[:] for r in scratch)
			accs = [[[jnp.zeros((MB, tb), jnp.float32) for _ in range(C)]
				for _ in range(2)] for _ in range(nfun)]
			for k in range(LB):
				l = (il*LB + k).astype(jnp.float32)
				ablo = (ab_ref[2, k, :][:, None], ab_ref[3, k, :][:, None]) \
					if ds else (None, None)
				st, lam, lam1 = stepf(l, marr, m2, th_ct, sv_ref[:], sl_ref[:],
					st, fac_m1, ab_ref[0, k, :][:, None], ab_ref[1, k, :][:, None],
					alo=ablo[0], blo=ablo[1])
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
					st = rescalef(st, band, invband)
			st = rescalef(st, band, invband)
			for r, v in zip(scratch, st): r[:] = v
			out_ref[:] += jnp.stack([jnp.stack([jnp.stack(cc) for cc in hc])
				for hc in accs])

	out = pl.pallas_call(
		kern,
		grid=grid,
		in_specs=[
			pl.BlockSpec((C, LB, MB), lambda im, it, il: (0, il, im),
				memory_space=pltpu.VMEM),
			pl.BlockSpec((6, tb), lambda im, it, il: (0, it), memory_space=pltpu.VMEM),
			pl.BlockSpec((MB, tb), lambda im, it, il: (im, it), memory_space=pltpu.VMEM),
			pl.BlockSpec((MB, tb), lambda im, it, il: (im, it), memory_space=pltpu.VMEM),
			pl.BlockSpec((abrows, LB, MB), lambda im, it, il: (0, il, im),
				memory_space=pltpu.VMEM),
		],
		out_specs=pl.BlockSpec((nfun, 2, C, MB, tb), lambda im, it, il: (0, 0, 0, im, it),
			memory_space=pltpu.VMEM),
		out_shape=jax.ShapeDtypeStruct((nfun, 2, C, nmp, ntp), jnp.float32),
		scratch_shapes=[pltpu.VMEM((MB, tb), jnp.float32)]*nstate,
		compiler_params=pltpu.CompilerParams(
			dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
			vmem_limit_bytes=VMEM_BUDGET),
		interpret=interpret,
	)(Ap, th, seedv, seedl, ab)
	return jnp.moveaxis(out, 1, 2)[:, :, :, :nm, :nt]


def analysis_scan_pallas(F, theta, lmax, mmax, mode="scalar", interpret=False,
		ds=None):
	"""Pallas version of sht_core.analysis_scan (float32). Dispatches to the
	half-sky kernel for south-symmetric ring sets."""
	ds = _use_ds(ds)
	split = _maybe_polar_analysis(F, theta, lmax, mmax, mode, interpret, ds,
		analysis_scan_pallas)
	if split is not None: return split
	nh = _detect_sym(theta)
	if nh is None:
		cp = _ct_parts(theta)
		cth, ctl = cp if cp is not None else (None, None)
		return _anal_full_fast(F, theta, lmax, mmax, mode, interpret, ds,
			cth, ctl)
	return _analysis_sym_entry(F, np.asarray(theta, np.float64), nh, lmax, mmax,
		mode=mode, interpret=interpret, ds=ds)


def _maybe_polar_analysis(F, theta, lmax, mmax, mode, interpret, ds, bulk_fun):
	"""Polar/bulk analysis split: polar-ring contributions (additive) go
	through the DS kernel; returns None when no split applies."""
	if not _want_polar(ds, theta, interpret): return None
	nn, ns = _polar_counts(theta, lmax)
	if not (nn or ns): return None
	th64 = np.asarray(theta, np.float64)
	nt_all = len(th64)
	F = jnp.asarray(F, jnp.float32)
	if nn + ns >= nt_all:
		cp = _ct_parts(th64)
		return _analysis_scan_pallas_full(F, th64, lmax, mmax, mode=mode,
			interpret=interpret, ds=True, cth=cp[0], ctl=cp[1])
	bulk = bulk_fun(F[..., nn:nt_all-ns], th64[nn:nt_all-ns], lmax, mmax,
		mode=mode, interpret=interpret, ds=False)
	# polar contributions: only m < POLAR_MMAX matter (lambda is
	# exponentially negligible beyond), so the DS pass is one m-tile
	Mp = min(mmax + 1, POLAR_MMAX)
	pth = np.concatenate([th64[:nn], th64[nt_all-ns:]])
	Fp = jnp.concatenate([F[..., :nn], F[..., nt_all-ns:]], -1)
	cthp, ctlp = _ct_parts(pth)
	pol = _analysis_scan_pallas_full(Fp[..., :Mp, :], pth, lmax, Mp - 1,
		mode=mode, interpret=interpret, ds=True, cth=cthp, ctl=ctlp)
	if Mp < mmax + 1:
		pol = jnp.pad(pol, [(0, 0), (0, mmax + 1 - Mp), (0, 0)])
	return bulk + pol


def _analysis_sym_entry(F, theta, nh, lmax, mmax, mode="scalar", interpret=False,
		ds=False):
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
		cth, ctl = _ct_parts(theta[:nh][i0:i1])
		part = _analysis_scan_pallas_sym(EO[..., i0:i1], theta[:nh][i0:i1],
			lmax, mmax, mode=mode, interpret=interpret, ds=ds, cth=cth, ctl=ctl)
		out = part if out is None else out + part
	return out


@functools.partial(jax.jit, static_argnames=("lmax", "mmax", "mode", "interpret", "ds"))
def _analysis_scan_pallas_sym(EO, theta_h, lmax, mmax, mode="scalar", interpret=False,
		ds=False, cth=None, ctl=None):
	"""Half-sky analysis kernel. EO[nfun, C, 2, nm, nh] holds E = F_north +
	F_south and O = F_north - F_south on the northern rings; the per-(l,m)
	output picks E or O according to PSIGN[f]*(-1)^(l+m) (the hemisphere
	parity of each mode function). Returns [nl, nm, C]."""
	EO = jnp.asarray(EO, jnp.float32)
	nfun, funcs = _make_funcs(mode)
	psign = PSIGN[mode]
	C = EO.shape[1]
	tb = _pick_tb(2*nfun, C, nt=int(np.shape(theta_h)[0]), ds=ds)
	th, seedv, seedl, (nt, nm, nl, ntp, nmp, nlp) = _prep_inputs(theta_h, lmax, mmax, mode, tb=tb, cth=cth, ctl=ctl)
	ab = _recur_ab_tables_ds(nlp, nmp) if ds else _recur_ab_tables(nlp, nmp)
	abrows = 4 if ds else 2
	EOp = jnp.zeros((nfun, 2, C, nmp, ntp), jnp.float32).at[:, :, :, :nm, :nt].set(
		jnp.moveaxis(EO, 2, 1))
	ntb = ntp//tb
	grid = (nmp//MB, ntb, nlp//LB)
	band = np.float32(2.0**S32)
	invband = np.float32(2.0**-S32)
	fac_m1 = np.float32(2.0**-S32)

	nstate, prep_ct, stepf, rescalef = _make_stepper(ds)

	def kern(f_ref, th_ref, sv_ref, sl_ref, ab_ref, out_ref, *scratch):
		im = pl.program_id(0)
		il = pl.program_id(2)
		@pl.when(il == 0)
		def _():
			for r in scratch:
				r[:] = jnp.zeros((MB, tb), jnp.float32)
		@pl.when((il + 1)*LB <= im*MB)
		def _():
			out_ref[:] = jnp.zeros_like(out_ref)
		@pl.when((il + 1)*LB > im*MB)
		def _():
			marr = (im*MB + jax.lax.broadcasted_iota(jnp.int32, (MB, 1), 0)).astype(jnp.float32)
			m2 = marr*marr
			# m-parity mask per row, shared across l steps
			modd = jnp.mod(marr[:, 0], 2.0) > 0.5  # [MB] bool
			thv = [th_ref[i, :][None, :] for i in range(6)]
			th_ct = prep_ct(thv[0], thv[5])
			st = tuple(r[:] for r in scratch)
			rows = []
			for k in range(LB):
				l = (il*LB + k).astype(jnp.float32)
				ablo = (ab_ref[2, k, :][:, None], ab_ref[3, k, :][:, None]) \
					if ds else (None, None)
				st, lam, lam1 = stepf(l, marr, m2, th_ct, sv_ref[:], sl_ref[:],
					st, fac_m1, ab_ref[0, k, :][:, None], ab_ref[1, k, :][:, None],
					alo=ablo[0], blo=ablo[1])
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
					st = rescalef(st, band, invband)
			st = rescalef(st, band, invband)
			for r, v in zip(scratch, st): r[:] = v
			out_ref[:] = jnp.moveaxis(jnp.stack(rows), 0, 1)[None]  # [1, C, LB, MB]

	out = pl.pallas_call(
		kern,
		grid=grid,
		in_specs=[
			pl.BlockSpec((nfun, 2, C, MB, tb), lambda im, it, il: (0, 0, 0, im, it),
				memory_space=pltpu.VMEM),
			pl.BlockSpec((6, tb), lambda im, it, il: (0, it), memory_space=pltpu.VMEM),
			pl.BlockSpec((MB, tb), lambda im, it, il: (im, it), memory_space=pltpu.VMEM),
			pl.BlockSpec((MB, tb), lambda im, it, il: (im, it), memory_space=pltpu.VMEM),
			pl.BlockSpec((abrows, LB, MB), lambda im, it, il: (0, il, im),
				memory_space=pltpu.VMEM),
		],
		out_specs=pl.BlockSpec((1, C, LB, MB), lambda im, it, il: (it, 0, il, im),
			memory_space=pltpu.VMEM),
		out_shape=jax.ShapeDtypeStruct((ntb, C, nlp, nmp), jnp.float32),
		scratch_shapes=[pltpu.VMEM((MB, tb), jnp.float32)]*nstate,
		compiler_params=pltpu.CompilerParams(
			dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
			vmem_limit_bytes=VMEM_BUDGET),
		interpret=interpret,
	)(EOp, th, seedv, seedl, ab)
	return jnp.moveaxis(jnp.sum(out, axis=0), 0, -1)[:nl, :nm]


@functools.partial(jax.jit, static_argnames=("lmax", "mmax", "mode", "interpret", "ds",
	"wig_s", "wig_branch", "dump_state"))
def _analysis_scan_pallas_full(F, theta, lmax, mmax, mode="scalar", interpret=False,
		ds=False, cth=None, ctl=None, wig_s=None, wig_branch=0,
		lstop=None, dump_state=False):
	"""Pallas version of sht_core.analysis_scan (float32).
	F: [nfun, C, nm, nt] -> out [nl, nm, C]. mode="wigner" (with
	wig_s/wig_branch) runs one branch of the general-spin Wigner-d
	recurrence instead of the Legendre one.

	Each (m-tile, theta-tile) cell runs the full l recurrence in VMEM and
	writes its own partial-alm slab (every output block written exactly
	once -- no revisit semantics needed); the theta-tile axis is then summed
	outside the kernel.
	dump_state (with lstop [nmb, ntb] i32, LB-block units): stop each tile
	at its own lstop block and also return the recurrence state -- the
	stepwise-prefix half of the MXU block split (_analysis_scan_pallas_blocked)."""
	F = jnp.asarray(F, jnp.float32)
	wig = None if wig_s is None else (int(wig_s), int(wig_branch))
	assert (mode == "wigner") == (wig is not None)
	assert not (dump_state and ds)
	nfun, funcs = _make_funcs(mode)
	C = F.shape[1]
	tb = _pick_tb(nfun, C, nt=int(np.shape(theta)[0]), ds=ds)
	th, seedv, seedl, (nt, nm, nl, ntp, nmp, nlp) = _prep_inputs(theta, lmax, mmax, mode, tb=tb, cth=cth, ctl=ctl, wig=wig)
	if wig: ab = (_wigner_ab_tables_ds(nlp, nmp, wig[0], wig[1]) if ds
		else _wigner_ab_tables(nlp, nmp, wig[0], wig[1]))
	else: ab = _recur_ab_tables_ds(nlp, nmp) if ds else _recur_ab_tables(nlp, nmp)
	abrows = (6 if ds else 3) if wig else (4 if ds else 2)
	Fp = jnp.zeros((nfun, C, nmp, ntp), jnp.float32).at[:, :, :nm, :nt].set(F)
	ntb = ntp//tb
	grid = (nmp//MB, ntb, nlp//LB)
	band = np.float32(2.0**S32)
	invband = np.float32(2.0**-S32)
	fac_m1 = np.float32(2.0**-S32)

	nstate, prep_ct, stepf, rescalef = _make_stepper(ds)

	def kern_impl(f_ref, th_ref, sv_ref, sl_ref, ab_ref, out_ref, scratch,
			ls_ref=None, stout_ref=None):
		im = pl.program_id(0)
		itg = pl.program_id(1)
		il = pl.program_id(2)
		@pl.when(il == 0)
		def _():
			for r in scratch:
				r[:] = jnp.zeros((MB, tb), jnp.float32)
		# below-diagonal (and beyond-lstop) blocks produce exactly zero, but
		# each output slab is written only once, so they still write zeros
		active = (il + 1)*LB > im*MB
		if ls_ref is not None:
			active = jnp.logical_and(active, il < ls_ref[im, itg])
		@pl.when(jnp.logical_not(active))
		def _():
			out_ref[:] = jnp.zeros_like(out_ref)
		@pl.when(active)
		def _():
			# coefficients depend only on m: compute them on [MB,1] columns and
			# let broadcasting expand over theta (cuts the sqrt work by tb)
			marr = (im*MB + jax.lax.broadcasted_iota(jnp.int32, (MB, 1), 0)).astype(jnp.float32)
			m2 = marr*marr
			l0col = jnp.maximum(marr, float(wig[0])) if wig else None
			thv = [th_ref[i, :][None, :] for i in range(6)]
			th_ct = prep_ct(thv[0], thv[5])
			st = tuple(r[:] for r in scratch)
			rows = []
			for k in range(LB):
				l = (il*LB + k).astype(jnp.float32)
				ablo = (ab_ref[2, k, :][:, None], ab_ref[3, k, :][:, None]) \
					if ds else (None, None)
				cadd = ab_ref[4 if ds else 2, k, :][:, None] if wig else None
				caddlo = ab_ref[5, k, :][:, None] if (wig and ds) else None
				st, lam, lam1 = stepf(l, marr, m2, th_ct, sv_ref[:], sl_ref[:],
					st, fac_m1, ab_ref[0, k, :][:, None], ab_ref[1, k, :][:, None],
					alo=ablo[0], blo=ablo[1], cadd=cadd, caddlo=caddlo, l0col=l0col)
				us = funcs(l, marr, m2, thv, lam, lam1)
				cols = []
				for ci in range(C):
					tot = us[0]*f_ref[0, ci]
					for f in range(1, nfun):
						tot = tot + us[f]*f_ref[f, ci]
					cols.append(jnp.sum(tot, axis=-1))
				rows.append(jnp.stack(cols))          # [C, MB]
				if k % 8 == 7:
					st = rescalef(st, band, invband)
			st = rescalef(st, band, invband)
			for r, v in zip(scratch, st): r[:] = v
			out_ref[:] = jnp.moveaxis(jnp.stack(rows), 0, 1)[None]  # [1, C, LB, MB]
		if stout_ref is not None:
			# hand the recurrence state to the MXU block kernel exactly at
			# this tile's stop block (runs after the compute above)
			@pl.when(il == ls_ref[im, itg] - 1)
			def _():
				for i, r in enumerate(scratch):
					stout_ref[i] = r[:]

	in_specs = [
		pl.BlockSpec((nfun, C, MB, tb), lambda im, it, il: (0, 0, im, it),
			memory_space=pltpu.VMEM),
		pl.BlockSpec((6, tb), lambda im, it, il: (0, it), memory_space=pltpu.VMEM),
		pl.BlockSpec((MB, tb), lambda im, it, il: (im, it), memory_space=pltpu.VMEM),
		pl.BlockSpec((MB, tb), lambda im, it, il: (im, it), memory_space=pltpu.VMEM),
		pl.BlockSpec((abrows, LB, MB), lambda im, it, il: (0, il, im),
			memory_space=pltpu.VMEM),
	]
	out_spec = pl.BlockSpec((1, C, LB, MB), lambda im, it, il: (it, 0, il, im),
		memory_space=pltpu.VMEM)
	if dump_state:
		def kern(f_ref, th_ref, sv_ref, sl_ref, ab_ref, ls_ref, out_ref,
				stout_ref, *scratch):
			kern_impl(f_ref, th_ref, sv_ref, sl_ref, ab_ref, out_ref, scratch,
				ls_ref=ls_ref, stout_ref=stout_ref)
		in_specs.append(pl.BlockSpec((nmp//MB, ntb),
			lambda im, it, il: (0, 0), memory_space=pltpu.SMEM))
		out_specs = (out_spec, pl.BlockSpec((nstate, MB, tb),
			lambda im, it, il: (0, im, it), memory_space=pltpu.VMEM))
		out_shape = (jax.ShapeDtypeStruct((ntb, C, nlp, nmp), jnp.float32),
			jax.ShapeDtypeStruct((nstate, nmp, ntp), jnp.float32))
		args = (Fp, th, seedv, seedl, ab, jnp.asarray(lstop, jnp.int32))
	elif lstop is not None:
		# lstop without state dump: per-tile l cutoffs (dead-tile skip)
		def kern(f_ref, th_ref, sv_ref, sl_ref, ab_ref, ls_ref, out_ref,
				*scratch):
			kern_impl(f_ref, th_ref, sv_ref, sl_ref, ab_ref, out_ref, scratch,
				ls_ref=ls_ref)
		in_specs.append(pl.BlockSpec((nmp//MB, ntb),
			lambda im, it, il: (0, 0), memory_space=pltpu.SMEM))
		out_specs = out_spec
		out_shape = jax.ShapeDtypeStruct((ntb, C, nlp, nmp), jnp.float32)
		args = (Fp, th, seedv, seedl, ab, jnp.asarray(lstop, jnp.int32))
	else:
		def kern(f_ref, th_ref, sv_ref, sl_ref, ab_ref, out_ref, *scratch):
			kern_impl(f_ref, th_ref, sv_ref, sl_ref, ab_ref, out_ref, scratch)
		out_specs = out_spec
		out_shape = jax.ShapeDtypeStruct((ntb, C, nlp, nmp), jnp.float32)
		args = (Fp, th, seedv, seedl, ab)

	out = pl.pallas_call(
		kern,
		grid=grid,
		in_specs=in_specs,
		out_specs=out_specs,
		out_shape=out_shape,
		scratch_shapes=[pltpu.VMEM((MB, tb), jnp.float32)]*nstate,
		compiler_params=pltpu.CompilerParams(
			dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
			vmem_limit_bytes=VMEM_BUDGET),
		interpret=interpret,
	)(*args)
	if dump_state:
		return jnp.moveaxis(jnp.sum(out[0], axis=0), 0, -1)[:nl, :nm], out[1]
	return jnp.moveaxis(jnp.sum(out, axis=0), 0, -1)[:nl, :nm]


TCHUNK = 2048  # theta rings per analysis chunk (bounds the partial-slab memory)

def analysis_scan_pallas_chunked(F, theta, lmax, mmax, mode="scalar", interpret=False,
		ds=None):
	"""Memory-bounded analysis: the per-theta-tile partial slabs scale as
	ntb * nl * nm, which overflows HBM for big transforms; process theta in
	chunks (each chunk's recurrence is independent) and sum. Symmetric ring
	sets take the half-sky path (which chunks internally over the northern
	rings, preserving the symmetry win at any size)."""
	F = jnp.asarray(F, jnp.float32)
	nt = F.shape[-1]
	ds = _use_ds(ds)
	split = _maybe_polar_analysis(F, theta, lmax, mmax, mode, interpret, ds,
		analysis_scan_pallas_chunked)
	if split is not None: return split
	nh = _detect_sym(theta)
	if nh is not None:
		return _analysis_sym_entry(F, np.asarray(theta, np.float64), nh, lmax,
			mmax, mode=mode, interpret=interpret, ds=ds)
	if nt <= TCHUNK:
		cp = _ct_parts(theta)
		cth, ctl = cp if cp is not None else (None, None)
		return _anal_full_fast(F, theta, lmax, mmax, mode, interpret, ds,
			cth, ctl)
	if not isinstance(theta, jax.core.Tracer): theta = np.asarray(theta, np.float64)
	out = None
	for i0 in range(0, nt, TCHUNK):
		i1 = min(i0 + TCHUNK, nt)
		cp = _ct_parts(theta[i0:i1])
		cth, ctl = cp if cp is not None else (None, None)
		part = _anal_full_fast(F[..., i0:i1], theta[i0:i1], lmax, mmax,
			mode, interpret, ds, cth, ctl)
		out = part if out is None else out + part
	return out


def _wigner_polar_mmax(mmax, s):
	"""m-extent of the Wigner polar DS pass: d^l_{ms} at theta < POLAR_AMP/l
	is exponentially small for |m - s| beyond ~lmax*theta_cut, so POLAR_MMAX
	covers it for the usual small s (kept >= s so the pass has live modes)."""
	return min(mmax + 1, max(POLAR_MMAX, int(s) + 1))

def _wigner_synth_full(A, theta, lmax, mmax, s, interpret=False, ds=False):
	"""Both Wigner-d branches through the full kernel, combined into the
	(w, x) mode functions w = (lam_p + (-1)^s lam_m)/2,
	x = (lam_p - (-1)^s lam_m)/2. A [nl, nm, C] -> G [2(fun), C, nm, nt]."""
	cp = _ct_parts(theta)
	cth, ctl = cp if cp is not None else (None, None)
	lstop = _dead_lstop(theta, lmax, mmax, 1, A.shape[-1], ds, s=int(s))
	Gp = _synthesis_scan_pallas_full(A, theta, lmax, mmax, mode="wigner",
		interpret=interpret, ds=ds, cth=cth, ctl=ctl, wig_s=int(s),
		wig_branch=0, lstop=lstop)[0]
	Gm = _synthesis_scan_pallas_full(A, theta, lmax, mmax, mode="wigner",
		interpret=interpret, ds=ds, cth=cth, ctl=ctl, wig_s=int(s),
		wig_branch=1, lstop=lstop)[0]
	sgs = np.float32((-1.0)**int(s))
	return jnp.stack([0.5*(Gp + sgs*Gm), 0.5*(Gp - sgs*Gm)])


def wigner_synthesis_scan_pallas(A, theta, lmax, mmax, s, interpret=False,
		ds=None):
	"""Pallas fast path for sht_core.wigner_synthesis_scan (general spin,
	float32): two passes of the full kernel -- one per d-function branch
	(+s, -s). A [nl, nm, C] -> G [2(fun), C, nm, nt]. Near-pole rings are
	overwritten by a double-single pass (module ACCURACY="high"), matching
	the Legendre kernels' polar handling."""
	A = jnp.asarray(A, jnp.float32)
	ds = _use_ds(ds)
	if _want_polar(ds, theta, interpret):
		nn, ns = _polar_counts(theta, lmax)
		nt_all = int(np.shape(theta)[0])
		if nn + ns >= nt_all:
			return _wigner_synth_full(A, theta, lmax, mmax, s,
				interpret=interpret, ds=True)
		if nn or ns:
			th64 = np.asarray(theta, np.float64)
			G = _wigner_synth_full(A, theta, lmax, mmax, s, interpret=interpret)
			Mp = _wigner_polar_mmax(mmax, s)
			pth = np.concatenate([th64[:nn], th64[nt_all-ns:]])
			pol = _wigner_synth_full(A[:, :Mp], pth, lmax, Mp - 1, s,
				interpret=interpret, ds=True)
			if nn:
				G = G.at[..., :Mp, :nn].set(pol[..., :nn])
			if ns:
				G = G.at[..., :Mp, nt_all-ns:].set(pol[..., nn:])
			return G
	return _wigner_synth_full(A, theta, lmax, mmax, s, interpret=interpret, ds=ds)


def _wigner_anal_full(F, theta, lmax, mmax, s, interpret=False, ds=False):
	"""Both Wigner-d branches through the full analysis kernel. The (w, x)
	data is recombined per branch (w F0 + x F1 = lam_p Fp + lam_m Fm with
	Fp = (F0+F1)/2, Fm = (-1)^s (F0-F1)/2), theta-chunked like
	analysis_scan_pallas_chunked. F [2(fun), C, nm, nt] -> out [nl, nm, C]."""
	sgs = np.float32((-1.0)**int(s))
	Fb = jnp.stack([0.5*(F[0] + F[1]), 0.5*sgs*(F[0] - F[1])])
	nt = F.shape[-1]
	if not isinstance(theta, jax.core.Tracer): theta = np.asarray(theta, np.float64)
	out = None
	for i0 in range(0, nt, TCHUNK):
		i1 = min(i0 + TCHUNK, nt)
		cp = _ct_parts(theta[i0:i1])
		cth, ctl = cp if cp is not None else (None, None)
		lstop = _dead_lstop(theta[i0:i1], lmax, mmax, 1, F.shape[1], ds,
			s=int(s)) if not isinstance(theta, jax.core.Tracer) else None
		part = None
		for br in (0, 1):
			p = _analysis_scan_pallas_full(Fb[br][None, ..., i0:i1], theta[i0:i1],
				lmax, mmax, mode="wigner", interpret=interpret, ds=ds, cth=cth,
				ctl=ctl, wig_s=int(s), wig_branch=br, lstop=lstop)
			part = p if part is None else part + p
		out = part if out is None else out + part
	return out


def wigner_analysis_scan_pallas(F, theta, lmax, mmax, s, interpret=False,
		ds=None):
	"""Pallas fast path for sht_core.wigner_analysis_scan (general spin,
	float32). F [2(fun), C, nm, nt] -> out [nl, nm, C]. Near-pole ring
	contributions go through a double-single pass (module ACCURACY="high"),
	matching the Legendre kernels' polar handling."""
	F = jnp.asarray(F, jnp.float32)
	ds = _use_ds(ds)
	if _want_polar(ds, theta, interpret):
		nn, ns = _polar_counts(theta, lmax)
		nt_all = int(np.shape(theta)[0])
		if nn + ns >= nt_all:
			return _wigner_anal_full(F, theta, lmax, mmax, s,
				interpret=interpret, ds=True)
		if nn or ns:
			th64 = np.asarray(theta, np.float64)
			bulk = _wigner_anal_full(F[..., nn:nt_all-ns], th64[nn:nt_all-ns],
				lmax, mmax, s, interpret=interpret)
			Mp = _wigner_polar_mmax(mmax, s)
			pth = np.concatenate([th64[:nn], th64[nt_all-ns:]])
			Fp = jnp.concatenate([F[..., :nn], F[..., nt_all-ns:]], -1)
			pol = _wigner_anal_full(Fp[..., :Mp, :], pth, lmax, Mp - 1, s,
				interpret=interpret, ds=True)
			if Mp < mmax + 1:
				pol = jnp.pad(pol, [(0, 0), (0, mmax + 1 - Mp), (0, 0)])
			return bulk + pol
	return _wigner_anal_full(F, theta, lmax, mmax, s, interpret=interpret, ds=ds)


# The former Pallas row-DMA triangular packer (pack_tri_rows) was removed:
# Mosaic cannot DMA to unaligned dynamic lane offsets (the per-run start
# offsets are arbitrary), which made it fail to compile on real TPUs.
# Its replacement is the pure-XLA pairwise fold in sht._pack_tri_fold.
