"""Pallas SHT kernel vs the reference jnp scan (interpret mode on CPU).

The Pallas kernels and the jnp scan use different f32 summation orders (the
hemisphere-symmetric kernels in particular accumulate north/south pairs
separately), so each is compared against the float64 scan rather than
bitwise against the f32 scan."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from pixell_tpu.ops import sht_core, sht_pallas
from pixell_tpu import sht

LMAX = 24


def _check(mode, C, theta, tol_syn=None, tol_ana=None):
	# spin-2 has inherent f32 pole noise (inv_st2 cancellations); measured
	# worst-case errors vs the f64 scan are ~3e-5 (spin2) / ~4e-6 (others)
	# after the ab-table + two-part-cos fixes, tolerances 3x above that
	if tol_syn is None: tol_syn = 1e-4 if mode == "spin2" else 1.2e-5
	if tol_ana is None: tol_ana = 1e-4 if mode == "spin2" else 1.2e-5
	lmax = mmax = LMAX
	nfun = sht_core.NFUN[mode]
	nt = len(theta)
	rng = np.random.default_rng(0)
	A = rng.standard_normal((lmax+1, mmax+1, C)).astype(np.float32)
	G64 = np.asarray(sht_core.synthesis_scan(jnp.asarray(A, jnp.float64),
		jnp.asarray(theta, jnp.float64), lmax, mmax, mode=mode, dtype=np.float64))
	G2 = np.asarray(sht_pallas.synthesis_scan_pallas(jnp.asarray(A),
		jnp.asarray(theta), lmax, mmax, mode=mode, interpret=True))
	scale = max(np.abs(G64).max(), 1)
	assert np.abs(G64 - G2).max() < tol_syn*scale, (mode, nt)
	F = rng.standard_normal((nfun, C, mmax+1, nt)).astype(np.float32)
	a64 = np.asarray(sht_core.analysis_scan(jnp.asarray(F, jnp.float64),
		jnp.asarray(theta, jnp.float64), lmax, mmax, mode=mode, dtype=np.float64))
	a2 = np.asarray(sht_pallas.analysis_scan_pallas(jnp.asarray(F),
		jnp.asarray(theta), lmax, mmax, mode=mode, interpret=True))
	scale = max(np.abs(a64).max(), 1)
	assert np.abs(a64 - a2).max() < tol_ana*scale, (mode, nt)


@pytest.mark.slow
@pytest.mark.parametrize("mode,C", [("scalar", 2), ("deriv", 2), ("spin2", 4)])
def test_pallas_matches_scan(mode, C):
	theta = sht.ring_theta("F1", 2*LMAX+2)
	assert sht_pallas._detect_sym(theta) is not None
	_check(mode, C, theta)


@pytest.mark.parametrize("mode,C", [("scalar", 1), ("deriv", 1),
	("spin1", 2), ("spin2", 3)])
@pytest.mark.slow
def test_pallas_sym_paths(mode, C):
	"""Half-sky kernels on even and odd symmetric ring counts, plus the full
	kernels on an asymmetric grid."""
	for nt in [2*LMAX+2, 2*LMAX+3]:
		theta = (np.arange(nt)+0.5)*np.pi/nt
		assert sht_pallas._detect_sym(theta) == (nt+1)//2
		_check(mode, C, theta)
	rng = np.random.default_rng(2)
	theta = np.sort(rng.uniform(0.1, np.pi*0.8, 2*LMAX+2))
	assert sht_pallas._detect_sym(theta) is None
	_check(mode, C, theta)


@pytest.mark.slow
def test_polar_ds_kernels():
	"""The double-single polar kernels against the f64 scan on a tiny
	near-pole ring set, where the plain f32 recurrence loses accuracy
	(amplification ~ min(l, 1/theta)^2)."""
	lmax = 24
	theta = np.concatenate([np.linspace(2e-3, 0.05, 6),
		np.pi - np.linspace(0.05, 2e-3, 6)])
	rng = np.random.default_rng(0)
	A = rng.standard_normal((lmax+1, lmax+1, 1)).astype(np.float32)
	G64 = np.asarray(sht_core.synthesis_scan(jnp.asarray(A, jnp.float64),
		jnp.asarray(theta), lmax, lmax, mode="scalar", dtype=np.float64))
	cp = sht_pallas._ct_parts(theta)
	G = np.asarray(sht_pallas._synthesis_scan_pallas_full(jnp.asarray(A),
		theta, lmax, lmax, mode="scalar", interpret=True, ds=True,
		cth=cp[0], ctl=cp[1]))
	assert np.abs(G - G64).max() < 2e-6*np.abs(G64).max()
	F = rng.standard_normal((1, 1, lmax+1, len(theta))).astype(np.float32)
	a64 = np.asarray(sht_core.analysis_scan(jnp.asarray(F, jnp.float64),
		jnp.asarray(theta), lmax, lmax, mode="scalar", dtype=np.float64))
	a = np.asarray(sht_pallas._analysis_scan_pallas_full(jnp.asarray(F),
		theta, lmax, lmax, mode="scalar", interpret=True, ds=True,
		cth=cp[0], ctl=cp[1]))
	assert np.abs(a - a64).max() < 2e-6*np.abs(a64).max()


@pytest.mark.slow
def test_wigner_seed_levels():
	"""The wigner seed tables must canonicalize scaled levels to <= 0
	wherever the value is representable: the recurrence emits only at
	level 0/-1, so an O(1) seed left at (tiny val, level=+1) -- which the
	raw three-factor product produces near the seed peak once log2 N_m > S,
	i.e. m > ~61 in f32 -- would be silently dropped (caught on-chip as a
	0.22 rel roundtrip error at lmax 200)."""
	s = 3
	mmax = 300
	theta = (np.arange(128)+0.5)*np.pi/128
	v32, l32 = sht_core._wigner_seeds(jnp.asarray(theta), mmax, s, np.float32)
	v64, l64 = sht_core._wigner_seeds(jnp.asarray(theta), mmax, s, np.float64)
	v32, l32, v64, l64 = map(np.asarray, (v32, l32, v64, l64))
	S32 = sht_core._scale_log2(np.float32)
	S64 = sht_core._scale_log2(np.float64)
	t32 = np.log2(np.abs(v32) + 1e-300) + l32*S32
	t64 = np.log2(np.abs(v64) + 1e-300) + l64*S64
	mask = t64 > -40           # values that matter in f32
	assert not (l32[mask] > 0).any(), "representable seed left at level>0"
	assert np.abs(t32 - t64)[mask].max() < 1e-4
	assert (np.sign(v32) == np.sign(v64))[mask].all()


def test_wigner_ab_tables_ds():
	"""The double-single Wigner coefficient tables (a = 1/v(l), b = v(l-1),
	c = sgn*m*s/((l-1)l)) carry ~2^-45 precision: hi+lo vs the f64 formula.
	(The DS wigner KERNELS are gated on-chip by scripts/check_wigner_tpu.py:
	interpret-mode execution of the DS stepper blows up the interpreter's
	compile on a 1-core host, so they are not exercised here.)"""
	nlp, nmp, s = 64, 40, 3
	for branch in (0, 1):
		T = np.asarray(sht_pallas._wigner_ab_tables_ds(nlp, nmp, s, branch),
			np.float64)
		a_ds = T[0] + T[2]
		b_ds = T[1] + T[3]
		c_ds = T[4] + T[5]
		l = np.arange(nlp, dtype=np.float64)[:, None]
		m = np.arange(nmp, dtype=np.float64)[None, :]
		sgn = 1.0 if branch == 0 else -1.0
		live = l > np.maximum(m, s)
		with np.errstate(divide="ignore", invalid="ignore"):
			v2 = lambda lv: (lv*lv - m*m)*(lv*lv - s*s)/(lv*lv*(4*lv*lv - 1))
			a64 = np.where(live, 1/np.sqrt(v2(l)), 0.0)
			okb = live & ((l-1)*(l-1) > m*m) & (l-1 > s)
			b64 = np.where(okb, np.sqrt(np.where(okb, v2(l-1), 1.0)), 0.0)
			c64 = np.where(live, sgn*m*s/((l-1)*l), 0.0)
		for ds, ref, name in ((a_ds, a64, "a"), (b_ds, b64, "b"),
				(c_ds, c64, "c")):
			scale = np.maximum(np.abs(ref), 1.0)
			assert (np.abs(ds - ref)/scale).max() < 1e-11, (branch, name)


@pytest.mark.slow
def test_wigner_polar_split(monkeypatch):
	"""The polar-split plumbing in the public wigner entry points: stitch
	indices, m-truncation and zero-padding. The kernel passes are replaced
	by cheap jnp-scan fakes (f32 for the fast pass, f64 for the DS pass) so
	the test checks the SPLIT logic, not the kernels; POLAR_AMP/POLAR_MMAX
	are shrunk so the m-truncated pad branch runs at an affordable size.
	The m-extent argument needs lmax*theta_cut + s + O(l^1/3) < POLAR_MMAX:
	64*(10/64) + 3 + 4 = 17 < 32 here."""
	calls = []
	def fake_synth(A, theta, lmax, mmax, s, interpret=False, ds=False):
		calls.append(("synth", bool(ds), int(np.shape(theta)[0]), mmax))
		dt = np.float64 if ds else np.float32
		G = sht_core.wigner_synthesis_scan(jnp.asarray(A, dt),
			jnp.asarray(theta, jnp.float64), lmax, mmax, s, dtype=dt)
		return jnp.asarray(G, jnp.float32)
	def fake_anal(F, theta, lmax, mmax, s, interpret=False, ds=False):
		calls.append(("anal", bool(ds), int(np.shape(theta)[0]), mmax))
		dt = np.float64 if ds else np.float32
		a = sht_core.wigner_analysis_scan(jnp.asarray(F, dt),
			jnp.asarray(theta, jnp.float64), lmax, mmax, s, dtype=dt)
		return jnp.asarray(a, jnp.float32)
	monkeypatch.setattr(sht_pallas, "_want_polar",
		lambda ds, theta, interpret=False: not ds)
	monkeypatch.setattr(sht_pallas, "POLAR_AMP", 10.0)
	monkeypatch.setattr(sht_pallas, "POLAR_MMAX", 32)
	monkeypatch.setattr(sht_pallas, "_wigner_synth_full", fake_synth)
	monkeypatch.setattr(sht_pallas, "_wigner_anal_full", fake_anal)
	s = 3
	lmax = mmax = 64
	nt = 2*lmax + 2
	theta = (np.arange(nt)+0.5)*np.pi/nt
	nn, ns = sht_pallas._polar_counts(theta, lmax)
	assert nn > 0 and ns > 0
	Mp = sht_pallas._wigner_polar_mmax(mmax, s)
	assert Mp == 32
	rng = np.random.default_rng(0)
	C = 2
	A = rng.standard_normal((lmax+1, mmax+1, C)).astype(np.float32)
	G64 = np.asarray(sht_core.wigner_synthesis_scan(jnp.asarray(A, jnp.float64),
		jnp.asarray(theta, jnp.float64), lmax, mmax, s, dtype=np.float64))
	G = np.asarray(sht_pallas.wigner_synthesis_scan_pallas(jnp.asarray(A),
		jnp.asarray(theta), lmax, mmax, s))
	scale = max(np.abs(G64).max(), 1)
	assert np.abs(G - G64).max() < 2e-5*scale
	assert calls == [("synth", False, nt, mmax), ("synth", True, nn+ns, Mp-1)]
	calls.clear()
	F = rng.standard_normal((2, C, mmax+1, nt)).astype(np.float32)
	a64 = np.asarray(sht_core.wigner_analysis_scan(jnp.asarray(F, jnp.float64),
		jnp.asarray(theta, jnp.float64), lmax, mmax, s, dtype=np.float64))
	a = np.asarray(sht_pallas.wigner_analysis_scan_pallas(jnp.asarray(F),
		jnp.asarray(theta), lmax, mmax, s))
	scale = max(np.abs(a64).max(), 1)
	assert np.abs(a - a64).max() < 2e-5*scale
	assert calls == [("anal", False, nt-nn-ns, mmax), ("anal", True, nn+ns, Mp-1)]


@pytest.mark.slow
@pytest.mark.parametrize("s", [2, 3, 4])
def test_wigner_pallas_matches_scan(s):
	"""General-spin Pallas kernels (two-branch Wigner-d recurrence) vs the
	f64 jnp wigner scan. s=2 doubles as a cross-check against a completely
	different evaluation route (the spin2 mode derives w/x from the scalar
	Legendre recurrence; the wigner engine recurses the d-functions
	directly). s=3 runs at lmax 200: the seed-level canonicalization bug
	was invisible below m ~ 61."""
	lmax = mmax = 200 if s == 3 else LMAX
	# plain f32 recurrence (no polar-DS): near-pole amplification ~l*eps
	tol = 2e-4 if s == 3 else 2e-5
	C = 4
	theta = (np.arange(2*lmax+2)+0.5)*np.pi/(2*lmax+2)
	nt = len(theta)
	rng = np.random.default_rng(s)
	A = rng.standard_normal((lmax+1, mmax+1, C)).astype(np.float32)
	G64 = np.asarray(sht_core.wigner_synthesis_scan(jnp.asarray(A, jnp.float64),
		jnp.asarray(theta, jnp.float64), lmax, mmax, s, dtype=np.float64))
	G2 = np.asarray(sht_pallas.wigner_synthesis_scan_pallas(jnp.asarray(A),
		jnp.asarray(theta), lmax, mmax, s, interpret=True))
	scale = max(np.abs(G64).max(), 1)
	assert np.abs(G64 - G2).max() < tol*scale, s
	F = rng.standard_normal((2, C, mmax+1, nt)).astype(np.float32)
	a64 = np.asarray(sht_core.wigner_analysis_scan(jnp.asarray(F, jnp.float64),
		jnp.asarray(theta, jnp.float64), lmax, mmax, s, dtype=np.float64))
	a2 = np.asarray(sht_pallas.wigner_analysis_scan_pallas(jnp.asarray(F),
		jnp.asarray(theta), lmax, mmax, s, interpret=True))
	scale = max(np.abs(a64).max(), 1)
	assert np.abs(a64 - a2).max() < tol*scale, s


@pytest.mark.slow
@pytest.mark.parametrize("mode,C,tol", [("scalar", 2, 3e-5), ("spin2", 4, 2e-4),
	("deriv", 2, 5e-5), ("spin1", 2, 5e-5)])
def test_blocked_legendre_split(monkeypatch, mode, C, tol):
	"""MXU block-Legendre split (stepwise prefix + Chebyshev block suffix)
	must match the pure stepwise kernels on the eligible tiles to ~J*eps
	and leave ineligible tiles bit-identical. Narrow theta tiles (TB=256)
	are forced so a CPU-sized lmax has eligible (fully oscillatory)
	blocks; production engages at lmax >= BLK_MINL with tb=1024. The spin-2
	tolerance is looser: the inv_st2 cancellations amplify both paths'
	rounding (same reason test_pallas_matches_scan uses 1e-4 there)."""
	monkeypatch.setattr(sht_pallas, "TB", 256)
	monkeypatch.setattr(sht_pallas, "BLK_MINL", 256)
	monkeypatch.setattr(sht_pallas, "BLK_ENABLE", True)
	sht_pallas._BLK_TABLE_CACHE.clear()
	lmax = 448
	nfun = sht_core.NFUN[mode]
	theta = np.asarray(sht.ring_theta("F1", 2*lmax + 2), np.float64)[:-3]
	nt = len(theta)
	assert sht_pallas._detect_sym(theta) is None
	tb = sht_pallas._pick_tb(nfun, C, nt=nt)
	start = sht_pallas._blk_start_table(theta, lmax, lmax, tb)
	nlb = -(-(lmax + 1)//sht_pallas.BLK_LB)
	assert np.any(start < nlb), "test geometry has no eligible tiles"
	rng = np.random.default_rng(0)
	A = np.zeros((lmax+1, lmax+1, C), np.float32)
	mask = np.tril(np.ones((lmax+1, lmax+1), bool))
	A[mask] = rng.standard_normal((int(mask.sum()), C)).astype(np.float32)
	F = rng.standard_normal((nfun, C, lmax+1, nt)).astype(np.float32)
	G_blk = np.asarray(sht_pallas.synthesis_scan_pallas(A, theta, lmax, lmax,
		mode=mode, interpret=True))
	O_blk = np.asarray(sht_pallas.analysis_scan_pallas_chunked(F, theta,
		lmax, lmax, mode=mode, interpret=True))
	monkeypatch.setattr(sht_pallas, "BLK_ENABLE", False)
	G_stp = np.asarray(sht_pallas.synthesis_scan_pallas(A, theta, lmax, lmax,
		mode=mode, interpret=True))
	O_stp = np.asarray(sht_pallas.analysis_scan_pallas_chunked(F, theta,
		lmax, lmax, mode=mode, interpret=True))
	es = np.abs(G_blk - G_stp).max()/np.abs(G_stp).max()
	ea = np.abs(O_blk - O_stp).max()/np.abs(O_stp).max()
	# nonzero = the blocked path actually ran; small = it ran correctly
	assert 0 < es < tol, es
	assert 0 < ea < tol, ea


@pytest.mark.slow
@pytest.mark.parametrize("mode,C,tol", [("scalar", 2, 1e-9), ("spin2", 4, 1e-7)])
def test_dead_tile_skip(monkeypatch, mode, C, tol):
	"""The beyond-horizon (m-tile, theta-tile) skip must leave the kernel
	outputs unchanged to ~1e-10 (scalar) / ~1e-7 (spin2, whose inv_st2 ring
	factors amplify the sub-horizon tail by up to ~(lmax/m_lo)^2 on the
	skippable polar tiles -- the worst case for the s=0 bound _dead_lstop
	uses for every mode): the skipped tiles' true contributions are below
	the _dead_table slack bound. Narrow theta tiles are forced so a
	CPU-sized lmax has dead tiles (production: ~14% of lmax-5000 work)."""
	monkeypatch.setattr(sht_pallas, "TB", 256)
	lmax = 600
	nfun = sht_core.NFUN[mode]
	theta = np.asarray(sht.ring_theta("F1", 2*lmax + 2), np.float64)[:-3]
	nt = len(theta)
	tb = sht_pallas._pick_tb(nfun, C, nt=nt)
	dead = sht_pallas._dead_table(theta, lmax, lmax, tb)
	assert dead.any(), "test geometry has no dead tiles"
	rng = np.random.default_rng(0)
	A = np.zeros((lmax+1, lmax+1, C), np.float32)
	mask = np.tril(np.ones((lmax+1, lmax+1), bool))
	A[mask] = rng.standard_normal((int(mask.sum()), C)).astype(np.float32)
	F = rng.standard_normal((nfun, C, lmax+1, nt)).astype(np.float32)
	G_skip = np.asarray(sht_pallas.synthesis_scan_pallas(A, theta, lmax, lmax,
		mode=mode, interpret=True))
	O_skip = np.asarray(sht_pallas.analysis_scan_pallas_chunked(F, theta,
		lmax, lmax, mode=mode, interpret=True))
	monkeypatch.setattr(sht_pallas, "_dead_lstop",
		lambda *a, **k: None)
	G_full = np.asarray(sht_pallas.synthesis_scan_pallas(A, theta, lmax, lmax,
		mode=mode, interpret=True))
	O_full = np.asarray(sht_pallas.analysis_scan_pallas_chunked(F, theta,
		lmax, lmax, mode=mode, interpret=True))
	es = np.abs(G_skip - G_full).max()/np.abs(G_full).max()
	ea = np.abs(O_skip - O_full).max()/np.abs(O_full).max()
	assert es < tol, es
	assert ea < tol, ea


def test_blocked_tracer_fallback(monkeypatch):
	"""The MXU blocked path must (a) silently fall back to stepwise when
	theta is a tracer (Chebyshev tables are host-built) WITHOUT crashing --
	round 4's spin-2 TracerArrayConversionError in _prep_th shipped in a
	snapshot -- and (b) actually engage when theta is concrete, asserted via
	a counter on _blk_start_table so a future regression is a test failure,
	not a silent perf loss."""
	monkeypatch.setattr(sht_pallas, "TB", 256)
	monkeypatch.setattr(sht_pallas, "BLK_MINL", 256)
	monkeypatch.setattr(sht_pallas, "BLK_ENABLE", True)
	sht_pallas._BLK_TABLE_CACHE.clear()
	calls = []
	orig = sht_pallas._blk_start_table
	def counted(*a, **k):
		calls.append(1)
		return orig(*a, **k)
	monkeypatch.setattr(sht_pallas, "_blk_start_table", counted)
	lmax = 448
	theta = np.asarray(sht.ring_theta("F1", 2*lmax + 2), np.float64)[:-3]
	rng = np.random.default_rng(0)
	A = np.zeros((lmax+1, lmax+1, 2), np.float32)
	mask = np.tril(np.ones((lmax+1, lmax+1), bool))
	A[mask] = rng.standard_normal((int(mask.sum()), 2)).astype(np.float32)
	G_blk = np.asarray(sht_pallas.synthesis_scan_pallas(A, theta, lmax, lmax,
		mode="scalar", interpret=True))
	assert calls, "blocked path did not engage for concrete theta"
	calls.clear()
	f = jax.jit(lambda a, th: sht_pallas.synthesis_scan_pallas(
		a, th, lmax, lmax, mode="scalar", interpret=True))
	G_stp = np.asarray(f(A, jnp.asarray(theta, jnp.float32)))
	assert not calls, "blocked path must not run with traced theta"
	scale = np.abs(G_blk).max()
	# f32 theta + stepwise-vs-blocked differences only
	assert np.abs(G_blk - G_stp).max() < 1e-3*scale
