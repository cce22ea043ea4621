"""Curved-sky SHT tests vs the Goldberg oracle and via roundtrips
(modeled on reference tests: adjointness/roundtrip matrices, test_pixell.py:1051)."""
import numpy as np
import jax.numpy as jnp
import pytest
from pixell_tpu import enmap, curvedsky, utils
import oracle


def fullsky(res_deg=6.0, variant="fejer1"):
	return enmap.fullsky_geometry(res=res_deg*utils.degree, variant=variant)

LMAX = 16


def test_alm2map_fullsky_vs_oracle():
	for variant in ["fejer1", "cc"]:
		shape, wcs = fullsky(6.0, variant)
		alm = oracle.rand_alm_oracle(LMAX, seed=1)
		m = enmap.zeros(shape, wcs)
		m = curvedsky.alm2map(jnp.asarray(alm), m, spin=[0])
		pos = np.asarray(enmap.posmap(shape, wcs))
		want = oracle.synth_direct(alm, LMAX, (np.pi/2 - pos[0]).ravel(),
			pos[1].ravel()).reshape(shape)
		assert np.abs(np.asarray(m) - want).max() < 1e-10, variant

def test_map2alm_roundtrip_fullsky():
	for variant in ["fejer1", "cc"]:
		shape, wcs = fullsky(6.0, variant)
		alm = oracle.rand_alm_oracle(LMAX, seed=2)
		m = curvedsky.alm2map(jnp.asarray(alm), enmap.zeros(shape, wcs), spin=[0])
		alm2 = curvedsky.map2alm(m, lmax=LMAX, spin=[0])
		assert np.abs(np.asarray(alm2) - alm).max() < 1e-10, variant

def test_pol_roundtrip():
	shape, wcs = fullsky(6.0, "fejer1")
	alm = oracle.rand_alm_oracle(LMAX, seed=3, ncomp=3)
	for l in range(2):
		for mm in range(l+1):
			alm[1:, oracle.lm2ind(LMAX, l, mm)] = 0
	m = curvedsky.alm2map(jnp.asarray(alm), enmap.zeros((3,)+shape, wcs), spin=[0, 2])
	alm2 = curvedsky.map2alm(m, lmax=LMAX, spin=[0, 2])
	assert np.abs(np.asarray(alm2) - alm).max() < 1e-10

def test_cutsky_roundtrip():
	# band geometry: partial sky that is ring-compatible -> "2d" with ypad
	shape, wcs = enmap.band_geometry(30*utils.degree, res=6*utils.degree)
	minfo = curvedsky.analyse_geometry(shape, wcs)
	assert minfo.case == "2d"
	alm = oracle.rand_alm_oracle(LMAX, seed=4)
	m = curvedsky.alm2map(jnp.asarray(alm), enmap.zeros(shape, wcs), spin=[0])
	# pixel values must match the full-sky synthesis over the same band
	pos = np.asarray(enmap.posmap(shape, wcs))
	want = oracle.synth_direct(alm, LMAX, (np.pi/2 - pos[0]).ravel(),
		pos[1].ravel()).reshape(shape)
	assert np.abs(np.asarray(m) - want).max() < 1e-10

def test_deriv_synthesis():
	shape, wcs = fullsky(6.0, "fejer1")
	alm = oracle.rand_alm_oracle(LMAX, seed=5)
	d = curvedsky.alm2map(jnp.asarray(alm), enmap.zeros((2,)+shape, wcs), deriv=True)
	pos = np.asarray(enmap.posmap(shape, wcs))
	want = oracle.synth_deriv_direct(alm, LMAX, (np.pi/2 - pos[0]).ravel(),
		pos[1].ravel()).reshape((2,)+shape)
	# oracle gives (dtheta, dphi); we return (ddec, dra) = (-dtheta, dphi)
	assert np.abs(np.asarray(d)[0] + want[0]).max() < 1e-5
	assert np.abs(np.asarray(d)[1] - want[1]).max() < 1e-5

def test_alm2cl():
	alm = oracle.rand_alm_oracle(LMAX, seed=6)
	cl = np.asarray(curvedsky.alm2cl(jnp.asarray(alm)))
	# direct
	want = np.zeros(LMAX+1)
	for l in range(LMAX+1):
		tot = abs(alm[oracle.lm2ind(LMAX, l, 0)])**2
		for m in range(1, l+1):
			tot += 2*abs(alm[oracle.lm2ind(LMAX, l, m)])**2
		want[l] = tot/(2*l+1)
	assert np.allclose(cl, want)

def test_lmul_almxfl():
	alm = oracle.rand_alm_oracle(LMAX, seed=7)
	fl = np.arange(LMAX+1)*0.1
	out = np.asarray(curvedsky.almxfl(jnp.asarray(alm), fl))
	for (l, m) in [(0, 0), (5, 3), (LMAX, LMAX)]:
		i = oracle.lm2ind(LMAX, l, m)
		assert np.allclose(out[i], alm[i]*fl[l])

def test_rand_alm_spectrum():
	lmax = 40
	cl = 1.0/np.arange(1, lmax+2)**2
	alm = curvedsky.rand_alm(cl, lmax=lmax, seed=8)
	clout = np.asarray(curvedsky.alm2cl(jnp.asarray(alm)))
	# chi2-like check: ratio should be O(1)
	ratio = clout[5:]/cl[5:]
	assert 0.5 < np.mean(ratio) < 1.5

def test_general_method_thumbnail():
	# TAN projection -> general path (torus NUFFT)
	shape, wcs = enmap.thumbnail_geometry(r=20*utils.degree, res=2*utils.degree)
	minfo = curvedsky.analyse_geometry(shape, wcs)
	assert minfo.case == "general"
	alm = oracle.rand_alm_oracle(LMAX, seed=9)
	m = curvedsky.alm2map(jnp.asarray(alm), enmap.zeros(shape, wcs), spin=[0])
	pos = np.asarray(enmap.posmap(shape, wcs))
	want = oracle.synth_direct(alm, LMAX, (np.pi/2 - pos[0]).ravel(),
		pos[1].ravel() % (2*np.pi)).reshape(shape)
	assert np.abs(np.asarray(m) - want).max() < 1e-7

def test_alm2map_pos():
	alm = oracle.rand_alm_oracle(LMAX, seed=10)
	dec = np.array([0.1, -0.5, 1.0])
	ra = np.array([0.3, 2.0, 4.0])
	got = curvedsky.alm2map_pos(jnp.asarray(alm), pos=np.array([dec, ra]))
	want = oracle.synth_direct(alm, LMAX, np.pi/2-dec, ra)
	assert np.abs(np.asarray(got) - want).max() < 1e-8

def test_cyl_method_cea():
	# CEA: separable but rings not CC/F1 -> "cyl" with approximate weights;
	# niter should reduce the error
	from pixell_tpu import wcsutils
	shape = (60, 120)
	wcs = wcsutils.cea([0.0, 0.0], res=[3.0, 3.0], shape=shape)
	minfo = curvedsky.analyse_geometry(shape, wcs)
	assert minfo.case == "cyl"
	alm = oracle.rand_alm_oracle(LMAX, seed=11)
	m = curvedsky.alm2map(jnp.asarray(alm), enmap.zeros(shape, wcs), spin=[0])
	pos = np.asarray(enmap.posmap(shape, wcs))
	want = oracle.synth_direct(alm, LMAX, (np.pi/2-pos[0]).ravel(),
		pos[1].ravel()).reshape(shape)
	assert np.abs(np.asarray(m)-want).max() < 1e-9
	a0 = np.asarray(curvedsky.map2alm(m, lmax=LMAX, spin=[0], niter=0))
	a5 = np.asarray(curvedsky.map2alm(m, lmax=LMAX, spin=[0], niter=5))
	e0 = np.abs(a0-alm).std()
	e5 = np.abs(a5-alm).std()
	# jacobi refinement must converge (CEA polar rings are very widely
	# spaced, so convergence is slower than on CAR grids)
	assert e5 < e0*0.1

def _transfer_alm_oracle(ia, alm, oa, out=None, op=lambda a, b: b):
	lmax = min(ia.lmax, oa.lmax); mmax = min(ia.mmax, oa.mmax)
	res = np.zeros(alm.shape[:-1] + (oa.nelem,), alm.dtype) if out is None \
		else np.array(out)
	for m in range(mmax+1):
		for l in range(m, lmax+1):
			oi = oa.mstart[m] + l*oa.stride
			res[..., oi] = op(res[..., oi], alm[..., ia.mstart[m] + l*ia.stride])
	return res

def test_transfer_alm():
	a1 = curvedsky.alm_info(lmax=LMAX)
	a2 = curvedsky.alm_info(lmax=LMAX+10)
	alm = oracle.rand_alm_oracle(LMAX, seed=12)
	big = np.asarray(curvedsky.transfer_alm(a1, jnp.asarray(alm), a2))
	for (l, m) in [(0, 0), (LMAX, 3), (7, 7)]:
		assert np.allclose(big[a2.lm2ind(l, m)], alm[a1.lm2ind(l, m)])
	# pad/crop/mixed-mmax fold paths, with and without out=/op=, against a
	# per-(l,m) loop oracle (the fold rewrite must match exactly)
	rng = np.random.default_rng(3)
	for (l1, m1), (l2, m2) in [((LMAX, LMAX), (LMAX-7, LMAX-7)),
			((LMAX, LMAX-9), (LMAX-4, LMAX-4)), ((LMAX, LMAX), (LMAX, LMAX))]:
		ai = curvedsky.alm_info(lmax=l1, mmax=m1)
		ao = curvedsky.alm_info(lmax=l2, mmax=m2)
		a = (rng.standard_normal((2, ai.nelem))
			+ 1j*rng.standard_normal((2, ai.nelem)))
		got = np.asarray(curvedsky.transfer_alm(ai, a, ao))
		assert np.abs(got - _transfer_alm_oracle(ai, a, ao)).max() < 1e-13
		out = (rng.standard_normal((2, ao.nelem))
			+ 1j*rng.standard_normal((2, ao.nelem)))
		opadd = lambda x, y: x + y
		got = np.asarray(curvedsky.transfer_alm(ai, a, ao, out=out.copy(), op=opadd))
		want = _transfer_alm_oracle(ai, a, ao, out=out, op=opadd)
		assert np.abs(got - want).max() < 1e-13


def test_f32_sht():
	# the TPU production dtype: float32 maps with the f32-scaled recurrence
	import jax.numpy as jnp
	from pixell_tpu import sht
	lmax = 40
	nt, nphi = 2*lmax+2, 2*lmax+4
	theta = jnp.asarray(sht.ring_theta("F1", nt), np.float32)
	w = jnp.asarray(sht.ring_weights("F1", nt), np.float32)
	alm = oracle.rand_alm_oracle(lmax, seed=20).astype(np.complex64)
	m = sht.synthesis(jnp.asarray(alm[None]), theta, nphi, lmax=lmax, spin=(0,))
	assert m.dtype == np.float32
	assert bool(jnp.isfinite(m).all())
	alm2 = np.asarray(sht.analysis(m, theta, lmax, w, spin=(0,)))[0]
	err = np.abs(alm2 - alm).max()/np.abs(alm).max()
	assert err < 1e-4
	# high-m scaled-seed region must not produce NaN/inf in f32
	n = sht.nalm(200)
	alm3 = np.zeros(n, np.complex64)
	alm3[sht.lm2ind(200, 200, 200)] = 1
	th2 = jnp.asarray(sht.ring_theta("F1", 402), np.float32)
	m2 = sht.synthesis(jnp.asarray(alm3[None]), th2, 404, lmax=200, spin=(0,))
	assert bool(jnp.isfinite(m2).all())


def test_general_spin():
	"""Spins > 2 via the Wigner-d engine (reference supports arbitrary spin
	through ducc0, curvedsky.py:900-1120): oracle match, exact roundtrip,
	exact adjointness."""
	import jax
	from pixell_tpu import sht
	from pixell_tpu.ops import sht_core
	lmax = 16
	rng = np.random.default_rng(5)
	l_of = np.concatenate([np.arange(m, lmax+1) for m in range(lmax+1)])
	for s in [3, 4]:
		n = sht.nalm(lmax)
		alm = rng.standard_normal((2, n)) + 1j*rng.standard_normal((2, n))
		alm[:, :lmax+1] = rng.standard_normal((2, lmax+1))
		alm[:, l_of < s] = 0
		nt, nphi = 2*lmax+2, 40
		theta = sht.ring_theta("F1", nt)
		w = sht.ring_weights("F1", nt)
		maps = np.asarray(sht.synthesis(jnp.asarray(alm), theta, nphi, spin=[s]))
		phi = 2*np.pi*np.arange(nphi)/nphi
		TH, PH = np.meshgrid(theta, phi, indexing="ij")
		ref = oracle.synth_direct(alm, lmax, TH.ravel(), PH.ravel(), spin=s)
		ref = ref.reshape(2, nt, nphi)
		assert np.linalg.norm(maps-ref)/np.linalg.norm(ref) < 1e-8
		# exact quadrature roundtrip
		a2 = np.asarray(sht.analysis(jnp.asarray(maps), theta, lmax,
			jnp.asarray(w), spin=[s]))
		assert np.linalg.norm(a2-alm)/np.linalg.norm(alm) < 1e-10
		# adjointness: <synth(a), m> == <a, adj_synth(m)> over real dofs
		mr = rng.standard_normal(maps.shape)
		lhs = np.sum(maps*mr)
		at = np.asarray(sht.adjoint_synthesis(jnp.asarray(mr), theta, lmax, spin=[s]))
		rhs = np.sum(alm.real*at.real + alm.imag*at.imag)
		assert abs(lhs-rhs)/abs(lhs) < 1e-12


def test_general_spin_curvedsky():
	"""spin=[3] through the map-level curvedsky API."""
	lmax = 12
	rng = np.random.default_rng(6)
	from pixell_tpu import sht
	l_of = np.concatenate([np.arange(m, lmax+1) for m in range(lmax+1)])
	n = sht.nalm(lmax)
	alm = rng.standard_normal((2, n)) + 1j*rng.standard_normal((2, n))
	alm[:, :lmax+1] = rng.standard_normal((2, lmax+1))
	alm[:, l_of < 3] = 0
	shape, wcs = fullsky(6.0)
	m = curvedsky.alm2map(alm, enmap.zeros((2,)+shape, wcs), spin=[3])
	a2 = np.asarray(curvedsky.map2alm(m, lmax=lmax, spin=[3]))
	assert np.linalg.norm(a2-alm)/np.linalg.norm(alm) < 1e-8


def test_map2alm_adjoint_flag():
	"""map2alm/alm2map adjoint=True are exact transposes over plain real
	dofs (the reference's matrix-test convention, test_pixell.py:1051).
	Regression: the 2d weighted-analysis transpose used to fail structurally
	under jax.linear_transpose (now vjp-based)."""
	from pixell_tpu import curvedsky
	shape, wcs = enmap.fullsky_geometry(res=3.0*utils.degree, variant="fejer1")
	lmax = 50
	rng = np.random.default_rng(3)
	mt = enmap.ndmap(rng.standard_normal(shape), wcs)
	cl = np.concatenate([[0, 0], 1.0/np.arange(2, lmax+1)**2])
	at = np.asarray(curvedsky.rand_alm(cl, lmax=lmax, seed=7))
	Am = np.asarray(curvedsky.map2alm(mt, lmax=lmax))
	ATa = np.asarray(curvedsky.map2alm(enmap.zeros(shape, wcs), alm=at, adjoint=True))
	lhs = np.sum(Am.real*at.real + Am.imag*at.imag)
	rhs = np.sum(np.asarray(ATa)*np.asarray(mt))
	assert abs(lhs - rhs) < 1e-10*abs(lhs)
	m2 = np.asarray(curvedsky.alm2map(at, enmap.zeros(shape, wcs)))
	A2 = np.asarray(curvedsky.alm2map(np.zeros_like(at),
		enmap.ndmap(np.asarray(mt), wcs), adjoint=True))
	lhs2 = np.sum(m2*np.asarray(mt))
	rhs2 = np.sum(np.asarray(A2).real*at.real + np.asarray(A2).imag*at.imag)
	assert abs(lhs2 - rhs2) < 1e-10*abs(lhs2)


def test_f32_synthesis_pole_rings():
	"""Regression: f32 synthesis with a ring at exactly theta=pi NaN'd the
	whole transform when theta reached the engine as a traced value:
	sin(fl32(pi)) = -8.7e-8 escaped the 1e-12 pole threshold, and the
	negative factor made _scaled_cumprod's renormalizer loop (*2^60 per
	combine) to inf. synthesis_general always hits this (its torus grid
	includes both exact poles)."""
	from pixell_tpu import sht
	lmax = 60
	alm = oracle.rand_alm_oracle(lmax, seed=11, ncomp=3)
	thetas = np.array([0.0, 0.4, np.pi/2, np.pi - 1e-3, np.pi])
	g64 = np.asarray(sht.synthesis(jnp.asarray(alm), jnp.asarray(thetas), 128,
		phi0=0.0, lmax=lmax, mmax=lmax, spin=(0, 2), map_dtype=np.float64))
	g32 = np.asarray(sht.synthesis(jnp.asarray(alm.astype(np.complex64)),
		jnp.asarray(thetas), 128, phi0=0.0, lmax=lmax, mmax=lmax, spin=(0, 2),
		map_dtype=np.float32))
	assert np.isfinite(g64).all()
	assert np.isfinite(g32).all()
	err = np.abs(g32 - g64)/np.abs(g64).max()
	# ring 3 (pi - 1e-3) spin-2: plain-f32 recurrence near-pole amplification
	# (the Pallas engine covers it with the polar-DS pass; the jnp scan does
	# not) -- only bound it loosely there
	assert err[:, [0, 1, 2, 4], :].max() < 1e-5
	assert err[0].max() < 1e-5
	assert err[:, 3, :].max() < 5e-2


def test_f32_synthesis_general_pole_points():
	"""f32 synthesis_general must stay finite and accurate including
	evaluation points at/near the poles (drives f32 curved lensing)."""
	lmax = 100
	rng = np.random.default_rng(5)
	nalm = (lmax+1)*(lmax+2)//2
	alm = (rng.standard_normal((3, nalm)) + 1j*rng.standard_normal((3, nalm)))
	alm /= np.sqrt(np.arange(1, nalm+1))
	loc = np.stack([np.concatenate([[0.0, np.pi, 1e-7], rng.uniform(0, np.pi, 40)]),
		np.concatenate([[0.3, 1.0, 2.0], rng.uniform(0, 2*np.pi, 40)])], -1)
	v64 = np.asarray(curvedsky.synthesis_general(jnp.asarray(alm),
		jnp.asarray(loc), lmax=lmax, spin=[0, 2]))
	v32 = np.asarray(curvedsky.synthesis_general(
		jnp.asarray(alm.astype(np.complex64)), jnp.asarray(loc), lmax=lmax,
		spin=[0, 2]))
	assert np.isfinite(v32).all()
	assert np.abs(v32 - v64).max() < 2e-3*np.abs(v64).max()


def test_tri_lm_exact():
	"""_tri_lm (packed index -> (l, m)) must be exact at production lmax,
	independent of the x64 flag: the discriminant is integer-exact in int32
	(sht.py _tri_lm), so the f32 sqrt + corrections can never miss. Run a
	big size with x64 on (the test env) and a sweep with x64 forced off."""
	from pixell_tpu import sht
	import jax
	def check(lmax):
		l, m = sht._tri_lm(lmax, lmax)
		l, m = np.asarray(l), np.asarray(m)
		mt = np.concatenate([np.full(lmax+1-mm, mm) for mm in range(lmax+1)])
		lt = np.concatenate([np.arange(mm, lmax+1) for mm in range(lmax+1)])
		assert (m == mt).all()
		assert (l == lt).all()
	for lmax in (1, 7, 300, 2000):
		check(lmax)
	with jax.enable_x64(False):
		for lmax in (300, 2000):
			check(lmax)


@pytest.mark.slow
def test_accuracy_tier():
	"""The public accuracy="high" knob threads full double-single / f64
	recurrences through the engine: an f32 roundtrip at a resolution where
	the plain f32 recurrence has visibly accumulated error must improve."""
	from pixell_tpu import sht
	lmax = 200
	shape, wcs = enmap.fullsky_geometry(res=0.45*utils.degree,
		variant="fejer1")
	cl = np.concatenate([[0, 0], 1.0/np.arange(2, lmax+1)**2])
	alm = np.asarray(curvedsky.rand_alm(cl, lmax=lmax, seed=7)).astype(np.complex64)
	m_fast = curvedsky.alm2map(jnp.asarray(alm),
		enmap.zeros(shape, wcs, np.float32), spin=[0], accuracy="fast")
	m_high = curvedsky.alm2map(jnp.asarray(alm),
		enmap.zeros(shape, wcs, np.float32), spin=[0], accuracy="high")
	a_fast = np.asarray(curvedsky.map2alm(m_fast, lmax=lmax, spin=[0],
		accuracy="fast"))
	a_high = np.asarray(curvedsky.map2alm(m_high, lmax=lmax, spin=[0],
		accuracy="high"))
	scale = np.abs(alm).max()
	e_fast = np.abs(a_fast - alm).max()/scale
	e_high = np.abs(a_high - alm).max()/scale
	# f64-recurrence roundtrip should be near f32 representation accuracy
	assert e_high < 3e-6
	assert e_high <= e_fast
	# the context manager restores the module default
	assert sht.DS_ACCURACY is False
	with pytest.raises(ValueError):
		curvedsky.alm2map(jnp.asarray(alm),
			enmap.zeros(shape, wcs, np.float32), spin=[0], accuracy="bogus")

def test_banded_synthesis_identical():
	"""Theta-banded synthesis streaming (big-map HBM bound) must match the
	single-program path to rounding: bands are row groups of the same
	per-ring computation, but the full grid can take the hemisphere-
	symmetric kernel while a band cannot, so bit-identity is not
	guaranteed."""
	from pixell_tpu import utils
	lmax = 64  # nt must clear the banding gate (nt >= 64)
	shape, wcs = enmap.fullsky_geometry(res=180.0/(lmax+2)*utils.degree,
		variant="fejer1")
	ainfo = curvedsky.alm_info(lmax=lmax)
	rng = np.random.default_rng(0)
	n = ainfo.nelem
	alm = (rng.standard_normal((3, n))
		+ 1j*rng.standard_normal((3, n))).astype(np.complex64)
	alm[..., :lmax+1] = alm[..., :lmax+1].real
	ref = np.asarray(curvedsky.alm2map(jnp.asarray(alm),
		enmap.zeros((3,)+shape, wcs, np.float32), spin=[0, 2], ainfo=ainfo))
	old = curvedsky.SYNTH_BAND_BYTES
	try:
		curvedsky.SYNTH_BAND_BYTES = 1.0  # force banding
		utils._JIT_CACHE.clear()
		band = np.asarray(curvedsky.alm2map(jnp.asarray(alm),
			enmap.zeros((3,)+shape, wcs, np.float32), spin=[0, 2], ainfo=ainfo))
		# the banded path must actually have run (gate: nt >= 64)
		assert any(isinstance(k, tuple) and k and k[0] == "curvedsky._synth_band"
			for k in utils._JIT_CACHE)
	finally:
		curvedsky.SYNTH_BAND_BYTES = old
		utils._JIT_CACHE.clear()
	assert np.abs(band - ref).max() <= 2e-5*np.abs(ref).max()

def test_banded_analysis_identical():
	"""Theta-banded analysis streaming (big-map HBM bound: the full-width
	ring rfft transient) must match the single-program path: bands are
	row-independent ring FFTs feeding the same phase-domain tail."""
	from pixell_tpu import utils
	lmax = 64  # nt must clear the banding gate (nt >= 64)
	shape, wcs = enmap.fullsky_geometry(res=180.0/(lmax+2)*utils.degree,
		variant="fejer1")
	rng = np.random.default_rng(1)
	m = enmap.ndmap(jnp.asarray(rng.standard_normal((3,)+shape)
		.astype(np.float32)), wcs)
	ref = np.asarray(curvedsky.map2alm(m, lmax=lmax, spin=[0, 2]))
	old = curvedsky.SYNTH_BAND_BYTES
	def _ran_banded():
		return any(isinstance(k, tuple) and k and k[0] == "curvedsky._anal_band"
			for k in utils._JIT_CACHE)
	try:
		curvedsky.SYNTH_BAND_BYTES = 1.0  # force banding
		utils._JIT_CACHE.clear()
		band = np.asarray(curvedsky.map2alm(m, lmax=lmax, spin=[0, 2]))
		assert _ran_banded()
	finally:
		curvedsky.SYNTH_BAND_BYTES = old
		utils._JIT_CACHE.clear()
	assert np.abs(band - ref).max() <= 2e-5*np.abs(ref).max()
	# deriv analysis through the banded path
	md = enmap.ndmap(jnp.asarray(rng.standard_normal((2,)+shape)
		.astype(np.float32)), wcs)
	refd = np.asarray(curvedsky.map2alm(md, lmax=lmax, deriv=True))
	try:
		curvedsky.SYNTH_BAND_BYTES = 1.0
		utils._JIT_CACHE.clear()
		bandd = np.asarray(curvedsky.map2alm(md, lmax=lmax, deriv=True))
		assert _ran_banded()
	finally:
		curvedsky.SYNTH_BAND_BYTES = old
		utils._JIT_CACHE.clear()
	assert np.abs(bandd - refd).max() <= 2e-5*np.abs(refd).max()

def test_banded_analysis_ypad_cache_key():
	"""Two same-shape '2d' geometries that differ only in y placement (a
	north band ypad=(0,p) and a south band ypad=(p,0)) bake DIFFERENT
	dynamic_update_slice offsets into the banded-analysis program; the jit
	cache key must separate them (advisor round-3 medium finding: ypad was
	missing from mkey, silently corrupting the second map's ring
	placement)."""
	from pixell_tpu import utils
	lmax = 64
	shape, wcs = enmap.fullsky_geometry(res=180.0/(lmax+2)*utils.degree,
		variant="fejer1")
	nt = shape[-2]
	cut = nt - 40  # 40-ring bands: north rows [0:40], south rows [cut:nt]
	rng = np.random.default_rng(2)
	m = enmap.ndmap(jnp.asarray(rng.standard_normal(shape)
		.astype(np.float32)), wcs)
	north = m[..., :40, :]
	south = m[..., cut:, :]
	i_n = curvedsky.analyse_geometry(north.shape, north.wcs)
	i_s = curvedsky.analyse_geometry(south.shape, south.wcs)
	assert i_n.case == "2d" and i_s.case == "2d"
	assert tuple(i_n.ypad) != tuple(i_s.ypad)
	ref_n = np.asarray(curvedsky.map2alm(north, lmax=lmax, spin=[0]))
	ref_s = np.asarray(curvedsky.map2alm(south, lmax=lmax, spin=[0]))
	old = curvedsky.SYNTH_BAND_BYTES
	try:
		curvedsky.SYNTH_BAND_BYTES = 1.0  # force banding
		utils._JIT_CACHE.clear()
		# north FIRST, then south WITHOUT clearing: under the buggy key the
		# south call reused north's ypad0 offset
		band_n = np.asarray(curvedsky.map2alm(north, lmax=lmax, spin=[0]))
		band_s = np.asarray(curvedsky.map2alm(south, lmax=lmax, spin=[0]))
	finally:
		curvedsky.SYNTH_BAND_BYTES = old
		utils._JIT_CACHE.clear()
	assert np.abs(band_n - ref_n).max() <= 2e-5*np.abs(ref_n).max()
	assert np.abs(band_s - ref_s).max() <= 2e-5*np.abs(ref_s).max()

def test_cached_jit_accuracy_tier_key():
	"""utils.cached_jit must fold the SHT accuracy tier into its key:
	sht.DS_ACCURACY is read at trace time by every SHT scan, so an
	accuracy='high' call after a default call with identical shapes must
	NOT reuse the fast-tier compiled program (advisor round-3 medium)."""
	from pixell_tpu import utils, sht
	utils._JIT_CACHE.clear()
	builds = []
	def make():
		builds.append(1)
		return lambda x: x*2
	try:
		f_fast = utils.cached_jit(("test_acc_key",), make)
		f_fast2 = utils.cached_jit(("test_acc_key",), make)
		with sht.accuracy("high"):
			f_high = utils.cached_jit(("test_acc_key",), make)
		assert f_fast is f_fast2
		assert f_high is not f_fast
		assert len(builds) == 2
	finally:
		utils._JIT_CACHE.clear()


def test_ring_fft_row_chunking(monkeypatch):
	# Bluestein-hostile nphi beyond the MXU-DFT gate: the row-chunked FFT
	# (bounds XLA's whole-batch chirp workspace) must match the unchunked
	# transform exactly. 4600 = 2^3 5^2 23 is not 2357-smooth.
	from pixell_tpu import sht
	from pixell_tpu.fft import fft_len
	nphi = 4600
	assert fft_len(nphi, "above") != nphi and nphi > sht.DFT_MM_MAX_NPHI
	nt, nm = 150, 60
	rng = np.random.default_rng(0)
	G = (rng.standard_normal((2, nm, nt))
		+ 1j*rng.standard_normal((2, nm, nt))).astype(np.complex64)
	m0 = np.asarray(sht.ring_synthesis(jnp.asarray(G), 0.3, nphi))
	maps = rng.standard_normal((2, nt, nphi)).astype(np.float32)
	F0 = np.asarray(sht.ring_analysis(jnp.asarray(maps), 0.1, nm))
	monkeypatch.setattr(sht, "FFT_CHUNK_BYTES", 1.0)
	sht.ring_synthesis._clear_cache()
	sht.ring_analysis._clear_cache()
	try:
		m1 = np.asarray(sht.ring_synthesis(jnp.asarray(G), 0.3, nphi))
		F1 = np.asarray(sht.ring_analysis(jnp.asarray(maps), 0.1, nm))
	finally:
		sht.ring_synthesis._clear_cache()
		sht.ring_analysis._clear_cache()
	assert np.abs(m1 - m0).max() <= 1e-4*np.abs(m0).max()
	assert np.abs(F1 - F0).max() <= 1e-4*np.abs(F0).max()
