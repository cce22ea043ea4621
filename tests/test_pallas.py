"""Pallas SHT kernel vs the reference jnp scan (interpret mode on CPU).

The Pallas kernels and the jnp scan use different f32 summation orders (the
hemisphere-symmetric kernels in particular accumulate north/south pairs
separately), so each is compared against the float64 scan rather than
bitwise against the f32 scan."""
import numpy as np
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


@pytest.mark.parametrize("mode,C", [("scalar", 2), ("deriv", 2), ("spin2", 4)])
def test_pallas_matches_scan(mode, C):
	theta = sht.ring_theta("F1", 2*LMAX+2)
	assert sht_pallas._detect_sym(theta) is not None
	_check(mode, C, theta)


@pytest.mark.parametrize("mode,C", [("scalar", 1), ("deriv", 1),
	("spin1", 2), ("spin2", 3)])
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
