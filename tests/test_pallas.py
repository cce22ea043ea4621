"""Pallas SHT kernel vs the reference jnp scan (interpret mode on CPU)."""
import numpy as np
import jax.numpy as jnp
import pytest
from pixell_tpu.ops import sht_core, sht_pallas
from pixell_tpu import sht

LMAX = 40

@pytest.mark.parametrize("mode,nfun,C", [("scalar", 1, 2), ("deriv", 2, 2), ("spin2", 2, 4)])
def test_pallas_matches_scan(mode, nfun, C):
	lmax = mmax = LMAX
	nt = 2*lmax+2
	theta = sht.ring_theta("F1", nt).astype(np.float32)
	rng = np.random.default_rng(0)
	A = rng.standard_normal((lmax+1, mmax+1, C)).astype(np.float32)
	G1 = np.asarray(sht_core.synthesis_scan(jnp.asarray(A), jnp.asarray(theta),
		lmax, mmax, mode=mode, dtype=np.float32))
	G2 = np.asarray(sht_pallas.synthesis_scan_pallas(jnp.asarray(A),
		jnp.asarray(theta), lmax, mmax, mode=mode, interpret=True))
	assert np.abs(G1 - G2).max() < 1e-5*max(np.abs(G1).max(), 1)
	F = rng.standard_normal((nfun, C, mmax+1, nt)).astype(np.float32)
	a1 = np.asarray(sht_core.analysis_scan(jnp.asarray(F), jnp.asarray(theta),
		lmax, mmax, mode=mode, dtype=np.float32))
	a2 = np.asarray(sht_pallas.analysis_scan_pallas(jnp.asarray(F),
		jnp.asarray(theta), lmax, mmax, mode=mode, interpret=True))
	assert np.abs(a1 - a2).max() < 1e-4*max(np.abs(a1).max(), 1)
