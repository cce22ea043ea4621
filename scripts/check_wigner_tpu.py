"""On-chip numerical check of the general-spin (Wigner) Pallas kernels.

Compares the real-TPU Pallas wigner kernels -- including the polar
double-single pass (ACCURACY="high") -- against the float64 jnp scan
computed on the host CPU. Interpret-mode coverage of the DS wigner kernels
is impractical on a 1-core host (the interpreter compile blows up), so this
script is the numerical gate for that path; run it together with
scripts/tpu_smoke.py when the wigner engine changes.

    python scripts/check_wigner_tpu.py [--lmax 200] [--spin 3]
"""
import argparse
import os
import subprocess
import sys
import tempfile
import time
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_ORACLE_SRC = r"""
import sys, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, sys.argv[1])
from pixell_tpu.ops import sht_core
d = np.load(sys.argv[2])
lmax, mmax, s = int(d["lmax"]), int(d["mmax"]), int(d["s"])
theta = jnp.asarray(d["theta"], jnp.float64)
G64 = np.asarray(sht_core.wigner_synthesis_scan(
	jnp.asarray(d["A"], jnp.float64), theta, lmax, mmax, s, dtype=np.float64))
a64 = np.asarray(sht_core.wigner_analysis_scan(
	jnp.asarray(d["F"], jnp.float64), theta, lmax, mmax, s, dtype=np.float64))
np.savez(sys.argv[3], G64=G64, a64=a64)
"""


def oracle(repo, A, F, theta, lmax, mmax, s):
	"""f64 jnp-scan oracle in a subprocess: x64 must be ON there (the S=850
	scaled-Legendre representation overflows if truncated to f32), but OFF in
	this process (x64 tracing puts i64 scalars into the Pallas kernels, which
	Mosaic rejects)."""
	env = dict(os.environ)
	env["JAX_ENABLE_X64"] = "1"
	env["JAX_PLATFORMS"] = "cpu"
	with tempfile.TemporaryDirectory() as td:
		fin = os.path.join(td, "in.npz"); fout = os.path.join(td, "out.npz")
		np.savez(fin, A=A, F=F, theta=theta, lmax=lmax, mmax=mmax, s=s)
		subprocess.run([sys.executable, "-c", _ORACLE_SRC, repo, fin, fout],
			env=env, check=True)
		d = np.load(fout)
		return d["G64"], d["a64"]


def main():
	ap = argparse.ArgumentParser()
	ap.add_argument("--lmax", type=int, default=200)
	ap.add_argument("--spin", type=int, default=3)
	args = ap.parse_args()
	lmax = mmax = args.lmax
	s = args.spin

	import jax
	import jax.numpy as jnp
	print("backend:", jax.default_backend())
	from pixell_tpu.ops import sht_core, sht_pallas

	nt = 2*lmax + 2
	theta = (np.arange(nt) + 0.5)*np.pi/nt
	nn, ns = sht_pallas._polar_counts(theta, lmax)
	print("polar rings: %d north, %d south (of %d)" % (nn, ns, nt))
	rng = np.random.default_rng(0)
	C = 2
	A = rng.standard_normal((lmax+1, mmax+1, C)).astype(np.float32)
	F = rng.standard_normal((2, C, mmax+1, nt)).astype(np.float32)

	repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
	G64, a64 = oracle(repo, A, F, theta, lmax, mmax, s)
	t0 = time.time()
	G = np.asarray(sht_pallas.wigner_synthesis_scan_pallas(jnp.asarray(A),
		jnp.asarray(theta, jnp.float32), lmax, mmax, s))
	dt_syn = time.time() - t0
	scale = max(np.abs(G64).max(), 1)
	err_syn = np.abs(G - G64).max()/scale
	# per-region: polar rings (DS pass) vs bulk
	pol = np.concatenate([np.arange(nn), nt - 1 - np.arange(ns)])
	err_pol = np.abs(G[..., pol] - G64[..., pol]).max()/scale
	print("synth err: %.2e total, %.2e polar  (%.1f s incl compile)"
		% (err_syn, err_pol, dt_syn))

	t0 = time.time()
	a = np.asarray(sht_pallas.wigner_analysis_scan_pallas(jnp.asarray(F),
		jnp.asarray(theta, jnp.float32), lmax, mmax, s))
	dt_ana = time.time() - t0
	scale = max(np.abs(a64).max(), 1)
	err_ana = np.abs(a - a64).max()/scale
	print("anal  err: %.2e total            (%.1f s incl compile)"
		% (err_ana, dt_ana))

	tol = 5e-5*max(1.0, lmax/200.0)   # bulk plain-f32 floor ~ l*eps
	ok = err_syn < tol and err_ana < tol
	print("WIGNER CHECK:", "ok" if ok else "FAIL", "(tol %.1e)" % tol)
	sys.exit(0 if ok else 1)


if __name__ == "__main__":
	main()
