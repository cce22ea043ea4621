#!/usr/bin/env python
"""Measure the SHT accuracy tiers at scale on the current device: for each
tier (fast = f32 kernels + polar-DS pass, high = full double-single
recurrence) run one alm -> map -> alm roundtrip on a quadrature-exact F1
grid and report the alm-domain error and the warm wall time per direction.

The reference's counterpart is ducc0's epsilon/niter accuracy ladder
(reference curvedsky.py:262-265, 1001-1003: f64 with general-path epsilon
1e-10, niter to ~1e-8); here the ladder is fast-f32 / high-DS / f64 scan.

    python scripts/bench_accuracy.py [--lmax 5000] [--tiers fast,high]
"""
import argparse, os, sys, time
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
	ap = argparse.ArgumentParser()
	ap.add_argument("--lmax", type=int, default=5000)
	ap.add_argument("--tiers", type=str, default="fast,high")
	ap.add_argument("--nrep", type=int, default=2)
	ap.add_argument("--spin", type=str, default="0",
		help='"0" (scalar, C=1) or "0,2" (IQU-like, C=3)')
	ap.add_argument("--blocked", action="store_true",
		help="run with the MXU block-Legendre split enabled")
	ap.add_argument("--no-cache", action="store_true")
	args = ap.parse_args()
	import jax, jax.numpy as jnp
	from pixell_tpu import sht, utils, device
	from pixell_tpu import fft as enfft
	import contextlib
	if not args.no_cache:
		device.enable_compilation_cache()
	spin = tuple(int(t) for t in args.spin.split(","))
	C = 1 if spin == (0,) else 3
	lmax = args.lmax
	nt = 2*lmax + 2
	nphi = enfft.fft_len(2*lmax + 2, "above")
	theta = jnp.asarray(sht.ring_theta("F1", nt), np.float32)
	w = jnp.asarray(sht.ring_weights("F1", nt), np.float32)
	rng = np.random.default_rng(0)
	nelem = (lmax + 1)*(lmax + 2)//2
	alm0 = (rng.standard_normal((C, nelem))
		+ 1j*rng.standard_normal((C, nelem))).astype(np.complex64)
	alm0[:, :lmax + 1] = alm0[:, :lmax + 1].real
	if C > 1:
		# no monopole/dipole in the spin-2 components
		for comp in (1, 2):
			alm0[comp, :2] = 0
			alm0[comp, lmax + 1] = 0
	scale = np.abs(alm0).max()
	print("device:", jax.devices()[0], "lmax", lmax, "grid %dx%d" % (nt, nphi),
		"spin", spin, "blocked", args.blocked)
	sys.stdout.flush()
	for tier in args.tiers.split(","):
		with sht.accuracy(tier), \
				(sht.blocked() if args.blocked else contextlib.nullcontext()):
			def rt(a):
				m = sht.synthesis(a, theta, nphi, lmax=lmax, spin=spin,
					map_dtype=np.float32)
				return sht.analysis(m, theta, lmax, w, spin=spin)
			f = jax.jit(rt)
			a_d = utils.to_device(alm0)
			t0 = time.perf_counter()
			try:
				out = f(a_d)
			except Exception as e:
				# transient remote-compile tunnel error (truncated HTTP body):
				# a real Mosaic rejection reproduces, a flake does not
				print("%-5s transient compile error, retrying: %s"
					% (tier, str(e)[:100]))
				sys.stdout.flush()
				out = f(a_d)
			out.block_until_ready()
			print("%-5s compile+warm %.1f s" % (tier, time.perf_counter() - t0))
			sys.stdout.flush()
			alm1 = utils.from_device(out)
			err = np.abs(alm1 - alm0)
			print("%-5s alm roundtrip err: max %.3e rel-to-scale %.3e rms %.3e"
				% (tier, err.max(), err.max()/scale,
					np.sqrt(np.mean(err**2))/scale))
			sys.stdout.flush()
			# warm timing: fresh input each call so the axon execution cache
			# cannot replay, fused scalar fetch. The perturbation rides inside
			# the jit as a REAL scalar arg (axon cannot move complex host
			# constants, and a fresh eager constant would recompile per rep)
			g = jax.jit(lambda a, eps: jnp.sum(jnp.abs(rt(a*(1 + eps)))))
			float(g(a_d, jnp.float32(0)))
			t0 = time.perf_counter()
			for i in range(args.nrep):
				float(g(a_d, jnp.float32(1e-6*(i + 1))))
			dt = (time.perf_counter() - t0)/args.nrep
			print("%-5s roundtrip %.3f s (nrep %d, incl ~28 ms RPC each)"
				% (tier, dt, args.nrep))
			sys.stdout.flush()


if __name__ == "__main__":
	main()
