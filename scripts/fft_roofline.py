#!/usr/bin/env python
"""Measure 2D FFT effective bandwidth vs a copy roofline on the current
device (BASELINE.md north-star: "FFT/interp ops >= 80% of HBM roofline").

Timing method per CLAUDE.md: n executions chained through ONE
jax.lax.fori_loop inside ONE jit (the axon RPC overhead of ~28 ms/dispatch
otherwise dominates), carry perturbed each step so the axon execution cache
cannot replay, closed by a fused scalar fetch.

    python scripts/fft_roofline.py [--sizes 2048,4096,8192] [--nrep 8]

Effective FFT bandwidth uses the standard 2-pass model: a 2D c2c FFT
streams the array once per dimension (read+write each pass), i.e.
bytes = 4 * nbytes(array). The copy roofline is a jnp copy-multiply
(read+write = 2 * nbytes) timed the same way.
"""
import argparse
import json
import os
import sys
import time
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed_loop(stage, x0, nrep):
	"""Time nrep chained executions of stage inside one jit; returns s/exec."""
	import jax
	import jax.numpy as jnp
	@jax.jit
	def run(x):
		def body(i, c):
			# perturb the carry so each step is a fresh execution
			return stage(c)*(1.0 + 1e-7*i.astype(c.real.dtype))
		y = jax.lax.fori_loop(0, nrep, body, x)
		return jnp.sum(jnp.abs(y.real)) + jnp.sum(jnp.abs(y.imag)) \
			if jnp.iscomplexobj(y) else jnp.sum(jnp.abs(y))
	s = run(x0)  # compile + warm
	assert bool(np.isfinite(float(s)))
	x1 = x0*(1 + 1e-6)
	t0 = time.perf_counter()
	s = run(x1)
	ok = np.isfinite(float(s))
	t1 = time.perf_counter()
	assert ok
	return (t1 - t0)/nrep


def main():
	ap = argparse.ArgumentParser()
	ap.add_argument("--sizes", type=str, default="2048,4096,8192")
	ap.add_argument("--nrep", type=int, default=8)
	ap.add_argument("--ring", action="store_true",
		help="also measure the SHT ring-FFT batch shape (lmax 5000)")
	args = ap.parse_args()
	import jax
	import jax.numpy as jnp
	from pixell_tpu import utils
	print("# device:", jax.devices()[0], file=sys.stderr)
	rng = np.random.default_rng(0)
	for n in [int(t) for t in args.sizes.split(",")]:
		# complex arrays cannot cross the axon host<->device link directly
		x = utils.to_device((rng.standard_normal((n, n))
			+ 1j*rng.standard_normal((n, n))).astype(np.complex64))
		nbytes = x.size*8
		dt_fft = timed_loop(lambda c: jnp.fft.fft2(c)/c.shape[-1], x, args.nrep)
		gbs_fft = 4*nbytes/dt_fft/1e9
		dt_cp = timed_loop(lambda c: c*1.0000001, x, args.nrep)
		gbs_cp = 2*nbytes/dt_cp/1e9
		print(json.dumps(dict(op="fft2_c64", n=n,
			ms=round(dt_fft*1e3, 3), gbs=round(gbs_fft, 1),
			copy_gbs=round(gbs_cp, 1),
			frac_roofline=round(gbs_fft/gbs_cp, 3))), flush=True)
	if args.ring:
		# the SHT ring-FFT shape at lmax 5000: batched c2c over the last axis
		nt, nphi = 10002, 10004
		x = utils.to_device((rng.standard_normal((nt, nphi))
			+ 1j*rng.standard_normal((nt, nphi))).astype(np.complex64))
		nbytes = x.size*8
		dt = timed_loop(lambda c: jnp.fft.fft(c, axis=-1)/c.shape[-1], x,
			args.nrep)
		gbs = 2*nbytes/dt/1e9
		dt_cp = timed_loop(lambda c: c*1.0000001, x, args.nrep)
		gbs_cp = 2*nbytes/dt_cp/1e9
		print(json.dumps(dict(op="ringfft_c64", nt=nt, nphi=nphi,
			ms=round(dt*1e3, 3), gbs=round(gbs, 1), copy_gbs=round(gbs_cp, 1),
			frac_roofline=round(gbs/gbs_cp, 3))), flush=True)


if __name__ == "__main__":
	main()
