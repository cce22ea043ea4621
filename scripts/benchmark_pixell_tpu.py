#!/usr/bin/env python
"""SHT benchmark sweep (the reference ships benchmark-pixell /
benchmark-pixell-runner console scripts, scripts/benchmark_pixell*.py;
this is the TPU equivalent: a sweep over lmax and spin instead of threads)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import time
import numpy as np

def main():
	p = argparse.ArgumentParser()
	p.add_argument("--lmax", type=str, default="750,1500,3000")
	p.add_argument("--dtype", type=str, default="float32")
	p.add_argument("--spin", type=str, default="0")
	p.add_argument("--nrep", type=int, default=3)
	args = p.parse_args()
	import jax, jax.numpy as jnp
	from pixell_tpu import sht
	from pixell_tpu import fft as enfft
	dtype = np.dtype(args.dtype)
	spin = (0,) if args.spin == "0" else (0, 2)
	ncomp = 1 if spin == (0,) else 3
	print("device:", jax.devices()[0])
	for lmax in [int(t) for t in args.lmax.split(",")]:
		# smooth sizes: a non-2357-smooth nphi sends the ring FFTs down
		# XLA's Bluestein path (measured 5.7 GB/s vs ~80 at 10004 cols)
		nt = 2*lmax+2
		nphi = enfft.fft_len(2*lmax+2, "above")
		theta = jnp.asarray(sht.ring_theta("F1", nt), dtype)
		w = jnp.asarray(sht.ring_weights("F1", nt), dtype)
		def rt(m):
			alm = sht.analysis(m, theta, lmax, w, spin=spin)
			return sht.synthesis(alm, theta, nphi, lmax=lmax, spin=spin, map_dtype=dtype)
		# fori-loop chaining inside ONE jit closed by a fused scalar fetch:
		# block_until_ready does NOT sync axon remote executions, and fresh
		# per-step inputs stop the runtime's execution cache from replaying
		f = jax.jit(lambda m: jnp.sum(jnp.abs(
			jax.lax.fori_loop(0, args.nrep, lambda i, x: rt(x*(1 + 1e-7)), m))))
		rng = np.random.default_rng(0)
		m = jnp.asarray(rng.standard_normal((ncomp, nt, nphi)).astype(dtype))
		assert np.isfinite(float(f(m)))  # compile + warm
		m2 = m*(1 + 1e-5)
		t0 = time.perf_counter()
		assert np.isfinite(float(f(m2)))
		dt = (time.perf_counter()-t0)/args.nrep
		print("lmax %5d  %s  spin %s: %8.3f s/roundtrip" % (lmax, args.dtype, spin, dt))
		sys.stdout.flush()

if __name__ == "__main__":
	main()
