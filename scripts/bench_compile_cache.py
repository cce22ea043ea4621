#!/usr/bin/env python
"""Measure whether jax's persistent compilation cache works through this
runtime (e.g. the axon remote-compile tunnel), and what it saves.

Compiles a blocked (MXU split) synthesis at --lmax with the cache enabled
and prints the compile wall time. Run it TWICE (two processes): if the
second run's compile time collapses to seconds, executables deserialize
from the cache and the blocked path's per-geometry first-compile cost is
per-machine, not per-process.

    python scripts/bench_compile_cache.py [--lmax 2000] [--mode scalar]
"""
import argparse, os, sys, time
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
	ap = argparse.ArgumentParser()
	ap.add_argument("--lmax", type=int, default=2000)
	ap.add_argument("--mode", type=str, default="scalar")
	ap.add_argument("--no-blocked", action="store_true")
	ap.add_argument("--dir", type=str, default="/tmp/pixell_tpu_xla_cache")
	args = ap.parse_args()
	import jax, jax.numpy as jnp
	from pixell_tpu import sht, device
	d = device.enable_compilation_cache(args.dir)
	print("cache dir:", d, "entries before:",
		sum(len(fs) for _, _, fs in os.walk(d)))
	lmax = args.lmax
	nt, nphi = lmax+2, 2*lmax+2
	theta = np.asarray(sht.ring_theta("F1", nt), np.float64)
	spin = {"scalar": (0,), "spin2": (2,)}[args.mode]
	C = 1 if args.mode == "scalar" else 2
	rng = np.random.default_rng(0)
	n = sht.nalm(lmax)
	alm = jnp.asarray((rng.standard_normal((C, n))
		+ 1j*rng.standard_normal((C, n))).astype(np.complex64))

	def run():
		return sht.synthesis(alm, theta, nphi, lmax=lmax, spin=spin,
			map_dtype=np.float32)

	t0 = time.perf_counter()
	if args.no_blocked:
		m = jax.block_until_ready(run())
	else:
		with sht.blocked():
			m = jax.block_until_ready(run())
	t_cold = time.perf_counter() - t0
	print("first call (compile+run): %.1f s" % t_cold)
	print("entries after:", sum(len(fs) for _, _, fs in os.walk(d)))


if __name__ == "__main__":
	main()
