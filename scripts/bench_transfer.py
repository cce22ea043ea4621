#!/usr/bin/env python
"""Measure host<->device transfer bandwidth on the current runtime (the axon
tunnel makes this a first-class cost: config-5's host-offloaded wavelet maps
move ~4.3 GB each way). Times jnp.asarray (up) and np.asarray (down) for a
range of sizes; the down direction is closed by the copy itself.

    python scripts/bench_transfer.py
"""
import os, sys, time
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
	import jax, jax.numpy as jnp
	print("device:", jax.devices()[0])
	for mb in [16, 128, 512]:
		n = mb*(1 << 20)//4
		x = np.random.default_rng(0).standard_normal(n).astype(np.float32)
		# up: host -> device, closed by a fused scalar fetch of a jitted sum
		f = jax.jit(lambda y: jnp.sum(y))
		float(f(jnp.asarray(x)))  # warm compile
		x2 = x + 1e-3
		t0 = time.perf_counter()
		d = jnp.asarray(x2)
		float(f(d))
		up = time.perf_counter() - t0
		# down: device -> host (np.asarray blocks by construction)
		t0 = time.perf_counter()
		h = np.asarray(d)
		down = time.perf_counter() - t0
		print("%5d MB  up %7.2f s (%7.1f MB/s)   down %7.2f s (%7.1f MB/s)"
			% (mb, up, mb/up, down, mb/down))
		sys.stdout.flush()


if __name__ == "__main__":
	main()
