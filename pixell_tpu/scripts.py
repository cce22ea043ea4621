"""Console entry points (reference ships benchmark-pixell /
benchmark-pixell-runner, pyproject.toml:36-39)."""
from __future__ import annotations
import json
import time
import numpy as np


def benchmark_main():
	"""SHT round-trip benchmark on the default jax device: the reference's
	install benchmark config (40x map2alm lmax=750 + alm2map on a 900x1800
	fullsky map) (reference scripts/benchmark_pixell_runner.py:12-27)."""
	import jax
	import jax.numpy as jnp
	from . import enmap, curvedsky, utils
	lmax = 750
	shape, wcs = enmap.fullsky_geometry(res=12*utils.arcmin, variant="fejer1")
	dtype = np.float32 if jax.default_backend() != "cpu" else np.float64
	ainfo = curvedsky.alm_info(lmax=lmax)
	def roundtrip(arr):
		m = enmap.ndmap(arr, wcs)
		alm = curvedsky.map2alm(m, lmax=lmax, spin=[0])
		omap = curvedsky.alm2map(alm, enmap.ndmap(jnp.zeros(shape, dtype), wcs),
			spin=[0], ainfo=ainfo)
		return jnp.asarray(omap)
	step = jax.jit(roundtrip)
	rng = np.random.default_rng(0)
	arr = jnp.asarray(rng.standard_normal(shape).astype(dtype))
	arr = step(arr); arr.block_until_ready()
	t0 = time.perf_counter()
	for i in range(40):
		arr = step(arr)
	arr.block_until_ready()
	elapsed = time.perf_counter() - t0
	print("Benchmarking SHTs on %s (%s)" % (jax.devices()[0], np.dtype(dtype).name))
	print("40 x (map2alm lmax=750 + alm2map) on 900x1800: %8.3f s  (%5.1f ms each)"
		% (elapsed, elapsed/40*1000))
	return elapsed
