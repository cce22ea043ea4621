"""Headline benchmark: the reference's own install benchmark config
(scripts/benchmark_pixell_runner.py:12-27): 40 x (map2alm lmax=750 +
alm2map) on a full-sky CAR map at 12 arcmin resolution (900 x 1800),
through the public curvedsky API (geometry analysis + exact quadrature
with theta-upsampling + Pallas Legendre kernels on TPU).

The reference runs this in float64 with ducc0 on all CPU cores; a typical
modern many-core node takes ~10 s (no number is published -- BASELINE.md).
We run the same transform count/geometry in float32 (the TPU's native
precision; f64 is software-emulated there) on one chip and report the
speedup against that 10 s reference-node estimate.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import time
import numpy as np

BASELINE_S = 10.0  # assumed reference wall time for the same benchmark config


def main():
	import jax
	import jax.numpy as jnp
	from pixell_tpu import enmap, curvedsky, utils

	lmax = 750
	shape, wcs = enmap.fullsky_geometry(res=12*utils.arcmin, variant="fejer1")
	assert shape == (900, 1800), shape
	dtype = np.float32
	ainfo = curvedsky.alm_info(lmax=lmax)
	minfo = curvedsky.analyse_geometry(shape, wcs)

	def roundtrip(arr):
		m = enmap.ndmap(arr, wcs)
		alm = curvedsky.map2alm(m, lmax=lmax, spin=[0])
		omap = curvedsky.alm2map(alm, enmap.ndmap(jnp.zeros(shape, dtype), wcs),
			spin=[0], ainfo=ainfo)
		return jnp.asarray(omap)

	step = jax.jit(roundtrip)
	nrep = 40

	@jax.jit
	def run_all(a):
		# all 40 sequential roundtrips inside one jit: one device dispatch
		# instead of 40 host->device ping-pongs (the transforms still run
		# back to back, like the reference's sequential loop)
		return jax.lax.fori_loop(0, nrep, lambda i, x: roundtrip(x), a)

	rng = np.random.default_rng(0)
	arr = jnp.asarray(rng.standard_normal(shape).astype(dtype))
	# compile + warmup (excluded, like the reference which times hot ducc calls)
	arr = step(arr)
	arr.block_until_ready()
	assert bool(jnp.isfinite(arr).all()), "non-finite SHT output"
	# correctness guard: a band-limited map must round-trip to itself
	d1 = step(arr)
	rel = float(jnp.max(jnp.abs(d1 - arr))/jnp.max(jnp.abs(arr)))
	assert rel < 1e-3, "SHT roundtrip inaccurate: rel=%g" % rel
	out = run_all(arr)  # compile (excluded)
	# a real fetch: block_until_ready does NOT sync axon remote executions,
	# so without it the warmup would still be in flight during the timing
	assert bool(jnp.isfinite(jnp.sum(out))), "non-finite warmup output"
	# the axon remote runtime caches identical executions, so time a FRESH
	# input, and close the timing with a real value fetch
	arr2 = arr + jnp.float32(1.2345e-5)
	arr2.block_until_ready()
	t0 = time.perf_counter()
	out = run_all(arr2)
	assert bool(jnp.isfinite(jnp.sum(out))), "non-finite benchmark output"
	t1 = time.perf_counter()
	elapsed = t1 - t0
	print(json.dumps({
		"metric": "sht_roundtrip_40x_lmax750_900x1800_f32",
		"value": round(elapsed, 4),
		"unit": "s",
		"vs_baseline": round(BASELINE_S/elapsed, 3),
	}))


if __name__ == "__main__":
	main()
