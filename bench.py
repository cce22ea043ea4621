"""Headline benchmark: the reference's own install benchmark config
(scripts/benchmark_pixell_runner.py:12-27): 40 x (map2alm lmax=750 +
alm2map) on a full-sky CAR map at 12 arcmin resolution (900 x 1800).

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
	from pixell_tpu import sht, curvedsky

	lmax = 750
	nt, nphi = 900, 1800
	dtype = np.float32
	variant = "CC"  # 900 rings = pi/12' + 1 -> CC grid, like the reference
	theta = jnp.asarray(sht.ring_theta(variant, nt), dtype)
	weights = jnp.asarray(sht.ring_weights(variant, nt), dtype)

	def roundtrip(maps):
		alm = sht.analysis(maps, theta, lmax, weights, spin=(0,))
		omap = sht.synthesis(alm, theta, nphi, lmax=lmax, spin=(0,), map_dtype=dtype)
		return omap

	step = jax.jit(roundtrip)
	rng = np.random.default_rng(0)
	maps = jnp.asarray(rng.standard_normal((1, nt, nphi)).astype(dtype))
	# compile + warmup (excluded, like the reference which times hot ducc calls)
	maps = step(maps)
	maps.block_until_ready()
	assert bool(jnp.isfinite(maps).all()), "non-finite SHT output"
	# correctness guard: a band-limited map must round-trip to itself
	d1 = step(maps)
	rel = float(jnp.max(jnp.abs(d1 - maps))/jnp.max(jnp.abs(maps)))
	assert rel < 1e-3, "SHT roundtrip inaccurate: rel=%g" % rel
	nrep = 40
	t0 = time.perf_counter()
	for i in range(nrep):
		maps = step(maps)
	maps.block_until_ready()
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
