#!/usr/bin/env python
"""Benchmark the five BASELINE.md measurable configs on the current device.

Each config prints one JSON line {"config", "metric", "value", "unit", ...}.
Timing follows the CLAUDE.md axon rules: everything under one jit per
config, warmup excluded, fresh inputs for the timed call, a fused scalar
fetch to close the pipeline (block_until_ready does not sync axon).

    python scripts/benchmark_baseline.py [--quick] [--only 1,3]

Configs (BASELINE.md "Measurable configs"):
  1. 256x512 CAR fft/ifft roundtrip + binned 2D power spectrum
  2. spin-0 full-sky map2alm/alm2map roundtrip at lmax=2000
  3. spin-2 IQU SHT + CAR->HEALPix reproject of a 3-component map
  4. gradient-order curved lensing + Doppler aberration, 0.5-arcmin patch
  5. scale-discrete wavelet decomposition + srcsim point-source injection
"""
import argparse
import json
import os
import sys
import time
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args, nrep=1):
	"""Compile + warm, then time nrep fused executions, each with a DISTINCT
	input perturbation folded in inside the jit: the axon execution cache
	replays identical (program, arguments) executions near-instantly, so
	reusing one input across reps would time only the first rep (measured:
	a whole lmax-10000 wavelet roundtrip 'warm pass' reported 0.8 s that
	way). fn must return a jax array (or pytree); we fetch a fused scalar
	sum to synchronize."""
	import jax
	import jax.numpy as jnp
	@jax.jit
	def run(k, *a):
		a = [x + k.astype(x.dtype) if hasattr(x, "dtype")
			and jnp.issubdtype(x.dtype, jnp.floating) else x for x in a]
		out = fn(*a)
		leaves = jax.tree.leaves(out)
		return sum(jnp.sum(jnp.abs(l.astype(jnp.float32))) for l in leaves)
	ks = [jnp.asarray(np.float32(1.2345e-5*(k + 1))) for k in range(nrep + 1)]
	s = run(ks[-1], *args)  # compile + warm
	assert bool(np.isfinite(float(s))), "non-finite warmup output"
	t0 = time.perf_counter()
	for k in range(nrep):
		s = run(ks[k], *args)
	ok = bool(np.isfinite(float(s)))
	t1 = time.perf_counter()
	assert ok
	return (t1 - t0)/nrep


def config1(quick):
	"""fft/ifft roundtrip + binned power spectrum, 256x512 f32 CAR map."""
	import jax.numpy as jnp
	from pixell_tpu import enmap, utils
	shape, wcs = enmap.geometry(pos=[[-5*utils.degree, 5*utils.degree],
		[5*utils.degree, -5*utils.degree]], shape=(256, 512), proj="car")
	lmap = enmap.modlmap(shape, wcs)
	bedges = jnp.linspace(0, float(lmap.max()), 65)
	ibin = jnp.clip(jnp.searchsorted(bedges, jnp.asarray(lmap).ravel()) - 1, 0, 63)
	def step(arr):
		m = enmap.ndmap(arr, wcs)
		fm = enmap.fft(m)
		p2d = (fm*jnp.conj(fm)).real
		cl = jnp.zeros(64, p2d.dtype).at[ibin].add(p2d.ravel())
		cnt = jnp.zeros(64, p2d.dtype).at[ibin].add(1.0)
		om = enmap.ifft(fm).real
		return jnp.asarray(om), cl/jnp.maximum(cnt, 1)
	rng = np.random.default_rng(0)
	arr = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
	dt = timed(step, arr, nrep=4)
	return dict(config="1_fft_powspec_256x512", value=round(dt*1e3, 3), unit="ms")


def config2(quick):
	"""Spin-0 full-sky roundtrip at lmax=2000 (north-star family)."""
	import jax.numpy as jnp
	from pixell_tpu import enmap, curvedsky, utils
	lmax = 500 if quick else 2000
	res = 180.0*60/(lmax + 2)*utils.arcmin
	shape, wcs = enmap.fullsky_geometry(res=res, variant="fejer1")
	ainfo = curvedsky.alm_info(lmax=lmax)
	def step(arr):
		m = enmap.ndmap(arr, wcs)
		alm = curvedsky.map2alm(m, lmax=lmax, spin=[0])
		omap = curvedsky.alm2map(alm, enmap.ndmap(jnp.zeros(shape, np.float32), wcs),
			spin=[0], ainfo=ainfo)
		return jnp.asarray(omap)
	rng = np.random.default_rng(0)
	arr = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
	dt = timed(step, arr, nrep=2)
	return dict(config="2_sht_roundtrip_lmax%d" % lmax, value=round(dt, 4), unit="s")


def config3(quick):
	"""Spin-2 IQU SHT roundtrip + CAR->HEALPix reproject (harm method)."""
	import jax.numpy as jnp
	from pixell_tpu import enmap, curvedsky, reproject, healpix, utils
	lmax = 500 if quick else 2000
	nside = 256 if quick else 1024
	res = 180.0*60/(lmax + 2)*utils.arcmin
	shape, wcs = enmap.fullsky_geometry(res=res, variant="fejer1")
	ainfo = curvedsky.alm_info(lmax=lmax)
	def step(arr):
		m = enmap.ndmap(arr, wcs)
		alm = curvedsky.map2alm(m, lmax=lmax, spin=[0, 2])
		heal = curvedsky.alm2map_healpix(alm, nside=nside, spin=[0, 2])
		omap = curvedsky.alm2map(alm,
			enmap.ndmap(jnp.zeros((3,) + shape, np.float32), wcs),
			spin=[0, 2], ainfo=ainfo)
		return jnp.asarray(omap), heal
	rng = np.random.default_rng(0)
	arr = jnp.asarray(rng.standard_normal((3,) + shape).astype(np.float32))
	dt = timed(step, arr, nrep=2)
	return dict(config="3_iqu_sht_reproject_lmax%d_nside%d" % (lmax, nside),
		value=round(dt, 4), unit="s")


def config4(quick):
	"""Curved lensing (dec-band streamed) + aberration on a 0.5-arcmin
	patch. Host-orchestrated (band loop + NUFFT planning), so timed
	end-to-end with wall clock instead of one fused jit."""
	import jax
	import jax.numpy as jnp
	from pixell_tpu import enmap, curvedsky, lensing, aberration, utils
	if quick:
		box = [[-2, 4], [2, -4]]
		lmax = 1000
	else:
		box = [[-5, 10], [5, -10]]
		lmax = 4000
	shape, wcs = enmap.geometry(
		pos=np.array(box)*utils.degree, res=0.5*utils.arcmin, proj="car")
	rng = np.random.default_rng(0)
	ps = np.zeros((4, 4, lmax+1), np.float64)
	l = np.arange(lmax+1)
	ps[0, 0] = 1e-8/np.maximum(l*(l+1), 1)**2   # phi
	ps[1, 1] = 1.0/np.maximum(l, 1)**2          # T
	ps[2, 2] = 0.1/np.maximum(l, 1)**2          # E
	ps[3, 3] = 0.01/np.maximum(l, 1)**2         # B
	phi_alm, cmb_alm = lensing.rand_alm(ps, lmax=lmax, dtype=np.float64, seed=1)
	# device-resident alm: the TPU-native operating point (they are produced
	# on device by rand_alm in a real pipeline). Re-uploading ~256 MB of host
	# alm per call through a tunnel-attached runtime would swamp the compute
	# (measured: 18.1 s vs 2.0 s warm at this config).
	phi_alm = utils.to_device(phi_alm.astype(np.complex64))
	cmb_alm = utils.to_device(cmb_alm.astype(np.complex64))
	def run(pa, ca):
		lensed = lensing.lens_map_curved(shape=(3,) + shape, wcs=wcs,
			phi_alm=pa, cmb_alm=ca, dtype=np.float32,
			delta_theta=2*utils.degree)
		ab = aberration.boost_map(lensed, modulation=None)
		return float(jnp.sum(jnp.abs(jnp.asarray(ab))))
	s = run(phi_alm, cmb_alm)  # compile + warm
	assert np.isfinite(s)
	# distinct alm values for the timed pass (axon execution-cache rule)
	phi2 = jax.block_until_ready(phi_alm*np.float32(1 + 1e-4))
	cmb2 = jax.block_until_ready(cmb_alm*np.float32(1 + 1e-4))
	t0 = time.perf_counter()
	s = run(phi2, cmb2)
	assert np.isfinite(s)
	dt = time.perf_counter() - t0
	return dict(config="4_lens_aberrate_%dx%d_lmax%d" % (shape[0], shape[1], lmax),
		value=round(dt, 3), unit="s")


def config5(quick):
	"""Scale-discrete wavelet decomposition + srcsim injection. The
	reference config says lmax=10000; full-sky at that lmax is a 20002 x
	40004 map (3.2 GB f32)."""
	import jax.numpy as jnp
	from pixell_tpu import enmap, uharm, wavelets, pointsrcs, utils
	from pixell_tpu import fft as enfft
	lmax = 1000 if quick else 10000
	# smallest fullsky F1 grid with >= lmax+2 rings and a 2357-smooth column
	# count (a large-prime nphi like 20004 = 2^2*3*1667 sends every ring FFT
	# down XLA's Bluestein path; the reference's ducc0/FFTW users pick smooth
	# grid sizes for the same reason)
	ny = lmax + 2
	while enfft.fft_len(2*ny, "above") != 2*ny:
		ny += 1
	res = 180.0*60/ny*utils.arcmin
	shape, wcs = enmap.fullsky_geometry(res=res, variant="fejer1")
	uht = uharm.UHT(shape, wcs, mode="curved", lmax=lmax)
	wt = wavelets.WaveletTransform(uht, basis=wavelets.ButterTrim(step=2))
	# source catalog
	nsrc = 1000 if quick else 10000
	rng = np.random.default_rng(0)
	poss = np.array([rng.uniform(-1.2, 1.2, nsrc), rng.uniform(-np.pi, np.pi, nsrc)])
	amps = rng.uniform(0.5, 2.0, nsrc).astype(np.float32)
	r = np.linspace(0, 30*utils.arcmin, 1000)
	br = np.exp(-0.5*(r/(2*utils.arcmin))**2)
	def stage_srcsim(it):
		# distinct amplitudes per pass: identical inputs would let the axon
		# execution cache replay the whole warm pass (timed() docstring)
		omap = pointsrcs.sim_objects(shape, wcs, poss,
			amps*np.float32(1 + 1e-4*it), (r, br))
		omap = enmap.ndmap(jnp.asarray(omap), wcs)
		float(jnp.sum(jnp.abs(jnp.asarray(omap))))
		return omap
	# pass 1 = compile + warm (every wavelet scale is its own SHT geometry,
	# each a separate remote compile through the tunnel); pass 2 = timed
	t_parts = {}
	omap = wave = rec = None
	for it in range(2):
		# release the previous pass's wavelet set and reconstruction BEFORE
		# this pass allocates: holding the pass-1 set (2.7 GB device-resident
		# at lmax 10000) through pass-2's map2wave doubles peak residency
		wave = rec = None
		t0 = time.perf_counter()
		omap = stage_srcsim(it)
		t_parts["srcsim"] = time.perf_counter() - t0
		t0 = time.perf_counter()
		wave = wt.map2wave(omap)
		# sum per scale: wave.flat() would CONCATENATE every wavelet map into
		# a second multi-GB buffer right at the HBM peak; host-offloaded
		# scales are summed on the host (re-uploading them would defeat the
		# offload)
		for m in wave.maps:
			d = m.data if hasattr(m, "data") else m
			if isinstance(d, np.ndarray): float(np.abs(d).sum())
			else: float(jnp.sum(jnp.abs(jnp.asarray(m))))
		t_parts["map2wave"] = time.perf_counter() - t0
		omap = None  # free the 3.2 GB source before the reconstruction
		t0 = time.perf_counter()
		rec = wt.wave2map(wave)
		float(jnp.sum(jnp.abs(jnp.asarray(rec))))
		t_parts["wave2map"] = time.perf_counter() - t0
	return dict(config="5_wavelet_srcsim_lmax%d" % lmax,
		value=round(sum(t_parts.values()), 3), unit="s",
		parts={k: round(v, 3) for k, v in t_parts.items()})


def main():
	ap = argparse.ArgumentParser()
	ap.add_argument("--quick", action="store_true")
	ap.add_argument("--only", type=str, default=None,
		help="comma-separated config numbers, e.g. 1,3")
	ap.add_argument("--tb", action="store_true", help="print tracebacks")
	ap.add_argument("--no-cache", action="store_true",
		help="disable the persistent compilation cache (on by default: on "
		"remote-compile runtimes even a jit(squeeze) costs ~0.5 s to "
		"compile, and a full config-5 cold pass is ~55 min of compiles; "
		"the cache does not affect the timed warm passes)")
	args = ap.parse_args()
	import jax
	if not args.no_cache:
		from pixell_tpu import device
		device.enable_compilation_cache()
	print("# device:", jax.devices()[0], file=sys.stderr)
	cfgs = {1: config1, 2: config2, 3: config3, 4: config4, 5: config5}
	want = sorted(int(t) for t in args.only.split(",")) if args.only else sorted(cfgs)
	for i in want:
		for attempt in range(3):
			try:
				res = cfgs[i](args.quick)
				print(json.dumps(res), flush=True)
				break
			except Exception as e:
				if args.tb:
					import traceback; traceback.print_exc()
				msg = str(e)
				transient = any(t in msg for t in ("read body",
					"remote_compile", "DEADLINE_EXCEEDED", "UNAVAILABLE"))
				if transient and attempt < 2:
					# transient remote-compile tunnel flake: retry (already-
					# compiled programs replay from the in-process cache, so
					# the retry resumes roughly where the flake hit)
					print(json.dumps(dict(config=str(i), retry=attempt + 1,
						transient=msg[:160])), flush=True)
					continue
				print(json.dumps(dict(config=str(i),
					error=(type(e).__name__ + ": " + msg)[:300])), flush=True)
				break


if __name__ == "__main__":
	main()
