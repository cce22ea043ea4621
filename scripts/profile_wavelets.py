#!/usr/bin/env python
"""Stage table for BASELINE config 5 (wavelet decomposition at lmax 10000):
per-scale timings of map2wave (rect slice+filter+fold, harm2map synthesis,
offload fetch) and wave2map (upload+analysis, rect filter+accumulate), plus
the initial big analysis/unfold and the final fold + big synthesis. Mirrors
WaveletTransform.map2wave/wave2map stage by stage. Every stage is closed
with block_until_ready/np.asarray so wall times are attributable.

    python scripts/profile_wavelets.py [--lmax 10000] [--quick]
        [--offload {auto,0,1}]
"""
import argparse, os, sys, time
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
	ap = argparse.ArgumentParser()
	ap.add_argument("--lmax", type=int, default=10000)
	ap.add_argument("--quick", action="store_true")
	ap.add_argument("--offload", type=str, default="auto",
		help="auto (library policy), 0 (force device), 1 (force host)")
	ap.add_argument("--bench-geometry", action="store_true",
		help="use BASELINE config 5's exact grid (res pi/(lmax+2))")
	ap.add_argument("--srcsim", action="store_true",
		help="use the config-5 srcsim map as input instead of noise")
	args = ap.parse_args()
	import jax, jax.numpy as jnp
	from pixell_tpu import enmap, curvedsky, wavelets, uharm, utils, device
	device.enable_compilation_cache()
	lmax = 1000 if args.quick else args.lmax
	if args.bench_geometry:
		# BASELINE config 5's grid: smallest F1 fullsky with >= lmax+2 rings
		# and a 2357-smooth column count (see benchmark_baseline.config5)
		from pixell_tpu import fft as enfft
		ny = lmax + 2
		while enfft.fft_len(2*ny, "above") != 2*ny:
			ny += 1
		res = np.pi/ny
	else:
		res = np.pi/(lmax + 1)
	shape, wcs = enmap.fullsky_geometry(res=res, variant="fejer1")
	print("map %s  lmax %d" % (shape, lmax)); sys.stdout.flush()
	rng = np.random.default_rng(0)
	if args.srcsim:
		from pixell_tpu import pointsrcs
		nsrc = 10000
		poss = np.array([rng.uniform(-1.2, 1.2, nsrc),
			rng.uniform(-np.pi, np.pi, nsrc)])
		amps = rng.uniform(0.5, 2.0, nsrc).astype(np.float32)
		r = np.linspace(0, 30*utils.arcmin, 1000)
		br = np.exp(-0.5*(r/(2*utils.arcmin))**2)
		t0 = time.perf_counter()
		m = pointsrcs.sim_objects(shape, wcs, poss, amps, (r, br))
		m = enmap.ndmap(jnp.asarray(m), wcs)
		float(jnp.sum(jnp.abs(jnp.asarray(m))))
		print("srcsim %.1f s" % (time.perf_counter() - t0)); sys.stdout.flush()
	else:
		# random band-limited map: cheap white map is fine for timing
		m = enmap.ndmap(jnp.asarray(rng.standard_normal(shape).astype(np.float32)),
			wcs)
	kw = {} if args.offload == "auto" else {"offload": bool(int(args.offload))}
	wt = wavelets.WaveletTransform((shape, wcs), basis=wavelets.ButterTrim(),
		**kw)
	uht = wt.uht
	print("scales:", wt.nlevel, "offload:", wt._offload_now(m))
	print("scale lmaxs:", [u.lmax for u in wt.uhts])
	sys.stdout.flush()

	# block_until_ready does NOT sync axon remote executions. Execution is
	# FIFO on the single chip, so fetching a fresh tiny scalar enqueued
	# AFTER a stage fences everything before it (validated: a 1.8 s matmul
	# chain dispatches in 0.000 s and the fence waits the full 1.8 s).
	probe = [jnp.zeros((), np.float32)]
	def sync(x):
		probe[0] = probe[0] + np.float32(1)
		float(probe[0])
		return x

	for ip, phase in enumerate(["cold", "warm"]):
		print("== %s pass ==" % phase); sys.stdout.flush()
		# distinct input values per pass: the axon execution cache replays
		# identical (program, args) executions near-instantly, so a warm
		# pass on the cold pass's exact buffers times nothing
		if ip:
			m = enmap.ndmap(sync(jnp.asarray(m)*np.float32(1 + 1e-4)), m.wcs)
		t_all = time.perf_counter()
		# ---- map2wave, instrumented (mirrors WaveletTransform.map2wave) ----
		t0 = time.perf_counter()
		harm = sync(uht.map2harm(m, spin=0))
		t_big_anal = time.perf_counter() - t0
		t0 = time.perf_counter()
		rect = sync(uht.ainfo._rect(utils.to_device(harm)))
		t_unfold = time.perf_counter() - t0
		print("map2wave: big analysis %.2f s  unfold %.2f s"
			% (t_big_anal, t_unfold)); sys.stdout.flush()
		offload = wt._offload_now(m)
		outs = [None]*wt.basis.n
		for i in reversed(range(wt.basis.n)):
			u = wt.uhts[i]
			prof = wt.basis.kernel(i, np.arange(u.lmax+1, dtype=float))
			t0 = time.perf_counter()
			L, M = u.ainfo.lmax+1, u.ainfo.mmax+1
			pf = jnp.asarray(np.asarray(prof, rect.real.dtype))
			sub = sync(u.ainfo._unrect(rect[..., :L, :M]*pf[:L, None]))
			t_tr = time.perf_counter() - t0
			t0 = time.perf_counter()
			mi = sync(u.harm2map(sub, spin=0))
			t_syn = time.perf_counter() - t0
			sub = None
			t0 = time.perf_counter()
			if offload:
				mi = enmap.ndmap(np.asarray(mi), mi.wcs)
			t_off = time.perf_counter() - t0
			outs[i] = mi
			print("  scale %d lmax %5d grid %s: filter+fold %6.2f  synth %6.2f  offload %6.2f"
				% (i, u.lmax, tuple(u.shape[-2:]), t_tr, t_syn, t_off))
			sys.stdout.flush()
		rect = None
		t_m2w = time.perf_counter() - t_all
		print("map2wave total %.1f s" % t_m2w); sys.stdout.flush()

		# ---- wave2map, instrumented ----
		t_all2 = time.perf_counter()
		total = None
		for i in range(wt.basis.n):
			u = wt.uhts[i]
			prof = wt.basis.kernel(i, np.arange(u.lmax+1, dtype=float))
			t0 = time.perf_counter()
			mi = outs[i]
			sub = sync(u.map2harm(mi, spin=0))
			t_anal = time.perf_counter() - t0
			t0 = time.perf_counter()
			srect = u.ainfo._rect(utils.to_device(sub))
			pf = jnp.asarray(np.asarray(prof, srect.real.dtype))
			srect = srect*pf[:srect.shape[-2], None]
			if total is None:
				total = utils.czeros(srect.shape[:-2]
					+ (uht.ainfo.lmax+1, uht.ainfo.mmax+1), srect.dtype)
			L, M = srect.shape[-2:]
			total = sync(total.at[..., :L, :M].add(srect))
			t_tr = time.perf_counter() - t0
			print("  scale %d lmax %5d: upload+analysis %6.2f  filter+acc %6.2f"
				% (i, u.lmax, t_anal, t_tr))
			sys.stdout.flush()
		t0 = time.perf_counter()
		total = sync(uht.ainfo._unrect(total))
		t_fold = time.perf_counter() - t0
		t0 = time.perf_counter()
		omap = sync(uht.harm2map(total, spin=0))
		t_big_syn = time.perf_counter() - t0
		print("wave2map: fold %.2f s  big synthesis %.2f s" % (t_fold, t_big_syn))
		print("wave2map total %.1f s" % (time.perf_counter() - t_all2))
		print("TOTAL %.1f s" % (time.perf_counter() - t_all))
		sys.stdout.flush()
		omap = None


if __name__ == "__main__":
	main()
