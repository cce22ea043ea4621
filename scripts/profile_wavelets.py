#!/usr/bin/env python
"""Stage table for BASELINE config 5 (wavelet decomposition at lmax 10000):
per-scale timings of map2wave (transfer_alm + hmul, harm2map synthesis,
offload fetch) and wave2map (upload, map2harm analysis, transfer/accumulate),
plus the initial big analysis and the final big synthesis. Every stage is
closed with block_until_ready/np.asarray so wall times are attributable.

    python scripts/profile_wavelets.py [--lmax 10000] [--quick]
"""
import argparse, os, sys, time
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
	ap = argparse.ArgumentParser()
	ap.add_argument("--lmax", type=int, default=10000)
	ap.add_argument("--quick", action="store_true")
	ap.add_argument("--cold", action="store_true",
		help="also print the cold (compile-inclusive) pass stage table")
	args = ap.parse_args()
	import jax, jax.numpy as jnp
	from pixell_tpu import enmap, curvedsky, wavelets, uharm, utils
	lmax = 1000 if args.quick else args.lmax
	res = np.pi/(lmax+1)
	shape, wcs = enmap.fullsky_geometry(res=res, variant="fejer1")
	print("map %s  lmax %d" % (shape, lmax)); sys.stdout.flush()
	rng = np.random.default_rng(0)
	# random band-limited map: cheap white map is fine for timing
	m = enmap.ndmap(jnp.asarray(rng.standard_normal(shape).astype(np.float32)),
		wcs)
	wt = wavelets.WaveletTransform((shape, wcs), basis=wavelets.ButterTrim())
	uht = wt.uht
	print("scales:", wt.nlevel, "offload:", wt._offload_now(m))
	print("scale lmaxs:", [u.lmax for u in wt.uhts])
	sys.stdout.flush()

	def sync(x):
		return jax.block_until_ready(x) if isinstance(x, jnp.ndarray) else x

	for phase in (["cold", "warm"] if args.cold else ["cold", "warm"]):
		print("== %s pass ==" % phase); sys.stdout.flush()
		t_all = time.perf_counter()
		# ---- map2wave, instrumented (mirrors WaveletTransform.map2wave) ----
		t0 = time.perf_counter()
		harm = sync(uht.map2harm(m, spin=0))
		t_big_anal = time.perf_counter() - t0
		print("map2wave: big analysis %.2f s" % t_big_anal); sys.stdout.flush()
		offload = wt._offload_now(m)
		outs = [None]*wt.basis.n
		for i in reversed(range(wt.basis.n)):
			u = wt.uhts[i]
			prof = wt.basis.kernel(i, np.arange(u.lmax+1, dtype=float))
			t0 = time.perf_counter()
			sub = curvedsky.transfer_alm(uht.ainfo, utils.to_device(harm),
				u.ainfo)
			sub = sync(u.hmul(prof, sub))
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
			print("  scale %d lmax %5d grid %s: transfer+hmul %6.2f  synth %6.2f  offload %6.2f"
				% (i, u.lmax, tuple(u.shape[-2:]), t_tr, t_syn, t_off))
			sys.stdout.flush()
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
			sub = u.hmul(prof, sub)
			big = curvedsky.transfer_alm(u.ainfo, utils.to_device(sub),
				uht.ainfo)
			total = sync(big if total is None else total + big)
			t_tr = time.perf_counter() - t0
			print("  scale %d lmax %5d: upload+analysis %6.2f  hmul+transfer+acc %6.2f"
				% (i, u.lmax, t_anal, t_tr))
			sys.stdout.flush()
		t0 = time.perf_counter()
		omap = sync(uht.harm2map(total, spin=0))
		t_big_syn = time.perf_counter() - t0
		print("wave2map: big synthesis %.2f s" % t_big_syn)
		print("wave2map total %.1f s" % (time.perf_counter() - t_all2))
		print("TOTAL %.1f s" % (time.perf_counter() - t_all))
		sys.stdout.flush()
		omap = None


if __name__ == "__main__":
	main()
