#!/usr/bin/env python
"""A/B the two curved-lensing point-eval paths on chip at the BASELINE
config-4 geometry (1200x2400 IQU 0.5-arcmin patch, lmax 4000): the
gather-free rowband kernel (fft._u2nu_rowband_core: slab DMA + expansion
matmul + dense ES-weight contractions) vs the per-point block gather
(~1e8 gathered elements/s on TPU; measured 2.4 s per 1.44M-point band in
round 3). Times the warm end-to-end lens_map_curved and reports the max
abs difference between the two outputs.

    python scripts/bench_lensing_ab.py [--lmax 4000] [--quick]
"""
import argparse, os, sys, time
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def main():
	ap = argparse.ArgumentParser()
	ap.add_argument("--lmax", type=int, default=4000)
	ap.add_argument("--quick", action="store_true")
	args = ap.parse_args()
	import jax, jax.numpy as jnp
	from pixell_tpu import enmap, lensing, utils
	if args.quick:
		box, lmax = [[-2, 4], [2, -4]], 1000
	else:
		box, lmax = [[-5, 10], [5, -10]], args.lmax
	shape, wcs = enmap.geometry(pos=np.array(box)*utils.degree,
		res=0.5*utils.arcmin, proj="car")
	ps = np.zeros((4, 4, lmax+1), np.float64)
	l = np.arange(lmax+1)
	ps[0, 0] = 1e-8/np.maximum(l*(l+1), 1)**2
	ps[1, 1] = 1.0/np.maximum(l, 1)**2
	ps[2, 2] = 0.1/np.maximum(l, 1)**2
	ps[3, 3] = 0.01/np.maximum(l, 1)**2
	phi_alm, cmb_alm = lensing.rand_alm(ps, lmax=lmax, dtype=np.float64, seed=1)
	# device-resident alm (the TPU-native operating point): re-uploading
	# ~256 MB of host alm per call dominated the round-5 first A/B (18.1 s
	# rowband warm vs 2.0 s with device alm)
	phi_alm = utils.to_device(phi_alm.astype(np.complex64))
	cmb_alm = utils.to_device(cmb_alm.astype(np.complex64))
	outs = {}
	for mode in ["rowband", "gather"]:
		def run():
			res = lensing.lens_map_curved(shape=(3,) + shape, wcs=wcs,
				phi_alm=phi_alm, cmb_alm=cmb_alm, dtype=np.float32,
				delta_theta=2*utils.degree, point_eval=mode)
			m = res[0] if isinstance(res, (tuple, list)) else res
			s = float(jnp.sum(jnp.abs(jnp.asarray(m))))
			return m, s
		t0 = time.perf_counter()
		m, s = run()
		print("%-8s cold end-to-end %7.2f s (checksum %.6g)"
			% (mode, time.perf_counter()-t0, s))
		sys.stdout.flush()
		assert np.isfinite(s)
		t0 = time.perf_counter()
		m, s = run()
		print("%-8s warm end-to-end %7.2f s" % (mode, time.perf_counter()-t0))
		sys.stdout.flush()
		outs[mode] = np.asarray(m)
		m = None
	d = np.abs(outs["rowband"] - outs["gather"]).max()
	print("max abs diff rowband vs gather: %.3e (scale %.3e)"
		% (d, np.abs(outs["gather"]).max()))

if __name__ == "__main__":
	main()
