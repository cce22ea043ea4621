#!/usr/bin/env python
"""Stage breakdown of the config-4 lensing pipeline (warm): gradient SHT,
SynthesisPlan build (fine torus grid), band loop, aberration. Uses the same
cached_jit keys as lens_map_curved, so the standalone stage timings reflect
the warm in-pipeline cost; bands = total - grad - plan.

    python scripts/profile_lensing.py [--lmax 4000] [--quick]
"""
import argparse, os, sys, time
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
	ap = argparse.ArgumentParser()
	ap.add_argument("--lmax", type=int, default=4000)
	ap.add_argument("--quick", action="store_true")
	ap.add_argument("--point-eval", type=str, default="auto")
	args = ap.parse_args()
	import jax, jax.numpy as jnp
	from pixell_tpu import enmap, lensing, curvedsky, aberration, utils
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
	phi_alm = utils.to_device(phi_alm.astype(np.complex64))
	cmb_alm = utils.to_device(cmb_alm.astype(np.complex64))
	phi_ainfo = curvedsky.alm_info(nalm=phi_alm.shape[-1])
	cmb_ainfo = curvedsky.alm_info(nalm=cmb_alm.shape[-1])
	nband = [0]
	orig_band = lensing._lens_band_rowband
	orig_core = lensing._lens_band_core
	def wrap(f):
		def g(*a, **k):
			nband[0] += 1
			return f(*a, **k)
		return g
	lensing._lens_band_rowband = wrap(orig_band)
	lensing._lens_band_core = wrap(orig_core)

	def total():
		res = lensing.lens_map_curved(shape=(3,) + shape, wcs=wcs,
			phi_alm=phi_alm, cmb_alm=cmb_alm, dtype=np.float32,
			delta_theta=2*utils.degree, point_eval=args.point_eval)
		return jax.block_until_ready(jnp.asarray(res))
	t0 = time.perf_counter(); m = total()
	print("cold total       %7.2f s" % (time.perf_counter() - t0))
	sys.stdout.flush()
	nband[0] = 0
	t0 = time.perf_counter(); m = total()
	t_tot = time.perf_counter() - t0
	print("warm total       %7.2f s  (%d band dispatches)" % (t_tot, nband[0]))
	sys.stdout.flush()

	# stage: gradient SHT (same cached_jit key as inside the pipeline)
	ny, nx = shape[-2:]
	from pixell_tpu import wcsutils
	def synth_key(pshape, kw, a):
		return ("lensing.synth", tuple(pshape), ny, nx,
			wcsutils.describe(wcs), np.dtype(np.float32).str,
			phi_ainfo.lmax, phi_ainfo.mmax, None,
			tuple(sorted((k, str(v)) for k, v in kw.items())),
			a.shape, str(a.dtype))
	kw = dict(deriv=True)
	fn = utils.cached_jit(synth_key((2,), kw, phi_alm),
		lambda: (lambda al: jnp.asarray(curvedsky.alm2map(al,
			enmap.zeros((2, ny, nx), wcs, np.float32),
			ainfo=phi_ainfo, mesh=None, **kw))))
	jax.block_until_ready(fn(phi_alm))
	t0 = time.perf_counter()
	jax.block_until_ready(fn(phi_alm))
	t_grad = time.perf_counter() - t0
	print("grad SHT         %7.2f s" % t_grad)
	sys.stdout.flush()

	# stage: SynthesisPlan build (fine torus grid)
	p = curvedsky.SynthesisPlan(cmb_alm, lmax=cmb_ainfo.lmax, spin=[0, 2])
	jax.block_until_ready(p.uplan.fine)
	t0 = time.perf_counter()
	p = curvedsky.SynthesisPlan(cmb_alm, lmax=cmb_ainfo.lmax, spin=[0, 2])
	jax.block_until_ready(p.uplan.fine)
	t_plan = time.perf_counter() - t0
	nf = tuple(int(x) for x in p.uplan.nfine)
	print("plan build       %7.2f s  (fine grid %s, %.2f GB)"
		% (t_plan, nf, np.prod((3,) + nf)*4/1e9))
	print("bands (residual) %7.2f s" % (t_tot - t_grad - t_plan))
	sys.stdout.flush()

	# stage: aberration (the other half of config 4)
	lensed = enmap.ndmap(m, wcs)
	ab = aberration.boost_map(lensed, modulation=None)
	s = float(jnp.sum(jnp.abs(jnp.asarray(ab))))
	t0 = time.perf_counter()
	ab = aberration.boost_map(lensed, modulation=None)
	s = float(jnp.sum(jnp.abs(jnp.asarray(ab))))
	print("aberration       %7.2f s" % (time.perf_counter() - t0))


if __name__ == "__main__":
	main()
