#!/usr/bin/env python
"""On-chip timing of the curved-sky lensing pipeline (BASELINE config 4:
gradient-order lensing + aberration on a 0.5-arcmin ACT-like patch).

Stages timed separately (each is one or a few device dispatches; axon RPC
overhead ~28 ms is negligible at these sizes):
  1. SynthesisPlan build: coarse torus SHT + FFT + deconvolve + fine ifft
  2. per-band: deriv SHT (phi gradient) on the band rings
  3. per-band: geodesic offset (elementwise)
  4. per-band: plan.eval (the NUFFT point interpolation -- the suspected
     TPU bottleneck: per-point [w,w] gather)
Run ONE at a time on the chip.

    python scripts/bench_lensing.py [--lmax 3000] [--patch 10] [--res 0.5]
"""
import argparse
import os
import sys
import time
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(name, fn, *args, nrep=3):
	sys.stdout.flush()
	import jax.numpy as jnp
	# warmup/compile
	out = fn(*args)
	s = float(jnp.sum(jnp.abs(jnp.asarray(out[0] if isinstance(out, tuple) else out))))
	t0 = time.perf_counter()
	for i in range(nrep):
		out = fn(*args)
		s += float(jnp.sum(jnp.abs(jnp.asarray(out[0] if isinstance(out, tuple) else out))))
	dt = (time.perf_counter() - t0)/nrep
	print("%-38s %8.1f ms" % (name, dt*1e3))
	sys.stdout.flush()
	assert np.isfinite(s)
	return dt


def main():
	ap = argparse.ArgumentParser()
	ap.add_argument("--lmax", type=int, default=3000)
	ap.add_argument("--patch", type=float, default=10.0, help="patch size in deg")
	ap.add_argument("--res", type=float, default=0.5, help="arcmin")
	ap.add_argument("--ncomp", type=int, default=3)
	ap.add_argument("--full", action="store_true",
		help="also time the hot plan rebuild and the end-to-end pipeline")
	args = ap.parse_args()

	import jax
	import jax.numpy as jnp
	from pixell_tpu import enmap, curvedsky, lensing, utils

	print("backend:", jax.default_backend())
	lmax = args.lmax
	dtype = np.float32
	shape, wcs = enmap.geometry(pos=np.array([[-args.patch/2, args.patch/2],
		[args.patch/2, -args.patch/2]])*utils.degree,
		res=args.res*utils.arcmin, proj="car")
	shape = (args.ncomp,) + shape
	print("patch:", shape, "npix=%.1fM" % (np.prod(shape[-2:])/1e6))

	rng = np.random.default_rng(0)
	ps = np.zeros((4, 4, lmax+1))
	l = np.arange(lmax+1)
	cl = 1.0/(l + 10)**2
	ps[0, 0] = cl*1e-3      # phi
	ps[1, 1] = cl           # T
	ps[2, 2] = cl*0.1       # E
	ps[3, 3] = cl*0.01      # B
	t0 = time.perf_counter()
	phi_alm, cmb_alm = lensing.rand_alm(ps, lmax=lmax, dtype=dtype, seed=1)
	print("%-38s %8.1f ms" % ("rand_alm (host+device)",
		(time.perf_counter()-t0)*1e3))

	phi_alm = utils.to_device(phi_alm.astype(np.complex64))
	cmb_alm = utils.to_device(cmb_alm.astype(np.complex64))
	phi_ainfo = curvedsky.alm_info(lmax=lmax)

	# --- stage 1: plan build ---
	def build_plan():
		p = curvedsky.SynthesisPlan(cmb_alm, lmax=lmax, spin=(0, 2))
		return p.uplan.fine
	t0 = time.perf_counter()
	plan = curvedsky.SynthesisPlan(cmb_alm, lmax=lmax, spin=(0, 2))
	s = float(jnp.sum(jnp.abs(plan.uplan.fine[..., :2, :2])))
	print("%-38s %8.1f ms  (compile incl)" % ("SynthesisPlan build",
		(time.perf_counter()-t0)*1e3))
	print("  fine grid:", plan.uplan.fine.shape, plan.uplan.fine.dtype,
		"= %.2f GB" % (plan.uplan.fine.size*plan.uplan.fine.dtype.itemsize/1e9))
	sys.stdout.flush()
	# (no hot plan-rebuild stage: a second plan + its c64 torus transient
	# would double-book HBM at lmax 4000; the rebuild recompile issue it
	# probed is fixed by utils.cached_jit)

	# --- stage 2: band gradient SHT ---
	ny = shape[-2]
	bsize = min(ny, 1200)
	lshape, lwcs = enmap.slice_geometry(tuple(shape[-2:]), wcs,
		(slice(0, bsize), slice(None)))
	def grad_band():
		return jnp.asarray(curvedsky.alm2map(phi_alm,
			enmap.zeros((2,) + tuple(lshape[-2:]), lwcs, dtype),
			deriv=True, ainfo=phi_ainfo))
	timeit("band deriv SHT (%d rows)" % bsize, grad_band)
	grad = grad_band()

	# --- stage 3: offset (elementwise) ---
	pos = jnp.asarray(enmap.posmap(lshape, lwcs, safe=False))
	off = jax.jit(lambda g: lensing.offset_by_grad(pos, g, pol=True))
	timeit("offset_by_grad", off, grad)
	opos = off(grad)
	loc = jnp.stack([jnp.pi/2 - opos[0].reshape(-1),
		opos[1].reshape(-1) % (2*jnp.pi)], -1)
	print("  npt per band: %.2fM" % (loc.shape[0]/1e6))

	# --- stage 4: point eval ---
	evalf = lambda lc: plan.eval(lc)
	dt = timeit("plan.eval (NUFFT point interp)", evalf, loc)
	npt = loc.shape[0]
	print("  -> %.1f Mpt/s (x%d comps, w=%d)" % (npt/dt/1e6,
		int(np.prod(plan.pre)), plan.uplan.w))

	# --- full pipeline ---
	if not args.full:
		return
	# free the standalone plan: lens_map_curved builds its own, and two
	# resident fine grids + the c64 build transient exceed 16 GB at lmax 4000
	del plan, evalf
	nband = ny//bsize
	t0 = time.perf_counter()
	omap = lensing.lens_map_curved(shape=shape, wcs=wcs, phi_alm=phi_alm,
		cmb_alm=cmb_alm, dtype=dtype, spin=[0, 2], output="l",
		delta_theta=bsize*args.res*utils.arcmin)
	s = float(jnp.sum(jnp.abs(jnp.asarray(omap))))
	assert np.isfinite(s)
	print("%-38s %8.1f ms  (compile incl)" % ("lens_map_curved end-to-end",
		(time.perf_counter()-t0)*1e3))
	t0 = time.perf_counter()
	omap = lensing.lens_map_curved(shape=shape, wcs=wcs, phi_alm=phi_alm,
		cmb_alm=cmb_alm, dtype=dtype, spin=[0, 2], output="l",
		delta_theta=bsize*args.res*utils.arcmin)
	s = float(jnp.sum(jnp.abs(jnp.asarray(omap))))
	print("%-38s %8.1f ms" % ("lens_map_curved end-to-end (hot)",
		(time.perf_counter()-t0)*1e3))


if __name__ == "__main__":
	main()
