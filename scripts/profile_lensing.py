#!/usr/bin/env python
"""Stage breakdown of the config-4 lensing pipeline. Per CLAUDE.md, the ONLY
trustworthy timing method through the axon runtime is: one jitted program per
stage, FRESH inputs for the timed call (the runtime caches identical remote
executions), closed by a scalar reduction fused into the jit and fetched.
block_until_ready does NOT sync, so naive wall-clock staging under-measures.

Stages: gradient SHT; SynthesisPlan spectrum build (torus synthesis + fft2);
u2nu fine-grid build (deconvolve+pad+irfft, per field); end-to-end
lens_map_curved (eager-sum close); bands+glue = total - attributed.

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
	from pixell_tpu import enmap, lensing, curvedsky, aberration, utils, sht
	from pixell_tpu import fft as enfft
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
	ny, nx = int(shape[-2]), int(shape[-1])
	print("patch %dx%d lmax %d device %s" % (ny, nx, lmax, jax.devices()[0]))
	sys.stdout.flush()

	def timed(name, fn, *args_):
		"""fn jitted with fused scalar close; warm once, then time with
		perturbed (fresh) inputs so the axon execution cache cannot replay."""
		f = jax.jit(lambda *a: jnp.sum(jnp.abs(fn(*a)).astype(jnp.float32)))
		t0 = time.perf_counter()
		s = float(f(*args_))
		tc = time.perf_counter() - t0
		assert np.isfinite(s), name
		pert = tuple(a*(1 + 1e-6) if jnp.asarray(a).dtype.kind in "fc" else a
			for a in args_)
		t0 = time.perf_counter()
		s = float(f(*pert))
		dt = time.perf_counter() - t0
		print("%-28s %8.3f s   (cold %6.1f s)" % (name, dt, tc))
		sys.stdout.flush()
		return dt

	# ---- stage 1: gradient SHT (deriv synthesis onto the patch) ----
	omap0 = enmap.zeros((2, ny, nx), wcs, np.float32)
	t_grad = timed("grad SHT (deriv alm2map)",
		lambda a: jnp.asarray(curvedsky.alm2map(a, omap0, ainfo=phi_ainfo,
			deriv=True)), phi_alm)

	# ---- stage 2: plan spectrum build (torus synthesis + fft2) ----
	Nt = 2*enfft.fft_len(lmax + 2, "above")
	Np = 2*enfft.fft_len(lmax + 1, "above")
	thetas = np.arange(Nt//2 + 1)*2*np.pi/Nt
	spins = curvedsky._comp_spins([0, 2], 3)
	def build(a):
		grid = sht.synthesis(a, thetas, Np, phi0=0.0, lmax=lmax,
			mmax=lmax, spin=[0, 2], map_dtype=np.float32)
		mirror = grid[..., 1:(Nt - (Nt//2 + 1)) + 1, :][..., ::-1, :]
		mirror = jnp.roll(mirror, Np//2, axis=-1)
		sgn = jnp.asarray([(-1.0)**s for s in spins], np.float32)[:, None, None]
		torus = jnp.concatenate([grid, sgn*mirror], -2)
		flat = torus.reshape((-1, Nt, Np))
		return jnp.fft.fftn(flat, axes=(-2, -1))/(Nt*Np)
	t_spec = timed("plan spectrum (SHT+fft2)", build, cmb_alm)

	# ---- stage 3: fine-grid build (deconvolve+pad+irfft), one field x3 ----
	fgrid1 = jax.jit(build)(cmb_alm)[:1]
	epsilon = 1e-6
	w, beta = enfft._es_params(epsilon)
	sigma = 2
	nfy = enfft.fft_len(int(Nt*sigma), "above")
	nfx = enfft.fft_len(int(Np*sigma), "above")
	t_fine1 = timed("fine grid irfft (1 field)",
		lambda g: enfft._u2nu_fine_jit(g, (nfy, nfx), w, float(beta),
			False, True, True), fgrid1)
	print("  (x3 fields = %.3f s; fine %dx%d)" % (3*t_fine1, nfy, nfx))
	sys.stdout.flush()
	del fgrid1

	# ---- end-to-end (eager-sum close; sum compiles once) ----
	def total(pa, ca):
		res = lensing.lens_map_curved(shape=(3,) + shape, wcs=wcs,
			phi_alm=pa, cmb_alm=ca, dtype=np.float32,
			delta_theta=2*utils.degree, point_eval=args.point_eval)
		return float(jnp.sum(jnp.abs(jnp.asarray(res))))
	t0 = time.perf_counter(); s = total(phi_alm, cmb_alm)
	print("end-to-end cold             %8.2f s" % (time.perf_counter() - t0))
	sys.stdout.flush()
	pa = phi_alm*(1 + 1e-6); ca = cmb_alm*(1 + 1e-6)
	t0 = time.perf_counter(); s = total(pa, ca)
	t_tot = time.perf_counter() - t0
	print("end-to-end warm             %8.2f s" % t_tot)
	t_attr = t_grad + t_spec + 3*t_fine1
	print("bands + glue (residual)     %8.2f s" % (t_tot - t_attr))
	sys.stdout.flush()

	# ---- aberration (the other half of config 4) ----
	m3 = enmap.ndmap(jnp.zeros((3, ny, nx), jnp.float32), wcs)
	def ab(x):
		r = aberration.boost_map(enmap.ndmap(x, wcs), modulation=None)
		return jnp.asarray(r)
	x0 = jnp.asarray(np.random.default_rng(0).standard_normal(
		(3, ny, nx)).astype(np.float32))
	t0 = time.perf_counter()
	r = aberration.boost_map(enmap.ndmap(x0, wcs), modulation=None)
	s = float(jnp.sum(jnp.abs(jnp.asarray(r))))
	print("aberration cold             %8.2f s" % (time.perf_counter() - t0))
	x1 = x0*(1 + 1e-6)
	t0 = time.perf_counter()
	r = aberration.boost_map(enmap.ndmap(x1, wcs), modulation=None)
	s = float(jnp.sum(jnp.abs(jnp.asarray(r))))
	print("aberration warm             %8.2f s" % (time.perf_counter() - t0))


if __name__ == "__main__":
	main()
