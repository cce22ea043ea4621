#!/usr/bin/env python
"""Stage-by-stage on-chip profile of the headline SHT roundtrip
(bench.py config: lmax 750, 900x1800 fejer1 full-sky CAR, f32, spin 0).

Each stage is timed with the fori-loop method (CLAUDE.md): nrep chained
executions inside ONE jit, input perturbed per step so the axon execution
cache cannot replay, output folded into a scalar accumulator that is
fetched (fused) to close the timing. The per-stage reduce adds a full read
of the stage output (~MBs here, tens of us) -- negligible at ms scale.

    python scripts/profile_roundtrip.py [--lmax 750] [--nrep 50]
"""
import argparse
import json
import os
import sys
import time
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(stage, x0, nrep, name):
	import jax
	import jax.numpy as jnp

	def perturb(x, i):
		if jnp.iscomplexobj(x):
			return x*(1.0 + 1e-7*i.astype(x.real.dtype)).astype(x.dtype)
		return x*(1.0 + 1e-7*i.astype(x.dtype))

	def creduce(y):
		if jnp.iscomplexobj(y):
			return jnp.sum(jnp.abs(y.real)) + jnp.sum(jnp.abs(y.imag))
		return jnp.sum(jnp.abs(y.astype(jnp.float32)))

	import jax
	@jax.jit
	def run(x):
		def body(i, carry):
			acc = carry
			y = stage(perturb(x, i))
			return acc + creduce(y)
		return jax.lax.fori_loop(0, nrep, body, jnp.float32(0))

	s = run(x0)
	assert bool(np.isfinite(float(s))), name
	x1 = perturb(x0, jnp.int32(3))
	t0 = time.perf_counter()
	s = run(x1)
	ok = np.isfinite(float(s))
	t1 = time.perf_counter()
	assert ok, name
	dt = (t1 - t0)/nrep
	print(json.dumps(dict(stage=name, ms=round(dt*1e3, 4))), flush=True)
	return dt


def main():
	ap = argparse.ArgumentParser()
	ap.add_argument("--lmax", type=int, default=750)
	ap.add_argument("--nrep", type=int, default=50)
	args = ap.parse_args()
	import jax
	import jax.numpy as jnp
	from pixell_tpu import enmap, curvedsky, utils, sht
	from pixell_tpu import fft as enfft
	print("# device:", jax.devices()[0], file=sys.stderr)

	lmax = args.lmax
	# 12 arcmin at lmax 750 (the bench.py 900x1800 grid), scaled with lmax
	shape, wcs = enmap.fullsky_geometry(res=12*utils.arcmin*(750.0/lmax),
		variant="fejer1")
	dtype = np.float32
	ainfo = curvedsky.alm_info(lmax=lmax)
	minfo = curvedsky.analyse_geometry(shape, wcs)
	print("# shape", shape, "case", minfo.case, "ypad", tuple(minfo.ypad),
		"flip", tuple(minfo.flip), file=sys.stderr)
	rng = np.random.default_rng(0)
	arr = jnp.asarray(rng.standard_normal(shape).astype(dtype))
	m = enmap.ndmap(arr, wcs)
	nrep = args.nrep

	# ---- whole-public-API stages ----
	omap0 = enmap.ndmap(jnp.zeros(shape, dtype), wcs)
	def full_roundtrip(a):
		alm = curvedsky.map2alm(enmap.ndmap(a, wcs), lmax=lmax, spin=[0])
		return jnp.asarray(curvedsky.alm2map(alm, omap0, spin=[0], ainfo=ainfo))
	timed(full_roundtrip, arr, nrep, "roundtrip_total")
	def f_map2alm(a):
		return curvedsky.map2alm(enmap.ndmap(a, wcs), lmax=lmax, spin=[0])
	timed(f_map2alm, arr, nrep, "map2alm_total")
	alm0 = jax.jit(f_map2alm)(arr)
	def f_alm2map(al):
		return jnp.asarray(curvedsky.alm2map(al, omap0, spin=[0], ainfo=ainfo))
	timed(f_alm2map, alm0, nrep, "alm2map_total")

	# ---- analysis sub-stages (mirrors curvedsky._analysis_linear 2d path) ----
	theta = np.asarray(minfo.theta)
	nt = len(theta)
	nphi = minfo.nphi
	phi0 = minfo.phi0
	need = 2*lmax + 1
	ntfull = nt + minfo.ypad[0] + minfo.ypad[1]

	from pixell_tpu.curvedsky import _to_rings, _from_rings
	timed(lambda a: _to_rings(a, minfo), arr, nrep, "anal.to_rings")
	d2 = jax.jit(lambda a: _to_rings(a, minfo)[None])(arr)
	timed(lambda d: sht.ring_analysis(d, phi0, ainfo.mmax+1), d2, nrep,
		"anal.ring_fft")
	F = jax.jit(lambda d: sht.ring_analysis(d, phi0, ainfo.mmax+1))(d2)
	if minfo.ypad[0] or minfo.ypad[1]:
		pad = [(0, 0)]*(F.ndim-1) + [(int(minfo.ypad[0]), int(minfo.ypad[1]))]
		F = jnp.pad(F, pad)
	if need > ntfull:
		ntu = enfft.fft_len(need + 2, direction="above")
		timed(lambda Fx: sht.resample_theta_phase(Fx, minfo.variant, ntu, (0,)),
			F, nrep, "anal.theta_resample_%d_to_%d" % (ntfull, ntu))
		Fu = jax.jit(lambda Fx: sht.resample_theta_phase(
			Fx, minfo.variant, ntu, (0,)))(F)
		ntfull = ntu
	else:
		Fu = F
	theta_f = sht.ring_theta(minfo.variant, ntfull)
	w = jnp.asarray(sht.ring_weights(minfo.variant, ntfull))
	timed(lambda Fx: sht.analysis_phase(Fx, theta_f, lmax, w, nphi,
		mmax=ainfo.mmax, spin=[0]), Fu, nrep, "anal.quad+legendre+pack")
	# split: quadrature-weighted transpose without the triangular pack
	timed(lambda Fx: sht.adjoint_synthesis_phase(Fx*(w*(2*np.pi/nphi)),
		theta_f, lmax, mmax=ainfo.mmax, spin=[0], rect_out=True,
		m_degeneracy=False), Fu, nrep, "anal.quad+legendre(rect)")
	rect = jax.jit(lambda Fx: sht.adjoint_synthesis_phase(Fx*(w*(2*np.pi/nphi)),
		theta_f, lmax, mmax=ainfo.mmax, spin=[0], rect_out=True,
		m_degeneracy=False))(Fu)
	timed(lambda r: sht.rect2alm(r, lmax, ainfo.mmax), rect, nrep,
		"anal.rect2alm_pack")

	# ---- synthesis sub-stages ----
	alm2 = alm0 if alm0.ndim > 1 else alm0[None]
	timed(lambda a: sht.alm2rect(a, lmax, ainfo.mmax), alm2, nrep,
		"synth.alm2rect_unpack")
	rect_s = jax.jit(lambda a: sht.alm2rect(a, lmax, ainfo.mmax))(alm2)
	timed(lambda r: sht.synthesis_rect(r, theta, nphi, phi0=phi0, lmax=lmax,
		mmax=ainfo.mmax, spin=[0], map_dtype=dtype), rect_s, nrep,
		"synth.legendre+ringfft")
	# split out the ring FFT: time the Legendre scan to phase coefs only
	from pixell_tpu.sht import _c2coef, _synth_scan, _coef2c, _leg_dtype
	A = jax.jit(lambda r: _c2coef(r))(rect_s)
	ldt = _leg_dtype(dtype)
	timed(lambda Ax: _synth_scan(Ax, sht._keep_theta(theta), lmax, ainfo.mmax,
		"scalar", ldt), A, nrep, "synth.legendre_scan")
	G = jax.jit(lambda Ax: _synth_scan(Ax, sht._keep_theta(theta), lmax,
		ainfo.mmax, "scalar", ldt))(A)
	Gc = jax.jit(lambda Gx: _coef2c(Gx, 1)[..., 0, :, :, :])(G)
	timed(lambda Gx: sht.ring_synthesis(Gx, phi0, nphi), Gc, nrep,
		"synth.ring_fft")
	mp = jax.jit(lambda Gx: sht.ring_synthesis(Gx, phi0, nphi))(Gc)
	timed(lambda d: _from_rings(d, minfo, shape[-1]), mp, nrep,
		"synth.from_rings")


if __name__ == "__main__":
	main()
