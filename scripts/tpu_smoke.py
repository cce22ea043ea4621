"""Real-TPU compile smoke test.

AOT-lowers-and-compiles every Pallas SHT code path for the actual TPU target
(no interpret mode), closing the blind spot where interpret-only tests let a
Mosaic-incompatible kernel ship (round 1: the alm packer compiled in
interpret mode but was rejected by Mosaic on hardware, breaking map2alm on
TPU entirely).

Covered (via the public sht/curvedsky API so dispatch logic is exercised):
  - hemisphere-symmetric synthesis/analysis kernels (fullsky F1, nt <= 3072)
  - full (asymmetric-ring) kernels, scalar + spin modes
  - the polar double-single overwrite pass (rings near the poles)
  - chunked analysis (nt > TCHUNK)
  - alm pack/unpack (rect2alm fold / alm2rect shear)
  - the end-to-end curvedsky map2alm+alm2map roundtrip at lmax 750 and
    (unless --quick) lmax 5000

Run on the chip (JAX_PLATFORMS=axon) before every end-of-round snapshot:
    python scripts/tpu_smoke.py [--quick]
Exits 0 iff everything compiles.
"""
import argparse
import os
import sys
import time
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def compile_ok(name, make, _retry=True):
	"""make() -> (fn, args). Lower + compile for the real backend.
	Transient remote-compile tunnel errors (truncated HTTP bodies on the
	longest programs) are retried once: a real Mosaic rejection reproduces,
	a flake does not (seen: lmax-10000 synthesis failed with 'response body
	closed before all bytes were read', then compiled clean in 236 s)."""
	import jax
	t0 = time.time()
	try:
		fn, args = make()
		jax.jit(fn).lower(*args).compile()
	except Exception as e:
		msg = str(e)
		transient = ("remote_compile" in msg or "read body" in msg
			or "DEADLINE_EXCEEDED" in msg or "UNAVAILABLE" in msg)
		if transient and _retry:
			print("warn %-34s transient tunnel error, retrying: %s"
				% (name, msg[:120]))
			sys.stdout.flush()
			return compile_ok(name, make, _retry=False)
		i = msg.find("Mosaic")
		print("FAIL %-34s %s" % (name, msg[i:i+300] if i >= 0 else msg[:300]))
		return False
	print("ok   %-34s %5.1f s" % (name, time.time() - t0))
	return True


def main():
	ap = argparse.ArgumentParser()
	ap.add_argument("--quick", action="store_true",
		help="skip the lmax-5000 configs (several minutes of compile)")
	ap.add_argument("--no-cache", action="store_true",
		help="disable the persistent compilation cache (on by default so "
		"repeat smokes only pay for programs whose code actually changed)")
	args = ap.parse_args()

	import jax
	import jax.numpy as jnp
	from pixell_tpu import sht, curvedsky, enmap, utils
	if not args.no_cache:
		from pixell_tpu import device
		device.enable_compilation_cache()

	print("backend:", jax.default_backend())
	f32 = np.float32
	checks = []

	# --- fullsky F1 at lmax 750: sym kernels + polar DS pass, spin 0+2,
	#     through the full curvedsky glue (the bench path) ---
	def mk_roundtrip(lmax, res_arcmin):
		shape, wcs = enmap.fullsky_geometry(res=res_arcmin*utils.arcmin,
			variant="fejer1")
		ainfo = curvedsky.alm_info(lmax=lmax)
		def fn(arr):
			m = enmap.ndmap(arr, wcs)
			alm = curvedsky.map2alm(m, lmax=lmax, spin=[0])
			omap = curvedsky.alm2map(alm, enmap.ndmap(jnp.zeros(shape, f32), wcs),
				spin=[0], ainfo=ainfo)
			return jnp.asarray(omap)
		return fn, (jnp.zeros(shape, f32),)
	checks.append(("roundtrip lmax750 f1", lambda: mk_roundtrip(750, 12)))

	# --- spin-2 sym kernels on the same geometry ---
	def mk_spin2():
		lmax = 750
		nt, nphi = 900, 1800
		theta = jnp.asarray(sht.ring_theta("F1", nt), f32)
		weights = jnp.asarray(sht.ring_weights("F1", nt), f32)
		def fn(maps):
			alm = sht.analysis(maps, theta, lmax, weights, spin=(0, 2))
			return sht.synthesis(alm, theta, nphi, lmax=lmax, spin=(0, 2),
				map_dtype=f32)
		return fn, (jnp.zeros((3, nt, nphi), f32),)
	checks.append(("spin0+2 sym lmax750", mk_spin2))

	# --- asymmetric rings: full (non-sym) kernels ---
	def mk_full():
		lmax = 750
		nt, nphi = 300, 1600
		theta = np.linspace(0.3, 1.1, nt)  # no south mirror -> full kernel
		w = np.full(nt, np.pi/nt)
		thj, wj = jnp.asarray(theta, f32), jnp.asarray(w, f32)
		def fn(maps):
			alm = sht.analysis(maps, thj, lmax, wj, spin=(0,))
			return sht.synthesis(alm, thj, nphi, lmax=lmax, spin=(0,),
				map_dtype=f32)
		return fn, (jnp.zeros((1, nt, nphi), f32),)
	checks.append(("asym full kernels lmax750", mk_full))

	# --- asymmetric rings, spin 0+2 (full kernels, spin modes) ---
	def mk_full_spin2():
		lmax = 750
		nt, nphi = 300, 1600
		theta = np.linspace(0.3, 1.1, nt)
		w = np.full(nt, np.pi/nt)
		thj, wj = jnp.asarray(theta, f32), jnp.asarray(w, f32)
		def fn(maps):
			alm = sht.analysis(maps, thj, lmax, wj, spin=(0, 2))
			return sht.synthesis(alm, thj, nphi, lmax=lmax, spin=(0, 2),
				map_dtype=f32)
		return fn, (jnp.zeros((3, nt, nphi), f32),)
	checks.append(("asym spin0+2 lmax750", mk_full_spin2))

	# --- chunked analysis: asymmetric nt > TCHUNK ---
	def mk_chunked():
		from pixell_tpu.ops import sht_pallas
		lmax = 300
		nt = sht_pallas.TCHUNK + 40
		nphi = 700
		theta = np.linspace(0.2, 2.0, nt)
		w = np.full(nt, np.pi/nt)
		thj, wj = jnp.asarray(theta, f32), jnp.asarray(w, f32)
		def fn(maps):
			return sht.analysis(maps, thj, lmax, wj, spin=(0,))
		return fn, (jnp.zeros((1, nt, nphi), f32),)
	checks.append(("chunked analysis nt>TCHUNK", mk_chunked))

	# --- general spin (Wigner-d kernels, mode="wigner", both branches) ---
	def mk_wigner():
		lmax = 400
		nt, nphi = 2*lmax+2, 2*lmax+4
		theta = jnp.asarray(sht.ring_theta("F1", nt), f32)
		w = jnp.asarray(sht.ring_weights("F1", nt), f32)
		def fn(maps):
			alm = sht.analysis(maps, theta, lmax, w, spin=(3,))
			return sht.synthesis(alm, theta, nphi, lmax=lmax, spin=(3,),
				map_dtype=f32)
		return fn, (jnp.zeros((2, nt, nphi), f32),)
	checks.append(("general spin-3 wigner kernels", mk_wigner))

	# --- alm pack/unpack at lmax 5000 shapes (pure XLA, cheap) ---
	def mk_pack():
		lmax = 5000
		n = sht.nalm(lmax)
		def fn(a):
			rect = sht.alm2rect(a, lmax)
			return sht.rect2alm(rect, lmax)
		return fn, (jnp.zeros(n, f32),)
	checks.append(("alm pack/unpack lmax5000", mk_pack))

	if not args.quick:
		# --- the lmax-5000 north-star roundtrip (full kernels: nt > 3072) ---
		checks.append(("roundtrip lmax5000 f1",
			lambda: mk_roundtrip(5000, 180*60/5004)))

		# --- spin-2 IQU at lmax 5000: spin modes + VMEM-shrunken theta
		#     tiles (_pick_tb) at an extent the fast tests never reach ---
		def mk_spin2_5000():
			lmax = 5000
			nt, nphi = 2*lmax+2, 2*lmax+4
			theta = jnp.asarray(sht.ring_theta("F1", nt), f32)
			w = jnp.asarray(sht.ring_weights("F1", nt), f32)
			def fn(maps):
				alm = sht.analysis(maps, theta, lmax, w, spin=(0, 2))
				return sht.synthesis(alm, theta, nphi, lmax=lmax, spin=(0, 2),
					map_dtype=f32)
			return fn, (jnp.zeros((3, nt, nphi), f32),)
		checks.append(("spin0+2 lmax5000", mk_spin2_5000))

		# --- config-5-sized wavelet scale: the lmax-10000 synthesis that the
		#     largest ButterTrim band dispatches (wave2map's heaviest kernel) ---
		def mk_wavelet_scale():
			lmax = 10000
			nt, nphi = 2*lmax+2, 2*lmax+4
			theta = jnp.asarray(sht.ring_theta("F1", nt), f32)
			n = sht.nalm(lmax)
			def fn(ar, ai):
				# split re/im args: complex arrays cannot cross the axon
				# host<->device boundary
				a = jax.lax.complex(ar, ai)
				return sht.synthesis(a, theta, nphi, lmax=lmax, spin=(0,),
					map_dtype=f32)
			return fn, (jnp.zeros((1, n), f32), jnp.zeros((1, n), f32))
		checks.append(("wavelet-scale synthesis lmax10000", mk_wavelet_scale))

		# --- MXU block-Legendre split (scalar + spin2): stepwise prefix with
		#     state dump + block kernels, at a production-shaped lmax. LAST:
		#     the flag stays on for the rest of the process. ---
		def mk_blocked():
			from pixell_tpu.ops import sht_pallas
			sht_pallas.BLK_ENABLE = True
			lmax = 2000
			nt, nphi = 2*lmax+2, 2*lmax+4
			theta = jnp.asarray(sht.ring_theta("F1", nt), f32)
			w = jnp.asarray(sht.ring_weights("F1", nt), f32)
			def fn(maps):
				alm = sht.analysis(maps, theta, lmax, w, spin=(0, 2))
				return sht.synthesis(alm, theta, nphi, lmax=lmax, spin=(0, 2),
					map_dtype=f32)
			return fn, (jnp.zeros((3, nt, nphi), f32),)
		checks.append(("MXU blocked scalar+spin2 lmax2000", mk_blocked))

		# --- MXU blocked deriv + spin1 streams (BLK_STREAM_MODES): distinct
		#     coefficient-stream kernels the scalar/spin2 check never lowers ---
		def mk_blocked_der_s1():
			from pixell_tpu.ops import sht_pallas
			sht_pallas.BLK_ENABLE = True
			lmax = 2000
			nt, nphi = 2*lmax+2, 2*lmax+4
			theta = jnp.asarray(sht.ring_theta("F1", nt), f32)
			w = jnp.asarray(sht.ring_weights("F1", nt), f32)
			n = sht.nalm(lmax)
			def fn(ar, ai, maps):
				a = jax.lax.complex(ar, ai)
				der = sht.synthesis(a, theta, nphi, lmax=lmax, spin=(0,),
					deriv=True, map_dtype=f32)
				alm1 = sht.analysis(maps, theta, lmax, w, spin=(1,))
				m1 = sht.synthesis(alm1, theta, nphi, lmax=lmax, spin=(1,),
					map_dtype=f32)
				return der, m1
			return fn, (jnp.zeros((1, n), f32), jnp.zeros((1, n), f32),
				jnp.zeros((2, nt, nphi), f32))
		checks.append(("MXU blocked deriv+spin1 lmax2000", mk_blocked_der_s1))

	nfail = 0
	for name, make in checks:
		if not compile_ok(name, make):
			nfail += 1
	if nfail:
		print("TPU SMOKE: %d FAILURES" % nfail)
		sys.exit(1)
	print("TPU SMOKE: all compiled")


if __name__ == "__main__":
	main()
