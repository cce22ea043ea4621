#!/usr/bin/env python
"""On-chip A/B of the MXU block-Legendre synthesis path vs pure stepwise.

Times the SHT-layer scalar synthesis at the given lmax on an asymmetric F1
ring set (the full-kernel path the blocked split targets), with the axon
fori-loop method (nrep chained executions inside one jit, fused scalar
fetch). Also reports max abs difference between the two paths.

    python scripts/bench_blockleg.py [--lmax 5000] [--nrep 4]
"""
import argparse, os, sys, time
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def main():
	ap = argparse.ArgumentParser()
	ap.add_argument("--lmax", type=int, default=5000)
	ap.add_argument("--nrep", type=int, default=4)
	ap.add_argument("--mode", type=str, default="scalar",
		help="scalar (C=2) or spin2 (C=4)")
	ap.add_argument("--anal", action="store_true",
		help="time the analysis direction instead of synthesis")
	ap.add_argument("--interpret", action="store_true")
	args = ap.parse_args()
	import jax, jax.numpy as jnp
	if args.interpret:
		jax.config.update("jax_platforms", "cpu")
	from pixell_tpu import sht
	from pixell_tpu.ops import sht_core, sht_pallas as sp
	lmax = args.lmax
	nt = 2*lmax + 2
	theta = np.asarray(sht.ring_theta("F1", nt), np.float64)
	nl = nm = lmax + 1
	C = {"scalar": 2, "spin2": 4}[args.mode]
	nfun = sht_core.NFUN[args.mode]
	rng = np.random.default_rng(0)
	# triangular support, modest values
	A = np.zeros((nl, nm, C), np.float32)
	mask = np.tril(np.ones((nl, nm), bool))
	A[mask] = rng.standard_normal((int(mask.sum()), C)).astype(np.float32)
	A_d = jnp.asarray(A)
	if args.anal:
		A_d = jnp.asarray(rng.standard_normal(
			(nfun, C, nm, nt)).astype(np.float32))
	tb = sp._pick_tb(nfun, C, nt=nt)
	start = sp._blk_start_table(theta, lmax, lmax, tb)
	nlb = -(-nl//sp.BLK_LB)
	print("eligible tile fraction: %.3f" % float((start < nlb).mean()))
	sys.stdout.flush()

	def run(tag):
		def step(a):
			if args.anal:
				return sp.analysis_scan_pallas_chunked(a, theta, lmax, lmax,
					mode=args.mode, interpret=args.interpret)
			G = sp.synthesis_scan_pallas(a, theta, lmax, lmax, mode=args.mode,
				interpret=args.interpret)
			return G
		f = jax.jit(lambda a: jnp.sum(jnp.abs(step(a))))
		t0 = time.time()
		s = float(f(A_d))  # compile+warm
		print("%s: compile+warm %.1f s (checksum %.6g)" % (tag, time.time()-t0, s))
		sys.stdout.flush()
		a2 = A_d + jnp.asarray(1.234e-5, jnp.float32)
		t0 = time.time()
		s2 = float(f(a2))
		dt = time.time() - t0
		print("%s: 1 exec %.1f ms" % (tag, dt*1e3))
		# loop method
		g = jax.jit(lambda a: jnp.sum(jnp.abs(jax.lax.fori_loop(
			0, args.nrep, lambda i, acc: acc + jnp.sum(jnp.abs(step(a + i*1e-6))), 0.0))))
		float(g(A_d))
		t0 = time.time()
		float(g(a2))
		dt = (time.time() - t0)/args.nrep
		print("%s: loop method %.1f ms/synthesis" % (tag, dt*1e3))
		sys.stdout.flush()
		return step

	sp.BLK_ENABLE = True
	step_blk = run("blocked ")
	G_blk = np.asarray(jax.jit(step_blk)(A_d))
	sp.BLK_ENABLE = False
	step_stp = run("stepwise")
	G_stp = np.asarray(jax.jit(step_stp)(A_d))
	sp.BLK_ENABLE = True
	d = np.abs(G_blk - G_stp).max()
	print("max abs diff blocked vs stepwise: %.3e (scale %.3e)"
		% (d, np.abs(G_stp).max()))

if __name__ == "__main__":
	main()
