#!/usr/bin/env python
"""Independent f32 VPU ceiling microbenchmark (VERDICT r4 #9): a Pallas
kernel that runs nothing but independent FMA chains on VMEM-resident tiles,
so the measured ops/s is the vector unit's own ceiling, not a property of
the best SHT kernel. Replaces the near-circular "measured kernel ceiling"
constant in scripts/perf_anchors.py.

Design: G grid steps x U-way unrolled x = x*c + d chains on A independent
[8*SUB, 128*LANE] f32 accumulators (A independent registers hide the FMA
latency; multiple sublane/lane tiles give the compiler room to fill both
ALUs). 2 ops per FMA element. The chain result is written out so nothing
folds away.

    python scripts/vpu_peak.py [--reps 4]
"""
import argparse, os, sys, time
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
	ap = argparse.ArgumentParser()
	ap.add_argument("--reps", type=int, default=4)
	ap.add_argument("--interpret", action="store_true")
	args = ap.parse_args()
	import jax, jax.numpy as jnp
	from jax.experimental import pallas as pl
	from jax.experimental.pallas import tpu as pltpu

	SUB, LANE = 32, 4          # tile [256, 512] f32 = 512 KB
	A = 8                      # independent accumulators (latency hiding)
	U = 64                     # FMA steps per grid step per accumulator
	G = 512                    # grid steps
	shape = (8*SUB, 128*LANE)
	nelem = int(np.prod(shape))
	flops_call = 2.0*nelem*A*U*G

	def kern(x_ref, o_ref, acc):
		g = pl.program_id(0)
		@pl.when(g == 0)
		def _():
			acc[:] = x_ref[:]
		x = acc[:]
		accs = [x*(1.0 + 1e-7*i) for i in range(A)]
		c = jnp.float32(1.0 - 1e-9)
		d = x*jnp.float32(1e-9)
		for _ in range(U):
			for i in range(A):
				accs[i] = accs[i]*c + d
		s = accs[0]
		for i in range(1, A):
			s = s + accs[i]
		acc[:] = s*jnp.float32(1.0/A)
		@pl.when(g == G - 1)
		def _():
			o_ref[:] = acc[:]

	f = pl.pallas_call(
		kern,
		grid=(G,),
		in_specs=[pl.BlockSpec(shape, lambda g: (0, 0),
			memory_space=pltpu.VMEM)],
		out_specs=pl.BlockSpec(shape, lambda g: (0, 0),
			memory_space=pltpu.VMEM),
		out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
		scratch_shapes=[pltpu.VMEM(shape, jnp.float32)],
		interpret=args.interpret,
	)
	# loop-method timing per CLAUDE.md: fori_loop over the kernel inside ONE
	# jit + fused scalar fetch, so the ~28 ms axon RPC amortizes away
	NLOOP = 8
	@jax.jit
	def run(x):
		def body(i, y):
			return f(y)
		return jnp.sum(f(jax.lax.fori_loop(0, NLOOP - 1, body, x)))
	x = jnp.ones(shape, jnp.float32)
	print("device:", jax.devices()[0])
	t0 = time.perf_counter()
	float(run(x))
	print("compile+warm %.1f s" % (time.perf_counter() - t0))
	best = np.inf
	for r in range(args.reps):
		xr = x + jnp.float32(1e-6*(r + 1))    # fresh input: no axon replay
		t0 = time.perf_counter()
		float(run(xr))
		dt = time.perf_counter() - t0
		tput = flops_call*NLOOP/dt
		best = min(best, dt)
		print("rep %d: %.4f s -> %.3f Tops/s f32" % (r, dt, tput/1e12))
	print("VPU f32 ceiling: %.3f Tops/s (%.2e flop / %.4f s)"
		% (flops_call*NLOOP/best/1e12, flops_call*NLOOP, best))


if __name__ == "__main__":
	main()
