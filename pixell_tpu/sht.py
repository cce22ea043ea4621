"""Ring-based spherical harmonic transforms (geometry-agnostic engine).

Sits between the Legendre scan kernels (ops/sht_core.py) and the map-aware
API (curvedsky.py). Works on explicit iso-latitude ring grids:
maps are [..., nt, nphi] arrays with rings at colatitudes theta[nt], each
ring sampled at phi_j = phi0 + 2 pi j / nphi.

Replaces the ducc0 synthesis/analysis/adjoint entry points used by the
reference (pixell/curvedsky.py:900-1120). All four directions are provided:
  synthesis          alm -> map
  adjoint_synthesis  map -> alm   (transpose of synthesis, no weights)
  analysis           map -> alm   (adjoint_synthesis of quadrature-weighted map)
  adjoint_analysis   alm -> map   (transpose of analysis)
Exact quadrature weights for Clenshaw-Curtis ("CC") and Fejer-1 ("F1") ring
layouts are computed analytically via DCTs (reference relies on
ducc0.sht.experimental.get_gridweights, curvedsky.py:501).
"""
from __future__ import annotations
import contextlib
import functools
import numpy as np
import jax
import jax.numpy as jnp
from .ops import sht_core
from . import utils as _utils

# Kernel dispatch: on accelerators, float32 transforms use the Pallas kernel
# (l-loop in VMEM, O(lmax^2) HBM traffic); CPU and float64 use the jnp scan.
# Set to True/False to force, or "auto".
USE_PALLAS = "auto"

def _pallas_ok(dtype):
	if USE_PALLAS is False: return False
	import jax
	on_accel = jax.default_backend() != "cpu"
	if USE_PALLAS is True: return np.dtype(dtype) == np.float32
	return np.dtype(dtype) == np.float32 and on_accel

# Accuracy tier, scoped by the accuracy() context manager (set from the
# public curvedsky.alm2map/map2alm accuracy= keyword). False = default
# kernels (f32: fast recurrence + polar double-single pass, bulk error
# ~l*eps); True = FULL double-single recurrence (~10x the Legendre cost,
# f32 roundtrip error <= ~1e-5 even at lmax 5000). Read at trace time,
# so jit caching is keyed correctly through the explicit ds= kernel arg.
DS_ACCURACY = False

@contextlib.contextmanager
def accuracy(mode):
	"""Scope the SHT engine accuracy tier. mode: None (keep current),
	"fast"/"default" (standard kernels), or "high" (full double-single
	recurrence; on the f32 jnp-scan path this upgrades the Legendre
	recurrence to float64). Counterpart of the reference's accuracy
	ladder (reference curvedsky.py:262-265 niter, :1001-1003 epsilon)."""
	global DS_ACCURACY
	if mode not in (None, "fast", "default", "high"):
		raise ValueError("accuracy must be None, 'fast', 'default' or 'high'")
	old = DS_ACCURACY
	DS_ACCURACY = old if mode is None else (mode == "high")
	try: yield
	finally: DS_ACCURACY = old

@contextlib.contextmanager
def blocked(enable=True):
	"""Scope the MXU block-Legendre split (fast-tier scalar/spin2/deriv/
	spin1 kernels at lmax >= 1024): eligible oscillatory l-blocks evaluate
	as Chebyshev value series + one node->ring matmul on the MXU instead of
	stepwise VPU recurrence steps. Measured on v5e at lmax 5000: scalar
	synthesis 600 -> 468 ms at unchanged accuracy (max rel diff vs stepwise
	2e-5). OFF by default because the split kernels' first compile per
	geometry is several minutes on remote-compile runtimes; turn it on for
	production runs that reuse geometries:

	    with sht.blocked():
	        alm = curvedsky.map2alm(map, lmax=5000)
	"""
	from .ops import sht_pallas
	old = sht_pallas.BLK_ENABLE
	sht_pallas.BLK_ENABLE = bool(enable)
	try: yield
	finally: sht_pallas.BLK_ENABLE = old


def _core_dtype(dtype):
	"""jnp-scan recurrence dtype honoring the accuracy tier."""
	if DS_ACCURACY and np.dtype(dtype) == np.float32: return np.float64
	return dtype

def _synth_scan(A, theta, lmax, mmax, mode, dtype):
	if _pallas_ok(dtype):
		from .ops import sht_pallas
		return sht_pallas.synthesis_scan_pallas(A, theta, lmax, mmax, mode=mode,
			ds=True if DS_ACCURACY else None)
	return sht_core.synthesis_scan(A, theta, lmax, mmax, mode=mode,
		dtype=_core_dtype(dtype))

def _anal_scan(F, theta, lmax, mmax, mode, dtype):
	if _pallas_ok(dtype):
		from .ops import sht_pallas
		return sht_pallas.analysis_scan_pallas_chunked(F, theta, lmax, mmax,
			mode=mode, ds=True if DS_ACCURACY else None)
	return sht_core.analysis_scan(F, theta, lmax, mmax, mode=mode,
		dtype=_core_dtype(dtype))

def _wigner_synth_scan(A, theta, lmax, mmax, s, dtype):
	if _pallas_ok(dtype):
		from .ops import sht_pallas
		return sht_pallas.wigner_synthesis_scan_pallas(A, theta, lmax, mmax, s,
			ds=True if DS_ACCURACY else None)
	return sht_core.wigner_synthesis_scan(A, theta, lmax, mmax, s,
		dtype=_core_dtype(dtype))

def _wigner_anal_scan(F, theta, lmax, mmax, s, dtype):
	if _pallas_ok(dtype):
		from .ops import sht_pallas
		return sht_pallas.wigner_analysis_scan_pallas(F, theta, lmax, mmax, s,
			ds=True if DS_ACCURACY else None)
	return sht_core.wigner_analysis_scan(F, theta, lmax, mmax, s,
		dtype=_core_dtype(dtype))


# ---------------------------------------------------------------------------
# alm layout: triangular m-major (healpy-compatible), same as reference
# curvedsky.alm_info (curvedsky.py:409): index = m(2 lmax + 1 - m)/2 + l.
# ---------------------------------------------------------------------------
def nalm(lmax, mmax=None):
	if mmax is None: mmax = lmax
	return (mmax+1)*(2*lmax+2-mmax)//2

def nalm2lmax(n):
	return int((-1 + (1 + 8*n)**0.5)/2) - 1

def lm2ind(lmax, l, m):
	l = np.asarray(l); m = np.asarray(m)
	return m*(2*lmax+1-m)//2 + l

def _rect_indices(lmax, mmax):
	"""Gather indices [nl, nm] into a triangular alm array, plus validity mask."""
	l = np.arange(lmax+1)[:, None]
	m = np.arange(mmax+1)[None, :]
	valid = l >= m
	idx = np.where(valid, m*(2*lmax+1-m)//2 + l, 0)
	return idx, valid

def _tri_lm(lmax, mmax):
	"""(l, m) of each triangular index, computed with jnp iota (no
	large host constants baked into jitted programs)."""
	n = nalm(lmax, mmax)
	i = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
	# block m occupies flat indices [s(m), s(m+1)) with
	# s(m) = mstart(m) + m = m(2 lmax + 3 - m)/2; invert the quadratic.
	# disc fits int32 exactly for lmax < 23168 (tq^2 < 2^31), so computing it
	# in integers keeps this correct WITHOUT x64: small disc (near the
	# triangle tip, where the sqrt is sensitive) converts to f32 exactly, and
	# for large disc the f32 sqrt's absolute error is < tq*2^-24 << 1, both
	# well inside the +-1 corrections below. A plain f32 evaluation of
	# tq^2 - 8i loses up to ~8 ulps near the tip and can miss m by > 1.
	tq = 2*lmax + 3
	if tq >= 46341: raise ValueError("_tri_lm: lmax too large for int32 disc")
	def sblk(mm): return mm*(tq - mm)//2
	disc = (jnp.int32(tq*tq) - 8*i).astype(jnp.float32)
	m = jnp.floor((tq - jnp.sqrt(jnp.maximum(disc, 0.0)))/2).astype(jnp.int32)
	m = jnp.clip(m, 0, mmax)
	m = jnp.where((m < mmax) & (sblk(m+1) <= i), m+1, m)
	m = jnp.where(sblk(m) > i, m-1, m)
	l = i - sblk(m) + m
	return l, m

@functools.partial(jax.jit, static_argnames=("lmax", "mmax"))
def _tri_starts(lmax, mmax):
	"""Packed index of a(l=m, m) for each m (start of m's contiguous run)."""
	m = np.arange(mmax+1)
	return (m*(2*lmax+1-m)//2 + m).astype(np.int32)

def _pack_tri_fold(S, lmax, mmax):
	"""Sheared m-major rows S[..., nm, nl] (S[m, i] = rect[l=m+i, m], zeros
	for i >= nl-m) -> packed triangular [..., nalm].

	Pure-XLA recursive pairwise fold. At each level, rows hold the
	already-concatenated runs of 2^k original m-runs; row j's valid length is
	LINEAR in j: L(j) = A - B*j (initially A=nl, B=1). Merging pair
	(2j, 2j+1) places odd row j at in-pair offset L(2j) = A - 2Bj -- also
	linear in j -- so ONE left-pad by A + flat re-view at the LARGER pitch
	V = (W+A) + 2B (a "shear": element (j, c) of pitch-(W+A) rows lands at
	column c - 2Bj of pitch-V rows) aligns every odd row at once, and an add
	merges. New lengths: L'(j) = 2A - B - 4Bj, so (A, B) <- (2A - B, 4B).
	log2(nm) levels of pad/reshape/add: O(n log nm) pure-bandwidth work, no
	gathers or scatters (TPU gathers run ~100M elem/s; the XLA window
	scatter-add this replaces cost ~5 ms at lmax 750), and no Pallas (Mosaic
	DMA cannot write at unaligned dynamic lane offsets, which sank the
	row-DMA packer design).

	Zero-row padding (odd R) is appended at the END, so any row whose formula
	length exceeds its true data length is the last nonempty row at its
	level; offsets of earlier rows are unaffected and trailing junk is
	cropped by the final [:n] slice. All-zero rows may "bleed" across row
	windows under the shear; they only ever add zeros."""
	nl = lmax + 1; nm = mmax + 1
	n = nalm(lmax, mmax)
	bshape = S.shape[:-2]
	Bn = int(np.prod(bshape, dtype=int)) if bshape else 1
	X = jnp.asarray(S).reshape((Bn, nm, nl))
	# defensive: the invariant needs zeros beyond each row's valid run
	mi = jax.lax.broadcasted_iota(jnp.int32, (nm, nl), 0)
	ii = jax.lax.broadcasted_iota(jnp.int32, (nm, nl), 1)
	X = jnp.where(ii < nl - mi, X, 0)
	A, Bc, W, R = nl, 1, nl, nm
	while R > 1:
		if R % 2:
			X = jnp.pad(X, ((0, 0), (0, 1), (0, 0)))
			R += 1
		V = W + A + 2*Bc
		O1 = jnp.pad(X[:, 1::2, :], ((0, 0), (0, 0), (A, 0)))  # pitch W+A
		flat = O1.reshape(Bn, (R//2)*(W + A))
		Ov = jnp.pad(flat, ((0, 0), (0, (R//2)*V - flat.shape[1]))) \
			.reshape(Bn, R//2, V)                     # col A + c - 2Bj
		X = jnp.pad(X[:, 0::2, :], ((0, 0), (0, 0), (0, V - W))) + Ov
		A, Bc, W, R = 2*A - Bc, 4*Bc, V, R//2
	return X[:, 0, :n].reshape(bshape + (n,))

def _unpack_tri_fold(alm, lmax, mmax):
	"""Packed triangular [..., nalm] -> sheared m-major rows [..., nm, nl]
	(S[m, i] = a(l=m+i, m), zeros for i >= nl-m).

	Gather-free: the hand-written adjoint of _pack_tri_fold. The fold is a
	linear pad/reshape/add map whose action on the valid (masked) domain is
	a coefficient-1 selection onto the packed positions, so its adjoint is
	exactly the inverse placement. The adjoint of each level's
	  merged = pad(even, V-W) + shear(odd)
	sends the SAME cotangent to both branches -- even_cot = merged[:, :W],
	odd_cot = shear^T(merged) (the flat re-view at pitch W+A, then the
	fixed column-A window) -- with NO subtraction and NO masking: junk this
	creates flows down paths that terminate either in the entry mask's
	zeroed region or beyond the final [:n] crop, both of which have zero
	adjoint. (Two rejected variants, for the record: masking rows to the
	A - B*j formula length is WRONG -- the formula both over- and
	under-estimates true runs once padding rows enter the pairing -- and
	jax.linear_transpose of the fold is exact but transposes the strided
	even/odd slices into scatter-adds, which blew scoped VMEM at
	lmax 5000.)"""
	nl = lmax + 1; nm = mmax + 1
	n = nalm(lmax, mmax)
	bshape = alm.shape[:-1]
	Bn = int(np.prod(bshape, dtype=int)) if bshape else 1
	X = jnp.asarray(alm).reshape((Bn, n))
	# replay the forward level parameters
	levels = []
	A, Bc, W, R = nl, 1, nl, nm
	while R > 1:
		Rp = R + (R % 2)
		V = W + A + 2*Bc
		levels.append((A, W, R, Rp, V))
		A, Bc, W, R = 2*A - Bc, 4*Bc, V, Rp//2
	X = jnp.pad(X, ((0, 0), (0, W - n)))[:, None, :]     # [Bn, 1, W_top]
	for (A, W1, R, Rp, V) in reversed(levels):
		R2 = Rp//2
		flat = X.reshape(Bn, R2*V)[:, :R2*(W1 + A)]
		odd = flat.reshape(Bn, R2, W1 + A)[:, :, A:]     # [Bn, R2, W1]
		even = X[:, :, :W1]
		X = jnp.stack([even, odd], 2).reshape(Bn, Rp, W1)[:, :R]
	S = X.reshape(bshape + (nm, nl))
	# the entry mask (adjoint of the fold's defensive where): kills the
	# junk the unmasked adjoint flow deposits in the invalid region
	mi = jax.lax.broadcasted_iota(jnp.int32, (nm, nl), 0)
	ii = jax.lax.broadcasted_iota(jnp.int32, (nm, nl), 1)
	return jnp.where(ii < nl - mi, S, 0)


@functools.partial(jax.jit, static_argnames=("lmax", "mmax"))
def alm2rect(alm, lmax, mmax=None):
	"""Triangular alm [..., nalm] -> rectangular [..., nl, nm] (l-major).

	TPU-native fast path: elementwise gathers are very slow on TPU (~100M
	elem/s), so the sheared m-major rows S[m, i] = a(l=m+i, m) are
	recovered by the pure pad/reshape inverse fold (_unpack_tri_fold; the
	previous window-gather of nl-wide slices per run start measured 2.5 ms
	at lmax 750, ~half the synthesis glue), then unsheared with one more
	pad+reshape: padding rows to width nl+1 and re-viewing at width nl
	shifts row m right by exactly m. Junk lands only in the masked l<m
	region."""
	if mmax is None: mmax = lmax
	nl, nm = lmax+1, mmax+1
	alm = _utils.to_device(alm)
	if jnp.iscomplexobj(alm):
		# run the adjoint fold once over stacked re/im (see rect2alm)
		both = alm2rect(jnp.stack([alm.real, alm.imag]), lmax, mmax)
		return jax.lax.complex(both[0], both[1])
	S = _unpack_tri_fold(alm, lmax, mmax)            # [..., nm, nl]
	P = jnp.pad(S, [(0, 0)]*(S.ndim-1) + [(0, 1)])   # rows of width nl+1
	U = P.reshape(P.shape[:-2] + (-1,))[..., :nm*nl] \
		.reshape(P.shape[:-2] + (nm, nl))            # U[m, l] = a(l, m)
	rect = jnp.moveaxis(U, -2, -1)
	l = jax.lax.broadcasted_iota(jnp.int32, (nl, nm), 0)
	m = jax.lax.broadcasted_iota(jnp.int32, (nl, nm), 1)
	return jnp.where(l >= m, rect, 0)

@functools.partial(jax.jit, static_argnames=("lmax", "mmax"))
def rect2alm(rect, lmax, mmax=None):
	"""Rectangular [..., nl, nm] -> triangular [..., nalm].

	Inverse of alm2rect's shear trick: transpose to m-major, zero the l<m
	region, re-view rows at width nl+1 (shearing row m left by m, so valid
	data starts at column 0 and the tail reads the ZEROED invalid region of
	the next row), then compact the variable-length runs with the pairwise
	fold (_pack_tri_fold)."""
	if mmax is None: mmax = lmax
	nl, nm = lmax+1, mmax+1
	n = nalm(lmax, mmax)
	rect = jnp.asarray(rect)
	if jnp.iscomplexobj(rect):
		# axon cannot move complex across host<->device; keep re/im split.
		# Stacked on a leading batch axis, the fold runs ONCE (its ~30
		# pad/reshape passes are op-overhead-bound, so two sequential real
		# folds cost ~2x one double-batch fold)
		both = rect2alm(jnp.stack([rect.real, rect.imag]), lmax, mmax)
		return jax.lax.complex(both[0], both[1])
	U = jnp.moveaxis(rect, -1, -2)                   # [..., nm, nl]
	l = jax.lax.broadcasted_iota(jnp.int32, (nm, nl), 1)
	m = jax.lax.broadcasted_iota(jnp.int32, (nm, nl), 0)
	U = jnp.where(l >= m, U, 0)
	Uf = U.reshape(U.shape[:-2] + (-1,))
	P = jnp.pad(Uf, [(0, 0)]*(Uf.ndim-1) + [(0, nm)]) \
		.reshape(U.shape[:-2] + (nm, nl+1))
	S = P[..., :nl]                                  # S[m, i] = rect[m+i, m]
	return _pack_tri_fold(S, lmax, mmax)

def _pack_tri_scatter(S, lmax, mmax):
	"""Reference packer: XLA window scatter-add of the sheared rows (exact
	because invalid tails are zero). Slower than _pack_tri_fold on TPU
	(~5 ms at lmax 750); kept as an independent oracle for tests."""
	nl, nm = lmax+1, mmax+1
	n = nalm(lmax, mmax)
	starts = jnp.asarray(_tri_starts(lmax, mmax))[:, None]
	dn = jax.lax.ScatterDimensionNumbers(
		update_window_dims=(1,), inserted_window_dims=(),
		scatter_dims_to_operand_dims=(0,))
	def pack1(S1):
		out = _utils.czeros((n + nl,), S1.dtype)
		out = jax.lax.scatter_add(out, starts, S1, dn,
			indices_are_sorted=True, unique_indices=False)
		return out[:n]
	bshape = S.shape[:-2]
	flatS = S.reshape((-1, nm, nl))
	res = jax.vmap(pack1)(flatS)
	return res.reshape(bshape + (n,))

# ---------------------------------------------------------------------------
# Quadrature weights (host-side, cached)
# ---------------------------------------------------------------------------
@functools.lru_cache(maxsize=64)
def ring_weights(variant, n):
	"""Exact weights w[n] with sum_j w_j f(theta_j) = int_0^pi f sin(theta)
	dtheta for f any cosine polynomial of degree < n.
	variant "CC": theta_j = j pi/(n-1) (pole rings included);
	variant "F1": theta_j = (j+1/2) pi/n."""
	from scipy.fft import dct
	# I_k = int_0^pi cos(k theta) sin(theta) dtheta
	k = np.arange(n, dtype=np.float64)
	I = np.zeros(n)
	kk = k[k != 1]
	I[k != 1] = (1 + np.cos(kk*np.pi))/(1 - kk**2 + (kk == 1))
	variant = variant.upper()
	if variant in ["CC", "CLENSHAW-CURTIS"]:
		N = n - 1
		eps = np.ones(n); eps[0] = eps[-1] = 0.5
		y = eps*I
		s = (dct(y, type=1) + y[0] + np.where(k.astype(int) % 2 == 0, 1, -1)*y[-1])/2
		w = (2.0/N)*eps*s
		return w
	elif variant in ["F1", "FEJER1"]:
		w = dct(I, type=3)/n
		return w
	elif variant in ["F2", "FEJER2"]:
		# theta_j = (j+1) pi/(n+1): solve exactness with the DST-I-like basis
		# via the sine expansion: use the CC machinery on the extended grid
		theta = (np.arange(n)+1)*np.pi/(n+1)
		C = np.cos(np.outer(np.arange(n), theta))
		return np.linalg.lstsq(C, I, rcond=None)[0]
	else:
		raise ValueError("Unknown ring layout '%s'" % variant)

def ring_theta(variant, n):
	variant = variant.upper()
	if variant in ["CC", "CLENSHAW-CURTIS"]:
		return np.arange(n)*np.pi/(n-1)
	elif variant in ["F1", "FEJER1"]:
		return (np.arange(n)+0.5)*np.pi/n
	elif variant in ["F2", "FEJER2"]:
		return (np.arange(n)+1)*np.pi/(n+1)
	else:
		raise ValueError("Unknown ring layout '%s'" % variant)


# ---------------------------------------------------------------------------
# Ring FFT stage
# ---------------------------------------------------------------------------
def _cdtype(dtype):
	return np.complex64 if np.dtype(dtype) == np.float32 else np.complex128

def _keep_theta(theta):
	"""Preserve full theta precision down to the Legendre prep: concrete
	thetas stay host float64 (see sht_core._prepare_geom); tracers pass."""
	if isinstance(theta, jax.core.Tracer): return theta
	return np.asarray(theta, np.float64)

def _mul_i(z):
	"""i*z for complex z without materializing a host complex constant
	(eager-mode complex-constant transfer is unimplemented on some TPU
	runtimes; under jit this fuses to the same HLO as 1j*z)."""
	return jax.lax.complex(-z.imag, z.real)

def _phase_ramp(nm, phi0, rdt, sign):
	"""exp(sign*i*m*phi0) for m = 0..nm-1, evaluated host-side in float64
	and embedded as two REAL constant tables. At m ~ 1e4 a
	working-precision m*phi0 product carries ~1e-3 rad of phase error --
	it cancels in roundtrips but is a genuine one-way azimuthal pointing
	error. phi0 is static (a Python float) at every call site; the f64
	cos/sin keep full phase accuracy without promoting the spectrum to
	complex128, and the lax.complex recombine avoids materializing a
	complex host constant (untransferable on some TPU runtimes)."""
	ph = sign*np.arange(nm)*float(phi0)
	return jax.lax.complex(jnp.asarray(np.cos(ph), rdt),
		jnp.asarray(np.sin(ph), rdt))

# ---------------------------------------------------------------------------
# MXU ring-DFT: below this ring width the ring FFTs run as two real matmuls
# against device-generated cos/sin tables instead of jnp.fft. XLA's TPU FFT
# achieves only ~65 Gflop/s at small-to-mid sizes (measured: the 900x1800
# rfft costs 1.5 ms of a 12 ms lmax-750 roundtrip; a [900,1800]@[1800,751]
# HIGHEST-precision matmul pair is ~10 Gflop and runs on the MXU at tens of
# Tflop/s). Crossover vs the FFT's N log N is far above 4k columns; the gate
# stays conservative. f32 only (f64 matmuls are emulated on TPU).
# ---------------------------------------------------------------------------
DFT_MM_MAX_NPHI = 4200
_DFT_SPLIT = 128   # m = m1*_DFT_SPLIT + m0 angle split for the trig tables


def _dft_trig(nphi, nm, phi0, sign):
	"""Device [nm, nphi] tables C = cos(sign*m*phi_j), S = sin(sign*m*phi_j),
	phi_j = phi0 + 2 pi j/nphi, built by the angle-addition combine of two
	SMALL host-f64 tables (m = m1*K + m0): full f64 phase accuracy at
	m ~ 1e4 (a f32 m*phi product would carry ~1e-3 rad) without baking an
	O(nm*nphi) constant into the program (remote-compile payload limits)."""
	K = _DFT_SPLIT
	n1 = -(-nm//K)
	j = np.arange(nphi)*(2*np.pi/nphi) + float(phi0)
	a1 = float(sign)*np.outer(np.arange(n1)*K, j)     # [n1, nphi] f64
	a0 = float(sign)*np.outer(np.arange(K), j)        # [K, nphi] f64
	cA = jnp.asarray(np.cos(a1), jnp.float32)[:, None, :]
	sA = jnp.asarray(np.sin(a1), jnp.float32)[:, None, :]
	cB = jnp.asarray(np.cos(a0), jnp.float32)[None, :, :]
	sB = jnp.asarray(np.sin(a0), jnp.float32)[None, :, :]
	C = (cA*cB - sA*sB).reshape(n1*K, nphi)[:nm]
	S = (sA*cB + cA*sB).reshape(n1*K, nphi)[:nm]
	return C, S


# XLA expands an FFT whose length is not 2357-smooth into Bluestein chirp
# convolutions padded to the next power of two, and allocates that workspace
# for the WHOLE batch at once: a [10002, 20004] fullsky ring transform
# (20004 = 2^2*3*1667) wants ~10 GB of c64 scratch and OOMs a 16 GB chip.
# When the ring count nphi is user-fixed and hostile, run the FFT over row
# chunks (lax.map) so the scratch is bounded; smooth lengths are untouched.
FFT_CHUNK_BYTES = float(1 << 28)

def _fft_row_chunk(nphi, shape):
	"""Rows per chunk for a length-nphi FFT over shape[..., nt, *], or None
	if no chunking is needed (smooth length or small batch)."""
	from . import fft as _enfft
	if _enfft.fft_len(nphi, "above") == nphi: return None
	pre = int(np.prod(shape[:-2], dtype=np.int64)) if len(shape) > 2 else 1
	nt = int(shape[-2])
	work_row = (1 << int(np.ceil(np.log2(max(2*nphi, 2)))))*16*2
	if pre*nt*work_row <= FFT_CHUNK_BYTES: return None
	return max(64, int(FFT_CHUNK_BYTES//max(pre*work_row, 1)))

def _rows_chunked(fn, x, tc):
	"""Apply fn ([..., tc, n] -> [..., tc, n']) over row chunks of axis -2."""
	nt = x.shape[-2]
	if tc is None or nt <= tc: return fn(x)
	nchunk = -(-nt//tc)
	pad = nchunk*tc - nt
	xp = jnp.pad(x, [(0, 0)]*(x.ndim - 2) + [(0, pad), (0, 0)])
	xp = jnp.moveaxis(
		xp.reshape(xp.shape[:-2] + (nchunk, tc, xp.shape[-1])), -3, 0)
	out = jax.lax.map(fn, xp)
	out = jnp.moveaxis(out, 0, -3)
	out = out.reshape(out.shape[:-3] + (nchunk*tc, out.shape[-1]))
	return out[..., :nt, :]

@functools.partial(jax.jit, static_argnames=("phi0", "nphi"))
def ring_synthesis(G, phi0, nphi):
	"""G[..., nm, nt] complex -> map [..., nt, nphi]:
	map(t, j) = sum_{m=0}^{mmax} eps_m Re[G[m,t] e^{i m (phi0 + 2 pi j/nphi)}].
	Handles mmax >= nphi by aliasing m onto m mod nphi. phi0 is static."""
	G = jnp.asarray(G)
	nm = G.shape[-2]
	if (nm <= nphi//2 and nphi <= DFT_MM_MAX_NPHI
			and G.dtype == jnp.complex64):
		# MXU path: map[t,j] = G[0,t] + 2 sum_{m>0} Re(G[m,t] e^{i m phi_j})
		# as two real matmuls (phi0 folded into the tables; m_max < nphi/2 so
		# there is no Nyquist bin to special-case)
		C, S = _dft_trig(nphi, nm, phi0, +1)
		eps = jnp.asarray(np.where(np.arange(nm) == 0, 1.0, 2.0), jnp.float32)
		Gt = jnp.moveaxis(G, -2, -1)  # [..., nt, nm]
		Gr = Gt.real*eps
		Gi = Gt.imag*eps
		return (jnp.einsum("...tm,mj->...tj", Gr, C,
				precision=jax.lax.Precision.HIGHEST)
			- jnp.einsum("...tm,mj->...tj", Gi, S,
				precision=jax.lax.Precision.HIGHEST))
	Gp = G if float(phi0) == 0.0 else \
		G*_phase_ramp(nm, phi0, G.real.dtype, +1)[:, None]
	Gt = jnp.moveaxis(Gp, -2, -1)  # [..., nt, nm]
	if nm <= nphi//2:
		# fast path: no aliasing -- place m directly in the rfft half-spectrum
		g = _utils.czeros(G.shape[:-2] + (G.shape[-1], nphi//2 + 1), G.dtype)
		g = g.at[..., :nm].set(Gt)
		tc = _fft_row_chunk(nphi, g.shape)
		return _rows_chunked(
			lambda b: jnp.fft.irfft(b, n=nphi, axis=-1), g, tc)*nphi
	# aliasing-safe general path: build the full complex spectrum
	c = _utils.czeros(G.shape[:-2] + (G.shape[-1], nphi), G.dtype)
	mpos = np.arange(nm) % nphi
	mneg = (-np.arange(nm)) % nphi
	c = c.at[..., jnp.asarray(mpos)].add(Gt)
	# negative-m (conjugate) part; m=0 only counted once
	scale = jnp.asarray(np.where(np.arange(nm) == 0, 0.0, 1.0), G.real.dtype)
	c = c.at[..., jnp.asarray(mneg)].add(jnp.conj(Gt)*scale)
	tc = _fft_row_chunk(nphi, c.shape)
	return _rows_chunked(
		lambda b: jnp.fft.ifft(b, axis=-1).real, c, tc)*nphi

@functools.partial(jax.jit, static_argnames=("phi0", "nm"))
def ring_analysis(maps, phi0, nm):
	"""map [..., nt, nphi] -> F[..., nm, nt] with
	F[m, t] = sum_j map(t,j) e^{-i m phi_j}. phi0 is static."""
	maps = jnp.asarray(maps)
	nphi = maps.shape[-1]
	if (nm <= nphi//2 + 1 and nphi <= DFT_MM_MAX_NPHI
			and maps.dtype == jnp.float32):
		# MXU path: F[m,t] = sum_j map(t,j) e^{-i m phi_j} as two real
		# matmuls (a direct DFT: no Hermitian bookkeeping; phi0 folded in)
		C, S = _dft_trig(nphi, nm, phi0, -1)
		Fr = jnp.einsum("...tj,mj->...tm", maps, C,
			precision=jax.lax.Precision.HIGHEST)
		Fi = jnp.einsum("...tj,mj->...tm", maps, S,
			precision=jax.lax.Precision.HIGHEST)
		return jnp.moveaxis(jax.lax.complex(Fr, Fi), -1, -2)
	tc = _fft_row_chunk(nphi, maps.shape)
	if nm <= nphi//2 + 1:
		spec = _rows_chunked(
			lambda b: jnp.fft.rfft(b, axis=-1)[..., :nm], maps, tc)
		F = spec
	else:
		spec = _rows_chunked(  # sum_j map e^{-2pi i jk/nphi}
			lambda b: jnp.fft.fft(b, axis=-1), maps, tc)
		midx = np.arange(nm) % nphi
		F = spec[..., jnp.asarray(midx)]
	if float(phi0) != 0.0:
		F = F*_phase_ramp(nm, phi0, maps.dtype, -1)
	return jnp.moveaxis(F, -1, -2)


# ---------------------------------------------------------------------------
# complex <-> coefficient-stack helpers for the real-valued scan engine
# ---------------------------------------------------------------------------
def _c2coef(z):
	"""[..., K, nl, nm] complex -> [nl, nm, 2K] real (K component axis)."""
	r = jnp.stack([z.real, z.imag], -1)           # [..., K, nl, nm, 2]
	r = jnp.moveaxis(r, -4, -2)                    # [..., nl, nm, K, 2]
	return r.reshape(r.shape[:-2] + (-1,))         # [..., nl, nm, 2K]

def _coef2c(r, K):
	"""[..., C, nm, nt] real with C=2K -> [..., K, nm, nt] complex."""
	shp = r.shape
	r = r.reshape(shp[:-3] + (K, 2) + shp[-2:])
	return jax.lax.complex(r[..., 0, :, :], r[..., 1, :, :])


# ---------------------------------------------------------------------------
# Core transforms. alm: [..., ncomp, nalm] complex (triangular layout).
# maps: [..., ncomp, nt, nphi]. spin handled like the reference: the spin
# list consumes components (spin 0 -> 1 comp, else 2).
# ---------------------------------------------------------------------------
@functools.partial(jax.jit, static_argnames=("lmax", "mmax"))
def alm2coef(alm, lmax, mmax=None):
	"""Triangular complex alm [..., K, nalm] -> real coef rect
	[..., nl, nm, 2K] via the window-gather alm2rect (TPU-fast) plus the
	elementwise complex split. Jitted as ONE program: run eagerly, the
	~30-step fold enqueues ~30 full-size async intermediates whose buffers
	all stay live until their executions drain -- at lmax 10000 that
	transient pile-up (vs XLA's in-program buffer reuse) OOMed the chip."""
	if mmax is None: mmax = lmax
	alm = _utils.to_device(alm)
	rect = alm2rect(alm, lmax, mmax)    # [..., K, nl, nm]
	return _c2coef(rect)


def _spin_blocks(spin, ncomp):
	blocks = []
	i = 0; si = 0
	spins = np.atleast_1d(spin).astype(int)
	while i < ncomp:
		s = int(spins[min(si, len(spins)-1)])
		step = 1 if s == 0 else 2
		if i + step > ncomp: step, s = ncomp - i, 0
		blocks.append((s, i, i+step))
		i += step; si += 1
	return blocks

def _leg_dtype(dtype):
	"""Dtype for the Legendre recurrence: f64 unless explicitly f32 maps on a
	backend without fast f64. We keep f64 by default for accuracy."""
	return np.float64 if np.dtype(dtype) == np.float64 else np.float32


def synthesis(alm, theta, nphi, phi0=0.0, lmax=None, mmax=None, spin=(0, 2),
		deriv=False, map_dtype=None):
	"""alm [..., ncomp, nalm] -> map [..., ncomp, nt, nphi].
	If deriv, alm is [..., nalm] and output is [..., 2, nt, nphi] with
	(d/dtheta, d/dphi) derivatives of the scalar synthesis."""
	alm = _utils.to_device(alm)
	theta = _keep_theta(theta)
	if lmax is None: lmax = nalm2lmax(alm.shape[-1])
	if mmax is None: mmax = lmax
	rdt = np.float32 if alm.dtype == np.complex64 else np.float64
	if map_dtype is None: map_dtype = rdt
	ldt = _leg_dtype(map_dtype)
	if deriv:
		rect = alm2rect(alm, lmax, mmax)                     # [..., nl, nm]
		A = _c2coef(rect[..., None, :, :])                   # [..., nl, nm, 2]
		G = _synth_scan(A, theta, lmax, mmax, "deriv", ldt)
		Gc = _coef2c(G, 1)[..., 0, :, :]                     # [2(fun), nm, nt]
		G_s, G_dt = Gc[..., 0, :, :], Gc[..., 1, :, :]
		m = jnp.arange(mmax+1, dtype=ldt)[:, None]
		G_dp = _mul_i(m*G_s)
		mdt = ring_synthesis(jnp.stack([G_dt, G_dp], -3), phi0, nphi)
		return mdt.astype(map_dtype)
	ncomp = alm.shape[-2]
	outs = []
	for s, i1, i2 in _spin_blocks(spin, ncomp):
		sub = alm[..., i1:i2, :]
		if s == 0:
			A = alm2coef(sub, lmax, mmax)                    # [..., nl, nm, 2k]
			G = _synth_scan(A, theta, lmax, mmax, "scalar", ldt)
			Gc = _coef2c(G, i2-i1)[..., 0, :, :, :]          # [..., k, nm, nt]
			outs.append(ring_synthesis(Gc, phi0, nphi))
		else:
			A = alm2coef(sub, lmax, mmax)                    # [..., nl, nm, 4]
			if s <= 2:
				mode = "spin1" if s == 1 else "spin2"
				G = _synth_scan(A, theta, lmax, mmax, mode, ldt)
			else:
				# general spin via the Wigner-d recurrence engine
				G = _wigner_synth_scan(A, theta, lmax, mmax, s, ldt)
			Gc = _coef2c(G, 2)                               # [..., 2(fun), 2(EB), nm, nt]
			# (P1 + iP2) = -sum (a1 + i a2) sY;  (P1 - iP2) = -(-1)^s sum (a1 - i a2) -sY
			# both reduce to P1_m = -(w a1 + i x a2), P2_m = -(w a2 - i x a1)
			GE = Gc[..., 0, 0, :, :]; GB = Gc[..., 0, 1, :, :]
			XE = Gc[..., 1, 0, :, :]; XB = Gc[..., 1, 1, :, :]
			P1 = -(GE + _mul_i(XB))
			P2 = -(GB - _mul_i(XE))
			outs.append(ring_synthesis(jnp.stack([P1, P2], -3), phi0, nphi))
	return jnp.concatenate(outs, -3).astype(map_dtype)


def synthesis_rect(rect, theta, nphi, phi0=0.0, lmax=None, mmax=None,
		spin=(0, 2), map_dtype=None):
	"""Like synthesis, but from the rectangular complex representation
	rect [..., ncomp, nl, nm] (l-major, zero for l < m). Every downstream
	operation (Legendre scan, phase construction) is ELEMENTWISE in m, so a
	rect input sharded over its m axis runs with zero communication until
	the ring FFT -- the basis of the m-sharded distributed SHT
	(parallel/sht_dist.synthesis_dist_m)."""
	rect = jnp.asarray(rect)
	theta = _keep_theta(theta)
	if lmax is None: lmax = rect.shape[-2] - 1
	if mmax is None: mmax = rect.shape[-1] - 1
	rdt = np.float32 if rect.dtype == jnp.complex64 else np.float64
	if map_dtype is None: map_dtype = rdt
	ldt = _leg_dtype(map_dtype)
	ncomp = rect.shape[-3]
	outs = []
	for s, i1, i2 in _spin_blocks(spin, ncomp):
		sub = rect[..., i1:i2, :, :]
		A = _c2coef(sub)
		if s == 0:
			G = _synth_scan(A, theta, lmax, mmax, "scalar", ldt)
			Gc = _coef2c(G, i2-i1)[..., 0, :, :, :]
			outs.append(ring_synthesis(Gc, phi0, nphi))
		else:
			if s <= 2:
				mode = "spin1" if s == 1 else "spin2"
				G = _synth_scan(A, theta, lmax, mmax, mode, ldt)
			else:
				G = sht_core.wigner_synthesis_scan(A, theta, lmax, mmax, s,
					dtype=ldt)
			Gc = _coef2c(G, 2)
			GE = Gc[..., 0, 0, :, :]; GB = Gc[..., 0, 1, :, :]
			XE = Gc[..., 1, 0, :, :]; XB = Gc[..., 1, 1, :, :]
			P1 = -(GE + _mul_i(XB))
			P2 = -(GB - _mul_i(XE))
			outs.append(ring_synthesis(jnp.stack([P1, P2], -3), phi0, nphi))
	return jnp.concatenate(outs, -3).astype(map_dtype)


def analysis_rect(maps, theta, lmax, weights, mmax=None, phi0=0.0,
		spin=(0, 2)):
	"""Quadrature analysis returning the rectangular complex representation
	[..., ncomp, nl, nm] instead of packed triangular alm. The output (and
	all intermediates) are elementwise in m -- see synthesis_rect."""
	maps = jnp.asarray(maps)
	if mmax is None: mmax = lmax
	nphi = maps.shape[-1]
	w = jnp.asarray(weights, maps.dtype)*(2*np.pi/nphi)
	F = ring_analysis(maps*w[:, None], phi0, mmax+1)
	# m_degeneracy=False: quadrature wants each (l, m) once (no real-map
	# m>0 doubling), so skip it in the transpose rather than undo it here
	return adjoint_synthesis_phase(F, theta, lmax, mmax=mmax, spin=spin,
		rect_out=True, m_degeneracy=False)


def adjoint_synthesis(maps, theta, lmax, mmax=None, phi0=0.0, spin=(0, 2),
		deriv=False, alm_dtype=None, m_degeneracy=True):
	"""Exact transpose of synthesis: map [..., ncomp, nt, nphi] -> alm.
	Note: sum over pixels, no quadrature weights."""
	maps = jnp.asarray(maps)
	if mmax is None: mmax = lmax
	F = ring_analysis(maps, phi0, mmax+1)
	return adjoint_synthesis_phase(F, theta, lmax, mmax=mmax, spin=spin,
		deriv=deriv, alm_dtype=alm_dtype, m_degeneracy=m_degeneracy)


def adjoint_synthesis_phase(F, theta, lmax, mmax=None, spin=(0, 2),
		deriv=False, alm_dtype=None, rect_out=False, m_degeneracy=True):
	"""Like adjoint_synthesis, but takes the per-ring phase coefficients
	F[..., ncomp, nm, nt] (ring_analysis output) instead of maps. Lets
	callers do theta-domain work (padding, exact upsampling, quadrature
	weighting) on the narrow m-spectrum instead of the full-width map.
	rect_out=True returns the rectangular complex representation
	[..., ncomp, nl, nm] (m-shardable) instead of packed triangular alm.
	m_degeneracy=False skips the real-map m>0 doubling of the true
	transpose (for quadrature analysis, which wants each mode once --
	cheaper than doubling here and halving after packing)."""
	F_in = jnp.asarray(F)
	theta = _keep_theta(theta)
	if mmax is None: mmax = lmax
	rdt = np.float32 if F_in.dtype == jnp.complex64 else np.float64
	ldt = _leg_dtype(rdt)
	cdt = _cdtype(rdt) if alm_dtype is None else alm_dtype
	if deriv:
		F2 = F_in                                            # [..., 2, nm, nt]
		Fdt, Fdp = F2[..., 0, :, :], F2[..., 1, :, :]
		m = jnp.arange(mmax+1, dtype=ldt)[:, None]
		# transpose of (G_dp = i m G_s): F_s += conj(i m)* ... = -i m F_dp
		Fs = -_mul_i(m*Fdp)
		F = jnp.stack([Fs[..., None, :, :], Fdt[..., None, :, :]], -4)
		Fr = jnp.concatenate([F.real, F.imag], -3)           # [...,2(fun),2,nm,nt]
		A = _anal_scan(Fr, theta, lmax, mmax, "deriv", ldt)
		rect = jax.lax.complex(A[..., 0], A[..., 1])
		# conjugate-symmetry factor: m>0 modes appear twice in a real map
		if m_degeneracy: rect = _m_degeneracy(rect, mmax)
		if rect_out: return rect.astype(cdt)
		return rect2alm(rect, lmax, mmax).astype(cdt)
	ncomp = F_in.shape[-3]
	outs = []
	for s, i1, i2 in _spin_blocks(spin, ncomp):
		Fm = F_in[..., i1:i2, :, :]                          # [..., k, nm, nt]
		if s == 0:
			k = i2-i1
			Fr = jnp.stack([Fm.real, Fm.imag], -3)           # [..., k, 2, nm, nt]
			Fr = Fr.reshape(Fr.shape[:-4] + (1, 2*k,) + Fr.shape[-2:])
			A = _anal_scan(Fr, theta, lmax, mmax, "scalar", ldt)
			A = A.reshape(A.shape[:-1] + (k, 2))
			rect = jax.lax.complex(A[..., 0], A[..., 1])
			rect = jnp.moveaxis(rect, -1, -3)
			if m_degeneracy: rect = _m_degeneracy(rect, mmax)
			outs.append(rect if rect_out else rect2alm(rect, lmax, mmax))
		else:
			Qf = Fm[..., 0, :, :]; Uf = Fm[..., 1, :, :]
			# aE = -sum w Qf - i sum x Uf ; aB = -sum w Uf + i sum x Qf
			Fc = jnp.stack([jnp.stack([-Qf, -Uf], -3),
				jnp.stack([-_mul_i(Uf), _mul_i(Qf)], -3)], -4)         # [..., fun, 2, nm, nt]
			Fr = jnp.concatenate([
				jnp.stack([Fc.real[..., 0, :, :], Fc.imag[..., 0, :, :]], -3),
				jnp.stack([Fc.real[..., 1, :, :], Fc.imag[..., 1, :, :]], -3)], -3)
			if s <= 2:
				mode = "spin1" if s == 1 else "spin2"
				A = _anal_scan(Fr, theta, lmax, mmax, mode, ldt)
			else:
				A = _wigner_anal_scan(Fr, theta, lmax, mmax, s, ldt)
			A = A.reshape(A.shape[:-1] + (2, 2))
			rect = jax.lax.complex(A[..., 0], A[..., 1])
			rect = jnp.moveaxis(rect, -1, -3)
			if m_degeneracy: rect = _m_degeneracy(rect, mmax)
			outs.append(rect if rect_out else rect2alm(rect, lmax, mmax))
	return jnp.concatenate(outs, -3 if rect_out else -2).astype(cdt)


def _m_degeneracy(rect, mmax):
	"""Multiply m>0 columns by 2: a real map's m<0 modes mirror m>0, so the
	transpose picks up both (m=0 appears once)."""
	fac = jnp.asarray(np.where(np.arange(mmax+1) == 0, 1.0, 2.0), rect.real.dtype)
	return rect*fac


def analysis(maps, theta, lmax, weights, mmax=None, phi0=0.0, spin=(0, 2),
		deriv=False, alm_dtype=None):
	"""Quadrature-based analysis: apply ring weights (times 2 pi/nphi) to the
	map, then the transpose of synthesis. Exact for band-limited maps on
	CC/F1 full-sky grids."""
	maps = jnp.asarray(maps)
	nphi = maps.shape[-1]
	# a_lm = sum_t W_t lambda(theta_t) (2 pi/nphi) sum_j map e^{-im phi_j}:
	# fold (2 pi/nphi) W_t into the map, reuse the transpose, and undo the
	# real-map m>0 doubling (the integral picks each (l,m) exactly once).
	w = jnp.asarray(weights, maps.dtype)*(2*np.pi/nphi)
	wm = maps*w[:, None]
	# m_degeneracy=False: the quadrature integral picks each (l,m) once, so
	# skip the transpose's m>0 doubling instead of undoing it after packing
	return adjoint_synthesis(wm, theta, lmax, mmax=mmax, phi0=phi0, spin=spin,
		deriv=deriv, alm_dtype=alm_dtype, m_degeneracy=False)


def _undo_m_degeneracy(alm, lmax, mmax):
	"""Halve m>0 modes of packed alm (undo the real-map transpose doubling).
	The m=0 block is exactly the first lmax+1 entries of the m-major layout,
	so no (l, m) recovery is needed."""
	n = nalm(lmax, mmax)
	i = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
	fac = jnp.where(i <= lmax, 1.0, 0.5).astype(alm.real.dtype)
	return alm*fac


def analysis_phase(F, theta, lmax, weights, nphi, mmax=None, spin=(0, 2),
		deriv=False, alm_dtype=None):
	"""Quadrature analysis from phase coefficients F[..., ncomp, nm, nt]
	(ring_analysis output): apply ring weights along theta and run the
	Legendre transpose. nphi is the ring length the phases came from."""
	F = jnp.asarray(F)
	if mmax is None: mmax = lmax
	w = jnp.asarray(weights, F.real.dtype)*(2*np.pi/nphi)
	return adjoint_synthesis_phase(F*w, theta, lmax, mmax=mmax, spin=spin,
		deriv=deriv, alm_dtype=alm_dtype, m_degeneracy=False)


MCHUNK_RESAMPLE = 1024  # m-columns per resample chunk (bounds the ~2x-nt
# torus buffers to a few hundred MB at lmax 5000 instead of several GB)

RESAMPLE_MM_MAX = 2_200_000  # nt*nt_out cap for the matrix resample path


@functools.lru_cache(maxsize=8)
def _resample_matrices(variant, nt, nt_out):
	"""Host-built REAL [nt_out, nt] matrices (Mb, Mm) with
	resampled = Mb @ F + (sgn_m*sgn_s) * (Mm @ F): the exact torus
	resample's action on the base rows and on the (un-signed) mirror rows.
	The combined torus operation (mirror extension, half-sample phase
	shifts, spectrum pad, inverse FFT, crop) is C-linear, so a complex
	matrix represents it EXACTLY; the kernel is the real shifted
	periodic-sinc except for a small imaginary part sourced entirely by
	the input torus Nyquist bin (the e^{-i pi f} half-sample phase is
	one-sided at f = -1/2). That bin is zero for bandlimited data, but
	keeping the complex matrix makes the matmul path bit-comparable to the
	FFT path on ARBITRARY inputs. Built column-wise with f64 numpy FFTs."""
	if variant in ("F1", "FEJER1"):
		NT_in, NT_out = 2*nt, 2*nt_out
		mir = np.zeros((NT_in, nt))
		mir[nt:, :] = np.eye(nt)[::-1]
	else:  # CC
		NT_in, NT_out = 2*(nt - 1), 2*(nt_out - 1)
		mir = np.zeros((NT_in, nt))
		mir[nt:, :] = np.eye(nt)[nt - 2:0:-1]
	base = np.zeros((NT_in, nt))
	base[:nt, :] = np.eye(nt)
	def run(B):
		ft = np.fft.fft(B, axis=0)
		if variant in ("F1", "FEJER1"):
			ft = ft*np.exp(-1j*np.pi*np.fft.fftfreq(NT_in))[:, None]
		# frequency-domain pad with symmetric Nyquist split (NT_in even)
		nh = NT_in//2
		out = np.zeros((NT_out,) + ft.shape[1:], complex)
		out[:nh] = ft[:nh]
		out[nh] = ft[nh]/2
		out[NT_out - nh] = ft[nh]/2
		out[NT_out - nh + 1:] = ft[nh + 1:]
		out = out/NT_in*NT_out
		if variant in ("F1", "FEJER1"):
			out = out*np.exp(+1j*np.pi*np.fft.fftfreq(NT_out))[:, None]
		return np.ascontiguousarray(np.fft.ifft(out, axis=0)[:nt_out])
	return run(base), run(mir)


@functools.partial(jax.jit, static_argnames=("variant", "nt_out", "spins", "m0"))
def _resample_theta_phase_mm_jit(F, variant, nt_out, spins, m0=0):
	"""MXU matrix path: the whole torus resample as two real matmuls per
	re/im plane (~0.25 ms at the lmax-750 900->1512 upsample vs ~3.4 ms for
	the FFT chain: XLA's TPU FFT runs at ~65 Gflop/s at these sizes)."""
	nm = F.shape[-2]
	nt = F.shape[-1]
	Mb, Mm = _resample_matrices(variant, nt, int(nt_out))
	Mbr = jnp.asarray(Mb.real.astype(np.float32))
	Mbi = jnp.asarray(Mb.imag.astype(np.float32))
	Mmr = jnp.asarray(Mm.real.astype(np.float32))
	Mmi = jnp.asarray(Mm.imag.astype(np.float32))
	m = np.arange(m0, m0 + nm)
	sgn_m = jnp.asarray(np.where(m % 2 == 0, 1.0, -1.0), jnp.float32)[:, None]
	sgn_s = jnp.asarray([(-1.0)**s for s in spins], jnp.float32)[:, None, None]
	def app(M, x):
		return jnp.einsum("...mt,ot->...mo", x, M,
			precision=jax.lax.Precision.HIGHEST)
	sgn = sgn_m*sgn_s
	# complex (Mb + sgn*Mm) @ (Fr + i Fi), expanded into real matmuls
	yr = app(Mbr, F.real) - app(Mbi, F.imag) \
		+ sgn*(app(Mmr, F.real) - app(Mmi, F.imag))
	yi = app(Mbr, F.imag) + app(Mbi, F.real) \
		+ sgn*(app(Mmr, F.imag) + app(Mmi, F.real))
	return jax.lax.complex(yr, yi)


def resample_theta_phase(F, variant, nt_out, spins):
	"""Exactly resample phase coefficients F[..., ncomp, nm, nt] on a
	full-sky CC/F1 ring grid to nt_out rings of the same variant, via the
	torus extension entirely in the m-domain: the phi -> phi + pi shift of
	the southern extension is the elementwise factor (-1)^m, so no
	full-width map FFTs are needed, and theta stays on the minor axis.
	Small grids take the MXU matrix path (_resample_theta_phase_mm_jit);
	large ones the FFT chain, processed in m-chunks: each m-column
	resamples independently, and the 2*nt-long torus buffers would
	otherwise reach GBs at high lmax."""
	F = jnp.asarray(F)
	nm = F.shape[-2]
	nt = F.shape[-1]
	variant = variant.upper()
	spins = tuple(int(s) for s in spins)
	if F.dtype == jnp.complex64 and nt*int(nt_out) <= RESAMPLE_MM_MAX:
		return _resample_theta_phase_mm_jit(F, variant, int(nt_out), spins, 0)
	if nm <= MCHUNK_RESAMPLE:
		return _resample_theta_phase_jit(F, variant, int(nt_out), spins, 0)
	parts = []
	for i0 in range(0, nm, MCHUNK_RESAMPLE):
		i1 = min(i0 + MCHUNK_RESAMPLE, nm)
		parts.append(_resample_theta_phase_jit(F[..., i0:i1, :], variant,
			int(nt_out), spins, i0))
	return jnp.concatenate(parts, -2)

@functools.partial(jax.jit, static_argnames=("variant", "nt_out", "spins", "m0"))
def _resample_theta_phase_jit(F, variant, nt_out, spins, m0=0):
	nm = F.shape[-2]
	nt = F.shape[-1]
	m = np.arange(m0, m0 + nm)
	sgn_m = jnp.asarray(np.where(m % 2 == 0, 1.0, -1.0), F.real.dtype)[:, None]
	sgn_s = jnp.asarray([(-1.0)**s for s in spins], F.real.dtype)[:, None, None]
	if variant in ["F1", "FEJER1"]:
		mirror = F[..., ::-1]*sgn_m*sgn_s
		NT_in, NT_out = 2*nt, 2*nt_out
	else:  # CC: pole rows are shared
		mirror = F[..., -2:0:-1]*sgn_m*sgn_s
		NT_in, NT_out = 2*(nt-1), 2*(nt_out-1)
	torus = jnp.concatenate([F, mirror], -1)
	ft = jnp.fft.fft(torus, axis=-1)
	if variant in ["F1", "FEJER1"]:
		ph_in = np.exp(-1j*np.pi*np.fft.fftfreq(NT_in))
		ft = ft*_utils.to_device(ph_in, ft.dtype)
	from . import fft as enfft
	ft = enfft.resample(ft, NT_out, axes=(-1,))/NT_in*NT_out
	if variant in ["F1", "FEJER1"]:
		ph_out = np.exp(+1j*np.pi*np.fft.fftfreq(NT_out))
		ft = ft*_utils.to_device(ph_out, ft.dtype)
	return jnp.fft.ifft(ft, axis=-1)[..., :nt_out]


def adjoint_analysis(alm, theta, nphi, weights, phi0=0.0, lmax=None, mmax=None,
		spin=(0, 2), deriv=False, map_dtype=None):
	"""Transpose of analysis: synthesis then multiply by the weight map."""
	if lmax is None: lmax = nalm2lmax(_utils.to_device(alm).shape[-1])
	alm = _undo_m_degeneracy(_utils.to_device(alm), lmax, mmax if mmax is not None else lmax)
	maps = synthesis(alm, theta, nphi, phi0=phi0, lmax=lmax, mmax=mmax,
		spin=spin, deriv=deriv, map_dtype=map_dtype)
	w = jnp.asarray(weights, maps.dtype)*(2*np.pi/nphi)
	return maps*w[:, None]


# ---------------------------------------------------------------------------
# Exact theta-resampling via the torus extension. A band-limited sphere map
# sampled on a full CC/F1 ring grid extends to a uniform periodic grid in
# theta over [0, 2pi) (the "torus"), where FFT zero-padding resamples it
# exactly. This lets analysis stay exact up to lmax ~ nrings-1 instead of
# (nrings-1)/2 (ducc's analysis_2d does the equivalent internally).
# ---------------------------------------------------------------------------
def _torus_extend(maps, variant, spins):
	"""maps [..., ncomp, nt, nphi] on a full-sky CC/F1 grid -> torus
	[..., ncomp, NT, nphi] with theta uniform over [0, 2pi)."""
	maps = jnp.asarray(maps)
	nphi = maps.shape[-1]
	fphi = jnp.fft.fft(maps, axis=-1)
	k = jnp.asarray(np.arange(nphi))
	phase = jnp.where(k % 2 == 0, 1.0, -1.0).astype(maps.dtype)  # shift phi by pi
	sgn = jnp.asarray([(-1.0)**s for s in spins], maps.dtype)[:, None, None]
	if variant.upper() in ["F1", "FEJER1"]:
		mirror = fphi[..., ::-1, :]*phase*sgn
	else:  # CC: poles are shared rows
		mirror = fphi[..., -2:0:-1, :]*phase*sgn
	torus_f = jnp.concatenate([fphi, mirror], -2)
	return jnp.fft.ifft(torus_f, axis=-1), nphi

def resample_theta(maps, variant, nt_out, spins, phase_only=False):
	"""Exactly resample a full-sky CC/F1 ring map [..., ncomp, nt, nphi] to
	nt_out rings of the same variant, assuming it is band-limited to
	lmax < NT/2 on the torus."""
	return _resample_theta_jit(jnp.asarray(maps), variant.upper(), int(nt_out),
		tuple(int(s) for s in spins))

@functools.partial(jax.jit, static_argnames=("variant", "nt_out", "spins"))
def _resample_theta_jit(maps, variant, nt_out, spins):
	rdt = maps.dtype
	variant = variant.upper()
	nt = maps.shape[-2]
	torus, nphi = _torus_extend(maps, variant, spins)
	NT_in  = torus.shape[-2]
	NT_out = 2*nt_out if variant in ["F1", "FEJER1"] else 2*(nt_out-1)
	ft = jnp.fft.fft(torus, axis=-2)
	# grid offsets: F1 rows sit at (j+1/2)*dtheta -> adjust phases so both
	# input and output grids are referenced to theta=0
	if variant in ["F1", "FEJER1"]:
		# phases computed host-side, transferred as split re/im (to_device)
		ph_in = np.exp(-1j*np.pi*np.fft.fftfreq(NT_in))
		ft = ft*_utils.to_device(ph_in, ft.dtype)[:, None]
	from . import fft as enfft
	ft = enfft.resample(ft, NT_out, axes=(-2,))/NT_in*NT_out
	if variant in ["F1", "FEJER1"]:
		ph_out = np.exp(+1j*np.pi*np.fft.fftfreq(NT_out))
		ft = ft*_utils.to_device(ph_out, ft.dtype)[:, None]
	res = jnp.fft.ifft(ft, axis=-2)[..., :nt_out, :]
	if not jnp.iscomplexobj(maps):
		res = res.real
	return res.astype(rdt)
