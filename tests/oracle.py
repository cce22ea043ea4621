"""Brute-force spherical-harmonic oracle for tests.

Computes spin-weighted spherical harmonics sYlm directly from the Goldberg
et al. (1967) closed-form sum, in float128-ish (float64 with care), with no
dependence on ducc0/healpy. Only usable for small lmax (~64), which is all
the tests need. This is the trusted reference the fast engine is validated
against (replaces the reference pixell's use of ducc0 as oracle).
"""
import numpy as np
from math import comb, lgamma


def _lnfact(n):
	return lgamma(n + 1.0)

def sylm(s, l, m, theta, phi=0.0):
	"""Spin-s spherical harmonic sYlm(theta, phi) via the Goldberg formula.
	theta: array of colatitudes. Returns complex array."""
	theta = np.asarray(theta, np.float64)
	if l < max(abs(s), abs(m)):
		return np.zeros(theta.shape, np.complex128)
	pref_ln = 0.5*(_lnfact(l+m) + _lnfact(l-m) - _lnfact(l+s) - _lnfact(l-s)
		+ np.log(2*l+1) - np.log(4*np.pi))
	pref = (-1.0)**m * np.exp(pref_ln)
	half = theta/2
	st, ct = np.sin(half), np.cos(half)
	# sum over r of C(l-s,r) C(l+s, r+s-m) (-1)^{l-r-s} cot^{2r+s-m}(theta/2)
	# times sin^{2l}(theta/2)
	res = np.zeros(theta.shape, np.float64)
	for r in range(0, l-s+1):
		k = r + s - m
		if k < 0 or k > l+s: continue
		c = comb(l-s, r)*comb(l+s, k)*(-1.0)**(l-r-s)
		# sin^{2l}(t/2) * cot^{2r+s-m}(t/2) = sin^{2l-(2r+s-m)} cos^{2r+s-m}
		p = 2*r + s - m
		res = res + c*st**(2*l-p)*ct**p
	return pref*res*np.exp(1j*m*np.asarray(phi))

def ylm(l, m, theta, phi=0.0):
	return sylm(0, l, m, theta, phi)

def lambda_lm(l, m, theta):
	"""Normalized associated Legendre: Y_lm = lambda_lm(theta) e^{i m phi}."""
	return sylm(0, l, m, theta, 0.0).real


def nalm(lmax, mmax=None):
	if mmax is None: mmax = lmax
	return (mmax+1)*(2*lmax+2-mmax)//2

def lm2ind(lmax, l, m):
	return m*(2*lmax+1-m)//2 + l


def synth_direct(alm, lmax, theta, phi, spin=0):
	"""Direct spin-0 or spin-s synthesis at points (theta[i], phi[i]).
	For spin 0: alm [nalm] -> real map [npt].
	For spin 2: alm [2,nalm] (E,B) -> [2,npt] (Q,U), using the convention
	 (Q +- iU) = sum a_{+-s,lm} (+-s)Ylm, a_{+s} = -(a1 + i a2), a_{-s} = -(-1)^s (a1 - i a2)."""
	theta = np.asarray(theta); phi = np.asarray(phi)
	if spin == 0:
		res = np.zeros(theta.shape, np.complex128)
		for m in range(0, lmax+1):
			for l in range(m, lmax+1):
				a = alm[lm2ind(lmax, l, m)]
				Y = sylm(0, l, m, theta, phi)
				res += a*Y
				if m > 0:
					# real field: a_{l,-m} = (-1)^m conj(a_{lm}); Y_{l,-m} = (-1)^m conj(Y_lm)
					res += np.conj(a)*np.conj(Y)
		return res.real
	else:
		aE, aB = alm[0], alm[1]
		P = np.zeros(theta.shape, np.complex128)  # Q + iU
		M = np.zeros(theta.shape, np.complex128)  # Q - iU
		for m in range(0, lmax+1):
			for l in range(max(m, spin), lmax+1):
				i = lm2ind(lmax, l, m)
				sgn = (-1.0)**spin
				a_p = -(aE[i] + 1j*aB[i])
				a_m = -sgn*(aE[i] - 1j*aB[i])
				Yp = sylm(+spin, l, m, theta, phi)
				Ym = sylm(-spin, l, m, theta, phi)
				P += a_p*Yp
				M += a_m*Ym
				if m > 0:
					# negative-m terms from reality of E/B:
					# a_{X,l,-m} = (-1)^m conj(a_{X,lm}) for X=E,B
					aEc = (-1.0)**m*np.conj(aE[i]); aBc = (-1.0)**m*np.conj(aB[i])
					a_pn = -(aEc + 1j*aBc)
					a_mn = -sgn*(aEc - 1j*aBc)
					Ypn = sylm(+spin, l, -m, theta, phi)
					Ymn = sylm(-spin, l, -m, theta, phi)
					P += a_pn*Ypn
					M += a_mn*Ymn
		Q = 0.5*(P + M)
		U = -0.5j*(P - M)
		return np.stack([Q.real, U.real])


def synth_deriv_direct(alm, lmax, theta, phi, eps=1e-6):
	"""Direct [dtheta, dphi/sin? -- raw dtheta and dphi] derivatives of the
	spin-0 synthesis, via numerical differentiation of the Goldberg sum."""
	f0t = synth_direct(alm, lmax, theta-eps, phi)
	f1t = synth_direct(alm, lmax, theta+eps, phi)
	f0p = synth_direct(alm, lmax, theta, phi-eps)
	f1p = synth_direct(alm, lmax, theta, phi+eps)
	return np.stack([(f1t-f0t)/(2*eps), (f1p-f0p)/(2*eps)])


def rand_alm_oracle(lmax, seed=0, ncomp=None):
	"""Random triangular-layout alm with proper reality conditions."""
	rng = np.random.default_rng(seed)
	n = nalm(lmax)
	shape = (n,) if ncomp is None else (ncomp, n)
	alm = rng.standard_normal(shape) + 1j*rng.standard_normal(shape)
	# m=0 entries must be real
	for l in range(lmax+1):
		alm[..., lm2ind(lmax, l, 0)] = alm[..., lm2ind(lmax, l, 0)].real
	return alm
