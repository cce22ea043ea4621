"""Value -> color mapping for map visualization (reference pixell/colorize.py
over fortran/colorize.f90). The remap kernel is vectorized numpy
interpolation instead of the Fortran loop; the *_fortran entry points are
kept as aliases of the vectorized path so callers written against the
reference driver API keep working."""
from __future__ import annotations
import numpy as np

# No f2py core here; the vectorized numpy path plays the role of the
# "fortran" driver (reference colorize.py:117 checks has_fortran).
has_fortran = False


class Colorscheme:
	"""A colormap: positions in [0,1] with RGBA nodes
	(reference colorize.Colorscheme:12). desc is either a registered name,
	a matplotlib colormap name prefixed 'mpl:', or 'p1:rrggbbaa,p2:...'."""
	def __init__(self, desc):
		self.desc = desc
		if isinstance(desc, Colorscheme):
			self.vals, self.cols = desc.vals, desc.cols
			self.desc = desc.desc
			return
		if isinstance(desc, str) and desc in schemes:
			other = schemes[desc]
			if isinstance(other, Colorscheme):
				self.vals, self.cols = other.vals, other.cols
			else:
				self.vals, self.cols = _parse(other)
		elif isinstance(desc, str) and desc.startswith("mpl:"):
			self.vals, self.cols = _from_mpl(desc[4:])
		else:
			self.vals, self.cols = _parse(desc)
	def reverse(self):
		"""Color scheme running the other way (reference Colorscheme.reverse:47)."""
		res = Colorscheme(self)
		res.vals = 1 - self.vals[::-1]
		res.cols = self.cols[::-1]
		return res
	def __call__(self, x):
		return colorize(x, self)


def _parse(desc):
	toks = desc.split(",")
	vals, cols = [], []
	for tok in toks:
		p, _, c = tok.partition(":")
		vals.append(float(p))
		c = c.strip()
		if len(c) == 6: c = c + "ff"
		cols.append([int(c[i:i+2], 16) for i in range(0, 8, 2)])
	return np.array(vals), np.array(cols, np.uint8)

def _from_mpl(name, n=256):
	"""Sample a matplotlib colormap into (vals, cols)."""
	import matplotlib
	cmap = matplotlib.colormaps[name]
	x = np.linspace(0, 1, n)
	return x, (np.asarray(cmap(x))*255).astype(np.uint8)


# Gradient definitions. Short node tables follow the reference's naming
# (colorize.py:100-116); the dense standard colormaps (viridis, plasma,
# cubehelix, cooltowarm) are sampled from matplotlib's canonical versions
# instead of baking in node tables.
schemes = {
	"planck": "0:0000ff,0.332:00d7ff,0.5:ffedd9,0.664:ffb400,0.828:ff4b00,1:640000",
	"planck_old": "0:0000ff,0.33:ffedd9,0.83:ff4b00,1:640000",
	"pcont":  "0:0000ff,0.332:00d7ff,0.5:00cc00,0.664:ffb400,0.828:ff4b00,1:640000",
	"pwhite": "0:0000ff,0.332:00d7ff,0.5:ffffff,0.55:ffedd9,0.664:ffb400,0.828:ff4b00,1:640000",
	"wmap":   "0:000080,0.15:0000ff,0.4:00ffff,0.7:ffff00,0.9:ff5500,1:800000",
	"nozero": "0:000080,0.15:0000ff,0.499998:55ffaa,0.499999:55ffaa00,0.500001:55ffaa00,0.500002:55ffaa,0.4:00ffff,0.7:ffff00,0.9:ff5500,1:800000",
	"gray":   "0:000000,1:ffffff",
	"grey":   "0:000000,1:ffffff",
	"hotcold": "0:0000ff,0.5:000000,1:ff0000",
	"hotcold2": "0:0000ff,0.5:ffffff,1:ff0000",
	"reddish": "0:000000,0.5:b60000,0.7:ff6500,0.75:ff7f00,1:ffffff",
	"phase":  "0:ff0000,0.25:ffff00,0.5:00ff00,0.75:00ffff,1:ff0000",
	# thermal-camera style ramp (reference "iron", coarse nodes)
	"iron":   "0:000000,0.12:1b0080,0.25:8b009d,0.45:d92961,0.6:f37101,0.78:fec300,0.9:ffee58,1:fffff9",
	# COMAP-style diverging ramp (coarse nodes)
	"comap":  "0:723959,0.2:4e7cb2,0.4:9dd5cd,0.5:cde1af,0.6:d2c673,0.8:9b5b2c,1:733957",
}

def _register_mpl_schemes():
	try:
		for ours, mpl in [("viridis", "viridis"), ("plasma", "plasma"),
				("cubehelix", "cubehelix"), ("cooltowarm", "coolwarm")]:
			vals, cols = _from_mpl(mpl)
			cs = Colorscheme("0:000000,1:ffffff")
			cs.vals, cs.cols, cs.desc = vals, cols, ours
			schemes[ours] = cs
	except Exception:
		pass
_register_mpl_schemes()


def colorize(arr, desc="planck", mode="scalar", driver="auto", cmap=None,
		method=None):
	"""Transform values into RGBA tuples (reference colorize.colorize:53).
	mode "scalar": arr[...] -> res[...,{rgba}] through the color scheme.
	mode "direct": arr[{rgb(a)},...] carried through, A defaulting to 255.
	mode "direct_colorcap": like direct but hue-preserving clipping.
	driver is accepted for API parity; both names run the vectorized path."""
	if cmap is not None: desc = cmap
	if method is not None: mode = "scalar"  # legacy keyword of this package
	arr  = np.asarray(arr)
	desc = Colorscheme(desc)
	if len(desc.vals) == 0:
		return np.zeros(arr.shape + (4,), dtype=np.uint8)
	if len(desc.vals) == 1:
		return np.tile(desc.cols[0], arr.shape + (1,))
	if mode == "scalar":
		a = arr.reshape(-1)
		res = colorize_scalar_python(a, desc)
		return res.reshape(arr.shape + (4,))
	if mode == "direct":
		a = arr.reshape(arr.shape[0], -1)
		res = colorize_direct_python(a, desc)
		return res.reshape(arr.shape[1:] + (4,))
	if mode == "direct_colorcap":
		a = arr.reshape(arr.shape[0], -1)
		res = colorize_direct_colorcap(a, desc)
		return res.reshape(arr.shape[1:] + (4,))
	raise ValueError("Unknown colorize mode '%s'" % str(mode))


def colorize_scalar_python(a, desc):
	"""Scalar values -> RGBA via the scheme (reference colorize_scalar_python:122).
	NaNs become fully transparent."""
	a = np.asarray(a, float)
	res = np.empty((len(a), 4), dtype=np.uint8)
	bad = ~np.isfinite(a)
	res[bad] = (0, 0, 0, 0)
	ok = ~bad
	i = np.searchsorted(desc.vals, a[ok])
	i = np.clip(i, 1, len(desc.vals) - 1)
	x = (a[ok] - desc.vals[i-1])/(desc.vals[i] - desc.vals[i-1])
	x = np.clip(x, 0, 1)
	col = np.round(desc.cols[i-1]*(1 - x)[:, None] + desc.cols[i]*x[:, None])
	res[ok] = np.clip(col, 0, 0xff).astype(np.uint8)
	return res

def colorize_direct_python(a, desc):
	"""RGB(A) channel rows -> RGBA (reference colorize_direct_python:142)."""
	a = np.asarray(a, float)
	nc = a.shape[0]
	res = np.empty((a.shape[1], 4), dtype=np.uint16)
	good = np.isfinite(a[0])
	res[~good] = 0
	res[good, :nc] = np.clip(a[:nc, good]*256, 0, 255).T
	if nc < 4: res[good, nc:] = 255
	return res.astype(np.uint8)

def colorize_direct_colorcap(a, desc):
	"""Direct mode with hue-preserving clipping: overflowing channels are
	scaled down jointly instead of clipped independently (the behavior of
	colorize.f90 direct_colorcap, reference colorize.py:156)."""
	a = np.asarray(a, float)
	nc = a.shape[0]
	rgb = a[:min(nc, 3)]*256
	peak = np.max(rgb, 0)
	scale = np.where(peak > 255, 255/np.maximum(peak, 1e-30), 1.0)
	rgb = np.clip(rgb*scale, 0, 255)
	res = np.empty((a.shape[1], 4), dtype=np.uint16)
	good = np.isfinite(a[0])
	res[~good] = 0
	res[good, :rgb.shape[0]] = rgb[:, good].T
	if nc >= 4: res[good, 3] = np.clip(a[3, good]*256, 0, 255)
	else: res[good, 3] = 255
	return res.astype(np.uint8)

# The reference's f2py-backed drivers; here they are the same vectorized code
# (reference colorize.py:117,151,156).
colorize_scalar_fortran = colorize_scalar_python
colorize_direct_fortran = colorize_direct_python
colorize_direct_colorcap_fortran = colorize_direct_colorcap


def to_mpl_colormap(name, data=None):
	"""Convert one of our schemes to a matplotlib colormap
	(reference colorize.to_mpl_colormap:161)."""
	import matplotlib.colors
	cs = Colorscheme(data if data is not None else name)
	return matplotlib.colors.LinearSegmentedColormap.from_list(name,
		[(v, tuple(c/255.0)) for v, c in zip(cs.vals, cs.cols.astype(float))])

def mpl_register(names=None):
	"""Register our schemes as matplotlib colormaps (reference colorize.py:167)."""
	import matplotlib
	if names is None: names = list(schemes.keys())
	if isinstance(names, str): names = [names]
	for name in names:
		try:
			matplotlib.colormaps.register(to_mpl_colormap(name), name=name)
		except Exception:
			pass

def mpl_setdefault(name):
	"""Make one of our schemes matplotlib's default colormap
	(reference colorize.mpl_setdefault:175)."""
	import matplotlib.pyplot
	mpl_register(name)
	matplotlib.pyplot.rcParams['image.cmap'] = name
