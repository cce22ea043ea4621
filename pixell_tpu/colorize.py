"""Value -> color mapping for map visualization (reference pixell/colorize.py
over fortran/colorize.f90). The remap kernel is a vectorized interpolation in
jnp/numpy instead of the Fortran loop."""
from __future__ import annotations
import numpy as np


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
		if desc in schemes:
			self.vals, self.cols = _parse(schemes[desc])
		elif isinstance(desc, str) and desc.startswith("mpl:"):
			import matplotlib.cm as cm
			cmap = cm.get_cmap(desc[4:])
			x = np.linspace(0, 1, 256)
			self.vals = x
			self.cols = (np.asarray(cmap(x))*255).astype(np.uint8)
		else:
			self.vals, self.cols = _parse(desc)
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

# Gradient definitions. These follow the reference's *naming* (colorize.py:25)
# but the gradients themselves are the standard public colormaps.
schemes = {
	# The Planck CMB map colors (public Planck collaboration colormap nodes)
	"planck": "0:0000ff,0.332:00d7ff,0.5:ffedd9,0.664:ffb400,0.828:ff4b00,1:640000",
	"wmap":   "0:000080,0.15:0000ff,0.4:00ffff,0.7:ffff00,0.9:ff5500,1:800000",
	"gray":   "0:000000,1:ffffff",
	"grey":   "0:000000,1:ffffff",
	"hotcold": "0:0000ff,0.5:000000,1:ff0000",
	"cooltowarm": "0:3b4cc0,0.5:dddddd,1:b40426",
	"phase":  "0:ff0000,0.25:ffff00,0.5:00ff00,0.75:00ffff,1:ff0000",
}

def colorize(arr, desc="planck", method="direct"):
	"""Map normalized values arr in [0,1] to RGBA [ny,nx,4] uint8
	(reference colorize.colorize:53). NaNs become transparent."""
	cs = desc if isinstance(desc, Colorscheme) else Colorscheme(desc)
	a = np.asarray(arr, np.float64)
	bad = ~np.isfinite(a)
	x = np.clip(np.nan_to_num(a), 0, 1)
	out = np.empty(a.shape + (4,), np.uint8)
	for c in range(4):
		out[..., c] = np.round(np.interp(x, cs.vals, cs.cols[:, c].astype(float)))
	out[bad] = [128, 128, 128, 0]
	return out

def mpl_register(names=None):
	"""Register our schemes as matplotlib colormaps (reference colorize.py:161)."""
	try:
		import matplotlib.colors as mcolors
		import matplotlib.cm as cm
	except ImportError:
		return
	for name in (names or schemes):
		vals, cols = _parse(schemes[name])
		cdict = [(v, c/255.0) for v, c in zip(vals, cols[:, :3])]
		try:
			cmap = mcolors.LinearSegmentedColormap.from_list("pixell_"+name,
				[(v, tuple(c)) for v, c in cdict])
			import matplotlib
			matplotlib.colormaps.register(cmap, name="pixell_"+name, force=True)
		except Exception:
			pass
