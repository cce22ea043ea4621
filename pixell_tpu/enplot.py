"""Map visualization (reference pixell/enplot.py).

Produces PIL images of ndmaps with color ranges, colorbars, coordinate
grids, downgrading and autocrop, plus png/video writers. The reference's
CLI-style option language (enplot.py:251-347) is kept: options can be passed
as keywords or as a single argument string, e.g.
  enplot.plot(m, "-r 300 -c planck -d 2 -g")
"""
from __future__ import annotations
import shlex
import numpy as np
from . import enmap, colorize, cgrid, utils
from .bunch import Bunch


def define_arg_parser():
	import argparse
	p = argparse.ArgumentParser(add_help=False)
	p.add_argument("-r", "--range", type=str, default=None,
		help="color range: symmetric +-range")
	p.add_argument("--min", type=str, default=None)
	p.add_argument("--max", type=str, default=None)
	p.add_argument("-q", "--quantile", type=float, default=0.01)
	p.add_argument("-c", "--color", type=str, default="planck")
	p.add_argument("-d", "--downgrade", type=int, default=1)
	p.add_argument("-u", "--upgrade", type=int, default=1)
	p.add_argument("-g", "--grid", action="store_true")
	p.add_argument("--ticks", type=str, default="2")
	p.add_argument("--nolabels", action="store_true")
	p.add_argument("-a", "--autocrop", action="store_true")
	p.add_argument("-m", "--mask", type=float, default=None)
	p.add_argument("--colorbar", action="store_true")
	p.add_argument("-t", "--transpose", action="store_true")
	p.add_argument("--flip", action="store_true")
	p.add_argument("-v", "--verbose", action="store_true")
	p.add_argument("-o", "--oname", type=str, default=None)
	p.add_argument("--method", type=str, default="pil")
	p.add_argument("--font-size", type=int, default=12)
	p.add_argument("--contours", type=str, default=None,
		help="comma-separated contour levels, or a single step size")
	p.add_argument("--contour-color", type=str, default="000000ff")
	p.add_argument("--annotate", type=str, default=None,
		help="annotation file: lines 'circle dec ra radius_deg' or 'text dec ra label'")
	return p

_parser = None
def parse_args(args="", noglob=False):
	"""Parse a CLI-style option string into a Bunch (reference enplot.parse_args:349)."""
	global _parser
	if _parser is None: _parser = define_arg_parser()
	if isinstance(args, str):
		args = shlex.split(args)
	res, _ = _parser.parse_known_args(args)
	return Bunch(**vars(res))


def get_color_range(arr, quantile=0.01, symmetric=True):
	"""Robust color range from quantiles (reference enplot.get_color_range:650)."""
	good = np.isfinite(arr)
	if not np.any(good): return np.array([0.0, 1.0])
	vals = arr[good]
	lo, hi = np.quantile(vals, [quantile, 1-quantile])
	if symmetric:
		m = max(abs(lo), abs(hi))
		if m == 0: m = 1
		return np.array([-m, m])
	if hi == lo: hi = lo + 1
	return np.array([lo, hi])

def draw_map_field(map, args, crange=None):
	"""Render one 2D field to a PIL image (reference enplot.draw_map_field:502)."""
	from PIL import Image
	arr = np.asarray(map)
	if args.autocrop:
		map = enmap.autocrop(map)
		arr = np.asarray(map)
	if args.downgrade > 1:
		map = enmap.downgrade(map, args.downgrade)
		arr = np.asarray(map)
	if crange is None:
		if args.range is not None:
			r = float(args.range)
			crange = np.array([-r, r])
		elif args.min is not None or args.max is not None:
			crange = np.array([float(args.min if args.min is not None else np.nanmin(arr)),
				float(args.max if args.max is not None else np.nanmax(arr))])
		else:
			crange = get_color_range(arr, args.quantile)
	norm = (arr - crange[0])/(crange[1] - crange[0])
	if args.mask is not None:
		norm = np.where(arr == args.mask, np.nan, norm)
	rgba = colorize.colorize(norm, args.color)
	# maps are stored with y increasing upward (dec); images have y down
	rgba = rgba[::-1]
	img = Image.fromarray(rgba, "RGBA")
	if args.upgrade > 1:
		img = img.resize((img.size[0]*args.upgrade, img.size[1]*args.upgrade),
			Image.NEAREST)
	if args.contours:
		img = draw_contours(img, map, args)
	if args.annotate:
		img = draw_annotations(img, map, args)
	if args.grid:
		steps = [float(t) for t in str(args.ticks).split(",")]
		if len(steps) == 1: steps = steps*2
		gi = cgrid.calc_gridinfo(map.shape, map.wcs, steps=steps)
		# flip y for image coords
		ny = map.shape[-2]
		for group in [gi.lat, gi.lon]:
			for k in range(len(group)):
				val, seg = group[k]
				seg = seg.copy()
				seg[:, 1] = ny - 1 - seg[:, 1]
				seg = seg*args.upgrade
				group[k] = (val, seg)
		cgrid.draw_grid(img, gi)
		if not args.nolabels:
			labels = cgrid.calc_label_pos(gi, (ny*args.upgrade, map.shape[-1]*args.upgrade))
			cgrid.draw_labels(img, labels)
	return img, Bunch(crange=crange)

def draw_colorbar(crange, width, args):
	from PIL import Image, ImageDraw
	bar = np.linspace(0, 1, max(width, 2))[None].repeat(16, 0)
	rgba = colorize.colorize(bar, args.color)
	img = Image.fromarray(rgba, "RGBA")
	draw = ImageDraw.Draw(img)
	draw.text((2, 2), "%.3g" % crange[0], fill=(0, 0, 0, 255))
	txt = "%.3g" % crange[1]
	draw.text((width - 8*len(txt), 2), txt, fill=(0, 0, 0, 255))
	return img

def plot(imap, args="", comm=None, noglob=False, **kwargs):
	"""Plot an ndmap (or list of them). Returns a list of Bunch(name, img)
	(reference enplot.plot:32)."""
	opts = parse_args(args)
	for k, v in kwargs.items():
		opts[k] = v
	maps = imap if isinstance(imap, (list, tuple)) else [imap]
	plots = []
	for mi, m in enumerate(maps):
		m = m if isinstance(m, enmap.ndmap) else enmap.enmap(m)
		fields = m.preflat() if m.ndim > 2 else [m]
		n = len(fields) if m.ndim > 2 else 1
		for fi in range(n):
			field = fields[fi] if m.ndim > 2 else m
			img, info = draw_map_field(field, opts)
			if opts.colorbar:
				from PIL import Image
				bar = draw_colorbar(info.crange, img.size[0], opts)
				tot = Image.new("RGBA", (img.size[0], img.size[1] + bar.size[1]))
				tot.paste(img, (0, 0)); tot.paste(bar, (0, img.size[1]))
				img = tot
			name = (opts.oname or "map") + ("" if n == 1 else "_%d" % fi)
			plots.append(Bunch(name=name, img=img, type="pil", info=info))
	return plots

def write(fname, plots):
	"""Write plots to image file(s) (reference enplot.write:206)."""
	plots = plots if isinstance(plots, (list, tuple)) else [plots]
	if len(plots) == 1:
		plots[0].img.save(fname)
		return [fname]
	names = []
	for i, p in enumerate(plots):
		base, _, ext = fname.rpartition(".")
		n = "%s_%d.%s" % (base or fname, i, ext or "png")
		p.img.save(n)
		names.append(n)
	return names

def pshow(imap, args="", **kwargs):
	"""Plot and display inline (ipython) or via PIL's viewer
	(reference enplot.pshow:80)."""
	plots = plot(imap, args, **kwargs)
	for p in plots:
		try:
			from IPython.display import display
			display(p.img)
		except ImportError:
			p.img.show()
	return plots

def pwrite(fname, imap, args="", **kwargs):
	return write(fname, plot(imap, args, **kwargs))

def plot_iterator(*maps, comm=None, **kwargs):
	"""Iterate over plots, MPI-strided over ranks (reference enplot.plot_iterator:95)."""
	rank = getattr(comm, "rank", 0)
	size = getattr(comm, "size", 1)
	for i, m in enumerate(maps):
		if i % size != rank: continue
		for p in plot(m, **kwargs):
			yield p

class Writer:
	"""Plot output sink (reference enplot.Writer:1117): process() consumes
	plots one by one, close() finalizes; usable as a context manager."""
	def __init__(self, fname=None, **kwargs):
		self.fname = fname
	def process(self, plot, prefix=""):
		raise NotImplementedError
	def write(self, plots): return write(self.fname, plots)
	def close(self): pass
	def __enter__(self): return self
	def __exit__(self, type, value, traceback): self.close()

class PlotWriter(Writer):
	"""Writes image plots to files, delegating video plots to a VideoWriter
	(reference enplot.PlotWriter:1124)."""
	def __init__(self, fname=None, **kwargs):
		super().__init__(fname)
		self.vid_writer = VideoWriter(**kwargs)
	def process(self, plot, prefix=""):
		ptype = getattr(plot, "type", "pil")
		if ptype == "vid":
			self.vid_writer.process(plot, prefix=prefix)
		elif ptype == "pil":
			plot.img.save(prefix + plot.name)
		elif ptype == "mpl":
			plot.img.savefig(prefix + plot.name, bbox_inches="tight",
				dpi=getattr(plot, "dpi", 100))
		else:
			raise ValueError("Unknown plot type '%s'" % str(ptype))
	def close(self):
		self.vid_writer.close()

class VideoWriter(Writer):
	"""Accumulates frames into an animated file (reference
	enplot.VideoWriter:1139 encodes via PyAV/ffmpeg; here PIL writes an
	animated gif/webp, which needs no external binaries)."""
	def __init__(self, fname=None, fps=10, **kwargs):
		super().__init__(fname)
		self.frames = []
		self.fps = fps
	def new(self, fname, img=None):
		"""Finalize any current animation and start a new one
		(reference VideoWriter.new:1156)."""
		self.close()
		self.fname = fname
	def process(self, plot, prefix=""):
		fname = prefix + getattr(plot, "name", self.fname or "video.gif")
		if self.fname is not None and fname != self.fname:
			self.new(fname)
		elif self.fname is None:
			self.fname = fname
		self.add(plot)
	def add(self, plots):
		p = plots[0] if isinstance(plots, (list, tuple)) else plots
		self.frames.append(p.img.convert("RGB"))
	def finish(self):
		if not self.frames: return
		self.frames[0].save(self.fname, save_all=True,
			append_images=self.frames[1:], duration=int(1000/self.fps), loop=0)
		self.frames = []
	def close(self):
		if self.frames and self.fname:
			self.finish()


def _contour_levels(spec, arr):
	toks = str(spec).split(",")
	if len(toks) == 1:
		step = float(toks[0])
		lo = np.floor(np.nanmin(arr)/step)*step
		hi = np.nanmax(arr)
		return np.arange(lo, hi + step, step)
	return np.array([float(t) for t in toks])

def draw_contours(img, map, args):
	"""Draw iso-level contours with marching-squares segments
	(reference enplot.py:734-791)."""
	from PIL import ImageDraw
	arr = np.asarray(map)
	levels = _contour_levels(args.contours, arr)
	col = tuple(int(args.contour_color[i:i+2], 16) for i in range(0, 8, 2))
	draw = ImageDraw.Draw(img, "RGBA")
	ny, nx = arr.shape[-2:]
	u = args.upgrade
	for lev in levels:
		# marching squares: for each cell, interpolate edge crossings
		a = arr[:-1, :-1]; b = arr[:-1, 1:]; c = arr[1:, :-1]; d = arr[1:, 1:]
		above = (np.stack([a, b, c, d]) > lev)
		cells = np.where(above.any(0) & ~above.all(0))
		for cy, cx in zip(*cells[-2:] if len(cells) > 2 else cells):
			pts = []
			vals = [arr[cy, cx], arr[cy, cx+1], arr[cy+1, cx], arr[cy+1, cx+1]]
			# edges: top (0-1), left (0-2), right (1-3), bottom (2-3)
			edges = [((cx, cy), (cx+1, cy), vals[0], vals[1]),
				((cx, cy), (cx, cy+1), vals[0], vals[2]),
				((cx+1, cy), (cx+1, cy+1), vals[1], vals[3]),
				((cx, cy+1), (cx+1, cy+1), vals[2], vals[3])]
			for (x1, y1), (x2, y2), v1, v2 in edges:
				if (v1 > lev) != (v2 > lev) and v2 != v1:
					t = (lev - v1)/(v2 - v1)
					pts.append((x1 + t*(x2-x1), y1 + t*(y2-y1)))
			if len(pts) >= 2:
				# image y axis is flipped
				p = [( (x+0.5)*u, (ny-1-yv+0.5-1+1)*u ) for x, yv in pts[:2]]
				p = [((x)*u, (ny-1-yv)*u) for x, yv in pts[:2]]
				draw.line(p, fill=col, width=1)
	return img

def draw_annotations(img, map, args):
	"""Draw circles/text annotations from a file or list
	(reference enplot.py:792-866)."""
	from PIL import ImageDraw
	from . import utils as u_
	draw = ImageDraw.Draw(img, "RGBA")
	ny = map.shape[-2]
	u = args.upgrade
	entries = args.annotate
	if isinstance(entries, str):
		with open(entries) as f:
			entries = [line.split() for line in f if line.strip()]
	for e in entries:
		kind = e[0]
		dec, ra = float(e[1])*u_.degree, float(e[2])*u_.degree
		pix = np.asarray(enmap.sky2pix(map.shape, map.wcs, np.array([[dec], [ra]])))[:, 0]
		x, y = pix[1]*u, (ny-1-pix[0])*u
		if kind in ["circle", "c"]:
			r = float(e[3]) if len(e) > 3 else 10
			draw.ellipse([x-r, y-r, x+r, y+r], outline=(255, 0, 0, 255))
		elif kind in ["text", "t"]:
			draw.text((x, y), " ".join(e[3:]), fill=(0, 0, 0, 255))
		elif kind in ["point", "p"]:
			draw.ellipse([x-2, y-2, x+2, y+2], fill=(255, 0, 0, 255))
	return img


# ---------------------------------------------------------------------------
# Reference-interface compatibility layer (reference enplot.py). The drawing
# machinery above uses our own names; these provide the reference's public
# functions on top of it.
# ---------------------------------------------------------------------------
class BackendError(Exception): pass

class Printer:
	"""Leveled printer (reference enplot.Printer)."""
	def __init__(self, level=1, prefix=""):
		self.level = level
		self.prefix = prefix
	def write(self, desc, level=1, exact=None, newline=True, prepend=""):
		if level <= self.level or level == exact:
			import sys
			sys.stderr.write(prepend + self.prefix + desc + ("\n" if newline else ""))
	def push(self, desc):
		return Printer(self.level, self.prefix + desc)
	def time(self, desc, level=1, exact=None):
		class _T:
			def __enter__(s): return s
			def __exit__(s, *a): pass
		return _T()

noprint = Printer(level=0)

def get_plots(*arglist, **args):
	"""Alias of plot (reference enplot.get_plots)."""
	return plot(*arglist, **args)

def extract_arg(args, name, default):
	if name in args: return args.pop(name)
	return default

def check_args(kwargs):
	parser = define_arg_parser()
	known = set()
	for action in parser._actions:
		known.add(action.dest)
	bad = [k for k in kwargs if k not in known]
	if bad: raise ValueError("Unrecognized plot arguments: %s" % str(bad))

def get_cache(cache, key, fun):
	if cache is None: return fun()
	if key not in cache: cache[key] = fun()
	return cache[key]

def get_map(ifile, args, return_info=False, name=None):
	"""Read and massage a map according to the plot options (reference
	enplot.get_map)."""
	from . import enmap
	m = enmap.read_map(ifile) if isinstance(ifile, str) else ifile
	if getattr(args, "downgrade", None):
		m = enmap.downgrade(m, int(args.downgrade))
	if getattr(args, "autocrop", False):
		m = enmap.autocrop(m)
	if return_info:
		from .bunch import Bunch
		return m, Bunch(fname=ifile if isinstance(ifile, str) else (name or "map"),
			ishape=m.shape, names=[])
	return m

def parse_range(desc, n):
	if desc is None: return None
	parts = str(desc).split(":")
	res = np.array([float(p) for p in parts])
	return np.concatenate([res, np.repeat(res[-1:], n - len(res))])[:n]

def parse_list(desc, dtype=float, sep=","):
	if desc is None or desc == "": return []
	return [dtype(tok) for tok in str(desc).split(sep)]

def get_num_digits(n):
	return int(np.log10(max(n, 1))) + 1

def split_file_name(fname):
	"""fname -> (dirname, basename, ext) (reference enplot.split_file_name)."""
	import os
	dirname, base = os.path.split(fname)
	if not dirname: dirname = "."
	base, ext = os.path.splitext(base)
	return dirname, base, ext.lstrip(".")

def is_video_ext(ext):
	return ext.lower() in ["gif", "mp4", "webm", "avi", "mov"]

def map_to_color(map, crange, args):
	"""[{R,G,B,A},ny,nx] uint8 color map from map values and color range
	(reference enplot.map_to_color)."""
	from . import colorize
	arr = np.asarray(map)
	if arr.ndim > 2: arr = arr.reshape((-1,) + arr.shape[-2:])[0]
	x = (arr - crange[0])/max(crange[1] - crange[0], 1e-300)
	cmap = getattr(args, "color", "planck") if not isinstance(args, str) else args
	rgba = colorize.colorize(x, cmap if isinstance(cmap, str) else "planck")
	return np.moveaxis(rgba, -1, 0)

def calc_contours(crange, args):
	"""Contour levels from a value range and the contour spec (reference
	enplot.calc_contours)."""
	spec = getattr(args, "contours", None)
	if spec is None: return None
	return _contour_levels(spec, np.asarray(crange))

def parse_annotations(afile):
	"""Parse an annotation file into [[type, args...]] entries (reference
	enplot.parse_annotations)."""
	res = []
	with open(afile, "r") as f:
		for line in f:
			line = line.strip()
			if not line or line.startswith("#"): continue
			res.append(line.split())
	return res

def calc_gridinfo(shape, wcs, args):
	"""Grid-line points for the map (reference enplot.calc_gridinfo)."""
	from . import cgrid
	ticks = np.zeros(2) + (getattr(args, "ticks", 1) or 1)
	nstep = np.zeros(2, int) + (getattr(args, "nstep", 200) or 200)
	ginfo = cgrid.calc_gridinfo(shape, wcs, steps=ticks, nstep=nstep)
	ginfo.shape = tuple(shape[-2:])
	return ginfo

def draw_grid(ginfo, args):
	"""Render grid lines onto a transparent canvas (reference
	enplot.draw_grid): returns (img, bounds)."""
	from . import cgrid
	from PIL import Image
	size = tuple(int(v) for v in np.asarray(ginfo.shape[-2:])[::-1])
	img = Image.new("RGBA", size)
	img = cgrid.draw_grid(img, ginfo, color=getattr(args, "grid_color", None) or "00000020")
	bounds = np.array([[0, 0], list(img.size)])
	return img, bounds

def draw_grid_labels(ginfo, args):
	"""Render grid labels (reference enplot.draw_grid_labels): returns
	(img, bounds)."""
	from . import cgrid
	from PIL import Image
	size = tuple(int(v) for v in np.asarray(ginfo.shape[-2:])[::-1])
	img = Image.new("RGBA", size)
	labels = cgrid.calc_label_pos(ginfo, ginfo.shape[-2:])
	img = cgrid.draw_labels(img, labels, fsize=getattr(args, "font_size", 16))
	bounds = np.array([[0, 0], list(img.size)])
	return img, bounds

def standardize_images(tuples):
	"""Composite (img, bounds) layers onto a common canvas (reference
	enplot.standardize_images)."""
	from PIL import Image
	boxes = np.array([np.asarray(b) for i, b in tuples if b is not None])
	if len(boxes) == 0:
		return [i for i, b in tuples]
	lo = boxes[:, 0].min(0)
	hi = boxes[:, 1].max(0)
	size = tuple((hi - lo).astype(int))
	out = []
	for img, b in tuples:
		canvas = Image.new("RGBA", size)
		off = tuple((np.asarray(b)[0] - lo).astype(int)) if b is not None else (0, 0)
		canvas.paste(img, off)
		out.append(canvas)
	return out

def merge_images(images):
	"""Alpha-composite a list of same-size images (reference
	enplot.merge_images)."""
	from PIL import Image
	out = images[0].convert("RGBA")
	for img in images[1:]:
		out = Image.alpha_composite(out, img.convert("RGBA"))
	return out

def merge_plots(plots):
	from .bunch import Bunch
	imgs = [p.img for p in plots]
	return Bunch(img=merge_images(imgs), name=plots[0].name if plots else "")

def prepare_map_field(map, args, crange=None, printer=noprint):
	"""Color-range + massaging for a single field (reference
	enplot.prepare_map_field)."""
	arr = np.asarray(map)
	if crange is None:
		crange = get_color_range(arr,
			quantile=getattr(args, "quantile", 0.01) or 0.01)
	return map, crange

def makefoot(n):
	"""Circular morphology footprint (reference enplot.makefoot)."""
	y, x = np.mgrid[-n:n+1, -n:n+1]
	return ((y**2 + x**2) <= n**2).astype(np.int32)

def contour_widen(cmap, width):
	"""Widen contour lines by morphological dilation (reference
	enplot.contour_widen)."""
	from scipy import ndimage
	if width <= 1: return cmap
	return ndimage.grey_dilation(cmap, footprint=makefoot(int(width)))

def draw_ellipse(image, bounds, width=1, outline="white", antialias=1):
	"""Antialiased ellipse outline (reference enplot.draw_ellipse)."""
	from PIL import Image, ImageDraw
	mask = Image.new("L", (int(image.size[0]*antialias), int(image.size[1]*antialias)), 0)
	draw = ImageDraw.Draw(mask)
	for off, fill in [(width/-2.0, "white"), (width/2.0, "black")]:
		left, top = [(v + off)*antialias for v in bounds[:2]]
		right, bottom = [(v - off)*antialias for v in bounds[2:]]
		draw.ellipse([left, top, right, bottom], fill=fill)
	mask = mask.resize(image.size, Image.LANCZOS)
	result = image.copy()
	result.paste(outline, mask=mask)
	return result

def hwexpand(m, nrow=-1, ncol=-1, transpose=False, dims=None):
	"""Stack maps [n,ny,nx] -> [nrow,ncol,ny,nx] (reference enplot.hwexpand)."""
	m = np.asarray(m)
	m = m.reshape((-1,) + m.shape[-2:])
	n = m.shape[0]
	if nrow < 0 and ncol < 0: ncol = int(np.ceil(n**0.5))
	if nrow < 0: nrow = (n + ncol - 1)//ncol
	if ncol < 0: ncol = (n + nrow - 1)//nrow
	out = np.zeros((nrow, ncol) + m.shape[-2:], m.dtype)
	for i in range(n):
		r, c = (i//ncol, i % ncol) if not transpose else (i % nrow, i//nrow)
		out[r, c] = m[i]
	return out

def hwstack(mexp):
	"""[nrow,ncol,ny,nx] -> [nrow*ny, ncol*nx] (reference enplot.hwstack)."""
	mexp = np.asarray(mexp)
	nrow, ncol, ny, nx = mexp.shape[-4:]
	out = np.moveaxis(mexp, -3, -2)
	return out.reshape(mexp.shape[:-4] + (nrow*ny, ncol*nx))

def extract_stamps(map, args):
	"""Stack of postage stamps from args.stamps (reference
	enplot.extract_stamps)."""
	from . import enmap
	spec = getattr(args, "stamps", None)
	if spec is None: return map
	toks = str(spec).split(":")
	srcfile = toks[0]
	size = int(toks[1]) if len(toks) > 1 else 16
	srcs = np.loadtxt(srcfile, ndmin=2).T
	pixs = np.round(np.asarray(enmap.sky2pix(map.shape, map.wcs,
		srcs[:2]*np.pi/180))).astype(int)
	stamps = []
	for py, px in pixs.T:
		stamps.append(np.asarray(map)[..., py-size//2:py+size//2, px-size//2:px+size//2])
	return np.array(stamps)

def draw_map_field_mpl(map, args, crange=None, printer=noprint):
	"""Matplotlib rendering path (reference enplot.draw_map_field_mpl)."""
	import matplotlib
	matplotlib.use("Agg")
	import matplotlib.pyplot as plt
	import io
	from PIL import Image
	arr = np.asarray(map)
	if arr.ndim > 2: arr = arr.reshape((-1,) + arr.shape[-2:])[0]
	if crange is None: crange = get_color_range(arr)
	fig, ax = plt.subplots()
	im = ax.imshow(arr, vmin=crange[0], vmax=crange[1], origin="lower")
	fig.colorbar(im)
	buf = io.BytesIO()
	fig.savefig(buf, format="png")
	plt.close(fig)
	buf.seek(0)
	return Image.open(buf)

def show(img, title=None, method="auto"):
	"""Display an image interactively (reference enplot.show)."""
	methods = {"ipython": show_ipython, "tk": show_tk, "wx": show_wx,
		"qt": show_qt}
	if method != "auto":
		return methods[method](img, title=title)
	for m in ["ipython", "tk", "qt", "wx"]:
		try:
			return methods[m](img, title=title)
		except BackendError:
			continue
		except Exception:
			continue
	raise BackendError("Could not find any working display backends")

def show_ipython(img, title=None):
	try:
		from IPython.display import display
	except ImportError:
		raise BackendError("ipython backend unavailable")
	try:
		get_ipython
	except NameError:
		raise BackendError("not in an ipython session")
	plots = img if isinstance(img, list) else [img]
	for p in plots:
		display(getattr(p, "img", p))

def show_tk(img, title=None):
	try:
		import tkinter
		from PIL import ImageTk
	except ImportError:
		raise BackendError("tk backend unavailable")
	plots = img if isinstance(img, list) else [img]
	root = tkinter.Tk()
	if title: root.title(str(title))
	im = getattr(plots[0], "img", plots[0])
	photo = ImageTk.PhotoImage(im)
	label = tkinter.Label(root, image=photo)
	label.pack()
	root.mainloop()

def show_wx(img, title=None):
	raise BackendError("wx backend not available")

def show_qt(img, title=None):
	raise BackendError("qt backend not available")
