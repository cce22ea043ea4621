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
	def __init__(self, fname):
		self.fname = fname
	def write(self, plots): return write(self.fname, plots)

class PlotWriter(Writer): pass

class VideoWriter(Writer):
	"""Accumulate frames and save as animated gif (the reference shells out
	to ffmpeg, enplot.VideoWriter:1139)."""
	def __init__(self, fname, fps=10):
		super().__init__(fname)
		self.frames = []
		self.fps = fps
	def add(self, plots):
		p = plots[0] if isinstance(plots, (list, tuple)) else plots
		self.frames.append(p.img.convert("RGB"))
	def finish(self):
		if not self.frames: return
		self.frames[0].save(self.fname, save_all=True,
			append_images=self.frames[1:], duration=int(1000/self.fps), loop=0)


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
