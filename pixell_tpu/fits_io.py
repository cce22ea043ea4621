"""Minimal pure-python FITS image I/O.

The environment has no astropy, so we implement the small subset of FITS
needed for sky maps ourselves (reference relies on astropy.io.fits,
pixell/enmap.py:2962-3110): primary-HDU images (+ extension image HDUs),
standard 2880-byte blocking, big-endian data, BZERO/BSCALE, and .gz files.
"""
from __future__ import annotations
import gzip
import numpy as np

BLOCK = 2880
CARD  = 80

_bitpix2dtype = {8: np.uint8, 16: ">i2", 32: ">i4", 64: ">i8",
	-32: ">f4", -64: ">f8"}
_dtype2bitpix = {"uint8": 8, "int16": 16, "int32": 32, "int64": 64,
	"float32": -32, "float64": -64}


def _format_card(key, value, comment=None):
	if key == "END": return "END".ljust(CARD)
	if key in ["COMMENT", "HISTORY"]:
		return ("%-8s%s" % (key, value))[:CARD].ljust(CARD)
	if isinstance(value, bool):
		vs = "T" if value else "F"
		card = "%-8s= %20s" % (key, vs)
	elif isinstance(value, (int, np.integer)):
		card = "%-8s= %20d" % (key, value)
	elif isinstance(value, (float, np.floating)):
		card = "%-8s= %20s" % (key, _ffmt(value))
	else:
		vs = "'%-8s'" % str(value).replace("'", "''")
		card = "%-8s= %-20s" % (key, vs)
	if comment:
		card += " / " + comment
	return card[:CARD].ljust(CARD)

def _ffmt(v):
	s = repr(float(v))
	if "e" in s or "E" in s or "." in s or "nan" in s or "inf" in s:
		return s.upper().replace("INF", "9E99")
	return s + ".0"

def _parse_value(raw):
	raw = raw.strip()
	if raw.startswith("'"):
		end = raw.rfind("'")
		return raw[1:end].rstrip()
	if raw in ["T", "F"]: return raw == "T"
	try: return int(raw)
	except ValueError: pass
	try: return float(raw.replace("D", "E").replace("d", "e"))
	except ValueError: return raw

def _parse_header(f):
	"""Read header blocks from file object. Returns (dict, ordered keys)."""
	hdr = {}
	done = False
	nread = 0
	while not done:
		block = f.read(BLOCK)
		nread += len(block)
		if len(block) < BLOCK:
			if not hdr: return None
			raise IOError("Unexpected end of FITS header")
		for i in range(0, BLOCK, CARD):
			card = block[i:i+CARD].decode("ascii", "replace")
			key = card[:8].strip()
			if key == "END":
				done = True
				break
			if not key or card[8:10] != "= ":
				if key in ["COMMENT", "HISTORY"]:
					hdr.setdefault(key, []); hdr[key].append(card[8:].strip())
				continue
			rest = card[10:]
			slash = _find_comment(rest)
			hdr[key] = _parse_value(rest[:slash])
	return hdr

def _find_comment(s):
	instr = False
	for i, c in enumerate(s):
		if c == "'": instr = not instr
		elif c == "/" and not instr: return i
	return len(s)

def _open(fname, mode="rb"):
	if fname.endswith(".gz"): return gzip.open(fname, mode)
	return open(fname, mode)


def read_header(fname, hdu=0):
	"""Return (shape, header dict) for the given HDU."""
	with _open(fname) as f:
		h = _skip_to_hdu(f, hdu)
		shape = _hdr_shape(h)
		return shape, h

def _hdr_shape(h):
	naxis = int(h.get("NAXIS", 0))
	return tuple(int(h["NAXIS%d" % i]) for i in range(naxis, 0, -1))

def _data_size(h):
	shape = _hdr_shape(h)
	bitpix = int(h["BITPIX"])
	n = int(abs(bitpix)//8*np.prod(shape)) if shape else 0
	return (n + BLOCK - 1)//BLOCK*BLOCK

def _skip_to_hdu(f, hdu):
	i = 0
	while True:
		h = _parse_header(f)
		if h is None: raise IOError("HDU %d not found" % hdu)
		if i == hdu: return h
		f.seek(_data_size(h), 1)
		i += 1

def read_map(fname, hdu=0):
	"""Read image data and header from a FITS file. Returns (array, header).
	If hdu 0 has no data, falls through to the first HDU with data."""
	with _open(fname) as f:
		i = 0
		while True:
			h = _parse_header(f)
			if h is None: raise IOError("No image HDU with data found in %s" % fname)
			shape = _hdr_shape(h)
			if i >= hdu and shape and np.prod(shape) > 0:
				break
			f.seek(_data_size(h), 1)
			i += 1
		bitpix = int(h["BITPIX"])
		dtype = np.dtype(_bitpix2dtype[bitpix])
		count = int(np.prod(shape))
		data = np.frombuffer(f.read(count*dtype.itemsize), dtype=dtype, count=count)
		data = data.reshape(shape)
		data = data.astype(data.dtype.newbyteorder("="))
		bscale = h.get("BSCALE", 1); bzero = h.get("BZERO", 0)
		if bscale != 1 or bzero != 0:
			data = data*bscale + bzero
		return data, h

def write_map(fname, data, header=None, dtype=None):
	"""Write an image array to a FITS file with the given extra header cards
	(e.g. from wcs.to_header())."""
	data = np.asarray(data)
	if dtype is not None: data = data.astype(dtype)
	if data.dtype == np.float16: data = data.astype(np.float32)
	if str(data.dtype) not in _dtype2bitpix:
		data = data.astype(np.float64)
	bitpix = _dtype2bitpix[str(data.dtype)]
	cards = []
	cards.append(_format_card("SIMPLE", True, "pixell_tpu"))
	cards.append(_format_card("BITPIX", bitpix))
	cards.append(_format_card("NAXIS", data.ndim))
	for i in range(data.ndim):
		cards.append(_format_card("NAXIS%d" % (i+1), data.shape[data.ndim-1-i]))
	if header:
		for k, v in header.items():
			if k in ["SIMPLE", "BITPIX", "NAXIS"] or k.startswith("NAXIS"): continue
			cards.append(_format_card(k, v))
	cards.append(_format_card("END", None))
	htext = "".join(cards)
	npad = (-len(htext)) % BLOCK
	htext += " "*npad
	raw = data.astype(np.dtype(_bitpix2dtype[bitpix])).tobytes()
	dpad = (-len(raw)) % BLOCK
	with _open(fname, "wb") as f:
		f.write(htext.encode("ascii"))
		f.write(raw)
		f.write(b"\x00"*dpad)

# ---------------------------------------------------------------------------
# Native C++ fast path (cpp/fitsio_core.cpp via ctypes): header parsing and
# threaded partial (pixel-box) reads without loading the whole image -- the
# counterpart of the reference's ndmap_proxy delayed reads
# (pixell/enmap.py:3139-3233).
# ---------------------------------------------------------------------------
import ctypes as _ct
import os as _os

_core = None
def _get_core():
	global _core
	if _core is not None: return _core
	base = _os.path.join(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))), "cpp")
	path = _os.path.join(base, "libfitsio_core.so")
	if not _os.path.exists(path):
		# try building it
		try:
			import subprocess
			subprocess.run(["make", "-C", base], capture_output=True, timeout=120)
		except Exception:
			pass
	if not _os.path.exists(path):
		_core = False
		return _core
	try:
		lib = _ct.CDLL(path)
		lib.fits_open_info.restype = _ct.c_int
		lib.fits_read_box.restype = _ct.c_int
		_core = lib
	except OSError:
		_core = False
	return _core

class FitsProxy:
	"""Delayed-read handle on a FITS image: slicing reads only the needed
	pixel box from disk (native threaded reads when the C++ core is built,
	pure-python fallback otherwise)."""
	def __init__(self, fname, hdu=0):
		self.fname = fname
		self.hdu = hdu
		core = _get_core()
		if core and not fname.endswith(".gz"):
			doff = _ct.c_long(); bp = _ct.c_int(); nax = _ct.c_int()
			dims = (_ct.c_long*8)()
			hbuf = _ct.create_string_buffer(1 << 20)
			hlen = _ct.c_long()
			err = core.fits_open_info(fname.encode(), hdu, _ct.byref(doff),
				_ct.byref(bp), _ct.byref(nax), dims, hbuf, _ct.c_long(1 << 20),
				_ct.byref(hlen))
			if err == 0:
				self.native = True
				self.data_offset = doff.value
				self.bitpix = bp.value
				fits_dims = [dims[i] for i in range(nax.value)]
				self.shape = tuple(fits_dims[::-1])
				import io
				self.header = _parse_header(io.BytesIO(
					hbuf.raw[:hlen.value] + b" "*((-hlen.value) % BLOCK)))
				return
		self.native = False
		self.shape, self.header = read_header(fname, hdu=hdu)
		self.bitpix = int(self.header["BITPIX"])
	@property
	def dtype(self):
		return np.dtype(_bitpix2dtype[self.bitpix]).newbyteorder("=")
	@property
	def ndim(self): return len(self.shape)
	def __getitem__(self, sel):
		"""Basic slicing; reads only the necessary rows/cols from disk."""
		if not isinstance(sel, tuple): sel = (sel,)
		full = [slice(None)]*self.ndim
		for i, s in enumerate(sel): full[i] = s
		# resolve the pixel box over the last two axes
		ny, nx = self.shape[-2], self.shape[-1]
		ysel = full[-2] if self.ndim >= 2 else slice(None)
		xsel = full[-1]
		y1, y2, ystep = (ysel.indices(ny) if isinstance(ysel, slice) else (ysel, ysel+1, 1))
		x1, x2, xstep = (xsel.indices(nx) if isinstance(xsel, slice) else (xsel, xsel+1, 1))
		npre = int(np.prod(self.shape[:-2])) if self.ndim > 2 else 1
		if self.native and y2 > y1 and x2 > x1:
			width = abs(self.bitpix)//8
			out = np.empty((npre, y2-y1, x2-x1), self.dtype)
			core = _get_core()
			err = core.fits_read_box(self.fname.encode(),
				_ct.c_long(self.data_offset), self.bitpix,
				_ct.c_long(npre), _ct.c_long(ny), _ct.c_long(nx),
				_ct.c_long(y1), _ct.c_long(y2), _ct.c_long(x1), _ct.c_long(x2),
				out.ctypes.data_as(_ct.POINTER(_ct.c_ubyte)))
			if err == 0:
				data = out.reshape(self.shape[:-2] + (y2-y1, x2-x1))
				# apply remaining (pre-axis and step) selections in memory
				presel = tuple(full[:-2]) + (slice(None, None, ystep), slice(None, None, xstep))
				res = data[presel]
				if not isinstance(ysel, slice): res = res[..., 0, :]
				if not isinstance(xsel, slice): res = res[..., 0]
				return res
		# fallback: full read then slice
		data, _ = read_map(self.fname, hdu=self.hdu)
		return data[tuple(full[:len(sel)])] if sel else data

def open_proxy(fname, hdu=0):
	return FitsProxy(fname, hdu=hdu)


# ---------------------------------------------------------------------------
# Binary table (BINTABLE) read support, for catalogs (reference reads these
# via astropy in pointsrcs.py:495-637).
# ---------------------------------------------------------------------------
_tform2dtype = {"L": "?", "B": "u1", "I": ">i2", "J": ">i4", "K": ">i8",
	"E": ">f4", "D": ">f8", "C": ">c8", "M": ">c16", "A": "S"}

def _parse_tform(tform):
	"""'1E', '16A', 'D' -> (count, dtype char)."""
	tform = tform.strip()
	i = 0
	while i < len(tform) and tform[i].isdigit(): i += 1
	count = int(tform[:i]) if i > 0 else 1
	code = tform[i]
	return count, code

def read_table(fname, hdu=None):
	"""Read the first BINTABLE HDU (or the given one) as a dict of numpy
	column arrays keyed by TTYPE name."""
	with _open(fname) as f:
		i = 0
		while True:
			h = _parse_header(f)
			if h is None: raise IOError("No binary table HDU found in %s" % fname)
			is_table = str(h.get("XTENSION", "")).strip().upper().startswith("BINTABLE")
			if is_table and (hdu is None or i == hdu):
				break
			f.seek(_data_size_table(h), 1)
			i += 1
		nrow = int(h["NAXIS2"])
		rowbytes = int(h["NAXIS1"])
		ncol = int(h["TFIELDS"])
		names, dtypes = [], []
		for c in range(1, ncol+1):
			name = str(h.get("TTYPE%d" % c, "col%d" % c)).strip()
			count, code = _parse_tform(str(h["TFORM%d" % c]))
			if code == "A":
				dt = "S%d" % count
				names.append(name); dtypes.append((name, dt))
			else:
				dt = _tform2dtype[code]
				names.append(name)
				dtypes.append((name, dt, (count,)) if count > 1 else (name, dt))
		rec = np.dtype(dtypes)
		if rec.itemsize != rowbytes:
			# columns we don't understand: pad
			dtypes.append(("_pad", "V%d" % (rowbytes - rec.itemsize)))
			rec = np.dtype(dtypes)
		raw = f.read(nrow*rowbytes)
		data = np.frombuffer(raw, dtype=rec, count=nrow)
		out = {}
		for ci, name in enumerate(names):
			col = data[name]
			if col.dtype.kind in "iufc":
				col = col.astype(col.dtype.newbyteorder("="))
			elif col.dtype.kind == "S":
				col = np.char.decode(col, "ascii")
			tdim = h.get("TDIM%d" % (ci+1))
			if tdim:
				sub = tuple(int(t) for t in str(tdim).strip("() ").split(","))[::-1]
				col = col.reshape((nrow,) + sub)
			out[name] = col
		out["_header"] = h
		return out

def _data_size_table(h):
	naxis = int(h.get("NAXIS", 0))
	if naxis == 0: return 0
	n = int(h.get("BITPIX", 8))
	size = abs(n)//8
	for i in range(1, naxis+1):
		size *= int(h["NAXIS%d" % i])
	size *= int(h.get("PCOUNT", 0)) and 1 or 1
	size += int(h.get("PCOUNT", 0))
	return (size + BLOCK - 1)//BLOCK*BLOCK

def write_table_fits(fname, columns, header=None):
	"""Write a dict of 1D numpy columns as a BINTABLE extension."""
	names = [k for k in columns if not k.startswith("_")]
	dtypes = []
	fits_cols = []
	code_map = {"?": "L", "u1": "B", "i2": "I", "i4": "J", "i8": "K",
		"f4": "E", "f8": "D", "c8": "C", "c16": "M"}
	for name in names:
		col = np.asarray(columns[name])
		sub = col.shape[1:]
		count = int(np.prod(sub)) if sub else 1
		if col.dtype.kind == "U":
			w = max(int(col.dtype.itemsize//4), 1)
			dtypes.append((name, "S%d" % w)); fits_cols.append((name, "%dA" % w))
		else:
			key = col.dtype.str.lstrip("<>=|")
			code = code_map[key]
			dt = (name, ">" + key, sub) if sub else (name, ">" + key)
			dtypes.append(dt)
			fits_cols.append((name, ("%d%s" % (count, code)) if count > 1 else code))
	rec = np.dtype(dtypes)
	data = np.zeros(len(np.asarray(columns[names[0]])), rec)
	for name in names:
		col = np.asarray(columns[name])
		data[name] = col.astype(rec[name].base if rec[name].subdtype else rec[name]) \
			if col.dtype.kind != "U" else col.astype("S")
	cards = [
		_format_card("SIMPLE", True), _format_card("BITPIX", 8),
		_format_card("NAXIS", 0), _format_card("END", None)]
	prim = "".join(cards)
	prim += " "*((-len(prim)) % BLOCK)
	tcards = [
		_format_card("XTENSION", "BINTABLE"), _format_card("BITPIX", 8),
		_format_card("NAXIS", 2), _format_card("NAXIS1", rec.itemsize),
		_format_card("NAXIS2", len(data)), _format_card("PCOUNT", 0),
		_format_card("GCOUNT", 1), _format_card("TFIELDS", len(names))]
	for i, (name, code) in enumerate(fits_cols):
		tcards.append(_format_card("TTYPE%d" % (i+1), name))
		tcards.append(_format_card("TFORM%d" % (i+1), code))
		sub = np.asarray(columns[name]).shape[1:]
		if len(sub) > 1:
			tcards.append(_format_card("TDIM%d" % (i+1),
				"(" + ",".join(str(n) for n in sub[::-1]) + ")"))
	if header:
		for k, v in header.items(): tcards.append(_format_card(k, v))
	tcards.append(_format_card("END", None))
	thdr = "".join(tcards)
	thdr += " "*((-len(thdr)) % BLOCK)
	raw = data.tobytes()
	with _open(fname, "wb") as f:
		f.write(prim.encode("ascii"))
		f.write(thdr.encode("ascii"))
		f.write(raw)
		f.write(b"\x00"*((-len(raw)) % BLOCK))
