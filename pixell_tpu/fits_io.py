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

def write_table(fname, columns, names):
	"""Very small ASCII-table stand-in: writes a numpy .npy-backed FITS-like
	binary table is out of scope; use write_map for images."""
	raise NotImplementedError("Binary tables not supported; use hdf5 for catalogs")
