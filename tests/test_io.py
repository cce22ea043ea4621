"""I/O round-trip tests (modeled on reference tests/test_io.py)."""
import numpy as np
import pytest
from pixell_tpu import enmap, utils, wcsutils


def geo():
	return enmap.geometry(pos=np.array([[-5, 10], [5, -10]])*utils.degree,
		res=0.5*utils.degree, proj="car")

@pytest.mark.parametrize("ext", ["fits", "hdf", "fits.gz"])
def test_roundtrip(ext, tmp_path):
	shape, wcs = geo()
	rng = np.random.default_rng(1)
	m = enmap.ndmap(rng.standard_normal((3,)+shape).astype(np.float32), wcs)
	fname = str(tmp_path/("map." + ext))
	enmap.write_map(fname, m)
	m2 = enmap.read_map(fname)
	assert m2.shape == m.shape
	assert m2.dtype == m.dtype
	assert np.allclose(np.asarray(m2), np.asarray(m))
	assert wcsutils.is_compatible(m.wcs, m2.wcs)
	p1 = np.asarray(m.pix2sky(np.array([[1.0], [2.0]])))
	p2 = np.asarray(m2.pix2sky(np.array([[1.0], [2.0]])))
	assert np.allclose(p1, p2)

def test_read_sel(tmp_path):
	shape, wcs = geo()
	rng = np.random.default_rng(2)
	m = enmap.ndmap(rng.standard_normal((3,)+shape), wcs)
	fname = str(tmp_path/"sel.fits")
	enmap.write_map(fname, m)
	sub = enmap.read_map(fname + ":[0,2:8]")
	assert np.allclose(np.asarray(sub), np.asarray(m)[0, 2:8])
	sub2 = enmap.read_map(fname, sel=np.s_[1, :, 4:10])
	assert np.allclose(np.asarray(sub2), np.asarray(m)[1, :, 4:10])

def test_read_geometry(tmp_path):
	shape, wcs = geo()
	m = enmap.zeros((2,)+shape, wcs)
	fname = str(tmp_path/"geo.fits")
	enmap.write_map(fname, m)
	shape2, wcs2 = enmap.read_map_geometry(fname)
	assert tuple(shape2) == (2,)+tuple(shape)
	assert wcsutils.equal(wcs, wcs2, tol=1e-9)

def test_read_box(tmp_path):
	shape, wcs = geo()
	rng = np.random.default_rng(3)
	m = enmap.ndmap(rng.standard_normal(shape), wcs)
	fname = str(tmp_path/"box.fits")
	enmap.write_map(fname, m)
	box = np.array([[-2, 4], [2, -4]])*utils.degree
	sub = enmap.read_map(fname, box=box)
	want = m.submap(box)
	assert np.allclose(np.asarray(sub), np.asarray(want))

def test_int_dtypes(tmp_path):
	shape, wcs = geo()
	m = enmap.ndmap(np.arange(np.prod(shape), dtype=np.int32).reshape(shape), wcs)
	fname = str(tmp_path/"int.fits")
	enmap.write_map(fname, m)
	m2 = enmap.read_map(fname)
	assert m2.dtype == np.int32
	assert np.array_equal(np.asarray(m2), np.asarray(m))
