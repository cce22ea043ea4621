"""Geometry semantics tests (modeled on reference tests/test_geom.py)."""
import numpy as np
import pytest
from pixell_tpu import enmap, wcsutils, utils

def test_fullsky_geometry_cc():
	shape, wcs = enmap.fullsky_geometry(res=1*utils.degree, variant="cc")
	assert shape == (181, 360)
	# pole pixel centers
	dec0 = enmap.pix2sky(shape, wcs, np.array([0.0, 0.0]))[0]
	dec1 = enmap.pix2sky(shape, wcs, np.array([shape[-2]-1.0, 0.0]))[0]
	assert np.allclose(float(dec0), -np.pi/2)
	assert np.allclose(float(dec1),  np.pi/2)

def test_fullsky_geometry_fejer1():
	shape, wcs = enmap.fullsky_geometry(res=1*utils.degree, variant="fejer1")
	assert shape == (180, 360)
	dec0 = enmap.pix2sky(shape, wcs, np.array([0.0, 0.0]))[0]
	assert np.allclose(float(dec0), -np.pi/2 + 0.5*utils.degree)

def test_pix2sky_roundtrip():
	shape, wcs = enmap.fullsky_geometry(res=0.5*utils.degree, variant="cc")
	pix = np.array([[10.0, 100.5], [20.0, 300.25]])
	pos = enmap.pix2sky(shape, wcs, pix)
	pix2 = enmap.sky2pix(shape, wcs, pos)
	assert np.allclose(np.asarray(pix2), pix, atol=1e-8)

def test_slice_geometry():
	shape, wcs = enmap.fullsky_geometry(res=1*utils.degree, variant="cc")
	pos_orig = np.asarray(enmap.pix2sky(shape, wcs, np.array([[10.0], [20.0]])))
	shape2, wcs2 = enmap.slice_geometry(shape, wcs, (slice(5, 50), slice(10, 100)))
	assert shape2 == (45, 90)
	pos_new = np.asarray(enmap.pix2sky(shape2, wcs2, np.array([[5.0], [10.0]])))
	assert np.allclose(pos_orig, pos_new)

def test_slice_geometry_step():
	shape, wcs = enmap.fullsky_geometry(res=1*utils.degree, variant="cc")
	shape2, wcs2 = enmap.slice_geometry(shape, wcs, (slice(0, 180, 2), slice(0, 360, 3)))
	p_old = np.asarray(enmap.pix2sky(shape, wcs, np.array([[6.0], [9.0]])))
	p_new = np.asarray(enmap.pix2sky(shape2, wcs2, np.array([[3.0], [3.0]])))
	assert np.allclose(p_old, p_new)

def test_area_fullsky():
	shape, wcs = enmap.fullsky_geometry(res=1*utils.degree, variant="cc")
	assert abs(enmap.area(shape, wcs)/(4*np.pi) - 1) < 1e-6

def test_zenithal():
	for proj in ["tan", "zea", "arc", "sin"]:
		shape, wcs = enmap.thumbnail_geometry(r=1*utils.degree, res=0.1*utils.degree, proj=proj)
		# center pixel is at (0,0)
		cpix = np.array(shape[-2:])//2
		pos = np.asarray(enmap.pix2sky(shape, wcs, cpix.astype(float)))
		assert np.allclose(pos, 0, atol=1e-10), proj
		# round trip
		pix = np.array([[3.0, 14.0], [4.0, 17.0]])
		pos = enmap.pix2sky(shape, wcs, pix)
		pix2 = enmap.sky2pix(shape, wcs, pos)
		assert np.allclose(np.asarray(pix2), pix, atol=1e-7), proj

def test_zenithal_offcenter():
	# projection centered away from the pole must still round-trip
	wcs = wcsutils.tan([30.0, 45.0], res=[0.1, 0.1], shape=(21, 21))
	shape = (21, 21)
	pix = np.array([[3.0, 14.0], [4.0, 17.0]])
	pos = enmap.pix2sky(shape, wcs, pix)
	pix2 = enmap.sky2pix(shape, wcs, pos)
	assert np.allclose(np.asarray(pix2), pix, atol=1e-7)

def test_cea_roundtrip():
	wcs = wcsutils.cea([0.0, 0.0], res=[0.5, 0.5], shape=(100, 100))
	shape = (100, 100)
	pix = np.array([[3.0, 44.0], [4.0, 87.0]])
	pos = enmap.pix2sky(shape, wcs, pix)
	pix2 = enmap.sky2pix(shape, wcs, pos)
	assert np.allclose(np.asarray(pix2), pix, atol=1e-7)

def test_extent_cyl():
	shape, wcs = enmap.fullsky_geometry(res=1*utils.degree, variant="cc")
	ext = enmap.extent(shape, wcs)
	assert np.allclose(ext[0], np.pi, rtol=1e-2)

def test_pixsizemap_sums_to_area():
	shape, wcs = enmap.fullsky_geometry(res=2*utils.degree, variant="cc")
	psm = np.asarray(enmap.pixsizemap(shape, wcs))
	assert abs(psm.sum()/(4*np.pi) - 1) < 1e-6

def test_geometry_builder():
	box = np.array([[-5, 10], [5, -10]])*utils.degree
	shape, wcs = enmap.geometry(pos=box, res=0.5*utils.degree, proj="car")
	assert shape[-2] == 20 and shape[-1] == 40
	# corners roughly at box
	c = enmap.corners(shape, wcs)
	assert np.allclose(np.sort(c[:, 0]), np.sort(box[:, 0]), atol=utils.degree)

def test_band_geometry():
	shape, wcs = enmap.band_geometry(30*utils.degree, res=1*utils.degree)
	assert shape[-1] == 360
	assert abs(shape[-2] - 60) <= 1

def test_downgrade_geometry():
	shape, wcs = enmap.fullsky_geometry(res=0.5*utils.degree, variant="cc")
	shape2, wcs2 = enmap.downgrade_geometry(shape, wcs, 2)
	# pixel centers of downgraded geometry = average of the 2x2 blocks
	p_big = np.asarray(enmap.pix2sky(shape2, wcs2, np.array([[3.0], [4.0]])))
	p_sub = np.asarray(enmap.pix2sky(shape, wcs, np.array([[6.5], [8.5]])))
	assert np.allclose(p_big, p_sub)
