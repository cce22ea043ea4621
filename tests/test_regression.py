"""Golden-fixture regression tests driven by tests/tests.yml
(reference test strategy: tests/tests.yml + get_reference_pixels,
test_pixell.py:32,162)."""
import os
import numpy as np
import yaml
import pytest
from pixell_tpu import enmap, curvedsky, utils

HERE = os.path.dirname(__file__)

@pytest.fixture(scope="module")
def golden():
	with open(os.path.join(HERE, "tests.yml")) as f:
		spec = yaml.safe_load(f)
	data = np.load(os.path.join(HERE, "data", "golden.npz"))
	return spec, data

def build_geometry(gspec):
	if gspec["type"] == "fullsky":
		return enmap.fullsky_geometry(res=gspec["res_deg"]*utils.degree,
			variant=gspec.get("variant", "fejer1"))
	if gspec["type"] == "band":
		return enmap.band_geometry(gspec["dec_deg"]*utils.degree,
			res=gspec["res_deg"]*utils.degree)
	if gspec["type"] == "box":
		box = np.array(gspec["box_deg"], float)*utils.degree
		return enmap.geometry(pos=box, res=gspec["res_deg"]*utils.degree, proj="car")
	raise ValueError(gspec["type"])

def test_rand_alm_reproducible(golden):
	spec, data = golden
	lmax = spec["lmax"]
	cl = np.zeros(lmax+1); l = np.arange(lmax+1)
	cl[2:] = 1000.0/(l[2:]*(l[2:]+1))
	alm = np.asarray(curvedsky.rand_alm(cl, lmax=lmax, seed=spec["seed"]))
	assert np.allclose(alm.real, data["alm_re"], atol=1e-12)
	assert np.allclose(alm.imag, data["alm_im"], atol=1e-12)

def test_map_reference_pixels(golden):
	spec, data = golden
	lmax = spec["lmax"]
	cl = np.zeros(lmax+1); l = np.arange(lmax+1)
	cl[2:] = 1000.0/(l[2:]*(l[2:]+1))
	alm = np.asarray(curvedsky.rand_alm(cl, lmax=lmax, seed=spec["seed"]))
	refpix = np.array(spec["reference_pixels"])
	fullsky = None
	for name, gspec in spec["geometries"].items():
		shape, wcs = build_geometry(gspec)
		assert np.array_equal(np.array(shape), data["map_%s_shape" % name]), name
		m = curvedsky.alm2map(alm, enmap.zeros(shape, wcs))
		arr = np.asarray(m)
		vals = np.array([arr[tuple(p)] for p in refpix])
		assert np.allclose(vals, data["map_%s_refvals" % name], atol=1e-8), name
		if name == "fullsky": fullsky = m
	# extraction (including RA-wrap geometries) from a 2-degree fullsky map
	fs2_shape, fs2_wcs = enmap.fullsky_geometry(res=2.0*utils.degree, variant="fejer1")
	fullsky2 = curvedsky.alm2map(alm, enmap.zeros(fs2_shape, fs2_wcs))
	for name, gspec in spec["geometries"].items():
		key = "extract_%s_refvals" % name
		if key not in data: continue
		shape, wcs = build_geometry(gspec)
		sub = enmap.extract(fullsky2, shape, wcs)
		vals = np.array([np.asarray(sub)[tuple(p)] for p in refpix])
		assert np.allclose(vals, data[key], atol=1e-8), name
