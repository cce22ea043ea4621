#!/usr/bin/env python
"""Generate golden regression fixtures from tests/tests.yml (the analogue of
the reference's scripts/generate_tests/pixel_test_generator.py)."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
import yaml

def build_geometry(spec):
	from pixell_tpu import enmap, utils
	if spec["type"] == "fullsky":
		return enmap.fullsky_geometry(res=spec["res_deg"]*utils.degree,
			variant=spec.get("variant", "fejer1"))
	if spec["type"] == "band":
		return enmap.band_geometry(spec["dec_deg"]*utils.degree,
			res=spec["res_deg"]*utils.degree)
	if spec["type"] == "box":
		box = np.array(spec["box_deg"], float)*utils.degree
		return enmap.geometry(pos=box, res=spec["res_deg"]*utils.degree, proj="car")
	raise ValueError(spec["type"])

def main():
	from pixell_tpu import enmap, curvedsky, utils
	with open(os.path.join(os.path.dirname(__file__), "..", "tests", "tests.yml")) as f:
		spec = yaml.safe_load(f)
	lmax = spec["lmax"]
	cl = np.zeros(lmax+1); l = np.arange(lmax+1)
	cl[2:] = 1000.0/(l[2:]*(l[2:]+1))
	alm = curvedsky.rand_alm(cl, lmax=lmax, seed=spec["seed"])
	out = {"alm_re": np.asarray(alm).real, "alm_im": np.asarray(alm).imag}
	# a 2-degree fullsky map as the extraction source for the box geometries
	fs2_shape, fs2_wcs = enmap.fullsky_geometry(res=2.0*utils.degree, variant="fejer1")
	fullsky2 = curvedsky.alm2map(np.asarray(alm), enmap.zeros(fs2_shape, fs2_wcs))
	refpix = np.array(spec["reference_pixels"])
	for name, gspec in spec["geometries"].items():
		shape, wcs = build_geometry(gspec)
		m = curvedsky.alm2map(np.asarray(alm), enmap.zeros(shape, wcs))
		arr = np.asarray(m)
		vals = np.array([arr[tuple(p)] for p in refpix])
		out["map_%s_refvals" % name] = vals
		out["map_%s_shape" % name] = np.array(shape)
		# extraction test (incl. RA-wrapping boxes) from the 2-deg fullsky
		if gspec["type"] == "box" and gspec["res_deg"] == 2.0:
			sub = enmap.extract(fullsky2, shape, wcs)
			out["extract_%s_refvals" % name] = np.array(
				[np.asarray(sub)[tuple(p)] for p in refpix])
	np.savez(os.path.join(os.path.dirname(__file__), "..", "tests", "data",
		"golden.npz"), **out)
	print("wrote tests/data/golden.npz with", len(out), "entries")

if __name__ == "__main__":
	main()
