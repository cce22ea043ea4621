"""Support module tests: fits tables, proxies, plots, config, tsz, solvers."""
import numpy as np
import jax.numpy as jnp
import pytest
from pixell_tpu import enmap, utils, fits_io, pointsrcs, enplot, config, \
	colorize, analysis, uharm
from pixell_tpu.bunch import Bunch


def test_fits_table_roundtrip(tmp_path):
	cols = dict(ra=np.linspace(0, 10, 7), dec=np.linspace(-3, 3, 7),
		flux=np.arange(7, dtype=np.int32))
	fname = str(tmp_path/"t.fits")
	fits_io.write_table_fits(fname, cols)
	back = fits_io.read_table(fname)
	assert np.allclose(back["ra"], cols["ra"])
	assert np.array_equal(back["flux"], cols["flux"])

def test_pointsrcs_fits_catalog(tmp_path):
	cat = Bunch(ra=np.array([0.1, 0.4]), dec=np.array([0.0, -0.2]), I=np.array([3.0, 4.0]))
	fname = str(tmp_path/"cat.fits")
	pointsrcs.write_fits_cat(fname, cat)
	back = pointsrcs.read(fname)
	assert np.allclose(back.ra, cat.ra)
	assert np.allclose(back.I, cat.I)

def test_delayed_fits_read(tmp_path):
	shape, wcs = enmap.geometry(pos=np.array([[-2, 4], [2, -4]])*utils.degree,
		res=0.25*utils.degree)
	rng = np.random.default_rng(1)
	m = enmap.ndmap(rng.standard_normal((2,)+shape).astype(np.float32), wcs)
	fname = str(tmp_path/"big.fits")
	enmap.write_map(fname, m)
	proxy = enmap.read_map(fname, delayed=True)
	assert proxy.shape == m.shape
	sub = proxy[1, 2:10, 3:12]
	assert np.allclose(np.asarray(sub), np.asarray(m)[1, 2:10, 3:12])

def test_enplot_pipeline(tmp_path):
	shape, wcs = enmap.fullsky_geometry(res=5*utils.degree)
	rng = np.random.default_rng(2)
	m = enmap.ndmap(rng.standard_normal(shape), wcs)
	plots = enplot.plot(m, "-b --ticks 45 --contours 1.0")
	fname = str(tmp_path/"plot.png")
	enplot.write(fname, plots)
	import os
	assert os.path.getsize(fname) > 1000

def test_colorize_schemes():
	x = np.linspace(0, 1, 16)[None]
	for name in ["planck", "wmap", "gray", "hotcold"]:
		out = colorize.colorize(x, name)
		assert out.shape == (1, 16, 4)
		assert out.dtype == np.uint8

def test_config():
	config.default("test_param", 3, "a test parameter")
	assert config.get("test_param") == 3
	with config.override("test_param", 7):
		assert config.get("test_param") == 7
	assert config.get("test_param") == 3

def test_tsz_profile():
	x = np.array([0.1, 0.5, 1.0, 2.0])
	p = utils.tsz_profile_raw(x)
	assert np.all(p > 0)
	assert np.all(np.diff(p) < 0)  # decreasing
	y = utils.tsz_profile_los(x)
	assert np.all(y > 0) and np.all(np.diff(y) < 0)

def test_bench_module():
	from pixell_tpu import bench
	b = bench.Bench(sync=False)
	with b.mark("x"):
		sum(range(1000))
	assert b.n["x"] == 1 and b.t_tot["x"] >= 0 and b.t["x"] >= 0
	b.set_verbose(False)
	b.set_tfun(__import__("time").perf_counter)
	with b.mark("x"):
		pass
	assert b.n["x"] == 2

def test_memory_module():
	from pixell_tpu import memory
	assert memory.current() > 0
	assert memory.resident() > 0

def test_sqlite_module():
	from pixell_tpu import sqlite
	with sqlite.open() as db:
		db.write_array("t", np.arange(12.0).reshape(4, 3))
		back = db.read_array("t")
		assert back.shape == (4, 3)

def test_finder_multi():
	shape, wcs = enmap.geometry(pos=np.array([[-2, 2], [2, -2]])*utils.degree,
		res=0.02*utils.degree, proj="car")
	sigma = 10*utils.arcmin*utils.fwhm
	r = np.linspace(0, 8*sigma, 1000)
	norm = 2*np.pi*sigma**2
	prof = np.array([r, np.exp(-0.5*(r/sigma)**2)/norm])
	m = pointsrcs.sim_objects(shape, wcs, np.array([[0.0], [0.0]]),
		np.array([40.0]), prof, dtype=np.float64)
	noise = 0.5
	rng = np.random.default_rng(5)
	total = enmap.samewcs(jnp.asarray(m) +
		rng.standard_normal(shape)*noise/np.sqrt(enmap.pixsize(shape, wcs)), m)
	uht = uharm.UHT(shape, wcs, mode="flat")
	B = uht.rprof2hprof(prof[1], prof[0])
	iN = enmap.samewcs(jnp.ones(np.asarray(B).shape)/(noise**2), B)
	nm1 = analysis.NmatConstcov(np.asarray(iN), np.asarray(B), uht)
	finder = analysis.FinderMulti([nm1, nm1], snmin=10)
	res = finder(total)
	assert len(res.cat) >= 1
	assert abs(res.cat["flux"][np.argmax(res.cat["snr"])] - 40) < 8


def test_sqlite_reference_api():
	"""The reference-style sqlite.SQL wrapper (reference sqlite.py)."""
	from pixell_tpu import sqlite
	db = sqlite.SQL(":memory:", mode=None)
	db.execute("create table t (a int, b text)")
	db.executemany("insert into t values (?, ?)", [(1, "x"), (2, "y")])
	assert db.tables() == ["t"]
	assert db.columns("t") == ["a", "b"]
	assert sqlite.rows(db.conn, "t") == 2
	out = sqlite.format_result(list(db.execute("select * from t")))
	assert "x" in out and "y" in out
	db.close()


def test_colorize_modes_and_reverse():
	from pixell_tpu import colorize
	x = np.linspace(0, 1, 7)
	cs = colorize.Colorscheme("planck")
	rev = cs.reverse()
	a = colorize.colorize(x, cs)
	b = colorize.colorize(1 - x, rev)
	assert np.allclose(a[:, :3], b[:, :3], atol=1)
	# direct mode carries channels through
	rgb = np.clip(np.stack([x, x[::-1], x*0 + 0.5]), 0, 1)
	out = colorize.colorize(rgb, mode="direct")
	assert out.shape == (7, 4) and out[:, 3].min() == 255
	cmap = colorize.to_mpl_colormap("planck")
	assert cmap(0.5) is not None


def test_ephem_kepler():
	from pixell_tpu import ephem
	ct = 1760000000 + np.arange(4)*3600.0
	pos, r = ephem.eval("Jupiter", ct)
	assert pos.shape == (4, 2) and np.all(r > 3.5) and np.all(r < 7)
	pos, r = ephem.eval("Sun", ct)
	assert abs(r[0] - 1.0) < 0.05
	rect = ephem.eval("Mars", ct, cartesian=True)
	assert rect.shape == (4, 3)
	# InterpEphem agrees with the direct backend on dense sampling
	dense = 1760000000 + np.arange(100)*10.0
	kep = ephem.KeplerEphem()
	p1, r1 = ephem.InterpEphem(kep).eval("Jupiter", dense)
	p2, r2 = kep.eval("Jupiter", dense)
	assert np.max(np.abs(p1 - p2)) < 1e-8


def test_fftlog():
	from pixell_tpu import utils
	fl = utils.FFTLog(xrange=[1e-3, 1e3], n=256, pad=32)
	# gaussian transforms to gaussian-like smooth spectrum; roundtrip test
	f = np.exp(-0.5*fl.x**2)
	F = fl.fft(f)
	back = fl.ifft(F)
	x, f_in, f_out = fl.unpad(fl.x, f, back)
	sel = (x > 1e-2) & (x < 10)
	assert np.max(np.abs(f_out[sel] - f_in[sel])) < 1e-6


def test_old_aberration_helpers():
	from pixell_tpu import old_aberration as oab
	theta = np.linspace(0.1, np.pi - 0.1, 11)
	beta = 0.001235
	th2 = oab.aber_angle(theta, beta)
	assert np.all(np.isfinite(th2)) and np.max(np.abs(th2 - theta)) < 2*beta
	amp = oab.mod_amplitude(theta, beta)
	assert np.allclose(amp[len(amp)//2], 1, atol=2*beta)
	pos = np.array([np.linspace(0, 1, 5), np.linspace(-0.5, 0.5, 5)])
	res = oab.remap(pos, oab.dir_equ, beta)
	assert res.shape[0] == 4  # ra, dec, pol rotation, modulation


def test_device_module():
	from pixell_tpu import device
	dev = device.get_device()
	assert dev.kind in ("cpu", "tpu")
	x = dev.put(np.arange(5.0))
	assert np.allclose(dev.get(x), np.arange(5.0))
	dev.synchronize()
	assert dev.time() > 0
	assert dev.memuse() >= 0 and dev.memuse("peak") >= 0
	# workspace: reuse-compatible buffers, explicit checkout
	ws = dev.workspace("cg")
	b = ws.ensure("r", (4, 4))
	assert b.shape == (4, 4) and float(jnp.sum(b)) == 0
	ws.give("p", dev.put(np.ones((2,))))
	assert "p" in ws and ws.nbytes > 0
	p = ws.take("p")
	assert "p" not in ws and np.allclose(dev.get(p), 1)
	assert dev.memuse("workspaces") == ws.nbytes
	# donation-based iteration compiles and runs
	step = device.donating_jit(lambda x: x + 1)
	y = dev.put(np.zeros(3, np.float32))
	for _ in range(3):
		y = step(y)
	assert np.allclose(dev.get(y), 3)


def test_enplot_option_parity():
	"""Every option of the reference's argument language (reference
	enplot.py:251-347) must parse, and the load-bearing ones must change the
	output."""
	ref_flags = ["-o", "--oname", "-c", "--color", "-r", "--range", "--min",
		"--max", "-q", "--quantile", "-v", "-u", "-s", "--upgrade", "--scale",
		"--verbosity", "--method", "--slice", "--sub", "--geometry", "-H",
		"--hdu", "--address", "--op", "--op2", "-d", "--downgrade",
		"--prefix", "--suffix", "--odir", "--ext", "-m", "--mask",
		"--mask-tol", "-g", "--grid", "--grid-color", "--grid-width", "-t",
		"--ticks", "--tick-unit", "--tu", "--nolabels", "--nstep",
		"--subticks", "-b", "--colorbar", "--font", "--font-size",
		"--font-color", "-D", "--driver", "--mpl-dpi", "--mpl-pad", "--rgb",
		"--rgb-mode", "--reverse-color", "-a", "--autocrop", "-A",
		"--autocrop-each", "-L", "--layers", "--no-image", "-C", "--contours",
		"--contour-type", "--contour-color", "--contour-width", "--annotate",
		"--annotate-maxrad", "--stamps", "--tile", "--tile-transpose",
		"--tile-dims", "-S", "--symmetric", "-z", "--zenith", "-F",
		"--fix-wcs", "--pos-ra", "-E", "--nonempty"]
	parser = enplot.define_arg_parser()
	known = set()
	for action in parser._actions:
		known.update(action.option_strings)
	missing = [f for f in ref_flags if f not in known]
	assert not missing, "missing reference enplot flags: %s" % missing

def test_enplot_option_behavior(tmp_path):
	shape, wcs = enmap.fullsky_geometry(res=10*utils.degree)
	rng = np.random.default_rng(3)
	m = enmap.ndmap(rng.standard_normal((3,) + shape), wcs)
	# rgb consumes all 3 components into one image
	p_rgb = enplot.plot(m, "--rgb")
	assert len(p_rgb) == 1
	# default: one plot per component, named with {comp}
	p3 = enplot.plot(m, "--prefix x_ --ext png")
	assert len(p3) == 3 and p3[0].name.startswith("x_") \
		and p3[0].name.endswith("_0.png")
	# tile stacks components into one image
	p_tile = enplot.plot(m, "--tile 1,3")
	assert len(p_tile) == 1
	assert p_tile[0].img.size[0] == 3*p3[0].img.size[0]
	# slicing and ops apply before plotting
	p_sl = enplot.plot(m, "--slice 0 --op m*0+1 -g")
	assert len(p_sl) == 1
	# upgrade changes pixel size; downgrade shrinks
	p_u = enplot.plot(m[0], "-u 3 -g")
	assert p_u[0].img.size[0] == 3*shape[-1]
	# layers mode emits separate map/grid/label images
	p_lay = enplot.plot(m[0], "-L --ticks 45")
	assert len(p_lay) == 3
	# nonempty skips fully-masked fields
	m2 = m.copy(); m2 = enmap.samewcs(np.asarray(m2), m2)
	m2[0] = 0
	p_ne = enplot.plot(enmap.ndmap(m2, wcs), "-E -m 0")
	assert len(p_ne) == 2
	# mpl driver works
	p_mpl = enplot.plot(m[0], "-D mpl -b")
	assert p_mpl[0].img.size[0] > 10
	# reverse-color changes pixels
	a = np.asarray(enplot.plot(m[0], "")[0].img)
	b = np.asarray(enplot.plot(m[0], "--reverse-color")[0].img)
	assert not np.array_equal(a, b)


def test_eigpow_semantics():
	"""eigpow matches the reference's edge semantics (reference
	utils.eigpow:2789): negative eigenvalues are zeroed for non-integer e,
	kept for integer e; tiny eigenvalues are zeroed only for e < 0."""
	# matrix with eigenvalues (4, -1): diagonalized by a rotation
	th = 0.3
	R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
	A = R @ np.diag([4.0, -1.0]) @ R.T
	# integer e keeps the negative eigenvalue: A^2 exactly
	got = utils.eigpow(A, 2)
	assert np.allclose(got, A @ A)
	got = utils.eigpow(A, 3)
	assert np.allclose(got, A @ A @ A)
	# non-integer e zeroes it: result = R diag(4^0.5, 0) R.T
	got = utils.eigpow(A, 0.5)
	want = R @ np.diag([2.0, 0.0]) @ R.T
	assert np.allclose(got, want)
	# negative e zeroes relatively-tiny eigenvalues (rlim)
	B = R @ np.diag([1.0, 1e-15]) @ R.T
	got = utils.eigpow(B, -1)
	want = R @ np.diag([1.0, 0.0]) @ R.T
	assert np.allclose(got, want)
	# but keeps well-measured small ones
	C = R @ np.diag([1.0, 1e-3]) @ R.T
	got = utils.eigpow(C, -1)
	want = R @ np.diag([1.0, 1e3]) @ R.T
	assert np.allclose(got, want)
	# stacked matrices along custom axes
	As = np.stack([A, B])
	got = utils.eigpow(np.moveaxis(As, 0, 1), -1, axes=[0, 2])
	assert got.shape == (2, 2, 2)
