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

def _angdist_deg(lon1, lat1, lon2, lat2):
	"""Great-circle distance [deg] between (lon,lat) points [deg]."""
	d2r = np.pi/180
	v1 = np.array([np.cos(lat1*d2r)*np.cos(lon1*d2r),
		np.cos(lat1*d2r)*np.sin(lon1*d2r), np.sin(lat1*d2r)])
	v2 = np.array([np.cos(lat2*d2r)*np.cos(lon2*d2r),
		np.cos(lat2*d2r)*np.sin(lon2*d2r), np.sin(lat2*d2r)])
	return np.arccos(np.clip((v1*v2).sum(0), -1, 1))/d2r

def test_cyl_offcenter_crval():
	"""Cylindrical projections with crval_dec != 0 must apply the general
	native<->celestial rotation (Calabretta & Greisen paper II sec 2.4;
	reference delegates to wcslib, pixell/wcsutils.py:415-516). The rotation
	is pinned by three invariants: it is rigid (preserves angular
	distances computed from the native coordinates), it anchors the
	fiducial pixel at crval, and it puts the celestial pole at native
	longitude LONPOLE."""
	from pixell_tpu import wcsutils
	for proj, d0 in [("car", 30.0), ("car", -47.5), ("cea", 30.0), ("mer", 12.0)]:
		w = wcsutils.WCS(naxis=2)
		w.wcs.ctype = ["RA---" + proj.upper(), "DEC--" + proj.upper()]
		w.wcs.crval = np.array([15.0, d0])
		w.wcs.crpix = np.array([20.0, 10.0])
		w.wcs.cdelt = np.array([-0.5, 0.5])
		assert not wcsutils.is_separable(w)
		# 1. fiducial pixel -> crval (crpix is 1-based)
		lon0, lat0 = w.wcs_pix2world(19.0, 9.0)
		assert np.allclose([lon0 % 360, lat0], [15.0, d0], atol=1e-10)
		# 2. rigid rotation: native angular distances are preserved.
		# Native coords of a pixel are the projection-plane inverse, which
		# for these projections we obtain from a crval_dec=0 twin.
		w0 = w.deepcopy(); w0.wcs.crval = np.array([0.0, 0.0])
		rng = np.random.default_rng(0)
		x = rng.uniform(0, 40, 20); y = rng.uniform(0, 20, 20)
		nlon, nlat = w0.wcs_pix2world(x, y)
		clon, clat = w.wcs_pix2world(x, y)
		d_nat = _angdist_deg(nlon[:10], nlat[:10], nlon[10:], nlat[10:])
		d_cel = _angdist_deg(clon[:10], clat[:10], clon[10:], clat[10:])
		assert np.allclose(d_nat, d_cel, atol=1e-8)
		# 3. north celestial pole at native longitude phip (0 for d0>=0
		# else 180)
		xpole, ypole = w.wcs_world2pix(123.0, 90.0)
		u = (xpole + 1 - w.wcs.crpix[0])*w.wcs.cdelt[0]
		phip = 0.0 if d0 >= 0 else 180.0
		assert np.allclose(((u - phip + 180) % 360) - 180, 0, atol=1e-8)
		# 4. world2pix inverts pix2world, modulo the 360-deg longitude
		# branch of the rotated frame (wcslib has the same cut)
		x2, y2 = w.wcs_world2pix(clon, clat)
		xper = 360.0/abs(w.wcs.cdelt[0])
		assert np.allclose((x2 - x + xper/2) % xper - xper/2, 0, atol=1e-8)
		assert np.allclose(y2, y, atol=1e-8)

def test_cyl_explicit_lonpole():
	"""An EXPLICITLY set LONPOLE must be honored as wcslib would, not
	remapped to the unset default (advisor round-3 low: legitimate values
	were overloaded as unset sentinels). For cylindrical projections
	(theta0=0) cos(dp) = sin(d0)/cos(phip) needs to land in [0,1], so
	LONPOLE=45 with crval_dec=30 is valid and distinct from the default 0,
	while LONPOLE=180 with crval_dec>0 is invalid and must raise (wcslib's
	celset errors on the same header)."""
	from pixell_tpu import wcsutils
	import pytest
	w = wcsutils.WCS(naxis=2)
	w.wcs.ctype = ["RA---CAR", "DEC--CAR"]
	w.wcs.crval = np.array([15.0, 30.0])
	w.wcs.crpix = np.array([20.0, 10.0])
	w.wcs.cdelt = np.array([-0.5, 0.5])
	assert w.wcs.lonpole is None  # unset by default
	w.wcs.lonpole = 45.0          # explicit, valid, non-default
	# fiducial pixel still lands on crval
	lon0, lat0 = w.wcs_pix2world(19.0, 9.0)
	assert np.allclose([lon0 % 360, lat0], [15.0, 30.0], atol=1e-10)
	# celestial pole sits at native longitude 45 (not the default 0)
	xpole, ypole = w.wcs_world2pix(123.0, 90.0)
	u = (xpole + 1 - w.wcs.crpix[0])*w.wcs.cdelt[0]
	assert np.allclose(((u - 45.0 + 180) % 360) - 180, 0, atol=1e-8)
	# the invalid explicit configuration raises instead of being remapped
	wbad = w.deepcopy(); wbad.wcs.lonpole = 180.0
	with pytest.raises(ValueError):
		wbad.wcs_pix2world(19.0, 9.0)
	# rigid rotation: angular distances preserved vs the native frame
	w0 = w.deepcopy(); w0.wcs.crval = np.array([0.0, 0.0]); w0.wcs.lonpole = None
	rng = np.random.default_rng(3)
	x = rng.uniform(0, 40, 20); y = rng.uniform(0, 20, 20)
	nlon, nlat = w0.wcs_pix2world(x, y)
	clon, clat = w.wcs_pix2world(x, y)
	d_nat = _angdist_deg(nlon[:10], nlat[:10], nlon[10:], nlat[10:])
	d_cel = _angdist_deg(clon[:10], clat[:10], clon[10:], clat[10:])
	assert np.allclose(d_nat, d_cel, atol=1e-8)
	# and it differs from the unset-default orientation
	w2 = w.deepcopy(); w2.wcs.lonpole = None
	clon2, clat2 = w2.wcs_pix2world(x, y)
	assert not np.allclose(clat, clat2, atol=1e-3)
	# header roundtrip: unset keys are omitted, explicit keys survive
	assert "LONPOLE" not in w2.to_header()
	assert wcsutils.WCS(header=w.to_header()).wcs.lonpole == 45.0

def test_cyl_offcenter_area():
	"""pixsizemap/area on an off-center cylindrical geometry: pixel solid
	angles are uniform-in-native-frame, so the exact total is the native
	row sum. Also guards the ra-branch-cut rewind in the generic jacobian
	(the cut runs through the map when crval_dec != 0)."""
	from pixell_tpu import wcsutils
	hdr = {"CTYPE1": "RA---CAR", "CTYPE2": "DEC--CAR",
		"CRVAL1": 15.0, "CRVAL2": 30.0, "CRPIX1": 61.0, "CRPIX2": 31.0,
		"CDELT1": -0.25, "CDELT2": 0.25}
	wcs = wcsutils.WCS(header=hdr)
	shape = (60, 120)
	v = (np.arange(60) - 30)*0.25  # native latitude of each row [deg]
	exact = np.deg2rad(0.25)**2*np.cos(np.deg2rad(v)).sum()*120
	a = float(np.asarray(enmap.pixsizemap(shape, wcs)).sum())
	assert abs(a/exact - 1) < 1e-4, (a, exact)
	ar = enmap.area(shape, wcs)
	assert abs(ar/exact - 1) < 1e-4, (ar, exact)
