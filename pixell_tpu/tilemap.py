"""Tiled, distributable maps (reference pixell/tilemap.py).

A TileMap splits a big map geometry into a grid of tiles, of which only an
"active" subset is stored, flattened into one buffer. The reference
distributes tiles across MPI ranks with hand-rolled Alltoallv
(tilemap.py:437-530); here distribution is jax.sharding: a tile-sharded
array with a NamedSharding over the tile axis, where `redistribute` is a
device_put to a different sharding (XLA emits the all-to-all) and reductions
are psums.
"""
from __future__ import annotations
import numpy as np
import jax
import jax.numpy as jnp
from . import enmap, utils, wcsutils


class TileGeometry:
	"""Tile grid info for a map geometry (reference tilemap.TileGeometry:340)."""
	def __init__(self, shape, wcs, tile_shape=(500, 500), active=None):
		self.shape = tuple(shape)
		self.wcs = wcs
		self.tile_shape = tuple(np.zeros(2, int) + np.asarray(tile_shape))
		ny, nx = self.shape[-2:]
		self.grid_shape = ((ny + self.tile_shape[0] - 1)//self.tile_shape[0],
			(nx + self.tile_shape[1] - 1)//self.tile_shape[1])
		self.ntile = int(np.prod(self.grid_shape))
		if active is None: active = np.arange(self.ntile)
		self.active = _parse_active(active, self.ntile)
		self.lookup = np.full(self.ntile, -1, int)
		self.lookup[self.active] = np.arange(len(self.active))
	@property
	def nactive(self): return len(self.active)
	@property
	def pre(self): return self.shape[:-2]
	def grid2ind(self, ty, tx):
		"""Index in the full tiling of the tile at grid coords ty,tx
		(reference tilemap.TileGeometry.grid2ind:353)."""
		return ty*self.grid_shape[1] + tx
	def ind2grid(self, i):
		"""Grid coords ty,tx of tile #i (reference ind2grid:356)."""
		nx = self.grid_shape[-1]
		return i//nx, i % nx
	@property
	def size(self):
		"""Total number of stored elements (reference TileGeometry.size:381)."""
		tot = 0
		for ti in self.active:
			pb = self.tile_pixbox(int(ti))
			tot += int(np.prod(pb[1] - pb[0]))
		return int(np.prod(self.pre, dtype=int))*tot
	@property
	def tiles(self):
		"""tile_geom.tiles[i] = enmap geometry of tile #i
		(reference TileGeometry.tiles:383)."""
		return _TileGeomHelper(self)
	def compatible(self, other):
		"""2 = strictly compatible (same tiling and active set), 1 = same
		tiling but different active sets, 0 = incompatible
		(reference TileGeometry.compatible:388)."""
		if tuple(self.shape[-2:]) != tuple(other.shape[-2:]): return 0
		if tuple(self.tile_shape) != tuple(other.tile_shape): return 0
		if self.nactive == other.nactive and np.all(self.active == other.active):
			return 2
		return 1
	def tile_pixbox(self, ti):
		"""Pixel box [{from,to},{y,x}] of global tile index ti."""
		gy, gx = np.unravel_index(ti, self.grid_shape)
		y1 = gy*self.tile_shape[0]; x1 = gx*self.tile_shape[1]
		y2 = min(y1 + self.tile_shape[0], self.shape[-2])
		x2 = min(x1 + self.tile_shape[1], self.shape[-1])
		return np.array([[y1, x1], [y2, x2]])
	def tile_geometry(self, ti):
		pb = self.tile_pixbox(ti)
		tshape, twcs = enmap.slice_geometry(self.shape[-2:], self.wcs,
			(slice(pb[0, 0], pb[1, 0]), slice(pb[0, 1], pb[1, 1])))
		return self.pre + tuple(tshape[-2:]), twcs
	def copy(self, pre=None, active=None, add_active=None):
		shape = tuple(pre) + self.shape[-2:] if pre is not None else self.shape
		act = self.active if active is None else _parse_active(active, self.ntile)
		if add_active is not None:
			add = _parse_active(add_active, self.ntile)
			lookup = np.full(self.ntile, -1, int)
			lookup[act] = np.arange(len(act))
			act = np.concatenate([act, add[lookup[add] < 0]])
		return TileGeometry(shape, self.wcs, self.tile_shape, act)
	def __repr__(self):
		return "TileGeometry(%s, grid=%s, nactive=%d)" % (
			str(self.shape), str(self.grid_shape), self.nactive)

class _TileGeomHelper:
	"""tile_geom.tiles[i] → enmap geometry of tile #i in the full tiling
	(reference tilemap._TileGeomHelper:401)."""
	def __init__(self, tile_geom):
		self.tile_geom = tile_geom
	def __getitem__(self, i):
		return self.tile_geom.tile_geometry(int(i))

def _parse_active(active, ntile):
	if isinstance(active, str) and active == "all":
		return np.arange(ntile, dtype=int)
	return np.asarray(active, int)

def geometry(shape, wcs, tile_shape=(500, 500), active=None):
	"""Build a TileGeometry (reference tilemap.geometry:314)."""
	return TileGeometry(shape, wcs, tile_shape=tile_shape, active=active)


class TileMap:
	"""Active tiles of a tiled map, stored as [..., nactive, tny, tnx]
	(zero-padded edge tiles). Tiles can live sharded across devices."""
	def __init__(self, arr, geometry):
		self.data = arr
		self.geometry = geometry
	@property
	def shape(self): return self.data.shape
	@property
	def dtype(self): return self.data.dtype
	@property
	def pre(self): return self.geometry.pre
	@property
	def nactive(self): return self.geometry.nactive
	@property
	def active(self): return self.geometry.active
	@property
	def lookup(self): return self.geometry.lookup
	@property
	def ntile(self): return self.geometry.ntile
	@property
	def tile_shape(self): return self.geometry.tile_shape
	def copy(self):
		xp = utils._xp(self.data)
		return TileMap(xp.array(self.data), self.geometry)
	def contig(self):
		"""Contiguous copy (reference TileMap.contig:93). jax arrays are
		already contiguous; numpy buffers are made so."""
		if isinstance(self.data, np.ndarray):
			return TileMap(np.ascontiguousarray(self.data), self.geometry)
		return TileMap(self.data, self.geometry)
	def tile(self, i):
		"""The i-th ACTIVE tile as an ndmap (cropped to its true size)."""
		ti = self.geometry.active[i]
		pb = self.geometry.tile_pixbox(ti)
		tshape, twcs = self.geometry.tile_geometry(ti)
		h, w = pb[1] - pb[0]
		return enmap.ndmap(self.data[..., i, :h, :w], twcs)
	@property
	def tiles(self):
		"""View over ALL tiles by global index (reference TileMap.tiles:103)."""
		return TileView(self, active=False)
	@property
	def active_tiles(self):
		"""View over the active tiles (reference TileMap.active_tiles:106)."""
		return TileView(self, active=True)
	def with_tiles(self, other, strict=False):
		"""Re-tile onto another active set (reference TileMap.with_tiles:108).
		other may be a TileMap/TileGeometry or an active list. By default the
		result has the UNION of active sets (data zero-filled for new tiles);
		strict=True takes exactly other's active set in its order."""
		try: active = other.geometry.active
		except AttributeError:
			try: active = other.active
			except AttributeError: active = _parse_active(other, self.ntile)
		if not strict and (len(active) == len(self.geometry.active)
				and np.all(np.asarray(active) == self.geometry.active)):
			return self.copy()
		if strict: newgeo = self.geometry.copy(active=active)
		else:      newgeo = self.geometry.copy(add_active=active)
		xp = utils._xp(self.data)
		out = xp.zeros(self.pre + (newgeo.nactive,) + tuple(self.geometry.tile_shape),
			self.data.dtype)
		for j, ti in enumerate(newgeo.active):
			i = self.geometry.lookup[ti]
			if i >= 0:
				if hasattr(out, "at"):
					out = out.at[..., j, :, :].set(self.data[..., i, :, :])
				else:
					out[..., j, :, :] = self.data[..., i, :, :]
		return TileMap(out, newgeo)
	def insert(self, imap, op=lambda a, b: b):
		"""Insert imap's tiles into a copy of self (reference TileMap.insert:143)."""
		return insert(self, imap, op=op)
	def to_enmap(self):
		"""Assemble the full map (missing tiles zero)."""
		full = np.zeros(self.geometry.shape)
		for i, ti in enumerate(self.geometry.active):
			pb = self.geometry.tile_pixbox(ti)
			h, w = pb[1] - pb[0]
			full[..., pb[0, 0]:pb[1, 0], pb[0, 1]:pb[1, 1]] = \
				np.asarray(self.data)[..., i, :h, :w]
		return enmap.ndmap(full, self.geometry.wcs)
	def __add__(self, other):
		o = other.data if isinstance(other, TileMap) else other
		return TileMap(self.data + o, self.geometry)
	def __mul__(self, other):
		o = other.data if isinstance(other, TileMap) else other
		return TileMap(self.data*o, self.geometry)
	__radd__ = __add__
	__rmul__ = __mul__
	def __sub__(self, other):
		o = other.data if isinstance(other, TileMap) else other
		return TileMap(self.data - o, self.geometry)
	def __repr__(self):
		return "TileMap(%s, %s)" % (str(self.data.shape), repr(self.geometry))


def zeros(geometry, dtype=np.float64, jax_array=True):
	xp = jnp if jax_array else np
	arr = xp.zeros(geometry.pre + (geometry.nactive,) + geometry.tile_shape, dtype)
	return TileMap(arr, geometry)

def from_enmap(imap, tile_shape=(500, 500), active=None):
	"""Split an ndmap into a TileMap."""
	geo = TileGeometry(imap.shape, imap.wcs, tile_shape, active)
	arr = np.zeros(geo.pre + (geo.nactive,) + geo.tile_shape, np.asarray(imap).dtype)
	src = np.asarray(imap)
	for i, ti in enumerate(geo.active):
		pb = geo.tile_pixbox(ti)
		h, w = pb[1] - pb[0]
		arr[..., i, :h, :w] = src[..., pb[0, 0]:pb[1, 0], pb[0, 1]:pb[1, 1]]
	return TileMap(jnp.asarray(arr), geo)


# ---------------------------------------------------------------------------
# Distribution: sharding over the tile axis (reference redistribute:437)
# ---------------------------------------------------------------------------
def tile_sharding(mesh, pre_ndim=0, axis=None):
	"""NamedSharding placing the tile axis across the mesh."""
	from jax.sharding import NamedSharding, PartitionSpec as P
	if axis is None: axis = mesh.axis_names[0]
	spec = [None]*pre_ndim + [axis, None, None]
	return NamedSharding(mesh, P(*spec))

def distribute(tmap, mesh, axis=None):
	"""Shard the TileMap's tile axis over the mesh (the tile count is padded
	to a multiple of the device count)."""
	ndev = int(np.prod(mesh.devices.shape)) if axis is None else mesh.shape[axis]
	n = tmap.nactive
	npad = (-n) % ndev
	data = tmap.data
	if npad:
		pad = [(0, 0)]*(data.ndim)
		pad[-3] = (0, npad)
		data = jnp.pad(jnp.asarray(data), pad)
	sh = tile_sharding(mesh, pre_ndim=data.ndim-3, axis=axis)
	return TileMap(jax.device_put(jnp.asarray(data), sh), tmap.geometry)

def redistribute(tmap, mesh=None, sharding=None, axis=None):
	"""Change the distribution of a TileMap: under jax this is simply a
	device_put to a new sharding; XLA inserts the all-to-all
	(reference tilemap.redistribute:437 hand-rolls this over MPI)."""
	if sharding is None:
		sharding = tile_sharding(mesh, pre_ndim=jnp.asarray(tmap.data).ndim-3, axis=axis)
	return TileMap(jax.device_put(jnp.asarray(tmap.data), sharding), tmap.geometry)

def reduce(tmap, comm=None, root=0):
	"""Sum TileMap contributions across processes (reference tilemap.reduce:522).
	Within one process this is the identity; across processes it is an
	allreduce of the host-visible buffer."""
	from .parallel import dist
	comm = comm or dist.COMM_WORLD
	if getattr(comm, "size", 1) == 1: return tmap
	return TileMap(comm.allreduce(np.asarray(tmap.data)), tmap.geometry)

def tree_reduce(tmap, comm=None):
	return reduce(tmap, comm=comm)

def write_map(fname, tmap, comm=None):
	"""Collectively write a TileMap as the assembled enmap
	(reference tilemap.write_map:531)."""
	full = tmap.to_enmap()
	enmap.write_map(fname, full)

def read_map(fname, tile_shape=(500, 500)):
	return from_enmap(enmap.read_map(fname), tile_shape=tile_shape)


# ---------------------------------------------------------------------------
# Additional constructors and operations (reference tilemap.py:91-311)
# ---------------------------------------------------------------------------
def empty(tile_geom, dtype=np.float64):
	"""Zero TileMap with the given geometry (reference tilemap.empty:91)."""
	return zeros(tile_geom, dtype)

def from_active_tiles(tiles, tile_geom):
	"""TileMap from the list of active tiles matching tile_geom.active
	(reference tilemap.from_active_tiles:111)."""
	if len(tiles) != tile_geom.nactive:
		raise ValueError("Wrong number of tiles passed. Expected %d but got %d"
			% (tile_geom.nactive, len(tiles)))
	if len(tiles) == 0: return zeros(tile_geom)
	xp = utils._xp(tiles[0])
	th, tw = tile_geom.tile_shape
	padded = []
	for tile in tiles:
		t = xp.asarray(tile)
		pad = [(0, 0)]*(t.ndim-2) + [(0, th - t.shape[-2]), (0, tw - t.shape[-1])]
		padded.append(xp.pad(t, pad) if (t.shape[-2] != th or t.shape[-1] != tw) else t)
	data = xp.stack(padded, -3)
	geo = tile_geom.copy()
	geo.shape = tuple(padded[0].shape[:-2]) + tuple(tile_geom.shape[-2:])
	return TileMap(data, geo)

def from_tiles(tiles, tile_geom):
	"""TileMap from a full tile list with None for inactive tiles
	(reference tilemap.from_tiles:100)."""
	active = [gi for gi, t in enumerate(tiles) if t is not None]
	return from_active_tiles([t for t in tiles if t is not None],
		tile_geom.copy(active=active))

def samegeo(arr, *args):
	"""Wrap arr with the geometry of the first TileMap in args
	(reference tilemap.samegeo:240)."""
	for m in args:
		if isinstance(m, TileMap):
			return TileMap(arr, m.geometry.copy())
	return arr

def make_binop(op, is_inplace=False):
	"""Binary op between TileMaps with compatible geometries, intersecting
	or matching active tiles (reference tilemap.make_binop:250)."""
	import operator
	if isinstance(op, str):
		op = getattr(operator, op.strip("_"), None) or getattr(np, op)
	def binop(self, other):
		if isinstance(other, TileMap):
			if tuple(other.geometry.active) == tuple(self.geometry.active):
				return TileMap(op(self.data, other.data), self.geometry.copy())
			# expand other onto self's active set
			o2 = other.with_tiles(self.geometry.active, strict=True)
			return TileMap(op(self.data, o2.data), self.geometry.copy())
		return TileMap(op(self.data, other), self.geometry.copy())
	return binop

def insert(omap, imap, op=lambda a, b: b):
	"""Insert imap into omap (same geometry, possibly different active
	tiles); omap is not modified (reference tilemap.insert:298)."""
	i2 = imap.with_tiles(omap.geometry.active, strict=True)
	xp = utils._xp(omap.data)
	# only overwrite where imap actually had tiles
	mask = np.isin(np.asarray(omap.geometry.active),
		np.asarray(imap.geometry.active))
	out = xp.where(xp.asarray(mask)[..., :, None, None],
		op(omap.data, i2.data), omap.data)
	return TileMap(out, omap.geometry.copy())

def map_mul(mat, vec):
	"""Matrix multiply along the pre-axes (reference tilemap.map_mul:305)."""
	xp = utils._xp(getattr(mat, "data", mat), vec.data)
	m = mat.data if isinstance(mat, TileMap) else xp.asarray(mat)
	if m.ndim <= 2: return TileMap(m*vec.data, vec.geometry.copy())
	out = xp.einsum("ab...,b...->a...", m, vec.data)
	return TileMap(out, vec.geometry.copy())

def get_active_distributed(tile_map, comm):
	"""Union of active tiles across MPI tasks (reference
	tilemap.get_active_distributed:330)."""
	iactive = np.zeros(tile_map.geometry.ntile, int)
	iactive[tile_map.geometry.active] = 1
	if comm is not None and getattr(comm, "size", 1) > 1:
		iactive = utils.allreduce(iactive, comm)
	return np.nonzero(iactive)[0]


class TileView:
	"""Sequence view of a TileMap's tiles (reference tilemap.TileView:145).
	active=True indexes the active list; active=False indexes the full tiling
	(inactive tiles read as zero maps)."""
	def __init__(self, tmap, active=True):
		self.tmap = tmap
		self.active = active
	@property
	def ndim(self): return self.tmap.data.ndim + 1
	@property
	def shape(self): return self.tmap.geometry.shape
	def __len__(self):
		return self.tmap.nactive if self.active else self.tmap.geometry.ntile
	def __getitem__(self, i):
		if self.active:
			return self.tmap.tile(i)
		li = self.tmap.geometry.lookup[i]
		if li < 0:
			shape, wcs = self.tmap.geometry.tile_geometry(i)
			return enmap.zeros(tuple(self.tmap.pre) + tuple(shape[-2:]), wcs,
				self.tmap.dtype)
		return self.tmap.tile(int(li))
	def __setitem__(self, i, val):
		"""Write a tile in place (reference TileView.__setitem__:188). For jax
		buffers this rebinds tmap.data (functional update)."""
		if self.active: ai = i
		else:
			ai = int(self.tmap.geometry.lookup[i])
			if ai < 0: raise IndexError("tile %d is not active" % i)
		ti = self.tmap.geometry.active[ai]
		pb = self.tmap.geometry.tile_pixbox(int(ti))
		h, w = pb[1] - pb[0]
		v = np.asarray(val) if isinstance(self.tmap.data, np.ndarray) else jnp.asarray(val)
		if hasattr(self.tmap.data, "at"):
			self.tmap.data = self.tmap.data.at[..., ai, :h, :w].set(v)
		else:
			self.tmap.data[..., ai, :h, :w] = v
	def __iter__(self):
		for i in range(len(self)): yield self[i]


def full(tile_geom, val, dtype=np.float64, jax_array=True):
	"""TileMap filled with val (reference tilemap.full:14)."""
	out = zeros(tile_geom, dtype, jax_array=jax_array)
	return TileMap(out.data + val, out.geometry)

def to_enmap(tile_map):
	"""Assemble the full map from a TileMap (reference tilemap.to_enmap:418)."""
	return tile_map.to_enmap()
