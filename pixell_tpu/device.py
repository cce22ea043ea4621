"""Device and memory abstraction (reference pixell/device.py).

The reference abstracts CPU vs GPU (cupy) with explicit allocators, arena
memory pools and array pools (reference device.py:4-368). Under jax the
accelerator runtime owns device allocation, so the mapping here is:

- Device/DeviceCpu/DeviceTpu wrap jax devices; DeviceTpu.memuse reads jax
  memory_stats; synchronize drains the async dispatch queue.
- The Mempool arena (two-mode grow/reuse with reset/reserve/swap, reference
  Mempool:136) is kept VERBATIM for host-side staging buffers (pinned IO,
  catalog assembly) over an aligned numpy allocator.
- ArrayPoolTpu maps the pool API onto jax: buffers are plain device arrays,
  and reuse happens through XLA buffer donation rather than pointer reuse,
  so it only tracks totals.
"""
from __future__ import annotations
import time, contextlib
import numpy as np
from . import bunch


def round_up(a, b):
	"""Round a up to a multiple of b (reference device.round_up:341)."""
	return (a + b - 1)//b*b

def getptr(arr):
	"""Pointer to a numpy array's data (reference device.getptr:349)."""
	try: return arr.data.ptr            # cupy-style
	except AttributeError: pass
	try: return arr.ctypes.data         # numpy
	except AttributeError:
		return arr.unsafe_buffer_pointer()  # jax


class AllocCpu:
	"""Raw byte allocator (reference device.AllocCpu:110)."""
	def alloc(self, n): return np.empty(int(n), dtype=np.uint8)

class AllocTpu:
	"""Device byte allocator (replaces reference AllocGpu:113, which wraps the
	cupy allocator). XLA owns device memory, so this allocates host staging
	bytes that jax will transfer on use."""
	def alloc(self, n): return np.empty(int(n), dtype=np.uint8)

AllocGpu = AllocTpu

class AllocAligned:
	"""Wrap an allocator to make it aligned (reference device.AllocAligned:124)."""
	def __init__(self, allocator, align=16):
		self.allocator = allocator
		self.align     = align
	def alloc(self, n):
		n   = int(n)
		buf = self.allocator.alloc(n + self.align - 1)
		off = (-getptr(buf)) % self.align
		return buf[off:off+n]


class Mempool:
	"""Two-mode arena allocator (reference device.Mempool:136): mode 1 hands
	out slices of one big arena; mode 2 appends new arenas as needed. reset()
	consolidates back to a single arena of the peak capacity."""
	def __init__(self, aligned_alloc, name="[unnamed]", logger=None):
		self.allocator = aligned_alloc
		self.name      = name
		self.logger    = logger
		self.arenas    = []
		self.used      = 0
	def alloc(self, n):
		n = int(n)
		effsize = round_up(n, self.allocator.align)
		if len(self.arenas) != 1 or self.arenas[0].size < self.used + n:
			if self.logger:
				self.logger("grow mempool %s by %d (used %d)" % (self.name, n, self.used))
			self.arenas.append(self.allocator.alloc(n))
			buf = self.arenas[-1][0:n]
			self.used += effsize
		else:
			buf = self.arenas[-1][self.used:self.used+n]
			self.used += effsize
		return buf
	@property
	def capacity(self):
		return self.arenas[0].size if len(self.arenas) == 1 else self.used
	def free(self):
		if self.logger: self.logger("free mempool %s" % self.name)
		self.arenas = []
		self.used   = 0
	def reset(self):
		"""Invalidate handed-out memory; consolidate to one arena of the peak
		capacity so future allocations reuse it without growing."""
		if len(self.arenas) != 1:
			cap = self.capacity
			self.arenas = []
			if cap > 0:
				self.arenas = [self.allocator.alloc(cap)]
		self.used = 0
		return self
	def reserve(self, n):
		"""Reserve space for at least n bytes without reallocation."""
		self.reset()
		self.alloc(n)
		self.reset()
		return self
	def swap(self, other):
		"""Swap internal buffers with other (reference Mempool.swap:202)."""
		self.arenas, other.arenas = other.arenas, self.arenas
		self.used, other.used = other.used, self.used
		self.allocator, other.allocator = other.allocator, self.allocator
	def proxy(self, name):
		return ArrayPoolProxy(self, name=name)
	def __repr__(self):
		return "%s(name='%s', capacity=%d, used=%d)" % (
			self.__class__.__name__, self.name, self.capacity, self.used)


class ArrayPoolCpu(Mempool):
	"""Array-level interface over a host Mempool (reference device.ArrayPoolCpu:210)."""
	def array(self, arr, reset=True, logger=None):
		self.logger = logger or self.logger
		arr = np.asarray(arr)
		oarr = self.empty(arr.shape, dtype=arr.dtype, reset=reset)
		oarr[:] = arr
		return oarr
	def empty(self, shape, dtype=np.float32, reset=True):
		if reset: self.reset()
		n = int(np.prod(shape))*np.dtype(dtype).itemsize
		return self.alloc(n).view(dtype).reshape(shape)
	def full(self, shape, val, dtype=np.float32, reset=True):
		arr = self.empty(shape, dtype=dtype, reset=reset)
		arr[:] = val
		return arr
	def zeros(self, shape, dtype=np.float32, reset=True):
		return self.full(shape, 0, dtype=dtype, reset=reset)
	def ones(self, shape, dtype=np.float32, reset=True):
		return self.full(shape, 1, dtype=dtype, reset=reset)
	def alloc_raw(self, n): return self.alloc(n)
	@contextlib.contextmanager
	def as_allocator(self, reset=True):
		if reset: self.reset()
		yield


class ArrayPoolTpu:
	"""Pool API over jax device arrays (replaces reference ArrayPoolGpu:238).
	XLA owns device memory; reuse is expressed with buffer donation in jitted
	calls, so this pool creates arrays and tracks sizes only."""
	def __init__(self, device=None, name="[unnamed]", logger=None, **_):
		self.device = device
		self.name   = name
		self.logger = logger
		self.used   = 0
	def _dev(self):
		import jax
		return self.device.dev if self.device is not None else jax.devices()[0]
	def array(self, arr, reset=True, logger=None):
		import jax
		if reset: self.reset()
		out = jax.device_put(np.ascontiguousarray(np.asarray(arr)), self._dev())
		self.used += out.size*out.dtype.itemsize
		return out
	def empty(self, shape, dtype=np.float32, reset=True):
		return self.zeros(shape, dtype=dtype, reset=reset)
	def full(self, shape, val, dtype=np.float32, reset=True):
		import jax, jax.numpy as jnp
		if reset: self.reset()
		out = jax.device_put(jnp.full(shape, val, dtype), self._dev())
		self.used += out.size*out.dtype.itemsize
		return out
	def zeros(self, shape, dtype=np.float32, reset=True):
		return self.full(shape, 0, dtype=dtype, reset=reset)
	def ones(self, shape, dtype=np.float32, reset=True):
		return self.full(shape, 1, dtype=dtype, reset=reset)
	@property
	def capacity(self): return self.used
	def reset(self): self.used = 0; return self
	def free(self): self.used = 0
	def reserve(self, n): return self
	def swap(self, other):
		self.used, other.used = other.used, self.used
	@contextlib.contextmanager
	def as_allocator(self, reset=True):
		if reset: self.reset()
		yield
	def __repr__(self):
		return "ArrayPoolTpu(name='%s', used=%d)" % (self.name, self.used)

ArrayPoolGpu = ArrayPoolTpu


class ArrayPoolProxy:
	"""Named view onto another pool (reference device.ArrayPoolProxy:271)."""
	def __init__(self, pool, name="[unnamed]"):
		self.name = name
		self.pool = pool
	@property
	def capacity(self): return 0
	@property
	def logger(self): return self.pool.logger
	def alloc(self, n): return self.pool.alloc(n)
	def free(self): pass  # another pool manages the memory
	def reset(self): self.pool.reset()
	def reserve(self, n): self.pool.reserve(n)
	def swap(self, other): raise NotImplementedError
	def array(self, arr, reset=True, logger=None):
		return self.pool.array(arr, reset=reset, logger=logger)
	def empty(self, shape, dtype=np.float32, reset=True):
		return self.pool.empty(shape, dtype=dtype, reset=reset)
	def full(self, shape, val, dtype=np.float32, reset=True):
		return self.pool.full(shape, val, dtype=dtype, reset=reset)
	def zeros(self, shape, dtype=np.float32, reset=True):
		return self.pool.zeros(shape, dtype=dtype, reset=reset)
	def ones(self, shape, dtype=np.float32, reset=True):
		return self.pool.ones(shape, dtype=dtype, reset=reset)
	@contextlib.contextmanager
	def as_allocator(self, reset=True):
		with self.pool.as_allocator(reset=reset):
			yield
	def __repr__(self):
		return "ArrayPoolProxy(name='%s', pool='%s')" % (self.name, self.pool.name)


class ArrayMultipool:
	"""Collection of named pools built on demand (reference device.ArrayMultipool:300)."""
	def __init__(self, factory):
		self.factory = factory
		self.pools   = {}
	def want(self, *names):
		pools = []
		for name in names:
			if name not in self.pools:
				self.pools[name] = self.factory(name=name)
			pools.append(self.pools[name])
		return pools
	def used(self): return sum(pool.used for pool in self.pools.values())
	def capacity(self): return sum(pool.capacity for pool in self.pools.values())
	def free(self):
		for name in self.pools: self.pools[name].free()
	def reset(self):
		for name in self.pools: self.pools[name].reset()
	def swap(self, name1, name2):
		self.pools[name1].swap(self.pools[name2])
	def __getitem__(self, name):
		if name not in self.pools:
			self.pools[name] = self.factory(name=name)
		return self.pools[name]
	def __getattr__(self, name):
		if name in ("pools", "factory"): raise AttributeError(name)
		return self.pools[name]
	def __repr__(self):
		names = sorted(self.pools)
		body = "".join("\n  %s" % repr(self.pools[n]) for n in names)
		return "ArrayMultipool(%s%s)" % (body, "\n" if names else "")


class Device:
	"""A compute device (reference device.Device:4)."""
	def __init__(self, jax_device=None):
		import jax
		self.dev   = jax_device or jax.devices()[0]
		self.pools = None
		self.np    = None
		self.lib   = bunch.Bunch()
	@property
	def platform(self): return self.dev.platform
	def ptr(self, arr): return getptr(arr)
	def synchronize(self):
		import jax
		jax.block_until_ready(jax.numpy.zeros((), device=self.dev))
	def garbage_collect(self):
		import gc
		gc.collect()
	def time(self):
		"""Synchronized wall time (reference device.Device.time:17)."""
		self.synchronize()
		return time.perf_counter()
	def memuse(self, type="total"):
		if type == "pools":
			return self.pools.capacity() if self.pools is not None else 0
		try:
			stats = self.dev.memory_stats()
			if type == "peak": return stats.get("peak_bytes_in_use", 0)
			return stats.get("bytes_in_use", 0)
		except Exception:
			return 0
	def put(self, arr):
		import jax
		return jax.device_put(np.asarray(arr), self.dev)
	def get(self, arr):
		try: return np.asarray(arr)
		except TypeError: return arr
	def copy(self, afrom, ato):
		"""Copy afrom into ato (host buffers) or return a device copy."""
		try:
			ato[:] = np.asarray(afrom)
			return ato
		except TypeError:
			return self.put(np.asarray(afrom))


class DeviceCpu(Device):
	"""Host device with real arena pools (reference device.DeviceCpu:21)."""
	def __init__(self, align=None, alloc_factory=None, logger=None):
		import jax
		cpus = jax.devices("cpu") if _has_platform("cpu") else jax.devices()
		super().__init__(cpus[0])
		if align is None: align = 16
		if alloc_factory is None:
			def alloc_factory(name):
				return ArrayPoolCpu(AllocAligned(AllocCpu(), align=align),
					name=name, logger=logger)
		self.pools = ArrayMultipool(alloc_factory)
		self.np = np
	def synchronize(self): pass
	def get(self, arr):
		try: return np.asarray(arr).copy()
		except TypeError: return arr
	def memuse(self, type="total"):
		if type == "total":
			from . import memory
			return memory.current()
		if type == "pools": return self.pools.capacity()
		if type == "np": return 0
		raise ValueError("Unknown memuse type: '%s'" % str(type))
	def copy(self, afrom, ato):
		ato[:] = afrom
		return ato


class DeviceTpu(Device):
	"""Accelerator device (replaces reference DeviceGpu:52)."""
	def __init__(self, align=None, alloc_factory=None, logger=None):
		import jax
		super().__init__(jax.devices()[0])
		import jax.numpy as jnp
		if alloc_factory is None:
			def alloc_factory(name):
				return ArrayPoolTpu(device=self, name=name, logger=logger)
		self.pools = ArrayMultipool(alloc_factory)
		self.np = jnp

DeviceGpu = DeviceTpu  # API parity: the accelerator device


def _has_platform(name):
	import jax
	try:
		jax.devices(name)
		return True
	except RuntimeError:
		return False

def get_device(name="auto"):
	import jax
	if name == "auto":
		return DeviceTpu() if jax.default_backend() != "cpu" else DeviceCpu()
	if name == "cpu": return DeviceCpu()
	return DeviceTpu()


def device_memcpy(afrom, ato):
	"""Copy between host/device buffers (replaces reference cuda_memcpy:343)."""
	try:
		ato[:] = np.asarray(afrom)
		return ato
	except TypeError:
		import jax
		return jax.device_put(np.asarray(afrom))

cuda_memcpy = device_memcpy  # legacy name


def anypy(arr):
	"""Return the array module (np or jnp) matching arr (reference device.anypy:353)."""
	from . import utils
	return utils._xp(arr)


class ArrayPool(ArrayPoolTpu):
	"""Backwards-compatible alias used by earlier versions of this package."""
	def __init__(self, device=None, name="pool", **kw):
		super().__init__(device=device, name=name, **kw)
		self.arrays = {}
