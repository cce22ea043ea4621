"""Device and memory abstraction (reference pixell/device.py).

The reference abstracts CPU vs GPU (cupy) with explicit memory pools
(device.py:4-369). Under jax the runtime owns allocation, so this module
maps the same API onto jax devices: Device wraps a jax.Device, pools become
explicit donated-buffer helpers, and `memuse` reads jax memory stats."""
from __future__ import annotations
import numpy as np


class Device:
	"""A compute device (reference device.Device:4)."""
	def __init__(self, jax_device=None):
		import jax
		self.dev = jax_device or jax.devices()[0]
		self.np = None  # array module, set by subclasses
	@property
	def platform(self): return self.dev.platform
	def synchronize(self):
		import jax
		jax.block_until_ready(jax.numpy.zeros((), device=self.dev))
	def time(self):
		"""Synchronized wall time (reference device.py:17)."""
		import time
		self.synchronize()
		return time.perf_counter()
	def memuse(self, type="total"):
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
		return np.asarray(arr)
	def copy(self, dest, src):
		return self.put(np.asarray(src))

class DeviceCpu(Device):
	def __init__(self):
		import jax
		cpus = [d for d in jax.devices("cpu")] if _has_platform("cpu") else []
		super().__init__(cpus[0] if cpus else jax.devices()[0])
		self.np = np

class DeviceTpu(Device):
	def __init__(self):
		import jax
		super().__init__(jax.devices()[0])
		import jax.numpy as jnp
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


class ArrayPool:
	"""Named arena of reusable device buffers (reference device.Mempool:136).
	Under XLA, explicit reuse is achieved with buffer donation; this pool
	tracks arrays by name so jitted steps can donate them."""
	def __init__(self, device=None, name="pool"):
		self.device = device or get_device()
		self.name = name
		self.arrays = {}
	def empty(self, shape, dtype=np.float32, name=None):
		import jax.numpy as jnp
		key = name or ("anon%d" % len(self.arrays))
		arr = jnp.zeros(shape, dtype)
		self.arrays[key] = arr
		return arr
	def zeros(self, shape, dtype=np.float32, name=None):
		return self.empty(shape, dtype, name)
	def reset(self):
		self.arrays.clear()
	def size(self):
		return sum(a.size*a.dtype.itemsize for a in self.arrays.values())

Mempool = ArrayPool
ArrayPoolCpu = ArrayPool
ArrayPoolGpu = ArrayPool

def anypy(arr):
	"""Return the array module (np or jnp) matching arr (reference device.anypy:353)."""
	from . import utils
	return utils._xp(arr)
