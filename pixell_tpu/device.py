"""Device and memory services for the TPU runtime.

The reference (pixell/device.py) abstracts CPU-vs-GPU with explicit byte
allocators and arena memory pools, because cupy leaves allocation to the
user. Under JAX the runtime owns device memory, so pooling by pointer
arithmetic is the wrong tool; what replaces it:

- `Device` wraps a jax.Device: transfers, synchronization, synchronized
  timing, and memory introspection through the runtime's own counters
  (`jax.Device.memory_stats`), which see every live XLA buffer -- something
  the reference's pools could only approximate by tracking their own arenas.
- Buffer REUSE is expressed with donation, not pools: `donating_jit` marks
  chosen arguments as donated so XLA writes outputs into their storage, and
  `Workspace` holds named long-lived device buffers that callers check out
  (ownership transfer), donate into a step function, and check back in.
  This is the SURVEY plan ("pools become explicit donated buffers") and is
  how steady-state pipelines (CG iterations, map-maker sweeps) run with a
  constant memory footprint.

Reference API parity notes: `get_device`, `Device.memuse/synchronize/time`,
and `anypy` correspond to reference device.py:4-121,343-366. The arena pool
classes (reference device.py:127-340) intentionally have no counterpart;
`Workspace` covers their role in this framework.
"""
from __future__ import annotations
import gc
import os
import time
import functools
import numpy as np


# ---------------------------------------------------------------------------
# Devices
# ---------------------------------------------------------------------------
class Device:
	"""One jax device plus the services the library needs from it."""
	kind = "abstract"
	def __init__(self, dev=None, index=0):
		import jax
		self.dev = dev if dev is not None else jax.devices()[index]
		self.workspaces = {}
	# --- transfers ---
	def put(self, arr):
		"""Host (or other-device) array -> this device."""
		import jax
		return jax.device_put(arr, self.dev)
	def get(self, arr):
		"""Array -> host numpy."""
		return np.asarray(arr)
	# --- execution ---
	def synchronize(self):
		"""Wait until all work enqueued on this device has finished."""
		import jax
		(self.put(np.zeros(())) + 0).block_until_ready()
	def time(self):
		"""Wall time after a device sync, for timing device work."""
		self.synchronize()
		return time.perf_counter()
	def garbage_collect(self):
		gc.collect()
	# --- memory ---
	def memuse(self, type="total"):
		"""Live device memory in bytes. type: "total" | "peak" |
		"workspaces" (bytes held by this device's Workspace objects)."""
		if type == "workspaces":
			return sum(w.nbytes for w in self.workspaces.values())
		stats = self.dev.memory_stats() or {}
		key = "peak_bytes_in_use" if type == "peak" else "bytes_in_use"
		return int(stats.get(key, 0))
	def workspace(self, name):
		"""Named Workspace living on this device (created on first use)."""
		if name not in self.workspaces:
			self.workspaces[name] = Workspace(self)
		return self.workspaces[name]
	@property
	def np(self):
		import jax.numpy as jnp
		return jnp
	def __repr__(self):
		return "%s(%s)" % (self.__class__.__name__, self.dev)


class DeviceCpu(Device):
	kind = "cpu"
	def __init__(self, dev=None):
		import jax
		if dev is None:
			try: dev = jax.devices("cpu")[0]
			except RuntimeError: dev = jax.devices()[0]
		super().__init__(dev)
	def synchronize(self):
		pass
	def memuse(self, type="total"):
		if type == "workspaces":
			return sum(w.nbytes for w in self.workspaces.values())
		# host backends rarely report memory_stats; fall back to process RSS
		stats = self.dev.memory_stats() or {}
		if stats:
			key = "peak_bytes_in_use" if type == "peak" else "bytes_in_use"
			return int(stats.get(key, 0))
		from . import memory
		return memory.max() if type == "peak" else memory.current()
	@property
	def np(self):
		return np


class DeviceTpu(Device):
	kind = "tpu"

# The accelerator role the reference filled with cupy ("gpu") is the TPU here
DeviceGpu = DeviceTpu


def get_device(name="auto", index=0):
	"""Device factory (reference device.py's Device selection)."""
	import jax
	if name == "auto":
		name = "cpu" if jax.default_backend() == "cpu" else "tpu"
	if name == "cpu":
		return DeviceCpu()
	return DeviceTpu(jax.devices()[index])


def anypy(arr):
	"""The array module (numpy or jax.numpy) that made arr."""
	from . import utils
	return utils._xp(arr)


def enable_compilation_cache(directory=None, min_compile_secs=0.0):
	"""Turn on jax's persistent compilation cache: compiled executables are
	serialized to `directory` (default ~/.cache/pixell_tpu_xla) and reloaded
	by hash on later runs, making expensive first compiles a per-MACHINE
	cost instead of per-process. This is what makes the opt-in MXU
	block-Legendre split (`sht.blocked()`, minutes of Mosaic compile per
	geometry through remote-compile runtimes) practical to leave on in
	production pipelines. Safe to call more than once."""
	import jax
	if directory is None:
		directory = os.path.join(os.path.expanduser("~"), ".cache",
			"pixell_tpu_xla")
	os.makedirs(directory, exist_ok=True)
	jax.config.update("jax_compilation_cache_dir", directory)
	jax.config.update("jax_persistent_cache_min_compile_time_secs",
		float(min_compile_secs))
	jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
	return directory


# ---------------------------------------------------------------------------
# Donation: the TPU-native replacement for memory pools
# ---------------------------------------------------------------------------
def donating_jit(fun=None, donate=(0,), **jit_kw):
	"""jax.jit with donated arguments: XLA reuses the donated inputs'
	device memory for the outputs, so iterating `x = step(x)` runs with a
	constant footprint -- the role of the reference's buffer pools.

	Use as a decorator or called directly:
	    step = donating_jit(lambda x: x + 1)
	    x = step(x)   # x's old buffer is dead after this; don't reuse it
	"""
	import jax
	if fun is None:
		return functools.partial(donating_jit, donate=donate, **jit_kw)
	return jax.jit(fun, donate_argnums=tuple(donate), **jit_kw)


class Workspace:
	"""Named long-lived device buffers with checkout semantics.

	A Workspace holds device arrays between pipeline steps. `take` removes
	and returns a buffer (the caller now owns it and may donate it into a
	jitted call); `give` stores a buffer under a name; `ensure` returns a
	zeroed buffer of the requested shape, reusing a stored one when its
	shape and dtype match. Because ownership is explicit, there is no
	aliasing between stored buffers and donated arguments -- the failure
	mode pointer-reuse pools have to defend against."""
	def __init__(self, device=None):
		self.device = device if device is not None else get_device()
		self._bufs = {}
	def give(self, name, arr):
		self._bufs[name] = arr
		return arr
	def take(self, name, default=None):
		return self._bufs.pop(name, default)
	def peek(self, name, default=None):
		return self._bufs.get(name, default)
	def ensure(self, name, shape, dtype=np.float32):
		"""A zeroed device buffer of the given shape/dtype, reusing the
		stored one when compatible (constant steady-state footprint)."""
		import jax.numpy as jnp
		cur = self._bufs.get(name)
		shape = tuple(shape)
		if cur is not None and cur.shape == shape \
				and cur.dtype == np.dtype(dtype):
			out = cur*0
		else:
			out = self.device.put(jnp.zeros(shape, dtype))
		self._bufs[name] = out
		return out
	def drop(self, name):
		self._bufs.pop(name, None)
	def clear(self):
		self._bufs.clear()
	@property
	def nbytes(self):
		return sum(int(np.prod(b.shape))*b.dtype.itemsize
			for b in self._bufs.values())
	def names(self):
		return sorted(self._bufs)
	def __contains__(self, name):
		return name in self._bufs
	def __repr__(self):
		body = ", ".join("%s%s" % (n, tuple(self._bufs[n].shape))
			for n in self.names())
		return "Workspace(%d bytes: %s)" % (self.nbytes, body)
