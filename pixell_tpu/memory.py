"""Process memory introspection (reference pixell/memory.py)."""
from __future__ import annotations
import os, sys


def _proc_status(field):
	try:
		with open("/proc/self/status") as f:
			for line in f:
				if line.startswith(field):
					return int(line.split()[1])*1024
	except IOError:
		return 0
	return 0

def current():
	"""Current virtual memory usage in bytes (reference memory.current)."""
	return _proc_status("VmSize")

def resident():
	"""Current resident memory in bytes."""
	return _proc_status("VmRSS")

def max():
	"""Peak memory usage in bytes."""
	return _proc_status("VmPeak")

def max_resident():
	return _proc_status("VmHWM")

def device_memory():
	"""Live/peak device (TPU/GPU) memory from jax, in bytes, or (0,0)."""
	try:
		import jax
		stats = jax.local_devices()[0].memory_stats()
		return stats.get("bytes_in_use", 0), stats.get("peak_bytes_in_use", 0)
	except Exception:
		return 0, 0

def trace(msg=""):
	"""Print an annotated memory snapshot (reference memory.trace:21)."""
	dev_live, dev_peak = device_memory()
	sys.stderr.write("mem %8.3f GB cur %8.3f GB res %8.3f GB peak | dev %8.3f GB live %8.3f GB peak %s\n" % (
		current()/1e9, resident()/1e9, max()/1e9, dev_live/1e9, dev_peak/1e9, msg))


def fallback(things, default=lambda: 0):
	"""First callable in things that doesn't raise (reference
	memory.fallback)."""
	for thing in things:
		try: return thing()
		except Exception: continue
	return default()

def linux_current():
	"""Current memory use from /proc (reference memory.linux_current)."""
	with open("/proc/self/status") as f:
		for line in f:
			if line.startswith("VmSize:"):
				return int(line.split()[1])*1024
	raise OSError("VmSize not found")

def linux_resident():
	with open("/proc/self/status") as f:
		for line in f:
			if line.startswith("VmRSS:"):
				return int(line.split()[1])*1024
	raise OSError("VmRSS not found")

def linux_max():
	with open("/proc/self/status") as f:
		for line in f:
			if line.startswith("VmPeak:"):
				return int(line.split()[1])*1024
	raise OSError("VmPeak not found")

def get_mac_taskinfo():
	raise OSError("mac taskinfo not available on this platform")

def mac_current():
	import resource
	return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss

def mac_resident():
	return mac_current()

def mac_max():
	return mac_current()

class MemUse:
	"""Track memory use across a with-block (reference memory.MemUse)."""
	def __init__(self, name="", verbose=True):
		self.name = name
		self.verbose = verbose
	def __enter__(self):
		self.start = fallback([linux_resident, mac_resident])
		return self
	def __exit__(self, type, value, traceback):
		self.stop = fallback([linux_resident, mac_resident])
		self.diff = self.stop - self.start
		if self.verbose:
			print("memuse %s: %.2f MB -> %.2f MB (%+.2f MB)" % (self.name,
				self.start/1e6, self.stop/1e6, self.diff/1e6))
