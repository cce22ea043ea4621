import os
# Run the test suite on a virtual multi-device CPU mesh: fast, deterministic,
# float64-capable. Real-TPU behavior is covered by bench.py / __graft_entry__.py.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
	os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax
# jax may already have been imported (pytest plugins); config.update still
# works as long as no backend has been initialized yet.
jax.config.update("jax_platforms", "cpu")
try:
	jax.config.update("jax_num_cpu_devices", 8)
except Exception:
	pass
jax.config.update("jax_enable_x64", True)
