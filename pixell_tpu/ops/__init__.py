"""TPU compute kernels: the engine layer under the public API."""
