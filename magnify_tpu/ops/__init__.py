"""Device (JAX/TPU) compute kernels: the framework's ops layer (L3)."""
