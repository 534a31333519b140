"""Test configuration.

Tests run on the CPU backend with 8 virtual devices so multi-chip sharding
paths (mesh + shard_map) are exercised without TPU hardware. The axon TPU
plugin in this environment overrides JAX_PLATFORMS at import time, so the
platform is forced via jax.config after import. Set
MAGNIFY_TPU_TEST_BACKEND=tpu to run the suite on a real chip instead.
"""

import os

if os.environ.get("MAGNIFY_TPU_TEST_BACKEND", "cpu") == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
