"""Test configuration.

Tests run on the CPU backend with 8 virtual devices so multi-chip sharding
paths (mesh + shard_map) are exercised without TPU hardware, per the
framework's testing strategy. Set MAGNIFY_TPU_TEST_BACKEND=tpu to run the
suite on a real chip instead.
"""

import os

if os.environ.get("MAGNIFY_TPU_TEST_BACKEND", "cpu") == "cpu":
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
