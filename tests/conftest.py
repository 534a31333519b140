"""Test configuration.

Tests run on the CPU backend with 8 virtual devices so multi-chip sharding
paths (mesh + shard_map) are exercised without TPU hardware. The axon TPU
plugin in this environment overrides JAX_PLATFORMS at import time, so the
platform is forced via jax.config after import. Set
MAGNIFY_TPU_TEST_BACKEND=tpu to run the suite on a real chip instead.

Caching: the suite points MAGNIFY_TPU_CACHE_DIR at a repo-local directory
so (a) the user's real ~/.cache/magnify_tpu is never touched by tests and
(b) the persistent XLA compilation cache still works across runs (the mesh
e2e tests compile dozens of shard_map programs; recompiling them every run
dominated suite wall time). The cap memo sidecar is deleted at session
start so the grow-retry path stays exercised (a persisted cap would mask
it) — compiled programs persist, detection cap state does not.
"""

import os

_TEST_CACHE = os.path.abspath(
    os.path.join(os.path.dirname(__file__), os.pardir, ".cache", "test_xla"))
# Unconditionally (not setdefault): a developer with MAGNIFY_TPU_CACHE_DIR
# exported must not have their real cache polluted with CPU test programs —
# or their learned cap memo deleted by the reset below.
os.environ["MAGNIFY_TPU_CACHE_DIR"] = _TEST_CACHE
try:
    os.remove(os.path.join(_TEST_CACHE, "cap_memo.json"))
except OSError:
    pass

if os.environ.get("MAGNIFY_TPU_TEST_BACKEND", "cpu") == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
