"""Probe: real 2-process JAX distributed init + cross-process psum on CPU.

Spawned once per process by __main__; validates that this jaxlib supports
multi-controller CPU collectives (gloo) before building the DCN ingest
test on it.

    python scripts/dcn_probe.py            # launches both workers
    python scripts/dcn_probe.py WORKER N   # internal
"""

from __future__ import annotations

import os
import subprocess
import sys

PORT = int(os.environ.get("DCN_PROBE_PORT", "52431"))


def worker(pid: int):
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    # The axon TPU plugin ignores JAX_PLATFORMS; force the true CPU
    # backend the way tests/conftest.py does.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(f"127.0.0.1:{PORT}", num_processes=2,
                               process_id=pid)
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())
    mesh = Mesh(jax.devices(), ("d",))
    sharding = NamedSharding(mesh, P("d"))
    import numpy as np

    local = np.arange(4, dtype=np.float32) + 4 * pid
    arr = jax.make_array_from_process_local_data(sharding, local, (8,))
    total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(arr)
    got = float(np.asarray(jax.device_get(total)))
    assert got == 28.0, got
    print(f"[pid {pid}] psum over 2 processes OK: {got}", flush=True)


def main():
    env = dict(os.environ)
    procs = [
        subprocess.Popen([sys.executable, __file__, "WORKER", str(i)],
                         env=env)
        for i in range(2)
    ]
    codes = [p.wait(timeout=240) for p in procs]
    if any(codes):
        raise SystemExit(f"worker exit codes {codes}")
    print("DCN probe OK")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "WORKER":
        worker(int(sys.argv[2]))
    else:
        main()
