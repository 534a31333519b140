"""Multi-host (DCN) ingest skeleton behind the existing mesh API.

SURVEY §2.12 names DCN-scale input pipelines as a first-class component of
the framework even though the single-process reference has nothing like it
(its entire parallelism inventory is thread pools). The design — documented
in docs/multihost.md and kept deliberately small here because this
environment exposes exactly one host — is:

* every host runs the SAME program (JAX multi-controller SPMD, initialized
  with ``jax.distributed.initialize``);
* the load-key space (tiff pages / zarr chunks / (channel, time) planes)
  is partitioned deterministically across hosts as equal CONTIGUOUS blocks
  (:func:`host_shard_keys`, matching the global-batch layout
  :func:`make_global_stack` assembles) — each host touches only its own
  files, so ingest bandwidth scales with host count and no image bytes
  ever cross DCN;
* each host decodes its block and assembles the GLOBAL device array with
  :func:`make_global_stack` (``jax.make_array_from_process_local_data``) —
  placement happens host->local-HBM only, DCN carries nothing but
  coordination;
* detection then runs unchanged through the mesh programs
  (:func:`magnify_tpu.parallel.mesh.sharded_find_circles_batch`): the mesh
  is laid out batch-outer / space-inner (:func:`multihost_mesh`) so the
  row-halo ``ppermute`` and quantile/hysteresis ``psum`` collectives of the
  space axis ride ICI within each host, and only the (tiny) batch-axis
  reductions ever touch DCN.

Every function below is host-count-agnostic: with one process they
degenerate to the single-host behavior, which is how the test suite (and
this environment) exercises them.
"""

from __future__ import annotations

import numpy as np

__all__ = ["host_shard_keys", "make_global_stack", "multihost_mesh"]


def host_shard_keys(keys, process_index: int | None = None,
                    process_count: int | None = None) -> list:
    """Deterministic contiguous-block partition of load keys across hosts.

    Host ``p`` loads ``keys[p*B : (p+1)*B]`` with ``B = len(keys) //
    process_count`` — the SAME layout :func:`make_global_stack` assembles
    (host ``p`` owns global batch rows ``[p*B, (p+1)*B)``), so global batch
    index ``i`` always holds the plane of ``keys[i]``. A strided
    round-robin split would scramble that correspondence (host 0's local
    rows would be keys 0, pc, 2*pc, ... but land at global rows 0..B-1)
    and, when ``len(keys) % process_count != 0``, give hosts unequal block
    sizes that ``jax.make_array_from_process_local_data`` cannot assemble.
    Defaults come from the live JAX distributed runtime.

    ``len(keys)`` must divide evenly by the host count — pad the key list
    (e.g. repeat trailing keys) or drop the remainder before calling.
    """
    import jax

    keys = list(keys)
    pi = jax.process_index() if process_index is None else int(process_index)
    pc = jax.process_count() if process_count is None else int(process_count)
    if not 0 <= pi < pc:
        raise ValueError(f"process_index {pi} out of range for {pc} hosts")
    if len(keys) % pc:
        raise ValueError(
            f"len(keys) ({len(keys)}) must be a multiple of the host count "
            f"({pc}): make_global_stack assembles equal contiguous per-host "
            "blocks — pad the key list or drop the remainder."
        )
    block = len(keys) // pc
    return keys[pi * block:(pi + 1) * block]


def multihost_mesh(batch: int | None = None, space: int | None = None):
    """(batch, space) mesh with hosts OUTER on the batch axis.

    ``jax.devices()`` orders devices process-major, so reshaping to
    (batch, space) with batch divisible by the host count keeps every
    space-axis collective (row-halo ppermute, quantile/hysteresis psum —
    the per-pixel-volume traffic) inside one host's ICI domain; only
    batch-axis reductions, which move O(cap) bytes, cross DCN.
    """
    import jax

    from magnify_tpu.parallel.mesh import make_mesh

    devices = jax.devices()
    n_proc = jax.process_count()
    if batch is None and space is None:
        batch = n_proc
        space = len(devices) // n_proc
    mesh = make_mesh(batch=batch, space=space, devices=devices)
    if n_proc > 1 and mesh.shape["batch"] % n_proc != 0:
        raise ValueError(
            f"batch axis ({mesh.shape['batch']}) must be divisible by the "
            f"host count ({n_proc}) so space collectives stay on ICI."
        )
    return mesh


def make_global_stack(local_planes: np.ndarray, mesh, global_batch:
                      int | None = None):
    """Assemble per-host plane blocks into one global (B, H, W) jax.Array
    sharded P("batch", "space", None) over ``mesh``.

    ``local_planes`` holds THIS host's contiguous block of the global batch
    (host p owns planes [p*B/n_proc, (p+1)*B/n_proc)). No image bytes cross
    DCN: ``jax.make_array_from_process_local_data`` places each host's rows
    on its own devices and records the global layout.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    local_planes = np.ascontiguousarray(local_planes)
    n_proc = jax.process_count()
    b_local, h, w = local_planes.shape
    b_global = b_local * n_proc if global_batch is None else int(global_batch)
    sharding = NamedSharding(mesh, P("batch", "space", None))
    return jax.make_array_from_process_local_data(
        sharding, local_planes, (b_global, h, w)
    )
