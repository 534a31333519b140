"""Multi-chip detection on a sharded device mesh.

Shows `mg.parallel.use_mesh`: the same `mg.beads` call, but detection runs
sharded over a (batch, space) mesh — plane batches data-parallel, each
image plane row-sharded with ppermute halo exchange for the edge stencils
and exact collective quantiles. Results are bit-identical to single-chip.

This walkthrough always runs on a virtual 8-device CPU mesh so it works
anywhere (the script provisions the devices and forces the CPU backend,
matching tests/conftest.py). On a real multi-chip TPU slice, delete the
``jax.config.update("jax_platforms", "cpu")`` line in ``main`` to run the
same code over the hardware mesh.
"""

import os
import sys

MESH_SIZE = 8  # batch=2 x space=4

if "xla_force_host_platform_device_count" not in os.environ.get(
        "XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={MESH_SIZE}"
    ).strip()

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    # This walkthrough targets the virtual CPU mesh so it runs anywhere
    # (counting real devices would initialize the backend, after which the
    # platform can no longer change — the axon plugin ignores JAX_PLATFORMS).
    # On a real multi-chip TPU slice, delete this line.
    jax.config.update("jax_platforms", "cpu")

    import magnify_tpu as mg
    from magnify_tpu.core import DataArray
    from magnify_tpu.parallel import make_mesh, use_mesh
    from magnify_tpu.utils import filled_circle_points

    rng = np.random.default_rng(0)
    img = rng.normal(120, 6, (512, 512))
    disk = filled_circle_points(9)
    centers = [(64 + 96 * i, 64 + 96 * j) for i in range(5) for j in range(5)]
    for pos in centers:
        pts = disk + np.asarray(pos)
        img[pts[:, 0], pts[:, 1]] = 1000
    data = DataArray(img.astype(np.uint16), dims=("y", "x"))
    # detector="dense" explicitly: mesh routing shards the dense detector
    # (on TPU "auto" already resolves to dense; on this CPU walkthrough
    # "auto" would pick the reference-faithful ransac mode, which runs
    # single-device).
    kw = dict(min_bead_diameter=14, max_bead_diameter=22, overlap=0,
              num_iter=200_000, min_roundness=0.3, detector="dense")

    xp_single = mg.beads(data=data, **kw)

    mesh = make_mesh(batch=2, space=MESH_SIZE // 2)
    with use_mesh(mesh):
        xp_mesh = mg.beads(data=data, **kw)

    print(f"mesh {dict(mesh.shape)} on {jax.default_backend()}:")
    print(f"  single-chip marks: {xp_single.roi.sizes['mark']}")
    print(f"  mesh marks:        {xp_mesh.roi.sizes['mark']}")
    same = (np.array_equal(xp_single.x.values, xp_mesh.x.values)
            and np.array_equal(xp_single.y.values, xp_mesh.y.values))
    print(f"  centers bit-identical: {same}")
    assert same and xp_mesh.roi.sizes["mark"] == len(centers)


if __name__ == "__main__":
    main()
