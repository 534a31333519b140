"""Multi-chip execution (mesh sharding, halo exchange, host->HBM streaming).

The reference is single-process (SURVEY.md section 2.12); its scaling story is
Dask chunk laziness. This package is the TPU-native replacement: batches of
(time x channel) image planes shard across a ``batch`` mesh axis, the image
plane itself shards across a ``space`` axis with halo exchange for stencils
(the imaging analog of sequence/context parallelism), global statistics ride
ICI collectives (psum histograms), and the host feeds HBM through a
double-buffered prefetcher.
"""

from magnify_tpu.parallel.mesh import (
    active_mesh,
    make_mesh,
    sharded_detect_step,
    sharded_find_circles,
    sharded_find_circles_batch,
    sharded_find_circles_batch_packed,
    use_mesh,
)
from magnify_tpu.parallel.multihost import (
    host_shard_keys,
    make_global_stack,
    multihost_mesh,
)
from magnify_tpu.parallel.streaming import DevicePrefetcher, stream_planes

__all__ = ["DevicePrefetcher", "active_mesh", "host_shard_keys",
           "make_global_stack", "make_mesh", "multihost_mesh",
           "sharded_detect_step", "sharded_find_circles",
           "sharded_find_circles_batch", "sharded_find_circles_batch_packed",
           "stream_planes", "use_mesh"]
