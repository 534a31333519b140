"""Double-buffered host -> HBM streaming.

Replaces the reference's per-page dask task scheduling
(/root/reference/src/magnify/reader.py:284-292) for the device pipeline:
while the chip crunches plane t, the host is already decoding and
transferring plane t+1. ``jax.device_put`` is asynchronous, so a prefetch
depth of 2 keeps one transfer in flight behind compute.
"""

from __future__ import annotations

import collections
import threading
from collections.abc import Callable, Iterable, Iterator

import jax
import numpy as np

__all__ = ["DevicePrefetcher", "stream_planes"]


class DevicePrefetcher:
    """Iterate (key, device_array) with IO + transfer overlapped.

    ``loader(key) -> np.ndarray`` runs on a background thread (TIFF decode,
    memmap reads); the decoded block is immediately handed to
    ``jax.device_put`` (async), and consumers receive arrays that are
    usually already resident when they're needed.
    """

    def __init__(self, keys: Iterable, loader: Callable, depth: int = 2,
                 device=None, sharding=None):
        self.keys = list(keys)
        self.loader = loader
        self.depth = max(1, depth)
        self.placement = sharding if sharding is not None else device

    def __iter__(self) -> Iterator:
        queue: collections.deque = collections.deque()
        cv = threading.Condition()
        done = object()
        failure: list = []
        cancelled = threading.Event()

        def produce():
            try:
                for key in self.keys:
                    if cancelled.is_set():
                        return
                    block = np.ascontiguousarray(self.loader(key))
                    if self.placement is not None:
                        arr = jax.device_put(block, self.placement)
                    else:
                        arr = jax.device_put(block)
                    with cv:
                        while len(queue) >= self.depth:
                            if cancelled.is_set():
                                return
                            cv.wait()
                        queue.append((key, arr))
                        cv.notify_all()
            except BaseException as e:  # propagate to the consumer
                failure.append(e)
            finally:
                with cv:
                    queue.append(done)
                    cv.notify_all()

        thread = threading.Thread(target=produce, daemon=True)
        thread.start()
        try:
            while True:
                with cv:
                    while not queue:
                        cv.wait()
                    item = queue.popleft()
                    cv.notify_all()
                if item is done:
                    break
                yield item
            thread.join()
            if failure:
                raise failure[0]
        finally:
            # The consumer may abandon the iterator mid-stream (exception in
            # the for-body, generator GC): release the producer so it doesn't
            # block in cv.wait() forever holding device buffers.
            cancelled.set()
            with cv:
                queue.clear()
                cv.notify_all()


def stream_planes(dataset, var: str = "image", dims=("channel", "time"),
                  depth: int = 2, device=None, sharding=None):
    """Stream (index, device_plane) pairs from a dataset variable.

    Iterates the cartesian product of ``dims`` (e.g. every channel x time
    plane of the stitched image), loading each plane from its (possibly
    lazy / memmapped) backing store on a background thread.

    ``sharding`` (a ``jax.sharding.NamedSharding``/``Sharding``) places
    each streamed plane directly onto a device mesh — e.g.
    ``NamedSharding(mesh, P("space", None))`` row-shards every plane so an
    out-of-core stack feeds :func:`~magnify_tpu.parallel.mesh.
    sharded_find_circles_batch`-style programs without a single-device
    bounce (out-of-core and multi-chip compose; SURVEY §2.12).
    """
    da = dataset[var]
    sizes = [dataset.sizes[d] for d in dims if d in da.dims]
    used = [d for d in dims if d in da.dims]
    keys = list(np.ndindex(*sizes)) if sizes else [()]

    def loader(key):
        sub = da
        for d, i in zip(used, key):
            sub = sub.isel(**{d: int(i)})
        return sub.to_numpy()

    return DevicePrefetcher(keys, loader, depth=depth, device=device,
                            sharding=sharding)
