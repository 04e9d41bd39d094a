"""Host->device input pipeline: threaded batch prefetch.

The reference hides CPU-side voxelization/label assembly inside 4 torch
DataLoader worker processes (ref opencood/tools/train.py:42
``num_workers=4``). Here batch assembly (numpy + the C++ data plane) runs
in a background thread while the TPU executes the previous step, and the
assembled arrays are moved to the device (optionally with a mesh sharding)
ahead of time so the H2D copy also overlaps compute. Threads suffice:
assembly is numpy/C++ code that releases the GIL, and the consumer spends
its time blocked in device execution.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

_SENTINEL = object()


def _place(item, to_device, mesh, axis):
    if not to_device or not isinstance(item, dict):
        return item
    import jax
    sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec
        sharding = NamedSharding(mesh, PartitionSpec(axis))
    return {k: jax.device_put(v, sharding) for k, v in item.items()}


def prefetch_batches(batcher, dataset, batch_size: int, *, workers: int = 4,
                     size: int = 4, to_device: bool = True, mesh=None,
                     axis: str = "data", shuffle: bool = True,
                     drop_last: bool = True):
    """Assemble batches in a ``workers``-thread pool, yielding in order.

    The multi-worker counterpart of ``prefetch(batcher.batches(...))`` —
    the reference gets the same effect from 4 DataLoader worker processes
    (ref tools/train.py:42). Threads suffice here because the per-frame
    work is numpy, ctypes (C++ PCD parse) and libyaml, all of which
    release or mostly avoid the GIL; ``size`` batches are kept in flight.
    """
    import numpy as np

    idx = np.arange(len(dataset))
    if shuffle:
        batcher.rng.shuffle(idx)
    chunks = [idx[s:s + batch_size] for s in range(0, len(idx), batch_size)]
    if drop_last:
        chunks = [c for c in chunks if len(c) == batch_size]
    use_train = getattr(batcher, "train", False) and hasattr(
        batcher, "assemble_train")

    def make(chunk):
        frames = [dataset[i] for i in chunk]
        batch = (batcher.assemble_train(frames) if use_train
                 else batcher.assemble(frames))
        return _place(batch, to_device, mesh, axis)

    with ThreadPoolExecutor(max_workers=max(1, workers)) as pool:
        inflight: list = []
        it = iter(chunks)
        try:
            for chunk in it:
                inflight.append(pool.submit(make, chunk))
                if len(inflight) >= max(1, size):
                    break
            while inflight:
                out = inflight.pop(0).result()
                nxt = next(it, None)
                if nxt is not None:
                    inflight.append(pool.submit(make, nxt))
                yield out
        finally:
            for f in inflight:
                f.cancel()


def prefetch(iterator, size: int = 2, *, to_device: bool = True,
             mesh=None, axis: str = "data"):
    """Yield items from ``iterator``, assembled ``size`` steps ahead in a
    background thread.

    to_device: eagerly ``jax.device_put`` each dict-of-arrays batch
    (with ``NamedSharding(mesh, P(axis))`` on the leading dim when a mesh
    is given — the placement :func:`parallel.mesh.shard_batch` would do).
    """
    out_q: queue.Queue = queue.Queue(maxsize=max(1, size))
    errors: list[BaseException] = []

    def place(item):
        return _place(item, to_device, mesh, axis)

    stop = threading.Event()

    def put(item) -> bool:
        """Bounded put that aborts when the consumer is gone."""
        while not stop.is_set():
            try:
                out_q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for item in iterator:
                if not put(place(item)):
                    return  # consumer abandoned the generator
        except BaseException as e:  # surfaced to the consumer below
            errors.append(e)
        finally:
            put(_SENTINEL)

    t = threading.Thread(target=worker, daemon=True,
                         name="coalign-prefetch")
    t.start()
    try:
        while True:
            item = out_q.get()
            if item is _SENTINEL:
                break
            yield item
        t.join()
        if errors:
            raise errors[0]
    finally:
        # consumer broke out early (evaluate() max_frames, noise_sweep):
        # unblock and retire the worker instead of leaking it on a full
        # queue holding device-placed batches.
        stop.set()
        t.join()
