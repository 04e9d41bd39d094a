"""Device-resident dataset cache: pay the host->device wire once.

TPU-native counterpart of the reference's 4-worker DataLoader (ref
opencood/tools/train.py:42): on a GPU box the per-frame H2D copy hides in
PCIe bandwidth, but a TPU eval/train loop that re-visits a fixed split
every epoch can do strictly better — keep the PADDED, fixed-shape batches
IN HBM and never touch the wire again. An OPV2V-scale intermediate-fusion
batch is ~2.5 MB/frame, so the full 2170-frame test split is ~5.4 GB —
comfortably resident next to the model on a 16 GB chip.

This matters doubly on tunneled/remote device stacks where H2D is
latency-bound (measured on the axon v5e rig: ~27 ms/transfer + ~35 ms/MB
— a 2.55 MB frame costs ~116 ms on the wire vs 20.6 ms of compute), but
the design is the right call on any TPU: HBM reads are free compared to
re-transferring identical bytes every epoch.
"""

from __future__ import annotations

from typing import Iterable, Iterator


class DeviceBatchCache:
    """Caches device-resident batches across epochs, bounded by bytes.

    First pass: iterate host batches, ``jax.device_put`` each, store the
    device refs (up to ``max_bytes``). Later passes replay the stored refs
    with zero host or wire work. Batches past the cap are re-fed from the
    source every epoch (and re-transferred) — the cache degrades, never
    breaks.
    """

    def __init__(self, max_bytes: int = 6 << 30, sharding=None):
        self.max_bytes = int(max_bytes)
        self.sharding = sharding
        self._cached: list = []
        self._bytes = 0
        self._complete = False

    @property
    def num_cached(self) -> int:
        return len(self._cached)

    @property
    def cached_bytes(self) -> int:
        return self._bytes

    def epoch(self, source: Iterable) -> Iterator:
        """Yield device batches for one epoch.

        ``source`` must be a FRESH iterable of host (or device) batches in
        a stable order; it is only consumed on the first epoch and for any
        overflow tail on later epochs. A source with ``__getitem__`` +
        ``__len__`` (a lazy batch sequence) is skipped INDEXABLY — the
        cached prefix costs no host work at all; a plain generator is
        skipped by consuming (each skipped item is still produced).
        """
        import jax

        if self._complete:
            yield from self._cached
            return

        # replay the cached prefix, then continue from the source. The
        # cache is always a PREFIX of the (stable) source order: once one
        # batch overflows the cap, caching stops for good — a later small
        # batch must NOT be cached out of order.
        yield from self._cached
        if hasattr(source, "__getitem__") and hasattr(source, "__len__"):
            it = (source[i] for i in range(len(self._cached), len(source)))
        else:
            it = iter(source)
            for _ in range(len(self._cached)):
                next(it, None)  # skip the frames the cache already covers
        full = self._bytes >= self.max_bytes or getattr(
            self, "_overflowed", False)
        for batch in it:
            db = (jax.device_put(batch, self.sharding)
                  if self.sharding is not None else jax.device_put(batch))
            size = sum(v.nbytes for v in jax.tree_util.tree_leaves(db))
            if not full and self._bytes + size <= self.max_bytes:
                self._cached.append(db)
                self._bytes += size
            else:
                full = self._overflowed = True
            yield db
        # only reached when the source was fully consumed (an abandoned
        # generator never runs this line, so a partial epoch can't mark
        # the cache complete)
        if not full:
            self._complete = True
