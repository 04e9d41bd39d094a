"""DeviceBatchCache: prefix caching, byte cap, replay identity."""

import jax
import jax.numpy as jnp
import numpy as np

from coalign_tpu.data.device_cache import DeviceBatchCache


def _batches(n, nbytes=4096):
    for i in range(n):
        yield {"x": np.full((nbytes // 4,), i, np.float32),
               "i": np.array([i], np.int32)}


def test_caches_everything_under_cap():
    cache = DeviceBatchCache(max_bytes=1 << 20)
    ep1 = list(cache.epoch(_batches(5)))
    assert cache.num_cached == 5 and cache._complete
    ep2 = list(cache.epoch(_batches(5)))
    assert len(ep2) == 5
    # replayed refs are the SAME device buffers — no re-transfer
    assert all(a["x"] is b["x"] for a, b in zip(ep1, ep2))
    for i, b in enumerate(ep2):
        assert int(b["i"][0]) == i
        np.testing.assert_array_equal(np.asarray(b["x"]), i)


def test_cap_keeps_prefix_only():
    # each batch ~4 KB + index; cap to ~2.5 batches
    cache = DeviceBatchCache(max_bytes=10000)
    ep1 = list(cache.epoch(_batches(6)))
    assert len(ep1) == 6
    assert cache.num_cached == 2
    assert not cache._complete
    ep2 = list(cache.epoch(_batches(6)))
    assert len(ep2) == 6
    # order preserved; tail re-fed from the source
    assert [int(b["i"][0]) for b in ep2] == list(range(6))
    # once overflowed, no out-of-order caching even if a later batch fits
    cache2 = DeviceBatchCache(max_bytes=5000)
    big_then_small = [{"x": np.zeros(1024, np.float32)},
                      {"x": np.zeros(1024, np.float32)},
                      {"x": np.zeros(8, np.float32)}]
    list(cache2.epoch(iter(big_then_small)))
    assert cache2.num_cached == 1
    list(cache2.epoch(iter(big_then_small)))
    assert cache2.num_cached == 1


def test_abandoned_epoch_does_not_mark_complete():
    cache = DeviceBatchCache(max_bytes=1 << 20)
    it = cache.epoch(_batches(5))
    next(it)
    del it
    assert not cache._complete
    # a full pass afterwards still yields everything exactly once
    ep = list(cache.epoch(_batches(5)))
    assert [int(b["i"][0]) for b in ep] == list(range(5))
    assert cache._complete


def test_batches_stay_usable_in_jit():
    cache = DeviceBatchCache()
    ep = list(cache.epoch(_batches(3)))
    f = jax.jit(lambda b: jnp.sum(b["x"]))
    assert float(f(ep[2])) == 2.0 * 1024


def test_indexable_source_skipped_without_consumption():
    """A sequence source's cached prefix must not be re-materialized on
    steady-state epochs (the real-split-scale bench relies on this)."""
    from coalign_tpu.data.device_cache import DeviceBatchCache

    import numpy as np

    calls = []

    class Seq:
        def __len__(self):
            return 5

        def __getitem__(self, i):
            calls.append(i)
            return {"x": np.full((2, 2), i, np.float32)}

    per = 16  # bytes of one (2,2) f32 leaf
    cache = DeviceBatchCache(max_bytes=3 * per)
    got1 = [int(b["x"][0, 0]) for b in cache.epoch(Seq())]
    assert got1 == [0, 1, 2, 3, 4] and calls == [0, 1, 2, 3, 4]
    assert cache.num_cached == 3
    calls.clear()
    got2 = [int(np.asarray(b["x"])[0, 0]) for b in cache.epoch(Seq())]
    assert got2 == [0, 1, 2, 3, 4]
    assert calls == [3, 4], calls  # prefix replayed, tail re-fetched
