"""DeviceFeeder / DeferredLogger unit tests (datasets/prefetch.py)."""

import time

import numpy as np
import pytest

from fish_diffusion_tpu.datasets.prefetch import DeferredLogger, DeviceFeeder


class TestDeviceFeeder:
    def test_order_and_completeness(self):
        batches = [{"x": np.full((2,), i)} for i in range(20)]
        out = list(DeviceFeeder(iter(batches), depth=2))
        assert len(out) == 20
        for i, b in enumerate(out):
            assert b["x"][0] == i

    def test_put_fn_applied_on_feeder_thread(self):
        import threading

        main = threading.get_ident()
        seen = []

        def put(b):
            seen.append(threading.get_ident())
            return {k: v * 2 for k, v in b.items()}

        out = list(DeviceFeeder(({"x": np.ones(1)} for _ in range(3)), put))
        assert all(t != main for t in seen)
        assert all(b["x"][0] == 2 for b in out)

    def test_error_propagates(self):
        def gen():
            yield {"x": 1}
            raise RuntimeError("collate exploded")

        feeder = DeviceFeeder(gen())
        it = iter(feeder)
        assert next(it)["x"] == 1
        with pytest.raises(RuntimeError, match="collate exploded"):
            next(it)

    def test_close_unblocks_producer(self):
        # infinite producer; consumer takes 1 then closes — must not hang
        def gen():
            i = 0
            while True:
                yield {"x": i}
                i += 1

        feeder = DeviceFeeder(gen(), depth=1)
        it = iter(feeder)
        next(it)
        feeder.close()
        t0 = time.time()
        feeder._thread.join(timeout=3)
        assert not feeder._thread.is_alive()
        assert time.time() - t0 < 3

    def test_backpressure_bounded(self):
        produced = []

        def gen():
            for i in range(100):
                produced.append(i)
                yield i

        feeder = DeviceFeeder(gen(), depth=2)
        it = iter(feeder)
        next(it)
        time.sleep(0.2)
        # producer must not run far ahead of the consumer
        assert len(produced) <= 6
        feeder.close()

    def test_stats_track_batches(self):
        feeder = DeviceFeeder(({"x": i} for i in range(5)))
        list(feeder)
        assert feeder.stats["batches"] == 5

    def test_next_after_close_raises_promptly(self):
        # close() lets the producer exit WITHOUT enqueuing the sentinel;
        # a subsequent next() must raise StopIteration, not hang forever
        def gen():
            while True:
                yield {"x": 0}

        feeder = DeviceFeeder(gen(), depth=1)
        it = iter(feeder)
        next(it)
        feeder.close()
        t0 = time.time()
        with pytest.raises(StopIteration):
            for _ in range(10):  # drain whatever was already queued
                next(it)
        assert time.time() - t0 < 5


class TestDeferredLogger:
    def test_one_interval_late(self):
        emitted = []
        dlog = DeferredLogger(lambda s, sc: emitted.append((s, sc)))
        dlog.push(10, {"loss": 1.0})
        assert emitted == []  # not yet materialized
        dlog.push(20, {"loss": 2.0})
        assert emitted == [(10, {"loss": 1.0})]
        dlog.flush()
        assert emitted[-1] == (20, {"loss": 2.0})
        dlog.flush()  # idempotent
        assert len(emitted) == 2

    def test_extra_fields_merged(self):
        emitted = {}
        dlog = DeferredLogger(lambda s, sc: emitted.update(sc))
        dlog.push(1, {"a": np.float32(1.5)}, extra={"lr": 0.1})
        dlog.flush()
        assert emitted == {"a": 1.5, "lr": 0.1}


class TestCachedDeviceFeeder:
    """CachedDeviceFeeder: epoch-1 pass-through + zero-transfer replay."""

    def _run(self, n_batches=5, epochs=3, seed=0):
        from fish_diffusion_tpu.datasets.prefetch import CachedDeviceFeeder

        puts = []

        def put(b):
            puts.append(b["x"][0])
            return {k: v.copy() for k, v in b.items()}

        batches = [{"x": np.full((2,), i, np.float32)} for i in range(n_batches)]
        feeder = CachedDeviceFeeder(iter(batches), put, epochs=epochs, seed=seed)
        out = [b["x"][0] for b in feeder]
        return puts, out, feeder

    def test_put_called_only_first_epoch(self):
        puts, out, feeder = self._run(n_batches=5, epochs=4)
        assert len(puts) == 5  # one H2D dispatch per batch, ever
        assert len(out) == 5 * 4
        assert feeder.stats["replayed_batches"] == 5 * 3
        assert feeder.stats["cache_batches"] == 5
        assert feeder.stats["cache_bytes"] == 5 * 2 * 4

    def test_first_epoch_order_then_permuted_replay(self):
        puts, out, _ = self._run(n_batches=6, epochs=3, seed=7)
        assert out[:6] == list(range(6))  # epoch 1 in stream order
        for e in range(1, 3):  # each replay epoch covers every batch once
            assert sorted(out[6 * e : 6 * (e + 1)]) == list(range(6))
        assert out[6:12] != list(range(6)) or out[12:18] != list(range(6))

    def test_epoch_callback_and_endless(self):
        from itertools import islice

        from fish_diffusion_tpu.datasets.prefetch import CachedDeviceFeeder

        epochs_seen = []
        feeder = CachedDeviceFeeder(
            iter([{"x": np.zeros(1)} for _ in range(2)]),
            epochs=None,
            on_epoch=epochs_seen.append,
        )
        out = list(islice(iter(feeder), 9))  # endless: take 4.5 epochs
        assert len(out) == 9
        assert epochs_seen[:5] == [1, 2, 3, 4, 5]
        feeder.close()

    def test_empty_stream(self):
        from fish_diffusion_tpu.datasets.prefetch import CachedDeviceFeeder

        assert list(CachedDeviceFeeder(iter([]), epochs=3)) == []

    def test_single_use(self):
        # the cache belongs to the first iterator; a second fit() over the
        # same feeder would silently yield nothing — must raise instead
        from fish_diffusion_tpu.datasets.prefetch import CachedDeviceFeeder

        feeder = CachedDeviceFeeder(
            iter([{"x": np.zeros(1)}]), epochs=2
        )
        assert len(list(feeder)) == 2
        with pytest.raises(RuntimeError, match="single-use"):
            iter(feeder)


class TestPartialCache:
    """cache_bytes_budget: beyond-HBM corpora degrade gracefully
    (VERDICT r3 next #4) — K batches resident, the rest streamed."""

    @staticmethod
    def _batch(i):
        return {"x": np.full((2,), i, np.float32)}  # 8 bytes each

    def _run(self, n_batches, budget, epochs, expect_stream_epochs=True):
        from fish_diffusion_tpu.datasets.prefetch import CachedDeviceFeeder

        puts = []

        def put(b):
            puts.append(b["x"][0])
            return {k: v.copy() for k, v in b.items()}

        more_calls = []

        def more():
            more_calls.append(1)
            return (self._batch(100 + i) for i in range(n_batches))

        feeder = CachedDeviceFeeder(
            iter([self._batch(i) for i in range(n_batches)]),
            put,
            epochs=epochs,
            seed=3,
            cache_bytes_budget=budget,
            more_batches_fn=more,
        )
        out = [b["x"][0] for b in feeder]
        return puts, out, more_calls, feeder

    def test_budget_splits_cache_and_stream(self):
        # 6 batches x 8 bytes, budget 24 -> 3 cached, 3 streamed per epoch
        puts, out, more_calls, feeder = self._run(6, budget=24, epochs=3)
        assert feeder.stats["cache_batches"] == 3
        assert feeder.stats["cache_bytes"] == 24
        assert feeder.stats["cached_fraction"] == 0.5
        # epoch 1 dispatches all 6; epochs 2-3 dispatch 3 streamed each
        assert len(puts) == 6 + 2 * 3
        assert len(out) == 6 * 3
        assert feeder.stats["replayed_batches"] == 2 * 3
        assert feeder.stats["streamed_batches"] == 2 * 3
        assert len(more_calls) == 2  # one fresh epoch per replay epoch
        # every mixed epoch contains exactly the 3 cached ids (< 3) and
        # 3 fresh streamed ids (>= 100)
        for e in (1, 2):
            ep = out[6 * e : 6 * (e + 1)]
            assert sorted(x for x in ep if x < 100) == [0, 1, 2]
            assert sum(x >= 100 for x in ep) == 3

    def test_unlimited_budget_matches_full_cache(self):
        puts, out, more_calls, feeder = self._run(4, budget=None, epochs=3)
        assert feeder.stats["cache_batches"] == 4
        assert len(puts) == 4
        assert more_calls == []

    def test_budget_without_more_fn_raises(self):
        from fish_diffusion_tpu.datasets.prefetch import CachedDeviceFeeder

        feeder = CachedDeviceFeeder(
            iter([self._batch(i) for i in range(4)]),
            epochs=2,
            cache_bytes_budget=8,
        )
        with pytest.raises(RuntimeError, match="more_batches_fn"):
            list(feeder)

    def test_short_stream_epoch_tolerated(self):
        # a later epoch's loader yielding fewer batches must not hang
        from fish_diffusion_tpu.datasets.prefetch import CachedDeviceFeeder

        feeder = CachedDeviceFeeder(
            iter([self._batch(i) for i in range(4)]),
            epochs=2,
            cache_bytes_budget=16,
            more_batches_fn=lambda: iter([self._batch(100)]),  # 1 < 2 needed
        )
        out = [b["x"][0] for b in feeder]
        assert len(out) == 4 + 3  # epoch2: 2 cached + 1 streamed
