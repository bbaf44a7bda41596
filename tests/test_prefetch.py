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
