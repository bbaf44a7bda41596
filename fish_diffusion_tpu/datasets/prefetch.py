"""Async device feed: overlap host collation + host->device transfer with
device compute.

The reference overlaps input work with compute through torch DataLoader
worker processes + pinned memory + CUDA's copy stream
(``/root/reference/fish_diffusion/datasets/utils.py:13-34``,
``datasets/naive.py:44-49``). The JAX/TPU equivalent is simpler: transfers
enqueued by ``jax.device_put`` are asynchronous, so a single background
thread that *dispatches* the put for batch N+1 while the device executes
step N is enough to hide the input pipeline — provided the training loop
never forces a per-step synchronization (``int(state.step)``,
``float(metric)``) between steps.

``DeviceFeeder`` is that thread + a bounded queue (``depth`` batches in
flight). It also records where time goes so sustained-throughput gaps can
be attributed: ``stats["host_wait_s"]`` is time the *consumer* spent
waiting on the feeder (input-bound), ``stats["put_s"]`` is time the
producer spent inside collation + device_put dispatch.
"""

from __future__ import annotations

import queue
import threading
import time
from typing import Callable, Iterable, Optional

_SENTINEL = object()


class DeviceFeeder:
    """Iterate ``put_fn(batch)`` results with a ``depth``-deep background
    pipeline.

    Args:
        batches: iterable of host batches (e.g. a DataLoader, a generator).
        put_fn: host batch -> device batch; typically
            ``lambda b: make_global_batch(b, mesh)``. Runs on the feeder
            thread — it must only *dispatch* async work (device_put is
            async; avoid blocking reads of device values here).
        depth: maximum batches in flight (queued + being produced). 2 is
            enough to double-buffer; more only adds device memory.
    """

    def __init__(
        self,
        batches: Iterable,
        put_fn: Optional[Callable] = None,
        depth: int = 2,
    ):
        self._batches = batches
        self._put_fn = put_fn or (lambda x: x)
        self._q: "queue.Queue" = queue.Queue(maxsize=max(depth, 1))
        self._stop = threading.Event()
        self._err: Optional[BaseException] = None
        self.stats = {"host_wait_s": 0.0, "put_s": 0.0, "batches": 0}
        self._thread = threading.Thread(target=self._produce, daemon=True)
        self._thread.start()

    def _produce(self):
        try:
            for host_batch in self._batches:
                if self._stop.is_set():
                    return
                t0 = time.perf_counter()
                dev_batch = self._put_fn(host_batch)
                self.stats["put_s"] += time.perf_counter() - t0
                # bounded put, but stay responsive to close()
                while not self._stop.is_set():
                    try:
                        self._q.put(dev_batch, timeout=0.5)
                        break
                    except queue.Full:
                        continue
        except BaseException as e:  # propagate to the consumer
            self._err = e
        finally:
            while not self._stop.is_set():
                try:
                    self._q.put(_SENTINEL, timeout=0.5)
                    break
                except queue.Full:
                    continue

    def __iter__(self):
        return self

    def __next__(self):
        t0 = time.perf_counter()
        while True:
            # after close() the producer exits without enqueuing the
            # sentinel and the queue is drained — an untimed get() would
            # hang forever, so poll the stop flag
            if self._stop.is_set():
                raise StopIteration
            try:
                item = self._q.get(timeout=0.5)
                break
            except queue.Empty:
                continue
        self.stats["host_wait_s"] += time.perf_counter() - t0
        if item is _SENTINEL:
            if self._err is not None:
                raise self._err
            raise StopIteration
        self.stats["batches"] += 1
        return item

    def close(self):
        self._stop.set()
        # drain so a blocked producer can exit
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class CachedDeviceFeeder:
    """Device-resident batch cache for small datasets.

    Epoch 1 streams through :class:`DeviceFeeder` normally (H2D overlapped
    with compute) while retaining every device batch handle; epochs 2+
    replay those handles in a freshly permuted order with ZERO
    host->device traffic. This is the TPU answer to training many epochs
    over a small SVC corpus through a slow host link: the whole collated
    dataset lives in HBM and the host only decides ordering.

    Requirements / trade-offs vs the reference DataLoader semantics
    (``/root/reference/fish_diffusion/datasets/naive.py:44-49``):

    - the training step must NOT donate the batch argument
      (``make_train_step`` donates only the state, so reuse is safe);
    - batch *composition* is frozen after epoch 1 — later epochs reshuffle
      batch order, not sample-to-batch assignment (with drop_last +
      shuffle this is the only deviation, and for the many-epoch regimes
      this cache targets it is statistically immaterial);
    - HBM cost = the collated dataset size (a one-hour 44.1 kHz SVC set's
      mel+contents is ~0.5 GB). Opt in via
      ``trainer.cache_batches_on_device``; ``stats["cache_bytes"]`` is
      logged after epoch 1 so the cost is visible.

    **Partial cache** (``cache_bytes_budget``): a corpus larger than free
    HBM must not fall off a cliff back to fully-streamed throughput. With
    a byte budget set, epoch 1 caches device batches only until the budget
    is reached; every later epoch replays the cached batches AND streams
    the remaining ``N - K`` batches from a fresh ``more_batches_fn()``
    epoch through an async :class:`DeviceFeeder`, interleaved in a random
    schedule so H2D transfers spread across the epoch and overlap compute.
    Steady-state H2D traffic scales with ``1 - cached_fraction`` — a
    smooth throughput curve between the fully-streamed and fully-cached
    endpoints instead of an all-or-nothing switch. (Since the loader
    reshuffles, the streamed portion of later epochs is a fresh sample
    draw rather than "the exact uncached remainder"; with shuffled
    many-epoch training this is the same class of deviation as the
    frozen-composition caveat above.)

    Args:
        first_epoch_batches: host-batch iterable for ONE epoch.
        put_fn: host batch -> device batch (e.g. ``make_global_batch``).
        epochs: total epochs to yield including the first; None = endless.
        seed: RNG seed for the per-epoch batch-order permutation.
        on_epoch: optional callback ``f(epoch_index)`` at each epoch start
            (epoch 1 fires immediately).
        cache_bytes_budget: max bytes of device batches to keep resident;
            None = unlimited (cache the whole epoch).
        more_batches_fn: zero-arg callable returning a fresh ONE-epoch
            host-batch iterable; required when the budget is exceeded so
            later epochs can stream the uncached remainder.
    """

    def __init__(
        self,
        first_epoch_batches: Iterable,
        put_fn: Optional[Callable] = None,
        epochs: Optional[int] = None,
        seed: int = 0,
        on_epoch: Optional[Callable] = None,
        cache_bytes_budget: Optional[int] = None,
        more_batches_fn: Optional[Callable[[], Iterable]] = None,
    ):
        self._put_fn = put_fn
        self._feeder = DeviceFeeder(first_epoch_batches, put_fn)
        self._epochs = epochs
        self._seed = seed
        self._on_epoch = on_epoch
        self._budget = cache_bytes_budget
        self._more_fn = more_batches_fn
        self._stream_feeder: Optional[DeviceFeeder] = None
        self._started = False
        # share the inner feeder's dict so consumers can read epoch-1
        # host_wait_s/put_s/batches alongside the replay counters
        self.stats = self._feeder.stats
        self.stats.update(
            {
                "replayed_batches": 0,
                "streamed_batches": 0,
                "cache_batches": 0,
                "cache_bytes": 0,
                "cached_fraction": 1.0,
            }
        )

    @staticmethod
    def _batch_bytes(b) -> int:
        return int(
            sum(arr.nbytes for arr in (b.values() if isinstance(b, dict) else [b]))
        )

    def _iter(self):
        import itertools

        import numpy as np

        cache = []
        n_total = 0
        used = 0
        budget = float("inf") if self._budget is None else self._budget
        if self._on_epoch is not None:
            self._on_epoch(1)
        for dev_batch in self._feeder:
            n_total += 1
            nbytes = self._batch_bytes(dev_batch)
            if used + nbytes <= budget:
                cache.append(dev_batch)
                used += nbytes
            yield dev_batch
        self.stats["cache_batches"] = len(cache)
        self.stats["cache_bytes"] = used
        self.stats["cached_fraction"] = len(cache) / max(n_total, 1)
        n_stream = n_total - len(cache)
        if not cache and n_stream == 0:
            return
        if n_stream > 0 and self._more_fn is None:
            raise RuntimeError(
                f"cache_bytes_budget={self._budget} holds only "
                f"{len(cache)}/{n_total} batches and no more_batches_fn "
                "was provided to stream the remainder"
            )
        rng = np.random.default_rng(self._seed)
        epoch = 1
        while self._epochs is None or epoch < self._epochs:
            epoch += 1
            if self._on_epoch is not None:
                self._on_epoch(epoch)
            if n_stream == 0:
                for i in rng.permutation(len(cache)):
                    self.stats["replayed_batches"] += 1
                    yield cache[i]
                continue
            # mixed epoch: slots < K replay the cache, the rest stream a
            # fresh epoch through an async feeder (H2D overlapped)
            self._stream_feeder = DeviceFeeder(
                itertools.islice(self._more_fn(), n_stream), self._put_fn
            )
            try:
                for s in rng.permutation(n_total):
                    if s < len(cache):
                        self.stats["replayed_batches"] += 1
                        yield cache[s]
                    else:
                        item = next(self._stream_feeder, _SENTINEL)
                        if item is _SENTINEL:
                            continue  # loader came up short this epoch
                        self.stats["streamed_batches"] += 1
                        yield item
            finally:
                self._stream_feeder.close()
                self._stream_feeder = None

    def __iter__(self):
        # single-use: the inner DeviceFeeder and the cache belong to the
        # first iterator; a second would silently yield nothing
        if self._started:
            raise RuntimeError(
                "CachedDeviceFeeder is single-use; construct a new one "
                "per fit()"
            )
        self._started = True
        return self._iter()

    def close(self):
        self._feeder.close()
        if self._stream_feeder is not None:
            self._stream_feeder.close()


class DeferredLogger:
    """One-interval-late metric materialization.

    Calling ``float()`` on a step's metrics blocks until that step's whole
    XLA program finishes — done eagerly it serializes host and device.
    ``push`` stashes the (step, metrics) pair; the *next* ``push`` (or
    ``flush``) materializes the previous one, by which time the device has
    long finished it, so the sync is free.

    ``emit(step, scalars)`` receives plain-float scalars.
    """

    def __init__(self, emit: Callable[[int, dict], None]):
        self._emit = emit
        self._pending = None

    def push(self, step: int, metrics: dict, extra: Optional[dict] = None):
        self.flush()
        self._pending = (step, metrics, extra or {})

    def flush(self):
        if self._pending is None:
            return
        step, metrics, extra = self._pending
        self._pending = None
        scalars = {k: float(v) for k, v in metrics.items()}
        scalars.update(extra)
        self._emit(step, scalars)
