"""Host->device prefetch with a bounded queue.

Equivalent of the reference's loader thread (data_loader_parallel,
/root/reference/training/loader.py:8-23, wired at train_encoder.py:140-142),
extended for JAX: batches are placed on device (optionally with a
NamedSharding for the data-parallel mesh) from a background thread so the
next batch's H2D copy overlaps the current step's compute.
"""
from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import jax


class DevicePrefetcher:
    """Background thread that device-puts upcoming batches.

    depth=2 matches the reference's Queue(maxsize=2).
    """

    def __init__(self, batch_iter: Iterator, sharding=None, depth: int = 2,
                 device_put: bool = True):
        """device_put=False turns this into a pure threaded prefetcher for
        iterators that place their items on device themselves (e.g. the
        Trainer's staging stream, which device_puts once with the step's
        NamedSharding)."""
        self._iter = batch_iter
        self._sharding = sharding
        self._device_put = device_put
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._done = False
        self._exc: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _put_device(self, batch):
        if not self._device_put:
            return batch
        if self._sharding is None:
            return jax.device_put(batch)
        return jax.device_put(batch, self._sharding)

    def _worker(self):
        try:
            for batch in self._iter:
                if self._stop.is_set():
                    return
                dev_batch = self._put_device(batch)
                while not self._stop.is_set():
                    try:
                        self._q.put(dev_batch, timeout=0.5)
                        break
                    except queue.Full:
                        continue
        except BaseException as e:  # surfaced on next __next__
            self._exc = e
        finally:
            # Sentinel put must respect _stop too: a plain blocking put on a
            # full queue with no consumer left would pin this thread forever
            # (and an abandoned thread aborts interpreter shutdown).
            while not self._stop.is_set():
                try:
                    self._q.put(None, timeout=0.5)
                    break
                except queue.Full:
                    continue

    def __iter__(self):
        return self

    def __next__(self):
        # Once exhausted (or closed), stay exhausted: the single None
        # sentinel is consumed exactly once, so a later next() — or one
        # racing close()'s queue drain — would otherwise block forever on
        # a queue no producer will ever fill (r4 review).
        if self._done or self._stop.is_set():
            raise StopIteration
        item = self._q.get()
        if item is None:
            self._done = True
            if self._exc is not None:
                raise self._exc
            raise StopIteration
        return item

    def close(self, join_timeout: float = 5.0):
        """Stop the worker, drain the queue, and join the thread. Idempotent;
        every owner (Trainer.close, tests) must call this — the worker spins
        on the bounded queue otherwise."""
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        # wake a consumer already blocked in _q.get(): post-drain the queue
        # stays empty forever, so a sentinel is the only way it ever returns
        try:
            self._q.put_nowait(None)
        except queue.Full:
            pass
        self._thread.join(timeout=join_timeout)
        if self._thread.is_alive():
            import warnings
            warnings.warn(
                "DevicePrefetcher worker still alive after "
                f"{join_timeout}s join — wedged in batch assembly or "
                "device_put; it may abort interpreter shutdown",
                RuntimeWarning)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
