"""Background device prefetcher: overlaps host batch assembly (+ the jit
preprocessing dispatch) with device compute via a bounded queue fed by a
worker thread — the TPU-native replacement for torch DataLoader worker
processes (batch assembly releases the GIL inside the native gather and
numpy copies, so a thread suffices and shares memory for free)."""
import queue
import threading
from typing import Callable, Iterator, Optional


class DevicePrefetcher:
    _SENTINEL = object()

    def __init__(self, batches: Iterator, put_fn: Optional[Callable] = None,
                 depth: int = 4):
        """:param batches: source batch iterator.
        :param put_fn: optional host->device transfer (e.g. mesh shard_batch);
            runs on the worker thread so transfers overlap compute.
        :param depth: number of in-flight batches."""
        self._queue: "queue.Queue" = queue.Queue(maxsize=depth)
        self._error: Optional[BaseException] = None

        def worker():
            try:
                for batch in batches:
                    self._queue.put(put_fn(batch) if put_fn else batch)
            except BaseException as e:  # propagate into the consumer
                self._error = e
            finally:
                self._queue.put(self._SENTINEL)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._queue.get()
        if item is self._SENTINEL:
            if self._error is not None:
                raise self._error
            raise StopIteration
        return item
