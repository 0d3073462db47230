"""Background-thread batch prefetching.

Completes the async input pipeline: the training loop never blocks on host
packing — a worker thread packs (C++ packer) and device_puts the next
batches while the device executes the current step (the step itself is
dispatched asynchronously and metrics accumulate on device).
"""

from __future__ import annotations

import queue
import threading


class Prefetcher:
    """Wrap a batch iterable; keep up to ``depth`` prepared batches ahead.

    ``transfer`` optionally maps each batch (e.g. ``lambda b:
    shard_batch(b, mesh)``) inside the worker thread, so host->device
    transfer also overlaps compute.
    """

    _END = object()

    def __init__(self, iterable, depth: int = 2, transfer=None):
        self._iterable = iterable
        self._depth = depth
        self._transfer = transfer

    def __iter__(self):
        q: queue.Queue = queue.Queue(maxsize=self._depth)
        err: list[BaseException] = []

        def worker():
            try:
                for item in self._iterable:
                    if self._transfer is not None:
                        item = self._transfer(item)
                    q.put(item)
            except BaseException as e:  # surface worker errors in the consumer
                err.append(e)
            finally:
                q.put(self._END)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is self._END:
                if err:
                    raise err[0]
                return
            yield item
