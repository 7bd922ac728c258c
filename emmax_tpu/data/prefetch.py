"""Async host→device batch prefetching.

The tf.data-style input pipelining for the training loop: a background
thread collates and ``device_put``s batch ``n+1`` (sharded over the mesh)
while the device executes step ``n``, hiding host time behind compute
(the reference leans on torch DataLoader workers + tf.data prefetch).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator

from emmax_tpu.parallel.sharding import shard_batch

_SENTINEL = object()


def prefetch_to_device(batch_iter: Iterator, mesh=None, depth: int = 2
                       ) -> Iterator:
    """Wrap a host batch iterator; yields device-resident (sharded) batches.

    ``depth`` bounds how many batches are in flight (host memory bound).
    Exceptions in the producer re-raise in the consumer.
    """
    q: "queue.Queue" = queue.Queue(maxsize=depth)

    def producer():
        try:
            for batch in batch_iter:
                if mesh is not None:
                    batch = shard_batch(batch, mesh)
                q.put(batch)
        except BaseException as e:  # propagate to consumer
            q.put(e)
            return
        q.put(_SENTINEL)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            return
        if isinstance(item, BaseException):
            raise item
        yield item


class PrefetchingLoader:
    """BatchLoader-compatible wrapper adding device prefetch per epoch."""

    def __init__(self, loader, mesh=None, depth: int = 2) -> None:
        self.loader = loader
        self.mesh = mesh
        self.depth = depth

    def epoch(self, epoch: int = 0):
        return prefetch_to_device(self.loader.epoch(epoch), self.mesh,
                                  self.depth)

    def __len__(self) -> int:
        return len(self.loader)
