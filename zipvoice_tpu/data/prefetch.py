"""Background-thread batch prefetching.

The reference hides IO latency behind lhotse DataLoader workers
(ref datamodule.py:148-151, num_workers=8); here a single producer thread
keeps a small queue of collated batches ahead of the train step — the heavy
lifting (wav decode/resample) already releases the GIL inside the native IO
runtime, so one thread saturates the pipeline.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator


class PrefetchIterator:
    """Wrap an iterator, materializing up to `depth` items ahead."""

    _SENTINEL = object()

    def __init__(self, it: Iterator, depth: int = 2):
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._err = None

        def producer():
            try:
                for item in it:
                    self._q.put(item)
            except BaseException as ex:  # noqa: BLE001 — re-raised in consumer
                self._err = ex
            finally:
                self._q.put(self._SENTINEL)

        self._thread = threading.Thread(target=producer, daemon=True)
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._SENTINEL:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item


def prefetch_batches(sampler, collate: Callable, depth: int = 2):
    """Iterate collated batches with background prefetch."""
    return PrefetchIterator((collate(b) for b in sampler), depth=depth)


class PrefetchBatches:
    """Background-collated batches with resume-safe sampler state.

    The producer thread advances the sampler ahead of consumption, so the
    sampler's own ``state_dict()`` would over-count consumed batches by up to
    ``depth``.  This wrapper snapshots the sampler state alongside each
    produced batch and reports the state as of the *last consumed* batch —
    checkpoints made mid-epoch resume exactly where training stopped.
    """

    def __init__(self, sampler, collate: Callable, depth: int = 2):
        self._state = sampler.state_dict()

        def gen():
            for utts in sampler:
                yield collate(utts), sampler.state_dict()

        self._it = PrefetchIterator(gen(), depth=depth)

    def __iter__(self):
        return self

    def __next__(self):
        batch, state = next(self._it)
        self._state = state
        return batch

    def state_dict(self):
        """Sampler state as of the last batch returned by ``__next__``."""
        return self._state
