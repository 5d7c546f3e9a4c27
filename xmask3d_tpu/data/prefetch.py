"""Host-side batch prefetching (the reference's DataLoader worker pool +
pin-memory prefetch, run/train.py:210-244, re-expressed for a
single-process JAX host).

Two pieces:
- `parallel_map_iterator(fn, args_iter, workers)`: ordered map over an
  (infinite) argument iterator using a thread pool with a bounded
  in-flight window. Batch construction is numpy/file-IO heavy and releases
  the GIL, so threads overlap batch building with device compute.
- `prefetch_iterator(it, depth)`: single background producer filling a
  bounded queue (for iterators whose construction must stay sequential).
"""

from __future__ import annotations

import queue
import threading
from collections import deque
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterable, Iterator


def parallel_map_iterator(
    fn: Callable, args_iter: Iterator, workers: int = 2, depth: int = 0
) -> Iterator:
    """Yield fn(a) for a in args_iter, in order, building up to
    `depth` (default 2*workers) results concurrently."""
    depth = depth or 2 * workers
    ex = ThreadPoolExecutor(max_workers=workers)
    pending: deque = deque()

    def fill():
        while len(pending) < depth:
            try:
                a = next(args_iter)
            except StopIteration:
                return
            pending.append(ex.submit(fn, a))

    fill()
    while pending:
        fut = pending.popleft()
        out = fut.result()
        fill()
        yield out


_END = object()


def prefetch_iterator(it: Iterable, workers: int = 1, depth: int = 0) -> Iterator:
    """Background-thread prefetch with a bounded queue. `workers` only
    sizes the queue (production stays sequential to preserve iterator
    state); use parallel_map_iterator for truly parallel construction."""
    depth = depth or max(2, 2 * workers)
    q: "queue.Queue" = queue.Queue(maxsize=depth)

    def producer():
        try:
            for item in it:
                q.put(item)
        finally:
            q.put(_END)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            return
        yield item
