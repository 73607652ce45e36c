"""Threaded prefetching sample loader.

Replaces the reference's torch DataLoader worker processes (dataset.py:377:
batch_size=1, num_workers=6, prefetch_factor=6) with a thread pool that
decodes/resizes samples on the host while the device computes — JAX releases
the GIL during compiled execution so threads overlap cleanly, and samples
are plain numpy dicts (no tensor pickling across processes).
"""

from __future__ import annotations

import concurrent.futures as cf
from typing import Iterable, Iterator, List

import numpy as np


def iter_samples(dataset, num_workers: int = 6, prefetch: int = 6,
                 max_samples: int | None = None) -> Iterator[dict]:
    """Yield decoded samples in order with a bounded prefetch window."""
    n = len(dataset)
    if max_samples is not None:
        n = min(n, max_samples)
    if num_workers <= 0:
        for i in range(n):
            yield dataset.load(i)
        return
    with cf.ThreadPoolExecutor(max_workers=num_workers) as pool:
        window: List[cf.Future] = []
        nxt = 0
        while nxt < n and len(window) < prefetch:
            window.append(pool.submit(dataset.load, nxt))
            nxt += 1
        while window:
            fut = window.pop(0)
            if nxt < n:
                window.append(pool.submit(dataset.load, nxt))
                nxt += 1
            yield fut.result()


def stack_batches(samples: Iterable[dict], batch_size: int) -> Iterator[dict]:
    """Group per-sample dicts into stacked numpy batches (pads the tail)."""
    buf: List[dict] = []
    for s in samples:
        buf.append(s)
        if len(buf) == batch_size:
            yield _stack(buf, batch_size)
            buf = []
    if buf:
        yield _stack(buf, batch_size)


def _stack(buf: List[dict], batch_size: int) -> dict:
    out = {"_n": len(buf)}
    for k in buf[0]:
        v0 = buf[0][k]
        if isinstance(v0, np.ndarray):
            arrs = [b[k] for b in buf]
            while len(arrs) < batch_size:  # pad tail with copies of the last
                arrs.append(arrs[-1])
            out[k] = np.stack(arrs)
        else:
            out[k] = [b[k] for b in buf]
    return out
