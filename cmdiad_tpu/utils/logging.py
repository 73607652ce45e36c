"""Console logging + simple phase timers (replaces the reference's tqdm +
MetricLogger console output, utils/misc.py:14-157)."""

from __future__ import annotations

import contextlib
import logging
import time


def get_logger(name: str) -> logging.Logger:
    logger = logging.getLogger(name)
    if not logging.getLogger("cmdiad_tpu").handlers:
        root = logging.getLogger("cmdiad_tpu")
        handler = logging.StreamHandler()
        handler.setFormatter(logging.Formatter(
            "%(asctime)s %(name)s %(levelname)s %(message)s", "%H:%M:%S"))
        root.addHandler(handler)
        root.setLevel(logging.INFO)
    return logger


@contextlib.contextmanager
def timer(label: str, sink: dict | None = None):
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    if sink is not None:
        sink[label] = dt
    get_logger("cmdiad_tpu.timer").info("%s: %.3fs", label, dt)
