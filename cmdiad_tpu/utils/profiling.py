"""Tracing / profiling helpers.

The reference has no profiling beyond tqdm rates and CUDA max-mem lines
(SURVEY.md §5).  Here: a jax.profiler trace context (open the output in
XProf/TensorBoard), a phase-timer registry, and a device-time measurement
utility that is robust to the remote-tunnel backend's unreliable
``block_until_ready`` (completion proven by host readback of a scalar
dependency — see bench.py).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import numpy as np


@contextlib.contextmanager
def device_trace(out_dir: str):
    """jax.profiler trace context; view with xprof/tensorboard."""
    import jax
    jax.profiler.start_trace(out_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def measure_device_time(fn: Callable, *args, chain: int = 8) -> float:
    """Seconds/call of a jitted scalar-returning fn, RPC-latency-amortised.

    Runs ``chain`` data-dependency-chained iterations inside one jit and
    divides; completion is proven by a host readback.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def chained(first, *rest):
        def body(_, carry):
            # thread the carry into the first input so XLA cannot hoist the
            # loop body as loop-invariant
            out = fn(jax.tree.map(lambda a: a + carry * 0.0, first), *rest)
            return jnp.sum(out).astype(jnp.float32)
        return lax.fori_loop(0, chain, body, jnp.float32(0.0))

    float(chained(*args))           # compile + warm
    t0 = time.perf_counter()
    float(chained(*args))
    return (time.perf_counter() - t0) / chain


class PhaseTimers:
    """Named accumulating wall-clock timers (MetricLogger replacement)."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, dict]:
        return {k: {"total_s": round(v, 4), "count": self.counts[k],
                    "mean_s": round(v / self.counts[k], 4)}
                for k, v in self.totals.items()}
