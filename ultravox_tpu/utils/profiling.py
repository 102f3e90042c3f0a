"""Profiling & timing utilities.

The reference has no in-repo tracing (SURVEY.md §5 flags this as a gap);
here: jax.profiler trace capture, an execution fence that works on
remote-attached backends, and a step timer.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a TensorBoard-viewable profiler trace around a block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def fence(*arrays) -> None:
    """Force execution of pending work. ``block_until_ready`` alone is not a
    reliable fence on remote-attached backends (observed on the axon TPU
    tunnel: it returns before the computation runs); a scalar host fetch is.
    """
    for arr in arrays:
        if hasattr(arr, "block_until_ready"):
            arr.block_until_ready()
    if arrays:
        leaf = jax.tree_util.tree_leaves(arrays[-1])
        if leaf:
            float(jnp.sum(leaf[-1].astype(jnp.float32)).ravel()[0])


class StepTimer:
    """Rolling step timing + throughput accounting for train loops."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times: list = []
        self._last: Optional[float] = None

    def tick(self) -> Optional[float]:
        now = time.perf_counter()
        dt = None
        if self._last is not None:
            dt = now - self._last
            self._times.append(dt)
            if len(self._times) > self.window:
                self._times.pop(0)
        self._last = now
        return dt

    @property
    def mean_step_s(self) -> Optional[float]:
        if not self._times:
            return None
        return sum(self._times) / len(self._times)

    def throughput(self, items_per_step: int) -> Optional[float]:
        mean = self.mean_step_s
        return items_per_step / mean if mean else None
