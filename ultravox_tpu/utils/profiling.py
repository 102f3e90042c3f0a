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


def bench_op(make_out, x0, *, n_inner: int = 20, iters: int = 5) -> float:
    """Per-op microbenchmark that survives a high-latency dispatch path.

    Per-dispatch latency through the remote TPU tunnel (~1.7 ms) swamps
    sub-millisecond ops, so ``make_out(x)`` runs inside a ``lax.scan`` of
    ``n_inner`` iterations in ONE compiled program. The scalar sum of each
    output feeds back into the next input (scaled to ~0) so XLA can neither
    hoist the body out of the loop nor elide it. Returns seconds per op.
    """

    @jax.jit
    def run(x):
        def body(c, _):
            x_i, acc = c
            out = make_out(x_i)
            s = jnp.sum(out.astype(jnp.float32))
            x_i = x_i + (s * 1e-30).astype(x_i.dtype)
            return (x_i, acc + s), None

        (_, acc), _ = jax.lax.scan(body, (x, 0.0), None, length=n_inner)
        return acc

    float(run(x0))  # compile
    t0 = time.perf_counter()
    acc = None
    for _ in range(iters):
        acc = run(x0)
    float(acc)
    return (time.perf_counter() - t0) / (iters * n_inner)


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
