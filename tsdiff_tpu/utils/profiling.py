"""Tracing / profiling utilities.

The reference has none (SURVEY.md section 5.1 — only tqdm bars and log
timestamps).  Here: phase timers that force device sync (fetching a scalar —
``block_until_ready`` alone does not synchronize on tunneled backends), and a
jax.profiler trace context for TensorBoard-compatible device traces.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class PhaseTimer:
    """Accumulating wall-clock timers keyed by phase name."""

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, sync_value=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync_value is not None:
                _force_sync(sync_value)
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            n = self.counts[name]
            tot = self.totals[name]
            lines.append(f"{name:>24}: {tot:8.3f}s total, {tot / n * 1000:8.2f}ms avg ({n}x)")
        return "\n".join(lines)


def _force_sync(value) -> None:
    """True host synchronization: fetch one scalar."""
    import jax
    import jax.numpy as jnp

    leaves = jax.tree_util.tree_leaves(value)
    if leaves:
        jnp.asarray(leaves[0]).ravel()[0].item()


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace context (view in TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed_blocked(fn, *args, **kwargs) -> tuple[float, object]:
    """Run fn, force sync on its output, return (seconds, output)."""
    t0 = time.perf_counter()
    out = fn(*args, **kwargs)
    _force_sync(out)
    return time.perf_counter() - t0, out
