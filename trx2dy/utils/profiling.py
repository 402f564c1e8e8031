"""Profiling and structured progress instrumentation.

The reference has only commented-out `time()` probes and print statements
(SURVEY.md §5). Here: phase timers with device synchronization (so the
numbers mean on-device wall time, not async dispatch), and a thin wrapper
over jax.profiler for XLA traces viewable in TensorBoard/Perfetto.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict

import jax


class PhaseTimer:
    """Accumulates wall time per named phase; blocks on device work."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, sync=None):
        """Time a block; `sync` is an optional array (or pytree) to
        block_until_ready on before stopping the clock."""
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.tree.map(
                    lambda a: a.block_until_ready()
                    if hasattr(a, "block_until_ready") else a, sync)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=lambda n: -self.totals[n]):
            lines.append(f"{name:<30s} {self.totals[name]:8.2f}s "
                         f"x{self.counts[name]}")
        return "\n".join(lines)


@contextlib.contextmanager
def xla_trace(log_dir: str = "/tmp/trx2dy_trace",
              host_profile: bool = False):
    """Capture an XLA profiler trace around a block (view with
    TensorBoard's profile plugin or Perfetto)."""
    jax.profiler.start_trace(log_dir, create_perfetto_link=False,
                             create_perfetto_trace=host_profile)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def block_all(tree):
    """block_until_ready on every array of a pytree; returns the pytree."""
    jax.tree.map(lambda a: a.block_until_ready()
                 if hasattr(a, "block_until_ready") else a, tree)
    return tree
