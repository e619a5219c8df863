"""Tracing / profiling helpers (SURVEY §5.1 — absent in the reference;
JAX-native here).

- ``trace``: context manager capturing a jax.profiler trace (TensorBoard
  format) around a region, e.g. the production scan.
- ``Throughput``: wall-clock throughput meter reporting steps/s and
  particle-steps/s (the BASELINE metric).
- ``time_fn``: robust timing of a jitted function on flaky async backends —
  synchronizes by fetching a data-dependent scalar rather than trusting
  block_until_ready.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp

__all__ = ["trace", "Throughput", "time_fn"]


@contextlib.contextmanager
def trace(log_dir: str, host_profiling: bool = False):
    """Capture a profiler trace of the enclosed region into ``log_dir``
    (viewable in TensorBoard / Perfetto)."""
    jax.profiler.start_trace(log_dir, create_perfetto_trace=False)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclasses.dataclass
class Throughput:
    """Step-throughput meter: accumulate (steps, particles) batches and
    report rates."""

    n_particles: int
    steps: int = 0
    elapsed: float = 0.0
    _t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, steps_done: int) -> None:
        if self._t0 is None:
            raise RuntimeError("Throughput.stop() without start()")
        self.elapsed += time.perf_counter() - self._t0
        self.steps += steps_done
        self._t0 = None

    @property
    def steps_per_sec(self) -> float:
        return self.steps / self.elapsed if self.elapsed else 0.0

    @property
    def particle_steps_per_sec(self) -> float:
        return self.steps_per_sec * self.n_particles

    def report(self) -> dict:
        return {
            "steps": self.steps,
            "elapsed_s": self.elapsed,
            "steps_per_sec": self.steps_per_sec,
            "particle_steps_per_sec": self.particle_steps_per_sec,
        }


def time_fn(fn: Callable, *args, iters: int = 3, sync: Optional[Callable] = None) -> float:
    """Best-of-``iters`` wall time of ``fn(*args)``. ``sync(out)`` must touch
    output data (default: fetch the first leaf's first element), forcing real
    completion even where block_until_ready is unreliable."""

    def default_sync(out):
        leaf = jax.tree.leaves(out)[0]
        return float(jnp.ravel(leaf)[0])

    sync = sync or default_sync
    out = fn(*args)
    sync(out)  # compile + warm
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        best = min(best, time.perf_counter() - t0)
    return best
