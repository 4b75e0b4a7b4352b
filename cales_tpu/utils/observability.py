"""Observability helpers: device memory footprint, step timers, profiler.

Reference parity:
  * device_memory_footprint (utils.f90:12-14 / main.f90:85, absent body in
    the reference snapshot — SURVEY §5.1 notes the latent defect): here it
    reports live device buffer usage from the JAX runtime.
  * NVTX ranges (nvtx.f90) -> jax.named_scope annotations in the substep and
    jax.profiler traces here.
  * per-step avg/min/max wall time (main.f90:613-618) -> StepTimer.
"""
from __future__ import annotations

import contextlib
import time

import jax


def device_memory_footprint() -> dict:
    """Bytes in use / limit per device (when the backend exposes stats)."""
    out = {}
    for d in jax.devices():
        try:
            s = d.memory_stats()
            out[str(d)] = {'bytes_in_use': s.get('bytes_in_use'),
                           'bytes_limit': s.get('bytes_limit')}
        except Exception:
            out[str(d)] = None
    return out


class StepTimer:
    """Accumulates per-step wall times; reports avg/min/max
    (main.f90:613-618)."""

    def __init__(self):
        self.times = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self):
        self.times.append(time.perf_counter() - self._t0)

    def report(self):
        if not self.times:
            return 'no steps timed'
        t = self.times
        return (f'avg {sum(t) / len(t):.4f}s  min {min(t):.4f}s  '
                f'max {max(t):.4f}s over {len(t)} steps')


@contextlib.contextmanager
def profile_trace(logdir: str):
    """Capture a profiler trace of the enclosed block (view with
    tensorboard/xprof); the named_scope annotations in the RK substep appear
    as ranges — the NVTX analogue."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
