"""Profiling hooks.

The reference's tracing is Timer averages + images/sec prints
(SURVEY §5.1); the TPU equivalent adds ``jax.profiler`` traces viewable
in TensorBoard/Perfetto plus on-demand device memory profiles.
"""

from __future__ import annotations

import contextlib
import os


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax profiler trace for the enclosed block."""
    import jax
    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def save_device_memory_profile(path: str) -> None:
    import jax
    jax.profiler.save_device_memory_profile(path)


class StepTracer:
    """Trace steps [start, stop) of a training loop into ``logdir``."""

    def __init__(self, logdir: str, start: int, stop: int):
        self.logdir = logdir
        self.start = start
        self.stop = stop
        self._active = False

    def on_step(self, step: int) -> None:
        import jax
        if step == self.start and not self._active:
            os.makedirs(self.logdir, exist_ok=True)
            jax.profiler.start_trace(self.logdir)
            self._active = True
        elif step == self.stop and self._active:
            jax.profiler.stop_trace()
            self._active = False

    def close(self) -> None:
        if self._active:
            import jax
            jax.profiler.stop_trace()
            self._active = False
