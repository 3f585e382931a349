"""Profiling / observability helpers.

The reference has no profiling beyond ad-hoc `time.time()` around inference
(SURVEY.md §5).  Here: `jax.profiler` trace capture for TensorBoard/Perfetto,
and a lightweight step timer that logs rolling throughput.
"""
from __future__ import annotations

import contextlib
import logging
import time
from collections import deque


def enable_compilation_cache(path: str = "/root/repo/.jax_cache",
                             min_compile_secs: int = 5) -> None:
    """Persistent XLA compilation cache — compiles survive process restarts.

    Essential here: remote-tunnel compiles run 1-2 min each and long jobs must
    be chunked into fresh processes (see .claude/skills/verify/SKILL.md), so
    without a persistent cache every chunk would re-pay every compile.  The
    cache lives under the repo (gitignored), not /tmp, because /tmp does not
    survive the machine restarts this environment is prone to.
    """
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable in TensorBoard / Perfetto."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling steps/sec + last-step wall time (device-synchronised if a
    result array is passed to `stop`)."""

    def __init__(self, window: int = 50):
        self.times = deque(maxlen=window)
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, result=None):
        if result is not None:
            import jax

            jax.block_until_ready(result)
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        return dt

    @property
    def steps_per_sec(self):
        if not self.times:
            return 0.0
        return len(self.times) / sum(self.times)

    def log(self, step: int, prefix: str = ""):
        logging.info(
            f"{prefix}step {step}: {self.steps_per_sec:.2f} steps/s "
            f"(last {self.times[-1] * 1e3:.1f} ms)"
        )
