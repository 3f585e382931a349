"""Shared benchmark measurement protocol for the tunnelled TPU link.

Every throughput number this repo publishes is measured the same way:
device time per unit of work comes from the SLOPE between a long and a
short program,

    sec/unit = (T(n_long) - T(n_short)) / (n_long - n_short)

which cancels every fixed per-dispatch cost (link round trip, host
overhead, input upload) exactly instead of estimating-and-subtracting it.
The link RTT itself (observed 1-40 ms, swinging by session) is recorded
alongside for context.  This module is the single implementation used by
bench.py, scripts/benchmark_suite.py and scripts/bench_fused_kernel.py —
the protocol previously lived as three hand-rolled copies, and a fix for
the noise-inverted-slope failure mode only reached one of them.
"""
import time

import numpy as np


def measure_rtt(n_reps=15):
    """Median round-trip of a trivial dispatch, in milliseconds."""
    import jax
    import jax.numpy as jnp

    x = jnp.zeros((8, 128))
    f = jax.jit(lambda a: a + 1.0)
    f(x).block_until_ready()
    ts = []
    for _ in range(n_reps):
        t0 = time.perf_counter()
        f(x).block_until_ready()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def slope_rate(run, n_short, n_long, n_reps=5, n_warm=2):
    """Device rate (units/sec) via the two-point slope.

    run(size, i) must execute the size-`size` program with rep-distinct
    inputs (the tunnelled platform caches repeated identical executions)
    and block until the result is ready; i counts calls per size starting
    at 0, with the first `n_warm` calls covering compile + warm-up.

    Returns (rate, times) where times maps size -> median seconds of the
    timed reps.  When the slope comes out below the timer's noise floor
    (the work delta drowned in link jitter — seen with KB-sized programs;
    includes epsilon-positive dt, which would yield an absurd rate), falls
    back to the long program's wall rate, which under- rather than
    over-states the device rate.
    """
    times = {}
    for size in (n_short, n_long):
        i = 0
        for _ in range(n_warm):
            run(size, i)
            i += 1
        ts = []
        for _ in range(n_reps):
            t0 = time.perf_counter()
            run(size, i)
            ts.append(time.perf_counter() - t0)
            i += 1
        times[size] = float(np.median(ts))
    dt = times[n_long] - times[n_short]
    if dt <= 1e-4:  # 0.1 ms — below anything measurable over this link
        return n_long / times[n_long], times
    return (n_long - n_short) / dt, times
