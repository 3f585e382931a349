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


def slope_rate(run, n_short, n_long, n_reps=None, n_warm=2, detail=None):
    """Device rate (units/sec) via the two-point slope.

    run(size, i) must execute the size-`size` program with rep-distinct
    inputs (the tunnelled platform caches repeated identical executions)
    and block until the result is ready; i counts calls per size starting
    at 0, with the first `n_warm` calls covering compile + warm-up.

    Returns (rate, times) where times maps size -> median seconds of the
    timed reps.  The slope itself is the median over all n_reps^2 pairwise
    time differences (Hodges-Lehmann-style), not the difference of medians:
    the work delta between the two program sizes is tens of ms on a link
    whose per-dispatch jitter is multiple ms, and the pairwise median both
    resists outlier reps and yields a dispersion estimate.  Pass a dict as
    `detail` to receive it: "slope_spread_pct" (IQR of the pairwise slopes
    as % of the median — treat the rate as unreliable when this is large,
    say >15%) and "times_s" (the raw per-rep seconds per size).

    When the slope comes out below the timer's noise floor (the work delta
    drowned in link jitter — seen with KB-sized programs; includes
    epsilon-positive dt, which would yield an absurd rate), falls back to
    the long program's wall rate, which under- rather than over-states the
    device rate.

    Protocol knobs (env): ``AADFF_SLOPE_REPS`` overrides n_reps when the
    caller leaves it None (5 reps gives ~15-20% IQR spreads against this
    link's multi-ms jitter; 12+ tightens it ~sqrt-fold), and
    ``AADFF_SLOPE_INTERLEAVE`` (default ON since round 5 — set ``0`` to get
    the old blocked order) alternates short/long timed reps after a joint
    warm-up so slow RTT drift over the session hits both sizes equally
    instead of biasing the slope.  BENCH_r04 was published from the blocked
    order's failure mode; the robust protocol must be the default, not
    opt-in (VERDICT r4 weak #1).
    """
    import os

    if n_reps is None:
        n_reps = int(os.environ.get("AADFF_SLOPE_REPS", 5))
    interleave = os.environ.get("AADFF_SLOPE_INTERLEAVE", "1") == "1"
    times, raw = {}, {}
    if interleave:
        counters = {}
        for size in (n_short, n_long):
            counters[size] = 0
            raw[size] = []
            for _ in range(n_warm):
                run(size, counters[size])
                counters[size] += 1
        for _ in range(n_reps):
            for size in (n_short, n_long):
                t0 = time.perf_counter()
                run(size, counters[size])
                raw[size].append(time.perf_counter() - t0)
                counters[size] += 1
        for size in (n_short, n_long):
            times[size] = float(np.median(raw[size]))
        if detail is not None:
            detail["protocol"] = "interleaved"
    else:
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
            raw[size] = ts
            times[size] = float(np.median(ts))
        if detail is not None:
            detail["protocol"] = "blocked"
    diffs = np.asarray([tl - ts for tl in raw[n_long] for ts in raw[n_short]])
    dt = float(np.median(diffs))
    if detail is not None:
        detail["times_s"] = {k: [round(t, 6) for t in v]
                             for k, v in raw.items()}
        q1, q3 = np.percentile(diffs, [25, 75])
        detail["slope_spread_pct"] = (
            round(100.0 * float(q3 - q1) / dt, 1) if dt > 1e-4 else None)
        detail["fallback"] = dt <= 1e-4
    if dt <= 1e-4:  # 0.1 ms — below anything measurable over this link
        return n_long / times[n_long], times
    return (n_long - n_short) / dt, times
