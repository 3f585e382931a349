"""Unit tests for the shared slope-benchmark protocol (utils/benchmeasure).

The protocol is the basis of every published throughput number, so its two
contractual behaviors are pinned: the slope cancels a fixed per-call cost,
and a noise-inverted slope falls back to the long program's wall rate
instead of returning a negative/infinite rate (the failure mode that made
BENCH_r02 regress while the kernel got faster)."""
import numpy as np

from aadff_tpu.utils.benchmeasure import slope_rate


def _fake_clock_run(sec_per_unit, fixed_sec, clock):
    """run(size, i) that advances a fake clock instead of sleeping."""
    def run(size, i):
        clock[0] += fixed_sec + size * sec_per_unit
    return run


def test_slope_cancels_fixed_cost(monkeypatch):
    import aadff_tpu.utils.benchmeasure as bm

    clock = [0.0]
    monkeypatch.setattr(bm.time, "perf_counter", lambda: clock[0])
    # 1 ms/unit of device work buried under a 50 ms fixed dispatch cost
    rate, times = bm.slope_rate(_fake_clock_run(1e-3, 50e-3, clock), 10, 30)
    assert np.isclose(rate, 1000.0)
    # the raw wall rate of the short program would be badly understated
    assert 10 / times[10] < 200


def test_inverted_slope_falls_back_to_wall_rate(monkeypatch):
    import aadff_tpu.utils.benchmeasure as bm

    clock = [0.0]
    monkeypatch.setattr(bm.time, "perf_counter", lambda: clock[0])
    # pure fixed cost: the work delta vanished into jitter -> dt == 0;
    # the fallback must return the (finite, positive) long-program rate
    rate, times = bm.slope_rate(_fake_clock_run(0.0, 50e-3, clock), 10, 30)
    assert np.isfinite(rate) and rate > 0
    assert np.isclose(rate, 30 / times[30])


def test_detail_reports_jitter_spread(monkeypatch):
    """The pairwise-slope median resists per-call jitter and the detail dict
    quantifies it: a jitter-free run reports ~0% spread, a jittered run a
    positive one, and both recover the true per-unit rate."""
    import aadff_tpu.utils.benchmeasure as bm

    clock = [0.0]
    monkeypatch.setattr(bm.time, "perf_counter", lambda: clock[0])

    detail = {}
    rate, _ = bm.slope_rate(_fake_clock_run(1e-3, 50e-3, clock), 10, 30,
                            detail=detail)
    assert np.isclose(rate, 1000.0)
    assert detail["slope_spread_pct"] == 0.0
    assert set(detail["times_s"]) == {10, 30}
    assert all(len(v) == 5 for v in detail["times_s"].values())

    jitter_rng = np.random.default_rng(0)

    def jittered(size, i):
        # +-3 ms random dispatch jitter on 1 ms/unit of device work.  (An
        # *alternating* +-3 ms pattern would correlate perfectly with size
        # under the default interleaved order — real link jitter doesn't.)
        clock[0] += 50e-3 + size * 1e-3 + jitter_rng.uniform(-3e-3, 3e-3)

    detail = {}
    rate, _ = bm.slope_rate(jittered, 10, 30, detail=detail)
    # median pairwise slope still lands near the true rate despite jitter
    # whose amplitude is 30% of the 20 ms work delta
    assert abs(rate - 1000.0) < 150.0
    assert detail["slope_spread_pct"] is not None
    assert detail["slope_spread_pct"] >= 0.0


def test_distinct_rep_indices_per_size(monkeypatch):
    # the legacy blocked order (interleaving is the default since round 5)
    monkeypatch.setenv("AADFF_SLOPE_INTERLEAVE", "0")
    seen = []

    def run(size, i):
        seen.append((size, i))

    rate, _ = slope_rate(run, 2, 4, n_reps=3, n_warm=2)
    # warmups then timed reps, indices distinct within each size
    assert seen == [(2, 0), (2, 1), (2, 2), (2, 3), (2, 4),
                    (4, 0), (4, 1), (4, 2), (4, 3), (4, 4)]


def test_interleaved_protocol(monkeypatch):
    """AADFF_SLOPE_INTERLEAVE=1 warms both sizes, then alternates timed
    short/long reps (so slow RTT drift cancels in the slope) with distinct,
    monotonically increasing rep indices per size; AADFF_SLOPE_REPS
    overrides the default rep count when n_reps is left None."""
    monkeypatch.setenv("AADFF_SLOPE_INTERLEAVE", "1")
    monkeypatch.setenv("AADFF_SLOPE_REPS", "3")
    import aadff_tpu.utils.benchmeasure as bm

    clock = [0.0]
    monkeypatch.setattr(bm.time, "perf_counter", lambda: clock[0])
    seen = []

    def run(size, i):
        seen.append((size, i))
        clock[0] += 50e-3 + size * 1e-3

    detail = {}
    rate, _ = bm.slope_rate(run, 2, 4, n_warm=2, detail=detail)
    assert seen == [(2, 0), (2, 1), (4, 0), (4, 1),        # joint warm-up
                    (2, 2), (4, 2), (2, 3), (4, 3), (2, 4), (4, 4)]
    assert np.isclose(rate, 1000.0)
    assert detail["protocol"] == "interleaved"
    assert all(len(v) == 3 for v in detail["times_s"].values())

    # linear RTT drift over the session: the blocked protocol times all
    # short reps first, so the long reps carry ~5 call-positions of extra
    # drift each; interleaving bounds the positional gap at 1 call. Both
    # stay biased under drift this aggressive (2 ms/call on a 2 ms work
    # delta), but interleaved must land decisively closer to the truth.
    def make_drifting():
        drift = [0.0]

        def drifting(size, i):
            drift[0] += 2e-3  # +2 ms fixed cost per successive call
            clock[0] += 50e-3 + drift[0] + size * 1e-3
        return drifting

    rate_inter, _ = bm.slope_rate(make_drifting(), 2, 4, n_warm=2)
    monkeypatch.setenv("AADFF_SLOPE_INTERLEAVE", "0")
    monkeypatch.delenv("AADFF_SLOPE_REPS")
    rate_blocked, _ = bm.slope_rate(make_drifting(), 2, 4, n_reps=3, n_warm=2)
    assert abs(rate_inter - 1000.0) < abs(rate_blocked - 1000.0)


def test_interleave_is_the_default(monkeypatch):
    """Round-5 contract: with NO protocol env vars set, slope_rate runs the
    interleaved order and reports a fallback flag (VERDICT r4 weak #1 — the
    robust protocol was opt-in and BENCH_r04 published the blocked order's
    noise-inversion fallback as the headline number)."""
    monkeypatch.delenv("AADFF_SLOPE_INTERLEAVE", raising=False)
    monkeypatch.delenv("AADFF_SLOPE_REPS", raising=False)
    import aadff_tpu.utils.benchmeasure as bm

    clock = [0.0]
    monkeypatch.setattr(bm.time, "perf_counter", lambda: clock[0])
    detail = {}
    rate, _ = bm.slope_rate(_fake_clock_run(1e-3, 50e-3, clock), 10, 30,
                            detail=detail)
    assert detail["protocol"] == "interleaved"
    assert np.isclose(rate, 1000.0)
    assert detail["fallback"] is False

    # and the fallback is *flagged*, so callers can refuse to publish it
    detail = {}
    bm.slope_rate(_fake_clock_run(0.0, 50e-3, clock), 10, 30, detail=detail)
    assert detail["fallback"] is True
    assert detail["slope_spread_pct"] is None
