"""Per-rep session guard in bench.py (VERDICT r4 weak #4).

BENCH_r04's encode spread was [1277, 6063, 6128] p/s — one rep ran 4.7x
slow inside a roofline-passed session. ``_guarded_reps`` must rerun such
intra-session outliers (recording what was dropped + a roofline re-probe)
and leave healthy rep sets untouched.
"""

import sys

sys.path.insert(0, "/root/repo")

import pytest

import bench


class _FakeClock:
    """Deterministic stand-in for time.time(): each fn() call advances
    the clock by the next scripted duration."""

    def __init__(self, durations):
        self.durations = list(durations)
        self.now = 0.0

    def time(self):
        return self.now

    def fn(self):
        self.now += self.durations.pop(0)


def _run(durations, **kw):
    clock = _FakeClock(durations)
    orig = bench.time.time
    bench.time.time = clock.time
    try:
        return bench._guarded_reps(clock.fn, 3, **kw)
    finally:
        bench.time.time = orig


def test_outlier_rep_rerun_and_recorded():
    probes = []
    times, dropped = _run([1.0, 10.0, 1.0, 1.1],
                          probe=lambda: probes.append(1) or 77.7)
    assert times == pytest.approx([1.0, 1.1, 1.0])
    assert dropped == [{"rep_s": 10.0, "best_rep_s": 1.0,
                        "roofline_tflops_at_rerun": 77.7}]
    assert probes == [1]


def test_healthy_reps_untouched():
    times, dropped = _run([1.0, 1.2, 1.5])
    assert times == pytest.approx([1.0, 1.2, 1.5])
    assert dropped == []


def test_rerun_budget_bounded():
    # every rep pathological: at most max_extra reruns, then report as-is
    times, dropped = _run([1.0, 10.0, 10.0, 10.0, 10.0], max_extra=2)
    assert len(times) == 3 and len(dropped) == 2
    assert max(times) == pytest.approx(10.0)          # still visible in the spread
