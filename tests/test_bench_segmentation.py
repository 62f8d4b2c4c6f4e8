"""Unit tests for bench.py's per-segment calibration math (VERDICT r9
item 2): the BENCH_r09 blind spot was load that arrived after the start
probe and left before the end probe — per-segment probes must see it.

Pure-function tests; no SparkSession.
"""

import pytest

from bench import (
    CALIBRATION_LOAD_FACTOR,
    CALIBRATION_QUIET_SEC,
    analyze_probes,
    segment_bounds,
)

Q = CALIBRATION_QUIET_SEC


class TestSegmentBounds:
    def test_exact_multiple(self):
        assert segment_bounds(20, 10) == [(0, 10), (10, 20)]

    def test_ragged_tail(self):
        assert segment_bounds(54, 10) == [
            (0, 10), (10, 20), (20, 30), (30, 40), (40, 50), (50, 54),
        ]

    def test_fewer_than_one_segment(self):
        assert segment_bounds(3, 10) == [(0, 3)]

    def test_empty(self):
        assert segment_bounds(0, 10) == []

    def test_probe_count_matches_segments(self):
        # k segments need k+1 probes; analyze_probes must accept that
        bounds = segment_bounds(54, 10)
        probes = [Q] * (len(bounds) + 1)
        v = analyze_probes(probes)
        assert len(v["segment_factors"]) == len(bounds)


class TestQuietRun:
    def test_all_quiet_probes(self):
        v = analyze_probes([Q, Q, Q, Q])
        assert not v["contaminated"]
        assert v["stable"]
        assert v["valid"]
        assert v["hot_probes"] == []
        assert all(f == 1.0 for f in v["segment_factors"])

    def test_faster_host_floors_at_one(self):
        # a faster-than-reference host must not DEFLATE normalized
        # numbers (factor floored at 1.0, the r4-r9 convention)
        v = analyze_probes([Q * 0.8, Q * 0.8, Q * 0.8])
        assert all(f == 1.0 for f in v["segment_factors"])
        assert v["valid"]

    def test_jit_warmup_start_not_load(self):
        # measured r5 shape: start probe ~1.2x end with nothing running.
        # Warmed probes quiet -> not contaminated, segment 0's factor
        # uses the warmed probe, not the JIT-inflated start.
        v = analyze_probes([Q * 1.22, Q * 1.02, Q * 1.0])
        assert not v["contaminated"]
        assert v["valid"]
        assert v["segment_factors"][0] == pytest.approx(1.02, abs=0.02)


class TestMidRunLoad:
    """The BENCH_r09 scenario: quiet ends, hot middle."""

    def test_hot_middle_probe_flags_invalid(self):
        probes = [Q, Q, Q * 3.0, Q, Q]  # load during segments 2-3
        v = analyze_probes(probes)
        assert v["contaminated"]
        assert not v["stable"]
        assert not v["valid"], (
            "mid-run load with quiet end probes MUST invalidate the "
            "gate — this is the exact r9 blind spot"
        )
        assert v["hot_probes"] == [2]

    def test_hot_middle_inflates_adjacent_segment_factors_only(self):
        probes = [Q, Q, Q * 3.0, Q, Q]
        f = analyze_probes(probes)["segment_factors"]
        assert f[0] == 1.0
        assert f[3] == 1.0
        # segments bounded by the hot probe get factor (1+3)/2 = 2.0
        assert f[1] == pytest.approx(2.0, abs=0.01)
        assert f[2] == pytest.approx(2.0, abs=0.01)

    def test_load_bound_is_exact(self):
        at_bound = Q * CALIBRATION_LOAD_FACTOR
        assert not analyze_probes([Q, at_bound])["contaminated"]
        assert analyze_probes([Q, at_bound * 1.01])["contaminated"]


class TestSlowerHost:
    def test_uniformly_slow_host_is_valid_normalized(self):
        # every probe 1.5x quiet: slower host, not transient load
        v = analyze_probes([Q * 1.5, Q * 1.5, Q * 1.5, Q * 1.5])
        assert v["contaminated"]
        assert v["stable"]
        assert v["valid"]
        assert all(f == pytest.approx(1.5, abs=0.01) for f in v["segment_factors"])

    def test_slow_host_plus_transient_spike_invalid(self):
        v = analyze_probes([Q * 1.5, Q * 1.5, Q * 4.0, Q * 1.5])
        assert v["contaminated"]
        assert not v["stable"]
        assert not v["valid"]


class TestEdges:
    def test_two_probes_minimum(self):
        v = analyze_probes([Q, Q])
        assert len(v["segment_factors"]) == 1
        assert v["valid"]

    def test_one_probe_raises(self):
        with pytest.raises(ValueError):
            analyze_probes([Q])

    def test_load_departing_before_end_probe_normalizes_its_segment(self):
        # load spans one interior probe; normalization corrects the two
        # segments it bounds, leaves the rest raw-equivalent
        probes = [Q, Q * 2.4, Q, Q]
        v = analyze_probes(probes)
        f = v["segment_factors"]
        assert f[0] == pytest.approx(1.7, abs=0.01)  # (1+2.4)/2
        assert f[1] == pytest.approx(1.7, abs=0.01)
        assert f[2] == 1.0
        assert not v["valid"]
