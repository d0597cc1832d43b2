"""§2.10 decimator-plugin SPI tests, mirroring the structure of the
reference's `ChannelAccessSampleDecimatorTest.java`: build a small sample
series by hand, decimate one/two intervals, assert every output field
against hand-computed expectations — then pin that the SPI needs no engine
edits (a plugin defined INSIDE THE TEST flows through decimate_with)."""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F

from cassandra_pv_archiver_spark.operators.decimate import NS, decimate
from cassandra_pv_archiver_spark.operators.plugins import (
    DecimatorPlugin,
    decimate_with,
    get_decimator,
    make_median_plugin,
    register_decimator,
)

SCHEMA = "channel string, t long, v double, severity int, status int"


def _series(spark, rows):
    return spark.createDataFrame(
        [(c, t * NS, float(v), s, st) for c, t, v, s, st in rows], SCHEMA
    )


def test_weighted_median_golden_single_interval(spark):
    """Interval [0, 100): v=1 for 60 s, spike v=100 for 10 s, v=2 for 30 s.
    Time-weighted mean is dragged to ~10.9; the weighted median is 1
    (value 1 alone covers 60 % >= half the covered time)."""
    rows = [
        ("X", 0, 1.0, 0, 0),
        ("X", 60, 100.0, 2, 1),
        ("X", 70, 2.0, 0, 0),
        ("X", 100, 3.0, 0, 0),  # closes the interval (hwm gate)
    ]
    out = decimate_with(
        _series(spark, rows), 100, make_median_plugin(100)
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r.channel == "X" and r.t == 0
    assert r.median == 1.0
    assert r.covered_fraction == pytest.approx(1.0)
    assert r.n_samples == 3
    # contrast: the built-in time-weighted mean IS dragged by the spike
    mean = decimate(_series(spark, rows), 100).collect()[0].mean
    assert mean == pytest.approx((60 * 1 + 10 * 100 + 30 * 2) / 100, abs=0.01)


def test_weighted_median_even_split_takes_lower_value(spark):
    """50/50 coverage tie -> the SMALLEST value whose cumulative coverage
    reaches half wins (deterministic attained median)."""
    rows = [
        ("X", 0, 5.0, 0, 0),
        ("X", 50, 4.0, 0, 0),
        ("X", 100, 9.0, 0, 0),
    ]
    r = decimate_with(_series(spark, rows), 100, make_median_plugin(100)).collect()[0]
    assert r.median == 4.0


def test_hold_forward_seed_weight_matches_engine(spark):
    """The plugin sees the SAME hold-forward validity split as the
    built-in path: a sample from the previous interval seeds the window
    with clipped validity (reference: the at-or-before sample passed
    first to processSample, `SampleDecimator.java:40-56`)."""
    rows = [
        ("X", 90, 7.0, 0, 0),   # seeds [100, 200) with 20 s (100..120)
        ("X", 120, 1.0, 0, 0),
        ("X", 200, 2.0, 0, 0),
    ]
    out = {r.t // NS: r for r in decimate_with(
        _series(spark, rows), 100, make_median_plugin(100)
    ).collect()}
    assert 100 in out
    r = out[100]
    # coverage: v=7 for 20 s, v=1 for 80 s -> median 1, fraction 1.0
    assert r.median == 1.0 and r.covered_fraction == pytest.approx(1.0)
    assert r.n_samples == 2


def test_gap_fill_and_incomplete_window_gating(spark):
    """Windows with no new samples are gap-filled from the held value;
    the trailing incomplete window is NOT emitted — identical gating to
    the built-in decimation (W1/W2)."""
    rows = [("X", 0, 3.0, 0, 0), ("X", 250, 4.0, 0, 0)]
    out = {r.t // NS: r for r in decimate_with(
        _series(spark, rows), 100, make_median_plugin(100)
    ).collect()}
    assert set(out) == {0, 100}  # [200,300) incomplete -> gated
    assert out[0].median == 3.0 and out[100].median == 3.0
    assert out[100].n_samples == 1  # the held sample only


def test_third_party_plugin_without_engine_edits(spark):
    """A plugin defined here (range = vmax - vmin), never seen by the
    package, registers and runs through the same dispatch — the
    createSampleDecimator SPI analog."""

    def _range_fn(g: pd.DataFrame) -> dict:
        return {"vrange": float(g["v"].max() - g["v"].min())}

    register_decimator(
        DecimatorPlugin(name="vrange", fields="vrange double", fn=_range_fn)
    )
    assert get_decimator("vrange").name == "vrange"
    rows = [("X", 0, 1.0, 0, 0), ("X", 40, 9.0, 0, 0), ("X", 100, 2.0, 0, 0)]
    r = decimate_with(_series(spark, rows), 100, "vrange").collect()[0]
    assert r.vrange == 8.0


def test_unknown_plugin_raises(spark):
    with pytest.raises(KeyError, match="no decimator plugin"):
        decimate_with(
            _series(spark, [("X", 0, 1.0, 0, 0)]), 100, "nope"
        )
