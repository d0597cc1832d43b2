"""Hand-computed semantics for the retrieval-side resampling operators
(operators/resample.py): M4 plot downsampling, counter rate with resets,
linear grid resampling. Registry-level value hashes are pinned by the
oracles; these tests pin the corner rules the aggregates could silently
get wrong (tie-breaks, resets, alignment, extrapolation)."""

from __future__ import annotations

from cassandra_pv_archiver_spark.operators.resample import (
    NS,
    counter_rate,
    m4_downsample,
    resample_linear,
)


def _df(spark, rows):
    return spark.createDataFrame(
        [(c, t, float(v), 0, 0) for (c, t, v) in rows],
        "channel string, t long, v double, severity int, status int",
    )


def test_m4_extremes_and_tiebreaks(spark):
    p = 10  # seconds -> one bucket [0, 10s)
    rows = [
        ("a", 1 * NS, 5.0),
        ("a", 2 * NS, 9.0),  # first occurrence of the max
        ("a", 3 * NS, 9.0),  # later tie — must NOT win
        ("a", 4 * NS, 1.0),  # first occurrence of the min
        ("a", 5 * NS, 1.0),  # later tie — must NOT win
        ("a", 6 * NS, 7.0),
    ]
    out = m4_downsample(_df(spark, rows), p).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.t_first, r.v_first) == (1 * NS, 5.0)
    assert (r.t_last, r.v_last) == (6 * NS, 7.0)
    assert (r.t_min, r.v_min) == (4 * NS, 1.0)
    assert (r.t_max, r.v_max) == (2 * NS, 9.0)


def test_m4_single_sample_bucket_all_roles(spark):
    out = m4_downsample(_df(spark, [("a", 12 * NS, 3.0)]), 10).collect()
    r = out[0]
    assert r.bucket == 10 * NS
    assert r.t_first == r.t_min == r.t_max == r.t_last == 12 * NS
    assert r.v_first == r.v_min == r.v_max == r.v_last == 3.0


def test_counter_rate_monotonic_and_reset(spark):
    p = 10
    rows = [
        ("a", 1 * NS, 10.0),
        ("a", 3 * NS, 25.0),   # +15
        ("a", 5 * NS, 5.0),    # RESET -> contributes 5 (restart from 0)
        ("a", 7 * NS, 8.0),    # +3
        ("a", 12 * NS, 9.0),   # next window, +1
    ]
    out = {(r.channel, r.w_start): r for r in counter_rate(_df(spark, rows), p).collect()}
    w0 = out[("a", 0)]
    # first sample has no predecessor: 3 deltas in window 0
    assert w0.n_samples == 3 and w0.n_resets == 1
    assert abs(w0.rate_per_s - (15.0 + 5.0 + 3.0) / 10.0) < 1e-12
    w1 = out[("a", 10 * NS)]
    assert w1.n_samples == 1 and w1.n_resets == 0
    assert abs(w1.rate_per_s - 1.0 / 10.0) < 1e-12


def test_counter_rate_first_sample_excluded(spark):
    out = counter_rate(_df(spark, [("a", 1 * NS, 42.0)]), 10).collect()
    assert out == []  # a single sample has no rate


def test_resample_linear_interpolates_exact_grid(spark):
    p = 10
    rows = [
        ("a", 0 * NS, 0.0),    # aligned sample -> exact value at g=0
        ("a", 25 * NS, 50.0),  # grid points 10,20 interpolated on segment
        ("a", 40 * NS, 80.0),  # g=30 from segment 2; g=40 aligned final
    ]
    out = {r.t: r.v_interp for r in resample_linear(_df(spark, rows), p).collect()}
    assert out[0] == 0.0
    assert abs(out[10 * NS] - 20.0) < 1e-9   # 0 + 50*(10/25)
    assert abs(out[20 * NS] - 40.0) < 1e-9
    assert abs(out[30 * NS] - 60.0) < 1e-9   # 50 + 30*(5/15)
    assert out[40 * NS] == 80.0              # final aligned sample, exact
    assert set(out) == {0, 10 * NS, 20 * NS, 30 * NS, 40 * NS}


def test_resample_linear_never_extrapolates(spark):
    # final sample NOT aligned -> no grid point at/after it
    rows = [("a", 0, 1.0), ("a", 15 * NS, 4.0)]
    out = {r.t for r in resample_linear(_df(spark, rows), 10).collect()}
    assert out == {0, 10 * NS}  # nothing at 20s, nothing AT 15s


def test_resample_linear_gap_cap_bounds_fanout(spark):
    # a 1000-grid-point gap with a 10-point cap emits exactly 10 points
    # from the gap, plus the final (aligned) sample's own point
    rows = [("a", 0, 0.0), ("a", 10_000 * NS, 1.0)]
    out = resample_linear(_df(spark, rows), 10, max_points_per_gap=10).collect()
    ts = sorted(r.t for r in out)
    assert ts == [i * 10 * NS for i in range(10)] + [10_000 * NS]


def test_negative_timestamps_floor_align(spark):
    """Pre-1970 timestamps bucket by FLOOR (matching the SQL oracles'
    `//`), not truncation toward zero: t=-1ns with a 10s bucket belongs
    to bucket -10s, and the first grid point at/after it is 0."""
    p = 10
    rows = [("a", -1, 5.0), ("a", 5 * NS, 7.0)]
    m4 = m4_downsample(_df(spark, rows), p).collect()
    assert [r.bucket for r in m4] == [-10 * NS, 0]
    rl = {r.t: r.v_interp for r in resample_linear(_df(spark, rows), p).collect()}
    # segment [-1, 5s) covers exactly grid point 0
    assert set(rl) == {0}
    cr = counter_rate(_df(spark, rows), p).collect()
    assert [r.w_start for r in cr] == [0]


def test_lagged_correlation_detects_known_lag(spark):
    """B is A delayed by exactly 3600s: r peaks (==1 to ulp) at lag +3600
    and the pairing count shrinks by the lag overlap."""
    from cassandra_pv_archiver_spark.operators.stats import (
        lagged_channel_correlation,
    )

    vals = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0, 5.0, 3.0, 5.0, 8.0]
    rows = [("A", i * 3600 * NS, v) for i, v in enumerate(vals)]
    rows += [("B", (i + 1) * 3600 * NS, v) for i, v in enumerate(vals)]
    out = {
        r.lag_s: r
        for r in lagged_channel_correlation(
            _df(spark, rows), "A", "B", 3600, [-3600, 0, 3600]
        ).collect()
    }
    assert abs(out[3600].r - 1.0) < 1e-12
    assert out[3600].r > out[0].r and out[3600].r > out[-3600].r


def test_lagged_correlation_guards(spark):
    """Review-pinned corners: a span with no aligned grid point yields an
    EMPTY result (sequence() would reject start > stop), and non-grid
    lags are a loud usage error, not silently missing rows."""
    import pytest

    from cassandra_pv_archiver_spark.operators.stats import (
        lagged_channel_correlation,
    )

    # both channels live inside (610s, 655s): no multiple of 3600s there
    rows = [("A", 610 * NS, 1.0), ("A", 650 * NS, 2.0),
            ("B", 615 * NS, 3.0), ("B", 655 * NS, 4.0)]
    out = lagged_channel_correlation(
        _df(spark, rows), "A", "B", 3600, [0]
    ).collect()
    assert out == []
    with pytest.raises(ValueError, match="multiples of period_s"):
        lagged_channel_correlation(_df(spark, rows), "A", "B", 3600, [1800])


def test_correlations_flat_channel_yields_null_not_crash(spark):
    """Review-pinned (verified live): Spark 4 runs with ANSI mode ON, so
    the correlation divisions THREW DIVIDE_BY_ZERO for a constant (flat)
    channel. Zero variance now yields NULL r — the SQL corr() convention
    — in all three correlation operators."""
    from cassandra_pv_archiver_spark.operators.stats import (
        aligned_channel_correlations,
        exact_corr,
        lagged_channel_correlation,
    )

    d = spark.createDataFrame([(1, 5), (2, 5), (3, 5)], "x long, y long")
    assert exact_corr(d, "x", "y", "r").collect()[0].r is None
    rows = [("A", i * NS, 5.0) for i in range(5)] + [
        ("B", i * NS, float(i)) for i in range(5)
    ]
    s = _df(spark, rows)
    m = aligned_channel_correlations(s, ["A", "B"]).collect()
    assert len(m) == 1 and m[0].r is None and m[0].n_points == 5
    lg = lagged_channel_correlation(s, "A", "B", 1, [0]).collect()
    assert len(lg) == 1 and lg[0].r is None
