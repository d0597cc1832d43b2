"""A6 mixed-type interval resolution — semantic tests.

Branch coverage mirrors `ChannelAccessSampleDecimatorTest.java:766-904`
(mixed aggregatable + markers, non-aggregatable fallback) against
`ChannelAccessSampleDecimator.java:137-186` dispatch rules.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cassandra_pv_archiver_spark.operators.decimate import NS
from cassandra_pv_archiver_spark.operators.decimate_mixed import decimate_mixed

SCHEMA = (
    "channel string, t long, type string, v double, sval string,"
    " severity int, status int"
)


def _mk(spark, rows):
    return spark.createDataFrame(
        [
            (c, int(t * NS), ty, None if v is None else float(v), sv, sev, st)
            for c, t, ty, v, sv, sev, st in rows
        ],
        SCHEMA,
    )


def _one(df, t_s):
    rows = df.filter(F.col("t") == t_s * NS).collect()
    assert len(rows) == 1, f"expected 1 row at t={t_s}s, got {len(rows)}"
    return rows[0]


def test_single_type_aggregates(spark):
    # homogeneous numeric -> plain A1 output, type becomes aggregated_*
    df = _mk(
        spark,
        [
            ("X", 0, "scalar_double", 10.0, None, 0, 0),
            ("X", 30, "scalar_double", 20.0, None, 0, 0),
            ("X", 60, "scalar_double", 0.0, None, 0, 0),
        ],
    )
    r = _one(decimate_mixed(df, 60), 0)
    assert r.type == "aggregated_scalar_double"
    assert abs(r.mean - 15.0) < 1e-9
    assert r.sval is None


def test_longest_covered_period_wins(spark):
    # two aggregatable types: scalar_long covers 40s, scalar_double 20s
    df = _mk(
        spark,
        [
            ("X", 0, "scalar_double", 10.0, None, 0, 0),
            ("X", 20, "scalar_long", 4.0, None, 1, 6),
            ("X", 60, "scalar_double", 0.0, None, 0, 0),
        ],
    )
    r = _one(decimate_mixed(df, 60), 0)
    assert r.type == "aggregated_scalar_long"
    assert abs(r.mean - 4.0) < 1e-12
    assert abs(r.covered_fraction - 40.0 / 60.0) < 1e-9
    # severity is the per-type aggregator's own max (the long sample's)
    assert r.severity == 1 and r.status == 6


def test_marker_does_not_veto(spark):
    # disconnected marker splits the interval but aggregation still wins
    # (`ChannelAccessSampleDecimator.java:167-172`)
    df = _mk(
        spark,
        [
            ("X", 0, "scalar_double", 10.0, None, 0, 0),
            ("X", 30, "disconnected", None, None, None, None),
            ("X", 45, "scalar_double", 20.0, None, 0, 0),
            ("X", 60, "scalar_double", 0.0, None, 0, 0),
        ],
    )
    r = _one(decimate_mixed(df, 60), 0)
    assert r.type == "aggregated_scalar_double"
    # weights: 30s@10 + 15s@20 over 45s covered
    assert abs(r.mean - (30 * 10 + 15 * 20) / 45.0) < 1e-9
    assert abs(r.covered_fraction - 45.0 / 60.0) < 1e-9


def test_non_aggregatable_vetoes_to_first_type(spark):
    # a string sample forces pick-first of the FIRST processed type, even
    # though numeric covers more (`:173-186`)
    df = _mk(
        spark,
        [
            ("X", 0, "scalar_string", None, "first", 2, 12),
            ("X", 10, "scalar_double", 10.0, None, 0, 0),
            ("X", 60, "scalar_double", 0.0, None, 0, 0),
        ],
    )
    r = _one(decimate_mixed(df, 60), 0)
    assert r.type == "scalar_string"
    assert r.sval == "first"
    assert r.severity == 2 and r.status == 12
    assert r.mean is None and r.covered_fraction is None


def test_veto_first_type_numeric_picks_first_samples_type(spark):
    # first sample numeric, string present -> winner is the numeric type's
    # AGGREGATED output (firstType aggregator), not the string
    df = _mk(
        spark,
        [
            ("X", 0, "scalar_double", 10.0, None, 0, 0),
            ("X", 40, "scalar_string", None, "s", 0, 0),
            ("X", 60, "scalar_double", 0.0, None, 0, 0),
        ],
    )
    r = _one(decimate_mixed(df, 60), 0)
    assert r.type == "aggregated_scalar_double"
    assert abs(r.mean - 10.0) < 1e-12
    assert abs(r.covered_fraction - 40.0 / 60.0) < 1e-9


def test_only_markers_restamps_first(spark):
    df = _mk(
        spark,
        [
            ("X", 10, "disconnected", None, None, None, None),
            ("X", 40, "disabled", None, None, None, None),
            ("X", 70, "disconnected", None, None, None, None),
        ],
    )
    r = _one(decimate_mixed(df, 60), 0)
    assert r.type == "disconnected"
    assert r.sval is None and r.mean is None


def test_seed_carries_type_resolution_across_windows(spark):
    # window [60,120) sees only the held-forward double seed -> aggregated
    df = _mk(
        spark,
        [
            ("X", 0, "scalar_double", 8.0, None, 0, 0),
            ("X", 130, "scalar_double", 1.0, None, 0, 0),
        ],
    )
    out = decimate_mixed(df, 60)
    r = _one(out, 60)
    assert r.type == "aggregated_scalar_double"
    assert abs(r.mean - 8.0) < 1e-12
    assert abs(r.covered_fraction - 1.0) < 1e-12


# ---------------------------------------------------------------------------
# full-union payloads: arrays, enum, display metadata
# (`ChannelAccessSampleDecimatorTest.java:700-757,836-900`)
# ---------------------------------------------------------------------------

FULL_SCHEMA = (
    "channel string, t long, type string, v double, sval string,"
    " aval array<double>, eval int, labels array<string>,"
    " asval array<string>,"
    " meta struct<precision:int,units:string,"
    "lower_warning_limit:double,upper_warning_limit:double,"
    "lower_alarm_limit:double,upper_alarm_limit:double,"
    "lower_display_limit:double,upper_display_limit:double,"
    "lower_control_limit:double,upper_control_limit:double>,"
    " severity int, status int"
)

META_A = (3, "V1", -10.0, 10.0, -20.0, 20.0, -30.0, 30.0, -30.0, 30.0)
META_B = (1, "V2", -1.0, 1.0, -2.0, 2.0, -3.0, 3.0, -3.0, 3.0)


def _mk_full(spark, rows):
    return spark.createDataFrame(
        [
            (c, int(t * NS), ty, v, sv, av, ev, lb, asv, m, sev, st)
            for c, t, ty, v, sv, av, ev, lb, asv, m, sev, st in rows
        ],
        FULL_SCHEMA,
    )


def test_enum_pick_first_carries_index_and_labels(spark):
    # `testMixedNonAggregatable` (`:836-900`): enum + string in one window
    # -> the FIRST processed sample wins and its payload survives verbatim
    df = _mk_full(
        spark,
        [
            ("X", 175, "scalar_enum", None, None, None, 2,
             ["Yes", "No", "Maybe"], None, None, 0, 0),
            ("X", 201, "array_string", None, None, None, None, None,
             ["Cassandra"], None, 3, 9),
            ("X", 239, "scalar_enum", None, None, None, 1,
             ["Yes", "No", "Maybe"], None, None, 0, 0),
            ("X", 400, "scalar_enum", None, None, None, 0,
             ["Yes"], None, None, 0, 0),
        ],
    )
    r = _one(decimate_mixed(df, 60), 180)
    assert r.type == "scalar_enum"
    assert r.eval == 2 and list(r.labels) == ["Yes", "No", "Maybe"]
    assert r.mean is None and r.severity == 0


def test_array_double_pick_first(spark):
    df = _mk_full(
        spark,
        [
            ("X", 10, "array_double", None, None, [1.0, 2.0, 3.0], None,
             None, None, META_A, 1, 6),
            ("X", 70, "array_double", None, None, [4.0, 5.0], None,
             None, None, META_B, 2, 12),
            ("X", 200, "array_double", None, None, [9.0], None,
             None, None, META_B, 0, 0),
        ],
    )
    out = decimate_mixed(df, 60)
    r0 = _one(out, 0)
    assert r0.type == "array_double" and list(r0.aval) == [1.0, 2.0, 3.0]
    assert tuple(r0.meta) == META_A
    # pick-first selects the sample valid AT interval start — the t=10
    # sample still holds at t=60 (`ChannelAccessSampleDecimatorTest.java:
    # 841-857`: a sample from BEFORE the period seeds it)
    r1 = _one(out, 60)
    assert list(r1.aval) == [1.0, 2.0, 3.0] and tuple(r1.meta) == META_A
    # the t=70 sample seeds window 120 via hold-forward
    r2 = _one(out, 120)
    assert list(r2.aval) == [4.0, 5.0] and tuple(r2.meta) == META_B


def test_aggregated_meta_from_first_used_sample(spark):
    # `testAggregatedScalarShort` (`:700-757`): the aggregated sample
    # carries the display metadata of the FIRST used source sample even
    # when later samples carry different metadata
    df = _mk_full(
        spark,
        [
            ("X", 0, "scalar_double", 40.0, None, None, None, None, None,
             META_A, 0, 0),
            ("X", 30, "scalar_double", 0.0, None, None, None, None, None,
             META_B, 0, 0),
            ("X", 60, "scalar_double", 1.0, None, None, None, None, None,
             META_B, 0, 0),
        ],
    )
    r = _one(decimate_mixed(df, 60), 0)
    assert r.type == "aggregated_scalar_double"
    assert abs(r.mean - 20.0) < 1e-9
    assert tuple(r.meta) == META_A


def test_aggregatable_first_wins_under_veto_with_meta(spark):
    # veto by a non-aggregatable type, but the first sample is aggregatable
    # -> aggregated output of the first type
    # (`ChannelAccessSampleDecimator.java:137-186`)
    df = _mk_full(
        spark,
        [
            ("X", 0, "scalar_double", 10.0, None, None, None, None, None,
             META_A, 0, 0),
            ("X", 30, "scalar_enum", None, None, None, 1, ["A", "B"], None,
             None, 2, 12),
            ("X", 60, "scalar_double", 2.0, None, None, None, None, None,
             META_B, 0, 0),
        ],
    )
    r = _one(decimate_mixed(df, 60), 0)
    assert r.type == "aggregated_scalar_double"
    assert r.eval is None and tuple(r.meta) == META_A


def test_mixed_signed_zero_extrema_deterministic(spark):
    """The mixed-type path shares decimate's Math.min/Math.max-faithful
    extrema: a {+0.0, -0.0} interval yields vmin=-0.0 / vmax=+0.0 bits
    regardless of encounter order (VERDICT r7 #9 bug class)."""
    import struct as _st

    from cassandra_pv_archiver_spark.operators.decimate_mixed import (
        decimate_mixed,
    )

    def bits(x):
        return _st.unpack(">Q", _st.pack(">d", x))[0]

    NS = 1_000_000_000
    rows = [
        ("a", 60 * NS, "scalar_double", 0.0, None, None, None, None, None,
         None, 0, 0),
        ("a", 120 * NS, "scalar_double", -0.0, None, None, None, None, None,
         None, 0, 0),
        ("a", 7300 * NS, "scalar_double", 9.0, None, None, None, None, None,
         None, 0, 0),
    ]
    schema = (
        "channel string, t long, type string, v double, aval array<double>,"
        " eval int, labels array<string>, sval string, asval array<string>,"
        " meta struct<precision:int,units:string,lower_warning_limit:double,"
        "upper_warning_limit:double,lower_alarm_limit:double,"
        "upper_alarm_limit:double,lower_display_limit:double,"
        "upper_display_limit:double,lower_control_limit:double,"
        "upper_control_limit:double>, severity int, status int"
    )
    df = spark.createDataFrame(rows, schema)
    out = decimate_mixed(df, 3600).orderBy("t").collect()[0]
    assert bits(out.vmin) == bits(-0.0)
    assert bits(out.vmax) == bits(0.0)
