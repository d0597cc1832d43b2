"""Hot-channel skew fixture: one channel carrying 50 % of all rows.

A PV archive is channel-partitioned everywhere (the reference serializes
per-channel writes, SURVEY.md §3.2), so the worst realistic skew is one
runaway channel dominating the corpus. These tests pin what actually
happens in that regime — correctness is unaffected and the plan keeps the
distributable stages distributed; the measured wall-clock cost lives in
PERF.md ("Hot-channel skew" row: +47 % at 50 % skew — the per-channel
stage after the single exchange serializes the hot channel's share).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cassandra_pv_archiver_spark.operators.decimate import NS, decimate

BASE = 1_700_000_000 * NS


def _skewed(spark, n=20_000, hot_share=0.5, n_cold=50):
    """n samples, ``hot_share`` of them on channel HOT (1 Hz), the rest
    round-robin over ``n_cold`` cold channels."""
    n_hot = int(n * hot_share)
    hot = spark.range(n_hot).select(
        F.lit("HOT").alias("channel"),
        (F.lit(BASE) + F.col("id") * F.lit(NS)).alias("t"),
        (F.col("id") % 97).cast("double").alias("v"),
        F.lit(0).alias("severity"),
        F.lit(0).alias("status"),
    )
    cold = spark.range(n - n_hot).select(
        F.concat(F.lit("C"), (F.col("id") % n_cold).cast("string")).alias(
            "channel"
        ),
        (
            F.lit(BASE)
            + (F.col("id") / n_cold).cast("long") * F.lit(n_cold * NS)
        ).alias("t"),
        (F.col("id") % 89).cast("double").alias("v"),
        F.lit(0).alias("severity"),
        F.lit(0).alias("status"),
    )
    return hot.unionAll(cold)


def test_decimate_correct_under_hot_channel_skew(spark):
    """Channel independence: decimating the skewed corpus must give the
    hot channel exactly the rows decimating it ALONE gives (and likewise
    for a cold channel) — skew can shift wall-clock, never results."""
    df = _skewed(spark)
    whole = decimate(df, 3600)
    hot_alone = decimate(df.filter(F.col("channel") == "HOT"), 3600)
    a = sorted(map(tuple, whole.filter(F.col("channel") == "HOT").collect()))
    b = sorted(map(tuple, hot_alone.collect()))
    assert a == b and len(a) > 0
    cold_alone = decimate(df.filter(F.col("channel") == "C7"), 3600)
    a = sorted(map(tuple, whole.filter(F.col("channel") == "C7").collect()))
    b = sorted(map(tuple, cold_alone.collect()))
    assert a == b and len(a) > 0


def test_skew_plan_shape_is_the_documented_one(spark):
    """Pin the EXACT plan shape the PERF.md skew row reasons about:
    ONE hash exchange on channel, then the whole per-channel pipeline
    (window sort -> validity explode -> partial+final SortAggregate,
    reusing the window's sort order so the aggregation costs no second
    exchange) runs inside the channel's partition. Consequence, stated
    honestly: a channel holding fraction f of the corpus serializes ~f of
    this stage in one task (measured +47 % wall-clock at f=0.5, PERF.md);
    AQE's skew splitting does not apply because there is no shuffle to
    re-split — the defense at 100 TB is channel cardinality >> cores,
    which physical PV archives satisfy by construction."""
    plan = (
        decimate(_skewed(spark), 3600)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1, plan
    assert "hashpartitioning(channel" in plan
    # the decimal moment sums + struct max_by plan as partial+final
    # SortAggregate over the window's existing (channel, t->win) order
    assert plan.count("SortAggregate") == 2, plan
    assert "partial_sum" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_skew_safe_decimate_equals_default(spark):
    """The range-partitioned lead/hwm construction (skew_safe=True) must
    produce EXACTLY the default single-window result — on the skewed
    fixture (seam-heavy for the hot channel: many range partitions), on a
    small irregular series, and on a single-sample channel (degenerate
    boundary: no successor anywhere)."""
    for df in (
        _skewed(spark, n=5_000),
        _skewed(spark, n=400, hot_share=0.9, n_cold=3),
        spark.createDataFrame(
            [("solo", BASE, 1.0, 0, 0), ("duo", BASE, 2.0, 0, 0),
             ("duo", BASE + 7200 * NS, 3.0, 0, 0)],
            "channel string, t long, v double, severity int, status int",
        ),
    ):
        a = sorted(map(tuple, decimate(df, 3600).collect()))
        b = sorted(map(tuple, decimate(df, 3600, skew_safe=True).collect()))
        assert a == b


def test_skew_safe_plan_has_no_per_channel_window(spark):
    """skew_safe's window partitions are (physical partition, channel) —
    bounded by range-partition size — and hwm is a partial-agg groupBy,
    so NO plan operator keys a window on channel alone (the hot-channel
    serialization point of the default plan)."""
    plan = (
        decimate(_skewed(spark), 3600, skew_safe=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    # every windowspecdefinition must include the slice id column
    for spec in re.findall(r"windowspecdefinition\([^)]*\)", plan):
        assert "_pid" in spec, spec
    # r11: the slice id is a deterministic quantile bucket of t (no
    # range exchange at all); distribution happens in the (_pid, key)
    # window hash — pin that shape instead of the old rangepartitioning
    assert "rangepartitioning" not in plan
    assert re.search(r"hashpartitioning\(_pid", plan), plan


def test_skew_safe_passthrough_all_decimation_paths(spark):
    """Every decimation family member accepts skew_safe and produces the
    default-plan result (mixed decimation, pick-first, reaggregation)."""
    from cassandra_pv_archiver_spark.operators.decimate import (
        pick_first,
        reaggregate,
    )
    from cassandra_pv_archiver_spark.operators.decimate_mixed import (
        decimate_mixed,
    )

    # mixed-type series
    rows = [
        ("X", 0, "scalar_double", 1.0, None, 0, 0),
        ("X", 30 * NS, "scalar_string", None, "hello", 0, 0),
        ("X", 200 * NS, "scalar_double", 2.0, None, 0, 0),
        ("Y", 0, "scalar_double", 5.0, None, 0, 0),
        ("Y", 150 * NS, "scalar_double", 6.0, None, 0, 0),
    ]
    mx = spark.createDataFrame(
        rows,
        "channel string, t long, type string, v double, sval string,"
        " severity int, status int",
    )
    a = sorted(map(tuple, decimate_mixed(mx, 100).collect()))
    b = sorted(map(tuple, decimate_mixed(mx, 100, skew_safe=True).collect()))
    assert a == b and a

    sv = spark.createDataFrame(
        [("X", 0, "a", 0, 0), ("X", 150 * NS, "b", 0, 0),
         ("X", 250 * NS, "c", 0, 0)],
        "channel string, t long, sval string, severity int, status int",
    )
    a = sorted(map(tuple, pick_first(sv, 100).collect()))
    b = sorted(map(tuple, pick_first(sv, 100, skew_safe=True).collect()))
    assert a == b and a

    # hot channel spans ~5.5 h at 1 Hz -> several complete 2 h targets
    dec = decimate(_skewed(spark, n=40_000), 3600)
    a = sorted(map(tuple, reaggregate(dec, 3600, 7200).collect()))
    b = sorted(map(tuple,
                   reaggregate(dec, 3600, 7200, skew_safe=True).collect()))
    assert a == b and a


def test_auto_skew_safe_measures_then_decides(spark):
    """skew_safe="auto" runs the sampled key_skew_report pre-flight and
    switches plans at the measured crossover (PERF.md): a 95 %-hot
    fixture — the regime where skew_safe measured −31 % — takes the
    range-partitioned plan; a flat fixture keeps the default
    single-exchange plan; rows are identical either way."""

    def plan(df, mode):
        return (
            decimate(df, 3600, skew_safe=mode)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
            .lower()
        )

    hot = _skewed(spark, hot_share=0.95)
    flat = _skewed(spark, hot_share=0.0)
    assert "hashpartitioning(_pid" in plan(hot, "auto")
    assert "hashpartitioning(_pid" not in plan(flat, "auto")
    got = decimate(hot, 3600, skew_safe="auto").orderBy("channel", "t")
    want = decimate(hot, 3600, skew_safe=False).orderBy("channel", "t")
    assert got.collect() == want.collect()


def test_hot_key_share_estimates_the_exact_statistic(spark):
    """The auto probe's sampled max_key_share tracks the exact
    key_skew_report value within sampling noise on both regimes."""
    from cassandra_pv_archiver_spark.operators.decimate import hot_key_share

    assert abs(hot_key_share(_skewed(spark, hot_share=0.95), "channel")
               - 0.95) < 0.05
    assert hot_key_share(_skewed(spark, hot_share=0.5), "channel") < 0.6
    # exact mode (fraction=1.0) reproduces key_skew_report exactly
    assert hot_key_share(
        _skewed(spark, hot_share=0.5), "channel", fraction=1.0
    ) == 0.5
