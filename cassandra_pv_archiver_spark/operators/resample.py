"""Retrieval-side resampling operators over the raw sample series.

The reference serves decimated (hold-forward time-weighted) series and
raw samples; archiver front-ends layer three more retrieval shapes on
top of exactly this data model, and they belong in the engine because
each is a one-pass, one-exchange plan at any scale:

* **M4 plot downsampling** (Jugel et al., VLDB 2014): per pixel-column
  time bucket keep first/last/min/max — the lossless-for-rasterization
  reduction every time-series UI needs. Pure hash aggregation.
* **Counter rate** (the monitoring ``rate()`` primitive): per-window
  increase of a monotonic counter with reset detection via ``lag``.
* **Linear resampling to a regular grid**: the "linear" retrieval
  operator archiver HTTP APIs expose alongside raw/LOCF — each sample
  segment emits its covered grid points by interpolation.

All three reuse the load's (channel) hash for their window/aggregation
clustering — no additional data exchange (the `channel_gap_stats`
guarantee); none touches Python. Value arithmetic is either exact
scaled-integer (counter rate) or a fixed IEEE expression tree evaluated
identically by any engine (interpolation), so results are value-hash
stable across engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

NS = 1_000_000_000


def m4_downsample(s: DataFrame, period_s: int) -> DataFrame:
    """M4: per (channel, bucket) the four extreme samples — (t, v) at the
    first and last timestamp and at the min and max value. Ties on value
    resolve to the earliest timestamp (deterministic at any parallelism).

    ONE hash aggregation; every selector is a partial-agg-friendly
    min/max/min_by/max_by, so a hot channel's bucket combines map-side
    before the single shuffle."""
    p_ns = period_s * NS
    # floor-aligned bucket: t - pmod(t, p) floors for ANY sign (plain `div`
    # — and DuckDB's integer `//` — truncate toward zero; the oracles use
    # the same pmod-safe form so both engines floor)
    b = s.withColumn("bucket", F.expr(f"t - pmod(t, {p_ns})"))
    return (
        b.groupBy("channel", "bucket")
        .agg(
            F.min("t").alias("t_first"),
            F.min_by("v", "t").alias("v_first"),
            # argmin/argmax over (v, tiebreak t): struct ordering is
            # lexicographic, -t turns the tiebreak into "earliest"
            F.min_by("t", F.struct("v", "t")).alias("t_min"),
            F.min("v").alias("v_min"),
            F.max_by("t", F.struct(F.col("v"), (-F.col("t")).alias("nt"))).alias(
                "t_max"
            ),
            F.max("v").alias("v_max"),
            F.max("t").alias("t_last"),
            F.max_by("v", "t").alias("v_last"),
        )
        .orderBy("channel", "bucket")
    )


def counter_rate(s: DataFrame, period_s: int) -> DataFrame:
    """Per-window rate of a monotonic counter with reset handling: the
    increase of sample i is ``v_i - v_{i-1}``, or ``v_i`` after a reset
    (value went down — the counter restarted from zero), the monitoring
    convention. Rows without a predecessor contribute nothing.

    Values quantize to 2-decimal scaled integers before summing, so the
    per-window total is exact and order-insensitive; ONE divide at the
    end produces the per-second rate. The lag window and the (channel,
    window) aggregation both ride the load's channel hash."""
    p_ns = period_s * NS
    w = Window.partitionBy("channel").orderBy("t")
    q = "CAST(floor(v * 100 + 0.5) AS BIGINT)"
    g = (
        s.withColumn("_qv", F.expr(q))
        .withColumn("_prev", F.lag("_qv").over(w))
        .filter(F.col("_prev").isNotNull())
        .withColumn(
            "_inc",
            F.when(
                F.col("_qv") >= F.col("_prev"), F.col("_qv") - F.col("_prev")
            ).otherwise(F.col("_qv")),
        )
        .withColumn("w_start", F.expr(f"t - pmod(t, {p_ns})"))  # floor
    )
    return (
        g.groupBy("channel", "w_start")
        .agg(
            F.count(F.lit(1)).alias("n_samples"),
            F.sum((F.col("_qv") < F.col("_prev")).cast("long")).alias(
                "n_resets"
            ),
            (F.sum("_inc") / F.lit(float(100 * period_s))).alias(
                "rate_per_s"
            ),
        )
        .orderBy("channel", "w_start")
    )


def resample_linear(
    s: DataFrame, period_s: int, max_points_per_gap: int = 100_000
) -> DataFrame:
    """Linear interpolation onto the epoch-aligned ``period_s`` grid —
    the "linear" retrieval operator, complementing the engine's LOCF
    decimation (which the reference mandates for *aggregation*; for
    *display* interpolation front-ends want the straight line).

    Each segment [t_i, t_{i+1}) emits the grid points it covers
    (``sequence`` + ``explode`` — the same construction decimate.py uses
    for window splitting), valued ``v + (v_next - v) * (g - t) /
    (t_next - t)``. The expression tree is fixed, so any IEEE engine
    reproduces the bits. A grid point coinciding with a sample gets the
    sample's exact value. The final sample emits its own grid point only
    if aligned (nothing is extrapolated). ``max_points_per_gap`` bounds
    the fan-out of a dead channel's gap, like decimate's
    ``max_gap_windows``."""
    p_ns = period_s * NS
    w = Window.partitionBy("channel").orderBy("t")
    seg = (
        s.withColumn("t_next", F.lead("t").over(w))
        .withColumn("v_next", F.lead("v").over(w))
        # first aligned grid point at/after t (ceil via pmod — exact
        # floor/ceil semantics for negative ns too)
        .withColumn("g0", F.expr(f"t + pmod(-t, {p_ns})"))
        .withColumn(
            "g_stop",
            F.when(
                F.col("t_next").isNotNull(),
                F.least(
                    F.col("t_next") - 1,
                    F.col("g0") + F.lit((max_points_per_gap - 1) * p_ns),
                ),
            ).otherwise(F.when(F.expr(f"pmod(t, {p_ns}) = 0"), F.col("t"))),
        )
    )
    pts = (
        seg.filter(F.col("g_stop").isNotNull() & (F.col("g0") <= F.col("g_stop")))
        .withColumn(
            "g", F.explode(F.expr(f"sequence(g0, g_stop, {p_ns})"))
        )
        .select(
            "channel",
            F.col("g").alias("t"),
            F.when(F.col("t_next").isNotNull(),
                   F.col("v")
                   + (F.col("v_next") - F.col("v"))
                   * ((F.col("g") - F.col("t")).cast("double")
                      / (F.col("t_next") - F.col("t")).cast("double")))
            .otherwise(F.col("v"))
            .alias("v_interp"),
        )
    )
    return pts.orderBy("channel", "t")
