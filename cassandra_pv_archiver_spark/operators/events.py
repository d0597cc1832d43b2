"""Event-stream analytics: gap-based sessionization.

Uses Spark's NATIVE ``session_window`` operator (Catalyst
``SessionWindowing`` — merge-on-gap semantics, no Python in the path, and
the same operator works unchanged under Structured Streaming with a
watermark). At 100 TB this is one shuffle on the user key; the window
merge is done inside the aggregation, so there is no per-event window
explosion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    watermark: str | None = None,
) -> DataFrame:
    """Split each user's event stream into sessions separated by gaps of
    more than ``gap_minutes``; one output row per session.

    ``events`` needs ``ts`` as int64 ns (the canonical representation —
    see sources/testdata.load_table), ``event_type`` and ``value``.
    Timestamps are truncated to µs before windowing so results are
    engine-portable (the oracle reads the column as a µs TIMESTAMP).

    ``total_value`` is summed as DECIMAL(18,2) and cast back to double:
    double summation is order-dependent across partitionings, decimal
    summation is exact, so the result is bit-identical on any cluster
    size AND in the DuckDB oracle.

    ``watermark`` (e.g. ``"0 seconds"``, ``"10 minutes"``) switches the
    SAME plan to Structured Streaming semantics: sessions are held as
    state and emitted (append mode) once the event-time watermark passes
    the session's close — pass it when ``events`` is a streaming
    DataFrame. Batch callers leave it None.

    Returns: user_id, session_start (µs), session_end (µs, last event),
    n_events, n_errors, total_value — sorted by (user_id, session_start).
    """
    e = events.select(
        F.col(user_col).alias("user_id"),
        F.expr("ts div 1000").alias("t_us"),
        F.expr("timestamp_micros(ts div 1000)").alias("tts"),
        "event_type",
        "value",
    )
    if watermark is not None:
        e = e.withWatermark("tts", watermark)
    return (
        e.groupBy("user_id", F.session_window("tts", f"{gap_minutes} minutes"))
        .agg(
            F.min("t_us").alias("session_start"),
            F.max("t_us").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum((F.col("event_type") == "error").cast("long")).alias("n_errors"),
            F.sum(F.expr("CAST(value AS DECIMAL(18,2))"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            "user_id",
            "session_start",
            "session_end",
            "n_events",
            "n_errors",
            "total_value",
        )
    )


def conversion_funnel(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    user_col: str = "user_id",
) -> DataFrame:
    """Ordered-funnel analysis: per user, the deepest prefix of ``steps``
    completed IN ORDER (each step's first occurrence strictly after the
    previous step's first occurrence). One conditional-min aggregation
    per user — a single hash exchange, no self-joins, no iteration; the
    ordered-sequence predicate is evaluated on the per-user first-times
    row. Returns one row per funnel depth 0..len(steps): depth, n_users.
    """
    mins = [
        F.min(F.when(F.col("event_type") == s, F.col("ts"))).alias(f"_t{i}")
        for i, s in enumerate(steps)
    ]
    per_user = events.select(user_col, "event_type", "ts").groupBy(user_col).agg(*mins)
    depth = F.lit(0)
    reached = F.lit(True)
    prev = None
    for i in range(len(steps)):
        cond = F.col(f"_t{i}").isNotNull()
        if prev is not None:
            cond = cond & (F.col(f"_t{i}") > F.col(prev))
        reached = reached & cond
        depth = F.when(reached, F.lit(i + 1)).otherwise(depth)
        prev = f"_t{i}"
    observed = (
        per_user.select(depth.alias("depth"))
        .groupBy("depth")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    # fixed output shape: one row per depth 0..len(steps) even when no
    # user reached it (a missing depth row breaks fixed-shape consumers
    # and reads as "no data" instead of "zero users")
    spine = events.sparkSession.createDataFrame(
        [(d,) for d in range(len(steps) + 1)], "depth int"
    )
    return (
        spine.join(observed, "depth", "left")
        .select("depth", F.coalesce("n_users", F.lit(0)).alias("n_users"))
        .orderBy("depth")
    )


def weekly_cohort_retention(
    events: DataFrame, user_col: str = "user_id"
) -> DataFrame:
    """Cohort retention: users grouped by first-activity week, counted in
    each subsequent week they return. Two hash aggregations plus one
    join of the (user, week) activity table against the tiny (user,
    cohort) table — hashed on the user key; no per-week self-joins.
    Weeks are epoch-week ints (ns // 7 days) — calendar-free, so the
    arithmetic is identical in every engine.

    Returns: cohort_week, week_offset, n_users.
    """
    wk = F.expr(f"ts div {7 * 86_400 * 1_000_000_000}")
    uw = events.select(user_col, wk.alias("week")).distinct()
    cohort = uw.groupBy(user_col).agg(F.min("week").alias("cohort_week"))
    return (
        uw.join(cohort, user_col)
        .groupBy("cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


def last_touch_attribution(
    events: DataFrame,
    touches: tuple[str, ...] = ("view", "click"),
    conversion: str = "purchase",
    lookback_h: int = 24,
) -> DataFrame:
    """Last-touch conversion attribution: each conversion is credited to
    the user's most recent preceding touch event (within ``lookback_h``)
    — the standard marketing-analytics rollup, expressed as ONE LOCF
    window (no self-join, no per-conversion probe): ``last(touch,
    ignorenulls)`` over (user, ts, event_id) carries the latest touch
    forward onto every row; conversions outside the lookback (or with no
    touch at all) attribute to '(none)'.

    Revenue sums on the integer cent grid (floor(value·100 + 0.5)) so
    the rollup is BIGINT-exact on any cluster. Ties at identical ts
    order by event_id — a total order shared with the oracle.

    100 TB shape: one hash exchange on user_id for the window, then a
    tiny groupBy(touch_type) rollup. Returns: touch_type, n_conversions,
    revenue_q2, ordered by touch_type.
    """
    from pyspark.sql import Window

    lookback_ns = lookback_h * 3600 * 1_000_000_000
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_touch = F.col("event_type").isin(*touches)
    e = events.select(
        "user_id", "ts", "event_id", "event_type",
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("vq"),
    ).select(
        "*",
        F.last(F.when(is_touch, F.col("ts")), True).over(w).alias("lt_t"),
        F.last(F.when(is_touch, F.col("event_type")), True)
        .over(w)
        .alias("lt_et"),
    )
    conv = e.filter(F.col("event_type") == conversion).select(
        F.when(
            F.col("lt_t").isNotNull()
            & ((F.col("ts") - F.col("lt_t")) <= lookback_ns),
            F.col("lt_et"),
        ).otherwise(F.lit("(none)")).alias("touch_type"),
        "vq",
    )
    return (
        conv.groupBy("touch_type")
        .agg(
            F.count(F.lit(1)).alias("n_conversions"),
            F.sum("vq").alias("revenue_q2"),
        )
        .orderBy("touch_type")
    )
