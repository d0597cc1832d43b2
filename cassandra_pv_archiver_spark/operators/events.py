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
