"""T5: disabled/disconnected marker generation from state transitions.

Reference (`ControlSystemSupport.java:208-258`): when archiving is disabled
or the PV disconnects, a value-less marker sample is written at the
transition time (configurable). Expressed declaratively: a connection/enable
state series -> ``lag`` over (channel, t) -> emit a marker row exactly where
the state flips to false. JVM-side window function, no custom state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def transition_markers(
    states: DataFrame,
    state_col: str = "connected",
    marker_type: str = "disconnected",
    key: str = "channel",
    t: str = "t",
) -> DataFrame:
    """``(channel, t, <state bool>)`` -> marker rows at false-transitions.

    A marker is emitted when the state goes true -> false; the first
    observation of a channel emits one as well if it is already false
    (cold-start disconnect, mirroring the reference's initial-state write).
    Output: ``channel, t, type`` rows ready for the mixed-sample union.
    """
    w = Window.partitionBy(key).orderBy(t)
    d = states.withColumn("_prev", F.lag(state_col).over(w))
    flips = d.filter(
        (~F.col(state_col))
        & (F.col("_prev").isNull() | F.col("_prev"))
    )
    return flips.select(
        F.col(key), F.col(t), F.lit(marker_type).alias("type")
    )


def disconnect_markers_stream(
    stream: DataFrame,
    silence_s: int,
    key: str = "channel",
    t: str = "t",
) -> DataFrame:
    """T5 streaming-native: emit a ``disconnected`` marker when a channel
    falls silent for ``silence_s`` of EVENT time — the Spark analog of the
    reference writing a disconnect marker when the PV's monitor goes away
    (`ControlSystemSupport.java:208-258`), detected here by gap instead of
    transport callback (a replayable-source pipeline has no connection
    signal).

    Implementation: ``applyInPandasWithState`` with an **event-time
    timeout** — per channel the state holds the latest seen ``t``; the
    timeout is armed at ``last_t + silence`` and fires when the stream's
    watermark (advanced by other channels' traffic) passes it. One long of
    state per channel; markers are stamped at the silence boundary, not at
    detection time, so results are replay-deterministic.

    ``stream`` must be a streaming DataFrame with an int64-ns ``t``; an
    event-time column + zero-delay watermark are derived internally.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from .limits import NS

    silence_ns = silence_s * NS
    # integer div, never double division: ns values exceed 2^53, and a
    # float-rounded event time near the watermark flips late-row handling
    src = stream.withColumn(
        "_ts", F.timestamp_micros(F.expr(f"{t} div 1000"))
    ).withWatermark("_ts", "0 seconds")
    out_schema = f"{key} string, {t} long, type string"

    def _fn(key_, pdf_iter, state: GroupState):
        import pandas as pd

        if state.hasTimedOut:
            (last,) = state.get
            state.remove()  # one marker per disconnect; new data re-arms
            yield pd.DataFrame(
                {key: [key_[0]], t: [last + silence_ns], "type": ["disconnected"]}
            )
            return
        last = state.get[0] if state.exists else None
        # Silence gaps BETWEEN rows of this batch (and between the carried
        # state and the batch's first row) must emit markers too: a fast
        # replay can deliver hours of data in one micro-batch, and the
        # timeout below only watches the gap AFTER the newest row — without
        # the intra-batch scan, replay would emit fewer markers than the
        # live run did (pacing-dependent results).
        ts_all = sorted(
            int(v) for pdf in pdf_iter for v in pdf[t].tolist()
        )
        marks = []
        for ts in ts_all:
            if last is not None and ts - last > silence_ns:
                marks.append(last + silence_ns)
            last = ts if last is None else max(last, ts)
        if marks:
            yield pd.DataFrame(
                {
                    key: [key_[0]] * len(marks),
                    t: marks,
                    "type": ["disconnected"] * len(marks),
                }
            )
        if last is not None:
            state.update((int(last),))
            state.setTimeoutTimestamp((last + silence_ns) // 1_000_000)
        return
        yield  # pragma: no cover - make the function a generator

    return src.groupBy(key).applyInPandasWithState(
        _fn,
        out_schema,
        "last_t long",
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
