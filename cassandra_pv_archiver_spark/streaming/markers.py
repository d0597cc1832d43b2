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
