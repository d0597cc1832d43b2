"""Distribution statistics: exact per-group quantiles.

Discrete (type-1) quantiles — the value at row ceil(q·n) of the sorted
group — NOT interpolated: picking an existing value keeps the result
bit-identical across engines (no order-sensitive float interpolation)
and is what you want for threshold selection anyway ("drop the bottom
quartile" needs an attained value). One shuffle on the group key; the
per-group sort is a window, so skewed groups are the scale limit — for
a single giant group use approx_percentile instead (documented
trade-off, not needed for per-language strata).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def group_discrete_quantiles(
    df: DataFrame,
    key_col: str,
    val_col: str,
    qs: Sequence[float],
    tiebreak_col: str,
) -> DataFrame:
    """Exact q-quantiles of ``val_col`` per ``key_col`` group.

    ``tiebreak_col`` makes the sort total so the selected row is unique
    and deterministic. Returns (key_col, q, q_value) with one row per
    (group, q).
    """
    w = Window.partitionBy(key_col).orderBy(val_col, tiebreak_col)
    r = df.select(
        key_col,
        F.col(val_col).alias("q_value"),
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(Window.partitionBy(key_col)).alias("_n"),
    )
    qdf = df.sparkSession.createDataFrame([(float(q),) for q in qs], "q double")
    return (
        r.join(
            F.broadcast(qdf),
            F.col("_rn") == F.ceil(F.col("q") * F.col("_n")),
        )
        .select(key_col, "q", "q_value")
    )
