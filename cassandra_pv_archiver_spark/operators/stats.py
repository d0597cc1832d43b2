"""Distribution statistics: exact per-group quantiles.

Discrete (type-1) quantiles — the value at row ceil(q·n) of the sorted
group — NOT interpolated: picking an existing value keeps the result
bit-identical across engines (no order-sensitive float interpolation)
and is what you want for threshold selection anyway ("drop the bottom
quartile" needs an attained value). One shuffle on the group key; the
per-group sort is a window, so skewed groups are the scale limit — the
sketch-based :func:`group_approx_quantiles` is the giant-stratum path
(exact below its accuracy, rank error ≤ 1/accuracy above it).
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


def group_approx_quantiles(
    df: DataFrame,
    key_col: str,
    val_col: str,
    qs: Sequence[float],
    accuracy: int = 100_000,
) -> DataFrame:
    """Sketch-based per-group quantiles — the 100 TB path for
    :func:`group_discrete_quantiles`.

    ``approx_percentile`` aggregates a Greenwald-Khanna sketch with
    map-side partial combine: ONE hash aggregation, no per-group window
    sort — so a skewed stratum (one language carrying half the corpus)
    costs a bounded-size sketch merge instead of a single-task sort of
    half the data. Guarantees: rank error ≤ 1/accuracy of the group size
    (1e-5 by default); for groups SMALLER than ``accuracy`` the sketch
    retains every value and the result is EXACT (verified equal to the
    exact discrete quantiles at test scale — the rank convention,
    value at row ceil(q·n), matches both the exact operator and DuckDB's
    ``quantile_disc``, boundary cases probed in tests). Returns
    (key_col, q, q_value), one row per (group, q).
    """
    qlist = ", ".join(repr(float(q)) for q in qs)
    agg = F.expr(
        f"approx_percentile({val_col}, array({qlist}), {accuracy})"
    ).alias("_qv")
    qdf = df.sparkSession.createDataFrame(
        [(i, float(q)) for i, q in enumerate(qs)], "_i int, q double"
    )
    return (
        df.groupBy(key_col)
        .agg(agg)
        .join(F.broadcast(qdf))
        .select(key_col, "q", F.expr("_qv[_i]").alias("q_value"))
    )


def exact_corr(
    df: DataFrame, x_col: str, y_col: str, alias: str
) -> "DataFrame":
    """Exact distributed Pearson correlation of two INTEGER columns.

    Naive ``corr()`` accumulates float moments whose value depends on
    partition/merge order — unusable when results must be bit-stable
    across cluster sizes (or hash-checked against an oracle). Here the
    five moments (Σx, Σy, Σxy, Σx², Σy²) are exact DECIMAL(38,0) sums
    (order-insensitive), the numerator/denominator combine in exact
    decimal arithmetic, and only the final three values convert to
    double — via the ``big_to_double`` decomposition, correctly rounded
    on any IEEE engine — before one division and two sqrts in fixed
    order. One map-side-combined aggregation; no second pass over the
    data (the n·Σxy − Σx·Σy form needs no pre-computed means).
    """
    from .decimate import big_to_double

    # 19-digit inputs keep every product within Spark's DECIMAL(38)
    # cap (19+19+1 -> 38) so no silent precision loss can occur
    d = df.select(
        F.expr(f"CAST({x_col} AS DECIMAL(19,0))").alias("_x"),
        F.expr(f"CAST({y_col} AS DECIMAL(19,0))").alias("_y"),
    )
    m = d.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("_n"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum(F.expr("_x * _y")).alias("_sxy"),
        F.sum(F.expr("_x * _x")).alias("_sxx"),
        F.sum(F.expr("_y * _y")).alias("_syy"),
    )
    num = big_to_double("CAST(_n * _sxy - _sx * _sy AS DECIMAL(38,0))")
    dx = big_to_double("CAST(_n * _sxx - _sx * _sx AS DECIMAL(38,0))")
    dy = big_to_double("CAST(_n * _syy - _sy * _sy AS DECIMAL(38,0))")
    return m.select(
        F.expr(f"({num}) / (sqrt({dx}) * sqrt({dy}))").alias(alias)
    )


def sql_exact_corr(table: str, x_col: str, y_col: str, alias: str) -> str:
    """DuckDB mirror of :func:`exact_corr` (HUGEINT moments)."""
    from .decimate import big_to_double_duck

    num = big_to_double_duck("(n_ * sxy - sx * sy)")
    dx = big_to_double_duck("(n_ * sxx - sx * sx)")
    dy = big_to_double_duck("(n_ * syy - sy * sy)")
    return f"""
(SELECT ({num}) / (sqrt({dx}) * sqrt({dy})) AS {alias} FROM (
  SELECT CAST(count(*) AS HUGEINT) AS n_,
         sum(CAST({x_col} AS HUGEINT)) AS sx,
         sum(CAST({y_col} AS HUGEINT)) AS sy,
         sum(CAST({x_col} AS HUGEINT) * CAST({y_col} AS HUGEINT)) AS sxy,
         sum(CAST({x_col} AS HUGEINT) * CAST({x_col} AS HUGEINT)) AS sxx,
         sum(CAST({y_col} AS HUGEINT) * CAST({y_col} AS HUGEINT)) AS syy
  FROM {table}))
"""
