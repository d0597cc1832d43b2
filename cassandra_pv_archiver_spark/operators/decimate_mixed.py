"""A6: mixed-type interval resolution — decimation of a tagged-union series.

Reference (`ChannelAccessSampleDecimator.java:124-296`): within one target
interval the decimator keeps one sub-aggregator per sample *type*; at interval
close it picks a winner:

  * exactly one type present -> that type's output;
  * any non-aggregatable, non-marker type present -> the type of the FIRST
    processed sample wins (pick-first semantics if that type is itself
    non-aggregatable);
  * otherwise (all aggregatable, markers allowed) -> the aggregatable type
    with the longest covered period; the presence of ``disabled`` /
    ``disconnected`` markers never vetoes aggregation
    (`ChannelAccessSampleDecimator.java:137-186`);
  * only markers present -> first type (a re-stamped marker).

Spark-first formulation: two cascaded aggregations, no window sorts, no
Python in the row path.

  stage 1  groupBy(channel, win, type)  -- per-type sub-aggregator state:
           covered period Σw, exact-integer weighted moments (A1), extrema,
           severity pick (A2), pick-first payload (A5: min_by(payload, clip)).
  stage 2  groupBy(channel, win)        -- winner selection as three
           aggregates over the per-type rows: ``min_by(S, first_clip)``
           (first processed type), ``max_by(S, (cov, -first_clip)) FILTER
           (WHERE is_agg)`` (longest-covered aggregatable), and a veto flag.

Both stages are hash aggregations with map-side partial combine on the same
``channel`` clustering — at 100 TB the plan is scan -> one shuffle ->
two pipelined aggs, identical shape to plain :func:`decimate`.

Input schema: ``channel string, t long (ns), type string, v double|null,
sval string|null, severity int|null, status int|null`` — exactly one payload
family non-null per row (the §1.3 sparse tagged union flattened to two
payload columns: numeric ``v`` for the 5+5 aggregatable types, ``sval`` for
everything else; markers carry neither).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .decimate import (
    AGGREGATABLE_TYPES,
    MARKER_TYPES,
    NS,
    _extrema_aggs,
    _extrema_cols,
    _severity_agg,
    big_to_double,
    explode_validity_windows,
)

#: Numeric display metadata carried per raw sample and propagated to
#: aggregated samples from the FIRST used source sample
#: (`ChannelAccessSampleValueAccess.java:98-132`,
#: `ChannelAccessSampleDecimatorTest.java:700-757`).
METADATA_SCHEMA = (
    "struct<precision:int,units:string,"
    "lower_warning_limit:double,upper_warning_limit:double,"
    "lower_alarm_limit:double,upper_alarm_limit:double,"
    "lower_display_limit:double,upper_display_limit:double,"
    "lower_control_limit:double,upper_control_limit:double>"
)

#: Optional payload slots of the full tagged union
#: (`ChannelAccessSampleType.java:18-129` -> §1.3 sparse columns): numeric
#: arrays (``aval``, family in the type tag), enum index + labels, string
#: arrays, display metadata. Added as typed nulls when a caller's input
#: predates the full union.
OPTIONAL_PAYLOADS = {
    "aval": "array<double>",
    "eval": "int",
    "labels": "array<string>",
    "asval": "array<string>",
    "meta": METADATA_SCHEMA,
}


def decimate_mixed(
    df: DataFrame,
    period_s: int,
    key: str = "channel",
    v_decimals: int = 2,
    max_gap_windows: int | None = None,
    skew_safe: bool | str = False,
) -> DataFrame:
    """Mixed-type hold-forward decimation (A6 + A1/A2/A3/A5/W1/W2).

    Output: ``channel, t, type, mean, std, vmin, vmax, covered_fraction,
    sval, severity, status, n_samples, quality`` — aggregated columns are
    null for pick-first winners and vice versa; ``type`` is the output type
    (``scalar_X`` -> ``aggregated_scalar_X`` when aggregated, cf.
    `ScalarDoubleAggregator.java:61-71`).
    """
    period_ns = period_s * NS
    for c, typ in OPTIONAL_PAYLOADS.items():
        if c not in df.columns:
            df = df.withColumn(c, F.lit(None).cast(typ))
    d = explode_validity_windows(df, period_ns, key=key,
                                 max_gap_windows=max_gap_windows,
                                 skew_safe=skew_safe)
    vs = 10**v_decimals
    agg_list = ", ".join(f"'{x}'" for x in AGGREGATABLE_TYPES)
    marker_list = ", ".join(f"'{x}'" for x in MARKER_TYPES)
    d = (
        d.withColumn("_vi", F.expr(f"CAST(floor(v * {vs} + 0.5) AS BIGINT)"))
        .withColumn("is_agg", F.expr(f"type IN ({agg_list})"))
        .withColumn("is_marker", F.expr(f"type IN ({marker_list})"))
    )

    # --- stage 1: one row per (channel, win, type) = the sub-aggregator ---
    sw = F.sum("ws_ns")
    swv = F.sum(F.expr("CAST(ws_ns AS DECIMAL(38,0)) * _vi"))
    swv2 = F.sum(F.expr("CAST(ws_ns AS DECIMAL(38,0)) * _vi * _vi"))
    g1 = d.groupBy(key, "win", "type").agg(
        F.first("is_agg").alias("is_agg"),
        F.first("is_marker").alias("is_marker"),
        sw.alias("cov"),
        swv.alias("_swv"),
        swv2.alias("_swv2"),
        # Math.min/Math.max-faithful extrema, shared with decimate —
        # signed-zero ties deterministic, NaN propagating (the native
        # F.min/F.max keep the FIRST of a {-0.0,+0.0} tie, i.e. are
        # partition-order-dependent)
        *_extrema_aggs("v", "v"),
        _severity_agg(),  # A2: shared with decimate — ONE tie-break rule
        F.expr(
            "min_by(named_struct('sval', sval, 'aval', aval, 'eval', eval,"
            " 'labels', labels, 'asval', asval, 'meta', meta,"
            " 'severity', severity, 'status', status), clip)"
        ).alias("_first_sample"),
        F.min("clip").alias("first_clip"),
        F.count(F.lit(1)).alias("n_samples"),
    )
    # cov <= period_ns < 2^53: exact in double on any engine. The big
    # moment sums exceed 2^53 — use the exact decomposition so Spark and the
    # DuckDB oracle produce bit-identical doubles (see big_to_double docs).
    swd = F.col("cov").cast("double")
    mean = F.expr(big_to_double("_swv")) / swd / F.lit(float(vs))
    var = F.expr(big_to_double("_swv2")) / swd / F.lit(float(vs * vs)) - mean * mean
    vmin_c, vmax_c = _extrema_cols()
    g1 = g1.select(
        key,
        "win",
        F.struct(
            F.col("type"),
            F.col("is_agg"),
            F.col("cov"),
            F.when(F.col("is_agg"), mean).alias("mean"),
            F.when(F.col("is_agg"), F.sqrt(F.greatest(var, F.lit(0.0)))).alias("std"),
            vmin_c,
            vmax_c,
            F.when(
                F.col("is_agg"),
                swd / F.lit(1e9) / F.lit(float(period_s)),
            ).alias("covered_fraction"),
            F.col("_sevpick.severity").alias("agg_severity"),
            F.col("_sevpick.status").alias("agg_status"),
            F.col("_first_sample.sval").alias("pf_sval"),
            F.col("_first_sample.aval").alias("pf_aval"),
            F.col("_first_sample.eval").alias("pf_eval"),
            F.col("_first_sample.labels").alias("pf_labels"),
            F.col("_first_sample.asval").alias("pf_asval"),
            F.col("_first_sample.meta").alias("pf_meta"),
            F.col("_first_sample.severity").alias("pf_severity"),
            F.col("_first_sample.status").alias("pf_status"),
            F.col("n_samples"),
            F.col("first_clip"),
        ).alias("S"),
        F.col("is_agg"),
        F.col("is_marker"),
        F.col("cov"),
        F.col("first_clip"),
    )

    # --- stage 2: winner per (channel, win) ---
    g2 = g1.groupBy(key, "win").agg(
        F.expr("min_by(S, first_clip)").alias("first_row"),
        F.expr(
            "max_by(S, named_struct('c', cov, 'nc', -first_clip))"
            " FILTER (WHERE is_agg)"
        ).alias("best_row"),
        F.max(
            F.when(~F.col("is_agg") & ~F.col("is_marker"), F.lit(1)).otherwise(0)
        ).alias("veto"),
    )
    chosen = F.when(
        (F.col("veto") == 1) | F.col("best_row").isNull(), F.col("first_row")
    ).otherwise(F.col("best_row"))
    g2 = g2.select(key, "win", chosen.alias("C"))

    out_type = F.when(
        F.col("C.is_agg") & F.col("C.type").startswith("scalar_"),
        F.concat(F.lit("aggregated_"), F.col("C.type")),
    ).otherwise(F.col("C.type"))
    return g2.select(
        F.col(key),
        (F.col("win") * F.lit(period_ns)).alias("t"),
        out_type.alias("type"),
        F.col("C.mean").alias("mean"),
        F.col("C.std").alias("std"),
        F.when(F.col("C.is_agg"), F.col("C.vmin")).alias("vmin"),
        F.when(F.col("C.is_agg"), F.col("C.vmax")).alias("vmax"),
        F.col("C.covered_fraction").alias("covered_fraction"),
        F.when(~F.col("C.is_agg"), F.col("C.pf_sval")).alias("sval"),
        F.when(~F.col("C.is_agg"), F.col("C.pf_aval")).alias("aval"),
        F.when(~F.col("C.is_agg"), F.col("C.pf_eval")).alias("eval"),
        F.when(~F.col("C.is_agg"), F.col("C.pf_labels")).alias("labels"),
        F.when(~F.col("C.is_agg"), F.col("C.pf_asval")).alias("asval"),
        # metadata of the first used sample of the winning type — both for
        # aggregated winners (metaDataSample semantics) and pick-first
        F.col("C.pf_meta").alias("meta"),
        F.when(F.col("C.is_agg"), F.col("C.agg_severity"))
        .otherwise(F.col("C.pf_severity"))
        .alias("severity"),
        F.when(F.col("C.is_agg"), F.col("C.agg_status"))
        .otherwise(F.col("C.pf_status"))
        .alias("status"),
        F.col("C.n_samples").alias("n_samples"),
        F.lit("Interpolated").alias("quality"),
    )
