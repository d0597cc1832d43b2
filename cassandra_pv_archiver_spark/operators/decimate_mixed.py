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
    VMAX_SQL,
    VMIN_SQL,
    _extrema_aggs,
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
    missing = [
        f"CAST(NULL AS {typ}) AS {c}"
        for c, typ in OPTIONAL_PAYLOADS.items()
        if c not in df.columns
    ]
    if missing:
        df = df.selectExpr("*", *missing)
    d = explode_validity_windows(df, period_ns, key=key,
                                 max_gap_windows=max_gap_windows,
                                 skew_safe=skew_safe)
    vs = 10**v_decimals
    agg_list = ", ".join(f"'{x}'" for x in AGGREGATABLE_TYPES)
    marker_list = ", ".join(f"'{x}'" for x in MARKER_TYPES)
    d = d.selectExpr(
        "*",
        f"CAST(floor(v * {vs} + 0.5) AS BIGINT) AS _vi",
        f"type IN ({agg_list}) AS is_agg",
        f"type IN ({marker_list}) AS is_marker",
    )

    # --- stage 1: one row per (channel, win, type) = the sub-aggregator ---
    g1 = d.groupBy(key, "win", "type").agg(
        F.expr("first(is_agg) AS is_agg"),
        F.expr("first(is_marker) AS is_marker"),
        F.expr("sum(ws_ns) AS cov"),
        F.expr("sum(CAST(ws_ns AS DECIMAL(38,0)) * _vi) AS _swv"),
        F.expr("sum(CAST(ws_ns AS DECIMAL(38,0)) * _vi * _vi) AS _swv2"),
        # Math.min/Math.max-faithful extrema, shared with decimate —
        # signed-zero ties deterministic, NaN propagating (the native
        # min/max keep the FIRST of a {-0.0,+0.0} tie, i.e. are
        # partition-order-dependent)
        *_extrema_aggs("v", "v"),
        _severity_agg(),  # A2: shared with decimate — ONE tie-break rule
        F.expr(
            "min_by(named_struct('sval', sval, 'aval', aval, 'eval', eval,"
            " 'labels', labels, 'asval', asval, 'meta', meta,"
            " 'severity', severity, 'status', status), clip)"
            " AS _first_sample"
        ),
        F.expr("min(clip) AS first_clip"),
        F.expr("count(1) AS n_samples"),
    )
    # cov <= period_ns < 2^53: exact in double on any engine. The big
    # moment sums exceed 2^53 — use the exact decomposition so Spark and the
    # DuckDB oracle produce bit-identical doubles (see big_to_double docs).
    swd = "CAST(cov AS DOUBLE)"
    mean = f"({big_to_double('_swv')} / {swd} / CAST({vs} AS DOUBLE))"
    var = (
        f"({big_to_double('_swv2')} / {swd} / CAST({vs * vs} AS DOUBLE)"
        f" - {mean} * {mean})"
    )
    g1 = g1.selectExpr(
        key,
        "win",
        "named_struct("
        "'type', type, 'is_agg', is_agg, 'cov', cov,"
        f" 'mean', CASE WHEN is_agg THEN {mean} END,"
        f" 'std', CASE WHEN is_agg THEN sqrt(greatest({var}, 0.0D)) END,"
        f" 'vmin', {VMIN_SQL}, 'vmax', {VMAX_SQL},"
        f" 'covered_fraction', CASE WHEN is_agg THEN"
        f" {swd} / 1.0E9 / CAST({period_s} AS DOUBLE) END,"
        " 'agg_severity', _sevpick.severity,"
        " 'agg_status', _sevpick.status,"
        " 'pf_sval', _first_sample.sval, 'pf_aval', _first_sample.aval,"
        " 'pf_eval', _first_sample.eval,"
        " 'pf_labels', _first_sample.labels,"
        " 'pf_asval', _first_sample.asval, 'pf_meta', _first_sample.meta,"
        " 'pf_severity', _first_sample.severity,"
        " 'pf_status', _first_sample.status,"
        " 'n_samples', n_samples, 'first_clip', first_clip) AS S",
        "is_agg",
        "is_marker",
        "cov",
        "first_clip",
    )

    # --- stage 2: winner per (channel, win) ---
    g2 = g1.groupBy(key, "win").agg(
        F.expr("min_by(S, first_clip) AS first_row"),
        F.expr(
            "max_by(S, named_struct('c', cov, 'nc', -first_clip))"
            " FILTER (WHERE is_agg) AS best_row"
        ),
        F.expr(
            "max(CASE WHEN (NOT is_agg) AND (NOT is_marker)"
            " THEN 1 ELSE 0 END) AS veto"
        ),
    )
    g2 = g2.selectExpr(
        key,
        "win",
        "CASE WHEN veto = 1 OR best_row IS NULL"
        " THEN first_row ELSE best_row END AS C",
    )

    return g2.selectExpr(
        key,
        f"win * {period_ns} AS t",
        "CASE WHEN C.is_agg AND startswith(C.type, 'scalar_')"
        " THEN concat('aggregated_', C.type) ELSE C.type END AS type",
        "C.mean AS mean",
        "C.std AS std",
        "CASE WHEN C.is_agg THEN C.vmin END AS vmin",
        "CASE WHEN C.is_agg THEN C.vmax END AS vmax",
        "C.covered_fraction AS covered_fraction",
        "CASE WHEN NOT C.is_agg THEN C.pf_sval END AS sval",
        "CASE WHEN NOT C.is_agg THEN C.pf_aval END AS aval",
        "CASE WHEN NOT C.is_agg THEN C.pf_eval END AS eval",
        "CASE WHEN NOT C.is_agg THEN C.pf_labels END AS labels",
        "CASE WHEN NOT C.is_agg THEN C.pf_asval END AS asval",
        # metadata of the first used sample of the winning type — both for
        # aggregated winners (metaDataSample semantics) and pick-first
        "C.pf_meta AS meta",
        "CASE WHEN C.is_agg THEN C.agg_severity"
        " ELSE C.pf_severity END AS severity",
        "CASE WHEN C.is_agg THEN C.agg_status"
        " ELSE C.pf_status END AS status",
        "C.n_samples AS n_samples",
        "'Interpolated' AS quality",
    )
