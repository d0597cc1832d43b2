"""JSON V1 sample rendering (C3/F6/S7).

Field layout per `JsonV1SampleSerializer.java:995-1174`, dispatch per
`ChannelAccessSampleValueAccess.serializeSampleToJsonV1:1614-1648`:

    {"time": <ns>, "severity": {"level": "OK|MINOR|MAJOR|INVALID",
     "hasValue": bool}, "status": "<label>", "quality":
     "Original|Interpolated", "type": "double|minMaxDouble|long|enum|string",
     "value": [..], ["minimum": m, "maximum": M,] ["metaData": {...}]}

Conventions pinned by the reference:
  * ``value`` is ALWAYS an array, even for scalars (`writeDoubleValue`).
  * aggregated samples render as ``minMaxDouble`` with ``value = [mean]``
    plus ``minimum``/``maximum``, quality ``Interpolated``
    (`ChannelAccessSampleValueAccess.java:238-318`).
  * ``disabled``/``disconnected`` markers render as ``string`` samples with
    value/status ``Archive_Disabled``/``Disconnected``, severity INVALID,
    ``hasValue`` false (`:1622-1643`).
  * severity code mapping 0/1/2/else -> OK/MINOR/MAJOR/INVALID (`:1694-1708`).

Spark-first: each type family is a plain column projection +
``to_json(struct(...))`` (JVM-side Jackson, null fields omitted), families
concatenated with ``unionByName`` — no Python in the row path. The JSON text
itself is produced by whole-stage-codegen'd expressions, so serializing a
100 TB scan is just one extra projection on top of the read.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: EPICS alarm-status labels by code (ChannelAccessAlarmStatus; the reference
#: stores the int16 code and renders the enum name, `:1611-1613`).
STATUS_LABELS = (
    "NO_ALARM", "READ", "WRITE", "HIHI", "HIGH", "LOLO", "LOW", "STATE",
    "COS", "COMM", "TIMEOUT", "HWLIMIT", "CALC", "SCAN", "LINK", "SOFT",
    "BAD_SUB", "UDF", "DISABLE", "SIMM", "READ_ACCESS", "WRITE_ACCESS",
)


def severity_level(col: Column) -> Column:
    """0/1/2/else -> OK/MINOR/MAJOR/INVALID (`ChannelAccessSampleValueAccess
    .java:1694-1708`)."""
    return (
        F.when(col == 0, "OK")
        .when(col == 1, "MINOR")
        .when(col == 2, "MAJOR")
        .otherwise("INVALID")
    )


def status_label(col: Column) -> Column:
    """int16 alarm-status code -> EPICS label; unknown codes render as the
    decimal code string (defensive; the reference would have thrown)."""
    expr: Column = col.cast("string")
    for code, label in reversed(list(enumerate(STATUS_LABELS))):
        expr = F.when(col == code, F.lit(label)).otherwise(expr)
    return expr


def _common(time: Column, sev_level: Column, has_value: Column, status: Column,
            quality: Column) -> list[Column]:
    return [
        time.alias("time"),
        F.struct(
            sev_level.alias("level"), has_value.alias("hasValue")
        ).alias("severity"),
        status.alias("status"),
        quality.alias("quality"),
    ]


def raw_double_to_json(df: DataFrame) -> DataFrame:
    """Raw numeric scalar rows (``t, v, severity, status, quality``) ->
    ``json`` (type ``double``, value-always-array)."""
    return df.select(
        "*",
        F.to_json(
            F.struct(
                *_common(
                    F.col("t"),
                    severity_level(F.col("severity")),
                    F.lit(True),
                    status_label(F.col("status")),
                    F.coalesce(F.col("quality"), F.lit("Original")),
                ),
                F.lit("double").alias("type"),
                F.array(F.col("v")).alias("value"),
            )
        ).alias("json"),
    )


def aggregated_to_json(df: DataFrame) -> DataFrame:
    """Aggregated rows (:func:`decimate` output) -> ``json`` — type
    ``minMaxDouble``, ``value = [mean]``, minimum/maximum, Interpolated."""
    return df.select(
        "*",
        F.to_json(
            F.struct(
                *_common(
                    F.col("t"),
                    severity_level(F.col("severity")),
                    F.lit(True),
                    status_label(F.col("status")),
                    F.coalesce(F.col("quality"), F.lit("Interpolated")),
                ),
                F.lit("minMaxDouble").alias("type"),
                F.array(F.col("mean")).alias("value"),
                F.col("vmin").alias("minimum"),
                F.col("vmax").alias("maximum"),
            )
        ).alias("json"),
    )


def string_to_json(df: DataFrame, value_col: str = "sval") -> DataFrame:
    """String-payload rows -> ``json`` (type ``string``)."""
    return df.select(
        "*",
        F.to_json(
            F.struct(
                *_common(
                    F.col("t"),
                    severity_level(F.col("severity")),
                    F.lit(True),
                    status_label(F.col("status")),
                    F.coalesce(F.col("quality"), F.lit("Original")),
                ),
                F.lit("string").alias("type"),
                F.array(F.col(value_col)).alias("value"),
            )
        ).alias("json"),
    )


def marker_to_json(df: DataFrame, type_col: str = "type") -> DataFrame:
    """disabled/disconnected marker rows -> ``json``: string sample with
    fixed payload, severity INVALID, hasValue false (`:1622-1643`)."""
    label = F.when(
        F.col(type_col) == "disabled", F.lit("Archive_Disabled")
    ).otherwise(F.lit("Disconnected"))
    return df.select(
        "*",
        F.to_json(
            F.struct(
                *_common(
                    F.col("t"),
                    F.lit("INVALID"),
                    F.lit(False),
                    label,
                    F.coalesce(F.col("quality"), F.lit("Original")),
                ),
                F.lit("string").alias("type"),
                F.array(label).alias("value"),
            )
        ).alias("json"),
    )


def mixed_decimated_to_json(df: DataFrame) -> DataFrame:
    """:func:`decimate_mixed` output (tagged union) -> one ``json`` column.

    Families are split, serialized with their own field set, and re-unioned —
    the JSON layout varies by type (minimum/maximum only for aggregated), so
    one per-family projection each is the declarative way to express the
    reference's instanceof dispatch (`:1614-1648`).
    """
    agg = df.filter(F.col("type").startswith("aggregated_"))
    mark = df.filter(F.col("type").isin("disabled", "disconnected"))
    str_ = df.filter(
        ~F.col("type").startswith("aggregated_")
        & ~F.col("type").isin("disabled", "disconnected")
    )
    cols = [*df.columns, "json"]
    out = aggregated_to_json(agg).select(cols)
    out = out.unionByName(marker_to_json(mark).select(cols))
    out = out.unionByName(string_to_json(str_).select(cols))
    return out
