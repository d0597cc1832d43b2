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
    decimal code string (defensive; the reference would have thrown).
    One O(1) array lookup — a 22-level CASE chain bloats every codegen'd
    family projection for the same mapping."""
    labels = F.array(*[F.lit(s) for s in STATUS_LABELS])
    return F.when(
        col.between(0, len(STATUS_LABELS) - 1),
        F.element_at(labels, col.cast("int") + 1),
    ).otherwise(col.cast("string"))


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


#: integer sample families render with precision forced to 0
#: (`ChannelAccessSampleValueAccess.java:247,286,299,349,382,393`)
_INT_FAMILIES = ("char", "short", "long")


def numeric_metadata(meta: Column, precision_zero: bool = False) -> Column:
    """``metaData`` block for numeric render types
    (`JsonV1SampleSerializer.java:1084-1100`): type/precision/units +
    display/warn/alarm limits. Null when the sample carries no metadata
    (field then omitted by ``to_json``)."""
    prec = (
        F.lit(0) if precision_zero else F.coalesce(meta["precision"], F.lit(0))
    )
    return F.when(
        meta.isNotNull(),
        F.struct(
            F.lit("numeric").alias("type"),
            prec.alias("precision"),
            meta["units"].alias("units"),
            meta["lower_display_limit"].alias("displayLow"),
            meta["upper_display_limit"].alias("displayHigh"),
            meta["lower_warning_limit"].alias("warnLow"),
            meta["upper_warning_limit"].alias("warnHigh"),
            meta["lower_alarm_limit"].alias("alarmLow"),
            meta["upper_alarm_limit"].alias("alarmHigh"),
        ),
    )


def enum_metadata(labels: Column) -> Column:
    """``metaData`` block for enum render types
    (`JsonV1SampleSerializer.java:1024-1036`): type + states."""
    return F.when(
        labels.isNotNull(),
        F.struct(F.lit("enum").alias("type"), labels.alias("states")),
    )


def raw_double_to_json(df: DataFrame, value: Column | None = None) -> DataFrame:
    """Raw double-family rows (scalar ``v`` or array payload via ``value``)
    -> ``json`` (type ``double``, value-always-array), plus the numeric
    ``metaData`` block when the row carries display metadata
    (`ChannelAccessSampleValueAccess.java:421-426,469-473,487-491`)."""
    if value is None:
        value = F.array(F.col("v"))
    extra = (
        [numeric_metadata(F.col("meta")).alias("metaData")]
        if "meta" in df.columns
        else []
    )
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
                value.alias("value"),
                *extra,
            )
        ).alias("json"),
    )


def aggregated_to_json(df: DataFrame) -> DataFrame:
    """Aggregated rows (:func:`decimate` output) -> ``json`` — type
    ``minMaxDouble``, ``value = [mean]``, minimum/maximum, Interpolated,
    plus the numeric ``metaData`` block when the row carries display
    metadata (`ChannelAccessSampleValueAccess.java:238-316`; precision is
    forced to 0 for integer source families, `:247,286,299`)."""
    extra = []
    if "meta" in df.columns:
        prec_zero = (
            F.coalesce(F.col("type"), F.lit("")).rlike(
                "_(" + "|".join(_INT_FAMILIES) + ")$"
            )
            if "type" in df.columns
            else F.lit(False)
        )
        meta_num = F.when(
            prec_zero, numeric_metadata(F.col("meta"), precision_zero=True)
        ).otherwise(numeric_metadata(F.col("meta")))
        extra = [meta_num.alias("metaData")]
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
                *extra,
            )
        ).alias("json"),
    )


def long_to_json(
    df: DataFrame, value: Column | None = None, meta_col: str = "meta"
) -> DataFrame:
    """Long-family rows (char/short/long scalars and arrays) -> ``json``
    (type ``long``, `JsonV1SampleSerializer.java:1058-1076`), numeric
    ``metaData`` with precision 0 (`ChannelAccessSampleValueAccess.java:
    382-400,414-419,444-456,463-467,493-504`)."""
    if value is None:
        value = F.array(F.col("v").cast("long"))
    extra = (
        [numeric_metadata(F.col(meta_col), precision_zero=True).alias("metaData")]
        if meta_col in df.columns
        else []
    )
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
                F.lit("long").alias("type"),
                value.alias("value"),
                *extra,
            )
        ).alias("json"),
    )


def enum_to_json(
    df: DataFrame, value: Column | None = None, labels_col: str = "labels"
) -> DataFrame:
    """Enum rows (scalar index or index array + labels) -> ``json`` (type
    ``enum`` with the states ``metaData`` block,
    `JsonV1SampleSerializer.java:1024-1056`,
    `ChannelAccessSampleValueAccess.java:428-436,475-486`)."""
    if value is None:
        value = F.array(F.col("eval").cast("long"))
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
                F.lit("enum").alias("type"),
                value.alias("value"),
                enum_metadata(F.col(labels_col)).alias("metaData"),
            )
        ).alias("json"),
    )


def string_to_json(df: DataFrame, value_col: str = "sval") -> DataFrame:
    """String-payload rows -> ``json`` (type ``string``); ``value_col`` may
    be a scalar string (wrapped) or an array of strings (rendered as-is,
    `JsonV1SampleSerializer.java:1154-1163`)."""
    dt = dict(df.dtypes).get(value_col, "string")
    value = (
        F.col(value_col) if dt.startswith("array") else F.array(F.col(value_col))
    )
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
                value.alias("value"),
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


def render_columns(df: DataFrame, raw: bool = False) -> DataFrame:
    """Pre-serialization projection of the V1 layout: every field the
    serializer writes, as typed engine-portable columns (the driver's
    oracle hashes these; the byte-exact JSON string is pinned by golden
    tests because float-to-text rendering differs across engines).

    Input: :func:`decimate_mixed` output (full tagged union), or a RAW
    tagged-union series (``raw=True``: has ``v`` instead of
    mean/vmin/vmax, default quality Original — the reference's raw-sample
    serialization path, `ChannelAccessSampleValueAccess.java:318-514`).
    Output one row per sample with: render type, severity level +
    hasValue, status label, quality, the value in its natural slot
    (``value_num`` double / ``value_long`` / ``value_str`` /
    ``value_arr`` joined string), minimum/maximum for aggregated rows,
    and the flattened ``metaData`` block (numeric or enum states)."""
    t = F.col("type")
    is_agg = F.lit(False) if raw else t.startswith("aggregated_")
    is_marker = t.isin("disabled", "disconnected")
    is_enum = t.isin("scalar_enum", "array_enum")
    is_dbl = t.isin("scalar_double", "scalar_float", "array_double", "array_float")
    is_long = t.isin(
        "scalar_char", "scalar_short", "scalar_long",
        "array_char", "array_short", "array_long",
    )
    int_fam = t.rlike("_(" + "|".join(_INT_FAMILIES) + ")$")
    marker_label = F.when(t == "disabled", F.lit("Archive_Disabled")).otherwise(
        F.lit("Disconnected")
    )
    rtype = (
        F.when(is_agg, F.lit("minMaxDouble"))
        .when(is_enum, F.lit("enum"))
        .when(is_dbl, F.lit("double"))
        .when(is_long, F.lit("long"))
        .otherwise(F.lit("string"))
    )
    meta = F.col("meta")
    has_meta = meta.isNotNull() & (is_agg | is_dbl | is_long)
    arr_long = F.expr("transform(aval, x -> CAST(x AS LONG))")
    return df.select(
        "channel",
        "t",
        rtype.alias("rtype"),
        F.when(is_marker, F.lit("INVALID"))
        .otherwise(severity_level(F.col("severity")))
        .alias("level"),
        (~is_marker).alias("has_value"),
        F.when(is_marker, marker_label)
        .otherwise(status_label(F.col("status")))
        .alias("status"),
        (
            F.lit("Original")
            if raw
            else F.coalesce(F.col("quality"), F.lit("Original"))
        ).alias("quality"),
        # raw series carry scalar numerics in v; decimated output never
        # does (scalar numerics are aggregatable, so they always surface
        # as aggregated_* with the mean)
        (
            F.when(t.isin("scalar_double", "scalar_float"), F.col("v"))
            if raw
            else F.when(is_agg, F.col("mean"))
        ).alias("value_num"),
        (
            F.when(
                t.isin("scalar_char", "scalar_short", "scalar_long"),
                F.col("v").cast("long"),
            ).when(t == "scalar_enum", F.col("eval").cast("long"))
            if raw
            else F.when(t == "scalar_enum", F.col("eval").cast("long"))
        ).alias("value_long"),
        F.when(is_marker, marker_label)
        .when(t == "scalar_string", F.col("sval"))
        .alias("value_str"),
        F.when(t.isin("array_double", "array_float"),
               F.concat_ws(",", F.col("aval")))
        .when(t.isin("array_char", "array_short", "array_long", "array_enum"),
              F.concat_ws(",", arr_long))
        .when(t == "array_string", F.concat_ws(",", F.col("asval")))
        .alias("value_arr"),
        (
            F.lit(None).cast("double") if raw else F.when(is_agg, F.col("vmin"))
        ).alias("minimum"),
        (
            F.lit(None).cast("double") if raw else F.when(is_agg, F.col("vmax"))
        ).alias("maximum"),
        # enum metaData exists only when labels do — enum_to_json omits
        # the metaData block for null labels, and this projection (the
        # oracle surface) must state the same fact
        F.when(is_enum & F.col("labels").isNotNull(), F.lit("enum"))
        .when(has_meta, F.lit("numeric"))
        .alias("meta_type"),
        F.when(has_meta & int_fam, F.lit(0))
        .when(has_meta, F.coalesce(meta["precision"], F.lit(0)))
        .alias("meta_precision"),
        F.when(has_meta, meta["units"]).alias("meta_units"),
        F.when(has_meta, meta["lower_display_limit"]).alias("meta_disp_lo"),
        F.when(has_meta, meta["upper_display_limit"]).alias("meta_disp_hi"),
        F.when(has_meta, meta["lower_warning_limit"]).alias("meta_warn_lo"),
        F.when(has_meta, meta["upper_warning_limit"]).alias("meta_warn_hi"),
        F.when(has_meta, meta["lower_alarm_limit"]).alias("meta_alarm_lo"),
        F.when(has_meta, meta["upper_alarm_limit"]).alias("meta_alarm_hi"),
        F.when(
            is_enum & F.col("labels").isNotNull(),
            F.concat_ws(",", F.col("labels")),
        ).alias("meta_states"),
    )


def mixed_decimated_to_json(df: DataFrame) -> DataFrame:
    """:func:`decimate_mixed` output (tagged union) -> one ``json`` column.

    Families are split, serialized with their own field set, and re-unioned —
    the JSON layout varies by type (minimum/maximum only for aggregated,
    metaData by family), so one per-family projection each is the
    declarative way to express the reference's instanceof dispatch
    (`ChannelAccessSampleValueAccess.java:413-514,1614-1648`):

      aggregated_*              -> minMaxDouble (+ numeric metaData)
      disabled / disconnected   -> string marker
      scalar_enum / array_enum  -> enum (+ states metaData)
      scalar/array double,float -> double (+ numeric metaData)
      scalar/array char..long   -> long (+ numeric metaData, precision 0)
      scalar_string             -> string
      array_string              -> string (value = the array)
    """
    t = F.col("type")
    has_full_union = "eval" in df.columns
    cols = [*df.columns, "json"]
    agg = df.filter(t.startswith("aggregated_"))
    mark = df.filter(t.isin("disabled", "disconnected"))
    out = aggregated_to_json(agg).select(cols)
    out = out.unionByName(marker_to_json(mark).select(cols))
    if not has_full_union:
        rest = df.filter(
            ~t.startswith("aggregated_") & ~t.isin("disabled", "disconnected")
        )
        return out.unionByName(string_to_json(rest).select(cols))
    # scalar numeric raw types (scalar_double/float/char/short/long) never
    # appear in decimated output — they are aggregatable, so they always
    # surface as aggregated_* (handled above); only the non-aggregatable
    # pick-first survivors need raw renderers here
    enum_scalar = df.filter(t == "scalar_enum")
    enum_arr = df.filter(t == "array_enum")
    dbl_arr = df.filter(t.isin("array_double", "array_float"))
    long_arr = df.filter(t.isin("array_char", "array_short", "array_long"))
    str_scalar = df.filter(t == "scalar_string")
    str_arr = df.filter(t == "array_string")
    out = out.unionByName(enum_to_json(enum_scalar).select(cols))
    out = out.unionByName(
        enum_to_json(
            enum_arr, value=F.expr("transform(aval, x -> CAST(x AS LONG))")
        ).select(cols)
    )
    out = out.unionByName(
        raw_double_to_json(dbl_arr, value=F.col("aval")).select(cols)
    )
    out = out.unionByName(
        long_to_json(
            long_arr, value=F.expr("transform(aval, x -> CAST(x AS LONG))")
        ).select(cols)
    )
    out = out.unionByName(string_to_json(str_scalar).select(cols))
    out = out.unionByName(
        string_to_json(str_arr, value_col="asval").select(cols)
    )
    # residual branch: a type tag matching NO family above (a raw scalar
    # numeric leaking into decimated output, a future/misspelled tag) must
    # not silently vanish — render it through the string fallback, the
    # same catch-all convention the non-full-union branch uses
    residual = df.filter(
        ~t.startswith("aggregated_")
        & ~t.isin(
            "disabled", "disconnected", "scalar_enum", "array_enum",
            "array_double", "array_float", "array_char", "array_short",
            "array_long", "scalar_string", "array_string",
        )
    )
    return out.unionByName(string_to_json(residual).select(cols))
