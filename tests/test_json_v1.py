"""JSON V1 serialization golden tests.

Expected strings are hand-built from the reference's field layout
(`JsonV1SampleSerializer.java:995-1174`: time, severity{level,hasValue},
status, quality, type, value[, minimum, maximum]) — the same strategy as
`JsonV1SampleSerializerTest.java`.
"""

from __future__ import annotations

import json

from cassandra_pv_archiver_spark.functions.json_v1 import (
    aggregated_to_json,
    marker_to_json,
    mixed_decimated_to_json,
    raw_double_to_json,
    string_to_json,
)

T = 123_456_789_000_000_000


def _j(df):
    return [r.json for r in df.collect()]


def test_raw_double_layout(spark):
    df = spark.createDataFrame(
        [("X", T, 10.5, 0, 0, "Original")],
        "channel string, t long, v double, severity int, status int, quality string",
    )
    (out,) = _j(raw_double_to_json(df))
    assert out == (
        '{"time":123456789000000000,'
        '"severity":{"level":"OK","hasValue":true},'
        '"status":"NO_ALARM","quality":"Original",'
        '"type":"double","value":[10.5]}'
    )


def test_aggregated_min_max_double(spark):
    df = spark.createDataFrame(
        [("X", T, 20.0, -64.0, 95.0, 3, 9, "Interpolated")],
        "channel string, t long, mean double, vmin double, vmax double,"
        " severity int, status int, quality string",
    )
    (out,) = _j(aggregated_to_json(df))
    assert out == (
        '{"time":123456789000000000,'
        '"severity":{"level":"INVALID","hasValue":true},'
        '"status":"COMM","quality":"Interpolated",'
        '"type":"minMaxDouble","value":[20.0],'
        '"minimum":-64.0,"maximum":95.0}'
    )


def test_marker_samples(spark):
    df = spark.createDataFrame(
        [("X", T, "disconnected", "Original"), ("X", T + 1, "disabled", "Original")],
        "channel string, t long, type string, quality string",
    )
    a, b = _j(marker_to_json(df))
    assert a == (
        '{"time":123456789000000000,'
        '"severity":{"level":"INVALID","hasValue":false},'
        '"status":"Disconnected","quality":"Original",'
        '"type":"string","value":["Disconnected"]}'
    )
    assert json.loads(b)["value"] == ["Archive_Disabled"]
    assert json.loads(b)["status"] == "Archive_Disabled"


def test_string_sample_severity_labels(spark):
    df = spark.createDataFrame(
        [("X", T, "hello", 1, 7, "Original")],
        "channel string, t long, sval string, severity int, status int, quality string",
    )
    (out,) = _j(string_to_json(df))
    d = json.loads(out)
    assert d["severity"] == {"level": "MINOR", "hasValue": True}
    assert d["status"] == "STATE"
    assert d["type"] == "string"
    assert d["value"] == ["hello"]


def test_mixed_dispatch_roundtrip(spark):
    df = spark.createDataFrame(
        [
            ("X", T, "aggregated_scalar_double", 1.5, 0.1, 1.0, 2.0, 0.9,
             None, 0, 0, 4, "Interpolated"),
            ("X", T + 1, "scalar_string", None, None, None, None, None,
             "s1", 2, 3, 1, "Interpolated"),
            ("X", T + 2, "disconnected", None, None, None, None, None,
             None, None, None, 1, "Interpolated"),
        ],
        "channel string, t long, type string, mean double, std double,"
        " vmin double, vmax double, covered_fraction double, sval string,"
        " severity int, status int, n_samples long, quality string",
    )
    out = {r.t: json.loads(r.json) for r in mixed_decimated_to_json(df).collect()}
    assert out[T]["type"] == "minMaxDouble" and out[T]["value"] == [1.5]
    assert out[T]["minimum"] == 1.0 and out[T]["maximum"] == 2.0
    assert out[T + 1]["type"] == "string" and out[T + 1]["value"] == ["s1"]
    assert out[T + 1]["severity"]["level"] == "MAJOR"
    assert out[T + 1]["status"] == "HIHI"
    assert out[T + 2]["value"] == ["Disconnected"]
    assert out[T + 2]["severity"] == {"level": "INVALID", "hasValue": False}


META = (2, "volts", -10.0, 10.0, -20.0, 20.0, -30.0, 30.0, -30.0, 30.0)
META_SCHEMA = (
    " meta struct<precision:int,units:string,"
    "lower_warning_limit:double,upper_warning_limit:double,"
    "lower_alarm_limit:double,upper_alarm_limit:double,"
    "lower_display_limit:double,upper_display_limit:double,"
    "lower_control_limit:double,upper_control_limit:double>"
)


def test_enum_sample_layout(spark):
    # `JsonV1SampleSerializer.java:1024-1056`: type enum, value-array of
    # indexes, metaData {type: enum, states: labels}
    from cassandra_pv_archiver_spark.functions.json_v1 import enum_to_json

    df = spark.createDataFrame(
        [("X", T, 2, ["Yes", "No", "Maybe"], 1, 7, "Original")],
        "channel string, t long, eval int, labels array<string>,"
        " severity int, status int, quality string",
    )
    (out,) = _j(enum_to_json(df))
    assert out == (
        '{"time":123456789000000000,'
        '"severity":{"level":"MINOR","hasValue":true},'
        '"status":"STATE","quality":"Original",'
        '"type":"enum","value":[2],'
        '"metaData":{"type":"enum","states":["Yes","No","Maybe"]}}'
    )


def test_long_sample_with_numeric_metadata(spark):
    # `JsonV1SampleSerializer.java:1058-1100`: type long; numeric metaData
    # with precision forced to 0 for integer families
    from cassandra_pv_archiver_spark.functions.json_v1 import long_to_json

    df = spark.createDataFrame(
        [("X", T, 42.0, META, 0, 0, "Original")],
        "channel string, t long, v double," + META_SCHEMA +
        ", severity int, status int, quality string",
    )
    (out,) = _j(long_to_json(df))
    d = json.loads(out)
    assert d["type"] == "long" and d["value"] == [42]
    assert d["metaData"] == {
        "type": "numeric", "precision": 0, "units": "volts",
        "displayLow": -30.0, "displayHigh": 30.0,
        "warnLow": -10.0, "warnHigh": 10.0,
        "alarmLow": -20.0, "alarmHigh": 20.0,
    }
    # field order inside metaData matches the reference's write order
    assert out.index('"precision"') < out.index('"units"') < out.index('"displayLow"')


def test_double_array_with_metadata(spark):
    from cassandra_pv_archiver_spark.functions.json_v1 import raw_double_to_json
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("X", T, [1.5, 2.5], META, 0, 0, "Original")],
        "channel string, t long, aval array<double>," + META_SCHEMA +
        ", severity int, status int, quality string",
    )
    (out,) = _j(raw_double_to_json(df, value=F.col("aval")))
    d = json.loads(out)
    assert d["type"] == "double" and d["value"] == [1.5, 2.5]
    assert d["metaData"]["precision"] == 2  # double family keeps precision


def test_string_array_value(spark):
    from cassandra_pv_archiver_spark.functions.json_v1 import string_to_json

    df = spark.createDataFrame(
        [("X", T, ["a", "b"], 0, 0, "Original")],
        "channel string, t long, asval array<string>,"
        " severity int, status int, quality string",
    )
    (out,) = _j(string_to_json(df, value_col="asval"))
    d = json.loads(out)
    assert d["type"] == "string" and d["value"] == ["a", "b"]
    assert "metaData" not in d  # strings carry no metaData (`:986-993`)


def test_aggregated_metadata_and_full_union_dispatch(spark):
    from cassandra_pv_archiver_spark.functions.json_v1 import (
        mixed_decimated_to_json,
    )

    df = spark.createDataFrame(
        [
            ("X", T, "aggregated_scalar_double", 1.5, 0.1, 1.0, 2.0, 0.9,
             None, None, None, None, None, META, 0, 0, 4, "Interpolated"),
            ("X", T + 1, "aggregated_scalar_long", 3.0, 0.0, 2.0, 4.0, 1.0,
             None, None, None, None, None, META, 0, 0, 2, "Interpolated"),
            ("X", T + 2, "scalar_enum", None, None, None, None, None,
             None, None, 1, ["A", "B"], None, None, 0, 0, 1, "Interpolated"),
            ("X", T + 3, "array_long", None, None, None, None, None,
             None, [7.0, 8.0], None, None, None, META, 0, 0, 1, "Interpolated"),
        ],
        "channel string, t long, type string, mean double, std double,"
        " vmin double, vmax double, covered_fraction double, sval string,"
        " aval array<double>, eval int, labels array<string>,"
        " asval array<string>," + META_SCHEMA +
        ", severity int, status int, n_samples long, quality string",
    )
    out = {r.t: json.loads(r.json) for r in mixed_decimated_to_json(df).collect()}
    assert out[T]["type"] == "minMaxDouble"
    assert out[T]["metaData"]["precision"] == 2  # double family
    assert out[T + 1]["type"] == "minMaxDouble"
    assert out[T + 1]["metaData"]["precision"] == 0  # long family forces 0
    assert out[T + 2]["type"] == "enum" and out[T + 2]["value"] == [1]
    assert out[T + 2]["metaData"] == {"type": "enum", "states": ["A", "B"]}
    assert out[T + 3]["type"] == "long" and out[T + 3]["value"] == [7, 8]


def test_mixed_dispatch_is_total_on_unknown_types(spark):
    """Review-pinned: a full-union row whose type matches no family must
    surface through the string fallback, never silently vanish."""
    from cassandra_pv_archiver_spark.operators.decimate_mixed import (
        OPTIONAL_PAYLOADS,
    )
    from cassandra_pv_archiver_spark.functions.json_v1 import (
        mixed_decimated_to_json,
    )
    from pyspark.sql import functions as F

    base = spark.createDataFrame(
        [("c", 0, "totally_unknown_type", 0, 0, "Original", None, 1.0, 0.0,
          0.0, 0.0, 1.0)],
        "channel string, t long, type string, severity int, status int,"
        " quality string, sval string, mean double, std double,"
        " vmin double, vmax double, covered_fraction double",
    )
    for c, typ in OPTIONAL_PAYLOADS.items():
        if c not in base.columns:
            base = base.withColumn(c, F.lit(None).cast(typ))
    out = mixed_decimated_to_json(base).collect()
    assert len(out) == 1
    assert '"type":"string"' in out[0].json.replace(" ", "")
