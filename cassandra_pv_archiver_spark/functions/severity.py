"""Alarm-severity codes (C2).

Severity ordering OK < MINOR < MAJOR < INVALID
(`JsonV1SampleSerializer.java:57-86`); label mapping per
`ChannelAccessSampleValueAccess.java:219-240`.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SEVERITY_LABELS = {0: "OK", 1: "MINOR", 2: "MAJOR", 3: "INVALID"}

#: severities at/above this carry no usable value in JSON (`hasValue` false
#: only for INVALID in the reference serializer when the sample is a marker)
SEVERITY_INVALID = 3


def severity_label_col(col: Column) -> Column:
    expr = F.lit("UNKNOWN")
    for code, label in sorted(SEVERITY_LABELS.items(), reverse=True):
        expr = F.when(col == code, F.lit(label)).otherwise(expr)
    return expr
