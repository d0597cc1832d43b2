"""SparkSession factory tuned for the archiver workload.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]``; the configs below are the
ones that matter at cluster scale too:

- AQE on (runtime coalescing + skew-join splitting) — at 100 TB the skew
  guard matters for hot channels.
- Arrow enabled for the few Pandas-UDF paths (multimodal, mixed-type corner).
- ``spark.sql.session.timeZone=UTC`` — all archiver timestamps are ns-epoch
  longs; the TZ only affects derived TimestampType *views*, which must be
  stable.
- shuffle partitions default to the core count locally; on a real cluster
  AQE coalesces from a higher initial number.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "cassandra-pv-archiver-spark") -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .getOrCreate()
    )
