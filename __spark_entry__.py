"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship query (1 h time-weighted decimation) at sf0.001.
queries()     -> every implemented operator from SURVEY.md §2 (+ the
                 training-data pipeline ops) as (spark, sf_dir) callables.
oracle_sql()  -> matching DuckDB SQL for the value-hash correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from cassandra_pv_archiver_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: hold-forward time-weighted decimation (A1–A3/W1/W2) of the
    raw sample series to 1 h aggregates."""
    return registry.REGISTRY["decimate_1h"][0](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
