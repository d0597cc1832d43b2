"""Co-located (bucketed) joins — the shuffle-free join path for repeated
large⋈large joins at 100 TB.

Broadcast handles dimension joins; when BOTH sides are fact-scale and the
join recurs (samples ⋈ samples across levels, lineitem ⋈ orders), the
scale answer is bucketing: both tables pre-hashed into the same number of
buckets on the join key at WRITE time, so the join consumes the on-disk
clustering and never exchanges. These tests pin that the engine's session
configuration actually produces bucket-wise joins (Spark only uses
bucketing when spark.sql.sources.bucketing.enabled, on by default)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def no_broadcast(spark):
    orig = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", orig)


def test_bucketed_join_is_shuffle_free(spark, no_broadcast, tmp_path):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    od = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    (li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
       .option("path", str(tmp_path / "li_b"))
       .mode("overwrite").saveAsTable("li_bucketed"))
    (od.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
       .option("path", str(tmp_path / "od_b"))
       .mode("overwrite").saveAsTable("od_bucketed"))
    try:
        a, b = spark.table("li_bucketed"), spark.table("od_bucketed")
        j = a.join(b, F.col("l_orderkey") == F.col("o_orderkey")).groupBy(
            "o_orderpriority"
        ).agg(F.count(F.lit(1)).alias("n"))
        plan = j._jdf.queryExecution().executedPlan().toString()
        # the ONLY exchange is the final tiny re-aggregation — the join
        # itself consumes the bucket clustering
        assert plan.count("Exchange") == 1, plan
        # identical result to the plain (3-exchange) join
        plain = (
            li.join(od, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        assert plain._jdf.queryExecution().executedPlan().toString().count(
            "Exchange"
        ) == 3
        assert sorted(map(tuple, j.collect())) == sorted(
            map(tuple, plain.collect())
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS od_bucketed")
