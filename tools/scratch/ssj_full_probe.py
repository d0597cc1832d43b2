"""Pin the FULL outer stream-stream join emission contract."""
import shutil, sys, tempfile
from pyspark.sql import SparkSession, functions as F
from pyspark.sql.types import StructType

sys.path.insert(0, "/root/repo")
SSJ_DELAY_S = 7200
SSJ_SPAN_NS = 21600 * 1_000_000_000
sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from cassandra_pv_archiver_spark.sources.testdata import load_events

root = tempfile.mkdtemp(prefix="ssj_full_probe_")
e = load_events(spark, sf_dir).select(
    "user_id", F.col("ts").alias("t"), "event_id", "event_type")
clicks = e.filter(F.col("event_type") == "click")
purch = e.filter(F.col("event_type") == "purchase")
even = F.expr("(t div 1000) % 2 = 0")
cdir, pdir, ckpt, sink = (f"{root}/c", f"{root}/p", f"{root}/ck", f"{root}/o")
side_schema = "user_id bigint, t bigint, event_id bigint"
out_schema = ("user_id bigint, c_event_id bigint, p_event_id bigint,"
              " c_t bigint, p_t bigint")

def _run():
    cs = (spark.readStream.schema(side_schema).parquet(cdir)
          .withColumn("c_ts", F.timestamp_micros(F.expr("t div 1000")))
          .withWatermark("c_ts", f"{SSJ_DELAY_S} seconds")
          .select(F.col("user_id").alias("c_user"),
                  F.col("event_id").alias("c_event_id"),
                  F.col("t").alias("c_t"), "c_ts"))
    ps = (spark.readStream.schema(side_schema).parquet(pdir)
          .withColumn("p_ts", F.timestamp_micros(F.expr("t div 1000")))
          .withWatermark("p_ts", f"{SSJ_DELAY_S} seconds")
          .select(F.col("user_id").alias("p_user"),
                  F.col("event_id").alias("p_event_id"),
                  F.col("t").alias("p_t"), "p_ts"))
    j = cs.join(ps, F.expr(
        "c_user = p_user AND c_ts <= p_ts AND"
        f" c_ts >= p_ts - INTERVAL {SSJ_SPAN_NS // 1_000_000_000} SECONDS"),
        "fullOuter").select(
        F.coalesce(F.col("c_user"), F.col("p_user")).alias("user_id"),
        "c_event_id", "p_event_id", "c_t", "p_t")
    q = (j.writeStream.format("parquet").option("path", sink)
         .option("checkpointLocation", ckpt).outputMode("append")
         .trigger(availableNow=True).start())
    q.awaitTermination(600)

sel = ["user_id", "t", "event_id"]
clicks.filter(even).select(sel).coalesce(1).write.parquet(cdir)
purch.filter(even).select(sel).coalesce(1).write.parquet(pdir)
_run()
clicks.filter(~even).select(sel).coalesce(1).write.mode("append").parquet(cdir)
purch.filter(~even).select(sel).coalesce(1).write.mode("append").parquet(pdir)
_run()
got = spark.read.schema(StructType.fromDDL(out_schema)).parquet(sink).cache()
print("matched:", got.filter(F.col("c_event_id").isNotNull()
      & F.col("p_event_id").isNotNull()).count(),
      "left-nulls:", got.filter(F.col("p_event_id").isNull()).count(),
      "right-nulls:", got.filter(F.col("c_event_id").isNull()).count())

clicks.createOrReplaceTempView("c0")
purch.createOrReplaceTempView("p0")
SQL = f"""
WITH c AS (SELECT user_id, t, event_id, (t div 1000) % 2 = 0 AS even FROM c0),
p AS (SELECT user_id, t, event_id, (t div 1000) % 2 = 0 AS even FROM p0),
wm AS (
  SELECT w1, greatest(w1,
      (least(coalesce((SELECT max(t) FROM c WHERE NOT even),
                      (SELECT max(t) FROM c WHERE even)) div 1000000,
             coalesce((SELECT max(t) FROM p WHERE NOT even),
                      (SELECT max(t) FROM p WHERE even)) div 1000000)
       - {SSJ_DELAY_S * 1000}) * 1000000) AS wf
  FROM (SELECT (least((SELECT max(t) FROM c WHERE even) div 1000000,
                      (SELECT max(t) FROM p WHERE even) div 1000000)
                - {SSJ_DELAY_S * 1000}) * 1000000 AS w1)
),
pairs AS (
  SELECT c.user_id, c.event_id AS c_event_id, p.event_id AS p_event_id,
         c.t AS c_t, p.t AS p_t, c.even AS c_even, p.even AS p_even
  FROM c JOIN p ON c.user_id = p.user_id
   AND c.t <= p.t AND c.t >= p.t - {SSJ_SPAN_NS}
),
matched AS (
  SELECT user_id, c_event_id, p_event_id, c_t, p_t FROM pairs, wm
  WHERE (c_even AND p_even)
     OR (p_t >= wm.w1
         AND ((c_even AND c_t >= wm.w1 - {SSJ_SPAN_NS})
              OR (NOT c_even AND c_t >= wm.w1)))
),
lnull AS (
  SELECT a.user_id, a.c_event_id, CAST(NULL AS BIGINT) AS p_event_id,
         a.c_t, CAST(NULL AS BIGINT) AS p_t
  FROM (SELECT c.user_id, c.event_id AS c_event_id, c.t AS c_t
        FROM c, wm WHERE c.even OR c.t >= wm.w1) a, wm
  WHERE NOT EXISTS (SELECT 1 FROM matched m WHERE m.c_event_id = a.c_event_id)
    AND a.c_t < wm.wf - {SSJ_SPAN_NS}
),
rnull AS (
  SELECT a.user_id, CAST(NULL AS BIGINT) AS c_event_id, a.p_event_id,
         CAST(NULL AS BIGINT) AS c_t, a.p_t
  FROM (SELECT p.user_id, p.event_id AS p_event_id, p.t AS p_t
        FROM p, wm WHERE p.even OR p.t >= wm.w1) a, wm
  WHERE NOT EXISTS (SELECT 1 FROM matched m WHERE m.p_event_id = a.p_event_id)
    AND a.p_t < wm.wf
)
SELECT * FROM matched UNION ALL SELECT * FROM lnull UNION ALL SELECT * FROM rnull
"""
cand = spark.sql(SQL)
print("cand:", cand.count(),
      "spark-only:", got.exceptAll(cand).count(),
      "cand-only:", cand.exceptAll(got).count())
shutil.rmtree(root, ignore_errors=True)
