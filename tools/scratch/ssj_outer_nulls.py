"""Pin the null-extension predicate variants."""
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

root = tempfile.mkdtemp(prefix="ssj_outer_probe_")
e = load_events(spark, sf_dir).select(
    "user_id", F.col("ts").alias("t"), "event_id", "event_type")
clicks = e.filter(F.col("event_type") == "click")
purch = e.filter(F.col("event_type") == "purchase")
even = F.expr("(t div 1000) % 2 = 0")
cdir, pdir, ckpt, sink = (f"{root}/clicks", f"{root}/purch",
                          f"{root}/ckpt", f"{root}/out")
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
        "c_user = p_user AND c_ts <= p_ts"
        f" AND c_ts >= p_ts - INTERVAL {SSJ_SPAN_NS // 1_000_000_000}"
        " SECONDS"), "leftOuter").select(
        F.col("c_user").alias("user_id"),
        "c_event_id", "p_event_id", "c_t", "p_t")
    q = (j.writeStream.format("parquet").option("path", sink)
         .option("checkpointLocation", ckpt).outputMode("append")
         .trigger(availableNow=True).start())
    q.awaitTermination(600)

sel = ["user_id", "t", "event_id"]
clicks.filter(even).select(sel).coalesce(1).write.mode("overwrite").parquet(cdir)
purch.filter(even).select(sel).coalesce(1).write.mode("overwrite").parquet(pdir)
_run()
clicks.filter(~even).select(sel).coalesce(1).write.mode("append").parquet(cdir)
purch.filter(~even).select(sel).coalesce(1).write.mode("append").parquet(pdir)
_run()
got = spark.read.schema(StructType.fromDDL(out_schema)).parquet(sink).cache()
nulls = got.filter(F.col("p_event_id").isNull()).select(
    "user_id", "c_event_id", "c_t").cache()
print("spark nulls:", nulls.count())

clicks.createOrReplaceTempView("c0")
purch.createOrReplaceTempView("p0")
base = f"""
WITH c AS (SELECT user_id, t, event_id, (t div 1000) % 2 = 0 AS even FROM c0),
p AS (SELECT user_id, t, event_id, (t div 1000) % 2 = 0 AS even FROM p0),
wm AS (
  SELECT (least((SELECT max(t) FROM c WHERE even) div 1000000,
                (SELECT max(t) FROM p WHERE even) div 1000000)
          - {SSJ_DELAY_S * 1000}) * 1000000 AS w1,
         (least((SELECT max(t) FROM c) div 1000000,
                (SELECT max(t) FROM p) div 1000000)
          - {SSJ_DELAY_S * 1000}) * 1000000 AS wf
),
pairs AS (
  SELECT c.user_id, c.event_id AS c_event_id, p.event_id AS p_event_id,
         c.t AS c_t, p.t AS p_t, c.even AS c_even, p.even AS p_even
  FROM c JOIN p ON c.user_id = p.user_id
   AND c.t <= p.t AND c.t >= p.t - {SSJ_SPAN_NS}
),
matched AS (
  SELECT user_id, c_event_id, p_event_id, c_t, p_t
  FROM pairs, wm
  WHERE (c_even AND p_even)
     OR (p_t >= wm.w1
         AND ((c_even AND c_t >= wm.w1 - {SSJ_SPAN_NS})
              OR (NOT c_even AND c_t >= wm.w1)))
),
adm AS (
  SELECT c.user_id, c.event_id AS c_event_id, c.t AS c_t
  FROM c, wm WHERE c.even OR c.t >= wm.w1
),
unm AS (
  SELECT a.* FROM adm a
  LEFT ANTI JOIN matched m ON a.c_event_id = m.c_event_id
)
"""
variants = {
  "ct_lt_wf_minus_span":
      f"SELECT user_id, c_event_id, c_t FROM unm, wm WHERE c_t < wm.wf - {SSJ_SPAN_NS}",
  "ct_ms_lt_wf_minus_span":
      f"SELECT user_id, c_event_id, c_t FROM unm, wm WHERE (c_t div 1000000)*1000000 < wm.wf - {SSJ_SPAN_NS}",
  "ct_le_wf_minus_span":
      f"SELECT user_id, c_event_id, c_t FROM unm, wm WHERE c_t <= wm.wf - {SSJ_SPAN_NS}",
  "all_unmatched":
      "SELECT user_id, c_event_id, c_t FROM unm",
}
for name, tail in variants.items():
    cand = spark.sql(base + tail)
    a = nulls.exceptAll(cand).count()
    b = cand.exceptAll(nulls).count()
    print(f"{name}: n={cand.count()} spark-only={a} cand-only={b}")
shutil.rmtree(root, ignore_errors=True)
