"""Does a side's operator watermark remember its earlier max when a later
batch's max is lower? Controls the oracle's final-watermark formula."""
import glob, json, shutil, tempfile
from pyspark.sql import SparkSession, functions as F

spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "4").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
root = tempfile.mkdtemp(prefix="ssj_wm_micro_")
cdir, pdir, ckpt, sink = (f"{root}/c", f"{root}/p", f"{root}/ck", f"{root}/o")
S = "user_id bigint, t bigint, event_id bigint"
MS = 1_000_000
HOUR = 3600_000 * MS
DELAY = 7200
SPAN_S = 21600

def w(rows, d, mode): spark.createDataFrame(rows, S).coalesce(1).write.mode(mode).parquet(d)

def run():
    cs = (spark.readStream.schema(S).parquet(cdir)
          .withColumn("c_ts", F.timestamp_micros(F.expr("t div 1000")))
          .withWatermark("c_ts", f"{DELAY} seconds")
          .select(F.col("user_id").alias("c_user"), F.col("event_id").alias("c_event_id"),
                  F.col("t").alias("c_t"), "c_ts"))
    ps = (spark.readStream.schema(S).parquet(pdir)
          .withColumn("p_ts", F.timestamp_micros(F.expr("t div 1000")))
          .withWatermark("p_ts", f"{DELAY} seconds")
          .select(F.col("user_id").alias("p_user"), F.col("event_id").alias("p_event_id"),
                  F.col("t").alias("p_t"), "p_ts"))
    j = cs.join(ps, F.expr(
        "c_user = p_user AND c_ts <= p_ts AND"
        f" c_ts >= p_ts - INTERVAL {SPAN_S} SECONDS"), "leftOuter").select(
        F.col("c_user").alias("user_id"), "c_event_id", "p_event_id", "c_t", "p_t")
    q = (j.writeStream.format("parquet").option("path", sink)
         .option("checkpointLocation", ckpt).outputMode("append")
         .trigger(availableNow=True).start())
    q.awaitTermination(300)

T0 = 1_700_000_000_000 * MS  # ms-grid base
# chunk 1: clicks max = T0+100h, purchases max = T0+100h
w([(1, T0, 10), (1, T0 + 100 * HOUR, 11)], cdir, "overwrite")
w([(1, T0 + 1 * MS, 20), (1, T0 + 100 * HOUR + MS, 21)], pdir, "overwrite")
run()
# chunk 2: clicks max = T0+50h (LOWER than side's own chunk-1 max),
# purchases max = T0+200h (higher)
w([(1, T0 + 50 * HOUR, 12)], cdir, "append")
w([(1, T0 + 200 * HOUR, 22)], pdir, "append")
run()
for f in sorted(glob.glob(f"{ckpt}/commits/*")):
    print("commit", f.split('/')[-1], open(f).read().splitlines()[1])
base_ms = T0 // MS
for f in sorted(glob.glob(f"{ckpt}/offsets/*")):
    d = json.loads(open(f).read().splitlines()[1])
    print("offsets", f.split('/')[-1], "wm-T0_h:",
          (d["batchWatermarkMs"] - base_ms) / 3600e3 if d["batchWatermarkMs"] else 0)
shutil.rmtree(root, ignore_errors=True)
