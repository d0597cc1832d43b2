import shutil, sys, tempfile
from pyspark.sql import SparkSession, functions as F
from pyspark.sql.types import StructType
sys.path.insert(0, "/root/repo")
src = open("/root/repo/tools/scratch/ssj_outer_nulls.py").read().split('variants =')[0]
exec(src)
wm = spark.sql(base + "SELECT w1, wf FROM wm").first()
# nudge: one far-future row on EACH side (same user none) to push wm way up
far = wm.wf + 10 * 86400 * 1_000_000_000
spark.createDataFrame([(999999, far, 888888)], side_schema)\
    .coalesce(1).write.mode("append").parquet(cdir)
spark.createDataFrame([(999999, far, 777777)], side_schema)\
    .coalesce(1).write.mode("append").parquet(pdir)
_run()
got4 = spark.read.schema(StructType.fromDDL(out_schema)).parquet(sink)
n4 = got4.filter(F.col("p_event_id").isNull() & (F.col("user_id") != 999999))
print("nulls after nudge:", n4.count())
newly = n4.select("user_id","c_event_id","c_t").exceptAll(nulls)
for r in newly.collect():
    print("flushed:", r.c_event_id, "c_t-w1:", (r.c_t-wm.w1)/1e9)
shutil.rmtree(root, ignore_errors=True)
