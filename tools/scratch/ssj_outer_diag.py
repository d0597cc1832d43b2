import shutil, sys, tempfile
from pyspark.sql import SparkSession, functions as F
from pyspark.sql.types import StructType
sys.path.insert(0, "/root/repo")
exec(open("/root/repo/tools/scratch/ssj_outer_nulls.py").read().split('variants =')[0])
# `base`, `nulls`, views are now live. Find the extra row:
cand = spark.sql(base + f"SELECT user_id, c_event_id, c_t FROM unm, wm WHERE c_t < wm.wf - {SSJ_SPAN_NS}")
extra = cand.exceptAll(nulls)
extra.show(truncate=False)
wm = spark.sql(base + "SELECT w1, wf FROM wm").first()
print("w1,wf:", wm.w1, wm.wf)
for r in extra.collect():
    print("extra:", r.c_event_id, "c_t:", r.c_t, "even:", (r.c_t // 1000) % 2 == 0,
          "c_t>=w1:", r.c_t >= wm.w1,
          "c_t - (wf - span):", r.c_t - (wm.wf - SSJ_SPAN_NS),
          "c_t - (w1 - span):", r.c_t - (wm.w1 - SSJ_SPAN_NS))
shutil.rmtree(root, ignore_errors=True)
