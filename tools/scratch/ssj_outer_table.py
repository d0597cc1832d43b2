import shutil, sys, tempfile
from pyspark.sql import SparkSession, functions as F
from pyspark.sql.types import StructType
sys.path.insert(0, "/root/repo")
src = open("/root/repo/tools/scratch/ssj_outer_nulls.py").read().split('variants =')[0]
exec(src)
wm = spark.sql(base + "SELECT w1, wf FROM wm").first()
unm = spark.sql(base + "SELECT user_id, c_event_id, c_t FROM unm").collect()
emitted = {r.c_event_id for r in nulls.collect()}
print(f"w1={wm.w1} wf={wm.wf} span={SSJ_SPAN_NS} delay={SSJ_DELAY_S}")
rows = sorted(unm, key=lambda r: r.c_t)
for r in rows[-8:]:
    ev = (r.c_t // 1000) % 2 == 0
    print(f"cid={r.c_event_id} even={ev} c_t-w1={(r.c_t-wm.w1)/1e9:.3f}s "
          f"(wf-span)-c_t={((wm.wf-SSJ_SPAN_NS)-r.c_t)/1e9:.3f}s "
          f"emitted={r.c_event_id in emitted}")
# which nulls were emitted in run2? rerun run1-only in a fresh dir:
shutil.rmtree(root, ignore_errors=True)
