import glob, json, shutil, sys, tempfile
from pyspark.sql import SparkSession, functions as F
from pyspark.sql.types import StructType
sys.path.insert(0, "/root/repo")
src = open("/root/repo/tools/scratch/ssj_outer_nulls.py").read().split('variants =')[0]
exec(src)
wm = spark.sql(base + "SELECT w1, wf FROM wm").first()
print("w1_ms:", wm.w1 // 1000000, "wf_ms:", wm.wf // 1000000)
for f in sorted(glob.glob(f"{ckpt}/offsets/*")):
    for line in open(f):
        line = line.strip()
        if line.startswith("{") and "watermark" in line:
            d = json.loads(line)
            print(f.split('/')[-1], "wm_ms:", d.get("batchWatermarkMs"))
# run1 emitted vs run2 emitted breakdown
shutil.rmtree(root, ignore_errors=True)
