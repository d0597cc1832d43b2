import glob, shutil, sys, tempfile
from pyspark.sql import SparkSession, functions as F
from pyspark.sql.types import StructType
sys.path.insert(0, "/root/repo")
src = open("/root/repo/tools/scratch/ssj_outer_nulls.py").read().split('variants =')[0]
exec(src)
wm = spark.sql(base + "SELECT w1, wf FROM wm").first()
print("w1_ms:", wm.w1 // 1000000, "wf_ms:", wm.wf // 1000000)
for f in sorted(glob.glob(f"{ckpt}/offsets/*")):
    print("=== offsets/", f.split('/')[-1])
    print(open(f).read()[:600])
for f in sorted(glob.glob(f"{ckpt}/commits/*")):
    print("=== commits/", f.split('/')[-1], open(f).read()[:200])
shutil.rmtree(root, ignore_errors=True)
