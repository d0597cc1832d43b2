import shutil, sys, tempfile
from pyspark.sql import SparkSession, functions as F
from pyspark.sql.types import StructType
sys.path.insert(0, "/root/repo")
src = open("/root/repo/tools/scratch/ssj_outer_nulls.py").read().split('variants =')[0]
exec(src)
# run a third time with NO new data: does the extra null flush?
_run()
got3 = spark.read.schema(StructType.fromDDL(out_schema)).parquet(sink)
n3 = got3.filter(F.col("p_event_id").isNull())
print("nulls after run3:", n3.count())
extra = n3.select("user_id","c_event_id","c_t").exceptAll(nulls)
extra.show()
shutil.rmtree(root, ignore_errors=True)
