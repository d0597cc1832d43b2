import shutil, sys, tempfile
from pyspark.sql import SparkSession, functions as F
from pyspark.sql.types import StructType
sys.path.insert(0, "/root/repo")
src = open("/root/repo/tools/scratch/ssj_outer_nulls.py").read().split('variants =')[0]
exec(src)  # builds views, runs spark stream, defines `base`, `nulls`, `got`

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
  SELECT user_id, c_event_id, p_event_id, c_t, p_t
  FROM pairs, wm
  WHERE (c_even AND p_even)
     OR (p_t >= wm.w1
         AND ((c_even AND c_t >= wm.w1 - {SSJ_SPAN_NS})
              OR (NOT c_even AND c_t >= wm.w1)))
),
nulls AS (
  SELECT a.user_id, a.c_event_id, CAST(NULL AS BIGINT) AS p_event_id,
         a.c_t, CAST(NULL AS BIGINT) AS p_t
  FROM (SELECT c.user_id, c.event_id AS c_event_id, c.t AS c_t
        FROM c, wm WHERE c.even OR c.t >= wm.w1) a, wm
  LEFT ANTI JOIN matched m ON a.c_event_id = m.c_event_id
  WHERE a.c_t < wm.wf - {SSJ_SPAN_NS}
)
SELECT * FROM matched UNION ALL SELECT * FROM nulls
"""
# Spark SQL anti join syntax differs; rewrite with NOT EXISTS:
SQL = SQL.replace(
    """  FROM (SELECT c.user_id, c.event_id AS c_event_id, c.t AS c_t
        FROM c, wm WHERE c.even OR c.t >= wm.w1) a, wm
  LEFT ANTI JOIN matched m ON a.c_event_id = m.c_event_id
  WHERE a.c_t < wm.wf - """ + str(SSJ_SPAN_NS),
    """  FROM (SELECT c.user_id, c.event_id AS c_event_id, c.t AS c_t
        FROM c, wm WHERE c.even OR c.t >= wm.w1) a, wm
  WHERE NOT EXISTS (SELECT 1 FROM matched m WHERE m.c_event_id = a.c_event_id)
    AND a.c_t < wm.wf - """ + str(SSJ_SPAN_NS))
cand = spark.sql(SQL)
a = got.exceptAll(cand).count()
b = cand.exceptAll(got).count()
print(f"FULL CONTRACT sf: spark-only={a} cand-only={b} (n={got.count()})")
shutil.rmtree(root, ignore_errors=True)
