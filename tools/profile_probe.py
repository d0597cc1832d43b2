"""Phase-level profiling probe for registry/bench queries (guide §1).

For each query, on a warm session, splits wall time into:

  build    — Python-side DataFrame construction (includes any eager
             sub-jobs the builder runs: persists, counts, collects)
  plan     — parse/analyze/optimize/physical-planning via explainString
             (AQE re-planning during execution is NOT in here; it lands
             in exec)
  exec     — the timed action (df.count(), same as bench.run_one)
  jobs     — number of Spark jobs the build+exec phases submitted

Usage: python tools/profile_probe.py [sf_dir] query [query ...]
       python tools/profile_probe.py --floors   (overhead microbenches)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cassandra_pv_archiver_spark.registry import REGISTRY  # noqa: E402
from cassandra_pv_archiver_spark.session import get_spark  # noqa: E402


def _n_jobs(sc) -> int:
    return len(sc.statusTracker().getJobIdsForGroup(None) or [])


def floors(spark) -> None:
    """Microbench the fixed overheads every query pays."""
    from pyspark.sql import functions as F

    sc = spark.sparkContext
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def t(label, fn, n=5):
        fn()  # warm
        t0 = time.time()
        for _ in range(n):
            fn()
        print(f"{label:44s} {(time.time() - t0) / n * 1000:8.1f} ms")

    t("range(1).count (job floor)", lambda: spark.range(1).count())
    t("read.parquet events (list+footer)",
      lambda: spark.read.parquet(f"{sf_dir}/events.parquet"))
    t("read.parquet + count (scan)",
      lambda: spark.read.parquet(f"{sf_dir}/events.parquet").count())
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    t("groupBy(user_id).count (1 shuffle)",
      lambda: df.groupBy("user_id").count().count())
    t("window lead per channel (1 shuffle)",
      lambda: df.select("user_id", "ts").withColumn(
          "_n", F.lead("ts").over(
              __import__("pyspark.sql.window", fromlist=["Window"])
              .Window.partitionBy("user_id").orderBy("ts"))).count())

    from pyspark.sql.functions import pandas_udf

    # lambda form: `from __future__ import annotations` stringifies the
    # decorator form's type hints, which pandas_udf rejects
    _ident = pandas_udf(lambda s: s, "double")

    t("pandas_udf identity over events.value",
      lambda: df.select(_ident("value")).count())

    import bench
    t("bench.run_one decimate_1h",
      lambda: bench.run_one(spark, "decimate_1h", sf_dir), n=3)


def main() -> int:
    args = sys.argv[1:]
    spark = get_spark("profile-probe")
    spark.sparkContext.setLogLevel("ERROR")
    if args and args[0] == "--floors":
        floors(spark)
        return 0
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir, args = args[0], args[1:]
    import bench

    names = args or None
    if not names:
        print(__doc__)
        return 2
    sc = spark.sparkContext
    print(f"{'query':32s} {'build':>8s} {'plan':>8s} {'exec':>8s} "
          f"{'total':>8s} {'jobs':>5s}")
    for name in names:
        fn = bench.SPECIAL.get(name) or REGISTRY[name][0]
        # warm pass (codegen + JIT), identical to bench discipline
        try:
            bench.run_one(spark, name, "/root/testdata/sf0.001")
        except Exception:
            pass
        j0 = _n_jobs(sc)
        t0 = time.time()
        df = fn(spark, sf_dir)
        t1 = time.time()
        spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "simple"
        )
        t2 = time.time()
        df.count()
        t3 = time.time()
        print(f"{name:32s} {t1 - t0:8.3f} {t2 - t1:8.3f} {t3 - t2:8.3f} "
              f"{t3 - t0:8.3f} {_n_jobs(sc) - j0:5d}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
