"""Fixed-true-pair containment sweep (VERDICT r5 #9): the plain SF
sweep conflates two growth terms — true-pair density rises with SF (the
shared verify term) AND the k·Σdf probe/scan term rises with corpus
size. This controls the variable: the true-pair population is frozen to
the sf0.001 core (500 docs) while the corpus grows by word-salted
filler blocks (every filler word carries its doc id, so filler shares
ZERO shingles with anything — df=1 rows that exercise exactly the
probe/scan term and can never add a pair).

Prints the PERF.md row: corpus size, pair count (must be constant),
warm min-of-2 runtime of operators/dedup.containment_lsh_pairs at the
catalog thresholds.

Usage: python tools/containment_fixed_pairs.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cassandra_pv_archiver_spark.catalog_data import (  # noqa: E402
    CONTAIN_C,
    CONTAIN_JMAX,
    CONTAIN_K,
)
from cassandra_pv_archiver_spark.operators import dedup  # noqa: E402
from cassandra_pv_archiver_spark.session import get_spark  # noqa: E402

CORE = "/root/testdata/sf0.001/documents.parquet"
FILL = "/root/testdata/sf0.1/documents.parquet"


def main() -> int:
    spark = get_spark("containment-fixed-pairs")
    spark.sparkContext.setLogLevel("ERROR")
    core = spark.read.parquet(CORE).select("doc_id", "text")
    base = spark.read.parquet(FILL).select("doc_id", "text")

    print("| corpus docs | true pairs | containment_lsh_pairs |")
    print("|---|---|---|")
    for blocks in (0, 1, 10):
        docs = core
        if blocks:
            rep = base.crossJoin(
                spark.range(blocks).withColumnRenamed("id", "b")
            ).select(
                (F.lit(10**7) + F.col("b") * F.lit(10**5) + F.col("doc_id"))
                .alias("doc_id"),
                # per-DOC word salt: zero shared shingles anywhere
                F.regexp_replace(
                    "text",
                    r"(\S+)",
                    F.concat(
                        F.lit("$1f"),
                        (F.col("b") * F.lit(10**5) + F.col("doc_id"))
                        .cast("string"),
                    ),
                ).alias("text"),
            )
            docs = core.unionByName(rep)
        docs = docs.persist()
        n_docs = docs.count()
        times, n_pairs = [], 0
        for _ in range(3):  # pass 0 warms; min of the rest
            t0 = time.time()
            n_pairs = dedup.containment_lsh_pairs(
                dedup.shingles(docs), CONTAIN_C, CONTAIN_JMAX, k=CONTAIN_K
            ).count()
            times.append(time.time() - t0)
        docs.unpersist()
        print(f"| {n_docs} | {n_pairs} | {min(times[1:]):.2f} s |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
