"""100x scale sweep for selected registry queries: warm timing at
sf0.001 / sf0.01 / sf0.1 in ONE Spark session, printing the PERF.md
table row material (min-of-two warm passes per cell, same discipline as
bench.py).

Usage: python tools/perf_sweep.py query [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cassandra_pv_archiver_spark.registry import REGISTRY  # noqa: E402
from cassandra_pv_archiver_spark.session import get_spark  # noqa: E402

SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]


def main() -> int:
    names = sys.argv[1:]
    if not names:
        print(__doc__)
        return 2
    spark = get_spark("perf-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    print("| query | sf0.001 | sf0.01 | sf0.1 | 100x |")
    print("|---|---|---|---|---|")
    for name in names:
        fn = REGISTRY[name][0]
        cells = []
        for sf in SF_DIRS:
            times = []
            for _ in range(3):  # pass 0 = warmup, min of the rest
                t0 = time.time()
                fn(spark, sf).count()
                times.append(time.time() - t0)
            cells.append(min(times[1:]))
        ratio = cells[2] / cells[0] if cells[0] > 0 else float("nan")
        print(
            f"| `{name}` | {cells[0]:.2f} s | {cells[1]:.2f} s"
            f" | {cells[2]:.2f} s | {ratio:.1f}x |"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
