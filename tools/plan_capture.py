"""Capture .explain("formatted") for registry/bench queries to files.

Usage: python tools/plan_capture.py OUTDIR SUFFIX [sf_dir] query [...]
Writes OUTDIR/<query>_<SUFFIX>.txt for each query.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cassandra_pv_archiver_spark.registry import REGISTRY  # noqa: E402
from cassandra_pv_archiver_spark.session import get_spark  # noqa: E402


def main() -> int:
    outdir, suffix, *rest = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if rest and os.path.isdir(rest[0]):
        sf_dir, rest = rest[0], rest[1:]
    os.makedirs(outdir, exist_ok=True)
    # provenance stamp (r11 review: before/after dumps must be
    # attributable to the commit they were captured at)
    import subprocess
    import time

    try:
        commit = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ).stdout.strip() or "unknown"
        dirty = bool(subprocess.run(
            ["git", "status", "--porcelain"],
            capture_output=True, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ).stdout.strip())
    except OSError:
        commit, dirty = "unknown", False
    stamp = time.strftime("%Y-%m-%dT%H:%M:%S%z")
    spark = get_spark("plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    import bench

    for name in rest:
        fn = bench.SPECIAL.get(name) or REGISTRY[name][0]
        df = fn(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(
                f"-- {name} @ {sf_dir}\n"
                f"-- commit={commit}{'+dirty' if dirty else ''}"
                f" captured={stamp}\n"
                f"-- shuffle.partitions="
                f"{spark.conf.get('spark.sql.shuffle.partitions')}"
                f" adaptive={spark.conf.get('spark.sql.adaptive.enabled')}\n"
            )
            fh.write(buf.getvalue())
        print("wrote", path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
