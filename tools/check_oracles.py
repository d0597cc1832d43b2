"""Local replica of the driver's correctness gate: run every registry query
on Spark and its DuckDB oracle on the same sf dir; compare row count, column
names, and order-insensitive values (columns sorted by name, rows sorted).

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def compare(name: str, spark_df: pd.DataFrame, ora_df: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(spark_df.columns) != sorted(ora_df.columns):
        problems.append(
            f"columns differ: spark={sorted(spark_df.columns)} oracle={sorted(ora_df.columns)}"
        )
        return problems
    if len(spark_df) != len(ora_df):
        problems.append(f"row count: spark={len(spark_df)} oracle={len(ora_df)}")
    a, b = canon(spark_df), canon(ora_df)
    n = min(len(a), len(b))
    for c in a.columns:
        x, y = a[c].iloc[:n], b[c].iloc[:n]
        # dtype-strict: an int column on one side and a float on the other is
        # a hash mismatch at the driver even when values agree (e.g. DuckDB
        # HUGEINT -> float64 4.0 vs Spark int64 4) — fail it here.
        if x.dtype.kind != y.dtype.kind and {x.dtype.kind, y.dtype.kind} <= {"i", "u", "f"}:
            problems.append(
                f"col {c}: dtype mismatch spark={x.dtype} oracle={y.dtype}"
            )
            continue
        if x.dtype.kind == "f" or y.dtype.kind == "f":
            bad = ~((x.isna() & y.isna()) | ((x - y).abs() <= 1e-12))
        else:
            bad = x.astype(str) != y.astype(str)
        nbad = int(bad.sum())
        if nbad:
            i = bad[bad].index[0]
            problems.append(
                f"col {c}: {nbad} mismatches; first at row {i}: spark={x[i]!r} oracle={y[i]!r}"
            )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from cassandra_pv_archiver_spark.registry import REGISTRY
    from cassandra_pv_archiver_spark.session import get_spark

    spark = get_spark("check-oracles")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = 0
    for name, (fn, sql) in REGISTRY.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"[FAIL] {name}: spark error: {e}")
            failures += 1
            continue
        if sql is None:
            print(f"[rows-only] {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            odf = con.sql(sql).df()
        except Exception as e:  # noqa: BLE001
            print(f"[FAIL] {name}: oracle error: {e}")
            failures += 1
            continue
        problems = compare(name, sdf, odf)
        dt = time.time() - t0
        if problems:
            failures += 1
            print(f"[FAIL] {name} ({len(sdf)} rows, {dt:.1f}s)")
            for p in problems:
                print(f"       {p}")
        else:
            print(f"[ OK ] {name}: {len(sdf)} rows ({dt:.1f}s)")
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
