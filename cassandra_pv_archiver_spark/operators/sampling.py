"""Deterministic sampling / dataset splitting for training pipelines.

Assignment is a pure function of the row id (md5 hash-threshold), never
``rand()``: the split is reproducible across runs, engines, partition
counts, and cluster sizes — the property a train/val/test split actually
needs — and it requires NO shuffle (embarrassingly parallel map), so it
costs one scan at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket16(id_col: str, salt: str) -> Column:
    """First 16 bits of md5(salt ':' id) as an int in [0, 65536) —
    uniform, deterministic, engine-portable (same construction is
    expressible in DuckDB for the oracles)."""
    return F.expr(
        f"CAST(conv(substring(md5(concat('{salt}:', CAST({id_col} AS STRING))),"
        " 1, 4), 16, 10) AS INT)"
    )


def split_assign(
    df: DataFrame,
    id_col: str = "doc_id",
    salt: str = "split",
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Add a ``split`` column ('train' | 'val' | 'test') by hash
    threshold: bucket < 80% -> train, < 90% -> val, else test.
    Stratification comes for free: the hash is independent of any
    feature, so expected per-stratum fractions match the global ones;
    use a different ``salt`` to draw an independent re-split."""
    b = hash_bucket16(id_col, salt)
    t_thr = 65536 * train_pct // 100
    v_thr = 65536 * (train_pct + val_pct) // 100
    split = (
        F.when(b < t_thr, F.lit("train"))
        .when(b < v_thr, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn("split", split)
