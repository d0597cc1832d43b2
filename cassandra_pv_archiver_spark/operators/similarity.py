"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline; IVF (coarse quantizer +
probe) is the scale path: at 100 TB the centroid table is tiny (broadcast)
and each query only scans its probed partitions — with the embedding table
pre-partitioned by centroid id this becomes partition pruning.

All vector math stays JVM-side: ``zip_with`` + ``aggregate`` lambdas compile
to Catalyst expressions (no Python UDF, no per-row Python cost).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: str, b: str) -> F.Column:
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def _norm(a: str) -> F.Column:
    return F.sqrt(_dot(a, a))


def with_norm(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return emb.withColumn("norm", _norm(vec_col))


def cosine_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """Exact brute-force cosine top-k for each query id (self excluded).

    The query side is tiny and broadcast; similarity + per-query top-k run as
    one shuffle on q_id. Returns: q_id, vec_id, sim, rank.
    """
    q = emb.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    )
    joined = emb.crossJoin(F.broadcast(q)).filter(F.col(id_col) != F.col("q_id"))
    sim = _dot("q_vec", vec_col) / (_norm("q_vec") * _norm(vec_col))
    scored = joined.select(
        "q_id", F.col(id_col), F.round(sim, round_to).alias("sim")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", id_col, "sim", "rank")
    )


def label_centroids(
    emb: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Elementwise mean vector per label — the coarse quantizer ('train'
    step) for IVF. posexplode + groupBy(label, pos) keeps it JVM-side."""
    ex = emb.select(
        F.col(label_col), F.posexplode(vec_col).alias("pos", "val")
    )
    per_dim = ex.groupBy(label_col, "pos").agg(
        F.avg(F.col("val").cast("double")).alias("c")
    )
    return (
        per_dim.groupBy(label_col)
        .agg(F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("pc"))
        .select(
            label_col,
            F.expr("transform(pc, x -> x.c)").alias("centroid"),
        )
    )


def ivf_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    round_to: int = 4,
) -> DataFrame:
    """IVF-style ANN: probe the ``n_probe`` nearest label-centroids per
    query, exact cosine inside the probed cells only.

    Approximate: recall < 1 vs :func:`cosine_topk` when a true neighbor
    lives in an unprobed cell. Returns: q_id, vec_id, sim, rank.
    """
    cent = label_centroids(emb, label_col=label_col, vec_col=vec_col)
    q = emb.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    )
    qc = q.crossJoin(F.broadcast(cent))
    csim = _dot("q_vec", "centroid") / (_norm("q_vec") * _norm("centroid"))
    wq = Window.partitionBy("q_id").orderBy(F.desc("csim"), F.col(label_col))
    probes = (
        qc.withColumn("csim", csim)
        .withColumn("crank", F.row_number().over(wq))
        .filter(F.col("crank") <= n_probe)
        .select("q_id", "q_vec", label_col)
    )
    cand = emb.join(
        F.broadcast(probes), on=label_col
    ).filter(F.col(id_col) != F.col("q_id"))
    sim = _dot("q_vec", vec_col) / (_norm("q_vec") * _norm(vec_col))
    scored = cand.select("q_id", F.col(id_col), F.round(sim, round_to).alias("sim"))
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", id_col, "sim", "rank")
    )
