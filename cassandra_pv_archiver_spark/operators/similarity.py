"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline; IVF (coarse quantizer +
probe) is the scale path: at 100 TB the centroid table is tiny (broadcast)
and each query only scans its probed partitions — with the embedding table
pre-partitioned by centroid id this becomes partition pruning.

All vector math stays JVM-side: ``zip_with`` + ``aggregate`` lambdas compile
to Catalyst expressions (no Python UDF, no per-row Python cost).
"""

from __future__ import annotations

import pandas as pd

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


def cosine_near_pairs(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs: all (a, b), a < b, with
    ``cos(a, b) >= threshold``. O(n²) baseline — the oracle/recall anchor
    for the LSH-bucketed scale path. Returns: id_a, id_b, sim."""
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    sim = F.round(_dot("va", "vb") / (_norm("va") * _norm("vb")), round_to)
    return (
        pairs.select("id_a", "id_b", sim.alias("sim"))
        .filter(F.col("sim") >= threshold)
    )


def srp_signature(
    emb: DataFrame,
    n_bits: int = 16,
    n_bands: int = 4,
    dim: int = 64,
    vec_col: str = "embedding",
    seed: int = 0x9E3779B9,
) -> DataFrame:
    """Signed-random-projection (SimHash-for-vectors) banded signatures.

    Hyperplane (j, i) signs come from a splitmix-style integer mix — fully
    deterministic, no RNG state, identical on every executor. Each of
    ``n_bands`` bands hashes ``n_bits`` projections into one bucket id;
    near-identical vectors collide in at least one band w.h.p.  The dot
    products against ±1 hyperplanes are ``aggregate`` lambdas — JVM-side,
    no Python. Adds columns ``band`` and ``bucket`` (exploded: one row per
    band).
    """
    total = n_bits * n_bands
    # sign(j,i) = parity of a mixed integer; closed form usable in one expr
    sign = (
        f"(CASE WHEN ((({seed} * (j * {dim} + i + 1)) % 2147483647) % 2) = 0"
        " THEN 1.0 ELSE -1.0 END)"
    )
    proj = (
        f"transform(sequence(0, {total - 1}), j -> "
        f"aggregate(zip_with({vec_col}, sequence(0, {dim - 1}),"
        f" (x, i) -> CAST(x AS DOUBLE) * {sign}),"
        " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))"
    )
    bits = f"transform({proj}, p -> CASE WHEN p >= 0 THEN 1 ELSE 0 END)"
    d = emb.withColumn("_bits", F.expr(bits))
    bucket = F.expr(
        f"aggregate(slice(_bits, band * {n_bits} + 1, {n_bits}),"
        " 0L, (acc, b) -> acc * 2 + b)"
    )
    return (
        d.withColumn("band", F.explode(F.expr(f"sequence(0, {n_bands - 1})")))
        .withColumn("bucket", bucket)
        .drop("_bits")
    )


def srp_near_pairs(
    emb: DataFrame,
    threshold: float,
    n_bits: int = 16,
    n_bands: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """LSH-bucketed near-duplicate pairs: SRP band buckets -> same-bucket
    candidate join -> exact cosine verify ``>= threshold``.

    At 100 TB this is the real plan, and its shape matters:

    - the **signature table is materialized once** (``persist``) — the 48
      projection lambdas are the expensive expression, and a naive
      self-join would recompute them on both sides;
    - the candidate join carries **ids only** (id, band, bucket ≈ 24
      bytes/row) — vectors never enter the bucket shuffle or the pair
      dedup;
    - exact verification of the surviving candidate pairs is an
      **Arrow-batched numpy kernel** (`pandas_udf`): a loose threshold
      makes the candidate set large (weak LSH prune is inherent at low
      cosine), and a vectorized batch dot beats interpreted
      higher-order-function lambdas ~10× on that stage. The UDF is a
      pure per-row function, so it parallelizes across candidate
      partitions like any projection.

    Recall < 1 by LSH nature (tested against :func:`cosine_near_pairs`);
    precision = 1 (verified).
    """
    from pyspark.sql.functions import pandas_udf

    base = emb.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    sig = (
        srp_signature(base, n_bits=n_bits, n_bands=n_bands, dim=dim, vec_col="_v")
        .select("_id", "band", "bucket")
        .persist()
    )
    cand = (
        sig.select(F.col("_id").alias("id_a"), "band", "bucket")
        .join(sig.select(F.col("_id").alias("id_b"), "band", "bucket"),
              ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )

    @pandas_udf("double")
    def _batch_cosine(va: pd.Series, vb: pd.Series) -> pd.Series:
        import numpy as np

        a = np.stack(va.to_numpy()).astype(np.float64)
        b = np.stack(vb.to_numpy()).astype(np.float64)
        num = (a * b).sum(axis=1)
        den = np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)
        return pd.Series(num / den)

    sim = F.round(_batch_cosine(F.col("va"), F.col("vb")), round_to)
    return (
        cand.join(base.select(F.col("_id").alias("id_a"),
                              F.col("_v").alias("va")), "id_a")
        .join(base.select(F.col("_id").alias("id_b"),
                          F.col("_v").alias("vb")), "id_b")
        .select("id_a", "id_b", sim.alias("sim"))
        .filter(F.col("sim") >= threshold)
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
