"""Graph analytics over the near-dup pair graph, integer-exact.

A dedup pipeline that keeps "the minimum doc_id" per cluster throws away
information: the best survivor of a near-dup cluster is its most CENTRAL
member (the version every other copy drifted from), not the one with the
smallest id. PageRank over the pair graph measures exactly that — and is
also the textbook iterative-join workload a Spark engine must handle
(join edges to ranks, aggregate by destination, repeat).

Determinism: classic PageRank iterates in floats, whose sums are
partition-order-sensitive. Here every rank lives on an integer 1e-9 grid:
r0 = SCALE, share = r div deg (integer division), r' = BASE +
(17 · Σ shares) div 20 (damping 0.85 as the exact rational 17/20) — all
BIGINT ops, so any cluster, any partitioning, and the DuckDB oracle's
unrolled iterations produce identical ranks. Mass lost to floor division
is deterministic too (it is the same floor everywhere).

100 TB shape: the edge list is O(near-dup pairs) — orders of magnitude
smaller than the corpus; each iteration is ONE hash join (edges ⋈ ranks
on src) + ONE groupBy(dst) aggregation, lineage truncated per iteration
with localCheckpoint exactly like operators/dedup.connected_components.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

#: rank grid and damping d = D_NUM/D_DEN (= 0.85)
SCALE = 1_000_000_000
D_NUM, D_DEN = 17, 20
#: teleport mass (1 - d) · SCALE on the grid
BASE = (D_DEN - D_NUM) * SCALE // D_DEN


def pair_pagerank(pairs: DataFrame, iters: int = 3) -> DataFrame:
    """Integer-exact PageRank over the undirected pair graph
    (``pairs``: id_a < id_b). Returns one row per node that appears in
    at least one pair: doc_id, deg, rank_q9 (the rank after ``iters``
    iterations on the 1e-9 grid). Isolated documents are not nodes of
    this graph — their rank is the teleport BASE by definition, and
    :func:`pagerank_canonical` fills that in when composing.
    """
    e = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    edges = e.union(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()
    # deg is read twice per iteration + once at the end; materializing
    # the O(#nodes) table once saves an aggregation re-run per use (r11)
    deg = edges.groupBy("src").agg(
        F.count(F.lit(1)).alias("deg")
    ).localCheckpoint()
    ranks = deg.select(
        F.col("src").alias("id"), F.lit(SCALE).cast("bigint").alias("r")
    ).localCheckpoint()
    for _ in range(iters):
        shares = (
            edges.join(
                deg.join(ranks, deg["src"] == ranks["id"]).select(
                    F.col("src").alias("u"),
                    F.expr("r div deg").alias("share"),
                ),
                edges["src"] == F.col("u"),
            )
            .groupBy("dst")
            .agg(F.sum("share").alias("inc"))
        )
        ranks = (
            deg.select(F.col("src").alias("id"))
            .join(shares, F.col("id") == shares["dst"], "left")
            .select(
                "id",
                (
                    F.lit(BASE)
                    + F.expr(
                        f"({D_NUM} * coalesce(inc, CAST(0 AS BIGINT)))"
                        f" div {D_DEN}"
                    )
                ).cast("bigint").alias("r"),
            )
        ).localCheckpoint()
    return (
        deg.join(ranks, deg["src"] == ranks["id"])
        .select(
            F.col("src").alias("doc_id"),
            F.col("deg").cast("bigint").alias("deg"),
            F.col("r").alias("rank_q9"),
        )
    )


def pagerank_canonical(
    pairs: DataFrame, docs: DataFrame, iters: int = 3
) -> DataFrame:
    """Centrality-based canonical selection: connected components over
    the pair graph, then each component keeps its highest-PageRank
    member (tie → smallest doc_id). Singleton components (documents with
    no near-dup) are their own canonical at the teleport BASE rank.

    Returns: comp, canonical_id, n_docs, canonical_rank_q9.
    """
    from .dedup import connected_components

    comp = connected_components(pairs, docs)
    pr = pair_pagerank(pairs, iters=iters)
    labeled = comp.join(pr, "doc_id", "left").select(
        "comp",
        "doc_id",
        F.coalesce("rank_q9", F.lit(BASE).cast("bigint")).alias("rank_q9"),
    )
    w = Window.partitionBy("comp").orderBy(
        F.desc("rank_q9"), F.col("doc_id")
    )
    sizes = labeled.groupBy("comp").agg(F.count(F.lit(1)).alias("n_docs"))
    top = (
        labeled.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "comp",
            F.col("doc_id").alias("canonical_id"),
            F.col("rank_q9").alias("canonical_rank_q9"),
        )
    )
    return top.join(sizes, "comp").select(
        "comp", "canonical_id", "n_docs", "canonical_rank_q9"
    )
