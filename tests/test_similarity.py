"""Similarity operators: exact near-dup pairs, SRP-LSH recall/precision on
constructed near-duplicate clusters, IVF recall vs the exact baseline."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from cassandra_pv_archiver_spark.operators import similarity
from cassandra_pv_archiver_spark.sources.testdata import load_table

SF_DIR = "/root/testdata/sf0.01"
DIM = 64


def _clustered_embeddings(spark, n_clusters=20, per_cluster=5, noise=0.02):
    """Clusters of near-identical vectors: every intra-cluster pair has
    cosine ~ 1, inter-cluster pairs are near-orthogonal random vectors."""
    rng = random.Random(7)
    rows = []
    vid = 0
    for c in range(n_clusters):
        base = [rng.gauss(0, 1) for _ in range(DIM)]
        for _ in range(per_cluster):
            vec = [b + rng.gauss(0, noise) for b in base]
            rows.append((vid, c, [float(x) for x in vec]))
            vid += 1
    return spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<float>"
    )


def test_cosine_near_pairs_exact(spark):
    emb = _clustered_embeddings(spark, n_clusters=4, per_cluster=3)
    pairs = similarity.cosine_near_pairs(emb, 0.95).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    want = {
        (a, b)
        for c in range(4)
        for a in range(c * 3, c * 3 + 3)
        for b in range(a + 1, c * 3 + 3)
    }
    assert got == want
    assert all(r.sim >= 0.95 for r in pairs)


def test_srp_lsh_recall_and_precision(spark):
    emb = _clustered_embeddings(spark)
    tau = 0.95
    brute = {
        (r.id_a, r.id_b)
        for r in similarity.cosine_near_pairs(emb, tau).collect()
    }
    lsh_rows = similarity.srp_near_pairs(emb, tau, n_bits=8, n_bands=6).collect()
    lsh = {(r.id_a, r.id_b) for r in lsh_rows}
    assert brute, "fixture must contain near-dup pairs"
    # precision 1.0: every emitted pair is exact-verified
    assert lsh <= brute
    # high recall on genuine near-duplicates
    recall = len(lsh & brute) / len(brute)
    assert recall >= 0.9, f"recall {recall}"


def test_ivf_recall_vs_exact(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    ids = [0, 1, 2, 3, 4]
    exact = similarity.cosine_topk(emb, ids, k=10).collect()
    approx = similarity.ivf_topk(emb, ids, k=10, n_probe=4).collect()
    e = {(r.q_id, r.vec_id) for r in exact}
    a = {(r.q_id, r.vec_id) for r in approx}
    assert len(a) == len(ids) * 10
    recall = len(a & e) / len(e)
    assert recall >= 0.5, f"IVF recall too low: {recall}"
    # within probed cells the ranking is exact: sims agree with exact run
    es = {(r.q_id, r.vec_id): r.sim for r in exact}
    for r in approx:
        if (r.q_id, r.vec_id) in es:
            assert abs(es[(r.q_id, r.vec_id)] - r.sim) < 1e-9


def test_srp_signature_deterministic(spark):
    emb = _clustered_embeddings(spark, n_clusters=2, per_cluster=2)
    s1 = similarity.srp_signature(emb).select("vec_id", "band", "bucket")
    s2 = similarity.srp_signature(emb).select("vec_id", "band", "bucket")
    assert s1.exceptAll(s2).count() == 0 and s2.exceptAll(s1).count() == 0
