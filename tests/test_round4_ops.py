"""Round-4 operator unit tests: PII scan/redact, int8 quantization audit,
SemDeDup, pairwise substring spans, DSIR importance, threshold crossings.

Style follows tests/test_pipeline_ops.py: crafted inputs with hand-computed
expectations; the registry-level hash oracles cover the sf-corpus behavior.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cassandra_pv_archiver_spark.operators import dedup, similarity, text
from cassandra_pv_archiver_spark.operators.stats import threshold_crossings


def test_pii_scan_and_redact_known_spans(spark):
    docs = spark.createDataFrame(
        [
            (1, "reach me at jane.doe+x@mail.example.org or call +49-555-0012"),
            (2, "server 192.168.0.17 and 10.0.0.1 rebooted"),
            (3, "no pii here at all"),
            (4, "two mails a@b.co c@d.io"),
        ],
        "doc_id long, text string",
    )
    scan = {r["doc_id"]: r for r in text.pii_scan(docs).collect()}
    assert (scan[1]["n_email"], scan[1]["n_phone"], scan[1]["n_ipv4"]) == (1, 1, 0)
    assert (scan[2]["n_email"], scan[2]["n_phone"], scan[2]["n_ipv4"]) == (0, 0, 2)
    assert scan[3]["n_pii"] == 0
    assert scan[4]["n_email"] == 2

    red = {r["doc_id"]: r for r in text.pii_redact(docs).collect()}
    assert red[1]["text_redacted"] == "reach me at <EMAIL> or call <PHONE>"
    assert red[2]["text_redacted"] == "server <IP> and <IP> rebooted"
    assert red[3]["text_redacted"] == "no pii here at all"
    assert red[3]["chars_delta"] == 0
    # delta is exact: len(original) - len(redacted)
    assert red[4]["chars_delta"] == len("two mails a@b.co c@d.io") - len(
        "two mails <EMAIL> <EMAIL>"
    )


def test_quantize_audit_hand_computed(spark):
    # x = [1.0, 0.5]: xi = [1_000_000, 500_000], s = 1_000_000,
    # q = [127, 64] (0.5*127 = 63.5 rounds half-up), err = [0, 500_000].
    emb = spark.createDataFrame(
        [(0, [1.0, 0.5], 0), (1, [1.0, -1.0], 1)],
        "vec_id long, embedding array<float>, label int",
    )
    rows = {r["label"]: r for r in similarity.quantize_audit(emb).collect()}
    r0 = rows[0]
    assert r0["n_vecs"] == 1 and r0["n_exact"] == 0
    assert abs(r0["max_abs_err"] - 500_000 / 127e6) < 1e-15
    # label 1: both components hit the scale exactly -> zero error
    r1 = rows[1]
    assert r1["n_exact"] == 1 and r1["max_abs_err"] == 0.0


def test_quantize_codes_bounded_and_zero_vector_safe(spark):
    emb = spark.createDataFrame(
        [(0, [0.0, 0.0, 0.0], 0), (1, [3.25, -3.25, 0.0], 0)],
        "vec_id long, embedding array<float>, label int",
    )
    out = similarity.quantize_audit(emb).collect()
    assert len(out) == 1  # must not divide by zero on the all-zero vector
    assert out[0]["n_vecs"] == 2


def test_semantic_dedup_drop_rule(spark):
    # k=2 seeds at ids 0,1; ids 2,3 join cluster 0 (near id0); only
    # smaller-id neighbors at sim >= tau drop a vector.
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0], 0),
            (1, [0.0, 1.0], 0),
            (2, [1.0, 0.0], 0),
            (3, [0.999, 0.001], 0),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    out = {
        r["cluster"]: r
        for r in similarity.semantic_dedup(emb, 0.95, k=2, iters=1).collect()
    }
    c0 = out[0]
    assert (c0["n_vecs"], c0["n_dup_pairs"], c0["n_dropped"], c0["n_kept"]) == (
        3, 3, 2, 1,
    )
    c1 = out[1]
    assert (c1["n_vecs"], c1["n_dup_pairs"], c1["n_dropped"], c1["n_kept"]) == (
        1, 0, 0, 1,
    )


def test_semantic_pairs_subset_of_exact_same_cluster(spark, sf_dir):
    """Within-cluster pairs are exactly the exact-cosine pairs whose
    endpoints share a cluster — no false positives (exact verify), the
    misses are exactly the cross-cluster ones."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    tau = 0.4
    got = {
        (r["id_a"], r["id_b"])
        for r in similarity.semantic_dedup_pairs(emb, tau, k=8, iters=2).collect()
    }
    exact = {
        (r["id_a"], r["id_b"])
        for r in similarity.cosine_near_pairs(emb, tau).collect()
    }
    clusters = {
        r["vec_id"]: r["cluster"]
        for r in similarity.kmeans_assignments(emb, k=8, iters=2).collect()
    }
    expected = {(a, b) for a, b in exact if clusters[a] == clusters[b]}
    assert got == expected


def test_pair_substring_spans_diagonal_runs(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f"),
            (2, "x b c d e y"),
            (3, "b c d q c d e"),
        ],
        "doc_id long, text string",
    )
    shp = dedup.positional_shingles(docs)
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3)], "id_a long, id_b long"
    )
    out = {
        (r["id_a"], r["id_b"]): r
        for r in dedup.pair_substring_spans(shp, pairs, min_run=1).collect()
    }
    # docs 1&2 share the 4-token substring "b c d e" (runs of 2 shingles)
    r12 = out[(1, 2)]
    assert r12["max_shared_tokens"] == 4 and r12["n_match_positions"] == 2
    # docs 1&3 share "b c d" (diag 1) and "c d e" (diag -2): different
    # diagonals must NOT merge into a longer run — each is a 1-shingle
    # island, i.e. a 3-token substring
    r13 = out[(1, 3)]
    assert r13["max_shared_tokens"] == 3 and r13["n_match_positions"] == 2


def test_dsir_importance_prefers_target_profile(spark):
    docs = spark.createDataFrame(
        [
            (1, "aaa aaa", "en"),
            (2, "aaa aaa", "en"),
            (3, "bbb bbb", "de"),
        ],
        "doc_id long, text string, lang string",
    )
    out = {
        r["doc_id"]: r["importance"]
        for r in text.importance_weights(docs, "lang = 'en'", n_buckets=64).collect()
    }
    # exact rational expectations (see operator docstring): P=68, Q=70
    assert abs(out[1] - (10 * 70) / (10 * 68)) < 1e-15
    assert abs(out[3] - (2 * 70) / (6 * 68)) < 1e-15
    assert out[1] > 1 > out[3]


def test_threshold_crossings_hand_computed(spark):
    samples = spark.createDataFrame(
        [
            ("a", 1, 0.0), ("a", 2, 10.0), ("a", 3, 0.0), ("a", 4, 10.0),
            ("b", 1, 5.0), ("b", 2, 5.0),  # constant: thr=5, no crossings
        ],
        "channel string, t long, v double",
    )
    out = {r["channel"]: r for r in threshold_crossings(samples).collect()}
    a = out["a"]
    assert a["thr"] == 5.0
    assert (a["n_up"], a["n_down"]) == (2, 1)
    assert (a["t_first_cross"], a["t_last_cross"]) == (2, 4)
    b = out["b"]
    # v == thr throughout: never below, so no upward/downward transitions
    assert (b["n_up"], b["n_down"]) == (0, 0)
    assert b["t_first_cross"] is None


def test_sessionize_exact_gap_boundary(spark):
    """Round-9 review follow-up, pinned EMPIRICALLY: native
    session_window MERGES a pair exactly gap apart (the session
    [t, t+gap] absorbs a row starting at its end) and breaks only at a
    STRICTLY larger gap. Both the batch oracle (strict >) and the
    round-8 streaming session oracle (was >=, silently divergent — the
    tested SFs carry no boundary pair) must use the same boundary."""
    from cassandra_pv_archiver_spark.operators.events import sessionize

    gap_us = 30 * 60_000_000
    rows = [
        (1, 0, "click", 1.0),
        (1, gap_us * 1000, "click", 1.0),          # exactly 30 min later
        (2, 0, "click", 1.0),
        (2, (gap_us + 1) * 1000, "click", 1.0),    # 1 µs past the gap
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts long, event_type string, value double"
    )
    out = sessionize(ev, 30).orderBy("user_id", "session_start").collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append(r)
    assert len(by_user[1]) == 1   # exact gap -> MERGED
    assert len(by_user[2]) == 2   # past the gap -> two sessions
    # and the DuckDB oracle agrees on the same boundary
    import duckdb
    import pandas as pd

    con = duckdb.connect()
    df = pd.DataFrame(
        {"user_id": [1, 1, 2, 2],
         "ts": pd.to_datetime([0, gap_us * 1000, 0, (gap_us + 1) * 1000]),
         "event_id": [1, 2, 3, 4],
         "event_type": ["click"] * 4,
         "value": [1.0] * 4,
         "props": [""] * 4})
    con.register("events", df)
    from cassandra_pv_archiver_spark.catalog_generic import (
        SQL_SESSIONIZE_30M,
    )
    got = con.sql(SQL_SESSIONIZE_30M).df()
    n_by_user = got.groupby("user_id").size().to_dict()
    assert n_by_user == {1: 1, 2: 2}
