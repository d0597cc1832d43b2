"""Round-7 operators: stupid-backoff LM scoring, ridge probe,
boilerplate spans."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cassandra_pv_archiver_spark.operators import lm


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string, lang string")


class TestStupidBackoff:
    def test_short_docs_score_zero(self, spark):
        d = _docs(
            spark,
            [(1, "one", "en"), (2, "two tokens", "en"), (3, "", "en")],
        )
        out = {r["doc_id"]: r for r in lm.stupid_backoff_score(d).collect()}
        assert len(out) == 3
        for i in (1, 2, 3):
            assert out[i]["n_scored"] == 0
            assert out[i]["score_q9"] == 0
            assert out[i]["avg_score"] == 0.0

    def test_tiers_and_exact_grid(self, spark):
        # force doc 1 into the train slice is hash-dependent; instead use
        # train_pct=100 so EVERY doc trains and counts are transparent
        d = _docs(
            spark,
            [
                (1, "a b c a b c", "en"),  # trigrams: abc bca cab abc
                (2, "a b c", "en"),
                (3, "x y z", "en"),  # unique trigram
            ],
        )
        out = {
            r["doc_id"]: r
            for r in lm.stupid_backoff_score(d, train_pct=100).collect()
        }
        # doc 2's single trigram (a,b,c): c3 = 3 across the corpus
        # (twice in doc 1, once in doc 2); context bigram (a,b): c2 = 3.
        # score = floor(1e9 * 3 / 3) = 1e9 (a certain continuation)
        assert out[2]["n_scored"] == 1
        assert out[2]["hits3"] == 1
        assert out[2]["score_q9"] == 10**9
        assert out[2]["avg_score"] == pytest.approx(1.0)
        assert out[3]["hits3"] == 1  # its own occurrence counts
        assert out[1]["n_scored"] == 4

    def test_oov_tier(self, spark):
        # train on 100% then score a doc whose trigram/bigram/unigram are
        # all absent: splice an eval-only token sequence by scoring a
        # SEPARATE frame against counts from a disjoint train frame is
        # not the API; instead check tier-2/1/0 fallthrough arithmetic
        # via a corpus where the eval trigram never repeats but its
        # suffix bigram does.
        d = _docs(
            spark,
            [
                (1, "p q r", "en"),
                (2, "s q r", "en"),  # trigram sqr unique; bigram qr c=2
            ],
        )
        out = {
            r["doc_id"]: r
            for r in lm.stupid_backoff_score(d, train_pct=100).collect()
        }
        # both trigrams occur once => tier 3 with score 1e9 * 1 / c2(pq)=1
        assert out[1]["hits3"] == 1 and out[2]["hits3"] == 1

    def test_parallelism_invariance(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        a = lm.stupid_backoff_score(docs.repartition(1)).orderBy("doc_id")
        b = lm.stupid_backoff_score(docs.repartition(13)).orderBy("doc_id")
        ra = [tuple(r) for r in a.collect()]
        rb = [tuple(r) for r in b.collect()]
        assert ra == rb  # bit-identical at any parallelism (exact ints)

    def test_census_partitions_docs(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        per_doc = lm.stupid_backoff_score(docs)
        census = lm.backoff_census(docs)
        tot_docs = per_doc.agg(F.sum("n_scored"), F.sum("score_q9")).first()
        tot_census = census.agg(F.sum("n_scored"), F.sum("score_q9")).first()
        assert tuple(tot_docs) == tuple(tot_census)


class TestRidgeProbe:
    def test_recovery_and_fit(self, spark, sf_dir):
        from cassandra_pv_archiver_spark.operators import probe

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        out = {
            (r["kind"], r["i"]): r["value"]
            for r in probe.ridge_probe(docs, probe_ids=[0, 1]).collect()
        }
        # corpus text is whitespace-joined: n_chars = sum_len + n_tok - 1
        # exactly, so the probe must recover ~(-1, 1, 0, 1) with R^2 ~ 1
        # (ridge lambda biases the intercept slightly)
        assert abs(out[("weight", 1)] - 1.0) < 0.01
        assert abs(out[("weight", 2)]) < 0.05
        assert abs(out[("weight", 3)] - 1.0) < 0.01
        assert out[("r2", 0)] > 0.999
        assert abs(out[("residual", 0)]) < 1.0

    def test_parallelism_bit_invariance(self, spark, sf_dir):
        import struct

        from cassandra_pv_archiver_spark.operators import probe

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        a = probe.ridge_probe(docs.repartition(1)).collect()
        b = probe.ridge_probe(docs.repartition(17)).collect()
        for ra, rb in zip(a, b):
            assert struct.pack("<d", ra["value"]) == struct.pack(
                "<d", rb["value"]
            )

    def test_eager_snapshot_semantics(self, spark, tmp_path):
        """VERDICT r8 #7: construction is EAGER — the returned frame is a
        snapshot of the input at build time, reusable (and bit-stable)
        after the input's backing storage mutates."""
        import struct

        from cassandra_pv_archiver_spark.operators import probe

        src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        path = str(tmp_path / "docs")
        src.limit(200).write.parquet(path)
        docs = spark.read.parquet(path)
        fit = probe.ridge_probe(docs, probe_ids=[0])
        before = [
            (r["kind"], r["i"], struct.pack("<d", r["value"]))
            for r in fit.collect()
        ]
        # mutate the input AFTER construction: append 300 more documents
        src.limit(500).write.mode("append").parquet(path)
        after = [
            (r["kind"], r["i"], struct.pack("<d", r["value"]))
            for r in fit.collect()
        ]
        assert before == after  # snapshot: re-collect ignores the append
        # and a FRESH fit over a re-read of the mutated path does see the
        # new rows (the old `docs` frame pinned its file listing at read
        # time — that's Spark's own snapshot layer, one level below ours)
        refit = {
            (r["kind"], r["i"]): r["value"]
            for r in probe.ridge_probe(
                spark.read.parquet(path), probe_ids=[0]
            ).collect()
        }
        assert struct.pack(
            "<d", refit[("r2", 0)]
        ) != dict(((k, i), v) for k, i, v in before).get(("r2", 0))

    def test_det4_identity(self):
        from cassandra_pv_archiver_spark.operators.probe import det4

        eye = [[1.0 if i == j else 0.0 for j in range(4)] for i in range(4)]
        assert det4(eye) == 1.0
        # row swap flips sign
        sw = [eye[1], eye[0], eye[2], eye[3]]
        assert det4(sw) == -1.0


class TestBoilerplate:
    def test_spans_cover_template(self, spark):
        from cassandra_pv_archiver_spark.operators import text as t

        rows = [
            # the same 5-token banner in 2 sources + unique tails
            (1, "copy right banner text here alpha beta", "s1", 0),
            (2, "copy right banner text here gamma delta", "s2", 0),
            (3, "totally unique words nothing shared at all", "s3", 0),
        ]
        d = spark.createDataFrame(
            rows, "doc_id bigint, text string, source string, n_chars int"
        )
        out = {
            r["doc_id"]: r
            for r in t.boilerplate_spans(d, n=5, min_sources=2).collect()
        }
        assert out[1]["n_cov"] == 5 and out[2]["n_cov"] == 5
        assert out[3]["n_cov"] == 0
        assert out[1]["cov_rate"] == pytest.approx(5 / 7)

    def test_overlapping_spans_union(self, spark):
        from cassandra_pv_archiver_spark.operators import text as t

        # two overlapping flagged shingles: positions 0-4 and 1-5 ->
        # union covers 6 positions, not 10
        rows = [
            (1, "a b c d e f", "s1", 0),
            (2, "a b c d e f", "s2", 0),
        ]
        d = spark.createDataFrame(
            rows, "doc_id bigint, text string, source string, n_chars int"
        )
        out = t.boilerplate_spans(d, n=5, min_sources=2).collect()
        assert all(r["n_cov"] == 6 for r in out)

    def test_same_source_repeat_not_flagged(self, spark):
        from cassandra_pv_archiver_spark.operators import text as t

        rows = [
            (1, "one two three four five tail", "s1", 0),
            (2, "one two three four five other", "s1", 0),
        ]
        d = spark.createDataFrame(
            rows, "doc_id bigint, text string, source string, n_chars int"
        )
        out = t.boilerplate_spans(d, n=5, min_sources=2).collect()
        assert all(r["n_cov"] == 0 for r in out)


def test_stream_lm_screen_parity(spark, tmp_path):
    """Ingest-time LM screen: two micro-batches of arriving documents
    scored against frozen count tables produce EXACTLY the batch
    scorer's rows (stateless stream-static joins; integer-exact grid)."""
    import os

    from cassandra_pv_archiver_spark.operators.lm import (
        score_with_counts,
        train_counts,
    )
    from cassandra_pv_archiver_spark.streaming.detect import start_lm_screen

    train = spark.createDataFrame(
        [
            (100, "the quick brown fox jumps over the lazy dog"),
            (101, "the quick brown cat sleeps under the warm sun"),
            (102, "a slow green turtle walks past the quick brown fox"),
        ],
        "doc_id long, text string",
    )
    tri, bi, uni, tot = train_counts(train)

    arrivals = [
        (1, "the quick brown fox runs"),       # known trigrams
        (2, "completely novel words appear now here"),  # OOV-heavy
        (3, "the quick brown cat sleeps"),
        (4, "xx"),                              # too short to score
    ]
    schema = "doc_id long, text string"
    adf = spark.createDataFrame(arrivals, schema)
    want = sorted(
        tuple(r) for r in score_with_counts(adf, tri, bi, uni, tot).collect()
    )
    by_id = {w[0]: w for w in want}
    assert by_id[1][1] > 0 and by_id[2][5] > 0  # doc2 has OOV tokens
    assert by_id[4][1] == 0  # short doc scores zero

    src = str(tmp_path / "docs")
    os.makedirs(src)
    spark.createDataFrame(arrivals[:2], schema).write.mode("append").parquet(src)
    spark.createDataFrame(arrivals[2:], schema).write.mode("append").parquet(src)
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    got: list = []
    q = start_lm_screen(
        stream, tri, bi, uni, tot,
        sink=lambda df, bid: got.extend(df.collect()),
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(180)
    assert sorted(tuple(r) for r in got) == want


def test_quality_filter_report_flags(spark, sf_dir):
    """The fused report's drop counts partition consistently: kept <=
    n_docs - max(individual drops is not required (non-exclusive), but
    kept + union-of-drops == n_docs per source, and every cut matches a
    recomputation from the per-doc frames."""
    from cassandra_pv_archiver_spark import catalog_data as cd

    rep = {r["source"]: r for r in
           cd.q_quality_filter_report(spark, sf_dir).collect()}
    assert rep, "report is empty"
    for src, r in rep.items():
        assert r["kept"] <= r["n_docs"]
        assert r["drop_short"] + r["drop_lm"] + r["drop_boiler"] >= (
            r["n_docs"] - r["kept"]
        )  # non-exclusive reasons cover every dropped doc
        assert 0.0 <= r["kept_frac"] <= 1.0
    # at least one doc must actually be dropped by each rule somewhere
    # (thresholds were chosen against the measured distributions)
    assert sum(r["drop_lm"] for r in rep.values()) > 0
    assert sum(r["drop_short"] for r in rep.values()) > 0


class TestPairPagerank:
    def _pairs(self, spark, rows):
        return spark.createDataFrame(rows, "id_a bigint, id_b bigint")

    def test_star_center_outranks_leaves(self, spark):
        from cassandra_pv_archiver_spark.operators import graph

        # star: 1 connected to 2,3,4 — the center is the most central
        pr = {
            r["doc_id"]: r
            for r in graph.pair_pagerank(
                self._pairs(spark, [(1, 2), (1, 3), (1, 4)])
            ).collect()
        }
        assert pr[1]["deg"] == 3
        assert all(pr[1]["rank_q9"] > pr[i]["rank_q9"] for i in (2, 3, 4))
        # leaves are symmetric: identical ranks, exactly
        assert pr[2]["rank_q9"] == pr[3]["rank_q9"] == pr[4]["rank_q9"]

    def test_rank_mass_and_determinism(self, spark):
        from cassandra_pv_archiver_spark.operators import graph

        pairs = self._pairs(
            spark, [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3), (5, 6)]
        )
        a = sorted(tuple(r) for r in graph.pair_pagerank(pairs).collect())
        b = sorted(
            tuple(r)
            for r in graph.pair_pagerank(pairs.repartition(7)).collect()
        )
        assert a == b  # bit-identical at any parallelism (integer grid)
        # floor division only ever LOSES mass: total <= n * SCALE
        assert sum(r[2] for r in a) <= 6 * graph.SCALE

    def test_canonical_singletons_and_tie(self, spark):
        from cassandra_pv_archiver_spark.operators import graph

        docs = spark.createDataFrame(
            [(i,) for i in range(1, 6)], "doc_id bigint"
        )
        # pair cluster {1,2} (symmetric -> tie broken by min id); 3,4,5
        # are singletons at the teleport rank
        out = {
            r["comp"]: r
            for r in graph.pagerank_canonical(
                self._pairs(spark, [(1, 2)]), docs
            ).collect()
        }
        assert out[1]["canonical_id"] == 1 and out[1]["n_docs"] == 2
        for c in (3, 4, 5):
            assert out[c]["canonical_id"] == c
            assert out[c]["canonical_rank_q9"] == graph.BASE


def test_last_touch_attribution_rules(spark):
    from cassandra_pv_archiver_spark.operators.events import (
        last_touch_attribution,
    )

    H = 3600 * 1_000_000_000
    rows = [
        # user 1: click then purchase 1h later -> attributed to click
        (1, 0 * H, 1, "click", 0.0),
        (1, 1 * H, 2, "purchase", 10.0),
        # user 2: view, then purchase 25h later -> outside 24h lookback
        (2, 0 * H, 3, "view", 0.0),
        (2, 25 * H, 4, "purchase", 20.0),
        # user 3: purchase with no touch at all
        (3, 5 * H, 5, "purchase", 30.0),
        # user 4: view then click then purchase -> LAST touch (click)
        (4, 0 * H, 6, "view", 0.0),
        (4, 1 * H, 7, "click", 0.0),
        (4, 2 * H, 8, "purchase", 40.5),
    ]
    ev = spark.createDataFrame(
        rows, "user_id bigint, ts bigint, event_id bigint,"
        " event_type string, value double"
    )
    out = {r["touch_type"]: r for r in last_touch_attribution(ev).collect()}
    assert out["click"]["n_conversions"] == 2
    assert out["click"]["revenue_q2"] == 1000 + 4050
    assert out["(none)"]["n_conversions"] == 2
    assert out["(none)"]["revenue_q2"] == 2000 + 3000
    assert "view" not in out


def test_level_freshness_closure_rule(spark, sf_dir):
    """Pin the closure semantics the oracle encodes: W1 = (cut div p1
    - 1) p1 against the raw cut; W6 = (W1 div p6 - 1) p6 against the 1h
    LEVEL's hwm (not the raw cut) — and lag counts whole windows."""
    from cassandra_pv_archiver_spark import catalog

    rows = catalog.q_level_freshness_report(spark, sf_dir).collect()
    assert rows
    ns = 1_000_000_000
    by_ch = {}
    for r in rows:
        by_ch.setdefault(r["channel"], {})[r["level_s"]] = r
    for ch, lv in by_ch.items():
        r1, r6 = lv[3600], lv[21600]
        p1, p6 = 3600 * ns, 21600 * ns
        assert r1["level_hwm"] % p1 == 0 and r6["level_hwm"] % p6 == 0
        # the 6h hwm derives from the 1h hwm, one closed window back
        assert r6["level_hwm"] == (r1["level_hwm"] // p6 - 1) * p6
        assert r1["lag_periods"] >= 0 and r6["lag_periods"] >= 0
        # raw kept flowing past MID with no catch-up: both levels lag
        assert r1["lag_periods"] > 0


class TestChunkDedupRewrite:
    def test_first_occurrence_survives_and_rewrite(self, spark):
        from cassandra_pv_archiver_spark.operators import dedup

        c16 = " ".join(f"w{i}" for i in range(16))
        other = " ".join(f"x{i}" for i in range(16))
        rows = [
            (1, c16 + " " + other),   # owns both chunks
            (2, c16 + " unique tail"),  # chunk 0 duplicates doc 1's
            (3, "short doc"),
        ]
        d = spark.createDataFrame(rows, "doc_id bigint, text string")
        out = {
            r["doc_id"]: r
            for r in dedup.chunk_dedup_rewrite(d, chunk_tokens=16).collect()
        }
        assert out[1]["n_removed"] == 0 and out[1]["n_chunks"] == 2
        # doc 2 loses its first chunk, keeps the partial tail chunk
        assert out[2]["n_chunks"] == 2 and out[2]["n_removed"] == 1
        assert out[2]["cleaned_n_tokens"] == 2
        import hashlib

        assert out[2]["cleaned_md5"] == hashlib.md5(
            b"unique tail"
        ).hexdigest()
        assert out[3]["n_removed"] == 0 and out[3]["cleaned_n_tokens"] == 2

    def test_within_doc_repeat_removed(self, spark):
        from cassandra_pv_archiver_spark.operators import dedup

        c = " ".join(f"w{i}" for i in range(16))
        d = spark.createDataFrame(
            [(1, c + " " + c)], "doc_id bigint, text string"
        )
        out = dedup.chunk_dedup_rewrite(d, chunk_tokens=16).collect()[0]
        assert out["n_chunks"] == 2 and out["n_removed"] == 1
        assert out["cleaned_n_tokens"] == 16


def test_vad_segments_rule(spark):
    """VAD run structure on a constructed clip: loud frames 1-2 and 4
    active (frame=4 samples, threshold avg |s| >= 100) -> 2 segments,
    longest 2, first active 1."""
    from cassandra_pv_archiver_spark.operators import audio

    quiet = [1, -1, 2, -2]
    loud = [5000, -5000, 4000, -4000]
    samples = quiet + loud + loud + quiet + loud  # frames: Q L L Q L
    sam = spark.createDataFrame(
        [(1, samples)], "doc_id long, samples array<int>"
    )
    out = audio.vad_segments(
        sam, frame_samples=4, threshold=100, codec="pcm16"
    ).collect()[0]
    assert out["n_frames"] == 5
    assert out["n_active"] == 3
    assert out["n_segments"] == 2
    assert out["longest_run"] == 2
    assert out["first_active"] == 1

    silent = spark.createDataFrame(
        [(2, quiet * 2)], "doc_id long, samples array<int>"
    )
    z = audio.vad_segments(
        silent, frame_samples=4, threshold=100, codec="pcm16"
    ).collect()[0]
    assert z["n_segments"] == 0 and z["first_active"] == -1


def test_curate_round7_consistent_with_parts(spark, sf_dir):
    """The capstone's per-source numbers must re-derive from its
    standalone parts: kept counts from the filter report, token yield
    bounded by (0, 1], chunks_removed consistent with a rewrite of the
    kept set only."""
    from cassandra_pv_archiver_spark import catalog_data as cd

    cur = {r["source"]: r for r in
           cd.q_curate_round7(spark, sf_dir).collect()}
    rep = {r["source"]: r for r in
           cd.q_quality_filter_report(spark, sf_dir).collect()}
    assert set(cur) == set(rep)
    for src in cur:
        assert cur[src]["n_kept"] == rep[src]["kept"]
        assert cur[src]["n_docs"] == rep[src]["n_docs"]
        assert cur[src]["tokens_in"] == rep[src]["kept_tokens"]
        assert cur[src]["tokens_out"] <= cur[src]["tokens_in"]
        if cur[src]["n_kept"]:
            assert 0.0 < cur[src]["token_yield"] <= 1.0
    # the rewrite must actually remove something somewhere (near-dups
    # survive the quality filter in this corpus)
    assert sum(r["chunks_removed"] for r in cur.values()) > 0


class TestPhash:
    def test_brightness_shift_invariance_vs_dhash_sensitivity(self, spark):
        """pHash's DCT thresholding is invariant to a uniform brightness
        shift (all AC coefficients unchanged, only DC moves — and DC is
        excluded); that is the robustness upgrade over gradient dHash."""
        from cassandra_pv_archiver_spark.operators.multimodal import phash63

        import hashlib

        base = [
            hashlib.md5(f"px{i}".encode()).digest()[0] % 200
            for i in range(256)
        ]
        shifted = [v + 50 for v in base]  # uniform +50, still in range
        assert phash63(base) == phash63(shifted)

    def test_distinct_images_distinct_hashes(self, spark):
        from cassandra_pv_archiver_spark.operators.multimodal import phash63

        import hashlib

        a = [hashlib.md5(f"a{i}".encode()).digest()[0] for i in range(256)]
        b = [hashlib.md5(f"b{i}".encode()).digest()[0] for i in range(256)]
        assert phash63(a) != phash63(b)

    def test_codec_roundtrip_matches_direct(self, spark):
        """PNG and flat-block JPEG legs must both hash the decoded
        pixels to exactly the direct-formula hash (the oracle's view)."""
        from cassandra_pv_archiver_spark.operators import multimodal as mm

        import hashlib

        rows = []
        for doc_id in (2, 3):  # even -> PNG leg, odd -> JPEG leg
            cells = [
                hashlib.md5(f"{doc_id}:{i}".encode()).digest()[0]
                for i in range(256)
            ]
            rows.append((doc_id, cells))
        df = spark.createDataFrame(rows, "doc_id long, cells array<int>")
        got = {
            r["doc_id"]: r["phash"]
            for r in mm.image_phash_table(df, codec="mixed").collect()
        }
        for doc_id, cells in rows:
            assert got[doc_id] == mm.phash63(cells)


def test_stream_boilerplate_screen_parity(spark, tmp_path):
    """Ingest-time boilerplate screen: micro-batches scored against the
    frozen template set produce exactly the batch coverage rows, and
    the frozen-set scores agree with the batch operator when history
    == arrivals."""
    import os

    from cassandra_pv_archiver_spark.operators import text as t
    from cassandra_pv_archiver_spark.streaming.detect import (
        boilerplate_flagged_set,
        start_boilerplate_screen,
        stream_boilerplate_coverage,
    )

    hist_rows = [
        (100, "copy right banner text here alpha beta", "s1"),
        (101, "copy right banner text here gamma delta", "s2"),
        (102, "some other words entirely here now folks", "s3"),
    ]
    hist = spark.createDataFrame(
        hist_rows, "doc_id bigint, text string, source string"
    )
    flagged = boilerplate_flagged_set(hist, n=5, min_sources=2)

    # sanity: frozen-set scoring of the history equals the batch op
    batch_cov = {
        r["doc_id"]: (r["n_cov"], r["cov_rate"])
        for r in t.boilerplate_spans(hist, n=5, min_sources=2).collect()
    }
    frozen_cov = {
        r["doc_id"]: (r["n_cov"], r["cov_rate"])
        for r in stream_boilerplate_coverage(hist, flagged, n=5).collect()
    }
    assert batch_cov == frozen_cov

    arrivals = [
        (1, "copy right banner text here fresh tail"),
        (2, "totally novel arriving document words here"),
    ]
    schema = "doc_id bigint, text string"
    adf = spark.createDataFrame(arrivals, schema)
    want = sorted(
        tuple(r)
        for r in stream_boilerplate_coverage(adf, flagged, n=5).collect()
    )
    assert dict((w[0], w[2]) for w in want)[1] == 5  # banner covered
    assert dict((w[0], w[2]) for w in want)[2] == 0

    src = str(tmp_path / "docs")
    os.makedirs(src)
    spark.createDataFrame(arrivals[:1], schema).write.mode("append").parquet(src)
    spark.createDataFrame(arrivals[1:], schema).write.mode("append").parquet(src)
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    got: list = []
    q = start_boilerplate_screen(
        stream, flagged,
        sink=lambda df, bid: got.extend(df.collect()),
        n=5, checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(180)
    assert sorted(tuple(r) for r in got) == want


class TestRound7Properties:
    def test_lm_score_bounds_and_tier_partition(self, spark, sf_dir):
        """Grid invariants: every per-doc score sum fits the grid
        (score_q9 <= n_scored * SCALE), tiers partition n_scored, and
        train_pct=0 makes every token OOV with score 0."""
        from cassandra_pv_archiver_spark.operators import lm

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        rows = lm.stupid_backoff_score(docs).collect()
        for r in rows:
            assert 0 <= r["score_q9"] <= r["n_scored"] * lm.SCALE
            assert (
                r["hits3"] + r["hits2"] + r["hits1"] + r["oov"]
                == r["n_scored"]
            )
        zero = lm.stupid_backoff_score(docs.limit(50), train_pct=0).collect()
        for r in zero:
            assert r["score_q9"] == 0 and r["hits3"] == 0
            assert r["oov"] == r["n_scored"]

    def test_boilerplate_cov_bounds(self, spark, sf_dir):
        from cassandra_pv_archiver_spark.operators import text as t

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        for r in t.boilerplate_spans(docs).collect():
            assert 0 <= r["n_cov"] <= r["n_tokens"]
            assert 0.0 <= r["cov_rate"] <= 1.0

    def test_chunk_rewrite_conservation(self, spark, sf_dir):
        """Token conservation: cleaned tokens + removed-chunk tokens ==
        original tokens (every chunk is fully kept or fully removed,
        and only the final chunk may be partial)."""
        from cassandra_pv_archiver_spark.operators import dedup
        from pyspark.sql import functions as F

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        c = 16
        rw = dedup.chunk_dedup_rewrite(docs, chunk_tokens=c)
        orig = docs.select(
            "doc_id",
            F.expr(
                "size(filter(split(lower(text), '\\\\s+'), x -> x != ''))"
            ).alias("n_orig"),
        )
        for r in rw.join(orig, "doc_id").collect():
            assert r["cleaned_n_tokens"] <= r["n_orig"]
            if r["n_removed"] == 0:
                assert r["cleaned_n_tokens"] == r["n_orig"]
            else:
                # removed chunks account for the difference; all but
                # possibly one removed chunk are full-size
                diff = r["n_orig"] - r["cleaned_n_tokens"]
                assert diff >= (r["n_removed"] - 1) * c + 1
                assert diff <= r["n_removed"] * c

    def test_pagerank_iteration_zero_is_uniform(self, spark):
        """iters=0 returns the uniform initial rank for every node."""
        from cassandra_pv_archiver_spark.operators import graph

        pairs = spark.createDataFrame(
            [(1, 2), (2, 3)], "id_a bigint, id_b bigint"
        )
        out = graph.pair_pagerank(pairs, iters=0).collect()
        assert {r["rank_q9"] for r in out} == {graph.SCALE}
