"""Round-5 operator semantics: n-gram novelty, context chunking,
group-level split guard, curriculum bins, and manifest-diff CDC."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cassandra_pv_archiver_spark.operators.sampling import (
    context_chunks,
    group_split_assign,
)
from cassandra_pv_archiver_spark.operators.text import ngram_novelty
from cassandra_pv_archiver_spark.sources.archive_store import ArchiveStore


def test_ngram_novelty_known_counts(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c"),      # bigrams: "a b", "b c"
            (2, "a b a b"),    # bigrams: "a b", "b a", "a b"
            (3, "x"),          # no bigrams
            (4, ""),           # no tokens at all
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in ngram_novelty(docs).collect()}
    # corpus counts: "a b" x3, "b c" x1, "b a" x1
    assert (out[1].n_bigrams, out[1].freq_sum) == (2, 3 + 1)
    assert out[1].avg_bigram_freq == pytest.approx(2.0)
    assert (out[2].n_bigrams, out[2].freq_sum) == (3, 3 + 1 + 3)
    assert out[2].avg_bigram_freq == pytest.approx(7 / 3)
    assert (out[3].n_bigrams, out[3].freq_sum, out[3].avg_bigram_freq) == (0, 0, 0.0)
    assert (out[4].n_bigrams, out[4].freq_sum, out[4].avg_bigram_freq) == (0, 0, 0.0)


def test_context_chunks_boundaries(spark):
    docs = spark.createDataFrame(
        [(1, 0), (2, 1), (3, 128), (4, 129), (5, 96 * 2)],
        "doc_id long, n_tokens long",
    )
    rows = context_chunks(docs, window_tokens=128, stride=96).collect()
    by_doc: dict[int, list] = {}
    for r in sorted(rows, key=lambda r: (r.doc_id, r.chunk_idx)):
        by_doc.setdefault(r.doc_id, []).append((r.tok_start, r.tok_len))
    assert 1 not in by_doc                      # token-less: no chunks
    assert by_doc[2] == [(0, 1)]
    assert by_doc[3] == [(0, 128), (96, 32)]    # start 96 < 128 -> short tail
    assert by_doc[4] == [(0, 128), (96, 33)]
    assert by_doc[5] == [(0, 128), (96, 96)]    # n = 192: second chunk full
    # every token covered: max(start+len) == n
    assert max(s + n for s, n in by_doc[4]) == 129


def test_context_chunks_rejects_bad_params(spark):
    docs = spark.createDataFrame([(1, 5)], "doc_id long, n_tokens long")
    with pytest.raises(ValueError):
        context_chunks(docs, stride=0)


def test_group_split_no_leakage(spark):
    rows = [(i, f"src{i % 7}") for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    s = group_split_assign(docs, group_col="source")
    k = (
        s.groupBy("source")
        .agg(F.countDistinct("split").alias("k"))
        .agg(F.max("k"))
        .first()[0]
    )
    assert k == 1  # no source straddles splits
    # and the assignment is the pure hash of the source (stable rerun)
    a = {(r.doc_id, r.split) for r in s.collect()}
    b = {(r.doc_id, r.split) for r in group_split_assign(docs, "source").collect()}
    assert a == b


def test_read_changes_manifest_diff(spark, tmp_path):
    store = ArchiveStore(spark, str(tmp_path / "arch"))
    mk = lambda rows: spark.createDataFrame(
        rows, "channel string, t long, v double, severity int, status int"
    )
    store.write_samples(mk([("A", 1, 1.0, 0, 0), ("A", 2, 2.0, 0, 0)]), 0)
    store.write_samples(mk([("A", 3, 3.0, 0, 0), ("B", 1, 9.0, 0, 0)]), 0)
    v1, v2 = store.level_versions(0)
    got = {(r.channel, r.t, r.v) for r in store.read_changes(0, v1, v2).collect()}
    assert got == {("A", 3, 3.0), ("B", 1, 9.0)}
    # same-version diff is empty with the right schema
    assert store.read_changes(0, v2, v2).count() == 0
    # a rewrite (compaction) in the window breaks append-only CDC: refuse
    store2 = ArchiveStore(spark, str(tmp_path / "arch"), keep_versions=3)
    store2.compact(0)
    vs = store2.level_versions(0)
    with pytest.raises(ValueError, match="rewrote"):
        store2.read_changes(0, vs[0], vs[-1])
    with pytest.raises(ValueError, match="not retained"):
        store2.read_changes(0, 999_999, vs[-1])


def test_curriculum_bin_boundary_ties(spark):
    """Docs exactly AT a cutoff stay in the lower bin (score > cutoff is
    strict) — the rule both engines state identically."""
    from cassandra_pv_archiver_spark.operators.stats import (
        group_discrete_quantiles,
    )

    # 8 docs, scores 1..8 -> type-1 quartile cutoffs at ranks 2, 4, 6
    rows = [(i, "en", float(i)) for i in range(1, 9)]
    m = spark.createDataFrame(rows, "doc_id long, lang string, score double")
    cuts = group_discrete_quantiles(
        m, "lang", "score", (0.25, 0.5, 0.75), tiebreak_col="doc_id"
    )
    assert {(r.q, r.q_value) for r in cuts.collect()} == {
        (0.25, 2.0), (0.5, 4.0), (0.75, 6.0),
    }
    binned = (
        m.join(F.broadcast(cuts), "lang")
        .groupBy("doc_id")
        .agg(
            (1 + F.sum((F.col("score") > F.col("q_value")).cast("int")))
            .alias("bin")
        )
    )
    bins = {r.doc_id: r.bin for r in binned.collect()}
    # score == cutoff stays LOW: doc 2 -> bin 1, doc 4 -> bin 2, doc 6 -> bin 3
    assert bins == {1: 1, 2: 1, 3: 2, 4: 2, 5: 3, 6: 3, 7: 4, 8: 4}


try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    _HYP = True
except ImportError:  # pragma: no cover
    _HYP = False


if _HYP:

    @given(
        ns=st.lists(st.integers(min_value=0, max_value=500),
                    min_size=1, max_size=12),
        window=st.integers(min_value=1, max_value=64),
        stride_frac=st.integers(min_value=1, max_value=64),
    )
    @settings(max_examples=20, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    def test_context_chunks_cover_every_token(spark, ns, window, stride_frac):
        """Invariants for any (window, stride <= window): chunk starts are
        k*stride, lengths in (0, window], the union of chunks covers
        exactly [0, n), and consecutive chunks overlap by window-stride
        (except the short tail)."""
        stride = max(1, min(window, stride_frac))
        docs = spark.createDataFrame(
            [(i, n) for i, n in enumerate(ns)], "doc_id long, n_tokens long"
        )
        from cassandra_pv_archiver_spark.operators.sampling import context_chunks

        rows = context_chunks(
            docs, window_tokens=window, stride=stride
        ).collect()
        by_doc: dict[int, list] = {}
        for r in rows:
            by_doc.setdefault(r.doc_id, []).append(r)
        for i, n in enumerate(ns):
            chunks = sorted(by_doc.get(i, []), key=lambda r: r.chunk_idx)
            if n == 0:
                assert not chunks
                continue
            covered = set()
            for j, r in enumerate(chunks):
                assert r.chunk_idx == j
                assert r.tok_start == j * stride
                assert 0 < r.tok_len <= window
                assert r.tok_start + r.tok_len <= n
                covered.update(range(r.tok_start, r.tok_start + r.tok_len))
            assert covered == set(range(n))

    @given(
        texts=st.lists(
            st.text(alphabet="ab ", min_size=0, max_size=12),
            min_size=1,
            max_size=8,
        )
    )
    @settings(max_examples=15, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    def test_ngram_novelty_conservation(spark, texts):
        """Sum of freq_sum over docs == sum over distinct bigrams of
        count^2 (each of the c occurrences of a bigram contributes c),
        and n_bigrams == max(0, tokens - 1) per doc."""
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        from cassandra_pv_archiver_spark.operators.text import ngram_novelty

        out = ngram_novelty(docs).collect()
        toks = [t.split() for t in texts]
        for r in out:
            assert r.n_bigrams == max(0, len(toks[r.doc_id]) - 1)
        from collections import Counter

        c = Counter(
            " ".join(p)
            for ws in toks
            for p in zip(ws, ws[1:])
        )
        assert sum(r.freq_sum for r in out) == sum(v * v for v in c.values())


class TestDecontamFunnel:
    def test_contaminated_always_flagged_and_fp_counted(self, spark):
        from pyspark.sql import functions as F

        from cassandra_pv_archiver_spark.operators import dedup, sketches

        text_bench = " ".join(f"b{i}" for i in range(12))
        text_dup = text_bench  # contaminated doc: identical shingles
        text_clean = " ".join(f"c{i}" for i in range(12))
        docs = spark.createDataFrame(
            [
                (0, "src", text_bench),   # the benchmark doc itself
                (1, "src", text_dup),     # contaminated
                (2, "src", text_clean),   # clean
            ],
            "doc_id long, source string, text string",
        )
        sh = dedup.shingles(docs).join(
            docs.select("doc_id", "source"), "doc_id"
        )
        bench = docs.filter(F.col("doc_id") == 0).select("doc_id")
        out = sketches.bloom_two_stage_funnel(
            sh, bench, group_col="source"
        ).collect()
        assert len(out) == 1
        r = out[0]
        # benchmark doc excluded; contaminated doc flagged AND confirmed
        # (no false negatives by construction); fp work = flagged-confirmed
        assert r.n_docs == 2
        assert r.n_confirmed == 1
        assert r.n_flagged >= r.n_confirmed
        assert r.n_fp_docs == r.n_flagged - r.n_confirmed
        assert r.confirm_rate is not None
