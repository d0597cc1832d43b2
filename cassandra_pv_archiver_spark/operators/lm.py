"""N-gram language-model quality scoring (stupid backoff), integer-exact.

The CCNet / RefinedWeb quality-filtering step scores every document with
an n-gram LM trained on a reference slice and drops the worst tail. The
classic scorer is a KenLM perplexity: sum of per-token log-probs — which
is float-ADDITION-ORDER-sensitive, so a distributed engine cannot
value-hash it against an oracle. This module keeps the same backoff
structure (Brants et al. 2007, "Large Language Models in Machine
Translation" — stupid backoff: S(w3|w1w2) = c(w1w2w3)/c(w1w2), else
0.4·c(w2w3)/c(w2), else 0.4²·c(w3)/T) but quantizes each per-token score
to an INTEGER on a fixed 1e-9 grid via integer division, so the per-doc
sum is BIGINT-exact and bit-checkable on any cluster and in the DuckDB
oracle.

100 TB shape: the train slice is a deterministic md5 hash-threshold
split (no shuffle), the three count tables are token-key groupBys with
map-side partial aggregation, and scoring is five shuffle equi-joins of
the trigram stream against the (much smaller, aggregated) count tables —
the same join-per-backoff-level shape a distributed KenLM scorer pays.
Frequent n-grams ("the", "a a") are skewed join keys: the count side is
unique per key, so AQE skew-join splitting handles the probe side; no
salting needed because the build side never explodes. The corpus total T
rides along as a broadcast single-row cross join (no driver collect —
the whole score is ONE lazy plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from . import sampling
from .text import _WORDS

#: score grid: per-token scores are integers in [0, SCALE]
SCALE = 1_000_000_000
#: stupid-backoff discount 0.4 (and 0.4² = 0.16) on the same grid
BACK1 = SCALE * 4 // 10
BACK2 = SCALE * 16 // 100


def stupid_backoff_score(
    docs: DataFrame, salt: str = "lm", train_pct: int = 50
) -> DataFrame:
    """Per-document stupid-backoff trigram score over a deterministic
    hash-split train slice. Every token position with a full trigram
    context (pos >= 2) is scored on the integer grid:

    - trigram hit:  (SCALE · c3) div c2   (c2 = count of context bigram)
    - bigram hit:   (BACK1 · c23) div c1(w2)
    - unigram hit:  (BACK2 · c1(w3)) div T
    - OOV:          0

    Ratios are <= 1 by construction (every trigram occurrence contains
    its context-bigram occurrence, every (w2,w3) occurrence contains a
    w2 occurrence), so scores fit the grid; products go through
    DECIMAL(38,0) so a trillion-occurrence n-gram cannot overflow.

    Returns one row per input document: doc_id, n_scored, hits3, hits2,
    hits1, oov, score_q9 (exact BIGINT sum on the 1e-9 grid), avg_score
    (score_q9 / n_scored / 1e9, rounded to 9 — a single fixed-order
    division expression, no float aggregation anywhere).
    """
    thr = 65536 * train_pct // 100
    train = docs.filter(sampling.hash_bucket16("doc_id", salt) < thr)
    return score_with_counts(docs, *train_counts(train))


def train_counts(
    train_docs: DataFrame,
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """The LM itself: (tri, bi, uni, tot) count tables from a training
    corpus — three token-key groupBys with map-side partial aggregation
    plus the scalar token total. Freeze these (e.g. via the archive
    store) to score arriving batches stream-statically."""
    tr = train_docs.select(F.expr(_WORDS).alias("w"))
    tr_tok = tr.select(F.explode("w").alias("t"))
    uni = tr_tok.groupBy("t").agg(F.count(F.lit(1)).alias("c1"))
    tot = tr_tok.agg(F.count(F.lit(1)).alias("T"))
    bi = (
        tr.filter(F.size("w") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(w) - 2),"
                    " i -> struct(w[i] AS a, w[i+1] AS b))"
                )
            ).alias("g")
        )
        .select("g.a", "g.b")
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("c2"))
    )
    tri = (
        tr.filter(F.size("w") >= 3)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(w) - 3),"
                    " i -> struct(w[i] AS a, w[i+1] AS b, w[i+2] AS c))"
                )
            ).alias("g")
        )
        .select("g.a", "g.b", "g.c")
        .groupBy("a", "b", "c")
        .agg(F.count(F.lit(1)).alias("c3"))
    )
    return tri, bi, uni, tot


def score_with_counts(
    docs: DataFrame,
    tri: DataFrame,
    bi: DataFrame,
    uni: DataFrame,
    tot: DataFrame,
) -> DataFrame:
    """Score ``docs`` against FROZEN count tables (see
    :func:`train_counts`) — the stream-static shape: per micro-batch,
    the arriving documents join the broadcast/shuffled count tables and
    nothing else; stateless, so a replayed stream scores identically to
    one batch pass (parity-pinned in tests)."""
    d = docs.select("doc_id", F.expr(_WORDS).alias("w"))
    ev = d.filter(F.size("w") >= 3).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(w) - 3),"
                " i -> struct(w[i] AS w1, w[i+1] AS w2, w[i+2] AS w3))"
            )
        ).alias("g"),
    ).select("doc_id", "g.w1", "g.w2", "g.w3")

    j = (
        ev.join(
            tri.select(
                F.col("a").alias("w1"), F.col("b").alias("w2"),
                F.col("c").alias("w3"), "c3",
            ),
            ["w1", "w2", "w3"], "left",
        )
        .join(
            bi.select(
                F.col("a").alias("w1"), F.col("b").alias("w2"),
                F.col("c2").alias("c2ctx"),
            ),
            ["w1", "w2"], "left",
        )
        .join(
            bi.select(
                F.col("a").alias("w2"), F.col("b").alias("w3"),
                F.col("c2").alias("c23"),
            ),
            ["w2", "w3"], "left",
        )
        .join(uni.select(F.col("t").alias("w2"), F.col("c1").alias("c1w2")),
              ["w2"], "left")
        .join(uni.select(F.col("t").alias("w3"), F.col("c1").alias("c1w3")),
              ["w3"], "left")
        .crossJoin(F.broadcast(tot))
    )
    dec = "CAST({} AS DECIMAL(38,0))"
    score = F.expr(
        "CASE"
        f" WHEN c3 IS NOT NULL THEN CAST({dec.format('c3')} * {SCALE}"
        "      DIV c2ctx AS BIGINT)"
        f" WHEN c23 IS NOT NULL THEN CAST({dec.format('c23')} * {BACK1}"
        "      DIV c1w2 AS BIGINT)"
        f" WHEN c1w3 IS NOT NULL THEN CAST({dec.format('c1w3')} * {BACK2}"
        "      DIV T AS BIGINT)"
        " ELSE CAST(0 AS BIGINT) END"
    )
    tier = F.expr(
        "CASE WHEN c3 IS NOT NULL THEN 3 WHEN c23 IS NOT NULL THEN 2"
        " WHEN c1w3 IS NOT NULL THEN 1 ELSE 0 END"
    )
    per_doc = (
        j.select("doc_id", score.alias("s"), tier.alias("tier"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_scored"),
            F.sum(F.when(F.col("tier") == 3, 1).otherwise(0)).alias("hits3"),
            F.sum(F.when(F.col("tier") == 2, 1).otherwise(0)).alias("hits2"),
            F.sum(F.when(F.col("tier") == 1, 1).otherwise(0)).alias("hits1"),
            F.sum(F.when(F.col("tier") == 0, 1).otherwise(0)).alias("oov"),
            F.sum("s").alias("score_q9"),
        )
    )
    spine = docs.select("doc_id")
    z = F.lit(0).cast("bigint")
    return spine.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_scored", z).alias("n_scored"),
        F.coalesce("hits3", z).alias("hits3"),
        F.coalesce("hits2", z).alias("hits2"),
        F.coalesce("hits1", z).alias("hits1"),
        F.coalesce("oov", z).alias("oov"),
        F.coalesce("score_q9", z).alias("score_q9"),
        F.when(
            F.coalesce("n_scored", z) > 0,
            F.round(
                F.col("score_q9").cast("double")
                / F.col("n_scored").cast("double")
                / F.lit(float(SCALE)),
                9,
            ),
        ).otherwise(F.lit(0.0)).alias("avg_score"),
    )


def backoff_census(
    docs: DataFrame, salt: str = "lm", train_pct: int = 50
) -> DataFrame:
    """Corpus-level backoff census by language: how much of each
    language's token mass the train-slice LM covers at each backoff
    tier — the held-out-coverage dashboard a curation run reads before
    trusting the LM filter. Exact integer tier counts; fractions are one
    fixed division expression each (rounded to 6), never a float sum.
    """
    per_doc = stupid_backoff_score(docs, salt=salt, train_pct=train_pct)
    g = (
        per_doc.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.sum("n_scored").alias("n_scored"),
            F.sum("hits3").alias("hits3"),
            F.sum("hits2").alias("hits2"),
            F.sum("hits1").alias("hits1"),
            F.sum("oov").alias("oov"),
            F.sum("score_q9").alias("score_q9"),
        )
    )
    frac = lambda c: F.when(  # noqa: E731
        F.col("n_scored") > 0,
        F.round(F.col(c).cast("double") / F.col("n_scored").cast("double"), 6),
    ).otherwise(F.lit(0.0))
    return g.select(
        "lang", "n_scored", "hits3", "hits2", "hits1", "oov", "score_q9",
        frac("hits3").alias("frac3"),
        frac("hits2").alias("frac2"),
        frac("hits1").alias("frac1"),
        frac("oov").alias("frac_oov"),
    )
