"""BM25 retrieval over the document corpus, integer-exact.

A training-data pipeline needs corpus search: dedup forensics ("which
documents match this boilerplate probe"), targeted decontamination
(query = benchmark passage), and mixture curation (retrieve-then-weight).
The classic scorer is Okapi BM25; its log-idf is a per-term monotone
transform whose float evaluation (``ln`` ULP differences across libm
implementations) cannot be value-hashed across engines, so — following
this repo's integer-grid discipline (operators/lm.py avoids log the same
way) — the idf here is the **log-free Robertson/Spärck-Jones odds
ratio** on a 1e-9 grid::

    g          = greatest(1, (N * Q) div GRID_DIV)  -- Q = #query terms;
                 -- GRID_DIV = 2e9, NOT the 4e9 the overflow bound needs:
                 -- floor() can halve the ratio, so the implemented
                 -- divisor carries 2x headroom (see GRID_DIV's comment)
    idf_q9(t)  = (SCALE * (2*(N - df) + 1)) div ((2*df + 1) * g)
                 -- exact rational form of (N - df + 0.5)/(df + 0.5),
                 -- grid coarsened by g so the BIGINT output cannot
                 -- overflow (see bound below); g = 1 for N*Q < 2e9,
                 -- i.e. every current fixture is bit-unchanged

and the tf leg is classic BM25 saturation + length normalization with
k1 = 6/5, b = 3/4 as exact rationals (TT = total corpus tokens, dl =
doc length, avgdl = TT/N)::

    contrib_q9 = (idf_q9 * 44 * tf * TT)
                 div (20*tf*TT + 6*TT + 18*dl*N)

(derivation: tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)) with every
denominator cleared; 44/20 = k1+1 over the common factor). Products run
through DECIMAL(38,0): worst case ``idf_q9 * 44 * tf * TT`` at
N = 1e10 docs / TT = 1e13 tokens is ~1e37 < 1e38. Per-document scores
are BIGINT sums of per-term integers — addition-order-free, hence
bit-identical on any partitioning and in the DuckDB oracle.

BIGINT output bound (the reason for ``g``): a term's contribution is at
most ``idf_q9 * 44/20``, and ``idf_q9 <= SCALE * (2N+1) / (3g)``. With
``g >= N*Q/4e9`` that gives ``Q * contrib <= 2.2 * 1e9 * (2/3) * 4e9
~ 5.9e18 < 2^63-1`` — the whole-query score fits int64 at ANY corpus
size. Without ``g``, df = 1 at N = 1e10 puts a single contribution at
~1.5e19, past int64 (Spark's non-ANSI cast would return NULL, DuckDB
would raise — a silent cross-engine divergence at exactly the
docstring's stated envelope).

100 TB shape: the query-term list is a tiny literal, so per-document
term frequencies are computed INSIDE the row (``size(filter(words,
x -> x = term))`` per term — no explode of the corpus vocabulary, no
shuffle until the statistics); df/N/TT are one global aggregate plus a
k-row per-term aggregate, both broadcast back; the final top-k is a
``TakeOrderedAndProject`` (per-partition heads, never a full sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text import _WORDS

SCALE = 1_000_000_000
#: k1 = 6/5, b = 3/4 cleared to integer coefficients (see module doc)
C_NUM, C_TF, C_CONST, C_DL = 44, 20, 6, 18
#: grid-coarsening threshold: g = max(1, N*Q div GRID_DIV) keeps the
#: BIGINT score sum under 2^63 at any corpus size. 2e9, not 4e9: floor
#: can halve the ratio (floor(x) >= x/2 for x >= 1), so the divisor
#: must leave 2x headroom against the 4e9 the bound itself needs
GRID_DIV = 2_000_000_000


def bm25_topk(
    docs: DataFrame, query_terms: list[str], k: int = 20
) -> DataFrame:
    """Top-``k`` documents for ``query_terms`` under integer-grid BM25.

    Returns: doc_id, n_hit_terms, score_q9 — ordered by (score desc,
    doc_id) with ties broken deterministically; only documents matching
    at least one query term appear.
    """
    out = bm25_scores(docs, query_terms)
    return out.orderBy(F.desc("score_q9"), "doc_id").limit(k)


def bm25_scores(docs: DataFrame, query_terms: list[str]) -> DataFrame:
    """Every matching document's integer-grid BM25 score (the un-limited
    scoring frame behind :func:`bm25_topk`) — the shape a
    retrieval-guarded decontamination pass consumes: score every doc
    against a benchmark probe, drop above a threshold."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = sorted(set(query_terms))

    base = docs.select(
        "doc_id",
        F.expr(_WORDS).alias("_w"),
    ).select(
        "doc_id",
        F.size("_w").alias("dl"),
        *[
            F.expr(f"size(filter(_w, x -> x = '{t}'))").alias(f"_tf{i}")
            for i, t in enumerate(terms)
        ],
    )
    # corpus stats: one row (N docs, TT tokens) + per-term df — tiny,
    # broadcast back against the scan
    stats = base.agg(
        F.count(F.lit(1)).alias("N"),
        F.sum("dl").alias("TT"),
        *[
            F.sum((F.col(f"_tf{i}") > 0).cast("long")).alias(f"_df{i}")
            for i in range(len(terms))
        ],
    )
    scored = base.join(F.broadcast(stats))
    d38 = "CAST({} AS DECIMAL(38,0))"
    # overflow guard (module doc): coarsen the idf grid once N*Q passes
    # GRID_DIV; greatest(1, ...) keeps every small corpus bit-unchanged
    g = f"greatest(CAST(1 AS BIGINT), (N * {len(terms)}) div {GRID_DIV})"
    contribs = []
    for i in range(len(terms)):
        tf, df = f"_tf{i}", f"_df{i}"
        idf = (
            f"(CAST({SCALE} AS DECIMAL(38,0)) * (2 * (N - {df}) + 1))"
            f" div ((2 * {df} + 1) * {g})"
        )
        num = f"({d38.format(idf)} * {C_NUM} * {tf} * TT)"
        den = (
            f"({d38.format(f'{C_TF} * {tf}')} * TT"
            f" + {d38.format(f'{C_CONST}')} * TT"
            f" + {d38.format(f'{C_DL} * dl')} * N)"
        )
        contribs.append(
            f"CASE WHEN {tf} > 0 THEN CAST({num} div {den} AS BIGINT)"
            f" ELSE CAST(0 AS BIGINT) END"
        )
    hit = " + ".join(
        f"CASE WHEN _tf{i} > 0 THEN 1 ELSE 0 END"
        for i in range(len(terms))
    )
    return scored.select(
        "doc_id",
        F.expr(hit).cast("int").alias("n_hit_terms"),
        F.expr(" + ".join(contribs)).alias("score_q9"),
    ).filter(F.col("n_hit_terms") > 0)


def bm25_oracle_sql(
    query_terms: list[str], k: int = 20, docs_sql: str = "documents"
) -> str:
    """The DuckDB mirror of :func:`bm25_topk` (same grid, same fixed
    evaluation order; HUGEINT stands in for DECIMAL(38,0))."""
    return bm25_scores_ctes(query_terms, docs_sql=docs_sql) + f"""
SELECT doc_id, n_hit_terms, score_q9 FROM bmscored
WHERE n_hit_terms > 0
ORDER BY score_q9 DESC, doc_id LIMIT {k}
"""


def bm25_scores_ctes(
    query_terms: list[str], docs_sql: str = "documents"
) -> str:
    """The scoring CTE block (``bmbase``/``bmstats``/``bmscored``) — the
    DuckDB mirror of :func:`bm25_scores`, composable into larger
    pipeline oracles (``bmscored`` keeps non-matching docs at score 0;
    filter ``n_hit_terms > 0`` for parity with the Spark frame)."""
    terms = sorted(set(query_terms))
    tf_cols = ", ".join(
        f"len(list_filter(w, x -> x = '{t}')) AS tf{i}"
        for i, t in enumerate(terms)
    )
    df_cols = ", ".join(
        f"sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}"
        for i in range(len(terms))
    )
    g = f"greatest(1, (N * {len(terms)}) // {GRID_DIV})"
    contribs = []
    for i in range(len(terms)):
        idf = (
            f"((CAST({SCALE} AS HUGEINT) * (2 * (N - df{i}) + 1))"
            f" // ((2 * df{i} + 1) * {g}))"
        )
        num = f"(CAST({idf} AS HUGEINT) * {C_NUM} * tf{i} * TT)"
        den = (
            f"(CAST({C_TF} * tf{i} AS HUGEINT) * TT"
            f" + CAST({C_CONST} AS HUGEINT) * TT"
            f" + CAST({C_DL} * dl AS HUGEINT) * N)"
        )
        contribs.append(
            f"CASE WHEN tf{i} > 0 THEN CAST({num} // {den} AS BIGINT)"
            f" ELSE CAST(0 AS BIGINT) END"
        )
    hit = " + ".join(
        f"CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END" for i in range(len(terms))
    )
    w_sql = (
        "list_filter(regexp_split_to_array(lower(text), '\\s+'),"
        " x -> x != '')"
    )
    return f"""
bmbase AS (
  SELECT doc_id, len(w) AS dl, {tf_cols}
  FROM (SELECT doc_id, {w_sql} AS w FROM {docs_sql})
),
bmstats AS (
  SELECT count(*) AS N, sum(dl) AS TT, {df_cols} FROM bmbase
),
bmscored AS (
  SELECT doc_id,
         CAST({hit} AS INTEGER) AS n_hit_terms,
         CAST({" + ".join(contribs)} AS BIGINT) AS score_q9
  FROM bmbase CROSS JOIN bmstats
)"""
