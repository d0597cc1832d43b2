"""Linear (ridge) probe over document features, exact normal equations.

The training-data analog of "fit a linear probe on cheap features and
read its weights": predict a target column from token-structure features
with ridge regression. Production pipelines use such probes for quality
models and leakage checks; the hard part on a cluster is determinism —
gradient descent is float-order-sensitive, so two runs (or an engine and
its oracle) disagree in the last bits.

This module fits the probe EXACTLY the way the PCA operator computes its
scatter matrix (operators/similarity.pca_top_component): the distributed
work is ONE aggregation of integer-exact sufficient statistics
(Σ x_i x_j, Σ x_i y, Σ y² as DECIMAL(38,0) — the normal-equations
matrix), and the 4×4 solve is bounded driver-side metadata math via
Cramer's rule with a FIXED permutation expansion order, evaluated in
IEEE doubles after the exact big-integer → double decomposition. The
DuckDB oracle evaluates the SAME expression tree over the SAME exact
sums, so weights, R², and per-document residuals agree bit-for-bit.

Features (all exact integers — no scaling needed):
  x0 = 1 (intercept), x1 = token count, x2 = distinct-token count,
  x3 = total token characters; target y = n_chars.
Because the corpus text is whitespace-joined, y ≈ x3 + x1 − 1 exactly,
so the probe doubles as a self-attesting recovery test: weights land
near (−1, 1, 0, 1) and R² near 1 (ridge λ biases them slightly — the
bias is part of the pinned value).
"""

from __future__ import annotations

from itertools import permutations

from pyspark.sql import DataFrame, functions as F

from .similarity import _big_int_to_double
from .text import _WORDS

#: ridge penalty added to the diagonal of XtX (exact integer)
RIDGE_LAMBDA = 1

#: 4×4 determinant expansion: (sign, permutation) in lexicographic
#: permutation order. SHARED with the SQL oracle generator so both
#: engines accumulate the 24 products in the identical order.
DET4_PERMS: list[tuple[int, tuple[int, ...]]] = []
for _p in permutations(range(4)):
    _inv = sum(
        1
        for _i in range(4)
        for _j in range(_i + 1, 4)
        if _p[_i] > _p[_j]
    )
    DET4_PERMS.append((1 if _inv % 2 == 0 else -1, _p))


def det4(m: list[list[float]]) -> float:
    """Fixed-order 24-term expansion; left-fold accumulation."""
    acc = 0.0
    for sign, p in DET4_PERMS:
        term = m[0][p[0]] * m[1][p[1]] * m[2][p[2]] * m[3][p[3]]
        acc = acc + term if sign > 0 else acc - term
    return acc


def feature_frame(docs: DataFrame) -> DataFrame:
    """doc_id + the exact integer feature/target columns."""
    return docs.select(
        "doc_id",
        F.expr(_WORDS).alias("_w"),
        F.col("n_chars").cast("bigint").alias("y"),
    ).select(
        "doc_id",
        F.lit(1).cast("bigint").alias("x0"),
        F.size("_w").cast("bigint").alias("x1"),
        F.size(F.array_distinct("_w")).cast("bigint").alias("x2"),
        F.expr(
            "aggregate(_w, CAST(0 AS BIGINT), (acc, x) -> acc + length(x))"
        ).alias("x3"),
        "y",
    )


def ridge_probe(
    docs: DataFrame,
    probe_ids: list[int] | None = None,
    lam: int = RIDGE_LAMBDA,
) -> DataFrame:
    """Fit the ridge probe; return a tall frame of pinned values:

    - kind='weight',   i=0..3:  w_i  (Cramer, fixed-order doubles)
    - kind='r2',       i=0:     1 − SSE/SST (algebraic — SSE from the
      exact sums and the weights, never a float sum over rows)
    - kind='residual', i=doc_id (for ``probe_ids``): y − ŷ

    Construction is EAGER: the sufficient-statistics aggregation runs
    (one corpus scan, 16 scalars collected — the PCA-scatter precedent)
    when this function is CALLED, not when the returned frame is
    consumed. The result is therefore a snapshot of ``docs`` at build
    time; merely wiring the query (explain/audit) pays the scan.
    """
    spark = docs.sparkSession
    f = feature_frame(docs)
    cols = ["x0", "x1", "x2", "x3"]
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    aggs = []
    for i in range(4):
        for j in range(i, 4):
            aggs.append(
                F.sum(d38(cols[i]) * d38(cols[j])).alias(f"a{i}{j}")
            )
    for i in range(4):
        aggs.append(F.sum(d38(cols[i]) * d38("y")).alias(f"b{i}"))
    aggs.append(F.sum(d38("y") * d38("y")).alias("yy"))
    aggs.append(F.count(F.lit(1)).alias("n"))
    out_schema = "kind string, i bigint, value double"
    row = f.agg(*aggs).collect()[0]  # 16 scalars: bounded metadata,
    # the same driver-side contract as the PCA scatter collect
    if not int(row["n"] or 0):  # empty corpus: no fit, empty report
        return spark.createDataFrame([], out_schema)

    A = [[0.0] * 4 for _ in range(4)]
    Araw = [[0.0] * 4 for _ in range(4)]
    for i in range(4):
        for j in range(i, 4):
            v = int(row[f"a{i}{j}"] or 0)
            Araw[i][j] = Araw[j][i] = _big_int_to_double(v)
            vr = v + (lam if i == j else 0)
            A[i][j] = A[j][i] = _big_int_to_double(vr)
    b = [_big_int_to_double(int(row[f"b{i}"] or 0)) for i in range(4)]
    yy = _big_int_to_double(int(row["yy"] or 0))

    det_a = det4(A)
    w = []
    for k in range(4):
        Ak = [[b[i] if j == k else A[i][j] for j in range(4)] for i in range(4)]
        w.append(det4(Ak) / det_a)

    # SSE = y'y − 2 w'b + w'Araw w, SST = y'y − (Σy)²/n — fixed ascending
    # fold order; Σy = b[0] because x0 ≡ 1
    wb = 0.0
    for i in range(4):
        wb += w[i] * b[i]
    waw = 0.0
    for i in range(4):
        for j in range(4):
            waw += w[i] * w[j] * Araw[i][j]
    sse = yy - 2.0 * wb + waw
    sst = yy - (b[0] * b[0]) / float(int(row["n"]))
    r2 = 1.0 - sse / sst

    rows = [("weight", i, w[i]) for i in range(4)]
    rows.append(("r2", 0, r2))
    comp = spark.createDataFrame(rows, out_schema)
    if not probe_ids:
        return comp.orderBy("kind", "i")
    resid = f.filter(F.col("doc_id").isin(probe_ids)).select(
        F.lit("residual").alias("kind"),
        F.col("doc_id").alias("i"),
        (
            F.col("y").cast("double")
            - (
                F.lit(w[0])
                + F.lit(w[1]) * F.col("x1").cast("double")
                + F.lit(w[2]) * F.col("x2").cast("double")
                + F.lit(w[3]) * F.col("x3").cast("double")
            )
        ).alias("value"),
    )
    return comp.unionByName(resid).orderBy("kind", "i")
