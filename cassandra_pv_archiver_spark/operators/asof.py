"""As-of boundary probes and limit-mode range queries (read path).

Reference semantics: `ArchiveAccessService.java:55-135` (limit-mode
cardinality contract) and the bucket-walking probes
`ArchiveAccessServiceImpl.java:197-316` (backward, J1) / `:462-598`
(forward, J2).  The reference steps bucket-by-bucket because Cassandra can
only range-scan inside one partition; in Spark the probe is a single
``max_by``/``min_by`` aggregation over the pruned scan — partition pruning on
``(channel, date)`` plus parquet min/max row-group skipping plays the role of
the bucket index (`SURVEY.md §1.5`).

The limit-mode contract is reproduced declaratively as a union-distinct:

  core        = rows with lo <= t <= hi
  lower probe = (lo_mode == AT_OR_BEFORE)  latest row with t <= lo
  upper probe = (hi_mode == AT_OR_AFTER)   earliest row with t >= hi

If a sample sits exactly at a boundary the probe returns that same row and
the distinct collapses it — which is precisely the reference's exact-match
short-circuit, including the 0/1/1/2 table for lo == hi.

Scale: probes are partial aggregations (map-side combine) grouped by
channel — no window-function full sort, no driver collect.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

AT_OR_BEFORE = "AT_OR_BEFORE"
AT_OR_AFTER = "AT_OR_AFTER"


def _probe(df: DataFrame, key: str, agg: str) -> DataFrame:
    """One row per key: arg-min/arg-max of the full row by t.

    The whole row is selected with ONE max_by/min_by of a struct —
    per-column independent aggregates could each break a duplicate-t tie
    differently and stitch together a chimera row that never existed."""
    cols = [c for c in df.columns if c != key]
    packed = "named_struct(" + ", ".join(f"'{c}', {c}" for c in cols) + ")"
    return (
        df.groupBy(key)
        .agg(F.expr(f"{agg}({packed}, t)").alias("_r"))
        .select(key, *[F.col(f"_r.{c}").alias(c) for c in cols])
        .select(df.columns)
    )


def asof_before(df: DataFrame, ts: int, key: str = "channel") -> DataFrame:
    """J1: per key, the latest row with t <= ts (0 or 1 rows per key)."""
    return _probe(df.filter(F.col("t") <= ts), key, "max_by")


def asof_after(df: DataFrame, ts: int, key: str = "channel") -> DataFrame:
    """J2: per key, the earliest row with t >= ts (0 or 1 rows per key)."""
    return _probe(df.filter(F.col("t") >= ts), key, "min_by")


def get_samples(
    df: DataFrame,
    lo: int,
    hi: int,
    lo_mode: str = AT_OR_BEFORE,
    hi_mode: str = AT_OR_AFTER,
    key: str = "channel",
    channels: Sequence[str] | None = None,
    limit: int | None = None,
) -> DataFrame:
    """Limit-mode time-range query over one or all channels, time-ordered.

    Mirrors `ArchiveAccessServiceImpl.getSamples` (`:756-813`): core range
    scan plus optional boundary probes, distinct, ascending by (key, t).
    ``limit`` reproduces S4's client LIMIT (−1/None = unbounded,
    `ControlSystemSupport.java:49`).
    """
    if lo > hi:
        raise ValueError(f"lo {lo} > hi {hi}")
    if channels is not None:
        df = df.filter(F.col(key).isin(list(channels)))
    parts = [df.filter(F.col("t").between(lo, hi))]
    if lo_mode == AT_OR_BEFORE:
        parts.append(asof_before(df, lo, key=key))
    if hi_mode == AT_OR_AFTER:
        parts.append(asof_after(df, hi, key=key))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out = out.dropDuplicates([key, "t"])
    if limit is not None and limit >= 0:
        # the reference's client LIMIT is PER CHANNEL (each getSamples
        # call serves one channel's series); a global .limit() after the
        # (key, t) sort would starve all but the first channels of a
        # multi-channel query
        wk = Window.partitionBy(key).orderBy("t")
        out = (
            out.withColumn("_rn", F.row_number().over(wk))
            .filter(F.col("_rn") <= limit)
            .drop("_rn")
        )
    return out.orderBy(key, "t")


def enabling_filter(
    samples: DataFrame,
    enabling: DataFrame,
    flag_col: str = "en",
    bucket_s: int = 86_400,
) -> DataFrame:
    """J4: gate archiving on another PV's live value
    (`channelaccess/internal/EnablingChannel.java`; option
    `ConfigurationOptions.java:76`).

    A row of ``samples`` is kept iff the most recent ``enabling`` row at its
    timestamp (t_e <= t, backward as-of) has ``flag_col`` true; rows before
    the first enabling sample are dropped (the reference treats a
    never-seen enabling PV as disabled).

    Scale shape: the enabling series is ONE channel — tiny next to the
    fact table — so it is compiled into validity intervals ``[t, t_next)``
    and **broadcast**; the fact side never shuffles. Naively this is a
    BroadcastNestedLoopJoin probing EVERY fact row against ALL intervals —
    O(fact × transitions), which hurts for a chatty gate PV. Instead the
    closed intervals are **exploded into coarse time buckets**
    (``bucket_s``-wide) and the join is an EQUI-join on the bucket key
    (BroadcastHashJoin) with the exact range predicate as a residual: each
    fact row probes only the few intervals overlapping its bucket. The one
    open tail interval (no ``t_next``) cannot be bucket-bounded and joins
    as a single broadcast row — O(fact × 1). Intervals are disjoint, so
    the two paths union without dedup.
    """
    bucket_ns = bucket_s * 1_000_000_000
    iv = (
        enabling.select(
            F.col("t").alias("_et"), F.col(flag_col).alias("_en")
        )
        .withColumn("_et_next", F.lead("_et").over(Window.orderBy("_et")))
    )
    closed = (
        iv.filter(F.col("_et_next").isNotNull())
        .withColumn(
            "_b",
            F.explode(
                F.expr(
                    f"sequence(_et div {bucket_ns}, (_et_next - 1) div {bucket_ns})"
                )
            ),
        )
    )
    # The single open tail interval (no t_next) can't be bucket-bounded;
    # its (start, flag) is ONE row of a tiny series — read driver-side and
    # folded into the gate predicate as literals (same bounded-metadata
    # pattern as plans/planner.py), so the fact table is scanned ONCE and
    # the only join is the bucket-keyed BroadcastHashJoin.
    open_rows = iv.filter(F.col("_et_next").isNull()).select("_et", "_en").collect()
    fact = samples.withColumn("_b", F.expr(f"t div {bucket_ns}"))
    joined = fact.join(
        F.broadcast(closed),
        (fact["_b"] == closed["_b"])
        & (F.col("t") >= F.col("_et"))
        & (F.col("t") < F.col("_et_next")),
        "left",
    )
    if open_rows:
        open_gate = (F.col("t") >= F.lit(open_rows[0]["_et"])) & F.lit(
            bool(open_rows[0]["_en"])
        )
    else:
        open_gate = F.lit(False)
    gate = F.coalesce(F.col("_en"), open_gate, F.lit(False))
    return joined.filter(gate).select(*samples.columns)


def union_levels(
    fine: DataFrame,
    coarse: DataFrame,
    boundary: int,
    key: str = "channel",
) -> DataFrame:
    """U1: ordered union across decimation levels
    (`Api10Controller.java:443-518`).

    The fine level covers ``t >= boundary`` (its earliest available sample);
    the coarse level fills the older range with an exclusive upper bound
    ``boundary - 1`` — disjoint ranges, concatenated in time order.
    Columns are aligned by name; levels must share a schema (callers project
    first).
    """
    older = coarse.filter(F.col("t") <= boundary - 1)
    newer = fine.filter(F.col("t") >= boundary)
    return older.unionByName(newer).orderBy(key, "t")


def asof_align(base: DataFrame, ref: DataFrame, key: str = "channel") -> DataFrame:
    """Pairwise as-of alignment: for every ``base`` sample, the latest
    ``ref`` sample value at-or-before its timestamp (per key) — the
    correlation-plot / feature-alignment primitive. ``ref`` must already
    carry the key it serves (callers relabel when pairing two different
    channels).

    100 TB shape: NOT a per-row probe join — the two streams are
    unioned, and ONE (t, src)-ordered window per key partition carries
    the last ref value forward (same single-exchange merge the decimation
    hold-forward uses). Ties at equal t resolve ref-first, so a ref
    sample AT the base timestamp is visible (J1 at-or-before semantics,
    `ArchiveAccessServiceImpl.java:756-813` boundary rules; DuckDB's
    native ASOF JOIN ``ON base.t >= ref.t`` has identical semantics and
    is the oracle).

    Returns: key, t, v, ref_v (null until the first ref sample).
    """
    left = ref.select(
        key,
        "t",
        F.col("v").alias("_rv"),
        F.lit(0).alias("_src"),
        F.lit(None).cast("double").alias("v"),
    )
    right = base.select(
        key, "t", F.lit(None).cast("double").alias("_rv"), F.lit(1).alias("_src"), "v"
    )
    w = (
        Window.partitionBy(key)
        .orderBy("t", "_src")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        left.unionByName(right)
        .withColumn("ref_v", F.last("_rv", ignorenulls=True).over(w))
        .filter(F.col("_src") == 1)
        .select(key, "t", "v", "ref_v")
    )
