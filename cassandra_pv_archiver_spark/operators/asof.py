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
    # backtick-quote every column reference: this is a public read-path
    # API over arbitrary schemas, and an unquoted name like `ref-v`
    # would PARSE as the expression ref - v and probe a value that never
    # existed (quotes inside a name escape by doubling)
    def q(c: str) -> str:
        return "`" + c.replace("`", "``") + "`"

    packed = (
        "named_struct("
        + ", ".join(f"'{c.replace(chr(39), chr(39) * 2)}', {q(c)}"
                    for c in cols)
        + ")"
    )
    r = F.col("_r")
    return df.groupBy(key).agg(
        F.expr(f"{agg}({packed}, `t`)").alias("_r")
    ).select(
        *[
            F.col(key) if c == key else r.getField(c).alias(c)
            for c in df.columns
        ]
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
    `ConfigurationOptions.java:76`) — the single-gate form: ONE enabling
    series gates every row of ``samples``. Thin wrapper over
    :func:`enabling_filter_linked`'s shared gate core (a synthetic link
    key). Catalyst folds the constant key out of the interval window —
    one PV's transition series is inherently a single ordered partition
    (bounded: transitions, not samples); the linked form is the scale
    path, where the window parallelizes across enabling channels.

    A row of ``samples`` is kept iff the most recent ``enabling`` row at
    its timestamp (t_e <= t, backward as-of) has ``flag_col`` true; rows
    before the first enabling sample are dropped (the reference treats a
    never-seen enabling PV as disabled).
    """
    fact = samples.withColumn("_ech", F.lit("__gate__"))
    en = enabling.select(
        F.lit("__gate__").alias("_ech"),
        F.col("t").alias("_et"),
        F.col(flag_col).alias("_en"),
    )
    return _enabling_gate(fact, en, samples.columns, bucket_s)


def enabling_filter_linked(
    samples: DataFrame,
    enabling: DataFrame,
    links: DataFrame,
    flag_col: str = "en",
    bucket_s: int = 86_400,
    channel_col: str = "channel",
    enabling_channel_col: str = "enabling_channel",
) -> DataFrame:
    """J4 generalized: PER-CHANNEL enabling links — the reference lets
    every archived channel name its own enabling PV
    (`ConfigurationOptions.java:76`), so the gate is a relation, not a
    single series.

    ``links`` maps ``channel_col`` -> ``enabling_channel_col`` (a
    registry-sized dim, broadcast; ONE row per channel — the reference's
    config allows one enabling PV per channel, and a duplicate link row
    here would duplicate that channel's samples through the left join).
    ``enabling`` carries (channel, t, ``flag_col``) rows for ALL
    enabling PVs. A sample is kept iff its
    channel has no link (no enabling PV configured -> always archived,
    the reference default) or the linked PV's most recent ``flag_col``
    at the sample's timestamp is true (rows before the linked PV's first
    sample are dropped — never-seen means disabled).

    Scale shape: the interval build (`lead` over (channel, t)) is
    PARTITIONED BY ENABLING CHANNEL — a flappy gate PV's transition
    series parallelizes across its time range's windows per channel and
    never single-tasks the whole relation. Intervals explode into
    coarse ``bucket_s`` time buckets and join as a BroadcastHashJoin on
    (bucket, enabling channel) with the exact range as a residual; the
    per-channel OPEN tail intervals join as a second broadcast equi-join
    on the enabling-channel key alone (replacing the old driver-side
    collect of the single open row). The fact side never shuffles.
    """
    fact = samples.join(
        F.broadcast(
            links.select(
                F.col(channel_col),
                F.col(enabling_channel_col).alias("_ech"),
            )
        ),
        channel_col,
        "left",
    )
    en = enabling.select(
        F.col(channel_col).alias("_ech"),
        F.col("t").alias("_et"),
        F.col(flag_col).alias("_en"),
    )
    return _enabling_gate(fact, en, samples.columns, bucket_s)


def _enabling_gate(
    fact: DataFrame, en: DataFrame, out_cols: list, bucket_s: int
) -> DataFrame:
    """Shared gate core: ``fact`` rows tagged with their enabling key
    ``_ech`` (NULL = ungated), ``en`` = (_ech, _et, _en) transition rows.

    Closed validity intervals ``[_et, _et_next)`` are exploded into
    ``bucket_s``-wide time buckets and broadcast: the join is an
    EQUI-join on (bucket, enabling channel) — BroadcastHashJoin with the
    exact range predicate as a residual — so each fact row probes only
    the few intervals overlapping its bucket, not every transition.
    Each channel's one OPEN tail interval (no ``_et_next``) cannot be
    bucket-bounded; those rows (one per enabling channel — a bounded,
    registry-sized set) join as a second broadcast equi-join on the
    channel key with ``t >= start`` residual. Intervals are disjoint per
    channel, so at most one side matches any fact row.
    """
    bucket_ns = bucket_s * 1_000_000_000
    iv = en.withColumn(
        "_et_next", F.lead("_et").over(Window.partitionBy("_ech").orderBy("_et"))
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
        .select(
            F.col("_ech").alias("_cech"),
            F.col("_b").alias("_cb"),
            "_et",
            "_et_next",
            F.col("_en").alias("_cen"),
        )
    )
    open_iv = iv.filter(F.col("_et_next").isNull()).select(
        F.col("_ech").alias("_oech"),
        F.col("_et").alias("_ot"),
        F.col("_en").alias("_oen"),
    )
    fb = fact.withColumn("_b", F.expr(f"t div {bucket_ns}"))
    j = fb.join(
        F.broadcast(closed),
        (fb["_b"] == closed["_cb"])
        & (fb["_ech"] == closed["_cech"])
        & (F.col("t") >= F.col("_et"))
        & (F.col("t") < F.col("_et_next")),
        "left",
    )
    j = j.join(
        F.broadcast(open_iv),
        (j["_ech"] == open_iv["_oech"]) & (F.col("t") >= F.col("_ot")),
        "left",
    )
    gate = F.col("_ech").isNull() | F.coalesce(
        F.col("_cen"), F.col("_oen"), F.lit(False)
    )
    return j.filter(gate).select(*out_cols)


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
