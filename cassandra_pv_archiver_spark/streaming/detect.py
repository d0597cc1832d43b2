"""Online changepoint detection over the live sample stream.

The batch operator (`operators/stats.cusum_alarms`) is retrospective: it
judges every point against the series' own global mean. A LIVE detector
cannot know the future mean, so the streaming variant runs the classic
online CUSUM against a FIXED per-channel baseline (mu, mean absolute
deviation) learned batch-side from history — the standard two-phase
monitoring deployment (profile on the archive, detect on the stream).

Exactness: the recursion S := max(0, S + (vi - mu)) runs on scaled
integers (vi = floor(v*100+0.5), mu/mad pre-scaled the same way), the
alarm rule ``S > lam * mad`` is an integer comparison, and GroupState
carries the two accumulators across micro-batches — so a stream replay
of a batch fixture produces bit-identical alarms to a sequential batch
evaluation (pytest-pinned parity).

100 TB shape: state is two longs per channel (O(#channels) cluster-wide,
hash partitioned); the baseline attaches via a stream-static broadcast
join, so no per-record lookup leaves the executor.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cusum_baseline(samples: DataFrame) -> DataFrame:
    """Batch profile: per-channel scaled mean and mean absolute
    deviation, all floor-division integers (deterministic on any engine).

    Returns: channel, mu_scaled, mad_scaled.
    """
    vi = F.expr("CAST(floor(v * 100 + 0.5) AS BIGINT)")
    g = samples.select("channel", vi.alias("_vi")).groupBy("channel").agg(
        F.count(F.lit(1)).alias("_n"), F.sum("_vi").alias("_s")
    )
    mu = samples.select("channel", vi.alias("_vi")).join(
        g.select("channel", F.expr("_s div _n").alias("mu_scaled")), "channel"
    )
    return (
        mu.groupBy("channel", "mu_scaled")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(F.abs(F.col("_vi") - F.col("mu_scaled"))).alias("_a"),
        )
        .select(
            "channel",
            "mu_scaled",
            F.expr("greatest(_a div _n, 1)").alias("mad_scaled"),
        )
    )


#: alarm output: one row per alarm crossing
ALARM_SCHEMA = (
    "channel string, t long, side string, cusum_scaled long, "
    "threshold_scaled long"
)


def stream_cusum(
    stream: DataFrame,
    baseline: DataFrame,
    lam: int = 8,
    key: str = "channel",
    t: str = "t",
) -> DataFrame:
    """Online two-sided CUSUM over a streaming sample DataFrame.

    ``stream`` must carry (channel, t, v); ``baseline`` is
    :func:`cusum_baseline`'s output (attached with a stream-static
    broadcast join). Emits one row per alarm CROSSING (the cusum
    resets after an alarm, the textbook restart rule, so a sustained
    shift re-alarms only after re-accumulating evidence).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    enriched = stream.join(F.broadcast(baseline), key).select(
        key,
        t,
        F.expr("CAST(floor(v * 100 + 0.5) AS BIGINT)").alias("vi"),
        "mu_scaled",
        "mad_scaled",
    )

    def _fn(key_, pdf_iter, state: GroupState):
        s_pos, s_neg = state.get if state.exists else (0, 0)
        chunks = [pdf for pdf in pdf_iter if len(pdf)]
        if chunks:
            # sort by (t, vi) so tie order at duplicate timestamps is a
            # fixed convention shared with batch_cusum_reference's (t, v)
            # sort: vi is monotone in v and equal-vi rows commute in the
            # recursion, so the two orders accumulate identically
            pdf = pd.concat(chunks).sort_values([t, "vi"])
            out = {c: [] for c in
                   ("channel", "t", "side", "cusum_scaled", "threshold_scaled")}
            for ti, vi, mu, mad in zip(
                pdf[t].to_numpy(), pdf["vi"].to_numpy(),
                pdf["mu_scaled"].to_numpy(), pdf["mad_scaled"].to_numpy(),
            ):
                thr = int(lam) * int(mad)
                d = int(vi) - int(mu)
                s_pos = max(0, s_pos + d)
                s_neg = max(0, s_neg - d)
                if s_pos > thr:
                    out["channel"].append(key_[0])
                    out["t"].append(int(ti))
                    out["side"].append("pos")
                    out["cusum_scaled"].append(s_pos)
                    out["threshold_scaled"].append(thr)
                    s_pos = 0
                if s_neg > thr:
                    out["channel"].append(key_[0])
                    out["t"].append(int(ti))
                    out["side"].append("neg")
                    out["cusum_scaled"].append(s_neg)
                    out["threshold_scaled"].append(thr)
                    s_neg = 0
            if out["t"]:
                yield pd.DataFrame(out)
        state.update((int(s_pos), int(s_neg)))

    return enriched.groupBy(key).applyInPandasWithState(
        _fn,
        ALARM_SCHEMA,
        "s_pos long, s_neg long",
        "append",
        GroupStateTimeout.NoTimeout,
    )


def batch_cusum_reference(
    rows: list[tuple[str, int, float]],
    baseline: dict[str, tuple[int, int]],
    lam: int = 8,
) -> list[tuple[str, int, str, int, int]]:
    """Sequential reference implementation (test parity oracle): the same
    recursion run row-at-a-time in plain Python."""
    out = []
    st: dict[str, list[int]] = {}
    by_ch: dict[str, list[tuple[int, float]]] = {}
    for ch, ti, v in rows:
        by_ch.setdefault(ch, []).append((ti, v))
    for ch, seq in by_ch.items():
        mu, mad = baseline[ch]
        thr = lam * mad
        s_pos = s_neg = 0
        for ti, v in sorted(seq):
            import math

            vi = int(math.floor(v * 100 + 0.5))
            d = vi - mu
            s_pos = max(0, s_pos + d)
            s_neg = max(0, s_neg - d)
            if s_pos > thr:
                out.append((ch, ti, "pos", s_pos, thr))
                s_pos = 0
            if s_neg > thr:
                out.append((ch, ti, "neg", s_neg, thr))
                s_neg = 0
    return sorted(out)


#: drift output: one row per (channel, micro-batch trigger)
DRIFT_SCHEMA = (
    "channel string, n_seen long, tvd_num long, tvd_den long, tvd double"
)


def histogram_baseline(samples: DataFrame, n_bins: int = 20) -> DataFrame:
    """Batch profile for the streaming drift monitor: per-channel value
    bounds (fixing the bin edges forever — a live monitor cannot rebin)
    and the baseline bin counts.

    Returns: channel, lo, hi, counts array<long> (length n_bins).
    """
    s = samples.select("channel", "v")
    bounds = s.groupBy("channel").agg(
        F.min("v").alias("lo"), F.max("v").alias("hi")
    )
    binned = s.join(F.broadcast(bounds), "channel").withColumn(
        "_bin",
        F.when(F.col("hi") == F.col("lo"), F.lit(0))
        .otherwise(
            F.least(
                F.lit(n_bins - 1),
                F.greatest(
                    F.lit(0),
                    F.floor(
                        (F.col("v") - F.col("lo"))
                        / (F.col("hi") - F.col("lo"))
                        * n_bins
                    ),
                ),
            )
        )
        .cast("int"),
    )
    per_bin = binned.groupBy("channel", "lo", "hi", "_bin").agg(
        F.count(F.lit(1)).alias("_c")
    )
    # densify to a fixed-length array via a map lookup — an aggregate
    # inside a transform() lambda is NOT legal Spark (codegen NPEs), so
    # collect the sparse (bin, count) pairs first, then look them up
    return (
        per_bin.groupBy("channel", "lo", "hi")
        .agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("_bin", "_c")))
            ).alias("_m")
        )
        .select(
            "channel",
            "lo",
            "hi",
            F.expr(
                f"transform(sequence(0, {n_bins - 1}),"
                " b -> coalesce(try_element_at(_m, b), 0L))"
            ).alias("counts"),
        )
    )


def stream_histogram_drift(
    stream: DataFrame,
    baseline: DataFrame,
    n_bins: int = 20,
    key: str = "channel",
) -> DataFrame:
    """Live distribution-drift monitor: per-channel streaming histogram
    accumulated in ``GroupState`` (one long per bin), compared against
    the batch baseline with the SAME integer-exact total-variation
    distance as the batch operator (`operators/stats.distribution_drift`)
    — emitted once per channel per micro-batch, so a dashboard sees the
    drift trajectory converge as evidence accumulates.

    Values outside the baseline's range clamp into the edge bins (a live
    monitor cannot rebin; a persistent edge-bin spike IS the drift
    signal). State is ``n_bins`` longs per channel — O(#channels)
    cluster-wide.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    enriched = stream.join(F.broadcast(baseline), key).select(
        key,
        "v",
        "lo",
        "hi",
        F.expr(
            f"CASE WHEN hi = lo THEN 0 ELSE CAST(least({n_bins - 1},"
            f" greatest(0, floor((v - lo) / (hi - lo) * {n_bins})))"
            " AS INT) END"
        ).alias("bin"),
        "counts",
    )

    def _fn(key_, pdf_iter, state: GroupState):
        seen = list(state.get) if state.exists else [0] * n_bins
        base = None
        got = False
        for pdf in pdf_iter:
            if not len(pdf):
                continue
            got = True
            if base is None:
                base = list(pdf["counts"].iloc[0])
            for b in pdf["bin"]:
                seen[int(b)] += 1
        if got:
            na, nb = sum(seen), sum(base)
            num = sum(abs(a * nb - b * na) for a, b in zip(seen, base))
            den = 2 * na * nb
            yield pd.DataFrame(
                {
                    "channel": [key_[0]],
                    "n_seen": [na],
                    "tvd_num": [num],
                    "tvd_den": [den],
                    "tvd": [num / den if den else float("nan")],
                }
            )
        state.update(tuple(seen))

    return enriched.groupBy(key).applyInPandasWithState(
        _fn,
        DRIFT_SCHEMA,
        ", ".join(f"b{i} long" for i in range(n_bins)),
        "append",
        GroupStateTimeout.NoTimeout,
    )


def stream_seasonal_flags(
    stream: DataFrame, profile: DataFrame, k_sigma: int = 3
) -> DataFrame:
    """Live seasonal anomaly monitor: arriving samples checked against
    the historical hour-of-day baseline (stats.seasonal_profile,
    broadcast per micro-batch — the stream-static dimension-join shape;
    NO state). The flag is the same exact-integer sigma test as the
    batch census — (vi·n - s)² > k²(n·s2 - s²) over DECIMAL(38,0)
    moments — so a replayed stream emits exactly the batch filter's
    rows (parity-pinned in tests). Stateless, so it works identically
    on a batch DataFrame; samples landing in an (channel, hod) cell
    the profile never saw pass through unflagged (inner join drops
    them — a monitoring convention: no baseline, no alarm).

    Returns the ANOMALOUS samples only: channel, t, v_q, hod, z_num
    (the exact deviation numerator |vi·n - s|, BIGINT-exact evidence).
    """
    from ..operators.decimate import NS

    hour_ns = 3600 * NS
    k2 = k_sigma * k_sigma
    s = stream.select(
        "channel",
        "t",
        F.expr(f"CAST((t div {hour_ns}) % 24 AS INT)").alias("hod"),
        F.expr("CAST(floor(v * 100 + 0.5) AS DECIMAL(19,0))").alias("_vi"),
    )
    j = s.join(F.broadcast(profile), ["channel", "hod"])
    dev = "CAST(_vi * _n - _s AS DECIMAL(38,0))"
    var_num = "CAST(_n * _s2 - _s * _s AS DECIMAL(38,0))"
    return (
        j.filter(F.expr(f"({dev}) * ({dev}) > {k2} * ({var_num})"))
        .select(
            "channel",
            "t",
            (F.col("_vi").cast("double") / F.lit(100.0)).alias("v_q"),
            "hod",
            F.expr(f"abs({dev})").alias("z_num"),
        )
    )


def stream_decontam_flags(
    docs: DataFrame,
    bench_sh: DataFrame,
    bloom_bits: DataFrame,
    m: int = 65536,
    k: int = 4,
) -> DataFrame:
    """Ingest-time contamination screening over ONE batch of arriving
    documents: shingle, check against the STATIC benchmark — the Bloom
    bit list and the exact gram set both broadcast (the stream-static
    shape; no state). Emits one row per flagged document with both
    verdicts, so the downstream quarantine can act on the screen
    immediately and reconcile against the exact verdict in the same
    row: ``bloom_hit`` (never false-negative) and ``confirmed``
    (exact). Per-doc and stateless, so a replayed stream equals the
    batch funnel's flag set (parity-pinned in tests). The per-doc
    flags are aggregations, so under Structured Streaming this runs
    per micro-batch through :func:`start_decontam_screen`'s
    ``foreachBatch`` — exactly the semantics an ingest screen wants
    (each batch judged on arrival).

    ``bench_sh`` = distinct benchmark shingles; ``bloom_bits`` =
    distinct set bit positions (operators/sketches construction, same
    md5-slice hashes).
    """
    from ..operators.dedup import shingles

    if 4 * k > 32:
        raise ValueError("bloom k too large for one md5 (4*k hex chars > 32)")
    pos_expr = (
        f"array_distinct(transform(sequence(0, {k - 1}), j ->"
        f" CAST(CAST(conv(substring(md5(shingle), 1 + 4 * j, 4), 16, 10)"
        f" AS INT) % {m} AS INT)))"
    )
    sh = shingles(docs)
    per_gram = (
        sh.join(
            F.broadcast(bench_sh.withColumn("_ex", F.lit(1))),
            "shingle",
            "left",
        )
        .withColumn("_pos", F.expr(pos_expr))
        .withColumn("_npos", F.size("_pos"))
        .select(
            "doc_id",
            "shingle",
            F.coalesce("_ex", F.lit(0)).alias("_ex"),
            "_npos",
            F.explode("_pos").alias("bit"),
        )
        .join(
            F.broadcast(bloom_bits.withColumn("_set", F.lit(1))),
            "bit",
            "left",
        )
        .groupBy("doc_id", "shingle", "_ex", "_npos")
        .agg(F.sum(F.coalesce("_set", F.lit(0))).alias("_nhit"))
    )
    return (
        per_gram.groupBy("doc_id")
        .agg(
            F.max(
                (F.col("_nhit") == F.col("_npos")).cast("int")
            ).alias("_bloom"),
            F.max("_ex").alias("_conf"),
        )
        .filter(F.col("_bloom") == 1)
        .select(
            "doc_id",
            F.lit(True).alias("bloom_hit"),
            (F.col("_conf") == 1).alias("confirmed"),
        )
    )


def start_decontam_screen(
    doc_stream: DataFrame,
    bench_sh: DataFrame,
    bloom_bits: DataFrame,
    sink,
    m: int = 65536,
    k: int = 4,
    checkpoint: str | None = None,
):
    """Run the ingest-time contamination screen over a streaming
    document table: every micro-batch passes through
    :func:`stream_decontam_flags` (batch semantics per trigger — the
    judged-on-arrival contract) and the flagged rows go to
    ``sink(df, batch_id)``."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sink(
            stream_decontam_flags(batch_df, bench_sh, bloom_bits, m=m, k=k),
            batch_id,
        )

    writer = doc_stream.writeStream.foreachBatch(_sink).trigger(
        availableNow=True
    )
    if checkpoint is not None:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


def start_lm_screen(
    doc_stream: DataFrame,
    tri: DataFrame,
    bi: DataFrame,
    uni: DataFrame,
    tot: DataFrame,
    sink,
    checkpoint: str | None = None,
):
    """Ingest-time LM quality scoring over a streaming document table:
    every micro-batch is scored against the FROZEN count tables from
    `operators/lm.train_counts` (stream-static joins, stateless — the
    same judged-on-arrival ``foreachBatch`` contract as
    :func:`start_decontam_screen`), and the per-doc score rows go to
    ``sink(df, batch_id)``. Because scoring is stateless and the counts
    are frozen, a replayed stream emits exactly the batch scorer's rows
    (parity-pinned in tests) — the quality gate a curation pipeline
    applies before a document ever lands in the corpus."""
    from ..operators.lm import score_with_counts

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sink(score_with_counts(batch_df, tri, bi, uni, tot), batch_id)

    writer = doc_stream.writeStream.foreachBatch(_sink).trigger(
        availableNow=True
    )
    if checkpoint is not None:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


def boilerplate_flagged_set(docs: DataFrame, n: int = 5,
                            min_sources: int = 2) -> DataFrame:
    """Batch profile for the streaming boilerplate screen: the frozen
    set of template shingles (``operators/text.boilerplate_spans``'s
    flagged keys), learned from history."""
    from ..operators.text import _WORDS

    d = docs.select("source", F.expr(_WORDS).alias("w"))
    sh = d.filter(F.size("w") >= n).select(
        "source",
        F.explode(
            F.expr(
                f"transform(sequence(0, size(w) - {n}),"
                f" i -> concat_ws(' ', slice(w, i + 1, {n})))"
            )
        ).alias("key"),
    )
    return (
        sh.groupBy("key")
        .agg(F.countDistinct("source").alias("ns"))
        .filter(F.col("ns") >= min_sources)
        .select("key")
    )


def stream_boilerplate_coverage(
    docs: DataFrame, flagged: DataFrame, n: int = 5
) -> DataFrame:
    """Score ONE batch of arriving documents against the FROZEN
    template-shingle set: per-doc covered-position fraction, the same
    exact interval-union counting as the batch operator — stateless
    stream-static joins, so a replayed stream equals a batch pass
    (parity-pinned). The third ingest-time quality leg alongside
    :func:`start_lm_screen` and :func:`start_decontam_screen`."""
    from ..operators.text import _WORDS

    d = docs.select("doc_id", F.expr(_WORDS).alias("w"))
    sh = d.filter(F.size("w") >= n).select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, size(w) - {n}),"
                f" i -> concat_ws(' ', slice(w, i + 1, {n})))"
            )
        ).alias("pos", "key"),
    )
    cov = (
        sh.join(F.broadcast(flagged), "key")
        .select(
            "doc_id",
            F.explode(F.expr(f"sequence(pos, pos + {n - 1})")).alias("p"),
        )
        .distinct()
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_cov"))
    )
    spine = d.select("doc_id", F.size("w").cast("bigint").alias("n_tokens"))
    z = F.lit(0).cast("bigint")
    nc = F.coalesce("n_cov", z)
    return spine.join(cov, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        nc.alias("n_cov"),
        F.when(
            F.col("n_tokens") > 0,
            F.round(nc.cast("double") / F.col("n_tokens").cast("double"), 6),
        ).otherwise(F.lit(0.0)).alias("cov_rate"),
    )


def start_boilerplate_screen(
    doc_stream: DataFrame,
    flagged: DataFrame,
    sink,
    n: int = 5,
    checkpoint: str | None = None,
):
    """Ingest-time boilerplate screen: every micro-batch scored against
    the frozen template set via foreachBatch (judged-on-arrival), rows
    to ``sink(df, batch_id)``."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sink(stream_boilerplate_coverage(batch_df, flagged, n=n), batch_id)

    writer = doc_stream.writeStream.foreachBatch(_sink).trigger(
        availableNow=True
    )
    if checkpoint is not None:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()
