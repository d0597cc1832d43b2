"""Storage-sizing analytics: sample-size estimation, bucket rollover, and
Gorilla-style timestamp-compression estimates.

The reference tracks a running serialized-size estimate per sample bucket
(`SampleSizeEstimator`-backed, contract `SampleDecimator.java:152-177`) and
rolls a bucket over when it would exceed ``MAX_BUCKET_SIZE_BYTES =
96_000_000`` (`ArchivedChannelDecimationLevel.java:97`, rollover
`:426-480`). In the lakehouse mapping the physical rollover is owned by
file sizing / compaction (SURVEY.md §1.5), so these operators keep the
*analytic* role: predict bucket layout and storage footprint from the
sample stream itself — the capacity-planning question the reference's
sizing chapter answers by hand (`manual/index.xml:343-375`).

``gorilla_ts_bits`` estimates timestamp compressibility with the
delta-of-delta encoding of Facebook's Gorilla TSDB (Pelkonen et al.,
"Gorilla: A Fast, Scalable, In-Memory Time Series Database", VLDB 2015,
§4.1.1 — public paper). The archiver-relevant result it reproduces: a
decimated level's epoch-aligned lattice (`ArchivedChannelDecimatedSamples
DecimationLevel.java:854-888`) costs ~1 bit per timestamp, while the raw
irregular telemetry pays the 36-bit escape almost every sample — the
storage argument for decimation cascades, quantified.

Everything here is integer arithmetic over lag windows — exact in both
engines, no floats until the final byte division (kept as integers: bits
and ceil-bytes).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: reference bucket cap (`ArchivedChannelDecimationLevel.java:97`); the
#: catalog queries use a tiny cap so the synthetic series produces many
#: buckets, but the operator defaults to the real constant.
MAX_BUCKET_SIZE_BYTES = 96_000_000

#: Gorilla §4.1.1 delta-of-delta bit costs: (inclusive lo, inclusive hi,
#: bits incl. control prefix). Asymmetric bounds are the paper's.
GORILLA_DOD_BUCKETS = (
    (-63, 64, 9),
    (-255, 256, 12),
    (-2047, 2048, 16),
)
GORILLA_DOD_ESCAPE_BITS = 36  # 4 control + 32-bit raw delta-of-delta
GORILLA_FIRST_TS_BITS = 64  # block header: full epoch timestamp
GORILLA_FIRST_DELTA_BITS = 27  # first delta stored raw (our block = series)


def _dod_bits(dt: Column, dod: Column) -> Column:
    """Bit cost of one timestamp under Gorilla delta-of-delta."""
    bits = F.when(dt.isNull(), F.lit(GORILLA_FIRST_TS_BITS)).when(
        dod.isNull(), F.lit(GORILLA_FIRST_DELTA_BITS)
    )
    bits = bits.when(dod == 0, F.lit(1))
    for lo, hi, b in GORILLA_DOD_BUCKETS:
        bits = bits.when(dod.between(lo, hi), F.lit(b))
    return bits.otherwise(F.lit(GORILLA_DOD_ESCAPE_BITS))


def gorilla_ts_bits(
    samples: DataFrame,
    grid_ns: int = 1_000_000_000,
    channel_col: str = "channel",
    series_col: str | None = None,
    t_col: str = "t",
) -> DataFrame:
    """Per-channel Gorilla timestamp-compression estimate.

    Timestamps are first put on the paper's grid (seconds by default —
    Gorilla compresses wall seconds; our canonical ``t`` is ns), then the
    delta-of-delta of consecutive grid values is bucketed into the §4.1.1
    bit costs. One lag-lag window per (channel[, series]) — the same
    single exchange every per-channel operator shares — then a groupBy.

    Returns (channel[, series], n_samples, bits_ts, bytes_est,
    bytes_raw): ``bytes_est`` is the ceil-byte cost of the encoded
    timestamp stream, ``bytes_raw`` the 8-byte/plain cost it replaces.
    """
    keys = [channel_col] + ([series_col] if series_col else [])
    # integer `div`, never double division: t ~ 1.7e18 ns exceeds the
    # 2^53 exact-double range, so `t / grid` can truncate off-by-one at
    # exact grid multiples (the -0.0 bug's precision cousin)
    w = Window.partitionBy(*keys).orderBy("_t")
    d = samples.select(*keys, F.col(t_col).alias("_t")).withColumn(
        "_ts_g", F.expr(f"_t div {int(grid_ns)}")
    ).withColumn("_dt", F.col("_ts_g") - F.lag("_ts_g").over(w))
    d = d.withColumn("_dod", F.col("_dt") - F.lag("_dt").over(w))
    d = d.withColumn("_bits", _dod_bits(F.col("_dt"), F.col("_dod")))
    return d.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_samples"),
        F.sum("_bits").cast("long").alias("bits_ts"),
        # integer `div`, not `/`+cast: double division is exact only
        # while bits_ts + 7 < 2^53; the oracle's `(s + 7) // 8` never
        # rounds, so past that the engines would diverge bitwise
        F.expr("(sum(_bits) + 7) div 8").cast("long").alias("bytes_est"),
        (F.count(F.lit(1)) * 8).cast("long").alias("bytes_raw"),
    )


def decimation_lattice(
    samples: DataFrame,
    period_ns: int,
    channel_col: str = "channel",
    t_col: str = "t",
) -> DataFrame:
    """The epoch-aligned timestamp lattice a decimated level stores for
    each channel: every ``period_ns`` boundary in [min t, max t]
    (decimated sample t = interval start, one per period between the
    channel's first and last raw sample — `ArchivedChannelDecimated
    SamplesDecimationLevel.java:854-888`). Arithmetic only — the row SET
    matches what the decimation operator would emit for a gap-filled
    series without computing any aggregate. Row count is bounded by
    (span / period) per channel; ``F.sequence`` evaluates inside the
    executor, no driver materialization."""
    # integer `div` for the same >2^53 reason as gorilla_ts_bits
    return (
        samples.groupBy(channel_col)
        .agg(F.min(t_col).alias("_lo"), F.max(t_col).alias("_hi"))
        .select(
            channel_col,
            F.explode(
                F.sequence(
                    F.expr(f"_lo div {int(period_ns)}"),
                    F.expr(f"_hi div {int(period_ns)}"),
                )
            ).alias("_w"),
        )
        .select(
            channel_col, (F.col("_w") * F.lit(int(period_ns))).alias(t_col)
        )
    )


def bucket_rollover_estimate(
    samples: DataFrame,
    cap_bytes: int = MAX_BUCKET_SIZE_BYTES,
    overhead_bytes: int = 32,
    channel_col: str = "channel",
    t_col: str = "t",
    payload_len: Column | None = None,
) -> DataFrame:
    """Size-capped bucket layout prediction (A7/A8 analytic role).

    Per-sample estimated size = ``overhead_bytes`` (key + timestamp +
    severity/status envelope, the `SampleSizeEstimator` role) plus the
    variable payload length. Bucket assignment is the OFFSET-GRID form:
    a sample belongs to bucket ``floor(exclusive-prefix-bytes / cap)``.
    This deviates from the reference's greedy rule (a greedy bucket
    closes *early* so no sample straddles the cap,
    `ArchivedChannelDecimationLevel.java:426-480`) by at most one
    sample's spill per boundary — and unlike greedy reset it is a pure
    cumulative-sum window, one exchange, scale-free (greedy reset is
    inherently sequential per channel; the same deliberate trade as
    `sampling.sequence_packing`).

    Returns (channel, bucket_seq, n_samples, bucket_bytes, t_first,
    t_last) — the predicted bucket index rows (`channels` table role,
    `ChannelMetaDataDAOImpl.java:2092-2103`).
    """
    size = F.lit(overhead_bytes) + (
        payload_len if payload_len is not None else F.lit(0)
    )
    # explicit ROWS frame: Spark's default frame with an ORDER BY is
    # RANGE, under which duplicate timestamps would each see the full
    # tied-group sum and diverge from a per-row prefix. With ties the
    # prefix order is still nondeterministic — callers must provide a
    # unique t per channel (the canonical loaders' F5 dedup guarantees
    # exactly that).
    w = (
        Window.partitionBy(channel_col)
        .orderBy(t_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = samples.withColumn("_sz", size.cast("long"))
    d = d.withColumn(
        "_off", F.sum("_sz").over(w) - F.col("_sz")
    ).withColumn("_bkt", F.expr(f"_off div {int(cap_bytes)}"))
    return d.groupBy(channel_col, F.col("_bkt").alias("bucket_seq")).agg(
        F.count(F.lit(1)).alias("n_samples"),
        F.sum("_sz").alias("bucket_bytes"),
        F.min(t_col).alias("t_first"),
        F.max(t_col).alias("t_last"),
    )


def severity_transitions(
    samples: DataFrame,
    channel_col: str = "channel",
    t_col: str = "t",
    sev_col: str = "severity",
) -> DataFrame:
    """Alarm-severity transition matrix: how often each (from, to)
    severity pair occurs across consecutive samples of a channel, and in
    how many distinct channels. The alarm-analytics view over the
    severity codes every sample carries (severity ordering
    `JsonV1SampleSerializer.java:57-86`; OK < MINOR < MAJOR < INVALID).
    One lag window per channel (shared exchange), one small groupBy —
    output cardinality is |severity|², independent of data size."""
    w = Window.partitionBy(channel_col).orderBy(t_col)
    d = samples.withColumn("_prev", F.lag(sev_col).over(w)).filter(
        F.col("_prev").isNotNull()
    )
    return d.groupBy(
        F.col("_prev").cast("int").alias("from_sev"),
        F.col(sev_col).cast("int").alias("to_sev"),
    ).agg(
        F.count(F.lit(1)).alias("n_transitions"),
        F.countDistinct(channel_col).alias("n_channels"),
    )
