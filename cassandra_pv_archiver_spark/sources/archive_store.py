"""Partitioned-parquet archive store — the lakehouse replacement for the
reference's Cassandra sample buckets (SURVEY.md §1.5).

Layout::

    {root}/samples/decimation_level=<sec>/date=<yyyy-MM-dd>/part-*.parquet

Design for 100 TB / 100k channels:

  * **Partition columns** are ``(decimation_level, date)`` only. Channel is
    deliberately NOT a partition column — 100k channels x 3650 days would
    mean 10^8 directories, killing listing and small-file behavior. Instead
    every file is **sorted by (channel, t)** (``sortWithinPartitions``
    before write), so parquet row-group min/max statistics prune channels
    inside each date partition — this plays exactly the role of the
    reference's bucket index (`channels` table + ``bucket_end_time``,
    `ChannelMetaDataDAOImpl.java:2092-2103`): partition pruning selects the
    date range, row-group stats select the channel slice.
  * **File sizing**: ``maxRecordsPerFile`` bounds file size the way
    ``MAX_BUCKET_SIZE_BYTES = 96_000_000`` bounds a bucket
    (`ArchivedChannelDecimationLevel.java:97`); :meth:`compact` is the
    OPTIMIZE-style rewrite for partitions fragmented by incremental appends.
  * **Retention** (S6, `ArchivedChannelDecimationLevel.java:1097-1320`)
    drops whole date partitions below the cutoff — a metadata operation,
    like the reference's bucket drops — and rewrites only the single
    boundary partition for exact trim.
  * **High-water mark** (W3, `...DecimatedSamplesDecimationLevel.java:
    890-927`): per-level max t, read from the newest date partition only.

All timestamps int64 ns; ``date`` is derived with integer division so it is
consistent for any ns value (no TimestampType round-trip).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .fs import HadoopFS

NS = 1_000_000_000
DAY_NS = 86_400 * NS

SAMPLE_COLUMNS = ["channel", "t", "v", "severity", "status"]

RAW_SCHEMA = "channel string, t long, v double, severity int, status int"
DEC_SCHEMA = (
    "channel string, t long, mean double, std double, vmin double,"
    " vmax double, covered_fraction double, severity int, status int,"
    " n_samples long, quality string"
)


def _date_expr(t_col: str = "t"):
    """ns epoch -> yyyy-MM-dd partition string (UTC, integer floor-div so
    negative ns before 1970 still bucket consistently)."""
    return F.date_format(
        F.expr(f"date_add(DATE '1970-01-01', CAST({t_col} div {DAY_NS} AS INT))"),
        "yyyy-MM-dd",
    )


class ArchiveStore:
    """Batch read/write surface over the partitioned samples table."""

    def __init__(self, spark: SparkSession, root: str,
                 max_records_per_file: int = 4_000_000):
        self.spark = spark
        self.root = root.rstrip("/")
        self.max_records_per_file = max_records_per_file
        #: all metadata path ops go through Hadoop FileSystem so the store
        #: works on file:/hdfs:/s3a: alike — no local-FS-only primitives
        self.fs = HadoopFS(spark, self.root)

    # -- paths -----------------------------------------------------------
    @property
    def samples_path(self) -> str:
        return f"{self.root}/samples"

    def _level_path(self, level: int) -> str:
        return f"{self.samples_path}/decimation_level={level}"

    def _hwm_path(self, level: int) -> str:
        return f"{self.root}/meta/hwm_level={level}"

    # -- write (S5) ------------------------------------------------------
    def write_samples(self, df: DataFrame, level: int, mode: str = "append") -> None:
        """Append a sample batch to one decimation level.

        The batch is hash-distributed by ``(date, channel)`` (so one task
        owns one channel's day — co-locating later per-channel windowing)
        and sorted by ``(channel, t)`` within files for row-group pruning.
        Also folds the batch into the per-channel high-water-mark metadata
        table — the Spark analog of the reference's
        ``decimation_level_to_current_bucket_start_time`` map
        (`ChannelMetaDataDAOImpl.java:2111-2123`).
        """
        df = df.persist()
        try:
            out = (
                df.withColumn("date", _date_expr("t"))
                .repartition("date", "channel")
                .sortWithinPartitions("channel", "t")
            )
            (
                out.write.mode(mode)
                .option("maxRecordsPerFile", self.max_records_per_file)
                .partitionBy("date")
                .parquet(self._level_path(level))
            )
            self._update_channel_hwm(df, level)
        finally:
            df.unpersist()

    #: compact the HWM append-log once it fragments past this many files
    HWM_COMPACT_THRESHOLD = 16

    def _update_channel_hwm(self, batch: DataFrame, level: int) -> None:
        """APPEND the batch's per-channel maxima to the HWM log — no
        read-merge-rewrite of the whole table on the hot write path (the
        round-1 coalesce(1) overwrite was O(#channels) per batch and
        local-FS-only). Readers fold the log with a groupBy max; the log
        is compacted in place once it passes ``HWM_COMPACT_THRESHOLD``
        files (one listStatus RPC to check)."""
        path = self._hwm_path(level)
        batch.groupBy("channel").agg(F.max("t").alias("hwm")).write.mode(
            "append"
        ).parquet(path)
        if self.fs.count_files(path) > self.HWM_COMPACT_THRESHOLD:
            self._compact_hwm(level)

    def _compact_hwm(self, level: int) -> None:
        path = self._hwm_path(level)
        folded = (
            self.spark.read.parquet(path)
            .groupBy("channel")
            .agg(F.max("hwm").alias("hwm"))
        )
        tmp = path + ".tmp"
        folded.coalesce(1).write.mode("overwrite").parquet(tmp)
        self.fs.replace(tmp, path)

    def _localize(self, df: DataFrame) -> DataFrame:
        """Materialize a BOUNDED metadata table into a driver-local
        relation. Metadata reads must be snapshots: lazy plans would pin
        parquet file listings that a concurrent append/compact/swap
        invalidates mid-job (observed as FILE_NOT_EXIST task failures).
        Both metadata tables are O(#channels) rows — the reference holds
        the same state in memory (`ChannelMetaDataDAOImpl.java:2111-2123`),
        so a driver-side copy is the faithful cost."""
        rows = df.collect()
        return self.spark.createDataFrame(rows, df.schema)

    def channel_hwm(self, level: int) -> DataFrame | None:
        """Per-channel high-water mark snapshot ``(channel, hwm)`` for one
        level, or None if the level has never been written. Folds the
        append-log (one small job over O(#channels x #appends) rows)."""
        path = self._hwm_path(level)
        if not self.fs.exists(path):
            return None
        return self._localize(
            self.spark.read.parquet(path)
            .groupBy("channel")
            .agg(F.max("hwm").alias("hwm"))
        )

    # -- decimation carry state (T3 seeds) -------------------------------
    def _seed_path(self, level: int) -> str:
        return f"{self.root}/meta/seed_level={level}"

    def read_seed_state(self, target_level: int) -> DataFrame | None:
        """Per-channel seed rows persisted by the last incremental
        decimation run targeting ``target_level`` (the decimator carry
        state — one full source row per channel)."""
        path = self._seed_path(target_level)
        if not self.fs.exists(path):
            return None
        return self._localize(self.spark.read.parquet(path))

    def write_seed_state(self, target_level: int, seeds: DataFrame) -> None:
        path = self._seed_path(target_level)
        tmp = path + ".tmp"
        seeds.coalesce(1).write.mode("overwrite").parquet(tmp)
        self.fs.replace(tmp, path)

    # -- read (S1/S2) ----------------------------------------------------
    def read_samples(
        self,
        level: int,
        lo_ns: int | None = None,
        hi_ns: int | None = None,
        channels=None,
    ) -> DataFrame:
        """Pruned scan of one level: date-partition pruning from the time
        range + parquet predicate pushdown on (channel, t).

        F4: a level that was never configured/written yields an EMPTY
        result, not an error (`ArchiveAccessServiceImpl.java:794-805`)."""
        if not self.fs.exists(self._level_path(level)):
            schema = RAW_SCHEMA if level == 0 else DEC_SCHEMA
            return self.spark.createDataFrame([], schema)
        try:
            df = self.spark.read.parquet(self._level_path(level))
        except Exception as ex:  # zero-file level dir (empty ingest) ≡ F4
            if "UNABLE_TO_INFER_SCHEMA" not in str(ex):
                raise
            schema = RAW_SCHEMA if level == 0 else DEC_SCHEMA
            return self.spark.createDataFrame([], schema)
        if lo_ns is not None:
            df = df.filter(
                (F.col("date") >= F.lit(_py_date(lo_ns))) & (F.col("t") >= lo_ns)
            )
        if hi_ns is not None:
            df = df.filter(
                (F.col("date") <= F.lit(_py_date(hi_ns))) & (F.col("t") <= hi_ns)
            )
        if channels is not None:
            df = df.filter(F.col("channel").isin(list(channels)))
        return df.drop("date")

    def levels(self) -> list[int]:
        out = []
        for name in self.fs.listdir(self.samples_path):
            if name.startswith("decimation_level="):
                out.append(int(name.split("=", 1)[1]))
        return sorted(out)

    # -- high-water mark (W3) -------------------------------------------
    def high_water_mark(self, level: int) -> int | None:
        """Max archived t for a level, scanning only the newest date
        partition (partition pruning keeps this O(1 day) at any scale)."""
        path = self._level_path(level)
        dates = sorted(
            d.split("=", 1)[1]
            for d in self.fs.listdir(path)
            if d.startswith("date=")
        )
        if not dates:
            return None
        df = self.spark.read.parquet(path)
        row = (
            df.filter(F.col("date") == dates[-1])
            .agg(F.max("t").alias("hwm"))
            .first()
        )
        return None if row is None or row.hwm is None else row.hwm

    def latest_at_or_before(self, level: int, ts_ns: int) -> int | None:
        """Max t with ``t <= ts`` — steps backward one date partition at a
        time (newest first), the same shape as the reference's bucket-
        stepping backward probe (`ArchiveAccessServiceImpl.java:239-316`):
        typically touches exactly one partition regardless of archive size."""
        path = self._level_path(level)
        limit = _py_date(ts_ns)
        dates = sorted(
            (
                d.split("=", 1)[1]
                for d in self.fs.listdir(path)
                if d.startswith("date=")
            ),
            reverse=True,
        )
        for d in dates:
            if d > limit:
                continue
            row = (
                self.spark.read.parquet(f"{path}/date={d}")
                .filter(F.col("t") <= ts_ns)
                .agg(F.max("t").alias("t"))
                .first()
            )
            if row is not None and row.t is not None:
                return row.t
        return None

    # -- retention (S6) --------------------------------------------------
    def delete_older_than(self, level: int, cutoff_ns: int) -> int:
        """Drop data with ``t < cutoff``: whole partitions below the cutoff
        date are removed (metadata-only, like the reference's bucket drops);
        the boundary partition is rewritten with the exact predicate.
        Returns the number of partitions dropped."""
        path = self._level_path(level)
        cutoff_date = _py_date(cutoff_ns)
        dropped = 0
        boundary = None
        for name in sorted(self.fs.listdir(path)):
            if not name.startswith("date="):
                continue
            d = name.split("=", 1)[1]
            if d < cutoff_date:
                self.fs.delete(f"{path}/{name}")
                dropped += 1
            elif d == cutoff_date:
                boundary = f"{path}/{name}"
        if boundary is not None:
            kept = self.spark.read.parquet(boundary).filter(
                F.col("t") >= cutoff_ns
            )
            tmp = boundary + ".tmp"
            kept.write.mode("overwrite").parquet(tmp)
            self.fs.replace(tmp, boundary)
        return dropped

    # -- compaction (96 MB rollover analog) ------------------------------
    def compact(self, level: int, target_files_per_partition: int = 1) -> None:
        """Rewrite each date partition into ``target_files_per_partition``
        sorted files (the OPTIMIZE pass for append-fragmented partitions)."""
        path = self._level_path(level)
        for name in sorted(self.fs.listdir(path)):
            if not name.startswith("date="):
                continue
            part = f"{path}/{name}"
            df = self.spark.read.parquet(part)
            tmp = part + ".tmp"
            (
                df.coalesce(target_files_per_partition)
                .sortWithinPartitions("channel", "t")
                .write.mode("overwrite")
                .option("maxRecordsPerFile", self.max_records_per_file)
                .parquet(tmp)
            )
            self.fs.replace(tmp, part)


def _py_date(t_ns: int) -> str:
    import datetime

    return (
        datetime.date(1970, 1, 1) + datetime.timedelta(days=t_ns // DAY_NS)
    ).isoformat()
