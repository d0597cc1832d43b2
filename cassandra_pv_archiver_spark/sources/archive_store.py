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
from .manifest import ManifestTable

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
    """ns epoch -> yyyy-MM-dd partition string (UTC, true FLOOR division:
    Spark's `div` truncates toward zero, so pre-1970 negative ns would
    otherwise land one day LATER than the Python `//` the read-side
    pruning uses (`_py_date`) — written to a partition bounded reads
    never look in)."""
    day = (
        f"(({t_col} div {DAY_NS})"
        f" + (CASE WHEN {t_col} % {DAY_NS} < 0 THEN -1 ELSE 0 END))"
    )
    return F.date_format(
        F.expr(f"date_add(DATE '1970-01-01', CAST({day} AS INT))"),
        "yyyy-MM-dd",
    )


class ArchiveStore:
    """Batch read/write surface over the partitioned samples table."""

    def __init__(self, spark: SparkSession, root: str,
                 max_records_per_file: int = 4_000_000,
                 keep_versions: int = 2):
        self.spark = spark
        self.root = root.rstrip("/")
        self.max_records_per_file = max_records_per_file
        #: manifest versions (snapshots) retained through compaction gc —
        #: the time-travel horizon. 2 = just enough for in-flight readers
        #: of the previous version; raise it to keep older snapshots
        #: readable via read_samples(at_version=...) (VACUUM-retention
        #: analog: storage cost = the replaced files those manifests pin)
        if keep_versions < 1:
            raise ValueError(
                f"keep_versions must be >= 1, got {keep_versions} "
                "(0 would let gc collect every manifest and data file)"
            )
        self.keep_versions = keep_versions
        #: all metadata path ops go through Hadoop FileSystem so the store
        #: works on file:/hdfs:/s3a: alike — no local-FS-only primitives
        self.fs = HadoopFS(spark, self.root)
        #: parsed-schema cache keyed by (level, manifest version) and,
        #: for the legacy footer fallback, by data-file path — safe to
        #: cache forever because manifests and data files are both
        #: immutable (manifest.py contract)
        self._schema_cache: dict = {}

    # -- schema evolution (ADD COLUMN) ------------------------------------
    def level_schema(self, level: int, at_version: int | None = None):
        """Current read schema of one level: the base columns plus any
        evolved (ADD COLUMN) metadata fields — or None when the level has
        never been written.

        The schema record is the level manifest's HEADER (one small text
        read, no data-file access): write_samples commits the UNION of
        the previous header and the batch schema inside the manifest's
        atomic rebase loop, so concurrent appends cannot lose an evolved
        column (a check-then-act footer scheme could: a narrower batch
        committing last would shadow the wider one), and every other
        commit — compact, retention (even one that EMPTIES the file
        list), rename — carries the header forward by default. Iceberg
        records schemas in table metadata the same way.

        Manifests from before headers existed fall back to ONE
        driver-side footer read of the newest committed file (cached;
        files are immutable) — correct for them because their writes
        all predate evolution support.

        Old files simply lack the new columns and read as NULL (the
        reference's pendant: a new per-sample metadata field arriving in
        mid-history — Cassandra's sparse rows return null for cells
        written before the column existed)."""
        from pyspark.sql.types import StructType

        table = self._level_table(level)
        version = (
            at_version if at_version is not None else table.current_version()
        )
        if version is None:
            return None
        # manifests are immutable per version: cache the parsed schema so
        # a read costs one listdir (current_version), not a re-read and
        # re-parse of the whole ~10^5-line manifest text per query
        key = (level, version)
        cached = self._schema_cache.get(key)
        if cached is not None:
            return cached
        hdr = table.header(version)
        if hdr is not None:
            schema = StructType.fromDDL(hdr)
            self._schema_cache[key] = schema
            return schema
        rel = table.files(version)
        if not rel:
            return None
        newest = f"{self._level_path(level)}/{rel[-1]}"
        schema = self._schema_cache.get(newest)
        if schema is None:
            schema = self.spark.read.parquet(newest).schema
            self._schema_cache[newest] = schema
        self._schema_cache[key] = schema
        return schema

    def _read_level_files(
        self, level: int, paths: list[str], at_version: int | None = None
    ) -> DataFrame:
        """Read a subset of one level's data files under the level's
        CURRENT (widest) schema — never schema-by-first-footer, which
        on a mixed-schema subset would silently drop an evolved column
        (or strip it during a compaction/retention rewrite)."""
        reader = self.spark.read.option("basePath", self._level_path(level))
        schema = self.level_schema(level, at_version)
        if schema is not None:
            reader = reader.schema(schema)
        return reader.parquet(*paths)

    # -- paths -----------------------------------------------------------
    @property
    def samples_path(self) -> str:
        return f"{self.root}/samples"

    def _level_path(self, level: int) -> str:
        return f"{self.samples_path}/decimation_level={level}"

    def _level_table(self, level: int) -> ManifestTable:
        """Each decimation level is a ManifestTable: immutable data files
        + one rename-committed manifest per version — the crash-safe
        commit protocol (see sources/manifest.py; the reference's
        pending-operations table, `ChannelMetaDataDAOImpl.java:
        2124-2144`). Readers resolve the manifest, so append, compact and
        retention swaps are atomic to them."""
        return ManifestTable(self.spark, self._level_path(level))

    def _hwm_path(self, level: int) -> str:
        return f"{self.root}/meta/hwm_level={level}"

    def _hwm_table(self, level: int) -> ManifestTable:
        return ManifestTable(self.spark, self._hwm_path(level))

    # -- write (S5) ------------------------------------------------------
    def write_samples(self, df: DataFrame, level: int) -> None:
        """Append a sample batch to one decimation level (commits one new
        manifest version; concurrent appends commute).

        The batch is hash-distributed by ``(date, channel)`` (so one task
        owns one channel's day — co-locating later per-channel windowing)
        and sorted by ``(channel, t)`` within files for row-group pruning.
        Also folds the batch into the per-channel high-water-mark metadata
        table — the Spark analog of the reference's
        ``decimation_level_to_current_bucket_start_time`` map
        (`ChannelMetaDataDAOImpl.java:2111-2123`).
        """
        cur = self.level_schema(level)
        if cur is not None:
            # append-only evolution guard: the level_schema() fast path
            # (newest footer = widest schema) holds only if no batch ever
            # REGRESSES the schema; a shared column changing type would
            # corrupt the parquet scan the same way
            missing = [
                f.name for f in cur.fields if f.name not in df.columns
            ]
            if missing:
                raise ValueError(
                    "schema evolution is ADD COLUMN only: batch is "
                    f"missing existing column(s) {missing} of level "
                    f"{level} (write them as NULL literals to keep the "
                    "newest-file-carries-the-widest-schema invariant)"
                )
            have = dict(df.dtypes)
            for f in cur.fields:
                if have.get(f.name) != f.dataType.simpleString():
                    raise ValueError(
                        f"column {f.name!r} type changed: level {level} "
                        f"stores {f.dataType.simpleString()}, batch has "
                        f"{have.get(f.name)} (type changes are not "
                        "supported; add a NEW column instead)"
                    )
        df = df.persist()
        try:
            # "date" MUST lead the sort: the V1 parquet writer requires
            # its partition columns as a sort prefix, and when the
            # existing order does not satisfy that, it inserts its own
            # (date)-only sort — and Catalyst's EliminateSorts then drops
            # THIS sort as redundant, silently writing files in input
            # order (no channel/t clustering at all; caught by
            # test_files_are_channel_time_sorted). With the prefix, the
            # writer's requirement is already satisfied and the order
            # survives to the files.
            out = (
                df.withColumn("date", _date_expr("t"))
                .repartition("date", "channel")
                .sortWithinPartitions("date", "channel", "t")
            )
            # stage-then-publish: Spark writes a fresh hidden staging dir,
            # then the files move into the hive layout and ONE manifest
            # rename makes them visible — a crashed writer leaves only
            # unreferenced files for gc, never a half-visible batch
            table = self._level_table(level)
            stage = table.stage_dir()
            (
                out.write.mode("overwrite")
                .option("maxRecordsPerFile", self.max_records_per_file)
                .partitionBy("date")
                .parquet(stage)
            )
            # the level's schema record rides the manifest header: the
            # union is computed INSIDE the commit's rebase loop, so a
            # concurrent wider append can never be shadowed by this one
            # (check-then-act on the newest footer could lose a column)
            batch_fields = [
                (f.name, f.dataType.simpleString()) for f in df.schema.fields
            ]
            table.publish_stage(
                stage, header_fn=_union_header_fn(batch_fields, legacy=cur)
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
        table = self._hwm_table(level)
        stage = table.stage_dir()
        batch.groupBy("channel").agg(F.max("t").alias("hwm")).write.parquet(
            stage
        )
        table.publish_stage(stage)
        if len(table.files() or []) > self.HWM_COMPACT_THRESHOLD:
            self._compact_hwm(level)

    def heal_channel_hwm(self, batch: DataFrame, level: int) -> None:
        """PUBLIC crash-heal surface for ingest (round-10 review): fold a
        batch's per-channel maxima into the hwm log. write_samples
        commits data then hwm in two separate commits; a crash between
        them leaves the hwm stale, and the replaying ingester heals it
        from the replayed rows through THIS method — the append-log is
        fold-max, so overlapping with write_samples' own update is
        idempotent. Owning the contract here keeps streaming/ingest.py
        off the store's private internals."""
        self._update_channel_hwm(batch, level)

    def _compact_hwm(self, level: int) -> None:
        table = self._hwm_table(level)
        old = table.files() or []
        folded = (
            self.spark.read.parquet(*table.paths())
            .groupBy("channel")
            .agg(F.max("hwm").alias("hwm"))
        )
        stage = table.stage_dir()
        folded.coalesce(1).write.parquet(stage)
        # one commit replaces the whole log; a concurrent hwm reader
        # resolving the previous manifest still finds its files until gc
        table.publish_stage(stage, remove=old)
        table.gc(keep_versions=self.keep_versions)

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
        paths = self._hwm_table(level).paths()
        if not paths:
            return None
        return self._localize(
            self.spark.read.parquet(*paths)
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
        paths = ManifestTable(self.spark, self._seed_path(target_level)).paths()
        if not paths:
            return None
        return self._localize(self.spark.read.parquet(*paths))

    def write_seed_state(
        self, target_level: int, seeds: DataFrame
    ) -> tuple[ManifestTable, list[str], list[str]]:
        """Replace the seed table in one commit. Returns
        ``(table, added, removed)`` so a compensating caller
        (:meth:`delete_channel`) can journal the swap for undo."""
        table = ManifestTable(self.spark, self._seed_path(target_level))
        old = table.files() or []
        stage = table.stage_dir()
        seeds.coalesce(1).write.parquet(stage)
        added = table.publish_stage(stage, remove=old)
        table.gc(keep_versions=self.keep_versions)
        return table, added, old

    # -- read (S1/S2) ----------------------------------------------------
    def read_samples(
        self,
        level: int,
        lo_ns: int | None = None,
        hi_ns: int | None = None,
        channels=None,
        at_version: int | None = None,
    ) -> DataFrame:
        """Pruned scan of one level: date-partition pruning from the time
        range + parquet predicate pushdown on (channel, t).

        F4: a level that was never configured/written yields an EMPTY
        result, not an error (`ArchiveAccessServiceImpl.java:794-805`).

        The file list comes from the level's manifest (atomic snapshot —
        a concurrent append/compact/retention commit flips the pointer,
        it never half-swaps a directory under this scan) and is pruned
        DRIVER-SIDE on the date embedded in each path before Spark
        touches a single parquet footer — Iceberg-style manifest
        pruning; the t/channel predicates still push down to row
        groups.

        ``at_version`` time-travels the scan to an older retained
        snapshot (Iceberg/Delta ``VERSION AS OF``): the manifest history
        IS a version log, and because data files are immutable, reading
        version N's file list reproduces version N's table bit-exactly.
        Snapshots older than ``keep_versions`` commits are pruned by
        compaction/retention gc; asking for one raises with the retained
        range (the VACUUM-horizon error lakehouses give)."""
        if at_version is not None:
            retained = self._level_table(level).versions()
            if at_version not in retained:
                raise ValueError(
                    f"version {at_version} of level {level} is not "
                    f"retained (available: {retained}); raise "
                    f"keep_versions to widen the time-travel horizon"
                )
        files = self._level_files(
            level,
            None if lo_ns is None else _py_date(lo_ns),
            None if hi_ns is None else _py_date(hi_ns),
            at_version=at_version,
        )
        if not files:
            # schema-stable empty result: after evolution an empty time
            # window must still carry the evolved columns, or unionByName
            # / .select("src_tag") against a non-empty read breaks only
            # on empty windows
            schema = self.level_schema(level, at_version)
            if schema is None:
                schema = RAW_SCHEMA if level == 0 else DEC_SCHEMA
            return self.spark.createDataFrame([], schema)
        df = self._read_level_files(level, files, at_version=at_version)
        if lo_ns is not None:
            df = df.filter(F.col("t") >= lo_ns)
        if hi_ns is not None:
            df = df.filter(F.col("t") <= hi_ns)
        if channels is not None:
            df = df.filter(F.col("channel").isin(list(channels)))
        return df.drop("date")

    def _level_files(
        self,
        level: int,
        date_lo: str | None = None,
        date_hi: str | None = None,
        at_version: int | None = None,
    ) -> list[str]:
        """Absolute data-file paths of one level's current (or
        time-travelled) manifest, pruned to a [date_lo, date_hi] partition
        range via the path's ``date=`` segment — zero storage RPCs beyond
        one manifest read."""
        table = self._level_table(level)
        rel = table.files(at_version)
        if rel is None:
            return []
        out = []
        for r in rel:
            d = _file_date(r)
            if date_lo is not None and d is not None and d < date_lo:
                continue
            if date_hi is not None and d is not None and d > date_hi:
                continue
            out.append(f"{table.root}/{r}")
        return out

    def level_versions(self, level: int) -> list[int]:
        """Retained snapshot versions of one level, oldest first — the
        time-travel surface (`DESCRIBE HISTORY` analog). Each entry is
        readable via ``read_samples(level, at_version=v)``."""
        return self._level_table(level).versions()

    def read_changes(
        self, level: int, from_version: int, to_version: int
    ) -> DataFrame:
        """Changed-data feed between two retained snapshots (the Delta
        CDF / Iceberg incremental-read analog): the rows APPENDED in
        ``(from_version, to_version]``, computed from the MANIFEST DIFF
        alone — data files are immutable, so the rows added between two
        append commits are exactly the contents of the files added, and
        the scan reads ONLY those files (an incremental consumer's cost
        is proportional to the delta, never the table — the property
        that makes downstream cascade/replication jobs O(new data) at
        100 TB; the store's own incremental decimation gets the same
        economics through the hwm instead).

        Raises if a file present in ``from_version`` is gone in
        ``to_version`` (a compaction/retention rewrite in the window):
        across rewrites "what changed" is no longer expressible as a
        file set and callers must diff snapshots semantically
        (read_samples(at_version) + anti-join) instead."""
        table = self._level_table(level)
        retained = table.versions()
        for v in (from_version, to_version):
            if v not in retained:
                raise ValueError(
                    f"version {v} of level {level} is not retained "
                    f"(available: {retained})"
                )
        before = set(table.files(from_version) or [])
        after = table.files(to_version) or []
        removed = before - set(after)
        if removed:
            raise ValueError(
                f"level {level} versions {from_version}->{to_version} "
                f"rewrote {len(removed)} file(s) (compaction/retention); "
                "append-only CDC does not apply — diff the snapshots via "
                "read_samples(at_version=...) instead"
            )
        added = [f"{self._level_path(level)}/{r}" for r in after if r not in before]
        if not added:
            schema = self.level_schema(level, to_version)
            if schema is None:
                schema = RAW_SCHEMA if level == 0 else DEC_SCHEMA
            return self.spark.createDataFrame([], schema)
        # widest schema AS OF to_version, never schema-by-first-footer:
        # a CDC window spanning an ADD COLUMN commit mixes file schemas,
        # and an inferred read could silently drop the evolved column
        df = self._read_level_files(level, added, at_version=to_version)
        return df.drop("date")

    def stats(self) -> list[dict]:
        """Per-level table statistics from MANIFESTS ALONE — zero data
        reads, zero directory walks (the DESCRIBE DETAIL analog; the
        reference answers the same questions from its bucket bookkeeping
        tables, `ChannelMetaDataDAOImpl.java:2092-2123`). Returns one dict
        per level: level, version, n_files, n_partitions, date_min,
        date_max."""
        out = []
        for level in self.levels():
            table = self._level_table(level)
            rel = table.files() or []
            dates = sorted(
                {d for d in (_file_date(r) for r in rel) if d is not None}
            )
            out.append(
                {
                    "level": level,
                    "version": table.current_version(),
                    "n_files": len(rel),
                    "n_partitions": len(dates),
                    "date_min": dates[0] if dates else None,
                    "date_max": dates[-1] if dates else None,
                }
            )
        return out

    def levels(self) -> list[int]:
        out = []
        for name in self.fs.listdir(self.samples_path):
            if name.startswith("decimation_level="):
                out.append(int(name.split("=", 1)[1]))
        return sorted(out)

    # -- high-water mark (W3) -------------------------------------------
    def _level_dates(self, level: int) -> list[str]:
        """Distinct date partitions in the level's current manifest."""
        rel = self._level_table(level).files() or []
        return sorted({d for d in (_file_date(r) for r in rel) if d is not None})

    def high_water_mark(self, level: int) -> int | None:
        """Max archived t for a level, scanning only the newest date
        partition (manifest pruning keeps this O(1 day) at any scale)."""
        dates = self._level_dates(level)
        if not dates:
            return None
        files = self._level_files(level, dates[-1], dates[-1])
        row = (
            self.spark.read.parquet(*files).agg(F.max("t").alias("hwm")).first()
        )
        return None if row is None or row.hwm is None else row.hwm

    def probe_stats(
        self,
        level: int,
        start_ns: int,
        end_ns: int,
        channels: list[str],
        max_backward_partitions: int = 64,
    ) -> dict[str, tuple[int | None, int | None, int | None]]:
        """Per-channel planner probes — ``(bt, rmin, ft)`` = latest t <=
        start / min t in [start, end] / min t >= end — answered from
        PARTITION-BOUNDED scans driven by the manifest, for
        ``plans.planner.plan_samples(stats=...)``:

          * ``rmin`` reads only the [start, end] date partitions (the
            range a query touches anyway);
          * ``bt`` steps BACKWARD one date partition at a time from
            ``start`` (the reference's reverse bucket walk,
            `ArchiveAccessServiceImpl.java:239-316`) and stops as soon as
            every requested channel resolved — at any archive size the
            common case touches ONE partition, where the generic probe
            aggregation's ``t <= start`` arm must scan all history (no
            lower bound to push down). The walk is capped at
            ``max_backward_partitions`` date-steps; unresolved channels
            then get one final scan over the remaining older partitions
            (correct, just no longer incremental — the pathological
            sparse-channel case);
          * ``ft`` steps FORWARD from ``end`` symmetrically (uncapped:
            the future side is normally short).

        Returns {channel: (bt, rmin, ft)} with None for missing probes.
        """
        chans = list(channels)
        out: dict[str, list] = {c: [None, None, None] for c in chans}
        dates = self._level_dates(level)
        d_start, d_end = _py_date(start_ns), _py_date(end_ns)

        in_range = [d for d in dates if d_start <= d <= d_end]
        if in_range:
            df = self.spark.read.parquet(
                *self._level_files(level, in_range[0], in_range[-1])
            )
            rows = (
                df.filter(
                    F.col("channel").isin(chans)
                    & F.col("t").between(start_ns, end_ns)
                )
                .groupBy("channel")
                .agg(F.min("t").alias("rmin"))
                .collect()
            )
            for r in rows:
                out[r.channel][1] = r.rmin

        def _walk(cands: list[str], pending: set[str], slot: int,
                  agg, pred, cap: int | None):
            steps = 0
            for i, d in enumerate(cands):
                if not pending:
                    return
                if cap is not None and steps >= cap:
                    # one bounded fallback scan over everything left
                    rest = cands[i:]
                    if not rest:
                        return
                    files = self._level_files(level, rest[-1], rest[0]) \
                        if slot == 0 else self._level_files(level, rest[0], rest[-1])
                    df = self.spark.read.parquet(*files)
                    rows = (
                        df.filter(F.col("channel").isin(list(pending)) & pred)
                        .groupBy("channel").agg(agg.alias("x")).collect()
                    )
                    for r in rows:
                        if r.x is not None:
                            out[r.channel][slot] = r.x
                    return
                df = self.spark.read.parquet(*self._level_files(level, d, d))
                rows = (
                    df.filter(F.col("channel").isin(list(pending)) & pred)
                    .groupBy("channel").agg(agg.alias("x")).collect()
                )
                for r in rows:
                    if r.x is not None:
                        out[r.channel][slot] = r.x
                        pending.discard(r.channel)
                steps += 1

        _walk(
            [d for d in reversed(dates) if d <= d_start],
            set(chans), 0, F.max("t"), F.col("t") <= start_ns,
            max_backward_partitions,
        )
        _walk(
            [d for d in dates if d >= d_end],
            set(chans), 2, F.min("t"), F.col("t") >= end_ns, None,
        )
        return {c: tuple(v) for c, v in out.items()}

    def latest_at_or_before(self, level: int, ts_ns: int) -> int | None:
        """Max t with ``t <= ts`` — steps backward one date partition at a
        time (newest first), the same shape as the reference's bucket-
        stepping backward probe (`ArchiveAccessServiceImpl.java:239-316`):
        typically touches exactly one partition regardless of archive size."""
        limit = _py_date(ts_ns)
        for d in reversed(self._level_dates(level)):
            if d > limit:
                continue
            row = (
                self.spark.read.parquet(*self._level_files(level, d, d))
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
        table = self._level_table(level)
        cutoff_date = _py_date(cutoff_ns)
        rel = table.files() or []
        expired = [
            r for r in rel
            if (_file_date(r) or "") < cutoff_date and _file_date(r) is not None
        ]
        dropped = len({_file_date(r) for r in expired})
        boundary = [r for r in rel if _file_date(r) == cutoff_date]
        if boundary:
            # exact trim of the boundary partition: rewrite survivors to a
            # stage dir, ONE commit swaps them in and drops both the
            # boundary's old files and the expired partitions — readers
            # see the pre- or post-retention table, never a partial sweep
            kept = self._read_level_files(
                level, [f"{table.root}/{r}" for r in boundary]
            ).filter(F.col("t") >= cutoff_ns)
            stage = table.stage_dir()
            (
                kept.withColumn("date", F.lit(cutoff_date))
                .sortWithinPartitions("date", "channel", "t")
                .write.partitionBy("date")
                # same file-size bound as every other write path: repeated
                # sweeps on a hot boundary partition must not accrete
                # files past the MAX_BUCKET_SIZE analog
                .option("maxRecordsPerFile", self.max_records_per_file)
                .parquet(stage)
            )
            table.publish_stage(stage, remove=expired + boundary)
        elif expired:
            table.commit(remove=expired)  # metadata-only, like bucket drops
        table.gc(keep_versions=self.keep_versions)
        return dropped

    # -- compaction (96 MB rollover analog) ------------------------------
    def rename_channel(self, old: str, new: str, preflighted: bool = False) -> int:
        """Rename a channel across every level, metadata included — the
        reference's configuration rename/move operation
        (`ArchiveConfigurationService.java`, `archiving/internal/
        RenameChannelOperation`). The reference keys sample buckets by a
        rename-stable ``channelDataId`` (`SampleBucketId.java:80-89`) so
        its rename is metadata-only; this store keys physical layout by
        channel NAME, so a rename rewrites exactly the files that carry
        the old name (bounded: one channel's footprint, never the table)
        and swaps them in with ONE atomic manifest commit per level — a
        concurrent reader sees the old name or the new name, never both
        or neither. Time-travel reads at pre-rename versions still show
        the old name (immutable files). HWM and decimation seed state
        follow in their own single-commit replaces. Returns the number
        of sample rows that changed name.

        Renaming onto an existing channel refuses loudly (the reference
        rejects colliding renames the same way). A failure mid-way
        through the per-level loop triggers a best-effort COMPENSATION
        (reverse-rename of the already-swapped levels) before the error
        propagates — each level's swap is its own atomic manifest
        commit, so without compensation a crash between levels would
        leave half the history under each name.

        ``preflighted=True`` skips the collision probe for a caller that
        just ran :meth:`rename_target_occupied` itself (the admin
        cascade's pre-flight) — one per-level probe pass, not two."""
        return self._rename_channel(old, new, preflighted=preflighted)

    def repair_rename(
        self, old: str, new: str, rollback: bool = False
    ) -> int:
        """Complete a rename that died half-way (ADVICE r9: the
        half-renamed state was unreachable through the public API — the
        collision probe finds the channel's OWN half-renamed rows under
        ``new`` and refuses both directions, wedging the store).

        Differences from a fresh rename, both REQUIRED for repair:

        * the collision probe is skipped — rows under ``new`` are the
          same channel's already-renamed history (the caller asserts
          this, e.g. the admin cascade's rename-intent marker, or an
          operator who verified the registry still maps one of the two
          names);
        * metadata is repaired on EVERY level whose hwm/seed state still
          MENTIONS ``old`` — a crash between a level's data swap and its
          hwm fold leaves old-name metadata on a level with no old-name
          data rows, which the normal per-level walk skips. On such a
          level the fold never ran (the fold eliminates old-name rows),
          so any ``new``-named metadata there is a fully-expired FOREIGN
          channel's stale leftovers and the fresh-rename purge applies
          unchanged; levels whose metadata no longer mentions ``old``
          already folded (their ``new``-named rows are the renamed
          channel's own state) and are left untouched.

        The purge is DIRECTION-AWARE per metadata table (ADVICE r10):
        a hit-triggered level whose metadata no longer mentions ``old``
        renames without purging, because its ``new``-named rows may be
        the channel's own. That state arises when repairing in the
        ROLLBACK direction — ``repair_rename(B, A)`` after a crashed
        ``A -> B`` rename — on the level the crash split: data already
        under ``B`` (the repair source), hwm/seeds still under ``A``
        (the repair target, and genuine).

        **Rolling BACK a crashed rename? Pass ``rollback=True``.** The
        two directions are indistinguishable from table contents alone
        when a fully-expired FOREIGN channel's stale metadata sits
        under the crashed rename's TARGET name (round-11 review): in a
        rollback that name is the repair SOURCE, and the default
        (forward) heuristic would read the foreign rows as proof the
        fold never ran — purging the channel's genuine metadata and
        adopting the foreign stale rows. With ``rollback=True`` the
        rule inverts correctly: per table, the repair-source-named
        rows are the channel's own ONLY on a hit-triggered level whose
        metadata no longer mentions the repair target (the fold
        completed there); everywhere else they are foreign leftovers
        and are dropped, never folded in. The admin cascade's
        compensation and intent-marker recovery pass the flag on their
        rollback legs.

        Idempotent AND no-op-cheap: repairing an already-complete (or
        never-started) rename renames nothing, commits nothing, and
        returns 0 — safe to run speculatively at startup."""
        return self._rename_channel(
            old, new, preflighted=True, repair=True, rollback=rollback
        )

    def _rename_channel(
        self, old: str, new: str, preflighted: bool, repair: bool = False,
        rollback: bool = False,
    ) -> int:
        if not preflighted:
            occupied = self.rename_target_occupied(new)
            if occupied is not None:
                raise ValueError(
                    f"rename target already exists: {new!r}"
                    f" (level {occupied})"
                )

        def _xf(a: str, b: str):
            def xf(df: DataFrame) -> DataFrame:
                return df.withColumn(
                    "channel",
                    F.when(F.col("channel") == a, F.lit(b)).otherwise(
                        F.col("channel")
                    ),
                )

            return xf

        def _meta_xf(df: DataFrame) -> DataFrame:
            # a fully-expired channel named `new` passes the collision
            # probe (no DATA rows) but can still own stale hwm/seed
            # metadata; folding that into the renamed channel would make
            # incremental decimation silently skip windows up to the
            # stale mark. Purge it, then rename — data levels are
            # unaffected (the probe guarantees no rows named `new`).
            return _xf(old, new)(df.filter(F.col("channel") != new))

        meta_ctx: dict = {}

        def _repair_meta_xf(df: DataFrame) -> DataFrame:
            # Direction-aware purge (ADVICE r10, medium): only purge
            # `new`-named rows when THIS table still mentions `old` —
            # then its fold never ran, so `new`-named rows cannot be the
            # channel's own folded state (they are a fully-expired
            # FOREIGN channel's stale leftovers, the purge's reason to
            # exist). A table that no longer mentions `old` may hold the
            # channel's GENUINE metadata under `new`: in the ROLLBACK
            # direction (repair_rename(B, A) after a crashed A->B
            # rename) a level left between the data swap and the hwm
            # fold has DATA rows under the repair source and the
            # channel's own pre-fold hwm/seeds under the repair TARGET —
            # the unconditional fresh-rename purge would delete them,
            # silently weakening monotonic-append enforcement and
            # incremental-decimation exactly-once until re-seeded. The
            # extra limit(1) probe per metadata table only runs on the
            # rare repair path.
            if df.filter(F.col("channel") == old).limit(1).count() > 0:
                return _meta_xf(df)
            return _xf(old, new)(df)

        def _rollback_meta_xf(df: DataFrame) -> DataFrame:
            # Explicit-rollback rule (round-11 review): the repair
            # SOURCE here is the crashed rename's TARGET — the one name
            # a fully-expired FOREIGN channel's stale metadata can
            # legitimately sit under (the original probe only verified
            # it free of DATA). Source-named rows are the channel's OWN
            # exactly when the original fold completed on this table:
            # the data swap preceded the fold (hit-triggered level) and
            # the fold eliminated every target-named row. Everywhere
            # else they are foreign leftovers: DROP them instead of
            # folding them into the restored channel (inheriting a
            # foreign high-water mark would make incremental decimation
            # silently skip windows — and the forward heuristic above
            # would even purge the channel's own rows first).
            own_folded = meta_ctx.get("hit") and (
                df.filter(F.col("channel") == new).limit(1).count() == 0
            )
            if own_folded:
                return _xf(old, new)(df)
            return _xf(old, new)(df.filter(F.col("channel") != old))

        if repair:
            # no compensation wrapper: repair is idempotent — on failure
            # re-run it, rather than half-reversing a half-repair. The
            # meta transform purges-then-renames ONLY on tables whose
            # fold never ran (see _repair_meta_xf); already-folded
            # levels are skipped untouched (see repair_rename).
            return self._rewrite_channel_rows(
                old, _xf(old, new),
                meta_transform=(
                    _rollback_meta_xf if rollback else _repair_meta_xf
                ),
                meta_all_levels=True,
                meta_ctx=meta_ctx,
            )
        try:
            return self._rewrite_channel_rows(
                old, _xf(old, new), meta_transform=_meta_xf
            )
        except Exception:
            # roll already-renamed levels back (rows under `new` can only
            # be ours: the probe above found none). If the compensation
            # itself fails the original error still propagates — the
            # store is then in the half-renamed state, which the public
            # probe-guarded API refuses to touch; :meth:`repair_rename`
            # (either direction) is the documented way out.
            try:
                self._rewrite_channel_rows(new, _xf(new, old))
            except Exception:  # noqa: BLE001 - keep the primary error
                pass
            raise

    def rename_target_occupied(self, new: str) -> int | None:
        """First level holding any row under ``new`` (None = free): the
        collision probe shared by :meth:`rename_channel` and the admin
        cascade's pre-flight — one channel-pruned limit(1) scan per
        level."""
        for level in self.levels():
            df = self.read_samples(level, channels=[new])
            if df.limit(1).count() > 0:
                return level
        return None

    def delete_channel(self, channel: str) -> int:
        """Remove a channel across every level, metadata included — the
        other `ArchiveConfigurationService` mutation (remove-channel,
        `archiving/internal/RemoveChannelOperation`; the reference also
        deletes the channel's sample buckets). Same bounded-rewrite
        discipline as :meth:`rename_channel`: only the files that carry
        the channel are rewritten (one channel's footprint, never the
        table), swapped in with ONE atomic manifest commit per level —
        a file whose rewrite comes up empty publishes as a pure removal
        (a whole-file delete costs no data write). HWM log and
        decimation seed state drop the channel in their own
        single-commit replaces; pre-delete snapshots still show it
        (immutable files + time travel). Returns sample rows removed.
        Deleting an unknown channel is a no-op returning 0.

        VERDICT r9 #2 — all-or-nothing like rename: a failure mid-way
        through the per-level loop triggers a COMPENSATION before the
        error propagates. Unlike rename there is no inverse transform to
        re-run, but every swap this method committed is journaled
        (``undo_log``) and each level's pre-delete files are still
        referenced by the previous manifest version (``keep_versions >=
        2`` retains it, and gc never collects files a retained version
        lists) — so the compensation re-commits each journaled table
        back to exactly its pre-delete file list, newest swap first.
        With ``keep_versions == 1`` the pre-delete files may already be
        collected, so the compensation is skipped (documented trade of
        that setting) and a crash leaves a partial delete whose retry
        completes it (the rewrite is idempotent per level)."""
        undo_log: list[tuple[ManifestTable, list[str], list[str]]] = []
        try:
            # meta_all_levels: a fully-expired channel has hwm/seed rows
            # on levels with NO data files left; a hits-only walk would
            # leave that stale metadata behind forever, and a later
            # re-creation of the name would make incremental decimation
            # silently skip every window up to the stale high-water mark
            return self._rewrite_channel_rows(
                channel,
                lambda df: df.filter(F.col("channel") != channel),
                undo_log=undo_log,
                meta_all_levels=True,
            )
        except Exception:
            if self.keep_versions >= 2:
                try:
                    for table, added, removed in reversed(undo_log):
                        table.commit(add=removed, remove=added)
                except Exception:  # noqa: BLE001 - keep the primary error
                    pass
            raise

    def delete_channel_level(self, channel: str, level: int) -> int:
        """Remove ONE channel's rows and metadata from a SINGLE
        decimation level — the ``update_channel`` cascade for a dropped
        level (the reference's configuration update deletes the removed
        level's sample buckets, `ArchiveConfigurationService`). Same
        bounded-rewrite discipline as :meth:`delete_channel`, restricted
        to the one level; other levels and channels untouched. Raw
        (level 0) refuses — removing raw is :meth:`delete_channel`'s
        job, never a config edit's side effect."""
        if level == 0:
            raise ValueError(
                "level 0 (raw) cannot be dropped per-level; use "
                "delete_channel"
            )
        return self._rewrite_channel_rows(
            channel,
            lambda df: df.filter(F.col("channel") != channel),
            meta_all_levels=True,
            only_levels={level},
        )

    def _rewrite_channel_rows(
        self,
        channel: str,
        transform,
        meta_transform=None,
        meta_all_levels: bool = False,
        undo_log: list | None = None,
        meta_ctx: dict | None = None,
        only_levels: set | None = None,
    ) -> int:
        """Bounded-rewrite machinery shared by :meth:`rename_channel` and
        :meth:`delete_channel`: per level, discover the files carrying
        ``channel`` (bounded metadata collect — a subset of one
        channel's footprint), apply ``transform`` to exactly those
        files' rows, and swap the rewrite in with ONE atomic manifest
        commit; then fold-and-replace the HWM log and rewrite the
        decimation seed state through ``meta_transform`` (defaults to
        ``transform`` — rename passes a variant that additionally purges
        a fully-expired target channel's STALE metadata rows, which the
        data-level collision probe cannot see). Returns the number of
        sample rows that matched ``channel``.

        ``meta_all_levels=True`` (repair_rename, delete_channel) runs
        the hwm/seed rewrite even on levels with no matching DATA rows:
        a crash between a level's data swap and its hwm fold leaves
        old-name metadata on a level the normal hits-only walk would
        skip, and a fully-expired channel has metadata but no data at
        all. On such no-hit levels the rewrite is GUARDED on the
        metadata actually mentioning ``channel`` — an unconditional
        republish would commit a new manifest version of every
        metadata table on every no-op invocation, churning the
        keep_versions horizon for nothing.

        ``undo_log`` (delete_channel's compensation journal) receives a
        ``(table, added, removed)`` entry immediately after EVERY
        manifest swap this call commits."""
        if meta_transform is None:
            meta_transform = transform

        def _journal(table: ManifestTable, added, removed) -> None:
            if undo_log is not None:
                undo_log.append((table, list(added), list(removed)))

        def _mentions(df: DataFrame) -> bool:
            return (
                df.filter(F.col("channel") == channel).limit(1).count() > 0
            )

        touched = 0
        for level in self.levels():
            if only_levels is not None and level not in only_levels:
                continue
            table = self._level_table(level)
            rel = table.files() or []
            if not rel and not meta_all_levels:
                continue
            hit: set[str] = set()
            if rel:
                full = self._read_level_files(
                    level, [f"{table.root}/{r}" for r in rel]
                )
                hit = {
                    r[0]
                    for r in full.filter(F.col("channel") == channel)
                    .select(F.input_file_name())
                    .distinct()
                    .collect()
                }
            if not hit and not meta_all_levels:
                continue
            if meta_ctx is not None:
                # per-level context for direction-aware repair metadata
                # transforms: whether THIS level's data rows carry the
                # channel (the rollback rule needs it — see
                # _rollback_meta_xf)
                meta_ctx["hit"] = bool(hit)
            if hit:
                affected = _match_manifest_files(rel, hit)
                part = self._read_level_files(
                    level, [f"{table.root}/{r}" for r in affected]
                )
                touched += part.filter(F.col("channel") == channel).count()
                out = (
                    transform(part)
                    .repartition("date", "channel")
                    .sortWithinPartitions("date", "channel", "t")
                )
                stage = table.stage_dir()
                (
                    out.write.option(
                        "maxRecordsPerFile", self.max_records_per_file
                    )
                    .partitionBy("date")
                    .parquet(stage)
                )
                added = table.publish_stage(stage, remove=affected)
                _journal(table, added, affected)
                table.gc(keep_versions=self.keep_versions)
            # HWM log: fold through the same transform, replace in one
            # commit (for a rename the groupBy merges old+new maxima).
            # No-hit levels (the meta_all_levels sweep) rewrite only
            # when the table mentions the channel — see docstring.
            htable = self._hwm_table(level)
            hpaths = htable.paths()
            if hpaths:
                hdf = self.spark.read.parquet(*hpaths)
                if hit or _mentions(hdf):
                    folded = (
                        meta_transform(hdf)
                        .groupBy("channel")
                        .agg(F.max("hwm").alias("hwm"))
                    )
                    hstage = htable.stage_dir()
                    folded.coalesce(1).write.parquet(hstage)
                    hold = htable.files() or []
                    hadded = htable.publish_stage(hstage, remove=hold)
                    _journal(htable, hadded, hold)
                    htable.gc(keep_versions=self.keep_versions)
            # decimation carry seeds for this target level
            seeds = self.read_seed_state(level)
            if seeds is not None and "channel" in seeds.columns:
                if hit or _mentions(seeds):
                    stable, sadded, sold = self.write_seed_state(
                        level, meta_transform(seeds)
                    )
                    _journal(stable, sadded, sold)
        return touched

    @staticmethod
    def zorder_key_expr(channel_col: str = "channel", t_col: str = "t") -> str:
        """Morton (Z-order) interleave of (hash(channel), within-day t) as
        a pure Catalyst expression — the multi-dimensional clustering
        option for :meth:`compact`.

        The default layout sorts files by (channel, t): perfect channel
        pruning, but every file's t min/max spans the whole day, so a
        "narrow time slice across ALL channels" scan (correlation plots,
        incident forensics) can skip nothing. Z-order interleaves 16 bits
        of ``xxhash64(channel)`` with 16 bits of the within-day offset
        (~1.3 s resolution), so each written file covers a small rectangle
        in (channel-hash × time) space and BOTH predicate shapes prune at
        the file/row-group level — the same trade Delta's OPTIMIZE ZORDER
        makes. Pure shifts/masks/ors: whole-stage-codegen'd, no UDF."""
        x = f"(xxhash64({channel_col}) & 65535)"
        y = f"(pmod({t_col}, {DAY_NS}) div {DAY_NS // 65536})"  # 2^16/day
        terms = []
        for i in range(16):
            terms.append(f"(shiftleft(shiftright({x}, {i}) & 1, {2 * i + 1}))")
            terms.append(f"(shiftleft(shiftright({y}, {i}) & 1, {2 * i}))")
        return " | ".join(terms)

    def compact(
        self,
        level: int,
        target_files_per_partition: int = 1,
        zorder: bool = False,
    ) -> None:
        """Rewrite each date partition into ``target_files_per_partition``
        sorted files (the OPTIMIZE pass for append-fragmented partitions).

        ALL fragmented partitions rewrite in ONE Spark job and swap in via
        ONE manifest commit (a per-partition loop was ~1 driver-side job
        per date — 100 sequential jobs for 100 days; one hash-on-date
        repartition rewrites every fragmented day in parallel and scales
        with the cluster, not the partition count). A concurrent reader
        always resolves either the fragmented or the compacted file set —
        never an empty/partial directory (the delete-then-rename failure
        mode this store had before round 3). Replaced files survive until
        ``keep_versions`` commits later (gc), so in-flight readers of
        recent versions — and time-travel reads inside the horizon —
        finish cleanly.

        ``target_files_per_partition=1`` is exact (each date is owned by
        one task); larger targets are a soft cap via (date, channel)
        hashing."""
        table = self._level_table(level)
        by_date: dict[str, list[str]] = {}
        for r in table.files() or []:
            d = _file_date(r)
            if d is not None:
                by_date.setdefault(d, []).append(r)
        old = [
            r
            for files in by_date.values()
            if len(files) > target_files_per_partition
            for r in files
        ]
        if not old:
            return
        df = self._read_level_files(
            level, [f"{table.root}/{r}" for r in old]
        )
        part_cols = (
            ["date"] if target_files_per_partition == 1 else ["date", "channel"]
        )
        stage = table.stage_dir()
        if zorder:
            # multi-dim clustering: files cover (channel-hash x time)
            # rectangles so BOTH channel-slice and time-slice scans prune
            out = (
                df.withColumn("_z", F.expr(self.zorder_key_expr()))
                .repartition(*part_cols)
                # "date" prefix: see write_samples — without it the
                # writer's own partition sort evicts this one
                .sortWithinPartitions("date", "_z")
                .drop("_z")
            )
        else:
            out = df.repartition(*part_cols).sortWithinPartitions(
                "date", "channel", "t"
            )
        (
            out.write.partitionBy("date")
            .option("maxRecordsPerFile", self.max_records_per_file)
            .parquet(stage)
        )
        table.publish_stage(stage, remove=old)
        table.gc(keep_versions=self.keep_versions)


def _match_manifest_files(rel: list[str], hit: set[str]) -> list[str]:
    """Manifest-relative paths (in manifest order) whose data files
    appear in ``hit`` (absolute ``input_file_name()`` URIs).

    O(|rel| + |hit|), replacing the old O(|rel| x |hit|) ``endswith``
    scan (VERDICT r9 #7): each hit's table-relative path is its last 1-3
    path segments (``date=.../file`` for a data level, bare ``file`` for
    hwm/seed tables — basenames alone are NOT unique: one publish writes
    the same part-file name into every date dir), looked up in a set of
    the manifest's paths. A hit no suffix-key resolves (deeper layout
    than any this store writes) falls back to the suffix scan for that
    one hit. ``input_file_name`` percent-encodes special characters;
    manifest paths are raw, hence the unquote."""
    from urllib.parse import unquote

    rel_set = set(rel)
    matched: set[str] = set()
    for h in hit:
        hd = unquote(h.split("://", 1)[-1])
        parts = hd.split("/")
        # longest suffix first: the true relative path is the most
        # specific match (a shorter key could alias a same-named file
        # at a shallower layout depth)
        for k in range(min(3, len(parts)), 0, -1):
            cand = "/".join(parts[-k:])
            if cand in rel_set:
                matched.add(cand)
                break
        else:
            matched.update(r for r in rel if hd.endswith(r))
    return [r for r in rel if r in matched]


def _union_header_fn(batch_fields: list[tuple[str, str]], legacy=None):
    """``header_fn`` for a sample-batch commit: the new manifest header
    is the UNION of the base version's schema and the batch's, evaluated
    INSIDE the commit's rebase loop so a concurrent wider append can
    never be shadowed (check-then-act on the newest footer could lose a
    column).

    A same-name/different-type collision REFUSES the commit loudly
    instead of silently keeping one side: write_samples' pre-commit type
    check runs against the schema it READ, so two racing writers — one
    adding ``x double``, one carrying ``x string`` — can both pass their
    pre-checks, and whichever rebases onto the other's committed header
    must fail HERE or its files would corrupt every scan planned with
    the header schema (VERDICT r9 #8). The refusal aborts before the
    manifest rename: the loser's already-published stage files stay
    unreferenced and gc collects them.

    ``legacy`` (a StructType or None) seeds the base when the previous
    manifest predates headers."""
    from pyspark.sql.types import StructType

    def _header_fn(prev: str | None) -> str:
        if prev is not None:
            base_fields = [
                (f.name, f.dataType.simpleString())
                for f in StructType.fromDDL(prev).fields
            ]
        elif legacy is not None:
            base_fields = [
                (f.name, f.dataType.simpleString()) for f in legacy.fields
            ]
        else:
            base_fields = []
        types = dict(base_fields)
        merged = list(base_fields)
        for n, t in batch_fields:
            have = types.get(n)
            if have is None:
                merged.append((n, t))
                types[n] = t
            elif have != t:
                raise ValueError(
                    f"schema conflict at commit: column {n!r} is {have} "
                    f"in the level's committed schema but {t} in this "
                    "batch (a concurrent commit widened the schema after "
                    "this writer's pre-check; type changes are not "
                    "supported — add a NEW column instead)"
                )
        return ", ".join(f"`{n}` {t}" for n, t in merged)

    return _header_fn


def _file_date(rel_path: str) -> str | None:
    """Extract the yyyy-MM-dd value from a ``date=...`` path segment."""
    for seg in rel_path.split("/"):
        if seg.startswith("date="):
            return seg.split("=", 1)[1]
    return None


def _py_date(t_ns: int) -> str:
    import datetime

    return (
        datetime.date(1970, 1, 1) + datetime.timedelta(days=t_ns // DAY_NS)
    ).isoformat()
