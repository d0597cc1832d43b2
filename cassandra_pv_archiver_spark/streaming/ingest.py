"""Streaming ingestion into the archive store (S4 + F5 + write path S5).

Reference pipeline (`SampleListener` -> `TimeBoundedQueue` ->
`ArchivingServiceInternalImpl` -> monotonicity filter -> bucket write,
SURVEY.md §3.2). Spark formulation: ``readStream`` (any replayable source —
file source in tests, Kafka in production) -> ``foreachBatch`` which applies
the F5 monotonicity guard against the store's per-channel high-water marks
and appends via :class:`ArchiveStore`. Exactly-once: the file/Kafka source
is replayable and the foreachBatch write is idempotent under the guard (a
replayed batch's rows are all ``t <= hwm`` and get dropped), which is the
Spark analog of the reference's T2 storage/stream reconciliation.

Optionally runs incremental decimation for a cascade of levels after each
batch — the reference's continuous materialization (§3.3) expressed as
per-micro-batch catch-up jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..plans.jobs import incremental_decimation
from ..sources.archive_store import ArchiveStore


def monotonic_guard(batch: DataFrame, hwm: DataFrame | None) -> DataFrame:
    """F5 (`ArchivedChannelDecimationLevel.java:398-425`): drop any sample
    whose timestamp is not strictly greater than everything already written
    for its channel, and dedupe inside the batch (first occurrence wins,
    mirroring arrival order)."""
    w = Window.partitionBy("channel", "t").orderBy(F.col("_seq"))
    batch = (
        batch.withColumn("_seq", F.monotonically_increasing_id())
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_seq")
    )
    if hwm is not None:
        batch = (
            batch.join(F.broadcast(hwm), "channel", "left")
            .filter(F.col("hwm").isNull() | (F.col("t") > F.col("hwm")))
            .drop("hwm")
        )
    return batch


def ingest_batch(
    store: ArchiveStore,
    batch: DataFrame,
    cascade_periods: list[int] | None = None,
) -> int:
    """One micro-batch: guard -> append -> cascade catch-up. Returns rows
    written.

    Exactly-once has TWO layers. The hwm fast path drops replayed rows
    cheaply, but ``write_samples`` commits the data manifest and the hwm
    metadata in two separate commits — a crash between them leaves the
    hwm stale, and a replayed batch would pass the fast path and append
    duplicates. The second layer closes that window exactly: surviving
    rows anti-join against the rows already present in the batch's own
    time range (a pruned scan of the recent date partitions only, cost
    bounded by the batch span). If the anti-join drops everything the
    fast path kept, the data commit had landed but the hwm commit had
    not — the hwm metadata is healed from the replayed rows so the fast
    path recovers (the hwm log is fold-max, so healing is idempotent)."""
    guarded = monotonic_guard(batch, store.channel_hwm(0)).persist()
    final = guarded
    try:
        n_fast = guarded.count()
        if n_fast:
            bounds = guarded.agg(
                F.min("t").alias("mn"), F.max("t").alias("mx")
            ).first()
            existing = store.read_samples(
                0, lo_ns=bounds.mn, hi_ns=bounds.mx
            ).select("channel", "t")
            final = guarded.join(
                existing, ["channel", "t"], "left_anti"
            ).persist()
        n = final.count() if n_fast else 0
        if n:
            store.write_samples(final, level=0)
        if n < n_fast:
            # The anti-join dropped crash-replayed rows for at least one
            # channel whose hwm commit never landed. write_samples above
            # advances the hwm only for channels in `final`, so a MIXED
            # batch (new rows for channel Q, replayed rows for channel P)
            # would leave P's hwm stale indefinitely — correct (the
            # anti-join still guards), but P would pay the anti-join scan
            # on every later batch. Heal from the full guarded batch; the
            # hwm log is fold-max, so the overlap with write_samples'
            # update is idempotent.
            store._update_channel_hwm(guarded, 0)
        # the cascade runs even for an empty/fully-deduped batch ON
        # PURPOSE: a crash after the level-0 write but before the cascade
        # leaves the decimated levels behind, and the replayed batch
        # (n == 0) is the first chance to catch them up — skipping it
        # would delay T3 recovery until the next data arrival
        for period in cascade_periods or []:
            incremental_decimation(store, period)
        return n
    finally:
        guarded.unpersist()
        if final is not guarded:
            final.unpersist()


def start_file_ingest(
    spark,
    source_dir: str,
    schema,
    store: ArchiveStore,
    checkpoint_dir: str,
    cascade_periods: list[int] | None = None,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
    on_batch=None,
):
    """File-source ingestion stream (the test/demo stand-in for a live CA
    monitor feed; swap ``readStream.format`` for Kafka in production).

    ``on_batch(batch_id)`` runs AFTER the store write inside each
    micro-batch — raising from it simulates a crash in the window between
    the store commit and the checkpoint commit (the batch will replay on
    restart; the monotonic guard makes the replay a no-op, which is the
    exactly-once story tests/test_streaming.py pins)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)

    def _sink(batch: DataFrame, batch_id: int) -> None:
        ingest_batch(store, batch, cascade_periods)
        if on_batch is not None:
            on_batch(batch_id)

    writer = stream.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
