"""Live CA client lifecycle (streaming/ca_client.py) against the
embedded server sim. The full chain (handshake -> subscribe -> Spark
decode -> decimate) is driver-attested by the `ca_live_subscribe`
registry query; these tests pin the protocol edges."""

from __future__ import annotations

import struct

import pytest

from cassandra_pv_archiver_spark.functions import ca_wire
from cassandra_pv_archiver_spark.streaming.ca_client import (
    CAServerSim,
    ca_subscribe,
)

NS = 1_000_000_000
BASE = 1_600_000_000 * NS


def _schedule(n_channels: int = 4, n_events: int = 25):
    return {
        f"PV:{i}": [
            (BASE + k * NS + i, float(i * 100 + k), (i + k) % 4, (i * k) % 7)
            for k in range(n_events)
        ]
        for i in range(n_channels)
    }


def _decode_frame(fr: bytes):
    _cmd, _ps, _dt, _ct, _p1, subid = struct.unpack(">HHHHII", fr[:16])
    status, severity, secs, nsec = struct.unpack(">hhII", fr[16:28])
    (v,) = struct.unpack(">d", fr[32:40])
    return ((secs + ca_wire.EPICS_EPOCH_OFFSET_S) * NS + nsec, v, severity, status)


def test_live_subscribe_delivers_full_schedule():
    sched = _schedule()
    n = sum(len(v) for v in sched.values())
    with CAServerSim(sched) as srv:
        frames, bindings = ca_subscribe("127.0.0.1", srv.port, list(sched), n)
    assert len(frames) == n
    assert sorted(bindings.values()) == sorted(sched)
    got: dict[str, list] = {}
    for ch, fr in frames:
        got.setdefault(ch, []).append(_decode_frame(fr))
    assert got == sched


def test_fragmented_stream_reassembled():
    # 7-byte fragments split every header AND payload across segments
    sched = _schedule(2, 10)
    n = 20
    with CAServerSim(sched, fragment=7) as srv:
        frames, _ = ca_subscribe("127.0.0.1", srv.port, list(sched), n)
    assert len(frames) == n


def test_unknown_channel_create_fail():
    with CAServerSim(_schedule(1)) as srv:
        with pytest.raises(ValueError, match="does not resolve"):
            ca_subscribe("127.0.0.1", srv.port, ["PV:missing"], 1)


def test_sid_binding_is_live_not_positional():
    # server assigns sids starting at 1000 in create order; the client
    # must route by the RESPONSE sid, not by channel order — subscribe
    # in reversed order and check frames still tag correctly
    sched = _schedule(3, 5)
    chans = sorted(sched, reverse=True)
    with CAServerSim(sched) as srv:
        frames, _ = ca_subscribe("127.0.0.1", srv.port, chans, 15)
    for ch, fr in frames:
        t, v, sev, st = _decode_frame(fr)
        assert (t, v, sev, st) in sched[ch], ch


def test_frames_feed_spark_decode(spark):
    sched = _schedule(3, 12)
    n = 36
    with CAServerSim(sched) as srv:
        frames, bindings = ca_subscribe("127.0.0.1", srv.port, list(sched), n)
    fdf = spark.createDataFrame(
        [(ch, bytearray(fr)) for ch, fr in frames], "channel string, frame binary"
    )
    events = ca_wire.decode_monitor_events(fdf)
    dim = spark.createDataFrame(
        [(int(s), c) for s, c in bindings.items()], "sid long, channel string"
    )
    back = ca_wire.resolve_subscriptions(events, dim)
    got: dict[str, list] = {}
    for r in back.collect():
        got.setdefault(r["channel"], []).append(
            (r["t"], r["v"], r["severity"], r["status"])
        )
    assert {ch: sorted(v) for ch, v in got.items()} == sched


def test_live_ca_to_streaming_ingest_cascade_parity(spark, tmp_path):
    """The full reference operating mode, end to end: live CA server ->
    real protocol client -> frame spool (replayable source) ->
    Structured Streaming wire decode + broadcast sid resolution ->
    guarded store sink with 1h decimation cascade. The maintained level
    must equal batch decimation of the schedule — the same parity
    contract the file/rate/Kafka sources pin, now for the CA front
    door."""
    from pyspark.sql import functions as F

    from cassandra_pv_archiver_spark.operators.decimate import decimate
    from cassandra_pv_archiver_spark.sources.archive_store import ArchiveStore
    from cassandra_pv_archiver_spark.streaming.ca_client import (
        spool_capture,
        start_ca_ingest,
    )

    sched = _schedule(4, 60)
    n = sum(len(v) for v in sched.values())
    spool = str(tmp_path / "spool")
    with CAServerSim(sched) as srv:
        bindings = spool_capture(
            "127.0.0.1", srv.port, list(sched), n, spool, chunk_frames=50
        )
    import os

    assert len(os.listdir(spool)) > 1  # multiple chunks -> multiple batches
    import duckdb as _dd

    # localize any flake: the capture leg must have spooled every unique
    # event before the ingest leg starts (the seen-set contract)
    assert (
        _dd.sql(f"SELECT count(*) FROM '{spool}/*.parquet'").fetchone()[0]
        == n
    )

    store = ArchiveStore(spark, str(tmp_path / "archive"))
    q = start_ca_ingest(
        spark,
        spool,
        bindings,
        store,
        checkpoint_dir=str(tmp_path / "ckpt"),
        cascade_periods=[3600],
        max_files_per_trigger=1,
    )
    assert q.awaitTermination(300), "ingest stream did not finish"

    assert store.read_samples(0).count() == n
    raw = spark.createDataFrame(
        [
            (ch, t, v, sev, st)
            for ch, evs in sched.items()
            for t, v, sev, st in evs
        ],
        "channel string, t long, v double, severity int, status int",
    )
    inc = store.read_samples(3600).select("channel", "t", "mean")
    full = decimate(raw, 3600).select(
        "channel", "t", F.col("mean").alias("m2")
    )
    j = inc.join(full, ["channel", "t"], "full")
    assert j.filter(F.col("mean").isNull() | F.col("m2").isNull()).count() == 0
    assert j.filter(F.abs(F.col("mean") - F.col("m2")) > 1e-9).count() == 0

    # replay: a second run over the same spool+checkpoint is a no-op
    q2 = start_ca_ingest(
        spark, spool, bindings, store,
        checkpoint_dir=str(tmp_path / "ckpt"), cascade_periods=[3600],
    )
    assert q2.awaitTermination(300), "replay stream did not finish"
    assert store.read_samples(0).count() == n


def test_reconnect_after_drop_at_least_once(spark, tmp_path):
    """Fault injection: the server cuts the first connection mid-frame
    after 100 monitor events. The client reconnects, resubscribes from
    scratch, and the replayed duplicates are skipped by the capture's
    seen-set while the unique quota keeps progressing — the spool ends
    up with EXACTLY the schedule's unique events despite the fault (no
    loss, no dups), and the store's monotonic guard still holds the T2
    exactly-once contract downstream."""
    import os

    from cassandra_pv_archiver_spark.sources.archive_store import ArchiveStore
    from cassandra_pv_archiver_spark.streaming.ca_client import (
        spool_capture,
        start_ca_ingest,
    )

    sched = _schedule(4, 60)
    n = 240
    spool = str(tmp_path / "spool")
    with CAServerSim(sched, drop_after_frames=100) as srv:
        bindings = spool_capture(
            "127.0.0.1", srv.port, list(sched), n, spool, chunk_frames=64
        )
    import duckdb

    spooled = duckdb.sql(
        f"SELECT count(*) FROM '{spool}/*.parquet'"
    ).fetchone()[0]
    # the first (dropped) attempt's ~100 frames stay spooled; the retry
    # replays them, the seen-set skips the replays, and capture stops at
    # the unique quota: exactly n unique frames despite the fault
    assert spooled == n, "reconnect must lose nothing and duplicate nothing"

    store = ArchiveStore(spark, str(tmp_path / "archive"))
    q = start_ca_ingest(
        spark, spool, bindings, store,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    assert q.awaitTermination(300)
    assert store.read_samples(0).count() == n  # dups reconciled


def test_mid_frame_cut_discards_partial_frame():
    # the client's reader must never hand a half frame downstream
    sched = _schedule(2, 30)
    with CAServerSim(sched, drop_after_frames=10) as srv:
        got = []
        try:
            ca_subscribe(
                "127.0.0.1", srv.port, list(sched), 60,
                on_frame=lambda ch, fr: got.append((ch, fr)),
            )
        except ConnectionError:
            pass
    assert len(got) == 10  # whole frames only
    for ch, fr in got:
        t, v, sev, st = _decode_frame(fr)
        assert (t, v, sev, st) in sched[ch]


def test_spool_resume_parses_index_numerically(tmp_path):
    """Past chunk-99999 the filename grows a digit; lexicographic order
    (or a fixed [6:11] slice) would resume INTO live chunks. The resume
    state must pick the numeric maximum."""
    from cassandra_pv_archiver_spark.streaming.ca_client import (
        _spool_resume_state,
    )

    d = tmp_path / "spool"
    d.mkdir()
    for name in ["chunk-99998.parquet", "chunk-99999.parquet",
                 "chunk-100000.parquet", ".tmp-junk", "other.txt"]:
        (d / name).write_bytes(b"")
    nxt, epoch = _spool_resume_state(str(d))
    assert nxt == 100001
    # epoch anchored to the true newest chunk: epoch + idx == its mtime
    import os
    assert epoch + 100000 == int(os.stat(d / "chunk-100000.parquet").st_mtime)


def test_spool_resume_empty_dir_backdates(tmp_path):
    import time

    from cassandra_pv_archiver_spark.streaming.ca_client import (
        _spool_resume_state,
    )

    d = tmp_path / "spool"
    d.mkdir()
    nxt, epoch = _spool_resume_state(str(d))
    assert nxt == 0
    assert epoch <= int(time.time()) - 6 * 86400
