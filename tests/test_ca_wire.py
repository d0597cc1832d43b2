"""EPICS Channel Access wire codec (functions/ca_wire.py): byte layout
pinned field-by-field against the public CA protocol spec, epoch shift
against the reference's constant
(`ChannelAccessSampleValueAccess.java:79`), and the Spark
decode/resolve pipeline end-to-end."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from cassandra_pv_archiver_spark.functions.ca_wire import (
    CA_PROTO_EVENT_ADD,
    DBR_TIME_DOUBLE,
    EPICS_EPOCH_OFFSET_S,
    decode_monitor_events,
    encode_monitor_event,
    encode_samples,
    resolve_subscriptions,
)

NS = 1_000_000_000


def test_frame_layout_matches_spec_offsets():
    """Every header/payload field at its documented offset, big-endian:
    command@0, payload-size@2, dtype@4, count@6, param1@8, sid@12;
    payload: status@16, severity@18, secPastEpoch@20, nsec@24,
    4 pad bytes@28, IEEE double@32."""
    t = (EPICS_EPOCH_OFFSET_S + 1234) * NS + 567
    frame = encode_monitor_event(sid=0xDEADBEEF, t_ns=t, v=-2.5,
                                 severity=2, status=7)
    # dbr_time_double: short status + short severity + TS_STAMP(8) +
    # RISC pad(4) + double = 24 bytes (8-aligned as CA requires)
    assert len(frame) == 16 + 24
    assert struct.unpack(">H", frame[0:2])[0] == CA_PROTO_EVENT_ADD
    assert struct.unpack(">H", frame[2:4])[0] == 24  # payload bytes
    assert struct.unpack(">H", frame[4:6])[0] == DBR_TIME_DOUBLE == 20
    assert struct.unpack(">H", frame[6:8])[0] == 1  # element count
    assert struct.unpack(">I", frame[12:16])[0] == 0xDEADBEEF
    assert struct.unpack(">h", frame[16:18])[0] == 7   # status
    assert struct.unpack(">h", frame[18:20])[0] == 2   # severity
    assert struct.unpack(">I", frame[20:24])[0] == 1234  # EPICS seconds
    assert struct.unpack(">I", frame[24:28])[0] == 567   # nsec
    assert struct.unpack(">d", frame[32:40])[0] == -2.5
    # big-endian double spot check: -2.5 = 0xC004000000000000
    assert frame[32:40] == bytes.fromhex("c004000000000000")


def test_epoch_shift_matches_reference_constant():
    assert EPICS_EPOCH_OFFSET_S == 631_152_000
    # a wall-clock instant survives the epoch shift exactly
    t = 1_700_000_000 * NS + 123_456_789
    frame = encode_monitor_event(1, t, 0.0)
    secs = struct.unpack(">I", frame[20:24])[0]
    nsec = struct.unpack(">I", frame[24:28])[0]
    assert (secs + EPICS_EPOCH_OFFSET_S) * NS + nsec == t


def test_unsigned_seconds_cover_post_2038():
    """secPastEpoch is unsigned 32-bit: a 2090 timestamp (EPICS seconds
    > 2^31) must roundtrip — the reference's signed-wrap correction
    (`ChannelAccessSampleValueAccess.java:1082`)."""
    t = (EPICS_EPOCH_OFFSET_S + 2**31 + 17) * NS
    frame = encode_monitor_event(1, t, 1.0)
    secs = struct.unpack(">I", frame[20:24])[0]
    assert secs == 2**31 + 17


def test_encode_rejects_pre_epoch():
    with pytest.raises(ValueError, match="epoch"):
        encode_monitor_event(1, 0, 1.0)  # 1970 predates the EPICS epoch


def test_spark_decode_resolve_roundtrip(spark):
    rows = [
        ("PV:A", (EPICS_EPOCH_OFFSET_S + 10) * NS + 5, 1.25, 0, 0),
        ("PV:A", (EPICS_EPOCH_OFFSET_S + 20) * NS, -7.5, 2, 7),
        ("PV:B", (EPICS_EPOCH_OFFSET_S + 15) * NS, 3.0, 1, 3),
    ]
    samples = spark.createDataFrame(
        rows, "channel string, t long, v double, severity int, status int"
    )
    subs = spark.createDataFrame(
        [("PV:A", 11), ("PV:B", 22)], "channel string, sid long"
    )
    frames = encode_samples(samples, subs)
    back = resolve_subscriptions(decode_monitor_events(frames), subs)
    assert {tuple(r) for r in back.collect()} == set(rows)


def test_decoder_skips_foreign_traffic_and_orphan_sids(spark):
    """A capture interleaves non-event commands (search/create-channel)
    and may begin mid-session (events whose sid has no known channel):
    the decoder drops the former, the resolver the latter."""
    good = encode_monitor_event(11, (EPICS_EPOCH_OFFSET_S + 1) * NS, 5.0)
    orphan = encode_monitor_event(99, (EPICS_EPOCH_OFFSET_S + 2) * NS, 6.0)
    # CA_PROTO_SEARCH (command 6), empty payload
    foreign = struct.pack(">HHHHII", 6, 0, 5, 1, 0, 0)
    frames = spark.createDataFrame(
        [(bytearray(good),), (bytearray(orphan),), (bytearray(foreign),)],
        "frame binary",
    )
    events = decode_monitor_events(frames)
    assert {r.sid for r in events.collect()} == {11, 99}
    subs = spark.createDataFrame([("PV:A", 11)], "channel string, sid long")
    out = resolve_subscriptions(events, subs).collect()
    assert len(out) == 1 and out[0].channel == "PV:A" and out[0].v == 5.0


def test_truncated_frame_raises(spark):
    good = encode_monitor_event(1, (EPICS_EPOCH_OFFSET_S + 1) * NS, 1.0)
    frames = spark.createDataFrame(
        [(bytearray(good[:20]),)], "frame binary"
    )
    with pytest.raises(Exception, match="truncated"):
        decode_monitor_events(frames).collect()


def test_waveform_count_rejected(spark):
    """count > 1 (waveform PV) must raise, not silently truncate to
    element 0."""
    good = encode_monitor_event(1, (EPICS_EPOCH_OFFSET_S + 1) * NS, 1.0)
    hacked = bytearray(good)
    hacked[6:8] = struct.pack(">H", 3)  # claim 3 elements
    frames = spark.createDataFrame([(bytes(hacked),)], "frame binary")
    with pytest.raises(Exception, match="waveform"):
        decode_monitor_events(frames).collect()


def test_array_event_layout_and_roundtrip(spark):
    from cassandra_pv_archiver_spark.functions.ca_wire import (
        decode_monitor_event_arrays,
        encode_monitor_event_array,
    )

    vals = [1.5, -2.25, 3.0]
    t = (EPICS_EPOCH_OFFSET_S + 7) * NS + 9
    frame = encode_monitor_event_array(42, t, vals, severity=1, status=3)
    # standard header: count=3, payload = 16 + 3*8 = 40
    assert struct.unpack(">H", frame[2:4])[0] == 40
    assert struct.unpack(">H", frame[6:8])[0] == 3
    assert struct.unpack(">3d", frame[32:56]) == tuple(vals)
    out = decode_monitor_event_arrays(
        spark.createDataFrame([(frame,)], "frame binary")
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.sid, r.t, r.severity, r.status) == (42, t, 1, 3)
    assert list(r.varr) == vals


def test_array_event_extended_header(spark):
    """The extended-header form (psize=0xFFFF sentinel, count=0, uint32
    size + count follow) must decode identically — forced at a small
    size so the test stays cheap; payloads past 64 KiB take this path
    automatically."""
    from cassandra_pv_archiver_spark.functions.ca_wire import (
        decode_monitor_event_arrays,
        encode_monitor_event_array,
    )

    vals = [float(i) for i in range(5)]
    t = (EPICS_EPOCH_OFFSET_S + 1) * NS
    std = encode_monitor_event_array(9, t, vals)
    ext = encode_monitor_event_array(9, t, vals, force_extended=True)
    assert ext != std and len(ext) == len(std) + 8
    assert struct.unpack(">H", ext[2:4])[0] == 0xFFFF
    assert struct.unpack(">H", ext[6:8])[0] == 0
    assert struct.unpack(">II", ext[16:24]) == (16 + 5 * 8, 5)
    rows = decode_monitor_event_arrays(
        spark.createDataFrame([(std,), (ext,)], "frame binary")
    ).collect()
    assert len(rows) == 2
    assert all(list(r.varr) == vals and r.t == t for r in rows)


def test_array_event_rejects_empty_and_truncated(spark):
    from cassandra_pv_archiver_spark.functions.ca_wire import (
        decode_monitor_event_arrays,
        encode_monitor_event_array,
    )

    with pytest.raises(ValueError, match=">= 1"):
        encode_monitor_event_array(1, (EPICS_EPOCH_OFFSET_S + 1) * NS, [])
    good = encode_monitor_event_array(
        1, (EPICS_EPOCH_OFFSET_S + 1) * NS, [1.0, 2.0]
    )
    frames = spark.createDataFrame([(good[:30],)], "frame binary")
    with pytest.raises(Exception, match="truncated"):
        decode_monitor_event_arrays(frames).collect()


def test_scalar_decoder_accepts_extended_header(spark):
    from cassandra_pv_archiver_spark.functions.ca_wire import (
        encode_monitor_event_array,
    )

    t = (EPICS_EPOCH_OFFSET_S + 5) * NS + 1
    ext = encode_monitor_event_array(7, t, [4.5], force_extended=True)
    out = decode_monitor_events(
        spark.createDataFrame([(ext,)], "frame binary")
    ).collect()
    assert len(out) == 1 and out[0].sid == 7 and out[0].v == 4.5
    assert out[0].t == t
