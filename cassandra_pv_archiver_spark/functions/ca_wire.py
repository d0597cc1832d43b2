"""EPICS Channel Access wire-format codec — the reference's actual
front door (`ChannelAccessArchivingChannel.java`, `SampleListener.java`:
a CA client subscribes to PVs and archives every monitor event).

This engine's ingestion is source-agnostic (file / rate / Kafka,
`streaming/ingest.py`); this module closes the remaining seam by making
RAW CA TRAFFIC one more source: a capture of `CA_PROTO_EVENT_ADD`
response frames (the monitor-update message a CA server pushes per
value change) decodes straight into the engine's sample schema.

Wire format (public EPICS Channel Access protocol specification,
R3.14+; all integers BIG-endian):

  header (16 bytes):
    0  uint16  command        — 1 = CA_PROTO_EVENT_ADD
    2  uint16  payload size   — bytes after the header (8-aligned)
    4  uint16  data type      — DBR code; 20 = DBR_TIME_DOUBLE
    6  uint16  data count     — elements in the value array
    8  uint32  param1         — status/ECA code on event responses
    12 uint32  param2         — subscription ID (client-chosen per
                                EVENT_ADD request; maps to a channel)
  DBR_TIME_DOUBLE payload:
    0  int16   status         — alarm status (C2 codec's code space)
    2  int16   severity       — alarm severity 0..3
    4  uint32  secPastEpoch   — seconds since 1990-01-01 (EPICS epoch)
    8  uint32  nsec
    12 4 bytes RISC padding
    16 float64 value[count]   — IEEE big-endian

Epoch: EPICS counts from 1990-01-01; the reference shifts by
`OFFSET_EPICS_EPOCH_TO_UNIX_EPOCH_SECONDS = 631152000`
(`ChannelAccessSampleValueAccess.java:79`) and treats secPastEpoch as
UNSIGNED 32-bit (`:1082`); both conventions are reproduced here.

CA events carry a subscription ID, not a channel name — the name was
bound earlier by the EVENT_ADD *request*. Decoding therefore yields
(sid, t, v, severity, status) and the caller resolves sid -> channel
through a broadcast join against the subscription dim
(:func:`resolve_subscriptions`), exactly the bounded-metadata join shape
the reference's in-memory sid map implies.

Scale shape: IEEE doubles cannot be bit-cast from binary with built-in
Spark SQL functions, so frame decode is ONE declared Arrow-batched
Python crossing (`mapInPandas`, fixed-size payloads — same contract as
the image codec); everything after it is Catalyst. The byte layout is
pinned field-by-field against the spec offsets in
`tests/test_ca_wire.py`, and the `ca_ingest_roundtrip_1h` registry query
value-hashes an encode -> decode -> decimate pipeline against the
codec-free oracle.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CA_PROTO_EVENT_ADD = 1
DBR_TIME_DOUBLE = 20
EPICS_EPOCH_OFFSET_S = 631152000  # 1970-01-01 -> 1990-01-01
_NS = 1_000_000_000

#: decoded monitor events (channel resolution joins later)
CA_EVENT_SCHEMA = "sid long, t long, v double, severity int, status int"


def encode_monitor_event(
    sid: int, t_ns: int, v: float, severity: int = 0, status: int = 0
) -> bytes:
    """One CA_PROTO_EVENT_ADD response frame carrying a single
    DBR_TIME_DOUBLE — the exact bytes a CA server pushes per monitor
    update (big-endian header + payload, spec layout above)."""
    secs, nsec = divmod(t_ns, _NS)
    epics_secs = secs - EPICS_EPOCH_OFFSET_S
    if not (0 <= epics_secs < 2**32):
        raise ValueError(f"timestamp {t_ns} outside the CA epoch range")
    payload = struct.pack(
        ">hhII4xd", status, severity, epics_secs, nsec, v
    )
    header = struct.pack(
        ">HHHHII",
        CA_PROTO_EVENT_ADD,
        len(payload),
        DBR_TIME_DOUBLE,
        1,
        1,  # ECA_NORMAL
        sid,
    )
    return header + payload


def decode_monitor_events(frames: DataFrame, frame_col: str = "frame") -> DataFrame:
    """(.., frame binary) -> CA_EVENT_SCHEMA rows.

    Non-EVENT_ADD commands and non-DBR_TIME_DOUBLE payloads are dropped
    (a capture interleaves search/create-channel traffic; only monitor
    updates carry samples); a truncated frame raises rather than
    decoding garbage. Unsigned-seconds and the 1990 epoch follow the
    reference (`ChannelAccessSampleValueAccess.java:79,1082`)."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sids, ts, vs, sevs, stats = [], [], [], [], []
            for raw in pdf[frame_col]:
                b = bytes(raw)
                if len(b) < 16:
                    raise ValueError("truncated CA header")
                cmd, psize, dtype, count, _p1, sid = struct.unpack(
                    ">HHHHII", b[:16]
                )
                off = 16
                if psize == 0xFFFF and count == 0:  # extended header
                    if len(b) < 24:
                        raise ValueError("truncated CA extended header")
                    psize, count = struct.unpack(">II", b[16:24])
                    off = 24
                if cmd != CA_PROTO_EVENT_ADD or dtype != DBR_TIME_DOUBLE:
                    continue
                if count != 1:
                    # waveform PVs (count > 1) need the array decoder
                    # (decode_monitor_event_arrays); silently reading
                    # element 0 would misrepresent them
                    raise NotImplementedError(
                        f"CA event with {count} elements: use"
                        " decode_monitor_event_arrays for waveform samples"
                    )
                if len(b) < off + psize or psize < 24:
                    raise ValueError("truncated CA payload")
                status, severity, epics_secs, nsec = struct.unpack(
                    ">hhII", b[off:off + 12]
                )
                (v,) = struct.unpack(">d", b[off + 16:off + 24])
                # epics_secs came out of an unsigned unpack; the
                # reference's signed-wrap correction is the same value
                t = (epics_secs + EPICS_EPOCH_OFFSET_S) * _NS + nsec
                sids.append(sid)
                ts.append(t)
                vs.append(v)
                sevs.append(severity)
                stats.append(status)
            yield pd.DataFrame(
                {
                    "sid": pd.Series(sids, dtype="int64"),
                    "t": pd.Series(ts, dtype="int64"),
                    "v": pd.Series(vs, dtype="float64"),
                    "severity": pd.Series(sevs, dtype="int32"),
                    "status": pd.Series(stats, dtype="int32"),
                }
            )

    return frames.select(frame_col).mapInPandas(_decode, schema=CA_EVENT_SCHEMA)


def resolve_subscriptions(
    events: DataFrame, subscriptions: DataFrame
) -> DataFrame:
    """Join decoded events to their channel names through the
    subscription dim (sid, channel) — registry-sized, broadcast; events
    for unknown sids are dropped (a capture that starts mid-session sees
    orphan updates, the reference ignores them the same way)."""
    dim = subscriptions.select("sid", "channel")
    return events.join(F.broadcast(dim), "sid").select(
        "channel", "t", "v", "severity", "status"
    )


def encode_samples(samples: DataFrame, subscriptions: DataFrame) -> DataFrame:
    """samples + (sid, channel) dim -> (frame binary) — the capture
    builder used by the roundtrip query and tests (a real deployment
    reads frames off the wire; this is its inverse, same byte layout)."""
    dim = subscriptions.select("sid", "channel")
    tagged = samples.join(F.broadcast(dim), "channel").select(
        "sid", "t", "v", "severity", "status"
    )

    def _encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = [
                encode_monitor_event(
                    int(sid), int(t), float(v), int(sev), int(st)
                )
                for sid, t, v, sev, st in zip(
                    pdf["sid"], pdf["t"], pdf["v"],
                    pdf["severity"], pdf["status"],
                )
            ]
            yield pd.DataFrame({"frame": pd.Series(frames, dtype=object)})

    return tagged.mapInPandas(_encode, schema="frame binary")


# ---------------------------------------------------------------------------
# Waveform (array) monitor events — DBR_TIME_DOUBLE with count > 1
# ---------------------------------------------------------------------------

#: decoded array events (waveform PVs: one value vector per update)
CA_ARRAY_EVENT_SCHEMA = (
    "sid long, t long, varr array<double>, severity int, status int"
)

#: a standard header's 16-bit payload field saturates here; larger
#: payloads use the EXTENDED header (psize=0xFFFF, count=0, followed by
#: uint32 payload size + uint32 element count — 24 header bytes total)
_EXT_MARKER = 0xFFFF


def encode_monitor_event_array(
    sid: int,
    t_ns: int,
    values,
    severity: int = 0,
    status: int = 0,
    force_extended: bool = False,
) -> bytes:
    """CA_PROTO_EVENT_ADD carrying a DBR_TIME_DOUBLE waveform (``count``
    = len(values)): the monitor update an array PV pushes. Uses the
    standard 16-byte header while the payload fits its 16-bit size
    field, the extended header (spec: psize=0xFFFF, count=0, then uint32
    size + uint32 count) beyond — ``force_extended`` exercises that path
    at small sizes."""
    n = len(values)
    if n < 1:
        raise ValueError("CA element count must be >= 1")
    secs, nsec = divmod(t_ns, _NS)
    epics_secs = secs - EPICS_EPOCH_OFFSET_S
    if not (0 <= epics_secs < 2**32):
        raise ValueError(f"timestamp {t_ns} outside the CA epoch range")
    payload = struct.pack(
        f">hhII4x{n}d", status, severity, epics_secs, nsec, *values
    )
    if force_extended or len(payload) >= _EXT_MARKER or n >= _EXT_MARKER:
        header = struct.pack(
            ">HHHHIIII",
            CA_PROTO_EVENT_ADD,
            _EXT_MARKER,
            DBR_TIME_DOUBLE,
            0,
            1,
            sid,
            len(payload),
            n,
        )
    else:
        header = struct.pack(
            ">HHHHII",
            CA_PROTO_EVENT_ADD,
            len(payload),
            DBR_TIME_DOUBLE,
            n,
            1,
            sid,
        )
    return header + payload


def decode_monitor_event_arrays(
    frames: DataFrame, frame_col: str = "frame"
) -> DataFrame:
    """(.., frame binary) -> CA_ARRAY_EVENT_SCHEMA rows: the waveform
    sibling of :func:`decode_monitor_events` — accepts any element count
    >= 1 and BOTH header forms (standard and extended). Non-EVENT_ADD /
    non-DBR_TIME_DOUBLE frames are dropped; truncation raises."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sids, ts, vas, sevs, stats = [], [], [], [], []
            for raw in pdf[frame_col]:
                b = bytes(raw)
                if len(b) < 16:
                    raise ValueError("truncated CA header")
                cmd, psize, dtype, count, _p1, sid = struct.unpack(
                    ">HHHHII", b[:16]
                )
                off = 16
                if psize == _EXT_MARKER and count == 0:  # extended header
                    if len(b) < 24:
                        raise ValueError("truncated CA extended header")
                    psize, count = struct.unpack(">II", b[16:24])
                    off = 24
                if cmd != CA_PROTO_EVENT_ADD or dtype != DBR_TIME_DOUBLE:
                    continue
                if count < 1:
                    raise ValueError("CA element count must be >= 1")
                need = 16 + 8 * count
                if len(b) < off + psize or psize < need:
                    raise ValueError("truncated CA payload")
                status, severity, epics_secs, nsec = struct.unpack(
                    ">hhII", b[off:off + 12]
                )
                vals = struct.unpack(
                    f">{count}d", b[off + 16:off + 16 + 8 * count]
                )
                sids.append(sid)
                ts.append((epics_secs + EPICS_EPOCH_OFFSET_S) * _NS + nsec)
                vas.append(list(vals))
                sevs.append(severity)
                stats.append(status)
            yield pd.DataFrame(
                {
                    "sid": pd.Series(sids, dtype="int64"),
                    "t": pd.Series(ts, dtype="int64"),
                    "varr": pd.Series(vas, dtype=object),
                    "severity": pd.Series(sevs, dtype="int32"),
                    "status": pd.Series(stats, dtype="int32"),
                }
            )

    return frames.select(frame_col).mapInPandas(
        _decode, schema=CA_ARRAY_EVENT_SCHEMA
    )


def encode_vector_table(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    force_extended: bool = False,
) -> DataFrame:
    """(id, array<numeric>) -> (frame binary): each row becomes one
    waveform monitor event (sid = id, timestamp = EPICS epoch + id
    seconds — deterministic, collision-free) — the capture builder for
    the array roundtrip query and tests."""

    def _encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = [
                encode_monitor_event_array(
                    int(i),
                    (EPICS_EPOCH_OFFSET_S + int(i)) * _NS,
                    [float(x) for x in vec],
                    force_extended=force_extended,
                )
                for i, vec in zip(pdf[id_col], pdf[vec_col])
            ]
            yield pd.DataFrame({"frame": pd.Series(frames, dtype=object)})

    return vectors.select(id_col, vec_col).mapInPandas(
        _encode, schema="frame binary"
    )
