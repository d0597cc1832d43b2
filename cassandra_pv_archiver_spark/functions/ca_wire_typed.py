"""EPICS Channel Access wire codec — FULL DBR type coverage.

`functions/ca_wire.py` attests the DBR_TIME_DOUBLE layout (the round-5
seam); this module extends the wire surface to everything the reference
archives: all seven DBR families — string, short, float, enum, char,
long, double — scalar and array (`ChannelAccessSampleType.java:18-129`,
the 20-type union), plus the DBR_CTRL_* metadata path that populates
units / precision / limits / enum labels.

Reference design being reproduced (`ChannelAccessArchivingChannel.java:
580-700`): per channel the client runs TWO monitors — a *controls*
monitor (`nativeDataType.toControlsType()` -> DBR_CTRL_*) whose latest
value supplies display metadata, and a *time* monitor
(`controlsType.toTimeType()` -> DBR_TIME_*) whose events become samples;
the time listener is only registered once the first controls value
arrived, so every sample can be combined with the latest metadata
(`ChannelAccessSampleValueAccess.java:98-132,184`). Spark-first mirror:
decode both frame families from one capture, then
:func:`assemble_typed_samples` attaches metadata by LOCF (``last(...,
ignorenulls)`` over the per-sid arrival order) — the distributed
formulation of "lastControlsValue".

Wire layouts (public EPICS db_access.h / CA protocol spec; all fields
BIG-endian; CA payloads padded to 8-byte multiples):

  DBR_TIME_* payload: int16 status, int16 severity, uint32 secPastEpoch
  (1990 epoch, unsigned — `ChannelAccessSampleValueAccess.java:79,1082`),
  uint32 nsec, then a per-family RISC pad before value[count]:

    family  code  pad  element
    STRING    14    0  char[40] (NUL-padded, EPICS_STRING_SIZE=40,
                        `ChannelAccessSampleValueAccess.java:84`)
    SHORT     15    2  int16
    FLOAT     16    0  float32
    ENUM      17    2  uint16
    CHAR      18    3  int8 (the reference stores Java byte)
    LONG      19    0  int32
    DOUBLE    20    4  float64

  DBR_CTRL_* payload: int16 status, int16 severity, then per family:
    CTRL_STRING 28: char[40] value (no metadata — string channels carry
                    none, reference falls back to this type too)
    CTRL_SHORT  29: units char[8], 8 x int16 limits, int16 value
    CTRL_FLOAT  30: int16 precision, int16 pad, units char[8],
                    8 x float32 limits, float32 value
    CTRL_ENUM   31: int16 no_str, 16 x char[26] states, uint16 value
    CTRL_CHAR   32: units char[8], 8 x int8 limits, int8 pad, int8 value
    CTRL_LONG   33: units char[8], 8 x int32 limits, int32 value
    CTRL_DOUBLE 34: int16 precision, int16 pad, units char[8],
                    8 x float64 limits, float64 value
  Limit order on the wire (db_access.h): upper_display, lower_display,
  upper_alarm, upper_warning, lower_warning, lower_alarm, upper_control,
  lower_control — re-ordered into the engine's metadata struct
  (`operators/decimate_mixed.METADATA_SCHEMA`). Integer families carry
  no precision field; the engine records precision 0 for them, matching
  the JSON V1 renderer's integer-metadata convention
  (`ChannelAccessSampleValueAccess.java:318-514`).

Scale shape: identical to ca_wire.py — byte decode is ONE declared
Arrow-batched crossing (`mapInPandas`); everything downstream (LOCF
metadata join, sid resolution, decimation) is Catalyst. Frames carry a
``seq`` column (capture arrival order; within one TCP connection CA
frames are totally ordered) so the controls/time combination is
deterministic and distributed.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .ca_wire import CA_PROTO_EVENT_ADD, EPICS_EPOCH_OFFSET_S

_NS = 1_000_000_000
_EXT = 0xFFFF
EPICS_STRING_SIZE = 40
MAX_UNITS_SIZE = 8
MAX_ENUM_STATES = 16
MAX_ENUM_STRING_SIZE = 26

# DBR codes: TIME_* = base+14, CTRL_* = base+28 (db_access.h)
DBR_TIME = {"string": 14, "short": 15, "float": 16, "enum": 17,
            "char": 18, "long": 19, "double": 20}
DBR_CTRL = {"string": 28, "short": 29, "float": 30, "enum": 31,
            "char": 32, "long": 33, "double": 34}
_TIME_FAMILY = {v: k for k, v in DBR_TIME.items()}
_CTRL_FAMILY = {v: k for k, v in DBR_CTRL.items()}

#: per family: (value struct fmt, element size, RISC pad before value)
_TIME_VALUE = {
    "string": (None, EPICS_STRING_SIZE, 0),
    "short": ("h", 2, 2),
    "float": ("f", 4, 0),
    "enum": ("H", 2, 2),
    "char": ("b", 1, 3),
    "long": ("i", 4, 0),
    "double": ("d", 8, 4),
}

NUMERIC_FAMILIES = ("short", "float", "char", "long", "double")

#: engine union type tag -> (family, is_array)
TYPE_TO_FAMILY = {}
for _f in DBR_TIME:
    TYPE_TO_FAMILY[f"scalar_{_f}"] = (_f, False)
    TYPE_TO_FAMILY[f"array_{_f}"] = (_f, True)

#: assembled typed-sample schema (matches operators/decimate_mixed's
#: full-union input, minus the marker rows that never cross the wire)
TYPED_EVENT_SCHEMA = (
    "seq long, sid long, t long, type string, v double,"
    " aval array<double>, eval int, sval string, asval array<string>,"
    " severity int, status int"
)

CTRL_EVENT_SCHEMA = (
    "seq long, sid long, family string,"
    " meta struct<precision:int,units:string,"
    "lower_warning_limit:double,upper_warning_limit:double,"
    "lower_alarm_limit:double,upper_alarm_limit:double,"
    "lower_display_limit:double,upper_display_limit:double,"
    "lower_control_limit:double,upper_control_limit:double>,"
    " labels array<string>"
)


def _header(dtype: int, count: int, p1: int, p2: int, payload: bytes) -> bytes:
    """CA header; switches to the extended form when the 16-bit size or
    count fields would saturate (spec: psize=0xFFFF, count=0, then
    uint32 size + uint32 count)."""
    if len(payload) >= _EXT or count >= _EXT:
        return struct.pack(
            ">HHHHIIII", CA_PROTO_EVENT_ADD, _EXT, dtype, 0, p1, p2,
            len(payload), count,
        )
    return struct.pack(
        ">HHHHII", CA_PROTO_EVENT_ADD, len(payload), dtype, count, p1, p2
    )


def _pad8(b: bytes) -> bytes:
    return b + b"\x00" * (-len(b) % 8)


def _fixed_str(s: str, size: int) -> bytes:
    raw = s.encode("utf-8")[: size - 1]  # always NUL-terminated
    return raw + b"\x00" * (size - len(raw))


def encode_time_event(
    sid: int,
    t_ns: int,
    family: str,
    values,
    severity: int = 0,
    status: int = 0,
) -> bytes:
    """One CA_PROTO_EVENT_ADD frame carrying DBR_TIME_<family> with
    ``count = len(values)`` (numeric values as Python numbers, enum as
    ints, string as str)."""
    n = len(values)
    if n < 1:
        raise ValueError("CA element count must be >= 1")
    secs, nsec = divmod(t_ns, _NS)
    epics_secs = secs - EPICS_EPOCH_OFFSET_S
    if not (0 <= epics_secs < 2**32):
        raise ValueError(f"timestamp {t_ns} outside the CA epoch range")
    fmt, _esize, pad = _TIME_VALUE[family]
    head = struct.pack(">hhII", status, severity, epics_secs, nsec)
    head += b"\x00" * pad
    if family == "string":
        body = b"".join(_fixed_str(str(v), EPICS_STRING_SIZE) for v in values)
    elif family in ("short", "long", "char", "enum"):
        body = struct.pack(f">{n}{fmt}", *[int(v) for v in values])
    else:
        body = struct.pack(f">{n}{fmt}", *[float(v) for v in values])
    payload = _pad8(head + body)
    return _header(DBR_TIME[family], n, 1, sid, payload) + payload


#: engine metadata struct key order (METADATA_SCHEMA)
_META_KEYS = (
    "precision", "units",
    "lower_warning_limit", "upper_warning_limit",
    "lower_alarm_limit", "upper_alarm_limit",
    "lower_display_limit", "upper_display_limit",
    "lower_control_limit", "upper_control_limit",
)
#: wire limit order (db_access.h) as engine-struct key names
_WIRE_LIMITS = (
    "upper_display_limit", "lower_display_limit",
    "upper_alarm_limit", "upper_warning_limit",
    "lower_warning_limit", "lower_alarm_limit",
    "upper_control_limit", "lower_control_limit",
)
_CTRL_LIMIT_FMT = {"short": "h", "float": "f", "char": "b", "long": "i",
                   "double": "d"}


def encode_ctrl_event(
    sid: int,
    family: str,
    meta: dict | None = None,
    labels=None,
    value=0,
    severity: int = 0,
    status: int = 0,
) -> bytes:
    """One CA_PROTO_EVENT_ADD frame carrying DBR_CTRL_<family> — the
    controls-monitor update supplying display metadata (numeric
    families: ``meta`` dict with the engine struct's keys; enum:
    ``labels``; string: neither)."""
    head = struct.pack(">hh", status, severity)
    if family == "string":
        payload = head + _fixed_str(str(value), EPICS_STRING_SIZE)
    elif family == "enum":
        labels = list(labels or [])
        if len(labels) > MAX_ENUM_STATES:
            raise ValueError(f"enum supports <= {MAX_ENUM_STATES} states")
        strs = b"".join(
            _fixed_str(s, MAX_ENUM_STRING_SIZE) for s in labels
        ) + b"\x00" * (MAX_ENUM_STRING_SIZE * (MAX_ENUM_STATES - len(labels)))
        payload = head + struct.pack(">h", len(labels)) + strs
        payload += struct.pack(">H", int(value))
    else:
        meta = meta or {}
        lf = _CTRL_LIMIT_FMT[family]
        parts = [head]
        if family in ("float", "double"):
            parts.append(struct.pack(">hxx", int(meta.get("precision") or 0)))
        parts.append(_fixed_str(str(meta.get("units") or ""), MAX_UNITS_SIZE))
        # None-check, NOT ``or 0``: -0.0 is falsy but the IEEE wire
        # format carries its sign bit (ChannelAccessSampleValueAccess
        # .java:98-132 round-trips CTRL floats bit-exactly).
        lims = [m if (m := meta.get(k)) is not None else 0
                for k in _WIRE_LIMITS]
        if family in ("float", "double"):
            parts.append(struct.pack(f">8{lf}", *[float(x) for x in lims]))
            if family == "char":  # pragma: no cover - unreachable
                pass
        else:
            parts.append(struct.pack(f">8{lf}", *[int(x) for x in lims]))
        if family == "char":
            parts.append(b"\x00")  # RISC pad before the int8 value
            parts.append(struct.pack(">b", int(value)))
        elif family in ("float", "double"):
            parts.append(struct.pack(f">{lf}", float(value)))
        else:
            parts.append(struct.pack(f">{lf}", int(value)))
        payload = b"".join(parts)
    payload = _pad8(payload)
    return _header(DBR_CTRL[family], 1, 1, sid, payload) + payload


def _parse_header(b: bytes):
    if len(b) < 16:
        raise ValueError("truncated CA header")
    cmd, psize, dtype, count, p1, p2 = struct.unpack(">HHHHII", b[:16])
    off = 16
    if psize == _EXT and count == 0:
        if len(b) < 24:
            raise ValueError("truncated CA extended header")
        psize, count = struct.unpack(">II", b[16:24])
        off = 24
    if len(b) < off + psize:
        raise ValueError("truncated CA payload")
    return cmd, psize, dtype, count, p1, p2, off


def decode_time_events_typed(
    frames: DataFrame, frame_col: str = "frame", seq_col: str = "seq"
) -> DataFrame:
    """(seq, frame binary) -> TYPED_EVENT_SCHEMA rows: every DBR_TIME_*
    family, scalar and array, mapped onto the engine's tagged union —
    numeric scalars in ``v``, numeric/enum arrays in ``aval`` (enum
    indices as doubles, the union's array_enum convention), enum scalars
    in ``eval``, strings in ``sval``/``asval``. Non-EVENT_ADD and
    non-TIME frames (e.g. interleaved CTRL traffic) are skipped;
    truncation raises."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for seq, raw in zip(pdf[seq_col], pdf[frame_col]):
                b = bytes(raw)
                cmd, psize, dtype, count, _p1, sid, off = _parse_header(b)
                if cmd != CA_PROTO_EVENT_ADD or dtype not in _TIME_FAMILY:
                    continue
                if count < 1:
                    raise ValueError("CA element count must be >= 1")
                fam = _TIME_FAMILY[dtype]
                _fmt, esize, pad = _TIME_VALUE[fam]
                if psize < 12 + pad + esize * count:
                    raise ValueError("truncated DBR_TIME payload")
                (t, typ, v, aval, eval_, sval, asval, severity, status) = \
                    _parse_time_payload(b, off, dtype, count)
                rows.append((int(seq), sid, t, typ, v, aval, eval_, sval,
                             asval, severity, status))
            cols = list(zip(*rows)) if rows else [[]] * 11
            yield pd.DataFrame(
                {
                    "seq": pd.Series(cols[0], dtype="int64"),
                    "sid": pd.Series(cols[1], dtype="int64"),
                    "t": pd.Series(cols[2], dtype="int64"),
                    "type": pd.Series(cols[3], dtype=object),
                    "v": pd.Series(cols[4], dtype="float64"),
                    "aval": pd.Series(cols[5], dtype=object),
                    "eval": pd.Series(cols[6], dtype="object"),
                    "sval": pd.Series(cols[7], dtype=object),
                    "asval": pd.Series(cols[8], dtype=object),
                    "severity": pd.Series(cols[9], dtype="int32"),
                    "status": pd.Series(cols[10], dtype="int32"),
                }
            )

    return frames.select(seq_col, frame_col).mapInPandas(
        _decode, schema=TYPED_EVENT_SCHEMA
    )


def decode_ctrl_events(
    frames: DataFrame, frame_col: str = "frame", seq_col: str = "seq"
) -> DataFrame:
    """(seq, frame binary) -> CTRL_EVENT_SCHEMA rows: the controls
    -monitor decode. Numeric families yield the engine metadata struct
    (integer families: precision 0, the JSON V1 integer-metadata
    convention); enum yields the state labels; string yields neither
    (no metadata on string channels). Non-CTRL frames are skipped."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for seq, raw in zip(pdf[seq_col], pdf[frame_col]):
                b = bytes(raw)
                cmd, psize, dtype, count, _p1, sid, off = _parse_header(b)
                if cmd != CA_PROTO_EVENT_ADD or dtype not in _CTRL_FAMILY:
                    continue
                fam, meta, labels = _parse_ctrl_payload(b, off, dtype)
                rows.append((int(seq), sid, fam, meta, labels))
            cols = list(zip(*rows)) if rows else [[]] * 5
            yield pd.DataFrame(
                {
                    "seq": pd.Series(cols[0], dtype="int64"),
                    "sid": pd.Series(cols[1], dtype="int64"),
                    "family": pd.Series(cols[2], dtype=object),
                    "meta": pd.Series(cols[3], dtype=object),
                    "labels": pd.Series(cols[4], dtype=object),
                }
            )

    return frames.select(seq_col, frame_col).mapInPandas(
        _decode, schema=CTRL_EVENT_SCHEMA
    )


#: unified decode row for the streaming assembler: time and controls
#: events in ONE schema (kind = 'time' | 'ctrl'), so a single grouped
#: stateful stream can walk them in capture order
MONITOR_EVENT_SCHEMA = (
    "seq long, sid long, kind string, t long, type string, v double,"
    " aval array<double>, eval int, sval string, asval array<string>,"
    " severity int, status int, family string,"
    " meta struct<precision:int,units:string,"
    "lower_warning_limit:double,upper_warning_limit:double,"
    "lower_alarm_limit:double,upper_alarm_limit:double,"
    "lower_display_limit:double,upper_display_limit:double,"
    "lower_control_limit:double,upper_control_limit:double>,"
    " labels array<string>"
)


def _parse_time_payload(b: bytes, off: int, dtype: int, count: int):
    """-> (t, type, v, aval, eval, sval, asval, severity, status)."""
    fam = _TIME_FAMILY[dtype]
    fmt, esize, pad = _TIME_VALUE[fam]
    status, severity, epics_secs, nsec = struct.unpack(
        ">hhII", b[off:off + 12]
    )
    voff = off + 12 + pad
    t = (epics_secs + EPICS_EPOCH_OFFSET_S) * _NS + nsec
    v = aval = eval_ = sval = asval = None
    if fam == "string":
        cells = [
            b[voff + i * esize: voff + (i + 1) * esize]
            .split(b"\x00", 1)[0].decode("utf-8")
            for i in range(count)
        ]
        if count == 1:
            typ, sval = "scalar_string", cells[0]
        else:
            typ, asval = "array_string", cells
    else:
        vals = struct.unpack(f">{count}{fmt}", b[voff: voff + esize * count])
        if fam == "enum":
            if count == 1:
                typ, eval_ = "scalar_enum", int(vals[0])
            else:
                typ, aval = "array_enum", [float(x) for x in vals]
        elif count == 1:
            typ, v = f"scalar_{fam}", float(vals[0])
        else:
            typ, aval = f"array_{fam}", [float(x) for x in vals]
    return t, typ, v, aval, eval_, sval, asval, severity, status


def _parse_ctrl_payload(b: bytes, off: int, dtype: int):
    """-> (family, meta dict|None, labels list|None)."""
    fam = _CTRL_FAMILY[dtype]
    meta = labels = None
    p = off + 4
    if fam == "enum":
        (n_str,) = struct.unpack(">h", b[p:p + 2])
        p += 2
        labels = [
            b[p + i * MAX_ENUM_STRING_SIZE:
              p + (i + 1) * MAX_ENUM_STRING_SIZE]
            .split(b"\x00", 1)[0].decode("utf-8")
            for i in range(n_str)
        ]
    elif fam != "string":
        prec = 0
        if fam in ("float", "double"):
            (prec,) = struct.unpack(">h", b[p:p + 2])
            p += 4
        units = b[p:p + MAX_UNITS_SIZE].split(b"\x00", 1)[0].decode("utf-8")
        p += MAX_UNITS_SIZE
        lf = _CTRL_LIMIT_FMT[fam]
        lsize = struct.calcsize(f">{lf}")
        lims = struct.unpack(f">8{lf}", b[p:p + 8 * lsize])
        wire = dict(zip(_WIRE_LIMITS, (float(x) for x in lims)))
        meta = {"precision": prec, "units": units,
                **{k: wire[k] for k in _META_KEYS[2:]}}
    return fam, meta, labels


def decode_monitor_stream(
    frames: DataFrame, frame_col: str = "frame", seq_col: str = "seq"
) -> DataFrame:
    """(seq, frame binary) -> MONITOR_EVENT_SCHEMA rows: BOTH frame
    families decoded in one Arrow crossing into one schema, so a
    streaming source of captured frames feeds a single grouped stateful
    assembler (`streaming/ca_typed.py`). Works identically on batch and
    streaming DataFrames (mapInPandas runs under Structured Streaming)."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for seq, raw in zip(pdf[seq_col], pdf[frame_col]):
                b = bytes(raw)
                cmd, psize, dtype, count, _p1, sid, off = _parse_header(b)
                if cmd != CA_PROTO_EVENT_ADD:
                    continue
                if dtype in _TIME_FAMILY:
                    (t, typ, v, aval, eval_, sval, asval, sev, st) = \
                        _parse_time_payload(b, off, dtype, count)
                    rows.append((int(seq), sid, "time", t, typ, v, aval,
                                 eval_, sval, asval, sev, st, None, None,
                                 None))
                elif dtype in _CTRL_FAMILY:
                    fam, meta, labels = _parse_ctrl_payload(b, off, dtype)
                    rows.append((int(seq), sid, "ctrl", None, None, None,
                                 None, None, None, None, None, None, fam,
                                 meta, labels))
            cols = list(zip(*rows)) if rows else [[]] * 15
            yield pd.DataFrame(
                {
                    "seq": pd.Series(cols[0], dtype="int64"),
                    "sid": pd.Series(cols[1], dtype="int64"),
                    "kind": pd.Series(cols[2], dtype=object),
                    "t": pd.Series(cols[3], dtype="object"),
                    "type": pd.Series(cols[4], dtype=object),
                    "v": pd.Series(cols[5], dtype="object"),
                    "aval": pd.Series(cols[6], dtype=object),
                    "eval": pd.Series(cols[7], dtype="object"),
                    "sval": pd.Series(cols[8], dtype=object),
                    "asval": pd.Series(cols[9], dtype=object),
                    "severity": pd.Series(cols[10], dtype="object"),
                    "status": pd.Series(cols[11], dtype="object"),
                    "family": pd.Series(cols[12], dtype=object),
                    "meta": pd.Series(cols[13], dtype=object),
                    "labels": pd.Series(cols[14], dtype=object),
                }
            )

    return frames.select(seq_col, frame_col).mapInPandas(
        _decode, schema=MONITOR_EVENT_SCHEMA
    )


def assemble_typed_samples(
    time_events: DataFrame, ctrl_events: DataFrame
) -> DataFrame:
    """Combine the time-monitor and controls-monitor decodes into full
    typed samples: each time event carries the LATEST controls value
    seen on its sid (`ChannelAccessArchivingChannel.java`'s
    ``lastControlsValue``, distributed as ``last(..., ignorenulls)``
    over the per-sid capture order). Numeric-family samples receive the
    numeric metadata struct, enum-family samples the state labels —
    per-type metadata exactly as the reference's per-type UDTs store it
    (`ChannelAccessSampleValueAccess.java:98-207`)."""
    num_meta = ctrl_events.filter(
        F.col("family").isin(*NUMERIC_FAMILIES)
    ).select("sid", "seq", "meta", F.lit(None).cast("array<string>")
             .alias("labels"))
    enum_meta = ctrl_events.filter(F.col("family") == "enum").select(
        "sid", "seq",
        F.lit(None).cast(num_meta.schema["meta"].dataType.simpleString())
        .alias("meta"),
        "labels",
    )
    ctrl = num_meta.unionByName(enum_meta).withColumn("_is_time", F.lit(0))
    tev = time_events.withColumn("_is_time", F.lit(1))
    merged = tev.unionByName(
        ctrl.select(
            "seq", "sid",
            F.lit(None).cast("long").alias("t"),
            F.lit(None).cast("string").alias("type"),
            F.lit(None).cast("double").alias("v"),
            F.lit(None).cast("array<double>").alias("aval"),
            F.lit(None).cast("int").alias("eval"),
            F.lit(None).cast("string").alias("sval"),
            F.lit(None).cast("array<string>").alias("asval"),
            F.lit(None).cast("int").alias("severity"),
            F.lit(None).cast("int").alias("status"),
            "_is_time", "meta", "labels",
        ),
        allowMissingColumns=True,
    )
    # ctrl frames sort before a time frame at the same seq (a controls
    # update always precedes the sample it applies to — the reference
    # registers the time listener only after the first controls value)
    w = (
        Window.partitionBy("sid")
        .orderBy("seq", "_is_time")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    numeric_types = [f"{p}_{f}" for f in NUMERIC_FAMILIES
                     for p in ("scalar", "array")]
    out = (
        merged.withColumn("_meta", F.last("meta", ignorenulls=True).over(w))
        .withColumn("_labels", F.last("labels", ignorenulls=True).over(w))
        .filter(F.col("_is_time") == 1)
        .withColumn(
            "meta",
            F.when(F.col("type").isin(*numeric_types), F.col("_meta")),
        )
        .withColumn(
            "labels",
            F.when(
                F.col("type").isin("scalar_enum", "array_enum"),
                F.col("_labels"),
            ),
        )
    )
    return out.select(
        "seq", "sid", "t", "type", "v", "aval", "eval", "labels", "asval",
        "sval", "meta", "severity", "status",
    )


def encode_ctrl_table(ctrl: DataFrame) -> DataFrame:
    """(sid long, seq long, family string, meta struct|null, labels
    array<string>|null) -> (seq, frame binary): capture builder for
    controls-monitor frames alone — the connect-time metadata fetch
    (`ChannelAccessArchivingChannel.java:605` controls monitor)."""
    flat = ctrl.select(
        "sid", "seq", "family", "labels",
        *[F.col(f"meta.{k}").alias(f"cm_{k}") for k in _META_KEYS],
    )

    def _encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            seqs: list[int] = []
            frames: list[bytes] = []
            for row in pdf.itertuples(index=False):
                meta = None
                if pd.notna(row.cm_units):
                    meta = {k: getattr(row, f"cm_{k}") for k in _META_KEYS}
                labels = list(row.labels) if row.labels is not None else None
                seqs.append(int(row.seq))
                frames.append(encode_ctrl_event(
                    int(row.sid), row.family, meta=meta, labels=labels
                ))
            yield pd.DataFrame(
                {
                    "seq": pd.Series(seqs, dtype="int64"),
                    "frame": pd.Series(frames, dtype=object),
                }
            )

    return flat.mapInPandas(_encode, schema="seq long, frame binary")


def encode_typed_samples(
    samples: DataFrame, subscriptions: DataFrame
) -> DataFrame:
    """Typed-union samples + (sid, channel) dim -> (seq, frame binary):
    the capture builder. Every sample becomes its DBR_TIME_<family>
    frame at seq = t; a sample carrying ``meta`` is preceded by the
    controls-monitor frame (DBR_CTRL_<family>) at seq = t - 1, one
    carrying ``labels`` by DBR_CTRL_ENUM — the metadata-changes-fire
    -the-controls-monitor shape. Marker rows (disabled/disconnected)
    never cross the wire: the reference synthesizes them from its own
    connection state (`ChannelAccessArchivingChannel.java:642-685`);
    filter them before calling. seq = t is collision-free because the
    engine's samples are (channel, t)-unique and µs-grid (t - 1 can
    never be another sample's seq)."""
    dim = subscriptions.select("sid", "channel")
    cols = samples.columns
    tagged = samples.join(F.broadcast(dim), "channel")
    flat = tagged.select(
        "sid", "t", "type", "v", "aval", "eval", "labels", "asval", "sval",
        "severity", "status",
        *[
            F.col(f"meta.{k}").alias(f"cm_{k}")
            for k in _META_KEYS
        ] if "meta" in cols else [],
    )
    # spread the struct.pack kernel over the cores (guide §2, r12): the
    # samples fixture is one compact parquet split, so the whole encode
    # ran as a single Python task; rows are ~100 B while the per-row
    # kernel is not. Deterministic hash keys — (sid, t) is unique per
    # sample — and downstream consumes frames as a seq-keyed set, so
    # placement cannot change results. The checkpointed output keeps
    # the spread for both decode branches and the assembly.
    flat = flat.repartition(
        flat.sparkSession.sparkContext.defaultParallelism, "sid", "t"
    )

    def _encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            seqs: list[int] = []
            frames: list[bytes] = []
            for row in pdf.itertuples(index=False):
                typ = row.type
                if typ not in TYPE_TO_FAMILY:
                    raise ValueError(f"non-wire sample type {typ!r}")
                fam, is_array = TYPE_TO_FAMILY[typ]
                sid, t = int(row.sid), int(row.t)
                sev = int(row.severity) if pd.notna(row.severity) else 0
                st = int(row.status) if pd.notna(row.status) else 0
                if fam == "string":
                    values = (list(row.asval) if is_array
                              else [row.sval])
                elif fam == "enum":
                    values = ([int(x) for x in row.aval] if is_array
                              else [int(row.eval)])
                elif is_array:
                    values = [float(x) for x in row.aval]
                else:
                    values = [float(row.v)]
                if hasattr(row, "cm_units") and pd.notna(row.cm_units):
                    meta = {k: getattr(row, f"cm_{k}") for k in _META_KEYS}
                    seqs.append(t - 1)
                    frames.append(encode_ctrl_event(
                        sid, fam, meta=meta, value=values[0],
                        severity=sev, status=st,
                    ))
                if fam == "enum" and row.labels is not None:
                    seqs.append(t - 1)
                    frames.append(encode_ctrl_event(
                        sid, "enum", labels=list(row.labels),
                        value=values[0], severity=sev, status=st,
                    ))
                seqs.append(t)
                frames.append(
                    encode_time_event(sid, t, fam, values, sev, st)
                )
            yield pd.DataFrame(
                {
                    "seq": pd.Series(seqs, dtype="int64"),
                    "frame": pd.Series(frames, dtype=object),
                }
            )

    return flat.mapInPandas(_encode, schema="seq long, frame binary")
