"""Streaming typed CA assembly: the live archiver's actual shape —
captured monitor frames (time AND controls, interleaved) arrive as a
stream; each time sample must carry the LATEST controls value seen on
its channel, including controls updates from EARLIER micro-batches.

Batch assembly (`functions/ca_wire_typed.assemble_typed_samples`) does
this with a per-sid LOCF window — unbounded-preceding windows do not
exist in Structured Streaming, so the streaming formulation keeps the
"lastControlsValue" (`ChannelAccessArchivingChannel.java:640`) as
per-sid GROUP STATE: `applyInPandasWithState` walks each sid's events
in capture order, controls rows update the state, time rows emit a
typed sample stamped with it. Parity with batch assembly is pinned in
tests/test_streaming.py (a controls frame in one micro-batch applies
to time frames in the NEXT — the state carry a per-batch join cannot
provide).

Ordering contract: within one sid, `seq` must be non-decreasing across
micro-batches — exactly what the spool capture guarantees (frames are
chunked to files in arrival order; one TCP connection totally orders
CA frames)."""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType

from ..functions.ca_wire_typed import (
    NUMERIC_FAMILIES,
    TYPED_EVENT_SCHEMA,
    _META_KEYS,
    decode_monitor_stream,
)

_NUMERIC_TYPES = tuple(
    f"{p}_{f}" for f in NUMERIC_FAMILIES for p in ("scalar", "array")
)
_ENUM_TYPES = ("scalar_enum", "array_enum")

#: assembled stream rows: TYPED_EVENT_SCHEMA + the attached metadata
ASSEMBLED_SCHEMA = (
    TYPED_EVENT_SCHEMA
    + ", meta struct<precision:int,units:string,"
    "lower_warning_limit:double,upper_warning_limit:double,"
    "lower_alarm_limit:double,upper_alarm_limit:double,"
    "lower_display_limit:double,upper_display_limit:double,"
    "lower_control_limit:double,upper_control_limit:double>,"
    " labels array<string>"
)

_STATE_SCHEMA = "ctrl_json string"


def _assemble_group(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (sid,) = key
    if state.exists:
        st = json.loads(state.get[0])
    else:
        st = {"meta": None, "labels": None}
    rows = pd.concat(list(pdfs), ignore_index=True)
    # capture order; a controls frame at the same seq precedes its
    # time frame (the encoder's seq = t - 1 convention makes ties
    # impossible, but the tiebreak keeps the walk total anyway)
    rows = rows.sort_values(
        ["seq", "kind"], ascending=[True, False]  # 'time' > 'ctrl'
    )
    out = []
    for r in rows.itertuples(index=False):
        if r.kind == "ctrl":
            if r.meta is not None:
                st["meta"] = dict(r.meta)
            if r.labels is not None:
                st["labels"] = list(r.labels)
            continue
        meta = labels = None
        if r.type in _NUMERIC_TYPES and st["meta"] is not None:
            meta = {k: st["meta"][k] for k in _META_KEYS}
        if r.type in _ENUM_TYPES and st["labels"] is not None:
            labels = list(st["labels"])
        out.append((
            int(r.seq), int(sid), int(r.t), r.type,
            None if pd.isna(r.v) else float(r.v),
            r.aval, None if pd.isna(r.eval) else int(r.eval),
            r.sval, r.asval,
            None if pd.isna(r.severity) else int(r.severity),
            None if pd.isna(r.status) else int(r.status),
            meta, labels,
        ))
    state.update((json.dumps(st),))
    cols = list(zip(*out)) if out else [[]] * 13
    yield pd.DataFrame({
        "seq": pd.Series(cols[0], dtype="int64"),
        "sid": pd.Series(cols[1], dtype="int64"),
        "t": pd.Series(cols[2], dtype="int64"),
        "type": pd.Series(cols[3], dtype=object),
        "v": pd.Series(cols[4], dtype="object"),
        "aval": pd.Series(cols[5], dtype=object),
        "eval": pd.Series(cols[6], dtype="object"),
        "sval": pd.Series(cols[7], dtype=object),
        "asval": pd.Series(cols[8], dtype=object),
        "severity": pd.Series(cols[9], dtype="object"),
        "status": pd.Series(cols[10], dtype="object"),
        "meta": pd.Series(cols[11], dtype=object),
        "labels": pd.Series(cols[12], dtype=object),
    })


def assemble_typed_stream(frames_stream: DataFrame) -> DataFrame:
    """Streaming (seq, frame binary) -> assembled typed samples with
    per-sid stateful latest-controls attachment. Input may be any
    streaming DataFrame of captured CA frames (the spool's readStream);
    output schema is ASSEMBLED_SCHEMA (sid-keyed — resolve channels via
    the broadcast bindings dim downstream, as the batch path does)."""
    from pyspark.sql.types import _parse_datatype_string

    ev = decode_monitor_stream(frames_stream)
    out_t = _parse_datatype_string(ASSEMBLED_SCHEMA)
    st_t = _parse_datatype_string(_STATE_SCHEMA)
    assert isinstance(out_t, StructType) and isinstance(st_t, StructType)
    return ev.groupBy("sid").applyInPandasWithState(
        _assemble_group,
        outputStructType=out_t,
        stateStructType=st_t,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
