"""Typed two-monitor CA client + UDP name resolution
(streaming/ca_client.py): native-type discovery, controls-before-time
ordering, metadata-change controls updates, SEARCH/NOT_FOUND/beacon
datagrams."""

from __future__ import annotations

import socket
import struct

import pytest
from pyspark.sql import functions as F

from cassandra_pv_archiver_spark.functions.ca_wire_typed import (
    assemble_typed_samples,
    decode_ctrl_events,
    decode_time_events_typed,
)
from cassandra_pv_archiver_spark.streaming.ca_client import (
    CANameServer,
    CAServerSim,
    CA_PROTO_RSRV_IS_UP,
    CTRL_SUBID_FLAG,
    ca_resolve,
    ca_subscribe,
    ca_subscribe_by_name,
    ca_subscribe_typed,
)

NS = 1_000_000_000
BASE = 1_600_000_000 * NS

META1 = {
    "precision": 2, "units": "mA",
    "lower_warning_limit": -1.0, "upper_warning_limit": 1.0,
    "lower_alarm_limit": -2.0, "upper_alarm_limit": 2.0,
    "lower_display_limit": -3.0, "upper_display_limit": 3.0,
    "lower_control_limit": -4.0, "upper_control_limit": 4.0,
}
META2 = dict(META1, precision=5, units="V")


def _typed_schedule():
    return {
        "DBL:wave": {
            "family": "double",
            "events": [
                (BASE, [1.0, 2.0, 3.0], 0, 0, META1, None),
                (BASE + NS, [4.0, 5.0, 6.0], 1, 6, META1, None),
                # metadata changes mid-stream -> controls update fires
                (BASE + 2 * NS, [7.0, 8.0, 9.0], 2, 12, META2, None),
            ],
        },
        "ENUM:state": {
            "family": "enum",
            "events": [
                (BASE, [1], 0, 0, None, ["OFF", "ON", "FAULT"]),
                (BASE + NS, [2], 3, 18, None, ["OFF", "ON", "FAULT"]),
            ],
        },
        "STR:names": {
            "family": "string",
            "events": [
                (BASE, ["alpha", "beta"], 0, 0, None, None),
            ],
        },
    }


def test_typed_subscribe_controls_then_time():
    sched = _typed_schedule()
    with CAServerSim({}, typed_schedule=sched) as srv:
        frames, bindings = ca_subscribe_typed(
            "127.0.0.1", srv.port, sorted(sched), n_time_expected=6
        )
    # one first-controls frame per channel + 1 metadata change + 6 time
    assert len(frames) == 3 + 1 + 6
    # the first frame per channel is its controls value (ordering pin)
    first_by_ch = {}
    for seq, ch, fr in sorted(frames):
        dtype = struct.unpack(">H", fr[4:6])[0]
        first_by_ch.setdefault(ch, dtype)
    assert all(28 <= d <= 34 for d in first_by_ch.values())
    # both monitors' subids map to the channel
    assert bindings[0 | CTRL_SUBID_FLAG] == bindings[0]


def test_typed_assembly_end_to_end(spark):
    sched = _typed_schedule()
    with CAServerSim({}, typed_schedule=sched) as srv:
        frames, bindings = ca_subscribe_typed(
            "127.0.0.1", srv.port, sorted(sched), n_time_expected=6
        )
    fdf = spark.createDataFrame(
        [(s, ch, bytearray(fr)) for s, ch, fr in frames],
        "seq long, channel string, frame binary",
    )
    dim = spark.createDataFrame(
        [(int(s), c) for s, c in bindings.items()], "subid long, channel string"
    )
    key = F.expr("CAST(conv(substring(md5(channel), 1, 8), 16, 10) AS BIGINT)")

    def rekey(df):
        return (
            df.withColumnRenamed("sid", "subid")
            .join(F.broadcast(dim), "subid")
            .withColumn("sid", key)
            .drop("subid")
        )

    out = assemble_typed_samples(
        rekey(decode_time_events_typed(fdf)),
        rekey(decode_ctrl_events(fdf)),
    ).join(F.broadcast(dim.select("channel").distinct().withColumn("sid", key)),
           "sid").orderBy("channel", "t").collect()
    dbl = [r for r in out if r["type"] == "array_double"]
    assert [r["meta"]["precision"] for r in dbl] == [2, 2, 5]
    assert dbl[2]["meta"]["units"] == "V"
    assert dbl[1]["aval"] == [4.0, 5.0, 6.0]
    enum = [r for r in out if r["type"] == "scalar_enum"]
    assert [r["eval"] for r in enum] == [1, 2]
    assert enum[0]["labels"] == ["OFF", "ON", "FAULT"]
    assert enum[0]["meta"] is None
    s = [r for r in out if r["type"] == "array_string"]
    assert s[0]["asval"] == ["alpha", "beta"]


class TestNameResolution:
    def test_resolve_and_subscribe_by_name(self):
        sched = {
            "PV:a": [(BASE, 1.5, 0, 0), (BASE + NS, 2.5, 1, 6)],
            "PV:b": [(BASE, -1.0, 2, 12)],
        }
        with CAServerSim(sched) as srv:
            with CANameServer({n: srv.port for n in sched}) as ns:
                # no host:port configured for any PV — UDP search only
                where = ca_resolve(sorted(sched), "127.0.0.1", ns.port)
                assert where == {
                    "PV:a": ("127.0.0.1", srv.port),
                    "PV:b": ("127.0.0.1", srv.port),
                }
                frames, bindings = ca_subscribe_by_name(
                    sorted(sched), "127.0.0.1", ns.port, n_expected=3
                )
        assert len(frames) == 3
        assert sorted(bindings.values()) == ["PV:a", "PV:b"]
        # equals the direct-TCP capture byte-for-byte
        with CAServerSim(sched) as srv2:
            direct, _ = ca_subscribe(
                "127.0.0.1", srv2.port, sorted(sched), 3
            )
        assert sorted(f for _, f in frames) == sorted(f for _, f in direct)

    def test_unknown_name_raises(self):
        with CAServerSim({"PV:a": [(BASE, 1.0, 0, 0)]}) as srv:
            with CANameServer({"PV:a": srv.port}) as ns:
                with pytest.raises(ValueError, match="does not resolve"):
                    ca_resolve(["PV:missing"], "127.0.0.1", ns.port)

    def test_beacon_datagram_layout(self):
        with CANameServer({}) as ns:
            lst = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
            lst.bind(("127.0.0.1", 0))
            lst.settimeout(5.0)
            ns.emit_beacon("127.0.0.1", lst.getsockname()[1], tcp_port=5064)
            data, _ = lst.recvfrom(1024)
            lst.close()
        cmd, psize, minor, port, beacon_id, addr = struct.unpack(
            ">HHHHII", data[:16]
        )
        assert cmd == CA_PROTO_RSRV_IS_UP
        assert psize == 0
        assert port == 5064
        assert beacon_id == 1

    def test_multi_server_resolution(self):
        """PVs hosted on two different servers resolve and subscribe
        independently — the name service is the only shared component."""
        s1 = {"PV:a": [(BASE, 1.0, 0, 0), (BASE + NS, 2.0, 0, 0)]}
        s2 = {"PV:b": [(BASE, -1.0, 0, 0)]}
        with CAServerSim(s1) as srv1, CAServerSim(s2) as srv2:
            reg = {"PV:a": srv1.port, "PV:b": srv2.port}
            with CANameServer(reg) as ns:
                frames, bindings = ca_subscribe_by_name(
                    ["PV:a", "PV:b"], "127.0.0.1", ns.port,
                    n_expected={"PV:a": 2, "PV:b": 1},
                )
                with pytest.raises(ValueError, match="per-channel dict"):
                    ca_subscribe_by_name(
                        ["PV:a", "PV:b"], "127.0.0.1", ns.port, 3
                    )
        assert sorted(ch for ch, _ in frames) == ["PV:a", "PV:a", "PV:b"]
        assert sorted(bindings.values()) == ["PV:a", "PV:b"]
