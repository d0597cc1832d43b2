"""End-to-end HTTP shim tests (SURVEY §3.1): request -> URL codec ->
registry resolution -> planner -> limit modes -> JSON V1 bytes, over a
real archive store and a real ephemeral-port HTTP server."""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest
from pyspark.sql import functions as F

from cassandra_pv_archiver_spark.management import ChannelConfig, ChannelRegistry
from cassandra_pv_archiver_spark.operators.decimate import NS, decimate
from cassandra_pv_archiver_spark.server import ArchiveApp, serve
from cassandra_pv_archiver_spark.sources.archive_store import ArchiveStore

HOUR = 3600 * NS


@pytest.fixture(scope="module")
def api(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("server")
    rows = [
        ("PV:A", (base + k) * NS, float(k), 0, 0)
        for base in (0, 7200)  # two hours of data with a gap hour between
        for k in range(0, 3600, 60)
    ] + [("PV:B", 500 * NS, 42.0, 2, 7)]
    raw = spark.createDataFrame(
        rows, "channel string, t long, v double, severity int, status int"
    )
    store = ArchiveStore(spark, str(tmp / "archive"))
    store.write_samples(raw, level=0)
    store.write_samples(decimate(raw, 3600), level=3600)

    reg = ChannelRegistry(spark, str(tmp / "channels"))
    for name in ("PV:A", "PV:B"):
        reg.add_channel(
            ChannelConfig(
                channel_name=name,
                channel_data_id=name.lower(),
                control_system_type="channel_access",
                enabled=True,
                decimation_levels={0: 0, 3600: 0},
            )
        )
    srv = serve(ArchiveApp(store, reg))
    port = srv.server_address[1]
    yield f"http://127.0.0.1:{port}"
    srv.shutdown()


def _get(base: str, path: str):
    with urllib.request.urlopen(base + path) as resp:
        return resp.status, json.loads(resp.read())


def _get_err(base: str, path: str) -> int:
    try:
        urllib.request.urlopen(base + path)
    except urllib.error.HTTPError as e:
        return e.code
    raise AssertionError("expected an HTTP error")


def test_archive_info(api):
    status, body = _get(api, "/archive-access/api/1.0/archive/")
    assert status == 200
    assert body == [
        {
            "key": 1,
            "name": "Archive",
            "description": "PySpark archive store",
            "channelCount": 2,
        }
    ]


def test_channel_listing_and_glob(api):
    _, body = _get(api, "/archive-access/api/1.0/archive/1/channels/")
    assert body == ["PV:A", "PV:B"]
    # ':' percent-encodes as %3A under the C5 codec
    _, body = _get(
        api, "/archive-access/api/1.0/archive/1/channels-by-pattern/PV%3A%2A"
    )
    assert body == ["PV:A", "PV:B"]
    _, body = _get(
        api, "/archive-access/api/1.0/archive/1/channels-by-pattern/PV%3AB"
    )
    assert body == ["PV:B"]


def test_raw_samples_with_limit_modes(api):
    # query window inside hour 1: AT_OR_BEFORE pulls the last sample of
    # hour 0 in as the leading boundary row, AT_OR_AFTER the first sample
    # at/after end
    start, end = 3660 * NS, 3780 * NS
    _, body = _get(
        api,
        "/archive-access/api/1.0/archive/1/channels/PV%3AA/samples"
        f"?start={start}&end={end}",
    )
    ts = [s["time"] for s in body]
    # nothing in (3540, 7200): boundary probe 3540, then forward probe 7200
    assert ts == [3540 * NS, 7200 * NS]
    assert all(s["type"] == "double" for s in body)
    assert body[0]["value"] == [3540.0]
    assert body[0]["quality"] == "Original"


def test_decimated_samples_with_count(api):
    # count makes the perfect period 1h -> the 3600 level serves the range
    start, end = 0, 2 * HOUR
    _, body = _get(
        api,
        "/archive-access/api/1.0/archive/1/channels/PV%3AA/samples"
        f"?start={start}&end={end}&count=2",
    )
    assert [s["type"] for s in body] == ["minMaxDouble", "minMaxDouble"]
    assert [s["time"] for s in body] == [0, HOUR]
    assert body[0]["quality"] == "Interpolated"
    # hour 0 holds 0,60,...,3540: time-weighted mean of a linear ramp
    assert body[0]["minimum"] == 0.0
    assert body[0]["maximum"] == 3540.0


def test_golden_sample_bytes(api):
    """Byte-level golden for one raw sample — the serializer fields and
    layout `JsonV1SampleSerializerTest` pins (time/severity/status/
    quality/type/value)."""
    _, body = _get(
        api,
        "/archive-access/api/1.0/archive/1/channels/PV%3AB/samples"
        f"?start={400 * NS}&end={600 * NS}",
    )
    assert body == [
        {
            "time": 500 * NS,
            "severity": {"level": "MAJOR", "hasValue": True},
            "status": "STATE",
            "quality": "Original",
            "type": "double",
            "value": [42.0],
        }
    ]


def test_errors(api):
    base = "/archive-access/api/1.0/archive/1/channels/PV%3AA/samples"
    assert _get_err(api, base) == 400  # missing start/end
    assert _get_err(api, base + "?start=10&end=5") == 400
    assert _get_err(api, base + "?start=0&end=5&count=0") == 400
    assert (
        _get_err(
            api,
            "/archive-access/api/1.0/archive/1/channels/NOPE/samples"
            "?start=0&end=5",
        )
        == 404
    )
    assert _get_err(api, "/archive-access/api/1.0/archive/9/") == 404
    assert _get_err(api, "/somewhere/else") == 404


def test_app_direct_no_http(spark, api):
    """ArchiveApp is framework-free: the same dispatch works without a
    socket (any WSGI/ASGI host could bind it)."""
    # api fixture built the store; reuse through a fresh app is covered
    # by the HTTP tests — here just check route errors raise ApiError
    from cassandra_pv_archiver_spark.server import ApiError

    with pytest.raises(ApiError):
        ArchiveApp(None, None).handle("/nope", {})
