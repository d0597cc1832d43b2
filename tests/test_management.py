"""Management surface: channel CRUD, XML round-trip, URL codec."""

from __future__ import annotations

import pytest

from cassandra_pv_archiver_spark.management import (
    ChannelConfig,
    ChannelRegistry,
    export_xml,
    import_xml,
    url_decode,
    url_encode,
)


def _reg(spark, tmp_path) -> ChannelRegistry:
    return ChannelRegistry(spark, str(tmp_path / "channels"))


def test_crud_and_persistence(spark, tmp_path):
    reg = _reg(spark, tmp_path)
    reg.add_channel(ChannelConfig("PV:alpha", decimation_levels={0: 0, 30: 86400}))
    reg.add_channel(ChannelConfig("PV:beta", enabled=False))
    with pytest.raises(ValueError):
        reg.add_channel(ChannelConfig("PV:alpha"))

    # reload from disk
    reg2 = _reg(spark, tmp_path)
    names = [c.channel_name for c in reg2.list_channels()]
    assert names == ["PV:alpha", "PV:beta"]
    assert reg2.get_channel("PV:alpha").decimation_levels == {0: 0, 30: 86400}
    assert reg2.get_channel("PV:beta").enabled is False


def test_rename_keeps_data_id(spark, tmp_path):
    reg = _reg(spark, tmp_path)
    reg.add_channel(ChannelConfig("old"))
    did = reg.get_channel("old").channel_data_id
    reg.rename_channel("old", "new")
    assert reg.get_channel("old") is None
    assert reg.get_channel("new").channel_data_id == did


def test_update_preserves_data_id_and_remove(spark, tmp_path):
    reg = _reg(spark, tmp_path)
    reg.add_channel(ChannelConfig("c1", options={"a": "1"}))
    did = reg.get_channel("c1").channel_data_id
    reg.update_channel(ChannelConfig("c1", options={"a": "2"}))
    assert reg.get_channel("c1").options == {"a": "2"}
    assert reg.get_channel("c1").channel_data_id == did
    reg.remove_channel("c1")
    assert reg.list_channels() == []


def test_glob_search(spark, tmp_path):
    reg = _reg(spark, tmp_path)
    for n in ("PV:temp:1", "PV:temp:2", "PV:pressure:1"):
        reg.add_channel(ChannelConfig(n))
    got = [c.channel_name for c in reg.channels_by_glob("pv:temp:*")]
    assert got == ["PV:temp:1", "PV:temp:2"]
    assert [c.channel_name for c in reg.channels_by_glob("*:?")] == [
        "PV:pressure:1", "PV:temp:1", "PV:temp:2",
    ]


def test_xml_roundtrip(spark):
    channels = [
        ChannelConfig(
            "PV:x", enabled=False,
            decimation_levels={0: 0, 30: 2592000, 900: 0},
            options={"monitor": "true", "maxUpdatePeriod": "60"},
        ),
        ChannelConfig("PV:y"),
    ]
    xml = export_xml(channels)
    assert 'control-system-type="channel_access"' in xml
    assert 'decimation-period="900"' in xml
    back = import_xml(xml)
    assert [c.channel_name for c in back] == ["PV:x", "PV:y"]
    assert back[0].decimation_levels == {0: 0, 30: 2592000, 900: 0}
    assert back[0].options == {"monitor": "true", "maxUpdatePeriod": "60"}
    assert back[0].enabled is False and back[1].enabled is True


def test_url_codec_roundtrip():
    name = "PV:cooling/temp çà+% 漢"
    enc = url_encode(name)
    assert all(c.isalnum() or c in "-_%" for c in enc)
    assert url_decode(enc) == name
    assert url_encode("abc-DEF_123") == "abc-DEF_123"
    assert url_encode("a b") == "a%20b"


def test_url_decode_rejects_malformed_escapes():
    import pytest

    from cassandra_pv_archiver_spark.management import url_decode

    for bad in ["%A", "%", "%+41", "% 41", "%G1"]:
        with pytest.raises(ValueError):
            url_decode(bad)
    assert url_decode("%41") == "A"


def test_rename_channel_same_name_noop(spark, tmp_path):
    import pytest

    from cassandra_pv_archiver_spark.management import (
        ChannelConfig,
        ChannelRegistry,
    )

    reg = ChannelRegistry(spark, str(tmp_path / "reg"))
    reg.add_channel(ChannelConfig(channel_name="a"))
    reg.rename_channel("a", "a")  # no-op, not a collision error
    assert reg.get_channel("a") is not None
    with pytest.raises(KeyError):
        reg.rename_channel("missing", "missing")


def test_glob_brackets_are_literal():
    """Reference glob: only * and ? are special — brackets match
    themselves, never act as character classes."""
    import re

    from cassandra_pv_archiver_spark.functions.glob import glob_to_regex

    rx = re.compile(glob_to_regex("PV[1]"))
    assert rx.match("PV[1]")
    assert not rx.match("PV1")
    assert re.compile(glob_to_regex("P*[?]")).match("Pxx[y]")


def test_registry_flush_survives_crash_mid_swap(spark, tmp_path):
    """A writer killed between the live->bak and tmp->live renames must
    not lose the registry: recovery prefers the complete new content."""
    import os

    from cassandra_pv_archiver_spark.management import (
        ChannelConfig,
        ChannelRegistry,
    )

    path = str(tmp_path / "reg")
    reg = ChannelRegistry(spark, path)
    reg.add_channel(ChannelConfig(channel_name="a"))
    reg.add_channel(ChannelConfig(channel_name="b"))
    # simulate the crash window: live renamed away, tmp complete
    os.rename(path, path + ".bak")
    os.makedirs(path + ".tmp", exist_ok=True)
    for f in os.listdir(path + ".bak"):
        os.link(os.path.join(path + ".bak", f), os.path.join(path + ".tmp", f))
    reg2 = ChannelRegistry(spark, path)  # recovery runs in __init__
    assert {c.channel_name for c in reg2.list_channels()} == {"a", "b"}
