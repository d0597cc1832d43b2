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


def test_mutators_roll_back_on_flush_failure(spark, tmp_path, monkeypatch):
    """Round-11 review: a disk failure during _flush must leave the
    in-memory serving state EXACTLY as before — admin_api's cascades
    compensate on the assumption registry calls are all-or-nothing."""
    reg = _reg(spark, tmp_path)
    reg.add_channel(ChannelConfig("PV:a", decimation_levels={0: 0}))

    def boom():
        raise OSError("disk full")

    monkeypatch.setattr(reg, "_flush", boom)
    with pytest.raises(OSError):
        reg.add_channel(ChannelConfig("PV:new"))
    assert reg.get_channel("PV:new") is None
    with pytest.raises(OSError):
        reg.remove_channel("PV:a")
    assert reg.get_channel("PV:a") is not None
    with pytest.raises(OSError):
        reg.rename_channel("PV:a", "PV:b")
    assert reg.get_channel("PV:a") is not None
    assert reg.get_channel("PV:b") is None
    with pytest.raises(OSError):
        reg.update_channel(ChannelConfig("PV:a", enabled=False))
    assert reg.get_channel("PV:a").enabled is True
    monkeypatch.undo()
    # registry still fully functional and persisted afterwards
    reg.rename_channel("PV:a", "PV:b")
    assert [c.channel_name for c in _reg(spark, tmp_path).list_channels()] \
        == ["PV:b"]


def test_snapshots_are_copies(spark, tmp_path):
    """Round-11 review: get/list hand out COPIES — a rename must not
    change a previously-taken snapshot's name in place, and mutating a
    returned config must not edit registry memory."""
    reg = _reg(spark, tmp_path)
    reg.add_channel(ChannelConfig("PV:a", decimation_levels={0: 0}))
    snap = reg.list_channels()[0]
    reg.rename_channel("PV:a", "PV:z")
    assert snap.channel_name == "PV:a"  # snapshot unaffected
    got = reg.get_channel("PV:z")
    got.decimation_levels[3600] = 0     # caller-side edit
    assert 3600 not in reg.get_channel("PV:z").decimation_levels


def test_to_df_is_lock_consistent_snapshot(spark, tmp_path):
    """Round-11 review: to_df builds from the in-memory state under the
    lock — never a lazy parquet read racing the atomic dir swap."""
    reg = _reg(spark, tmp_path)
    reg.add_channel(ChannelConfig("PV:a", decimation_levels={0: 0, 30: 1}))
    df = reg.to_df()
    # mutating AFTER to_df must not change the already-built snapshot
    reg.remove_channel("PV:a")
    rows = df.collect()
    assert [r.channel_name for r in rows] == ["PV:a"]
    assert dict(rows[0].decimation_levels) == {0: 0, 30: 1}
    assert reg.to_df().count() == 0


def test_import_xml_xsboolean_and_strict_levels():
    """Round-11 review: enabled='0'/'False' disable (xs:boolean); a
    decimation-level without a decimation-period or a duplicate period
    is REJECTED, not silently folded onto the raw level."""
    ns = "http://oss.aquenos.com/cassandra-pv-archiver/configuration/3.0"
    head = f'<server-configuration xmlns="{ns}">'
    assert import_xml(
        head + '<channel name="c1" enabled="0"/></server-configuration>'
    )[0].enabled is False
    assert import_xml(
        head + '<channel name="c2" enabled="False"/></server-configuration>'
    )[0].enabled is False
    assert import_xml(
        head + '<channel name="c3" enabled="true"/></server-configuration>'
    )[0].enabled is True
    with pytest.raises(ValueError, match="decimation-period"):
        import_xml(
            head + '<channel name="c4"><decimation-level '
            'retention-period="3600"/></channel></server-configuration>'
        )
    with pytest.raises(ValueError, match="duplicate"):
        import_xml(
            head + '<channel name="c5">'
            '<decimation-level decimation-period="30"/>'
            '<decimation-level decimation-period="30"/>'
            '</channel></server-configuration>'
        )
