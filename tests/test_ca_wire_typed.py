"""Typed CA wire codec (functions/ca_wire_typed.py): every DBR_TIME_*
family's value offset pinned against the public db_access.h layouts,
DBR_CTRL_* metadata layouts field-by-field, and the Spark-side
decode + controls/time assembly end-to-end."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from cassandra_pv_archiver_spark.functions.ca_wire import (
    EPICS_EPOCH_OFFSET_S,
)
from cassandra_pv_archiver_spark.functions.ca_wire_typed import (
    DBR_CTRL,
    DBR_TIME,
    assemble_typed_samples,
    decode_ctrl_events,
    decode_time_events_typed,
    encode_ctrl_event,
    encode_time_event,
    encode_typed_samples,
)

NS = 1_000_000_000
T0 = (EPICS_EPOCH_OFFSET_S + 1000) * NS


class TestTimeLayouts:
    """Value offsets per db_access.h: 12-byte time header (status,
    severity, secs, nsec) then the per-family RISC pad."""

    def test_dbr_codes_match_spec(self):
        # DBR_TIME_* = base + 14, base: STRING 0 SHORT 1 FLOAT 2 ENUM 3
        # CHAR 4 LONG 5 DOUBLE 6 (db_access.h)
        assert DBR_TIME == {"string": 14, "short": 15, "float": 16,
                            "enum": 17, "char": 18, "long": 19,
                            "double": 20}
        assert DBR_CTRL == {"string": 28, "short": 29, "float": 30,
                            "enum": 31, "char": 32, "long": 33,
                            "double": 34}

    def test_short_pad2_value_at_30(self):
        f = encode_time_event(9, T0, "short", [-123], 1, 3)
        assert struct.unpack(">H", f[4:6])[0] == 15
        assert struct.unpack(">h", f[16:18])[0] == 3    # status
        assert struct.unpack(">h", f[18:20])[0] == 1    # severity
        assert struct.unpack(">I", f[20:24])[0] == 1000
        # dbr_time_short: 2-byte RISC pad after the stamp -> value @ 30
        assert struct.unpack(">h", f[30:32])[0] == -123
        assert len(f) == 16 + 16  # payload padded to 8-byte multiple

    def test_float_no_pad_value_at_28(self):
        f = encode_time_event(9, T0, "float", [1.5])
        assert struct.unpack(">f", f[28:32])[0] == 1.5

    def test_enum_pad2_value_at_30_unsigned(self):
        f = encode_time_event(9, T0, "enum", [40000])
        assert struct.unpack(">H", f[30:32])[0] == 40000

    def test_char_pad3_value_at_31_signed(self):
        f = encode_time_event(9, T0, "char", [-5])
        # dbr_time_char: RISC_pad0 (short) + RISC_pad1 (char) = 3 bytes
        assert struct.unpack(">b", f[31:32])[0] == -5

    def test_long_no_pad_value_at_28(self):
        f = encode_time_event(9, T0, "long", [-70000])
        assert struct.unpack(">i", f[28:32])[0] == -70000

    def test_double_pad4_value_at_32(self):
        f = encode_time_event(9, T0, "double", [-2.5])
        assert f[32:40] == bytes.fromhex("c004000000000000")

    def test_string_40_byte_cells_nul_padded(self):
        f = encode_time_event(9, T0, "string", ["AB", "CDE"])
        assert struct.unpack(">H", f[6:8])[0] == 2
        cell0 = f[28:68]
        assert cell0[:3] == b"AB\x00" and len(cell0) == 40
        assert f[68:72] == b"CDE\x00"

    def test_string_truncates_to_39_plus_nul(self):
        long = "x" * 60
        f = encode_time_event(9, T0, "string", [long])
        cell = f[28:68]
        assert cell == b"x" * 39 + b"\x00"

    def test_array_roundtrip_every_family(self, spark):
        cases = [
            ("short", [-1, 2, 32767]),
            ("float", [0.5, -1.25]),
            ("enum", [0, 3, 15]),
            ("char", [-128, 0, 127]),
            ("long", [-2**31, 2**31 - 1]),
            ("double", [1e-300, -1e300]),
        ]
        frames = [
            (i, bytearray(encode_time_event(i, T0 + i * 1000, fam, vals)))
            for i, (fam, vals) in enumerate(cases)
        ]
        out = decode_time_events_typed(
            spark.createDataFrame(frames, "seq long, frame binary")
        ).orderBy("seq").collect()
        for row, (fam, vals) in zip(out, cases):
            assert row["type"] == f"array_{fam}"
            assert row["aval"] == pytest.approx([float(v) for v in vals])

    def test_scalar_roundtrip_every_family(self, spark):
        frames = [
            (0, bytearray(encode_time_event(0, T0, "short", [-7], 2, 5))),
            (1, bytearray(encode_time_event(1, T0, "float", [2.5]))),
            (2, bytearray(encode_time_event(2, T0, "enum", [3]))),
            (3, bytearray(encode_time_event(3, T0, "char", [-9]))),
            (4, bytearray(encode_time_event(4, T0, "long", [123456]))),
            (5, bytearray(encode_time_event(5, T0, "double", [0.1]))),
            (6, bytearray(encode_time_event(6, T0, "string", ["hi"]))),
        ]
        rows = {
            r["type"]: r
            for r in decode_time_events_typed(
                spark.createDataFrame(frames, "seq long, frame binary")
            ).collect()
        }
        assert rows["scalar_short"]["v"] == -7.0
        assert rows["scalar_short"]["severity"] == 2
        assert rows["scalar_short"]["status"] == 5
        assert rows["scalar_float"]["v"] == 2.5
        assert rows["scalar_enum"]["eval"] == 3
        assert rows["scalar_enum"]["v"] is None
        assert rows["scalar_char"]["v"] == -9.0
        assert rows["scalar_long"]["v"] == 123456.0
        assert rows["scalar_double"]["v"] == 0.1
        assert rows["scalar_string"]["sval"] == "hi"


class TestCtrlLayouts:
    """DBR_CTRL_* payloads per db_access.h: status, severity, then
    (precision+pad for float/double) units[8], 8 limits in wire order
    (upper_disp, lower_disp, upper_alarm, upper_warn, lower_warn,
    lower_alarm, upper_ctrl, lower_ctrl), value. Enum: no_str +
    16 x char[26] states + value."""

    META = {
        "precision": 3, "units": "mA",
        "lower_warning_limit": -10.0, "upper_warning_limit": 10.0,
        "lower_alarm_limit": -20.0, "upper_alarm_limit": 20.0,
        "lower_display_limit": -30.0, "upper_display_limit": 30.0,
        "lower_control_limit": -40.0, "upper_control_limit": 40.0,
    }

    def test_ctrl_double_layout(self):
        f = encode_ctrl_event(7, "double", meta=self.META, value=1.5)
        assert struct.unpack(">H", f[4:6])[0] == 34
        assert struct.unpack(">h", f[20:22])[0] == 3  # precision @ 4
        assert f[24:32].rstrip(b"\x00") == b"mA"      # units @ 8
        lims = struct.unpack(">8d", f[32:96])
        assert lims == (30.0, -30.0, 20.0, 10.0, -10.0, -20.0, 40.0, -40.0)
        assert struct.unpack(">d", f[96:104])[0] == 1.5

    def test_ctrl_short_layout_no_precision(self):
        meta = dict(self.META, precision=0)
        f = encode_ctrl_event(7, "short", meta=meta, value=-3)
        assert struct.unpack(">H", f[4:6])[0] == 29
        assert f[20:28].rstrip(b"\x00") == b"mA"      # units @ 4
        lims = struct.unpack(">8h", f[28:44])
        assert lims == (30, -30, 20, 10, -10, -20, 40, -40)
        assert struct.unpack(">h", f[44:46])[0] == -3

    def test_ctrl_char_pad_before_value(self):
        meta = dict(self.META, precision=0)
        f = encode_ctrl_event(7, "char", meta=meta, value=-2)
        lims = struct.unpack(">8b", f[28:36])
        assert lims == (30, -30, 20, 10, -10, -20, 40, -40)
        assert f[36:37] == b"\x00"  # RISC pad (dbr_char_t)
        assert struct.unpack(">b", f[37:38])[0] == -2

    def test_ctrl_enum_states_26_bytes_each(self):
        f = encode_ctrl_event(7, "enum", labels=["OFF", "ON"], value=1)
        assert struct.unpack(">H", f[4:6])[0] == 31
        assert struct.unpack(">h", f[20:22])[0] == 2  # no_str
        assert f[22:48].split(b"\x00")[0] == b"OFF"
        assert f[48:74].split(b"\x00")[0] == b"ON"
        # value after all 16 state slots: 22 + 16*26 = 438
        assert struct.unpack(">H", f[438:440])[0] == 1

    def test_ctrl_decode_roundtrip(self, spark):
        frames = [
            (0, bytearray(encode_ctrl_event(1, "double", meta=self.META))),
            (1, bytearray(encode_ctrl_event(2, "long",
                                            meta=dict(self.META)))),
            (2, bytearray(encode_ctrl_event(3, "enum",
                                            labels=["A", "B", "C"]))),
            (3, bytearray(encode_ctrl_event(4, "string", value="s"))),
        ]
        rows = {
            r["family"]: r
            for r in decode_ctrl_events(
                spark.createDataFrame(frames, "seq long, frame binary")
            ).collect()
        }
        m = rows["double"]["meta"]
        assert m["precision"] == 3 and m["units"] == "mA"
        assert m["upper_display_limit"] == 30.0
        assert m["lower_control_limit"] == -40.0
        # integer family: precision forced to 0 (JSON V1 convention)
        assert rows["long"]["meta"]["precision"] == 0
        assert rows["long"]["meta"]["units"] == "mA"
        assert rows["enum"]["labels"] == ["A", "B", "C"]
        assert rows["enum"]["meta"] is None
        assert rows["string"]["meta"] is None
        assert rows["string"]["labels"] is None


class TestAssembly:
    def test_locf_metadata_and_labels(self, spark):
        """Time events pick up the LATEST preceding controls value on
        their sid; numeric samples get the struct, enum samples the
        labels; a metadata change mid-stream applies only onward."""
        m1 = dict(TestCtrlLayouts.META)
        m2 = dict(TestCtrlLayouts.META, precision=7, units="V")
        frames = [
            (10, encode_ctrl_event(1, "double", meta=m1)),
            (20, encode_time_event(1, T0 + 20, "double", [1.0])),
            (30, encode_ctrl_event(1, "double", meta=m2)),
            (40, encode_time_event(1, T0 + 40, "double", [2.0])),
            (15, encode_ctrl_event(2, "enum", labels=["X", "Y"])),
            (25, encode_time_event(2, T0 + 25, "enum", [1])),
        ]
        fdf = spark.createDataFrame(
            [(s, bytearray(f)) for s, f in frames], "seq long, frame binary"
        )
        out = assemble_typed_samples(
            decode_time_events_typed(fdf), decode_ctrl_events(fdf)
        ).orderBy("sid", "seq").collect()
        assert [r["type"] for r in out] == [
            "scalar_double", "scalar_double", "scalar_enum"
        ]
        assert out[0]["meta"]["precision"] == 3
        assert out[1]["meta"]["precision"] == 7
        assert out[1]["meta"]["units"] == "V"
        assert out[2]["meta"] is None
        assert out[2]["labels"] == ["X", "Y"]
        assert out[2]["eval"] == 1

    def test_encode_typed_samples_roundtrip(self, spark):
        """Full union row set -> frames -> decode -> assemble equals the
        source (the ca_typed_roundtrip_1h mechanism in miniature)."""
        meta_t = (
            "struct<precision:int,units:string,"
            "lower_warning_limit:double,upper_warning_limit:double,"
            "lower_alarm_limit:double,upper_alarm_limit:double,"
            "lower_display_limit:double,upper_display_limit:double,"
            "lower_control_limit:double,upper_control_limit:double>"
        )
        schema = (
            "channel string, t long, type string, v double,"
            f" aval array<double>, eval int, labels array<string>,"
            f" asval array<string>, sval string, meta {meta_t},"
            " severity int, status int"
        )
        m = (3, "mA", -10.0, 10.0, -20.0, 20.0, -30.0, 30.0, -40.0, 40.0)
        rows = [
            ("a", T0, "scalar_double", 1.5, None, None, None, None, None,
             m, 1, 6),
            ("a", T0 + 2000, "array_double", None, [1.0, 2.0], None, None,
             None, None, m, 2, 12),
            ("a", T0 + 4000, "scalar_enum", None, None, 2,
             ["OFF", "ON", "FAULT"], None, None, None, 0, 0),
            ("b", T0, "array_string", None, None, None, None,
             ["s1", "s2"], None, None, 3, 18),
            ("b", T0 + 2000, "array_enum", None, [1.0, 3.0], None,
             ["P", "Q", "R", "S"], None, None, None, 0, 0),
        ]
        src = spark.createDataFrame(rows, schema)
        subs = spark.createDataFrame(
            [(100, "a"), (200, "b")], "sid long, channel string"
        )
        frames = encode_typed_samples(src, subs)
        assembled = assemble_typed_samples(
            decode_time_events_typed(frames), decode_ctrl_events(frames)
        )
        back = (
            assembled.join(F.broadcast(subs), "sid")
            .select(*src.columns)
            .orderBy("channel", "t")
        )
        got = back.collect()
        want = src.orderBy("channel", "t").collect()
        assert got == want


def _dbits(x: float) -> int:
    return struct.unpack(">Q", struct.pack(">d", x))[0]


def _f32(x: float) -> float:
    """The value a float32 wire cell carries for input x."""
    return struct.unpack(">f", struct.pack(">f", x))[0]


_ADVERSARIAL_DOUBLES = [
    -0.0, 0.0, float("nan"), float("inf"), float("-inf"),
    5e-324, -5e-324,                      # smallest denormals
    2.2250738585072014e-308,              # min normal double
    -2.2250738585072014e-308,
    3.4028234663852886e38,                # FLT_MAX
    -3.4028234663852886e38,
    3.402823466385289e38,                 # just past FLT_MAX (double only)
    1.7976931348623157e308,               # DBL_MAX
    -1.7976931348623157e308,
]
_INT_RANGE = {"char": (-128, 127), "short": (-32768, 32767),
              "long": (-2**31, 2**31 - 1), "enum": (0, 2**16 - 1)}


class TestAdversarialFloats:
    """-0.0 / NaN / ±inf / denormal / ±FLT_MAX round-trips through every
    TIME and CTRL family. Float families must be BIT-exact (the IEEE
    wire carries the sign bit of -0.0 and the NaN payload class;
    `ChannelAccessSampleValueAccess.java:98-132`); integer families
    carry int8/int16/int32 cells, so fractional / signed-zero inputs
    truncate through `int()` — pinned here as the documented contract.
    Regression for the r07 `meta.get(k) or 0` bug that replaced a
    -0.0 warn_lo with +0 before CTRL encode."""

    def _time_roundtrip(self, family, values):
        from cassandra_pv_archiver_spark.functions.ca_wire_typed import (
            _parse_header, _parse_time_payload,
        )
        frame = encode_time_event(7, T0, family, values, severity=1)
        _cmd, _ps, dtype, count, _p1, _p2, off = _parse_header(frame)
        return _parse_time_payload(frame, off, dtype, count)

    def _ctrl_roundtrip(self, family, meta):
        from cassandra_pv_archiver_spark.functions.ca_wire_typed import (
            _parse_header, _parse_ctrl_payload,
        )
        frame = encode_ctrl_event(9, family, meta=meta, value=0)
        _cmd, _ps, dtype, _n, _p1, _p2, off = _parse_header(frame)
        return _parse_ctrl_payload(frame, off, dtype)

    @pytest.mark.parametrize("x", _ADVERSARIAL_DOUBLES)
    def test_time_double_bit_exact(self, x):
        _t, typ, v, *_ = self._time_roundtrip("double", [x])
        assert typ == "scalar_double"
        assert _dbits(v) == _dbits(x)

    @pytest.mark.parametrize(
        "x", [y for y in _ADVERSARIAL_DOUBLES if abs(y) <= 3.41e38
              or y != y or y in (float("inf"), float("-inf"))])
    def test_time_float_bit_exact_after_f32(self, x):
        _t, typ, v, *_ = self._time_roundtrip("float", [x])
        assert typ == "scalar_float"
        assert _dbits(v) == _dbits(_f32(x))

    def test_time_double_array_bit_exact(self):
        _t, typ, _v, aval, *_ = self._time_roundtrip(
            "double", _ADVERSARIAL_DOUBLES)
        assert typ == "array_double"
        assert [_dbits(v) for v in aval] == [
            _dbits(x) for x in _ADVERSARIAL_DOUBLES]

    @pytest.mark.parametrize("family", ["short", "char", "long", "enum"])
    def test_time_int_families_truncate_signed_zero(self, family):
        # -0.0 cannot ride an integer wire: int(-0.0) == 0, decode +0.0
        got = self._time_roundtrip(family, [-0.0])
        v_or_e = got[4] if family == "enum" else got[2]
        assert v_or_e == 0
        assert _dbits(float(v_or_e)) == _dbits(0.0)

    @pytest.mark.parametrize("family", ["short", "char", "long", "enum"])
    def test_time_int_families_exact_at_bounds(self, family):
        lo, hi = _INT_RANGE[family]
        got = self._time_roundtrip(family, [lo, hi] if family != "enum"
                                   else [lo, hi])
        aval = got[3]
        assert [int(v) for v in aval] == [lo, hi]

    @pytest.mark.parametrize("family", ["double", "float"])
    def test_ctrl_float_limits_bit_exact(self, family):
        keys = ("lower_warning_limit", "upper_warning_limit",
                "lower_alarm_limit", "upper_alarm_limit",
                "lower_display_limit", "upper_display_limit",
                "lower_control_limit", "upper_control_limit")
        vals = [-0.0, float("nan"), float("inf"), float("-inf"),
                5e-324, -5e-324, 3.4028234663852886e38, -0.0]
        meta = dict(zip(keys, vals), precision=3, units="V")
        fam, back, _ = self._ctrl_roundtrip(family, meta)
        assert fam == family
        for k, x in zip(keys, vals):
            want = x if family == "double" else _f32(x)
            assert _dbits(back[k]) == _dbits(want), (k, x, back[k])

    @pytest.mark.parametrize("family", ["char", "short", "long"])
    def test_ctrl_int_limits_truncate_signed_zero(self, family):
        keys = ("lower_warning_limit", "upper_warning_limit",
                "lower_alarm_limit", "upper_alarm_limit",
                "lower_display_limit", "upper_display_limit",
                "lower_control_limit", "upper_control_limit")
        lo, hi = _INT_RANGE[family]
        vals = [-0.0, 1.0, float(lo), float(hi), -0.0, 2.0, -0.0, 0.0]
        meta = dict(zip(keys, vals), precision=0, units="")
        fam, back, _ = self._ctrl_roundtrip(family, meta)
        assert fam == family
        for k, x in zip(keys, vals):
            assert _dbits(back[k]) == _dbits(float(int(x))), (k, x)

    def test_ctrl_missing_limits_default_plus_zero(self):
        # meta with NO limit keys: defaults are +0, never -0.0
        fam, back, _ = self._ctrl_roundtrip(
            "double", {"precision": 1, "units": "A"})
        for k, v in back.items():
            if k not in ("precision", "units"):
                assert _dbits(v) == _dbits(0.0)

    def test_hypothesis_double_time_roundtrip(self):
        from hypothesis import given, settings, strategies as st

        @settings(max_examples=200, deadline=None)
        @given(st.lists(st.floats(allow_nan=True, allow_infinity=True,
                                  allow_subnormal=True),
                        min_size=1, max_size=8))
        def check(xs):
            got = self._time_roundtrip("double", xs)
            vals = [got[2]] if len(xs) == 1 else got[3]
            assert [_dbits(v) for v in vals] == [_dbits(x) for x in xs]

        check()

    def test_hypothesis_float32_time_roundtrip(self):
        from hypothesis import given, settings, strategies as st

        @settings(max_examples=200, deadline=None)
        @given(st.lists(st.floats(width=32, allow_nan=True,
                                  allow_infinity=True,
                                  allow_subnormal=True),
                        min_size=1, max_size=8))
        def check(xs):
            got = self._time_roundtrip("float", xs)
            vals = [got[2]] if len(xs) == 1 else got[3]
            assert [_dbits(v) for v in vals] == [_dbits(_f32(x))
                                                 for x in xs]

        check()

    def test_hypothesis_ctrl_double_limits(self):
        from hypothesis import given, settings, strategies as st
        keys = ("lower_warning_limit", "upper_warning_limit",
                "lower_alarm_limit", "upper_alarm_limit",
                "lower_display_limit", "upper_display_limit",
                "lower_control_limit", "upper_control_limit")

        @settings(max_examples=200, deadline=None)
        @given(st.lists(st.floats(allow_nan=True, allow_infinity=True,
                                  allow_subnormal=True),
                        min_size=8, max_size=8))
        def check(vals):
            meta = dict(zip(keys, vals), precision=0, units="x")
            _fam, back, _ = self._ctrl_roundtrip("double", meta)
            for k, x in zip(keys, vals):
                assert _dbits(back[k]) == _dbits(x)

        check()
