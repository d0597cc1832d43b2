"""WAV codec + integer-exact audio features (operators/audio.py).

The codec is additionally driver-attested end to end by the
`audio_features_wav` registry query (the DuckDB oracle recomputes the
features codec-free); these tests pin the decoder's container handling
— chunk walking, pad bytes, stereo interleave, 8-bit normalization,
loud rejection of compressed formats — plus the feature definitions on
hand-computed fixtures.
"""

from __future__ import annotations

import struct

import pytest

from cassandra_pv_archiver_spark.operators import audio


def test_pcm16_roundtrip_bit_exact():
    s = [0, 1, -1, 32767, -32768, 12345, -12345, 257]
    rate, ch, bits, dec = audio.decode_wav(audio.encode_wav(s, sample_rate=44100))
    assert (rate, ch, bits) == (44100, 1, 16)
    assert dec == s


def test_pcm8_lattice_roundtrip_exact():
    # every byte value roundtrips exactly through the 8-bit leg
    s = [b * 257 - 32768 for b in range(256)]
    rate, ch, bits, dec = audio.decode_wav(audio.encode_wav(s, bits=8))
    assert bits == 8
    assert dec == s


def test_pcm8_off_lattice_quantizes():
    # 100 is between lattice points: encode keeps only the high byte
    (_, _, _, dec) = audio.decode_wav(audio.encode_wav([100], bits=8))
    assert dec == [((100 + 32768) >> 8) * 257 - 32768]


def test_stereo_interleave_preserved():
    s = [10, -10, 20, -20, 30, -30]
    rate, ch, bits, dec = audio.decode_wav(audio.encode_wav(s, channels=2))
    assert ch == 2
    assert dec == s


def test_unknown_chunks_and_pad_bytes_skipped():
    wav = audio.encode_wav([5, -5, 7])
    body = wav[12:]
    # odd-size LIST chunk (consumes a pad byte) before fmt/data
    extra = struct.pack("<4sI", b"LIST", 5) + b"INFOx" + b"\x00"
    blob = (
        b"RIFF" + struct.pack("<I", 4 + len(extra) + len(body)) + b"WAVE"
        + extra + body
    )
    assert audio.decode_wav(blob)[3] == [5, -5, 7]


def test_data_before_fmt_rejected():
    wav = audio.encode_wav([1, 2])
    fmt_chunk = wav[12:36]  # fmt header+payload (16 bytes payload)
    data_chunk = wav[36:]
    blob = b"RIFF" + struct.pack("<I", 4 + len(data_chunk) + len(fmt_chunk)) + b"WAVE" + data_chunk + fmt_chunk
    with pytest.raises(ValueError, match="data chunk before fmt"):
        audio.decode_wav(blob)


def test_compressed_formats_raise_loudly():
    wav = bytearray(audio.encode_wav([0, 0]))
    struct.pack_into("<H", wav, 20, 3)  # format tag -> IEEE float
    with pytest.raises(NotImplementedError, match="IEEE float"):
        audio.decode_wav(bytes(wav))


def test_truncated_rejected():
    wav = audio.encode_wav([0] * 8)
    with pytest.raises(ValueError):
        audio.decode_wav(wav[:20])
    with pytest.raises(ValueError, match="not a RIFF"):
        audio.decode_wav(b"OggS" + wav[4:])


def test_features_hand_computed():
    s = [0, 600, -600, 0, 32767, -32768]
    f = audio.audio_features(s)
    assert f == {
        "n_samples": 6,
        "peak_abs": 32768,
        "sum_abs": 600 + 600 + 32767 + 32768,
        "energy": 600**2 * 2 + 32767**2 + 32768**2,
        # sign regions: + + - + + -  -> crossings at 1->2, 2->3, 4->5
        "zero_crossings": 3,
        "n_clipped": 2,
        "lead_silence": 1,  # s[0]=0 is silent, s[1]=600 breaks the run
    }


def test_features_all_silent():
    f = audio.audio_features([0, 100, -100])
    assert f["lead_silence"] == 3
    assert f["zero_crossings"] == 1
    assert f["n_clipped"] == 0


def test_feature_table_matches_local_reference(spark):
    import pandas as pd

    rows = [(1, [0, 1000, -1000, 32767]), (2, [257 * 10 - 32768] * 4)]
    df = spark.createDataFrame(rows, "doc_id long, samples array<int>")
    got = {
        r["doc_id"]: r.asDict()
        for r in audio.audio_feature_table(df, codec="mixed").collect()
    }
    for doc_id, s in rows:
        bits = 8 if doc_id % 2 == 0 else 16
        wav = audio.encode_wav(s, bits=bits)
        ref = audio.audio_features(audio.decode_wav(wav)[3])
        assert got[doc_id]["bits"] == bits
        for k, v in ref.items():
            assert got[doc_id][k] == v, (doc_id, k)


def test_spark_synthesis_matches_python(spark):
    """The catalog's Spark md5-synthesis expression and the oracle's /
    reference Python synthesis produce identical sample vectors."""
    import hashlib

    from pyspark.sql import functions as F

    from cassandra_pv_archiver_spark import catalog_data as cd

    texts = ["hello world", "", "àé ünïcode", "x" * 100]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: list(r["s"])
        for r in df.select(
            "doc_id", F.expr(cd._AUDIO_SAMPLES).alias("s")
        ).collect()
    }
    for i, t in enumerate(texts):
        exp = []
        for k in range(cd.AUDIO_BLOCKS):
            h = hashlib.md5((t + "#" + str(k)).encode()).digest()
            exp.extend(b * 257 - 32768 for b in h)
        assert got[i] == exp, f"doc {i}"


def test_fingerprint_gain_invariant():
    s = [100, -3000, 800, 40] * 32
    half = [v // 2 for v in s]
    assert audio.audio_fingerprint(s) == audio.audio_fingerprint(half)


def test_fingerprint_one_bin_change_bounded_hamming():
    # changing one bin's energy flips at most 2 bits (its own delta and
    # the previous bin's)
    import random

    rng = random.Random(7)
    s = [rng.randint(-20000, 20000) for _ in range(128)]
    h0 = audio.audio_fingerprint(s)
    s2 = list(s)
    for j in range(40, 44):  # bin 10
        s2[j] = 31000
    h1 = audio.audio_fingerprint(s2)
    assert bin(h0 ^ h1).count("1") <= 2


def test_fingerprint_requires_divisible_length():
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not divisible"):
        audio.audio_fingerprint([0] * 100)


def test_fingerprint_table_matches_local(spark):
    rows = [(1, [100, -3000, 800, 40] * 32), (2, [0] * 128)]
    df = spark.createDataFrame(rows, "doc_id long, samples array<int>")
    got = {
        r["doc_id"]: r["ahash"]
        for r in audio.audio_fingerprint_table(df).collect()
    }
    for doc_id, s in rows:
        dec = audio.decode_wav(audio.encode_wav(s))[3]
        assert got[doc_id] == audio.audio_fingerprint(dec)


class TestDownsamplePcm:
    def test_floor_means_including_negative(self):
        from cassandra_pv_archiver_spark.operators.audio import (
            downsample_pcm,
        )

        # -7 // 4 must floor to -2 (not truncate to -1) — the SQL
        # oracle reproduces floor via the positive-remainder identity
        assert downsample_pcm([-1, -2, -3, -1], 4) == [-2]
        assert downsample_pcm([10, 20, 30, 41, 0, 0, 0, 3], 4) == [25, 0]

    def test_identity_and_errors(self):
        import pytest as _pytest

        from cassandra_pv_archiver_spark.operators.audio import (
            downsample_pcm,
        )

        assert downsample_pcm([5, -5], 1) == [5, -5]
        with _pytest.raises(ValueError, match="not divisible"):
            downsample_pcm([1, 2, 3], 2)
