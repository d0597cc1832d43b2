"""AVI/MJPEG container mux/demux + the video frame-sampling operator
(operators/multimodal.py, video leg). The full chain is additionally
driver-attested by the `video_frame_sample` registry query (codec-free
DuckDB oracle); these tests pin the container walker's edge cases."""

from __future__ import annotations

import struct

import pytest

from cassandra_pv_archiver_spark.operators import multimodal as mm


def _flat_frame(cells: list[int]) -> bytes:
    px = bytearray(mm.VIDEO_WH * mm.VIDEO_WH)
    for r in range(mm.VIDEO_GRID):
        for c in range(mm.VIDEO_GRID):
            v = cells[r * mm.VIDEO_GRID + c]
            for yy in range(8):
                base = (r * 8 + yy) * mm.VIDEO_WH + c * 8
                for xx in range(8):
                    px[base + xx] = v
    return mm.encode_jpeg_gray(mm.VIDEO_WH, mm.VIDEO_WH, bytes(px))


def test_mux_demux_payloads_bit_exact():
    jpegs = [_flat_frame([i * 16 + j for j in range(16)]) for i in range(4)]
    w, h, out = mm.decode_avi_frames(mm.encode_avi_mjpeg(jpegs, 32, 32))
    assert (w, h) == (32, 32)
    assert out == jpegs


def test_odd_size_frames_padded():
    # JPEG payloads of odd length force the even-pad path
    jpegs = [b"\xff\xd8" + bytes([i]) * 3 for i in range(3)]  # len 5, odd
    _, _, out = mm.decode_avi_frames(mm.encode_avi_mjpeg(jpegs, 8, 8))
    assert out == jpegs


def test_audio_chunks_and_rec_lists_skipped():
    jp = _flat_frame(list(range(16)))
    avi = bytearray(mm.encode_avi_mjpeg([jp], 32, 32))
    # graft an audio chunk ('01wb') and a rec-list-wrapped second frame
    extra = struct.pack("<4sI", b"01wb", 4) + b"beep"
    # append a second movi LIST holding an audio chunk + a rec-wrapped frame
    rec = struct.pack("<4sI", b"LIST", 4 + 8 + len(jp) + len(jp) % 2) + b"rec " + (
        struct.pack("<4sI", b"00dc", len(jp)) + jp + (b"\x00" if len(jp) % 2 else b"")
    )
    movi2 = struct.pack("<4sI", b"LIST", 4 + len(extra) + len(rec)) + b"movi" + extra + rec
    blob = bytes(avi) + movi2
    blob = b"RIFF" + struct.pack("<I", len(blob) - 8) + blob[8:]
    # declared count is now wrong (1 declared, 2 found) -> fix avih
    b2 = bytearray(blob)
    struct.pack_into("<I", b2, blob.find(b"avih") + 8 + 16, 2)
    _, _, out = mm.decode_avi_frames(bytes(b2))
    assert out == [jp, jp]


def test_frame_miscount_rejected():
    avi = bytearray(mm.encode_avi_mjpeg([_flat_frame([0] * 16)], 32, 32))
    struct.pack_into("<I", avi, avi.find(b"avih") + 8 + 16, 7)
    with pytest.raises(ValueError, match="declares 7"):
        mm.decode_avi_frames(bytes(avi))


def test_non_avi_rejected():
    with pytest.raises(ValueError, match="not a RIFF/AVI"):
        mm.decode_avi_frames(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(ValueError):
        mm.decode_avi_frames(b"\x89PNG")


def test_empty_clip_rejected():
    with pytest.raises(ValueError, match="at least one frame"):
        mm.encode_avi_mjpeg([], 32, 32)


def test_video_frame_table_samples_every_nth(spark):
    rows = [
        (1, [[j for j in range(16)], [15 - j for j in range(16)], [7] * 16]),
        (2, [[200] * 16]),
    ]
    df = spark.createDataFrame(rows, "doc_id long, frames array<array<int>>")
    got = {
        (r["doc_id"], r["frame_idx"]): r.asDict()
        for r in mm.video_frame_table(df, every_nth=2).collect()
    }
    assert set(got) == {(1, 0), (1, 2), (2, 0)}
    assert got[(1, 0)]["cell_sum"] == sum(range(16))
    assert got[(1, 2)]["cell_sum"] == 7 * 16
    assert got[(1, 2)]["n_frames"] == 3
    assert got[(2, 0)]["cell_min"] == got[(2, 0)]["cell_max"] == 200


def test_spark_video_synthesis_matches_python(spark):
    import hashlib

    from pyspark.sql import functions as F

    from cassandra_pv_archiver_spark import catalog_data as cd

    texts = ["hello", "", "vïdeo téxt"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: [list(fr) for fr in r["frames"]]
        for r in df.select(
            "doc_id", F.expr(cd._VIDEO_FRAMES).alias("frames")
        ).collect()
    }
    for i, t in enumerate(texts):
        n = hashlib.md5(t.encode()).digest()[0] % 4 + 2
        exp = [
            list(hashlib.md5((t + "@" + str(f)).encode()).digest())
            for f in range(n)
        ]
        assert got[i] == exp, f"doc {i}"
