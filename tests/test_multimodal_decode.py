"""Real PNG decode tests: a reference *encoder* (chunk writer + scanline
filterer) lives here in the test, and the production decoder must invert
it bit-exactly for every filter type, color type, and depth it claims."""

from __future__ import annotations

import struct
import zlib

import pytest

from cassandra_pv_archiver_spark.operators.multimodal import (
    PNG_MAGIC,
    decode,
    decode_png,
    decode_stub,
)


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)


def _filter_line(f: int, line: bytes, prev: bytes, bpp: int) -> bytes:
    out = bytearray(len(line))
    for i in range(len(line)):
        a = line[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if f == 0:
            out[i] = line[i]
        elif f == 1:
            out[i] = (line[i] - a) & 0xFF
        elif f == 2:
            out[i] = (line[i] - b) & 0xFF
        elif f == 3:
            out[i] = (line[i] - (a + b) // 2) & 0xFF
        elif f == 4:
            out[i] = (line[i] - _paeth(a, b, c)) & 0xFF
    return bytes(out)


def encode_png(
    pixels: list[list[tuple[int, ...]]],
    ctype: int,
    depth: int = 8,
    filters: list[int] | None = None,
    plte: bytes | None = None,
) -> bytes:
    """Minimal spec-conformant writer (test fixture only)."""
    height, width = len(pixels), len(pixels[0])
    ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    bpp = ch * (depth // 8)
    raw_lines = []
    for row in pixels:
        line = bytearray()
        for px in row:
            for s in px:
                line += (
                    bytes([s]) if depth == 8 else struct.pack(">H", s)
                )
        raw_lines.append(bytes(line))
    filters = filters or [0] * height
    prev = bytes(width * bpp)
    body = bytearray()
    for f, line in zip(filters, raw_lines):
        body += bytes([f]) + _filter_line(f, line, prev, bpp)
        prev = line
    ihdr = struct.pack(">IIBBBBB", width, height, depth, ctype, 0, 0, 0)
    out = PNG_MAGIC + _chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _chunk(b"PLTE", plte)
    out += _chunk(b"IDAT", zlib.compress(bytes(body)))
    return out + _chunk(b"IEND", b"")


def test_gray_all_filter_types():
    # 5 rows, one per filter type, over a deterministic gradient
    pixels = [[((x * 37 + y * 11) % 256,) for x in range(8)] for y in range(5)]
    blob = encode_png(pixels, ctype=0, filters=[0, 1, 2, 3, 4])
    w, h, ch, means = decode_png(blob)
    assert (w, h, ch) == (8, 5, 1)
    expected = sum(p[0] for row in pixels for p in row) / (40 * 255.0)
    assert means == [pytest.approx(expected)]


def test_rgb_and_rgba_means():
    rgb = [[(x * 10, y * 20, 128) for x in range(4)] for y in range(3)]
    blob = encode_png(rgb, ctype=2, filters=[4, 4, 4])
    w, h, ch, means = decode_png(blob)
    assert (w, h, ch) == (4, 3, 3)
    n = 12 * 255.0
    assert means == [
        pytest.approx(sum(p[i] for r in rgb for p in r) / n) for i in range(3)
    ]

    rgba = [[(200, 100, 50, 255) for _ in range(2)] for _ in range(2)]
    w, h, ch, means = decode_png(encode_png(rgba, ctype=6, filters=[1, 2]))
    assert (w, h, ch) == (2, 2, 4)
    assert means == [
        pytest.approx(v / 255.0) for v in (200, 100, 50, 255)
    ]


def test_palette_resolves_plte():
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # red green blue
    pixels = [[(0,), (1,)], [(2,), (1,)]]
    w, h, ch, means = decode_png(
        encode_png(pixels, ctype=3, plte=plte)
    )
    assert (w, h, ch) == (2, 2, 3)
    # 1 red, 2 green, 1 blue pixel
    assert means == [
        pytest.approx(1 / 4),
        pytest.approx(2 / 4),
        pytest.approx(1 / 4),
    ]


def test_16bit_gray():
    pixels = [[(0,), (65535,)], [(32768,), (16384,)]]
    w, h, ch, means = decode_png(encode_png(pixels, ctype=0, depth=16))
    assert (w, h, ch) == (2, 2, 1)
    assert means == [pytest.approx((0 + 65535 + 32768 + 16384) / 4 / 65535.0)]


def test_decode_dispatch_and_errors():
    png = encode_png([[(9,)]], ctype=0)
    assert decode(png) == (1, 1, 1)  # real decode, no fake needed
    with pytest.raises(NotImplementedError):
        decode(b"\xff\xd8\xff jpeg-ish", fake=False)
    assert decode(b"xyz", fake=True) == decode_stub(b"xyz", fake=True)
    with pytest.raises(ValueError):
        decode_png(b"not a png")
    # truncated IDAT must not pass silently
    bad = bytearray(png)
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)  # claims 2x2
    bad[8:8 + 12 + 13] = _chunk(b"IHDR", ihdr)
    with pytest.raises(ValueError):
        decode_png(bytes(bad))


def test_extract_features_real_png_through_spark(spark):
    """The mapInPandas plumbing picks up the real decoder: PNG blobs get
    true dimensions, non-PNG blobs keep the deterministic stub values."""
    from cassandra_pv_archiver_spark.operators.multimodal import extract_features

    png = encode_png([[(1,), (2,), (3,)], [(4,), (5,), (6,)]], ctype=0)
    rows = [(1, bytearray(png), len(png), "png"),
            (2, bytearray(b"plain text"), 10, "txt")]
    blobs = spark.createDataFrame(
        rows, "doc_id long, blob binary, n_bytes int, digest string"
    )
    out = {r.doc_id: r for r in extract_features(blobs).collect()}
    assert (out[1].width, out[1].height, out[1].n_frames) == (3, 2, 1)
    assert (out[2].width, out[2].height, out[2].n_frames) == (
        10 % 640 + 1, 10 % 480 + 1, 10 % 16 + 1
    )
