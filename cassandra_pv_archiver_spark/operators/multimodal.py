"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a metadata struct.
The Spark-side plumbing — schema, Arrow batch shape, ``mapInPandas``
signature, partition sizing — is real and tested. The codec layer:

  * **PNG decode is REAL** (:func:`decode_png`): a pure-stdlib decoder
    (zlib inflate + scanline unfiltering, all 5 filter types, color
    types 0/2/3/4/6 at 8/16-bit depth, non-interlaced) — no external
    codec dependency needed.
  * Other containers (JPEG/AV) remain STUBBED: :func:`decode_stub`
    raises ``NotImplementedError`` unless ``fake=True``, in which case
    it emits deterministic pseudo-features derived from the bytes so the
    downstream pipeline is exercisable end-to-end.
  * :func:`decode` dispatches on the container magic: real PNGs decode
    for real, anything else follows the stub contract.

At scale: binary payloads dominate bytes, so the pattern is
(1) keep metadata in columnar form next to the blob, (2) ``mapInPandas``
with small ``maxRecordsPerBatch`` so an Arrow batch of blobs fits executor
memory, (3) push filters on metadata columns *before* the decode stage so
pruning happens on parquet statistics, never on decoded content.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BLOB_META_SCHEMA = (
    "doc_id long, n_bytes int, digest string, width int, height int, n_frames int"
)


def to_blob_table(docs: DataFrame) -> DataFrame:
    """documents -> (doc_id, blob binary, n_bytes, digest): the canonical
    multimodal layout (payload + columnar metadata)."""
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("blob"),
        F.octet_length("text").alias("n_bytes"),
        F.md5("text").alias("digest"),
    )


def decode_stub(blob: bytes, fake: bool = True) -> tuple[int, int, int]:
    """Decode an opaque media payload into (width, height, n_frames).

    STUB for containers without a bundled decoder (JPEG/AV — their codec
    libraries are not in this environment). With ``fake=True`` emits
    deterministic pseudo-dimensions from the byte length so the
    distributed plumbing can be tested; otherwise raises. PNG payloads
    decode for REAL via :func:`decode_png` / :func:`decode`.
    """
    if not fake:
        raise NotImplementedError(
            "no bundled decoder for this container; PNG decodes natively "
            "(decode_png), plug PIL/av/librosa here for other formats"
        )
    n = len(blob)
    return (n % 640 + 1, n % 480 + 1, n % 16 + 1)


PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

#: samples per pixel by PNG color type (3 = palette: 1 index -> 3 RGB)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def decode_png(
    blob: bytes, return_pixels: bool = False
) -> tuple[int, int, int, list[float] | bytes]:
    """REAL pure-stdlib PNG decode -> (width, height, n_channels,
    per-channel mean pixel value in [0, 1]) — or, with
    ``return_pixels=True``, the raw unfiltered sample bytes (palette
    resolved to RGB), for consumers that need actual pixels (dHash).

    Implements the PNG spec's critical-chunk path: chunk walk (IHDR,
    PLTE, IDAT+, IEND), zlib inflate, and per-scanline unfiltering
    (filters 0 None, 1 Sub, 2 Up, 3 Average, 4 Paeth) for color types
    0/2/3/4/6 at bit depth 8 or 16, non-interlaced. Palette images
    resolve through PLTE to RGB. Interlaced (Adam7) and sub-byte depths
    raise ``NotImplementedError`` — loudly, not wrong.
    """
    if blob[:8] != PNG_MAGIC:
        raise ValueError("not a PNG payload (bad magic)")
    pos, idat, plte = 8, [], None
    width = height = depth = ctype = interlace = None
    while pos + 8 <= len(blob):
        (length,), ctag = struct.unpack(">I", blob[pos:pos + 4]), blob[pos + 4:pos + 8]
        data = blob[pos + 8:pos + 8 + length]
        pos += 12 + length  # length + tag + data + crc
        if ctag == b"IHDR":
            width, height, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif ctag == b"PLTE":
            plte = data
        elif ctag == b"IDAT":
            idat.append(data)
        elif ctag == b"IEND":
            break
    if width is None:
        raise ValueError("PNG without IHDR")
    if interlace != 0:
        raise NotImplementedError("Adam7-interlaced PNG not supported")
    if depth not in (8, 16):
        raise NotImplementedError(f"bit depth {depth} not supported")
    if ctype not in _PNG_CHANNELS:
        raise ValueError(f"invalid PNG color type {ctype}")
    ch = _PNG_CHANNELS[ctype]
    bpp = ch * (depth // 8)  # filter unit: bytes per pixel
    stride = width * bpp
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG IDAT payload has the wrong size")

    out = bytearray(stride * height)
    prev = bytes(stride)
    for y in range(height):
        f = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)])
        if f == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + (a + prev[i]) // 2) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b, c = prev[i], (prev[i - bpp] if i >= bpp else 0)
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif f != 0:
            raise ValueError(f"invalid PNG filter type {f}")
        out[y * stride:(y + 1) * stride] = line
        prev = line

    if ctype == 3:  # palette -> RGB
        if plte is None:
            raise ValueError("palette PNG without PLTE")
        if return_pixels:
            rgb = bytearray()
            for idx in out:
                base = idx * 3
                rgb += plte[base:base + 3]
            return width, height, 3, bytes(rgb)
        sums, n = [0, 0, 0], width * height
        for idx in out:
            base = idx * 3
            sums[0] += plte[base]
            sums[1] += plte[base + 1]
            sums[2] += plte[base + 2]
        return width, height, 3, [s / n / 255.0 for s in sums]

    if return_pixels:
        return width, height, ch, bytes(out)

    n = width * height
    sums = [0] * ch
    if depth == 8:
        for i, b in enumerate(out):
            sums[i % ch] += b
        scale = 255.0
    else:  # 16-bit big-endian samples
        for i in range(0, len(out), 2):
            sums[(i // 2) % ch] += (out[i] << 8) | out[i + 1]
        scale = 65535.0
    return width, height, ch, [s / n / scale for s in sums]


def encode_png_gray(width: int, height: int, pixels: bytes) -> bytes:
    """REAL pure-stdlib PNG encoder for 8-bit grayscale (color type 0,
    filter 0 scanlines, one zlib IDAT) — the inverse of
    :func:`decode_png` used to pin the codec roundtrip bit-for-bit."""
    if len(pixels) != width * height:
        raise ValueError("pixel buffer does not match dimensions")

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(
        b"\x00" + pixels[y * width:(y + 1) * width] for y in range(height)
    )
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


#: dHash geometry: a GRID_W x GRID_H grayscale thumbnail gives
#: (GRID_W - 1) * GRID_H horizontal-gradient bits = 56, inside a signed
#: 64-bit long (a full 8x9 grid's bit 63 would wrap negative)
DHASH_GRID_W, DHASH_GRID_H = 9, 7
DHASH_BITS = (DHASH_GRID_W - 1) * DHASH_GRID_H


def dhash56(pixels: bytes, width: int = DHASH_GRID_W) -> int:
    """Difference hash over a grayscale thumbnail: bit b (row r = b//8,
    col c = b%8) is set when the right neighbour is brighter — the
    classic perceptual dHash, gradient-based so it survives uniform
    brightness shifts."""
    h = 0
    for b in range(DHASH_BITS):
        r, c = b // (width - 1), b % (width - 1)
        if pixels[r * width + c + 1] > pixels[r * width + c]:
            h |= 1 << b
    return h


def image_dhash_table(cells: DataFrame) -> DataFrame:
    """(doc_id, cells array<int>) -> (doc_id, dhash long) through the
    FULL image codec path: each row's cell grid is encoded as a real
    grayscale PNG, decoded back by :func:`decode_png`, and dHashed from
    the DECODED pixels. Any bit the encoder or decoder mangles flips
    dHash bits — which is exactly what the value oracle (computing the
    same hash from the cell values directly, no codec) then catches.

    One declared Arrow-batched Python crossing (PERF.md); thumbnails are
    tiny (63 bytes), so batches are bounded by row count, not payload.
    """

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for cs in pdf["cells"]:
                png = encode_png_gray(
                    DHASH_GRID_W, DHASH_GRID_H, bytes(int(v) for v in cs)
                )
                w, h, _ch, pix = decode_png(png, return_pixels=True)
                assert (w, h) == (DHASH_GRID_W, DHASH_GRID_H)
                out.append(dhash56(pix))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "dhash": pd.Series(out, dtype="int64"),
                }
            )

    return cells.mapInPandas(_hash, schema="doc_id long, dhash long")


def decode(blob: bytes, fake: bool = False) -> tuple[int, int, int]:
    """Container-dispatching decode -> (width, height, n_frames): PNG
    payloads take the real decoder (a still image is 1 frame), anything
    else follows :func:`decode_stub`'s contract."""
    if bytes(blob[:8]) == PNG_MAGIC:
        w, h, _ch, _means = decode_png(bytes(blob))
        return (w, h, 1)
    return decode_stub(blob, fake=fake)


def extract_features(
    blobs: DataFrame, batch_size: int | None = None
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow-batched; one output row per blob with decoded metadata. The UDF
    body is where a real image/audio feature extractor would run.

    ``batch_size`` sets ``spark.sql.execution.arrow.maxRecordsPerBatch``
    — a SESSION-WIDE conf that Spark reads lazily at ACTION time, so it
    governs every Arrow UDF executed afterwards, not just this pipeline
    (and a later builder call would override an earlier one). Default
    None leaves the session setting alone; pass a value only when you
    own the session and want blob batches bounded.
    """
    spark = blobs.sparkSession
    if batch_size is not None:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size)
        )

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode(b, fake=True) for b in pdf["blob"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["n_bytes"].astype("int32"),
                    "digest": pdf["digest"],
                    "width": pd.Series([f[0] for f in feats], dtype="int32"),
                    "height": pd.Series([f[1] for f in feats], dtype="int32"),
                    "n_frames": pd.Series([f[2] for f in feats], dtype="int32"),
                }
            )

    return blobs.mapInPandas(_extract, schema=BLOB_META_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_idx int, frame_fp string"


def sample_frames(
    blobs: DataFrame, stride: int = 4, batch_size: int | None = None
) -> DataFrame:
    """Frame sampling: every ``stride``-th frame of each payload, one
    output row per sampled frame — the 1→N ``mapInPandas`` fan-out that
    real video decode needs (output row count is data-dependent, which a
    pandas_udf cannot express). The decode is the same deterministic
    stub (frame count from byte length, per-frame fingerprint =
    md5(digest ':' idx)); a real decoder drops into the same loop.
    """
    import hashlib

    spark = blobs.sparkSession
    if batch_size is not None:  # see extract_features: session-wide conf
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size)
        )

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, fps = [], [], []
            for doc_id, blob, digest in zip(
                pdf["doc_id"], pdf["blob"], pdf["digest"]
            ):
                _, _, n_frames = decode(bytes(blob), fake=True)
                for i in range(0, n_frames, stride):
                    ids.append(doc_id)
                    idxs.append(i)
                    fps.append(
                        hashlib.md5(f"{digest}:{i}".encode()).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_fp": pd.Series(fps, dtype="object"),
                }
            )

    return blobs.mapInPandas(_frames, schema=FRAME_SCHEMA)
