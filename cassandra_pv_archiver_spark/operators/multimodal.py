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


def decode_png(blob: bytes) -> tuple[int, int, int, list[float]]:
    """REAL pure-stdlib PNG decode -> (width, height, n_channels,
    per-channel mean pixel value in [0, 1]).

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
        sums, n = [0, 0, 0], width * height
        for idx in out:
            base = idx * 3
            sums[0] += plte[base]
            sums[1] += plte[base + 1]
            sums[2] += plte[base + 2]
        return width, height, 3, [s / n / 255.0 for s in sums]

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
