"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a metadata struct.
The Spark-side plumbing — schema, Arrow batch shape, ``mapInPandas``
signature, partition sizing — is real and tested; the actual codec step is
STUBBED (the decode libraries are not in this container): ``decode_stub``
raises ``NotImplementedError`` unless ``fake=True``, in which case it emits
deterministic pseudo-features derived from the bytes so the downstream
pipeline is exercisable end-to-end.

At scale: binary payloads dominate bytes, so the pattern is
(1) keep metadata in columnar form next to the blob, (2) ``mapInPandas``
with small ``maxRecordsPerBatch`` so an Arrow batch of blobs fits executor
memory, (3) push filters on metadata columns *before* the decode stage so
pruning happens on parquet statistics, never on decoded content.
"""

from __future__ import annotations

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

    STUB: no codec libraries are available in this environment. With
    ``fake=True`` emits deterministic pseudo-dimensions from the byte
    length so the distributed plumbing can be tested; otherwise raises.
    """
    if not fake:
        raise NotImplementedError(
            "media codecs are not available in this environment; "
            "plug a real decoder (PIL/av/librosa) here"
        )
    n = len(blob)
    return (n % 640 + 1, n % 480 + 1, n % 16 + 1)


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
            feats = [decode_stub(b, fake=True) for b in pdf["blob"]]
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
                _, _, n_frames = decode_stub(bytes(blob), fake=True)
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
