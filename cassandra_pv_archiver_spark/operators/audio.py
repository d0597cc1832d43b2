"""Real WAV (RIFF/PCM) audio codec + integer-exact audio features.

The reference archiver has no audio surface; this module belongs to the
training-data-pipeline half of the repo (multimodal binary columns) and
extends the attested-codec pattern ``multimodal.py`` established for
PNG/JPEG to the container a real audio corpus actually carries:

  * **WAV encode/decode is REAL** (:func:`encode_wav` /
    :func:`decode_wav`): a pure-stdlib RIFF chunk walker — ``fmt `` /
    ``data`` chunks, unknown-chunk skipping (``LIST``/``fact``/...),
    odd-size pad bytes, PCM 8-bit-unsigned and 16-bit-signed-LE, mono
    and interleaved stereo. Compressed format tags (IEEE float, ALAW,
    ULAW, ADPCM, extensible) raise ``NotImplementedError`` loudly.
  * 8-bit samples are normalized to the 16-bit lattice ``b * 257 -
    32768`` on decode (the exact-roundtrip convention: encoding a
    lattice value stores its high byte and decodes back bit-identically,
    so the value oracle can attest the 8-bit path too).
  * Features are **integer-exact** (peak / sum-abs / energy / zero
    crossings / clip count / leading-silence run) so a DuckDB oracle
    reproduces them bit-for-bit with NO codec — any byte the encoder or
    decoder mangles changes a feature and fails the value-hash gate.

100 TB shape: same as the image path — blobs dominate bytes, so
metadata filters run before the single Arrow-batched Python crossing,
and the crossing itself is a pure row-local map (zero shuffles; the
`repartition(defaultParallelism)` below is the only exchange and exists
to spread a CPU-bound codec across cores when the input arrives as one
parquet split).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator, Sequence

import pandas as pd

from pyspark.sql import DataFrame

#: |sample| at or below this is "silence" for the leading-run feature
SILENCE_THRESHOLD = 512

#: PCM format tag (RIFF spec); everything else raises
_WAVE_FORMAT_PCM = 1
_KNOWN_COMPRESSED = {
    3: "IEEE float",
    6: "ALAW",
    7: "ULAW",
    17: "IMA ADPCM",
    65534: "WAVE_FORMAT_EXTENSIBLE",
}


def encode_wav(
    samples: Sequence[int],
    sample_rate: int = 8000,
    bits: int = 16,
    channels: int = 1,
) -> bytes:
    """Encode normalized 16-bit samples (interleaved if stereo) as a
    real RIFF/WAVE file.

    ``bits=16`` stores samples verbatim (signed LE). ``bits=8`` stores
    the unsigned high byte ``(s + 32768) >> 8`` — exact for samples on
    the ``b * 257 - 32768`` lattice, quantizing otherwise (documented
    convention, mirrored by :func:`decode_wav`).
    """
    if bits not in (8, 16):
        raise ValueError(f"bits must be 8 or 16, got {bits}")
    if channels not in (1, 2):
        raise ValueError(f"channels must be 1 or 2, got {channels}")
    if len(samples) % channels:
        raise ValueError("interleaved sample count not divisible by channels")
    if bits == 16:
        data = struct.pack(f"<{len(samples)}h", *samples)
    else:
        data = bytes((int(s) + 32768) >> 8 for s in samples)
    block_align = channels * (bits // 8)
    fmt = struct.pack(
        "<HHIIHH",
        _WAVE_FORMAT_PCM,
        channels,
        sample_rate,
        sample_rate * block_align,
        block_align,
        bits,
    )
    chunks = b"".join(
        struct.pack("<4sI", cid, len(payload)) + payload + (b"\x00" if len(payload) % 2 else b"")
        for cid, payload in ((b"fmt ", fmt), (b"data", data))
    )
    return struct.pack("<4sI4s", b"RIFF", 4 + len(chunks), b"WAVE") + chunks


def decode_wav(blob: bytes) -> tuple[int, int, int, list[int]]:
    """Parse a RIFF/WAVE blob -> (sample_rate, channels, bits, samples).

    Samples are normalized to the signed 16-bit range: 16-bit PCM is
    verbatim, 8-bit PCM maps ``b -> b * 257 - 32768`` (so an 8-bit
    encode of a lattice value roundtrips bit-identically). Walks the
    chunk list properly: unknown chunks are skipped, odd-size chunks
    consume their pad byte, ``fmt `` must precede ``data``.
    """
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    riff_size = struct.unpack_from("<I", blob, 4)[0]
    end = min(len(blob), 8 + riff_size)
    pos = 12
    fmt: tuple[int, int, int, int] | None = None  # (channels, rate, align, bits)
    while pos + 8 <= end:
        cid, size = struct.unpack_from("<4sI", blob, pos)
        pos += 8
        if pos + size > end:
            raise ValueError(f"truncated {cid!r} chunk")
        payload = blob[pos : pos + size]
        pos += size + (size % 2)  # odd chunks carry a pad byte
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too short")
            tag, channels, rate, _brate, align, bits = struct.unpack_from(
                "<HHIIHH", payload, 0
            )
            if tag != _WAVE_FORMAT_PCM:
                name = _KNOWN_COMPRESSED.get(tag, f"format tag {tag}")
                raise NotImplementedError(
                    f"non-PCM WAV ({name}); only integer PCM decodes here"
                )
            if bits not in (8, 16):
                raise NotImplementedError(f"{bits}-bit PCM not supported")
            if channels not in (1, 2):
                raise NotImplementedError(f"{channels}-channel WAV not supported")
            if align != channels * (bits // 8):
                raise ValueError("blockAlign inconsistent with channels/bits")
            fmt = (channels, rate, align, bits)
        elif cid == b"data":
            if fmt is None:
                raise ValueError("data chunk before fmt chunk")
            channels, rate, _align, bits = fmt
            if bits == 16:
                if size % 2:
                    raise ValueError("odd 16-bit PCM data size")
                samples = list(struct.unpack(f"<{size // 2}h", payload))
            else:
                samples = [b * 257 - 32768 for b in payload]
            if len(samples) % channels:
                raise ValueError("sample count not divisible by channels")
            return (rate, channels, bits, samples)
        # else: skip LIST / fact / cue / bext / ... chunks
    raise ValueError("no data chunk found")


def audio_features(samples: Sequence[int]) -> dict[str, int]:
    """Integer-exact features over a mono normalized-16-bit sample run.

    Every feature is closed over the integers (no float until a consumer
    divides), so a SQL oracle reproduces them bit-for-bit:

      * ``peak_abs`` / ``sum_abs`` / ``energy`` — amplitude moments
      * ``zero_crossings`` — count of sign-region changes, where a
        sample is "negative" iff ``s < 0`` (zero is non-negative)
      * ``n_clipped`` — samples pinned at either rail
      * ``lead_silence`` — length of the leading run with
        ``|s| <= SILENCE_THRESHOLD``
    """
    n = len(samples)
    peak = 0
    sum_abs = 0
    energy = 0
    crossings = 0
    clipped = 0
    lead = n
    prev_neg: bool | None = None
    for i, s in enumerate(samples):
        a = -s if s < 0 else s
        if a > peak:
            peak = a
        sum_abs += a
        energy += s * s
        neg = s < 0
        if prev_neg is not None and neg != prev_neg:
            crossings += 1
        prev_neg = neg
        if s >= 32767 or s <= -32768:
            clipped += 1
        if lead == n and a > SILENCE_THRESHOLD:
            lead = i
    return {
        "n_samples": n,
        "peak_abs": peak,
        "sum_abs": sum_abs,
        "energy": energy,
        "zero_crossings": crossings,
        "n_clipped": clipped,
        "lead_silence": lead,
    }


AUDIO_FEATURE_SCHEMA = (
    "doc_id long, bits int, n_samples long, peak_abs long, sum_abs long, "
    "energy long, zero_crossings long, n_clipped long, lead_silence long"
)


def audio_feature_table(
    sam: DataFrame, codec: str = "pcm16", sample_rate: int = 8000
) -> DataFrame:
    """(doc_id, samples array<int>) -> audio features through the FULL
    WAV codec path: each row's samples are encoded as a real RIFF/WAVE
    file, decoded back by the chunk-walking parser, and featurized from
    the DECODED samples — so the value oracle (same integer features
    straight from the sample values, no codec) attests the codec itself.

    ``codec="pcm16"``: every row rides 16-bit PCM.
    ``codec="mixed"``: even doc_ids ride the 8-bit leg instead — their
    samples must sit on the ``b * 257 - 32768`` lattice (true for the
    md5-derived synthesis in the catalog query), making the 8-bit
    quantize/normalize path exact and therefore oracle-attestable.

    One declared Arrow-batched Python crossing (PERF.md); payloads are
    tiny fixed-size WAVs, so batches are bounded by row count.
    """
    if codec not in ("pcm16", "mixed"):
        raise ValueError(f"unknown codec mode: {codec}")

    par = sam.sparkSession.sparkContext.defaultParallelism
    sam = sam.repartition(par)

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, xs in zip(pdf["doc_id"], pdf["samples"]):
                vals = [int(v) for v in xs]
                bits = 8 if (codec == "mixed" and int(doc_id) % 2 == 0) else 16
                wav = encode_wav(vals, sample_rate=sample_rate, bits=bits)
                rate, channels, got_bits, decoded = decode_wav(wav)
                assert (rate, channels, got_bits) == (sample_rate, 1, bits)
                f = audio_features(decoded)
                rows.append({"doc_id": int(doc_id), "bits": bits, **f})
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "bits",
                    "n_samples",
                    "peak_abs",
                    "sum_abs",
                    "energy",
                    "zero_crossings",
                    "n_clipped",
                    "lead_silence",
                ],
            )

    return sam.mapInPandas(_feat, schema=AUDIO_FEATURE_SCHEMA)


def downsample_pcm(samples: Sequence[int], factor: int) -> list[int]:
    """Integer-factor PCM downsample by box averaging: each output
    sample is ``floor(mean)`` of ``factor`` consecutive inputs — the
    anti-aliased rate reduction every audio ingest runs before
    featurizing, kept EXACT over the integers (floor division, negative
    sums floor toward -inf — the Python/SQL-reproducible convention) so
    oracles replicate it bit-for-bit. Non-divisible lengths raise."""
    if factor < 1:
        raise ValueError("factor must be >= 1")
    n = len(samples)
    if n % factor:
        raise ValueError(f"{n} samples not divisible by factor {factor}")
    return [
        sum(samples[i * factor:(i + 1) * factor]) // factor
        for i in range(n // factor)
    ]


def audio_downsample_table(
    sam: DataFrame, factor: int, sample_rate: int = 8000
) -> DataFrame:
    """(doc_id, samples array<int>) -> features of the DOWNSAMPLED
    clip through TWO full codec passes: encode 16-bit WAV, decode,
    box-downsample by ``factor`` (:func:`downsample_pcm`), re-encode at
    the reduced rate, decode again, featurize. The resample — the
    transform step between ingest and feature extraction — sits between
    two attested codec roundtrips, and the oracle recomputes the
    features from floor-mean groups of the synthesis formula with no
    codec and no resampler."""
    par = sam.sparkSession.sparkContext.defaultParallelism
    sam = sam.repartition(par)
    out_rate = sample_rate // factor

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, xs in zip(pdf["doc_id"], pdf["samples"]):
                vals = [int(v) for v in xs]
                _r, _c, _b, dec1 = decode_wav(
                    encode_wav(vals, sample_rate=sample_rate, bits=16)
                )
                down = downsample_pcm(dec1, factor)
                rate, channels, bits, dec2 = decode_wav(
                    encode_wav(down, sample_rate=out_rate, bits=16)
                )
                assert (rate, channels, bits) == (out_rate, 1, 16)
                f = audio_features(dec2)
                rows.append({"doc_id": int(doc_id), "bits": bits, **f})
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "bits", "n_samples", "peak_abs", "sum_abs",
                    "energy", "zero_crossings", "n_clipped", "lead_silence",
                ],
            )

    return sam.mapInPandas(_run, schema=AUDIO_FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# perceptual audio fingerprint (sign-of-delta envelope hash)
# ---------------------------------------------------------------------------

#: 32 envelope bins -> 32-bit hash (bit b: bin b louder than bin b+1,
#: wrapping) — the public sign-of-delta construction (Chromaprint-style,
#: over amplitude envelope instead of chroma so it stays integer-exact)
AHASH_BINS = 32
AHASH_BITS = 32
AHASH_HAM_MAX = 2  # 3 bands (11/11/10 bits): pigeonhole-complete

#: band k occupies bits [_BAND_SHIFT[k], _BAND_SHIFT[k+1])
_BAND_SHIFT = (0, 11, 22, AHASH_BITS)


def audio_fingerprint(samples: Sequence[int]) -> int:
    """32-bit envelope hash: split into 32 equal bins, bin energy =
    integer sum |s|; bit b set iff bin b is strictly louder than bin
    (b+1) mod 32. Invariant under uniform gain (scale-monotone) and
    integer-exact, so a SQL oracle reproduces it bit-for-bit."""
    n = len(samples)
    if n % AHASH_BINS:
        raise ValueError(f"sample count {n} not divisible by {AHASH_BINS}")
    w = n // AHASH_BINS
    e = [
        sum(abs(int(s)) for s in samples[b * w : (b + 1) * w])
        for b in range(AHASH_BINS)
    ]
    h = 0
    for b in range(AHASH_BINS):
        if e[b] > e[(b + 1) % AHASH_BINS]:
            h |= 1 << b
    return h


def audio_fingerprint_table(
    sam: DataFrame, sample_rate: int = 8000
) -> DataFrame:
    """(doc_id, samples array<int>) -> (doc_id, ahash long) through the
    FULL WAV codec roundtrip (16-bit leg): any byte the encoder or
    decoder mangles shifts a bin energy and flips hash bits — which the
    codec-free value oracle then catches, same contract as
    ``image_dhash_table``. One Arrow-batched crossing, no shuffle."""
    par = sam.sparkSession.sparkContext.defaultParallelism
    sam = sam.repartition(par)

    def _fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for xs in pdf["samples"]:
                vals = [int(v) for v in xs]
                wav = encode_wav(vals, sample_rate=sample_rate, bits=16)
                _rate, _ch, _bits, decoded = decode_wav(wav)
                out.append(audio_fingerprint(decoded))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "ahash": pd.Series(out, dtype="int64"),
                }
            )

    return sam.mapInPandas(_fp, schema="doc_id long, ahash long")


VAD_SCHEMA = (
    "doc_id long, bits int, n_frames long, n_active long, "
    "n_segments long, longest_run long, first_active long"
)


def vad_segments(
    sam: DataFrame,
    frame_samples: int = 16,
    threshold: int = 16384,
    codec: str = "mixed",
    sample_rate: int = 8000,
) -> DataFrame:
    """Energy-based voice-activity segmentation through the FULL WAV
    codec path — the speech-pipeline pre-filter (drop silent clips,
    count utterance segments) with the same attestation pattern as
    :func:`audio_feature_table`: encode → chunk-walking decode → frame
    the DECODED samples, so the value oracle (same integer rule straight
    from the synthesis formula, no codec) attests the codec roundtrip.

    A frame of ``frame_samples`` samples is ACTIVE iff its Σ|s| ≥
    ``threshold · frame_samples`` (integer comparison — no float RMS).
    Segments are maximal runs of active frames. Returns per clip:
    n_frames, n_active, n_segments, longest_run, first_active (frame
    index, −1 when the clip is fully inactive).

    100 TB shape: one Arrow-batched Python crossing, row-local — scales
    embarrassingly like the feature table; the segmentation itself is a
    bounded per-clip loop (clips are fixed-length)."""
    if codec not in ("pcm16", "mixed"):
        raise ValueError(f"unknown codec mode: {codec}")

    par = sam.sparkSession.sparkContext.defaultParallelism
    sam = sam.repartition(par)
    thr = threshold * frame_samples

    def _vad(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, xs in zip(pdf["doc_id"], pdf["samples"]):
                vals = [int(v) for v in xs]
                bits = 8 if (codec == "mixed" and int(doc_id) % 2 == 0) else 16
                wav = encode_wav(vals, sample_rate=sample_rate, bits=bits)
                rate, channels, got_bits, dec = decode_wav(wav)
                assert (rate, channels, got_bits) == (sample_rate, 1, bits)
                nf = len(dec) // frame_samples
                act = [
                    sum(
                        abs(s)
                        for s in dec[f * frame_samples:(f + 1) * frame_samples]
                    )
                    >= thr
                    for f in range(nf)
                ]
                n_seg = longest = run = 0
                first = -1
                for f, a in enumerate(act):
                    if a:
                        if first < 0:
                            first = f
                        if run == 0:
                            n_seg += 1
                        run += 1
                        longest = max(longest, run)
                    else:
                        run = 0
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "bits": bits,
                        "n_frames": nf,
                        "n_active": sum(act),
                        "n_segments": n_seg,
                        "longest_run": longest,
                        "first_active": first,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "bits", "n_frames", "n_active",
                    "n_segments", "longest_run", "first_active",
                ],
            )

    return sam.mapInPandas(_vad, schema=VAD_SCHEMA)
