"""Multimodal (image/audio/video) column plumbing (BASELINE.json
north-star).

Design: media payloads are opaque ``binary`` columns + a typed metadata
struct; decode / feature-extraction runs as Arrow-batched
``mapInPandas`` (one Python worker call per batch, not per row).
``decode_fn=None, strict=False`` uses a deterministic fake (byte
stats); ``strict=True`` runs the REAL built-in codecs
(``codecs.py``: dependency-free PPM/BMP decode + nearest-neighbor
resize in numpy) and raises ``UnsupportedMediaError`` for formats
that need external libraries (jpeg/png/video) — the pluggable-codec
seam a real deployment fills with libjpeg/ffmpeg.

Scale notes: payload columns dominate IO — keep them OUT of the scan
unless needed (column pruning does this automatically when metadata
and payload are separate columns), repartition by size before decode
so batches are even, and bound Arrow batch bytes via
``spark.sql.execution.arrow.maxRecordsPerBatch`` for large blobs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),        # image | audio | video
    StructField("mime", StringType()),
    StructField("n_bytes", LongType()),
    StructField("payload", BinaryType()),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),
    StructField("n_bytes", LongType()),
    StructField("digest", StringType()),
    StructField("feat_mean", LongType()),      # deterministic fake features
    StructField("feat_first", LongType()),
])


def _to_signed64(series: pd.Series) -> pd.Series:
    """Fold arbitrary Python-int 64-bit hash values into signed int64
    by two's-complement wraparound (``v - 2^64`` for ``v >= 2^63``).

    This must happen BEFORE any ``astype('int64')``: hash values with
    bit 63 set arrive as Python ints that overflow a direct
    object->int64 cast, and a batch holding even one None (quarantined
    corrupt payload) has been inferred float64, whose int64 cast
    saturates ``>= 2^63`` values to INT64_MIN and rounds away the low
    ~11 bits of every OTHER hash in the batch — garbled signatures
    that produce false hamming-0 matches (round-4 advisory). Mapping
    over the object values keeps every bit exact."""
    return series.map(
        lambda v: int(v) - (1 << 64) if int(v) >= (1 << 63) else int(v)
    ).astype("int64")


def signature_frame(
    df: DataFrame,
    id_col: str,
    hash_fn: Callable[[bytes], int | tuple[int, int]],
    bits: int = 64,
    on_error: str = "fail",
) -> DataFrame:
    """Perceptual signatures from payloads in ONE Arrow decode pass —
    the shared extractor behind ``media_near_dup`` and the streaming
    media ingest (round-5 review: both had grown parallel copies of
    the tuple-unpack/signed-fold/schema logic). Returns
    (id_col, phash) for ``bits=64`` or (id_col, phash_hi, phash_lo)
    for ``bits=128``; NULL/empty payloads are skipped (nothing to
    fingerprint). ``on_error="skip"`` quarantines payloads the codec
    rejects instead of failing the batch — the continuous-ingest
    policy; "fail" keeps the strict-codec contract."""
    if bits not in (64, 128):
        raise ValueError(f"bits must be 64 or 128, got {bits}")
    if on_error not in ("fail", "skip"):
        raise ValueError(f"on_error must be 'fail' or 'skip', got {on_error!r}")
    src = df.filter(
        F.col("payload").isNotNull() & (F.length("payload") > 0)
    ).select(F.col(id_col), "payload")

    def safe(b: bytes):
        try:
            return hash_fn(b)
        except Exception:
            return None

    fn = hash_fn if on_error == "fail" else safe
    sig_fields = (
        [StructField("phash", LongType())]
        if bits == 64
        else [
            StructField("phash_hi", LongType()),
            StructField("phash_lo", LongType()),
        ]
    )
    schema = StructType([StructField(id_col, LongType()), *sig_fields])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            hashes = pdf["payload"].map(fn)
            keep = hashes.notna()
            out = pd.DataFrame({id_col: pdf[id_col][keep]})
            kept = hashes[keep]
            if bits == 64:
                out["phash"] = _to_signed64(kept)
            else:
                out["phash_hi"] = _to_signed64(kept.map(lambda t: t[0]))
                out["phash_lo"] = _to_signed64(kept.map(lambda t: t[1]))
            yield out

    return src.mapInPandas(batches, schema=schema)


def attach_payload_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Typed metadata from the payload without Python: length + crc
    stay JVM-side, so metadata-only queries never deserialize blobs."""
    return df.withColumns({
        "n_bytes": F.length(F.col(payload_col)).cast("long"),
        "crc": F.crc32(F.col(payload_col)),
    })


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for a codec: byte-level stats."""
    if payload is None or len(payload) == 0:
        return {"digest": hashlib.md5(b"").hexdigest(), "feat_mean": 0, "feat_first": -1}
    return {
        "digest": hashlib.md5(payload).hexdigest(),
        "feat_mean": int(sum(payload) // len(payload)),
        "feat_first": int(payload[0]),
    }


def decode_media(
    df: DataFrame,
    decode_fn: Callable[[bytes], dict] | None = None,
    strict: bool = False,
) -> DataFrame:
    """Arrow-batched decode/feature-extract over binary payloads.

    ``decode_fn`` maps payload bytes -> feature dict; None selects the
    deterministic fake. ``strict=True`` is the real-codec path: the
    built-in dependency-free codecs (``codecs.py``: PPM/BMP decode via
    numpy) handle payloads they recognize and raise
    ``UnsupportedMediaError`` (a NotImplementedError) for formats that
    need external libraries (jpeg/png/video) — plug those into
    ``codecs.CODECS`` or pass ``decode_fn``."""
    if strict and decode_fn is None:
        from nsl_kdd_spark.multimodal.codecs import image_features

        decode_fn = image_features
    fn = decode_fn or _fake_decode

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = pdf["payload"].map(fn)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(lambda b: 0 if b is None else len(b)),
                "digest": feats.map(lambda d: d["digest"]),
                "feat_mean": feats.map(lambda d: d["feat_mean"]),
                "feat_first": feats.map(lambda d: d["feat_first"]),
            })

    return df.mapInPandas(batches, schema=FEATURE_SCHEMA)


def synthesize_media(spark, df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Build a MEDIA_SCHEMA table from a text table (testdata has no
    real blobs): payload = utf-8 bytes. Exercises the exact binary
    column path a real corpus would."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit("image").alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        F.length(F.col(text_col)).cast("long").alias("n_bytes"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
    )


RESIZED_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),
    StructField("mime", StringType()),
    StructField("width", LongType()),
    StructField("height", LongType()),
    StructField("payload", BinaryType()),
])

FRAME_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("frame_idx", LongType()),
    StructField("ts_ms", LongType()),
    StructField("payload", BinaryType()),
])


def resize_media(
    df: DataFrame,
    width: int,
    height: int,
    resize_fn: Callable[[bytes, int, int], bytes] | None = None,
    strict: bool = False,
) -> DataFrame:
    """Arrow-batched payload->payload resize. ``resize_fn`` is the real
    codec hook (bytes, w, h) -> bytes; ``strict=True`` raises where a
    real PIL/ffmpeg call would go. The deterministic fake
    truncates/cycles bytes to exactly w*h so output size is checkable.
    1:1 row mapping — payload column is REPLACED, metadata re-derived,
    so downstream column pruning still skips blobs it doesn't need.

    ``strict=True`` uses the built-in PPM/BMP codecs (decode ->
    nearest-neighbor resample -> re-encode same format); unsupported
    formats raise ``UnsupportedMediaError`` where a PIL/ffmpeg call
    would plug in."""
    if strict and resize_fn is None:
        from nsl_kdd_spark.multimodal.codecs import image_resize

        resize_fn = image_resize

    def fake(b: bytes, w: int, h: int) -> bytes:
        n = w * h
        if not b:
            return bytes(n)
        reps = (n + len(b) - 1) // len(b)
        return (b * reps)[:n]

    fn = resize_fn or fake

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pdf["payload"].map(lambda b: fn(b, width, height))
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "mime": pdf["mime"],
                "width": [width] * len(pdf),
                "height": [height] * len(pdf),
                "payload": out,
            })

    return df.mapInPandas(batches, schema=RESIZED_SCHEMA)


def sample_frames(
    df: DataFrame,
    every_n: int = 2,
    max_frames: int = 8,
    frame_bytes: int = 16,
    extract_fn: Callable[[bytes], list] | None = None,
    strict: bool = False,
) -> DataFrame:
    """Frame sampling: one input video row -> up to ``max_frames``
    frame rows (every ``every_n``-th frame) — the 1->N mapInPandas
    shape a real ffmpeg extractor uses (a batch may emit more rows
    than it received; Arrow handles the fan-out, no explode of
    pre-materialized arrays needed). ``extract_fn`` maps payload ->
    list of frame payloads; the deterministic fake chops the payload
    into ``frame_bytes`` chunks. ``ts_ms`` assumes 25 fps on the
    PRE-sampling frame index, as a real extractor would report."""
    if strict and extract_fn is None:
        raise NotImplementedError(
            "real frame extraction needs ffmpeg; pass extract_fn or "
            "use the deterministic fake (strict=False)"
        )

    def fake(b: bytes) -> list:
        if not b:
            return []
        return [
            b[i : i + frame_bytes] for i in range(0, len(b), frame_bytes)
        ]

    fn = extract_fn or fake

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, tss, payloads = [], [], [], []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                frames = fn(b)[::every_n][:max_frames]
                for k, fb in enumerate(frames):
                    src_idx = k * every_n
                    ids.append(mid)
                    idxs.append(k)
                    tss.append(src_idx * 40)  # 25 fps -> 40 ms/frame
                    payloads.append(fb)
            yield pd.DataFrame({
                "media_id": ids,
                "frame_idx": idxs,
                "ts_ms": tss,
                "payload": payloads,
            })

    return df.mapInPandas(batches, schema=FRAME_SCHEMA)


AUDIO_FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),
    StructField("n_bytes", LongType()),
    StructField("digest", StringType()),
    StructField("duration_ms", LongType()),
    StructField("framerate", LongType()),
    StructField("n_channels", LongType()),
    StructField("rms", LongType()),
    StructField("dom_freq_hz", LongType()),
])


def decode_audio(
    df: DataFrame,
    decode_fn: Callable[[bytes], dict] | None = None,
) -> DataFrame:
    """Arrow-batched audio decode/feature-extract: duration, rate,
    channels, integer RMS loudness, dominant frequency, sample
    digest. Default codec is
    the REAL dependency-free WAV decoder (``codecs.audio_features``,
    stdlib wave + numpy); compressed formats raise
    ``UnsupportedMediaError`` where an ffmpeg hook would plug in.
    Same executor cost model as ``decode_media``: one numpy decode per
    payload inside mapInPandas batches, no JVM round-trips."""
    if decode_fn is None:
        from nsl_kdd_spark.multimodal.codecs import audio_features

        decode_fn = audio_features

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = pdf["payload"].map(decode_fn)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(
                    lambda b: 0 if b is None else len(b)
                ),
                "digest": feats.map(lambda d: d["digest"]),
                "duration_ms": feats.map(lambda d: d["duration_ms"]),
                "framerate": feats.map(lambda d: d["framerate"]),
                "n_channels": feats.map(lambda d: d["n_channels"]),
                "rms": feats.map(lambda d: d["rms"]),
                "dom_freq_hz": feats.map(lambda d: d.get("dom_freq_hz", 0)),
            })

    return df.mapInPandas(batches, schema=AUDIO_FEATURE_SCHEMA)


def resample_audio(df: DataFrame, target_rate: int) -> DataFrame:
    """Arrow-batched audio resample to ``target_rate`` (payload ->
    payload, 1:1 rows, WAV re-encode via ``codecs.audio_resample``).
    The audio twin of ``resize_media``'s strict path."""
    from nsl_kdd_spark.multimodal.codecs import audio_resample

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "mime": pdf["mime"],
                "framerate": [target_rate] * len(pdf),
                "payload": pdf["payload"].map(
                    lambda b: audio_resample(b, target_rate)
                ),
            })

    schema = StructType([
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("mime", StringType()),
        StructField("framerate", LongType()),
        StructField("payload", BinaryType()),
    ])
    return df.mapInPandas(batches, schema=schema)


def media_near_dup(
    df: DataFrame,
    max_hamming: int = 3,
    bands: int = 4,
    id_col: str = "media_id",
    hash_fn: Callable[[bytes], int | tuple[int, int]] | None = None,
    kind: str | None = None,
    max_bucket_size: int | None = 10_000,
    bits: int = 64,
) -> DataFrame:
    """Perceptual media near-duplicate pairs: Arrow-batched
    fingerprints (``codecs.phash64`` / ``codecs.phash128`` for images
    by default; pass ``codecs.audio_hash64`` for audio), then the
    shared ``dedup.banded_hamming_pairs`` backend — banding, the
    pigeonhole guarantee (``max_hamming < bands``), and the
    hot-bucket cap (degenerate fingerprints, e.g. constant-color
    images all hashing identically, would otherwise turn one bucket's
    self-join quadratic) all live in the text tier's one
    implementation. Returns (id_a, id_b, hamming).

    ``bits`` sizes the signature to the CORPUS, not the recall:
    banding slices the signature into ``bands`` equal pieces, and
    expected bucket collisions grow ~ n^2 / 2^width per band — at
    bands=8 a 64-bit hash gives 8-bit buckets that crowd quadratically
    past a few thousand images (the round-4 bench recorded 7.1x cost
    for 4x images), while ``bits=128`` gives 16-bit buckets (256x
    fewer collisions) at the SAME pigeonhole radius. Use bits=128 for
    any corpus past ~1k images; a custom ``hash_fn`` must return an
    int for bits=64 and an ``(hi, lo)`` pair for bits=128.

    Rows with NULL/empty payloads are skipped (they have no content
    to fingerprint); pass ``kind`` to restrict a mixed-modality table
    to one fingerprint domain — a payload whose FORMAT the codec
    registry lacks still raises, the strict-codec policy.

    Scale shape (100 TB of media): ONE decode pass produces 8/16-byte
    signatures; everything after operates on longs — band equi-join,
    never an all-pairs comparison; re-encoded/format-converted copies
    collide because the hash is computed from DECODED content.
    """
    from nsl_kdd_spark.operators.dedup import banded_hamming_pairs

    if bits not in (64, 128):
        raise ValueError(f"bits must be 64 or 128, got {bits}")
    if hash_fn is None:
        from nsl_kdd_spark.multimodal.codecs import phash64, phash128

        hash_fn = phash64 if bits == 64 else phash128

    src = df
    if kind is not None:
        src = src.filter(F.col("kind") == kind)
    sigs = signature_frame(src, id_col, hash_fn, bits)
    sig_cols = ["phash"] if bits == 64 else ["phash_hi", "phash_lo"]
    return banded_hamming_pairs(
        sigs, id_col, sig_cols,
        bands=bands, max_hamming=max_hamming,
        max_bucket_size=max_bucket_size,
    )
