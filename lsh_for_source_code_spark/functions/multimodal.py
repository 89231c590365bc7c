"""Multimodal column plumbing for training-data pipelines.

Images/audio/video are opaque ``binary`` columns with typed metadata; the
Spark-side contract (schemas, Arrow batch shapes, mapInPandas partitioning)
is real and tested. Decoding is REAL for the pure-stdlib-decodable
formats -- PNG (functions/png.py), baseline JPEG (functions/jpeg.py),
WAV (functions/wav.py), Y4M (functions/y4m.py) -- and falls back to a
clearly-marked deterministic digest feature for codecs that genuinely
need libraries this container lacks (MP3/AAC, MP4/WebM, WebP/AVIF,
progressive JPEG); each fallback is isolated behind `_decode_*` so
swapping in a codec changes no Spark plumbing.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("mime", StringType(), True),
        StructField("payload", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)

#: exceptions a decoder may raise on CORRUPT (not merely unsupported) bytes:
#: truncated chunks, bad zlib streams, desynced markers, short struct reads,
#: out-of-range slices. Scraped corpora are guaranteed to contain such
#: payloads, so every one of these routes to the digest fallback instead of
#: failing the whole mapInPandas batch (ADVICE r4).
_DECODE_ERRORS = (
    NotImplementedError,
    ValueError,
    zlib.error,
    struct.error,
    IndexError,
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("payload_sha", StringType(), False),
        StructField("n_bytes", IntegerType(), False),
        StructField("feature", ArrayType(FloatType()), False),
    ]
)


def _decode_image(payload: bytes, width, height, resize_to=None) -> np.ndarray:
    """PNG and baseline JPEG payloads are REALLY decoded (pure-stdlib zlib
    + numpy filter reconstruction in functions/png.py; T.81 baseline
    Huffman + vectorized IDCT in functions/jpeg.py) and featurized as a
    4x4 block-mean luminance grid. Remaining formats (WebP/TIFF/AVIF,
    progressive JPEG) still need a codec library this container lacks, so
    they fall back to the clearly-marked deterministic digest feature --
    swapping in a real codec changes no Spark plumbing."""
    if payload is None:
        raise NotImplementedError("image decode requires a codec library")
    from lsh_for_source_code_spark.functions.jpeg import JPEG_MAGIC, decode_jpeg
    from lsh_for_source_code_spark.functions.png import (
        PNG_MAGIC,
        decode_png,
        pixel_feature,
    )

    px = None
    try:
        if payload.startswith(PNG_MAGIC):
            px = decode_png(payload)  # unsupported variant OR corrupt bytes:
        elif payload.startswith(JPEG_MAGIC):  # digest fallback below
            px = decode_jpeg(payload)
        if px is not None:
            if resize_to is not None:
                from lsh_for_source_code_spark.functions.png import resize_image

                px = resize_image(px, resize_to[0], resize_to[1])
            return pixel_feature(px, grid=4)
    except _DECODE_ERRORS:
        pass
    # FALLBACK STUB for non-PNG codecs: deterministic digest 'embedding'
    digest = hashlib.blake2b(payload, digest_size=64).digest()
    return (
        np.frombuffer(digest, dtype=np.uint8).astype(np.float32).reshape(-1)[:16]
        / 255.0
    )


def _decode_audio_frames(payload: bytes, duration_ms) -> np.ndarray:
    """WAV payloads are REALLY decoded (pure-stdlib RIFF/PCM + IEEE-float
    parsing, functions/wav.py) and featurized as per-frame RMS energy +
    zero-crossing rate over 8 windows. Compressed codecs (MP3/AAC/Opus)
    still need a library this container lacks, so they fall back to the
    clearly-marked deterministic digest feature -- swapping in a real codec
    changes no Spark plumbing."""
    if payload is None:
        raise NotImplementedError("audio decode requires a codec library")
    from lsh_for_source_code_spark.functions.wav import (
        audio_feature,
        decode_wav,
        is_wav,
    )

    if is_wav(payload):
        try:
            samples, _rate = decode_wav(payload)
            return audio_feature(samples, n_frames=8)
        except _DECODE_ERRORS:
            pass  # compressed-in-WAV codec OR corrupt bytes: digest below
    # FALLBACK STUB for compressed codecs: deterministic digest 'embedding'
    digest = hashlib.blake2b(payload, digest_size=32).digest()
    return np.frombuffer(digest, dtype=np.uint8).astype(np.float32) / 255.0


def _decode_video_frames(payload: bytes, duration_ms) -> np.ndarray:
    """Y4M (YUV4MPEG2) payloads are REALLY decoded (pure-stdlib header +
    raw-plane parsing, functions/y4m.py) and featurized as 4 evenly-spaced
    frame samples x 2x2 block-mean luminance (the PNG channel's feature
    shape per frame). Compressed containers (MP4/WebM) still need a codec
    library this container lacks, so they fall back to the deterministic
    digest feature -- swapping in a real codec changes no Spark plumbing."""
    if payload is None:
        raise NotImplementedError("video decode requires a codec library")
    from lsh_for_source_code_spark.functions.y4m import (
        decode_y4m,
        is_y4m,
        video_feature,
    )

    if is_y4m(payload):
        try:
            return video_feature(decode_y4m(payload), k=4, grid=2)
        except _DECODE_ERRORS:
            pass  # unsupported chroma layout OR corrupt bytes: digest below
    # FALLBACK STUB for compressed containers: deterministic digest
    digest = hashlib.blake2b(payload, digest_size=32).digest()
    return np.frombuffer(digest, dtype=np.uint8).astype(np.float32) / 255.0


def extract_media_features(
    media: DataFrame, batch_size: int = 256, resize_to: tuple | None = None
) -> DataFrame:
    """mapInPandas feature extraction: one Arrow batch in, one feature row
    per media row out. Partitioning contract: upstream should
    repartition(.., 'media_id') so payload bytes shuffle once at most.
    resize_to=(h, w) bilinear-resizes decoded images before featurization
    (the decode -> resize -> feature-extract pipeline shape); None skips."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, shas, nbytes = [], [], []
            for kind, payload, w, h, dur in zip(
                pdf["kind"], pdf["payload"], pdf.get("width"), pdf.get("height"),
                pdf.get("duration_ms"),
            ):
                raw = bytes(payload) if payload is not None else b""
                shas.append(hashlib.sha256(raw).hexdigest())
                nbytes.append(len(raw))
                if kind == "image":
                    feats.append(_decode_image(raw, w, h, resize_to))
                elif kind == "audio":
                    feats.append(_decode_audio_frames(raw, dur))
                elif kind == "video":
                    feats.append(_decode_video_frames(raw, dur))
                else:
                    feats.append(np.zeros(16, dtype=np.float32))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload_sha": shas,
                    "n_bytes": nbytes,
                    "feature": feats,
                }
            )

    return media.mapInPandas(extract, schema=FEATURE_SCHEMA)


def media_exact_dups(features: DataFrame) -> DataFrame:
    """Exact dedup on payload sha (same groupBy-min pattern as S2)."""
    return features.groupBy("payload_sha").agg(
        F.count("*").alias("n_copies"), F.min("media_id").alias("rep_id")
    )
