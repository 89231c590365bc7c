"""Tests for incremental (snapshot-diff) updates and multimodal plumbing."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from lsh_for_source_code_spark.config import PipelineConfig
from lsh_for_source_code_spark.functions.minhash import sign_files
from lsh_for_source_code_spark.functions.multimodal import (
    extract_media_features,
    media_exact_dups,
)
from lsh_for_source_code_spark.functions.tokenize import shingle_files
from lsh_for_source_code_spark.operators.banding import band_files
from lsh_for_source_code_spark.streaming.incremental import (
    delta_files,
    incremental_update,
)

CFG = PipelineConfig(num_perm=16, bands=8, rows_per_band=2)


def _files_df(spark, items):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "file_id": [i for i, _ in items],
                "content": [c for _, c in items],
            }
        )
    )


def test_delta_files_left_anti(spark):
    new = _files_df(spark, [(1, "a"), (2, "b"), (3, "c")])
    known = spark.createDataFrame(pd.DataFrame({"file_id": [2]}))
    got = {r.file_id for r in delta_files(new, known).collect()}
    assert got == {1, 3}


def test_incremental_update_finds_cross_batch_pairs(spark):
    base_text = " ".join(f"w{i}" for i in range(60))
    old = _files_df(spark, [(1, base_text), (2, "totally other words entirely")])
    old_shingled = shingle_files(old).select(
        "file_id", "content_sha", "n_tokens", "shingles", "counts"
    )
    old_bands = band_files(sign_files(old_shingled, CFG), CFG)

    new = _files_df(spark, [(3, base_text + " extra")]).select(
        F.col("file_id"), F.col("content")
    )
    out = incremental_update(new, old_shingled, old_bands, CFG)
    assert {r.file_id for r in out["delta_shingled"].collect()} == {3}
    pairs = {(r.id_a, r.id_b) for r in out["verified_new_pairs"].collect()}
    assert (1, 3) in pairs
    # old-old pairs are not re-verified
    assert all(3 in p for p in pairs)


def test_media_feature_extraction_and_dedup(spark):
    payloads = [b"imgbytes-A", b"imgbytes-A", b"imgbytes-B", b"audio-X"]
    media = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_id": [1, 2, 3, 4],
                "kind": ["image", "image", "image", "audio"],
                "mime": ["image/png"] * 3 + ["audio/wav"],
                "payload": payloads,
                "width": [8, 8, 8, None],
                "height": [8, 8, 8, None],
                "duration_ms": [None, None, None, 1000],
            }
        )
    )
    feats = extract_media_features(media)
    rows = {r.media_id: r for r in feats.collect()}
    assert len(rows) == 4
    for mid, payload in zip([1, 2, 3, 4], payloads):
        assert rows[mid].payload_sha == hashlib.sha256(payload).hexdigest()
        assert rows[mid].n_bytes == len(payload)
    # deterministic stub: identical payloads -> identical features
    assert np.allclose(rows[1].feature, rows[2].feature)
    assert not np.allclose(rows[1].feature, rows[3].feature)
    assert len(rows[1].feature) == 16

    dups = {r.payload_sha: r for r in media_exact_dups(feats).collect()}
    a_sha = hashlib.sha256(b"imgbytes-A").hexdigest()
    assert dups[a_sha].n_copies == 2 and dups[a_sha].rep_id == 1


def _encode_png(px: np.ndarray, filters=None, color_type=None) -> bytes:
    """Minimal test-side PNG ENCODER (independent of the decoder under
    test): filter each scanline per `filters`, deflate, wrap in chunks."""
    import struct
    import zlib

    h, w, c = px.shape
    ct = color_type if color_type is not None else {1: 0, 2: 4, 3: 2, 4: 6}[c]
    filters = filters or [0] * h
    raw = bytearray()
    prev = np.zeros(w * c, dtype=np.uint8)
    for y in range(h):
        row = px[y].reshape(-1)
        f = filters[y]
        raw.append(f)
        if f == 0:
            flt = row
        elif f == 1:  # sub
            left = np.concatenate([np.zeros(c, np.uint8), row[:-c]])
            flt = row - left
        elif f == 2:  # up
            flt = row - prev
        elif f == 3:  # average
            left = np.concatenate([np.zeros(c, np.uint8), row[:-c]])
            flt = row - ((left.astype(np.uint16) + prev.astype(np.uint16)) >> 1).astype(np.uint8)
        elif f == 4:  # paeth
            from lsh_for_source_code_spark.functions.png import _paeth

            flt = np.empty(w * c, dtype=np.uint8)
            for x in range(w * c):
                a = int(row[x - c]) if x >= c else 0
                b = int(prev[x])
                cc = int(prev[x - c]) if x >= c else 0
                flt[x] = (int(row[x]) - _paeth(a, b, cc)) & 0xFF
        raw.extend(flt.tobytes())
        prev = row
    def chunk(t, body):
        return (
            struct.pack(">I", len(body)) + t + body
            + struct.pack(">I", zlib.crc32(t + body))
        )
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ct, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_png_decoder_roundtrip_all_filters():
    """decode_png must reconstruct exact pixels through every PNG filter
    type (0 none / 1 sub / 2 up / 3 average / 4 paeth) and every supported
    8-bit color type -- encoder is written independently in the test."""
    from lsh_for_source_code_spark.functions.png import decode_png

    rng = np.random.default_rng(11)
    for c in (1, 2, 3, 4):
        px = rng.integers(0, 256, size=(7, 5, c), dtype=np.uint8)
        for filters in ([0] * 7, [1] * 7, [2] * 7, [3] * 7, [4] * 7,
                        [0, 1, 2, 3, 4, 3, 1]):
            data = _encode_png(px, filters=filters)
            got = decode_png(data)
            assert got.shape == px.shape
            assert (got == px).all(), (c, filters)


def test_png_decoder_rejects_unsupported():
    import struct
    import zlib

    import pytest

    from lsh_for_source_code_spark.functions.png import decode_png

    with pytest.raises(ValueError):
        decode_png(b"not a png at all")
    # interlaced flag -> NotImplementedError
    def chunk(t, body):
        return (struct.pack(">I", len(body)) + t + body
                + struct.pack(">I", zlib.crc32(t + body)))
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 1)
    raw = zlib.compress(bytes([0, 1, 2, 0, 3, 4]))
    data = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", raw) + chunk(b"IEND", b""))
    with pytest.raises(NotImplementedError):
        decode_png(data)


def test_media_features_use_real_png_pixels(spark):
    """End-to-end through the Spark mapInPandas channel: a real PNG payload
    must produce the 4x4 block-mean LUMINANCE feature of its decoded
    pixels (not the digest fallback) -- two byte-wise DIFFERENT encodings
    of the same pixels (filter choice differs) must featurize identically,
    which is impossible for any digest-of-bytes stub."""
    from lsh_for_source_code_spark.functions.png import pixel_feature

    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    png_a = _encode_png(px, filters=[0] * 8)
    png_b = _encode_png(px, filters=[4] * 8)
    assert png_a != png_b  # different bytes, same pixels
    media = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_id": [1, 2],
                "kind": ["image", "image"],
                "mime": ["image/png"] * 2,
                "payload": [png_a, png_b],
                "width": [8, 8],
                "height": [8, 8],
                "duration_ms": [None, None],
            }
        )
    )
    rows = {r.media_id: r for r in extract_media_features(media).collect()}
    expected = pixel_feature(px, grid=4)
    assert np.allclose(rows[1].feature, expected, atol=1e-6)
    assert np.allclose(rows[2].feature, expected, atol=1e-6)
    assert len(rows[1].feature) == 16
