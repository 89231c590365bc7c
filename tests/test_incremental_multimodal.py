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
