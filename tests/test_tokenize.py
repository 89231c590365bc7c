"""Shingle-stage tests: tokenizer contract (SURVEY.md 2.3), sparsity
predicate (Main.java:99-104 semantics), sha256 invariant (input_hint)."""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd

from lsh_for_source_code_spark.functions.hashing import hash_strings
from lsh_for_source_code_spark.functions.tokenize import (
    TOKEN_RE,
    _shingle_batch,
    shingle_files,
)

SRC = "public static void main(String[] args) { int x1 = 42; x1 = x1 + 1; }"


def test_token_regex_matches_reference_granularity():
    toks = re.findall(TOKEN_RE, SRC)
    assert toks == [
        "public", "static", "void", "main", "String", "args",
        "int", "x1", "42", "x1", "x1", "1",
    ]


def test_shingle_batch_counts_and_distinct():
    sh, cn, nt = _shingle_batch(pd.Series([SRC]), k=1, min_freq=0)
    assert nt[0] == 12
    assert len(sh[0]) == 10  # distinct tokens
    assert sorted(cn[0].tolist(), reverse=True)[0] == 3  # x1 appears 3x
    assert cn[0].sum() == 12
    # sorted ascending in the uint64 hash space (int64 column is a bit view)
    u = sh[0].view(np.uint64)
    assert np.array_equal(u, np.sort(u))
    # token->hash mapping consistent with hash_strings
    x1_hash = hash_strings(["x1"]).view(np.int64)[0]
    i = int(np.where(sh[0] == x1_hash)[0][0])
    assert cn[0][i] == 3


def test_sparsity_filter_strictly_greater():
    # reference booleanize: keep freq > sparsity (Main.java:102)
    sh, cn, _ = _shingle_batch(pd.Series([SRC]), k=1, min_freq=2)
    assert len(sh[0]) == 1  # only x1 (freq 3) survives > 2
    sh0, _, _ = _shingle_batch(pd.Series([SRC]), k=1, min_freq=3)
    assert len(sh0[0]) == 0


def test_kgram_mode_no_cross_doc_windows():
    docs = pd.Series(["a b c", "d e f"])
    sh, _, _ = _shingle_batch(docs, k=2, min_freq=0)
    assert len(sh[0]) == 2 and len(sh[1]) == 2
    # windows crossing the boundary (c,d) must not exist in either doc
    joined = pd.Series(["a b c d e f"])
    shj, _, _ = _shingle_batch(joined, k=2, min_freq=0)
    assert len(shj[0]) == 5
    cross = set(shj[0].tolist()) - set(sh[0].tolist()) - set(sh[1].tolist())
    assert len(cross) == 1  # exactly the (c,d) window


def test_empty_and_null_content():
    sh, cn, nt = _shingle_batch(pd.Series(["", None, "   "]), k=1, min_freq=0)
    for i in range(3):
        assert len(sh[i]) == 0 and nt[i] == 0


def test_shingle_files_sha256_invariant(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"content": [SRC, "", "x y z"]})
    )
    rows = shingle_files(df).select("content", "content_sha").collect()
    for r in rows:
        assert r.content_sha == hashlib.sha256(r.content.encode()).hexdigest()


def test_shingle_files_spark_matches_batch(spark):
    df = spark.createDataFrame(pd.DataFrame({"content": [SRC]}))
    row = shingle_files(df).select("shingles", "counts", "n_tokens").first()
    sh, cn, nt = _shingle_batch(pd.Series([SRC]), 1, 0)
    assert row.n_tokens == nt[0]
    assert list(row.shingles) == sh[0].tolist()
    assert list(row.counts) == cn[0].tolist()
