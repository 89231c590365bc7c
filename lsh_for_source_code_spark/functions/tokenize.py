"""Shingling stage S1: content -> sparse shingle multiset, as one vectorized
pandas UDF.

Replaces reference operators O1/O3/O5/O6 (SURVEY.md 2.1): instead of a global
insertion-ordered vocabulary (Main.java:36-41, O(T*V)) and a dense doc-term
matrix (LocSenHash.java:76-87), each document row carries its own sparse
sorted array of 64-bit shingle ids + counts. No global state, no shuffle.

Tokenization contract matches the reference's out-of-repo stage A
(SURVEY.md 2.3): word-level tokens `[A-Za-z_][A-Za-z0-9_]*|\\d+`; k=1
reproduces the reference granularity, k>1 generalizes to k-shingles.
The booleanize/sparsity filter (Main.java:99-104: keep freq > sparsity) is
applied here, at the earliest point -- predicate pushdown by construction.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from lsh_for_source_code_spark.functions.hashing import hash_strings, splitmix64

TOKEN_RE = r"[A-Za-z_][A-Za-z0-9_]*|\d+"

SHINGLE_SCHEMA = StructType(
    [
        StructField("shingles", ArrayType(LongType()), False),
        StructField("counts", ArrayType(IntegerType()), False),
        StructField("n_tokens", IntegerType(), False),
    ]
)

_U64 = np.uint64
_FNV_PRIME = _U64(0x100000001B3)


def _shingle_batch(content: pd.Series, k: int, min_freq: int):
    """Core batch computation; returns (list[np.int64 array], list[np.int32
    array], np.int32 array). Vectorized: the only Python loops run over the
    per-batch vocabulary and over document boundaries (list assembly)."""
    content = content.fillna("")
    tokens = content.str.findall(TOKEN_RE)  # C-regex, vectorized
    lens = tokens.str.len().to_numpy(dtype=np.int64)
    n_docs = len(content)
    flat = tokens.explode(ignore_index=True).dropna()
    if len(flat) == 0:
        empty_s = [np.empty(0, dtype=np.int64)] * n_docs
        empty_c = [np.empty(0, dtype=np.int32)] * n_docs
        return empty_s, empty_c, lens.astype(np.int32)

    codes, uniques = pd.factorize(flat)  # vectorized dictionary encode
    vocab_hashes = hash_strings(uniques)  # loop over per-batch vocab only
    token_ids = vocab_hashes[codes]  # (total_tokens,) uint64

    offsets = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), lens)

    if k == 1:
        sh = token_ids
        sh_doc = doc_idx
    else:
        # k-gram windows over the concatenated stream, masking windows that
        # cross a document boundary -- vectorized, no per-doc loop.
        total = len(token_ids)
        if total < k:
            sh = np.empty(0, dtype=_U64)
            sh_doc = np.empty(0, dtype=np.int64)
        else:
            acc = token_ids[: total - k + 1].copy()
            for j in range(1, k):
                acc = acc * _FNV_PRIME + token_ids[j : total - k + 1 + j]
            acc = splitmix64(acc)
            valid = doc_idx[: total - k + 1] == doc_idx[k - 1 :]
            sh = acc[valid]
            sh_doc = doc_idx[: total - k + 1][valid]

    # Per-(doc, shingle) distinct + counts in one global lexsort -- the sparse
    # replacement for the dense doc-term matrix fill (Main.java:50-69).
    if len(sh) == 0:
        uniq_doc = np.empty(0, dtype=np.int64)
        uniq_sh = np.empty(0, dtype=_U64)
        cnts = np.empty(0, dtype=np.int64)
    else:
        order = np.lexsort((sh, sh_doc))
        sd, ss = sh_doc[order], sh[order]
        new_grp = np.empty(len(ss), dtype=bool)
        new_grp[0] = True
        new_grp[1:] = (sd[1:] != sd[:-1]) | (ss[1:] != ss[:-1])
        starts = np.where(new_grp)[0]
        uniq_doc, uniq_sh = sd[starts], ss[starts]
        cnts = np.diff(np.append(starts, len(ss)))

    if min_freq > 0:
        keep = cnts > min_freq  # reference semantics: strictly greater
        uniq_doc, uniq_sh, cnts = uniq_doc[keep], uniq_sh[keep], cnts[keep]

    bounds = np.searchsorted(uniq_doc, np.arange(n_docs + 1))
    sh_i64 = uniq_sh.view(np.int64)  # bit-pattern into LongType
    cnts32 = cnts.astype(np.int32)
    out_sh = [sh_i64[bounds[d] : bounds[d + 1]] for d in range(n_docs)]
    out_cn = [cnts32[bounds[d] : bounds[d + 1]] for d in range(n_docs)]
    return out_sh, out_cn, lens.astype(np.int32)


def make_shingle_udf(k: int = 1, min_freq: int = 0):
    """pandas UDF: content -> struct(shingles sorted-distinct array<long>,
    counts array<int>, n_tokens int)."""

    @pandas_udf(SHINGLE_SCHEMA)
    def shingle(content: pd.Series) -> pd.DataFrame:
        sh, cn, nt = _shingle_batch(content, k, min_freq)
        return pd.DataFrame({"shingles": sh, "counts": cn, "n_tokens": nt})

    return shingle


def shingle_files(df, content_col: str = "content", k: int = 1, min_freq: int = 0):
    """S1: attach (content_sha, n_tokens, shingles, counts) to a code_files
    DataFrame. sha256 stays JVM-side (F.sha2) -- the per-row invariant column
    (input_hint: content sha256 equality vs reference)."""
    udf = make_shingle_udf(k, min_freq)
    return (
        df.withColumn("content_sha", F.sha2(F.col(content_col), 256))
        .withColumn("_sh", udf(F.col(content_col)))
        .withColumn("shingles", F.col("_sh.shingles"))
        .withColumn("counts", F.col("_sh.counts"))
        .withColumn("n_tokens", F.col("_sh.n_tokens"))
        .drop("_sh")
    )
