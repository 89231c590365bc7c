"""Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03
-- the MOSS algorithm, THE standard source-code fingerprinting scheme).

Definition (shared verbatim by the numpy kernel here and the independent
DuckDB SQL oracle in entry_queries):
  * codes   = Unicode code points of the text
  * hash_i  = sum_{j<k} codes[i+j] * B^(k-1-j)   (EXACT int64: B=263, k=5
              keeps every term and the sum far below 2^63 even for
              astral-plane code points -- no modulus, so both engines
              agree bit-for-bit)
  * windows = w consecutive k-gram hashes; if a doc has fewer than w
              hashes, the whole doc is one window
  * select the RIGHTMOST minimal hash of each window (the paper's robust
    winnowing tie rule); fingerprints = distinct (position, hash)

Guarantee (SIGMOD'03 Thm.): any substring match of length >= w + k - 1
yields at least one shared fingerprint, and density is 2/(w+1) -- the
property test sweeps this with hypothesis.

Scale shape: fingerprinting is embarrassingly parallel (one vectorized
pandas UDF, no shuffle); the overlap join is an inverted-index equi-join
on the fingerprint hash with a frequency stoplist capping posting-list
length (boilerplate defense, same move as the n-gram channel).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType, StructField, StructType

WINNOW_K = 5
WINNOW_W = 8
WINNOW_B = 263


def winnow_doc(
    text: str, k: int = WINNOW_K, w: int = WINNOW_W, base: int = WINNOW_B
) -> tuple[np.ndarray, np.ndarray]:
    """(positions, hashes) of the winnowed fingerprints of one document.
    Fully vectorized: one sliding_window_view min + a reversed argmin for
    the rightmost-tie rule."""
    codes = np.frombuffer(text.encode("utf-32-le"), dtype="<u4").astype(np.int64)
    n = len(codes)
    if n < k:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    nh = n - k + 1
    powers = base ** np.arange(k - 1, -1, -1, dtype=np.int64)
    h = np.zeros(nh, dtype=np.int64)
    for j in range(k):
        h += codes[j : j + nh] * powers[j]
    if nh <= w:
        i = nh - 1 - int(np.argmin(h[::-1]))
        return np.array([i], dtype=np.int64), h[[i]]
    win = np.lib.stride_tricks.sliding_window_view(h, w)
    # argmin over the REVERSED window picks the first minimum there, i.e.
    # the rightmost minimum of the original window
    idx = (w - 1) - win[:, ::-1].argmin(axis=1)
    pos = np.unique(np.arange(nh - w + 1, dtype=np.int64) + idx)
    return pos, h[pos]


_FP_SCHEMA = StructType(
    [
        StructField("pos", ArrayType(LongType()), False),
        StructField("fp", ArrayType(LongType()), False),
    ]
)


@pandas_udf(_FP_SCHEMA)
def winnow_udf(text: pd.Series) -> pd.DataFrame:
    poss, fps = [], []
    for t in text:
        p, h = winnow_doc(t or "")
        poss.append(p)
        fps.append(h)
    return pd.DataFrame({"pos": poss, "fp": fps})


def winnow_fingerprints(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, pos, fp): one row per winnowed fingerprint per document."""
    return (
        docs.select(F.col(id_col), winnow_udf(F.col(text_col)).alias("_w"))
        .select(
            id_col,
            F.explode(F.arrays_zip("_w.pos", "_w.fp")).alias("_e"),
        )
        .select(
            id_col,
            F.col("_e.pos").alias("pos"),
            F.col("_e.fp").alias("fp"),
        )
    )


def winnow_overlap_pairs(
    docs: DataFrame,
    min_shared: int = 2,
    max_doc_freq: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id_a, id_b, n_shared): document pairs sharing >= min_shared
    DISTINCT fingerprint hashes, via an inverted-index self-join on the
    hash. Fingerprints appearing in more than max_doc_freq documents are
    stoplisted first (boilerplate/license headers would otherwise create
    quadratic posting lists -- the winnowing paper's own 'too common'
    remedy, and the same skew defense as the n-gram channel's hot-gram
    handling)."""
    fp = winnow_fingerprints(docs, id_col, text_col).select(
        F.col(id_col).alias("id"), "fp"
    ).distinct()
    rare = fp.groupBy("fp").agg(
        F.count("*").alias("_df")
    ).filter(F.col("_df") <= max_doc_freq)
    fp = fp.join(rare.select("fp"), "fp")
    a = fp.select(F.col("id").alias("id_a"), "fp")
    b = fp.select(F.col("id").alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
