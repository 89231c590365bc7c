"""Reference-parity mode: bit-exact reproduction of the reference engine's
math under a fixed seed.

The reference pipeline (SURVEY.md 3.1) is: ordinal token ids from a global
first-occurrence vocabulary (Main.java:36-41) -> boolean sets after the
sparsity filter (Main.java:99-104) -> MinHash signature with coefficients
a_i, b_i drawn interleaved from java.util.Random.nextInt(dict_size)
(MinHash.java:293-297), h_i(x) = (a_i*x + b_i) mod dict_size in long math
(MinHash.java:307-310), empty set => Integer.MAX_VALUE everywhere
(MinHash.java:196-199) -> additive band hash mod buckets (LSH.java:47-64).

This module reimplements those published semantics from scratch (numpy +
our JavaRandom LCG, itself validated bit-for-bit against the real JDK in
tests/test_parity.py) so cluster-level parity claims can be anchored to
signature-level bit equality when a seed IS fixed. The committed golden
HashOutput used an unseeded Random and is irreproducible by anyone,
including the reference itself (SURVEY.md 3.1).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import ArrayType, IntegerType
from pyspark.sql.window import Window

from lsh_for_source_code_spark.config import REFERENCE_BAND_PRIME
from lsh_for_source_code_spark.functions.hashing import JavaRandom

INT_MAX = (1 << 31) - 1


def java_minhash_coefficients(sig_size: int, dict_size: int, seed: int) -> np.ndarray:
    """(sig_size, 2) int64: a_i, b_i interleaved draws of nextInt(dict_size),
    matching the reference's seeded constructor semantics."""
    r = JavaRandom(seed)
    out = np.empty((sig_size, 2), dtype=np.int64)
    for i in range(sig_size):
        out[i, 0] = r.next_int(dict_size)
        out[i, 1] = r.next_int(dict_size)
    return out


def reference_signature(ids: np.ndarray, coefs: np.ndarray, dict_size: int) -> np.ndarray:
    """Signature of one boolean set given as its ordinal-id array.
    Empty set => INT_MAX everywhere."""
    if len(ids) == 0:
        return np.full(len(coefs), INT_MAX, dtype=np.int64)
    x = ids.astype(np.int64)
    hv = (coefs[:, 0:1] * x[None, :] + coefs[:, 1:2]) % dict_size  # (sig, n)
    return hv.min(axis=1)


def reference_band_hash(sig: np.ndarray, stages: int, buckets: int) -> np.ndarray:
    """Additive per-stage accumulator, long math, mod buckets each step;
    remainder rows clamp into the last stage (LSH.java:56)."""
    rows = len(sig) // stages
    out = np.zeros(stages, dtype=np.int64)
    for i, v in enumerate(sig.tolist()):
        stage = min(i // rows, stages - 1)
        out[stage] = (out[stage] + v * REFERENCE_BAND_PRIME) % buckets
    return out


def ordinal_vocabulary(tokenfile: DataFrame) -> DataFrame:
    """First-occurrence-ordered global token ids (reference O3 semantics,
    Main.java:36-41) as a declarative plan: explode with position, take each
    token's first (seq, pos), number by that order.

    This is the parity-mode replacement for direct shingle hashing; it costs
    a global shuffle + window, which is exactly why the default mode avoids
    a dictionary entirely (SURVEY.md 4.1)."""
    exploded = tokenfile.select(
        "seq", F.posexplode("tokens").alias("pos", "token")
    )
    firsts = exploded.groupBy("token").agg(
        F.min(F.struct("seq", "pos")).alias("first_at")
    )
    w = Window.orderBy("first_at.seq", "first_at.pos")
    return firsts.select(
        "token", (F.row_number().over(w) - 1).alias("token_id")
    )


def parity_boolean_sets(tokenfile: DataFrame, vocab: DataFrame, sparsity: int) -> DataFrame:
    """(seq, fileid, ids array<int>) -- ordinal ids of tokens with
    freq > sparsity, sorted ascending (set semantics; TreeSet order,
    MinHash.java:79-87)."""
    pairs = tokenfile.select(
        "seq",
        "fileid",
        F.explode(F.arrays_zip("tokens", "freqs")).alias("tf"),
    ).select(
        "seq",
        "fileid",
        F.col("tf.tokens").alias("token"),
        F.col("tf.freqs").alias("freq"),
    )
    kept = pairs.filter(F.col("freq") > sparsity).join(vocab, "token")
    sets = kept.groupBy("seq", "fileid").agg(
        F.array_sort(F.collect_list("token_id")).alias("ids")
    )
    # files whose every token was filtered out still need a row (empty set)
    all_files = tokenfile.select("seq", "fileid")
    return (
        all_files.join(sets, ["seq", "fileid"], "left")
        .withColumn("ids", F.coalesce("ids", F.array().cast("array<int>")))
    )


def make_parity_signature_udf(sig_size: int, dict_size: int, seed: int):
    coefs = java_minhash_coefficients(sig_size, dict_size, seed)

    @pandas_udf(ArrayType(IntegerType()))
    def parity_signature(ids: pd.Series) -> pd.Series:
        return pd.Series(
            [
                reference_signature(
                    np.asarray(a if a is not None else [], dtype=np.int64),
                    coefs,
                    dict_size,
                ).astype(np.int32)
                for a in ids
            ]
        )

    return parity_signature


def parity_pipeline(
    tokenfile: DataFrame,
    sparsity: int,
    stages: int,
    buckets: int,
    sig_size: int,
    seed: int,
) -> DataFrame:
    """Full reference-semantics run: Tokenfile -> (seq, fileid, signature
    array<int>, band_hashes array<int>). dict_size = |vocabulary| as in the
    reference (vocab size passed to MinHash, Main.java:106)."""
    vocab = ordinal_vocabulary(tokenfile)
    dict_size = vocab.count()
    sets = parity_boolean_sets(tokenfile, vocab, sparsity)
    sig_udf = make_parity_signature_udf(sig_size, dict_size, seed)
    signed = sets.withColumn("signature", sig_udf("ids"))
    rows = sig_size // stages
    rem = sig_size % stages
    band = F.transform(
        F.sequence(F.lit(0), F.lit(stages - 1)),
        # remainder signature positions clamp into the LAST stage, matching
        # the reference (LSH.java:56 caps stage at stages-1) and this
        # module's own reference_band_hash.
        lambda b: F.aggregate(
            F.slice(
                "signature",
                b * F.lit(rows) + 1,
                F.when(b == F.lit(stages - 1), F.lit(rows + rem)).otherwise(
                    F.lit(rows)
                ),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: (acc + x.cast("long") * F.lit(REFERENCE_BAND_PRIME))
            % F.lit(buckets),
        ).cast("int"),
    )
    return signed.withColumn("band_hashes", band)
