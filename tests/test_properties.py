"""Property-based invariants (SURVEY.md 5.2 item 3).

Numpy-level properties run hypothesis-style sweeps without Spark; the
cluster-invariance properties run the full pipeline on a small corpus under
permuted row order and different partition counts.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from lsh_for_source_code_spark.config import (
    PipelineConfig,
    candidate_probability,
    expected_signature_error,
    signature_size_for_error,
)
from lsh_for_source_code_spark.corpus import corpus_df
from lsh_for_source_code_spark.functions.hashing import (
    minhash_coefficients,
    minhash_concat,
    splitmix64,
)
from lsh_for_source_code_spark.plans.pipeline import run_pipeline


def _pair_with_jaccard(rng, s: float, n: int = 400):
    """Two sets with jaccard ~= s: share k of (2n-k) total where k/(2n-k)=s."""
    k = int(round(2 * n * s / (1 + s)))
    shared = rng.integers(0, 1 << 62, size=k, dtype=np.uint64)
    a = np.concatenate([shared, rng.integers(0, 1 << 62, size=n - k, dtype=np.uint64)])
    b = np.concatenate([shared, rng.integers(0, 1 << 62, size=n - k, dtype=np.uint64)])
    return splitmix64(a), splitmix64(b)


@pytest.mark.parametrize("s", [0.3, 0.5, 0.7, 0.9])
def test_banding_s_curve_within_chernoff_bounds(s):
    """Empirical P(pair shares >= 1 band) tracks 1-(1-s^r)^b.

    30 trials per similarity; assert the empirical rate is within a
    normal-approximation 4-sigma interval of the closed form (plus the
    jaccard-realization noise of the constructed pairs)."""
    cfg = PipelineConfig()  # b=64, r=2
    rng = np.random.default_rng(int(s * 1000))
    trials, hits = 40, 0
    for t in range(trials):
        a, b = _pair_with_jaccard(rng, s)
        av, bv = minhash_coefficients(cfg.num_perm, cfg.seed)
        offs = np.array([0, len(a), len(a) + len(b)], dtype=np.int64)
        sigs = minhash_concat(np.concatenate([a, b]), offs, av, bv)
        r = cfg.rows_per_band
        bands_a = sigs[0].reshape(cfg.bands, r)
        bands_b = sigs[1].reshape(cfg.bands, r)
        if np.any(np.all(bands_a == bands_b, axis=1)):
            hits += 1
        # vary the pair, not the coefficients: new rng stream per trial
        rng = np.random.default_rng(int(s * 1000) + t + 1)
    p = candidate_probability(s, cfg.bands, cfg.rows_per_band)
    sigma = math.sqrt(max(p * (1 - p), 1e-6) / trials)
    assert abs(hits / trials - p) <= 4 * sigma + 0.08, (hits / trials, p)


def test_signature_error_helpers_consistent():
    for err in [0.05, 0.1, 0.2]:
        size = signature_size_for_error(err)
        # int(1/err^2) floors (same as the reference's Java cast), so the
        # expected error can exceed err by the one-permutation quantum
        assert expected_signature_error(size) <= err * 1.05
        assert expected_signature_error(size + 1) <= err * 1.01
    with pytest.raises(ValueError):
        signature_size_for_error(1.5)


def test_estimator_error_shrinks_with_signature_size():
    rng = np.random.default_rng(9)
    a, b = _pair_with_jaccard(rng, 0.6, n=600)
    true_j = len(np.intersect1d(a, b)) / len(np.union1d(a, b))
    errs = {}
    for n in [32, 256]:
        av, bv = minhash_coefficients(n, seed=11)
        offs = np.array([0, len(a), len(a) + len(b)], dtype=np.int64)
        sigs = minhash_concat(np.concatenate([a, b]), offs, av, bv)
        errs[n] = abs(float(np.mean(sigs[0] == sigs[1])) - true_j)
    assert errs[256] <= errs[32] + expected_signature_error(256)


@pytest.fixture(scope="module")
def small_corpus(spark):
    df, _ = corpus_df(spark, n_files=120, seed=77)
    return df


def _clusters_of(spark, df, **kw):
    out = run_pipeline(spark, df, PipelineConfig(), **kw)
    return {(r.file_id, r.cluster_id) for r in out["clusters"].collect()}


def test_clusters_invariant_under_row_order(spark, small_corpus):
    base = _clusters_of(spark, small_corpus)
    from pyspark.sql import functions as F

    shuffled = (
        small_corpus.withColumn("_r", F.xxhash64("path", "commit"))
        .orderBy("_r")
        .drop("_r")
    )
    assert _clusters_of(spark, shuffled) == base


def test_clusters_invariant_under_partition_count(spark, small_corpus):
    base = _clusters_of(spark, small_corpus)
    assert _clusters_of(spark, small_corpus.repartition(17)) == base
    assert _clusters_of(spark, small_corpus.coalesce(1)) == base


def test_sketch_estimates_invariant_under_parallelism(spark):
    """The new sketch queries' estimates must be bit-identical at any
    shuffle width (the north rule's parallelism-invariance property,
    extended to the sketch family): HLL's harmonic sum is exact integer
    arithmetic and CMS/Bloom counts are exact integers, so no
    float-summation order can leak partitioning into the output. Run each
    query at the session default and at shuffle_partitions=3, compare
    full row sets."""
    from lsh_for_source_code_spark.entry_queries import QUERIES

    sf = "/root/testdata/sf0.001"
    for name in ("hll_distinct", "cms_heavy_hitters", "chunk_dedup_rewrite"):
        q = QUERIES[name]
        base = {tuple(r) for r in q(spark, sf).collect()}
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        try:
            spark.conf.set("spark.sql.shuffle.partitions", "3")
            narrow = {tuple(r) for r in q(spark, sf).collect()}
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
        assert narrow == base, name
