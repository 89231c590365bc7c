#!/usr/bin/env python3
"""r06 S5 experiment: candidate-stage decomposition + variants.

Sub-stage attribution of candidate_pairs at the bench corpus, then A/B of:
  salt    -- current salted two-level stats aggregation
  nosalt  -- single groupBy with map-side partial aggregation (partial agg
             already bounds the hot key's reducer input at #map-partitions
             rows, making the explicit salt level a redundant exchange)
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark import StorageLevel
from pyspark.sql import functions as F

from bench import _corpus_parquet, _warm_jvm, _bench_cfg, make_spark
from lsh_for_source_code_spark.functions.minhash import sign_files
from lsh_for_source_code_spark.functions.tokenize import shingle_files
from lsh_for_source_code_spark.operators.banding import band_files
from lsh_for_source_code_spark.operators.candidates import (
    BAND_KEY,
    _chunked_mega_pairs,
    _refine_mega,
)
from lsh_for_source_code_spark.plans.pipeline import with_file_id

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main():
    spark = make_spark(CPUS)
    cfg = _bench_cfg()
    _warm_jvm(spark)
    df = spark.read.parquet(_corpus_parquet(spark))
    ids = with_file_id(df, check_collisions=False)
    shingled = (
        shingle_files(ids, k=cfg.shingle_k, min_freq=cfg.min_token_freq)
        .select("file_id", "content_sha", "shingles", "counts")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    sha_groups = shingled.groupBy("content_sha").agg(
        F.min("file_id").alias("rep_id")
    )
    reps = shingled.join(
        sha_groups.select(F.col("rep_id").alias("file_id")), "file_id"
    )
    signed = sign_files(reps, cfg).persist(StorageLevel.MEMORY_AND_DISK)
    bands = band_files(signed, cfg).persist(StorageLevel.MEMORY_AND_DISK)
    shingled.count()
    signed.count()
    print("bands:", bands.count(), flush=True)

    t = {}

    def timed(name, fn):
        spark.sparkContext.setJobDescription(f"cands:{name}")
        t0 = time.monotonic()
        r = fn()
        t[name] = round(time.monotonic() - t0, 2)
        print(f"  {name}: {t[name]}s -> {r}", flush=True)
        return r

    # --- stats variants ---
    def stats_salt():
        salted = bands.withColumn(
            "_salt", F.pmod(F.xxhash64("file_id"), F.lit(cfg.salt_partitions))
        )
        sub = salted.groupBy(*BAND_KEY, "_salt").agg(
            F.count("*").alias("_c"), F.min("file_id").alias("_m")
        )
        return sub.groupBy(*BAND_KEY).agg(
            F.sum("_c").alias("sz"), F.min("_m").alias("anchor")
        )

    def stats_nosalt():
        return bands.groupBy(*BAND_KEY).agg(
            F.count("*").alias("sz"), F.min("file_id").alias("anchor")
        )

    for rep in range(2):
        timed(f"stats_salt_r{rep}", lambda: stats_salt().agg(
            F.count("*"), F.sum("sz"), F.sum("anchor")).first())
        timed(f"stats_nosalt_r{rep}", lambda: stats_nosalt().agg(
            F.count("*"), F.sum("sz"), F.sum("anchor")).first())

    # --- full stage decomposition (current salted implementation) ---
    stats = stats_salt()
    tagged = bands.join(stats.hint("shuffle_hash"), on=BAND_KEY).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    timed("tagged_persist", tagged.count)
    small = tagged.filter(
        (F.col("sz") >= 2) & (F.col("sz") <= cfg.max_bucket_pairs)
    ).select(*BAND_KEY, "file_id")
    left = small.alias("l")
    right = small.alias("r").hint("shuffle_hash")
    pairs_small = left.join(
        right,
        on=[F.col(f"l.{k}") == F.col(f"r.{k}") for k in BAND_KEY]
        + [F.col("l.file_id") < F.col("r.file_id")],
    ).select(F.col("l.file_id").alias("id_a"), F.col("r.file_id").alias("id_b"))
    timed("pairs_small_count", pairs_small.count)

    mega = tagged.filter(F.col("sz") > cfg.max_bucket_pairs).select(
        "band_id", F.col("band_hash").alias("_key"), "file_id", "sz", "anchor"
    )
    timed("mega_rows", mega.count)
    refined_exact, residual = _refine_mega(
        mega, signed, cfg, int(cfg.mega_refine_levels)
    )
    timed("refined_exact_count", refined_exact.count)
    timed("residual_count", residual.count)
    pairs_mega = _chunked_mega_pairs(residual, cfg)
    timed("pairs_mega_count", pairs_mega.count)
    merged = (
        pairs_small.withColumn("_star", F.lit(False))
        .unionByName(refined_exact.withColumn("_star", F.lit(True)))
        .unionByName(pairs_mega.withColumn("_star", F.lit(True)))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_shared_bands"), F.max("_star").alias("_star"))
    )
    timed("final_dedup_count", merged.count)
    print("RESULT", t)


if __name__ == "__main__":
    main()
