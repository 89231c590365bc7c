#!/usr/bin/env python3
"""r06 S5 decomposition (resumed session): where do the ~32s go?

Times each S5 component in isolation (persist+count per step so the
attribution is honest, mirroring bench_extra.py pipeline):
  t_tagged   stats groupBy + SHUFFLE_HASH join + persist of tagged
  t_small    small-bucket collect_list + HOF expansion (count)
  t_refine   mega work join + st stats + emit expansion (count)
  t_mega     chunked residual pairs (count)
  t_dedup    final (id_a, id_b) groupBy over the persisted raw emissions
Also prints raw emission volume vs distinct pairs (dedup shuffle sizing).
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
from lsh_for_source_code_spark.caching import track, release_all
from lsh_for_source_code_spark.functions.minhash import sign_files
from lsh_for_source_code_spark.functions.tokenize import shingle_files
from lsh_for_source_code_spark.operators.banding import band_files
from lsh_for_source_code_spark.operators.candidates import (
    BAND_KEY,
    _chunked_mega_pairs,
    _pair_expand,
    _refine_mega,
    bucket_stats,
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
        .select("file_id", "content_sha", "n_tokens", "shingles", "counts")
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

    T = {}

    def timed(name, fn):
        spark.sparkContext.setJobDescription(f"cands4:{name}")
        t0 = time.monotonic()
        r = fn()
        T[name] = round(time.monotonic() - t0, 2)
        print(f"  {name}: {T[name]}s -> {r}", flush=True)
        return r

    stats = bucket_stats(bands)
    tagged = bands.join(stats.hint("shuffle_hash"), on=BAND_KEY).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    timed("t_tagged", tagged.count)

    small = tagged.filter(
        (F.col("sz") >= 2) & (F.col("sz") <= cfg.max_bucket_pairs)
    ).select(*BAND_KEY, "file_id")
    pairs_small = _pair_expand(
        small.groupBy(*BAND_KEY).agg(F.collect_list("file_id").alias("ms"))
    ).persist(StorageLevel.MEMORY_AND_DISK)
    timed("t_small", pairs_small.count)

    mega = tagged.filter(F.col("sz") > cfg.max_bucket_pairs).select(
        "band_id", F.col("band_hash").alias("_key"), "file_id", "sz", "anchor"
    )
    refined_exact, residual = _refine_mega(
        mega, signed, cfg, int(cfg.mega_refine_levels)
    )
    refined_exact = refined_exact.persist(StorageLevel.MEMORY_AND_DISK)
    timed("t_refine", refined_exact.count)
    pairs_mega = _chunked_mega_pairs(residual, cfg).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    timed("t_mega", pairs_mega.count)

    merged_raw = (
        pairs_small.withColumn("_star", F.lit(False))
        .unionByName(refined_exact.withColumn("_star", F.lit(True)))
        .unionByName(pairs_mega.withColumn("_star", F.lit(True)))
    )
    merged = merged_raw.groupBy("id_a", "id_b").agg(
        F.count("*").alias("n_shared_bands"), F.max("_star").alias("_star")
    )
    if cfg.min_band_agreement > 1:
        merged = merged.filter(
            (F.col("n_shared_bands") >= cfg.min_band_agreement) | F.col("_star")
        )
    n = timed("t_dedup", merged.count)
    print("RESULT", T, flush=True)
    print(
        "VOLUME raw_emissions=",
        pairs_small.count() + refined_exact.count() + pairs_mega.count(),
        " distinct=", n, flush=True,
    )
    release_all()


if __name__ == "__main__":
    main()
