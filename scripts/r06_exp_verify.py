#!/usr/bin/env python3
"""r06 S6 experiment: verify-join strategy A/B at the bench corpus.

Variants (identical output contract, identical pair set asserted):
  shj      -- current default: two SHUFFLE_HASH feature joins
  bcast    -- broadcast both feature sides (arrays never cross an exchange)
  bcast_b  -- SHUFFLE_HASH a-side, broadcast b-side (half the exchange)
  szfilter -- broadcast (fid, size) dim first, size-ratio filter BEFORE the
              wide joins, then SHUFFLE_HASH joins
Prints wall + verified count + xor-checksum per variant.
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
from lsh_for_source_code_spark.operators.candidates import candidate_pairs
from lsh_for_source_code_spark.plans.pipeline import with_file_id

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
VARIANTS = sys.argv[1:] or ["shj", "bcast", "bcast_b", "szfilter"]


def build_inputs(spark, cfg):
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
    bands = band_files(signed, cfg)
    cands = candidate_pairs(bands, cfg, signed=signed).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    shingled.count()
    signed.count()
    n = cands.count()
    print(f"candidates: {n}", flush=True)
    return shingled, cands


def verify_variant(cands, shingled, cfg, variant):
    feat = shingled.select(F.col("file_id").alias("fid"), "shingles")
    a = feat.select(F.col("fid").alias("id_a"), F.col("shingles").alias("sh_a"))
    b = feat.select(F.col("fid").alias("id_b"), F.col("shingles").alias("sh_b"))
    eps = F.lit(1e-12)
    theta = F.lit(cfg.jaccard_threshold)
    pairs = cands
    if variant == "shj":
        joined = pairs.join(a.hint("shuffle_hash"), "id_a").join(
            b.hint("shuffle_hash"), "id_b"
        )
    elif variant == "bcast":
        joined = pairs.join(F.broadcast(a), "id_a").join(F.broadcast(b), "id_b")
    elif variant == "bcast_b":
        joined = pairs.join(a.hint("shuffle_hash"), "id_a").join(
            F.broadcast(b), "id_b"
        )
    elif variant == "szfilter":
        szs = shingled.select(
            F.col("file_id").alias("fid"), F.size("shingles").alias("nsh")
        )
        pairs = (
            pairs.join(
                F.broadcast(szs.select(F.col("fid").alias("id_a"), F.col("nsh").alias("_na"))),
                "id_a",
            )
            .join(
                F.broadcast(szs.select(F.col("fid").alias("id_b"), F.col("nsh").alias("_nb"))),
                "id_b",
            )
            .filter(
                F.least("_na", "_nb").cast("double")
                / F.greatest(F.greatest("_na", "_nb").cast("double"), F.lit(1.0))
                >= theta - eps
            )
            .drop("_na", "_nb")
        )
        joined = pairs.join(a.hint("shuffle_hash"), "id_a").join(
            b.hint("shuffle_hash"), "id_b"
        )
    elif variant == "szfilter_bcast_b":
        szs = shingled.select(
            F.col("file_id").alias("fid"), F.size("shingles").alias("nsh")
        )
        pairs = (
            pairs.join(
                F.broadcast(szs.select(F.col("fid").alias("id_a"), F.col("nsh").alias("_na"))),
                "id_a",
            )
            .join(
                F.broadcast(szs.select(F.col("fid").alias("id_b"), F.col("nsh").alias("_nb"))),
                "id_b",
            )
            .filter(
                F.least("_na", "_nb").cast("double")
                / F.greatest(F.greatest("_na", "_nb").cast("double"), F.lit(1.0))
                >= theta - eps
            )
            .drop("_na", "_nb")
        )
        joined = pairs.join(a.hint("shuffle_hash"), "id_a").join(
            F.broadcast(b), "id_b"
        )
    else:
        raise SystemExit(f"unknown variant {variant}")
    sz_a, sz_b = F.size("sh_a").cast("double"), F.size("sh_b").cast("double")
    jac_bound = F.least(sz_a, sz_b) / F.greatest(F.greatest(sz_a, sz_b), F.lit(1.0))
    joined = joined.filter(jac_bound >= theta - eps)
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = sz_a + sz_b - inter
    out = joined.withColumn(
        "jaccard", F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    ).filter(F.col("jaccard") >= cfg.jaccard_threshold)
    return out.select("id_a", "id_b", "jaccard", "n_shared_bands")


def main():
    spark = make_spark(CPUS)
    cfg = _bench_cfg()
    _warm_jvm(spark)
    shingled, cands = build_inputs(spark, cfg)
    results = {}
    for rep in range(2):
        for v in VARIANTS:
            spark.sparkContext.setJobDescription(f"verify:{v}")
            t0 = time.monotonic()
            out = verify_variant(cands, shingled, cfg, v)
            row = out.agg(
                F.count("*").alias("n"),
                F.sum(F.xxhash64("id_a", "id_b")).alias("chk"),
            ).first()
            w = round(time.monotonic() - t0, 2)
            results.setdefault(v, []).append(w)
            print(f"rep{rep} {v}: {w}s n={row.n} chk={row.chk}", flush=True)
    print("RESULT", results)


if __name__ == "__main__":
    main()
