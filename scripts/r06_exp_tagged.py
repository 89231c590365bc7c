#!/usr/bin/env python3
"""r06 S5 experiment (resumed session): drop singleton-bucket rows before
the tagged persist. `tagged` feeds only the small (2..cap) and mega
(>cap) branches; sz==1 rows (most buckets: singletons at 64-band fanout)
are persisted and re-scanned for nothing.

Variants over FULL candidate_pairs (count + checksum + n_shared_bands sum
asserted identical):
  cur  -- repo HEAD
  flt  -- bands.join(stats).filter(sz >= 2).persist()
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
import lsh_for_source_code_spark.operators.candidates as C
from lsh_for_source_code_spark.functions.minhash import sign_files
from lsh_for_source_code_spark.functions.tokenize import shingle_files
from lsh_for_source_code_spark.operators.banding import band_files
from lsh_for_source_code_spark.plans.pipeline import with_file_id

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("REPS", "3"))

ORIG_JOIN = C.DataFrame.join


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

    import lsh_for_source_code_spark.operators.candidates as cand_mod

    def patched_candidate_pairs(bands, cfg, signed=None, flt=False):
        """Copy of candidate_pairs head with optional sz>=2 pre-filter."""
        stats = cand_mod.bucket_stats(bands)
        j = bands.join(stats.hint("shuffle_hash"), on=cand_mod.BAND_KEY)
        if flt:
            j = j.filter(F.col("sz") >= 2)
        tagged = track(j.persist())
        small = tagged.filter(
            (F.col("sz") >= 2) & (F.col("sz") <= cfg.max_bucket_pairs)
        ).select(*cand_mod.BAND_KEY, "file_id")
        pairs_small = cand_mod._pair_expand(
            small.groupBy(*cand_mod.BAND_KEY).agg(
                F.collect_list("file_id").alias("ms")
            )
        )
        mega = tagged.filter(F.col("sz") > cfg.max_bucket_pairs).select(
            "band_id", F.col("band_hash").alias("_key"), "file_id", "sz", "anchor"
        )
        levels = int(cfg.mega_refine_levels) if signed is not None else 0
        refined_exact, residual = cand_mod._refine_mega(mega, signed, cfg, levels)
        pairs_mega = cand_mod._chunked_mega_pairs(residual, cfg)
        union = pairs_small.unionByName(refined_exact).unionByName(pairs_mega)
        return union.groupBy("id_a", "id_b").agg(
            F.count("*").alias("n_shared_bands")
        )

    results = {}
    for rep in range(REPS):
        for v in ("cur", "flt"):
            spark.sparkContext.setJobDescription(f"tagged:{v}")
            t0 = time.monotonic()
            out = patched_candidate_pairs(bands, cfg, signed=signed, flt=(v == "flt"))
            row = out.agg(
                F.count("*").alias("n"),
                F.sum(F.xxhash64("id_a", "id_b")).alias("chk"),
                F.sum("n_shared_bands").alias("nsb"),
            ).first()
            w = round(time.monotonic() - t0, 2)
            results.setdefault(v, []).append(w)
            print(
                f"rep{rep} {v}: {w}s n={row.n} chk={row.chk} nsb={row.nsb}",
                flush=True,
            )
            release_all()
    print("RESULT", results)


if __name__ == "__main__":
    main()
