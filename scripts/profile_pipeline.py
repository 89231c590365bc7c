#!/usr/bin/env python3
"""Phase-attributed profiling of the bench pipeline (round-2 scaling work).

Runs the same S1..S7 pipeline as bench.py --pipeline-only, but forces one
stage at a time with explicit actions and prints per-phase wall times, so
the non-scaling (serial) component can be attributed. Run at two core
counts and diff:

    SPARK_GRAFT_CPUS=2 python scripts/profile_pipeline.py
    SPARK_GRAFT_CPUS=8 python scripts/profile_pipeline.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
BENCH_FILES = int(os.environ.get("SPARK_GRAFT_BENCH_FILES", "200000"))


def main():
    from bench import _corpus_parquet, make_spark
    from lsh_for_source_code_spark.config import PipelineConfig
    from lsh_for_source_code_spark.functions.minhash import sign_files
    from lsh_for_source_code_spark.functions.tokenize import shingle_files
    from lsh_for_source_code_spark.operators.banding import band_files
    from lsh_for_source_code_spark.operators.candidates import candidate_pairs
    from lsh_for_source_code_spark.operators.components import connected_components
    from lsh_for_source_code_spark.operators.verify import verify_pairs
    from lsh_for_source_code_spark.plans.pipeline import with_file_id
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    spark = make_spark(CPUS)
    path = _corpus_parquet(spark)
    cfg = PipelineConfig()

    phases = {}

    def timed(name, fn):
        t0 = time.monotonic()
        out = fn()
        phases[name] = round(time.monotonic() - t0, 2)
        print(f"  {name}: {phases[name]}s", flush=True)
        return out

    t_total = time.monotonic()
    df = spark.read.parquet(path)
    ids = with_file_id(df)

    # warm python workers so fork cost is visible separately
    timed("warm_python_workers", lambda: spark.range(CPUS * 4).repartition(CPUS)
          .mapInPandas(lambda it: it, schema="id long").count())

    shingled = shingle_files(ids, k=cfg.shingle_k, min_freq=cfg.min_token_freq).select(
        "file_id", "content_sha", "n_tokens", "shingles", "counts"
    ).persist(StorageLevel.MEMORY_AND_DISK)
    timed("S1_shingle", shingled.count)

    sha_groups = shingled.groupBy("content_sha").agg(
        F.min("file_id").alias("rep_id"), F.count("*").alias("sha_count")
    )
    membership = shingled.select("file_id", "content_sha").join(sha_groups, "content_sha")
    exact_edges = membership.filter(F.col("file_id") != F.col("rep_id")).select(
        F.col("rep_id").alias("id_a"), F.col("file_id").alias("id_b")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    timed("S2_exact_edges", exact_edges.count)

    reps = shingled.join(sha_groups.select(F.col("rep_id").alias("file_id")), "file_id")
    signed = sign_files(reps, cfg).persist(StorageLevel.MEMORY_AND_DISK)
    timed("S3_sign", signed.count)

    bands = band_files(signed, cfg).persist(StorageLevel.MEMORY_AND_DISK)
    timed("S4_bands", bands.count)

    cands = candidate_pairs(bands, cfg).persist(StorageLevel.MEMORY_AND_DISK)
    timed("S5_candidates", cands.count)

    verified = verify_pairs(cands, shingled, cfg).persist(StorageLevel.MEMORY_AND_DISK)
    timed("S6_verify", verified.count)

    edges = verified.select("id_a", "id_b").unionByName(exact_edges.select("id_a", "id_b"))
    edges = edges.persist(StorageLevel.MEMORY_AND_DISK)
    timed("S7a_edges_union", edges.count)

    clusters = timed(
        "S7b_cc_build",
        lambda: connected_components(edges, nodes=shingled.select("file_id")),
    )
    timed("S7c_clusters_count", lambda: clusters.select("cluster_id").distinct().count())

    total = round(time.monotonic() - t_total, 2)
    print(json.dumps({"cpus": CPUS, "total": total, "phases": phases}))


if __name__ == "__main__":
    main()
