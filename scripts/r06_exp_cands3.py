#!/usr/bin/env python3
"""r06 S5 experiment 3: HOF pair expansion vs self-joins.

  cur  -- repo HEAD candidate_pairs (nosalt stats + mega_c persist)
  hof  -- same, but small-bucket / refinement-emit / chunk all-pairs are
          produced by collect_list (bounded <= max_bucket_pairs) + an
          array pair-expansion expression instead of self-joins; the
          groupBys ride the existing KEY partitioning, so each self-join's
          build+probe disappears.
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
from lsh_for_source_code_spark.caching import track
from lsh_for_source_code_spark.functions.minhash import sign_files
from lsh_for_source_code_spark.functions.tokenize import shingle_files
from lsh_for_source_code_spark.operators.banding import band_files
from lsh_for_source_code_spark.operators.candidates import (
    BAND_KEY,
    bucket_stats,
    candidate_pairs,
)
from lsh_for_source_code_spark.plans.pipeline import with_file_id

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def pair_expand(df, key_cols, out=("id_a", "id_b")):
    """members array -> exploded (id_a < id_b) pairs, pure JVM HOFs."""
    pairs = F.flatten(
        F.transform(
            "ms",
            lambda x: F.transform(
                F.filter("ms", lambda y: y > x),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    return (
        df.select(*key_cols, F.explode(pairs).alias("p"))
        .select(F.col("p.a").alias(out[0]), F.col("p.b").alias(out[1]))
    )


def cands_hof(bands, signed, cfg):
    stats = bucket_stats(bands)
    tagged = track(bands.join(stats.hint("shuffle_hash"), on=BAND_KEY).persist())
    small = tagged.filter(
        (F.col("sz") >= 2) & (F.col("sz") <= cfg.max_bucket_pairs)
    ).select(*BAND_KEY, "file_id")
    pairs_small = pair_expand(
        small.groupBy(*BAND_KEY).agg(F.collect_list("file_id").alias("ms")),
        [],
    )
    mega = tagged.filter(F.col("sz") > cfg.max_bucket_pairs).select(
        "band_id", F.col("band_hash").alias("_key"), "file_id", "sz", "anchor"
    )
    levels = int(cfg.mega_refine_levels)
    r, p = cfg.rows_per_band, cfg.num_perm
    C = max(int(cfg.mega_chunk_target), 2)
    cap = int(cfg.max_bucket_pairs)
    keys = []
    k = F.col("_key")
    for l in range(levels):
        k = F.xxhash64(
            k,
            F.element_at(
                "minhash",
                ((F.col("band_id") * r + F.lit(r + l)) % p + 1).cast("int"),
            ),
        )
        keys.append(k)
    work = (
        mega.select("band_id", "_key", "file_id")
        .join(signed.select("file_id", "minhash").hint("shuffle_hash"), "file_id")
        .select(
            "band_id", "file_id", F.posexplode(F.array(*keys)).alias("_lvl", "_k")
        )
    )
    work = track(work.persist())
    KEY = ["_lvl", "band_id", "_k"]
    st = track(
        work.groupBy(*KEY)
        .agg(F.count("*").alias("sz"), F.min("file_id").alias("anchor"))
        .persist()
    )
    emit_keys = st.filter(
        (F.col("sz") >= 2)
        & ((F.col("sz") <= C) | ((F.col("_lvl") >= 1) & (F.col("sz") <= cap)))
    ).select(*KEY)
    emit = work.join(emit_keys.hint("shuffle_hash"), on=KEY).select(*KEY, "file_id")
    exact = pair_expand(
        emit.groupBy(*KEY).agg(F.collect_list("file_id").alias("ms")), []
    )
    res_keys = st.filter(
        (F.col("_lvl") == levels - 1) & (F.col("sz") > cap)
    ).select(*KEY, "sz", "anchor")
    residual = (
        work.filter(F.col("_lvl") == levels - 1)
        .join(res_keys.hint("shuffle_hash"), on=KEY)
        .select("band_id", F.col("_k").alias("_key"), "file_id", "sz", "anchor")
    )
    n_chunks = F.greatest(
        F.ceil(F.col("sz") / F.lit(C)).cast("long"), F.lit(1).cast("long")
    )
    mega_c = track(
        residual.withColumn(
            "_chunk", F.pmod(F.xxhash64("band_id", "_key", "file_id"), n_chunks)
        )
        .select("band_id", "_key", "_chunk", "file_id", "anchor")
        .persist()
    )
    chunk_groups = mega_c.groupBy("band_id", "_key", "_chunk").agg(
        F.collect_list("file_id").alias("ms"),
        F.min("file_id").alias("_cmin"),
        F.min("anchor").alias("_anchor"),
    )
    chunk_pairs = pair_expand(chunk_groups, [])
    anchor_edges = chunk_groups.filter(
        F.col("_cmin") != F.col("_anchor")
    ).select(F.col("_anchor").alias("id_a"), F.col("_cmin").alias("id_b"))
    pairs_mega = chunk_pairs.unionByName(anchor_edges)
    merged = (
        pairs_small.withColumn("_star", F.lit(False))
        .unionByName(exact.withColumn("_star", F.lit(True)))
        .unionByName(pairs_mega.withColumn("_star", F.lit(True)))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_shared_bands"), F.max("_star").alias("_star"))
    )
    return merged.drop("_star")


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
    import lsh_for_source_code_spark.caching as caching

    results = {}
    for rep in range(2):
        for v in ["cur", "hof"]:
            spark.sparkContext.setJobDescription(f"cands:{v}")
            t0 = time.monotonic()
            out = (
                candidate_pairs(bands, cfg, signed=signed)
                if v == "cur"
                else cands_hof(bands, signed, cfg)
            )
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
            for df_ in list(caching._ACTIVE):
                if df_ not in (shingled, signed, bands):
                    df_.unpersist()
                    caching._ACTIVE.remove(df_)
    print("RESULT", results)


if __name__ == "__main__":
    main()
