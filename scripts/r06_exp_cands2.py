#!/usr/bin/env python3
"""r06 S5 experiment 2: end-to-end candidate_pairs variants with checksums.

  cur      -- current implementation (salted stats + stats join)
  nosalt   -- single-level stats aggregations everywhere (partial agg
              already bounds hot-key reducer input); stats join kept
  window   -- tagged via window count/min over ONE band-key exchange
              (removes the stats aggregation + join entirely); refinement
              stats single-level
Each variant: full candidate set count + xor checksum + n_shared_bands sum.
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark import StorageLevel
from pyspark.sql import Window, functions as F

from bench import _corpus_parquet, _warm_jvm, _bench_cfg, make_spark
from lsh_for_source_code_spark.caching import track
from lsh_for_source_code_spark.functions.minhash import sign_files
from lsh_for_source_code_spark.functions.tokenize import shingle_files
from lsh_for_source_code_spark.operators.banding import band_files
from lsh_for_source_code_spark.operators.candidates import (
    BAND_KEY,
    _chunked_mega_pairs,
    candidate_pairs,
)
from lsh_for_source_code_spark.plans.pipeline import with_file_id

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
VARIANTS = sys.argv[1:] or ["cur", "nosalt", "window"]


def _refine(mega, signed, cfg, levels, salt: bool):
    """_refine_mega with optional single-level stats."""
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
            "band_id",
            "file_id",
            F.posexplode(F.array(*keys)).alias("_lvl", "_k"),
        )
    )
    work = track(work.persist())
    KEY = ["_lvl", "band_id", "_k"]
    if salt:
        sub = work.withColumn(
            "_salt", F.pmod(F.xxhash64("file_id"), F.lit(cfg.salt_partitions))
        ).groupBy(*KEY, "_salt").agg(
            F.count("*").alias("_c"), F.min("file_id").alias("_m")
        )
        st = sub.groupBy(*KEY).agg(
            F.sum("_c").alias("sz"), F.min("_m").alias("anchor")
        )
    else:
        st = work.groupBy(*KEY).agg(
            F.count("*").alias("sz"), F.min("file_id").alias("anchor")
        )
    st = track(st.persist())
    emit_keys = st.filter(
        (F.col("sz") >= 2)
        & ((F.col("sz") <= C) | ((F.col("_lvl") >= 1) & (F.col("sz") <= cap)))
    ).select(*KEY)
    emit = work.join(emit_keys.hint("shuffle_hash"), on=KEY).select(*KEY, "file_id")
    el, er = emit.alias("l"), emit.alias("r").hint("shuffle_hash")
    exact = el.join(
        er,
        on=[F.col(f"l.{k}") == F.col(f"r.{k}") for k in KEY]
        + [F.col("l.file_id") < F.col("r.file_id")],
    ).select(F.col("l.file_id").alias("id_a"), F.col("r.file_id").alias("id_b"))
    res_keys = st.filter(
        (F.col("_lvl") == levels - 1) & (F.col("sz") > cap)
    ).select(*KEY, "sz", "anchor")
    residual = (
        work.filter(F.col("_lvl") == levels - 1)
        .join(res_keys.hint("shuffle_hash"), on=KEY)
        .select("band_id", F.col("_k").alias("_key"), "file_id", "sz", "anchor")
    )
    return exact, residual


def cands_variant(bands, signed, cfg, variant):
    if variant == "cur":
        return candidate_pairs(bands, cfg, signed=signed)
    if variant == "nosalt":
        stats = bands.groupBy(*BAND_KEY).agg(
            F.count("*").alias("sz"), F.min("file_id").alias("anchor")
        )
        tagged = track(
            bands.join(stats.hint("shuffle_hash"), on=BAND_KEY).persist()
        )
    else:  # window
        w = Window.partitionBy(*BAND_KEY)
        tagged = track(
            bands.withColumn("sz", F.count("*").over(w))
            .withColumn("anchor", F.min("file_id").over(w))
            .persist()
        )
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
    mega = tagged.filter(F.col("sz") > cfg.max_bucket_pairs).select(
        "band_id", F.col("band_hash").alias("_key"), "file_id", "sz", "anchor"
    )
    refined_exact, residual = _refine(
        mega, signed, cfg, int(cfg.mega_refine_levels), salt=False
    )
    pairs_mega = _chunked_mega_pairs(residual, cfg)
    merged = (
        pairs_small.withColumn("_star", F.lit(False))
        .unionByName(refined_exact.withColumn("_star", F.lit(True)))
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
    from lsh_for_source_code_spark.caching import release_all as _ra

    results = {}
    for rep in range(2):
        for v in VARIANTS:
            spark.sparkContext.setJobDescription(f"cands:{v}")
            t0 = time.monotonic()
            out = cands_variant(bands, signed, cfg, v)
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
            # release only the variant-internal persists, keep inputs
            import lsh_for_source_code_spark.caching as caching

            for df_ in list(caching._ACTIVE):
                if df_ not in (shingled, signed, bands):
                    try:
                        df_.unpersist()
                    except Exception:
                        pass
                    caching._ACTIVE.remove(df_)
    print("RESULT", results)


if __name__ == "__main__":
    main()
