#!/usr/bin/env python3
"""r06 experiment (resumed session 2): ngram_jaccard_pairs gram-build
fan-out. The posting self-join evaluates the regexp tokenize + bigram
zip_with + array_distinct expression independently on BOTH join sides
(plus once more inside a pushed filter) -- the same broken-reuse shape
the bloom/lm/semdedup persists fixed.

Variants (identical output asserted: count + xxhash64 checksum + jaccard
sum):
  cur  -- repo HEAD q_ngram_jaccard_pairs
  per  -- persist the pre-explode grams table (doc_id, source, grams, n)
          via caching.track; both sides explode from the cache
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F

from bench import make_spark, _warm_jvm
from lsh_for_source_code_spark.caching import track, release_all
from lsh_for_source_code_spark import entry_queries as EQ

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("REPS", "3"))


def q_ngram_persist(spark, sf_dir):
    docs = EQ._read(spark, sf_dir, "documents")
    toks = EQ._tokens(F.col("text"))
    grams = F.array_distinct(
        F.zip_with(
            F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
            F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
            lambda a, b: F.xxhash64(F.concat_ws("\x01", a, b)),
        )
    )
    gtab = track(
        docs.select("doc_id", "source", grams.alias("grams"))
        .withColumn("n", F.size("grams"))
        .persist()
    )
    posts = gtab.select(
        "doc_id", "source", "n", F.explode("grams").alias("gram")
    )
    a, b = posts.alias("a"), posts.alias("b")
    inter = (
        a.join(
            b,
            on=[
                F.col("a.source") == F.col("b.source"),
                F.col("a.gram") == F.col("b.gram"),
                F.col("a.doc_id") < F.col("b.doc_id"),
                F.col("a.n") * 0.3 <= F.col("b.n"),
                F.col("b.n") * 0.3 <= F.col("a.n"),
            ],
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.n").alias("na"),
            F.col("b.n").alias("nb"),
        )
        .agg(F.count("*").alias("i"))
    )
    jac = F.col("i").cast("double") / (
        F.col("na") + F.col("nb") - F.col("i")
    ).cast("double")
    return (
        inter.select("id_a", "id_b", F.round(jac, 6).alias("bigram_jaccard"))
        .filter(F.col("bigram_jaccard") >= 0.3)
    )


def main():
    spark = make_spark(CPUS)
    _warm_jvm(spark)
    results = {}
    for rep in range(REPS):
        for v in ("cur", "per"):
            spark.sparkContext.setJobDescription(f"ngram:{v}")
            fn = EQ.q_ngram_jaccard_pairs if v == "cur" else q_ngram_persist
            t0 = time.monotonic()
            out = fn(spark, SF_DIR)
            row = out.agg(
                F.count("*").alias("n"),
                F.sum(F.xxhash64("id_a", "id_b")).alias("chk"),
                F.sum("bigram_jaccard").alias("js"),
            ).first()
            w = round(time.monotonic() - t0, 2)
            results.setdefault(v, []).append(w)
            print(f"rep{rep} {v}: {w}s n={row.n} chk={row.chk} js={row.js}",
                  flush=True)
            release_all()
    print("RESULT", results)


if __name__ == "__main__":
    main()
