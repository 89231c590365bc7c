"""Ground-truth recall evaluation at bench scale (VERDICT r2 wrong#1).

The synthetic corpus (corpus.py) records a family id per file. True dup
pairs come in two strata:

* WITHIN-FAMILY: type1/type2/type3/containment (and intra-boilerplate-
  family) pairs. Families have <= 8 members, so the exact >=theta pair set
  is a per-family self-join -- linear in corpus size, computable at ANY
  scale.
* CROSS-FAMILY BOILERPLATE: the shared 30-line license header pushes
  cross-family boilerplate jaccard right to the 0.5 threshold (measured at
  300 files: 30/196 true pairs are cross-boilerplate at 0.500-0.536).
  These are precisely the pairs the mega-bucket star cap can suppress, so a
  recall metric that ignored them would miss the one stratum where the
  production skew path loses pairs. All-pairs over ~15% of the corpus is
  quadratic, so at bench scale this stratum is evaluated on a DETERMINISTIC
  sample (seq %% mod == 0) -- an unbiased estimate of the stratum's recall.

Other cross-family pairs do not exist: bodies are independently random with
per-file identifier prefixes (corpus.py), validated by
tests/test_pipeline_e2e.py::test_family_truth_evaluator_matches_brute_force
which checks the two strata EXACTLY reproduce full brute force at 300 files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from lsh_for_source_code_spark.functions.tokenize import shingle_files
from lsh_for_source_code_spark.plans.pipeline import with_file_id


def _with_truth(code_files: DataFrame, truth: DataFrame) -> DataFrame:
    """Attach (seq, family, family_id) via the corpus's deterministic path
    pattern (`.../Class{seq}.java`) -- no content comparison."""
    ids = with_file_id(code_files).withColumn(
        "seq", F.regexp_extract("path", r"Class(\d+)\.java", 1).cast("long")
    )
    return ids.join(
        truth.select(F.col("file_seq").alias("seq"), "family", "family_id"),
        "seq",
    )


def _pairs_ge_theta(m: DataFrame, join_cond, threshold: float) -> DataFrame:
    """Exact jaccard >= threshold pairs from a (file_id, shingles, ...) frame
    under an extra join predicate. JVM-side array_intersect/size throughout."""
    a, b = m.alias("a"), m.alias("b")
    inter = F.size(F.array_intersect(F.col("a.shingles"), F.col("b.shingles")))
    sa, sb = F.size(F.col("a.shingles")), F.size(F.col("b.shingles"))
    jac = inter / (sa + sb - inter)
    return (
        a.join(b, on=join_cond(a, b))
        .filter((sa > 0) & (sb > 0) & (jac >= F.lit(threshold)))
        .select(
            F.col("a.file_id").alias("id_a"), F.col("b.file_id").alias("id_b")
        )
    )


def family_truth_pairs(
    spark: SparkSession,
    code_files: DataFrame,
    truth: DataFrame,
    threshold: float,
    shingle_k: int,
    boilerplate_sample_mod: int = 1,
) -> DataFrame:
    """(id_a, id_b, stratum) of ground-truth >=theta pairs.

    stratum 'family': exact within-family pairs (all families, any scale).
    stratum 'bp_cross': cross-family pairs among boilerplate files with
    seq %% boilerplate_sample_mod == 0 (mod=1 => exhaustive; at bench scale
    pick mod so the sample stays a few thousand files).
    """
    fam = _with_truth(code_files, truth).filter(F.col("family") != "unique")
    sh = shingle_files(fam, k=shingle_k).select(
        "seq", "family", "family_id", "file_id", "shingles"
    )

    within = _pairs_ge_theta(
        sh,
        lambda a, b: [
            F.col("a.family_id") == F.col("b.family_id"),
            F.col("a.file_id") < F.col("b.file_id"),
        ],
        threshold,
    ).withColumn("stratum", F.lit("family"))

    bp = sh.filter(
        (F.col("family") == "boilerplate")
        & (F.col("seq") % boilerplate_sample_mod == 0)
    )
    cross = _pairs_ge_theta(
        bp,
        lambda a, b: [
            F.col("a.family_id") < F.col("b.family_id"),
        ],
        threshold,
    ).withColumn("stratum", F.lit("bp_cross"))
    # canonical id_a < id_b ordering for the cross stratum
    cross = cross.select(
        F.least("id_a", "id_b").alias("id_a"),
        F.greatest("id_a", "id_b").alias("id_b"),
        "stratum",
    )
    return within.unionByName(cross)


def cluster_recall(truth_pairs: DataFrame, clusters: DataFrame) -> dict:
    """Per-stratum + overall fraction of ground-truth pairs whose endpoints
    share a cluster_id."""
    ca = clusters.select(
        F.col("file_id").alias("id_a"), F.col("cluster_id").alias("_cl_a")
    )
    cb = clusters.select(
        F.col("file_id").alias("id_b"), F.col("cluster_id").alias("_cl_b")
    )
    rows = (
        truth_pairs.join(ca, "id_a", "left")
        .join(cb, "id_b", "left")
        .groupBy("stratum")
        .agg(
            F.count("*").alias("n_truth"),
            F.sum((F.col("_cl_a") == F.col("_cl_b")).cast("long")).alias("n_same"),
        )
        .collect()
    )
    out, tot_t, tot_s = {}, 0, 0
    for r in rows:
        n_t, n_s = int(r.n_truth), int(r.n_same or 0)
        tot_t += n_t
        tot_s += n_s
        out[f"truth_pairs_{r.stratum}"] = n_t
        out[f"truth_recall_{r.stratum}"] = round(n_s / n_t, 6) if n_t else 1.0
    out["truth_pairs"] = tot_t
    out["truth_recall"] = round(tot_s / tot_t, 6) if tot_t else 1.0
    return out
