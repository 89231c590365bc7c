#!/usr/bin/env python3
"""r06 S6 experiment: SOUND positional prefix filter (PPJoin t-occurrence
lemma) before the exact array_intersect, at the bench corpus.

Lemma (Xiao et al. 2008, PPJoin; sets sorted by one global total order):
if |A ∩ B| >= alpha then the (|A|-alpha+t)-prefix of A and the
(|B|-alpha+t)-prefix of B share at least t elements, for any t with
t <= alpha.  jaccard(A,B) >= theta  <=>  |A ∩ B| >= theta/(1+theta) *
(|A|+|B|), so pairs failing the prefix check have jaccard < theta with
CERTAINTY -- the filter is exact, not probabilistic: the verified output is
byte-identical (asserted here by count + checksum).

Economics: prefix intersect costs ~(p/n) of the full intersect and runs on
every pair; the full intersect then runs on survivors only. At theta=0.5
the minimum sound prefix is already n/3, so the win hinges on how much junk
sits at very low jaccard -- which mode `dist` measures first.

Usage: r06_exp_prefix.py dist | ab [T ...]
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F

from bench import _bench_cfg, _warm_jvm, make_spark
from scripts.r06_exp_verify import build_inputs

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
MODE = sys.argv[1] if len(sys.argv) > 1 else "dist"
TS = [int(x) for x in sys.argv[2:]] or [16, 48]


def joined_features(cands, shingled):
    """candidates + both shingle arrays, b-side broadcast (the shipped r6
    join shape), then the sound size-ratio filter -- the state of the row
    stream right before the exact intersect."""
    feat = shingled.select(F.col("file_id").alias("fid"), "shingles")
    a = feat.select(F.col("fid").alias("id_a"), F.col("shingles").alias("sh_a"))
    b = feat.select(F.col("fid").alias("id_b"), F.col("shingles").alias("sh_b"))
    joined = cands.join(a.hint("shuffle_hash"), "id_a").join(F.broadcast(b), "id_b")
    sz_a, sz_b = F.size("sh_a").cast("double"), F.size("sh_b").cast("double")
    jac_bound = F.least(sz_a, sz_b) / F.greatest(F.greatest(sz_a, sz_b), F.lit(1.0))
    return joined.filter(jac_bound >= F.lit(0.5) - F.lit(1e-12))


def prefix_pred(theta: float, t: int):
    """Sound necessary condition for jaccard >= theta (see module doc)."""
    na, nb = F.size("sh_a"), F.size("sh_b")
    alpha = F.ceil(
        F.lit(theta / (1.0 + theta)) * (na + nb).cast("double") - F.lit(1e-9)
    ).cast("int")
    t_eff = F.least(F.lit(t), alpha)  # lemma needs t <= alpha
    pa = F.greatest(na - alpha + t_eff, F.lit(0)).cast("int")
    pb = F.greatest(nb - alpha + t_eff, F.lit(0)).cast("int")
    shared = F.size(
        F.array_intersect(F.slice("sh_a", 1, pa), F.slice("sh_b", 1, pb))
    )
    return shared >= t_eff


def main():
    spark = make_spark(CPUS)
    cfg = _bench_cfg()
    theta = cfg.jaccard_threshold
    _warm_jvm(spark)
    shingled, cands = build_inputs(spark, cfg)
    base = joined_features(cands, shingled)

    if MODE == "dist":
        # One full-intersect pass, bucketed by jaccard in 0.05 bins + size
        # profile: sizes the pre-filter opportunity.
        spark.sparkContext.setJobDescription("prefix:dist")
        sz_a, sz_b = F.size("sh_a").cast("double"), F.size("sh_b").cast("double")
        inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
        jac = inter / (sz_a + sz_b - inter)
        t0 = time.monotonic()
        rows = (
            base.select(
                F.floor(jac * 20).cast("int").alias("bin"),
                ((F.size("sh_a") + F.size("sh_b")) / 2).alias("avgn"),
            )
            .groupBy("bin")
            .agg(F.count("*").alias("n"), F.avg("avgn").alias("avg_n"))
            .orderBy("bin")
            .collect()
        )
        print(f"dist wall {round(time.monotonic() - t0, 2)}s", flush=True)
        tot = sum(r.n for r in rows)
        cum = 0
        for r in rows:
            cum += r.n
            print(
                f"j[{r.bin * 0.05:.2f},{r.bin * 0.05 + 0.05:.2f}) "
                f"n={r.n:>9} cum={cum / tot:6.1%} avg_n={r.avg_n:7.1f}"
            )
        return

    # A/B: baseline exact intersect vs prefix-filtered, identical output.
    def run(tag, df):
        spark.sparkContext.setJobDescription(f"prefix:{tag}")
        sz_a, sz_b = F.size("sh_a").cast("double"), F.size("sh_b").cast("double")
        inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
        union = sz_a + sz_b - inter
        out = (
            df.withColumn(
                "jaccard", F.when(union > 0, inter / union).otherwise(F.lit(0.0))
            )
            .filter(F.col("jaccard") >= theta)
            .select("id_a", "id_b", "jaccard", "n_shared_bands")
        )
        t0 = time.monotonic()
        row = out.agg(
            F.count("*").alias("n"),
            F.sum(F.xxhash64("id_a", "id_b")).alias("chk"),
            F.sum(F.round("jaccard", 9)).alias("jsum"),
        ).first()
        w = round(time.monotonic() - t0, 2)
        print(
            f"{tag}: {w}s n={row.n} chk={row.chk} jsum={row.jsum}", flush=True
        )
        return w, (row.n, row.chk, row.jsum)

    results, sigs = {}, {}
    for rep in range(3):
        for tag, df in [("base", base)] + [
            (f"T{t}", base.filter(prefix_pred(theta, t))) for t in TS
        ]:
            w, sig = run(f"{tag}.r{rep}", df)
            results.setdefault(tag, []).append(w)
            sigs.setdefault(tag, sig)
            assert sig == sigs["base"], f"OUTPUT MISMATCH {tag}: {sig} vs {sigs['base']}"
    print("RESULT", results)


if __name__ == "__main__":
    main()
