#!/usr/bin/env python3
"""spark-submit entry point for the dedup pipeline.

Production invocation (north_rule):

    spark-submit --py-files lsh_for_source_code_spark.zip \
        scripts/run_pipeline.py \
        --input  <path or table of code_files(repo,path,commit,lang,content)> \
        --checkpoint-dir <resumable stage store> \
        --theta 0.5 --num-perm 128 --bands 64 --seed 0x5eedcafe

Local smoke:

    python scripts/run_pipeline.py --input /tmp/corpus.parquet \
        --checkpoint-dir /tmp/ckpt --master 'local[8]'

Re-running with the same checkpoint dir resumes: completed stages are
read back, not recomputed. Outputs land under the checkpoint dir
(files_shingled, signatures, bands, candidate_pairs, verified_pairs,
clusters, stage_metrics, *__partitions lineage fingerprints).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="parquet path of code_files")
    p.add_argument("--checkpoint-dir", required=True)
    p.add_argument("--theta", type=float, default=0.5)
    p.add_argument("--num-perm", type=int, default=128)
    p.add_argument("--bands", type=int, default=64)
    p.add_argument("--shingle-k", type=int, default=1)
    p.add_argument("--seed", type=lambda s: int(s, 0), default=0x5EED_CAFE)
    p.add_argument("--overlap-theta", type=float, default=None)
    p.add_argument("--with-containment", action="store_true")
    p.add_argument("--master", default=None)
    args = p.parse_args()

    from lsh_for_source_code_spark.config import PipelineConfig
    from lsh_for_source_code_spark.plans.pipeline import run_pipeline
    from lsh_for_source_code_spark.session import get_spark

    cfg = PipelineConfig(
        shingle_k=args.shingle_k,
        num_perm=args.num_perm,
        bands=args.bands,
        rows_per_band=args.num_perm // args.bands,
        seed=args.seed,
        jaccard_threshold=args.theta,
        overlap_threshold=args.overlap_theta,
    )
    spark = get_spark(app_name="code-dedup-pipeline", master=args.master)
    files = spark.read.parquet(args.input)
    out = run_pipeline(
        spark,
        files,
        cfg,
        checkpoint_dir=args.checkpoint_dir,
        with_containment=args.with_containment,
    )
    n_files = out["files_shingled"].count()
    n_pairs = out["verified_pairs"].count()
    n_clusters = out["clusters"].select("cluster_id").distinct().count()
    print(
        f"done: files={n_files} verified_pairs={n_pairs} clusters={n_clusters} "
        f"config={cfg.config_id} checkpoints={args.checkpoint_dir}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
