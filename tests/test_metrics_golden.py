"""Tests for run metrics / per-partition lineage (north_rule) and the
reference golden-output renderer."""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import functions as F

from lsh_for_source_code_spark.config import PipelineConfig
from lsh_for_source_code_spark.corpus import corpus_df
from lsh_for_source_code_spark.plans.metrics import RunMetrics, partition_stats
from lsh_for_source_code_spark.plans.pipeline import run_pipeline
from lsh_for_source_code_spark.sources.reference_io import golden_output_lines


def test_partition_stats_counts_every_partition(spark):
    df = spark.range(1000).repartition(7)
    rows = partition_stats(df).collect()
    assert len(rows) == 7
    assert sum(r.rows for r in rows) == 1000
    assert all(r.bytes_est > 0 for r in rows)


def test_run_metrics_ledger_roundtrip(spark, tmp_path):
    m = RunMetrics(config_id="cfg-x")
    m.record("s1", "computed", rows=10, wall_s=1.5)
    m.record("s2", "resumed")
    path = m.write(spark, str(tmp_path))
    got = spark.read.parquet(path).orderBy("stage").collect()
    assert [(r.stage, r.action, r.rows) for r in got] == [
        ("s1", "computed", 10),
        ("s2", "resumed", -1),
    ]
    assert all(r.config_id == "cfg-x" and r.run_id == m.run_id for r in got)


def test_pipeline_emits_lineage_and_metrics(spark, tmp_path):
    df, _ = corpus_df(spark, n_files=60, seed=5)
    ck = str(tmp_path / "ck")
    run_pipeline(spark, df, PipelineConfig(), checkpoint_dir=ck)
    # per-partition lineage fingerprint exists for every stage
    for stage in ["files_shingled", "signatures", "bands", "candidate_pairs",
                  "verified_pairs", "clusters"]:
        pdir = os.path.join(ck, stage + "__partitions")
        assert os.path.exists(os.path.join(pdir, "_SUCCESS")), stage
        total = (
            spark.read.parquet(pdir).agg(F.sum("rows")).first()[0]
        )
        real = spark.read.parquet(os.path.join(ck, stage)).count()
        assert total == real, stage
    # stage_metrics ledger written with one computed event per stage
    metrics = spark.read.parquet(os.path.join(ck, "stage_metrics"))
    actions = {r.stage: r.action for r in metrics.collect()}
    assert actions["clusters"] == "computed"
    assert len(actions) >= 6


def test_golden_output_format(spark):
    per_file = spark.createDataFrame(
        pd.DataFrame(
            {
                "path": ["a/F1.java", "a/F2.java"],
                "band_hashes": [[1, 2, 3], [4, 5, 6]],
            }
        )
    )
    counts = spark.createDataFrame(
        pd.DataFrame(
            {"band_id": [0, 0, 1], "band_hash": [1, 4, 2], "count": [1, 1, 2]}
        )
    )
    lines = golden_output_lines(per_file, counts, stages=2, buckets=7)
    assert lines[0].startswith("LSH output")
    assert "a/F1.java : [1 2 3 ]" in lines
    assert "a/F2.java : [4 5 6 ]" in lines
    # trailer: stages rows x buckets cols of occupancy counts
    trailer = [ln for ln in lines if ln and ln[0].isdigit()]
    assert len(trailer) == 2
    assert trailer[0].split() == ["0", "1", "0", "0", "1", "0", "0"]
    assert trailer[1].split() == ["0", "0", "2", "0", "0", "0", "0"]
