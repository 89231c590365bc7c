"""Incremental corpus growth (reference entry 2: one-vector binning for
incremental use, LSHMinHash.java:103-105 -- generalized to batch deltas).

The production design is Iceberg snapshot-diff: sign only files not present
in the signatures checkpoint (left-anti join on file_id), then restrict
candidate generation to buckets touched by the delta. Structured Streaming
is deliberately NOT used for the core pipeline (SURVEY.md 2.5: the reference
is strictly batch; incremental re-runs are snapshot arithmetic, which is
cheaper and exactly-once by construction). A Structured Streaming ingest
example is provided for completeness of the API surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from lsh_for_source_code_spark.config import PipelineConfig
from lsh_for_source_code_spark.functions.minhash import sign_files
from lsh_for_source_code_spark.functions.tokenize import shingle_files
from lsh_for_source_code_spark.operators.banding import band_files
from lsh_for_source_code_spark.operators.candidates import BAND_KEY, candidate_pairs
from lsh_for_source_code_spark.operators.verify import verify_pairs


def delta_files(new_batch: DataFrame, known_signatures: DataFrame) -> DataFrame:
    """Files in the incoming batch not yet signed (resume/skip semantics:
    left-anti against the checkpoint, SURVEY.md 2.5 'Joins')."""
    return new_batch.join(
        known_signatures.select("file_id"), "file_id", "left_anti"
    )


def incremental_update(
    new_batch: DataFrame,
    known_shingled: DataFrame,
    known_bands: DataFrame,
    cfg: PipelineConfig,
) -> dict[str, DataFrame]:
    """Sign + band only the delta; generate candidates only in buckets the
    delta touches (semi-join pushdown on the band key); verify delta pairs.

    Returns the new stage rows to append plus the verified pairs involving
    at least one new file. At 10^12-file scale this is the difference
    between re-shuffling the world and shuffling the day's commits.
    """
    delta = delta_files(new_batch, known_shingled)
    d_shingled = shingle_files(delta, k=cfg.shingle_k, min_freq=cfg.min_token_freq).select(
        "file_id", "content_sha", "n_tokens", "shingles", "counts"
    )
    d_signed = sign_files(d_shingled, cfg)
    d_bands = band_files(d_signed, cfg)

    touched = d_bands.select(*BAND_KEY).distinct()
    relevant_old = known_bands.join(touched, BAND_KEY, "left_semi")
    all_bands = relevant_old.unionByName(d_bands)

    cands = candidate_pairs(all_bands, cfg)
    new_ids = d_shingled.select("file_id")
    cands_new = (
        cands.join(new_ids.withColumnRenamed("file_id", "id_a"), "id_a", "left_semi")
        .unionByName(
            cands.join(
                new_ids.withColumnRenamed("file_id", "id_b"), "id_b", "left_semi"
            )
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    shingle_union = known_shingled.unionByName(d_shingled).dropDuplicates(["file_id"])
    verified = verify_pairs(cands_new, shingle_union, cfg)
    return {
        "delta_shingled": d_shingled,
        "delta_signatures": d_signed,
        "delta_bands": d_bands,
        "verified_new_pairs": verified,
    }


def streaming_ingest(spark, input_path: str, checkpoint: str, cfg: PipelineConfig):
    """Structured Streaming ingest of code_files batches (API-surface demo:
    file source -> shingle+sign (the same vectorized UDFs work on streaming
    DataFrames) -> append sink). Candidate generation stays in the batch
    layer (incremental_update) because LSH self-joins across the full corpus
    are not a streaming-state-friendly operator."""
    stream = (
        spark.readStream.schema(
            "repo string, path string, commit string, lang string, content string"
        )
        .parquet(input_path)
    )
    signed = sign_files(
        shingle_files(
            stream.withColumn("file_id", F.xxhash64("repo", "path", "commit")),
            k=cfg.shingle_k,
        ).select("file_id", "content_sha", "n_tokens", "shingles", "counts"),
        cfg,
    )
    return (
        signed.writeStream.format("parquet")
        .option("checkpointLocation", checkpoint)
        .option("path", checkpoint + "_out")
        .trigger(availableNow=True)
    )
