"""End-to-end dedup pipeline S1..S7 with resumable parquet checkpoints.

Stage graph (SURVEY.md 7.1); each stage is a pure DataFrame -> DataFrame
function so Catalyst sees one declarative plan per stage. In production the
checkpoint store is an Iceberg catalog (snapshot-diff resume); the sandbox
has no Iceberg runtime jars, so `CheckpointStore` is a parquet-directory
implementation of the same contract (atomic via _SUCCESS markers, stage
skipped when already materialized).

Exact-dup short-circuit (S2): only one representative per content_sha is
signed/banded/verified -- guarantees Type-1 recall 1.0 (the reference's 100%
CSV is exactly sha-equal pairs) and collapses boilerplate mega groups before
they ever reach the LSH shuffle.
"""

from __future__ import annotations

import os
import time

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession, functions as F

from lsh_for_source_code_spark.config import PipelineConfig
from lsh_for_source_code_spark.functions.minhash import sign_files
from lsh_for_source_code_spark.functions.tokenize import shingle_files
from lsh_for_source_code_spark.operators.banding import band_files
from lsh_for_source_code_spark.operators.candidates import candidate_pairs
from lsh_for_source_code_spark.operators.components import connected_components
from lsh_for_source_code_spark.operators.verify import verify_pairs


class CheckpointStore:
    """Parquet-directory checkpoint store (Iceberg stand-in, same contract).

    With a root, every computed stage also writes a per-partition lineage
    fingerprint (`<stage>__partitions`: partition_id, rows, bytes_est) and
    records an event in the run's `RunMetrics` ledger (north_rule:
    per-partition lineage + metrics)."""

    def __init__(
        self,
        spark: SparkSession,
        root: str | None,
        metrics=None,
        lineage: bool = True,
    ):
        from lsh_for_source_code_spark.plans.metrics import RunMetrics

        self.spark = spark
        self.root = root
        self.metrics = metrics or RunMetrics()
        self.lineage = lineage and bool(root)
        self.log: list[dict] = []

    def _path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def has(self, name: str) -> bool:
        return bool(self.root) and os.path.exists(
            os.path.join(self._path(name), "_SUCCESS")
        )

    def _table_name(self, name: str) -> str:
        import hashlib

        h = hashlib.md5(self.root.encode()).hexdigest()[:10]
        return f"ckpt_{h}_{name}"

    def _bucket_marker_path(self, name: str) -> str:
        return os.path.join(self._path(name), "_BUCKET_SPEC.json")

    def _write_bucket_marker(self, name: str, bucket: tuple) -> None:
        """Persist the bucket layout (cols, n) next to _SUCCESS. Registering
        a bucketed table over parquet asserts a hash partitioning Spark then
        TRUSTS without checking -- if a resume's requested spec differs from
        what the files were actually written with, downstream joins would
        silently skip a required Exchange and produce wrong results (ADVICE
        r4). The marker makes the layout self-describing so resume can
        validate instead of trusting the caller's current config."""
        import json

        cols, n = bucket
        with open(self._bucket_marker_path(name), "w") as f:
            json.dump({"cols": list(cols), "buckets": int(n)}, f)

    def _read_bucket_marker(self, name: str) -> tuple | None:
        import json

        p = self._bucket_marker_path(name)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            d = json.load(f)
        return (tuple(d["cols"]), int(d["buckets"]))

    def _register_bucketed(self, name: str, bucket: tuple) -> str:
        """(Re-)register the external bucketed table over an existing
        checkpoint directory -- bucket METADATA lives in the session
        catalog, so a resume from a fresh session must rebuild it before
        the scan can report its hash partitioning."""
        cols, n = bucket
        tbl = self._table_name(name)
        if not self.spark.catalog.tableExists(tbl):
            schema = self.spark.read.parquet(self._path(name)).schema
            ddl = ", ".join(
                f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields
            )
            self.spark.sql(
                f"CREATE TABLE {tbl} ({ddl}) USING PARQUET "
                f"CLUSTERED BY ({', '.join(cols)}) INTO {int(n)} BUCKETS "
                f"LOCATION '{self._path(name)}'"
            )
        return tbl

    def materialize(
        self, name: str, df: DataFrame, bucket: tuple | None = None
    ) -> DataFrame:
        """Write-once + read-back; stage output becomes a scan (lineage cut,
        resume point). Without a root, stages are persisted instead so
        multi-consumer stages (shingled feeds S2 + the verify join; verified
        feeds the cluster edges and metrics) compute once, not per action.

        `bucket=((col, ...), n)` writes the stage `bucketBy(n, cols)` as an
        external datasource table: downstream equi-joins on the bucket
        columns read it pre-hash-partitioned and skip their Exchange (see
        PipelineConfig.checkpoint_buckets)."""
        if not self.root:
            from lsh_for_source_code_spark.caching import track

            return track(df.persist(StorageLevel.MEMORY_AND_DISK))
        t0 = time.monotonic()
        if not self.has(name):
            if bucket is not None:
                cols, n = bucket
                tbl = self._table_name(name)
                if self.spark.catalog.tableExists(tbl):
                    self.spark.sql(f"DROP TABLE {tbl}")
                (
                    # repartition on the bucket key first so each write task
                    # owns exactly one bucket -- without it every task
                    # sprays a file into all n buckets (n x file-count
                    # write amplification, measured 1.3-1.7x slower
                    # single-box at n=128)
                    df.repartition(int(n), *[F.col(c) for c in cols])
                    .write.mode("overwrite")
                    .option("path", self._path(name))
                    .bucketBy(int(n), *cols)
                    .saveAsTable(tbl)
                )
                self._write_bucket_marker(name, bucket)
                out = self.spark.table(tbl)
            else:
                df.write.mode("overwrite").parquet(self._path(name))
                out = self.spark.read.parquet(self._path(name))
            if self.lineage:
                from lsh_for_source_code_spark.plans.metrics import partition_stats

                pstats = partition_stats(out)
                pstats.write.mode("overwrite").parquet(self._path(name + "__partitions"))
                rows = int(
                    self.spark.read.parquet(self._path(name + "__partitions"))
                    .groupBy()
                    .sum("rows")
                    .first()[0]
                    or 0
                )
            else:
                rows = None
            wall = time.monotonic() - t0
            self.log.append({"stage": name, "action": "computed", "wall_s": wall})
            self.metrics.record(name, "computed", rows=rows, wall_s=round(wall, 3))
            return out
        if bucket is not None:
            cols, n = bucket
            stored = self._read_bucket_marker(name)
            if stored != (tuple(cols), int(n)):
                # checkpoint was written unbucketed (no marker) or with a
                # different layout than this run requests: a plain parquet
                # scan is always correct (it just shuffles); registering the
                # mismatched spec would silently corrupt downstream joins
                self.log.append(
                    {
                        "stage": name,
                        "action": "resumed_unbucketed",
                        "wall_s": 0.0,
                        "requested": [list(cols), int(n)],
                        "stored": None if stored is None else [
                            list(stored[0]), stored[1]
                        ],
                    }
                )
                self.metrics.record(name, "resumed_unbucketed")
                return self.spark.read.parquet(self._path(name))
            self.log.append({"stage": name, "action": "resumed", "wall_s": 0.0})
            self.metrics.record(name, "resumed")
            return self.spark.table(self._register_bucketed(name, bucket))
        self.log.append({"stage": name, "action": "resumed", "wall_s": 0.0})
        self.metrics.record(name, "resumed")
        return self.spark.read.parquet(self._path(name))

    def finish(self):
        if self.root:
            self.metrics.write(self.spark, self.root)


def with_file_id(
    code_files: DataFrame,
    check_collisions: bool = False,
    id_expr=None,
) -> DataFrame:
    """Stable 64-bit id from the natural key (input_hint columns).

    64-bit ids birthday-collide with near certainty at ~2^32 distinct keys
    (ADVICE r1); a production run at 10^12 files must either switch to a
    128-bit key (sha2 split into two longs) or run the collision audit:
    `check_collisions=True` compares count(distinct natural key) against
    count(distinct file_id) in ONE aggregate job and raises on mismatch.
    The audit scans only the three key columns (columnar pruning -- content
    never moves), so its cost is a small fraction of any real run;
    `run_pipeline` runs it by default (cfg.check_id_collisions).

    `id_expr` overrides the id column (tests force collisions with it; a
    128-bit-per-half strategy would pass e.g. one sha2 half here)."""
    out = code_files.withColumn(
        "file_id",
        F.xxhash64("repo", "path", "commit") if id_expr is None else id_expr,
    )
    if check_collisions:
        row = out.agg(
            F.countDistinct("repo", "path", "commit").alias("nk"),
            F.countDistinct("file_id").alias("ni"),
        ).first()
        if row.nk != row.ni:
            raise RuntimeError(
                f"file_id collision: {row.nk} natural keys -> {row.ni} ids; "
                "switch to a 128-bit id for this corpus"
            )
    return out


def run_pipeline(
    spark: SparkSession,
    code_files: DataFrame,
    cfg: PipelineConfig,
    checkpoint_dir: str | None = None,
    with_containment: bool = False,
) -> dict[str, DataFrame]:
    from lsh_for_source_code_spark.plans.metrics import RunMetrics

    store = CheckpointStore(
        spark, checkpoint_dir, metrics=RunMetrics(config_id=cfg.config_id)
    )

    ids = with_file_id(code_files, check_collisions=cfg.check_id_collisions)

    # S1: shingle + sha. `content` is dropped immediately after -- at 100 TB
    # the content column dominates bytes; nothing downstream reads it except
    # the optional containment channel (which re-joins a tiny pair set).
    shingled = store.materialize(
        "files_shingled",
        shingle_files(ids, k=cfg.shingle_k, min_freq=cfg.min_token_freq).select(
            "file_id", "content_sha", "n_tokens", "shingles", "counts"
        ),
        bucket=(
            (("file_id",), cfg.checkpoint_buckets)
            if cfg.checkpoint_buckets and checkpoint_dir
            else None
        ),
    )

    # S2: exact-dup short-circuit. reps carry min(file_id) per content_sha.
    sha_groups = shingled.groupBy("content_sha").agg(
        F.min("file_id").alias("rep_id"), F.count("*").alias("sha_count")
    )
    membership = shingled.select("file_id", "content_sha").join(
        sha_groups, "content_sha"
    )
    exact_edges = store.materialize(
        "exact_dup_edges",
        membership.filter(F.col("file_id") != F.col("rep_id")).select(
            F.col("rep_id").alias("id_a"), F.col("file_id").alias("id_b")
        ),
    )
    reps = shingled.join(
        sha_groups.select(F.col("rep_id").alias("file_id")), "file_id"
    )

    # S3: signatures for distinct contents only.
    signed = store.materialize("signatures", sign_files(reps, cfg))

    # S4/S5: banding + skew-capped candidates.
    bands = store.materialize("bands", band_files(signed, cfg))
    cands = store.materialize(
        "candidate_pairs", candidate_pairs(bands, cfg, signed=signed)
    )

    # S6: exact verification (optionally signature-pregated, see
    # cfg.verify_pregate_margin -- kept pairs are still exact-jaccard).
    verified = store.materialize(
        "verified_pairs", verify_pairs(cands, shingled, cfg, signed=signed)
    )
    if with_containment:
        from lsh_for_source_code_spark.operators.verify import add_lcs_containment

        loose = verify_pairs(cands, shingled, cfg, keep_all=True).filter(
            F.col("jaccard") < cfg.jaccard_threshold
        )
        if cfg.overlap_threshold is not None:
            loose = loose.filter(F.col("overlap") < cfg.overlap_threshold)
        contain = add_lcs_containment(
            loose, ids, min_containment=cfg.containment_threshold
        ).filter(F.col("lcs_containment") >= cfg.containment_threshold)
        verified = verified.unionByName(
            contain.select("id_a", "id_b", "jaccard", "overlap", "n_shared_bands"),
            allowMissingColumns=True,
        )

    # S7: clusters over verified similarity edges + exact-dup edges, covering
    # every file (singletons included).
    edges = verified.select("id_a", "id_b").unionByName(
        exact_edges.select("id_a", "id_b")
    )
    clusters = store.materialize(
        "clusters",
        connected_components(edges, nodes=shingled.select("file_id")),
    )
    store.finish()

    return {
        "files_shingled": shingled,
        "exact_dup_edges": exact_edges,
        "signatures": signed,
        "bands": bands,
        "candidate_pairs": cands,
        "verified_pairs": verified,
        "clusters": clusters,
        "_store": store,
    }
