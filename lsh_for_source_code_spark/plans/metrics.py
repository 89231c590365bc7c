"""Per-stage / per-partition run metrics and lineage (north_rule: "resumable
from checkpoint with per-partition lineage and metrics").

Two collection paths:

* `partition_stats(df)` -- a mapInPandas pass that emits one row per input
  partition (partition_id, rows, bytes_est) without collecting data to the
  driver; used as the lineage fingerprint of every checkpointed stage.
* `RunMetrics` -- driver-side stage ledger (stage name, action, wall time,
  row count, config id, run id) written as a parquet table next to the
  checkpoints. The reference has no metrics at all (SURVEY.md 5.1); its
  only observable is the bucket-count trailer, which our bucket_occupancy
  report supersedes.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

PARTITION_STATS_SCHEMA = StructType(
    [
        StructField("partition_id", IntegerType(), False),
        StructField("rows", LongType(), False),
        StructField("bytes_est", LongType(), False),
    ]
)


def partition_stats(df: DataFrame) -> DataFrame:
    """One row per partition: (partition_id, rows, bytes_est). Distributed;
    bytes_est is the pandas deep memory usage of the Arrow batches."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        rows = 0
        nbytes = 0
        for pdf in batches:
            rows += len(pdf)
            nbytes += int(pdf.memory_usage(deep=True).sum())
        yield pd.DataFrame(
            {"partition_id": [pid], "rows": [rows], "bytes_est": [nbytes]}
        )

    return df.mapInPandas(stats, schema=PARTITION_STATS_SCHEMA)


class RunMetrics:
    """Driver-side ledger of stage events; cheap (bounded rows) and written
    once at the end of a run."""

    def __init__(self, run_id: str | None = None, config_id: str = ""):
        self.run_id = run_id or uuid.uuid4().hex[:16]
        self.config_id = config_id
        self.events: list[dict] = []
        self._t0 = time.monotonic()

    def record(self, stage: str, action: str, rows: int | None = None, **extra):
        self.events.append(
            {
                "run_id": self.run_id,
                "config_id": self.config_id,
                "stage": stage,
                "action": action,
                "rows": -1 if rows is None else int(rows),
                "t_offset_s": round(time.monotonic() - self._t0, 3),
                "extra": json.dumps(extra, sort_keys=True) if extra else "",
            }
        )

    def to_df(self, spark: SparkSession) -> DataFrame:
        return spark.createDataFrame(pd.DataFrame(self.events))

    def write(self, spark: SparkSession, root: str):
        path = os.path.join(root, "stage_metrics")
        self.to_df(spark).write.mode("append").parquet(path)
        return path
