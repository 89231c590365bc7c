"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -- flagship LSH near-dup query on sf0.001.
queries()     -- operator roster (SURVEY.md 2) over the testdata tables.
oracle_sql()  -- DuckDB oracles for the SQL-expressible subset; pipeline
                 stages whose semantics are UDF-defined (minhash/simhash/
                 band internals, ANN bucketing) are rows-only here and carry
                 numpy oracles in tests/ instead.

The package is shipped to executor Python workers via addPyFile (the
spark-submit --py-files path in production), so this module works no matter
what cwd/session the driver uses.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)

from lsh_for_source_code_spark.entry_queries import ORACLE, QUERIES  # noqa: E402
from lsh_for_source_code_spark.shipping import (  # noqa: E402
    ensure_shipped,
    export_pythonpath,
)

export_pythonpath()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: LSH near-duplicate pairs on /root/testdata/sf0.001."""
    ensure_shipped(spark)
    return QUERIES["near_dup_pairs"](spark, "/root/testdata/sf0.001")


def _wrap(fn):
    def runner(spark: SparkSession, sf_dir: str) -> DataFrame:
        ensure_shipped(spark)
        return fn(spark, sf_dir)

    runner.__name__ = fn.__name__
    runner.__doc__ = fn.__doc__
    return runner


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE)
