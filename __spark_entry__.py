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
import zipfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

from lsh_for_source_code_spark.entry_queries import ORACLE, QUERIES  # noqa: E402

_PKG = "lsh_for_source_code_spark"


def _package_zip() -> str:
    import hashlib
    import tempfile

    src = os.path.join(_REPO, _PKG)
    tag = hashlib.sha256(_REPO.encode()).hexdigest()[:12]
    path = os.path.join(tempfile.gettempdir(), f"{_PKG}-{tag}.zip")
    with zipfile.ZipFile(path, "w") as zf:
        for root, _dirs, files in os.walk(src):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, _REPO))
    return path


def _ship(spark: SparkSession) -> SparkSession:
    """Make the package importable on executor Python workers, once per
    session (idempotent; addPyFile dedups by filename)."""
    sc = spark.sparkContext
    if not getattr(sc, "_lsh_pkg_shipped", False):
        try:
            sc.addPyFile(_package_zip())
        except Exception:
            pass  # e.g. same file already registered
        sc._lsh_pkg_shipped = True
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: LSH near-duplicate pairs on /root/testdata/sf0.001."""
    return QUERIES["near_dup_pairs"](_ship(spark), "/root/testdata/sf0.001")


def _wrap(fn):
    def runner(spark: SparkSession, sf_dir: str) -> DataFrame:
        return fn(_ship(spark), sf_dir)

    runner.__name__ = fn.__name__
    runner.__doc__ = fn.__doc__
    return runner


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE)
