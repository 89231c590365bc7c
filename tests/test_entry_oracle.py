"""Driver-contract emulation (SURVEY.md 5.2 item 4): run every
__spark_entry__ query on the testdata and compare against its DuckDB oracle
-- row count, column names, and order-insensitive values -- exactly as the
driver's correctness gate does at sf=0.01 (we use sf0.001 for speed; the
semantics are scale-free)."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("ENTRY_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _normalize(df):
    cols = sorted(df.columns)
    df = df[cols]
    rows = set()
    for tup in df.itertuples(index=False, name=None):
        norm = []
        for v in tup:
            if isinstance(v, float):
                if math.isnan(v):
                    norm.append("nan")
                else:
                    norm.append(f"{v:.6g}")
            elif isinstance(v, bool):
                norm.append(str(bool(v)))
            elif v is None:
                norm.append("null")
            else:
                norm.append(str(v))
        rows.add(tuple(norm))
    return cols, rows


ORACLE_NAMES = sorted(entry_mod.oracle_sql().keys())
ALL_NAMES = sorted(entry_mod.queries().keys())


def test_every_oracle_key_has_a_query():
    assert set(ORACLE_NAMES) <= set(ALL_NAMES)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, duck, name):
    spark_df = entry_mod.queries()[name](spark, SF_DIR).toPandas()
    duck_df = duck.execute(entry_mod.oracle_sql()[name]).df()
    s_cols, s_rows = _normalize(spark_df)
    d_cols, d_rows = _normalize(duck_df)
    assert s_cols == d_cols, f"{name}: column mismatch {s_cols} vs {d_cols}"
    assert len(spark_df) == len(duck_df), (
        f"{name}: row count {len(spark_df)} vs {len(duck_df)}"
    )
    only_s = list(s_rows - d_rows)[:5]
    only_d = list(d_rows - s_rows)[:5]
    assert s_rows == d_rows, f"{name}: spark-only={only_s} duck-only={only_d}"


@pytest.mark.parametrize(
    "name", sorted(set(ALL_NAMES) - set(ORACLE_NAMES))
)
def test_rows_only_queries_run(spark, name):
    df = entry_mod.queries()[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
