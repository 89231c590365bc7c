"""Full driver-contract emulation at sf0.01 (the driver's CORRECTNESS scale).

Every `queries()` entry runs on Spark; every `oracle_sql()` entry runs on
DuckDB; rows/cols/values are compared the way tests/test_entry_oracle.py
does. Additionally, every result (including rows-only queries) is screened
for DRIVER-UNSAFE columns: the real driver canonicalizes by sorting /
factorizing column values, which raises `TypeError: unhashable type: 'list'`
on array-typed cells (this is exactly how `media_features` turned red in
CORRECTNESS_r04 despite passing the stringifying local test). Usage:

    python scripts/driver_emulation.py [sf_dir] [only_query ...]
"""
import math
import sys
import time

sys.path.insert(0, "/root/repo")
import duckdb  # noqa: E402

import __spark_entry__ as e  # noqa: E402
from lsh_for_source_code_spark.session import get_spark  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

spark = get_spark(master="local[8]", shuffle_partitions=8)
con = duckdb.connect()
for t in TABLES:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
    )


def driver_unsafe_cols(df) -> list:
    """Columns whose values would break the driver's sort/factorize
    canonicalizer (unhashable: list / ndarray / dict cells)."""
    bad = []
    for c in df.columns:
        head = df[c].head(50)
        if any(isinstance(v, (list, dict)) or type(v).__name__ == "ndarray"
               for v in head):
            bad.append(c)
    return bad


def normalize(df):
    cols = sorted(df.columns)
    df = df[cols]
    rows = set()
    for tup in df.itertuples(index=False, name=None):
        norm = []
        for v in tup:
            if isinstance(v, float):
                norm.append("nan" if math.isnan(v) else f"{v:.6g}")
            elif isinstance(v, bool):
                norm.append(str(bool(v)))
            elif v is None:
                norm.append("null")
            else:
                norm.append(str(v))
        rows.add(tuple(norm))
    return cols, rows


Q, O = e.queries(), e.oracle_sql()
bad = 0
for name in sorted(Q):
    if ONLY and name not in ONLY:
        continue
    t0 = time.monotonic()
    try:
        sdf = Q[name](spark, SF).toPandas()
    except Exception as ex:
        print(f"{name}: SPARK ERROR {type(ex).__name__}: {ex}"[:300])
        bad += 1
        continue
    unsafe = driver_unsafe_cols(sdf)
    if unsafe:
        print(f"{name}: DRIVER-UNSAFE columns {unsafe} (unhashable cells)")
        bad += 1
        continue
    if name not in O:
        print(f"{name}: rows-only, {len(sdf)} rows ok ({time.monotonic()-t0:.1f}s)")
        continue
    try:
        ddf = con.execute(O[name]).df()
    except Exception as ex:
        print(f"{name}: ORACLE ERROR {type(ex).__name__}: {ex}"[:300])
        bad += 1
        continue
    sc, sr = normalize(sdf)
    dc, dr = normalize(ddf)
    ok = sc == dc and sr == dr and len(sdf) == len(ddf)
    print(f"{name}: {'OK' if ok else 'MISMATCH'} {len(sdf)}/{len(ddf)} ({time.monotonic()-t0:.1f}s)")
    if not ok:
        bad += 1
        if sc != dc:
            print("  cols:", sc, dc)
        print("  spark-only:", list(sr - dr)[:3])
        print("  duck-only:", list(dr - sr)[:3])
print("BAD:", bad)
