#!/usr/bin/env python3
"""r06: A/B the sound prefix filter (verify_sound_prefix_t) on the flagship
theta=0.9 queries at sf0.1 -- same process, interleaved, identical output
asserted (count + pair checksum + rounded-jaccard sum).
"""
from __future__ import annotations

import dataclasses
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F

import __spark_entry__  # noqa: F401  (registers nothing, but mirrors driver)
import lsh_for_source_code_spark.entry_queries as eq
from lsh_for_source_code_spark.caching import release_all
from lsh_for_source_code_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
TS = [int(x) for x in sys.argv[1:]] or [0, 8, 16, 32]

spark = get_spark(master=f"local[{CPUS}]", shuffle_partitions=32)
BASE_CFG = eq.FLAGSHIP_CFG


def run(tag: str, t: int):
    eq.FLAGSHIP_CFG = dataclasses.replace(BASE_CFG, verify_sound_prefix_t=t or None)
    try:
        spark.sparkContext.setJobDescription(f"flagship:{tag}")
        t0 = time.monotonic()
        out = eq.q_near_dup_pairs(spark, SF)
        row = out.agg(
            F.count("*").alias("n"),
            F.sum(F.xxhash64("id_a", "id_b")).alias("chk"),
            F.sum("jaccard").alias("jsum"),
        ).first()
        w = round(time.monotonic() - t0, 2)
        print(f"{tag}: {w}s n={row.n} chk={row.chk} jsum={row.jsum}", flush=True)
        return w, (row.n, row.chk, row.jsum)
    finally:
        eq.FLAGSHIP_CFG = BASE_CFG
        release_all()


# warm: one full pass (codegen/JIT) before measuring
run("warm", 0)
walls, sigs = {}, {}
for rep in range(3):
    for t in TS:
        tag = f"T{t}" if t else "off"
        w, sig = run(f"{tag}.r{rep}", t)
        walls.setdefault(tag, []).append(w)
        sigs.setdefault(tag, sig)
        assert sig == sigs["off"], f"OUTPUT MISMATCH {tag}: {sig} vs {sigs['off']}"
print("RESULT", walls)
