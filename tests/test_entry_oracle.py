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


def _assert_driver_safe_schema(name, df):
    """The driver's correctness harness canonicalizes results by sorting /
    factorizing column values, which raises `TypeError: unhashable type:
    'list'` on array/map/struct cells -- exactly how media_features turned
    red in CORRECTNESS_r04 despite passing local stringifying checks. Every
    driver-visible query must project complex types down to scalars
    (per-element columns, concat_ws strings, or hashes)."""
    from pyspark.sql import types as T

    bad = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    assert not bad, f"{name}: driver-unsafe complex output columns {bad}"


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, duck, name):
    spark_res = entry_mod.queries()[name](spark, SF_DIR)
    _assert_driver_safe_schema(name, spark_res)
    spark_df = spark_res.toPandas()
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
    _assert_driver_safe_schema(name, df)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0


def test_embedding_ann_recall_vs_exact(spark):
    """ANN (multi-table hyperplane LSH + exact re-rank) vs the exact
    brute-force top-5 (VERDICT r1 next#6: measure ANN recall). The testdata
    embeddings are unstructured -- best neighbors sit at cos ~0.33-0.39,
    the hardest regime for angular LSH. Expected per-neighbor recall at
    b=4, L=8 is 1-(1-p^4)^8 ~ 0.62-0.72 for p = 1 - arccos(cos)/pi in
    [0.60, 0.63]; assert a floor under that band. The high-similarity
    production regime is covered by
    test_ann_planted_high_similarity_regime."""
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    exact = {
        (r.query_id, r.neighbor_id)
        for r in qs["embedding_topk"](spark, SF_DIR).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in qs["embedding_ann_lsh"](spark, SF_DIR).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"ANN recall@5 = {recall:.3f} ({len(exact)} exact pairs)"


def test_embedding_ivf_recall_vs_exact(spark):
    """IVF (coarse-quantize -> probe top-2 of ~17 cells -> exact re-rank)
    vs the exact brute-force top-5. Unstructured embeddings are also the
    hardest regime for IVF (true neighbors scatter across cells), so the
    floor is modest; the probed fraction is ~2/17 ~ 12% of the corpus, far
    below the ANN-LSH query's ~50% scan at similar recall."""
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    exact = {
        (r.query_id, r.neighbor_id)
        for r in qs["embedding_topk"](spark, SF_DIR).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in qs["embedding_ivf_topk"](spark, SF_DIR).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.2, f"IVF recall@5 = {recall:.3f} ({len(exact)} exact pairs)"


def test_ann_planted_high_similarity_regime(spark):
    """The 100 TB dedup regime: planted near-dup neighbors at cos >= 0.9.
    b=12-bit sketches x L=8 tables must find them with recall >= 0.9 while
    scanning a small corpus fraction (expected per-neighbor candidate
    recall 1-(1-p^12)^8 >= 0.97 at cos 0.92)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from lsh_for_source_code_spark.functions.ann import ann_topk

    rng = np.random.default_rng(11)
    n_base, dim = 400, 64
    base = rng.standard_normal((n_base, dim))
    # 10 queries: each gets a planted near-dup (small perturbation)
    queries = base[:10]
    noise = rng.standard_normal((10, dim)) * 0.12
    planted = queries + noise  # cos ~ 0.95
    vecs = np.vstack([base, planted])
    pdf = pd.DataFrame(
        {"vec_id": np.arange(len(vecs)), "v": [v.tolist() for v in vecs]}
    )
    emb = spark.createDataFrame(pdf).select(
        "vec_id", F.transform("v", lambda x: x.cast("double")).alias("v")
    )
    out = ann_topk(
        emb, F.col("vec_id") < 10, dim=dim, k=1, bits=12, tables=8
    ).collect()
    top1 = {r.query_id: r.neighbor_id for r in out}
    hits = sum(1 for q in range(10) if top1.get(q) == n_base + q)
    assert hits >= 9, f"planted-neighbor recall@1 = {hits}/10"


def test_simhash_table_path_equals_legacy_path(spark):
    """Manku C(m,t) block-combination tables (simhash_table_blocks=8) and
    the legacy 4x16-bit block path are both EXACT at hamming <= t, so the
    driver queries running them must emit identical pair sets (VERDICT r4
    next#5: the extreme-scale key design, driver-visible)."""
    qs = entry_mod.queries()
    legacy = {
        (r.id_a, r.id_b, r.hamming)
        for r in qs["simhash_hamming_pairs"](spark, SF_DIR).collect()
    }
    tables = {
        (r.id_a, r.id_b, r.hamming)
        for r in qs["simhash_hamming_pairs_tables"](spark, SF_DIR).collect()
    }
    assert legacy == tables and legacy


def test_containment_pipeline_finds_planted_fragments(spark):
    """The containment channel over real LSH survivors must (1) detect the
    planted substring fragments (id >= 10M) against their source docs while
    (2) every emitted pair sits BELOW the jaccard bar -- i.e. these are
    detections the jaccard channel cannot make (VERDICT r4 next#7)."""
    rows = entry_mod.queries()["containment_pipeline"](spark, SF_DIR).collect()
    assert rows, "planted fragments must be detected"
    assert all(r.lcs_containment >= 0.6 for r in rows)
    assert all(r.jaccard < 0.9 for r in rows)
    # every detection involves a planted fragment, and each fragment's own
    # source doc appears among its matches
    assert all(r.id_b >= 10_000_000 for r in rows)
    matched_sources = {
        r.id_b - 10_000_000 for r in rows if r.id_a == r.id_b - 10_000_000
    }
    assert len(matched_sources) >= 5


def test_pipeline_lineage_resume_and_fingerprints(spark):
    """north_rule "resumable from checkpoint with per-partition lineage +
    metrics", driver-visible: run 1 computes every stage, run 2 resumes
    every stage, and each stage's per-partition lineage fingerprint
    re-counts to exactly the stage's persisted row count."""
    rows = entry_mod.queries()["pipeline_lineage"](spark, SF_DIR).collect()
    assert len(rows) == 7
    assert [r.stage for r in rows][0] == "files_shingled"
    assert all(r.run1_action == "computed" for r in rows), rows
    assert all(r.run2_action == "resumed" for r in rows), rows
    assert all(r.lineage_rows == r.rows for r in rows), rows
    assert all(r.lineage_parts >= 1 for r in rows)


def test_bloom_one_sided_error_per_gram(duck):
    """Bloom contract at the PER-GRAM level (the per-doc counts in the
    query only imply it in aggregate): every trigram in the base vocabulary
    must be bloom-seen -- a Bloom filter has false positives, never false
    negatives. Runs on the oracle side; test_query_matches_oracle proves
    the Spark side value-identical, so the contract transfers."""
    from lsh_for_source_code_spark import entry_queries as eq

    sql = eq.ORACLE["bloom_novelty"]
    probe = sql[: sql.rindex("SELECT")] + (
        """
        SELECT count(*) AS false_negs
        FROM delta_toks t
        JOIN base_vocab v USING (tok)
        LEFT JOIN bloom_seen b ON t.doc_id = b.doc_id AND t.tok = b.tok
        WHERE b.tok IS NULL
        """
    )
    assert duck.execute(probe).fetchone()[0] == 0
    # and the FP path is actually exercised at this corpus (non-degenerate)
    df = duck.execute(sql).df()
    assert (df.n_seen_bloom >= df.n_seen_exact).all()
    assert df.n_grams.sum() > df.n_seen_exact.sum(), "no novelty probed"


def test_kmeans_inertia_non_increasing(duck):
    """Lloyd's guarantee: mean squared distance to the assigned centroid
    can only go down across iterations. Checked through the SAME generated
    oracle SQL the cross-engine test uses (iters=1 vs the shipped
    _KMEANS_ITERS), so it certifies the unrolled update logic itself."""
    from lsh_for_source_code_spark import entry_queries as eq

    means = [
        duck.execute(eq._kmeans_oracle_sql(i)).df().d2.mean()
        for i in (1, eq._KMEANS_ITERS)
    ]
    assert means[1] <= means[0] + 1e-9, means


def test_ivf_with_kmeans_trained_centroids(spark):
    """Closes the loop the IVF/semdedup docstrings promise: kmeans_cells IS
    the trainer, and the trained centroids drop into the IDENTICAL IVF
    probe plan (_ivf_topk) with no plumbing changes. Asserts the trained
    path still clears the recall floor of the sample-centroid path and
    returns full top-5 rows for every query vector."""
    from pyspark.sql import functions as F

    from lsh_for_source_code_spark import entry_queries as eq

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    cents = emb.filter(F.col("vec_id") % 31 == 0).select(
        F.col("vec_id").alias("cell_id"), F.col("v").alias("cv")
    )
    for _ in range(eq._KMEANS_ITERS - 1):
        cents = eq._kmeans_update(eq._kmeans_assign(emb, cents))
    trained = eq._ivf_topk(emb, cents).toPandas()
    exact = {
        (r.query_id, r.neighbor_id)
        for r in entry_mod.queries()["embedding_topk"](spark, SF_DIR).collect()
    }
    approx = set(zip(trained.query_id, trained.neighbor_id))
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.2, f"trained-centroid IVF recall@5 = {recall:.3f}"
    assert trained.groupby("query_id").size().eq(5).all()
