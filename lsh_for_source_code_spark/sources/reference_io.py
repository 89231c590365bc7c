"""Readers/writers for the reference's on-disk formats (parity surface).

Formats contracted by /root/reference/ReadMe.txt:4-19:

* Tokenfile: ``"<seq>,<fileid>@#@tok@@::@@freq,tok@@::@@freq,..."`` -- one
  line per file (the reference's O1 scan, Main.java:19-47).
* Fileid:    ``"<seq>,<fileid>,<path>"`` (Fileid.txt; the reference re-scans
  this per output row, LocSenHash.java:111-131 -- we load it once as a
  broadcastable dimension DataFrame).
* HashOutput golden format: header, blanks, ``"<path> : [h0 h1 ... ]"`` per
  file, bucket-count trailer (shape of
  OutputfileofLSH_with_stages_10_and_bucket_10/HashOutput.txt).

All parsing is declarative (split/regexp on DataFrame columns) so Catalyst
pipelines it with downstream stages; no Python in the scan path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

TOK_SEP = "@#@"
FREQ_SEP = "@@::@@"


def read_tokenfile(spark: SparkSession, path: str) -> DataFrame:
    """Tokenfile -> (seq int, fileid string, tokens array<string>,
    freqs array<int>). Token/freq pairs stay positional-parallel."""
    raw = spark.read.text(path)
    head = F.split(F.col("value"), TOK_SEP).getItem(0)
    body = F.split(F.col("value"), TOK_SEP).getItem(1)
    pairs = F.split(body, ",")
    return raw.select(
        F.split(head, ",").getItem(0).cast("int").alias("seq"),
        F.split(head, ",").getItem(1).alias("fileid"),
        F.transform(pairs, lambda p: F.split(p, FREQ_SEP).getItem(0)).alias("tokens"),
        F.transform(pairs, lambda p: F.split(p, FREQ_SEP).getItem(1).cast("int")).alias(
            "freqs"
        ),
    )


def read_fileid(spark: SparkSession, path: str) -> DataFrame:
    """Fileid.txt -> (seq int, fileid string, path string). Paths may contain
    commas-free windows paths per the committed fixture; split limit 3 keeps
    any stray commas inside the path intact."""
    raw = spark.read.text(path)
    parts = F.split(F.col("value"), ",", 3)
    return raw.select(
        parts.getItem(0).cast("int").alias("seq"),
        parts.getItem(1).alias("fileid"),
        parts.getItem(2).alias("path"),
    )


def tokenfile_to_shingled(tokenfile: DataFrame, sparsity: int = 0) -> DataFrame:
    """Adapt a parsed Tokenfile to the pipeline's files_shingled schema:
    (file_id long, n_tokens int, shingles array<long>, counts array<int>).

    Token identity is hashed per-token with xxhash64 (JVM-side) -- the
    Spark-first replacement for the reference's global ordinal vocabulary
    (Main.java:36-41). The sparsity predicate keeps freq > sparsity
    (Main.java:99-104 semantics).
    """
    zipped = F.arrays_zip(
        F.transform("tokens", lambda t: F.xxhash64(t)).alias("h"), F.col("freqs")
    )
    kept = F.filter(zipped, lambda z: z.getField("freqs") > F.lit(sparsity))
    return tokenfile.select(
        F.xxhash64("fileid").alias("file_id"),
        F.col("fileid"),
        F.aggregate(
            "freqs", F.lit(0), lambda acc, x: acc + F.coalesce(x, F.lit(0))
        ).alias("n_tokens"),
        F.transform(kept, lambda z: z.getField("h")).alias("shingles"),
        F.transform(kept, lambda z: z.getField("freqs")).alias("counts"),
    )


def corpus_to_tokenfile_lines(shingled_tokens: DataFrame) -> DataFrame:
    """Inverse writer: (seq, fileid, tokens, freqs) -> Tokenfile text lines
    (round-trip/parity fixture generation)."""
    pair = F.transform(
        F.arrays_zip("tokens", "freqs"),
        lambda z: F.concat_ws(FREQ_SEP, z.getField("tokens"), z.getField("freqs").cast("string")),
    )
    return shingled_tokens.select(
        F.concat_ws(
            TOK_SEP,
            F.concat_ws(",", F.col("seq").cast("string"), F.col("fileid")),
            F.array_join(pair, ","),
        ).alias("value")
    )


def golden_output_lines(
    per_file: DataFrame, bucket_counts: DataFrame, stages: int, buckets: int
) -> list[str]:
    """Render the HashOutput golden format. per_file: (path, band_hashes
    array<long>) ordered by seq; bucket_counts: (band_id, band_hash, count).
    Driver-side (bounded: one line per file + stages x buckets trailer);
    kept only for parity tests at reference scale."""
    header = [
        f"LSH output: stages={stages} buckets={buckets}",
        "",
        "",
    ]
    body = [
        f"{r.path} : [{' '.join(str(h) for h in r.band_hashes)} ]"
        for r in per_file.collect()
    ]
    counts = {(r.band_id, r.band_hash): r["count"] for r in bucket_counts.collect()}
    trailer = [""]
    for s in range(stages):
        trailer.append(
            " ".join(str(counts.get((s, b), 0)) for b in range(buckets))
        )
    return header + body + trailer
