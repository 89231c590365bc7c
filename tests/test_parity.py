"""Bit-level reference-parity tests (SURVEY.md 5.2 item 2).

The oracle is a clean-room Java program (written here, from the documented
algorithm -- NOT copied from the reference) compiled with the installed JDK:
java.util.Random interleaved nextInt draws, h = (a*x+b) % dict_size in long
math, empty set => Integer.MAX_VALUE, additive band accumulator mod buckets.
If our parity pipeline matches this oracle bit-for-bit AND the oracle
follows the same published semantics as the reference engine, signature-level
parity under a fixed seed is established.
"""

from __future__ import annotations

import shutil
import subprocess

import numpy as np
import pandas as pd
import pytest

from lsh_for_source_code_spark.functions.hashing import JavaRandom
from lsh_for_source_code_spark.functions.parity import (
    INT_MAX,
    java_minhash_coefficients,
    ordinal_vocabulary,
    parity_boolean_sets,
    parity_pipeline,
    reference_band_hash,
    reference_signature,
)
from lsh_for_source_code_spark.sources.reference_io import read_tokenfile

JAVA_ORACLE = r"""
import java.util.Random;
import java.io.BufferedReader;
import java.io.InputStreamReader;

public class ParityOracle {
    public static void main(String[] args) throws Exception {
        int sigSize = Integer.parseInt(args[0]);
        int dictSize = Integer.parseInt(args[1]);
        long seed = Long.parseLong(args[2]);
        int stages = Integer.parseInt(args[3]);
        int buckets = Integer.parseInt(args[4]);
        final long LARGE_PRIME = 433494437L;

        Random r = new Random(seed);
        long[][] coefs = new long[sigSize][2];
        for (int i = 0; i < sigSize; i++) {
            coefs[i][0] = r.nextInt(dictSize);
            coefs[i][1] = r.nextInt(dictSize);
        }

        BufferedReader br = new BufferedReader(new InputStreamReader(System.in));
        String line;
        while ((line = br.readLine()) != null) {
            line = line.trim();
            int[] sig = new int[sigSize];
            java.util.Arrays.fill(sig, Integer.MAX_VALUE);
            if (!line.isEmpty()) {
                for (String tok : line.split(" ")) {
                    int x = Integer.parseInt(tok);
                    for (int i = 0; i < sigSize; i++) {
                        int h = (int) ((coefs[i][0] * (long) x + coefs[i][1]) % dictSize);
                        if (h < sig[i]) sig[i] = h;
                    }
                }
            }
            int rows = sigSize / stages;
            int[] bands = new int[stages];
            for (int i = 0; i < sigSize; i++) {
                int st = Math.min(i / rows, stages - 1);
                bands[st] = (int) ((bands[st] + (long) sig[i] * LARGE_PRIME) % buckets);
            }
            StringBuilder sb = new StringBuilder();
            for (int v : sig) sb.append(v).append(" ");
            sb.append("|");
            for (int v : bands) sb.append(" ").append(v);
            System.out.println(sb);
        }
    }
}
"""

HAVE_JAVA = shutil.which("javac") is not None and shutil.which("java") is not None


def test_java_random_bit_parity_with_jdk(tmp_path):
    if not HAVE_JAVA:
        pytest.skip("jdk not available")
    src = tmp_path / "RandCheck.java"
    src.write_text(
        """
import java.util.Random;
public class RandCheck {
    public static void main(String[] a) {
        Random r = new Random(Long.parseLong(a[0]));
        for (int i = 0; i < 20; i++)
            System.out.println(r.nextInt(Integer.parseInt(a[1])));
    }
}
"""
    )
    subprocess.run(["javac", str(src)], cwd=tmp_path, check=True)
    for seed, bound in [(42, 4632), (0, 10), (123456789, 1 << 30)]:
        out = subprocess.run(
            ["java", "RandCheck", str(seed), str(bound)],
            cwd=tmp_path, capture_output=True, text=True, check=True,
        )
        expect = [int(x) for x in out.stdout.split()]
        r = JavaRandom(seed)
        assert [r.next_int(bound) for _ in range(20)] == expect


@pytest.fixture(scope="module")
def oracle_bin(tmp_path_factory):
    if not HAVE_JAVA:
        pytest.skip("jdk not available")
    d = tmp_path_factory.mktemp("oracle")
    (d / "ParityOracle.java").write_text(JAVA_ORACLE)
    subprocess.run(["javac", "ParityOracle.java"], cwd=d, check=True)
    return d


def _run_oracle(d, sets, sig_size, dict_size, seed, stages, buckets):
    inp = "\n".join(" ".join(str(i) for i in s) for s in sets)
    out = subprocess.run(
        ["java", "ParityOracle", str(sig_size), str(dict_size), str(seed),
         str(stages), str(buckets)],
        cwd=d, input=inp, capture_output=True, text=True, check=True,
    )
    sigs, bands = [], []
    for line in out.stdout.strip().splitlines():
        s, b = line.split("|")
        sigs.append([int(x) for x in s.split()])
        bands.append([int(x) for x in b.split()])
    return sigs, bands


def test_numpy_parity_matches_java_oracle(oracle_bin):
    rng = np.random.default_rng(5)
    dict_size, sig_size, seed, stages, buckets = 4632, 50, 42, 10, 10
    sets = [
        sorted(rng.choice(dict_size, size=n, replace=False).tolist())
        for n in [1, 5, 40, 200]
    ] + [[]]
    jsigs, jbands = _run_oracle(oracle_bin, sets, sig_size, dict_size, seed, stages, buckets)
    coefs = java_minhash_coefficients(sig_size, dict_size, seed)
    for s, jsig, jband in zip(sets, jsigs, jbands):
        psig = reference_signature(np.array(s, dtype=np.int64), coefs, dict_size)
        assert psig.tolist() == jsig
        assert reference_band_hash(psig, stages, buckets).tolist() == jband
    # empty set semantics
    assert reference_signature(np.array([], dtype=np.int64), coefs, dict_size).tolist() == [INT_MAX] * sig_size


TOKENFILE_LINES = [
    "0,100250001@#@import@@::@@6,update@@::@@1,main@@::@@7,String@@::@@6",
    "1,100250002@#@import@@::@@2,x@@::@@9,String@@::@@1",
    "2,100250003@#@rare@@::@@1",
    "3,100250004@#@import@@::@@8,main@@::@@6,x@@::@@6,extra@@::@@6",
]


@pytest.fixture(scope="module")
def tokenfile_df(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("tf") / "Tokenfile.txt"
    p.write_text("\n".join(TOKENFILE_LINES))
    return read_tokenfile(spark, str(p))


def test_ordinal_vocabulary_first_occurrence_order(spark, tokenfile_df):
    vocab = {r.token: r.token_id for r in ordinal_vocabulary(tokenfile_df).collect()}
    assert vocab == {
        "import": 0, "update": 1, "main": 2, "String": 3, "x": 4,
        "rare": 5, "extra": 6,
    }


def test_parity_boolean_sets_sparsity(spark, tokenfile_df):
    vocab = ordinal_vocabulary(tokenfile_df)
    sets = {
        r.fileid: list(r.ids)
        for r in parity_boolean_sets(tokenfile_df, vocab, sparsity=5).collect()
    }
    # freq > 5 survives: file0 import(6),main(7),String(6); file1 x(9);
    # file2 nothing; file3 import(8),main(6),x(6),extra(6)
    assert sets == {
        "100250001": [0, 2, 3],
        "100250002": [4],
        "100250003": [],
        "100250004": [0, 2, 4, 6],
    }


def test_parity_pipeline_matches_java_oracle_end_to_end(spark, tokenfile_df, oracle_bin):
    sparsity, stages, buckets, sig_size, seed = 5, 10, 10, 50, 42
    result = {
        r.fileid: (list(r.signature), list(r.band_hashes))
        for r in parity_pipeline(
            tokenfile_df, sparsity, stages, buckets, sig_size, seed
        ).collect()
    }
    sets_in_order = [
        [0, 2, 3],  # 100250001
        [4],        # 100250002
        [],         # 100250003
        [0, 2, 4, 6],  # 100250004
    ]
    dict_size = 7
    jsigs, jbands = _run_oracle(
        oracle_bin, sets_in_order, sig_size, dict_size, seed, stages, buckets
    )
    for fid, jsig, jband in zip(
        ["100250001", "100250002", "100250003", "100250004"], jsigs, jbands
    ):
        assert result[fid][0] == jsig, fid
        assert result[fid][1] == jband, fid


def test_parity_pipeline_band_hash_non_divisible_sig_size(spark, tokenfile_df, oracle_bin):
    """sig_size % stages != 0: remainder rows clamp into the LAST stage
    (LSH.java:56). ADVICE r1: the SQL band slice used to drop them."""
    sparsity, stages, buckets, sig_size, seed = 5, 10, 10, 53, 42
    result = {
        r.fileid: (list(r.signature), list(r.band_hashes))
        for r in parity_pipeline(
            tokenfile_df, sparsity, stages, buckets, sig_size, seed
        ).collect()
    }
    sets_in_order = [[0, 2, 3], [4], [], [0, 2, 4, 6]]
    dict_size = 7
    jsigs, jbands = _run_oracle(
        oracle_bin, sets_in_order, sig_size, dict_size, seed, stages, buckets
    )
    for fid, jsig, jband in zip(
        ["100250001", "100250002", "100250003", "100250004"], jsigs, jbands
    ):
        assert result[fid][0] == jsig, fid
        assert result[fid][1] == jband, fid
        # cross-check against the numpy reference implementation too
        assert (
            reference_band_hash(np.array(jsig, dtype=np.int64), stages, buckets).tolist()
            == jband
        ), fid
