"""Numpy-oracle tests for the hashing core (SURVEY.md 5.2 item 1-2)."""

from __future__ import annotations

import numpy as np

from lsh_for_source_code_spark.config import MERSENNE_61
from lsh_for_source_code_spark.functions.hashing import (
    EMPTY_SIG,
    JavaRandom,
    hash_strings,
    kgram_ids,
    minhash_coefficients,
    minhash_concat,
    simhash_concat,
    splitmix64,
)


def naive_minhash(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Reference-semantics scalar oracle: sig[i] = min_x (a_i*x + b_i) mod P
    (MinHash.java:195-226 with P instead of dict_size), full 64-bit x in
    exact Python big-int arithmetic."""
    P = MERSENNE_61
    out = np.full(len(a), EMPTY_SIG, dtype=np.uint64)
    for i in range(len(a)):
        best = None
        for x in shingles:
            v = (int(a[i]) * int(x) + int(b[i])) % P
            best = v if best is None else min(best, v)
        if best is not None:
            out[i] = best
    return out


def test_splitmix_deterministic():
    x = np.arange(10, dtype=np.uint64)
    assert np.array_equal(splitmix64(x), splitmix64(x))
    assert len(np.unique(splitmix64(np.arange(10000, dtype=np.uint64)))) == 10000


def test_hash_strings_stable_and_distinct():
    h1 = hash_strings(["foo", "bar", "foo2"])
    h2 = hash_strings(["foo", "bar", "foo2"])
    assert np.array_equal(h1, h2)
    assert len(set(h1.tolist())) == 3


def test_kgram_basic():
    t = np.array([1, 2, 3, 4, 5], dtype=np.uint64)
    assert np.array_equal(kgram_ids(t, 1), t)
    g3 = kgram_ids(t, 3)
    assert len(g3) == 3
    # order sensitivity
    g3r = kgram_ids(t[::-1].copy(), 3)
    assert not np.array_equal(g3, g3r)
    assert len(kgram_ids(np.array([1], dtype=np.uint64), 3)) == 0


def test_minhash_concat_matches_naive_oracle():
    rng = np.random.default_rng(0)
    a, b = minhash_coefficients(16, seed=99)
    docs = [
        rng.integers(0, 1 << 63, size=n, dtype=np.uint64)
        for n in [5, 0, 1, 37, 200]
    ]
    offsets = np.zeros(len(docs) + 1, dtype=np.int64)
    np.cumsum([len(d) for d in docs], out=offsets[1:])
    concat = np.concatenate([d for d in docs if len(d)])
    sigs = minhash_concat(concat, offsets, a, b)
    for d, doc in enumerate(docs):
        assert np.array_equal(sigs[d], naive_minhash(doc, a, b)), f"doc {d}"


def test_minhash_chunking_consistent():
    rng = np.random.default_rng(1)
    a, b = minhash_coefficients(8, seed=5)
    docs = [rng.integers(0, 1 << 32, size=50, dtype=np.uint64) for _ in range(20)]
    offsets = np.zeros(21, dtype=np.int64)
    np.cumsum([len(d) for d in docs], out=offsets[1:])
    concat = np.concatenate(docs)
    full = minhash_concat(concat, offsets, a, b)
    tiny = minhash_concat(concat, offsets, a, b, max_chunk_elems=64)
    assert np.array_equal(full, tiny)


def test_minhash_agreement_estimates_jaccard():
    """E[fraction of agreeing positions] == jaccard (MinHash.java:237-251
    estimator property), tolerance ~3/sqrt(n)."""
    rng = np.random.default_rng(2)
    a, b = minhash_coefficients(256, seed=7)
    base = rng.integers(0, 1 << 32, size=1000, dtype=np.uint64)
    setA = base
    setB = np.concatenate([base[:800], rng.integers(0, 1 << 32, size=200, dtype=np.uint64)])
    inter = len(np.intersect1d(setA, setB))
    union = len(np.union1d(setA, setB))
    true_j = inter / union
    offsets = np.array([0, len(setA), len(setA) + len(setB)], dtype=np.int64)
    sigs = minhash_concat(np.concatenate([setA, setB]), offsets, a, b)
    est = float(np.mean(sigs[0] == sigs[1]))
    assert abs(est - true_j) < 3.0 / np.sqrt(256)


def test_simhash_identical_and_empty():
    d = np.array([10, 20, 30], dtype=np.uint64)
    concat = np.concatenate([d, d])
    counts = np.ones(6, dtype=np.int64)
    offsets = np.array([0, 3, 6], dtype=np.int64)
    fp = simhash_concat(concat, counts, offsets)
    assert fp[0] == fp[1]
    fp2 = simhash_concat(d, counts[:3], np.array([0, 0, 3], dtype=np.int64))
    assert fp2[0] == 0  # empty doc -> zero fingerprint


def test_simhash_similar_docs_close():
    rng = np.random.default_rng(3)
    base = splitmix64(rng.integers(0, 1 << 62, size=500, dtype=np.uint64))
    other = base.copy()
    other[:25] = splitmix64(rng.integers(0, 1 << 62, size=25, dtype=np.uint64))
    unrelated = splitmix64(rng.integers(0, 1 << 62, size=500, dtype=np.uint64))
    concat = np.concatenate([base, other, unrelated])
    counts = np.ones(1500, dtype=np.int64)
    offsets = np.array([0, 500, 1000, 1500], dtype=np.int64)
    fp = simhash_concat(concat, counts, offsets)
    ham = lambda x, y: bin((int(x) ^ int(y)) & ((1 << 64) - 1)).count("1")
    assert ham(fp[0], fp[1]) < ham(fp[0], fp[2])
    assert ham(fp[0], fp[1]) <= 10


def test_java_random_properties():
    r1, r2 = JavaRandom(42), JavaRandom(42)
    seq1 = [r1.next_int(1000) for _ in range(50)]
    seq2 = [r2.next_int(1000) for _ in range(50)]
    assert seq1 == seq2
    assert all(0 <= v < 1000 for v in seq1)
    assert len(set(seq1)) > 30  # not degenerate


def test_trailing_empty_doc_minhash_and_simhash():
    """A doc with an empty shingle set as the LAST doc of a batch/chunk must
    not crash reduceat (ADVICE r1, high): its segment start equals the concat
    length. Covers first, middle, and trailing empties."""
    rng = np.random.default_rng(4)
    a, b = minhash_coefficients(8, seed=11)
    docs = [
        np.empty(0, dtype=np.uint64),
        rng.integers(0, 1 << 63, size=7, dtype=np.uint64),
        np.empty(0, dtype=np.uint64),
        rng.integers(0, 1 << 63, size=3, dtype=np.uint64),
        np.empty(0, dtype=np.uint64),  # trailing empty: the crash case
    ]
    offsets = np.zeros(len(docs) + 1, dtype=np.int64)
    np.cumsum([len(d) for d in docs], out=offsets[1:])
    concat = np.concatenate([d for d in docs if len(d)])
    sigs = minhash_concat(concat, offsets, a, b)
    for d, doc in enumerate(docs):
        assert np.array_equal(sigs[d], naive_minhash(doc, a, b)), f"doc {d}"
    # also exercise the chunked path with a trailing empty inside each chunk
    tiny = minhash_concat(concat, offsets, a, b, max_chunk_elems=16)
    assert np.array_equal(sigs, tiny)

    counts = np.ones(len(concat), dtype=np.int64)
    fp = simhash_concat(concat, counts, offsets)
    assert fp[0] == 0 and fp[2] == 0 and fp[4] == 0
    assert fp[1] != 0 and fp[3] != 0


def test_trailing_empty_doc_is_adversarial_not_lucky():
    """ADVICE r2 (high): a trailing empty doc must not steal the preceding
    doc's LAST shingle from its segment. Construct the worst case explicitly:
    order the last non-empty doc so the shingle minimizing EVERY permutation's
    hash sits in the final position, then assert (a) signatures match the
    naive oracle and (b) output is identical with and without the trailing
    empty doc. The old clamp fix fails both assertions here."""
    a, b = minhash_coefficients(8, seed=11)
    rng = np.random.default_rng(7)
    doc = rng.integers(1, 1 << 62, size=9, dtype=np.uint64)
    P = int(MERSENNE_61)

    def hash_perm(i, xs):
        return (int(a[i]) * (xs.astype(object) % P) + int(b[i])) % P

    # Reorder so that, for permutation 0, the minimizing element is last (the
    # element the clamp would drop). Then verify the oracle for ALL perms.
    order = np.argsort(hash_perm(0, doc))[::-1]
    doc = doc[order]
    offsets_with = np.array([0, len(doc), len(doc)], dtype=np.int64)
    offsets_without = np.array([0, len(doc)], dtype=np.int64)
    sig_with = minhash_concat(doc, offsets_with, a, b)
    sig_without = minhash_concat(doc, offsets_without, a, b)
    assert np.array_equal(sig_with[0], sig_without[0])
    assert np.array_equal(sig_with[0], naive_minhash(doc, a, b))
    assert np.all(sig_with[1] == EMPTY_SIG)

    # SimHash: fingerprint must be invariant to a trailing empty doc too
    # (the clamp stole the last element from the weighted bit totals).
    counts = np.ones(len(doc), dtype=np.int64)
    fp_with = simhash_concat(doc, counts, offsets_with)
    fp_without = simhash_concat(doc, counts, offsets_without)
    assert fp_with[0] == fp_without[0]
    assert fp_with[1] == 0


def test_minhash_full_64bit_input_distinguishes_high_bits():
    """Shingles differing only above bit 32 must hash differently (the old
    low-32-bit truncation made them MinHash-identical; VERDICT r1 wrong#3)."""
    a, b = minhash_coefficients(16, seed=3)
    lo = np.array([12345], dtype=np.uint64)
    hi = np.array([12345 + (1 << 40)], dtype=np.uint64)
    offsets = np.array([0, 1, 2], dtype=np.int64)
    sigs = minhash_concat(np.concatenate([lo, hi]), offsets, a, b)
    assert not np.array_equal(sigs[0], sigs[1])
    assert np.array_equal(sigs[0], naive_minhash(lo, a, b))
    assert np.array_equal(sigs[1], naive_minhash(hi, a, b))
