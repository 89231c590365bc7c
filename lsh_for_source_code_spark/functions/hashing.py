"""Vectorized (numpy) hashing primitives used inside pandas UDFs.

All public functions operate on whole arrays / batches -- no per-row Python in
the hot path. Deterministic: every random draw derives from an explicit seed
(unlike the reference, whose `new Random()` at MinHash.java:127-129 makes its
golden output irreproducible -- SURVEY.md 3.1).
"""

from __future__ import annotations

import hashlib

import numpy as np

from lsh_for_source_code_spark.config import MERSENNE_61

U64 = np.uint64
_MASK64 = U64(0xFFFFFFFFFFFFFFFF)

# Sentinel signature value for empty shingle sets, mirroring the reference's
# empty-set => Integer.MAX_VALUE-everywhere behaviour (MinHash.java:196-199).
# We use the modulus itself, which no real hash value can reach.
EMPTY_SIG = U64(MERSENNE_61)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public domain algorithm).

    Used to derive per-seed constants and to mix k-shingle windows.
    """
    x = x.astype(U64, copy=True)
    x += U64(0x9E3779B97F4A7C15)
    z = x
    z = (z ^ (z >> U64(30))) * U64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> U64(27))) * U64(0x94D049BB133111EB)
    return z ^ (z >> U64(31))


def hash_strings(strings, out_dtype=np.uint64) -> np.ndarray:
    """64-bit stable hash of each string: first 8 bytes of blake2b.

    Intended for *unique vocabularies* (call after pd.factorize), so the
    Python loop runs over the per-batch vocab, not over every token.
    """
    out = np.empty(len(strings), dtype=out_dtype)
    for i, s in enumerate(strings):
        out[i] = int.from_bytes(
            hashlib.blake2b(s.encode("utf-8", "surrogatepass"), digest_size=8).digest(),
            "little",
        )
    return out


def kgram_ids(token_ids: np.ndarray, k: int) -> np.ndarray:
    """Combine k consecutive 64-bit token hashes into shingle ids.

    Polynomial rolling combine + splitmix finalize, fully vectorized: the
    result for window i depends on (t_i, ..., t_{i+k-1}) order-sensitively.
    """
    t = token_ids.astype(U64, copy=False)
    n = len(t)
    if n < k:
        return np.empty(0, dtype=U64)
    if k == 1:
        return t
    acc = t[: n - k + 1].copy()
    prime = U64(0x100000001B3)  # FNV-64 prime as the polynomial base
    for j in range(1, k):
        acc = acc * prime + t[j : n - k + 1 + j]
    return splitmix64(acc)


def minhash_coefficients(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Affine family h_i(x) = (a_i * x + b_i) mod (2^61 - 1).

    Same family as the reference (MinHash.java:307-310: (a*x+b) mod dict_size)
    but with a fixed prime modulus so no global dictionary size is needed.
    a_i < 2^31 and x < 2^32 keep a*x + b inside uint64 => exact arithmetic.
    """
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 1 << 31, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, MERSENNE_61, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_concat(
    concat: np.ndarray,
    offsets: np.ndarray,
    a: np.ndarray,
    b: np.ndarray,
    max_chunk_elems: int = 1 << 16,
) -> np.ndarray:
    """MinHash signatures for a batch of documents stored as one concatenated
    shingle array.

    concat  : (total,) uint64 shingle ids for all docs back to back
    offsets : (n_docs + 1,) int64 -- doc d owns concat[offsets[d]:offsets[d+1]]
    returns : (n_docs, num_perm) uint64; empty docs get EMPTY_SIG everywhere.

    sig[d, i] = min over x in doc d of (a_i * x + b_i) mod P -- the per-key
    `min` aggregate at the heart of the reference's MinHash.signature loop
    (MinHash.java:195-226), computed as numpy broadcasting + segmented
    minimum instead of a scalar loop.

    The full 64-bit shingle id enters the hash (split-multiply mod 2^61-1):
    at 10^12 files the global distinct-shingle count exceeds 2^32, so a
    low-32-bit truncation would make distinct shingles systematically
    MinHash-identical and inflate candidate counts. The Mersenne fold is
    also division-free (cheaper than uint64 `%` per element).
    """
    num_perm = len(a)
    n_docs = len(offsets) - 1
    out = np.full((n_docs, num_perm), EMPTY_SIG, dtype=U64)
    if len(concat) == 0 or n_docs == 0:
        return out
    P = U64(MERSENNE_61)
    # reduce x into [0, P) once up front: fold high bits (2^61 === 1 mod P)
    x = concat.astype(U64, copy=True)
    x = (x >> U64(61)) + (x & P)
    np.subtract(x, P, out=x, where=x >= P)
    a = a.astype(U64)
    b = b.astype(U64)

    # Cache-blocked chunking: the (num_perm, chunk_total) working set is
    # kept L2-resident (2^16 elems = 512 KB). Measured on the 32-core bench
    # host: 2^22 (32 MB, DRAM-streaming) ran 3.3x slower single-threaded
    # AND lost 35% more to bus contention at 8 parallel workers; 2^16 is
    # 3x faster alone and scales 8-way with no degradation -- this is the
    # python-stage scaling lever for the N->4N criterion.
    d = 0
    while d < n_docs:
        e = d
        while e < n_docs and (offsets[e + 1] - offsets[d]) * num_perm <= max_chunk_elems:
            e += 1
        e = max(e, d + 1)  # always make progress even for a single huge doc
        lo, hi = offsets[d], offsets[e]
        if hi > lo:
            # exact (a*x + b) mod P for x < 2^61, a < 2^31 via split multiply:
            # x = xh*2^31 + xl; a*x = (a*xh)*2^31 + a*xl, and t*2^31 mod P
            # for t = th*2^30 + tl is th + tl*2^31 (since 2^61 === 1 mod P).
            # Every intermediate stays < 2^63 => uint64 arithmetic is exact,
            # and the Mersenne folds replace the per-element division of `%`.
            # In-place ops bound live temporaries -- this stage is memory-
            # bandwidth-bound at high thread counts.
            xs = x[lo:hi]
            t = a[:, None] * (xs >> U64(31))[None, :]  # a*xh < 2^61 (perm, chunk)
            hv = (t & U64(0x3FFFFFFF)) << U64(31)      # tl*2^31 < 2^61
            hv += t >> U64(30)                         # + th: === (a*xh)*2^31 mod P
            hv = (hv & P) + (hv >> U64(61))
            np.multiply(a[:, None], (xs & U64(0x7FFFFFFF))[None, :], out=t)
            hv += (t & P) + (t >> U64(61))             # + a*xl folded
            hv += b[:, None]
            hv = (hv & P) + (hv >> U64(61))
            np.subtract(hv, P, out=hv, where=hv >= P)
            # reduceat over NON-EMPTY starts only: empty docs have zero width,
            # so dropping their starts keeps every real segment boundary exact
            # (the last non-empty segment extends to the chunk end). Clamping a
            # trailing empty doc's start instead would steal the preceding
            # doc's last shingle from its min (r2 ADVICE, reproduced).
            nonempty = offsets[d + 1 : e + 1] > offsets[d:e]
            cols = np.where(nonempty)[0]
            starts = (offsets[d:e] - lo).astype(np.int64)[cols]
            mins = np.minimum.reduceat(hv, starts, axis=1)  # (perm, len(cols))
            out[d + cols, :] = mins.T
        d = e
    return out


def simhash_concat(
    concat: np.ndarray,
    counts: np.ndarray,
    offsets: np.ndarray,
    bits: int = 64,
) -> np.ndarray:
    """SimHash fingerprints (north_star second recall channel).

    Weighted bit-vote over shingle hashes: bit j of doc d is 1 iff the
    count-weighted sum of bit j over its shingles exceeds half the total
    weight. Returns (n_docs,) int64 (bit pattern viewed as signed).
    """
    n_docs = len(offsets) - 1
    out = np.zeros(n_docs, dtype=np.int64)
    if len(concat) == 0 or n_docs == 0:
        return out
    sh = concat.astype(U64, copy=False)
    w = counts.astype(np.int64, copy=False)
    # reduceat over NON-EMPTY starts only (same fix as minhash_concat): a
    # clamped trailing-empty-doc start would steal the last element from the
    # preceding doc's weighted totals and flip fingerprint bits (r2 ADVICE).
    nonempty = offsets[1:] > offsets[:-1]
    cols = np.where(nonempty)[0]
    if len(cols) == 0:
        return out
    starts = offsets[:-1].astype(np.int64)[cols]
    totals = np.add.reduceat(w, starts)  # (len(cols),)
    fp = np.zeros(len(cols), dtype=U64)
    # one 1-D pass per bit: (total,) temporaries stay cache-resident instead
    # of a (total, 64) int64 matrix (memory-bandwidth killer at 32 threads)
    for j in range(bits):
        bit_w = ((sh >> np.uint64(j)) & U64(1)).view(np.int64) * w
        sums = np.add.reduceat(bit_w, starts)
        fp |= (2 * sums > totals).astype(U64) << np.uint64(j)
    out[cols] = fp.view(np.int64)
    return out


class JavaRandom:
    """Minimal java.util.Random LCG (public algorithm, JDK spec) -- used only
    by reference-parity tests to reproduce seeded MinHash coefficient draws
    (MinHash.java:293-297 uses rand.nextInt(dict_size))."""

    def __init__(self, seed: int):
        self.seed = (seed ^ 0x5DEECE66D) & ((1 << 48) - 1)

    def _next(self, bits: int) -> int:
        self.seed = (self.seed * 0x5DEECE66D + 0xB) & ((1 << 48) - 1)
        return self.seed >> (48 - bits)

    def next_int(self, bound: int) -> int:
        if bound <= 0:
            raise ValueError("bound must be positive")
        if (bound & -bound) == bound:  # power of two
            return (bound * self._next(31)) >> 31
        while True:
            bits = self._next(31)
            val = bits % bound
            if bits - val + (bound - 1) < (1 << 31):
                return val
