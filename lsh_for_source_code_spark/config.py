"""Pipeline configuration.

Mirrors the reference's knobs (sparsity / stages / buckets, ReadMe.txt:21-51;
signature sizing LSHMinHash.java:92-96) re-expressed for the Spark build:
128 permutations by default (north_star), (bands, rows) chosen for
recall >= 0.99 at the target jaccard threshold, always-seeded coefficients
(the reference's unseeded java.util.Random -- MinHash.java:127-129 -- makes
its committed golden output irreproducible; we never do that).
"""

from __future__ import annotations

import json
import math
from dataclasses import asdict, dataclass, field

# Prime modulus for the affine MinHash family h(x) = (a*x + b) mod P.
# Mersenne prime 2^61 - 1: with 32-bit shingle values and a < 2^31 the
# product a*x + b stays inside uint64 (no overflow), so numpy uint64
# arithmetic is exact.
MERSENNE_61 = (1 << 61) - 1

# Same role as the reference's LARGE_PRIME = 433494437 (LSH.java:14), used
# only by the order-insensitive parity band hash (reference O10 semantics).
REFERENCE_BAND_PRIME = 433494437


def candidate_probability(s: float, bands: int, rows: int) -> float:
    """P(two docs with jaccard s share >= 1 LSH band) = 1 - (1 - s^r)^b.

    The S-curve the reference's signature-size comment cites
    (LSHMinHash.java:73-91, MMDS p.88).
    """
    return 1.0 - (1.0 - s**rows) ** bands


def signature_size_for_error(error: float) -> int:
    """Reference O18 (MinHash.java:96-101): size = 1/error^2. The reference's
    range check is dead code (`error < 0 && error > 1` is always false); we
    validate properly."""
    if not 0.0 < error <= 1.0:
        raise ValueError("error must be in (0, 1]")
    return int(1.0 / (error * error))


def expected_signature_error(size: int) -> float:
    """Reference O19 (MinHash.java:258-260): expected estimator error 1/sqrt(n)."""
    return 1.0 / math.sqrt(size)


def reference_signature_size(stages: int, threshold: float = 0.5) -> int:
    """Reference sizing rule: r = ceil(ln(1/stages)/ln(threshold)) + 1,
    size = r * stages (LSHMinHash.java:92-96, THRESHOLD=0.5 at :33).
    stages=10 -> r=5 -> size=50, matching the committed golden run.
    """
    rows = int(math.ceil(math.log(1.0 / stages) / math.log(threshold))) + 1
    return rows * stages


@dataclass(frozen=True)
class PipelineConfig:
    """All knobs for one dedup run. Hashable + JSON-serializable so it can be
    recorded in run metadata / lineage (reference exposes coefficients via
    getCoefficients(), MinHash.java:316-318; we persist the whole config)."""

    # --- shingling (reference stage A, out-of-repo: word tokens, k=1) ---
    shingle_k: int = 1            # k=1 word tokens == reference granularity
    min_token_freq: int = 0       # reference `sparsity` predicate (Main.java:99-104);
                                  # 0 disables (the booleanize filter freq > sparsity)

    # --- signatures ---
    num_perm: int = 128           # north_star: 128 permutations
    bands: int = 64               # b*r must == num_perm
    rows_per_band: int = 2        # b=64,r=2: P(cand|0.5) = 1 - (1-0.25)^64 ~ 1-1e-8
    seed: int = 0x5EED_CAFE

    # --- thresholds ---
    jaccard_threshold: float = 0.5
    overlap_threshold: float | None = None
    # multiset overlap >= theta is the reference's reverse-engineered pairing
    # rule (SURVEY.md 2.4); None disables the channel (the default pipeline's
    # recall contract is jaccard-based and verification then stays entirely
    # inside whole-stage codegen). Parity configs set it explicitly.
    containment_threshold: float = 0.8  # LCS-containment channel trigger

    # --- skew handling (SURVEY.md 4.3: 300/4632 files in one band group) ---
    max_bucket_pairs: int = 64    # buckets with <= this many members emit all pairs;
                                  # larger buckets fall back to chunked topology
    mega_chunk_target: int = 16
    # Mega buckets (> max_bucket_pairs members) are split into random chunks
    # of ~this size: exact all-pairs within each chunk + per-chunk min ->
    # bucket anchor edges. Work stays LINEAR in bucket size (sz * C/2 pairs
    # per band vs the pure star's sz), but each member gets C-1 exact
    # comparisons instead of 1 anchor edge, so for borderline-theta members
    # (anchor edge passes verify w.p. ~p) the per-member miss rate drops
    # from (1-p) to ~(1-p)^C. MEASURED at 20k (r3), ground-truth cluster
    # recall family-stratum / cross-boilerplate-stratum / wall:
    #   C=1 (pure star): 0.9747 / 0.8506 / 16.2s
    #   C=4:             0.9827 / 0.9845 / 17.8s
    #   C=16 (default):  0.9936 / 0.9978 / 23.7s  <- first >=0.99 everywhere
    #   C=32:            0.9980 / 0.9992 / 34.6s
    # 0/1 disables (pure star).
    # Scale invariant: a mega-bucket member emits <= (C-1) comparisons per
    # band = (C-1)*bands total (960 at defaults) -- BELOW the small-bucket
    # worst case (max_bucket_pairs-1)*bands = 4032 the engine already
    # accepts. Total mega emission is min(C(sz,2), sz*C/2*bands): linear in
    # bucket size once sz >> C/2*bands (asserted by the operator-level bound
    # test at sz=5000). A band-LIMITED variant (chunking only 4-8 bands) was
    # measured and rejected: 20k recall fell to 0.94-0.96 because a member's
    # mega bands are spread uniformly over all 64 band ids.
    mega_refine_levels: int = 4
    # Similarity-preserving refinement of mega buckets BEFORE the chunked
    # fallback: each level extends the bucket key with one more MinHash perm
    # (the next signature row, mod num_perm), re-measures occupancy, and
    # emits exact all-pairs from sub-buckets that fell under the cap. A
    # truly-similar pair (jaccard s) stays together per level w.p. s, while
    # a JUNK bucket -- members agreeing only on a globally-common token's
    # min -- splits by a factor of the members' perm diversity (~100x).
    # Junk buckets are the scale killer this exists for: their size grows
    # LINEARLY with corpus size (a common token's band value is shared by
    # every file containing it and nothing hash-smaller), so pairs whose
    # shared tokens are all global lose every band to the cap. MEASURED at
    # 200k: type2 (consistent renames -- shared tokens are exclusively
    # keywords/numbers) cluster recall was 0.167 under the pure star and
    # 0.325 under chunking alone; one-pass refinement at L=4 with the
    # staged emission policy (<=C sub-buckets at every level, <=cap from
    # level 2 on) reaches type2 0.945 / family-stratum 0.9913 at 143s
    # pipeline wall (L=3: 0.927/0.9886 at 108s; emit-cap only at the last
    # level: 0.883/0.9816 at 100s). 0 disables.
    salt_partitions: int = 16     # salting factor for mega-bucket repartition
    min_band_agreement: int = 1
    # OPTIONAL precision/cost knob: candidate pairs must share >= this many
    # SMALL-bucket LSH bands to reach exact verification (star anchor pairs
    # exempt). The textbook >=2-band rule is NOT recall-safe under the
    # mega-bucket star cap: bands matching inside capped buckets don't
    # count, so true pairs whose shared bands are mostly mega (boilerplate-
    # heavy corpora) can carry agreement 1. MEASURED on the 20k synthetic
    # corpus: agreement=2 cut verify input hard but cost 55% of true pairs
    # / 29% of cluster-level recall -- hence default 1 (loss-free). Raise
    # only when banding is uncapped or precision matters more than recall.

    verify_pregate_margin: float | None = None
    # OPT-IN production knob for the dominant verify stage (BENCH_NOTES
    # #10): drop candidate pairs whose MinHash-estimated jaccard is below
    # jaccard_threshold - margin before the shingle-array join. Kept pairs
    # are still verified with EXACT jaccard; the margin bounds the chance
    # of gating away a true pair (estimator sigma <= 0.5/sqrt(num_perm),
    # so 0.14 ~= 3 sigma at 128 perms -> ~0.1% per-pair miss risk, further
    # recovered by cluster transitivity). Ignored when the overlap channel
    # is active (overlap pairs can have low jaccard) or keep_all is set.
    # None (default) = off: oracle queries and parity runs stay exact.
    verify_pregate_perms: int = 32
    verify_prefix_gate_k: int | None = None
    # OPT-IN bottom-k prefix gate for the verify join (r4; VERDICT r3
    # next#1): because the shingle arrays are sorted by their UNIFORM
    # 64-bit hash, the first k elements are a bottom-k sketch, and
    #   est = |prefix_k(A) n prefix_k(B)| / min(k, max(|A|, |B|))
    # over-estimates the bottom-k-union jaccard estimate (every element the
    # union sketch counts lies in both prefixes), so gating on
    # est >= jaccard_threshold - 0.2 keeps a SUPERSET of what the unbiased
    # sketch would keep. NOTE this is a PROBABILISTIC gate, not a sound
    # bound: a true pair whose bottom-k estimate lands in the tail below
    # theta - 0.2 is dropped before exact verification (per-pair miss
    # <= exp(-2k*0.2^2) ~= 0.6% at k=64 by Hoeffding, ~7e-4 under the
    # normal approx at theta=0.5; recovered only by cluster transitivity).
    # Survivors still get exact jaccard. MEASURED at
    # 200k/17.46M candidates (BENCH_NOTES r4): cuts 73% of candidate pairs
    # out of the wide-array join with ZERO verified-pair loss (all 9 A/B
    # runs bit-identical, 499,797 pairs), shrinking verify-join shuffle
    # bytes ~3.6x -- but single-box wall is BREAK-EVEN (median 84.1s vs
    # 75.4s) because per-row join machinery, not bytes, dominates there.
    # Default OFF locally; turn ON (k=64) on real clusters where network
    # shuffle bytes are the scarce resource. Applies only to the
    # jaccard-only channel (overlap pairs can have low jaccard).
    # The pregate probes only the first `verify_pregate_perms` signature
    # rows (margin rescaled by sqrt(num_perm/n_probe) to keep the same
    # per-pair miss probability): the gate's join bytes and zip_with work
    # shrink 4x at 32/128 while the wider margin only admits more pairs
    # into exact verification (never loses any).

    verify_broadcast_max_rows: int = 4_000_000
    verify_broadcast_max_bytes: int = 512 * 1024 * 1024
    # Size-adaptive b-side broadcast for the verify feature join (r6, guide
    # §8 "broadcast the plan"): the expensive exchange in S6 is the join-1
    # output -- every candidate pair already carrying its sh_a array --
    # being re-shuffled by id_b (~|pairs| x avg-array bytes; ~32 GB at the
    # 200k bench). When the FEATURE table (one row per distinct content,
    # NOT per pair) fits under both bounds, the b-side join broadcasts and
    # that wide intermediate never crosses an exchange. Decision cost is
    # one count() (parquet-metadata / cached) and, only under the row
    # bound, one size aggregate over the small table
    # (verify.feature_table_fits_broadcast). Measured at 200k/local[32]:
    # identical verified output (checksum), S6 37.3s -> ~22s. Defaults are
    # deliberately conservative (a 512 MB relation on an 8 GB driver);
    # production corpora blow past the row bound immediately, pay only the
    # metadata count, and keep the r1-proven SHUFFLE_HASH path (plus
    # checkpoint_buckets, which removes the feature exchanges entirely on
    # clusters). <= 0 disables.

    verify_sound_prefix_t: int | None = 16
    # SOUND positional prefix filter before the exact per-pair intersect
    # (r6; PPJoin t-occurrence lemma, Xiao et al. WWW'08): with both
    # shingle arrays sorted by the same global order (they are -- the
    # shingle UDF emits sorted-distinct hashes), jaccard(A,B) >= theta
    # implies |A n B| >= alpha = theta/(1+theta)*(|A|+|B|), and then the
    # (|A|-alpha+t)-prefixes of A and B must share >= t elements. Pairs
    # failing that prefix check have jaccard < theta with CERTAINTY, so --
    # unlike verify_pregate_margin / verify_prefix_gate_k above -- this
    # filter is exact: verified output is byte-identical (checksum-asserted
    # A/B + property test). Cost: an array_intersect over ~((1-theta)/
    # (1+theta))*n + t element prefixes on every pair buys skipping the
    # full-array intersect (and all downstream row machinery) on rejected
    # pairs. Measured at 200k/local[32], t=16, identical outputs
    # (scripts/r06_exp_prefix.py): theta=0.9 flagship query 5.6s -> 4.2s
    # (prefix ~0.053n+t rejects everything below j~0.68); theta=0.5
    # pipeline verify warm 24.7-28.0s -> 15.2-22.5s -- the junk
    # distribution (72% of the 17.2M candidates at j in [0.10,0.30),
    # `r06_exp_prefix.py dist`) sits far enough below the n/3+t
    # certificate, and rejected pairs skip the full hash-set build, so the
    # filter beats the naive (p/n)-cost model even at theta=0.5. The
    # operator applies it for jaccard_threshold >= 0.5 (below that the
    # sound prefix exceeds half the array; no declared query goes there).
    # None / <= 0 disables.

    # --- execution ---
    checkpoint_buckets: int | None = None
    # OPT-IN bucketed checkpoint for the shingled-features stage (the
    # brief's "bucketing for co-located joins"): files_shingled is written
    # `bucketBy(n, file_id)` as an external datasource table, so BOTH
    # verify feature joins (side a and side b each rescan the shingle
    # table -- the two widest scans in the pipeline) read data already
    # hash-partitioned on the join key and skip their Exchange entirely;
    # only the narrow candidate-pair side shuffles. At 100 TB the shingle
    # table is the dominant shuffle payload, so this converts the verify
    # stage's two wide-array shuffles into zero. Requires a checkpoint_dir
    # (bucket metadata rides the table catalog; resume re-registers the
    # external table from the parquet directory). None (default) = plain
    # parquet checkpoints.
    check_id_collisions: bool = True
    # Audit that the 64-bit xxhash file_id is injective over this corpus's
    # natural keys (repo, path, commit) before anything downstream keys on
    # it -- birthday collisions are near-certain at ~2^32 distinct keys
    # (ADVICE r1) and a silent collision merges two unrelated files'
    # shingles. ONE aggregate job over the three key columns only (columnar
    # pruning: content never moves), so the cost is a small fraction of any
    # pipeline run; raises RuntimeError on collision (the fix is a 128-bit
    # id via with_file_id(id_expr=...)). Default ON (VERDICT r2 next#8).
    shuffle_partitions: int = 32
    simhash_bits: int = 64
    simhash_hamming_max: int = 3
    simhash_max_block: int = 1024
    # blocks (16-bit fingerprint slices) with more members than this emit
    # star-topology pairs against the min-id anchor instead of all pairs --
    # the same mega-bucket defense as max_bucket_pairs on the MinHash path
    # (a boilerplate-heavy block value would otherwise go O(k^2)).
    simhash_table_blocks: int | None = None
    # EXTREME-SCALE table design (Manku et al., WWW'07; VERDICT r3 next#5):
    # split the fingerprint into `m` blocks (m > hamming_max) and key one
    # table on every (m - hamming_max)-block combination -- pigeonhole:
    # <= hamming_max differing bits touch <= hamming_max blocks, so at
    # least one combination agrees on every block. Key entropy becomes
    # (m - t) * (bits / m) instead of bits / (t + 1): at 10^12 docs the
    # default 4x16-bit decomposition puts ~15M UNRELATED docs in every
    # block bucket (recall rides the mega-chunk lottery); e.g. bits=128,
    # m=8 gives 80-bit keys (C(8,3)=56 tables) and bits=64, m=8 gives
    # 40-bit keys. Cost is the table count C(m, t) rows per doc vs t+1.
    # None (default) = the t+1-block single-block-key design (equivalent
    # to table_blocks = hamming_max + 1). Requires m | simhash_bits and
    # (bits/m) | 64.

    refine_work_persist: str = "deser"
    # Storage strategy for the exploded refinement work table (the r3/r4 S5
    # scaling suspect -- VERDICT r4 next#3): the (mega x levels) posexplode
    # join output is read by three consumers (salted stats, emit join,
    # residual join), so without caching Catalyst re-evaluates the upstream
    # signed-join per consumer.
    #   "deser" (default): MEMORY_AND_DISK_DESER -- Spark's DataFrame
    #            default; fastest reads, largest footprint.
    #   "ser":   MEMORY_AND_DISK -- serialized blocks; smaller cache
    #            footprint at a CPU decode cost per consumer read.
    #   "off":   no persist -- each consumer recomputes the (JVM-only,
    #            codegen) key expressions from the persisted upstream;
    #            trades recompute for zero cache population cost.
    # A/B'd at 200k (BENCH_NOTES r5): see the measured table before
    # changing the default.

    extra: dict = field(default_factory=dict, compare=False, hash=False)

    def __post_init__(self) -> None:
        if self.bands * self.rows_per_band != self.num_perm:
            raise ValueError(
                f"bands*rows ({self.bands}*{self.rows_per_band}) != num_perm ({self.num_perm})"
            )
        if self.checkpoint_buckets is not None and self.checkpoint_buckets < 1:
            raise ValueError(
                f"checkpoint_buckets must be >= 1, got {self.checkpoint_buckets}"
            )
        if self.simhash_table_blocks is not None:
            m, t, bits = (
                self.simhash_table_blocks,
                self.simhash_hamming_max,
                self.simhash_bits,
            )
            if m <= t:
                raise ValueError(
                    f"simhash_table_blocks ({m}) must exceed hamming_max ({t})"
                )
            if bits % m != 0 or 64 % (bits // m) != 0:
                raise ValueError(
                    f"simhash_bits ({bits}) must split into {m} equal blocks "
                    "whose width divides 64"
                )
        if self.refine_work_persist not in ("deser", "ser", "off"):
            raise ValueError(
                "refine_work_persist must be one of 'deser'/'ser'/'off', "
                f"got {self.refine_work_persist!r}"
            )
        if self.verify_pregate_perms < 1:
            # <=0 would divide by zero in the pregate margin rescale or slice
            # an empty signature whose NULL agreement silently drops every
            # candidate pair (ADVICE r3)
            raise ValueError(
                f"verify_pregate_perms must be >= 1, got {self.verify_pregate_perms}"
            )

    @property
    def config_id(self) -> str:
        return (
            f"k{self.shingle_k}-p{self.num_perm}-b{self.bands}r{self.rows_per_band}"
            f"-s{self.seed:x}-t{self.jaccard_threshold}"
        )

    def to_json(self) -> str:
        d = asdict(self)
        d.pop("extra", None)
        return json.dumps(d, sort_keys=True)

    def candidate_recall_at(self, s: float) -> float:
        return candidate_probability(s, self.bands, self.rows_per_band)

    @classmethod
    def cluster_profile(cls, executors: int = 1000, **overrides) -> "PipelineConfig":
        """The measured-on-a-real-cluster operating point: knobs that are
        deliberately OFF in the single-box default because they were A/B'd
        to local break-even, but whose wins are network/footprint wins a
        multi-executor cluster actually collects.

        - verify_prefix_gate_k=64: 73% of candidate pairs cut before the
          wide-array verify join with ZERO verified-pair loss (9/9 A/B runs
          bit-identical at 200k) and ~3.6x fewer verify-join shuffle bytes
          (BENCH_NOTES r4 #12). Single-box wall is break-even (row
          machinery dominates there); on a cluster the scarce resource is
          the network the gate relieves.
        - shuffle_partitions ~= 4 tasks/core so AQE has packing slack; at
          1000 executors x 4 cores that is 16k partitions, which also keeps
          per-partition shuffle blocks under memory at 100 TB inputs.
        - everything recall-relevant (refinement levels, chunk target,
          band agreement) stays at the default, recall-proven values --
          this profile changes COST knobs only, so verified output is
          bit-identical to the default config on the same input (tested).

        - checkpoint_buckets = shuffle_partitions: the shingle checkpoint
          is written bucketBy(file_id), so the verify stage's two wide
          feature scans skip their Exchange entirely (measured 4 -> 2
          exchanges; output bit-identical, tested). On a cluster this
          removes the pipeline's dominant shuffle payload from the
          network; single-box it is IO-bound break-even like the gate.

        SimHash extreme scale is corpus-dependent, not cluster-dependent:
        turn on simhash_table_blocks (Manku tables) when the CORPUS grows
        past ~10^9 docs, regardless of executor count.
        """
        parts = max(32, 4 * 4 * executors)
        return cls(
            **{
                "verify_prefix_gate_k": 64,
                "shuffle_partitions": parts,
                "checkpoint_buckets": parts,
                **overrides,
            }
        )


#: Config reproducing the reference golden run's shape: stages=10, buckets=10,
#: sparsity=5, sig size 50 (output dir name + ReadMe.txt:51). Used by parity
#: tests; `buckets` lives in extra because only the parity band hash uses it.
def reference_parity_config(seed: int = 42) -> PipelineConfig:
    return PipelineConfig(
        shingle_k=1,
        min_token_freq=5,
        num_perm=50,
        bands=10,
        rows_per_band=5,
        seed=seed,
        extra={"buckets": 10},
    )
