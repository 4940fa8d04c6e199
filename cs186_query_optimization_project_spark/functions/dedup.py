"""Deduplication operators for document corpora at scale.

Four families (SURVEY.md §7 phase 6; all additive over the reference):

- **exact**: hash-groupBy on content (or fingerprint) — one shuffle on the
  md5 key, keeps the lowest id per group.  At 100 TB this is the cheap first
  pass; the md5 shuffle key is 16 bytes regardless of document size.
- **MinHash + LSH**: shingle → per-shingle 64-bit hash → n_hashes affine
  minhashes → band hashes → bucket self-join on (band, band_hash) →
  candidate pairs → exact Jaccard verify.  Entirely JVM-side array
  expressions + one shuffle per groupBy/join; no Python in the hot path.
  This is the standard near-dup pipeline (Broder '97; used by every LLM
  data pipeline since GPT-3).
- **SimHash**: 60-bit portable signature (default; 64-bit with the
  xxhash64 family) whose Hamming neighbors are near-dups; Manku-style
  banding into ``max_hamming + 1`` chunks guarantees candidate recall at
  any threshold (Charikar '02, Manku '07).
- **n-gram Jaccard**: exact pairwise Jaccard on shingle sets *within LSH
  buckets only* — never all-pairs; the bucket join bounds the quadratic
  term.

Candidate-pair joins deliberately emit ``(small_id, large_id)`` with
``small < large`` so downstream grouping is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cs186_query_optimization_project_spark.functions.text import shingles
from cs186_query_optimization_project_spark.parallel import ensure_parallelism

# Prime modulus for the affine minhash permutations.  ~2^30 so that
# a·h + b stays < 2^60 and never overflows a long under Spark's default
# ANSI arithmetic (a, h < 2^30).
_PRIME = 1_000_000_007


# --------------------------------------------------------------------- #
# exact dedup
# --------------------------------------------------------------------- #
def exact_duplicates(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """One row per distinct content: (keeper id, copies).  ``keeper`` is the
    minimum id; ``copies`` counts rows sharing the content."""
    return (df.groupBy(F.md5(F.col(text_col)).alias("fingerprint"))
            .agg(F.min(id_col).alias(id_col),
                 F.count(F.lit(1)).alias("copies")))


def drop_exact_duplicates(df: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """Keep the min-id row per distinct content.  Window over the
    fingerprint partition: one shuffle, no driver involvement."""
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(F.col(id_col))
    return (df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1).drop("__rn"))


# --------------------------------------------------------------------- #
# MinHash + LSH
# --------------------------------------------------------------------- #
def _affine_params(n_hashes: int, seed: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for h_i(x) = (a·x + b) mod M.  Derived
    from a splitmix-style integer scramble of the seed — reproducible
    across runs/partitions (no RNG state on executors)."""
    params = []
    state = seed & 0xFFFFFFFFFFFFFFFF
    for _ in range(n_hashes):
        state = (state + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
        z = state
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        a = (z % (_PRIME - 1)) + 1
        state = (state + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
        z = state
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        b = z % _PRIME
        params.append((a, b))
    return params


#: Portable per-shingle base hash: the top 60 bits of md5 as an integer,
#: mod _PRIME.  Every engine with md5/substr/hex-to-int reproduces it
#: bit-for-bit (DuckDB: ``('0x'||substr(md5(s),1,15))::UBIGINT % p``),
#: which is what makes the whole MinHash pipeline oracle-checkable.
#: xxhash64 is ~2-4x cheaper per call but Spark-specific.
_PORTABLE_BASE_HASH = ("pmod(cast(conv(substr(md5({col}), 1, 15), 16, 10) "
                       "as bigint), {p})")


def minhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", k: int = 3,
                       n_hashes: int = 32, seed: int = 42,
                       hash_family: str = "portable") -> DataFrame:
    """(id, signature array<long>[n_hashes]) via JVM array expressions.

    Per-shingle base hash: ``portable`` (default) = top-60-bits-of-md5
    mod p — reproducible in ANSI SQL, so the signatures (and therefore
    the LSH buckets and final pair set) can be verified by an external
    engine; ``xxhash64`` = Spark's native hash, cheapest per shingle.
    h_i = min over shingles of (a_i·h + b_i) mod p.  All intermediates
    < 2^60 so ANSI arithmetic never overflows.

    Shape: explode shingles → hash each ONCE → groupBy(id) with n_hashes
    min-aggregates.  A flat array-expression version (array_min over
    transform, no shuffle) looks cheaper on paper, but Catalyst's
    CollapseProject inlines the shared shingle-hash array into every one
    of the n_hashes columns, re-tokenizing and re-hashing the document
    n_hashes times — measured 30× slower.  The explode pays one shuffle
    but hashes each shingle exactly once, and map-side partial min
    aggregation keeps the shuffle tiny (n_hashes longs per id per
    partition)."""
    if hash_family == "portable":
        base = _PORTABLE_BASE_HASH.format(col="__s", p=_PRIME)
    elif hash_family == "xxhash64":
        base = f"pmod(xxhash64(__s), {_PRIME})"
    else:
        raise ValueError(f"unknown hash_family '{hash_family}' "
                         f"(expected 'portable' or 'xxhash64')")
    hashed = (df.select(F.col(id_col),
                        F.explode(shingles(text_col, k)).alias("__s"))
              .select(F.col(id_col), F.expr(base).alias("__h")))
    aggs = [
        F.min(F.expr(f"pmod(__h * {a} + {b}, {_PRIME})")).alias(f"__m{i}")
        for i, (a, b) in enumerate(_affine_params(n_hashes, seed))
    ]
    out = hashed.groupBy(id_col).agg(*aggs)
    return out.select(
        id_col,
        F.array(*[F.col(f"__m{i}") for i in range(n_hashes)]).alias("signature"))


def banded_signatures(signatures: DataFrame, id_col: str = "doc_id",
                      n_bands: int = 8,
                      hash_family: str = "portable") -> DataFrame:
    """(id, band, band_hash) — each signature split into n_bands slices,
    each slice hashed; shared by the self-join (lsh_candidate_pairs) and
    cross-set (incremental_near_duplicates) LSH joins."""
    band_fn = "md5" if hash_family == "portable" else "xxhash64"
    return signatures.select(
        F.col(id_col),
        F.posexplode(
            F.expr(f"transform(sequence(0, {n_bands - 1}), "
                   f"b -> {band_fn}(concat_ws(',', slice(signature, "
                   f"b * (size(signature) div {n_bands}) + 1, "
                   f"size(signature) div {n_bands}))))")
        ).alias("band", "band_hash"))


def lsh_candidate_pairs(signatures: DataFrame, id_col: str = "doc_id",
                        n_bands: int = 8,
                        hash_family: str = "portable",
                        max_bucket_size: int | None = None) -> DataFrame:
    """Band the signature, hash each band, self-join on (band, band_hash).

    Output: distinct (a, b) with a < b.  The explode produces n_bands rows
    per doc; the join shuffles on the band hash — the scalable LSH shape
    (no all-pairs comparison anywhere).  ``portable`` band keys are md5
    of the band's comma-joined minhash values (engine-reproducible,
    16-byte keys); ``xxhash64`` keys are 8 bytes and Spark-only.

    ``max_bucket_size`` caps the per-bucket quadratic term.  A
    boilerplate-heavy corpus (license headers, templated pages) can
    drive one band bucket to millions of members — n² pairs from a
    single degenerate bucket is the one way this plan dies at 100 TB.
    Buckets over the cap short-circuit to a STAR: every member pairs
    with the bucket's min-id hub only (linear), which preserves the
    connected component the downstream clustering derives — members of
    one bucket stay one cluster — while dropping the non-hub pairwise
    edges (documented trade: pair-level recall inside degenerate
    buckets, not cluster-level).  ``None`` (default) keeps exact
    all-within-bucket pairs."""
    banded = banded_signatures(signatures, id_col, n_bands, hash_family)
    star = None
    if max_bucket_size is not None:
        # one window shuffle on the same key the self-join uses; the
        # size/hub columns ride along instead of a separate count join
        w = Window.partitionBy("band", "band_hash")
        banded = (banded
                  .withColumn("__bn", F.count(F.lit(1)).over(w))
                  .withColumn("__hub", F.min(id_col).over(w)))
        over = banded.filter(F.col("__bn") > max_bucket_size)
        # hub = min(id), so (hub, member) is already (a < b)
        star = (over.filter(F.col(id_col) != F.col("__hub"))
                .select(F.col("__hub").alias("a"),
                        F.col(id_col).alias("b"))
                .distinct())
        banded = (banded.filter(F.col("__bn") <= max_bucket_size)
                  .drop("__bn", "__hub"))
    left = banded.alias("l")
    right = banded.alias("r")
    pairs = (left.join(right,
                       (F.col("l.band") == F.col("r.band"))
                       & (F.col("l.band_hash") == F.col("r.band_hash"))
                       & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")))
             .select(F.col(f"l.{id_col}").alias("a"),
                     F.col(f"r.{id_col}").alias("b"))
             .distinct())
    if star is not None:
        pairs = pairs.unionByName(star).distinct()
    return pairs


def jaccard_verify(df: DataFrame, pairs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", k: int = 3,
                   threshold: float = 0.8) -> DataFrame:
    """Exact n-gram Jaccard on candidate pairs only: join the raw texts to
    the (small) pair set first, then shingle ONLY the joined rows.
    Candidate pairs ≪ corpus, so shingle work is proportional to the
    candidates, not to corpus size — the full corpus is scanned twice for
    the (cheap) text join and never re-shingled.  Comparison is
    array_intersect/array_union, JVM-side."""
    texts = df.select(F.col(id_col), F.col(text_col))
    out = (pairs
           .join(texts.select(F.col(id_col).alias("a"),
                              F.col(text_col).alias("__ta")), "a")
           .join(texts.select(F.col(id_col).alias("b"),
                              F.col(text_col).alias("__tb")), "b")
           .withColumn("__sa", F.array_distinct(shingles("__ta", k)))
           .withColumn("__sb", F.array_distinct(shingles("__tb", k)))
           .withColumn(
               "jaccard",
               F.size(F.array_intersect("__sa", "__sb"))
               / F.size(F.array_union("__sa", "__sb")))
           .filter(F.col("jaccard") >= threshold)
           .select("a", "b", "jaccard"))
    return out


def minhash_near_duplicates(df: DataFrame, text_col: str = "text",
                            id_col: str = "doc_id", k: int = 3,
                            n_hashes: int = 32, n_bands: int = 8,
                            threshold: float = 0.8,
                            seed: int = 42,
                            hash_family: str = "portable") -> DataFrame:
    """Full pipeline: signatures → LSH buckets → candidate pairs → exact
    Jaccard verification.  With the default portable hash family the
    whole pipeline is deterministic AND reproducible in ANSI SQL, so an
    external engine can verify the exact pair set."""
    if n_bands > n_hashes:
        raise ValueError(
            f"n_bands ({n_bands}) > n_hashes ({n_hashes}): bands would be "
            f"empty, every doc would share every bucket, and the candidate "
            f"join would degenerate into an all-pairs cross product")
    df = ensure_parallelism(df, id_col)
    sigs = minhash_signatures(df, text_col, id_col, k, n_hashes, seed,
                              hash_family)
    pairs = lsh_candidate_pairs(sigs, id_col, n_bands, hash_family)
    return jaccard_verify(df, pairs, text_col, id_col, k, threshold)


# --------------------------------------------------------------------- #
# exact n-gram Jaccard (inverted-index join, no hashing approximation)
# --------------------------------------------------------------------- #
def _ngram_pair_counts(df: DataFrame, text_col: str, id_col: str,
                       k: int, max_doc_freq: int | None) -> DataFrame:
    """Shared inverted-index pair pipeline for the exact n-gram
    similarity family: distinct shingles per doc → (hash, id) postings
    → self-join on the shingle hash (any pair sharing ≥1 shingle) →
    ``(a, b, __common, __na, __nb)``.  Scorers (Jaccard, containment)
    derive their measure from these counts — one pipeline to fix, not
    per-measure copies.

    Postings carry the doc's shingle-set size so |A| and |B| ride
    along to the pair aggregation — no second shingling pass, no size
    joins.  Shingles join as 64-bit hashes, not strings: ~10× smaller
    shuffle and long-vs-long compares (a collision overcounts one
    common shingle; at 2^64 the expected overcount reaches 1 pair only
    past ~10^9 distinct shingles).  ``max_doc_freq`` is the scale
    knob: dropping shingles occurring in more than N docs bounds the
    quadratic per-posting-list term (a stopword shingle in 1M docs
    would emit 10^12 pairs); dropped shingles make derived scores a
    LOWER bound, so it is off by default."""
    df = ensure_parallelism(df, id_col)
    sh = df.select(F.col(id_col),
                   F.array_distinct(shingles(text_col, k)).alias("__sh"))
    inv = sh.select(F.col(id_col), F.size("__sh").alias("__n"),
                    F.explode(F.expr("transform(__sh, s -> xxhash64(s))"))
                    .alias("__s"))
    if max_doc_freq is not None:
        freq = Window.partitionBy("__s")
        inv = (inv.withColumn("__df", F.count(F.lit(1)).over(freq))
               .filter(F.col("__df") <= max_doc_freq).drop("__df"))
    return (inv.alias("l")
            .join(inv.alias("r"),
                  (F.col("l.__s") == F.col("r.__s"))
                  & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")))
            .groupBy(F.col(f"l.{id_col}").alias("a"),
                     F.col(f"r.{id_col}").alias("b"))
            .agg(F.count(F.lit(1)).alias("__common"),
                 F.first("l.__n").alias("__na"),
                 F.first("r.__n").alias("__nb")))


def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", k: int = 3,
                        threshold: float = 0.8,
                        max_doc_freq: int | None = None) -> DataFrame:
    """Exact pairwise n-gram Jaccard ≥ threshold — |A∩B| / |A∪B| over
    the shared inverted-index pipeline (:func:`_ngram_pair_counts`;
    shape and scale knobs documented there)."""
    return (_ngram_pair_counts(df, text_col, id_col, k, max_doc_freq)
            .withColumn("jaccard",
                        F.col("__common")
                        / (F.col("__na") + F.col("__nb")
                           - F.col("__common")))
            .filter(F.col("jaccard") >= threshold)
            .select("a", "b", F.round("jaccard", 6).alias("jaccard")))


def ngram_containment_pairs(df: DataFrame, text_col: str = "text",
                            id_col: str = "doc_id", k: int = 3,
                            threshold: float = 0.9,
                            max_doc_freq: int | None = None) -> DataFrame:
    """Exact pairwise n-gram CONTAINMENT ≥ threshold — the asymmetric
    companion to :func:`ngram_jaccard_pairs` for the web-corpus pattern
    Jaccard structurally misses: a short document embedded in a much
    longer one (boilerplate-wrapped article, quote-with-commentary,
    page + appendix).  Jaccard of a 100-shingle doc inside a
    1000-shingle doc is ≤ 0.1 however perfect the overlap; containment
    ``|A∩B| / min(|A|,|B|)`` is 1.0.  Output: (a, b, containment,
    small) with ``small`` naming the contained (smaller-shingle-set)
    side — the one a keep-longest dedup policy would drop.  Same
    pipeline and scale knobs as Jaccard (:func:`_ngram_pair_counts`)."""
    return (_ngram_pair_counts(df, text_col, id_col, k, max_doc_freq)
            .withColumn("containment",
                        F.col("__common")
                        / F.least(F.col("__na"), F.col("__nb")))
            .filter(F.col("containment") >= threshold)
            .select("a", "b",
                    F.round("containment", 6).alias("containment"),
                    F.when(F.col("__na") <= F.col("__nb"),
                           F.col("a")).otherwise(F.col("b"))
                    .alias("small")))


# --------------------------------------------------------------------- #
# SimHash
# --------------------------------------------------------------------- #
def simhash_bits(hash_family: str) -> int:
    """Signature width per hash family: the portable md5-top-60-bits base
    hash yields 60 usable bits (15 hex chars — 16 would overflow a signed
    long in the engines' hex→int casts); xxhash64 yields the full 64."""
    return 60 if hash_family == "portable" else 64


#: packed-counter lane layout: 2 bit-counters per aggregate long, 32 bits
#: each.  32-bit lanes are overflow-proof by construction — a lane counts
#: tokens of ONE document, and a document is a single Spark string value
#: (hard 2 GiB limit), so its token count is < 2^31: the low lane can
#: never carry into the high lane, and the high lane (count << 32, count
#: < 2^31) never reaches the long's sign bit.  No routing, no cap, one
#: scan.
_LANES = 2
_LANE_BITS = 32


def _simhash_base_expr(hash_family: str) -> str:
    if hash_family == "portable":
        return "cast(conv(substr(md5(__t), 1, 15), 16, 10) as bigint)"
    if hash_family == "xxhash64":
        return "xxhash64(__t)"
    raise ValueError(f"unknown hash_family '{hash_family}'")


def _tokens(df: DataFrame, text_col: str, id_col: str,
            base: str) -> DataFrame:
    return (df.select(F.col(id_col),
                      F.explode(F.split(F.col(text_col), r"\s+"))
                      .alias("__t"))
            .select(F.col(id_col), F.expr(base).alias("__h")))


def _simhash_wide(toks: DataFrame, id_col: str, n_bits: int) -> DataFrame:
    """Reference shape: one ±1 sum-aggregate per bit (n_bits columns).
    Kept as the independent cross-check for the packed shape (tests
    assert identical signatures); not on the production path."""
    bit_cols = [
        F.sum(F.expr(f"CASE WHEN (__h >> {b}) & 1 = 1 THEN 1 ELSE -1 END"))
        .alias(f"__b{b}")
        for b in range(n_bits)
    ]
    with_bits = toks.groupBy(id_col).agg(*bit_cols)
    # shiftleft(1L, b) instead of a literal 1<<b: bit 63 as a Python int
    # literal (2^63) exceeds Long.MAX_VALUE; the JVM shift wraps to the
    # sign bit, which is exactly the bit pattern we want (xxhash64 family
    # only — the portable family stops at bit 59)
    sig = F.lit(0).cast("long")
    for b in range(n_bits):
        sig = sig + F.when(
            F.col(f"__b{b}") > 0,
            F.shiftleft(F.lit(1).cast("long"), b)).otherwise(F.lit(0))
    return with_bits.select(F.col(id_col), sig.alias("simhash"))


def _simhash_packed(toks: DataFrame, id_col: str, n_bits: int) -> DataFrame:
    """SWAR-packed shape: 2 bit-counters per aggregate long (32-bit
    lanes), so 60 bits need 30 sum columns + 1 count instead of 60 —
    half the partial-aggregation state and shuffle bytes per group at
    bit-identical output (the win that matters at 1000 executors, where
    partial aggs ride the shuffle).  See the lane-layout note above for
    why 32-bit lanes cannot overflow."""
    n_packs = -(-n_bits // _LANES)
    pack_cols = [
        F.sum(F.expr(" + ".join(
            f"(((__h >> {p * _LANES + lane}) & 1) << {lane * _LANE_BITS})"
            for lane in range(_LANES) if p * _LANES + lane < n_bits)))
        .alias(f"__p{p}")
        for p in range(n_packs)
    ]
    agg = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("__n"),
                                   *pack_cols)
    # bit b set iff 2 * count_of_ones(b) > n_tokens — exactly the sign
    # of the wide path's ±1 sum (2c - n > 0), so signatures are
    # bit-identical across the two shapes
    sig = F.lit(0).cast("long")
    for b in range(n_bits):
        count_b = F.expr(
            f"(__p{b // _LANES} >> {(b % _LANES) * _LANE_BITS}) "
            f"& {(1 << _LANE_BITS) - 1}")
        sig = sig + F.when(
            count_b * 2 > F.col("__n"),
            F.shiftleft(F.lit(1).cast("long"), b)).otherwise(F.lit(0))
    return agg.select(F.col(id_col), sig.alias("simhash"))


def simhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       hash_family: str = "portable") -> DataFrame:
    """60/64-bit SimHash over word tokens, fully JVM-side.

    For each bit position the signature bit is the sign of the ±1 sum of
    the token hashes' bit values.  Shape: explode tokens → hash each once
    → SWAR-packed bit-count aggregation (:func:`_simhash_packed` — half
    the aggregate columns/state of one-sum-per-bit, identical output,
    overflow-proof by the 32-bit-lane argument).  The ``portable`` family
    (default) makes signatures reproducible in ANSI SQL — see
    _PORTABLE_BASE_HASH."""
    n_bits = simhash_bits(hash_family)
    base = _simhash_base_expr(hash_family)
    return _simhash_packed(_tokens(df, text_col, id_col, base),
                           id_col, n_bits)


def simhash_near_duplicates(df: DataFrame, text_col: str = "text",
                            id_col: str = "doc_id",
                            max_hamming: int = 3,
                            hash_family: str = "portable") -> DataFrame:
    """Manku-style banding: split the signature into ``max_hamming + 1``
    chunks — by pigeonhole, any pair within Hamming distance ≤
    max_hamming shares at least one exact chunk → bucket-join on
    (chunk_idx, chunk_value), then exact Hamming filter via
    bit_count(xor).  Chunk count scales with the threshold so candidate
    recall is guaranteed for ANY max_hamming (a fixed 4-chunk split would
    silently miss pairs at max_hamming ≥ 4)."""
    n_bits = simhash_bits(hash_family)
    if not 0 <= max_hamming <= n_bits - 1:
        raise ValueError(
            f"max_hamming must be in [0, {n_bits - 1}], got {max_hamming}")
    df = ensure_parallelism(df, id_col)
    sigs = simhash_signatures(df, text_col, id_col, hash_family)
    n_chunks = max_hamming + 1
    base = n_bits // n_chunks
    chunk_exprs = []
    for c in range(n_chunks):
        off = c * base
        width = base if c < n_chunks - 1 else n_bits - off
        if width >= 64:
            val = F.col("simhash")
        else:
            # arithmetic >> sign-extends; the mask truncates back to width
            val = F.expr(f"(simhash >> {off}) & {(1 << width) - 1}")
        chunk_exprs.append(
            F.struct(F.lit(c).alias("chunk"), val.cast("long").alias("val")))
    chunks = (sigs.select(F.col(id_col), F.col("simhash"),
                          F.explode(F.array(*chunk_exprs)).alias("__cv"))
              .select(F.col(id_col), F.col("simhash"),
                      F.col("__cv.chunk").alias("chunk"),
                      F.col("__cv.val").alias("val")))
    left, right = chunks.alias("l"), chunks.alias("r")
    pairs = (left.join(right,
                       (F.col("l.chunk") == F.col("r.chunk"))
                       & (F.col("l.val") == F.col("r.val"))
                       & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")))
             .select(F.col(f"l.{id_col}").alias("a"),
                     F.col(f"r.{id_col}").alias("b"),
                     F.bit_count(F.col("l.simhash").bitwiseXOR(
                         F.col("r.simhash"))).alias("hamming"))
             .distinct()
             .filter(F.col("hamming") <= max_hamming))
    return pairs


def duplicate_clusters_star(pairs: DataFrame, src: str = "a",
                            dst: str = "b",
                            max_iter: int = 25) -> DataFrame:
    """Connected components in O(log n) rounds via alternating
    large-star / small-star (Kiveris et al., "Connected Components in
    MapReduce and Beyond", SoCC'14) → same ``(doc_id, cluster_id)``
    contract as :func:`duplicate_clusters`.

    :func:`duplicate_clusters`' min-label propagation converges in
    graph-*diameter* rounds — fine for near-dup clusters (dense, shallow)
    but O(n) rounds on an adversarial path graph.  The star operations
    instead contract whole neighborhoods toward their minimum each round:

    - **large-star**: every node links its larger neighbors directly to
      the smallest node in its closed neighborhood;
    - **small-star**: every node re-links its smaller neighbors (and
      itself) to that minimum.

    Each round is two groupBy-min + join passes over the edge set, and
    the edge set only ever shrinks toward a forest of stars centered at
    component minima, reached in O(log n) rounds on ANY graph shape.

    Convergence is detected in two tiers: a cheap per-round fingerprint
    (edge count + exact decimal endpoint sums — one aggregate, no join),
    and only when the fingerprint stops moving, an exact set-equality
    check (anti-join emptiness) to rule out a fingerprint collision.  In
    the common case the two anti-joins run exactly once, at the fixed
    point.
    """
    from pyspark.sql import Observation

    # oriented larger→smaller directly via (greatest, least): the old
    # shape symmetrized with a self-union — embedding the caller's
    # whole pair-generation plan TWICE in the first checkpoint job —
    # and then kept u > v, which is exactly this one-scan projection.
    # NULL-endpoint pairs drop either way (u != v is NULL → filtered).
    oriented = (pairs.select(F.greatest(F.col(src), F.col(dst)).alias("u"),
                             F.least(F.col(src), F.col(dst)).alias("v"))
                .filter(F.col("u") != F.col("v"))
                .distinct())

    def ckpt_with_fp(e: DataFrame) -> tuple[DataFrame, tuple]:
        # the round fingerprint (edge count + exact decimal endpoint
        # sums) rides the checkpoint materialization as OBSERVED
        # metrics — one job per round instead of checkpoint + a
        # separate aggregation scan
        obs = Observation()
        out = e.observe(
            obs, F.count(F.lit(1)).alias("n"),
            F.sum(F.col("u").cast(T.DecimalType(38, 0))).alias("su"),
            F.sum(F.col("v").cast(T.DecimalType(38, 0))).alias("sv"),
        ).localCheckpoint()
        m = obs.get
        return out, (m["n"], m["su"], m["sv"])

    edges, fp = ckpt_with_fp(oriented)
    # the node set derives from the CHECKPOINTED edges (every node of a
    # non-self pair lands on one side of some larger→smaller edge) —
    # the old shape materialized nodes straight off the symmetrized
    # pairs, re-executing the caller's whole pair generation a second
    # time.  Both endpoints come from ONE edge scan (explode, not a
    # self-union).  Lazy: its single consumer is the final labeling
    # join.
    nodes = (edges.select(F.explode(F.array("u", "v")).alias("id"))
             .distinct())

    def _large_star(e: DataFrame) -> DataFrame:
        """(v, m) for every neighbor v > u, m = min of closed nbhd."""
        # both directions from one scan of the round's checkpointed
        # edges (a self-union would scan it twice per reference)
        s = (e.select(F.explode(F.array(
                 F.struct("u", "v"),
                 F.struct(F.col("v").alias("u"), F.col("u").alias("v"))))
             .alias("__e"))
             .select("__e.u", "__e.v"))
        m = (s.groupBy("u").agg(F.min("v").alias("__mn"))
             .select(F.col("u"),
                     F.least(F.col("__mn"), F.col("u")).alias("m")))
        return (s.join(m, "u")
                .filter(F.col("v") > F.col("u"))
                .select(F.col("v").alias("u"), F.col("m").alias("v"))
                .filter(F.col("u") != F.col("v"))
                .distinct())

    def _small_star(e: DataFrame) -> DataFrame:
        """Re-link smaller neighbors (and self) to the neighborhood min;
        input/output both oriented larger→smaller."""
        m = (e.groupBy("u").agg(F.min("v").alias("m")))
        return (e.join(m, "u")
                .select(F.col("v").alias("u"), F.col("m").alias("v"))
                .unionByName(m.select(F.col("u"), F.col("m").alias("v")))
                .filter(F.col("u") != F.col("v"))
                .distinct())

    for _ in range(max_iter):
        nxt, nfp = ckpt_with_fp(_small_star(_large_star(edges)))
        if nfp == fp:
            # fingerprint collision is possible in principle — confirm
            # the fixed point with exact set equality before stopping
            # (both difference directions unioned into ONE emptiness
            # job instead of two sequential anti-join jobs)
            if (nxt.exceptAll(edges)
                    .unionAll(edges.exceptAll(nxt)).isEmpty()):
                edges = nxt
                break
        edges, fp = nxt, nfp
    # at the fixed point every non-minimum node has exactly the edge
    # (node → component min); minima have no outgoing edge.  The
    # groupBy-min collapse is a no-op there, but if max_iter ran out
    # before convergence a node may still carry several outgoing edges —
    # min-collapsing keeps the one-row-per-doc contract (the labeling is
    # then merely under-merged, the same failure mode as min-label
    # propagation hitting ITS iteration cap, never duplicated rows)
    best = edges.groupBy("u").agg(F.min("v").alias("v"))
    return (nodes.join(best, nodes["id"] == best["u"], "left")
            .select(nodes["id"].alias("doc_id"),
                    F.coalesce(F.col("v"), nodes["id"]).alias("cluster_id")))


def duplicate_clusters(pairs: DataFrame, src: str = "a", dst: str = "b",
                       max_iter: int = 20) -> DataFrame:
    """Connected components over near-duplicate pairs → ``(doc_id,
    cluster_id)``, where ``cluster_id`` is the smallest doc id reachable
    through the pair graph.  The keep-one-per-cluster policy is then
    ``filter(doc_id == cluster_id)`` — the graph generalization of
    :func:`exact_duplicates`'s keep-min-id.

    Algorithm: iterative min-label propagation — each round every node
    takes the min of its own label and its neighbors' labels; converges
    in graph-diameter rounds.  Near-dup clusters are dense and shallow
    (pairs share content), so the diameter is small; for general graphs
    swap in the O(log n)-round large-star/small-star variant (Kiveris et
    al., "Connected Components in MapReduce and Beyond", SoCC'14).

    Scale notes: each round is one shuffle (join on node id) + one
    aggregation; ``localCheckpoint`` truncates the plan lineage so round
    N doesn't recompile/replay rounds 1..N-1 (iterative DataFrame loops
    otherwise grow an exponential plan).  The driver-side loop runs
    O(diameter) COUNTs on the label delta — bounded scalar actions, the
    same legitimacy class as ivf_centroids' bounded collect.
    """
    from pyspark.sql import Observation

    # checkpoint the edge list once: every round joins against it, and
    # without this the (possibly expensive) upstream pair-generation
    # lineage would re-execute per round per action
    # symmetrize with explode, not a self-union: a union embeds the
    # caller's pair-generation plan twice in this one checkpoint job
    edges = (pairs.select(F.explode(F.array(
                 F.struct(F.col(src).alias("u"), F.col(dst).alias("v")),
                 F.struct(F.col(dst).alias("u"), F.col(src).alias("v"))))
             .alias("__e"))
             .select("__e.u", "__e.v")
             .distinct()
             .localCheckpoint())

    def ckpt_with_sum(frame) -> tuple[DataFrame, object]:
        # exact decimal label sum — labels only ever decrease, so the
        # total strictly decreases iff ANY label changed (decimal, not
        # long: a billion-node graph with 64-bit ids would overflow a
        # long sum).  The sum rides the checkpoint materialization as
        # an OBSERVED metric, so each round runs ONE job, not a
        # checkpoint job plus a separate aggregation scan.
        obs = Observation()
        out = frame.observe(
            obs, F.sum(F.col("cluster_id").cast(T.DecimalType(38, 0)))
            .alias("s")).localCheckpoint()
        return out, obs.get["s"]

    labels, prev_sum = ckpt_with_sum(
        edges.select(F.col("u").alias("id")).distinct()
        .withColumn("cluster_id", F.col("id")))
    for _ in range(max_iter):
        # one shuffle fewer per round than the join+left-join shape:
        # each node's new label = min over (own label ∪ neighbor
        # labels) via union + groupBy-min — identical update rule, so
        # the label sequence (and round count) is unchanged
        contrib = (edges.join(labels, edges["v"] == labels["id"])
                   .select(F.col("u").alias("id"), "cluster_id"))
        updated = (labels.unionByName(contrib)
                   .groupBy("id").agg(F.min("cluster_id")
                                      .alias("cluster_id")))
        labels, cur_sum = ckpt_with_sum(updated)
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels.withColumnRenamed("id", "doc_id")


# --------------------------------------------------------------------- #
# edit-distance fuzzy matching
# --------------------------------------------------------------------- #
def edit_distance_pairs(df: DataFrame, text_col: str, id_col: str,
                        max_distance: int = 2,
                        prefix_len: int = 2) -> DataFrame:
    """Near-identical string pairs by Levenshtein distance, with
    blocking so the quadratic term never sees the full table.

    Classic record-linkage shape: candidate pairs are generated only
    within a *block* — here ``(length bucket, first prefix_len chars)``
    — then verified with the exact ``levenshtein`` distance (a JVM
    builtin; no Python).  Two strings within distance d differ in
    length by at most d, so blocking on ``length div (d+1)`` keeps
    same-bucket recall for same-length-bucket edits while bounding each
    block's candidate count; the prefix block cuts further (documented
    trade: an edit inside the first ``prefix_len`` chars escapes the
    block — multi-pass blocking on different keys is the standard
    recall fix, same union shape).

    At 100 TB: the self-join shuffles on the block key; block sizes are
    data-dependent, so pair volume is bounded by the blocking choice,
    never O(n²) global.

    Output: ``(a, b, dist)`` with a < b, dist <= max_distance.
    """
    return _blocked_edit_pairs(
        df, text_col, id_col, max_distance,
        F.substring(F.col(text_col), 1, prefix_len))


def _blocked_edit_pairs(df: DataFrame, text_col: str, id_col: str,
                        max_distance: int, affix: Column) -> DataFrame:
    """One blocked-Levenshtein pass: block key = (length bucket,
    ``affix``) — the shared body of the prefix and suffix passes."""
    blocked = df.select(
        F.col(id_col), F.col(text_col),
        F.floor(F.length(text_col) / (max_distance + 1)).alias("__lb"),
        affix.alias("__pb"))
    left, right = blocked.alias("l"), blocked.alias("r")
    lid, rid = F.col(f"l.{id_col}"), F.col(f"r.{id_col}")
    dist = F.levenshtein(F.col(f"l.{text_col}"), F.col(f"r.{text_col}"))
    return (left.join(right,
                      (F.col("l.__lb") == F.col("r.__lb"))
                      & (F.col("l.__pb") == F.col("r.__pb"))
                      & (lid < rid))
            .select(lid.alias("a"), rid.alias("b"), dist.alias("dist"))
            .filter(F.col("dist") <= max_distance))


def pair_metrics(predicted: DataFrame, truth: DataFrame) -> DataFrame:
    """Precision/recall of a predicted pair set against ground truth —
    the evaluation harness for any near-dup detector (both inputs are
    ``(a, b)`` with a < b; extra columns ignored).

    One full-outer join on the pair key + one scalar aggregate — a
    single job, no driver-side counting, works at any scale the pair
    sets themselves exist at.  Output: one row (n_predicted, n_truth,
    tp, fp, fn, precision, recall, f1).
    """
    p = (predicted.select("a", "b").distinct()
         .withColumn("__p", F.lit(1)))
    t = truth.select("a", "b").distinct().withColumn("__t", F.lit(1))
    j = p.join(t, ["a", "b"], "full_outer")
    # outer COALESCE: SUM over zero rows (both pair sets empty) is
    # null, and the counts must stay longs
    agg = j.agg(
        F.coalesce(F.sum(F.coalesce(F.col("__p"), F.lit(0))), F.lit(0))
        .alias("n_predicted"),
        F.coalesce(F.sum(F.coalesce(F.col("__t"), F.lit(0))), F.lit(0))
        .alias("n_truth"),
        F.coalesce(F.sum(F.when(F.col("__p").isNotNull()
                                & F.col("__t").isNotNull(), 1)
                         .otherwise(0)), F.lit(0))
        .alias("tp"))
    prec = F.when(F.col("n_predicted") > 0,
                  F.col("tp") / F.col("n_predicted")).otherwise(0.0)
    rec = F.when(F.col("n_truth") > 0,
                 F.col("tp") / F.col("n_truth")).otherwise(0.0)
    return agg.select(
        F.col("n_predicted").cast("long"),
        F.col("n_truth").cast("long"),
        F.col("tp").cast("long"),
        (F.col("n_predicted") - F.col("tp")).cast("long").alias("fp"),
        (F.col("n_truth") - F.col("tp")).cast("long").alias("fn"),
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(F.when(prec + rec > 0,
                       2 * prec * rec / (prec + rec)).otherwise(0.0), 6)
        .alias("f1"))


def incremental_near_duplicates(existing: DataFrame, new: DataFrame,
                                text_col: str = "text",
                                id_col: str = "doc_id", k: int = 3,
                                n_hashes: int = 32, n_bands: int = 8,
                                threshold: float = 0.8, seed: int = 42,
                                hash_family: str = "portable",
                                ) -> DataFrame:
    """Near-dups of an INCOMING batch against an existing corpus — the
    production ingest path: the corpus is never re-compared against
    itself, only the batch's bands join the corpus's bands.

    Per-batch cost is |batch| signature work + a band join whose corpus
    side is the (materializable) signature table — at 100 TB you
    persist ``minhash_signatures(corpus)`` once (bucketed by band hash)
    and each nightly batch probes it; this function takes the two
    frames, so the caller chooses recompute vs read-from-disk.

    Output: (a = existing id, b = new id, jaccard >= threshold) —
    exactly the cross-set subset of the pairs the full union pipeline
    would emit (the property the oracle checks).
    """
    sig_e = minhash_signatures(ensure_parallelism(existing, id_col),
                               text_col, id_col, k, n_hashes, seed,
                               hash_family)
    sig_n = minhash_signatures(ensure_parallelism(new, id_col),
                               text_col, id_col, k, n_hashes, seed,
                               hash_family)
    be = (banded_signatures(sig_e, id_col, n_bands, hash_family)
          .select(F.col(id_col).alias("a"), "band", "band_hash"))
    bn = (banded_signatures(sig_n, id_col, n_bands, hash_family)
          .select(F.col(id_col).alias("b"), "band", "band_hash"))
    cand = (bn.join(be, ["band", "band_hash"])
            .select("a", "b").distinct())
    texts = (existing.select(id_col, text_col)
             .unionByName(new.select(id_col, text_col)))
    return jaccard_verify(texts, cand, text_col, id_col, k, threshold)


def edit_distance_pairs_multipass(df: DataFrame, text_col: str,
                                  id_col: str, max_distance: int = 2,
                                  affix_len: int = 2) -> DataFrame:
    """Two-pass blocked Levenshtein matching: pass 1 blocks on
    (length bucket, prefix), pass 2 on (length bucket, SUFFIX), union
    distinct.  An edit inside the first ``affix_len`` chars escapes the
    prefix block but not the suffix block (and vice versa), so any
    single-edit pair within the length bucket survives at least one
    pass — the standard multi-pass recall fix for blocked record
    linkage, at exactly 2× the bounded per-pass cost.  (A pair with
    edits in BOTH affixes and nowhere else still needs a third key —
    documented residual, not silent.)"""
    prefix = _blocked_edit_pairs(
        df, text_col, id_col, max_distance,
        F.substring(F.col(text_col), 1, affix_len))
    suffix = _blocked_edit_pairs(
        df, text_col, id_col, max_distance,
        F.substring(F.col(text_col), -affix_len, affix_len))
    return prefix.unionByName(suffix).distinct()


def duplicated_spans(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", k: int = 8,
                     min_docs: int = 2) -> DataFrame:
    """Exact duplicated k-token spans across documents — the
    exact-substring side of training-data dedup (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"),
    complementing the whole-doc near-dup MinHash path: two documents
    that are globally dissimilar can still share a verbatim boilerplate
    span that an LM will memorize.

    Shape: explode every k-gram position (NOT distinct — within-doc
    repeats count toward ``n_occurrences``) → ONE groupBy(gram) with
    map-side partial aggregation → keep grams seen in >= ``min_docs``
    distinct documents.  A pure aggregation: one shuffle keyed on the
    gram, no joins, linear in corpus token count — at 100 TB this is
    the same cost class as a word count.  (The reference's nearest
    analog is its GROUP BY + COUNT pipeline, GroupByOperator.java +
    SelectOperator countAgg; the span semantics are the
    beyond-reference training-pipeline extension.)

    Output: (gram, n_docs, n_occurrences), unaggregated order.
    """
    grams = df.select(F.col(id_col),
                      F.explode(shingles(text_col, k)).alias("gram"))
    return (grams.groupBy("gram")
            .agg(F.countDistinct(id_col).alias("n_docs"),
                 F.count("*").alias("n_occurrences"))
            .where(F.col("n_docs") >= min_docs))


def span_dup_coverage(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", k: int = 8,
                      min_docs: int = 2) -> DataFrame:
    """Per-document fraction of k-gram positions lying inside a span
    duplicated across >= ``min_docs`` documents — the removal metric of
    exact-substring dedup (how much of each doc is cross-corpus
    boilerplate; docs above a threshold get trimmed or dropped).

    Shape: the gram explode feeds BOTH sides — per-doc totals
    (groupBy id) and the duplicated-gram set (groupBy gram) — then one
    inner join back on the gram counts only duplicated positions.  The
    join is gram-keyed against an already-aggregated set (one row per
    duplicated gram), so its size is bounded by the duplicated
    vocabulary, not the corpus; Spark recomputes the shared explode per
    branch (a projection over the same scan — cheap, columnar, and at
    100 TB preferable to materializing the exploded grams).

    Output: (doc_id, n_spans, n_dup_spans, dup_ratio) for docs with at
    least one duplicated span; counts exact ints, ratio rounded.
    """
    grams = df.select(F.col(id_col),
                      F.explode(shingles(text_col, k)).alias("gram"))
    dup = (grams.groupBy("gram")
           .agg(F.countDistinct(id_col).alias("__nd"))
           .where(F.col("__nd") >= min_docs)
           .select("gram"))
    totals = grams.groupBy(id_col).agg(F.count("*").alias("n_spans"))
    dups = (grams.join(dup, "gram")
            .groupBy(id_col).agg(F.count("*").alias("n_dup_spans")))
    return (totals.join(dups, id_col)
            .select(F.col(id_col), "n_spans", "n_dup_spans",
                    F.round(F.col("n_dup_spans")
                            / F.col("n_spans"), 6).alias("dup_ratio")))
