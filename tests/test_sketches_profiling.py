"""Sketches (HLL, Count-Min), Bloom semi-join, edit-distance fuzzy
dedup, k-means, LM stats, profiling, weighted sampling — the round-6
batch-2 operators.

The scale claims under test alongside correctness: the Bloom mask
really prunes the probe scan (not just "result is right"), CMS error is
one-sided, HLL lands within its published error envelope, and weighted
sampling is partition-layout-independent (the property ``rand(seed)``
does not give)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from cs186_query_optimization_project_spark.functions import (
    dedup,
    profiling,
    sampling,
    sketches,
    similarity,
    text,
)
from cs186_query_optimization_project_spark.operators import joins

from tests.conftest import rows


# --------------------------------------------------------------------- #
# HyperLogLog
# --------------------------------------------------------------------- #
def test_hll_estimate_within_error_envelope(spark):
    # 10,000 distinct values at m=256: standard error ~1.04/sqrt(256)
    # = 6.5%; assert within 4 sigma
    vals = spark.range(10000).select(F.col("id").cast("string").alias("v"))
    row = sketches.hll_distinct(vals, "v", m=256).collect()[0]
    assert row["exact_distinct"] == 10000
    assert abs(row["estimate"] - 10000) / 10000 < 4 * 1.04 / 16

def test_hll_insensitive_to_duplication(spark):
    # HLL registers depend only on the SET of values: duplicating every
    # row must not move the estimate
    vals = spark.range(1000).select(F.col("id").cast("string").alias("v"))
    doubled = vals.unionAll(vals)
    a = sketches.hll_distinct(vals, "v").collect()[0]["estimate"]
    b = sketches.hll_distinct(doubled, "v").collect()[0]["estimate"]
    assert a == b


def test_hll_registers_merge_by_max(spark):
    # sketch(A ∪ B) == merge(sketch(A), sketch(B)) via groupBy-max —
    # the mergeability that makes HLL shardable across 1000 executors
    a = spark.range(0, 3000).select(F.col("id").cast("string").alias("v"))
    b = spark.range(2000, 5000).select(
        F.col("id").cast("string").alias("v"))
    whole = sketches.hll_registers(a.unionAll(b), "v")
    merged = (sketches.hll_registers(a, "v")
              .unionByName(sketches.hll_registers(b, "v"))
              .groupBy("register").agg(F.max("rho").alias("rho")))
    assert rows(whole) == rows(merged)


def test_hll_by_group_matches_per_group_global_sketch(spark):
    # each group's sketch must equal the global sketch of that group's
    # rows alone — grouping threads through, it doesn't cross-pollute
    df = spark.range(6000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        # overlapping value domains across groups
        (F.col("id") % 2000).cast("string").alias("v"))
    grouped = {r["g"]: r for r in
               sketches.hll_distinct_by(df, "v", ["g"]).collect()}
    assert set(grouped) == {"0", "1", "2"}
    for g in ("0", "1", "2"):
        solo = sketches.hll_distinct(
            df.filter(F.col("g") == g), "v").collect()[0]
        assert grouped[g]["estimate"] == solo["estimate"]
        assert grouped[g]["filled_registers"] == solo["filled_registers"]
        assert grouped[g]["exact_distinct"] == solo["exact_distinct"]


def test_hll_by_group_registers_merge_with_global(spark):
    # per-group registers groupBy-max-merge into exactly the global
    # register table (same template ⇒ lambda-merge stays sound)
    df = spark.range(4000).select(
        (F.col("id") % 4).cast("string").alias("g"),
        (F.col("id") % 1500).cast("string").alias("v"))
    merged = (sketches.hll_registers_by(df, "v", ["g"])
              .groupBy("register").agg(F.max("rho").alias("rho")))
    assert rows(merged) == rows(sketches.hll_registers(df, "v"))


# --------------------------------------------------------------------- #
# Count-Min
# --------------------------------------------------------------------- #
def test_cms_one_sided_error(spark):
    # estimate >= exact for EVERY key, tight grid or not
    vals = spark.range(5000).select(
        (F.col("id") % 97).cast("string").alias("v"))
    out = sketches.cms_heavy_hitters(vals, "v", k=97, d=3, w=64).collect()
    assert len(out) == 97
    assert all(r["cms_estimate"] >= r["exact_count"] for r in out)


def test_cms_exact_when_no_collisions(spark):
    # 20 keys in a 3x2048 grid: collisions in all 3 rows are
    # vanishingly unlikely, so min-of-rows recovers exact counts
    vals = spark.range(2000).select(
        (F.col("id") % 20).cast("string").alias("v"))
    out = sketches.cms_heavy_hitters(vals, "v", k=20).collect()
    assert all(r["cms_estimate"] == r["exact_count"] == 100 for r in out)


# --------------------------------------------------------------------- #
# Bloom semi-join
# --------------------------------------------------------------------- #
def test_bloom_semi_join_exact_and_pruning(spark):
    probe = spark.range(2000).select(F.col("id").alias("k"),
                                     (F.col("id") * 7).alias("payload"))
    build = spark.range(50).select((F.col("id") * 40).alias("bk"))
    out = joins.bloom_semi_join(probe, build, "k", "bk")
    exact = probe.join(build, probe["k"] == build["bk"], "leftsemi")
    assert rows(out) == rows(exact)
    # the mask must PRUNE: candidates well under probe size, and never
    # under the true match count (no false negatives)
    mask = joins.bloom_mask(build, "bk")
    n_cand = probe.filter(joins.bloom_test("k", mask)).count()
    assert 50 <= n_cand < 400  # 2000 keys, ~50/16384 bits set * 3


def test_bloom_mask_distributed_or_fold(spark):
    # mask built from a repartitioned build side is identical —
    # bit_or partial aggregation is layout-independent
    build = spark.range(100).select((F.col("id") * 13).alias("bk"))
    assert (joins.bloom_mask(build, "bk")
            == joins.bloom_mask(build.repartition(7), "bk"))


def test_bloom_adaptive_sizing_widens_mask():
    # small key sets sit on the 16 Kbit floor; a large key set widens
    # the mask (power of two, ~10 bits/key); an enormous one returns
    # None (the caller skips the Bloom pass entirely)
    assert joins.adaptive_bloom_m(100) == 16384
    assert joins.adaptive_bloom_m(1500) == 16384
    m_big = joins.adaptive_bloom_m(40_000)
    assert m_big == 1 << 19 and m_big & (m_big - 1) == 0
    assert joins.adaptive_bloom_m(100_000) == joins._BLOOM_MAX_M
    # ~242k keys (m·ln2/k) is the 50%-fill frontier at the 2^20 ceiling, k=3
    assert joins.adaptive_bloom_m(500_000) is None


def test_bloom_saturated_and_skipped_paths_stay_exact(spark):
    probe = spark.range(2000).select(F.col("id").alias("k"),
                                     (F.col("id") * 7).alias("payload"))
    build = spark.range(50).select((F.col("id") * 40).alias("bk"))
    exact = rows(probe.join(build, probe["k"] == build["bk"], "leftsemi"))
    # forced-tiny mask (m=64, fully saturated): prunes nothing but the
    # final semi-join keeps the result exact
    out_sat = joins.bloom_semi_join(probe, build, "k", "bk", m=64)
    assert rows(out_sat) == exact
    # adaptive skip path: monkeypatch the frontier so the adaptive
    # sizing declines a mask — plan must contain no md5 Bloom filter,
    # result identical
    orig = joins._BLOOM_MIN_M, joins._BLOOM_MAX_M
    joins._BLOOM_MIN_M = joins._BLOOM_MAX_M = 64
    try:
        out_skip = joins.bloom_semi_join(probe, build, "k", "bk")
        plan = out_skip._jdf.queryExecution().executedPlan().toString()
        assert "md5" not in plan
        assert rows(out_skip) == exact
    finally:
        joins._BLOOM_MIN_M, joins._BLOOM_MAX_M = orig


# --------------------------------------------------------------------- #
# edit-distance fuzzy dedup
# --------------------------------------------------------------------- #
def test_edit_distance_pairs_finds_planted_typo(spark):
    names = [(1, "chartreuse goldenrod lace"),
             (2, "chartreuse goldenrod lace"),   # exact dup of 1
             (3, "chXrtreuse goldenrod lace"),   # 1 edit from 1 (pos 3)
             (4, "completely different thing")]
    df = spark.createDataFrame(names, ["id", "name"])
    got = {(r["a"], r["b"]): r["dist"]
           for r in dedup.edit_distance_pairs(df, "name", "id",
                                              max_distance=2).collect()}
    assert got[(1, 2)] == 0 and got[(1, 3)] == 1 and got[(2, 3)] == 1
    assert not any(4 in p for p in got)


def test_edit_distance_blocking_bounds_candidates(spark):
    # strings in different length buckets are never compared, even if
    # within max_distance (documented recall trade for boundedness)
    df = spark.createDataFrame(
        [(1, "ab"), (2, "abcdef")], ["id", "name"])
    assert dedup.edit_distance_pairs(df, "name", "id",
                                     max_distance=4).count() == 0


# --------------------------------------------------------------------- #
# k-means
# --------------------------------------------------------------------- #
@pytest.fixture(scope="module")
def blobs(spark):
    # two tight blobs far apart in 4-d
    pts = ([(i, [10.0 + 0.01 * i, 10.0, 0.0, 0.0]) for i in range(30)]
           + [(100 + i, [-10.0, -10.0 - 0.01 * i, 0.0, 0.0])
              for i in range(30)])
    return (spark.createDataFrame(pts, ["vec_id", "embedding"])
            .select("vec_id", F.col("embedding").cast("array<float>")
                    .alias("embedding")))


def test_kmeans_separates_blobs(blobs):
    assigned, cents = similarity.kmeans(blobs, k=2, n_iter=3)
    clusters = (assigned.groupBy("cluster")
                .agg(F.count(F.lit(1)).alias("n"),
                     F.avg("dist").alias("d")).collect())
    assert sorted(r["n"] for r in clusters) == [30, 30]
    # after convergence each blob sits on its own centroid: tiny spread
    assert all(r["d"] < 1.0 for r in clusters)


def test_kmeans_iteration_decreases_distortion(blobs):
    def distortion(n_iter):
        out = similarity.kmeans_summary(blobs, k=2, n_iter=n_iter)
        return sum(r["n_members"] * r["mean_sq_dist"]
                   for r in out.collect())
    assert distortion(3) <= distortion(1) <= distortion(0) + 1e-9


def test_kmeans_init_frozen(spark):
    # the oracle pins this generator by checksum — drift must be loud
    import hashlib
    c = similarity.kmeans_init(64, 8, 42)
    assert (hashlib.md5(repr(c).encode()).hexdigest()
            == "f2c5bff4c903bf58f044859a1bae3442")
    assert all(abs(sum(x * x for x in row) - 1.0) < 1e-9 for row in c)


# --------------------------------------------------------------------- #
# LM statistics
# --------------------------------------------------------------------- #
def test_unigram_logprob_ranks_rare_docs_lower(spark):
    df = spark.createDataFrame(
        [(1, "the the the the"),        # most common token only
         (2, "the the rareword the")],  # one rare token
        ["doc_id", "text"])
    out = {r["doc_id"]: r for r in text.unigram_logprob(df).collect()}
    assert out[1]["avg_logprob"] > out[2]["avg_logprob"]
    assert out[1]["n_tokens"] == 4
    # p(the)=7/8 -> avg_logprob = ln(7/8)
    assert abs(out[1]["avg_logprob"] - math.log(7 / 8)) < 1e-5


def test_bigram_conditional_probs_sum_to_one(spark):
    df = spark.createDataFrame(
        [(1, "a b a b a c"), (2, "a b a b a b")], ["doc_id", "text"])
    out = text.bigram_counts(df, min_count=1).collect()
    by_first = {}
    for r in out:
        first = r["bigram"].split(" ")[0]
        by_first.setdefault(first, 0.0)
        by_first[first] += r["cond_prob"]
    for tot in by_first.values():
        assert abs(tot - 1.0) < 1e-4


# --------------------------------------------------------------------- #
# profiling
# --------------------------------------------------------------------- #
def test_key_skew_flags_hot_key(spark):
    df = spark.createDataFrame(
        [(i % 10,) for i in range(90)] + [(99,)] * 110, ["k"])
    row = profiling.key_skew(df, "k").collect()[0]
    assert row["n_keys"] == 11 and row["n_rows"] == 200
    assert row["max_count"] == 110
    assert row["skew_ratio"] > 6 and row["hot_keys"] == 1


def test_zscore_outliers_finds_planted(spark):
    data = [(i, "g", 10.0) for i in range(50)] + [(99, "g", 1000.0)]
    df = spark.createDataFrame(data, ["id", "grp", "v"])
    out = profiling.zscore_outliers(df, "v", "grp", threshold=3.0)
    got = out.collect()
    assert [r["id"] for r in got] == [99]
    assert got[0]["zscore"] > 3


def test_zscore_constant_group_yields_none(spark):
    df = spark.createDataFrame([(i, "g", 5.0) for i in range(10)],
                               ["id", "grp", "v"])
    assert profiling.zscore_outliers(df, "v", "grp").count() == 0


# --------------------------------------------------------------------- #
# weighted sampling
# --------------------------------------------------------------------- #
def test_weighted_sample_layout_independent(spark):
    df = spark.range(2000).select(F.col("id"),
                                  (F.col("id") % 100 + 1.0).alias("w"))
    a = rows(sampling.weighted_sample(df, "w", "id", rate=0.5))
    b = rows(sampling.weighted_sample(df.repartition(13), "w", "id",
                                      rate=0.5))
    assert a == b and len(a) > 0


def test_weighted_sample_prefers_heavy_rows(spark):
    df = spark.range(4000).select(
        F.col("id"),
        F.when(F.col("id") < 2000, 1.0).otherwise(100.0).alias("w"))
    out = sampling.weighted_sample(df, "w", "id", rate=0.5)
    light = out.filter("id < 2000").count()
    heavy = out.filter("id >= 2000").count()
    # heavy rows keep with p=0.5, light with p=0.005
    assert heavy > 800 and light < 40
    # zero-weight rows are never kept
    z = spark.range(100).select(F.col("id"), F.lit(0.0).alias("w"))
    zero = sampling.weighted_sample(
        z.unionAll(spark.range(100, 200).select(F.col("id"),
                                                F.lit(5.0).alias("w"))),
        "w", "id", rate=1.0)
    assert zero.filter("w = 0.0").count() == 0


# --------------------------------------------------------------------- #
# PSI drift / correlation / dedup evaluation (batch 3)
# --------------------------------------------------------------------- #
def test_psi_zero_for_identical_samples(spark):
    df = spark.range(1000).select((F.col("id") % 37).cast("double")
                                  .alias("v"))
    out = profiling.psi_drift(df, df, "v", n_bins=10).collect()
    assert sum(r["psi_term"] for r in out) < 1e-9
    assert all(r["pct_a"] == r["pct_b"] for r in out)


def test_psi_detects_shift(spark):
    a = spark.range(1000).select((F.col("id") % 100).cast("double")
                                 .alias("v"))
    b = spark.range(1000).select((F.col("id") % 100 + 60).cast("double")
                                 .alias("v"))
    out = profiling.psi_drift(a, b, "v", n_bins=10).collect()
    assert sum(r["psi_term"] for r in out) > 0.25  # "action" territory


def test_correlation_matrix_known_values(spark):
    df = spark.range(100).select(
        F.col("id").cast("double").alias("x"),
        (F.col("id") * 2 + 3).cast("double").alias("y"),
        (99 - F.col("id")).cast("double").alias("z"))
    got = {(r["col_a"], r["col_b"]): r["corr"]
           for r in profiling.correlation_matrix(df, ["x", "y", "z"])
           .collect()}
    assert got[("x", "y")] == 1.0 and got[("x", "z")] == -1.0
    assert got[("y", "z")] == -1.0 and len(got) == 3


def test_pair_metrics_precision_recall(spark):
    pred = spark.createDataFrame([(1, 2), (3, 4), (5, 6)], ["a", "b"])
    truth = spark.createDataFrame([(1, 2), (3, 4), (7, 8), (9, 10)],
                                  ["a", "b"])
    r = dedup.pair_metrics(pred, truth).collect()[0]
    assert (r["tp"], r["fp"], r["fn"]) == (2, 1, 2)
    assert abs(r["precision"] - 2 / 3) < 1e-6
    assert abs(r["recall"] - 0.5) < 1e-6
    assert abs(r["f1"] - (2 * (2/3) * 0.5 / ((2/3) + 0.5))) < 1e-6


def test_pair_metrics_empty_prediction(spark):
    pred = spark.createDataFrame([], "a long, b long")
    truth = spark.createDataFrame([(1, 2)], ["a", "b"])
    r = dedup.pair_metrics(pred, truth).collect()[0]
    assert (r["n_predicted"], r["tp"], r["precision"], r["f1"]) \
        == (0, 0, 0.0, 0.0)


# --------------------------------------------------------------------- #
# streaming HLL (batch-mode evaluation; the streaming path is exercised
# by the streaming_hll driver query through run_to_memory)
# --------------------------------------------------------------------- #
def test_hll_window_registers_match_per_window_batch_sketch(spark):
    from cs186_query_optimization_project_spark.streaming import (
        windows as stream_windows,
    )
    df = spark.createDataFrame(
        [(i, f"2024-01-01 {10 + (i % 2)}:00:{i % 60:02d}", (i // 2) % 50)
         for i in range(200)],
        ["event_id", "ts_s", "user_id"]).select(
            "event_id", F.col("ts_s").cast("timestamp").alias("ts"),
            "user_id")
    regs = stream_windows.hll_window_registers(df, window="1 hour",
                                               key_col="user_id")
    est = sketches.hll_estimate(
        regs.select("window_start", "register", "rho"),
        group_cols=["window_start"]).collect()
    assert len(est) == 2
    # 50 distinct users per window in both hours; both windows see the
    # SAME key set, so the sketches (and estimates) must be identical
    assert est[0]["estimate"] == est[1]["estimate"]
    # and each per-window register set equals the batch sketch of the
    # same keys (merge/shard consistency)
    batch = sketches.hll_registers(
        df.filter("hour(ts) = 10").select(
            F.col("user_id").cast("string").alias("v")), "v")
    win0 = (regs.filter("hour(window_start) = 10")
            .select("register", "rho"))
    assert rows(win0) == rows(batch)


# --------------------------------------------------------------------- #
# retrieval: phrase search + BM25
# --------------------------------------------------------------------- #
def test_phrase_search_positional_exactness(spark):
    from cs186_query_optimization_project_spark.functions import retrieval
    df = spark.createDataFrame(
        [(1, "big data is big data"),       # phrase twice
         (2, "data big"),                   # reversed -> no match
         (3, "big shiny data"),             # gap -> no match
         (4, "big data")],
        ["doc_id", "text"])
    got = {r["doc_id"]: r["n_matches"]
           for r in retrieval.phrase_search(df, "big data").collect()}
    assert got == {1: 2, 4: 1}


def test_bm25_ranks_rare_term_doc_first(spark):
    from cs186_query_optimization_project_spark.functions import retrieval
    common = "the quick brown fox jumps over the lazy dog"
    df = spark.createDataFrame(
        [(i, common) for i in range(10)]
        + [(100, common + " zyzzyva"), (101, "zyzzyva zyzzyva hello")],
        ["doc_id", "text"])
    top = retrieval.bm25_scores(df, "zyzzyva", top_k=3).collect()
    # doc 101: higher tf, shorter doc -> strictly top; only the two
    # docs containing the term score at all
    assert [r["doc_id"] for r in top] == [101, 100]
    assert top[0]["bm25"] > top[1]["bm25"] > 0


def test_incremental_near_dups_equal_cross_subset(spark):
    corpus = spark.createDataFrame(
        [(i, f"the quick brown fox number {i} jumps over dog {i % 7}")
         for i in range(40)], ["doc_id", "text"])
    batch = corpus.filter("doc_id % 5 = 0").select(
        (F.col("doc_id") + 1000).alias("doc_id"),
        F.concat("text", F.lit(" appendix")).alias("text"))
    inc = dedup.incremental_near_duplicates(corpus, batch, threshold=0.5)
    full = dedup.minhash_near_duplicates(corpus.unionByName(batch),
                                         threshold=0.5)
    cross = full.filter("a < 1000 AND b >= 1000")
    assert rows(inc) == rows(cross)
    assert inc.count() >= 8  # every planted copy found


def test_edit_distance_multipass_recovers_prefix_edits(spark):
    # an edit in char 1 escapes the prefix block; the suffix pass
    # catches it
    df = spark.createDataFrame(
        [(1, "abcdef"), (2, "Xbcdef"), (3, "abcdeX")], ["id", "name"])
    single = {(r["a"], r["b"]) for r in dedup.edit_distance_pairs(
        df, "name", "id", max_distance=1).collect()}
    multi = {(r["a"], r["b"]) for r in dedup.edit_distance_pairs_multipass(
        df, "name", "id", max_distance=1).collect()}
    assert (1, 2) not in single and (1, 3) in single
    assert (1, 2) in multi and (1, 3) in multi


def test_cms_window_counters_match_batch_grid(spark):
    from cs186_query_optimization_project_spark.streaming import (
        windows as stream_windows,
    )
    df = spark.createDataFrame(
        [(i, f"2024-01-01 10:00:{i % 60:02d}", i % 7)
         for i in range(100)],
        ["event_id", "ts_s", "user_id"]).select(
            "event_id", F.col("ts_s").cast("timestamp").alias("ts"),
            "user_id")
    grid = stream_windows.cms_window_counters(df, window="1 hour",
                                              key_col="user_id")
    # single window; the windowed grid must equal the batch CMS grid
    # over the same keys
    batch = sketches.cms_counters(
        df.select(F.col("user_id").cast("string").alias("v")), "v")
    assert rows(grid.select("row", "idx", "cnt")) == rows(batch)
    # grid is bounded: at most d*w cells
    assert grid.count() <= 3 * 2048


# --------------------------------------------------------------------- #
# review-fix regressions
# --------------------------------------------------------------------- #
def test_psi_constant_column_degenerates_to_zero(spark):
    # min == max previously divided by a zero bin width (ANSI raises)
    df = spark.createDataFrame([(5.0,)] * 50, ["v"])
    out = profiling.psi_drift(df, df, "v").collect()
    assert len(out) == 1 and out[0]["bin"] == 1
    assert out[0]["psi_term"] == 0.0


def test_psi_nulls_excluded(spark):
    a = spark.createDataFrame([(float(i % 10),) for i in range(100)]
                              + [(None,)] * 50, ["v"])
    b = spark.createDataFrame([(float(i % 10),) for i in range(100)],
                              ["v"])
    out = profiling.psi_drift(a, b, "v").collect()
    # identical non-null distributions -> zero drift despite the nulls
    assert sum(r["psi_term"] for r in out) < 1e-9


def test_cms_absent_key_estimates_zero(spark):
    vals = spark.range(1000).select(
        (F.col("id") % 5).cast("string").alias("v"))
    counters = sketches.cms_counters(vals, "v")
    probes = spark.createDataFrame([("never-seen-key",)], ["v"])
    got = sketches.cms_point_estimates(counters, probes, "v").collect()
    # with 5 keys in a 3x2048 grid the absent key's cells are empty
    assert len(got) == 1 and got[0]["cms_estimate"] == 0


def test_pair_metrics_both_empty(spark):
    empty = spark.createDataFrame([], "a long, b long")
    r = dedup.pair_metrics(empty, empty).collect()[0]
    assert (r["n_predicted"], r["n_truth"], r["tp"], r["fp"], r["fn"]) \
        == (0, 0, 0, 0, 0)
    assert r["precision"] == 0.0 and r["f1"] == 0.0


# --------------------------------------------------------------------- #
# more-like-this retrieval + dedup materialization
# --------------------------------------------------------------------- #
def test_similar_docs_ranks_true_neighbor_first(spark):
    from cs186_query_optimization_project_spark.functions import retrieval

    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon"),
         (2, "alpha beta gamma delta zeta"),     # 4/5 shingle overlap-ish
         (3, "alpha beta gamma nu xi"),          # less overlap
         (4, "totally different words here now")],
        ["doc_id", "text"])
    got = [r["doc_id"]
           for r in retrieval.similar_docs(df, query_id=1, k=3).collect()]
    assert got[0] == 2 and 3 in got and 4 not in got


def test_dedup_apply_keeps_representatives_and_singletons(spark):
    from cs186_query_optimization_project_spark.functions import dedup

    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy dog"),  # dup of 1
         (3, "completely unrelated text about spark engines")],
        ["doc_id", "text"])
    pairs = dedup.ngram_jaccard_pairs(df, threshold=0.6)
    clusters = dedup.duplicate_clusters(pairs)
    losers = clusters.filter("doc_id != cluster_id").select("doc_id")
    kept = {r["doc_id"]
            for r in df.join(losers, "doc_id", "left_anti").collect()}
    assert kept == {1, 3}  # min-id representative + untouched singleton


def test_ks_drift_known_value(spark):
    # a = {1,2,3,4}, b = {3,4,5,6}: ECDF gap peaks at 0.5 (v in [2,4))
    a = spark.createDataFrame([(float(v),) for v in (1, 2, 3, 4)], ["v"])
    b = spark.createDataFrame([(float(v),) for v in (3, 4, 5, 6)], ["v"])
    out = profiling.ks_drift(a, b, "v").collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_a"], r["n_b"]) == (4, 4)
    assert r["ks_stat"] == 0.5


def test_ks_drift_identical_and_empty(spark):
    df = spark.createDataFrame([(float(v),) for v in range(20)], ["v"])
    same = profiling.ks_drift(df, df, "v").collect()[0]
    assert same["ks_stat"] == 0.0
    empty = df.filter(F.col("v") < 0)
    r = profiling.ks_drift(df, empty, "v").collect()[0]
    # guarded division: empty side contributes ECDF 0 everywhere
    assert (r["n_a"], r["n_b"], r["ks_stat"]) == (20, 0, 1.0)


def test_ks_drift_single_distinct_value(spark):
    """Partition-collapse edge: with ONE distinct value the merged
    count table is a single row, so repartitionByRange degenerates to
    one non-empty partition (every other partition empty) — the prefix
    offsets and Arrow cumsum must still be exact.  Same value on both
    sides → ECDFs jump 0→1 at the same point, D = 0; disjoint
    single values → D = 1."""
    a = spark.createDataFrame([(7.0,)] * 5, ["v"])
    b = spark.createDataFrame([(7.0,)] * 3, ["v"])
    r = profiling.ks_drift(a, b, "v").collect()[0]
    assert (r["n_a"], r["n_b"], r["ks_stat"]) == (5, 3, 0.0)
    c = spark.createDataFrame([(9.0,)] * 3, ["v"])
    r2 = profiling.ks_drift(a, c, "v").collect()[0]
    assert (r2["n_a"], r2["n_b"], r2["ks_stat"]) == (5, 3, 1.0)


def test_ks_drift_both_sides_empty(spark):
    """Both sides empty (also: all-NULL, which filters to empty): the
    merged table has zero rows, every partition is empty, and the
    guarded divisions must yield the documented degradation —
    (0, 0, 0.0) — not a divide-by-zero or a max-over-nothing NULL."""
    empty = spark.createDataFrame([], "v double")
    r = profiling.ks_drift(empty, empty, "v").collect()[0]
    assert (r["n_a"], r["n_b"], r["ks_stat"]) == (0, 0, 0.0)
    nulls = spark.createDataFrame([(None,), (None,)], "v double")
    r2 = profiling.ks_drift(nulls, empty, "v").collect()[0]
    assert (r2["n_a"], r2["n_b"], r2["ks_stat"]) == (0, 0, 0.0)


def test_ks_drift_no_global_window(spark):
    """The ECDF running sum is distributed (range partitions + Arrow
    cumsum) — no WindowExec, hence no single-partition sort, anywhere
    in the plan."""
    from cs186_query_optimization_project_spark.functions import profiling
    a = spark.range(200).select((F.col("id") % 37).alias("v"))
    b = spark.range(200).select((F.col("id") % 23).alias("v"))
    out = profiling.ks_drift(a, b, "v")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "MapInPandas" in plan


def test_expectations_report_one_pass_and_semantics(spark):
    """DLT-expectations analog: FALSE and NULL both violate, rates are
    exact, the whole report is ONE aggregate job, and the drop/fail
    variants share the violation definition."""
    from __spark_entry__ import _job_counter
    from cs186_query_optimization_project_spark.errors import (
        DatabaseException,
    )
    from cs186_query_optimization_project_spark.functions import (
        profiling,
    )

    df = spark.createDataFrame(
        [(1, 10.0, "a"), (2, -5.0, "b"), (3, None, "a"), (4, 2.0, None)],
        "id long, amt double, tag string").localCheckpoint()
    rules = {"amt_positive": "amt > 0", "tag_known": "tag in ('a','b')",
             "id_small": "id < 100"}
    # ONE scan regardless of rule count: the job count for a 3-rule
    # report equals the 1-rule report's (AQE may split the single
    # aggregate into a constant few jobs; what must NOT happen is a
    # pass per rule)
    jobs_before = _job_counter(spark)
    profiling.expectations_report(
        df, {"id_small": "id < 100"}).collect()
    one_rule_jobs = _job_counter(spark) - jobs_before
    jobs_before = _job_counter(spark)
    rep = {r["expectation"]: (r["n_violations"], r["passed"])
           for r in profiling.expectations_report(df, rules).collect()}
    assert _job_counter(spark) - jobs_before == one_rule_jobs
    assert rep == {"amt_positive": (2, False),        # NULL violates
                   "tag_known": (1, False),
                   "id_small": (0, True)}
    kept = profiling.expect_or_drop(df, rules)
    assert [r["id"] for r in kept.collect()] == [1]
    assert profiling.expect_or_drop(df, {"id_small": "id < 100"}) \
        .count() == 4
    with pytest.raises(DatabaseException, match="amt_positive: 2"):
        profiling.expect_or_fail(df, rules)
    same = profiling.expect_or_fail(df, {"id_small": "id < 100"})
    assert same.count() == 4                          # df unchanged
    with pytest.raises(DatabaseException, match="does not plan"):
        profiling.expectations_report(df, {"bad": "nope > 1"})
    with pytest.raises(DatabaseException, match="no rules"):
        profiling.expectations_report(df, {})


# ------------------------------------------------------------------ #
# KMV / theta sketches
# ------------------------------------------------------------------ #
def test_kmv_exact_when_underfull(spark):
    from cs186_query_optimization_project_spark.functions import sketches
    df = spark.range(100).selectExpr("id AS u")
    est = sketches.kmv_estimate(
        sketches.kmv_sketch(df, "u", k=256), 256).collect()[0]
    assert est["n_sketch"] == 100 and est["estimate"] == 100.0


def test_kmv_estimate_within_error_envelope(spark):
    from cs186_query_optimization_project_spark.functions import sketches
    df = spark.range(5000).selectExpr("id AS u")
    est = sketches.kmv_estimate(
        sketches.kmv_sketch(df, "u", k=256), 256).collect()[0]
    assert est["n_sketch"] == 256
    # k=256 → ~1/sqrt(254) ≈ 6.3% std error; 25% is the loud bound
    assert abs(est["estimate"] - 5000) / 5000 < 0.25


def test_kmv_insensitive_to_duplication_and_nulls(spark):
    from cs186_query_optimization_project_spark.functions import sketches
    a = spark.range(3000).selectExpr("id AS u")
    dup = a.unionAll(a).unionAll(
        spark.sql("SELECT CAST(NULL AS BIGINT) AS u"))
    sk_a = sorted(r["h"] for r in
                  sketches.kmv_sketch(a, "u", 128).collect())
    sk_d = sorted(r["h"] for r in
                  sketches.kmv_sketch(dup, "u", 128).collect())
    assert sk_a == sk_d


def test_kmv_union_commutes_with_set_union(spark):
    from cs186_query_optimization_project_spark.functions import sketches
    a = spark.range(0, 2000).selectExpr("id AS u")
    b = spark.range(1000, 3500).selectExpr("id AS u")
    merged = sketches.kmv_union(sketches.kmv_sketch(a, "u", 128),
                                sketches.kmv_sketch(b, "u", 128), 128)
    direct = sketches.kmv_sketch(a.unionAll(b), "u", 128)
    assert sorted(r["h"] for r in merged.collect()) == \
        sorted(r["h"] for r in direct.collect())


def test_kmv_overlap_estimates_jaccard_and_intersection(spark):
    from cs186_query_optimization_project_spark.functions import sketches
    a = spark.range(0, 3000).selectExpr("id AS u")
    b = spark.range(1500, 5000).selectExpr("id AS u")
    row = sketches.kmv_overlap(a, b, "u", k=256).collect()[0]
    # truth: |A|=3000 |B|=3500 |A∪B|=5000 |A∩B|=1500 J=0.3
    assert abs(row["est_union"] - 5000) / 5000 < 0.25
    assert abs(row["jaccard"] - 0.3) < 0.12
    assert abs(row["est_intersection"] - 1500) / 1500 < 0.45
    assert row["n_union_sketch"] == 256


def test_kmv_overlap_disjoint_and_identical(spark):
    from cs186_query_optimization_project_spark.functions import sketches
    a = spark.range(0, 2000).selectExpr("id AS u")
    b = spark.range(5000, 7000).selectExpr("id AS u")
    row = sketches.kmv_overlap(a, b, "u", k=128).collect()[0]
    assert row["jaccard"] == 0.0 and row["est_intersection"] == 0.0
    same = sketches.kmv_overlap(a, a, "u", k=128).collect()[0]
    assert same["jaccard"] == 1.0
    assert same["est_a"] == same["est_b"] == same["est_union"]


def test_kmv_overlap_empty_inputs_pin_zero_jaccard(spark):
    from cs186_query_optimization_project_spark.functions import sketches
    empty = spark.range(0).selectExpr("id AS u")
    row = sketches.kmv_overlap(empty, empty, "u", k=64).collect()[0]
    assert row["jaccard"] == 0.0 and row["est_union"] == 0.0
    assert row["est_intersection"] == 0.0


def test_kmv_overlap_by_per_group_estimates(spark):
    from cs186_query_optimization_project_spark.functions import sketches
    import pyspark.sql.functions as _F
    a = (spark.range(6000)
         .selectExpr("CAST(id % 2 AS STRING) AS g", "id AS u"))
    # group 0: B = same evens (full overlap); group 1: B disjoint ids
    b0 = a.filter("g = '0'")
    b1 = spark.range(10000, 13000).selectExpr("'1' AS g", "id AS u")
    b = b0.unionByName(b1)
    rows = {r["g"]: r for r in
            sketches.kmv_overlap_by(a, b, "u", ["g"], k=256).collect()}
    assert rows["0"]["jaccard"] == 1.0
    assert rows["1"]["jaccard"] < 0.05
    # per-group union estimates track |A_g ∪ B_g| = 3000 / 6000
    assert abs(rows["0"]["est_union"] - 3000) / 3000 < 0.25
    assert abs(rows["1"]["est_union"] - 6000) / 6000 < 0.25


def test_kmv_overlap_by_group_on_one_side_only(spark):
    from cs186_query_optimization_project_spark.functions import sketches
    a = spark.range(100).selectExpr("'only_a' AS g", "id AS u")
    b = spark.range(100).selectExpr("'only_b' AS g", "id AS u")
    rows = {r["g"]: r for r in
            sketches.kmv_overlap_by(a, b, "u", ["g"], k=128).collect()}
    assert set(rows) == {"only_a", "only_b"}
    assert rows["only_a"]["jaccard"] == 0.0
    assert rows["only_a"]["est_b"] == 0.0
    assert rows["only_b"]["est_a"] == 0.0
    assert rows["only_b"]["est_union"] == 100.0  # underfull → exact


def test_mad_outliers_resists_masking(spark):
    """The defining property: one extreme value inflates stddev enough
    to hide a moderate outlier from the z-score check, while
    median/MAD still flags both."""
    from cs186_query_optimization_project_spark.functions import (
        profiling,
    )
    vals = [9.6 + 0.1 * (i % 10) for i in range(20)] + [14.0, 1000.0]
    df = spark.createDataFrame(
        [(i, "g", v) for i, v in enumerate(vals)],
        "id long, grp string, v double")
    robust = {r["id"] for r in
              profiling.mad_outliers(df, "v", "grp",
                                     threshold=3.5).collect()}
    classic = {r["id"] for r in
               profiling.zscore_outliers(df, "v", "grp",
                                         threshold=3.0).collect()}
    assert 21 in robust and 20 in robust   # both flagged robustly
    assert 20 not in classic               # masked by the 1000.0


def test_mad_outliers_zero_mad_group_emits_nothing(spark):
    from cs186_query_optimization_project_spark.functions import (
        profiling,
    )
    df = spark.createDataFrame(
        [(i, "g", 5.0) for i in range(10)] + [(99, "g", 500.0)],
        "id long, grp string, v double")
    # >50% identical values → MAD 0 → robust score undefined → empty
    assert profiling.mad_outliers(df, "v", "grp").count() == 0
