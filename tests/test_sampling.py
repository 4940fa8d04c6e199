"""Sampling operators: deterministic hash split + stratified sampleBy."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cs186_query_optimization_project_spark.functions import sampling


@pytest.fixture(scope="module")
def docs(db):
    return db.table("documents")


def test_hash_split_deterministic_and_partition_invariant(docs):
    a = {(r.doc_id, r.split)
         for r in sampling.hash_split(docs, "doc_id").collect()}
    # same rows through a different partition layout → identical split
    b = {(r.doc_id, r.split)
         for r in sampling.hash_split(docs.repartition(13), "doc_id")
         .collect()}
    assert a == b
    frac = sum(1 for _, s in a if s == "train") / len(a)
    assert 0.7 < frac < 0.9


def test_hash_split_salt_gives_independent_assignment(docs):
    a = {r.doc_id: r.split
         for r in sampling.hash_split(docs, "doc_id").collect()}
    b = {r.doc_id: r.split
         for r in sampling.hash_split(docs, "doc_id", salt="v2").collect()}
    # a fresh salt reassigns SOME docs (independent draw), not none/all
    moved = sum(1 for k in a if a[k] != b[k])
    assert 0 < moved < len(a)


def test_hash_split_rejects_degenerate_pct(docs):
    with pytest.raises(ValueError):
        sampling.hash_split(docs, "doc_id", train_pct=0)
    with pytest.raises(ValueError):
        sampling.hash_split(docs, "doc_id", train_pct=100)


def test_hash_stratified_sample_deterministic(docs):
    kwargs = dict(strata_col="lang", id_col="doc_id",
                  fractions={"en": 0.3, "de": 1.0})
    a = {r.doc_id for r in
         sampling.hash_stratified_sample(docs, **kwargs).collect()}
    # partition relayout must not reselect the sample (unlike sampleBy)
    b = {r.doc_id for r in
         sampling.hash_stratified_sample(docs.repartition(13), **kwargs)
         .collect()}
    assert a == b
    total = {r.lang: r["count"]
             for r in docs.groupBy("lang").count().collect()}
    kept = {r.lang: r["count"]
            for r in sampling.hash_stratified_sample(docs, **kwargs)
            .groupBy("lang").count().collect()}
    assert kept.get("de", 0) == total["de"]          # fraction 1.0 = keep all
    assert 0 < kept.get("en", 0) < total["en"]       # downsampled, nonempty
    assert set(kept) <= {"en", "de"}                 # unlisted strata dropped


def test_hash_stratified_sample_rejects_bad_fraction(docs):
    with pytest.raises(ValueError):
        sampling.hash_stratified_sample(docs, "lang", "doc_id",
                                        {"en": 1.5})


def test_stratified_sample_downsamples_named_stratum(docs):
    total = {r.lang: r["count"]
             for r in docs.groupBy("lang").count().collect()}
    kept = {r.lang: r["count"]
            for r in sampling.stratified_sample(
                docs, "lang", {"en": 0.3, "de": 1.0}, seed=7)
            .groupBy("lang").count().collect()}
    assert kept.get("de", 0) == total["de"]          # fraction 1.0 = keep all
    assert kept.get("en", 0) < total["en"]           # downsampled
    assert set(kept) <= {"en", "de"}                 # unlisted strata dropped


def test_mixture_sample_hits_target_proportions(docs):
    from cs186_query_optimization_project_spark.functions.sampling import (
        mixture_sample,
    )

    out = mixture_sample(docs, "source",
                         {"src0": 0.5, "src1": 0.25, "src2": 0.25},
                         "doc_id")
    by_src = {r["source"]: r["n"]
              for r in out.groupBy("source").agg(
                  F.count(F.lit(1)).alias("n")).collect()}
    # src0 is the binding domain (rate 1.0: needs 50% of the output
    # from 1/20 of a uniform corpus): ALL its rows are kept
    n0 = docs.filter(F.col("source") == "src0").count()
    assert by_src["src0"] == n0
    # the others keep ~half (hash-uniform at rate 0.5); exact counts
    # are deterministic, bounded well away from 0 and from full
    assert 0.25 * n0 < by_src["src1"] < 0.75 * n0
    assert 0.25 * n0 < by_src["src2"] < 0.75 * n0
    # unlisted domains are dropped entirely
    assert set(by_src) == {"src0", "src1", "src2"}
    # membership is partition-layout independent
    out2 = mixture_sample(docs.repartition(13), "source",
                          {"src0": 0.5, "src1": 0.25, "src2": 0.25},
                          "doc_id")
    assert (sorted(r["doc_id"] for r in out.select("doc_id").collect())
            == sorted(r["doc_id"]
                      for r in out2.select("doc_id").collect()))


def test_mixture_sample_rejects_bad_weights(docs):
    import pytest

    from cs186_query_optimization_project_spark.functions.sampling import (
        mixture_sample,
    )

    with pytest.raises(ValueError, match="non-empty"):
        mixture_sample(docs, "source", {}, "doc_id")
    with pytest.raises(ValueError, match="must be > 0"):
        mixture_sample(docs, "source", {"src0": 0.0}, "doc_id")
    with pytest.raises(ValueError, match="unsatisfiable"):
        mixture_sample(docs, "source", {"src0": 0.5, "no_such": 0.5},
                       "doc_id")


def test_mixture_sample_salt_is_data_not_sql(docs):
    from cs186_query_optimization_project_spark.functions.sampling import (
        mixture_sample,
    )

    # a salt full of SQL metacharacters must neither crash nor alter
    # semantics (it rides in as a Column literal)
    out = mixture_sample(docs, "source", {"src0": 1.0}, "doc_id",
                         salt="it's \\ weird")
    assert out.count() == docs.filter(F.col("source") == "src0").count()


def test_temperature_mixture_flattens_skew(docs):
    from math import sqrt

    raw = {r["lang"]: r["n"] for r in
           docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
           .collect()}
    out = sampling.temperature_mixture(docs, "lang", "doc_id", alpha=0.5)
    kept = {r["lang"]: r["n"] for r in
            out.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
            .collect()}
    c_min = min(raw.values())
    binding = min(raw, key=raw.get)
    # the rarest domain keeps everything
    assert kept[binding] == raw[binding]
    # every other domain lands near its sqrt-scaled expectation
    for lang, n in raw.items():
        exp = n * sqrt(c_min) / sqrt(n)
        assert abs(kept[lang] - exp) < 0.35 * exp + 5
    # output skew is strictly flatter than input skew
    assert (max(kept.values()) / min(kept.values())
            < max(raw.values()) / min(raw.values()))
    # membership is partition-layout independent
    out2 = sampling.temperature_mixture(docs.repartition(13), "lang",
                                        "doc_id", alpha=0.5)
    assert (sorted(r["doc_id"] for r in out.select("doc_id").collect())
            == sorted(r["doc_id"] for r in out2.select("doc_id").collect()))


def test_temperature_mixture_alpha_one_keeps_all(docs):
    # alpha=1 is identity temperature: every rate is (c_min/c_d)^0 = 1
    out = sampling.temperature_mixture(docs, "lang", "doc_id", alpha=1.0)
    assert out.count() == docs.count()


def test_token_budget_mix_budget_and_determinism(spark):
    """Greedy per-domain budget cap: every domain's kept set respects
    cum_before < budget (first doc always kept), the selection order
    is the md5 coin (partition-layout independent), and a rerun is
    identical."""
    from cs186_query_optimization_project_spark.functions.sampling import (
        token_budget_mix,
    )

    rows_in = [(i, "web" if i % 2 else "code",
                " ".join(f"t{j}" for j in range(1 + i % 7)))
               for i in range(60)]
    df = spark.createDataFrame(rows_in, "doc_id long, src string, "
                                        "text string")
    out = token_budget_mix(df, "src", "doc_id", "text",
                           budget_tokens=20).collect()
    by_dom = {}
    for r in out:
        by_dom.setdefault(r["src"], []).append(r)
    assert set(by_dom) == {"web", "code"}
    for dom, kept in by_dom.items():
        kept.sort(key=lambda r: r["cum_before"])
        assert kept[0]["cum_before"] == 0          # first doc free
        assert all(r["cum_before"] < 20 for r in kept)
        # cum_before is consistent: each equals the sum of the
        # preceding kept docs' tokens (the window is a true prefix)
        run = 0
        for r in kept:
            assert r["cum_before"] == run
            run += r["n_tokens"]
        # budget overshoots by at most the last document
        assert run < 20 + max(r["n_tokens"] for r in kept) + 1
    # determinism across partitionings
    out2 = token_budget_mix(df.repartition(13), "src", "doc_id",
                            "text", budget_tokens=20).collect()
    assert sorted((r["doc_id"]) for r in out2) == \
        sorted((r["doc_id"]) for r in out)


def test_preference_pairs_margin_and_tiebreaks(spark):
    df = spark.createDataFrame(
        [("a", 1, 0.9), ("a", 2, 0.9), ("a", 3, 0.1), ("a", 4, 0.1),
         ("b", 5, 0.6), ("b", 6, 0.58),          # margin 0.02 < 0.05
         ("c", 7, 0.5),                          # singleton: no pair
         ("d", 8, 0.8), ("d", 9, None),          # null never anchors
         (None, 10, 0.9), (None, 11, 0.1)],      # null GROUP: no pair
        "grp string, id long, score double")
    out = {r["grp"]: r for r in sampling.preference_pairs(
        df, "grp", "id", "score", min_margin=0.05).collect()}
    # chosen = largest id at top score; rejected = smallest id at bottom
    assert out["a"]["chosen_id"] == 2 and out["a"]["rejected_id"] == 3
    assert abs(out["a"]["margin"] - 0.8) < 1e-9
    assert "b" not in out          # under the margin threshold
    assert "c" not in out          # chosen == rejected filtered
    assert "d" not in out          # the null row cannot anchor a pair
    assert None not in out         # NULL group keys anchor no pair
    # (a SQL equality self-join — the oracle shape — drops them too)
    # with no margin floor, b pairs and d stays out (single scored row)
    out0 = {r["grp"] for r in sampling.preference_pairs(
        df, "grp", "id", "score").collect()}
    assert out0 == {"a", "b"}


def test_preference_pairs_plan_partials_before_shuffle(spark):
    """The scale claim IS the plan shape: a partial aggregate runs
    BEFORE the exchange (each partition ships at most one candidate
    per group — the shuffle never carries the corpus) and there is no
    Window (a per-group ROW_NUMBER would shuffle every row and
    serialize each group into one task)."""
    df = spark.range(1000).selectExpr(
        "CAST(id % 7 AS STRING) AS grp", "id",
        "CAST(id % 13 AS DOUBLE) / 13 AS score")
    out = sampling.preference_pairs(df, "grp", "id", "score")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "partial_max_by" in plan
    pre, _, post = plan.partition("Exchange")
    # the partial aggregate is BELOW the exchange (plans print
    # top-down: the map-side partial appears after "Exchange")
    assert "partial_max_by" in post and "partial_max_by" not in pre
