"""Multinomial Naive Bayes (functions/classify.py): training counts,
smoothing, scoring, argmax determinism, and the filtered-ANN `where`
path that shares this round's entry surface."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from cs186_query_optimization_project_spark.functions import classify


@pytest.fixture(scope="module")
def toy(spark):
    return spark.createDataFrame(
        [(0, "spam", "buy cheap pills now"),
         (1, "spam", "cheap pills cheap deals"),
         (2, "ham", "meeting notes for tuesday"),
         (3, "ham", "tuesday lunch notes"),
         (4, "ham", "project meeting tuesday")],
        "doc_id long, label string, text string").localCheckpoint()


def test_nb_train_counts_and_smoothing(spark, toy):
    m = classify.nb_train(toy, "text", "label", alpha=1.0)
    lik = {(r["label"], r["token"]): r["log_lik"]
           for r in m.likelihood.collect()}
    # spam: 8 tokens total; vocab = 11 distinct tokens overall;
    # "cheap" appears 3× in spam → ln(4 / 19)
    assert math.isclose(lik[("spam", "cheap")], math.log(4 / 19))
    pri = {r["label"]: (r["log_prior"], r["log_default"])
           for r in m.priors.collect()}
    assert math.isclose(pri["spam"][0], math.log(2 / 5))
    assert math.isclose(pri["ham"][0], math.log(3 / 5))
    # unseen-token default for spam: ln(1 / (8 + 11))
    assert math.isclose(pri["spam"][1], math.log(1 / 19))


def test_nb_predict_obvious_docs(spark, toy):
    m = classify.nb_train(toy, "text", "label")
    test = spark.createDataFrame(
        [(10, "cheap pills"), (11, "tuesday meeting notes")],
        "doc_id long, text string")
    got = {r["doc_id"]: r["predicted"]
           for r in classify.nb_predict(m, test).collect()}
    assert got == {10: "spam", 11: "ham"}


def test_nb_score_matches_hand_computation(spark, toy):
    m = classify.nb_train(toy, "text", "label")
    test = spark.createDataFrame([(10, "cheap unseenword")],
                                 "doc_id long, text string")
    s = {r["label"]: r["score"]
         for r in classify.nb_score(m, test).collect()}
    want_spam = math.log(2 / 5) + math.log(4 / 19) + math.log(1 / 19)
    # ham: 10 tokens total → denom 21; "cheap" unseen in ham
    want_ham = math.log(3 / 5) + 2 * math.log(1 / 21)
    assert math.isclose(s["spam"], want_spam, rel_tol=1e-9)
    assert math.isclose(s["ham"], want_ham, rel_tol=1e-9)


def test_nb_predict_tie_breaks_by_label_asc(spark):
    df = spark.createDataFrame(
        [(0, "a", "x"), (1, "b", "x")],
        "doc_id long, label string, text string")
    m = classify.nb_train(df, "text", "label")
    pred = classify.nb_predict(
        m, spark.createDataFrame([(9, "x")],
                                 "doc_id long, text string"))
    # perfectly symmetric classes: identical scores → label asc
    assert pred.collect()[0]["predicted"] == "a"


def test_nb_empty_and_whitespace_docs_score_prior_only(spark, toy):
    m = classify.nb_train(toy, "text", "label")
    test = spark.createDataFrame([(10, "   "), (11, "")],
                                 "doc_id long, text string")
    # no tokens → empty likelihood product → score = log_prior alone;
    # the doc must NOT vanish from the output
    scores = {(r["doc_id"], r["label"]): r["score"]
              for r in classify.nb_score(m, test).collect()}
    priors = {r["label"]: r["log_prior"] for r in m.priors.collect()}
    assert set(d for d, _ in scores) == {10, 11}
    for (_, lbl), s in scores.items():
        assert abs(s - priors[lbl]) < 1e-9
    # argmax over priors alone → the majority class, deterministically
    preds = classify.nb_predict(m, test).collect()
    assert len(preds) == 2
    best = max(sorted(priors), key=lambda l: priors[l])
    assert all(r["predicted"] == best for r in preds)


def test_sq8_topk_where_filters_before_ranking(spark):
    from cs186_query_optimization_project_spark.functions import (
        similarity,
    )
    emb = (spark.range(200)
           .selectExpr("id AS vec_id", "CAST(id % 3 AS INT) AS label",
                       "array(CAST(id AS FLOAT), CAST(1.0 AS FLOAT))"
                       " AS embedding"))
    got = similarity.sq8_topk(emb, [150.0, 1.0], k=5,
                              where="label = 2").collect()
    assert len(got) == 5
    assert all(r["vec_id"] % 3 == 2 for r in got)
    # post-filtering the unfiltered top-5 would under-return
    unf = similarity.sq8_topk(emb, [150.0, 1.0], k=5).collect()
    assert sum(1 for r in unf if r["vec_id"] % 3 == 2) < 5


def test_lsh_probe_where_filters_before_ranking(spark, tmp_path):
    from cs186_query_optimization_project_spark.functions import (
        similarity,
    )
    emb = (spark.range(200)
           .selectExpr("id AS vec_id", "CAST(id % 3 AS INT) AS label",
                       "array(CAST(id AS FLOAT), CAST(1.0 AS FLOAT))"
                       " AS embedding"))
    idx = similarity.build_lsh_index(emb, str(tmp_path / "lsh"),
                                     n_planes=2)
    got = similarity.lsh_probe(spark, idx, [150.0, 1.0], k=5,
                               where="label = 2").collect()
    assert got and all(r["vec_id"] % 3 == 2 for r in got)
    unf = similarity.lsh_probe(spark, idx, [150.0, 1.0], k=5).collect()
    assert {r["vec_id"] for r in got} != {r["vec_id"] for r in unf}


def test_ivf_topk_where_filters_before_ranking(spark):
    from cs186_query_optimization_project_spark.functions import (
        similarity,
    )
    emb = (spark.range(200)
           .selectExpr("id AS vec_id", "CAST(id % 3 AS INT) AS label",
                       "array(CAST(id AS FLOAT), CAST(1.0 AS FLOAT))"
                       " AS embedding"))
    got = similarity.ivf_topk(emb, [150.0, 1.0], k=5, n_cells=4,
                              n_probe=4, where="label = 2")
    rows = got.collect()
    assert len(rows) == 5
    ids = {r["vec_id"] for r in rows}
    assert all(i % 3 == 2 for i in ids)


def test_nb_train_drops_null_labels(spark, toy):
    import pyspark.sql.functions as _F
    noisy = toy.unionByName(spark.createDataFrame(
        [(99, None, "cheap pills")],
        "doc_id long, label string, text string"))
    m = classify.nb_train(noisy, "text", "label")
    assert {r["label"] for r in m.priors.collect()} == {"spam", "ham"}
    # priors renormalize over the LABELED docs only
    pri = {r["label"]: r["log_prior"] for r in m.priors.collect()}
    assert math.isclose(pri["spam"], math.log(2 / 5))
