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
