"""Materialized postings index: build-once token-bucket-partitioned
postings probed via partition pruning (the keyword-retrieval analog of
tests/test_ann_index.py — same scale claim: the PLAN must prune).

At 100 TB a query must read the query terms' bucket directories, not
re-tokenize the corpus: the ``tb`` filter must appear as
``PartitionFilters`` on the postings scan, and doc lengths / corpus
stats must come from the build-time sidecar, not a corpus aggregate.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from cs186_query_optimization_project_spark.functions import retrieval

from tests.conftest import SF_DIR, rows


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def pindex(spark, docs, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("postings") / "idx")
    return retrieval.build_postings_index(docs, path, n_buckets=16,
                                          fingerprint="test-fp")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_phrase_indexed_matches_in_scan_path(spark, docs, pindex):
    assert (rows(retrieval.phrase_search_indexed(
                spark, pindex, "slow hash batch"))
            == rows(retrieval.phrase_search(docs, "slow hash batch")))


def test_bm25_indexed_matches_in_scan_path(spark, docs, pindex):
    assert (rows(retrieval.bm25_indexed(spark, pindex,
                                        "hash batch window", top_k=10))
            == rows(retrieval.bm25_scores(docs, "hash batch window",
                                          top_k=10)))


def test_term_postings_plan_prunes_partitions(spark, pindex):
    plan = _plan(retrieval.term_postings(spark, pindex, ["hash", "batch"]))
    # the bucket filter must be a PartitionFilter (directory pruning),
    # not a post-scan Filter over every bucket; the token filter rides
    # the scan as a pushed parquet predicate
    assert "PartitionFilters" in plan
    pf = next(ln for ln in plan.splitlines() if "PartitionFilters" in ln)
    assert "tb" in pf.split("PartitionFilters", 1)[1][:120]
    assert "PushedFilters" in plan and "token" in plan
    # and the layout really is one directory per token bucket
    tb_dirs = [d for d in os.listdir(pindex.postings_path)
               if d.startswith("tb=")]
    assert len(tb_dirs) > 1


def test_driver_side_bucket_routing_matches_sql(spark, pindex):
    # the Python router and the SQL partition expression must agree on
    # every token in the corpus — otherwise pruning would silently drop
    # matching postings
    mismatch = (spark.read.parquet(pindex.postings_path)
                .select("token", "tb").distinct()
                .collect())
    assert mismatch
    for r in mismatch:
        assert retrieval.token_bucket(r["token"],
                                      pindex.n_buckets) == r["tb"]


def test_postings_index_load_roundtrip(pindex):
    loaded = retrieval.load_postings_index(pindex.path)
    assert loaded == pindex
    assert loaded.n_docs > 0 and loaded.avgdl > 0
    assert retrieval.load_postings_index("/nonexistent/idx") is None


def test_hybrid_rrf_fuses_both_rankings(spark):
    """A doc at rank 1 on BOTH lists must outscore a doc at rank 1 on
    one list only; a doc appearing on a single list still scores
    1/(c + rank) instead of dropping out (the full-outer contract)."""
    docs = spark.createDataFrame(
        [(0, "quantum flux everywhere quantum"),
         (1, "quantum mention once"),
         (2, "nothing relevant here"),
         (3, "plain filler text")],
        ["doc_id", "text"])
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0]),
         (2, [0.9, 0.1]), (3, [-1.0, 0.0])],
        ["vec_id", "embedding"]).select(
        "vec_id", F.col("embedding").cast("array<float>")
        .alias("embedding"))
    out = retrieval.hybrid_rrf(docs, emb, "quantum", [1.0, 0.0],
                               k=4, k_each=3)
    got = [(r["doc_id"], r["rrf"]) for r in out.collect()]
    # doc 0: bm25 rank 1 AND cosine rank 1 -> 2/61
    assert got[0][0] == 0 and abs(got[0][1] - 2 / 61) < 1e-6
    # doc 2: cosine-only (rank 2) must still appear with 1/62
    by_id = dict(got)
    assert abs(by_id[2] - 1 / 62) < 1e-6
    # doc 3: on neither top-3 list in a way that beats doc 0
    assert got[0][1] == max(v for _, v in got)


def test_postings_append_equals_full_rebuild(spark, docs,
                                             tmp_path_factory):
    """Incremental maintenance: build on 4/5 of the corpus, append the
    last fifth — every reader must rank exactly as a from-scratch
    build over the full corpus, and the corpus constants must update
    incrementally (no full re-aggregate)."""
    path = str(tmp_path_factory.mktemp("inc") / "idx")
    base = docs.filter(F.col("doc_id") % 5 != 0)
    tail = docs.filter(F.col("doc_id") % 5 == 0)
    idx = retrieval.build_postings_index(base, path, n_buckets=16)
    idx2 = retrieval.postings_append(spark, idx, tail)
    full_path = str(tmp_path_factory.mktemp("inc") / "full")
    full = retrieval.build_postings_index(docs, full_path,
                                          n_buckets=16)
    assert idx2.n_docs == full.n_docs
    assert abs(idx2.avgdl - full.avgdl) < 1e-9
    got = retrieval.bm25_indexed(spark, idx2, "hash batch window",
                                 top_k=10)
    want = retrieval.bm25_indexed(spark, full, "hash batch window",
                                  top_k=10)
    assert rows(got) == rows(want)
    ph_got = retrieval.phrase_search_indexed(spark, idx2, "the value")
    ph_want = retrieval.phrase_search_indexed(spark, full, "the value")
    assert rows(ph_got) == rows(ph_want)
    # the appended index reloads with the updated constants
    reloaded = retrieval.load_postings_index(path)
    assert reloaded.n_docs == full.n_docs
    assert abs(reloaded.avgdl - full.avgdl) < 1e-9


def test_postings_append_grows_buckets_in_place(spark, docs,
                                                tmp_path_factory):
    path = str(tmp_path_factory.mktemp("inc2") / "idx")
    base = docs.filter(F.col("doc_id") % 5 != 0)
    idx = retrieval.build_postings_index(base, path, n_buckets=16)
    before = {os.path.join(dp, f)
              for dp, _, fs in os.walk(idx.postings_path)
              for f in fs if f.endswith(".parquet")}
    retrieval.postings_append(
        spark, idx, docs.filter(F.col("doc_id") % 5 == 0))
    after = {os.path.join(dp, f)
             for dp, _, fs in os.walk(idx.postings_path)
             for f in fs if f.endswith(".parquet")}
    # append-only: every pre-existing file survives untouched
    assert before <= after and len(after) > len(before)
