"""Sequence packing + document chunking (functions/packing.py)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from cs186_query_optimization_project_spark.functions import packing


@pytest.fixture(scope="module")
def docs(db):
    return db.table("documents")


def test_pack_sequences_layout_invariants(spark):
    # one shard so the layout is a single deterministic lane
    df = spark.createDataFrame(
        [(1, 40), (2, 50), (3, 30), (4, 100), (5, 10)], ["doc_id", "n"])
    got = {r["doc_id"]: r for r in
           packing.pack_sequences(df, "n", budget=100, n_shards=1)
           .collect()}
    # id order, running offsets: 0, 40, 90, 120, 220
    assert [got[i]["start_offset"] for i in (1, 2, 3, 4, 5)] \
        == [0, 40, 90, 120, 220]
    # pack = floor(start/budget): doc 3 starts at 90 → pack 0 (overflow
    # tail), doc 4 at 120 → pack 1, doc 5 at 220 → pack 2
    assert [got[i]["pack_id"] for i in (1, 2, 3, 4, 5)] == [0, 0, 0, 1, 2]


def test_pack_sequences_partition_invariant(docs):
    counted = docs.select("doc_id",
                          F.size(F.split("text", r"\s+")).alias("n"))
    a = {(r["doc_id"], r["shard"], r["pack_id"], r["start_offset"])
         for r in packing.pack_sequences(counted, "n", 256).collect()}
    b = {(r["doc_id"], r["shard"], r["pack_id"], r["start_offset"])
         for r in packing.pack_sequences(counted.repartition(13), "n", 256)
         .collect()}
    assert a == b
    # the layout is really end-to-end: within a shard (in id order) each
    # doc's start equals the previous doc's start + its token count
    n_by_id = {r["doc_id"]: r["n"] for r in counted.collect()}
    by_shard = {}
    for doc_id, shard, pack, off in a:
        by_shard.setdefault(shard, []).append((doc_id, off))
    for shard, rows_ in by_shard.items():
        rows_.sort()
        assert rows_[0][1] == 0
        for (prev_id, prev_off), (_, off) in zip(rows_, rows_[1:]):
            assert off == prev_off + n_by_id[prev_id]


def test_pack_sequences_rejects_bad_params(docs):
    with pytest.raises(ValueError):
        packing.pack_sequences(docs, "n", 0)
    with pytest.raises(ValueError):
        packing.pack_sequences(docs, "n", 10, n_shards=0)


def test_chunk_documents_covers_all_tokens(spark):
    text = " ".join(f"t{i}" for i in range(25))
    df = spark.createDataFrame([(1, text), (2, "a b c")], ["doc_id", "text"])
    rows = packing.chunk_documents(df, max_tokens=10, overlap=4).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 2 is shorter than one window → exactly one chunk, whole text
    assert len(by_doc[2]) == 1
    assert by_doc[2][0]["chunk_text"] == "a b c"
    # doc 1: stride 6, starts at 0/6/12/18 → 4 chunks ((25-10)/6 → 3 + 1)
    chunks = sorted(by_doc[1], key=lambda r: r["chunk_idx"])
    assert len(chunks) == 4 and all(r["n_chunks"] == 4 for r in chunks)
    assert chunks[0]["chunk_text"].split() == [f"t{i}" for i in range(10)]
    assert chunks[3]["chunk_text"].split() == [f"t{i}" for i in range(18, 25)]
    # overlap: consecutive chunks share `overlap` tokens
    assert chunks[0]["chunk_text"].split()[-4:] \
        == chunks[1]["chunk_text"].split()[:4]


def test_chunk_documents_rejects_bad_overlap(spark):
    df = None
    with pytest.raises(ValueError):
        packing.chunk_documents(df, max_tokens=10, overlap=10)
    with pytest.raises(ValueError):
        packing.chunk_documents(df, max_tokens=0, overlap=0)


def test_chunk_documents_is_map_only(docs):
    # the scale contract: explode + projections, no shuffle anywhere
    plan = (packing.chunk_documents(docs)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan


def test_pack_sequences_is_single_shuffle(docs):
    counted = docs.select("doc_id",
                          F.size(F.split("text", r"\s+")).alias("n"))
    plan = (packing.pack_sequences(counted, "n", 256)
            ._jdf.queryExecution().executedPlan().toString())
    # one hash-partitioning exchange on the shard key feeds the window;
    # nothing else shuffles
    assert plan.count("Exchange hashpartitioning") == 1


@settings(max_examples=8, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(counts=st.lists(st.integers(min_value=0, max_value=500),
                       min_size=1, max_size=40),
       budget=st.integers(min_value=1, max_value=300))
def test_pack_sequences_matches_python_reference(spark, counts, budget):
    """Single-shard layout must equal the obvious sequential packing."""
    df = spark.createDataFrame(list(enumerate(counts)), ["doc_id", "n"])
    got = {r["doc_id"]: (r["pack_id"], r["start_offset"])
           for r in packing.pack_sequences(df, "n", budget, n_shards=1)
           .collect()}
    off = 0
    for i, c in enumerate(counts):
        assert got[i] == (off // budget, off)
        off += c


def test_epoch_shuffle_total_deterministic_permutation(docs):
    out = packing.epoch_shuffle(docs, "doc_id", n_shards=8, epoch=1)
    n = docs.count()
    rows_ = out.select("doc_id", "shard", "pos").collect()
    assert len(rows_) == n
    # every row gets exactly one (shard, pos); positions are dense
    # 1..len(shard) within each shard (a total permutation)
    by_shard = {}
    for r in rows_:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert set(by_shard) <= set(range(8))
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    # partition-layout independence: same permutation after repartition
    again = {(r["doc_id"]): (r["shard"], r["pos"])
             for r in packing.epoch_shuffle(
                 docs.repartition(13), "doc_id", n_shards=8, epoch=1)
             .select("doc_id", "shard", "pos").collect()}
    assert {(r["doc_id"]): (r["shard"], r["pos"]) for r in rows_} == again


def test_epoch_shuffle_epochs_are_independent_permutations(docs):
    e1 = {r["doc_id"]: (r["shard"], r["pos"])
          for r in packing.epoch_shuffle(docs, "doc_id", 8, epoch=1)
          .select("doc_id", "shard", "pos").collect()}
    e2 = {r["doc_id"]: (r["shard"], r["pos"])
          for r in packing.epoch_shuffle(docs, "doc_id", 8, epoch=2)
          .select("doc_id", "shard", "pos").collect()}
    # the hash re-keys between epochs: assignments must differ for the
    # overwhelming majority of rows
    same = sum(1 for k in e1 if e1[k] == e2[k])
    assert same < len(e1) * 0.1


def test_epoch_shuffle_rejects_bad_shards(docs):
    with pytest.raises(ValueError, match="n_shards"):
        packing.epoch_shuffle(docs, "doc_id", n_shards=0)


def test_epoch_shuffle_salt_is_data_not_sql(docs):
    out = packing.epoch_shuffle(docs, "doc_id", n_shards=4, epoch=1,
                                salt="it's \\ weird")
    assert out.count() == docs.count()
