"""Streaming tests: drive real readStream queries to completion with the
memory sink and check against batch equivalents (the recommended
Structured Streaming test pattern — batch and stream share the same
transformation code)."""

import pytest
from pyspark.sql import functions as F

from cs186_query_optimization_project_spark.streaming import stateful, windows as sw
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def events_stream(spark):
    return sw.stream_events(spark, f"{SF_DIR}/events.parquet")


@pytest.fixture(scope="module")
def events_batch(db):
    return db.table("events")


def test_stream_events_restores_timestamps(events_stream):
    assert events_stream.isStreaming
    assert dict(events_stream.dtypes)["ts"] == "timestamp"


def test_tumbling_counts_stream_matches_batch(spark, events_stream,
                                              events_batch):
    sw.run_to_memory(sw.tumbling_counts(events_stream), "t_tumble",
                     output_mode="complete")
    got = {(r["window_start"], r["event_type"]): (r["n"], round(r["sum_value"], 4))
           for r in spark.table("t_tumble").collect()}
    want = {(r["window_start"], r["event_type"]): (r["n"], round(r["sum_value"], 4))
            for r in sw.tumbling_counts(events_batch).collect()}
    assert got == want and len(got) > 0


def test_sliding_counts_stream_matches_batch(spark, events_stream,
                                             events_batch):
    sw.run_to_memory(sw.sliding_counts(events_stream), "t_slide",
                     output_mode="complete")
    got = {(r["window_start"], r["event_type"]): r["n"]
           for r in spark.table("t_slide").collect()}
    want = {(r["window_start"], r["event_type"]): r["n"]
            for r in sw.sliding_counts(events_batch).collect()}
    assert got == want and len(got) > 0


def test_session_counts_stream_matches_batch(spark, events_stream,
                                             events_batch):
    sw.run_to_memory(sw.session_counts(events_stream), "t_sess",
                     output_mode="complete")
    got = sorted((r["user_id"], r["session_start"], r["n_events"])
                 for r in spark.table("t_sess").collect())
    want = sorted((r["user_id"], r["session_start"], r["n_events"])
                  for r in sw.session_counts(events_batch).collect())
    assert got == want and len(got) > 0


def test_streaming_dedup(spark, events_stream, events_batch):
    deduped = sw.streaming_dedup(events_stream)
    sw.run_to_memory(deduped.groupBy().agg(F.count(F.lit(1)).alias("n")),
                     "t_dedup", output_mode="complete")
    # source has unique event_ids, so dedup is a no-op count-wise
    n_stream = spark.table("t_dedup").collect()[0]["n"]
    assert n_stream == events_batch.count()


def test_stateful_user_totals_stream_matches_batch(spark, events_stream,
                                                   events_batch):
    sw.run_to_memory(stateful.user_running_totals(events_stream),
                     "t_state", output_mode="update")
    # "update" mode emits one row per user per batch; the memory sink holds
    # the union — take the final row per user (max n_events)
    final = (spark.table("t_state")
             .groupBy("user_id")
             .agg(F.max("n_events").alias("n_events"),
                  F.max("total_value").alias("total_value")))
    got = {r["user_id"]: (r["n_events"], round(r["total_value"], 4))
           for r in final.collect()}
    want = {r["user_id"]: (r["n_events"], round(r["total_value"], 4))
            for r in stateful.user_running_totals(events_batch).collect()}
    assert got == want and len(got) > 0


def test_interval_join_stream_matches_batch(spark, events_stream,
                                            events_batch):
    sw.run_to_memory(sw.click_purchase_join(events_stream), "t_ivj",
                     output_mode="append", shuffle_partitions=8)
    got = {tuple(r) for r in spark.table("t_ivj").collect()}
    want = {tuple(r) for r in sw.click_purchase_join(events_batch).collect()}
    assert got == want and len(got) > 0


def test_enrich_with_dimension_stream_matches_batch(spark, events_stream,
                                                    events_batch, db):
    dim = db.table("customer").select("c_custkey", "c_mktsegment")
    agg = lambda src: (sw.enrich_with_dimension(src, dim, "user_id",
                                                "c_custkey")
                       .groupBy("c_mktsegment").count())
    sw.run_to_memory(agg(events_stream), "t_enrich",
                     output_mode="complete", shuffle_partitions=8)
    got = {tuple(r) for r in spark.table("t_enrich").collect()}
    want = {tuple(r) for r in agg(events_batch).collect()}
    assert got == want and len(got) > 0


def test_stream_events_starts_on_empty_dir(spark, tmp_path):
    # Kafka-stand-in contract: a stream may start before its producer
    # writes any file — falls back to the default events schema
    empty = str(tmp_path / "events_empty")
    import os
    os.makedirs(empty, exist_ok=True)
    s = sw.stream_events(spark, empty)
    assert s.isStreaming
    assert dict(s.dtypes)["ts"] == "timestamp"


def test_stream_events_schema_cache_tracks_mtime(spark, tmp_path):
    # a regenerated source file re-infers instead of serving stale
    # schema, and the cache holds ONE entry per path (replaced, not
    # appended)
    import os
    import shutil
    import time

    p = str(tmp_path / "events_copy.parquet")
    shutil.copy(f"{SF_DIR}/events.parquet", p)
    sw.stream_events(spark, p)
    mtime_before = sw._SCHEMA_CACHE[p][0]
    time.sleep(0.01)
    os.utime(p, None)
    sw.stream_events(spark, p)
    mtime_after = sw._SCHEMA_CACHE[p][0]
    assert mtime_after != mtime_before
    assert sum(1 for k in sw._SCHEMA_CACHE if k == p) == 1


def test_stream_events_fails_fast_on_corrupt_source(spark, tmp_path):
    # a source that EXISTS but can't be read must raise, not silently
    # fall back to the default schema
    import pathlib

    p = tmp_path / "corrupt.parquet"
    pathlib.Path(p).write_bytes(b"this is not parquet")
    with pytest.raises(Exception):
        sw.stream_events(spark, str(p))


def test_stream_events_rejects_non_utc_session(spark):
    """The stream must REFUSE a non-UTC session rather than silently
    repin the shared session's timezone (which would shift timestamp
    results for every later batch query)."""
    import pytest

    from cs186_query_optimization_project_spark.errors import (
        DatabaseException,
    )

    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        with pytest.raises(DatabaseException, match="UTC"):
            sw.stream_events(spark, f"{SF_DIR}/events.parquet")
        # and the foreign setting was NOT clobbered
        assert (spark.conf.get("spark.sql.session.timeZone")
                == "America/New_York")
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


def test_outer_join_emits_unmatched_after_sentinel(spark):
    """Left-outer stream-stream join: unmatched clicks appear with null
    purchase columns once the watermark passes their match window (the
    sentinel-advanced EOF flush), and the drained result equals the
    batch left join."""
    import __spark_entry__ as entry

    out = entry.q_streaming_outer_join(spark, SF_DIR).collect()
    clicks = (spark.read.parquet(f"{SF_DIR}/events.parquet")
              .filter(F.col("event_type") == "click"))
    matched = [r for r in out if r["purchase_id"] is not None]
    unmatched = [r for r in out if r["purchase_id"] is None]
    assert unmatched, "some clicks must have no purchase within 30 min"
    assert all(r["user_id"] >= 0 for r in out)      # sentinel filtered
    # every click appears at least once (outer semantics)
    assert (len({r["click_id"] for r in out}) == clicks.count())
    assert matched, "and some clicks do convert"


def test_checkpoint_recovery_exactly_once(spark, tmp_path):
    """Kill-and-restart with a checkpoint: the restarted query must NOT
    re-read files the first run processed (exactly-once source
    tracking), yet its complete-mode output must still cover them
    (aggregation state restored from the state store, not recomputed
    from the source)."""
    from pyspark.sql import functions as FF

    src = tmp_path / "src"
    cp = str(tmp_path / "cp")
    src.mkdir()
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    total = ev.count()
    ev.filter(FF.col("event_id") % 2 == 0).write.mode(
        "append").parquet(str(src))

    def run(name):
        stream = sw.stream_events(spark, str(src))
        agg = sw.tumbling_counts(stream)
        q = (agg.writeStream.outputMode("complete").format("memory")
             .queryName(name).option("checkpointLocation", cp).start())
        q.processAllAvailable()
        rows_in = sum(p["numInputRows"] for p in q.recentProgress)
        q.stop()
        return rows_in

    first_in = run("ckpt_run1")
    ev.filter(FF.col("event_id") % 2 == 1).write.mode(
        "append").parquet(str(src))
    second_in = run("ckpt_run2")

    # run 2 read only the NEW files...
    assert first_in + second_in == total
    assert second_in < total
    # ...yet its output covers the whole corpus (state recovered)
    got = (spark.table("ckpt_run2")
           .agg(FF.sum("n").cast("long").alias("s")).collect()[0]["s"])
    assert got == total
