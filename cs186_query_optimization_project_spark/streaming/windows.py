"""Watermarked window aggregations for the events stream.

Shapes covered (streaming analogs of SURVEY.md §7 phase 6):

- tumbling window counts/sums (``F.window(ts, size)``)
- sliding windows (``F.window(ts, size, slide)``)
- session windows (``F.session_window(ts, gap)``)

Each takes and returns a DataFrame; pass a ``readStream`` frame for
incremental execution (the watermark bounds state) or a batch frame for
testing — Spark evaluates ``window``/``session_window`` identically in
both modes.

At scale: the watermark is what keeps state finite — without it a
windowed aggregation on an unbounded stream accumulates state forever.
The groupBy shuffles on (window, key); skewed keys are handled by AQE in
batch and by state-store partitioning (``spark.sql.shuffle.partitions``,
fixed at first run of a streaming query) in streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: path -> (mtime_ns, inferred schema); file stream sources need an
#: explicit schema and re-inferring it per query construction costs a
#: footer read.  The stored mtime invalidates the entry when the source
#: is regenerated (stale schemas are re-inferred, and the cache stays
#: one entry per path instead of growing per regeneration).
_SCHEMA_CACHE: dict = {}

#: session-timezone values accepted as "already UTC" — zero-offset,
#: no-DST aliases only.  Anything else fails loudly in stream_events.
_UTC_EQUIVALENT_ZONES = frozenset({
    "UTC", "Etc/UTC", "GMT", "Etc/GMT", "GMT0", "Etc/GMT0", "Etc/GMT+0",
    "Etc/GMT-0", "Greenwich", "Etc/Greenwich", "Universal",
    "Etc/Universal", "Zulu", "Etc/Zulu", "Z", "+00:00", "UTC+00:00",
    "GMT+00:00",
})

#: schema served when the source directory has no files yet — a stream is
#: allowed to start before its producer writes anything (Kafka-stand-in
#: contract); matches the testdata events table
_DEFAULT_EVENTS_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("ts", T.TimestampNTZType()),
    T.StructField("value", T.DoubleType()),
])


def stream_events(spark, path: str) -> DataFrame:
    """Open the events parquet as a file stream (new files under ``path``
    are picked up incrementally — the local stand-in for a Kafka topic).
    A single-file path is turned into dir + glob (file stream sources
    require a directory basePath).

    File stream sources require an explicit schema; it is inferred from a
    one-time batch read of the same files rather than hardcoded, so the
    stream tracks the table's real types (``ts`` is TIMESTAMP_NTZ on
    current testdata; an older TIMESTAMP(NANOS) file surfacing as long
    under ``nanosAsLong`` gets the same micros restore the batch path
    applies).  An empty/not-yet-written source falls back to the default
    events schema so the stream can start before its producer.

    Event time must be wall-clock-stable: watermarks reject
    TIMESTAMP_NTZ, and a bare cast to TIMESTAMP reinterprets wall time
    through ``spark.sql.session.timeZone`` — on a non-UTC session the
    window boundaries would shift vs. the batch/oracle path, and DST
    fall-back wall times are ambiguous.  The session timezone is
    therefore REQUIRED to be UTC(-equivalent): a mismatch raises
    instead of being silently overwritten, because repinning a shared
    session's timezone as a side effect of opening one stream would
    alter timestamp/``year()`` results for every later batch query of
    a caller who intentionally runs in another zone.
    """
    import os

    from pyspark.errors import AnalysisException

    from cs186_query_optimization_project_spark.errors import (
        DatabaseException,
    )

    tz = spark.conf.get("spark.sql.session.timeZone")
    if tz not in _UTC_EQUIVALENT_ZONES:
        raise DatabaseException(
            f"streaming requires a UTC session (NTZ event time must cast "
            f"to TIMESTAMP without wall-clock shift), but "
            f"spark.sql.session.timeZone={tz!r}; set it to 'UTC' before "
            f"opening streams — it is not overwritten here because the "
            f"change would leak into every later query on this session")
    try:
        mtime = os.stat(path).st_mtime_ns
    except OSError:
        mtime = None
    cached = _SCHEMA_CACHE.get(path)
    if cached is not None and cached[0] == mtime:
        schema = cached[1]
    else:
        try:
            schema = spark.read.parquet(path).schema
        except AnalysisException as exc:
            # ONLY "source not written yet" falls back to the default
            # schema (missing path / nothing to infer from); any other
            # analysis error — and every IO/corruption error — must
            # fail fast like the batch readers, never silently read
            # real data under a guessed schema
            cond = exc.getCondition() or ""
            if cond not in ("PATH_NOT_FOUND", "UNABLE_TO_INFER_SCHEMA"):
                raise
            schema = _DEFAULT_EVENTS_SCHEMA
        # one (mtime, schema) entry per path — replaced on regeneration,
        # so the cache can't grow into an append-only log
        _SCHEMA_CACHE[path] = (mtime, schema)
    reader = spark.readStream.format("parquet").schema(schema)
    if os.path.isfile(path):
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        path = os.path.dirname(path)
    raw = reader.load(path)
    if isinstance(schema["ts"].dataType, T.LongType):
        # integer div keeps full microsecond precision (database.py note)
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(schema["ts"].dataType, T.TimestampNTZType):
        # watermarks demand TIMESTAMP (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE
        # on NTZ).  Under the UTC session timezone pinned above the cast
        # is wall-time-preserving and unambiguous.
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def tumbling_counts(events: DataFrame, window: str = "1 hour",
                    watermark: str = "2 hours",
                    ts_col: str = "ts") -> DataFrame:
    """Per (tumbling window, event_type): count + sum(value)."""
    src = events.withWatermark(ts_col, watermark) if events.isStreaming \
        else events
    return (src.groupBy(F.window(F.col(ts_col), window).alias("win"),
                        F.col("event_type"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("value").alias("sum_value"))
            .select(F.col("win.start").alias("window_start"),
                    F.col("win.end").alias("window_end"),
                    "event_type", "n", "sum_value"))


def sliding_counts(events: DataFrame, window: str = "1 hour",
                   slide: str = "15 minutes", watermark: str = "2 hours",
                   ts_col: str = "ts") -> DataFrame:
    src = events.withWatermark(ts_col, watermark) if events.isStreaming \
        else events
    return (src.groupBy(F.window(F.col(ts_col), window, slide).alias("win"),
                        F.col("event_type"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("win.start").alias("window_start"),
                    F.col("win.end").alias("window_end"), "event_type", "n"))


def session_counts(events: DataFrame, gap: str = "30 minutes",
                   watermark: str = "2 hours",
                   ts_col: str = "ts") -> DataFrame:
    """Per-user session windows (gap-based), the streaming analog of
    operators/windows.py:sessionize."""
    src = events.withWatermark(ts_col, watermark) if events.isStreaming \
        else events
    return (src.groupBy(F.session_window(F.col(ts_col), gap).alias("win"),
                        F.col("user_id"))
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(F.col("win.start").alias("session_start"),
                    F.col("win.end").alias("session_end"),
                    "user_id", "n_events"))


def streaming_dedup(events: DataFrame, watermark: str = "1 hour",
                    keys: list[str] | None = None,
                    ts_col: str = "ts") -> DataFrame:
    """Streaming exact dedup on event ids within the watermark horizon —
    state is bounded by the watermark (dropDuplicatesWithinWatermark)."""
    keys = keys or ["event_id"]
    if events.isStreaming:
        return (events.withWatermark(ts_col, watermark)
                .dropDuplicatesWithinWatermark(keys))
    return events.dropDuplicates(keys)


def click_purchase_join(events: DataFrame, max_gap: str = "30 minutes",
                        watermark: str = "2 hours",
                        ts_col: str = "ts",
                        how: str = "inner") -> DataFrame:
    """Stream-stream interval self-join: each click matched to the same
    user's purchases in ``(click_ts, click_ts + max_gap]`` — the
    streaming analog of operators/joins.py's range join, and the
    attribution shape (impression→conversion) every event pipeline needs.

    Both sides carry a watermark and the join condition bounds event time
    on both ends, so Spark can evict buffered rows once the watermark
    passes ``click_ts + max_gap`` — state is O(events inside the
    watermark horizon), not O(stream).  Inner-join matches emit
    immediately (no watermark wait), so a drained run yields the full
    batch-equivalent result.

    ``how="left_outer"`` additionally emits each unmatched click with
    null purchase columns — but only once the watermark passes the
    click's match window (Spark must prove no purchase can still
    arrive).  A drained FINITE run therefore under-reports trailing
    unmatched clicks unless the caller advances the watermark past
    ``max(ts) + max_gap`` — e.g. by appending a far-future sentinel
    event to the source (see the registered ``streaming_outer_join``
    query), the streaming equivalent of closing a session at EOF.
    """
    left = (events.filter(F.col("event_type") == "click")
            .select(F.col("user_id").alias("l_user"),
                    F.col("event_id").alias("click_id"),
                    F.col(ts_col).alias("click_ts")))
    right = (events.filter(F.col("event_type") == "purchase")
             .select(F.col("user_id").alias("r_user"),
                     F.col("event_id").alias("purchase_id"),
                     F.col(ts_col).alias("purchase_ts")))
    if events.isStreaming:
        left = left.withWatermark("click_ts", watermark)
        right = right.withWatermark("purchase_ts", watermark)
    cond = ((F.col("l_user") == F.col("r_user"))
            & (F.col("purchase_ts") > F.col("click_ts"))
            & (F.col("purchase_ts")
               <= F.col("click_ts") + F.expr(f"INTERVAL {max_gap}")))
    return (left.join(right, cond, how)
            .select(F.col("l_user").alias("user_id"),
                    "click_id", "purchase_id"))


def enrich_with_dimension(events: DataFrame, dim: DataFrame,
                          event_key: str, dim_key: str) -> DataFrame:
    """Stream-static join: enrich each event with dimension attributes.
    The static side is broadcast to every executor and re-resolved per
    micro-batch (Spark picks up dimension updates between batches) — no
    streaming state at all, unlike a stream-stream join.  The canonical
    lookup-table shape at any scale."""
    from pyspark.sql.functions import broadcast

    return events.join(broadcast(dim),
                       events[event_key] == dim[dim_key], "left")


def run_to_memory(stream_df: DataFrame, name: str,
                  output_mode: str = "complete",
                  shuffle_partitions: int | None = None):
    """Drive a streaming frame to completion against the available input
    and land results in an in-memory table (test/demo harness).  Returns
    the StreamingQuery (stopped).

    ``shuffle_partitions`` pins the query's state-store partition count
    (fixed at first start for the life of a streaming query).  Streaming
    state partitioning should match key cardinality / executor count, not
    the batch shuffle default: every micro-batch commits one state
    snapshot per partition, so over-partitioning multiplies fixed commit
    cost (measured 2.7× on a 100k-key dedup: 32 partitions 4.0 s vs 8
    partitions 1.5 s locally)."""
    spark = stream_df.sparkSession
    key = "spark.sql.shuffle.partitions"
    old = spark.conf.get(key)
    if shuffle_partitions is not None:
        spark.conf.set(key, str(shuffle_partitions))
    nd_key = "spark.sql.streaming.noDataMicroBatches.enabled"
    nd_old = spark.conf.get(nd_key, "true")
    if output_mode == "complete":
        # The trailing no-data microbatch exists to FLUSH results that
        # only a watermark advance can finalize — required in append
        # mode (final windows) and update mode (state timeouts).  A
        # complete-mode sink re-emits the identical full result every
        # batch, so its no-data batch is pure state-store-commit and
        # sink-rewrite churn: skip it.  (Measured on streaming_cms:
        # 5.10 -> 3.49 s per run, rows identical.)  Scoped to this
        # query via conf-set-around-start, like shuffle_partitions.
        spark.conf.set(nd_key, "false")
    try:
        q = (stream_df.writeStream.outputMode(output_mode)
             .format("memory").queryName(name).start())
        try:
            q.processAllAvailable()
        finally:
            # stop on failure too: a leaked running query keeps the
            # memory-sink name registered (a corrected retry under the
            # same name then fails) and keeps consuming source files
            q.stop()
        return q
    finally:
        if output_mode == "complete":
            spark.conf.set(nd_key, nd_old)
        if shuffle_partitions is not None:
            spark.conf.set(key, old)


def hll_window_registers(events: DataFrame, window: str = "1 hour",
                         watermark: str = "2 hours",
                         key_col: str = "user_id",
                         m: int = 256,
                         ts_col: str = "ts") -> DataFrame:
    """Streaming per-window HyperLogLog registers of ``key_col`` — the
    mergeable-sketch answer to "distinct users per hour" on an
    unbounded stream.

    Exact streaming COUNT(DISTINCT) is not incrementally maintainable
    (Spark rejects it in streaming aggregations: state would be the
    full key set per window).  HLL registers ARE: ``max(rho)`` is a
    plain streaming aggregate, so state is ≤ m rows per open window —
    bounded by the watermark like any windowed count, independent of
    how many distinct keys flow through.  The same registers a batch
    job computes merge with these (functions/sketches.py contract),
    so a lambda-architecture reconciliation is a groupBy-max union.

    Output: (window_start, window_end, register, rho) — collapse with
    ``sketches.hll_estimate(..., group_cols=["window_start"])``.
    """
    from cs186_query_optimization_project_spark.functions.sketches import (
        hll_register_sql,
    )
    register, rho = hll_register_sql(f"cast({key_col} as string)", m)
    src = events.withWatermark(ts_col, watermark) if events.isStreaming \
        else events
    base = src.select(
        F.col(ts_col),
        F.expr(register).alias("register"),
        F.expr(rho).alias("rho"))
    return (base.groupBy(F.window(F.col(ts_col), window).alias("win"),
                         F.col("register"))
            .agg(F.max("rho").alias("rho"))
            .select(F.col("win.start").alias("window_start"),
                    F.col("win.end").alias("window_end"),
                    "register", "rho"))


def cms_window_counters(events: DataFrame, window: str = "1 hour",
                        watermark: str = "2 hours",
                        key_col: str = "user_id", d: int = 3,
                        w: int = 2048,
                        ts_col: str = "ts") -> DataFrame:
    """Streaming per-window Count-Min grid of ``key_col`` — bounded
    per-key frequency tracking on an unbounded stream.

    Exact per-key streaming counts need state proportional to the key
    space; the CMS grid is a plain streaming count aggregate over at
    most d·w cells per open window (watermark-evicted), with the usual
    one-sided error.  Grids merge by cell-wise sum, so stream and
    backfill reconcile like the HLL registers do.

    Output: (window_start, window_end, row, idx, cnt) — probe with
    min-over-rows against any key's d cell positions.
    """
    from cs186_query_optimization_project_spark.functions.sketches import (
        _cms_idx,
    )
    key = f"cast({key_col} as string)"
    src = events.withWatermark(ts_col, watermark) if events.isStreaming \
        else events
    cells = F.array(*[
        F.struct(F.lit(r).alias("row"),
                 F.expr(_cms_idx(key, r, w)).cast("int").alias("idx"))
        for r in range(d)])
    base = src.select(F.col(ts_col), F.explode(cells).alias("c"))
    return (base.groupBy(F.window(F.col(ts_col), window).alias("win"),
                         F.col("c.row").alias("row"),
                         F.col("c.idx").alias("idx"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select(F.col("win.start").alias("window_start"),
                    F.col("win.end").alias("window_end"),
                    "row", "idx", "cnt"))
