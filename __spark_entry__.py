"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (3-table join + filter + group-by
aggregation) through the engine's System-R-optimized path on sf0.001.

``queries()`` exposes one entry per implemented operator from SURVEY.md §2
plus the beyond-reference pipeline operators; ``oracle_sql()`` gives the
DuckDB-equivalent SQL for every SQL-expressible one.

Determinism contract with the oracle: double-typed aggregates go through
DECIMAL(18,4) sums (float addition is not associative across partitionings),
timestamps are compared as formatted strings or whole-second epochs, and
every top-k has a unique tie-break column.
"""

from __future__ import annotations

from collections.abc import Callable
from contextlib import contextmanager as _contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cs186_query_optimization_project_spark import Database
from cs186_query_optimization_project_spark.database import (
    ensure_private_dir as _ensure_private_dir,
)
from cs186_query_optimization_project_spark.functions import (
    classify,
    contamination,
    dedup,
    multimodal,
    sampling,
    similarity,
    text,
)
from cs186_query_optimization_project_spark.operators import setops, windows
from cs186_query_optimization_project_spark.parallel import (
    local_rows_df as _ldf,
)
from cs186_query_optimization_project_spark.predicates import (
    EQ,
    GT,
    GTE,
    LT,
    LTE,
    NEQ,
)
from cs186_query_optimization_project_spark.streaming import windows as stream_windows

_DBS: dict[tuple[int, str], Database] = {}


def _tag(sf_dir: str) -> str:
    """Stable per-corpus tag for tmp paths / table / sink names.  hash()
    is salted per process (PYTHONHASHSEED), which made every run mint new
    warehouse tables and /tmp exports that nothing deleted; md5 is stable
    so overwrite-mode writes reuse the same paths across runs."""
    import hashlib

    return hashlib.md5(sf_dir.encode()).hexdigest()[:8]



def _db(spark: SparkSession, sf_dir: str) -> Database:
    key = (id(spark), sf_dir)
    if key not in _DBS:
        _DBS[key] = Database(spark, sf_dir)
    return _DBS[key]


def _pid_alive(pid: int) -> bool:
    """True iff ``pid`` is a live process we could signal.  EPERM means
    alive-but-foreign; foreign uids can't be inside our 0700 scratch
    parents anyway, so treating it as alive is the safe direction
    (never reclaim a dir that might still be in use)."""
    import os

    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True
    return True


@_contextmanager
def _scratch_base(kind: str, sf_dir: str):
    """Pid-suffixed private scratch base for entries that write a /tmp
    copy-on-write version trail (DML / time-travel / merge / txn /
    compaction).  Three guarantees, each pinned by
    ``tests/test_dml_isolation.py``:

    - **pid suffix**: a concurrent same-uid process lands on a disjoint
      base, so its start-of-entry rmtree cannot clobber our in-flight
      trail (the round-8 FAILED_READ_FILE class).
    - **exception-safe reclaim**: the base is rmtree'd in ``finally`` —
      a mid-entry failure cannot leak a version trail that no later run
      would reclaim (pid-suffixed names are never reused).  Callers must
      therefore ``localCheckpoint()`` their result BEFORE the with-block
      exits.
    - **migration + dead-pid sweep**: the pre-round-9 un-suffixed
      ``<tag>`` dir and any ``<tag>_<pid>`` sibling whose pid is no
      longer alive are removed at entry start, so crashed runs and
      legacy residue cannot accumulate in /tmp forever.
    """
    import os
    import shutil

    parent = _ensure_private_dir(f"/tmp/spark_graft_{kind}_{os.getuid()}")
    tag = _tag(sf_dir)
    # one-time migration: the pre-r9 scheme used the bare tag
    shutil.rmtree(os.path.join(parent, tag), ignore_errors=True)
    for d in os.listdir(parent):
        suffix = d[len(tag) + 1:]
        if (d.startswith(f"{tag}_") and suffix.isdigit()
                and not _pid_alive(int(suffix))):
            shutil.rmtree(os.path.join(parent, d), ignore_errors=True)
    base = os.path.join(parent, f"{tag}_{os.getpid()}")
    shutil.rmtree(base, ignore_errors=True)
    try:
        yield base
    finally:
        shutil.rmtree(base, ignore_errors=True)


def _tmp_path(kind: str, sf_dir: str, leaf: str) -> str:
    """Scratch path under a per-uid 0700 parent — no other local user can
    pre-create, poison, or collide with it (the same guard the ANN index
    and DML/txn entries use; every /tmp write in this module must go
    through it).  ``ensure_private_dir`` verifies ownership+mode after
    the mkdir: ``mode=`` is ignored for a pre-existing directory, so a
    bare makedirs would accept another user's planted path."""
    import os

    parent = _ensure_private_dir(f"/tmp/spark_graft_{kind}_{os.getuid()}")
    return os.path.join(parent, _tag(sf_dir), leaf)



def _planted_docs(db):
    """Documents corpus with perturbed near-duplicate plants (every 10th
    doc re-appended with one extra word, ids offset by 1e6).  Shared by
    the three near-dup entries; the ngram_jaccard ORACLE SQL re-encodes
    the same planting — keep them in sync."""
    docs = db.table("documents")
    planted = (docs.filter(F.col("doc_id") % 10 == 0)
               .select((F.col("doc_id") + 1000000).alias("doc_id"),
                       F.concat(F.col("text"), F.lit(" appendix"))
                       .alias("text")))
    return docs.select("doc_id", "text").unionByName(planted)


# ===================================================================== #
# flagship
# ===================================================================== #
def _flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    db = _db(spark, sf_dir)
    return (db.query("customer")
            .join("orders", "c_custkey", "o_custkey")
            .join("lineitem", "o_orderkey", "l_orderkey")
            .where("l_discount", GT, 0.05)
            .group_by("c_mktsegment")
            .count()
            .sum("l_extendedprice", out="revenue", exact=True)
            .average("l_quantity", out="avg_qty", exact=True)
            .execute_optimal())


def _job_counter(spark: SparkSession) -> int:
    """The scheduler's next-job-id counter AS AN INT, so zero-Spark-job
    contracts compare values rather than py4j proxies.  PySpark 4.1's
    py4j unwraps ``DAGScheduler.nextJobId`` to a plain int; on builds
    where it surfaces as the AtomicInteger JavaObject itself, ``==``
    would delegate to Java reference equality and the contract check
    would be vacuous — unwrap via ``.get()`` there."""
    v = spark.sparkContext._jsc.sc().dagScheduler().nextJobId()
    return v if isinstance(v, int) else int(v.get())


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _flagship(spark, "/root/testdata/sf0.001")


# ===================================================================== #
# reference-parity queries (SURVEY.md §2.1–2.4)
# ===================================================================== #
def q_scan(spark, sf_dir):
    return _db(spark, sf_dir).query("region").execute()


def q_filter_eq(spark, sf_dir):
    return (_db(spark, sf_dir).query("customer")
            .where("c_mktsegment", EQ, "BUILDING")
            .select("c_custkey", "c_name").execute())


def q_filter_range(spark, sf_dir):
    return (_db(spark, sf_dir).query("lineitem")
            .where("l_quantity", GTE, 30.0)
            .where("l_discount", LT, 0.03)
            .select("l_orderkey", "l_linenumber", "l_quantity").execute())


def q_filter_neq(spark, sf_dir):
    return (_db(spark, sf_dir).query("orders")
            .where("o_orderstatus", NEQ, "O")
            .select("o_orderkey", "o_orderstatus").execute())


def q_project(spark, sf_dir):
    return (_db(spark, sf_dir).query("customer")
            .select(("c_name", "name"), ("c_mktsegment", "segment"))
            .execute())


def q_groupby_count(spark, sf_dir):
    return (_db(spark, sf_dir).query("customer")
            .group_by("c_mktsegment").count().execute())


def q_groupby_sum_avg(spark, sf_dir):
    return (_db(spark, sf_dir).query("lineitem")
            .group_by("l_returnflag")
            .count()
            .sum("l_quantity", out="sum_qty", exact=True)
            .average("l_extendedprice", out="avg_price", exact=True)
            .min("l_extendedprice", out="min_price")
            .max("l_extendedprice", out="max_price")
            .execute())


def q_join_two(spark, sf_dir):
    return (_db(spark, sf_dir).query("nation")
            .join("region", "n_regionkey", "r_regionkey")
            .select("n_name", "r_name").execute())


def q_join_three_flagship(spark, sf_dir):
    return _flagship(spark, sf_dir)


def q_self_join_alias(spark, sf_dir):
    return (_db(spark, sf_dir).query("nation", alias="n1")
            .join("nation", "n1.n_regionkey", "n_regionkey", alias="n2")
            .select(("n1.n_nationkey", "k1"), ("n2.n_nationkey", "k2"),
                    ("n1.n_name", "name1"), ("n2.n_name", "name2"))
            .execute())


def q_index_range_scan(spark, sf_dir):
    # the index-scan analog: pushed range filter on a date column reaches
    # the parquet scan (row-group min/max skipping on sorted data)
    df = (_db(spark, sf_dir).query("lineitem")
          .where("l_shipdate", GTE, "1998-09-01")
          .select("l_orderkey", "l_linenumber", "l_shipdate").execute())
    return df.select("l_orderkey", "l_linenumber",
                     F.date_format("l_shipdate", "yyyy-MM-dd")
                     .alias("ship_date"))


def q_lookup_key(spark, sf_dir):
    """Point read (lookupKey analog, ``BPlusTree.java:106–121``): pushed
    equality on the key column; row-group min/max skip on sorted data."""
    return (_db(spark, sf_dir).lookup("customer", "c_custkey", 7)
            .select("c_custkey", "c_name", "c_mktsegment"))


def q_contains_key(spark, sf_dir):
    """containsKey analog (``BPlusTree.java:123–128``): existence probes
    over keys present and absent; each probe stops at first hit."""
    db = _db(spark, sf_dir)
    rows = [(k, db.contains("part", "p_partkey", k))
            for k in (1, 7, 999999999)]
    return _ldf(spark, rows, "probe_key BIGINT, found BOOLEAN")


def q_grace_hash_join(spark, sf_dir):
    # GraceHash parity: pinned shuffle-hash strategy (JoinOperator.java:19–24
    # GRACEHASH → Spark ShuffledHashJoin)
    return (_db(spark, sf_dir).query("part")
            .join("lineitem", "p_partkey", "l_partkey",
                  strategy="shuffle_hash")
            .group_by("p_brand")
            .count()
            .sum("l_quantity", out="sum_qty", exact=True)
            .execute())


def q_broadcast_join(spark, sf_dir):
    return (_db(spark, sf_dir).query("lineitem")
            .join("supplier", "l_suppkey", "s_suppkey", strategy="broadcast")
            .group_by("s_nationkey")
            .count()
            .sum("l_extendedprice", out="revenue", exact=True)
            .execute())


# ===================================================================== #
# additive relational operators (SURVEY.md §2.5–2.8)
# ===================================================================== #
def q_csv_source(spark, sf_dir):
    """CSV ingestion path (§2.1: the reference loads its corpus from CSVs):
    export nation to CSV, re-read it through the engine's schema-checked
    CSV reader — result must equal the parquet original."""
    from cs186_query_optimization_project_spark.sources import readers

    db = _db(spark, sf_dir)
    path = _tmp_path("csv", sf_dir, "nation")
    db.table("nation").write.mode("overwrite").option("header", True).csv(path)
    return readers.read_csv(spark, path, db.schema("nation"), header=True)


def q_json_source(spark, sf_dir):
    """JSON-lines ingestion path: export region to JSONL, re-read through
    the engine's JSON reader with an explicit schema."""
    from cs186_query_optimization_project_spark.sources import readers

    db = _db(spark, sf_dir)
    path = _tmp_path("json", sf_dir, "region")
    db.table("region").write.mode("overwrite").json(path)
    return readers.read_json(spark, path, schema=db.schema("region"))


def q_compact_scan(spark, sf_dir):
    """Small-file compaction (sources/writers.py compact_table — the
    Delta OPTIMIZE / Iceberg rewrite analog): fragment orders into 40
    tiny files, compact to size-targeted files with re-sort on the
    key, and return the content — identical to the original (the
    oracle), while the file count drops ~40× (asserted in
    tests/test_sources.py)."""
    import os

    from cs186_query_optimization_project_spark.sources import writers

    db = _db(spark, sf_dir)
    with _scratch_base("compact", sf_dir) as base:
        path = os.path.join(base, "orders")
        db.table("orders").repartition(40).write.parquet(path)
        writers.compact_table(spark, path, target_file_bytes=512 << 20,
                              sort_by=("o_orderkey",))
        # localCheckpoint: the compacted files are reclaimed on
        # with-exit, so the returned frame must not read them lazily.
        out = spark.read.parquet(path).localCheckpoint()
    return out


def q_text_source(spark, sf_dir):
    """Raw line-delimited text ingestion (the rawest corpus landing
    format): export document bodies one per line, re-read through the
    engine's text reader — the multiset of lines must equal the
    original text column (corpus texts are newline-free; a real WET
    pipeline would escape)."""
    from cs186_query_optimization_project_spark.sources import readers

    db = _db(spark, sf_dir)
    path = _tmp_path("text", sf_dir, "documents")
    (db.table("documents").select("text")
     .write.mode("overwrite").text(path))
    return readers.read_text(spark, path, column="text")


def q_orc_source(spark, sf_dir):
    """ORC ingestion path: export supplier to ORC, re-read through the
    engine's schema-verified ORC reader — result must equal the parquet
    original (same FAILFAST philosophy as the CSV/JSON readers)."""
    from cs186_query_optimization_project_spark.sources import readers

    db = _db(spark, sf_dir)
    path = _tmp_path("orc", sf_dir, "supplier")
    db.table("supplier").write.mode("overwrite").orc(path)
    return readers.read_orc(spark, path, expected_schema=db.schema("supplier"))


def q_indexed_write_scan(spark, sf_dir):
    """Index analog (§2.11): write lineitem sorted by l_shipdate (the
    'indexed' column), then range-scan the sorted copy — the pushed filter
    skips row groups via parquet min/max, Spark's equivalent of a B+tree
    range scan."""
    from cs186_query_optimization_project_spark.sources import writers

    db = _db(spark, sf_dir)
    path = _tmp_path("idx", sf_dir, "lineitem")
    writers.write_indexed(db.table("lineitem"), path,
                          index_columns=("l_shipdate",))
    return (spark.read.parquet(path)
            .filter(F.col("l_shipdate") >= "1998-09-01")
            .select("l_orderkey", "l_linenumber",
                    F.date_format("l_shipdate", "yyyy-MM-dd")
                    .alias("ship_date")))


def q_dml_lifecycle(spark, sf_dir):
    """DDL + DML driver row: the full ``Transaction`` write surface —
    ``createTable`` (``db/Database.java:87–163``), ``addRecord`` /
    ``updateRecord`` / ``deleteRecord`` (``db/Database.java:317–401``) and
    catalog drop — as copy-on-write Parquet versions.  Each mutation reads
    the previous version and writes the next (simple MVCC; the 100 TB
    story is identical, per-file instead of per-table, under Delta or
    Iceberg).  Returns the final table content so the oracle can replay
    the same mutations in SQL."""
    db = _db(spark, sf_dir)
    with _scratch_base("dml", sf_dir) as base:
        db.create_table("nation_dml", db.table("nation"), f"{base}/nation",
                        index_columns=("n_nationkey",), mode="overwrite")
        db.insert_rows("nation_dml", _ldf(spark,
            [(100, "ATLANTIS", 0), (101, "ELDORADO", 1)],
            schema=db.schema("nation_dml")))
        db.update_rows("nation_dml", F.col("n_regionkey") == 2,
                       {"n_name": F.concat(F.col("n_name"), F.lit("*"))})
        db.delete_rows("nation_dml", F.col("n_nationkey").between(10, 14))
        # Detach the (nation-sized) result from the /tmp trail so the
        # returned DataFrame survives the with-exit rmtree and any
        # concurrent invocation's reclaim.
        out = (db.table("nation_dml")
               .select("n_nationkey", "n_name", "n_regionkey")
               .localCheckpoint())
        db.drop_table("nation_dml")
    return out


def q_time_travel(spark, sf_dir):
    """MVCC time travel over the copy-on-write DML trail
    (``Database.table_at_version`` — Delta-style VERSION AS OF): create
    a table, commit an insert then a delete, and read ALL three
    published versions back, summarizing each (row count + key sum) so
    the oracle can replay the version states in SQL.  Old versions are
    plain parquet scans of retained paths — no log replay, and only
    published commits appear (orphaned staged dirs never do)."""
    from functools import reduce

    db = _db(spark, sf_dir)
    with _scratch_base("tt", sf_dir) as base:
        db.create_table("nation_tt", db.table("nation"), f"{base}/nation",
                        mode="overwrite")
        db.insert_rows("nation_tt", _ldf(spark,
            [(200, "ATLANTIS", 0), (201, "ELDORADO", 1)],
            schema=db.schema("nation_tt")))
        db.delete_rows("nation_tt", F.col("n_nationkey").between(10, 14))
        parts = [
            db.table_at_version("nation_tt", v)
            .select(F.lit(v).cast("bigint").alias("version"), "n_nationkey")
            for v in db.table_versions("nation_tt")]
        # localCheckpoint the 3-row summary: the result detaches from
        # the /tmp version files before the with-exit rmtree.
        out = (reduce(lambda a, b: a.unionByName(b), parts)
               .groupBy("version")
               .agg(F.count(F.lit(1)).alias("n_rows"),
                    F.sum("n_nationkey").alias("key_sum"))
               .localCheckpoint())
        db.drop_table("nation_tt")
    return out


def q_mvcc_vacuum(spark, sf_dir):
    """MVCC storage-reclamation driver row (``Database.vacuum`` —
    Delta's ``VACUUM``): create a table, commit an insert then a delete
    (versions 0..2), vacuum with ``keep_last=2``, and summarize the
    RETAINED versions (version, n_rows, key_sum).  In-entry contract
    raises (not asserts — must survive ``python -O``): vacuum must
    delete exactly version 0's directory, a time-travel read of it must
    raise the named vacuumed error, and retained numbering must stay
    stable at [1, 2] (never renumbered).  The oracle replays the two
    retained version states in SQL."""
    import os
    from functools import reduce

    from cs186_query_optimization_project_spark.errors import (
        DatabaseException,
    )

    db = _db(spark, sf_dir)
    with _scratch_base("vac", sf_dir) as base:
        db.create_table("nation_vac", db.table("nation"), f"{base}/nation",
                        mode="overwrite")
        db.insert_rows("nation_vac", _ldf(spark,
            [(300, "ATLANTIS", 0), (301, "ELDORADO", 1)],
            schema=db.schema("nation_vac")))
        db.delete_rows("nation_vac", F.col("n_nationkey").between(5, 9))
        removed = db.vacuum("nation_vac", keep_last=2)
        if len(removed) != 1 or os.path.exists(removed[0]):
            raise RuntimeError(
                f"vacuum must delete exactly the v0 dir; got {removed}")
        if db.table_versions("nation_vac") != [1, 2]:
            raise RuntimeError(
                "vacuum must keep version numbers stable at [1, 2]")
        try:
            db.table_at_version("nation_vac", 0)
            raise RuntimeError("reading a vacuumed version must raise")
        except DatabaseException:
            pass
        parts = [
            db.table_at_version("nation_vac", v)
            .select(F.lit(v).cast("bigint").alias("version"), "n_nationkey")
            for v in db.table_versions("nation_vac")]
        # localCheckpoint: detach the 2-row summary from the /tmp trail
        # before the with-exit rmtree.
        out = (reduce(lambda a, b: a.unionByName(b), parts)
               .groupBy("version")
               .agg(F.count(F.lit(1)).alias("n_rows"),
                    F.sum("n_nationkey").alias("key_sum"))
               .localCheckpoint())
        db.drop_table("nation_vac")
    return out


def q_partitioned_dml(spark, sf_dir):
    """Partition-level copy-on-write DML driver row (``partitioned.py``
    — the O(touched partitions) upgrade over the table-level DML the
    SCALE.md DML section names): customer lands as a manifest-versioned
    table partitioned by ``c_mktsegment`` (5 partitions), then an
    insert (BUILDING), a delete (AUTOMOBILE negatives), and an update
    (MACHINERY +100) commit three manifest versions.  In-entry contract
    raises (must survive ``python -O``): each DML version must SHARE
    every untouched partition's directory with its parent version (the
    O(touched) claim, checked on the actual manifests), and a
    partition-pruned read must list only that partition's directories.
    Returns the final per-segment summary; the oracle replays the three
    mutations in SQL."""
    from cs186_query_optimization_project_spark.partitioned import (
        PartitionedTable,
    )

    db = _db(spark, sf_dir)
    with _scratch_base("pdml", sf_dir) as base:
        pt = PartitionedTable.create(
            spark,
            db.table("customer").select("c_custkey", "c_mktsegment",
                                        "c_acctbal"),
            f"{base}/customer", "c_mktsegment")
        pt.insert(_ldf(spark,
            [(900000001, "BUILDING", 1234.56),
             (900000002, "BUILDING", 789.01)],
            "c_custkey bigint, c_mktsegment string, c_acctbal double"))
        pt.delete((F.col("c_mktsegment") == "AUTOMOBILE")
                  & (F.col("c_acctbal") < 0))
        pt.update(F.col("c_mktsegment") == "MACHINERY",
                  {"c_acctbal": F.col("c_acctbal") + 100.0})

        def dirs(v):
            return pt._manifest(v)["parts"]

        for ver, touched in ((1, {"BUILDING"}), (2, {"AUTOMOBILE"}),
                             (3, {"MACHINERY"})):
            for seg, ds in dirs(ver).items():
                shared = ds == dirs(ver - 1).get(seg, [])
                if (seg in touched) == shared:
                    raise RuntimeError(
                        f"v{ver}: partition {seg} "
                        f"{'rewritten' if not shared else 'shared'} — "
                        f"DML must touch exactly {touched}")
        pruned = pt.read(partition_values=["FURNITURE"])
        import os as _os
        allowed = {_os.path.normpath(d) for d in dirs(3)["FURNITURE"]}
        read_dirs = {
            _os.path.normpath(_os.path.dirname(f.removeprefix("file:")))
            for f in pruned.inputFiles()}
        if not read_dirs or not read_dirs.issubset(allowed):
            raise RuntimeError(
                f"pruned read listed {read_dirs - allowed} beyond the "
                f"FURNITURE manifest entries")

        out = (pt.read()
               .groupBy("c_mktsegment")
               .agg(F.count(F.lit(1)).alias("n_rows"),
                    F.sum(F.col("c_acctbal").cast("decimal(18,4)"))
                    .cast("double").alias("acct_sum"))
               .localCheckpoint())
    return out


def q_partitioned_merge(spark, sf_dir):
    """MERGE upsert on a PartitionedTable (same statement surface as
    ``q_merge_upsert`` / the reference's bulk-load-then-update flows,
    but at O(touched partitions) instead of O(table)).  Source =
    every existing customer with ``c_custkey % 100 == 0`` (acctbal
    zeroed) plus two brand-new keys.  In-entry contract (must survive
    ``python -O``): partitions owning a MATCHED target row are
    rewritten (old dir-list replaced); partitions touched only by
    inserts keep their old dir-list as a prefix (pure append).  The
    oracle replays MERGE as anti-join ∪ source."""
    from cs186_query_optimization_project_spark.partitioned import (
        PartitionedTable,
    )

    db = _db(spark, sf_dir)
    with _scratch_base("pmrg", sf_dir) as base:
        target = db.table("customer").select("c_custkey", "c_mktsegment",
                                             "c_acctbal")
        pt = PartitionedTable.create(spark, target, f"{base}/customer",
                                     "c_mktsegment")
        matched = (target.filter(F.col("c_custkey") % 100 == 0)
                   .withColumn("c_acctbal", F.lit(0.0)))
        new_rows = _ldf(spark,
            [(910000001, "BUILDING", 11.5), (910000002, "HOUSEHOLD", 22.5)],
            "c_custkey bigint, c_mktsegment string, c_acctbal double")
        touched = {r[0] for r in
                   matched.select("c_mktsegment").distinct().collect()}
        pt.merge(matched.unionByName(new_rows), "c_custkey")
        d0 = pt._manifest(0)["parts"]
        d1 = pt._manifest(1)["parts"]
        for seg, ds in d1.items():
            old = d0.get(seg, [])
            appended = ds[:len(old)] == old
            if seg in touched and appended and old:
                raise RuntimeError(
                    f"matched partition {seg} was not rewritten")
            if seg not in touched and not appended:
                raise RuntimeError(
                    f"insert-only partition {seg} was rewritten")
        out = (pt.read()
               .groupBy("c_mktsegment")
               .agg(F.count(F.lit(1)).alias("n_rows"),
                    F.sum(F.when(F.col("c_acctbal") == 0.0, 1)
                          .otherwise(0)).cast("bigint").alias("n_zeroed"),
                    F.sum(F.col("c_acctbal").cast("decimal(18,4)"))
                    .cast("double").alias("acct_sum"))
               .localCheckpoint())
    return out


def q_metadata_agg(spark, sf_dir):
    """Metadata-only aggregates on a PartitionedTable (Delta answers
    COUNT(*)/MIN/MAX from per-file stats without scanning; same
    contract here from manifest + parquet-footer stats at directory
    granularity — ``partitioned.py`` ``metadata_count`` /
    ``metadata_min_max``).  orders lands partitioned by
    ``o_orderstatus``, gains two appended rows, soft-deletes one, then
    OPTIMIZE materializes the tombstone.  In-entry contract raises
    (must survive ``python -O``): while the tombstone is live,
    ``metadata_count`` must still answer EXACTLY with zero Spark jobs
    (the soft delete records each directory's masked-row cardinality
    at commit time — the Delta deletion-vector cardinality move — so
    COUNT subtracts instead of failing closed) while
    ``metadata_min_max`` fails CLOSED (a masked row can own the
    extremum); after OPTIMIZE both answers come back with ZERO Spark
    jobs scheduled and equal the scan answers.  The oracle replays
    insert + soft delete in SQL."""
    from cs186_query_optimization_project_spark.partitioned import (
        PartitionedTable,
    )

    db = _db(spark, sf_dir)
    with _scratch_base("meta", sf_dir) as base:
        pt = PartitionedTable.create(
            spark,
            db.table("orders").select("o_orderkey", "o_orderstatus"),
            f"{base}/orders", "o_orderstatus")
        pt.insert(_ldf(spark,
            [(900000001, "X"), (900000002, "X")],
            "o_orderkey bigint, o_orderstatus string"))
        pt.delete_soft("o_orderkey = 900000002")
        jobs_before = _job_counter(spark)
        n_soft = pt.metadata_count()
        mm_soft = pt.metadata_min_max("o_orderkey")
        if _job_counter(spark) != jobs_before:
            raise RuntimeError(
                "tombstoned metadata_count scheduled Spark jobs; the "
                "contract is zero")
        if mm_soft is not None:
            raise RuntimeError(
                "live tombstone must fail metadata_min_max closed "
                "(a masked row can own the extremum)")
        n_scan = pt.read().count()
        if n_soft != n_scan:
            raise RuntimeError(
                f"tombstone-aware metadata_count {n_soft} != scan "
                f"{n_scan}")
        pt.optimize()  # materialize the tombstone -> stats exact again
        jobs_before = _job_counter(spark)
        n = pt.metadata_count()
        lo_hi = pt.metadata_min_max("o_orderkey")
        jobs_after = _job_counter(spark)
        if jobs_after != jobs_before:
            raise RuntimeError(
                f"metadata aggregates scheduled "
                f"{jobs_after - jobs_before} Spark jobs; the contract "
                f"is zero")
        actual = pt.read().agg(
            F.count(F.lit(1)), F.min("o_orderkey"),
            F.max("o_orderkey")).collect()[0]
        if n != actual[0] or lo_hi != (actual[1], actual[2]):
            raise RuntimeError(
                f"metadata ({n}, {lo_hi}) != scan {tuple(actual)}")
        out = _ldf(spark,
            [(n, lo_hi[0], lo_hi[1])],
            "n_rows bigint, min_key bigint, max_key bigint")
    return out


def q_restore_clone(spark, sf_dir):
    """RESTORE + SHALLOW CLONE driver row (Delta's ``RESTORE`` /
    ``CLONE``, both O(metadata)): nation lands partitioned by
    n_regionkey, a bad DELETE commits, RESTORE rolls it back as a NEW
    version, then a shallow clone diverges with its own insert.
    In-entry contract raises (must survive ``python -O``): the restore
    must create ZERO new data directories (pure manifest write); the
    clone's parts/ must be EMPTY at creation (zero rows copied); and
    the clone's insert must leave the source's rows unchanged.  The
    oracle replays both final states in SQL."""
    import os
    from cs186_query_optimization_project_spark.partitioned import (
        PartitionedTable,
    )

    db = _db(spark, sf_dir)
    with _scratch_base("rstc", sf_dir) as base:
        pt = PartitionedTable.create(
            spark,
            db.table("nation").select("n_nationkey", "n_name",
                                      "n_regionkey"),
            f"{base}/nation", "n_regionkey")
        pt.delete(F.col("n_nationkey") % 2 == 0)         # the bad commit
        dirs_before = set(os.listdir(os.path.join(pt.root, "parts")))
        pt.restore(0)
        if set(os.listdir(os.path.join(pt.root, "parts"))) != dirs_before:
            raise RuntimeError("restore must not create data dirs")
        clone = pt.clone(f"{base}/clone")
        if os.listdir(os.path.join(clone.root, "parts")):
            raise RuntimeError("shallow clone must copy zero data")
        clone.insert(_ldf(spark,
            [(300, "ATLANTIS", 2)],
            schema=pt.read().schema))
        n_src = pt.read().count()
        if clone.read().count() != n_src + 1:
            raise RuntimeError("clone insert must not be visible in "
                               "source (or insert lost)")

        def summary(table, tag):
            return (table.read()
                    .agg(F.count(F.lit(1)).alias("n_rows"),
                         F.sum("n_nationkey").cast("bigint")
                         .alias("key_sum"))
                    .select(F.lit(tag).alias("tbl"), "n_rows", "key_sum"))

        out = (summary(pt, "source").unionByName(summary(clone, "clone"))
               .localCheckpoint())
    return out


def q_check_constraints(spark, sf_dir):
    """CHECK constraints on a PartitionedTable (Delta ``ALTER TABLE
    ... ADD CONSTRAINT`` parity): registration validates existing rows
    first; every later row-producing commit validates its batch before
    publishing.  In-entry contract raises (must survive ``python -O``):
    (a) adding a constraint the existing data violates must be refused
    (``c_custkey > 10`` — keys 0..10 always exist); (b) a violating
    insert must be refused AND publish nothing (version unchanged);
    (c) a valid insert under the constraint commits.  The oracle
    replays the final state in SQL."""
    from cs186_query_optimization_project_spark.errors import (
        DatabaseException,
    )
    from cs186_query_optimization_project_spark.partitioned import (
        PartitionedTable,
    )

    db = _db(spark, sf_dir)
    with _scratch_base("chk", sf_dir) as base:
        pt = PartitionedTable.create(
            spark,
            db.table("customer").select("c_custkey", "c_mktsegment",
                                        "c_acctbal"),
            f"{base}/customer", "c_mktsegment")
        try:
            pt.add_constraint("key_gt_10", "c_custkey > 10")
            raise RuntimeError(
                "add_constraint must refuse a constraint existing rows "
                "violate")
        except DatabaseException:
            pass
        pt.add_constraint("key_nonneg", "c_custkey >= 0")
        v = pt.versions()[-1]
        bad = _ldf(spark, [(-5, "BUILDING", 1.0)],
                                    schema=pt.read().schema)
        try:
            pt.insert(bad)
            raise RuntimeError("violating insert must be refused")
        except DatabaseException:
            pass
        if pt.versions()[-1] != v:
            raise RuntimeError(
                "refused insert must not publish a version")
        pt.insert(_ldf(spark, [(920000001, "BUILDING", 7.5)],
                                        schema=pt.read().schema))
        out = (pt.read()
               .agg(F.count(F.lit(1)).alias("n_rows"),
                    F.min("c_custkey").cast("bigint").alias("min_key"),
                    F.max("c_custkey").cast("bigint").alias("max_key"))
               .localCheckpoint())
    return out


def q_mview_refresh(spark, sf_dir):
    """Incrementally-maintained materialized view (Gupta/Mumick IVM):
    per-segment (count, sum) over customer materializes once, then an
    insert + delete + update churn the source and ``refresh()`` folds
    ONLY the CDF deltas — never rescanning the source.  In-entry
    contract raises (must survive ``python -O``): the refreshed view
    must equal a from-scratch recompute (counts exactly, sums to 1e-6
    — the incremental sum is float-order-independent only to last
    bits); a second refresh must be a 0-change no-op.  The oracle
    replays the final aggregate in SQL."""
    from cs186_query_optimization_project_spark.mview import (
        MaterializedView,
    )
    from cs186_query_optimization_project_spark.partitioned import (
        PartitionedTable,
    )

    db = _db(spark, sf_dir)
    with _scratch_base("mvw", sf_dir) as base:
        pt = PartitionedTable.create(
            spark,
            db.table("customer").select("c_custkey", "c_mktsegment",
                                        "c_acctbal"),
            f"{base}/customer", "c_mktsegment")
        mv = MaterializedView.create(spark, pt, f"{base}/mv",
                                     keys=["c_mktsegment"],
                                     sum_cols=["c_acctbal"])
        pt.insert(_ldf(spark,
            [(940000001, "BUILDING", 100.5),
             (940000002, "MACHINERY", 200.25)],
            schema=pt.read().schema))
        pt.delete((F.col("c_mktsegment") == "AUTOMOBILE")
                  & (F.col("c_custkey") % 2 == 0))
        pt.update(F.col("c_mktsegment") == "FURNITURE",
                  {"c_acctbal": F.col("c_acctbal") + 10.0})
        if mv.refresh() == 0:
            raise RuntimeError("refresh must fold the churned rows")
        got = {r["c_mktsegment"]: (r["mv_count"], r["mv_sum_c_acctbal"])
               for r in mv.read().collect()}
        want = {r[0]: (r[1], r[2]) for r in
                pt.read().groupBy("c_mktsegment")
                .agg(F.count(F.lit(1)), F.sum("c_acctbal")).collect()}
        if set(got) != set(want) or any(
                got[k][0] != want[k][0]
                or abs(got[k][1] - want[k][1]) > 1e-6 for k in want):
            raise RuntimeError(
                f"incremental view diverged from recompute: {got} vs "
                f"{want}")
        if mv.refresh() != 0:
            raise RuntimeError("second refresh must be a no-op")
        out = (mv.read()
               .select(F.col("c_mktsegment"),
                       F.col("mv_count").cast("bigint").alias("n_rows"),
                       F.round("mv_sum_c_acctbal", 2).alias("acct_sum"))
               .localCheckpoint())
    return out


def q_table_history(spark, sf_dir):
    """DESCRIBE HISTORY parity: nation lands partitioned by
    n_regionkey (5 partitions at every SF), gains one appended row and
    loses one region; ``history()`` reports one row per version with
    the committing op and manifest-level sizes — computed from
    manifests alone, no data directory opened.  The timestamp column
    is dropped from the gate (wall-clock); everything else is exactly
    determined, so the oracle is a literal VALUES table."""
    from cs186_query_optimization_project_spark.partitioned import (
        PartitionedTable,
    )

    db = _db(spark, sf_dir)
    with _scratch_base("hist", sf_dir) as base:
        pt = PartitionedTable.create(
            spark,
            db.table("nation").select("n_nationkey", "n_name",
                                      "n_regionkey"),
            f"{base}/nation", "n_regionkey")
        pt.insert(_ldf(spark, [(300, "ATLANTIS", 2)],
                                        schema=pt.read().schema))
        pt.delete(F.col("n_regionkey") == 0)
        out = (pt.history()
               .select("version", "op", "n_partitions", "n_dirs")
               .localCheckpoint())
    return out


def q_stream_to_mview(spark, sf_dir):
    """Capstone composition — the full incremental-pipeline shape:
    a file stream (the Kafka stand-in) lands in a PartitionedTable
    through the EXACTLY-ONCE foreachBatch sink (per-sink batch
    watermarks in the manifest), and the downstream materialized view
    refreshes by folding ONLY the change feed.  In-entry contract
    raises (must survive ``python -O``): the refresh must fold > 0
    change rows; a replayed batch id must be a dedup no-op (the
    exactly-once guarantee) after which refresh folds 0; and the view
    must equal a from-scratch recompute.  Sums surface as CENTS
    (exact-integer totals of 2-decimal prices, so cross-engine double
    noise cannot move a rounding boundary).  The oracle replays the
    final aggregate in SQL."""
    from cs186_query_optimization_project_spark.mview import (
        MaterializedView,
    )
    from cs186_query_optimization_project_spark.partitioned import (
        PartitionedTable,
    )

    db = _db(spark, sf_dir)
    subset = (db.table("orders")
              .filter(F.col("o_orderkey") % 50 == 0)
              .select("o_orderkey", "o_orderstatus", "o_totalprice"))
    with _scratch_base("smv", sf_dir) as base:
        pt = PartitionedTable.create(
            spark, subset.filter(F.col("o_orderkey") % 100 == 0),
            f"{base}/orders", "o_orderstatus")
        mv = MaterializedView.create(spark, pt, f"{base}/mv",
                                     keys=["o_orderstatus"],
                                     sum_cols=["o_totalprice"])
        late = subset.filter(F.col("o_orderkey") % 100 == 50)
        late.write.parquet(f"{base}/src")
        q = (spark.readStream
             .schema("o_orderkey bigint, o_orderstatus string, "
                     "o_totalprice double")
             .parquet(f"{base}/src")
             .writeStream.option("checkpointLocation", f"{base}/ckpt")
             .foreachBatch(pt.foreach_batch_sink("ingest"))
             .trigger(availableNow=True).start())
        finished = q.awaitTermination(120)
        q.stop()
        if not finished:
            raise RuntimeError(
                "ingest stream timed out before draining — a partial "
                "ingest would pass the in-entry contracts but diverge "
                "from the oracle untraceably")
        if mv.refresh() == 0:
            raise RuntimeError("refresh must fold the streamed rows")
        wm = pt._manifest().get("txns", {}).get("ingest")
        if wm is None:
            raise RuntimeError("sink watermark missing from manifest")
        if pt.idempotent_append(late.limit(1), "ingest", wm):
            raise RuntimeError(
                "replayed batch id must be an exactly-once no-op")
        if mv.refresh() != 0:
            raise RuntimeError("no-op replay must leave nothing to fold")
        got = {r["o_orderstatus"]: (r["mv_count"],
                                    r["mv_sum_o_totalprice"])
               for r in mv.read().collect()}
        want = {r[0]: (r[1], r[2]) for r in
                pt.read().groupBy("o_orderstatus")
                .agg(F.count(F.lit(1)), F.sum("o_totalprice")).collect()}
        # compare SUMs as exact-integer cents (the same representation
        # the output uses): an absolute float tolerance would fail
        # spuriously once group magnitude grows with SF, while cents of
        # exact-2-decimal prices can never sit on a rounding boundary
        if set(got) != set(want) or any(
                got[k][0] != want[k][0]
                or round(got[k][1] * 100) != round(want[k][1] * 100)
                for k in want):
            raise RuntimeError(
                f"view diverged from recompute: {got} vs {want}")
        out = (mv.read()
               .select("o_orderstatus",
                       F.col("mv_count").cast("bigint").alias("n_rows"),
                       F.round(F.col("mv_sum_o_totalprice") * 100, 0)
                       .cast("bigint").alias("total_cents"))
               .localCheckpoint())
    return out


def q_cdf_feed(spark, sf_dir):
    """Change data feed over a PartitionedTable version trail (Delta
    CDF ``table_changes`` semantics: updates surface as delete+insert
    pairs, each change stamped with the committing version).  Replays
    insert → delete → update on nation, then aggregates the full feed
    from version 0.  Cost tracks churn, not table size: each step is a
    manifest diff reading only touched directories
    (``partitioned.py:617``)."""
    from cs186_query_optimization_project_spark.partitioned import (
        PartitionedTable,
    )

    db = _db(spark, sf_dir)
    with _scratch_base("cdf", sf_dir) as base:
        nat = db.table("nation").select("n_nationkey", "n_name",
                                        "n_regionkey")
        pt = PartitionedTable.create(spark, nat, f"{base}/nation",
                                     "n_regionkey")
        pt.insert(_ldf(spark,
            [(300, "AAA", 0), (301, "BBB", 1)],
            "n_nationkey int, n_name string, n_regionkey int"))
        pt.delete(F.col("n_nationkey").between(5, 9))
        pt.update(F.col("n_regionkey") == 2,
                  {"n_name": F.concat(F.col("n_name"), F.lit("_X"))})
        out = (pt.changes(0)
               .groupBy("_commit_version", "_change_type")
               .agg(F.count(F.lit(1)).alias("n_rows"),
                    F.sum("n_nationkey").cast("bigint").alias("key_sum"))
               .localCheckpoint())
    return out


def q_partition_skipping(spark, sf_dir):
    """Directory-level data skipping (Delta file-stats pruning,
    ``partitioned.py:357``): orders lands in two generations of
    directories per priority (pre/post 1998); a ``read_where`` on
    ``o_orderdate >= 1999-06-01`` must skip every first-generation
    directory WITHOUT opening it.  In-entry contract: the pruned
    read's ``inputFiles`` are disjoint from the v0 directories.
    Result equals a plain filter — skipping is pure I/O."""
    import datetime as _dt
    import os as _os

    from cs186_query_optimization_project_spark.partitioned import (
        PartitionedTable,
    )

    db = _db(spark, sf_dir)
    with _scratch_base("skip", sf_dir) as base:
        orders = db.table("orders").select(
            "o_orderkey", "o_orderpriority", "o_orderdate",
            "o_totalprice")
        cut = F.lit("1998-01-01").cast("timestamp")
        pt = PartitionedTable.create(
            spark, orders.filter(F.col("o_orderdate") < cut),
            f"{base}/orders", "o_orderpriority")
        pt.insert(orders.filter(F.col("o_orderdate") >= cut))
        pruned = pt.read_where("o_orderdate",
                               lo=_dt.datetime(1999, 6, 1))
        v0_dirs = {_os.path.normpath(d)
                   for ds in pt._manifest(0)["parts"].values()
                   for d in ds}
        read_dirs = {
            _os.path.normpath(_os.path.dirname(f.removeprefix("file:")))
            for f in pruned.inputFiles()}
        if not read_dirs or read_dirs & v0_dirs:
            raise RuntimeError(
                f"skipping failed: pruned read opened v0 dirs "
                f"{read_dirs & v0_dirs} (read {len(read_dirs)} dirs)")
        out = (pruned
               .groupBy("o_orderpriority")
               .agg(F.count(F.lit(1)).alias("n_rows"),
                    F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
                    .cast("double").alias("price_sum"))
               .localCheckpoint())
    return out


def q_soft_delete(spark, sf_dir):
    """Deletion-vector-style soft delete (``partitioned.py:465``):
    ``delete_soft('p_size < 10')`` publishes tombstone predicates
    against the CURRENT directories — zero data movement — and rows
    appended AFTERWARDS are untouched even when they match the
    predicate.  In-entry contracts: the soft-delete commit rewrites no
    directory (v1 dir-lists == v0's); two sequential IN-list batches
    COALESCE to one predicate per directory (the high-churn
    right-to-be-forgotten shape: N batches, one read-time filter);
    the second batch supplies CALLER cardinalities (zero extra Spark
    jobs — job-counter pinned) and metadata-only COUNT stays exact
    through all three deletes; the tombstone-debt report is
    metadata-only and accounts for every masked row; and the
    post-delete append's small-size rows survive the read."""
    from cs186_query_optimization_project_spark.partitioned import (
        PartitionedTable,
    )

    db = _db(spark, sf_dir)
    with _scratch_base("sdel", sf_dir) as base:
        part = db.table("part").select("p_partkey", "p_brand", "p_size")
        pt = PartitionedTable.create(spark, part, f"{base}/part",
                                     "p_brand")
        pt.delete_soft("p_size < 10")
        if pt._manifest(1)["parts"] != pt._manifest(0)["parts"]:
            raise RuntimeError("soft delete rewrote data directories")
        # two small IN-list batches (partkeys 1..4 exist at every SF);
        # the brands of the still-VISIBLE doomed rows — a bounded
        # 4-row collect — give the caller-side cardinality the second
        # batch hands to delete_soft
        doomed = {r["p_partkey"]: r["p_brand"] for r in
                  part.filter(F.col("p_partkey").isin(1, 2, 3, 4)
                              & (F.col("p_size") >= 10)).collect()}
        pt.delete_soft("p_partkey IN (1, 2)")
        claim: dict = {}
        for k in (3, 4):
            if k in doomed:
                claim[doomed[k]] = claim.get(doomed[k], 0) + 1
        jobs_before = _job_counter(spark)
        pt.delete_soft("p_partkey IN (3, 4)", masked_counts=claim)
        debt = pt.tombstone_debt()
        if _job_counter(spark) != jobs_before:
            raise RuntimeError("caller-count soft delete or the debt "
                               "report scheduled Spark jobs")
        man = pt._manifest()
        for ds in man["parts"].values():
            for d in ds:
                if man["tombstones"][d] != \
                        ["p_size < 10", "p_partkey IN (1, 2, 3, 4)"]:
                    raise RuntimeError(
                        "IN-list tombstones did not coalesce: "
                        f"{man['tombstones'][d]}")
        visible = pt.read().count()
        if pt.metadata_count() != visible:
            raise RuntimeError("metadata-only COUNT diverged from the "
                               "scan under caller-supplied "
                               "cardinalities")
        masked = sum(r["masked_rows"] for r in debt)
        total = sum(r["rows_total"] for r in debt)
        if total - masked != visible:
            raise RuntimeError("tombstone-debt masked rows do not "
                               "account for the invisible rows")
        pt.insert(_ldf(spark,
            [(920000001, "Brand#11", 5), (920000002, "Brand#22", 3)],
            "p_partkey bigint, p_brand string, p_size int"))
        out = (pt.read()
               .groupBy("p_brand")
               .agg(F.count(F.lit(1)).alias("n_rows"),
                    F.sum("p_size").cast("bigint").alias("size_sum"),
                    F.sum(F.when(F.col("p_size") < 10, 1).otherwise(0))
                    .cast("bigint").alias("n_small"))
               .localCheckpoint())
    return out


def q_schema_evolution(spark, sf_dir):
    """Additive schema evolution (``partitioned.py:399``): an append
    with ``merge_schema=True`` carries a NEW trailing column; old
    directories are never rewritten — reads reconcile them with NULLs
    (Delta ``mergeSchema`` semantics).  In-entry contract: the
    evolving append leaves every pre-existing directory in place
    (prefix-preserved dir-lists)."""
    from cs186_query_optimization_project_spark.partitioned import (
        PartitionedTable,
    )

    db = _db(spark, sf_dir)
    with _scratch_base("sevo", sf_dir) as base:
        sup = db.table("supplier").select("s_suppkey", "s_nationkey",
                                          "s_acctbal")
        pt = PartitionedTable.create(spark, sup, f"{base}/supplier",
                                     "s_nationkey")
        pt.insert(_ldf(spark,
            [(930000001, 0, 10.0, "gold"), (930000002, 1, 20.0, "silver")],
            "s_suppkey bigint, s_nationkey int, s_acctbal double, "
            "s_tier string"),
            merge_schema=True)
        d0 = pt._manifest(0)["parts"]
        d1 = pt._manifest(1)["parts"]
        for key, old in d0.items():
            if d1.get(key, [])[:len(old)] != old:
                raise RuntimeError(
                    f"evolving append rewrote partition {key}")
        out = (pt.read()
               .groupBy("s_tier")
               .agg(F.count(F.lit(1)).alias("n_rows"),
                    F.sum("s_suppkey").cast("bigint").alias("key_sum"))
               .localCheckpoint())
    return out


def q_cdf_stream(spark, sf_dir):
    """Streaming consumption of a PartitionedTable through the
    ``manifest_stream`` Python DataSource
    (``sources/manifest_stream.py``): ``startingVersion=earliest``
    replays the snapshot exactly once, the append commit arrives as its
    own micro-batch, and the drained aggregate equals a batch read of
    the final table (the oracle).  Manifest versions are the offsets —
    batch planning is a driver-side manifest diff; executors read
    directories as Arrow record batches."""
    from cs186_query_optimization_project_spark.partitioned import (
        PartitionedTable,
    )
    from cs186_query_optimization_project_spark.sources.manifest_stream \
        import ManifestStreamDataSource

    spark.dataSource.register(ManifestStreamDataSource)
    db = _db(spark, sf_dir)
    name = "cdf_stream_" + _tag(sf_dir)
    with _scratch_base("cstr", sf_dir) as base:
        nat = db.table("nation").select("n_nationkey", "n_name",
                                        "n_regionkey")
        pt = PartitionedTable.create(spark, nat, f"{base}/nation",
                                     "n_regionkey")
        pt.insert(_ldf(spark,
            [(300, "AAA", 0), (301, "BBB", 1)],
            "n_nationkey int, n_name string, n_regionkey int"))
        stream = (spark.readStream.format("manifest_stream")
                  .option("root", pt.root)
                  .option("startingVersion", "earliest")
                  .load())
        agg = (stream.groupBy("n_regionkey")
               .agg(F.count(F.lit(1)).alias("n_rows"),
                    F.sum("n_nationkey").cast("bigint").alias("key_sum")))
        stream_windows.run_to_memory(agg, name, output_mode="complete",
                                     shuffle_partitions=8)
        # detach from the (name-reused) memory sink before the scratch
        # base is reclaimed, same policy as the DML entries
        out = spark.table(name).localCheckpoint()
    return out


def q_optimizer_cardinality(spark, sf_dir):
    """System-R cardinality audit (the live analog of the reference's
    ``QueryPlanCostsTest`` I/O goldens): plan the flagship 3-table join
    with the DP (``plans/optimizer.py:219–223``), execute each left-deep
    join-step PREFIX, and compare the DP's ``est_rows`` against the
    actual row count.  Contract raises (not asserts — must survive
    ``python -O``): the DP must pick the expected customer → orders →
    lineitem order (pinning the plan the oracle replays), and every
    step's q-error ``max(est/actual, actual/est)`` must stay under 16 —
    FK joins estimated via |R|·|S|/max(V(R,a), V(S,b)) should land near
    1.  Returns one row per join step so the oracle can replay the
    prefix counts in SQL."""
    from cs186_query_optimization_project_spark.plans.optimizer import (
        optimize,
    )

    db = _db(spark, sf_dir)
    q = (db.query("customer")
         .join("orders", "c_custkey", "o_custkey")
         .join("lineitem", "o_orderkey", "l_orderkey"))
    plan = optimize(q)
    order = [plan.base_alias] + [s.alias for s in plan.steps]
    if order != ["customer", "orders", "lineitem"]:
        raise RuntimeError(
            f"DP picked unexpected join order {order}; the audit oracle "
            f"replays customer → orders → lineitem")
    cur = db.table(plan.base_table)
    audited = []
    for i, step in enumerate(plan.steps, start=1):
        cur = cur.join(db.table(step.table),
                       F.col(step.left.column) == F.col(step.right.column))
        actual = cur.count()
        q_err = max(step.est_rows / max(actual, 1),
                    actual / max(step.est_rows, 1))
        if q_err >= 16:
            raise RuntimeError(
                f"join step {i} ({step.alias}): est_rows={step.est_rows} "
                f"vs actual={actual} — q-error {q_err:.1f} >= 16")
        audited.append((i, step.alias, actual, True))
    return _ldf(spark,
        audited, "step int, joined string, actual_rows long, "
                 "qerror_lt_16 boolean")


def q_merge_upsert(spark, sf_dir):
    """MERGE upsert driver row (``Database.merge_rows``): a source that
    UPDATES three existing nations (suffix '~u') and INSERTS two new
    ones, in one declarative copy-on-write pass (left-outer join for the
    updates + anti join for the inserts; no driver-side rows).  The
    oracle replays the same upsert as CASE + UNION ALL."""
    db = _db(spark, sf_dir)
    with _scratch_base("merge", sf_dir) as base:
        db.create_table("nation_merge", db.table("nation"),
                        f"{base}/nation", mode="overwrite")
        updates = (db.table("nation").filter(F.col("n_nationkey") < 3)
                   .select("n_nationkey",
                           F.concat(F.col("n_name"), F.lit("~u"))
                           .alias("n_name"),
                           "n_regionkey"))
        inserts = _ldf(spark,
            [(100, "NATION_100", 0), (101, "NATION_101", 1)],
            schema=db.schema("nation_merge"))
        db.merge_rows("nation_merge", updates.unionByName(inserts),
                      on="n_nationkey")
        # Detach from the /tmp trail (see q_dml_lifecycle).
        out = (db.table("nation_merge")
               .select("n_nationkey", "n_name", "n_regionkey")
               .localCheckpoint())
        db.drop_table("nation_merge")
    return out


def q_funnel(spark, sf_dir):
    """Ordered conversion funnel over the event stream (view → click →
    purchase, each stage strictly after the user's previous-stage
    time): one shuffle total — per-user stage-time arrays + row-local
    min-filter chaining, vs one shuffle PER stage for the textbook
    join-chain the oracle uses."""
    db = _db(spark, sf_dir)
    return windows.funnel(db.table("events"), "user_id", "ts",
                          "event_type", ["view", "click", "purchase"])


def q_cohort_retention(spark, sf_dir):
    """Weekly cohort retention matrix: cohort = ISO week of a user's
    first event; each cell counts distinct cohort users active in the
    offset week.  Both aggregations key on the user, so the activity⋈
    first-seen join reuses the first pass's partitioning."""
    db = _db(spark, sf_dir)
    return windows.cohort_retention(db.table("events"), "user_id", "ts")


def q_incremental_agg(spark, sf_dir):
    """Materialized-aggregate maintenance: the per-(day, event_type)
    rollup is computed as BASE (events before Jan 20) merged with DELTA
    (events since) by re-aggregating the partials — count and
    decimal-sum are mergeable, so the merged result is bit-identical to
    the full recompute the oracle runs.  At 100 TB this is the
    difference between scanning one day's delta and rescanning the
    corpus; the merge itself shuffles only |groups| rows."""
    db = _db(spark, sf_dir)
    ev = db.table("events")
    cutoff = "2024-01-20"

    def partial(df):
        return (df.groupBy(F.to_date("ts").alias("day"), "event_type")
                .agg(F.count(F.lit(1)).alias("__n"),
                     F.sum(F.col("value").cast("decimal(18,4)"))
                     .alias("__sv")))

    base = partial(ev.filter(F.col("ts") < cutoff))
    delta = partial(ev.filter(F.col("ts") >= cutoff))
    return (base.unionByName(delta)
            .groupBy("day", "event_type")
            .agg(F.sum("__n").cast("bigint").alias("n_events"),
                 F.round(F.sum("__sv").cast("double"), 4)
                 .alias("sum_value"))
            .orderBy("day", "event_type"))


def _cosupplier_edges(db):
    """Undirected co-supplier edge set (a < b): suppliers sharing an
    exactly-2-supplier order.  ONE definition shared by triangle_count
    and pagerank — their oracles re-encode the same graph, so the two
    queries must never drift onto different edge sets."""
    pairs = (db.table("lineitem")
             .select("l_orderkey", "l_suppkey").distinct())
    two = (pairs.groupBy("l_orderkey")
           .agg(F.count(F.lit(1)).alias("__n"))
           .filter(F.col("__n") == 2).select("l_orderkey"))
    p2 = pairs.join(two, "l_orderkey", "left_semi")
    return (p2.alias("x").join(
        p2.alias("y"),
        (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
        & (F.col("x.l_suppkey") < F.col("y.l_suppkey")))
        .select(F.col("x.l_suppkey").alias("a"),
                F.col("y.l_suppkey").alias("b")).distinct())


def q_triangle_count(spark, sf_dir):
    """Per-vertex triangle counts on the co-supplier graph (edge = two
    suppliers sharing a 2-supplier order — the full co-occurrence graph
    is complete at this corpus, which would make the demo vacuous).
    Engine orients edges by DEGREE (operators/graphs.py — O(m^1.5)
    wedge bound on power-law graphs); the oracle orients by ID.  The
    per-vertex counts are orientation-invariant, so agreement checks
    the enumeration, not a shared shortcut."""
    from cs186_query_optimization_project_spark.operators import graphs

    db = _db(spark, sf_dir)
    return (graphs.triangle_counts(_cosupplier_edges(db))
            .orderBy("vertex"))


def q_pagerank(spark, sf_dir):
    """3-iteration PageRank on the symmetrized co-supplier graph
    (operators/graphs.py): the iterative-algorithm pattern — per-round
    localCheckpoint keeps lineage O(1), per-vertex contribution sums go
    through DECIMAL so the result is partition-order-independent, which
    is exactly what lets a 3-level unrolled SQL replay agree to full
    precision."""
    from cs186_query_optimization_project_spark.operators import graphs

    db = _db(spark, sf_dir)
    und = _cosupplier_edges(db)
    # symmetrize with explode, not self-union: pagerank() materializes
    # this frame as its first step, and a union would embed the whole
    # co-supplier derivation (lineitem distinct + self-join) twice in
    # that one job — explode emits both directions from one scan
    edges = (und.select(F.explode(F.array(
                 F.struct(F.col("a").alias("src"), F.col("b").alias("dst")),
                 F.struct(F.col("b").alias("src"), F.col("a").alias("dst"))))
             .alias("__e"))
             .select("__e.src", "__e.dst"))
    pr = graphs.pagerank(edges, iterations=3, damping=0.85)
    return (pr.select("v", F.round("rank", 6).alias("rank"))
            .orderBy(F.col("rank").desc(), "v"))


def q_resample_fill(spark, sf_dir):
    """Time-series regularization: hourly per-user value sums with
    every missing hour in each user's span materialized and
    forward-filled (operators/windows.py resample_fill).  The dense
    grid is a row-local sequence+explode per key — a key spanning
    years expands on its own executor, never on the driver."""
    db = _db(spark, sf_dir)
    ev = db.table("events").filter(F.col("user_id") < 20)
    val = F.round(
        F.sum(F.col("value").cast("decimal(18,4)")).cast("double"), 4)
    out = windows.resample_fill(ev, "user_id", "ts", val, "hour")
    return out.select(
        "user_id",
        F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
        "value", "is_gap")


def q_scd2_dimension(spark, sf_dir):
    """Type-2 slowly-changing-dimension merge (operators/scd.py —
    complements MERGE, which overwrites history): bootstrap the
    customer dim as of 2020-01-01, then apply a 2024-06-01 batch that
    (a) migrates every 10th customer's segment (close + new version),
    (b) re-sends every (10k+1)th customer UNCHANGED (no-op: must create
    no version — the idempotence property), and (c) inserts two new
    customers.  One key-shuffle full-outer join of current-vs-batch;
    history rows never enter the join."""
    from cs186_query_optimization_project_spark.operators import scd

    db = _db(spark, sf_dir)
    cust = db.table("customer")
    dim = scd.scd2_init(cust, "c_custkey", ["c_name", "c_mktsegment"],
                        "2020-01-01")
    migrated = (cust.filter(F.col("c_custkey") % 10 == 0)
                .select("c_custkey", "c_name",
                        F.lit("MIGRATED").alias("c_mktsegment")))
    noop = (cust.filter(F.col("c_custkey") % 10 == 1)
            .select("c_custkey", "c_name", "c_mktsegment"))
    fresh = _ldf(spark,
        [(9900001, "Customer#9900001", "FURNITURE"),
         (9900002, "Customer#9900002", "MACHINERY")],
        "c_custkey long, c_name string, c_mktsegment string")
    out = scd.scd2_apply(
        dim, migrated.unionByName(noop).unionByName(fresh),
        "c_custkey", ["c_name", "c_mktsegment"], "2024-06-01")
    return out


def q_txn_snapshot_isolation(spark, sf_dir):
    """Concurrency driver row (SURVEY §2.12, behavioral surface of
    ``TestLockManager.java`` / ``TestDeadlockPrevention.java``): two
    optimistic transactions write the same table.

    - t1 and t2 begin on the same published version; t1 tags rows and
      commits first.
    - Snapshot isolation: t2 must still read the PRE-t1 state after t1's
      commit (asserted — a leak fails the query, hence the driver row).
    - First-committer-wins: t2's commit must raise ConflictException
      (the deadlock-victim analog of the reference's waits-for
      prevention: abort-and-retry instead of block-and-refuse).
    - The retry on a fresh snapshot serializes after t1, so the final
      table equals the serial schedule t1;t2 — which is exactly what the
      oracle replays in SQL."""
    from cs186_query_optimization_project_spark.errors import (
        ConflictException,
    )

    db = _db(spark, sf_dir)
    with _scratch_base("txn", sf_dir) as base:
        db.create_table("nation_txn", db.table("nation"), f"{base}/nation",
                        mode="overwrite")

        t1 = db.begin()
        t2 = db.begin()
        t1.update_rows("nation_txn", F.col("n_regionkey") == 2,
                       {"n_name": F.concat(F.col("n_name"), F.lit("~t1"))})
        t2.delete_rows("nation_txn", F.col("n_nationkey") >= 20)
        t1.commit()
        leaked = (t2.table("nation_txn")
                  .filter(F.col("n_name").endswith("~t1")).count())
        if leaked:
            # explicit raise, not assert: python -O strips asserts and
            # this is the ONLY detection of a snapshot-isolation leak
            # (the final table would still match the serial oracle)
            raise RuntimeError("t2's snapshot saw t1's post-pin commit")
        try:
            t2.commit()
            raise AssertionError(
                "second committer must hit ConflictException")
        except ConflictException:
            pass
        t3 = db.begin()  # the retry: fresh snapshot includes t1's update
        t3.delete_rows("nation_txn", F.col("n_nationkey") >= 20)
        t3.commit()

        # Detach before the with-exit rmtree of the version trail.
        out = (db.table("nation_txn")
               .select("n_nationkey", "n_name", "n_regionkey")
               .localCheckpoint())
        db.drop_table("nation_txn")
    return out


def q_txn_2pl_serial(spark, sf_dir):
    """Blocking-2PL driver row (SURVEY §2.12, the reference's actual
    protocol: ``LockManager.java`` strict table-level 2PL): t1 takes the
    X lock and updates; t2, in a second thread, issues a conflicting
    update and BLOCKS (no ConflictException — the pessimistic contract)
    until t1 commits, then applies on top.  Lock order forces the serial
    schedule t1;t2 whatever the thread timing, which is what the oracle
    replays.  Deadlock prevention (refuse-before-block,
    DeadlockException) is unit-tested in tests/test_concurrency_2pl.py —
    it needs two parked threads, too timing-dependent for a driver row."""
    import threading
    import time

    db = _db(spark, sf_dir)
    with _scratch_base("2pl", sf_dir) as base:
        db.create_table("nation_2pl_q", db.table("nation"),
                        f"{base}/nation", mode="overwrite")

        t1 = db.begin(mode="2pl")
        t1.update_rows("nation_2pl_q", F.col("n_regionkey") == 0,
                       {"n_name": F.concat(F.col("n_name"), F.lit("~a"))})
        state = {"t2_done": False}

        def second_writer():
            t2 = db.begin(mode="2pl")
            t2.update_rows(
                "nation_2pl_q", F.col("n_regionkey") == 0,
                {"n_name": F.concat(F.col("n_name"), F.lit("~b"))})
            t2.commit()
            state["t2_done"] = True

        th = threading.Thread(target=second_writer, daemon=True)
        th.start()
        time.sleep(0.3)
        if state["t2_done"]:  # raise, not assert: must survive python -O
            raise RuntimeError("t2 must block on t1's X lock, not race")
        t1.commit()
        th.join(timeout=60)
        if not state["t2_done"]:
            raise RuntimeError("t2 must complete once t1 releases")

        # Detach before the with-exit rmtree of the version trail.
        out = (db.table("nation_2pl_q")
               .select("n_nationkey", "n_name", "n_regionkey")
               .localCheckpoint())
        db.drop_table("nation_2pl_q")
    return out


def q_distinct(spark, sf_dir):
    return (_db(spark, sf_dir).query("customer")
            .select("c_nationkey", "c_mktsegment").distinct().execute())


def q_orderby_limit(spark, sf_dir):
    return (_db(spark, sf_dir).query("customer")
            .select("c_custkey", "c_acctbal")
            .order_by("c_acctbal", ascending=False)
            .order_by("c_custkey")
            .limit(10).execute())


def q_union(spark, sf_dir):
    db = _db(spark, sf_dir)
    return setops.union_distinct(
        db.table("customer").select(F.col("c_nationkey").alias("nationkey")),
        db.table("supplier").select(F.col("s_nationkey").alias("nationkey")))


def q_intersect(spark, sf_dir):
    db = _db(spark, sf_dir)
    return setops.intersect(
        db.table("customer").select(F.col("c_nationkey").alias("nationkey")),
        db.table("supplier").select(F.col("s_nationkey").alias("nationkey")))


def q_except(spark, sf_dir):
    # customers that placed orders but have non-positive balance
    db = _db(spark, sf_dir)
    return setops.except_distinct(
        db.table("orders").select(F.col("o_custkey").alias("custkey")),
        db.table("customer").filter(F.col("c_acctbal") > 0)
        .select(F.col("c_custkey").alias("custkey")))


def q_except_all(spark, sf_dir):
    """Multiset difference (EXCEPT ALL): per-row COUNTS subtract, not
    just membership — the orders before 1999 minus those from 1997 on
    leaves each (priority, bucket) pair with its pre-1997 multiplicity."""
    db = _db(spark, sf_dir)
    proj = ["o_orderpriority",
            (F.col("o_custkey") % 50).alias("bucket")]
    a = (db.table("orders")
         .filter(F.col("o_orderdate") < "1999-01-01").select(*proj))
    b = (db.table("orders")
         .filter((F.col("o_orderdate") >= "1997-01-01")
                 & (F.col("o_orderdate") < "1999-01-01")).select(*proj))
    return setops.except_all(a, b)


def q_intersect_all(spark, sf_dir):
    """Multiset intersection (INTERSECT ALL): each (priority, bucket)
    pair survives min(count_a, count_b) times — the 1997–1998 overlap
    of two date ranges."""
    db = _db(spark, sf_dir)
    proj = ["o_orderpriority",
            (F.col("o_custkey") % 50).alias("bucket")]
    a = (db.table("orders")
         .filter(F.col("o_orderdate") < "1999-01-01").select(*proj))
    b = (db.table("orders")
         .filter(F.col("o_orderdate") >= "1997-01-01").select(*proj))
    return setops.intersect_all(a, b)


def q_semi_join(spark, sf_dir):
    return (_db(spark, sf_dir).query("customer")
            .join("orders", "c_custkey", "o_custkey", how="semi")
            .select("c_custkey").execute())


def q_anti_join(spark, sf_dir):
    # customers with no order above 350k — the o_totalprice predicate is
    # pushed below the anti join by the builder (right columns don't
    # survive a semi/anti join)
    return (_db(spark, sf_dir).query("customer")
            .join("orders", "c_custkey", "o_custkey", how="anti")
            .where("o_totalprice", GT, 350000.0)
            .select("c_custkey").execute())


def q_left_outer_join(spark, sf_dir):
    db = _db(spark, sf_dir)
    joined = (db.query("customer")
              .join("orders", "c_custkey", "o_custkey", how="left")
              .execute())
    return (joined.groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.count("o_orderkey").alias("n_orders")))


def q_full_outer_join(spark, sf_dir):
    """FULL OUTER equi-join: orders-per-customer joined full-outer with
    a planted dimension that covers only even customer keys plus two
    keys with no orders — both unmatched directions exercised.  At
    scale a full-outer shuffles both sides on the key (no broadcast
    path exists for it by definition)."""
    db = _db(spark, sf_dir)
    per_cust = (db.table("orders").groupBy("o_custkey")
                .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders")))
    dim = (db.table("customer")
           .filter(F.col("c_custkey") % 2 == 0)
           .select("c_custkey", "c_mktsegment")
           .unionByName(_ldf(spark,
               [(9000001, "PHANTOM"), (9000002, "PHANTOM")],
               "c_custkey long, c_mktsegment string")))
    j = per_cust.join(dim, F.col("o_custkey") == F.col("c_custkey"),
                      "full_outer")
    side = (F.when(F.col("o_custkey").isNull(), "dim_only")
            .when(F.col("c_custkey").isNull(), "orders_only")
            .otherwise("both"))
    return (j.groupBy(side.alias("side"),
                      F.coalesce("c_mktsegment", F.lit("?"))
                      .alias("segment"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_keys"),
                 F.coalesce(F.sum("n_orders"), F.lit(0)).cast("bigint")
                 .alias("total_orders"))
            .orderBy("side", "segment"))


def q_cross_join(spark, sf_dir):
    """Explicit CROSS JOIN (the one join with no key): region × region
    ordered pairs with their nation-count product — tiny × tiny, the
    only shape a cross join is ever legitimate at scale."""
    db = _db(spark, sf_dir)
    per_region = (db.table("nation").groupBy("n_regionkey")
                  .agg(F.count(F.lit(1)).cast("bigint").alias("n_nat")))
    r = (db.table("region")
         .join(per_region, F.col("r_regionkey") == F.col("n_regionkey"))
         .select("r_regionkey", "r_name", "n_nat"))
    a = r.select(F.col("r_regionkey").alias("ak"),
                 F.col("r_name").alias("a_name"),
                 F.col("n_nat").alias("a_n"))
    b = r.select(F.col("r_regionkey").alias("bk"),
                 F.col("r_name").alias("b_name"),
                 F.col("n_nat").alias("b_n"))
    return (a.crossJoin(b).filter(F.col("ak") < F.col("bk"))
            .select("a_name", "b_name",
                    (F.col("a_n") * F.col("b_n")).alias("pair_count"))
            .orderBy("a_name", "b_name"))


def q_having(spark, sf_dir):
    return (_db(spark, sf_dir).query("orders")
            .group_by("o_custkey").count()
            .having("countAgg", GTE, 5).execute())


def q_rollup(spark, sf_dir):
    db = _db(spark, sf_dir)
    return (db.table("lineitem")
            .rollup("l_returnflag", "l_linestatus")
            .agg(F.count(F.lit(1)).alias("countAgg")))


def q_cube(spark, sf_dir):
    """CUBE grouping sets (all 4 combinations of the two dims)."""
    db = _db(spark, sf_dir)
    return (db.table("lineitem")
            .cube("l_returnflag", "l_linestatus")
            .agg(F.count(F.lit(1)).alias("countAgg")))


def q_explode_array(spark, sf_dir):
    """Lateral/generator op: posexplode an array column (embedding) into
    (id, position, value) rows — the 1→N row generator the reference has
    no analog for."""
    db = _db(spark, sf_dir)
    return (db.table("embeddings")
            .filter(F.col("vec_id") < 50)
            .select("vec_id", F.posexplode("embedding").alias("pos", "v"))
            .select("vec_id", "pos", F.round(F.col("v").cast("double"), 6)
                    .alias("v")))


def q_scalar_functions(spark, sf_dir):
    db = _db(spark, sf_dir)
    return db.table("orders").select(
        "o_orderkey",
        F.upper(F.col("o_orderpriority")).alias("prio_upper"),
        F.length("o_orderpriority").alias("prio_len"),
        F.substring("o_orderpriority", 1, 1).alias("prio_code"),
        F.concat(F.col("o_orderstatus"), F.lit("-"),
                 F.col("o_orderpriority")).alias("status_prio"),
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        (F.col("o_totalprice") * 0.1).alias("tithe"),
    )


def q_case_expr(spark, sf_dir):
    db = _db(spark, sf_dir)
    bucket = (F.when(F.col("o_totalprice") > 200000, "big")
              .when(F.col("o_totalprice") > 50000, "mid")
              .otherwise("small"))
    return (db.table("orders").select(bucket.alias("bucket"))
            .groupBy("bucket").agg(F.count(F.lit(1)).alias("countAgg")))


def q_json_extract(spark, sf_dir):
    db = _db(spark, sf_dir)
    k = F.regexp_extract("props", r'"k": (\d+)', 1).cast("int")
    return (db.table("events").select(k.alias("k"))
            .groupBy("k").agg(F.count(F.lit(1)).alias("countAgg")))


def q_window_rank(spark, sf_dir):
    db = _db(spark, sf_dir)
    return windows.top_k_per_group(
        db.table("orders"), ["o_custkey"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()], 2,
    ).select("o_custkey", "o_orderkey", "rn")


def q_window_running(spark, sf_dir):
    db = _db(spark, sf_dir)
    out = windows.running_aggregate(
        db.table("orders"), ["o_custkey"],
        [F.col("o_orderdate").asc(), F.col("o_orderkey").asc()],
        {"running_n": F.count(F.lit(1)),
         "running_spend": F.sum(F.col("o_totalprice")
                                .cast("decimal(18,4)"))})
    return out.select("o_custkey", "o_orderkey", "running_n",
                      F.col("running_spend").cast("double")
                      .alias("running_spend"))


def q_sessionize(spark, sf_dir):
    db = _db(spark, sf_dir)
    s = windows.sessionize(db.table("events"), "user_id", "ts",
                           gap_minutes=30.0, tiebreak="event_id")
    return (s.groupBy("user_id", "session_idx")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select("user_id", F.col("session_idx").cast("long")
                    .alias("session_idx"), "n_events"))


def q_time_window_agg(spark, sf_dir):
    db = _db(spark, sf_dir)
    hour = F.date_format(F.date_trunc("hour", F.col("ts")),
                         "yyyy-MM-dd HH:mm:ss")
    return (db.table("events")
            .groupBy(hour.alias("window_start"), F.col("event_type"))
            .agg(F.count(F.lit(1)).alias("countAgg"),
                 F.sum(F.col("value").cast("decimal(18,4)")).cast("double")
                 .alias("sum_value")))


def q_streaming_tumbling(spark, sf_dir):
    """REAL Structured Streaming: file-stream the events parquet, run a
    watermarked tumbling-window aggregation to completion (memory sink),
    return the result table.  Oracle = batch date_trunc equivalent."""
    name = "stream_tumble_" + _tag(sf_dir)
    events = stream_windows.stream_events(spark, f"{sf_dir}/events.parquet")
    agg = stream_windows.tumbling_counts(events, window="1 hour",
                                         watermark="2 hours")
    stream_windows.run_to_memory(agg, name, output_mode="complete",
                                 shuffle_partitions=8)
    return (spark.table(name)
            .select(F.date_format("window_start", "yyyy-MM-dd HH:mm:ss")
                    .alias("window_start"),
                    "event_type", "n"))


def q_streaming_session(spark, sf_dir):
    """REAL streaming session windows (gap 30 min) per user; memory sink.
    Oracle = batch lag/cumsum sessionization with an end-EXCLUSIVE break
    (gap >= 1800s starts a new session), matching Spark session_window's
    [start, last+gap) interval semantics."""
    name = "stream_sess_" + _tag(sf_dir)
    events = stream_windows.stream_events(spark, f"{sf_dir}/events.parquet")
    agg = stream_windows.session_counts(events, gap="30 minutes",
                                        watermark="2 hours")
    stream_windows.run_to_memory(agg, name, output_mode="complete",
                                 shuffle_partitions=8)
    return (spark.table(name)
            .select("user_id",
                    F.date_format("session_start",
                                  "yyyy-MM-dd HH:mm:ss.SSSSSS")
                    .alias("session_start"),
                    "n_events"))


def q_streaming_sliding(spark, sf_dir):
    """Sliding windows (1 h window, 15 min slide) over the event stream.
    Oracle: each event belongs to exactly 4 windows → cross join with the
    4 slide offsets."""
    name = "stream_slide_" + _tag(sf_dir)
    events = stream_windows.stream_events(spark, f"{sf_dir}/events.parquet")
    agg = stream_windows.sliding_counts(events, window="1 hour",
                                        slide="15 minutes",
                                        watermark="2 hours")
    stream_windows.run_to_memory(agg, name, output_mode="complete",
                                 shuffle_partitions=8)
    return (spark.table(name)
            .select(F.date_format("window_start", "yyyy-MM-dd HH:mm:ss")
                    .alias("window_start"), "event_type", "n"))


def q_streaming_stateful_totals(spark, sf_dir):
    """Arbitrary stateful streaming (applyInPandasWithState): per-user
    running totals.  The final state after the last micro-batch equals the
    batch aggregate — that's the oracle."""
    from cs186_query_optimization_project_spark.streaming import stateful

    name = "stream_state_" + _tag(sf_dir)
    events = stream_windows.stream_events(spark, f"{sf_dir}/events.parquet")
    totals = stateful.user_running_totals(events)
    stream_windows.run_to_memory(totals, name, output_mode="update",
                                 shuffle_partitions=8)
    # update mode emits one row per user per micro-batch; keep the final
    # (largest n_events) row per user
    latest = (spark.table(name)
              .groupBy("user_id")
              .agg(F.max_by("total_value", "n_events").alias("total_value"),
                   F.max("n_events").alias("n_events")))
    return latest.select("user_id", "n_events",
                         F.round("total_value", 4).alias("total_value"))


def q_streaming_dedup(spark, sf_dir):
    """Streaming exact dedup within the watermark horizon: duplicate every
    event (explode ×2), dropDuplicatesWithinWatermark restores one row per
    event_id.  Oracle: plain per-type counts."""
    name = "stream_dedup_" + _tag(sf_dir)
    events = stream_windows.stream_events(spark, f"{sf_dir}/events.parquet")
    doubled = (events
               .withColumn("__copy", F.explode(F.array(F.lit(0), F.lit(1))))
               .drop("__copy"))
    deduped = stream_windows.streaming_dedup(doubled, watermark="2 hours")
    agg = deduped.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    stream_windows.run_to_memory(agg, name, output_mode="complete",
                                 shuffle_partitions=8)
    return spark.table(name)


def q_streaming_interval_join(spark, sf_dir):
    """REAL stream-stream interval self-join (click → purchase within
    30 min per user), append mode; watermarks on both sides bound the
    join state.  Oracle = the equivalent batch interval join."""
    name = "stream_ivj_" + _tag(sf_dir)
    events = stream_windows.stream_events(spark, f"{sf_dir}/events.parquet")
    joined = stream_windows.click_purchase_join(events)
    stream_windows.run_to_memory(joined, name, output_mode="append",
                                 shuffle_partitions=8)
    return spark.table(name)


def q_table_histogram(spark, sf_dir):
    """Equi-width histogram as a fully-distributed query (the
    DataFrame twin of plans/stats.py's TableStats histograms, §4.1):
    min/max are a 1-row broadcast, bucket assignment is row-local
    floor arithmetic, counts partial-aggregate map-side.  Unlike
    TableStats.collect (driver dataclass for the optimizer), nothing
    but the 10 output rows ever reaches the driver."""
    db = _db(spark, sf_dir)
    li = db.table("lineitem").select("l_quantity")
    mm = li.agg(F.min("l_quantity").cast("double").alias("__lo"),
                F.max("l_quantity").cast("double").alias("__hi"))
    width = (F.col("__hi") - F.col("__lo")) / 10
    bucket = F.least(
        F.floor((F.col("l_quantity") - F.col("__lo")) / width)
        .cast("int") + 1, F.lit(10))
    return (li.crossJoin(F.broadcast(mm))
            .groupBy(bucket.alias("bucket"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"),
                 F.first("__lo").alias("__l"), F.first("__hi").alias("__h"))
            .select("bucket",
                    F.round(F.col("__l") + (F.col("bucket") - 1)
                            * (F.col("__h") - F.col("__l")) / 10, 4)
                    .alias("bucket_lo"),
                    F.round(F.col("__l") + F.col("bucket")
                            * (F.col("__h") - F.col("__l")) / 10, 4)
                    .alias("bucket_hi"), "n")
            .orderBy("bucket"))


def q_frequent_pairs(spark, sf_dir):
    """Market-basket co-occurrence (the A-priori first step): part
    pairs bought together in >= 2 orders.  Per-order pair generation
    is bounded by lines-per-order (≤7 → ≤21 pairs), never all-pairs
    over the catalog; the pair count shuffles on the (a, b) key with
    map-side combine.  Top-100 with a full tie-break."""
    db = _db(spark, sf_dir)
    op = (db.table("lineitem")
          .select("l_orderkey", "l_partkey").distinct())
    pairs = (op.alias("x").join(
        op.alias("y"),
        (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
        & (F.col("x.l_partkey") < F.col("y.l_partkey")))
        .select(F.col("x.l_partkey").alias("a"),
                F.col("y.l_partkey").alias("b")))
    return (pairs.groupBy("a", "b")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
            .filter(F.col("n_orders") >= 2)
            .orderBy(F.col("n_orders").desc(), "a", "b")
            .limit(100))


def q_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS ((status, priority), (status), ()) over
    orders — the general form cube/rollup specialize; grouping_id
    disambiguates the NULL markers.  One pass (Spark expands the sets
    into a single Expand + aggregate, not one scan per set)."""
    db = _db(spark, sf_dir)
    return (db.table("orders")
            .groupingSets([["o_orderstatus", "o_orderpriority"],
                           ["o_orderstatus"], []],
                          "o_orderstatus", "o_orderpriority")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"),
                 F.grouping_id().cast("bigint").alias("gid"))
            .orderBy("gid", "o_orderstatus", "o_orderpriority"))


def q_constraint_check(spark, sf_dir):
    """Data-quality gate (operators/constraints.py): not-null, unique
    key, and referential integrity over orders→customer, with three
    violation rows PLANTED (the corpus itself is clean): a duplicated
    order key pointing at a nonexistent customer (×2) and a null-
    priority row.  Expected report: not_null=1, unique=1, fk=2."""
    from cs186_query_optimization_project_spark.operators import (
        constraints,
    )

    db = _db(spark, sf_dir)
    orders = db.table("orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority")
    planted = _ldf(spark,
        [(9000001, -5, "5-LOW"), (9000001, -5, "5-LOW"),
         (9000002, None, None)],
        "o_orderkey long, o_custkey long, o_orderpriority string")
    o2 = orders.unionByName(planted)
    return constraints.constraint_report([
        constraints.check_not_null(o2, "o_orderpriority"),
        constraints.check_unique(o2, ["o_orderkey"]),
        constraints.check_foreign_key(
            o2, "o_custkey", db.table("customer"), "c_custkey"),
    ])


def _publish_sentinel_dir(build: str, base: str, done: str) -> None:
    """Atomically publish a fully-assembled sentinel source dir.

    The readiness re-check and the clear+rename run under an exclusive
    ``flock`` on a sidecar lock file, making check-and-publish one
    atomic step across processes: a concurrent builder that published a
    READY dir between our initial readiness check and this call keeps
    its dir untouched (ours is discarded), and only a base still
    missing its _READY marker — a crashed builder's residue — is
    cleared and replaced.  Without the lock, two losers of the first
    rename could each pass the ``done`` check before the other's
    publish landed and rmtree a just-published ready dir (TOCTOU).
    Every publisher goes through this helper, so the advisory lock is
    sufficient; waiters only poll ``done`` and never take the lock."""
    import fcntl
    import os
    import shutil

    with open(base + ".lock", "w") as lf:
        fcntl.flock(lf, fcntl.LOCK_EX)
        try:
            if os.path.exists(done):
                # a concurrent builder published first; keep theirs
                shutil.rmtree(build, ignore_errors=True)
            else:
                shutil.rmtree(base, ignore_errors=True)
                os.rename(build, base)
        finally:
            fcntl.flock(lf, fcntl.LOCK_UN)


def q_streaming_outer_join(spark, sf_dir):
    """REAL stream-stream LEFT OUTER interval join: every click, with
    its purchase when one follows within 30 min, else nulls.  Outer
    rows only emit when the watermark PROVES no match can arrive, so a
    finite drain would silently drop trailing unmatched clicks; the
    source dir therefore carries a far-future sentinel click+purchase
    (user_id −1, max(ts)+10 days — the EOF-flush idiom) that pushes the
    final watermark past every real click's match window.  Oracle = the
    equivalent batch left join over the real events."""
    import datetime as dt
    import os
    import shutil

    db = _db(spark, sf_dir)
    parent = _ensure_private_dir(
        f"/tmp/spark_graft_outer_{os.getuid()}")
    src = f"{sf_dir}/events.parquet"
    # source-dir build is keyed by the source file's identity so reruns
    # (bench does 3) reuse it; a regenerated corpus mints a new dir
    mtime = os.stat(src).st_mtime_ns
    base = os.path.join(parent, f"{_tag(sf_dir)}_{mtime}")
    done = os.path.join(base, "_READY")
    if not os.path.exists(done):
        # cross-process race guard: a builder assembles the dir under a
        # per-pid scratch name, writes _READY inside it, and atomically
        # renames it into place; a concurrent run (bench + contract
        # check on the same sf_dir) waits for _READY instead of
        # rmtree-ing files a running stream may be reading
        build = base + f".build_{os.getpid()}"
        os.makedirs(build, mode=0o700, exist_ok=True)
        try:
            os.link(src, os.path.join(build, "events.parquet"))
        except OSError:
            shutil.copy(src, os.path.join(build, "events.parquet"))
        ev = db.table("events")
        far = (ev.agg(F.max("ts")).collect()[0][0]
               + dt.timedelta(days=10))
        sentinel = _ldf(spark,
            [(1_000_000_000, far, -1, "click", 0.0, None),
             (1_000_000_001, far, -1, "purchase", 0.0, None)],
            schema=ev.schema)
        sentinel.coalesce(1).write.mode("append").parquet(build)
        with open(os.path.join(build, "_READY"), "w"):
            pass
        _publish_sentinel_dir(build, base, done)
        import time as _time
        for _ in range(600):
            if os.path.exists(done):
                break
            _time.sleep(0.1)
        else:
            raise RuntimeError(
                f"sentinel source dir never became ready: {base}")

    name = "stream_outer_" + _tag(sf_dir)
    events = stream_windows.stream_events(spark, base)
    joined = stream_windows.click_purchase_join(events, how="left_outer")
    stream_windows.run_to_memory(joined, name, output_mode="append",
                                 shuffle_partitions=8)
    return (spark.table(name).filter(F.col("user_id") >= 0)
            .select("user_id", "click_id", "purchase_id"))


def q_asof_join(spark, sf_dir):
    """Backward as-of join (absent from both the reference and Spark's
    built-ins): attribute every click to the user's most recent purchase
    at-or-before it.  One shuffle+sort via the union+window shape —
    DuckDB's native ASOF JOIN is the oracle."""
    from cs186_query_optimization_project_spark.operators import joins

    db = _db(spark, sf_dir)
    ev = db.table("events")
    clicks = (ev.filter(F.col("event_type") == "click")
              .select("user_id", "event_id", "ts"))
    purchases = (ev.filter(F.col("event_type") == "purchase")
                 .groupBy("user_id", "ts")
                 .agg(F.max("value").alias("purchase_value")))
    out = joins.asof_join(clicks, purchases, on="user_id")
    return out.select("user_id", "event_id",
                      F.round("purchase_value", 4).alias("purchase_value"))


def q_range_join(spark, sf_dir):
    """Interval-containment join via the bin-bucketed equi-join path
    (price bands × orders), then per-band counts."""
    from cs186_query_optimization_project_spark.operators import joins

    db = _db(spark, sf_dir)
    bands = _ldf(spark,
        [(0.0, 50_000.0, "small"), (50_000.0, 200_000.0, "mid"),
         (200_000.0, 1_000_000.0, "big")], ["lo", "hi", "price_band"])
    joined = joins.range_join(
        db.table("orders").select("o_orderkey", "o_totalprice"),
        bands, "o_totalprice", "lo", "hi", bin_size=50_000.0)
    return (joined.groupBy("price_band")
            .agg(F.count(F.lit(1)).alias("countAgg")))


def q_tpch_q10(spark, sf_dir):
    """Q10 returned-item reporting (TPC-H 2.4.10), adapted to the
    testdata customer columns (no address/phone/comment): revenue lost
    to returned items per customer in a quarter, top 20.  Plan shape is
    Q10's — date-windowed orders⋈lineitem with the returnflag filter
    pushed to the scan, nation broadcast at the end."""
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    out = (_db(spark, sf_dir).query("customer")
           .join("orders", "c_custkey", "o_custkey")
           .join("lineitem", "o_orderkey", "l_orderkey")
           .join("nation", "c_nationkey", "n_nationkey")
           .where("o_orderdate", GTE, "1996-10-01")
           .where("o_orderdate", LT, "1997-01-01")
           .where("l_returnflag", EQ, "R")
           .group_by("c_custkey", "c_name", "c_acctbal", "n_name")
           .sum(revenue, out="revenue", exact=True)
           .execute())
    return (out.select("c_custkey", "c_name",
                       F.round(F.col("revenue").cast("double"), 4)
                       .alias("revenue"),
                       F.round("c_acctbal", 2).alias("c_acctbal"),
                       "n_name")
            .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
            .limit(20))


def q_tpch_q7(spark, sf_dir):
    """Q7 volume shipping between two nations (TPC-H 2.4.7): supplier
    nation vs customer nation needs the nation dimension joined TWICE;
    the standard pair disjunction ((A,B) or (B,A)) is expressed as
    both-in-the-two-nation-universe AND supp ≠ cust — identical
    semantics, no OR needed.

    Scale-safe filter placement: the two nation names are resolved to
    keys up front (one bounded lookup on the 25-row dimension), so the
    nation restriction becomes a literal ``IN (k1, k2)`` on
    ``s_nationkey``/``c_nationkey`` that reaches the supplier and
    customer parquet scans as a pushed filter (asserted in
    tests/test_builder.py) — each fact-join input shrinks ~12.5×
    BEFORE any shuffle, instead of discarding ~(2/25)² of the 4-table
    join output afterwards.  The 2-row nation slices broadcast for the
    name lookup."""
    db = _db(spark, sf_dir)
    two = ["NATION_1", "NATION_2"]
    two_nations = (db.table("nation")
                   .filter(F.col("n_name").isin(two))
                   .select("n_nationkey", "n_name"))
    keys = sorted(r["n_nationkey"] for r in two_nations.collect())
    sup = (db.table("supplier")
           .filter(F.col("s_nationkey").isin(keys))
           .select("s_suppkey", "s_nationkey"))
    cus = (db.table("customer")
           .filter(F.col("c_nationkey").isin(keys))
           .select("c_custkey", "c_nationkey"))
    li = (db.table("lineitem")
          .filter((F.col("l_shipdate") >= "1995-01-01")
                  & (F.col("l_shipdate") <= "1996-12-31"))
          .select("l_suppkey", "l_orderkey", "l_extendedprice",
                  "l_discount", "l_shipdate"))
    orders = db.table("orders").select("o_orderkey", "o_custkey")
    sup_n = two_nations.select(
        F.col("n_nationkey").alias("sk2"),
        F.col("n_name").alias("supp_nation"))
    cus_n = two_nations.select(
        F.col("n_nationkey").alias("ck2"),
        F.col("n_name").alias("cust_nation"))
    return (sup.join(li, sup.s_suppkey == li.l_suppkey)
            .join(orders, F.col("l_orderkey") == orders.o_orderkey)
            .join(cus, F.col("o_custkey") == cus.c_custkey)
            .join(F.broadcast(sup_n), F.col("s_nationkey") == F.col("sk2"))
            .join(F.broadcast(cus_n), F.col("c_nationkey") == F.col("ck2"))
            .filter(F.col("supp_nation") != F.col("cust_nation"))
            .groupBy("supp_nation", "cust_nation",
                     F.year("l_shipdate").alias("l_year"))
            .agg(F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount")))
                       .cast("decimal(18,4)")).alias("rev"))
            .select("supp_nation", "cust_nation", "l_year",
                    F.round(F.col("rev").cast("double"), 4)
                    .alias("revenue"))
            .orderBy("supp_nation", "cust_nation", "l_year"))


def q_salted_join(spark, sf_dir):
    """Explicit hot-key salting (for paths AQE skew-splitting can't touch);
    result must equal the unsalted join."""
    from cs186_query_optimization_project_spark.operators import joins

    db = _db(spark, sf_dir)
    joined = joins.salted_join(
        db.table("lineitem"),
        db.table("supplier").withColumnRenamed("s_suppkey", "l_suppkey"),
        on="l_suppkey", n_salts=8)
    return (joined.groupBy("s_nationkey")
            .agg(F.count(F.lit(1)).alias("countAgg"),
                 F.sum(F.col("l_extendedprice").cast("decimal(18,4)"))
                 .cast("double").alias("revenue")))


def q_quantiles(spark, sf_dir):
    """Exact interpolated percentiles per group (Spark ``percentile`` ==
    DuckDB ``quantile_cont`` by definition).

    Scale note: exact percentile buffers every value per group — correct
    by contract here (the oracle demands exact), but the 100 TB path is
    ``q_quantiles_approx`` (GK-sketch ``approx_percentile``, bounded
    memory, mergeable partials)."""
    db = _db(spark, sf_dir)
    # one percentile(array(...)) aggregate: two separate percentile
    # calls each buffer + sort the full per-group value list; the
    # array form shares ONE buffer and one sort, with the identical
    # interpolation per requested fraction
    return (db.table("lineitem")
            .groupBy("l_returnflag")
            .agg(F.expr("percentile(l_extendedprice, array(0.5D, 0.9D))")
                 .alias("__p"))
            .select("l_returnflag",
                    F.round(F.element_at("__p", 1), 4)
                    .alias("median_price"),
                    F.round(F.element_at("__p", 2), 4)
                    .alias("p90_price")))


def q_preference_pairs(spark, sf_dir):
    """Preference-PAIR mining (``sampling.preference_pairs`` — the
    DPO/RLHF data-assembly step): the corpus scores through the
    frozen quality classifier, then per source domain the
    highest-scored document pairs against the lowest-scored, kept
    when the margin clears 0.05.  Deterministic argmax/argmin
    tie-breaks (chosen: largest id at the top score; rejected:
    smallest id at the bottom) make the pairing exactly
    SQL-replayable.  ONE aggregation (max_by/min_by over a struct
    ordering) with map-side partials — the shuffle carries at most
    one candidate per (partition, group), never the corpus; no
    Window anywhere (plan-pinned in tests)."""
    db = _db(spark, sf_dir)
    docs = db.table("documents")
    scored = (text.classifier_quality(docs)
              .join(docs.select("doc_id", "source"), "doc_id"))
    return sampling.preference_pairs(scored, "source", "doc_id",
                                     "clf_score", min_margin=0.05)


def q_quantiles_approx(spark, sf_dir):
    """Scale path for percentiles: ``approx_percentile`` is a
    Greenwald–Khanna sketch — per-group memory is O(accuracy), partials
    merge map-side, nothing buffers the full value list.  accuracy=10000
    bounds rank error at 1/10000 of the group.

    The sketch's exact answer is implementation-defined, so the checkable
    contract is the RANK GUARANTEE itself: the returned value's rank
    interval [#values < v, #values ≤ v] must overlap the target quantile
    ± the accuracy bound (2/10000 here, 2× slack against boundary
    arithmetic).  The query emits that check per group as booleans and
    the oracle asserts them all true — a sketch regression (or a broken
    merge) flips a row to false and hash-mismatches."""
    eps = 2.0 / 10000
    db = _db(spark, sf_dir)
    li = db.table("lineitem").select("l_returnflag", "l_extendedprice")
    approx = (li.groupBy("l_returnflag")
              .agg(F.expr("approx_percentile(l_extendedprice, 0.5, 10000)")
                   .alias("m50"),
                   F.expr("approx_percentile(l_extendedprice, 0.9, 10000)")
                   .alias("m90")))
    # one broadcast join + one aggregation computes both rank intervals
    j = li.join(F.broadcast(approx), "l_returnflag")
    ranks = (j.groupBy("l_returnflag")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.sum(F.when(F.col("l_extendedprice")
                               < F.col("m50"), 1).otherwise(0)).alias("lt50"),
                  F.sum(F.when(F.col("l_extendedprice")
                               <= F.col("m50"), 1).otherwise(0)).alias("le50"),
                  F.sum(F.when(F.col("l_extendedprice")
                               < F.col("m90"), 1).otherwise(0)).alias("lt90"),
                  F.sum(F.when(F.col("l_extendedprice")
                               <= F.col("m90"), 1).otherwise(0)).alias("le90")))
    return ranks.select(
        "l_returnflag",
        ((F.col("lt50") / F.col("n") <= 0.5 + eps)
         & (F.col("le50") / F.col("n") >= 0.5 - eps))
        .alias("median_rank_ok"),
        ((F.col("lt90") / F.col("n") <= 0.9 + eps)
         & (F.col("le90") / F.col("n") >= 0.9 - eps))
        .alias("p90_rank_ok"))


_BUCKETED_READY: set[str] = set()


def q_bucketed_join(spark, sf_dir):
    """Co-located join on pre-bucketed tables: both sides bucketed by the
    join key at write time, so the join needs NO shuffle (verified in
    tests via plan inspection) — the 100 TB answer to repeated fact-fact
    joins on the same key.  Result equals the plain join (the oracle)."""
    from cs186_query_optimization_project_spark.sources import writers

    db = _db(spark, sf_dir)
    tag = _tag(sf_dir)
    lt, ot = f"bl_lineitem_{tag}", f"bl_orders_{tag}"
    if sf_dir not in _BUCKETED_READY:
        writers.write_bucketed(db.table("lineitem")
                               .select("l_orderkey", "l_extendedprice"),
                               lt, ("l_orderkey",), num_buckets=8)
        writers.write_bucketed(db.table("orders")
                               .select("o_orderkey", "o_orderpriority"),
                               ot, ("o_orderkey",), num_buckets=8)
        _BUCKETED_READY.add(sf_dir)
    li, orders = spark.table(lt), spark.table(ot)
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("countAgg"),
                 F.sum(F.col("l_extendedprice").cast("decimal(18,4)"))
                 .cast("double").alias("revenue")))


def q_pivot(spark, sf_dir):
    """Pivot (group rows, spread a categorical column into columns).  The
    value list is pinned ('O','F') so the output schema is deterministic."""
    db = _db(spark, sf_dir)
    # Both sides pin the count dtype to 64-bit int: DuckDB's SUM(CASE…)
    # natively yields HUGEINT, which serializes to a different pandas
    # dtype than Spark's BIGINT and trips dtype-sensitive value hashing.
    return windows.pivot_table(
        db.table("lineitem"), "l_returnflag", "l_linestatus", ["O", "F"],
        F.count(F.lit(1))).select(
            "l_returnflag",
            F.coalesce("O", F.lit(0)).cast("long").alias("n_open"),
            F.coalesce("F", F.lit(0)).cast("long").alias("n_filled"))


# ===================================================================== #
# TPC-H-style queries through the builder (optimizer workout: Q5 is a
# six-table join the System-R DP must order)
# ===================================================================== #
def q_tpch_q1(spark, sf_dir):
    """Q1 pricing summary: multi-column group-by + mixed plain/expression
    aggregates over filtered lineitem."""
    disc_price = (F.col("l_extendedprice") * (1 - F.col("l_discount")))
    # sum(charge) = sum(disc_price*(1+tax)) is omitted: Spark and DuckDB
    # round the double product to DECIMAL(18,4) with different tie-break
    # modes, drifting ~4e-3 per 140k rows — not a semantic difference.
    return (_db(spark, sf_dir).query("lineitem")
            .where("l_shipdate", LT, "1998-09-01")
            .group_by("l_returnflag", "l_linestatus")
            .sum("l_quantity", out="sum_qty", exact=True)
            .sum("l_extendedprice", out="sum_base_price", exact=True)
            .sum(disc_price, out="sum_disc_price", exact=True)
            .average("l_quantity", out="avg_qty", exact=True)
            .count(out="count_order")
            .execute())


def q_tpch_q3(spark, sf_dir):
    """Q3 shipping priority: 3-way join, expression revenue, top-10."""
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    out = (_db(spark, sf_dir).query("customer")
           .join("orders", "c_custkey", "o_custkey")
           .join("lineitem", "o_orderkey", "l_orderkey")
           .where("c_mktsegment", EQ, "BUILDING")
           .where("o_orderdate", LT, "1998-03-15")
           .where("l_shipdate", GT, "1998-03-15")
           .group_by("l_orderkey", "o_orderdate")
           .sum(revenue, out="revenue", exact=True)
           .execute())
    return (out.select("l_orderkey",
                       F.date_format("o_orderdate", "yyyy-MM-dd")
                       .alias("o_orderdate"),
                       F.round("revenue", 4).alias("revenue"))
            .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
            .limit(10))


def q_tpch_q5(spark, sf_dir):
    """Q5 local supplier volume: SIX-table join ordered by the System-R
    DP (execute_optimal), plus the c_nationkey = s_nationkey correlation
    via where_columns."""
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    out = (_db(spark, sf_dir).query("customer")
           .join("orders", "c_custkey", "o_custkey")
           .join("lineitem", "o_orderkey", "l_orderkey")
           .join("supplier", "l_suppkey", "s_suppkey")
           .join("nation", "s_nationkey", "n_nationkey")
           .join("region", "n_regionkey", "r_regionkey")
           .where("r_name", EQ, "ASIA")
           .where("o_orderdate", GTE, "1996-01-01")
           .where_columns("c_nationkey", "=", "s_nationkey")
           .group_by("n_name")
           .sum(revenue, out="revenue", exact=True)
           .execute_optimal())
    return out.select("n_name", F.round("revenue", 4).alias("revenue"))


def q_tpch_q6(spark, sf_dir):
    """Q6 forecasting revenue change: tight filter + expression sum."""
    revenue = F.col("l_extendedprice") * F.col("l_discount")
    out = (_db(spark, sf_dir).query("lineitem")
           .where("l_shipdate", GTE, "1997-01-01")
           .where("l_shipdate", LT, "1998-01-01")
           .where("l_discount", GTE, 0.05)
           .where("l_discount", LTE, 0.07)
           .where("l_quantity", LT, 24.0)
           .sum(revenue, out="revenue", exact=True)
           .execute())
    return out.select(F.round("revenue", 4).alias("revenue"))


def q_tpch_q4(spark, sf_dir):
    """Q4 order-priority checking, adapted: the testdata schema has no
    l_commitdate/l_receiptdate, so the EXISTS predicate becomes "some
    line item with l_quantity > 45" — the plan shape is Q4's (TPC-H
    2.4.4): date-windowed orders SEMI-join lineitem with the subquery
    predicate pushed to the semi side, then count per priority."""
    return (_db(spark, sf_dir).query("orders")
            .join("lineitem", "o_orderkey", "l_orderkey", how="semi")
            .where("o_orderdate", GTE, "1996-07-01")
            .where("o_orderdate", LT, "1996-10-01")
            .where("l_quantity", GT, 45.0)
            .group_by("o_orderpriority")
            .count(out="order_count")
            .execute())


def q_tpch_q14(spark, sf_dir):
    """Q14 promotion effect: conditional aggregation — the CASE lives
    inside the SUM, one pass over the join, no self-join."""
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", revenue).otherwise(0.0)
    out = (_db(spark, sf_dir).query("lineitem")
           .join("part", "l_partkey", "p_partkey")
           .where("l_shipdate", GTE, "1997-09-01")
           .where("l_shipdate", LT, "1997-10-01")
           .sum(promo, out="promo_rev", exact=True)
           .sum(revenue, out="total_rev", exact=True)
           .execute())
    return out.select(
        F.round(100 * F.col("promo_rev").cast("double")
                / F.col("total_rev").cast("double"), 4)
        .alias("promo_revenue_pct"))


def q_tpch_q18(spark, sf_dir):
    """Q18 large-volume customers: HAVING over a grouped sum feeding a
    two-dimension join — the aggregate runs first (one shuffle on
    l_orderkey), and only the handful of qualifying orders join out to
    orders/customer (both broadcast-size relative to lineitem)."""
    db = _db(spark, sf_dir)
    big = (db.query("lineitem")
           .group_by("l_orderkey")
           .sum("l_quantity", out="sum_qty", exact=True)
           .having("sum_qty", GT, 300)
           .execute())
    return (big.join(db.table("orders"),
                     big["l_orderkey"] == F.col("o_orderkey"))
            .join(db.table("customer"),
                  F.col("o_custkey") == F.col("c_custkey"))
            .select("c_name", "c_custkey", "o_orderkey",
                    F.date_format("o_orderdate", "yyyy-MM-dd")
                    .alias("o_orderdate"),
                    "o_totalprice",
                    F.col("sum_qty").cast("double").alias("sum_qty"))
            .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
            .limit(100))


def q_tpch_q8(spark, sf_dir):
    """Q8 national market share (TPC-H 2.4.8, adapted: p_type filter in
    place of the reference's three-level type string): of AMERICA-region
    customers' spend on STANDARD parts in 1996–1997, what fraction was
    supplied by NATION_3, per year.  7-table join with nation joined
    twice; the conditional share lives in the aggregate — one pass, no
    self-join.  The nation/region dims broadcast; the p_type and
    o_orderdate filters push to their scans, shrinking both fact-join
    inputs before any shuffle (part ~6×, orders ~3.5×)."""
    db = _db(spark, sf_dir)
    part = (db.table("part").filter(F.col("p_type") == "STANDARD")
            .select("p_partkey"))
    li = db.table("lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey",
        "l_extendedprice", "l_discount")
    orders = (db.table("orders")
              .filter((F.col("o_orderdate") >= "1996-01-01")
                      & (F.col("o_orderdate") <= "1997-12-31"))
              .select("o_orderkey", "o_custkey", "o_orderdate"))
    cust = db.table("customer").select("c_custkey", "c_nationkey")
    n1 = db.table("nation").select(
        F.col("n_nationkey").alias("cn_key"), "n_regionkey")
    region = (db.table("region").filter(F.col("r_name") == "AMERICA")
              .select("r_regionkey"))
    sup = db.table("supplier").select("s_suppkey", "s_nationkey")
    n2 = db.table("nation").select(
        F.col("n_nationkey").alias("sn_key"),
        F.col("n_name").alias("supp_nation"))
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nation3 = F.when(F.col("supp_nation") == "NATION_3",
                     revenue).otherwise(0.0)
    joined = (li.join(part, F.col("l_partkey") == F.col("p_partkey"))
              .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
              .join(cust, F.col("o_custkey") == F.col("c_custkey"))
              .join(F.broadcast(n1),
                    F.col("c_nationkey") == F.col("cn_key"))
              .join(F.broadcast(region),
                    F.col("n_regionkey") == F.col("r_regionkey"))
              .join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
              .join(F.broadcast(n2),
                    F.col("s_nationkey") == F.col("sn_key")))
    return (joined.groupBy(F.year("o_orderdate").alias("o_year"))
            .agg(F.sum(nation3.cast("decimal(18,4)")).alias("n3_rev"),
                 F.sum(revenue.cast("decimal(18,4)")).alias("tot_rev"))
            .select("o_year",
                    F.round(F.col("n3_rev").cast("double")
                            / F.col("tot_rev").cast("double"), 4)
                    .alias("mkt_share"))
            .orderBy("o_year"))


def q_tpch_q9(spark, sf_dir):
    """Q9 product-type profit (TPC-H 2.4.9, adapted: the testdata has no
    partsupp, so profit omits the ps_supplycost·l_quantity term and the
    part filter is p_type = 'ECONOMY' instead of p_name LIKE): profit by
    supplier nation and order year.  5-table join; nation broadcasts,
    the part filter pushes to its scan and shrinks the first fact join
    ~6× before the shuffle."""
    db = _db(spark, sf_dir)
    part = (db.table("part").filter(F.col("p_type") == "ECONOMY")
            .select("p_partkey"))
    li = db.table("lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey",
        "l_extendedprice", "l_discount")
    sup = db.table("supplier").select("s_suppkey", "s_nationkey")
    nation = db.table("nation").select("n_nationkey", "n_name")
    orders = db.table("orders").select("o_orderkey", "o_orderdate")
    profit = (F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (li.join(part, F.col("l_partkey") == F.col("p_partkey"))
            .join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
            .join(F.broadcast(nation),
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy(F.col("n_name").alias("nation"),
                     F.year("o_orderdate").alias("o_year"))
            .agg(F.sum(profit.cast("decimal(18,4)")).alias("profit_dec"))
            .select("nation", "o_year",
                    F.round(F.col("profit_dec").cast("double"), 4)
                    .alias("sum_profit"))
            .orderBy("nation", F.col("o_year").desc()))


def q_tpch_q13(spark, sf_dir):
    """Q13 customer order-count distribution (TPC-H 2.4.13, adapted:
    the o_comment NOT LIKE filter becomes o_orderpriority <> '1-URGENT'
    — same shape, join-side filter on the OUTER side's right relation).
    LEFT OUTER join so zero-order customers survive with c_count = 0,
    then a second aggregate over the counts.  Both aggregates are
    map-side-partial; the distribution fits anywhere."""
    db = _db(spark, sf_dir)
    orders_f = (db.table("orders")
                .filter(F.col("o_orderpriority") != "1-URGENT")
                .select("o_custkey", "o_orderkey"))
    counts = (db.table("customer")
              .join(orders_f,
                    F.col("c_custkey") == F.col("o_custkey"), "left_outer")
              .groupBy("c_custkey")
              .agg(F.count("o_orderkey").alias("c_count")))
    return (counts.groupBy("c_count")
            .agg(F.count(F.lit(1)).alias("custdist"))
            .orderBy(F.col("custdist").desc(), F.col("c_count").desc()))


def q_tpch_q15(spark, sf_dir):
    """Q15 top supplier (TPC-H 2.4.15): revenue per supplier over one
    quarter, keep the supplier(s) at the max.  The max is computed as a
    1-row aggregate joined back (broadcast) — no window over a single
    partition, so the shape scales; equality is tested on the EXACT
    decimal revenue (both engines sum decimals exactly, so the tie set
    is deterministic)."""
    db = _db(spark, sf_dir)
    rev = (db.table("lineitem")
           .filter((F.col("l_shipdate") >= "1996-01-01")
                   & (F.col("l_shipdate") < "1996-04-01"))
           .groupBy("l_suppkey")
           .agg(F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount")))
                      .cast("decimal(18,4)")).alias("total_rev")))
    top = rev.agg(F.max("total_rev").alias("max_rev"))
    return (rev.join(F.broadcast(top),
                     F.col("total_rev") == F.col("max_rev"))
            .join(db.table("supplier"),
                  F.col("l_suppkey") == F.col("s_suppkey"))
            .select(F.col("s_suppkey"), F.col("s_name"),
                    F.round(F.col("total_rev").cast("double"), 4)
                    .alias("total_revenue"))
            .orderBy("s_suppkey"))


def q_tpch_q16(spark, sf_dir):
    """Q16 supplier-part relationships (TPC-H 2.4.16, adapted: the
    part-supplier relation is derived from lineitem — the testdata has
    no partsupp — and the 'complaints' exclusion becomes s_acctbal < 0):
    distinct supplier count per (brand, type, size) for mid-size
    non-PROMO parts, excluding flagged suppliers via ANTI join.  The
    lineitem projection is distinct-ed to (partkey, suppkey) FIRST —
    the only wide shuffle is over that deduplicated pair set, not raw
    lineitem."""
    db = _db(spark, sf_dir)
    parts_f = (db.table("part")
               .filter((F.col("p_brand") != "Brand#1")
                       & (F.col("p_type") != "PROMO")
                       & F.col("p_size").isin([5, 10, 15, 20, 25, 30]))
               .select("p_partkey", "p_brand", "p_type", "p_size"))
    flagged = db.table("supplier").filter(F.col("s_acctbal") < 0) \
        .select("s_suppkey")
    ps = (db.table("lineitem").select("l_partkey", "l_suppkey").distinct()
          .join(flagged, F.col("l_suppkey") == F.col("s_suppkey"),
                "left_anti"))
    return (ps.join(parts_f, F.col("l_partkey") == F.col("p_partkey"))
            .groupBy("p_brand", "p_type", "p_size")
            .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
            .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type",
                     "p_size"))


def q_tpch_q17(spark, sf_dir):
    """Q17 small-quantity-order revenue (TPC-H 2.4.17, adapted: p_type
    stands in for p_container): average yearly revenue lost if orders
    below 20% of a part's mean quantity were not taken.  The correlated
    per-part average is a groupBy-agg joined back on p_partkey — both
    sides already hash-partitioned on the same key, and only Brand#3
    lineitems (semi-joined via the filtered part dim) are averaged.
    l_quantity is integral in this corpus, so the 0.2·avg threshold is
    exact on both engines."""
    db = _db(spark, sf_dir)
    parts_f = (db.table("part")
               .filter((F.col("p_brand") == "Brand#3")
                       & (F.col("p_type") == "SMALL"))
               .select("p_partkey"))
    li = (db.table("lineitem")
          .join(F.broadcast(parts_f),
                F.col("l_partkey") == F.col("p_partkey"))
          .select("l_partkey", "l_quantity", "l_extendedprice"))
    avgs = (li.groupBy(F.col("l_partkey").alias("a_partkey"))
            .agg(F.avg("l_quantity").alias("avg_qty")))
    out = (li.join(avgs, F.col("l_partkey") == F.col("a_partkey"))
           .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
           .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,4)"))
                .alias("loss")))
    return out.select(F.round((F.col("loss") / 7.0).cast("double"), 4)
                      .alias("avg_yearly"))


def q_tpch_q19(spark, sf_dir):
    """Q19 discounted revenue (TPC-H 2.4.19, adapted: p_type stands in
    for p_container): three OR'd (brand ∧ type ∧ size-range ∧
    quantity-range) branches — the disjunction-of-conjunctions shape
    that exercises Catalyst's CNF conversion: the common l_partkey =
    p_partkey stays an equi-join and the per-branch part predicates
    push below it."""
    db = _db(spark, sf_dir)
    li, p = db.table("lineitem"), db.table("part")
    branch = (
        ((F.col("p_brand") == "Brand#12") & (F.col("p_type") == "SMALL")
         & F.col("p_size").between(1, 5)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & (F.col("p_type") == "MEDIUM")
           & F.col("p_size").between(1, 10)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & (F.col("p_type") == "LARGE")
           & F.col("p_size").between(1, 15)
           & F.col("l_quantity").between(20, 30)))
    return (li.join(p, li.l_partkey == p.p_partkey)
            .filter(branch)
            .agg(F.round(F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount")))
                .cast("decimal(18,4)")).cast("double"), 4)
                .alias("revenue")))


def q_tpch_q22(spark, sf_dir):
    """Q22 global sales opportunity (TPC-H 2.4.22, adapted: c_nationkey
    stands in for the phone-prefix country code, and 'no orders' becomes
    'no orders since 1999' so the anti-join side is date-pruned):
    well-funded dormant customers per nation.  The acctbal threshold is
    a 1-row broadcast (exact decimal sum ÷ count → bit-identical double
    on any engine); the dormancy test is an ANTI join against the
    date-filtered orders."""
    db = _db(spark, sf_dir)
    nations = [1, 3, 5, 7]
    cust = (db.table("customer")
            .filter(F.col("c_nationkey").isin(nations)))
    thr = (cust.filter(F.col("c_acctbal") > 0.0)
           .agg((F.sum(F.col("c_acctbal").cast("decimal(18,4)"))
                 .cast("double")
                 / F.count(F.lit(1))).alias("avg_bal")))
    recent = (db.table("orders")
              .filter(F.col("o_orderdate") >= "1999-01-01")
              .select("o_custkey"))
    return (cust.crossJoin(F.broadcast(thr))
            .filter(F.col("c_acctbal") > F.col("avg_bal"))
            .join(recent, F.col("c_custkey") == F.col("o_custkey"),
                  "left_anti")
            .groupBy("c_nationkey")
            .agg(F.count(F.lit(1)).alias("numcust"),
                 F.round(F.sum(F.col("c_acctbal").cast("decimal(18,4)"))
                         .cast("double"), 2).alias("totacctbal"))
            .orderBy("c_nationkey"))


def q_tpch_q2(spark, sf_dir):
    """Q2 minimum-cost supplier (TPC-H 2.4.2, adapted: no partsupp table
    in the corpus, so 'supplies part P' means a (l_partkey, l_suppkey)
    pair exists in lineitem and the correlated MIN is over s_acctbal
    instead of ps_supplycost): for each LARGE part of size 10–20, the
    cheapest EUROPE supplier who has ever shipped it.  The correlated
    `= (SELECT MIN ...)` becomes a window MIN over p_partkey — one
    shuffle keyed on the part, no second join or subquery re-scan.  The
    filtered part/nation/region dims broadcast; the only wide shuffles
    are the pair-distinct and the window, both keyed on l_partkey."""
    from pyspark.sql.window import Window

    db = _db(spark, sf_dir)
    part = (db.table("part")
            .filter((F.col("p_type") == "LARGE")
                    & F.col("p_size").between(10, 20))
            .select("p_partkey", "p_name"))
    pairs = (db.table("lineitem")
             .select("l_partkey", "l_suppkey").distinct())
    sup = db.table("supplier").select(
        "s_suppkey", "s_name", "s_acctbal", "s_nationkey")
    nation = db.table("nation").select(
        "n_nationkey", "n_name", "n_regionkey")
    region = (db.table("region").filter(F.col("r_name") == "EUROPE")
              .select("r_regionkey"))
    cand = (pairs.join(F.broadcast(part),
                       F.col("l_partkey") == F.col("p_partkey"))
            .join(F.broadcast(sup),
                  F.col("l_suppkey") == F.col("s_suppkey"))
            .join(F.broadcast(nation),
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .join(F.broadcast(region),
                  F.col("n_regionkey") == F.col("r_regionkey")))
    w = Window.partitionBy("p_partkey")
    return (cand.withColumn("min_bal", F.min("s_acctbal").over(w))
            .filter(F.col("s_acctbal") == F.col("min_bal"))
            .select("s_acctbal", "s_name", "n_name", "p_partkey",
                    "p_name")
            .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name",
                     "p_partkey")
            .limit(100))


def q_tpch_q11(spark, sf_dir):
    """Q11 important stock identification (TPC-H 2.4.11, adapted: value
    is shipped revenue from lineitem rather than ps_supplycost·availqty,
    and the nation is NATION_7): parts whose NATION_7-supplied value
    exceeds 2.5× the mean per-part value (TPC-H scales its fraction as
    0.0001/SF for the same reason: a fixed share of the total vanishes
    as the corpus grows; the mean-relative form is scale-invariant).
    The scalar threshold subquery is a 1-row re-aggregation of the
    grouped result broadcast back over it — the fact table is scanned
    ONCE (Q11's trap is scanning it twice).  Supplier⋈nation prunes
    lineitem ~25× before the group-by shuffle."""
    db = _db(spark, sf_dir)
    nat_sup = (db.table("supplier")
               .join(F.broadcast(db.table("nation")
                                 .filter(F.col("n_name") == "NATION_7")
                                 .select("n_nationkey")),
                     F.col("s_nationkey") == F.col("n_nationkey"))
               .select("s_suppkey"))
    value = (F.col("l_extendedprice") * (1 - F.col("l_discount")))
    grouped = (db.table("lineitem")
               .join(F.broadcast(nat_sup),
                     F.col("l_suppkey") == F.col("s_suppkey"))
               .groupBy(F.col("l_partkey").alias("part_key"))
               .agg(F.sum(value.cast("decimal(18,4)")).alias("val_dec")))
    total = grouped.agg(
        (F.sum("val_dec").cast("double") / F.count(F.lit(1)))
        .alias("mean_val"))
    return (grouped.crossJoin(F.broadcast(total))
            .filter(F.col("val_dec").cast("double")
                    > F.col("mean_val") * 2.5)
            .select("part_key",
                    F.round(F.col("val_dec").cast("double"), 2)
                    .alias("part_value"))
            .orderBy(F.col("part_value").desc(), "part_key"))


def q_tpch_q12(spark, sf_dir):
    """Q12 shipping modes and order priority (TPC-H 2.4.12, adapted: the
    corpus has no l_shipmode/commitdate/receiptdate, so the mode groups
    become l_returnflag and 'received late' becomes 'shipped more than
    60 days after the order date'): per return flag, how many late-1997
    shipments belonged to critical- vs normal-priority orders.  Single
    equi-join + one conditional aggregate pass; the shipdate window
    pushes to the lineitem scan before the join shuffle."""
    db = _db(spark, sf_dir)
    li = (db.table("lineitem")
          .filter((F.col("l_shipdate") >= "1997-01-01")
                  & (F.col("l_shipdate") < "1998-01-01"))
          .select("l_orderkey", "l_returnflag", "l_shipdate"))
    orders = db.table("orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    late = (F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
    return (li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .filter(late)
            .groupBy("l_returnflag")
            .agg(F.sum(F.when(high, 1).otherwise(0)).cast("bigint")
                 .alias("high_line_count"),
                 F.sum(F.when(high, 0).otherwise(1)).cast("bigint")
                 .alias("low_line_count"))
            .orderBy("l_returnflag"))


def q_tpch_q20(spark, sf_dir):
    """Q20 potential part promotion (TPC-H 2.4.20, adapted: availability
    comes from shipped quantity instead of partsupp.ps_availqty):
    EUROPE suppliers who shipped more than 80 units of Brand#5 parts
    during 1997.  The nested IN chain becomes two LEFT SEMI joins — the
    Brand#5 part list broadcasts into the date-pruned lineitem scan, the
    qualifying-supplier aggregate (≤ |supplier| rows) broadcasts into
    supplier.  No correlated re-execution anywhere."""
    db = _db(spark, sf_dir)
    promo = (db.table("part").filter(F.col("p_brand") == "Brand#5")
             .select("p_partkey"))
    qualifying = (db.table("lineitem")
                  .filter((F.col("l_shipdate") >= "1997-01-01")
                          & (F.col("l_shipdate") < "1998-01-01"))
                  .join(F.broadcast(promo),
                        F.col("l_partkey") == F.col("p_partkey"),
                        "left_semi")
                  .groupBy("l_suppkey")
                  .agg(F.sum(F.col("l_quantity").cast("decimal(18,4)"))
                       .cast("double").alias("qty"))
                  .filter(F.col("qty") > 80.0)
                  .select("l_suppkey"))
    euro_nations = (db.table("nation")
                    .filter(F.col("n_regionkey") == 3)
                    .select("n_nationkey"))
    return (db.table("supplier")
            .join(F.broadcast(euro_nations),
                  F.col("s_nationkey") == F.col("n_nationkey"),
                  "left_semi")
            .join(F.broadcast(qualifying),
                  F.col("s_suppkey") == F.col("l_suppkey"),
                  "left_semi")
            .select("s_name", "s_acctbal")
            .orderBy("s_name"))


def q_tpch_q21(spark, sf_dir):
    """Q21 suppliers who kept orders waiting (TPC-H 2.4.21, adapted: no
    commit/receipt dates, so 'late' is shipping 60+ days after the order
    date and the EXISTS/NOT-EXISTS pair tests 'another supplier shares
    the order' / 'no other supplier shipped later'): per supplier, count
    late line-items in finished multi-supplier orders where THIS
    supplier was the last to ship.  Both correlated subqueries collapse
    into one per-order aggregate: distinct-supplier count plus the top-2
    per-supplier max shipdates (sort_array over a per-order list bounded
    by suppliers-per-order, ≤7 here) — so 'max over the OTHER suppliers'
    is top1 unless you ARE top1, else top2.  Three shuffles total, all
    keyed on l_orderkey, then a broadcast of the 100-row supplier dim."""
    db = _db(spark, sf_dir)
    fo = (db.table("orders").filter(F.col("o_orderstatus") == "F")
          .select("o_orderkey", "o_orderdate"))
    li = (db.table("lineitem")
          .select("l_orderkey", "l_suppkey", "l_shipdate")
          .join(fo, F.col("l_orderkey") == F.col("o_orderkey")))
    sup_max = (li.groupBy("l_orderkey", "l_suppkey")
               .agg(F.max("l_shipdate").alias("sup_max")))
    ord_stats = (sup_max.groupBy(F.col("l_orderkey").alias("okey"))
                 .agg(F.count(F.lit(1)).alias("n_supp"),
                      F.sort_array(
                          F.collect_list(F.struct("sup_max", "l_suppkey")),
                          asc=False).alias("top"))
                 .filter(F.col("n_supp") >= 2)
                 .select("okey", "n_supp",
                         F.col("top")[0].alias("top1"),
                         F.col("top")[1].alias("top2")))
    late = (F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
    other_max = F.when(
        F.col("top1.l_suppkey") != F.col("l_suppkey"),
        F.col("top1.sup_max")).otherwise(F.col("top2.sup_max"))
    waits = (li.filter(late)
             .join(ord_stats, F.col("l_orderkey") == F.col("okey"))
             .filter(F.col("l_shipdate") >= other_max))
    return (waits.join(F.broadcast(db.table("supplier")
                                   .select("s_suppkey", "s_name")),
                       F.col("l_suppkey") == F.col("s_suppkey"))
            .groupBy("s_name")
            .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
            .orderBy(F.col("numwait").desc(), "s_name")
            .limit(100))


# ===================================================================== #
# training-data pipeline operators (documents / embeddings)
# ===================================================================== #
def q_udtf_sentences(spark, sf_dir):
    """Python UDTF extension point (functions/udtfs.py): LATERAL-join a
    table function that emits one row per sentence.  Sentence breaks
    are PLANTED (every ' table ' becomes '. ' — the synthetic corpus is
    one long sentence per doc) so the expansion is genuinely 1:N.
    Arrow-batched; the oracle replays the same split with DuckDB's
    subscript zip."""
    from cs186_query_optimization_project_spark.functions import udtfs

    db = _db(spark, sf_dir)
    udtfs.register_all(spark)
    view = "udtf_docs_" + _tag(sf_dir)
    (db.table("documents").filter(F.col("doc_id") < 30)
     .select("doc_id",
             F.replace(F.col("text"), F.lit(" table "), F.lit(". "))
             .alias("text"))
     .createOrReplaceTempView(view))
    return spark.sql(
        f"SELECT doc_id, s.sent_idx, s.sentence "
        f"FROM {view}, LATERAL split_sentences(text) s")


def q_multimodal_features(spark, sf_dir):
    """Multimodal plumbing: binary asset column + Arrow-batched
    mapInPandas feature extraction (decode stubbed — see
    functions/multimodal.py).  Oracle covers the SQL-expressible outputs
    (checksum/byte stats); the stub feature vector is engine-internal."""
    db = _db(spark, sf_dir)
    assets = multimodal.attach_fake_assets(db.table("documents"))
    return (multimodal.extract_features(assets)
            .select("doc_id", "mime", "n_bytes", "checksum"))


def q_frame_sample(spark, sf_dir):
    """Video frame-sampling plumbing (multimodal.sample_frames): one
    binary asset row fans out to n_frames rows inside a single Arrow
    batch — the mapInPandas 1->N explode a real frame sampler needs.
    Oracle replays the SQL-expressible projection (frame windowing
    math: step = max(len//n, 1), window i = bytes [i*step, (i+1)*step)
    clipped to len); the stubbed per-frame feature vector is
    engine-internal and unit-tested (tests/test_functions.py)."""
    db = _db(spark, sf_dir)
    assets = multimodal.attach_fake_assets(db.table("documents"))
    return (multimodal.sample_frames(assets, n_frames=4)
            .select("doc_id",
                    F.col("frame_idx").cast("bigint").alias("frame_idx"),
                    F.col("frame_n_bytes").cast("bigint")
                    .alias("frame_n_bytes")))


def q_audio_chunks(spark, sf_dir):
    """Audio chunking plumbing (multimodal.chunk_audio): binary
    waveform + (sample_rate, n_samples) metadata fans out to
    ceil(n_samples/chunk_len) rows — a DATA-DEPENDENT 1→N inside one
    Arrow batch, the shape an ASR/feature pipeline needs (contrast
    frame_sample's fixed fan-out).  Chunk boundaries and durations are
    integer/div arithmetic over the metadata, so the oracle replays
    everything except the stubbed per-chunk feature (engine-internal,
    unit-tested)."""
    db = _db(spark, sf_dir)
    audio = multimodal.attach_fake_audio(db.table("documents"))
    return (multimodal.chunk_audio(audio, chunk_seconds=2)
            .select("doc_id",
                    F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
                    F.col("chunk_n_samples").cast("bigint")
                    .alias("chunk_n_samples"),
                    F.round("duration_s", 4).alias("duration_s")))


def q_asset_resize(spark, sf_dir):
    """Image-resize plumbing (multimodal.resize_assets): Arrow-batched
    binary->binary transform with metadata rewrite, composable with
    feature extraction.  The stub resizer's output SIZE is a pure
    function of the input length (stride = max(len // (w*h//64), 1);
    out = min(ceil(len/stride), w*h)), so the oracle value-checks the
    whole metadata projection including the resized byte count."""
    db = _db(spark, sf_dir)
    assets = multimodal.attach_fake_assets(db.table("documents"))
    resized = multimodal.resize_assets(assets, width=64, height=64)
    return resized.select(
        "doc_id",
        F.octet_length("asset").cast("bigint").alias("resized_bytes"),
        F.col("asset_meta.mime").alias("mime"),
        F.col("asset_meta.width").alias("width"),
        F.col("asset_meta.height").alias("height"))


def q_pipeline_clean_corpus(spark, sf_dir):
    """Composite training-data prep pipeline: quality gate → English-only
    → exact dedup (keep min id) → token stats.  Each stage is an engine
    operator; the whole chain is one declarative plan (no materialization
    between stages) and fully oracle-checked."""
    docs = _db(spark, sf_dir).table("documents")
    scored = docs.select(
        "doc_id", "text",
        text.quality_score("text").alias("quality"),
        text.lang_id("text").alias("lang"))
    kept = scored.filter((F.col("quality") >= 0.5)
                         & (F.col("lang") == "en"))
    deduped = dedup.drop_exact_duplicates(kept)
    return deduped.select(
        "doc_id",
        text.token_count("text").alias("ws_tokens"),
        text.bpe_token_count("text").alias("bpe_tokens"),
        "quality")


def q_vocab_top(spark, sf_dir):
    """Tokenizer-vocabulary selection: top-100 tokens by document
    frequency (then total count, then token — a total order, so the
    LIMIT boundary is deterministic).  One explode + one token-keyed
    aggregate; min_doc_freq prunes the hapax tail before the sort."""
    return (text.vocab(_db(spark, sf_dir).table("documents"),
                       min_doc_freq=2)
            .orderBy(F.col("doc_freq").desc(),
                     F.col("total_count").desc(), "token")
            .limit(100))


def q_tfidf_features(spark, sf_dir):
    """Classic sparse featurization: per-(doc, token) TF-IDF with
    sklearn's smooth idf.  df/tf/N are exact integers on both engines;
    the single ln rounds to 4 decimals (libm-portable).  Output is
    restricted to doc_id < 30 (the corpus-wide stats still come from
    ALL documents)."""
    out = text.tfidf(_db(spark, sf_dir).table("documents"))
    return (out.filter(F.col("doc_id") < 30)
            .orderBy("doc_id", "token"))


def q_encode_documents(spark, sf_dir):
    """tokenize→encode: map every document to its token-id sequence
    under a frequency-ranked top-50 vocabulary (OOV → 0) — the bridge
    between vocab_top and pack_sequences that completes the
    tokenize→encode→pack training-data path.  The vocabulary is
    dimension-sized and broadcasts; position survives the shuffle via
    posexplode so the sequence rebuilds deterministically."""
    db = _db(spark, sf_dir)
    docs = db.table("documents")
    vids = text.vocab_with_ids(docs, size=50)
    return (text.encode_documents(docs.filter(F.col("doc_id") < 30),
                                  vids)
            .orderBy("doc_id"))


def q_pii_redact(spark, sf_dir):
    """Corpus PII scrub: emails, phone numbers, SSNs → typed tags.
    PII is PLANTED on every 20th doc (ids offset 2e6) because the
    synthetic corpus contains none — the oracle replays the same
    planting and the same RE2-safe patterns with DuckDB's 'g' flag."""
    docs = _db(spark, sf_dir).table("documents")
    planted = (docs.filter(F.col("doc_id") % 20 == 0)
               .select((F.col("doc_id") + 2000000).alias("doc_id"),
                       F.concat(F.col("text"), F.lit(_PII_SUFFIX))
                       .alias("text")))
    corpus = docs.select("doc_id", "text").unionByName(planted)
    return (text.redact_pii(corpus)
            .select("doc_id", "text"))


#: appended to planted docs in q_pii_redact; one instance of each PII
#: class, kept in ONE place so query and oracle can't drift
_PII_SUFFIX = (" contact alice.smith@example.com or 415-555-1234; "
               "ssn 123-45-6789")


def q_contamination_check(spark, sf_dir):
    """Benchmark decontamination: every doc_id % 97 == 0 document plays
    the eval set, the rest are the training corpus; each training doc
    is scored by the fraction of its distinct 5-gram shingles that
    appear anywhere in the eval set.  Contaminated docs are PLANTED
    (ids offset 3e6: each eval doc re-enters the training side with a
    three-word suffix — same pattern as q_pii_redact) because the
    synthetic near-dup families never cross the %97 split, so the
    unplanted score would be identically zero.  The eval shingle-hash
    set broadcasts — the corpus side never shuffles for the membership
    probe; see functions/contamination.py for the 100 TB shape."""
    db = _db(spark, sf_dir)
    docs = db.table("documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    planted = bench.select(
        (F.col("doc_id") + 3000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(_CONTA_SUFFIX)).alias("text"))
    train = (docs.filter(F.col("doc_id") % 97 != 0)
             .select("doc_id", "text").unionByName(planted))
    return contamination.contamination_scores(
        train, bench, k=5, threshold=0.5)


#: appended to planted near-copies in q_contamination_check; one place
#: so query and oracle can't drift
_CONTA_SUFFIX = " graft overlap probe"


def q_doc_fingerprints(spark, sf_dir):
    """Winnowing fingerprints (MOSS scheme): char-8-gram rolling hashes,
    window-4 local minima, distinct per doc — any shared passage of
    >= 11 chars between two documents yields a common fingerprint, the
    partial-overlap primitive whole-doc hashes can't provide.  Map-only
    (no shuffle): fingerprints are row-local array expressions.
    Restricted to doc_id < 40 to bound the row count; the operator
    itself is corpus-wide."""
    docs = (_db(spark, sf_dir).table("documents")
            .filter(F.col("doc_id") < 40))
    return docs.select(
        "doc_id",
        F.explode(text.winnow_fingerprints("text", k=8, w=4))
        .alias("fingerprint"))


def q_dedup_exact(spark, sf_dir):
    return dedup.exact_duplicates(_db(spark, sf_dir).table("documents"))


def q_dup_spans(spark, sf_dir):
    """Exact duplicated 8-token spans across the corpus (Lee et al.
    2022 exact-substring dedup — the verbatim-boilerplate complement to
    the whole-doc MinHash path).  One gram-keyed aggregation; top-40 by
    the total order (n_docs desc, n_occurrences desc, gram) so the
    limit is deterministic."""
    corpus = _db(spark, sf_dir).table("documents")
    spans = dedup.duplicated_spans(corpus, k=8)
    return (spans.orderBy(F.desc("n_docs"), F.desc("n_occurrences"),
                          "gram")
            .limit(40)
            .select("gram", "n_docs", "n_occurrences"))


def q_dup_span_coverage(spark, sf_dir):
    """Per-document fraction of 8-gram positions inside a cross-doc
    duplicated span — the exact-substring removal metric (docs above a
    coverage threshold get trimmed/dropped).  Unlimited deterministic
    row set: every doc with >= 1 duplicated span."""
    corpus = _db(spark, sf_dir).table("documents")
    return dedup.span_dup_coverage(corpus, k=8).orderBy("doc_id")


def q_text_stats(spark, sf_dir):
    return text.profile(_db(spark, sf_dir).table("documents"))


def q_quality_filter(spark, sf_dir):
    """Model-based quality filtering (the CCNet/DCLM classifier stage
    with a transparent frozen linear model): logistic inference over
    portable text features, every doc scored, keep ⇔ margin >= 0.  The
    decision is +,*,/ double arithmetic only — bit-identical in the
    SQL oracle — and splits the corpus non-trivially (~40% kept at
    sf0.01), so both branches of the filter carry driver evidence."""
    return text.classifier_quality(
        _db(spark, sf_dir).table("documents")).orderBy("doc_id")


def q_lang_id(spark, sf_dir):
    db = _db(spark, sf_dir)
    return (db.table("documents")
            .select(text.lang_id("text").alias("lang_pred"))
            .groupBy("lang_pred").agg(F.count(F.lit(1)).alias("countAgg")))


def q_minhash_near_dups(spark, sf_dir):
    """Near-dup detection demo: plant perturbed copies (one word appended,
    ids offset by 1e6), then run the full MinHash-LSH pipeline.  The
    portable md5-based hash family makes the signatures (hence buckets,
    hence the exact pair set) reproducible in ANSI SQL — fully
    oracle-checked, not rows-only."""
    db = _db(spark, sf_dir)
    corpus = _planted_docs(db)
    pairs = dedup.minhash_near_duplicates(corpus, threshold=0.5)
    return pairs.select("a", "b", F.round("jaccard", 6).alias("jaccard"))


def q_ngram_jaccard(spark, sf_dir):
    """Exact n-gram Jaccard dedup over the planted corpus — inverted-index
    join, no hash approximation, so it IS SQL-expressible and fully
    oracle-checked (unlike the MinHash pipeline)."""
    db = _db(spark, sf_dir)
    corpus = _planted_docs(db)
    return dedup.ngram_jaccard_pairs(corpus, threshold=0.6)


def q_containment_near_dups(spark, sf_dir):
    """Asymmetric n-gram CONTAINMENT dedup over the planted corpus —
    the short-doc-inside-long-doc pattern Jaccard structurally misses
    (a 100-shingle doc embedded in a 1000-shingle doc has Jaccard
    ≤ 0.1 but containment 1.0).  Planted ``text || ' appendix'``
    copies are strict supersets of their originals, so every planted
    pair scores exactly 1.0 and ``small`` names the original — the
    side a keep-longest policy drops.  Exact inverted-index join, no
    hash approximation, fully oracle-checked."""
    db = _db(spark, sf_dir)
    corpus = _planted_docs(db)
    return dedup.ngram_containment_pairs(corpus, threshold=0.9)


def q_containment_apply(spark, sf_dir):
    """Keep-LONGEST materialization over the containment pairs — the
    asymmetric pipeline's OUTPUT: every doc named as a pair's
    ``small`` (contained) side drops, the containing docs and
    untouched singletons survive.  This is the dedup policy long-form
    corpora actually want (keep the article, drop the embedded
    quote/duplicate fragment) where keep-min-id would as happily drop
    the superset.  One anti-join on the bounded loser set."""
    db = _db(spark, sf_dir)
    corpus = _planted_docs(db)
    pairs = dedup.ngram_containment_pairs(corpus, threshold=0.9)
    losers = pairs.select(F.col("small").alias("doc_id")).distinct()
    return (corpus.join(losers, "doc_id", "left_anti")
            .select("doc_id",
                    text.token_count("text").alias("n_tokens"))
            .orderBy("doc_id"))


def q_streaming_enrich(spark, sf_dir):
    """Stream-static dimension enrichment: the events stream left-joins a
    broadcast customer lookup per micro-batch (no streaming state),
    then aggregates per segment.  Oracle = the equivalent batch join."""
    name = "stream_enrich_" + _tag(sf_dir)
    events = stream_windows.stream_events(spark, f"{sf_dir}/events.parquet")
    dim = (_db(spark, sf_dir).table("customer")
           .select("c_custkey", "c_mktsegment"))
    joined = stream_windows.enrich_with_dimension(events, dim,
                                                  "user_id", "c_custkey")
    agg = joined.groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n"))
    stream_windows.run_to_memory(agg, name, output_mode="complete",
                                 shuffle_partitions=8)
    return spark.table(name)


def q_zorder_scan(spark, sf_dir):
    """Multi-column clustered sink (§2.11 scale path): write lineitem
    Z-ordered on (l_partkey, l_suppkey), then scan with a predicate on
    the SECOND clustered column — row-group min/max skips most files,
    which a lexicographic sort can only do for its leading column."""
    import os

    from cs186_query_optimization_project_spark.sources import writers

    db = _db(spark, sf_dir)
    parent = _ensure_private_dir(
        f"/tmp/spark_graft_z_{os.getuid()}")
    path = os.path.join(parent, _tag(sf_dir))
    writers.write_zordered(db.table("lineitem"), path,
                           ("l_partkey", "l_suppkey"))
    return (spark.read.parquet(path)
            .filter(F.col("l_suppkey") == 7)
            .select("l_orderkey", "l_linenumber", "l_partkey",
                    "l_suppkey"))


def q_window_ntile(spark, sf_dir):
    """Distribution window functions: quartile (ntile), percent_rank,
    and cume_dist of each customer's balance within its market segment
    — one shuffle on the segment, rank family computed in one window
    pass.  acctbal ties broken by c_custkey so every rank is
    deterministic."""
    from pyspark.sql.window import Window

    db = _db(spark, sf_dir)
    w = (Window.partitionBy("c_mktsegment")
         .orderBy(F.col("c_acctbal").desc(), F.col("c_custkey")))
    return (db.table("customer")
            .filter(F.col("c_custkey") < 200)
            .select("c_custkey", "c_mktsegment", "c_acctbal",
                    F.ntile(4).over(w).alias("quartile"),
                    F.round(F.percent_rank().over(w), 6)
                    .alias("pct_rank"),
                    F.round(F.cume_dist().over(w), 6).alias("cume"))
            .orderBy("c_custkey"))


def q_null_safe_join(spark, sf_dir):
    """Null-safe equality join (<=>, IS NOT DISTINCT FROM): planted
    null keys on both sides MUST match each other — the semantics a
    plain equi-join silently drops.  Still hash-joinable (null hashes
    to a regular bucket), unlike a null-tolerant OR predicate."""
    left = (_db(spark, sf_dir).table("orders")
            .select(F.when(F.col("o_orderkey") % 100 == 0, None)
                    .otherwise(F.col("o_orderpriority")).alias("k"),
                    "o_orderkey"))
    right = _ldf(spark,
        [("1-URGENT", 10), ("2-HIGH", 5), (None, 1)],
        "k string, weight long")
    return (left.join(right, left["k"].eqNullSafe(right["k"]))
            .groupBy(F.coalesce(left["k"], F.lit("<null>"))
                     .alias("key"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"),
                 F.sum("weight").cast("bigint").alias("w"))
            .orderBy("key"))


def q_window_frame(spark, sf_dir):
    """Sliding-frame window aggregate: 3-row moving average of order
    totals per customer (ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)."""
    db = _db(spark, sf_dir)
    out = windows.frame_aggregate(
        db.table("orders"), ["o_custkey"], [F.col("o_orderkey").asc()],
        {"moving_avg": F.avg(F.col("o_totalprice")
                             .cast("decimal(18,4)"))},
        frame=(-2, 0))
    return out.select("o_custkey", "o_orderkey",
                      F.round(F.col("moving_avg").cast("double"), 4)
                      .alias("moving_avg"))


def q_collect_sorted(spark, sf_dir):
    """Aggregate-to-array (feature packing): per nation, the sorted set
    of market segments its customers appear in.  array_sort makes the
    collect_set deterministic; the array is emitted as a comma-joined
    string because downstream pandas-based comparators can't hash an
    array<string> column (semantics are identical — the set is sorted
    and its elements contain no commas)."""
    return (_db(spark, sf_dir).table("customer")
            .groupBy("c_nationkey")
            .agg(F.concat_ws(",", F.array_sort(F.collect_set("c_mktsegment")))
                 .alias("segments")))


def q_summary_stats(spark, sf_dir):
    """Descriptive-statistics aggregates (stddev / correlation /
    covariance) — single-pass, map-side-partial, the profiling step of a
    corpus pipeline."""
    return (_db(spark, sf_dir).table("lineitem")
            .groupBy("l_returnflag")
            .agg(F.round(F.stddev_samp("l_quantity"), 4).alias("std_qty"),
                 F.round(F.corr("l_quantity", "l_extendedprice"), 4)
                 .alias("corr_qty_price"),
                 F.round(F.covar_samp("l_quantity", "l_discount"), 4)
                 .alias("covar_qty_disc")))


def q_unpivot(spark, sf_dir):
    """Wide→long melt (feature reshaping); value columns coerce to a
    common type, one output row per (row, feature)."""
    return (_db(spark, sf_dir).table("part")
            .unpivot(["p_partkey"], ["p_size", "p_retailprice"],
                     "feature", "value"))


def q_dedup_clusters(spark, sf_dir):
    """Near-dup CLUSTERING: connected components (min-label propagation)
    over the exact n-gram Jaccard pair graph — (doc_id, cluster_id) with
    cluster_id = min reachable id; keep-one = doc_id == cluster_id.
    Deterministic (exact pairs, exact min labels) → fixed-round unrolled
    min-label oracle (_ngram_cc_sql)."""
    db = _db(spark, sf_dir)
    pairs = dedup.ngram_jaccard_pairs(_planted_docs(db), threshold=0.6)
    return dedup.duplicate_clusters(pairs)


def q_dedup_clusters_star(spark, sf_dir):
    """Same clustering contract as ``dedup_clusters`` but via alternating
    large-star/small-star contraction (Kiveris et al., SoCC'14): O(log n)
    rounds on ANY graph shape vs. min-label's O(diameter) — the variant
    for adversarially deep duplicate graphs at 100 TB.  Output is
    identical (cluster_id = min reachable id), so it shares the
    unrolled min-label oracle (_ngram_cc_sql)."""
    db = _db(spark, sf_dir)
    pairs = dedup.ngram_jaccard_pairs(_planted_docs(db), threshold=0.6)
    return dedup.duplicate_clusters_star(pairs)


def q_pack_sequences(spark, sf_dir):
    """Sequence packing (batch construction for pretraining): documents
    sharded by md5 bucket, laid out end-to-end in id order per shard,
    assigned to 256-token packs by start offset.  Deterministic layout —
    a pure function of (ids, token counts) — so the oracle replays it as
    a windowed running sum."""
    from cs186_query_optimization_project_spark.functions import packing

    db = _db(spark, sf_dir)
    counted = db.table("documents").select(
        "doc_id", text.token_count("text").alias("n_tokens"))
    return packing.pack_sequences(counted, "n_tokens", budget=256,
                                  n_shards=16)


def q_chunk_documents(spark, sf_dir):
    """Context-length fitting: split documents into overlapping 32-token
    windows (stride 24).  Map-only array expressions; every token lands
    in ≥1 chunk, short docs yield exactly one."""
    from cs186_query_optimization_project_spark.functions import packing

    db = _db(spark, sf_dir)
    return packing.chunk_documents(db.table("documents"),
                                   max_tokens=32, overlap=8)


def q_doc_repetition(spark, sf_dir):
    """Gopher-rule repetition signals (Rae et al. 2021): per-doc repeated
    -token and repeated-3-gram fractions — the standard pretraining
    quality filter alongside the length/punct/stopword score.  Map-only
    array expressions; fully oracle-checked (same splits in DuckDB)."""
    db = _db(spark, sf_dir)
    return text.repetition_stats(db.table("documents"))


def q_token_counts(spark, sf_dir):
    """Whitespace + BPE-ish regex token counting per document."""
    db = _db(spark, sf_dir)
    return (db.table("documents")
            .select("doc_id",
                    text.token_count("text").alias("ws_tokens"),
                    text.bpe_token_count("text").alias("bpe_tokens")))


def q_bpe_merges(spark, sf_dir):
    """Tokenizer training: the first 5 BPE merge rules learned from the
    corpus word-frequency table (functions/bpe.py — Sennrich subword
    BPE as a DataFrame-iterative op; corpus-scale work runs once, each
    round costs one vocabulary-sized aggregate).  Oracle unrolls the
    merge loop as MATERIALIZED CTEs over the identical string
    representation (_bpe_sql)."""
    from cs186_query_optimization_project_spark.functions import bpe
    docs = _db(spark, sf_dir).table("documents")
    return bpe.learn_bpe_merges(docs, n_merges=5)


#: fixed demonstration merge list for the bpe_segment entry — literal
#: constants so the DuckDB oracle replays the identical replace chain
_BPE_DEMO_MERGES = [("t", "h"), ("e", "r"), ("i", "n"),
                    ("th", "e"), ("o", "n")]


def q_bpe_segment(spark, sf_dir):
    """Tokenizer application (bpe_merges' sibling): segment every
    document with a FIXED rank-ordered merge list via
    functions/bpe.apply_bpe_merges — pure whole-stage-codegen string
    expressions, no shuffle.  Output is per-doc subword count + the
    first 12 subwords; the oracle replays the same per-word replace
    chain with DuckDB list lambdas."""
    from cs186_query_optimization_project_spark.functions import bpe
    docs = _db(spark, sf_dir).table("documents")
    seg = bpe.apply_bpe_merges(docs, _BPE_DEMO_MERGES)
    return seg.select(
        "doc_id",
        F.size("bpe_tokens").cast("bigint").alias("n_subwords"),
        F.array_join(F.slice("bpe_tokens", 1, 12), " ")
        .alias("head_subwords"))


def q_train_test_split(spark, sf_dir):
    """Deterministic hash-bucket train/test split: membership depends only
    on doc_id (md5 bucket < 80), never on partitioning or engine — the
    reproducible alternative to randomSplit for corpus materialization."""
    return (sampling.hash_split(_db(spark, sf_dir).table("documents"),
                                "doc_id")
            .select("doc_id", "split"))


def q_stratified_sample(spark, sf_dir):
    """Per-language stratified sample (class rebalancing): downsample the
    dominant language, keep the rest — via deterministic md5-bucket
    membership (``hash_stratified_sample``), so the selection is
    partition-layout-independent AND bit-replayable by the SQL oracle.
    (The seeded ``sampleBy`` Bernoulli variant stays in the library for
    approximate rebalancing; its draw depends on partition-internal row
    order, which is why it was rows-only checked before.)"""
    db = _db(spark, sf_dir)
    return (sampling.hash_stratified_sample(
        db.table("documents"), "lang", "doc_id",
        {"en": 0.3, "de": 1.0, "zh": 1.0, "fr": 1.0, "es": 1.0})
        .select("doc_id", "lang"))


def q_simhash_near_dups(spark, sf_dir):
    """SimHash near-dup pairs over the same planted corpus.  The portable
    60-bit signature exists precisely so this is fully oracle-checkable:
    the DuckDB SQL re-derives signatures, Manku chunks, candidate
    buckets, and exact Hamming distances bit-for-bit."""
    db = _db(spark, sf_dir)
    corpus = _planted_docs(db)
    return dedup.simhash_near_duplicates(corpus, max_hamming=3)


_QUERY_VEC_CACHE: dict[tuple, list[float]] = {}


def _query_vec(spark, sf_dir, vec_id: int = 0) -> list[float]:
    key = (sf_dir, vec_id)
    if key not in _QUERY_VEC_CACHE:
        row = (_db(spark, sf_dir).table("embeddings")
               .filter(F.col("vec_id") == vec_id).select("embedding")
               .first())
        _QUERY_VEC_CACHE[key] = [float(v) for v in row["embedding"]]
    return _QUERY_VEC_CACHE[key]


def q_embedding_topk(spark, sf_dir):
    db = _db(spark, sf_dir)
    return similarity.cosine_topk(db.table("embeddings"),
                                  _query_vec(spark, sf_dir), k=10)


def q_embedding_quantize(spark, sf_dir):
    """Top-10 retrieval over int8 scalar-quantized embeddings (FAISS
    SQ8 / per-row absmax): the 4×-compression path whose ranking the
    oracle recomputes EXACTLY — codes are integer-exact reproducible
    (``floor(x/scale + ½)`` over IEEE doubles), so spark and DuckDB
    dequantize to bit-identical vectors and the rounded cosines hash-
    match.  At 100 TB the scan reads ¼ the bytes and the fp32 corpus
    stays cold."""
    db = _db(spark, sf_dir)
    return similarity.sq8_topk(db.table("embeddings"),
                               _query_vec(spark, sf_dir), k=10)


def q_pq_ann(spark, sf_dir):
    """Product-quantization ADC retrieval (Jégou TPAMI'11 — m=8
    subspaces × 16 codewords: 8 int codes replace 64 fp32, 32× stored
    compression): train per-subspace Lloyd codebooks, encode the
    corpus, score candidates by lookup-table dot product WITHOUT
    touching the fp32 vectors, exact-rerank the best 80.  In-entry
    contract raises (must survive ``python -O``): every code in
    [0, 16), and recall@10 vs the exact brute-force top-10 ≥ 0.4 (the
    measured floor is 0.7–0.8 across SFs at one Lloyd iteration; PQ on
    near-orthogonal synthetic vectors is the worst case).  The oracle
    checks the SQL-recomputable scalars (corpus size, k) plus the
    contract bit."""
    db = _db(spark, sf_dir)
    emb = db.table("embeddings")
    qv = _query_vec(spark, sf_dir)
    books = similarity.pq_train(emb, m=8, k=16, n_iter=1)
    # encode ONCE: the checkpoint feeds both the code-range contract
    # aggregate and the ADC scoring (pq_topk precoded=True) — the old
    # shape executed the m×k-distance encode projection twice
    enc = similarity.pq_encode(
        similarity.ensure_parallelism(emb, "vec_id"),
        books).localCheckpoint()
    n_bad, n_encoded = enc.agg(
        F.sum(F.when(F.exists("pq_codes",
                              lambda c: (c < 0) | (c > 15)), 1)
              .otherwise(0)),
        F.count(F.lit(1))).collect()[0]
    if n_bad:
        raise RuntimeError(f"{n_bad} rows carry out-of-range PQ codes")
    approx = similarity.pq_topk(enc, books, qv, k=10, n_candidates=80,
                                precoded=True)
    exact = similarity.cosine_topk(emb, qv, k=10)
    overlap = exact.select("vec_id").join(
        approx.select("vec_id"), "vec_id").count()
    if overlap < 4:
        raise RuntimeError(
            f"PQ recall@10 = {overlap / 10} below the 0.4 floor")
    return _ldf(spark,
        [(10, int(n_encoded), True)],
        "k int, n_encoded bigint, recall_ge_04 boolean")


def q_ivfpq_probe(spark, sf_dir):
    """IVF-PQ ANN over a MATERIALIZED index (the FAISS IVFPQ layout:
    coarse Lloyd-refined centroids route rows to ``cell`` partitions,
    each row stores only m=8 residual PQ codes — ~32× less than fp32).
    The probe ADC-scores the 8 nearest cells from an m×k lookup table,
    then exact-reranks the best 320 ids via a broadcast semi-join back
    to the fp32 corpus.  The code table lives in a PartitionedTable
    keyed on ``cell``, so unprobed cells prune at the MANIFEST — their
    directories are never even listed.  In-entry contract raises (must
    survive ``python -O``): (a) every input file of the candidate scan
    lies in a directory the manifest maps to a PROBED cell, while the
    manifest holds more cells than were probed — real pruning, not a
    post-scan filter; (b) recall@10 vs the exact brute-force top-10
    ≥ 0.4 (measured 0.9 at sf0.01 and sf0.1 with these parameters).
    The oracle checks the SQL-recomputable scalars plus the contract
    bits."""
    import os as _os

    from cs186_query_optimization_project_spark.partitioned import (
        PartitionedTable,
    )

    idx = _ann_index(spark, sf_dir, "ivfpq")
    qv = _query_vec(spark, sf_dir)
    emb = _db(spark, sf_dir).table("embeddings")
    cand = similarity.ivfpq_probe(spark, idx, qv, n_probe=8,
                                  n_candidates=320)
    man = PartitionedTable(spark, idx.path)._manifest()
    probed = similarity._nearest_cells(idx.params["centroids"], qv, 8)
    allowed = {_os.path.normpath(d) for c in probed
               for d in man["parts"].get(str(c), [])}
    got_dirs = {_os.path.normpath(_os.path.dirname(
        f.removeprefix("file:"))) for f in cand.inputFiles()}
    if not got_dirs or not got_dirs <= allowed or \
            len(man["parts"]) <= len(probed):
        raise RuntimeError(
            "IVF-PQ probe scan lists files outside the probed cells' "
            "manifest directories — manifest pruning is broken")
    top = similarity.ivfpq_topk(spark, idx, emb, qv, k=10, n_probe=8,
                                n_candidates=320)
    exact = similarity.cosine_topk(emb, qv, k=10)
    overlap = exact.select("vec_id").join(
        top.select("vec_id"), "vec_id").count()
    if overlap < 4:
        raise RuntimeError(
            f"IVF-PQ recall@10 = {overlap / 10} below the 0.4 floor")
    n_indexed = similarity.ivfpq_codes(spark, idx).count()
    return _ldf(spark,
        [(10, int(n_indexed), True, True)],
        "k int, n_indexed bigint, pruned boolean, recall_ge_04 boolean")


def q_ivfpq_filtered(spark, sf_dir):
    """Filtered vector search on the QUANTIZED scale path
    (``ivfpq_topk(where="label = 2")``): the predicate evaluates on a
    narrow id+label projection of the source — float vectors stay
    untouched — and the eligible ids semi-join the probed cells
    BEFORE the ADC rank-limit, so every one of the k results
    satisfies the filter (post-filtering the unfiltered candidate
    list would under-return whenever the filter is selective; the
    unit suite pins that failure mode).  In-entry contracts raise
    (must survive ``python -O``): (a) exactly k rows return and all
    carry the filtered label; (b) recall@10 against the
    label-filtered brute-force top-10 ≥ 0.4 (measured 0.9-class like
    the unfiltered probe); (c) the filtered result differs from the
    unfiltered top-10 (the filter did real work).  The oracle checks
    the SQL-recomputable scalars plus the contract bits."""
    idx = _ann_index(spark, sf_dir, "ivfpq")
    qv = _query_vec(spark, sf_dir)
    emb = _db(spark, sf_dir).table("embeddings")
    top = similarity.ivfpq_topk(spark, idx, emb, qv, k=10, n_probe=8,
                                n_candidates=320, where="label = 2")
    rows = top.collect()
    ids = [int(r["vec_id"]) for r in rows]
    labels = dict(emb.join(
        _ldf(spark, [(i,) for i in ids], "vec_id bigint"),
        "vec_id").select("vec_id", "label").collect())
    if len(rows) != 10 or any(labels[i] != 2 for i in ids):
        raise RuntimeError(
            f"filtered IVF-PQ returned {len(rows)} rows with labels "
            f"{sorted(set(labels.values()))}; want 10 rows, all 2")
    exact = similarity.cosine_topk(emb.filter(F.col("label") == 2),
                                   qv, k=10)
    overlap = exact.select("vec_id").join(
        top.select("vec_id"), "vec_id").count()
    if overlap < 4:
        raise RuntimeError(
            f"filtered IVF-PQ recall@10 = {overlap / 10} below the "
            f"0.4 floor")
    unfiltered = {r["vec_id"] for r in similarity.ivfpq_topk(
        spark, idx, emb, qv, k=10, n_probe=8,
        n_candidates=320).select("vec_id").collect()}
    if set(ids) == unfiltered:
        raise RuntimeError(
            "filtered top-10 equals the unfiltered top-10 — the "
            "predicate did no work")
    n_eligible = emb.filter(F.col("label") == 2).count()
    return _ldf(spark,
        [(10, int(n_eligible), True, True)],
        "k int, n_eligible bigint, all_match_filter boolean, "
        "recall_ge_04 boolean")


#: build parameters for the contract ANN indexes; PART OF THE INDEX DIR
#: KEY below, so changing them can never silently reuse an index built
#: with the old layout
_ANN_PARAMS = {"lsh": {"n_planes": 4}, "ivf": {"n_cells": 16},
               "ivfpq": {"n_cells": 16, "m": 8, "k": 16, "n_iter": 1,
                         "refine_iters": 2}}

#: bump when the index CONTENT semantics change without a parameter
#: change (e.g. v2: ivf_centroids switched from xxhash64 to the portable
#: md5 pick; v3: the ivfpq code table moved onto PartitionedTable) —
#: keeps a stale on-disk index from silently serving the old layout to
#: a probe whose oracle assumes the new one
_ANN_INDEX_VERSION = 3

#: bump to invalidate the shared lakehouse skipping fixture below
_LAKE_FIXTURE_VERSION = 1


def _orders_bloom_table(spark, sf_dir):
    """Shared build-or-load lakehouse fixture — the r12 ANN
    base-index scheme applied to the skipping entries: orders
    (o_orderkey, o_orderstatus, o_totalprice) partitioned by status
    with a Bloom index on o_orderkey, plus the two disjoint synthetic
    append batches every skipping entry plants (keys 900000001+ /
    910000001+, prices 1.0 / 2.0).  ``bloom_skipping`` /
    ``multi_skip`` / ``inlist_skip`` PROBE this table strictly
    read-only, so one corpus-fingerprint-keyed build amortizes across
    entries and runs and their timed cost is the skipping OPERATOR,
    not table construction (the same argument, and the same measured
    win, as the r12 shared IVF-PQ base index)."""
    import os

    from cs186_query_optimization_project_spark.partitioned import (
        PartitionedTable,
    )

    def load(path):
        try:
            pt = PartitionedTable(spark, path)
            # a complete build has exactly create + 2 appends
            return pt if pt.versions()[-1] == 2 else None
        except Exception:
            return None

    def build(path, fp):
        import shutil as _shutil

        if os.path.isdir(path):  # crashed partial build
            _shutil.rmtree(path)
        db = _db(spark, sf_dir)
        pt = PartitionedTable.create(
            spark,
            db.table("orders").select("o_orderkey", "o_orderstatus",
                                      "o_totalprice"),
            path, "o_orderstatus", bloom_cols=["o_orderkey"])
        schema = "o_orderkey bigint, o_orderstatus string, " \
                 "o_totalprice double"
        pt.insert(_ldf(spark,
            [(900000001 + i, "X", 1.0) for i in range(20)], schema))
        pt.insert(_ldf(spark,
            [(910000001 + i, "X", 2.0) for i in range(20)], schema))
        return pt

    # same keying scheme as _build_or_load_index (kind, version,
    # source fingerprint → private per-uid /tmp dir); the loader
    # contract differs (a PartitionedTable has no fingerprint field —
    # the fingerprint-keyed PATH is the staleness check)
    import hashlib
    import time as _time

    from cs186_query_optimization_project_spark import metaio
    from cs186_query_optimization_project_spark.mview import _pid_alive

    fp = similarity.source_fingerprint(f"{sf_dir}/orders.parquet")
    parent = _ensure_private_dir(f"/tmp/spark_graft_lake_{os.getuid()}")
    key = hashlib.md5(
        f"orders_bloom|v{_LAKE_FIXTURE_VERSION}|{fp}".encode()
    ).hexdigest()[:12]
    path = os.path.join(parent, f"orders_bloom_{_tag(sf_dir)}_{key}")
    pt = load(path)
    if pt is not None:
        return pt
    # cross-process build lock (pid-content, dead-holder reclaim —
    # the mview refresh-lock discipline): without it a second process
    # that loads mid-build sees an incomplete version trail and
    # rmtrees the directory out from under the first builder
    lock = path + ".lock"
    deadline = _time.time() + 600
    while True:
        try:
            metaio.IO.publish_lock(lock, str(os.getpid()))
            break
        except FileExistsError:
            try:
                holder = int(metaio.IO.read_text(lock).strip())
            except (OSError, ValueError):
                holder = None  # mid-publish: treat as held
            if holder is not None and not _pid_alive(holder):
                try:
                    metaio.IO.remove(lock)
                except FileNotFoundError:
                    pass
                continue
            if _time.time() > deadline:
                raise RuntimeError(
                    f"fixture build lock '{lock}' stuck (held by "
                    f"pid {holder})")
            _time.sleep(0.5)
    try:
        pt = load(path)  # double-checked: the lock winner built it
        return pt if pt is not None else build(path, fp)
    finally:
        try:
            metaio.IO.remove(lock)
        except FileNotFoundError:
            pass


def _build_or_load_index(sf_dir, src_file: str, family: str, kind: str,
                         version: int, params: dict, loader, builder):
    """ONE build-or-load cache scheme for every materialized index
    (ANN tables, postings index).

    The directory name is keyed by (kind, version, build params, source
    fingerprint), under a per-uid 0700 parent (same reasoning as the
    stats cache, database.py): a changed corpus or changed parameters
    lands in a FRESH directory instead of overwriting one a concurrent
    prober may be reading, and no other local user can pre-create or
    poison the path.  Stale versions accumulate bounded garbage in /tmp,
    like the DML copy-on-write versions — a vacuum is a directory
    delete.  Repeated runs and separate driver subprocesses resolve the
    same key and reuse the same on-disk index.

    ``loader(path)`` returns the index handle or None; ``builder(path,
    fingerprint)`` materializes it.  Staleness = missing on disk OR a
    source fingerprint that no longer matches."""
    import hashlib
    import os

    fp = similarity.source_fingerprint(f"{sf_dir}/{src_file}")
    parent = _ensure_private_dir(
        f"/tmp/spark_graft_{family}_{os.getuid()}")
    key = hashlib.md5(f"{kind}|v{version}|{sorted(params.items())}|{fp}"
                      .encode()).hexdigest()[:12]
    path = os.path.join(parent, f"{kind}_{_tag(sf_dir)}_{key}")
    idx = loader(path)
    if idx is None or idx.source_fingerprint != fp:
        idx = builder(path, fp)
    return idx


def _ann_index(spark, sf_dir, kind: str) -> similarity.AnnIndex:
    """Build-or-load the materialized ANN index for this corpus (the
    shared :func:`_build_or_load_index` scheme)."""
    params = _ANN_PARAMS[kind]

    def build(path, fp):
        emb = _db(spark, sf_dir).table("embeddings")
        if kind == "lsh":
            return similarity.build_lsh_index(emb, path, fingerprint=fp,
                                              **params)
        if kind == "ivfpq":
            return similarity.build_ivfpq_index(emb, path, fingerprint=fp,
                                                **params)
        return similarity.build_ivf_index(emb, path, fingerprint=fp,
                                          **params)

    return _build_or_load_index(sf_dir, "embeddings.parquet", "ann",
                                kind, _ANN_INDEX_VERSION, params,
                                similarity.load_ann_index, build)


def q_embedding_ann_lsh(spark, sf_dir):
    """LSH-bucketed approximate top-k over a MATERIALIZED index.  The
    corpus is written once partitioned by signature (4 hyperplanes → 16
    buckets at sf0.01; at scale n_planes grows with
    log2(corpus/target_bucket_size)); the probe's filter on the partition
    column prunes the scan to one directory.  Fully oracle-checked: the
    hyperplanes are a deterministic seeded stream and DuckDB's
    list_dot_product reproduces the engine's projection fold bit-for-bit,
    so the oracle re-derives the bucket and the exact top-10 within it."""
    idx = _ann_index(spark, sf_dir, "lsh")
    return similarity.lsh_probe(spark, idx, _query_vec(spark, sf_dir), k=10)


def q_embedding_ann_ivf(spark, sf_dir):
    """IVF-flat ANN over a MATERIALIZED index.  The corpus is written
    once partitioned by nearest-centroid cell; the probe reads the 4
    nearest of 16 cells via partition pruning.  Fully oracle-checked:
    the portable-md5 centroid pick is re-derivable in SQL, so the oracle
    replays centroid selection, cell assignment (first-index tie-break),
    probe choice, and the exact top-10 end-to-end."""
    idx = _ann_index(spark, sf_dir, "ivf")
    return similarity.ivf_probe(spark, idx, _query_vec(spark, sf_dir),
                                k=10, n_probe=4)


def q_embedding_similar_pairs(spark, sf_dir):
    """Embedding near-dup pairs.  The synthetic corpus has no natural
    near-dups (max pairwise cosine ≈ 0.51), so plant perturbed copies of
    every 10th vector (first component +0.05, ids offset by 1e6) and
    find them via LSH buckets + cosine ≥ 0.9.  Oracle-checked: the
    planted perturbation is float-exact in SQL and the 6-plane bucket
    equality + rounded-cosine threshold reproduce the engine's pair set
    bit-for-bit."""
    db = _db(spark, sf_dir)
    emb = db.table("embeddings")
    planted = (emb.filter(F.col("vec_id") % 10 == 0)
               .select((F.col("vec_id") + 1000000).alias("vec_id"),
                       F.expr("transform(embedding, (x, i) -> "
                              "CASE WHEN i = 0 THEN x + CAST(0.05 AS FLOAT) "
                              "ELSE x END)").alias("embedding")))
    corpus = emb.select("vec_id", "embedding").unionByName(planted)
    return similarity.similar_pairs(corpus, threshold=0.9, n_planes=6)


def q_semantic_dedup(spark, sf_dir):
    """SemDeDup-style semantic dedup END TO END over the planted
    embedding corpus (:func:`q_embedding_similar_pairs`'s planting):
    LSH-bucketed cosine pairs → connected components → keep-one (min
    id), annotated with how many rows each survivor now represents.
    Every planted +1e6 copy must vanish and its source must report
    n_members=2; everything else survives as a singleton — the oracle
    replays pairs, CC and the anti-join in SQL and checks all 2,000
    survivor rows, not just the counts."""
    db = _db(spark, sf_dir)
    emb = db.table("embeddings")
    planted = (emb.filter(F.col("vec_id") % 10 == 0)
               .select((F.col("vec_id") + 1000000).alias("vec_id"),
                       F.expr("transform(embedding, (x, i) -> "
                              "CASE WHEN i = 0 THEN x + CAST(0.05 AS FLOAT) "
                              "ELSE x END)").alias("embedding")))
    corpus = emb.select("vec_id", "embedding").unionByName(planted)
    return (similarity.semantic_keep_one(corpus, threshold=0.9,
                                         n_planes=6)
            .orderBy("vec_id"))


# ===================================================================== #
# sketches / profiling / clustering / LM stats (round-6 batch 2)
# ===================================================================== #
def q_hll_distinct(spark, sf_dir):
    """From-scratch HyperLogLog (m=256) over orders' customer keys —
    1,500 distinct at sf0.01, the ~6-per-register regime where the
    harmonic estimator (not linear counting) carries the answer.  The
    oracle rebuilds the registers bit-for-bit from the portable hash,
    so the whole sketch — not just the headline number — is verified."""
    from cs186_query_optimization_project_spark.functions import sketches
    db = _db(spark, sf_dir)
    keys = db.table("orders").select(
        F.col("o_custkey").cast("string").alias("k"))
    return sketches.hll_distinct(keys, "k", m=256)


def q_hll_by_group(spark, sf_dir):
    """Per-group HLL: approximate distinct users per event type — the
    sketch replacement for grouped COUNT DISTINCT (exact shuffles
    every (group, user) pair; the sketch shuffles ≤ m register rows
    per group).  Register template shared with the global and
    streaming sketches, so the oracle rebuilds every group's registers
    bit-for-bit and re-derives the same estimates."""
    from cs186_query_optimization_project_spark.functions import sketches
    db = _db(spark, sf_dir)
    ev = db.table("events").select(
        "event_type", F.col("user_id").cast("string").alias("u"))
    return (sketches.hll_distinct_by(ev, "u", ["event_type"], m=256)
            .orderBy("event_type"))


def q_cms_heavy_hitters(spark, sf_dir):
    """Count-Min (d=3, w=2048) heavy hitters over document tokens, with
    the exact counts alongside: cms_estimate >= exact_count always, and
    at this vocab-to-width ratio they coincide — the oracle rebuilds
    the full counter grid and re-derives the same estimates."""
    from cs186_query_optimization_project_spark.functions import sketches
    db = _db(spark, sf_dir)
    toks = (db.table("documents")
            .select(F.explode(text.tokens("text")).alias("token"))
            .filter(F.col("token") != ""))
    return sketches.cms_heavy_hitters(toks, "token", k=20, d=3, w=2048)


def q_bloom_semi_join(spark, sf_dir):
    """Bloom-filter semi-join pruning: customers having a >495k order.
    The >495k filter keeps ~1% of orders (~9% of customers), so the
    adaptively-sized k=3 Bloom mask (the 16 Kbit floor at this key
    cardinality) prunes ~90% of the probe scan before any shuffle; the
    exact leftsemi join then removes false positives, so the result —
    and the oracle — is the plain EXISTS semi-join.
    tests/test_sketches_joins.py asserts the mask really prunes."""
    from cs186_query_optimization_project_spark.operators import joins
    db = _db(spark, sf_dir)
    big_orders = db.table("orders").filter(F.col("o_totalprice") > 495000)
    return (joins.bloom_semi_join(db.table("customer"), big_orders,
                                  "c_custkey", "o_custkey")
            .select("c_custkey", "c_name", "c_nationkey"))


def q_fuzzy_dedup_edit(spark, sf_dir):
    """Edit-distance fuzzy dedup, the textbook two-stage pipeline:
    exact-canonicalize first (identical strings collapse to their min
    id — part names are heavily duplicated, and pairing them raw would
    be an n² clique per repeated string), then Levenshtein-link the
    distinct strings inside (length-bucket, 2-char-prefix) blocks.
    Typos planted: every 50th part name gets a 3rd-char -> 'x' copy.
    JVM levenshtein, bounded quadratic — never all-pairs."""
    db = _db(spark, sf_dir)
    part = db.table("part")
    planted = (part.filter(F.col("p_partkey") % 50 == 0)
               .select((F.col("p_partkey") + 1000000).alias("p_partkey"),
                       F.expr("concat(substr(p_name, 1, 2), 'x', "
                              "substr(p_name, 4))").alias("p_name")))
    corpus = part.select("p_partkey", "p_name").unionByName(planted)
    canonical = (corpus.groupBy("p_name")
                 .agg(F.min("p_partkey").alias("p_partkey")))
    return dedup.edit_distance_pairs(canonical, "p_name", "p_partkey",
                                     max_distance=2, prefix_len=2)


def q_kmeans_clusters(spark, sf_dir):
    """One Lloyd iteration of k-means (k=8, frozen splitmix64 init)
    over the embeddings, reported as per-cluster size + mean squared
    distance.  Assignment distances round to 6 decimals before the
    argmin and updated centroids publish at 6-decimal precision, which
    is what makes a cross-engine SQL replay of a *floating-point
    iterative* algorithm hash-exact."""
    db = _db(spark, sf_dir)
    return similarity.kmeans_summary(db.table("embeddings"),
                                     k=8, n_iter=1, seed=42)


def q_doc_logprob(spark, sf_dir):
    """Mean unigram log-probability per document under the corpus's own
    empirical distribution — the cheap perplexity-style quality signal
    (explode + Zipf-bounded vocab join, no Python)."""
    db = _db(spark, sf_dir)
    return text.unigram_logprob(db.table("documents"))


def q_bigram_lm(spark, sf_dir):
    """Corpus bigram conditional-probability table, top 50 by count:
    p(next|first) from zip_with'd shifted slices — the n-gram LM
    statistic a pretraining pipeline derives corpus-wide."""
    db = _db(spark, sf_dir)
    return (text.bigram_counts(db.table("documents"), min_count=2)
            .orderBy(F.col("pair_count").desc(), F.col("bigram").asc())
            .limit(50))


def q_key_skew(spark, sf_dir):
    """Join-key skew profile of orders.o_custkey: one groupBy-count
    pass (the shuffle the real join would pay, carrying only counts)
    collapsed to max/avg ratio + hot-key census."""
    from cs186_query_optimization_project_spark.functions import profiling
    db = _db(spark, sf_dir)
    return profiling.key_skew(db.table("orders"), "o_custkey",
                              hot_factor=2.0)


def q_mad_outliers(spark, sf_dir):
    """Robust outliers by MEDIAN/MAD (``profiling.mad_outliers`` —
    Iglewicz–Hoaglin modified z-score, 50% breakdown point): the
    heavy-tail-safe complement of ``zscore_outliers``, immune to the
    masking where extreme values inflate the very stddev meant to
    flag them.  Same two-pass broadcast shape (per-group median, then
    per-group MAD of absolute deviations, each a tiny exact-percentile
    aggregate broadcast back — no window sort).  The oracle replays
    both medians with quantile_cont, which interpolates identically
    to Spark's exact percentile."""
    from cs186_query_optimization_project_spark.functions import profiling

    db = _db(spark, sf_dir)
    ev = db.table("events").select("event_id", "event_type", "value")
    return (profiling.mad_outliers(ev, "value", "event_type",
                                   threshold=3.5)
            .orderBy("event_id"))


def q_zscore_outliers(spark, sf_dir):
    """Rows >3 population-sigma from their group mean (events.value by
    event_type): broadcast per-group stats + re-scan, no window sort."""
    from cs186_query_optimization_project_spark.functions import profiling
    db = _db(spark, sf_dir)
    ev = db.table("events").select("event_id", "event_type", "value")
    return (profiling.zscore_outliers(ev, "value", "event_type",
                                      threshold=3.0)
            .orderBy("event_id"))


def q_weighted_sample(spark, sf_dir):
    """Deterministic weighted Bernoulli sample of orders (p proportional
    to o_totalprice, rate 0.2): membership = portable-hash uniform vs
    weight threshold, independent of partition layout — reproducible on
    any cluster shape, and exactly replayable in SQL."""
    db = _db(spark, sf_dir)
    return (sampling.weighted_sample(db.table("orders"), "o_totalprice",
                                     "o_orderkey", rate=0.2)
            .select("o_orderkey", "o_totalprice"))


def q_streaming_hll(spark, sf_dir):
    """Streaming distinct-users-per-hour via HyperLogLog registers —
    exact streaming COUNT(DISTINCT) is not incrementally maintainable
    (state = the full key set per window; Spark rejects it), but HLL
    registers are a plain max aggregate: ≤ m rows of state per open
    window, watermark-bounded.  The memory-sink register table is
    collapsed to per-window estimates batch-side; the oracle rebuilds
    registers AND estimates from the same portable hash in SQL."""
    from cs186_query_optimization_project_spark.functions import sketches
    name = "stream_hll_" + _tag(sf_dir)
    events = stream_windows.stream_events(spark,
                                          f"{sf_dir}/events.parquet")
    regs = stream_windows.hll_window_registers(events, window="1 hour",
                                               watermark="2 hours",
                                               key_col="user_id", m=256)
    stream_windows.run_to_memory(regs, name, output_mode="complete",
                                 shuffle_partitions=8)
    est = sketches.hll_estimate(
        spark.table(name).select("window_start", "register", "rho"),
        m=256, group_cols=["window_start"])
    return est.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss")
        .alias("window_start"),
        "m", "filled_registers", "estimate")


def q_hll_reconcile(spark, sf_dir):
    """Lambda-architecture sketch reconciliation (the SCALE.md claim as
    a checked query): a BATCH HLL sketch over events before 2024-01-16
    and a STREAMED per-window HLL sketch over events from 2024-01-16 on
    merge by plain groupBy-max into one sketch — bit-identical to the
    single-pass sketch over the whole table, because register-max merge
    is associative and both paths build registers from the same
    portable-hash template (sketches.hll_register_sql).  Output pins
    the claim: the merged estimate, the exact distinct count, and
    ``registers_match`` = (merged register table == single-pass
    register table, via symmetric exceptAll).  The oracle replays the
    single-pass sketch in SQL and asserts TRUE."""
    from cs186_query_optimization_project_spark.functions import sketches
    cutoff = "2024-01-16 00:00:00"
    db = _db(spark, sf_dir)
    # ONE events pass yields BOTH register tables (same
    # hll_register_sql template): per register, max(rho) over all rows
    # is the single-pass sketch and max(rho) over ts<cutoff rows is the
    # batch half — max over a subset matches the subset-groupBy exactly
    # (registers absent from the subset surface as NULL and are
    # filtered, matching occupied-registers-only output).  Previously
    # two scan+aggregate passes, re-executed per plan reference.
    register, rho = sketches.hll_register_sql(
        "cast(user_id as string)", 256)
    regs_both = (db.table("events")
                 .select(F.expr(register).alias("register"),
                         F.expr(rho).alias("__rho"),
                         (F.col("ts") < cutoff).alias("__pre"))
                 .groupBy("register")
                 .agg(F.max("__rho").alias("__full_rho"),
                      F.max(F.when(F.col("__pre"), F.col("__rho")))
                      .alias("__batch_rho"))
                 .localCheckpoint())
    batch_regs = (regs_both.filter(F.col("__batch_rho").isNotNull())
                  .select("register",
                          F.col("__batch_rho").alias("rho")))
    name = "stream_reconcile_" + _tag(sf_dir)
    events = stream_windows.stream_events(spark,
                                          f"{sf_dir}/events.parquet")
    regs = stream_windows.hll_window_registers(
        events.filter(F.col("ts") >= cutoff), window="1 hour",
        watermark="2 hours", key_col="user_id", m=256)
    stream_windows.run_to_memory(regs, name, output_mode="complete",
                                 shuffle_partitions=8)
    stream_regs = (spark.table(name)
                   .groupBy("register").agg(F.max("rho").alias("rho")))
    # merged is referenced three times (two exceptAll directions + the
    # estimate); materialize its ≤ 256 rows once.  full_regs' two
    # references read the checkpointed single-pass aggregate.
    merged = (batch_regs.unionByName(stream_regs)
              .groupBy("register").agg(F.max("rho").alias("rho"))
              .localCheckpoint())
    full_regs = regs_both.select("register",
                                 F.col("__full_rho").alias("rho"))
    match = (merged.exceptAll(full_regs)
             .unionByName(full_regs.exceptAll(merged))
             .agg((F.count(F.lit(1)) == 0).alias("registers_match")))
    exact = db.table("events").agg(
        F.count_distinct("user_id").alias("exact_distinct"))
    return (sketches.hll_estimate(merged, m=256)
            .crossJoin(exact).crossJoin(match)
            .select("m", "filled_registers", "estimate", "exact_distinct",
                    F.round(F.abs(F.col("estimate")
                                  - F.col("exact_distinct"))
                            / F.col("exact_distinct"), 4)
                    .alias("rel_error"),
                    "registers_match"))


def q_cms_reconcile(spark, sf_dir):
    """Lambda reconciliation, Count-Min half (hll_reconcile's sibling):
    the batch CMS grid over events before 2024-01-16 and the streamed
    per-window grid over events from then on merge by CELL-WISE SUM
    into a grid identical to the single-pass grid over the whole table
    (counts are additive over a disjoint split; both paths hash with
    the same row-salted portable template).  Output probes ten watched
    users against the MERGED grid with exact counts alongside, plus
    ``grids_match`` pinned by symmetric exceptAll; the oracle replays
    the single-pass grid and probe in SQL and asserts TRUE."""
    from cs186_query_optimization_project_spark.functions import sketches
    cutoff = "2024-01-16 00:00:00"
    db = _db(spark, sf_dir)
    # ONE events pass yields BOTH grids (same _cms_idx cell template
    # as sketches.cms_counters): per cell, the all-rows count is the
    # single-pass grid and the ts<cutoff count is the batch half —
    # exact integer counts over a disjoint split, so the values are
    # identical to two independent cms_counters passes (previously 2
    # scan+explode+aggregate passes, re-executed per plan reference)
    key = "cast(user_id as string)"
    cells = F.array(*[
        F.struct(F.lit(r).alias("row"),
                 F.expr(sketches._cms_idx(key, r, 2048)).cast("int")
                 .alias("idx"))
        for r in range(3)])
    grids = (db.table("events")
             .select((F.col("ts") < cutoff).alias("__pre"),
                     F.explode(cells).alias("c"))
             .groupBy(F.col("c.row").alias("row"),
                      F.col("c.idx").alias("idx"))
             .agg(F.count(F.lit(1)).alias("__full"),
                  F.sum(F.col("__pre").cast("long")).alias("__batch"))
             .localCheckpoint())
    batch_grid = (grids.filter(F.col("__batch") > 0)
                  .select("row", "idx", F.col("__batch").alias("cnt")))
    name = "stream_cms_rec_" + _tag(sf_dir)
    events = stream_windows.stream_events(spark,
                                          f"{sf_dir}/events.parquet")
    grid = stream_windows.cms_window_counters(
        events.filter(F.col("ts") >= cutoff), window="1 hour",
        watermark="2 hours", key_col="user_id", d=3, w=2048)
    stream_windows.run_to_memory(grid, name, output_mode="complete",
                                 shuffle_partitions=8)
    stream_grid = (spark.table(name)
                   .groupBy("row", "idx").agg(F.sum("cnt").alias("cnt")))
    # materialize the merged grid once (≤ d·w = 6144 rows): the
    # returned plan references it three times (both exceptAll
    # directions + the probe broadcast) — without the checkpoint every
    # reference re-runs the merge; full_grid's two references read the
    # already-checkpointed single-pass grid
    merged = (batch_grid.unionByName(stream_grid)
              .groupBy("row", "idx").agg(F.sum("cnt").alias("cnt"))
              .localCheckpoint())
    full_grid = grids.select("row", "idx", F.col("__full").alias("cnt"))
    match = (merged.exceptAll(full_grid)
             .unionByName(full_grid.exceptAll(merged))
             .agg((F.count(F.lit(1)) == 0).alias("grids_match")))
    keys = spark.range(10).select(F.col("id").cast("string").alias("k"))
    est = sketches.cms_point_estimates(merged, keys, "k", d=3, w=2048)
    exact = (db.table("events").filter(F.col("user_id") < 10)
             .groupBy(F.col("user_id").cast("string").alias("k"))
             .agg(F.count(F.lit(1)).alias("exact_count")))
    return (est.join(exact, "k", "left")
            .crossJoin(F.broadcast(match))
            .select(F.col("k").cast("bigint").alias("user_id"),
                    F.col("cms_estimate").cast("bigint")
                    .alias("cms_estimate"),
                    F.coalesce("exact_count", F.lit(0)).cast("bigint")
                    .alias("exact_count"),
                    "grids_match")
            .orderBy("user_id"))


def q_mixture_sample(spark, sf_dir):
    """Training-mixture composition to TARGET PROPORTIONS (50% src0,
    25% src1, 25% src2): rates are DERIVED from the targets and the
    observed per-domain counts, capped by the scarcest domain (src0
    binds at rate 1.0 — it must supply half the output from 1/20 of a
    uniform corpus).  Membership is the portable md5 uniform, so the
    whole pipeline — counts, cap, rates, coin flips — replays in SQL.
    The contract weights sum to exactly 1.0 in binary (0.5 + 0.25 +
    0.25), so normalization is bit-exact across engines."""
    from cs186_query_optimization_project_spark.functions import sampling
    db = _db(spark, sf_dir)
    return (sampling.mixture_sample(
                db.table("documents"), "source",
                {"src0": 0.5, "src1": 0.25, "src2": 0.25}, "doc_id")
            .select("doc_id", "source"))


def q_sample_k_per_group(spark, sf_dir):
    """Exact-5 deterministic docs per language: md5-uniform order
    statistics within each stratum, two-phase (broadcast-count hash
    pre-prune, then a row_number over the surviving sliver).  Both
    phases replay in the oracle, so the exact ids AND ranks are
    value-checked."""
    from cs186_query_optimization_project_spark.functions import sampling
    db = _db(spark, sf_dir)
    return (sampling.sample_k_per_group(
                db.table("documents").select("doc_id", "lang"),
                "lang", "doc_id", k=5)
            .select("doc_id", "lang", "rk"))


def q_mixture_temperature(spark, sf_dir):
    """Temperature-flattened (tau=2, alpha=0.5) language rebalance of
    the corpus: en is ~3x fr in the raw data, so en keeps
    sqrt(c_fr/c_en) of its rows while fr keeps everything — the
    multilingual-pretraining mixture.  alpha=0.5 keeps every rate in
    IEEE-exact sqrt/divide arithmetic, so the oracle replays counts,
    rates and md5 coin flips bit-for-bit."""
    from cs186_query_optimization_project_spark.functions import sampling
    db = _db(spark, sf_dir)
    return (sampling.temperature_mixture(
                db.table("documents"), "lang", "doc_id", alpha=0.5)
            .select("doc_id", "lang"))


def q_epoch_shuffle(spark, sf_dir):
    """Deterministic epoch-1 reshuffle of the corpus into 8 shards:
    (shard, pos) is a pure function of md5('1::' || doc_id) with id
    tie-break — reproducible without RNG state, re-keyed per epoch.
    One hash shuffle + per-shard sort (the shard-materialization shape
    at 100 TB); the oracle replays shard and row_number in SQL."""
    from cs186_query_optimization_project_spark.functions import packing
    db = _db(spark, sf_dir)
    return (packing.epoch_shuffle(db.table("documents"), "doc_id",
                                  n_shards=8, epoch=1)
            .select("doc_id", "shard", "pos"))


def q_phrase_search(spark, sf_dir):
    """Exact positional phrase search ('slow hash batch') over the
    inverted postings table — each phrase term joins on (doc, pos + i),
    all equi-joins over single-term posting lists."""
    from cs186_query_optimization_project_spark.functions import retrieval
    db = _db(spark, sf_dir)
    return retrieval.phrase_search(db.table("documents"),
                                   "slow hash batch")


_POSTINGS_INDEX_VERSION = 2   # v2: manifest-versioned PartitionedTables


def _postings_index(spark, sf_dir):
    """Build-or-load the materialized postings index for this corpus
    (the shared :func:`_build_or_load_index` scheme)."""
    from cs186_query_optimization_project_spark.functions import retrieval

    params = {"n_buckets": 64}

    def build(path, fp):
        docs = _db(spark, sf_dir).table("documents")
        return retrieval.build_postings_index(docs, path, fingerprint=fp,
                                              **params)

    return _build_or_load_index(sf_dir, "documents.parquet", "postings",
                                "post", _POSTINGS_INDEX_VERSION, params,
                                retrieval.load_postings_index, build)


def q_phrase_indexed(spark, sf_dir):
    """:func:`q_phrase_search` against the MATERIALIZED postings index:
    postings written once hive-partitioned by token-hash bucket
    (portable md5 routing), the query reads only its terms' bucket
    directories via partition pruning — identical output, so it shares
    the phrase_search oracle.  tests/test_retrieval_index.py asserts
    the PartitionFilters really prune."""
    from cs186_query_optimization_project_spark.functions import retrieval
    idx = _postings_index(spark, sf_dir)
    return retrieval.phrase_search_indexed(spark, idx, "slow hash batch")


def q_bm25_indexed(spark, sf_dir):
    """:func:`q_bm25_search` against the MATERIALIZED postings index:
    term frequencies from the pruned postings scan, doc lengths from
    the build-time sidecar, N/avgdl as index constants — no query-time
    corpus aggregate.  Identical ranking, so it shares the bm25_search
    oracle."""
    from cs186_query_optimization_project_spark.functions import retrieval
    idx = _postings_index(spark, sf_dir)
    return retrieval.bm25_indexed(spark, idx, "hash batch window",
                                  top_k=10)


def q_bm25_incremental(spark, sf_dir):
    """INCREMENTAL postings-index maintenance
    (``retrieval.postings_append`` — new docs commit as additional
    manifest-versioned files inside the existing token buckets, doc
    lengths append alongside, and N/avgdl update incrementally:
    O(new docs) growth, no rebuild, no corpus re-aggregate; round 14
    put both tables on PartitionedTable manifests with the meta
    publish pinning versions LAST, so appends are crash-safe and
    exactly-once-retryable).  Builds on the ``doc_id % 5 != 0``
    four-fifths, appends the held-out fifth, then runs the standard
    BM25 query against the APPENDED index.  In-entry contracts raise
    (must survive ``python -O``): (a) a reader handle loaded BEFORE
    the append keeps scoring the pre-append snapshot while the
    append commits (manifest snapshot isolation); (b) the appended
    index's ranking equals ``bm25_scores`` over the full corpus
    exactly (scores AND order).  Shares the bm25_search oracle —
    identical ranking is the whole claim."""
    from cs186_query_optimization_project_spark.functions import retrieval

    db = _db(spark, sf_dir)
    docs = db.table("documents")
    with _scratch_base("bm25inc", sf_dir) as base:
        idx = retrieval.build_postings_index(
            docs.filter(F.col("doc_id") % 5 != 0), f"{base}/idx",
            n_buckets=16)
        # concurrent-reader contract (round 14): a handle loaded
        # BEFORE the append stays pinned to its table versions and
        # constants — scoring against the pre-append snapshot even
        # while the append commits (manifest snapshot isolation)
        reader = retrieval.load_postings_index(f"{base}/idx")
        pre = [tuple(r) for r in retrieval.bm25_indexed(
            spark, reader, "hash batch window", top_k=10).collect()]
        idx = retrieval.postings_append(
            spark, idx, docs.filter(F.col("doc_id") % 5 == 0))
        pinned = [tuple(r) for r in retrieval.bm25_indexed(
            spark, reader, "hash batch window", top_k=10).collect()]
        if pinned != pre or reader.postings_version \
                >= idx.postings_version:
            raise RuntimeError(
                "pre-append reader saw the append — version pinning "
                "lost snapshot isolation")
        got = retrieval.bm25_indexed(spark, idx, "hash batch window",
                                     top_k=10).localCheckpoint()
        want = retrieval.bm25_scores(docs, "hash batch window",
                                     top_k=10)
        if [tuple(r) for r in got.collect()] != \
                [tuple(r) for r in want.collect()]:
            raise RuntimeError(
                "appended index ranks differently from full-corpus "
                "BM25 — incremental maintenance diverged")
    return got


def q_bm25_remove(spark, sf_dir):
    """BOTH deletion tiers of the postings-index maintenance
    lifecycle.  Tier 1 — rewrite (``retrieval.postings_remove``):
    survivors of the ``doc_id % 7 == 0`` seventh rewrite through one
    versioned ``overwrite_partitions`` commit per table, corpus
    constants update incrementally from the doomed docs' recorded
    lengths, meta publishes last.  Tier 2 — tombstone
    (``retrieval.postings_remove_soft``, the zero-rewrite high-churn
    path the rewrite's cost note names): the ``doc_id % 70 == 1``
    slice of the survivors soft-deletes via ``PartitionedTable
    .delete_soft`` IN-list tombstones (O(1) data movement), then
    ``postings_optimize`` MATERIALIZES the tombstones (rewrite reads
    through them, reclaiming the masked rows) — rankings must be
    identical before and after.  In-entry contracts raise (must
    survive ``python -O``): (a) rewrite-tier constants equal the
    survivor corpus's exactly; (b) a reader handle loaded BEFORE the
    deletes still reads the intact pre-delete doc-length table
    (version pinning); (c) the single-writer staleness guard fires —
    a handle the soft delete published past raises ValueError;
    (d) soft-tier constants decrement exactly by the tombstoned
    docs; (e) optimize preserves the soft ranking byte-for-byte and
    the constants bit-for-bit.  The oracle replays BM25 over the
    doubly-surviving documents from scratch — the soft-deleted index
    ranking identically to a from-scratch survivor build is the
    tombstone tier's whole claim."""
    from cs186_query_optimization_project_spark.functions import retrieval

    db = _db(spark, sf_dir)
    docs = db.table("documents")
    with _scratch_base("bm25rm", sf_dir) as base:
        idx = retrieval.build_postings_index(docs, f"{base}/idx",
                                             n_buckets=16)
        pre_reader = retrieval.load_postings_index(f"{base}/idx")
        out = retrieval.postings_remove(
            spark, idx, docs.filter(F.col("doc_id") % 7 == 0)
            .select("doc_id"))
        surv = docs.filter(F.col("doc_id") % 7 != 0)
        n_surv = surv.filter(F.length(F.trim("text")) > 0).count()
        if out.n_docs != n_surv:
            raise RuntimeError(
                f"post-delete n_docs {out.n_docs} != survivor count "
                f"{n_surv} — incremental constant update diverged")
        # tombstone tier: a bounded id batch (the predicate is
        # driver-side manifest metadata — the high-churn shape)
        ids_b = sorted(r[0] for r in docs
                       .filter(F.col("doc_id") % 70 == 1)
                       .select("doc_id").collect())
        if not ids_b:
            raise RuntimeError(
                "empty tombstone test slice — the contracts below "
                "assume doc_id % 70 == 1 matches at every SF")
        soft = retrieval.postings_remove_soft(spark, out, ids_b)
        try:
            retrieval.postings_remove_soft(spark, out, ids_b)
            raise RuntimeError(
                "stale-handle guard did not fire: a soft delete from "
                "a handle the first soft delete published past was "
                "accepted")
        except ValueError:
            pass                      # the guard the contract pins
        # docs with zero tokens never entered the index (no doclen
        # row), so the expected decrement counts tokenful docs only —
        # the same convention the rewrite tier's n_surv uses
        n_b = docs.filter((F.col("doc_id") % 70 == 1)
                          & (F.length(F.trim("text")) > 0)).count()
        if soft.n_docs != out.n_docs - n_b:
            raise RuntimeError(
                f"soft-delete n_docs {soft.n_docs} != "
                f"{out.n_docs} - {n_b} — tombstone-tier constant "
                "update diverged")
        if retrieval.doclen_table(spark, pre_reader).count() \
                != idx.n_docs:
            raise RuntimeError(
                "pre-delete reader saw the deletes — version pinning "
                "lost snapshot isolation")
        soft_rank = [tuple(r) for r in retrieval.bm25_indexed(
            spark, soft, "hash batch window", top_k=10).collect()]
        opt = retrieval.postings_optimize(spark, soft)
        if (opt.n_docs, opt.avgdl) != (soft.n_docs, soft.avgdl):
            raise RuntimeError(
                "optimize changed the corpus constants — tombstone "
                "materialization must be rank/constant-neutral")
        got = retrieval.bm25_indexed(spark, opt, "hash batch window",
                                     top_k=10).localCheckpoint()
        if [tuple(r) for r in got.collect()] != soft_rank:
            raise RuntimeError(
                "optimize changed the BM25 ranking — tombstone "
                "materialization diverged from the soft reads")
    return got


def q_hadoop_lifecycle(spark, sf_dir):
    """The FULL lakehouse DML lifecycle with every metadata operation
    routed through the Hadoop-FS backend (``metaio.use_hadoop_io`` —
    the cluster deployment configuration, round 14): create a
    partitioned table, versioned insert + delete commits, snapshot
    read, version-0 time travel, and (round 15) a shallow CLONE —
    whose registry publish exercises the backend's ``replace_text``
    (tmp + ``FileContext.rename(OVERWRITE)`` with pre-rename checksum
    -sidecar cleanup) — all with manifests / stats sidecars /
    tombstones flowing through the JVM
    ``org.apache.hadoop.fs.FileSystem`` instead of POSIX calls.  The
    local seam is restored in ``finally`` (other entries are
    untouched even if this one throws).  In-entry contracts raise
    (must survive ``python -O``): the swap really happened (the seam
    instance is the Hadoop class during the lifecycle), three
    versions committed, and version-0 time travel still reads the
    pre-DML snapshot.  The oracle replays the insert + delete in SQL
    — identical final content through either backend is the claim."""
    from cs186_query_optimization_project_spark import metaio
    from cs186_query_optimization_project_spark.partitioned import (
        PartitionedTable,
    )

    db = _db(spark, sf_dir)
    nation = db.table("nation").select("n_nationkey", "n_name",
                                       "n_regionkey")
    n0 = nation.count()
    saved = metaio.IO
    with _scratch_base("hio", sf_dir) as base:
        try:
            installed = metaio.use_hadoop_io(spark)
            if metaio.IO is not installed or \
                    not isinstance(metaio.IO, metaio.HadoopMetadataIO):
                raise RuntimeError("use_hadoop_io did not install the "
                                   "Hadoop backend")
            pt = PartitionedTable.create(spark, nation, f"{base}/t",
                                         "n_regionkey")
            pt.insert(_ldf(spark,
                [(100, "ATLANTIS", 0), (101, "ELDORADO", 1)],
                "n_nationkey int, n_name string, n_regionkey int"))
            pt.delete(F.col("n_nationkey").between(10, 14))
            if pt.versions() != [0, 1, 2]:
                raise RuntimeError(
                    f"expected 3 hadoop-backend commits, got "
                    f"{pt.versions()}")
            if pt.read(version=0).count() != n0:
                raise RuntimeError("hadoop-backend time travel lost "
                                   "the pre-DML snapshot")
            # shallow clone through the backend: registering the
            # clone publishes the source's _clones.json via
            # replace_text — the FileContext.rename(OVERWRITE) +
            # checksum-sidecar-cleanup path — and the clone must
            # read the full post-DML snapshot back (round 15)
            cl = pt.clone(f"{base}/c")
            if cl.read().count() != pt.read().count():
                raise RuntimeError("hadoop-backend shallow clone "
                                   "diverged from its source snapshot")
            out = (pt.read()
                   .select("n_nationkey", "n_name", "n_regionkey")
                   .localCheckpoint())
        finally:
            metaio.IO = saved
    return out


def q_bm25_search(spark, sf_dir):
    """BM25 top-10 for the keyword query 'hash batch window' — the
    keyword-retrieval half of a RAG stack (Lucene non-negative IDF,
    k1=1.2, b=0.75); postings filtered to the query's terms before any
    aggregation, scores rounded before ranking with id tie-break."""
    from cs186_query_optimization_project_spark.functions import retrieval
    db = _db(spark, sf_dir)
    return retrieval.bm25_scores(db.table("documents"),
                                 "hash batch window", top_k=10)


def q_hybrid_search(spark, sf_dir):
    """Hybrid RAG retrieval: reciprocal-rank fusion (c=60) of the BM25
    keyword ranking for 'hash batch window' and the exact
    embedding-cosine ranking to doc 0's vector — top-10 by
    ``Σ 1/(60+rank)``.  Both constituent rankings already have exact
    SQL replays (the bm25_search and embedding_topk oracles), so the
    fused ranking is fully oracle-checked too: ranks are integers and
    the fusion arithmetic is two IEEE divisions + a 6-decimal round."""
    from cs186_query_optimization_project_spark.functions import retrieval
    db = _db(spark, sf_dir)
    return retrieval.hybrid_rrf(db.table("documents"),
                                db.table("embeddings"),
                                "hash batch window",
                                _query_vec(spark, sf_dir), k=10)


def q_dedup_incremental(spark, sf_dir):
    """Incremental ingest dedup: an incoming batch (the perturbed
    copies from the shared planting) is near-dup-checked against the
    existing corpus WITHOUT re-comparing the corpus to itself — the
    batch's LSH bands join the corpus's bands cross-set only.  The
    oracle is the full union pipeline's pair set restricted to
    corpus×batch pairs, proving the incremental path finds exactly the
    cross-set subset."""
    db = _db(spark, sf_dir)
    docs = db.table("documents").select("doc_id", "text")
    # the batch = the perturbed half of the SHARED planting: derive it
    # from _planted_docs so the plant constants live in one place
    batch = _planted_docs(db).filter(F.col("doc_id") >= 1000000)
    pairs = dedup.incremental_near_duplicates(docs, batch,
                                              threshold=0.5)
    return pairs.select("a", "b", F.round("jaccard", 6).alias("jaccard"))


def q_ann_recall(spark, sf_dir):
    """Recall@10 of the LSH-ANN probe against the exact brute-force
    top-10 — the accuracy side of the ANN speed/recall trade, measured
    in-engine (companion of dedup_eval: every approximate operator
    ships with its evaluation harness).  The oracle recomputes BOTH
    retrievals and the overlap from its own SQL re-encodings."""
    idx = _ann_index(spark, sf_dir, "lsh")
    ann = similarity.lsh_probe(spark, idx, _query_vec(spark, sf_dir),
                               k=10).select("vec_id")
    db = _db(spark, sf_dir)
    exact = similarity.cosine_topk(db.table("embeddings"),
                                   _query_vec(spark, sf_dir),
                                   k=10).select("vec_id")
    return (exact.join(ann, "vec_id")
            .agg(F.count(F.lit(1)).alias("__o"))
            .select(F.lit(10).alias("k"),
                    F.col("__o").cast("long").alias("n_overlap"),
                    F.round(F.col("__o") / 10.0, 4).alias("recall")))


def q_streaming_cms(spark, sf_dir):
    """Streaming per-hour Count-Min frequency tracking of ten watched
    users: the grid (≤ d·w cells of state per open window) maintains
    incrementally as a plain streaming count aggregate; the probe is a
    batch min-over-rows against each user's 3 cell positions, with
    missing cells counting 0 (a cell no key hashed into is an exact
    zero).  The oracle rebuilds grid and probe from the portable hash."""
    from cs186_query_optimization_project_spark.functions.sketches import (
        _cms_idx,
    )
    name = "stream_cms_" + _tag(sf_dir)
    events = stream_windows.stream_events(spark,
                                          f"{sf_dir}/events.parquet")
    grid = stream_windows.cms_window_counters(events, window="1 hour",
                                              watermark="2 hours",
                                              key_col="user_id",
                                              d=3, w=2048)
    stream_windows.run_to_memory(grid, name, output_mode="complete",
                                 shuffle_partitions=8)
    stored = spark.table(name)
    windows_df = (stored.select(F.col("window_start").alias("__w"))
                  .distinct())
    probes = (spark.range(10).select(F.col("id").alias("user_id"))
              .select("user_id", F.explode(F.array(*[
                  F.struct(F.lit(r).alias("row"),
                           F.expr(_cms_idx("cast(user_id as string)",
                                           r, 2048))
                           .cast("int").alias("idx"))
                  for r in range(3)])).alias("p"))
              .select("user_id", "p.row", "p.idx")
              .crossJoin(F.broadcast(windows_df)))
    grid = stored.select(F.col("window_start").alias("__gw"),
                         F.col("row").alias("__gr"),
                         F.col("idx").alias("__gi"), "cnt")
    est = (probes.join(grid,
                       (probes["__w"] == grid["__gw"])
                       & (probes["row"] == grid["__gr"])
                       & (probes["idx"] == grid["__gi"]), "left")
           .groupBy(F.col("__w").alias("window_start"),
                    F.col("user_id"))
           .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0)))
                .cast("long").alias("cms_estimate")))
    return est.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss")
        .alias("window_start"), "user_id", "cms_estimate")


def q_similar_docs(spark, sf_dir):
    """"More like this" retrieval: top-10 documents by exact shingle
    Jaccard to document 7 — the query-time one-vs-all complement of the
    corpus-wide near-dup pair detectors.  The query doc's shingle set
    broadcasts; only shingle-sharing docs are scored."""
    from cs186_query_optimization_project_spark.functions import retrieval
    db = _db(spark, sf_dir)
    return retrieval.similar_docs(db.table("documents"), query_id=7,
                                  k=10)


def q_dedup_apply(spark, sf_dir):
    """The dedup pipeline's OUTPUT: the planted corpus with near-dup
    cluster non-representatives removed (keep-one = min id; untouched
    singletons survive).  Composes the pair detector and connected
    components into the materialized clean corpus — clustering says
    who matches, this entry actually drops them."""
    db = _db(spark, sf_dir)
    corpus = _planted_docs(db)
    pairs = dedup.ngram_jaccard_pairs(corpus, threshold=0.6)
    clusters = dedup.duplicate_clusters(pairs)
    losers = (clusters.filter(F.col("doc_id") != F.col("cluster_id"))
              .select("doc_id"))
    return (corpus.join(losers, "doc_id", "left_anti")
            .select("doc_id",
                    text.token_count("text").alias("n_tokens"))
            .orderBy("doc_id"))


def q_ks_drift(spark, sf_dir):
    """Two-sample Kolmogorov–Smirnov drift statistic on document
    lengths between single-digit sources (src0–src9) and double-digit
    ones (src10–src19) — the bin-free complement to psi_drift.  Counts
    per distinct value, one running-sum window over the value domain,
    one scalar max of the ECDF gap."""
    from cs186_query_optimization_project_spark.functions import profiling
    docs = _db(spark, sf_dir).table("documents")
    a = docs.filter(F.length("source") == 4)
    b = docs.filter(F.length("source") == 5)
    return profiling.ks_drift(a, b, "n_chars")


def q_psi_drift(spark, sf_dir):
    """Population-stability-index drift check of o_totalprice between
    the first and second half of the order history — the train-vs-serve
    distribution monitor.  Shared equal-width bins from the union's
    min/max (the table_histogram binning contract), per-bin PSI terms."""
    from cs186_query_optimization_project_spark.functions import profiling
    db = _db(spark, sf_dir)
    orders = db.table("orders")
    early = orders.filter(F.col("o_orderdate") < "1998-05-01")
    late = orders.filter(F.col("o_orderdate") >= "1998-05-01")
    return profiling.psi_drift(early, late, "o_totalprice", n_bins=10)


def q_correlation_matrix(spark, sf_dir):
    """Pairwise Pearson correlations of lineitem's numeric measures —
    all six corr aggregates in ONE scan (map-side partials), unpivoted
    to (col_a, col_b, corr) rows."""
    from cs186_query_optimization_project_spark.functions import profiling
    db = _db(spark, sf_dir)
    return profiling.correlation_matrix(
        db.table("lineitem"),
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"])


def q_dedup_eval(spark, sf_dir):
    """Evaluation harness for the near-dup detector: precision/recall
    of the MinHash-LSH pair set against the planted ground truth
    (doc -> doc+1e6 perturbed copies).  One full-outer pair join + one
    scalar aggregate; the oracle recomputes the metrics from its own
    SQL re-encoding of the MinHash pipeline — detector AND scorer are
    both replayed."""
    db = _db(spark, sf_dir)
    corpus = _planted_docs(db)
    pred = dedup.minhash_near_duplicates(corpus, threshold=0.5)
    # truth pairs from the SHARED planting: each planted id maps back
    # to its source (id - 1e6), so the constants stay in _planted_docs
    truth = (_planted_docs(db).filter(F.col("doc_id") >= 1000000)
             .select((F.col("doc_id") - 1000000).alias("a"),
                     F.col("doc_id").alias("b")))
    return dedup.pair_metrics(pred, truth)


def q_partition_overwrite(spark, sf_dir):
    """``overwrite_partitions`` — Delta ``replaceWhere`` at partition
    granularity (``partitioned.py``): ONE commit swaps regions 0 and 1
    of nation for a 2-row replacement that re-populates region 0 only,
    so region 1 is REMOVED.  In-entry contract raises (must survive
    ``python -O``): exactly one new version; every untouched region's
    directory list re-links byte-identically; region 1's key is gone
    from the manifest; the CDF across the commit reports region 1's
    old rows as deletes.  The oracle replays the final state in SQL."""
    from cs186_query_optimization_project_spark.partitioned import (
        PartitionedTable,
    )

    db = _db(spark, sf_dir)
    with _scratch_base("povw", sf_dir) as base:
        pt = PartitionedTable.create(
            spark,
            db.table("nation").select("n_nationkey", "n_name",
                                      "n_regionkey"),
            f"{base}/nation", "n_regionkey")
        man0 = pt._manifest()
        n_r1 = pt.read(partition_values=[1]).count()
        pt.overwrite_partitions(
            _ldf(spark, [(400, "AAA", 0), (401, "BBB", 0)],
                                  schema=pt.read().schema),
            [0, 1])
        if pt.versions() != [0, 1]:
            raise RuntimeError("overwrite must be exactly one commit")
        man1 = pt._manifest()
        for k in man0["parts"]:
            if k not in ("0", "1") and \
                    man1["parts"].get(k) != man0["parts"][k]:
                raise RuntimeError(
                    f"untouched partition {k} was rewritten")
        if "1" in man1["parts"]:
            raise RuntimeError("emptied partition must drop out")
        dels = (pt.changes(0, 1)
                .filter("_change_type = 'delete' AND n_regionkey = 1")
                .count())
        if dels != n_r1:
            raise RuntimeError(
                f"CDF must report region 1's {n_r1} rows as deletes, "
                f"got {dels}")
        out = (pt.read().groupBy("n_regionkey")
               .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                    F.sum("n_nationkey").cast("bigint").alias("key_sum"))
               .localCheckpoint())
    return out


def q_clone_vacuum_guard(spark, sf_dir):
    """The Delta vacuum-after-shallow-clone data-loss hazard, closed:
    ``clone()`` registers the dest in the source's ``_clones.json``
    and the source's ``vacuum`` treats clone-referenced directories as
    reachable (``partitioned.py``).  In-entry contract raises (must
    survive ``python -O``): after the source deletes EVERYTHING and
    vacuums to one retained version, the clone still reads every
    original row; ``detach_clone`` then releases the directories and
    a second vacuum actually reclaims them.  The oracle states the
    clone's surviving aggregate in SQL."""
    from cs186_query_optimization_project_spark.partitioned import (
        PartitionedTable,
    )

    db = _db(spark, sf_dir)
    with _scratch_base("clvg", sf_dir) as base:
        pt = PartitionedTable.create(
            spark,
            db.table("nation").select("n_nationkey", "n_name",
                                      "n_regionkey"),
            f"{base}/nation", "n_regionkey")
        n_src = pt.read().count()
        clone = pt.clone(f"{base}/clone")
        pt.delete(F.col("n_nationkey") >= 0)      # source drops all
        pt.vacuum(keep_last=1)
        surv = clone.read().agg(
            F.count(F.lit(1)).cast("bigint").alias("n_clone_rows"),
            F.sum("n_nationkey").cast("bigint").alias("key_sum")) \
            .collect()[0]
        if surv["n_clone_rows"] != n_src:
            raise RuntimeError(
                f"clone lost data under source vacuum: "
                f"{surv['n_clone_rows']} of {n_src} rows survive")
        pt.detach_clone(clone.root)
        if not pt.vacuum(keep_last=1):
            raise RuntimeError(
                "post-detach vacuum must reclaim the released dirs")
        out = _ldf(spark,
            [(surv["n_clone_rows"], surv["key_sum"], True)],
            "n_clone_rows bigint, key_sum bigint, "
            "reclaimed_after_detach boolean")
    return out


def q_metadata_groupby(spark, sf_dir):
    """``GROUP BY partition_col`` answered from metadata alone
    (``partitioned.py metadata_group_counts`` — manifest + parquet
    footer row counts, the Delta numRecords analog per partition).
    In-entry contract raises (must survive ``python -O``): the
    answers must schedule ZERO Spark jobs and equal the scan's
    groupBy exactly — INCLUDING under a live soft-delete tombstone,
    where the per-directory cardinalities recorded at soft-delete
    commit time (Delta DV-cardinality analog) subtract exactly.  The
    oracle replays create + insert + soft delete in SQL."""
    from cs186_query_optimization_project_spark.partitioned import (
        PartitionedTable,
    )

    db = _db(spark, sf_dir)
    with _scratch_base("mgby", sf_dir) as base:
        pt = PartitionedTable.create(
            spark,
            db.table("orders").select("o_orderkey", "o_orderstatus"),
            f"{base}/orders", "o_orderstatus")
        pt.insert(_ldf(spark,
            [(900000001, "X"), (900000002, "X")],
            "o_orderkey bigint, o_orderstatus string"))
        jobs_before = _job_counter(spark)
        counts = pt.metadata_group_counts()
        jobs_after = _job_counter(spark)
        if jobs_after != jobs_before:
            raise RuntimeError(
                f"metadata groupBy scheduled "
                f"{jobs_after - jobs_before} Spark jobs; contract is 0")
        want = {r[0]: r[1] for r in
                pt.read().groupBy("o_orderstatus").count().collect()}
        if counts != want:
            raise RuntimeError(f"metadata {counts} != scan {want}")
        # a live tombstone no longer forfeits the metadata answer:
        # the recorded cardinality subtracts, still with zero jobs
        pt.delete_soft("o_orderkey = 900000002")
        jobs_before = _job_counter(spark)
        counts = pt.metadata_group_counts()
        if _job_counter(spark) != jobs_before:
            raise RuntimeError(
                "tombstoned metadata groupBy scheduled Spark jobs; "
                "contract is 0")
        want = {r[0]: r[1] for r in
                pt.read().groupBy("o_orderstatus").count().collect()}
        if counts != want:
            raise RuntimeError(
                f"tombstoned metadata {counts} != scan {want}")
        out = _ldf(spark,
            sorted(counts.items()),
            "o_orderstatus string, n_rows bigint")
    return out


def q_bloom_skipping(spark, sf_dir):
    """Per-directory Bloom point-lookup skipping (``partitioned.py``
    ``bloom_cols`` / ``read_point`` — the Delta bloom-filter-index /
    parquet-bloom analog at directory granularity, for
    high-cardinality columns where min/max ranges overlap everywhere).
    Probes the shared read-only ``_orders_bloom_table`` fixture
    (orders + Bloom index + two appends with disjoint synthetic key
    ranges); a point lookup of the smallest real key runs.  In-entry contract raises
    (must survive ``python -O``): the lookup must scan STRICTLY fewer
    directories than exist and equal the plain filter exactly, and an
    absent key must prune at least one directory and return zero rows
    (per-directory false-positive rates are ~1%, so "prunes ALL
    directories" would be a probabilistic assert that flakes a few
    percent of runs at some SF; "prunes ≥ 1 of 5" fails with
    probability ~1e-10 and the row-count check is exact).  The oracle
    replays the lookup in SQL."""
    pt = _orders_bloom_table(spark, sf_dir)  # read-only probes
    key = pt.read().agg(F.min("o_orderkey")).collect()[0][0]
    total = sum(len(ds)
                for ds in pt._manifest()["parts"].values())
    kept = pt._point_dirs("o_orderkey", key)
    if not kept or len(kept) >= total:
        raise RuntimeError(
            f"bloom lookup scanned {len(kept)} of {total} dirs; "
            f"must be in (0, total)")
    got = pt.read_point("o_orderkey", key)
    plain = pt.read().filter(F.col("o_orderkey") == key)
    if got.exceptAll(plain).count() or \
            plain.exceptAll(got).count():
        raise RuntimeError("bloom lookup != plain filter")
    absent_kept = pt._point_dirs("o_orderkey", 9_999_999_999)
    if len(absent_kept) >= total:
        raise RuntimeError(
            "absent key must prune at least one directory")
    if pt.read_point("o_orderkey", 9_999_999_999).count():
        raise RuntimeError("absent key must return zero rows")
    return got.select(
        "o_orderkey", "o_orderstatus",
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
        .alias("price_cents"))


def q_partition_pruned_join(spark, sf_dir):
    """Dynamic-partition-pruning analog at the manifest
    (``partitioned.py read_pruned_by``): the dimension side's distinct
    keys prune the fact scan BEFORE the join — non-matching fact
    partitions are never listed, stronger than file-source DPP (no
    footers opened).  In-entry contract raises (must survive ``python
    -O``): the fact scan's input files all lie under the two matching
    partitions' directories, and the join is a broadcast (the dim was
    small enough to collect, so it must not shuffle the fact).  The
    oracle replays the filtered join in SQL."""
    from cs186_query_optimization_project_spark.partitioned import (
        PartitionedTable,
    )

    db = _db(spark, sf_dir)
    with _scratch_base("dppj", sf_dir) as base:
        pt = PartitionedTable.create(
            spark,
            db.table("orders").select("o_orderkey", "o_orderpriority",
                                      "o_totalprice"),
            f"{base}/orders", "o_orderpriority")
        dim = _ldf(spark,
            [("1-URGENT", 10), ("3-MEDIUM", 30)],
            "prio string, boost int")
        fact = pt.read_pruned_by(dim, "prio")
        allowed = {d for k in ("1-URGENT", "3-MEDIUM")
                   for d in pt._manifest()["parts"].get(k, [])}
        import os as _os
        scanned = {_os.path.dirname(f.removeprefix("file:"))
                   for f in fact.inputFiles()}
        if not scanned or not all(
                any(_os.path.normpath(s) == _os.path.normpath(a)
                    for a in allowed) for s in scanned):
            raise RuntimeError(
                f"pruned scan read outside the matching partitions: "
                f"{scanned - allowed}")
        joined = fact.join(F.broadcast(dim),
                           fact["o_orderpriority"] == dim["prio"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        if "BroadcastHashJoin" not in plan:
            raise RuntimeError("dim join must broadcast")
        out = (joined.groupBy("o_orderpriority")
               .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                    F.round(F.sum("o_totalprice") * 100, 0)
                    .cast("bigint").alias("price_cents"))
               .localCheckpoint())
    return out


def q_mview_bucketed(spark, sf_dir):
    """Bucketed incremental materialized view (``mview.py``): the
    store is hash-partitioned on ``pmod(hash(keys), 16)``, so a
    refresh whose churn touches ONE group key rewrites ONE bucket and
    re-links the other 15 — O(churned buckets), not O(|groups|).
    In-entry contract raises (must survive ``python -O``): exactly the
    touched key's bucket differs between the store manifests (checked
    on the actual manifests, the same evidence as q_partitioned_dml);
    the refreshed view equals a from-scratch recompute.  Sums surface
    as exact-integer cents.  The oracle replays the final aggregate in
    SQL."""
    from cs186_query_optimization_project_spark.mview import (
        MaterializedView,
    )
    from cs186_query_optimization_project_spark.partitioned import (
        PartitionedTable,
    )

    db = _db(spark, sf_dir)
    with _scratch_base("mvbk", sf_dir) as base:
        pt = PartitionedTable.create(
            spark,
            db.table("customer").select("c_custkey", "c_mktsegment",
                                        "c_nationkey", "c_acctbal"),
            f"{base}/customer", "c_mktsegment")
        mv = MaterializedView.create(spark, pt, f"{base}/mv",
                                     keys=["c_nationkey"],
                                     sum_cols=["c_acctbal"],
                                     n_buckets=16)
        man0 = mv._store()._manifest(mv.store_version())
        pt.update(F.col("c_nationkey") == 3,
                  {"c_acctbal": F.col("c_acctbal") + 5.0})
        if mv.refresh() == 0:
            raise RuntimeError("refresh must fold the churn")
        man1 = mv._store()._manifest(mv.store_version())
        changed = {k for k in set(man0["parts"]) | set(man1["parts"])
                   if man0["parts"].get(k) != man1["parts"].get(k)}
        bucket = _ldf(spark, [(3,)], "c_nationkey int") \
            .select(F.pmod(F.hash("c_nationkey"), F.lit(16))
                    .cast("int")).collect()[0][0]
        if changed != {str(bucket)}:
            raise RuntimeError(
                f"refresh must rewrite only bucket {bucket}, "
                f"changed {changed}")
        got = {r["c_nationkey"]: (r["mv_count"],
                                  round(r["mv_sum_c_acctbal"] * 100))
               for r in mv.read().collect()}
        want = {r[0]: (r[1], round(r[2] * 100)) for r in
                pt.read().groupBy("c_nationkey")
                .agg(F.count(F.lit(1)), F.sum("c_acctbal")).collect()}
        if got != want:
            raise RuntimeError(
                f"bucketed view diverged from recompute")
        out = (mv.read()
               .select(F.col("c_nationkey"),
                       F.col("mv_count").cast("bigint").alias("n_rows"),
                       F.round(F.col("mv_sum_c_acctbal") * 100, 0)
                       .cast("bigint").alias("acct_cents"))
               .localCheckpoint())
    return out


def q_ann_batch_queries(spark, sf_dir):
    """Batch exact retrieval (``similarity.cosine_topk_batch``): three
    query vectors ride ONE corpus scan as literals, fan out map-side,
    and rank inside per-query window partitions — the corpus is read
    once regardless of batch size, vs |queries| scans for a loop.
    Deterministic (6-decimal rounds, id tie-breaks); the oracle
    replays the batch with a DuckDB cross join + rank window."""
    db = _db(spark, sf_dir)
    emb = db.table("embeddings")
    queries_batch = [
        (r["vec_id"], [float(x) for x in r["embedding"]])
        for r in emb.filter(F.col("vec_id") < 3).collect()]
    return (similarity.cosine_topk_batch(emb, queries_batch, k=5)
            .select("query_id", "vec_id", "cosine_sim"))


def _ivfpq_base_index(spark, sf_dir) -> similarity.AnnIndex:
    """Build-or-load the SHARED IVF-PQ maintenance fixture: one index
    over the 4/5 corpus (``vec_id % 5 != 0``), cached on disk keyed by
    corpus fingerprint (the :func:`_build_or_load_index` scheme).  The
    append/remove lifecycle entries each shallow-CLONE it (O(metadata),
    zero rows copied) and mutate the clone — the ~9 s PQ training that
    used to run inside BOTH entries now runs once per corpus, and the
    clone isolation is itself part of the contract (mutating a clone
    must never touch a source byte)."""
    # files_per_bucket=1 at contract scale: every maintenance-entry
    # job rescans the code table, and 8 files instead of 32 halves the
    # fixed per-task overhead that dominates these tiny suites (at
    # 100 TB the default >1 applies — see _bucket_partitioned)
    params = {"n_cells": 8, "m": 2, "k": 16, "files_per_bucket": 1}

    def build(path, fp):
        emb = _db(spark, sf_dir).table("embeddings") \
            .filter(F.col("vec_id") % 5 != 0)
        return similarity.build_ivfpq_index(emb, path, fingerprint=fp,
                                            **params)

    return _build_or_load_index(sf_dir, "embeddings.parquet", "ann",
                                "ivfpq_base", _ANN_INDEX_VERSION,
                                params, similarity.load_ann_index,
                                build)


def _clone_ivfpq(spark, base_idx: similarity.AnnIndex,
                 dest: str) -> similarity.AnnIndex:
    """Shallow-clone the base index's code table to ``dest`` and wrap
    it in an AnnIndex handle carrying the same frozen header."""
    from cs186_query_optimization_project_spark.partitioned import (
        PartitionedTable,
    )

    PartitionedTable(spark, base_idx.path).clone(dest)
    return similarity.AnnIndex("ivfpq", dest, base_idx.dim,
                               base_idx.params,
                               base_idx.source_fingerprint)


def q_ivfpq_append(spark, sf_dir):
    """Incremental ANN index maintenance (``similarity.ivfpq_append``
    — FAISS ``add()`` with a frozen header): the shared 4/5-corpus
    base index shallow-clones into scratch, and the held-out 1/5
    appends to the CLONE as one versioned ``insert`` commit (new code
    directories only; no retrain, no rewrite of any existing byte —
    O(|new|)).  In-entry contract raises (must survive ``python
    -O``): the appended codes equal a batch re-encode of the same
    rows BIT-FOR-BIT (frozen header ⇒ deterministic encoding); every
    SOURCE index file survives untouched (clone isolation + append
    immutability); an appended vector is retrievable as its own exact
    top-1 through the standard probe + re-rank path.  The oracle
    states the SQL-derivable size invariants plus the contract
    bits."""
    import os as _os

    from cs186_query_optimization_project_spark.partitioned import (
        PartitionedTable,
    )

    db = _db(spark, sf_dir)
    emb = db.table("embeddings")
    base_idx = _ivfpq_base_index(spark, sf_dir)
    with _scratch_base("ivfa", sf_dir) as base:
        extra = emb.filter(F.col("vec_id") % 5 == 0)
        idx = _clone_ivfpq(spark, base_idx, f"{base}/ivfpq")
        before_files = {}
        for root, _, files in _os.walk(base_idx.path):
            for f in files:
                if f.endswith(".parquet"):
                    p = _os.path.join(root, f)
                    before_files[p] = _os.path.getmtime(p)
        n_appended = similarity.ivfpq_append(idx, extra,
                                             files_per_bucket=1)
        for p, mt in before_files.items():
            if not _os.path.exists(p) or _os.path.getmtime(p) != mt:
                raise RuntimeError(
                    "append through a clone touched a source file")
        cents = idx.params["centroids"]
        books = idx.params["codebooks"]
        e = F.transform(F.col("embedding"), lambda x: x.cast("double"))
        cmat = F.array(*[similarity._lit_vec(c) for c in cents])
        resid = F.zip_with(
            e, F.element_at(cmat, (F.col("cell") + 1).cast("int")),
            lambda x, c: x - c)
        expect = similarity.pq_encode(
            extra.withColumn("cell",
                             similarity.ivf_cell("embedding", cents))
            .withColumn("__res", resid), books, "__res") \
            .select("vec_id", "cell", "pq_codes")
        stored = similarity.ivfpq_codes(spark, idx)
        got = (stored.join(extra.select("vec_id"), "vec_id")
               .select("vec_id", "cell", "pq_codes"))
        # both exceptAll directions in ONE job
        if got.exceptAll(expect).unionAll(
                expect.exceptAll(got)).count():
            raise RuntimeError(
                "incremental append != batch re-encode")
        n_total = stored.count()
        top = similarity.ivfpq_topk(spark, idx, emb,
                                    _query_vec(spark, sf_dir), k=3,
                                    n_probe=8, n_candidates=200)
        top1 = top.collect()[0]["vec_id"]
        if top1 != 0:
            raise RuntimeError(
                f"appended vector must re-rank as its own top-1, "
                f"got {top1}")
        out = _ldf(spark,
            [(n_total - n_appended, n_appended, n_total, True)],
            "n_base bigint, n_appended bigint, n_total bigint, "
            "top1_is_query boolean")
        PartitionedTable(spark, base_idx.path).detach_clone(idx.path)
    return out


def q_token_budget_mix(spark, sf_dir):
    """Token-budget mixture assembly (``sampling.token_budget_mix``):
    per source domain, documents shuffle by the portable md5 coin and
    accrue greedily while the running token total before each is
    under the budget — "take B tokens of each domain", the
    corpus-assembly counterpart of the rate-based mixtures.  One
    cumulative-sum window per domain, no collect; membership is
    partition-layout independent.  The oracle replays hash order,
    prefix sum, and cut in SQL."""
    db = _db(spark, sf_dir)
    out = sampling.token_budget_mix(
        db.table("documents"), "source", "doc_id", "text",
        budget_tokens=500)
    return (out.groupBy("source")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                 F.sum("n_tokens").cast("bigint").alias("tok_sum")))


def q_mview_hll_distinct(spark, sf_dir):
    """Insert-only HLL distinct-count materialized view
    (``mview.py distinct_cols``): per-event-type approximate distinct
    users maintained as dense per-group register arrays that merge by
    max inside the touched-bucket fold.  In-entry contract raises
    (must survive ``python -O``): the incrementally-refreshed
    registers must estimate EXACTLY what the standalone batch sketch
    (``sketches.hll_distinct_by``) computes over the final table (same
    portable-md5 template ⇒ bit-identical registers); a delete must
    make the next refresh raise the named insert-only error.  The
    oracle rebuilds registers and estimator in SQL."""
    from cs186_query_optimization_project_spark.errors import (
        DatabaseException,
    )
    from cs186_query_optimization_project_spark.functions import sketches
    from cs186_query_optimization_project_spark.mview import (
        MaterializedView,
    )
    from cs186_query_optimization_project_spark.partitioned import (
        PartitionedTable,
    )

    db = _db(spark, sf_dir)
    ev = db.table("events").select("event_id", "event_type", "user_id")
    with _scratch_base("hmvd", sf_dir) as base:
        pt = PartitionedTable.create(
            spark, ev.filter(F.col("event_id") % 3 != 0),
            f"{base}/ev", "event_type")
        mv = MaterializedView.create(spark, pt, f"{base}/mv",
                                     keys=["event_type"],
                                     distinct_cols=["user_id"],
                                     hll_m=128)
        pt.insert(ev.filter(F.col("event_id") % 3 == 0))
        if mv.refresh() == 0:
            raise RuntimeError("refresh must fold the inserted rows")
        got = {r["event_type"]: (r["mv_count"],
                                 r["mv_distinct_user_id"])
               for r in mv.read(with_distinct=True).collect()}
        want = {r["event_type"]: r["estimate"] for r in
                sketches.hll_distinct_by(
                    pt.read().withColumn(
                        "u", F.col("user_id").cast("string")),
                    "u", ["event_type"], m=128).collect()}
        if {k: v[1] for k, v in got.items()} != want:
            raise RuntimeError(
                f"incremental HLL view != batch sketch: {got} vs "
                f"{want}")
        pt.delete(F.col("event_id") == 3)
        try:
            mv.refresh()
            raise RuntimeError(
                "refresh over a delete must raise insert-only")
        except DatabaseException:
            pass
        out = _ldf(spark,
            sorted((k, v[0], v[1]) for k, v in got.items()),
            "event_type string, n_rows bigint, distinct_est double")
    return out


def q_ivfpq_remove(spark, sf_dir):
    """Targeted deletion from the IVF-PQ index
    (``similarity.ivfpq_remove`` — the other half of the maintenance
    lifecycle next to ``ivfpq_append``): the shared 4/5-corpus base
    index shallow-clones into scratch, doomed ids locate their cells
    via a broadcast semi-join over the clone's code table, and ONLY
    those cells rewrite through one versioned
    ``overwrite_partitions`` commit — survivors keep their exact
    codes (frozen header — no re-encode) and untouched cells re-link
    their directories.  In-entry contract raises (must survive
    ``python -O``): removed count and survivor count exact; no
    removed id remains; survivors' codes bit-identical to
    pre-removal; a removed id never surfaces from the probe path
    while a kept vector still re-ranks as its own top-1; the SOURCE
    index is byte-untouched (clone isolation).  The oracle states the
    SQL-derivable size invariants plus the contract bits."""
    from cs186_query_optimization_project_spark.partitioned import (
        PartitionedTable,
    )

    import os as _os

    db = _db(spark, sf_dir)
    emb = db.table("embeddings")
    base_idx = _ivfpq_base_index(spark, sf_dir)
    base_members = emb.filter(F.col("vec_id") % 5 != 0)
    # clone-isolation check is FILE-level (mtimes captured before the
    # remove, re-checked after — zero Spark jobs, byte-stronger than a
    # re-collect of the source codes)
    src_files = {}
    for root, _, files in _os.walk(base_idx.path):
        for f in files:
            if f.endswith(".parquet"):
                p = _os.path.join(root, f)
                src_files[p] = _os.path.getmtime(p)
    with _scratch_base("ivfr", sf_dir) as base:
        idx = _clone_ivfpq(spark, base_idx, f"{base}/ivfpq")
        before = {r["vec_id"]: (r["cell"], list(r["pq_codes"]))
                  for r in similarity.ivfpq_codes(spark, idx)
                  .collect()}
        doomed_ids = {i for i in before if i % 7 == 3}
        doom = _ldf(spark,
            [(i,) for i in sorted(doomed_ids)], "vec_id long")
        removed = similarity.ivfpq_remove(spark, idx, doom,
                                          files_per_bucket=1)
        if removed != len(doomed_ids):
            raise RuntimeError(
                f"removed {removed}, expected {len(doomed_ids)}")
        after = {r["vec_id"]: (r["cell"], list(r["pq_codes"]))
                 for r in similarity.ivfpq_codes(spark, idx)
                 .collect()}
        if set(after) != set(before) - doomed_ids:
            raise RuntimeError("survivor id set wrong after removal")
        if any(after[i] != before[i] for i in after):
            raise RuntimeError("survivor codes changed (re-encode?)")
        for p, mt in src_files.items():
            if not _os.path.exists(p) or _os.path.getmtime(p) != mt:
                raise RuntimeError(
                    "remove through a clone touched a source file")
        # vec 1 is in the base (1 % 5 != 0) and kept (1 % 7 != 3)
        qv1 = _query_vec(spark, sf_dir, vec_id=1)
        top = similarity.ivfpq_topk(spark, idx, base_members, qv1,
                                    k=5, n_probe=8, n_candidates=200)
        ids = [r["vec_id"] for r in top.collect()]
        if ids[0] != 1:
            raise RuntimeError(
                f"kept vector must re-rank as its own top-1, got "
                f"{ids[0]}")
        if any(i in doomed_ids for i in ids):
            raise RuntimeError("a removed id surfaced from the probe")
        out = _ldf(spark,
            [(len(before), removed, len(after), True)],
            "n_before bigint, n_removed bigint, n_after bigint, "
            "top1_is_query boolean")
        PartitionedTable(spark, base_idx.path).detach_clone(idx.path)
    return out


def q_time_travel_ts(spark, sf_dir):
    """TIMESTAMP AS OF (``PartitionedTable.version_at``): resolves the
    newest retained version at or before a wall-clock instant, fed to
    ``read(version=...)`` — Delta's timestamp time travel on the
    manifest trail.  In-entry contract raises (must survive ``python
    -O``): a timestamp between the create and the delete resolves to
    v0 and reads the full table; 'now' resolves to the delete's
    version; a pre-table timestamp raises the named error.  The
    oracle replays both states in SQL."""
    import time as _time

    from cs186_query_optimization_project_spark.errors import (
        DatabaseException,
    )
    from cs186_query_optimization_project_spark.partitioned import (
        PartitionedTable,
    )

    db = _db(spark, sf_dir)
    with _scratch_base("ttts", sf_dir) as base:
        pt = PartitionedTable.create(
            spark,
            db.table("nation").select("n_nationkey", "n_name",
                                      "n_regionkey"),
            f"{base}/nation", "n_regionkey")
        t0 = pt._manifest(0)["ts"]
        mid = _time.time()
        _time.sleep(0.05)
        pt.delete(F.col("n_nationkey") % 2 == 0)
        v_mid = pt.version_at(mid)
        v_now = pt.version_at(_time.time())
        if v_mid != 0 or v_now != 1:
            raise RuntimeError(
                f"version_at resolved ({v_mid}, {v_now}), want (0, 1)")
        try:
            pt.version_at(t0 - 1000)
            raise RuntimeError("pre-table timestamp must raise")
        except DatabaseException:
            pass
        both = (pt.read(version=v_mid)
                .select(F.lit("as_of_create").alias("state"),
                        "n_nationkey")
                .unionByName(
                    pt.read(version=v_now)
                    .select(F.lit("current").alias("state"),
                            "n_nationkey")))
        out = (both.groupBy("state")
               .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                    F.sum("n_nationkey").cast("bigint")
                    .alias("key_sum"))
               .localCheckpoint())
    return out


def q_mview_variance(spark, sf_dir):
    """Incrementally-maintained VARIANCE/STDDEV materialized view
    (``MaterializedView var_cols`` — second moments stored as signed-
    foldable ``SUM(c²)`` next to the sum/count pair, so inserts AND
    deletes fold without recompute; Welford's stable recurrence
    cannot unfold a delete, which is why every signed-delta system
    stores naive moments).  Lifecycle: create the view over orders by
    status, DELETE a fifth of the source, INSERT a synthetic batch,
    refresh through both changes, and read per-group avg + population
    stddev derived from the stored moments.  In-entry contract raises
    (must survive ``python -O``): the refreshed view's moments equal a
    direct full recompute on the current source to 1e-6 relative.
    The oracle replays the delete + insert + naive-moment stddev in
    SQL (stddev rounds at 4dp — the moments' float error is ~1e-7 of
    the value, three orders under the rounding boundary)."""
    from cs186_query_optimization_project_spark.mview import (
        MaterializedView,
    )
    from cs186_query_optimization_project_spark.partitioned import (
        PartitionedTable,
    )

    db = _db(spark, sf_dir)
    with _scratch_base("mvvar", sf_dir) as base:
        pt = PartitionedTable.create(
            spark,
            db.table("orders").select("o_orderkey", "o_orderstatus",
                                      "o_totalprice"),
            f"{base}/orders", "o_orderstatus")
        mv = MaterializedView.create(
            spark, pt, f"{base}/mv", keys=["o_orderstatus"],
            sum_cols=["o_totalprice"], var_cols=["o_totalprice"],
            n_buckets=4)
        pt.delete(F.col("o_orderkey") % 5 == 0)
        mv.refresh()
        inserted = (db.table("orders")
                    .filter(F.col("o_orderkey") % 7 == 0)
                    .select((F.col("o_orderkey")
                             + 1000000000).alias("o_orderkey"),
                            "o_orderstatus",
                            ((F.col("o_orderkey") % 997)
                             .cast("double") + 0.25)
                            .alias("o_totalprice")))
        pt.insert(inserted)
        mv.refresh()
        view = mv.read(with_avg=True, with_stddev=True)
        direct = (pt.read().groupBy("o_orderstatus")
                  .agg(F.count(F.lit(1)).alias("n"),
                       F.avg("o_totalprice").alias("avg"),
                       F.var_pop("o_totalprice").alias("var")))
        chk = {r["o_orderstatus"]: r for r in direct.collect()}
        for r in view.collect():
            w = chk[r["o_orderstatus"]]
            if r["mv_count"] != w["n"] or \
                    abs(r["mv_avg_o_totalprice"] - w["avg"]) \
                    > 1e-6 * abs(w["avg"]) or \
                    abs(r["mv_var_o_totalprice"] - w["var"]) \
                    > 1e-6 * abs(w["var"]):
                raise RuntimeError(
                    f"incremental moments diverge from the direct "
                    f"recompute for {r['o_orderstatus']}")
        out = (view.select(
            "o_orderstatus",
            F.col("mv_count").cast("bigint").alias("n_rows"),
            F.round("mv_avg_o_totalprice", 4).alias("avg_price"),
            F.round("mv_stddev_o_totalprice", 4)
            .alias("stddev_price")).localCheckpoint())
    return out


def q_mview_minmax_delete(spark, sf_dir):
    """MIN/MAX materialized view surviving deletes via scoped bucket
    recompute (``mview.py minmax_cols`` — the two-tier refresh: insert
    -only buckets fold the extremum distributively like the sums;
    buckets a delete touched recompute their groups from the source,
    never a whole-view rebuild, never a wrong answer).  orders lands
    as a PartitionedTable; the view keeps per-status COUNT/MIN/MAX of
    o_totalprice.  In-entry contract raises (must survive ``python
    -O``): (a) an insert planting a synthetic global max folds
    incrementally and every un-churned store bucket re-links its
    directory unchanged; (b) deleting that max row makes the next
    refresh recompute the affected bucket — the extremum must SHRINK
    back and the whole view must equal a from-scratch recompute after
    each refresh.  The oracle replays insert + delete in SQL."""
    from cs186_query_optimization_project_spark.mview import (
        MaterializedView,
    )
    from cs186_query_optimization_project_spark.partitioned import (
        PartitionedTable,
    )

    db = _db(spark, sf_dir)
    with _scratch_base("mmvd", sf_dir) as base:
        pt = PartitionedTable.create(
            spark,
            db.table("orders").select("o_orderkey", "o_orderstatus",
                                      "o_totalprice"),
            f"{base}/orders", "o_orderstatus")
        mv = MaterializedView.create(
            spark, pt, f"{base}/mv", keys=["o_orderstatus"],
            sum_cols=["o_totalprice"], minmax_cols=["o_totalprice"],
            n_buckets=8)

        def _got():
            return {r["o_orderstatus"]:
                    (r["mv_count"], r["mv_min_o_totalprice"],
                     r["mv_max_o_totalprice"])
                    for r in mv.read().collect()}

        def _want():
            return {r[0]: (r[1], r[2], r[3]) for r in
                    pt.read().groupBy("o_orderstatus")
                    .agg(F.count(F.lit(1)), F.min("o_totalprice"),
                         F.max("o_totalprice")).collect()}

        if _got() != _want():
            raise RuntimeError("create != recompute")
        man0 = mv._store()._manifest(mv.store_version())
        schema = "o_orderkey bigint, o_orderstatus string, " \
                 "o_totalprice double"
        pt.insert(_ldf(spark,
            [(900000001, "O", 99999999.0), (900000002, "O", 0.005)],
            schema))
        if mv.refresh() == 0:
            raise RuntimeError("fold refresh must see the inserts")
        got = _got()
        if got != _want() or got["O"][2] != 99999999.0:
            raise RuntimeError(
                f"insert-only fold wrong: {got.get('O')}")
        man1 = mv._store()._manifest(mv.store_version())
        churned = {r[0] for r in
                   _ldf(spark, [("O",)],
                                         "o_orderstatus string")
                   .select(F.pmod(F.hash("o_orderstatus"), F.lit(8))
                           .cast("int")).collect()}
        for k in set(man0["parts"]) - {str(b) for b in churned}:
            if man0["parts"][k] != man1["parts"].get(k):
                raise RuntimeError(
                    f"un-churned bucket {k} was rewritten by the "
                    f"insert-only fold")
        pt.delete(F.col("o_orderkey") == 900000001)
        # contract (c): the view is keyed on the source's partition
        # column, so the delete-bucket recompute scan must be PRUNED
        # at the manifest to the delete's partition ('O') — input I/O
        # tracks churn, not table size
        pruned_calls = []
        real_read = type(pt).read

        def _spy(self, version=None, partition_values=None):
            if self.root == pt.root and partition_values is not None:
                pruned_calls.append(sorted(partition_values))
            return real_read(self, version, partition_values)

        type(pt).read = _spy
        try:
            refreshed = mv.refresh()
        finally:
            type(pt).read = real_read
        if refreshed == 0:
            raise RuntimeError("delete refresh must fold the CDF")
        if not pruned_calls or any(c != ["O"] for c in pruned_calls):
            raise RuntimeError(
                f"recompute scan not pruned to the delete's "
                f"partition: {pruned_calls}")
        got = _got()
        if got != _want():
            raise RuntimeError("post-delete view != recompute")
        if got["O"][2] == 99999999.0:
            raise RuntimeError(
                "deleted max survived — the scoped recompute did not "
                "run")
        out = _ldf(spark,
            sorted((k, v[0], v[1], v[2]) for k, v in got.items()),
            "o_orderstatus string, n_rows bigint, min_price double, "
            "max_price double").localCheckpoint()
    return out


def q_ivfpq_batch(spark, sf_dir):
    """Batch ANN over the MATERIALIZED IVF-PQ index
    (``similarity.ivfpq_probe_batch``/``ivfpq_topk_batch`` — the
    indexed counterpart of ``ann_batch_queries``): three query
    vectors' probed-cell plans and ADC lookup tables ride as ONE
    broadcast plan table, the code table is read once, manifest-pruned
    to the UNION of probed cells, and per-query rank windows take the
    candidates; the exact re-rank reads each finalist source row once
    even when queries share it.  In-entry contract raises (must
    survive ``python -O``): (a) per query, the batch top-5 equals the
    single-query ``ivfpq_topk`` EXACTLY; (b) the candidate scan lists
    only the probed-cell union's manifest directories while unprobed
    cells exist.  The oracle states the SQL-derivable size invariants
    plus the contract bits."""
    import os as _os

    from cs186_query_optimization_project_spark.partitioned import (
        PartitionedTable,
    )

    db = _db(spark, sf_dir)
    emb = db.table("embeddings")
    base_idx = _ivfpq_base_index(spark, sf_dir)
    base_members = emb.filter(F.col("vec_id") % 5 != 0)
    queries = [(qid, _query_vec(spark, sf_dir, vec_id=qid))
               for qid in (1, 2, 3)]
    cand = similarity.ivfpq_probe_batch(spark, base_idx, queries,
                                        k=5, n_probe=4)
    union = {c for _, qv in queries
             for c in similarity._nearest_cells(
                 base_idx.params["centroids"], qv, 4)}
    man = PartitionedTable(spark, base_idx.path)._manifest()
    allowed = {_os.path.normpath(d) for c in union
               for d in man["parts"].get(str(c), [])}
    got_dirs = {_os.path.normpath(_os.path.dirname(
        f.removeprefix("file:"))) for f in cand.inputFiles()}
    if not got_dirs or not got_dirs <= allowed or \
            len(man["parts"]) <= len(union):
        raise RuntimeError(
            "batch probe scan lists files outside the probed-cell "
            "union — manifest pruning is broken")
    top = similarity.ivfpq_topk_batch(spark, base_idx, base_members,
                                      queries, k=5, n_probe=4)
    got = {}
    for r in top.collect():
        got.setdefault(r["query_id"], []).append(
            (r["cosine_sim"], r["vec_id"]))
    for qid, qv in queries:
        want = [(r["cosine_sim"], r["vec_id"]) for r in
                similarity.ivfpq_topk(spark, base_idx, base_members,
                                      qv, k=5, n_probe=4).collect()]
        if sorted(got.get(qid, []),
                  key=lambda t: (-t[0], t[1])) != want:
            raise RuntimeError(
                f"batch result for query {qid} != single-query probe")
    # COUNT(*) from manifest + footer stats (the Delta numRecords
    # answer — exact, tombstone-aware) instead of a full code-table
    # scan job; falls back to the scan when metadata can't answer
    n_indexed = PartitionedTable(spark, base_idx.path).metadata_count()
    if n_indexed is None:
        n_indexed = similarity.ivfpq_codes(spark, base_idx).count()
    return _ldf(spark,
        [(len(queries), int(n_indexed), 5, True, True)],
        "n_queries int, n_indexed bigint, k int, "
        "matches_single boolean, pruned boolean")


def q_multi_skip(spark, sf_dir):
    """Conjunctive multi-column data skipping
    (``PartitionedTable.read_skipping`` — Delta file-stats skipping
    generalized to several predicates pruning together): partition
    equality prunes at the manifest, a Bloom-indexed key equality
    prunes by membership AND bounds, and a range conjunct prunes by
    footer min/max — a directory dies to whichever conjunct disproves
    it first.  Probes the shared build-or-load fixture
    (``_orders_bloom_table``): orders partitioned by status with a
    Bloom index on o_orderkey plus two appended batches with disjoint
    key/price ranges — the entry itself is strictly read-only, so its
    timed cost is the skipping operator.  In-entry contract raises (must survive ``python -O``):
    the three-conjunct lookup scans EXACTLY ONE directory (of 5+) and
    equals the plain filtered read; the probe issues zero Spark jobs
    before the pruned scan.  The oracle replays inserts + WHERE in
    SQL."""
    import os as _os

    pt = _orders_bloom_table(spark, sf_dir)  # read-only probes
    total = sum(len(ds) for ds in pt._manifest()["parts"].values())
    jobs_before = _job_counter(spark)
    out = pt.read_skipping(
        eq={"o_orderstatus": "X", "o_orderkey": 910000005},
        ranges={"o_totalprice": (1.5, None)})
    if _job_counter(spark) != jobs_before:
        raise RuntimeError(
            "read_skipping scheduled Spark jobs before the "
            "pruned scan; the probe contract is zero")
    dirs = {_os.path.dirname(f.removeprefix("file:"))
            for f in out.inputFiles()}
    if len(dirs) != 1 or total < 5:
        raise RuntimeError(
            f"conjunctive skip scanned {len(dirs)} of {total} "
            f"dirs; must be exactly 1")
    want = (pt.read()
            .filter((F.col("o_orderstatus") == "X")
                    & (F.col("o_orderkey") == 910000005)
                    & (F.col("o_totalprice") >= 1.5)))
    got_rows = sorted(map(tuple, out.collect()))
    if got_rows != sorted(map(tuple, want.collect())):
        raise RuntimeError("read_skipping != plain filtered read")
    return _ldf(spark,
        got_rows,
        "o_orderkey bigint, o_orderstatus string, "
        "o_totalprice double")


def q_url_dedup(spark, sf_dir):
    """URL-canonicalization dedup (``text.url_normalize`` /
    ``url_dedup`` — the cheapest dedup tier a crawl pipeline runs
    before any content hashing: the same page arrives under dozens of
    surface forms).  The documents table has no URL column, so each
    doc PLANTS a deterministic messy variant by ``doc_id % 3`` — bare,
    ``WWW.`` + ``:443`` + fragment, trailing-slash + tracking params —
    all of which must canonicalize to the SAME
    ``https://example.com/p<doc_id % 50>`` key (pure JVM string
    functions, no UDF).  The oracle replays group membership from the
    planted construction, so a canonicalization bug that fails to
    collapse any variant breaks the count/keeper comparison."""
    db = _db(spark, sf_dir)
    g = (F.col("doc_id") % 50).cast("string")
    v = F.col("doc_id") % 3
    url = (F.when(v == 0, F.concat(F.lit("https://Example.com/p"), g))
           .when(v == 1, F.concat(F.lit("https://WWW.example.com:443/p"),
                                  g, F.lit("#sec")))
           .otherwise(F.concat(
               F.lit("https://example.com/p"), g,
               F.lit("/?utm_source=feed&fbclid=abc"))))
    docs = db.table("documents").select("doc_id", url.alias("url"))
    out = text.url_dedup(docs)
    return (out.select("canonical_url",
                       F.col("keeper").cast("bigint").alias("keeper"),
                       F.col("n_dups").cast("bigint").alias("n_dups")))


def q_metadata_group_minmax(spark, sf_dir):
    """Per-partition-key MIN/MAX answered from MANIFEST + footer
    stats with zero Spark jobs (``metadata_group_min_max`` — the
    "newest record per partition" dashboard query, the GROUP BY
    complement of ``metadata_agg``'s global MIN/MAX and
    ``metadata_groupby``'s COUNTs).  Probes the shared read-only
    ``_orders_bloom_table`` fixture.  In-entry contract raises (must
    survive ``python -O``): the metadata answer schedules ZERO Spark
    jobs and equals the scan-side ``GROUP BY`` exactly.  The oracle
    replays inserts + GROUP BY MIN/MAX in SQL."""
    pt = _orders_bloom_table(spark, sf_dir)  # read-only probes
    jobs_before = _job_counter(spark)
    got = pt.metadata_group_min_max("o_orderkey")
    if _job_counter(spark) != int(jobs_before):
        raise RuntimeError(
            "metadata_group_min_max scheduled Spark jobs; the "
            "contract is zero")
    if got is None:
        raise RuntimeError(
            "metadata answer unavailable on a tombstone-free table")
    want = {r["o_orderstatus"]: (r["lo"], r["hi"]) for r in
            pt.read().groupBy("o_orderstatus")
            .agg(F.min("o_orderkey").alias("lo"),
                 F.max("o_orderkey").alias("hi")).collect()}
    if got != want:
        raise RuntimeError(
            f"metadata group min/max != scan GROUP BY: "
            f"{sorted(got)} vs {sorted(want)}")
    return _ldf(spark,
        sorted((k, int(v[0]), int(v[1])) for k, v in got.items()),
        "o_orderstatus string, min_key bigint, max_key bigint")


def q_disjunct_skip(spark, sf_dir):
    """DISJUNCTIVE data skipping (``read_skipping_any`` — OR of
    conjunctive branches, the multi-tenant backfill shape
    ``(status='X' AND key=k1) OR (status='F' AND key<=50)``): the scan
    reads the UNION of the branches' admitted directories — a
    directory is skipped only when EVERY branch disproves it — then
    the exact OR filter applies.  Probes the shared read-only
    ``_orders_bloom_table`` fixture.  In-entry contract raises (must
    survive ``python -O``): the two-branch scan lists EXACTLY 2 of 5+
    directories (branch 1 admits one append dir via Bloom
    membership, branch 2 one base-status dir via manifest equality +
    key bounds), issues zero Spark jobs before the pruned scan, and
    equals the plain OR-filtered read; additionally (round 14) the
    ``skipping_report_any`` EXPLAIN surface must name exactly the
    scanned union dirs with per-branch verdicts, at zero Spark jobs.
    The oracle replays inserts + the OR in SQL."""
    import os as _os

    pt = _orders_bloom_table(spark, sf_dir)  # read-only probes
    total = sum(len(ds) for ds in pt._manifest()["parts"].values())
    jobs_before = _job_counter(spark)
    out = pt.read_skipping_any([
        {"eq": {"o_orderstatus": "X", "o_orderkey": 900000005}},
        {"eq": {"o_orderstatus": "F"},
         "ranges": {"o_orderkey": (1, 50)}},
    ])
    if _job_counter(spark) != int(jobs_before):
        raise RuntimeError(
            "disjunctive skipping scheduled Spark jobs before the "
            "pruned scan; the probe contract is zero")
    dirs = {_os.path.dirname(f.removeprefix("file:"))
            for f in out.inputFiles()}
    if len(dirs) != 2 or total < 5:
        raise RuntimeError(
            f"disjunctive skip scanned {len(dirs)} of {total} dirs; "
            f"the union must be exactly the two branch-admitted dirs")
    # EXPLAIN surface (round 14): skipping_report_any must agree with
    # the real scan — union rows name exactly the 2 scanned dirs, with
    # per-branch verdicts present — at zero Spark jobs
    jobs_before = _job_counter(spark)
    rep = pt.skipping_report_any([
        {"eq": {"o_orderstatus": "X", "o_orderkey": 900000005}},
        {"eq": {"o_orderstatus": "F"},
         "ranges": {"o_orderkey": (1, 50)}},
    ])
    if _job_counter(spark) != int(jobs_before):
        raise RuntimeError("skipping_report_any scheduled Spark jobs; "
                           "the EXPLAIN surface is metadata-only")
    rep_dirs = {_os.path.normpath(r["dir"]) for r in rep
                if r["branch"] == "union" and r["status"] == "scanned"}
    if rep_dirs != {_os.path.normpath(d) for d in dirs} or \
            not any(r["branch"] == 1 for r in rep):
        raise RuntimeError(
            "skipping_report_any union rows diverge from the scan")
    want = pt.read().filter(
        ((F.col("o_orderstatus") == "X")
         & (F.col("o_orderkey") == 900000005))
        | ((F.col("o_orderstatus") == "F")
           & F.col("o_orderkey").between(1, 50)))
    got_rows = sorted(map(tuple, out.collect()))
    if got_rows != sorted(map(tuple, want.collect())):
        raise RuntimeError("disjunctive skipping != plain OR read")
    return _ldf(spark,
        got_rows,
        "o_orderkey bigint, o_orderstatus string, o_totalprice double")


def q_repartition_evolution(spark, sf_dir):
    """Partition-layout EVOLUTION (``PartitionedTable
    .repartition_table`` — single→hierarchical in one versioned
    commit; Delta requires dropping and recreating the table, here
    the history survives): orders lands partitioned by status, then
    evolves to (status, priority).  In-entry contracts raise (must
    survive ``python -O``): (a) after the commit the new layout
    prunes — a two-column exact-tuple read lists only its manifest
    leaf; (b) time travel reads version 0 under the OLD layout with
    identical content; (c) ``changes()`` across the boundary is EMPTY
    (dataChange=false — a layout rewrite is not row churn).  The
    oracle replays the final per-(status, priority) aggregate."""
    import os as _os

    from cs186_query_optimization_project_spark.partitioned import (
        PartitionedTable,
    )

    db = _db(spark, sf_dir)
    with _scratch_base("rept", sf_dir) as base:
        pt = PartitionedTable.create(
            spark,
            db.table("orders").select("o_orderkey", "o_orderstatus",
                                      "o_orderpriority",
                                      "o_totalprice"),
            f"{base}/orders", "o_orderstatus")
        n0 = pt.read().count()
        pt.repartition_table(["o_orderstatus", "o_orderpriority"])
        if pt.partition_cols() != ["o_orderstatus", "o_orderpriority"]:
            raise RuntimeError("layout did not evolve")
        man = pt._manifest()
        exact = pt.read(partition_values=[("F", "1-URGENT")])
        dirs = {_os.path.normpath(_os.path.dirname(
            f.removeprefix("file:"))) for f in exact.inputFiles()}
        want = {_os.path.normpath(d)
                for d in man["parts"]["F/1-URGENT"]}
        if dirs != want:
            raise RuntimeError(
                "evolved layout did not prune the exact-tuple read")
        if pt.read(version=0).count() != n0 or pt.read().count() != n0:
            raise RuntimeError("content changed across the rewrite")
        if pt.changes(0, 1).count() != 0:
            raise RuntimeError(
                "layout-only rewrite reported row churn; "
                "dataChange=false was lost")
        out = (pt.read()
               .groupBy("o_orderstatus", "o_orderpriority")
               .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                    F.round(F.sum("o_totalprice"), 2)
                    .alias("sum_price"))
               .localCheckpoint())
    return out


def q_pipeline_corpus_full(spark, sf_dir):
    """End-to-end training-corpus pipeline over the round-12 surface —
    ONE declarative plan chaining url_dedup → exact dedup →
    MinHash-LSH dedup → n-gram containment dedup → cross-dataset
    semantic quarantine → leakage-guarded group split → per-domain
    token-budget mix → sequence packing, with no driver-side
    materialization between stages.  The corpus PLANTS one artifact
    class per dedup stage, each engineered to be caught
    DETERMINISTICALLY by its stage and invisible to the others:

    - url variants (+4e6): messy surface forms of a real page URL,
      unique nonsense text — only URL canonicalization can kill them;
    - exact copies (+1e6): byte-identical text, distinct URL — die at
      the md5 exact tier;
    - whitespace near-dups (+2e6): every space doubled, so the TOKEN
      sequence (hence shingle set, hence MinHash signature) is
      IDENTICAL (Jaccard exactly 1.0 — no probabilistic band
      boundary) while the raw bytes differ — die at MinHash;
    - prefix fragments (+3e6): the first 30% of tokens of long docs —
      containment exactly 1.0 but Jaccard ≲ 0.3, so only the
      asymmetric containment tier sees them.

    The semantic stage quarantines corpus rows whose embeddings match
    the planted eval set (same construction as
    ``semantic_contamination``).  The REAL corpus's own duplicates
    are handled too: the oracle replays EVERY tier in SQL — md5
    exact-dup keep-min, the exact-Jaccard(≥0.5) connected-components
    keep-min (banding provably loses no qualifying pair at the test
    SFs — pair-set equality verified engine-side at sf0.01 and
    sf0.1), the asymmetric containment keep-longest over exactly the
    md5+minhash survivors (round 14 — no contract-only tier remains),
    plus the quarantine/split/mix/pack stages.  In-entry contracts
    raise (must survive ``python -O``): (a) no planted id survives
    the dedup+quarantine stages; (b) no PLANTED fragment
    out-contains a real doc (the one containment case the oracle's
    real-corpus replay cannot see; plantings must stay disjoint)."""
    from cs186_query_optimization_project_spark.functions import packing

    db = _db(spark, sf_dir)
    docs = db.table("documents").select("doc_id", "source", "text")
    n = F.size(F.split("text", r"\s+"))
    did = F.col("doc_id")
    # planted-id offset strictly above every REAL id at ANY scale —
    # fixed 1e6-style constants would collide with real ids on a
    # corpus of >= 1e6 documents, false-failing the leaked contract
    # and breaking the keeper-is-the-original min-id assumption
    max_id = docs.agg(F.max("doc_id")).collect()[0][0] or 0
    off = 10 ** max(6, len(str(int(max_id) + 1)))

    def _q_url(prefix):  # unique, never-colliding URL per planted row
        return F.concat(F.lit(f"https://example.com/{prefix}"),
                        did.cast("string"))

    base = docs.withColumn("url", _q_url("p"))
    urlv = (docs.filter(did % 13 == 0)
            .select((did + 4 * off).alias("doc_id"), "source",
                    F.concat(F.lit("urlvariant payload of page "),
                             did.cast("string")).alias("text"))
            .withColumn("url", F.concat(
                F.lit("https://WWW.example.com:443/p"),
                (did - 4 * off).cast("string"),  # the original page
                F.lit("#frag"))))
    copies = (docs.filter(did % 11 == 0)
              .select((did + off).alias("doc_id"), "source",
                      "text")
              .withColumn("url", _q_url("q")))
    near = (docs.filter((did % 10 == 0) & (n >= 10))
            .select((did + 2 * off).alias("doc_id"), "source",
                    F.regexp_replace("text", " ", "  ").alias("text"))
            .withColumn("url", _q_url("r")))
    frag = (docs.filter((did % 17 == 0) & (n >= 30))
            .select((did + 3 * off).alias("doc_id"), "source",
                    F.array_join(
                        F.slice(F.split("text", r"\s+"), F.lit(1),
                                F.floor(n * 0.3).cast("int")),
                        " ").alias("text"))
            .withColumn("url", _q_url("s")))
    corpus = (base.unionByName(urlv).unionByName(copies)
              .unionByName(near).unionByName(frag))
    # stage 1: URL-canonicalization dedup (keep min id per canonical)
    keepers = (text.url_dedup(corpus)
               .select(F.col("keeper").alias("doc_id")))
    s1 = corpus.join(keepers, "doc_id", "left_semi").drop("url")
    # stage 2: exact dedup (md5 keep-min).  Stage results checkpoint
    # EXECUTOR-side (localCheckpoint — never a driver collect): the
    # downstream tiers, the in-entry contracts, and the final
    # aggregate each traverse the corpus once instead of re-executing
    # the full signature pipeline per traversal (measured 33→~13 s at
    # sf0.1); at cluster scale this is the standard stage-boundary
    # cache a composed dedup pipeline would persist anyway.
    s2 = dedup.drop_exact_duplicates(s1).localCheckpoint()
    # stage 3: MinHash-LSH near-dup dedup (keep cluster min)
    mh_losers = (dedup.duplicate_clusters(
        dedup.minhash_near_duplicates(s2, threshold=0.5))
        .filter(F.col("doc_id") != F.col("cluster_id"))
        .select("doc_id"))
    s3 = s2.join(mh_losers, "doc_id", "left_anti").localCheckpoint()
    # stage 4: containment dedup (drop the contained side).  The
    # REAL-real containment fate is oracle-replayed (round 14: the
    # ctc/ctlose CTEs restrict the shared shingle blocking to
    # md5+minhash survivors, exactly this stage's input set); the one
    # case SQL cannot see — a PLANTED fragment out-containing a real
    # doc — still fails loudly via contract (b) below.
    from pyspark.sql import Observation as _Obs
    ct_obs = _Obs()
    ct_pairs = (dedup.ngram_containment_pairs(s3, threshold=0.9)
                .observe(ct_obs, F.coalesce(F.sum(
                    ((F.col("small") < off)
                     & ((F.col("a") >= off) | (F.col("b") >= off)))
                    .cast("bigint")), F.lit(0)).alias("__pk"))
                .localCheckpoint())
    ct_losers = ct_pairs.select(F.col("small").alias("doc_id")) \
        .distinct()
    # contract (b) count rides the pair checkpoint as an observed
    # metric — previously a separate filter+count pass over the pairs
    planted_kill = int(ct_obs.get["__pk"])
    if planted_kill:
        raise RuntimeError(
            f"containment dropped {planted_kill} real docs from pairs "
            f"with PLANTED fragments — invisible to the oracle's "
            f"real-corpus replay; the planting must stay disjoint")
    s4 = s3.join(ct_losers, "doc_id", "left_anti")
    # stage 5: cross-dataset semantic quarantine (planted eval set —
    # the q_semantic_contamination construction)
    emb = db.table("embeddings")
    ref = (emb.filter(F.col("vec_id") % 20 == 0)
           .select((F.col("vec_id") + 2000000).alias("vec_id"),
                   F.expr("transform(embedding, (x, i) -> "
                          "CASE WHEN i = 0 THEN x + CAST(0.05 AS FLOAT)"
                          " ELSE x END)").alias("embedding")))
    hits = (similarity.cross_similar_pairs(emb, ref, threshold=0.9,
                                           n_planes=6)
            .select(F.col("corpus_id").alias("doc_id")).distinct()
            .localCheckpoint())
    # contract: every planted artifact died at its stage.  The leak
    # count rides s5's checkpoint as an observed metric, and the
    # checkpoint itself replaces the old shape's TWO traversals of the
    # s4/s5 anti-join chain (one for the count, one when the returned
    # plan executed) with one.
    s5_obs = _Obs()
    s5 = (s4.join(hits, "doc_id", "left_anti")
          .observe(s5_obs, F.coalesce(F.sum(
              (F.col("doc_id") >= off).cast("bigint")), F.lit(0))
              .alias("__leak"))
          .localCheckpoint())
    leaked = int(s5_obs.get["__leak"])
    if leaked:
        raise RuntimeError(
            f"{leaked} planted artifacts survived the dedup/"
            f"quarantine stages — a pipeline tier misfired")
    # stage 6: leakage-guarded group split → train side
    s6 = (sampling.hash_split(s5, "source")
          .filter(F.col("split") == "train"))
    # stage 7: per-domain token-budget mixture
    mix = sampling.token_budget_mix(s6, "source", "doc_id", "text",
                                    budget_tokens=400)
    # stage 8: sequence packing
    packed = packing.pack_sequences(
        mix.select("doc_id", "n_tokens"), "n_tokens", budget=256,
        n_shards=16)
    return (packed.groupBy(F.col("shard").cast("bigint").alias("shard"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                 (F.max("pack_id") + 1).cast("bigint").alias("n_packs"),
                 F.sum("n_tokens").cast("bigint").alias("tok_sum")))


def q_inlist_skip(spark, sf_dir):
    """IN-list data skipping (``read_skipping(isin=...)`` — the other
    common metadata-prunable point shape, ``col IN (v1..vn)``): a
    directory survives when ANY listed value admits it (union of
    per-value Bloom + bounds probes), so a 3-value IN over keys
    living in two append batches scans those two directories and
    skips the base corpus entirely.  Probes the shared read-only
    ``_orders_bloom_table`` fixture.  In-entry contract raises (must
    survive ``python -O``): the IN scan lists EXACTLY 2 of 5+
    directories, issues zero Spark jobs before the pruned scan, and
    equals the plain ``isin`` filtered read.  The oracle replays
    inserts + IN in SQL."""
    import os as _os

    pt = _orders_bloom_table(spark, sf_dir)  # read-only probes
    total = sum(len(ds) for ds in pt._manifest()["parts"].values())
    jobs_before = _job_counter(spark)
    out = pt.read_skipping(
        isin={"o_orderkey": [900000005, 910000007, -17]})
    if _job_counter(spark) != int(jobs_before):
        raise RuntimeError(
            "IN-list skipping scheduled Spark jobs before the "
            "pruned scan; the probe contract is zero")
    dirs = {_os.path.dirname(f.removeprefix("file:"))
            for f in out.inputFiles()}
    if len(dirs) != 2 or total < 5:
        raise RuntimeError(
            f"IN-list skip scanned {len(dirs)} of {total} dirs; "
            f"the two append dirs alone must survive (-17 is "
            f"absent; every base dir bloom disproves it)")
    want = pt.read().filter(F.col("o_orderkey")
                            .isin([900000005, 910000007, -17]))
    got_rows = sorted(map(tuple, out.collect()))
    if got_rows != sorted(map(tuple, want.collect())):
        raise RuntimeError("IN skipping != plain isin read")
    return _ldf(spark,
        got_rows,
        "o_orderkey bigint, o_orderstatus string, o_totalprice double")


def q_multi_partition(spark, sf_dir):
    """Hierarchical two-column hive partitioning
    (``PartitionedTable.create(..., ["o_orderstatus",
    "o_orderpriority"])`` — the standard 100 TB layout, e.g.
    date/source): manifest keys are the hive path tuple and every
    partition-aware read prunes EXACTLY — a full-tuple read lists one
    leaf directory, a scalar prefix read lists one subtree, and a
    SECOND-component point read prunes on its path component alone.
    In-entry contracts raise (must survive ``python -O``): the
    full-tuple lookup issues ZERO Spark jobs before the pruned scan
    and lists exactly the manifest's one leaf of 15; the
    second-component read lists exactly the 3 leaves carrying that
    priority.  The oracle replays all three aggregates as plain
    WHERE clauses over orders."""
    import os as _os

    from cs186_query_optimization_project_spark.partitioned import (
        PartitionedTable,
    )

    db = _db(spark, sf_dir)
    with _scratch_base("mpart", sf_dir) as base:
        pt = PartitionedTable.create(
            spark,
            db.table("orders").select("o_orderkey", "o_orderstatus",
                                      "o_orderpriority",
                                      "o_totalprice"),
            f"{base}/orders", ["o_orderstatus", "o_orderpriority"])
        man = pt._manifest()
        n_leaves = sum(len(ds) for ds in man["parts"].values())
        # --- full-tuple read: zero jobs, exactly one leaf listed ---
        jobs_before = _job_counter(spark)
        exact = pt.read(partition_values=[("F", "1-URGENT")])
        if _job_counter(spark) != int(jobs_before):
            raise RuntimeError(
                "two-column exact read scheduled Spark jobs before "
                "the pruned scan; the prune is manifest-only")
        dirs = {_os.path.normpath(_os.path.dirname(
            f.removeprefix("file:"))) for f in exact.inputFiles()}
        want = {_os.path.normpath(d)
                for d in man["parts"]["F/1-URGENT"]}
        if dirs != want or n_leaves < 15:
            raise RuntimeError(
                f"exact tuple read listed {len(dirs)} dirs of "
                f"{n_leaves}; must be exactly the manifest's leaf")
        # --- second-component point read: exactly that component ---
        comp = pt.read_point("o_orderpriority", "5-LOW")
        cdirs = {_os.path.normpath(_os.path.dirname(
            f.removeprefix("file:"))) for f in comp.inputFiles()}
        cwant = {_os.path.normpath(d)
                 for k, ds in man["parts"].items()
                 if k.split("/")[1] == "5-LOW" for d in ds}
        if cdirs != cwant:
            raise RuntimeError(
                f"component read listed {len(cdirs)} dirs, manifest "
                f"has {len(cwant)} with that priority")
        # --- scalar prefix read: one status subtree ---
        prefix = pt.read(partition_values=["O"])
        row = (exact.agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_exact"))
            .collect()[0])
        n_prefix = prefix.count()
        n_comp = comp.count()
    return _ldf(spark,
        [(int(row["n_exact"]), float(row["sum_exact"]),
          int(n_prefix), int(n_comp), True, True)],
        "n_exact bigint, sum_exact double, n_prefix bigint, "
        "n_component bigint, exact_pruned boolean, "
        "component_pruned boolean")


def q_file_skip(spark, sf_dir):
    """FILE-granularity data skipping (``PartitionedTable`` per-file
    ``__files`` stats + ``_file_prune`` — Delta's per-file stats step
    below our directory manifests): orders lands partitioned by
    status with a range-partitioned upstream, so every leaf directory
    holds 4 files covering disjoint o_orderkey quartiles — DIRECTORY
    bounds straddle any mid-range probe (directory skipping alone
    prunes nothing), but per-file bounds cut the scan to ~1 file per
    directory.  In-entry contracts raise (must survive ``python
    -O``): (a) the range probe issues ZERO Spark jobs before the
    pruned scan; (b) the scan lists FEWER files than the table holds
    while touching the SAME directory set (file pruning did the work,
    not directory pruning); (c) the result equals the plain filtered
    read.  The range bounds derive from the table's own metadata
    MIN/MAX (driver-side, no jobs), and the oracle re-derives them
    from SQL MIN/MAX, so the WHERE replays exactly at any SF."""
    import os as _os

    from cs186_query_optimization_project_spark.partitioned import (
        PartitionedTable,
    )

    db = _db(spark, sf_dir)
    with _scratch_base("fskip", sf_dir) as base:
        pt = PartitionedTable.create(
            spark,
            db.table("orders")
            .select("o_orderkey", "o_orderstatus", "o_totalprice")
            .repartitionByRange(4, F.col("o_orderkey")),
            f"{base}/orders", "o_orderstatus")
        mn, mx = pt.metadata_min_max("o_orderkey")
        lo = mn + (mx - mn) * 30 // 100
        hi = mn + (mx - mn) * 35 // 100
        all_files = set(pt.read().inputFiles())
        jobs_before = _job_counter(spark)
        out = pt.read_skipping(ranges={"o_orderkey": (lo, hi)})
        if _job_counter(spark) != int(jobs_before):
            raise RuntimeError(
                "file-granularity skipping scheduled Spark jobs "
                "before the pruned scan; the probe contract is zero")
        scanned = set(out.inputFiles())
        if len(scanned) >= len(all_files):
            raise RuntimeError(
                f"per-file skipping scanned all {len(all_files)} "
                f"files; file bounds pruned nothing")
        if {_os.path.dirname(f) for f in scanned} != \
                {_os.path.dirname(f) for f in all_files}:
            raise RuntimeError(
                "directory set changed — the probe was supposed to "
                "straddle every directory and prune FILES only")
        want = pt.read().filter(F.col("o_orderkey").between(lo, hi))
        got_rows = sorted(map(tuple, out.collect()))
        if got_rows != sorted(map(tuple, want.collect())):
            raise RuntimeError("file skipping != plain filtered read")
        agg = (out.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key")).localCheckpoint())
    return agg


def q_kmv_overlap_group(spark, sf_dir):
    """PER-GROUP key-overlap estimation (``sketches.kmv_overlap_by``
    — the grouped form of ``kmv_overlap``, the per-domain train/eval
    leakage-rate shape): for every order priority, the overlap
    between expensive orders' keys and F-status orders' keys is
    estimated from two ≤256-row per-group sketches, exact counts
    riding alongside.  Per-group state is bounded by k however large
    any group's key set (a rank window after a map-side-distinct
    shuffle).  In-entry contract raises (must survive ``python
    -O``): every group's intersection estimate lands within 25% of
    its exact count (measured 3–7% at both test SFs).  Fully
    oracle-checked: identical portable hashes → identical per-group
    sketches → identical estimates in SQL."""
    from cs186_query_optimization_project_spark.functions import sketches

    db = _db(spark, sf_dir)
    o = db.table("orders")
    a = (o.filter(F.col("o_totalprice") >= 100000)
         .select(F.col("o_orderpriority").alias("priority"),
                 F.col("o_orderkey").alias("key")))
    b = (o.filter(F.col("o_orderstatus") == "F")
         .select(F.col("o_orderpriority").alias("priority"),
                 F.col("o_orderkey").alias("key")))
    est = sketches.kmv_overlap_by(a, b, "key", ["priority"], k=256)
    exact = (a.intersect(b).groupBy("priority")
             .agg(F.count(F.lit(1)).alias("exact_intersection")))
    out = (est.join(exact, "priority", "left")
           .select("priority", "k", "n_union_sketch", "est_a",
                   "est_b", "est_union", "jaccard",
                   "est_intersection",
                   F.coalesce("exact_intersection", F.lit(0))
                   .cast("long").alias("exact_intersection"),
                   F.round(F.abs(F.col("est_intersection")
                                 - F.coalesce("exact_intersection",
                                              F.lit(0)))
                           / F.greatest(
                               F.coalesce("exact_intersection",
                                          F.lit(0)), F.lit(1)), 4)
                   .alias("rel_error")))
    rows = out.collect()
    bad = [(r["priority"], r["rel_error"]) for r in rows
           if r["rel_error"] > 0.25]
    if bad:
        raise RuntimeError(
            f"per-group KMV intersection estimates beyond the 25% "
            f"loud bound: {bad}")
    return _ldf(spark, rows, out.schema)


def q_boilerplate_strip(spark, sf_dir):
    """C4/RefinedWeb-style LINE-level boilerplate removal
    (``text.strip_boilerplate``) — the cleaning step document-level
    dedup cannot express: a line appearing in ≥50% of a domain's
    documents (nav bars, cookie banners, footers) is stripped from
    every document of that domain, survivors reassembling in original
    line order.  The flat synthetic corpus has no newlines, so each
    doc is re-lined deterministically (8-token chunks) and every doc
    gains its domain's footer line — which the ratio rule must then
    strip from 100% of the domain while content lines survive (the
    oracle replays the RULE, not the plantation, so even natural
    line collisions match).  Output pins doc-level line counts and
    the md5 of the rebuilt text, making any reassembly-order or
    strip-set bug a hash mismatch on every affected doc."""
    db = _db(spark, sf_dir)
    docs = db.table("documents").selectExpr(
        "doc_id", "source",
        "concat(array_join(transform("
        "  sequence(0, cast(ceil(size(split(text, '\\\\s+')) / 8.0) "
        "           as int) - 1),"
        "  i -> array_join(slice(split(text, '\\\\s+'), i * 8 + 1, 8),"
        "                  ' ')), '\\n'),"
        " '\\n', 'footer for ', source) AS text")
    out = text.strip_boilerplate(docs, min_doc_ratio=0.5)
    return out.select(
        "doc_id", "source", "n_lines", "n_kept",
        F.md5(F.col("text")).alias("text_hash"))


def q_ann_filtered(spark, sf_dir):
    """FILTERED vector search over the materialized IVF index
    (``similarity.ivf_probe(..., where="label = 2")`` — the metadata-
    constrained top-k every RAG/retrieval stack needs: "nearest
    neighbors among label=2 only").  The predicate applies INSIDE the
    partition-pruned scan, BEFORE ranking, so all k results satisfy it
    — post-filtering an unfiltered top-k would silently return fewer
    than k rows whenever the filter is selective.  In-entry contract
    raises (must survive ``python -O``): every returned row carries
    the filtered label, and the result DIFFERS from the unfiltered
    top-10 (the filter did real work).  Round 14 extended the
    contract to the two remaining index paths: ``sq8_topk(where=)``
    must return k all-predicate rows while post-filtering the
    unfiltered top-k demonstrably under-returns, and
    ``lsh_probe(where=)`` must return only predicate rows from its
    bucket.  Fully oracle-checked: the oracle replays centroid pick,
    cell assignment, 4-cell probe, and the label-constrained exact
    top-10 end-to-end in SQL."""
    idx = _ann_index(spark, sf_dir, "ivf")
    out = similarity.ivf_probe(spark, idx, _query_vec(spark, sf_dir),
                               k=10, n_probe=4, where="label = 2")
    rows = out.collect()
    db = _db(spark, sf_dir)
    labels = dict(
        db.table("embeddings")
        .join(_ldf(spark,
            [(int(r["vec_id"]),) for r in rows], "vec_id bigint"),
            "vec_id")
        .select("vec_id", "label").collect())
    bad = [v for v, lb in labels.items() if lb != 2]
    if bad:
        raise RuntimeError(
            f"filtered ANN returned rows outside the predicate: {bad}")
    unfiltered = {r["vec_id"] for r in similarity.ivf_probe(
        spark, idx, _query_vec(spark, sf_dir), k=10,
        n_probe=4).select("vec_id").collect()}
    if {r["vec_id"] for r in rows} == unfiltered:
        raise RuntimeError(
            "filtered top-10 equals the unfiltered top-10 — the "
            "predicate did no work; pick a more selective filter")
    # the SAME where= contract on the two remaining index paths
    # (round-14: lsh_probe / sq8_topk gained the ivf_probe semantics).
    # sq8: every returned row satisfies the predicate, AND
    # post-filtering the UNFILTERED top-10 under-returns on this data
    # — the silent-truncation failure mode the in-scan predicate
    # exists to prevent.
    emb = db.table("embeddings")
    qv = _query_vec(spark, sf_dir)
    sq_f = similarity.sq8_topk(emb, qv, k=10, where="label = 2") \
        .collect()
    sq_ids = [int(r["vec_id"]) for r in sq_f]
    sq_lab = dict(emb.filter(F.col("vec_id").isin(sq_ids))
                  .select("vec_id", "label").collect())
    if len(sq_f) != 10 or any(sq_lab[v] != 2 for v in sq_ids):
        raise RuntimeError("sq8_topk(where=) returned rows outside "
                           "the predicate or under-returned")
    sq_unf = [int(r["vec_id"]) for r in
              similarity.sq8_topk(emb, qv, k=10).collect()]
    unf_lab = dict(emb.filter(F.col("vec_id").isin(sq_unf))
                   .select("vec_id", "label").collect())
    if sum(1 for v in sq_unf if unf_lab[v] == 2) >= 10:
        raise RuntimeError(
            "unfiltered sq8 top-10 is all label=2 — the under-return "
            "contrast is vacuous on this data")
    # lsh: the filtered bucket probe returns only predicate rows
    lidx = _ann_index(spark, sf_dir, "lsh")
    lsh_f = similarity.lsh_probe(spark, lidx, qv, k=10,
                                 where="label = 2").collect()
    lsh_ids = [int(r["vec_id"]) for r in lsh_f]
    lsh_lab = dict(emb.filter(F.col("vec_id").isin(lsh_ids))
                   .select("vec_id", "label").collect())
    if not lsh_f or any(lsh_lab[v] != 2 for v in lsh_ids):
        raise RuntimeError("lsh_probe(where=) returned rows outside "
                           "the predicate (or nothing)")
    return _ldf(spark,
        [(int(r["vec_id"]), float(r["cosine_sim"])) for r in rows],
        "vec_id bigint, cosine_sim double")


def q_nb_classify(spark, sf_dir):
    """Trained document classification — multinomial Naive Bayes
    (``classify.nb_train`` / ``nb_predict``): the LEARNED complement
    of the heuristic quality filters, and the one trainable model
    whose full train-and-apply lifecycle is pure aggregation (two
    group-bys to train, an explode-join-sum to score — no iteration,
    no UDF, exactly replayable in SQL).  Trains lang-vs-token
    likelihoods on the ``doc_id % 5 != 0`` split, predicts the
    held-out fifth, and returns one row per held-out doc with the
    prediction, its rounded log-posterior, and correctness against
    the true label (0.42 accuracy over a 0.2 five-class baseline at
    sf0.01 — the synthetic langs do differ in token distribution).
    Scores round to 6dp BEFORE the argmax so near-ties resolve by the
    deterministic label-ascending tie-break on both engines."""
    db = _db(spark, sf_dir)
    docs = db.table("documents")
    train = docs.filter(F.col("doc_id") % 5 != 0)
    test = docs.filter(F.col("doc_id") % 5 == 0)
    model = classify.nb_train(train, "text", "lang", alpha=1.0)
    pred = classify.nb_predict(model, test)
    return (pred.join(test.select("doc_id", "lang"), "doc_id")
            .select("doc_id", "predicted",
                    F.col("score").alias("log_posterior"),
                    (F.col("predicted") == F.col("lang"))
                    .alias("correct")))


def q_kmv_overlap(spark, sf_dir):
    """Cross-dataset KEY-OVERLAP estimation from two k-row KMV/theta
    sketches (``sketches.kmv_overlap`` — the |A ∩ B| question HLL
    cannot answer: register-max merge only unions).  A = orderkeys of
    expensive orders, B = orderkeys with any bulk lineitem — two
    independently-buildable 256-row summaries replace the exact
    distinct join; the estimate is the union sketch's Jaccard scaled
    by the union estimate.  Exact counts ride alongside for accuracy
    reporting, and the in-entry contract raises (must survive
    ``python -O``) if the intersection estimate misses the exact
    count by more than 25% (k=256 → ~6% typical error; 25% is the
    loud-failure bound).  Fully oracle-checked: the portable-md5
    hashes make every sketch row — hence every estimate — exactly
    SQL-replayable, not just statistically close."""
    from cs186_query_optimization_project_spark.functions import sketches

    db = _db(spark, sf_dir)
    a = db.table("orders").filter(F.col("o_totalprice") >= 100000) \
        .select(F.col("o_orderkey").alias("k"))
    b = db.table("lineitem").filter(F.col("l_quantity") >= 25) \
        .select(F.col("l_orderkey").alias("k"))
    est = sketches.kmv_overlap(a, b, "k", k=256)
    exact = (a.intersect(b)
             .agg(F.count(F.lit(1)).alias("exact_intersection")))
    out = (est.crossJoin(F.broadcast(exact))
           .select("k", "n_union_sketch", "est_a", "est_b",
                   "est_union", "jaccard", "est_intersection",
                   F.col("exact_intersection").cast("long")
                   .alias("exact_intersection"),
                   F.round(F.abs(F.col("est_intersection")
                                 - F.col("exact_intersection"))
                           / F.greatest(F.col("exact_intersection"),
                                        F.lit(1)), 4)
                   .alias("rel_error")))
    row = out.collect()[0]
    if row["rel_error"] > 0.25:
        raise RuntimeError(
            f"KMV intersection estimate off by {row['rel_error']:.1%} "
            f"(estimate {row['est_intersection']}, exact "
            f"{row['exact_intersection']}) — beyond the k=256 bound")
    return _ldf(spark, [tuple(row)], out.schema)


def q_expectations(spark, sf_dir):
    """Declarative data-quality expectations
    (``profiling.expectations_report`` — the Delta Live Tables
    ``EXPECT`` report shape): named SQL boolean rules evaluated in ONE
    aggregate pass, each a conditional-sum riding the same map-side
    scan; FALSE **or NULL** counts as a violation (an unknown cannot
    certify quality — the DLT/CHECK convention).  In-entry contract
    raises (must survive ``python -O``): the 4-rule report schedules
    exactly as many Spark jobs as a 1-rule report (one scan however
    many rules); ``expect_or_drop`` keeps exactly the rows every rule
    passes; ``expect_or_fail`` raises the named error listing the
    failing rules.  The oracle replays each rule's violation count in
    SQL."""
    from cs186_query_optimization_project_spark.errors import (
        DatabaseException,
    )
    from cs186_query_optimization_project_spark.functions import (
        profiling,
    )

    db = _db(spark, sf_dir)
    orders = db.table("orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice",
        "o_orderpriority").localCheckpoint()
    rules = {
        "price_positive": "o_totalprice > 0",
        "status_known": "o_orderstatus in ('O','F','P')",
        "priority_wellformed": "o_orderpriority like '_-%'",
        "price_under_cap": "o_totalprice < 100000",
    }
    jobs_before = _job_counter(spark)
    profiling.expectations_report(
        orders, {"price_positive": "o_totalprice > 0"}).collect()
    one_rule_jobs = _job_counter(spark) - jobs_before
    jobs_before = _job_counter(spark)
    rep = profiling.expectations_report(orders, rules)
    got = {r["expectation"]: r for r in rep.collect()}
    if _job_counter(spark) - jobs_before != one_rule_jobs:
        raise RuntimeError(
            "4-rule report scheduled more jobs than the 1-rule one — "
            "the one-scan contract is broken")
    n_kept = profiling.expect_or_drop(orders, rules).count()
    n_expected = orders.filter(
        " AND ".join(f"({s})" for s in rules.values())).count()
    if n_kept != n_expected:
        raise RuntimeError(
            f"expect_or_drop kept {n_kept}, want {n_expected}")
    failing = [k for k, r in got.items() if not r["passed"]]
    try:
        profiling.expect_or_fail(orders, rules)
        if failing:
            raise RuntimeError("expect_or_fail must raise when any "
                               "rule has violations")
    except DatabaseException as exc:
        if not failing:
            raise RuntimeError("expect_or_fail raised on a clean "
                               "table") from exc
        if failing[0] not in str(exc):
            raise RuntimeError(
                f"error message names no failing rule: {exc}")
    return rep.orderBy("expectation")


def q_semantic_contamination(spark, sf_dir):
    """Semantic decontamination (``similarity.cross_similar_pairs`` —
    embedding near-matches ACROSS datasets): which corpus rows are
    near-duplicates of an eval/benchmark set?  Both sides hash with
    the SAME seeded 6-plane LSH, candidates collide only within
    buckets (corpus ⋈ reference on the signature — never a self-join,
    never all-pairs; the small reference side broadcasts), exact
    cosine ≥ 0.9 confirms.  The synthetic corpus has no natural
    near-dups, so the eval set PLANTS perturbed copies of every 20th
    corpus vector (first component +0.05, ids offset by 2e6).  Fully
    oracle-checked: the perturbation is float-exact in SQL and the
    bucket equality + rounded cosine reproduce the hit set
    bit-for-bit."""
    db = _db(spark, sf_dir)
    emb = db.table("embeddings")
    ref = (emb.filter(F.col("vec_id") % 20 == 0)
           .select((F.col("vec_id") + 2000000).alias("vec_id"),
                   F.expr("transform(embedding, (x, i) -> "
                          "CASE WHEN i = 0 THEN x + CAST(0.05 AS FLOAT) "
                          "ELSE x END)").alias("embedding")))
    return similarity.cross_similar_pairs(emb, ref, threshold=0.9,
                                          n_planes=6)


def q_group_split(spark, sf_dir):
    """Leakage-guarded train/test split: hashing the GROUP key
    (``source``) instead of the row id sends every document of a
    source to the SAME side — the split that prevents near-duplicate
    leakage across train/test when groups share content (the standard
    GroupShuffleSplit discipline, here as the deterministic
    ``sampling.hash_split`` over the group column: membership depends
    only on the key, never on partitioning).  In-entry contract raises
    (must survive ``python -O``): no source may appear on both sides.
    The oracle replays the md5 bucket of the group key in SQL."""
    db = _db(spark, sf_dir)
    out = (sampling.hash_split(db.table("documents"), "source")
           .select("doc_id", "source", "split"))
    mixed = (out.groupBy("source")
             .agg(F.countDistinct("split").alias("n"))
             .filter(F.col("n") > 1).count())
    if mixed:
        raise RuntimeError(
            f"{mixed} groups appear in BOTH splits — the leakage "
            f"guard is broken")
    return out


# ===================================================================== #
# registry
# ===================================================================== #
def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # ORDER MATTERS: the driver's correctness harness checks the FIRST 50
    # entries in registry order.  Round-17 policy (the r16 verdict's #1
    # item): the window is the 30 rows whose newest driver evidence is
    # r12 plus the 20 stalest r13-era rows (the head of the
    # stalest-first below-window ordering).  After this round no
    # entry's driver evidence is older than r13 (histogram going in:
    # r12=30, r13=50, r14=50, r15=50, r16=50).  Every query -- in or
    # below the window -- is verified each round by
    # tools/check_contract.py at sf0.01 and the full-registry result is
    # committed as LOCALCHECK_r<N>.json.
    return {
        # --- stalest rows: driver evidence r12 (30) ---
        "hll_distinct": q_hll_distinct,
        "incremental_agg": q_incremental_agg,
        "kmeans_clusters": q_kmeans_clusters,
        "merge_upsert": q_merge_upsert,
        "null_safe_join": q_null_safe_join,
        "pagerank": q_pagerank,
        "pii_redact": q_pii_redact,
        "pivot": q_pivot,
        "resample_fill": q_resample_fill,
        "scd2_dimension": q_scd2_dimension,
        "streaming_outer_join": q_streaming_outer_join,
        "table_histogram": q_table_histogram,
        "tfidf_features": q_tfidf_features,
        "tpch_q11": q_tpch_q11,
        "tpch_q12": q_tpch_q12,
        "tpch_q13": q_tpch_q13,
        "tpch_q15": q_tpch_q15,
        "tpch_q16": q_tpch_q16,
        "tpch_q17": q_tpch_q17,
        "tpch_q19": q_tpch_q19,
        "tpch_q2": q_tpch_q2,
        "tpch_q20": q_tpch_q20,
        "tpch_q21": q_tpch_q21,
        "tpch_q7": q_tpch_q7,
        "tpch_q8": q_tpch_q8,
        "tpch_q9": q_tpch_q9,
        "triangle_count": q_triangle_count,
        "udtf_sentences": q_udtf_sentences,
        "vocab_top": q_vocab_top,
        "zscore_outliers": q_zscore_outliers,
        # --- stalest r13-era rows (20) ---
        "ann_recall": q_ann_recall,
        "asset_resize": q_asset_resize,
        "bm25_indexed": q_bm25_indexed,
        "bm25_search": q_bm25_search,
        "bpe_merges": q_bpe_merges,
        "bpe_segment": q_bpe_segment,
        "cms_reconcile": q_cms_reconcile,
        "collect_sorted": q_collect_sorted,
        "compact_scan": q_compact_scan,
        "correlation_matrix": q_correlation_matrix,
        "dedup_apply": q_dedup_apply,
        "dedup_clusters": q_dedup_clusters,
        "dedup_eval": q_dedup_eval,
        "dedup_incremental": q_dedup_incremental,
        "dml_lifecycle": q_dml_lifecycle,
        "dup_span_coverage": q_dup_span_coverage,
        "dup_spans": q_dup_spans,
        "epoch_shuffle": q_epoch_shuffle,
        "expectations": q_expectations,
        "frame_sample": q_frame_sample,
        # ------------- below the driver's 50-row window ------------- #
        # Everything below is ordered stalest-first so the round-18
        # rotation is mechanical; every entry is re-verified each round
        # by tools/check_contract.py at sf0.01 (LOCALCHECK_r17.json).
        # remaining r13-green rows:
        "grace_hash_join": q_grace_hash_join,
        "group_split": q_group_split,
        "hll_by_group": q_hll_by_group,
        "hll_reconcile": q_hll_reconcile,
        "index_range_scan": q_index_range_scan,
        "indexed_write_scan": q_indexed_write_scan,
        "ivfpq_batch": q_ivfpq_batch,
        "join_three_flagship": q_join_three_flagship,
        "key_skew": q_key_skew,
        "ks_drift": q_ks_drift,
        "mixture_sample": q_mixture_sample,
        "mixture_temperature": q_mixture_temperature,
        "multi_skip": q_multi_skip,
        "mview_minmax_delete": q_mview_minmax_delete,
        "ngram_jaccard": q_ngram_jaccard,
        "phrase_indexed": q_phrase_indexed,
        "phrase_search": q_phrase_search,
        "psi_drift": q_psi_drift,
        "quality_filter": q_quality_filter,
        "sample_k_per_group": q_sample_k_per_group,
        "semantic_contamination": q_semantic_contamination,
        "semantic_dedup": q_semantic_dedup,
        "similar_docs": q_similar_docs,
        "streaming_cms": q_streaming_cms,
        "streaming_hll": q_streaming_hll,
        "text_source": q_text_source,
        "time_travel": q_time_travel,
        "url_dedup": q_url_dedup,
        "weighted_sample": q_weighted_sample,
        "window_ntile": q_window_ntile,
        # r14-green rows:
        "ann_filtered": q_ann_filtered,
        "asof_join": q_asof_join,
        "audio_chunks": q_audio_chunks,
        "bm25_incremental": q_bm25_incremental,
        "boilerplate_strip": q_boilerplate_strip,
        "broadcast_join": q_broadcast_join,
        "cdf_feed": q_cdf_feed,
        "cdf_stream": q_cdf_stream,
        "check_constraints": q_check_constraints,
        "contains_key": q_contains_key,
        "csv_source": q_csv_source,
        "dedup_exact": q_dedup_exact,
        "disjunct_skip": q_disjunct_skip,
        "embedding_quantize": q_embedding_quantize,
        "embedding_topk": q_embedding_topk,
        "except": q_except,
        "except_all": q_except_all,
        "explode_array": q_explode_array,
        "file_skip": q_file_skip,
        "filter_eq": q_filter_eq,
        "filter_range": q_filter_range,
        "groupby_count": q_groupby_count,
        "groupby_sum_avg": q_groupby_sum_avg,
        "hybrid_search": q_hybrid_search,
        "inlist_skip": q_inlist_skip,
        "intersect_all": q_intersect_all,
        "ivfpq_filtered": q_ivfpq_filtered,
        "ivfpq_probe": q_ivfpq_probe,
        "join_two": q_join_two,
        "kmv_overlap": q_kmv_overlap,
        "kmv_overlap_group": q_kmv_overlap_group,
        "lang_id": q_lang_id,
        "left_outer_join": q_left_outer_join,
        "lookup_key": q_lookup_key,
        "mad_outliers": q_mad_outliers,
        "metadata_agg": q_metadata_agg,
        "metadata_group_minmax": q_metadata_group_minmax,
        "multi_partition": q_multi_partition,
        "multimodal_features": q_multimodal_features,
        "mvcc_vacuum": q_mvcc_vacuum,
        "mview_refresh": q_mview_refresh,
        "mview_variance": q_mview_variance,
        "nb_classify": q_nb_classify,
        "pipeline_corpus_full": q_pipeline_corpus_full,
        "repartition_evolution": q_repartition_evolution,
        "scan": q_scan,
        "token_counts": q_token_counts,
        "tpch_q1": q_tpch_q1,
        "tpch_q22": q_tpch_q22,
        "tpch_q5": q_tpch_q5,
        # r15-green rows (the r15 window -- freshest driver evidence):
        "ann_batch_queries": q_ann_batch_queries,
        "anti_join": q_anti_join,
        "bloom_skipping": q_bloom_skipping,
        "bm25_remove": q_bm25_remove,
        "bucketed_join": q_bucketed_join,
        "case_expr": q_case_expr,
        "chunk_documents": q_chunk_documents,
        "clone_vacuum_guard": q_clone_vacuum_guard,
        "cube": q_cube,
        "dedup_clusters_star": q_dedup_clusters_star,
        "distinct": q_distinct,
        "doc_repetition": q_doc_repetition,
        "embedding_ann_ivf": q_embedding_ann_ivf,
        "embedding_ann_lsh": q_embedding_ann_lsh,
        "embedding_similar_pairs": q_embedding_similar_pairs,
        "filter_neq": q_filter_neq,
        "hadoop_lifecycle": q_hadoop_lifecycle,
        "having": q_having,
        "intersect": q_intersect,
        "ivfpq_append": q_ivfpq_append,
        "json_extract": q_json_extract,
        "json_source": q_json_source,
        "optimizer_cardinality": q_optimizer_cardinality,
        "orderby_limit": q_orderby_limit,
        "partition_skipping": q_partition_skipping,
        "partitioned_dml": q_partitioned_dml,
        "partitioned_merge": q_partitioned_merge,
        "pipeline_clean_corpus": q_pipeline_clean_corpus,
        "pq_ann": q_pq_ann,
        "preference_pairs": q_preference_pairs,
        "project": q_project,
        "quantiles": q_quantiles,
        "restore_clone": q_restore_clone,
        "rollup": q_rollup,
        "scalar_functions": q_scalar_functions,
        "schema_evolution": q_schema_evolution,
        "self_join_alias": q_self_join_alias,
        "semi_join": q_semi_join,
        "sessionize": q_sessionize,
        "soft_delete": q_soft_delete,
        "stream_to_mview": q_stream_to_mview,
        "streaming_dedup": q_streaming_dedup,
        "streaming_enrich": q_streaming_enrich,
        "streaming_session": q_streaming_session,
        "streaming_sliding": q_streaming_sliding,
        "streaming_tumbling": q_streaming_tumbling,
        "table_history": q_table_history,
        "text_stats": q_text_stats,
        "train_test_split": q_train_test_split,
        "window_rank": q_window_rank,
        # r16-green rows (the r16 window -- freshest driver evidence):
        "bigram_lm": q_bigram_lm,
        "bloom_semi_join": q_bloom_semi_join,
        "cms_heavy_hitters": q_cms_heavy_hitters,
        "cohort_retention": q_cohort_retention,
        "constraint_check": q_constraint_check,
        "containment_apply": q_containment_apply,
        "containment_near_dups": q_containment_near_dups,
        "contamination_check": q_contamination_check,
        "cross_join": q_cross_join,
        "doc_fingerprints": q_doc_fingerprints,
        "doc_logprob": q_doc_logprob,
        "encode_documents": q_encode_documents,
        "frequent_pairs": q_frequent_pairs,
        "full_outer_join": q_full_outer_join,
        "funnel": q_funnel,
        "fuzzy_dedup_edit": q_fuzzy_dedup_edit,
        "grouping_sets": q_grouping_sets,
        "ivfpq_remove": q_ivfpq_remove,
        "metadata_groupby": q_metadata_groupby,
        "minhash_near_dups": q_minhash_near_dups,
        "mview_bucketed": q_mview_bucketed,
        "mview_hll_distinct": q_mview_hll_distinct,
        "orc_source": q_orc_source,
        "pack_sequences": q_pack_sequences,
        "partition_overwrite": q_partition_overwrite,
        "partition_pruned_join": q_partition_pruned_join,
        "quantiles_approx": q_quantiles_approx,
        "range_join": q_range_join,
        "salted_join": q_salted_join,
        "simhash_near_dups": q_simhash_near_dups,
        "stratified_sample": q_stratified_sample,
        "streaming_interval_join": q_streaming_interval_join,
        "streaming_stateful_totals": q_streaming_stateful_totals,
        "summary_stats": q_summary_stats,
        "time_travel_ts": q_time_travel_ts,
        "time_window_agg": q_time_window_agg,
        "token_budget_mix": q_token_budget_mix,
        "tpch_q10": q_tpch_q10,
        "tpch_q14": q_tpch_q14,
        "tpch_q18": q_tpch_q18,
        "tpch_q3": q_tpch_q3,
        "tpch_q4": q_tpch_q4,
        "tpch_q6": q_tpch_q6,
        "txn_2pl_serial": q_txn_2pl_serial,
        "txn_snapshot_isolation": q_txn_snapshot_isolation,
        "union": q_union,
        "unpivot": q_unpivot,
        "window_frame": q_window_frame,
        "window_running": q_window_running,
        "zorder_scan": q_zorder_scan,
    }


# ===================================================================== #
# oracles
# ===================================================================== #
def _lang_scores_sql() -> tuple[str, str]:
    """(WITH-clause fragment defining per-language scores, CASE expr) —
    generated from the same LANG_MARKERS table the engine uses."""
    defs = []
    for lang, words in text.LANG_MARKERS.items():
        parts = [
            f"CAST((length(' ' || text || ' ') - "
            f"length(replace(' ' || text || ' ', ' {w} ', ''))) "
            f"/ {len(w) + 2} AS INT)"
            for w in words
        ]
        defs.append(f"({' + '.join(parts)}) AS s_{lang}")
    langs = list(text.LANG_MARKERS)
    best = "greatest(" + ", ".join(f"s_{lang}" for lang in langs) + ")"
    case = "CASE " + " ".join(
        f"WHEN s_{lang} = {best} AND {best} > 0 THEN '{lang}'"
        for lang in langs) + " ELSE 'und' END"
    return ", ".join(defs), case


_TEXT_PROFILE_SQL = """
WITH t AS (
  SELECT doc_id, text,
         len(regexp_split_to_array(text, '\\s+')) AS n_tokens,
         length(text) AS n_chars_computed,
         length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
           / greatest(length(text), 1) AS alpha_ratio,
         length(regexp_replace(text, '\\s+', '', 'g'))
           / greatest(len(regexp_split_to_array(text, '\\s+')), 1) AS tok_avg
  FROM documents
)
SELECT doc_id, n_tokens, n_chars_computed,
       round(alpha_ratio, 6) AS alpha_ratio,
       round(0.4 * alpha_ratio
             + 0.3 * (CASE WHEN tok_avg >= 3.0 AND tok_avg <= 10.0
                           THEN 1.0 ELSE 0.5 END)
             + 0.3 * least(n_chars_computed / 500.0, 1.0), 6) AS quality,
       {lang_case} AS lang_pred,
       md5(text) AS fingerprint
FROM (SELECT *, {lang_defs} FROM t)
"""


#: FROZEN copy of dedup._affine_params(32, 42) — the oracle's
#: independence from the engine's generator (see oracle_sql note).
_MINHASH_AFFINE_32_SEED42 = [
    (583350466, 142378351), (952521172, 876502179), (249989299, 789851165),
    (162869062, 124583475), (571960639, 305229986), (277094826, 450939966),
    (23527377, 920453611), (317285309, 818140468), (986594755, 75546018),
    (883334098, 982039103), (900826638, 287678152), (77583870, 745719891),
    (287298359, 82767796), (977223290, 909634511), (493840144, 897530700),
    (513827471, 645587132), (690418846, 313383925), (290058267, 522671167),
    (882325109, 659681338), (835568379, 918001331), (563655137, 231334905),
    (593662787, 226427601), (905528997, 606369966), (842747702, 280579632),
    (330248533, 732559832), (346420244, 339625070), (131745421, 241675048),
    (666768180, 80764966), (763917881, 246210665), (314684960, 666299036),
    (429909205, 842389730), (849569558, 277803767),
]

#: md5-of-repr checksums of similarity._hyperplanes(64, n, 42) for the
#: plane counts the ANN entries use.  The ANN oracles inline the plane
#: values as SQL literals (640 doubles — generated, not hand-frozen);
#: these digests pin the generator's output so a generator change breaks
#: the oracle construction LOUDLY instead of silently mirroring into it.
_HYPERPLANE_MD5 = {
    4: "abfdbe15e67e5129f56a1468edcde00f",
    6: "31051120b0340378f051c43918e3c3c2",
}


def _frozen_hyperplanes(n_planes: int, dim: int = 64) -> list[list[float]]:
    import hashlib

    planes = similarity._hyperplanes(dim, n_planes, 42)
    digest = hashlib.md5(repr(planes).encode()).hexdigest()
    if digest != _HYPERPLANE_MD5[n_planes]:
        raise AssertionError(
            f"hyperplane generator drifted (n_planes={n_planes}: {digest}); "
            f"the ANN oracles no longer describe the engine's buckets")
    return planes


def _sql_vec(vec: list[float]) -> str:
    """A DOUBLE[] literal with full round-trip precision."""
    return "[" + ", ".join(repr(float(v)) for v in vec) + "]::DOUBLE[]"


def _lsh_sig_sql(planes: list[list[float]], vec_expr: str) -> str:
    """Bit-pack sign-of-projection exactly as similarity.lsh_signature:
    bit i set iff dot(v, plane_i) >= 0.  DuckDB's list_dot_product is
    bit-identical to the engine's sequential double fold (verified over
    the full corpus), so bucket membership reproduces exactly."""
    return " + ".join(
        f"(CASE WHEN list_dot_product({vec_expr}, {_sql_vec(p)}) >= 0 "
        f"THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes))


#: md5-of-repr of similarity.kmeans_init(64, 8, 42) — same pinning
#: contract as _HYPERPLANE_MD5: the k-means oracle inlines the init
#: centroids as literals; a generator change must break the oracle
#: construction loudly, not mirror into it.
_KMEANS_INIT_MD5 = "f2c5bff4c903bf58f044859a1bae3442"


def _frozen_kmeans_init(k: int = 8, dim: int = 64) -> list[list[float]]:
    import hashlib

    cents = similarity.kmeans_init(dim, k, 42)
    digest = hashlib.md5(repr(cents).encode()).hexdigest()
    if digest != _KMEANS_INIT_MD5:
        raise AssertionError(
            f"kmeans_init generator drifted ({digest}); the kmeans oracle "
            f"no longer describes the engine's initial centroids")
    return cents


def _kmeans_sql(k: int = 8, dim: int = 64) -> str:
    """SQL replay of similarity.kmeans_summary(k, n_iter=1): assign to
    frozen init centroids (distances rounded to 6 before the argmin,
    ties to the lowest cluster id — exactly kmeans_assign), update the
    centroids as 6-decimal-rounded per-dimension means (exactly
    kmeans_update, empty clusters keep init), re-assign, then roll up.
    The 6-decimal quantization at every cross-engine boundary is what
    makes an iterative float algorithm hash-comparable."""
    cents = _frozen_kmeans_init(k, dim)
    cvecs = ", ".join(_sql_vec(c) for c in cents)
    dist = (f"list_sum(list_transform(range(1, {dim + 1}), "
            f"i -> (v[i] - cv[i]) * (v[i] - cv[i])))")
    avgs = ", ".join(f"round(avg(v[{d + 1}]), 6) AS a{d + 1}"
                     for d in range(dim))
    newc = ("[" + ", ".join(f"COALESCE(u.a{d + 1}, c0.cv[{d + 1}])"
                            for d in range(dim)) + "]")
    return (
        f"WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v "
        f"FROM embeddings), "
        f"c0 AS (SELECT unnest(range(0, {k})) AS cid, "
        f"unnest([{cvecs}]) AS cv), "
        f"a0 AS (SELECT * FROM ("
        f"SELECT vec_id, v, cid, round({dist}, 6) AS d "
        f"FROM e CROSS JOIN c0) "
        f"QUALIFY row_number() OVER (PARTITION BY vec_id "
        f"ORDER BY d, cid) = 1), "
        f"u AS (SELECT cid, {avgs} FROM a0 GROUP BY cid), "
        f"c1 AS (SELECT c0.cid, {newc} AS cv FROM c0 "
        f"LEFT JOIN u ON c0.cid = u.cid), "
        f"a1 AS (SELECT * FROM ("
        f"SELECT vec_id, cid, round({dist}, 6) AS d "
        f"FROM e CROSS JOIN c1) "
        f"QUALIFY row_number() OVER (PARTITION BY vec_id "
        f"ORDER BY d, cid) = 1) "
        f"SELECT cid::INTEGER AS cluster, "
        f"CAST(COUNT(*) AS BIGINT) AS n_members, "
        f"round(avg(d), 4) AS mean_sq_dist "
        f"FROM a1 GROUP BY cid ORDER BY cluster")


# shared by ngram_jaccard and dedup_clusters — the SQL re-encoding of
# _planted_docs + dedup.ngram_jaccard_pairs' shingling (module-level so
# tests can rebuild the clustering at other unroll depths)
_NGRAM_SH_SQL = (
    "corpus AS ("
    "  SELECT doc_id, text FROM documents"
    "  UNION ALL"
    "  SELECT doc_id + 1000000, text || ' appendix' FROM documents"
    "  WHERE doc_id % 10 = 0), "
    "sh AS ("
    "  SELECT doc_id, list_distinct("
    "    CASE WHEN len(toks) <= 3"
    "         THEN [array_to_string(toks, ' ')]"
    "         ELSE list_transform(range(1, len(toks) - 1),"
    "              i -> toks[i] || ' ' || toks[i+1] || ' ' "
    "                   || toks[i+2]) END) AS s"
    "  FROM (SELECT doc_id, regexp_split_to_array(text, '\\s+') "
    "        AS toks FROM corpus))")
_JACC_SQL = ("len(list_intersect(a.s, b.s))::DOUBLE "
             "/ (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))")
# Pair detection is blocked on a shared shingle (exact: Jaccard >=
# 0.6 > 0 implies at least one common shingle, so the equi-join on
# exploded shingles loses no qualifying pair) — this replaces the
# O(n^2) all-pairs Jaccard scan with an inverted-index join, the
# same candidate-generation asymptotics the engine's LSH side has.
_NGRAM_BLOCK_SQL = (
    "ex AS (SELECT doc_id, unnest(s) AS g FROM sh), "
    "cand AS (SELECT DISTINCT l.doc_id AS ca, r.doc_id AS cb "
    "FROM ex l JOIN ex r ON l.g = r.g AND l.doc_id < r.doc_id)")


def _ngram_cc_sql(rounds: int = 5) -> str:
    """dedup_clusters oracle: connected components as FIXED-ROUND
    unrolled min-label propagation (the pagerank oracle's pattern)
    instead of a recursive CTE: DuckDB's ``reach`` recursion enumerates
    every (node, reachable-comp) path and took ~25 min at sf0.1; five
    bounded rounds cost five small joins.  Round k's label is the min
    over every node within k hops, so round k is exact for components
    of diameter <= k; the planted pair graph's largest component is 5
    nodes (diameter <= 4) at sf0.1 — 5 rounds has a full round of
    slack, and tests/test_property_oracle.py pins the fixed point
    (round 5 == round 4 would catch a too-deep graph) at sf0.001,
    sf0.01 AND sf0.1.  DuckDB inlines multiply-referenced CTEs (AS
    MATERIALIZED exists but serializes the whole pipeline — slower), so
    the edge list is built with ONE ``pairs`` reference (zipped unnest
    emits both directions + self-loops) and round 1 folds the identity
    labels into a plain MIN — ``pairs`` is evaluated once per round,
    not 2-3x per round.

    COST, measured at sf0.1 (5,500 docs, ~1.37M blocked candidate
    pairs): rounds=5 runs in ~30 s — driver-feasible, not free; the
    Jaccard verification pass over the blocked candidates dominates.
    Because each unroll round re-inlines the ``pairs`` pipeline, cost
    grows SUPER-LINEARLY in ``rounds`` (rounds=6 measured ~500 s) —
    do not bump the unroll depth casually; if a deeper component ever
    appears, switch the oracle to a pre-materialized temp table for
    ``pairs`` instead of raising ``rounds``."""
    assert rounds >= 2, "rounds=1 emits invalid SQL (empty cc_iters)"
    ngram_pairs = (
        f"{_NGRAM_BLOCK_SQL}, "
        f"pairs AS (SELECT ca AS a, cb AS b FROM cand "
        f"JOIN sh a ON a.doc_id = ca JOIN sh b ON b.doc_id = cb "
        f"WHERE {_JACC_SQL} >= 0.6)")
    cc_iters = ", ".join(
        f"l{i} AS (SELECT ed.u AS id, MIN(l{i-1}.lbl) AS lbl "
        f"FROM ed JOIN l{i-1} ON ed.v = l{i-1}.id GROUP BY ed.u)"
        for i in range(2, rounds + 1))
    return (
        f"WITH {_NGRAM_SH_SQL}, {ngram_pairs}, "
        f"ed AS (SELECT unnest([a, b, a, b]) AS u, "
        f"unnest([b, a, a, b]) AS v FROM pairs), "
        f"l1 AS (SELECT u AS id, MIN(v) AS lbl FROM ed GROUP BY u), "
        f"{cc_iters} "
        f"SELECT id AS doc_id, lbl AS cluster_id FROM l{rounds}")


def _bpe_sql(rounds: int = 5) -> str:
    """bpe_merges oracle: the merge loop unrolled as MATERIALIZED CTEs.

    Mirrors functions/bpe.py exactly: same " a  b  c " sequence
    representation, same literal-replace merge, same (count DESC, lhs,
    rhs) tie-break.  MATERIALIZED matters here — round k references
    round k-1 from BOTH its pair count and its replace, so DuckDB's
    default CTE inlining would re-evaluate the whole prefix ~3^rounds
    times; materializing each round keeps the oracle linear in rounds
    (measured 0.14 s at sf0.1 for rounds=5)."""
    assert rounds >= 1
    parts = [
        "WITH words AS MATERIALIZED ("
        "  SELECT w, COUNT(*) AS n FROM ("
        "    SELECT unnest(regexp_split_to_array(text, '\\s+')) AS w "
        "    FROM documents) z WHERE w <> '' GROUP BY w), "
        "s0 AS MATERIALIZED ("
        "  SELECT ' ' || rtrim(regexp_replace(w, '(.)', '\\1  ', 'g')) "
        "         || ' ' AS seq, n FROM words)"]
    for k in range(1, rounds + 1):
        parts.append(
            f"p{k} AS MATERIALIZED ("
            f"  SELECT t[i] AS lhs, t[i+1] AS rhs, SUM(n) AS cnt "
            f"  FROM (SELECT string_split(trim(seq), '  ') AS t, n "
            f"        FROM s{k-1}) z, "
            f"  LATERAL (SELECT unnest(generate_series(1, len(z.t)-1)) "
            f"           AS i) g "
            f"  GROUP BY lhs, rhs), "
            f"t{k} AS MATERIALIZED ("
            f"  SELECT lhs, rhs, cnt, "
            f"  ' '||lhs||'  '||rhs||' ' AS pat, "
            f"  ' '||lhs||rhs||' ' AS rep "
            f"  FROM p{k} ORDER BY cnt DESC, lhs, rhs LIMIT 1), "
            f"s{k} AS MATERIALIZED ("
            f"  SELECT replace(seq, (SELECT pat FROM t{k}), "
            f"                 (SELECT rep FROM t{k})) AS seq, n "
            f"  FROM s{k-1})")
    finals = " UNION ALL ".join(
        f"SELECT CAST({k} AS BIGINT) AS merge_rank, lhs, rhs, "
        f"CAST(cnt AS BIGINT) AS pair_count FROM t{k}"
        for k in range(1, rounds + 1))
    return ", ".join(parts) + " " + finals


def _bpe_segment_sql() -> str:
    """bpe_segment oracle: apply_bpe_merges replayed with DuckDB list
    lambdas — per word, the same sequence expansion and rank-ordered
    literal replace chain over _BPE_DEMO_MERGES, flattened per doc."""
    seq = r"' ' || rtrim(regexp_replace(w, '(.)', '\1  ', 'g')) || ' '"
    for l, r in _BPE_DEMO_MERGES:
        seq = f"replace({seq}, ' {l}  {r} ', ' {l}{r} ')"
    return (
        "SELECT doc_id, CAST(len(sub) AS BIGINT) AS n_subwords, "
        "array_to_string(sub[1:12], ' ') AS head_subwords FROM ("
        "  SELECT doc_id, flatten(list_transform("
        "    list_filter(regexp_split_to_array(text, '\\s+'), "
        "                w -> w <> ''), "
        f"   w -> string_split(trim({seq}), '  '))) AS sub "
        "  FROM documents) z")


def oracle_sql() -> dict[str, str]:
    lang_defs, lang_case = _lang_scores_sql()
    dec = "DECIMAL(18,4)"
    ngram_sh = _NGRAM_SH_SQL
    jacc = _JACC_SQL
    cont = ("len(list_intersect(a.s, b.s))::DOUBLE / least(len(a.s), len(b.s))")
    # MinHash-LSH re-encoded in DuckDB SQL: the engine uses the portable
    # md5-top-60-bits base hash (dedup._PORTABLE_BASE_HASH) precisely so
    # the signatures — and therefore the LSH buckets and the final pair
    # set — are bit-reproducible here.  The affine (a_i, b_i) constants
    # are FROZEN literals (n_hashes=32, seed=42 — the defaults the query
    # uses), NOT imported from the engine: a bug in the engine's
    # parameter generator must break the comparison, not mirror into the
    # oracle.  tests/test_property_oracle.py asserts the engine still
    # generates exactly these.
    _PRIME = 1_000_000_007
    # PII redaction oracle: same planting, same patterns (shared
    # constants — query and oracle cannot drift), DuckDB 'g' flag for
    # the global replace Spark's regexp_replace does by default.
    pii_text = "text"
    for _, pat, repl in text.PII_PATTERNS:
        # DuckDB standard strings pass backslashes through verbatim —
        # only quotes need escaping
        esc = pat.replace("'", "''")
        pii_text = (f"regexp_replace({pii_text}, '{esc}', "
                    f"'{repl}', 'g')")
    pii_suffix = _PII_SUFFIX.replace("'", "''")
    pii_sql = (
        f"WITH corpus AS (SELECT doc_id, text FROM documents "
        f"UNION ALL SELECT doc_id + 2000000, text || '{pii_suffix}' "
        f"FROM documents WHERE doc_id % 20 = 0) "
        f"SELECT doc_id, {pii_text} AS text FROM corpus")

    pr_base = (
        "WITH p AS (SELECT DISTINCT l_orderkey, l_suppkey "
        "FROM lineitem), "
        "two AS (SELECT l_orderkey FROM p GROUP BY l_orderkey "
        "HAVING COUNT(*) = 2), "
        "p2 AS (SELECT * FROM p WHERE l_orderkey IN "
        "(SELECT l_orderkey FROM two)), "
        "und AS (SELECT DISTINCT x.l_suppkey AS a, y.l_suppkey AS b "
        "FROM p2 x JOIN p2 y ON x.l_orderkey = y.l_orderkey "
        "AND x.l_suppkey < y.l_suppkey), "
        "e AS (SELECT a AS src, b AS dst FROM und "
        "UNION ALL SELECT b, a FROM und), "
        "verts AS (SELECT DISTINCT src AS v FROM e), "
        "nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM verts), "
        "outd AS (SELECT src, COUNT(*) AS od FROM e GROUP BY src), "
        "r0 AS (SELECT v, 1.0 / n AS rank FROM verts, nn)")
    pr_iters = []
    for i in range(1, 4):
        pr_iters.append(
            f"s{i} AS (SELECT dst AS v, "
            f"CAST(SUM(CAST(rank / od AS DECIMAL(27,15))) AS DOUBLE) "
            f"AS s FROM e JOIN outd USING (src) "
            f"JOIN r{i-1} ON e.src = r{i-1}.v GROUP BY dst), "
            f"r{i} AS (SELECT verts.v, (1 - 0.85) / n "
            f"+ 0.85 * COALESCE(s, 0.0) AS rank "
            f"FROM verts CROSS JOIN nn "
            f"LEFT JOIN s{i} ON verts.v = s{i}.v)")
    pagerank_sql = (pr_base + ", " + ", ".join(pr_iters)
                    + " SELECT v, round(rank, 6) AS rank FROM r3 "
                    + "ORDER BY rank DESC, v")

    # contamination_check: k=5 shingles + the portable md5-top-60-bit
    # hash mod 1e9+7 (same family the MinHash oracle replays); distinct
    # is applied to the STRING grams before hashing on both engines so
    # a hash collision cannot change multiplicities differently.
    conta_gram5 = (
        "CASE WHEN len(toks) <= 5 THEN [array_to_string(toks, ' ')] "
        "ELSE list_transform(range(1, len(toks) - 3), "
        "i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' "
        "|| toks[i+3] || ' ' || toks[i+4]) END")
    conta_hash = ("CAST(('0x' || substr(md5(g), 1, 15))::UBIGINT "
                  "% 1000000007 AS BIGINT)")
    conta_sql = (
        f"WITH bt AS (SELECT regexp_split_to_array(text, '\\s+') AS toks "
        f"FROM documents WHERE doc_id % 97 = 0), "
        f"bsh AS (SELECT DISTINCT {conta_hash} AS gh FROM "
        f"(SELECT unnest(list_distinct({conta_gram5})) AS g FROM bt)), "
        f"train AS (SELECT doc_id, text FROM documents "
        f"WHERE doc_id % 97 <> 0 "
        f"UNION ALL SELECT doc_id + 3000000, text || '{_CONTA_SUFFIX}' "
        f"FROM documents WHERE doc_id % 97 = 0), "
        f"tt AS (SELECT doc_id, regexp_split_to_array(text, '\\s+') "
        f"AS toks FROM train), "
        f"tsh AS (SELECT doc_id, {conta_hash} AS gh FROM "
        f"(SELECT doc_id, unnest(list_distinct({conta_gram5})) AS g "
        f"FROM tt)), "
        f"j AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams, "
        f"CAST(SUM(CASE WHEN bsh.gh IS NOT NULL THEN 1 ELSE 0 END) "
        f"AS BIGINT) AS n_matched "
        f"FROM tsh LEFT JOIN bsh USING (gh) GROUP BY doc_id) "
        f"SELECT doc_id, n_grams, n_matched, "
        f"round(n_matched / n_grams, 6) AS contamination, "
        f"(n_matched / n_grams) >= 0.5 AS contaminated FROM j")

    mh_params = _MINHASH_AFFINE_32_SEED42
    rows_per_band = 32 // 8
    mh_mins = ", ".join(
        f"MIN((h * {a} + {b}) % {_PRIME}) AS m{i}"
        for i, (a, b) in enumerate(mh_params))
    mh_bands = " UNION ALL ".join(
        "SELECT doc_id, {band} AS band, md5({key}) AS bh FROM sig".format(
            band=band,
            key="||','||".join(
                f"m{band * rows_per_band + j}::VARCHAR"
                for j in range(rows_per_band)))
        for band in range(8))
    minhash_sql = (
        f"WITH {ngram_sh}, "
        f"hx AS (SELECT doc_id, CAST(('0x' || substr(md5(shingle), 1, 15))"
        f"::UBIGINT % {_PRIME} AS BIGINT) AS h "
        f"FROM (SELECT doc_id, unnest(s) AS shingle FROM sh)), "
        f"sig AS (SELECT doc_id, {mh_mins} FROM hx GROUP BY doc_id), "
        f"banded AS ({mh_bands}), "
        f"cand AS (SELECT DISTINCT l.doc_id AS ca, r.doc_id AS cb "
        f"FROM banded l JOIN banded r "
        f"ON l.band = r.band AND l.bh = r.bh AND l.doc_id < r.doc_id) "
        f"SELECT ca AS a, cb AS b, round({jacc}, 6) AS jaccard "
        f"FROM cand JOIN sh a ON a.doc_id = ca JOIN sh b ON b.doc_id = cb "
        f"WHERE {jacc} >= 0.5")
    # dedup_eval: precision/recall of the MinHash pair set vs planted
    # truth — the detector's SQL re-encoding is reused verbatim as a
    # derived table, so the scorer grades the same pair set the
    # minhash_near_dups oracle verifies.
    dedup_eval_sql = (
        f"WITH pred AS (SELECT a, b FROM ({minhash_sql})), "
        f"truth AS (SELECT doc_id AS a, doc_id + 1000000 AS b "
        f"FROM documents WHERE doc_id % 10 = 0), "
        f"j AS (SELECT COALESCE(p.pp, 0) AS pp, COALESCE(t.tt, 0) AS tt "
        f"FROM (SELECT a, b, 1 AS pp FROM pred) p "
        f"FULL OUTER JOIN (SELECT a, b, 1 AS tt FROM truth) t "
        f"USING (a, b)), "
        f"agg AS (SELECT COALESCE(SUM(pp), 0) AS np, "
        f"COALESCE(SUM(tt), 0) AS nt, "
        f"COALESCE(SUM(pp * tt), 0) AS tp FROM j) "
        f"SELECT np::BIGINT AS n_predicted, nt::BIGINT AS n_truth, "
        f"tp::BIGINT AS tp, (np - tp)::BIGINT AS fp, "
        f"(nt - tp)::BIGINT AS fn, "
        f"round(CASE WHEN np > 0 THEN tp / np ELSE 0.0 END, 6) "
        f'AS "precision", '
        f"round(CASE WHEN nt > 0 THEN tp / nt ELSE 0.0 END, 6) "
        f"AS recall, "
        f"round(CASE WHEN (CASE WHEN np > 0 THEN tp / np ELSE 0.0 END) "
        f"+ (CASE WHEN nt > 0 THEN tp / nt ELSE 0.0 END) > 0 THEN "
        f"2 * (CASE WHEN np > 0 THEN tp / np ELSE 0.0 END) "
        f"* (CASE WHEN nt > 0 THEN tp / nt ELSE 0.0 END) "
        f"/ ((CASE WHEN np > 0 THEN tp / np ELSE 0.0 END) "
        f"+ (CASE WHEN nt > 0 THEN tp / nt ELSE 0.0 END)) "
        f"ELSE 0.0 END, 6) AS f1 FROM agg")
    # SimHash re-encoded in DuckDB SQL (dedup.simhash_signatures /
    # simhash_near_duplicates, portable family): 60-bit signature from
    # per-bit ±1 sums of md5-top-60-bit token hashes, Manku banding into
    # 4 × 15-bit chunks (max_hamming=3), exact bit_count(xor) verify.
    planted_corpus = (
        "corpus AS ("
        "  SELECT doc_id, text FROM documents"
        "  UNION ALL"
        "  SELECT doc_id + 1000000, text || ' appendix' FROM documents"
        "  WHERE doc_id % 10 = 0)")
    sh_bit_sums = ", ".join(
        f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS b{b}"
        for b in range(60))
    sh_sig = " + ".join(
        f"(CASE WHEN b{b} > 0 THEN {1 << b} ELSE 0 END)"
        for b in range(60))
    simhash_sql = (
        f"WITH {planted_corpus}, "
        f"tok AS (SELECT doc_id, unnest(regexp_split_to_array(text, "
        f"'\\s+')) AS t FROM corpus), "
        f"hx AS (SELECT doc_id, CAST(('0x' || substr(md5(t), 1, 15))"
        f"::UBIGINT AS BIGINT) AS h FROM tok), "
        f"bits AS (SELECT doc_id, {sh_bit_sums} FROM hx GROUP BY doc_id), "
        f"sig AS (SELECT doc_id, CAST({sh_sig} AS BIGINT) AS s FROM bits), "
        f"chunks AS (SELECT doc_id, s, c AS chunk, "
        f"(s >> (c * 15)) & 32767 AS val "
        f"FROM sig, (SELECT unnest([0, 1, 2, 3]) AS c)), "
        f"cand AS (SELECT DISTINCT l.doc_id AS a, r.doc_id AS b, "
        f"l.s AS ls, r.s AS rs FROM chunks l JOIN chunks r "
        f"ON l.chunk = r.chunk AND l.val = r.val AND l.doc_id < r.doc_id) "
        f"SELECT a, b, CAST(bit_count(xor(ls, rs)) AS INT) AS hamming "
        f"FROM cand WHERE bit_count(xor(ls, rs)) <= 3")
    # LSH ANN probe re-encoded: same 4 frozen hyperplanes → same bucket,
    # exact top-10 within it (similarity.build_lsh_index + lsh_probe).
    p4 = _frozen_hyperplanes(4)
    lsh_sql = (
        f"WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v "
        f"FROM embeddings), "
        f"s AS (SELECT vec_id, v, {_lsh_sig_sql(p4, 'v')} AS sig FROM e), "
        f"q AS (SELECT v, sig FROM s WHERE vec_id = 0) "
        f"SELECT s.vec_id, "
        f"round(list_cosine_similarity(s.v, q.v), 6) AS cosine_sim "
        f"FROM s, q WHERE s.sig = q.sig "
        f"ORDER BY cosine_sim DESC, s.vec_id LIMIT 10")
    # IVF ANN probe re-encoded end-to-end: centroid pick (16 smallest
    # portable-md5 ids — similarity.ivf_centroids), nearest-centroid
    # assignment with first-index tie-break (ivf_cell's array_position),
    # 4-cell probe (_nearest_cells), exact top-10 within the probed cells.
    def _ivf_probe_sql(extra_where: str = "") -> str:
        """The IVF probe replay, optionally label-filtered inside the
        probed cells (the ``ann_filtered`` variant — predicate BEFORE
        ranking, exactly like ``similarity.ivf_probe(where=...)``)."""
        return (
            "WITH e AS (SELECT vec_id, label, "
            "CAST(embedding AS DOUBLE[]) AS v FROM embeddings), "
            "ph AS (SELECT vec_id, v, "
            "('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::UBIGINT AS hid "
            "FROM e), "
            "cents AS (SELECT row_number() OVER (ORDER BY hid, vec_id) - 1 "
            "AS cidx, v AS cv, sqrt(list_dot_product(v, v)) AS cnorm "
            "FROM ph ORDER BY hid, vec_id LIMIT 16), "
            "assign AS (SELECT vec_id, label, v, cidx, row_number() OVER ("
            "PARTITION BY vec_id ORDER BY dotn DESC, cidx) AS rn "
            "FROM (SELECT p.vec_id, p.label, p.v, c.cidx, "
            "list_dot_product(p.v, c.cv) / c.cnorm AS dotn "
            "FROM e p CROSS JOIN cents c)), "
            "cells AS (SELECT vec_id, label, v, cidx AS cell "
            "FROM assign WHERE rn = 1), "
            "q AS (SELECT v, sqrt(list_dot_product(v, v)) AS qnorm FROM e "
            "WHERE vec_id = 0), "
            "probe AS (SELECT cidx FROM (SELECT c.cidx, row_number() OVER ("
            "ORDER BY list_dot_product(q.v, c.cv) / (c.cnorm * q.qnorm) "
            "DESC, c.cidx) AS pr FROM cents c, q) WHERE pr <= 4) "
            "SELECT cells.vec_id, "
            "round(list_cosine_similarity(cells.v, q.v), 6) AS cosine_sim "
            "FROM cells, q WHERE cells.cell IN (SELECT cidx FROM probe) "
            f"{extra_where} "
            "ORDER BY cosine_sim DESC, cells.vec_id LIMIT 10")

    ivf_sql = _ivf_probe_sql()
    ann_filtered_sql = _ivf_probe_sql("AND cells.label = 2")
    # Embedding near-dup pairs re-encoded: planted float-exact perturbed
    # copies, 6-plane bucket equality, cosine ≥ 0.9 on the rounded score
    # (q_embedding_similar_pairs + similarity.similar_pairs).
    p6 = _frozen_hyperplanes(6)
    emb_ctes = (
        f"corpus AS MATERIALIZED ("
        f"SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings "
        f"UNION ALL "
        f"SELECT vec_id + 1000000, CAST("
        f"[CAST(embedding[1] + 0.05::FLOAT AS FLOAT)] || embedding[2:] "
        f"AS DOUBLE[]) FROM embeddings WHERE vec_id % 10 = 0), "
        f"s AS (SELECT vec_id, v, {_lsh_sig_sql(p6, 'v')} AS sig "
        f"FROM corpus), "
        f"p AS (SELECT l.vec_id AS a, r.vec_id AS b, "
        f"round(list_cosine_similarity(l.v, r.v), 6) AS cosine_sim "
        f"FROM s l JOIN s r ON l.sig = r.sig AND l.vec_id < r.vec_id)")
    pairs_sql = (
        f"WITH {emb_ctes} "
        f"SELECT a, b, cosine_sim FROM p WHERE cosine_sim >= 0.9")
    # semantic_contamination: corpus ⋈ reference on the SAME 6-plane
    # buckets (cross join variant — never a self-join), planted
    # float-exact eval copies of every 20th vector
    contam_sql = (
        f"WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v "
        f"FROM embeddings), "
        f"ref AS (SELECT vec_id + 2000000 AS reference_id, CAST("
        f"[CAST(embedding[1] + 0.05::FLOAT AS FLOAT)] || embedding[2:] "
        f"AS DOUBLE[]) AS v FROM embeddings WHERE vec_id % 20 = 0), "
        f"cs AS (SELECT vec_id AS corpus_id, v, "
        f"{_lsh_sig_sql(p6, 'v')} AS sig FROM e), "
        f"rs AS (SELECT reference_id, v, {_lsh_sig_sql(p6, 'v')} "
        f"AS sig FROM ref), "
        f"hits AS (SELECT cs.corpus_id, rs.reference_id, "
        f"round(list_cosine_similarity(cs.v, rs.v), 6) AS cosine_sim "
        f"FROM cs JOIN rs ON cs.sig = rs.sig) "
        f"SELECT corpus_id, reference_id, cosine_sim FROM hits "
        f"WHERE cosine_sim >= 0.9")
    # pipeline_corpus_full: planted artifacts all die at their
    # designated stages (the entry's own contract enforces that), so
    # the oracle replays the REAL corpus's fate: md5 exact-dup
    # keep-min, the exact-Jaccard(>=0.5) near-dup CC keep-min (the
    # banding provably loses no >=0.5 pair at the test SFs — verified
    # engine-side pair-set equality at sf0.01 AND sf0.1; the entry's
    # containment contract guards the remaining asymmetric case), the
    # semantic quarantine (contam_sql verbatim), then split, budget
    # mix, and packing layout — any stage misfiring changes the final
    # per-shard packing and mismatches.
    pipe_cc = ", ".join(
        f"pl{i} AS (SELECT ped.u AS id, MIN(pl{i-1}.lbl) AS lbl "
        f"FROM ped JOIN pl{i-1} ON ped.v = pl{i-1}.id "
        f"GROUP BY ped.u)" for i in range(2, 6))
    pipeline_full_sql = (
        f"WITH qr AS (SELECT DISTINCT corpus_id FROM ({contam_sql})), "
        f"shd AS (SELECT doc_id, list_distinct("
        f"CASE WHEN len(toks) <= 3 THEN [array_to_string(toks, ' ')] "
        f"ELSE list_transform(range(1, len(toks) - 1), "
        f"i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) END) "
        f"AS s FROM (SELECT doc_id, "
        f"regexp_split_to_array(text, '\\s+') AS toks "
        f"FROM documents)), "
        f"pex AS (SELECT doc_id, unnest(s) AS g FROM shd), "
        f"pcand AS (SELECT DISTINCT l.doc_id AS ca, r.doc_id AS cb "
        f"FROM pex l JOIN pex r ON l.g = r.g "
        f"AND l.doc_id < r.doc_id), "
        # ONE materialized pair computation feeds BOTH similarity
        # tiers: jaccard = co/(na+nb-co) for the MinHash replay,
        # containment = co/min(na,nb) for the asymmetric tier —
        # the expensive shd x shd intersection runs once
        f"pj AS MATERIALIZED (SELECT ca, cb, len(a.s) AS na, "
        f"len(b.s) AS nb, len(list_intersect(a.s, b.s)) AS co "
        f"FROM pcand JOIN shd a ON a.doc_id = ca "
        f"JOIN shd b ON b.doc_id = cb), "
        f"ppair AS (SELECT ca AS a, cb AS b FROM pj "
        f"WHERE co::DOUBLE / (na + nb - co) >= 0.5), "
        f"ped AS (SELECT unnest([a, b, a, b]) AS u, "
        f"unnest([b, a, a, b]) AS v FROM ppair), "
        f"pl1 AS (SELECT u AS id, MIN(v) AS lbl FROM ped GROUP BY u), "
        f"{pipe_cc}, "
        f"mhlose AS (SELECT id FROM pl5 WHERE lbl <> id), "
        f"md5lose AS (SELECT doc_id FROM (SELECT doc_id, "
        f"MIN(doc_id) OVER (PARTITION BY md5(text)) AS m "
        f"FROM documents) WHERE doc_id <> m), "
        # containment tier replay (round 14): the asymmetric
        # |A∩B|/min(|A|,|B|) >= 0.9 keep-longest over exactly the
        # md5+minhash SURVIVORS (the entry runs this stage on s3, so
        # a pair whose side already died upstream must not form)
        f"ctlose AS (SELECT DISTINCT CASE WHEN na <= nb THEN ca "
        f"ELSE cb END AS doc_id FROM pj "
        f"WHERE co::DOUBLE / least(na, nb) >= 0.9 "
        f"AND ca NOT IN (SELECT id FROM mhlose) "
        f"AND cb NOT IN (SELECT id FROM mhlose) "
        f"AND ca NOT IN (SELECT doc_id FROM md5lose) "
        f"AND cb NOT IN (SELECT doc_id FROM md5lose)), "
        f"surv AS (SELECT doc_id, source, text FROM documents "
        f"WHERE doc_id NOT IN (SELECT corpus_id FROM qr) "
        f"AND doc_id NOT IN (SELECT id FROM mhlose) "
        f"AND doc_id NOT IN (SELECT doc_id FROM md5lose) "
        f"AND doc_id NOT IN (SELECT doc_id FROM ctlose)), "
        f"tr AS (SELECT * FROM surv WHERE "
        f"('0x' || substr(md5(source), 1, 8))::BIGINT % 100 < 80), "
        f"t AS (SELECT source, doc_id, "
        f"CAST(len(regexp_split_to_array(text, '\\s+')) AS BIGINT) "
        f"AS n_tokens, "
        f"('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))"
        f"::UBIGINT AS hv FROM tr), "
        f"w AS (SELECT source, doc_id, n_tokens, "
        f"COALESCE(SUM(n_tokens) OVER (PARTITION BY source "
        f"ORDER BY hv, doc_id "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
        f"AS cum_before FROM t), "
        f"kept AS (SELECT doc_id, n_tokens FROM w "
        f"WHERE cum_before < 400), "
        f"pc AS (SELECT doc_id, n_tokens, "
        f"CAST(('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::UBIGINT "
        f"% 16 AS BIGINT) AS shard FROM kept), "
        f"po AS (SELECT shard, n_tokens, "
        f"COALESCE(SUM(n_tokens) OVER (PARTITION BY shard "
        f"ORDER BY doc_id "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
        f"AS so FROM pc) "
        f"SELECT shard, COUNT(*)::BIGINT AS n_docs, "
        f"CAST(MAX(so // 256) + 1 AS BIGINT) AS n_packs, "
        f"CAST(SUM(n_tokens) AS BIGINT) AS tok_sum "
        f"FROM po GROUP BY shard")
    # semantic_dedup: the pair CTEs + unrolled min-label CC (the
    # _ngram_cc_sql pattern; self-loops fold identity labels into the
    # MIN) + keep-one.  The planted graph is disjoint (orig, orig+1e6)
    # edges — diameter 1 — so 3 rounds carries two rounds of slack; ed
    # is MATERIALIZED so the pair pipeline evaluates once, not once per
    # CC round.
    sem_sql = (
        f"WITH {emb_ctes}, "
        f"hits AS (SELECT a, b FROM p WHERE cosine_sim >= 0.9), "
        f"ed AS MATERIALIZED (SELECT unnest([a, b, a, b]) AS u, "
        f"unnest([b, a, a, b]) AS v FROM hits), "
        f"l1 AS (SELECT u AS id, MIN(v) AS lbl FROM ed GROUP BY u), "
        f"l2 AS (SELECT ed.u AS id, MIN(l1.lbl) AS lbl FROM ed "
        f"JOIN l1 ON ed.v = l1.id GROUP BY ed.u), "
        f"l3 AS (SELECT ed.u AS id, MIN(l2.lbl) AS lbl FROM ed "
        f"JOIN l2 ON ed.v = l2.id GROUP BY ed.u), "
        f"sz AS (SELECT lbl, COUNT(*) AS n FROM l3 GROUP BY lbl) "
        f"SELECT c.vec_id, CAST(COALESCE(sz.n, 1) AS BIGINT) AS n_members "
        f"FROM corpus c "
        f"LEFT JOIN l3 ON c.vec_id = l3.id "
        f"LEFT JOIN sz ON sz.lbl = c.vec_id "
        f"WHERE l3.id IS NULL OR l3.lbl = c.vec_id")
    ngram_block = _NGRAM_BLOCK_SQL
    # see _ngram_cc_sql: unrolled min-label CC (the recursive CTE it
    # replaced was ~25 min at sf0.1; rounds=5 measures ~30 s there)
    clusters_sql = _ngram_cc_sql(rounds=5)
    out = {
        "scan": "SELECT * FROM region",
        "filter_eq": ("SELECT c_custkey, c_name FROM customer "
                      "WHERE c_mktsegment = 'BUILDING'"),
        "filter_range": (
            "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem "
            "WHERE l_quantity >= 30.0 AND l_discount < 0.03"),
        "filter_neq": ("SELECT o_orderkey, o_orderstatus FROM orders "
                       "WHERE o_orderstatus <> 'O'"),
        "project": ("SELECT c_name AS name, c_mktsegment AS segment "
                    "FROM customer"),
        "groupby_count": (
            "SELECT c_mktsegment, COUNT(*) AS countAgg FROM customer "
            "GROUP BY c_mktsegment"),
        "groupby_sum_avg": (
            f"SELECT l_returnflag, COUNT(*) AS countAgg, "
            f"CAST(SUM(CAST(l_quantity AS {dec})) AS DOUBLE) AS sum_qty, "
            f"CAST(SUM(CAST(l_extendedprice AS {dec})) AS DOUBLE) "
            f"  / COUNT(l_extendedprice) AS avg_price, "
            f"MIN(l_extendedprice) AS min_price, "
            f"MAX(l_extendedprice) AS max_price "
            f"FROM lineitem GROUP BY l_returnflag"),
        "join_two": ("SELECT n_name, r_name FROM nation JOIN region "
                     "ON n_regionkey = r_regionkey"),
        "join_three_flagship": (
            f"SELECT c_mktsegment, COUNT(*) AS countAgg, "
            f"CAST(SUM(CAST(l_extendedprice AS {dec})) AS DOUBLE) AS revenue, "
            f"CAST(SUM(CAST(l_quantity AS {dec})) AS DOUBLE) "
            f"  / COUNT(l_quantity) AS avg_qty "
            f"FROM customer "
            f"JOIN orders ON c_custkey = o_custkey "
            f"JOIN lineitem ON o_orderkey = l_orderkey "
            f"WHERE l_discount > 0.05 GROUP BY c_mktsegment"),
        "self_join_alias": (
            "SELECT n1.n_nationkey AS k1, n2.n_nationkey AS k2, "
            "n1.n_name AS name1, n2.n_name AS name2 "
            "FROM nation n1 JOIN nation n2 "
            "ON n1.n_regionkey = n2.n_regionkey"),
        "index_range_scan": (
            "SELECT l_orderkey, l_linenumber, "
            "strftime(l_shipdate, '%Y-%m-%d') AS ship_date FROM lineitem "
            "WHERE l_shipdate >= TIMESTAMP '1998-09-01 00:00:00'"),
        "lookup_key": (
            "SELECT c_custkey, c_name, c_mktsegment FROM customer "
            "WHERE c_custkey = 7"),
        "contains_key": (
            "SELECT CAST(k AS BIGINT) AS probe_key, "
            "EXISTS(SELECT 1 FROM part WHERE p_partkey = k) AS found "
            "FROM (VALUES (1), (7), (999999999)) t(k)"),
        "grace_hash_join": (
            f"SELECT p_brand, COUNT(*) AS countAgg, "
            f"CAST(SUM(CAST(l_quantity AS {dec})) AS DOUBLE) AS sum_qty "
            f"FROM part JOIN lineitem ON p_partkey = l_partkey "
            f"GROUP BY p_brand"),
        "broadcast_join": (
            f"SELECT s_nationkey, COUNT(*) AS countAgg, "
            f"CAST(SUM(CAST(l_extendedprice AS {dec})) AS DOUBLE) AS revenue "
            f"FROM lineitem JOIN supplier ON l_suppkey = s_suppkey "
            f"GROUP BY s_nationkey"),
        "csv_source": "SELECT * FROM nation",
        "text_source": "SELECT text FROM documents",
        "json_source": "SELECT * FROM region",
        "indexed_write_scan": (
            "SELECT l_orderkey, l_linenumber, "
            "strftime(l_shipdate, '%Y-%m-%d') AS ship_date FROM lineitem "
            "WHERE l_shipdate >= TIMESTAMP '1998-09-01 00:00:00'"),
        "dml_lifecycle": (
            "WITH ins AS ("
            "  SELECT n_nationkey, n_name, n_regionkey FROM nation"
            "  UNION ALL SELECT 100, 'ATLANTIS', 0"
            "  UNION ALL SELECT 101, 'ELDORADO', 1"
            "), upd AS ("
            "  SELECT n_nationkey,"
            "         CASE WHEN n_regionkey = 2 THEN n_name || '*'"
            "              ELSE n_name END AS n_name,"
            "         n_regionkey"
            "  FROM ins)"
            "SELECT n_nationkey, n_name, n_regionkey FROM upd "
            "WHERE n_nationkey NOT BETWEEN 10 AND 14"),
        # replay of the three published versions q_time_travel reads
        "time_travel": (
            "WITH v0 AS (SELECT n_nationkey FROM nation), "
            "v1 AS (SELECT n_nationkey FROM v0 "
            "       UNION ALL SELECT unnest([200, 201])), "
            "v2 AS (SELECT n_nationkey FROM v1 "
            "       WHERE n_nationkey NOT BETWEEN 10 AND 14) "
            "SELECT CAST(0 AS BIGINT) AS version, "
            "CAST(COUNT(*) AS BIGINT) AS n_rows, "
            "CAST(SUM(n_nationkey) AS BIGINT) AS key_sum FROM v0 "
            "UNION ALL SELECT CAST(1 AS BIGINT), "
            "CAST(COUNT(*) AS BIGINT), "
            "CAST(SUM(n_nationkey) AS BIGINT) FROM v1 "
            "UNION ALL SELECT CAST(2 AS BIGINT), "
            "CAST(COUNT(*) AS BIGINT), "
            "CAST(SUM(n_nationkey) AS BIGINT) FROM v2"),
        "partitioned_dml": (
            "WITH ins AS ("
            "  SELECT c_custkey, c_mktsegment, c_acctbal FROM customer "
            "  UNION ALL SELECT 900000001, 'BUILDING', 1234.56 "
            "  UNION ALL SELECT 900000002, 'BUILDING', 789.01), "
            "del AS (SELECT * FROM ins WHERE NOT "
            "  (c_mktsegment = 'AUTOMOBILE' AND c_acctbal < 0)), "
            "upd AS (SELECT c_custkey, c_mktsegment, "
            "  CASE WHEN c_mktsegment = 'MACHINERY' "
            "       THEN c_acctbal + 100.0 ELSE c_acctbal END "
            "    AS c_acctbal FROM del) "
            "SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_rows, "
            "CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) "
            "  AS acct_sum "
            "FROM upd GROUP BY c_mktsegment"),
        "partitioned_merge": (
            "WITH base AS (SELECT c_custkey, c_mktsegment, c_acctbal "
            "  FROM customer), "
            "src AS (SELECT c_custkey, c_mktsegment, "
            "  CAST(0.0 AS DOUBLE) AS c_acctbal FROM base "
            "  WHERE c_custkey % 100 = 0 "
            "  UNION ALL SELECT 910000001, 'BUILDING', "
            "    CAST(11.5 AS DOUBLE) "
            "  UNION ALL SELECT 910000002, 'HOUSEHOLD', "
            "    CAST(22.5 AS DOUBLE)), "
            "merged AS (SELECT * FROM base WHERE c_custkey NOT IN "
            "  (SELECT c_custkey FROM src) "
            "  UNION ALL SELECT * FROM src) "
            "SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_rows, "
            "CAST(SUM(CASE WHEN c_acctbal = 0.0 THEN 1 ELSE 0 END) "
            "  AS BIGINT) AS n_zeroed, "
            "CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) "
            "  AS acct_sum "
            "FROM merged GROUP BY c_mktsegment"),
        "cdf_feed": (
            "WITH aff AS (SELECT n_nationkey FROM nation "
            "  WHERE n_regionkey = 2 AND n_nationkey NOT BETWEEN 5 AND 9), "
            "del AS (SELECT n_nationkey FROM nation "
            "  WHERE n_nationkey BETWEEN 5 AND 9) "
            "SELECT CAST(1 AS BIGINT) AS _commit_version, "
            "  'insert' AS _change_type, CAST(2 AS BIGINT) AS n_rows, "
            "  CAST(601 AS BIGINT) AS key_sum "
            "UNION ALL SELECT CAST(2 AS BIGINT), 'delete', "
            "  CAST((SELECT COUNT(*) FROM del) AS BIGINT), "
            "  CAST((SELECT SUM(n_nationkey) FROM del) AS BIGINT) "
            "UNION ALL SELECT CAST(3 AS BIGINT), 'insert', "
            "  CAST((SELECT COUNT(*) FROM aff) AS BIGINT), "
            "  CAST((SELECT SUM(n_nationkey) FROM aff) AS BIGINT) "
            "UNION ALL SELECT CAST(3 AS BIGINT), 'delete', "
            "  CAST((SELECT COUNT(*) FROM aff) AS BIGINT), "
            "  CAST((SELECT SUM(n_nationkey) FROM aff) AS BIGINT)"),
        "partition_skipping": (
            "SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_rows, "
            "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) "
            "  AS price_sum "
            "FROM orders WHERE o_orderdate >= TIMESTAMP '1999-06-01' "
            "GROUP BY o_orderpriority"),
        "soft_delete": (
            "WITH kept AS (SELECT p_partkey, p_brand, p_size FROM part "
            "  WHERE NOT (p_size < 10) "
            "    AND p_partkey NOT IN (1, 2, 3, 4) "
            "  UNION ALL SELECT 920000001, 'Brand#11', 5 "
            "  UNION ALL SELECT 920000002, 'Brand#22', 3) "
            "SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_rows, "
            "CAST(SUM(p_size) AS BIGINT) AS size_sum, "
            "CAST(SUM(CASE WHEN p_size < 10 THEN 1 ELSE 0 END) "
            "  AS BIGINT) AS n_small "
            "FROM kept GROUP BY p_brand"),
        "cdf_stream": (
            "WITH allr AS (SELECT n_nationkey, n_regionkey FROM nation "
            "  UNION ALL SELECT 300, 0 UNION ALL SELECT 301, 1) "
            "SELECT n_regionkey, CAST(COUNT(*) AS BIGINT) AS n_rows, "
            "CAST(SUM(n_nationkey) AS BIGINT) AS key_sum "
            "FROM allr GROUP BY n_regionkey"),
        "schema_evolution": (
            "WITH allr AS (SELECT s_suppkey, "
            "  CAST(NULL AS VARCHAR) AS s_tier FROM supplier "
            "  UNION ALL SELECT 930000001, 'gold' "
            "  UNION ALL SELECT 930000002, 'silver') "
            "SELECT s_tier, CAST(COUNT(*) AS BIGINT) AS n_rows, "
            "CAST(SUM(s_suppkey) AS BIGINT) AS key_sum "
            "FROM allr GROUP BY s_tier"),
        "embedding_quantize": (
            "WITH s AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, "
            "greatest(list_max(list_transform("
            "CAST(embedding AS DOUBLE[]), a -> abs(a))), 1e-30) / 127.0 "
            "AS scale FROM embeddings), "
            "deq AS (SELECT vec_id, "
            "list_transform(v, x -> floor(x / scale + 0.5) * scale) "
            "AS dv FROM s), "
            "q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv "
            "FROM embeddings WHERE vec_id = 0) "
            "SELECT vec_id, round(list_cosine_similarity(dv, "
            "(SELECT qv FROM q)), 6) AS q_cosine "
            "FROM deq ORDER BY q_cosine DESC, vec_id LIMIT 10"),
        "pq_ann": (
            "SELECT 10 AS k, CAST(COUNT(*) AS BIGINT) AS n_encoded, "
            "TRUE AS recall_ge_04 FROM embeddings"),
        "ivfpq_probe": (
            "SELECT 10 AS k, CAST(COUNT(*) AS BIGINT) AS n_indexed, "
            "TRUE AS pruned, TRUE AS recall_ge_04 FROM embeddings"),
        "hybrid_search": (
            "WITH post AS (SELECT doc_id, token FROM ("
            "SELECT doc_id, unnest(regexp_split_to_array(text, '\\s+')) "
            "AS token FROM documents) WHERE token <> ''), "
            "dl AS (SELECT doc_id, COUNT(*) AS dl FROM post "
            "GROUP BY doc_id), "
            "c AS (SELECT COUNT(*) AS n, avg(dl) AS avgdl FROM dl), "
            "tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM post "
            "WHERE token IN ('batch', 'hash', 'window') "
            "GROUP BY doc_id, token), "
            "dfq AS (SELECT token, COUNT(*) AS df FROM tf "
            "GROUP BY token), "
            "s AS (SELECT tf.doc_id, "
            "ln(1.0 + (n - df + 0.5) / (df + 0.5)) "
            "* (tf * (1.2 + 1)) "
            "/ (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)) AS s "
            "FROM tf JOIN dfq USING (token) JOIN dl USING (doc_id), c), "
            "bm AS (SELECT doc_id, round(SUM(s), 6) AS bm25 FROM s "
            "GROUP BY doc_id ORDER BY bm25 DESC, doc_id LIMIT 20), "
            "rb AS (SELECT doc_id, row_number() OVER "
            "(ORDER BY bm25 DESC, doc_id) AS rb FROM bm), "
            "q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv "
            "FROM embeddings WHERE vec_id = 0), "
            "vs AS (SELECT vec_id AS doc_id, "
            "round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), "
            "(SELECT qv FROM q)), 6) AS cs FROM embeddings "
            "ORDER BY cs DESC, doc_id LIMIT 20), "
            "rv AS (SELECT doc_id, row_number() OVER "
            "(ORDER BY cs DESC, doc_id) AS rv FROM vs) "
            "SELECT doc_id, round(COALESCE(1.0 / (60 + rb), 0) "
            "+ COALESCE(1.0 / (60 + rv), 0), 6) AS rrf "
            "FROM rb FULL OUTER JOIN rv USING (doc_id) "
            "ORDER BY rrf DESC, doc_id LIMIT 10"),
        "table_history": (
            "SELECT * FROM (VALUES "
            "(CAST(0 AS BIGINT), 'CREATE', CAST(5 AS INT), "
            " CAST(5 AS INT)), "
            "(1, 'INSERT', 5, 6), "
            "(2, 'DELETE', 4, 5)) "
            "AS t(version, op, n_partitions, n_dirs)"),
        "stream_to_mview": (
            "SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_rows, "
            "CAST(round(SUM(o_totalprice) * 100, 0) AS BIGINT) "
            "  AS total_cents "
            "FROM orders WHERE o_orderkey % 50 = 0 "
            "GROUP BY o_orderstatus"),
        "mview_refresh": (
            "WITH cur AS ("
            "  SELECT c_custkey, c_mktsegment, c_acctbal FROM customer "
            "  WHERE NOT (c_mktsegment = 'AUTOMOBILE' "
            "             AND c_custkey % 2 = 0) "
            "  UNION ALL SELECT 940000001, 'BUILDING', 100.5 "
            "  UNION ALL SELECT 940000002, 'MACHINERY', 200.25), "
            "adj AS (SELECT c_mktsegment, "
            "  CASE WHEN c_mktsegment = 'FURNITURE' "
            "       THEN c_acctbal + 10.0 ELSE c_acctbal END AS bal "
            "  FROM cur) "
            "SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_rows, "
            "round(SUM(bal), 2) AS acct_sum "
            "FROM adj GROUP BY c_mktsegment"),
        "check_constraints": (
            "SELECT CAST(COUNT(*) + 1 AS BIGINT) AS n_rows, "
            "CAST(MIN(c_custkey) AS BIGINT) AS min_key, "
            "CAST(GREATEST(MAX(c_custkey), 920000001) AS BIGINT) "
            "  AS max_key "
            "FROM customer"),
        "restore_clone": (
            "SELECT 'source' AS tbl, CAST(COUNT(*) AS BIGINT) AS n_rows, "
            "CAST(SUM(n_nationkey) AS BIGINT) AS key_sum FROM nation "
            "UNION ALL "
            "SELECT 'clone', CAST(COUNT(*) + 1 AS BIGINT), "
            "CAST(SUM(n_nationkey) + 300 AS BIGINT) FROM nation"),
        "metadata_agg": (
            "SELECT CAST(COUNT(*) + 1 AS BIGINT) AS n_rows, "
            "CAST(MIN(o_orderkey) AS BIGINT) AS min_key, "
            "CAST(GREATEST(MAX(o_orderkey), 900000001) AS BIGINT) "
            "  AS max_key "
            "FROM orders"),
        # --- round 11 ---
        "mview_hll_distinct": (
            "WITH src AS (SELECT event_type, user_id FROM events), "
            "h AS (SELECT event_type AS g, ('0x' || substr(md5("
            "CAST(user_id AS VARCHAR)), 1, 15))::UBIGINT AS hv "
            "FROM src), "
            "r AS (SELECT g, CAST(hv % 128 AS INT) AS register, "
            "CASE WHEN hv // 128 = 0 THEN 54 "
            "ELSE 54 - length(bin(hv // 128)) END AS rho FROM h), "
            "regs AS (SELECT g, register, MAX(rho) AS rho FROM r "
            "GROUP BY g, register), "
            "agg AS (SELECT g, COUNT(*) AS filled, "
            "SUM(pow(2.0, -rho)) AS ps FROM regs GROUP BY g), "
            "est AS (SELECT g, round(CASE WHEN "
            "(0.7213 / (1.0 + 1.079 / 128)) * 128 * 128 "
            "/ (ps + (128 - filled)) <= 320.0 AND (128 - filled) > 0 "
            "THEN 128.0 * ln(128.0 / (128 - filled)) "
            "ELSE (0.7213 / (1.0 + 1.079 / 128)) * 128 * 128 "
            "/ (ps + (128 - filled)) END, 4) AS estimate FROM agg), "
            "n AS (SELECT event_type AS g, CAST(COUNT(*) AS BIGINT) "
            "AS n_rows FROM src GROUP BY event_type) "
            "SELECT n.g AS event_type, n_rows, "
            "estimate AS distinct_est "
            "FROM n JOIN est ON n.g = est.g ORDER BY event_type"),
        "expectations": (
            "WITH r AS ("
            "  SELECT 'price_positive' AS expectation, "
            "    COUNT(*) FILTER (WHERE NOT COALESCE("
            "      o_totalprice > 0, FALSE)) AS v, "
            "    COUNT(*) AS n FROM orders "
            "  UNION ALL SELECT 'status_known', "
            "    COUNT(*) FILTER (WHERE NOT COALESCE("
            "      o_orderstatus IN ('O','F','P'), FALSE)), "
            "    COUNT(*) FROM orders "
            "  UNION ALL SELECT 'priority_wellformed', "
            "    COUNT(*) FILTER (WHERE NOT COALESCE("
            "      o_orderpriority LIKE '_-%', FALSE)), "
            "    COUNT(*) FROM orders "
            "  UNION ALL SELECT 'price_under_cap', "
            "    COUNT(*) FILTER (WHERE NOT COALESCE("
            "      o_totalprice < 100000, FALSE)), "
            "    COUNT(*) FROM orders) "
            "SELECT expectation, CAST(n AS BIGINT) AS n_rows, "
            "CAST(v AS BIGINT) AS n_violations, "
            "ROUND(v * 1.0 / n, 6) AS violation_rate, "
            "v = 0 AS passed FROM r ORDER BY expectation"),
        "url_dedup": (
            "SELECT 'https://example.com/p' || "
            "  CAST(doc_id % 50 AS VARCHAR) AS canonical_url, "
            "CAST(MIN(doc_id) AS BIGINT) AS keeper, "
            "CAST(COUNT(*) AS BIGINT) AS n_dups "
            "FROM documents GROUP BY doc_id % 50"),
        "repartition_evolution": (
            "SELECT o_orderstatus, o_orderpriority, "
            "CAST(COUNT(*) AS BIGINT) AS n_rows, "
            "ROUND(SUM(o_totalprice), 2) AS sum_price "
            "FROM orders GROUP BY o_orderstatus, o_orderpriority"),
        "metadata_group_minmax": (
            "WITH fin AS (SELECT o_orderkey, o_orderstatus FROM orders "
            "  UNION ALL SELECT 900000001 + i, 'X' FROM range(20) t(i) "
            "  UNION ALL SELECT 910000001 + i, 'X' FROM range(20) t(i))"
            " SELECT o_orderstatus, "
            "CAST(MIN(o_orderkey) AS BIGINT) AS min_key, "
            "CAST(MAX(o_orderkey) AS BIGINT) AS max_key "
            "FROM fin GROUP BY o_orderstatus"),
        "disjunct_skip": (
            "WITH fin AS (SELECT o_orderkey, o_orderstatus, "
            "    o_totalprice FROM orders "
            "  UNION ALL SELECT 900000001 + i, 'X', 1.0 "
            "    FROM range(20) t(i) "
            "  UNION ALL SELECT 910000001 + i, 'X', 2.0 "
            "    FROM range(20) t(i)) "
            "SELECT o_orderkey, o_orderstatus, o_totalprice FROM fin "
            "WHERE (o_orderstatus = 'X' AND o_orderkey = 900000005) "
            "OR (o_orderstatus = 'F' "
            "    AND o_orderkey BETWEEN 1 AND 50)"),
        "inlist_skip": (
            "WITH fin AS (SELECT o_orderkey, o_orderstatus, "
            "    o_totalprice FROM orders "
            "  UNION ALL SELECT 900000001 + i, 'X', 1.0 "
            "    FROM range(20) t(i) "
            "  UNION ALL SELECT 910000001 + i, 'X', 2.0 "
            "    FROM range(20) t(i)) "
            "SELECT o_orderkey, o_orderstatus, o_totalprice FROM fin "
            "WHERE o_orderkey IN (900000005, 910000007, -17)"),
        "multi_partition": (
            "SELECT "
            "CAST((SELECT COUNT(*) FROM orders "
            "  WHERE o_orderstatus = 'F' "
            "  AND o_orderpriority = '1-URGENT') AS BIGINT) AS n_exact, "
            "ROUND((SELECT SUM(o_totalprice) FROM orders "
            "  WHERE o_orderstatus = 'F' "
            "  AND o_orderpriority = '1-URGENT'), 2) AS sum_exact, "
            "CAST((SELECT COUNT(*) FROM orders "
            "  WHERE o_orderstatus = 'O') AS BIGINT) AS n_prefix, "
            "CAST((SELECT COUNT(*) FROM orders "
            "  WHERE o_orderpriority = '5-LOW') AS BIGINT) "
            "  AS n_component, "
            "TRUE AS exact_pruned, TRUE AS component_pruned"),
        "multi_skip": (
            "WITH fin AS (SELECT o_orderkey, o_orderstatus, "
            "    o_totalprice FROM orders "
            "  UNION ALL SELECT 900000001 + i, 'X', 1.0 "
            "    FROM range(20) t(i) "
            "  UNION ALL SELECT 910000001 + i, 'X', 2.0 "
            "    FROM range(20) t(i)) "
            "SELECT o_orderkey, o_orderstatus, o_totalprice FROM fin "
            "WHERE o_orderstatus = 'X' AND o_orderkey = 910000005 "
            "AND o_totalprice >= 1.5"),
        "ivfpq_batch": (
            "SELECT 3 AS n_queries, "
            "CAST(COUNT(*) AS BIGINT) AS n_indexed, 5 AS k, "
            "TRUE AS matches_single, TRUE AS pruned "
            "FROM embeddings WHERE vec_id % 5 <> 0"),
        "ivfpq_remove": (
            "SELECT CAST(COUNT(*) AS BIGINT) AS n_before, "
            "CAST(COUNT(*) FILTER (WHERE vec_id % 7 = 3) AS BIGINT) "
            "  AS n_removed, "
            "CAST(COUNT(*) FILTER (WHERE vec_id % 7 <> 3) AS BIGINT) "
            "  AS n_after, "
            "TRUE AS top1_is_query FROM embeddings "
            "WHERE vec_id % 5 <> 0"),
        "time_travel_ts": (
            "SELECT 'as_of_create' AS state, "
            "CAST(COUNT(*) AS BIGINT) AS n_rows, "
            "CAST(SUM(n_nationkey) AS BIGINT) AS key_sum FROM nation "
            "UNION ALL SELECT 'current', "
            "CAST(COUNT(*) FILTER (WHERE n_nationkey % 2 <> 0) "
            "  AS BIGINT), "
            "CAST(SUM(n_nationkey) FILTER (WHERE n_nationkey % 2 <> 0)"
            "  AS BIGINT) FROM nation"),
        "partition_overwrite": (
            "WITH fin AS (SELECT n_nationkey, n_regionkey FROM nation "
            "  WHERE n_regionkey NOT IN (0, 1) "
            "  UNION ALL SELECT 400, 0 UNION ALL SELECT 401, 0) "
            "SELECT n_regionkey, CAST(COUNT(*) AS BIGINT) AS n_rows, "
            "CAST(SUM(n_nationkey) AS BIGINT) AS key_sum "
            "FROM fin GROUP BY n_regionkey"),
        "clone_vacuum_guard": (
            "SELECT CAST(COUNT(*) AS BIGINT) AS n_clone_rows, "
            "CAST(SUM(n_nationkey) AS BIGINT) AS key_sum, "
            "TRUE AS reclaimed_after_detach FROM nation"),
        "metadata_groupby": (
            "WITH allr AS (SELECT o_orderstatus FROM orders "
            "  UNION ALL SELECT 'X') "
            "SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_rows "
            "FROM allr GROUP BY o_orderstatus"),
        "mview_minmax_delete": (
            "WITH fin AS (SELECT o_orderstatus, o_totalprice "
            "  FROM orders "
            "  UNION ALL SELECT 'O', 0.005) "
            "SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_rows, "
            "MIN(o_totalprice) AS min_price, "
            "MAX(o_totalprice) AS max_price "
            "FROM fin GROUP BY o_orderstatus"),
        "bloom_skipping": (
            "SELECT o_orderkey, o_orderstatus, "
            "CAST(round(o_totalprice * 100, 0) AS BIGINT) "
            "  AS price_cents "
            "FROM orders WHERE o_orderkey = "
            "  (SELECT MIN(o_orderkey) FROM orders)"),
        "partition_pruned_join": (
            "SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_rows, "
            "CAST(round(SUM(o_totalprice) * 100, 0) AS BIGINT) "
            "  AS price_cents "
            "FROM orders "
            "WHERE o_orderpriority IN ('1-URGENT', '3-MEDIUM') "
            "GROUP BY o_orderpriority"),
        "mview_bucketed": (
            "SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_rows, "
            "CAST(round(SUM(c_acctbal "
            "  + CASE WHEN c_nationkey = 3 THEN 5.0 ELSE 0 END) "
            "  * 100, 0) AS BIGINT) AS acct_cents "
            "FROM customer GROUP BY c_nationkey"),
        "ann_batch_queries": (
            "WITH q AS (SELECT vec_id AS query_id, "
            "  CAST(embedding AS DOUBLE[]) AS qv FROM embeddings "
            "  WHERE vec_id < 3), "
            "scored AS (SELECT q.query_id, e.vec_id, "
            "  round(list_cosine_similarity("
            "    CAST(e.embedding AS DOUBLE[]), q.qv), 6) "
            "    AS cosine_sim "
            "  FROM q CROSS JOIN embeddings e), "
            "rk AS (SELECT *, row_number() OVER ("
            "  PARTITION BY query_id "
            "  ORDER BY cosine_sim DESC, vec_id) AS rn FROM scored) "
            "SELECT query_id, vec_id, cosine_sim FROM rk "
            "WHERE rn <= 5"),
        "ivfpq_append": (
            "SELECT CAST(COUNT(*) FILTER (WHERE vec_id % 5 <> 0) "
            "  AS BIGINT) AS n_base, "
            "CAST(COUNT(*) FILTER (WHERE vec_id % 5 = 0) AS BIGINT) "
            "  AS n_appended, "
            "CAST(COUNT(*) AS BIGINT) AS n_total, "
            "TRUE AS top1_is_query FROM embeddings"),
        "token_budget_mix": (
            "WITH t AS (SELECT source, doc_id, "
            "  CAST(len(regexp_split_to_array(text, '\\s+')) AS BIGINT) "
            "    AS n_tokens, "
            "  ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))"
            "::UBIGINT AS hv "
            "  FROM documents), "
            "w AS (SELECT source, n_tokens, "
            "  CAST(COALESCE(SUM(n_tokens) OVER ("
            "    PARTITION BY source ORDER BY hv, doc_id "
            "    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
            "    AS BIGINT) AS cum_before FROM t) "
            "SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, "
            "CAST(SUM(n_tokens) AS BIGINT) AS tok_sum "
            "FROM w WHERE cum_before < 500 GROUP BY source"),
        "mvcc_vacuum": (
            "WITH v1 AS (SELECT n_nationkey FROM nation "
            "       UNION ALL SELECT unnest([300, 301])), "
            "v2 AS (SELECT n_nationkey FROM v1 "
            "       WHERE n_nationkey NOT BETWEEN 5 AND 9) "
            "SELECT CAST(1 AS BIGINT) AS version, "
            "CAST(COUNT(*) AS BIGINT) AS n_rows, "
            "CAST(SUM(n_nationkey) AS BIGINT) AS key_sum FROM v1 "
            "UNION ALL SELECT CAST(2 AS BIGINT), "
            "CAST(COUNT(*) AS BIGINT), "
            "CAST(SUM(n_nationkey) AS BIGINT) FROM v2"),
        "optimizer_cardinality": (
            "SELECT CAST(1 AS INT) AS step, 'orders' AS joined, "
            "CAST((SELECT COUNT(*) FROM customer c JOIN orders o "
            "      ON c.c_custkey = o.o_custkey) AS BIGINT) "
            "  AS actual_rows, "
            "TRUE AS qerror_lt_16 "
            "UNION ALL SELECT CAST(2 AS INT), 'lineitem', "
            "CAST((SELECT COUNT(*) FROM customer c "
            "      JOIN orders o ON c.c_custkey = o.o_custkey "
            "      JOIN lineitem l ON o.o_orderkey = l.l_orderkey) "
            "     AS BIGINT), "
            "TRUE"),
        "distinct": ("SELECT DISTINCT c_nationkey, c_mktsegment "
                     "FROM customer"),
        "orderby_limit": (
            "SELECT c_custkey, c_acctbal FROM customer "
            "ORDER BY c_acctbal DESC, c_custkey LIMIT 10"),
        "union": ("SELECT c_nationkey AS nationkey FROM customer UNION "
                  "SELECT s_nationkey FROM supplier"),
        "intersect": (
            "SELECT c_nationkey AS nationkey FROM customer INTERSECT "
            "SELECT s_nationkey FROM supplier"),
        "except": ("SELECT o_custkey AS custkey FROM orders EXCEPT "
                   "SELECT c_custkey FROM customer WHERE c_acctbal > 0"),
        "except_all": (
            "SELECT o_orderpriority, o_custkey % 50 AS bucket "
            "FROM orders WHERE o_orderdate < TIMESTAMP '1999-01-01' "
            "EXCEPT ALL "
            "SELECT o_orderpriority, o_custkey % 50 AS bucket "
            "FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01' "
            "AND o_orderdate < TIMESTAMP '1999-01-01'"),
        "intersect_all": (
            "SELECT o_orderpriority, o_custkey % 50 AS bucket "
            "FROM orders WHERE o_orderdate < TIMESTAMP '1999-01-01' "
            "INTERSECT ALL "
            "SELECT o_orderpriority, o_custkey % 50 AS bucket "
            "FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01'"),
        "semi_join": ("SELECT c_custkey FROM customer WHERE c_custkey IN "
                      "(SELECT o_custkey FROM orders)"),
        "anti_join": ("SELECT c_custkey FROM customer WHERE c_custkey NOT IN "
                      "(SELECT o_custkey FROM orders "
                      "WHERE o_totalprice > 350000.0)"),
        "left_outer_join": (
            "SELECT c_mktsegment, COUNT(*) AS n_rows, "
            "COUNT(o_orderkey) AS n_orders FROM customer "
            "LEFT JOIN orders ON c_custkey = o_custkey "
            "GROUP BY c_mktsegment"),
        "having": ("SELECT o_custkey, COUNT(*) AS countAgg FROM orders "
                   "GROUP BY o_custkey HAVING COUNT(*) >= 5"),
        "rollup": ("SELECT l_returnflag, l_linestatus, COUNT(*) AS countAgg "
                   "FROM lineitem GROUP BY ROLLUP(l_returnflag, "
                   "l_linestatus)"),
        "cube": ("SELECT l_returnflag, l_linestatus, COUNT(*) AS countAgg "
                 "FROM lineitem "
                 "GROUP BY CUBE(l_returnflag, l_linestatus)"),
        "explode_array": (
            "SELECT vec_id, "
            "CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS pos, "
            "round(CAST(unnest(embedding) AS DOUBLE), 6) AS v "
            "FROM embeddings WHERE vec_id < 50"),
        "scalar_functions": (
            "SELECT o_orderkey, upper(o_orderpriority) AS prio_upper, "
            "length(o_orderpriority) AS prio_len, "
            "substr(o_orderpriority, 1, 1) AS prio_code, "
            "o_orderstatus || '-' || o_orderpriority AS status_prio, "
            "CAST(year(o_orderdate) AS INT) AS order_year, "
            "CAST(month(o_orderdate) AS INT) AS order_month, "
            "o_totalprice * 0.1 AS tithe FROM orders"),
        "case_expr": (
            "SELECT CASE WHEN o_totalprice > 200000 THEN 'big' "
            "WHEN o_totalprice > 50000 THEN 'mid' ELSE 'small' END "
            "AS bucket, COUNT(*) AS countAgg FROM orders GROUP BY 1"),
        "json_extract": (
            "SELECT CAST(regexp_extract(props, '\"k\": (\\d+)', 1) AS INT) "
            "AS k, COUNT(*) AS countAgg FROM events GROUP BY 1"),
        "window_rank": (
            "SELECT o_custkey, o_orderkey, rn FROM ("
            "SELECT o_custkey, o_orderkey, ROW_NUMBER() OVER ("
            "PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey"
            ") AS rn FROM orders) WHERE rn <= 2"),
        "window_running": (
            f"SELECT o_custkey, o_orderkey, "
            f"COUNT(*) OVER w AS running_n, "
            f"CAST(SUM(CAST(o_totalprice AS {dec})) OVER w AS DOUBLE) "
            f"AS running_spend FROM orders "
            f"WINDOW w AS (PARTITION BY o_custkey "
            f"ORDER BY o_orderdate, o_orderkey "
            f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"),
        "sessionize": (
            "WITH g AS (SELECT user_id, event_id, ts, "
            "  CASE WHEN lag(ts) OVER w IS NULL "
            "       OR epoch(ts) - epoch(lag(ts) OVER w) > 1800.0 "
            "       THEN 1 ELSE 0 END AS brk "
            "  FROM events WINDOW w AS (PARTITION BY user_id "
            "    ORDER BY ts, event_id)), "
            "s AS (SELECT user_id, "
            "  SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id "
            "    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
            "  AS session_idx FROM g) "
            "SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx, "
            "COUNT(*) AS n_events FROM s GROUP BY user_id, session_idx"),
        "time_window_agg": (
            f"SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') "
            f"AS window_start, event_type, COUNT(*) AS countAgg, "
            f"CAST(SUM(CAST(value AS {dec})) AS DOUBLE) AS sum_value "
            f"FROM events GROUP BY 1, 2"),
        "streaming_tumbling": (
            "SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') "
            "AS window_start, event_type, COUNT(*) AS n "
            "FROM events GROUP BY 1, 2"),
        "tpch_q1": (
            f"SELECT l_returnflag, l_linestatus, "
            f"CAST(SUM(CAST(l_quantity AS {dec})) AS DOUBLE) AS sum_qty, "
            f"CAST(SUM(CAST(l_extendedprice AS {dec})) AS DOUBLE) "
            f"AS sum_base_price, "
            f"CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS {dec})) "
            f"AS DOUBLE) AS sum_disc_price, "
            f"CAST(SUM(CAST(l_quantity AS {dec})) AS DOUBLE) "
            f"/ COUNT(l_quantity) AS avg_qty, "
            f"COUNT(*) AS count_order "
            f"FROM lineitem "
            f"WHERE l_shipdate < TIMESTAMP '1998-09-01 00:00:00' "
            f"GROUP BY l_returnflag, l_linestatus"),
        "tpch_q7": (
            f"SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation, "
            f"CAST(year(l_shipdate) AS INT) AS l_year, "
            f"round(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) "
            f"AS {dec})) AS DOUBLE), 4) AS revenue "
            f"FROM supplier JOIN lineitem ON s_suppkey = l_suppkey "
            f"JOIN orders ON l_orderkey = o_orderkey "
            f"JOIN customer ON o_custkey = c_custkey "
            f"JOIN nation sn ON s_nationkey = sn.n_nationkey "
            f"JOIN nation cn ON c_nationkey = cn.n_nationkey "
            f"WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00' "
            f"AND l_shipdate <= TIMESTAMP '1996-12-31 00:00:00' "
            f"AND sn.n_name IN ('NATION_1', 'NATION_2') "
            f"AND cn.n_name IN ('NATION_1', 'NATION_2') "
            f"AND sn.n_name <> cn.n_name "
            f"GROUP BY 1, 2, 3"),
        "tpch_q10": (
            f"SELECT c_custkey, c_name, "
            f"round(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) "
            f"AS {dec})) AS DOUBLE), 4) AS revenue, "
            f"round(c_acctbal, 2) AS c_acctbal, n_name "
            f"FROM customer JOIN orders ON c_custkey = o_custkey "
            f"JOIN lineitem ON o_orderkey = l_orderkey "
            f"JOIN nation ON c_nationkey = n_nationkey "
            f"WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00' "
            f"AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00' "
            f"AND l_returnflag = 'R' "
            f"GROUP BY c_custkey, c_name, c_acctbal, n_name "
            f"ORDER BY revenue DESC, c_custkey LIMIT 20"),
        "tpch_q3": (
            f"SELECT l_orderkey, "
            f"strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, "
            f"round(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) "
            f"AS {dec})) AS DOUBLE), 4) AS revenue "
            f"FROM customer JOIN orders ON c_custkey = o_custkey "
            f"JOIN lineitem ON o_orderkey = l_orderkey "
            f"WHERE c_mktsegment = 'BUILDING' "
            f"AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00' "
            f"AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00' "
            f"GROUP BY l_orderkey, o_orderdate "
            f"ORDER BY revenue DESC, l_orderkey LIMIT 10"),
        "tpch_q5": (
            f"SELECT n_name, "
            f"round(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) "
            f"AS {dec})) AS DOUBLE), 4) AS revenue "
            f"FROM customer JOIN orders ON c_custkey = o_custkey "
            f"JOIN lineitem ON o_orderkey = l_orderkey "
            f"JOIN supplier ON l_suppkey = s_suppkey "
            f"JOIN nation ON s_nationkey = n_nationkey "
            f"JOIN region ON n_regionkey = r_regionkey "
            f"WHERE r_name = 'ASIA' "
            f"AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' "
            f"AND c_nationkey = s_nationkey "
            f"GROUP BY n_name"),
        "tpch_q6": (
            f"SELECT round(CAST(SUM(CAST(l_extendedprice * l_discount "
            f"AS {dec})) AS DOUBLE), 4) AS revenue FROM lineitem "
            f"WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' "
            f"AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00' "
            f"AND l_discount >= 0.05 AND l_discount <= 0.07 "
            f"AND l_quantity < 24.0"),
        "tpch_q4": (
            "SELECT o_orderpriority, COUNT(*) AS order_count FROM orders "
            "WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00' "
            "AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00' "
            "AND EXISTS (SELECT 1 FROM lineitem "
            "            WHERE l_orderkey = o_orderkey "
            "            AND l_quantity > 45.0) "
            "GROUP BY o_orderpriority"),
        "tpch_q8": (
            f"SELECT CAST(year(o_orderdate) AS INT) AS o_year, "
            f"round(CAST(SUM(CAST(CASE WHEN n2.n_name = 'NATION_3' THEN "
            f"l_extendedprice * (1 - l_discount) ELSE 0.0 END AS {dec})) "
            f"AS DOUBLE) / CAST(SUM(CAST(l_extendedprice * (1 - "
            f"l_discount) AS {dec})) AS DOUBLE), 4) AS mkt_share "
            f"FROM lineitem JOIN part ON l_partkey = p_partkey "
            f"JOIN orders ON l_orderkey = o_orderkey "
            f"JOIN customer ON o_custkey = c_custkey "
            f"JOIN nation n1 ON c_nationkey = n1.n_nationkey "
            f"JOIN region ON n1.n_regionkey = r_regionkey "
            f"JOIN supplier ON l_suppkey = s_suppkey "
            f"JOIN nation n2 ON s_nationkey = n2.n_nationkey "
            f"WHERE p_type = 'STANDARD' AND r_name = 'AMERICA' "
            f"AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' "
            f"AND o_orderdate <= TIMESTAMP '1997-12-31 00:00:00' "
            f"GROUP BY year(o_orderdate) ORDER BY o_year"),
        "tpch_q9": (
            f"SELECT n_name AS nation, "
            f"CAST(year(o_orderdate) AS INT) AS o_year, "
            f"round(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) "
            f"AS {dec})) AS DOUBLE), 4) AS sum_profit "
            f"FROM lineitem JOIN part ON l_partkey = p_partkey "
            f"JOIN supplier ON l_suppkey = s_suppkey "
            f"JOIN nation ON s_nationkey = n_nationkey "
            f"JOIN orders ON l_orderkey = o_orderkey "
            f"WHERE p_type = 'ECONOMY' "
            f"GROUP BY n_name, year(o_orderdate) "
            f"ORDER BY nation, o_year DESC"),
        "tpch_q13": (
            "SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist FROM ("
            "SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) "
            "AS c_count "
            "FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey "
            "AND o_orderpriority <> '1-URGENT' "
            "GROUP BY c_custkey) "
            "GROUP BY c_count ORDER BY custdist DESC, c_count DESC"),
        "tpch_q15": (
            f"WITH rev AS (SELECT l_suppkey, "
            f"SUM(CAST(l_extendedprice * (1 - l_discount) AS {dec})) "
            f"AS total_rev FROM lineitem "
            f"WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' "
            f"AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00' "
            f"GROUP BY l_suppkey) "
            f"SELECT s_suppkey, s_name, "
            f"round(CAST(total_rev AS DOUBLE), 4) AS total_revenue "
            f"FROM rev JOIN supplier ON l_suppkey = s_suppkey "
            f"WHERE total_rev = (SELECT MAX(total_rev) FROM rev) "
            f"ORDER BY s_suppkey"),
        "tpch_q16": (
            "SELECT p_brand, p_type, p_size, "
            "CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt "
            "FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) "
            "JOIN part ON l_partkey = p_partkey "
            "WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO' "
            "AND p_size IN (5, 10, 15, 20, 25, 30) "
            "AND l_suppkey NOT IN "
            "(SELECT s_suppkey FROM supplier WHERE s_acctbal < 0) "
            "GROUP BY p_brand, p_type, p_size "
            "ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"),
        "tpch_q17": (
            f"WITH li AS (SELECT l_partkey, l_quantity, l_extendedprice "
            f"FROM lineitem JOIN part ON l_partkey = p_partkey "
            f"WHERE p_brand = 'Brand#3' AND p_type = 'SMALL'), "
            f"avgs AS (SELECT l_partkey AS a_partkey, "
            f"AVG(l_quantity) AS avg_qty FROM li GROUP BY l_partkey) "
            f"SELECT round(CAST(SUM(CAST(l_extendedprice AS {dec})) "
            f"/ 7.0 AS DOUBLE), 4) AS avg_yearly "
            f"FROM li JOIN avgs ON l_partkey = a_partkey "
            f"WHERE l_quantity < 0.2 * avg_qty"),
        "tpch_q19": (
            f"SELECT round(CAST(SUM(CAST(l_extendedprice * "
            f"(1 - l_discount) AS {dec})) AS DOUBLE), 4) AS revenue "
            f"FROM lineitem JOIN part ON l_partkey = p_partkey "
            f"WHERE (p_brand = 'Brand#12' AND p_type = 'SMALL' "
            f"AND p_size BETWEEN 1 AND 5 "
            f"AND l_quantity BETWEEN 1 AND 11) "
            f"OR (p_brand = 'Brand#23' AND p_type = 'MEDIUM' "
            f"AND p_size BETWEEN 1 AND 10 "
            f"AND l_quantity BETWEEN 10 AND 20) "
            f"OR (p_brand = 'Brand#34' AND p_type = 'LARGE' "
            f"AND p_size BETWEEN 1 AND 15 "
            f"AND l_quantity BETWEEN 20 AND 30)"),
        "tpch_q22": (
            f"WITH cust AS (SELECT * FROM customer "
            f"WHERE c_nationkey IN (1, 3, 5, 7)), "
            f"thr AS (SELECT CAST(SUM(CAST(c_acctbal AS {dec})) "
            f"AS DOUBLE) / COUNT(*) AS avg_bal "
            f"FROM cust WHERE c_acctbal > 0.0) "
            f"SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS numcust, "
            f"round(CAST(SUM(CAST(c_acctbal AS {dec})) AS DOUBLE), 2) "
            f"AS totacctbal "
            f"FROM cust, thr WHERE c_acctbal > avg_bal "
            f"AND NOT EXISTS (SELECT 1 FROM orders "
            f"WHERE o_custkey = c_custkey "
            f"AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00') "
            f"GROUP BY c_nationkey ORDER BY c_nationkey"),
        "tpch_q2": (
            "WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey "
            "FROM lineitem), "
            "cand AS (SELECT p_partkey, p_name, s_name, s_acctbal, n_name "
            "FROM pairs JOIN part ON l_partkey = p_partkey "
            "JOIN supplier ON l_suppkey = s_suppkey "
            "JOIN nation ON s_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey "
            "WHERE p_type = 'LARGE' AND p_size BETWEEN 10 AND 20 "
            "AND r_name = 'EUROPE') "
            "SELECT s_acctbal, s_name, n_name, p_partkey, p_name "
            "FROM cand c1 WHERE s_acctbal = (SELECT MIN(s_acctbal) "
            "FROM cand c2 WHERE c2.p_partkey = c1.p_partkey) "
            "ORDER BY s_acctbal DESC, n_name, s_name, p_partkey "
            "LIMIT 100"),
        "tpch_q11": (
            f"WITH nat_sup AS (SELECT s_suppkey FROM supplier "
            f"JOIN nation ON s_nationkey = n_nationkey "
            f"WHERE n_name = 'NATION_7'), "
            f"grouped AS (SELECT l_partkey AS part_key, "
            f"SUM(CAST(l_extendedprice * (1 - l_discount) AS {dec})) "
            f"AS val_dec FROM lineitem "
            f"JOIN nat_sup ON l_suppkey = s_suppkey GROUP BY l_partkey), "
            f"tot AS (SELECT CAST(SUM(val_dec) AS DOUBLE) / COUNT(*) "
            f"AS mean_val FROM grouped) "
            f"SELECT part_key, round(CAST(val_dec AS DOUBLE), 2) "
            f"AS part_value FROM grouped, tot "
            f"WHERE CAST(val_dec AS DOUBLE) > mean_val * 2.5 "
            f"ORDER BY part_value DESC, part_key"),
        "tpch_q12": (
            "SELECT l_returnflag, "
            "CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') "
            "THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, "
            "CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') "
            "THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' "
            "AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00' "
            "AND l_shipdate > o_orderdate + INTERVAL 60 DAY "
            "GROUP BY l_returnflag ORDER BY l_returnflag"),
        "tpch_q20": (
            f"SELECT s_name, s_acctbal FROM supplier "
            f"WHERE s_nationkey IN "
            f"(SELECT n_nationkey FROM nation WHERE n_regionkey = 3) "
            f"AND s_suppkey IN ("
            f"SELECT l_suppkey FROM lineitem "
            f"WHERE l_partkey IN "
            f"(SELECT p_partkey FROM part WHERE p_brand = 'Brand#5') "
            f"AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' "
            f"AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00' "
            f"GROUP BY l_suppkey "
            f"HAVING CAST(SUM(CAST(l_quantity AS {dec})) AS DOUBLE) "
            f"> 80.0) ORDER BY s_name"),
        "tpch_q21": (
            "SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait "
            "FROM lineitem l1 JOIN orders ON l1.l_orderkey = o_orderkey "
            "JOIN supplier ON l1.l_suppkey = s_suppkey "
            "WHERE o_orderstatus = 'F' "
            "AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY "
            "AND EXISTS (SELECT 1 FROM lineitem l2 "
            "WHERE l2.l_orderkey = l1.l_orderkey "
            "AND l2.l_suppkey <> l1.l_suppkey) "
            "AND NOT EXISTS (SELECT 1 FROM lineitem l3 "
            "WHERE l3.l_orderkey = l1.l_orderkey "
            "AND l3.l_suppkey <> l1.l_suppkey "
            "AND l3.l_shipdate > l1.l_shipdate) "
            "GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100"),
        "tpch_q14": (
            f"SELECT round("
            f"100 * CAST(SUM(CAST(CASE WHEN p_type = 'PROMO' "
            f"THEN l_extendedprice * (1 - l_discount) ELSE 0 END "
            f"AS {dec})) AS DOUBLE) "
            f"/ CAST(SUM(CAST(l_extendedprice * (1 - l_discount) "
            f"AS {dec})) AS DOUBLE), 4) AS promo_revenue_pct "
            f"FROM lineitem JOIN part ON l_partkey = p_partkey "
            f"WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00' "
            f"AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'"),
        "tpch_q18": (
            f"WITH big AS ("
            f"  SELECT l_orderkey, "
            f"  CAST(SUM(CAST(l_quantity AS {dec})) AS DOUBLE) AS sum_qty "
            f"  FROM lineitem GROUP BY l_orderkey "
            f"  HAVING CAST(SUM(CAST(l_quantity AS {dec})) AS DOUBLE) > 300) "
            f"SELECT c_name, c_custkey, o_orderkey, "
            f"strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, "
            f"o_totalprice, sum_qty "
            f"FROM big JOIN orders ON l_orderkey = o_orderkey "
            f"JOIN customer ON o_custkey = c_custkey "
            f"ORDER BY o_totalprice DESC, o_orderkey LIMIT 100"),
        "zorder_scan": (
            "SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey "
            "FROM lineitem WHERE l_suppkey = 7"),
        "streaming_enrich": (
            "SELECT c_mktsegment, COUNT(*) AS n FROM events "
            "LEFT JOIN customer ON user_id = c_custkey "
            "GROUP BY c_mktsegment"),
        "window_frame": (
            f"SELECT o_custkey, o_orderkey, "
            f"round(CAST(AVG(CAST(o_totalprice AS {dec})) OVER ("
            f"PARTITION BY o_custkey ORDER BY o_orderkey "
            f"ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE), 4) "
            f"AS moving_avg FROM orders"),
        "collect_sorted": (
            "SELECT c_nationkey, "
            "array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',') "
            "AS segments "
            "FROM customer GROUP BY c_nationkey"),
        "summary_stats": (
            "SELECT l_returnflag, "
            "round(stddev_samp(l_quantity), 4) AS std_qty, "
            "round(corr(l_quantity, l_extendedprice), 4) "
            "AS corr_qty_price, "
            "round(covar_samp(l_quantity, l_discount), 4) "
            "AS covar_qty_disc "
            "FROM lineitem GROUP BY l_returnflag"),
        "unpivot": (
            "SELECT p_partkey, 'p_size' AS feature, "
            "CAST(p_size AS DOUBLE) AS value FROM part "
            "UNION ALL "
            "SELECT p_partkey, 'p_retailprice', p_retailprice FROM part"),
        "streaming_interval_join": (
            "SELECT a.user_id, a.event_id AS click_id, "
            "b.event_id AS purchase_id "
            "FROM events a JOIN events b ON a.user_id = b.user_id "
            "AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTE "
            "WHERE a.event_type = 'click' AND b.event_type = 'purchase'"),
        "train_test_split": (
            "SELECT doc_id, CASE WHEN "
            "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT "
            "% 100 < 80 THEN 'train' ELSE 'test' END AS split "
            "FROM documents"),
        "group_split": (
            "SELECT doc_id, source, CASE WHEN "
            "('0x' || substr(md5(source), 1, 8))::BIGINT "
            "% 100 < 80 THEN 'train' ELSE 'test' END AS split "
            "FROM documents"),
        "quantiles": (
            "SELECT l_returnflag, "
            "round(quantile_cont(l_extendedprice, 0.5), 4) AS median_price, "
            "round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price "
            "FROM lineitem GROUP BY l_returnflag"),
        "bucketed_join": (
            "SELECT o_orderpriority, COUNT(*) AS countAgg, "
            "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) "
            "AS revenue FROM lineitem "
            "JOIN orders ON l_orderkey = o_orderkey "
            "GROUP BY o_orderpriority"),
        "asof_join": (
            "WITH c AS (SELECT user_id, event_id, ts FROM events "
            "  WHERE event_type = 'click'), "
            "p AS (SELECT user_id, ts, MAX(value) AS purchase_value "
            "  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2) "
            "SELECT c.user_id, c.event_id, "
            "round(p.purchase_value, 4) AS purchase_value "
            "FROM c ASOF LEFT JOIN p "
            "ON c.user_id = p.user_id AND c.ts >= p.ts"),
        "range_join": (
            "SELECT price_band, COUNT(*) AS countAgg FROM orders "
            "JOIN (VALUES (0.0, 50000.0, 'small'), "
            "(50000.0, 200000.0, 'mid'), (200000.0, 1000000.0, 'big')) "
            "t(lo, hi, price_band) "
            "ON o_totalprice >= lo AND o_totalprice < hi "
            "GROUP BY price_band"),
        "salted_join": (
            "SELECT s_nationkey, COUNT(*) AS countAgg, "
            "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) "
            "AS revenue "
            "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey "
            "GROUP BY s_nationkey"),
        "pivot": (
            "SELECT l_returnflag, "
            "CAST(COALESCE(SUM(CASE WHEN l_linestatus = 'O' THEN 1 END), 0) "
            "AS BIGINT) AS n_open, "
            "CAST(COALESCE(SUM(CASE WHEN l_linestatus = 'F' THEN 1 END), 0) "
            "AS BIGINT) AS n_filled FROM lineitem GROUP BY l_returnflag"),
        "streaming_sliding": (
            "SELECT strftime(time_bucket(INTERVAL '15 minutes', ts) "
            "- i * INTERVAL '15 minutes', '%Y-%m-%d %H:%M:%S') "
            "AS window_start, event_type, COUNT(*) AS n "
            "FROM events CROSS JOIN (SELECT unnest([0,1,2,3]) AS i) "
            "GROUP BY 1, 2"),
        "streaming_stateful_totals": (
            "SELECT user_id, COUNT(*) AS n_events, "
            "round(SUM(value), 4) AS total_value "
            "FROM events GROUP BY user_id"),
        "streaming_dedup": (
            "SELECT event_type, COUNT(*) AS n FROM events "
            "GROUP BY event_type"),
        "streaming_session": (
            "WITH g AS (SELECT user_id, event_id, ts, "
            "  CASE WHEN lag(ts) OVER w IS NULL "
            "       OR epoch(ts) - epoch(lag(ts) OVER w) >= 1800.0 "
            "       THEN 1 ELSE 0 END AS brk "
            "  FROM events WINDOW w AS (PARTITION BY user_id "
            "    ORDER BY ts, event_id)), "
            "s AS (SELECT user_id, ts, "
            "  SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id "
            "    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
            "  AS session_idx FROM g) "
            "SELECT user_id, "
            "strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start, "
            "COUNT(*) AS n_events FROM s GROUP BY user_id, session_idx"),
        "multimodal_features": (
            "SELECT doc_id, 'image/fake' AS mime, "
            "CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, "
            "md5(text) AS checksum FROM documents"),
        # frame windowing math of multimodal.sample_frames: step =
        # max(len//n, 1); frame i covers bytes [i*step, (i+1)*step)
        # clipped to len (python slice semantics)
        "frame_sample": (
            "WITH d AS (SELECT doc_id, "
            "           octet_length(encode(text)) AS len, "
            "           greatest(octet_length(encode(text)) // 4, 1) "
            "             AS step FROM documents) "
            "SELECT doc_id, CAST(f.i AS BIGINT) AS frame_idx, "
            "CAST(greatest(least(len, (f.i + 1) * step) - f.i * step, 0)"
            "     AS BIGINT) AS frame_n_bytes "
            "FROM d CROSS JOIN (SELECT unnest(range(4)) AS i) f"),
        # chunk_len = sample_rate(100) * chunk_seconds(2) = 200; the
        # empty waveform still yields one 0-sample chunk
        "audio_chunks": (
            "WITH d AS (SELECT doc_id, "
            "           octet_length(encode(text)) AS len "
            "           FROM documents), "
            "n AS (SELECT doc_id, len, "
            "      greatest((len + 199) // 200, 1) AS n_chunks FROM d), "
            "e AS (SELECT doc_id, len, "
            "      unnest(range(n_chunks)) AS i FROM n) "
            "SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx, "
            "CAST(greatest(least(len - i * 200, 200), 0) AS BIGINT) "
            "  AS chunk_n_samples, "
            "round(greatest(least(len - i * 200, 200), 0) / 100.0, 4) "
            "  AS duration_s FROM e"),
        # resize_stub size law: stride = max(len // (w*h//64), 1);
        # out = min(ceil(len/stride), w*h)  (w = h = 64 -> w*h//64 = 64)
        "asset_resize": (
            "WITH d AS (SELECT doc_id, "
            "           octet_length(encode(text)) AS len, "
            "           greatest(octet_length(encode(text)) // 64, 1) "
            "             AS stride FROM documents) "
            "SELECT doc_id, "
            "CAST(least((len + stride - 1) // stride, 4096) AS BIGINT) "
            "  AS resized_bytes, "
            "'image/fake' AS mime, 64 AS width, 64 AS height FROM d"),
        # pipeline
        "pipeline_clean_corpus": (
            "WITH scored AS ("
            "  SELECT doc_id, text, "
            "  round(0.4 * (length(regexp_replace(text, '[^A-Za-z]', '', "
            "               'g')) / greatest(length(text), 1))"
            "      + 0.3 * (CASE WHEN length(regexp_replace(text, '\\s+', "
            "                 '', 'g')) / greatest(len(regexp_split_to_array("
            "                 text, '\\s+')), 1) BETWEEN 3.0 AND 10.0 "
            "               THEN 1.0 ELSE 0.5 END)"
            "      + 0.3 * least(length(text) / 500.0, 1.0), 6) AS quality, "
            f"  {lang_case} AS lang "
            f"  FROM (SELECT *, {lang_defs} FROM documents)), "
            "ded AS ("
            "  SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(text) "
            "         ORDER BY doc_id) AS rn "
            "  FROM scored WHERE quality >= 0.5 AND lang = 'en') "
            "SELECT doc_id, "
            "len(regexp_split_to_array(text, '\\s+')) AS ws_tokens, "
            "len(regexp_extract_all(text, "
            "'[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+')) AS bpe_tokens, "
            "quality FROM ded WHERE rn = 1"),
        "dedup_exact": (
            "SELECT md5(text) AS fingerprint, MIN(doc_id) AS doc_id, "
            "COUNT(*) AS copies FROM documents GROUP BY md5(text)"),
        "text_stats": _TEXT_PROFILE_SQL.format(lang_case=lang_case,
                                               lang_defs=lang_defs),
        # text.classifier_quality replayed: same features, same frozen
        # weights (QUALITY_CLF_WEIGHTS), same left-assoc margin — the
        # kept decision is exact double arithmetic, the sigmoid rounds
        # to 4 decimals (one libm exp, far past its ulp)
        "quality_filter": (
            "WITH t AS (SELECT doc_id, "
            "list_filter(regexp_split_to_array(text, '\\s+'), "
            "x -> x <> '') AS tk, "
            "length(regexp_replace(text, '[^A-Za-z]', '', 'g')) "
            "/ greatest(length(text), 1) AS alpha, "
            "least(length(text) / 500.0, 1.0) AS len_sat, "
            "CAST((length(' ' || text || ' ') - length(replace("
            "' ' || text || ' ', ' the ', ''))) / 5 AS INT) AS hits "
            "FROM documents), "
            "f AS (SELECT doc_id, "
            "-5.4 + 4.0 * alpha "
            "+ 2.0 * (len(list_distinct(tk)) / greatest(len(tk), 1)) "
            "+ 1.5 * len_sat "
            "+ 6.0 * (hits / greatest(len(tk), 1)) AS m FROM t) "
            "SELECT doc_id, round(1.0 / (1.0 + exp(-m)), 4) AS clf_score, "
            "m >= 0 AS kept FROM f"),
        "lang_id": (
            f"SELECT {lang_case} AS lang_pred, COUNT(*) AS countAgg "
            f"FROM (SELECT {lang_defs} FROM documents) GROUP BY 1"),
        # DPO pair mining: same frozen-classifier score as
        # quality_filter, then per-source argmax/argmin with the
        # engine's deterministic tie-breaks
        "preference_pairs": (
            "WITH t AS (SELECT doc_id, "
            "list_filter(regexp_split_to_array(text, '\\s+'), "
            "x -> x <> '') AS tk, "
            "length(regexp_replace(text, '[^A-Za-z]', '', 'g')) "
            "/ greatest(length(text), 1) AS alpha, "
            "least(length(text) / 500.0, 1.0) AS len_sat, "
            "CAST((length(' ' || text || ' ') - length(replace("
            "' ' || text || ' ', ' the ', ''))) / 5 AS INT) AS hits "
            "FROM documents), "
            "f AS (SELECT doc_id, "
            "-5.4 + 4.0 * alpha "
            "+ 2.0 * (len(list_distinct(tk)) / greatest(len(tk), 1)) "
            "+ 1.5 * len_sat "
            "+ 6.0 * (hits / greatest(len(tk), 1)) AS m FROM t), "
            "s AS (SELECT f.doc_id, "
            "round(1.0 / (1.0 + exp(-m)), 4) AS clf_score, d.source "
            "FROM f JOIN documents d USING (doc_id) "
            "WHERE m IS NOT NULL), "
            "hi AS (SELECT source, doc_id AS chosen_id, "
            "clf_score AS chosen_score, ROW_NUMBER() OVER ("
            "PARTITION BY source "
            "ORDER BY clf_score DESC, doc_id DESC) AS r FROM s), "
            "lo AS (SELECT source, doc_id AS rejected_id, "
            "clf_score AS rejected_score, ROW_NUMBER() OVER ("
            "PARTITION BY source "
            "ORDER BY clf_score ASC, doc_id ASC) AS r FROM s) "
            "SELECT hi.source, chosen_id, rejected_id, chosen_score, "
            "rejected_score, "
            "round(chosen_score - rejected_score, 6) AS margin "
            "FROM hi JOIN lo ON hi.source = lo.source "
            "AND hi.r = 1 AND lo.r = 1 "
            "WHERE chosen_id <> rejected_id "
            "AND round(chosen_score - rejected_score, 6) >= 0.05"),
        "embedding_topk": (
            "SELECT vec_id, round(list_cosine_similarity("
            "CAST(embedding AS DOUBLE[]), "
            "(SELECT CAST(embedding AS DOUBLE[]) FROM embeddings "
            "WHERE vec_id = 0)), 6) AS cosine_sim "
            "FROM embeddings ORDER BY cosine_sim DESC, vec_id LIMIT 10"),
        # shared-shingle blocking (ngram_block) — exact, see clusters_sql
        "ngram_jaccard": (
            f"WITH {ngram_sh}, {ngram_block} "
            f"SELECT ca AS a, cb AS b, round({jacc}, 6) AS jaccard "
            f"FROM cand JOIN sh a ON a.doc_id = ca "
            f"JOIN sh b ON b.doc_id = cb WHERE {jacc} >= 0.6"),
        "containment_near_dups": (
            f"WITH {ngram_sh}, {ngram_block} "
            f"SELECT ca AS a, cb AS b, round({cont}, 6) AS containment, "
            f"CASE WHEN len(a.s) <= len(b.s) THEN ca ELSE cb END "
            f"  AS small "
            f"FROM cand JOIN sh a ON a.doc_id = ca "
            f"JOIN sh b ON b.doc_id = cb WHERE {cont} >= 0.9"),
        "containment_apply": (
            f"WITH {ngram_sh}, {ngram_block} "
            f"SELECT doc_id, CAST(len(regexp_split_to_array(text, "
            f"'\\s+')) AS INT) AS n_tokens "
            f"FROM (SELECT doc_id, text FROM corpus) "
            f"WHERE doc_id NOT IN ("
            f"  SELECT CASE WHEN len(a.s) <= len(b.s) THEN ca "
            f"         ELSE cb END "
            f"  FROM cand JOIN sh a ON a.doc_id = ca "
            f"  JOIN sh b ON b.doc_id = cb WHERE {cont} >= 0.9) "
            f"ORDER BY doc_id"),
        "dedup_clusters": clusters_sql,
        "dedup_clusters_star": clusters_sql,
        "token_counts": (
            "SELECT doc_id, "
            "len(regexp_split_to_array(text, '\\s+')) AS ws_tokens, "
            "len(regexp_extract_all(text, "
            "'[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+')) AS bpe_tokens "
            "FROM documents"),
        "bpe_merges": _bpe_sql(rounds=5),
        "bpe_segment": _bpe_segment_sql(),
        "vocab_top": (
            "SELECT token, CAST(COUNT(DISTINCT doc_id) AS BIGINT) "
            "AS doc_freq, CAST(COUNT(*) AS BIGINT) AS total_count "
            "FROM (SELECT doc_id, "
            "unnest(regexp_split_to_array(text, '\\s+')) AS token "
            "FROM documents) WHERE token <> '' "
            "GROUP BY token HAVING COUNT(DISTINCT doc_id) >= 2 "
            "ORDER BY doc_freq DESC, total_count DESC, token LIMIT 100"),
        "tfidf_features": (
            "WITH tok AS (SELECT doc_id, "
            "unnest(regexp_split_to_array(text, '\\s+')) AS token "
            "FROM documents), "
            "tf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf "
            "FROM tok WHERE token <> '' GROUP BY doc_id, token), "
            "dfq AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS doc_freq "
            "FROM tf GROUP BY token), "
            "n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs "
            "FROM documents) "
            "SELECT doc_id, token, tf, doc_freq, "
            "round(tf * (ln((n_docs + 1) / (doc_freq + 1.0)) + 1), 4) "
            "AS tfidf "
            "FROM tf JOIN dfq USING (token), n "
            "WHERE doc_id < 30 ORDER BY doc_id, token"),
        "pii_redact": pii_sql,
        "contamination_check": conta_sql,
        "doc_fingerprints": (
            "WITH d AS (SELECT doc_id, text FROM documents "
            "WHERE doc_id < 40), "
            "g AS (SELECT doc_id, CASE WHEN length(text) < 8 "
            "THEN [text] ELSE list_transform(range(1, length(text) - 6), "
            "i -> substr(text, i, 8)) END AS grams FROM d), "
            "h AS (SELECT doc_id, list_transform(grams, g -> "
            "CAST(('0x' || substr(md5(g), 1, 15))::UBIGINT "
            "% 1000000007 AS BIGINT)) AS hs FROM g), "
            "f AS (SELECT doc_id, CASE WHEN len(hs) <= 4 "
            "THEN [list_aggregate(hs, 'min')] "
            "ELSE list_transform(range(1, len(hs) - 2), "
            "j -> list_aggregate(hs[j:j+3], 'min')) END AS fps FROM h) "
            "SELECT doc_id, unnest(list_distinct(fps)) AS fingerprint "
            "FROM f"),
        "pagerank": pagerank_sql,
        "compact_scan": "SELECT * FROM orders",
        "table_histogram": (
            "WITH mm AS (SELECT CAST(MIN(l_quantity) AS DOUBLE) AS lo, "
            "CAST(MAX(l_quantity) AS DOUBLE) AS hi FROM lineitem), "
            "b AS (SELECT least(CAST(floor((l_quantity - lo) "
            "/ ((hi - lo) / 10)) AS INT) + 1, 10) AS bucket, lo, hi "
            "FROM lineitem, mm) "
            "SELECT bucket, "
            "round(lo + (bucket - 1) * (hi - lo) / 10, 4) AS bucket_lo, "
            "round(lo + bucket * (hi - lo) / 10, 4) AS bucket_hi, "
            "CAST(COUNT(*) AS BIGINT) AS n "
            "FROM b GROUP BY bucket, lo, hi ORDER BY bucket"),
        "frequent_pairs": (
            "WITH op AS (SELECT DISTINCT l_orderkey, l_partkey "
            "FROM lineitem) "
            "SELECT x.l_partkey AS a, y.l_partkey AS b, "
            "CAST(COUNT(*) AS BIGINT) AS n_orders "
            "FROM op x JOIN op y ON x.l_orderkey = y.l_orderkey "
            "AND x.l_partkey < y.l_partkey "
            "GROUP BY x.l_partkey, y.l_partkey HAVING COUNT(*) >= 2 "
            "ORDER BY n_orders DESC, a, b LIMIT 100"),
        "encode_documents": (
            "WITH tok_all AS (SELECT doc_id, "
            "unnest(regexp_split_to_array(text, '\\s+')) AS token "
            "FROM documents), "
            "tc AS (SELECT token, COUNT(*) AS total_count FROM tok_all "
            "WHERE token <> '' GROUP BY token), "
            "vids AS (SELECT token, CAST(row_number() OVER "
            "(ORDER BY total_count DESC, token) AS INT) AS token_id "
            "FROM tc QUALIFY token_id <= 50), "
            "d AS (SELECT doc_id, regexp_split_to_array(text, '\\s+') "
            "AS toks FROM documents WHERE doc_id < 30), "
            "tok AS (SELECT doc_id, unnest(toks) AS token, "
            "generate_subscripts(toks, 1) AS pos FROM d), "
            "m AS (SELECT doc_id, pos, COALESCE(token_id, 0) AS tid "
            "FROM (SELECT * FROM tok WHERE token <> '') "
            "LEFT JOIN vids USING (token)), "
            "e AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens, "
            "CAST(SUM(CASE WHEN tid = 0 THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_oov, "
            "string_agg(tid::VARCHAR, ',' ORDER BY pos) AS ids "
            "FROM m GROUP BY doc_id) "
            "SELECT dd.doc_id, COALESCE(e.n_tokens, 0) AS n_tokens, "
            "COALESCE(e.n_oov, 0) AS n_oov, "
            "COALESCE(e.ids, '') AS ids "
            "FROM (SELECT DISTINCT doc_id FROM d) dd "
            "LEFT JOIN e USING (doc_id)"),
        "udtf_sentences": (
            "SELECT doc_id, "
            "CAST(generate_subscripts(parts, 1) - 1 AS INT) "
            "AS sent_idx, unnest(parts) AS sentence "
            "FROM (SELECT doc_id, string_split("
            "replace(text, ' table ', '. '), '. ') AS parts "
            "FROM documents WHERE doc_id < 30)"),
        "window_ntile": (
            "SELECT c_custkey, c_mktsegment, c_acctbal, "
            "CAST(ntile(4) OVER w AS INT) AS quartile, "
            "round(percent_rank() OVER w, 6) AS pct_rank, "
            "round(cume_dist() OVER w, 6) AS cume "
            "FROM customer WHERE c_custkey < 200 "
            "WINDOW w AS (PARTITION BY c_mktsegment "
            "ORDER BY c_acctbal DESC, c_custkey) "
            "ORDER BY c_custkey"),
        "null_safe_join": (
            "WITH l AS (SELECT CASE WHEN o_orderkey % 100 = 0 "
            "THEN NULL ELSE o_orderpriority END AS k, o_orderkey "
            "FROM orders), "
            "r AS (SELECT * FROM (VALUES ('1-URGENT', 10), "
            "('2-HIGH', 5), (NULL, 1)) v(k, weight)) "
            "SELECT COALESCE(l.k, '<null>') AS key, "
            "CAST(COUNT(*) AS BIGINT) AS n, "
            "CAST(SUM(weight) AS BIGINT) AS w "
            "FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k "
            "GROUP BY COALESCE(l.k, '<null>') ORDER BY key"),
        "full_outer_join": (
            "WITH per_cust AS (SELECT o_custkey, "
            "CAST(COUNT(*) AS BIGINT) AS n_orders FROM orders "
            "GROUP BY o_custkey), "
            "dim AS (SELECT c_custkey, c_mktsegment FROM customer "
            "WHERE c_custkey % 2 = 0 "
            "UNION ALL SELECT * FROM (VALUES (9000001, 'PHANTOM'), "
            "(9000002, 'PHANTOM')) v(c_custkey, c_mktsegment)) "
            "SELECT CASE WHEN o_custkey IS NULL THEN 'dim_only' "
            "WHEN c_custkey IS NULL THEN 'orders_only' "
            "ELSE 'both' END AS side, "
            "COALESCE(c_mktsegment, '?') AS segment, "
            "CAST(COUNT(*) AS BIGINT) AS n_keys, "
            "CAST(COALESCE(SUM(n_orders), 0) AS BIGINT) "
            "AS total_orders "
            "FROM per_cust FULL OUTER JOIN dim "
            "ON o_custkey = c_custkey "
            "GROUP BY side, segment ORDER BY side, segment"),
        "cross_join": (
            "WITH pr AS (SELECT n_regionkey, CAST(COUNT(*) AS BIGINT) "
            "AS n_nat FROM nation GROUP BY n_regionkey), "
            "r AS (SELECT r_regionkey, r_name, n_nat FROM region "
            "JOIN pr ON r_regionkey = n_regionkey) "
            "SELECT a.r_name AS a_name, b.r_name AS b_name, "
            "a.n_nat * b.n_nat AS pair_count "
            "FROM r a CROSS JOIN r b WHERE a.r_regionkey < b.r_regionkey "
            "ORDER BY a_name, b_name"),
        "grouping_sets": (
            "SELECT o_orderstatus, o_orderpriority, "
            "CAST(COUNT(*) AS BIGINT) AS n_orders, "
            "CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) "
            "AS gid FROM orders "
            "GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), "
            "(o_orderstatus), ()) "
            "ORDER BY gid, o_orderstatus, o_orderpriority"),
        "constraint_check": (
            "WITH planted(o_orderkey, o_custkey, o_orderpriority) AS "
            "(VALUES (9000001, -5, '5-LOW'), (9000001, -5, '5-LOW'), "
            "(9000002, NULL, NULL)), "
            "o2 AS (SELECT o_orderkey, o_custkey, o_orderpriority "
            "FROM orders UNION ALL SELECT * FROM planted) "
            "SELECT 'not_null(o_orderpriority)' AS check_name, "
            "CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 "
            "END) AS BIGINT) AS violations FROM o2 "
            "UNION ALL "
            "SELECT 'unique(o_orderkey)', "
            "CAST(COALESCE(SUM(n - 1), 0) AS BIGINT) FROM "
            "(SELECT COUNT(*) AS n FROM o2 GROUP BY o_orderkey "
            "HAVING COUNT(*) > 1) "
            "UNION ALL "
            "SELECT 'foreign_key(o_custkey->c_custkey)', "
            "CAST(COUNT(*) AS BIGINT) FROM o2 "
            "WHERE o_custkey IS NOT NULL AND o_custkey NOT IN "
            "(SELECT c_custkey FROM customer)"),
        "streaming_outer_join": (
            "SELECT c.user_id, c.event_id AS click_id, "
            "p.event_id AS purchase_id "
            "FROM (SELECT * FROM events WHERE event_type = 'click') c "
            "LEFT JOIN (SELECT * FROM events "
            "WHERE event_type = 'purchase') p "
            "ON c.user_id = p.user_id AND p.ts > c.ts "
            "AND p.ts <= c.ts + INTERVAL 30 MINUTE"),
        "triangle_count": (
            "WITH p AS (SELECT DISTINCT l_orderkey, l_suppkey "
            "FROM lineitem), "
            "two AS (SELECT l_orderkey FROM p GROUP BY l_orderkey "
            "HAVING COUNT(*) = 2), "
            "p2 AS (SELECT * FROM p WHERE l_orderkey IN "
            "(SELECT l_orderkey FROM two)), "
            "e AS (SELECT DISTINCT x.l_suppkey AS a, y.l_suppkey AS b "
            "FROM p2 x JOIN p2 y ON x.l_orderkey = y.l_orderkey "
            "AND x.l_suppkey < y.l_suppkey), "
            "t AS (SELECT e1.a AS v1, e1.b AS v2, e2.b AS v3 "
            "FROM e e1 JOIN e e2 ON e1.b = e2.a "
            "JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b), "
            "v AS (SELECT v1 AS vertex FROM t "
            "UNION ALL SELECT v2 FROM t UNION ALL SELECT v3 FROM t) "
            "SELECT vertex, CAST(COUNT(*) AS BIGINT) AS n_triangles "
            "FROM v GROUP BY vertex ORDER BY vertex"),
        "resample_fill": (
            f"WITH agg AS (SELECT user_id, date_trunc('hour', ts) AS b, "
            f"round(CAST(SUM(CAST(value AS {dec})) AS DOUBLE), 4) AS v "
            f"FROM events WHERE user_id < 20 "
            f"GROUP BY user_id, date_trunc('hour', ts)), "
            f"span AS (SELECT user_id, MIN(b) AS lo, MAX(b) AS hi "
            f"FROM agg GROUP BY user_id), "
            f"grid AS (SELECT user_id, "
            f"unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS b "
            f"FROM span) "
            f"SELECT g.user_id, strftime(g.b, '%Y-%m-%d %H:%M:%S') "
            f"AS bucket, last_value(a.v IGNORE NULLS) OVER ("
            f"PARTITION BY g.user_id ORDER BY g.b "
            f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
            f"AS value, (a.v IS NULL) AS is_gap "
            f"FROM grid g LEFT JOIN agg a "
            f"ON g.user_id = a.user_id AND g.b = a.b"),
        "funnel": (
            "WITH v AS (SELECT user_id, MIN(ts) AS t1 FROM events "
            "WHERE event_type = 'view' GROUP BY user_id), "
            "c AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e "
            "JOIN v ON e.user_id = v.user_id AND e.ts > v.t1 "
            "WHERE e.event_type = 'click' GROUP BY e.user_id), "
            "p AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e "
            "JOIN c ON e.user_id = c.user_id AND e.ts > c.t2 "
            "WHERE e.event_type = 'purchase' GROUP BY e.user_id) "
            "SELECT 1 AS stage_idx, 'view' AS stage, "
            "(SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS n_users "
            "UNION ALL SELECT 2, 'click', "
            "(SELECT CAST(COUNT(*) AS BIGINT) FROM c) "
            "UNION ALL SELECT 3, 'purchase', "
            "(SELECT CAST(COUNT(*) AS BIGINT) FROM p)"),
        "cohort_retention": (
            "WITH act AS (SELECT DISTINCT user_id AS u, "
            "CAST(date_trunc('week', ts) AS DATE) AS w FROM events), "
            "f AS (SELECT u, MIN(w) AS cohort_week FROM act GROUP BY u) "
            "SELECT cohort_week, "
            "CAST(date_diff('day', cohort_week, w) // 7 AS INT) "
            "AS week_offset, CAST(COUNT(DISTINCT u) AS BIGINT) "
            "AS n_users FROM act JOIN f USING (u) "
            "GROUP BY cohort_week, week_offset "
            "ORDER BY cohort_week, week_offset"),
        "incremental_agg": (
            f"SELECT CAST(ts AS DATE) AS day, event_type, "
            f"CAST(COUNT(*) AS BIGINT) AS n_events, "
            f"round(CAST(SUM(CAST(value AS {dec})) AS DOUBLE), 4) "
            f"AS sum_value FROM events "
            f"GROUP BY CAST(ts AS DATE), event_type "
            f"ORDER BY day, event_type"),
        "scd2_dimension": (
            "SELECT c_custkey, c_name, c_mktsegment, "
            "'2020-01-01' AS valid_from, '2024-06-01' AS valid_to, "
            "FALSE AS is_current FROM customer WHERE c_custkey % 10 = 0 "
            "UNION ALL "
            "SELECT c_custkey, c_name, c_mktsegment, '2020-01-01', "
            "CAST(NULL AS VARCHAR), TRUE FROM customer "
            "WHERE c_custkey % 10 <> 0 "
            "UNION ALL "
            "SELECT c_custkey, c_name, 'MIGRATED', '2024-06-01', "
            "CAST(NULL AS VARCHAR), TRUE FROM customer "
            "WHERE c_custkey % 10 = 0 "
            "UNION ALL "
            "SELECT * FROM (VALUES "
            "(9900001, 'Customer#9900001', 'FURNITURE', '2024-06-01', "
            "CAST(NULL AS VARCHAR), TRUE), "
            "(9900002, 'Customer#9900002', 'MACHINERY', '2024-06-01', "
            "CAST(NULL AS VARCHAR), TRUE)) v(c_custkey, c_name, "
            "c_mktsegment, valid_from, valid_to, is_current)"),
        "merge_upsert": (
            "SELECT n_nationkey, "
            "CASE WHEN n_nationkey < 3 THEN n_name || '~u' "
            "ELSE n_name END AS n_name, n_regionkey FROM nation "
            "UNION ALL "
            "SELECT * FROM (VALUES (100, 'NATION_100', 0), "
            "(101, 'NATION_101', 1)) v(n_nationkey, n_name, n_regionkey)"),
        "minhash_near_dups": minhash_sql,
        "simhash_near_dups": simhash_sql,
        "embedding_ann_lsh": lsh_sql,
        # recall@10 from the same two SQL re-encodings the ann/exact
        # entries verify — overlap of the probed bucket's top-10 with
        # the brute-force top-10
        "ann_recall": (
            f"WITH ann AS (SELECT vec_id FROM ({lsh_sql})), "
            f"ex AS (SELECT vec_id FROM embeddings "
            f"ORDER BY round(list_cosine_similarity("
            f"CAST(embedding AS DOUBLE[]), "
            f"(SELECT CAST(embedding AS DOUBLE[]) FROM embeddings "
            f"WHERE vec_id = 0)), 6) DESC, vec_id LIMIT 10) "
            f"SELECT 10 AS k, COUNT(*)::BIGINT AS n_overlap, "
            f"round(COUNT(*) / 10.0, 4) AS recall "
            f"FROM ex JOIN ann USING (vec_id)"),
        "embedding_ann_ivf": ivf_sql,
        # file-granularity skipping: the probe bounds re-derive from
        # SQL MIN/MAX exactly as the entry derives them from table
        # metadata; the WHERE then replays the pruned aggregate
        "file_skip": (
            "WITH b AS (SELECT MIN(o_orderkey) AS mn, "
            "MAX(o_orderkey) AS mx FROM orders), "
            "r AS (SELECT mn + CAST(floor((mx - mn) * 30 / 100) "
            "AS BIGINT) AS lo, mn + CAST(floor((mx - mn) * 35 / 100) "
            "AS BIGINT) AS hi FROM b) "
            "SELECT COUNT(*)::BIGINT AS n_rows, "
            "round(SUM(o_totalprice), 2) AS sum_price, "
            "MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key "
            "FROM orders, r WHERE o_orderkey BETWEEN r.lo AND r.hi"),
        "ann_filtered": ann_filtered_sql,
        # filtered IVF-PQ: scalars + contract bits (the PQ pipeline
        # itself is pinned by the in-entry recall/label contracts and
        # the unit suite, like ivfpq_probe/pq_ann)
        "ivfpq_filtered": (
            "SELECT 10 AS k, COUNT(*)::BIGINT AS n_eligible, "
            "true AS all_match_filter, true AS recall_ge_04 "
            "FROM embeddings WHERE label = 2"),
        # line-level boilerplate strip: re-line into 8-token chunks +
        # a per-domain footer, count distinct docs per (domain, line),
        # strip >= max(2, 50% of domain), reassemble by position —
        # text.strip_boilerplate replayed end to end
        "boilerplate_strip": (
            "WITH docs AS (SELECT doc_id, source, "
            "array_to_string(list_transform(range(0, CAST(ceil("
            "len(regexp_split_to_array(text, '\\s+')) / 8.0) AS INT)), "
            "i -> array_to_string(regexp_split_to_array(text, '\\s+')"
            "[i * 8 + 1 : i * 8 + 8], ' ')), chr(10)) "
            "|| chr(10) || 'footer for ' || source AS text "
            "FROM documents), "
            "ls AS (SELECT doc_id, source, "
            "string_split(text, chr(10)) AS arr FROM docs), "
            "lines AS (SELECT doc_id, source, u.pos AS pos, "
            "u.line AS line FROM (SELECT doc_id, source, "
            "unnest(list_transform(range(1, len(arr) + 1), "
            "i -> {'pos': i, 'line': arr[i]})) AS u FROM ls) z), "
            "nd AS (SELECT source, COUNT(*) AS n_docs FROM docs "
            "GROUP BY source), "
            "boiler AS (SELECT c.source, c.line FROM ("
            "SELECT source, line, COUNT(DISTINCT doc_id) AS n_in "
            "FROM lines GROUP BY source, line) c "
            "JOIN nd USING (source) "
            "WHERE n_in >= 2 AND n_in >= n_docs * 0.5), "
            "kept AS (SELECT l.doc_id, l.source, l.pos, l.line "
            "FROM lines l ANTI JOIN boiler b "
            "ON l.source = b.source AND l.line = b.line), "
            "tot AS (SELECT doc_id, source, COUNT(*) AS n_lines "
            "FROM lines GROUP BY doc_id, source), "
            "reb AS (SELECT doc_id, source, COUNT(*) AS n_kept, "
            "string_agg(line, chr(10) ORDER BY pos) AS text "
            "FROM kept GROUP BY doc_id, source) "
            "SELECT t.doc_id, t.source, t.n_lines::BIGINT AS n_lines, "
            "COALESCE(r.n_kept, 0)::BIGINT AS n_kept, "
            "md5(COALESCE(r.text, '')) AS text_hash "
            "FROM tot t LEFT JOIN reb r USING (doc_id, source)"),
        # multinomial NB replay: Laplace token likelihoods + priors on
        # the %5!=0 split, dense token×class grid with per-class
        # smoothed default, 6dp-rounded scores, label-asc argmax —
        # classify.nb_train/nb_predict re-derived end to end
        "nb_classify": (
            "WITH train AS (SELECT doc_id, lang, text FROM documents "
            "WHERE doc_id % 5 <> 0), "
            "test AS (SELECT doc_id, lang, text FROM documents "
            "WHERE doc_id % 5 = 0), "
            "ttok AS (SELECT lang AS label, unnest("
            "regexp_split_to_array(text, '\\s+')) AS token FROM train), "
            "tok AS (SELECT label, token FROM ttok WHERE token <> ''), "
            "counts AS (SELECT label, token, COUNT(*) AS cnt "
            "FROM tok GROUP BY label, token), "
            "totals AS (SELECT label, SUM(cnt) AS total FROM counts "
            "GROUP BY label), "
            "vocab AS (SELECT COUNT(DISTINCT token) AS v FROM tok), "
            "lik AS (SELECT c.label, c.token, "
            "ln(c.cnt + 1.0) - ln(t.total + 1.0 * vocab.v) AS log_lik "
            "FROM counts c JOIN totals t USING (label), vocab), "
            "ndocs AS (SELECT COUNT(*) AS n FROM train), "
            "nlab AS (SELECT lang AS label, COUNT(*) AS n_label "
            "FROM train GROUP BY lang), "
            "priors AS (SELECT t.label, "
            "ln(nlab.n_label / ndocs.n) AS log_prior, "
            "ln(1.0) - ln(t.total + 1.0 * vocab.v) AS log_default "
            "FROM totals t JOIN nlab USING (label), vocab, ndocs), "
            "stok AS (SELECT doc_id, token FROM (SELECT doc_id, unnest("
            "regexp_split_to_array(text, '\\s+')) AS token FROM test) z "
            "WHERE token <> ''), "
            "dense AS (SELECT s.doc_id, p.label, "
            "COALESCE(l.log_lik, p.log_default) AS ll "
            "FROM stok s CROSS JOIN priors p "
            "LEFT JOIN lik l ON l.label = p.label AND l.token = s.token), "
            "scored AS (SELECT d.doc_id, d.label, "
            "round(SUM(d.ll) + ANY_VALUE(p.log_prior), 6) AS score "
            "FROM dense d JOIN priors p ON p.label = d.label "
            "GROUP BY d.doc_id, d.label), "
            "ranked AS (SELECT doc_id, label, score, row_number() OVER ("
            "PARTITION BY doc_id ORDER BY score DESC, label ASC) AS rk "
            "FROM scored) "
            "SELECT r.doc_id, r.label AS predicted, "
            "r.score AS log_posterior, (r.label = t.lang) AS correct "
            "FROM ranked r JOIN test t USING (doc_id) WHERE r.rk = 1"),
        # KMV overlap replay: identical portable-md5 60-bit hashes →
        # identical 256-row sketches → identical estimates (not just
        # statistically close) — sketches.kmv_overlap re-derived
        "kmv_overlap": (
            "WITH a AS (SELECT DISTINCT CAST(('0x' || substr(md5("
            "o_orderkey::VARCHAR), 1, 15))::UBIGINT AS BIGINT) AS h "
            "FROM orders WHERE o_totalprice >= 100000), "
            "b AS (SELECT DISTINCT CAST(('0x' || substr(md5("
            "l_orderkey::VARCHAR), 1, 15))::UBIGINT AS BIGINT) AS h "
            "FROM lineitem WHERE l_quantity >= 25), "
            "sa AS (SELECT h FROM a ORDER BY h LIMIT 256), "
            "sb AS (SELECT h FROM b ORDER BY h LIMIT 256), "
            "ea AS (SELECT CASE WHEN COUNT(*) < 256 THEN "
            "round(COUNT(*)::DOUBLE, 4) ELSE "
            "round(255.0 * 1152921504606846976.0 / MAX(h), 4) END "
            "AS est_a FROM sa), "
            "eb AS (SELECT CASE WHEN COUNT(*) < 256 THEN "
            "round(COUNT(*)::DOUBLE, 4) ELSE "
            "round(255.0 * 1152921504606846976.0 / MAX(h), 4) END "
            "AS est_b FROM sb), "
            "merged AS (SELECT h, "
            "CASE WHEN sa.h IS NOT NULL THEN 1 ELSE 0 END AS in_a, "
            "CASE WHEN sb.h IS NOT NULL THEN 1 ELSE 0 END AS in_b "
            "FROM sa FULL OUTER JOIN sb USING (h) "
            "ORDER BY h LIMIT 256), "
            "u AS (SELECT COUNT(*) AS n, MAX(h) AS hmax, "
            "SUM(in_a * in_b) AS n_both FROM merged), "
            "est AS (SELECT n, "
            "CASE WHEN n < 256 THEN n::DOUBLE ELSE "
            "255.0 * 1152921504606846976.0 / hmax END AS eu, "
            "n_both / n AS jacc FROM u), "
            "exact AS (SELECT COUNT(*) AS exact_intersection FROM ("
            "SELECT DISTINCT o_orderkey AS k FROM orders "
            "WHERE o_totalprice >= 100000 INTERSECT "
            "SELECT DISTINCT l_orderkey AS k FROM lineitem "
            "WHERE l_quantity >= 25)) "
            "SELECT 256 AS k, est.n::BIGINT AS n_union_sketch, "
            "ea.est_a, eb.est_b, round(est.eu, 4) AS est_union, "
            "round(est.jacc, 6) AS jaccard, "
            "round(est.jacc * est.eu, 4) AS est_intersection, "
            "exact.exact_intersection::BIGINT AS exact_intersection, "
            "round(abs(round(est.jacc * est.eu, 4) "
            "- exact.exact_intersection) "
            "/ greatest(exact.exact_intersection, 1), 4) "
            "AS rel_error FROM est, ea, eb, exact"),
        # incremental variance view: replay the delete + insert, then
        # the naive-moment population stddev (same expression tree the
        # view derives from its stored moments)
        "mview_variance": (
            "WITH cur AS ("
            "SELECT o_orderstatus AS s, o_totalprice AS v FROM orders "
            "WHERE o_orderkey % 5 <> 0 "
            "UNION ALL "
            "SELECT o_orderstatus, (o_orderkey % 997) + 0.25 "
            "FROM orders WHERE o_orderkey % 7 = 0) "
            "SELECT s AS o_orderstatus, COUNT(*)::BIGINT AS n_rows, "
            "round(SUM(v) / COUNT(v), 4) AS avg_price, "
            "round(sqrt(greatest(0.0, (SUM(v * v) "
            "- SUM(v) * SUM(v) / COUNT(v)) / COUNT(v))), 4) "
            "AS stddev_price FROM cur GROUP BY s"),
        # per-group KMV replay: per-priority rank-windowed sketches,
        # same hashes → identical per-group estimates
        "kmv_overlap_group": (
            "WITH av AS (SELECT DISTINCT o_orderpriority AS g, "
            "CAST(('0x' || substr(md5(o_orderkey::VARCHAR), 1, 15))"
            "::UBIGINT AS BIGINT) AS h FROM orders "
            "WHERE o_totalprice >= 100000), "
            "bv AS (SELECT DISTINCT o_orderpriority AS g, "
            "CAST(('0x' || substr(md5(o_orderkey::VARCHAR), 1, 15))"
            "::UBIGINT AS BIGINT) AS h FROM orders "
            "WHERE o_orderstatus = 'F'), "
            "sa AS (SELECT g, h FROM (SELECT g, h, row_number() OVER ("
            "PARTITION BY g ORDER BY h) AS rk FROM av) WHERE rk <= 256), "
            "sb AS (SELECT g, h FROM (SELECT g, h, row_number() OVER ("
            "PARTITION BY g ORDER BY h) AS rk FROM bv) WHERE rk <= 256), "
            "j AS (SELECT g, h, "
            "CASE WHEN sa.h IS NOT NULL THEN 1 ELSE 0 END AS in_a, "
            "CASE WHEN sb.h IS NOT NULL THEN 1 ELSE 0 END AS in_b "
            "FROM sa FULL OUTER JOIN sb USING (g, h)), "
            "merged AS (SELECT g, h, in_a, in_b FROM ("
            "SELECT *, row_number() OVER (PARTITION BY g ORDER BY h) "
            "AS rk FROM j) WHERE rk <= 256), "
            "ea AS (SELECT g, round(CASE WHEN COUNT(*) < 256 THEN "
            "COUNT(*)::DOUBLE ELSE 255.0 * 1152921504606846976.0 "
            "/ MAX(h) END, 4) AS est_a FROM sa GROUP BY g), "
            "eb AS (SELECT g, round(CASE WHEN COUNT(*) < 256 THEN "
            "COUNT(*)::DOUBLE ELSE 255.0 * 1152921504606846976.0 "
            "/ MAX(h) END, 4) AS est_b FROM sb GROUP BY g), "
            "u AS (SELECT g, COUNT(*) AS n, MAX(h) AS hmax, "
            "SUM(in_a * in_b) AS n_both FROM merged GROUP BY g), "
            "est AS (SELECT g, n, "
            "CASE WHEN n < 256 THEN n::DOUBLE ELSE "
            "255.0 * 1152921504606846976.0 / hmax END AS eu, "
            "CASE WHEN n > 0 THEN n_both / n ELSE 0.0 END AS jacc "
            "FROM u), "
            "exact AS (SELECT g, COUNT(*) AS x FROM ("
            "SELECT DISTINCT o_orderpriority AS g, o_orderkey AS key "
            "FROM orders WHERE o_totalprice >= 100000 INTERSECT "
            "SELECT DISTINCT o_orderpriority AS g, o_orderkey AS key "
            "FROM orders WHERE o_orderstatus = 'F') z GROUP BY g) "
            "SELECT est.g AS priority, 256 AS k, "
            "est.n::BIGINT AS n_union_sketch, "
            "COALESCE(ea.est_a, 0.0) AS est_a, "
            "COALESCE(eb.est_b, 0.0) AS est_b, "
            "round(est.eu, 4) AS est_union, "
            "round(est.jacc, 6) AS jaccard, "
            "round(est.jacc * est.eu, 4) AS est_intersection, "
            "COALESCE(exact.x, 0)::BIGINT AS exact_intersection, "
            "round(abs(round(est.jacc * est.eu, 4) - COALESCE(exact.x, "
            "0)) / greatest(COALESCE(exact.x, 0), 1), 4) AS rel_error "
            "FROM est LEFT JOIN ea USING (g) LEFT JOIN eb USING (g) "
            "LEFT JOIN exact USING (g)"),
        "embedding_similar_pairs": pairs_sql,
        "semantic_contamination": contam_sql,
        "pipeline_corpus_full": pipeline_full_sql,
        "semantic_dedup": sem_sql,
        "stratified_sample": (
            "SELECT doc_id, lang FROM documents "
            "WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::UBIGINT "
            "% 1000 < CASE lang WHEN 'en' THEN 300 WHEN 'de' THEN 1000 "
            "WHEN 'zh' THEN 1000 WHEN 'fr' THEN 1000 WHEN 'es' THEN 1000 "
            "ELSE -1 END"),
        "quantiles_approx": (
            "SELECT DISTINCT l_returnflag, TRUE AS median_rank_ok, "
            "TRUE AS p90_rank_ok FROM lineitem"),
        "txn_snapshot_isolation": (
            "SELECT n_nationkey, "
            "CASE WHEN n_regionkey = 2 THEN n_name || '~t1' "
            "ELSE n_name END AS n_name, n_regionkey "
            "FROM nation WHERE n_nationkey < 20"),
        "orc_source": "SELECT * FROM supplier",
        "txn_2pl_serial": (
            "SELECT n_nationkey, "
            "CASE WHEN n_regionkey = 0 THEN n_name || '~a~b' "
            "ELSE n_name END AS n_name, n_regionkey FROM nation"),
        "pack_sequences": (
            "WITH c AS (SELECT doc_id, "
            "len(regexp_split_to_array(text, '\\s+')) AS n_tokens, "
            "CAST(('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::UBIGINT "
            "% 16 AS BIGINT) AS shard FROM documents), "
            "o AS (SELECT doc_id, n_tokens, shard, "
            "COALESCE(SUM(n_tokens) OVER (PARTITION BY shard "
            "ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND "
            "1 PRECEDING), 0) AS start_offset FROM c) "
            "SELECT doc_id, n_tokens, shard, "
            "CAST(start_offset // 256 AS BIGINT) AS pack_id, "
            "CAST(start_offset AS BIGINT) AS start_offset FROM o"),
        "doc_repetition": (
            "WITH t AS (SELECT doc_id, "
            "regexp_split_to_array(text, '\\s+') AS toks FROM documents), "
            "s AS (SELECT doc_id, toks, len(toks) AS n, "
            "CASE WHEN len(toks) <= 3 THEN [array_to_string(toks, ' ')] "
            "ELSE list_transform(range(1, len(toks) - 1), "
            "i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) END "
            "AS sh FROM t) "
            "SELECT doc_id, CAST(n AS INT) AS n_tokens, "
            "round(CASE WHEN n > 0 THEN 1.0 - "
            "len(list_distinct(toks))::DOUBLE / n ELSE 0.0 END, 6) "
            "AS rep_token_frac, "
            "round(CASE WHEN len(sh) > 0 THEN 1.0 - "
            "len(list_distinct(sh))::DOUBLE / len(sh) ELSE 0.0 END, 6) "
            "AS rep_3gram_frac FROM s"),
        "chunk_documents": (
            "WITH t AS (SELECT doc_id, "
            "regexp_split_to_array(text, '\\s+') AS toks FROM documents), "
            "n AS (SELECT doc_id, toks, 1 + CAST(ceil(greatest("
            "len(toks) - 32, 0) / 24.0) AS INT) AS n_chunks FROM t), "
            "e AS (SELECT doc_id, toks, n_chunks, "
            "unnest(range(0, n_chunks)) AS chunk_idx FROM n) "
            "SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx, n_chunks, "
            "array_to_string(toks[chunk_idx * 24 + 1 : "
            "chunk_idx * 24 + 32], ' ') AS chunk_text FROM e"),
        # --- round-6 batch 2: sketches / profiling / clustering / LM ---
        # HLL rebuilt register-for-register from the portable hash:
        # register = h mod 256, rho = leading zeros of the 52-bit
        # suffix + 1 (bin() drops leading zeros in both engines, so
        # rho = 53 - length(bin)); harmonic estimator with the
        # original paper's linear-counting small-range branch.  The
        # alpha*m*m literal is spelled with the same op order the
        # engine's Python computes it in.
        "hll_distinct": (
            "WITH h AS (SELECT ('0x' || substr(md5("
            "CAST(o_custkey AS VARCHAR)), 1, 15))::UBIGINT AS hv "
            "FROM orders), "
            "r AS (SELECT CAST(hv % 256 AS INT) AS register, "
            "CASE WHEN hv // 256 = 0 THEN 53 "
            "ELSE 53 - length(bin(hv // 256)) END AS rho FROM h), "
            "regs AS (SELECT register, MAX(rho) AS rho FROM r "
            "GROUP BY register), "
            "agg AS (SELECT COUNT(*) AS filled, "
            "SUM(pow(2.0, -rho)) AS ps FROM regs), "
            "est AS (SELECT filled, round(CASE WHEN "
            "(0.7213 / (1.0 + 1.079 / 256)) * 256 * 256 "
            "/ (ps + (256 - filled)) <= 640.0 AND (256 - filled) > 0 "
            "THEN 256.0 * ln(256.0 / (256 - filled)) "
            "ELSE (0.7213 / (1.0 + 1.079 / 256)) * 256 * 256 "
            "/ (ps + (256 - filled)) END, 4) AS estimate FROM agg), "
            "x AS (SELECT COUNT(DISTINCT o_custkey) AS exact_distinct "
            "FROM orders) "
            "SELECT 256 AS m, filled::BIGINT AS filled_registers, "
            "estimate, exact_distinct::BIGINT AS exact_distinct, "
            "round(abs(estimate - exact_distinct) / exact_distinct, 4) "
            "AS rel_error FROM est, x"),
        # per-group registers: the hll_distinct oracle with GROUP BY
        # event_type threaded through every stage
        "hll_by_group": (
            "WITH h AS (SELECT event_type AS g, ('0x' || substr(md5("
            "CAST(user_id AS VARCHAR)), 1, 15))::UBIGINT AS hv "
            "FROM events), "
            "r AS (SELECT g, CAST(hv % 256 AS INT) AS register, "
            "CASE WHEN hv // 256 = 0 THEN 53 "
            "ELSE 53 - length(bin(hv // 256)) END AS rho FROM h), "
            "regs AS (SELECT g, register, MAX(rho) AS rho FROM r "
            "GROUP BY g, register), "
            "agg AS (SELECT g, COUNT(*) AS filled, "
            "SUM(pow(2.0, -rho)) AS ps FROM regs GROUP BY g), "
            "est AS (SELECT g, filled, round(CASE WHEN "
            "(0.7213 / (1.0 + 1.079 / 256)) * 256 * 256 "
            "/ (ps + (256 - filled)) <= 640.0 AND (256 - filled) > 0 "
            "THEN 256.0 * ln(256.0 / (256 - filled)) "
            "ELSE (0.7213 / (1.0 + 1.079 / 256)) * 256 * 256 "
            "/ (ps + (256 - filled)) END, 4) AS estimate FROM agg), "
            "x AS (SELECT event_type AS g, COUNT(DISTINCT user_id) "
            "AS exact_distinct FROM events GROUP BY event_type) "
            "SELECT est.g AS event_type, 256 AS m, "
            "filled::BIGINT AS filled_registers, estimate, "
            "exact_distinct::BIGINT AS exact_distinct, "
            "round(abs(estimate - exact_distinct) / exact_distinct, 4) "
            "AS rel_error FROM est JOIN x ON est.g = x.g "
            "ORDER BY event_type"),
        # CMS grid rebuilt cell-for-cell: row-salted portable hash mod
        # w; estimates = min over the 3 rows' counters.
        "cms_heavy_hitters": (
            "WITH tok AS (SELECT unnest(regexp_split_to_array(text, "
            "'\\s+')) AS token FROM documents), "
            "t2 AS (SELECT token FROM tok WHERE token <> ''), "
            "ri AS (SELECT rr.r, token, CAST(('0x' || substr(md5("
            "CAST(rr.r AS VARCHAR) || ':' || token), 1, 15))::UBIGINT "
            "% 2048 AS INT) AS idx FROM t2 "
            "CROSS JOIN (SELECT unnest([0, 1, 2]) AS r) rr), "
            "cnt AS (SELECT r, idx, COUNT(*) AS c FROM ri "
            "GROUP BY r, idx), "
            "topk AS (SELECT token, COUNT(*) AS exact_count FROM t2 "
            "GROUP BY token ORDER BY exact_count DESC, token LIMIT 20), "
            "probe AS (SELECT e.token, rr.r, CAST(('0x' || substr(md5("
            "CAST(rr.r AS VARCHAR) || ':' || e.token), 1, 15))::UBIGINT "
            "% 2048 AS INT) AS idx FROM topk e "
            "CROSS JOIN (SELECT unnest([0, 1, 2]) AS r) rr), "
            "est AS (SELECT p.token, MIN(c.c) AS cms_estimate "
            "FROM probe p JOIN cnt c ON c.r = p.r AND c.idx = p.idx "
            "GROUP BY p.token) "
            "SELECT e.token, e.exact_count::BIGINT AS exact_count, "
            "est.cms_estimate::BIGINT AS cms_estimate "
            "FROM topk e JOIN est USING (token) "
            "ORDER BY exact_count DESC, token"),
        # The Bloom pass is exact-by-construction (no false negatives;
        # false positives removed by the final semi-join), so the
        # oracle is the plain EXISTS — an engine bug that *drops*
        # candidates breaks the comparison.
        "bloom_semi_join": (
            "SELECT c_custkey, c_name, c_nationkey FROM customer c "
            "WHERE EXISTS (SELECT 1 FROM orders o "
            "WHERE o.o_custkey = c.c_custkey "
            "AND o.o_totalprice > 495000)"),
        "fuzzy_dedup_edit": (
            "WITH corpus AS (SELECT name, MIN(id) AS id FROM ("
            "SELECT p_partkey AS id, p_name AS name FROM part "
            "UNION ALL "
            "SELECT p_partkey + 1000000, "
            "substr(p_name, 1, 2) || 'x' || substr(p_name, 4) "
            "FROM part WHERE p_partkey % 50 = 0) GROUP BY name), "
            "blk AS (SELECT id, name, length(name) // 3 AS lb, "
            "substr(name, 1, 2) AS pb FROM corpus) "
            "SELECT x.id AS a, y.id AS b, "
            "levenshtein(x.name, y.name) AS dist "
            "FROM blk x JOIN blk y ON x.lb = y.lb AND x.pb = y.pb "
            "AND x.id < y.id "
            "WHERE levenshtein(x.name, y.name) <= 2"),
        "kmeans_clusters": _kmeans_sql(8, 64),
        "doc_logprob": (
            "WITH tok AS (SELECT doc_id, unnest(regexp_split_to_array("
            "text, '\\s+')) AS token FROM documents), "
            "t2 AS (SELECT doc_id, token FROM tok WHERE token <> ''), "
            "vc AS (SELECT token, COUNT(*) AS tc FROM t2 "
            "GROUP BY token), "
            "n AS (SELECT COUNT(*) AS nn FROM t2), "
            "d AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens, "
            "round(avg(ln(tc / nn)), 6) AS avg_logprob "
            "FROM t2 JOIN vc USING (token), n GROUP BY doc_id) "
            "SELECT doc_id, n_tokens, avg_logprob, "
            "round(exp(-avg_logprob), 4) AS pseudo_perplexity FROM d"),
        "bigram_lm": (
            "WITH t AS (SELECT regexp_split_to_array(text, '\\s+') "
            "AS toks FROM documents), "
            "bg AS (SELECT unnest(list_transform(range(1, len(toks)), "
            "i -> toks[i] || ' ' || toks[i + 1])) AS bigram FROM t "
            "WHERE len(toks) >= 2), "
            "b2 AS (SELECT bigram FROM bg "
            "WHERE NOT regexp_matches(bigram, '^ | $')), "
            "pc AS (SELECT bigram, COUNT(*) AS pair_count FROM b2 "
            "GROUP BY bigram), "
            "fc AS (SELECT split_part(bigram, ' ', 1) AS ft, "
            "SUM(pair_count) AS first_count FROM pc GROUP BY ft) "
            "SELECT bigram, pair_count::BIGINT AS pair_count, "
            "first_count::BIGINT AS first_count, "
            "round(pair_count / first_count, 6) AS cond_prob "
            "FROM pc JOIN fc ON split_part(bigram, ' ', 1) = fc.ft "
            "WHERE pair_count >= 2 "
            "ORDER BY pair_count DESC, bigram LIMIT 50"),
        "key_skew": (
            "WITH pk AS (SELECT o_custkey, COUNT(*) AS cnt FROM orders "
            "GROUP BY o_custkey), "
            "s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_keys, "
            "CAST(SUM(cnt) AS BIGINT) AS n_rows, "
            "CAST(MAX(cnt) AS BIGINT) AS max_count, "
            "SUM(cnt)::DOUBLE / COUNT(*) AS avgc FROM pk), "
            "h AS (SELECT CAST(COUNT(*) AS BIGINT) AS hot_keys "
            "FROM pk, s WHERE cnt > 2.0 * avgc) "
            "SELECT n_keys, n_rows, max_count, "
            "round(avgc, 6) AS avg_count, "
            "round(max_count / avgc, 4) AS skew_ratio, hot_keys "
            "FROM s, h"),
        "zscore_outliers": (
            "WITH s AS (SELECT event_type, avg(value) AS mu, "
            "stddev_pop(value) AS sd FROM events GROUP BY event_type) "
            "SELECT event_id, e.event_type, value, "
            "round((value - mu) / sd, 4) AS zscore "
            "FROM events e JOIN s USING (event_type) "
            "WHERE sd > 0 AND abs(value - mu) > 3.0 * sd "
            "ORDER BY event_id"),
        # robust variant: median/MAD via quantile_cont (interpolates
        # exactly like Spark's percentile), Iglewicz-Hoaglin 1.4826
        "mad_outliers": (
            "WITH m AS (SELECT event_type, "
            "quantile_cont(value, 0.5) AS med FROM events "
            "GROUP BY event_type), "
            "d AS (SELECT e.event_id, e.event_type, e.value, m.med, "
            "abs(e.value - m.med) AS ad FROM events e "
            "JOIN m USING (event_type)), "
            "md AS (SELECT event_type, quantile_cont(ad, 0.5) AS mad "
            "FROM d GROUP BY event_type) "
            "SELECT d.event_id, d.event_type, d.value, "
            "round((d.value - d.med) / (1.4826 * md.mad), 4) "
            "AS robust_z FROM d JOIN md USING (event_type) "
            "WHERE md.mad > 0 AND d.ad > 3.5 * 1.4826 * md.mad "
            "ORDER BY d.event_id"),
        "weighted_sample": (
            "SELECT o_orderkey, o_totalprice FROM orders "
            "WHERE ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), "
            "1, 15))::UBIGINT::DOUBLE / 1152921504606846976.0 "
            "< 0.2 * o_totalprice / "
            "(SELECT MAX(o_totalprice) FROM orders)"),
        # shared equal-width bins over the union's [min,max] (the
        # table_histogram contract); PSI terms from eps-floored
        # unrounded proportions, exactly profiling.psi_drift
        "psi_drift": (
            "WITH av AS (SELECT CAST(o_totalprice AS DOUBLE) AS v "
            "FROM orders WHERE o_orderdate < '1998-05-01' "
            "AND o_totalprice IS NOT NULL), "
            "bv AS (SELECT CAST(o_totalprice AS DOUBLE) AS v "
            "FROM orders WHERE o_orderdate >= '1998-05-01' "
            "AND o_totalprice IS NOT NULL), "
            "mm AS (SELECT MIN(v) AS lo, MAX(v) AS hi FROM "
            "(SELECT v FROM av UNION ALL SELECT v FROM bv)), "
            "abin AS (SELECT CASE WHEN hi = lo THEN 1 ELSE "
            "least(CAST(floor((v - lo) / "
            "((hi - lo) / 10)) AS INT) + 1, 10) END AS bin, "
            "COUNT(*) AS na FROM av, mm GROUP BY bin), "
            "bbin AS (SELECT CASE WHEN hi = lo THEN 1 ELSE "
            "least(CAST(floor((v - lo) / "
            "((hi - lo) / 10)) AS INT) + 1, 10) END AS bin, "
            "COUNT(*) AS nb FROM bv, mm GROUP BY bin), "
            "ta AS (SELECT greatest(COALESCE(SUM(na), 0), 1) AS c "
            "FROM abin), "
            "tb AS (SELECT greatest(COALESCE(SUM(nb), 0), 1) AS c "
            "FROM bbin) "
            "SELECT bin, "
            "round(greatest(COALESCE(na, 0) / ta.c, 0.000001), 6) "
            "AS pct_a, "
            "round(greatest(COALESCE(nb, 0) / tb.c, 0.000001), 6) "
            "AS pct_b, "
            "round((greatest(COALESCE(na, 0) / ta.c, 0.000001) "
            "- greatest(COALESCE(nb, 0) / tb.c, 0.000001)) "
            "* ln(greatest(COALESCE(na, 0) / ta.c, 0.000001) "
            "/ greatest(COALESCE(nb, 0) / tb.c, 0.000001)), 6) "
            "AS psi_term "
            "FROM abin FULL OUTER JOIN bbin USING (bin), ta, tb "
            "ORDER BY bin"),
        "correlation_matrix": (
            "SELECT col_a, col_b, \"corr\" FROM ("
            "SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b, "
            "round(corr(l_quantity, l_extendedprice), 6) AS \"corr\" "
            "FROM lineitem UNION ALL "
            "SELECT 'l_quantity', 'l_discount', "
            "round(corr(l_quantity, l_discount), 6) FROM lineitem "
            "UNION ALL SELECT 'l_quantity', 'l_tax', "
            "round(corr(l_quantity, l_tax), 6) FROM lineitem "
            "UNION ALL SELECT 'l_extendedprice', 'l_discount', "
            "round(corr(l_extendedprice, l_discount), 6) FROM lineitem "
            "UNION ALL SELECT 'l_extendedprice', 'l_tax', "
            "round(corr(l_extendedprice, l_tax), 6) FROM lineitem "
            "UNION ALL SELECT 'l_discount', 'l_tax', "
            "round(corr(l_discount, l_tax), 6) FROM lineitem) "
            "ORDER BY col_a, col_b"),
        "dedup_eval": dedup_eval_sql,
        # keep-one materialization over the unrolled min-label
        # clustering: survivors = corpus minus non-representative
        # cluster members
        "dedup_apply": (
            f"WITH losers AS (SELECT doc_id FROM ({clusters_sql}) "
            f"WHERE doc_id <> cluster_id), "
            f"corpus2 AS (SELECT doc_id, text FROM documents "
            f"UNION ALL SELECT doc_id + 1000000, text || ' appendix' "
            f"FROM documents WHERE doc_id % 10 = 0) "
            f"SELECT doc_id, CAST(len(regexp_split_to_array(text, "
            f"'\\s+')) AS INT) AS n_tokens FROM corpus2 "
            f"WHERE doc_id NOT IN (SELECT doc_id FROM losers) "
            f"ORDER BY doc_id"),
        "similar_docs": (
            "WITH t AS (SELECT doc_id, regexp_split_to_array(text, "
            "'\\s+') AS toks FROM documents), "
            "shd AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) "
            "<= 3 THEN [array_to_string(toks, ' ')] "
            "ELSE list_transform(range(1, len(toks) - 1), "
            "i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) END"
            ") AS s FROM t), "
            "q AS (SELECT s AS qs, len(s) AS qn FROM shd "
            "WHERE doc_id = 7) "
            "SELECT doc_id, round(CAST(len(list_intersect(s, qs)) "
            "AS DOUBLE) / (qn + len(s) - len(list_intersect(s, qs))), "
            "6) AS jaccard FROM shd, q "
            "WHERE doc_id <> 7 AND len(list_intersect(s, qs)) > 0 "
            "ORDER BY jaccard DESC, doc_id LIMIT 10"),
        # the union pipeline's pairs restricted to corpus(a)×batch(b) —
        # the incremental path must find exactly this subset
        "dedup_incremental": (
            f"SELECT * FROM ({minhash_sql}) "
            f"WHERE a < 1000000 AND b >= 1000000"),
        # positional postings: subscripts assigned BEFORE the
        # empty-token filter (posexplode numbers all elements), 1-based
        # -> 0-based
        "phrase_search": (
            "WITH post AS (SELECT doc_id, token, pos - 1 AS pos FROM ("
            "SELECT doc_id, unnest(toks) AS token, "
            "generate_subscripts(toks, 1) AS pos FROM ("
            "SELECT doc_id, regexp_split_to_array(text, '\\s+') AS toks "
            "FROM documents)) WHERE token <> '') "
            "SELECT p0.doc_id, CAST(COUNT(*) AS BIGINT) AS n_matches "
            "FROM post p0 "
            "JOIN post p1 ON p1.doc_id = p0.doc_id "
            "AND p1.token = 'hash' AND p1.pos = p0.pos + 1 "
            "JOIN post p2 ON p2.doc_id = p0.doc_id "
            "AND p2.token = 'batch' AND p2.pos = p0.pos + 2 "
            "WHERE p0.token = 'slow' "
            "GROUP BY p0.doc_id ORDER BY p0.doc_id"),
        # constants spelled as the engine's Python computes them
        # ((1.2 + 1), 1.2 * (0.25 + ...)) so both sides evaluate the
        # same double ops in the same order
        # identical final content through the Hadoop metadata backend
        "hadoop_lifecycle": (
            "WITH ins AS ("
            "  SELECT n_nationkey, n_name, n_regionkey FROM nation"
            "  UNION ALL SELECT 100, 'ATLANTIS', 0"
            "  UNION ALL SELECT 101, 'ELDORADO', 1)"
            "SELECT n_nationkey, n_name, n_regionkey FROM ins "
            "WHERE n_nationkey NOT BETWEEN 10 AND 14"),
        # BM25 over the doubly-surviving corpus from scratch — the
        # rewrite tier (doc_id % 7 = 0) AND the tombstone tier
        # (doc_id % 70 = 1, soft-deleted then optimize-materialized)
        # must both rank identically to a clean rebuild
        "bm25_remove": (
            "WITH sdocs AS (SELECT doc_id, text FROM documents "
            "WHERE doc_id % 7 <> 0 AND doc_id % 70 <> 1), "
            "post AS (SELECT doc_id, token FROM ("
            "SELECT doc_id, unnest(regexp_split_to_array(text, '\\s+')) "
            "AS token FROM sdocs) WHERE token <> ''), "
            "dl AS (SELECT doc_id, COUNT(*) AS dl FROM post "
            "GROUP BY doc_id), "
            "c AS (SELECT COUNT(*) AS n, avg(dl) AS avgdl FROM dl), "
            "tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM post "
            "WHERE token IN ('batch', 'hash', 'window') "
            "GROUP BY doc_id, token), "
            "dfq AS (SELECT token, COUNT(*) AS df FROM tf "
            "GROUP BY token), "
            "s AS (SELECT tf.doc_id, "
            "ln(1.0 + (n - df + 0.5) / (df + 0.5)) "
            "* (tf * (1.2 + 1)) "
            "/ (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)) AS s "
            "FROM tf JOIN dfq USING (token) JOIN dl USING (doc_id), c) "
            "SELECT doc_id, round(SUM(s), 6) AS bm25 FROM s "
            "GROUP BY doc_id ORDER BY bm25 DESC, doc_id LIMIT 10"),
        "bm25_search": (
            "WITH post AS (SELECT doc_id, token FROM ("
            "SELECT doc_id, unnest(regexp_split_to_array(text, '\\s+')) "
            "AS token FROM documents) WHERE token <> ''), "
            "dl AS (SELECT doc_id, COUNT(*) AS dl FROM post "
            "GROUP BY doc_id), "
            "c AS (SELECT COUNT(*) AS n, avg(dl) AS avgdl FROM dl), "
            "tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM post "
            "WHERE token IN ('batch', 'hash', 'window') "
            "GROUP BY doc_id, token), "
            "dfq AS (SELECT token, COUNT(*) AS df FROM tf "
            "GROUP BY token), "
            "s AS (SELECT tf.doc_id, "
            "ln(1.0 + (n - df + 0.5) / (df + 0.5)) "
            "* (tf * (1.2 + 1)) "
            "/ (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)) AS s "
            "FROM tf JOIN dfq USING (token) JOIN dl USING (doc_id), c) "
            "SELECT doc_id, round(SUM(s), 6) AS bm25 FROM s "
            "GROUP BY doc_id ORDER BY bm25 DESC, doc_id LIMIT 10"),
        # per-hour CMS grid rebuilt cell-for-cell; probes min over each
        # watched user's 3 cells with missing cells as exact zeros
        "streaming_cms": (
            "WITH e AS (SELECT date_trunc('hour', ts) AS w, "
            "CAST(user_id AS VARCHAR) AS k FROM events), "
            "grid AS (SELECT w, rr.r, CAST(('0x' || substr(md5("
            "CAST(rr.r AS VARCHAR) || ':' || k), 1, 15))::UBIGINT "
            "% 2048 AS INT) AS idx, COUNT(*) AS cnt FROM e "
            "CROSS JOIN (SELECT unnest([0, 1, 2]) AS r) rr "
            "GROUP BY w, rr.r, idx), "
            "wins AS (SELECT DISTINCT w FROM grid), "
            "probes AS (SELECT u.user_id, rr.r, CAST(('0x' || substr("
            "md5(CAST(rr.r AS VARCHAR) || ':' "
            "|| CAST(u.user_id AS VARCHAR)), 1, 15))::UBIGINT "
            "% 2048 AS INT) AS idx, wins.w "
            "FROM (SELECT unnest(range(0, 10)) AS user_id) u "
            "CROSS JOIN (SELECT unnest([0, 1, 2]) AS r) rr "
            "CROSS JOIN wins) "
            "SELECT strftime(p.w, '%Y-%m-%d %H:%M:%S') AS window_start, "
            "p.user_id, CAST(MIN(COALESCE(g.cnt, 0)) AS BIGINT) "
            "AS cms_estimate "
            "FROM probes p LEFT JOIN grid g "
            "ON g.w = p.w AND g.r = p.r AND g.idx = p.idx "
            "GROUP BY p.w, p.user_id"),
        # per-hour HLL rebuilt register-for-register, then the same
        # harmonic/linear-counting estimator per window — the batch
        # replay of the streaming mergeable-sketch aggregation
        "streaming_hll": (
            "WITH h AS (SELECT date_trunc('hour', ts) AS w, "
            "('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))"
            "::UBIGINT AS hv FROM events), "
            "r AS (SELECT w, CAST(hv % 256 AS INT) AS register, "
            "CASE WHEN hv // 256 = 0 THEN 53 "
            "ELSE 53 - length(bin(hv // 256)) END AS rho FROM h), "
            "regs AS (SELECT w, register, MAX(rho) AS rho FROM r "
            "GROUP BY w, register), "
            "agg AS (SELECT w, COUNT(*) AS filled, "
            "SUM(pow(2.0, -rho)) AS ps FROM regs GROUP BY w) "
            "SELECT strftime(w, '%Y-%m-%d %H:%M:%S') AS window_start, "
            "256 AS m, filled::BIGINT AS filled_registers, "
            "round(CASE WHEN "
            "(0.7213 / (1.0 + 1.079 / 256)) * 256 * 256 "
            "/ (ps + (256 - filled)) <= 640.0 AND (256 - filled) > 0 "
            "THEN 256.0 * ln(256.0 / (256 - filled)) "
            "ELSE (0.7213 / (1.0 + 1.079 / 256)) * 256 * 256 "
            "/ (ps + (256 - filled)) END, 4) AS estimate FROM agg"),
        # exact-substring dedup pair: same tokenization contract as
        # doc_repetition (regexp_split_to_array == Spark split on \s+);
        # 8-gram at position i spans toks[i:i+7] (DuckDB list slices
        # are 1-based inclusive), count = len - 7 → range(1, len - 6)
        "dup_spans": (
            "WITH t AS (SELECT doc_id, "
            "regexp_split_to_array(text, '\\s+') AS toks FROM documents), "
            "sh AS (SELECT doc_id, CASE WHEN len(toks) <= 8 "
            "THEN [array_to_string(toks, ' ')] "
            "ELSE list_transform(range(1, len(toks) - 6), "
            "i -> array_to_string(toks[i:i+7], ' ')) END AS grams "
            "FROM t), "
            "ex AS (SELECT doc_id, unnest(grams) AS gram FROM sh) "
            "SELECT gram, CAST(COUNT(DISTINCT doc_id) AS BIGINT) "
            "AS n_docs, CAST(COUNT(*) AS BIGINT) AS n_occurrences "
            "FROM ex GROUP BY gram "
            "HAVING COUNT(DISTINCT doc_id) >= 2 "
            "ORDER BY n_docs DESC, n_occurrences DESC, gram LIMIT 40"),
        "dup_span_coverage": (
            "WITH t AS (SELECT doc_id, "
            "regexp_split_to_array(text, '\\s+') AS toks FROM documents), "
            "sh AS (SELECT doc_id, CASE WHEN len(toks) <= 8 "
            "THEN [array_to_string(toks, ' ')] "
            "ELSE list_transform(range(1, len(toks) - 6), "
            "i -> array_to_string(toks[i:i+7], ' ')) END AS grams "
            "FROM t), "
            "ex AS (SELECT doc_id, unnest(grams) AS gram FROM sh), "
            "dup AS (SELECT gram FROM ex GROUP BY gram "
            "HAVING COUNT(DISTINCT doc_id) >= 2), "
            "tot AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) "
            "AS n_spans FROM ex GROUP BY doc_id), "
            "d AS (SELECT e.doc_id, CAST(COUNT(*) AS BIGINT) "
            "AS n_dup_spans FROM ex e JOIN dup USING (gram) "
            "GROUP BY e.doc_id) "
            "SELECT tot.doc_id, tot.n_spans, d.n_dup_spans, "
            "round(d.n_dup_spans::DOUBLE / tot.n_spans, 6) "
            "AS dup_ratio FROM tot JOIN d USING (doc_id) "
            "ORDER BY doc_id"),
        # two-sample KS: per-value counts -> full-outer merge ->
        # running-sum ECDFs -> scalar max gap (mirrors
        # profiling.ks_drift step for step)
        "ks_drift": (
            "WITH av AS (SELECT CAST(n_chars AS DOUBLE) AS v "
            "FROM documents WHERE length(source) = 4 "
            "AND n_chars IS NOT NULL), "
            "bv AS (SELECT CAST(n_chars AS DOUBLE) AS v "
            "FROM documents WHERE length(source) = 5 "
            "AND n_chars IS NOT NULL), "
            "ca AS (SELECT v, COUNT(*) AS n_a FROM av GROUP BY v), "
            "cb AS (SELECT v, COUNT(*) AS n_b FROM bv GROUP BY v), "
            "m AS (SELECT COALESCE(ca.v, cb.v) AS v, "
            "COALESCE(n_a, 0) AS n_a, COALESCE(n_b, 0) AS n_b "
            "FROM ca FULL OUTER JOIN cb ON ca.v = cb.v), "
            "c AS (SELECT n_a, n_b, "
            "SUM(n_a) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED "
            "PRECEDING AND CURRENT ROW) AS cum_a, "
            "SUM(n_b) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED "
            "PRECEDING AND CURRENT ROW) AS cum_b FROM m), "
            "t AS (SELECT COALESCE(SUM(n_a), 0) AS ta, "
            "COALESCE(SUM(n_b), 0) AS tb FROM c) "
            "SELECT CAST(ta AS BIGINT) AS n_a, "
            "CAST(tb AS BIGINT) AS n_b, "
            "round(COALESCE(MAX(abs("
            "CASE WHEN ta > 0 THEN cum_a / ta ELSE 0.0 END - "
            "CASE WHEN tb > 0 THEN cum_b / tb ELSE 0.0 END)), 0.0), 6) "
            "AS ks_stat FROM c, t GROUP BY ta, tb"),
    }
    # the materialized-index variants return IDENTICAL results to their
    # in-scan counterparts (the index only changes the scan layout), so
    # they share the oracles verbatim
    out["phrase_indexed"] = out["phrase_search"]
    out["bm25_indexed"] = out["bm25_search"]
    # incremental append's whole claim is ranking-identity with the
    # full corpus — same oracle as the scan and indexed paths
    out["bm25_incremental"] = out["bm25_search"]
    # hll_reconcile: merged batch+stream sketch == the single-pass
    # sketch (register-max merge is associative over a disjoint time
    # split), so the oracle replays the SINGLE-PASS sketch over all
    # events and asserts registers_match TRUE
    out["hll_reconcile"] = (
        "WITH h AS (SELECT ('0x' || substr(md5("
        "CAST(user_id AS VARCHAR)), 1, 15))::UBIGINT AS hv "
        "FROM events), "
        "r AS (SELECT CAST(hv % 256 AS INT) AS register, "
        "CASE WHEN hv // 256 = 0 THEN 53 "
        "ELSE 53 - length(bin(hv // 256)) END AS rho FROM h), "
        "regs AS (SELECT register, MAX(rho) AS rho FROM r "
        "GROUP BY register), "
        "agg AS (SELECT COUNT(*) AS filled, "
        "SUM(pow(2.0, -rho)) AS ps FROM regs), "
        "est AS (SELECT filled, round(CASE WHEN "
        "(0.7213 / (1.0 + 1.079 / 256)) * 256 * 256 "
        "/ (ps + (256 - filled)) <= 640.0 AND (256 - filled) > 0 "
        "THEN 256.0 * ln(256.0 / (256 - filled)) "
        "ELSE (0.7213 / (1.0 + 1.079 / 256)) * 256 * 256 "
        "/ (ps + (256 - filled)) END, 4) AS estimate FROM agg), "
        "x AS (SELECT COUNT(DISTINCT user_id) AS exact_distinct "
        "FROM events) "
        "SELECT 256 AS m, filled::BIGINT AS filled_registers, "
        "estimate, exact_distinct::BIGINT AS exact_distinct, "
        "round(abs(estimate - exact_distinct) / exact_distinct, 4) "
        "AS rel_error, TRUE AS registers_match FROM est, x")
    # cms_reconcile: merged batch+stream grid == the single-pass grid
    # (cell-wise sum over a disjoint time split), so the oracle replays
    # the SINGLE-PASS grid + probe and asserts grids_match TRUE
    out["cms_reconcile"] = (
        "WITH e AS (SELECT CAST(user_id AS VARCHAR) AS k FROM events), "
        "ri AS (SELECT rr.r, k, CAST(('0x' || substr(md5("
        "CAST(rr.r AS VARCHAR) || ':' || k), 1, 15))::UBIGINT "
        "% 2048 AS INT) AS idx FROM e "
        "CROSS JOIN (SELECT unnest([0, 1, 2]) AS r) rr), "
        "cnt AS (SELECT r, idx, COUNT(*) AS c FROM ri GROUP BY r, idx), "
        "probe AS (SELECT u.uid, rr.r, CAST(('0x' || substr(md5("
        "CAST(rr.r AS VARCHAR) || ':' || CAST(u.uid AS VARCHAR)), 1, 15)"
        ")::UBIGINT % 2048 AS INT) AS idx "
        "FROM (SELECT unnest(range(0, 10)) AS uid) u "
        "CROSS JOIN (SELECT unnest([0, 1, 2]) AS r) rr), "
        "est AS (SELECT p.uid, MIN(COALESCE(c.c, 0)) AS cms_estimate "
        "FROM probe p LEFT JOIN cnt c ON c.r = p.r AND c.idx = p.idx "
        "GROUP BY p.uid), "
        "x AS (SELECT user_id, COUNT(*) AS exact_count FROM events "
        "WHERE user_id < 10 GROUP BY user_id) "
        "SELECT est.uid::BIGINT AS user_id, "
        "est.cms_estimate::BIGINT AS cms_estimate, "
        "COALESCE(x.exact_count, 0)::BIGINT AS exact_count, "
        "TRUE AS grids_match "
        "FROM est LEFT JOIN x ON x.user_id = est.uid ORDER BY user_id")
    # mixture_sample: replay counts -> cap -> rates -> md5 coin flips.
    # Weights are ::DOUBLE (DuckDB parses bare 0.5 as DECIMAL, whose
    # division semantics differ); the contract weights sum to exactly
    # 1.0 in binary so normalization is a bit-exact no-op both sides.
    out["mixture_sample"] = (
        "WITH w AS (SELECT * FROM (VALUES "
        "('src0', 0.5::DOUBLE), ('src1', 0.25::DOUBLE), "
        "('src2', 0.25::DOUBLE)) AS t(src, wt)), "
        "n AS (SELECT source, CAST(COUNT(*) AS DOUBLE) AS n "
        "FROM documents WHERE source IN ('src0', 'src1', 'src2') "
        "GROUP BY source), "
        "cap AS (SELECT MIN(n.n / w.wt) AS c FROM n "
        "JOIN w ON n.source = w.src), "
        "r AS (SELECT w.src, LEAST(1.0::DOUBLE, w.wt * cap.c / n.n) "
        "AS rate FROM w JOIN n ON n.source = w.src CROSS JOIN cap) "
        "SELECT d.doc_id, d.source FROM documents d "
        "JOIN r ON d.source = r.src "
        "WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))"
        "::UBIGINT::DOUBLE / 1152921504606846976.0 < r.rate "
        "ORDER BY doc_id")
    # sample_k_per_group: both phases replayed — the (20k+100)/n hash
    # pre-prune, then row_number over (u, doc_id) within each lang
    out["sample_k_per_group"] = (
        "WITH c AS (SELECT lang AS d, CAST(COUNT(*) AS DOUBLE) AS n "
        "FROM documents GROUP BY lang), "
        "r AS (SELECT d, least(1.0, 200.0 / n) AS rate FROM c), "
        "u AS (SELECT doc_id, lang, "
        "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))"
        "::UBIGINT::DOUBLE / 1152921504606846976.0 AS uu "
        "FROM documents), "
        "cand AS (SELECT doc_id, lang, uu FROM u "
        "JOIN r ON u.lang = r.d WHERE uu < r.rate), "
        "rk AS (SELECT doc_id, lang, row_number() OVER ("
        "PARTITION BY lang ORDER BY uu, doc_id) AS rk FROM cand) "
        "SELECT doc_id, lang, CAST(rk AS INT) AS rk FROM rk "
        "WHERE rk <= 5")
    # mixture_temperature: per-lang counts -> sqrt(c_min)/sqrt(c_d)
    # rates (IEEE-exact at alpha=0.5) -> md5 coin flips, mirroring
    # sampling.temperature_mixture expression for expression
    out["mixture_temperature"] = (
        "WITH c AS (SELECT lang AS d, CAST(COUNT(*) AS DOUBLE) AS n "
        "FROM documents GROUP BY lang), "
        "m AS (SELECT MIN(n) AS mn FROM c), "
        "r AS (SELECT d, sqrt(mn) / sqrt(n) AS rate "
        "FROM c CROSS JOIN m) "
        "SELECT doc_id, lang FROM documents "
        "JOIN r ON lang = r.d "
        "WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))"
        "::UBIGINT::DOUBLE / 1152921504606846976.0 < r.rate "
        "ORDER BY doc_id")
    # epoch_shuffle: shard = h60 % 8, pos = row_number within shard
    # ordered by (h60, doc_id) — the same total permutation
    out["epoch_shuffle"] = (
        "WITH h AS (SELECT doc_id, ('0x' || substr(md5("
        "'1::' || CAST(doc_id AS VARCHAR)), 1, 15))::UBIGINT AS hv "
        "FROM documents) "
        "SELECT doc_id, CAST(hv % 8 AS INT) AS shard, "
        "row_number() OVER (PARTITION BY hv % 8 "
        "ORDER BY hv, doc_id) AS pos "
        "FROM h ORDER BY shard, pos")
    return out
