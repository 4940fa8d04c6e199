"""File-granularity data skipping (partitioned.py `__files` stats +
`_file_prune`): a directory holding several files prunes per FILE in
read_skipping / read_skipping_any / read_point when directory bounds
straddle the probe but individual files' don't — Delta's per-file
stats step below our directory manifests."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from cs186_query_optimization_project_spark.partitioned import (
    PartitionedTable,
)


def _files_of(df) -> set[str]:
    return {f.removeprefix("file:") for f in df.inputFiles()}


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.fixture(scope="module")
def multi_file_pt(spark, tmp_path_factory):
    """3 status partitions × 4 range-disjoint files per leaf: the
    upstream repartitionByRange(4, k) means every leaf directory holds
    four files covering k-quartiles — directory bounds span [0, 599]
    everywhere, file bounds don't."""
    root = str(tmp_path_factory.mktemp("fskip") / "t")
    df = (spark.range(600)
          .selectExpr("id AS k", "CAST(id % 3 AS STRING) AS grp",
                      "id * 2 AS v")
          .repartitionByRange(4, F.col("k")))
    return PartitionedTable.create(spark, df, root, "grp")


def test_sidecar_records_per_file_stats(multi_file_pt):
    pt = multi_file_pt
    man = pt._manifest()
    for ds in man["parts"].values():
        for d in ds:
            stats = (pt._staging_stats(os.path.dirname(d))
                     .get(os.path.basename(d)))
            fmap = stats["__files"]
            assert len(fmap) == 4
            assert sum(fs["__num_rows"] for fs in fmap.values()) \
                == stats["__num_rows"]
            # file bounds nest inside directory bounds
            for fs in fmap.values():
                assert fs["k"][0] >= stats["k"][0]
                assert fs["k"][1] <= stats["k"][1]


def test_range_skipping_prunes_files_not_just_dirs(multi_file_pt):
    pt = multi_file_pt
    total = _files_of(pt.read())
    got = pt.read_skipping(ranges={"k": (200, 220)})
    scanned = _files_of(got)
    # every directory straddles [200, 220]'s quartile, so dirs alone
    # cannot prune — files must
    assert {os.path.dirname(f) for f in scanned} == \
        {os.path.dirname(f) for f in total}
    assert len(scanned) < len(total)
    assert _rows(got) == _rows(
        pt.read().filter(F.col("k").between(200, 220)))


def test_eq_skipping_narrows_to_one_file_per_dir(multi_file_pt):
    pt = multi_file_pt
    got = pt.read_skipping(eq={"k": 300})
    scanned = _files_of(got)
    assert len(scanned) == 1  # one value lives in one file of one dir
    assert _rows(got) == [(300, "0", 600)]


def test_read_point_prunes_files(multi_file_pt):
    pt = multi_file_pt
    got = pt.read_point("k", 450)
    assert len(_files_of(got)) == 1
    assert _rows(got) == [(450, "0", 900)]


def test_disjunctive_union_of_files(multi_file_pt):
    pt = multi_file_pt
    got = pt.read_skipping_any([
        {"ranges": {"k": (10, 20)}},
        {"ranges": {"k": (550, 560)}},
    ])
    scanned = _files_of(got)
    # first and last quartile files only, across the 3 dirs
    assert 2 <= len(scanned) <= 6
    assert len(scanned) < len(_files_of(pt.read()))
    assert _rows(got) == _rows(pt.read().filter(
        F.col("k").between(10, 20) | F.col("k").between(550, 560)))


def test_fully_disproved_conjunction_scans_nothing(multi_file_pt):
    pt = multi_file_pt
    got = pt.read_skipping(ranges={"k": (10000, 20000)})
    assert got.count() == 0
    assert _files_of(got) == set()


def test_legacy_sidecar_without_files_map_fails_open(
        spark, multi_file_pt):
    pt = PartitionedTable(spark, multi_file_pt.root)
    # prime the handle's stats cache with the __files maps stripped —
    # exactly what a pre-file-stats staging looks like
    for ds in pt._manifest()["parts"].values():
        for d in ds:
            staging = os.path.dirname(d)
            stats = {k: {kk: vv for kk, vv in v.items()
                         if kk != "__files"}
                     for k, v in pt._staging_stats(staging).items()}
            pt._stats_cache[staging] = stats
    got = pt.read_skipping(ranges={"k": (200, 220)})
    # no per-file map → whole admitted directories scan (fail open)
    assert _files_of(got) == _files_of(pt.read())
    assert _rows(got) == _rows(
        pt.read().filter(F.col("k").between(200, 220)))


def test_file_pruning_composes_with_tombstones(multi_file_pt, spark,
                                               tmp_path):
    # soft-delete on a shallow clone: the shared fixture stays pristine
    pt = multi_file_pt.clone(str(tmp_path / "c"))
    pt.delete_soft("k % 2 = 1")
    got = pt.read_skipping(ranges={"k": (200, 220)})
    assert len(_files_of(got)) < len(_files_of(pt.read(version=0)))
    assert _rows(got) == _rows(
        pt.read().filter(F.col("k").between(200, 220)))
    assert all(r[0] % 2 == 0 for r in got.collect())


def test_skipping_report_matches_actual_scan(multi_file_pt):
    pt = multi_file_pt
    args = {"ranges": {"k": (200, 220)}}
    rep = pt.skipping_report(**args)
    scanned_files = _files_of(pt.read_skipping(**args))
    assert sum(r["files_admitted"] for r in rep
               if r["status"] == "scanned") == len(scanned_files)
    scanned_dirs = {os.path.dirname(f) for f in scanned_files}
    assert {os.path.normpath(r["dir"]) for r in rep
            if r["status"] == "scanned"} == \
        {os.path.normpath(d) for d in scanned_dirs}
    # every directory accounted for, with per-file totals recorded
    man = pt._manifest()
    assert len(rep) == sum(len(ds) for ds in man["parts"].values())
    assert all(r["files_total"] == 4 for r in rep)


def test_skipping_report_statuses(multi_file_pt):
    pt = multi_file_pt
    # partition eq prunes two of three dirs at the manifest; k=149 is
    # grp 2's (149 % 3), so it falls in the GAP between grp 1's file
    # bounds ([..148] / [151..]) — the dir admits, every file disproves
    rep = pt.skipping_report(eq={"grp": "1", "k": 149})
    by = {}
    for r in rep:
        by.setdefault(r["status"], 0)
        by[r["status"]] += 1
    assert by.get("pruned_dir") == 2
    assert by.get("pruned_files") == 1
    assert "scanned" not in by
    assert pt.read_skipping(eq={"grp": "1", "k": 149}).count() == 0
    # an out-of-bounds range dies at the DIRECTORY level instead
    rep2 = pt.skipping_report(ranges={"k": (10000, 20000)})
    assert all(r["status"] == "pruned_dir" for r in rep2)


def test_skipping_report_any_matches_actual_scan(multi_file_pt):
    pt = multi_file_pt
    branches = [{"eq": {"grp": "1"}, "ranges": {"k": (100, 160)}},
                {"eq": {"grp": "2"}, "ranges": {"k": (300, 320)}}]
    rep = pt.skipping_report_any(branches)
    # per-branch rows + union rows, every manifest dir in each group
    man = pt._manifest()
    n_dirs = sum(len(ds) for ds in man["parts"].values())
    for tag in (0, 1, "union"):
        assert sum(1 for r in rep if r["branch"] == tag) == n_dirs
    # the union rows describe EXACTLY what the real scan touches
    scanned_files = _files_of(pt.read_skipping_any(branches))
    union = [r for r in rep if r["branch"] == "union"]
    assert sum(r["files_admitted"] for r in union
               if r["status"] == "scanned") == len(scanned_files)
    assert {os.path.normpath(r["dir"]) for r in union
            if r["status"] == "scanned"} == \
        {os.path.normpath(os.path.dirname(f)) for f in scanned_files}
    # branch rows carry each branch's own (narrower) admission
    b0 = {r["dir"]: r["status"] for r in rep if r["branch"] == 0}
    assert sum(1 for s in b0.values() if s == "pruned_dir") == 2


def test_skipping_report_any_statuses_and_isin(multi_file_pt, spark):
    pt = multi_file_pt
    # two gap probes (see test_skipping_report_statuses): each branch
    # admits its grp's dir then disproves every FILE in it — the union
    # must keep the per-file verdict, not relabel it pruned_dir
    rep = pt.skipping_report_any([{"eq": {"grp": "1", "k": 149}},
                                  {"eq": {"grp": "2", "k": 150}}])
    union = {r["dir"]: r["status"] for r in rep
             if r["branch"] == "union"}
    counts = {}
    for s in union.values():
        counts[s] = counts.get(s, 0) + 1
    assert counts == {"pruned_dir": 1, "pruned_files": 2}
    assert pt.read_skipping_any([{"eq": {"grp": "1", "k": 149}},
                                 {"eq": {"grp": "2", "k": 150}}]) \
        .count() == 0
    # IN-list admission in the report: matches the isin read's scan
    args = {"eq": {"grp": "1"}, "isin": {"k": [100, 103, 550]}}
    rep2 = pt.skipping_report(**args)
    scanned = _files_of(pt.read_skipping(**args))
    assert sum(r["files_admitted"] for r in rep2
               if r["status"] == "scanned") == len(scanned)
    assert {os.path.normpath(r["dir"]) for r in rep2
            if r["status"] == "scanned"} == \
        {os.path.normpath(os.path.dirname(f)) for f in scanned}
    # a gap-only IN list keeps the dir but disproves every file
    rep3 = pt.skipping_report(eq={"grp": "1"}, isin={"k": [149]})
    sts = {r["status"] for r in rep3
           if os.path.normpath(r["dir"]) in
           {os.path.normpath(d) for d in
            pt._manifest()["parts"]["1"]}}
    assert sts == {"pruned_files"}


def test_skipping_report_any_is_metadata_only(multi_file_pt, spark,
                                              monkeypatch):
    """The disjunctive EXPLAIN surface runs zero Spark jobs and parses
    each staging's stats sidecar at most once per handle (the memoized
    `_staging_stats`), pinned through the recording seam."""
    from cs186_query_optimization_project_spark import metaio
    from tests.test_metaio import RecordingIO

    pt = PartitionedTable(multi_file_pt.spark, multi_file_pt.root)
    rec = RecordingIO()
    monkeypatch.setattr(metaio, "IO", rec)

    def jobs():
        v = spark.sparkContext._jsc.sc().dagScheduler().nextJobId()
        return v if isinstance(v, int) else int(v.get())

    before = jobs()
    pt.skipping_report_any([{"eq": {"grp": "1", "k": 149}},
                            {"eq": {"grp": "2"},
                             "isin": {"k": [150, 300]}}])
    assert jobs() == before                    # zero Spark jobs
    stats_reads = [p for (m, p) in rec.calls
                   if m == "read_text" and p.endswith("_stats.json")]
    assert len(stats_reads) == len(set(stats_reads))  # memoized


def test_describe_detail(multi_file_pt, spark, tmp_path):
    pt = multi_file_pt.clone(str(tmp_path / "dd"))
    d = pt.describe_detail()
    assert d["partition_cols"] == ["grp"]
    assert d["n_partitions"] == 3 and d["n_dirs"] == 3
    assert d["n_files"] == 12          # 4 range files per leaf
    assert d["n_rows"] == 600
    assert d["total_bytes"] > 0
    assert d["n_tombstoned_dirs"] == 0
    pt.delete_soft("k < 100")
    d2 = pt.describe_detail()
    assert d2["n_tombstoned_dirs"] == 3
    assert d2["n_rows"] == 600 - 100   # DV cardinalities subtract
    assert pt.describe_detail(version=0)["n_rows"] == 600
