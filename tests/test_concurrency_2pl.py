"""Blocking 2PL: lock manager + pessimistic transactions
(concurrency.py) — the behavioral surface of the reference's
``TestLockManager.java`` / ``TestDeadlockPrevention.java`` at table
granularity."""

from __future__ import annotations

import threading
import time

import pytest
from pyspark.sql import functions as F

from cs186_query_optimization_project_spark.concurrency import (
    LockManager,
    S,
    X,
)
from cs186_query_optimization_project_spark.errors import (
    DatabaseException,
    DeadlockException,
)


def test_shared_locks_are_compatible():
    lm = LockManager()
    lm.acquire(1, "t", S)
    lm.acquire(2, "t", S)          # no block
    assert lm.holding(1, "t") == S and lm.holding(2, "t") == S


def test_exclusive_blocks_until_release():
    lm = LockManager()
    lm.acquire(1, "t", S)
    granted = threading.Event()

    def writer():
        lm.acquire(2, "t", X)
        granted.set()

    th = threading.Thread(target=writer, daemon=True)
    th.start()
    time.sleep(0.1)
    assert not granted.is_set()            # blocked behind the S holder
    lm.release_all(1)
    assert granted.wait(5)                 # unblocked by the release
    assert lm.holding(2, "t") == X
    lm.release_all(2)


def test_fifo_reader_queues_behind_waiting_writer():
    # t1 holds S; t2 waits for X; t3's S request must NOT jump the queue
    lm = LockManager()
    lm.acquire(1, "t", S)
    order = []
    done = threading.Event()

    def writer():
        lm.acquire(2, "t", X)
        order.append("writer")
        lm.release_all(2)

    def reader():
        time.sleep(0.2)                    # arrive after the writer
        lm.acquire(3, "t", S)
        order.append("reader")
        lm.release_all(3)
        done.set()

    threading.Thread(target=writer, daemon=True).start()
    threading.Thread(target=reader, daemon=True).start()
    time.sleep(0.4)
    assert order == []                     # both parked behind t1
    lm.release_all(1)
    assert done.wait(5)
    assert order == ["writer", "reader"]   # FIFO, no reader overtake


def test_upgrade_has_queue_priority():
    # t1 and t2 hold S; t3 waits for X; t1's UPGRADE must beat t3
    lm = LockManager()
    lm.acquire(1, "t", S)
    lm.acquire(2, "t", S)
    order = []
    done = threading.Event()

    def plain_writer():
        lm.acquire(3, "t", X)
        order.append("t3")
        lm.release_all(3)
        done.set()

    def upgrader():
        time.sleep(0.2)                    # arrive after t3 queued
        lm.acquire(1, "t", X)
        order.append("t1-upgrade")
        lm.release_all(1)

    threading.Thread(target=plain_writer, daemon=True).start()
    threading.Thread(target=upgrader, daemon=True).start()
    time.sleep(0.4)
    lm.release_all(2)                      # upgrade only waited on t2
    assert done.wait(5)
    assert order == ["t1-upgrade", "t3"]


def test_deadlock_prevented_not_entered():
    # t1 holds A, t2 holds B; t1 blocks on B; t2's request for A would
    # close the cycle → refused immediately with DeadlockException
    lm = LockManager()
    lm.acquire(1, "A", X)
    lm.acquire(2, "B", X)
    t1_blocked = threading.Event()

    def t1():
        t1_blocked.set()
        lm.acquire(1, "B", X)              # parks behind t2
        lm.release_all(1)

    th = threading.Thread(target=t1, daemon=True)
    th.start()
    assert t1_blocked.wait(5)
    time.sleep(0.2)                        # let t1 actually park
    with pytest.raises(DeadlockException):
        lm.acquire(2, "A", X)
    lm.release_all(2)                      # victim aborts → t1 proceeds
    th.join(timeout=5)
    assert not th.is_alive()


def test_upgrade_deadlock_second_upgrader_refused():
    lm = LockManager()
    lm.acquire(1, "t", S)
    lm.acquire(2, "t", S)
    parked = threading.Event()

    def t1_upgrade():
        parked.set()
        lm.acquire(1, "t", X)              # waits on t2's S
        lm.release_all(1)

    th = threading.Thread(target=t1_upgrade, daemon=True)
    th.start()
    assert parked.wait(5)
    time.sleep(0.2)
    with pytest.raises(DeadlockException):
        lm.acquire(2, "t", X)              # would wait on t1 → cycle
    lm.release_all(2)
    th.join(timeout=5)
    assert not th.is_alive()


def test_abnormal_queue_exit_wakes_next_waiter():
    # t1 holds S; t3's X request heads the queue; t4's S queues behind
    # it (FIFO).  When t3 exits ABNORMALLY (timeout), t4 becomes head
    # and compatible — it must be woken and granted promptly, not sleep
    # to its own timeout
    lm = LockManager()
    lm.acquire(1, "t", S)
    granted = threading.Event()

    def writer_times_out():
        try:
            lm.acquire(3, "t", X, timeout=0.4)
        except DatabaseException:
            pass

    def reader():
        time.sleep(0.15)                   # queue behind the writer
        lm.acquire(4, "t", S, timeout=30)
        granted.set()

    threading.Thread(target=writer_times_out, daemon=True).start()
    threading.Thread(target=reader, daemon=True).start()
    # well before the reader's own 30s timeout: the writer's departure
    # at ~0.4s must wake it
    assert granted.wait(3)
    lm.release_all(1)
    lm.release_all(4)


def test_lock_wait_timeout():
    lm = LockManager()
    lm.acquire(1, "t", X)
    with pytest.raises(DatabaseException, match="timeout"):
        lm.acquire(2, "t", X, timeout=0.2)
    lm.release_all(1)


# --------------------------------------------------------------------- #
# end-to-end: pessimistic transactions over a Database
# --------------------------------------------------------------------- #
def test_2pl_transactions_serialize_writes(spark, db, tmp_path):
    db.create_table("nation_2pl", db.table("nation"),
                    str(tmp_path / "nation_2pl"), mode="overwrite")
    try:
        t1 = db.begin(mode="2pl")
        t1.update_rows("nation_2pl", F.col("n_regionkey") == 0,
                       {"n_name": F.concat(F.col("n_name"), F.lit("~a"))})
        committed = []

        def second():
            t2 = db.begin(mode="2pl")
            # blocks on t1's X lock until t1 commits
            t2.update_rows("nation_2pl", F.col("n_regionkey") == 0,
                           {"n_name": F.concat(F.col("n_name"),
                                               F.lit("~b"))})
            t2.commit()
            committed.append("t2")

        th = threading.Thread(target=second, daemon=True)
        th.start()
        time.sleep(0.3)
        assert committed == []             # t2 is parked, not conflicted
        t1.commit()
        th.join(timeout=30)
        assert committed == ["t2"]
        names = {r["n_name"] for r in
                 db.table("nation_2pl")
                 .filter(F.col("n_regionkey") == 0).collect()}
        # serial schedule t1;t2 — both suffixes, in lock order
        assert names and all(n.endswith("~a~b") for n in names)
    finally:
        db.drop_table("nation_2pl")


def test_2pl_read_does_not_block_read(db):
    t1 = db.begin(mode="2pl")
    t2 = db.begin(mode="2pl")
    try:
        assert t1.table("region").count() == t2.table("region").count()
    finally:
        t1.rollback()
        t2.rollback()


def test_refused_upgrade_keeps_live_edges_toward_its_holds():
    # T1 and T2 hold S on A; a sleeping waiter T3 has cached waits-for
    # edges toward both (seeded directly — sleeping waiters only
    # re-derive on wake).  T1's upgrade to X times out: T1 STILL HOLDS
    # its S lock, so T3's edge toward T1 is live and must survive the
    # abnormal exit — pruning it would blind a later cycle test to a
    # real deadlock through T1's remaining hold.
    lm = LockManager()
    lm.acquire(1, "A", S)
    lm.acquire(2, "A", S)
    lm._waits.add(3, {1, 2})
    with pytest.raises(DatabaseException):
        lm.acquire(1, "A", X, timeout=0.05)    # blocked by T2's S
    assert lm.holding(1, "A") == S
    assert 1 in lm._waits._edges[3]
    # a txn that leaves holding NOTHING still prunes (retry hygiene):
    lm.acquire(4, "B", X)
    lm._waits.add(3, {5})
    with pytest.raises(DatabaseException):
        lm.acquire(5, "B", X, timeout=0.05)    # blocked, holds nothing
    assert lm.holding(5, "B") is None
    assert 5 not in lm._waits._edges[3]
