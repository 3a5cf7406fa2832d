"""Multi-writer metadata safety (VERDICT r4 item 7): two OS processes
stamping DISJOINT id sets through `_mark_indexed` concurrently must
both land — no lost update. Also unit-covers the commit lock itself."""

from __future__ import annotations

import json
import os
import subprocess
import sys
import textwrap
import time

import pytest

from serverless_datalake_aws_spark.sources.commitlog import FileLock

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_filelock_exclusive_and_stale_steal(tmp_path):
    # heartbeat=0 simulates a holder that CRASHES without releasing —
    # nothing refreshes the mtime, so the lock goes stale after ttl
    lock = FileLock(tmp_path / "l", ttl=0.4, heartbeat=0)
    lock.acquire()
    other = FileLock(tmp_path / "l", ttl=0.4)
    assert other.held_elsewhere()
    with pytest.raises(TimeoutError):
        other.acquire(timeout=0.15)
    # owner dies without release; after ttl the lock is stealable
    time.sleep(0.5)
    assert not other.held_elsewhere()
    other.acquire(timeout=1.0)
    other.release()
    assert not (tmp_path / "l").exists()


def test_filelock_heartbeat_keeps_slow_holder_alive(tmp_path):
    """A LIVE holder whose commit exceeds ttl must not be stolen: the
    heartbeat thread refreshes mtime, so staleness means death, not
    slowness (ADVICE r5: the old lock was stealable mid-commit)."""
    lock = FileLock(tmp_path / "l", ttl=0.3)
    lock.acquire()
    contender = FileLock(tmp_path / "l", ttl=0.3)
    time.sleep(0.8)  # well past ttl — heartbeat (ttl/4) keeps it fresh
    assert contender.held_elsewhere()
    with pytest.raises(TimeoutError):
        contender.acquire(timeout=0.15)
    assert lock.still_held()
    lock.release()
    assert not (tmp_path / "l").exists()


def test_filelock_stolen_release_spares_thief(tmp_path):
    """After a steal, the original holder's release must NOT unlink the
    thief's lock (owner-token check) — otherwise a third writer could
    acquire while the thief is still committing (the exact lost-update
    scenario the lock exists to prevent)."""
    victim = FileLock(tmp_path / "l", ttl=0.2, heartbeat=0)
    victim.acquire()
    time.sleep(0.3)  # victim stalls past ttl with no heartbeat
    thief = FileLock(tmp_path / "l", ttl=0.2)
    thief.acquire(timeout=1.0)
    assert not victim.still_held()  # victim can detect the theft
    victim.release()  # must be a no-op on the thief's lock file
    assert (tmp_path / "l").exists()
    assert thief.still_held()
    third = FileLock(tmp_path / "l", ttl=5.0)
    with pytest.raises(TimeoutError):
        third.acquire(timeout=0.15)
    thief.release()
    assert not (tmp_path / "l").exists()


_WORKER = textwrap.dedent(
    """
    import json, sys
    sys.path.insert(0, {repo!r})
    from serverless_datalake_aws_spark.session import get_session
    from serverless_datalake_aws_spark.engine import DataLakeEngine

    lake, ids_json = sys.argv[1], sys.argv[2]
    ids = json.loads(ids_json)
    spark = get_session(app_name="marker-" + ids[0][:8], cpus=2)
    engine = DataLakeEngine(spark, lake)
    engine._mark_indexed(spark.createDataFrame([(i,) for i in ids], "id string"))
    spark.stop()
    """
)


def test_concurrent_markers_no_lost_update(spark, tmp_path):
    from serverless_datalake_aws_spark.engine import DataLakeEngine

    lake = str(tmp_path / "lake")
    engine = DataLakeEngine(spark, lake)
    ids = engine.ingest_batch(
        [{"n": i} for i in range(20)], data_type="sales"
    ) + engine.ingest_batch([{"n": i} for i in range(20)], data_type="logs")
    half_a, half_b = ids[::2], ids[1::2]

    env = dict(os.environ)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER.format(repo=REPO), lake, json.dumps(h)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
        )
        for h in (half_a, half_b)
    ]
    for p in procs:
        _, err = p.communicate(timeout=300)
        assert p.returncode == 0, err.decode()[-2000:]

    marked = {
        r["id"]
        for r in engine.meta().filter("indexed = true").select("id").collect()
    }
    missing = set(ids) - marked
    assert not missing, f"lost updates: {len(missing)} of {len(ids)}"
    # no stray stage/lock debris
    assert not os.path.exists(lake + "/_meta.mark.tmp")
    assert not os.path.exists(lake + "/_meta.lock")


_ZONE_MUTATOR = textwrap.dedent(
    """
    import sys
    sys.path.insert(0, {repo!r})
    from serverless_datalake_aws_spark.session import get_session
    from serverless_datalake_aws_spark.engine import DataLakeEngine

    lake, op = sys.argv[1], sys.argv[2]
    spark = get_session(app_name="zonemut-" + op, cpus=2)
    engine = DataLakeEngine(spark, lake)
    if op == "dedup":
        print("dropped", engine.dedup_zone("raw"))
    else:
        print("promoted", engine.process().count())
    spark.stop()
    """
)


def test_concurrent_dedup_and_process_zone_lock(spark, tmp_path):
    """VERDICT r5 item 7: dedup_zone rewrites raw/ via directory swap
    while process() lazily scans raw/ and overwrites processed/ —
    unserialized, the promoter can catch the swap's missing-directory
    instant or read a half-visible zone. Under the per-zone commit
    locks both orders are legal but both must be CONSISTENT: raw ends
    deduplicated, processed holds exactly one coherent snapshot
    (pre- or post-dedup), and neither process errors."""
    from serverless_datalake_aws_spark.engine import DataLakeEngine

    lake = str(tmp_path / "lake")
    engine = DataLakeEngine(spark, lake)
    # 30 rows, 10 distinct payloads -> dedup drops 20
    engine.ingest_batch([{"n": i % 10} for i in range(30)], data_type="sales")

    env = dict(os.environ)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _ZONE_MUTATOR.format(repo=REPO), lake, op],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
        )
        for op in ("dedup", "promote")
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, err.decode()[-2000:]
        outs.append(out.decode())

    assert engine.records("raw").count() == 10  # dedup landed
    processed = engine.records("processed").count()
    # promoter saw EITHER the pre-dedup or post-dedup snapshot, whole
    assert processed in (10, 30), (processed, outs)
    # and its ids are a coherent subset of what raw ever contained
    raw_ids = {r["id"] for r in engine.records("raw").select("id").collect()}
    proc_ids = {
        r["id"] for r in engine.records("processed").select("id").collect()
    }
    assert len(proc_ids) == processed  # no duplicated ids from a torn write
    if processed == 10:
        assert proc_ids == raw_ids


def test_filelock_release_is_atomic_against_steal(tmp_path):
    """ADVICE r6 (low): release() must not delete a thief's lock via
    the read-token/unlink window. The rename-first release moves the
    path atomically, so whichever of (release, steal) runs first, the
    thief's lock survives a stalled owner's release."""
    from serverless_datalake_aws_spark.sources.commitlog import FileLock

    lock_path = tmp_path / "l.lock"
    owner = FileLock(lock_path, ttl=0.2, heartbeat=0)  # frozen owner
    owner.acquire()
    import time

    time.sleep(0.3)  # owner goes stale
    thief = FileLock(lock_path, ttl=0.2)  # judges staleness by its ttl
    thief.acquire(timeout=5.0)
    # stalled owner wakes up and releases: must leave the thief's lock
    owner.release()
    assert lock_path.exists()
    assert thief.still_held()
    thief.release()
    assert not lock_path.exists()
    # no stray .rel debris left behind by the verified release
    assert not list(tmp_path.glob("*.rel.*"))
