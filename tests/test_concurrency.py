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
    lock = FileLock(tmp_path / "l", ttl=0.4)
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
