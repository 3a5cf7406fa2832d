"""Versioned-table surface: bucket-versioning semantics over plain
parquet (reference: aws-data-lake-terraform-main.tf:8-13 enables S3
versioning; lifecycle vacuum mirrors noncurrent_version_expiration)."""

from __future__ import annotations

import pytest

from serverless_datalake_aws_spark.sources.versioning import (
    current_version,
    diff_versions,
    merge_versioned,
    read_versioned,
    vacuum,
    write_versioned,
)


def _df(spark, values):
    return spark.createDataFrame([(i,) for i in values], "x int")


def test_write_read_roundtrip_and_monotonic_versions(spark, tmp_path):
    root = tmp_path / "tbl"
    assert write_versioned(_df(spark, [1, 2]), root) == 1
    assert write_versioned(_df(spark, [3]), root) == 2
    assert current_version(root) == 2
    assert sorted(
        r["x"] for r in read_versioned(spark, root).collect()
    ) == [3]


def test_time_travel_reads_noncurrent_version(spark, tmp_path):
    root = tmp_path / "tbl"
    write_versioned(_df(spark, [1, 2]), root)
    write_versioned(_df(spark, [3]), root)
    old = read_versioned(spark, root, version=1)
    assert sorted(r["x"] for r in old.collect()) == [1, 2]


def test_vacuum_keeps_window_never_current(spark, tmp_path):
    root = tmp_path / "tbl"
    for vals in ([1], [2], [3], [4], [5]):
        write_versioned(_df(spark, vals), root)
    pruned = vacuum(root, keep=2)
    assert pruned == [1, 2]  # noncurrent 1..4, newest 2 kept
    # current + its two predecessors still readable
    assert [r["x"] for r in read_versioned(spark, root).collect()] == [5]
    assert [r["x"] for r in read_versioned(spark, root, 4).collect()] == [4]
    assert [r["x"] for r in read_versioned(spark, root, 3).collect()] == [3]
    with pytest.raises(Exception):
        read_versioned(spark, root, 1)


def test_crashed_publish_is_invisible_and_reclaimed(spark, tmp_path):
    root = tmp_path / "tbl"
    write_versioned(_df(spark, [1]), root)
    # simulate a crash AFTER data write but BEFORE the commit flag:
    # the directory exists, the flag does not, the pointer still names v1
    vdir = root / "_v=2"
    _df(spark, [9]).write.mode("overwrite").parquet(str(vdir))
    assert current_version(root) == 1
    assert [r["x"] for r in read_versioned(spark, root).collect()] == [1]
    with pytest.raises(FileNotFoundError):
        read_versioned(spark, root, 2)  # uncommitted → refused
    assert vacuum(root, keep=2) == [2]  # reclaimed
    # and the next publish reuses the slot without confusion
    assert write_versioned(_df(spark, [7]), root) == 2
    assert [r["x"] for r in read_versioned(spark, root).collect()] == [7]


def test_engine_versioned_roundtrip(spark, tmp_path):
    from serverless_datalake_aws_spark.engine import DataLakeEngine

    eng = DataLakeEngine(spark, tmp_path / "lake")
    assert eng.publish_versioned("gold", _df(spark, [1, 2])) == 1
    assert eng.publish_versioned("gold", _df(spark, [3])) == 2
    assert [r["x"] for r in eng.read_versioned("gold").collect()] == [3]
    assert sorted(
        r["x"] for r in eng.read_versioned("gold", version=1).collect()
    ) == [1, 2]
    assert eng.vacuum_versioned("gold", keep=0) == [1]


def test_engine_versioned_refuses_remote_root(spark):
    from serverless_datalake_aws_spark.engine import DataLakeEngine

    eng = DataLakeEngine(spark, "s3a://bucket/lake")
    with pytest.raises(NotImplementedError):
        eng.publish_versioned("gold", _df(spark, [1]))


def test_diff_versions_added_removed_changed(spark, tmp_path):
    """Keyed diff between two committed snapshots classifies every
    affected key and stays silent on unchanged rows."""
    from serverless_datalake_aws_spark.sources.versioning import (
        diff_versions,
        write_versioned,
    )

    root = tmp_path / "vt"
    v1 = spark.createDataFrame(
        [("a", 1, "x"), ("b", 2, "y"), ("c", 3, "z")], "id string, n int, s string"
    )
    v2 = spark.createDataFrame(
        [("a", 1, "x"), ("b", 99, "y"), ("d", 4, "w")], "id string, n int, s string"
    )
    write_versioned(v1, root)
    write_versioned(v2, root)
    got = {
        r["id"]: r["change"]
        for r in diff_versions(spark, root, old=1, key="id").collect()
    }
    assert got == {"b": "changed", "c": "removed", "d": "added"}


def test_concurrent_writers_occ(spark, tmp_path):
    """Two writers committing versions CONCURRENTLY (threads sharing
    the session — Spark job submission is thread-safe) must never
    collide on a version number, never lose a version, and leave the
    pointer at the highest committed version (monotonic — a slow
    writer finishing late can't regress `_CURRENT`)."""
    import threading

    from serverless_datalake_aws_spark.sources.versioning import (
        current_version,
        read_versioned,
        write_versioned,
    )

    root = tmp_path / "occ"
    got: dict[str, list[int]] = {"a": [], "b": []}
    errs: list[Exception] = []

    def writer(tag: str) -> None:
        try:
            for i in range(4):
                df = spark.createDataFrame(
                    [(tag, i)], "writer string, seq int"
                )
                got[tag].append(write_versioned(df, root))
        except Exception as e:  # pragma: no cover
            errs.append(e)

    ts = [threading.Thread(target=writer, args=(t,)) for t in ("a", "b")]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=300)
    assert not errs, errs
    versions = got["a"] + got["b"]
    assert len(set(versions)) == 8  # no collisions, no losses
    assert sorted(versions) == list(range(1, 9))
    assert current_version(root) == 8
    # every version is committed and reads back its own writer's row
    for tag in ("a", "b"):
        for v, i in zip(got[tag], range(4)):
            row = read_versioned(spark, root, version=v).collect()[0]
            assert (row["writer"], row["seq"]) == (tag, i)


def test_vacuum_spares_live_claims(spark, tmp_path):
    """vacuum must not reclaim an uncommitted version whose OCC claim
    is fresh (a live writer mid-commit); stale claims and claimless
    crash debris are reclaimed as before."""
    import os
    import time as _time

    from serverless_datalake_aws_spark.sources.versioning import (
        vacuum,
        write_versioned,
    )

    root = tmp_path / "t"
    write_versioned(spark.createDataFrame([(1,)], "a int"), root)
    # simulate a live writer: claim + uncommitted dir, fresh mtime
    (root / "_v=2.claim").write_text("")
    (root / "_v=2").mkdir()
    (root / "_v=2" / "part-0.parquet").write_bytes(b"x")
    assert vacuum(root, keep=2) == []  # spared
    assert (root / "_v=2").exists() and (root / "_v=2.claim").exists()
    # age the claim past the grace -> reclaimed
    old = _time.time() - 7200
    os.utime(root / "_v=2.claim", (old, old))
    assert vacuum(root, keep=2) == [2]
    assert not (root / "_v=2").exists()
    assert not (root / "_v=2.claim").exists()
    # claimless uncommitted dir (pre-OCC crash debris) reclaims at once
    (root / "_v=3").mkdir()
    assert vacuum(root, keep=2) == [3]


def test_claim_heartbeat_refreshes_mtime_during_write(spark, tmp_path, monkeypatch):
    """ADVICE r6 (medium): a live writer's claim must stay fresh while
    the data write runs, so vacuum's claim-grace never reclaims a
    slow-but-alive writer's uncommitted dir."""
    import os
    import time

    from serverless_datalake_aws_spark.sources import versioning as V

    root = tmp_path / "t"
    monkeypatch.setattr(V, "_CLAIM_HEARTBEAT", 0.2)
    seen = {}
    real = V._write_data

    def slow_write(df, vdir, fmt):
        claim = vdir.parent / f"{vdir.name}.claim"
        t0 = claim.stat().st_mtime
        time.sleep(1.0)  # several heartbeat intervals
        seen["advanced"] = claim.stat().st_mtime > t0
        real(df, vdir, fmt)

    monkeypatch.setattr(V, "_write_data", slow_write)
    v = V.write_versioned(spark.range(3).toDF("id"), root)
    assert seen["advanced"]  # heartbeat touched the claim mid-write
    assert V.read_versioned(spark, root).count() == 3
    assert not (root / f"_v={v}.claim").exists()


def test_reclaimed_claim_aborts_commit(spark, tmp_path, monkeypatch):
    """If the claim vanished mid-write (vacuum under a frozen writer),
    the commit must abort instead of publishing into a dir a
    concurrent vacuum may be half-deleting."""
    import pytest as _pytest

    from serverless_datalake_aws_spark.sources import versioning as V

    root = tmp_path / "t"
    V.write_versioned(spark.range(2).toDF("id"), root)  # v1 committed
    real = V._write_data

    def write_then_lose_claim(df, vdir, fmt):
        real(df, vdir, fmt)
        (vdir.parent / f"{vdir.name}.claim").unlink()  # vacuum took it

    monkeypatch.setattr(V, "_write_data", write_then_lose_claim)
    with _pytest.raises(RuntimeError, match="reclaimed mid-write"):
        V.write_versioned(spark.range(5).toDF("id"), root)
    # previous version untouched; the aborted version never committed
    assert V.read_versioned(spark, root).count() == 2
    assert V.current_version(root) == 1


def test_vacuum_protects_newest_committed_before_pointer(spark, tmp_path):
    """A version whose _COMMITTED flag exists but whose _CURRENT swing
    is still in flight must survive vacuum — deleting it would leave
    the imminent pointer naming a removed directory."""
    import os

    root = tmp_path / "t"
    write_versioned(spark.range(3), root)
    write_versioned(spark.range(4), root)
    # simulate mid-publish: v3 committed, pointer still on v2
    (root / "_v=3").mkdir()
    spark.range(5).write.mode("overwrite").parquet(str(root / "_v=3"))
    (root / "_v=3" / "_COMMITTED").touch()
    assert current_version(root) == 2
    pruned = vacuum(root, keep=0)
    assert 3 not in pruned and (root / "_v=3").exists()
    assert 1 in pruned  # plain noncurrent still expires
    # unborn pointer: keep=0 never deletes the only committed data
    root2 = tmp_path / "t2"
    (root2 / "_v=1").mkdir(parents=True)
    spark.range(2).write.mode("overwrite").parquet(str(root2 / "_v=1"))
    (root2 / "_v=1" / "_COMMITTED").touch()
    assert vacuum(root2, keep=0) == []
    assert (root2 / "_v=1").exists()
    assert os is not None


def test_diff_hash_unambiguous_on_separator_values(spark, tmp_path):
    """Row-image hashing must not collide when values contain the old
    separator or when NULL meets its old placeholder string."""
    root = tmp_path / "t"
    v1 = spark.createDataFrame(
        [(1, "x\x1fy", "z"), (2, None, "a")], "id long, a string, b string"
    )
    v2 = spark.createDataFrame(
        [(1, "x", "y\x1fz"), (2, "\x00", "a")], "id long, a string, b string"
    )
    write_versioned(v1, root)
    write_versioned(v2, root)
    got = {
        r["id"]: r["change"]
        for r in diff_versions(spark, root, old=1, new=2, key="id").collect()
    }
    assert got == {1: "changed", 2: "changed"}


def test_merge_refuses_non_parquet_table(spark, tmp_path):
    root = tmp_path / "t"
    write_versioned(spark.range(5), root, fmt="json")
    with pytest.raises(NotImplementedError, match="parquet"):
        merge_versioned(spark, root, spark.range(2), key="id")
    # table untouched
    assert read_versioned(spark, root, fmt="json").count() == 5
