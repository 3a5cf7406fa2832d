"""Exactly-once maintenance sinks (VERDICT r6 item 1).

foreachBatch side effects are AT-LEAST-ONCE: Spark may re-invoke the
sink callback with the same epoch_id after a task/driver retry, and the
round-6 driver gate caught exactly that (a08_st10: same groups, same
schema, doubled sums). These tests drive the Maintained* sinks the way
a retrying stream would — apply the same epoch twice, crash mid-publish
— and assert the state is bit-identical to the single-delivery run.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F


def _rollup_state(rollup):
    return {
        r["k"]: (r["n_rows"], r["sum_v"], r["min_v"], r["max_v"])
        for r in rollup.read().collect()
    }


def test_maintained_rollup_replayed_epoch_is_noop(spark, tmp_path):
    """apply(batch, epoch_id=N) twice == once — the retry contract."""
    from serverless_datalake_aws_spark.operators.incremental import MaintainedRollup

    rollup = MaintainedRollup(spark, str(tmp_path / "r"), keys=["k"], measures=["v"])
    b0 = spark.createDataFrame([("a", 1.0), ("b", 2.0)], "k string, v double")
    b1 = spark.createDataFrame([("a", 10.0)], "k string, v double")

    rollup.apply(b0, epoch_id=0)
    rollup.apply(b1, epoch_id=1)
    once = _rollup_state(rollup)
    rollup.apply(b1, epoch_id=1)  # Spark retries the latest batch
    rollup.apply(b0, epoch_id=0)  # and never replays an older one, but
    rollup.apply(b1, epoch_id=1)  # even pathological replays must no-op
    assert _rollup_state(rollup) == once
    assert once["a"] == (2, 11.0, 1.0, 10.0)


def test_maintained_rollup_without_epoch_keeps_merge_semantics(spark, tmp_path):
    """Manual (non-stream) callers omit epoch_id and every apply merges
    — the e17 batch-maintenance contract is unchanged."""
    from serverless_datalake_aws_spark.operators.incremental import MaintainedRollup

    rollup = MaintainedRollup(spark, str(tmp_path / "r"), keys=["k"], measures=["v"])
    b = spark.createDataFrame([("a", 1.0)], "k string, v double")
    rollup.apply(b)
    rollup.apply(b)  # deliberate re-absorb: no epoch => no dedup
    assert _rollup_state(rollup)["a"] == (2, 2.0, 1.0, 1.0)


def test_maintained_rollup_crash_before_pointer_commit(spark, tmp_path):
    """A crash after the state write but BEFORE the atomic pointer
    replace must leave the old state committed, and the retry of the
    same epoch must produce the single-delivery result (the pointer
    commits state dir + epoch high-water together, so there is no
    interleaving that double-absorbs)."""
    from serverless_datalake_aws_spark.operators.incremental import (
        MaintainedRollup,
        _EpochStateStore,
    )

    path = str(tmp_path / "r")
    rollup = MaintainedRollup(spark, path, keys=["k"], measures=["v"])
    rollup.apply(
        spark.createDataFrame([("a", 1.0)], "k string, v double"), epoch_id=0
    )

    real_replace = os.replace
    calls = {"n": 0}

    def exploding_replace(src, dst):
        if dst.endswith("_LATEST"):
            calls["n"] += 1
            raise OSError("simulated crash before pointer commit")
        return real_replace(src, dst)

    b1 = spark.createDataFrame([("a", 10.0)], "k string, v double")
    import serverless_datalake_aws_spark.operators.incremental as inc

    orig = inc.os.replace if hasattr(inc, "os") else None  # noqa: F841
    try:
        os.replace = exploding_replace
        with pytest.raises(OSError, match="simulated crash"):
            rollup.apply(b1, epoch_id=1)
    finally:
        os.replace = real_replace
    assert calls["n"] == 1
    # old state still committed: epoch 1 not absorbed, values pre-crash
    assert _rollup_state(rollup)["a"] == (1, 1.0, 1.0, 1.0)
    # the stream retries epoch 1 → exactly-once result
    rollup.apply(b1, epoch_id=1)
    assert _rollup_state(rollup)["a"] == (2, 11.0, 1.0, 10.0)
    # pointer records the high-water mark
    with open(os.path.join(path, "_LATEST")) as fh:
        assert json.load(fh)["epoch"] == 1


def test_maintained_rollup_legacy_flat_layout_migrates(spark, tmp_path):
    """Pre-r7 rollups stored parquet directly under `path` with no
    pointer; they must read as current state and migrate on the next
    publish."""
    from serverless_datalake_aws_spark.operators.incremental import (
        MaintainedRollup,
        partial_rollup,
    )

    path = str(tmp_path / "legacy")
    base = spark.createDataFrame([("a", 1.0), ("a", 3.0)], "k string, v double")
    partial_rollup(base, ["k"], ["v"]).write.parquet(path)

    rollup = MaintainedRollup(spark, path, keys=["k"], measures=["v"])
    assert _rollup_state(rollup)["a"] == (2, 4.0, 1.0, 3.0)
    rollup.apply(
        spark.createDataFrame([("a", 5.0)], "k string, v double"), epoch_id=7
    )
    assert _rollup_state(rollup)["a"] == (3, 9.0, 1.0, 5.0)
    assert os.path.exists(os.path.join(path, "_LATEST"))
    # replay after migration is still a no-op
    rollup.apply(
        spark.createDataFrame([("a", 5.0)], "k string, v double"), epoch_id=7
    )
    assert _rollup_state(rollup)["a"] == (3, 9.0, 1.0, 5.0)


def test_maintained_quantiles_replayed_epoch_is_noop(spark, tmp_path):
    from serverless_datalake_aws_spark.operators.incremental import (
        MaintainedQuantiles,
        qh_partial,
    )

    df = spark.range(500).selectExpr("cast(id as double) * 0.3 as v")
    mq = MaintainedQuantiles(spark, str(tmp_path / "q"), "v")
    mq.apply(df.filter("id < 250"), epoch_id=0)
    mq.apply(df.filter("id >= 250"), epoch_id=1)
    mq.apply(df.filter("id >= 250"), epoch_id=1)  # retry
    got = {(r["sign"], r["bin"]): r["cnt"] for r in mq.read().collect()}
    want = {
        (r["sign"], r["bin"]): r["cnt"] for r in qh_partial(df, "v").collect()
    }
    assert got == want


def test_maintained_join_replayed_epoch_is_noop(spark, tmp_path):
    """Replaying an absorbed epoch must not duplicate view rows — the
    pre-r7 blind append did exactly that."""
    from serverless_datalake_aws_spark.operators.incremental import MaintainedJoin

    left = spark.createDataFrame([(1, "l0"), (2, "l1")], "k long, lv string")
    right = spark.createDataFrame([(1, "r0"), (1, "r1")], "k long, rv string")
    mj = MaintainedJoin(spark, str(tmp_path / "mj"), on="k")
    mj.apply(delta_left=left, epoch_id=0)
    mj.apply(delta_right=right, epoch_id=1)
    mj.apply(delta_right=right, epoch_id=1)  # retry
    got = sorted(map(tuple, mj.read().select("k", "lv", "rv").collect()))
    want = sorted(map(tuple, left.join(right, "k").collect()))
    assert got == want


def test_maintained_join_uncommitted_epoch_invisible(spark, tmp_path):
    """Data written for an epoch whose pointer never committed (crash
    between the parquet writes and _commit) must be invisible to
    read() and fully replaced by the retry."""
    from serverless_datalake_aws_spark.operators.incremental import MaintainedJoin

    left = spark.createDataFrame([(1, "l0")], "k long, lv string")
    right = spark.createDataFrame([(1, "r0")], "k long, rv string")
    mj = MaintainedJoin(spark, str(tmp_path / "mj"), on="k")
    mj.apply(delta_left=left, epoch_id=0)

    # simulate the crash: write epoch 1's dirs but skip the commit
    commit = mj._t.commit
    mj._t.commit = lambda e: None
    mj.apply(delta_right=right, epoch_id=1)
    mj._t.commit = commit
    assert mj.read().count() == 0  # epoch 1 invisible: no committed join rows
    mj.apply(delta_right=right, epoch_id=1)  # retry overwrites + commits
    got = sorted(map(tuple, mj.read().select("k", "lv", "rv").collect()))
    assert got == [(1, "l0", "r0")]


def test_drain_raises_on_timeout(spark, tmp_path):
    """A drain that hasn't finished must raise, not silently hand the
    caller a partial sink (the second path behind the r6 red row)."""
    from serverless_datalake_aws_spark.streaming.pipeline import drain

    src = tmp_path / "src"
    spark.range(10).write.parquet(str(src))
    q = (
        spark.readStream.schema("id long")
        .parquet(str(src))
        .writeStream.format("memory")
        .queryName("drain_timeout_probe")
        .trigger(processingTime="10 seconds")  # never terminates
        .start()
    )
    with pytest.raises(TimeoutError, match="did not complete"):
        drain(q, timeout_s=1)
    assert not q.isActive  # drain stopped the stuck query


def test_curate_incremental_replayed_epoch_is_noop(spark, tmp_path):
    """engine.curate_incremental's foreachBatch sink skips absorbed
    epochs via the in-dir marker (atomic with the data swap)."""
    from serverless_datalake_aws_spark.engine import DataLakeEngine

    eng = DataLakeEngine(spark, tmp_path / "lake")
    eng.ingest_batch([{"x": i} for i in range(6)], data_type="t1")
    out = eng.curate_incremental()
    first = {(r["data_type"], r["ingest_date"]): r["n_records"] for r in out.collect()}
    assert sum(first.values()) == 6

    # replay batch 0 against the committed summary the way a Spark
    # retry would: same epoch id, same batch rows
    batch = spark.read.schema(
        spark.read.parquet(eng.changelog_path).schema
    ).parquet(eng.changelog_path)
    marker = tmp_path / "lake" / "curated" / "daily_summary" / "_absorbed_epoch"
    assert marker.exists()
    # marker format is "<checkpoint-query-id> <epoch>" (engine.py
    # _merge); the epoch is the last whitespace token, mirroring the
    # tolerant reader in engine.py
    high = int(marker.read_text().split()[-1])

    # drive the identical merge function through a fresh drain: no new
    # changelog rows and no epoch > high-water → summary unchanged
    out2 = eng.curate_incremental()
    second = {
        (r["data_type"], r["ingest_date"]): r["n_records"] for r in out2.collect()
    }
    assert second == first
    assert int(marker.read_text().split()[-1]) == high


def test_curate_incremental_recovers_from_crash_mid_swap(spark, tmp_path):
    """Death between rmtree(out) and move(tmp, out) leaves only the
    complete tmp copy; the next call must heal instead of treating the
    missing dir as 'first batch' (which would reset history)."""
    import shutil

    from serverless_datalake_aws_spark.engine import DataLakeEngine

    eng = DataLakeEngine(spark, tmp_path / "lake")
    eng.ingest_batch([{"x": i} for i in range(4)], data_type="t1")
    eng.curate_incremental()
    out = tmp_path / "lake" / "curated" / "daily_summary"
    want = {
        (r["data_type"], r["ingest_date"]): r["n_records"]
        for r in spark.read.parquet(str(out)).collect()
    }

    # simulate the crash window: out was rmtree'd, tmp (complete, with
    # marker) was never moved
    tmp = str(out) + ".curate.tmp"
    shutil.move(str(out), tmp)
    assert not out.exists()

    got = {
        (r["data_type"], r["ingest_date"]): r["n_records"]
        for r in eng.curate_incremental().collect()
    }
    assert got == want  # healed, not reset


def test_index_cdc_append_is_idempotent_per_id(spark, tmp_path):
    """A crash between the index append and the indexed-stamp makes the
    stream redeliver those ids; the anti-join must keep the index free
    of duplicate token rows."""
    from serverless_datalake_aws_spark.engine import DataLakeEngine

    eng = DataLakeEngine(spark, tmp_path / "lake")
    eng.ingest_batch(
        [{"text": "alpha beta"}, {"text": "beta gamma"}], data_type="t1"
    )
    eng.index_cdc()
    idx1 = spark.read.parquet(eng.search_index_path)
    n1 = idx1.count()
    assert n1 > 0

    # simulate redelivery: wipe the checkpoint so the SAME changelog
    # files replay from scratch — at-least-once in the extreme
    import shutil

    shutil.rmtree(f"{eng.root}/_checkpoints/cdc_index")
    eng.index_cdc()
    idx2 = spark.read.parquet(eng.search_index_path)
    assert idx2.count() == n1
    assert idx2.groupBy("id", "token").count().filter("count > 1").count() == 0


def test_randomized_retry_schedules_equal_from_scratch(spark, tmp_path):
    """Adversarial schedules (seeded): rows split into random batches,
    delivered with random duplicate re-deliveries interleaved — the
    final rollup must ALWAYS equal the from-scratch aggregate. This is
    the at-least-once delivery space the r6 red row came from,
    explored beyond the single-retry case."""
    import random

    from serverless_datalake_aws_spark.operators.incremental import MaintainedRollup

    rng = random.Random(1207)
    rows = [(f"k{i % 7}", float(i % 23) + 0.5) for i in range(200)]
    for trial in range(4):
        rng.shuffle(rows)
        n_batches = rng.randint(2, 5)
        cuts = sorted(rng.sample(range(1, len(rows)), n_batches - 1))
        batches = [
            rows[a:b] for a, b in zip([0, *cuts], [*cuts, len(rows)])
        ]
        # delivery: each epoch delivered once, then 0-2 duplicate
        # re-deliveries of it (and occasionally an OLDER epoch replay)
        schedule: list[int] = []
        for e in range(n_batches):
            schedule.append(e)
            for _ in range(rng.randint(0, 2)):
                schedule.append(e)
            if e and rng.random() < 0.5:
                schedule.append(rng.randrange(e))  # stale replay
        rollup = MaintainedRollup(
            spark,
            str(tmp_path / f"r{trial}"),
            keys=["k"],
            measures=["v"],
        )
        for e in schedule:
            rollup.apply(
                spark.createDataFrame(batches[e], "k string, v double"),
                epoch_id=e,
            )
        got = {
            r["k"]: (r["n_rows"], round(r["sum_v"], 6))
            for r in rollup.read().collect()
        }
        want: dict[str, tuple[int, float]] = {}
        for k, v in rows:
            n, s = want.get(k, (0, 0.0))
            want[k] = (n + 1, s + v)
        want = {k: (n, round(s, 6)) for k, (n, s) in want.items()}
        assert got == want, f"trial {trial} schedule {schedule}"


def test_epoch_partitioned_table_contract(spark, tmp_path):
    """The shared append-shaped state contract (MaintainedJoin, st15):
    uncommitted epochs invisible, replay overwrites its own epoch,
    reads exclude epochs beyond `upto`."""
    from serverless_datalake_aws_spark.operators.incremental import (
        EpochPartitionedTable,
    )

    t = EpochPartitionedTable(spark, str(tmp_path / "ept"))
    assert t.committed() == -1
    assert t.read("rows", upto=t.committed()) is None

    t.write(spark.createDataFrame([(1,)], "x long"), "rows", 0)
    t.commit(0)
    t.write(spark.createDataFrame([(2,), (3,)], "x long"), "rows", 1)
    # epoch 1 not committed: invisible
    assert sorted(
        r["x"] for r in t.read("rows", upto=t.committed()).collect()
    ) == [1]
    # retry overwrites epoch 1 with different content, then commits
    t.write(spark.createDataFrame([(9,)], "x long"), "rows", 1)
    t.commit(1)
    assert sorted(
        r["x"] for r in t.read("rows", upto=t.committed()).collect()
    ) == [1, 9]
    # bounded reads exclude later epochs
    assert sorted(r["x"] for r in t.read("rows", upto=0).collect()) == [1]


def test_epoch_store_first_publish_crash_does_not_wedge(spark, tmp_path):
    """A crash during the FIRST publish (state dir written, pointer
    never committed) must read as 'never published', not raise
    UNABLE_TO_INFER_SCHEMA forever (GC only runs inside publish, which
    read() gates)."""
    from serverless_datalake_aws_spark.operators.incremental import (
        _EpochStateStore,
    )

    store = _EpochStateStore(spark, str(tmp_path / "st"))
    # simulate: orphan state dir, no _LATEST
    spark.range(5).write.parquet(str(tmp_path / "st" / "state-000000-dead"))
    assert store.read() is None
    assert store.absorbed_epoch() == -1
    # the next publish commits normally and GCs the orphan
    store.publish(spark.range(3), epoch_id=0)
    assert store.read().count() == 3
    import os

    assert "state-000000-dead" not in os.listdir(tmp_path / "st")


def test_epoch_partitioned_table_migrates_legacy_layout(spark, tmp_path):
    """Pre-epoch blind-append state (flat files, no epoch= dirs, no
    _LATEST) reads as committed state and is folded into epoch=-1 so
    later epoch writes don't break partition discovery."""
    from serverless_datalake_aws_spark.operators.incremental import (
        EpochPartitionedTable,
    )

    root = tmp_path / "mj"
    spark.range(10).write.parquet(str(root / "left"))  # legacy layout
    t = EpochPartitionedTable(spark, str(root))
    assert t.committed() == -1
    legacy = t.read("left", upto=t.committed())
    assert legacy.count() == 10
    # new-scheme absorb at epoch 0 coexists with the migrated -1 dir
    t.write(spark.range(10, 13), "left", epoch=0)
    t.commit(0)
    assert t.read("left", upto=0).count() == 13
    assert t.read("left", upto=-1).count() == 10  # epoch 0 invisible


def test_curate_incremental_fresh_checkpoint_replaces_not_doubles(
    spark, tmp_path
):
    """The documented rebuild workflow — curate() full rebuild, then
    restart curate_incremental from a FRESH checkpoint — must converge:
    the fresh lineage replays the entire changelog, so its first absorb
    REPLACES the summary instead of merging the full history on top of
    the just-rebuilt counts (which doubled every cell)."""
    import shutil as _sh

    from serverless_datalake_aws_spark.engine import DataLakeEngine

    eng = DataLakeEngine(spark, tmp_path / "lake")
    eng.ingest_batch([{"x": i} for i in range(6)], data_type="t1")
    out = eng.curate_incremental()
    want = {
        (r["data_type"], r["ingest_date"]): r["n_records"]
        for r in out.collect()
    }
    assert sum(want.values()) == 6

    # manual full rebuild (marker preserved with the OLD lineage's id),
    # then the docstring-prescribed fresh-checkpoint restart
    eng.process()
    eng.curate()
    _sh.rmtree(tmp_path / "lake" / "_checkpoints" / "curate")
    out2 = eng.curate_incremental()
    got = {
        (r["data_type"], r["ingest_date"]): r["n_records"]
        for r in out2.collect()
    }
    assert got == want  # not doubled

    # and the NEW lineage keeps normal merge semantics for later epochs
    eng.ingest_batch([{"x": 99}], data_type="t1")
    out3 = eng.curate_incremental()
    assert sum(r["n_records"] for r in out3.collect()) == 7
