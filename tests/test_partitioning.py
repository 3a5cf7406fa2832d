"""Hidden partitioning (operators/partitioning.py): Iceberg partition
transforms on plain parquet — write-side derivation, read-side
automatic pruning from source-column predicates, and the monotonicity
rules that keep pruning I/O-only."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from serverless_datalake_aws_spark.catalog import table
from serverless_datalake_aws_spark.operators.partitioning import (
    PartitionField,
    hidden_scan,
    hidden_write,
)

SF = "/root/testdata/sf0.001"

SPEC = (
    PartitionField("event_date", "days", "ts"),
    PartitionField("user_bucket", "bucket", "user_id", 8),
)


@pytest.fixture(scope="module")
def lake(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("hidden") / "events")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    ev = table(spark, SF, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    hidden_write(ev, path, SPEC)
    return path


def test_partition_columns_hidden_and_results_match(spark, lake):
    ev = table(spark, SF, "events")
    t0, u0 = ev.agg(F.min("ts"), F.min("user_id")).first()
    lo, hi = t0 + dt.timedelta(days=1), t0 + dt.timedelta(days=3)

    out = hidden_scan(
        spark, lake, SPEC, eq={"user_id": u0}, between={"ts": (lo, hi)}
    )
    # the partition scheme is invisible to the reader
    assert set(out.columns) == {"event_id", "ts", "user_id", "event_type", "value"}

    expect = ev.filter(
        (F.col("user_id") == u0) & F.col("ts").between(lo, hi)
    )
    got = {r["event_id"] for r in out.collect()}
    want = {r["event_id"] for r in expect.collect()}
    assert got == want and len(want) > 0


def test_partition_pruning_actually_prunes(spark, lake):
    """The injected predicates must reach the scan as PartitionFilters
    and shrink the file set — the whole point of the transform spec."""
    ev = table(spark, SF, "events")
    t0, u0 = ev.agg(F.min("ts"), F.min("user_id")).first()
    lo, hi = t0 + dt.timedelta(days=1), t0 + dt.timedelta(days=2)

    pruned = hidden_scan(
        spark, lake, SPEC, eq={"user_id": u0}, between={"ts": (lo, hi)}
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "event_date" in plan and "user_bucket" in plan

    full = spark.read.parquet(lake)
    n_full = full.select(F.input_file_name()).distinct().count()
    n_pruned = pruned.select(F.input_file_name()).distinct().count()
    assert 0 < n_pruned < n_full / 4  # 2 days x 1 bucket out of days x 8


def test_bucket_is_equality_only(spark, lake):
    """A range over a bucketed source must NOT inject a bucket
    predicate (buckets are not range-monotone) — and must still be
    correct via the re-applied source predicate."""
    ev = table(spark, SF, "events")
    u0, u1 = [
        r[0]
        for r in ev.select("user_id").distinct().orderBy("user_id").limit(2).collect()
    ]
    out = hidden_scan(spark, lake, SPEC, between={"user_id": (u0, u1)})
    plan = out._jdf.queryExecution().executedPlan().toString()
    # user_bucket appears nowhere: not injected, and dropped from output
    assert "user_bucket" not in plan.split("PartitionFilters")[-1].split("]")[0]
    want = ev.filter(F.col("user_id").between(u0, u1)).count()
    assert out.count() == want > 0


def test_spec_validation(spark):
    with pytest.raises(ValueError, match="unknown transform"):
        PartitionField("p", "weeks", "ts")
    with pytest.raises(ValueError, match="requires n"):
        PartitionField("p", "bucket", "user_id")
    df = spark.range(3).withColumn("event_date", F.lit("x"))
    with pytest.raises(ValueError, match="collides"):
        hidden_write(df, "/tmp/never", (PartitionField("event_date", "identity", "id"),))


def test_truncate_and_months_transforms(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, f"cat{i % 3}x{i}", dt.datetime(2024, 1 + i % 3, 5)) for i in range(30)],
        "id long, code string, ts timestamp",
    )
    spec = (
        PartitionField("code4", "truncate", "code", 4),
        PartitionField("month", "months", "ts"),
    )
    path = str(tmp_path / "t")
    hidden_write(df, path, spec)
    out = hidden_scan(
        spark,
        path,
        spec,
        eq={"code": "cat1x1"},
        between={"ts": (dt.datetime(2024, 2, 1), dt.datetime(2024, 2, 28))},
    )
    rows = out.collect()
    assert [r["id"] for r in rows] == [1]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "code4" in plan and "month" in plan


def test_engine_hidden_table_spec_persisted(spark, tmp_path):
    """write_hidden persists the transform spec with the table; a
    FRESH engine (new process analogue) recovers it and prunes."""
    from serverless_datalake_aws_spark.engine import DataLakeEngine

    ev = table(spark, SF, "events").select("event_id", "ts", "user_id")
    lake = DataLakeEngine(spark, str(tmp_path / "lake"))
    lake.write_hidden("events_h", ev, SPEC)

    lake2 = DataLakeEngine(spark, str(tmp_path / "lake"))  # no in-mem state
    t0, u0 = ev.agg(F.min("ts"), F.min("user_id")).first()
    out = lake2.scan_hidden(
        "events_h",
        eq={"user_id": u0},
        between={"ts": (t0, t0 + dt.timedelta(days=2))},
    )
    assert set(out.columns) == {"event_id", "ts", "user_id"}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "user_bucket" in plan
    want = ev.filter(
        (F.col("user_id") == u0)
        & F.col("ts").between(t0, t0 + dt.timedelta(days=2))
    ).count()
    assert out.count() == want > 0


def test_truncate_on_integers_is_floor_to_multiple(spark, tmp_path):
    """Iceberg truncate semantics by type: integers floor to a multiple
    of n (monotone, so BETWEEN injection stays correct) — a substring
    truncate of numerics would prune wrongly (truncate('8') >
    truncate('25'))."""
    df = spark.createDataFrame([(i, i) for i in range(40)], "id long, n long")
    spec = (PartitionField("n8", "truncate", "n", 8),)
    path = str(tmp_path / "t")
    hidden_write(df, path, spec)
    out = hidden_scan(spark, path, spec, between={"n": (8, 25)})
    got = sorted(r["id"] for r in out.collect())
    assert got == list(range(8, 26))  # nothing pruned away
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "n8" in plan  # partition filter injected

    # unsupported truncate types fail loud at write time
    fdf = spark.createDataFrame([(1.5,)], "x double")
    with pytest.raises(ValueError, match="unsupported"):
        hidden_write(fdf, str(tmp_path / "bad"), (PartitionField("t", "truncate", "x", 2),))


def test_append_with_different_spec_rejected(spark, tmp_path):
    from serverless_datalake_aws_spark.engine import DataLakeEngine

    lake = DataLakeEngine(spark, str(tmp_path / "lake"))
    df = spark.createDataFrame([(1, dt.datetime(2024, 1, 1))], "id long, ts timestamp")
    spec1 = (PartitionField("d", "days", "ts"),)
    lake.write_hidden("t", df, spec1)
    with pytest.raises(ValueError, match="mix partition layouts"):
        lake.write_hidden(
            "t", df, (PartitionField("m", "months", "ts"),), mode="append"
        )
    lake.write_hidden("t", df, spec1, mode="append")  # same spec: fine
    assert lake.scan_hidden("t").count() == 2


def test_hidden_spec_recoverable_from_crash_window(spark, tmp_path):
    """Overwrite deletes the in-dir spec with the table dir; a crash
    between the data write and save_spec must leave a READABLE table —
    the spec is staged at a sibling path before the data lands and
    load_spec falls back to it (ADVICE r8 low item)."""
    from pathlib import Path

    from serverless_datalake_aws_spark.engine import DataLakeEngine
    from serverless_datalake_aws_spark.operators.partitioning import (
        load_spec,
    )

    ev = table(spark, SF, "events").select("event_id", "ts", "user_id")
    lake = DataLakeEngine(spark, str(tmp_path / "lake"))
    lake.write_hidden("events_h", ev, SPEC)
    path = Path(tmp_path / "lake" / "hidden" / "events_h")
    # steady state: spec in-dir, no staged sibling left behind
    assert (path / "_partition_spec.json").exists()
    assert not Path(str(path) + ".spec.staged").exists()

    # simulate the crash window: staged sibling present, in-dir spec
    # destroyed by the overwrite that never reached save_spec
    import shutil as _sh

    spec_json = (path / "_partition_spec.json").read_text()
    Path(str(path) + ".spec.staged").write_text(spec_json)
    (path / "_partition_spec.json").unlink()
    assert load_spec(str(path)) == SPEC  # fallback, not FileNotFoundError
    assert lake.scan_hidden("events_h").count() == ev.count()
