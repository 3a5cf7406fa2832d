"""engine.optimize_zone: Delta-style OPTIMIZE [ZORDER BY] over a zone —
bin-packing, hive-partition preservation, z-order clustering feeding
the stats index so scan_pruned actually skips files."""

from __future__ import annotations

from pathlib import Path

import pytest
from pyspark.sql import functions as F

from serverless_datalake_aws_spark.engine import DataLakeEngine


@pytest.fixture()
def engine(spark, tmp_path):
    return DataLakeEngine(spark, str(tmp_path / "lake"))


def _scattered(spark, n=20_000, files=64):
    """Many small files, rows hash-scattered so no column is clustered."""
    return (
        spark.range(0, n)
        .select(
            "id",
            (F.col("id") % 997).alias("a"),
            (F.pmod(F.col("id") * 2654435761, F.lit(100_000))).alias("b"),
        )
        .repartition(files)
    )


def test_optimize_compacts_small_files(spark, engine):
    _scattered(spark).write.parquet(f"{engine.zone('raw')}/records")
    res = engine.optimize_zone("raw", analyze=False)
    assert res["files_before"] == 64
    assert res["files_after"] < 8
    assert res["rows"] == 20_000
    assert spark.read.parquet(f"{engine.zone('raw')}/records").count() == 20_000


def test_optimize_zorder_enables_skipping(spark, engine):
    _scattered(spark).write.parquet(f"{engine.zone('raw')}/records")
    # before: a selective range on `a` cannot skip (every file spans it)
    engine.analyze("raw")
    before = engine.scan_pruned("raw", "a", 100, 110)
    n_before = len(before.inputFiles())
    cnt_before = before.count()  # materialize: optimize replaces the files
    res = engine.optimize_zone(
        "raw", zorder_by=("a", "b"), num_files=8, analyze=True
    )
    assert res["files_after"] >= 2
    after = engine.scan_pruned("raw", "a", 100, 110)
    # same answer, fewer files opened
    assert after.count() == cnt_before > 0
    assert len(after.inputFiles()) < max(n_before, res["files_after"])


def test_optimize_preserves_hive_partitions(spark, engine):
    df = spark.range(0, 2_000).select(
        "id",
        (F.col("id") % 3).cast("string").alias("data_type"),
        F.lit("2026-01-01").alias("ingest_date"),
        (F.col("id") % 100).alias("a"),
        (F.col("id") % 7).alias("b"),
    )
    root = f"{engine.zone('processed')}/records"
    df.repartition(16).write.partitionBy("data_type", "ingest_date").parquet(root)
    res = engine.optimize_zone(
        "processed", zorder_by=("a", "b"), analyze=False
    )
    assert res["rows"] == 2_000
    # hive dirs survive
    parts = {p.name for p in Path(root).iterdir() if p.is_dir()}
    assert parts == {"data_type=0", "data_type=1", "data_type=2"}
    got = spark.read.parquet(root)
    assert got.count() == 2_000
    assert set(got.columns) == {"id", "data_type", "ingest_date", "a", "b"}


def test_optimize_empty_zone_noop(engine):
    assert engine.optimize_zone("curated", analyze=False) == {
        "rows": 0,
        "files_before": 0,
        "files_after": 0,
    }


def test_zorder_write_still_works(spark, tmp_path):
    """The attach_zvalue refactor must not change zorder_write."""
    from serverless_datalake_aws_spark.operators.layout import zorder_write

    df = _scattered(spark, n=5_000, files=8)
    out = str(tmp_path / "z")
    zorder_write(df, out, ("a", "b"), bits=8, num_files=4)
    back = spark.read.parquet(out)
    assert back.count() == 5_000
    assert set(back.columns) == {"id", "a", "b"}


def test_zorder_rank_tolerates_nan(spark, tmp_path):
    """A single NaN in a fractional cluster column must not abort the
    OPTIMIZE rewrite (Bucketizer handleInvalid='error' would); NaN
    routes to cell 0 with the NULLs."""
    from serverless_datalake_aws_spark.operators.layout import attach_zvalue

    df = spark.createDataFrame(
        [(i, float(i) if i != 7 else float("nan")) for i in range(50)]
        + [(99, None)],
        "id long, price double",
    )
    out = attach_zvalue(df, ("id", "price"), bits=4)
    assert out.count() == 51
    nan_zv = out.filter("id = 7").select("_zv").first()[0]
    null_zv = out.filter("id = 99").select("_zv").first()[0]
    assert nan_zv is not None and null_zv is not None
