"""Catalog persistence: saveAsTable + ANALYZE stats + bucketed joins
(S9 — the Glue-crawler replacement, and the SCALE.md bucketing path)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from serverless_datalake_aws_spark.catalog import save_table, table
from tests.conftest import SF_DIR


@pytest.fixture(autouse=True)
def _cleanup(spark):
    import shutil
    from pathlib import Path

    def _drop():
        for t in ("t_orders", "t_lineitem_b", "t_orders_b"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
            # a dropped table's stray warehouse dir blocks re-creation
            loc = Path("spark-warehouse") / t
            if loc.exists():
                shutil.rmtree(loc)

    _drop()
    yield
    _drop()


def test_save_table_registers_with_stats(spark):
    orders = table(spark, SF_DIR, "orders")
    save_table(spark, orders, "t_orders")
    assert spark.table("t_orders").count() == orders.count()
    desc = spark.sql("DESCRIBE EXTENDED t_orders").collect()
    stats = [r for r in desc if r["col_name"] == "Statistics"]
    assert stats and "rows" in stats[0]["data_type"]
    col_desc = spark.sql(
        "DESCRIBE EXTENDED t_orders o_totalprice"
    ).collect()
    info = {r["info_name"]: r["info_value"] for r in col_desc}
    assert info.get("distinct_count") not in (None, "NULL")


def test_bucketed_join_avoids_shuffle(spark):
    li = table(spark, SF_DIR, "lineitem")
    orders = table(spark, SF_DIR, "orders")
    save_table(spark, li, "t_lineitem_b", bucket_by=(4, "l_orderkey"))
    save_table(spark, orders, "t_orders_b", bucket_by=(4, "o_orderkey"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the SMJ path (stats would broadcast these tiny tables —
        # the bucketing claim is about the big-big case)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table("t_lineitem_b").join(
            spark.table("t_orders_b"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = j._sc._jvm.PythonSQLUtils.explainString(
            j._jdf.queryExecution(), "formatted"
        )
        # co-bucketed join: no Exchange (shuffle) feeding the SortMergeJoin
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
        assert j.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_crawl_discovers_foreign_datasets(spark, tmp_path):
    """Glue-crawler parity (VERDICT r4 item 2): a csv+ndjson+parquet
    tree dropped into raw/ by an EXTERNAL writer — no engine-side write
    ever happened — must become spark.table-queryable after crawl()."""
    import json

    from serverless_datalake_aws_spark.catalog import crawl

    raw = tmp_path / "lake" / "raw"
    # csv dataset dir
    (raw / "clicks").mkdir(parents=True)
    (raw / "clicks" / "a.csv").write_text("user,n\nu1,3\nu2,5\n")
    (raw / "clicks" / "b.csv").write_text("user,n\nu3,7\n")
    # ndjson dataset dir
    (raw / "logs").mkdir()
    with open(raw / "logs" / "x.ndjson", "w") as f:
        for i in range(4):
            f.write(json.dumps({"id": i, "msg": f"m{i}"}) + "\n")
    # parquet dataset, hive-partitioned by an external writer
    pq_dir = raw / "sales"
    spark.range(10).selectExpr(
        "id", "id % 2 as region"
    ).write.partitionBy("region").parquet(str(pq_dir))
    # unknown-extension junk must be skipped, not fail the crawl
    (raw / "junk").mkdir()
    (raw / "junk" / "blob.xyz").write_bytes(b"\x00\x01")

    report = crawl(spark, tmp_path / "lake")
    names = {d.name: d for d in report}
    assert set(names) == {"raw_clicks", "raw_logs", "raw_sales"}
    assert names["raw_clicks"].fmt == "csv" and names["raw_clicks"].n_files == 2
    assert names["raw_logs"].fmt == "ndjson"
    assert names["raw_sales"].fmt == "parquet"
    assert all(d.size_bytes > 0 for d in report)

    assert spark.table("raw_clicks").count() == 3
    assert {r["user"] for r in spark.table("raw_clicks").collect()} == {"u1", "u2", "u3"}
    assert spark.table("raw_logs").count() == 4
    # partition column survives discovery
    sales = spark.table("raw_sales")
    assert "region" in sales.columns
    assert sales.count() == 10
    # re-crawl is idempotent
    report2 = crawl(spark, tmp_path / "lake")
    assert {d.name for d in report2} == set(names)


def test_crawl_loose_file_and_mixed_formats(spark, tmp_path):
    from serverless_datalake_aws_spark.catalog import crawl

    lake = tmp_path / "lake2"
    lake.mkdir()
    (lake / "lookup.csv").write_text("k,v\n1,a\n2,b\n")
    mixed = lake / "mixed"
    mixed.mkdir()
    (mixed / "one.csv").write_text("k\n1\n")
    with open(mixed / "two.ndjson", "w") as f:
        f.write('{"k": 2}\n')

    report = crawl(spark, lake)
    names = {d.name for d in report}
    assert names == {"lookup", "mixed_csv", "mixed_ndjson"}
    assert spark.table("lookup").count() == 2
    assert spark.table("mixed_csv").count() == 1
    assert spark.table("mixed_ndjson").count() == 1


def test_crawl_missing_root_raises(spark, tmp_path):
    from serverless_datalake_aws_spark.catalog import crawl

    with pytest.raises(ValueError, match="lake root"):
        crawl(spark, tmp_path / "nope")


def test_engine_crawl_foreign_drop(spark, tmp_path):
    from serverless_datalake_aws_spark.engine import DataLakeEngine

    engine = DataLakeEngine(spark, tmp_path / "lake")
    foreign = tmp_path / "lake" / "raw" / "foreign"
    foreign.mkdir(parents=True)
    (foreign / "x.csv").write_text("a,b\n1,2\n3,4\n")
    report = engine.crawl("raw")
    assert any(d.name == "foreign" and d.fmt == "csv" for d in report)
    assert spark.table("foreign").count() == 2


def test_crawl_nested_subdir_files_not_missed(spark, tmp_path):
    """A dataset dir holding files both directly and in a non-partition
    subdir must register ALL files (Spark's dir reader won't recurse —
    crawl must pass the explicit list)."""
    from serverless_datalake_aws_spark.catalog import crawl

    lake = tmp_path / "lake3"
    ds = lake / "deep"
    (ds / "sub").mkdir(parents=True)
    (ds / "a.csv").write_text("k\n1\n2\n")
    (ds / "sub" / "b.csv").write_text("k\n3\n")
    report = crawl(spark, lake)
    assert {d.name for d in report} == {"deep"}
    assert spark.table("deep").count() == 3


def test_crawl_merges_evolved_schemas(spark, tmp_path):
    """Foreign writers drift schemas; crawl must surface the UNION of
    columns across files (Glue crawler behavior), not one random
    footer's view."""
    from serverless_datalake_aws_spark.catalog import crawl

    import pyarrow as pa
    import pyarrow.parquet as pq

    lake = tmp_path / "lake4"
    ds = lake / "evolving"
    ds.mkdir(parents=True)
    pq.write_table(
        pa.table({"id": pa.array([1], pa.int64()), "name": pa.array(["a"])}),
        ds / "old.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "id": pa.array([2], pa.int64()),
                "name": pa.array(["b"]),
                "score": pa.array([9.5], pa.float64()),
            }
        ),
        ds / "new.parquet",
    )
    crawl(spark, lake)
    t = spark.table("evolving")
    assert set(t.columns) == {"id", "name", "score"}
    rows = {r["id"]: (r["name"], r["score"]) for r in t.collect()}
    assert rows == {1: ("a", None), 2: ("b", 9.5)}


def test_scan_cache_invalidates_on_regeneration(spark, tmp_path):
    """ADVICE r10: the per-session scan cache must not serve a stale
    plan after a fixture dir is regenerated in-session. The key carries
    the dataset path's mtime, so a rewrite (new dir contents) misses."""
    import os
    import shutil
    import time

    from serverless_datalake_aws_spark.catalog import clear_scan_cache

    sf = tmp_path / "sf"
    sf.mkdir()
    ds = sf / "orders.parquet"
    spark.range(3).toDF("o_orderkey").write.parquet(str(ds))
    first = table(spark, str(sf), "orders")
    assert first.count() == 3
    assert table(spark, str(sf), "orders") is first  # cache hit

    # regenerate: different row count AND schema
    shutil.rmtree(ds)
    spark.range(5).selectExpr(
        "id as o_orderkey", "id * 2 as o_custkey"
    ).write.parquet(str(ds))
    # dir mtime granularity can be coarse; force a distinct mtime like a
    # real regeneration minutes later would have
    t = time.time() + 2
    os.utime(ds, (t, t))
    fresh = table(spark, str(sf), "orders")
    assert fresh is not first
    assert fresh.count() == 5
    assert set(fresh.columns) == {"o_orderkey", "o_custkey"}

    # explicit escape hatch drops the entry even without an mtime bump
    again = table(spark, str(sf), "orders")
    assert again is fresh
    clear_scan_cache(spark)
    assert table(spark, str(sf), "orders") is not fresh


def test_ts_micros_closure_ships_by_value(tmp_path):
    """The shared exact-micros converter must unpickle in a process
    where this package is NOT importable — collect_file_stats' worker
    closures depend on that (the external harness may run Python
    workers from a cwd without the repo on sys.path)."""
    import datetime as dt
    import pathlib
    import subprocess
    import sys

    import cloudpickle

    import serverless_datalake_aws_spark
    from serverless_datalake_aws_spark.sources.stats import _ts_micros

    # the dir whose presence on sys.path makes the package importable —
    # derived, not hardcoded, so the test keeps its point in any checkout
    repo_dir = str(
        pathlib.Path(serverless_datalake_aws_spark.__file__).resolve().parents[1]
    )
    pkl = tmp_path / "tsm.pkl"
    pkl.write_bytes(cloudpickle.dumps(_ts_micros))
    want = _ts_micros(dt.datetime(2024, 3, 1, 12, 0, 0, 123457))
    got = subprocess.run(
        [
            sys.executable,
            "-c",
            "import pickle, datetime, sys; "
            f"sys.path = [p for p in sys.path if p not in ('', {repo_dir!r})]; "
            "import importlib.util; "
            "assert importlib.util.find_spec('serverless_datalake_aws_spark') "
            "is None, 'package still importable - test would be vacuous'; "
            f"f = pickle.load(open({str(pkl)!r}, 'rb')); "
            "print(f(datetime.datetime(2024, 3, 1, 12, 0, 0, 123457)))",
        ],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),
        check=True,
    ).stdout.strip()
    assert int(got) == want == 1709294400123457
