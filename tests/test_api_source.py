"""Python-DataSource API ingest seam (sources/api_source.py): batch
partition fan-out, streaming offset walk, deterministic replay, and the
pluggable fetch seam."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F
from pyspark.sql.datasource import InputPartition

from serverless_datalake_aws_spark.sources import api_source
from serverless_datalake_aws_spark.sources.api_source import (
    ApiStreamReader,
    register_api_source,
)


def test_batch_read_one_partition_per_page(spark):
    register_api_source(spark)
    df = (
        spark.read.format("datalake_api")
        .option("pages", 5)
        .option("rows_per_page", 20)
        .load()
    )
    assert df.rdd.getNumPartitions() == 5
    assert df.count() == 100
    # page column tracks the partition that fetched the row
    per_page = {r["page"]: r["n"] for r in df.groupBy("page").agg(F.count("*").alias("n")).collect()}
    assert per_page == {p: 20 for p in range(5)}


def test_batch_rows_are_deterministic(spark):
    register_api_source(spark)
    a = (
        spark.read.format("datalake_api").option("pages", 3).load()
    ).collect()
    b = (
        spark.read.format("datalake_api").option("pages", 3).load()
    ).collect()
    assert sorted(a) == sorted(b)


def test_stream_reader_offset_walk():
    """The cursor reports pages_per_batch new pages per poll, caps at
    the endpoint end, and partitions() covers exactly [start, end)."""
    r = ApiStreamReader({"pages": 7, "pages_per_batch": 3})
    assert r.initialOffset() == {"page": 0}
    assert r.latestOffset() == {"page": 3}
    assert r.latestOffset() == {"page": 6}
    assert r.latestOffset() == {"page": 7}  # capped
    assert r.latestOffset() == {"page": 7}  # stable once drained
    parts = r.partitions({"page": 3}, {"page": 6})
    assert [p.value for p in parts] == [3, 4, 5]


def test_stream_replay_is_deterministic():
    """Re-reading the same partition yields identical rows — the
    property that makes a checkpointed batch retry exactly-once."""
    r = ApiStreamReader({"pages": 4, "rows_per_page": 10})
    first = list(r.read(InputPartition(2)))
    again = list(r.read(InputPartition(2)))
    assert first == again
    assert len(first) == 10
    assert [t[0] for t in first] == list(range(20, 30))


def test_stream_multi_batch_progression(spark):
    """A processingTime run over the 10-page endpoint must take
    multiple micro-batches (2 pages per poll; >= 3 non-empty batches
    even if the planner merges adjacent polls) — the offset log
    genuinely walks."""
    import time

    register_api_source(spark)
    name = f"api_{uuid.uuid4().hex[:8]}"
    q = (
        spark.readStream.format("datalake_api")
        .option("pages", 10)
        .option("rows_per_page", 10)
        .option("pages_per_batch", 2)
        .load()
        .groupBy()
        .agg(F.count("*").alias("n"), F.max("id").alias("max_id"))
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.monotonic() + 120
        while time.monotonic() < deadline:
            rows = spark.table(name).collect()
            if rows and rows[0]["n"] == 100:
                break
            time.sleep(0.2)
        else:
            raise TimeoutError("stream never drained 100 rows")
        nonempty = [
            p for p in q.recentProgress if p["numInputRows"] > 0
        ]
        assert len(nonempty) >= 3, [p["numInputRows"] for p in q.recentProgress]
    finally:
        q.stop()
    assert spark.table(name).collect()[0]["max_id"] == 99


def test_fetch_page_is_a_pluggable_seam(spark, monkeypatch):
    """A deployment swaps fetch_page for an HTTP client; the Spark-side
    machinery must pick the override up (by-value pickling ships the
    module state to workers)."""
    def fake(page, rows_per_page):
        return [
            (page * rows_per_page + i, "x", "view", 1.0, page)
            for i in range(rows_per_page)
        ]

    monkeypatch.setattr(api_source, "fetch_page", fake)
    register_api_source(spark)
    df = (
        spark.read.format("datalake_api")
        .option("pages", 2)
        .option("rows_per_page", 3)
        .load()
    )
    got = df.select("name").distinct().collect()
    assert [r["name"] for r in got] == ["x"]
    assert df.count() == 6


def test_stream_restart_does_not_reingest(spark, tmp_path):
    """A restarted query builds a FRESH reader (driver cursor 0) while
    Spark recovers offsets from the checkpoint; the cursor must fold
    the recovered offsets back in so latestOffset can never regress
    behind the log and re-ingest committed pages."""
    register_api_source(spark)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def run_once():
        q = (
            spark.readStream.format("datalake_api")
            .option("pages", 6)
            .option("rows_per_page", 10)
            .option("pages_per_batch", 2)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)

    # each availableNow run snapshots latestOffset once (one 2-page
    # batch); every run after the first is a RESTART from checkpoint
    # with a fresh reader whose cursor must recover from the log
    for _ in range(3):
        run_once()
    df = spark.read.parquet(out)
    assert df.count() == 60  # all 6 pages, each exactly once
    assert df.select("id").distinct().count() == 60
    run_once()  # no new pages exist: nothing re-ingested
    assert spark.read.parquet(out).count() == 60


def test_stream_reader_cursor_monotone_after_recovery():
    """Unit twin of the restart test: recovered offsets fold into the
    fresh reader's cursor."""
    r = ApiStreamReader({"pages": 10, "rows_per_page": 5})
    r.partitions({"page": 6}, {"page": 8})  # replay from checkpoint
    assert r.latestOffset() == {"page": 10}  # 8 + 2, never back to 2
    r2 = ApiStreamReader({"pages": 10, "rows_per_page": 5})
    r2.commit({"page": 7})
    assert r2.latestOffset() == {"page": 9}
