"""engine.maintain(): the policy-driven self-maintenance loop
(auto-compaction + stats refresh + version vacuum). Contract: acts
only where layout/indexes have degraded, and a second run is a no-op."""

from __future__ import annotations

import pytest

from serverless_datalake_aws_spark.engine import DataLakeEngine
from serverless_datalake_aws_spark.sources.stats import list_parquet_files


@pytest.fixture()
def lake(spark, tmp_path):
    return DataLakeEngine(spark, str(tmp_path / "lake"))


def _degrade(lake, n_batches=20):
    for i in range(n_batches):
        lake.ingest_batch([{"n": i, "pad": "x" * 64}], data_type="sales")


def test_maintain_compacts_small_files_then_noop(lake):
    _degrade(lake)
    before = len(list_parquet_files(lake.zone("raw") + "/records"))
    assert before >= 20
    report = lake.maintain(min_files_to_compact=8)
    assert report["compacted"]["raw"]["files_before"] == before
    after = len(list_parquet_files(lake.zone("raw") + "/records"))
    assert after == report["compacted"]["raw"]["files_after"] < before
    assert lake.records("raw").count() == 20  # rewrite loses nothing

    second = lake.maintain(min_files_to_compact=8)
    assert second["compacted"] == {}  # healthy layout -> untouched


def test_maintain_refreshes_stale_stats_only(lake):
    _degrade(lake, 4)
    lake.analyze("raw")
    # fresh index: nothing to do
    r0 = lake.maintain(min_files_to_compact=999)
    assert "raw" not in r0["stats_refreshed"]
    # new ingest invalidates the indexed file set
    lake.ingest_batch([{"n": 99}], data_type="logs")
    r1 = lake.maintain(min_files_to_compact=999)
    assert r1["stats_refreshed"]["raw"] >= 5
    indexed = {r["file"] for r in lake.file_stats("raw").select("file").collect()}
    assert indexed == set(list_parquet_files(lake.zone("raw")))


def test_maintain_vacuums_versioned_tables(lake, spark):
    for v in range(3):
        lake.publish_versioned("dim", spark.range(v + 1))
    report = lake.maintain(versioned_keep=1)
    # keep=1 noncurrent: current v3 + v2 survive, v1 is pruned
    assert report["vacuumed"]["dim"] == [1]
    assert lake.read_versioned("dim").count() == 3  # current survives
    # keep=None leaves versions alone
    lake.publish_versioned("dim", spark.range(9))
    assert lake.maintain()["vacuumed"] == {}


def test_maintain_compaction_invalidates_then_refreshes_stats(lake):
    """Ordering inside one call: compaction rewrites the file set, and
    the SAME maintain() run must leave a fresh index behind."""
    _degrade(lake)
    lake.analyze("raw")
    report = lake.maintain(min_files_to_compact=8)
    assert "raw" in report["compacted"]
    assert report["stats_refreshed"]["raw"] > 0
    indexed = {r["file"] for r in lake.file_stats("raw").select("file").collect()}
    assert indexed == set(list_parquet_files(lake.zone("raw")))


def test_maintain_compacts_metrics_feeds(lake, spark):
    """Telemetry feeds (one small parquet file per flush) fall under
    the same compaction policy."""
    rec = lake.enable_stream_metrics()
    import datetime as dt

    for i in range(12):
        rec._buffer.append(
            {
                "ts": dt.datetime.now(dt.timezone.utc),
                "query_id": "q",
                "run_id": "r",
                "name": None,
                "batch_id": i,
                "num_input_rows": 1,
                "input_rows_per_s": 1.0,
                "process_rows_per_s": 1.0,
                "trigger_ms": 1,
                "observed": "{}",
            }
        )
        rec.flush()
    report = lake.maintain(min_files_to_compact=8)
    assert report["feeds_compacted"]["_stream_metrics"]["files_before"] == 12
    assert lake.stream_metrics().count() == 12  # nothing lost
    lake.disable_stream_metrics()
