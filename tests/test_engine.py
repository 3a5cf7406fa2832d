"""End-to-end engine pipeline tests — the reference's smoke flow
(SURVEY §5.2 #2): ingest → query (all four types) → process → search."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from serverless_datalake_aws_spark.engine import DataLakeEngine


@pytest.fixture()
def engine(spark, tmp_path):
    return DataLakeEngine(spark, tmp_path / "lake")


SAMPLES = [
    {"product": "Laptop", "quantity": 2, "price": 999.5, "region": "North"},
    {"product": "Mouse", "quantity": 5, "price": 19.9, "region": "South"},
    {"product": "Laptop", "quantity": 1, "price": 1099.0, "region": "North"},
]


def test_ingest_and_point_lookup(engine):
    ids = engine.ingest_batch(SAMPLES, data_type="sales", tags=["test", "sales"])
    assert len(ids) == 3
    row = engine.query(type="id", id=ids[0]).first()
    assert row is not None
    assert row["data_type"] == "sales"
    assert row["status"] == "ingested"
    assert row["tags"] == ["test", "sales"]
    assert row["size_bytes"] > 0


def test_metadata_search_conjunction(engine):
    engine.ingest_batch(SAMPLES, data_type="sales", owner="alice")
    engine.ingest_batch([{"cpu": 0.9}], data_type="metrics", owner="bob")
    hits = engine.query(type="metadata", data_type="sales", owner="alice")
    assert hits.count() == 3
    assert engine.query(type="metadata", data_type="metrics").count() == 1
    # unfiltered search keeps the reference's Limit=20 default
    assert engine.query(type="metadata").count() == 4


def test_metadata_search_tags(engine):
    engine.ingest_batch(SAMPLES[:1], data_type="sales", tags=["gold", "eu"])
    engine.ingest_batch(SAMPLES[1:], data_type="sales", tags=["gold"])
    assert engine.search_metadata(tags=["gold"]).count() == 3
    assert engine.search_metadata(tags=["gold", "eu"]).count() == 1
    assert engine.search_metadata(tags=["none"]).count() == 0


def test_content_fetch_inner_join_semantics(engine):
    ids = engine.ingest_batch(SAMPLES, data_type="sales")
    content = engine.query(type="content", id=ids[1]).collect()
    assert len(content) == 1
    assert '"Mouse"' in content[0]["payload"]
    # missing id → empty result (the reference returns a 404-shaped miss)
    assert engine.query(type="content", id="nope").count() == 0


def test_sql_surface(engine, spark):
    engine.ingest_batch(SAMPLES, data_type="sales")
    engine.register_table("raw_records", engine.records("raw"))
    out = engine.query(
        type="sql",
        query="""
            SELECT get_json_object(payload, '$.region') AS region, count(*) AS n
            FROM raw_records GROUP BY 1 ORDER BY 1
        """,
    ).collect()
    assert [(r["region"], r["n"]) for r in out] == [("North", 2), ("South", 1)]


def test_process_promotes_and_indexes(engine):
    ids = engine.ingest_batch(SAMPLES, data_type="sales")
    processed = engine.process()
    assert processed.count() == 3
    assert "processed_timestamp" in processed.columns
    # metadata flipped to indexed (K7 upsert)
    meta = engine.meta()
    assert meta.filter(F.col("indexed")).count() == 3
    assert meta.filter(F.col("indexed_at").isNull()).count() == 0
    # search index has tokens for each record (K8)
    hits = engine.search(term="laptop")
    assert hits.count() == 2
    assert set(r["id"] for r in hits.collect()) <= set(ids)


def test_process_transform_hook(engine):
    engine.ingest_batch(SAMPLES, data_type="sales")
    processed = engine.process(
        transform=lambda df: df.withColumn(
            "price_band",
            F.when(
                F.get_json_object("payload", "$.price").cast("double") > 100, "high"
            ).otherwise("low"),
        )
    )
    bands = {r["price_band"] for r in processed.select("price_band").collect()}
    assert bands == {"high", "low"}


def test_search_match_all_and_type_filter(engine):
    engine.ingest_batch(SAMPLES, data_type="sales")
    engine.ingest_batch([{"cpu": 0.5, "laptop": False}], data_type="metrics")
    engine.process()
    all_idx = engine.search()
    assert all_idx.count() > 0
    sales_only = engine.search(term="laptop", data_type="sales")
    assert sales_only.count() == 2
    assert engine.search(term="laptop").count() == 3


def test_process_stream_exactly_once(engine, spark):
    engine.ingest_batch(SAMPLES, data_type="sales")
    engine.process_stream()
    out = f"{engine.zone('processed')}/records_stream"
    assert spark.read.parquet(out).count() == 3
    # drain again with no new data: checkpoint prevents duplicates
    engine.process_stream()
    assert spark.read.parquet(out).count() == 3
    # new ingest → only the new rows land
    engine.ingest_batch([{"product": "Cam", "quantity": 1}], data_type="sales")
    engine.process_stream()
    assert spark.read.parquet(out).count() == 4


def test_submit_sql_execution_id_flow(engine):
    engine.ingest_batch(SAMPLES, data_type="sales")
    engine.register_table("raw_records", engine.records("raw"))
    exec_id = engine.submit_sql(
        "SELECT count(*) AS n FROM raw_records"
    )
    assert isinstance(exec_id, str) and len(exec_id) == 36
    assert engine.get_query_results(exec_id).first()["n"] == 3


def test_index_incremental_only_new(engine, spark):
    ids1 = engine.ingest_batch(SAMPLES[:2], data_type="sales")
    assert engine.index_incremental() == 2
    idx1 = engine.search_index().select("id").distinct().count()
    assert idx1 == 2
    # nothing pending → no-op
    assert engine.index_incremental() == 0
    # new record → only it gets indexed (append, not rebuild)
    engine.ingest_batch([{"product": "Webcam", "quantity": 9}], data_type="sales")
    assert engine.index_incremental() == 1
    assert engine.search_index().select("id").distinct().count() == 3
    assert engine.search(term="webcam").count() == 1
    assert set(r["id"] for r in engine.search(term="laptop").collect()) <= set(ids1)


def test_curate_gold_zone(engine):
    engine.ingest_batch(SAMPLES, data_type="sales")
    engine.ingest_batch([{"cpu": 0.5}], data_type="metrics")
    engine.process()
    gold = engine.curate()
    rows = {r["data_type"]: r for r in gold.collect()}
    assert rows["sales"]["n_records"] == 3
    assert rows["metrics"]["n_records"] == 1
    assert rows["sales"]["total_bytes"] > 0


def test_query_unknown_type_raises(engine):
    with pytest.raises(ValueError, match="unknown query type"):
        engine.query(type="graphql", q="{}")
