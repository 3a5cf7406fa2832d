"""Access-control layer (VERDICT r5 item 8): the engine analogue of the
reference's Cognito + IAM gate (terraform main.tf:147-196). A denied
principal must not be able to read an ungranted dataset or column
through ANY engine entry point — records, meta, sql (including
direct-file SQL), query dispatch, search_metadata, get_content,
query_by_id."""

from __future__ import annotations

import pytest
from pyspark.sql.utils import AnalysisException

from serverless_datalake_aws_spark.engine import DataLakeEngine


@pytest.fixture()
def lake(spark, tmp_path):
    engine = DataLakeEngine(spark, str(tmp_path / "lake"))
    engine.ingest_batch(
        [{"n": i, "secret": f"s{i}"} for i in range(6)], data_type="sales"
    )
    engine.ingest_batch([{"n": 9}], data_type="logs")
    engine.process()
    return engine


def test_ungranted_dataset_denied_everywhere(lake):
    alice = lake.as_principal("alice")  # no grants at all
    for call in (
        lambda: alice.records("raw"),
        lambda: alice.records("processed"),
        lambda: alice.meta(),
        lambda: alice.query_by_id("x"),
        lambda: alice.search_metadata(data_type="sales"),
        lambda: alice.get_content("x"),
        lambda: alice.query(type="metadata", data_type="sales"),
        lambda: alice.query(type="content", id="x"),
    ):
        with pytest.raises(PermissionError):
            call()
    # sql: no granted views exist in the principal's session at all
    with pytest.raises(AnalysisException):
        alice.sql("SELECT * FROM processed").collect()


def test_column_and_row_policy_enforced(lake):
    lake.grant(
        "bob",
        "processed",
        cols=["id", "data_type"],
        row_filter="data_type = 'sales'",
    )
    bob = lake.as_principal("bob")
    df = bob.records("processed")
    assert set(df.columns) == {"id", "data_type"}
    assert df.count() == 6  # the logs row is filtered out
    assert {r["data_type"] for r in df.collect()} == {"sales"}
    # ungranted column is unreachable through SQL on the granted view
    with pytest.raises(AnalysisException):
        bob.sql("SELECT payload FROM processed").collect()
    # granted projection works
    assert bob.sql("SELECT count(*) AS n FROM processed").collect()[0]["n"] == 6
    # other datasets stay denied
    with pytest.raises(PermissionError):
        bob.records("raw")
    with pytest.raises(AnalysisException):
        bob.sql("SELECT * FROM raw").collect()


def test_sql_cannot_route_around_views(lake):
    lake.grant("carol", "processed", cols=["id"])
    carol = lake.as_principal("carol")
    path = f"{lake.zone('processed')}/records"
    # direct-file SQL is disabled in the principal's session
    with pytest.raises(AnalysisException):
        carol.sql(f"SELECT * FROM parquet.`{path}`").collect()
    # and temp views registered on the OWNER's session are invisible
    lake.records("processed").createOrReplaceTempView("owner_view")
    with pytest.raises(AnalysisException):
        carol.sql("SELECT * FROM owner_view").collect()
    # the owner's own surface is unaffected by any of this
    assert lake.sql(f"SELECT count(*) AS n FROM parquet.`{path}`").collect()[0][
        "n"
    ] == 7


def test_content_fetch_needs_both_grants(lake):
    some_id = lake.meta().select("id").first()["id"]
    lake.grant("dave", "meta")
    dave = lake.as_principal("dave")
    with pytest.raises(PermissionError):  # meta alone is not enough
        dave.get_content(some_id)
    lake.grant("dave", "raw", cols=["id", "data_type", "payload"])
    got = dave.get_content(some_id)
    assert got.count() == 1
    assert set(got.columns) == {"id", "data_type", "payload"}


def test_revoke_and_persistence(lake, spark):
    lake.grant("erin", "meta")
    erin = lake.as_principal("erin")
    assert erin.meta().count() == 7
    # grants survive an engine restart (persisted policy doc)
    engine2 = DataLakeEngine(spark, lake.root)
    assert engine2.as_principal("erin").meta().count() == 7
    assert engine2.revoke("erin") == 1
    with pytest.raises(PermissionError):
        engine2.as_principal("erin").meta()
    # and the revoke is visible through the FIRST engine too
    with pytest.raises(PermissionError):
        erin.meta()
