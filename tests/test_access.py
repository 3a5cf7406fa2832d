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


def test_sql_cannot_reach_catalog_or_global_temp(lake, spark):
    """newSession() shares the external catalog and global_temp with
    the owner — the analyzed-plan walk must reject relations resolved
    through qualified names (round-6 self-review finding), including
    when smuggled into a CTE, a subquery expression, or a join arm."""
    from serverless_datalake_aws_spark.catalog import save_table

    save_table(spark, lake.records("processed").select("id"), "acl_perm_tbl")
    spark.sql(
        "CREATE OR REPLACE GLOBAL TEMPORARY VIEW acl_gt AS SELECT 42 AS x"
    )
    try:
        lake.grant("frank", "processed", cols=["id"])
        frank = lake.as_principal("frank")
        for q in (
            "SELECT * FROM acl_perm_tbl",
            "SELECT * FROM default.acl_perm_tbl",
            "SELECT * FROM global_temp.acl_gt",
            "WITH c AS (SELECT * FROM acl_perm_tbl) SELECT * FROM c",
            "SELECT (SELECT count(*) FROM acl_perm_tbl) AS n",
            "SELECT * FROM processed JOIN acl_perm_tbl USING (id)",
        ):
            with pytest.raises(PermissionError):
                frank.sql(q).collect()
        # the granted view, CTEs over it, and plain aliases still work
        assert (
            frank.sql(
                "WITH c AS (SELECT id FROM processed) "
                "SELECT count(*) AS n FROM c t"
            ).collect()[0]["n"]
            == 7
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS acl_perm_tbl")
        spark.sql("DROP VIEW IF EXISTS global_temp.acl_gt")


def test_principal_names_are_opaque(lake):
    """A principal name may contain ANY character — the nested store
    has no separator to alias one principal into another's namespace
    (round-6 self-review: the flat 'p<sep>ds' keys were aliasable)."""
    weird = "alice␟raw"  # contains the old separator
    lake.grant(weird, "meta")
    assert set(lake.acl.grants_for(weird)) == {"meta"}
    assert lake.acl.grants_for("alice") == {}  # no aliasing
    assert lake.revoke("alice") == 0
    assert set(lake.acl.grants_for(weird)) == {"meta"}  # untouched
    assert lake.revoke(weird) == 1


def test_concurrent_grants_no_lost_update(lake):
    """grant() is read-modify-write over the shared policy doc; the
    mutation lock must keep two concurrent admins from last-writer-
    winning each other's grants."""
    import threading

    def do(principal, ds):
        lake.grant(principal, ds)

    ts = [
        threading.Thread(target=do, args=(f"u{i}", "meta")) for i in range(8)
    ]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=60)
    for i in range(8):
        assert set(lake.acl.grants_for(f"u{i}")) == {"meta"}, i


def test_commands_rejected_before_execution(lake, spark, tmp_path):
    """ADVICE r6 (high): Spark executes command nodes EAGERLY inside
    sql(), so a post-hoc plan check fires only after the side effect.
    The parse gate must reject every command/DDL/DML shape BEFORE
    execution — verified by the absence of the side effect, not just
    the exception."""
    lake.grant("mallory", "processed")
    mallory = lake.as_principal("mallory")

    # a secret sits in global_temp, the round-6 exfiltration vector
    spark.createDataFrame([("classified",)], "secret string").createOrReplaceGlobalTempView(
        "r7_secret"
    )
    target = tmp_path / "exfil"
    spark.sql("DROP TABLE IF EXISTS r7_victim")
    spark.sql(
        f"CREATE TABLE r7_victim USING parquet LOCATION '{tmp_path / 'victim'}' "
        "AS SELECT 1 AS x"
    )
    try:
        for stmt in (
            f"CREATE TABLE exfil USING parquet LOCATION '{target}' "
            "AS SELECT * FROM global_temp.r7_secret",
            "DROP TABLE r7_victim",
            "CREATE OR REPLACE TEMP VIEW v AS SELECT 1",
            "INSERT INTO r7_victim VALUES (2)",
            "SET spark.sql.shuffle.partitions=1",
            "CACHE TABLE c AS SELECT 1",
            "MERGE INTO r7_victim USING r7_victim s ON 1=1 WHEN MATCHED THEN DELETE",
            "DELETE FROM r7_victim WHERE 1=1",
            "UPDATE r7_victim SET x = 0",
            "SHOW TABLES",
        ):
            with pytest.raises(PermissionError, match="plain quer"):
                mallory.sql(stmt)
        # side effects did NOT happen
        assert not target.exists()  # CTAS never wrote the secret
        assert spark.sql("SELECT * FROM r7_victim").count() == 1  # no drop/insert/delete
        # plain queries on the granted view still work
        assert mallory.sql("SELECT count(*) AS n FROM processed").first()["n"] == 7
    finally:
        spark.sql("DROP TABLE IF EXISTS r7_victim")
        spark.catalog.dropGlobalTempView("r7_secret")


def test_remote_root_grants_warn_session_scoped(spark):
    """ADVICE r6 (low): on object-store roots, grants are in-memory
    only — callers must be told instead of silently believing the
    persisted-policy contract."""
    import warnings

    from serverless_datalake_aws_spark.access import AccessController

    acl = AccessController("s3a://bucket/lake")
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        acl.grant("p", "raw")
    assert any("session-scoped" in str(w.message) for w in caught)


def test_column_masks_applied(lake):
    """Unity-Catalog-style data masking: masked columns are VISIBLE but
    transformed — hash is a stable sha2 pseudonym, partial keeps the
    last 4 chars, null erases preserving type, redact is '***'."""
    import hashlib

    lake.grant(
        "mallory",
        "processed",
        masks={"payload": "hash", "id": "partial", "data_type": "redact"},
    )
    rows = lake.as_principal("mallory").records("processed").collect()
    raw = {r["id"]: r for r in lake.records("processed").collect()}
    assert len(rows) == len(raw) > 0
    for r in rows:
        assert set(r.asDict()) == set(next(iter(raw.values())).asDict())
        assert r["data_type"] == "***"
        assert r["id"].endswith(tuple(x[-4:] for x in raw)) and "*" in r["id"]
        assert len(r["payload"]) == 64  # sha2-256 hex
    # hash masks are STABLE pseudonyms: recompute one and match
    some_raw = next(iter(raw.values()))
    expect = hashlib.sha256(some_raw["payload"].encode()).hexdigest()
    assert expect in {r["payload"] for r in rows}


def test_mask_flows_through_sql_and_row_filter_sees_raw(lake):
    lake.grant(
        "carol",
        "processed",
        cols=["id", "data_type", "payload"],
        row_filter="data_type = 'sales'",  # references the RAW value
        masks={"data_type": "hash"},
    )
    carol = lake.as_principal("carol")
    out = carol.sql(
        "SELECT data_type, count(*) AS n FROM processed GROUP BY data_type"
    ).collect()
    # the filter matched 6 raw 'sales' rows even though carol only ever
    # sees the hash; one distinct masked value survives
    assert len(out) == 1 and out[0]["n"] == 6
    assert out[0]["data_type"] != "sales" and len(out[0]["data_type"]) == 64


def test_null_mask_preserves_type(lake):
    lake.grant("dave", "meta", masks={"source": "null"})
    df = lake.as_principal("dave").meta()
    src = dict(df.dtypes)["source"]
    assert src == "string"
    assert all(r["source"] is None for r in df.select("source").collect())
    assert df.count() > 0


def test_mask_validation(lake):
    with pytest.raises(ValueError, match="unknown mask kind"):
        lake.grant("eve", "processed", masks={"payload": "rot13"})
    with pytest.raises(ValueError, match="VISIBLE"):
        lake.grant("eve", "processed", cols=["id"], masks={"payload": "hash"})
    # old persisted grant docs (no masks key) still load
    lake.grant("frank", "processed", cols=["id"])
    assert lake.acl.grants_for("frank")["processed"].masks is None


def test_mask_on_missing_column_fails_closed(lake):
    """A mask naming a column the dataset doesn't have must ERROR at
    resolution, not be silently dropped — a typo'd mask column would
    otherwise leave the intended data unmasked."""
    lake.grant("grace", "processed", masks={"payloda": "hash"})  # typo
    with pytest.raises(ValueError, match="do not exist"):
        lake.as_principal("grace").records("processed")


def test_masked_key_lookups_refused(lake):
    """Keyed lookups on a masked key column error loudly instead of
    returning an always-empty (record-not-found-shaped) result."""
    lake.grant("hank", "meta", masks={"id": "hash"})
    lake.grant("hank", "raw")
    with pytest.raises(PermissionError, match="masked"):
        lake.as_principal("hank").query_by_id("whatever")
    with pytest.raises(PermissionError, match="masked"):
        lake.as_principal("hank").get_content("whatever")
    # unmasked meta id + masked raw id: content fetch still refused
    lake.revoke("hank", "meta")
    lake.grant("hank", "meta")
    lake.grant("hank", "raw", masks={"id": "hash"})
    with pytest.raises(PermissionError, match="masked"):
        lake.as_principal("hank").get_content("whatever")


def test_keyed_lookup_without_key_column_refused(lake):
    """A grant whose column list excludes the id key refuses keyed
    lookups with a POLICY error — not the raw unresolved-column
    AnalysisException the filter/join would otherwise throw."""
    lake.grant("iris", "meta", cols=["data_type"])
    lake.grant("iris", "raw")
    with pytest.raises(PermissionError, match="key column"):
        lake.as_principal("iris").query_by_id("whatever")
    with pytest.raises(PermissionError, match="key column"):
        lake.as_principal("iris").get_content("whatever")
    # raw grant missing id: content fetch refused the same way
    lake.revoke("iris", "meta")
    lake.grant("iris", "meta")
    lake.grant("iris", "raw", cols=["payload"])
    with pytest.raises(PermissionError, match="key column"):
        lake.as_principal("iris").get_content("whatever")
