"""The s3a/Glue conf path, exercised as far as the sandbox allows
(VERDICT r2 task 7): no network I/O, but the session really carries the
hadoop-aws committer + dynamic-overwrite conf SCALE.md documents when
built with a remote lake root, and the engine accepts the root."""

from __future__ import annotations

from serverless_datalake_aws_spark.engine import DataLakeEngine
from serverless_datalake_aws_spark.session import get_session, object_store_conf


def test_local_root_adds_nothing():
    assert object_store_conf("/data/lake") == {}
    assert object_store_conf("relative/path") == {}


def test_s3a_conf_contents():
    conf = object_store_conf("s3a://my-bucket/lake")
    assert conf["spark.sql.sources.partitionOverwriteMode"] == "dynamic"
    assert conf["spark.hadoop.fs.s3a.committer.name"] == "magic"
    assert conf["spark.hadoop.fs.s3a.committer.magic.enabled"] == "true"
    assert conf["spark.sql.sources.commitProtocolClass"].endswith(
        "PathOutputCommitProtocol"
    )
    # non-S3 remote stores get the overwrite mode but not s3a committers
    gs = object_store_conf("gs://bucket/lake")
    assert gs["spark.sql.sources.partitionOverwriteMode"] == "dynamic"
    assert "spark.hadoop.fs.s3a.committer.name" not in gs


def test_glue_catalog_conf():
    conf = object_store_conf("s3a://bucket/lake", glue=True)
    assert conf["spark.sql.catalogImplementation"] == "hive"
    assert conf["spark.hadoop.hive.metastore.client.factory.class"].endswith(
        "AWSGlueDataCatalogHiveClientFactory"
    )


def test_remote_root_conf_lands_on_live_session(spark):
    """get_session with an s3a root must apply the conf to the running
    context even when getOrCreate reuses a live session — the hadoop
    conf drives S3A filesystem instantiation, the SQL conf drives the
    K7 dynamic-overwrite write path."""
    s = get_session(app_name="s3a-conf", lake_root="s3a://my-bucket/lake")
    hconf = s.sparkContext._jsc.hadoopConfiguration()
    assert hconf.get("fs.s3a.committer.name") == "magic"
    assert hconf.get("fs.s3a.committer.magic.enabled") == "true"
    assert hconf.get("fs.s3a.connection.maximum") == "96"
    assert s.conf.get("spark.sql.sources.partitionOverwriteMode") == "dynamic"
    # engine accepts the same root and routes K7 through the
    # dynamic-overwrite branch (is_remote), not the local dir swap
    eng = DataLakeEngine(s, "s3a://my-bucket/lake")
    assert eng.is_remote
    assert eng.meta_path == "s3a://my-bucket/lake/_meta"
