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
