"""Tests for upsert (MERGE / SCD2) and skew utilities."""

from __future__ import annotations

from pyspark.sql import functions as F

from serverless_datalake_aws_spark.operators.skew import salted_join, skew_stats
from serverless_datalake_aws_spark.operators.upsert import merge_into, scd2_apply


def test_merge_into_upserts_and_appends(spark, tmp_path):
    path = str(tmp_path / "t")
    spark.createDataFrame(
        [("a", 1), ("b", 2), ("c", 3)], "k string, v int"
    ).write.parquet(path)
    updates = spark.createDataFrame([("b", 20), ("d", 40)], "k string, v int")
    out = merge_into(spark, path, updates, key="k")
    got = {r["k"]: r["v"] for r in out.collect()}
    assert got == {"a": 1, "b": 20, "c": 3, "d": 40}
    # idempotent re-merge of same updates
    out = merge_into(spark, path, updates, key="k")
    assert out.count() == 4


def test_scd2_keeps_history(spark, tmp_path):
    path = str(tmp_path / "dim")
    spark.createDataFrame(
        [("a", 1), ("b", 2)], "k string, v int"
    ).withColumn("valid_from", F.current_timestamp()).withColumn(
        "valid_to", F.lit(None).cast("timestamp")
    ).write.parquet(path)
    updates = spark.createDataFrame([("b", 99)], "k string, v int")
    out = scd2_apply(spark, path, updates, key="k")
    b_rows = out.filter(F.col("k") == "b").collect()
    assert len(b_rows) == 2
    current = [r for r in b_rows if r["valid_to"] is None]
    closed = [r for r in b_rows if r["valid_to"] is not None]
    assert len(current) == 1 and current[0]["v"] == 99
    assert len(closed) == 1 and closed[0]["v"] == 2
    # untouched key keeps exactly one current row
    assert out.filter((F.col("k") == "a") & F.col("valid_to").isNull()).count() == 1


def test_salted_join_matches_plain_join(spark):
    left = spark.createDataFrame(
        [("hot", i) for i in range(500)] + [("cold", i) for i in range(5)],
        "k string, v int",
    )
    right = spark.createDataFrame(
        [("hot", "H"), ("cold", "C"), ("unused", "U")], "k string, tag string"
    )
    plain = left.join(right, "k").select("k", "v", "tag")
    salted = salted_join(left, right, key="k", salt=8).select("k", "v", "tag")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_skew_stats_orders_hot_keys_first(spark):
    df = spark.createDataFrame(
        [("hot", 1)] * 50 + [("warm", 1)] * 10 + [("cold", 1)], "k string, v int"
    )
    rows = skew_stats(df, "k").collect()
    assert rows[0]["k"] == "hot" and rows[0]["n"] == 50
    assert rows[1]["k"] == "warm"
