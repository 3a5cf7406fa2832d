"""Nested-data assembly and unpivot (SURVEY §1.1 records model, §2.7).

The reference's record model is deeply nested JSON (arrays of structs,
ingest-data-lambda.py:140-171). q36 exercises the assembly direction —
relational rows → sorted array<struct> → JSON documents (the T15/T18
surface); q37 exercises columnar re-shape back (UNPIVOT)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from serverless_datalake_aws_spark.catalog import table
from serverless_datalake_aws_spark.plans import query


@query(
    "q36_nested_assembly",
    oracle="""
    SELECT l_orderkey,
           to_json(list(struct_pack(ln := l_linenumber,
                                    qty := CAST(l_quantity AS BIGINT))
                        ORDER BY l_linenumber, CAST(l_quantity AS BIGINT))) AS items,
           count(*) AS n_items
    FROM lineitem
    WHERE l_orderkey < 2000
    GROUP BY l_orderkey
    """,
)
def q36_nested_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows → array<struct> → JSON document per order (the reference's
    items[{...}] payload shape built from relational data). Integer
    fields only in the JSON — double serialization differs between
    engines. array_sort on the struct array gives deterministic
    item order (sorts on the leading ln field)."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 2000)
    item = F.struct(
        F.col("l_linenumber").alias("ln"),
        F.col("l_quantity").cast("long").alias("qty"),
    )
    return (
        li.groupBy("l_orderkey")
        .agg(
            F.to_json(F.array_sort(F.collect_list(item))).alias("items"),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "q37_unpivot",
    oracle="""
    WITH wide AS (
        SELECT l_returnflag,
               round(sum(l_quantity) FILTER (WHERE l_linestatus = 'O'), 4) AS qty_open,
               round(sum(l_quantity) FILTER (WHERE l_linestatus = 'F'), 4) AS qty_filled
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, 'qty_open' AS measure, qty_open AS qty FROM wide
    UNION ALL
    SELECT l_returnflag, 'qty_filled' AS measure, qty_filled AS qty FROM wide
    """,
)
def q37_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide → long re-shape via stack): the inverse of q19's
    pivot, one pass, no join."""
    li = table(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.round(F.sum(F.when(F.col("l_linestatus") == "O", F.col("l_quantity"))), 4)
        .alias("qty_open"),
        F.round(F.sum(F.when(F.col("l_linestatus") == "F", F.col("l_quantity"))), 4)
        .alias("qty_filled"),
    )
    return wide.selectExpr(
        "l_returnflag",
        "stack(2, 'qty_open', qty_open, 'qty_filled', qty_filled) AS (measure, qty)",
    )
