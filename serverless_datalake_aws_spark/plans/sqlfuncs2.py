"""Eighth tranche: FILTER-clause aggregates + boolean aggregates, the
map-function surface, and correlated LATERAL joins — Presto/Athena SQL
features reachable through the reference's passthrough
(`query-data-lambda.py:195-218`). The map histogram also stands in for
DynamoDB's `M` attribute analytics (SURVEY §1.1 metadata rows →
MapType).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from serverless_datalake_aws_spark.catalog import register_views, table
from serverless_datalake_aws_spark.plans import query


@query(
    "q57_filtered_aggs",
    oracle="""
    SELECT c_mktsegment,
      count(*) AS n,
      count(*) FILTER (WHERE c_acctbal > 5000) AS n_rich,
      round(avg(c_acctbal) FILTER (WHERE c_acctbal > 0), 4) AS avg_positive,
      bool_or(c_acctbal < 0) AS has_debtor,
      bool_and(c_acctbal > -1000) AS none_deep_debt
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def q57_filtered_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTER-clause aggregates (ANSI / Presto) + boolean aggregates
    (bool_or/bool_and = Presto's arbitrary-predicate any/every): many
    conditional metrics in ONE aggregation pass — the scale-friendly
    alternative to N self-joined sub-aggregations."""
    register_views(spark, sf_dir, ("customer",))
    return spark.sql(
        """
        SELECT c_mktsegment,
          count(*) AS n,
          count(*) FILTER (WHERE c_acctbal > 5000) AS n_rich,
          round(avg(c_acctbal) FILTER (WHERE c_acctbal > 0), 4) AS avg_positive,
          bool_or(c_acctbal < 0) AS has_debtor,
          bool_and(c_acctbal > -1000) AS none_deep_debt
        FROM customer
        GROUP BY c_mktsegment
        """
    )


@query(
    "q58_map_functions",
    oracle="""
    WITH counts AS (
      SELECT user_id, event_type, count(*) AS c
      FROM events GROUP BY user_id, event_type
    )
    SELECT user_id,
      string_agg(concat(event_type, ':', c), ';' ORDER BY event_type) AS hist,
      string_agg(concat(event_type, ':', c), ';' ORDER BY event_type)
        FILTER (WHERE c >= 12) AS hist_hot
    FROM counts
    GROUP BY user_id
    """,
)
def q58_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-function surface (Presto map_agg/map_filter → Spark
    map_from_entries/map_filter/map_entries): per-user event-type
    histogram built as a real MapType column, filtered to hot keys,
    then serialized to a sorted `k:v;k:v` string so the value hash is
    key-order-independent (map iteration order is engine-specific —
    the string is the only portable comparison form)."""
    ev = table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("c"))
    m = counts.groupBy("user_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("event_type"), F.col("c")))
        ).alias("m")
    )

    def _ser(mcol):
        # sort the STRUCT entries (orders by the key field alone,
        # matching the oracle's ORDER BY event_type) BEFORE serializing:
        # sorting the 'k:v' strings would order 'view2:7' before
        # 'view:9' the moment one key is a prefix of another followed
        # by a character below ':'
        entries = F.transform(
            F.array_sort(F.map_entries(mcol)),
            lambda e: F.concat_ws(":", e["key"], e["value"].cast("string")),
        )
        return F.array_join(entries, ";")

    hot = F.map_filter(F.col("m"), lambda k, v: v >= 12)
    return m.select(
        "user_id",
        _ser(F.col("m")).alias("hist"),
        F.when(F.size(F.map_entries(hot)) > 0, _ser(hot)).alias("hist_hot"),
    )


@query(
    "q59_lateral_topk",
    oracle="""
    SELECT n_name, t.c_name, t.c_acctbal
    FROM nation, LATERAL (
      SELECT c_name, c_acctbal FROM customer
      WHERE c_nationkey = n_nationkey
      ORDER BY c_acctbal DESC, c_name LIMIT 2
    ) t
    """,
)
def q59_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL join (Presto/ANSI LATERAL): top-2 customers
    per nation computed by a correlated subquery. Catalyst rewrites
    the per-row LIMIT into a ranked window over one shuffle — same
    physical plan as q08's explicit window, proving both phrasings
    converge."""
    register_views(spark, sf_dir, ("nation", "customer"))
    return spark.sql(
        """
        SELECT n_name, t.c_name, t.c_acctbal
        FROM nation, LATERAL (
          SELECT c_name, c_acctbal FROM customer
          WHERE c_nationkey = n_nationkey
          ORDER BY c_acctbal DESC, c_name LIMIT 2
        ) t
        """
    )
