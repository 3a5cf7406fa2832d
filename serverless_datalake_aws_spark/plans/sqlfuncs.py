"""Seventh tranche: advanced SQL function surface — higher-order array
lambdas, exact percentiles, ordered string aggregation, regexp token
extraction, and LATERAL VIEW posexplode. These are Presto/Athena
built-ins the reference's SQL passthrough exposes
(`query-data-lambda.py:195-218`; Presto `transform`/`filter`/`reduce`,
`approx_percentile`, `array_join`, `regexp_extract_all`, `UNNEST WITH
ORDINALITY`) re-expressed with Spark's native equivalents.

All array math stays JVM-side inside whole-stage codegen — the lambdas
compile to Catalyst expressions, not Python UDFs, so a 100 TB scan of
embedding vectors never crosses into Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from serverless_datalake_aws_spark.catalog import register_views, table
from serverless_datalake_aws_spark.plans import query


@query(
    "q52_higher_order_arrays",
    oracle="""
    SELECT label,
      round(avg(sqrt(list_sum(list_transform(embedding,
            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4) AS avg_norm,
      round(avg(len(list_filter(embedding, x -> x > 0))), 4) AS avg_pos_dims,
      round(max(list_max(list_transform(embedding,
            x -> abs(CAST(x AS DOUBLE))))), 4) AS max_abs_component
    FROM embeddings
    GROUP BY label
    """,
)
def q52_higher_order_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array lambdas (Presto transform/filter/reduce →
    Spark transform/filter/aggregate): per-label L2-norm, positive-
    dimension count, and max |component| over array<float> embeddings.
    One narrow scan, no explode — the arrays never leave their rows, so
    there is exactly one shuffle (the final groupBy on label)."""
    emb = table(spark, sf_dir, "embeddings")
    sq_sum = F.expr(
        "aggregate(transform(embedding, x -> cast(x as double) * cast(x as double)),"
        " 0D, (s, x) -> s + x)"
    )
    n_pos = F.expr("size(filter(embedding, x -> x > 0))")
    max_abs = F.expr("array_max(transform(embedding, x -> abs(cast(x as double))))")
    return emb.groupBy("label").agg(
        F.round(F.avg(F.sqrt(sq_sum)), 4).alias("avg_norm"),
        F.round(F.avg(n_pos), 4).alias("avg_pos_dims"),
        F.round(F.max(max_abs), 4).alias("max_abs_component"),
    )


@query(
    "q53_exact_percentiles",
    oracle="""
    SELECT l_returnflag,
      round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
      round(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
      round(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
      round(quantile_disc(l_extendedprice, 0.50), 4) AS p50_disc,
      round(median(l_extendedprice), 4) AS med
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q53_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (Presto approx_percentile's exact sibling):
    interpolated quartiles (percentile_cont semantics) plus the
    discrete median. Exact percentiles require a per-group sort — at
    100 TB prefer q38's approx_percentile (t-digest) unless exactness
    is contractual; this query is the exactness contract."""
    register_views(spark, sf_dir, ("lineitem",))
    # one array-percentile aggregate instead of four scalar ones: exact
    # percentiles buffer the whole group per aggregate expression, so
    # folding p25/p50/p75/median into a single percentile(..., array(...))
    # call quarters the buffered state (measured 3.9s -> ~1s at sf0.1)
    return spark.sql(
        """
        SELECT l_returnflag,
          round(element_at(ps, 1), 4) AS p25,
          round(element_at(ps, 2), 4) AS p50,
          round(element_at(ps, 3), 4) AS p75,
          round(p50_disc, 4) AS p50_disc,
          round(element_at(ps, 2), 4) AS med
        FROM (
          SELECT l_returnflag,
            percentile(l_extendedprice, array(0.25, 0.50, 0.75)) AS ps,
            percentile_disc(0.50) WITHIN GROUP (ORDER BY l_extendedprice)
              AS p50_disc
          FROM lineitem
          GROUP BY l_returnflag
        )
        """
    )


@query(
    "q54_string_agg",
    oracle="""
    SELECT r_name,
           string_agg(n_name, ',' ORDER BY n_name) AS nations,
           count(*) AS n_nations
    FROM region JOIN nation ON r_regionkey = n_regionkey
    GROUP BY r_name
    """,
)
def q54_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (Presto array_join(array_agg(...)) /
    listagg): deterministic via array_sort before concat — collect_list
    ordering is partition-dependent in a distributed run, so the sort
    is the only scale-safe way to make the result stable."""
    region = table(spark, sf_dir, "region")
    nation = table(spark, sf_dir, "nation")
    joined = region.join(
        F.broadcast(nation),
        region["r_regionkey"] == nation["n_regionkey"],
    )
    return joined.groupBy("r_name").agg(
        F.concat_ws(",", F.array_sort(F.collect_list("n_name"))).alias("nations"),
        F.count("*").alias("n_nations"),
    )


@query(
    "q55_regexp_token_extract",
    oracle="""
    SELECT doc_id,
           len(regexp_extract_all(text, '[a-z]+')) AS n_alpha_tokens,
           len(regexp_extract_all(text, '[0-9]+')) AS n_numeric_tokens,
           len(regexp_extract_all(text, '[^a-z0-9 ]')) AS n_symbols,
           round(CAST(len(regexp_extract_all(text, '[a-z]+')) AS DOUBLE)
                 / greatest(len(string_split(text, ' ')), 1), 6) AS alpha_ratio
    FROM documents
    """,
)
def q55_regexp_token_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract_all (Presto built-in of the same name): per-doc
    counts of alpha / numeric / symbol tokens plus an alpha ratio —
    the BPE-ish tokenizer-feature shape an LLM data pipeline computes
    per document. Pure codegen string ops, no UDF."""
    docs = table(spark, sf_dir, "documents")
    n_alpha = F.size(F.regexp_extract_all(F.col("text"), F.lit("[a-z]+"), 0))
    n_num = F.size(F.regexp_extract_all(F.col("text"), F.lit("[0-9]+"), 0))
    n_sym = F.size(F.regexp_extract_all(F.col("text"), F.lit("[^a-z0-9 ]"), 0))
    n_ws = F.greatest(F.size(F.split(F.col("text"), " ")), F.lit(1))
    return docs.select(
        "doc_id",
        n_alpha.alias("n_alpha_tokens"),
        n_num.alias("n_numeric_tokens"),
        n_sym.alias("n_symbols"),
        F.round(n_alpha.cast("double") / n_ws, 6).alias("alpha_ratio"),
    )


@query(
    "q56_posexplode_tokens",
    oracle="""
    SELECT doc_id, CAST(p.pos AS BIGINT) AS pos, p.tok AS tok
    FROM (
      SELECT doc_id,
             unnest(list_transform(string_split(text, ' '),
                    (x, i) -> struct_pack(pos := i, tok := x))) AS p
      FROM documents
    ) t
    WHERE p.pos <= 5 AND len(p.tok) > 3
    """,
)
def q56_posexplode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL VIEW posexplode (Presto UNNEST WITH ORDINALITY): the
    first five whitespace tokens of every document with their 1-based
    positions, keeping only tokens longer than 3 chars. The array is
    SLICED to 5 elements before the explode — Catalyst cannot push a
    filter on a generator's ordinal below the Generate, so a
    post-explode pos filter would still materialize one row per token
    per document; the slice makes ≤5 rows/doc true in the plan."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            F.posexplode(
                F.slice(F.split(F.col("text"), " "), 1, 5)
            ).alias("pos0", "tok"),
        )
        .withColumn("pos", (F.col("pos0") + 1).cast("long"))
        .filter(F.length("tok") > 3)
        .select("doc_id", "pos", "tok")
    )
