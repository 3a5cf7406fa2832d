"""SimHash near-dup + grouped procedural dedup stats (SURVEY §2.11,
§2.10 UDF surface).

d05: 32-bit SimHash fingerprints from md5-derived token-hash bits —
per-bit weighted vote, sign → bit — then near-dup pairs by Hamming
distance within `source` blocks. All bit math is int64-exact in both
engines (Spark bit_count/xor == DuckDB bit_count/xor).

d06: grouped z-score outliers via applyInPandas — the §2.10 grouped
procedural hook (reference A1's per-dataType loop). Arrow-batched
per-group pandas; the oracle is the equivalent window-function SQL,
proving the UDF path agrees with the declarative one.
"""

from __future__ import annotations

import sys

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from serverless_datalake_aws_spark.catalog import table
from serverless_datalake_aws_spark.functions import text as TX
from serverless_datalake_aws_spark.plans import query

try:  # self-contained UDF closures (see functions/semistructured.py)
    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover
    pass

_SIMHASH_BITS = 32

# DuckDB twin of the Spark simhash expression below.
_SIMHASH_SQL = f"""
        list_sum(list_transform(generate_series(0, {_SIMHASH_BITS - 1}), j ->
            CASE WHEN list_sum(list_transform(
                     list_distinct(string_split(text, ' ')), t ->
                     CASE WHEN (CAST(concat('0x', substr(md5(t), 1, 14)) AS BIGINT)
                                // power(2, j)::BIGINT) % 2 = 1
                          THEN 1 ELSE -1 END)) > 0
                 THEN power(2, j)::BIGINT ELSE 0 END))
"""


def _simhash_col_from(hashes_col: str):
    """32-bit SimHash from a materialized token-hash array column: bit j
    is set iff the majority of token hashes have bit j set (±1 vote per
    token)."""
    hashes = F.col(hashes_col)

    def _vote(j: int):
        # two-arg merge lambda built via closure (F.aggregate requires
        # exactly (acc, x); a default-arg third param breaks arity)
        return lambda acc, h: acc + F.when(
            F.shiftright(h, j) % 2 == 1, 1
        ).otherwise(-1)

    bits = []
    for j in range(_SIMHASH_BITS):
        vote = F.aggregate(hashes, F.lit(0), _vote(j))
        bits.append(F.when(vote > 0, F.lit(2**j).cast("long")).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


@query(
    "d05_simhash_pairs",
    oracle=f"""
    WITH s AS (
        SELECT doc_id, source, {_SIMHASH_SQL} AS simhash
        FROM documents
    )
    SELECT s1.doc_id AS doc1, s2.doc_id AS doc2,
           bit_count(xor(s1.simhash, s2.simhash)) AS hamming
    FROM s s1 JOIN s s2
      ON s1.source = s2.source AND s1.doc_id < s2.doc_id
    WHERE bit_count(xor(s1.simhash, s2.simhash)) <= 6
    """,
)
def d05_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup (§2.11): 32-bit fingerprints, candidate pairs =
    Hamming ≤ 6 within a `source` block. The fingerprint is one long
    per doc — at 100 TB the pair scan runs over 8-byte keys, not text;
    full-scale variant would block on simhash bands instead of source."""
    docs = table(spark, sf_dir, "documents")
    n_part = spark.sparkContext.defaultParallelism
    # two cached steps: the 32 per-bit vote aggregates all reference the
    # token-hash array, and projection collapse would inline the md5+conv
    # hashing into each vote (32x recompute). The InMemoryRelation
    # boundary pins the hash array; the second cache lets the self-join
    # reuse the fingerprints.
    hashed = (
        docs.repartition(n_part, "doc_id")
        .select(
            "doc_id",
            "source",
            F.transform(TX.distinct_tokens("text"), TX.token_hash).alias("hashes"),
        )
        .cache()
    )
    s = hashed.select("doc_id", "source", _simhash_col_from("hashes").alias("simhash")).cache()
    # materialize the fingerprint cache BEFORE the self-join: otherwise
    # both join sides race to fill the same unmaterialized cache inside
    # one job and the 32-vote simhash computes twice (measured 2x on
    # bench at sf0.1).
    s.count()
    s1, s2 = s.alias("s1"), s.alias("s2")
    hamming = F.bit_count(
        F.col("s1.simhash").bitwiseXOR(F.col("s2.simhash"))
    ).cast("long")
    return (
        s1.join(
            s2,
            (F.col("s1.source") == F.col("s2.source"))
            & (F.col("s1.doc_id") < F.col("s2.doc_id")),
        )
        .select(
            F.col("s1.doc_id").alias("doc1"),
            F.col("s2.doc_id").alias("doc2"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= 6)
    )


@query(
    "d07_dedup_keep_first",
    oracle="""
    SELECT doc_id, lang, source, n_chars
    FROM documents
    QUALIFY row_number() OVER (
        PARTITION BY md5(array_to_string(list_sort(list_distinct(string_split(text,' '))), ' '))
        ORDER BY doc_id
    ) = 1
    """,
)
def d07_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivor-selection dedup (§2.11 'content-hash + row_number()==1'):
    unlike d01/d02's group summaries, this keeps the full surviving row
    — the plan you actually run to materialize a deduplicated corpus.
    One shuffle on the fingerprint; survivors stream out without a
    second join."""
    from pyspark.sql.window import Window as W

    docs = table(spark, sf_dir, "documents")
    w = W.partitionBy(TX.fingerprint("text")).orderBy("doc_id")
    return (
        docs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("doc_id", "lang", "source", "n_chars")
    )


_CLUSTER_EDGES_SQL = f"""
        SELECT d1.doc_id AS a, d2.doc_id AS b
        FROM (SELECT doc_id, source, {_SIMHASH_SQL} AS simhash FROM documents) d1
        JOIN (SELECT doc_id, source, {_SIMHASH_SQL} AS simhash FROM documents) d2
          ON d1.source = d2.source AND d1.doc_id < d2.doc_id
        WHERE bit_count(xor(d1.simhash, d2.simhash)) <= 6
"""


@query(
    "d08_dup_clusters",
    oracle=f"""
    WITH RECURSIVE edges AS ({_CLUSTER_EDGES_SQL}),
    edges2 AS (SELECT a, b FROM edges UNION ALL SELECT b AS a, a AS b FROM edges),
    nodes AS (SELECT DISTINCT x AS node FROM (
        SELECT a AS x FROM edges UNION SELECT b FROM edges)),
    reach(node, r) AS (
        SELECT node, node FROM nodes
        UNION
        SELECT reach.node, e.b FROM reach JOIN edges2 e ON e.a = reach.r
    )
    SELECT node,
           min(r) AS cluster_id,
           count(DISTINCT r) AS cluster_size,
           array_to_string(list_sort(list(DISTINCT r)), ',') AS members
    FROM reach
    GROUP BY node
    """,
)
def d08_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster formation: near-dup pairs (the d05 simhash
    edges) → connected components via iterative min-label propagation —
    the step that turns pairwise similarity into deduplicatable groups.

    This is the §2.10/§2.11 'iterative algorithm on DataFrames' class:
    a driver loop over joins until fixpoint (bounded by graph
    diameter), each step one shuffle. The oracle computes the same
    components with a recursive CTE. Output: one row per node with its
    cluster id (min doc_id in component).
    """
    docs = table(spark, sf_dir, "documents")
    n_part = spark.sparkContext.defaultParallelism
    hashed = (
        docs.repartition(n_part, "doc_id")
        .select(
            "doc_id",
            "source",
            F.transform(TX.distinct_tokens("text"), TX.token_hash).alias("hashes"),
        )
        .cache()
    )
    s = hashed.select(
        "doc_id", "source", _simhash_col_from("hashes").alias("simhash")
    ).cache()
    s.count()  # materialize before the self-join (see d05)
    s1, s2 = s.alias("s1"), s.alias("s2")
    edges = (
        s1.join(
            s2,
            (F.col("s1.source") == F.col("s2.source"))
            & (F.col("s1.doc_id") < F.col("s2.doc_id")),
        )
        .filter(
            F.bit_count(F.col("s1.simhash").bitwiseXOR(F.col("s2.simhash"))) <= 6
        )
        .select(F.col("s1.doc_id").alias("a"), F.col("s2.doc_id").alias("b"))
        .cache()
    )
    edges.count()  # materialize: edges is read twice per iteration
    nodes = (
        edges.select(F.col("a").alias("node"))
        .union(edges.select("b"))
        .distinct()
    )
    labels = nodes.withColumn("label", F.col("node")).cache()
    both = edges.union(edges.select(F.col("b"), F.col("a")))  # undirected
    for _ in range(20):  # bounded by component diameter
        msgs = both.join(
            labels, both.a == labels.node
        ).select(F.col("b").alias("node"), "label")
        new_labels = (
            labels.select("node", "label")
            .union(msgs)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .cache()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    sizes = labels.groupBy("label").agg(
        F.count("*").alias("cluster_size"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list("node")), lambda x: x.cast("string")
            ),
            ",",
        ).alias("members"),
    )
    return labels.join(sizes, "label").select(
        "node",
        F.col("label").alias("cluster_id"),
        "cluster_size",
        "members",
    )


@query(
    "d06_group_zscore_outliers",
    oracle="""
    SELECT lang, doc_id, n_chars,
           round((n_chars - avg(n_chars) OVER (PARTITION BY lang))
                 / stddev_samp(n_chars) OVER (PARTITION BY lang), 4) AS zscore
    FROM documents
    QUALIFY abs((n_chars - avg(n_chars) OVER (PARTITION BY lang))
                / stddev_samp(n_chars) OVER (PARTITION BY lang)) > 1.5
    """,
)
def d06_group_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped procedural logic via applyInPandas (§2.10): per-language
    z-score outliers. The pandas path is the transform-hook surface the
    reference exposes as 'edit the Lambda' (README.md:146-147); the SQL
    oracle proves it matches the declarative window plan. Shuffles once
    on the group key; each group is one Arrow batch."""
    docs = table(spark, sf_dir, "documents")

    def _zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["n_chars"].mean()
        sd = pdf["n_chars"].std(ddof=1)
        pdf = pdf.assign(zscore=((pdf["n_chars"] - mu) / sd).round(4))
        return pdf[abs((pdf["n_chars"] - mu) / sd) > 1.5][
            ["lang", "doc_id", "n_chars", "zscore"]
        ]

    return docs.select("lang", "doc_id", "n_chars").groupBy("lang").applyInPandas(
        _zscore, schema="lang string, doc_id long, n_chars long, zscore double"
    )
