"""Text-analysis queries over `documents` (SURVEY.md §2.8 search surface
+ §2.11 LLM-pipeline text operators).

Replaces the reference's OpenSearch data plane (index-data-lambda.py,
lambda-function.py:134-172): tokenization, term statistics, quality
scoring, language scoring, fingerprinting — all as JVM-side column
expressions with exact DuckDB oracle twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from serverless_datalake_aws_spark.catalog import table
from serverless_datalake_aws_spark.functions import text as TX
from serverless_datalake_aws_spark.plans import query

_STOPWORDS = ("the", "a", "data", "value")
_LANG_MARKERS = {
    "set1": ("the", "a", "spark"),
    "set2": ("data", "table", "row"),
    "set3": ("join", "merge", "hash"),
}


@query(
    "t01_token_stats",
    oracle="""
    SELECT doc_id, lang,
           len(string_split(text, ' '))                                   AS n_tokens,
           round((length(text) - (len(string_split(text,' ')) - 1))
                 / len(string_split(text,' '))::DOUBLE, 4)                AS avg_token_len,
           round(len(list_distinct(string_split(text,' ')))
                 / len(string_split(text,' '))::DOUBLE, 4)                AS distinct_ratio,
           md5(array_to_string(list_sort(list_distinct(string_split(text,' '))), ' '))
                                                                          AS fingerprint
    FROM documents
    """,
)
def t01_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token counting, quality features, and content
    fingerprint (§2.11 token counting / quality scoring / fingerprint).
    Pure map-side column math — no shuffle, scales embarrassingly."""
    docs = table(spark, sf_dir, "documents")
    feats = TX.quality_features("text")
    return docs.select(
        "doc_id",
        "lang",
        feats["n_tokens"].alias("n_tokens"),
        feats["avg_token_len"].alias("avg_token_len"),
        feats["distinct_ratio"].alias("distinct_ratio"),
        TX.fingerprint("text").alias("fingerprint"),
    )


@query(
    "t02_term_frequencies",
    oracle="""
    SELECT lang, token, count(*) AS tf
    FROM (SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents)
    GROUP BY lang, token
    HAVING count(*) >= 5
    """,
)
def t02_term_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term-frequency table per language (the search-index build core,
    reference K8 bulk index). explode → hash-agg; partial aggregation
    makes the shuffle proportional to vocabulary size, not corpus."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select("lang", F.explode(TX.tokens("text")).alias("token"))
        .groupBy("lang", "token")
        .agg(F.count("*").alias("tf"))
        .filter(F.col("tf") >= 5)
    )


@query(
    "t03_quality_by_lang",
    oracle="""
    SELECT lang,
           count(*) AS n_docs,
           round(avg(len(string_split(text,' '))), 4) AS avg_tokens,
           round(avg(len(list_filter(string_split(text,' '),
                 x -> x IN ('the','a','data','value')))
                 / len(string_split(text,' '))::DOUBLE), 4) AS avg_stopword_ratio,
           round(avg(n_chars), 4) AS avg_chars
    FROM documents
    GROUP BY lang
    """,
)
def t03_quality_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus quality profile per language: stopword ratio + length
    stats (§2.11 quality scoring)."""
    docs = table(spark, sf_dir, "documents")
    n_tokens = F.size(TX.tokens("text")).cast("double")
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg(F.size(TX.tokens("text"))), 4).alias("avg_tokens"),
        F.round(F.avg(TX.stopword_count("text", _STOPWORDS) / n_tokens), 4).alias(
            "avg_stopword_ratio"
        ),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
    )


@query(
    "t04_language_score",
    oracle="""
    WITH scored AS (
        SELECT doc_id, lang,
               len(list_filter(string_split(text,' '), x -> x IN ('the','a','spark')))     AS s1,
               len(list_filter(string_split(text,' '), x -> x IN ('data','table','row')))  AS s2,
               len(list_filter(string_split(text,' '), x -> x IN ('join','merge','hash'))) AS s3
        FROM documents
    )
    SELECT doc_id, lang, s1, s2, s3,
           CASE WHEN s1 >= s2 AND s1 >= s3 THEN 'set1'
                WHEN s2 >= s3 THEN 'set2'
                ELSE 'set3' END AS predicted_set
    FROM scored
    """,
)
def t04_language_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID-style n-gram/marker scoring with deterministic argmax
    (§2.11 language identification). The marker sets stand in for
    per-language frequency profiles; the plan shape (vector of scores →
    argmax per doc) is exactly a real lang-ID pass."""
    docs = table(spark, sf_dir, "documents")
    scores = {
        name: TX.stopword_count("text", markers).alias(f"s{i+1}")
        for i, (name, markers) in enumerate(_LANG_MARKERS.items())
    }
    scored = docs.select("doc_id", "lang", *scores.values())
    return scored.withColumn(
        "predicted_set",
        F.when(
            (F.col("s1") >= F.col("s2")) & (F.col("s1") >= F.col("s3")), "set1"
        )
        .when(F.col("s2") >= F.col("s3"), "set2")
        .otherwise("set3"),
    )


@query(
    "t06_normalize",
    oracle="""
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                               ' +', ' ', 'g')) AS normalized,
           md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                               ' +', ' ', 'g'))) AS norm_hash
    FROM documents
    WHERE doc_id < 200
    """,
)
def t06_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text normalization pipeline (lowercase → strip non-alnum →
    collapse whitespace → trim) + canonical hash — the standard
    preprocessing step before dedup/tokenization (§2.11)."""
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""),
            " +",
            " ",
        )
    )
    return docs.select(
        "doc_id", norm.alias("normalized"), F.md5(norm).alias("norm_hash")
    )


@query(
    "t07_token_histogram",
    oracle="""
    SELECT CAST(len(string_split(text,' ')) // 10 AS BIGINT) * 10 AS bucket_lo,
           count(*) AS n_docs,
           round(avg(n_chars), 4) AS avg_chars
    FROM documents
    GROUP BY 1
    """,
)
def t07_token_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-count distribution histogram (width-10 buckets) — the
    corpus-profiling step that sizes truncation/packing decisions in a
    training-data pipeline (§2.11)."""
    docs = table(spark, sf_dir, "documents")
    bucket = (F.floor(F.size(TX.tokens("text")) / 10) * 10).cast("long")
    return docs.groupBy(bucket.alias("bucket_lo")).agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
    )


@query(
    "t05_bigram_counts",
    oracle="""
    SELECT bigram, count(*) AS n
    FROM (
        SELECT unnest(list_transform(
                   generate_series(1, len(string_split(text,' ')) - 1),
                   i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
               )) AS bigram
        FROM documents
    )
    GROUP BY bigram
    HAVING count(*) >= 20
    """,
)
def t05_bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-bigram frequency profile (§2.11 n-gram analysis): zip_with
    over shifted token slices — array-local, no UDF."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(TX.word_ngrams("text", n=2)).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= 20)
    )
