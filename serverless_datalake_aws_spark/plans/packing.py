"""Training-data assembly operators (SURVEY §2.11): sequence packing
and deterministic sampling."""

from __future__ import annotations

import sys

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from serverless_datalake_aws_spark.catalog import table
from serverless_datalake_aws_spark.plans import query

try:  # self-contained UDF closures (see functions/semistructured.py)
    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover
    pass

_WINDOW = 512


def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
    """The greedy per-group packing fold shared by p01 and p05 (one
    body — the recursive-CTE oracles of both queries replay exactly
    this logic, so two drifting copies would red exactly one of them).
    Module-level so cloudpickle's register-by-value ships it whole to
    executors for both applyInPandas call sites."""
    pdf = pdf.sort_values("doc_id").reset_index(drop=True)
    pack_ids, pack_id, running = [], 0, 0
    for n in pdf["n_tokens"]:
        if running + n > _WINDOW and running > 0:
            pack_id += 1
            running = n
        else:
            running += n
        pack_ids.append(pack_id)
    return pdf.assign(pack_id=pack_ids)


@query(
    "p01_sequence_packing",
    oracle=f"""
    WITH RECURSIVE d AS (
        SELECT lang, doc_id, len(string_split(text, ' ')) AS n_tokens,
               row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
        FROM documents
    ),
    fold(lang, rn, doc_id, n_tokens, pack_id, running) AS (
        SELECT lang, rn, doc_id, n_tokens, 0, n_tokens FROM d WHERE rn = 1
        UNION ALL
        SELECT d.lang, d.rn, d.doc_id, d.n_tokens,
               CASE WHEN f.running + d.n_tokens > {_WINDOW}
                    THEN f.pack_id + 1 ELSE f.pack_id END,
               CASE WHEN f.running + d.n_tokens > {_WINDOW}
                    THEN d.n_tokens ELSE f.running + d.n_tokens END
        FROM fold f JOIN d ON d.lang = f.lang AND d.rn = f.rn + 1
    )
    SELECT lang, doc_id, n_tokens, pack_id FROM fold
    """,
)
def p01_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing: assign documents (in doc_id order,
    per language) to {_WINDOW}-token training windows — a document
    never splits; a window closes when the next doc would overflow it.

    The running-total-with-reset fold is inherently sequential, so it
    runs as `applyInPandas` per language partition (§2.10) — groups
    pack independently and in parallel, the packing *within* a group is
    a linear scan. The oracle reproduces the fold with a recursive CTE,
    so even this stateful operator is hash-verified.
    """
    docs = table(spark, sf_dir, "documents")
    d = docs.select(
        "lang", "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )

    return d.groupBy("lang").applyInPandas(
        _pack, schema="lang string, doc_id long, n_tokens int, pack_id long"
    )


@query(
    "p05_training_data_pipeline",
    oracle=f"""
    WITH RECURSIVE feat AS (
        SELECT doc_id, lang,
               len(string_split(text, ' ')) AS n_tokens,
               len(list_distinct(string_split(text, ' ')))::DOUBLE
                   / len(string_split(text, ' ')) AS distinct_ratio,
               md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fp
        FROM documents
    ),
    q AS (
        SELECT * FROM feat WHERE n_tokens >= 10 AND distinct_ratio >= 0.3
    ),
    dedup AS (
        SELECT doc_id, lang, n_tokens FROM q
        QUALIFY row_number() OVER (PARTITION BY fp ORDER BY doc_id) = 1
    ),
    d AS (
        SELECT lang, doc_id, n_tokens,
               row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
        FROM dedup
    ),
    fold(lang, rn, doc_id, n_tokens, pack_id, running) AS (
        SELECT lang, rn, doc_id, n_tokens, 0, n_tokens FROM d WHERE rn = 1
        UNION ALL
        SELECT d.lang, d.rn, d.doc_id, d.n_tokens,
               CASE WHEN f.running + d.n_tokens > {_WINDOW}
                    THEN f.pack_id + 1 ELSE f.pack_id END,
               CASE WHEN f.running + d.n_tokens > {_WINDOW}
                    THEN d.n_tokens ELSE f.running + d.n_tokens END
        FROM fold f JOIN d ON d.lang = f.lang AND d.rn = f.rn + 1
    )
    SELECT lang, doc_id, n_tokens, pack_id FROM fold
    """,
)
def p05_training_data_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end training-data assembly pipeline as ONE lazy plan:
    quality gate (token count + distinct-token ratio) → exact dedup
    (content fingerprint, keep-first) → greedy {_WINDOW}-token sequence
    packing per language. The composition a 100 TB corpus actually runs
    nightly, here as a single Catalyst plan so the quality filter
    prunes BEFORE the dedup shuffle and the dedup shrinks the packing
    input — no intermediate materialization between stages.

    Scale: stage shuffles are fingerprint-hash (∝ quality survivors)
    then lang (∝ dedup survivors); the only Python is the per-group
    packing fold (applyInPandas, Arrow-batched), same as p01. The
    quality thresholds are untuned heuristics exercising the filter
    shape, not a data-quality claim."""
    from serverless_datalake_aws_spark.functions import text as TX
    from pyspark.sql.window import Window as W

    docs = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_tokens = F.size(toks)
    feat = docs.select(
        "doc_id",
        "lang",
        n_tokens.alias("n_tokens"),
        (F.size(F.array_distinct(toks)) / n_tokens.cast("double")).alias(
            "distinct_ratio"
        ),
        TX.fingerprint("text").alias("fp"),
    )
    q = feat.filter((F.col("n_tokens") >= 10) & (F.col("distinct_ratio") >= 0.3))
    dedup = (
        q.withColumn(
            "_rn", F.row_number().over(W.partitionBy("fp").orderBy("doc_id"))
        )
        .filter(F.col("_rn") == 1)
        .select("lang", "doc_id", "n_tokens")
    )

    return dedup.groupBy("lang").applyInPandas(
        _pack, schema="lang string, doc_id long, n_tokens int, pack_id long"
    )


@query(
    "t08_hash_sample",
    oracle="""
    SELECT doc_id, lang, source
    FROM documents
    WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10 = 0
    """,
)
def t08_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% sample via content-hash modulus — reproducible
    across engines, runs, and scales (unlike TABLESAMPLE/rand), the
    right way to carve stable eval splits from a 100 TB corpus."""
    docs = table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 10
    )
    return docs.filter(bucket == 0).select("doc_id", "lang", "source")
