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

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
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

    return d.groupBy("lang").applyInPandas(
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
