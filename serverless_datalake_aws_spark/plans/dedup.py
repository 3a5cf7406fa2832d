"""Deduplication operators over `documents` (SURVEY.md §2.11).

Four dedup families, each oracle-verified:
  d01 exact (byte-identical content hash)
  d02 canonical (order-insensitive token-set fingerprint)
  d03 n-gram Jaccard near-dup (blocked pairwise, exact similarity)
  d04 MinHash + LSH near-dup (sketch → band join → verify)

Scale story: d01/d02 are one hash-aggregation (shuffle ∝ distinct
hashes). d03 blocks pairwise comparison inside `source` partitions so
cost is Σ|block|² not N². d04 is the 100 TB path — signatures are
array-local map work, the LSH band join only collides probable
near-dups, and the exact-Jaccard verify runs on candidates only.
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from serverless_datalake_aws_spark.catalog import table
from serverless_datalake_aws_spark.functions import text as TX
from serverless_datalake_aws_spark.plans import query

try:  # UDF closures must survive worker-side import (cwd ≠ repo root):
    # the shared shingle_pair_scores rides into applyInPandas closures
    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover
    pass


_MINHASH_ORACLE = f"""
    WITH d AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   generate_series(1, len(string_split(text,' ')) - 2),
                   i -> string_split(text,' ')[i] || ' ' ||
                        string_split(text,' ')[i+1] || ' ' ||
                        string_split(text,' ')[i+2])) AS toks
        FROM documents
    ), h AS (
        SELECT doc_id, toks,
               list_transform(toks, t ->
                   CAST(concat('0x', substr(md5(t), 1, 14)) AS BIGINT)
                   % {TX.MINHASH_P}) AS hs
        FROM d
    ), sig AS (
        SELECT doc_id, toks,
               list_transform(generate_series(0, {TX.MINHASH_K - 1}), i ->
                   list_min(list_transform(hs, x ->
                       (({TX.MINHASH_A0} + i * {TX.MINHASH_A_STEP}) * x
                        + ({TX.MINHASH_B0} + i * {TX.MINHASH_B_STEP}))
                       % {TX.MINHASH_P}))) AS sg
        FROM h
    ), bands AS (
        SELECT doc_id, toks, b,
               concat(CAST(b AS VARCHAR), '-',
                      array_to_string(list_slice(sg, b * 4 + 1, b * 4 + 4), '-'))
                   AS band_key
        FROM sig, generate_series(0, {TX.MINHASH_BANDS - 1}) AS gs(b)
    ), cand AS (
        SELECT DISTINCT b1.doc_id AS doc1, b2.doc_id AS doc2,
               b1.toks AS t1, b2.toks AS t2
        FROM bands b1 JOIN bands b2
          ON b1.band_key = b2.band_key AND b1.doc_id < b2.doc_id
    )
    SELECT doc1, doc2,
           round(len(list_intersect(t1, t2))::DOUBLE
                 / (len(t1) + len(t2) - len(list_intersect(t1, t2))), 4) AS jac
    FROM cand
    WHERE len(list_intersect(t1, t2))::DOUBLE
          / (len(t1) + len(t2) - len(list_intersect(t1, t2))) >= 0.6
"""


@query(
    "d01_exact_dedup",
    oracle="""
    SELECT md5(text) AS content_hash,
           min(doc_id) AS keep_doc_id,
           count(*) AS n_copies
    FROM documents
    GROUP BY md5(text)
    """,
)
def d01_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: content-hash groupBy, survivor = min doc_id
    (§2.11; generalizes `dropDuplicates` with an auditable group row)."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.withColumn("content_hash", F.md5("text"))
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_copies"))
    )


@query(
    "d02_fingerprint_dupes",
    oracle="""
    SELECT md5(array_to_string(list_sort(list_distinct(string_split(text,' '))), ' '))
               AS fingerprint,
           min(doc_id) AS keep_doc_id,
           count(*) AS n_docs,
           array_to_string(list_sort(list(doc_id)), ',') AS doc_ids
    FROM documents
    GROUP BY 1
    HAVING count(*) > 1
    """,
)
def d02_fingerprint_dupes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalized dedup: order-insensitive token-set fingerprint
    catches shuffled-word duplicates that byte hashing misses."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.withColumn("fingerprint", TX.fingerprint("text"))
        .groupBy("fingerprint")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count("*").alias("n_docs"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("doc_id")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("doc_ids"),
        )
        .filter(F.col("n_docs") > 1)
    )


def shingle_pair_scores(pdf, denom: str, out_col: str):
    """Within-block all-pairs 3-gram-shingle similarity via ONE 0/1
    incidence-matrix matmul — the shared machinery behind d03 (Jaccard:
    intersection/union) and d09 (containment: intersection/min). One
    body: the vocab-chunked slab bound, the zero-denominator guard, and
    the 0.2 threshold stay in lockstep for both queries (each has a
    DuckDB oracle replaying exactly this arithmetic).

    `denom`: "union" or "min". Returns (doc1, doc2, <out_col>) with
    doc1 < doc2 in block doc_id order."""
    import numpy as np
    import pandas as pd

    pdf = pdf.sort_values("doc_id").reset_index(drop=True)
    sets = []
    vocab: dict[str, int] = {}
    for t in pdf["text"]:
        toks = t.split(" ")
        s = {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
        sets.append(np.array(
            [vocab.setdefault(g, len(vocab)) for g in s], dtype=np.int64
        ))
    n, v = len(sets), len(vocab)
    # vocab-chunked accumulation: the full n x v incidence is ~n*v*4
    # bytes (1.5 GB at the 10x block size) — chunking bounds the
    # transient to n*32k*4 while the matmul result is identical
    inter = np.zeros((n, n), dtype=np.float64)
    chunk = 32768
    for lo in range(0, v, chunk):
        A = np.zeros((n, min(chunk, v - lo)), dtype=np.float32)
        for r, idx in enumerate(sets):
            sel = idx[(idx >= lo) & (idx < lo + chunk)] - lo
            A[r, sel] = 1.0
        inter += A @ A.T
    sizes = np.array([len(s) for s in sets], dtype=np.int64)
    if denom == "union":
        den = sizes[:, None] + sizes[None, :] - inter
    else:  # "min" — containment
        den = np.minimum(sizes[:, None], sizes[None, :]).astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        score = np.where(den > 0, inter / den, 0.0)
    i, j = np.nonzero(np.triu(score >= 0.2, 1))
    ids = pdf["doc_id"].values
    return pd.DataFrame(
        {"doc1": ids[i], "doc2": ids[j], out_col: score[i, j]}
    )


@query(
    "d03_ngram_jaccard_pairs",
    oracle="""
    WITH d AS (
        SELECT doc_id, source,
               list_distinct(list_transform(
                   generate_series(1, len(string_split(text,' ')) - 2),
                   i -> string_split(text,' ')[i] || ' ' ||
                        string_split(text,' ')[i+1] || ' ' ||
                        string_split(text,' ')[i+2])) AS sh
        FROM documents
    )
    SELECT d1.doc_id AS doc1, d2.doc_id AS doc2,
           round(len(list_intersect(d1.sh, d2.sh))::DOUBLE
                 / (len(d1.sh) + len(d2.sh) - len(list_intersect(d1.sh, d2.sh))), 4)
               AS jac
    FROM d d1 JOIN d d2 ON d1.source = d2.source AND d1.doc_id < d2.doc_id
    -- empty-union guard mirrors the UDF's union > 0: duckdb's 0/0 is
    -- version-dependent (NULL on 1.0, NaN under ieee ops — and
    -- NaN >= 0.2 is TRUE), so never let the division see a 0
    WHERE (len(d1.sh) + len(d2.sh) - len(list_intersect(d1.sh, d2.sh))) > 0
      AND len(list_intersect(d1.sh, d2.sh))::DOUBLE
          / (len(d1.sh) + len(d2.sh) - len(list_intersect(d1.sh, d2.sh))) >= 0.2
    """,
)
def d03_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-gram-shingle Jaccard near-dup, blocked by `source` (§2.11).

    Order-sensitive shingles distinguish reshuffled text from true
    near-copies. Blocking is keyed on `source`, so pairwise cost is
    bounded per block. The within-block all-pairs intersection runs as
    ONE 0/1 incidence-matrix matmul per source group (`applyInPandas`;
    the self-join + per-pair array_intersect it replaces measured 17 s
    at sf0.1 — JVM set ops per pair, the s03/s18 lesson in set
    clothing). Membership is decided INSIDE the UDF with no epsilon:
    intersection and union are integers, so jac is the same float64
    rational in both engines. Intersection counts stay exact in
    float32 up to 2^24 shingles per doc."""
    def _jaccard_pairs(pdf):
        return shingle_pair_scores(pdf, denom="union", out_col="jac_raw")

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    pairs = docs.groupBy("source").applyInPandas(
        _jaccard_pairs, schema="doc1 long, doc2 long, jac_raw double"
    )
    return pairs.select(
        "doc1", "doc2", F.round("jac_raw", 4).alias("jac")
    )


@query("d04_minhash_lsh_pairs", oracle=_MINHASH_ORACLE)
def d04_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH near-dup (§2.11) — the 100 TB dedup path.

    shingle→minhash→band→bucket-join→verify, with deterministic
    md5-derived hash permutations so the whole sketch pipeline is
    oracle-reproducible (unlike MLlib's MinHashLSH seeds). Shingles are
    word 3-grams (order-sensitive; unigram sets saturate on a small
    vocabulary). Candidates are only pairs sharing an LSH band key;
    exact Jaccard then filters false positives. Band join is the single
    shuffle.
    """
    docs = table(spark, sf_dir, "documents")
    n_part = spark.sparkContext.defaultParallelism
    from pyspark import StorageLevel

    d = (
        docs.repartition(n_part, "doc_id")
        .select("doc_id", F.array_distinct(TX.word_ngrams("text", n=3)).alias("toks"))
        .withColumn("hs", F.transform("toks", lambda t: TX.token_hash(t) % TX.MINHASH_P))
        # serialized-in-memory + disk-spillable (NOT .cache(), which is
        # MEMORY_AND_DISK_DESER): the shingled corpus (doc_id + token +
        # hash arrays) is read by three consumers (bands, both verify
        # legs) but is several x the input text — at 100 TB the
        # deserialized form evicts under memory pressure and silently
        # recomputes the shingling per consumer; serialized rows are
        # ~3-5x smaller and spill to local disk instead.
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    d.count()  # materialize: read by bands + both verify legs (see d03)
    # Slim band rows: only (doc_id, band_key) go through the LSH shuffle;
    # shingle arrays are re-attached to surviving candidates afterwards.
    bands = d.select(
        "doc_id",
        F.explode(TX.lsh_band_keys(TX.minhash_mins(F.col("hs")))).alias("band_key"),
    )
    # Hot-band guard: identical candidate set to the naive band
    # self-join, but one boilerplate band can't become the stage
    # straggler (operators/banding.py splits oversized bands into
    # bounded group-pair join keys).
    from serverless_datalake_aws_spark.operators.banding import (
        capped_band_self_join,
    )

    cand = capped_band_self_join(bands, "band_key", "doc_id").dropDuplicates(
        ["doc1", "doc2"]
    )
    t1 = d.select(F.col("doc_id").alias("doc1"), F.col("toks").alias("t1"))
    t2 = d.select(F.col("doc_id").alias("doc2"), F.col("toks").alias("t2"))
    inter = F.size(F.array_intersect("t1", "t2")).cast("double")
    jac = inter / (F.size("t1") + F.size("t2") - inter)
    return (
        cand.join(t1, "doc1")
        .join(t2, "doc2")
        .withColumn("_jac_raw", jac)
        .filter(F.col("_jac_raw") >= 0.6)
        .select("doc1", "doc2", F.round("_jac_raw", 4).alias("jac"))
    )
