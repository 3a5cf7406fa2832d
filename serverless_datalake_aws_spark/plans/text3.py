"""Round-2 text-analysis additions (SURVEY §2.11 language-ID family).

t20: language identification the way production pipelines actually do
it — character-n-gram profiles learned FROM THE CORPUS (Cavnar-Trenkle
style), not hand-picked marker words (t04's variant). The per-language
profile is tiny (top-k trigrams), so classification is a broadcast
join against exploded doc trigrams: corpus-sized map work, no wide
shuffle beyond the profile aggregation.
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from serverless_datalake_aws_spark.catalog import table
from serverless_datalake_aws_spark.plans import query

try:  # UDF closures must survive worker-side import (cwd ≠ repo root)
    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover
    pass


_TOPK = 20
_CHUNK = 200
_STRIDE = 150  # 50-char overlap between consecutive chunks


@query(
    "t21_chunk_overlap",
    oracle=f"""
    SELECT doc_id,
           k AS chunk_idx,
           CAST(1 + k * {_STRIDE} AS BIGINT) AS chunk_start,
           CAST(len(substr(text, 1 + k * {_STRIDE}, {_CHUNK})) AS BIGINT)
               AS chunk_chars,
           md5(substr(text, 1 + k * {_STRIDE}, {_CHUNK})) AS chunk_md5
    FROM (
      SELECT doc_id, text,
             unnest(generate_series(0,
                 CAST((len(text) - 1) // {_STRIDE} AS BIGINT))) AS k
      FROM documents WHERE len(text) >= 1
    )
    """,
)
def t21_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-size chunking ({_CHUNK}-char windows,
    {_STRIDE}-char stride → {_CHUNK - _STRIDE}-char overlap) — the
    retrieval/embedding chunker every RAG-style pipeline runs before
    embedding. One row per chunk with its offset, length, and content
    digest (the dedupable identity of the chunk).

    Scale: sequence+explode multiplies rows executor-side with no
    shuffle at all — output partitioning inherits the scan, so the
    downstream embedder (mm03's mapInPandas shape) chains
    shuffle-free. Chunk text itself is not materialized in the result;
    the md5 stands in (join back by (doc_id, chunk_start) to re-slice
    when needed)."""
    docs = table(spark, sf_dir, "documents").filter(F.length("text") >= 1)
    chunked = docs.select(
        "doc_id",
        "text",
        F.explode(
            F.sequence(
                F.lit(0),
                ((F.length("text") - 1) / _STRIDE).cast("long"),
            )
        ).alias("k"),
    )
    chunk = F.col("text").substr(
        (F.lit(1) + F.col("k") * _STRIDE).cast("int"), F.lit(_CHUNK)
    )
    return chunked.select(
        "doc_id",
        F.col("k").alias("chunk_idx"),
        (F.lit(1) + F.col("k") * _STRIDE).cast("long").alias("chunk_start"),
        F.length(chunk).cast("long").alias("chunk_chars"),
        F.md5(chunk).alias("chunk_md5"),
    )


@query(
    "t20_trigram_langid",
    oracle=f"""
    WITH tg AS (
      SELECT doc_id, lang,
             unnest(list_transform(generate_series(1, len(text) - 2),
                    i -> substr(text, i, 3))) AS tg
      FROM documents WHERE len(text) >= 3
    ),
    pc AS (SELECT lang, tg, count(*) AS c FROM tg GROUP BY lang, tg),
    profile AS (
      SELECT lang, tg FROM pc
      QUALIFY row_number() OVER (PARTITION BY lang ORDER BY c DESC, tg)
              <= {_TOPK}
    ),
    dt AS (SELECT DISTINCT doc_id, lang, tg FROM tg),
    hits AS (
      SELECT dt.doc_id, dt.lang, p.lang AS cand_lang, count(*) AS score
      FROM dt JOIN profile p ON dt.tg = p.tg
      GROUP BY 1, 2, 3
    ),
    pred AS (
      SELECT doc_id, lang, cand_lang FROM hits
      QUALIFY row_number() OVER (PARTITION BY doc_id
                                 ORDER BY score DESC, cand_lang) = 1
    )
    SELECT lang, cand_lang AS predicted, count(*) AS n_docs
    FROM pred GROUP BY 1, 2
    """,
)
def t20_trigram_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained trigram language classifier + confusion matrix.

    Train: explode char trigrams → (lang, tg) counts (map-side
    combined) → top-{_TOPK} per language. Classify: distinct doc
    trigrams ⋈ broadcast(profile) → overlap score per candidate lang →
    argmax (deterministic tiebreak on lang). Output is the confusion
    matrix (true lang, predicted, docs), the quality gate a training
    pipeline actually monitors.

    Scale: the profile is ≤ {_TOPK}·|langs| rows — always broadcast;
    the only wide shuffles aggregate slim (lang, tg) and (doc, lang)
    keys. The trigram arrays are computed ONCE and cached (the substr
    transform is an interpreted higher-order chain — recomputing it
    per consumer branch was a third of the query), and the classify
    side dedups trigrams ARRAY-LOCALLY (`array_distinct` before the
    explode) instead of a corpus-wide DISTINCT shuffle. Docs shorter
    than 3 chars or with zero profile hits drop out in both engines
    (inner-join semantics)."""
    docs = table(spark, sf_dir, "documents").filter(F.length("text") >= 3)
    arr = docs.select(
        "doc_id",
        "lang",
        F.transform(
            F.sequence(F.lit(1), F.length("text") - 2),
            lambda i: F.col("text").substr(i, F.lit(3)),
        ).alias("arr"),
    ).cache()
    arr.count()  # materialize once: both branches below read it
    tg = arr.select("doc_id", "lang", F.explode("arr").alias("tg"))
    pc = tg.groupBy("lang", "tg").agg(F.count("*").alias("c"))
    w = W.partitionBy("lang").orderBy(F.col("c").desc(), "tg")
    profile = (
        pc.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= _TOPK)
        .select(F.col("lang").alias("cand_lang"), "tg")
    )
    dt = arr.select(
        "doc_id", "lang", F.explode(F.array_distinct("arr")).alias("tg")
    )
    hits = (
        dt.join(F.broadcast(profile), "tg")
        .groupBy("doc_id", "lang", "cand_lang")
        .agg(F.count("*").alias("score"))
    )
    w_pred = W.partitionBy("doc_id").orderBy(F.col("score").desc(), "cand_lang")
    pred = hits.withColumn("_rk", F.row_number().over(w_pred)).filter(
        F.col("_rk") == 1
    )
    return pred.groupBy("lang", F.col("cand_lang").alias("predicted")).agg(
        F.count("*").alias("n_docs")
    )


@query(
    "t22_source_sampling_weights",
    oracle="""
    WITH s AS (
        SELECT source, count(*) AS n_docs,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        FROM documents GROUP BY source
    ),
    w AS (
        SELECT source, n_docs, n_tokens,
               pow(n_tokens::DOUBLE
                   / (SELECT CAST(sum(n_tokens) AS BIGINT) FROM s), 0.3)
                   AS pw
        FROM s
    )
    SELECT source, n_docs, n_tokens,
           round(pw / (SELECT sum(pw) FROM w), 6) AS sample_weight
    FROM w
    """,
)
def t22_source_sampling_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source sampling weights (§2.11): the
    multilingual/multi-source mixing rule (p_s ∝ share^alpha,
    alpha=0.3) from the mC4/XLM-R lineage — upsamples low-resource
    sources for training-data mixture design. Token counts per source,
    raised to alpha, renormalized.

    Scale: two tiny aggregations (one row per source); the token count
    is the only pass over the corpus, map-side combined. Exact integer
    token sums keep the power-law input deterministic across engines;
    the 6-dp round absorbs libm pow ulp drift."""
    docs = table(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).alias("n_tokens"),
    )
    total = per_src.agg(F.sum("n_tokens").alias("tot")).select("tot")
    w = per_src.crossJoin(F.broadcast(total)).withColumn(
        "pw", F.pow(F.col("n_tokens").cast("double") / F.col("tot"), 0.3)
    )
    z = w.agg(F.sum("pw").alias("z")).select("z")
    return (
        w.crossJoin(F.broadcast(z))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.round(F.col("pw") / F.col("z"), 6).alias("sample_weight"),
        )
    )


_CM_DEPTH = 4
_CM_WIDTH = 64
_CM_TOPK = 20


@query(
    "t23_count_min_heavy_hitters",
    oracle=f"""
    WITH tok AS (
        SELECT unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    exact AS (
        SELECT tok, count(*) AS exact_n FROM tok GROUP BY tok
    ),
    bucketed AS (
        SELECT tok, exact_n, d,
               CAST(concat('0x', substr(md5(concat(CAST(d AS VARCHAR), ':', tok)), 1, 14))
                    AS BIGINT) % {_CM_WIDTH} AS bucket
        FROM exact, generate_series(0, {_CM_DEPTH - 1}) AS gs(d)
    ),
    sketch AS (
        SELECT d, bucket, CAST(sum(exact_n) AS BIGINT) AS cm
        FROM bucketed GROUP BY d, bucket
    ),
    top AS (
        SELECT tok, exact_n FROM exact
        ORDER BY exact_n DESC, tok LIMIT {_CM_TOPK}
    )
    SELECT t.tok, t.exact_n,
           CAST(min(s.cm) AS BIGINT) AS est_n,
           CAST(min(s.cm) - t.exact_n AS BIGINT) AS overestimate
    FROM top t
    JOIN bucketed b ON b.tok = t.tok
    JOIN sketch s ON s.d = b.d AND s.bucket = b.bucket
    GROUP BY t.tok, t.exact_n
    """,
)
def t23_count_min_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch heavy hitters with accuracy audit (§2.11): a
    4×64 count-min sketch over the token stream, estimates for the
    top-20 exact heavy hitters, and the per-token overestimate
    (always ≥ 0 — count-min errs only upward). The d10/s11 audit
    pattern applied to frequency sketches.

    Scale: the sketch is 4·64 integers REGARDLESS of
    corpus size — each executor folds its partition into partial bucket
    sums (one map-side-combined groupBy), and merging sketches is
    addition. At 100 TB the exact-count leg disappears and only the
    sketch runs; here it exists to measure the error the width/depth
    choice buys. All-integer math — no parity drift possible."""
    from serverless_datalake_aws_spark.functions import text as TX

    docs = table(spark, sf_dir, "documents")
    exact = (
        docs.select(F.explode(TX.tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("exact_n"))
    )
    buckets = F.array(
        *[
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit(f"{d}:"), F.col("tok"))),
                        1,
                        14,
                    ),
                    16,
                    10,
                ).cast("long")
                % _CM_WIDTH
            )
            for d in range(_CM_DEPTH)
        ]
    )
    bucketed = exact.select(
        "tok", "exact_n", F.posexplode(buckets).alias("d", "bucket")
    )
    sketch = bucketed.groupBy("d", "bucket").agg(F.sum("exact_n").alias("cm"))
    top = exact.orderBy(F.col("exact_n").desc(), "tok").limit(_CM_TOPK)
    return (
        bucketed.join(F.broadcast(top.select("tok")), "tok")
        .join(F.broadcast(sketch), ["d", "bucket"])
        .groupBy("tok")
        .agg(
            F.first("exact_n").alias("exact_n"),
            F.min("cm").alias("est_n"),
            (F.min("cm") - F.first("exact_n")).alias("overestimate"),
        )
    )


@query(
    "t24_source_divergence",
    oracle="""
    WITH tok AS (
        SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    sc AS (
        SELECT source, tok, count(*)::DOUBLE AS n FROM tok GROUP BY 1, 2
    ),
    st AS (SELECT source, sum(n) AS tot FROM sc GROUP BY 1),
    cc AS (SELECT tok, count(*)::DOUBLE AS cn FROM tok GROUP BY 1),
    ct AS (SELECT sum(cn) AS ctot FROM cc)
    SELECT sc.source,
           CAST(st.tot AS BIGINT) AS n_tokens,
           round(sum((n / tot) * ln((n / tot) / (cn / ctot))), 6)
               AS kl_divergence
    FROM sc
      JOIN st USING (source)
      JOIN cc USING (tok)
      CROSS JOIN ct
    GROUP BY sc.source, st.tot
    """,
)
def t24_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source KL divergence from the corpus unigram distribution
    (§2.11 mixture diagnostics): KL(P_source ‖ P_corpus) flags sources
    whose token distribution drifts from the blend — the quantitative
    companion to t22's mixing weights when curating a training mixture.

    Scale: two token-count aggregations (map-side combined) and a join
    on the vocabulary — shuffle ∝ vocabulary × sources, not corpus
    bytes. Corpus totals are scalar broadcasts. Counts stay exact
    integers until the final double division; 6-dp round absorbs
    summation-order ulp."""
    from serverless_datalake_aws_spark.functions import text as TX

    docs = table(spark, sf_dir, "documents")
    tok = docs.select("source", F.explode(TX.tokens("text")).alias("tok"))
    sc = tok.groupBy("source", "tok").agg(
        F.count("*").cast("double").alias("n")
    )
    st = sc.groupBy("source").agg(F.sum("n").alias("tot"))
    cc = tok.groupBy("tok").agg(F.count("*").cast("double").alias("cn"))
    ct = cc.agg(F.sum("cn").alias("ctot"))
    p_s = F.col("n") / F.col("tot")
    p_c = F.col("cn") / F.col("ctot")
    return (
        sc.join(F.broadcast(st), "source")
        .join(F.broadcast(cc), "tok")
        .crossJoin(F.broadcast(ct))
        .groupBy("source", "tot")
        .agg(F.round(F.sum(p_s * F.log(p_s / p_c)), 6).alias("kl_divergence"))
        .select(
            "source",
            F.col("tot").cast("long").alias("n_tokens"),
            "kl_divergence",
        )
    )


@query(
    "t25_quality_filter_report",
    oracle="""
    WITH sig AS (
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_tokens,
               len(list_distinct(string_split(text, ' '))) AS n_distinct,
               CAST(len(replace(text, ' ', '')) AS DOUBLE)
                   / greatest(len(string_split(text, ' ')), 1)
                   AS mean_tok_len
        FROM documents
    )
    SELECT doc_id, n_tokens,
           round(CAST(n_distinct AS DOUBLE) / greatest(n_tokens, 1), 6)
               AS diversity,
           round(mean_tok_len, 6) AS mean_tok_len,
           (n_tokens >= 20
            AND CAST(n_distinct AS DOUBLE) / greatest(n_tokens, 1) >= 0.3
            AND mean_tok_len BETWEEN 2 AND 12) AS keep,
           CASE
             WHEN n_tokens < 20 THEN 'too_short'
             WHEN CAST(n_distinct AS DOUBLE) / greatest(n_tokens, 1) < 0.3
                  THEN 'low_diversity'
             WHEN mean_tok_len < 2 OR mean_tok_len > 12
                  THEN 'token_len_outlier'
           END AS drop_reason
    FROM sig
    """,
)
def t25_quality_filter_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality filter with per-document verdicts and the
    first failed rule (§2.11) — the 'filter with reasons' stage real
    curation pipelines run (Gopher/C4-style rule stacks) and audit by
    drop_reason histogram. Rules: minimum length, type-token
    diversity, mean token length band.

    Scale: every signal is row-local array math — no shuffle, no UDF;
    the report streams at scan speed. Ratios are int/int divisions
    (exact in both engines) so rule boundaries cannot flip."""
    docs = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_tokens = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    mean_len = F.length(F.regexp_replace("text", " ", "")).cast(
        "double"
    ) / F.greatest(n_tokens, F.lit(1))
    diversity = n_distinct.cast("double") / F.greatest(n_tokens, F.lit(1))
    sig = docs.select(
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        diversity.alias("_div"),
        mean_len.alias("_mtl"),
    )
    keep = (
        (F.col("n_tokens") >= 20)
        & (F.col("_div") >= 0.3)
        & F.col("_mtl").between(2, 12)
    )
    reason = (
        F.when(F.col("n_tokens") < 20, "too_short")
        .when(F.col("_div") < 0.3, "low_diversity")
        .when(
            (F.col("_mtl") < 2) | (F.col("_mtl") > 12), "token_len_outlier"
        )
    )
    return sig.select(
        "doc_id",
        "n_tokens",
        F.round("_div", 6).alias("diversity"),
        F.round("_mtl", 6).alias("mean_tok_len"),
        keep.alias("keep"),
        reason.alias("drop_reason"),
    )


@query(
    "t26_ngram_novelty",
    oracle="""
    WITH g AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   generate_series(1, len(string_split(text,' ')) - 2),
                   i -> array_to_string(string_split(text,' ')[i:i+2], ' '))))
                   AS gm
        FROM documents
    ),
    first_seen AS (
        SELECT gm, min(doc_id) AS first_doc FROM g GROUP BY gm
    )
    SELECT g.doc_id,
           count(*) AS n_grams,
           CAST(sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           round(sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)::DOUBLE
                 / count(*), 6) AS novelty
    FROM g JOIN first_seen f USING (gm)
    GROUP BY g.doc_id
    """,
)
def t26_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-occurrence n-gram novelty per document (§2.11): the
    fraction of a doc's distinct 3-grams never seen in any
    earlier-id document — the freshness/diminishing-returns curve
    dataset curators read before adding another crawl snapshot (novelty
    → 0 means the source is exhausted; near-dups show up as ~0 novelty
    documents).

    Scale: one explode + one min-aggregation on the gram key + one join
    back — shuffle ∝ distinct grams, not corpus bytes; the novelty
    flag is an integer compare on the aggregated first_doc. All-integer
    math, no parity drift."""
    docs = table(spark, sf_dir, "documents")
    from serverless_datalake_aws_spark.functions import text as TX

    g = docs.select(
        "doc_id",
        F.explode(F.array_distinct(TX.word_ngrams("text", 3))).alias("gm"),
    ).cache()
    g.count()  # materialize: read by first_seen and the join leg
    first_seen = g.groupBy("gm").agg(F.min("doc_id").alias("first_doc"))
    novel = F.sum(
        F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
    )
    return (
        g.join(first_seen, "gm")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            novel.alias("n_novel"),
            F.round(novel.cast("double") / F.count("*"), 6).alias("novelty"),
        )
    )


@query(
    "t27_vocab_growth",
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tk
        FROM documents
    ),
    firsts AS (SELECT tk, min(doc_id) AS fd FROM tok GROUP BY tk),
    n AS (SELECT max(doc_id) AS mx FROM documents),
    newv AS (
        SELECT least((fd * 10) // (mx + 1), 9) AS decile,
               count(*) AS new_tokens
        FROM firsts, n GROUP BY 1
    )
    SELECT CAST(decile AS BIGINT) AS decile, new_tokens,
           CAST(sum(new_tokens) OVER (ORDER BY decile) AS BIGINT)
               AS vocab_size
    FROM newv
    """,
)
def t27_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-growth curve (the Heaps'-law companion to t16's
    Zipf fit): new distinct tokens contributed by each corpus decile
    (in doc_id order) and the cumulative vocabulary size — flattening
    growth tells curators a source is lexically exhausted (the
    corpus-level view of t26's per-doc novelty).

    Scale: one distinct-token pass keyed on the token (shuffle ∝
    vocabulary), then a 10-row cumulative window. Decile assignment is
    pure integer division — no float boundaries to flip."""
    docs = table(spark, sf_dir, "documents")
    from serverless_datalake_aws_spark.functions import text as TX
    from pyspark.sql.window import Window as W

    tok = docs.select(
        "doc_id", F.explode(TX.distinct_tokens("text")).alias("tk")
    )
    firsts = tok.groupBy("tk").agg(F.min("doc_id").alias("fd"))
    mx = docs.agg(F.max("doc_id").alias("mx"))
    newv = (
        firsts.crossJoin(F.broadcast(mx))
        .select(
            F.least(
                F.expr("(fd * 10) div (mx + 1)"), F.lit(9).cast("bigint")
            ).alias("decile")
        )
        .groupBy("decile")
        .agg(F.count("*").alias("new_tokens"))
    )
    w = W.orderBy("decile").rowsBetween(W.unboundedPreceding, 0)
    return newv.select(
        "decile",
        "new_tokens",
        F.sum("new_tokens").over(w).alias("vocab_size"),
    )
