"""Second text tranche: corpus-quality operators an LLM training-data
pipeline runs per document and per corpus — repetition detection
(Gopher-style duplicate n-gram fraction), lexical diversity (type-token
ratio, hapax counts), bigram PMI collocation mining, and length-decile
profiling. The reference's text plane (OpenSearch, SURVEY §2.8) has no
analytics like these; they extend X5 with the quality-filter surface
(`documents` table, SURVEY §2.11).

Scale notes: t09/t10 are array-local per row (no explode for t09 — the
trigram list never leaves its row); t11 shuffles tokens once per level
(bigram + two unigram legs, all map-side combined); t12's global ntile
is the one intentionally single-partition op (decile boundaries are a
driver-sized problem — at 100 TB replace with approx_percentile
boundaries + a range join, same shape as q38's sketch contract).
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from serverless_datalake_aws_spark.catalog import register_views, table
from serverless_datalake_aws_spark.plans import query

try:  # UDF closures must survive worker-side import (cwd ≠ repo root)
    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover
    pass



@query(
    "t09_trigram_repetition",
    oracle="""
    SELECT doc_id,
      len(tg) AS n_trigrams,
      len(list_distinct(tg)) AS n_distinct,
      round(1.0 - CAST(len(list_distinct(tg)) AS DOUBLE)
            / greatest(len(tg), 1), 6) AS dup_frac
    FROM (
      SELECT doc_id,
        list_transform(generate_series(1, greatest(len(toks) - 2, 0)),
          i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2])) AS tg
      FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    )
    """,
)
def t09_trigram_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filter: fraction of duplicate word
    trigrams per document. The trigram array is built with a
    transform-over-sequence lambda and never explodes — each row's
    check is O(doc length) local work, embarrassingly parallel at any
    scale. Spark's sequence(1, n) counts DOWN when n < 1 (unlike
    DuckDB's empty generate_series), hence the CASE guard."""
    register_views(spark, sf_dir, ("documents",))
    return spark.sql(
        """
        SELECT doc_id,
          cast(size(tg) AS bigint) AS n_trigrams,
          cast(size(array_distinct(tg)) AS bigint) AS n_distinct,
          round(1.0 - cast(size(array_distinct(tg)) AS double)
                / greatest(size(tg), 1), 6) AS dup_frac
        FROM (
          SELECT doc_id,
            CASE WHEN size(toks) >= 3 THEN
              transform(sequence(1, size(toks) - 2),
                i -> concat(element_at(toks, i), ' ',
                            element_at(toks, i + 1), ' ',
                            element_at(toks, i + 2)))
            ELSE array() END AS tg
          FROM (SELECT doc_id, split(text, ' ') AS toks FROM documents)
        )
        """
    )


@query(
    "t10_lexical_diversity",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ),
    wc AS (SELECT doc_id, w, count(*) AS c FROM tok GROUP BY doc_id, w)
    SELECT doc_id,
      CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
      count(*) AS n_distinct,
      CAST(sum(c) AS BIGINT) AS n_tokens,
      round(CAST(count(*) AS DOUBLE) / sum(c), 6) AS ttr
    FROM wc GROUP BY doc_id
    """,
)
def t10_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-token ratio + hapax-legomena count per document — the
    lexical-diversity features quality classifiers consume. Explode →
    two-level aggregation; both groupBys share the doc_id prefix so the
    second reuses the first's partitioning (one wide shuffle total)."""
    register_views(spark, sf_dir, ("documents",))
    return spark.sql(
        """
        WITH tok AS (
          SELECT doc_id, explode(split(text, ' ')) AS w FROM documents
        ),
        wc AS (SELECT doc_id, w, count(*) AS c FROM tok GROUP BY doc_id, w)
        SELECT doc_id,
          sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS hapax,
          count(*) AS n_distinct,
          sum(c) AS n_tokens,
          round(cast(count(*) AS double) / sum(c), 6) AS ttr
        FROM wc GROUP BY doc_id
        """
    )


@query(
    "t11_bigram_pmi",
    oracle="""
    WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
    big AS (
      SELECT unnest(list_transform(generate_series(1, greatest(len(t) - 1, 0)),
             i -> concat(t[i], ' ', t[i+1]))) AS bg
      FROM toks
    ),
    uni AS (SELECT unnest(t) AS w FROM toks),
    bc AS (SELECT bg, count(*) AS c_xy FROM big GROUP BY bg),
    uc AS (SELECT w, count(*) AS c FROM uni GROUP BY w),
    tot AS (SELECT (SELECT count(*) FROM big) AS b_total,
                   (SELECT count(*) FROM uni) AS n_total)
    SELECT bg, c_xy,
      round(ln((CAST(c_xy AS DOUBLE) / b_total) /
            ((CAST(u1.c AS DOUBLE) / n_total) * (CAST(u2.c AS DOUBLE) / n_total))),
            4) AS pmi
    FROM bc, tot
    JOIN uc u1 ON u1.w = string_split(bg, ' ')[1]
    JOIN uc u2 ON u2.w = string_split(bg, ' ')[2]
    WHERE c_xy >= 5
    ORDER BY pmi DESC, bg LIMIT 50
    """,
)
def t11_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: pointwise mutual information of adjacent
    word pairs, top-50 (deterministic tie-break on the bigram string).
    Corpus totals ride along as a broadcast scalar subquery; the
    unigram legs broadcast into the bigram counts (vocab ≪ corpus), so
    the only big shuffle is the bigram groupBy — which map-side
    combines to vocab² at most."""
    register_views(spark, sf_dir, ("documents",))
    return spark.sql(
        """
        WITH toks AS (SELECT split(text, ' ') AS t FROM documents),
        big AS (
          SELECT explode(
            CASE WHEN size(t) >= 2 THEN
              transform(sequence(1, size(t) - 1),
                i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))
            ELSE array() END) AS bg
          FROM toks
        ),
        uni AS (SELECT explode(t) AS w FROM toks),
        bc AS (SELECT bg, count(*) AS c_xy FROM big GROUP BY bg),
        uc AS (SELECT w, count(*) AS c FROM uni GROUP BY w),
        tot AS (SELECT (SELECT count(*) FROM big) AS b_total,
                       (SELECT count(*) FROM uni) AS n_total)
        SELECT bg, c_xy,
          round(ln((cast(c_xy AS double) / b_total) /
                ((cast(u1.c AS double) / n_total) * (cast(u2.c AS double) / n_total))),
                4) AS pmi
        FROM bc CROSS JOIN tot
        JOIN uc u1 ON u1.w = element_at(split(bg, ' '), 1)
        JOIN uc u2 ON u2.w = element_at(split(bg, ' '), 2)
        WHERE c_xy >= 5
        ORDER BY pmi DESC, bg LIMIT 50
        """
    )


@query(
    "t13_stratified_split",
    oracle="""
    WITH assigned AS (
      SELECT lang, n_chars,
        CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
             ELSE 'test' END AS split
      FROM (
        SELECT lang, n_chars,
          CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
               AS BIGINT) % 100 AS b
        FROM documents
      )
    )
    SELECT lang, split, count(*) AS n_docs,
      round(avg(n_chars), 4) AS avg_chars,
      round(CAST(count(*) AS DOUBLE)
            / sum(count(*)) OVER (PARTITION BY lang), 4) AS frac_of_lang
    FROM assigned
    GROUP BY lang, split
    """,
)
def t13_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (80/10/10 by doc_id hash
    modulus) with per-language stratum accounting — the reproducible
    split assignment an LLM corpus pipeline bakes in before any
    shuffling. Hash-modulus assignment is stable across engines, runs,
    partitionings, and scale (rand()/TABLESAMPLE are none of those);
    the windowed fraction audits stratum balance in the same pass."""
    docs = table(spark, sf_dir, "documents")
    b = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 100
    )
    split = (
        F.when(b < 80, "train").when(b < 90, "val").otherwise("test")
    )
    from pyspark.sql.window import Window as W

    counts = (
        docs.select("lang", "n_chars", split.alias("split"))
        .groupBy("lang", "split")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        )
    )
    return counts.select(
        "lang",
        "split",
        "n_docs",
        "avg_chars",
        F.round(
            F.col("n_docs").cast("double")
            / F.sum("n_docs").over(W.partitionBy("lang")),
            4,
        ).alias("frac_of_lang"),
    )


@query(
    "t14_pandas_udf_quality",
    oracle="""
    SELECT doc_id,
      CAST(round(CAST(
        0.6 * (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
               / greatest(len(string_split(text, ' ')), 1))
      + 0.4 * least(CAST(n_chars AS DOUBLE) / 500.0, 1.0)
      AS DECIMAL(18,6)), 4) AS DOUBLE) AS quality
    FROM documents
    """,
)
def t14_pandas_udf_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar Arrow-vectorized pandas UDF (§2.10's vectorized hook, the
    scalar sibling of d06's applyInPandas): a composite quality score
    (type-token ratio + length saturation) computed batch-at-a-time in
    pandas. The SQL oracle recomputes the identical formula
    declaratively, proving the Arrow UDF path agrees with codegen —
    the contract any custom transform hook must meet before it touches
    a 100 TB corpus."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _quality(text, n_chars):  # no hints: postponed-eval string
        # annotations ('pd.Series') defeat pandas_udf type inference
        toks = text.str.split(" ")
        ttr = toks.map(lambda t: len(set(t)) / max(len(t), 1))
        len_norm = (n_chars.astype("float64") / 500.0).clip(upper=1.0)
        return 0.6 * ttr + 0.4 * len_norm

    docs = table(spark, sf_dir, "documents")
    # round JVM-side through an exact decimal image (pandas .round is
    # half-even, DuckDB round is half-away — see e07's rounding note)
    q = _quality(F.col("text"), F.col("n_chars")).cast("decimal(18,6)")
    return docs.select(
        "doc_id", F.round(q, 4).cast("double").alias("quality")
    )


@query(
    "t15_bpe_pair_counts",
    oracle="""
    WITH words AS (
      SELECT unnest(string_split(text, ' ')) AS w FROM documents
    ),
    pairs AS (
      SELECT unnest(list_transform(generate_series(1, greatest(len(w) - 1, 0)),
             i -> substr(w, i, 2))) AS pair
      FROM words
    )
    SELECT pair, count(*) AS n
    FROM pairs
    GROUP BY pair
    ORDER BY n DESC, pair LIMIT 50
    """,
)
def t15_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE merge-candidate counting: frequency of every adjacent
    character pair within words across the corpus — the statistic the
    first byte-pair-encoding merge step maximizes (iterating merge →
    recount yields a full tokenizer vocab; each round is this same
    plan). Explode + count with map-side combine; shuffle bounded by
    the pair alphabet (≤ charset²), not corpus size."""
    register_views(spark, sf_dir, ("documents",))
    return spark.sql(
        """
        WITH words AS (
          SELECT explode(split(text, ' ')) AS w FROM documents
        ),
        pairs AS (
          SELECT explode(
            CASE WHEN length(w) >= 2 THEN
              transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))
            ELSE array() END) AS pair
          FROM words
        )
        SELECT pair, count(*) AS n
        FROM pairs
        GROUP BY pair
        ORDER BY n DESC, pair LIMIT 50
        """
    )


@query(
    "t16_zipf_fit",
    oracle="""
    WITH freq AS (
      SELECT w AS token, count(*) AS n
      FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      WHERE len(w) > 0
      GROUP BY w
    ),
    ranked AS (
      SELECT n, row_number() OVER (ORDER BY n DESC, token) AS rnk
      FROM freq
    )
    SELECT round(regr_slope(ln(n), ln(rnk)), 6) AS zipf_slope,
           round(regr_intercept(ln(n), ln(rnk)), 6) AS zipf_intercept,
           round(regr_r2(ln(n), ln(rnk)), 6) AS r2,
           count(*) AS n_tokens
    FROM ranked WHERE rnk <= 500
    """,
)
def t16_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the corpus vocabulary: OLS slope of
    log-frequency vs log-rank for the top 500 tokens (natural text
    sits near -1; synthetic/templated corpora deviate — a standard
    pretraining-corpus health check). Token counting is map-side
    combined; ranking the vocabulary is a single-partition sort of
    vocab-size rows (not corpus-size), and at 100 TB the top-500 cut
    would ride a TakeOrdered of per-partition top-500s."""
    register_views(spark, sf_dir, ("documents",))
    return spark.sql(
        """
        WITH freq AS (
          SELECT w AS token, count(*) AS n
          FROM (SELECT explode(split(text, ' ')) AS w FROM documents)
          WHERE length(w) > 0
          GROUP BY w
        ),
        ranked AS (
          SELECT n, row_number() OVER (ORDER BY n DESC, token) AS rnk
          FROM freq
        )
        SELECT round(regr_slope(ln(n), ln(rnk)), 6) AS zipf_slope,
               round(regr_intercept(ln(n), ln(rnk)), 6) AS zipf_intercept,
               round(regr_r2(ln(n), ln(rnk)), 6) AS r2,
               count(*) AS n_tokens
        FROM ranked WHERE rnk <= 500
        """
    )


@query(
    "t12_length_deciles",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, n_chars,
             len(string_split(text, ' ')) AS n_tokens,
             ntile(10) OVER (ORDER BY n_chars, doc_id) AS decile
      FROM documents
    )
    SELECT decile, count(*) AS n_docs,
           min(n_chars) AS min_chars, max(n_chars) AS max_chars,
           round(avg(n_tokens), 4) AS avg_tokens
    FROM ranked GROUP BY decile
    """,
)
def t12_length_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus length profile: documents bucketed into exact deciles by
    length, with per-decile token stats — the histogram a curation
    pipeline uses to set length cutoffs. The global ntile is the one
    deliberately single-partition step (rank boundaries are global);
    at 100 TB swap to approx_percentile cut points + a broadcast range
    join, trading exactness for a fully parallel plan."""
    register_views(spark, sf_dir, ("documents",))
    return spark.sql(
        """
        WITH ranked AS (
          SELECT doc_id, n_chars,
                 cast(size(split(text, ' ')) AS bigint) AS n_tokens,
                 ntile(10) OVER (ORDER BY n_chars, doc_id) AS decile
          FROM documents
        )
        SELECT decile, count(*) AS n_docs,
               min(n_chars) AS min_chars, max(n_chars) AS max_chars,
               round(avg(n_tokens), 4) AS avg_tokens
        FROM ranked GROUP BY decile
        """
    )


@query(
    "t17_unigram_perplexity",
    oracle="""
    WITH tok AS (
      SELECT doc_id, w
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
      WHERE len(w) > 0
    ),
    vocab AS (SELECT w, count(*) AS n FROM tok GROUP BY w),
    total AS (SELECT sum(n) AS t FROM vocab)
    SELECT doc_id, count(*) AS n_tokens,
           round(avg(-ln(v.n / total.t)), 6) AS cross_entropy,
           round(exp(avg(-ln(v.n / total.t))), 4) AS ppl
    FROM tok JOIN vocab v USING (w) CROSS JOIN total
    GROUP BY doc_id
    """,
)
def t17_unigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity filtering (CCNet/Gopher-style corpus quality): score
    each document by its per-token cross-entropy under the corpus's own
    unigram LM; exp(H) = perplexity. Low-ppl docs are repetitive
    boilerplate, high-ppl docs are noise — the standard pretraining cut
    is on this column.

    Two passes over tokens: one to build the vocab (map-side combined),
    one scoring join. The vocab and scalar total are broadcast so the
    token stream is never shuffled for scoring. At 100 TB the LM would
    be a pruned top-K vocab + smoothing constant — same plan, the join
    stays broadcast; and a real KenLM would ride mapInPandas."""
    docs = table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    ).filter(F.length("w") > 0)
    vocab = tok.groupBy("w").agg(F.count("*").alias("n"))
    total = vocab.agg(F.sum("n").alias("t"))
    nll = -F.log(F.col("n") / F.col("t"))
    return (
        tok.join(F.broadcast(vocab), "w")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.avg(nll), 6).alias("cross_entropy"),
            F.round(F.exp(F.avg(nll)), 4).alias("ppl"),
        )
    )


@query(
    "t18_winnowing_fingerprints",
    oracle="""
    WITH g AS (
      SELECT doc_id,
        list_transform(generate_series(1, greatest(len(text) - 4, 0)),
          i -> CAST(concat('0x', substr(md5(substr(text, i, 5)), 1, 14))
                    AS BIGINT) % 1000000007) AS hs
      FROM documents WHERE n_chars >= 8
    ),
    w AS (
      SELECT doc_id, len(hs) AS n_grams,
        list_distinct(list_transform(generate_series(1, len(hs) - 3),
            j -> list_min(list_slice(hs, j, j + 3)))) AS fps
      FROM g
    )
    SELECT doc_id, n_grams, len(fps) AS n_fps,
      md5(array_to_string(list_sort(fps), ',')) AS fp_digest
    FROM w
    """,
)
def t18_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., the MOSS
    scheme): hash every char 5-gram, slide a window of 4 hashes, keep
    each window's minimum — guaranteeing any shared substring of
    length ≥ 8 contributes a common fingerprint, which set-based
    hashing (d02) structurally cannot. The positional local-min
    selection is what makes partial-overlap/plagiarism detection work;
    matching docs are then found by joining on exploded fingerprints
    (same shape as d04's band join).

    All array-local per row — no explode, no shuffle; hashes are
    md5-affine (TX.token_hash) so DuckDB reproduces them bit-for-bit."""
    # filter on length(text) itself, not the n_chars column: the t09
    # CASE-guard rule (Spark's sequence(1, n) counts DOWN when n < 1)
    # must not lean on the fixture invariant n_chars == length(text) —
    # a doc where the two drift would emit descending-sequence garbage
    # here while DuckDB's generate_series is empty
    docs = table(spark, sf_dir, "documents").filter(
        (F.col("n_chars") >= 8) & (F.length("text") >= 8)
    )
    hs = F.expr(
        "transform(sequence(1, length(text) - 4),"
        " i -> cast(conv(substr(md5(substring(text, i, 5)), 1, 14), 16, 10)"
        "      as bigint) % 1000000007)"
    )
    w = docs.select("doc_id", hs.alias("hs")).select(
        "doc_id",
        F.size("hs").alias("n_grams"),
        # length >= 8 ⇒ size(hs) >= 4 ⇒ the inner sequence ascends
        F.array_distinct(
            F.expr("transform(sequence(1, size(hs) - 3),"
                   " j -> array_min(slice(hs, j, 4)))")
        ).alias("fps"),
    )
    return w.select(
        "doc_id",
        "n_grams",
        F.size("fps").cast("long").alias("n_fps"),
        F.md5(
            F.array_join(F.expr("transform(array_sort(fps), x -> cast(x as string))"), ",")
        ).alias("fp_digest"),
    )


@query(
    "t19_regex_tokenizer_counts",
    oracle="""
    SELECT doc_id,
           len(list_filter(string_split(text, ' '), w -> len(w) > 0))
               AS ws_tokens,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]'))
               AS bpe_tokens,
           round(CAST(len(regexp_extract_all(text,
                 '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS DOUBLE)
                 / greatest(len(list_filter(string_split(text, ' '),
                   w -> len(w) > 0)), 1), 4) AS fertility
    FROM documents
    """,
)
def t19_regex_tokenizer_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting both ways a data pipeline needs it: whitespace
    tokens and a GPT-2-style pre-tokenizer regex (letter runs, single
    digits, punctuation), plus their ratio — the 'fertility' estimate
    that turns corpus bytes into a token budget before any real BPE
    runs. Pure per-row regex work in whole-stage codegen: no explode,
    no shuffle, linear scan at any corpus size."""
    docs = table(spark, sf_dir, "documents")
    # idx=0 (whole match): Spark defaults to capture group 1 and errors
    # on group-free patterns; DuckDB defaults to 0
    bpe = F.size(
        F.regexp_extract_all("text", F.lit(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"), 0)
    )
    ws = F.size(F.filter(F.split("text", " "), lambda w: F.length(w) > 0))
    return docs.select(
        "doc_id",
        ws.cast("long").alias("ws_tokens"),
        bpe.cast("long").alias("bpe_tokens"),
        F.round(
            bpe.cast("double") / F.greatest(ws, F.lit(1)), 4
        ).alias("fertility"),
    )
