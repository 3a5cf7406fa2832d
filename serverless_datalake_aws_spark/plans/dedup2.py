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


def _simhash_sql(bits: int) -> str:
    """DuckDB twin of the Spark simhash expression below, at any width
    up to the 56 bits the md5-derived token hash carries (powers of two
    are exact in double, so `// power(2, j)::BIGINT` is safe through
    j=55 and the bit sum stays under 2^63)."""
    return f"""
        list_sum(list_transform(generate_series(0, {bits - 1}), j ->
            CASE WHEN list_sum(list_transform(
                     list_distinct(string_split(text, ' ')), t ->
                     CASE WHEN (CAST(concat('0x', substr(md5(t), 1, 14)) AS BIGINT)
                                // power(2, j)::BIGINT) % 2 = 1
                          THEN 1 ELSE -1 END)) > 0
                 THEN power(2, j)::BIGINT ELSE 0 END))
"""


_SIMHASH_SQL = _simhash_sql(_SIMHASH_BITS)


def _simhash_col_from(hashes_col: str, bits: int = _SIMHASH_BITS):
    """SimHash of width `bits` from a materialized token-hash array
    column: bit j is set iff the majority of token hashes have bit j
    set (±1 vote per token). The md5-56 token hash bounds bits at 56."""
    hashes = F.col(hashes_col)

    def _vote(j: int):
        # two-arg merge lambda built via closure (F.aggregate requires
        # exactly (acc, x); a default-arg third param breaks arity)
        return lambda acc, h: acc + F.when(
            F.shiftright(h, j) % 2 == 1, 1
        ).otherwise(-1)

    out = None
    for j in range(bits):
        vote = F.aggregate(hashes, F.lit(0), _vote(j))
        b = F.when(vote > 0, F.lit(2**j).cast("long")).otherwise(F.lit(0))
        out = b if out is None else out + b
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


def _simhash_edge_labels(spark: SparkSession, sf_dir: str):
    """Shared near-dup graph build for d08/d16/d17: per-source simhash
    self-join (Hamming <= 6) -> edges (a, b), then min-label connected
    components. Caching + materialization before the self-join / label
    loop is load-bearing (see d05). Returns (edges, labels) with labels
    as (node, label)."""
    from serverless_datalake_aws_spark.operators.components import (
        connected_components,
    )

    docs = table(spark, sf_dir, "documents")
    n_part = spark.sparkContext.defaultParallelism
    hashed = docs.repartition(n_part, "doc_id").select(
        "doc_id",
        "source",
        F.transform(TX.distinct_tokens("text"), TX.token_hash).alias("hashes"),
    )
    sh = hashed.select(
        "doc_id", "source", _simhash_col_from("hashes").alias("simhash")
    ).cache()
    sh.count()  # materialize before the self-join (see d05)
    s1, s2 = sh.alias("s1"), sh.alias("s2")
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
    edges.count()  # materialize before fanning into the label loop
    return edges, connected_components(edges, "a", "b", max_iters=20)


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
    # min-label propagation with per-round lineage truncation
    # (operators/components.py — the VERDICT r1 §wrong.5 fix); graph
    # build shared with d16/d17 (_simhash_edge_labels)
    _edges, labels = _simhash_edge_labels(spark, sf_dir)
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
    "d11_simhash_banded_pairs",
    oracle=f"""
    WITH s AS (
        SELECT doc_id, {_SIMHASH_SQL} AS simhash
        FROM documents
    )
    SELECT s1.doc_id AS doc1, s2.doc_id AS doc2,
           bit_count(xor(s1.simhash, s2.simhash)) AS hamming
    FROM s s1 JOIN s s2 ON s1.doc_id < s2.doc_id
    WHERE bit_count(xor(s1.simhash, s2.simhash)) <= 6
    """,
)
def d11_simhash_banded_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GLOBAL SimHash near-dup via simhash-prefix banding — the 100 TB
    upgrade d05's docstring promises (VERDICT r1: 'full-scale variant
    would block on simhash bands instead of source').

    Pigeonhole decomposition: the 32-bit fingerprint splits into 7
    blocks (5,5,5,5,4,4,4 bits); any pair within Hamming distance 6
    leaves at least one block untouched, so candidates = pairs sharing
    (block_idx, block_value) — an equi-join on slim band keys, shuffle
    proportional to input, NO source/corpus-wide cross block. The
    hot-band guard (operators/banding.py) bounds degenerate bands
    (e.g. the all-zero block of short docs). Exact Hamming refine
    removes pigeonhole false positives. The oracle is the plain
    all-pairs definition — results must be identical.
    """
    docs = table(spark, sf_dir, "documents")
    n_part = spark.sparkContext.defaultParallelism
    hashed = (
        docs.repartition(n_part, "doc_id")
        .select(
            "doc_id",
            F.transform(TX.distinct_tokens("text"), TX.token_hash).alias("hashes"),
        )
        .cache()
    )
    s = hashed.select(
        "doc_id", _simhash_col_from("hashes").alias("simhash")
    ).cache()
    s.count()  # materialize before multi-read (see d05)

    # 7 blocks over 32 bits: offsets 0,5,10,15,20,24,28 / widths 5..4
    blocks = [(0, 5), (5, 5), (10, 5), (15, 5), (20, 4), (24, 4), (28, 4)]
    band_cols = F.array(
        *[
            F.concat_ws(
                ":",
                F.lit(i),
                (F.shiftright("simhash", off) % F.lit(2**width)).cast("string"),
            )
            for i, (off, width) in enumerate(blocks)
        ]
    )
    # The simhash rides the band rows (8 bytes) and the Hamming refine
    # runs INSIDE the band join: simhash bits are corpus-biased, so band
    # values are weakly selective (the 10x scale probe measured 2.6e9
    # within-band candidates on 50k docs, one band holding 69% of the
    # corpus) — materializing candidates, deduping them, and re-joining
    # fingerprints cost 80x at 10x data. With the predicate evaluated
    # during the join probe (whole-stage codegen xor+bit_count), only
    # true near-dup pairs reach the dropDuplicates shuffle.
    bands = s.select(
        "doc_id", "simhash", F.explode(band_cols).alias("band_key")
    )
    from serverless_datalake_aws_spark.operators.banding import (
        capped_band_self_join,
    )

    pairs = capped_band_self_join(
        bands,
        "band_key",
        "doc_id",
        payload="simhash",
        pair_filter=lambda h1, h2: F.bit_count(h1.bitwiseXOR(h2)) <= 6,
    )
    return (
        pairs.select(
            "doc1",
            "doc2",
            F.bit_count(F.col("payload1").bitwiseXOR(F.col("payload2")))
            .cast("long")
            .alias("hamming"),
        )
        .dropDuplicates(["doc1", "doc2"])
    )


@query(
    "d06_group_zscore_outliers",
    oracle="""
    SELECT lang, doc_id, n_chars,
           round((n_chars - avg(n_chars) OVER (PARTITION BY lang))
                 / stddev_samp(n_chars) OVER (PARTITION BY lang), 4) AS zscore
    FROM documents
    -- stddev > 0 guard: an all-equal group divides 0/0, which is NULL
    -- on duckdb 1.0 but NaN under IEEE ops — and abs(NaN) > 1.5 is
    -- TRUE, while the pandas side's NaN > 1.5 is False
    QUALIFY stddev_samp(n_chars) OVER (PARTITION BY lang) > 0
        AND abs((n_chars - avg(n_chars) OVER (PARTITION BY lang))
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


_D10_ORACLE = f"""
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
        -- len(toks) > 0 guard: DuckDB's concat SKIPS NULL minima, so an
        -- empty-shingle doc would get the same 'b-' key in every band
        -- (all-pairs candidate) while Spark's null-propagating F.concat
        -- gives it no key at all
        SELECT doc_id, b,
               concat(CAST(b AS VARCHAR), '-',
                      array_to_string(list_slice(sg, b * 4 + 1, b * 4 + 4), '-'))
                   AS band_key
        FROM (SELECT * FROM sig WHERE len(toks) > 0),
             generate_series(0, {TX.MINHASH_BANDS - 1}) AS gs(b)
    ), cand AS (
        SELECT DISTINCT b1.doc_id AS doc1, b2.doc_id AS doc2
        FROM bands b1 JOIN bands b2
          ON b1.band_key = b2.band_key AND b1.doc_id < b2.doc_id
    ), scored AS (
        SELECT doc1, doc2,
           list_sum(list_transform(generate_series(1, {TX.MINHASH_K}),
               i -> CASE WHEN s1.sg[i] = s2.sg[i] THEN 1 ELSE 0 END))
               / CAST({TX.MINHASH_K} AS DOUBLE) AS est,
           len(list_intersect(s1.toks, s2.toks))::DOUBLE
             / (len(s1.toks) + len(s2.toks)
                - len(list_intersect(s1.toks, s2.toks))) AS jac
        FROM cand
        JOIN sig s1 ON s1.doc_id = doc1
        JOIN sig s2 ON s2.doc_id = doc2
    )
    SELECT doc1, doc2, round(est, 4) AS est,
           round(jac, 4) AS jac,
           round(abs(est - jac), 4) AS abs_err
    FROM scored
"""


@query("d10_minhash_accuracy", oracle=_D10_ORACLE)
def d10_minhash_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-accuracy audit for the d04 dedup path: on every LSH
    candidate pair, the signature-agreement Jaccard estimate (matching
    components / K) against the exact shingle Jaccard, with absolute
    error — the per-pair evidence behind MinHash's E[est] = J and
    std ≈ sqrt(J(1-J)/K) ≈ 0.09 at K=32. A pipeline tunes K and the
    band/row split from exactly this audit before trusting the sketch
    at a scale where exact verification is unaffordable.

    Plan shape = d04 (slim band rows through the one shuffle) plus the
    signature re-attach join on surviving candidates; signatures come
    from the same cached relation so the 32 permutation minima compute
    once per doc (the projection-collapse trap)."""
    docs = table(spark, sf_dir, "documents")
    n_part = spark.sparkContext.defaultParallelism
    d = (
        docs.repartition(n_part, "doc_id")
        .select(
            "doc_id", F.array_distinct(TX.word_ngrams("text", n=3)).alias("toks")
        )
        .withColumn(
            "hs", F.transform("toks", lambda t: TX.token_hash(t) % TX.MINHASH_P)
        )
        .withColumn("sg", TX.minhash_signature(F.col("hs")))
        .cache()
    )
    d.count()  # materialize: bands + two signature legs read it
    # band keys from the CACHED sg array: element access on the
    # InMemoryRelation is a read — rebuilding minhash_mins(hs) here
    # would re-run all 32 permutation passes per banding row
    sg_mins = [F.col("sg")[i] for i in range(TX.MINHASH_K)]
    bands = d.select(
        "doc_id",
        F.explode(TX.lsh_band_keys(sg_mins)).alias("band_key"),
    )
    b1, b2 = bands.alias("b1"), bands.alias("b2")
    cand = (
        b1.join(
            b2,
            (F.col("b1.band_key") == F.col("b2.band_key"))
            & (F.col("b1.doc_id") < F.col("b2.doc_id")),
        )
        .select(F.col("b1.doc_id").alias("doc1"), F.col("b2.doc_id").alias("doc2"))
        .dropDuplicates(["doc1", "doc2"])
    )
    s1 = d.select(F.col("doc_id").alias("doc1"), F.col("toks").alias("t1"),
                  F.col("sg").alias("sg1"))
    s2 = d.select(F.col("doc_id").alias("doc2"), F.col("toks").alias("t2"),
                  F.col("sg").alias("sg2"))
    est = (
        F.expr("size(filter(zip_with(sg1, sg2, (x, y) -> x = y), b -> b))")
        / float(TX.MINHASH_K)
    )
    jac = TX.jaccard(F.col("t1"), F.col("t2"))
    return (
        cand.join(s1, "doc1")
        .join(s2, "doc2")
        .withColumn("_est", est)
        .withColumn("_jac", jac)
        .select(
            "doc1",
            "doc2",
            F.round("_est", 4).alias("est"),
            F.round("_jac", 4).alias("jac"),
            F.round(F.abs(F.col("_est") - F.col("_jac")), 4).alias("abs_err"),
        )
    )


@query(
    "d12_benchmark_contamination",
    oracle="""
    WITH g AS (
        SELECT doc_id, source,
               list_distinct(list_transform(
                   generate_series(1, len(string_split(text,' ')) - 2),
                   i -> array_to_string(string_split(text,' ')[i:i+2], ' ')))
                   AS grams
        FROM documents
    ),
    bench AS (
        SELECT DISTINCT unnest(grams) AS gm FROM g WHERE source = 'src0'
    ),
    train AS (
        SELECT doc_id, len(grams) AS n_grams, unnest(grams) AS gm
        FROM g WHERE source <> 'src0'
    )
    SELECT doc_id, count(*) AS n_shared,
           any_value(n_grams) AS n_grams,
           round(count(*)::DOUBLE / any_value(n_grams), 4) AS overlap_ratio
    FROM train JOIN bench USING (gm)
    GROUP BY doc_id
    HAVING count(*)::DOUBLE / any_value(n_grams) >= 0.1
    """,
)
def d12_benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/benchmark decontamination (§2.11): flag training documents
    whose distinct word 3-grams overlap a held-out benchmark source
    (here `src0`) above 10% — the n-gram-overlap contamination check
    used before LLM pretraining (the technique published with GPT-2/
    GPT-3 and open reproductions; 8-13-gram windows at production
    vocabulary, 3-grams at this synthetic 40-word vocabulary).

    Scale: the benchmark gram set (eval suites, ~MBs) is broadcast, so
    the corpus side streams map-only into a partial-agg groupBy on
    doc_id — one shuffle proportional to matched grams only. The ratio
    compare is int/int division, exact in both engines.

    Plan note: the n-gram construction must run ONCE per document —
    combining `size(grams)` and `explode(grams)` in one projection
    plans the size expression ABOVE the Generate, re-evaluating the
    whole interpreted zip_with chain per exploded row (measured 22 s →
    4 s at sf0.1). Instead the exploded rows are cached and BOTH the
    per-doc total and the matched count aggregate from them."""
    docs = table(spark, sf_dir, "documents")
    grams = F.array_distinct(TX.word_ngrams("text", 3))
    bench = (
        docs.filter(F.col("source") == "src0")
        .select(F.explode(grams).alias("gm"))
        .distinct()
    )
    exploded = (
        docs.filter(F.col("source") != "src0")
        .select("doc_id", F.explode(grams).alias("gm"))
        .cache()
    )
    exploded.count()  # materialize: read by the totals and the join legs
    totals = exploded.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    shared = (
        exploded.join(F.broadcast(bench), "gm")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared"))
    )
    ratio = F.col("n_shared").cast("double") / F.col("n_grams")
    return (
        shared.join(totals, "doc_id")
        .withColumn("overlap_ratio", F.round(ratio, 4))
        .filter(ratio >= 0.1)
        .select("doc_id", "n_shared", "n_grams", "overlap_ratio")
    )


@query(
    "d13_edit_distance_join",
    oracle="""
    WITH n AS (SELECT DISTINCT p_name FROM part)
    SELECT a.p_name AS name1, b.p_name AS name2,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
    FROM n a JOIN n b ON a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 3
    """,
)
def d13_edit_distance_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-similarity self-join (edit distance ≤ 3) over the
    distinct part-name vocabulary — the entity-resolution /
    catalog-matching relation join (cf. PAPERS.md compressed-index
    string-similarity joins; x06 is the per-query lookup, this is the
    set-to-set join).

    Scale: all-pairs levenshtein is O(N²·len²) — the plan blocks on
    length buckets (lev ≥ |len(a)−len(b)|, so pairs within distance 3
    always land in the same or adjacent floor(len/4) bucket; one side
    emits its bucket ±1, the other its bucket). Candidates are an
    equi-join on the bucket key; the exact distance verifies only
    candidates. levenshtein is JVM-codegen, not a UDF."""

    names = (
        table(spark, sf_dir, "part")
        .select("p_name")
        .distinct()
        .withColumn("bk", F.floor(F.length("p_name") / 4))
    )
    a = names.select(
        F.col("p_name").alias("name1"),
        F.explode(
            F.sequence(F.col("bk") - 1, F.col("bk") + 1)
        ).alias("bk"),
    )
    b = names.select(F.col("p_name").alias("name2"), "bk")
    dist = F.levenshtein("name1", "name2")
    return (
        a.join(b, ["bk"])
        .filter(F.col("name1") < F.col("name2"))
        .filter(dist <= 3)
        .select("name1", "name2", dist.cast("long").alias("dist"))
    )


@query(
    "d14_dup_source_matrix",
    oracle="""
    WITH fp AS (SELECT doc_id, source, md5(text) AS h FROM documents)
    SELECT least(a.source, b.source) AS source1,
           greatest(a.source, b.source) AS source2,
           count(*) AS n_dup_pairs,
           count(DISTINCT a.h) AS n_contents
    FROM fp a JOIN fp b ON a.h = b.h AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    """,
)
def d14_dup_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-provenance matrix: exact-duplicate pairs grouped by
    the (canonicalized) source pair — answers the curator's question
    'WHICH feeds are copying each other' that d01's global counts
    can't. Off-diagonal cells are cross-source syndication; diagonal
    cells are within-source re-crawls.

    Scale: the self-join keys on the content hash (the d01 rule — only
    slim (hash, source, id) rows shuffle, never text), and dup groups
    are tiny, so pair expansion is bounded by Σ group². Integer-exact
    output."""
    docs = table(spark, sf_dir, "documents")
    fp = docs.select(
        "doc_id", "source", F.md5("text").alias("h")
    ).cache()
    fp.count()  # materialize before the self-join
    a, b = fp.alias("a"), fp.alias("b")
    return (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.least("a.source", "b.source").alias("source1"),
            F.greatest("a.source", "b.source").alias("source2"),
        )
        .agg(
            F.count("*").alias("n_dup_pairs"),
            F.countDistinct("a.h").alias("n_contents"),
        )
    )


_D15_SIG_ORACLE = f"""
        list_transform(generate_series(0, {TX.MINHASH_K - 1}), i ->
            list_min(list_transform(hs, x ->
                (({TX.MINHASH_A0} + i * {TX.MINHASH_A_STEP}) * x
                 + ({TX.MINHASH_B0} + i * {TX.MINHASH_B_STEP}))
                % {TX.MINHASH_P})))
"""


@query(
    "d15_source_minhash_similarity",
    oracle=f"""
    WITH tok AS (
        SELECT DISTINCT source, unnest(string_split(text, ' ')) AS tk
        FROM documents
    ),
    h AS (
        SELECT source, list(DISTINCT
                   CAST(concat('0x', substr(md5(tk), 1, 14)) AS BIGINT)
                   % {TX.MINHASH_P}) AS hs
        FROM tok GROUP BY source
    ),
    sig AS (SELECT source, {_D15_SIG_ORACLE} AS sg FROM h),
    sizes AS (SELECT source, count(*) AS n FROM tok GROUP BY source),
    inter AS (
        SELECT a.source AS source1, b.source AS source2,
               count(*) AS n_common
        FROM tok a JOIN tok b
          ON a.tk = b.tk AND a.source < b.source
        GROUP BY 1, 2
    )
    SELECT i.source1, i.source2,
           round(i.n_common::DOUBLE
                 / (sa.n + sb.n - i.n_common), 4) AS exact_jac,
           round(len(list_filter(
                     list_zip(s1.sg, s2.sg),
                     p -> p[1] = p[2]))::DOUBLE / {TX.MINHASH_K}, 4)
               AS est_jac
    FROM inter i
      JOIN sizes sa ON sa.source = i.source1
      JOIN sizes sb ON sb.source = i.source2
      JOIN sig s1 ON s1.source = i.source1
      JOIN sig s2 ON s2.source = i.source2
    """,
)
def d15_source_minhash_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-level similarity via MERGED MinHash signatures, audited
    against exact Jaccard (§2.11): each source's signature is the
    elementwise MIN of its documents' signatures — the mergeability
    that lets every executor sketch its partition independently and a
    32-long array per source travel to the driver, regardless of
    corpus size. Estimated vs exact agreement is the audit (the d10
    pattern lifted from documents to corpora).

    Scale: the exact leg (distinct-token self-join) exists only as the
    audit and is dropped at 100 TB; the sketch leg shuffles
    (source, perm_idx, min) cells — sources × 32 rows. Same
    md5-affine permutations as d04, so the whole pipeline is
    oracle-reproducible."""
    docs = table(spark, sf_dir, "documents")
    tok = docs.select(
        "source", F.explode(TX.distinct_tokens("text")).alias("tk")
    ).distinct().cache()
    tok.count()  # materialize: sketch leg + exact-audit leg + sizes
    # per-source signature: explode each source-token hash through the
    # 32 permutations ONCE (cells are slim ints), elementwise min
    hs = tok.select(
        "source",
        (
            F.conv(F.substring(F.md5("tk"), 1, 14), 16, 10).cast("long")
            % TX.MINHASH_P
        ).alias("h"),
    )
    perms = F.array(
        *[
            (
                (
                    F.lit(TX.MINHASH_A0 + i * TX.MINHASH_A_STEP) * F.col("h")
                    + F.lit(TX.MINHASH_B0 + i * TX.MINHASH_B_STEP)
                )
                % TX.MINHASH_P
            )
            for i in range(TX.MINHASH_K)
        ]
    )
    cells = hs.select("source", F.posexplode(perms).alias("i", "v"))
    sig = (
        cells.groupBy("source", "i")
        .agg(F.min("v").alias("m"))
        .groupBy("source")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(i, m))), x -> x.m)"
            ).alias("sg")
        )
    )
    sizes = tok.groupBy("source").agg(F.count("*").alias("n"))
    a, b = tok.alias("a"), tok.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.tk") == F.col("b.tk"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source1"),
            F.col("b.source").alias("source2"),
        )
        .agg(F.count("*").alias("n_common"))
    )
    est = (
        F.expr("size(filter(zip_with(sg1, sg2, (x, y) -> x = y), b -> b))")
        / float(TX.MINHASH_K)
    )
    return (
        inter.join(F.broadcast(sizes.withColumnRenamed("n", "na").withColumnRenamed("source", "source1")), "source1")
        .join(F.broadcast(sizes.withColumnRenamed("n", "nb").withColumnRenamed("source", "source2")), "source2")
        .join(F.broadcast(sig.select(F.col("source").alias("source1"), F.col("sg").alias("sg1"))), "source1")
        .join(F.broadcast(sig.select(F.col("source").alias("source2"), F.col("sg").alias("sg2"))), "source2")
        .select(
            "source1",
            "source2",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("na") + F.col("nb") - F.col("n_common")),
                4,
            ).alias("exact_jac"),
            F.round(est, 4).alias("est_jac"),
        )
    )


@query(
    "d16_cluster_canonicals",
    oracle=f"""
    WITH RECURSIVE edges AS ({_CLUSTER_EDGES_SQL}),
    edges2 AS (SELECT a, b FROM edges UNION ALL SELECT b AS a, a AS b FROM edges),
    nodes AS (SELECT DISTINCT x AS node FROM (
        SELECT a AS x FROM edges UNION SELECT b FROM edges)),
    reach(node, r) AS (
        SELECT node, node FROM nodes
        UNION
        SELECT reach.node, e.b FROM reach JOIN edges2 e ON e.a = reach.r
    ),
    clusters AS (
        SELECT node, min(r) AS cluster_id FROM reach GROUP BY node
    ),
    scored AS (
        SELECT c.cluster_id, c.node, d.n_chars
        FROM clusters c JOIN documents d ON d.doc_id = c.node
    )
    SELECT cluster_id,
           count(*) AS cluster_size,
           -- longest text, ties to smallest doc_id — as max-window +
           -- filtered min, NOT arithmetic packing (n_chars*1e7 - node
           -- collides once doc_ids pass 1e7, making arg_max/max_by
           -- tie-break arbitrarily and diverge across engines)
           min(node) FILTER (WHERE n_chars = mx) AS canonical_doc_id,
           count(*) - 1 AS n_dropped
    FROM (SELECT *, max(n_chars) OVER (PARTITION BY cluster_id) AS mx
          FROM scored)
    GROUP BY cluster_id
    ORDER BY cluster_id
    """,
)
def d16_cluster_canonicals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-document selection per duplicate cluster — the step a
    dedup pipeline runs AFTER clustering (d08): within each near-dup
    component keep the best representative (longest text, ties to the
    smallest doc_id) and count what gets dropped. Quality-aware keep
    policy is what separates production dedup from naive keep-first
    (d07): the canonical should be the most complete variant, not the
    one that happened to arrive first.

    Plan: reuses d08's edge construction + lineage-truncated label
    propagation; the keep decision is one max_by per cluster
    (map-side combined) after a doc_id-keyed join to the quality
    column — no extra pass over text."""
    docs = table(spark, sf_dir, "documents")
    _edges, labels = _simhash_edge_labels(spark, sf_dir)
    scored = labels.join(
        docs.select(F.col("doc_id").alias("node"), "n_chars"), "node"
    )
    # canonical = max n_chars, ties to smallest doc_id — window-max +
    # filtered min, never arithmetic packing (n_chars*1e7 - node
    # collides once doc_ids pass 1e7 and the tie-break goes arbitrary)
    from pyspark.sql.window import Window as W

    scored = scored.withColumn(
        "mx", F.max("n_chars").over(W.partitionBy("label"))
    )
    return (
        scored.groupBy(F.col("label").alias("cluster_id"))
        .agg(
            F.count("*").alias("cluster_size"),
            F.min(
                F.when(F.col("n_chars") == F.col("mx"), F.col("node"))
            ).alias("canonical_doc_id"),
            (F.count("*") - 1).alias("n_dropped"),
        )
        .select("cluster_id", "cluster_size", "canonical_doc_id", "n_dropped")
        .orderBy("cluster_id")
    )


@query(
    "d17_leakage_safe_split",
    oracle=f"""
    WITH RECURSIVE edges AS ({_CLUSTER_EDGES_SQL}),
    edges2 AS (SELECT a, b FROM edges UNION ALL SELECT b AS a, a AS b FROM edges),
    nodes AS (SELECT DISTINCT x AS node FROM (
        SELECT a AS x FROM edges UNION SELECT b FROM edges)),
    reach(node, r) AS (
        SELECT node, node FROM nodes
        UNION
        SELECT reach.node, e.b FROM reach JOIN edges2 e ON e.a = reach.r
    ),
    labels AS (SELECT node AS doc_id, min(r) AS cluster_id FROM reach GROUP BY node),
    alldocs AS (
        SELECT d.doc_id, coalesce(l.cluster_id, d.doc_id) AS cluster_id
        FROM documents d LEFT JOIN labels l USING (doc_id)),
    assigned AS (
        SELECT doc_id, cluster_id,
               CASE WHEN h < 80 THEN 'train' WHEN h < 90 THEN 'val'
                    ELSE 'test' END AS split
        FROM (SELECT *,
                     CAST(concat('0x', substr(md5(CAST(cluster_id AS VARCHAR)), 1, 14))
                          AS BIGINT) % 100 AS h
              FROM alldocs)),
    leak AS (
        SELECT count(*) AS cross_split_edges
        FROM edges e
        JOIN assigned x ON x.doc_id = e.a
        JOIN assigned y ON y.doc_id = e.b
        WHERE x.split <> y.split)
    SELECT split, count(*) AS n_docs,
           count(DISTINCT cluster_id) AS n_clusters,
           (SELECT cross_split_edges FROM leak) AS cross_split_edges
    FROM assigned GROUP BY split ORDER BY split
    """,
)
def d17_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split — the anti-contamination
    assignment a training pipeline runs AFTER near-dup clustering:
    hashing doc_id alone leaks (two near-identical documents land in
    train and test and inflate eval), so the split key is the near-dup
    CLUSTER id (d08's simhash components; singletons are their own
    cluster). Assignment is a deterministic md5-affine hash of the
    cluster id -> 80/10/10, so the split is reproducible run-over-run
    and engine-over-engine. The result carries its own proof:
    cross_split_edges counts near-dup pairs straddling splits and is
    structurally zero (every edge is within one cluster, every cluster
    within one split).

    Scale: component labels from the iterative min-label loop (one
    shuffle per round, diameter-bounded); assignment is row-local; the
    leak audit joins |edges| rows against the (doc_id, split) map —
    all key-partitioned equi-joins, nothing all-pairs."""
    docs = table(spark, sf_dir, "documents")
    edges, raw_labels = _simhash_edge_labels(spark, sf_dir)
    labels = raw_labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )
    alldocs = docs.select("doc_id").join(labels, "doc_id", "left").select(
        "doc_id",
        F.coalesce("cluster_id", "doc_id").alias("cluster_id"),
    )
    h = (
        F.conv(F.substring(F.md5(F.col("cluster_id").cast("string")), 1, 14), 16, 10)
        .cast("long")
        % 100
    )
    assigned = alldocs.withColumn(
        "split",
        F.when(h < 80, "train").when(h < 90, "val").otherwise("test"),
    ).cache()
    assigned.count()  # materialize: the leak join's two legs + the
    # split rollup would otherwise race-fill the cache (the d05 2x)
    leak = (
        edges.join(
            assigned.select(F.col("doc_id").alias("a"), F.col("split").alias("sa")),
            "a",
        )
        .join(
            assigned.select(F.col("doc_id").alias("b"), F.col("split").alias("sb")),
            "b",
        )
        .filter(F.col("sa") != F.col("sb"))
        .agg(F.count(F.lit(1)).alias("cross_split_edges"))
    )
    return (
        assigned.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("cluster_id").alias("n_clusters"),
        )
        .crossJoin(F.broadcast(leak))
        .orderBy("split")
    )


_D18_BITS = 56  # full width of the md5-derived token hash
# 7 contiguous 8-bit pigeonhole blocks: any pair within Hamming 6
# differs in at most 6 blocks, so at least one block matches exactly.
_D18_BLOCKS = [(j * 8, 8) for j in range(7)]


@query(
    "d18_simhash56_banded_pairs",
    oracle=f"""
    WITH s AS (
        SELECT doc_id, {_simhash_sql(_D18_BITS)} AS simhash
        FROM documents
    )
    SELECT s1.doc_id AS doc1, s2.doc_id AS doc2,
           bit_count(xor(s1.simhash, s2.simhash)) AS hamming
    FROM s s1 JOIN s s2 ON s1.doc_id < s2.doc_id
    WHERE bit_count(xor(s1.simhash, s2.simhash)) <= 6
    """,
)
def d18_simhash56_banded_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-fingerprint SimHash near-dup — the corpus-scale upgrade the
    round-6 100x probe proved d11 NEEDS, not just prefers.

    The saturation wall (measured, SCALE.md round-6): a 32-bit
    fingerprint's Hamming-6 ball holds ~1.2M of 4.3e9 points (2.8e-4 of
    the space), so at N docs the EXPECTED number of random cross pairs
    within Hamming 6 is ~N^2/2 * 2.8e-4 — at N = 5M that is ~3.4e9
    TRUE-by-definition output pairs. No banding trick fixes that: the
    fingerprint itself stops discriminating around N ~ 1e6 (the same
    reason Google's production simhash dedup uses 64-bit fingerprints
    for 8e9 pages — Manku et al., WWW'07). At 56 bits the ball is
    ~3.2e7 of 7.2e16 (4.5e-10): ~5.6k incidental pairs at N = 5M, so
    the output is the actual near-dup structure.

    Mechanics are d11's, widened: 56-bit majority-vote fingerprint over
    md5-56 token hashes, pigeonhole banding on 7 contiguous 8-bit
    blocks (any Hamming<=6 pair matches at least one block exactly),
    hot-band cap (operators/banding.py) bounding degenerate bands, and
    the Hamming refine evaluated INSIDE the join probe via the slim
    8-byte payload. Per-block band occupancy at 5M docs is ~N/256 ~
    19.5k — just past the 10k cap, so the group split runs at g=2 with
    real work behind it (the probe records the histogram). Shuffle
    carries (doc_id, 8-byte fingerprint, band key) — never text.

    The oracle is the plain all-pairs definition; band decomposition
    plus refine must reproduce it exactly."""
    docs = table(spark, sf_dir, "documents")
    n_part = spark.sparkContext.defaultParallelism
    # no cache on `hashed`: it feeds exactly one consumer (s, itself
    # cached+counted) — pinning the corpus-sized token-hash arrays in
    # executor memory bought nothing (ADVICE r6)
    hashed = docs.repartition(n_part, "doc_id").select(
        "doc_id",
        F.transform(TX.distinct_tokens("text"), TX.token_hash).alias("hashes"),
    )
    s = hashed.select(
        "doc_id", _simhash_col_from("hashes", bits=_D18_BITS).alias("simhash")
    ).cache()
    s.count()  # materialize before multi-read (see d05)

    band_cols = F.array(
        *[
            F.concat_ws(
                ":",
                F.lit(i),
                (F.shiftright("simhash", off) % F.lit(2**width)).cast(
                    "string"
                ),
            )
            for i, (off, width) in enumerate(_D18_BLOCKS)
        ]
    )
    bands = s.select(
        "doc_id", "simhash", F.explode(band_cols).alias("band_key")
    )
    from serverless_datalake_aws_spark.operators.banding import (
        capped_band_self_join,
    )

    pairs = capped_band_self_join(
        bands,
        "band_key",
        "doc_id",
        payload="simhash",
        pair_filter=lambda h1, h2: F.bit_count(h1.bitwiseXOR(h2)) <= 6,
    )
    return pairs.select(
        "doc1",
        "doc2",
        F.bit_count(F.col("payload1").bitwiseXOR(F.col("payload2")))
        .cast("long")
        .alias("hamming"),
    ).dropDuplicates(["doc1", "doc2"])


@query(
    "d19_benchmark_decontamination",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    grams AS (
        SELECT DISTINCT doc_id,
               md5(array_to_string(w[i:i+7], ' ')) AS g
        FROM (SELECT doc_id, w,
                     unnest(generate_series(1, len(w) - 7)) AS i
              FROM toks)),
    bench AS (
        SELECT doc_id AS bench_id, g FROM grams WHERE doc_id % 50 = 0),
    corpus AS (
        SELECT doc_id, g FROM grams WHERE doc_id % 50 <> 0),
    hits AS (
        SELECT c.doc_id, c.g, b.bench_id
        FROM corpus c JOIN bench b ON c.g = b.g)
    SELECT doc_id,
           count(DISTINCT g) AS n_shared_ngrams,
           count(DISTINCT bench_id) AS n_benchmark_docs_hit
    FROM hits GROUP BY doc_id ORDER BY doc_id
    """,
)
def d19_benchmark_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination, HARD-MATCH variant — the exact
    long-n-gram hit rule (GPT-3 appendix C: a training doc is
    contaminated if it shares ANY 13-gram with eval data; 8-grams at
    this synthetic vocabulary). Complements d12's SOFT variant (3-gram
    overlap RATIO against a benchmark source) on three axes: hit
    semantics (any-single-long-gram vs 10% short-gram ratio — a doc
    quoting one eval question verbatim passes d12 but must be caught),
    benchmark granularity (a doc SET, doc_id % 50 == 0, vs one
    source), and output (per-benchmark-doc attribution — which eval
    docs leaked where — the forensics d12's boolean can't answer).

    Plan: both sides explode to DISTINCT (doc, md5(8-gram)) rows — the
    gram TEXT dies in the map stage, 32-char hashes shuffle — and the
    equi-join on gram hash is the contamination probe. The benchmark
    side is eval-set-sized (broadcastable at any corpus scale), so at
    100 TB this is one map-side-hashed pass over the corpus grams:
    cost ∝ corpus tokens, never corpus × benchmark.

    Deterministic by construction (hash set ops, no thresholds); the
    oracle replays shingling, hashing, join, and both counts."""
    docs = table(spark, sf_dir, "documents")
    grams = (
        docs.select(
            "doc_id",
            F.split("text", " ").alias("w"),
        )
        # short-doc guard: a <=7-token doc makes sequence(1, 0) DESCEND
        # in Spark and slice(w, 0, 8) ABORT the job
        # (INVALID_PARAMETER_VALUE.START); the oracle's generate_series
        # is simply empty there
        .filter(F.size("w") >= 8)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(w) - 7), "
                    "i -> md5(array_join(slice(w, i, 8), ' ')))"
                )
            ).alias("g"),
        )
        .distinct()
    )
    bench = grams.filter(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("bench_id"), "g"
    )
    corpus = grams.filter(F.col("doc_id") % 50 != 0)
    hits = corpus.join(F.broadcast(bench), "g")
    return (
        hits.groupBy("doc_id")
        .agg(
            F.countDistinct("g").alias("n_shared_ngrams"),
            F.countDistinct("bench_id").alias("n_benchmark_docs_hit"),
        )
        .orderBy("doc_id")
    )


_D20_W = 10  # sliding-window width in words
_D20_MIN = 2  # corpus-wide occurrences that make a window "repeated"


@query(
    "d20_repeated_substring_spans",
    oracle=f"""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    pos AS (SELECT doc_id, ws,
                   unnest(generate_series(0, len(ws) - {_D20_W})) AS p
            FROM w WHERE len(ws) >= {_D20_W}),
    win AS (SELECT doc_id, p,
                   md5(array_to_string(
                       list_slice(ws, p + 1, p + {_D20_W}), ' ')) AS h
            FROM pos),
    hot AS (SELECT h FROM win GROUP BY h HAVING count(*) >= {_D20_MIN}),
    f AS (SELECT win.doc_id, win.p FROM win JOIN hot USING (h)),
    g AS (SELECT doc_id, p,
                 CASE WHEN lag(p) OVER (PARTITION BY doc_id ORDER BY p)
                           IS NULL
                      OR p - lag(p) OVER (PARTITION BY doc_id ORDER BY p)
                           > {_D20_W}
                      THEN 1 ELSE 0 END AS brk
          FROM f),
    i AS (SELECT doc_id, p,
                 SUM(brk) OVER (PARTITION BY doc_id ORDER BY p) AS grp
          FROM g)
    SELECT doc_id,
           MIN(p) AS span_start,
           MAX(p) + {_D20_W} AS span_end,
           MAX(p) + {_D20_W} - MIN(p) AS width,
           count(*) AS n_windows
    FROM i GROUP BY doc_id, grp
    ORDER BY doc_id, span_start
    """,
)
def d20_repeated_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal repeated-substring spans, the sliding-window form of
    exact substring dedup (Lee et al. 2022, "Deduplicating Training
    Data Makes Language Models Better": any 50-token substring that
    appears twice in the corpus is a dup; {_D20_W} words here at test
    scale). The complement of t35: t35 hashes FIXED non-overlapping
    blocks, so a copied paragraph straddling a block boundary at a
    different alignment escapes; a sliding window catches a repeat at
    ANY alignment. Every {_D20_W}-word window occurring >= {_D20_MIN}
    times corpus-wide flags its start position; flagged positions are
    merged into MAXIMAL spans (gaps-and-islands: a new span starts
    when the next flagged position is > {_D20_W} behind, i.e. the
    windows neither overlap nor touch), the exact intervals a trainer
    would cut. Output: one row per (doc, span) with start/end/width
    and the window count that supports it.

    Scale shape: window TEXT dies in the map stage — the exploded rows
    carry (doc_id, pos, md5) only (~L rows per L-word doc, the price
    of alignment-free matching; Lee et al. pay the same via suffix
    arrays). The occurrence count shuffles 16-byte hashes; the flagged
    set comes back as a left-semi join on the hash; island-merging
    windows over (doc_id, pos) int pairs partitioned by doc_id. No
    exchange ever carries document text."""
    from pyspark.sql.window import Window

    docs = table(spark, sf_dir, "documents")
    ws = F.split("text", " ")
    base = docs.select("doc_id", ws.alias("ws")).filter(
        F.size("ws") >= _D20_W
    )
    # (doc_id, p, h): hash computed in the same projection, window
    # text never leaves the stage
    win = base.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.size("ws") - _D20_W),
                lambda i: F.md5(F.array_join(F.slice("ws", i + 1, _D20_W), " ")),
            )
        ).alias("p", "h"),
    )
    hot = (
        win.groupBy("h")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= _D20_MIN)
        .select("h")
    )
    flagged = win.join(hot, "h", "left_semi").select("doc_id", "p")
    wnd = Window.partitionBy("doc_id").orderBy("p")
    lagp = F.lag("p").over(wnd)
    brk = F.when(lagp.isNull() | (F.col("p") - lagp > _D20_W), 1).otherwise(0)
    grouped = flagged.select(
        "doc_id", "p", F.sum(brk).over(wnd).alias("grp")
    )
    return (
        grouped.groupBy("doc_id", "grp")
        .agg(
            F.min("p").cast("long").alias("span_start"),
            (F.max("p") + _D20_W).cast("long").alias("span_end"),
            (F.max("p") + _D20_W - F.min("p")).cast("long").alias("width"),
            F.count("*").alias("n_windows"),
        )
        .drop("grp")
        .orderBy("doc_id", "span_start")
    )
