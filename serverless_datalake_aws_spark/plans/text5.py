"""Round-7 text/training-pipeline entries (t37+).

Continues text4.py (t30–t36). Cross-engine determinism convention:
membership decisions ride md5-affine integer hashes and EXACT BIGINT
arithmetic (div, never float division) on both sides, so sampling
boundaries cannot drift by a ulp between Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from serverless_datalake_aws_spark.catalog import table
from serverless_datalake_aws_spark.plans import query

_PPM = 1_000_000
# target mixture (parts-per-million): the training-mix declaration
_T37_WEIGHTS = (("curated", 500_000), ("reference", 300_000), ("web", 200_000))


@query(
    "t37_mixture_sampling",
    oracle=f"""
    WITH domains AS (
        SELECT doc_id,
               CASE CAST(substr(source, 4) AS BIGINT) % 3
                    WHEN 0 THEN 'web'
                    WHEN 1 THEN 'curated'
                    ELSE 'reference' END AS domain,
               CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))
                    AS BIGINT) % {_PPM} AS h
        FROM documents),
    w AS (SELECT * FROM (VALUES ('curated', CAST(500000 AS BIGINT)),
                                ('reference', CAST(300000 AS BIGINT)),
                                ('web', CAST(200000 AS BIGINT))) t(domain, wt_ppm)),
    avail AS (SELECT domain, count(*) AS n FROM domains GROUP BY domain),
    budget AS (
        SELECT min(n * {_PPM} // wt_ppm) AS b
        FROM avail JOIN w USING (domain)),
    rates AS (
        SELECT a.domain, a.n, w.wt_ppm,
               ((SELECT b FROM budget) * w.wt_ppm // {_PPM}) AS target_rows,
               (((SELECT b FROM budget) * w.wt_ppm // {_PPM}) * {_PPM} // a.n)
                   AS thresh_ppm
        FROM avail a JOIN w ON a.domain = w.domain),
    sampled AS (
        SELECT d.domain FROM domains d JOIN rates r ON d.domain = r.domain
        WHERE d.h < r.thresh_ppm),
    counts AS (
        SELECT domain, count(*) AS n_sampled FROM sampled GROUP BY domain),
    tot AS (SELECT sum(n_sampled) AS t FROM counts)
    SELECT r.domain, r.n AS n_available, r.wt_ppm AS target_ppm,
           r.thresh_ppm, c.n_sampled,
           -- sum() yields DECIMAL in DuckDB and // with it goes float;
           -- pin the integer image Spark's div produces
           CAST(c.n_sampled * {_PPM} // CAST((SELECT t FROM tot) AS BIGINT)
                AS BIGINT) AS achieved_ppm
    FROM rates r JOIN counts c ON r.domain = c.domain
    ORDER BY r.domain
    """,
)
def t37_mixture_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data mixture sampling: declare target domain
    proportions, derive the maximum total budget the most-scarce
    domain allows, then accept rows by a deterministic per-doc hash
    threshold — the op every LLM data recipe runs ("50% curated / 30%
    reference / 20% web") made reproducible: membership is a pure
    function of doc_id, so re-runs, backfills, and a DuckDB replay
    produce the identical sample (no RNG, no state).

    Exactness contract: budget, per-domain targets and acceptance
    thresholds are ALL BIGINT arithmetic (div) — no float division
    anywhere near a membership boundary, so Spark and DuckDB cannot
    disagree by a ulp on who is sampled (a float rate at ppm
    granularity would flip ~18% of runs at sf0.1 — measured risk, the
    reason for the integer design).

    Scale: one hash-agg for avail (|domains| rows), the weights are a
    literal, the threshold join broadcasts |domains| rows onto the
    scan — the sample itself never shuffles; acceptance is a
    scan-local predicate. At 100 TB this is a single filtered pass."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(
            F.substring("source", 4, 10).cast("long") % 3 == 0, "web"
        )
        .when(F.substring("source", 4, 10).cast("long") % 3 == 1, "curated")
        .otherwise("reference")
        .alias("domain"),
        (
            F.conv(
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 14),
                16,
                10,
            ).cast("long")
            % _PPM
        ).alias("h"),
    )
    w = spark.createDataFrame(
        list(_T37_WEIGHTS), "domain string, wt_ppm long"
    )
    avail = docs.groupBy("domain").agg(F.count("*").alias("n"))
    joined = avail.join(w, "domain")
    budget = joined.agg(
        F.min(F.expr(f"n * {_PPM} div wt_ppm")).alias("b")
    )
    rates = (
        joined.crossJoin(F.broadcast(budget))
        .withColumn("target_rows", F.expr(f"b * wt_ppm div {_PPM}"))
        .withColumn("thresh_ppm", F.expr("target_rows * 1000000 div n"))
        .select("domain", "n", "wt_ppm", "target_rows", "thresh_ppm")
    )
    sampled = docs.join(F.broadcast(rates), "domain").filter(
        F.col("h") < F.col("thresh_ppm")
    )
    counts = sampled.groupBy("domain").agg(F.count("*").alias("n_sampled"))
    tot = counts.agg(F.sum("n_sampled").alias("t"))
    return (
        rates.join(counts, "domain")
        .crossJoin(F.broadcast(tot))
        .select(
            "domain",
            F.col("n").alias("n_available"),
            F.col("wt_ppm").alias("target_ppm"),
            "thresh_ppm",
            "n_sampled",
            F.expr(f"n_sampled * {_PPM} div t").alias("achieved_ppm"),
        )
        .orderBy("domain")
    )
