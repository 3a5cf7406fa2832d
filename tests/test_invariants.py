"""Result-invariant tests for the newer operators: properties that must
hold regardless of data (the oracle gate proves value parity; these
prove the semantics can't silently drift into nonsense — SURVEY §5.2).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from serverless_datalake_aws_spark.catalog import table
from serverless_datalake_aws_spark.plans import all_queries
from tests.conftest import SF_DIR


def test_t13_split_fractions_partition_corpus(spark):
    out = all_queries()["t13_stratified_split"](spark, SF_DIR).collect()
    total = table(spark, SF_DIR, "documents").count()
    assert sum(r.n_docs for r in out) == total  # splits partition the corpus
    by_lang: dict[str, float] = {}
    for r in out:
        by_lang[r.lang] = by_lang.get(r.lang, 0.0) + r.frac_of_lang
        assert r.split in {"train", "val", "test"}
    for lang, frac in by_lang.items():
        assert abs(frac - 1.0) < 1e-3, (lang, frac)


def test_e07_grid_complete_and_filled(spark):
    df = all_queries()["e07_linear_interpolation"](spark, SF_DIR)
    rows = df.collect()
    assert all(r.v_filled is not None for r in rows)  # no gap survives
    users = {r.user_id for r in rows}
    hours = {r.hour for r in rows}
    assert len(rows) == len(users) * len(hours)  # dense user x hour grid
    n_real = sum(1 for r in rows if not r.interpolated)
    assert 0 < n_real < len(rows)  # both real and interpolated present


def test_q58_hot_keys_subset_of_histogram(spark):
    for r in all_queries()["q58_map_functions"](spark, SF_DIR).collect():
        keys = {kv.split(":")[0] for kv in r.hist.split(";")}
        if r.hist_hot is not None:
            hot = {kv.split(":")[0] for kv in r.hist_hot.split(";")}
            assert hot <= keys


def test_t09_dup_fraction_bounds(spark):
    df = all_queries()["t09_trigram_repetition"](spark, SF_DIR)
    bad = df.filter(
        (F.col("dup_frac") < 0)
        | (F.col("dup_frac") >= 1)
        | (F.col("n_distinct") > F.col("n_trigrams"))
    ).count()
    assert bad == 0


def test_s07_cosine_bounds(spark):
    df = all_queries()["s07_range_search"](spark, SF_DIR)
    bad = df.filter((F.col("cos_sim") > 1.000001) | (F.col("cos_sim") < -1.000001)).count()
    assert bad == 0


def test_q53_percentiles_monotone(spark):
    for r in all_queries()["q53_exact_percentiles"](spark, SF_DIR).collect():
        assert r.p25 <= r.p50 <= r.p75
        assert r.med == r.p50


def test_s09_clusters_partition_the_corpus(spark):
    df = all_queries()["s09_kmeans_step"](spark, SF_DIR).collect()
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    assert sum(r.n for r in df) == emb.count()  # every vector assigned once
    assert len(df) <= 8
    for r in df:
        assert r.avg_dist >= 0 and r.centroid_norm >= 0


def test_t17_perplexity_positive_and_token_conserving(spark):
    df = all_queries()["t17_unigram_perplexity"](spark, SF_DIR)
    bad = df.filter(
        (F.col("ppl") <= 0) | (F.col("cross_entropy") < 0) | (F.col("n_tokens") <= 0)
    ).count()
    assert bad == 0
    # scoring join must conserve tokens: every token has a vocab entry
    total = df.agg(F.sum("n_tokens")).first()[0]
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    expected = docs.select(
        F.explode(F.split("text", " ")).alias("w")
    ).filter(F.length("w") > 0).count()
    assert total == expected


def test_q65_running_distinct_bounds(spark):
    df = all_queries()["q65_running_distinct"](spark, SF_DIR)
    # every row has seen at least its own user; the running count never
    # exceeds the partition's total distinct users
    assert df.filter(F.col("users_so_far") < 1).count() == 0
    ev = all_queries()["q65_running_distinct"](spark, SF_DIR)
    caps = ev.groupBy("event_type").agg(F.max("users_so_far").alias("peak"))
    assert caps.filter(F.col("peak") > 50).count() == 0  # user_id < 50 filter


def test_p03_triangle_anchor_is_minimum(spark):
    df = all_queries()["p03_trade_triangles"](spark, SF_DIR).collect()
    assert all(r.n_triangles > 0 for r in df)
    # anchoring at the cycle minimum: the largest nation key can anchor
    # no triangle (it is never the minimum of its cycle)
    if df:
        max_nation = spark.read.parquet(f"{SF_DIR}/nation.parquet").agg(
            F.max("n_nationkey")
        ).first()[0]
        assert all(r.nation < max_nation for r in df)
