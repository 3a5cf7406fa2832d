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
    # per-user spine (SCALE.md): each user's hours are contiguous and
    # span exactly that user's [first, last] observed hour — grid rows
    # are the sum of per-user spans, not |users| x global span
    by_user: dict[int, list[str]] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r.hour)
    from datetime import datetime, timedelta

    for uid, hours in by_user.items():
        hs = sorted(datetime.fromisoformat(h) for h in hours)
        span = int((hs[-1] - hs[0]) / timedelta(hours=1)) + 1
        assert len(hs) == len(set(hs)) == span, (uid, len(hs), span)
        # endpoints are real observations, never extrapolated fill
        end_flags = {
            r.hour: r.interpolated for r in rows if r.user_id == uid
        }
        assert not end_flags[hs[0].isoformat(sep="T")]
        assert not end_flags[hs[-1].isoformat(sep="T")]
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


def test_t23_count_min_never_underestimates(spark):
    # count-min's one-sided error guarantee: est >= exact, always
    rows = all_queries()["t23_count_min_heavy_hitters"](spark, SF_DIR).collect()
    assert rows  # heavy hitters exist
    for r in rows:
        assert r.est_n >= r.exact_n, (r.tok, r.est_n, r.exact_n)
        assert r.overestimate == r.est_n - r.exact_n


def test_s12_knn_graph_degree_and_block_closure(spark):
    rows = all_queries()["s12_knn_graph"](spark, SF_DIR).collect()
    from collections import Counter

    deg = Counter(r.src for r in rows)
    emb = {
        r.vec_id: r.label
        for r in table(spark, SF_DIR, "embeddings").collect()
    }
    for src, d in deg.items():
        assert d <= 5, (src, d)  # top-k bound
    for r in rows:
        assert emb[r.src] == emb[r.dst] == r.label  # edges stay in-block
        assert r.src != r.dst  # no self-loops
        assert -1.0 <= r.cos_sim <= 1.0


def test_d12_contamination_ratio_bounds(spark):
    rows = all_queries()["d12_benchmark_contamination"](spark, SF_DIR).collect()
    bench_ids = {
        r.doc_id
        for r in table(spark, SF_DIR, "documents")
        .filter(F.col("source") == "src0")
        .select("doc_id")
        .collect()
    }
    for r in rows:
        assert r.doc_id not in bench_ids  # benchmark never flags itself
        assert 0 < r.n_shared <= r.n_grams
        assert r.overlap_ratio >= 0.1  # reported = above threshold


def test_e12_streaks_are_consistent_intervals(spark):
    import datetime

    rows = all_queries()["e12_activity_streaks"](spark, SF_DIR).collect()
    seen_users = set()
    for r in rows:
        assert r.user_id not in seen_users  # one longest streak per user
        seen_users.add(r.user_id)
        s = datetime.date.fromisoformat(r.streak_start)
        e = datetime.date.fromisoformat(r.streak_end)
        assert (e - s).days + 1 == r.streak_days  # contiguous by definition


def test_t22_sampling_weights_normalize_and_flatten(spark):
    rows = all_queries()["t22_source_sampling_weights"](spark, SF_DIR).collect()
    assert abs(sum(r.sample_weight for r in rows) - 1.0) < 1e-4
    # temperature < 1 flattens the distribution: every source's weight
    # sits between its raw share and the uniform share (up to rounding)
    tot = sum(r.n_tokens for r in rows)
    uniform = 1.0 / len(rows)
    for r in rows:
        share = r.n_tokens / tot
        lo, hi = min(share, uniform) - 1e-6, max(share, uniform) + 1e-6
        assert lo <= r.sample_weight <= hi, (r.source, share, r.sample_weight)


def test_mm05_windows_tile_durations(spark):
    rows = all_queries()["mm05_audio_chunk_windows"](spark, SF_DIR).collect()
    assert rows
    docs = {
        r.doc_id: r.n_chars
        for r in table(spark, SF_DIR, "documents").collect()
    }
    from collections import Counter

    per_media = Counter(r.media_id for r in rows)
    for media_id, n_win in per_media.items():
        dur = docs[int(media_id)] * 10
        assert n_win == (dur - 2000) // 1000 + 1  # full windows only
    for r in rows:
        assert r.end_ms - r.start_ms == 2000
        assert r.start_sample == r.start_ms * 16  # 16 kHz offsets


def test_t30_p06_null_source_rows_survive(spark, tmp_path):
    """NULL-source documents must flow through the aggregate+broadcast
    sampler exactly as SQL semantics dictate (GROUP BY folds NULLs into
    one group; the round-6 window->aggregate rewrite must join back
    null-safely, not drop them — self-review finding). Full oracle
    parity on a fixture where 1 in 7 documents has source = NULL."""
    import shutil

    import duckdb

    from serverless_datalake_aws_spark.testing import check_query

    fx = tmp_path / "nullsrc"
    fx.mkdir()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        shutil.copy(f"{SF_DIR}/{t}.parquet", fx / f"{t}.parquet")
    con = duckdb.connect()
    con.sql(
        f"""
        COPY (
          SELECT doc_id, text, lang,
                 CASE WHEN doc_id % 7 = 0 THEN NULL ELSE source END AS source,
                 n_chars
          FROM '{SF_DIR}/documents.parquet'
        ) TO '{fx}/documents.parquet' (FORMAT PARQUET)
        """
    )
    con.close()
    for name in ("t30_pps_sample", "p06_curation_pipeline"):
        assert check_query(spark, name, str(fx)) == [], name
    # and the NULL group genuinely participates (rows can be sampled)
    from serverless_datalake_aws_spark.plans import all_queries

    out = all_queries()["t30_pps_sample"](spark, str(fx))
    assert out.filter("source IS NULL").count() > 0


def test_registry_rejects_decimal_output_schemas(spark):
    """No registered query may RETURN a DecimalType column (the only two
    that ever did were the only external hash-reds of rounds 6 and 8:
    DuckDB lowers DECIMAL to float64, Spark toPandas yields
    decimal.Decimal, and the driver images those apart even when values
    agree). The registry-wide enforcement rides the parity suite —
    testing.check_query red-flags a decimal schema before comparing —
    so here we prove (a) the checker actually fires on a decimal frame,
    (b) the local mirror now images Decimal distinctly from float, and
    (c) the two historical offenders are decimal-free end to end."""
    from decimal import Decimal

    import pandas as pd

    from serverless_datalake_aws_spark.testing import (
        compare_frames,
        decimal_columns,
    )

    # (a) the schema checker fires on decimals anywhere in the type tree
    probe = spark.sql(
        "SELECT CAST(1.5 AS DECIMAL(18,6)) AS d,"
        "       array(CAST(1 AS DECIMAL(10,2))) AS arr,"
        "       named_struct('x', CAST(2 AS DECIMAL(5,1))) AS st,"
        "       CAST(1.5 AS DOUBLE) AS ok"  # bare 1.5 parses as DECIMAL(2,1)!
    )
    assert sorted(decimal_columns(probe.schema)) == ["arr", "d", "st"]

    # (b) Decimal cells no longer coerce to float in the local mirror:
    # a Spark-side Decimal vs an oracle-side float64 of the SAME value
    # must be a reported mismatch (this is exactly the driver's view)
    s = pd.DataFrame({"v": [Decimal("1.500000")]})
    o = pd.DataFrame({"v": [1.5]})
    assert compare_frames(s, o) != []

    # (c) the two historical offenders now return double, not decimal
    qs = all_queries()
    for name, col in (
        ("st10_stream_incremental_rollup", "sum_value"),
        ("st14_stream_maintained_join", "total_price"),
    ):
        df = qs[name](spark, SF_DIR)
        assert decimal_columns(df.schema) == [], name
        assert dict(df.dtypes)[col] == "double", (name, df.dtypes)


def test_every_registered_query_is_decimal_checked():
    """The decimal invariant is enforced through testing.check_query,
    which the parity suite runs for EVERY registered name — so no name
    may bypass it by lacking an oracle (rows-only entries would skip
    the comparison but still hit the schema gate inside check_query
    before the oracle lookup short-circuits)."""
    import inspect

    from serverless_datalake_aws_spark import testing

    src = inspect.getsource(testing.check_query)
    # the schema gate must run before the rows-only early return
    assert src.index("decimal_columns") < src.index("if oracle is None")


def test_x11_stemming_is_load_bearing(spark):
    """The analyzer must be what produces the matches: un-stemmed
    search for the inflected query terms returns ZERO rows on this
    corpus (all-singular vocabulary), while the stemmed query matches
    plenty — the OpenSearch-analyzer-parity claim is real, not
    decorative."""
    docs = table(spark, SF_DIR, "documents")
    raw_hits = (
        docs.select(F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok").isin("queries", "merges", "columns"))
        .count()
    )
    assert raw_hits == 0
    out = all_queries()["x11_stemmed_search"](spark, SF_DIR)
    rows = out.collect()
    assert len(rows) > 0
    assert {r.stem for r in rows} <= {"query", "merge", "column"}
    assert all(r.tf >= 1 for r in rows)


def test_x12_analyzer_chain_is_load_bearing(spark):
    """x12's full analysis chain must be what produces (and suppresses)
    the matches: un-analyzed search for every inflected query term
    returns ZERO rows on this corpus; 'the' IS a corpus token yet
    contributes zero result rows (stop-removal on both sides); each
    Porter mechanism is exercised by a term that only matches through
    it (double-consonant fixup for 'scanning'->'scan', 1a-meets-1c
    'queries'/'query' -> 'queri')."""
    from serverless_datalake_aws_spark.plans.search import _X12_TERMS

    docs = table(spark, SF_DIR, "documents")
    toks = docs.select(
        F.explode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("tok")
    )
    inflected = [t for t in _X12_TERMS if t != "the"]
    assert toks.filter(F.col("tok").isin(inflected)).count() == 0
    assert toks.filter(F.col("tok") == "the").count() > 0  # real token
    rows = all_queries()["x12_analyzed_search"](spark, SF_DIR).collect()
    by_term = {}
    for r in rows:
        by_term.setdefault(r.raw_term, set()).add(r.stem)
    assert "the" not in by_term  # stop-removed despite being a token
    assert by_term["scanning"] == {"scan"}  # 1b double-consonant fixup
    assert by_term["queries"] == {"queri"}  # 1a ies->i meets 1c y->i
    assert by_term["merges"] == {"merge"}
    assert by_term["sorted"] == {"sort"}
    assert by_term["tables"] == {"table"}
    assert all(r.tf >= 1 for r in rows)
