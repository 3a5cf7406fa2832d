"""File-statistics index + bloom file index (sources/stats.py).

Correctness: stats match a ground-truth data scan; pruning never
changes results (fail-open on stale/missing stats); blooms have no
false negatives. Efficiency: the pruned scan provably opens fewer
files (`df.inputFiles()` — the physical scan's file list), which is
the entire point of the layer at 100 TB.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from serverless_datalake_aws_spark.sources import stats as S


@pytest.fixture(scope="module")
def clustered(spark, tmp_path_factory):
    """16-file table range-clustered by id; string/ts columns derived."""
    root = str(tmp_path_factory.mktemp("stats") / "t")
    (
        spark.range(0, 20_000)
        .select(
            "id",
            F.concat(F.lit("k"), F.format_string("%06d", "id")).alias("key"),
            F.timestamp_micros(
                F.lit(1_700_000_000_000_000) + F.col("id") * 1_000_000
            ).alias("ts"),
            (F.col("id") % 7).alias("bucket"),
        )
        .repartitionByRange(16, "id")
        .write.parquet(root)
    )
    return root


@pytest.fixture(scope="module")
def stats(spark, clustered):
    return S.collect_file_stats(spark, clustered).cache()


def test_stats_match_data_scan(spark, clustered, stats):
    truth = {
        r["file"]: (r["mn"], r["mx"], r["n"])
        for r in spark.read.parquet(clustered)
        .groupBy(
            F.regexp_replace(F.input_file_name(), "^file:(//)?", "").alias("file")
        )
        .agg(F.min("id").alias("mn"), F.max("id").alias("mx"), F.count("*").alias("n"))
        .collect()
    }
    got = {
        r["file"]: (int(r["min_v"]), int(r["max_v"]), r["num_rows"])
        for r in stats.filter(F.col("column") == "id").collect()
    }
    assert got == truth
    assert len(got) == 16


def test_prune_reduces_files_and_preserves_results(spark, clustered, stats):
    full = (
        spark.read.parquet(clustered)
        .filter((F.col("id") >= 3_000) & (F.col("id") <= 4_000))
        .agg(F.count("*").alias("n"), F.sum("id").alias("s"))
        .first()
    )
    pruned = S.pruned_scan(spark, clustered, stats, "id", 3_000, 4_000)
    got = pruned.agg(F.count("*").alias("n"), F.sum("id").alias("s")).first()
    assert (got["n"], got["s"]) == (full["n"], full["s"]) == (1001, 3_503_500)
    # the efficiency claim: a 5%-selectivity range on a range-clustered
    # table must NOT open all 16 files
    assert 1 <= len(pruned.inputFiles()) <= 3


def test_prune_string_and_timestamp_kinds(spark, clustered, stats):
    fs = S.prune_files(stats, "key", lo="k003000", hi="k004000")
    assert 1 <= len(fs) <= 3
    lo = dt.datetime(2023, 11, 14, 22, 13, 20) + dt.timedelta(seconds=3_000)
    hi = lo + dt.timedelta(seconds=1_000)
    ft = S.prune_files(stats, "ts", lo=lo, hi=hi)
    assert 1 <= len(ft) <= 3
    # unclustered column: stats exist but cannot prune (every file
    # spans all buckets) — full keep, never a wrong drop
    assert len(S.prune_files(stats, "bucket", lo=3, hi=3)) == 16


def test_prune_fail_open_on_stale_index(spark, clustered, stats):
    # a file written AFTER analyze must still be read
    (
        spark.range(1_000_000, 1_000_005)
        .select(
            "id",
            F.lit("zz").alias("key"),
            F.timestamp_micros(F.lit(1_700_000_000_000_000)).alias("ts"),
            F.lit(0).cast("long").alias("bucket"),
        )
        .coalesce(1)
        .write.mode("append")
        .parquet(clustered)
    )
    got = S.pruned_scan(spark, clustered, stats, "id", 1_000_000, 2_000_000)
    assert got.count() == 5


def test_dropped_only_collect_matches_inventory_semantics(
    spark, clustered, stats
):
    """pruned_scan's r12 restructure collects only the DROPPED set
    (payload O(excluded files), no join/distinct job). It must choose
    exactly (keep ∩ on_disk) ∪ (on_disk − indexed), i.e. on_disk −
    dropped — including surviving a stale index row naming a file a
    rewrite deleted."""
    on_disk = set(S.list_parquet_files(clustered))
    dropped = S._dropped_files(stats, "id", lo=0, hi=500)
    kept = set(S.prune_files(stats, "id", lo=0, hi=500))
    indexed = {
        S._strip_uri(r["file"])
        for r in stats.select("file").distinct().collect()
    }
    assert dropped == indexed - kept  # dropped ⊆ indexed, complement
    assert on_disk - dropped == (kept & on_disk) | (on_disk - indexed)
    # stale index entry: point the stats at a path that no longer
    # exists; the scan must neither crash nor lose rows
    ghost = stats.limit(0).unionByName(
        stats.filter(F.col("column") == "id").limit(1)
    ).withColumn("file", F.lit("/no/such/dir/gone.parquet"))
    stale = stats.unionByName(ghost)
    got = S.pruned_scan(spark, clustered, stale, "id", 0, 500)
    assert got.filter(F.col("id") <= 500).count() == 501


def test_prune_open_bounds_and_missing_column(spark, clustered, stats):
    assert len(S.prune_files(stats, "id", lo=19_000)) <= 2
    assert len(S.prune_files(stats, "id", hi=500)) <= 2
    # unknown column: no stats rows -> nothing dropped
    assert len(S.prune_files(stats, "no_such_col", lo=1, hi=2)) >= 16


@pytest.fixture(scope="module")
def scattered(spark, tmp_path_factory):
    """8-file table hash-scattered by key — zone maps useless here."""
    root = str(tmp_path_factory.mktemp("bloom") / "t")
    (
        spark.range(0, 8_000)
        .select(
            "id",
            F.concat(F.lit("doc-"), F.format_string("%05d", "id")).alias("key"),
        )
        .repartition(8, "id")
        .write.parquet(root)
    )
    return root


@pytest.fixture(scope="module")
def blooms(spark, scattered):
    return S.build_bloom_index(spark, scattered, "key", num_bits=1 << 16).cache()


def test_bloom_no_false_negatives(spark, scattered, blooms):
    truth = {
        r["key"]: r["file"]
        for r in spark.read.parquet(scattered)
        .select(
            F.regexp_replace(F.input_file_name(), "^file:(//)?", "").alias("file"),
            "key",
        )
        .collect()
    }
    for i in range(0, 8_000, 997):  # 9 sampled keys
        k = f"doc-{i:05d}"
        cand = S.bloom_candidate_files(spark, blooms, k, num_bits=1 << 16)
        assert truth[k] in cand  # the containing file is always a candidate


def test_bloom_point_scan_exact_and_pruning(spark, scattered, blooms):
    got = S.bloom_point_scan(
        spark, scattered, blooms, "key", "doc-04321", num_bits=1 << 16
    )
    rows = got.collect()
    assert len(rows) == 1 and rows[0]["id"] == 4321
    # fpp at n=1k rows/file, m=64k bits, k=5 is << 1 — expect 1 file
    assert len(got.inputFiles()) <= 2


def test_bloom_absent_key_prunes_everything(spark, scattered, blooms):
    assert S.bloom_candidate_files(spark, blooms, "absent", num_bits=1 << 16) == []
    got = S.bloom_point_scan(
        spark, scattered, blooms, "key", "absent", num_bits=1 << 16
    )
    assert got.count() == 0


def test_bloom_build_reads_only_key_column(spark, scattered):
    """The index build must be a column-pruned scan: only `key` (plus
    file name) reaches the reader, or at 100 TB the build would read
    the whole zone instead of one column's pages."""
    plan = S.build_bloom_index(
        spark, scattered, "key", num_bits=1 << 16
    )._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema: struct<key:string>" in plan


def test_engine_analyze_and_scan(spark, tmp_path):
    from serverless_datalake_aws_spark.engine import DataLakeEngine

    eng = DataLakeEngine(spark, str(tmp_path / "lake"))
    (
        spark.range(0, 5_000)
        .select("id", (F.col("id") * 2).alias("v"))
        .repartitionByRange(8, "id")
        .write.mode("overwrite")
        .parquet(eng.zone("processed"))
    )
    assert eng.analyze("processed") == 8
    got = eng.scan_pruned("processed", "id", 1_000, 1_200)
    assert got.count() == 201
    assert len(got.inputFiles()) <= 2
    eng.build_key_index("processed", "id", num_bits=1 << 16)
    row = eng.scan_by_key("processed", "id", 4_242).collect()
    assert len(row) == 1 and row[0]["v"] == 8_484


def test_pruned_scan_ignores_staging_debris(spark, tmp_path):
    """Files under a crashed rewrite's staging dirs must not ride the
    stale-index fail-open union (they would duplicate every row)."""
    import shutil

    from serverless_datalake_aws_spark.sources import stats as S

    base = tmp_path / "zone" / "records"
    spark.range(100).write.parquet(str(base))
    st = S.collect_file_stats(spark, tmp_path / "zone")
    # simulate a crash mid-optimize: a full staged copy left beside
    shutil.copytree(base, tmp_path / "zone" / "records.dedup.tmp")
    shutil.copytree(base, tmp_path / "zone" / "records.compact.tmp")
    got = S.pruned_scan(spark, tmp_path / "zone", st, "id", 10, 20)
    assert got.count() == 11  # not 22/33
