"""Format dispatch, round-trips, promotion, compaction (SURVEY §5.2 #3:
S1-S5 readers, K2-K5 writers)."""

from __future__ import annotations

import json

import pytest

from serverless_datalake_aws_spark.sources.readers import (
    detect_format,
    read_any,
    read_binary_dir,
)
from serverless_datalake_aws_spark.sources.writers import compact, promote, write_any


def test_detect_format_dispatch():
    assert detect_format("a/b/data.csv") == "csv"
    assert detect_format("x.JSON") == "json"
    assert detect_format("x.jsonl") == "ndjson"
    assert detect_format("x.ndjson") == "ndjson"
    assert detect_format("x.parquet") == "parquet"
    assert detect_format("x.txt") == "text"
    assert detect_format("x.xyz") is None  # unknown → skip-with-warn
    assert detect_format("noext") is None


def test_read_unknown_returns_none(spark, tmp_path):
    p = tmp_path / "data.xyz"
    p.write_text("whatever")
    assert read_any(spark, p) is None


def test_csv_roundtrip(spark, tmp_path):
    src = tmp_path / "t.csv"
    src.write_text("a,b,c\n1,x,2.5\n2,y,3.5\n")
    df = read_any(spark, src)
    assert df.count() == 2
    assert dict(df.dtypes) == {"a": "int", "b": "string", "c": "double"}
    out = tmp_path / "out_csv"
    write_any(df, out, fmt="csv")
    back = read_any(spark, out, fmt="csv")
    assert sorted(r["b"] for r in back.collect()) == ["x", "y"]


def test_json_array_vs_ndjson_sniff(spark, tmp_path):
    arr = tmp_path / "arr.json"
    arr.write_text(json.dumps([{"k": 1, "v": "a"}, {"k": 2, "v": "b"}]))
    nd = tmp_path / "nd.json"
    nd.write_text('{"k": 3, "v": "c"}\n{"k": 4, "v": "d"}\n')
    assert read_any(spark, arr).count() == 2  # S2 multiLine array
    assert read_any(spark, nd).count() == 2  # S3 NDJSON
    assert {r["k"] for r in read_any(spark, arr).collect()} == {1, 2}


def test_parquet_roundtrip_partitioned(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", "2024-01-01"), (2, "b", "2024-01-02")], "id int, v string, dt string"
    )
    out = tmp_path / "pq"
    write_any(df, out, fmt="parquet", partition_by=("dt",))
    assert (out / "dt=2024-01-01").exists()  # hive layout (K1 path scheme)
    back = read_any(spark, out)
    assert back.count() == 2


def test_promote_stamps_and_transforms(spark, tmp_path):
    src = tmp_path / "raw.csv"
    src.write_text("id,v\n1,10\n2,20\n")
    dst = tmp_path / "processed_csv"
    from pyspark.sql import functions as F

    promote(spark, src, dst, transform=lambda d: d.withColumn("v2", F.col("v") * 2))
    back = read_any(spark, dst, fmt="csv")
    assert "processed_timestamp" in back.columns
    assert sorted(r["v2"] for r in back.collect()) == [20, 40]


def test_compact_reduces_files(spark, tmp_path):
    df = spark.createDataFrame([(i, "x" * 50) for i in range(1000)], "id int, pad string")
    out = tmp_path / "many"
    df.repartition(16).write.parquet(str(out))
    before = len(list(out.glob("*.parquet")))
    assert before >= 16
    n = compact(spark, out, target_file_mb=128)
    after = len(list(out.glob("*.parquet")))
    assert n == 1 and after == 1
    assert read_any(spark, out).count() == 1000


def test_compact_preserves_format(spark, tmp_path):
    """Compacting a CSV table must rewrite CSV, not parquet — otherwise
    extension-dispatched readers break afterwards (ADVICE r1)."""
    df = spark.createDataFrame([(i, f"v{i}") for i in range(100)], "id int, v string")
    out = tmp_path / "many_csv"
    df.repartition(8).write.option("header", True).csv(str(out))
    assert len(list(out.glob("*.csv"))) >= 8
    n = compact(spark, out, target_file_mb=128, fmt="csv")
    assert n == 1
    assert len(list(out.glob("*.csv"))) == 1
    assert len(list(out.glob("*.parquet"))) == 0
    back = read_any(spark, out)  # extension dispatch must still work
    assert back.count() == 100


def test_orc_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    out = tmp_path / "t_orc"
    write_any(df, out, fmt="orc")
    back = read_any(spark, out)  # directory inference picks .orc
    assert back.count() == 2
    assert dict(back.dtypes) == {"id": "int", "v": "string"}


def test_corrupt_json_records_quarantined(spark, tmp_path):
    """T14 skip path: malformed JSON lines land in _corrupt_record
    (PERMISSIVE default) instead of failing the read — the engine's
    version of the reference's skip-with-warning (index-data-lambda.py:
    128-131)."""
    nd = tmp_path / "mixed.json"
    nd.write_text('{"k": 1}\nNOT JSON AT ALL\n{"k": 3}\n')
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    df = read_any(spark, nd, schema=schema, fmt="ndjson").cache()
    assert df.count() == 3
    good = df.filter(df["_corrupt_record"].isNull())
    bad = df.filter(df["_corrupt_record"].isNotNull())
    assert sorted(r["k"] for r in good.collect()) == [1, 3]
    assert bad.first()["_corrupt_record"] == "NOT JSON AT ALL"


def test_binary_source(spark, tmp_path):
    (tmp_path / "img1.bin").write_bytes(b"\x89PNG fake")
    (tmp_path / "img2.bin").write_bytes(b"RIFF fake")
    df = read_binary_dir(spark, tmp_path, glob="*.bin")
    rows = df.select("path", "length", "content").collect()
    assert len(rows) == 2
    assert all(r["length"] > 0 and isinstance(r["content"], bytes) for r in rows)


def test_schema_evolution_merge_on_read(spark, tmp_path):
    # the lake's schema-evolution contract: a later batch adds a column;
    # mergeSchema read surfaces it with nulls for the old rows
    out = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id long, v string").write.mode(
        "append"
    ).parquet(out)
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, v string, score double"
    ).write.mode("append").parquet(out)
    df = spark.read.option("mergeSchema", "true").parquet(out)
    assert set(df.columns) == {"id", "v", "score"}
    rows = {r.id: r.score for r in df.collect()}
    assert rows[1] is None and rows[2] == 9.5


def test_write_training_shards_manifest_and_balance(spark, tmp_path):
    from serverless_datalake_aws_spark.sources.writers import write_training_shards

    df = spark.range(50_000).selectExpr(
        "id", "repeat('x', 100) as text", "id % 7 as label"
    )
    out = tmp_path / "shards"
    m = write_training_shards(spark, df, out, target_shard_mb=1, shuffle_seed=7)
    assert m["n_shards"] >= 2
    assert m["total_rows"] == 50_000
    assert (out / "_manifest.json").exists()
    # shards are size-balanced: max within 2x of min (hash routing)
    sizes = [s["rows"] for s in m["shards"] if s["rows"] > 0]
    assert max(sizes) < 2 * min(sizes)
    # round-trip: the shards ARE the dataset
    back = spark.read.parquet(str(out))
    assert back.count() == 50_000
    assert set(back.columns) == {"id", "text", "label"}
    # deterministic assignment under a seed
    m2 = write_training_shards(spark, df, tmp_path / "shards2", target_shard_mb=1, shuffle_seed=7)
    assert [s["rows"] for s in m2["shards"]] == [s["rows"] for s in m["shards"]]


def test_tsv_and_compressed_dispatch(spark, tmp_path):
    """.tsv dispatches as tab-separated csv; .gz text files dispatch on
    the inner extension and decompress transparently (Hadoop codec)."""
    import gzip

    from serverless_datalake_aws_spark.sources.readers import detect_format, read_any

    tsv = tmp_path / "t.tsv"
    tsv.write_text("a\tb\n1\tx\n2\ty\n")
    assert detect_format(tsv) == "tsv"
    df = read_any(spark, tsv)
    assert df.count() == 2 and set(df.columns) == {"a", "b"}

    nd = tmp_path / "logs.ndjson.gz"
    with gzip.open(nd, "wt") as f:
        f.write('{"k": 1}\n{"k": 2}\n{"k": 3}\n')
    assert detect_format(nd) == "ndjson"
    assert read_any(spark, nd).count() == 3

    csvgz = tmp_path / "d.csv.gz"
    with gzip.open(csvgz, "wt") as f:
        f.write("x,y\n1,2\n")
    assert detect_format(csvgz) == "csv"
    assert read_any(spark, csvgz).count() == 1

    # bare .gz with no inner extension stays unknown → skip-with-warn
    blob = tmp_path / "blob.gz"
    with gzip.open(blob, "wb") as f:
        f.write(b"\x00")
    assert detect_format(blob) is None


def test_route_to_shards_exact_balance(spark):
    """repartition(n, pmod(hash(x), n)) double-hashes (empty shards +
    multi-x skew); routing through per-bucket representatives lands
    every row in exactly the intended partition."""
    from pyspark.sql import functions as F

    from serverless_datalake_aws_spark.sources.writers import route_to_shards

    out = route_to_shards(spark.range(50_000), 16, seed=7)
    sizes = [
        r["n"]
        for r in out.groupBy(F.spark_partition_id().alias("p"))
        .agg(F.count("*").alias("n"))
        .collect()
    ]
    assert len(sizes) == 16  # no empty partitions
    assert max(sizes) / min(sizes) < 1.2
    assert out.select("_shard").distinct().count() == 16


def test_compact_csv_preserves_string_values(spark, tmp_path):
    """Compaction is layout-only: csv values must not be re-typed on
    the round trip ('01234' staying '01234', not 1234)."""
    from serverless_datalake_aws_spark.sources.writers import compact, write_any

    df = spark.createDataFrame(
        [("01234", "1e5"), ("99999", "2e3")], "zip string, sci string"
    )
    path = tmp_path / "t"
    write_any(df.repartition(4), path, fmt="csv")
    compact(spark, path, fmt="csv")
    got = {
        (r["zip"], r["sci"])
        for r in spark.read.option("header", True).csv(str(path)).collect()
    }
    assert got == {("01234", "1e5"), ("99999", "2e3")}
