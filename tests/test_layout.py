"""Z-order layout: quantize/interleave correctness, file-level pruning
effect, and the fail-fast guards (ADVICE r4: quantize was dead code and
zorder_write interpolated raw SQL with integral-only DIV)."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from serverless_datalake_aws_spark.operators.layout import (
    interleave_bits,
    quantize,
    zorder_write,
)


def test_quantize_exact_cell_boundaries(spark):
    df = spark.range(100)
    out = df.select(
        quantize(F.col("id"), F.lit(0), F.lit(99), bits=2).alias("cell")
    ).collect()
    cells = {r["cell"] for r in out}
    assert cells == {0, 1, 2, 3}
    # floor((v - lo) * 4 / 100): exact integer boundaries
    by_id = dict(zip(range(100), [r["cell"] for r in out]))
    assert by_id[24] == 0 and by_id[25] == 1
    assert by_id[49] == 1 and by_id[50] == 2
    assert by_id[99] == 3


def test_quantize_used_by_zorder_matches_manual(spark):
    """quantize() is the exported helper zorder_write actually uses —
    no stringified-SQL twin (the old divergence)."""
    df = spark.range(1000).select(
        (F.col("id") % 37).alias("a"), (F.col("id") % 53).alias("b")
    )
    q = df.select(
        quantize(F.col("a"), F.lit(0), F.lit(36), 12).alias("qa")
    ).agg(F.min("qa"), F.max("qa")).collect()[0]
    # max value maps to floor((hi-lo)*cells/span) with span = hi-lo+1
    assert q[0] == 0 and q[1] == (36 * (1 << 12)) // 37
    assert q[1] < (1 << 12)


def test_interleave_bits_known_value(spark):
    # a=0b11 -> bits at positions 0,2 ; b=0b01 -> bit at position 1
    row = (
        spark.range(1)
        .select(interleave_bits(F.lit(3), F.lit(1), bits=2).alias("z"))
        .collect()[0]
    )
    assert row["z"] == 0b0111


def test_zorder_write_boxes_are_small(spark, tmp_path):
    """Each output file must own a small bounding box in BOTH columns:
    a point predicate overlaps strictly fewer files than a random
    layout would (the whole point of Morton clustering)."""
    n = 20_000
    df = spark.range(n).select(
        (F.hash(F.col("id")) % 1024).alias("x"),
        (F.hash(F.col("id") + 7) % 1024).alias("y"),
    )
    path = str(tmp_path / "z")
    zorder_write(df, path, ("x", "y"), bits=10, num_files=16)
    files = sorted(glob.glob(path + "/part-*.parquet"))
    assert len(files) > 4
    hit_x = hit_y = 0
    for f in files:
        md = pq.read_metadata(f)
        mins = {"x": None, "y": None}
        maxs = {"x": None, "y": None}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                name = col.path_in_schema
                if name in mins and col.statistics is not None:
                    s = col.statistics
                    mins[name] = s.min if mins[name] is None else min(mins[name], s.min)
                    maxs[name] = s.max if maxs[name] is None else max(maxs[name], s.max)
        if mins["x"] is not None and mins["x"] <= 0 <= maxs["x"]:
            hit_x += 1
        if mins["y"] is not None and mins["y"] <= 0 <= maxs["y"]:
            hit_y += 1
    # x=0 (or y=0) should prune most files; unclustered data would hit all
    assert hit_x < len(files)
    assert hit_y < len(files)


def test_zorder_date_and_timestamp_columns(spark, tmp_path):
    df = spark.range(200).select(
        F.date_add(F.to_date(F.lit("2024-01-01")), (F.col("id") % 90).cast("int")).alias("d"),
        (F.col("id") % 10).alias("k"),
    )
    zorder_write(df, str(tmp_path / "zd"), ("d", "k"), bits=8, num_files=4)
    back = spark.read.parquet(str(tmp_path / "zd"))
    assert back.count() == 200
    assert dict(back.dtypes)["d"] == "date"


def test_zorder_uniform_rejects_fractional_column(spark, tmp_path):
    # rank (default) bins fractional columns by quantiles (see
    # test_zorder_rank_accepts_fractional_columns); uniform min/max
    # binning still needs a declared precision and fails fast.
    df = spark.range(10).select(
        (F.col("id") * 1.5).alias("f"), F.col("id").alias("k")
    )
    with pytest.raises(TypeError, match="non-integral"):
        zorder_write(df, str(tmp_path / "zf"), ("f", "k"), quantizer="uniform")


def test_zorder_all_null_bounds_fail_fast(spark, tmp_path):
    df = spark.range(10).select(
        F.lit(None).cast("long").alias("a"), F.col("id").alias("k")
    )
    with pytest.raises(ValueError, match="NULL min/max"):
        zorder_write(df, str(tmp_path / "zn"), ("a", "k"))


def test_spark_quantize_interleave_match_python_reference(spark):
    """The Column implementations must agree with the exact-integer
    python mirrors in tests/test_properties.py on a deterministic
    grid (including negative and skewed ranges)."""
    from tests.test_properties import _interleave_py, _quantize_py

    lo, hi, bits = -500, 12345, 6
    vals = list(range(lo, hi + 1, 617))
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = (
        df.select(
            "v",
            quantize(F.col("v"), F.lit(lo), F.lit(hi), bits).alias("c"),
        )
        .orderBy("v")
        .collect()
    )
    for r in got:
        assert r["c"] == _quantize_py(r["v"], lo, hi, bits), r
    pairs = [(a, b) for a in range(0, 64, 7) for b in range(0, 64, 11)]
    dfp = spark.createDataFrame(pairs, "a long, b long")
    got = dfp.select(
        "a", "b", interleave_bits(F.col("a"), F.col("b"), 6).alias("z")
    ).collect()
    for r in got:
        assert r["z"] == _interleave_py(r["a"], r["b"], 6), r


def test_zorder_three_columns(spark, tmp_path):
    """N-column Morton clustering: every output file's bounding box
    must be narrow in ALL THREE dimensions (each axis's point
    predicate prunes some files)."""
    n = 20_000
    df = spark.range(n).select(
        (F.hash(F.col("id")) % 512).alias("x"),
        (F.hash(F.col("id") + 7) % 512).alias("y"),
        (F.hash(F.col("id") + 13) % 512).alias("w"),
    )
    path = str(tmp_path / "z3")
    zorder_write(df, path, ("x", "y", "w"), bits=9, num_files=16)
    back = spark.read.parquet(path)
    assert back.count() == n
    files = sorted(glob.glob(path + "/part-*.parquet"))
    assert len(files) > 4
    hits = {"x": 0, "y": 0, "w": 0}
    for f in files:
        md = pq.read_metadata(f)
        mins, maxs = {}, {}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                nm = col.path_in_schema
                if nm in hits and col.statistics:
                    s = col.statistics
                    mins[nm] = min(mins.get(nm, s.min), s.min)
                    maxs[nm] = max(maxs.get(nm, s.max), s.max)
        for k in hits:
            if mins[k] <= 0 <= maxs[k]:
                hits[k] += 1
    for k, h in hits.items():
        assert h < len(files), (k, hits)


def test_interleave_n_bits_overflow_guard(spark):
    with pytest.raises(ValueError, match="63 bits"):
        from serverless_datalake_aws_spark.operators.layout import interleave_bits_n

        interleave_bits_n([F.lit(1)] * 4, 16)


def test_zorder_partial_nulls_survive_both_quantizers(spark, tmp_path):
    """A few NULL rows in an otherwise-valid cluster column must not
    abort the rewrite (ADVICE r5: Bucketizer handleInvalid='error'
    threw mid-job) — NULLs land in cell 0 under BOTH quantizers and
    every row survives the rewrite."""
    df = spark.range(300).select(
        F.when(F.col("id") % 29 == 0, F.lit(None))
        .otherwise(F.col("id") % 37)
        .cast("long")
        .alias("a"),
        (F.col("id") % 53).alias("b"),
    )
    n_nulls = df.filter("a is null").count()
    assert n_nulls > 0
    for quant, sub in (("rank", "zr"), ("uniform", "zu")):
        zorder_write(
            df, str(tmp_path / sub), ("a", "b"), bits=4, num_files=4,
            quantizer=quant,
        )
        back = spark.read.parquet(str(tmp_path / sub))
        assert back.count() == 300, quant
        assert back.filter("a is null").count() == n_nulls, quant


def test_zorder_rank_accepts_fractional_columns(spark, tmp_path):
    """The rank quantizer bins by quantiles, so double columns z-order
    without pre-bucketing; the uniform quantizer still rejects them
    (min/max binning needs a declared precision)."""
    from serverless_datalake_aws_spark.operators.layout import zorder_write
    from pyspark.sql import functions as F

    df = spark.range(0, 4_000).select(
        "id",
        (F.col("id") % 211).alias("k"),
        (F.pmod(F.col("id") * 2654435761, F.lit(10_000)) / 100.0).alias("price"),
    )
    out = str(tmp_path / "zf")
    zorder_write(df, out, ("k", "price"), bits=6, num_files=4)
    back = spark.read.parquet(out)
    assert back.count() == 4_000
    assert set(back.columns) == {"id", "k", "price"}
