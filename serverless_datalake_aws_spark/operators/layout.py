"""Z-order (Morton) data layout: multi-dimensional clustering so
parquet min/max footer stats prune files for predicates on EITHER
(or both) of two columns.

The reference's lake is laid out purely by ingest time
(`{dataType}/{date}/uuid.json`), so any query filtering on a second
dimension scans everything under the date. Sorting by one column
fixes that column only; interleaving the bits of two rank-quantized
columns (the Delta/Iceberg `OPTIMIZE ZORDER` technique, public
literature: Morton 1966) gives every written file a SMALL bounding
box in both dimensions at once — a 2-D box predicate then overlaps
O(perimeter) files instead of O(all).

Scale notes: quantization bounds come from one 1-row aggregate
(broadcast scalar); the z-value is pure JVM bit arithmetic inside
whole-stage codegen; the layout write is one repartitionByRange
shuffle (range exchange on the z-value) + in-partition sort — the
same cost as any sorted rewrite, paid once at compaction time.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interleave_bits(a: Column, b: Column, bits: int) -> Column:
    """Morton-interleave two non-negative int columns of `bits` bits:
    a's bit i lands at 2i, b's at 2i+1. Pure codegen-able bit math."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            | F.shiftleft(F.shiftright(a.cast("long"), i) & F.lit(1), 2 * i)
            | F.shiftleft(F.shiftright(b.cast("long"), i) & F.lit(1), 2 * i + 1)
        )
    return z


def quantize(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Map values in [lo, hi] to integer cells [0, 2^bits) by uniform
    binning — exact integer arithmetic (mul then floor-div), so every
    engine agrees on the cell id."""
    cells = F.lit(1 << bits).cast("long")
    span = (hi.cast("long") - lo.cast("long") + F.lit(1)).cast("long")
    return ((col.cast("long") - lo.cast("long")) * cells).cast("long").__div__(
        span
    ).cast("long") if False else F.expr(
        f"CAST(((({col._jc.toString()}) - ({lo._jc.toString()})) * {1 << bits}) "
        f"DIV (({hi._jc.toString()}) - ({lo._jc.toString()}) + 1) AS BIGINT)"
    )


def zorder_write(
    df: DataFrame,
    path: str,
    cols: tuple[str, str],
    bits: int = 12,
    num_files: int = 16,
) -> None:
    """Rewrite `df` to `path` clustered by the z-value of `cols`.

    One pass computes global min/max per column (the quantization
    bounds, broadcast back as scalars); the write is a single
    range-exchange on the z-value so each output file owns a
    contiguous z-range — i.e. a small rectangle in (cols[0], cols[1])
    space that parquet footer stats expose to any scan."""
    ca, cb = cols
    b = df.agg(
        F.min(ca).alias("lo_a"),
        F.max(ca).alias("hi_a"),
        F.min(cb).alias("lo_b"),
        F.max(cb).alias("hi_b"),
    ).collect()[0]
    qa = F.expr(
        f"CAST((({ca} - {b['lo_a']}) * {1 << bits}) "
        f"DIV ({b['hi_a']} - {b['lo_a']} + 1) AS BIGINT)"
    )
    qb = F.expr(
        f"CAST((({cb} - {b['lo_b']}) * {1 << bits}) "
        f"DIV ({b['hi_b']} - {b['lo_b']} + 1) AS BIGINT)"
    )
    (
        df.withColumn("_zv", interleave_bits(qa, qb, bits))
        .repartitionByRange(num_files, "_zv")
        .sortWithinPartitions("_zv")
        .drop("_zv")
        .write.mode("overwrite")
        .parquet(path)
    )
