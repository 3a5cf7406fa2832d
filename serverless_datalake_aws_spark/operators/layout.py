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


def interleave_bits_n(cols: list[Column], bits: int) -> Column:
    """Morton-interleave N non-negative int columns of `bits` bits
    each: column c's bit i lands at position i*N + c. Pure
    codegen-able bit math; N*bits must fit a long (≤ 63)."""
    n = len(cols)
    if n < 2:
        raise ValueError("interleave needs at least 2 columns")
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a long's 63 bits")
    one = F.lit(1).cast("long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        for c, col in enumerate(cols):
            bit = F.shiftleft(
                F.shiftright(col.cast("long"), i).bitwiseAND(one), i * n + c
            )
            z = z.bitwiseOR(bit)
    return z


def interleave_bits(a: Column, b: Column, bits: int) -> Column:
    """Morton-interleave two non-negative int columns of `bits` bits:
    a's bit i lands at 2i, b's at 2i+1 (the 2-column case of
    `interleave_bits_n`)."""
    return interleave_bits_n([a, b], bits)


def quantize(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Map long values in [lo, hi] to integer cells [0, 2^bits) by
    uniform binning. Exact arithmetic: the scaled numerator is decimal
    (no double rounding past 2^53), and floor-of-nonnegative-quotient
    equals integer division, so every engine agrees on the cell id.
    Inputs must already be long-valued (see `_as_long` for the
    date/timestamp conversions); lo/hi are the inclusive global bounds."""
    cells = F.lit(1 << bits).cast("decimal(38,0)")
    lo_d = lo.cast("decimal(38,0)")
    span = hi.cast("decimal(38,0)") - lo_d + F.lit(1).cast("decimal(38,0)")
    scaled = (col.cast("decimal(38,0)") - lo_d) * cells
    return F.floor(scaled / span).cast("long")


# Integral-valued types quantize() accepts directly; date/timestamp are
# converted to days/seconds since epoch. Fractional types are rejected —
# uniform binning on floats needs a declared precision, which the caller
# should make explicit by pre-bucketing (e.g. F.round(c * 100)).
_INTEGRAL_TYPES = {"tinyint", "smallint", "int", "bigint"}


def _as_long(name: str, dtype: str, fractional_ok: bool = False) -> Column:
    if dtype in _INTEGRAL_TYPES:
        return F.col(name).cast("long")
    if dtype == "date":
        return F.datediff(F.col(name), F.to_date(F.lit("1970-01-01")))
    if dtype.startswith("timestamp"):
        return F.unix_timestamp(F.col(name))
    if fractional_ok and (
        dtype in ("float", "double") or dtype.startswith("decimal")
    ):
        # The rank quantizer bins by QUANTILES (approxQuantile +
        # Bucketizer both operate on doubles), so fractional columns
        # need no declared precision — only uniform min/max binning
        # does. Matches Delta's OPTIMIZE ZORDER accepting doubles.
        return F.col(name).cast("double")
    raise TypeError(
        f"zorder cluster column {name!r} has non-integral type {dtype}; "
        "supported: tinyint/smallint/int/bigint/date/timestamp"
        + (
            "/float/double/decimal" if fractional_ok else
            ". Pre-bucket fractional columns explicitly "
            "(e.g. round(c*100)), or use the rank quantizer"
        )
        + "."
    )


def rank_cells(df: DataFrame, col: str, bits: int):
    """Rank-based quantization: map `col` (a long column in `df`) to
    cells [0, 2^bits) by its QUANTILES, not its min/max span. On a
    skewed column, uniform binning collapses (most rows land in a few
    low cells, so the column's z-bits carry no information and footer
    stats stop pruning — measured: a value-only point predicate read
    15/16 files uniform vs 4/16 rank on the 10x events fixture). The
    same reason Delta's OPTIMIZE ZORDER uses range-partition ids.

    Cost at scale: one approx-quantile pass (GK sketch, map-side
    merged) collects ≤2^bits cutpoints to the driver; the bucket
    assignment is a JVM binary search per row (ml.Bucketizer), no
    shuffle."""
    n_cells = 1 << bits
    probs = [i / n_cells for i in range(1, n_cells)]
    # NaN rows are nulled out of the sketch (approxQuantile ignores
    # nulls; a NaN would otherwise poison the cutpoints) — they route
    # to cell 0 with NULLs in attach_zvalue's rank branch
    cuts = df.select(
        F.nanvl(F.col(col).cast("double"), F.lit(None).cast("double")).alias("_q")
    ).approxQuantile("_q", probs, 1.0 / (4 * n_cells))
    splits = [float("-inf")]
    for c in cuts:
        if c > splits[-1]:
            splits.append(c)
    splits.append(float("inf"))
    from pyspark.ml.feature import Bucketizer

    tmp_in, tmp_out = f"_rq_in_{col}", f"_rq_out_{col}"
    bucketizer = Bucketizer(
        splits=splits, inputCol=tmp_in, outputCol=tmp_out
    )
    return bucketizer, tmp_in, tmp_out


def zorder_write(
    df: DataFrame,
    path: str,
    cols: tuple[str, ...],
    bits: int = 12,
    num_files: int = 16,
    quantizer: str = "rank",
) -> None:
    """Rewrite `df` to `path` clustered by the z-value of `cols`
    (2 or more columns; N*bits must fit a long).

    quantizer='rank' (default) bins each column by its quantiles
    (approx-quantile cutpoints + JVM binary-search bucketize) so
    skewed distributions still spread across all 2^bits cells;
    'uniform' uses exact min/max arithmetic binning (`quantize`) —
    cheaper by one sketch pass, correct for evenly-distributed keys.
    The write is a single range-exchange on the z-value so each output
    file owns a contiguous z-range — a small hyper-rectangle in `cols`
    space that parquet footer stats expose to any scan.

    NULL rows in a cluster column map to that column's cell 0 (NULLS
    FIRST — they co-locate with the lowest values) identically under
    both quantizers; an all-NULL / empty column still fails fast in the
    bounds pass."""
    df = attach_zvalue(df, cols, bits=bits, quantizer=quantizer)
    (
        df.repartitionByRange(num_files, "_zv")
        .sortWithinPartitions("_zv")
        .drop("_zv")
        .write.mode("overwrite")
        .parquet(path)
    )


def attach_zvalue(
    df: DataFrame,
    cols: tuple[str, ...],
    bits: int = 12,
    quantizer: str = "rank",
) -> DataFrame:
    """Quantize `cols` and attach the Morton z-value as `_zv` (helper
    columns removed). Factored out of `zorder_write` so callers that
    must control the write themselves — engine.optimize_zone preserves
    hive partitioning with partitionBy — reuse the exact same
    quantization/NULL semantics."""
    if len(cols) < 2:
        raise ValueError("zorder needs at least 2 cluster columns")
    dtypes = dict(df.dtypes)
    tmp_cols = [f"_zl{i}" for i in range(len(cols))]
    for c, t in zip(cols, tmp_cols):
        df = df.withColumn(
            t, _as_long(c, dtypes[c], fractional_ok=(quantizer == "rank"))
        )
    bounds = df.agg(
        *[f(t).alias(f"{n}_{t}") for t in tmp_cols for f, n in ((F.min, "lo"), (F.max, "hi"))]
    ).collect()[0]
    for t in tmp_cols:
        if bounds[f"lo_{t}"] is None or bounds[f"hi_{t}"] is None:
            raise ValueError(
                f"zorder_write: cluster columns {cols} have NULL min/max "
                "(empty input or all-NULL column) — nothing to cluster on"
            )
    cells: list[Column] = []
    extra: list[str] = []
    if quantizer == "rank":
        for t in tmp_cols:
            bk, c_in, c_out = rank_cells(df, t, bits)
            # Bucketizer(handleInvalid='error') would abort the whole
            # rewrite on the first NULL or NaN row; feed it a
            # placeholder and route NULL/NaN explicitly to cell 0
            # below (NULLS FIRST; NaN joins them — deterministic and
            # shared with the uniform branch).
            d = F.col(t).cast("double")
            invalid = F.col(t).isNull() | F.isnan(d)
            df = df.withColumn(
                c_in, F.when(invalid, F.lit(0.0)).otherwise(d)
            )
            df = bk.transform(df)
            cells.append(
                F.when(invalid, F.lit(0)).otherwise(F.col(c_out)).cast("long")
            )
            extra += [c_in, c_out]
    elif quantizer == "uniform":
        for t in tmp_cols:
            cells.append(
                # quantize(NULL) is NULL — same NULLS-FIRST cell-0 rule
                # as the rank branch, so both quantizers agree. (NaN is
                # unreachable here: _as_long rejects fractional types
                # for the uniform quantizer, and integrals/dates have
                # no NaN.)
                F.coalesce(
                    quantize(
                        F.col(t),
                        F.lit(bounds[f"lo_{t}"]),
                        F.lit(bounds[f"hi_{t}"]),
                        bits,
                    ),
                    F.lit(0).cast("long"),
                )
            )
    else:
        raise ValueError(f"unknown quantizer: {quantizer!r}")
    return df.withColumn("_zv", interleave_bits_n(cells, bits)).drop(
        *tmp_cols, *extra
    )
