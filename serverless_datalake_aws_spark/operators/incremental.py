"""Incremental aggregate maintenance: algebraic partial rollups that
merge across batches without re-scanning history.

The reference recomputes its indexing tallies by full scan on every
run (index-data-lambda reprocesses the whole prefix); at 100 TB a
maintained rollup must absorb a delta batch touching only the delta's
rows plus the (tiny) rollup table. This module represents a rollup in
its ALGEBRAIC form — per measure: count, sum, min, max — which is
closed under merge (sum-of-sums, min-of-mins, ...), so

    rollup(base ∪ delta) == merge(rollup(base), rollup(delta))

holds exactly, batch by batch. Derived metrics that are NOT algebraic
(avg) are finalized from the merged partials (sum/count), never
merged directly — averaging averages is the classic wrong answer.

Scale notes: each `partial_rollup` is one map-side-combined
aggregation over its input only; `merge_rollups` shuffles only rollup
rows (|groups|, not |rows|). Exactly the partial-aggregate tree Spark
builds inside one job, lifted to cross-job/cross-day granularity.
"""

from __future__ import annotations

import math
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def partial_rollup(
    df: DataFrame,
    keys: list[str],
    measures: list[str],
    distinct_cols: list[str] | None = None,
    with_moments: bool = False,
) -> DataFrame:
    """Aggregate `df` to its mergeable partial state: one row per key
    combination carrying n_rows plus sum/min/max per measure.

    `distinct_cols` adds a mergeable HLL sketch per column (Spark's
    Apache DataSketches binary, closed under union) — the ONLY way
    distinct counts survive incremental maintenance: exact distinct is
    not algebraic (|A ∪ B| ≠ |A| + |B|), so a maintained rollup either
    re-scans history or keeps a sketch. `with_moments` adds sum of
    squares, making variance/stddev derivable at finalize."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for m in measures:
        aggs += [
            F.sum(m).alias(f"sum_{m}"),
            F.min(m).alias(f"min_{m}"),
            F.max(m).alias(f"max_{m}"),
        ]
        if with_moments:
            aggs.append(F.sum(F.col(m) * F.col(m)).alias(f"sumsq_{m}"))
    for c in distinct_cols or []:
        aggs.append(F.hll_sketch_agg(c).alias(f"hll_{c}"))
    return df.groupBy(*keys).agg(*aggs)


def merge_rollups(
    partials: list[DataFrame],
    keys: list[str],
    measures: list[str],
    distinct_cols: list[str] | None = None,
    with_moments: bool = False,
) -> DataFrame:
    """Merge partial states (same schema) into one: counts, sums and
    sums-of-squares add, mins/maxes fold, HLL sketches union. Input
    sizes are |groups| each — this never touches fact rows."""
    if not partials:
        raise ValueError("nothing to merge")
    union = reduce(lambda a, b: a.unionByName(b), partials)
    aggs = [F.sum("n_rows").alias("n_rows")]
    for m in measures:
        aggs += [
            F.sum(f"sum_{m}").alias(f"sum_{m}"),
            F.min(f"min_{m}").alias(f"min_{m}"),
            F.max(f"max_{m}").alias(f"max_{m}"),
        ]
        if with_moments:
            aggs.append(F.sum(f"sumsq_{m}").alias(f"sumsq_{m}"))
    for c in distinct_cols or []:
        aggs.append(F.hll_union_agg(f"hll_{c}").alias(f"hll_{c}"))
    return union.groupBy(*keys).agg(*aggs)


def finalize_rollup(
    partial: DataFrame,
    measures: list[str],
    distinct_cols: list[str] | None = None,
    with_moments: bool = False,
) -> DataFrame:
    """Derive the non-algebraic metrics from merged partials: avg from
    sum/count, sample variance from (sumsq - sum²/n)/(n-1) (NULL for
    n=1), approx distinct from the HLL estimate. Averaging per-batch
    averages — or per-batch variances — is the classic wrong answer;
    only the partials merge."""
    out = partial
    for m in measures:
        out = out.withColumn(f"avg_{m}", F.col(f"sum_{m}") / F.col("n_rows"))
        if with_moments:
            n = F.col("n_rows")
            s, s2 = F.col(f"sum_{m}"), F.col(f"sumsq_{m}")
            out = out.withColumn(
                f"var_{m}",
                F.when(n > 1, (s2 - s * s / n) / (n - F.lit(1))),
            )
    for c in distinct_cols or []:
        out = out.withColumn(
            f"approx_distinct_{c}", F.hll_sketch_estimate(f"hll_{c}")
        )
    return out


def _read_partials(spark, path: str) -> DataFrame | None:
    """Stored partial state, or None ONLY when never published. Any
    other read failure (corrupt footer, permission, transient IO)
    propagates — treating it as "first batch" would overwrite all
    accumulated history with one delta's partials."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(path)
    except AnalysisException as e:
        msg = str(e)
        if "PATH_NOT_FOUND" in msg or "Path does not exist" in msg:
            return None
        raise


def _publish_partials(spark, df: DataFrame, path: str) -> None:
    """tmp+swap publish with verified read-back: a crash (or partial
    write) mid-publish leaves the _tmp copy as the recovery point
    instead of a corrupt, unrecoverable state table. Local-FS cleanup;
    object stores route through sources/versioning.py's atomic
    publish."""
    tmp = path + "._tmp"
    df.write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp).write.mode("overwrite").parquet(path)
    spark.read.parquet(path).count()
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)


class MaintainedRollup:
    """A persisted rollup table absorbing delta batches incrementally.

    `apply(delta)` reads the stored partials (|groups| rows), merges
    the delta's partial state, and rewrites the rollup — history is
    never re-scanned. Parquet swap matches the lake's other
    maintenance ops; on object stores the swap becomes a versioned
    publish (sources/versioning.py)."""

    def __init__(
        self,
        spark,
        path: str,
        keys: list[str],
        measures: list[str],
        distinct_cols: list[str] | None = None,
        with_moments: bool = False,
    ):
        self.spark = spark
        self.path = path
        self.keys = keys
        self.measures = measures
        self.distinct_cols = distinct_cols or []
        self.with_moments = with_moments

    def _read_current(self) -> DataFrame | None:
        return _read_partials(self.spark, self.path)

    def apply(self, delta: DataFrame) -> None:
        batch = partial_rollup(
            delta,
            self.keys,
            self.measures,
            self.distinct_cols,
            self.with_moments,
        )
        current = self._read_current()
        if current is None:
            merged = batch
        else:
            merged = merge_rollups(
                [current, batch],
                self.keys,
                self.measures,
                self.distinct_cols,
                self.with_moments,
            )
        _publish_partials(self.spark, merged, self.path)

    def read(self) -> DataFrame:
        return finalize_rollup(
            self.spark.read.parquet(self.path),
            self.measures,
            self.distinct_cols,
            self.with_moments,
        )


def cm_partial(
    df: DataFrame, item_col: str, depth: int = 4, width: int = 64
) -> DataFrame:
    """Count-min sketch in LONG FORM — rows (d, bucket, cnt) — which
    makes the sketch algebraic for free: merging sketches is exactly a
    groupBy(d, bucket).sum, so maintained heavy-hitter counts ride the
    same partial/merge machinery as sums (no binary blobs, no custom
    merge UDF). Hashes are md5-affine (the t23 convention) so any
    engine reproduces the buckets bit-for-bit. Size: depth×width rows
    regardless of input — the whole sketch is broadcastable."""
    buckets = F.array(
        *[
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit(f"{d}:"), F.col(item_col).cast("string"))),
                        1,
                        14,
                    ),
                    16,
                    10,
                ).cast("long")
                % width
            )
            for d in range(depth)
        ]
    )
    return (
        df.select(F.posexplode(buckets).alias("d", "bucket"))
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cm_merge(partials: list[DataFrame]) -> DataFrame:
    """Merge long-form count-min sketches: bucket counts add."""
    if not partials:
        raise ValueError("nothing to merge")
    union = reduce(lambda a, b: a.unionByName(b), partials)
    return union.groupBy("d", "bucket").agg(F.sum("cnt").alias("cnt"))


def cm_estimate(
    sketch: DataFrame, items: DataFrame, item_col: str, depth: int = 4, width: int = 64
) -> DataFrame:
    """Point estimates from a long-form sketch: hash each item into its
    depth buckets, take the MINIMUM bucket count (count-min errs only
    upward). The sketch side is depth×width rows — broadcast, so the
    estimate join never shuffles the item side."""
    buckets = F.array(
        *[
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit(f"{d}:"), F.col(item_col).cast("string"))),
                        1,
                        14,
                    ),
                    16,
                    10,
                ).cast("long")
                % width
            )
            for d in range(depth)
        ]
    )
    hashed = items.select("*", F.posexplode(buckets).alias("d", "bucket"))
    return (
        hashed.join(F.broadcast(sketch), ["d", "bucket"])
        .groupBy(*items.columns)
        .agg(F.min("cnt").cast("long").alias("est_n"))
    )


class MaintainedJoin:
    """Incrementally-maintained JOIN view over insert-only feeds — the
    classical delta-join identity

        Δ(L ⋈ R) = ΔL ⋈ R_old  ∪  L_old ⋈ ΔR  ∪  ΔL ⋈ ΔR

    so absorbing a batch joins only delta rows against the stored
    snapshots, never recomputing the full view. Insert-only by design
    (ingest feeds append; updates/deletes need Delta/Iceberg MERGE —
    the documented upgrade); every batch appends the delta-join to the
    view and the deltas to the snapshots.

    Scale: the two delta-vs-snapshot joins are |Δ|-driven — with the
    snapshots hive-partitioned/bucketed on the join key the old-side
    scan prunes to matching partitions; ΔL ⋈ ΔR is delta-sized. The
    view append is blind (no read-modify-write)."""

    def __init__(self, spark, path: str, on: str, how: str = "inner"):
        if how != "inner":
            raise ValueError("insert-only delta maintenance supports inner joins")
        self.spark = spark
        self.path = path
        self.on = on

    def _read(self, sub: str) -> DataFrame | None:
        from pyspark.errors import AnalysisException

        try:
            return self.spark.read.parquet(f"{self.path}/{sub}")
        except AnalysisException as e:
            if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
                return None
            raise

    def apply(
        self,
        delta_left: DataFrame | None = None,
        delta_right: DataFrame | None = None,
    ) -> None:
        left_old, right_old = self._read("left"), self._read("right")
        parts = []
        if delta_left is not None and right_old is not None:
            parts.append(delta_left.join(right_old, self.on))
        if delta_right is not None and left_old is not None:
            parts.append(left_old.join(delta_right, self.on))
        if delta_left is not None and delta_right is not None:
            parts.append(delta_left.join(delta_right, self.on))
        if parts:
            dv = reduce(lambda a, b: a.unionByName(b), parts)
            dv.write.mode("append").parquet(f"{self.path}/view")
        if delta_left is not None:
            delta_left.write.mode("append").parquet(f"{self.path}/left")
        if delta_right is not None:
            delta_right.write.mode("append").parquet(f"{self.path}/right")

    def read(self) -> DataFrame:
        view = self._read("view")
        if view is None:
            raise FileNotFoundError(f"no view materialized at {self.path}")
        return view


# ---------------------------------------------------------------------------
# Mergeable quantile sketch (DDSketch-style log histogram, long form)
# ---------------------------------------------------------------------------
#
# Completes the maintained-sketch trio: HLL (distinct), count-min
# (frequency), and now quantiles — the third non-algebraic metric that
# otherwise forces a history re-scan. Representation is LONG FORM like
# cm_*: one row per (key, sign, bin, cnt), so merging sketches is a
# plain groupBy-sum and the whole machinery stays declarative (no
# binary blobs, no custom merge UDF). Binning is pure arithmetic
# (ln-ratio, DDSketch γ-geometric), so any engine — DuckDB included —
# reproduces the buckets and the estimates bit-for-bit.
#
# Guarantee: for gamma = (1+α)/(1-α), every value in bin b is within
# relative error α of the bin midpoint 2·γ^b/(γ+1); quantile estimates
# inherit that α-relative-error bound (DDSketch, VLDB'19).

QH_GAMMA = 1.02  # α ≈ 1% relative error


def _qh_sign_bin(value_col: str, gamma: float):
    """(sign, bin) columns for one value: sign ∈ {-1,0,1}; bin is the
    γ-geometric index ceil(ln|x|/ln γ) for nonzero x, 0 for x == 0.
    The ln-ratio is rounded to 9 decimals before ceil so a 1-ulp ln()
    difference across engines cannot flip a bucket at bin edges."""
    x = F.col(value_col).cast("double")
    sign = F.when(x > 0, F.lit(1)).when(x < 0, F.lit(-1)).otherwise(F.lit(0))
    mag = F.abs(x)
    bin_ = F.when(
        x == 0, F.lit(0)
    ).otherwise(F.ceil(F.round(F.log(mag) / F.lit(math.log(gamma)), 9)))
    return sign, bin_.cast("long")


def qh_partial(
    df: DataFrame,
    value_col: str,
    keys: list[str] | None = None,
    gamma: float = QH_GAMMA,
) -> DataFrame:
    """Quantile-sketch partial state: rows (*keys, sign, bin, cnt).
    One map-side-combined aggregation over the input; output size is
    |keys| × O(log-range / ln γ) rows regardless of input rows."""
    sign, bin_ = _qh_sign_bin(value_col, gamma)
    return (
        # NULL measures are excluded, matching SQL quantile semantics
        # (percentile/quantile_cont ignore NULLs) — counting them as
        # zeros would silently drag every estimate toward 0
        df.filter(F.col(value_col).isNotNull())
        .select(*(keys or []), sign.alias("sign"), bin_.alias("bin"))
        .groupBy(*(keys or []), "sign", "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def qh_merge(partials: list[DataFrame], keys: list[str] | None = None) -> DataFrame:
    """Merge long-form quantile sketches: bucket counts add, so
    sketch(base ∪ delta) == merge(sketch(base), sketch(delta)) exactly
    — the merged sketch IS the from-scratch sketch."""
    if not partials:
        raise ValueError("nothing to merge")
    union = reduce(lambda a, b: a.unionByName(b), partials)
    return union.groupBy(*(keys or []), "sign", "bin").agg(
        F.sum("cnt").alias("cnt")
    )


def qh_quantiles(
    sketch: DataFrame,
    qs: list[float],
    keys: list[str] | None = None,
    gamma: float = QH_GAMMA,
) -> DataFrame:
    """Quantile estimates from a long-form sketch: order buckets by
    their representative value (sign-aware γ-midpoint), take the
    running count, and for each q return the first bucket whose
    cumulative count reaches rank ceil(q·n) — the classic
    rank-in-histogram walk, expressed as a window + min_by so it stays
    one shuffle over SKETCH rows (never fact rows). Output:
    (*keys, q, est)."""
    from pyspark.sql import Window

    rep = F.when(F.col("sign") == 0, F.lit(0.0)).otherwise(
        F.col("sign")
        * F.lit(2.0 / (gamma + 1.0))
        * F.exp(F.col("bin").cast("double") * F.lit(math.log(gamma)))
    )
    w = (
        Window.partitionBy(*(keys or []))
        .orderBy("rep")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (
        sketch.withColumn("rep", rep)
        .withColumn("cum", F.sum("cnt").over(w))
        .withColumn("n", F.sum("cnt").over(Window.partitionBy(*(keys or []))))
    )
    quants = F.array(*[F.lit(float(q)) for q in qs])
    hits = (
        cum.select(*(keys or []), "rep", "cum", "n", F.explode(quants).alias("q"))
        .filter(F.col("cum") >= F.greatest(F.ceil(F.col("q") * F.col("n")), F.lit(1)))
        .groupBy(*(keys or []), "q")
        .agg(F.min_by("rep", "cum").alias("est"))
    )
    return hits


class MaintainedQuantiles:
    """A persisted long-form quantile sketch absorbing delta batches —
    the qh_* trio behind the MaintainedRollup maintenance contract
    (explicit first-batch detection, tmp+swap publish with the _tmp
    copy as crash-recovery point). Because qh_merge is exact bucket
    addition, the maintained sketch equals the from-scratch sketch
    bit-for-bit no matter how deltas were batched or ordered — counts
    are integers, so there is no DECIMAL image to carry (unlike
    streaming SUMs)."""

    def __init__(
        self,
        spark,
        path: str,
        value_col: str,
        keys: list[str] | None = None,
        gamma: float = QH_GAMMA,
    ):
        self.spark = spark
        self.path = path
        self.value_col = value_col
        self.keys = keys or []
        self.gamma = gamma

    def apply(self, delta: DataFrame) -> None:
        batch = qh_partial(delta, self.value_col, self.keys, self.gamma)
        current = _read_partials(self.spark, self.path)
        merged = batch if current is None else qh_merge([current, batch], self.keys)
        _publish_partials(self.spark, merged, self.path)

    def read(self) -> DataFrame:
        return self.spark.read.parquet(self.path)

    def quantiles(self, qs: list[float]) -> DataFrame:
        return qh_quantiles(self.read(), qs, self.keys, self.gamma)
