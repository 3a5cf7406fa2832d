"""Ninth tranche: the last TPC-H query shapes missing from the
delegated-SQL surface (Q6, Q11, Q15, Q16, Q17, Q20), adapted to the
testdata schema (no partsupp table — `lineitem` grouped on
(l_partkey, l_suppkey) stands in as the supply fact, and
supplier/part predicates replace the comment/container columns the
testdata lacks). Completes the Athena-delegation inventory from the
reference (`query-data-lambda.py:195-218`, SURVEY §2.7): with these,
every TPC-H query shape has a registered, oracle-checked equivalent.

Numeric-parity rule (the repo-wide convention from relational7/8):
any value that feeds a THRESHOLD COMPARE or equality (Q11's
fraction-of-total, Q15's max-revenue equality) is summed through an
exact DECIMAL image so Spark and DuckDB agree bit-for-bit regardless
of partial-sum order; display-only aggregates round to 4 dp.

Scale notes: Q6 is the canonical full-pushdown scan (predicates reach
the parquet reader, no shuffle at all — asserted in
tests/test_plans.py). Q11/Q15 aggregate lineitem once and reuse the
CTE for the scalar threshold — Spark plans the reused subquery as a
shared exchange under AQE. Q17's correlated per-part average becomes
a broadcast-joined aggregate on p_partkey; Q20's nested IN chain is
two semi-joins, both keyed on the natural partition columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from serverless_datalake_aws_spark.catalog import register_views
from serverless_datalake_aws_spark.plans import query

_Q72 = """
    SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
"""


@query("q72_forecast_revenue", oracle=_Q72)
def q72_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): single-table scan whose
    entire WHERE clause pushes down to the parquet reader — the
    benchmark's measure of pure scan+filter throughput. No join, no
    shuffle; one partial+final agg."""
    register_views(spark, sf_dir, ("lineitem",))
    return spark.sql(_Q72)


_Q73 = """
    WITH supply AS (
        SELECT l_partkey,
               sum(CAST(l_extendedprice * l_quantity AS DECIMAL(18,4)))
                   AS value
        FROM lineitem
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_3'
        GROUP BY l_partkey
    )
    SELECT l_partkey AS partkey, CAST(value AS DOUBLE) AS value
    FROM supply
    WHERE value > (SELECT sum(value) * 0.002 FROM supply)
"""


@query("q73_important_parts", oracle=_Q73)
def q73_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-shaped (important stock identification): per-part
    supply value for one nation's suppliers, kept only where it
    exceeds a fraction of the nation total (scalar subquery over the
    same CTE). partsupp is absent from testdata, so lineitem is the
    supply fact. The threshold compare runs on exact decimals — a
    double sum's partial-order noise would flip boundary parts
    between engines."""
    register_views(spark, sf_dir, ("lineitem", "supplier", "nation"))
    return spark.sql(_Q73)


_Q74 = """
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               sum(CAST(l_extendedprice * (1 - l_discount)
                   AS DECIMAL(18,4))) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
"""


@query("q74_top_supplier", oracle=_Q74)
def q74_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): quarterly revenue per supplier, keep
    the max (ties included). The reference formulates this as a VIEW +
    scalar subquery; a CTE is the same plan. Equality against the max
    demands exact arithmetic — hence the decimal image."""
    register_views(spark, sf_dir, ("lineitem", "supplier"))
    return spark.sql(_Q74)


_Q75 = """
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type NOT LIKE 'PROMO%'
      AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
"""


@query("q75_supplier_part_relation", oracle=_Q75)
def q75_supplier_part_relation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-shaped (parts/supplier relationship): distinct
    supplier counts per (brand, type, size) bucket with negated
    predicates and a NOT IN exclusion subquery (negative-balance
    suppliers stand in for the complaint-comment filter). Catalyst
    turns the NOT IN into a null-aware anti join; the part dim is
    broadcast."""
    register_views(spark, sf_dir, ("part", "lineitem", "supplier"))
    return spark.sql(_Q75)


_Q76 = """
    SELECT round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#3' AND p_type = 'SMALL'
      AND l_quantity < (
          SELECT 0.4 * avg(l_quantity) FROM lineitem l2
          WHERE l2.l_partkey = p_partkey)
"""


@query("q76_small_quantity_revenue", oracle=_Q76)
def q76_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): lineitems below 40%
    of their part's average quantity. The correlated scalar average is
    planned as a per-part aggregate joined back on p_partkey — one
    extra pass over lineitem, not a per-row subquery. Quantities are
    integral doubles, so the average is exact in both engines and the
    threshold compare cannot flip."""
    register_views(spark, sf_dir, ("lineitem", "part"))
    return spark.sql(_Q76)


_Q77 = """
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_partkey IN (
            SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY l_suppkey, l_partkey
        HAVING sum(l_quantity) > 60
    )
"""


@query("q77_promotion_suppliers", oracle=_Q77)
def q77_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-shaped (potential part promotion): suppliers who
    moved more than a threshold quantity of a named part family in a
    year — nested IN chain (part-name semi-join inside a grouped
    HAVING semi-join). Integral quantity sums keep the HAVING
    threshold exact. Both INs become left-semi hash joins on the
    natural keys."""
    register_views(spark, sf_dir, ("supplier", "lineitem", "part"))
    return spark.sql(_Q77)


_Q78 = """
    WITH nat AS (
        SELECT n_name,
               sum(l_extendedprice * (1 - l_discount)) AS rev
        FROM lineitem
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name
    )
    SELECT n_name,
           round(rev, 4) AS revenue,
           round(rev / sum(rev) OVER (), 6) AS share_of_total,
           round(sum(rev) OVER (ORDER BY rev DESC, n_name
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 / sum(rev) OVER (), 6) AS cumulative_share
    FROM nat
"""


@query("q78_ratio_to_report", oracle=_Q78)
def q78_ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report / share-of-total (the Oracle RATIO_TO_REPORT /
    BI "percent of total" shape, §2.7 window surface): per-nation
    revenue share plus the cumulative (Pareto) share in descending
    revenue order — one empty-frame window over a 25-row aggregate.

    Scale: the window runs over the AGGREGATED rows (|nations|), never
    the fact table; the fact scan is one partial+final agg with dims
    broadcast."""
    register_views(spark, sf_dir, ("lineitem", "supplier", "nation"))
    return spark.sql(_Q78)


_Q79 = """
    SELECT * FROM (
        SELECT o_orderkey AS ref_id, 'order' AS kind,
               o_orderdate AS at, o_totalprice AS amount,
               NULL AS event_type
        FROM orders WHERE o_orderdate >= TIMESTAMP '2001-07-01'
        UNION ALL BY NAME
        SELECT event_id AS ref_id, 'event' AS kind,
               ts AS at, NULL AS amount, event_type
        FROM events WHERE ts >= TIMESTAMP '2001-07-01'
    )
"""


@query("q79_heterogeneous_feed", oracle=_Q79)
def q79_heterogeneous_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heterogeneous activity feed: orders and events unioned BY NAME
    with missing columns null-filled (Spark
    `unionByName(allowMissingColumns=True)` = DuckDB `UNION ALL BY
    NAME`) — the schema-evolution append every multi-source lake needs
    when sources don't share a schema.

    Scale: both branches scan-filter with predicate pushdown and union
    without any shuffle; the feed streams out partition-local."""
    from serverless_datalake_aws_spark.catalog import table as _t

    orders = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "2001-07-01")
        .select(
            F.col("o_orderkey").alias("ref_id"),
            F.lit("order").alias("kind"),
            F.col("o_orderdate").alias("at"),
            F.col("o_totalprice").alias("amount"),
        )
    )
    events = (
        _t(spark, sf_dir, "events")
        .filter(F.col("ts") >= "2001-07-01")
        .select(
            F.col("event_id").alias("ref_id"),
            F.lit("event").alias("kind"),
            F.col("ts").alias("at"),
            "event_type",
        )
    )
    return orders.unionByName(events, allowMissingColumns=True)


_Q80 = """
    WITH base AS (SELECT event_id, event_type, ts, user_id
                  FROM events WHERE user_id < 200)
    SELECT event_id, event_type,
           count(DISTINCT user_id) OVER w AS users_exact,
           (abs(approx_count_distinct(user_id) OVER w
                - count(DISTINCT user_id) OVER w)
            <= greatest(2, CAST(floor(0.10 * (count(DISTINCT user_id) OVER w))
                                AS BIGINT)))
             AS sketch_within_10pct
    FROM base
    WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


@query("q80_running_distinct_approx", oracle=_Q80)
def q80_running_distinct_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch twin of q65's running distinct-user reach curve — the
    100 TB path the q65 docstring promises (VERDICT r4 watch item).

    q65's size(collect_set()) holds the exact distinct-key set per
    window partition in state: fine while the filter bounds cardinality,
    linear-memory death at true audience scale. The HLL sketch is the
    production substitute — constant ~1.5 KB of state per partition
    regardless of cardinality. Sketch estimates differ across engines
    by construction, so the q38 contract applies: hash-match the exact
    value plus each engine's own 'sketch within max(2, 10%) of exact'
    boolean, here at the default rsd where the 10% bound is ~2.5 sigma
    (the wider user_id<200 slice keeps counts high enough that the
    bound is stable at every tested SF)."""
    from pyspark.sql import Window as W

    from serverless_datalake_aws_spark.catalog import table as _t

    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 200)
    w = (
        W.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    exact = F.size(F.collect_set("user_id").over(w)).cast("long")
    # rsd=0.01 (q38 convention): at the default 5% rsd the 10% bound is
    # ~2 sigma and flakes at sf0.1; at 1% it is 10 sigma — deterministic
    sketch = F.approx_count_distinct("user_id", rsd=0.01).over(w)
    # explicit floor on BOTH sides: DuckDB CAST(double AS BIGINT)
    # rounds, Spark's truncates (e18/q83 share the rule)
    bound = F.greatest(
        F.lit(2).cast("long"), F.floor(0.10 * exact).cast("long")
    )
    return ev.select(
        "event_id",
        "event_type",
        exact.alias("users_exact"),
        (F.abs(sketch - exact) <= bound).alias("sketch_within_10pct"),
    )


_Q81 = """
    WITH skewed AS (
        SELECT CASE WHEN l_orderkey % 10 < 7 THEN 1
                    ELSE l_suppkey END AS hot_key,
               l_extendedprice, l_discount
        FROM lineitem
    )
    SELECT s.s_nationkey, count(*) AS n_lines,
           round(sum(sk.l_extendedprice * (1 - sk.l_discount)), 2) AS revenue
    FROM skewed sk JOIN supplier s ON sk.hot_key = s.s_suppkey
    GROUP BY s.s_nationkey
    ORDER BY s.s_nationkey
"""


@query("q81_skew_join_aqe", oracle=_Q81)
def q81_skew_join_aqe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deliberately skewed join handled by AQE's runtime skew split —
    the automatic complement to q68's manual salting (SURVEY §2.7 /
    SCALE.md skew note).

    70% of lineitem rows collapse onto hot_key=1, the textbook straggler:
    one shuffle partition carries 70% of the fact table while the rest
    idle. AQE detects the oversized partition at runtime from map-output
    sizes and splits it across reducers, each re-reading the (replicated)
    matching build rows — no salting code, identical results. The
    skew thresholds are lowered to fire at test scale (defaults are
    tuned for 256 MB partitions); the broadcast threshold is zeroed
    because a broadcast-hash join would dissolve the skew trivially and
    demonstrate nothing. Result-invariance is the oracle's contract:
    the plain SQL join must hash-match whatever plan AQE picks. The
    skew=true plan shape is asserted in tests/test_plans.py.

    Conf hygiene: the lowered thresholds must hold when the join
    EXECUTES, but must not leak into whatever the session runs next
    (a 64KB advisory partition size would wreck later AQE coalescing).
    So the result is forced into a cache under the scoped confs, the
    originals are restored, and the (tiny: |nations| rows) cached
    frame is returned."""
    from serverless_datalake_aws_spark.catalog import table as _t

    li = (
        _t(spark, sf_dir, "lineitem")
        .select(
            F.when(F.col("l_orderkey") % 10 < 7, F.lit(1))
            .otherwise(F.col("l_suppkey"))
            .alias("hot_key"),
            "l_extendedprice",
            "l_discount",
        )
        # AQE splits a skewed reduce partition along MAPPER-chunk
        # boundaries; the local single-file scan is one mapper, making
        # the hot partition indivisible. The round-robin repartition
        # emulates the thousands-of-mappers map stage any real-scale
        # scan has (where this line would be deleted).
        .repartition(16)
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    out = (
        li.join(supp.hint("merge"), li.hot_key == supp.s_suppkey)
        .groupBy("s_nationkey")
        .agg(
            F.count("*").alias("n_lines"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
        .orderBy("s_nationkey")
    )
    return run_with_skew_confs(spark, out)


def run_with_skew_confs(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Execute `df` with AQE skew-split thresholds scoped to this one
    job: save confs, lower thresholds so skew detection fires at test
    scale, materialize into a cache, restore confs, return the cache."""
    return run_with_scoped_confs(
        spark,
        df,
        {
            "spark.sql.adaptive.enabled": "true",
            "spark.sql.adaptive.skewJoin.enabled": "true",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        },
    )


# One cached result per scoped-conf query (keyed by the caller's conf
# dict, which is per-query static): repeated executions — the bench's 5
# timed runs, full-registry parity sweeps — unpersist the PREVIOUS run's
# cache instead of leaking one block-manager entry per call (ADVICE r5).
# The cache must outlive the return (callers inspect the executed plan
# on the returned frame for skew=true / bloom_filter_agg evidence), so
# "bounded to the latest run per query" is the correct lifetime.
_SCOPED_LAST: dict[tuple, DataFrame] = {}


def run_with_scoped_confs(
    spark: SparkSession, df: DataFrame, scoped: dict[str, str]
) -> DataFrame:
    """Execute `df` with session confs scoped to this one job: save
    originals, set the scoped values, force the plan into a cache (so
    the confs hold when the join EXECUTES), restore, return the cached
    frame. Returning a lazy df instead would leak the confs into
    whatever the shared session runs next. The persist is released on
    failure, and on the next call with the same conf set."""
    saved: dict[str, str | None] = {}
    for k in scoped:
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
    key = tuple(sorted(scoped.items()))
    # Release the PREVIOUS run's cache BEFORE persisting the new one:
    # CacheManager matches canonicalized plans, so a still-cached prior
    # result would alias this run's identical plan and the "execution"
    # would be an InMemoryTableScan — contaminating both the timing and
    # the executed-plan evidence (skew=true / bloom_filter_agg) the
    # callers of this function exist to produce.
    prev = _SCOPED_LAST.pop(key, None)
    if prev is not None:
        try:
            prev.unpersist()
        except Exception:
            pass  # session restarted since — nothing to release
    try:
        for k, v in scoped.items():
            spark.conf.set(k, v)
        df = df.persist()
        try:
            df.count()
        except Exception:
            df.unpersist()
            raise
        _SCOPED_LAST[key] = df
        return df
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


_Q84 = """
    SELECT l_returnflag, count(*) AS n_lines,
           round(sum(l_extendedprice), 2) AS rev
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY l_returnflag ORDER BY l_returnflag
"""


@query("q84_bloom_runtime_filter", oracle=_Q84)
def q84_bloom_runtime_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime bloom-filter join pruning — the ROW-level counterpart
    to q82's dynamic PARTITION pruning: the selective dim-side filter
    (urgent orders, ~20% selectivity) is turned into a bloom filter at
    runtime and pushed into the fact-side scan as
    `might_contain(xxhash64(l_orderkey))`, so most non-matching
    lineitem rows die at the scan instead of riding the shuffle into
    the join. At 100 TB this is the difference between shuffling the
    whole fact table and shuffling the ~matching fifth of it — free
    (Catalyst's InjectRuntimeFilter), but OFF at test scale because
    the application-side scan must exceed 10 GB; the scoped conf
    lowers that threshold (a real deployment keeps the default), and
    the broadcast threshold is disabled because broadcast joins get
    their filtering for free and demonstrate nothing. Plan shape
    (bloom_filter_agg creation + might_contain application) is
    asserted in tests/test_plans.py; the oracle's plain SQL join
    hash-match proves the filter never drops a matching row."""
    from serverless_datalake_aws_spark.catalog import table as _t

    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_extendedprice"
    )
    out = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum("l_extendedprice"), 2).alias("rev"),
        )
        .orderBy("l_returnflag")
    )
    return run_with_scoped_confs(
        spark,
        out,
        {
            "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold": "1KB",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        },
    )


_Q82 = """
    WITH dim(prio, lane) AS (VALUES
        ('1-URGENT','fast'), ('2-HIGH','fast'), ('3-MEDIUM','slow'),
        ('4-NOT SPECIFIED','slow'), ('5-LOW','slow'))
    SELECT prio, round(sum(o_totalprice), 2) AS rev, count(*) AS n
    FROM orders JOIN dim ON o_orderpriority = prio
    WHERE lane = 'fast'
    GROUP BY prio ORDER BY prio
"""


@query("q82_dynamic_partition_pruning", oracle=_Q82)
def q82_dynamic_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning: the dim-side filter prunes the
    partitioned fact scan AT RUNTIME — the star-schema scale feature
    where a `WHERE dim.attr = x` touching 2 of 5 partitions reads 40%
    of a 100 TB fact table instead of 100%. The fact here is a
    partitioned copy of orders written per call (the driver testdata is
    unpartitioned single-file parquet); at deployment the lake's hive
    layout (data_type/ingest_date, engine.ingest_batch) is the
    partitioned fact and this query shape prunes it for free.

    Heuristic trap (probed): Spark's PartitionPruning rule requires a
    LIKELY-SELECTIVE predicate on the filtering side — `lane = 'fast'`
    qualifies, a bare boolean column (`WHERE is_urgent`) does NOT, and
    DPP silently stays off. The `dynamicpruningexpression` plan shape
    is asserted in tests/test_plans.py."""
    import shutil as _shutil
    import tempfile as _tempfile

    from serverless_datalake_aws_spark.catalog import table as _t

    work = _tempfile.mkdtemp(prefix="q82_")
    try:
        _t(spark, sf_dir, "orders").write.partitionBy("o_orderpriority").parquet(
            f"{work}/orders_part"
        )
        fact = spark.read.parquet(f"{work}/orders_part")
        dim = spark.createDataFrame(
            [
                ("1-URGENT", "fast"),
                ("2-HIGH", "fast"),
                ("3-MEDIUM", "slow"),
                ("4-NOT SPECIFIED", "slow"),
                ("5-LOW", "slow"),
            ],
            "prio string, lane string",
        )
        out = (
            fact.join(dim, fact.o_orderpriority == dim.prio)
            .filter(F.col("lane") == "fast")
            .groupBy("prio")
            .agg(
                F.round(F.sum("o_totalprice"), 2).alias("rev"),
                F.count("*").alias("n"),
            )
            .orderBy("prio")
        )
        rows = out.collect()  # materialize before the workdir vanishes
        q82_dynamic_partition_pruning.last_executed_plan = (
            out._jdf.queryExecution().executedPlan().toString()
        )
        return spark.createDataFrame(rows, out.schema)
    finally:
        _shutil.rmtree(work, ignore_errors=True)


_Q83 = """
    WITH triples AS (
        SELECT DISTINCT event_type, time_bucket(INTERVAL '1 hour', ts) AS h,
               user_id
        FROM events
    ),
    cum AS (
        SELECT event_type, h,
               count(DISTINCT user_id) OVER w AS cum_exact,
               approx_count_distinct(user_id) OVER w AS cum_est
        FROM triples
        WINDOW w AS (PARTITION BY event_type ORDER BY h
                     RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, strftime(h, '%Y-%m-%d %H:00') AS hour,
           max(cum_exact) AS users_exact,
           (abs(max(cum_est) - max(cum_exact))
            <= greatest(2, CAST(floor(0.05 * max(cum_exact)) AS BIGINT)))
             AS sketch_within_5pct
    FROM cum
    GROUP BY event_type, h
    ORDER BY event_type, h
"""


@query("q83_reach_curve_sketch_rollup", oracle=_Q83)
def q83_reach_curve_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCALABLE form of q80's audience-reach curve. q80 (like q65)
    windows over raw events, so parallelism is capped at
    |event_types| partitions and every partition holds its full event
    stream — the 1000-executor smell. Here the heavy work is a plain
    per-(type, hour) HLL sketch aggregation (map-side combined, fully
    parallel, shuffle ∝ types×hours), and the running union —
    `hll_union_agg` as a WINDOW function, sketches are unionable in
    any grouping — runs over the tiny hourly grain (|types×hours|
    rows). The exact audit column rides the deduped (type, hour, user)
    triples, also far smaller than the raw stream. Same q38 own-bound
    contract: each engine's sketch within max(2, 5%) of its exact."""
    from pyspark.sql import Window as W

    from serverless_datalake_aws_spark.catalog import table as _t

    ev = _t(spark, sf_dir, "events").select(
        "event_type", F.date_trunc("hour", "ts").alias("h"), "user_id"
    )
    hourly_sk = ev.groupBy("event_type", "h").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    wh = W.partitionBy("event_type").orderBy("h")
    est = hourly_sk.select(
        "event_type",
        "h",
        F.hll_sketch_estimate(F.hll_union_agg("sk").over(wh)).alias("est"),
    )
    triples = ev.distinct()
    exact = (
        triples.withColumn(
            "cum", F.size(F.collect_set("user_id").over(wh)).cast("long")
        )
        .groupBy("event_type", "h")
        .agg(F.max("cum").alias("users_exact"))
    )
    bound = F.greatest(
        F.lit(2).cast("long"),
        F.floor(0.05 * F.col("users_exact")).cast("long"),
    )
    return (
        exact.join(est, ["event_type", "h"])
        .select(
            "event_type",
            F.date_format("h", "yyyy-MM-dd HH:00").alias("hour"),
            "users_exact",
            (F.abs(F.col("est") - F.col("users_exact")) <= bound).alias(
                "sketch_within_5pct"
            ),
        )
        .orderBy("event_type", "hour")
    )
