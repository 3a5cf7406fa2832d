"""Event-stream analytics (SURVEY.md §2.9 streaming semantics, batch view).

The reference's stream is S3-event→Lambda per-file processing with no
windows or watermarks; these queries provide the time-bucketed /
JSON-decode analytics surface over the same event shape. The streaming
variants live in `serverless_datalake_aws_spark/streaming/`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from serverless_datalake_aws_spark.catalog import table
from serverless_datalake_aws_spark.plans import query


@query(
    "e01_hourly_windows",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           event_type,
           count(*) AS n,
           round(sum(value), 4) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def e01_hourly_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation (the batch twin of the Structured
    Streaming windowed agg). Map-side partial agg keeps the shuffle
    proportional to distinct (hour, type) pairs, not input rows."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour").start.alias("window_start"),
            "event_type",
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
    )


@query(
    "e02_json_extract",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
    FROM events
    GROUP BY event_type
    """,
)
def e02_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction (reference T14 json.loads; Presto
    json_extract → Spark get_json_object), aggregated per type."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.get_json_object("props", "$.k").cast("long")).alias("sum_k"),
    )


@query(
    "e05_funnel",
    oracle="""
    WITH stages AS (
        SELECT user_id,
               min(ts) FILTER (WHERE event_type = 'signup')   AS signup_ts,
               min(ts) FILTER (WHERE event_type = 'view')     AS view_ts,
               min(ts) FILTER (WHERE event_type = 'purchase') AS purchase_ts
        FROM events GROUP BY user_id
    )
    SELECT count(*) AS n_users,
           count(signup_ts) AS reached_signup,
           count(CASE WHEN view_ts > signup_ts THEN 1 END) AS signup_then_view,
           count(CASE WHEN purchase_ts > view_ts AND view_ts > signup_ts THEN 1 END)
               AS full_funnel
    FROM stages
    """,
)
def e05_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel analysis (signup → view → purchase, order-sensitive):
    conditional-min per stage then ordered-stage counting. One shuffle
    on user_id; stage comparisons are row-local."""
    ev = table(spark, sf_dir, "events")

    def stage_min(t: str):
        return F.min(F.when(F.col("event_type") == t, F.col("ts")))

    stages = ev.groupBy("user_id").agg(
        stage_min("signup").alias("signup_ts"),
        stage_min("view").alias("view_ts"),
        stage_min("purchase").alias("purchase_ts"),
    )
    return stages.agg(
        F.count("*").alias("n_users"),
        F.count("signup_ts").alias("reached_signup"),
        F.count(F.when(F.col("view_ts") > F.col("signup_ts"), 1)).alias(
            "signup_then_view"
        ),
        F.count(
            F.when(
                (F.col("purchase_ts") > F.col("view_ts"))
                & (F.col("view_ts") > F.col("signup_ts")),
                1,
            )
        ).alias("full_funnel"),
    )


@query(
    "e06_weekly_retention",
    oracle="""
    WITH weekly AS (
        SELECT DISTINCT user_id,
               -- day-count floor, NOT date_diff('week', ...): the
               -- latter counts ISO Monday-boundary crossings, which
               -- only equals anchored 7-day buckets when the anchor
               -- happens to be a Monday (2024-01-01 is — but the
               -- equivalence must not hinge on the fixture's calendar)
               CAST(floor(date_diff('day', DATE '2024-01-01',
                                    CAST(ts AS DATE)) / 7.0) AS BIGINT)
                   AS week
        FROM events
    )
    SELECT w1.week AS week,
           count(DISTINCT w1.user_id) AS active_users,
           count(DISTINCT w2.user_id) AS retained_next_week
    FROM weekly w1 LEFT JOIN weekly w2
      ON w1.user_id = w2.user_id AND w2.week = w1.week + 1
    GROUP BY w1.week
    """,
)
def e06_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users active in week w who return in
    w+1. The distinct (user, week) grid is small (users × weeks), so
    the self-join shuffles a reduced relation — never raw events."""
    ev = table(spark, sf_dir, "events")
    weekly = ev.select(
        "user_id",
        F.floor(
            F.datediff(F.col("ts"), F.lit("2024-01-01").cast("date")) / 7
        ).cast("long").alias("week"),
    ).distinct()
    w1, w2 = weekly.alias("w1"), weekly.alias("w2")
    return (
        w1.join(
            w2,
            (F.col("w1.user_id") == F.col("w2.user_id"))
            & (F.col("w2.week") == F.col("w1.week") + 1),
            "left",
        )
        .groupBy(F.col("w1.week").alias("week"))
        .agg(
            F.countDistinct("w1.user_id").alias("active_users"),
            F.countDistinct("w2.user_id").alias("retained_next_week"),
        )
    )


@query(
    "e03_sessionize",
    oracle="""
    WITH flagged AS (
        SELECT user_id, event_id, ts, value,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL '30 minutes'
                    OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ), sessions AS (
        SELECT user_id, ts, value,
               CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        FROM flagged
    )
    SELECT user_id, session_id, count(*) AS n_events,
           round(sum(value), 4) AS session_value,
           min(ts) AS session_start
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def e03_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: gap > 30 min starts a new session. Classic
    lag + cumulative-sum window composition — one shuffle on user_id."""
    ev = table(spark, sf_dir, "events")
    from pyspark.sql.window import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    w_cum = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, 0
    )
    # Gap compare in integer microseconds (unix_micros), never floats:
    # epoch-scale doubles round to ~2^-21 s and can flip the > 30 min
    # flag at exact boundaries vs DuckDB's exact interval compare.
    flagged = ev.withColumn(
        "new_session",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
                > 1800 * 1_000_000
            ),
            1,
        ).otherwise(0),
    )
    sessions = flagged.withColumn("session_id", F.sum("new_session").over(w_cum))
    return sessions.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 4).alias("session_value"),
        F.min("ts").alias("session_start"),
    )


@query(
    "e12_activity_streaks",
    oracle="""
    WITH days AS (
        SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
        FROM events
    ), grp AS (
        SELECT user_id, d,
               d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
                        AS INTEGER) * INTERVAL 1 DAY AS anchor
        FROM days
    ), islands AS (
        SELECT user_id, min(d) AS streak_start, max(d) AS streak_end,
               CAST(count(*) AS BIGINT) AS streak_days
        FROM grp GROUP BY user_id, anchor
    )
    SELECT user_id,
           strftime(streak_start, '%Y-%m-%d') AS streak_start,
           strftime(streak_end, '%Y-%m-%d') AS streak_end,
           streak_days
    FROM islands
    QUALIFY row_number() OVER (PARTITION BY user_id
            ORDER BY streak_days DESC, streak_start) = 1
    """,
)
def e12_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: longest consecutive-active-day streak per user
    via the row_number-difference anchor trick (consecutive dates share
    `date - rank` as a constant). The discrete-sequence complement to
    e03's time-gap sessionization.

    Scale: one shuffle on user_id; islands are grouped map-side after
    the window; dates emitted as ISO strings (the q29 convention —
    date-typed columns normalize differently across engines)."""
    from pyspark.sql.window import Window as W

    ev = table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("d")
    ).distinct()
    rn = F.row_number().over(W.partitionBy("user_id").orderBy("d"))
    grp = days.withColumn("anchor", F.date_sub(F.col("d"), rn))
    islands = grp.groupBy("user_id", "anchor").agg(
        F.min("d").alias("s"),
        F.max("d").alias("e"),
        F.count("*").alias("streak_days"),
    )
    top = W.partitionBy("user_id").orderBy(F.col("streak_days").desc(), "s")
    return (
        islands.withColumn("_rk", F.row_number().over(top))
        .filter(F.col("_rk") == 1)
        .select(
            "user_id",
            F.date_format("s", "yyyy-MM-dd").alias("streak_start"),
            F.date_format("e", "yyyy-MM-dd").alias("streak_end"),
            "streak_days",
        )
    )


@query(
    "e13_event_transitions",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS next_type
        FROM events
    )
    SELECT event_type AS from_type, next_type AS to_type,
           count(*) AS n
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
    """,
)
def e13_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type transition matrix (Markov bigram counts over each
    user's time-ordered event sequence) — the behavioral-analytics
    input for next-event prediction and funnel discovery (e05 checks
    ONE ordered pattern; this counts ALL adjacent transitions).

    Scale: one shuffle on user_id for the lead() window, then a
    map-side-combined count on the (from, to) pair — |types|² output
    rows regardless of corpus size. Deterministic ordering tie-break on
    (ts, event_id); all-integer math."""
    from pyspark.sql.window import Window as W

    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    )
    return (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count("*").alias("n"))
    )


@query(
    "e14_dwell_percentiles",
    oracle="""
    WITH g AS (
        SELECT event_type,
               CAST(epoch_us(ts) - epoch_us(lag(ts) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id))
                    AS BIGINT) AS gap_us
        FROM events
    )
    SELECT event_type,
           count(*) AS n_gaps,
           round(quantile_cont(gap_us, 0.50) / 1000000, 4) AS p50_s,
           round(quantile_cont(gap_us, 0.90) / 1000000, 4) AS p90_s,
           round(quantile_cont(gap_us, 0.99) / 1000000, 4) AS p99_s
    FROM g WHERE gap_us IS NOT NULL
    GROUP BY event_type
    """,
)
def e14_dwell_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event dwell-time percentiles per arriving event type —
    the latency-distribution view (p50/p90/p99 seconds since the
    user's previous event) ops dashboards track. Gaps are computed in
    exact integer microseconds (the e03 rule) and only the final
    display values divide into seconds.

    Scale: one user_id window shuffle, then per-type exact percentiles
    (group sort; swap to approx_percentile at 100 TB per the q53/q38
    contract note). One array-percentile aggregate buffers each group
    once, not three times."""
    from pyspark.sql.window import Window as W

    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    g = ev.select(
        "event_type",
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).alias(
            "gap_us"
        ),
    ).filter(F.col("gap_us").isNotNull())
    pct = F.percentile("gap_us", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)))
    return g.groupBy("event_type").agg(
        F.count("*").alias("n_gaps"),
        F.round(F.element_at(pct, 1) / 1_000_000, 4).alias("p50_s"),
        F.round(F.element_at(pct, 2) / 1_000_000, 4).alias("p90_s"),
        F.round(F.element_at(pct, 3) / 1_000_000, 4).alias("p99_s"),
    )


@query(
    "e15_weekly_growth",
    oracle="""
    WITH weekly AS (
        SELECT event_type,
               CAST(date_trunc('week', ts) AS DATE) AS wk,
               count(*) AS n
        FROM events GROUP BY 1, 2
    )
    SELECT event_type,
           strftime(wk, '%Y-%m-%d') AS week_start,
           n,
           lag(n) OVER (PARTITION BY event_type ORDER BY wk) AS prev_n,
           round((n - lag(n) OVER (PARTITION BY event_type ORDER BY wk))
                 ::DOUBLE
                 / lag(n) OVER (PARTITION BY event_type ORDER BY wk), 6)
               AS wow_growth
    FROM weekly
    """,
)
def e15_weekly_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week growth per event type: weekly counts with the
    previous week's count and relative growth — the BI trend line
    every activity dashboard opens with.

    Scale: the weekly rollup is the only corpus pass; the lag window
    runs over |types|×|weeks| aggregate rows. Growth is an int/int
    division (exact in both engines); weeks emitted as ISO strings
    (the q29 date convention)."""
    from pyspark.sql.window import Window as W

    ev = table(spark, sf_dir, "events")
    weekly = ev.groupBy(
        "event_type", F.to_date(F.date_trunc("week", "ts")).alias("wk")
    ).agg(F.count("*").alias("n"))
    w = W.partitionBy("event_type").orderBy("wk")
    prev = F.lag("n").over(w)
    return weekly.select(
        "event_type",
        F.date_format("wk", "yyyy-MM-dd").alias("week_start"),
        "n",
        prev.alias("prev_n"),
        F.round((F.col("n") - prev).cast("double") / prev, 6).alias(
            "wow_growth"
        ),
    )


@query(
    "e16_rolling_wau",
    oracle="""
    WITH du AS (
        SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS d, user_id
        FROM events
    ),
    days AS (SELECT DISTINCT d FROM du)
    SELECT strftime(days.d, '%Y-%m-%d') AS day,
           count(DISTINCT du.user_id) AS wau
    FROM days JOIN du
      ON du.d BETWEEN days.d - INTERVAL 6 DAY AND days.d
    GROUP BY days.d
    """,
)
def e16_rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users per day (WAU) — the growth metric
    every product dashboard tracks. DISTINCT-over-sliding-window isn't
    expressible as a window aggregate in either engine, so the plan is
    the standard reduction: distinct (day, user) pairs, then a bounded
    range join of the day spine against them.

    Contract: the spine is OBSERVED days only — a day with zero events
    emits no row, even though its trailing 7-day window may be
    non-empty (a dense-calendar variant would build the spine from
    sequence(min(d), max(d)); the dashboards this mirrors plot observed
    days). The oracle shares the same spine, so the contract is pinned
    on both sides.

    Scale: the distinct pair set is the only corpus-sized aggregation;
    the range join expands each pair into ≤7 day buckets (bounded
    fan-out, the q21 bucketize rule), then a distinct count per day.
    All-integer; dates emitted as ISO strings (q29 convention)."""
    ev = table(spark, sf_dir, "events")
    du = ev.select(
        F.to_date(F.date_trunc("day", "ts")).alias("d"), "user_id"
    ).distinct()
    days = du.select("d").distinct().withColumnRenamed("d", "day_d")
    return (
        days.join(
            du,
            (F.col("d") <= F.col("day_d"))
            & (F.col("d") >= F.date_sub(F.col("day_d"), 6)),
        )
        .groupBy("day_d")
        .agg(F.countDistinct("user_id").alias("wau"))
        .select(F.date_format("day_d", "yyyy-MM-dd").alias("day"), "wau")
    )


@query(
    "e17_incremental_rollup",
    oracle="""
    SELECT event_type, date_trunc('day', ts) AS day,
           count(*) AS n_rows,
           round(sum(value), 4) AS sum_value,
           round(min(value), 6) AS min_value,
           round(max(value), 6) AS max_value,
           round(sum(value) / count(value), 6) AS avg_value
    FROM events
    GROUP BY event_type, date_trunc('day', ts)
    ORDER BY event_type, day
    """,
)
def e17_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance: the daily rollup is computed
    as merge(partial(first-half), partial(second-half)) — the
    algebraic form that lets a 100 TB rollup absorb a delta batch by
    touching only delta rows + |groups| rollup rows, never re-scanning
    history (operators/incremental.py). The oracle recomputes from
    scratch; equality IS the maintenance-correctness proof: sums add,
    mins/maxes fold, and avg is finalized from merged sum/count
    (averaging per-batch averages would be wrong the moment batch
    sizes differ).

    Scale: each partial is one map-side-combined pass over its batch;
    the merge shuffles |groups| rows only."""
    from serverless_datalake_aws_spark.operators.incremental import (
        finalize_rollup,
        merge_rollups,
        partial_rollup,
    )

    ev = table(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("day", F.col("ts"))
    )
    base = ev.filter(F.dayofmonth("ts") <= 15)
    delta = ev.filter(F.dayofmonth("ts") > 15)
    keys = ["event_type", "day"]
    merged = merge_rollups(
        [
            partial_rollup(base, keys, ["value"]),
            partial_rollup(delta, keys, ["value"]),
        ],
        keys,
        ["value"],
    )
    return (
        finalize_rollup(merged, ["value"])
        .select(
            "event_type",
            "day",
            "n_rows",
            F.round("sum_value", 4).alias("sum_value"),
            F.round("min_value", 6).alias("min_value"),
            F.round("max_value", 6).alias("max_value"),
            F.round(F.col("avg_value"), 6).alias("avg_value"),
        )
        .orderBy("event_type", "day")
    )


@query(
    "e18_incremental_distinct",
    oracle="""
    SELECT event_type,
           count(*) AS n_rows,
           count(DISTINCT user_id) AS users_exact,
           (abs(approx_count_distinct(user_id) - count(DISTINCT user_id))
            -- explicit floor: DuckDB CAST(double AS BIGINT) ROUNDS,
            -- Spark's truncates — 0.05*150=7.5 would bound 8 vs 7
            <= greatest(2, CAST(floor(0.05 * count(DISTINCT user_id))
                                AS BIGINT)))
             AS sketch_within_5pct,
           round(var_samp(value), 4) AS var_value
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def e18_incremental_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental DISTINCT maintenance via mergeable HLL sketches —
    the non-algebraic half e17 cannot cover: |A ∪ B| ≠ |A| + |B|, so a
    maintained distinct either re-scans history or keeps a sketch whose
    union is exact over sketch state (Apache DataSketches HLL,
    hll_sketch_agg / hll_union_agg). Here the per-type audience count
    is computed as estimate(union(sketch(first-half), sketch(second-
    half))) — the delta-absorb path — and audited against the exact
    recompute in the same result (q38's own-error-bound contract: each
    engine's sketch, each engine's bound). Variance rides the same
    merge as second-moment partials (sumsq): var = (Σx² - (Σx)²/n)/
    (n-1) from MERGED sums — averaging per-batch variances is wrong
    the moment batch sizes differ.

    Scale: each partial is one map-side-combined pass over its batch;
    the merge shuffles |groups| rows each carrying a ~KB sketch."""
    from serverless_datalake_aws_spark.operators.incremental import (
        finalize_rollup,
        merge_rollups,
        partial_rollup,
    )

    ev = table(spark, sf_dir, "events")
    kw = dict(distinct_cols=["user_id"], with_moments=True)
    merged = merge_rollups(
        [
            partial_rollup(ev.filter(F.dayofmonth("ts") <= 15), ["event_type"], ["value"], **kw),
            partial_rollup(ev.filter(F.dayofmonth("ts") > 15), ["event_type"], ["value"], **kw),
        ],
        ["event_type"],
        ["value"],
        **kw,
    )
    fin = finalize_rollup(merged, ["value"], **kw)
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("users_exact")
    )
    # explicit floor on BOTH sides (cast-to-bigint rounds in DuckDB,
    # truncates in Spark — the half-integer bound would diverge)
    bound = F.greatest(
        F.lit(2).cast("long"),
        F.floor(0.05 * F.col("users_exact")).cast("long"),
    )
    return (
        fin.join(F.broadcast(exact), "event_type")
        .select(
            "event_type",
            "n_rows",
            "users_exact",
            (
                F.abs(F.col("approx_distinct_user_id") - F.col("users_exact"))
                <= bound
            ).alias("sketch_within_5pct"),
            F.round("var_value", 4).alias("var_value"),
        )
        .orderBy("event_type")
    )


@query(
    "e19_incremental_heavy_hitters",
    oracle="""
    WITH exact AS (
        SELECT CAST(user_id AS VARCHAR) AS item, count(*) AS exact_n
        FROM events GROUP BY 1
    ),
    bucketed AS (
        SELECT item, exact_n, d,
               CAST(concat('0x', substr(md5(concat(CAST(d AS VARCHAR), ':', item)), 1, 14))
                    AS BIGINT) % 64 AS bucket
        FROM exact, generate_series(0, 3) AS gs(d)
    ),
    sketch AS (
        SELECT d, bucket, CAST(sum(exact_n) AS BIGINT) AS cnt
        FROM bucketed GROUP BY d, bucket
    ),
    top AS (
        SELECT item, exact_n FROM exact ORDER BY exact_n DESC, item LIMIT 10
    )
    SELECT t.item, t.exact_n,
           CAST(min(s.cnt) AS BIGINT) AS est_n,
           CAST(min(s.cnt) - t.exact_n AS BIGINT) AS overestimate
    FROM top t
    JOIN bucketed b ON b.item = t.item
    JOIN sketch s ON s.d = b.d AND s.bucket = b.bucket
    GROUP BY t.item, t.exact_n
    ORDER BY t.exact_n DESC, t.item
    """,
)
def e19_incremental_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintained heavy hitters: the count-min sketch built as
    merge(sketch(first-half), sketch(second-half)) — t23's frequency
    sketch lifted to incremental maintenance (operators/incremental
    cm_partial/cm_merge/cm_estimate). Count-min merge is exact bucket
    addition, so the merged sketch IS the from-scratch sketch — the
    DuckDB oracle computes the latter and equality proves the merge.
    The long-form representation (rows (d, bucket, cnt)) is what makes
    the merge a plain groupBy-sum instead of a binary-blob UDF; hashes
    are md5-affine so both engines agree bit-for-bit.

    Scale: each half folds map-side into depth×width=256 rows; the
    merge and estimate join touch only sketch rows (broadcast)."""
    from serverless_datalake_aws_spark.operators.incremental import (
        cm_estimate,
        cm_merge,
        cm_partial,
    )

    ev = table(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("item"), "ts"
    )
    sketch = cm_merge(
        [
            cm_partial(ev.filter(F.dayofmonth("ts") <= 15), "item"),
            cm_partial(ev.filter(F.dayofmonth("ts") > 15), "item"),
        ]
    )
    top = (
        ev.groupBy("item")
        .agg(F.count("*").alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), "item")
        .limit(10)
    )
    return (
        cm_estimate(sketch, top, "item")
        .withColumn("overestimate", F.col("est_n") - F.col("exact_n"))
        .orderBy(F.col("exact_n").desc(), "item")
    )


@query(
    "e20_incremental_join_view",
    oracle="""
    SELECT c_nationkey, count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_nationkey ORDER BY c_nationkey
    """,
)
def e20_incremental_join_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained join view (operators/incremental.
    MaintainedJoin): orders ⋈ customer materialized by absorbing two
    batches on EACH side via the delta-join identity
    Δ(L⋈R) = ΔL⋈R ∪ L⋈ΔR ∪ ΔL⋈ΔR — four apply() calls, interleaved so
    every identity term is exercised, never a full recompute. The
    oracle recomputes the join from scratch; aggregate equality IS the
    maintenance proof (insert-only feeds; updates need MERGE, the
    documented upgrade).

    Scale: each apply joins only delta rows against the stored
    snapshot (partition-prunable on the join key); the view append is
    blind."""
    import shutil as _sh
    import tempfile as _tf

    from serverless_datalake_aws_spark.operators.incremental import MaintainedJoin

    orders = table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    cust = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey"
    )
    work = _tf.mkdtemp(prefix="e20_")
    try:
        mj = MaintainedJoin(spark, work, on="o_custkey")
        mj.apply(delta_right=cust.filter("o_custkey % 2 = 0"))
        mj.apply(delta_left=orders.filter("o_orderkey % 2 = 0"))
        mj.apply(
            delta_left=orders.filter("o_orderkey % 2 = 1"),
            delta_right=cust.filter("o_custkey % 2 = 1"),
        )
        out = (
            mj.read()
            .groupBy("c_nationkey")
            .agg(
                F.count("*").alias("n_orders"),
                F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            )
            .orderBy("c_nationkey")
        )
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        _sh.rmtree(work, ignore_errors=True)


@query(
    "e21_incremental_quantiles",
    oracle="""
    WITH vals AS (SELECT event_type, value FROM events),
    binned AS (
        SELECT event_type,
               CASE WHEN value > 0 THEN 1 WHEN value < 0 THEN -1 ELSE 0 END AS sign,
               CASE WHEN value = 0 THEN CAST(0 AS BIGINT)
                    ELSE CAST(ceil(round(ln(abs(value)) / ln(1.02), 9)) AS BIGINT)
               END AS bin
        FROM vals),
    sketch AS (
        SELECT event_type, sign, bin, count(*) AS cnt FROM binned GROUP BY 1, 2, 3),
    reps AS (
        SELECT *, CASE WHEN sign = 0 THEN 0.0
                       ELSE sign * (2.0 / 2.02) * exp(bin * ln(1.02)) END AS rep
        FROM sketch),
    cum AS (
        SELECT *, sum(cnt) OVER (PARTITION BY event_type ORDER BY rep) AS cum,
               sum(cnt) OVER (PARTITION BY event_type) AS n
        FROM reps),
    qs AS (SELECT unnest([0.5, 0.9, 0.99]) AS q),
    est AS (
        SELECT event_type, q, min_by(rep, cum) AS est
        FROM cum CROSS JOIN qs
        WHERE cum >= greatest(CAST(ceil(q * n) AS BIGINT), 1)
        GROUP BY 1, 2),
    ranked AS (
        SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM vals),
    exact AS (
        SELECT r.event_type, q.q, r.value AS exact
        FROM ranked r CROSS JOIN qs q
        WHERE r.rn = greatest(CAST(ceil(q.q * r.n) AS BIGINT), 1))
    SELECT e.event_type, e.q,
           round(e.est, 4) AS est,
           round(x.exact, 4) AS exact,
           (abs(e.est - x.exact) <= (0.02 / 2.02) * abs(x.exact) + 1e-9)
             AS within_bound
    FROM est e JOIN exact x ON e.event_type = x.event_type AND e.q = x.q
    ORDER BY e.event_type, e.q
    """,
)
def e21_incremental_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental QUANTILE maintenance — the third non-algebraic
    metric after distinct (e18, HLL) and frequency (e19, count-min):
    a DDSketch-style γ-geometric log histogram kept in LONG FORM
    (operators/incremental.qh_partial/qh_merge/qh_quantiles), so the
    sketch merge is a plain groupBy-sum and
    merge(sketch(A), sketch(B)) == sketch(A ∪ B) holds exactly.
    Per-type p50/p90/p99 come from merge(sketch(first-half),
    sketch(second-half)) — the delta-absorb path — and are audited
    in-result against the rank-exact quantile with DDSketch's
    α = (γ-1)/(γ+1) ≈ 1% relative-error guarantee. Binning is pure
    arithmetic (ln-ratio rounded to 9 dp before ceil), so the DuckDB
    oracle reproduces buckets, estimates, and audit booleans
    bit-for-bit.

    Scale: each partial folds map-side to |types| × O(log range / ln γ)
    rows (~700 buckets/type here); quantile extraction windows over
    SKETCH rows only. The rank-exact audit column is the test-scale
    yardstick — at 100 TB the sketch IS the product, the audit rides a
    sample."""
    from serverless_datalake_aws_spark.operators.incremental import (
        qh_merge,
        qh_partial,
        qh_quantiles,
    )
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    keys = ["event_type"]
    sk = qh_merge(
        [
            qh_partial(ev.filter(F.dayofmonth("ts") <= 15), "value", keys),
            qh_partial(ev.filter(F.dayofmonth("ts") > 15), "value", keys),
        ],
        keys,
    )
    est = qh_quantiles(sk, [0.5, 0.9, 0.99], keys)
    ranked = ev.select(
        "event_type",
        "value",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("value"))
        .alias("rn"),
        F.count("*").over(Window.partitionBy("event_type")).alias("n"),
    )
    qs = F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99))
    exact = (
        ranked.select("*", F.explode(qs).alias("q"))
        .filter(
            F.col("rn")
            == F.greatest(F.ceil(F.col("q") * F.col("n")), F.lit(1)).cast("long")
        )
        .select("event_type", "q", F.col("value").alias("exact"))
    )
    alpha = 0.02 / 2.02  # (γ-1)/(γ+1) for γ = 1.02
    return (
        est.join(exact, ["event_type", "q"])
        .select(
            "event_type",
            "q",
            F.round("est", 4).alias("est"),
            F.round("exact", 4).alias("exact"),
            (
                F.abs(F.col("est") - F.col("exact"))
                <= F.lit(alpha) * F.abs(F.col("exact")) + F.lit(1e-9)
            ).alias("within_bound"),
        )
        .orderBy("event_type", "q")
    )


@query(
    "e22_funnel_pattern_regex",
    oracle="""
    WITH j AS (
        SELECT user_id,
               count(*) AS n_events,
               string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
                 AS journey
        FROM events GROUP BY user_id)
    SELECT user_id, n_events,
           length(journey) AS journey_len,
           len(regexp_extract_all(journey, 'v[^p]*c[^p]*p')) AS conversions,
           (len(regexp_extract_all(journey, 'v[^p]*c[^p]*p')) > 0) AS converted
    FROM j ORDER BY user_id
    """,
)
def e22_funnel_pattern_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-pattern matching over event sequences — the concrete form
    of the documented MATCH_RECOGNIZE workaround (COVERAGE
    'Known-unsupported'): compress each user's time-ordered events
    into a journey string (one char per type) and count
    view→…→click→…→purchase conversions as non-overlapping regex
    matches of `v[^p]*c[^p]*p`. The excluded-class gaps make each
    match end at the first purchase after its click — exactly
    MATCH_RECOGNIZE's AFTER MATCH SKIP PAST LAST ROW semantics; both
    engines' regex engines (Java, RE2) agree on leftmost-first greedy
    matching for this backreference-free class.

    Scale: one shuffle on user_id; the per-user collect is bounded by
    per-user activity (the same bound any sessionizer carries — cf.
    e03); the regex scan is row-local over journey strings. The
    (ts, event_id) sort key makes the journey — and therefore every
    count — bit-deterministic under ties."""
    ev = table(spark, sf_dir, "events")
    j = (
        ev.select("user_id", "ts", "event_id", F.substring("event_type", 1, 1).alias("c"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("ts", "event_id", "c"))
                    ),
                    lambda s: s["c"],
                ),
                "",
            ).alias("journey"),
        )
    )
    pat = "v[^p]*c[^p]*p"
    n_conv = F.size(F.expr(f"regexp_extract_all(journey, '{pat}', 0)"))
    return j.select(
        "user_id",
        "n_events",
        F.length("journey").alias("journey_len"),
        n_conv.cast("long").alias("conversions"),
        (n_conv > 0).alias("converted"),
    ).orderBy("user_id")


@query(
    "e23_asof_join",
    oracle="""
    WITH r AS (
        SELECT user_id, ts, max(value) AS view_value
        FROM events WHERE event_type = 'view' GROUP BY user_id, ts
    ), l AS (
        SELECT event_id, user_id, ts, value
        FROM events WHERE event_type = 'purchase'
    )
    SELECT l.event_id, l.user_id, l.ts,
           round(l.value, 4) AS purchase_value,
           r.ts AS viewed_at,
           round(r.view_value, 4) AS view_value,
           epoch_us(l.ts) - epoch_us(r.ts) AS staleness_us
    FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
    ORDER BY l.event_id
    """,
)
def e23_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (as-of) join: every purchase annotated with the
    user's most recent view at-or-before it — the feature-store /
    market-data operator Spark lacks natively, via operators/asof.py's
    union + last-non-null-window plan (ONE shuffle of |L|+|R| rows,
    per-key linear — never the naive range join's per-key cross
    product). DuckDB ships ASOF JOIN natively, so the oracle is the
    engine-native implementation, not a SQL re-derivation: agreement
    cross-checks two independent as-of algorithms, including the
    at-or-before tie rule (>=) and no-match NULLs.

    The right side is pre-aggregated to one row per (user_id, ts)
    (max value) so equal-timestamp ties are deterministic in both
    engines. staleness_us is exact integer microseconds."""
    from serverless_datalake_aws_spark.operators.asof import asof_join

    ev = table(spark, sf_dir, "events")
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("view_value"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    j = asof_join(purchases, views, on="user_id", left_ts="ts", right_ts="ts")
    return j.select(
        "event_id",
        "user_id",
        "ts",
        F.round("value", 4).alias("purchase_value"),
        F.col("ts_right").alias("viewed_at"),
        F.round("view_value", 4).alias("view_value"),
        (F.unix_micros("ts") - F.unix_micros("ts_right")).alias("staleness_us"),
    ).orderBy("event_id")


@query(
    "e24_resample_locf",
    oracle="""
    WITH obs AS (
        SELECT user_id, ts, max(value) AS value
        FROM events GROUP BY user_id, ts),
    b AS (SELECT date_trunc('day', min(ts)) AS lo,
                 date_trunc('day', max(ts)) AS hi FROM events),
    days AS (SELECT unnest(generate_series((SELECT lo FROM b),
                                           (SELECT hi FROM b),
                                           INTERVAL 1 DAY)) AS day),
    users AS (SELECT DISTINCT user_id FROM events),
    grid AS (SELECT u.user_id, d.day FROM users u CROSS JOIN days d)
    SELECT g.user_id, g.day, o.ts AS obs_ts,
           round(o.value, 4) AS locf_value,
           epoch_us(g.day) - epoch_us(o.ts) AS staleness_us
    FROM grid g ASOF LEFT JOIN obs o
      ON g.user_id = o.user_id AND g.day >= o.ts
    ORDER BY g.user_id, g.day
    """,
)
def e24_resample_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample-to-grid with last-observation-carried-forward: every
    user sampled on a regular daily grid, each grid point carrying the
    user's most recent event value at-or-before it plus exact
    staleness — the time-series regularization step every feature
    pipeline runs before models that need aligned inputs (the gap-fill
    complement to e07's interpolation: LOCF is causal, usable online;
    interpolation is not).

    Composes operators/asof.asof_join: grid rows are the as-of LEFT
    side, deduped observations the right — ONE key-partitioned window
    over |grid|+|obs| rows, no per-day range scans. Pre-grid users
    resolve to NULL (no lookahead). Oracle: DuckDB's native ASOF JOIN
    over the identical grid — two independent as-of algorithms
    agreeing on every grid point, tie rule, and NULL.

    Scale: the grid is |users| × |days| (metadata-sized relative to
    events); the window parallelizes per user. Statically-known grids
    broadcast; the observation side never replicates."""
    from serverless_datalake_aws_spark.operators.asof import asof_join

    ev = table(spark, sf_dir, "events").select("user_id", "ts", "value")
    obs = ev.groupBy("user_id", "ts").agg(F.max("value").alias("value"))
    bounds = ev.agg(
        F.date_trunc("day", F.min("ts")).alias("lo"),
        F.date_trunc("day", F.max("ts")).alias("hi"),
    )
    days = bounds.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("day")
    )
    grid = ev.select("user_id").distinct().crossJoin(F.broadcast(days))
    j = asof_join(grid, obs, on="user_id", left_ts="day", right_ts="ts")
    return j.select(
        "user_id",
        "day",
        F.col("ts").alias("obs_ts"),
        F.round("value", 4).alias("locf_value"),
        (F.unix_micros("day") - F.unix_micros("ts")).alias("staleness_us"),
    ).orderBy("user_id", "day")
