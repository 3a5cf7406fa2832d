"""Ninth tranche: time-series gap interpolation, the array-ops function
surface, and cosine range search. Extends the Athena-delegated SQL
surface (SURVEY §2.7 scalar fns / window frames) and the §2.11
similarity-search axis with the range-query sibling of s01's top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from serverless_datalake_aws_spark.catalog import table
from serverless_datalake_aws_spark.functions import vector as VX
from serverless_datalake_aws_spark.plans import query


@query(
    "e07_linear_interpolation",
    oracle="""
    WITH hourly AS (
      -- scaled-integer sum / count instead of avg(double): the
      -- interpolation hits .xxx5 midpoints systematically and a 1-ulp
      -- accumulation-order difference in v would flip the 3dp round.
      -- floor(x*1e6 + 0.5) is pure IEEE FP (bit-identical in both
      -- engines, stays in codegen) and the BIGINT sum is order-free —
      -- same pattern as q01; the DECIMAL(18,6) image it replaces paid
      -- a per-row BigDecimal detour
      SELECT user_id, date_trunc('hour', ts) AS h,
             CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT))
                  AS DOUBLE) / 1000000 / count(value) AS v
      FROM events WHERE user_id < 5 GROUP BY 1, 2
    ),
    bounds AS (
      SELECT user_id, min(h) AS h0, max(h) AS h1 FROM hourly GROUP BY user_id
    ),
    grid AS (
      SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
      FROM bounds
    ),
    joined AS (
      SELECT grid.user_id, grid.h, hourly.v,
             CAST(epoch(grid.h) AS DOUBLE) AS pos
      FROM grid LEFT JOIN hourly
        ON grid.user_id = hourly.user_id AND grid.h = hourly.h
    ),
    w AS (
      SELECT *,
        last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY h
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
        last_value(CASE WHEN v IS NOT NULL THEN pos END IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY h
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_p,
        first_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY h
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
        first_value(CASE WHEN v IS NOT NULL THEN pos END IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY h
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_p
      FROM joined
    )
    SELECT user_id, strftime(h, '%Y-%m-%dT%H:%M:%S') AS hour,
           (v IS NULL) AS interpolated,
           CAST(CAST(floor((CASE
             WHEN v IS NOT NULL THEN v
             WHEN prev_v IS NULL THEN next_v
             WHEN next_v IS NULL THEN prev_v
             WHEN next_p = prev_p THEN prev_v
             ELSE prev_v + (next_v - prev_v) * (pos - prev_p) / (next_p - prev_p)
           END) * 1000 + 0.5) AS BIGINT) AS DOUBLE) / 1000 AS v_filled
    FROM w
    """,
)
def e07_linear_interpolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series linear interpolation over an hourly spine: per-user
    hourly averages gap-filled by interpolating between the nearest
    real observations (IGNORE NULLS window scans in both directions).
    The spine is generated per user from that user's own [min, max]
    hour bounds (not users × the global span): grid rows are
    Σ per-user span, so a long-lived lake with many short-lived users
    costs what those users actually span — the global-spine variant
    was O(users × lake lifetime) before the left join. All window work
    partitions by user_id, so the plan parallelizes per key at any
    scale."""
    ev = table(spark, sf_dir, "events")
    hourly = (
        ev.filter(F.col("user_id") < 5)
        .groupBy("user_id", F.date_trunc("hour", "ts").alias("h"))
        .agg(
            (
                F.sum(F.floor(F.col("value") * 1000000 + 0.5).cast("long"))
                .cast("double")
                / 1000000
                / F.count("value")
            ).alias("v")
        )
    )
    grid = (
        hourly.groupBy("user_id")
        .agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
        .select(
            "user_id",
            F.explode(
                F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
            ).alias("h"),
        )
    )
    joined = grid.join(hourly, ["user_id", "h"], "left").withColumn(
        "pos", F.unix_timestamp("h").cast("double")
    )
    w_back = (
        W.partitionBy("user_id").orderBy("h").rowsBetween(W.unboundedPreceding, 0)
    )
    w_fwd = (
        W.partitionBy("user_id").orderBy("h").rowsBetween(0, W.unboundedFollowing)
    )
    pos_if_v = F.when(F.col("v").isNotNull(), F.col("pos"))
    withnb = (
        joined.withColumn("prev_v", F.last("v", ignorenulls=True).over(w_back))
        .withColumn("prev_p", F.last(pos_if_v, ignorenulls=True).over(w_back))
        .withColumn("next_v", F.first("v", ignorenulls=True).over(w_fwd))
        .withColumn("next_p", F.first(pos_if_v, ignorenulls=True).over(w_fwd))
    )
    filled = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("prev_v").isNull(), F.col("next_v"))
        .when(F.col("next_v").isNull(), F.col("prev_v"))
        .when(F.col("next_p") == F.col("prev_p"), F.col("prev_v"))
        .otherwise(
            F.col("prev_v")
            + (F.col("next_v") - F.col("prev_v"))
            * (F.col("pos") - F.col("prev_p"))
            / (F.col("next_p") - F.col("prev_p"))
        )
    )
    return withnb.select(
        "user_id",
        F.date_format("h", "yyyy-MM-dd'T'HH:mm:ss").alias("hour"),
        F.col("v").isNull().alias("interpolated"),
        # rounding-rule parity: floor(x*1000 + 0.5) is the same IEEE op
        # chain in both engines, so the 3dp round can't diverge at .xxx5
        # midpoints (a bare round() on doubles disagrees between engines
        # there; a DECIMAL image agrees but pays a per-row BigDecimal
        # detour outside codegen)
        (F.floor(filled * 1000 + 0.5).cast("long").cast("double") / 1000).alias(
            "v_filled"
        ),
    )


@query(
    "q61_rolling_time_window",
    oracle="""
    SELECT o_custkey, strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S') AS od,
      round(sum(o_totalprice) OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate
        RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW), 4)
        AS rolling_30d,
      count(*) OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate
        RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW) AS n_30d
    FROM orders
    WHERE o_custkey < 200
    """,
)
def q61_rolling_time_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE frame (INTERVAL '30 days' PRECEDING): rolling
    30-day spend per customer — the value-based sibling of q09's ROWS
    frame and q33's numeric RANGE, keyed on actual time distance rather
    than row position. Partitioned by customer, so the window sort
    parallelizes per key."""
    from serverless_datalake_aws_spark.catalog import register_views as _rv

    _rv(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT o_custkey,
          date_format(o_orderdate, "yyyy-MM-dd'T'HH:mm:ss") AS od,
          round(sum(o_totalprice) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate
            RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW), 4)
            AS rolling_30d,
          count(*) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate
            RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW) AS n_30d
        FROM orders
        WHERE o_custkey < 200
        """
    )


@query(
    "q60_array_ops",
    oracle="""
    SELECT label,
      len(flatten(list(list_slice(embedding, 1, 4)))) AS n_flat,
      round(list_sum(list_slice(list_sort(
        list(round(CAST(embedding[1] AS DOUBLE), 4))), 1, 3)), 4)
        AS lowest3_first_dim,
      round(avg(list_position(embedding, list_max(embedding))), 4)
        AS avg_argmax_pos
    FROM embeddings
    GROUP BY label
    """,
)
def q60_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-manipulation surface (Presto slice/flatten/array_sort/
    array_position → Spark same names): per-label slice+flatten
    cardinality, sum of the three lowest first-dimension values, and
    the average 1-based argmax position. Mixes array-local ops with
    collect_list re-aggregation — the collected lists stay per-group
    (≤ group size), never global."""
    emb = table(spark, sf_dir, "embeddings")
    first_dim = F.round(F.element_at("embedding", 1).cast("double"), 4)
    argmax_pos = F.array_position(
        F.col("embedding"), F.array_max(F.col("embedding"))
    )
    return emb.groupBy("label").agg(
        F.size(F.flatten(F.collect_list(F.slice("embedding", 1, 4)))).alias(
            "n_flat"
        ),
        F.round(
            F.aggregate(
                F.slice(F.array_sort(F.collect_list(first_dim)), 1, 3),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            4,
        ).alias("lowest3_first_dim"),
        F.round(F.avg(argmax_pos), 4).alias("avg_argmax_pos"),
    )


@query(
    "s07_range_search",
    oracle="""
    SELECT e.vec_id, e.label,
           round(
             list_dot_product(list_transform(q.embedding, x -> CAST(x AS DOUBLE)),
                              list_transform(e.embedding, x -> CAST(x AS DOUBLE)))
             / (sqrt(list_dot_product(list_transform(q.embedding, x -> CAST(x AS DOUBLE)),
                                      list_transform(q.embedding, x -> CAST(x AS DOUBLE))))
              * sqrt(list_dot_product(list_transform(e.embedding, x -> CAST(x AS DOUBLE)),
                                      list_transform(e.embedding, x -> CAST(x AS DOUBLE))))),
             6) AS cos_sim
    FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
    WHERE e.vec_id <> 0
      AND list_dot_product(list_transform(q.embedding, x -> CAST(x AS DOUBLE)),
                           list_transform(e.embedding, x -> CAST(x AS DOUBLE)))
          / (sqrt(list_dot_product(list_transform(q.embedding, x -> CAST(x AS DOUBLE)),
                                   list_transform(q.embedding, x -> CAST(x AS DOUBLE))))
           * sqrt(list_dot_product(list_transform(e.embedding, x -> CAST(x AS DOUBLE)),
                                   list_transform(e.embedding, x -> CAST(x AS DOUBLE)))))
          >= 0.3
    """,
)
def s07_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine range search (the radius-query sibling of s01's top-k):
    every vector within cos ≥ 0.3 of the query vector (vec_id 0). The
    single-row query side broadcasts; the corpus scan is one pass, no
    shuffle at all — the shape that stays embarrassingly parallel at
    100 TB (s02's LSH buckets bound the scan when τ is tight)."""
    emb = table(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_emb")
    )
    cos = VX.cosine(F.col("q_emb"), F.col("embedding"))
    return (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .withColumn("cos_sim", F.round(cos, 6))
        .filter(cos >= 0.3)
        .select("vec_id", "label", "cos_sim")
    )


@query(
    "e09_mad_outliers",
    oracle="""
    WITH med AS (
      SELECT event_type, median(value) AS med FROM events GROUP BY event_type
    ),
    dev AS (
      SELECT e.event_type, abs(e.value - m.med) AS d
      FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
      SELECT event_type, median(d) AS mad FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           round(any_value(mad.mad), 6) AS mad,
           count(*) FILTER (WHERE d.d > 3 * mad.mad) AS n_outliers,
           count(*) AS n_total
    FROM dev d JOIN mad USING (event_type)
    GROUP BY d.event_type
    """,
)
def e09_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly detection via median absolute deviation: per
    event type, flag values more than 3 MADs from the median — the
    outlier filter a metrics pipeline runs before training on
    telemetry (median/MAD shrug off the very outliers that wreck
    mean/stddev z-scores, cf. d06).

    Two exact-median aggregations over the same event_type keys; the
    deviation join broadcasts the tiny per-type medians so the big
    fact table is never reshuffled — at 100 TB both medians would
    switch to approx_percentile(0.5) sketches with identical plan
    shape."""
    ev = table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(F.median("value").alias("med"))
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("value") - F.col("med")).alias("d")
    )
    mad = dev.groupBy("event_type").agg(F.median("d").alias("mad"))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.any_value("mad"), 6).alias("mad"),
            F.count_if(F.col("d") > 3 * F.col("mad")).alias("n_outliers"),
            F.count("*").alias("n_total"),
        )
    )


@query(
    "e11_ohlc_bars",
    oracle="""
    SELECT event_type,
           strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
           arg_min(value, strftime(ts, '%Y-%m-%d %H:%M:%S.%f')
                   || lpad(CAST(event_id AS VARCHAR), 12, '0')) AS open,
           max(value) AS high,
           min(value) AS low,
           arg_max(value, strftime(ts, '%Y-%m-%d %H:%M:%S.%f')
                   || lpad(CAST(event_id AS VARCHAR), 12, '0')) AS close,
           count(*) AS n,
           -- scaled-integer sum for the order-dependent float sum: the
           -- q01 floor(x*scale + 0.5) pattern — exact BIGINT
           -- accumulation, bit-identical per-row image in both engines,
           -- no per-row DECIMAL detour
           CAST(sum(CAST(floor(value * 10000 + 0.5) AS BIGINT)) AS DOUBLE)
               / 10000 AS volume
    FROM events
    GROUP BY 1, 2
    """,
)
def e11_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC bar aggregation — the time-series downsampling shape every
    metrics/finance pipeline runs: per (type, hour) bucket, the first
    and last value by event time (ties broken by event_id so both
    engines pick identically) plus high/low/volume. One hash
    aggregation with map-side combine; min_by/max_by carry (value,
    ordering-struct) pairs through partial aggregation, so no window
    sort and no second shuffle — at 100 TB this is the cheap
    alternative to a row_number-per-bucket plan."""
    ev = table(spark, sf_dir, "events")
    # lexicographic = chronological: ISO-micros timestamp + padded id
    # (a struct ordering key works in Spark's min_by but not DuckDB's
    # arg_min, so both engines use the same sortable string)
    tie = F.concat(
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    return ev.groupBy(
        "event_type",
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
            "bucket"
        ),
    ).agg(
        F.min_by("value", tie).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", tie).alias("close"),
        F.count("*").alias("n"),
        (
            F.sum(F.floor(F.col("value") * 10000 + 0.5).cast("long"))
            .cast("double")
            / 10000
        ).alias("volume"),
    )


@query(
    "e10_seasonal_baseline",
    oracle="""
    WITH hourly AS (
        SELECT event_type,
               date_trunc('hour', ts) AS win,
               CAST(extract(hour FROM ts) AS BIGINT) AS hod,
               round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4)
                   AS v
        FROM events
        GROUP BY 1, 2, 3
    ),
    baseline AS (
        SELECT event_type, hod,
               count(*) AS n,
               CAST(sum(CAST(v AS DECIMAL(18,4))) AS DOUBLE) AS s,
               CAST(sum(CAST(v AS DECIMAL(18,4)) * CAST(v AS DECIMAL(18,4)))
                    AS DOUBLE) AS sq
        FROM hourly GROUP BY 1, 2
    ),
    stats AS (
        SELECT event_type, hod, s / n AS mu,
               CASE WHEN n > 1
                    THEN sqrt(greatest(sq - s * s / n, 0) / (n - 1))
                    ELSE 0.0 END AS sigma
        FROM baseline
    )
    SELECT h.event_type, h.win, h.v,
           round(b.mu, 4) AS hod_baseline,
           round((h.v - b.mu) / b.sigma, 4) AS deviation_z
    FROM hourly h JOIN stats b
      ON h.event_type = b.event_type AND h.hod = b.hod
    WHERE b.sigma > 0 AND abs((h.v - b.mu) / b.sigma) > 2
    """,
)
def e10_seasonal_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-baseline anomaly detection: each hourly bucket compared
    to its hour-of-day baseline (mean/stddev per event_type × 0-23),
    reporting buckets more than 2 sigma off their diurnal norm — the
    seasonality-aware twin of e09's global MAD outliers.

    Determinism discipline (round-6 fix for a rounding-boundary flake):
    every aggregate that feeds a rounded output rides an EXACT decimal
    image — the hourly sum over DECIMAL(18,6) values, and the baseline
    over DECIMAL(18,4) sums + sums-of-squares — so mu and sigma are a
    fixed arithmetic expression over order-independent exact sums
    (sigma via the sum-of-squares identity), never a float avg/stddev
    whose partial-aggregation order can flip round(·, 4) at a ...x5
    boundary (observed: 82.4263 vs 82.4262 on the same data). Same
    batch-order-independence rule as the st10 maintained rollup.

    Scale: the hourly rollup is the only corpus-sized aggregation
    (partial+final, one shuffle); the 24×|types| baseline is a
    broadcast join back."""
    ev = table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type",
        F.date_trunc("hour", "ts").alias("win"),
        F.hour("ts").cast("long").alias("hod"),
    ).agg(
        F.round(
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 4
        ).alias("v")
    )
    vd = F.col("v").cast("decimal(18,4)")
    baseline = hourly.groupBy("event_type", "hod").agg(
        F.count("*").alias("n"),
        F.sum(vd).cast("double").alias("s"),
        F.sum(vd * vd).cast("double").alias("sq"),
    )
    mu = F.col("s") / F.col("n")
    sigma = F.when(
        F.col("n") > 1,
        F.sqrt(
            F.greatest(
                F.col("sq") - F.col("s") * F.col("s") / F.col("n"),
                F.lit(0.0),
            )
            / (F.col("n") - 1)
        ),
    ).otherwise(F.lit(0.0))
    stats = baseline.select(
        "event_type", "hod", mu.alias("mu"), sigma.alias("sigma")
    )
    z = (F.col("v") - F.col("mu")) / F.col("sigma")
    return (
        hourly.join(F.broadcast(stats), ["event_type", "hod"])
        .filter((F.col("sigma") > 0) & (F.abs(z) > 2))
        .select(
            "event_type",
            "win",
            "v",
            F.round("mu", 4).alias("hod_baseline"),
            F.round(z, 4).alias("deviation_z"),
        )
    )
