"""As-of (point-in-time) join — the time-series operator Spark lacks.

For every left row, attach the single most recent right row at or
before its timestamp (per key) — the join behind feature stores
("the account balance as of this order"), market data ("the last
quote as of this trade"), and CDC snapshot reads. The reference has
no time-series surface at all; DuckDB/Pandas/kdb ship it natively
(ASOF JOIN / merge_asof), so the oracle is exact.

Spark-first plan — the UNION + last-non-null-window trick, NOT a
range join:

    naive:  left ⋈ right ON key AND r.ts <= l.ts  → per-key cross
            product (|L|·|R| intermediate per key), then argmax —
            quadratic blowup on hot keys; the classic scale killer.
    here:   union(left-tagged, right-tagged), one window
            last_value(right_payload, ignoreNulls) OVER (PARTITION BY
            key ORDER BY ts, is_left ROWS UNBOUNDED PRECEDING) —
            each left row picks up the latest preceding right payload
            in ONE sort per key. Cost: one shuffle of |L|+|R| rows,
            linear; ties (equal ts) resolve right-before-left, so an
            exactly-simultaneous right row IS visible ("at or
            before"), matching DuckDB ASOF (>=) semantics.

`tolerance` (seconds) bounds staleness: a match older than the
tolerance is nulled out — merge_asof's tolerance parameter.

Scale: the window is partitioned BY KEY (parallelism ∝ keys); a
single global as-of (no key) degenerates to one partition — callers
should bucket time instead (the t31/global_cumsum pattern). Skewed
keys inherit the usual salting options upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    tolerance_s: float | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Backward as-of join: left rows + the most recent right row with
    right_ts <= left_ts per `on` key (NULLs when none). Right payload
    columns are suffixed on collision."""
    lcols = left.columns
    rpayload = [c for c in right.columns if c not in (on, right_ts)]
    out_names = {
        c: (c + suffix if c in lcols else c) for c in rpayload
    }
    rts_out = right_ts + suffix if right_ts in lcols else right_ts

    # one struct carries the whole right payload through the window,
    # so N payload columns still cost ONE last_value evaluation
    rstruct = F.struct(
        F.col(right_ts).cast("timestamp").alias("__rts"),
        *[F.col(c) for c in rpayload],
    )
    l_tagged = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).cast("timestamp").alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in lcols]).alias("__lrow"),
        F.lit(None).cast(
            left.sparkSession.createDataFrame([], right.schema)
            .select(rstruct.alias("x"))
            .schema["x"]
            .dataType
        ).alias("__rrow"),
    )
    # SQL join semantics: a NULL-key or NULL-ts observation can never
    # match — NULL ts would sort FIRST (a phantom "most recent" row
    # for every left row), and NULL keys would pair with NULL-key left
    # rows (no SQL equi-join does that)
    right = right.filter(F.col(on).isNotNull() & F.col(right_ts).isNotNull())
    r_tagged = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).cast("timestamp").alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.lit(None)
        .cast(
            left.select(
                F.struct(*[F.col(c) for c in lcols]).alias("x")
            ).schema["x"].dataType
        )
        .alias("__lrow"),
        rstruct.alias("__rrow"),
    )
    # ties: right (0) sorts before left (1) → same-instant right rows
    # are visible to the left row ("at or before", DuckDB ASOF >=).
    # The json-hash tail makes EQUAL-ts right rows deterministic:
    # without it, last_value picks whichever duplicate the shuffle
    # happened to order last — non-reproducible output across retries.
    w = (
        W.partitionBy("__k")
        .orderBy("__ts", "__is_left", F.xxhash64(F.to_json("__rrow")))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    matched = (
        l_tagged.unionByName(r_tagged)
        .withColumn("__match", F.last("__rrow", ignorenulls=True).over(w))
        .filter(F.col("__is_left") == 1)
    )
    if tolerance_s is not None:
        fresh = (
            F.unix_micros(F.col("__ts"))
            - F.unix_micros(F.col("__match.__rts"))
        ) <= int(tolerance_s * 1_000_000)
        matched = matched.withColumn(
            "__match", F.when(fresh, F.col("__match"))
        )
    return matched.select(
        *[F.col(f"__lrow.{c}").alias(c) for c in lcols],
        F.col("__match.__rts").alias(rts_out),
        *[F.col(f"__match.{c}").alias(out_names[c]) for c in rpayload],
    )
