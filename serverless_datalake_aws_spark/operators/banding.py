"""Hot-band-guarded LSH candidate generation (SURVEY §2.11 scale path).

The LSH band self-join (plans/dedup.py d04) equi-joins on band_key: a
degenerate hot band — boilerplate-heavy corpora produce them — makes
one join key quadratic and turns a single task into the stage straggler
at 100 TB (VERDICT r1 "What's wrong" / next-round #7).

`capped_band_self_join` keeps the OUTPUT IDENTICAL to the naive
self-join while bounding per-task work:

- band sizes are counted (map-side-combinable aggregate, slim rows);
- bands at or under `cap` rows take the plain equi-join;
- oversized bands are split into g = ceil(n/cap) groups by id hash, and
  the all-pairs work is re-expressed as the g*(g+1)/2 group-pair join:
  a row in group i replicates to pair-keys (i, j>=i) on the left and
  (i<=gid, gid) on the right, so every row pair meets on exactly one
  (band, i, j) key and each key carries at most ~cap^2 comparisons.

Replication factor on hot rows is ~g per side — the standard skew-join
trade (bounded tasks for bounded duplication). Both legs stay hash
joins; no cartesian/broadcast-nested-loop appears (plan-asserted in
tests/test_plans.py).

`payload` + `pair_filter` push the verify step INSIDE the join: when
band keys are weakly selective (biased simhash bits concentrate most of
the corpus in a few band values — the 10x scale probe measured 2.6e9
within-band candidates on 50k docs), materializing candidates and
re-joining payloads costs orders of magnitude more than the comparisons
themselves. Carrying a slim payload (e.g. the 8-byte simhash) on the
band rows and evaluating the predicate during the join probe keeps the
quadratic part inside whole-stage codegen and lets only TRUE pairs
reach the downstream shuffle (dropDuplicates) — the probe's d11 run
went from 321 s to join-rate-bound after this change.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def capped_band_self_join(
    bands: DataFrame,
    key: str = "band_key",
    id_col: str = "doc_id",
    cap: int = 10_000,
    payload: str | None = None,
    pair_filter: Callable[[Column, Column], Column] | None = None,
    cache: bool = True,
) -> DataFrame:
    """Candidate pairs (doc1 < doc2) sharing a band key, with per-band
    work capped. Output matches the uncapped self-join exactly (pairs
    may repeat across bands — callers dropDuplicates, as d04 does).

    With `payload` (a column of `bands`), the output carries
    `payload1`/`payload2` aligned to doc1/doc2, and `pair_filter`
    (payload1, payload2) -> BooleanColumn, when given, is evaluated as
    part of the join condition — the predicate MUST be symmetric in its
    arguments (Hamming distance, cosine bounds are; ordered comparisons
    are not).

    `bands` is cached here: it is read at least three times (size
    probe + both join sides) and its lineage is typically expensive
    (minhash/simhash band derivation). The probe job materializes the
    cache before any self-join starts, avoiding the double-fill race;
    eviction is left to Spark's LRU (same policy as the d04/d05
    fingerprint caches).

    NULL ids are dropped up front: the naive join's `id1 < id2` is
    NULL for them in every orientation, so they can never pair — but
    the hot leg's cross-group keep-filter passed them through its
    `gid != gid` disjunct, emitting bogus (x, x) self-pairs with
    swapped payloads.

    `cache=False` skips the internal cache: callers who already cache
    the input (st15 pins each micro-batch's bands and unpersists after
    absorb) must own the ONE cache — a second internal entry per call
    would leak block-manager state nothing releases."""
    bands = bands.filter(F.col(id_col).isNotNull())
    if cache:
        bands = bands.cache()
    cols = [id_col] + ([payload] if payload else [])

    def _pair_cond(p1: Column, p2: Column) -> Column:
        return pair_filter(p1, p2) if pair_filter is not None else F.lit(True)

    def _plain_self_join(df: DataFrame) -> DataFrame:
        """The uncapped ordered self-join — shared by the no-hot-band
        fast path and the cold leg (one body, no drift)."""
        d1, d2 = df.alias("d1"), df.alias("d2")
        out = d1.join(
            d2,
            (F.col(f"d1.{key}") == F.col(f"d2.{key}"))
            & (F.col(f"d1.{id_col}") < F.col(f"d2.{id_col}"))
            & _pair_cond(
                F.col(f"d1.{payload or id_col}"),
                F.col(f"d2.{payload or id_col}"),
            ),
        )
        sel = [
            F.col(f"d1.{id_col}").alias("doc1"),
            F.col(f"d2.{id_col}").alias("doc2"),
        ]
        if payload:
            sel += [
                F.col(f"d1.{payload}").alias("payload1"),
                F.col(f"d2.{payload}").alias("payload2"),
            ]
        return out.select(*sel)

    # ONE aggregation pass: hot keys are few by construction (bands
    # with >cap members), so collect them instead of re-running the
    # full groupBy for the emptiness probe and each broadcast side.
    sizes = bands.groupBy(key).agg(F.count("*").alias("_n"))
    hot_rows = sizes.filter(F.col("_n") > cap).collect()
    if not hot_rows:
        # Common case — no degenerate band: keep the original one-join
        # plan with zero guard overhead (the size probe is a map-side
        # combined aggregate over slim (key) rows).
        return _plain_self_join(bands)

    hot_keys = bands.sparkSession.createDataFrame(hot_rows, sizes.schema)
    cold = bands.join(F.broadcast(hot_keys.select(key)), key, "left_anti")
    cold_pairs = _plain_self_join(cold)

    hot = bands.join(F.broadcast(hot_keys), key).withColumn(
        "_g", F.ceil(F.col("_n") / F.lit(cap)).cast("int")
    )
    gid = F.pmod(F.xxhash64(F.col(id_col)), F.col("_g")).cast("int")
    hot = hot.withColumn("_gid", gid)
    left = hot.withColumn(
        "_j", F.explode(F.sequence(F.col("_gid"), F.col("_g") - 1))
    ).select(key, *cols, "_gid", "_j")
    right = hot.withColumn(
        "_i", F.explode(F.sequence(F.lit(0), F.col("_gid")))
    ).select(key, *cols, "_i", "_gid")
    l, r = left.alias("l"), right.alias("r")
    lid, rid = F.col(f"l.{id_col}"), F.col(f"r.{id_col}")
    # Cross-group meetings happen once per unordered pair, in GROUP
    # order — the ids may sort the other way, so orient the output with
    # least/greatest instead of filtering on id order (which would drop
    # pairs whose id order opposes their group order). Same-group
    # meetings happen in both orders; keep one via id order there.
    # pair_filter is symmetric by contract, so it needs no orientation.
    hot_join = l.join(
        r,
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col("l._gid") == F.col("r._i"))
        & (F.col("l._j") == F.col("r._gid"))
        & _pair_cond(
            F.col(f"l.{payload or id_col}"), F.col(f"r.{payload or id_col}")
        ),
    ).filter((F.col("l._gid") != F.col("r._gid")) | (lid < rid))
    hot_sel = [F.least(lid, rid).alias("doc1"), F.greatest(lid, rid).alias("doc2")]
    if payload:
        lp, rp = F.col(f"l.{payload}"), F.col(f"r.{payload}")
        hot_sel += [
            F.when(lid < rid, lp).otherwise(rp).alias("payload1"),
            F.when(lid < rid, rp).otherwise(lp).alias("payload2"),
        ]
    hot_pairs = hot_join.select(*hot_sel)

    return cold_pairs.unionByName(hot_pairs)
