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
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def capped_band_self_join(
    bands: DataFrame,
    key: str = "band_key",
    id_col: str = "doc_id",
    cap: int = 10_000,
) -> DataFrame:
    """Candidate pairs (doc1 < doc2) sharing a band key, with per-band
    work capped. Output matches the uncapped self-join exactly (pairs
    may repeat across bands — callers dropDuplicates, as d04 does).

    `bands` is cached here: it is read at least three times (size
    probe + both join sides) and its lineage is typically expensive
    (minhash/simhash band derivation). The probe job materializes the
    cache before any self-join starts, avoiding the double-fill race;
    eviction is left to Spark's LRU (same policy as the d04/d05
    fingerprint caches)."""
    bands = bands.cache()
    sizes = bands.groupBy(key).agg(F.count("*").alias("_n"))
    hot_keys = sizes.filter(F.col("_n") > cap)
    if hot_keys.isEmpty():
        # Common case — no degenerate band: keep the original one-join
        # plan with zero guard overhead (the size probe is a map-side
        # combined aggregate over slim (key) rows).
        b1, b2 = bands.alias("b1"), bands.alias("b2")
        return b1.join(
            b2,
            (F.col(f"b1.{key}") == F.col(f"b2.{key}"))
            & (F.col(f"b1.{id_col}") < F.col(f"b2.{id_col}")),
        ).select(
            F.col(f"b1.{id_col}").alias("doc1"),
            F.col(f"b2.{id_col}").alias("doc2"),
        )

    cold = bands.join(F.broadcast(hot_keys.select(key)), key, "left_anti")
    c1, c2 = cold.alias("c1"), cold.alias("c2")
    cold_pairs = c1.join(
        c2,
        (F.col(f"c1.{key}") == F.col(f"c2.{key}"))
        & (F.col(f"c1.{id_col}") < F.col(f"c2.{id_col}")),
    ).select(
        F.col(f"c1.{id_col}").alias("doc1"), F.col(f"c2.{id_col}").alias("doc2")
    )

    hot = bands.join(F.broadcast(hot_keys), key).withColumn(
        "_g", F.ceil(F.col("_n") / F.lit(cap)).cast("int")
    )
    gid = F.pmod(F.xxhash64(F.col(id_col)), F.col("_g")).cast("int")
    hot = hot.withColumn("_gid", gid)
    left = hot.withColumn(
        "_j", F.explode(F.sequence(F.col("_gid"), F.col("_g") - 1))
    ).select(key, F.col(id_col), "_gid", "_j")
    right = hot.withColumn(
        "_i", F.explode(F.sequence(F.lit(0), F.col("_gid")))
    ).select(key, F.col(id_col), "_i", "_gid")
    l, r = left.alias("l"), right.alias("r")
    lid, rid = F.col(f"l.{id_col}"), F.col(f"r.{id_col}")
    # Cross-group meetings happen once per unordered pair, in GROUP
    # order — the ids may sort the other way, so orient the output with
    # least/greatest instead of filtering on id order (which would drop
    # pairs whose id order opposes their group order). Same-group
    # meetings happen in both orders; keep one via id order there.
    hot_pairs = l.join(
        r,
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col("l._gid") == F.col("r._i"))
        & (F.col("l._j") == F.col("r._gid")),
    ).filter(
        (F.col("l._gid") != F.col("r._gid")) | (lid < rid)
    ).select(
        F.least(lid, rid).alias("doc1"), F.greatest(lid, rid).alias("doc2")
    )

    return cold_pairs.unionByName(hot_pairs)
