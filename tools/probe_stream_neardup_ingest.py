#!/usr/bin/env python
"""Streaming near-dup-ingest scale probe: is per-batch absorb cost
history-bounded or batch-bounded?

st15's operator (operators/stream_dedup.MinHashIngestIndex) claims the
per-batch cost is |batch| sketch + an index-scale band probe + a
CANDIDATE-BOUNDED shingle fetch. The old inline absorb re-scanned
every historical document's shingle arrays per batch (corpus-scale
I/O, the part that dies first at 100 TB). This probe measures both:

- fixture: BASES synthetic base docs (same word-generator as
  tools/scale_probe_100x.py), of which 1-in-50 is a 10-variant
  near-dup family (original, verbatim copy, 2 one-word deletions, 6
  shuffles) and the rest are singletons -> ~1.18 x BASES docs with
  ~17% of them family members — a crawl-like dup rate, NOT the 100%
  dup density of the d04 probe (which would push every batch past the
  IN-list cap and into the degenerate semi-join path by design).
- family members are sharded across K epochs by doc_id hash, so most
  verified pairs CROSS epochs — the adversarial case for the history
  read.
- both modes absorb identical epochs into separate indexes;
  per-epoch wall, new pairs, and cumulative history size are printed
  as JSON lines; the two final pair sets are compared (must be equal).

Expected shape: unpruned per-epoch wall grows with accumulated
history (the corpus-scale toks re-scan); pruned stays ~flat (partition
-dir + row-group pruned fetch of only the candidate ids). SCALE.md
round-11 records the run.

A second experiment, `marginal`, asks the question that actually
separates the designs: WHAT DOES ONE SMALL BATCH COST AGAINST A BIG
HISTORY? It seeds the index with shards 1..K-1 in one epoch, then
absorbs shard 0 split into 8 small slices (~6k docs each), timing
each slice pruned vs unpruned. Fixed per-batch work is small there,
so the history term dominates the wall.

A third experiment, `cosine`, measures the EMBEDDING sibling
(CosineIngestIndex, st20's operator), where the partition key is the
CLUSTER id — the case where directory pruning genuinely bites: a
micro-batch touches a handful of clusters, and the history fetch
skips every other cluster's directories outright (on the MinHash
side the hash buckets are only sparse for quiet batches).

Usage:  python tools/probe_stream_neardup_ingest.py [pruned|unpruned|marginal|cosine]
Env:    SPARK_GRAFT_PSNI_BASES (default 400000)
        SPARK_GRAFT_PSNI_EPOCHS (default 10)
        SPARK_GRAFT_PSNI_DIR (default /tmp/psni)
        SPARK_GRAFT_PSNI_VECS (default 50000, cosine mode — the seed
        absorb's within-batch self-join is quadratic per cluster at
        the expression-level dot st20 uses at fixture scale, so the
        vector corpus stays small; the FETCH accounting, not the pair
        math, is what this mode measures)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

BASES = int(os.environ.get("SPARK_GRAFT_PSNI_BASES", "400000"))
EPOCHS = int(os.environ.get("SPARK_GRAFT_PSNI_EPOCHS", "10"))
OUT = os.environ.get("SPARK_GRAFT_PSNI_DIR", "/tmp/psni")
VOCAB = 50_000
FAMILY_EVERY = 50  # 1-in-50 bases is a 10-variant near-dup family


def log(obj: dict) -> None:
    print(json.dumps(obj), flush=True)


def build_fixture(spark) -> None:
    """~1.18 x BASES docs, hive-partitioned by epoch shard."""
    base = spark.range(BASES).select(F.col("id").alias("base_id"))
    L = (F.lit(30) + F.pmod(F.col("base_id"), F.lit(40))).cast("int")
    words = F.transform(
        F.sequence(F.lit(0), L - 1),
        lambda i: F.concat(
            F.lit("w"), F.pmod(F.xxhash64(F.col("base_id"), i), F.lit(VOCAB))
        ),
    )
    doc = base.select("base_id", words.alias("w"))
    n_var = F.when(
        F.pmod(F.col("base_id"), F.lit(FAMILY_EVERY)) == 0, F.lit(9)
    ).otherwise(F.lit(0))
    r = F.col("r")
    del_pos = F.pmod(F.xxhash64(F.col("base_id"), r), F.size("w"))
    deleted = F.filter("w", lambda _, i: i != del_pos)
    shuffled = F.transform(
        F.array_sort(
            F.transform(
                F.sequence(F.lit(0), F.size("w") - 1),
                lambda i: F.struct(
                    F.xxhash64(F.col("base_id"), r, i).alias("k"),
                    F.element_at("w", (i + 1).cast("int")).alias("t"),
                ),
            )
        ),
        lambda s: s["t"],
    )
    variant = (
        F.when(r < 2, F.col("w")).when(r < 4, deleted).otherwise(shuffled)
    )
    out = (
        doc.select(
            "base_id", "w", F.explode(F.sequence(F.lit(0), n_var)).alias("r")
        )
        .select(
            (F.col("base_id") * 10 + r).alias("doc_id"),
            F.array_join(variant, " ").alias("text"),
        )
        .withColumn(
            "shard",
            F.pmod(F.xxhash64(F.col("doc_id"), F.lit("shard")), F.lit(EPOCHS)),
        )
    )
    (
        out.repartition(EPOCHS * 4, "shard")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(f"{OUT}/docs")
    )


def run_mode(spark, prune: bool) -> list:
    from serverless_datalake_aws_spark.operators.stream_dedup import (
        MinHashIngestIndex,
    )

    mode = "pruned" if prune else "unpruned"
    path = f"{OUT}/index_{mode}"
    shutil.rmtree(path, ignore_errors=True)
    idx = MinHashIngestIndex(spark, path, prune_history=prune)
    docs = spark.read.parquet(f"{OUT}/docs")
    hist = 0
    for e in range(EPOCHS):
        batch = docs.filter(F.col("shard") == e).select("doc_id", "text")
        n = batch.count()  # pre-counted so the wall is absorb-only
        t0 = time.time()
        idx.absorb(batch, e)
        wall = time.time() - t0
        new_pairs = idx.state.read("pairs", upto=e).count()
        log(
            {
                "probe": "stream_neardup_ingest",
                "mode": mode,
                "epoch": e,
                "batch_rows": n,
                "hist_docs": hist,
                "wall_s": round(wall, 2),
                "pairs_total": new_pairs,
            }
        )
        hist += n
    return sorted(
        (r["doc1"], r["doc2"]) for r in idx.pairs().collect()
    )


def run_marginal(spark) -> None:
    """Seed a big history in epoch 0, then time SMALL batches against
    it, pruned vs unpruned — the marginal per-batch cost a long-lived
    ingest stream actually pays."""
    from serverless_datalake_aws_spark.operators.stream_dedup import (
        MinHashIngestIndex,
    )

    docs = spark.read.parquet(f"{OUT}/docs")
    seed = docs.filter(F.col("shard") != 0).select("doc_id", "text")
    small = docs.filter(F.col("shard") == 0).select("doc_id", "text")
    n_slices = 8
    sliced = small.withColumn(
        "slice",
        F.pmod(F.xxhash64(F.col("doc_id"), F.lit("slice")), F.lit(n_slices)),
    )
    for mode in ("unpruned", "pruned"):
        path = f"{OUT}/index_marg_{mode}"
        shutil.rmtree(path, ignore_errors=True)
        idx = MinHashIngestIndex(spark, path, prune_history=(mode == "pruned"))
        t0 = time.time()
        idx.absorb(seed, 0)
        hist = seed.count()
        log(
            {
                "probe": "marginal_seed",
                "mode": mode,
                "hist_docs": hist,
                "seed_wall_s": round(time.time() - t0, 2),
            }
        )
        for s in range(n_slices):
            batch = sliced.filter(F.col("slice") == s).select(
                "doc_id", "text"
            )
            n = batch.count()
            t0 = time.time()
            idx.absorb(batch, s + 1)
            log(
                {
                    "probe": "marginal_batch",
                    "mode": mode,
                    "slice": s,
                    "batch_rows": n,
                    "hist_docs": hist,
                    "wall_s": round(time.time() - t0, 2),
                }
            )
            hist += n


def run_accounting(spark) -> None:
    """Rows-fetched accounting against the marginal pruned index: wall
    time can't show the history-read difference at a scale where the
    corpus fits the page cache, so count the HEAVY rows each design
    feeds the verify join for one more small batch."""
    from serverless_datalake_aws_spark.operators.stream_dedup import (
        MinHashIngestIndex,
        sketch_batch,
    )

    path = f"{OUT}/index_marg_pruned"
    idx = MinHashIngestIndex(spark, path)
    high = idx.committed()
    if high < 0:
        return
    docs = spark.read.parquet(f"{OUT}/docs")
    # a fresh probe batch the index has never seen: re-absorb shard 0
    # slice 0's docs with shifted ids so families re-collide
    batch = (
        docs.filter(F.col("shard") == 0)
        .filter(
            F.pmod(F.xxhash64(F.col("doc_id"), F.lit("slice")), F.lit(8)) == 0
        )
        .select((F.col("doc_id") + 100_000_000).alias("doc_id"), "text")
    )
    bands_b, toks_b = sketch_batch(batch)
    old_bands = idx.state.read("bands", upto=high)
    cand = (
        bands_b.join(
            old_bands.withColumnRenamed("doc_id", "old_id"), "band_key"
        )
        .select(
            F.least("doc_id", "old_id").alias("doc1"),
            F.greatest("doc_id", "old_id").alias("doc2"),
        )
        .dropDuplicates(["doc1", "doc2"])
    )
    fetched = idx._history_toks(high, cand, toks_b)
    n_fetched = 0 if fetched is None else fetched.count()
    total = idx.state.read("toks", upto=high).count()
    need_ids = (
        cand.select(F.col("doc1").alias("doc_id"))
        .unionByName(cand.select(F.col("doc2").alias("doc_id")))
        .distinct()
        .join(toks_b.select("doc_id"), "doc_id", "left_anti")
    )
    buckets = {
        r["doc_id"] % idx.toks_buckets for r in need_ids.collect()
    }
    log(
        {
            "probe": "accounting",
            "batch_rows": batch.count(),
            "hist_rows_total": total,
            "hist_rows_fetched_pruned": n_fetched,
            "hist_rows_unpruned_scans": 2 * total,
            "buckets_touched": len(buckets),
            "toks_buckets": idx.toks_buckets,
        }
    )


def run_cosine(spark) -> None:
    """CosineIngestIndex marginal cost: seed ~95% of a vector corpus,
    then absorb small batches drawn from FEW clusters and compare the
    history rows fetched (and wall) pruned vs unpruned. Vectors are
    the scale_probe_100x replica shape: base vectors x noise replicas,
    so ε-dups exist and every batch has cross-epoch pairs."""
    from serverless_datalake_aws_spark.operators.stream_dedup import (
        CosineIngestIndex,
    )

    n = int(os.environ.get("SPARK_GRAFT_PSNI_VECS", "50000"))
    n_seeds = 64
    base = spark.range(n).select(
        F.col("id").alias("vec_id"),
        (F.col("id") % n_seeds).alias("b"),  # cluster-structured corpus
        (F.col("id") / n_seeds).cast("long").alias("r"),
    )
    dim = F.sequence(F.lit(0), F.lit(63))

    def unit(*cols):
        return F.pmod(F.xxhash64(*cols), F.lit(2000)) / 1000.0 - 1.0

    vec = F.transform(
        dim,
        lambda d: (
            unit(F.col("b"), d)
            + F.when(F.col("r") == 0, F.lit(0.0)).otherwise(
                unit(F.col("b"), F.col("r"), d) * 0.05
            )
        ).cast("float"),
    )
    vecs = base.select("vec_id", "b", vec.alias("embedding"))
    vecs.write.mode("overwrite").parquet(f"{OUT}/vecs")
    vecs = spark.read.parquet(f"{OUT}/vecs")
    seeds = [
        (int(r["vec_id"]) // 1, r["embedding"])
        for r in vecs.filter(F.col("vec_id") < n_seeds).collect()
    ]
    seeds = [(i, emb) for i, (_, emb) in enumerate(sorted(seeds))]
    # batches: vectors of 4 clusters held out of the seed
    hot = [3, 17, 42, 63]
    held = vecs.filter(
        F.col("b").isin(hot) & (F.col("vec_id") >= n_seeds * 100)
    )
    seed_df = vecs.join(held, "vec_id", "left_anti").select(
        "vec_id", "embedding"
    )
    n_slices = 4
    sliced = held.withColumn(
        "slice", F.pmod(F.xxhash64(F.col("vec_id")), F.lit(n_slices))
    )
    for mode in ("unpruned", "pruned"):
        path = f"{OUT}/index_cos_{mode}"
        shutil.rmtree(path, ignore_errors=True)
        idx = CosineIngestIndex(
            spark, path, seeds, threshold=0.95,
            prune_history=(mode == "pruned"),
        )
        t0 = time.time()
        idx.absorb(seed_df, 0)
        hist = seed_df.count()
        log(
            {
                "probe": "cosine_seed",
                "mode": mode,
                "hist_vecs": hist,
                "seed_wall_s": round(time.time() - t0, 2),
            }
        )
        for s in range(n_slices):
            batch = sliced.filter(F.col("slice") == s).select(
                "vec_id", "embedding"
            )
            bn = batch.count()
            t0 = time.time()
            idx.absorb(batch, s + 1)
            wall = time.time() - t0
            from serverless_datalake_aws_spark.functions import vector as VX

            assigned = VX.nearest_centroid(batch, seeds)
            fetched = idx._history_vecs(s, assigned)
            n_fetched = 0 if fetched is None else fetched.count()
            log(
                {
                    "probe": "cosine_batch",
                    "mode": mode,
                    "slice": s,
                    "batch_rows": bn,
                    "hist_vecs": hist,
                    "hist_rows_fetched": n_fetched,
                    "wall_s": round(wall, 2),
                }
            )
            hist += bn
        log(
            {
                "probe": "cosine_done",
                "mode": mode,
                "pairs": idx.pairs().count(),
            }
        )


def main() -> int:
    modes = sys.argv[1:] or ["unpruned", "pruned"]
    from serverless_datalake_aws_spark.session import get_session

    spark = get_session(app_name="probe_stream_neardup_ingest")
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.isdir(f"{OUT}/docs"):
        t0 = time.time()
        build_fixture(spark)
        log({"probe": "fixture", "built_s": round(time.time() - t0, 1),
             "docs": spark.read.parquet(f"{OUT}/docs").count()})
    results = {}
    for m in modes:
        if m == "marginal":
            run_marginal(spark)
            run_accounting(spark)
            continue
        if m == "accounting":
            run_accounting(spark)
            continue
        if m == "cosine":
            run_cosine(spark)
            continue
        results[m] = run_mode(spark, prune=(m == "pruned"))
        log({"probe": "mode_done", "mode": m, "pairs": len(results[m])})
    if len(results) == 2:
        ok = results["pruned"] == results["unpruned"]
        log({"probe": "equivalence", "equal": ok})
        return 0 if ok else 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
