#!/usr/bin/env python
"""100x dedup-path probe (VERDICT r5 item 5): 5M documents / 200k
embeddings, generated DISTRIBUTED (pure Spark expressions, seeded by
row id — no driver-side loops, bit-identical across rounds), then
d04 / s18 / d11 run end-to-end with wall-times and the band-size
histograms the hot-band cap actually sees.

Fixture shape (same replica structure as tools/scale_probe.py's 10x
fixture, scaled):
- documents: 500k synthetic base docs (30-69 words from a 50k-word
  vocab, word i = xxhash64(base_id, i) mod V) x 10 variants each
  (original, verbatim copy, 2 one-word deletions, 6 deterministic
  hash-order shuffles) -> 5,000,000 docs in clusters of <=10 near-dups.
  MinHash bands (d04) stay selective here — band size ~ cluster size —
  while SimHash's 4-5-bit pigeonhole blocks (d11) saturate (~N/32 rows
  per band value), so d11 is where the hot-band cap's group split runs
  at real g (expected g = ceil(band/10k) >> 1 on every block).
- embeddings: 2,000 base vectors x 100 noise replicas -> 200,000
  vectors; s18's stride-256 seeding yields ~780 clusters of ~256.

Usage:
    python tools/scale_probe_100x.py                # build + all three
    python tools/scale_probe_100x.py d04 s18        # subset
    SPARK_GRAFT_P100_DIR=/tmp/sf100x SPARK_GRAFT_P100_BASES=500000 ...

One JSON line per stage to stdout (and everything to the log the
caller tees); the SCALE.md round-6 section records the results.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

OUT = os.environ.get("SPARK_GRAFT_P100_DIR", "/tmp/sf100x")
BASES = int(os.environ.get("SPARK_GRAFT_P100_BASES", "500000"))
EMB_BASES = int(os.environ.get("SPARK_GRAFT_P100_EMB_BASES", "2000"))
VOCAB = 50_000


def log(obj: dict) -> None:
    print(json.dumps(obj), flush=True)


def build_documents(spark) -> None:
    """5M docs = BASES x 10 variants, all expression-side (no UDF)."""
    base = spark.range(BASES).select(F.col("id").alias("base_id"))
    L = (F.lit(30) + F.pmod(F.col("base_id"), F.lit(40))).cast("int")
    words = F.transform(
        F.sequence(F.lit(0), L - 1),
        lambda i: F.concat(
            F.lit("w"), F.pmod(F.xxhash64(F.col("base_id"), i), F.lit(VOCAB))
        ),
    )
    doc = base.select("base_id", words.alias("w"))
    r = F.col("r")
    # deterministic per-(base, r) variant of the word array
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
        F.when(r < 2, F.col("w"))
        .when(r < 4, deleted)
        .otherwise(shuffled)
    )
    out = (
        doc.select("base_id", "w", F.explode(F.sequence(F.lit(0), F.lit(9))).alias("r"))
        .select(
            (F.col("base_id") * 10 + r).alias("doc_id"),
            F.array_join(variant, " ").alias("text"),
            F.concat(F.lit("lang"), F.pmod(F.col("base_id"), F.lit(5))).alias("lang"),
            F.concat(F.lit("src"), F.pmod(F.col("base_id"), F.lit(20))).alias("source"),
        )
        .withColumn("n_chars", F.length("text").cast("long"))
    )
    out.repartition(64).write.mode("overwrite").parquet(
        os.path.join(OUT, "documents.parquet")
    )


def build_embeddings(spark) -> None:
    base = spark.range(EMB_BASES * 100).select(
        F.col("id").alias("vec_id"),
        (F.col("id") / 100).cast("long").alias("b"),
        F.pmod(F.col("id"), F.lit(100)).alias("r"),
    )
    dim = F.sequence(F.lit(0), F.lit(63))

    def unit(*cols):  # deterministic float in [-1, 1)
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
    base.select(
        "vec_id",
        vec.alias("embedding"),
        F.pmod(F.col("b"), F.lit(10)).cast("int").alias("label"),
    ).repartition(32).write.mode("overwrite").parquet(
        os.path.join(OUT, "embeddings.parquet")
    )


def band_histogram(spark, which: str) -> dict:
    """Band-size distribution each dedup query's self-join sees, plus
    the hot-band cap's g per band (cap=10k, operators/banding.py)."""
    from serverless_datalake_aws_spark.catalog import table
    from serverless_datalake_aws_spark.functions import text as TX

    from pyspark import StorageLevel

    docs = table(spark, OUT, "documents")
    if which == "d04":
        # persist barrier BEFORE the 16 minhash mins, exactly like d04:
        # projection collapse otherwise inlines the md5 shingle hashing
        # into every min expression (16x recompute — measured as a
        # >1h/task stall at 5M docs on the first probe attempt)
        d = docs.select(
            "doc_id",
            F.transform(
                F.array_distinct(TX.word_ngrams("text", n=3)),
                lambda t: TX.token_hash(t) % TX.MINHASH_P,
            ).alias("hs"),
        ).persist(StorageLevel.MEMORY_AND_DISK)
        d.count()
        bands = d.select(
            "doc_id",
            F.explode(
                TX.lsh_band_keys(TX.minhash_mins(F.col("hs")))
            ).alias("band_key"),
        )
    else:  # d11 (32-bit) / d18 (56-bit) pigeonhole blocks (plans/dedup2.py)
        from serverless_datalake_aws_spark.plans.dedup2 import (
            _D18_BITS,
            _D18_BLOCKS,
            _simhash_col_from,
        )

        bits = _D18_BITS if which == "d18" else 32
        # same persist barrier as d05/d11/d18: the per-bit votes would
        # otherwise inline the token-hash md5 chain `bits` times
        hashed = docs.select(
            "doc_id",
            F.transform(TX.distinct_tokens("text"), TX.token_hash).alias(
                "hashes"
            ),
        ).persist(StorageLevel.MEMORY_AND_DISK)
        hashed.count()
        s = hashed.select(
            "doc_id", _simhash_col_from("hashes", bits=bits).alias("simhash")
        )
        blocks = (
            _D18_BLOCKS
            if which == "d18"
            else [(0, 5), (5, 5), (10, 5), (15, 5), (20, 4), (24, 4), (28, 4)]
        )
        bands = s.select(
            "doc_id",
            F.explode(
                F.array(
                    *[
                        F.concat_ws(
                            ":",
                            F.lit(i),
                            (
                                F.shiftright("simhash", off) % F.lit(2**width)
                            ).cast("string"),
                        )
                        for i, (off, width) in enumerate(blocks)
                    ]
                )
            ).alias("band_key"),
        )
    cached = d if which == "d04" else hashed
    sizes = bands.groupBy("band_key").agg(F.count("*").alias("n"))
    agg = sizes.agg(
        F.count("*").alias("bands"),
        F.max("n").alias("max_band"),
        F.expr("percentile_approx(n, array(0.5, 0.9, 0.99), 1000)").alias("pct"),
        F.sum(F.when(F.col("n") > 10_000, 1).otherwise(0)).alias("hot_bands"),
        F.max(F.ceil(F.col("n") / 10_000)).alias("max_g"),
        F.sum(
            F.when(F.col("n") > 10_000, F.ceil(F.col("n") / 10_000)).otherwise(
                None
            )
        ).alias("sum_g_hot"),
    ).collect()[0]
    cached.unpersist()
    return {
        "bands": agg["bands"],
        "max_band": agg["max_band"],
        "band_p50_p90_p99": [float(x) for x in agg["pct"]],
        "hot_bands_gt_cap": agg["hot_bands"],
        "max_g": int(agg["max_g"]),
        "sum_g_over_hot_bands": (
            int(agg["sum_g_hot"]) if agg["sum_g_hot"] is not None else 0
        ),
    }


def main() -> None:
    from serverless_datalake_aws_spark.plans import all_queries
    from serverless_datalake_aws_spark.session import get_session

    wanted = sys.argv[1:] or ["d04", "s18", "d11"]
    spark = get_session(app_name="probe100x", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")

    marker = os.path.join(OUT, ".complete")
    if not os.path.exists(marker):
        t0 = time.monotonic()
        build_documents(spark)
        log({"stage": "build_documents", "sec": round(time.monotonic() - t0, 1), "rows": BASES * 10})
        t0 = time.monotonic()
        build_embeddings(spark)
        log({"stage": "build_embeddings", "sec": round(time.monotonic() - t0, 1), "rows": EMB_BASES * 100})
        open(marker, "w").write("ok")

    qmap = all_queries()
    names = {
        "d04": "d04_minhash_lsh_pairs",
        "d11": "d11_simhash_banded_pairs",
        "d18": "d18_simhash56_banded_pairs",
        "s18": "s18_semdedup",
    }
    for short in wanted:
        name = names[short]
        if short in ("d04", "d11", "d18"):
            t0 = time.monotonic()
            hist = band_histogram(spark, short)
            log({"stage": f"{short}_band_histogram", "sec": round(time.monotonic() - t0, 1), **hist})
        t0 = time.monotonic()
        try:
            n = qmap[name](spark, OUT).count()
            log({"stage": short, "query": name, "sec": round(time.monotonic() - t0, 1), "rows": n})
        except Exception as e:  # record the wall instead of dying
            log({"stage": short, "query": name, "sec": round(time.monotonic() - t0, 1), "error": str(e)[:400]})
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
