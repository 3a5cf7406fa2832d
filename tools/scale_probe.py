#!/usr/bin/env python
"""Deterministic 10x scale probe (SCALE.md "10x scale probe" section).

Rebuilds the 10x fixture from sf0.1 — per document: the original, 2
one-word deletions, 1 verbatim copy, 6 word-shuffles (replica near-dup
structure that stresses banding/dedup); per embedding: 10 sigma=0.05
noise replicas (stresses ANN bucket selectivity). All randomness is
seeded per row id, so the fixture is bit-identical across rounds and the
numbers are comparable round-over-round. Remaining sf0.1 tables are
copied verbatim so any registered query runs against the fixture dir.

Usage:
    python tools/scale_probe.py                    # default probe set
    python tools/scale_probe.py d04 s18 t29        # prefix-filtered
    SPARK_GRAFT_PROBE_DIR=/tmp/sfx10 python tools/scale_probe.py

Prints one JSON line per query plus a summary (same shape as
timing_sweep.py).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DEFAULT_PROBE = (
    "d03_ngram_jaccard_pairs",
    "d04_minhash_lsh_pairs",
    "d09_containment_pairs",
    "d11_simhash_banded_pairs",
    "s02_lsh_ann",
    "s03_embedding_neardup",
    "s05_ivf_ann",
    "s12_knn_graph",
    "s18_semdedup",
    "t28_pii_redaction",
    "t29_repetition_signals",
    "t30_pps_sample",
    "p05_training_data_pipeline",
    "p06_curation_pipeline",
)


_SHARDS = 16  # single-file tables scan as ONE Spark task regardless of
# cores (files split at maxPartitionBytes=128MB) — a 4 MB fixture file
# serializes every row-local stage; shard so the probe measures the
# multi-file reality of any real table


def _write_sharded(t: pa.Table, path: str) -> None:
    os.makedirs(path, exist_ok=True)
    n = t.num_rows
    step = (n + _SHARDS - 1) // _SHARDS
    for s in range(_SHARDS):
        chunk = t.slice(s * step, step)
        if chunk.num_rows:
            pq.write_table(chunk, os.path.join(path, f"part-{s:03d}.parquet"))


def _build_documents(out_dir: str) -> None:
    t = pq.read_table(os.path.join(SRC, "documents.parquet"))
    doc_id = t.column("doc_id").to_pylist()
    text = t.column("text").to_pylist()
    lang = t.column("lang").to_pylist()
    source = t.column("source").to_pylist()
    ids, texts, langs, sources, n_chars = [], [], [], [], []
    for d, tx, lg, sc in zip(doc_id, text, lang, source):
        words = tx.split(" ")
        rng = np.random.default_rng(d)
        variants = [tx, tx]  # original + verbatim copy
        for _ in range(2):  # one-word deletions
            if len(words) > 1:
                k = int(rng.integers(0, len(words)))
                variants.append(" ".join(words[:k] + words[k + 1 :]))
            else:
                variants.append(tx)
        for _ in range(6):  # word shuffles
            perm = rng.permutation(len(words))
            variants.append(" ".join(words[i] for i in perm))
        for r, v in enumerate(variants):
            ids.append(d * 10 + r)
            texts.append(v)
            langs.append(lg)
            sources.append(sc)
            n_chars.append(len(v))
    out = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(sources, pa.string()),
            "n_chars": pa.array(n_chars, pa.int64()),
        }
    )
    _write_sharded(out, os.path.join(out_dir, "documents.parquet"))


def _build_embeddings(out_dir: str) -> None:
    t = pq.read_table(os.path.join(SRC, "embeddings.parquet"))
    vec_id = t.column("vec_id").to_pylist()
    emb = t.column("embedding").to_pylist()
    label = t.column("label").to_pylist()
    ids, vecs, labels = [], [], []
    for v, e, lb in zip(vec_id, emb, label):
        base = np.asarray(e, dtype=np.float32)
        rng = np.random.default_rng(v)
        for r in range(10):
            ids.append(v * 10 + r)
            if r == 0:
                vecs.append(base.tolist())
            else:
                vecs.append(
                    (base + rng.normal(0, 0.05, base.shape).astype(np.float32))
                    .astype(np.float32)
                    .tolist()
                )
            labels.append(lb)
    out = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        }
    )
    _write_sharded(out, os.path.join(out_dir, "embeddings.parquet"))


def build_fixture(out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    marker = os.path.join(out_dir, ".complete")
    if os.path.exists(marker):
        return
    _build_documents(out_dir)
    _build_embeddings(out_dir)
    for f in os.listdir(SRC):
        if f.endswith(".parquet") and f not in (
            "documents.parquet",
            "embeddings.parquet",
        ):
            shutil.copy(os.path.join(SRC, f), os.path.join(out_dir, f))
    with open(marker, "w") as fh:
        fh.write("ok\n")


def main() -> None:
    out_dir = os.environ.get("SPARK_GRAFT_PROBE_DIR", "/tmp/spark_graft_10x")
    t0 = time.time()
    build_fixture(out_dir)
    build_sec = round(time.time() - t0, 1)

    from serverless_datalake_aws_spark.plans import all_queries  # noqa: E402
    from serverless_datalake_aws_spark.session import get_session  # noqa: E402

    prefixes = tuple(sys.argv[1:])
    qmap = all_queries()
    names = [
        n
        for n in (sorted(qmap) if prefixes else DEFAULT_PROBE)
        if not prefixes or any(n.startswith(p) for p in prefixes)
    ]
    spark = get_session(app_name="scale_probe")
    results: dict[str, float] = {}
    failures: dict[str, str] = {}
    for name in names:
        try:  # warmup at sf0.001 (codegen), then one timed 10x run
            qmap[name](spark, "/root/testdata/sf0.001").write.format(
                "noop"
            ).mode("overwrite").save()
            t1 = time.time()
            qmap[name](spark, out_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            results[name] = round(time.time() - t1, 2)
            print(json.dumps({"query": name, "sec_10x": results[name]}))
        except Exception as exc:  # noqa: BLE001
            failures[name] = f"{type(exc).__name__}: {exc}"[:200]
            print(json.dumps({"query": name, "error": failures[name]}))
    print(
        json.dumps(
            {
                "fixture": out_dir,
                "fixture_build_sec": build_sec,
                "n": len(results),
                "total_sec": round(sum(results.values()), 2),
                "slowest": sorted(
                    results.items(), key=lambda kv: -kv[1]
                )[:10],
                "failures": failures,
            }
        )
    )


if __name__ == "__main__":
    main()
