"""Parameterized IVF-PQ approximate-nearest-neighbor search.

The production face of the s21/s22 plan entries
(plans/similarity5.py): the same algorithm with cells / nprobe /
codebook sizes as ARGUMENTS, split into build / probe / score stages
so an index can be built once, persisted, and queried many times —
the FAISS deployment lifecycle. s21 delegates here with its
oracle-pinned constants (C=8, nprobe=2), so the DuckDB value oracle
keeps guarding this exact code path; tools/scale_probe_ann.py drives
the same functions at 2M vectors / 64+ cells to measure that query
cost scales with PROBED CELLS, not corpus size (VERDICT r6 item 6).

Determinism contract (shared with similarity5): codebooks are taken
from the data itself (first n_cells vectors = coarse centroids, s05
convention; every stride-th vector = PQ codebook rows), and every
distance is rounded to 6 dp before any argmin/sum boundary, so any
engine — DuckDB included — replays cells, codes and rank order
bit-identically.

Scale notes:
- ENCODE is one map-only mapInPandas pass over the corpus; the
  D-dim embedding dies inside the batch and (vec_id, cid, m codes)
  crosses the exchange — the PQ compression made literal in the
  shuffle payload. Embarrassingly parallel; runs once per index
  build, not per query.
- PROBE is a driver-built (NQ × nprobe)-row broadcast table; the
  equi-join on cell id IS the inverted-file restriction, so
  candidates outside probed cells never leave the scan.
- ADC scoring is a row-local F.aggregate over the codes array
  indexing the flattened M × K distance table — pure JVM expression,
  no UDF in the scoring hot path.
"""

from __future__ import annotations

import sys
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

try:  # UDF closures must survive worker-side import (cwd ≠ repo root)
    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover
    pass


def np_round6(a):
    """6dp HALF-AWAY-FROM-ZERO round — what Spark's F.round and
    DuckDB's round() compute. np.round is half-EVEN (banker's), which
    resolves an exact .5 boundary the other way and can flip an encode
    argmin / top-k membership on one engine only. Signed form so
    cosines (negative-capable) round identically to distances."""
    import numpy as np

    a = np.asarray(a)
    return np.sign(a) * np.floor(np.abs(a) * 1e6 + 0.5) / 1e6


@dataclass
class PQCodebooks:
    """Driver-held quantizers: coarse centroids + per-subspace PQ
    codebook. Size: n_cells·D + k·D doubles — closure/broadcast-sized
    at any corpus scale (the index's learned state, not its data)."""

    ccids: "object"  # np.ndarray[int64] (n_cells,)
    CC: "object"  # np.ndarray (n_cells, D)
    Cm: "object"  # np.ndarray (k, m, sub)
    m: int
    sub: int
    k: int


def pq_codebooks(
    emb: DataFrame,
    n_cells: int,
    k_codes: int,
    stride: int,
    m: int,
    sub: int,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> PQCodebooks:
    """Data-derived quantizers (bounded collects: n_cells + k rows).
    Production swap-in: k-means centroids — same shapes."""
    import numpy as np

    coarse_rows = sorted(
        (r[id_col], r[emb_col])
        for r in emb.filter(F.col(id_col) < n_cells)
        .select(id_col, emb_col)
        .collect()
    )
    pq_rows = sorted(
        (r[id_col], r[emb_col])
        for r in emb.filter(F.col(id_col) % stride == 0)
        .select(id_col, emb_col)
        .orderBy(id_col)
        .limit(k_codes)
        .collect()
    )
    ccids = np.array([c[0] for c in coarse_rows], dtype=np.int64)
    CC = np.stack([np.asarray(c[1], dtype=np.float64) for c in coarse_rows])
    k_eff = len(pq_rows)
    Cm = np.stack(
        [np.asarray(c[1], dtype=np.float64) for c in pq_rows]
    ).reshape(k_eff, m, sub)
    return PQCodebooks(ccids=ccids, CC=CC, Cm=Cm, m=m, sub=sub, k=k_eff)


def ivf_pq_encode(
    emb: DataFrame,
    cb: PQCodebooks,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Index build: each vector → (vec_id, cid, codes[m]). Map-only."""
    import numpy as np
    import pandas as pd

    # unpack ALL fields into locals — referencing cb inside the closure
    # would pickle the whole dataclass (CC/Cm twice) into every task
    ccids, CC, Cm, m, sub = cb.ccids, cb.CC, cb.Cm, cb.m, cb.sub

    def _encode(it):
        for pdf in it:
            if not len(pdf):
                continue
            V = np.stack(pdf[emb_col].values).astype(np.float64)
            cd2 = np_round6(((V[:, None, :] - CC[None, :, :]) ** 2).sum(2))
            cid = ccids[np.argmin(cd2, axis=1)]  # ties → smallest ccid
            Vm = V.reshape(len(pdf), m, sub)
            d2 = np_round6(
                (
                    (Vm[:, :, None, :] - Cm.transpose(1, 0, 2)[None, :, :, :])
                    ** 2
                ).sum(axis=3)
            )
            codes = d2.argmin(axis=2).astype(np.int32)  # ties → smallest k
            yield pd.DataFrame(
                {
                    "vec_id": pdf[id_col].values,
                    "cid": cid,
                    "codes": list(codes),
                }
            )

    return emb.select(id_col, emb_col).mapInPandas(
        _encode, schema="vec_id long, cid long, codes array<int>"
    )


def ivf_pq_probe(
    spark: SparkSession,
    queries: list[tuple[int, list]],
    cb: PQCodebooks,
    nprobe: int,
) -> DataFrame:
    """Per query: its nprobe nearest cells + flattened M × K ADC
    distance table (NQ × nprobe rows — broadcast-sized)."""
    import numpy as np

    ccids, CC, Cm = cb.ccids, cb.CC, cb.Cm
    Q = np.stack([np.asarray(q[1], dtype=np.float64) for q in queries])
    qd2c = np_round6(((Q[:, None, :] - CC[None, :, :]) ** 2).sum(2))
    Qm = Q.reshape(len(queries), cb.m, cb.sub)
    dtab = np_round6(
        ((Qm[:, None, :, :] - Cm[None, :, :, :]) ** 2).sum(axis=3)
    )  # (NQ, K, M)
    probe_rows = []
    for qi, (qid, _) in enumerate(queries):
        order = sorted(range(len(ccids)), key=lambda j: (qd2c[qi, j], ccids[j]))
        flat = dtab[qi].T.ravel().tolist()  # flat[m * k + code]
        for j in order[:nprobe]:
            probe_rows.append((int(qid), int(ccids[j]), flat))
    return spark.createDataFrame(
        probe_rows, "query_id long, cid long, dtab array<double>"
    )


def ivf_pq_topk(
    enc: DataFrame, probe: DataFrame, cb: PQCodebooks, topk: int
) -> DataFrame:
    """Query stage: BroadcastHashJoin on cid (the inverted-file
    restriction), row-local ADC sum, per-query top-k window over
    24-byte triples. Cost ∝ rows of probed cells, not corpus."""
    k_eff, m = cb.k, cb.m
    adc = F.round(
        F.aggregate(
            F.sequence(F.lit(0), F.lit(m - 1)),
            F.lit(0.0),
            lambda acc, mm: acc
            + F.element_at(
                F.col("dtab"),
                (mm * k_eff + F.element_at(F.col("codes"), mm + 1) + 1).cast(
                    "int"
                ),
            ),
        ),
        6,
    )
    w = W.partitionBy("query_id").orderBy("approx_d2", "neighbor_id")
    return (
        enc.join(F.broadcast(probe), "cid")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            adc.alias("approx_d2"),
        )
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= topk)
    )


def ivf_pq_search(
    spark: SparkSession,
    emb: DataFrame,
    *,
    n_cells: int,
    nprobe: int,
    n_queries: int,
    topk: int,
    m: int,
    sub: int,
    k_codes: int,
    stride: int,
) -> DataFrame:
    """End-to-end IVF-PQ with per-query recall@k audit — the s21
    composition: build → probe → score → brute-force recall join.
    Queries are the first n_queries corpus vectors (self-query rows
    excluded), matching the s01/s05/s19 convention."""
    from serverless_datalake_aws_spark.functions import vector as VX

    cb = pq_codebooks(emb, n_cells, k_codes, stride, m, sub)
    qrows = sorted(
        (r["vec_id"], r["embedding"])
        for r in emb.filter(F.col("vec_id") < n_queries)
        .select("vec_id", "embedding")
        .collect()
    )
    enc = ivf_pq_encode(emb, cb)
    probe = ivf_pq_probe(spark, qrows, cb, nprobe)
    topk_df = ivf_pq_topk(enc, probe, cb, topk)

    exact = (
        VX.brute_scores(emb, qrows, metric="l2")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", F.round("d2", 6).alias("d2"))
    )
    we = W.partitionBy("query_id").orderBy("d2", "neighbor_id")
    exact_top = (
        exact.withColumn("erk", F.row_number().over(we))
        .filter(F.col("erk") <= topk)
        .select("query_id", "neighbor_id", F.lit(1).alias("hit"))
    )
    recall = (
        topk_df.select("query_id", "neighbor_id")
        .join(exact_top, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.round(
                F.count("hit").cast("double") / F.lit(float(topk)), 2
            ).alias("recall_at_k")
        )
    )
    return (
        topk_df.join(recall, "query_id")
        .select("query_id", "neighbor_id", "approx_d2", "rk", "recall_at_k")
        .orderBy("query_id", "rk")
    )
