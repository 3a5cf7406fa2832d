"""Engine vector-index surface (IVF knn twin of the text search index):
build → probe-pruned search → incremental append. Ground truth is
brute-force cosine over the same table."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from serverless_datalake_aws_spark.engine import DataLakeEngine
from tests.conftest import SF_DIR, plan_of


@pytest.fixture()
def engine(spark, tmp_path):
    return DataLakeEngine(spark, tmp_path / "lake")


def _emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


def _brute_topk(rows, query_vec, k):
    qn = math.sqrt(sum(x * x for x in query_vec))
    scored = []
    for r in rows:
        v = [float(x) for x in r["embedding"]]
        n = math.sqrt(sum(x * x for x in v))
        if n == 0:
            continue
        cos = round(sum(a * b for a, b in zip(v, query_vec)) / (n * qn), 6)
        scored.append((-cos, r["vec_id"]))
    return [(vid, -negcos) for negcos, vid in sorted(scored)[:k]]


def test_full_probe_equals_brute_force(spark, engine):
    emb = _emb(spark)
    n = engine.build_vector_index(emb, n_cells=4)
    assert n == emb.count()
    q = [float(x) for x in emb.filter(F.col("vec_id") == 3).first()["embedding"]]
    got = engine.vector_search(q, k=5, nprobe=4).collect()
    want = _brute_topk(emb.collect(), q, 5)
    assert [(r["vec_id"], r["score"]) for r in got] == want


def test_probe_reads_only_probed_cells(spark, engine):
    emb = _emb(spark)
    engine.build_vector_index(emb, n_cells=4)
    q = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    out = engine.vector_search(q, k=5, nprobe=1)
    # partition pruning: the cid predicate must land in the scan's
    # PartitionFilters (inputFiles() lists the relation UNPRUNED, so
    # the plan is the only honest witness)
    plan = plan_of(out)
    part_lines = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert part_lines and "cid" in part_lines[0], plan[:2000]
    # and the probed cell count is what nprobe asked for
    n_cells_scanned = out.select("cid").distinct().count()
    assert n_cells_scanned <= 1


def test_incremental_append_found_by_search(spark, engine):
    emb = _emb(spark)
    engine.build_vector_index(emb.filter(F.col("vec_id") < 50), n_cells=4)
    newbie = emb.filter(F.col("vec_id") == 60)
    assert engine.add_to_vector_index(newbie) == 1
    q = [float(x) for x in newbie.first()["embedding"]]
    top = engine.vector_search(q, k=1, nprobe=4).first()
    assert top["vec_id"] == 60  # its own best match is itself
    assert top["score"] == pytest.approx(1.0, abs=1e-5)


def test_zero_norm_query_refused(spark, engine):
    engine.build_vector_index(_emb(spark), n_cells=2)
    with pytest.raises(ValueError, match="zero-norm"):
        engine.vector_search([0.0] * 64)


def test_nprobe_must_be_positive(spark, engine):
    engine.build_vector_index(_emb(spark), n_cells=2)
    with pytest.raises(ValueError, match="nprobe"):
        engine.vector_search([1.0] * 64, nprobe=0)


def test_rebuild_publishes_atomically_and_vacuum_gcs_old_version(spark, engine):
    emb = _emb(spark)
    engine.build_vector_index(emb, n_cells=2)
    v1 = engine._vector_current("default")
    engine.build_vector_index(emb, n_cells=4)
    v2 = engine._vector_current("default")
    assert v1 != v2
    import pathlib

    # reader grace: the swap must NOT delete the superseded version —
    # a lazy DataFrame resolved against it may still be scanning
    assert pathlib.Path(v1).exists()
    reclaimed = engine.vacuum_vector_index(grace_seconds=0)
    assert str(v1) in [str(pathlib.Path(p)) for p in reclaimed]
    assert not pathlib.Path(v1).exists()  # explicit vacuum reclaims it
    assert pathlib.Path(v2).exists()  # never the live version
    # the live version is self-consistent: cells' cids == codebook cids
    cells_cids = {
        r["cid"]
        for r in spark.read.parquet(f"{v2}/cells").select("cid").distinct().collect()
    }
    cb_cids = {
        r["cid"] for r in spark.read.parquet(f"{v2}/codebook").collect()
    }
    assert cells_cids <= cb_cids and len(cb_cids) == 4


def test_search_before_build_fails_loudly(spark, engine):
    with pytest.raises(FileNotFoundError, match="no vector index"):
        engine.vector_search([1.0] * 64)


def test_remote_root_refused(spark):
    from serverless_datalake_aws_spark.engine import DataLakeEngine

    eng = DataLakeEngine(spark, "s3a://bucket/lake")
    with pytest.raises(NotImplementedError, match="conditional-PUT"):
        eng.build_vector_index(_emb(spark))


def test_crashed_rebuild_leaves_previous_version_live(spark, engine):
    """A rebuild that dies after writing its version dir but BEFORE the
    pointer swap must leave the old index fully serving (the reason the
    publish is pointer-based at all)."""
    import json
    import pathlib
    import uuid

    emb = _emb(spark)
    engine.build_vector_index(emb, n_cells=2)
    v1 = engine._vector_current("default")
    ptr = pathlib.Path(engine.vector_index_path("default"), "_LATEST")
    before = json.loads(ptr.read_text())
    # simulate the crash window: an orphan version dir with data but no
    # pointer swap (exactly what a killed build_vector_index leaves)
    orphan = pathlib.Path(
        engine.vector_index_path("default"), f"v-{uuid.uuid4().hex[:12]}"
    )
    (orphan / "cells").mkdir(parents=True)
    assert json.loads(ptr.read_text()) == before  # pointer untouched
    assert engine._vector_current("default") == v1
    q = [float(x) for x in emb.first()["embedding"]]
    assert engine.vector_search(q, k=3, nprobe=2).count() == 3


def test_reader_survives_rebuild(spark, engine):
    """A DataFrame planned against the old version must still collect
    after a rebuild publishes a new one (the Delta VACUUM-retention
    rationale): GC is grace-based, not an immediate delete at swap."""
    emb = _emb(spark)
    engine.build_vector_index(emb, n_cells=2)
    q = [float(x) for x in emb.first()["embedding"]]
    old_reader = engine.vector_search(q, k=3, nprobe=2)  # lazy, old version
    engine.build_vector_index(emb, n_cells=4)  # swap + grace sweep
    assert old_reader.count() == 3  # old files still on disk


def _age_tree(p, seconds_ago):
    """Force every mtime under p (and p itself) into the past."""
    import os
    import time

    old = time.time() - seconds_ago
    targets = [str(p)]
    for dirpath, _dirs, files in os.walk(p):
        targets.append(dirpath)
        targets.extend(os.path.join(dirpath, f) for f in files)
    for t in targets:
        os.utime(t, (old, old))


def test_vacuum_honors_grace_and_sweeps_orphans(spark, engine):
    """vacuum reclaims long-dead unreferenced version dirs and stale
    pointer temps, but leaves anything younger than the FIXED grace —
    a fresh un-tombstoned v-* dir may be a publisher inside its
    rename→pointer-swap window, so the per-call grace (even 0) never
    applies to it (r11 review: rename-window finding)."""
    import pathlib
    import uuid

    emb = _emb(spark)
    engine.build_vector_index(emb, n_cells=2)
    root = pathlib.Path(engine.vector_index_path("default"))
    orphan = root / f"v-{uuid.uuid4().hex[:12]}"
    (orphan / "cells").mkdir(parents=True)
    (orphan / "cells" / "part-0.parquet").write_bytes(b"x")
    stale_tmp = root / "._LATEST.deadbeef"
    stale_tmp.write_text("{}")
    # fresh: both survive ANY per-call grace, including 0 (the orphan
    # may be a build about to publish its pointer)
    assert engine.vacuum_vector_index(grace_seconds=3600) == []
    assert engine.vacuum_vector_index(grace_seconds=0) == []
    assert orphan.exists() and stale_tmp.exists()
    # past the fixed grace: both reclaimed, live version untouched
    _age_tree(orphan, engine.VECTOR_GC_GRACE + 60)
    _age_tree(stale_tmp, engine.VECTOR_GC_GRACE + 60)
    reclaimed = {pathlib.Path(p).name for p in engine.vacuum_vector_index(grace_seconds=0)}
    assert reclaimed == {orphan.name, stale_tmp.name}
    assert not orphan.exists() and not stale_tmp.exists()
    assert pathlib.Path(engine._vector_current("default")).exists()


def test_concurrent_vacuums_reclaim_exactly_once_without_error(spark, engine):
    """VERDICT r10 #5: two vacuums racing over the same aged debris
    must neither raise (stat/unlink/rmtree all tolerate losing the
    race) nor corrupt the live version; together they reclaim
    everything exactly once-or-more (idempotent union)."""
    import pathlib
    import threading
    import uuid

    emb = _emb(spark)
    engine.build_vector_index(emb, n_cells=2)
    root = pathlib.Path(engine.vector_index_path("default"))
    debris = []
    for _ in range(6):
        orphan = root / f"v-{uuid.uuid4().hex[:12]}"
        (orphan / "cells").mkdir(parents=True)
        for j in range(20):
            (orphan / "cells" / f"part-{j}.parquet").write_bytes(b"x" * 256)
        _age_tree(orphan, engine.VECTOR_GC_GRACE + 60)
        debris.append(orphan)
    errors, results = [], []

    def _run():
        try:
            results.append(engine.vacuum_vector_index(grace_seconds=0))
        except Exception as exc:  # noqa: BLE001 — the assertion target
            errors.append(exc)

    threads = [threading.Thread(target=_run) for _ in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errors == []
    assert all(not d.exists() for d in debris)
    assert pathlib.Path(engine._vector_current("default")).exists()
    # a search still works after the race
    assert engine.vector_search([1.0] * 8, k=1).count() >= 0


def test_zero_grace_vacuum_spares_publish_window_dir(spark, engine):
    """A renamed-but-not-yet-pointed v-* dir (the publisher is between
    os.rename and the _LATEST swap) must survive vacuum(grace=0): the
    simulated window dir has fresh mtimes and no tombstone."""
    import pathlib
    import uuid

    emb = _emb(spark)
    engine.build_vector_index(emb, n_cells=2)
    root = pathlib.Path(engine.vector_index_path("default"))
    window = root / f"v-{uuid.uuid4().hex[:12]}"
    (window / "cells").mkdir(parents=True)
    (window / "cells" / "part-0.parquet").write_bytes(b"x")
    assert engine.vacuum_vector_index(grace_seconds=0) == []
    assert window.exists()
    assert pathlib.Path(engine._vector_current("default")).exists()


def test_batch_search_rejects_duplicate_query_ids(spark, engine):
    emb = _emb(spark)
    engine.build_vector_index(emb, n_cells=2)
    q = [float(x) for x in emb.first()["embedding"]]
    with pytest.raises(ValueError, match="duplicate query_id"):
        engine.vector_search_batch([(1, q), (1, q)], k=2)


def test_batch_search_matches_per_query_search(spark, engine):
    """vector_search_batch must reproduce vector_search row-for-row per
    query — one job, same cell routing, scoring, and order."""
    emb = _emb(spark)
    engine.build_vector_index(emb, n_cells=4)
    queries = [
        (r["vec_id"], [float(x) for x in r["embedding"]])
        for r in emb.filter(F.col("vec_id") < 4).collect()
    ]
    batch = {
        (r["query_id"], r["rk"]): (r["vec_id"], r["score"])
        for r in engine.vector_search_batch(queries, k=3, nprobe=2).collect()
    }
    for qid, qv in queries:
        per = engine.vector_search(qv, k=3, nprobe=2).collect()
        for i, r in enumerate(per, start=1):
            assert batch[(qid, i)] == (r["vec_id"], r["score"])
    with pytest.raises(ValueError, match="empty"):
        engine.vector_search_batch([])
    with pytest.raises(ValueError, match="query_id=9"):
        engine.vector_search_batch([(9, [0.0] * 64)])


def test_grace_counts_from_supersession_not_last_write(spark, engine):
    """A version superseded long after its last write must still get
    the full reader-grace window: the vacuum clock starts at the
    pointer swap (the .superseded tombstone), not at the dir's newest
    mtime — otherwise rebuilding an old index deletes the previous
    version instantly, under any reader still scanning it."""
    import os
    import pathlib
    import time

    emb = _emb(spark)
    engine.build_vector_index(emb, n_cells=2)
    v1 = pathlib.Path(engine._vector_current("default"))
    # age the version far past the grace window (a long-lived index)
    old = time.time() - 2 * engine.VECTOR_GC_GRACE
    for dirpath, _dirs, files in os.walk(v1):
        os.utime(dirpath, (old, old))
        for f in files:
            os.utime(os.path.join(dirpath, f), (old, old))
    os.utime(v1, (old, old))
    engine.build_vector_index(emb, n_cells=4)  # swap + auto-vacuum
    assert v1.exists()  # tombstone is fresh: full grace from NOW
    tomb = v1.parent / f".superseded.{v1.name}"
    assert tomb.exists()
    # explicit vacuum past grace reclaims dir AND tombstone
    engine.vacuum_vector_index(grace_seconds=0)
    assert not v1.exists() and not tomb.exists()


def test_vacuum_zero_grace_spares_inflight_staging_dir(spark, engine):
    """ADVICE r10: builds stage under `.staging-v-*` and rename to
    `v-*` at publish, so vacuum(grace_seconds=0) racing an in-flight
    build must NOT rmtree its half-written staging dir; crashed
    staging debris is reclaimed only past the fixed VECTOR_GC_GRACE."""
    import os
    import pathlib
    import time
    import uuid

    emb = _emb(spark)
    engine.build_vector_index(emb, n_cells=2)
    root = pathlib.Path(engine.vector_index_path("default"))
    # no staging dir survives a successful build
    assert not [p for p in root.iterdir() if p.name.startswith(".staging-")]

    # simulate a concurrent build mid-write: fresh mtimes
    live = root / f".staging-v-{uuid.uuid4().hex[:12]}"
    (live / "cells").mkdir(parents=True)
    (live / "cells" / "part-0.parquet").write_bytes(b"x")
    assert engine.vacuum_vector_index(grace_seconds=0) == []
    assert live.exists()

    # crashed build long dead: every mtime past the fixed grace
    old = time.time() - engine.VECTOR_GC_GRACE - 60
    for dirpath, _dirs, files in os.walk(live):
        os.utime(dirpath, (old, old))
        for f in files:
            os.utime(os.path.join(dirpath, f), (old, old))
    reclaimed = {pathlib.Path(p).name for p in engine.vacuum_vector_index(grace_seconds=0)}
    assert reclaimed == {live.name}
    assert not live.exists()
    # the published version is untouched throughout
    assert pathlib.Path(engine._vector_current("default")).exists()
