"""Multi-writer ANN index manifest (r12 verdict #3).

The pre-r13 retrain swap (rmtree + os.replace x3 dirs) was atomic
per-dir but not across centroids/inverted/sizes — safe only because
every reader shared one serialized foreachBatch chain. At 100 TB,
retrain and serving ARE separate jobs, so the index now commits like a
table format snapshot: a complete new generation lands under
``gen=<n>/`` (staged invisible, renamed complete-or-not-at-all), then a
single atomic ``MANIFEST.json`` replace flips the live pointer; readers
resolve the manifest once per operation and superseded generations are
GC'd only after a grace window.

The stress test here runs the REAL retrain (ivf_maybe_retrain, gate and
all) in this process while a second PROCESS (pure pyarrow, no Spark —
exactly the "separate serving job" shape) hammers resolve+read and
checks every read for torn or mixed-generation state.
"""
from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

import pytest
from pyspark.sql import functions as F  # noqa: F401  (spark fixture dep)

from spark_streaming_dis_plugin_spark.operators.similarity import (
    _ivf_ingest_batch,
    _ivf_search_prebuilt,
    ivf_gc_generations,
    ivf_manifest,
    ivf_maybe_retrain,
    ivf_resolve_live,
    DIM,
)

from .test_ivf_retrain import _vec, _write_index


def _build_base(spark, root):
    """Balanced 3-cluster base index in the legacy flat layout —
    pre-manifest indexes must keep resolving (back-compat)."""
    cent = [(0, _vec([0.0, 0.0])), (1, _vec([10.0, 10.0])),
            (2, _vec([-10.0, -10.0]))]
    base = [(1, _vec([0.5, 0.0]), 0), (2, _vec([0.0, 0.5]), 0),
            (5, _vec([10.0, 9.5]), 1), (6, _vec([9.5, 10.0]), 1),
            (8, _vec([-10.0, -9.5]), 2), (9, _vec([-9.5, -10.0]), 2)]
    _write_index(spark, root, cent, base)
    return spark.createDataFrame(cent, "centroid_id int, ce array<double>")


def test_legacy_flat_layout_resolves_to_root(tmp_path):
    assert ivf_manifest(str(tmp_path)) is None
    assert ivf_resolve_live(str(tmp_path)) == str(tmp_path)


def test_retrain_publishes_generation_and_flips_pointer(spark, tmp_path):
    root = str(tmp_path / "ivf")
    cent = _build_base(spark, root)
    drift = spark.createDataFrame(
        [(300 + i, _vec([4.0 + 0.125 * i, 3.0])) for i in range(12)],
        "vec_id bigint, e array<double>")
    _ivf_ingest_batch(drift, cent, root, batch_id=0)

    assert ivf_maybe_retrain(spark, root) is True
    m = ivf_manifest(root)
    assert m is not None and m["live"] == 1 and m["flipped_ms"] > 0
    live = ivf_resolve_live(root)
    assert live == f"{root}/gen=1"
    for sub in ("centroids", "inverted", "sizes"):
        assert os.path.isdir(f"{live}/{sub}")
    # legacy flat dirs still present inside the grace window (a reader
    # that resolved pre-flip may still be scanning them)
    assert os.path.isdir(f"{root}/inverted")
    # no stage orphans left behind by a successful publish
    assert [n for n in os.listdir(root) if n.startswith(".gen-stage-")] == []

    # a second drift+retrain round goes to gen=2; pointer is monotonic
    cent1 = spark.read.parquet(f"{live}/centroids")
    drift2 = spark.createDataFrame(
        [(400 + i, _vec([4.0, 2.0 + 0.125 * i])) for i in range(12)],
        "vec_id bigint, e array<double>")
    _ivf_ingest_batch(drift2, cent1, root, batch_id=1)
    assert ivf_maybe_retrain(spark, root, skew_threshold=1.0) is True
    assert ivf_manifest(root)["live"] == 2
    # search serves the live generation without being told about gens
    assert _ivf_search_prebuilt(spark, "unused", n_probe=1,
                                root=root).count() > 0


def test_gc_respects_grace_then_collects(spark, tmp_path):
    root = str(tmp_path / "ivf")
    cent = _build_base(spark, root)
    drift = spark.createDataFrame(
        [(300 + i, _vec([4.0 + 0.125 * i, 3.0])) for i in range(12)],
        "vec_id bigint, e array<double>")
    _ivf_ingest_batch(drift, cent, root, batch_id=0)
    assert ivf_maybe_retrain(spark, root) is True
    # orphan stage dir from a hypothetical crashed retrain
    os.makedirs(f"{root}/.gen-stage-deadbeef")

    # inside the grace window nothing is collected
    assert ivf_gc_generations(root, grace_seconds=3600) == 0
    assert os.path.isdir(f"{root}/inverted")

    # after the window: legacy flat dirs + orphan stage go, live stays
    removed = ivf_gc_generations(root, grace_seconds=0)
    assert removed == 4  # centroids, inverted, sizes, .gen-stage orphan
    assert not os.path.isdir(f"{root}/inverted")
    assert not os.path.isdir(f"{root}/.gen-stage-deadbeef")
    assert os.path.isdir(f"{root}/gen=1/inverted")
    # resolution and search still work post-GC
    assert ivf_resolve_live(root) == f"{root}/gen=1"
    assert _ivf_search_prebuilt(spark, "unused", n_probe=1,
                                root=root).count() > 0


def test_crashed_prepublished_generation_is_skipped(spark, tmp_path):
    """A retrain that renamed its generation dir but crashed before the
    manifest flip leaves a complete-but-unreferenced gen; the next
    retrain must publish to the next free slot, never into it."""
    root = str(tmp_path / "ivf")
    cent = _build_base(spark, root)
    os.makedirs(f"{root}/gen=1")        # the crashed publish
    with open(f"{root}/gen=1/marker", "w") as f:
        f.write("crashed")
    drift = spark.createDataFrame(
        [(300 + i, _vec([4.0 + 0.125 * i, 3.0])) for i in range(12)],
        "vec_id bigint, e array<double>")
    _ivf_ingest_batch(drift, cent, root, batch_id=0)
    assert ivf_maybe_retrain(spark, root) is True
    m = ivf_manifest(root)
    assert m["live"] == 2               # skipped the occupied slot
    assert os.path.exists(f"{root}/gen=1/marker")  # untouched (GC's job)


# ------------------------------------------------------------------ stress

def _reader_proc(root: str, stop_path: str, q) -> None:
    """Serving-job stand-in: resolve the manifest once per pass, read the
    resolved generation's COMMITTED content with pyarrow (no Spark), and
    verify the invariants a torn or mixed-generation read would break:
      - centroids + inverted/src=base + sizes/src=base all present and
        every parquet file parseable;
      - sum(sizes/src=base.n) == rowcount(inverted/src=base) (both are
        written by the same generation publish — a cross-generation mix
        almost surely differs, since every stress round grows the
        corpus);
      - inverted.cluster set ⊆ centroids.centroid_id set;
      - the live pointer only moves forward.
    ``src=b*`` ingest dirs are deliberately NOT validated: per-batch
    ingest is the live foreachBatch chain's own at-least-once write,
    idempotent but visible mid-write to that chain only — the manifest's
    atomicity contract is the GENERATION COMMIT (what a separate serving
    job reads after a retrain), which is exactly centroids + src=base +
    sizes/src=base."""
    import glob

    import pyarrow.parquet as pq

    ok = torn = 0
    last_gen = -1
    gens_seen = set()
    try:
        while not os.path.exists(stop_path):
            try:
                with open(os.path.join(root, "MANIFEST.json")) as f:
                    m = json.load(f)
                gen = m["live"]
            except FileNotFoundError:
                gen = None          # legacy window before first retrain
            live = root if gen is None else os.path.join(root, f"gen={gen}")
            if gen is not None:
                if gen < last_gen:
                    torn += 1
                    continue
                last_gen = gen
                gens_seen.add(gen)

            def read_all(sub):
                files = sorted(glob.glob(
                    os.path.join(live, sub, "**", "*.parquet"),
                    recursive=True))
                return [pq.read_table(p) for p in files]

            try:
                cents = read_all("centroids")
                invs = read_all("inverted/src=base")
                sizes = read_all("sizes/src=base")
                cent_ids = {c for t in cents
                            for c in t.column("centroid_id").to_pylist()}
                inv_clusters = {c for t in invs
                                for c in t.column("cluster").to_pylist()}
                inv_rows = sum(t.num_rows for t in invs)
                size_total = sum(sum(t.column("n").to_pylist())
                                 for t in sizes)
                if (not cent_ids or inv_rows == 0
                        or not inv_clusters <= cent_ids
                        or size_total != inv_rows):
                    torn += 1
                else:
                    ok += 1
            except Exception:
                torn += 1
            time.sleep(0.01)
    finally:
        q.put((ok, torn, sorted(gens_seen)))


@pytest.mark.timeout(600)
def test_concurrent_reader_never_sees_torn_generation(spark, tmp_path):
    """r12 verdict #3's done-gate: real retrains in this process, a real
    second OS process reading concurrently, zero torn/mixed reads."""
    root = str(tmp_path / "ivf")
    stop_path = str(tmp_path / "stop")
    cent0 = _build_base(spark, root)

    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    reader = ctx.Process(target=_reader_proc, args=(root, stop_path, q))
    reader.start()
    try:
        cent = cent0
        for rnd in range(4):
            # each round piles drift into cluster 0 so the gate re-trips;
            # corpus grows every round, making generations distinguishable
            drift = spark.createDataFrame(
                [(1000 * (rnd + 1) + i,
                  _vec([4.0 + 0.125 * i, 3.0 + 0.2 * rnd]))
                 for i in range(12)],
                "vec_id bigint, e array<double>")
            _ivf_ingest_batch(drift, cent, root, batch_id=rnd)
            assert ivf_maybe_retrain(spark, root, skew_threshold=1.0) \
                is True
            cent = spark.read.parquet(
                f"{ivf_resolve_live(root)}/centroids")
        # default-grace GC inside retrain must have kept every
        # generation a concurrent reader could still be scanning
        assert ivf_manifest(root)["live"] == 4
    finally:
        with open(stop_path, "w") as f:
            f.write("stop")
        reader.join(timeout=60)

    ok, torn, gens_seen = q.get(timeout=10)
    assert reader.exitcode == 0
    assert torn == 0, (f"reader observed {torn} torn/mixed-generation "
                       f"reads ({ok} ok; gens {gens_seen})")
    assert ok > 0
    assert len(gens_seen) >= 2, (
        f"stress never observed a flip (gens {gens_seen}) — "
        "reader/writer did not actually overlap")
