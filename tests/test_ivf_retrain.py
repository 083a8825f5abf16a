"""IVF drift repair for the streamed-ingest index (r8 verdict #7).

Pins ivf_maybe_retrain's three contracts:
1. the gate: no retrain while cluster sizes stay balanced; retrain once
   max/median skew exceeds the threshold;
2. the math: retrained centroids are the decimal-exact means of each
   cluster's CURRENT members, and every vector is reassigned to its
   nearest retrained centroid (centroid_id tie-break) — verified against
   an independent Decimal/numpy reference;
3. search consistency: searching the retrained index equals searching an
   index directory REBUILT from the same corpus with the same
   means+reassign step (retrain is pure re-clustering, never a data
   change), and later ingest batches assign against the RETRAINED
   geometry.
"""
from __future__ import annotations

from collections import Counter
from decimal import Decimal

import numpy as np
import pytest
from pyspark.sql import functions as F

from spark_streaming_dis_plugin_spark.operators.similarity import (
    DIM, _ivf_ingest_batch, _ivf_search_prebuilt, ivf_maybe_retrain,
    ivf_resolve_live,
)


def _vec(head, fill=0.0):
    v = [fill] * DIM
    for i, x in enumerate(head):
        v[i] = x
    return v


def _write_index(spark, root, cent_rows, inv_rows, sizes=True):
    spark.createDataFrame(cent_rows, "centroid_id int, ce array<double>") \
        .write.mode("overwrite").parquet(f"{root}/centroids")
    spark.createDataFrame(
        inv_rows, "vec_id bigint, e array<double>, cluster int"
    ).write.mode("overwrite").parquet(f"{root}/inverted/src=base")
    if sizes:
        # every index writer maintains the C-row sizes sidecar (r10
        # verdict #1) — it is part of the index format now
        counts = Counter(c for _v, _e, c in inv_rows)
        spark.createDataFrame(
            sorted(counts.items()), "cluster int, n bigint"
        ).write.mode("overwrite").parquet(f"{root}/sizes/src=base")


def _read_index(spark, root):
    # readers resolve the manifest once per operation (r12 verdict #3);
    # pre-retrain roots have no manifest and resolve to themselves
    live = ivf_resolve_live(root)
    cent = {r["centroid_id"]: list(r["ce"]) for r in
            spark.read.parquet(f"{live}/centroids").collect()}
    inv = {r["vec_id"]: (list(r["e"]), r["cluster"]) for r in
           spark.read.parquet(f"{live}/inverted").collect()}
    return cent, inv


def _expected_retrain(inv):
    """Independent reference: decimal-exact per-cluster means of the
    CURRENT assignment, then nearest-centroid reassignment."""
    by_cluster: dict[int, list[list[float]]] = {}
    for e, c in inv.values():
        by_cluster.setdefault(c, []).append(e)
    cents = {}
    for c, vecs in by_cluster.items():
        n = len(vecs)
        cents[c] = [
            float(sum(Decimal(str(round(Decimal(repr(v[i])), 8)))
                      for v in vecs))  # decimal(27,8) snap, exact sum
            / n
            for i in range(DIM)]
    # NB: the engine casts e[i] to DECIMAL(27,8) (8-digit snap) before
    # summing; fixture values below are 8-decimal-exact so the snap is
    # the identity and the reference stays bit-comparable.
    assign = {}
    for vid, (e, _c) in inv.items():
        best = min(
            ((sum((x - y) ** 2 for x, y in zip(e, cents[c])), c)
             for c in sorted(cents)),
            key=lambda t: (t[0], t[1]))
        assign[vid] = best[1]
    return cents, assign


@pytest.fixture()
def skewed_root(spark, tmp_path):
    """3 clusters, balanced base; ingest piles 12 drifting vectors into
    cluster 0 (sizes 14/2/2, max/median = 7 > 4)."""
    root = str(tmp_path / "ivf")
    cent = [(0, _vec([0.0, 0.0])), (1, _vec([10.0, 10.0])),
            (2, _vec([-10.0, -10.0]))]
    # base ids < N_QUERIES(10) double as the search gate's query set
    base = [(1, _vec([0.5, 0.0]), 0), (2, _vec([0.0, 0.5]), 0),
            (5, _vec([10.0, 9.5]), 1), (6, _vec([9.5, 10.0]), 1),
            (8, _vec([-10.0, -9.5]), 2), (9, _vec([-9.5, -10.0]), 2)]
    _write_index(spark, root, cent, base)
    drift = spark.createDataFrame(
        [(300 + i, _vec([4.0 + 0.125 * i, 3.0]))
         for i in range(12)], "vec_id bigint, e array<double>")
    _ivf_ingest_batch(drift, spark.createDataFrame(
        cent, "centroid_id int, ce array<double>"), root, batch_id=0)
    return root


def test_balanced_index_does_not_retrain(spark, tmp_path):
    root = str(tmp_path / "flat")
    _write_index(spark, root,
                 [(0, _vec([0.0])), (1, _vec([10.0]))],
                 [(1, _vec([0.1]), 0), (2, _vec([0.2]), 0),
                  (3, _vec([9.9]), 1), (4, _vec([9.8]), 1)])
    before = _read_index(spark, root)
    assert ivf_maybe_retrain(spark, root) is False
    assert _read_index(spark, root) == before


def test_retrain_matches_decimal_reference(spark, skewed_root):
    _cent0, inv0 = _read_index(spark, skewed_root)
    want_cents, want_assign = _expected_retrain(inv0)
    assert ivf_maybe_retrain(spark, skewed_root) is True
    cent1, inv1 = _read_index(spark, skewed_root)
    assert set(cent1) == set(want_cents)
    for c in cent1:
        assert cent1[c] == pytest.approx(want_cents[c], abs=1e-12)
    assert {v: c for v, (_e, c) in inv1.items()} == want_assign
    # the drifted mass actually moved the centroid toward itself (one
    # Lloyd step repairs FIT; it does not split clusters — sustained
    # tripping of the gate is the signal to raise C, per the docstring)
    assert cent1[0][0] > 1.0


def test_post_retrain_search_equals_rebuilt_index_search(spark, skewed_root,
                                                         tmp_path):
    _cent0, inv0 = _read_index(spark, skewed_root)
    want_cents, want_assign = _expected_retrain(inv0)
    assert ivf_maybe_retrain(spark, skewed_root) is True

    rebuilt = str(tmp_path / "rebuilt")
    _write_index(
        spark, rebuilt,
        [(c, want_cents[c]) for c in sorted(want_cents)],
        [(vid, inv0[vid][0], want_assign[vid]) for vid in sorted(inv0)])

    def rows(root):
        return sorted(
            (r["query_id"], r["neighbor_id"], r["cos"], r["rnk"])
            for r in _ivf_search_prebuilt(spark, "unused", n_probe=1,
                                          root=root).collect())

    got, want = rows(skewed_root), rows(rebuilt)
    assert got == want and len(got) > 0

    # later ingest assigns against the RETRAINED geometry: a vector at
    # the drift mass's new home lands in cluster 0 only because the
    # centroid moved (it was nearer neither frozen centroid's basin edge)
    cent1 = spark.read.parquet(f"{ivf_resolve_live(skewed_root)}/centroids")
    probe = spark.createDataFrame([(900, _vec([4.5, 3.0]))],
                                  "vec_id bigint, e array<double>")
    _ivf_ingest_batch(probe, cent1, skewed_root, batch_id=1)
    _c, inv2 = _read_index(spark, skewed_root)
    assert inv2[900][1] == 0


def _sidecar_sizes(spark, root):
    from spark_streaming_dis_plugin_spark.operators.similarity import (
        ivf_cluster_sizes,
    )
    return {r["cluster"]: r["n"]
            for r in ivf_cluster_sizes(spark, root).collect()}


def test_probe_reads_sidecar_not_inverted(spark, tmp_path):
    """The r10 verdict's `weak`: the drift probe must price at O(C) by
    reading the sizes sidecar, never by scanning the inverted index.
    Pin it behaviorally: an index whose INVERTED file is wildly skewed
    but whose SIDECAR claims balance must NOT trip the gate — the only
    way that holds is if the probe's input is the sidecar."""
    root = str(tmp_path / "lying")
    cent = [(0, _vec([0.0])), (1, _vec([10.0]))]
    inv = ([(100 + i, _vec([0.1]), 0) for i in range(20)]
           + [(200, _vec([9.9]), 1)])          # true sizes 20/1: skewed
    _write_index(spark, root, cent, inv, sizes=False)
    spark.createDataFrame([(0, 2), (1, 2)], "cluster int, n bigint") \
        .write.mode("overwrite").parquet(f"{root}/sizes/src=base")
    assert ivf_maybe_retrain(spark, root) is False


def test_sidecar_recovery_rebuilds_from_inverted(spark, tmp_path):
    """Restart recovery: with the sidecar ABSENT, the gate rebuilds it
    once from the inverted index (the documented one-time scan), lands
    it under sizes/src=recovered, and then sees the true skew."""
    import os

    root = str(tmp_path / "norebuild")
    cent = [(0, _vec([0.0])), (1, _vec([10.0])), (2, _vec([-10.0]))]
    inv = ([(100 + i, _vec([0.1]), 0) for i in range(20)]
           + [(200, _vec([9.9]), 1), (201, _vec([-9.9]), 2)])
    _write_index(spark, root, cent, inv, sizes=False)
    assert not os.path.isdir(f"{root}/sizes")
    assert _sidecar_sizes(spark, root) == {0: 20, 1: 1, 2: 1}
    assert os.path.isdir(f"{root}/sizes/src=recovered")
    assert ivf_maybe_retrain(spark, root) is True


def test_sidecar_tracks_ingest_and_retrain(spark, skewed_root):
    """The sidecar stays consistent with the index across its whole
    lifecycle: base + ingested batch partials sum to the true sizes,
    and the retrain swap rewrites it to the REASSIGNED sizes."""
    _c, inv0 = _read_index(spark, skewed_root)
    true0 = Counter(c for _e, c in inv0.values())
    assert _sidecar_sizes(spark, skewed_root) == dict(true0)
    assert ivf_maybe_retrain(spark, skewed_root) is True
    _c, inv1 = _read_index(spark, skewed_root)
    true1 = Counter(c for _e, c in inv1.values())
    assert _sidecar_sizes(spark, skewed_root) == dict(true1)
