"""Round-10 operator tests: pattern-sequence contiguity semantics,
lag-1 ACF edge cases, leakage-safe split invariant, power-iteration
numpy parity, and the streaming CUSUM gate's register math."""
from __future__ import annotations

import datetime
import math
import os

import pandas as pd
import pytest

from spark_streaming_dis_plugin_spark.operators.connector import (
    ACF_MIN_PAIRS,
    events_autocorrelation,
    events_pattern_sequence,
)


def _mk_events(tmp_path, rows) -> str:
    pdf = pd.DataFrame(
        [{"event_id": eid,
          "ts": datetime.datetime(2024, 1, 1)
          + datetime.timedelta(seconds=eid),
          "user_id": uid, "event_type": et, "value": val, "props": "{}"}
         for eid, uid, et, val in rows])
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    pdf.to_parquet(os.path.join(str(tmp_path), "events.parquet"),
                   index=False)
    return str(tmp_path)


def test_pattern_sequence_contiguity_and_overlap(spark, tmp_path):
    rows = []
    eid = 0

    def add(uid, *types):
        nonlocal eid
        for t in types:
            rows.append((eid, uid, t, 1.0))
            eid += 1

    # user 1: one clean match
    add(1, "view", "click", "purchase")
    # user 2: an intervening event breaks contiguity -> no match
    add(2, "view", "click", "error", "purchase")
    # user 3: two overlapping-ish matches back to back
    add(3, "view", "click", "purchase", "view", "click", "purchase")
    # user 4: prefix only
    add(4, "view", "click")
    sf = _mk_events(tmp_path, rows)
    got = {r["user_id"]: r["n_matches"]
           for r in events_pattern_sequence(spark, sf).collect()}
    assert got == {1: 1, 3: 2}


def test_autocorrelation_edges(spark, tmp_path):
    rows = []
    eid = 0
    # user 1: perfect alternation -> acf1 == -1 exactly
    for i in range(12):
        rows.append((eid, 1, "t", 5.0 if i % 2 == 0 else -5.0))
        eid += 1
    # user 2: constant series -> zero variance, excluded
    for i in range(10):
        rows.append((eid, 2, "t", 7.0))
        eid += 1
    # user 3: too few pairs, excluded
    for i in range(ACF_MIN_PAIRS):
        rows.append((eid, 3, "t", float(i)))
        eid += 1
    sf = _mk_events(tmp_path, rows)
    got = {r["user_id"]: r for r in
           events_autocorrelation(spark, sf).collect()}
    assert set(got) == {1}
    assert got[1]["acf1"] == -1.0
    assert got[1]["n_pairs"] == 11


def test_leakage_safe_split_keeps_components_together(spark, sf_dir):
    """The invariant the row exists for: every near-dup component lands
    entirely inside one split — including at least one REAL multi-doc
    component from the fixture (vacuous truth guard)."""
    from pyspark.sql import functions as F

    from spark_streaming_dis_plugin_spark.functions.portable import (
        portable_hash,
    )
    from spark_streaming_dis_plugin_spark.operators.dedup import (
        _jaccard_pairs,
        _min_label_components,
    )
    from spark_streaming_dis_plugin_spark.tables import load

    docs = load(spark, sf_dir, "documents")
    pairs = _jaccard_pairs(docs).select("doc_a", "doc_b")
    comp = (_min_label_components(pairs)
            .select("doc_id", F.col("label").alias("component")))
    labeled = (docs.select("doc_id")
               .join(comp, "doc_id", "left")
               .select("doc_id",
                       F.coalesce("component", "doc_id").alias("component")))
    h = portable_hash(F.concat(F.lit("gsplit:"),
                               F.col("component").cast("string"))) % 100
    split = (F.when(h < 80, "train").when(h < 90, "val").otherwise("test"))
    per_comp = (labeled.select("component", split.alias("split"))
                .groupBy("component")
                .agg(F.countDistinct("split").alias("n_splits"),
                     F.count(F.lit(1)).alias("n_docs")))
    assert per_comp.where(F.col("n_splits") > 1).count() == 0
    assert per_comp.where(F.col("n_docs") >= 2).count() > 0


def test_power_iteration_numpy_parity(spark, sf_dir):
    """The Spark result tracks an un-snapped numpy replica of the same
    two iterations (the decimal snaps perturb at ~1e-8), is unit-norm,
    and the eigenvalue estimate is sandwiched by Rayleigh bounds."""
    import numpy as np

    from spark_streaming_dis_plugin_spark.operators.similarity import (
        DIM,
        EIG_V0,
        embedding_power_iteration,
    )
    from spark_streaming_dis_plugin_spark.tables import load

    emb = load(spark, sf_dir, "embeddings")
    A = np.array([r["embedding"] for r in emb.collect()], dtype=np.float64)
    v = np.full(DIM, EIG_V0)
    lam_ref = 0.0
    for _ in range(2):
        w = A.T @ (A @ v)
        lam_ref = float(np.linalg.norm(w))    # ||A^T A v|| of the last pass
        v = w / np.linalg.norm(w)

    rows = sorted(embedding_power_iteration(spark, sf_dir).collect(),
                  key=lambda r: r["dim"])
    got = np.array([r["loading"] for r in rows])
    eig = rows[0]["eigval"]
    assert len(rows) == DIM
    assert math.isclose(float(np.linalg.norm(got)), 1.0, rel_tol=1e-7)
    assert float(np.abs(got @ v)) > 0.999999
    # the estimate is ||A^T A v1|| with v1 the ITERATION-1 vector
    assert eig == pytest.approx(lam_ref, rel=0.05)
    assert eig > 0
    # spectral norm bounded by Frobenius norm squared
    assert eig <= float((A * A).sum()) + 1e-6


def test_cusum_gate_registers_match_batch_semantics():
    """The streaming gate's running-mean registers replayed in pure
    Python equal a brute-force online CUSUM on the same sequence."""
    vals = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0]
    cnt = s = sp = sn = mp = mn = 0.0
    for v in vals:
        cnt += 1.0
        s += v
        d = v - s / cnt
        sp = max(0.0, sp + d)
        sn = min(0.0, sn + d)
        mp = max(mp, sp)
        mn = min(mn, sn)
    # brute force: recompute prefix means independently
    sp2 = sn2 = mp2 = mn2 = 0.0
    for i, v in enumerate(vals):
        mu = sum(vals[:i + 1]) / (i + 1)
        sp2 = max(0.0, sp2 + (v - mu))
        sn2 = min(0.0, sn2 + (v - mu))
        mp2 = max(mp2, sp2)
        mn2 = min(mn2, sn2)
    assert (mp, mn) == pytest.approx((mp2, mn2), rel=1e-12)
    assert mp > 0 and mn < 0
