"""k-center coreset: broadcast selected-set generalization (r8 verdict #5).

The r8 form inlined every selected vector as O(k*dim) literal expressions
per round, capping k in the hundreds via plan bloat. The rewrite joins a
broadcast 1-row array-of-arrays instead; these tests pin (a) correctness
against an independent numpy greedy reference at k far beyond the
registered row's 5, and (b) that the round expression's analyzed size
stays FLAT as the selected set grows.
"""
from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


def _corpus(spark, n=60, dim=8, seed=7):
    rng = np.random.RandomState(seed)
    vecs = rng.uniform(-1, 1, size=(n, dim)).astype(np.float32)
    rows = [(int(i), [float(x) for x in vecs[i]]) for i in range(n)]
    return vecs.astype(np.float64), spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>")


def _numpy_kcenter(vecs, k, seed_id=0):
    sel = [seed_id]
    out = [(0, seed_id, 0.0)]
    d2 = ((vecs - vecs[seed_id]) ** 2).sum(axis=1)
    for rnd in range(1, k):
        d2[sel] = -np.inf
        # argmax with vec_id tie-break = first occurrence of the max
        pick = int(np.argmax(d2))
        out.append((rnd, pick, float(d2[pick])))
        sel.append(pick)
        d2 = np.minimum(d2, ((vecs - vecs[pick]) ** 2).sum(axis=1))
    return out


def test_kcenter_k20_matches_numpy_reference(spark):
    from spark_streaming_dis_plugin_spark.operators.similarity import (
        _kcenter_select,
    )

    vecs, emb = _corpus(spark)
    got = _kcenter_select(spark, emb, k=20, seed_id=0)
    want = _numpy_kcenter(vecs, k=20)
    assert [(r, v) for r, v, _ in got] == [(r, v) for r, v, _ in want]
    for (_, _, gd2), (_, _, wd2) in zip(got[1:], want[1:]):
        # the kernel rounds d2 to 6 digits (HALF_UP) on emit
        assert gd2 == pytest.approx(wd2, abs=5.1e-07)


def test_kcenter_round_plan_size_flat_in_k(spark):
    """The per-round scoring plan must not grow with the selected-set
    size: selected vectors ride in as a broadcast relation, never as
    inlined literals. Compare the analyzed round expression at |sel|=2
    vs |sel|=40 — the r8 literal form grew ~O(k*dim) string size."""
    from spark_streaming_dis_plugin_spark.operators.similarity import _l2sq

    _, emb = _corpus(spark)

    def round_plan_len(n_sel):
        sel_rows = [(int(i), [float(j) for j in range(8)])
                    for i in range(n_sel)]
        sel_df = spark.createDataFrame(
            sel_rows, "sel_id bigint, semb array<double>")
        cand = emb.join(F.broadcast(sel_df.select(
            F.col("sel_id").alias("vec_id"))), "vec_id", "left_anti")
        sels_one = sel_df.agg(F.collect_list("semb").alias("sels"))
        min_d2 = F.array_min(F.transform(
            F.col("sels"), lambda v: _l2sq(F.col("embedding"), v)))
        scored = (cand.join(F.broadcast(sels_one))
                  .select("vec_id", min_d2.alias("d2")))
        return len(scored._jdf.queryExecution().analyzed().toString())

    small, big = round_plan_len(2), round_plan_len(40)
    assert big <= small + 64     # flat up to cosmetic id-width noise
