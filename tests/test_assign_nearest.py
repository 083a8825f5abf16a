"""Focused pins for the r13-optimization rewrite of IVF nearest-centroid
assignment (_assign_nearest): the row-local argmin must reproduce the
window formulation's rnk == 1 slice bit-for-bit — including the
(d2, centroid_id) tie-break — and its plan must carry NO window exchange
(removing the n x C shuffle is the entire point of the rewrite)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _emb(spark, sf_dir):
    from spark_streaming_dis_plugin_spark.tables import load

    return load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("e"))


def test_assign_nearest_matches_window_rank1(spark, sf_dir):
    from spark_streaming_dis_plugin_spark.operators.similarity import (
        N_CENTROIDS, _assign_nearest, _rank_to_centroids)

    emb = _emb(spark, sf_dir)
    cent = (emb.where(F.col("vec_id") < N_CENTROIDS)
            .select(F.col("vec_id").alias("centroid_id"),
                    F.col("e").alias("ce")))
    via_window = sorted(
        (r["vec_id"], r["centroid_id"])
        for r in (_rank_to_centroids(emb, cent).where(F.col("rnk") == 1)
                  .select("vec_id", "centroid_id").collect()))
    via_argmin = sorted(
        (r["vec_id"], r["centroid_id"])
        for r in (_assign_nearest(emb, cent)
                  .select("vec_id", "centroid_id").collect()))
    assert via_argmin == via_window
    assert len(via_argmin) == emb.count()


def test_assign_nearest_tie_breaks_on_centroid_id(spark):
    """Two equidistant centroids: the SMALLER centroid_id must win —
    array_min's struct ordering (d2 first, then centroid_id) has to
    reproduce the window's deterministic orderBy('d2', 'centroid_id')."""
    from spark_streaming_dis_plugin_spark.operators.similarity import (
        _assign_nearest)

    emb = spark.createDataFrame(
        [(100, [0.0, 0.0])], "vec_id long, e array<double>")
    cent = spark.createDataFrame(
        [(7, [1.0, 0.0]), (3, [-1.0, 0.0]), (9, [0.0, 2.0])],
        "centroid_id long, ce array<double>")
    rows = _assign_nearest(emb, cent).collect()
    assert len(rows) == 1 and rows[0]["centroid_id"] == 3


def test_assign_nearest_plan_has_no_window_exchange(spark, sf_dir):
    """The rewrite's contract: assignment is row-local against a one-row
    broadcast centroid array — no Window operator and no hash Exchange of
    the n x C ranked relation anywhere in the assignment plan."""
    from spark_streaming_dis_plugin_spark.operators.similarity import (
        N_CENTROIDS, _assign_nearest)

    emb = _emb(spark, sf_dir)
    cent = (emb.where(F.col("vec_id") < N_CENTROIDS)
            .select(F.col("vec_id").alias("centroid_id"),
                    F.col("e").alias("ce")))
    plan = _assign_nearest(emb, cent)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Window" not in plan
    assert "Exchange hashpartitioning" not in plan
