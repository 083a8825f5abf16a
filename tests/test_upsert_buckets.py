"""Upsert view: bucket-count parameterization + touched-bucket pruning
(r8 verdict #6). A micro-batch whose keys hash into one bucket must
rewrite exactly that bucket directory; every other bucket's files survive
the commit byte-for-byte (same paths, same mtimes) — the directory-pruned
dynamic-partition-overwrite contract the 100 TB story rests on.
"""
from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


def _bucket_of(spark, key: str, n_buckets: int) -> int:
    return spark.range(1).select(
        F.pmod(F.xxhash64(F.lit(key)), F.lit(n_buckets))).collect()[0][0]


def _files(view: str, bucket: int) -> dict[str, float]:
    d = os.path.join(view, f"bucket={bucket}")
    return {f: os.path.getmtime(os.path.join(d, f))
            for f in sorted(os.listdir(d)) if f.endswith(".parquet")}


def test_single_bucket_batch_rewrites_exactly_one_bucket(spark, tmp_path):
    from spark_streaming_dis_plugin_spark.operators.connector import (
        upsert_view_batch,
    )

    n = 16     # parameterized: not the registered row's default of 8
    view = str(tmp_path / "view")

    # keys engineered onto distinct buckets
    keys = [f"k{i}" for i in range(40)]
    by_bucket: dict[int, list[str]] = {}
    for k in keys:
        by_bucket.setdefault(_bucket_of(spark, k, n), []).append(k)
    buckets = sorted(b for b, ks in by_bucket.items() if ks)
    assert len(buckets) >= 3
    b_touch, b_keep = buckets[0], buckets[1]

    batch1 = spark.createDataFrame(
        [(k, f"v0_{k}", i) for i, k in enumerate(keys)],
        "key string, value string, offset bigint")
    touched1 = upsert_view_batch(batch1, view, n)
    assert touched1 == buckets

    keep_before = {b: _files(view, b) for b in buckets if b != b_touch}
    touch_before = _files(view, b_touch)

    # batch 2: only keys of ONE bucket, with higher offsets
    k2 = by_bucket[b_touch][0]
    batch2 = spark.createDataFrame(
        [(k2, "v1", 1000)], "key string, value string, offset bigint")
    touched2 = upsert_view_batch(batch2, view, n)
    assert touched2 == [b_touch]

    # untouched buckets: identical file lists AND mtimes
    for b in keep_before:
        assert _files(view, b) == keep_before[b], b
    # the touched bucket really was rewritten
    assert _files(view, b_touch) != touch_before

    # and the merge semantics held: updated key carries the new value,
    # a same-bucket sibling key survives untouched
    rows = {r["key"]: (r["last_value"], r["last_offset"])
            for r in spark.read.parquet(view).collect()}
    assert rows[k2] == ("v1", 1000)
    assert len(rows) == len(keys)
    other_same_bucket = [k for k in by_bucket[b_touch] if k != k2]
    for k in other_same_bucket:
        assert rows[k][0] == f"v0_{k}"
    keep_key = by_bucket[b_keep][0]
    assert rows[keep_key][0] == f"v0_{keep_key}"


def test_replayed_batch_is_idempotent(spark, tmp_path):
    from spark_streaming_dis_plugin_spark.operators.connector import (
        upsert_view_batch,
    )

    view = str(tmp_path / "view2")
    batch = spark.createDataFrame(
        [("a", "v1", 1), ("a", "v2", 2), ("b", "w1", 5)],
        "key string, value string, offset bigint")
    upsert_view_batch(batch, view, 4)
    first = sorted((r["key"], r["last_value"], r["last_offset"])
                   for r in spark.read.parquet(view).collect())
    upsert_view_batch(batch, view, 4)      # at-least-once replay
    again = sorted((r["key"], r["last_value"], r["last_offset"])
                   for r in spark.read.parquet(view).collect())
    assert first == again == [("a", "v2", 2), ("b", "w1", 5)]
