"""Multimodal column plumbing: binary payloads, Arrow batch shapes, the
mapInPandas decode stub, and flatMap-shaped frame sampling."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_streaming_dis_plugin_spark.operators.multimodal import (
    artifacts, decode,
)


def test_artifacts_schema(spark, sf_dir):
    art = artifacts(spark, sf_dir)
    types = dict(art.dtypes)
    assert types["payload"] == "binary"
    assert types["media_type"] == "string"
    assert types["byte_len"] == "bigint"


def test_decode_stub_deterministic(spark, sf_dir):
    art = artifacts(spark, sf_dir)
    d1 = sorted(decode(art).collect(), key=lambda r: r["doc_id"])
    d2 = sorted(decode(art).collect(), key=lambda r: r["doc_id"])
    assert d1 == d2
    assert all(1 <= r["fake_width"] <= 1920 for r in d1)
    assert all(len(r["checksum"]) == 32 for r in d1)


def test_decode_preserves_rowcount_and_partitioning(spark, sf_dir):
    art = artifacts(spark, sf_dir).repartition(8)
    out = decode(art)
    assert out.count() == art.count()
    assert out.rdd.getNumPartitions() == 8  # decode is partition-local


def test_checksum_matches_jvm_md5(spark, sf_dir):
    """Pandas-side hashlib.md5 == JVM-side F.md5 over the same bytes —
    pins the Arrow binary round-trip byte-for-byte."""
    art = artifacts(spark, sf_dir)
    jvm = art.select("doc_id", F.md5("payload").alias("jvm_md5"))
    py = decode(art).select("doc_id", "checksum")
    joined = jvm.join(py, "doc_id")
    bad = joined.where(F.col("jvm_md5") != F.col("checksum")).count()
    assert bad == 0
