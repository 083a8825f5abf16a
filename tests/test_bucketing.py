"""Bucketed co-located joins — the pre-shuffle lever for repeated joins.

At 100 TB the dominant cost of a fact-fact join is the key shuffle. When
the same join runs repeatedly (orders x lineitem on orderkey in half the
TPC-H suite), writing both sides BUCKETED on the join key pays one
organizing shuffle at write time and then every subsequent join reads
co-located buckets with NO Exchange on either side — Spark's sort-merge
join consumes the bucket layout directly. These tests pin that contract:
same results, shuffle-free plan.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from spark_streaming_dis_plugin_spark.tables import load

N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed_db(spark, sf_dir, tmp_path_factory):
    """orders + lineitem written bucketed by orderkey into a throwaway
    database (explicit LOCATION keeps the warehouse out of the repo)."""
    loc = tmp_path_factory.mktemp("bucket_wh")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bucket_db LOCATION '{loc}'")
    (load(spark, sf_dir, "orders")
     .write.bucketBy(N_BUCKETS, "o_orderkey").sortBy("o_orderkey")
     .mode("overwrite").saveAsTable("bucket_db.orders_b"))
    (load(spark, sf_dir, "lineitem")
     .write.bucketBy(N_BUCKETS, "l_orderkey").sortBy("l_orderkey")
     .mode("overwrite").saveAsTable("bucket_db.lineitem_b"))
    yield "bucket_db"
    spark.sql("DROP DATABASE IF EXISTS bucket_db CASCADE")


def _join(spark, left, right):
    return (left.join(right,
                      F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("l_quantity").cast("decimal(27,2)"))
                 .cast("double").alias("qty")))


def test_bucketed_join_plans_no_exchange(spark, bucketed_db):
    """Both sides bucketed on the join key at matching bucket counts:
    the sort-merge join must consume the bucket layout directly — zero
    Exchange operators anywhere in the join's plan."""
    for k, v in (("spark.sql.autoBroadcastJoinThreshold", "-1"),
                 ("spark.sql.adaptive.enabled", "false")):
        spark.conf.set(k, v)
    try:
        df = _join(spark,
                   spark.table("bucket_db.orders_b"),
                   spark.table("bucket_db.lineitem_b")
                   .select("l_orderkey", "l_quantity"))
        plan = df._jdf.queryExecution().executedPlan().toString()
        join_part = plan.split("HashAggregate")[-1]
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in join_part, join_part
        # the only exchange allowed is the final tiny aggregation's
        assert plan.count("Exchange hashpartitioning") <= 1
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_bucketed_join_matches_unbucketed_results(spark, sf_dir,
                                                  bucketed_db):
    """Layout is an optimization, not a semantics change: the bucketed
    join's aggregate must equal the plain parquet join's."""
    bucketed = _join(spark,
                     spark.table("bucket_db.orders_b"),
                     spark.table("bucket_db.lineitem_b")
                     .select("l_orderkey", "l_quantity")).collect()
    plain = _join(spark,
                  load(spark, sf_dir, "orders"),
                  load(spark, sf_dir, "lineitem")
                  .select("l_orderkey", "l_quantity")).collect()
    assert sorted(map(tuple, bucketed)) == sorted(map(tuple, plain))


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    """Hive-style partitionBy layout + partition pruning: a lang='en'
    filter must become a PartitionFilter (pruned at planning from the
    directory structure), not a data Filter over all files — the other
    half of the layout story (bucketing organizes join keys; partitioning
    organizes filter keys)."""
    out = str(tmp_path / "docs_by_lang")
    (load(spark, sf_dir, "documents")
     .write.partitionBy("lang").mode("overwrite").parquet(out))
    df = spark.read.parquet(out).where(F.col("lang") == "en")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    # the lang predicate must appear among the partition filters,
    # not as a post-scan data filter
    pf = plan.split("PartitionFilters: [")[1].split("]")[0]
    assert "lang" in pf, plan
    expected = (load(spark, sf_dir, "documents")
                .where(F.col("lang") == "en").count())
    assert df.count() == expected
