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


def test_zorder_prunes_both_dimensions_vs_single_key(spark, sf_dir,
                                                     tmp_path):
    """Z-order clustering measured DIRECTLY from parquet footers: write
    orders (a) z-clustered on interleave(quant(custkey), quant(date))
    and (b) range-clustered on custkey alone, same file count; for a 2-D
    box predicate, count the files whose (min,max) footer stats on BOTH
    columns overlap the box — the files a stats-pruning scan must read.
    Single-key clustering serves the custkey axis but leaves the date
    axis scattered through every selected file; z-order must strictly
    reduce the overlap set. (Semantics-neutrality of the layout is the
    oracle row layout_zorder_scan; this test is the WHY.)"""
    import pyarrow.parquet as pq
    import os

    from spark_streaming_dis_plugin_spark.operators.relational import (
        ZORDER_BITS, ZORDER_FILES, _zinterleave, _zorder_quant_cols,
    )

    orders = load(spark, sf_dir, "orders")
    q = _zorder_quant_cols(orders)
    z = (q.withColumn("z", _zinterleave(F.col("xq"), F.col("yq"),
                                        ZORDER_BITS))
         .drop("kmin", "kmax", "dmin", "dmax", "xq", "yq"))
    zdir = str(tmp_path / "zorder")
    (z.repartitionByRange(ZORDER_FILES, "z").sortWithinPartitions("z")
     .write.mode("overwrite").parquet(zdir))
    kdir = str(tmp_path / "bykey")
    (orders.repartitionByRange(ZORDER_FILES, "o_custkey")
     .sortWithinPartitions("o_custkey")
     .write.mode("overwrite").parquet(kdir))

    [st] = (orders.agg(F.min("o_custkey").alias("kmin"),
                       F.max("o_custkey").alias("kmax")).collect())
    k_lo = st["kmin"] + (st["kmax"] - st["kmin"]) // 4
    k_hi = st["kmin"] + (st["kmax"] - st["kmin"]) // 2
    import datetime
    d_lo = datetime.datetime(1995, 1, 1)
    d_hi = datetime.datetime(1996, 1, 1)

    def overlap_files(d: str) -> tuple[int, int]:
        total = hit = 0
        for name in os.listdir(d):
            if not name.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(d, name)).metadata
            if md.num_rows == 0:
                continue
            total += 1
            cols = {md.schema.column(i).name: i
                    for i in range(md.num_columns)}
            kmin = kmax = dmin = dmax = None
            for rg in range(md.num_row_groups):
                ks = md.row_group(rg).column(cols["o_custkey"]).statistics
                ds = md.row_group(rg).column(cols["o_orderdate"]).statistics
                kmin = ks.min if kmin is None else min(kmin, ks.min)
                kmax = ks.max if kmax is None else max(kmax, ks.max)
                dmin = ds.min if dmin is None else min(dmin, ds.min)
                dmax = ds.max if dmax is None else max(dmax, ds.max)
            dmin = dmin.replace(tzinfo=None)
            dmax = dmax.replace(tzinfo=None)
            if kmax >= k_lo and kmin <= k_hi and dmax >= d_lo and dmin < d_hi:
                hit += 1
        return hit, total

    z_hit, z_total = overlap_files(zdir)
    k_hit, k_total = overlap_files(kdir)
    assert z_total >= ZORDER_FILES // 2 and k_total >= ZORDER_FILES // 2
    # single-key: every custkey-selected file spans the full date axis ->
    # its overlap count is its custkey share; z-order cuts BOTH axes.
    assert z_hit < k_hit, (z_hit, z_total, k_hit, k_total)
