"""Bucketed tables: the co-located join strategy for repeated fact-fact
joins at scale (SURVEY.md §4 'Optimizer & physical execution' posture).

Writing both sides bucketed by the join key into the same number of
buckets lets Catalyst plan a SortMergeJoin with NO Exchange on either
side — at 100 TB this converts every recurring orders-lineitem join from
a full shuffle of both tables into a local per-bucket merge. This test
pins that plan shape (absence of shuffle), not just the row counts.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def warehouse(spark, sf_dir, tmp_path_factory):
    from spark_streaming_dis_plugin_spark.tables import load

    # warehouse.dir is a static conf on the shared session; the tables'
    # data goes to explicit tmp paths, only the catalog entry uses the
    # default warehouse (dropped in teardown).
    wh = str(tmp_path_factory.mktemp("warehouse"))
    spark.sql("CREATE DATABASE IF NOT EXISTS bucketed")
    for name, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        (load(spark, sf_dir, name).write
         .bucketBy(8, key).sortBy(key)
         .mode("overwrite")
         .option("path", f"{wh}/bucketed_{name}")
         .saveAsTable(f"bucketed.{name}"))
    yield "bucketed"
    spark.sql("DROP DATABASE IF EXISTS bucketed CASCADE")


def test_bucketed_join_has_no_exchange(spark, warehouse):
    """Both sides bucketed by the join key -> SortMergeJoin with zero
    Exchange operators (the 100 TB win: no shuffle of either fact)."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = spark.table("bucketed.orders")
        li = spark.table("bucketed.lineitem")
        joined = (li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
                  .groupBy("o_orderpriority")
                  .agg(F.count(F.lit(1)).alias("n")))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        # correctness: same result as the unbucketed join
        from spark_streaming_dis_plugin_spark.tables import load
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_join_matches_unbucketed(spark, sf_dir, warehouse):
    from spark_streaming_dis_plugin_spark.tables import load

    o = spark.table("bucketed.orders")
    li = spark.table("bucketed.lineitem")
    bucketed = {r["o_orderpriority"]: r["n"] for r in
                (li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
                 .groupBy("o_orderpriority")
                 .agg(F.count(F.lit(1)).alias("n"))).collect()}
    plain_o = load(spark, sf_dir, "orders")
    plain_li = load(spark, sf_dir, "lineitem")
    plain = {r["o_orderpriority"]: r["n"] for r in
             (plain_li.join(plain_o,
                            F.col("l_orderkey") == F.col("o_orderkey"))
              .groupBy("o_orderpriority")
              .agg(F.count(F.lit(1)).alias("n"))).collect()}
    assert bucketed == plain
