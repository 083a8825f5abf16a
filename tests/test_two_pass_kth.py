"""_two_pass_kth (r13 selection-only median) must select EXACTLY the row
the _two_pass_rank slice ``rn == ceil(n/2)`` selects — same tie-break,
same groups — while feeding only the qualifying partition per group to
the rank window. The equivalence argument (global rn = lrn + carry, and
carries strictly increase with pid) is proven here on data crafted so
groups SPAN multiple range partitions and carry duplicate order-values
whose tie-break matters.
"""
from __future__ import annotations

from pyspark.sql import functions as F

from spark_streaming_dis_plugin_spark.operators.connector import (
    _two_pass_kth,
    _two_pass_rank,
)


def _fixture(spark):
    # 3 groups x enough rows to span several of the 8 local partitions;
    # heavy value ties so the event_id tie-break decides the median
    rows = []
    for g, size in (("a", 4001), ("b", 997), ("c", 2)):
        for i in range(size):
            rows.append((g, float(i % 13), i))
    return spark.createDataFrame(
        rows, "event_type string, value double, event_id bigint")


def test_kth_matches_rank_slice(spark):
    df = _fixture(spark)
    ranked = _two_pass_rank(spark, df, ["event_type"],
                            ["value", "event_id"])
    expected = (ranked
                .where(F.col("rn") == F.ceil(F.col("n") / 2.0)
                       .cast("bigint"))
                .select("event_type", "value", "event_id", "n"))
    got = _two_pass_kth(spark, df, ["event_type"],
                        ["value", "event_id"]) \
        .select("event_type", "value", "event_id", "n")
    exp_rows = sorted(map(tuple, expected.collect()))
    got_rows = sorted(map(tuple, got.collect()))
    assert got_rows == exp_rows
    assert len(got_rows) == 3          # exactly one median row per group


def test_kth_single_row_group(spark):
    # k = ceil(1/2) = 1: the carry math must hold at the degenerate edge
    df = spark.createDataFrame(
        [("solo", 7.5, 42)],
        "event_type string, value double, event_id bigint")
    got = _two_pass_kth(spark, df, ["event_type"],
                        ["value", "event_id"]).collect()
    assert [(r["event_type"], r["value"], r["event_id"])
            for r in got] == [("solo", 7.5, 42)]


def test_kth_plan_prunes_before_rank_window(spark):
    # the rank window's input must be the broadcast-joined (pruned)
    # slice, not the full checkpointed relation: the join sits BELOW
    # the Window in the plan, and the window partitions by (group, pid)
    df = _fixture(spark)
    plan = _two_pass_kth(
        spark, df, ["event_type"],
        ["value", "event_id"])._jdf.queryExecution().executedPlan().toString()
    win = plan.find("Window")
    bhj = plan.find("BroadcastHashJoin")
    assert win != -1 and bhj != -1
    assert bhj > win, (
        "expected the pruning BroadcastHashJoin below the rank Window "
        "(join filters rows BEFORE ranking); got:\n" + plan[:4000])
