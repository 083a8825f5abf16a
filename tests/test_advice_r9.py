"""Round-9 ADVICE regression tests.

Covers the four r8 ADVICE items:
1. (low) events_session_window_native: the advice claimed session_window
   has an exclusive session end (exact-gap event starts a new session);
   empirically Spark MERGES at the exact boundary (session merge
   coalesces start <= previous end), so the oracle keeps strict > — but
   the advice's second point stands: the running sum must order by
   (ts, event_id) exactly like is_new. Both pinned here on crafted data;
2. (low) zscore_gate_tws: Decimal moments run under an explicit 40-digit
   context so DECIMAL(18,4)-wide values (squares up to 36 digits) stay
   exact;
3. (low) Python kernels round emitted scores via the shared HALF_UP
   helper (Spark F.round semantics), not the built-in half-even round();
4. (low) events_resample_gapfill marks `observed` from join-row
   existence, not value non-nullness — an observed day whose latest event
   has a NULL value is still observed.
"""
from __future__ import annotations

import datetime

import duckdb
import pytest
from pyspark.sql import functions as F

from spark_streaming_dis_plugin_spark.plans.registry import all_queries

EVENTS_SCHEMA = ("event_id bigint, ts timestamp_ntz, user_id bigint, "
                 "event_type string, value double, props string")


def _crafted_sf(spark, tmp_path, rows, sub="sf"):
    sf = str(tmp_path / sub)
    spark.createDataFrame(rows, EVENTS_SCHEMA) \
        .coalesce(1).write.mode("overwrite").parquet(f"{sf}/events.parquet")
    return sf


def _duck(sf):
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet/*.parquet'")
    return con


def _ts(s):
    return datetime.datetime.fromisoformat(s)


# ------------------------------------------- 1. session boundary semantics

def test_session_window_exact_gap_boundary(spark, tmp_path):
    """Exact-boundary semantics, verified against the ENGINE: an event at
    exactly last_ts + 10min MERGES (Spark coalesces sessions with
    start <= previous end), and duplicate (user_id, ts) pairs must not
    misgroup the oracle's running sum."""
    rows = [
        # user 1: second event at exactly +10min -> ONE session
        # (exact-gap events MERGE: session start <= previous end)
        (0, _ts("2024-01-01 00:00:00"), 1, "a", 1.0, "{}"),
        (1, _ts("2024-01-01 00:10:00"), 1, "a", 1.0, "{}"),
        # user 2: +9:59.999999 -> one session
        (2, _ts("2024-01-01 00:00:00"), 2, "a", 1.0, "{}"),
        (3, _ts("2024-01-01 00:09:59.999999"), 2, "a", 1.0, "{}"),
        # user 3: duplicate timestamps straddling a boundary event
        (4, _ts("2024-01-01 00:00:00"), 3, "a", 1.0, "{}"),
        (5, _ts("2024-01-01 00:00:00"), 3, "a", 1.0, "{}"),
        (6, _ts("2024-01-01 00:30:00"), 3, "a", 1.0, "{}"),
        (7, _ts("2024-01-01 00:30:00"), 3, "a", 1.0, "{}"),
    ]
    sf = _crafted_sf(spark, tmp_path, rows)
    spec = all_queries()["events_session_window_native"]
    got = {(r["user_id"], r["session_start"], r["session_end"], r["n_events"])
           for r in spec.fn(spark, sf).collect()}
    con = _duck(sf)
    want = {tuple(r) for r in con.sql(spec.oracle).fetchall()}
    assert got == want
    # and the semantics themselves: exact-gap and sub-gap both merge
    by_user = {}
    for u, *_rest in got:
        by_user[u] = by_user.get(u, 0) + 1
    assert by_user[1] == 1 and by_user[2] == 1 and by_user[3] == 2


# --------------------------------------------- 2. wide-decimal exactness

def test_zscore_decimal_context_is_wide_enough():
    """Summing squares of 18-significant-digit DECIMAL(18,4) values must
    be exact under the processor's context (the default 28-digit context
    silently rounds); replicate the kernel's arithmetic path."""
    from decimal import Decimal, getcontext

    getcontext().prec = 28          # simulate a polluted default
    from spark_streaming_dis_plugin_spark.streaming import stateful  # noqa: F401

    # the kernel sets prec=40 inside handleInputRows; emulate its effect
    getcontext().prec = 40
    v = Decimal("99999999999999.9999")          # 18 significant digits
    sq = v * v                                  # 36 significant digits
    assert sq == Decimal("9999999999999999980000000000.00000001")
    total = sum(sq for _ in range(20))          # 38 significant digits
    assert total == sq * 20                     # no silent rounding


# ----------------------------------------------- 3. shared HALF_UP round

def test_round_half_up_matches_spark_f_round(spark):
    from spark_streaming_dis_plugin_spark.functions.portable import (
        round_half_up,
    )

    # 3.5e-6's shortest repr sits ON a decimal midpoint: half-even gives
    # 3e-6, HALF_UP (and Spark's F.round) gives 4e-6 — the 1-ulp class
    # the advice flagged
    assert round_half_up(3.5e-06, 6) == 4e-06
    assert round(3.5e-06, 6) == 3e-06          # the bug being fixed
    vals = [3.5e-06, 5.5e-06, -3.5e-06, 5e-07, 0.1234565, 560.2112345,
            1.0000005, -1.0000005, 123456.789]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    engine = [r[0] for r in
              df.select(F.round("x", 6)).collect()]
    ours = [round_half_up(v, 6) for v in vals]
    assert ours == engine


def test_python_kernels_use_half_up(monkeypatch):
    """The MMR kernel's emitted score rounds HALF_UP."""
    import pandas as pd

    from spark_streaming_dis_plugin_spark.operators.similarity import (
        _mmr_rerank_group,
    )

    pdf = pd.DataFrame({
        "query_id": [7], "cand_id": [1],
        "emb": [[1.0, 0.0]], "rel": [3.5e-06],
    })
    out = _mmr_rerank_group(pdf)
    assert out["score"].tolist() == [4e-06]


# ------------------------------------------------ 4. observed on NULL value

def test_gapfill_observed_counts_null_value_days(spark, tmp_path):
    """A day whose latest event carries a NULL value is still observed=1
    (join-row existence), matching the oracle's d.rn IS NOT NULL."""
    rows = [
        (0, _ts("2024-01-01 08:00:00"), 1, "a", 5.0, "{}"),
        (1, _ts("2024-01-02 08:00:00"), 1, "a", None, "{}"),   # observed, NULL
        # 2024-01-03 is a gap day
        (2, _ts("2024-01-04 08:00:00"), 1, "a", 7.0, "{}"),
    ]
    sf = _crafted_sf(spark, tmp_path, rows)
    spec = all_queries()["events_resample_gapfill"]
    got = {(r["user_id"], r["day"], r["observed"], r["filled_value"])
           for r in spec.fn(spark, sf).collect()}
    con = _duck(sf)
    want = {tuple(r) for r in con.sql(spec.oracle).fetchall()}
    assert got == want
    by_day = {d: (o, fv) for (_u, d, o, fv) in got}
    assert by_day["2024-01-02"][0] == 1     # NULL-value day IS observed
    assert by_day["2024-01-03"][0] == 0     # gap day is not
    assert by_day["2024-01-02"][1] == 5.0   # fill carries last non-null


def test_streaming_session_window_exact_gap_merges(spark, tmp_path):
    """The STREAMING session_window path merges at the exact boundary
    too (same coalesce rule as batch) — pins the `> gap` predicate the
    dis_session_streamed / dis_multibatch_session_streamed oracles use
    (their r8-era `>=` encoded the opposite, fixture-masked)."""
    rows = [
        (1, datetime.datetime(2024, 1, 1, 0, 0, 0)),
        (1, datetime.datetime(2024, 1, 1, 0, 10, 0)),    # exactly +gap
        (2, datetime.datetime(2024, 1, 1, 0, 0, 0)),
        (2, datetime.datetime(2024, 1, 1, 0, 9, 59, 999999)),
        (3, datetime.datetime(2024, 1, 1, 0, 0, 0)),
        (3, datetime.datetime(2024, 1, 1, 0, 10, 0, 1)),  # just past gap
    ]
    d = str(tmp_path)
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp")
    df.coalesce(1).write.parquet(d + "/in")
    batch = (df.groupBy("user_id", F.session_window("ts", "10 minutes"))
             .count()
             .select("user_id", F.col("session_window.start").alias("s"),
                     "count"))
    want = sorted((r["user_id"], str(r["s"]), r["count"])
                  for r in batch.collect())
    sdf = spark.readStream.schema("user_id bigint, ts timestamp") \
        .parquet(d + "/in")
    q = (sdf.withWatermark("ts", "0 seconds")
         .groupBy("user_id", F.session_window("ts", "10 minutes")).count()
         .writeStream.format("memory").queryName("sessbound")
         .outputMode("complete")
         .option("checkpointLocation", d + "/ck")
         .trigger(availableNow=True).start())
    assert q.awaitTermination(120)
    got = sorted(
        (r["user_id"], str(r["s"]), r["count"]) for r in
        spark.table("sessbound")
        .select("user_id", F.col("session_window.start").alias("s"),
                "count").collect())
    assert got == want
    per_user = {}
    for u, *_r in got:
        per_user[u] = per_user.get(u, 0) + 1
    # exact-gap and sub-gap merge; only strictly-past-gap splits
    assert per_user == {1: 1, 2: 1, 3: 2}
