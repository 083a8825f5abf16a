"""As-of joins and range joins — operators Spark lacks natively
(SURVEY.md §2c "custom operators"; the classic time-series/OLAP gap).

Two implementations of the as-of join, same semantics, same oracle:

1. union + window (pure DataFrame): tag both sides, sort once per key,
   carry the last left-side value forward with a running max/last_value.
   One shuffle on the key — the 100 TB path (no per-group materialization,
   spills fine, AQE-friendly).
2. applyInPandas + pd.merge_asof per key group: the readable/flexible
   variant (tolerance, nearest-direction); Arrow-batched, one group per
   pandas frame — right-sized when groups fit memory.

Range join: equi-bucket join against a broadcast band table — the standard
decomposition (bucket key = equi-join, residual BETWEEN filter) that keeps
Catalyst from falling into a nested-loop join.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.registry import register
from ..tables import load

# As-of: for each purchase event, the user's latest click at-or-before it.
ASOF_ORACLE = """
    WITH tagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN event_type = 'click' THEN ts END AS click_ts
      FROM events WHERE event_type IN ('click', 'purchase')
    ), carried AS (
      SELECT user_id, ts, event_id,
             MAX(click_ts) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS last_click_ts
      FROM tagged
    )
    SELECT c.event_id AS purchase_id,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
           COALESCE(strftime(c.last_click_ts, '%Y-%m-%d %H:%M:%S.%f'),
                    'never') AS asof_click_ts
    FROM carried c JOIN events e ON c.event_id = e.event_id
    WHERE e.event_type = 'purchase'
"""

TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


@register("asof_join_window", oracle=ASOF_ORACLE,
          tags=("asof", "join", "window"), bench=True)
def asof_join_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join via union+window: one sort per user carries the latest
    click timestamp onto every later purchase. Scale path — a single
    shuffle on user_id, no group materialization."""
    events = load(spark, sf_dir, "events")
    both = events.where(F.col("event_type").isin("click", "purchase"))
    tagged = both.select(
        "user_id", "ts", "event_id", "event_type",
        F.when(F.col("event_type") == "click", F.col("ts")).alias("click_ts"))
    # event_id tiebreak: rows tied on (user_id, ts) would otherwise get an
    # engine-order-dependent carried value (MAX is order-insensitive only
    # across a fixed frame; the frame itself depends on the sort).
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, 0))
    carried = tagged.withColumn("last_click_ts", F.max("click_ts").over(w))
    return (carried.where(F.col("event_type") == "purchase")
            .select(F.col("event_id").alias("purchase_id"),
                    F.date_format("ts", TS_FMT).alias("purchase_ts"),
                    F.coalesce(F.date_format("last_click_ts", TS_FMT),
                               F.lit("never")).alias("asof_click_ts")))


@register("asof_join_pandas", oracle=ASOF_ORACLE,
          tags=("asof", "join", "pandas-udf"))
def asof_join_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same as-of join via applyInPandas + pd.merge_asof per user group —
    hash-matches the identical oracle, pinning the two implementations
    together. cogroup keeps each side Arrow-batched per key."""
    events = load(spark, sf_dir, "events")
    purchases = events.where(F.col("event_type") == "purchase") \
                      .select("user_id", "ts", "event_id")
    clicks = events.where(F.col("event_type") == "click") \
                   .select("user_id", F.col("ts").alias("click_ts"))

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        left = left.sort_values("ts")
        right = right.sort_values("click_ts")
        if len(right):
            merged = pd.merge_asof(left, right, left_on="ts",
                                   right_on="click_ts", direction="backward")
        else:
            merged = left.assign(click_ts=pd.NaT)
        out = pd.DataFrame({
            "purchase_id": merged["event_id"],
            "purchase_ts": merged["ts"].dt.strftime("%Y-%m-%d %H:%M:%S.%f"),
            "asof_click_ts": merged["click_ts"]
            .dt.strftime("%Y-%m-%d %H:%M:%S.%f").fillna("never"),
        })
        return out

    return (purchases.groupBy("user_id").cogroup(clicks.groupBy("user_id"))
            .applyInPandas(
                lambda left, right: merge(left, right),
                schema="purchase_id bigint, purchase_ts string, "
                       "asof_click_ts string"))


@register(
    "range_join_banded",
    oracle="""
    WITH bands(band_name, lo, hi) AS (
      VALUES ('low', 0.0, 10.0), ('mid', 10.0, 30.0), ('high', 30.0, 100.0)
    )
    SELECT band_name, COUNT(*) AS n,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,2))) AS DOUBLE)
             AS total_price
    FROM lineitem JOIN bands
      ON l_quantity >= lo AND l_quantity < hi
    GROUP BY band_name
    """,
    tags=("range-join", "join"))
def range_join_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join against a broadcast band table. With a dimension-sized
    band side, broadcast-nested-loop over 3 rows is a map-side operation;
    for band tables too large to broadcast, the decomposition is bucket
    key = floor(value/width) equi-join + residual BETWEEN — same output,
    shuffle instead of nested loop."""
    li = load(spark, sf_dir, "lineitem")
    bands = spark.createDataFrame(
        [("low", 0.0, 10.0), ("mid", 10.0, 30.0), ("high", 30.0, 100.0)],
        "band_name string, lo double, hi double")
    return (li.join(F.broadcast(bands),
                    (F.col("l_quantity") >= F.col("lo"))
                    & (F.col("l_quantity") < F.col("hi")))
            .groupBy("band_name")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("l_extendedprice").cast("decimal(27,2)"))
                  .cast("double").alias("total_price")))


@register(
    "asof_join_forward",
    oracle="""
    WITH tagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN event_type = 'click' THEN ts END AS click_ts
      FROM events WHERE event_type IN ('click', 'purchase')
    ), carried AS (
      SELECT user_id, ts, event_id,
             MIN(click_ts) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS next_click_ts
      FROM tagged
    )
    SELECT c.event_id AS purchase_id,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
           COALESCE(strftime(c.next_click_ts, '%Y-%m-%d %H:%M:%S.%f'),
                    'never') AS next_click_ts
    FROM carried c JOIN events e ON c.event_id = e.event_id
    WHERE e.event_type = 'purchase'
    """,
    tags=("asof", "join", "window", "forward"))
def asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join (pd.merge_asof direction='forward'): each
    purchase matched to the user's EARLIEST click at-or-after it — the
    "time to next action" shape (conversion latency, next-error-after-
    deploy). Same single-shuffle union+window design as
    asof_join_window with the frame reversed: MIN over CURRENT ROW TO
    UNBOUNDED FOLLOWING carries the next click backward. A purchase at
    the same instant as a click matches it (at-or-after), mirroring the
    backward twin's at-or-before; 'never' marks purchases with no later
    click — rows the left-join formulation would silently null."""
    events = load(spark, sf_dir, "events")
    both = events.where(F.col("event_type").isin("click", "purchase"))
    tagged = both.select(
        "user_id", "ts", "event_id", "event_type",
        F.when(F.col("event_type") == "click", F.col("ts")).alias("click_ts"))
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(0, Window.unboundedFollowing))
    carried = tagged.withColumn("next_click_ts", F.min("click_ts").over(w))
    return (carried.where(F.col("event_type") == "purchase")
            .select(F.col("event_id").alias("purchase_id"),
                    F.date_format("ts", TS_FMT).alias("purchase_ts"),
                    F.coalesce(F.date_format("next_click_ts", TS_FMT),
                               F.lit("never")).alias("next_click_ts")))


ASOF_NEAREST_ORACLE = """
    WITH tagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN event_type = 'click' THEN ts END AS click_ts
      FROM events WHERE event_type IN ('click', 'purchase')
    ), carried AS (
      SELECT user_id, ts, event_id, event_type,
             MAX(click_ts) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS back,
             MIN(click_ts) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS fwd
      FROM tagged
    ), scored AS (
      SELECT event_id, ts, back, fwd,
             date_diff('microsecond', back, ts) AS d_back,
             date_diff('microsecond', ts, fwd) AS d_fwd
      FROM carried WHERE event_type = 'purchase'
    )
    SELECT event_id AS purchase_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
           CASE
             WHEN back IS NULL AND fwd IS NULL THEN 'never'
             WHEN fwd IS NULL OR (back IS NOT NULL AND d_back <= d_fwd)
               THEN strftime(back, '%Y-%m-%d %H:%M:%S.%f')
             ELSE strftime(fwd, '%Y-%m-%d %H:%M:%S.%f')
           END AS nearest_click_ts,
           CASE
             WHEN back IS NULL AND fwd IS NULL THEN 'never'
             WHEN fwd IS NULL OR (back IS NOT NULL AND d_back <= d_fwd)
               THEN 'backward'
             ELSE 'forward'
           END AS direction
    FROM scored
"""


@register("asof_join_nearest", oracle=ASOF_NEAREST_ORACLE,
          tags=("asof", "join", "window", "nearest"))
def asof_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-direction as-of join — the third member completing the
    as-of family (backward = asof_join_window, forward =
    asof_join_forward): each purchase pairs with whichever click is
    CLOSER in time, behind or ahead, ties resolving backward (pandas
    merge_asof direction='nearest' semantics, which the pandas variant
    exposes but the pure-DataFrame path previously didn't).

    Construction: ONE sort per key serves BOTH carries — the backward
    candidate is a running MAX(click_ts) over the preceding frame, the
    forward candidate a running MIN over the following frame, and the
    winner is an exact int64 microsecond-distance compare
    (timestampdiff on NTZ wall-clocks; timezone-free, no epoch
    subtraction). Same single user_id shuffle as the other two
    variants — nearest costs one extra window FUNCTION, not an extra
    exchange, and no per-group materialization.

    Reference scope: custom time-series operators (SURVEY.md S2c)."""
    events = load(spark, sf_dir, "events")
    both = events.where(F.col("event_type").isin("click", "purchase"))
    click_ts = F.when(F.col("event_type") == "click", F.col("ts"))
    wb = (Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wf = (Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(Window.currentRow, Window.unboundedFollowing))
    carried = (both.select("user_id", "ts", "event_id", "event_type",
                           click_ts.alias("click_ts"))
               .withColumn("back", F.max("click_ts").over(wb))
               .withColumn("fwd", F.min("click_ts").over(wf))
               .where(F.col("event_type") == "purchase"))
    scored = carried.select(
        "event_id", "ts", "back", "fwd",
        F.expr("timestampdiff(MICROSECOND, back, ts)").alias("d_back"),
        F.expr("timestampdiff(MICROSECOND, ts, fwd)").alias("d_fwd"))
    backward_wins = (F.col("fwd").isNull()
                     | (F.col("back").isNotNull()
                        & (F.col("d_back") <= F.col("d_fwd"))))
    never = F.col("back").isNull() & F.col("fwd").isNull()
    return scored.select(
        F.col("event_id").alias("purchase_id"),
        F.date_format("ts", TS_FMT).alias("purchase_ts"),
        F.when(never, "never")
         .when(backward_wins, F.date_format("back", TS_FMT))
         .otherwise(F.date_format("fwd", TS_FMT)).alias("nearest_click_ts"),
        F.when(never, "never")
         .when(backward_wins, "backward")
         .otherwise("forward").alias("direction"))
