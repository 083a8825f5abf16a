"""Streaming query builders over a DIS stream (SURVEY.md §7 Phase 3).

Each builder takes the streaming envelope DataFrame (from
``spark.readStream.format("dis")``) and returns the transformed streaming
DataFrame; tests drive them with Trigger.availableNow + a memory sink and
verify against the batch twin of the same query (the reference delegates
all of this to user code; here it is first-class and tested).

Event time = the envelope ``timestamp`` column. Watermarks bound state:
at 100 TB of stream state the watermark is what keeps windowed aggregation
and dedup state finite.

The envelope stores timestamps as TIMESTAMP_NTZ (naive wall clock — the
timezone-safe representation for batch/oracle work), but Spark's watermark
machinery requires TIMESTAMP (LTZ). ``_with_event_time`` casts at the
query boundary: the session interprets the wall clock, and since both the
streaming query and its batch twin go through the same cast, results stay
self-consistent in any session timezone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _with_event_time(env: DataFrame) -> DataFrame:
    return env.withColumn("timestamp",
                          F.col("timestamp").cast("timestamp"))


def parsed_events(env: DataFrame) -> DataFrame:
    """Envelope -> typed event payload (from_json on value)."""
    return env.select(
        "partition", "offset", "timestamp",
        F.from_json("value", "k BIGINT").alias("payload"))


def windowed_counts(env: DataFrame, window: str = "1 hour",
                    watermark: str = "2 hours") -> DataFrame:
    """Tumbling event-time window + count/sum with late-data drop.
    Batch twin: operators/connector.dis_tumbling_window."""
    return (_with_event_time(env)
            .withWatermark("timestamp", watermark)
            .groupBy(F.window("timestamp", window).alias("w"), "partition")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("window_start"), "partition", "n"))


def sliding_counts(env: DataFrame, window: str = "1 hour",
                   slide: str = "30 minutes",
                   watermark: str = "2 hours") -> DataFrame:
    """Sliding window — each record lands in window/slide buckets."""
    return (_with_event_time(env)
            .withWatermark("timestamp", watermark)
            .groupBy(F.window("timestamp", window, slide).alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("window_start"), "n"))


def late_window_counts(env: DataFrame, window: str = "1 hour",
                       watermark: str = "2 hours") -> DataFrame:
    """Tumbling window counts for the LATE-DATA-DROP gate: unlike
    :func:`windowed_counts` this groups on the window alone (the gate's
    log is single-partition) and is meant for APPEND output mode, where
    the watermark genuinely evicts — rows whose window end has fallen
    behind the watermark are dropped before aggregation, and a window is
    emitted exactly once, when the watermark passes its end."""
    return (_with_event_time(env)
            .withWatermark("timestamp", watermark)
            .groupBy(F.window("timestamp", window).alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("window_start"), "n"))


def session_counts(env: DataFrame, gap: str = "30 minutes",
                   watermark: str = "2 hours") -> DataFrame:
    """Session windows keyed by the record key (inactivity gap).
    Batch twin: operators/connector.dis_sessionization."""
    return (_with_event_time(env)
            .withWatermark("timestamp", watermark)
            .groupBy(F.session_window("timestamp", gap).alias("w"), "key")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(F.col("w.start").alias("session_start"), "key", "n_events"))


def dedup_within_watermark(env: DataFrame,
                           watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup on (key, value) with bounded state — the
    streaming twin of operators/dedup.dedup_exact."""
    return (_with_event_time(env)
            .withWatermark("timestamp", watermark)
            .dropDuplicatesWithinWatermark(["key", "value"]))


def running_wordcount(env: DataFrame) -> DataFrame:
    """The reference demo pipeline as a *streaming* query
    (DISSparkStreamingSubscribeExample.scala:46): cumulative word counts
    across micro-batches (update mode / complete mode)."""
    return (env
            .select(F.explode(F.split("value", "[^a-zA-Z0-9_]+")).alias("word"))
            .where(F.col("word") != "")
            .groupBy("word").agg(F.count(F.lit(1)).alias("n")))


def purchase_click_join(purchases: DataFrame, clicks: DataFrame,
                        watermark: str = "2 hours",
                        within: str = "1 hour",
                        how: str = "inner") -> DataFrame:
    """Stream-stream inner join: each purchase joined to the same user's
    clicks within the preceding `within` interval. Both sides carry
    watermarks and the join condition is time-bounded, so Spark can evict
    state — the requirements for an unbounded-stream join to run with
    finite memory (at 100 TB/day the watermark bound IS the state size).

    Inputs are envelope streams pre-filtered by event type (payload JSON's
    event routing lives in the caller); key = envelope key (user id).
    """
    p = (_with_event_time(purchases)
         .withWatermark("timestamp", watermark)
         .select(F.col("key").alias("p_key"),
                 F.col("timestamp").alias("p_ts"),
                 F.col("offset").alias("p_offset"),
                 F.col("partition").alias("p_partition")))
    c = (_with_event_time(clicks)
         .withWatermark("timestamp", watermark)
         .select(F.col("key").alias("c_key"),
                 F.col("timestamp").alias("c_ts"),
                 F.col("offset").alias("c_offset"),
                 F.col("partition").alias("c_partition")))
    return p.join(
        c,
        (F.col("p_key") == F.col("c_key"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {within}")),
        how)
