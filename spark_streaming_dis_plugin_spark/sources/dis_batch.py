"""Bounded (batch) reads over a DIS-shaped log — the createRDD surface.

Re-expresses /root/reference/.../DISUtils.createRDD (DISUtils.scala:57-104,
240-303) Spark-first: an offset-range-bounded *DataFrame* with the fixed
ingest envelope schema, plus the metadata-only count/take/isEmpty pushdowns
(DISRDD.scala:89-144) answered from offset arithmetic with zero data I/O.

Exactly-once by construction: the caller names the ranges; the scan is a
deterministic pure function of them (DISUtils.scala:43-45).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dis_log import DisLog
from .offsets import OffsetRange, offset_ranges_from_json, resolve_sentinels


def resolve_ranges(log: DisLog, ranges: list[OffsetRange]) -> list[OffsetRange]:
    """Resolve -1/-2 sentinels against the log's current bounds (driver-side,
    before the plan is frozen — cf. DISUtils.scala:253-289)."""
    return resolve_sentinels(ranges, log.earliest_offsets(), log.latest_offsets())


def dis_read(spark: SparkSession, log: DisLog,
             ranges: list[OffsetRange] | str) -> DataFrame:
    """Bounded DataFrame over explicit offset ranges.

    ``ranges`` is a list of OffsetRange or the reference's JSON dialect
    ``{"0": [100, 200], "1": [-2, -1]}`` (JsonUtils.scala:74-86).

    Scale notes: segment files are pruned by file name before Spark sees
    them (no listing of irrelevant data); the residual ``offset`` filter is
    pushed to the parquet reader (row-group pruning via min/max stats); one
    log partition maps to >=1 input split, so a hot partition still
    parallelizes across executors.
    """
    if isinstance(ranges, str):
        ranges = offset_ranges_from_json(log.stream, ranges)
    ranges = resolve_ranges(log, ranges)

    parts: list[DataFrame] = []
    for r in ranges:
        if r.count == 0:
            continue  # empty ranges planned away — DISRDD.scala:190-193
        paths = log.segments_for_range(r.partition, r.from_offset, r.until_offset)
        if not paths:
            continue
        df = (spark.read.parquet(*paths)
              .where((F.col("offset") >= r.from_offset)
                     & (F.col("offset") < r.until_offset))
              .select(F.lit(log.stream).alias("stream"),
                      F.lit(r.partition).cast("int").alias("partition"),
                      "offset", "key", "value", "timestamp"))
        parts.append(df)
    if not parts:
        return _empty_envelope(spark)
    return reduce(DataFrame.unionByName, parts)


def _empty_envelope(spark: SparkSession) -> DataFrame:
    # timestamp_ntz, not timestamp: the non-empty path reads segment parquet
    # as NTZ (inferTimestampNTZ) and ENVELOPE_SCHEMA is TimestampNTZType —
    # the empty result must union/compare cleanly with both.
    return spark.createDataFrame(
        [], "stream string, partition int, offset long, key string, "
            "value string, timestamp timestamp_ntz")


# ---------------------------------------------------------------- pushdowns

def dis_count(log: DisLog, ranges: list[OffsetRange] | str) -> int:
    """count = sum(until - from): offset arithmetic, no scan
    (DISRDD.scala:89-94)."""
    if isinstance(ranges, str):
        ranges = offset_ranges_from_json(log.stream, ranges)
    return sum(r.count for r in resolve_ranges(log, ranges))


def dis_is_empty(log: DisLog, ranges: list[OffsetRange] | str) -> bool:
    """isEmpty from offsets (DISRDD.scala:107-112)."""
    return dis_count(log, ranges) == 0


def dis_take(spark: SparkSession, log: DisLog,
             ranges: list[OffsetRange] | str, n: int) -> list:
    """take(n) reading only the partitions/segments that can contribute.

    Mirrors DISRDD.take's plan (DISRDD.scala:114-144): per-range take
    counts are precomputed from offset arithmetic; ranges past the budget
    are never scanned.
    """
    if isinstance(ranges, str):
        ranges = offset_ranges_from_json(log.stream, ranges)
    ranges = resolve_ranges(log, ranges)

    budget, trimmed = n, []
    for r in ranges:
        if budget <= 0:
            break
        use = min(r.count, budget)
        if use > 0:
            trimmed.append(OffsetRange(r.stream, r.partition,
                                       r.from_offset, r.from_offset + use))
            budget -= use
    if not trimmed:
        return []
    return dis_read(spark, log, trimmed).collect()
