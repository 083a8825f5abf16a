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


def check_consecutive(log: DisLog, ranges: list[OffsetRange],
                      allow_non_consecutive: bool) -> None:
    """Reference gate for compacted logs (DISRDD.scala:74-75): reading a
    range whose offsets are not dense fails fast with a pointer to
    ``allowNonConsecutiveOffsets`` unless the flag is set. Metadata-only —
    segment row counts and boundaries come from file names."""
    if allow_non_consecutive:
        return
    for r in ranges:
        expected = r.from_offset
        for s in log.segment_infos(r.partition):
            if s.until_offset <= r.from_offset or s.from_offset >= r.until_offset:
                continue
            if not s.dense or s.from_offset > expected:
                raise ValueError(
                    f"partition {r.partition} range [{r.from_offset},"
                    f"{r.until_offset}) crosses compacted/non-consecutive "
                    f"offsets (segment [{s.from_offset},{s.until_offset}) "
                    f"rows={s.rows}); set allowNonConsecutiveOffsets=true "
                    f"to read a compacted log")
            expected = s.until_offset


def check_data_loss(log: DisLog, ranges: list[OffsetRange],
                    fail_on_data_loss: bool = True) -> list[OffsetRange]:
    """Kafka-parity failOnDataLoss: a requested offset below the log's
    earliest means retention expired data between checkpoint/plan time
    and now. Default = fail loudly; ``fail_on_data_loss=False`` clamps
    the range start to earliest (documented potential data loss) —
    exactly the Kafka source's contract. Metadata-only."""
    earliest = log.earliest_offsets()
    out = []
    for r in ranges:
        e = earliest.get(r.partition, 0)
        if r.from_offset >= e:
            out.append(r)
        elif fail_on_data_loss:
            raise ValueError(
                f"offsets [{r.from_offset},{min(r.until_offset, e)}) in "
                f"partition {r.partition} were expired by retention "
                f"(earliest is now {e}); set failOnDataLoss=false to "
                f"resume from earliest and accept the loss")
        else:
            out.append(OffsetRange(r.stream, r.partition,
                                   min(e, r.until_offset), r.until_offset))
    return out


def dis_read(spark: SparkSession, log: DisLog,
             ranges: list[OffsetRange] | str,
             allow_non_consecutive: bool = False,
             fail_on_data_loss: bool = True) -> DataFrame:
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
    ranges = check_data_loss(log, ranges, fail_on_data_loss)
    check_consecutive(log, ranges, allow_non_consecutive)

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
    """Exact count with no data scan on a dense log (offset arithmetic,
    DISRDD.scala:89-94) and segment-metadata arithmetic on a compacted
    one: fully-covered segments contribute their filename row count; a
    compacted segment only *partially* covered by the range is the single
    case metadata cannot answer, and costs one bounded parquet read of
    that segment's offset column."""
    if isinstance(ranges, str):
        ranges = offset_ranges_from_json(log.stream, ranges)
    total = 0
    for r in resolve_ranges(log, ranges):
        if r.count == 0:
            continue
        for s in log.segment_infos(r.partition):
            lo = max(s.from_offset, r.from_offset)
            hi = min(s.until_offset, r.until_offset)
            if hi <= lo:
                continue
            if r.from_offset <= s.from_offset and s.until_offset <= r.until_offset:
                total += s.rows                      # fully covered
            elif s.dense:
                total += hi - lo                     # partial, dense
            else:                                    # partial, compacted
                import pyarrow.compute as pc
                import pyarrow.parquet as pq

                off = pq.read_table(s.path, columns=["offset"])
                total += int(pc.sum(
                    pc.and_(pc.greater_equal(off.column("offset"), lo),
                            pc.less(off.column("offset"), hi))
                    .cast("int64")).as_py() or 0)
    return total


def dis_is_empty(log: DisLog, ranges: list[OffsetRange] | str) -> bool:
    """isEmpty from offsets (DISRDD.scala:107-112)."""
    return dis_count(log, ranges) == 0


def dis_take(spark: SparkSession, log: DisLog,
             ranges: list[OffsetRange] | str, n: int,
             allow_non_consecutive: bool = False) -> list:
    """take(n) reading only the partitions/segments that can contribute.

    Mirrors DISRDD.take's plan (DISRDD.scala:114-144): per-range take
    counts are precomputed from offset arithmetic (dense log) or segment
    metadata (compacted log — arithmetic would overestimate available
    rows and under-take); ranges past the budget are never scanned.
    """
    if isinstance(ranges, str):
        ranges = offset_ranges_from_json(log.stream, ranges)
    ranges = resolve_ranges(log, ranges)
    check_consecutive(log, ranges, allow_non_consecutive)

    budget, trimmed, out = n, [], []
    for r in ranges:
        if budget <= 0:
            break
        avail = dis_count(log, [r])
        if avail == 0:
            continue
        if avail <= budget:
            trimmed.append(r)       # whole range fits (by actual rows)
            budget -= avail
        elif not allow_non_consecutive:
            # dense: offset arithmetic converts a row budget to an offset
            trimmed.append(OffsetRange(r.stream, r.partition, r.from_offset,
                                       r.from_offset + budget))
            budget = 0
        else:
            # compacted boundary range: rows-to-offset needs the data —
            # read the (pruned) range and keep only the budget
            rows = (dis_read(spark, log, [r], True)
                    .orderBy("offset").take(budget))
            out.extend(rows)
            budget = 0
    if trimmed:
        out = dis_read(spark, log, trimmed, allow_non_consecutive).collect() \
            + out
    return out[:n]
