"""Offset model + JSON codec round-trips (SURVEY.md §5: unit tests for
connector-shaped logic the DuckDB oracle can't check)."""

from __future__ import annotations

import pytest

from spark_streaming_dis_plugin_spark.sources.offsets import (
    EARLIEST, LATEST, OffsetRange,
    offset_ranges_from_json, offset_ranges_to_json,
    partition_offsets_from_json, partition_offsets_to_json,
    partitions_from_json, partitions_to_json, resolve_sentinels,
)


def test_offset_range_count():
    r = OffsetRange("s", 0, 100, 250)
    assert r.count == 150
    assert not r.is_empty
    assert OffsetRange("s", 1, 7, 7).is_empty


def test_offset_range_validates_order():
    with pytest.raises(ValueError):
        OffsetRange("s", 0, 10, 5)
    # sentinels bypass validation until resolution
    OffsetRange("s", 0, EARLIEST, LATEST)


def test_count_undefined_for_sentinels():
    with pytest.raises(ValueError):
        _ = OffsetRange("s", 0, EARLIEST, 5).count


def test_partitions_json_roundtrip():
    parts = {"streamB": [2, 0, 1], "streamA": [3]}
    s = partitions_to_json(parts)
    assert s == '{"streamA":[3],"streamB":[0,1,2]}'  # sorted, deterministic
    assert partitions_from_json(s) == {"streamA": [3], "streamB": [0, 1, 2]}


def test_partition_offsets_json_roundtrip():
    offs = {("s", 1): -1, ("s", 0): 23, ("t", 10): 5, ("t", 2): 7}
    s = partition_offsets_to_json(offs)
    assert s == '{"s":{"0":23,"1":-1},"t":{"2":7,"10":5}}'
    assert partition_offsets_from_json(s) == offs


def test_offset_ranges_json_roundtrip():
    ranges = [OffsetRange("s", 1, -2, -1), OffsetRange("s", 0, 100, 200)]
    s = offset_ranges_to_json(ranges)
    assert s == '{"0":[100,200],"1":[-2,-1]}'
    assert offset_ranges_from_json("s", s) == sorted(
        ranges, key=lambda r: r.partition)


def test_offset_ranges_json_rejects_multistream():
    with pytest.raises(ValueError):
        offset_ranges_to_json([OffsetRange("a", 0, 0, 1),
                               OffsetRange("b", 0, 0, 1)])


def test_resolve_sentinels():
    earliest, latest = {0: 5, 1: 0}, {0: 105, 1: 42}
    got = resolve_sentinels(
        [OffsetRange("s", 0, EARLIEST, LATEST),
         OffsetRange("s", 1, 10, LATEST),
         OffsetRange("s", 1, EARLIEST, 7)],
        earliest, latest)
    assert got == [OffsetRange("s", 0, 5, 105),
                   OffsetRange("s", 1, 10, 42),
                   OffsetRange("s", 1, 0, 7)]
