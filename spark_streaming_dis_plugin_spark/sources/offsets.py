"""Offset model + offsets JSON codec.

Reimplements (behaviorally, Spark-first) the reference's offset abstractions:

- ``OffsetRange`` — (stream, partition, from_offset inclusive, until_offset
  exclusive); cf. /root/reference/.../OffsetRange.scala:98-134.
- sentinels ``LATEST = -1`` / ``EARLIEST = -2``; cf. DISUtils.scala:261-286.
- the JSON dialects of JsonUtils.scala:19-106, identical to Spark's Kafka
  source option format so users can carry option strings over verbatim:
    * partitions        : ``{"stream": [0, 1]}``
    * partition offsets : ``{"stream": {"0": 23, "1": -1}}``
    * offset ranges     : ``{"0": [100, 200], "1": [-2, -1]}`` (per stream)

All serialization is deterministically sorted (stream name, then partition)
so offset logs / checkpoints are byte-stable, matching JsonUtils.scala:48-56.
"""

from __future__ import annotations

import json
from dataclasses import dataclass

LATEST = -1
EARLIEST = -2
_SENTINELS = (LATEST, EARLIEST)


@dataclass(frozen=True, order=True)
class OffsetRange:
    """Half-open offset interval of one stream partition.

    ``from_offset`` inclusive, ``until_offset`` exclusive — so ``count`` is
    pure arithmetic and never requires I/O (the basis of the reference's
    count/take/isEmpty pushdowns, DISRDD.scala:89-144).
    """

    stream: str
    partition: int
    from_offset: int
    until_offset: int

    def __post_init__(self) -> None:
        f, u = self.from_offset, self.until_offset
        if f not in _SENTINELS and u not in _SENTINELS and u < f:
            raise ValueError(
                f"until_offset {u} < from_offset {f} for "
                f"{self.stream}-{self.partition}")

    @property
    def count(self) -> int:
        if self.from_offset in _SENTINELS or self.until_offset in _SENTINELS:
            raise ValueError("count undefined for unresolved sentinel offsets")
        return self.until_offset - self.from_offset

    @property
    def is_empty(self) -> bool:
        return self.count == 0


# ---------------------------------------------------------------- partitions

def partitions_to_json(parts: dict[str, list[int]]) -> str:
    """``{"stream": [0, 1]}`` with streams and partitions sorted."""
    return json.dumps({s: sorted(ps) for s, ps in sorted(parts.items())},
                      separators=(",", ":"))


def partitions_from_json(s: str) -> dict[str, list[int]]:
    raw = json.loads(s)
    if not isinstance(raw, dict):
        raise ValueError(f"expected {{stream: [partitions...]}}, got: {s!r}")
    return {str(k): [int(p) for p in v] for k, v in raw.items()}


# ----------------------------------------------------- per-partition offsets

def partition_offsets_to_json(offsets: dict[tuple[str, int], int]) -> str:
    """``{"stream": {"0": 23}}`` sorted by stream then numeric partition."""
    by_stream: dict[str, dict[str, int]] = {}
    for (stream, part), off in offsets.items():
        by_stream.setdefault(stream, {})[str(part)] = int(off)
    out = {s: {p: d[p] for p in sorted(d, key=int)}
           for s, d in sorted(by_stream.items())}
    return json.dumps(out, separators=(",", ":"))


def partition_offsets_from_json(s: str) -> dict[tuple[str, int], int]:
    raw = json.loads(s)
    out: dict[tuple[str, int], int] = {}
    for stream, parts in raw.items():
        for part, off in parts.items():
            out[(str(stream), int(part))] = int(off)
    return out


# --------------------------------------------------------------- offset ranges

def offset_ranges_to_json(ranges: list[OffsetRange]) -> str:
    """``{"0": [from, until]}`` for a single stream, partitions sorted.

    Same shape the reference accepts in createRDD(streamName, rangesJson)
    (JsonUtils.scala:74-86): partition -> [from, until].
    """
    streams = {r.stream for r in ranges}
    if len(streams) > 1:
        raise ValueError(f"offset-ranges JSON is per-stream; got {streams}")
    return json.dumps(
        {str(r.partition): [r.from_offset, r.until_offset]
         for r in sorted(ranges, key=lambda r: r.partition)},
        separators=(",", ":"))


def offset_ranges_from_json(stream: str, s: str) -> list[OffsetRange]:
    raw = json.loads(s)
    out = []
    for part, pair in raw.items():
        if not (isinstance(pair, list) and len(pair) == 2):
            raise ValueError(f"partition {part}: expected [from, until], got {pair!r}")
        out.append(OffsetRange(stream, int(part), int(pair[0]), int(pair[1])))
    return sorted(out, key=lambda r: r.partition)


def resolve_sentinels(
    ranges: list[OffsetRange],
    earliest: dict[int, int],
    latest: dict[int, int],
) -> list[OffsetRange]:
    """Resolve -1/-2 sentinels against the log's current bounds.

    Mirrors the driver-side resolution in createRDD (DISUtils.scala:253-289):
    -1 -> seekToEnd position (latest), -2 -> seekToBeginning (earliest),
    resolved once on the driver before the batch plan is frozen.
    """
    out = []
    for r in ranges:
        f, u = r.from_offset, r.until_offset
        if f == LATEST:
            f = latest[r.partition]
        elif f == EARLIEST:
            f = earliest[r.partition]
        if u == LATEST:
            u = latest[r.partition]
        elif u == EARLIEST:
            u = earliest[r.partition]
        out.append(OffsetRange(r.stream, r.partition, f, u))
    return out
