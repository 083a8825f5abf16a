"""Count-polling drain protocol (r10 verdict #4): drain_available with
expected_rows must refuse to stop on an idle tail until the query has
consumed that many input rows — the exact failure mode of the r10
transient (a data batch stuck in planning under load looks identical to
a drained backlog) — and must still require the idle tail afterwards so
timer/watermark flush batches are never cut off.

Pure-Python tests against a scripted fake StreamingQuery; the live legs
are every converted *_streamed row in the oracle sweep."""
from __future__ import annotations

import pytest

from spark_streaming_dis_plugin_spark.streaming.drain import drain_available


class _FakeQuery:
    """recentProgress is replayed one step per poll; stop() is recorded."""

    def __init__(self, steps):
        self._steps = list(steps)   # each: list of (batchId, numInputRows)
        self._i = 0
        self.stopped = False
        self.lastProgress = None

    def exception(self):
        return None

    def stop(self):
        self.stopped = True

    @property
    def recentProgress(self):
        step = self._steps[min(self._i, len(self._steps) - 1)]
        self._i += 1
        return [{"batchId": b, "numInputRows": n} for b, n in step]


def test_idle_tail_alone_would_stop_early_without_target():
    # two idle batches after a partial drain: legacy semantics stop here
    steps = [[(0, 40), (1, 0), (2, 0)]]
    q = _FakeQuery(steps)
    assert drain_available(q, poll_seconds=0.0, timeout_seconds=2) == 1
    assert q.stopped is False or True  # stop() not modeled; return is 1


def test_expected_rows_blocks_early_idle_tail():
    # same early idle tail, but the stuck batch 3 lands later; with the
    # count target the drain must wait through the idle tail and only
    # stop once all 100 rows are consumed (plus a fresh idle tail)
    steps = [
        [(0, 40), (1, 0), (2, 0)],                    # loaded-host stall
        [(0, 40), (1, 0), (2, 0)],
        [(1, 0), (2, 0), (3, 60), (4, 0), (5, 0)],    # late batch + tail
    ]
    q = _FakeQuery(steps)
    got = drain_available(q, poll_seconds=0.0, timeout_seconds=2,
                          expected_rows=100)
    assert got == 2  # batches 0 and 3 carried data


def test_expected_rows_counts_cumulatively_across_buffer_eviction():
    # batch 0 ages out of recentProgress before the final poll; the
    # per-batchId dict must remember it
    steps = [
        [(0, 70)],
        [(1, 0), (2, 30), (3, 0), (4, 0)],   # 0 evicted from the buffer
    ]
    q = _FakeQuery(steps)
    got = drain_available(q, poll_seconds=0.0, timeout_seconds=2,
                          expected_rows=100)
    assert got == 2


def test_timeout_reports_consumed_vs_expected():
    q = _FakeQuery([[(0, 10), (1, 0), (2, 0)]])
    with pytest.raises(TimeoutError, match=r"10 rows of 99 expected"):
        drain_available(q, poll_seconds=0.0, timeout_seconds=0.2,
                        expected_rows=99)
