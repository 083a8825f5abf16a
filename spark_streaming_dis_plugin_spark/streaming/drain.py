"""Full-backlog drain under rate limits — availableNow semantics for
rate-limited dis streams.

The Kafka source combines ``Trigger.AvailableNow`` with
``maxOffsetsPerTrigger`` by implementing ``SupportsTriggerAvailableNow``:
the engine captures the backlog end once, then issues *multiple*
rate-limited batches until it is reached. The Python DataSource API
(pyspark.sql.datasource) exposes no such hook — the engine wraps a Python
streaming source and captures its FIRST ``latestOffset()`` as the drain
target, so a rate-limited source yields exactly one clamped batch per
availableNow run.

:func:`drain_available` restores the Kafka-shaped semantics with what the
API does allow: run the query under a fast processing-time trigger —
every micro-batch respects the rate budget — and stop it after the
backlog is exhausted (``idle_batches`` consecutive empty batches). One
query run, one checkpoint lineage, full drain, bounded batches.
"""

from __future__ import annotations

import time


def drain_available(query, idle_batches: int = 2, poll_seconds: float = 0.25,
                    timeout_seconds: float = 300.0) -> int:
    """Block until ``query`` has drained its backlog, then stop it.

    ``query`` is a started StreamingQuery on a processing-time trigger.
    Returns the number of data batches observed. The backlog is considered
    drained after ``idle_batches`` consecutive completed micro-batches
    with ``numInputRows == 0`` following at least one planning pass.
    """
    deadline = time.monotonic() + timeout_seconds
    try:
        while time.monotonic() < deadline:
            if query.exception() is not None:
                raise query.exception()
            progress = query.recentProgress
            if progress:
                trailing_idle = 0
                for p in reversed(progress):
                    if p["numInputRows"] == 0:
                        trailing_idle += 1
                    else:
                        break
                if trailing_idle >= idle_batches:
                    return sum(1 for p in progress if p["numInputRows"] > 0)
            time.sleep(poll_seconds)
        raise TimeoutError(
            f"backlog not drained within {timeout_seconds}s "
            f"(last progress: {query.lastProgress})")
    finally:
        query.stop()
