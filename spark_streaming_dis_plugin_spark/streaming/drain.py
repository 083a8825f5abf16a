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

Load robustness (r10 verdict #4): idle-batch detection alone can fire
EARLY under heavy host load — a data batch stuck in planning looks
exactly like a drained backlog, and round 10 recorded one transient
mismatch with that fingerprint under triple-JVM contention. Callers that
know the backlog size (every gate that builds its own log knows
``sum(log.latest_offsets().values())``) pass ``expected_rows``: the
drain then refuses to stop until the query has CONSUMED that many input
rows, and only afterwards applies the idle-tail condition — which is
still required, because timer/watermark-driven operators (session
timeouts, append-mode window flush) emit on no-data batches AFTER the
last input row. Count-polling makes early stop impossible; the idle
tail keeps flush semantics intact.
"""

from __future__ import annotations

import time


def drain_available(query, idle_batches: int = 2, poll_seconds: float = 0.25,
                    timeout_seconds: float = 300.0,
                    expected_rows: int | None = None) -> int:
    """Block until ``query`` has drained its backlog, then stop it.

    ``query`` is a started StreamingQuery on a processing-time trigger.
    Returns the number of data batches observed. The backlog is considered
    drained after ``idle_batches`` consecutive completed micro-batches
    with ``numInputRows == 0`` following at least one planning pass —
    AND, when ``expected_rows`` is given, only once the cumulative input
    row count has reached it (the load-robust count-polling phase;
    cumulative counting folds ``recentProgress`` into a per-batchId dict
    so the bounded progress buffer cannot under-count a long drain).
    """
    deadline = time.monotonic() + timeout_seconds
    seen: dict[int, int] = {}
    try:
        while time.monotonic() < deadline:
            if query.exception() is not None:
                raise query.exception()
            progress = query.recentProgress
            for p in progress:
                seen[p["batchId"]] = p["numInputRows"]
            if expected_rows is not None \
                    and sum(seen.values()) < expected_rows:
                time.sleep(poll_seconds)
                continue
            if progress:
                trailing_idle = 0
                for p in reversed(progress):
                    if p["numInputRows"] == 0:
                        trailing_idle += 1
                    else:
                        break
                if trailing_idle >= idle_batches:
                    return sum(1 for v in seen.values() if v > 0)
            time.sleep(poll_seconds)
        raise TimeoutError(
            f"backlog not drained within {timeout_seconds}s "
            f"(consumed {sum(seen.values())} rows"
            + (f" of {expected_rows} expected" if expected_rows is not None
               else "")
            + f"; last progress: {query.lastProgress})")
    finally:
        query.stop()
