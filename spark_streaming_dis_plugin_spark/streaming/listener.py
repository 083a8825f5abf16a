"""Offset-commit side-channel — the ``commitAsync`` callback surface.

The reference exposes ``CanCommitOffsets.commitAsync(ranges, callback)``:
user code hands processed offset ranges back to the stream, which commits
them to the DIS service at the next batch boundary and invokes the
callback (OffsetRange.scala:60-91, DirectDISInputDStream.scala:286-365,
demo usage DISSparkStreamingSubscribeExample.scala:49-51).

Structured Streaming already owns the exactly-once commit (the checkpoint
offset log), so the rebuild's side-channel is OBSERVATIONAL, exactly like
the reference's service-side commit: a ``StreamingQueryListener`` that, on
every completed batch, extracts each dis source's committed end offsets
from the progress event and (a) appends them to a JSON commit journal
next to the log, (b) invokes a user callback with the offset map — the
``commitAsync(ranges, callback)`` shape. Lag monitors and out-of-band
consumers read the journal; the stream itself never depends on it.

Driver-side, O(partitions) per batch — negligible at any scale.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable
from typing import Any

from pyspark.sql.streaming import StreamingQueryListener

CommitCallback = Callable[[str, int, dict[str, int]], Any]


def _parse_offsets(end: Any) -> Any:
    """endOffset arrives as a string — JSON for JVM sources, but a Python
    dict repr (single quotes) for Python DataSources. Accept both."""
    if not isinstance(end, str):
        return end
    try:
        return json.loads(end)
    except ValueError:
        import ast

        try:
            return ast.literal_eval(end)
        except (ValueError, SyntaxError):
            return None


class DisCommitListener(StreamingQueryListener):
    """Journal committed dis-source offsets per completed micro-batch.

    ``journal_path``: JSON-lines file; one record per (batch, source):
    ``{"query": ..., "batch_id": N, "offsets": {"0": 42, ...}, "ts_ms": t}``
    ``callback``: optional fn(query_name, batch_id, offsets) — the
    reference's OffsetCommitCallback analogue.
    """

    def __init__(self, journal_path: str,
                 callback: CommitCallback | None = None):
        self.journal_path = journal_path
        self.callback = callback

    # -- StreamingQueryListener hooks (only onQueryProgress is used) --

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        progress = event.progress
        name = progress.name or str(progress.id)
        for source in progress.sources:
            # Python DataSources surface as PythonMicroBatchStream@... —
            # the engine does not expose the source short name here, so a
            # multi-source query journals every Python streaming source.
            if "PythonMicroBatchStream" not in (source.description or ""):
                continue
            offsets = _parse_offsets(source.endOffset)
            if not isinstance(offsets, dict):
                continue
            record = {"query": name, "batch_id": progress.batchId,
                      "offsets": offsets,
                      "ts_ms": int(time.time() * 1000)}
            os.makedirs(os.path.dirname(self.journal_path), exist_ok=True)
            with open(self.journal_path, "a") as f:
                f.write(json.dumps(record) + "\n")
            if self.callback is not None:
                self.callback(name, progress.batchId, offsets)

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass


def read_commit_journal(journal_path: str) -> list[dict]:
    """Parse the journal (latest-wins per (query, partition) is the
    consumer's choice — every batch's commit is retained, like the
    reference's per-batch commitAll)."""
    if not os.path.exists(journal_path):
        return []
    with open(journal_path) as f:
        return [json.loads(line) for line in f if line.strip()]
