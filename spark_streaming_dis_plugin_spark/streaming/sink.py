"""DIS producer sink for streaming queries — foreachBatch with idempotent
micro-batch appends (≅ DISSink broadcast lazy producer, DISSink.scala:23-55,
usage DISSparkStreamingSinkExample.scala:45-59).

Exactly-once: each micro-batch's append is recorded in a batch-id ledger
inside the log directory; a replayed batch (restart after failure between
append and checkpoint commit) is skipped — idempotence by (queryName,
batchId), the Structured Streaming sink contract.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame

from ..sources.dis_log import DisLog


class DisForeachBatchSink:
    def __init__(self, log: DisLog, query_name: str = "q"):
        self.log = log
        self.query_name = query_name
        self._ledger = os.path.join(log.stream_dir, "_commits.json")

    def _committed(self) -> set[int]:
        if not os.path.exists(self._ledger):
            return set()
        with open(self._ledger) as f:
            return {int(b) for b in json.load(f).get(self.query_name, [])}

    def _record(self, batch_id: int) -> None:
        data: dict[str, list[int]] = {}
        if os.path.exists(self._ledger):
            with open(self._ledger) as f:
                data = json.load(f)
        data.setdefault(self.query_name, []).append(batch_id)
        with open(self._ledger, "w") as f:
            json.dump(data, f)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_id in self._committed():
            return  # replayed batch — idempotent skip
        pdf = batch_df.select("partition", "key", "value", "timestamp") \
                      .toPandas()
        if len(pdf):
            self.log.append(pdf)
        self._record(batch_id)


def write_stream_to_dis(df: DataFrame, log: DisLog, checkpoint: str,
                        query_name: str = "dis_sink"):
    """writeStream -> DIS log, exactly-once via the batch-id ledger."""
    sink = DisForeachBatchSink(log, query_name)
    return (df.writeStream
            .queryName(query_name)
            .foreachBatch(sink)
            .option("checkpointLocation", checkpoint))
