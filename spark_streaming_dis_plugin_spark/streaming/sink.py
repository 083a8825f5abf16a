"""DIS producer sink for streaming queries — foreachBatch writing through
the ``format("dis")`` writer (≅ DISSink broadcast lazy producer,
DISSink.scala:23-55, usage DISSparkStreamingSinkExample.scala:45-59).

Exactly-once: each micro-batch writes under transaction tag
``<queryName>_b<batchId>``. Segment files carry the tag in their names;
the txn lands in the log's ledger (atomic rename) only after every
segment is in place, and a crashed attempt's tagged tail segments are
rolled back before the replay re-appends — so a batch is either fully
visible-and-committed or fully absent. A replayed, committed batch is
skipped wholesale. (The reference DISSink is at-least-once; the txn tag
upgrades that under the single-writer-per-stream model.)

No driver-side data movement: rows are staged to parquet by executors
inside DisWriter.write(); the driver's commit assigns offset ranges from
metadata and touches at most one staged file at a time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..sources.dis_log import DisLog, sanitize_txn


class DisForeachBatchSink:
    def __init__(self, log: DisLog, query_name: str = "q"):
        self.log = log
        self.query_name = query_name

    def _txn(self, batch_id: int) -> str:
        return sanitize_txn(f"{self.query_name}_b{batch_id}")

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        txn = self._txn(batch_id)
        if txn in self.log.committed_txns():
            return  # replayed batch — idempotent skip (cheap pre-check;
            #         the writer re-checks under the same ledger)
        from ..sources.dis_datasource import DisDataSource

        batch_df.sparkSession.dataSource.register(DisDataSource)
        cols = [c for c in ("partition", "key", "value", "timestamp")
                if c in batch_df.columns]
        (batch_df.select(*cols)
         .write.format("dis").mode("append")
         .option("path", self.log.root).option("stream", self.log.stream)
         .option("txn", txn)
         .save())


def write_stream_to_dis(df: DataFrame, log: DisLog, checkpoint: str,
                        query_name: str = "dis_sink"):
    """writeStream -> DIS log, exactly-once via txn-tagged segment appends."""
    sink = DisForeachBatchSink(log, query_name)
    return (df.writeStream
            .queryName(query_name)
            .foreachBatch(sink)
            .option("checkpointLocation", checkpoint))
