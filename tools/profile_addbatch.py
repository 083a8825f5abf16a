"""Decompose WHERE warm-batch addBatch time goes (r11 verdict #6).

tools/profile_microbatch.py attributed ~85% of a warm six-batch drain's
per-batch cost to the engine's addBatch phase (~0.6-1.1 s at ~17k
rows/batch). This harness separates addBatch's components by running the
SAME six-batch rate-limited drain under ablations:

  A baseline   : running_wordcount -> memory sink, complete mode
                 (the bench's streaming leg, for reference)
  B noop-sink  : running_wordcount -> foreachBatch(count)
                 (removes the memory-sink collect; keeps agg + state)
  C no-agg     : raw passthrough -> foreachBatch(count)
                 (removes the stateful aggregate; keeps the Python
                 source scan + Arrow transfer + engine overhead)
  D big-seg    : C with segmentRows doubled (4000 vs 2000)
                 (halves per-file open/prune overhead in the reader;
                 if C-D is material, per-segment cost dominates)
  E no-source  : C's topology fed by Spark's built-in rate source
                 clamped to the same rows/batch (removes the Python
                 data source entirely; what remains is engine floor)

Reads per-phase durationMs from the engine's progress events. Print one
JSON line per variant + a markdown table for BENCH_NOTES.

Run on a QUIET machine: python tools/profile_addbatch.py [sf_dir]
"""
from __future__ import annotations

import json
import os
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_BATCHES = 6


def _drain_and_report(spark, make_query, total, label, endless=False):
    from spark_streaming_dis_plugin_spark.streaming.drain import (
        drain_available,
    )

    t0 = time.perf_counter()
    q = make_query()
    if endless:
        # rate source never idles: poll cumulative rows, then stop
        seen: dict[int, int] = {}
        deadline = time.monotonic() + 600
        while time.monotonic() < deadline:
            if q.exception() is not None:
                raise q.exception()
            for p in q.recentProgress:
                seen[p["batchId"]] = p["numInputRows"]
            if sum(seen.values()) >= total:
                break
            time.sleep(0.1)
        q.stop()
    else:
        drain_available(q, timeout_seconds=600, expected_rows=total)
    wall = time.perf_counter() - t0
    data = [p for p in q.recentProgress if p["numInputRows"] > 0]
    warm = data[1:]  # batch 0 pays plan/codegen warmup
    def med(key):
        vals = sorted(p["durationMs"].get(key, 0) for p in warm)
        return vals[len(vals) // 2] if vals else None
    rep = {
        "variant": label,
        "data_batches": len(data),
        "rows_per_batch": data[0]["numInputRows"] if data else 0,
        "wall_sec": round(wall, 2),
        "warm_addBatch_ms": med("addBatch"),
        "warm_latestOffset_ms": med("latestOffset"),
        "warm_walCommit_ms": med("walCommit"),
        "warm_trigger_ms": med("triggerExecution"),
    }
    print(json.dumps(rep), flush=True)
    return rep


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from spark_streaming_dis_plugin_spark.operators.connector import (
        _materialized_log, _register_dis,
    )
    from spark_streaming_dis_plugin_spark.scratch import scratch_dir
    from spark_streaming_dis_plugin_spark.session import get_spark
    from spark_streaming_dis_plugin_spark.sources.dis_log import (
        DisLog, create_log_from_events,
    )
    from spark_streaming_dis_plugin_spark.streaming.queries import (
        running_wordcount,
    )

    spark = get_spark("profile-addbatch",
                      cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
    spark.sparkContext.setLogLevel("ERROR")
    log = _materialized_log(spark, sf_dir)
    total = sum(log.latest_offsets().values())
    per = max(-(-total // N_BATCHES), 1)

    def source(l: DisLog):
        return (spark.readStream.format("dis")
                .option("path", l.root).option("stream", l.stream)
                .option("maxOffsetsPerTrigger", str(per))
                .load())

    noop = lambda bdf, bid: bdf.count()  # noqa: E731
    results = []

    def qA():
        return (running_wordcount(source(log))
                .writeStream.format("memory")
                .queryName(f"pa_{uuid.uuid4().hex[:8]}")
                .outputMode("complete")
                .option("checkpointLocation", scratch_dir("pa_ckpt_"))
                .trigger(processingTime="0 seconds").start())
    results.append(_drain_and_report(spark, qA, total, "A wordcount+memory"))

    def qB():
        return (running_wordcount(source(log))
                .writeStream.foreachBatch(noop)
                .outputMode("update")
                .option("checkpointLocation", scratch_dir("pb_ckpt_"))
                .trigger(processingTime="0 seconds").start())
    results.append(_drain_and_report(spark, qB, total, "B wordcount+noop"))

    def qC():
        return (source(log)
                .writeStream.foreachBatch(noop)
                .option("checkpointLocation", scratch_dir("pc_ckpt_"))
                .trigger(processingTime="0 seconds").start())
    results.append(_drain_and_report(spark, qC, total, "C raw+noop"))

    big_root = scratch_dir("pd_biglog_")
    create_log_from_events(spark, f"{sf_dir}/events.parquet", big_root,
                           segment_rows=4000)
    big = DisLog(big_root, "events")

    def qD():
        return (source(big)
                .writeStream.foreachBatch(noop)
                .option("checkpointLocation", scratch_dir("pd_ckpt_"))
                .trigger(processingTime="0 seconds").start())
    results.append(_drain_and_report(spark, qD, total, "D raw+noop seg4000"))

    rows_per_sec = max(per, 1)

    def qE():
        # rate source: rowsPerSecond = one planned batch per second at
        # the same rows/batch; stop via expected_rows on the same total
        return (spark.readStream.format("rate")
                .option("rowsPerSecond", str(rows_per_sec))
                .option("numPartitions", "4").load()
                .writeStream.foreachBatch(noop)
                .option("checkpointLocation", scratch_dir("pe_ckpt_"))
                .trigger(processingTime="0 seconds").start())
    results.append(_drain_and_report(spark, qE, total, "E rate+noop",
                                     endless=True))

    print("| variant | rows/batch | warm addBatch ms | wall s |")
    print("|---|---|---|---|")
    for r in results:
        print(f"| {r['variant']} | {r['rows_per_batch']} | "
              f"{r['warm_addBatch_ms']} | {r['wall_sec']} |")


if __name__ == "__main__":
    main()
